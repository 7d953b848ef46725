"""Property-based tests (hypothesis) for the custom operators with hand-built
semantics — asof_join and changelog_normalize. The reference relies on
example-based ITCases only (SURVEY §5); these add randomized coverage with a
pure-Python reference model as the oracle.
"""

from __future__ import annotations

import sys
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.operators.temporal_joins import asof_join
from flink_release_1_14_5_comment_spark.streaming.changelog import changelog_normalize

BASE = datetime(2024, 1, 1)

# small keyed event sets: (key ∈ 0..2, ts-offset minutes, payload)
_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
    min_size=0, max_size=12,
)


@st.composite
def _asof_case(draw):
    build = draw(_events)
    probe = draw(_events)
    # build side must be unique per (key, ts) — the operator's contract
    seen = set()
    uniq_build = []
    for k, ts, v in build:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq_build.append((k, ts, v))
    return uniq_build, probe


@settings(max_examples=12, deadline=None)
@given(_asof_case())
def test_asof_join_matches_python_model(spark, case):
    build, probe = case
    build_rows = [(k, BASE + timedelta(minutes=t), v) for k, t, v in build]
    probe_rows = [(i, k, BASE + timedelta(minutes=t)) for i, (k, t, _) in enumerate(probe)]
    bdf = spark.createDataFrame(build_rows or [(99, BASE, 0)],
                                "k long, bts timestamp, bval long")
    if not build_rows:
        bdf = bdf.filter("k < 0")
    pdf = spark.createDataFrame(probe_rows or [(0, 99, BASE)],
                                "pid long, k long, pts timestamp")
    if not probe_rows:
        pdf = pdf.filter("k < 0")
    out = asof_join(
        probe=pdf, build=bdf, key="k", probe_ts="pts", build_ts="bts",
        build_cols=["bval", "bts"],
    ).collect()
    got = {r["pid"]: r["bval"] for r in out}
    # python model: latest build value with bts <= pts per key
    expect = {}
    for pid, k, pts in probe_rows:
        best = None
        for bk, bts, bval in build_rows:
            if bk == k and bts <= pts and (best is None or bts > best[0]):
                best = (bts, bval)
        expect[pid] = best[1] if best else None
    assert got == expect


_changelog_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                                  # key
        st.integers(0, 99),                                 # value
        st.sampled_from(["+I", "+U", "-U", "-D"]),          # rowkind
    ),
    min_size=0, max_size=15,
)


@settings(max_examples=12, deadline=None)
@given(_changelog_rows)
def test_changelog_normalize_matches_python_model(spark, rows):
    seq_rows = [(k, v, kind, i) for i, (k, v, kind) in enumerate(rows)]
    df = spark.createDataFrame(seq_rows or [(0, 0, "+I", 0)],
                               "k long, v long, __rowkind string, seq long")
    if not seq_rows:
        df = df.filter("k < 0")
    got = {(r["k"], r["v"]) for r in changelog_normalize(df, ["k"], "seq").collect()}
    # python model: highest-seq non-(-U) row per key wins; -D removes the key
    expect = {}
    for k, v, kind, seq in seq_rows:
        if kind == "-U":
            continue
        if k not in expect or seq > expect[k][1]:
            expect[k] = ((k, v, kind), seq)
    expected_set = {(k, v) for (k, v, kind), _ in expect.values() if kind != "-D"}
    assert got == expected_set
