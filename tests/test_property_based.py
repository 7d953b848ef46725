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


# random undirected edge sets over nodes 0..5
_edges = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)),
    min_size=1, max_size=14,
).filter(lambda es: any(a != b for a, b in es))


@settings(max_examples=10, deadline=None)
@given(_edges)
def test_jaccard_index_matches_python_model(spark, es):
    """J(u,v) from the wedge-join plan equals the set-algebra definition
    computed by a pure-Python model, for every emitted pair — and pairs
    with no shared neighbor are never emitted."""
    from flink_release_1_14_5_comment_spark.pipeline.graph import jaccard_index

    edges = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in es], "src string, dst string")
    got = {(r.u, r.v): r.jaccard for r in jaccard_index(edges).collect()}

    nbrs: dict[str, set] = {}
    for a, b in es:
        if a == b:
            continue
        nbrs.setdefault(f"n{a}", set()).add(f"n{b}")
        nbrs.setdefault(f"n{b}", set()).add(f"n{a}")
    expected = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            common = nbrs[u] & nbrs[v]
            if common:
                expected[(u, v)] = round(len(common) / len(nbrs[u] | nbrs[v]), 6)
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.lists(st.floats(0.1, 9.9), min_size=3, max_size=3),
    min_size=2, max_size=8))
def test_kmeans_assignment_is_nearest_centroid(spark, vecs):
    """After kmeans_fit, every vector's cluster is the argmax-cosine seed
    under single-iteration fit (iters=1 → assignment against the raw seeds,
    checkable without simulating the update step)."""
    import math

    from flink_release_1_14_5_comment_spark.pipeline.clustering import kmeans_fit

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = min(2, len(rows))
    got = {r.vec_id: r.cluster for r in kmeans_fit(df, k=k, iters=1).collect()}

    seeds = rows[:k]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    for i, v in rows:
        best = min(((-cos(v, sv), sc) for sc, sv in seeds))[1]
        assert got[i] == best, (i, v, got[i], best)


# --- Full-history stream-join transition semantics -------------------------
# The pure per-event transitions (stream_joins._join_transition /
# _semi_anti_transition) are the whole semantics of the streaming joins; the
# Spark harness tests replay a handful of scripts, these fuzz thousands.
# Invariant: after any event sequence, the NET changelog (multiset of +I
# minus -D) must equal the declarative join of the surviving state — and
# no pair's count may ever go negative (no over-retractions). Counts >1
# are legitimate: duplicate identical input rows each produce their own
# live output row, exactly as the reference's multiset state views do.

from collections import Counter

from flink_release_1_14_5_comment_spark.streaming.stream_joins import (
    _join_transition,
    _semi_anti_transition,
)

# event: (side L/R, op +I/-D, payload 0..3). Small payload space forces
# duplicate payloads and spurious retractions.
_join_events = st.lists(
    st.tuples(st.sampled_from("LR"), st.sampled_from(["+I", "-D"]),
              st.integers(0, 3).map(str)),
    min_size=0, max_size=24,
)


def _expected_join(lpay, rpay, pad_left, pad_right):
    exp = Counter()
    for lp in lpay:
        if rpay:
            for rp in rpay:
                exp[(lp, rp)] += 1
        elif pad_left:
            exp[(lp, None)] += 1
    if not lpay and pad_right:
        for rp in rpay:
            exp[(None, rp)] += 1
    return exp


@given(events=_join_events, how=st.sampled_from(["inner", "left", "right", "full"]))
@settings(max_examples=400, deadline=None)
def test_join_transition_net_changelog_matches_join_of_state(events, how):
    pad_left = how in ("left", "full")
    pad_right = how in ("right", "full")
    lpay, rpay = [], []
    net = Counter()
    for side, op, payload in events:
        for eop, lp, rp in _join_transition(
                side, op, payload, lpay, rpay, pad_left, pad_right):
            net[(lp, rp)] += 1 if eop == "+I" else -1
            assert net[(lp, rp)] >= 0, (net[(lp, rp)], events)
    exp = _expected_join(lpay, rpay, pad_left, pad_right)
    assert +net == +exp, (events, how, +net, +exp)


@given(events=_join_events, semi=st.booleans())
@settings(max_examples=400, deadline=None)
def test_semi_anti_transition_net_changelog_matches_state(events, semi):
    lpay, rpay = [], []
    net = Counter()
    for side, op, payload in events:
        for eop, lp in _semi_anti_transition(
                side, op, payload, lpay, rpay, semi):
            net[lp] += 1 if eop == "+I" else -1
            assert net[lp] >= 0, (events,)
    live = Counter(lpay) if bool(rpay) == semi else Counter()
    assert +net == +live, (events, semi, +net, +live)


# --- session windows + CountEvictor (streaming/evictors.py) ---------------

_sess_events = st.lists(
    st.tuples(st.integers(0, 1),          # key
              st.integers(0, 300),        # ts offset minutes
              st.integers(0, 99)),        # value
    min_size=1, max_size=14,
)


def _session_model(rows, gap_min=30, n_keep=3):
    """Pure-Python reference: sessionize per key (gap >= 30 min starts a
    new session), keep the LAST n_keep rows per session by (ts, value)."""
    out = []
    bykey: dict = {}
    for k, t, v in rows:
        bykey.setdefault(k, []).append((t, v))
    for k, evs in bykey.items():
        evs.sort()
        sessions = []
        for t, v in evs:
            if sessions and t - sessions[-1][-1][0] < gap_min:
                sessions[-1].append((t, v))
            else:
                sessions.append([(t, v)])
        for s in sessions:
            kept = sorted(s)[-n_keep:]
            out.append((k, s[0][0], s[-1][0] + gap_min,
                        len(kept), sum(v for _, v in kept)))
    return sorted(out)


@settings(max_examples=6, deadline=None)
@given(_sess_events)
def test_session_count_evictor_matches_python_model(spark, rows):
    from flink_release_1_14_5_comment_spark.streaming import sources
    from flink_release_1_14_5_comment_spark.streaming.evictors import (
        session_agg_count_evictor,
    )
    import uuid

    # dedupe (key, ts) so pandas/python tie-order can't diverge on values
    seen, uniq = set(), []
    for k, t, v in rows:
        if (k, t) not in seen:
            seen.add((k, t))
            uniq.append((k, t, v))
    data = [(k, BASE + timedelta(minutes=t), float(v)) for k, t, v in uniq]
    # advancer/flusher: push the watermark past every session end, then one
    # more batch so event-time timers fire (drain-all protocol)
    mx = max(t for _, t, _ in uniq)
    finale1 = [(99, BASE + timedelta(minutes=mx + 600), 0.0)]
    finale2 = [(99, BASE + timedelta(minutes=mx + 1200), 0.0)]
    df = spark.createDataFrame(data, "k long, ts timestamp, v double")
    stream, tmp = sources.replay_as_stream(
        spark, df, n_chunks=2, order_col="ts",
        final_dfs=[spark.createDataFrame(finale1, "k long, ts timestamp, v double"),
                   spark.createDataFrame(finale2, "k long, ts timestamp, v double")])
    try:
        out = session_agg_count_evictor(
            stream, ["k"], "ts", "v", gap="30 minutes", n_keep=3)
        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(
            (r["k"],
             int((r["w_start"] - BASE).total_seconds() // 60),
             int((r["w_end"] - BASE).total_seconds() // 60),
             r["n_kept"], int(r["sum_value"]))
            for r in spark.table(name).collect() if r["k"] != 99)
    finally:
        sources.cleanup(tmp)
    assert got == _session_model(uniq)
