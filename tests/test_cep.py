"""CEP NFA operator harness tests (reference-style: scripted micro-batches →
asserted matches; SURVEY §5 harness pattern)."""

from __future__ import annotations

import sys
from datetime import datetime

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.cep import Pattern, cep


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def scripted(spark):
    rows = [
        # user 1: view(1) → click(2) → purchase(3): one full match
        (1, 1, _ts(1), "view"),
        (2, 1, _ts(2), "click"),
        (3, 1, _ts(3), "purchase"),
        # user 1 again later: view(4) → click(5), no purchase → no match
        (4, 1, _ts(30), "view"),
        (5, 1, _ts(31), "click"),
        # user 2: click without preceding view → no match
        (6, 2, _ts(1), "click"),
        (7, 2, _ts(2), "purchase"),
        # user 3: match spread across micro-batches
        (8, 3, _ts(5), "view"),
        (9, 3, _ts(50), "click"),
        (10, 3, _ts(51), "purchase"),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")


def _pattern():
    return (
        Pattern.begin("v", lambda r: r["event_type"] == "view")
        .followed_by("c", lambda r: r["event_type"] == "click")
        .followed_by("p", lambda r: r["event_type"] == "purchase")
        .within(3600)
    )


def _run(spark, df, n_chunks):
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=n_chunks, order_col="ts")
    try:
        out = cep(stream, _pattern(), ["user_id"], "ts", "event_id")
        import uuid

        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.table(name).toPandas()
    finally:
        sources.cleanup(tmpdir)


def test_cep_matches_full_sequences(spark, scripted):
    got = _run(spark, scripted, n_chunks=1)
    assert set(got["user_id"]) == {1, 3}
    m1 = got[got.user_id == 1].iloc[0]
    assert list(m1["step_ids"]) == [1, 2, 3]
    m3 = got[got.user_id == 3].iloc[0]
    assert list(m3["step_ids"]) == [8, 9, 10]


def test_cep_state_survives_microbatches(spark, scripted):
    # 3 chunks → user-3's run must be carried in state across batches
    got = _run(spark, scripted, n_chunks=3)
    assert set(got["user_id"]) == {1, 3}


def test_cep_within_expires_runs(spark):
    rows = [
        (1, 1, _ts(0), "view"),
        (2, 1, _ts(2), "click"),
        # purchase 2 hours later — outside within(3600) → run expired
        (3, 1, datetime(2024, 1, 1, 12, 30), "purchase"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = _run(spark, df, n_chunks=1)
    assert len(got) == 0


def test_one_or_more_quantifier(spark):
    """V C+ P: greedy click absorption between view and purchase."""
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import match_recognize

    rows = [
        (1, 1, _ts(1), "view"),
        (2, 1, _ts(2), "click"),
        (3, 1, _ts(3), "click"),
        (4, 1, _ts(4), "click"),
        (5, 1, _ts(5), "purchase"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=1)
    try:
        out = match_recognize(
            stream, ["user_id"], "ts", "V C+ P",
            define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                    "P": "event_type = 'purchase'"},
            id_col="event_id", within_seconds=3600,
        )
        import uuid
        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.table(name).toPandas()
        assert len(got) == 1
        assert list(got.iloc[0]["step_ids"]) == [1, 2, 3, 4, 5]  # all clicks absorbed
    finally:
        sources.cleanup(tmpdir)


def _run_pattern(spark, df, pattern, **kw):
    import uuid
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=1)
    try:
        out = cep(stream, pattern, ["user_id"], "ts", "event_id", **kw)
        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.table(name).toPandas()
    finally:
        sources.cleanup(tmpdir)


_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"


def _ev(eid, minute, etype, value=0.0, uid=1):
    return (eid, uid, _ts(minute), etype, value)


def test_times_quantifier(spark):
    """V C{2} P: exactly two clicks required (Pattern.times)."""
    pat = (Pattern.begin("v", lambda r: r["event_type"] == "view")
           .followed_by("c", lambda r: r["event_type"] == "click").times(2)
           .followed_by("p", lambda r: r["event_type"] == "purchase"))
    ok = spark.createDataFrame(
        [_ev(1, 1, "view"), _ev(2, 2, "click"), _ev(3, 3, "click"), _ev(4, 4, "purchase")],
        _SCHEMA)
    got = _run_pattern(spark, ok, pat)
    assert len(got) == 1 and list(got.iloc[0]["step_ids"]) == [1, 2, 3, 4]
    # only one click → the purchase cannot close the pattern
    short = spark.createDataFrame(
        [_ev(1, 1, "view"), _ev(2, 2, "click"), _ev(3, 3, "purchase")], _SCHEMA)
    assert len(_run_pattern(spark, short, pat)) == 0


def test_optional_quantifier(spark):
    """V C? P: interior optional may be skipped or taken (Pattern.optional)."""
    pat = (Pattern.begin("v", lambda r: r["event_type"] == "view")
           .followed_by("c", lambda r: r["event_type"] == "click").optional()
           .followed_by("p", lambda r: r["event_type"] == "purchase"))
    skipped = spark.createDataFrame(
        [_ev(1, 1, "view"), _ev(2, 2, "purchase")], _SCHEMA)
    got = _run_pattern(spark, skipped, pat)
    assert len(got) == 1 and list(got.iloc[0]["step_ids"]) == [1, 2]
    taken = spark.createDataFrame(
        [_ev(1, 1, "view"), _ev(2, 2, "click"), _ev(3, 3, "purchase")], _SCHEMA)
    got = _run_pattern(spark, taken, pat)
    assert len(got) == 1 and list(got.iloc[0]["step_ids"]) == [1, 2, 3]


def _overlap_events(spark):
    return spark.createDataFrame(
        [_ev(1, 1, "view"), _ev(2, 2, "view"), _ev(3, 3, "click"),
         _ev(4, 4, "purchase"), _ev(5, 5, "click"), _ev(6, 6, "purchase")],
        _SCHEMA)


def _vcp():
    return (Pattern.begin("v", lambda r: r["event_type"] == "view")
            .followed_by("c", lambda r: r["event_type"] == "click")
            .followed_by("p", lambda r: r["event_type"] == "purchase"))


def test_skip_past_last_prunes_overlapping_runs(spark):
    """After a match, partial runs that began before the match end must not
    produce overlapping matches (round-2 ADVICE regression)."""
    got = _run_pattern(spark, _overlap_events(spark), _vcp(), after_match="skip_past_last")
    assert len(got) == 1 and list(got.iloc[0]["step_ids"]) == [1, 3, 4]


def test_no_skip_emits_every_combination(spark):
    """Shared-buffer semantics (NFA.java computeNextStates): both view-runs
    independently take click3/purchase4 — NO SKIP emits BOTH combinations,
    exactly what the reference's CEP produces for this input."""
    got = _run_pattern(spark, _overlap_events(spark), _vcp(), after_match="no_skip")
    ids = sorted(tuple(r) for r in got["step_ids"])
    assert ids == [(1, 3, 4), (2, 3, 4)]


def test_no_skip_one_or_more_emits_prefixes(spark):
    """`a+ b` under NO SKIP: every start position matches maximally (relaxed
    contiguity cannot skip a matching event), giving the reference's
    a1a2b / a2b set; the run also keeps absorbing after an emission."""
    pat = (Pattern.begin("a", lambda r: r["event_type"] == "click").one_or_more()
           .followed_by("b", lambda r: r["event_type"] == "purchase"))
    df = spark.createDataFrame(
        [_ev(1, 1, "click"), _ev(2, 2, "click"), _ev(3, 3, "purchase")], _SCHEMA)
    got = _run_pattern(spark, df, pat, after_match="no_skip")
    ids = sorted(tuple(r) for r in got["step_ids"])
    assert ids == [(1, 2, 3), (2, 3)]
    # and SKIP PAST LAST keeps only the earliest-start maximal match
    got2 = _run_pattern(spark, df, pat, after_match="skip_past_last")
    assert sorted(tuple(r) for r in got2["step_ids"]) == [(1, 2, 3)]


def test_skip_to_first_var(spark):
    """SKIP TO FIRST c: runs started at/after the first click survive."""
    rows = [_ev(1, 1, "view"), _ev(2, 2, "click"), _ev(3, 3, "view"),
            _ev(4, 4, "purchase"), _ev(5, 5, "click"), _ev(6, 6, "purchase")]
    df = spark.createDataFrame(rows, _SCHEMA)
    # match 1 = [1,2,4]; the view at ts3 started AFTER first click (ts2) → kept,
    # completes with click5/purchase6 = [3,5,6]
    got = _run_pattern(spark, df, _vcp(), after_match=("skip_to_first", "c"))
    ids = sorted(tuple(r) for r in got["step_ids"])
    assert ids == [(1, 2, 4), (3, 5, 6)]
    # under skip_past_last the second view (ts3 <= match end ts4) is pruned
    got2 = _run_pattern(spark, df, _vcp(), after_match="skip_past_last")
    assert sorted(tuple(r) for r in got2["step_ids"]) == [(1, 2, 4)]


def test_measures_end_to_end(spark):
    """MATCH_RECOGNIZE with MEASURES + quantifier + AFTER MATCH clause."""
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import match_recognize
    import uuid

    rows = [_ev(1, 1, "view", 1.0), _ev(2, 2, "click", 10.0),
            _ev(3, 3, "click", 20.0), _ev(4, 4, "purchase", 99.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=1)
    try:
        out = match_recognize(
            stream, ["user_id"], "ts", "V C+ P",
            define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                    "P": "event_type = 'purchase'"},
            measures={"n_clicks": "COUNT(C)", "sum_click_val": "SUM(C.value)",
                      "first_click_val": "FIRST(C.value)",
                      "last_click_val": "LAST(C.value)",
                      "purchase_val": "MAX(P.value)"},
            after_match="SKIP PAST LAST ROW",
            id_col="event_id", within_seconds=3600,
        )
        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.table(name).toPandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert r["n_clicks"] == 2 and r["sum_click_val"] == 30.0
        assert r["first_click_val"] == 10.0 and r["last_click_val"] == 20.0
        assert r["purchase_val"] == 99.0
    finally:
        sources.cleanup(tmpdir)


def test_match_recognize_quantifier_parsing(spark):
    """{n} / {n,m} / ? suffixes reach the Pattern builder."""
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import (
        match_recognize, parse_after_match, parse_measure,
    )

    assert parse_measure("SUM(C.value)") == ("sum", "C", "value")
    assert parse_measure("COUNT(C)") == ("count", "C", None)
    assert parse_measure("COUNT(C.*)") == ("count", "C", None)
    assert parse_after_match("SKIP TO LAST C") == ("skip_to_last", "C")
    assert parse_after_match("NO SKIP") == "no_skip"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_measure("MEDIAN(C.value)")

    rows = [_ev(1, 1, "view"), _ev(2, 2, "click"), _ev(3, 3, "click"),
            _ev(4, 4, "purchase")]
    df = spark.createDataFrame(rows, _SCHEMA)
    import uuid
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=1)
    try:
        out = match_recognize(
            stream, ["user_id"], "ts", "V C{2} P?",
            define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                    "P": "event_type = 'purchase'"},
            id_col="event_id",
        )
        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.table(name).toPandas()
        # trailing optional is reluctant (documented): match closes at C{2}
        assert len(got) == 1 and list(got.iloc[0]["step_ids"]) == [1, 2, 3]
    finally:
        sources.cleanup(tmpdir)


def _enumerate_matches(steps, events):
    """Independent brute-force enumeration of every match the shared-buffer
    NFA semantics admit (NO SKIP): capture sequences where gap events never
    match the run's take-condition (mandatory take), saturated runs die when
    a gap event matches a proceed-reachable step, and every completable
    capture prefix emits. `events` = list of event-type strings; returns the
    multiset of matched index tuples."""
    n_steps, n = len(steps), len(events)
    out: list[tuple] = []

    def completable(i, c):
        return c >= steps[i].min_occurs and all(
            s.min_occurs == 0 for s in steps[i + 1:])

    def proceed_targets(i):
        ts = []
        for j in range(i + 1, n_steps):
            ts.append(j)
            if steps[j].min_occurs > 0:
                break
        return ts

    def matches(j, pos):
        return steps[j].where(pd.Series({"event_type": events[pos]}))

    def rec(pos, i, c, captured, just_captured):
        if just_captured and completable(i, c):
            out.append(tuple(captured))
        if pos >= n:
            return
        st = steps[i]
        saturated = st.max_occurs is not None and c >= st.max_occurs
        can_take = not saturated and matches(i, pos)
        if can_take:
            rec(pos + 1, i, c + 1, captured + [pos], True)
        proceed_hit = False
        if c >= st.min_occurs:
            for j in proceed_targets(i):
                if matches(j, pos):
                    proceed_hit = True
                    rec(pos + 1, j, 1, captured + [pos], True)
        if not can_take and not (saturated and proceed_hit):
            rec(pos + 1, i, c, captured, False)  # IGNORE edge survives

    for p in range(n):
        j = 0
        while j < n_steps:
            if matches(j, p):
                rec(p + 1, j, 1, [p], True)
            if steps[j].min_occurs == 0:
                j += 1
                continue
            break
    return sorted(out)


def test_nfa_matches_brute_force_enumeration(spark):
    """Differential test of the branching NFA: 40 random event sequences per
    pattern (one per key, single Spark run) must produce EXACTLY the match
    multiset an independent brute-force enumerator derives from the
    shared-buffer rules."""
    import random

    def mk(t):
        return lambda r, t=t: r["event_type"] == t

    patterns = {
        "abc": Pattern.begin("A", mk("a")).followed_by("B", mk("b")).followed_by("C", mk("c")),
        "ab+c": (Pattern.begin("A", mk("a"))
                 .followed_by("B", mk("b")).one_or_more()
                 .followed_by("C", mk("c"))),
        "ab?c": (Pattern.begin("A", mk("a"))
                 .followed_by("B", mk("b")).optional()
                 .followed_by("C", mk("c"))),
        "a+b": Pattern.begin("A", mk("a")).one_or_more().followed_by("B", mk("b")),
        "ab23c": (Pattern.begin("A", mk("a"))
                  .followed_by("B", mk("b")).times(2, 3)
                  .followed_by("C", mk("c"))),
    }
    rng = random.Random(20260813)
    cases = ["".join(rng.choice("abcd") for _ in range(rng.randint(3, 7)))
             for _ in range(40)]
    rows = []
    for key, seq in enumerate(cases):
        for i, t in enumerate(seq):
            # ids encode (key, position) so expected tuples are reconstructable
            rows.append((key * 100 + i, key, _ts(i), t))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    for pname, pat in patterns.items():
        got = _run_pattern(spark, df, pat, after_match="no_skip")
        got_per_key: dict[int, list[tuple]] = {k: [] for k in range(len(cases))}
        for _, r in got.iterrows():
            got_per_key[r["user_id"]].append(tuple(int(i) % 100 for i in r["step_ids"]))
        for key, seq in enumerate(cases):
            want = _enumerate_matches(pat.steps, list(seq))
            assert sorted(got_per_key[key]) == want, (
                f"pattern {pname} seq {seq!r}: NFA {sorted(got_per_key[key])} "
                f"!= brute force {want}")


def test_match_recognize_define_parsing():
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import compile_predicate
    import pandas as pd

    p = compile_predicate("event_type = 'click' AND value > 10")
    assert p(pd.Series({"event_type": "click", "value": 11}))
    assert not p(pd.Series({"event_type": "click", "value": 9}))
    assert not p(pd.Series({"event_type": "view", "value": 11}))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compile_predicate("event_type IN ('a','b')")
