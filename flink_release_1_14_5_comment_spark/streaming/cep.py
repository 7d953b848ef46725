"""Streaming CEP: NFA-based pattern matching over keyed streams
(SURVEY §2.9; reference flink-cep — NFA.java:86, Pattern.java:50,
CepOperator.java:81; SQL bridge StreamExecMatch.java:89; skip strategies
AfterMatchSkipStrategy.java).

A `Pattern` is a sequence of named steps with per-step predicates (pandas
row → bool) and quantifiers — ``one_or_more`` (min 1, unbounded),
``times(n[, m])`` (bounded repetition), ``optional`` (min 0) — relaxed
contiguity throughout (Flink's `followedBy`), an optional `within` horizon,
and a configurable after-match skip strategy.

Runtime: one keyed stateful op (`applyInPandasWithState`). State = the set
of partial NFA runs per key (current step, occurrence count at that step,
first-event timestamp, captured (step, id, ts, values) events), serialized
as JSON. Each micro-batch advances runs event-by-event in timestamp order —
the same per-element NFA stepping CepOperator does, batched per micro-batch.

Branching semantics match the reference's shared-buffer NFA
(NFA.java:86 computeNextStates — TAKE / PROCEED / IGNORE edges under
relaxed contiguity):
  * an event matching a run's current take-condition MUST be taken (the
    IGNORE edge carries ¬take — `followedBy` skips only non-matching
    events), so one physical event CAN advance several runs;
  * when an event matches both a loop's take-condition and a later step,
    the run BRANCHES into both (every combination is explored); ``greedy``
    on a step suppresses the proceed-branch while the loop can still
    absorb (Pattern.greedy());
  * a run whose loop cannot take the event but whose next step can keeps
    an ignore-copy alive alongside the proceed-branch (the loop may absorb
    later events);
  * every event matching the begin step (or an optional-prefix step) seeds
    a new run, regardless of what other runs consumed;
  * a branch reaching a completable configuration (count ≥ min and all
    later steps optional) emits immediately and stays alive if it can
    still extend — `a b+` emits every prefix under NO SKIP, exactly the
    reference's combination semantics.

Scale: live runs per key are bounded by (branching factor × events inside
the `within` horizon); expired runs are pruned every batch, so state stays
O(active windows), matching the reference's NFA pruning (NFA.advanceTime).
The skip strategies prune aggressively (SKIP PAST LAST keeps state near
one run per key); NO_SKIP is the expensive mode in both engines.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# After-match skip strategies (AfterMatchSkipStrategy.java).
NO_SKIP = "no_skip"
SKIP_TO_NEXT = "skip_to_next"
SKIP_PAST_LAST = "skip_past_last"
SKIP_TO_FIRST = "skip_to_first"   # use ("skip_to_first", "VAR")
SKIP_TO_LAST = "skip_to_last"     # use ("skip_to_last", "VAR")

# MEASURES aggregates → output Spark type ('@src' = the source column type).
_MEASURE_TYPES = {
    "count": "long", "sum": "double", "avg": "double",
    "first": "@src", "last": "@src", "min": "@src", "max": "@src",
}


@dataclass
class Step:
    name: str
    where: Callable[[pd.Series], bool]
    min_occurs: int = 1
    max_occurs: int | None = 1  # None = unbounded
    greedy: bool = False  # prefer the loop over proceeding (Pattern.greedy)


@dataclass
class Pattern:
    """Fluent pattern builder (reference Pattern.java:50 quantifier surface:
    begin/followedBy/oneOrMore/times/optional/within)."""

    steps: list[Step] = field(default_factory=list)
    within_seconds: float | None = None

    @classmethod
    def begin(cls, name: str, where: Callable[[pd.Series], bool]) -> "Pattern":
        return cls(steps=[Step(name, where)])

    def followed_by(self, name: str, where: Callable[[pd.Series], bool]) -> "Pattern":
        self.steps.append(Step(name, where))
        return self

    def one_or_more(self) -> "Pattern":
        """One-or-more quantifier on the last step (Pattern.oneOrMore)."""
        self.steps[-1].min_occurs = 1
        self.steps[-1].max_occurs = None
        return self

    def times(self, n: int, m: int | None = None) -> "Pattern":
        """Exactly n (or n..m) occurrences of the last step (Pattern.times)."""
        if n < 1 or (m is not None and m < n):
            raise ValueError(f"invalid times({n}, {m})")
        self.steps[-1].min_occurs = n
        self.steps[-1].max_occurs = m if m is not None else n
        return self

    def optional(self) -> "Pattern":
        """The last step may be skipped entirely (Pattern.optional)."""
        self.steps[-1].min_occurs = 0
        return self

    def greedy(self) -> "Pattern":
        """Make the last (quantified) step greedy: while it can still absorb,
        the proceed-branch to later steps is suppressed (Pattern.greedy();
        like the reference, greedy on the FINAL step is meaningless — there
        is nothing to proceed to)."""
        self.steps[-1].greedy = True
        return self

    def within(self, seconds: float) -> "Pattern":
        self.within_seconds = seconds
        return self


def _parse_skip(after_match) -> tuple[str, str | None]:
    if isinstance(after_match, tuple):
        strategy, var = after_match
        if strategy not in (SKIP_TO_FIRST, SKIP_TO_LAST):
            raise ValueError(f"unknown skip strategy: {after_match!r}")
        return strategy, var
    if after_match not in (NO_SKIP, SKIP_TO_NEXT, SKIP_PAST_LAST):
        raise ValueError(f"unknown skip strategy: {after_match!r}")
    return after_match, None


def cep(
    df: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    after_match: str | tuple[str, str] = SKIP_PAST_LAST,
    measures: dict[str, tuple[str, str, str | None]] | None = None,
) -> DataFrame:
    """Match `pattern` per key; emit one row per completed match:
    key_cols + [match_start, match_end, step_ids] + one column per measure.

    ``measures``: {out_name: (agg, var, col)} with agg in
    first/last/min/max/sum/count/avg computed over the events captured by
    pattern variable ``var`` (col=None for count) — the MEASURES projection
    of MATCH_RECOGNIZE, evaluated at match completion from captured values.
    """
    strategy, skip_var = _parse_skip(after_match)
    measures = measures or {}
    dtypes = dict(df.dtypes)
    step_names = [s.name for s in pattern.steps]
    if skip_var is not None and skip_var not in step_names:
        raise ValueError(f"skip variable {skip_var!r} not a pattern step")
    # columns whose values must be captured in run state for MEASURES
    need_cols = sorted({col for (_agg, _var, col) in measures.values() if col})
    measure_fields = []
    for out_name, (agg, var, col) in measures.items():
        if agg not in _MEASURE_TYPES:
            raise ValueError(f"unsupported measure aggregate: {agg!r}")
        if var not in step_names:
            raise ValueError(f"measure variable {var!r} not a pattern step")
        out_t = _MEASURE_TYPES[agg]
        measure_fields.append(f"{out_name} {dtypes[col] if out_t == '@src' else out_t}")
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["match_start " + dtypes[ts_col], "match_end " + dtypes[ts_col],
           "step_ids array<long>"]
        + measure_fields
    )
    state_schema = "runs array<string>"
    steps = pattern.steps
    n_steps = len(steps)
    horizon = pattern.within_seconds
    n_keys = len(key_cols)
    measure_names = list(measures.keys())

    def consume(run: dict, step_idx: int, row: pd.Series, t_micros: int) -> None:
        vals = [None if pd.isna(row[c]) else
                (row[c].item() if hasattr(row[c], "item") else row[c])
                for c in need_cols]
        run["ev"].append([step_idx, int(row[id_col]), t_micros, vals])

    def clone(run: dict) -> dict:
        return {"s": run["s"], "c": run["c"], "t0": run["t0"], "ev": list(run["ev"])}

    def successors(run: dict, row: pd.Series, t_micros: int) -> tuple[list[dict], bool]:
        """Shared-buffer branching (NFA.computeNextStates): return the
        TAKE/PROCEED successor runs for this event plus whether the original
        run survives unchanged (the IGNORE edge). Empty successors + survive
        = relaxed-contiguity skip of a non-matching event."""
        i, c = run["s"], run["c"]
        st = steps[i]
        branches: list[dict] = []
        can_take = (st.max_occurs is None or c < st.max_occurs) and st.where(row)
        if can_take:
            nr = clone(run)
            nr["c"] = c + 1
            consume(nr, i, row, t_micros)
            branches.append(nr)
            if st.greedy:
                return branches, False  # greedy loop: no proceed while absorbing
        if c >= st.min_occurs:
            j = i + 1
            while j < n_steps:
                sj = steps[j]
                if sj.where(row):
                    nr = clone(run)
                    nr["s"], nr["c"] = j, 1
                    consume(nr, j, row, t_micros)
                    branches.append(nr)
                if sj.min_occurs == 0:
                    j += 1  # optional: branch above AND keep walking past it
                    continue
                break
        if can_take:
            return branches, False  # matching the take-condition forbids IGNORE
        if branches and (st.max_occurs is not None and c >= st.max_occurs):
            # saturated singleton/loop: the proceed IS this run's only edge —
            # `a followedBy b` matches the FIRST b, not every later one
            return branches, False
        # loop still absorbable (event didn't match it): ignore-copy survives
        return branches, True

    def has_future(run: dict) -> bool:
        """Can this run still change (absorb or proceed on a later event)?"""
        i, c = run["s"], run["c"]
        return (steps[i].max_occurs is None or c < steps[i].max_occurs) or i < n_steps - 1

    def is_complete(run: dict) -> bool:
        i, c = run["s"], run["c"]
        if c < steps[i].min_occurs:
            return False
        return all(s.min_occurs == 0 for s in steps[i + 1:])

    def var_ts(run: dict, var: str, first: bool) -> int:
        idxs = [e[2] for e in run["ev"] if step_names[e[0]] == var]
        return (min(idxs) if first else max(idxs)) if idxs else run["t0"]

    def compute_measures(run: dict) -> list:
        out = []
        for name in measure_names:
            agg, var, col = measures[name]
            ev = [e for e in run["ev"] if step_names[e[0]] == var]
            if agg == "count":
                out.append(len(ev))
                continue
            vals = [e[3][need_cols.index(col)] for e in ev]
            vals = [v for v in vals if v is not None]
            if not vals:
                out.append(None)
            elif agg == "first":
                out.append(vals[0])
            elif agg == "last":
                out.append(vals[-1])
            elif agg == "min":
                out.append(min(vals))
            elif agg == "max":
                out.append(max(vals))
            elif agg == "sum":
                out.append(float(sum(vals)))
            elif agg == "avg":
                out.append(float(sum(vals)) / len(vals))
        return out

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values([ts_col, id_col], kind="stable")
        runs: list[dict] = [json.loads(r) for r in state.get[0]] if state.exists else []
        matches: list[tuple[int, int, list, list]] = []
        for _, row in batch.iterrows():
            t_micros = int(pd.Timestamp(row[ts_col]).value // 1000)
            if horizon is not None:
                runs = [r for r in runs if t_micros - r["t0"] <= horizon * 1e6]
            next_runs: list[dict] = []
            fresh: list[dict] = []  # branches created by THIS event
            for r in runs:
                branches, survive = successors(r, row, t_micros)
                if survive:
                    next_runs.append(r)
                next_runs.extend(branches)
                fresh.extend(branches)
            # unconditional seeding: every event matching the begin step (or
            # an optional-prefix step) starts a new run — shared-buffer
            # semantics explore every start position
            j = 0
            while j < n_steps:
                if steps[j].where(row):
                    seed = {"s": j, "c": 1, "t0": t_micros, "ev": []}
                    consume(seed, j, row, t_micros)
                    next_runs.append(seed)
                    fresh.append(seed)
                if steps[j].min_occurs == 0:
                    j += 1
                    continue
                break
            runs = next_runs
            # emit completed branches (creation order = earliest start first),
            # applying the after-match skip strategy between emissions
            # (AfterMatchSkipStrategy.java)
            completed = [r for r in fresh if is_complete(r)]
            while completed:
                m = completed.pop(0)
                matches.append((m["t0"], t_micros, [e[1] for e in m["ev"]],
                                compute_measures(m)))
                if not has_future(m):
                    runs = [r for r in runs if r is not m]
                if strategy == SKIP_PAST_LAST:
                    # discard every run/pending match overlapping the emission
                    runs = [r for r in runs if r["t0"] > t_micros]
                    completed = [r for r in completed if r["t0"] > t_micros]
                elif strategy == SKIP_TO_NEXT:
                    runs = [r for r in runs if r["t0"] > m["t0"]]
                    completed = [r for r in completed if r["t0"] > m["t0"]]
                elif strategy in (SKIP_TO_FIRST, SKIP_TO_LAST):
                    cut = var_ts(m, skip_var, first=(strategy == SKIP_TO_FIRST))
                    if strategy == SKIP_TO_FIRST and cut <= m["t0"]:
                        # the reference throws here: skipping to the first
                        # row of the match (or to a variable absent from it)
                        # would re-start at the same position forever
                        # (AfterMatchSkipStrategy.java SkipToFirstStrategy)
                        raise RuntimeError(
                            f"Could not skip to first element of a match: "
                            f"AFTER MATCH SKIP TO FIRST {skip_var} points at "
                            "the match start (infinite loop) — Flink raises "
                            "the same way")
                    runs = [r for r in runs if r["t0"] >= cut]
                    completed = [r for r in completed if r["t0"] >= cut]
                # NO_SKIP: everything keeps going — every combination emits
        state.update(([json.dumps(r) for r in runs],))
        if matches:
            out = pd.DataFrame({
                "match_start": [pd.Timestamp(m[0] * 1000) for m in matches],
                "match_end": [pd.Timestamp(m[1] * 1000) for m in matches],
                "step_ids": [m[2] for m in matches],
            })
            for mi, name in enumerate(measure_names):
                out[name] = [m[3][mi] for m in matches]
            for i in range(n_keys):
                out[key_cols[i]] = key[i]
            yield out[key_cols + ["match_start", "match_end", "step_ids"] + measure_names]

    if df.isStreaming:
        return (
            df.groupBy(*key_cols)
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.NoTimeout)
        )

    # Batch: each key's full history arrives as ONE group, so the identical
    # NFA loop runs with an in-memory state shim — the reference's batch
    # MATCH_RECOGNIZE is likewise the same NFA over sorted bounded input
    # (MatchCodeGenerator reuses the CepOperator machinery).
    out_cols = (key_cols + ["match_start", "match_end", "step_ids"]
                + measure_names)

    class _BatchState:
        exists = False
        get = None

        def update(self, v):
            self.get = v
            self.exists = True

    def batch_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        frames = list(fn(key, iter([pdf]), _BatchState()))
        if frames:
            return pd.concat(frames, ignore_index=True)
        return pd.DataFrame(columns=out_cols)

    return df.groupBy(*key_cols).applyInPandas(batch_fn, out_schema)
