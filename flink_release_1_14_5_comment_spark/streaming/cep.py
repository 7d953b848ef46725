"""Streaming CEP: NFA-based pattern matching over keyed streams
(SURVEY §2.9; reference flink-cep — NFA.java:86, Pattern.java:50,
CepOperator.java:81; SQL bridge StreamExecMatch.java:89).

A `Pattern` is a sequence of named steps with per-step predicates (pandas
row → bool), strict contiguity OFF (Flink's `followedBy` relaxed-contiguity
default for MATCH_RECOGNIZE-style skips), an optional `within` horizon, and
after-match SKIP_PAST_LAST_EVENT semantics.

Runtime: one keyed stateful op (`applyInPandasWithState`). State = the set
of partial NFA runs per key (step index + first-event timestamp + captured
event ids). Each micro-batch advances runs event-by-event in timestamp
order — the same per-element NFA stepping CepOperator does, batched by
micro-batch. Completed matches are emitted with their captured event ids.

Scale: runs-per-key is bounded by (pattern length × events inside the
`within` horizon); expired runs are pruned every batch, so state stays
O(active windows), matching the reference's NFA state pruning ("within"
timeout, NFA.java advanceTime).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


@dataclass
class Step:
    name: str
    where: Callable[[pd.Series], bool]
    one_or_more: bool = False  # Pattern.oneOrMore() quantifier (greedy)


@dataclass
class Pattern:
    """Fluent pattern builder (reference Pattern.java:50 subset:
    begin/followedBy/oneOrMore/within)."""

    steps: list[Step] = field(default_factory=list)
    within_seconds: float | None = None

    @classmethod
    def begin(cls, name: str, where: Callable[[pd.Series], bool]) -> "Pattern":
        return cls(steps=[Step(name, where)])

    def followed_by(self, name: str, where: Callable[[pd.Series], bool]) -> "Pattern":
        self.steps.append(Step(name, where))
        return self

    def one_or_more(self) -> "Pattern":
        """Apply a one-or-more quantifier to the last step (Pattern.oneOrMore)."""
        self.steps[-1].one_or_more = True
        return self

    def within(self, seconds: float) -> "Pattern":
        self.within_seconds = seconds
        return self


def cep(
    df: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Match `pattern` per key; emit one row per completed match:
    key_cols + [match_start ts, match_end ts, step ids as array<long>]."""
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["match_start " + dtypes[ts_col], "match_end " + dtypes[ts_col],
           "step_ids array<long>"]
    )
    # Runs serialized as parallel arrays: step index, start micros, captured ids (flattened).
    state_schema = "steps array<int>, starts array<bigint>, captured array<string>"
    n_steps = len(pattern.steps)
    horizon = pattern.within_seconds
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values([ts_col, id_col], kind="stable")
        if state.exists:
            steps, starts, captured = state.get
            runs = [
                {"step": steps[i], "start": starts[i],
                 "ids": [int(x) for x in captured[i].split(",") if x != ""]}
                for i in range(len(steps))
            ]
        else:
            runs = []
        matches = []
        for _, row in batch.iterrows():
            t_micros = int(pd.Timestamp(row[ts_col]).value // 1000)
            # prune expired runs (reference: NFA advanceTime pruning)
            if horizon is not None:
                runs = [r for r in runs if t_micros - r["start"] <= horizon * 1e6]
            # try to advance existing runs (earliest-first = reference's
            # priority order), then maybe start a new run
            advanced = False
            for r in runs:
                if r["step"] >= n_steps:
                    continue
                # advance to the next step...
                if pattern.steps[r["step"]].where(row):
                    r["step"] += 1
                    r["ids"].append(int(row[id_col]))
                    advanced = True
                    if r["step"] == n_steps:
                        matches.append((r["start"], t_micros, r["ids"]))
                    break  # one event advances at most one run (no-reuse)
                # ...or absorb into the previous step's one-or-more loop
                if (
                    r["step"] > 0
                    and pattern.steps[r["step"] - 1].one_or_more
                    and pattern.steps[r["step"] - 1].where(row)
                ):
                    r["ids"].append(int(row[id_col]))
                    advanced = True
                    break
            if not advanced and pattern.steps[0].where(row):
                run = {"step": 1, "start": t_micros, "ids": [int(row[id_col])]}
                if n_steps == 1:
                    matches.append((t_micros, t_micros, run["ids"]))
                else:
                    runs.append(run)
            # SKIP_PAST_LAST_EVENT: drop runs consumed into a match
            runs = [r for r in runs if r["step"] < n_steps]
        state.update((
            [r["step"] for r in runs],
            [r["start"] for r in runs],
            [",".join(str(i) for i in r["ids"]) for r in runs],
        ))
        if matches:
            out = pd.DataFrame({
                "match_start": [pd.Timestamp(m[0] * 1000) for m in matches],
                "match_end": [pd.Timestamp(m[1] * 1000) for m in matches],
                "step_ids": [m[2] for m in matches],
            })
            for i in range(n_keys):
                out[key_cols[i]] = key[i]
            yield out[key_cols + ["match_start", "match_end", "step_ids"]]

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )
