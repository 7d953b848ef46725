"""Compare two bench artifacts (BENCH_r{N}.json) the way BENCH_NOTES
does by hand: shared-query totals, per-query movers, and the host-noise
verdict the cpu_sec/steal_pct discriminators enable.

Noise signature (BENCH_NOTES round-10 session-2 record): uniform
additive inflation on cheap queries + roughly flat ratios on expensive
ones, wall far above cpu_sec/cores, high steal. Plan regressions are the
opposite: isolated movers with flat neighbors.

Usage:  python tests/bench_diff.py BENCH_r09.json BENCH_r10.json [cores]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    def load(path):
        art = json.load(open(path))
        if "tail" in art:  # driver wrapper: bench stdout tail as a string
            lines = [ln for ln in art["tail"].splitlines()
                     if ln.startswith('{"metric"')]
            if not lines:
                raise SystemExit(f"{path}: no machine line in tail")
            art = json.loads(lines[-1])
        return art

    a, b = load(a_path), load(b_path)
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    ta, tb = sum(qa[q] for q in shared), sum(qb[q] for q in shared)

    print(f"A = {a_path}: total {a.get('value')}s over {len(qa)} queries")
    print(f"B = {b_path}: total {b.get('value')}s over {len(qb)} queries")
    if ta > 0:
        print(f"shared {len(shared)} queries: {ta:.1f}s -> {tb:.1f}s "
              f"({(tb - ta) / ta * 100:+.1f}%)")
    else:
        print(f"shared {len(shared)} queries (no timed overlap — an "
              "artifact may have shed its queries map; see its stderr log)")
    if only_a:
        print(f"only in A: {', '.join(only_a)}")
    if only_b:
        print(f"only in B: {', '.join(only_b)}")

    for tag, art in (("A", a), ("B", b)):
        cpu, steal = art.get("cpu_sec"), art.get("steal_pct")
        if cpu is not None:
            floor = cpu / cores
            print(f"{tag}: cpu_sec={cpu} -> fully-parallel floor "
                  f"~{floor:.0f}s for the whole run (cold+warm)"
                  + (f", steal={steal}%" if steal is not None else ""))

    movers = sorted(
        ((q, qa[q], qb[q]) for q in shared),
        key=lambda t: -abs(t[2] - t[1]))
    print("\nbiggest absolute movers (shared set):")
    for q, va, vb in movers[:12]:
        ratio = vb / va if va else float("inf")
        print(f"  {q:32s} {va:6.2f} -> {vb:6.2f}  ({ratio:5.2f}x, "
              f"{vb - va:+.2f}s)")

    # noise heuristic: median per-query ratio vs spread of ratios
    ratios = sorted(vb / va for _, va, vb in movers if va > 0)
    if ratios:
        med = ratios[len(ratios) // 2]
        if len(ratios) >= 20:  # percentiles only meaningful with depth
            spread = (f"(p10 {ratios[len(ratios) // 10]:.2f}x, "
                      f"p90 {ratios[-(len(ratios) // 10)]:.2f}x)")
        else:
            spread = f"(min {ratios[0]:.2f}x, max {ratios[-1]:.2f}x)"
        print(f"\nmedian per-query ratio: {med:.2f}x {spread}")
        print("uniform ratio shift => host-speed delta; isolated outliers "
              "above a flat median => plan regressions. Compare against the "
              "best same-commit idle reading in BENCH_NOTES, not across "
              "hosts.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
