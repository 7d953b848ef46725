"""Guard: bench.py's machine-readable stdout line must stay inside the
2000-char tail buffer the invoking harness keeps (rounds 4-5 lost their
parsed artifact because the line outgrew it). Simulates worst-case widths
for every HEADLINE query so the check fails at commit time, not at grading
time.
"""

import json

import bench


def _line(extra: dict, per_query: float) -> str:
    out = {
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "unit": "sec",
        "queries": {name: per_query for name in bench.HEADLINE},
        "sf": 0.1,
    }
    out.update(extra)
    return json.dumps(out, separators=(",", ":"))


def test_compact_line_fits_tail_buffer():
    # Hard guarantee: even at absurd per-query widths (999.9 s each), the
    # line with the queries map must fit once the shed-cascade has dropped
    # every optional key AND re-rendered per-query values at 1 decimal
    # (bench.py's first shed step since r11 — it fires before any key is
    # dropped, so the queries map survives the worst case).
    line = _line({}, 999.9)
    assert len(line) <= 1900, (
        f"bench JSON line would be {len(line)} chars even with all optional "
        "keys shed and 1-dp values; trim HEADLINE — the harness tail buffer "
        "is 2000 chars"
    )


def test_realistic_line_keeps_noise_discriminators():
    # Realistic widths (every query < 100 s — the slowest ever recorded is
    # ~5 s): cold_total + the host-noise discriminators must all survive, so
    # graded artifacts carry the cpu/steal evidence BENCH_NOTES relies on.
    line = _line(
        {"cold_total": 99999.999, "cpu_sec": 99999.9, "steal_pct": 100.0},
        99.99,
    )
    assert len(line) <= 1900, (
        f"realistic bench line is {len(line)} chars; the noise "
        "discriminators would be shed — trim HEADLINE"
    )


def test_headline_names_resolve():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"HEADLINE names missing from queries(): {missing}"
