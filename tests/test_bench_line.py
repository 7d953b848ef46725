"""Guard: bench.py's machine-readable stdout line must stay inside the
2000-char tail buffer the invoking harness keeps (rounds 4-5 lost their
parsed artifact because the line outgrew it). Simulates worst-case widths
for every HEADLINE query so the check fails at commit time, not at grading
time.
"""

import json

import bench


def test_compact_line_fits_tail_buffer():
    # worst realistic per-query width: name + "999.99"
    worst = {name: 999.99 for name in bench.HEADLINE}
    out = {
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "unit": "sec",
        "cold_total": 99999.999,
        "queries": worst,
        "sf": 0.1,
    }
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"bench JSON line would be {len(line)} chars; trim HEADLINE or drop "
        "optional keys — the harness tail buffer is 2000 chars"
    )


def test_headline_names_resolve():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"HEADLINE names missing from queries(): {missing}"
