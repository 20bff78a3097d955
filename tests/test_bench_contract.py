"""The bench artifact's parse contract (bench.py):

The round driver records only the final ~2000 bytes of bench stdout
and parses the last JSON line it finds there.  Round 7's artifact came
back "parsed": null because the single full-detail line outgrew the
window — the fix is a compact summary line printed LAST, and this test
pins its budget so per-round artifact growth can never silently break
the parse again.
"""

import json

from bench import EXTENDED, HEADLINE, compact_summary


def _fat_out():
    """A worst-case realistic `out`: every headline query timed with a
    wide float repr, both scale points present with child-mode flags,
    plus the full extended/duckdb detail the compact line must NOT
    carry over."""
    per_query = {name: 12345.678 for name in HEADLINE}
    detail = {name: 12345.678 for name in HEADLINE + EXTENDED}
    point = {
        "sf": 2.0,
        "value": 12345.678,
        "queries": dict(per_query),
        "duckdb_total": 12345.678,
        "duckdb_queries": dict(detail),
        "extended": {n: 12345.678 for n in EXTENDED},
        "extended_mode": "in-process-fallback",
        "skew_receipt": {
            "unsalted_noaqe": 1.0,
            "unsalted_aqe": 1.0,
            "salted32_partial": 1.0,
        },
    }
    return {
        "metric": "headline_queries_total_wall",
        "value": 12345.678,
        "unit": "sec",
        "queries": per_query,
        "extended": {n: 12345.678 for n in EXTENDED},
        "sf": 0.1,
        "duckdb_total": 12345.678,
        "duckdb_queries": dict(per_query),
        "scale2": dict(point),
        "scale3": dict(point),
    }


def test_compact_line_fits_the_driver_tail_window():
    line = json.dumps(compact_summary(_fat_out()))
    # hard budget well under the ~2000-byte tail: leaves room for the
    # clipped end of the detail line and both newlines
    assert len(line) <= 900, len(line)


def test_compact_line_carries_the_graded_fields():
    c = compact_summary(_fat_out())
    assert c["metric"] == "headline_queries_total_wall"
    assert set(c["queries"]) == set(HEADLINE)
    for key in ("value", "unit", "sf", "duckdb_total"):
        assert key in c
    for point in ("scale2", "scale3"):
        assert set(c[point]) == {
            "sf", "value", "duckdb_total", "extended_mode",
        }


def test_compact_omits_scale_points_absent_from_detail():
    out = _fat_out()
    del out["scale2"], out["scale3"]
    c = compact_summary(out)
    assert "scale2" not in c and "scale3" not in c
