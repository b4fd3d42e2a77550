"""Unit tests for bench.py helpers (no Spark session needed)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import parse_baseline_rows  # noqa: E402


def test_parse_baseline_rows_header_anchored(tmp_path):
    """Round-8 verdict item 9: only the `| Query | sf | Wall s |` table
    feeds baseline rows — decoy tables with 0.1 in column 3 (a slope
    table, a controls table) must be ignored."""
    md = tmp_path / "BASELINE.md"
    md.write_text(
        "# BASELINE\n"
        "\n"
        "| Operator | t(m1) s | slope | notes |\n"
        "|---|---|---|---|\n"
        "| decoy_slope_op | 0.1 | 1.2 | wall-time-lookalike col |\n"
        "\n"
        "| Query | sf | Wall s | Rows out | Notes |\n"
        "|---|---|---|---|---|\n"
        "| real_q1 | 0.1 | 1.3 | 3 | genuine row |\n"
        "| real_q2 | 0.01 | 0.7 | 10 | genuine row |\n"
        "| bad_sf | 1.0 | 9.9 | 1 | sf not in the accepted set |\n"
        "| not_a_number | 0.1 | n/a | 1 | unparsable wall |\n"
        "\n"
        "prose ends the table\n"
        "\n"
        "| Control | value |\n"
        "|---|---|\n"
        "| decoy_control | 0.1 |\n"
        "| decoy_control2 | 0.1 | 2.5 | x | y |\n"
    )
    rows = parse_baseline_rows(str(md))
    assert rows == {"real_q1": 1.3, "real_q2": 0.7}


def test_parse_baseline_rows_missing_file(tmp_path):
    assert parse_baseline_rows(str(tmp_path / "nope.md")) == {}


def test_parse_baseline_rows_real_file():
    """The real BASELINE.md parses to a substantial per-query map and
    contains no slope-table names."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = parse_baseline_rows(os.path.join(repo, "BASELINE.md"))
    assert len(rows) >= 150
    assert "spatial_bbox_filter" in rows
    assert all(v > 0 for v in rows.values())


def test_compact_summary_driver_parsable():
    """Round-10 verdict item 1: the final stdout line must be small
    enough to survive the driver's ~2 KB tail capture, parse as one
    JSON object, and compare like-for-like against the baseline."""
    import json

    from bench import compact_summary

    timings = {"q_fast": 1.0, "q_slow": 6.0, "q_nobase": 2.0,
               "q_failed": -1.0}
    baseline = {"q_fast": 2.0, "q_slow": 3.0, "decoy_only_in_base": 9.9}
    s = compact_summary(timings, baseline, total=9.0, sf=0.1)
    line = json.dumps(s)
    assert len(line) < 2000
    assert json.loads(line) == s
    assert s["value"] == 9.0
    assert s["n_queries"] == 4 and s["n_failed"] == 1
    # like-for-like: (1.0 + 6.0) / (2.0 + 3.0); q_nobase/q_failed excluded
    assert s["vs_baseline_sum"] == 1.4
    assert s["worst_query"] == "q_slow" and s["worst_ratio"] == 2.0


def test_compact_summary_no_baseline():
    from bench import compact_summary

    s = compact_summary({"q": 1.0}, {}, total=1.0, sf=0.1)
    assert s["vs_baseline_sum"] is None and s["worst_query"] is None


def test_arbitrate_contended_doctored_canary():
    """Round-11 verdict item 2: a doctored contention window must carry
    the per-query min vs the previous record, and ONLY for flagged
    queries — quiet-window measurements stay this run's honest value
    even when the previous record was faster."""
    from bench import arbitrate_contended, compact_summary

    timings = {
        "quiet_fast": 1.0,      # quiet window, prev slower
        "quiet_slow": 4.0,      # quiet window, prev faster — keep 4.0
        "contended_prev": 9.51,  # flagged, prev 5.23 -> arbitrated 5.23
        "contended_new": 7.0,   # flagged, no prev row -> keep 7.0
        "failed": -1.0,         # failed query, flagged — keep -1.0
    }
    canary_ratio = {
        "quiet_fast": 1.0, "quiet_slow": 1.1,
        "contended_prev": 3.32, "contended_new": 2.0, "failed": 3.0,
    }
    prev = {"quiet_fast": 2.0, "quiet_slow": 1.0, "contended_prev": 5.23}
    arb, contended = arbitrate_contended(timings, canary_ratio, prev)
    assert arb["quiet_fast"] == 1.0
    assert arb["quiet_slow"] == 4.0          # no silent min outside windows
    assert arb["contended_prev"] == 5.23     # the r11 false-alarm case
    assert arb["contended_new"] == 7.0
    assert arb["failed"] == -1.0
    assert sorted(contended) == ["contended_new", "contended_prev"]

    # the compact summary's worst_ratio must reflect arbitrated values:
    # raw would report 9.51/4.2 = 2.26x; arbitrated reports 5.23/4.2
    baseline = {"contended_prev": 4.2, "quiet_fast": 1.0, "quiet_slow": 4.0}
    s = compact_summary(arb, baseline, total=sum(
        t for t in arb.values() if t >= 0), sf=0.1)
    assert s["worst_query"] == "contended_prev"
    assert abs(s["worst_ratio"] - round(5.23 / 4.2, 2)) < 1e-9
