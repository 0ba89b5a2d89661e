"""The driver records bench.py's stdout via a ~2,000-char tail capture;
r4's full-dict line (3.3 KB) was front-truncated and recorded as
`parsed: null` (VERDICT r4 §What's wrong #1). These tests pin the fix:
the ONE stdout line stays under bench.STDOUT_LINE_BUDGET (1,500 bytes)
at the CURRENT headline query count, with worst-case name lengths and
timing widths, and stays valid JSON with the headline total up front.
"""

import json

import bench


def _worst_case_timings():
    # every headline query at a 4-digit-seconds, 3-decimal timing —
    # wider than anything we've ever measured
    return {name: 9999.999 for name in bench.HEADLINE}


def test_compact_line_under_budget_at_current_query_count():
    line = bench.compact_line(
        _worst_case_timings(), sf=0.1, cpus=128, parallelism=128
    )
    assert len(line) < bench.STDOUT_LINE_BUDGET, (
        f"stdout bench line is {len(line)} bytes; the driver keeps only "
        "the last ~2000 chars of output and json.loads it — shrink the "
        "compact line (bench.compact_line), don't grow it"
    )


def test_compact_line_parses_with_headline_fields():
    line = bench.compact_line(
        _worst_case_timings(), sf=0.1, cpus=8, parallelism=8
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert abs(parsed["value"] - 9999.999 * len(bench.HEADLINE)) < 0.5
    # the per-query dict is intentionally truncated to the 10 slowest
    assert len(parsed["queries"]) <= 10
    # the $SPARK_GRAFT_CPUS observability contract (r13 VERDICT #2):
    # the line must prove which core count the session actually ran at
    assert parsed["cpus"] == 8
    assert parsed["parallelism"] == 8


def test_compact_line_is_single_line():
    line = bench.compact_line(_worst_case_timings(), sf=0.1)
    assert "\n" not in line
