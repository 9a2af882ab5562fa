"""The bench report generator (tools/bench_report.py — the
benchmarks/04-benchmark-plots.R parity surface) must keep rendering
the committed artifacts: every committed round appears, every
latest-round query gets a row, and sf1 artifacts get scaling ratios.
No SparkSession needed."""

from __future__ import annotations

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_report", os.path.join(ROOT, "tools", "bench_report.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_report"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_report_renders_committed_artifacts(tmp_path):
    br = _load()
    rounds = br.load_rounds()
    assert len(rounds) >= 7  # every committed BENCH_r*.json parses
    sf1 = br.load_sf1()
    report = br.render(rounds, sf1)
    for r in rounds:
        assert f"| r{r:02d} |" in report
    latest = rounds[max(rounds)]
    for q in latest["queries"]:
        assert f"| {q} |" in report
    # sf1 artifacts committed → the scaling section must render
    if sf1:
        assert "Scaling shape" in report
        assert "ratio" in report
    # baseline comparison table always present
    assert "vs reference baseline" in report
    out = tmp_path / "r.md"
    out.write_text(report)
    assert out.stat().st_size > 1_000


def test_bench_report_main_writes_default_target(tmp_path, monkeypatch):
    br = _load()
    target = tmp_path / "BENCH_REPORT.md"
    # monkeypatch restores the original argv after the test — a bare
    # assignment would leak into every later test in the process
    monkeypatch.setattr(sys, "argv", ["bench_report.py", "--out", str(target)])
    br.main()
    assert target.exists() and target.stat().st_size > 1_000
    # the two scaling-curve SVGs render next to the report and are
    # embedded in it (benchmarks/04-benchmark-plots.R parity)
    report = target.read_text()
    for fname, _title, _keys in br.CHART_SPECS:
        svg = tmp_path / fname
        assert svg.exists(), f"{fname} not rendered"
        assert f"]({fname})" in report
        body = svg.read_text()
        assert body.startswith("<svg") and body.rstrip().endswith("</svg>")
        # well-formed XML with in-bounds geometry
        import xml.etree.ElementTree as ET

        root = ET.fromstring(body)
        w = float(root.get("width"))
        h = float(root.get("height"))
        ns = "{http://www.w3.org/2000/svg}"
        for c in root.iter(f"{ns}circle"):
            assert 0 <= float(c.get("cx")) <= w
            assert 0 <= float(c.get("cy")) <= h
        # a polyline per series with data
        assert len(list(root.iter(f"{ns}path"))) >= 1


def test_curve_svg_handles_gaps_and_missing_rounds():
    """A key absent in some rounds renders with a gap, not a crash;
    a chart whose keys never appear is skipped entirely."""
    br = _load()
    svg = br.render_curve_svg(
        "t", [1, 2, 3], {"a": [0.5, None, 0.25], "b": [None, 1.0, None]}
    )
    assert svg.count("<path") == 2
    written = br.write_charts(
        {1: {"queries": {"unrelated": 1.0}, "value": 1.0}}, "/tmp"
    )
    assert written == []


def test_bench_compact_line_fits_driver_tail_window():
    """The driver parses bench.py's LAST stdout line through a
    ~2,000-char tail window; round 9's full line (3.1 kB) overflowed
    it and the round's bench evidence was unparseable.  The compact
    summary must stay inside the budget for any realistic key count,
    keep the most expensive keys, and declare what it omitted."""
    import json

    import bench

    full = {
        "metric": "headline_queries_total",
        "value": 60.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {
            f"a_realistically_long_key_name_{i:03d}": round(0.01 * i, 3)
            for i in range(120)
        },
        "iqr": {},
    }
    compact = bench.compact_line(full)
    line = json.dumps(compact)
    assert len(line) <= bench.COMPACT_BUDGET <= 1600
    # most expensive kept, cheapest dropped, truncation declared
    assert "a_realistically_long_key_name_119" in compact["queries"]
    assert "a_realistically_long_key_name_000" not in compact["queries"]
    assert compact["n_queries"] == 120
    assert compact["omitted"] == 120 - len(compact["queries"])
    assert compact["value"] == full["value"]
    assert "iqr" not in compact
    # the split ground-truth-baseline total (r11 verdict item 6) rides
    # along in the compact line, defaulting to 0 when absent upstream
    assert compact["baseline_queries_total"] == 0.0
    split = dict(full, baseline_queries_total=42.5)
    assert bench.compact_line(split)["baseline_queries_total"] == 42.5

    # small run: nothing omitted, line still tiny
    small = dict(full, queries={"q1": 1.0, "q2": 2.0})
    csmall = bench.compact_line(small)
    assert csmall["omitted"] == 0
    assert csmall["queries"] == small["queries"]


def test_compact_line_stays_under_budget_as_keys_grow():
    """r10 verdict item 8: the driver tails ~2,000 chars of output;
    compact_line promises the serialized line fits COMPACT_BUDGET no
    matter how many (or how long-named) bench keys exist, while
    n_queries/omitted keep the truncation explicit.  200 keys with
    adversarially long names must not crowd the envelope fields."""
    import json

    from bench import COMPACT_BUDGET, compact_line

    timings = {
        f"extremely_long_query_name_with_suffix_{i:04d}_and_padding": float(
            i
        )
        / 7.0
        for i in range(200)
    }
    full = {
        "metric": "suite_seconds",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "queries": timings,
    }
    line = compact_line(full)
    assert len(json.dumps(line)) <= COMPACT_BUDGET
    assert line["n_queries"] == 200
    assert line["omitted"] == 200 - len(line["queries"])
    assert line["omitted"] > 0  # 200 long keys cannot all fit
    # most-expensive-first: every kept timing >= every omitted one
    kept = set(line["queries"])
    m = min(line["queries"].values())
    assert all(timings[k] <= m for k in timings if k not in kept)
