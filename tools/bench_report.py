"""Render the committed bench JSON artifacts into BENCH_REPORT.md —
the markdown analog of the reference's plotting stage
(benchmarks/04-benchmark-plots.R:1-139, which renders the scaling
curves of benchmarks/01-03 with ggplot).

    python tools/bench_report.py [--out BENCH_REPORT.md]

Inputs (repo root, all optional except at least one BENCH_r*.json):
- BENCH_r{NN}.json     — driver per-round runs ({"parsed": payload})
- BENCH_sf1*.json      — 10x scale-shape runs (bare payload)
- BASELINE.md          — reference numbers, cited in the static
                         comparison table below

Sections: per-round headline totals with bars, a per-query matrix over
the last rounds with a last-vs-previous delta, the sf0.1 -> sf1
scaling ratio per query, and the reference-baseline comparison.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import BASELINE_QUERIES, EVIDENCE_QUERIES  # noqa: E402  (constants only)

# Reference numbers transcribed from BASELINE.md (the reference's
# published benchmark CSVs); the mapping to our bench keys is the one
# documented in TESTDATA.md's golden-count section.
BASELINE_ROWS = [
    ("filter_test_per_gene_median", "per-gene filter, median",
     "0.053 s (exome) / 0.156 s (genome)"),
    ("pull_random_ids_1000", "pull 1,000 random ids",
     "35.7 s (1 core) / 11.7 s (16 cores)"),
    ("pull_geno_gene", "gene genotype pull", "4.76-11.0 s"),
    ("pull_wide_100x2504", "wide-cohort pull (2,504 samples)",
     "4.6-42.9 s"),
]

MAX_ROUND_COLS = 5

# The two committed scaling-curve charts — the SVG analog of the
# reference's vcfdb-filter-plot.pdf / vcfdb-pull-plot.pdf
# (benchmarks/04-benchmark-plots.R).  Colors are the first four slots
# of the skill-validated categorical order (adjacent-pair CVD ΔE 9.1,
# normal-vision 22.9, both PASS; the two sub-3:1-contrast hues carry
# the relief rule via direct end labels + the report's tables).
CHART_SPECS = [
    (
        "bench_filter_curve.svg",
        "Filter-test latency per round (sf0.1, seconds)",
        [
            "filter_test_per_gene_median",
            "filter_test_per_gene_max",
            "per_gene_counts_all",
            "interval_query",
        ],
    ),
    (
        "bench_pull_curve.svg",
        "Genotype-pull latency per round (sf0.1, seconds)",
        [
            "pull_random_ids_1000",
            "pull_geno_gene",
            "pull_wide_100x2504",
            "pull_geno_hot_gene_10pct",
        ],
    ),
]

_SERIES_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
_SURFACE, _INK, _INK2, _GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e4e3df"


def _nice_ticks(vmax: float, n: int = 4) -> list[float]:
    """0-based axis with ~n round-number ticks."""
    import math

    if vmax <= 0:
        return [0.0, 1.0]
    mag = 10 ** math.floor(math.log10(vmax / n))
    for mult in (1, 2, 2.5, 5, 10):
        step = mult * mag
        if step * n >= vmax:
            break
    return [round(i * step, 10) for i in range(n + 1)]


def render_curve_svg(
    title: str, rounds: list[int], series: dict[str, list[float | None]]
) -> str:
    """One polyline chart: rounds on x, seconds on y (0-based, one
    axis), 2px lines, 8px markers with a surface ring, recessive
    grid, direct end labels in text ink with a color swatch (the
    legend), native <title> tooltips per marker."""
    w, h, ml, mr, mt, mb = 720, 300, 46, 190, 40, 30
    pw, ph = w - ml - mr, h - mt - mb
    vmax = max(
        (v for vals in series.values() for v in vals if v is not None),
        default=1.0,
    )
    ticks = _nice_ticks(vmax)
    top = ticks[-1]

    def x(i: int) -> float:
        return ml + (pw * i / max(1, len(rounds) - 1))

    def y(v: float) -> float:
        return mt + ph - (ph * v / top)

    p = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'viewBox="0 0 {w} {h}" font-family="system-ui, sans-serif">',
        f'<rect width="{w}" height="{h}" fill="{_SURFACE}"/>',
        f'<text x="{ml}" y="22" font-size="13" font-weight="600" '
        f'fill="{_INK}">{title}</text>',
    ]
    for tv in ticks:
        ty = y(tv)
        p.append(
            f'<line x1="{ml}" y1="{ty:.1f}" x2="{ml + pw}" y2="{ty:.1f}" '
            f'stroke="{_GRID}" stroke-width="1"/>'
        )
        p.append(
            f'<text x="{ml - 6}" y="{ty + 4:.1f}" font-size="11" '
            f'fill="{_INK2}" text-anchor="end">{tv:g}</text>'
        )
    for i, r in enumerate(rounds):
        p.append(
            f'<text x="{x(i):.1f}" y="{h - 10}" font-size="11" '
            f'fill="{_INK2}" text-anchor="middle">r{r:02d}</text>'
        )
    label_ys: list[float] = []
    for si, (name, vals) in enumerate(series.items()):
        color = _SERIES_COLORS[si % len(_SERIES_COLORS)]
        pts = [
            (x(i), y(v)) for i, v in enumerate(vals) if v is not None
        ]
        if not pts:
            continue
        path = " ".join(
            f"{'M' if j == 0 else 'L'}{px:.1f},{py:.1f}"
            for j, (px, py) in enumerate(pts)
        )
        p.append(
            f'<path d="{path}" fill="none" stroke="{color}" '
            f'stroke-width="2" stroke-linejoin="round"/>'
        )
        for (px, py), (r, v) in zip(
            pts,
            [
                (rounds[i], v)
                for i, v in enumerate(vals)
                if v is not None
            ],
        ):
            p.append(
                f'<circle cx="{px:.1f}" cy="{py:.1f}" r="4" fill="{color}" '
                f'stroke="{_SURFACE}" stroke-width="2">'
                f"<title>{name} r{r:02d}: {v:.3f}s</title></circle>"
            )
        # direct end label (doubles as the legend); nudge apart when
        # two series end at the same height
        ly = pts[-1][1] + 4
        while any(abs(ly - o) < 14 for o in label_ys):
            ly += 14
        label_ys.append(ly)
        p.append(
            f'<rect x="{ml + pw + 8}" y="{ly - 9}" width="9" height="9" '
            f'rx="2" fill="{color}"/>'
        )
        p.append(
            f'<text x="{ml + pw + 21}" y="{ly}" font-size="11" '
            f'fill="{_INK2}">{name}</text>'
        )
    p.append("</svg>")
    return "\n".join(p)


def write_charts(rounds: dict[int, dict], out_dir: str) -> list[str]:
    """Render CHART_SPECS next to the report; returns filenames
    actually written (a chart with no data is skipped)."""
    written = []
    rs = sorted(rounds)
    for fname, title, keys in CHART_SPECS:
        series = {
            k: [rounds[r]["queries"].get(k) for r in rs] for k in keys
        }
        series = {
            k: v for k, v in series.items() if any(x is not None for x in v)
        }
        if not series:
            continue
        with open(os.path.join(out_dir, fname), "w") as fh:
            fh.write(render_curve_svg(title, rs, series))
        written.append(fname)
    return written


def _payload(path: str) -> dict | None:
    with open(path) as fh:
        doc = json.load(fh)
    doc = doc.get("parsed", doc)
    if isinstance(doc, dict) and isinstance(doc.get("queries"), dict):
        return doc
    return None


def _bar(value: float, vmax: float, width: int = 24) -> str:
    n = 0 if vmax <= 0 else max(1, round(width * value / vmax))
    return "█" * n


def load_rounds() -> dict[int, dict]:
    """Per-round bench payloads, PREFERRING the full local snapshot.

    Since round 10 the driver-facing BENCH_r*.json carries only a
    compact summary (top keys, no ``iqr`` — its final stdout line must
    fit the driver's ~2,000-char tail window; see bench.compact_line),
    while BENCH_LOCAL_r*.json keeps every key plus per-key IQR.  The
    per-query table and the drift band need the full detail, so a
    round's local snapshot wins when both exist; the driver artifact
    remains the fallback (and the only source for early rounds)."""
    rounds: dict[int, dict] = {}
    for pattern in ("BENCH_r*.json", "BENCH_LOCAL_r*.json"):
        for path in sorted(glob.glob(os.path.join(ROOT, pattern))):
            m = re.search(r"BENCH(?:_LOCAL)?_r(\d+)\.json$", path)
            if not m:
                continue
            doc = _payload(path)
            if doc:
                rounds[int(m.group(1))] = _normalize_split(doc)
    return rounds


def _normalize_split(doc: dict) -> dict:
    """One consistent headline series across the r12 metric split
    (ADVICE r12): pre-r12 payloads carry COMBINED totals, r12+ carry
    engine-only `value` + `baseline_queries_total`.  When a pre-r12
    payload retains full per-key detail, recompute the same split
    from its `queries` dict; a truncated compact artifact (driver
    tail-window rows with `omitted` keys) stays combined and renders
    '—' in the baseline column — disclosed per-row, never silently
    mixed."""
    qs = doc.get("queries", {})
    if doc.get("baseline_queries_total") is None:
        present = [k for k in BASELINE_QUERIES if k in qs]
        if doc.get("omitted") or len(present) < len(BASELINE_QUERIES):
            return doc
        bt = round(sum(qs[k] for k in present), 3)
        doc = dict(doc)
        doc["baseline_queries_total"] = bt
        doc["value"] = round(doc["value"] - bt, 3)
        doc["_split_recomputed"] = True
    # same treatment for the r13 evidence-pipeline split (only
    # artifacts that RAN evidence keys get the field; older rounds
    # simply have no such keys to subtract)
    if doc.get("evidence_queries_total") is None:
        ev = [k for k in EVIDENCE_QUERIES if k in qs]
        if ev and not doc.get("omitted"):
            et = round(sum(qs[k] for k in ev), 3)
            doc = dict(doc)
            doc["evidence_queries_total"] = et
            doc["value"] = round(doc["value"] - et, 3)
            doc["_split_recomputed"] = True
    return doc


def load_sf1() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_sf1*.json"))):
        doc = _payload(path)
        if doc:
            out[os.path.basename(path)] = _normalize_split(doc)
    return out


def load_sf5() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_sf5*.json"))):
        doc = _payload(path)
        if doc:
            out[os.path.basename(path)] = _normalize_split(doc)
    return out


def load_local() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_LOCAL_r*.json"))):
        doc = _payload(path)
        if doc:
            out[os.path.basename(path)] = _normalize_split(doc)
    return out


def render(
    rounds: dict[int, dict],
    sf1: dict[str, dict],
    local: dict[str, dict] | None = None,
    charts: list[str] | None = None,
    sf5: dict[str, dict] | None = None,
) -> str:
    lines = [
        "# Bench report",
        "",
        "Generated by `tools/bench_report.py` from the committed "
        "`BENCH_r*.json` / `BENCH_sf1*.json` artifacts "
        "(reference parity: benchmarks/04-benchmark-plots.R). "
        "Regenerate after each round.",
        "",
        "## Headline total per round (sf0.1, lower is better)",
        "",
    ]
    totals = {r: rounds[r]["value"] for r in sorted(rounds)}
    vmax = max(totals.values())
    lines += [
        "The headline `value` EXCLUDES the four definitional "
        "ground-truth baselines (`embedding_topk`, `lsh_recall`, "
        "`embedding_ivf_topk`, `embedding_lsh_topk`): their query sets "
        "grow with the corpus by construction — they time the |Q|·|C| "
        "exact answers the recall checks need, not the engine — and at "
        "sf5 they were 45% of the old combined total.  They still run "
        "every round; their sum rides in `baseline_queries_total`.  "
        "Since r13 the streaming EVIDENCE pipelines (stream_dedup_pairs, "
        "stream_sketch_kmv, stream_batch_parity — single-shot jobs that "
        "rebuild a temp corpus per run; SCALE.md 'Evidence queries') are "
        "likewise split into `evidence_queries_total`.  Rows marked `*` "
        "predate a split and are recomputed into the SAME split from "
        "their retained per-query snapshots, so the whole column is one "
        "comparable series; `—` appears only where a driver artifact "
        "truncated per-key timings and the total stays combined.",
        "",
        "| round | engine total (s) | baseline (s) | evidence (s) | |",
        "|---|---|---|---|---|",
    ]
    for r, v in totals.items():
        bt = rounds[r].get("baseline_queries_total")
        bt_cell = "—" if bt is None else f"{bt:.2f}"
        et = rounds[r].get("evidence_queries_total")
        et_cell = "—" if et is None else f"{et:.2f}"
        mark = "\\*" if rounds[r].get("_split_recomputed") else ""
        lines.append(
            f"| r{r:02d} | {v:.2f}{mark} | {bt_cell} | {et_cell} "
            f"| `{_bar(v, vmax)}` |"
        )
    lines.append("")

    if charts:
        lines += [
            "## Scaling curves",
            "",
            "SVG analog of the reference's committed "
            "`vcfdb-filter-plot.pdf` / `vcfdb-pull-plot.pdf` "
            "(benchmarks/04-benchmark-plots.R); regenerated with this "
            "report.",
            "",
        ]
        for fname in charts:
            lines.append(f"![{fname}]({fname})")
            lines.append("")

    last = sorted(rounds)[-MAX_ROUND_COLS:]
    latest, prev = last[-1], (last[-2] if len(last) > 1 else None)
    iqr_latest = rounds[latest].get("iqr") or {}
    lines += [
        f"## Per-query medians, last {len(last)} rounds (s)",
        "",
        "Sorted by the latest round, slowest first.  Δ = latest vs "
        "previous round (negative = faster); timings on this shared "
        "box swing ±30% run-to-run (BENCH_NOTES.md), so read |Δ| < "
        "~30% as noise."
        + (
            "  The band column reads the artifact's per-key IQR: "
            "**out** = |latest − previous| > 2×IQR AND |Δ| ≥ 15% — a "
            "move the run-to-run spread does NOT explain; everything "
            "else is in-band."
            if iqr_latest
            else ""
        ),
        "",
        "| query | "
        + " | ".join(f"r{r:02d}" for r in last)
        + " | Δ |"
        + (" band |" if iqr_latest else ""),
        "|" + "---|" * (len(last) + 2 + (1 if iqr_latest else 0)),
    ]
    q_latest = rounds[latest]["queries"]
    all_q = sorted(q_latest, key=lambda q: -q_latest[q])
    for q in all_q:
        cells = []
        for r in last:
            v = rounds[r]["queries"].get(q)
            cells.append("—" if v is None else f"{v:.3f}")
        delta = "—"
        band = ""
        if prev is not None:
            pv = rounds[prev]["queries"].get(q)
            # `pv > 0` (not truthiness): a recorded 0.0 is data, but a
            # zero denominator still can't produce a percentage
            if pv is not None and pv > 0:
                move = q_latest[q] - pv
                delta = f"{100 * move / pv:+.0f}%"
                if iqr_latest:
                    iqr = iqr_latest.get(q)
                    if (
                        iqr is not None
                        and abs(move) > 2 * max(iqr, 0.005)
                        and abs(move / pv) >= 0.15
                    ):
                        band = "**out**"
        row = f"| {q} | " + " | ".join(cells) + f" | {delta} |"
        if iqr_latest:
            row += f" {band} |"
        lines.append(row)
    # queries that existed before but were dropped from the harness
    gone = sorted(
        {q for r in last[:-1] for q in rounds[r]["queries"]} - set(q_latest)
    )
    if gone:
        lines += ["", f"Dropped from the harness since r{last[0]:02d}: "
                  + ", ".join(gone)]
    lines.append("")

    if sf1:
        lines += [
            "## Scaling shape: sf0.1 → sf1 (10× data)",
            "",
            "Ratio = sf1 time / latest sf0.1 time.  Point queries "
            "should stay ~flat (≪10×), scans/joins/aggs should grow "
            "sub-linearly (<10×); a ratio ≥10× means the plan "
            "degrades super-linearly and needs a look.",
            "",
        ]
        for name, doc in sf1.items():
            lines += [
                f"### {name} (total {doc['value']:.1f}s vs "
                f"r{latest:02d} sf0.1 {rounds[latest]['value']:.1f}s)",
                "",
                "| query | sf0.1 (s) | sf1 (s) | ratio |",
                "|---|---|---|---|",
            ]
            rows = []
            for q, v in doc["queries"].items():
                base = q_latest.get(q)
                if base and base > 0:
                    rows.append((v / base, q, base, v))
            for ratio, q, base, v in sorted(rows, reverse=True):
                flag = " ⚠" if ratio >= 10 else ""
                lines.append(
                    f"| {q} | {base:.3f} | {v:.3f} | {ratio:.1f}×{flag} |"
                )
            lines.append("")

    if sf5 and sf1:
        # second tier step: sf1 -> sf5 (5x data) against the LATEST
        # sf1 snapshot — a key that is linear shows ~5x ACROSS BOTH
        # steps; a constant-overhead key flattens; the documented
        # |Q|-grows-with-corpus baselines show ~25x here by design
        def _rnum(name: str) -> int:
            m = re.search(r"_r(\d+)\.json$", name)
            return int(m.group(1)) if m else -1

        sf1_latest = sf1[max(sf1, key=_rnum)]["queries"]
        lines += [
            "## Scaling shape: sf1 → sf5 (5× data, second tier step)",
            "",
            "Ratio = sf5 time / latest sf1 time.  Linear scans ≈5×, "
            "indexed/point lookups ≪5×; ≥8× is either a documented "
            "definitional baseline (query set grows with the corpus) "
            "or a plan that needs a look.",
            "",
        ]
        for name, doc in sf5.items():
            lines += [
                f"### {name} (total {doc['value']:.1f}s)",
                "",
                "| query | sf1 (s) | sf5 (s) | ratio |",
                "|---|---|---|---|",
            ]
            rows = []
            for q, v in doc["queries"].items():
                base = sf1_latest.get(q)
                if base and base > 0:
                    rows.append((v / base, q, base, v))
            for ratio, q, base, v in sorted(rows, reverse=True):
                flag = " ⚠" if ratio >= 8 else ""
                lines.append(
                    f"| {q} | {base:.3f} | {v:.3f} | {ratio:.1f}×{flag} |"
                )
            lines.append("")

    if local:
        lines += [
            "## Local snapshots (builder-run, sf0.1)",
            "",
            "Committed alongside the driver rounds; same harness, "
            "same box, run at working-tree HEAD mid-round.",
            "",
            "| artifact | total (s) | queries |",
            "|---|---|---|",
        ]
        for name, doc in local.items():
            lines.append(
                f"| {name} | {doc['value']:.2f} | {len(doc['queries'])} |"
            )
        lines.append("")

    lines += [
        "## vs reference baseline (BASELINE.md)",
        "",
        "| workload | repo "
        f"r{latest:02d} | reference |",
        "|---|---|---|",
    ]
    for key, label, ref in BASELINE_ROWS:
        v = q_latest.get(key)
        lines.append(
            f"| {label} | {'—' if v is None else f'{v:.3f} s'} | {ref} |"
        )
    pgca = q_latest.get("per_gene_counts_all")
    lines += [
        "",
        "The per-gene exome floor (0.053 s) sits below Spark's ~0.15 s "
        "job-submission overhead; the batch-shaped equivalent "
        "(`per_gene_counts_all`) answers ALL genes in "
        f"{'—' if pgca is None else f'{pgca:.2f} s'} "
        "(README, BENCH_NOTES.md).",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_REPORT.md"))
    args = ap.parse_args()
    rounds = load_rounds()
    if not rounds:
        raise SystemExit("no BENCH_r*.json artifacts found")
    charts = write_charts(rounds, os.path.dirname(os.path.abspath(args.out)))
    report = render(
        rounds, load_sf1(), load_local(), charts=charts, sf5=load_sf5()
    )
    with open(args.out, "w") as fh:
        fh.write(report)
    print(f"wrote {args.out} ({len(rounds)} rounds, {len(charts)} charts)")


if __name__ == "__main__":
    main()
