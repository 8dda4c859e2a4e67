"""Static HTML dashboard — the self-contained analog of the reference's
Streamlit dashboard (reference: src/ui/app.py:62-471, five page
renderers; src/ui_dashboard.py:6-24 launcher).

The reference runs a Streamlit server with plotly charts over the saved
analysis result sets. This environment has no UI stack, so the same five
information surfaces (Overview, Column Statistics, Resource Usage,
Partition Recommendations, Query Analysis) render to ONE dependency-free
HTML file: inline SVG charts + tables, light/dark via CSS custom
properties, per-mark hover tooltips. Everything is computed from the
same `run_analysis()` result dict the markdown report and the JSON/CSV
sinks consume — the dashboard is a sink, not a second pipeline.

Chart conventions (single-series magnitude bars): one sequential hue
from a validated palette, thin marks with a rounded data-end anchored to
a flat baseline, ≥2px gaps between bars, values direct-labeled in text
ink (never in the series color), a table under every chart, no legend
for single-series charts (the title names the series).
"""

from __future__ import annotations

import html
import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Validated default palette (light / dark): surface, text inks, and the
# single sequential series hue. Dark mode is a selected palette step for
# the dark surface, not an automatic flip.
# Client-side table interactivity (filter + sort). Pure vanilla JS,
# no network, no dependencies; numeric-aware sorting strips the
# thousands separators _fmt adds.
_JS = """
function tblFilter(inp) {
  var q = inp.value.toLowerCase();
  var rows = inp.parentNode.querySelector('table').rows;
  for (var i = 1; i < rows.length; i++) {
    rows[i].style.display =
      rows[i].textContent.toLowerCase().indexOf(q) >= 0 ? '' : 'none';
  }
}
function colStatsFilter(sel) {
  // reference parity: ui/app.py:164-180 — a table selector that narrows
  // the column-statistics surfaces to the chosen table's columns. Data
  // comes from the embedded JSON island (#colstats-data); rows are
  // re-rendered client-side, no server round trip.
  var data = JSON.parse(
    document.getElementById('colstats-data').textContent);
  var t = sel.value;
  var esc = function (s) {
    return String(s).replace(/&/g, '&amp;').replace(/</g, '&lt;');
  };
  var cols = null;  // null = all tables
  if (t !== '*') {
    cols = {};
    data.cardinality.forEach(function (r) {
      if (r.table === t) { cols[r.column] = 1; }
    });
  }
  var card = data.cardinality.filter(function (r) {
    return t === '*' || r.table === t;
  });
  var usage = data.usage.filter(function (r) {
    return cols === null || cols[r.name] === 1;
  }).slice(0, 12);  // match the server-rendered 'top 12' cap
  var render = function (rootId, rows) {
    var tbl = document.querySelector('#' + rootId + ' table');
    while (tbl.rows.length > 1) { tbl.deleteRow(1); }
    tbl.insertAdjacentHTML('beforeend', rows.join(''));
  };
  render('colstats-card', card.map(function (r) {
    return '<tr><td>' + [r.table, r.column, r.type, r.distinct]
      .map(esc).join('</td><td>') + '</td></tr>';
  }));
  render('colstats-usage', usage.map(function (r) {
    return '<tr><td>' + [r.name, r.source, r.wf]
      .map(esc).join('</td><td>') + '</td></tr>';
  }));
}
function tblSort(th) {
  var table = th.closest('table');
  var idx = Array.prototype.indexOf.call(th.parentNode.children, th);
  var asc = th.dataset.asc !== '1';
  Array.prototype.forEach.call(
    th.parentNode.children, function (h) { delete h.dataset.asc; });
  th.dataset.asc = asc ? '1' : '0';
  var rows = Array.prototype.slice.call(table.rows, 1);
  var num = rows.every(function (r) {
    var t = r.cells[idx].textContent.replace(/,/g, '').trim();
    return t === '' || !isNaN(t);
  });
  rows.sort(function (a, b) {
    var x = a.cells[idx].textContent.replace(/,/g, '').trim();
    var y = b.cells[idx].textContent.replace(/,/g, '').trim();
    var c = num ? (parseFloat(x) || 0) - (parseFloat(y) || 0)
                : x.localeCompare(y);
    return asc ? c : -c;
  });
  rows.forEach(function (r) { table.appendChild(r); });
}
"""

_CSS = """
:root {
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f2f1ef;
  --text-primary: #0b0b0b; --text-secondary: #52514e;
  --series-1: #2a78d6; --series-1-soft: #2a78d622;
  --border: #d9d8d4;
}
@media (prefers-color-scheme: dark) {
  :root {
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #242423;
    --text-primary: #ffffff; --text-secondary: #c3c2b7;
    --series-1: #3987e5; --series-1-soft: #3987e533;
    --border: #3a3936;
  }
}
body { background: var(--surface-1); color: var(--text-primary);
  font: 14px/1.45 system-ui, sans-serif; margin: 0 auto; max-width: 980px;
  padding: 24px; }
h1 { font-size: 22px; } h2 { font-size: 17px; margin-top: 36px; }
h1, h2 { font-weight: 600; }
.tiles { display: flex; gap: 12px; flex-wrap: wrap; }
.tile { background: var(--surface-2); border: 1px solid var(--border);
  border-radius: 8px; padding: 12px 18px; min-width: 150px; }
.tile .v { font-size: 26px; font-weight: 650; }
.tile .k { color: var(--text-secondary); font-size: 12px; }
table { border-collapse: collapse; margin-top: 10px; width: 100%; }
th { text-align: left; color: var(--text-secondary); font-weight: 600; }
th, td { padding: 4px 10px 4px 0; border-bottom: 1px solid var(--border);
  font-size: 13px; }
td.num { text-align: right; font-variant-numeric: tabular-nums; }
th { cursor: pointer; user-select: none; }
th[data-asc='1']::after { content: ' \\2191'; }
th[data-asc='0']::after { content: ' \\2193'; }
.tblfilter { margin-top: 10px; padding: 4px 8px; font: inherit;
  color: var(--text-primary); background: var(--surface-1);
  border: 1px solid var(--border); border-radius: 6px; width: 220px; }
svg text { fill: var(--text-primary); font: 12px system-ui, sans-serif; }
svg text.lab { fill: var(--text-secondary); }
svg .bar { fill: var(--series-1); }
svg .bar:hover { opacity: 0.8; }
.note { color: var(--text-secondary); font-size: 12px; }
h3 { font-size: 14px; margin-top: 24px; font-weight: 600; }
details { background: var(--surface-2); border: 1px solid var(--border);
  border-radius: 8px; margin-top: 8px; padding: 6px 12px; }
details summary { cursor: pointer; font-weight: 600; font-size: 13px; }
details pre { background: var(--surface-1); border: 1px solid var(--border);
  border-radius: 6px; padding: 8px 10px; font-size: 12px;
  overflow-x: auto; white-space: pre-wrap; }
pre.json { color: var(--text-secondary); }
"""


def _esc(v: Any) -> str:
    return html.escape(str(v))


def _fmt(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:,.2f}"
    if isinstance(v, int):
        return f"{v:,}"
    return str(v)


def _rounded_hbar(x: float, y: float, w: float, h: float, r: float = 4) -> str:
    """Bar path: flat at the baseline (left), rounded at the data end."""
    r = min(r, w, h / 2)
    return (
        f"M{x:.1f},{y:.1f} h{w - r:.1f} q{r:.1f},0 {r:.1f},{r:.1f} "
        f"v{h - 2 * r:.1f} q0,{r:.1f} -{r:.1f},{r:.1f} h-{w - r:.1f} z"
    )


def _hbar_chart(
    items: list[tuple[str, float]], title: str, value_name: str
) -> str:
    """Horizontal magnitude bars: label (text ink) | bar | value label.
    Per-mark hover tooltip via SVG <title>; table view rendered by the
    caller. Empty input → a note, not an empty plot."""
    if not items:
        return f"<h2>{_esc(title)}</h2><p class='note'>(no data)</p>"
    label_w, chart_w, bar_h, gap = 190, 520, 18, 6
    vmax = max(v for _, v in items) or 1.0
    rows_h = len(items) * (bar_h + gap)
    parts = [
        f"<h2>{_esc(title)}</h2>",
        f"<svg role='img' aria-label='{_esc(title)}' width='{label_w + chart_w + 90}'"
        f" height='{rows_h + 8}'>",
    ]
    for i, (label, value) in enumerate(items):
        y = 4 + i * (bar_h + gap)
        w = max((value / vmax) * chart_w, 2)
        short = label if len(label) <= 26 else label[:24] + "…"
        parts.append(
            "<g class='row'>"
            f"<title>{_esc(label)}: {value:,.2f} {_esc(value_name)}</title>"
            f"<text class='lab' x='{label_w - 8}' y='{y + bar_h - 5}'"
            f" text-anchor='end'>{_esc(short)}</text>"
            f"<path class='bar' d='{_rounded_hbar(label_w, y, w, bar_h)}'/>"
            f"<text x='{label_w + w + 6}' y='{y + bar_h - 5}'>{value:,.1f}</text>"
            "</g>"
        )
    parts.append("</svg>")
    return "".join(parts)


def _vbar_chart(
    buckets: list[tuple[str, int]], title: str, value_name: str
) -> str:
    """Vertical histogram bars, same mark spec rotated: flat baseline at
    the bottom, rounded top, count labels above each bar."""
    if not buckets:
        return f"<h2>{_esc(title)}</h2><p class='note'>(no data)</p>"
    bar_w, gap, chart_h, base = 46, 8, 180, 210
    vmax = max(v for _, v in buckets) or 1
    parts = [
        f"<h2>{_esc(title)}</h2>",
        f"<svg role='img' aria-label='{_esc(title)}'"
        f" width='{len(buckets) * (bar_w + gap) + 20}' height='{base + 24}'>",
    ]
    for i, (label, value) in enumerate(buckets):
        x = 10 + i * (bar_w + gap)
        h = max((value / vmax) * chart_h, 2)
        y = base - h
        r = min(4.0, bar_w, h / 2)
        path = (
            f"M{x},{base} v-{h - r:.1f} q0,-{r:.1f} {r:.1f},-{r:.1f} "
            f"h{bar_w - 2 * r:.1f} q{r:.1f},0 {r:.1f},{r:.1f} v{h - r:.1f} z"
        )
        parts.append(
            "<g class='row'>"
            f"<title>{_esc(label)}: {value:,} {_esc(value_name)}</title>"
            f"<path class='bar' d='{path}'/>"
            f"<text x='{x + bar_w / 2}' y='{y - 5}' text-anchor='middle'>"
            f"{value:,}</text>"
            f"<text class='lab' x='{x + bar_w / 2}' y='{base + 16}'"
            f" text-anchor='middle'>{_esc(label)}</text>"
            "</g>"
        )
    parts.append("</svg>")
    return "".join(parts)


def _table(rows: list[dict[str, Any]], columns: list[str]) -> str:
    """Interactive table view: a client-side filter box plus
    click-to-sort headers (vanilla JS in _JS, no dependencies) — the
    self-contained answer to the reference Streamlit pages' table
    widgets (src/ui/app.py:62-471)."""
    if not rows:
        return "<p class='note'>(empty)</p>"
    head = "".join(
        f"<th onclick='tblSort(this)' title='click to sort'>{_esc(c)}</th>"
        for c in columns
    )
    body = []
    for r in rows:
        cells = []
        for c in columns:
            v = r.get(c)
            klass = " class='num'" if isinstance(v, (int, float)) else ""
            cells.append(f"<td{klass}>{_esc(_fmt(v))}</td>")
        body.append("<tr>" + "".join(cells) + "</tr>")
    return (
        "<div class='tblwrap'>"
        "<input class='tblfilter' type='search' placeholder='Filter rows…'"
        " oninput='tblFilter(this)'>"
        f"<table><tr>{head}</tr>{''.join(body)}</table></div>"
    )


def _json_pre(obj: Any) -> str:
    """Machine-readable twin of a drill-down: the full row as embedded
    (escaped) JSON, so the detail view carries every field even when the
    human-facing table selects a few."""
    import json as _json

    return (
        "<pre class='json'>"
        + html.escape(_json.dumps(obj, indent=1, sort_keys=True, default=str))
        + "</pre>"
    )


def _details(summary: str, body: str) -> str:
    return f"<details><summary>{summary}</summary>{body}</details>"


def _tiles(metrics: list[tuple[str, Any]]) -> str:
    tiles = "".join(
        f"<div class='tile'><div class='v'>{_esc(_fmt(v))}</div>"
        f"<div class='k'>{_esc(k)}</div></div>"
        for k, v in metrics
    )
    return f"<div class='tiles'>{tiles}</div>"


def bench_health_section(bench_dir: str | None = None) -> str:
    """Perf-drift evidence rendered from the bench artifacts (r8 verdict
    #2's visibility ask): the frozen round-1 anchor ratio, the flagged
    regressions, and the report-only watch list (queries over their
    multiplicative budget but absorbed by the additive noise floor) —
    readable without opening BENCH_PLANS.json. Best-effort: absent or
    unparsable artifacts render nothing (a fresh clone has no bench
    run yet)."""
    import json as _json
    import os as _os

    base = bench_dir or _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "..", ".."
    )
    try:
        with open(_os.path.join(base, "BENCH_PLANS.json")) as fh:
            side = _json.load(fh)
    except (OSError, ValueError):
        return ""
    watch = side.get("watch") or {}
    regressions = side.get("regressions") or {}
    anchor = side.get("anchor_ratio_r1")
    n_queries = len(side.get("warm_queries") or {})
    tiles = _tiles(
        [
            ("benched queries", n_queries),
            ("anchor ratio vs r1", anchor if anchor is not None else "n/a"),
            ("regressions flagged", len(regressions)),
            ("watch (under noise floor)", len(watch)),
        ]
    )
    parts = [
        "<h2>Benchmark health</h2>",
        "<p class='note'>anchor ratio = this run's total over the FROZEN"
        " round-1 medians on the shared query set (cannot be reset by"
        " baseline regeneration); watch = queries &ge; budget over their"
        " median that the additive noise floor absorbed — report-only"
        " drift telemetry.</p>",
        tiles,
    ]
    if regressions:
        # warm numbers live at the top level, cold numbers one level
        # down under "cold" (bench.py's shape); a query may carry
        # either or both — render one row per flagged timing so neither
        # ratio is ever invisible
        rows = []
        for n, v in sorted(regressions.items()):
            if "x" in v:
                rows.append({
                    "query": n, "x over median": v.get("x"),
                    "sec": v.get("sec"), "median": v.get("median"),
                })
            cold = v.get("cold") or {}
            if cold:
                rows.append({
                    "query": f"{n} (cold)",
                    "x over median": cold.get("x"),
                    "sec": cold.get("sec"), "median": cold.get("median"),
                })
        parts.append("<h3>Regressions</h3>")
        parts.append(_table(rows, ["query", "x over median", "sec", "median"]))
    if watch:
        rows = [
            {"query": n, "x over median": x}
            for n, x in sorted(watch.items(), key=lambda kv: -kv[1])
        ]
        parts.append("<h3>Watch list</h3>")
        parts.append(_table(rows, ["query", "x over median"]))
    return "".join(parts)


def scale_sweep_section(base_dir: str | None = None) -> str:
    """Empirical scale evidence rendered from SCALE_SWEEP.json (r10
    verdict #8): per-flagship time-scaling exponents at the primary
    inflation factor, the extra-factor (second/third decade) points,
    and the SemDeDup split-remediation comparison — the strongest
    would-it-survive-100TB numbers the repo has, surfaced next to the
    bench-health panel instead of buried in an artifact. Best-effort:
    no artifact renders nothing."""
    import json as _json
    import os as _os

    base = base_dir or _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "..", ".."
    )
    try:
        with open(_os.path.join(base, "SCALE_SWEEP.json")) as fh:
            sweep = _json.load(fh)
        return _scale_sweep_html(sweep)
    except Exception:
        # best-effort contract: a partially-written or structurally
        # malformed artifact (null result entries, non-integer factor
        # keys from an interrupted sweep) must skip the section, never
        # kill the whole dashboard render (r11 review)
        return ""


def _scale_sweep_html(sweep: dict) -> str:
    results = sweep.get("results") or {}
    if not results:
        return ""
    factor = sweep.get("factor")
    parts = [
        "<h2>Scale sweep</h2>",
        f"<p class='note'>wall-time scaling exponent at {factor}x "
        "verbatim-replicated data: exponent 1.0 = linear, &lt; 1 = "
        "sub-linear (fixed costs amortizing), &gt; 1 = super-linear "
        "(quadratic OUTPUT under replication, or — once, remediated — "
        "a fixed-k plan flaw). "
        f"{_esc(sweep.get('host_noise_caveat') or '')}</p>",
    ]
    rows = [
        {
            "query": n,
            "exponent": r.get("time_exponent"),
            f"t_1x": r.get("t_1x"),
            f"t_{factor}x": r.get(f"t_{factor}x"),
            "note": (r.get("note") or "")[:80],
        }
        for n, r in sorted(
            results.items(),
            key=lambda kv: -(kv[1].get("time_exponent") or 0),
        )
    ]
    parts.append(
        _table(rows, ["query", "exponent", "t_1x", f"t_{factor}x", "note"])
    )
    extra = sweep.get("extra_factors") or {}
    for f, res in sorted(extra.items(), key=lambda kv: int(kv[0])):
        rows = [
            {
                "query": n,
                "exponent": r.get("time_exponent"),
                "t_1x": r.get("t_1x"),
                f"t_{f}x": r.get(f"t_{f}x"),
            }
            for n, r in sorted(res.items())
        ]
        parts.append(f"<h3>Extra factor: {int(f)}x</h3>")
        parts.append(_table(rows, ["query", "exponent", "t_1x", f"t_{f}x"]))
    split = (results.get("semdedup_keep_canonical") or {}).get(
        "split_remediation"
    )
    if split:
        parts.append("<h3>SemDeDup split remediation</h3>")
        parts.append(
            "<p class='note'>fixed-k vs the split-oversized path (the "
            "registered query's default since r11) on the inflated "
            "corpus.</p>"
        )
        parts.append(_json_pre(split))
    return "".join(parts)


def render_dashboard(
    results: dict[str, DataFrame],
    extras: dict[str, DataFrame] | None = None,
    bench_dir: str | None = None,
) -> str:
    """One self-contained HTML page over run_analysis() results, section
    for section against the reference dashboard:

    * Overview            (src/ui/app.py:87-152)
    * Column Statistics   (src/ui/app.py:156-250)
    * Resource Usage      (src/ui/app.py:254-312)
    * Partition Recs      (src/ui/app.py:316-387)
    * Query Analysis      (src/ui/app.py:391-470)

    `extras` (optional, name → DataFrame) renders additional advisor
    tables — the CLI passes the bucket/rollup/drift advice frames.
    """
    recs = results["recommendations"]
    usage = results["usage"]
    profiles = results["profiles"]
    col_perf = results["column_performance"]
    resource = results["resource_scores"]
    classified = results["classified_queries"]

    # -- Overview -----------------------------------------------------
    n_views = recs.count()
    n_columns = profiles.count()
    n_recommended = recs.where(F.size("partition_keys") > 0).count()
    top_usage = [
        (r["name"], float(r["wf"]))
        for r in usage.groupBy("name")
        .agg(F.sum("weighted_frequency").alias("wf"))
        .orderBy(F.desc("wf"), "name")
        .limit(5)
        .collect()
    ]
    benefits = [
        r.asDict()
        for r in recs.where(F.size("partition_keys") > 0)
        .select(
            F.col("view").alias("table"),
            F.array_join("partition_keys", ", ").alias("partition keys"),
            F.round("total_score", 1).alias("total score"),
        )
        .orderBy(F.desc("total score"), "table")
        .collect()
    ]

    # -- Column statistics -------------------------------------------
    col_usage = [
        (f'{r["name"]} ({r["source"]})', float(r["wf"]))
        for r in usage.groupBy("name", "source")
        .agg(F.sum("weighted_frequency").alias("wf"))
        .orderBy(F.desc("wf"), "name", "source")
        .limit(12)
        .collect()
    ]
    cardinality = [
        r.asDict()
        for r in profiles.select(
            F.col("table"),
            F.col("column"),
            F.col("data_type").alias("type"),
            F.col("distinct_count").alias("distinct values"),
        )
        .orderBy(F.desc("distinct values"), "table", "column")
        .limit(12)
        .collect()
    ]

    # Interactive table filter (reference parity: ui/app.py:164-180's
    # selectbox): the FULL per-table column stats ship as an embedded
    # JSON island; a vanilla-JS <select> re-renders the two tables
    # client-side — the selected table's columns only, like the
    # reference's Streamlit widget, with no server round trip. The
    # frames here are advisor-metadata-sized (columns × tables), never
    # corpus-sized, so embedding them whole is safe.
    colstats_island = {
        "cardinality": [
            {
                "table": r["table"],
                "column": r["column"],
                "type": r["data_type"],
                "distinct": int(r["distinct_count"]),
            }
            for r in profiles.select(
                "table", "column", "data_type", "distinct_count"
            )
            .orderBy(F.desc("distinct_count"), "table", "column")
            .collect()
        ],
        "usage": [
            {
                "name": r["name"],
                "source": r["source"],
                "wf": round(float(r["wf"]), 2),
            }
            for r in usage.groupBy("name", "source")
            .agg(F.sum("weighted_frequency").alias("wf"))
            .orderBy(F.desc("wf"), "name", "source")
            .collect()
        ],
    }
    colstats_tables = sorted(
        {r["table"] for r in colstats_island["cardinality"]}
    )
    colstats_select = (
        "<label class='note'>Filter by table: "
        "<select id='colstats-select' onchange='colStatsFilter(this)'>"
        "<option value='*'>All tables</option>"
        + "".join(
            f"<option value='{_esc(t)}'>{_esc(t)}</option>"
            for t in colstats_tables
        )
        + "</select></label>"
    )
    colstats_data = (
        "<script type='application/json' id='colstats-data'>"
        + json.dumps(colstats_island, separators=(",", ":")).replace(
            "</", "<\\/"
        )
        + "</script>"
    )

    # -- Resource usage ----------------------------------------------
    col_resource = [
        (r["column"], float(r["v"]))
        for r in col_perf.groupBy("column")
        .agg(F.sum("col_execution_time_ms").alias("v"))
        .orderBy(F.desc("v"), "column")
        .limit(12)
        .collect()
    ]

    # -- Recommendations ---------------------------------------------
    rec_rows = [
        r.asDict()
        for r in recs.where(F.size("partition_keys") > 0)
        .select(
            F.col("view").alias("table"),
            F.array_join("transforms", ", ").alias("partition spec"),
            F.round("total_score", 1).alias("score"),
            F.substring_index("script", "\n", -1).alias("alter ddl"),
        )
        .orderBy(F.desc("score"), "table")
        .collect()
    ]

    # -- Per-recommendation drill-down (src/ui/app.py:316-387) --------
    # One expandable detail per recommended view: the full ALTER script,
    # the view's ranked candidate columns with every score dimension,
    # and the complete recommendation row as embedded JSON.
    rec_full = (
        recs.where(F.size("partition_keys") > 0)
        .orderBy(F.desc("total_score"), "view")
        .collect()
    )
    cand_cols = [
        "column", "rank", "score", "weighted_frequency", "distinct_count",
        "granularity", "skew_ratio", "density", "col_execution_time_ms",
    ]
    by_view: dict[str, list[dict[str, Any]]] = {}
    if rec_full:
        for c in (
            results["top_candidates"]
            .where(F.col("view").isin([r["view"] for r in rec_full]))
            .collect()
        ):
            by_view.setdefault(c["view"], []).append(c.asDict())
    rec_details = []
    for r in rec_full:
        cands = sorted(
            by_view.get(r["view"], []), key=lambda c: (c["rank"], c["column"])
        )
        rec_details.append(
            _details(
                f"{_esc(r['view'])} — {_esc(', '.join(r['transforms']))}"
                f" (score {r['total_score']:.1f})",
                f"<pre>{_esc(r['script'])}</pre>"
                + _table(
                    [{k: c.get(k) for k in cand_cols} for c in cands],
                    cand_cols,
                )
                + _json_pre(r.asDict()),
            )
        )

    # -- Query analysis ----------------------------------------------
    hist = {
        int(r["bucket"]): int(r["n"])
        for r in resource.groupBy(
            F.least(F.floor(F.col("resource_score") / 10.0), F.lit(9.0))
            .cast("int")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    hist_buckets = [
        (f"{b * 10}–{b * 10 + 9}", hist.get(b, 0)) for b in range(10)
    ]
    top_queries = [
        r.asDict()
        for r in resource.select(
            "query_id",
            F.round("resource_score", 1).alias("score"),
            F.col("execution_time_ms").alias("exec ms"),
        )
        .orderBy(F.desc("score"), "query_id")
        .limit(5)
        .collect()
    ]
    mix = {
        bool(r["is_interactive"]): int(r["n"])
        for r in classified.groupBy("is_interactive")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # -- Per-query drill-down (src/ui/app.py:391-470) -----------------
    # One expandable detail per top-resource query: the full SQL text,
    # what the miner extracted from it (tables / join / where columns),
    # and the resource + classification fields as embedded JSON.
    top_q_full = (
        resource.orderBy(F.desc("resource_score"), "query_id")
        .limit(10)
        .collect()
    )
    qids = [r["query_id"] for r in top_q_full]
    mined_by_q: dict[str, list[dict[str, Any]]] = {}
    cls_by_q: dict[str, Any] = {}
    if qids:
        for m in (
            results["mined_logs"].where(F.col("query_id").isin(qids)).collect()
        ):
            mined_by_q.setdefault(m["query_id"], []).append(m.asDict())
        cls_by_q = {
            r["query_id"]: r
            for r in classified.where(F.col("query_id").isin(qids)).collect()
        }
    q_details = []
    for r in top_q_full:
        c = cls_by_q.get(r["query_id"])
        meta = {
            "query_id": r["query_id"],
            "resource_score": round(float(r["resource_score"]), 4),
            "execution_time_ms": r["execution_time_ms"],
            "cpu_time_ms": r["cpu_time_ms"],
            "scheduled_time_ms": r["scheduled_time_ms"],
            "input_bytes": r["input_bytes"],
            "peak_memory_bytes": r["peak_memory_bytes"],
            "has_limit": bool(c["has_limit"]) if c else None,
            "is_interactive": bool(c["is_interactive"]) if c else None,
            "partition_priority": c["partition_priority"] if c else None,
        }
        mined_rows = sorted(
            mined_by_q.get(r["query_id"], []),
            key=lambda m: (m["kind"], m["name"]),
        )
        q_details.append(
            _details(
                f"{_esc(r['query_id'])} (resource score "
                f"{float(r['resource_score']):.2f})",
                f"<pre>{_esc(r['query'])}</pre>"
                + _table(mined_rows, ["kind", "name", "cnt"])
                + _json_pre(meta),
            )
        )

    sections = [
        "<h1>Adaptive partitioning dashboard</h1>",
        "<p class='note'>Static render of the analysis result sets — the"
        " same five surfaces as the reference dashboard.</p>",
        "<h2>Overview</h2>",
        _tiles(
            [
                ("views analyzed", n_views),
                ("columns analyzed", n_columns),
                ("partition recommendations", n_recommended),
                ("interactive queries", mix.get(True, 0)),
                ("batch queries", mix.get(False, 0)),
            ]
        ),
        _hbar_chart(top_usage, "Top columns by usage", "weighted frequency"),
        _table(benefits, ["table", "partition keys", "total score"]),
        "<h2>Column statistics</h2>",
        colstats_select,
        colstats_data,
        _hbar_chart(
            col_usage, "Column usage frequency by signal", "weighted frequency"
        ),
        "<h3>Column usage by signal (top 12)</h3>",
        "<div id='colstats-usage'>"
        + _table(
            colstats_island["usage"][:12],
            ["name", "source", "wf"],
        )
        + "</div>",
        "<h3>Column cardinality</h3>",
        "<div id='colstats-card'>"
        + _table(cardinality, ["table", "column", "type", "distinct values"])
        + "</div>",
        "<h2>Resource usage</h2>",
        _hbar_chart(
            col_resource,
            "Column resource usage (total execution ms attributed)",
            "ms",
        ),
        "<h2>Partition recommendations</h2>",
        _table(rec_rows, ["table", "partition spec", "score", "alter ddl"]),
        "<h3>Per-recommendation drill-down</h3>",
        "".join(rec_details) or "<p class='note'>(no recommendations)</p>",
        "<h2>Query analysis</h2>",
        _vbar_chart(
            hist_buckets, "Query resource-score distribution", "queries"
        ),
        _table(top_queries, ["query_id", "score", "exec ms"]),
        "<h3>Per-query drill-down</h3>",
        "".join(q_details) or "<p class='note'>(no queries)</p>",
    ]
    bench_html = bench_health_section(bench_dir)
    if bench_html:
        sections.append(bench_html)
    sweep_html = scale_sweep_section(bench_dir)
    if sweep_html:
        sections.append(sweep_html)
    if extras:
        sections.append("<h2>Layout advisor extensions</h2>")
        sections.append(
            "<p class='note'>Spark-native advice beyond the reference's"
            " surface: co-located-join bucketing, aggregate rollups, and"
            " workload drift between log windows.</p>"
        )
        for title, df in extras.items():
            rows = [r.asDict() for r in df.limit(200).collect()]
            sections.append(f"<h3>{_esc(title)}</h3>")
            sections.append(
                _table(rows, list(rows[0]) if rows else [])
                if rows
                else "<p class='note'>(empty)</p>"
            )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>Adaptive partitioning dashboard</title>"
        f"<style>{_CSS}</style></head><body>"
        + "".join(sections)
        + f"<script>{_JS}</script></body></html>"
    )


def write_dashboard(
    results: dict[str, DataFrame],
    path: str,
    extras: dict[str, DataFrame] | None = None,
) -> str:
    with open(path, "w") as fh:
        fh.write(render_dashboard(results, extras=extras))
    return path


def advisor_extras(spark, sf_dir: str) -> dict[str, DataFrame]:
    """The advisor-extension tables every dashboard surface renders —
    ONE definition so the static CLI dashboard and the live server
    (sources/live.py) can never silently diverge."""
    from ..queries import advisor as advisor_q
    from ..queries import clustering as clustering_q

    return {
        "Co-located join bucketing advice": advisor_q.bucket_join_advice(
            spark, sf_dir
        ),
        "Aggregate rollup advice": advisor_q.rollup_advice(spark, sf_dir),
        "Workload drift (early vs late log window)": (
            advisor_q.workload_drift_report(spark, sf_dir)
        ),
        "Re-partitioning triggers (drift vs current keys)": (
            advisor_q.partition_recommendation_drift(spark, sf_dir)
        ),
        "Drift re-partition scripts (patched DDL per drifted view)": (
            advisor_q.drift_repartition_scripts(spark, sf_dir)
        ),
        "Partition-spec history (keys per advisor generation)": (
            advisor_q.partition_spec_history(spark, sf_dir)
        ),
        "Embedding clusters (integer-lattice k-means profile)": (
            clustering_q.embedding_cluster_profile(spark, sf_dir)
        ),
    }
