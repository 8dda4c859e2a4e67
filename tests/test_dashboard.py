"""Static HTML dashboard tests (sources/dashboard.py — the offline
analog of the reference's five-page Streamlit UI, src/ui/app.py:62-471).

No browser in this environment, so the render is checked structurally:
all five page sections present, every chart carries per-mark tooltips
and a table view, metric tiles reflect the analysis counts, and
user-controlled strings are HTML-escaped.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import recommend
from trino_adaptive_partitioning_tool_spark.sources import dashboard

from conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def results(spark):
    return recommend.run_analysis(
        spark, SMOKE_SF_DIR, profile_percentiles=False
    )


@pytest.fixture(scope="module")
def html_out(results):
    return dashboard.render_dashboard(results)


def test_all_five_pages_present(html_out):
    sections = re.findall(r"<h2>([^<]+)</h2>", html_out)
    for page in (
        "Overview",
        "Column statistics",
        "Resource usage",
        "Partition recommendations",
        "Query analysis",
    ):
        assert page in sections, page


def test_metric_tiles_match_analysis(results, html_out):
    n_views = results["recommendations"].count()
    n_cols = results["profiles"].count()
    by_label = {
        label: value
        for value, label in re.findall(
            r"<div class='v'>([^<]+)</div><div class='k'>([^<]+)</div>",
            html_out,
        )
    }
    assert int(by_label["views analyzed"].replace(",", "")) == n_views
    assert int(by_label["columns analyzed"].replace(",", "")) == n_cols


def test_every_bar_has_hover_tooltip(html_out):
    bars = len(re.findall(r"class='bar'", html_out))
    titles = len(re.findall(r"<title>", html_out)) - 1  # page <title>
    assert bars > 0
    assert bars == titles


def test_charts_have_table_views(html_out):
    # a table view accompanies each charted section
    assert len(re.findall(r"<table>", html_out)) >= 4


def test_histogram_counts_sum_to_query_count(results, html_out):
    n_queries = results["resource_scores"].count()
    # histogram bar value labels live in <text> right after the bar path
    hist = re.search(
        r"Query resource-score distribution.*?</svg>", html_out, re.S
    ).group(0)
    counts = [
        int(m.replace(",", ""))
        for m in re.findall(r"text-anchor='middle'>([0-9,]+)<", hist)
    ]
    assert sum(counts) == n_queries


def test_html_escaping_of_values(spark, results):
    # poison one result set with markup and confirm it renders escaped
    poisoned = dict(results)
    poisoned["resource_scores"] = results["resource_scores"].withColumn(
        "query_id", F.concat(F.lit("<script>x</script>"), "query_id")
    )
    out = dashboard.render_dashboard(poisoned)
    assert "<script>x</script>" not in out
    assert "&lt;script&gt;" in out


def test_write_dashboard_roundtrip(tmp_path, results):
    path = dashboard.write_dashboard(results, str(tmp_path / "d.html"))
    content = open(path).read()
    assert content.startswith("<!doctype html>")
    assert "prefers-color-scheme: dark" in content


def test_drilldown_renders_for_every_recommendation(results, html_out):
    """Each recommended view gets an expandable detail (details/summary)
    carrying its full ALTER script, candidate-column table, and the
    complete row as embedded JSON — the offline answer to the reference
    per-recommendation pages (src/ui/app.py:316-387)."""
    recs = results["recommendations"].where(
        F.size("partition_keys") > 0
    ).collect()
    assert recs, "fixture should produce at least one recommendation"
    import re as _re

    summaries = _re.findall(r"<summary>([^<]+)</summary>", html_out)
    for r in recs:
        assert any(r["view"] in s for s in summaries), r["view"]
    # every drill-down embeds the ALTER script and parseable JSON
    assert html_out.count("ALTER TABLE") >= len(recs)
    assert html_out.count("<pre class='json'>") >= len(recs)


def test_drilldown_renders_for_top_queries(results, html_out):
    """Top-resource queries each get a detail block with the full SQL
    text and the miner's extraction (src/ui/app.py:391-470)."""
    import re as _re

    top = (
        results["resource_scores"]
        .orderBy(F.desc("resource_score"), "query_id")
        .limit(10)
        .collect()
    )
    summaries = _re.findall(r"<summary>([^<]+)</summary>", html_out)
    for r in top:
        assert any(r["query_id"] in s for s in summaries), r["query_id"]


def test_drilldown_json_is_parseable(html_out):
    """The embedded JSON payloads must round-trip: unescape and parse
    every <pre class='json'> block."""
    import html as _html
    import json as _json
    import re as _re

    blocks = _re.findall(
        r"<pre class='json'>(.*?)</pre>", html_out, _re.S
    )
    assert blocks
    for b in blocks:
        obj = _json.loads(_html.unescape(b))
        assert isinstance(obj, dict) and obj


def test_tables_are_interactive(html_out):
    """Each table view ships the client-side filter box and sortable
    headers, and the vanilla-JS handlers are embedded (no external
    deps) — the interactivity analog of the reference Streamlit
    widgets."""
    assert html_out.count("class='tblfilter'") >= 4
    assert "onclick='tblSort(this)'" in html_out
    assert "function tblSort" in html_out
    assert "function tblFilter" in html_out
    # still a single self-contained file: no external script/style refs
    assert "src=" not in html_out.split("<body>")[0]


def test_extras_sections_render(spark, results):
    from trino_adaptive_partitioning_tool_spark.queries import advisor

    extras = {
        "Co-located join bucketing advice": advisor.bucket_join_advice(
            spark, SMOKE_SF_DIR
        ),
        "Workload drift": advisor.workload_drift_report(
            spark, SMOKE_SF_DIR
        ),
    }
    out = dashboard.render_dashboard(results, extras=extras)
    assert "Layout advisor extensions" in out
    assert "Co-located join bucketing advice" in out
    assert "Workload drift" in out
    # the advice rows actually rendered (a known join column appears)
    assert "l_orderkey" in out


def test_bench_health_section_renders_watch_and_anchor(tmp_path):
    """r9: the perf-drift telemetry (anchor ratio, regressions, watch
    list) renders from the bench artifacts; absent artifacts render
    nothing (fresh clone)."""
    import json

    assert dashboard.bench_health_section(str(tmp_path)) == ""
    (tmp_path / "BENCH_PLANS.json").write_text(json.dumps({
        "warm_queries": {"q_a": 0.5, "q_b": 0.3},
        "anchor_ratio_r1": 0.41,
        "regressions": {"q_a": {"sec": 0.5, "median": 0.2, "x": 2.5}},
        "watch": {"q_b": 1.73},
    }))
    html = dashboard.bench_health_section(str(tmp_path))
    assert "Benchmark health" in html
    assert "0.41" in html
    assert "q_a" in html and "2.5" in html      # regression row
    assert "Watch list" in html and "1.73" in html
    # malformed artifact: still no crash, no section
    (tmp_path / "BENCH_PLANS.json").write_text("{not json")
    assert dashboard.bench_health_section(str(tmp_path)) == ""


def test_bench_health_renders_warm_and_cold_regressions(tmp_path):
    """r9 second review pass: a query flagged for BOTH warm and cold
    regressions renders two rows (warm + '(cold)'); cold-only entries
    render their nested numbers, never None cells."""
    import json

    (tmp_path / "BENCH_PLANS.json").write_text(json.dumps({
        "warm_queries": {"q_both": 0.5, "q_coldonly": 0.3},
        "anchor_ratio_r1": 1.0,
        "regressions": {
            "q_both": {"sec": 0.5, "median": 0.2, "x": 2.5,
                       "cold": {"sec": 2.0, "median": 0.8, "x": 2.5}},
            "q_coldonly": {"cold": {"sec": 1.9, "median": 0.6, "x": 3.17}},
        },
        "watch": {},
    }))
    html = dashboard.bench_health_section(str(tmp_path))
    assert "q_both (cold)" in html and "q_coldonly (cold)" in html
    assert html.count("q_both") == 2  # warm row + cold row
    assert "3.17" in html and "2.0" in html
    assert "None" not in html


def test_scale_sweep_section_renders_exponents_and_remediation(tmp_path):
    """r11: the scale-sweep evidence (per-flagship exponents, extra
    factors, the SemDeDup split remediation) renders from
    SCALE_SWEEP.json; absent or malformed artifacts render nothing."""
    import json

    assert dashboard.scale_sweep_section(str(tmp_path)) == ""
    (tmp_path / "SCALE_SWEEP.json").write_text(json.dumps({
        "base": "/x", "factor": 10,
        "host_noise_caveat": "+/-40%",
        "results": {
            "q_lin": {"t_1x": 1.0, "t_10x": 2.0, "time_exponent": 0.3,
                      "note": ""},
            "semdedup_keep_canonical": {
                "t_1x": 1.8, "t_10x": 49.5, "time_exponent": 1.43,
                "note": "fixed-k",
                "split_remediation": {"t_10x_split_end_to_end": 12.2,
                                      "speedup_vs_fixed_k": 4.06},
            },
        },
        "extra_factors": {"30": {"q_lin": {
            "t_1x": 1.0, "t_30x": 3.1, "time_exponent": 0.33}}},
    }))
    html = dashboard.scale_sweep_section(str(tmp_path))
    assert "Scale sweep" in html
    assert "1.43" in html and "0.3" in html           # exponents
    assert "Extra factor: 30x" in html and "0.33" in html
    assert "SemDeDup split remediation" in html and "4.06" in html
    # worst exponent sorts first
    assert html.index("semdedup_keep_canonical") < html.index("q_lin")
    (tmp_path / "SCALE_SWEEP.json").write_text("{not json")
    assert dashboard.scale_sweep_section(str(tmp_path)) == ""


def test_scale_sweep_section_survives_partial_malformation(tmp_path):
    """r11 review: a structurally malformed artifact (null result
    entries, non-integer extra-factor keys) must skip the section —
    best-effort means never killing the whole dashboard render."""
    import json

    (tmp_path / "SCALE_SWEEP.json").write_text(json.dumps({
        "base": "/x", "factor": 10,
        "results": {"q_bad": None},
        "extra_factors": {"not_a_number": {}},
    }))
    assert dashboard.scale_sweep_section(str(tmp_path)) == ""


def test_colstats_table_filter_island_and_select(html_out):
    """r12 (reference ui/app.py:164-180 parity): the column-statistics
    page carries a per-table <select> wired to colStatsFilter plus a
    parseable JSON island with the FULL per-table stats — the vanilla-JS
    reproduction of the reference's Streamlit table selectbox."""
    import json as _json

    assert "id='colstats-select'" in html_out
    assert "onchange='colStatsFilter(this)'" in html_out
    assert "<option value='*'>All tables</option>" in html_out
    m = re.search(
        r"<script type='application/json' id='colstats-data'>(.*?)"
        r"</script>",
        html_out,
        re.S,
    )
    assert m, "colstats data island missing"
    island = _json.loads(m.group(1).replace("<\\/", "</"))
    assert set(island) == {"cardinality", "usage"}
    tables = {r["table"] for r in island["cardinality"]}
    assert tables, "island carries no tables"
    # every island table is offered as an option, and the island rows
    # carry the exact fields the JS renderer indexes
    for t in sorted(tables):
        assert f"<option value='{t}'>" in html_out
    assert all(
        set(r) == {"table", "column", "type", "distinct"}
        for r in island["cardinality"]
    )
    assert all(
        set(r) == {"name", "source", "wf"} for r in island["usage"]
    )
    # the two filterable table roots exist for the client-side renderer
    assert "<div id='colstats-usage'>" in html_out
    assert "<div id='colstats-card'>" in html_out
    # the JS function itself ships on the page
    assert "function colStatsFilter" in html_out
