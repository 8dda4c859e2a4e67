"""Headless analysis report — the text analog of the reference's
Streamlit dashboard (src/ui/app.py's five pages rendered as markdown from
the same result sets; the reference dashboard is read-only viz, so a
static report covers the same information surface without a UI stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md_table(df: DataFrame, limit: int = 10) -> str:
    rows = df.limit(limit).collect()
    if not rows:
        return "_(empty)_"
    cols = list(rows[0].asDict())
    out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in rows:
        out.append(
            "| " + " | ".join(str(r[c]) for c in cols) + " |"
        )
    return "\n".join(out)


def render_report(results: dict[str, DataFrame]) -> str:
    """Markdown report over run_analysis() output: overview counts, top
    usage, resource hot-spots, recommendations, query-mix — mirroring the
    dashboard's show_overview / column_statistics / resource_usage /
    recommendations / query_analysis pages."""
    recs = results["recommendations"]
    usage = results["usage"]
    resource = results["resource_scores"]
    classified = results["classified_queries"]

    n_views = recs.count()
    n_recommended = recs.where(F.size("partition_keys") > 0).count()
    mix = {
        bool(r["is_interactive"]): r["n"]
        for r in classified.groupBy("is_interactive")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    sections = [
        "# Partition analysis report",
        "",
        "## Overview",
        f"- views analyzed: {n_views}",
        f"- views with recommendations: {n_recommended}",
        f"- interactive / batch queries: {mix.get(True, 0)} / {mix.get(False, 0)}",
        "",
        "## Top column usage",
        _md_table(
            results["usage"].groupBy("name")
            .agg(F.sum("weighted_frequency").alias("weighted_frequency"))
            .orderBy(F.desc("weighted_frequency"), "name"),
            10,
        ),
        "",
        "## Top resource queries",
        _md_table(
            resource.select(
                "query_id", F.round("resource_score", 2).alias("score")
            ).orderBy(F.desc("score"), "query_id"),
            5,
        ),
        "",
        "## Recommendations",
        _md_table(
            recs.select(
                "view",
                F.array_join("transforms", ", ").alias("partition_spec"),
                F.round("total_score", 1).alias("score"),
            ).orderBy(F.desc("score")),
            20,
        ),
        "",
    ]
    del usage
    return "\n".join(sections)
