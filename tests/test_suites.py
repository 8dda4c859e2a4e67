"""Digest-suite guards (queries/suites.py).

The digest specs hardcode each folded query's column split (exact-typed
vs double) so the DuckDB oracle can be built statically. If a folded
query's schema drifts, the digest would silently hash the wrong columns
— these tests pin the specs to the live schemas. Value parity of the
digests themselves is covered by test_oracle_parity (they are registered
queries with oracles).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import DoubleType

from trino_adaptive_partitioning_tool_spark.queries import registry, suites
from trino_adaptive_partitioning_tool_spark.queries.registry import _PRIORITY

from conftest import SMOKE_SF_DIR

_SPEC_GROUPS = (
    suites._RELATIONAL,
    suites._GROUPING,
    suites._FUNCTIONS,
    suites._TPCH,
    suites._CDC_TIMESERIES,
    suites._TEXT_EXTENDED,
    suites._DEDUP_SIMILARITY,
    suites._STATS_FUNCTIONS,
    suites._QUALITY_SAMPLING,
    suites._STREAMING,
)
_ALL_SPECS = [t for g in _SPEC_GROUPS for t in g]


@pytest.mark.parametrize(
    "name,exact_cols,dbl_cols",
    _ALL_SPECS,
    ids=[s[0] for s in _ALL_SPECS],
)
def test_digest_spec_matches_live_schema(spark, name, exact_cols, dbl_cols):
    df = registry.queries()[name](spark, SMOKE_SF_DIR)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    assert set(exact_cols) | set(dbl_cols) == set(by_name), name
    for c in dbl_cols:
        assert isinstance(by_name[c], DoubleType), (name, c)
    for c in exact_cols:
        assert not isinstance(by_name[c], DoubleType), (name, c)


def test_digest_specs_sorted_for_stable_order():
    # both sides ORDER BY op; the spec lists must be sorted so the
    # oracle's UNION ALL branches and the Spark union enumerate the
    # same ops
    for spec in _SPEC_GROUPS:
        names = [s[0] for s in spec]
        assert names == sorted(names)
    # no query folded twice across digests (a double fold would be
    # harmless but wasteful and confusing in the driver output)
    all_names = [s[0] for s in _ALL_SPECS]
    assert len(all_names) == len(set(all_names))


def test_priority_window_is_exactly_50_and_resolvable():
    qs = registry.queries()
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"priority names not registered: {missing}"
    # the driver checks the first 50 in iteration order — they must be
    # exactly the curated window
    assert tuple(list(qs)[:50]) == _PRIORITY
    # every windowed query must carry an oracle (strong check), since
    # the window exists to maximize driver-verified coverage
    oracles = registry.oracle_sql()
    unoracled = [n for n in _PRIORITY if n not in oracles]
    assert not unoracled, f"windowed queries without oracle: {unoracled}"


def test_folded_row_counts_fit_exact_hash_sum(duck):
    """sum(36-bit hash x n_rows) must stay exactly representable in the
    final DOUBLE: n_rows * 2^36 < 2^53 needs n_rows < ~131k. Checked
    against the DuckDB oracle at the driver's correctness scale (cheap;
    no Spark execution). Streaming specs are fixture-sized and excluded
    (their oracles replay VALUES CTEs, trivially small)."""
    for name, _, _ in _ALL_SPECS:
        sql = registry.oracle_sql()[name]
        n = duck.sql(f"SELECT COUNT(*) FROM ({sql}) q").fetchone()[0]
        assert n < 120_000, (name, n)
