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

_ALL_SPECS = suites._RELATIONAL + suites._GROUPING + suites._FUNCTIONS


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
    for spec in (suites._RELATIONAL, suites._GROUPING, suites._FUNCTIONS):
        names = [s[0] for s in spec]
        assert names == sorted(names)


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
