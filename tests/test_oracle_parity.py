"""Local replica of the driver's DuckDB-oracle correctness gate.

For every query with a registered oracle: run the Spark version and the
DuckDB version at sf0.01 and compare row count + column names + values
(order-insensitive, columns sorted by name — matching the driver's
compare as described in the contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

from conftest import PARITY_SF_DIR

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = _normalize(_QUERIES[name](spark, PARITY_SF_DIR).toPandas())
    ddf = _normalize(duck.execute(_ORACLES[name]).df())
    assert list(sdf.columns) == list(ddf.columns), (
        f"{name}: column mismatch {list(sdf.columns)} vs {list(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if pd.api.types.is_float_dtype(a):
            ok = np.isclose(
                a.to_numpy(), b.to_numpy(), rtol=0, atol=1e-9, equal_nan=True
            ).all()
        else:
            ok = a.fillna("<null>").equals(b.fillna("<null>"))
        assert ok, f"{name}: value mismatch in column {c}\n{a.head()}\n{b.head()}"


def test_every_registered_query_has_an_oracle():
    """The registry carries ZERO rows-only queries: every entry in
    queries() has a matching oracle_sql() and is therefore fully
    value-hash checked (directly by the driver window or via its
    digest fold + the 1:1 replay above). This replaced the old
    empty-parametrize rows-only runner, which pytest reported as a
    permanent skip once the last rows-only query gained an oracle."""
    assert set(_QUERIES) == set(_ORACLES), (
        f"rows-only queries appeared: {sorted(set(_QUERIES) - set(_ORACLES))} / "
        f"orphan oracles: {sorted(set(_ORACLES) - set(_QUERIES))}"
    )
