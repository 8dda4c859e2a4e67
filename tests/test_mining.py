"""Unit + golden tests for the SQL workload miner (SURVEY §5.2.2 — the
most bug-prone layer; parity with reference parse_underlying_query,
src/partitioning.py:22-66)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from trino_adaptive_partitioning_tool_spark.operators import mining


def test_simple_join_where():
    m = mining.mine_statement(
        "SELECT o.o_orderkey, c.c_name FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_mktsegment = 'BUILDING'"
    )
    assert m["parsed"]
    assert m["tables"] == ["orders", "customer"]
    assert m["join_columns"] == {"o_custkey": 1, "c_custkey": 1}
    assert m["where_columns"] == {"c_mktsegment": 1}
    assert not m["has_limit"]


def test_three_way_join():
    m = mining.mine_statement(
        "SELECT l.l_orderkey FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey"
    )
    assert m["tables"] == ["lineitem", "orders", "customer"]
    assert m["join_columns"] == {
        "l_orderkey": 1, "o_orderkey": 1, "o_custkey": 1, "c_custkey": 1,
    }


def test_where_function_call_skipped_column_counted():
    m = mining.mine_statement(
        "SELECT 1 FROM customer WHERE upper(c_name) = 'A' AND c_acctbal > 10"
    )
    assert m["where_columns"] == {"c_name": 1, "c_acctbal": 1}


def test_alias_not_counted_as_column():
    m = mining.mine_statement(
        "SELECT 1 FROM orders o WHERE o.o_orderstatus = 'F'"
    )
    assert m["where_columns"] == {"o_orderstatus": 1}


def test_repeated_column_occurrences_counted():
    m = mining.mine_statement(
        "SELECT 1 FROM orders WHERE o_totalprice > 10 AND o_totalprice < 100"
    )
    assert m["where_columns"] == {"o_totalprice": 2}


def test_limit_detection():
    assert mining.mine_statement("SELECT 1 FROM orders LIMIT 5")["has_limit"]
    assert not mining.mine_statement("SELECT 1 FROM orders")["has_limit"]


def test_unparseable_statement():
    m = mining.mine_statement("EXPLAIN ANALYZE ??? not really sql (")
    assert not m["parsed"]
    assert m["tables"] == []
    assert not m["join_columns"] and not m["where_columns"]


def test_subquery_in_from_skipped():
    m = mining.mine_statement(
        "SELECT x FROM (SELECT o_orderkey AS x FROM orders) t WHERE x > 1"
    )
    # derived table: no base-table attribution, where still mined
    assert m["tables"] == []
    assert m["where_columns"] == {"x": 1}


def test_comma_join_from_list():
    m = mining.mine_statement(
        "SELECT 1 FROM orders o, customer c WHERE o.o_custkey = c.c_custkey"
    )
    assert m["tables"] == ["orders", "customer"]
    assert m["where_columns"] == {"o_custkey": 1, "c_custkey": 1}


def test_extract_select_from_mv_ddl():
    sql = (
        "CREATE MATERIALIZED VIEW analytics.orders AS "
        "SELECT o_orderkey AS key FROM orders"
    )
    assert mining.extract_select_statement(sql) == (
        "SELECT o_orderkey AS key FROM orders"
    )


def test_extract_select_alias_containing_as_not_split():
    # the reference's " AS " string-split breaks here (SURVEY F1/§8);
    # the anchored regex must not
    sql = (
        "CREATE MATERIALIZED VIEW s.v AS "
        "SELECT o_orderkey AS order_as_key FROM orders"
    )
    out = mining.extract_select_statement(sql)
    assert out.startswith("SELECT o_orderkey AS order_as_key")


def test_schema_qualified_table_base_name():
    m = mining.mine_statement("SELECT 1 FROM analytics.orders WHERE o_orderkey = 1")
    assert m["tables"] == ["orders"]


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_miner_never_crashes(sql):
    m = mining.mine_statement(sql)
    assert isinstance(m["parsed"], bool)
    assert all(c >= 1 for c in m["join_columns"].values())
    assert all(c >= 1 for c in m["where_columns"].values())
    assert len(m["tables"]) == len(set(m["tables"]))


def test_mine_query_log_dataframe(spark):
    from trino_adaptive_partitioning_tool_spark.sources import fixtures

    logs = fixtures.query_logs_df(spark)
    mined = mining.mine_query_log(logs).collect()
    kinds = {r["kind"] for r in mined}
    assert kinds == {"table", "join_column", "where_column", "limit_marker"}
    q3 = [r for r in mined if r["query_id"] == "q_0003"]
    assert {(r["kind"], r["name"]) for r in q3} == {
        ("table", "orders"), ("table", "customer"),
        ("join_column", "o_custkey"), ("join_column", "c_custkey"),
        ("where_column", "c_mktsegment"),
    }
    # unparseable q_0011 yields nothing
    assert not [r for r in mined if r["query_id"] == "q_0011"]
