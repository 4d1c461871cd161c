"""Random differential SQL fuzzing: hypothesis generates WHERE-clause
predicate trees and aggregate shapes over ``lineitem``; the SAME ANSI
SQL string runs on Spark and DuckDB over the same parquet, and the
canonicalized results must match exactly.

The registered faces pin ~250 hand-written queries; this harness walks
the space BETWEEN them — random predicate nesting, NULL-semantics
corners, NOT over ORs, <=/>= boundary literals — exactly where
engine-semantics divergences hide (this round alone found three by
hand: double→BIGINT cast rounding, `/` float division, interpolating
vs discrete percentiles; the grammar here restricts itself to
operations both engines define identically: comparisons, boolean
algebra, COUNT/MIN/MAX, decimal-cast SUM, integer SUM).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.oracle_check import canon_rows

SF_DIR = "/root/testdata/sf0.001"

#: (column, sql type class) — numeric literals chosen inside the data
#: range so predicates are selective, not vacuous.
NUM_COLS = {
    "l_orderkey": [1, 500, 3000, 5999],
    "l_quantity": [1.0, 10.0, 25.0, 49.0],
    "l_extendedprice": [1000.0, 20000.0, 60000.0],
    "l_discount": [0.0, 0.04, 0.08],
    "l_linenumber": [1, 3, 6],
}
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
OPS = ["<", "<=", "=", ">=", ">", "<>"]


@st.composite
def atom(draw):
    if draw(st.booleans()):
        col = draw(st.sampled_from(sorted(NUM_COLS)))
        op = draw(st.sampled_from(OPS))
        lit = draw(st.sampled_from(NUM_COLS[col]))
        return f"({col} {op} {lit})"
    col = draw(st.sampled_from(sorted(STR_COLS)))
    if draw(st.booleans()):
        op = draw(st.sampled_from(["=", "<>"]))
        lit = draw(st.sampled_from(STR_COLS[col]))
        return f"({col} {op} '{lit}')"
    vals = draw(
        st.lists(st.sampled_from(STR_COLS[col]), min_size=1, max_size=2)
    )
    inlist = ", ".join(f"'{v}'" for v in sorted(set(vals)))
    return f"({col} IN ({inlist}))"


@st.composite
def predicate(draw, depth=2):
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        p = draw(atom())
    else:
        a = draw(predicate(depth=depth - 1))
        b = draw(predicate(depth=depth - 1))
        p = f"({a} {draw(st.sampled_from(['AND', 'OR']))} {b})"
    if draw(st.integers(0, 3)) == 0:
        p = f"(NOT {p})"
    return p


AGGS = [
    "COUNT(*) AS n",
    "CAST(SUM(l_orderkey) AS BIGINT) AS sum_key",
    "MIN(l_extendedprice) AS min_price",
    "MAX(l_quantity) AS max_qty",
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)"
    " AS sum_price",
    "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp",
]


@pytest.fixture(scope="module")
def engines(spark):
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS "
        f"SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    yield spark, con
    con.close()


@given(
    pred=predicate(),
    aggs=st.lists(st.sampled_from(AGGS), min_size=1, max_size=3,
                  unique=True),
    grouped=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_random_query_differential(engines, pred, aggs, grouped):
    spark, con = engines
    group = "l_returnflag, l_linestatus" if grouped else ""
    sel = (f"{group}, " if group else "") + ", ".join(sorted(aggs))
    sql = f"SELECT {sel} FROM lineitem WHERE {pred}"
    if group:
        sql += f" GROUP BY {group}"
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


ORDER_ATOMS = [
    "(o_totalprice > 100000)",
    "(o_totalprice <= 150000)",
    "(o_orderpriority = '1-URGENT')",
    "(o_orderstatus <> 'F')",
    "(o_custkey % 7 = 0)",
    "(o_orderkey < 3000)",
]


@pytest.fixture(scope="module")
def engines2(engines):
    spark, con = engines
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    return spark, con


@given(
    pred=predicate(),
    opred=st.sampled_from(ORDER_ATOMS),
    jtype=st.sampled_from(["JOIN", "LEFT JOIN"]),
    aggs=st.lists(st.sampled_from(AGGS), min_size=1, max_size=2,
                  unique=True),
)
@settings(max_examples=40, deadline=None)
def test_random_join_differential(engines2, pred, opred, jtype, aggs):
    """Same harness over a two-table join: lineitem ⋈ orders on the
    order key (inner and left), fact-side predicate tree + one
    dim-side predicate, grouped by priority. LEFT JOIN + WHERE-on-
    right exercises the null-extension/filter interaction both
    engines must resolve identically."""
    spark, con = engines2
    on_clause = "l.l_orderkey = o.o_orderkey"
    where = f"{pred}"
    if jtype == "JOIN":
        where += f" AND {opred}"
        group = "o.o_orderpriority"
    else:
        group = "l.l_returnflag"
    sel = f"{group}, " + ", ".join(sorted(aggs))
    sql = (
        f"SELECT {sel} FROM lineitem l {jtype} orders o ON {on_clause} "
        f"WHERE {where} GROUP BY {group}"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql
