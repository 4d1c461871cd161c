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

#: r15: the fuzz soaks are long-running drills — excluded from the
#: default (driver-budget) run; see pytest.ini. Run with -m "".
pytestmark = pytest.mark.slow
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
    # FILTER-clause + boolean aggregates (added r9, probe-verified;
    # count_if EXCLUDED — result type differs across engines, and the
    # COUNT(*) FILTER form expresses the same thing portably).
    "COUNT(*) FILTER (WHERE l_quantity > 25.0) AS n_heavy",
    "CAST(SUM(l_orderkey) FILTER (WHERE l_linestatus = 'O')"
    " AS BIGINT) AS sum_key_open",
    "MIN(l_extendedprice) FILTER (WHERE l_discount >= 0.04)"
    " AS min_price_disc",
    "CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_linenumber <= 3)"
    " AS BIGINT) AS n_supp_low",
    "bool_and(l_quantity > 0.5) AS all_pos",
    "bool_or(l_discount > 0.09) AS any_deep_disc",
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


# ------------------------------------------------- family 3: GROUP BY+HAVING
#
# Mixed grouping keys — raw strings plus COMPUTED integer expressions
# (modulo buckets, explicit-FLOOR deciles: FLOOR is spelled out because
# DuckDB's CAST(double AS BIGINT) rounds where Spark truncates, one of
# the hand-found divergences the grammar must stay clear of) — and a
# HAVING tree over the aggregates, the post-agg filter path the WHERE
# fuzzer never touches.

GROUP_KEYS = [
    "l_returnflag",
    "l_linestatus",
    "(l_linenumber % 3) AS ln_bucket",
    "CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS qty_decile",
    "CAST(FLOOR(l_extendedprice / 20000.0) AS BIGINT) AS price_band",
]

HAVING_ATOMS = [
    "COUNT(*) > 5",
    "COUNT(*) <= 40",
    "MIN(l_extendedprice) < 30000.0",
    "MAX(l_quantity) >= 20.0",
    "CAST(SUM(l_orderkey) AS BIGINT) > 50000",
    "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) >= 3",
]


@given(
    keys=st.lists(st.sampled_from(GROUP_KEYS), min_size=1, max_size=3,
                  unique=True),
    pred=predicate(depth=1),
    havings=st.lists(st.sampled_from(HAVING_ATOMS), min_size=1,
                     max_size=2, unique=True),
    conj=st.sampled_from(["AND", "OR"]),
    aggs=st.lists(st.sampled_from(AGGS), min_size=1, max_size=2,
                  unique=True),
)
@settings(max_examples=40, deadline=None)
def test_random_groupby_having_differential(
    engines, keys, pred, havings, conj, aggs
):
    spark, con = engines
    key_exprs = sorted(keys)
    # GROUP BY references the underlying expression, not the alias
    # (alias-in-GROUP-BY support differs across engines' SQL dialects).
    # rsplit: the LAST " AS " is the alias — inner casts carry their own.
    group = ", ".join(k.rsplit(" AS ", 1)[0] for k in key_exprs)
    sel = ", ".join(key_exprs) + ", " + ", ".join(sorted(aggs))
    having = f" {conj} ".join(f"({h})" for h in sorted(havings))
    sql = (
        f"SELECT {sel} FROM lineitem WHERE {pred} "
        f"GROUP BY {group} HAVING {having}"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# --------------------------------------------- family 4: ordered windows
#
# Fully-deterministic window functions over ORDERS: every ORDER BY
# ends with o_orderkey, the table's genuinely unique key (lineitem's
# (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
# the first draft of this family found that out as a false positive:
# running sums at interior rows of a tie group are frame-order-
# dependent, not an engine divergence).  Doubles are kept OUT of
# running sums (segment-tree summation order differs); prices are
# floored to BIGINT first (FLOOR sidesteps the round-vs-truncate cast
# divergence).

WINDOW_FUNCS = [
    "ROW_NUMBER() OVER w AS rn",
    "RANK() OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice DESC) AS rk",
    "DENSE_RANK() OVER (PARTITION BY o_orderpriority "
    "ORDER BY CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) DESC) AS drk",
    "LAG(o_custkey, 1) OVER w AS prev_cust",
    "LEAD(o_orderkey, 2) OVER w AS next_key",
    "CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) OVER ("
    "PARTITION BY o_orderpriority ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
    " AS run_price",
    "CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY "
    "o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
    " AS BIGINT) AS cnt4",
    # RANGE frames (added r9, probe-verified): value-based bounds are
    # TIE-SAFE by definition (all peers enter the frame together), so
    # unlike ROWS they need no unique-key discipline; includes an
    # INTERVAL bound over the timestamp column.
    "CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) OVER ("
    "PARTITION BY o_orderpriority ORDER BY o_custkey "
    "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT)"
    " AS rng_sum",
    "CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY "
    "o_custkey RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING)"
    " AS BIGINT) AS rng_cnt",
    "MIN(o_custkey) OVER (PARTITION BY o_orderpriority ORDER BY "
    "o_orderkey RANGE BETWEEN UNBOUNDED PRECEDING AND 100 FOLLOWING)"
    " AS rng_min",
    "CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY "
    "o_orderdate RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND "
    "CURRENT ROW) AS BIGINT) AS rng_tcnt",
]

WINDOW_ORDERS = [
    "ORDER BY o_totalprice DESC, o_orderkey",
    "ORDER BY o_custkey, o_orderkey",
    "ORDER BY o_orderkey",
]

WINDOW_PREDS = [
    "(o_totalprice > 100000)",
    "(o_orderstatus <> 'F')",
    "(o_custkey % 3 = 0)",
    "(o_orderkey < 4000)",
    "(o_orderpriority IN ('1-URGENT', '3-MEDIUM'))",
]


@given(
    funcs=st.lists(st.sampled_from(WINDOW_FUNCS), min_size=1, max_size=3,
                   unique=True),
    worder=st.sampled_from(WINDOW_ORDERS),
    preds=st.lists(st.sampled_from(WINDOW_PREDS), min_size=1, max_size=2,
                   unique=True),
    part=st.sampled_from(["o_orderpriority", "o_orderstatus"]),
)
@settings(max_examples=40, deadline=None)
def test_random_window_differential(engines2, funcs, worder, preds, part):
    spark, con = engines2
    sel = "o_orderkey, " + ", ".join(sorted(funcs))
    pred = " AND ".join(sorted(preds))
    sql = (
        f"SELECT {sel} FROM orders WHERE {pred} "
        f"WINDOW w AS (PARTITION BY {part} {worder})"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# -------------------------------------- family 5: events timestamp corners
#
# The events table is the richest divergence surface (timestamp
# semantics; the session timezone is pinned to UTC in both engines so
# date_trunc/EXTRACT agree).  Day-of-week is deliberately ABSENT: Spark
# dayofweek is 1=Sunday while DuckDB EXTRACT(dow) is 0=Sunday — a
# known, documented dialect split, not a bug either engine would fix.

TS_ATOMS = [
    "(ts >= TIMESTAMP '2024-01-10 00:00:00')",
    "(ts < TIMESTAMP '2024-01-20 12:30:00')",
    "(ts BETWEEN TIMESTAMP '2024-01-05 06:00:00' "
    "AND TIMESTAMP '2024-01-25 18:00:00')",
    "(CAST(ts AS DATE) = DATE '2024-01-15')",
    "(EXTRACT(HOUR FROM ts) >= 12)",
    "(EXTRACT(DAY FROM ts) % 2 = 0)",
    "(event_type IN ('click', 'purchase'))",
    "(event_type <> 'error')",
    "(user_id % 5 = 1)",
    "(value > 100.0)",
]

TS_KEYS = [
    # DATE output is normalized to VARCHAR: Spark's toPandas gives
    # datetime.date while DuckDB's .df() gives midnight datetime64 —
    # a representation artifact, not an engine divergence (registered
    # faces use strftime/date_format for the same reason).
    "CAST(CAST(ts AS DATE) AS STRING) AS d",
    "date_trunc('DAY', ts) AS day_ts",
    "date_trunc('HOUR', ts) AS hour_ts",
    "CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hh",
    "event_type",
]

TS_AGGS = [
    "COUNT(*) AS n",
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users",
    "MIN(ts) AS first_ts",
    "MAX(ts) AS last_ts",
    "CAST(SUM(event_id) AS BIGINT) AS sum_id",
]


@st.composite
def ts_predicate(draw, depth=2):
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        p = draw(st.sampled_from(TS_ATOMS))
    else:
        a = draw(ts_predicate(depth=depth - 1))
        b = draw(ts_predicate(depth=depth - 1))
        p = f"({a} {draw(st.sampled_from(['AND', 'OR']))} {b})"
    if draw(st.integers(0, 3)) == 0:
        p = f"(NOT {p})"
    return p


@pytest.fixture(scope="module")
def engines3(engines):
    spark, con = engines
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
        "events"
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    return spark, con


@given(
    pred=ts_predicate(),
    keys=st.lists(st.sampled_from(TS_KEYS), min_size=1, max_size=2,
                  unique=True),
    aggs=st.lists(st.sampled_from(TS_AGGS), min_size=1, max_size=3,
                  unique=True),
)
@settings(max_examples=50, deadline=None)
def test_random_events_timestamp_differential(engines3, pred, keys, aggs):
    spark, con = engines3
    key_exprs = sorted(keys)
    group = ", ".join(k.rsplit(" AS ", 1)[0] for k in key_exprs)
    sel = ", ".join(key_exprs) + ", " + ", ".join(sorted(aggs))
    sql = (
        f"SELECT {sel} FROM events WHERE {pred} GROUP BY {group}"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# ------------------------------------------ family 6: three-table joins
#
# lineitem ⋈ orders ⋈ customer with independently-drawn join types:
# the multi-way null-extension surface two-table joins never reach
# (a LEFT JOIN chained under another LEFT JOIN can group on a
# twice-null-extended key). Aggregates stay on the fact side, where
# no join type can introduce NULLs the AGGS weren't written for.

CUST_ATOMS = [
    "(c.c_acctbal > 5000.0)",
    "(c.c_mktsegment = 'BUILDING')",
    "(c.c_custkey % 4 = 1)",
    "(c.c_nationkey < 13)",
]


@pytest.fixture(scope="module")
def engines4(engines2):
    spark, con = engines2
    spark.read.parquet(f"{SF_DIR}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
    )
    return spark, con


@given(
    pred=predicate(depth=1),
    jt1=st.sampled_from(["JOIN", "LEFT JOIN"]),
    jt2=st.sampled_from(["JOIN", "LEFT JOIN"]),
    cpred=st.one_of(st.none(), st.sampled_from(CUST_ATOMS)),
    group=st.sampled_from(
        ["c.c_mktsegment", "o.o_orderpriority, c.c_mktsegment",
         "l.l_returnflag, c.c_nationkey"]
    ),
    aggs=st.lists(st.sampled_from(AGGS), min_size=1, max_size=2,
                  unique=True),
)
@settings(max_examples=40, deadline=None)
def test_random_three_table_join_differential(
    engines4, pred, jt1, jt2, cpred, group, aggs
):
    spark, con = engines4
    where = pred if cpred is None else f"{pred} AND {cpred}"
    sql = (
        f"SELECT {group}, " + ", ".join(sorted(aggs)) +
        f" FROM lineitem l {jt1} orders o ON l.l_orderkey = o.o_orderkey"
        f" {jt2} customer c ON o.o_custkey = c.c_custkey"
        f" WHERE {where} GROUP BY {group}"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# --------------------------- family 7: EXISTS / IN correlated subqueries
#
# The decorrelation surface: both engines rewrite these into joins via
# entirely different optimizer paths (Spark RewritePredicateSubquery,
# DuckDB's flattening), so any disagreement in the rewrite shows up as
# a row diff. NOT IN draws a NULL-producing subquery on purpose: one
# NULL in the IN-list makes NOT IN UNKNOWN for every non-matching row
# (standard 3VL both engines must honor — the classic silent-killer).

ORDER_AGGS = [
    "COUNT(*) AS n",
    "CAST(SUM(o_orderkey) AS BIGINT) AS sum_key",
    "MIN(o_totalprice) AS min_price",
    "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust",
]


@given(
    lp=predicate(depth=1),
    opred=st.sampled_from(ORDER_ATOMS),
    shape=st.sampled_from(["EXISTS", "NOT EXISTS", "IN", "NOT IN",
                           "NOT IN NULLABLE"]),
    aggs=st.lists(st.sampled_from(ORDER_AGGS), min_size=1, max_size=2,
                  unique=True),
)
@settings(max_examples=40, deadline=None)
def test_random_correlated_subquery_differential(
    engines2, lp, opred, shape, aggs
):
    spark, con = engines2
    if shape in ("EXISTS", "NOT EXISTS"):
        corr = (
            f"{shape} (SELECT 1 FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND {lp})"
        )
    elif shape == "NOT IN NULLABLE":
        corr = (
            "o.o_orderkey NOT IN (SELECT CASE WHEN l_linenumber = 6 "
            f"THEN NULL ELSE l_orderkey END FROM lineitem WHERE {lp})"
        )
    else:
        corr = (
            f"o.o_orderkey {shape} "
            f"(SELECT l_orderkey FROM lineitem WHERE {lp})"
        )
    sql = (
        "SELECT o.o_orderpriority, " + ", ".join(sorted(aggs)) +
        f" FROM orders o WHERE {opred} AND {corr}"
        " GROUP BY o.o_orderpriority"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# ------------------------------- family 8: set operations with NULL rows
#
# UNION / INTERSECT / EXCEPT in both DISTINCT and ALL flavors, between
# two branches over the SAME table (different predicate trees, same
# projection) so intersections are non-vacuous. NULLIF injects NULLs
# into the projected keys: set-op equality treats NULL as EQUAL to
# NULL (unlike WHERE-clause =), and multiset (ALL) semantics must
# subtract/keep duplicate counts identically.

SETOP_PROJS = [
    "l_returnflag AS k, CAST(l_linenumber % 3 AS BIGINT) AS b",
    "NULLIF(l_returnflag, 'A') AS k, "
    "CAST(l_quantity > 25.0 AS INT) AS b",
    "NULLIF(l_linestatus, 'F') AS k, "
    "CAST(FLOOR(l_discount * 25.0) AS BIGINT) AS b",
]

SETOPS = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
          "EXCEPT", "EXCEPT ALL"]


@given(
    proj=st.sampled_from(SETOP_PROJS),
    p1=predicate(depth=1),
    p2=predicate(depth=1),
    op=st.sampled_from(SETOPS),
)
@settings(max_examples=50, deadline=None)
def test_random_set_operation_differential(engines, proj, p1, p2, op):
    spark, con = engines
    sql = (
        f"SELECT k, b, COUNT(*) AS n FROM ("
        f"(SELECT {proj} FROM lineitem WHERE {p1}) {op} "
        f"(SELECT {proj} FROM lineitem WHERE {p2})"
        f") t GROUP BY k, b"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# ----------------------------- family 9: scalar-function corner atoms
#
# Projection-level fuzz over ORDERS: random draws from a pool of
# scalar expressions verified cross-engine-identical by a probe run
# (2026-08-15). EXCLUDED after that probe, with the observed split:
# CAST(negative double AS BIGINT) (Spark truncates -3.5→-3, DuckDB
# rounds →-4 — the long-standing divergence every face FLOORs around);
# substring(s, 0, n) (Spark reads start-0 as start-1, DuckDB drops one
# char); round(DOUBLE, n) (binary .5 ties are representation
# lottery); overlay/format_number/pmod (Spark-only); bare sign()
# (DOUBLE in Spark, INT in DuckDB — safe only under an explicit CAST).

SCALAR_EXPRS = [
    "substring(o_orderpriority, 3, 4) AS s_sub",
    "split_part(o_orderpriority, '-', 2) AS s_split",
    "lpad(o_orderstatus, 4, 'xy') AS s_lpad",
    "translate(o_orderpriority, '-EU', '_eu') AS s_tr",
    "concat_ws('|', o_orderstatus, NULLIF(o_orderstatus, 'F'),"
    " left(o_orderpriority, 1)) AS s_cat",
    "repeat(o_orderstatus, 2) AS s_rep",
    "reverse(o_orderpriority) AS s_rev",
    "levenshtein(o_orderpriority, '1-URGENT') AS n_lev",
    "ascii(o_orderstatus) AS n_asc",
    "instr(o_orderpriority, 'E') AS n_instr",
    "(o_custkey - 700) % 13 AS n_mod",
    "greatest(o_custkey % 100, 37) AS n_great",
    "least(o_orderkey % 50, CAST(o_custkey % 50 AS BIGINT)) AS n_least",
    "CAST(sign(o_totalprice - 150000.0) AS INT) AS n_sign",
    "bit_count(o_orderkey) AS n_bits",
    "CAST(FLOOR(log2(o_orderkey + 2.0)) AS BIGINT) AS n_log",
    "abs(o_custkey - 750) AS n_abs",
]


@given(
    exprs=st.lists(st.sampled_from(SCALAR_EXPRS), min_size=2, max_size=4,
                   unique=True),
    pred=st.sampled_from(ORDER_ATOMS),
)
@settings(max_examples=50, deadline=None)
def test_random_scalar_function_differential(engines2, exprs, pred):
    spark, con = engines2
    sql = (
        "SELECT o_orderkey, " + ", ".join(sorted(exprs)) +
        f" FROM orders o WHERE {pred}"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# --------------------- family 10: GROUPING SETS / ROLLUP / CUBE (ring 4)
#
# The one aggregation surface no earlier family touches: multi-set
# grouping with grouping()/grouping_id() disambiguators (probe-verified
# cross-engine 2026-08-15, incl. computed keys inside ROLLUP). Both
# grouping columns are non-NULL in the data, so a NULL key always means
# "subtotal row" and the canonical sort is unambiguous. GROUPING is
# CAST to INT and GROUPING_ID to BIGINT (Spark returns narrower
# integer types than DuckDB).
#
# DIALECT SPLIT FOUND BY THIS FAMILY (first soak, 2026-08-15): over an
# EMPTY input (a fully-selective WHERE), DuckDB emits the () grouping
# set's grand-total row — (NULL, ..., COUNT=0), the SQL-standard
# global-aggregate-over-empty behavior — while Spark emits ZERO rows
# for every grouping-set shape. Minimal repro:
#   SELECT l_returnflag, COUNT(*) FROM lineitem WHERE 1=0
#   GROUP BY ROLLUP(l_returnflag)        -- Spark: 0 rows; DuckDB: 1.
# Normalized below with HAVING COUNT(*) > 0, which ONLY that
# empty-input grand-total row can trip (every real grouping-set group
# contains >= 1 row by construction).

GSET_KEYS = [
    "l_returnflag",
    "l_linestatus",
    "(l_linenumber % 3)",
]

GSET_SHAPES = [
    "ROLLUP({k0}, {k1})",
    "CUBE({k0}, {k1})",
    "GROUPING SETS (({k0}, {k1}), ({k0}), ())",
    "GROUPING SETS (({k0}), ({k1}))",
]


@given(
    keys=st.lists(st.sampled_from(GSET_KEYS), min_size=2, max_size=2,
                  unique=True),
    shape=st.sampled_from(GSET_SHAPES),
    pred=predicate(depth=1),
    aggs=st.lists(st.sampled_from(AGGS), min_size=1, max_size=2,
                  unique=True),
    with_gid=st.booleans(),
)
@settings(max_examples=50, deadline=None)
def test_random_grouping_sets_differential(
    engines, keys, shape, pred, aggs, with_gid
):
    spark, con = engines
    k0, k1 = keys
    gcols = (
        f"{k0} AS k0, {k1} AS k1, "
        f"CAST(GROUPING({k0}) AS INT) AS g0, "
        f"CAST(GROUPING({k1}) AS INT) AS g1"
    )
    if with_gid:
        gcols += f", CAST(GROUPING_ID({k0}, {k1}) AS BIGINT) AS gid"
    sql = (
        f"SELECT {gcols}, " + ", ".join(sorted(aggs)) +
        f" FROM lineitem WHERE {pred} "
        f"GROUP BY {shape.format(k0=k0, k1=k1)} "
        f"HAVING COUNT(*) > 0"  # empty-input dialect split, see above
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# ------------------------- family 11: correlated LATERAL top-k (ring 4)
#
# The decorrelated-limit surface: a per-order top-k subquery in the
# FROM clause, CROSS and LEFT (ON TRUE) variants — both engines
# de-correlate through entirely different rewrites (Spark
# DecorrelateInnerQuery, DuckDB's dependent join flattening), and a
# wrong rewrite shows up as missing/duplicated per-group rows.
# Determinism discipline: the inner projection equals the inner ORDER
# BY prefix, so rows tying beyond it are interchangeable in the
# output (lineitem has full-duplicate rows; projecting anything the
# sort doesn't pin would be a false-positive machine).

LATERAL_ORDERS = [
    ("l_extendedprice DESC, l_linenumber", "l_extendedprice, l_linenumber"),
    ("l_extendedprice, l_linenumber", "l_extendedprice, l_linenumber"),
    ("l_quantity DESC, l_extendedprice, l_linenumber",
     "l_quantity, l_extendedprice, l_linenumber"),
]


@given(
    order_proj=st.sampled_from(LATERAL_ORDERS),
    k=st.integers(1, 3),
    lp=predicate(depth=1),
    opred=st.sampled_from(ORDER_ATOMS),
    left=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_random_lateral_topk_differential(
    engines2, order_proj, k, lp, opred, left
):
    spark, con = engines2
    order, proj = order_proj
    inner = (
        f"(SELECT {proj} FROM lineitem l "
        f"WHERE l.l_orderkey = o.o_orderkey AND {lp} "
        f"ORDER BY {order} LIMIT {k})"
    )
    if left:
        frm = f"orders o LEFT JOIN LATERAL {inner} t ON TRUE"
    else:
        frm = f"orders o, LATERAL {inner} t"
    sql = (
        f"SELECT o.o_orderkey, o.o_orderpriority, t.* FROM {frm} "
        f"WHERE {opred}"
    )
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


# ------------- family 12: window DESC / NULLS-ordering corners (ring 4)
#
# RANGE frames under DESCENDING order (PRECEDING walks toward larger
# values) and explicit NULLS FIRST/LAST over a NULLable computed sort
# key — the frame-boundary corners family 4's ascending, non-NULL
# atoms never reach. NULL peer groups enter RANGE frames as one block;
# ROWS atoms keep the o_orderkey tie-break (unique) so offsets stay
# deterministic. All probe-verified cross-engine 2026-08-15.

NULLKEY = "(CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_custkey END)"

DESC_WINDOW_FUNCS = [
    "CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) OVER ("
    "PARTITION BY o_orderpriority ORDER BY o_custkey DESC "
    "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT)"
    " AS rng_desc_sum",
    "CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY "
    "o_custkey DESC RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING)"
    " AS BIGINT) AS rng_desc_cnt",
    f"CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY "
    f"{NULLKEY} ASC NULLS FIRST "
    "RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS BIGINT)"
    " AS rng_nf_cnt",
    f"CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY "
    f"{NULLKEY} DESC NULLS LAST "
    "RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING) AS BIGINT)"
    " AS rng_nl_cnt",
    f"MIN(o_custkey) OVER (PARTITION BY o_orderstatus ORDER BY "
    f"{NULLKEY} DESC NULLS FIRST, o_orderkey "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rows_nf_min",
    f"MAX(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY "
    f"{NULLKEY} ASC NULLS LAST, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS rows_nl_max",
]


@given(
    funcs=st.lists(st.sampled_from(DESC_WINDOW_FUNCS), min_size=1,
                   max_size=3, unique=True),
    preds=st.lists(st.sampled_from(WINDOW_PREDS), min_size=1, max_size=2,
                   unique=True),
)
@settings(max_examples=40, deadline=None)
def test_random_window_nulls_desc_differential(engines2, funcs, preds):
    spark, con = engines2
    sel = "o_orderkey, " + ", ".join(sorted(funcs))
    pred = " AND ".join(sorted(preds))
    sql = f"SELECT {sel} FROM orders WHERE {pred}"
    got = canon_rows(spark.sql(sql).toPandas())
    want = canon_rows(con.execute(sql).df())
    assert got == want, sql


def test_empty_input_ungrouped_aggregate_null_transport(engines):
    """Regression pin for the 2026-08-15 soak find (seed 81502026):
    an ungrouped aggregate over EMPTY input is NULL in BOTH engines,
    but the pandas transport differs — DuckDB .df() renders the NULL
    boolean/double as float NaN, Spark toPandas as object None. Not an
    engine divergence; canon_rows now folds NaN to None (symmetric).
    Pins the original falsifying query plus the MIN/MAX-over-empty
    shape that trips the same artifact on float columns."""
    spark, con = engines
    for sql in [
        "SELECT bool_and(l_quantity > 0.5) AS all_pos FROM lineitem "
        "WHERE ((NOT (l_linestatus IN ('F'))) AND (NOT ((NOT "
        "(l_linestatus IN ('F'))) AND (NOT (l_linestatus = 'F')))))",
        "SELECT MIN(l_extendedprice) AS m, MAX(l_quantity) AS x, "
        "COUNT(*) AS n FROM lineitem WHERE 1 = 0",
    ]:
        got = canon_rows(spark.sql(sql).toPandas())
        want = canon_rows(con.execute(sql).df())
        assert got == want, sql
