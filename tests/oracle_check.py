"""Local replica of the driver's correctness gate (BASELINE.md t2).

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet, then compares row count, column names, and
order-insensitive canonicalized values — strictly, so anything that
passes here should pass any reasonable driver comparison.

Usage:
    python -m tests.oracle_check [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from mobility_etl_spark.io import DRIVER_TABLES
from mobility_etl_spark.registry import QuerySpec, load_all

DEFAULT_SF = "/root/testdata/sf0.001"


def _canon_value(v):
    """Canonicalize one cell for cross-engine comparison.

    NaN canonicalizes to None (not a distinct "NaN" marker): pandas
    transport represents SQL NULL as NaN in engine-dependent dtypes —
    e.g. an ungrouped bool_and/MIN over EMPTY input is NULL in BOTH
    engines, but DuckDB's .df() hands it over as float NaN while
    Spark's toPandas hands over object None (fuzzer soak find,
    2026-08-15; regression pinned in test_differential_fuzz.py).
    Conflating them is symmetric and masks no real divergence: an
    expression that truly produces NaN (e.g. sqrt(-1)) does so in both
    engines, and both then canonicalize to None alike."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return _canon_value(float(v))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return bool(v)
    return v


def canon_rows(df: pd.DataFrame) -> list[str]:
    """Sort columns by name, canonicalize values, sort rows.

    Returns ``repr`` strings, not tuples: the driver hashes canonical
    *representations*, so ``99111`` (Spark int64) and ``99111.0``
    (DuckDB HUGEINT→float64) must MISMATCH here exactly as they do
    there. Tuple equality (int == float is True in Python) hid that
    class of drift in round 1 — two json queries passed locally and
    failed the driver hash."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(repr(tuple(_canon_value(v) for v in row)))
    return sorted(out)


def driver_sortable(df: pd.DataFrame) -> str | None:
    """Replicate the driver's row canonicalizer: ``sort_values`` over
    every output column. Array/ndarray cells crash it (unhashable in
    pandas factorize) — three round-1 queries ERR'd this way while the
    local gate canonicalized them fine. Returns the error string, or
    None if the frame is driver-sortable."""
    try:
        df.sort_values(list(df.columns))
    except Exception as exc:  # noqa: BLE001
        return f"{type(exc).__name__}: {exc}"
    return None


@dataclass
class Result:
    name: str
    ok: bool
    detail: str


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare_one(spark, con, spec: QuerySpec, sf_dir: str) -> Result:
    sdf = spec.builder(spark, sf_dir).toPandas()
    sort_err = driver_sortable(sdf)
    if sort_err is not None:
        return Result(spec.name, False, f"driver-canon crash: {sort_err}")
    if spec.oracle is None:
        return Result(spec.name, True, f"rows-only: {len(sdf)} rows")
    odf = con.execute(spec.oracle).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return Result(
            spec.name,
            False,
            f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
        )
    if len(sdf) != len(odf):
        return Result(spec.name, False, f"row count: spark={len(sdf)} oracle={len(odf)}")
    srows, orows = canon_rows(sdf), canon_rows(odf)
    if srows == orows:
        return Result(spec.name, True, f"match: {len(sdf)} rows")
    # find first diff for debugging
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            return Result(spec.name, False, f"value diff at sorted row {i}:\n  spark : {a}\n  oracle: {b}")
    return Result(spec.name, False, "row multiset diff (tail)")


def run(sf_dir: str = DEFAULT_SF, names: list[str] | None = None, spark=None):
    from mobility_etl_spark.session import get_spark

    specs = load_all()
    if names:
        specs = {n: specs[n] for n in names}
    own_spark = spark is None
    if own_spark:
        spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    results = []
    for name in sorted(specs):
        try:
            results.append(compare_one(spark, con, specs[name], sf_dir))
        except Exception as exc:  # noqa: BLE001 - report, keep going
            results.append(Result(name, False, f"EXception: {type(exc).__name__}: {exc}"))
    return results


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = DEFAULT_SF
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    results = run(sf_dir, args or None)
    n_fail = 0
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        if not r.ok:
            n_fail += 1
        print(f"[{mark}] {r.name}: {r.detail}")
    print(f"\n{len(results) - n_fail}/{len(results)} passed @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
