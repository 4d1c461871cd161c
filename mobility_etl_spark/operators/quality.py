"""Declarative data-quality constraint checking.

The reference's only quality control is "the blob landed" (SURVEY.md
§5); a production lake needs row-level validation at the bronze→silver
edge: which rows violate which declared constraints, and a clean
stream of the rows that pass. This operator is the engine-native form:

- constraints are named boolean Columns (arbitrary expressions —
  range checks, regex, FK-existence via a pre-joined flag),
- one pass computes every constraint (single projection, whole-stage
  codegen — NOT one scan per rule),
- violations come back long-form ``(key cols…, constraint)`` so they
  aggregate/route like any fact table; valid rows keep their schema.

At 100 TB: the violation fan-out is bounded by (rows × failed rules),
the valid path adds zero shuffles, and FK checks should be phrased as
broadcast anti-join flags *before* calling this (digests-not-payloads
rule, SURVEY.md §2.C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    constraints: dict[str, Column],
    key_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """Return ``(valid, violations)``.

    ``valid``: rows satisfying every constraint, original schema.
    ``violations``: ``key_cols + [constraint]``, one row per failed
    (row, rule) pair.
    """
    flagged = df.select(
        "*", *[(~c).alias(f"__viol_{name}") for name, c in constraints.items()]
    )
    any_viol = None
    for name in constraints:
        col = F.col(f"__viol_{name}")
        any_viol = col if any_viol is None else (any_viol | col)
    valid = flagged.filter(~any_viol).drop(
        *[f"__viol_{n}" for n in constraints]
    )
    names_arr = F.array_compact(
        F.array(
            *[
                F.when(F.col(f"__viol_{n}"), F.lit(n))
                for n in constraints
            ]
        )
    )
    violations = (
        flagged.filter(any_viol)
        .select(*key_cols, F.explode(names_arr).alias("constraint"))
    )
    return valid, violations


def observe_constraints(
    df: DataFrame, constraints: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Piggyback per-constraint violation counts on whatever action
    consumes ``df`` next (a write, a count) via ``Observation`` —
    the metrics ride the SAME job as the data pass, so a bronze→silver
    write reports its quality profile with zero extra scans. At 100 TB
    a separate "count the violations" job is a second read of the
    lake; this is free.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action ran. Metric names: ``viol_<constraint>`` + ``rows``.
    """
    obs = Observation("quality")
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(~c, 1).otherwise(0)).alias(f"viol_{name}")
        for name, c in constraints.items()
    ]
    return df.observe(obs, *metrics), obs
