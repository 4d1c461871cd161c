"""Delay-string parser (SURVEY.md §2.B E13/E23, §7 hard-part 3).

The reference's scraped ``Delay`` column is free text (every cell is
``.text.strip()``, reference dags/warsaw-delays.py:147-154); its
pagination parser pulls ints out of arbitrary text
(dags/warsaw-delays.py:91-92). The engine generalizes that into a
TOTAL parser: any string → delay in seconds, NULL on no-match, never
throws (property-tested in tests/test_functions.py).

Pure built-in expressions (regexp_extract + casts) — stays inside
whole-stage codegen, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# "5 min 30 s" / "-3 min" / "12 s" / "7:45" (min:sec) / bare "90" (sec)
_SIGN = r"^\s*(-)?"
_MIN_SEC = r"(?:(\d+)\s*(?:min|m)\b)?\s*(?:(\d+)\s*(?:sec|s)\b)?"
_CLOCK = r"(\d+):([0-5]?\d)"
_BARE = r"(\d+)\s*$"


def parse_delay_seconds(col: Column | str) -> Column:
    """Total parser: delay text → signed seconds (int), NULL if unparseable.

    Accepted shapes (whitespace-tolerant, optional leading ``-``):
      * ``"5 min 30 s"`` / ``"5 min"`` / ``"30 s"`` → 330 / 300 / 30
      * ``"7:45"``  (minutes:seconds)               → 465
      * ``"90"``    (bare seconds)                  → 90
    """
    col = F.col(col) if isinstance(col, str) else col
    s = F.trim(col)
    sign = F.when(F.regexp_extract(s, _SIGN, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    body = F.regexp_replace(s, r"^\s*-\s*", "")

    clock_min = F.regexp_extract(body, r"^" + _CLOCK + r"\s*$", 1)
    clock_sec = F.regexp_extract(body, r"^" + _CLOCK + r"\s*$", 2)
    unit_min = F.regexp_extract(body, r"^" + _MIN_SEC + r"\s*$", 1)
    unit_sec = F.regexp_extract(body, r"^" + _MIN_SEC + r"\s*$", 2)
    bare = F.regexp_extract(body, r"^" + _BARE, 1)

    def _i(c: Column) -> Column:
        return F.when(c == "", F.lit(None)).otherwise(c).cast("int")

    total = (
        F.when(_i(clock_min).isNotNull(), _i(clock_min) * 60 + _i(clock_sec))
        .when(
            _i(unit_min).isNotNull() | _i(unit_sec).isNotNull(),
            F.coalesce(_i(unit_min), F.lit(0)) * 60
            + F.coalesce(_i(unit_sec), F.lit(0)),
        )
        .when(_i(bare).isNotNull(), _i(bare))
    )
    return (sign * total).cast("int")
