"""Oracle-stable rounding for float aggregates.

Spark rounds a double via the exact decimal expansion of its binary value
(BigDecimal HALF_UP); DuckDB rounds via multiply/round/divide. For values
sitting exactly on a rounding boundary (x.xx5 — typical for averages of
2-decimal data) the two can disagree by one ulp of the last kept digit.

Fix: shift both sides by +1e-9 before rounding. No real data value lands
exactly on ``boundary - 1e-9``, so both engines see a value strictly off the
boundary and agree. The same ``+ 1e-9`` literal must appear in the DuckDB
oracle SQL (``round((expr) + 1e-9, n)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9


def rnd(col: Column | str, n: int = 2) -> Column:
    """round(col + 1e-9, n) — pair with ``round((...) + 1e-9, n)`` in SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c + EPS, n)
