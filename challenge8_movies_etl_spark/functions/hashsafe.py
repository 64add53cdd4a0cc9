"""Hash-stable aggregate helpers.

Floating-point summation is not associative: Spark's partial/final hash
aggregation adds doubles in partition order, DuckDB in its own scan
order, so ``sum(double)`` can differ in the last bits — enough to flip a
``round(x, 4)`` at a boundary and fail the driver's value-hash compare.

Fix: accumulate in ``decimal(30,10)`` (exact, order-independent — both
engines sum decimals exactly), then cast the *result* to double and
round. Per-row double expressions (``price * (1 - disc)``) stay double:
IEEE ops are deterministic and identical across engines for the same
expression tree; only the *reduction* order varies.

At 100 TB this costs one widening per row in the map-side partial agg —
negligible next to the shuffle it rides on — and buys bit-identical
results across any partitioning, which is also what makes regression
hashes stable run-to-run on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str, nd: int = 4) -> Column:
    """Order-independent sum of a double column, rounded to ``nd``."""
    return F.round(F.sum(_c(col).cast(DEC)).cast("double"), nd).alias(alias)


def davg(col: Column | str, alias: str, nd: int = 4) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    c = _c(col)
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(c), nd
    ).alias(alias)


def sql_dsum(expr: str, alias: str, nd: int = 4) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return (f"round(cast(sum(cast(({expr}) as {DEC})) as double), {nd})"
            f" AS {alias}")


def sql_davg(expr: str, alias: str, nd: int = 4) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (f"round(cast(sum(cast(({expr}) as {DEC})) as double)"
            f" / count({expr}), {nd}) AS {alias}")
