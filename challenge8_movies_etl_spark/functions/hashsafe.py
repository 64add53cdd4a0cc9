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


def davg(col: Column | str, alias: str, nd: int = 4,
         gdp: int | None = None) -> Column:
    """Order-independent average: exact decimal sum / count, in double.

    ``gdp`` (granularity decimal places) engages the EXACT path: when
    the summands live on a 10^-gdp lattice (money in cents → gdp=2,
    integer quantities → gdp=0), the true mean is the rational
    S/(10^gdp·C) and CAN sit exactly on a round(·, nd) half boundary
    (needs only 200·S_cents = odd·C at gdp=2/nd=4) — where Spark's
    BigDecimal HALF_UP over the double's binary expansion and DuckDB's
    double nearbyint disagree. The r9 sf1.0 sweep caught this class
    twice (q_lm_score, q_ngram_lm); the fix is the same exact integer
    half-away-from-zero division, applied here to the shared helper so
    every coarse-lattice mean in the registry is boundary-proof
    (VERDICT r9 item 3). With ``gdp=None`` the summands are
    full-precision doubles quantized at 10dp by the decimal cast; a
    boundary hit then needs S ≡ odd·500000·C at the 10th digit —
    adjudicated per-site in SCALE.md's quotient table.

    Overflow headroom on the exact path: the tie formula's largest
    term is 2·|S|·10^(gdp+nd); at sf1.0 the biggest grouped money sum
    is ~3e12 cents → ~6e16, three decades inside int64.
    """
    if gdp is None:
        c = _c(col)
        return F.round(
            F.sum(c.cast(DEC)).cast("double") / F.count(c), nd
        ).alias(alias)
    if not isinstance(col, str):
        raise ValueError("davg(gdp=...) exact path takes a column NAME")
    g = 10 ** gdp
    # reduced tie formula (divide numerator and denominator by
    # 10^min(gdp,nd)): d >= 0 → (2·S·10^d + C) DIV (2·C);
    # d < 0 → (2·S + C·10^-d) DIV (2·C·10^-d). The sum accumulates in
    # decimal(38,0) (Spark) / hugeint (DuckDB) so the scaled-integer
    # arithmetic never overflows at any realistic corpus size.
    d = nd - gdp
    s = (f"sum(cast(cast({col} as decimal(28,{gdp})) * {g}"
         f" as decimal(30,0)))")
    cnt = f"count({col})"
    num_pos = (f"(2 * {s} * {10 ** d} + {cnt})" if d >= 0
               else f"(2 * {s} + {cnt} * {10 ** -d})")
    num_neg = (f"(2 * -{s} * {10 ** d} + {cnt})" if d >= 0
               else f"(2 * -{s} + {cnt} * {10 ** -d})")
    den = f"(2 * {cnt})" if d >= 0 else f"(2 * {cnt} * {10 ** -d})"
    return F.expr(
        f"cast(CASE WHEN {s} >= 0 THEN {num_pos} DIV {den}"
        f" ELSE -({num_neg} DIV {den}) END as double) / {10 ** nd}"
    ).alias(alias)


def sql_dsum(expr: str, alias: str, nd: int = 4) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return (f"round(cast(sum(cast(({expr}) as {DEC})) as double), {nd})"
            f" AS {alias}")


def sql_davg(expr: str, alias: str, nd: int = 4,
             gdp: int | None = None) -> str:
    """DuckDB-side twin of :func:`davg` (incl. the exact ``gdp`` path;
    DuckDB ``//`` on positive bigints == Spark ``DIV``)."""
    if gdp is None:
        return (f"round(cast(sum(cast(({expr}) as {DEC})) as double)"
                f" / count({expr}), {nd}) AS {alias}")
    g = 10 ** gdp
    d = nd - gdp
    s = (f"sum(cast(cast(({expr}) as decimal(28,{gdp})) * {g}"
         f" as bigint))")  # DuckDB sum(bigint) accumulates in hugeint
    cnt = f"count({expr})"
    num_pos = (f"(2 * {s} * {10 ** d} + {cnt})" if d >= 0
               else f"(2 * {s} + {cnt} * {10 ** -d})")
    num_neg = (f"(2 * -{s} * {10 ** d} + {cnt})" if d >= 0
               else f"(2 * -{s} + {cnt} * {10 ** -d})")
    den = f"(2 * {cnt})" if d >= 0 else f"(2 * {cnt} * {10 ** -d})"
    return (f"cast(CASE WHEN {s} >= 0 THEN {num_pos} // {den}"
            f" ELSE -({num_neg} // {den}) END as double) / {10 ** nd}"
            f" AS {alias}")
