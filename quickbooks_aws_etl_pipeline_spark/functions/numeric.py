"""Numeric / null-handling scalar layer (SURVEY.md §2.8 F5-F7).

Mirrors the reference's pandas semantics:

- ``pd.to_numeric(x, errors='coerce')`` (qb_transactionlist.py:93)
  -> ``try_cast`` / non-ANSI cast (coerce-to-NULL)
- ``fillna(0)`` before an int cast (qb_billpayments.py:111-112)
  -> ``coalesce(col, lit(0))``
- ``replace('', pd.NA)`` (qb_profit&loss.py:111) -> ``nullif``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def safe_cast_numeric(col: Column | str, dtype: str = "double") -> Column:
    """Cast with coerce-to-NULL on failure — the engine runs with
    ``spark.sql.ansi.enabled=false`` so a plain cast already matches
    ``pd.to_numeric(errors='coerce')``; ``try_cast`` keeps the
    semantics explicit and ANSI-proof."""
    return _c(col).try_cast(dtype)


def null_fill(col: Column | str, value) -> Column:
    """``fillna(value)`` on one column -> ``coalesce``."""
    return F.coalesce(_c(col), F.lit(value))


def nullif_empty(col: Column | str) -> Column:
    """``replace('', NA)`` -> ``NULLIF(col, '')``."""
    return F.nullif(_c(col), F.lit(""))


def exact_sum(col: Column, scale: int = 4, precision: int = 18) -> Column:
    """Deterministic SUM over doubles for oracle hash-equality.

    Summing doubles is order-dependent; Spark's partial aggregation
    order differs from any single-node engine, so raw ``SUM(double)``
    differs from the DuckDB oracle in the last ulps. Casting each
    summand to DECIMAL makes addition exact and associative — the
    result is bit-identical regardless of partitioning (and therefore
    stable from local[32] up to a 1000-executor cluster). Cast back to
    double at the end. The oracle SQL applies the identical
    ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.
    """
    return F.sum(_c(col).cast(f"decimal({precision},{scale})")).cast("double")


def round_ratio6(num: Column, den: Column, digits: int = 6) -> Column:
    """ROUND(num/den, digits) half-AWAY-FROM-ZERO for exact-integer-
    valued ``num`` (any sign) over POSITIVE ``den``, with the rounding
    decision made entirely in integer arithmetic — the cross-engine
    tie-safe recipe.

    Why: ROUND(double, 6) is tie-unsafe across engines (Spark rounds
    the double's SHORTEST decimal representation via
    BigDecimal.valueOf; DuckDB and Python round the exact binary
    value), and an exact rational num/den lands exactly on ...5 at
    the (digits+1)-th decimal whenever den divides 2*10^(digits+1)
    appropriately — found live by the perplexity hypothesis
    differential (see NOTES round 6). Here
    q = sign(num) * ((2*|num|*10^d + den) DIV (2*den)), the same
    sign/abs decomposition as round6_decimal_mean_expr, so negative
    numerators round half-away too (a bare floor-DIV on the signed
    value would be floor rounding, and a bare ``//`` in DuckDB would
    TRUNCATE — both off by 1e-6 for negatives; r6 advisory). DIV over
    the non-negative operands is emulated as (a - a mod b) / b (exact
    in doubles below 2^53 — callers keep 2*|num|*10^d under ~9e15),
    emitted as q / 10^d: an exact integer over a power of ten,
    IEEE-identical everywhere. Oracle SQL must mirror the SAME
    sign/abs integers: ``CAST(SIGN(num) AS BIGINT) *
    ((2*ABS(num)*1000000 + den) // (2*den))`` — a raw signed ``//``
    does NOT match for negative num.
    """
    p = 10 ** digits
    num_i = num.cast("bigint")
    a = F.abs(num_i) * (2 * p) + den.cast("bigint")
    b = den.cast("bigint") * 2
    q = ((a - F.pmod(a, b)) / b).cast("bigint")
    return (F.signum(num_i).cast("bigint") * q).cast(
        "double") / F.lit(float(p))


def round6_decimal_mean_expr(sum_col: str, n_col: str,
                             sum_scale: int, alias: str) -> Column:
    """The integer half-away 6-decimal MEAN of an exact decimal sum
    column over a count column, by NAME (SQL DIV needs named
    operands): q_e6 = sign(s) * ((2*|s_eS|*1e6 + n*10^S) DIV
    (2*n*10^S)) with s_eS the scale-``sum_scale`` integer value of
    ``sum_col``; emitted as q_e6/1e6 (exact integer over a power of
    ten — IEEE-identical on every engine). See round_ratio6 for why
    ROUND(double, 6) cannot be used here. Oracle SQL mirrors the
    same integers with // and HUGEINT."""
    p = 10 ** sum_scale
    return F.expr(
        f"CAST(CAST(sign({sum_col}) AS BIGINT)"
        f" * ((2 * CAST(abs({sum_col}) * {p} AS DECIMAL(38,0))"
        f"       * 1000000"
        f"     + CAST({n_col} AS DECIMAL(38,0)) * {p})"
        f"    DIV (2 * CAST({n_col} AS DECIMAL(38,0)) * {p}))"
        f" AS DOUBLE) / 1000000.0"
    ).alias(alias)


def round_ratio6_dec(num_col: str, den_col: str, alias: str,
                     digits: int = 6) -> Column:
    """DECIMAL(38,0) sibling of :func:`round_ratio6` for BIGINT
    numerators past the double-DIV ceiling (round_ratio6 needs
    2*|num|*10^d < ~9e15, i.e. |num| <= ~4.5e9 at 6 digits — the r7
    advisory). Same sign/abs half-away integers, but the quotient is
    computed by Spark's integral DIV over DECIMAL(38,0) operands, so
    it stays exact for ANY bigint ``num``/``den`` (2*|num|*10^6 + den
    < 10^38 always holds for int64 inputs). Operands by NAME (SQL DIV
    needs named columns), like round6_decimal_mean_expr.

    Oracle SQL mirrors with HUGEINT: ``CAST(SIGN(num) AS BIGINT) *
    ((2*CAST(ABS(num) AS HUGEINT)*1000000 + den) // (2*den))`` —
    DuckDB's SUM already yields HUGEINT, and // on non-negative
    hugeints floor-divides, matching DIV on the same integers."""
    p = 10 ** digits
    return F.expr(
        f"CAST(CAST(sign({num_col}) AS BIGINT)"
        f" * ((2 * CAST(abs({num_col}) AS DECIMAL(38,0)) * {p}"
        f"     + CAST({den_col} AS DECIMAL(38,0)))"
        f"    DIV (2 * CAST({den_col} AS DECIMAL(38,0))))"
        f" AS DOUBLE) / {float(p)}"
    ).alias(alias)
