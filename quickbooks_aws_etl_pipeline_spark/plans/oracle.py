"""DuckDB oracle SQL, one entry per Qkey in ``plans.queries``.

Rules for hash-equality with the Spark side (SURVEY.md §5.1):
- identical column aliases (driver sorts columns by name);
- SUM over doubles goes through DECIMAL(18,4) on BOTH sides so the
  result is order-independent and bit-identical (see
  ``functions.numeric.exact_sum``);
- integer aggregates cast to BIGINT explicitly (DuckDB SUM(int) is
  HUGEINT, Spark is LONG);
- deterministic tie-breaks on every ORDER BY ... LIMIT.
"""

ORACLE: dict[str, str] = {}

ORACLE["flagship_revenue_by_month_segment"] = """
SELECT
    strftime(o.o_orderdate, '%Y-%m') AS order_month,
    c.c_mktsegment AS mktsegment,
    CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '2001-01-01'
GROUP BY 1, 2
"""
