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

# --- §2.1 scans ------------------------------------------------------------

ORACLE["scan_parquet"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity > 25
"""

ORACLE["scan_paged_union"] = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
"""

ORACLE["filter_date_range"] = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <= TIMESTAMP '1997-12-31'
"""

# --- §2.2 projections ------------------------------------------------------

ORACLE["project_rename_cast"] = """
SELECT
    CAST(o_orderkey AS BIGINT) AS order_id,
    o_orderstatus AS order_status,
    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
    strftime(o_orderdate, '%Y-%m-%d') AS order_date,
    o_orderpriority AS order_priority
FROM orders
"""

ORACLE["derive_literal_cols"] = """
SELECT c_custkey, c_mktsegment,
       'qbo' AS source_system, '2024-01' AS batch_month,
       lower(c_mktsegment) AS segment_lower
FROM customer
"""

# --- §2.8 scalar functions -------------------------------------------------

ORACLE["safe_cast_numeric"] = """
SELECT doc_id,
       TRY_CAST(substr(text, 1, 2) AS INTEGER) AS maybe_num,
       TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) AS n_chars_d
FROM documents
"""

ORACLE["null_fill"] = """
SELECT l_orderkey, l_linenumber,
       COALESCE(NULLIF(l_linestatus, 'O'), 'OPEN') AS status_filled,
       NULLIF(l_returnflag, '') AS flag_not_empty
FROM lineitem
"""

ORACLE["nullif_empty"] = """
SELECT l_orderkey, l_linenumber,
       NULLIF(l_returnflag, 'N') AS flag_or_null
FROM lineitem
"""

ORACLE["date_parse"] = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str,
       CAST(CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS VARCHAR) AS parsed_date
FROM orders
"""

ORACLE["timestamp_parse"] = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_ts
FROM events
"""

ORACLE["date_format_mon_yyyy"] = """
SELECT strftime(o_orderdate, '%b,%Y') AS month_label,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""

# --- §2.6 / §2.7 -----------------------------------------------------------

ORACLE["sort_limit_topk"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

ORACLE["setop_union_all"] = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 200000
"""

# --- §2.4 aggregations -----------------------------------------------------

ORACLE["agg_group_sum"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY 1, 2
"""

ORACLE["agg_null_count"] = """
SELECT COUNT(*) AS n_rows,
       COUNT(CASE WHEN NULLIF(l_linestatus, 'O') IS NULL THEN 1 END) AS n_null,
       COUNT(NULLIF(l_linestatus, 'O')) AS n_not_null,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_supp
FROM lineitem
"""

ORACLE["agg_monthly_bucket"] = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""

ORACLE["agg_group_collect"] = """
SELECT o_custkey,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS collected,
       COUNT(*) AS n_rows
FROM orders WHERE o_custkey % 10 = 0
GROUP BY o_custkey
"""

ORACLE["agg_rollup_summary"] = """
SELECT
    CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(Total)' ELSE o_orderstatus END AS o_orderstatus,
    CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(Total)' ELSE o_orderpriority END AS o_orderpriority,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount,
    COUNT(*) AS n_rows
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""

# --- §2.3 joins ------------------------------------------------------------

ORACLE["join_fact_dim_inner"] = """
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_sales,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""

ORACLE["join_left_outer"] = """
SELECT c.c_custkey, c.c_mktsegment,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(COALESCE(o.o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 1, 2
"""

ORACLE["join_left_semi_anti"] = """
SELECT c_custkey, c_mktsegment, 'has_big_order' AS tag
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
UNION ALL
SELECT c_custkey, c_mktsegment, 'no_big_order' AS tag
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
"""

ORACLE["join_5way_regional_revenue"] = """
SELECT r.r_name AS region_name,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <= TIMESTAMP '1997-12-31'
GROUP BY 1
"""

# --- §2.5 windows ----------------------------------------------------------

ORACLE["window_row_number"] = """
SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rn
    FROM customer
) WHERE rn <= 3
"""

ORACLE["window_running_sum"] = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent
FROM orders WHERE o_custkey % 7 = 0
"""

ORACLE["window_lag_lead"] = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice, 1) OVER w AS prev_o_totalprice,
       LEAD(o_totalprice, 1) OVER w AS next_o_totalprice
FROM orders WHERE o_custkey % 7 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""

ORACLE["window_partition_sum"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) OVER (
            PARTITION BY l_orderkey) AS DOUBLE) AS order_total
FROM lineitem WHERE l_orderkey % 10 = 0
"""
