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

class _LoudOracle(dict):
    """Collisions must be loud, and loud even under ``python -O``
    (the Qkey-registry lesson: a silent overwrite lets import order
    decide which SQL grades a key). A second plain assignment to an
    existing key raises; the two intentional read-modify-write sites
    go through :meth:`amend`, and aliases (``ORACLE[a] = ORACLE[b]``)
    create NEW keys so they pass unchanged."""

    def __setitem__(self, key: str, value: str) -> None:
        if key in self:
            raise ValueError(
                f"duplicate oracle registration: {key!r} "
                "(intentional rewrites go through ORACLE.amend)")
        super().__setitem__(key, value)

    def amend(self, key: str, old: str, new: str) -> None:
        """Explicit in-place refinement of an existing entry."""
        if key not in self:
            raise KeyError(f"amend of unregistered oracle key: {key!r}")
        if old not in self[key]:
            raise ValueError(
                f"amend pattern not present in ORACLE[{key!r}]: {old!r}")
        super().__setitem__(key, self[key].replace(old, new))


ORACLE: dict[str, str] = _LoudOracle()

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

ORACLE["setop_intersect_except"] = """
SELECT o_custkey, 'both' AS tag FROM (
    SELECT o_custkey FROM orders WHERE o_custkey % 2 = 0
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
)
UNION ALL
SELECT o_custkey, 'only_even' AS tag FROM (
    SELECT o_custkey FROM orders WHERE o_custkey % 2 = 0
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
)
"""

ORACLE["scalar_string_funcs"] = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_type, 1, 5) AS type_prefix,
       concat_ws('-', p_brand, p_type) AS brand_type,
       CAST(length(p_name) AS INTEGER) AS name_len
FROM part WHERE p_name LIKE '%a%'
"""

ORACLE["scalar_datetime_funcs"] = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month_num,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
       strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month_date
FROM orders WHERE o_orderkey % 5 = 0
"""

ORACLE["window_range_frame"] = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) OVER (
            PARTITION BY c_mktsegment ORDER BY c_acctbal
            RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_bal_sum
FROM customer
"""

# --- §2.4 aggregations -----------------------------------------------------

# bounds-check contract: the Spark side emits the exact distinct count
# plus a boolean asserting HLL++ landed within its 5% rsd; sketch
# values themselves are engine-specific and never compared.
ORACLE["agg_approx_distinct"] = """
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
       TRUE AS approx_within_5pct
FROM orders
"""

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

# --- §2.9 un-nesting / §2.8 json / §2.11 udf -------------------------------

ORACLE["explode_lines"] = """
SELECT vec_id, label,
       unnest(range(len(embedding))) AS pos,
       unnest(embedding) AS component
FROM embeddings WHERE vec_id < 50
"""

ORACLE["flatten_struct"] = """
SELECT event_id, event_type AS meta_event_type, value AS meta_value
FROM events
"""

ORACLE["json_extract_props"] = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""

ORACLE["json_from_string"] = """
SELECT event_id, props,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events WHERE event_id < 1000
"""

ORACLE["json_to_string"] = """
SELECT doc_id,
       to_json(struct_pack(doc_id := doc_id, lang := lang)) AS payload_json
FROM documents WHERE doc_id < 200
"""

ORACLE["udf_pandas_scalar"] = """
SELECT doc_id,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS dense_len
FROM documents
"""

# --- §2.12 X4: text analytics ---------------------------------------------

ORACLE["text_tokenize_count"] = """
SELECT token, COUNT(*) AS n_occurrences FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
) GROUP BY token
"""

ORACLE["text_hash_embedding"] = """
WITH h AS (
    SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
)
SELECT doc_id, CAST(h % 16 AS INTEGER) AS dim,
       CAST(SUM(CASE WHEN (h & 1073741824) = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS weight,
       CAST(COUNT(*) AS BIGINT) AS n_tokens_dim
FROM h GROUP BY doc_id, h % 16
"""

ORACLE["dq_higher_moments"] = """
WITH g AS (
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(28,8))) AS s1,
           SUM(CAST(value * value AS DECIMAL(28,8))) AS s2,
           SUM(CAST(value * value * value AS DECIMAL(28,8))) AS s3,
           SUM(CAST(value * value * value * value AS DECIMAL(28,8)))
               AS s4
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
), d AS (
    SELECT event_type, n,
           CAST(n AS DOUBLE) AS nd,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
           CAST(s4 AS DOUBLE) AS s4d
    FROM g
), m AS (
    SELECT event_type, n,
           s2d / nd - mean * mean AS m2,
           s3d / nd - 3.0 * mean * (s2d / nd)
               + 2.0 * mean * mean * mean AS m3,
           s4d / nd - 4.0 * mean * (s3d / nd)
               + 6.0 * mean * mean * (s2d / nd)
               - 3.0 * mean * mean * mean * mean AS m4
    FROM d
)
SELECT event_type, n,
       ROUND(m3 / pow(m2, 1.5), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
FROM m
"""

ORACLE["events_markov_transitions"] = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
), pairs AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_pair
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
), tot AS (
    SELECT prev_type, SUM(n_pair) AS n_from FROM pairs GROUP BY prev_type
)
SELECT p.prev_type, p.next_type, p.n_pair,
       ROUND(CAST(p.n_pair AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6)
           AS prob
FROM pairs p JOIN tot t USING (prev_type)
"""

ORACLE["dq_seasonal_anomaly"] = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
           dayofweek(CAST(ts AS DATE)) + 1 AS dow
    FROM events GROUP BY 1
), st AS (
    SELECT dow, CAST(COUNT(*) AS HUGEINT) AS m,
           CAST(SUM(n_events) AS HUGEINT) AS s,
           CAST(SUM(n_events * n_events) AS HUGEINT) AS q
    FROM daily GROUP BY dow
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.dow AS INTEGER) AS dow, d.n_events,
       ((st.m * d.n_events - st.s > 0) AND
        ((st.m * d.n_events - st.s) * (st.m * d.n_events - st.s)
         > 9 * (st.m * st.q - st.s * st.s))) AS is_spike
FROM daily d JOIN st USING (dow)
"""

ORACLE["sketch_cms_merge"] = """
WITH cells AS (
    SELECT CAST(r.r AS INTEGER) AS cms_row,
           ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 256
               AS bucket,
           event_id % 2 AS half
    FROM events, (VALUES (0),(1),(2),(3)) r(r)
), merged AS (
    SELECT cms_row, bucket, COUNT(*) AS n_merged
    FROM cells GROUP BY 1, 2
), whole AS (
    SELECT cms_row, bucket, COUNT(*) AS n_whole
    FROM cells GROUP BY 1, 2
)
SELECT cms_row, COUNT(*) AS n_cells,
       CAST(SUM(CASE WHEN COALESCE(m.n_merged, 0)
                          = COALESCE(w.n_whole, 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_equal
FROM merged m FULL JOIN whole w USING (cms_row, bucket)
GROUP BY cms_row
"""

ORACLE["dq_cusum_drift"] = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
               AS vsum_e4
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
), tot AS (
    SELECT event_type,
           CAST(SUM(vsum_e4) AS BIGINT) // COUNT(*) AS k_e4
    FROM daily GROUP BY event_type
), d AS (
    SELECT daily.event_type, daily.day,
           daily.vsum_e4 - tot.k_e4 AS x_e4
    FROM daily JOIN tot USING (event_type)
), cummed AS (
    SELECT event_type, day, SUM(x_e4) OVER w AS cum
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), c AS (
    SELECT event_type, day, cum, MIN(cum) OVER w AS run_min
    FROM cummed
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(cum - least(0, run_min) AS BIGINT) AS cusum_e4,
       (cum - least(0, run_min)) > 5000000 AS drift
FROM c
"""

ORACLE["sketch_ams_f2"] = """
WITH signs AS (
    SELECT """ + ",\n           ".join(
        f"(CASE WHEN (('0x' || substr(md5('ams{i}:' || "
        f"CAST(user_id AS VARCHAR)), 1, 15))::BIGINT & 1) = 0 "
        f"THEN 1 ELSE -1 END) AS s{i}" for i in range(16)) + """
    FROM events
), z AS (
    SELECT """ + ",\n           ".join(
        f"CAST(SUM(s{i}) AS BIGINT) AS z{i}" for i in range(16)) + """
    FROM signs
), est AS (
    SELECT ((""" + " + ".join(
        f"z{i} * z{i}" for i in range(16)) + """) // 16)
        AS f2_est
    FROM z
), exact AS (
    SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM (
        SELECT COUNT(*) AS c FROM events GROUP BY user_id)
)
SELECT est.f2_est, exact.f2_exact,
       ROUND(CAST(abs(est.f2_est - exact.f2_exact) AS DOUBLE)
             / exact.f2_exact, 6) AS rel_err
FROM est, exact
"""

ORACLE["dq_rate_anomaly"] = """
WITH pm AS (
    SELECT date_trunc('minute', ts) AS minute, COUNT(*) AS n_events
    FROM events GROUP BY 1
), st AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS m,
           CAST(SUM(n_events) AS HUGEINT) AS s,
           CAST(SUM(n_events * n_events) AS HUGEINT) AS q
    FROM pm
)
SELECT pm.minute, CAST(pm.n_events AS BIGINT) AS n_events,
       ((st.m * pm.n_events - st.s > 0) AND
        ((st.m * pm.n_events - st.s) * (st.m * pm.n_events - st.s)
         > 9 * (st.m * st.q - st.s * st.s))) AS is_spike
FROM pm, st
"""

ORACLE["select_token_budget"] = """
WITH s AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score_ppm
    FROM documents
), tot AS (
    SELECT (CAST(SUM(n_tokens) AS BIGINT) * 2) // 10 AS budget FROM s
), c AS (
    SELECT doc_id, score_ppm, n_tokens,
           CAST(SUM(n_tokens) OVER (ORDER BY score_ppm DESC, doc_id)
                AS BIGINT) AS cum_tokens
    FROM s
)
SELECT c.doc_id, c.score_ppm, c.n_tokens, c.cum_tokens
FROM c, tot WHERE c.cum_tokens <= tot.budget
"""

ORACLE["text_zipf_curve"] = """
WITH vc AS (
    SELECT token, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) GROUP BY token
), r AS (
    SELECT token, freq,
           row_number() OVER (ORDER BY freq DESC, token) AS rnk
    FROM vc
), top AS (
    SELECT CAST(rnk AS INTEGER) AS rnk, token,
           CAST(freq AS BIGINT) AS freq
    FROM r WHERE rnk <= 100
), lg AS (
    SELECT CAST(ROUND(log10(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(28,9))
               AS lx,
           CAST(ROUND(log10(CAST(freq AS DOUBLE)), 9) AS DECIMAL(28,9))
               AS ly
    FROM top
), sl AS (
    SELECT ROUND(
        CAST(CAST(COUNT(*) AS DECIMAL(28,9)) * SUM(lx * ly)
             - SUM(lx) * SUM(ly) AS DOUBLE)
        / CAST(CAST(COUNT(*) AS DECIMAL(28,9)) * SUM(lx * lx)
               - SUM(lx) * SUM(lx) AS DOUBLE), 6) AS zipf_slope
    FROM lg
)
SELECT top.rnk, top.token, top.freq, sl.zipf_slope FROM top, sl
"""

ORACLE["text_ngram_topk"] = """
SELECT ngram, COUNT(*) AS n_occurrences FROM (
    SELECT unnest(
        CASE WHEN len(string_split(text,' ')) >= 3
             THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                  i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
             ELSE [] END) AS ngram
    FROM documents
) GROUP BY ngram
ORDER BY n_occurrences DESC, ngram ASC
LIMIT 20
"""

ORACLE["sim_topk_cosine_pq"] = """
SELECT 10 AS k_requested, CAST(10 AS BIGINT) AS n_results,
       TRUE AS recall_ok
"""

# ivf_learned is oracle-checkable by construction: the Spark query
# itself verifies recall@10 against the exact brute-force top-k and
# emits the constants the oracle states (k-means itself is not
# SQL-expressible; the stronger recall property is unit-pinned).
ORACLE["sim_topk_cosine_ivf_learned"] = """
SELECT 10 AS k_requested, CAST(10 AS BIGINT) AS n_results,
       TRUE AS recall_ok
"""

ORACLE["sim_topk_cosine_ivf_trainsampled"] = """
SELECT 10 AS k_requested, CAST(10 AS BIGINT) AS n_results,
       TRUE AS recall_ok
"""

ORACLE["sim_index_persist_serve"] = """
SELECT 10 AS k_requested, CAST(10 AS BIGINT) AS n_results,
       TRUE AS recall_ok
"""

ORACLE["text_quality_score"] = """
WITH feat AS (
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           length(replace(text, ' ', '')) AS n_alpha,
           len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to'))) AS n_stop
    FROM documents
)
-- integer round-6 ratios (the engine's tie-safe recipe): the score
-- 0.5*(stop/n) + 0.5*min(n/100,1) is the single rational
-- (100*n_stop + n*min(n,100)) / (200*n)
SELECT doc_id, lang,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST((2 * n_alpha * 1000000 + n_tokens)
            // (2 * n_tokens) AS DOUBLE) / 1000000.0 AS avg_token_len,
       CAST((2 * n_stop * 1000000 + n_tokens)
            // (2 * n_tokens) AS DOUBLE) / 1000000.0 AS stopword_ratio,
       CAST((2 * (100 * n_stop + n_tokens * least(n_tokens, 100)) * 1000000
             + 200 * n_tokens)
            // (2 * 200 * n_tokens) AS DOUBLE) / 1000000.0
           AS quality_score
FROM feat
"""

ORACLE["text_lang_id"] = """
WITH scored AS (
    SELECT lang,
           len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to'))) AS s_en,
           len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','que','y'))) AS s_es,
           len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist'))) AS s_de,
           len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','et','est'))) AS s_fr,
           len(list_filter(string_split(text,' '), t -> t IN ('的','是','了'))) AS s_zh
    FROM documents
), pred AS (
    SELECT lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang
    FROM scored
)
SELECT lang, pred_lang, COUNT(*) AS n_docs FROM pred GROUP BY 1, 2
"""

ORACLE["text_token_count_bpe"] = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens
FROM documents
"""

ORACLE["doc_fingerprint"] = """
SELECT doc_id,
       list_min(list_transform(
           CASE WHEN len(string_split(text,' ')) >= 3
                THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                     i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
                ELSE [] END,
           s -> md5(s))) AS fingerprint
FROM documents
"""

# --- §2.12 X1-X2: dedup ----------------------------------------------------

# (total - distinct)/total via the integer round-6 recipe (tie-safe)
ORACLE["text_repetition_filter"] = """
SELECT doc_id,
       CASE WHEN len(sh) > 0
            THEN CAST((2 * (len(sh) - len(list_distinct(sh))) * 1000000
                       + len(sh)) // (2 * len(sh)) AS DOUBLE) / 1000000.0
            ELSE 0.0 END AS rep_ratio,
       (CASE WHEN len(sh) > 0
            THEN CAST((2 * (len(sh) - len(list_distinct(sh))) * 1000000
                       + len(sh)) // (2 * len(sh)) AS DOUBLE) / 1000000.0
             ELSE 0.0 END) <= 0.2 AS keep
FROM (
    SELECT doc_id,
           CASE WHEN len(string_split(text,' ')) >= 3
           THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
           ELSE [] END AS sh
    FROM documents
)
"""

ORACLE["decontaminate_ngram_overlap"] = """
WITH ev AS (
    SELECT DISTINCT unnest(list_distinct(
        CASE WHEN len(string_split(text,' ')) >= 5
        THEN list_transform(range(1, len(string_split(text,' ')) - 3),
             i -> md5(array_to_string(string_split(text,' ')[i:i+4], ' ')))
        ELSE [] END)) AS sh
    FROM documents WHERE doc_id % 20 = 0
), corpus_sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(string_split(text,' ')) >= 5
        THEN list_transform(range(1, len(string_split(text,' ')) - 3),
             i -> md5(array_to_string(string_split(text,' ')[i:i+4], ' ')))
        ELSE [] END)) AS sh
    FROM documents
), hits AS (
    SELECT doc_id, COUNT(*) AS n_overlap
    FROM corpus_sh JOIN ev USING (sh)
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(h.n_overlap, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""

ORACLE["dedup_exact"] = """
SELECT text, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""

ORACLE["dedup_fuzzy"] = """
SELECT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
            ' +', ' ', 'g')) AS norm_key,
       MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""

ORACLE["dedup_simhash"] = """
WITH hashed AS (
    SELECT doc_id,
           list_transform(string_split(text, ' '),
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       CAST(list_sum(list_transform(
            list_transform(range(0, 60), b -> (1::BIGINT << b)),
            p -> CASE WHEN len(list_filter(hs, h -> (h & p) != 0)) * 2 > len(hs)
                      THEN p ELSE 0::BIGINT END)) AS BIGINT) AS simhash,
       CAST(n_tokens AS INTEGER) AS n_tokens
FROM hashed
"""

from ..operators.dedup import minhash_coeffs as _mc  # noqa: E402

_A16, _B16 = _mc(16)

ORACLE["dedup_minhash_lsh"] = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM toks
), shf AS (
    SELECT doc_id,
           list_distinct(list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824)) AS hs
    FROM sh WHERE len(shingles) > 0
), sig AS (
    SELECT doc_id, hs,
           list_transform(range(0, 16),
               j -> list_min(list_transform(hs,
                    h -> ([{','.join(map(str, _A16))}][j+1] * h
                          + [{','.join(map(str, _B16))}][j+1]) % 1073741789))) AS mh
    FROM shf
), banded AS (""" + """
    SELECT doc_id,
           unnest(range(0, 4)) AS band,
           unnest(list_transform(range(0, 4),
               b -> md5(array_to_string(mh[b*4+1 : b*4+4], ',')))) AS band_hash
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)), 6) AS jaccard
FROM cand
JOIN shf x ON x.doc_id = cand.id_a
JOIN shf y ON y.doc_id = cand.id_b
WHERE ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
            / len(list_distinct(x.hs || y.hs)), 6) >= 0.5
"""

# The streamed incremental-dedup run provably equals the full-corpus
# minhash tier for any batching (see streaming/stateful.py:
# run_stream_incremental_dedup) — it is held to the SAME oracle.
ORACLE["stream_dedup_incremental_live"] = ORACLE["dedup_minhash_lsh"]

ORACLE["dedup_ngram_jaccard"] = """
WITH sh AS (
    SELECT doc_id, lang AS block,
           list_distinct(CASE WHEN len(string_split(text,' ')) >= 2
               THEN list_transform(range(1, len(string_split(text,' '))),
                    i -> array_to_string(string_split(text,' ')[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM documents
), shf AS (
    SELECT doc_id, block, shingles FROM sh WHERE len(shingles) > 0
)
SELECT a.block AS block, a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / len(list_distinct(a.shingles || b.shingles)), 6) AS jaccard
FROM shf a JOIN shf b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(a.shingles || b.shingles)), 6) >= 0.05
"""

# mirrors the prefix-filter algorithm (complete for J >= t, so the
# result equals the plain quadratic join); md5-hex global order is
# identical on both engines (lowercase hex, lexicographic). The
# prefix/length/positional filters only prune — the final exact
# Jaccard >= t decides membership on both sides.
# Every ceil() carries the same 1e-9 epsilon guard as the Spark
# operator (operators/dedup.py ngram_jaccard_prefix_pairs): the FP
# product 0.8*35 or 0.8/1.8*63 lands a hair above the exact integer
# and a raw ceil would overshoot by one, dropping pairs whose
# Jaccard is exactly at the threshold.
ORACLE["dedup_ngram_verified"] = """
WITH sh AS (
    SELECT doc_id AS id, list_sort(list_distinct(
        CASE WHEN len(string_split(text,' ')) >= 3
        THEN list_transform(range(1, len(string_split(text,' ')) - 1),
             i -> ('0x' || substr(md5(array_to_string(
                  string_split(text,' ')[i:i+2], ' ')), 1, 15))::BIGINT)
        ELSE [] END)) AS h
    FROM documents
), shf AS (
    SELECT id, h FROM sh WHERE len(h) > 0
), pre0 AS (
    SELECT id, len(h) AS n,
           unnest(list_transform(
               range(1, len(h) - CAST(ceil(0.8 * len(h) - 1e-9) AS INT) + 2),
               i -> {'pos': i, 'p': h[i]})) AS u
    FROM shf
), pre AS (
    SELECT id, n, u.pos AS pos, u.p AS p FROM pre0
), cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM pre a JOIN pre b
      ON a.p = b.p AND a.id < b.id
     AND b.n >= CAST(ceil(0.8 * a.n - 1e-9) AS INT)
     AND a.n >= CAST(ceil(0.8 * b.n - 1e-9) AS INT)
     AND 1 + least(a.n - a.pos, b.n - b.pos)
         >= CAST(ceil(0.8 / 1.8 * (a.n + b.n) - 1e-9) AS INT)
)
SELECT c.id_a, c.id_b,
       ROUND(CAST(len(list_intersect(a.h, b.h)) AS DOUBLE)
             / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))), 6)
           AS jaccard
FROM cand c
JOIN shf a ON a.id = c.id_a
JOIN shf b ON b.id = c.id_b
WHERE ROUND(CAST(len(list_intersect(a.h, b.h)) AS DOUBLE)
            / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))), 6)
      >= 0.8
"""

# duplicate clusters over the verified pair graph: transitive closure
# by recursive CTE (tiny graph at oracle scale), component id = the
# smallest reachable doc_id — same fixpoint the Spark min-label
# propagation converges to.
ORACLE["dedup_cluster_components"] = f"""
WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({ORACLE["dedup_ngram_verified"]})
), sym AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
    SELECT u, v FROM sym
    UNION
    SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
)
SELECT u AS doc_id, least(u, MIN(v)) AS component_id
FROM reach GROUP BY u
"""


_STREAM_JOIN_STATIC_SQL = """
SELECT c.c_mktsegment AS segment, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""

ORACLE["stream_join_static"] = _STREAM_JOIN_STATIC_SQL
# the live twin runs complete-mode over availableNow, so its final
# memory-sink table equals the batch aggregate — same oracle.
ORACLE["stream_join_static_live"] = _STREAM_JOIN_STATIC_SQL

# mirrors hyperplane_lsh_pairs exactly: identical md5-derived integer
# planes (imported from the operator so they can never drift), exact
# integer dot products for the signature bits, band id baked into the
# hash string, exact-cosine verify on candidates.
def _hyperplane_lsh_sql(n_bits: int = 64, bands: int = 8,
                        threshold: float = 0.8,
                        feed_sql: str = "SELECT vec_id AS id, embedding "
                                        "FROM embeddings") -> str:
    from ..operators.similarity import hyperplanes
    planes = hyperplanes(n_bits, 64)
    rows_per_band = n_bits // bands

    def bit(i: int) -> str:
        # list_dot_product (vectorized) over integer-valued doubles is
        # exact below 2^53, so the sign matches Spark's bigint fold
        lit = "[" + ",".join(str(c) for c in planes[i]) + "]"
        return (f"CASE WHEN list_dot_product(vq, {lit}::DOUBLE[]) > 0 "
                "THEN '1' ELSE '0' END")

    bhs = ",".join(
        "'" + str(b) + ":' || " + " || ".join(
            bit(b * rows_per_band + r) for r in range(rows_per_band))
        for b in range(bands))
    return f"""
WITH feed AS ({feed_sql}),
base AS (
    SELECT id,
           list_transform(embedding::DOUBLE[],
                          x -> floor(x*1000 + 0.5)) AS vq
    FROM feed
), pre AS (
    SELECT id, unnest([{bhs}]) AS bh FROM base
), cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM pre a JOIN pre b ON a.bh = b.bh AND a.id < b.id
)
SELECT c.id_a, c.id_b,
       ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                    eb.embedding::DOUBLE[]), 6) AS cos_sim
FROM cand c
JOIN feed ea ON ea.id = c.id_a
JOIN feed eb ON eb.id = c.id_b
WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                   eb.embedding::DOUBLE[]), 6) >= {threshold}
"""


def _planted_feed_sql() -> str:
    # the same in-query planted-copy derivation as the Spark side
    # (vec_id < 4 re-keyed by PLANT_OFFSET — imported so the two
    # sides can never drift); see dedup_embedding_verified's
    # docstring for why the raw corpus would make the key vacuous
    from .llm_ops import PLANT_OFFSET
    return ("SELECT vec_id AS id, embedding FROM embeddings "
            f"UNION ALL SELECT vec_id + {PLANT_OFFSET} AS id, "
            "embedding FROM embeddings WHERE vec_id < 4")


ORACLE["dedup_embedding_verified"] = _hyperplane_lsh_sql(
    feed_sql=_planted_feed_sql())

ORACLE["dedup_embedding_cosine"] = """
SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.8
"""

# --- §2.12 X3: similarity search ------------------------------------------

ORACLE["sim_topk_cosine"] = """
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS sim
FROM embeddings e, q
WHERE e.vec_id != 0
ORDER BY sim DESC, e.vec_id ASC
LIMIT 10
"""

ORACLE["sim_topk_cosine_ivf"] = """
WITH q AS (SELECT embedding, label FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS sim
FROM embeddings e, q
WHERE e.vec_id != 0 AND e.label = q.label
ORDER BY sim DESC, e.vec_id ASC
LIMIT 10
"""

# --- §2.12 X5: multimodal -------------------------------------------------

# byte-based (hex of the UTF-8 encoding), NOT character-based: the
# Spark side indexes payload *bytes*, and ascii()/substr-on-text would
# diverge on any multibyte document (zh corpora are advertised)
ORACLE["multimodal_binary_meta"] = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       sha256(text) AS content_sha256,
       lower(substr(hex(encode(text)), 1, 16)) AS head_hex
FROM documents
"""

ORACLE["multimodal_decode_stub"] = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
            ELSE 32 + ('0x' || substr(hex(encode(text)), 1, 2))::INT % 32
            END AS INTEGER) AS fake_width,
       CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
            WHEN octet_length(encode(text)) < 2 THEN 32
            ELSE 32 + ('0x' || substr(hex(encode(text)), 3, 2))::INT % 32
            END AS INTEGER) AS fake_height,
       sha256(text) AS content_sha256
FROM documents WHERE doc_id < 100
"""

# --- QBO ingest parity (VALUES oracles over deterministic fixtures) --------

ORACLE["qbo_entity_bills_pipeline"] = """
SELECT due_date, CAST(balance AS DOUBLE) AS balance,
       CAST(id AS INTEGER) AS id, CAST(sync_token AS INTEGER) AS sync_token,
       doc_number, txn_date, private_note, line,
       vendor_ref_value, vendor_ref_name,
       ap_account_ref_value, ap_account_ref_name, linked_txn
FROM (VALUES
  ('2024-02-15', 250.5, 101, 0, 'B-1001', '2024-01-15', 'net-30',
   '[{"Amount":250.5,"Id":"1"}]', '77', 'Acme Supply', '33',
   'Accounts Payable', '[{"TxnId":"900","TxnType":"BillPaymentCheck"}]'),
  ('2024-03-01', 0.0, 102, 1, 'B-1002', '2024-02-01', NULL,
   '[{"Amount":75.0,"Id":"1"},{"Amount":25.0,"Id":"2"}]', '78', 'Globex',
   '33', 'Accounts Payable', '[]'),
  ('2024-03-20', 99.99, 103, 0, 'B-1003', '2024-02-20', 'rush',
   '[{"Amount":99.99,"Id":"1"}]', '77', 'Acme Supply', '34', 'AP Other', NULL)
) t(due_date, balance, id, sync_token, doc_number, txn_date, private_note,
    line, vendor_ref_value, vendor_ref_name, ap_account_ref_value,
    ap_account_ref_name, linked_txn)
"""

ORACLE["qbo_entity_journal_explode"] = """
SELECT adjustment, CAST(id AS INTEGER) AS id, doc_number, txn_date,
       private_note, CAST(line_id AS INTEGER) AS line_id, line_description,
       CAST(line_amount AS DOUBLE) AS line_amount, line_posting_type,
       line_entity_type, CAST(line_entity_value AS DOUBLE) AS line_entity_value,
       line_entity_name, CAST(line_account_value AS DOUBLE) AS line_account_value,
       line_account_name
FROM (VALUES
  (false, 201, 'JE-1', '2024-01-10', 'opening', 1, 'debit cash', 500.0,
   'Debit', 'Vendor', 77.0, 'Acme Supply', 10.0, 'Cash'),
  (false, 201, 'JE-1', '2024-01-10', 'opening', 2, 'credit equity', 500.0,
   'Credit', NULL, NULL, NULL, 30.0, 'Equity'),
  (true, 202, 'JE-2', '2024-01-11', NULL, NULL, NULL, NULL,
   NULL, NULL, NULL, NULL, NULL, NULL)
) t(adjustment, id, doc_number, txn_date, private_note, line_id,
    line_description, line_amount, line_posting_type, line_entity_type,
    line_entity_value, line_entity_name, line_account_value, line_account_name)
"""

ORACLE["qbo_entity_deposit"] = """
SELECT CAST(total_amt AS DOUBLE) AS total_amt, CAST(id AS INTEGER) AS id,
       txn_date, CAST(txn_ts AS TIMESTAMP) AS txn_ts, private_note, line,
       CAST(deposit_to_account_ref_value AS INTEGER)
           AS deposit_to_account_ref_value,
       deposit_to_account_ref_name, currency_ref_value, currency_ref_name,
       doc_number
FROM (VALUES
  (1250.0, 501, '2024-04-01', '2024-04-01 00:00:00', 'april batch',
   '[{"Amount":1000.0,"Id":"1"},{"Amount":250.0,"Id":"2"}]',
   55, 'Checking', 'USD', 'United States Dollar', 'D-1'),
  (75.25, 502, '2024-04-03', '2024-04-03 00:00:00', NULL,
   '[{"Amount":75.25,"Id":"1"}]',
   55, 'Checking', 'USD', 'United States Dollar', NULL),
  (500.0, 503, '2024-04-05', '2024-04-05 00:00:00', 'with cashback',
   '[{"Amount":550.0,"Id":"1"}]',
   56, 'Savings', 'USD', 'United States Dollar', 'D-3')
) t(total_amt, id, txn_date, txn_ts, private_note, line,
    deposit_to_account_ref_value, deposit_to_account_ref_name,
    currency_ref_value, currency_ref_name, doc_number)
"""

ORACLE["flatten_report_tree"] = """
SELECT account_path, account, CAST(amount AS DOUBLE) AS amount, row_type
FROM (VALUES
  ('Income', 'Income', NULL, 'header'),
  ('Income -> Sales', 'Sales', 1200.50, 'detail'),
  ('Income -> Services', 'Services', NULL, 'header'),
  ('Income -> Services -> Consulting', 'Consulting', 800.0, 'detail'),
  ('Income -> Services -> Training', 'Training', NULL, 'detail'),
  ('Income -> Services -> Total Services (Summary)', 'Total Services', 800.0, 'summary'),
  ('Income -> Total Income (Summary)', 'Total Income', 2000.50, 'summary'),
  ('Expenses', 'Expenses', NULL, 'header'),
  ('Expenses -> Rent', 'Rent', 500.0, 'detail'),
  ('Expenses -> Total Expenses (Summary)', 'Total Expenses', 500.0, 'summary')
) t(account_path, account, amount, row_type)
"""

ORACLE["parse_tabular_report"] = """
SELECT date, transaction_type, doc_num, is_no_post, name, description,
       account_name, split, CAST(amount AS DOUBLE) AS amount,
       start_period, end_period
FROM (VALUES
  ('2024-01-05', 'Bill', 'B-1001', 'Yes', 'Acme Supply', 'net-30',
   'Accounts Payable', 'Office', 250.50, '2024-01-01', '2024-01-31'),
  ('2024-01-09', 'Deposit', 'D-7', 'Yes', 'Globex', '',
   'Checking', 'Sales', 1000.00, '2024-01-01', '2024-01-31'),
  ('2024-01-12', 'Journal Entry', 'JE-1', 'No', '', 'accrual',
   'Equity', '-Split-', NULL, '2024-01-01', '2024-01-31')
) t(date, transaction_type, doc_num, is_no_post, name, description,
    account_name, split, amount, start_period, end_period)
"""

ORACLE["parse_grouped_report"] = """
SELECT CAST(vendor_id AS INTEGER) AS vendor_id, vendor_name, date,
       transaction_type, doc_num, posting, description, account,
       CAST(amount AS DOUBLE) AS amount, start_period, end_period
FROM (VALUES
  (77, 'Acme Supply', '2024-01-05', 'Bill', 'B-1001', 'Yes', 'net-30',
   'Accounts Payable', 250.50, '2024-01-01', '2024-01-31'),
  (77, 'Acme Supply', '2024-01-20', 'Bill', 'B-1003', 'Yes', 'rush',
   'AP Other', 99.99, '2024-01-01', '2024-01-31'),
  (78, 'Globex', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   '2024-01-01', '2024-01-31')
) t(vendor_id, vendor_name, date, transaction_type, doc_num, posting,
    description, account, amount, start_period, end_period)
"""

# --- sinks (round trips must be lossless vs the original table) ------------

ORACLE["sink_parquet_roundtrip"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1997-03'
"""

ORACLE["sink_csv_roundtrip"] = """
SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
FROM nation GROUP BY 1
"""

ORACLE["sink_table_overwrite"] = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
"""

ORACLE["sink_table_append"] = """
SELECT r_regionkey, r_name, CAST(2 AS BIGINT) AS n_copies FROM region
"""

# --- streaming window aggregations (batch-equivalent oracles) --------------

ORACLE["stream_tumbling_agg"] = """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start_epoch,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

ORACLE["stream_sliding_agg"] = """
WITH shifted AS (
    SELECT ts, value, unnest([0, 300]) AS off FROM events
)
SELECT CAST(floor((epoch(ts) - off) / 600) * 600 + off AS BIGINT) AS bucket_start_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM shifted GROUP BY 1
"""

ORACLE["stream_session_window"] = """
WITH ordered AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 300
                THEN 1 ELSE 0 END AS new_s
    FROM ordered
), sess AS (
    SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
"""

# --- advanced capability queries (plans/advanced_queries.py) ---------------

ORACLE["join_asof"] = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       max(v.ts) AS asof_ts,
       arg_max(v.value, v.ts) AS asof_value
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts, value FROM events
           WHERE event_type = 'view') v
  ON v.user_id = p.user_id AND v.ts <= p.ts
GROUP BY 1, 2, 3, 4
"""

ORACLE["join_range_bands"] = """
WITH bands(band_name, lo, hi) AS (VALUES
    ('band_0', 0.0, 100000.0),
    ('band_1', 100000.0, 200000.0),
    ('band_2', 200000.0, 300000.0),
    ('band_3', 300000.0, 400000.0),
    ('band_4', 400000.0, 500000.0),
    ('band_5', 500000.0, 600000.0))
SELECT band_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS band_total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY 1
"""

ORACLE["join_salted_skew"] = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""

ORACLE["agg_two_phase_salted"] = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows,
       min(l_shipdate) AS min_ship,
       max(l_shipdate) AS max_ship
FROM lineitem GROUP BY 1
"""

ORACLE["join_bucketed_colocated"] = """
SELECT o.o_orderstatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""

ORACLE["split_train_test"] = """
WITH s AS (
    SELECT n_chars,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM (SELECT n_chars,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 AS b
          FROM documents))
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY 1
"""

ORACLE["sample_stratified_hash"] = """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(lang || '|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      % 4 = 0
"""

ORACLE["pivot_segment_revenue"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "AUTOMOBILE",
       CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "BUILDING",
       CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "FURNITURE",
       CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "HOUSEHOLD",
       CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "MACHINERY"
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""

ORACLE["agg_cube_grouping"] = """
SELECT coalesce(o_orderstatus, '(All)') AS order_status,
       coalesce(o_orderpriority, '(All)') AS order_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ORACLE["agg_approx_percentile"] = """
SELECT round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
       TRUE AS p50_within_rank_tol,
       TRUE AS p95_within_rank_tol
FROM lineitem
"""

ORACLE["agg_percentiles"] = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS q25_qty,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.75), 6) AS q75_qty,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
FROM lineitem GROUP BY 1
"""

ORACLE["window_ntile_cume"] = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(ntile(4) OVER w AS INTEGER) AS balance_quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""

ORACLE["merge_upsert_scd1"] = """
WITH base AS (
    SELECT o_orderkey, o_custkey, o_totalprice, 1 AS version FROM orders),
updates AS (
    SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice,
           2 AS version
    FROM orders WHERE o_orderkey % 7 = 0),
merged AS (
    SELECT * FROM updates
    UNION ALL
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM updates u
                      WHERE u.o_orderkey = b.o_orderkey))
SELECT version, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
FROM merged GROUP BY 1
"""

# --- live streaming runs with batch-equivalent oracles ---------------------

ORACLE["stream_dedup_watermark"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_sum,
       COUNT(DISTINCT user_id) AS n_users
FROM events
"""

ORACLE["stream_stateful_user_totals"] = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""

# the TWS successor-API twin shares the legacy stateful key's oracle:
# identical (count, decimal-quantized sum) contract, different state
# API — any drift between applyInPandasWithState and
# transformWithStateInPandas is oracle-visible
ORACLE["stream_stateful_totals_tws"] = ORACLE["stream_stateful_user_totals"]

ORACLE["stream_foreach_batch_sink"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_sum,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
"""

ORACLE["text_normalize_scrub"] = """
WITH c AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                'https?://[^ ]+', ' ', 'g'), '  +', ' ', 'g')) AS clean_text
    FROM documents)
SELECT doc_id, clean_text,
       regexp_replace(clean_text, '[0-9]+', '<NUM>', 'g') AS masked_text,
       CAST(length(clean_text) AS INTEGER) AS n_chars_clean
FROM c
"""

ORACLE["seq_pack_chunked"] = """
WITH t AS (
    SELECT source, doc_id,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents),
c AS (
    SELECT source, doc_id, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM t)
SELECT source,
       CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM c GROUP BY 1, 2
"""

ORACLE["source_qbo_datasource"] = """
SELECT CAST(id AS INTEGER) AS id, doc_number, due_date,
       CAST(balance AS DOUBLE) AS balance, vendor_ref_name,
       CAST(page AS INTEGER) AS page
FROM (VALUES
  (101, 'B-1001', '2024-02-15', 250.5, 'Acme Supply', 0),
  (102, 'B-1002', '2024-03-01', 0.0,  'Globex',      0),
  (103, 'B-1003', '2024-03-20', 99.99, 'Acme Supply', 1)
) t(id, doc_number, due_date, balance, vendor_ref_name, page)
"""

ORACLE["sql_shipping_priority"] = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-30'
  AND l_shipdate  > TIMESTAMP '1997-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# live streaming twins share the batch-mode oracles
ORACLE["stream_tumbling_agg_live"] = """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start_epoch,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

ORACLE["stream_sliding_agg_live"] = """
WITH shifted AS (
    SELECT ts, value, unnest([0, 300]) AS off FROM events
)
SELECT CAST(floor((epoch(ts) - off) / 600) * 600 + off AS BIGINT) AS bucket_start_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM shifted GROUP BY 1
"""

ORACLE["stream_session_window_live"] = """
WITH ordered AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 300
                THEN 1 ELSE 0 END AS new_s
    FROM ordered
), sess AS (
    SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
"""

ORACLE["agg_max_by"] = """
SELECT c_mktsegment,
       arg_max(c_custkey, c_acctbal) AS richest_cust,
       arg_min(c_custkey, c_acctbal) AS poorest_cust,
       max(c_acctbal) AS max_bal,
       min(c_acctbal) AS min_bal
FROM customer GROUP BY 1
"""

ORACLE["scalar_regexp_funcs"] = """
SELECT doc_id,
       regexp_extract(text, '[0-9]+') AS first_num,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums,
       split_part(text, ' ', 1) AS first_word
FROM documents
"""

ORACLE["array_functions"] = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS n_dims,
       array_to_string(list_transform(list_sort(embedding, 'DESC')[1:3],
           x -> CAST(CAST(round(CAST(x AS DOUBLE) * 10000) AS INTEGER) AS VARCHAR)),
           ',') AS top3_scaled
FROM embeddings
"""

ORACLE["udf_grouped_apply_in_pandas"] = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       row_number() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank
FROM customer
"""

ORACLE["udtf_sentence_split"] = """
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, '. '), 1) - 1 AS INTEGER) AS sent_idx,
       unnest(string_split(text, '. ')) AS sentence
FROM documents WHERE doc_id < 200
"""


ORACLE["qbo_entity_billpayment_sparse"] = """
SELECT pay_type, CAST(total_amt AS DOUBLE) AS total_amt,
       CAST(id AS INTEGER) AS id, txn_date, doc_number,
       CAST(vendor_ref_value AS INTEGER) AS vendor_ref_value,
       vendor_ref_name,
       CAST(check_val AS INTEGER) AS check_payment_bank_account_ref_value,
       check_name AS check_payment_bank_account_ref_name,
       CAST(cc_val AS INTEGER) AS credit_card_payment_cc_account_ref_value,
       cc_name AS credit_card_payment_cc_account_ref_name
FROM (VALUES
  ('Check', 250.5, 301, '2024-02-01', 'BP-1', 77, 'Acme Supply',
   55, 'Checking', 0, NULL),
  ('Check', 10.0, 303, '2024-02-07', NULL, 77, 'Acme Supply',
   0, NULL, 0, NULL),
  ('CreditCard', 99.99, 302, '2024-02-05', 'BP-2', 78, 'Globex',
   0, NULL, 66, 'Amex')
) t(pay_type, total_amt, id, txn_date, doc_number, vendor_ref_value,
    vendor_ref_name, check_val, check_name, cc_val, cc_name)
"""

ORACLE["merge_upsert_scd2"] = """
WITH base AS (
    SELECT o_orderkey, o_totalprice,
           '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
    FROM orders),
changed AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 11 = 0),
hist AS (
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM changed c WHERE c.o_orderkey = b.o_orderkey)
    UNION ALL
    SELECT b.o_orderkey, b.o_totalprice, b.valid_from, '2024-06-01'
    FROM base b WHERE EXISTS (SELECT 1 FROM changed c WHERE c.o_orderkey = b.o_orderkey)
    UNION ALL
    SELECT o.o_orderkey, o.o_totalprice * 1.05, '2024-06-01', NULL
    FROM orders o WHERE o.o_orderkey % 11 = 0)
SELECT valid_from, valid_to IS NULL AS is_current,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
FROM hist GROUP BY 1, 2
"""

ORACLE["unpivot_melt"] = """
WITH wide AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, c_mktsegment,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2),
years AS (SELECT DISTINCT order_year FROM wide),
segs(mktsegment) AS (VALUES ('AUTOMOBILE'), ('BUILDING'), ('FURNITURE'),
                            ('HOUSEHOLD'), ('MACHINERY'))
SELECT y.order_year, s.mktsegment, w.rev AS revenue
FROM years y CROSS JOIN segs s
LEFT JOIN wide w ON w.order_year = y.order_year AND w.c_mktsegment = s.mktsegment
"""

ORACLE["map_functions"] = """
WITH kv AS (
    SELECT unnest(json_keys(props)) AS prop_key, props FROM events)
SELECT prop_key,
       COUNT(*) AS n_props,
       CAST(SUM(CAST(json_extract(props, '$.' || prop_key) AS INTEGER)) AS BIGINT) AS sum_val,
       CAST(MIN(CAST(json_extract(props, '$.' || prop_key) AS INTEGER)) AS INTEGER) AS min_val,
       CAST(MAX(CAST(json_extract(props, '$.' || prop_key) AS INTEGER)) AS INTEGER) AS max_val
FROM kv GROUP BY 1
"""

ORACLE["sort_nulls_ordering"] = """
SELECT l_orderkey, l_linenumber, NULLIF(l_returnflag, 'N') AS flag
FROM lineitem WHERE l_orderkey % 50 = 0
ORDER BY flag ASC NULLS LAST, l_orderkey ASC, l_linenumber ASC
LIMIT 50
"""

ORACLE["source_json_lines_permissive"] = """
SELECT CAST(5 AS BIGINT) AS n_rows,
       CAST(2 AS BIGINT) AS n_amount_ok,
       CAST(2 AS BIGINT) AS n_corrupt,
       CAST(30.5 AS DOUBLE) AS amount_total
"""

ORACLE["sql_correlated_subquery"] = """
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice AS max_price
FROM orders o
WHERE o.o_totalprice = (SELECT MAX(i.o_totalprice)
                        FROM orders i
                        WHERE i.o_custkey = o.o_custkey)
"""

ORACLE["sample_quota_per_source"] = """
WITH ranked AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id) AS rn
    FROM documents)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM ranked WHERE rn <= 25 GROUP BY 1
"""

ORACLE["dq_column_profile"] = """
SELECT 'o_orderstatus' AS column_name, COUNT(*) AS n_rows,
       COUNT(o_orderstatus) AS n_not_null,
       COUNT(DISTINCT o_orderstatus) AS n_distinct FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority) FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
       COUNT(DISTINCT o_custkey) FROM orders
"""

ORACLE["text_edit_distance"] = """
WITH d AS (
    SELECT doc_id, lang, substr(text, 1, 40) AS head
    FROM documents WHERE doc_id < 120)
SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.head, b.head) AS INTEGER) AS edit_dist
FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 20
"""

ORACLE["agg_monthly_spine"] = """
WITH spine AS (
    SELECT strftime(m, '%Y-%m') AS order_month
    FROM generate_series(DATE '1995-01-01', DATE '1998-12-01',
                         INTERVAL 1 MONTH) t(m)),
monthly AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS m_total,
           COUNT(*) AS m_orders
    FROM orders GROUP BY 1)
SELECT s.order_month,
       coalesce(m.m_total, 0.0) AS total_amount,
       CAST(coalesce(m.m_orders, 0) AS BIGINT) AS n_orders
FROM spine s LEFT JOIN monthly m ON s.order_month = m.order_month
"""

ORACLE["qbo_entity_purchases_explode"] = """
SELECT CAST(id AS INTEGER) AS id, doc_number, txn_date, payment_type,
       CAST(total_amt AS DOUBLE) AS total_amt,
       CAST(line_id AS INTEGER) AS line_id,
       CAST(line_amount AS DOUBLE) AS line_amount,
       CAST(acct_val AS INTEGER) AS line_account_ref_value,
       acct_name AS line_account_ref_name
FROM (VALUES
  (401, 'P-1', '2024-03-01', 'Cash', 120.0, 1, 100.0, 10, 'Supplies'),
  (401, 'P-1', '2024-03-01', 'Cash', 120.0, 2, 20.0, 0, 'Misc'),
  (402, 'P-2', '2024-03-04', 'CreditCard', 55.5, 1, 55.5, 0, NULL)
) t(id, doc_number, txn_date, payment_type, total_amt, line_id,
    line_amount, acct_val, acct_name)
"""

# --- §2.12 round 3: sub-document dedup, corpus stats, data ordering --------

ORACLE["dedup_segment_corpus"] = """
WITH ex AS (
    SELECT doc_id, unnest(sl) AS s FROM (
        SELECT doc_id,
               list_transform(range(0, CAST(ceil(len(toks)/10.0) AS BIGINT)),
                    i -> struct_pack(idx := i,
                         seg := array_to_string(toks[(i*10+1):(i*10+10)], ' '))) AS sl
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
), flagged AS (
    SELECT doc_id, s.idx AS seg_idx, s.seg AS seg,
           ROW_NUMBER() OVER (PARTITION BY s.seg
                              ORDER BY doc_id, s.idx) = 1 AS keep
    FROM ex
)
SELECT doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_segments,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
       COALESCE(string_agg(CASE WHEN keep THEN seg END, ' '
                           ORDER BY seg_idx), '') AS cleaned_text
FROM flagged GROUP BY doc_id
"""

ORACLE["shuffle_deterministic"] = """
SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
       AS BIGINT) AS position,
       doc_id,
       md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
"""

ORACLE["sketch_count_min"] = """
SELECT CAST(r.r AS INTEGER) AS cms_row,
       ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                           || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % 1024 AS bucket,
       COUNT(*) AS n
FROM events, (VALUES (0),(1),(2),(3)) r(r)
GROUP BY 1, 2
"""

ORACLE["sketch_heavy_hitters"] = """
WITH exact AS (
    SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id
    ORDER BY exact_n DESC, user_id ASC LIMIT 10
), sk AS (
    SELECT r.r AS cms_row,
           ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                               || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 1024 AS bucket,
           COUNT(*) AS n
    FROM events, (VALUES (0),(1),(2),(3)) r(r)
    GROUP BY 1, 2
), est AS (
    SELECT user_id, MIN(n) AS cms_estimate FROM (
        SELECT e.user_id, sk.n
        FROM exact e, (VALUES (0),(1),(2),(3)) r(r), sk
        WHERE sk.cms_row = r.r
          AND sk.bucket = ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                               || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
                               % 1024
    ) GROUP BY user_id
)
SELECT e.user_id, e.exact_n, est.cms_estimate,
       est.cms_estimate >= e.exact_n AS lower_bound_ok
FROM exact e JOIN est USING (user_id)
"""

ORACLE["text_unigram_logprob"] = """
WITH toke AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), vocab AS (
    SELECT token, COUNT(*) AS cnt FROM toke GROUP BY token
), tot AS (SELECT COUNT(*) AS total FROM toke),
sums AS (
    SELECT doc_id, COUNT(*) AS n_tokens,
           SUM(CAST(ROUND(log10(CAST(cnt AS DOUBLE) / total), 7)
                    AS DECIMAL(28,7))) AS s
    FROM toke JOIN vocab USING (token), tot
    GROUP BY doc_id
)
-- integer half-away mean (the engine's tie-safe recipe): ROUND of a
-- double quotient diverges across engines on exact ...5 ties
SELECT doc_id, n_tokens,
       CAST(CAST(sign(s) AS BIGINT)
            * ((2 * CAST(abs(s) * 10000000 AS HUGEINT) * 1000000
                + CAST(n_tokens AS HUGEINT) * 10000000)
               // (2 * CAST(n_tokens AS HUGEINT) * 10000000))
            AS DOUBLE) / 1000000.0 AS avg_logprob
FROM sums
"""

# CCNet perplexity tiers: the unigram-logprob CTE is the
# text_unigram_logprob mirror verbatim; the global rank is a plain
# window here (DuckDB is single-node), the tier the same integer
# formula the engine uses.
ORACLE["mixture_perplexity_buckets"] = """
WITH toke AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), vocab AS (
    SELECT token, COUNT(*) AS cnt FROM toke GROUP BY token
), tot AS (SELECT COUNT(*) AS total FROM toke),
sums AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           SUM(CAST(ROUND(log10(CAST(cnt AS DOUBLE) / total), 7)
                    AS DECIMAL(28,7))) AS s
    FROM toke JOIN vocab USING (token), tot
    GROUP BY doc_id
), scored AS (
    -- integer half-away mean (the engine's tie-safe recipe)
    SELECT doc_id, n_tokens,
           CAST(CAST(sign(s) AS BIGINT)
                * ((2 * CAST(abs(s) * 10000000 AS HUGEINT) * 1000000
                    + CAST(n_tokens AS HUGEINT) * 10000000)
                   // (2 * CAST(n_tokens AS HUGEINT) * 10000000))
                AS DOUBLE) / 1000000.0 AS avg_logprob
    FROM sums
), ranked AS (
    SELECT doc_id, n_tokens, avg_logprob,
           CAST(row_number() OVER (ORDER BY avg_logprob DESC, doc_id ASC)
                AS BIGINT) AS ppl_rank,
           COUNT(*) OVER () AS n
    FROM scored
)
SELECT doc_id, n_tokens, avg_logprob, ppl_rank,
       CASE ((ppl_rank - 1) * 3) // n
           WHEN 0 THEN 'head' WHEN 2 THEN 'tail' ELSE 'middle'
       END AS ppl_bucket
FROM ranked
"""

# CCNet gate -> DSIR selection, composed: the perplexity-tier CTEs
# produce the kept set (head+middle), the DSIR program runs over the
# gated corpus. Mirrors both keys' SQL verbatim modulo the kept CTE.
ORACLE["pipeline_ccnet_dsir"] = """
WITH toke AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), vocab AS (
    SELECT token, COUNT(*) AS cnt FROM toke GROUP BY token
), tot AS (SELECT COUNT(*) AS total FROM toke),
sums AS (
    SELECT doc_id, COUNT(*) AS n_tokens,
           SUM(CAST(ROUND(log10(CAST(cnt AS DOUBLE) / total), 7)
                    AS DECIMAL(28,7))) AS s
    FROM toke JOIN vocab USING (token), tot
    GROUP BY doc_id
), scored AS (
    -- integer half-away mean (the engine's tie-safe recipe)
    SELECT doc_id,
           CAST(CAST(sign(s) AS BIGINT)
                * ((2 * CAST(abs(s) * 10000000 AS HUGEINT) * 1000000
                    + CAST(n_tokens AS HUGEINT) * 10000000)
                   // (2 * CAST(n_tokens AS HUGEINT) * 10000000))
                AS DOUBLE) / 1000000.0 AS avg_logprob
    FROM sums
), ranked AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY avg_logprob DESC, doc_id ASC)
               AS ppl_rank,
           COUNT(*) OVER () AS n
    FROM scored
), kept AS (
    SELECT doc_id FROM ranked WHERE ((ppl_rank - 1) * 3) // n <> 2
), gated AS (
    SELECT d.* FROM documents d JOIN kept USING (doc_id)
), bg AS (
    SELECT doc_id, source = 'src0' AS is_target,
           unnest(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])
               ELSE [] END) AS bg
    FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM gated)
), feat AS (
    SELECT doc_id, is_target,
           ('0x' || substr(md5(bg), 1, 15))::BIGINT % 4096 AS bucket
    FROM bg
), bt AS (
    SELECT bucket,
           SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
           SUM(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS cr
    FROM feat GROUP BY bucket
), btot AS (
    SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM bt
), w AS (
    SELECT bucket,
           CAST(ROUND(log10((ct + 1.0) / (tt + 4096.0))
                      - log10((cr + 1.0) / (tr + 4096.0)), 7)
                AS DECIMAL(20,7)) AS w
    FROM bt, btot
), sc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, SUM(w) AS s
    FROM feat JOIN w USING (bucket)
    WHERE NOT is_target GROUP BY doc_id
)
SELECT doc_id, n_bigrams, CAST(s AS DOUBLE) AS dsir_logratio
FROM sc ORDER BY dsir_logratio DESC, doc_id ASC LIMIT 50
"""

# A-Res weighted reservoir (Efraimidis-Spirakis): the draw, the key,
# and the cut are all md5-deterministic, so the oracle reproduces the
# sample row-for-row. Order/cut on the ROUNDED key (absorbs ln() ulp
# differences between libm and Java), doc_id tie-break.
from ..operators.sampling import poisson1_cdf_thresholds as _pcdf  # noqa: E402

_PB_W = " + ".join(
    f"(CASE WHEN u > {c!r} THEN 1 ELSE 0 END)" for c in _pcdf())

ORACLE["sample_poisson_bootstrap"] = f"""
WITH reps AS (
    SELECT unnest(range(0, 32)) AS rep
), drawn AS (
    SELECT r.rep,
           CAST(o.o_totalprice AS DECIMAL(18,2)) AS v,
           (('0x' || substr(md5('boot' || CAST(r.rep AS VARCHAR) || ':'
                || CAST(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT + 1)
               / 1152921504606846976.0 AS u
    FROM orders o CROSS JOIN reps r
), weighted AS (
    SELECT rep, v, {_PB_W} AS w FROM drawn
)
, sums AS (
    SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff, SUM(v * w) AS s
    FROM weighted GROUP BY rep
)
-- integer half-away mean of the exact scale-2 sum (the engine's
-- tie-safe recipe; ROUND of a double quotient diverges across
-- engines on exact ...5 ties)
SELECT CAST(rep AS INTEGER) AS replicate, n_eff,
       CAST(CAST(sign(s) AS BIGINT)
            * ((2 * CAST(abs(s) * 100 AS HUGEINT) * 1000000
                + CAST(n_eff AS HUGEINT) * 100)
               // (2 * CAST(n_eff AS HUGEINT) * 100))
            AS DOUBLE) / 1000000.0 AS boot_mean
FROM sums
"""

ORACLE["sample_weighted_reservoir"] = """
SELECT doc_id, n_chars FROM (
    SELECT doc_id, n_chars,
           ROUND(ln((('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)),
                       1, 15))::BIGINT + 1) / 1152921504606846976.0)
                 / CAST(n_chars AS DOUBLE), 9) AS a_key
    FROM documents
    ORDER BY a_key DESC, doc_id
    LIMIT 50
)
"""

# merged-HLL rollup: oracle computes the exact distincts; the
# estimate bound booleans are checked in-query on the Spark side
# (oracle-by-construction, the agg_approx_distinct pattern)
ORACLE["sketch_hll_merge"] = """
WITH f AS (SELECT * FROM orders WHERE o_orderdate >= DATE '1997-01-01')
SELECT strftime(o_orderdate, '%Y-%m') AS scope,
       COUNT(DISTINCT o_custkey) AS n_exact,
       TRUE AS hll_ok
FROM f GROUP BY 1
UNION ALL
SELECT 'ALL', COUNT(DISTINCT o_custkey), TRUE FROM f
"""

ORACLE["embedding_int8_quantize"] = """
WITH s AS (
    SELECT label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd,
           greatest(list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS scale
    FROM embeddings
), e AS (
    SELECT label,
           list_max(list_transform(xd,
               x -> abs(x / scale - floor(x / scale + 0.5)))) AS er
    FROM s
)
SELECT label, COUNT(*) AS n_vecs, ROUND(MAX(er), 6) AS max_err_ratio
FROM e GROUP BY label
"""

# multinomial NB, Laplace-1, sparse decomposition mirrored term for
# term; decimal-summed log10 scores make the argmax engine-exact.
# The argmax is expressed as max-score join + MAX(cand) tie-break —
# identical to Spark's max(struct(score, cand)) lexicographic max.
ORACLE["text_class_nb"] = """
WITH toke AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
    FROM documents
), cls AS (
    SELECT lang, COUNT(DISTINCT doc_id) AS n_docs_c,
           COUNT(*) AS n_tok_c
    FROM toke GROUP BY lang
), vt AS (
    SELECT COUNT(DISTINCT tok) AS v, COUNT(DISTINCT doc_id) AS docs
    FROM toke
), cand AS (
    SELECT lang AS cand,
           CAST(ROUND(log10(CAST(n_docs_c AS DOUBLE) / docs), 7)
                AS DECIMAL(28,7)) AS log_prior,
           CAST(ROUND(log10(CAST(n_tok_c + v AS DOUBLE)), 7)
                AS DECIMAL(28,7)) AS log_denom
    FROM cls, vt
), tok_cls AS (
    SELECT tok, lang AS cand, COUNT(*) AS cnt FROM toke GROUP BY tok, lang
), sparse AS (
    SELECT t.doc_id, tc.cand,
           SUM(CAST(ROUND(log10(tc.cnt + 1.0), 7) AS DECIMAL(28,7)))
               AS s_sparse
    FROM toke t JOIN tok_cls tc ON t.tok = tc.tok
    GROUP BY t.doc_id, tc.cand
), doc_n AS (
    SELECT doc_id, lang, COUNT(*) AS n_tokens FROM toke GROUP BY doc_id, lang
), scored AS (
    SELECT d.doc_id, d.lang, c.cand,
           COALESCE(s.s_sparse, CAST(0 AS DECIMAL(28,7)))
             - d.n_tokens * c.log_denom + c.log_prior AS score
    FROM doc_n d CROSS JOIN cand c
    LEFT JOIN sparse s ON s.doc_id = d.doc_id AND s.cand = c.cand
), best AS (
    SELECT doc_id, lang, MAX(score) AS ms FROM scored GROUP BY doc_id, lang
), pred AS (
    SELECT s.doc_id, s.lang, MAX(s.cand) AS predicted
    FROM scored s JOIN best b
      ON s.doc_id = b.doc_id AND s.score = b.ms
    GROUP BY s.doc_id, s.lang
)
SELECT lang AS label, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct
FROM pred GROUP BY lang
"""

# incremental tier: same signature scheme as dedup_minhash_lsh, but
# candidates only across the batch/corpus split (doc_id % 5)
ORACLE["dedup_incremental_minhash"] = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM toks
), shf AS (
    SELECT doc_id,
           list_distinct(list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824)) AS hs
    FROM sh WHERE len(shingles) > 0
), sig AS (
    SELECT doc_id, hs,
           list_transform(range(0, 16),
               j -> list_min(list_transform(hs,
                    h -> ([{','.join(map(str, _A16))}][j+1] * h
                          + [{','.join(map(str, _B16))}][j+1]) % 1073741789))) AS mh
    FROM shf
), banded AS (""" + """
    SELECT doc_id,
           unnest(range(0, 4)) AS band,
           unnest(list_transform(range(0, 4),
               b -> md5(array_to_string(mh[b*4+1 : b*4+4], ',')))) AS band_hash
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_corpus
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash
     AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
)
SELECT id_new, id_corpus,
       ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)), 6) AS jaccard
FROM cand
JOIN shf x ON x.doc_id = cand.id_new
JOIN shf y ON y.doc_id = cand.id_corpus
WHERE ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
            / len(list_distinct(x.hs || y.hs)), 6) >= 0.5
"""

ORACLE["mixture_epoch_upsample"] = """
WITH base AS (
    SELECT source, doc_id,
           (CASE WHEN source IN ('src0', 'src1') THEN 2
                 WHEN source = 'src2' THEN 0 ELSE 1 END)
           + (CASE WHEN ('0x' || substr(md5('ep:' ||
                  CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
                  < (CASE WHEN source IN ('src0', 'src1', 'src2')
                          THEN 500000 ELSE 0 END)
              THEN 1 ELSE 0 END) AS copies
    FROM documents
), emitted AS (
    SELECT source, COUNT(*) AS n_emitted
    FROM base, unnest(range(1, copies + 1))
    GROUP BY source
)
SELECT b.source, COUNT(*) AS n_docs,
       CAST(COALESCE(MAX(e.n_emitted), 0) AS BIGINT) AS n_emitted,
       CAST(SUM(CASE WHEN b.copies = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped
FROM base b LEFT JOIN emitted e USING (source)
GROUP BY b.source
"""

ORACLE["pipeline_corpus_curation"] = """
WITH keepers AS (
    SELECT MIN(doc_id) AS doc_id
    FROM (SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nk
          FROM documents)
    GROUP BY nk
), kept AS (
    SELECT d.doc_id, d.lang,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS b
    FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    WHERE len(string_split(d.text, ' ')) >= 10
)
SELECT CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM kept GROUP BY 1, 2
"""

# fuzzy decontamination: the incremental chain with the eval slice
# (doc_id % 20) as the probe side, reduced to one best match per
# train doc (max jaccard, ties to the lowest eval id)
ORACLE["decontaminate_minhash_lsh"] = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM toks
), shf AS (
    SELECT doc_id,
           list_distinct(list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824)) AS hs
    FROM sh WHERE len(shingles) > 0
), sig AS (
    SELECT doc_id, hs,
           list_transform(range(0, 16),
               j -> list_min(list_transform(hs,
                    h -> ([{','.join(map(str, _A16))}][j+1] * h
                          + [{','.join(map(str, _B16))}][j+1]) % 1073741789))) AS mh
    FROM shf
), banded AS (""" + """
    SELECT doc_id,
           unnest(range(0, 4)) AS band,
           unnest(list_transform(range(0, 4),
               b -> md5(array_to_string(mh[b*4+1 : b*4+4], ',')))) AS band_hash
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_eval, b.doc_id AS id_train
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash
     AND a.doc_id % 20 = 0 AND b.doc_id % 20 <> 0
), pairs AS (
    SELECT id_train, id_eval,
           ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                 / len(list_distinct(x.hs || y.hs)), 6) AS jaccard
    FROM cand
    JOIN shf x ON x.doc_id = cand.id_eval
    JOIN shf y ON y.doc_id = cand.id_train
    WHERE ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                / len(list_distinct(x.hs || y.hs)), 6) >= 0.3
), best AS (
    SELECT id_train, id_eval, jaccard,
           row_number() OVER (PARTITION BY id_train
                              ORDER BY jaccard DESC, id_eval) AS rn
    FROM pairs
)
SELECT id_train AS train_doc_id, id_eval AS eval_doc_id, jaccard
FROM best WHERE rn = 1
"""

# compaction is environment-deterministic here: 64 source files
# (repartition(64) with >64 rows), and the sf0.001/sf0.01 corpus
# compacts into a single ~target_mb file; the aggregate proves the
# rewrite lost nothing
ORACLE["maintenance_compact_small_files"] = """
SELECT 64 AS n_files_before, 1 AS n_files_after,
       COUNT(*) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
"""

ORACLE["sim_topk_batch_queries"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv FROM embeddings
    WHERE vec_id < 8
), scored AS (
    SELECT q.query_id, e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.qv::DOUBLE[]), 6) AS sim
    FROM embeddings e, q
    WHERE e.vec_id != q.query_id
), ranked AS (
    SELECT query_id, vec_id, sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored
)
SELECT query_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 10
"""

# z derivation mirrored operation-for-operation: decimal sums ->
# double mean/var -> sqrt -> (value-mean)/sd, rounded to 6
ORACLE["dq_outlier_zscore"] = """
WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
g AS (
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(28,8))) AS s,
           SUM(CAST(value * value AS DECIMAL(28,8))) AS ssq
    FROM ev GROUP BY event_type
), stats AS (
    SELECT event_type,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           sqrt((CAST(ssq AS DOUBLE)
                 - CAST(n AS DOUBLE)
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                / (CAST(n AS DOUBLE) - 1.0)) AS sd
    FROM g
)
SELECT ev.event_type, ev.event_id, ev.value,
       ROUND((ev.value - stats.mean) / stats.sd, 6) AS zscore
FROM ev JOIN stats USING (event_type)
WHERE stats.sd > 0
  AND abs(ROUND((ev.value - stats.mean) / stats.sd, 6)) > 3.0
"""

ORACLE["dq_numeric_histogram"] = """
SELECT CAST(least(floor(l_extendedprice / 5000.0), 19) AS INTEGER)
           AS bucket,
       CAST(least(floor(l_extendedprice / 5000.0), 19) AS INTEGER)
           * 5000.0 AS lo_edge,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY 1, 2
"""

ORACLE["sample_weighted_per_source"] = """
SELECT source, doc_id, n_chars FROM (
    SELECT source, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY source
               ORDER BY ROUND(ln((('0x' || substr(md5('s0:'
                            || CAST(source AS VARCHAR) || '|'
                            || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                          / 1152921504606846976.0)
                        / CAST(n_chars AS DOUBLE), 9) DESC,
                        doc_id) AS rn
    FROM documents
) WHERE rn <= 10
"""

# the rewrite is lossless, so the oracle aggregates the SOURCE table
# over the same slice — equality proves the sorted copy dropped and
# duplicated nothing
ORACLE["maintenance_sorted_rewrite"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-06-01'
"""

# quadratic ground truth: the prefix+length filters in the engine are
# complete for C(A->B) >= t, so the two must match exactly
ORACLE["dedup_containment"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                    i -> ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')),
                          1, 15))::BIGINT % 1073741824)
               ELSE [] END) AS hs
    FROM toks
), shf AS (
    SELECT doc_id, hs FROM sh WHERE len(hs) > 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
             / len(a.hs), 6) AS containment
FROM shf a JOIN shf b ON a.doc_id != b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
            / len(a.hs), 6) >= 0.8
"""

ORACLE["text_pii_scrub"] = """
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+',
           '<EMAIL>', 'g'),
           '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
           '<IP>', 'g'),
           '\\+?[0-9][0-9()\\- ]{7,}[0-9]',
           '<PHONE>', 'g') AS scrubbed_text,
       CAST(len(regexp_extract_all(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+'))
           AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(text,
           '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}'))
           AS INTEGER) AS n_ipv4,
       CAST(len(regexp_extract_all(text,
           '\\+?[0-9][0-9()\\- ]{7,}[0-9]'))
           AS INTEGER) AS n_phone
FROM documents
"""

# exact retained counts; the estimate bound booleans are checked
# in-query on the Spark side (sketch-by-construction pattern)
ORACLE["sketch_hll_retention"] = """
WITH mk AS (
    SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m, o_custkey AS k
    FROM orders
), months AS (SELECT DISTINCT m FROM mk),
pairs AS (
    SELECT a.m AS month_from, b.m AS month_to
    FROM months a JOIN months b
      ON b.m = strftime(CAST(a.m || '-01' AS DATE) + INTERVAL 1 MONTH,
                        '%Y-%m')
), ret AS (
    SELECT x.m AS month_from, COUNT(*) AS n
    FROM mk x JOIN mk y
      ON y.m = strftime(CAST(x.m || '-01' AS DATE) + INTERVAL 1 MONTH,
                        '%Y-%m')
     AND x.k = y.k
    GROUP BY x.m
)
SELECT p.month_from, p.month_to,
       CAST(COALESCE(ret.n, 0) AS BIGINT) AS n_retained_exact,
       TRUE AS hll_ok
FROM pairs p LEFT JOIN ret ON ret.month_from = p.month_from
"""

# same recursive walk in DuckDB over the literal tree; the fixture's
# own (Summary) rows are the semantic cross-check the recursion must
# reproduce (Total Income 2000.50, Total Services 800.0)
ORACLE["sql_recursive_subtree_totals"] = """
WITH RECURSIVE tree(account_path, account, amount, row_type) AS (
    SELECT * FROM (VALUES
      ('Income', 'Income', NULL, 'header'),
      ('Income -> Sales', 'Sales', 1200.50, 'detail'),
      ('Income -> Services', 'Services', NULL, 'header'),
      ('Income -> Services -> Consulting', 'Consulting', 800.0, 'detail'),
      ('Income -> Services -> Training', 'Training', NULL, 'detail'),
      ('Income -> Services -> Total Services (Summary)', 'Total Services',
       800.0, 'summary'),
      ('Income -> Total Income (Summary)', 'Total Income', 2000.50,
       'summary'),
      ('Expenses', 'Expenses', NULL, 'header'),
      ('Expenses -> Rent', 'Rent', 500.0, 'detail'),
      ('Expenses -> Total Expenses (Summary)', 'Total Expenses', 500.0,
       'summary')
    ) v(account_path, account, amount, row_type)
), sub(root_path, node_path) AS (
    SELECT account_path, account_path FROM tree WHERE row_type <> 'summary'
    UNION ALL
    SELECT s.root_path, t.account_path
    FROM sub s JOIN tree t
      ON t.account_path LIKE s.node_path || ' -> %'
     AND t.account_path NOT LIKE s.node_path || ' -> % -> %'
     AND t.row_type <> 'summary'
)
SELECT s.root_path AS account_path,
       COUNT(*) AS n_nodes,
       CAST(SUM(CAST(COALESCE(t.amount, 0.0) AS DECIMAL(18,4)))
            AS DOUBLE) AS subtree_total
FROM sub s JOIN tree t ON t.account_path = s.node_path
GROUP BY s.root_path
"""

ORACLE["multimodal_frame_sample"] = """
WITH frames AS (
    SELECT doc_id,
           CAST(unnest(range(0,
               CAST(ceil(length(text) / 64.0) AS BIGINT), 4))
               AS INTEGER) AS frame_idx,
           text
    FROM documents
)
SELECT doc_id, frame_idx,
       frame_idx * 64 AS frame_off,
       sha256(substring(text, frame_idx * 64 + 1, 64)) AS frame_sha256
FROM frames
"""

ORACLE["multimodal_resize_stub"] = """
WITH dims AS (
    SELECT doc_id, text, length(text) AS L,
           (length(text) + 31) // 32 AS n_rows
    FROM documents
), px AS (
    SELECT doc_id, r.r, c.c,
           substring(text, CAST(r.r * 32 + c.c + 1 AS INTEGER), 1) AS ch
    FROM dims,
         LATERAL (SELECT unnest(range(0, n_rows, 2)) AS r) r,
         LATERAL (SELECT unnest(range(0, 32, 2)) AS c) c
    WHERE r.r * 32 + c.c < L
), small AS (
    SELECT doc_id, string_agg(ch, '' ORDER BY r, c) AS s
    FROM px GROUP BY doc_id
)
SELECT d.doc_id, CAST(d.L AS INTEGER) AS orig_chars,
       CAST(length(COALESCE(sm.s, '')) AS INTEGER) AS resized_chars,
       md5(COALESCE(sm.s, '')) AS resized_md5
FROM dims d LEFT JOIN small sm USING (doc_id)
"""

ORACLE["multimodal_image_tiles"] = """
WITH dims AS (
    SELECT doc_id, text, length(text) AS L,
           (length(text) + 31) // 32 AS n_rows
    FROM documents
), tiles AS (
    SELECT doc_id, text, L, n_rows,
           CAST(t.tr AS INTEGER) AS tile_row,
           CAST(c.tc AS INTEGER) AS tile_col
    FROM dims,
         LATERAL (SELECT unnest(range(0, (n_rows + 7) // 8)) AS tr) t,
         LATERAL (SELECT unnest(range(0, 4)) AS tc) c
), strips AS (
    SELECT doc_id, tile_row, tile_col, s.r,
           substring(text, CAST(s.r * 32 + tile_col * 8 + 1 AS INTEGER),
                     8) AS strip
    FROM tiles,
         LATERAL (SELECT unnest(range(tile_row * 8,
              least((tile_row + 1) * 8, n_rows))) AS r) s
), patches AS (
    SELECT doc_id, tile_row, tile_col,
           string_agg(strip, '' ORDER BY r) AS patch
    FROM strips GROUP BY 1, 2, 3
)
SELECT doc_id, tile_row, tile_col,
       CAST(tile_row * 8 * 32 + tile_col * 8 AS INTEGER) AS tile_off,
       CAST(length(patch) AS INTEGER) AS tile_chars,
       md5(patch) AS tile_md5
FROM patches WHERE length(patch) > 0
"""

ORACLE["multimodal_audio_windows"] = """
WITH offs AS (
    SELECT doc_id, text,
           CAST(unnest(range(0, CAST(length(text) AS BIGINT), 48))
                AS INTEGER) AS win_off
    FROM documents
)
SELECT doc_id,
       CAST(win_off / 48 AS INTEGER) AS win_idx,
       win_off,
       CAST(length(substring(text, win_off + 1, 96)) AS INTEGER)
           AS win_chars,
       md5(substring(text, win_off + 1, 96)) AS win_md5
FROM offs
"""

ORACLE["funnel_conversion"] = """
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t2,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
    FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_signup,
       CAST(SUM(CASE WHEN t1 > t0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_then_view,
       CAST(SUM(CASE WHEN t2 > t1 AND t1 > t0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_then_click,
       CAST(SUM(CASE WHEN t3 > t2 AND t2 > t1 AND t1 > t0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_then_purchase
FROM per_user
"""

ORACLE["session_entry_paths"] = """
WITH tagged AS (
    SELECT user_id, event_id, event_type, ts,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000
                    THEN 1
                WHEN lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1
                ELSE 0 END AS brk
    FROM events
), sess AS (
    SELECT user_id, event_id, event_type, ts,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
    FROM tagged
), ranked AS (
    SELECT user_id, session_id, event_type,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) AS rn
    FROM sess
), paths AS (
    SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY rn) AS path
    FROM ranked WHERE rn <= 3
    GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 10
"""

ORACLE["resample_daily_locf"] = """
WITH days AS (
    SELECT CAST(g AS DATE) AS day FROM (
        SELECT unnest(generate_series(DATE '1997-01-01',
                                      DATE '1997-03-31',
                                      INTERVAL 1 DAY)) AS g)
), users AS (SELECT DISTINCT user_id FROM events),
obs AS (
    SELECT user_id, day, v_day FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value AS v_day,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
          AND ts >= TIMESTAMP '1997-01-01' AND ts < TIMESTAMP '1997-04-01'
    ) WHERE rn = 1
)
SELECT u.user_id, strftime(d.day, '%Y-%m-%d') AS day,
       last_value(o.v_day IGNORE NULLS) OVER (
           PARTITION BY u.user_id ORDER BY d.day
           ROWS UNBOUNDED PRECEDING) AS value_locf
FROM users u CROSS JOIN days d
LEFT JOIN obs o ON o.user_id = u.user_id AND o.day = d.day
"""

ORACLE["resample_daily_interpolate"] = """
WITH days AS (
    SELECT CAST(g AS DATE) AS day FROM (
        SELECT unnest(generate_series(DATE '1997-01-01',
                                      DATE '1997-03-31',
                                      INTERVAL 1 DAY)) AS g)
), users AS (SELECT DISTINCT user_id FROM events),
obs AS (
    SELECT user_id, day, v_day FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value AS v_day,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
          AND ts >= TIMESTAMP '1997-01-01' AND ts < TIMESTAMP '1997-04-01'
    ) WHERE rn = 1
), br AS (
    SELECT u.user_id, d.day, o.v_day,
           last_value(o.v_day IGNORE NULLS) OVER wb AS vp,
           last_value(CASE WHEN o.v_day IS NOT NULL THEN d.day END
                      IGNORE NULLS) OVER wb AS dp,
           first_value(o.v_day IGNORE NULLS) OVER wf AS vn,
           first_value(CASE WHEN o.v_day IS NOT NULL THEN d.day END
                       IGNORE NULLS) OVER wf AS dn
    FROM users u CROSS JOIN days d
    LEFT JOIN obs o ON o.user_id = u.user_id AND o.day = d.day
    WINDOW wb AS (PARTITION BY u.user_id ORDER BY d.day
                  ROWS UNBOUNDED PRECEDING),
           wf AS (PARTITION BY u.user_id ORDER BY d.day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
-- interpolated branch: exact cents x integer day weights over
-- 100*gap, rounded via the integer round-6 recipe with the sign/abs
-- decomposition (half-away-from-zero; a raw signed // would
-- TRUNCATE for negative cents — credits/refunds — while the engine
-- rounds half-away; r6 advisory. Tie-safe: the double form diverges
-- across engines on e.g. 32-day gaps)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       CASE WHEN v_day IS NOT NULL THEN ROUND(v_day, 6)
            WHEN num IS NOT NULL
            THEN CAST(CAST(sign(num) AS BIGINT)
                      * ((2 * abs(num) * 1000000 + den) // (2 * den))
                      AS DOUBLE) / 1000000.0
       END AS value_interp
FROM (
    SELECT user_id, day, v_day,
           CASE WHEN vp IS NOT NULL AND vn IS NOT NULL
                THEN CAST(floor(vp * 100 + 0.5) AS BIGINT)
                     * (datediff('day', dp, dn)
                        - datediff('day', dp, day))
                     + CAST(floor(vn * 100 + 0.5) AS BIGINT)
                       * datediff('day', dp, day) END AS num,
           datediff('day', dp, dn) * 100 AS den
    FROM br)
"""

# batch derivation of the streaming state machine's stage counts
ORACLE["stream_stateful_funnel"] = """
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t2,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
    FROM events GROUP BY user_id
), staged AS (
    SELECT user_id,
           CASE WHEN t0 IS NULL THEN 0
                WHEN t1 > t0 AND t2 > t1 AND t3 > t2 THEN 4
                WHEN t1 > t0 AND t2 > t1 THEN 3
                WHEN t1 > t0 THEN 2
                ELSE 1 END AS funnel_stage
    FROM per_user
)
SELECT CAST(funnel_stage AS INTEGER) AS funnel_stage,
       COUNT(*) AS n_users
FROM staged GROUP BY 1
"""

ORACLE["agg_retention_cohorts"] = """
WITH cohort AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_d
    FROM events WHERE event_type = 'signup' GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_date,
       CAST(date_diff('day', cohort_d, d) AS INTEGER) AS day_offset,
       COUNT(DISTINCT user_id) AS n_active
FROM active JOIN cohort USING (user_id)
WHERE d >= cohort_d
GROUP BY 1, 2
"""

ORACLE["dq_referential_integrity"] = """
SELECT 'lineitem.l_orderkey -> orders' AS fk_check,
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'orders.o_custkey -> customer',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
"""

ORACLE["text_tfidf_top_terms"] = """
WITH toke AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toke GROUP BY doc_id, term
), dfreq AS (
    SELECT term, COUNT(*) AS df FROM (
        SELECT DISTINCT doc_id, term FROM toke) GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * log10(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6)
               AS tfidf
    FROM tf JOIN dfreq USING (term), n
), ranked AS (
    SELECT doc_id, term, tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, term ASC) AS rnk
    FROM scored
)
SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# Decision-support parity pack (plans/olap_suite.py) — TPC-H query
# shapes adapted to the reduced schema. Every float aggregate mirrors
# the engine's DECIMAL(18,4) exact-sum; averages/ratios are the same
# DOUBLE division of those sums, in the same operand order.
# ---------------------------------------------------------------------------

ORACLE["sql_pricing_summary"] = """
WITH g AS (
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           -- three-factor charge in native decimal: the exact value
           -- has 6 decimals, so a double product cast to scale 4 has
           -- engine-divergent rounding ties (CORRECTNESS_r04 red row)
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l_discount AS DECIMAL(4,2))
                    * CAST(1.0 + l_tax AS DECIMAL(4,2)))
                AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
       sum_disc_price, sum_charge,
       sum_qty / count_order AS avg_qty,
       sum_base_price / count_order AS avg_price,
       count_order
FROM g
"""

ORACLE["sql_order_priority_exists"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
GROUP BY o_orderpriority
"""

ORACLE["sql_volume_shipping"] = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

ORACLE["sql_market_share"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_2'
                          THEN l_extendedprice * (1.0 - l_discount)
                          ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
           AS nation_revenue,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_2'
                          THEN l_extendedprice * (1.0 - l_discount)
                          ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,4))) AS DOUBLE) AS market_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
GROUP BY 1
"""

ORACLE["sql_returned_items"] = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLE["sql_top_revenue_parts"] = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS part_revenue
    FROM lineitem GROUP BY 1),
total AS (
    SELECT CAST(SUM(CAST(part_revenue AS DECIMAL(18,4))) AS DOUBLE)
           / COUNT(*) AS mean_revenue
    FROM per_part)
SELECT l_partkey, part_revenue
FROM per_part, total
WHERE part_revenue > 1.5 * mean_revenue
"""

ORACLE["sql_cust_order_distribution"] = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN (SELECT * FROM orders
               WHERE o_orderpriority <> '1-URGENT') o
           ON c_custkey = o.o_custkey
    GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY 1
"""

ORACLE["sql_promo_revenue_ratio"] = """
WITH g AS (
    SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
               AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01')
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM g
"""

ORACLE["sql_top_supplier"] = """
WITH per_supp AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
"""

ORACLE["sql_small_qty_revenue"] = """
WITH brand_lines AS (
    SELECT l.* FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_brand = 'Brand#7')),
stats AS (
    SELECT l_partkey AS sp_key,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS avg_qty
    FROM brand_lines GROUP BY 1),
small AS (
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS small_revenue,
           COUNT(*) AS n_small_lines
    FROM brand_lines JOIN stats ON l_partkey = sp_key
    WHERE l_quantity < 0.2 * avg_qty)
SELECT small_revenue / 7.0 AS avg_yearly, small_revenue, n_small_lines
FROM small
"""

ORACLE["sql_volume_customers"] = """
WITH big AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS total_qty
    FROM lineitem GROUP BY 1
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 250.0)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 100
"""

ORACLE["sql_disjunctive_revenue"] = """
SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size <= 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#12' AND p_size <= 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#21' AND p_size <= 40
       AND l_quantity BETWEEN 20 AND 45)
"""

ORACLE["sql_dormant_customers"] = """
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
           / COUNT(*) AS avg_positive_bal
    FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > avg_positive_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Bloom / KMV sketches and fixed-iteration PageRank — full mirrors:
# md5 bit positions, integer micro-unit ranks, and double estimates
# built with the same IEEE op order are all bit-reproducible.
# ---------------------------------------------------------------------------

ORACLE["sketch_bloom_filter"] = """
WITH recent AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-04-01'),
build_pos AS (
    SELECT ('0x' || substr(md5('b' || CAST(i AS VARCHAR) || ':'
                               || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           % 61440 AS pos
    FROM (SELECT o_custkey, unnest([0, 1, 2, 3, 4]) AS i FROM recent)),
bloom AS (
    SELECT pos // 60 AS word,
           bit_or(1::BIGINT << CAST(pos % 60 AS INTEGER)) AS bits
    FROM build_pos GROUP BY 1),
probe_pos AS (
    SELECT c_custkey,
           ('0x' || substr(md5('b' || CAST(i AS VARCHAR) || ':'
                               || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
           % 61440 AS pos
    FROM (SELECT c_custkey, unnest([0, 1, 2, 3, 4]) AS i FROM customer)),
hits AS (
    SELECT c_custkey,
           SUM(CASE WHEN COALESCE((bits >> CAST(pos % 60 AS INTEGER)) & 1, 0)
                         = 1 THEN 1 ELSE 0 END) = 5 AS bloom_member
    FROM probe_pos LEFT JOIN bloom ON pos // 60 = word
    GROUP BY 1),
flagged AS (
    SELECT c.c_mktsegment, h.bloom_member,
           (r.o_custkey IS NOT NULL) AS exact_member
    FROM customer c
    JOIN hits h USING (c_custkey)
    LEFT JOIN recent r ON c.c_custkey = r.o_custkey)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN exact_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_recent_exact,
       CAST(SUM(CASE WHEN bloom_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bloom_hits,
       CAST(SUM(CASE WHEN exact_member AND NOT bloom_member
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
       CAST(SUM(CASE WHEN bloom_member AND NOT exact_member
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM flagged GROUP BY 1
"""

ORACLE["sketch_kmv_overlap"] = """
WITH sk_a AS (
    SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                    1, 15))::BIGINT AS h
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    ORDER BY h LIMIT 64),
sk_b AS (
    SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                    1, 15))::BIGINT AS h
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    ORDER BY h LIMIT 64),
agg_a AS (SELECT COUNT(*) AS n_h_a, MAX(h) AS h_k_a FROM sk_a),
agg_b AS (SELECT COUNT(*) AS n_h_b, MAX(h) AS h_k_b FROM sk_b),
exact_a AS (
    SELECT COUNT(DISTINCT o_custkey) AS exact_a FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'),
exact_b AS (
    SELECT COUNT(DISTINCT o_custkey) AS exact_b FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'),
exact_i AS (
    SELECT COUNT(*) AS exact_intersection FROM (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01')),
merged AS (
    SELECT h FROM (SELECT h FROM sk_a UNION SELECT h FROM sk_b)
    ORDER BY h LIMIT 64),
m_agg AS (SELECT COUNT(*) AS n_m, MAX(h) AS theta FROM merged),
common AS (
    SELECT COUNT(*) AS k_cap FROM sk_a
    WHERE h IN (SELECT h FROM sk_b)
      AND h <= (SELECT theta FROM m_agg)),
calc AS (
    SELECT CASE WHEN n_h_a < 64 THEN CAST(n_h_a AS DOUBLE)
                ELSE 63.0 * 1152921504606846976.0 / CAST(h_k_a AS DOUBLE)
           END AS est_a,
           exact_a,
           CASE WHEN n_h_b < 64 THEN CAST(n_h_b AS DOUBLE)
                ELSE 63.0 * 1152921504606846976.0 / CAST(h_k_b AS DOUBLE)
           END AS est_b,
           exact_b,
           CAST(k_cap AS DOUBLE) / CAST(n_m AS DOUBLE)
           * CASE WHEN n_m < 64 THEN CAST(n_m AS DOUBLE)
                  ELSE 63.0 * 1152921504606846976.0 / CAST(theta AS DOUBLE)
             END AS est_intersection,
           exact_intersection
    FROM agg_a, agg_b, exact_a, exact_b, exact_i, m_agg, common)
SELECT CAST(64 AS INTEGER) AS k, est_a, exact_a, est_b, exact_b,
       est_intersection, exact_intersection,
       ABS(est_intersection - CAST(exact_intersection AS DOUBLE))
           <= GREATEST(0.35 * CAST(exact_intersection AS DOUBLE), 32.0)
           AS kmv_ok
FROM calc
"""

ORACLE["graph_pagerank_fixed"] = """
WITH pairs AS (
    SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS c_node,
                    'S' || CAST(l_suppkey AS VARCHAR) AS s_node
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
    SELECT c_node AS src, s_node AS dst FROM pairs
    UNION ALL
    SELECT s_node AS src, c_node AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY 1),
r0 AS (SELECT node, 1000000000000::BIGINT AS rank_units FROM nodes),
c1 AS (SELECT e.dst, CAST(SUM(r.rank_units // d.out_deg) AS BIGINT) AS in_sum
       FROM edges e JOIN deg d ON e.src = d.src
       JOIN r0 r ON e.src = r.node GROUP BY 1),
r1 AS (SELECT n.node,
              150000000000 + (17 * COALESCE(c.in_sum, 0)) // 20
                  AS rank_units
       FROM nodes n LEFT JOIN c1 c ON n.node = c.dst),
c2 AS (SELECT e.dst, CAST(SUM(r.rank_units // d.out_deg) AS BIGINT) AS in_sum
       FROM edges e JOIN deg d ON e.src = d.src
       JOIN r1 r ON e.src = r.node GROUP BY 1),
r2 AS (SELECT n.node,
              150000000000 + (17 * COALESCE(c.in_sum, 0)) // 20
                  AS rank_units
       FROM nodes n LEFT JOIN c2 c ON n.node = c.dst),
c3 AS (SELECT e.dst, CAST(SUM(r.rank_units // d.out_deg) AS BIGINT) AS in_sum
       FROM edges e JOIN deg d ON e.src = d.src
       JOIN r2 r ON e.src = r.node GROUP BY 1),
r3 AS (SELECT n.node,
              150000000000 + (17 * COALESCE(c.in_sum, 0)) // 20
                  AS rank_units
       FROM nodes n LEFT JOIN c3 c ON n.node = c.dst)
SELECT node, rank_units FROM r3
ORDER BY rank_units DESC, node ASC LIMIT 25
"""


ORACLE["join_interval_overlap"] = """
WITH views AS (
    SELECT user_id, ts AS v_start, ts + INTERVAL 30 MINUTE AS v_end
    FROM events WHERE event_type = 'view'),
purchases AS (
    SELECT user_id AS p_user, ts AS p_start,
           ts + INTERVAL 30 MINUTE AS p_end
    FROM events WHERE event_type = 'purchase')
SELECT user_id, COUNT(*) AS n_overlap_pairs
FROM views JOIN purchases
  ON user_id = p_user AND v_start < p_end AND p_start < v_end
GROUP BY 1
"""

ORACLE["embedding_gram_matrix"] = """
WITH ex AS (
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS i,
           unnest(embedding) AS x
    FROM embeddings)
SELECT a.i AS i, b.i AS j,
       CAST(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                     AS DECIMAL(18,8))) AS DOUBLE) AS gram
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


# Per-dimension standardization stats: decimal-exact moments, then
# unrounded double math in the engine's exact operand order (s/n,
# sq/n - (s/n)*(s/n), sqrt) — bitwise-identical without rounding.
ORACLE["embedding_standardize_stats"] = """
WITH ex AS (
    SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
), stats AS (
    SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS s,
           CAST(SUM(CAST(x * x AS DECIMAL(18,8))) AS DOUBLE) AS sq
    FROM ex GROUP BY pos
), en AS (
    SELECT pos, n, s / n AS mean,
           sqrt(sq / n - (s / n) * (s / n)) AS std
    FROM stats
)
SELECT e.pos, en.n, en.mean, en.std,
       MIN((e.x - en.mean) / en.std) AS z_min,
       MAX((e.x - en.mean) / en.std) AS z_max
FROM ex e JOIN en USING (pos)
GROUP BY e.pos, en.n, en.mean, en.std
"""

ORACLE["stream_stream_join"] = """
WITH v AS (SELECT user_id, ts AS view_ts, value AS view_value
           FROM events WHERE event_type = 'view'),
p AS (SELECT user_id AS p_user, ts AS purchase_ts,
             event_id AS purchase_id
      FROM events WHERE event_type = 'purchase')
SELECT user_id,
       COUNT(DISTINCT purchase_id) AS n_attributed_purchases,
       COUNT(*) AS n_view_pairs,
       CAST(SUM(CAST(view_value AS DECIMAL(18,4))) AS DOUBLE)
           AS attributed_value
FROM v JOIN p
  ON user_id = p_user
 AND view_ts <= purchase_ts
 AND view_ts >= purchase_ts - INTERVAL 30 MINUTE
GROUP BY 1
"""

ORACLE["stream_stream_join_live"] = ORACLE["stream_stream_join"]


# --- second-wave OLAP / maintenance keys -----------------------------------

ORACLE["sql_forecast_revenue"] = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
            AS DOUBLE) AS forecast_revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""

ORACLE["sql_lateness_priority_mix"] = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
            THEN 'late' ELSE 'on_time' END AS lateness,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

ORACLE["sql_supplier_part_counts"] = """
SELECT p_brand,
       CAST(FLOOR(p_size / 10) * 10 AS INTEGER) AS size_band,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#5', 'Brand#15')
GROUP BY 1, 2
"""

ORACLE["agg_mode_per_group"] = """
WITH counts AS (
    SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2),
ranked AS (
    SELECT c_mktsegment, o_orderpriority, cnt,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY cnt DESC, o_orderpriority ASC) AS rn
    FROM counts)
SELECT c_mktsegment, o_orderpriority AS modal_priority,
       cnt AS modal_count
FROM ranked WHERE rn = 1
"""

ORACLE["sql_grouping_sets"] = """
SELECT c.c_mktsegment, o.o_orderpriority,
       CAST(CASE WHEN c.c_mktsegment IS NOT NULL THEN 1
                 WHEN o.o_orderpriority IS NOT NULL THEN 2
                 ELSE 3 END AS INTEGER) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((c.c_mktsegment), (o.o_orderpriority), ())
"""

ORACLE["maintenance_incremental_rollup"] = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS total_amount,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


def _zterms(d: str, p: str, bits: int = 8) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"(((({d}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({p}) >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


ORACLE["maintenance_zorder_rewrite"] = f"""
WITH zed AS (
    SELECT l_shipdate, l_partkey, l_extendedprice,
           CAST({_zterms("date_diff('day', DATE '1995-01-01', l_shipdate) & 255",
                         "CAST(l_partkey AS INTEGER) & 255")}
                AS INTEGER) AS zval
    FROM lineitem)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_price,
       MIN(zval) AS min_zval, MAX(zval) AS max_zval
FROM zed
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
  AND l_partkey % 4 = 0
"""


ORACLE["join_scd2_pointintime"] = """
WITH firsts AS (
    SELECT o_custkey, MIN(o_orderdate) AS first_dt
    FROM orders GROUP BY 1),
hist AS (
    SELECT c_custkey, 'PRE_' || c_mktsegment AS segment_v,
           TIMESTAMP '1990-01-01' AS valid_from,
           first_dt + INTERVAL 1 YEAR AS valid_to
    FROM customer JOIN firsts ON c_custkey = o_custkey
    UNION ALL
    SELECT c_custkey, c_mktsegment,
           first_dt + INTERVAL 1 YEAR, NULL
    FROM customer JOIN firsts ON c_custkey = o_custkey)
SELECT segment_v AS segment_at_order,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders JOIN hist
  ON o_custkey = c_custkey
 AND valid_from <= o_orderdate
 AND (valid_to IS NULL OR o_orderdate < valid_to)
GROUP BY 1
"""

ORACLE["window_rolling_distinct"] = """
WITH daily AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
    FROM events WHERE event_type = 'purchase'),
days AS (SELECT DISTINCT d FROM daily)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       COUNT(DISTINCT daily.user_id) AS rolling_users
FROM days JOIN daily
  ON daily.d >= days.d - INTERVAL 6 DAY AND daily.d <= days.d
GROUP BY 1
"""


# the streamed page scan equals the batch scan of the same manifest
ORACLE["source_qbo_stream_live"] = ORACLE["source_qbo_datasource"]


ORACLE["sql_waiting_suppliers"] = """
WITH late_lines AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM late_lines l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late_lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
"""


# --- Spark 4 surface closure ----------------------------------------------

ORACLE["json_variant_extract"] = """
SELECT CAST(props->>'$.k' AS INTEGER) AS prop_k,
       'OBJECT<k: BIGINT>' AS props_schema,
       COUNT(*) AS n_events,
       MIN(event_id) AS min_event_id
FROM events GROUP BY 1, 2
"""

ORACLE["udf_sql_scalar"] = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))
                * CAST(1.0 + l_tax AS DECIMAL(4,2)))
            AS DOUBLE) AS total_charge,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY l_returnflag
"""

ORACLE["join_lateral_topn"] = """
WITH ranked AS (
    SELECT n_name, c_name, c_acctbal,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
    FROM customer JOIN nation ON c_nationkey = n_nationkey)
SELECT n_name, c_name, c_acctbal FROM ranked WHERE rn <= 3
"""

ORACLE["sql_parameterized_query"] = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND o_orderstatus = 'F'
GROUP BY 1
"""

ORACLE["dq_observe_metrics"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_price,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_custkeys
FROM orders
"""


# run attribution derives from the page ordinal: page 0 was
# committed before run 1, page 1 between runs
ORACLE["stream_source_incremental_restart"] = """
SELECT CAST(id AS INTEGER) AS id, doc_number,
       CAST(balance AS DOUBLE) AS balance,
       CAST(page AS INTEGER) AS page,
       CAST(CASE WHEN page = 0 THEN 1 ELSE 2 END AS INTEGER) AS run
FROM (VALUES
  (101, 'B-1001', 250.5, 0),
  (102, 'B-1002', 0.0,  0),
  (103, 'B-1003', 99.99, 1)
) t(id, doc_number, balance, page)
"""


ORACLE["text_cooccurrence_pmi"] = """
WITH tok AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS t,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents),
pair_counts AS (
    SELECT least(a.t, b.t) AS w1, greatest(a.t, b.t) AS w2,
           COUNT(*) AS c_xy
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id AND b.pos - a.pos IN (1, 2)
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5),
uni AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
total AS (SELECT COUNT(*) AS n_tok FROM tok)
SELECT w1, w2, c_xy,
       ROUND(LOG10((CAST(c_xy AS DOUBLE) * CAST(n_tok AS DOUBLE))
                   / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6)
           AS pmi
FROM pair_counts
JOIN uni u1 ON w1 = u1.t
JOIN uni u2 ON w2 = u2.t
CROSS JOIN total
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT 30
"""


ORACLE["dedup_bloom_prefilter"] = """
WITH corpus AS (
    SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % 3 = 0),
batch AS (
    SELECT doc_id, md5(text) AS k FROM documents WHERE doc_id % 2 = 0),
build_pos AS (
    SELECT ('0x' || substr(md5('b' || CAST(i AS VARCHAR) || ':' || k),
                           1, 15))::BIGINT % 61440 AS pos
    FROM (SELECT k, unnest([0, 1, 2, 3, 4]) AS i FROM corpus)),
bloom AS (
    SELECT pos // 60 AS word,
           bit_or(1::BIGINT << CAST(pos % 60 AS INTEGER)) AS bits
    FROM build_pos GROUP BY 1),
probe_pos AS (
    SELECT k,
           ('0x' || substr(md5('b' || CAST(i AS VARCHAR) || ':' || k),
                           1, 15))::BIGINT % 61440 AS pos
    FROM (SELECT k, unnest([0, 1, 2, 3, 4]) AS i
          FROM (SELECT DISTINCT k FROM batch))),
hits AS (
    SELECT k,
           SUM(CASE WHEN COALESCE((bits >> CAST(pos % 60 AS INTEGER)) & 1, 0)
                         = 1 THEN 1 ELSE 0 END) = 5 AS bloom_member
    FROM probe_pos LEFT JOIN bloom ON pos // 60 = word
    GROUP BY 1),
flagged AS (
    SELECT b.doc_id, h.bloom_member,
           (c.k IS NOT NULL) AS is_dup
    FROM batch b
    JOIN hits h ON b.k = h.k
    LEFT JOIN corpus c ON b.k = c.k)
SELECT COUNT(*) AS n_batch,
       CAST(SUM(CASE WHEN NOT bloom_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_definite_new,
       CAST(SUM(CASE WHEN bloom_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_candidates,
       CAST(SUM(CASE WHEN bloom_member AND is_dup THEN 1 ELSE 0 END)
            AS BIGINT) AS n_confirmed_dup,
       CAST(SUM(CASE WHEN bloom_member AND NOT is_dup THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN NOT bloom_member AND is_dup THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missed_dups
FROM flagged
"""


# the Arrow tier is asserted against the exact tier in-query; the
# oracle recomputes the exact gram and expects every cell flagged ok
ORACLE["embedding_gram_matrix_arrow"] = """
WITH ex AS (
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS i,
           unnest(embedding) AS x
    FROM embeddings)
SELECT a.i AS i, b.i AS j,
       CAST(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                     AS DECIMAL(18,8))) AS DOUBLE) AS gram,
       TRUE AS arrow_ok
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


ORACLE["scan_schema_evolution"] = """
SELECT o_orderstatus,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
           AS o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS total_amount
FROM orders
GROUP BY 1, 2
"""

ORACLE["sink_dynamic_partition_overwrite"] = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(CASE WHEN strftime(o_orderdate, '%Y-%m') = '1997-03'
                          THEN o_totalprice * 2.0
                          ELSE o_totalprice END
                     AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') IN ('1997-02', '1997-03', '1997-04')
GROUP BY 1
"""

# Per-source mass -> sqrt-temperature keep-rate -> hash-draw membership;
# rates rounded to 6 decimals in BOTH engines before the cut (boundary
# safety), u = (md5_60+1)/2^60 is an exact IEEE division in both.
ORACLE["mixture_temperature_sampling"] = """
WITH mass AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS mass
    FROM documents GROUP BY source
), floor_mass AS (
    SELECT MIN(mass) AS min_mass FROM mass
), rates AS (
    SELECT source, n_docs,
           ROUND(sqrt(CAST(min_mass AS DOUBLE) / CAST(mass AS DOUBLE)), 6)
               AS rate
    FROM mass, floor_mass
), sampled AS (
    SELECT d.source, COUNT(*) AS n_sampled
    FROM documents d JOIN rates r USING (source)
    WHERE (('0x' || substr(md5('mix0:' || CAST(d.doc_id AS VARCHAR)), 1, 15)
           )::BIGINT + 1) / 1152921504606846976.0 < r.rate
    GROUP BY d.source
)
SELECT r.source, r.n_docs, COALESCE(s.n_sampled, 0) AS n_sampled, r.rate
FROM rates r LEFT JOIN sampled s USING (source)
"""

# Gap arithmetic in integer microseconds on both engines (epoch_us ==
# unix_micros) so a session break can never flip on sub-second
# truncation; entry event picked by the same (ts, event_id) order the
# engine's min_by uses.
ORACLE["pipeline_user_features"] = """
WITH tagged AS (
    SELECT user_id, event_id, event_type, ts, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000 THEN 1
                WHEN lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL THEN 1
                ELSE 0 END AS brk
    FROM events
), sess AS (
    SELECT user_id, event_type, ts, value,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
    FROM tagged
), per_session AS (
    SELECT user_id, session_id,
           COUNT(*) AS s_events,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS s_dur_us,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS s_purchases,
           SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END
               AS DECIMAL(18,4))) AS s_value,
           MIN(epoch_us(ts)) AS s_start, MAX(epoch_us(ts)) AS s_end
    FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(s_events) AS BIGINT) AS n_events,
       CAST(SUM(s_purchases) AS BIGINT) AS n_purchases,
       ROUND(CAST(SUM(s_value) AS DOUBLE), 4) AS total_value,
       ROUND(CAST(SUM(s_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS events_per_session,
       ROUND(CAST(SUM(s_dur_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS avg_session_us,
       CAST(MAX(s_end) - MIN(s_start) AS BIGINT) AS engagement_span_us
FROM per_session GROUP BY user_id
"""

ORACLE["sessionize_inactivity_gap"] = """
WITH tagged AS (
    SELECT user_id, event_id, event_type, ts,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000 THEN 1
                WHEN lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL THEN 1
                ELSE 0 END AS brk
    FROM events
), sess AS (
    SELECT user_id, event_id, event_type, ts,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
    FROM tagged
), grouped AS (
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM sess GROUP BY user_id, session_id
), entry AS (
    SELECT user_id, session_id, event_type,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) AS rn
    FROM sess
)
SELECT g.user_id, g.session_id, g.n_events, g.duration_us, g.n_purchases,
       e.event_type AS entry_type
FROM grouped g JOIN entry e
  ON e.user_id = g.user_id AND e.session_id = g.session_id AND e.rn = 1
"""

# Keyed consistent pseudonymization: identical md5 surrogates on both
# sides, so the surrogate join reproduces the raw-id analytics.
ORACLE["privacy_pseudonymize_consistent"] = """
WITH ev AS (
    SELECT md5('pseud:' || CAST(user_id AS VARCHAR)) AS u_pseud, value
    FROM events
), cust AS (
    SELECT md5('pseud:' || CAST(c_custkey AS VARCHAR)) AS u_pseud,
           c_mktsegment
    FROM customer
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT ev.u_pseud) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM ev JOIN cust USING (u_pseud)
GROUP BY c_mktsegment
"""

ORACLE["privacy_k_anonymity"] = """
SELECT c_mktsegment, c_nationkey,
       CAST(floor(c_acctbal / 2000.0) AS INTEGER) AS bal_band,
       COUNT(*) AS n_rows,
       COUNT(*) < 5 AS suppress
FROM customer
GROUP BY 1, 2, 3
"""

ORACLE["privacy_dp_laplace_counts"] = """
WITH g AS (
    SELECT c_mktsegment, COUNT(*) AS n_true
    FROM customer GROUP BY c_mktsegment
), d AS (
    SELECT c_mktsegment, n_true,
           (('0x' || substr(md5('dp:' || c_mktsegment), 1, 15))::BIGINT
            + 1) / 1152921504606846976.0 - 0.5 AS p
    FROM g
)
SELECT c_mktsegment, n_true,
       ROUND(-2.0 * sign(p) * ROUND(ln(1.0 - 2.0 * abs(p)), 9), 6)
           AS noise,
       ROUND(n_true + ROUND(-2.0 * sign(p)
             * ROUND(ln(1.0 - 2.0 * abs(p)), 9), 6), 6) AS n_noisy
FROM d
"""

ORACLE["privacy_l_diversity"] = """
SELECT c_mktsegment, c_nationkey,
       COUNT(*) AS n_rows,
       CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS INTEGER))
            AS BIGINT) AS n_distinct_bands,
       COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS INTEGER)) >= 3
           AS diverse
FROM customer
GROUP BY 1, 2
"""

# The oracle applies the change feed with the textbook row_number()
# window; the engine uses the map-side-combining max_by aggregate —
# equality proves the rewrite.
ORACLE["cdc_apply_changes"] = """
WITH feed AS (
    SELECT o_orderkey, 1 AS seq, 'I' AS op, o_orderstatus, o_totalprice
    FROM orders
    UNION ALL
    SELECT o_orderkey, 2, 'U', o_orderstatus, o_totalprice * 1.1
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, 3, 'D', o_orderstatus, CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 10 = 0
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY seq DESC) AS rn
    FROM feed
), alive AS (
    SELECT op, o_orderstatus, o_totalprice
    FROM ranked WHERE rn = 1 AND op <> 'D'
)
SELECT o_orderstatus, op, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM alive GROUP BY 1, 2
"""

# Naive id-ordered 3-clique join — triangle counts are orientation-
# independent, so equality proves the engine's degree-ordered wedge
# optimization changes nothing.
ORACLE["graph_link_prediction"] = """
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
), sym AS (
    SELECT pa, pb FROM edges
    UNION ALL SELECT pb AS pa, pa AS pb FROM edges
), deg AS (
    SELECT pa AS node, COUNT(*) AS deg FROM sym GROUP BY pa
), piv AS (
    SELECT s.pa AS z, s.pb
    FROM sym s JOIN deg d ON s.pa = d.node
    WHERE d.deg <= 100
), cand AS (
    SELECT x.pb AS x, y.pb AS y, COUNT(*) AS cn
    FROM piv x JOIN piv y ON x.z = y.z AND x.pb < y.pb
    GROUP BY 1, 2
), non_edges AS (
    SELECT c.* FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM edges e
                      WHERE e.pa = c.x AND e.pb = c.y)
), scored AS (
    SELECT n.x, n.y, n.cn, dx.deg AS deg_x, dy.deg AS deg_y,
           ROUND(CAST(n.cn AS DOUBLE)
                 / CAST(dx.deg + dy.deg - n.cn AS DOUBLE), 6) AS jaccard
    FROM non_edges n
    JOIN deg dx ON dx.node = n.x
    JOIN deg dy ON dy.node = n.y
)
SELECT x, y, cn, deg_x, deg_y, jaccard
FROM scored ORDER BY jaccard DESC, x, y LIMIT 20
"""

# Node-sampled tier: the identical program over the subgraph induced
# by parts with l_partkey % 4 == 0 (mirrors the Spark key's filter).
assert ORACLE["graph_link_prediction"].count(
    "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem") == 1
ORACLE["graph_link_prediction_sampled"] = \
    ORACLE["graph_link_prediction"].replace(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem",
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
        "WHERE l_partkey % 4 = 0", 1)

ORACLE["graph_triangle_count"] = """
WITH ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), edges AS (
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM ps a JOIN ps b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
), deg AS (
    SELECT node, COUNT(*) AS deg FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst AS node FROM edges
    ) GROUP BY node
), tri AS (
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
), wed AS (
    SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       wed.n_wedges, tri.n_triangles,
       CASE WHEN wed.n_wedges > 0
            THEN (1000000 * 3 * tri.n_triangles) // wed.n_wedges
            ELSE CAST(0 AS BIGINT) END AS clustering_ppm
FROM wed, tri
"""

# Node-sampled census: the identical program over the induced
# subgraph of suppliers with l_suppkey % 4 == 0 (deterministic
# p = 1/4 node sample, mirrored from the Spark key's filter).
assert ORACLE["graph_triangle_count"].count(
    "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem") == 1
ORACLE["graph_triangle_count_sampled"] = \
    ORACLE["graph_triangle_count"].replace(
        "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
        "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem "
        "WHERE l_suppkey % 4 = 0", 1)

# Conditional bigram MLE — every scored bigram exists in the counts it
# was counted into, so no smoothing term; log10 rounded to 7 decimals
# then decimal-summed (the unigram tier's determinism recipe).
ORACLE["text_bigram_logprob"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])
               ELSE [] END) AS bg
    FROM toks
), bgc AS (
    SELECT bg, COUNT(*) AS c12 FROM sh GROUP BY bg
), uni AS (
    SELECT token, COUNT(*) AS c1
    FROM (SELECT unnest(t) AS token FROM toks) GROUP BY token
)
SELECT doc_id, n_bigrams,
       -- integer half-away mean (the engine's tie-safe recipe)
       CAST(CAST(sign(s) AS BIGINT)
            * ((2 * CAST(abs(s) * 10000000 AS HUGEINT) * 1000000
                + CAST(n_bigrams AS HUGEINT) * 10000000)
               // (2 * CAST(n_bigrams AS HUGEINT) * 10000000))
            AS DOUBLE) / 1000000.0 AS avg_cond_logprob
FROM (
SELECT doc_id, COUNT(*) AS n_bigrams,
       SUM(CAST(ROUND(log10(CAST(c12 AS DOUBLE) / c1), 7)
                AS DECIMAL(28,7))) AS s
FROM sh
JOIN bgc USING (bg)
JOIN uni ON string_split(bg, ' ')[1] = uni.token
GROUP BY doc_id
)
"""

# Benford first-digit screen: expected ppm are the SAME Python-
# generated integers the Spark plan embeds (shared-constant pattern).
from .llm_ops import benford_expected_ppm as _benford  # noqa: E402

ORACLE["dq_benford_digits"] = f"""
WITH cents AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
    FROM orders
), digits AS (
    SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
    FROM cents
), counts AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM digits GROUP BY digit
), tot AS (SELECT SUM(n_obs) AS t FROM counts)
SELECT digit, n_obs,
       CAST(n_obs * 1000000 // t AS BIGINT) AS obs_ppm,
       CAST([{",".join(map(str, _benford()))}][digit] AS BIGINT) AS exp_ppm,
       CAST(abs(n_obs * 1000000 // t
                - [{",".join(map(str, _benford()))}][digit]) AS BIGINT)
           AS dev_ppm
FROM counts, tot ORDER BY digit
"""

# Pipe-syntax rollup: the plain-ANSI equivalent of the |> chain.
ORACLE["sql_pipe_syntax"] = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# DSIR importance resampling: hashed-bigram NB log-ratio, weights
# rounded to 7 decimals into DECIMAL(28,7) (the bigram_logprob
# determinism recipe), exact decimal per-doc sums, top-100 with
# doc_id tie-break.
ORACLE["select_importance_resample"] = """
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), bg AS (
    SELECT doc_id, source = 'src0' AS is_target,
           unnest(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])
               ELSE [] END) AS bg
    FROM toks
), feat AS (
    SELECT doc_id, is_target,
           ('0x' || substr(md5(bg), 1, 15))::BIGINT % 4096 AS bucket
    FROM bg
), per_doc AS (
    SELECT doc_id, is_target, bucket, COUNT(*) AS n
    FROM feat GROUP BY 1, 2, 3
), bt AS (
    SELECT bucket,
           SUM(CASE WHEN is_target THEN n ELSE 0 END) AS ct,
           SUM(CASE WHEN NOT is_target THEN n ELSE 0 END) AS cr
    FROM per_doc GROUP BY bucket
), tot AS (
    SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM bt
), w AS (
    SELECT bucket,
           CAST(ROUND(log10((ct + 1.0) / (tt + 4096.0))
                      - log10((cr + 1.0) / (tr + 4096.0)), 7)
                AS DECIMAL(20,7)) AS w
    FROM bt, tot
), sc AS (
    -- n cast to DECIMAL(10,0) mirrors the Spark side's
    -- precision-preserving product (see llm_ops.py — a bigint
    -- operand would make Spark reduce the sum's scale to 6)
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
           SUM(CAST(n AS DECIMAL(10,0)) * w) AS s
    FROM per_doc JOIN w USING (bucket)
    WHERE NOT is_target GROUP BY doc_id
)
SELECT doc_id, n_bigrams, CAST(s AS DOUBLE) AS dsir_logratio
FROM sc ORDER BY dsir_logratio DESC, doc_id ASC LIMIT 100
"""

# The corrupt rows are derived from the source table (every 50th
# order's price cell), so the oracle reproduces the triage without
# reading the staged file.
ORACLE["source_csv_permissive"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey % 50 <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_price_ok,
       CAST(SUM(CASE WHEN o_orderkey % 50 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN o_orderkey % 50 <> 0
                     THEN CAST(o_totalprice AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           AS price_total
FROM orders
"""

# Four exact running sums in a RANGE frame; doubles only in the final
# ratio, same IEEE op order as the engine.
from ..operators.windows import ewma_weights as _ewma_w  # noqa: E402

# truncated-EWMA: the lag weights come from the SAME Python helper
# the engine plan uses (shared-constant pattern, like the minhash
# coefficients), so the oracle can never drift from the plan. The
# left-fold 0.0 + c0 + c1 + ... matches the engine's Column fold
# order, making every double op IEEE-identical.
_EWMA_NUM = "0.0 + " + " + ".join(
    f"(CASE WHEN {'rev' if j == 0 else f'lag(rev, {j}) OVER w'} IS NOT "
    f"NULL THEN {wt!r} * "
    f"({'rev' if j == 0 else f'lag(rev, {j}) OVER w'}) ELSE 0.0 END)"
    for j, wt in enumerate(_ewma_w(alpha=0.3, k=8)))
_EWMA_DEN = "0.0 + " + " + ".join(
    f"(CASE WHEN {'rev' if j == 0 else f'lag(rev, {j}) OVER w'} IS NOT "
    f"NULL THEN {wt!r} ELSE 0.0 END)"
    for j, wt in enumerate(_ewma_w(alpha=0.3, k=8)))

ORACLE["window_ewma_smoothing"] = f"""
WITH daily AS (
    SELECT c.c_mktsegment, CAST(o.o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS rev
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
)
SELECT c_mktsegment, strftime(day, '%Y-%m-%d') AS day, rev,
       ROUND(({_EWMA_NUM})
             / ({_EWMA_DEN}), 4) AS rev_ewma
FROM daily
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY day)
"""

ORACLE["window_rolling_regression"] = """
WITH daily AS (
    SELECT c.c_mktsegment,
           CAST(o.o_orderdate AS DATE) AS day,
           SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev_dec
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
), d AS (
    SELECT c_mktsegment, day,
           CAST(date_diff('day', DATE '1992-01-01', day) AS BIGINT) AS x,
           rev_dec
    FROM daily
), sums AS (
    SELECT c_mktsegment, day, rev_dec,
           COUNT(*) OVER w AS n,
           CAST(SUM(x) OVER w AS BIGINT) AS sx,
           SUM(rev_dec) OVER w AS sy,
           SUM(x * rev_dec) OVER w AS sxy,
           CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
    FROM d
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY x
                 RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT c_mktsegment,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(rev_dec AS DOUBLE) AS rev,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
            ELSE NULL END AS slope_28d
FROM sums
WHERE day >= DATE '1997-01-01' AND day <= DATE '1997-12-31'
"""

ORACLE["text_quality_gopher"] = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), feats AS (
    SELECT doc_id,
           len(toks) AS n_words,
           CAST((2 * list_sum(list_transform(toks, x -> len(x)))
                 * 1000000 + len(toks)) // (2 * len(toks))
                AS DOUBLE) / 1000000.0 AS mean_word_len,
           (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END)
               AS n_stop_distinct,
           CAST((2 * len(list_filter(toks,
                      x -> regexp_full_match(x, '[a-z]+')))
                 * 1000000 + len(toks)) // (2 * len(toks))
                AS DOUBLE) / 1000000.0 AS alpha_ratio
    FROM t
)
SELECT doc_id,
       CAST(n_words AS INTEGER) AS n_words,
       mean_word_len,
       n_stop_distinct,
       alpha_ratio,
       n_words >= 20 AND n_words <= 100000 AS ok_words,
       mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_mean_len,
       n_stop_distinct >= 2 AS ok_stopwords,
       alpha_ratio >= 0.8 AS ok_alpha,
       (n_words >= 20 AND n_words <= 100000)
       AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       AND n_stop_distinct >= 2 AND alpha_ratio >= 0.8 AS passes
FROM feats
"""

# Same rounded-double cosine as the engine (round-6 absorbs the fold
# order); rank cut and tie-break identical.
ORACLE["sim_knn_graph"] = """
WITH pairs AS (
    SELECT a.label AS blk, a.vec_id AS src, b.vec_id AS nbr,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id <> b.vec_id
), ranked AS (
    SELECT src, nbr, sim,
           CAST(row_number() OVER (PARTITION BY src
                                   ORDER BY sim DESC, nbr ASC)
                AS INTEGER) AS rn
    FROM pairs
)
SELECT src, nbr, sim, rn FROM ranked WHERE rn <= 5
"""

# Oracle-checkable by construction (the sim_topk_cosine_pq pattern):
# the engine verifies the eigensolve against the data in-plan; the
# oracle recomputes the data-dependent count and states the bounds.
ORACLE["embedding_pca_project"] = """
SELECT 8 AS k,
       (SELECT COUNT(*) FROM embeddings) AS n_vectors,
       TRUE AS energy_ok,
       TRUE AS explained_ok
"""


def _bpe_oracle_sql(n_merges: int = 10) -> str:
    """Unrolled chained-CTE mirror of operators/text.bpe_train_merges:
    step i derives pair counts from vocab v{i-1}, picks the
    (max count, lexicographically first) pair, and applies the merge
    with the same padded-space literal replace. Generated, but still
    one static SQL string DuckDB runs."""
    parts = ["""
WITH w0 AS (
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
), v0 AS (
    SELECT word, cnt,
           ' ' || array_to_string(
               list_transform(range(1, len(word) + 1), i -> word[i]), ' ')
           || ' </w> ' AS seq
    FROM w0
)"""]
    for i in range(1, n_merges + 1):
        parts.append(f""", p{i} AS (
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM (
        SELECT cnt,
               unnest(list_transform(range(1, len(toks)),
                      j -> toks[j] || ' ' || toks[j + 1])) AS pair
        FROM (SELECT cnt, string_split(trim(seq), ' ') AS toks FROM v{i - 1})
    ) GROUP BY pair
), m{i} AS (
    SELECT pair, c FROM p{i} ORDER BY c DESC, pair ASC LIMIT 1
), v{i} AS (
    SELECT v.word, v.cnt,
           replace(v.seq, ' ' || m.pair || ' ',
                   ' ' || replace(m.pair, ' ', '') || ' ') AS seq
    FROM v{i - 1} v, m{i} m
)""")
    steps = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, pair, replace(pair, ' ', '') AS new_symbol, "
        f"c AS pair_count FROM m{i}" for i in range(1, n_merges + 1))
    return "".join(parts) + "\n" + steps


ORACLE["tokenizer_bpe_train"] = _bpe_oracle_sql(10)

# Staleness-bounded as-of: the windowed LEFT JOIN max is equivalent to
# "latest overall, nulled when stale" because any view older than the
# latest is staler than it.
ORACLE["join_asof_tolerance"] = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       max(v.ts) AS asof_ts,
       arg_max(v.value, v.ts) AS asof_value
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts, value FROM events
           WHERE event_type = 'view') v
  ON v.user_id = p.user_id AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 30 MINUTE
GROUP BY 1, 2, 3, 4
"""

ORACLE["dq_freshness_lag"] = """
WITH per AS (
    SELECT event_type, COUNT(*) AS n_events,
           MAX(epoch_us(ts)) AS max_ts_us
    FROM events GROUP BY event_type
), overall AS (SELECT MAX(max_ts_us) AS g FROM per)
SELECT event_type, n_events, max_ts_us, g - max_ts_us AS lag_us
FROM per, overall
"""

ORACLE["sample_balanced_classes"] = """
WITH n AS (
    SELECT MIN(cnt) AS min_n FROM (
        SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY label)
), ranked AS (
    SELECT label, vec_id,
           CAST(row_number() OVER (PARTITION BY label ORDER BY
               ('0x' || substr(md5('bal0:' || CAST(vec_id AS VARCHAR)),
                1, 15))::BIGINT ASC, vec_id ASC) AS INTEGER) AS rn
    FROM embeddings
)
SELECT label, vec_id, rn FROM ranked, n WHERE rn <= min_n
"""

# Exact interpolated medians (percentile_cont == Spark percentile);
# the rounded robust z absorbs the final-division ulp.
ORACLE["dq_outlier_mad"] = """
WITH ev AS (
    SELECT event_type, event_id, value FROM events
    WHERE value IS NOT NULL
), med AS (
    SELECT event_type, percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
               AS med
    FROM ev GROUP BY event_type
), dev AS (
    SELECT ev.event_type, ev.event_id, ev.value, med.med,
           abs(ev.value - med.med) AS adev
    FROM ev JOIN med USING (event_type)
), mad AS (
    SELECT event_type, percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)
               AS mad
    FROM dev GROUP BY event_type
)
SELECT dev.event_type, dev.event_id, dev.value,
       ROUND((dev.value - dev.med) / mad.mad, 6) AS rob_z
FROM dev JOIN mad USING (event_type)
WHERE mad.mad > 0 AND abs(dev.value - dev.med) > 5 * mad.mad
"""

# Q9 on the reduced schema: supply cost derived from the part key
# (documented deviation — no partsupp table in the testdata).
ORACLE["sql_profit_by_nation_year"] = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                     - l.l_quantity
                       * (CAST((l.l_partkey % 1000) + 1 AS DOUBLE) * 0.1)
                AS DECIMAL(18,4))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""

# The rebuild's mutations are keyed functions of the source, so the
# oracle classifies without reading the snapshots. added = shifted
# copies of every 11th key; removed = every 13th; changed = every 7th
# surviving the removal with a price that actually moved.
ORACLE["maintenance_snapshot_diff"] = """
WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
classified AS (
    SELECT CASE WHEN o_orderkey % 13 = 0 THEN 'removed'
                WHEN o_orderkey % 7 = 0
                     AND o_totalprice * 1.05 <> o_totalprice
                     THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice
                WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.05
                ELSE o_totalprice END AS p
    FROM base
    UNION ALL
    SELECT 'added', o_totalprice * 2.0
    FROM base WHERE o_orderkey % 11 = 0
)
SELECT change_type, COUNT(*) AS n_rows,
       CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM classified GROUP BY change_type
"""

# Nearest view on either side; the (|dt|, ts, event_id) composite
# tie-break mirrors the engine's min_by struct ordering exactly.
ORACLE["join_nearest_event"] = """
WITH p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), v AS (
    SELECT user_id, ts AS v_ts, event_id AS v_eid FROM events
    WHERE event_type = 'view'
), cand AS (
    SELECT p.event_id, v.v_ts,
           abs(epoch_us(v.v_ts) - epoch_us(p.ts)) AS d,
           row_number() OVER (PARTITION BY p.event_id
               ORDER BY abs(epoch_us(v.v_ts) - epoch_us(p.ts)) ASC,
                        v.v_ts ASC, v.v_eid ASC) AS rn
    FROM p JOIN v ON v.user_id = p.user_id
)
SELECT p.event_id, p.user_id, p.ts,
       c.v_ts AS nearest_view_ts, c.d AS diff_us,
       CASE WHEN c.v_ts IS NULL THEN NULL
            WHEN c.v_ts <= p.ts THEN 'prev' ELSE 'next' END AS direction
FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c USING (event_id)
"""

# Prices travel as integer cents (floor(x*100+0.5), identical IEEE on
# both engines) — the round trip is exact by construction.
ORACLE["source_fixed_width"] = """
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents_total,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders GROUP BY o_orderstatus
"""

# Components (same recursive CTE as dedup_cluster_components) plus
# per-component size and the keep/drop verdict.
ORACLE["dedup_canonical_map"] = f"""
WITH comp AS ({ORACLE["dedup_cluster_components"]}),
sizes AS (
    SELECT component_id, COUNT(*) AS n_members FROM comp
    GROUP BY component_id
)
SELECT comp.doc_id, comp.component_id AS canonical_id,
       comp.doc_id = comp.component_id AS is_canonical,
       sizes.n_members
FROM comp JOIN sizes USING (component_id)
"""

# Deterministic negative draw: offset = 1 + md5_60 mod (N-1) — never
# the positive, engine-identical.
ORACLE["pairs_contrastive_sampling"] = """
WITH n AS (SELECT COUNT(*) AS n_vec FROM embeddings),
pairs AS (
    SELECT d.doc_id,
           d.doc_id AS pos_vec_id,
           (d.doc_id + 1 +
            (('0x' || substr(md5('neg0:' || CAST(d.doc_id AS VARCHAR)),
              1, 15))::BIGINT % (n.n_vec - 1))) % n.n_vec AS neg_vec_id
    FROM documents d, n
)
SELECT p.doc_id, p.pos_vec_id, p.neg_vec_id,
       ep.label AS pos_label, en.label AS neg_label
FROM pairs p
JOIN embeddings ep ON ep.vec_id = p.pos_vec_id
JOIN embeddings en ON en.vec_id = p.neg_vec_id
"""

# Plain COUNT(DISTINCT) proves the bitmap bucket algebra exact.
ORACLE["agg_bitmap_distinct"] = """
SELECT c.c_mktsegment,
       COUNT(DISTINCT e.user_id) AS n_distinct_users,
       COUNT(DISTINCT (CASE WHEN e.user_id <= 0
                             THEN (e.user_id // 32768)
                             ELSE ((e.user_id - 1) // 32768) + 1 END))
           AS n_buckets
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""

ORACLE["stream_sliding_topk"] = """
WITH shifted AS (
    SELECT ts, event_type, unnest([0, 300]) AS off FROM events
), counts AS (
    SELECT CAST(floor((epoch(ts) - off) / 600) * 600 + off AS BIGINT)
               AS bucket_start_epoch,
           event_type, COUNT(*) AS n_events
    FROM shifted GROUP BY 1, 2
), ranked AS (
    SELECT bucket_start_epoch, event_type, n_events,
           CAST(row_number() OVER (PARTITION BY bucket_start_epoch
                ORDER BY n_events DESC, event_type ASC) AS INTEGER) AS rn
    FROM counts
)
SELECT bucket_start_epoch, event_type, n_events, rn
FROM ranked WHERE rn <= 2
"""

# Transpose oracle: explicit conditional pivot per metric row; the
# five TPC-H segments are a fixed domain, stated literally.
ORACLE["transform_transpose"] = """
WITH s AS (
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS bal_cents
    FROM customer GROUP BY c_mktsegment
)
SELECT 'n_customers' AS key,
       MAX(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN n_customers END)
           AS "AUTOMOBILE",
       MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN n_customers END)
           AS "BUILDING",
       MAX(CASE WHEN c_mktsegment = 'FURNITURE' THEN n_customers END)
           AS "FURNITURE",
       MAX(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN n_customers END)
           AS "HOUSEHOLD",
       MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN n_customers END)
           AS "MACHINERY"
FROM s
UNION ALL
SELECT 'bal_cents',
       MAX(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN bal_cents END),
       MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN bal_cents END),
       MAX(CASE WHEN c_mktsegment = 'FURNITURE' THEN bal_cents END),
       MAX(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN bal_cents END),
       MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN bal_cents END)
FROM s
"""

ORACLE["udf_grouped_apply_in_arrow"] = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS bal_cents
FROM customer GROUP BY c_mktsegment
"""

# Calibration report: the signature CTE is the dedup_minhash_lsh
# mirror verbatim; the estimate is slot-agreement / 16.
ORACLE["dedup_lsh_calibration"] = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM toks
), shf AS (
    SELECT doc_id,
           list_distinct(list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824)) AS hs
    FROM sh WHERE len(shingles) > 0
), sig AS (
    SELECT doc_id, hs,
           list_transform(range(0, 16),
               j -> list_min(list_transform(hs,
                    h -> ([{",".join(map(str, _A16))}][j+1] * h
                          + [{",".join(map(str, _B16))}][j+1]) % 1073741789))) AS mh
    FROM shf
), banded AS (""" + """
    SELECT doc_id,
           unnest(range(0, 4)) AS band,
           unnest(list_transform(range(0, 4),
               b -> md5(array_to_string(mh[b*4+1 : b*4+4], ',')))) AS band_hash
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), verified AS (
    SELECT id_a, id_b,
           ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                 / len(list_distinct(x.hs || y.hs)), 6) AS jaccard
    FROM cand
    JOIN shf x ON x.doc_id = cand.id_a
    JOIN shf y ON y.doc_id = cand.id_b
    WHERE ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                / len(list_distinct(x.hs || y.hs)), 6) >= 0.5
)
SELECT v.id_a, v.id_b, v.jaccard,
       ROUND(CAST(len(list_filter(range(1, 17),
                      j -> xa.mh[j] = xb.mh[j])) AS DOUBLE) / 16.0, 6)
           AS est_jaccard,
       ROUND(abs(ROUND(CAST(len(list_filter(range(1, 17),
                      j -> xa.mh[j] = xb.mh[j])) AS DOUBLE) / 16.0, 6)
                 - v.jaccard), 6) AS abs_err
FROM verified v
JOIN sig xa ON xa.doc_id = v.id_a
JOIN sig xb ON xb.doc_id = v.id_b
"""

# Bounded-sample calibration tier: the SAME program over the
# deterministic md5(doc_id) % 3 == 0 document sample (the Spark
# side's pmod(md5_long(doc_id), 3) mirror). Injected into the one
# corpus scan so every downstream CTE sees only sampled docs.
assert ORACLE["dedup_lsh_calibration"].count("FROM documents") == 1
ORACLE["dedup_lsh_calibration_sampled"] = \
    ORACLE["dedup_lsh_calibration"].replace(
        "FROM documents",
        "FROM documents WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR"
        ")), 1, 15))::BIGINT % 3 = 0", 1)

# Sliding-window chunker: 40-token chunks, stride 30; DuckDB's
# inclusive 1-based slice mirrors Spark's (start, length) slice.
ORACLE["doc_chunking_overlap"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), st AS (
    SELECT doc_id, t,
           unnest(range(0, greatest(CAST(ceil((len(t) - 40) / 30.0)
                                         AS INTEGER), 0) + 1)) AS cid
    FROM toks
)
SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
       CAST(len(t[cid * 30 + 1 : cid * 30 + 40]) AS INTEGER) AS n_tokens,
       array_to_string(t[cid * 30 + 1 : cid * 30 + 40], ' ') AS chunk_text
FROM st
WHERE len(t[cid * 30 + 1 : cid * 30 + 40]) > 0
"""

# Top-200 frequency vocabulary (count desc, token asc), OOV -> 0;
# parallel unnest zips token with position so the id sequence
# preserves document order.
ORACLE["text_encode_vocab_ids"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), counts AS (
    SELECT token, COUNT(*) AS cnt FROM (
        SELECT unnest(t) AS token FROM toks) GROUP BY token
), vocab AS (
    SELECT token, vid FROM (
        SELECT token,
               CAST(row_number() OVER (ORDER BY cnt DESC, token ASC)
                    AS INTEGER) AS vid
        FROM counts)
    WHERE vid <= 200
), ex AS (
    SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
           unnest(t) AS tok
    FROM toks
), joined AS (
    SELECT e.doc_id, e.pos, COALESCE(v.vid, 0) AS vid
    FROM ex e LEFT JOIN vocab v ON v.token = e.tok
)
SELECT j.doc_id,
       CAST(len(tk.t) AS INTEGER) AS n_tokens,
       CAST(SUM(CASE WHEN j.vid = 0 THEN 1 ELSE 0 END) AS INTEGER)
           AS n_oov,
       string_agg(CAST(j.vid AS VARCHAR), ',' ORDER BY j.pos) AS id_seq
FROM joined j JOIN toks tk ON tk.doc_id = j.doc_id
GROUP BY j.doc_id, len(tk.t)
"""

# Lossless round trip through the Python DataSourceWriter: the
# read-back aggregate equals the source aggregate.
ORACLE["sink_python_datasource"] = """
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents_total
FROM orders GROUP BY o_orderstatus
"""

# The streaming Python-DataSource sink's committed read-back must
# equal the batch aggregate — same oracle.
ORACLE["sink_python_stream_datasource"] = ORACLE["sink_python_datasource"]

# Quintile boundaries are identical exact interpolated percentiles on
# both engines; ties at a boundary fall to the lower bucket via the
# same strict comparison.
ORACLE["events_rfm_segmentation"] = """
WITH per_user AS (
    SELECT user_id,
           MAX(CAST(ts AS DATE)) AS last_day,
           COUNT(*) AS n_events,
           ROUND(CAST(COALESCE(SUM(CAST(CASE WHEN event_type = 'purchase'
                 THEN value END AS DECIMAL(18,4))),
                 CAST(0 AS DECIMAL(18,4))) AS DOUBLE), 4) AS monetary
    FROM events GROUP BY user_id
), anch AS (
    SELECT MAX(last_day) AS anchor FROM per_user
), scored AS (
    SELECT u.user_id,
           CAST(datediff('day', u.last_day, a.anchor) AS INTEGER)
               AS recency_days,
           u.n_events, u.monetary
    FROM per_user u, anch a
), th AS (
    SELECT quantile_cont(recency_days, 0.2) AS r1,
           quantile_cont(recency_days, 0.4) AS r2,
           quantile_cont(recency_days, 0.6) AS r3,
           quantile_cont(recency_days, 0.8) AS r4,
           quantile_cont(n_events, 0.2) AS f1,
           quantile_cont(n_events, 0.4) AS f2,
           quantile_cont(n_events, 0.6) AS f3,
           quantile_cont(n_events, 0.8) AS f4,
           quantile_cont(monetary, 0.2) AS m1,
           quantile_cont(monetary, 0.4) AS m2,
           quantile_cont(monetary, 0.6) AS m3,
           quantile_cont(monetary, 0.8) AS m4
    FROM scored
)
SELECT s.user_id, s.recency_days, s.n_events, s.monetary,
       CAST(1 + (CASE WHEN s.recency_days > t.r1 THEN 1 ELSE 0 END)
              + (CASE WHEN s.recency_days > t.r2 THEN 1 ELSE 0 END)
              + (CASE WHEN s.recency_days > t.r3 THEN 1 ELSE 0 END)
              + (CASE WHEN s.recency_days > t.r4 THEN 1 ELSE 0 END)
            AS INTEGER) AS r_bucket,
       CAST(1 + (CASE WHEN s.n_events > t.f1 THEN 1 ELSE 0 END)
              + (CASE WHEN s.n_events > t.f2 THEN 1 ELSE 0 END)
              + (CASE WHEN s.n_events > t.f3 THEN 1 ELSE 0 END)
              + (CASE WHEN s.n_events > t.f4 THEN 1 ELSE 0 END)
            AS INTEGER) AS f_bucket,
       CAST(1 + (CASE WHEN s.monetary > t.m1 THEN 1 ELSE 0 END)
              + (CASE WHEN s.monetary > t.m2 THEN 1 ELSE 0 END)
              + (CASE WHEN s.monetary > t.m3 THEN 1 ELSE 0 END)
              + (CASE WHEN s.monetary > t.m4 THEN 1 ELSE 0 END)
            AS INTEGER) AS m_bucket
FROM scored s, th t
"""

ORACLE["dq_equidepth_histogram"] = """
WITH ev AS (
    SELECT value FROM events WHERE value IS NOT NULL
), b AS (
    SELECT quantile_cont(value, 0.2) AS b1, quantile_cont(value, 0.4) AS b2,
           quantile_cont(value, 0.6) AS b3, quantile_cont(value, 0.8) AS b4
    FROM ev
)
SELECT (CASE WHEN value > b1 THEN 1 ELSE 0 END
        + CASE WHEN value > b2 THEN 1 ELSE 0 END
        + CASE WHEN value > b3 THEN 1 ELSE 0 END
        + CASE WHEN value > b4 THEN 1 ELSE 0 END) AS bucket,
       COUNT(*) AS n_rows,
       ROUND(MIN(value), 6) AS lo,
       ROUND(MAX(value), 6) AS hi
FROM ev, b GROUP BY 1
"""

# The catalog's analyzed row count must equal the actual count.
ORACLE["maintenance_analyze_stats"] = """
SELECT COUNT(*) AS n_rows_stats, COUNT(*) AS n_rows_actual,
       TRUE AS stats_match
FROM orders
"""

# Windowed exact median over the daily pre-aggregate; interpolation
# of identical doubles is identical, round-4 absorbs nothing real.
ORACLE["window_rolling_median"] = """
WITH daily AS (
    SELECT c.c_mktsegment,
           CAST(o.o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS rev
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
), d AS (
    SELECT c_mktsegment, day,
           CAST(date_diff('day', DATE '1992-01-01', day) AS BIGINT) AS x,
           rev
    FROM daily
)
SELECT c_mktsegment,
       strftime(day, '%Y-%m-%d') AS day,
       rev,
       ROUND(quantile_cont(rev, 0.5) OVER (
           PARTITION BY c_mktsegment ORDER BY x
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med_7d
FROM d
QUALIFY day >= DATE '1997-01-01' AND day <= DATE '1997-12-31'
"""

# Same sessionization CTE as sessionize_inactivity_gap; purchases
# credit their session's first event type.
ORACLE["attribution_first_touch"] = """
WITH tagged AS (
    SELECT user_id, event_id, event_type, ts, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000 THEN 1
                WHEN lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL THEN 1
                ELSE 0 END AS brk
    FROM events
), sess AS (
    SELECT user_id, event_id, event_type, ts, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
    FROM tagged
), entry AS (
    SELECT user_id, event_id, event_type, value,
           first_value(event_type) OVER (
               PARTITION BY user_id, session_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS entry_type
    FROM sess
)
SELECT entry_type, COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM entry WHERE event_type = 'purchase'
GROUP BY entry_type
"""

# The polymorphic UDTF's trigram expansion mirrored with list ops.
ORACLE["udtf_polymorphic_ngrams"] = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    WHERE doc_id < 100
), g AS (
    SELECT doc_id,
           unnest(range(1, len(toks) - 1)) AS p
    FROM t WHERE len(toks) >= 3
)
SELECT g.doc_id,
       COUNT(*) AS n_trigrams,
       MIN(t.toks[g.p]) AS first_w1,
       MAX(t.toks[g.p + 2]) AS last_w3
FROM g JOIN t ON t.doc_id = g.doc_id
GROUP BY g.doc_id
"""


ORACLE["dedup_duplicate_spans"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
starts AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
    FROM toks
),
grams AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[i : i + 7], ' ') AS gram
    FROM starts
),
dup AS (
    -- >= 2 distinct docs, stated as min != max (same one-pass
    -- aggregate shape the Spark side uses)
    SELECT gram FROM grams
    GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)
),
hits AS (
    -- interval merge (start gap <= 8 keeps one island): a start at
    -- pos covers [pos, pos+8), so only a gap > 8 leaves an
    -- uncovered position between islands
    SELECT g.doc_id, g.pos,
           CASE WHEN g.pos - lag(g.pos) OVER (PARTITION BY g.doc_id
                                              ORDER BY g.pos) > 8
                THEN 1 ELSE 0 END AS brk
    FROM grams g JOIN dup USING (gram)
),
grouped AS (
    SELECT doc_id, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS grp
    FROM hits
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
    FROM grouped GROUP BY doc_id, grp
)
SELECT doc_id, CAST(s AS INTEGER) AS span_start,
       CAST(e AS INTEGER) AS span_end,
       CAST(e - s AS INTEGER) AS n_tokens
FROM spans
"""


# The fingerprint tiers' outputs equal the exact tiers' unless two
# distinct 8-grams collide on BOTH xxhash64 seeds (~g^2/2^129) — each
# is held to the SAME ground-truth SQL as its exact sibling.
ORACLE["dedup_duplicate_spans_fp"] = ORACLE["dedup_duplicate_spans"]


ORACLE["dedup_spans_rewrite"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
starts AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
    FROM toks
),
grams AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[i : i + 7], ' ') AS gram
    FROM starts
),
firsts AS (
    -- corpus-first occurrence as min of the encoded key
    -- doc_id * 2^20 + pos (lexicographic (doc_id, pos) for docs
    -- under 2^20 tokens) — same encoding the Spark side uses so the
    -- aggregate stays a plain hash aggregate there
    SELECT gram, MIN(doc_id) AS lo, MAX(doc_id) AS hi,
           MIN(doc_id * 1048576 + pos) AS f_occ
    FROM grams GROUP BY gram
),
removals AS (
    SELECT g.doc_id, g.pos,
           g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id
                                      ORDER BY g.pos) AS grp
    FROM grams g JOIN firsts fs USING (gram)
    WHERE fs.lo <> fs.hi
      AND g.doc_id * 1048576 + g.pos <> fs.f_occ
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
    FROM removals GROUP BY doc_id, grp
),
tok_rows AS (
    SELECT doc_id, unnest(generate_series(1, len(t))) - 1 AS ti, t
    FROM toks
),
cov AS (
    SELECT tr.doc_id, tr.ti, tr.t[tr.ti + 1] AS w,
           MAX(CASE WHEN sp.s IS NOT NULL THEN 1 ELSE 0 END) AS c
    FROM tok_rows tr LEFT JOIN spans sp
      ON tr.doc_id = sp.doc_id AND tr.ti >= sp.s AND tr.ti < sp.e
    GROUP BY tr.doc_id, tr.ti, w
)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_orig,
       CAST(SUM(1 - c) AS INTEGER) AS n_kept,
       COALESCE(STRING_AGG(w, ' ' ORDER BY ti) FILTER (WHERE c = 0), '')
           AS text_kept
FROM cov GROUP BY doc_id
"""

ORACLE["dedup_spans_rewrite_fp"] = ORACLE["dedup_spans_rewrite"]


def _bpe_apply_oracle_sql(n_merges: int = 10) -> str:
    """APPLY mirror: reuse the trainer's chained-CTE vocabulary
    evolution (v0..vN hold every distinct word's merged symbol
    sequence after step N), then count symbols per document through
    a word join — the same vocabulary-level application the Spark
    operator performs."""
    base = _bpe_oracle_sql(n_merges)
    # _bpe_oracle_sql ends with the UNION ALL of merge rows; keep only
    # the WITH chain by cutting at the first top-level SELECT
    # (CTE-internal SELECTs are indented, so they don't match)
    ctes = base[:base.index("\nSELECT ")]
    return ctes + f"""
, dw AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
)
SELECT dw.doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_words,
       CAST(SUM(len(string_split(trim(v.seq), ' '))) AS INTEGER)
           AS n_bpe_tokens
FROM dw JOIN v{n_merges} v USING (word)
GROUP BY dw.doc_id
"""


ORACLE["tokenizer_bpe_apply"] = _bpe_apply_oracle_sql(10)

# --- pipeline_crawl_refresh: the four component keys' SQL programs
# composed over one CTE chain (bloom prefilter == plain anti-join on
# md5 by the no-false-negative law; near-dup == the incremental
# banded-minhash mirror with is_new carried through; span rewrite ==
# the dedup_spans_rewrite mirror over index ∪ survivors; gate == the
# text_quality_gopher mirror over text_kept). Minhash coefficients
# are the shared _A16/_B16 constants — generated once, embedded in
# both engines' programs.
ORACLE["pipeline_crawl_refresh"] = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
), batch AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
), stage1 AS (
    -- bloom prefilter + exact confirm == anti-join on the text hash
    SELECT b.doc_id, b.text FROM batch b
    WHERE md5(b.text) NOT IN (SELECT md5(text) FROM corpus)
), uni AS (
    SELECT doc_id, text, TRUE AS is_new FROM stage1
    UNION ALL
    SELECT doc_id, text, FALSE AS is_new FROM corpus
), toks0 AS (
    SELECT doc_id, is_new, string_split(text, ' ') AS t FROM uni
), sh AS (
    SELECT doc_id, is_new,
           list_distinct(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM toks0
), shf AS (
    SELECT doc_id, is_new,
           list_distinct(list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824)) AS hs
    FROM sh WHERE len(shingles) > 0
), sig AS (
    SELECT doc_id, is_new, hs,
           list_transform(range(0, 16),
               j -> list_min(list_transform(hs,
                    h -> ([{','.join(map(str, _A16))}][j+1] * h
                          + [{','.join(map(str, _B16))}][j+1]) % 1073741789))) AS mh
    FROM shf
), banded AS (
    SELECT doc_id, is_new,
           unnest(range(0, 4)) AS band,
           unnest(list_transform(range(0, 4),
               b -> md5(array_to_string(mh[b*4+1 : b*4+4], ',')))) AS band_hash
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_corpus
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash
     AND a.is_new AND NOT b.is_new
), neardup AS (
    SELECT DISTINCT id_new FROM cand
    JOIN shf x ON x.doc_id = cand.id_new
    JOIN shf y ON y.doc_id = cand.id_corpus
    WHERE ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                / len(list_distinct(x.hs || y.hs)), 6) >= 0.5
), stage2 AS (
    SELECT doc_id, text FROM stage1
    WHERE doc_id NOT IN (SELECT id_new FROM neardup)
), rwset AS (
    SELECT doc_id, text FROM corpus
    UNION ALL
    SELECT doc_id, text FROM stage2
), toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM rwset
), starts AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
    FROM toks
), grams AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[i : i + 7], ' ') AS gram
    FROM starts
), firsts AS (
    SELECT gram, MIN(doc_id) AS lo, MAX(doc_id) AS hi,
           MIN(doc_id * 1048576 + pos) AS f_occ
    FROM grams GROUP BY gram
), removals AS (
    SELECT g.doc_id, g.pos,
           g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id
                                      ORDER BY g.pos) AS grp
    FROM grams g JOIN firsts fs USING (gram)
    WHERE fs.lo <> fs.hi
      AND g.doc_id * 1048576 + g.pos <> fs.f_occ
), spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
    FROM removals GROUP BY doc_id, grp
), tok_rows AS (
    SELECT doc_id, unnest(generate_series(1, len(t))) - 1 AS ti, t
    FROM toks
), cov AS (
    SELECT tr.doc_id, tr.ti, tr.t[tr.ti + 1] AS w,
           MAX(CASE WHEN sp.s IS NOT NULL THEN 1 ELSE 0 END) AS c
    FROM tok_rows tr LEFT JOIN spans sp
      ON tr.doc_id = sp.doc_id AND tr.ti >= sp.s AND tr.ti < sp.e
    GROUP BY tr.doc_id, tr.ti, w
), rw AS (
    SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_orig,
           CAST(SUM(1 - c) AS INTEGER) AS n_kept,
           COALESCE(STRING_AGG(w, ' ' ORDER BY ti) FILTER (WHERE c = 0), '')
               AS text_kept
    FROM cov GROUP BY doc_id
), new_rw AS (
    SELECT r.doc_id, r.n_orig, r.n_kept,
           string_split(r.text_kept, ' ') AS toks
    FROM rw r JOIN stage2 s USING (doc_id)
), feats AS (
    SELECT doc_id, n_orig, n_kept,
           len(toks) AS n_words,
           CAST((2 * list_sum(list_transform(toks, x -> len(x)))
                 * 1000000 + len(toks)) // (2 * len(toks))
                AS DOUBLE) / 1000000.0 AS mean_word_len,
           (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END)
               AS n_stop_distinct,
           CAST((2 * len(list_filter(toks,
                      x -> regexp_full_match(x, '[a-z]+')))
                 * 1000000 + len(toks)) // (2 * len(toks))
                AS DOUBLE) / 1000000.0 AS alpha_ratio
    FROM new_rw
)
SELECT doc_id, n_orig, n_kept,
       (n_words >= 20 AND n_words <= 100000)
       AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       AND n_stop_distinct >= 2 AND alpha_ratio >= 0.8 AS gate_pass
FROM feats
"""

# --- round 7: SemDeDup manifest, k-center coreset, MMR rerank --------------

# dedup_semantic_cells: within-cell pairwise on the proven
# ROUND(list_cosine_similarity, 6) kernel; drop = any smaller-id
# same-cell match >= 0.3; manifest over every vector.
ORACLE["dedup_semantic_cells"] = """
WITH drops AS (
    SELECT DISTINCT a.vec_id AS id
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND b.vec_id < a.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.3
)
SELECT e.vec_id, e.label,
       (e.vec_id NOT IN (SELECT id FROM drops)) AS kept
FROM embeddings e
"""


def _kcenter_oracle_sql(k: int = 8, seed: int = 0) -> str:
    """Unrolled greedy farthest-point CTE chain mirroring
    operators/similarity.kcenter_coreset: milli-quantized integer
    vectors, exact integer squared distances, argmax ties on
    ascending id — every comparison integer, zero float surface."""
    d2 = ("list_sum(list_transform(range(1, len(p.q) + 1), "
          "i -> (p.q[i] - s{j}.q[i]) * (p.q[i] - s{j}.q[i])))")
    ctes = [
        "pts AS (SELECT vec_id, list_transform(embedding::DOUBLE[], "
        "x -> floor(x * 1000 + 0.5)::BIGINT) AS q FROM embeddings)",
        f"s0 AS (SELECT vec_id, q FROM pts WHERE vec_id = {seed})",
    ]
    selects = ["SELECT CAST(0 AS INTEGER) AS sel_rank, vec_id, "
               "CAST(0 AS BIGINT) AS min_d2 FROM s0"]
    for r in range(1, k):
        dists = [d2.format(j=j) for j in range(r)]
        mind = dists[0] if r == 1 else "LEAST(" + ", ".join(dists) + ")"
        froms = ", ".join(["pts p"] + [f"s{j}" for j in range(r)])
        excl = " AND ".join(f"p.vec_id <> s{j}.vec_id" for j in range(r))
        ctes.append(
            f"s{r} AS (SELECT p.vec_id, p.q, CAST({mind} AS BIGINT) "
            f"AS min_d2 FROM {froms} WHERE {excl} "
            "ORDER BY min_d2 DESC, p.vec_id ASC LIMIT 1)")
        selects.append(f"SELECT CAST({r} AS INTEGER) AS sel_rank, "
                       f"vec_id, min_d2 FROM s{r}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


ORACLE["select_kcenter_coreset"] = _kcenter_oracle_sql(8, 0)


def _mmr_oracle_sql(shortlist: int = 20, k: int = 5,
                    lam_pct: int = 70, seed: int = 0) -> str:
    """Unrolled greedy MMR CTE chain mirroring
    operators/similarity.mmr_rerank: cosines quantize to integer
    micro-units via the shared floor(x*1e6 + 0.5) idiom at the
    moment they are computed; the score is pure integer arithmetic
    (lam*rel_u - (100-lam)*max_div_u), ties on ascending id."""
    cu = ("floor(list_cosine_similarity({a}, {b}) * 1000000 + 0.5)"
          "::BIGINT")
    ctes = [
        f"q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings "
        f"WHERE vec_id = {seed})",
        "short AS (SELECT p.vec_id, p.embedding::DOUBLE[] AS v, "
        + cu.format(a="p.embedding::DOUBLE[]", b="q.v")
        + f" AS rel_u FROM embeddings p, q WHERE p.vec_id <> {seed} "
        f"ORDER BY rel_u DESC, p.vec_id ASC LIMIT {shortlist})",
        f"m0 AS (SELECT vec_id, v, {lam_pct} * rel_u AS score, rel_u "
        "FROM short ORDER BY score DESC, vec_id ASC LIMIT 1)",
    ]
    selects = ["SELECT CAST(0 AS INTEGER) AS mmr_rank, vec_id, "
               "CAST(score AS BIGINT) AS score_micro FROM m0"]
    for r in range(1, k):
        divs = [cu.format(a="s.v", b=f"m{j}.v") for j in range(r)]
        mx = divs[0] if r == 1 else "GREATEST(" + ", ".join(divs) + ")"
        froms = ", ".join(["short s"] + [f"m{j}" for j in range(r)])
        excl = " AND ".join(f"s.vec_id <> m{j}.vec_id" for j in range(r))
        ctes.append(
            f"m{r} AS (SELECT s.vec_id, s.v, {lam_pct} * s.rel_u - "
            f"{100 - lam_pct} * {mx} AS score, s.rel_u "
            f"FROM {froms} WHERE {excl} "
            "ORDER BY score DESC, s.vec_id ASC LIMIT 1)")
        selects.append(f"SELECT CAST({r} AS INTEGER) AS mmr_rank, "
                       f"vec_id, CAST(score AS BIGINT) AS score_micro "
                       f"FROM m{r}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


ORACLE["sim_mmr_rerank"] = _mmr_oracle_sql(20, 5, 70, 0)

# events_sequence_patterns: per-user initials string ordered by
# (ts, event_id) — the shared total order every sessionization
# oracle uses; counts are non-overlapping regex matches (closure
# alphabet excludes the terminator, so RE2 and Java regex pick
# identical spans).
ORACLE["events_sequence_patterns"] = """
WITH seqs AS (
    SELECT user_id,
           STRING_AGG(substr(event_type, 1, 1), ''
                      ORDER BY ts, event_id) AS seq
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS INTEGER) AS seq_len,
       CAST(len(regexp_extract_all(seq, 'v[cv]*p')) AS INTEGER)
           AS n_view_to_purchase,
       CAST(len(regexp_extract_all(seq, 'e+')) AS INTEGER)
           AS n_error_bursts,
       substr(seq, 1, 1) AS first_type
FROM seqs
"""

# --- classifier-eval / leakage-audit tier (plans/eval_queries.py) ----------

# Shared score/label: English-stopword density in ppm (integer
# floor-div, the select_token_budget formula) vs lang='en'.
_EVAL_SCORED_SQL = """
    SELECT doc_id, (lang = 'en') AS pos,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
    FROM documents
"""

# Tie-corrected rank-sum AUC over the score histogram; the final
# 6-decimal ratio mirrors round_ratio6_dec's positive-operand
# integers on HUGEINT: q = (2*num*1e6 + den) // (2*den), emitted as
# q/1e6 — exact for any bigint num/den, matching the Spark side's
# DECIMAL(38,0) DIV (r7 advisory: the double-DIV emulation capped
# auc_num2 at ~4.5e9).
ORACLE["eval_auc_rank"] = f"""
WITH s AS ({_EVAL_SCORED_SQL}),
h AS (
    SELECT score,
           SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_s,
           SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS neg_s
    FROM s GROUP BY 1
), c AS (
    SELECT pos_s, neg_s,
           COALESCE(SUM(neg_s) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumneg_below
    FROM h
), t AS (
    SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           CAST(SUM(neg_s) AS BIGINT) AS n_neg,
           CAST(SUM(pos_s * (2 * cumneg_below + neg_s)) AS BIGINT)
               AS auc_num2
    FROM c
)
SELECT n_pos, n_neg, auc_num2,
       CAST((2 * CAST(auc_num2 AS HUGEINT) * 1000000
             + 2 * CAST(n_pos AS HUGEINT) * n_neg)
            // (2 * (2 * CAST(n_pos AS HUGEINT) * n_neg))
            AS DOUBLE) / 1000000 AS auc
FROM t
"""

ORACLE["eval_calibration_bins"] = f"""
WITH s AS ({_EVAL_SCORED_SQL}),
g AS (
    SELECT LEAST(score // 100000, 9) AS bin,
           COUNT(*) AS n,
           SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
           SUM(score) AS sum_score
    FROM s GROUP BY 1
)
SELECT CAST(bin AS INTEGER) AS bin,
       CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST((2 * n_pos * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000
           AS pos_rate,
       CAST((2 * sum_score * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000
           AS mean_score_ppm
FROM g ORDER BY bin
"""

# Cluster-aware split: same component graph as dedup_canonical_map,
# same md5 80/10/10 bucket as split_train_test, keyed on the
# canonical (singletons = own id).
ORACLE["split_leakage_safe"] = f"""
WITH comp AS ({ORACLE["dedup_cluster_components"]}),
base AS (
    SELECT d.doc_id,
           COALESCE(c.component_id, d.doc_id) AS canonical_id
    FROM documents d LEFT JOIN comp c USING (doc_id)
), t AS (
    SELECT canonical_id,
           CASE WHEN cb < 80 THEN 'train'
                WHEN cb < 90 THEN 'valid' ELSE 'test' END AS split,
           CASE WHEN nb < 80 THEN 'train'
                WHEN nb < 90 THEN 'valid' ELSE 'test' END AS naive
    FROM (SELECT canonical_id,
                 ('0x' || substr(md5(CAST(canonical_id AS VARCHAR)),
                  1, 15))::BIGINT % 100 AS cb,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 15))::BIGINT % 100 AS nb
          FROM base)
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT canonical_id) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN naive <> split THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rescued
FROM t GROUP BY 1
"""

# Funnel = prefix conjunctions of independent per-doc flags over ONE
# pass; the dedup flag is canonical-keep on the near-dup graph.
ORACLE["pipeline_filter_funnel"] = f"""
WITH comp AS ({ORACLE["dedup_cluster_components"]}),
f AS (
    SELECT CAST(d.n_chars AS BIGINT) AS n_chars,
           d.lang IN ('en', 'es', 'de', 'fr') AS g1,
           d.n_chars BETWEEN 100 AND 20000 AS g2,
           ((CAST(len(list_filter(string_split(d.text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
             // CAST(len(string_split(d.text, ' ')) AS BIGINT)) >= 20000
               AS g3,
           COALESCE(c.component_id, d.doc_id) = d.doc_id AS g4
    FROM documents d LEFT JOIN comp c USING (doc_id)
), a AS (
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n0,
        CAST(SUM(n_chars) AS BIGINT) AS c0,
        CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN g1 THEN n_chars ELSE 0 END) AS BIGINT) AS c1,
        CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN g1 AND g2 THEN n_chars ELSE 0 END) AS BIGINT)
            AS c2,
        CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT)
            AS n3,
        CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN n_chars ELSE 0 END)
            AS BIGINT) AS c3,
        CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n4,
        CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN n_chars ELSE 0 END)
            AS BIGINT) AS c4
    FROM f
)
SELECT 0 AS stage_idx, 'raw' AS stage, n0 AS n_docs, c0 AS n_chars FROM a
UNION ALL
SELECT 1, 'lang_gate', n1, c1 FROM a
UNION ALL
SELECT 2, 'length_gate', n2, c2 FROM a
UNION ALL
SELECT 3, 'quality_gate', n3, c3 FROM a
UNION ALL
SELECT 4, 'near_dup_canonical', n4, c4 FROM a
"""

# ORC roundtrip must be lossless: aggregate the ORIGINAL rows.
ORACLE["sink_orc_roundtrip"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_price
FROM lineitem WHERE l_returnflag = 'R'
"""

# RHO-style excess loss: one vocab CTE carries both LMs; each log10
# rounds to DECIMAL(28,7) BEFORE the delta (exact decimal, order-free
# sums); the ranking key is the integer half-away 6-decimal mean.
ORACLE["select_excess_loss"] = """
WITH toke AS (
    SELECT doc_id, lang = 'en' AS tgt,
           unnest(string_split(text, ' ')) AS token
    FROM documents
), vocab AS (
    SELECT token, COUNT(*) AS cnt_all,
           SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS cnt_tgt
    FROM toke GROUP BY token
), tot AS (
    SELECT SUM(cnt_all) AS n_all, SUM(cnt_tgt) AS n_tgt,
           COUNT(*) AS v
    FROM vocab
), td AS (
    SELECT token,
           CAST(ROUND(log10(CAST(cnt_tgt + 1 AS DOUBLE) / (n_tgt + v)),
                      7) AS DECIMAL(28,7))
         - CAST(ROUND(log10(CAST(cnt_all + 1 AS DOUBLE) / (n_all + v)),
                      7) AS DECIMAL(28,7)) AS d
    FROM vocab, tot
), sums AS (
    SELECT doc_id, COUNT(*) AS n_tokens, SUM(d) AS s
    FROM toke JOIN td USING (token) GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(CAST(sign(s) AS BIGINT)
            * ((2 * CAST(abs(s) * 10000000 AS HUGEINT) * 1000000
                + CAST(n_tokens AS HUGEINT) * 10000000)
               // (2 * CAST(n_tokens AS HUGEINT) * 10000000))
            AS DOUBLE) / 1000000.0 AS excess_score
FROM sums
ORDER BY excess_score DESC, doc_id LIMIT 50
"""

# The composed pre-training prep loop: funnel gates -> canonical keep
# -> cluster-atomic split -> per-split corpus card (2048-token
# concat-chunk pack count on the split totals).
ORACLE["pipeline_pretrain_prep"] = f"""
WITH comp AS ({ORACLE["dedup_cluster_components"]}),
base AS (
    SELECT d.doc_id,
           COALESCE(c.component_id, d.doc_id) AS canonical_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           (d.lang IN ('en', 'es', 'de', 'fr')
            AND d.n_chars BETWEEN 100 AND 20000
            AND ((CAST(len(list_filter(string_split(d.text, ' '),
                  t -> list_contains(['the','a','of','and','to'], t)))
                  AS BIGINT) * 1000000)
                 // CAST(len(string_split(d.text, ' ')) AS BIGINT))
                >= 20000
            AND COALESCE(c.component_id, d.doc_id) = d.doc_id) AS kept
    FROM documents d LEFT JOIN comp c USING (doc_id)
), s AS (
    SELECT n_tokens,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
    FROM (SELECT n_tokens,
                 ('0x' || substr(md5(CAST(canonical_id AS VARCHAR)),
                  1, 15))::BIGINT % 100 AS b
          FROM base WHERE kept)
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST((CAST(SUM(n_tokens) AS BIGINT) + 2047) // 2048 AS BIGINT)
           AS n_packs
FROM s GROUP BY 1
"""

# ANN recall@10: exact vs label-cell top-10 per query; both ranked by
# (round-6 cosine desc, vec_id) so the sets are engine-exact.
ORACLE["eval_ann_recall"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
    FROM embeddings WHERE vec_id < 8
), scored AS (
    SELECT q.query_id, e.vec_id, e.label, q.qlabel,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.qv::DOUBLE[]), 6) AS sim
    FROM embeddings e, q WHERE e.vec_id != q.query_id
), exact AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM scored) WHERE rnk <= 10
), approx AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM scored WHERE label = qlabel) WHERE rnk <= 10
), hits AS (
    SELECT e.query_id, COUNT(*) AS n_hit
    FROM exact e JOIN approx a USING (query_id, vec_id)
    GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST((2 * COALESCE(h.n_hit, 0) * 1000000 + 10) // 20
            AS DOUBLE) / 1000000 AS recall_at_10
FROM q LEFT JOIN hits h USING (query_id)
"""

# PSI drift: all-integer terms — e7 smoothed proportions, e7-rounded
# log10 ratio, e14 product emitted half-away at e10.
ORACLE["eval_score_drift_psi"] = """
WITH s AS (
    SELECT (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score,
           CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INTEGER)
               < 10 AS is_train
    FROM documents
), h AS (
    SELECT LEAST(score // 100000, 9) AS bin,
           SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS n_train,
           SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS n_serve
    FROM s GROUP BY 1
), spine AS (
    SELECT unnest(generate_series(0, 9)) AS bin
), f AS (
    SELECT spine.bin,
           COALESCE(h.n_train, 0) AS n_train,
           COALESCE(h.n_serve, 0) AS n_serve
    FROM spine LEFT JOIN h USING (bin)
), tot AS (
    SELECT SUM(n_train) AS nt, SUM(n_serve) AS ns FROM f
), t AS (
    SELECT bin, n_train, n_serve,
           (2 * (n_train + 1) * 10000000 + (nt + 10))
               // (2 * (nt + 10)) AS p7,
           (2 * (n_serve + 1) * 10000000 + (ns + 10))
               // (2 * (ns + 10)) AS q7,
           CAST(floor(log10(CAST((n_train + 1) * (ns + 10) AS DOUBLE)
                            / CAST((n_serve + 1) * (nt + 10) AS DOUBLE))
                      * 10000000 + 0.5) AS BIGINT) AS ld7
    FROM f, tot
)
SELECT CAST(bin AS INTEGER) AS bin,
       CAST(n_train AS BIGINT) AS n_train,
       CAST(n_serve AS BIGINT) AS n_serve,
       CAST(CAST(sign((p7 - q7) * ld7) AS BIGINT)
            * ((2 * abs((p7 - q7) * ld7) + 10000) // 20000)
            AS BIGINT) AS psi_term_e10
FROM t ORDER BY bin
"""

# Streaming drift monitor: complete-mode availableNow makes the final
# histogram equal the batch one, so the live key is held to the full
# batch PSI (same integer recipe as eval_score_drift_psi).
ORACLE["stream_drift_monitor_live"] = """
WITH h AS (
    SELECT LEAST(CAST(floor(value / 50) AS INTEGER), 9) AS bin,
           SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_train,
           SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n_serve
    FROM events GROUP BY 1
), spine AS (
    SELECT unnest(generate_series(0, 9)) AS bin
), f AS (
    SELECT spine.bin,
           COALESCE(h.n_train, 0) AS n_train,
           COALESCE(h.n_serve, 0) AS n_serve
    FROM spine LEFT JOIN h USING (bin)
), tot AS (
    SELECT SUM(n_train) AS nt, SUM(n_serve) AS ns FROM f
), t AS (
    SELECT bin, n_train, n_serve,
           (2 * (n_train + 1) * 10000000 + (nt + 10))
               // (2 * (nt + 10)) AS p7,
           (2 * (n_serve + 1) * 10000000 + (ns + 10))
               // (2 * (ns + 10)) AS q7,
           CAST(floor(log10(CAST((n_train + 1) * (ns + 10) AS DOUBLE)
                            / CAST((n_serve + 1) * (nt + 10) AS DOUBLE))
                      * 10000000 + 0.5) AS BIGINT) AS ld7
    FROM f, tot
)
SELECT CAST(bin AS INTEGER) AS bin,
       CAST(n_train AS BIGINT) AS n_train,
       CAST(n_serve AS BIGINT) AS n_serve,
       CAST(CAST(sign((p7 - q7) * ld7) AS BIGINT)
            * ((2 * abs((p7 - q7) * ld7) + 10000) // 20000)
            AS BIGINT) AS psi_term_e10
FROM t ORDER BY bin
"""

# PR operating points: TP/FP at each decile threshold; precision,
# recall, F1 as single round_ratio6 rationals (F1 = 2TP/(2TP+FP+FN)).
ORACLE["eval_pr_thresholds"] = f"""
WITH s AS ({_EVAL_SCORED_SQL}),
t AS (
    SELECT unnest(generate_series(0, 9)) AS t_idx
), m AS (
    SELECT t.t_idx,
           CAST(t.t_idx * 100000 AS BIGINT) AS threshold_ppm,
           SUM(CASE WHEN s.score >= t.t_idx * 100000 AND s.pos
                    THEN 1 ELSE 0 END) AS tp,
           SUM(CASE WHEN s.score >= t.t_idx * 100000 AND NOT s.pos
                    THEN 1 ELSE 0 END) AS fp,
           SUM(CASE WHEN s.pos THEN 1 ELSE 0 END) AS np
    FROM s, t GROUP BY 1, 2
)
SELECT CAST(t_idx AS INTEGER) AS t_idx, threshold_ppm,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(tp + fp AS BIGINT) AS n_pred,
       CASE WHEN tp + fp > 0
            THEN CAST((2 * tp * 1000000 + (tp + fp))
                      // (2 * (tp + fp)) AS DOUBLE) / 1000000
            ELSE 0.0 END AS "precision",
       CAST((2 * tp * 1000000 + np) // (2 * np) AS DOUBLE) / 1000000
           AS recall,
       CASE WHEN (tp + fp + np) > 0
            THEN CAST((2 * (2 * tp) * 1000000 + (tp + fp + np))
                      // (2 * (tp + fp + np)) AS DOUBLE) / 1000000
            ELSE 0.0 END AS f1
FROM m ORDER BY t_idx
"""

# ---------------------------------------------------------------------------
# Domain-level curation tier (r8; plans/curation_queries.py).
# Shares/ranks/caps are pure integer decisions (quality ppm + doc_id
# tiebreak); the entropy term reuses the PSI e7-log10/e10-emission
# recipe. DuckDB window functions mirror the ranked caps exactly.
# ---------------------------------------------------------------------------

ORACLE["curate_domain_caps"] = """
WITH s AS (
    SELECT source, doc_id,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS q,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), r AS (
    SELECT source, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY q DESC, doc_id) AS rn,
           SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY q DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
    FROM s
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_total,
       CAST(SUM(CASE WHEN rn <= 15 AND cum_tokens <= 600
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
       CAST(SUM(CASE WHEN rn <= 15 AND cum_tokens <= 600
                     THEN n_tokens ELSE 0 END) AS BIGINT)
           AS n_tokens_kept
FROM r GROUP BY source ORDER BY source
"""

ORACLE["stats_domain_mix"] = """
WITH s AS (
    SELECT source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
    FROM documents
), a AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM s GROUP BY 1
), tot AS (
    SELECT CAST(SUM(n_docs) AS HUGEINT) AS nd,
           CAST(SUM(n_tokens) AS HUGEINT) AS ntk,
           CAST(COUNT(*) AS BIGINT) AS ndom
    FROM a
), r AS (
    SELECT a.*, CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, source)
                     AS INTEGER) AS rnk
    FROM a
), t AS (
    SELECT r.*, tot.nd, tot.ntk, tot.ndom,
           (2 * CAST(n_docs AS HUGEINT) * 10000000 + nd)
               // (2 * nd) AS p7,
           CAST(floor(log10(CAST(n_docs AS DOUBLE)
                            / CAST(nd AS DOUBLE))
                      * 10000000 + 0.5) AS BIGINT) AS ld7
    FROM r, tot
)
SELECT source, rnk, n_docs, n_tokens,
       CAST((2 * CAST(n_docs AS HUGEINT) * 1000000 + nd)
            // (2 * nd) AS BIGINT) AS doc_share_ppm,
       CAST((2 * CAST(n_tokens AS HUGEINT) * 1000000 + ntk)
            // (2 * ntk) AS BIGINT) AS tok_share_ppm,
       CAST((ndom - 2 * rnk + 1) * n_docs AS BIGINT) AS gini_term,
       CAST(CAST(sign(-(p7 * ld7)) AS BIGINT)
            * ((2 * abs(p7 * ld7) + 10000) // 20000) AS BIGINT)
           AS entropy_term_e10
FROM t ORDER BY rnk
"""

# Classifier TRAIN -> EVAL loop (r8): binary NB margins on the 80/20
# md5 split (text_class_nb's scoring recipe, two classes), integer
# affine ppm quantization, then the eval tier's histogram metrics —
# PR deciles + calibration + AUC + max-F1 cut in one decile table.
ORACLE["pipeline_classifier_loop"] = """
WITH labeled AS (
    SELECT doc_id, text, (lang = 'en') AS is_pos,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS b
    FROM documents
), train AS (
    SELECT * FROM labeled WHERE b < 80
), ev AS (
    SELECT * FROM labeled WHERE b >= 80
), toke_tr AS (
    SELECT is_pos AS cand, unnest(string_split(text, ' ')) AS tok
    FROM train
), tok_cls AS (
    SELECT tok, cand, COUNT(*) AS cnt FROM toke_tr GROUP BY 1, 2
), cls AS (
    SELECT t.cand, d.n_docs_c, t.n_tok_c
    FROM (SELECT cand, SUM(cnt) AS n_tok_c FROM tok_cls GROUP BY 1) t
    JOIN (SELECT is_pos AS cand, COUNT(*) AS n_docs_c
          FROM train GROUP BY 1) d USING (cand)
), vt AS (
    SELECT COUNT(DISTINCT tok) AS v FROM tok_cls
), dt AS (
    SELECT COUNT(*) AS docs FROM train
), cand AS (
    SELECT cand,
           CAST(ROUND(log10(CAST(n_docs_c AS DOUBLE) / docs), 7)
                AS DECIMAL(28,7)) AS log_prior,
           CAST(ROUND(log10(CAST(n_tok_c + v AS DOUBLE)), 7)
                AS DECIMAL(28,7)) AS log_denom
    FROM cls, vt, dt
), toke_ev AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM ev
), sparse AS (
    SELECT e.doc_id, tc.cand,
           SUM(CAST(ROUND(log10(tc.cnt + 1.0), 7) AS DECIMAL(28,7)))
               AS s_sparse
    FROM toke_ev e JOIN tok_cls tc USING (tok)
    GROUP BY 1, 2
), doc_n AS (
    SELECT doc_id, is_pos,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM ev
), scored AS (
    SELECT d.doc_id, d.is_pos, c.cand,
           COALESCE(s.s_sparse, CAST(0 AS DECIMAL(28,7)))
             - d.n_tokens * c.log_denom + c.log_prior AS sc
    FROM doc_n d CROSS JOIN cand c
    LEFT JOIN sparse s ON s.doc_id = d.doc_id AND s.cand = c.cand
), m AS (
    SELECT doc_id, is_pos,
           CAST(SUM(CASE WHEN cand THEN sc ELSE -sc END)
                * 10000000 AS BIGINT) AS margin_e7
    FROM scored GROUP BY 1, 2
), mm AS (
    SELECT MIN(margin_e7) AS mn, MAX(margin_e7) AS mx FROM m
), q AS (
    SELECT doc_id, is_pos AS pos,
           CAST((CAST(margin_e7 - mn AS HUGEINT) * 1000000)
                // CAST(GREATEST(mx - mn, 1) AS HUGEINT) AS BIGINT)
               AS score
    FROM m, mm
), h AS (
    SELECT score,
           SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_s,
           SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS neg_s
    FROM q GROUP BY 1
), tt AS (
    SELECT unnest(generate_series(0, 9)) AS t_idx
), pr AS (
    SELECT tt.t_idx,
           CAST(tt.t_idx * 100000 AS BIGINT) AS threshold_ppm,
           SUM(CASE WHEN q.score >= tt.t_idx * 100000 AND q.pos
                    THEN 1 ELSE 0 END) AS tp,
           SUM(CASE WHEN q.score >= tt.t_idx * 100000 AND NOT q.pos
                    THEN 1 ELSE 0 END) AS fp,
           SUM(CASE WHEN q.pos THEN 1 ELSE 0 END) AS np
    FROM q, tt GROUP BY 1, 2
), prx AS (
    SELECT CAST(t_idx AS INTEGER) AS t_idx, threshold_ppm,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(tp + fp AS BIGINT) AS n_pred,
           CASE WHEN tp + fp > 0
                THEN CAST((2 * tp * 1000000 + (tp + fp))
                          // (2 * (tp + fp)) AS DOUBLE) / 1000000
                ELSE 0.0 END AS prec,
           CAST((2 * tp * 1000000 + np) // (2 * np) AS DOUBLE)
               / 1000000 AS recall,
           CASE WHEN (tp + fp + np) > 0
                THEN CAST((2 * (2 * tp) * 1000000 + (tp + fp + np))
                          // (2 * (tp + fp + np)) AS DOUBLE) / 1000000
                ELSE 0.0 END AS f1
    FROM pr
), cal AS (
    SELECT CAST(LEAST(score // 100000, 9) AS INTEGER) AS t_idx,
           CAST(COUNT(*) AS BIGINT) AS bin_n,
           CAST((2 * SUM(CASE WHEN pos THEN 1 ELSE 0 END) * 1000000
                 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000
               AS bin_pos_rate
    FROM q GROUP BY 1
), auc_c AS (
    SELECT pos_s, neg_s,
           COALESCE(SUM(neg_s) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumneg_below
    FROM h
), auc_t AS (
    SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           CAST(SUM(neg_s) AS BIGINT) AS n_neg,
           CAST(SUM(pos_s * (2 * cumneg_below + neg_s)) AS BIGINT)
               AS auc_num2
    FROM auc_c
), auc AS (
    SELECT CAST((2 * CAST(auc_num2 AS HUGEINT) * 1000000
                 + 2 * CAST(n_pos AS HUGEINT) * n_neg)
                // (2 * (2 * CAST(n_pos AS HUGEINT) * n_neg))
                AS DOUBLE) / 1000000 AS auc
    FROM auc_t
), best AS (
    SELECT t_idx AS best_t FROM prx
    ORDER BY f1 DESC, t_idx ASC LIMIT 1
)
SELECT p.t_idx, p.threshold_ppm, p.tp, p.fp, p.n_pred,
       p.prec AS "precision", p.recall, p.f1,
       COALESCE(c.bin_n, 0) AS bin_n,
       COALESCE(c.bin_pos_rate, 0.0) AS bin_pos_rate,
       auc.auc,
       (p.t_idx = best.best_t) AS is_chosen
FROM prx p LEFT JOIN cal c USING (t_idx), auc, best
ORDER BY p.t_idx
"""

# LEFT OUTER stream-stream interval join (r8): every purchase in the
# CLOSED region (max ts - 50 min: lookback 30 + watermark 10 +
# margin — the horizon where streaming outer results are final),
# matched or null-padded; shared verbatim by the batch twin and the
# true-streaming live run.
ORACLE["stream_stream_join_outer"] = """
WITH v AS (SELECT user_id AS v_user, ts AS view_ts, value AS view_value
           FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'),
cut AS (SELECT MAX(ts) - INTERVAL 50 MINUTE AS c FROM events),
j AS (
    SELECT p.user_id, p.purchase_id, p.purchase_ts,
           v.view_ts, v.view_value
    FROM p LEFT JOIN v
      ON v.v_user = p.user_id
     AND v.view_ts <= p.purchase_ts
     AND v.view_ts >= p.purchase_ts - INTERVAL 30 MINUTE
)
SELECT user_id,
       COUNT(DISTINCT purchase_id) AS n_purchases,
       COUNT(DISTINCT CASE WHEN view_ts IS NOT NULL
                           THEN purchase_id END)
           AS n_matched_purchases,
       CAST(SUM(CASE WHEN view_ts IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view_pairs,
       CAST(SUM(CAST(COALESCE(view_value, 0) AS DECIMAL(18,4)))
            AS DOUBLE) AS attributed_value
FROM j, cut
WHERE purchase_ts <= cut.c
GROUP BY 1
"""

ORACLE["stream_stream_join_outer_live"] = ORACLE["stream_stream_join_outer"]

# DoReMi-style one-shot proportional domain reweighting (r8): the
# select_excess_loss two-LM delta aggregated to domains; mixture
# weight proportional to the positive excess, all-integer outputs.
ORACLE["mixture_domain_reweight"] = """
WITH toke AS (
    SELECT source, lang = 'en' AS tgt,
           unnest(string_split(text, ' ')) AS token
    FROM documents
), vocab AS (
    SELECT token, COUNT(*) AS cnt_all,
           SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS cnt_tgt
    FROM toke GROUP BY token
), tot AS (
    SELECT SUM(cnt_all) AS n_all, SUM(cnt_tgt) AS n_tgt,
           COUNT(*) AS v
    FROM vocab
), td AS (
    SELECT token,
           CAST(ROUND(log10(CAST(cnt_tgt + 1 AS DOUBLE) / (n_tgt + v)),
                      7) AS DECIMAL(28,7))
         - CAST(ROUND(log10(CAST(cnt_all + 1 AS DOUBLE) / (n_all + v)),
                      7) AS DECIMAL(28,7)) AS d
    FROM vocab, tot
), per_dom AS (
    SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           SUM(td.d) AS s
    FROM toke t JOIN td USING (token) GROUP BY 1
), docs AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
), scored AS (
    SELECT p.source, d.n_docs, p.n_tokens,
           CAST(CAST(sign(p.s) AS BIGINT)
                * ((2 * CAST(abs(p.s) * 10000000 AS HUGEINT) * 1000000
                    + CAST(p.n_tokens AS HUGEINT) * 10000000)
                   // (2 * CAST(p.n_tokens AS HUGEINT) * 10000000))
                AS BIGINT) AS excess_e6
    FROM per_dom p JOIN docs d USING (source)
), tp AS (
    SELECT GREATEST(SUM(GREATEST(excess_e6, 0)), 1) AS tot_pos
    FROM scored
)
SELECT source, n_docs, n_tokens, excess_e6,
       CAST((2 * CAST(GREATEST(excess_e6, 0) AS HUGEINT) * 1000000
             + tot_pos)
            // (2 * CAST(tot_pos AS HUGEINT)) AS BIGINT) AS weight_ppm
FROM scored, tp ORDER BY source
"""

# Poisson-bootstrap AUC confidence interval (r8): 8 deterministic
# md5-seeded Poisson(1) resamples (the sample_poisson_bootstrap draw
# idiom, shared CDF literals) of the eval-tier scored set, each
# graded by the same rank-sum histogram as eval_auc_rank; the final
# ratio mirrors round_ratio6_dec on HUGEINT, NULL if a replicate
# resampled away a whole class.
ORACLE["eval_auc_bootstrap_ci"] = f"""
WITH s AS ({_EVAL_SCORED_SQL}),
reps AS (
    SELECT unnest(range(0, 8)) AS rep
), drawn AS (
    SELECT r.rep, s.score, s.pos,
           (('0x' || substr(md5('aucboot' || CAST(r.rep AS VARCHAR)
                || ':' || CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT
               + 1) / 1152921504606846976.0 AS u
    FROM s CROSS JOIN reps r
), wtd AS (
    SELECT rep, score, pos, {{_PB_W}} AS w FROM drawn
), h AS (
    SELECT rep, score,
           CAST(SUM(CASE WHEN pos THEN w ELSE 0 END) AS BIGINT)
               AS pos_s,
           CAST(SUM(CASE WHEN pos THEN 0 ELSE w END) AS BIGINT)
               AS neg_s
    FROM wtd GROUP BY 1, 2
), c AS (
    SELECT rep, pos_s, neg_s,
           COALESCE(SUM(neg_s) OVER (PARTITION BY rep ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumneg_below
    FROM h
), t AS (
    SELECT rep,
           CAST(SUM(pos_s) AS BIGINT) AS n_pos_eff,
           CAST(SUM(neg_s) AS BIGINT) AS n_neg_eff,
           CAST(SUM(pos_s * (2 * cumneg_below + neg_s)) AS BIGINT)
               AS num2
    FROM c GROUP BY 1
)
SELECT CAST(rep AS INTEGER) AS replicate, n_pos_eff, n_neg_eff,
       CASE WHEN n_pos_eff > 0 AND n_neg_eff > 0
            THEN CAST((2 * CAST(num2 AS HUGEINT) * 1000000
                       + 2 * CAST(n_pos_eff AS HUGEINT) * n_neg_eff)
                      // (2 * (2 * CAST(n_pos_eff AS HUGEINT)
                               * n_neg_eff)) AS DOUBLE) / 1000000
            ELSE NULL END AS auc
FROM t ORDER BY replicate
"""
ORACLE.amend("eval_auc_bootstrap_ci", "{_PB_W}", _PB_W)

# The composed domain-curation plan (r8): gates -> per-domain ranked
# caps -> DoReMi-lite excess-loss weights over the gated corpus ->
# token-budget allocation, one oracle.
ORACLE["pipeline_domain_curation"] = """
WITH g0 AS (
    SELECT source, doc_id, text, lang, n_chars,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS q,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), gated AS (
    SELECT * FROM g0
    WHERE lang IN ('en', 'es', 'de', 'fr')
      AND n_chars BETWEEN 100 AND 20000
      AND q >= 20000
), r AS (
    SELECT source, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY q DESC, doc_id) AS rn,
           SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY q DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
    FROM gated
), capped AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_gated,
           CAST(SUM(CASE WHEN rn <= 15 AND cum_tokens <= 600
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN rn <= 15 AND cum_tokens <= 600
                         THEN n_tokens ELSE 0 END) AS BIGINT)
               AS n_tokens_kept
    FROM r GROUP BY 1
), toke AS (
    SELECT source, lang = 'en' AS tgt,
           unnest(string_split(text, ' ')) AS token
    FROM gated
), vocab AS (
    SELECT token, COUNT(*) AS cnt_all,
           SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS cnt_tgt
    FROM toke GROUP BY token
), tot AS (
    SELECT SUM(cnt_all) AS n_all, SUM(cnt_tgt) AS n_tgt,
           COUNT(*) AS v
    FROM vocab
), td AS (
    SELECT token,
           CAST(ROUND(log10(CAST(cnt_tgt + 1 AS DOUBLE) / (n_tgt + v)),
                      7) AS DECIMAL(28,7))
         - CAST(ROUND(log10(CAST(cnt_all + 1 AS DOUBLE) / (n_all + v)),
                      7) AS DECIMAL(28,7)) AS d
    FROM vocab, tot
), per_dom AS (
    SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           SUM(td.d) AS s
    FROM toke t JOIN td USING (token) GROUP BY 1
), scored AS (
    SELECT p.source,
           CAST(CAST(sign(p.s) AS BIGINT)
                * ((2 * CAST(abs(p.s) * 10000000 AS HUGEINT) * 1000000
                    + CAST(p.n_tokens AS HUGEINT) * 10000000)
                   // (2 * CAST(p.n_tokens AS HUGEINT) * 10000000))
                AS BIGINT) AS excess_e6
    FROM per_dom p
), tp AS (
    SELECT GREATEST(SUM(GREATEST(excess_e6, 0)), 1) AS tot_pos
    FROM scored
), weights AS (
    SELECT source, excess_e6,
           CAST((2 * CAST(GREATEST(excess_e6, 0) AS HUGEINT) * 1000000
                 + tot_pos)
                // (2 * CAST(tot_pos AS HUGEINT)) AS BIGINT)
               AS weight_ppm
    FROM scored, tp
)
SELECT c.source, c.n_docs_gated, c.n_docs_kept, c.n_tokens_kept,
       w.excess_e6, w.weight_ppm,
       CAST((100000 * w.weight_ppm) // 1000000 AS BIGINT)
           AS planned_tokens
FROM capped c JOIN weights w USING (source)
ORDER BY c.source
"""


# ---------------------------------------------------------------------------
# Retrieval / serving tier (plans/retrieval_queries.py). The BM25
# integer algebra (k1=12/10, b=3/4, Lucene idf) mirrors
# operators/retrieval.bm25_scores exactly: idf via the soaked
# floor(log10(a/b)*1e7 + 0.5) BIGINT recipe on the integer rational
# (2N+2)/(2df+1); per-posting contribution = half-away integer DIV
# of idf_e7*22*tf*T over 10*(10*tf*T + 3*T + 9*dl*N) on HUGEINT
# (Spark: DECIMAL(38,0) DIV); scores summed as exact 1e-6 integers.
# ---------------------------------------------------------------------------

_BM25_SCORED_SQL = """
    SELECT doc_id,
           CAST(SUM(contrib_e6) AS BIGINT) AS score_e6,
           CAST(COUNT(*) AS INTEGER) AS n_terms
    FROM (
        SELECT p.doc_id,
               CAST((2 * CAST(CAST(floor(log10(
                          CAST(2 * s.n_docs + 2 AS DOUBLE)
                          / CAST(2 * f.df + 1 AS DOUBLE)) * 1e7 + 0.5)
                        AS BIGINT) AS HUGEINT)
                      * 22 * p.tf * s.total_len
                     + CAST(10 AS HUGEINT)
                       * (10 * CAST(p.tf AS HUGEINT) * s.total_len
                          + 3 * CAST(s.total_len AS HUGEINT)
                          + 9 * CAST(p.dl AS HUGEINT) * s.n_docs))
                    // (2 * CAST(10 AS HUGEINT)
                        * (10 * CAST(p.tf AS HUGEINT) * s.total_len
                           + 3 * CAST(s.total_len AS HUGEINT)
                           + 9 * CAST(p.dl AS HUGEINT) * s.n_docs))
                    AS BIGINT)
                   AS contrib_e6
        FROM (
            SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                       unnest(string_split(text, ' ')) AS term
                FROM documents)
            WHERE term IN ('spark', 'hash', 'join', 'window')
            GROUP BY doc_id, dl, term) p
        JOIN (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM (
                SELECT DISTINCT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(string_split(text, ' ')) AS term
                    FROM documents)
                WHERE term IN ('spark', 'hash', 'join', 'window'))
            GROUP BY term) f USING (term),
        (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS total_len
            FROM documents) s)
    GROUP BY doc_id
"""

ORACLE["text_bm25_topk"] = f"""
WITH agg AS ({_BM25_SCORED_SQL}),
ranked AS (
    SELECT doc_id, n_terms, score_e6,
           row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS rnk
    FROM agg
)
SELECT doc_id, n_terms, CAST(score_e6 AS DOUBLE) / 1000000 AS bm25,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 10
"""

# RRF: both legs' ranks -> exact rational 1/(60+rs) + 1/(60+rd)
# through the integer half-away recipe (round_ratio6 mirror; num is
# positive so no sign leg).
ORACLE["sim_hybrid_rrf"] = f"""
WITH agg AS ({_BM25_SCORED_SQL}),
sparse AS (
    SELECT doc_id AS id,
           CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC)
                AS INTEGER) AS rs
    FROM agg
    ORDER BY score_e6 DESC, doc_id ASC LIMIT 20
), q AS (
    SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
), ds AS (
    SELECT e.vec_id,
           CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[],
                                             q.qv::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM embeddings e, q WHERE e.vec_id != 0
), dense AS (
    SELECT vec_id AS id,
           CAST(row_number() OVER (ORDER BY sim_e6 DESC, vec_id ASC)
                AS INTEGER) AS rd
    FROM ds
    ORDER BY sim_e6 DESC, vec_id ASC LIMIT 20
), fused AS (
    SELECT COALESCE(s.id, d.id) AS id, s.rs, d.rd,
           CAST(CASE WHEN s.rs IS NOT NULL AND d.rd IS NOT NULL
                     THEN 120 + s.rs + d.rd ELSE 1 END AS BIGINT) AS num,
           CAST(CASE WHEN s.rs IS NOT NULL AND d.rd IS NOT NULL
                     THEN (60 + s.rs) * (60 + d.rd)
                     WHEN s.rs IS NOT NULL THEN 60 + s.rs
                     ELSE 60 + d.rd END AS BIGINT) AS den
    FROM sparse s FULL OUTER JOIN dense d ON s.id = d.id
), scored AS (
    SELECT id, rs, rd,
           CAST((2 * num * 1000000 + den) // (2 * den) AS DOUBLE)
               / 1000000 AS rrf
    FROM fused
)
SELECT id, rs, rd, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, id ASC) AS INTEGER)
           AS rnk_fused
FROM scored
ORDER BY rrf DESC, id ASC LIMIT 10
"""

# Distance margin (Artetxe-Schwenk): with k=4 the margin in 1/(8e6)
# units is the exact integer 8*sim_e6 - sumF - sumB; the 6-decimal
# emit mirrors round_ratio6's sign/abs half-away integers.
ORACLE["sim_margin_bitext_mine"] = """
WITH x AS (
    SELECT vec_id AS xid, embedding AS xv FROM embeddings
    WHERE label = 0 AND vec_id % 5 = 0
), y AS (
    SELECT vec_id AS yid, embedding AS yv FROM embeddings
    WHERE label = 1
), p AS (
    SELECT xid, yid,
           CAST(floor(list_cosine_similarity(xv::DOUBLE[], yv::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM y, x
), f AS (
    SELECT xid, CAST(SUM(sim_e6) AS BIGINT) AS sum_f,
           CAST(COUNT(*) AS BIGINT) AS cnt_f FROM (
        SELECT xid, sim_e6,
               row_number() OVER (PARTITION BY xid
                                  ORDER BY sim_e6 DESC, yid ASC) AS rf
        FROM p) WHERE rf <= 4 GROUP BY xid
), b AS (
    SELECT yid, CAST(SUM(sim_e6) AS BIGINT) AS sum_b,
           CAST(COUNT(*) AS BIGINT) AS cnt_b FROM (
        SELECT yid, sim_e6,
               row_number() OVER (PARTITION BY yid
                                  ORDER BY sim_e6 DESC, xid ASC) AS rb
        FROM p) WHERE rb <= 4 GROUP BY yid
), s AS (
    -- mean-of-ACTUAL-top-k margin: rational m_num / (2*cf*cb*1e6);
    -- rank key = m_num * (lcm(1..4)=12 DIV cb) has a partition-
    -- constant denominator, so ordering is an integer decision
    SELECT p.xid, p.yid, p.sim_e6, f.cnt_f, b.cnt_b,
           2 * f.cnt_f * b.cnt_b * p.sim_e6
             - b.cnt_b * f.sum_f - f.cnt_f * b.sum_b AS m_num,
           (2 * f.cnt_f * b.cnt_b * p.sim_e6
             - b.cnt_b * f.sum_f - f.cnt_f * b.sum_b)
             * (12 // b.cnt_b) AS m_key
    FROM p JOIN f USING (xid) JOIN b USING (yid)
), best AS (
    SELECT *, row_number() OVER (PARTITION BY xid
                                 ORDER BY m_key DESC, yid ASC) AS r
    FROM s
)
SELECT xid, yid, CAST(sim_e6 AS DOUBLE) / 1000000 AS sim,
       CAST(CAST(SIGN(m_num) AS BIGINT)
            * ((2 * ABS(m_num) * 1000000 + 2 * cnt_f * cnt_b * 1000000)
               // (2 * 2 * cnt_f * cnt_b * 1000000))
            AS DOUBLE) / 1000000 AS margin
FROM best WHERE r = 1 AND m_num > 0
"""

ORACLE["dedup_record_linkage"] = """
WITH cust AS (
    SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
           c_custkey, c_name
    FROM customer
), linked AS (
    SELECT a.nationkey, a.mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_linked,
           CAST(SUM(CASE WHEN levenshtein(a.c_name, b.c_name) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dist0,
           CAST(SUM(CASE WHEN levenshtein(a.c_name, b.c_name) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dist1,
           CAST(SUM(CASE WHEN levenshtein(a.c_name, b.c_name) = 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dist2
    FROM cust a JOIN cust b
      ON a.nationkey = b.nationkey AND a.mktsegment = b.mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    GROUP BY a.nationkey, a.mktsegment
), sizes AS (
    SELECT nationkey, mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT)
               AS n_candidate_pairs
    FROM cust GROUP BY nationkey, mktsegment
)
SELECT s.nationkey, s.mktsegment, s.n_records, s.n_candidate_pairs,
       COALESCE(l.n_linked, 0) AS n_linked,
       COALESCE(l.n_dist0, 0) AS n_dist0,
       COALESCE(l.n_dist1, 0) AS n_dist1,
       COALESCE(l.n_dist2, 0) AS n_dist2
FROM sizes s LEFT JOIN linked l
  ON s.nationkey = l.nationkey AND s.mktsegment = l.mktsegment
"""

# Split conformal: k = floor((n_cal+1)/10) exactly, threshold = the
# k-th smallest calibration-positive score (multiset order statistic
# — the value at row_number k is tie-order-independent), ratios via
# the HUGEINT half-away recipe (round_ratio6_dec mirror).
ORACLE["eval_conformal_threshold"] = """
WITH base AS (
    SELECT doc_id, (lang = 'en') AS pos,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score,
           (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 100 < 50) AS is_cal
    FROM documents
), calpos AS (
    SELECT score FROM base WHERE is_cal AND pos
), kk AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
           GREATEST(1, (COUNT(*) + 1) // 10) AS k_order
    FROM calpos
), ranked AS (
    SELECT score, row_number() OVER (ORDER BY score ASC) AS r
    FROM calpos
), thr AS (
    SELECT kk.n_cal, CAST(kk.k_order AS BIGINT) AS k_order,
           CAST(ranked.score AS BIGINT) AS threshold_ppm
    FROM kk JOIN ranked ON ranked.r = kk.k_order
), ev AS (
    SELECT t.n_cal, t.k_order, t.threshold_ppm,
           CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos_eval,
           CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
               AS n_neg_eval,
           CAST(SUM(CASE WHEN pos AND score >= t.threshold_ppm
                         THEN 1 ELSE 0 END) AS BIGINT) AS pos_ge,
           CAST(SUM(CASE WHEN NOT pos AND score >= t.threshold_ppm
                         THEN 1 ELSE 0 END) AS BIGINT) AS neg_ge
    FROM base, thr t
    WHERE NOT is_cal
    GROUP BY t.n_cal, t.k_order, t.threshold_ppm
)
SELECT n_cal, k_order, threshold_ppm, n_pos_eval, n_neg_eval,
       CAST((2 * CAST(pos_ge AS HUGEINT) * 1000000 + n_pos_eval)
            // (2 * CAST(n_pos_eval AS HUGEINT)) AS DOUBLE) / 1000000.0
           AS coverage,
       CAST((2 * CAST(neg_ge AS HUGEINT) * 1000000 + n_neg_eval)
            // (2 * CAST(n_neg_eval AS HUGEINT)) AS DOUBLE) / 1000000.0
           AS fpr
FROM ev
"""


# Curriculum ordering: integer length bands, md5 shuffle key, and a
# (phase, shard)-partitioned position — the same 60-bit md5 mirror
# as every hash site.
ORACLE["curate_curriculum_order"] = """
WITH base AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ('0x' || substr(md5('cur:' || CAST(doc_id AS VARCHAR)),
                           1, 15))::BIGINT AS shuf,
           CAST(CASE WHEN len(string_split(text, ' ')) <= 40 THEN 0
                     WHEN len(string_split(text, ' ')) <= 70 THEN 1
                     ELSE 2 END AS INTEGER) AS phase,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                1, 15))::BIGINT % 8 AS INTEGER) AS shard
    FROM documents
)
SELECT doc_id, n_tokens, phase, shard,
       CAST(row_number() OVER (PARTITION BY phase, shard
                               ORDER BY shuf ASC, doc_id ASC)
            AS BIGINT) AS position
FROM base
"""

# Dimension-ablation recall: both cosines from ONE pair relation;
# DuckDB list slice l[1:16] is 1-based inclusive, matching Spark's
# slice(col, 1, 16).
ORACLE["eval_dim_ablation_recall"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < 8
), scored AS (
    SELECT q.query_id, e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.qv::DOUBLE[]), 6) AS sim_full,
           ROUND(list_cosine_similarity((e.embedding[1:16])::DOUBLE[],
                                        (q.qv[1:16])::DOUBLE[]), 6)
               AS sim_16
    FROM embeddings e, q WHERE e.vec_id != q.query_id
), exact AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_full DESC, vec_id) AS rnk
        FROM scored) WHERE rnk <= 10
), trunc AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_16 DESC, vec_id) AS rnk
        FROM scored) WHERE rnk <= 10
), hits AS (
    SELECT e.query_id, COUNT(*) AS n_hit
    FROM exact e JOIN trunc t USING (query_id, vec_id)
    GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST((2 * COALESCE(h.n_hit, 0) * 1000000 + 10) // 20
            AS DOUBLE) / 1000000 AS recall_at_10
FROM q LEFT JOIN hits h USING (query_id)
"""


# RAG retrieval composed: chunk (40/30 windows) -> BM25 over chunks
# (same integer algebra as _BM25_SCORED_SQL, chunk-level stats) ->
# RRF with the parent doc's dense rank -> <=2 chunks/doc -> top-5.
ORACLE["pipeline_rag_retrieval"] = """
WITH chunks AS (
    SELECT doc_id * 1000 + cid AS ckey,
           t[cid * 30 + 1 : cid * 30 + 40] AS ctoks
    FROM (
        SELECT doc_id, t,
               unnest(range(0, greatest(CAST(ceil((len(t) - 40) / 30.0)
                                             AS INTEGER), 0) + 1)) AS cid
        FROM (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents))
    WHERE len(t[cid * 30 + 1 : cid * 30 + 40]) > 0
), cstats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(ctoks)) AS BIGINT) AS total_len
    FROM chunks
), posting AS (
    SELECT ckey, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT ckey, CAST(len(ctoks) AS BIGINT) AS dl,
                 unnest(ctoks) AS term
          FROM chunks)
    WHERE term IN ('spark', 'hash', 'join', 'window')
    GROUP BY ckey, dl, term
), dfreq AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df
    FROM posting GROUP BY term
), bm AS (
    SELECT ckey, CAST(SUM(contrib_e6) AS BIGINT) AS score_e6
    FROM (
        SELECT p.ckey,
               CAST((2 * CAST(CAST(floor(log10(
                          CAST(2 * s.n_docs + 2 AS DOUBLE)
                          / CAST(2 * f.df + 1 AS DOUBLE)) * 1e7 + 0.5)
                        AS BIGINT) AS HUGEINT)
                      * 22 * p.tf * s.total_len
                     + CAST(10 AS HUGEINT)
                       * (10 * CAST(p.tf AS HUGEINT) * s.total_len
                          + 3 * CAST(s.total_len AS HUGEINT)
                          + 9 * CAST(p.dl AS HUGEINT) * s.n_docs))
                    // (2 * CAST(10 AS HUGEINT)
                        * (10 * CAST(p.tf AS HUGEINT) * s.total_len
                           + 3 * CAST(s.total_len AS HUGEINT)
                           + 9 * CAST(p.dl AS HUGEINT) * s.n_docs))
                    AS BIGINT)
                   AS contrib_e6
        FROM posting p JOIN dfreq f USING (term), cstats s)
    GROUP BY ckey
), sparse AS (
    SELECT ckey,
           CAST(row_number() OVER (ORDER BY score_e6 DESC, ckey ASC)
                AS INTEGER) AS rs,
           CAST(ckey // 1000 AS BIGINT) AS doc_id,
           CAST(ckey % 1000 AS INTEGER) AS chunk_id
    FROM bm
    ORDER BY score_e6 DESC, ckey ASC LIMIT 20
), q AS (
    SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
), ds AS (
    SELECT e.vec_id,
           CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[],
                                             q.qv::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM embeddings e, q WHERE e.vec_id != 0
), dense AS (
    SELECT vec_id AS doc_id,
           CAST(row_number() OVER (ORDER BY sim_e6 DESC, vec_id ASC)
                AS INTEGER) AS rd
    FROM ds
    ORDER BY sim_e6 DESC, vec_id ASC LIMIT 20
), scored AS (
    SELECT s.ckey, s.doc_id, s.chunk_id, s.rs, d.rd,
           CAST((2 * CAST(CASE WHEN d.rd IS NOT NULL
                               THEN 120 + s.rs + d.rd
                               ELSE 1 END AS BIGINT) * 1000000
                 + CAST(CASE WHEN d.rd IS NOT NULL
                             THEN (60 + s.rs) * (60 + d.rd)
                             ELSE 60 + s.rs END AS BIGINT))
                // (2 * CAST(CASE WHEN d.rd IS NOT NULL
                                  THEN (60 + s.rs) * (60 + d.rd)
                                  ELSE 60 + s.rs END AS BIGINT))
                AS DOUBLE) / 1000000 AS rrf
    FROM sparse s LEFT JOIN dense d USING (doc_id)
), capped AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY rrf DESC, ckey ASC) AS dr
        FROM scored) WHERE dr <= 2
)
SELECT doc_id, chunk_id, rs, rd, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, ckey ASC) AS INTEGER)
           AS rnk
FROM capped
ORDER BY rrf DESC, ckey ASC LIMIT 5
"""


# NDCG@10 of the 16-dim system vs full-dim graded relevance. The
# discount literals are the SAME Python-generated integers the Spark
# plan embeds (shared-constant pattern) — no engine evaluates log2.
from ..operators.retrieval import ndcg_discounts_e9 as _ndcg_d  # noqa: E402

_D10 = "[" + ", ".join(str(d) for d in _ndcg_d(10)) + "]"

ORACLE["eval_retrieval_ndcg"] = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < 8
), scored AS (
    SELECT q.query_id, e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.qv::DOUBLE[]), 6) AS sim_full,
           ROUND(list_cosine_similarity((e.embedding[1:16])::DOUBLE[],
                                        (q.qv[1:16])::DOUBLE[]), 6)
               AS sim_16
    FROM embeddings e, q WHERE e.vec_id != q.query_id
), graded AS (
    SELECT query_id, vec_id,
           CAST(CASE WHEN rnk_full <= 3 THEN 7
                     WHEN rnk_full <= 10 THEN 3
                     WHEN rnk_full <= 30 THEN 1
                     ELSE 0 END AS BIGINT) AS gain,
           rnk_16
    FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_full DESC, vec_id)
                   AS rnk_full,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_16 DESC, vec_id)
                   AS rnk_16
        FROM scored)
), dcg AS (
    SELECT query_id,
           CAST(SUM(gain * ({_D10}[rnk_16])) AS BIGINT) AS dcg_e9
    FROM graded WHERE rnk_16 <= 10 GROUP BY query_id
), idcg AS (
    SELECT query_id,
           CAST(SUM(gain * ({_D10}[ri])) AS BIGINT) AS idcg_e9
    FROM (
        SELECT query_id, gain,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY gain DESC, vec_id) AS ri
        FROM graded) WHERE ri <= 10 GROUP BY query_id
)
SELECT d.query_id, d.dcg_e9, i.idcg_e9,
       CAST(CAST(SIGN(d.dcg_e9) AS BIGINT)
            * ((2 * CAST(ABS(d.dcg_e9) AS HUGEINT) * 1000000 + i.idcg_e9)
               // (2 * CAST(i.idcg_e9 AS HUGEINT))) AS DOUBLE)
           / 1000000.0 AS ndcg
FROM dcg d JOIN idcg i USING (query_id)
"""


# FULL OUTER stream-stream interval join (batch + live twins, one
# oracle): both sides preserved; a row is in the closed region once
# COALESCE(purchase_ts, view_ts + lookback) clears the cutoff.
ORACLE["stream_stream_join_full"] = """
WITH v AS (SELECT user_id AS v_user, ts AS view_ts, value AS view_value
           FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'),
cut AS (SELECT MAX(ts) - INTERVAL 50 MINUTE AS c FROM events),
j AS (
    SELECT COALESCE(p.user_id, v.v_user) AS user_id,
           p.purchase_id, p.purchase_ts, v.view_ts, v.view_value
    FROM p FULL JOIN v
      ON v.v_user = p.user_id
     AND v.view_ts <= p.purchase_ts
     AND v.view_ts >= p.purchase_ts - INTERVAL 30 MINUTE
)
SELECT user_id,
       COUNT(DISTINCT purchase_id) AS n_purchases,
       COUNT(DISTINCT CASE WHEN view_ts IS NOT NULL
                            AND purchase_id IS NOT NULL
                           THEN purchase_id END)
           AS n_matched_purchases,
       CAST(SUM(CASE WHEN view_ts IS NOT NULL
                      AND purchase_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_view_pairs,
       CAST(SUM(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphan_views,
       CAST(SUM(CAST(COALESCE(CASE WHEN view_ts IS NOT NULL
                                    AND purchase_id IS NOT NULL
                                   THEN view_value END, 0)
                     AS DECIMAL(18,4))) AS DOUBLE) AS attributed_value
FROM j, cut
WHERE COALESCE(purchase_ts, view_ts + INTERVAL 30 MINUTE) <= cut.c
GROUP BY 1
"""

ORACLE["stream_stream_join_full_live"] = ORACLE["stream_stream_join_full"]


# Batched BM25: one posting pass, global df, a VALUES query map, the
# same HUGEINT contribution integers, per-query top-5.
ORACLE["text_bm25_batch_queries"] = """
WITH qmap(query_id, term) AS (
    VALUES (0, 'spark'), (0, 'hash'),
           (1, 'join'), (1, 'window'), (1, 'sort'),
           (2, 'scan'), (2, 'merge'), (2, 'hash')
), posting AS (
    SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents)
    WHERE term IN ('spark', 'hash', 'join', 'window', 'sort',
                   'scan', 'merge')
    GROUP BY doc_id, dl, term
), dfreq AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df
    FROM posting GROUP BY term
), s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS total_len
    FROM documents
), agg AS (
    SELECT query_id, doc_id,
           CAST(SUM(contrib_e6) AS BIGINT) AS score_e6,
           CAST(COUNT(*) AS INTEGER) AS n_terms
    FROM (
        SELECT q.query_id, p.doc_id,
               CAST((2 * CAST(CAST(floor(log10(
                          CAST(2 * s.n_docs + 2 AS DOUBLE)
                          / CAST(2 * f.df + 1 AS DOUBLE)) * 1e7 + 0.5)
                        AS BIGINT) AS HUGEINT)
                      * 22 * p.tf * s.total_len
                     + CAST(10 AS HUGEINT)
                       * (10 * CAST(p.tf AS HUGEINT) * s.total_len
                          + 3 * CAST(s.total_len AS HUGEINT)
                          + 9 * CAST(p.dl AS HUGEINT) * s.n_docs))
                    // (2 * CAST(10 AS HUGEINT)
                        * (10 * CAST(p.tf AS HUGEINT) * s.total_len
                           + 3 * CAST(s.total_len AS HUGEINT)
                           + 9 * CAST(p.dl AS HUGEINT) * s.n_docs))
                    AS BIGINT)
                   AS contrib_e6
        FROM posting p
        JOIN qmap q USING (term)
        JOIN dfreq f USING (term), s)
    GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS INTEGER) AS query_id, doc_id, n_terms,
       CAST(score_e6 AS DOUBLE) / 1000000 AS bm25,
       CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_e6 DESC, doc_id ASC)
              AS rnk
    FROM agg)
WHERE rnk <= 5
"""


# The index-serve lifecycle must emit the IDENTICAL rows as the
# direct-scan BM25 — one oracle by construction.
ORACLE["text_bm25_index_serve"] = ORACLE["text_bm25_topk"]


# Hard-negative mining: nearest same-label vs nearest other-label
# neighbor per query; margin = exact difference of snapped integers.
ORACLE["pairs_hard_negatives"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
    FROM embeddings WHERE vec_id < 8
), scored AS (
    SELECT q.query_id, q.qlabel, e.vec_id, e.label,
           CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[],
                                             q.qv::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM embeddings e, q WHERE e.vec_id != q.query_id
), pos AS (
    SELECT query_id, vec_id AS pos_id, sim_e6 AS pos_e6 FROM (
        SELECT query_id, vec_id, sim_e6,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_e6 DESC, vec_id) AS r
        FROM scored WHERE label = qlabel) WHERE r = 1
), neg AS (
    SELECT query_id, vec_id AS neg_id, sim_e6 AS neg_e6 FROM (
        SELECT query_id, vec_id, sim_e6,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_e6 DESC, vec_id) AS r
        FROM scored WHERE label != qlabel) WHERE r = 1
)
SELECT query_id, pos_id, neg_id,
       CAST(pos_e6 AS DOUBLE) / 1000000 AS pos_sim,
       CAST(neg_e6 AS DOUBLE) / 1000000 AS neg_sim,
       CAST(pos_e6 - neg_e6 AS DOUBLE) / 1000000 AS margin
FROM pos JOIN neg USING (query_id)
"""


# The incremental refresh must equal the full-corpus scan exactly.
ORACLE["maintenance_bm25_index_refresh"] = ORACLE["text_bm25_topk"]


# XML roundtrip: the oracle aggregates the ORIGINAL rows — any lossy
# serialize/parse in the XML leg shows as a mismatch.
ORACLE["sink_xml_roundtrip"] = """
SELECT n.n_regionkey,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT n.n_name) AS n_nations,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_regionkey
"""

# The scripting loop must equal the set-wise form exactly.
ORACLE["sql_scripting_block"] = """
SELECT CAST(3 AS INTEGER) AS n_months,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
FROM orders WHERE month(o_orderdate) <= 3
"""


# Tokenizer compression: exact BIGINT sums, HUGEINT half-away ratios.
ORACLE["eval_tokenizer_compression"] = """
WITH per AS (
    SELECT lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text,
                '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpe,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws
    FROM documents
), g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws
    FROM per GROUP BY lang
)
SELECT lang, n_docs, total_chars, total_bpe, total_ws,
       CAST((2 * CAST(total_chars AS HUGEINT) * 1000000 + total_bpe)
            // (2 * CAST(total_bpe AS HUGEINT)) AS DOUBLE) / 1000000.0
           AS chars_per_token,
       CAST((2 * CAST(total_bpe AS HUGEINT) * 1000000 + total_ws)
            // (2 * CAST(total_ws AS HUGEINT)) AS DOUBLE) / 1000000.0
           AS fertility
FROM g
"""


# Atomic next-fit packing: the oracle replays the same recurrence
# (pack closes when the next doc would overflow) as a recursive CTE
# stepping one row per group per iteration.
ORACLE["seq_pack_atomic"] = """
WITH RECURSIVE b AS (
    SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
), walk AS (
    SELECT source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS pack_id, n_tokens AS cur
    FROM b WHERE rn = 1
    UNION ALL
    SELECT b.source, b.doc_id, b.n_tokens, b.rn,
           CASE WHEN w.cur + b.n_tokens > 2048
                THEN w.pack_id + 1 ELSE w.pack_id END,
           CASE WHEN w.cur + b.n_tokens > 2048
                THEN b.n_tokens ELSE w.cur + b.n_tokens END
    FROM walk w JOIN b ON b.source = w.source AND b.rn = w.rn + 1
)
SELECT source, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM walk GROUP BY source, pack_id
"""


# Quality-priority keep: the same components CTE, keeper = rank 1 on
# (stopword-ppm quality desc, id asc) inside the component.
ORACLE["dedup_quality_keep"] = f"""
WITH comp AS ({ORACLE["dedup_cluster_components"]}),
q AS (
    SELECT doc_id,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT)
               AS quality_ppm
    FROM documents
), member AS (
    SELECT comp.doc_id, comp.component_id, q.quality_ppm,
           row_number() OVER (PARTITION BY comp.component_id
                              ORDER BY q.quality_ppm DESC,
                                       comp.doc_id ASC) AS r
    FROM comp JOIN q USING (doc_id)
), keeper AS (
    SELECT component_id, doc_id AS keeper_id,
           quality_ppm AS keeper_quality
    FROM member WHERE r = 1
)
SELECT m.doc_id, m.component_id AS cluster_id, m.quality_ppm,
       k.keeper_id, k.keeper_quality,
       m.doc_id = k.keeper_id AS is_kept
FROM member m JOIN keeper k USING (component_id)
"""


# OHLC bars: open/close are rank-1 raw values of (ts, event_id)
# windows — selected doubles, no arithmetic, bit-exact everywhere.
ORACLE["resample_hourly_ohlc"] = """
WITH ev AS (
    SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id, value,
           row_number() OVER (PARTITION BY event_type,
                                           date_trunc('hour', ts)
                              ORDER BY ts ASC, event_id ASC) AS ra,
           row_number() OVER (PARTITION BY event_type,
                                           date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rd
    FROM events WHERE value IS NOT NULL
)
SELECT event_type, CAST(epoch(h) AS BIGINT) AS bucket_hour_epoch,
       MAX(CASE WHEN ra = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rd = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ev GROUP BY event_type, h
"""


# The one-row corpus data card: size, diversity, quality, dup mass;
# every ratio the HUGEINT half-away recipe.
ORACLE["stats_corpus_datasheet"] = f"""
WITH comp AS ({ORACLE["dedup_cluster_components"]}),
cm AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clustered_docs,
           CAST(COUNT(DISTINCT component_id) AS BIGINT) AS n_clusters
    FROM comp
), base AS (
    SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
           CAST(length(text) AS BIGINT) AS n_chars_t,
           (lang = 'en') AS is_en,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS q_ppm,
           source, lang
    FROM documents
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars_t) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
           CAST(SUM(q_ppm) AS BIGINT) AS sum_q
    FROM base
)
SELECT a.n_docs, a.total_tokens, a.total_chars, a.n_sources, a.n_langs,
       CAST((2 * CAST(a.n_en AS HUGEINT) * 1000000 + a.n_docs)
            // (2 * CAST(a.n_docs AS HUGEINT)) AS DOUBLE) / 1000000.0
           AS en_share,
       CAST((2 * CAST(a.sum_q AS HUGEINT) * 1000000 + a.n_docs)
            // (2 * CAST(a.n_docs AS HUGEINT)) AS DOUBLE) / 1000000.0
           AS mean_quality_ppm,
       cm.n_clustered_docs, cm.n_clusters,
       CAST((2 * CAST(cm.n_clustered_docs AS HUGEINT) * 1000000
             + a.n_docs)
            // (2 * CAST(a.n_docs AS HUGEINT)) AS DOUBLE) / 1000000.0
           AS dup_cluster_share
FROM agg a, cm
"""


# Radius search: integer floor decision, per-query summary; nearest
# by (sim desc, id) rank 1 inside the range set.
ORACLE["sim_range_search"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < 8
), scored AS (
    SELECT q.query_id, e.vec_id,
           CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[],
                                             q.qv::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM embeddings e, q WHERE e.vec_id != q.query_id
), hits AS (
    SELECT * FROM scored WHERE sim_e6 >= 200000
), summary AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_in_range,
           CAST(MAX(sim_e6) AS DOUBLE) / 1000000 AS max_sim,
           CAST(MIN(sim_e6) AS DOUBLE) / 1000000 AS min_sim_in_range
    FROM hits GROUP BY query_id
), nearest AS (
    SELECT query_id, vec_id AS nearest_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_e6 DESC, vec_id ASC) AS r
        FROM hits) WHERE r = 1
)
SELECT q.query_id,
       CAST(COALESCE(s.n_in_range, 0) AS BIGINT) AS n_in_range,
       s.max_sim, s.min_sim_in_range, n.nearest_id
FROM q LEFT JOIN summary s USING (query_id)
LEFT JOIN nearest n USING (query_id)
"""

# The composed IVF-pruned hard-negative path: identical integer
# quantizer (half-up 1e3 grid), identical argmax cell (first-max =
# lowest cid), identical nprobe=2 probe ranking, then the same
# conditional-best mining over the pruned candidates.
# list_dot_product over integer-valued doubles is exact below 2^53
# (the hyperplane-LSH oracle idiom), so every pruning decision is
# the same integer in both engines.
ORACLE["pairs_hard_negatives_ivf"] = """
WITH cent AS (
    SELECT vec_id AS cid,
           list_transform(embedding::DOUBLE[],
                          x -> floor(x * 1000 + 0.5)) AS cq
    FROM embeddings WHERE vec_id IN (100, 101, 102, 103)
), base AS (
    SELECT vec_id, label, embedding,
           list_transform(embedding::DOUBLE[],
                          x -> floor(x * 1000 + 0.5)) AS vq
    FROM embeddings
), celled AS (
    SELECT vec_id, label, embedding, cid AS cell FROM (
        SELECT b.vec_id, b.label, b.embedding, c.cid,
               row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.vq, c.cq) DESC,
                            c.cid ASC) AS r
        FROM base b, cent c) WHERE r = 1
), q AS (
    SELECT vec_id AS query_id, label AS qlabel,
           embedding AS qemb, vq AS qq
    FROM base WHERE vec_id < 8
), probe AS (
    SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_dot_product(q.qq, c.cq) DESC,
                            c.cid ASC) AS r
        FROM q, cent c) WHERE r <= 2
), cand AS (
    SELECT q.query_id, q.qlabel, e.vec_id, e.label,
           CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[],
                                             q.qemb::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM celled e
    JOIN probe p ON e.cell = p.cid
    JOIN q ON q.query_id = p.query_id
    WHERE e.vec_id != q.query_id
), pos AS (
    SELECT query_id, vec_id AS pos_id, sim_e6 AS pos_e6 FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY sim_e6 DESC, vec_id ASC) AS r
        FROM cand WHERE label = qlabel) WHERE r = 1
), neg AS (
    SELECT query_id, vec_id AS neg_id, sim_e6 AS neg_e6 FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY sim_e6 DESC, vec_id ASC) AS r
        FROM cand WHERE label != qlabel) WHERE r = 1
), nc AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_cand
    FROM cand GROUP BY query_id
)
SELECT p.query_id, nc.n_cand, p.pos_id, n.neg_id,
       CAST(p.pos_e6 AS DOUBLE) / 1000000 AS pos_sim,
       CAST(n.neg_e6 AS DOUBLE) / 1000000 AS neg_sim,
       CAST(p.pos_e6 - n.neg_e6 AS DOUBLE) / 1000000 AS margin
FROM pos p JOIN neg n USING (query_id) JOIN nc USING (query_id)
"""

# IVF-pruned radius search: identical cell/probe CTEs as the
# hard-negative miner (same integer quantizer and argmax), then the
# range summary over the pruned candidates only — the nearest-id
# tie-break (sim DESC, vec_id ASC) matches the Spark min_by struct.
ORACLE["sim_range_search_ivf"] = """
WITH cent AS (
    SELECT vec_id AS cid,
           list_transform(embedding::DOUBLE[],
                          x -> floor(x * 1000 + 0.5)) AS cq
    FROM embeddings WHERE vec_id IN (100, 101, 102, 103)
), base AS (
    SELECT vec_id, label, embedding,
           list_transform(embedding::DOUBLE[],
                          x -> floor(x * 1000 + 0.5)) AS vq
    FROM embeddings
), celled AS (
    SELECT vec_id, embedding, cid AS cell FROM (
        SELECT b.vec_id, b.embedding, c.cid,
               row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.vq, c.cq) DESC,
                            c.cid ASC) AS r
        FROM base b, cent c) WHERE r = 1
), q AS (
    SELECT vec_id AS query_id, embedding AS qemb, vq AS qq
    FROM base WHERE vec_id < 8
), probe AS (
    SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_dot_product(q.qq, c.cq) DESC,
                            c.cid ASC) AS r
        FROM q, cent c) WHERE r <= 2
), cand AS (
    SELECT q.query_id, e.vec_id,
           CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[],
                                             q.qemb::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM celled e
    JOIN probe p ON e.cell = p.cid
    JOIN q ON q.query_id = p.query_id
    WHERE e.vec_id != q.query_id
), summary AS (
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_cand,
           CAST(SUM(CASE WHEN sim_e6 >= 200000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_in_range,
           CAST(MAX(CASE WHEN sim_e6 >= 200000 THEN sim_e6 END)
                AS DOUBLE) / 1000000 AS max_sim,
           CAST(MIN(CASE WHEN sim_e6 >= 200000 THEN sim_e6 END)
                AS DOUBLE) / 1000000 AS min_sim_in_range
    FROM cand GROUP BY query_id
), nearest AS (
    SELECT query_id, vec_id AS nearest_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_e6 DESC, vec_id ASC) AS r
        FROM cand WHERE sim_e6 >= 200000) WHERE r = 1
)
SELECT q.query_id,
       CAST(COALESCE(s.n_cand, 0) AS BIGINT) AS n_cand,
       CAST(COALESCE(s.n_in_range, 0) AS BIGINT) AS n_in_range,
       s.max_sim, s.min_sim_in_range, n.nearest_id
FROM q LEFT JOIN summary s USING (query_id)
LEFT JOIN nearest n USING (query_id)
"""

# IVF-pruned bitext mining: identical cell/probe CTEs, the mining
# batch (label 0, every 5th id) as the query side, then the exact
# key's margin algebra over the probed candidates only (neighborhood
# means candidate-set normalized — both engines replay the identical
# pruning, so every rank/cut integer agrees).
ORACLE["sim_margin_bitext_mine_ivf"] = """
WITH cent AS (
    SELECT vec_id AS cid,
           list_transform(embedding::DOUBLE[],
                          x -> floor(x * 1000 + 0.5)) AS cq
    FROM embeddings WHERE vec_id IN (100, 101, 102, 103)
), base AS (
    SELECT vec_id, label, embedding,
           list_transform(embedding::DOUBLE[],
                          x -> floor(x * 1000 + 0.5)) AS vq
    FROM embeddings
), celled AS (
    SELECT vec_id, label, embedding, cid AS cell FROM (
        SELECT b.vec_id, b.label, b.embedding, c.cid,
               row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.vq, c.cq) DESC,
                            c.cid ASC) AS r
        FROM base b, cent c) WHERE r = 1
), q AS (
    SELECT vec_id AS xid, embedding AS qemb, vq AS qq
    FROM base WHERE label = 0 AND vec_id % 5 = 0
), probe AS (
    SELECT xid, cid FROM (
        SELECT q.xid, c.cid,
               row_number() OVER (
                   PARTITION BY q.xid
                   ORDER BY list_dot_product(q.qq, c.cq) DESC,
                            c.cid ASC) AS r
        FROM q, cent c) WHERE r <= 2
), p AS (
    SELECT q.xid, e.vec_id AS yid,
           CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[],
                                             q.qemb::DOUBLE[])
                      * 1e6 + 0.5) AS BIGINT) AS sim_e6
    FROM celled e
    JOIN probe pr ON e.cell = pr.cid
    JOIN q ON q.xid = pr.xid
    WHERE e.label = 1
), f AS (
    SELECT xid, CAST(SUM(sim_e6) AS BIGINT) AS sum_f,
           CAST(COUNT(*) AS BIGINT) AS cnt_f FROM (
        SELECT xid, sim_e6,
               row_number() OVER (PARTITION BY xid
                                  ORDER BY sim_e6 DESC, yid ASC) AS rf
        FROM p) WHERE rf <= 4 GROUP BY xid
), b AS (
    SELECT yid, CAST(SUM(sim_e6) AS BIGINT) AS sum_b,
           CAST(COUNT(*) AS BIGINT) AS cnt_b FROM (
        SELECT yid, sim_e6,
               row_number() OVER (PARTITION BY yid
                                  ORDER BY sim_e6 DESC, xid ASC) AS rb
        FROM p) WHERE rb <= 4 GROUP BY yid
), s AS (
    SELECT p.xid, p.yid, p.sim_e6, f.cnt_f, b.cnt_b,
           2 * f.cnt_f * b.cnt_b * p.sim_e6
             - b.cnt_b * f.sum_f - f.cnt_f * b.sum_b AS m_num,
           (2 * f.cnt_f * b.cnt_b * p.sim_e6
             - b.cnt_b * f.sum_f - f.cnt_f * b.sum_b)
             * (12 // b.cnt_b) AS m_key
    FROM p JOIN f USING (xid) JOIN b USING (yid)
), best AS (
    SELECT *, row_number() OVER (PARTITION BY xid
                                 ORDER BY m_key DESC, yid ASC) AS r
    FROM s
)
SELECT xid, yid, CAST(sim_e6 AS DOUBLE) / 1000000 AS sim,
       CAST(CAST(SIGN(m_num) AS BIGINT)
            * ((2 * ABS(m_num) * 1000000 + 2 * cnt_f * cnt_b * 1000000)
               // (2 * 2 * cnt_f * cnt_b * 1000000))
            AS DOUBLE) / 1000000 AS margin
FROM best WHERE r = 1 AND m_num > 0
"""

# --- r9 eval additions: paired model comparison + memorization ------------

def _agreement_sql() -> str:
    from ..operators.text import LANG_PRIORITY, LANG_STOPWORDS

    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        return (f"len(list_filter(string_split(text,' '), "
                f"t -> t IN ({lst})))")

    en = LANG_PRIORITY[0]
    pb = " AND ".join(f"{hits(en)} >= {hits(lo)}"
                      for lo in LANG_PRIORITY[1:])
    r6 = lambda num, den, alias: (  # noqa: E731
        f"CAST(CAST(SIGN({num}) AS BIGINT)"
        f" * ((2 * CAST(ABS({num}) AS HUGEINT) * 1000000 + {den})"
        f"    // (2 * CAST({den} AS HUGEINT))) AS DOUBLE)"
        f" / 1000000.0 AS {alias}")
    return f"""
WITH base AS (
    SELECT (lang = 'en') AS truth,
           (({hits(en)} * 1000000)
            // len(string_split(text,' '))) >= 50000 AS pa,
           ({pb}) AS pb
    FROM documents
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN pa = pb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
           CAST(SUM(CASE WHEN pa THEN 1 ELSE 0 END) AS BIGINT) AS a_pos,
           CAST(SUM(CASE WHEN pb THEN 1 ELSE 0 END) AS BIGINT) AS b_pos,
           CAST(SUM(CASE WHEN pa = truth THEN 1 ELSE 0 END) AS BIGINT)
               AS a_correct,
           CAST(SUM(CASE WHEN pb = truth THEN 1 ELSE 0 END) AS BIGINT)
               AS b_correct,
           CAST(SUM(CASE WHEN pa = truth AND pb != truth
                    THEN 1 ELSE 0 END) AS BIGINT) AS mc_b,
           CAST(SUM(CASE WHEN pa != truth AND pb = truth
                    THEN 1 ELSE 0 END) AS BIGINT) AS mc_c
    FROM base
), en2 AS (
    -- HUGEINT products mirror the Spark side's DECIMAL(38,0): BIGINT
    -- n*n would raise past ~3.04e9 rows here (and wrap in non-ANSI
    -- Spark) — the same int64-wrap class as bm25_contrib_e6
    SELECT *,
           CAST(n AS HUGEINT) * n_agree
             - CAST(a_pos AS HUGEINT) * b_pos
             - (CAST(n AS HUGEINT) - a_pos) * (n - b_pos) AS k_num,
           GREATEST(CAST(n AS HUGEINT) * n
             - CAST(a_pos AS HUGEINT) * b_pos
             - (CAST(n AS HUGEINT) - a_pos) * (n - b_pos), 1) AS k_den,
           (CAST(mc_b AS HUGEINT) - mc_c) * (mc_b - mc_c) AS m_num,
           GREATEST(CAST(mc_b AS HUGEINT) + mc_c, 1) AS m_den
    FROM agg
)
SELECT n, n_agree, a_correct, b_correct, mc_b, mc_c,
       {r6('k_num', 'k_den', 'kappa')},
       {r6('m_num', 'm_den', 'mcnemar_chi2')},
       CASE WHEN a_correct > b_correct THEN 'a'
            WHEN b_correct > a_correct THEN 'b'
            ELSE 'tie' END AS better
FROM en2
"""


ORACLE["eval_classifier_agreement"] = _agreement_sql()

ORACLE["eval_memorization_spans"] = """
WITH gen_sh AS (
    SELECT doc_id,
           CAST(generate_subscripts(arr, 1) - 1 AS INTEGER) AS pos,
           unnest(arr) AS fp
    FROM (
        SELECT doc_id,
               CASE WHEN len(string_split(text,' ')) >= 8
               THEN list_transform(
                        range(1, len(string_split(text,' ')) - 6),
                        i -> ('0x' || substr(md5(array_to_string(
                                 string_split(text,' ')[i:i+7], ' ')),
                              1, 15))::BIGINT)
               ELSE [] END AS arr
        FROM documents WHERE doc_id < 50)
), train_fp AS (
    SELECT DISTINCT unnest(
        CASE WHEN len(string_split(text,' ')) >= 8
        THEN list_transform(
                 range(1, len(string_split(text,' ')) - 6),
                 i -> ('0x' || substr(md5(array_to_string(
                          string_split(text,' ')[i:i+7], ' ')),
                       1, 15))::BIGINT)
        ELSE [] END) AS fp
    FROM documents WHERE doc_id >= 50
), flagged AS (
    SELECT g.doc_id, g.pos,
           (t.fp IS NOT NULL) AS mem
    FROM gen_sh g LEFT JOIN train_fp t USING (fp)
), runs AS (
    SELECT doc_id, CAST(MAX(run_len) AS BIGINT) AS longest_run FROM (
        SELECT doc_id, grp, COUNT(*) AS run_len FROM (
            SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM flagged WHERE mem)
        GROUP BY doc_id, grp)
    GROUP BY doc_id
), per AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN mem THEN 1 ELSE 0 END) AS BIGINT)
               AS n_memorized
    FROM flagged GROUP BY doc_id
)
SELECT p.doc_id, p.n_shingles, p.n_memorized,
       CAST((2 * p.n_memorized * 1000000 + GREATEST(p.n_shingles, 1))
            // (2 * GREATEST(p.n_shingles, 1)) AS DOUBLE) / 1000000.0
           AS memorized_ratio,
       CAST(COALESCE(r.longest_run, 0) AS BIGINT)
           AS longest_run_shingles,
       CAST(CASE WHEN COALESCE(r.longest_run, 0) > 0
            THEN r.longest_run + 7 ELSE 0 END AS BIGINT)
           AS longest_span_tokens
FROM per p LEFT JOIN runs r USING (doc_id)
"""

ORACLE["stats_corpus_diff"] = """
WITH v1 AS (
    SELECT doc_id, source AS s1, md5(text) AS h1,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS t1
    FROM documents WHERE doc_id % 17 != 3
), v2 AS (
    SELECT doc_id, source AS s2,
           md5(CASE WHEN doc_id % 13 = 0 THEN text || ' rev2'
               ELSE text END) AS h2,
           CAST(len(string_split(CASE WHEN doc_id % 13 = 0
                    THEN text || ' rev2' ELSE text END, ' '))
               AS BIGINT) AS t2
    FROM documents WHERE doc_id % 17 != 0
), j AS (
    SELECT COALESCE(v1.source_s, v2.source_s) AS source,
           CASE WHEN h1 IS NULL THEN 'added'
                WHEN h2 IS NULL THEN 'removed'
                WHEN h1 = h2 THEN 'unchanged'
                ELSE 'changed' END AS status,
           COALESCE(t2, 0) - COALESCE(t1, 0) AS tok_delta
    FROM (SELECT doc_id, s1 AS source_s, h1, t1 FROM v1) v1
    FULL OUTER JOIN (SELECT doc_id, s2 AS source_s, h2, t2 FROM v2) v2
    USING (doc_id)
)
SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok_delta) AS BIGINT) AS token_delta
FROM j GROUP BY source, status
"""

# JDBC warehouse roundtrip: base nation (overwrite) + the +100-shifted
# append, aggregated per region — a lost insert or double append
# breaks n_rows/key_sum.
ORACLE["sink_jdbc_roundtrip"] = """
WITH wh AS (
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    UNION ALL
    SELECT n_nationkey + 100, n_name, n_regionkey FROM nation
)
SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_nation
FROM wh GROUP BY n_regionkey ORDER BY n_regionkey
"""

# streaming JDBC warehouse load: same lossless-roundtrip contract as
# the parquet foreachBatch twin.
ORACLE["stream_jdbc_warehouse_live"] = ORACLE["stream_foreach_batch_sink"]

# UniMax waterfilling: same integer closed form, free to use windows
# here (the Spark lane is the one the scale gate audits).
ORACLE["mixture_unimax_budget"] = """
WITH avail AS (
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS available
    FROM documents GROUP BY lang
), u AS (
    SELECT lang, available, 2 * available AS usable FROM avail
), r AS (
    SELECT *,
           row_number() OVER (ORDER BY usable, lang) - 1 AS i,
           COALESCE(SUM(usable) OVER (
               ORDER BY usable, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS s_i,
           COUNT(*) OVER () AS n
    FROM u
), f AS (
    SELECT *, usable * (n - i) <= 50000 - s_i AS exhausted FROM r
), kline AS (
    SELECT CAST(SUM(CASE WHEN exhausted THEN 1 ELSE 0 END) AS BIGINT)
               AS k,
           CAST(SUM(CASE WHEN exhausted THEN usable ELSE 0 END)
               AS BIGINT) AS s_k
    FROM f
), a AS (
    SELECT f.*, kline.k, kline.s_k,
           50000 - kline.s_k AS rem,
           GREATEST(f.n - kline.k, 1) AS den
    FROM f, kline
), ranked AS (
    SELECT *,
           CASE WHEN exhausted THEN NULL
                ELSE row_number() OVER (PARTITION BY exhausted
                                        ORDER BY lang) - 1 END AS urank
    FROM a
), alloc AS (
    SELECT *,
           CASE WHEN exhausted THEN usable
                ELSE rem // den
                     + CASE WHEN urank < rem % den THEN 1 ELSE 0 END
           END AS alloc_tokens
    FROM ranked
)
SELECT lang, available AS available_tokens, usable AS cap_tokens,
       CAST(alloc_tokens AS BIGINT) AS alloc_tokens, exhausted,
       CAST((2 * alloc_tokens * 1000000 + GREATEST(available, 1))
            // (2 * GREATEST(available, 1)) AS DOUBLE) / 1000000.0
           AS epochs
FROM alloc ORDER BY lang
"""

# live CDC merge: identical contract to the batch apply.
ORACLE["stream_cdc_apply_live"] = ORACLE["cdc_apply_changes"]

# catalog column statistics must equal exact recomputation; string
# columns carry no min/max in Spark's catalog (NULL on both sides).
ORACLE["maintenance_column_stats"] = """
SELECT 'n_name' AS col_name,
       CAST(COUNT(DISTINCT n_name) AS BIGINT) AS distinct_count,
       CAST(SUM(CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS num_nulls,
       CAST(NULL AS BIGINT) AS min_val, CAST(NULL AS BIGINT) AS max_val
FROM nation
UNION ALL
SELECT 'n_nationkey',
       CAST(COUNT(DISTINCT n_nationkey) AS BIGINT),
       CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
           AS BIGINT),
       CAST(MIN(n_nationkey) AS BIGINT), CAST(MAX(n_nationkey) AS BIGINT)
FROM nation
UNION ALL
SELECT 'n_regionkey',
       CAST(COUNT(DISTINCT n_regionkey) AS BIGINT),
       CAST(SUM(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END)
           AS BIGINT),
       CAST(MIN(n_regionkey) AS BIGINT), CAST(MAX(n_regionkey) AS BIGINT)
FROM nation
ORDER BY col_name
"""

# 3 synchronous LPA rounds unrolled (pagerank_fixed convention):
# most-frequent neighbor label, ties to the smallest label.
ORACLE["graph_label_propagation"] = """
WITH pairs AS (
    SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS c_node,
                    'S' || CAST(l_suppkey AS VARCHAR) AS s_node
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
    SELECT c_node AS src, s_node AS dst FROM pairs
    UNION ALL
    SELECT s_node AS src, c_node AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
l0 AS (SELECT node, node AS lbl FROM nodes),
m1 AS (SELECT e.dst, l.lbl, COUNT(*) AS cnt
       FROM edges e JOIN l0 l ON e.src = l.node GROUP BY 1, 2),
b1 AS (SELECT dst, lbl FROM (
           SELECT dst, lbl, row_number() OVER (
               PARTITION BY dst ORDER BY cnt DESC, lbl ASC) AS r
           FROM m1) WHERE r = 1),
l1 AS (SELECT n.node, COALESCE(b.lbl, n.node) AS lbl
       FROM nodes n LEFT JOIN b1 b ON n.node = b.dst),
m2 AS (SELECT e.dst, l.lbl, COUNT(*) AS cnt
       FROM edges e JOIN l1 l ON e.src = l.node GROUP BY 1, 2),
b2 AS (SELECT dst, lbl FROM (
           SELECT dst, lbl, row_number() OVER (
               PARTITION BY dst ORDER BY cnt DESC, lbl ASC) AS r
           FROM m2) WHERE r = 1),
l2 AS (SELECT n.node, COALESCE(b.lbl, n.node) AS lbl
       FROM nodes n LEFT JOIN b2 b ON n.node = b.dst),
m3 AS (SELECT e.dst, l.lbl, COUNT(*) AS cnt
       FROM edges e JOIN l2 l ON e.src = l.node GROUP BY 1, 2),
b3 AS (SELECT dst, lbl FROM (
           SELECT dst, lbl, row_number() OVER (
               PARTITION BY dst ORDER BY cnt DESC, lbl ASC) AS r
           FROM m3) WHERE r = 1),
l3 AS (SELECT n.node, COALESCE(b.lbl, n.node) AS lbl
       FROM nodes n LEFT JOIN b3 b ON n.node = b.dst)
SELECT lbl AS community_label, CAST(COUNT(*) AS BIGINT) AS n_members
FROM l3 GROUP BY lbl
ORDER BY n_members DESC, community_label ASC
LIMIT 10
"""

# Spearman mid-rank rho: r2 = 2*(RANK-1) + tie_count + 1 per signal,
# classical 6*sum(d^2) formula on the same integers.
ORACLE["eval_rank_correlation"] = """
WITH base AS (
    SELECT ((len(list_filter(string_split(text,' '),
                 t -> t IN ('the', 'a', 'of', 'and', 'to')))
             * 1000000)
            // len(string_split(text,' '))) AS a,
           CAST(len(string_split(text,' ')) AS BIGINT) AS b
    FROM documents
), r AS (
    SELECT a, b,
           2 * (RANK() OVER (ORDER BY a) - 1)
             + COUNT(*) OVER (PARTITION BY a) + 1 AS ra,
           2 * (RANK() OVER (ORDER BY b) - 1)
             + COUNT(*) OVER (PARTITION BY b) + 1 AS rb
    FROM base
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ra - rb AS HUGEINT) * (ra - rb)) AS HUGEINT)
               AS sum_d2_x4
    FROM r
), fin AS (
    SELECT n, sum_d2_x4,
           4 * CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1)
             - 6 * sum_d2_x4 AS num,
           GREATEST(4 * CAST(n AS HUGEINT)
                    * (CAST(n AS HUGEINT) * n - 1), 1) AS den
    FROM fin_src
)
SELECT n, CAST(sum_d2_x4 AS BIGINT) AS sum_d2_x4,
       CAST(CAST(SIGN(num) AS BIGINT)
            * ((2 * CAST(ABS(num) AS HUGEINT) * 1000000 + den)
               // (2 * den)) AS DOUBLE) / 1000000.0 AS rho
FROM fin
"""
ORACLE.amend("eval_rank_correlation", "FROM fin_src", "FROM agg")

# binaryFile ingestion: blob bytes must equal the source documents'
# UTF-8 encoding exactly.
ORACLE["source_binaryfile_blobs"] = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS content_sha256
FROM documents WHERE doc_id < 20 ORDER BY doc_id
"""

# --- round-10 pattern-mining / preference-query pack -----------------------

# Multi-source BFS, 3 unrolled frontier rounds (the quadratic NOT-IN
# anti-joins here are the oracle's prerogative; the Spark plan uses
# node-keyed left-anti joins).
ORACLE["graph_bfs_distances"] = """
WITH pairs AS (
    SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS c_node,
                    'S' || CAST(l_suppkey AS VARCHAR) AS s_node
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
    SELECT c_node AS src, s_node AS dst FROM pairs
    UNION ALL
    SELECT s_node AS src, c_node AS dst FROM pairs),
f0 AS (SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR) AS node
       FROM supplier WHERE s_suppkey % 16 = 7),
f1 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN f0 ON e.src = f0.node
       WHERE e.dst NOT IN (SELECT node FROM f0)),
f2 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN f1 ON e.src = f1.node
       WHERE e.dst NOT IN (SELECT node FROM f0 UNION ALL
                           SELECT node FROM f1)),
f3 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN f2 ON e.src = f2.node
       WHERE e.dst NOT IN (SELECT node FROM f0 UNION ALL
                           SELECT node FROM f1 UNION ALL
                           SELECT node FROM f2))
SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
    SELECT 0 AS dist, node FROM f0
    UNION ALL SELECT 1, node FROM f1
    UNION ALL SELECT 2, node FROM f2
    UNION ALL SELECT 3, node FROM f3)
GROUP BY dist ORDER BY dist
"""

# Apriori-pruned brand-pair co-occurrence with integer support/lift.
ORACLE["mining_basket_pairs"] = """
WITH basket AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
                FROM lineitem JOIN part ON l_partkey = p_partkey),
nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM basket),
freq AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM basket GROUP BY b),
fitems AS (SELECT f.b, f.cnt FROM freq f, nb WHERE f.cnt * 100 >= nb.n),
fb AS (SELECT ba.o, ba.b, fi.cnt
       FROM basket ba JOIN fitems fi ON ba.b = fi.b),
pairs AS (SELECT a.b AS brand_a, c.b AS brand_b,
                 a.cnt AS cnt_a, c.cnt AS cnt_b,
                 CAST(COUNT(*) AS BIGINT) AS pair_cnt
          FROM fb a JOIN fb c ON a.o = c.o AND a.b < c.b
          GROUP BY 1, 2, 3, 4)
SELECT brand_a, brand_b, pair_cnt,
       CAST(CAST(pair_cnt AS HUGEINT) * 1000000 // n AS BIGINT)
           AS support_e6,
       CAST(CAST(pair_cnt AS HUGEINT) * n * 1000000
            // (CAST(cnt_a AS HUGEINT) * cnt_b) AS BIGINT) AS lift_e6
FROM pairs, nb
ORDER BY pair_cnt DESC, brand_a, brand_b LIMIT 15
"""

# Skyline: the oracle IS the textbook quadratic dominance anti-join —
# exactly what the Spark plan must never do; agreement proves the
# bucket-prune + refine plan computes the same set.
ORACLE["query_pareto_skyline"] = """
WITH m AS (SELECT l_suppkey AS suppkey,
    CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                        + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1)
SELECT suppkey, revenue_e4, total_qty FROM m p
WHERE NOT EXISTS (
    SELECT 1 FROM m q
    WHERE q.revenue_e4 >= p.revenue_e4 AND q.total_qty >= p.total_qty
      AND (q.revenue_e4 > p.revenue_e4 OR q.total_qty > p.total_qty))
ORDER BY revenue_e4 DESC, suppkey
"""

# Exponential time-decay attribution: weight = 64 >> whole-days-ago,
# credit = floor-share of the purchase's cents.
ORACLE["attribution_time_decay"] = """
WITH purch AS (SELECT event_id AS p_eid, user_id, epoch_us(ts) AS p_us,
                      CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_e2
               FROM events WHERE event_type = 'purchase'),
touch AS (SELECT user_id, epoch_us(ts) AS t_us, event_type AS t_type
          FROM events WHERE event_type <> 'purchase'),
j AS (SELECT p.p_eid, p.value_e2, t.t_type,
             CAST(64 >> CAST((p.p_us - t.t_us) // 86400000000 AS INT)
                  AS BIGINT) AS w
      FROM purch p JOIN touch t ON p.user_id = t.user_id
      WHERE t.t_us < p.p_us AND t.t_us > p.p_us - 604800000000),
tot AS (SELECT p_eid, CAST(SUM(w) AS BIGINT) AS tot_w FROM j GROUP BY 1),
credit AS (SELECT j.t_type, j.w,
                  (j.value_e2 * j.w) // tot.tot_w AS credit_e2
           FROM j JOIN tot ON j.p_eid = tot.p_eid),
attributed AS (SELECT t_type AS entry_type,
                      CAST(COUNT(*) AS BIGINT) AS n_credits,
                      CAST(SUM(w) AS BIGINT) AS weight_units,
                      CAST(SUM(credit_e2) AS BIGINT) AS credited_e2
               FROM credit GROUP BY 1),
direct AS (SELECT '(direct)' AS entry_type,
                  CAST(COUNT(*) AS BIGINT) AS n_credits,
                  CAST(0 AS BIGINT) AS weight_units,
                  CAST(SUM(value_e2) AS BIGINT) AS credited_e2
           FROM purch
           WHERE p_eid NOT IN (SELECT DISTINCT p_eid FROM j))
SELECT * FROM (
    SELECT * FROM attributed
    UNION ALL
    SELECT * FROM direct WHERE n_credits > 0)
ORDER BY credited_e2 DESC, entry_type
"""

# Per-source winsorization at exact rank bounds (0-based index
# (n*10) div 100 from each end over deterministic (n_chars, doc_id)
# order — NOT percentile_disc, whose index convention differs
# between engines).
ORACLE["curate_winsorize_scores"] = """
WITH ranked AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
    FROM documents),
bounds AS (
    SELECT source,
           MAX(CASE WHEN rn = (n*10)//100 + 1 THEN n_chars END) AS lo,
           MAX(CASE WHEN rn = n - (n*10)//100 THEN n_chars END) AS hi
    FROM ranked GROUP BY source)
SELECT r.source, CAST(COUNT(*) AS BIGINT) AS n_docs, b.lo, b.hi,
       CAST(SUM(r.n_chars) AS BIGINT) AS sum_raw,
       CAST(SUM(LEAST(GREATEST(r.n_chars, b.lo), b.hi)) AS BIGINT)
           AS sum_winsor
FROM ranked r JOIN bounds b ON r.source = b.source
GROUP BY r.source, b.lo, b.hi ORDER BY r.source
"""

# Two-sample KS: exact integer numerator over n_ref*n_cur; the
# oracle's global window is single-node DuckDB's prerogative (the
# Spark plan uses the distributed-histogram idiom).
ORACLE["dq_ks_drift"] = """
WITH pop AS (
    SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
    FROM events WHERE event_type IN ('view','click','purchase')),
n AS (SELECT CAST(SUM(1-grp) AS BIGINT) AS n_ref,
             CAST(SUM(grp) AS BIGINT) AS n_cur FROM pop),
h AS (SELECT v, CAST(SUM(1-grp) AS BIGINT) AS c_ref,
             CAST(SUM(grp) AS BIGINT) AS c_cur
      FROM pop GROUP BY v),
cum AS (SELECT v,
        SUM(c_ref) OVER (ORDER BY v) AS cum_ref,
        SUM(c_cur) OVER (ORDER BY v) AS cum_cur FROM h),
d AS (SELECT v, ABS(CAST(cum_ref AS HUGEINT)*n.n_cur
                    - CAST(cum_cur AS HUGEINT)*n.n_ref) AS num
      FROM cum, n)
SELECT n.n_ref, n.n_cur,
       CAST(MAX(d.num) AS BIGINT) AS ks_num,
       CAST(MAX(d.num) * 1000000
            // (CAST(n.n_ref AS HUGEINT) * n.n_cur) AS BIGINT) AS ks_e6,
       CAST(MIN(CASE WHEN d.num = (SELECT MAX(num) FROM d)
                     THEN d.v END) AS BIGINT) AS at_value_e2
FROM d, n GROUP BY n.n_ref, n.n_cur
"""

# Chi-square independence: per-cell exact rational floored at 1e-6;
# dow via epoch-day mod 7 (engine-agnostic origin).
ORACLE["dq_chi_square_assoc"] = """
WITH cell AS (SELECT event_type AS et,
                     CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS INT)
                         AS dow,
                     CAST(COUNT(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2),
r AS (SELECT et, CAST(SUM(o) AS BIGINT) AS rt FROM cell GROUP BY 1),
c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct FROM cell GROUP BY 1),
nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cell),
terms AS (SELECT cell.et, cell.dow,
    (CAST(cell.o AS HUGEINT)*nn.n - CAST(r.rt AS HUGEINT)*c.ct) AS dev,
    CAST(r.rt AS HUGEINT)*c.ct*nn.n AS den
  FROM cell JOIN r USING(et) JOIN c USING(dow), nn)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(((SELECT COUNT(*) FROM r) - 1)
            * ((SELECT COUNT(*) FROM c) - 1) AS BIGINT) AS dof,
       CAST(SUM(dev*dev*1000000 // den) AS BIGINT) AS chi2_e6
FROM terms
"""

# t-closeness: ordered-attribute EMD per QI group vs the global band
# distribution, exact over the common denominator n_g*N.
ORACLE["privacy_t_closeness"] = """
WITH cust AS (SELECT c_nationkey % 5 AS qi_nation,
                     c_mktsegment AS qi_seg,
    LEAST(9, GREATEST(0, (CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)
                          + 100000) // 110000)) AS band
  FROM customer),
g AS (SELECT qi_nation, qi_seg, band, CAST(COUNT(*) AS BIGINT) AS cg
      FROM cust GROUP BY 1, 2, 3),
gt AS (SELECT qi_nation, qi_seg, CAST(SUM(cg) AS BIGINT) AS ng
       FROM g GROUP BY 1, 2),
gl AS (SELECT band, CAST(SUM(cg) AS BIGINT) AS cb FROM g GROUP BY 1),
nn AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM g),
spine AS (SELECT gt.qi_nation, gt.qi_seg, gt.ng, gl.band, gl.cb,
                 COALESCE(g.cg, 0) AS cgf
          FROM gt CROSS JOIN gl
          LEFT JOIN g ON g.qi_nation = gt.qi_nation
                     AND g.qi_seg = gt.qi_seg AND g.band = gl.band),
cum AS (SELECT qi_nation, qi_seg, ng, band,
               SUM(cgf) OVER (PARTITION BY qi_nation, qi_seg
                              ORDER BY band) AS cum_g,
               SUM(cb) OVER (PARTITION BY qi_nation, qi_seg
                             ORDER BY band) AS cum_b
        FROM spine),
emd AS (SELECT qi_nation, qi_seg, ng,
       CAST(SUM(ABS(CAST(cum_g AS HUGEINT)*nn.n
                    - CAST(cum_b AS HUGEINT)*ng)) * 1000000
            // (9 * CAST(ng AS HUGEINT) * nn.n) AS BIGINT) AS emd_e6
  FROM cum, nn WHERE band < 9
  GROUP BY qi_nation, qi_seg, ng, nn.n)
SELECT qi_nation, qi_seg, ng, emd_e6,
       CAST(CASE WHEN emd_e6 > 150000 THEN 1 ELSE 0 END AS INT)
           AS t_violation
FROM emd
ORDER BY emd_e6 DESC, qi_nation, qi_seg LIMIT 20
"""

# Binary-code hamming ANN: per-dim sign codes vs exact integer e6
# means (components offset non-negative so // and div agree),
# XOR+popcount ranking.
ORACLE["sim_hamming_topk"] = """
WITH ex AS (SELECT vec_id, t.j,
                   CAST(FLOOR(embedding[t.j+1]*1000000 + 0.5) AS BIGINT)
                       + 10000000 AS xe
            FROM embeddings, UNNEST(range(0,64)) AS t(j)),
mu AS (SELECT j, CAST(SUM(CAST(xe AS HUGEINT)) // COUNT(*) AS BIGINT) AS m
       FROM ex GROUP BY j),
bits AS (SELECT e.vec_id, e.j,
                CASE WHEN e.xe >= mu.m THEN 1 ELSE 0 END AS b
         FROM ex e JOIN mu USING(j)),
codes AS (SELECT vec_id,
          CAST(COALESCE(SUM(CASE WHEN j < 32
               THEN b * (CAST(1 AS BIGINT) << (j % 32)) END), 0)
               AS BIGINT) AS c1,
          CAST(COALESCE(SUM(CASE WHEN j >= 32
               THEN b * (CAST(1 AS BIGINT) << (j % 32)) END), 0)
               AS BIGINT) AS c2
          FROM bits GROUP BY vec_id),
q AS (SELECT vec_id AS qid, c1 AS q1, c2 AS q2 FROM codes
      WHERE vec_id < 4),
h AS (SELECT q.qid, c.vec_id,
             CAST(bit_count(xor(q.q1, c.c1))
                  + bit_count(xor(q.q2, c.c2)) AS BIGINT) AS hd
      FROM codes c, q WHERE c.vec_id <> q.qid),
rk AS (SELECT qid, vec_id, hd,
              row_number() OVER (PARTITION BY qid
                                 ORDER BY hd, vec_id) AS r FROM h)
SELECT qid, vec_id, hd FROM rk WHERE r <= 5 ORDER BY qid, hd, vec_id
"""

# Heaps law: trigram first-occurrence aggregate, conditional counts
# at four doc_id quartile cuts.
ORACLE["text_heaps_law"] = """
WITH tri AS (
    SELECT doc_id, UNNEST(
        CASE WHEN len(string_split(text,' ')) >= 3
             THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                  i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
             ELSE [] END) AS g
    FROM documents),
fo AS (SELECT g, MIN(doc_id) AS fd FROM tri GROUP BY g),
dt AS (SELECT doc_id,
              GREATEST(len(string_split(text,' ')) - 2, 0) AS nt
       FROM documents),
b AS (SELECT MAX(doc_id)+1 AS m FROM documents),
vocab AS (SELECT q AS quartile,
                 CAST(COUNT(*) FILTER (WHERE fd < q*b.m//4) AS BIGINT)
                     AS vocab
          FROM fo, b, generate_series(1,4) AS qs(q) GROUP BY q, b.m),
toks AS (SELECT q AS quartile,
                CAST(COUNT(*) FILTER (WHERE doc_id < q*b.m//4) AS BIGINT)
                    AS n_docs,
                CAST(SUM(nt) FILTER (WHERE doc_id < q*b.m//4) AS BIGINT)
                    AS n_grams
         FROM dt, b, generate_series(1,4) AS qs(q) GROUP BY q, b.m)
SELECT t.quartile, t.n_docs, t.n_grams, v.vocab
FROM toks t JOIN vocab v USING(quartile)
ORDER BY t.quartile
"""

# mapInArrow token counts == engine-side split() counts.
ORACLE["udf_map_in_arrow"] = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS sum_tokens
FROM documents GROUP BY source ORDER BY source
"""

# DPP roundtrip: the pruned partitioned scan must equal aggregating
# the raw fact over the runtime month dim.
ORACLE["scan_dynamic_partition_pruning"] = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') IN (
    SELECT DISTINCT strftime(o_orderdate, '%Y-%m')
    FROM orders WHERE year(o_orderdate) = 1997)
GROUP BY 1 ORDER BY 1
"""

# GROUPED_AGG pandas UDF: the lower median is the 1-based
# (n+1)//2-th order statistic.
ORACLE["udf_pandas_grouped_agg"] = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(list_sort(list(n_chars))[(COUNT(*)+1)//2] AS BIGINT)
           AS median_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source ORDER BY source
"""

# Bellman-Ford: 3 unrolled min-plus relaxations as chained CTEs.
ORACLE["graph_weighted_sssp"] = """
WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
            FROM lineitem),
ok AS (SELECT o FROM os GROUP BY o HAVING COUNT(*) <= 64),
pe AS (SELECT a.s AS u, b.s AS v, COUNT(*) AS shared
       FROM os a JOIN os b ON a.o = b.o AND a.s <> b.s
       WHERE a.o IN (SELECT o FROM ok)
       GROUP BY 1, 2),
edges AS (SELECT u, v, CAST(1000000 // shared AS BIGINT) AS w FROM pe),
d0 AS (SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS dist
       FROM supplier WHERE s_suppkey % 16 = 7),
m1 AS (SELECT e.v AS node, MIN(d.dist + e.w) AS dist
       FROM edges e JOIN d0 d ON e.u = d.node GROUP BY 1),
d1 AS (SELECT node, MIN(dist) AS dist FROM
       (SELECT * FROM d0 UNION ALL SELECT * FROM m1) GROUP BY 1),
m2 AS (SELECT e.v AS node, MIN(d.dist + e.w) AS dist
       FROM edges e JOIN d1 d ON e.u = d.node GROUP BY 1),
d2 AS (SELECT node, MIN(dist) AS dist FROM
       (SELECT * FROM d1 UNION ALL SELECT * FROM m2) GROUP BY 1),
m3 AS (SELECT e.v AS node, MIN(d.dist + e.w) AS dist
       FROM edges e JOIN d2 d ON e.u = d.node GROUP BY 1),
d3 AS (SELECT node, MIN(dist) AS dist FROM
       (SELECT * FROM d2 UNION ALL SELECT * FROM m3) GROUP BY 1)
SELECT CAST(node AS BIGINT) AS suppkey, CAST(dist AS BIGINT) AS dist_e6
FROM d3 WHERE dist > 0 ORDER BY dist_e6, suppkey LIMIT 10
"""

# Neyman allocation: integer moments -> one IEEE sqrt -> Hamilton
# largest-remainder apportionment (rank via correlated count, the
# same integer arithmetic as the Spark self-join).
ORACLE["sample_neyman_allocation"] = """
WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
                  CAST(SUM(CAST(n_chars AS HUGEINT)*n_chars) AS HUGEINT)
                      AS sx2,
                  CAST(SUM(n_chars) AS HUGEINT) AS sx
           FROM documents GROUP BY source),
wgt AS (SELECT source, nh,
               CAST(FLOOR(SQRT(CAST(nh*sx2 - sx*sx AS DOUBLE)))
                    AS BIGINT) AS wh
        FROM s),
tot AS (SELECT CAST(GREATEST(SUM(wh), 1) AS BIGINT) AS wt FROM wgt),
base AS (SELECT w.source, w.nh, w.wh,
                CAST((100 * w.wh) // t.wt AS BIGINT) AS base_h,
                CAST((100 * w.wh) % t.wt AS BIGINT) AS rem_h
         FROM wgt w, tot t),
leftover AS (SELECT CAST(100 - SUM(base_h) AS BIGINT) AS k FROM base),
ranked AS (SELECT b.source, b.nh, b.wh, b.base_h,
                  (SELECT COUNT(*) FROM base o
                   WHERE o.rem_h > b.rem_h
                      OR (o.rem_h = b.rem_h AND o.source < b.source))
                      AS rnk
           FROM base b)
SELECT r.source, r.nh, r.wh,
       CAST(r.base_h + CASE WHEN r.rnk < l.k THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM ranked r, leftover l ORDER BY r.source
"""


# The live KS monitor is held to the identical batch oracle (the
# *_live contract: complete-mode availableNow snapshot == batch).
ORACLE["stream_ks_drift_live"] = ORACLE["dq_ks_drift"]

# The privacy release gate: all three stages composed on one QI
# lineage; one row per QI group with each stage's verdict.
ORACLE["pipeline_release_gate"] = """
WITH cust AS (SELECT c_nationkey AS qi_nation, c_mktsegment AS qi_seg,
    LEAST(9, GREATEST(0, (CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)
                          + 100000) // 110000)) AS band
  FROM customer),
g AS (SELECT qi_nation, qi_seg, band, CAST(COUNT(*) AS BIGINT) AS cg
      FROM cust GROUP BY 1, 2, 3),
gt AS (SELECT qi_nation, qi_seg, CAST(SUM(cg) AS BIGINT) AS n_rows,
              CAST(COUNT(*) AS BIGINT) AS n_distinct_bands
       FROM g GROUP BY 1, 2),
gl AS (SELECT band, CAST(SUM(cg) AS BIGINT) AS cb FROM g GROUP BY 1),
nn AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM g),
spine AS (SELECT gt.qi_nation, gt.qi_seg, gt.n_rows, gl.band, gl.cb,
                 COALESCE(g.cg, 0) AS cgf
          FROM gt CROSS JOIN gl
          LEFT JOIN g ON g.qi_nation = gt.qi_nation
                     AND g.qi_seg = gt.qi_seg AND g.band = gl.band),
cum AS (SELECT qi_nation, qi_seg, n_rows, band,
               SUM(cgf) OVER (PARTITION BY qi_nation, qi_seg
                              ORDER BY band) AS cum_g,
               SUM(cb) OVER (PARTITION BY qi_nation, qi_seg
                             ORDER BY band) AS cum_b
        FROM spine),
emd AS (SELECT qi_nation, qi_seg,
       CAST(SUM(ABS(CAST(cum_g AS HUGEINT)*nn.n
                    - CAST(cum_b AS HUGEINT)*n_rows)) * 1000000
            // (9 * CAST(n_rows AS HUGEINT) * nn.n) AS BIGINT) AS emd_e6
  FROM cum, nn WHERE band < 9 GROUP BY qi_nation, qi_seg, n_rows, nn.n)
SELECT gt.qi_nation, gt.qi_seg, gt.n_rows, gt.n_distinct_bands,
       e.emd_e6,
       CAST(CASE WHEN gt.n_rows >= 10 THEN 1 ELSE 0 END AS INT)
           AS k_anonymous,
       CAST(CASE WHEN gt.n_distinct_bands >= 3 THEN 1 ELSE 0 END AS INT)
           AS diverse,
       CAST(CASE WHEN e.emd_e6 <= 150000 THEN 1 ELSE 0 END AS INT)
           AS close,
       CAST(CASE WHEN gt.n_rows >= 10 AND gt.n_distinct_bands >= 3
                  AND e.emd_e6 <= 150000 THEN 1 ELSE 0 END AS INT)
           AS released
FROM gt JOIN emd e ON gt.qi_nation = e.qi_nation
                  AND gt.qi_seg = e.qi_seg
ORDER BY gt.qi_nation, gt.qi_seg
"""

# MASE of the seasonal-naive forecast, scaled by in-sample one-step
# naive MAE; dense day spine so lags are calendar-true.
ORACLE["eval_forecast_mase"] = """
WITH daily AS (SELECT event_type AS et,
                      CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
b AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM daily),
spine AS (SELECT et, s.d FROM (SELECT DISTINCT et FROM daily),
          (SELECT UNNEST(range(b.dmin, b.dmax + 1)) AS d FROM b) s),
dense AS (SELECT s.et, s.d, COALESCE(daily.y, 0) AS y
          FROM spine s LEFT JOIN daily ON daily.et = s.et
                                      AND daily.d = s.d),
lagd AS (SELECT et, d, y,
                lag(y, 1) OVER (PARTITION BY et ORDER BY d) AS y1,
                lag(y, 7) OVER (PARTITION BY et ORDER BY d) AS y7
         FROM dense),
cut AS (SELECT dmax - 6 AS c FROM b),
tr AS (SELECT et, CAST(SUM(ABS(y - y1)) AS BIGINT)
                      AS train_naive_abs_err,
              CAST(COUNT(*) AS BIGINT) AS n_tr
       FROM lagd, cut WHERE d < cut.c AND y1 IS NOT NULL GROUP BY et),
ev AS (SELECT et, CAST(SUM(ABS(y - y7)) AS BIGINT) AS eval_abs_err,
              CAST(COUNT(*) AS BIGINT) AS n_eval_days
       FROM lagd, cut WHERE d >= cut.c AND y7 IS NOT NULL GROUP BY et)
SELECT ev.et AS event_type, ev.n_eval_days, ev.eval_abs_err,
       tr.train_naive_abs_err,
       CAST(CAST(ev.eval_abs_err AS HUGEINT) * tr.n_tr * 1000000
            // (CAST(ev.n_eval_days AS HUGEINT)
                * GREATEST(tr.train_naive_abs_err, 1)) AS BIGINT)
           AS mase_e6
FROM ev JOIN tr ON ev.et = tr.et
ORDER BY event_type
"""

# Composed daily-crawl serving loop (r10 verdict task 6): the dedup
# stages reuse pipeline_crawl_refresh's CTE chain verbatim (same
# %2 / %3 splits), the BM25 serve is the full-rebuild score over
# corpus ∪ survivors (_BM25_SCORED_SQL re-targeted at the rwset CTE
# — if the incremental batch=1 refresh lost, duplicated, or
# double-counted one posting the serve rows diverge), the refresh
# receipt states the SQL-provable batch-1 slice sizes (only right if
# the double write REPLACED), and the ANN row states the IVF
# family's oracle-by-construction constants (recall verified inside
# the Spark query).
ORACLE["pipeline_index_serve_refresh"] = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
), batch AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
), stage1 AS (
    SELECT b.doc_id, b.text FROM batch b
    WHERE md5(b.text) NOT IN (SELECT md5(text) FROM corpus)
), uni AS (
    SELECT doc_id, text, TRUE AS is_new FROM stage1
    UNION ALL
    SELECT doc_id, text, FALSE AS is_new FROM corpus
), toks0 AS (
    SELECT doc_id, is_new, string_split(text, ' ') AS t FROM uni
), sh AS (
    SELECT doc_id, is_new,
           list_distinct(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM toks0
), shf AS (
    SELECT doc_id, is_new,
           list_distinct(list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824)) AS hs
    FROM sh WHERE len(shingles) > 0
), sig AS (
    SELECT doc_id, is_new, hs,
           list_transform(range(0, 16),
               j -> list_min(list_transform(hs,
                    h -> ([{','.join(map(str, _A16))}][j+1] * h
                          + [{','.join(map(str, _B16))}][j+1]) % 1073741789))) AS mh
    FROM shf
), banded AS (
    SELECT doc_id, is_new,
           unnest(range(0, 4)) AS band,
           unnest(list_transform(range(0, 4),
               b -> md5(array_to_string(mh[b*4+1 : b*4+4], ',')))) AS band_hash
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_corpus
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash
     AND a.is_new AND NOT b.is_new
), neardup AS (
    SELECT DISTINCT id_new FROM cand
    JOIN shf x ON x.doc_id = cand.id_new
    JOIN shf y ON y.doc_id = cand.id_corpus
    WHERE ROUND(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                / len(list_distinct(x.hs || y.hs)), 6) >= 0.5
), stage2 AS (
    SELECT doc_id, text FROM stage1
    WHERE doc_id NOT IN (SELECT id_new FROM neardup)
), rwset AS (
    SELECT doc_id, text FROM corpus
    UNION ALL
    SELECT doc_id, text FROM stage2
), agg AS ({{BM25_RWSET}}),
bm25 AS (
    SELECT 'serve_bm25' AS stage,
           CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC)
                AS INTEGER) AS rank,
           CAST(doc_id AS BIGINT) AS id,
           CAST(score_e6 AS BIGINT) AS metric_e6
    FROM agg
    ORDER BY score_e6 DESC, doc_id ASC LIMIT 10
), receipt AS (
    SELECT 'refresh_receipt' AS stage, CAST(0 AS INTEGER) AS rank,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                SELECT DISTINCT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(string_split(text, ' ')) AS term
                    FROM stage2))) AS id,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM embeddings e JOIN stage2 s ON e.vec_id = s.doc_id)
               AS metric_e6
), ann AS (
    SELECT 'serve_ann' AS stage, CAST(0 AS INTEGER) AS rank,
           CAST(10 AS BIGINT) AS id, CAST(1 AS BIGINT) AS metric_e6
)
SELECT * FROM (
    SELECT * FROM bm25
    UNION ALL SELECT * FROM receipt
    UNION ALL SELECT * FROM ann)
ORDER BY stage, rank, id
""".replace("{BM25_RWSET}",
            _BM25_SCORED_SQL.replace("FROM documents", "FROM rwset"))

# ACF per event type at lags 1..7 (Box-Jenkins: full-series mean and
# variance): num and den multiplied through by n^2 so the centered
# terms are the integers (n*y - S); sign/abs split keeps the e6
# integer division engine-identical for negative correlations.
ORACLE["stats_autocorrelation"] = """
WITH daily AS (
    SELECT event_type AS et,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2),
b AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax,
             CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n FROM daily),
spine AS (
    SELECT t.et, s.d, b.n
    FROM (SELECT DISTINCT et FROM daily) t, b,
         LATERAL (SELECT unnest(generate_series(b.dmin, b.dmax)) AS d) s),
dense AS (
    SELECT sp.et, sp.d, sp.n, COALESCE(dl.y, 0) AS y
    FROM spine sp LEFT JOIN daily dl ON sp.et = dl.et AND sp.d = dl.d),
tot AS (SELECT et, CAST(SUM(y) AS BIGINT) AS s FROM dense GROUP BY 1),
lagged AS (
    SELECT de.et, de.n, de.y, t.s,
           lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2,
           lag(y, 3) OVER w AS y3, lag(y, 4) OVER w AS y4,
           lag(y, 5) OVER w AS y5, lag(y, 6) OVER w AS y6,
           lag(y, 7) OVER w AS y7
    FROM dense de JOIN tot t ON de.et = t.et
    WINDOW w AS (PARTITION BY de.et ORDER BY de.d)),
per_type AS (
    SELECT et, n,
           SUM(CAST(n*y - s AS HUGEINT) * (n*y - s)) AS den,
           SUM(CASE WHEN y1 IS NOT NULL THEN
               CAST(n*y1 - s AS HUGEINT) * (n*y - s) END) AS num1,
           SUM(CASE WHEN y2 IS NOT NULL THEN
               CAST(n*y2 - s AS HUGEINT) * (n*y - s) END) AS num2,
           SUM(CASE WHEN y3 IS NOT NULL THEN
               CAST(n*y3 - s AS HUGEINT) * (n*y - s) END) AS num3,
           SUM(CASE WHEN y4 IS NOT NULL THEN
               CAST(n*y4 - s AS HUGEINT) * (n*y - s) END) AS num4,
           SUM(CASE WHEN y5 IS NOT NULL THEN
               CAST(n*y5 - s AS HUGEINT) * (n*y - s) END) AS num5,
           SUM(CASE WHEN y6 IS NOT NULL THEN
               CAST(n*y6 - s AS HUGEINT) * (n*y - s) END) AS num6,
           SUM(CASE WHEN y7 IS NOT NULL THEN
               CAST(n*y7 - s AS HUGEINT) * (n*y - s) END) AS num7
    FROM lagged GROUP BY 1, 2),
stacked AS (
    SELECT et, n, den, l.lag, l.num
    FROM per_type, LATERAL (VALUES (1, num1), (2, num2), (3, num3),
                                   (4, num4), (5, num5), (6, num6),
                                   (7, num7)) l(lag, num))
SELECT et AS event_type, CAST(lag AS INTEGER) AS lag,
       CAST(n AS BIGINT) AS n_days,
       CAST(CASE WHEN num < 0 THEN -((-num) * 1000000 // NULLIF(den, 0))
                 ELSE (num * 1000000) // NULLIF(den, 0) END
            AS BIGINT) AS acf_e6
FROM stacked
ORDER BY event_type, lag
"""


def _kcore_oracle_sql(rounds: int = 8, k: int = 3) -> str:
    """Unrolled chained-CTE mirror of graph_kcore_decompose: the
    mutual 5-NN graph, then `rounds` peel steps a1..aN (degree over
    survivors, keep >= k), counts stitched per round — the
    graph_pagerank_fixed unroll recipe applied to peeling."""
    # every CTE MATERIALIZED: DuckDB re-inlines plain CTEs per
    # reference, and round r references round r-1 twice — without
    # materialization the count subqueries re-evaluate the all-pairs
    # kNN 2^rounds times (measured: times out where MATERIALIZED
    # finishes in seconds)
    ctes = ["""pairs AS MATERIALIZED (
    SELECT a.vec_id AS src, b.vec_id AS nbr,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id <> b.vec_id),
ranked AS MATERIALIZED (
    SELECT src, nbr,
           row_number() OVER (PARTITION BY src
                              ORDER BY sim DESC, nbr ASC) AS rn
    FROM pairs),
knn AS MATERIALIZED (SELECT src, nbr FROM ranked WHERE rn <= 5),
mut AS MATERIALIZED (SELECT a.src AS u, a.nbr AS v
        FROM knn a JOIN knn b ON a.src = b.nbr AND a.nbr = b.src),
a0 AS MATERIALIZED (SELECT DISTINCT u FROM mut)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
    SELECT e.u, COUNT(*) AS c FROM mut e
    JOIN a{r-1} x ON e.u = x.u JOIN a{r-1} y ON e.v = y.u
    GROUP BY e.u),
a{r} AS MATERIALIZED (SELECT u FROM d{r} WHERE c >= {k})""")
    rows = ["SELECT CAST(0 AS INTEGER) AS peel_round, "
            "CAST(0 AS BIGINT) AS n_removed, "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM a0) AS n_alive"]
    for r in range(1, rounds + 1):
        rows.append(
            f"SELECT CAST({r} AS INTEGER), "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM a{r-1})"
            f" - (SELECT CAST(COUNT(*) AS BIGINT) FROM a{r}), "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM a{r})")
    return ("WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
            + "\nUNION ALL ".join(rows) + ")\nORDER BY peel_round")


ORACLE["graph_kcore_decompose"] = _kcore_oracle_sql()

# Z-order layout model: per-bucket min/max boxes under Morton vs
# linear bucketing, pruned against the same 32x32 predicate box —
# the interleave expression is generated from one Python loop shared
# in spirit with the Spark plan (identical bit arithmetic).
_ZORDER_INTERLEAVE = " + ".join(
    f"(((cb >> {i}) & 1) << {2 * i})"
    f" + (((db >> {i}) & 1) << {2 * i + 1})" for i in range(8))
ORACLE["maintenance_zorder_layout"] = f"""
WITH ords AS (
    SELECT o_custkey AS c,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS d
    FROM orders),
b AS (SELECT MIN(c) AS minc, MAX(c) AS maxc,
             MIN(d) AS mind, MAX(d) AS maxd FROM ords),
norm AS (
    SELECT CAST((c - minc) * 256 // (maxc - minc + 1) AS BIGINT) AS cb,
           CAST((d - mind) * 256 // (maxd - mind + 1) AS BIGINT) AS db
    FROM ords, b),
coded AS (
    SELECT cb, db,
           CAST(({_ZORDER_INTERLEAVE}) AS BIGINT) // 256 AS z_bucket,
           cb AS l_bucket
    FROM norm),
zstats AS (
    SELECT z_bucket AS bkt, MIN(cb) AS min_cb, MAX(cb) AS max_cb,
           MIN(db) AS min_db, MAX(db) AS max_db,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN cb BETWEEN 112 AND 143
                          AND db BETWEEN 112 AND 143
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_match
    FROM coded GROUP BY 1),
lstats AS (
    SELECT l_bucket AS bkt, MIN(cb) AS min_cb, MAX(cb) AS max_cb,
           MIN(db) AS min_db, MAX(db) AS max_db,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN cb BETWEEN 112 AND 143
                          AND db BETWEEN 112 AND 143
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_match
    FROM coded GROUP BY 1)
SELECT * FROM (
    SELECT 'zorder' AS layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN min_cb <= 143 AND max_cb >= 112
                          AND min_db <= 143 AND max_db >= 112
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_hit,
           CAST(SUM(CASE WHEN min_cb <= 143 AND max_cb >= 112
                          AND min_db <= 143 AND max_db >= 112
                    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching
    FROM zstats
    UNION ALL
    SELECT 'linear',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN min_cb <= 143 AND max_cb >= 112
                          AND min_db <= 143 AND max_db >= 112
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN min_cb <= 143 AND max_cb >= 112
                          AND min_db <= 143 AND max_db >= 112
                    THEN n_rows ELSE 0 END) AS BIGINT),
           CAST(SUM(n_match) AS BIGINT)
    FROM lstats)
ORDER BY layout
"""

# Cross-document duplicate tiles: the multimodal_image_tiles CTE
# chain re-aggregated at the tile-hash grain.
ORACLE["multimodal_tile_dedup"] = """
WITH dims AS (
    SELECT doc_id, text, length(text) AS L,
           (length(text) + 31) // 32 AS n_rows
    FROM documents
), tiles AS (
    SELECT doc_id, text, L, n_rows,
           CAST(t.tr AS INTEGER) AS tile_row,
           CAST(c.tc AS INTEGER) AS tile_col
    FROM dims,
         LATERAL (SELECT unnest(range(0, (n_rows + 7) // 8)) AS tr) t,
         LATERAL (SELECT unnest(range(0, 4)) AS tc) c
), strips AS (
    SELECT doc_id, tile_row, tile_col, s.r,
           substring(text, CAST(s.r * 32 + tile_col * 8 + 1 AS INTEGER),
                     8) AS strip
    FROM tiles,
         LATERAL (SELECT unnest(range(tile_row * 8,
              least((tile_row + 1) * 8, n_rows))) AS r) s
), patches AS (
    SELECT doc_id, tile_row, tile_col,
           string_agg(strip, '' ORDER BY r) AS patch
    FROM strips GROUP BY 1, 2, 3
), hashes AS (
    SELECT doc_id, md5(patch) AS tile_md5
    FROM patches WHERE length(patch) > 0
)
SELECT tile_md5,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM hashes GROUP BY tile_md5
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_occurrences DESC, n_docs DESC, tile_md5
LIMIT 20
"""

# Snapshot reads: logical content per pinned commit (1 = A, 2 = A∪B,
# 3 = the compacted C with identical content to 2); file counts are
# the manifest's literal plan sizes.
ORACLE["maintenance_snapshot_read"] = """
WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
ab AS (SELECT doc_id FROM documents WHERE doc_id % 3 IN (0, 1))
SELECT * FROM (
    SELECT CAST(1 AS INTEGER) AS as_of, CAST(1 AS INTEGER) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id FROM a
    UNION ALL
    SELECT CAST(2 AS INTEGER), CAST(2 AS INTEGER),
           CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT) FROM ab
    UNION ALL
    SELECT CAST(3 AS INTEGER), CAST(1 AS INTEGER),
           CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT) FROM ab)
ORDER BY as_of
"""


# ROUGE-style clipped n-gram overlap vs the per-source exemplar:
# clipped = sum over gram types of min(cand, ref); micro-average
# divides recall by ref_sz * n_docs (each candidate scored against
# the same exemplar). Gram CTEs MATERIALIZED (each referenced as
# both the candidate and reference leg).
ORACLE["eval_rouge_overlap"] = """
WITH ex AS MATERIALIZED (
    SELECT source, MIN(doc_id) AS ex_id FROM documents GROUP BY 1),
u AS MATERIALIZED (
    SELECT doc_id, source, gram, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT doc_id, source,
               unnest(string_split(text, ' ')) AS gram
        FROM documents) GROUP BY 1, 2, 3),
bg AS MATERIALIZED (
    SELECT doc_id, source, gram, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT doc_id, source,
               unnest(CASE WHEN len(string_split(text, ' ')) >= 2
                   THEN list_transform(
                        range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' '
                             || string_split(text, ' ')[i+1])
                   ELSE [] END) AS gram
        FROM documents) GROUP BY 1, 2, 3),
u_ref AS (SELECT g.source, g.gram, g.c AS c_ref
          FROM u g JOIN ex ON g.source = ex.source
                        AND g.doc_id = ex.ex_id),
u_cand AS (SELECT g.* FROM u g JOIN ex ON g.source = ex.source
           WHERE g.doc_id <> ex.ex_id),
b_ref AS (SELECT g.source, g.gram, g.c AS c_ref
          FROM bg g JOIN ex ON g.source = ex.source
                         AND g.doc_id = ex.ex_id),
b_cand AS (SELECT g.* FROM bg g JOIN ex ON g.source = ex.source
           WHERE g.doc_id <> ex.ex_id),
rows1 AS (
    SELECT s.source, 1 AS n, s.n_docs,
           COALESCE(cl.clip, 0) AS clip, s.n_cand,
           r.ref_sz * s.n_docs AS n_ref
    FROM (SELECT source, CAST(SUM(c) AS BIGINT) AS n_cand,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM u_cand GROUP BY 1) s
    JOIN (SELECT source, CAST(SUM(c_ref) AS BIGINT) AS ref_sz
          FROM u_ref GROUP BY 1) r USING (source)
    LEFT JOIN (SELECT c.source,
                      CAST(SUM(LEAST(c.c, r.c_ref)) AS BIGINT) AS clip
               FROM u_cand c JOIN u_ref r
                 ON c.source = r.source AND c.gram = r.gram
               GROUP BY 1) cl USING (source)),
rows2 AS (
    SELECT s.source, 2 AS n, s.n_docs,
           COALESCE(cl.clip, 0) AS clip, s.n_cand,
           r.ref_sz * s.n_docs AS n_ref
    FROM (SELECT source, CAST(SUM(c) AS BIGINT) AS n_cand,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM b_cand GROUP BY 1) s
    JOIN (SELECT source, CAST(SUM(c_ref) AS BIGINT) AS ref_sz
          FROM b_ref GROUP BY 1) r USING (source)
    LEFT JOIN (SELECT c.source,
                      CAST(SUM(LEAST(c.c, r.c_ref)) AS BIGINT) AS clip
               FROM b_cand c JOIN b_ref r
                 ON c.source = r.source AND c.gram = r.gram
               GROUP BY 1) cl USING (source))
SELECT source, CAST(n AS INTEGER) AS n, n_docs,
       CAST(clip * 1000000 // n_cand AS BIGINT) AS p_e6,
       CAST(clip * 1000000 // n_ref AS BIGINT) AS r_e6,
       CAST(2 * clip * 1000000 // (n_cand + n_ref) AS BIGINT) AS f1_e6
FROM (SELECT * FROM rows1 UNION ALL SELECT * FROM rows2)
ORDER BY source, n
"""

# Incremental top-k: the merged shortlist must equal the full scan.
# Q_VEC_ID interpolated (not hardcoded) so the oracle tracks the
# Spark plan's shared query-vector constant.
from .llm_ops import Q_VEC_ID as _QVID  # noqa: E402

ORACLE["sim_topk_incremental"] = f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {_QVID}),
full_rank AS (
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]), 6) AS sim
    FROM embeddings e, q WHERE e.vec_id != {_QVID})
SELECT vec_id, sim,
       CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC)
            AS INTEGER) AS rnk
FROM full_rank
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""

ORACLE["stream_sliding_topk_live"] = ORACLE["stream_sliding_topk"]

ORACLE["sink_viewfs_roundtrip"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS balance_sum
FROM customer WHERE c_mktsegment = 'BUILDING'
"""

# Seasonal decomposition: weekday indexes of the detrended (7x-scaled)
# daily series — same dense spine as stats_autocorrelation, same
# sign/abs integer-division split.
ORACLE["stats_seasonal_decompose"] = """
WITH daily AS (
    SELECT event_type AS et,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2),
b AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM daily),
spine AS (
    SELECT t.et, s.d
    FROM (SELECT DISTINCT et FROM daily) t, b,
         LATERAL (SELECT unnest(generate_series(b.dmin, b.dmax)) AS d) s),
dense AS (
    SELECT sp.et, sp.d, COALESCE(dl.y, 0) AS y
    FROM spine sp LEFT JOIN daily dl ON sp.et = dl.et AND sp.d = dl.d),
trended AS (
    SELECT et, d, y,
           SUM(y) OVER w AS sum7, COUNT(*) OVER w AS cnt7
    FROM dense
    WINDOW w AS (PARTITION BY et ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
per_dow AS (
    SELECT et, CAST(d % 7 AS INTEGER) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           SUM(CAST(7*y - sum7 AS HUGEINT)) AS s
    FROM trended WHERE cnt7 = 7 GROUP BY 1, 2)
SELECT et AS event_type, dow, n_obs,
       CAST(CASE WHEN s < 0 THEN -((-s) * 1000000 // (7 * n_obs))
                 ELSE (s * 1000000) // (7 * n_obs) END AS BIGINT)
           AS seasonal_e6
FROM per_dow
ORDER BY event_type, dow
"""

# Wasserstein-1 drift: dense cent spine makes every CDF-gap term a
# one-cent strip; same pop/histogram fragment as dq_ks_drift.
ORACLE["dq_wasserstein_drift"] = """
WITH pop AS (
    SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
    FROM events WHERE event_type IN ('view','click','purchase')),
n AS (SELECT CAST(SUM(1-grp) AS BIGINT) AS n_ref,
             CAST(SUM(grp) AS BIGINT) AS n_cur FROM pop),
h AS (SELECT v, CAST(SUM(1-grp) AS BIGINT) AS c_ref,
             CAST(SUM(grp) AS BIGINT) AS c_cur
      FROM pop GROUP BY v),
b AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM h),
spine AS (
    -- greatest() guard mirrors the Spark side: one-point spine when
    -- the histogram has a single distinct value
    SELECT b.vmin, b.vmax, s.v
    FROM b, LATERAL (SELECT unnest(generate_series(
                         b.vmin, greatest(b.vmin, b.vmax - 1)))
                     AS v) s),
dense AS (
    SELECT sp.v, sp.vmin, sp.vmax,
           COALESCE(h.c_ref, 0) AS c_ref, COALESCE(h.c_cur, 0) AS c_cur
    FROM spine sp LEFT JOIN h ON sp.v = h.v),
cum AS (SELECT v, vmin, vmax,
        SUM(c_ref) OVER (ORDER BY v) AS cum_ref,
        SUM(c_cur) OVER (ORDER BY v) AS cum_cur FROM dense)
SELECT n.n_ref, n.n_cur,
       CAST(MAX(vmax - vmin) AS BIGINT) AS span_cents,
       CAST(SUM(ABS(CAST(cum_ref AS HUGEINT) * n.n_cur
                    - CAST(cum_cur AS HUGEINT) * n.n_ref)) * 10000
            // NULLIF(CAST(n.n_ref AS HUGEINT) * n.n_cur, 0)
            AS BIGINT) AS w1_e6
FROM cum, n GROUP BY n.n_ref, n.n_cur
"""

# Join-view IVM: merge == full recompute over A_all join B_all.
ORACLE["maintenance_ivm_join_view"] = """
SELECT c_mktsegment AS segment,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


from .mining_queries import BT_ITERS as _BT_ITERS  # noqa: E402
def _bt_oracle_sql(iters: int = _BT_ITERS) -> str:
    """Unrolled MATERIALIZED-CTE mirror of eval_bradley_terry's
    bt_solve: comparison matrix from per-user type-count pairs, then
    ``iters`` MM steps p_i' = w_i * 1e12 // sum_j n_ij * 1e12 //
    (p_i + p_j) — every CTE MATERIALIZED because step k references
    step k-1 twice (the graph_kcore_decompose 2^k re-inline lesson)."""
    ctes = ["""counts AS MATERIALIZED (
    SELECT user_id AS u, event_type AS t, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2),
cells AS MATERIALIZED (
    SELECT CASE WHEN a.c > b.c THEN a.t ELSE b.t END AS winner,
           CASE WHEN a.c > b.c THEN b.t ELSE a.t END AS loser,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM counts a JOIN counts b
      ON a.u = b.u AND a.t < b.t AND a.c <> b.c
    GROUP BY 1, 2),
types AS MATERIALIZED (
    SELECT winner AS t FROM cells UNION SELECT loser FROM cells),
wins AS MATERIALIZED (
    SELECT ty.t AS i, CAST(COALESCE(SUM(c.w), 0) AS BIGINT) AS w
    FROM types ty LEFT JOIN cells c ON c.winner = ty.t GROUP BY 1),
m AS MATERIALIZED (
    SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
        SELECT winner AS i, loser AS j, w AS n FROM cells
        UNION ALL SELECT loser, winner, w FROM cells) GROUP BY 1, 2),
p0 AS MATERIALIZED (
    SELECT t AS i, CAST(1000000 AS HUGEINT) AS p FROM types)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""d{k} AS MATERIALIZED (
    SELECT m.i, SUM(CAST(m.n AS HUGEINT) * 1000000000000
               // (pa.p + pb.p)) AS d
    FROM m JOIN p{k-1} pa ON pa.i = m.i JOIN p{k-1} pb ON pb.i = m.j
    GROUP BY 1),
p{k} AS MATERIALIZED (
    SELECT w.i,
           COALESCE(CAST(w.w AS HUGEINT) * 1000000000000
                    // NULLIF(d.d, 0), pp.p) AS p
    FROM wins w LEFT JOIN d{k} d ON d.i = w.i
    JOIN p{k-1} pp ON pp.i = w.i)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT w.i AS event_type, w.w AS n_wins, comp.n AS n_comparisons,
       CAST(p.p AS BIGINT) AS strength_e6,
       CAST(row_number() OVER (ORDER BY p.p DESC, w.i ASC) AS INTEGER)
           AS rnk
FROM wins w
JOIN p{iters} p ON p.i = w.i
JOIN (SELECT i, CAST(SUM(n) AS BIGINT) AS n FROM m GROUP BY 1) comp
  ON comp.i = w.i
ORDER BY rnk""")


ORACLE["eval_bradley_terry"] = _bt_oracle_sql()


from .mining_queries import BT_ITERS as _RK_ITERS  # noqa: E402, F811
from .mining_queries import RK_THETA as _RK_THETA  # noqa: E402


def _rk_oracle_sql(iters: int = _RK_ITERS, th: int = _RK_THETA) -> str:
    """Unrolled MATERIALIZED-CTE mirror of eval_rao_kupper's
    rk_solve: directed (i, j, w, t) cells — ties kept, symmetrized
    onto both ordered cells — then ``iters`` Rao-Kupper MM steps
    with fixed integer θ. Each cell contributes (w+t)*1e12 //
    (p_i + θ p_j) to D_i and (θ(w+t)*1e12) // (p_i + θ p_j) to D_j,
    exactly rk_solve's integer order of operations. Every CTE
    MATERIALIZED (step k referenced more than once — the 2^k
    re-inline lesson)."""
    ctes = [f"""counts AS MATERIALIZED (
    SELECT user_id AS u, event_type AS t, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2),
cellsq AS MATERIALIZED (
    SELECT CASE WHEN a.c >= b.c THEN a.t ELSE b.t END AS i,
           CASE WHEN a.c >= b.c THEN b.t ELSE a.t END AS j,
           (a.c = b.c) AS is_tie,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM counts a JOIN counts b ON a.u = b.u AND a.t < b.t
    GROUP BY 1, 2, 3),
m AS MATERIALIZED (
    SELECT i, j, CAST(SUM(w) AS BIGINT) AS w, CAST(SUM(t) AS BIGINT) AS t
    FROM (
        SELECT i, j, n AS w, 0 AS t FROM cellsq WHERE NOT is_tie
        UNION ALL SELECT i, j, 0, n FROM cellsq WHERE is_tie
        UNION ALL SELECT j, i, 0, n FROM cellsq WHERE is_tie)
    GROUP BY 1, 2),
types AS MATERIALIZED (
    SELECT i AS t FROM m UNION SELECT j FROM m),
aa AS MATERIALIZED (
    SELECT ty.t AS i, CAST(COALESCE(SUM(m.w + m.t), 0) AS BIGINT) AS a
    FROM types ty LEFT JOIN m ON m.i = ty.t GROUP BY 1),
p0 AS MATERIALIZED (
    SELECT t AS i, CAST(1000000 AS HUGEINT) AS p FROM types)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""d{k} AS MATERIALIZED (
    SELECT tgt AS i, SUM(c) AS d FROM (
        SELECT m.i AS tgt,
               CAST(m.w + m.t AS HUGEINT) * 1000000000000
               // greatest(pa.p + {th} * pb.p, 1) AS c
        FROM m JOIN p{k-1} pa ON pa.i = m.i JOIN p{k-1} pb ON pb.i = m.j
        UNION ALL
        SELECT m.j,
               ({th} * CAST(m.w + m.t AS HUGEINT) * 1000000000000)
               // greatest(pa.p + {th} * pb.p, 1)
        FROM m JOIN p{k-1} pa ON pa.i = m.i JOIN p{k-1} pb ON pb.i = m.j)
    GROUP BY 1),
p{k} AS MATERIALIZED (
    SELECT aa.i,
           COALESCE(CAST(aa.a AS HUGEINT) * 1000000000000
                    // NULLIF(d.d, 0), pp.p) AS p
    FROM aa LEFT JOIN d{k} d ON d.i = aa.i
    JOIN p{k-1} pp ON pp.i = aa.i)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT s.i AS event_type, s.nw AS n_wins, s.nt AS n_ties,
       s.nw + s.nt + COALESCE(l.nl, 0) AS n_comparisons,
       CAST(p.p AS BIGINT) AS strength_e6,
       CAST(row_number() OVER (ORDER BY p.p DESC, s.i ASC) AS INTEGER)
           AS rnk
FROM (SELECT ty.t AS i, CAST(COALESCE(SUM(m.w), 0) AS BIGINT) AS nw,
             CAST(COALESCE(SUM(m.t), 0) AS BIGINT) AS nt
      FROM types ty LEFT JOIN m ON m.i = ty.t GROUP BY 1) s
JOIN p{iters} p ON p.i = s.i
LEFT JOIN (SELECT j AS i, CAST(SUM(w) AS BIGINT) AS nl
           FROM m GROUP BY 1) l ON l.i = s.i
ORDER BY rnk""")


ORACLE["eval_rao_kupper"] = _rk_oracle_sql()


# Order-bias diagnostic: the BT/RK cell build with the user-md5
# parity as the presentation-order cohort bit; every reported rate
# is integer ppm via BIGINT // (Spark DIV), empty cohorts NULL via
# the shared guarded CASE.
ORACLE["eval_order_bias"] = """
WITH counts AS MATERIALIZED (
    SELECT user_id AS u, event_type AS t, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2),
pairs AS MATERIALIZED (
    SELECT a.t AS i, b.t AS j,
           (('0x' || substr(md5(CAST(a.u AS VARCHAR)), 1, 15))::BIGINT
            % 2 = 0) AS fi,
           (a.c <> b.c) AS dc,
           (a.c > b.c) AS iw
    FROM counts a JOIN counts b ON a.u = b.u AND a.t < b.t),
cells AS (
    SELECT i, j,
           CAST(COUNT(*) AS BIGINT) AS n_comparisons,
           CAST(SUM(CASE WHEN dc THEN 1 ELSE 0 END) AS BIGINT)
               AS n_decisive,
           CAST(SUM(CASE WHEN dc AND fi = iw THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_slot_wins,
           CAST(SUM(CASE WHEN dc AND fi THEN 1 ELSE 0 END) AS BIGINT)
               AS dec_if,
           CAST(SUM(CASE WHEN dc AND fi AND iw THEN 1 ELSE 0 END)
                AS BIGINT) AS win_if,
           CAST(SUM(CASE WHEN dc AND NOT fi THEN 1 ELSE 0 END) AS BIGINT)
               AS dec_is,
           CAST(SUM(CASE WHEN dc AND NOT fi AND iw THEN 1 ELSE 0 END)
                AS BIGINT) AS win_is
    FROM pairs GROUP BY 1, 2)
SELECT i, j, n_comparisons, n_decisive, n_first_slot_wins,
       CASE WHEN n_decisive > 0
            THEN n_first_slot_wins * 1000000 // n_decisive
            END AS first_slot_win_ppm,
       CASE WHEN dec_if > 0 THEN win_if * 1000000 // dec_if
            END AS win_ppm_i_first,
       CASE WHEN dec_is > 0 THEN win_is * 1000000 // dec_is
            END AS win_ppm_i_second,
       CASE WHEN dec_if > 0 AND dec_is > 0
            THEN win_if * 1000000 // dec_if - win_is * 1000000 // dec_is
            END AS order_delta_ppm
FROM cells
ORDER BY i, j"""


# Blocking quality: candidates = the SAME per-doc banding fragment as
# dedup_minhash_lsh (no verify threshold); truth = quadratic exact
# Jaccard >= 0.8 on the identical 30-bit hashed 2-shingles (the
# prefix tier equals this by completeness; the oracle states the
# ground truth directly), computed on the md5(doc_id) % BQ_SAMPLE_MOD
# == 0 document sample — the Spark side's pmod(md5_long(doc_id), m)
# mirror, same idiom as dedup_lsh_calibration_sampled.
from .mining_queries import BQ_SAMPLE_MOD as _BQ_MOD  # noqa: E402

ORACLE["eval_blocking_quality"] = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS shingles
    FROM toks
), shf AS (
    SELECT doc_id,
           list_distinct(list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824)) AS hs
    FROM sh WHERE len(shingles) > 0
), sig AS (
    SELECT doc_id, hs,
           list_transform(range(0, 16),
               j -> list_min(list_transform(hs,
                    h -> ([{','.join(map(str, _A16))}][j+1] * h
                          + [{','.join(map(str, _B16))}][j+1]) % 1073741789))) AS mh
    FROM shf
), banded AS (""" + """
    SELECT doc_id,
           unnest(range(0, 4)) AS band,
           unnest(list_transform(range(0, 4),
               b -> md5(array_to_string(mh[b*4+1 : b*4+4], ',')))) AS band_hash
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)""" + f""", shs AS (
    SELECT * FROM shf
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % {_BQ_MOD} = 0
), truth AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM shs a JOIN shs b ON a.doc_id < b.doc_id
    WHERE ROUND(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                / (len(a.hs) + len(b.hs)
                   - len(list_intersect(a.hs, b.hs))), 6) >= 0.8
), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled FROM documents
       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % {_BQ_MOD} = 0),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits FROM
       (SELECT * FROM cand INTERSECT SELECT * FROM truth))
SELECT nd.n_docs, ns.n_sampled, nt.n_truth, nc.n_candidates, nh.n_hits,
       CAST(nh.n_hits * 1000000 // NULLIF(nt.n_truth, 0) AS BIGINT)
           AS completeness_e6,
       CAST((CAST(nd.n_docs AS HUGEINT) * (nd.n_docs - 1) // 2
             - nc.n_candidates) * 1000000
            // NULLIF(CAST(nd.n_docs AS HUGEINT) * (nd.n_docs - 1) // 2,
                      0) AS BIGINT) AS reduction_e6
FROM nd, ns, nt, nc, nh
"""
ORACLE["stream_wasserstein_drift_live"] = ORACLE["dq_wasserstein_drift"]


from .mining_queries import MK_ITERS as _MK_ITERS  # noqa: E402


def _markov_removal_oracle_sql(iters: int = _MK_ITERS) -> str:
    """Unrolled (removal x state) grid mirror of
    attribution_markov_removal's markov_removal_solve: one CTE per
    value-iteration step over the domain-bounded grid, every CTE
    MATERIALIZED (step k is referenced by step k+1 and the final
    select — the kcore/bt re-inline lesson)."""
    ctes = ["""seq AS MATERIALIZED (
    SELECT user_id, event_type,
           lag(event_type) OVER w AS prev,
           lead(event_type) OVER w AS nxt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
step AS (
    SELECT CASE WHEN prev IS NULL OR prev = 'purchase'
                THEN '__start__' ELSE prev END AS src,
           CASE WHEN event_type = 'purchase'
                THEN '__conv__' ELSE event_type END AS dst
    FROM seq),
term AS (
    SELECT event_type AS src, '__null__' AS dst
    FROM seq WHERE nxt IS NULL AND event_type <> 'purchase'),
e AS MATERIALIZED (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT * FROM step UNION ALL SELECT * FROM term)
    GROUP BY 1, 2),
outs AS MATERIALIZED (
    SELECT src, CAST(SUM(n) AS BIGINT) AS n_out FROM e GROUP BY 1),
states AS MATERIALIZED (
    SELECT src AS s FROM e UNION SELECT dst FROM e),
chans AS MATERIALIZED (
    SELECT s AS r FROM states
    WHERE s NOT IN ('__start__', '__conv__', '__null__')),
rems AS MATERIALIZED (
    SELECT r FROM chans UNION ALL SELECT '__base__'),
grid AS MATERIALIZED (SELECT rems.r, states.s FROM rems, states),
v0 AS MATERIALIZED (
    SELECT r, s, CASE WHEN s = '__conv__' THEN 1000000::HUGEINT
                      ELSE 0::HUGEINT END AS v
    FROM grid)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""v{k} AS MATERIALIZED (
    SELECT g.r, g.s,
           CASE WHEN g.s = '__conv__' THEN 1000000::HUGEINT
                WHEN g.s = '__null__' OR g.s = g.r THEN 0::HUGEINT
                ELSE COALESCE(agg.val, 0::HUGEINT) END AS v
    FROM grid g LEFT JOIN (
        SELECT v.r, e.src AS s,
               SUM(CAST(e.n AS HUGEINT) * v.v) // MAX(o.n_out) AS val
        FROM e JOIN v{k-1} v ON v.s = e.dst
        JOIN outs o ON o.src = e.src
        GROUP BY 1, 2) agg ON agg.r = g.r AND agg.s = g.s)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT c.r AS channel,
       CAST(COALESCE(o.n_out, 0) AS BIGINT) AS n_visits,
       CAST(pb.v AS BIGINT) AS p_conv_base_e6,
       CAST(pr.v AS BIGINT) AS p_conv_removed_e6,
       CAST(CASE WHEN pb.v = 0 THEN NULL
                 ELSE (pb.v - pr.v) * 1000000 // pb.v END AS BIGINT)
           AS removal_e6,
       CAST(row_number() OVER (ORDER BY (pb.v - pr.v) DESC, c.r ASC)
            AS INTEGER) AS rnk
FROM chans c
JOIN v{iters} pr ON pr.r = c.r AND pr.s = '__start__'
JOIN v{iters} pb ON pb.r = '__base__' AND pb.s = '__start__'
LEFT JOIN outs o ON o.src = c.r
ORDER BY rnk""")


ORACLE["attribution_markov_removal"] = _markov_removal_oracle_sql()
ORACLE["stream_ivm_join_live"] = ORACLE["maintenance_ivm_join_view"]

# Slice-wise AUC: the eval_auc_rank recipe keyed by source; a
# single-class slice emits NULL explicitly (NULLIF — Spark DIV by
# zero is NULL, DuckDB // raises).
ORACLE["eval_auc_sliced"] = """
WITH s AS (
    SELECT source, (lang = 'en') AS pos,
           (CAST(len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','of','and','to'], t)))
                 AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
    FROM documents
), h AS (
    SELECT source AS slice, score,
           SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_s,
           SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS neg_s
    FROM s GROUP BY 1, 2
), c AS (
    SELECT slice, pos_s, neg_s,
           COALESCE(SUM(neg_s) OVER (PARTITION BY slice ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumneg_below
    FROM h
), t AS (
    SELECT slice,
           CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           CAST(SUM(neg_s) AS BIGINT) AS n_neg,
           CAST(SUM(pos_s * (2 * cumneg_below + neg_s)) AS BIGINT)
               AS auc_num2
    FROM c GROUP BY 1
)
SELECT slice, n_pos, n_neg, auc_num2,
       CAST((2 * CAST(auc_num2 AS HUGEINT) * 1000000
             + 2 * CAST(n_pos AS HUGEINT) * n_neg)
            // NULLIF(2 * (2 * CAST(n_pos AS HUGEINT) * n_neg), 0)
            AS DOUBLE) / 1000000 AS auc
FROM t
ORDER BY slice
"""
