"""Rounding-tie gate for money aggregates (VERDICT.md round 4, fix #3).

Why this file exists: ``sql_pricing_summary`` was driver-red in round
4 with a ~1e-11 RELATIVE drift — far below the 1e-9 tolerance the
standard sf0.001 oracle test uses, and invisible at sf0.001 because
the three-factor charge ``price*(1-d)*(1+t)`` only generates
scale-4 rounding TIES (exact value ending in ...x5 at the 5th
decimal) once the data is big enough. The driver compares value
HASHES, i.e. exact doubles. So this gate re-runs every money-product
key at sf0.01 (the driver's scale) and requires float columns to be
BIT-IDENTICAL between Spark and the DuckDB oracle — which the
decimal-native arithmetic guarantees by construction.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from quickbooks_aws_etl_pipeline_spark.io import read_table
from quickbooks_aws_etl_pipeline_spark.plans import ORACLE, QUERIES

from .oracle_util import _canon, duckdb_run

# Every key whose result contains a product-of-money aggregate (or a
# ratio of such sums). Exactness argument per class:
#   two-factor  price*(1-d)        -> true scale 4, safe under the
#                                     DECIMAL(18,4) cast (no tie can
#                                     exist; see olap_suite docstring)
#   three-factor price*(1-d)*(1+t) -> true scale 6, MUST be computed
#                                     natively in decimal
#   ratios / averages             -> double divisions of identical
#                                     exact sums; IEEE-identical
MONEY_KEYS = [
    # per-row floor(money*1e4+0.5) integer units (round-10 mining
    # pack): the product sits ±ulps from an exact 1e-4 grid point, so
    # floor(x+0.5) is tie-free in both engines; this gate pins that
    "query_pareto_skyline",
    "attribution_time_decay",       # floor(value*100+0.5) cents
    "sql_pricing_summary",          # three-factor (the r4 red row)
    "udf_sql_scalar",               # three-factor (same chain, SQL UDF)
    "sql_volume_shipping",
    "sql_market_share",
    "sql_promo_revenue_ratio",
    "sql_returned_items",
    "sql_top_revenue_parts",
    "sql_top_supplier",
    "sql_small_qty_revenue",
    "sql_disjunctive_revenue",
    "sql_forecast_revenue",
    "sql_profit_by_nation_year",
    "flagship_revenue_by_month_segment",
    "join_5way_regional_revenue",
    "sql_pipe_syntax",              # two-factor (round 6, pipe SQL)
    # round-7 ratio/mean additions (integer half-away 6-decimal
    # recipe: round_ratio6 / round6_decimal_mean_expr)
    "eval_auc_rank",
    "eval_calibration_bins",
    "select_excess_loss",
    # round-8 extension (r7 verdict task 8): the remaining eval-tier
    # ratio keys — PR/F1 operating points, PSI integer terms, ANN
    # recall — plus the composed classifier loop (margins, affine
    # quantization, and every metric ratio in one plan)
    "eval_pr_thresholds",
    "eval_score_drift_psi",
    "eval_ann_recall",
    "pipeline_classifier_loop",
    # round-8 session-2: the retrieval/serving ratio keys — BM25
    # scores (exact 1e-6 integers over 1e6), RRF rationals, the
    # distance margin over 8e6, conformal coverage/FPR, dimension-
    # ablation recall, and NDCG (integer DCG over integer IDCG)
    "text_bm25_topk",
    "text_bm25_batch_queries",
    "text_bm25_index_serve",
    "pairs_hard_negatives",
    "pairs_hard_negatives_ivf",
    "maintenance_bm25_index_refresh",
    "eval_tokenizer_compression",
    "stats_corpus_datasheet",
    "sim_hybrid_rrf",
    "sim_margin_bitext_mine",
    "eval_conformal_threshold",
    "eval_dim_ablation_recall",
    "eval_retrieval_ndcg",
    "pipeline_rag_retrieval",
    # round-9 additions: paired model comparison (kappa,
    # McNemar chi2) and memorization ratios
    "eval_classifier_agreement",
    "eval_memorization_spans",
    "mixture_unimax_budget",
    "eval_rank_correlation",
]


def _assert_bit_identical(spark_df, sql: str, sf_dir: str, name: str):
    got = _canon(spark_df.toPandas())
    want = _canon(duckdb_run(sql, sf_dir))
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]) or pd.api.types.is_float_dtype(want[c]):
            gv = pd.to_numeric(got[c], errors="coerce").to_numpy(dtype=float)
            wv = pd.to_numeric(want[c], errors="coerce").to_numpy(dtype=float)
            for i, (a, b) in enumerate(zip(gv, wv)):
                if math.isnan(a) and math.isnan(b):
                    continue
                # driver-equivalent strictness: exact doubles
                assert a == b, f"[{name}] {c} row{i}: {a!r} != {b!r} (diff {a-b!r})"
        else:
            assert (got[c] == want[c]).all(), f"[{name}] {c} differs"


@pytest.mark.parametrize("name", MONEY_KEYS)
def test_money_key_bit_identical_at_sf001(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    _assert_bit_identical(df, ORACLE[name], sf_oracle, name)


def test_sf001_fixture_actually_contains_ties(spark, sf_oracle):
    """Guard against false confidence: prove the sf0.01 data really
    exercises the three-factor tie (the thing sf0.001 misses). The
    OLD formula — double product cast to DECIMAL(18,4) — must
    disagree with the exact decimal-native charge on this fixture;
    if it ever agrees, the fixture stopped being tie-bait and this
    gate is vacuous."""
    li = read_table(spark, sf_oracle, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-01")
    old = F.sum((F.col("l_extendedprice")
                 * (F.lit(1.0) - F.col("l_discount"))
                 * (F.lit(1.0) + F.col("l_tax"))).cast("decimal(18,4)"))
    new = F.sum(F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
                * (F.lit(1.0) + F.col("l_tax")).cast("decimal(4,2)"))
    row = (li.groupBy("l_returnflag", "l_linestatus")
           .agg(old.cast("double").alias("old"),
                new.cast("double").alias("new"))
           .withColumn("diff", F.abs(F.col("old") - F.col("new")))
           .agg(F.max("diff").alias("max_diff"))).collect()[0]
    assert row.max_diff > 0, (
        "sf0.01 no longer contains three-factor rounding ties — "
        "the money-tie gate needs new bait")


def test_charge_sum_partition_invariant(spark, sf_oracle):
    """The whole point of decimal-native money arithmetic: the charge
    sum must be BIT-identical under any partitioning / aggregation
    order (double sums are not associative; decimal sums are). Run
    Q1's charge aggregate under three adversarial repartitionings and
    require exact equality — this is what makes the local[8] result
    transfer to a 1000-executor cluster unchanged."""
    from quickbooks_aws_etl_pipeline_spark.plans import QUERIES

    def result(df):
        return {(r.l_returnflag, r.l_linestatus): (r.sum_charge,
                                                   r.sum_disc_price)
                for r in df.collect()}

    base = result(QUERIES["sql_pricing_summary"](spark, sf_oracle))
    from quickbooks_aws_etl_pipeline_spark.io import read_table
    from pyspark.sql import functions as F
    from quickbooks_aws_etl_pipeline_spark.plans.olap_suite import (
        _charge_decimal, _revenue)
    from quickbooks_aws_etl_pipeline_spark.functions.numeric import exact_sum
    li = read_table(spark, sf_oracle, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-01")
    for parts in (1, 7, 64):
        shuffled = li.repartition(parts, F.col("l_orderkey"))
        got = {(r.l_returnflag, r.l_linestatus): (r.sum_charge,
                                                  r.sum_disc_price)
               for r in (shuffled.groupBy("l_returnflag", "l_linestatus")
                         .agg(F.sum(_charge_decimal()).cast("double")
                              .alias("sum_charge"),
                              exact_sum(_revenue()).alias("sum_disc_price"))
                         ).collect()}
        assert got == base, f"partitioning {parts} changed the sums"
