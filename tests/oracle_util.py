"""Local re-implementation of the driver's correctness check: run a
registry query on Spark and its oracle SQL on DuckDB over the same
parquet files, then compare row count, column names, and values
order-insensitively. Used by tests to catch alias/semantics drift
before the driver does."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from quickbooks_aws_etl_pipeline_spark.io import TABLES, table_path

_REL_TOL = 1e-9
_ABS_TOL = 1e-9


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything except floats for robust sorting/compare
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.astype(float)
        else:
            out[c] = col.map(lambda v: "NULL" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    sort_cols = list(out.columns)
    out = out.sort_values(by=sort_cols, kind="mergesort").reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = duckdb_run(sql, sf_dir)

    assert sorted(got.columns) == sorted(want.columns), (
        f"[{name}] column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), (
        f"[{name}] row count mismatch: spark={len(got)} oracle={len(want)}"
    )

    g, w = _canon(got), _canon(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(w[c]):
            gv = pd.to_numeric(g[c], errors="coerce").to_numpy(dtype=float)
            wv = pd.to_numeric(w[c], errors="coerce").to_numpy(dtype=float)
            for i, (a, b) in enumerate(zip(gv, wv)):
                na, nb = math.isnan(a), math.isnan(b)
                assert na == nb, f"[{name}] {c} row{i}: nan mismatch {a} vs {b}"
                if not na:
                    assert math.isclose(a, b, rel_tol=_REL_TOL, abs_tol=_ABS_TOL), (
                        f"[{name}] {c} row{i}: {a!r} != {b!r}"
                    )
        else:
            bad = (g[c] != w[c])
            if bad.any():
                i = int(bad.idxmax())
                raise AssertionError(
                    f"[{name}] {c} row{i}: {g[c][i]!r} != {w[c][i]!r}"
                )
