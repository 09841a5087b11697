"""Projection / rename / cast / derive operators (SURVEY.md §2.2).

The reference's transform block is always the same fixed sequence —
project to ``selected_columns`` (qb_bills.py:72-89), snake_case +
dot-flatten rename (qb_bills.py:92, qb_billpayments.py:100-107),
``fillna`` + ``astype`` cast (qb_bills.py:99-118), column reorder to
match the warehouse DDL (qb_jounalentry.py:148-170). Here that whole
block is one declarative ``select`` so Catalyst sees a single
Project node and can push pruning into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..naming import normalize_column


@dataclass(frozen=True)
class ColumnSpec:
    """One output column: source expression, target name, optional cast,
    optional fill value applied before the cast (mirrors the
    reference's ``fillna(v).astype(t)`` idiom, qb_billpayments.py:111-112)."""
    source: str | Column
    name: str
    dtype: str | None = None
    fill: object | None = None

    def to_column(self) -> Column:
        col = F.col(self.source) if isinstance(self.source, str) else self.source
        if self.fill is not None:
            col = F.coalesce(col, F.lit(self.fill))
        if self.dtype is not None:
            col = col.cast(self.dtype)
        return col.alias(self.name)


def project_rename_cast(df: DataFrame, spec: list[ColumnSpec]) -> DataFrame:
    """P2+P3+P5+P6 as one Project node: select -> rename -> cast -> order."""
    return df.select(*[s.to_column() for s in spec])


def auto_snake_spec(df: DataFrame, dtypes: dict[str, str] | None = None,
                    fixups: dict[str, str] | None = None) -> list[ColumnSpec]:
    """Build a spec that mirrors the reference's automatic rename pipeline
    over every column (camelCase + dotted path -> snake flat name)."""
    dtypes = dtypes or {}
    out = []
    for c in df.columns:
        name = normalize_column(c, fixups)
        out.append(ColumnSpec(source=F.col(f"`{c}`"), name=name,
                              dtype=dtypes.get(name)))
    return out


def derive_literals(df: DataFrame, literals: dict[str, object]) -> DataFrame:
    """P7: broadcast constant columns onto every row
    (qb_transactionlist.py:84-85 ``df['Start Period'] = start_period``)."""
    for name, val in literals.items():
        df = df.withColumn(name, F.lit(val))
    return df
