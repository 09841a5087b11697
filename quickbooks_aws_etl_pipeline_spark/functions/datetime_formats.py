"""Redshift -> Spark datetime format-token translation.

The reference delegates every date/timestamp cast to Redshift inside
its ``INSERT ... SELECT`` load step, e.g.::

    TO_DATE(due_date, 'YYYY-MM-DD')              -- qb_bills.py:150
    TO_TIMESTAMP(txn_date, 'YYYY-MM-DD HH24:MI:SS')  -- qb_billpayments.py:158
    TO_CHAR(TO_DATE(month, 'YYYY-MM'), 'Mon,YYYY')   -- qb_profit&loss.py:148

The engine runs those casts in-plan with ``F.to_date`` /
``F.to_timestamp`` / ``F.date_format``, which take JVM
DateTimeFormatter patterns — so Redshift tokens must be translated
(SURVEY.md §2.8 F8-F10, §7 "hard parts"). One table, longest-match
first.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Redshift datetime token -> JVM DateTimeFormatter token.
# Ordered longest-first so e.g. HH24 wins over HH.
_TOKEN_TABLE: list[tuple[str, str]] = [
    ("HH24", "HH"),   # 24-hour clock
    ("HH12", "hh"),
    ("YYYY", "yyyy"),
    ("YYY", "yyy"),
    ("MON", "MMM"),
    ("Mon", "MMM"),
    ("mon", "MMM"),
    ("MONTH", "MMMM"),
    ("Month", "MMMM"),
    ("YY", "yy"),
    ("MI", "mm"),     # minutes
    ("SS", "ss"),
    ("MS", "SSS"),
    ("DD", "dd"),
    ("DY", "EEE"),
    ("Dy", "EEE"),
    ("DAY", "EEEE"),
    ("Day", "EEEE"),
    ("HH", "hh"),
    ("AM", "a"),
    ("PM", "a"),
    ("MM", "MM"),     # identity, but must be consumed as a token
]

_TOKEN_MAP = dict(_TOKEN_TABLE)
_TOKEN_RE = re.compile(
    "|".join(re.escape(tok)
             for tok in sorted(_TOKEN_MAP, key=len, reverse=True))
)


def redshift_to_jvm_format(fmt: str) -> str:
    """Translate a Redshift TO_DATE/TO_CHAR pattern to a JVM pattern.

    Non-token characters (separators ``-:,./ ``) pass through; any
    separator that is a letter would need quoting, but the reference
    only uses ``- : , .`` and space.
    """
    return _TOKEN_RE.sub(lambda m: _TOKEN_MAP[m.group(0)], fmt)


def to_date_rs(col: Column | str, rs_format: str) -> Column:
    """``TO_DATE(col, 'YYYY-MM-DD')`` with Redshift tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, redshift_to_jvm_format(rs_format))


def to_timestamp_rs(col: Column | str, rs_format: str) -> Column:
    """``TO_TIMESTAMP(col, 'YYYY-MM-DD HH24:MI:SS')`` with Redshift tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c, redshift_to_jvm_format(rs_format))


def to_char_rs(col: Column | str, rs_format: str) -> Column:
    """``TO_CHAR(date_col, 'Mon,YYYY')`` with Redshift tokens
    (qb_profit&loss.py:148)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, redshift_to_jvm_format(rs_format))
