"""Unit + property tests for the rename and datetime-token helpers
(SURVEY.md §5.3): pandas/reference semantics must be matched exactly."""

from __future__ import annotations

import re

from hypothesis import given, strategies as st

from quickbooks_aws_etl_pipeline_spark.naming import (flatten_dotted,
                                                      normalize_column,
                                                      snake_case)
from quickbooks_aws_etl_pipeline_spark.functions.datetime_formats import (
    redshift_to_jvm_format)


def _reference_snake(name: str) -> str:
    """The reference's exact char walk (qb_bills.py:92)."""
    return "".join("_" + c.lower() if c.isupper() else c for c in name).lstrip("_")


def test_snake_case_reference_cases():
    assert snake_case("DueDate") == "due_date"
    assert snake_case("DocNumber") == "doc_number"
    assert snake_case("TxnDate") == "txn_date"
    assert snake_case("Id") == "id"
    assert snake_case("already_snake") == "already_snake"


@given(st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), max_size=30))
def test_snake_case_matches_reference_walk(name):
    assert snake_case(name) == _reference_snake(name)


def test_dotted_flatten_and_fixups():
    # qb_billpayments.py:102-107: dots->underscores, __->_, manual fixup
    assert flatten_dotted("vendor_ref.value") == "vendor_ref_value"
    assert flatten_dotted("a__b___c") == "a_b_c"
    assert normalize_column("VendorRef.value") == "vendor_ref_value"
    assert normalize_column(
        "CheckPayment.BankAccountRef.name"
    ) == "check_payment_bank_account_ref_name"
    fix = {"credit_card_payment_c_c_account_ref_value": "credit_card_payment_cc_account_ref_value"}
    assert normalize_column("CreditCardPayment.CCAccountRef.value", fix) \
        == "credit_card_payment_cc_account_ref_value"


def test_redshift_tokens_reference_formats():
    # the three formats the reference actually uses
    assert redshift_to_jvm_format("YYYY-MM-DD") == "yyyy-MM-dd"
    assert redshift_to_jvm_format("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss"
    assert redshift_to_jvm_format("Mon,YYYY") == "MMM,yyyy"
    assert redshift_to_jvm_format("YYYY-MM") == "yyyy-MM"


def test_redshift_tokens_extended():
    assert redshift_to_jvm_format("DD/MM/YY") == "dd/MM/yy"
    assert redshift_to_jvm_format("HH12:MI AM") == "hh:mm a"
    assert redshift_to_jvm_format("MS") == "SSS"


@given(st.lists(st.sampled_from(
    ["YYYY", "MM", "DD", "HH24", "MI", "SS", "Mon", "-", ":", " ", ",", "/"]),
    min_size=1, max_size=10))
def test_redshift_translation_total(parts):
    """Every Redshift-token string translates without leftovers that
    would make Spark's parser throw (no stray uppercase tokens)."""
    fmt = "".join(parts)
    out = redshift_to_jvm_format(fmt)
    # no Redshift-only tokens survive
    assert "HH24" not in out
    assert not re.search(r"(?<!S)SS(?!S)|MI(?!l)", out) or "mm" in out or "ss" in out
