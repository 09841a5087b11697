"""Deterministic QBO-shaped ingest fixtures (FIXTURES.md §B).

Synthetic payloads mirroring the QBO response envelope and report
shapes; used by the report/entity Qkeys (whose oracles are literal
VALUES — the expected output is derived by hand from the reference's
transform semantics) and by unit tests.
"""

from __future__ import annotations

# --- B1: Bill entity pages (envelope + pagination) -------------------------
# two pages: the second is short -> terminates pagination
# (maxResults != 100, qb_billpayments.py:79)

BILL_PAGES: list[dict] = [
    {"QueryResponse": {"maxResults": 100, "Bill": [
        {"Id": "101", "SyncToken": "0", "DocNumber": "B-1001",
         "DueDate": "2024-02-15", "TxnDate": "2024-01-15",
         "Balance": 250.5, "PrivateNote": "net-30",
         "VendorRef": {"value": "77", "name": "Acme Supply"},
         "APAccountRef": {"value": "33", "name": "Accounts Payable"},
         "Line": [{"Amount": 250.5, "Id": "1"}],
         "LinkedTxn": [{"TxnId": "900", "TxnType": "BillPaymentCheck"}]},
        {"Id": "102", "SyncToken": "1", "DocNumber": "B-1002",
         "DueDate": "2024-03-01", "TxnDate": "2024-02-01",
         "Balance": 0.0,
         "VendorRef": {"value": "78", "name": "Globex"},
         "APAccountRef": {"value": "33", "name": "Accounts Payable"},
         "Line": [{"Amount": 75.0, "Id": "1"}, {"Amount": 25.0, "Id": "2"}],
         "LinkedTxn": []},
    ]}},
    {"QueryResponse": {"maxResults": 1, "Bill": [
        {"Id": "103", "SyncToken": "0", "DocNumber": "B-1003",
         "DueDate": "2024-03-20", "TxnDate": "2024-02-20",
         "Balance": 99.99, "PrivateNote": "rush",
         "VendorRef": {"value": "77", "name": "Acme Supply"},
         "APAccountRef": {"value": "34", "name": "AP Other"},
         # no LinkedTxn key at all: an empty [] would make this page
         # infer array<string> and clash with page 1's array<struct>
         # on union; a missing key exercises allowMissingColumns
         "Line": [{"Amount": 99.99, "Id": "1"}]},
    ]}},
]

# --- B4: JournalEntry pages (explode path) ---------------------------------
# multi-line entry (fan-out), line with missing Entity, and an entry
# with an empty Line array (explode_outer keeps it)

JOURNAL_PAGES: list[dict] = [
    {"QueryResponse": {"maxResults": 2, "JournalEntry": [
        {"Id": "201", "DocNumber": "JE-1", "TxnDate": "2024-01-10",
         "Adjustment": False, "PrivateNote": "opening",
         "Line": [
             {"Id": "1", "Description": "debit cash", "Amount": 500.0,
              "JournalEntryLineDetail": {
                  "PostingType": "Debit",
                  "AccountRef": {"value": "10", "name": "Cash"},
                  "Entity": {"Type": "Vendor",
                             "EntityRef": {"value": "77", "name": "Acme Supply"}}}},
             {"Id": "2", "Description": "credit equity", "Amount": 500.0,
              "JournalEntryLineDetail": {
                  "PostingType": "Credit",
                  "AccountRef": {"value": "30", "name": "Equity"}}},
         ]},
        {"Id": "202", "DocNumber": "JE-2", "TxnDate": "2024-01-11",
         "Adjustment": True, "Line": []},
    ]}},
]

# --- B6: ProfitAndLoss recursive tree --------------------------------------
# 3 nesting levels, empty amount strings, one non-numeric total

PNL_REPORT: dict = {
    "Header": {"StartPeriod": "2024-01-01", "EndPeriod": "2024-01-31"},
    "Rows": {"Row": [
        {"Header": {"ColData": [{"value": "Income"}, {"value": ""}]},
         "Rows": {"Row": [
             {"ColData": [{"value": "Sales"}, {"value": "1200.50"}]},
             {"Header": {"ColData": [{"value": "Services"}, {"value": ""}]},
              "Rows": {"Row": [
                  {"ColData": [{"value": "Consulting"}, {"value": "800"}]},
                  {"ColData": [{"value": "Training"}, {"value": "n/a"}]},
              ]},
              "Summary": {"ColData": [{"value": "Total Services"}, {"value": "800.00"}]}},
         ]},
         "Summary": {"ColData": [{"value": "Total Income"}, {"value": "2000.50"}]}},
        {"Header": {"ColData": [{"value": "Expenses"}, {"value": ""}]},
         "Rows": {"Row": [
             {"ColData": [{"value": "Rent"}, {"value": "500"}]},
         ]},
         "Summary": {"ColData": [{"value": "Total Expenses"}, {"value": "500.00"}]}},
    ]},
}

# --- B7: TransactionList tabular report ------------------------------------
# 9 titled columns; one non-numeric Amount (drives the NaN warning,
# qb_transactionlist.py:99-101)

TXN_LIST_REPORT: dict = {
    "Header": {"StartPeriod": "2024-01-01", "EndPeriod": "2024-01-31"},
    "Columns": {"Column": [
        {"ColTitle": "Date"}, {"ColTitle": "Transaction Type"},
        {"ColTitle": "Num"}, {"ColTitle": "Posting"}, {"ColTitle": "Name"},
        {"ColTitle": "Memo/Description"}, {"ColTitle": "Account"},
        {"ColTitle": "Split"}, {"ColTitle": "Amount"},
    ]},
    "Rows": {"Row": [
        {"ColData": [{"value": "2024-01-05"}, {"value": "Bill"},
                     {"value": "B-1001"}, {"value": "Yes"},
                     {"value": "Acme Supply"}, {"value": "net-30"},
                     {"value": "Accounts Payable"}, {"value": "Office"},
                     {"value": "250.50"}]},
        {"ColData": [{"value": "2024-01-09"}, {"value": "Deposit"},
                     {"value": "D-7"}, {"value": "Yes"},
                     {"value": "Globex"}, {"value": ""},
                     {"value": "Checking"}, {"value": "Sales"},
                     {"value": "1000.00"}]},
        {"ColData": [{"value": "2024-01-12"}, {"value": "Journal Entry"},
                     {"value": "JE-1"}, {"value": "No"},
                     {"value": ""}, {"value": "accrual"},
                     {"value": "Equity"}, {"value": "-Split-"},
                     {"value": "pending"}]},
    ]},
}

# --- B8: TransactionListByVendor two-level grouped report ------------------
# one vendor with two transactions, one vendor with zero (kept by
# explode_outer); 7 detail columns

TXN_BY_VENDOR_REPORT: dict = {
    "Header": {"StartPeriod": "2024-01-01", "EndPeriod": "2024-01-31"},
    "Rows": {"Row": [
        {"Header": {"ColData": [{"value": "Acme Supply", "id": "77"}]},
         "Rows": {"Row": [
             {"ColData": [{"value": "2024-01-05"}, {"value": "Bill"},
                          {"value": "B-1001"}, {"value": "Yes"},
                          {"value": "net-30"}, {"value": "Accounts Payable"},
                          {"value": "250.50"}]},
             {"ColData": [{"value": "2024-01-20"}, {"value": "Bill"},
                          {"value": "B-1003"}, {"value": "Yes"},
                          {"value": "rush"}, {"value": "AP Other"},
                          {"value": "99.99"}]},
         ]}},
        {"Header": {"ColData": [{"value": "Globex", "id": "78"}]},
         "Rows": {"Row": []}},
    ]},
}


# --- B2: BillPayment pages (mutually-sparse payment structs) ---------------
# Check rows carry CheckPayment.BankAccountRef, credit-card rows carry
# CreditCardPayment.CCAccountRef — each page misses the other struct
# entirely (FIXTURES.md B2; drives the reference's
# fillna(0).astype('Int32') at qb_billpayments.py:111-112 and the
# union's allowMissingColumns path)

BILLPAYMENT_PAGES: list[dict] = [
    {"QueryResponse": {"maxResults": 100, "BillPayment": [
        {"Id": "301", "PayType": "Check", "TotalAmt": 250.5,
         "TxnDate": "2024-02-01", "DocNumber": "BP-1",
         "VendorRef": {"value": "77", "name": "Acme Supply"},
         "CheckPayment": {"BankAccountRef": {"value": "55", "name": "Checking"}}},
        {"Id": "303", "PayType": "Check", "TotalAmt": 10.0,
         "TxnDate": "2024-02-07",
         "VendorRef": {"value": "77", "name": "Acme Supply"}},
    ]}},
    {"QueryResponse": {"maxResults": 1, "BillPayment": [
        {"Id": "302", "PayType": "CreditCard", "TotalAmt": 99.99,
         "TxnDate": "2024-02-05", "DocNumber": "BP-2",
         "VendorRef": {"value": "78", "name": "Globex"},
         "CreditCardPayment": {"CCAccountRef": {"value": "66", "name": "Amex"}}},
    ]}},
]


# --- B3: Deposit pages (stringified lines + timestamp load cast) -----------
# Deposit keeps Line stringified like Bill (qb_deposit.py:109) and is
# the one entity whose load casts txn_date with TO_TIMESTAMP
# (qb_deposit.py:142). Page 2's CashBack struct is present in the
# payload but NOT in selected_columns (qb_deposit.py:94-98), so the
# page union must tolerate a struct that page 1 never saw.

DEPOSIT_PAGES: list[dict] = [
    {"QueryResponse": {"maxResults": 100, "Deposit": [
        {"Id": "501", "TotalAmt": 1250.0, "TxnDate": "2024-04-01",
         "PrivateNote": "april batch", "DocNumber": "D-1",
         "DepositToAccountRef": {"value": "55", "name": "Checking"},
         "CurrencyRef": {"value": "USD", "name": "United States Dollar"},
         "Line": [{"Amount": 1000.0, "Id": "1"}, {"Amount": 250.0, "Id": "2"}]},
        {"Id": "502", "TotalAmt": 75.25, "TxnDate": "2024-04-03",
         "DepositToAccountRef": {"value": "55", "name": "Checking"},
         "CurrencyRef": {"value": "USD", "name": "United States Dollar"},
         "Line": [{"Amount": 75.25, "Id": "1"}]},
    ]}},
    {"QueryResponse": {"maxResults": 1, "Deposit": [
        {"Id": "503", "TotalAmt": 500.0, "TxnDate": "2024-04-05",
         "PrivateNote": "with cashback", "DocNumber": "D-3",
         "DepositToAccountRef": {"value": "56", "name": "Savings"},
         "CurrencyRef": {"value": "USD", "name": "United States Dollar"},
         "CashBack": {"AccountRef": {"value": "70", "name": "Petty Cash"},
                      "Amount": 50.0},
         "Line": [{"Amount": 550.0, "Id": "1"}]},
    ]}},
]


# --- B5: Purchase pages (explode + nullable-int cast path) -----------------
# Purchase explodes Line like JournalEntry but runs the
# to_numeric(errors='coerce').fillna(0).astype('Int32') chain on the
# line account id (qb_purchases.py:126-130); one line detail lacks the
# AccountRef entirely and one has a non-numeric value -> both become 0

PURCHASE_PAGES: list[dict] = [
    {"QueryResponse": {"maxResults": 2, "Purchase": [
        {"Id": "401", "DocNumber": "P-1", "TxnDate": "2024-03-01",
         "PaymentType": "Cash", "TotalAmt": 120.0,
         "Line": [
             {"Id": "1", "Amount": 100.0,
              "AccountBasedExpenseLineDetail": {
                  "AccountRef": {"value": "10", "name": "Supplies"}}},
             {"Id": "2", "Amount": 20.0,
              "AccountBasedExpenseLineDetail": {
                  "AccountRef": {"value": "n/a", "name": "Misc"}}},
         ]},
        {"Id": "402", "DocNumber": "P-2", "TxnDate": "2024-03-04",
         "PaymentType": "CreditCard", "TotalAmt": 55.5,
         "Line": [
             {"Id": "1", "Amount": 55.5},
         ]},
    ]}},
]
