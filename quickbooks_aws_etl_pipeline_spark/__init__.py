"""PySpark-native analytics engine with the query and data-processing
capabilities of sameen99/QuickBooks-AWS-ETL-Pipeline, re-expressed
Spark-first.

The reference (read-only at /root/reference/) is nine pandas ETL
scripts: QuickBooks Online JSON -> flatten/project/cast -> Parquet on
S3 -> Redshift full-refresh load. This package owns those semantics
natively as lazy DataFrame -> DataFrame operators on top of Catalyst:

- ``session``    : SparkSession factory (AQE on, non-ANSI casts, UTC)
- ``io``         : table readers over the driver's parquet testdata
- ``naming``     : camelCase/dotted -> snake_case column renames
                   (reference: qb_bills.py:92, qb_billpayments.py:100-107)
- ``functions``  : scalar function layer incl. Redshift->JVM datetime
                   token translation (qb_bills.py:148-163)
- ``operators``  : transforms, explode/flatten, joins, aggregates,
                   windows, set ops, dedup, similarity, text analytics
- ``sources``    : QBO-shaped ingest (paginated scan union, report
                   tree/tabular/grouped parsers)
- ``sinks``      : parquet / csv / managed-table writers
                   (qb_bills.py:125-169 full-refresh semantics)
- ``plans``      : the query registry wired into __spark_entry__
- ``streaming``  : Structured Streaming windows + batch equivalents
"""

__version__ = "0.1.0"
