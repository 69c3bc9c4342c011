"""JSONL source with corrupt-record quarantine (beyond-reference; the
JSON twin of the traffic CSV dead-letter fork, operators/traffic.py
``traffic_quarantine``).

Crawl and API dumps arrive as JSON-lines with a tail of truncated or
malformed records; a 100 TB ingest must parse permissively, KEEP the
rejects (for reprocessing/forensics), and never abort the job on one bad
byte. Spark's PERMISSIVE mode with ``columnNameOfCorruptRecord`` gives
exactly that contract: well-formed lines parse into typed columns,
malformed lines land whole in the corrupt column with nulls elsewhere.

ANSI note (Spark 4): JSON parsing itself is not an ANSI cast — malformed
input degrades to the corrupt column instead of throwing, so no
try_cast wrapping is needed on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Read JSON-lines with the quarantine contract: ``schema`` is the
    DDL of the expected fields; the result carries ``_corrupt_record``
    (null for clean rows, the raw line for rejects)."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows drop the corrupt column;
    quarantined rows keep only the raw line for the dead-letter sink.

    Spark refuses a query that references ONLY the corrupt column of a
    raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    — its documented contract is to materialize the parsed frame first.
    Callers should ``df.cache()`` (or persist) the ``read_jsonl`` result
    before consuming the quarantine side, as docs_jsonl_ingest does."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantined
