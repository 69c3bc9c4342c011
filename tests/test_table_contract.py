"""Schema contract for the driver-generated testdata tables.

The driver regenerates /root/testdata between rounds and has shipped the
same logical column under different physical parquet types (events.ts was
TIMESTAMP(NANOS) in one generation, TIMESTAMP(MICROS) in the next). The
loader (tables.py) must normalize whatever arrives to ONE stable Spark
schema; this test pins that schema so an environment drift fails here —
one obvious test — instead of as fifteen opaque query errors.
"""

from __future__ import annotations

import pytest

from dataflow_example_spark.tables import TABLES, load

from conftest import SF_SMOKE

# Loader-facing contract: table -> {column: spark dtype}. This is what every
# query in the repo is written against, independent of the parquet bytes.
# Matches FIXTURES.md §4 (schemas verified from the driver's parquet files).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # the loader's normalization target, whatever parquet holds
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_loaded_schema_matches_contract(spark, table):
    got = dict(load(spark, SF_SMOKE, table).dtypes)
    assert got == EXPECTED[table], (
        f"{table}: loaded dtypes drifted from contract.\n"
        f"  got:      {got}\n  expected: {EXPECTED[table]}\n"
        "If the driver regenerated testdata with new physical types, fix "
        "tables.load to keep normalizing to the contract."
    )
