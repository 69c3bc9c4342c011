"""Sink setup semantics (DataflowExampleUtils.java:187-228 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dataflow_example_spark.sinks import (
    SchemaMismatchError,
    setup_sink_table,
    write_table,
)

SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("flow", IntegerType()),
    ]
)
OTHER = StructType([StructField("station_id", StringType())])
from dataflow_example_spark.streaming import drain


def test_setup_creates_then_noops(spark, tmp_path):
    path = str(tmp_path / "sink")
    setup_sink_table(spark, path, SCHEMA)
    assert spark.read.parquet(path).count() == 0
    setup_sink_table(spark, path, SCHEMA)  # idempotent


def test_setup_rejects_schema_mismatch(spark, tmp_path):
    path = str(tmp_path / "sink")
    setup_sink_table(spark, path, SCHEMA)
    with pytest.raises(SchemaMismatchError):
        setup_sink_table(spark, path, OTHER)


def test_write_table_appends(spark, tmp_path):
    path = str(tmp_path / "sink")
    df = spark.createDataFrame([("S001", 1)], SCHEMA)
    write_table(df, path)
    write_table(df, path)
    assert spark.read.parquet(path).count() == 2


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key by the same bucket count join
    WITHOUT any Exchange — the co-located fact-fact join the bucketed
    sink exists for."""
    import pyspark.sql.functions as F

    from dataflow_example_spark.sinks.bucketed import (
        read_bucketed,
        write_bucketed,
    )
    from dataflow_example_spark.tables import load

    o = load(spark, "/root/testdata/sf0.001", "orders")
    l = load(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(o, "orders_b", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"], path=str(tmp_path / "ob"))
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", ["o_orderkey"], num_buckets=8,
        sort_cols=["o_orderkey"], path=str(tmp_path / "lb"),
    )
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at sf0.001 the planner would broadcast (and rightly bypass the
        # buckets); force the fact-fact SortMergeJoin regime the bucketed
        # sink exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "lineitem_b")
        joined = ob.join(lb, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert "Bucketed: true" in plan
        # and it returns the right answer
        got = joined.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        want = (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert {(r.o_orderstatus, r.n) for r in got.collect()} == {
            (r.o_orderstatus, r.n) for r in want.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """partitionBy(lang) write -> a lang-filtered read shows
    PartitionFilters in the scan and touches only that partition's
    directory — the partition-pruning contract a 100 TB layout relies
    on."""
    import pyspark.sql.functions as F

    from dataflow_example_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1][:200]
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want
    import os

    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert "lang=en" in dirs and len(dirs) > 1


def test_foreach_batch_idempotent_writes(spark, tmp_path):
    """foreachBatch writes each micro-batch to a batch_id-keyed dir with
    overwrite: draining the same source twice through the same
    checkpoint produces no duplicates (replays replace themselves)."""
    import json

    from dataflow_example_spark.sinks.foreach_batch import write_batches

    src = tmp_path / "fb_src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(10):
            f.write(json.dumps({"k": i, "v": float(i)}) + "\n")

    def drain_once():
        stream = spark.readStream.schema("k LONG, v DOUBLE").json(str(src))
        q = write_batches(
            stream,
            str(tmp_path / "fb_out"),
            str(tmp_path / "fb_ck"),
        )
        drain(q, 120)

    drain_once()
    first = spark.read.parquet(str(tmp_path / "fb_out"))
    assert first.count() == 10
    drain_once()  # checkpoint says: nothing new -> no rewrites, no dups
    again = spark.read.parquet(str(tmp_path / "fb_out"))
    assert again.count() == 10
    assert {r.k for r in again.collect()} == set(range(10))


def test_dynamic_partition_pruning_on_fact_join(spark, tmp_path):
    """A fact table partitioned on the join key is pruned at RUNTIME by
    the dim filter (dynamicpruningexpression in PartitionFilters) — at
    100 TB the difference between scanning one partition and all of
    them, with the filter value only known after the dim scan."""
    import pyspark.sql.functions as F

    from dataflow_example_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.createDataFrame(
        [
            ("click", "interactive"),
            ("view", "interactive"),
            ("purchase", "commerce"),
            ("signup", "commerce"),
            ("error", "ops"),
        ],
        "event_type string, category string",
    )
    fact = spark.read.parquet(str(tmp_path / "fact"))
    j = fact.join(dim.filter(F.col("category") == "ops"), "event_type")
    n = j.count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert n == ev.filter(F.col("event_type") == "error").count()


def test_incremental_running_totals_view(spark, tmp_path):
    """The foreachBatch merge view accumulates across micro-batches and
    across separate drains (new files between runs), always equal to the
    batch aggregate over everything seen so far."""
    import json as _json

    import pyspark.sql.functions as F

    from dataflow_example_spark.sinks.incremental import running_totals_view

    src = tmp_path / "inc_src"
    src.mkdir()

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for et, v in rows:
                f.write(_json.dumps({"event_type": et, "value": v}) + "\n")

    def drain_once():
        stream = spark.readStream.schema(
            "event_type STRING, value DOUBLE"
        ).json(str(src))
        q = running_totals_view(
            stream, str(tmp_path / "store"), str(tmp_path / "inc_ck")
        )
        drain(q, 120)

    write_file("a.json", [("click", 1.0), ("click", 2.0), ("view", 5.0)])
    drain_once()
    got1 = {
        r.event_type: (r.n_events, r.sum_value)
        for r in spark.read.parquet(str(tmp_path / "store/data")).collect()
    }
    assert got1 == {"click": (2, 3.0), "view": (1, 5.0)}

    write_file("b.json", [("click", 10.0), ("error", 7.0)])
    drain_once()  # second run picks up only the new file via the checkpoint
    got2 = {
        r.event_type: (r.n_events, r.sum_value)
        for r in spark.read.parquet(str(tmp_path / "store/data")).collect()
    }
    assert got2 == {"click": (3, 13.0), "view": (1, 5.0), "error": (1, 7.0)}
