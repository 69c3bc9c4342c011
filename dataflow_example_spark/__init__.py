"""dataflow_example_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of vicenteg/dataflow-example.

The reference is an Apache Beam / Google Cloud Dataflow example
(TrafficMaxLaneFlow + PubsubFileInjector + StarterPipeline). This package
re-expresses every reference capability Spark-first:

- ``session``    — SparkSession factory (pins semantics the reference left
                   to the Dataflow runner: timezone, AQE, shuffle sizing).
- ``schemas``    — explicit StructTypes for raw traffic CSV, lane_info, and
                   the 10-column output table.
- ``operators``  — pure DataFrame -> DataFrame functions, identical in batch
                   and streaming (the reference's unified-model contract,
                   TrafficMaxLaneFlow.java:374-382).
- ``sources``    — text/file-stream/in-memory sources + the
                   PubsubFileInjector analog (file-replay based).
- ``streaming``  — Structured Streaming wiring (watermark, checkpoint,
                   foreachBatch sinks).
- ``functions``  — beyond-reference library: dedup, similarity search,
                   text analysis, multimodal column plumbing.

Design rule: DataFrame API everywhere, native column expressions on the
hot path (no Python row UDFs); pandas UDFs only where built-ins genuinely
cannot express the semantics.
"""

__version__ = "0.1.0"
