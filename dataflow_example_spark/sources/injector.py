"""PubsubFileInjector analog (SURVEY.md §3.3).

The reference replays a GCS CSV into a Pub/Sub topic line by line
(PubsubFileInjector.java:75-89: TextIO.read -> FilterHeaderAndEmpties ->
PubsubIO.writeStrings with a ``timestamp`` attribute). Here the "topic" is
a drop directory consumed by ``sources.text.stream_text``; each part file
is one publish batch.

The replay itself is a distributed Spark write (no driver-side collect):
files materialize under ``_temporary`` and are renamed into place by the
output committer, and Spark's file-stream reader ignores ``_``/``.``-
prefixed paths, so the subscriber never observes a partial batch. Injector
plus checkpointed file stream give exactly-once delivery — a documented
upgrade over the reference's at-least-once injection
(PubsubFileInjector.java:37-40).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.traffic import filter_header_and_empties


def inject_file(
    spark: SparkSession,
    input_path: str,
    topic_dir: str,
    chunks: int = 4,
) -> int:
    """Replay ``input_path`` into ``topic_dir`` as ``chunks`` text files,
    filtering headers/empties exactly like the reference injector
    (PubsubFileInjector.java:45-55). Returns the number of lines published.
    """
    lines = filter_header_and_empties(spark.read.text(input_path))
    lines.repartition(max(1, chunks)).write.mode("append").text(topic_dir)
    return lines.count()
