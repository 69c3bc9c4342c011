"""Token-budget packing for pretraining pipelines (beyond-reference;
BASELINE.json north star).

Pretraining data loaders concatenate the token stream of a corpus and
slice it into fixed-size context windows ("packing"): document boundaries
do not align with window boundaries, so a document may straddle windows.
``pack_documents`` computes that assignment declaratively: a prefix sum
of token counts gives each document its global token offset; integer
division by the budget gives the first/last context window it lands in.

Scale notes (100 TB): a single global prefix sum is a one-partition
window sort — never viable. Packing therefore runs per ``group_col``
(language, shard, source bucket): one hash exchange, prefix sums within
each group in parallel, deterministic ``order_col`` order inside. Groups
are independent context-window streams, which is also how production
loaders shard (per-language/per-source mixing happens at batch assembly,
not in the token stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens


def pack_documents(
    docs: DataFrame,
    budget: int = 256,
    group_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its token-offset span in the per-group
    concatenated stream and the context windows it covers.

    Returns (group, doc, n_tokens, start_offset, first_bin, last_bin,
    n_bins): ``start_offset`` is the prefix sum of earlier documents'
    token counts (group order by ``order_col``); window ``b`` holds
    tokens [b * budget, (b+1) * budget).
    """
    base = docs.select(
        F.col(group_col).alias("group"),
        F.col(order_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "start_offset"
    )
    out = base.select("group", "doc_id", "n_tokens", start)
    first_bin = F.floor(F.col("start_offset") / budget).cast("bigint")
    last_bin = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / budget
    ).cast("bigint")
    return out.select(
        "group",
        "doc_id",
        "n_tokens",
        "start_offset",
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        (last_bin - first_bin + 1).alias("n_bins"),
    )
