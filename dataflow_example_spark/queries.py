"""Driver-facing query registry.

Every entry is ``(spark, sf_dir) -> DataFrame`` over the driver's parquet
tables, with a matching DuckDB oracle in ``oracles.py`` (same column names,
same deterministic semantics — SURVEY.md §5 t2).

Float discipline (hash-match requirement): any aggregate over double
columns whose summation order Spark doesn't pin goes through exact
DECIMAL arithmetic and is cast to double at the end, so Spark and DuckDB
produce bit-identical values regardless of execution order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import TrafficConfig
from .functions import dedup as D
from .functions.numerics import dec_wide_to_double as _wd
from .functions import ranking as RK
from .functions import similarity as S
from .functions import text as T
from .operators.traffic import (
    extract_flow_info,
    filter_header_and_empties,
    format_maxes,
    max_lane_flow,
)
from .operators.windows import sessionize, sliding_agg, tumbling_agg
from .sources.memory import create_strings
from .functions.cachereg import on_cleanup as cachereg_on_cleanup
from .functions.cachereg import scratch_dir
from .streaming import drain
from .synth import synth_traffic_lines
from .tables import dim_bcast, load

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}


def query(name: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        return fn

    return deco


# money/measure decimal type used for order-independent exact aggregation
DEC = "decimal(18,6)"


def dec(col: str):
    return F.col(col).cast(DEC)


def is_finite(c) -> "F.Column":
    """TRUE iff the double column holds a finite value (not NULL / NaN /
    ±Inf). The guard for bucketization and log/floor assemblies whose
    ANSI casts crash on non-finite inputs — a 100 TB corpus is
    guaranteed to contain them (tools/dirty_input_sweep.py pins each
    use). NULL input yields NULL, which filters/`when`s treat as
    false."""
    d = c.cast("double")
    return ~F.isnan(d) & (F.abs(d) < F.lit(float("inf")))


# ---------------------------------------------------------------- reference


@query("starter_pipeline")
def starter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StarterPipeline (StarterPipeline.java:49-69): in-memory strings ->
    uppercase. Ops 5, 12, 13 of SURVEY.md §2."""
    return create_strings(spark, ["Hello", "World"]).select(
        F.upper("value").alias("value")
    )


@query("traffic_lane_info")
def traffic_lane_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse stage only (ExtractFlowInfoFn, ops 6-8): synthesized PeMS CSV
    lines -> one row per (reading, lane)."""
    return extract_flow_info(synth_traffic_lines(spark, sf_dir))


# The flagship pair shares one parsed+persisted lane-info frame per
# (session, sf_dir). Spark's cache manager already deduplicated the DATA
# (plan-equality lookup — both queries' persists resolved to one
# InMemoryRelation), but each query still re-BUILT and re-ANALYZED the
# ~400-expression parse subtree, which dominated the pair's construct
# time (r10 driver: 1.261 s + 0.906 s; VERDICT r10 item 5). The memo is
# dropped by cachereg.cleanup() together with the persist it wraps, so
# harnesses that release caches between queries (check_oracles) rebuild
# from scratch and see the exact per-query plan they always did.
_LANE_INFO_MEMO: dict[tuple[str, str], DataFrame] = {}


def _shared_lane_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _LANE_INFO_MEMO:
        from .functions.cachereg import register_persisted

        lane_info = extract_flow_info(
            filter_header_and_empties(synth_traffic_lines(spark, sf_dir))
        )
        _LANE_INFO_MEMO[key] = register_persisted(lane_info.persist())
    return _LANE_INFO_MEMO[key]


def _clear_lane_info_memo() -> None:
    _LANE_INFO_MEMO.clear()


cachereg_on_cleanup(_clear_lane_info_memo)


@query("traffic_max_lane_flow")
def traffic_max_lane_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's full analytics graph (TrafficMaxLaneFlow
    .java:371-396) — parse -> 60min/1min sliding windows -> per-(window,
    station) max-by -> 10-column projection. Same graph traffic_pipeline
    builds with cache_lane_info=True; the parse stage comes from the
    pair-shared memo above."""
    return format_maxes(
        max_lane_flow(
            _shared_lane_info(spark, sf_dir),
            TrafficConfig(cache_lane_info=True),
        )
    )


@query("traffic_max_lane_flow_tumbling")
def traffic_max_lane_flow_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate slide == duration case (SURVEY.md §2.5): tumbling-window
    variant of the flagship, exercising the --windowDuration/--windowSlideEvery
    knobs (TrafficMaxLaneFlow.java:332-344)."""
    cfg = TrafficConfig(
        window_duration_minutes=60, window_slide_minutes=60, cache_lane_info=True
    )
    return format_maxes(max_lane_flow(_shared_lane_info(spark, sf_dir), cfg))


# ------------------------------------------------------------------ windows


@query("events_tumbling_agg")
def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn("value", dec("value"))
    out = tumbling_agg(ev, "1 hour", keys=("event_type",))
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


@query("events_sliding_agg")
def events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn("value", dec("value"))
    out = sliding_agg(ev, "1 hour", "15 minutes", keys=("event_type",))
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@query("events_sessionize")
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn("value", dec("value"))
    out = sessionize(ev, "30 minutes", key="user_id")
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "first_event_ts",
        "last_event_ts",
    )


@query("events_salted_agg")
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation through a deterministic salt
    (operators/windows.py salted_agg): identical results to the direct
    groupBy, but hot keys spread over 16 reducers in phase 1 — the manual
    fallback when AQE skew handling isn't enough."""
    from .operators.windows import salted_agg

    return salted_agg(
        load(spark, sf_dir, "events"),
        keys=("event_type",),
        salt_col="event_id",
        value_col="value",
    )


@query("cube_order_stats")
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-set aggregate (all 4 subtotal combinations of
    status x priority) with grouping_id — completes the grouping-set
    family beside rollup_revenue."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            F.grouping_id().alias("grouping_level"),
        )
    )


@query("events_running_sum")
def events_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based analytic windows: per-user running event count and
    cumulative value, plus a 5-row moving average — ordered by (ts,
    event_id) for a total deterministic order. Restricted to purchases to
    keep the result compact."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-4, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.row_number().over(w).alias("seq"),
        F.sum(dec("value")).over(cum).cast("double").alias("cum_value"),
        (
            F.sum(dec("value")).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov)
        ).alias("moving_avg_5"),
    )


@query("events_value_percentiles")
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) per event_type via the exact
    percentile aggregate (linear interpolation) — the sketch-free
    small-group path; at 100 TB cardinalities switch to
    approx_percentile's mergeable t-digest-style sketch."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50_value"),
        F.percentile("value", F.lit(0.9)).alias("p90_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query("events_json_props")
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured handling: parse the events.props JSON column with
    an explicit schema (from_json — typed, codegen-friendly, no
    per-row schema inference) and aggregate on the extracted field."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query("q14_promo_effect")
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE WHEN inside sum)
    over a lineitem-part join — part is the broadcast side."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    one = F.lit(1).cast(DEC)
    rev = dec("l_extendedprice") * (one - dec("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev)  # null else
    joined = l.join(dim_bcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.coalesce(F.sum(promo), F.lit(0).cast(DEC)).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ----------------------------------------------------- relational analytics


@query("q1_pricing_summary")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over lineitem: demonstrates filter pushdown + partial
    aggregation (capabilities the reference gets only from Spark built-ins,
    SURVEY.md §2.1)."""
    l = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(DEC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("_sq"),
            F.sum(dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sbp").cast("double") / F.col("count_order")).alias("avg_price"),
            "count_order",
        )
    )


@query("q3_shipping_priority")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + aggregate + deterministic top-10. customer is small ->
    broadcast join; lineitem<->orders shuffles on the join key."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    one = F.lit(1).cast(DEC)
    revenue = F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim_bcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("_rev"))
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query("q5_local_supplier_volume")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join through the full star schema; dims broadcast."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    one = F.lit(1).cast(DEC)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim_bcast(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(dim_bcast(c, sf_dir, "customer"), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("_rev"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
    )


# ------------------------------------------------- text analysis (north star)


@query("text_token_stats")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting over documents (shared tokenizer contract)."""
    return T.token_stats(load(spark, sf_dir, "documents"))


@query("text_language_id")
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic with deterministic tie-break."""
    return T.language_id(load(spark, sf_dir, "documents"))


@query("text_quality_score")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punct/stopword-ratio quality scoring."""
    return T.quality_score(load(spark, sf_dir, "documents"))


@query("text_fingerprint")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 document fingerprints over the normalized token stream."""
    return T.fingerprint(load(spark, sf_dir, "documents"))


@query("text_chunks")
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, stride 48) —
    the context-window packing primitive for LLM ingest."""
    return T.chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=64, stride=48
    )


@query("text_salient_terms")
def text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document (df-normalized term frequency,
    the log-free TF-IDF variant with deterministic tie-break)."""
    return T.salient_terms(load(spark, sf_dir, "documents"), k=3)


@query("text_vocab_top_terms")
def text_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: top-100 terms by document
    frequency with total occurrence counts."""
    return T.vocab_top_terms(load(spark, sf_dir, "documents"), k=100)


@query("docs_hash_sample")
def docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample of documents keyed on doc_id —
    engine-portable md5 buckets, reproducible across runs/partitionings."""
    from .functions.sampling import hash_sample

    return hash_sample(
        load(spark, sf_dir, "documents"), "doc_id", 0.10
    ).select("doc_id", "lang", "n_chars")


@query("docs_train_test_split")
def docs_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof 80/20 train/test assignment keyed on doc_id."""
    from .functions.sampling import train_test_split

    return train_test_split(
        load(spark, sf_dir, "documents"), "doc_id", test_fraction=0.2
    ).select("doc_id", "lang", "split")


@query("docs_stratified_sample")
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified sample: keep 10% of English, 50%
    of everything else (the low-resource upweighting shape)."""
    from .functions.sampling import stratified_sample

    out = stratified_sample(
        load(spark, sf_dir, "documents"),
        strata_col="lang",
        fractions={"en": 0.10},
        key_col="doc_id",
        default_fraction=0.50,
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@query("events_pivot_by_type")
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user value totals spread across event-type columns —
    the explicit values list keeps the plan static (no distinct-scan
    planning pass) and the output schema deterministic."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.sum(dec("value")))
    )
    return pivoted.select(
        "user_id",
        *[F.col(t).cast("double").alias(f"sum_{t}") for t in types],
    )


@query("lineitem_unpivot_measures")
def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: the three lineitem measures to long form (bounded to
    the first 100 orders) — wide-to-long reshaping via the native unpivot
    operator (a zero-shuffle Expand)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    wide = l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "val",
    )


@query("part_price_histogram")
def part_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric bucketing: width_bucket histogram of part retail prices
    (20 equal bins over [900, 1000]) — the deterministic binning
    primitive behind distribution reporting (histogram_numeric is a
    sketch; width_bucket is exact)."""
    p = load(spark, sf_dir, "part")
    bucket = F.width_bucket(
        F.col("p_retailprice"), F.lit(900.0), F.lit(1000.0), F.lit(20)
    )
    return (
        p.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


@query("docs_source_domains")
def docs_source_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction: split the source tag into its alpha prefix and
    numeric id (regexp_extract groups, typed cast) and roll up by id
    parity shard — the provenance-parsing shape every crawl corpus
    needs."""
    d = load(spark, sf_dir, "documents")
    prefix = F.regexp_extract("source", r"^([a-z]+)", 1)
    # try_cast, not cast: with spark.sql.ansi.enabled pinned true
    # (session.py), a non-matching tag would make CAST('' AS INT) throw;
    # the pin's contract is NULL-and-drop for malformed values.
    src_id = F.regexp_extract("source", r"([0-9]+)$", 1).try_cast("int")
    return (
        d.select(
            prefix.alias("prefix"),
            src_id.alias("src_id"),
            "n_chars",
        )
        .groupBy("prefix", (F.col("src_id") % 4).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
    )


@query("supplier_name_near_dups")
def supplier_name_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate names — entity-resolution with EXACT
    segment blocking (PassJoin pigeonhole, functions/dedup.py
    ``edit_distance_pairs``): candidates are pairs sharing one of k+1
    name segments (shift <= k) within the same nation, so the quadratic
    term is bounded by per-segment-key block size, never by nation size
    (a coarse 25-value block is quadratic-fatal on a crawl corpus).
    Identical output to the naive within-nation self-join — the oracle
    runs exactly that."""
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    return D.edit_distance_pairs(
        s, block_col="s_nationkey", id_col="s_suppkey", name_col="s_name", k=2
    ).select(
        "s_nationkey",
        F.col("id_a").alias("key_a"),
        F.col("id_b").alias("key_b"),
        "edit_dist",
    )


@query("nation_segments_agg")
def nation_segments_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation: the distinct market segments per nation as
    a sorted, comma-joined string (collect_set is unordered — sort_array
    + array_join pins a deterministic, harness-sortable encoding)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.sort_array(F.collect_set("c_mktsegment")), ","
        ).alias("segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query("docs_curation_pipeline")
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-curation composition in ONE declarative
    plan: exact-dedup (keep each content's min doc_id) -> quality gate
    (score >= 0.3) -> deterministic 50% sample -> per-language counts.
    Each stage is the library operator; Catalyst fuses the whole chain —
    the filters run in the same scan-side stage, the dedup is the only
    shuffle."""
    from .functions.sampling import hash_sample

    docs = load(spark, sf_dir, "documents")
    reps = D.exact_dedup(docs).select("doc_id")
    # the quality gate is a row-wise map: filter the scored projection
    # directly (lang/n_chars ride it) instead of a second corpus
    # leftsemi join back onto docs (r10 — see fingerprint)
    quality = T.quality_score(docs, extra_cols=("lang", "n_chars")).filter(
        F.col("quality_score") >= 0.3
    )
    kept = quality.join(reps, "doc_id", "leftsemi")
    sampled = hash_sample(kept, "doc_id", 0.5, salt="curate")
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
    )


@query("orders_monthly_growth")
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series reporting: monthly order revenue with month-over-month
    delta via lag over the aggregate — the window-over-groupBy
    composition (aggregate first, then a tiny analytic pass over the
    month series)."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.sum(dec("o_totalprice")).alias("_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        F.col("_rev").cast("double").alias("revenue"),
        "n_orders",
        (F.col("_rev") - F.lag("_rev").over(w)).cast("double").alias(
            "mom_delta"
        ),
    )


@query("docs_pack_budget")
def docs_pack_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: per-language concatenated-stream offsets and
    the 256-token context windows each document covers — the pretraining
    loader's concat-and-slice assignment, computed declaratively."""
    from .functions.packing import pack_documents

    return pack_documents(
        load(spark, sf_dir, "documents"), budget=256, group_col="lang"
    )


@query("emb_label_centroids")
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long (label, pos, centroid) form —
    exact-decimal component sums, order-independent."""
    return S.label_centroids(load(spark, sf_dir, "embeddings"))


# --------------------------------------------------- deduplication (north star)


@query("dedup_exact")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy on md5(text)."""
    return D.exact_dedup(load(spark, sf_dir, "documents"))


@query("dedup_exact_normalized")
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-insensitive exact dedup (md5 over the normalized
    token stream): case/punctuation/whitespace variants collapse."""
    return D.exact_dedup_normalized(load(spark, sf_dir, "documents"))


@query("dedup_jaccard_pairs")
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= 0.2, evaluated only on
    MinHash-LSH candidate pairs — the scale composition (LSH generates,
    exact Jaccard verifies). The corpus-wide self-join baseline
    (D.jaccard_pairs) stays test-only."""
    docs = load(spark, sf_dir, "documents")
    cand = D.minhash_lsh_pairs(docs, scores=False)
    return D.jaccard_on_candidates(docs, cand, k=3, threshold=0.2)


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (16 hashes, 4x4 bands) with estimated
    Jaccard — the 100 TB-scale near-dup path."""
    return D.minhash_lsh_pairs(load(spark, sf_dir, "documents"))


@query("dedup_simhash_pairs")
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 3 (32-bit), via
    pigeonhole band bucketing (4 exact-match bands -> hash self-join;
    recall 1, no cross join)."""
    return D.simhash_pairs(load(spark, sf_dir, "documents"), max_hamming=3)


@query("dedup_clusters")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH pair edges -> connected components
    (iterative min-label propagation; cluster_id = min doc_id). The step
    that turns pairwise near-dup evidence into drop-lists."""
    pairs = D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), scores=False
    )
    return D.connected_components(pairs, dedupe_edges=False)


# --------------------------------------------- multimodal columns (north star)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.multimodal import as_media_table

    return as_media_table(load(spark, sf_dir, "documents"))


@query("mm_media_metadata")
def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media payloads -> metadata via Arrow-batched mapInPandas."""
    from .functions.multimodal import media_metadata

    return media_metadata(_media(spark, sf_dir))


@query("mm_frame_sample")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling: payload -> n_bytes%5+1 frame rows."""
    from .functions.multimodal import sample_frames

    return sample_frames(_media(spark, sf_dir))


@query("mm_decode_fake")
def mm_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode plumbing with the deterministic fake decoder (no codec libs
    in this environment; schema/batching identical to a real decoder)."""
    from .functions.multimodal import decode_media

    return decode_media(_media(spark, sf_dir), allow_fake=True)


@query("mm_extract_features")
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: payload -> 8-dim embedding via
    mapInPandas (deterministic md5-byte stand-in for a real model).

    The library API (functions/multimodal.extract_features) returns the
    vector as ``array<double>``; the driver-facing query flattens it to
    scalar columns f0..f7 because the correctness harness canonicalizes
    results with a pandas sort, which cannot order list cells."""
    from .functions.multimodal import FEATURE_DIM, extract_features

    out = extract_features(_media(spark, sf_dir))
    return out.select(
        "doc_id",
        "media_type",
        *[
            F.col("feature").getItem(j).alias(f"f{j}")
            for j in range(FEATURE_DIM)
        ],
    )


@query("events_user_stats")
def events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (COUNT(DISTINCT)) per event_type — planned as
    a two-level aggregate (partial distinct per partition, then final),
    never a global dedup shuffle of raw rows. The sketch-based scale path
    (approx_count_distinct / HLL) is events_approx_distinct."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


@query("events_approx_distinct")
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event_type — the
    mergeable-sketch path for 100 TB cardinality estimation. Sketch
    estimates differ across engines, so instead of emitting the raw
    estimate (which forced a weaker rows-only driver check through round
    5), the query emits the exact count plus a bound assertion: Spark
    computes BOTH its deterministic HLL++ estimate and the exact
    countDistinct in one aggregate and checks |approx-exact|/exact
    against the rsd-derived tolerance; the oracle emits the same groups
    with the same exact counts and literal TRUE — a full hash match that
    actually pins sketch accuracy."""
    ev = load(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("n_exact"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.greatest(F.lit(2.0), F.lit(0.05) * exact.cast("double"))
        ).alias("approx_within_5pct"),
    )


@query("events_user_zscore")
def events_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score normalization of event values — the feature-
    scaling shape. Moments come from exact DECIMAL sums (sum, sum of
    squares), so mean/variance are order-independent; the final float ops
    run in a fixed expression shape both engines evaluate identically.
    Restricted to purchases for a compact result."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = dec("value")
    stats = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("_s1"),
            F.sum((v * v).cast("decimal(28,12)")).alias("_s2"),
        )
        .filter(F.col("n") >= 2)
    )
    mean = F.col("_s1").cast("double") / F.col("n")
    var = (
        F.col("_s2").cast("double") - F.col("_s1").cast("double") * mean
    ) / (F.col("n") - 1)
    enriched = ev.join(
        stats.select(
            "user_id",
            "n",
            mean.alias("_mean"),
            F.sqrt(var).alias("_std"),
        ),
        "user_id",
    )
    return enriched.select(
        "user_id",
        "event_id",
        F.col("value").alias("raw_value"),
        (
            (F.col("value").cast("double") - F.col("_mean")) / F.col("_std")
        ).alias("zscore"),
    )


@query("events_approx_percentiles")
def events_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch percentiles (approx_percentile) per event_type —
    the 100 TB path beside the exact percentile query; sketches compose
    across partitions with one tiny shuffle. Like events_approx_distinct,
    raw sketch outputs aren't portable across engines, so the query emits
    a bound assertion instead: Spark computes its deterministic KLL-style
    approx_percentile AND the exact percentile in one aggregate and
    checks the estimate lands within 5% (or 2.0 absolute) of exact; the
    oracle emits the same groups/counts with literal TRUE."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("double")

    def within(p: float) -> F.Column:
        approx = F.percentile_approx(v, F.lit(p), F.lit(1000)).cast("double")
        exact = F.percentile(v, F.lit(p))
        return F.abs(approx - exact) <= F.greatest(
            F.lit(2.0), F.lit(0.05) * F.abs(exact)
        )

    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        within(0.5).alias("p50_within_bound"),
        within(0.9).alias("p90_within_bound"),
    )


@query("events_variant_props")
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: parse_json once,
    extract typed fields with path expressions — the schema-flexible
    complement to events_json_props' fixed-schema from_json (VARIANT
    keeps the full document queryable without declaring a schema; the
    binary encoding pushes field access into the engine)."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_variant_v")
    return spark.sql(
        """
        -- try_parse_json + try_cast: malformed props (or a non-numeric
        -- k) degrade to NULLs the aggregates skip, not a FAILFAST
        -- MALFORMED_RECORD_IN_PARSING / ANSI cast error
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(TRY_CAST(try_parse_json(props):k AS INT)
                             AS DECIMAL(18,6)))
                    AS DOUBLE) AS sum_k,
               MIN(TRY_CAST(try_parse_json(props):k AS INT)) AS min_k,
               MAX(TRY_CAST(try_parse_json(props):k AS INT)) AS max_k
        FROM events_variant_v
        GROUP BY event_type
        """
    )


@query("text_bpe_tokens")
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pretokenization count (GPT-2-style word/number/punct/space
    classes, lookahead-free so Java regex and RE2 agree): the token-budget
    estimator for LLM ingest."""
    pattern = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+"
    d = load(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.lower("text"), F.lit(pattern), 0)
    return d.select(
        "doc_id",
        F.size(pieces).cast("bigint").alias("n_bpe_tokens"),
        # try_divide: an empty document has zero pieces -> NULL ratio
        F.try_divide(
            F.length("text").cast("double"), F.size(pieces)
        ).alias("chars_per_token"),
    )


# ---------------------------------------------- similarity search (north star)


def _query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query set: the 10 lowest vec_ids."""
    return (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


@query("sim_cosine_topk")
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 10 query vectors."""
    emb = load(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, _query_vectors(spark, sf_dir), k=5)


@query("sim_lsh_topk")
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via sign-random-projection buckets + exact re-rank."""
    emb = load(spark, sf_dir, "embeddings")
    return S.lsh_topk(emb, _query_vectors(spark, sf_dir), k=5, n_planes=8, dim=64)


@query("sim_ivf_topk")
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF coarse quantization (16 deterministic centroids,
    probe 4 lists) + exact re-rank — the second scale path beside LSH."""
    emb = load(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, _query_vectors(spark, sf_dir), k=5, n_centroids=16, n_probe=4
    )


@query("sim_lsh_near_dup")
def sim_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed near-dup pairs (>= 0.4 cosine within shared LSH bucket) —
    the self-join-on-bucket scale path for embedding dedup."""
    return S.lsh_near_dup_pairs(
        load(spark, sf_dir, "embeddings"), threshold=0.4, n_planes=8, dim=64
    )


@query("emb_center_by_label")
def emb_center_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean-centering in long (vec_id, label, pos, centered)
    form — the native-ops scale path (the grouped-map applyInPandas twin
    lives in functions/similarity.center_by_label; equality is
    test-asserted). Pinned-fold centroids keep the oracle bit-exact.
    Bounded to the first 8 components for a compact result."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "_v")
    ).filter(F.col("pos") < 8)
    cent = S.label_centroids(emb).filter(F.col("pos") < 8)
    return comp.join(cent, ["label", "pos"]).select(
        "vec_id",
        "label",
        "pos",
        (F.col("_v").cast("double") - F.col("centroid")).alias("centered"),
    )


@query("sim_semantic_dedup_clusters")
def sim_semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup drop-lists: multi-table-LSH near-dup pairs ->
    connected components -> (vec_id, cluster_id = min member). The
    embedding-modality twin of dedup_clusters (which does the same over
    MinHash pairs for text)."""
    pairs = S.multi_lsh_near_dup_pairs(
        load(spark, sf_dir, "embeddings"),
        threshold=0.4,
        n_tables=8,
        n_planes=4,
        dim=64,
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return D.connected_components(pairs, dedupe_edges=False).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@query("sim_kmeans_assign")
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means (k=8, 2 fixed iterations, deterministic init) —
    the iterative-algorithm family beside connected components, and the
    offline centroid training ivf_topk defers to."""
    return S.kmeans_assign(load(spark, sf_dir, "embeddings"), k=8, iters=2)


@query("sql_interface")
def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface (SURVEY.md §2.1: the reference has no SQL
    parser; Spark SQL provides one at zero cost): the same star-schema
    query expressed as ANSI SQL over registered temp views."""
    for t in ("orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name,
               count(*) AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@query("sim_embedding_near_dup")
def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs at cosine >= 0.4 via multi-table
    LSH (8 tables x 4 planes): candidates share a bucket in any table,
    exact cosine re-rank — the scale path; the all-pairs cross join
    (S.cosine_near_dup_pairs) is demoted to a test-only recall verifier.
    (The synthetic embeddings' pairwise cosine tops out near 0.5, so 0.4
    yields a non-vacuous near-dup set.)"""
    return S.multi_lsh_near_dup_pairs(
        load(spark, sf_dir, "embeddings"),
        threshold=0.4,
        n_tables=8,
        n_planes=4,
        dim=64,
    )


@query("events_throttle")
def events_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) gap-session throttling: emit only the first
    event of each 30-minute session. Batch twin of the custom stateful
    streaming operator (streaming/stateful.py) — identical semantics,
    verified for parity in tests/test_stateful_streaming.py."""
    from .streaming.stateful import throttle_batch

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    return throttle_batch(
        ev,
        keys=["user_id", "event_type"],
        ts_col="ts",
        gap="30 MINUTES",
        order_col="event_id",
    )


@query("events_asof_join")
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py): every click gets the user's most
    recent purchase at-or-before it. One exchange on user_id — no
    inequality-join nested loop."""
    from .operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts_col="ts",
        right_cols=["event_id", "value"],
        tiebreak_col="event_id",
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("ts_asof").alias("purchase_ts"),
        F.col("event_id_asof").alias("purchase_id"),
        F.col("value_asof").alias("purchase_value"),
    )


@query("events_range_join")
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (operators/joins.py): clicks falling inside any
    error-burst window [error_ts, error_ts + 1h) for errors with
    value > 90. Hash join on the hour bucket + residual filter — no
    broadcast-nested-loop."""
    from .operators.joins import range_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    bursts = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 90))
        .select(
            F.col("event_id").alias("burst_id"),
            F.col("ts").alias("burst_start"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("burst_end"),
        )
    )
    return range_join(
        clicks,
        "click_ts",
        bursts,
        "burst_start",
        "burst_end",
        grain_seconds=3600,
    )


@query("q6_forecast_revenue")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + filter + global aggregate. The whole
    predicate reaches the parquet reader as PushedFilters (verified by
    tools/plan_audit.py) — at 100 TB this is the difference between a
    full-table read and row-group skipping."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).alias("_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(F.col("_rev").cast("double").alias("revenue"), "n_items")
    )


@query("q4_late_shipment_priority")
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-subquery — orders with at least one lineitem
    shipped >30 days after the order date, counted per priority.
    (The testdata lacks l_commitdate/l_receiptdate, so "late" is defined
    against o_orderdate — documented adaptation.)

    r15 shape: ONE l⋈o join, then count(DISTINCT o_orderkey) per
    priority. EXISTS-equivalent because o_orderkey is the orders PK and
    each order has exactly one priority, so the distinct late orderkeys
    per priority are exactly the semi-join survivors. The old shape
    (distinct + LEFT SEMI back into orders) scanned orders twice and
    paid two extra exchanges; here the join's o_orderkey partitioning
    already satisfies the distinct level's (priority, orderkey)
    clustering, so only the final per-priority aggregate exchanges
    (5 rows)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return late.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").alias("order_count")
    )


@query("q7_volume_shipping")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume per year —
    date-part extraction (F.year), a disjunctive pair predicate, and two
    broadcast dim joins feeding one fact aggregate."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    one = F.lit(1).cast(DEC)
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim_bcast(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(dim_bcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("_sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("_ck"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query("q13_customer_order_distribution")
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregate — customers
    with zero orders must appear (the outer join's whole point). First
    aggregate is per-customer (high cardinality, shuffles on c_custkey);
    second collapses to ~tens of rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query("q16_parts_never_ordered")
def q16_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join shape (TPC-H Q16's NOT-IN): parts never ordered in bulk
    (no lineitem with quantity > 40), counted per brand. LEFT ANTI join —
    the build side is just the distinct key set, and at scale the
    distinct-then-anti plan beats NOT IN's null-sensitive rewrite."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40)
    return (
        p.join(l.select("l_partkey").distinct(),
               p.p_partkey == F.col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("never_ordered"))
    )


@query("q22_idle_rich_customers")
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global avg over positive balances,
    computed once and broadcast) + anti join against orders. Customers with
    above-average balance and no urgent orders, per nation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(dec("c_acctbal") > F.col("avg_bal"))
        .join(o.select("o_custkey").distinct(),
              c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@query("q18_large_volume_customers")
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate used as an IN-subquery
    (= semi join on the aggregated key set). The heavy lineitem aggregate
    happens once; the surviving key set is data-dependent (usually tiny,
    but it scales with SF), so the join back onto orders carries no
    forced hint — AQE sees the aggregate stage's actual output size and
    broadcasts at runtime exactly when it is small (r11)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "inner")
        .join(dim_bcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").alias("total_price"),
            "total_qty",
        )
    )


@query("q10_returned_items")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    fact-fact shuffle join (lineitem x orders) with two broadcast dims,
    top-20 by revenue with deterministic tie-break."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    one = F.lit(1).cast(DEC)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim_bcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("_rev")
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query("q15_top_supplier")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view + global-max scalar subquery
    (suppliers matching the maximum quarterly revenue). The max is a
    1-row broadcast — no second pass over lineitem."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    one = F.lit(1).cast(DEC)
    revenue = (
        l.groupBy("l_suppkey")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("_r")
        )
    )
    max_r = revenue.agg(F.max("_r").alias("_mr"))
    return (
        revenue.join(F.broadcast(max_r), revenue._r == max_r._mr)
        .join(dim_bcast(s, sf_dir, "supplier"), revenue.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_r").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query("q17_small_quantity_revenue")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery — lineitems whose
    quantity is below 20% of their part's average quantity. Planned as a
    per-part pre-aggregate joined back (de-correlation), never a per-row
    re-scan; the avg uses exact decimal division for cross-engine parity."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "BRAND_1")
    avg_q = (
        l.groupBy("l_partkey")
        .agg(
            (F.sum(dec("l_quantity")) / F.count(F.lit(1)))
            .cast(DEC)
            .alias("_avg_q")
        )
    )
    return (
        l.join(dim_bcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .join(avg_q.withColumnRenamed("l_partkey", "_pk"),
              l.l_partkey == F.col("_pk"))
        .filter(dec("l_quantity") < F.lit(0.2).cast(DEC) * F.col("_avg_q"))
        .agg(
            (F.sum(dec("l_extendedprice")) / F.lit(7).cast(DEC))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query("q19_disjunctive_predicates")
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of three conjunctive predicate blocks over a
    lineitem-part broadcast join — the optimizer extracts the common
    p_partkey join key from the disjunction instead of falling back to a
    nested loop."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    one = F.lit(1).cast(DEC)
    block = lambda brand, qlo, qhi, szhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
        & (F.col("p_size") <= szhi)
    )
    return (
        l.join(dim_bcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .filter(block("BRAND_1", 1, 11, 5) | block("BRAND_2", 10, 20, 10)
                | block("BRAND_3", 20, 30, 15))
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query("q8_market_share")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a target nation's share of regional revenue per
    year — conditional aggregation over the full star join, every dim
    broadcast, one fact shuffle (lineitem-orders)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_ck"), F.col("n_regionkey").alias("_rk")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast(DEC)
    vol = dec("l_extendedprice") * (one - dec("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_1", vol)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim_bcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(dim_bcast(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("_sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("_ck"))
        .join(F.broadcast(r), F.col("_rk") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.coalesce(F.sum(target), F.lit(0).cast(DEC)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query("distinct_order_priorities")
def distinct_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a join projection (SURVEY.md §2.1: the reference has
    no distinct) — planned as a hash aggregate with map-side partial."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query("set_ops_customer_cohorts")
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result (SURVEY.md §2.1). Cohort A:
    BUILDING-segment customers; cohort B: customers with any urgent order.
    Spark plans INTERSECT/EXCEPT as left-semi/left-anti under distinct."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    tag = lambda df, op: df.select(  # noqa: E731
        F.lit(op).alias("op"), F.col("c_custkey")
    )
    return (
        tag(a.union(b).distinct(), "union")
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.exceptAll(b).distinct(), "except"))
    )


@query("events_sessionize_dynamic")
def events_sessionize_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessions: purchases keep a session alive for 60
    minutes, everything else 30 — per-event gap expressions in
    F.session_window."""
    from .operators.windows import sessionize_dynamic

    ev = load(spark, sf_dir, "events")
    return sessionize_dynamic(
        ev, gaps={"purchase": "60 minutes"}, default_gap="30 minutes"
    )


@query("events_top_types_sketch")
def events_top_types_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy-hitter sketch, exploded to long form. With 5
    distinct values the sketch tracks every item exactly, so the DuckDB
    oracle is the exact count ranking; at real cardinality the same
    query returns estimates from a fixed-size mergeable sketch."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_v")
    top = spark.sql(
        "SELECT approx_top_k(event_type, 5) AS tk FROM events_v"
    )
    return (
        top.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("n_events"),
        )
        .orderBy(F.desc("n_events"), F.asc("event_type"))
    )


@query("events_funnel")
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who viewed, then clicked at or
    after their first view, then purchased at or after that click —
    the sequential-pattern shape. Three chained per-user min-aggregates
    (each step's timestamp conditions on the previous step), no window
    scan of the raw stream."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_viewed"),
            F.count("t2").alias("n_clicked_after_view"),
            F.count("t3").alias("n_purchased_after_click"),
        )
    )


@query("grouping_sets_revenue")
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind ROLLUP/CUBE):
    exactly the (returnflag), (linestatus), and () aggregates in one
    pass — one Expand before the shuffle, partial aggregation intact."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_items,
               CAST(grouping_id() AS BIGINT) AS grouping_level
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query("events_lead_lag_ntile")
def events_lead_lag_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag navigation plus ntile quartiles per event_type — the
    remaining analytic-window primitives (ordered by (value, event_id)
    for a total deterministic order). Restricted to signups for a
    compact result.

    After the filter, event_type is a single value, so the original
    per-type window was ONE sort task over every signup — the global-
    window scale-killer in disguise. Rewritten on ranking.global_ntile
    (two-pass range-partitioned rank + tile); lead/lag become self-
    equi-joins on rank±1 — two hash joins on a unique key instead of a
    data-sized sort, bit-identical output."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_type", "event_id", "value")
    )
    ranked = RK.global_ntile(
        ev,
        [F.asc("value"), F.asc("event_id")],
        4,
        out_col="quartile",
        rank_col="_rn",
    )
    prev = ranked.select(
        (F.col("_rn") + 1).alias("_rn"), F.col("value").alias("prev_v")
    )
    nxt = ranked.select(
        (F.col("_rn") - 1).alias("_rn"), F.col("value").alias("next_v")
    )
    return (
        ranked.join(prev, "_rn", "left")
        .join(nxt, "_rn", "left")
        .select(
            "event_type",
            "event_id",
            F.col("value").alias("v"),
            "prev_v",
            "next_v",
            "quartile",
        )
    )


@query("rollup_revenue")
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregate (SURVEY.md §2.1) with grouping_id to
    disambiguate subtotal rows from real NULL keys. One Expand + one
    aggregate — the multi-set expansion happens before the shuffle, so
    partial aggregation still applies."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_extendedprice")).alias("_rev"),
            F.count(F.lit(1)).alias("n_items"),
            F.grouping_id().alias("grouping_level"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_rev").cast("double").alias("revenue"),
            "n_items",
            "grouping_level",
        )
    )


@query("top_customers_per_nation")
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window function (rank within partition) — beyond-reference
    capability (SURVEY.md §2.1: the reference has no analytic windows).

    25 nations over billions of customers makes c_nationkey a HOT
    partition key — a plain per-nation window is one sort task per
    nation over 1/25 of the table. ranking.grouped_top_k runs the same
    deterministic row_number in two levels (local top-3 per (nation,
    salt), exact top-3 over the <=64*3 survivors), identical output."""
    c = load(spark, sf_dir, "customer")
    return RK.grouped_top_k(
        c.select("c_nationkey", "c_custkey", "c_name", "c_acctbal"),
        ["c_nationkey"],
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        3,
        salt_expr=F.xxhash64("c_custkey"),
        rank_col="rank_in_nation",
    ).select(
        "c_nationkey", "c_custkey", "c_name", "c_acctbal", "rank_in_nation"
    )


@query("events_column_profile")
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiler (data-quality audit for a training
    pipeline): per column of `events`, row count, null count, and exact
    distinct count, emitted long-form. One aggregate over one scan — the
    multi-column distincts plan as a single Expand, so the table is read
    once no matter how many columns are profiled."""
    ev = load(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = ev.agg(*aggs)
    stack_args = ", ".join(f"'{c}', _nn_{c}, _nd_{c}" for c in cols)
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


@query("orders_month_gapfill")
def orders_month_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: monthly order revenue over the *complete*
    month range (empty months appear with zero revenue). The calendar is
    generated with `sequence` from a 1-row min/max aggregate and broadcast
    to a left join — no driver-side date loop, and the dense calendar is
    O(months), never O(rows)."""
    o = load(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.sum(dec("o_totalprice")).alias("_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    cal = (
        o.agg(
            F.date_trunc("month", F.min("o_orderdate")).alias("_lo"),
            F.date_trunc("month", F.max("o_orderdate")).alias("_hi"),
        )
        .select(
            F.explode(
                F.sequence("_lo", "_hi", F.expr("interval 1 month"))
            ).alias("month")
        )
    )
    return (
        cal.join(monthly, "month", "left")
        .select(
            "month",
            F.coalesce(F.col("_rev").cast("double"), F.lit(0.0)).alias(
                "revenue"
            ),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


@query("lineitem_corr_stats")
def lineitem_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample stddev per return flag, built from
    exact DECIMAL co-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) so the result
    is order-independent and bit-identical to the oracle — the built-in
    single-pass `corr`/`stddev` are streaming co-moments whose float
    rounding depends on partition order, so they can't hash-match across
    engines. Same shuffle shape as the built-in: one partial-aggregated
    groupBy."""
    l = load(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    g = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sx2"),
        F.sum(y * y).alias("_sy2"),
    )
    # Cancellation in exact decimal (numerics.pearson_exact_parts); only
    # the compact integer parts reach double, via the portable
    # nearest-double conversion, so DuckDB's double-rounding
    # wide-decimal->double cast can no longer be amplified into the
    # 12th significant digit at large scale factors.
    from .functions.numerics import dec_int_to_double, pearson_exact_parts

    num, den_x, den_y = pearson_exact_parts(
        sx="_sx", sy="_sy", sxy="_sxy", sxx="_sx2", syy="_sy2"
    )
    n = F.col("n").cast("double")
    # try_divide on both statistics: a degenerate group (n=1, or constant
    # x/y) leaves corr/stddev undefined -> NULL, not a job-killing ANSI
    # DIVIDE_BY_ZERO; quotients are unchanged whenever defined
    return g.select(
        "l_returnflag",
        "n",
        F.try_divide(
            dec_int_to_double(num),
            F.sqrt(dec_int_to_double(den_x) * dec_int_to_double(den_y)),
        ).alias("corr_qty_price"),
        F.sqrt(
            F.try_divide(dec_int_to_double(den_x), n * (n - F.lit(1.0)))
        ).alias("stddev_qty"),
    )


@query("docs_split_decontamination")
def docs_split_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: test-split documents whose 12-token
    normalized prefix fingerprint also appears in the train split (the
    eval-leakage audit every LLM data pipeline needs before training —
    prefix keys catch near-dups that share openings but diverge later).
    Composes the leak-proof hash split with the md5 prefix fingerprint;
    one shuffle on the 16-byte fingerprint key, train side pre-aggregated
    to (fingerprint, count, min_doc) before the join so the probe side
    never fans out. Fingerprint and split are BOTH row-wise maps over
    the same scan, so they compose as one projection — the old shape
    computed them as two scans joined back on doc_id, a full-corpus
    shuffle that bought nothing (r10)."""
    from .functions.sampling import train_test_split
    from .functions.text import fingerprint

    docs = load(spark, sf_dir, "documents")
    fp = train_test_split(
        fingerprint(docs, prefix_tokens=12), "doc_id", test_fraction=0.2
    )
    train = (
        fp.filter(F.col("split") == "train")
        .groupBy("fingerprint_md5")
        .agg(
            F.count(F.lit(1)).alias("n_train_matches"),
            F.min("doc_id").alias("first_train_doc"),
        )
    )
    return (
        fp.filter(F.col("split") == "test")
        .select(F.col("doc_id").alias("test_doc_id"), "fingerprint_md5")
        .join(train, "fingerprint_md5")
        .select("test_doc_id", "n_train_matches", "first_train_doc")
    )


@query("text_repetition_filter")
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules repetition/boilerplate filter (token-granular):
    duplicate-token fraction, top-bigram fraction, composite keep verdict
    — one linear codegen scan, no shuffle (functions/text.py
    repetition_stats)."""
    return T.repetition_stats(load(spark, sf_dir, "documents"))


@query("text_pii_redact")
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over the documents table. The synthetic corpus
    contains no PII, so the query plants deterministic emails/phones on a
    doc_id-keyed subset first (both engines build the identical string),
    then counts and redacts with the shared portable regexes — proving
    detection, replacement, and pass-through on clean rows."""
    d = load(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit(" call +431"),
                F.lpad((F.col("doc_id") % 100000).cast("string"), 5, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return T.pii_redact(planted)


@query("docs_mix_weights")
def docs_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static domain-mixture reweighting: per-source sampling weight
    toward a uniform target share (functions/sampling.py
    source_mix_weights; DoReMi-style learned targets use the same
    contract)."""
    from .functions.sampling import source_mix_weights

    return source_mix_weights(load(spark, sf_dir, "documents"))


@query("emb_quantize_int8")
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column
    (functions/similarity.quantize_int8): 4x memory for ANN candidate
    storage, with per-vector max reconstruction error.

    The code vector is serialized with ``to_json`` in the final select:
    the driver's canonicalizer sorts rows through pandas, which cannot
    hash ndarray cells (round-5 driver err), so the registry contract is
    atomic output columns only — ``[1,-3,...]`` as a string hashes
    identically in both engines."""
    q = S.quantize_int8(load(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id", "scale", F.to_json("qvec").alias("qvec"), "max_abs_err"
    )


@query("streaming_traffic_parity")
def streaming_traffic_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible streaming proof (SURVEY §2 ops 2-4): synthesize the
    PeMS CSV, replay it through the injector into a file-drop topic
    (op 3), drain it with the streaming pipeline — unbounded source
    (op 2), watermarked tumbling aggregation, parquet sink (op 4) under
    availableNow — and return the sink contents. With payload timestamps
    and a zero watermark delay, append mode emits exactly the windows
    whose end <= the final watermark (= max event time), which is what
    the oracle computes from the batch definition: the unified
    batch/streaming contract, checked end-to-end by the correctness
    gate rather than only by pytest."""
    import os

    from .sources.injector import inject_file
    from .streaming.traffic import run_traffic_stream

    base = scratch_dir("dfx_stream_parity_")
    src = os.path.join(base, "src")
    topic = os.path.join(base, "topic")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    synth_traffic_lines(spark, sf_dir).coalesce(1).write.mode(
        "overwrite"
    ).text(src)
    inject_file(spark, src, topic, chunks=4)

    cfg = TrafficConfig(
        window_duration_minutes=60,
        window_slide_minutes=60,
        streaming=True,
        streaming_honor_payload_timestamp=True,
        watermark_delay="0 seconds",
    )
    q = run_traffic_stream(
        spark,
        topic,
        output_dir=out,
        checkpoint_dir=ckpt,
        config=cfg,
        available_now=True,
    )
    drain(q, 600)
    return spark.read.parquet(out)


@query("text_unigram_logprob")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram surprisal per document under the corpus's own unigram
    model (functions/text.unigram_surprisal) — the zero-model slot of the
    LM-perplexity quality-filter contract."""
    return T.unigram_surprisal(load(spark, sf_dir, "documents"))


@query("docs_token_budget_plan")
def docs_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining token accounting per source: corpus token counts x
    uniform mixture target -> tokens drawn per 1M-token epoch and epochs
    until each source is exhausted (starts repeating). The planning
    table a data-mixing run derives its sampling schedule from."""
    budget = 1_000_000
    toks = load(spark, sf_dir, "documents").select(
        "source", F.size(T.tokens(F.col("text"))).cast("bigint").alias("_nt")
    )
    per = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
    )
    tot = per.agg(F.count(F.lit(1)).alias("_n_sources"))
    per = per.crossJoin(F.broadcast(tot))
    target_frac = F.lit(1.0) / F.col("_n_sources")
    tokens_per_epoch = target_frac * F.lit(float(budget))
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        target_frac.alias("target_frac"),
        tokens_per_epoch.alias("tokens_per_epoch"),
        (F.col("n_tokens").cast("double") / tokens_per_epoch).alias(
            "epochs_to_exhaust"
        ),
    )


@query("events_winsorize")
def events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier clipping (winsorization at p05/p95): group bounds
    from the exact percentile aggregate, broadcast back, clip with
    least/greatest — the standard feature-cleaning transform before
    training-data export. Two passes over the data, no full-data sort; at
    100 TB swap the exact percentile for approx_percentile's mergeable
    sketch (same plan shape, same clip stage)."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("_lo"),
        F.percentile("value", F.lit(0.95)).alias("_hi"),
    )
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("_lo")), F.col("_hi")).alias(
            "value_winsorized"
        ),
        ((F.col("value") < F.col("_lo")) | (F.col("value") > F.col("_hi"))).alias(
            "clipped"
        ),
    )


@query("docs_source_vocab_overlap")
def docs_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level vocabulary Jaccard — the corpus-diagnostics
    matrix behind dataset mixing decisions (near-identical sources are
    mixing-redundant). Plan: distinct (source, term) — one shuffle —
    then a self-join on term (fan-out bounded by n_sources^2 per term,
    never by corpus size) -> intersection counts -> Jaccard from
    inclusion-exclusion. At very large vocabularies swap the exact
    distinct set for per-source MinHash signatures (same output
    contract)."""
    st = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(T.tokens(F.col("text"))).alias("term"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n_terms"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(b, "term")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_terms").alias("_na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_terms").alias("_nb")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


@query("docs_cap_per_source")
def docs_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source contribution cap (10 docs per source, md5
    order): the no-domain-dominates rule of crawl curation
    (functions/sampling.cap_per_group)."""
    from .functions.sampling import cap_per_group

    return cap_per_group(
        load(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars"
        ),
        cap=10,
    )


# ------------------------------------------------- round 5: TPC-H completion
# The testdata has no partsupp table and lineitem lacks shipmode/commit/
# receipt dates, so Q2/Q9/Q11/Q12/Q20/Q21 are implemented SHAPE-faithfully
# (same operator pattern: correlated min, star-join profit, scalar-subquery
# HAVING, conditional agg, nested semi-joins, exists/not-exists) over the
# available columns, completing the 22-query relational suite.


@query("q2_min_cost_supplier")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery over a star join. The
    part-supplier cost relation is derived from lineitem (min observed
    unit price per (part, supplier) — IEEE double division, identical in
    both engines); for each LARGE part, keep the EUROPE suppliers offering
    the regional minimum cost. De-correlated as a per-part min
    pre-aggregate joined back; all dims broadcast."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(
            # try_divide: a zero-quantity line (data corruption at scale)
            # degrades to a NULL unit price that min() skips, instead of
            # an ANSI DIVIDE_BY_ZERO killing the scan
            F.min(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
            ).alias("supply_cost")
        )
    )
    eu = (
        supply.join(dim_bcast(p, sf_dir, "part"), supply.l_partkey == p.p_partkey)
        .join(dim_bcast(s, sf_dir, "supplier"), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    min_cost = eu.groupBy(F.col("p_partkey").alias("_mk")).agg(
        F.min("supply_cost").alias("_mc")
    )
    return (
        eu.join(
            min_cost,
            (eu.p_partkey == F.col("_mk"))
            & (eu.supply_cost == F.col("_mc")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "supply_cost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query("q9_product_type_profit")
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, order year) over the
    full star join, parts filtered by name substring. Cost side uses
    p_retailprice * quantity (no partsupp in the testdata); all arithmetic
    exact DECIMAL, cast to double at the end."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    n = load(spark, sf_dir, "nation")
    one = F.lit(1).cast(DEC)
    profit = dec("l_extendedprice") * (one - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim_bcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .join(dim_bcast(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query("q11_important_stock")
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with a global-total scalar
    subquery in the HAVING (parts worth > 0.1% of the nation group's
    total line value). The total is a 1-row broadcast, not a second
    shuffle; the threshold compare runs in double on both engines
    (identical operands -> identical result)."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    scoped = l.join(dim_bcast(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    value = scoped.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("_v")
    )
    total = value.agg(F.sum("_v").alias("_t"))
    return (
        value.join(F.broadcast(total))
        .filter(
            F.col("_v").cast("double") > F.col("_t").cast("double") * 0.001
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_v").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query("q12_shipmode_priority")
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts per shipping class. Ship mode
    is derived (no l_shipmode column): latency buckets from
    datediff(l_shipdate, o_orderdate) — FAST < 30d, MEDIUM < 90d, else
    SLOW; counts split by high (URGENT/HIGH) vs low order priority.
    One fact-fact shuffle join, map-side partial counts."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "FAST")
        .when(delay < 90, "MEDIUM")
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query("q20_promo_part_suppliers")
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers in ASIA who
    moved more than 50 units of some PROMO part. The inner aggregate
    (per supplier-part shipped quantity) reduces before any join; the
    supplier probe is LEFT SEMI so no fan-out survives."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    heavy = (
        l.join(dim_bcast(p, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > F.lit(50).cast(DEC))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


@query("q21_late_suppliers")
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation — suppliers
    whose line was >60 days late on a finished multi-supplier order where
    no other supplier was late. Planned as semi-join (another supplier
    exists) + anti-join (no other late supplier); per-(supplier, order)
    pairs deduplicated before counting."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_pairs = l.select("l_orderkey", "l_suppkey").distinct()
    l2 = all_pairs.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    waiting = (
        late.join(
            l2,
            (late.l_orderkey == F.col("_ok2"))
            & (late.l_suppkey != F.col("_sk2")),
            "left_semi",
        ).join(
            l3,
            (late.l_orderkey == F.col("_ok3"))
            & (late.l_suppkey != F.col("_sk3")),
            "left_anti",
        )
    )
    s = load(spark, sf_dir, "supplier")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(dim_bcast(s, sf_dir, "supplier"), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query("streaming_dedup_parity")
def streaming_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leg of the dedup family (VERDICT r4 #6): replay the
    documents table with injected duplicates through a parquet file-drop
    topic, dedup with ``dropDuplicatesWithinWatermark`` on the content
    fingerprint (streaming/dedup.dedup_stream), drain under availableNow
    into a parquet sink, and return the sink contents. The projection
    keeps only columns functionally dependent on the fingerprint
    (content_md5, n_chars), so the arbitrary-kept-row semantics of
    streaming dedup cannot leak nondeterminism; the oracle is the batch
    DISTINCT over the same fingerprint."""
    import os

    from .streaming.dedup import run_dedup_stream

    base = scratch_dir("dfx_dedup_parity_")
    topic = os.path.join(base, "topic")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    docs = load(spark, sf_dir, "documents")
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    feed = docs.unionByName(dups).withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("doc_id") % 3600
        ),
    )
    feed.repartition(4).write.mode("overwrite").parquet(topic)

    q = run_dedup_stream(
        spark,
        topic,
        output_dir=out,
        checkpoint_dir=ckpt,
        schema=feed.schema,
        watermark="1 day",
        select_cols=["content_md5", "n_chars"],
    )
    drain(q, 600)
    return spark.read.parquet(out)


@query("dedup_clusters_star")
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters via large-star/small-star contraction
    (functions/dedup.connected_components_star) over the same MinHash-LSH
    pair edges as ``dedup_clusters`` — the O(log n)-round scale path for
    adversarial chain graphs (crawl dup-chains); identical output
    contract (cluster_id = min doc_id), identical oracle."""
    pairs = D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), scores=False
    )
    return D.connected_components_star(pairs)


@query("dedup_minhash_lsh_capped")
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-guarded LSH candidate pairs: identical to ``dedup_minhash_lsh``
    except band buckets with more than 16 members are quarantined before
    the self-join (functions/dedup.minhash_lsh_pairs bucket_cap), so a
    boilerplate-heavy corpus cannot produce an O(size²) hot task. The
    overflow report is ``lsh_bucket_overflow`` (traffic_quarantine
    pattern)."""
    return D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), bucket_cap=16
    )


@query("docs_pack_bins")
def docs_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest over the packing assignment: per (group, context
    window of first token) — how many documents start in the window and
    how many tokens they contribute. The loader-side view of
    ``docs_pack_budget`` (which is per-document); one extra map-side
    aggregation over the packing output, no new shuffle key."""
    from .functions.packing import pack_documents

    packed = pack_documents(
        load(spark, sf_dir, "documents"), budget=256, group_col="lang"
    )
    return (
        packed.groupBy("group", F.col("first_bin").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("group", "bin")
    )


@query("events_session_funnel_windowed")
def events_session_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel evaluated WITHIN each user session (30-minute gap
    sessionization): sessions where a view happened, a click at or after
    that session's first view, and a purchase at or after that click.
    Session assignment is the lag/cumsum shape (one window per user);
    the funnel is three chained conditional min-aggregates keyed by
    (user, session) — no per-event state machine. The gap compare is
    EXACT microsecond interval arithmetic (ts >= prev + INTERVAL), not
    truncated-second subtraction: cast("long") floors each timestamp,
    so a true gap in (1799 s, 1800 s) could round to 1800 and split
    where the microsecond-exact oracle merges (r14 self-review finding;
    boundary pinned in tests/test_session_tie_parity.py)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.col("ts")
            >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
        ),
        1,
    ).otherwise(0)
    sess = ev.withColumn(
        "sess_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    s1 = (
        sess.filter(F.col("event_type") == "view")
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        sess.filter(F.col("event_type") == "click")
        .join(s1, ["user_id", "sess_id"])
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        sess.filter(F.col("event_type") == "purchase")
        .join(s2, ["user_id", "sess_id"])
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, ["user_id", "sess_id"], "left")
        .join(s3, ["user_id", "sess_id"], "left")
        .agg(
            F.count("t1").alias("n_sessions_viewed"),
            F.count("t2").alias("n_sessions_clicked"),
            F.count("t3").alias("n_sessions_purchased"),
        )
    )


@query("docs_minhash_containment")
def docs_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| (and /|B|) on the MinHash-LSH
    candidate pairs — catches quote/subset near-dups that symmetric
    Jaccard under-scores (a short doc fully contained in a long one).
    Same bounded candidate-scoped plan as dedup_jaccard_pairs; the two
    divisions are the only double ops."""
    docs = load(spark, sf_dir, "documents")
    cand = D.minhash_lsh_pairs(docs, scores=False)
    sh = D.shingles(docs).cache()
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_a")).alias(
                "containment_a"
            ),
            (F.col("n_common").cast("double") / F.col("n_b")).alias(
                "containment_b"
            ),
        )
    )


@query("events_interval_overlap_count")
def events_interval_overlap_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum concurrent intervals per user — the classic sweep-line as
    a window aggregation: each event spans [ts, ts + value seconds);
    +1/-1 boundary markers, running sum ordered by (time, delta) with
    ends sorting before starts (half-open semantics), max per user.
    Interval ends use exact integer-millisecond arithmetic so both
    engines build identical timestamps. Per-user windows parallelize by
    key; no global sort."""
    from pyspark.sql.window import Window

    # finite-duration guard: a NaN/Inf value has no interval end (the
    # round->long cast would ANSI-overflow); NULL-and-drop the event
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .filter(is_finite(F.col("value")))
    )
    end_ts = F.timestamp_millis(
        F.unix_millis(F.col("ts"))
        + F.round(F.col("value") * 1000).cast("long")
    )
    starts = ev.select("user_id", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select("user_id", end_ts.alias("t"), F.lit(-1).alias("delta"))
    marks = starts.unionByName(ends)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marks.withColumn("running", F.sum("delta").over(w))
        .groupBy("user_id")
        .agg(F.max("running").alias("max_concurrent"))
        .orderBy("user_id")
    )


@query("docs_quality_gate_report")
def docs_quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule quality-gate report over the corpus: five heuristic
    rules (char bounds, word count, mean word length, distinct-token
    ratio) evaluated per document, unpivoted to one row per rule with
    pass/fail counts and pass rate. One linear scan, rule flags are
    native expressions; the unpivot is a constant 5-way stack."""
    d = load(spark, sf_dir, "documents")
    t = T.tokens(F.col("text"))
    n_words = F.size(t)
    n_alnum = F.length(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
    )
    # try_divide: zero-token documents get NULL ratios -> rule fails
    mean_wl = F.try_divide(n_alnum.cast("double"), n_words)
    distinct_ratio = F.try_divide(
        F.size(F.array_distinct(t)).cast("double"), n_words
    )
    flags = d.select(
        F.when(F.col("n_chars") >= 100, 1).otherwise(0).alias("min_chars"),
        F.when(F.col("n_chars") <= 400, 1).otherwise(0).alias("max_chars"),
        F.when(n_words >= 30, 1).otherwise(0).alias("min_words"),
        F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1)
        .otherwise(0)
        .alias("mean_word_len"),
        F.when(distinct_ratio >= 0.3, 1).otherwise(0).alias("distinct_ratio"),
    )
    rules = ["min_chars", "max_chars", "min_words", "mean_word_len",
             "distinct_ratio"]
    stacked = flags.select(
        F.expr(
            "stack({}, {}) AS (rule, passed)".format(
                len(rules), ", ".join(f"'{r}', {r}" for r in rules)
            )
        )
    )
    return (
        stacked.groupBy("rule")
        .agg(
            F.sum("passed").alias("n_pass"),
            F.sum(1 - F.col("passed")).alias("n_fail"),
            (F.sum("passed").cast("double") / F.count(F.lit(1))).alias(
                "pass_rate"
            ),
        )
        .orderBy("rule")
    )


@query("emb_pq_codes")
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment: the 64-dim embedding splits
    into 4 subspaces of 16 dims; each subvector is assigned its nearest
    of 4 codebook entries by squared L2 (ties to the smaller centroid
    id). The codebook is the first 4 vectors by id — a deterministic
    stand-in for a trained codebook (k-means lives in sim_kmeans_assign);
    at scale the codebook is always a broadcast, which is exactly the
    plan here (4 rows x full scan, struct-min collapse, no driver
    collect). Distances use the pinned left-fold so both engines produce
    bit-identical doubles."""
    return S.pq_codes(load(spark, sf_dir, "embeddings")).orderBy("vec_id")


@query("docs_shingle_novelty")
def docs_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty against everything earlier in the corpus:
    the fraction of a doc's distinct shingles whose first owner (min
    doc_id over the corpus) is the doc itself — the dedup-aware mixing
    signal ("how much does this doc add?"). One shingle-keyed
    first-owner aggregate joined back to the doc's shingles; work is
    O(total shingles), never pairwise."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingles(docs).cache()
    first_owner = sh.groupBy("shingle").agg(F.min("doc_id").alias("_first"))
    return (
        sh.join(first_owner, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_shingles"),
        )
    )


@query("sim_pq_adc_topk")
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors for the first 10 vectors by PQ
    asymmetric distance (functions/similarity.pq_adc_topk): per-query
    lookup tables against the broadcast codebook, candidate score = sum
    of table entries selected by stored codes. The billion-vector scale
    path — the candidate scan reads 4 small ints per vector, never the
    embedding."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.pq_adc_topk(emb, qv, k=5)


@query("events_scd2_intervals")
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from the event stream:
    collapse each user's consecutive same-type runs (gaps-and-islands:
    global row_number minus per-type row_number) into validity intervals
    [valid_from, valid_to), valid_to = next run's start (NULL = current).
    The warehouse CDC shape; two windows over one user-keyed shuffle,
    tie-broken on event_id so ordering is total."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    islands = ev.withColumn(
        "_isl", F.row_number().over(w_all) - F.row_number().over(w_typ)
    )
    runs = islands.groupBy("user_id", "event_type", "_isl").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_runs = Window.partitionBy("user_id").orderBy("valid_from")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        "n_events",
    )


@query("text_bigram_logprob")
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram surprisal per document under the corpus's own bigram
    model (functions/text.bigram_surprisal) — the next rung of the
    LM-quality-filter ladder above text_unigram_logprob."""
    return T.bigram_surprisal(load(spark, sf_dir, "documents"))


@query("docs_dedup_survivorship")
def docs_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation keep-list with reason codes: each document is either
    its near-dup cluster's representative (min doc_id, status 'kept') or
    dropped in favor of it ('dropped_near_dup'); documents in no cluster
    are 'kept' singletons. Composes MinHash-LSH pairs -> connected
    components -> survivorship verdict — the drop-list a 100 TB dedup
    pass actually ships."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    clusters = D.connected_components(
        D.minhash_lsh_pairs(load(spark, sf_dir, "documents"), scores=False),
        dedupe_edges=False,
    )
    joined = docs.join(clusters, "doc_id", "left")
    return joined.select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        F.when(
            F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")),
            "kept",
        )
        .otherwise("dropped_near_dup")
        .alias("status"),
    )


@query("orders_rfm_segments")
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (last order date), frequency
    (order count), monetary (exact-decimal total spend) per customer,
    each quartiled with ntile(4) (ties broken on custkey so the split is
    total), composed into an 'R#F#M#' segment label. Three quartile
    assignments over ONE customer-level aggregate — each computed with
    ranking.global_ntile's two-pass range-partitioned rank (identical to
    the ntile(4) window split, but no single-partition sort: at 100 TB
    the customer aggregate is billions of rows, and an unpartitioned
    Window.orderBy would plan one sort task over all of them)."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).cast("double").alias("monetary"),
    )
    g = RK.global_ntile(
        per_cust, ["last_order", "o_custkey"], 4, "r_quartile"
    )
    g = RK.global_ntile(g, ["frequency", "o_custkey"], 4, "f_quartile")
    g = RK.global_ntile(g, ["monetary", "o_custkey"], 4, "m_quartile")
    return (
        g.select(
            F.col("o_custkey").alias("c_custkey"),
            "last_order",
            "frequency",
            "monetary",
            "r_quartile",
            "f_quartile",
            "m_quartile",
            F.concat(
                F.lit("R"), F.col("r_quartile"),
                F.lit("F"), F.col("f_quartile"),
                F.lit("M"), F.col("m_quartile"),
            ).alias("segment"),
        )
    )


@query("events_hourly_seasonality")
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-shape profile: event count and exact-decimal mean value
    per (day-of-week, hour-of-day) cell — the seasonality matrix behind
    load forecasting. One scan, one 168-cell aggregate."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(dec("value")) / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_value"),
        )
        .orderBy("dow", "hour")
    )


@query("events_resample_ffill")
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill: each user's event stream
    is regularized onto their own hourly grid (sequence explode between
    first and last hour — map-side fan-out, no driver loop); empty hours
    carry the last observed hourly mean forward (last-ignoring-nulls
    frame window). The gap-filling primitive behind downsampled feature
    tables; per-user windows keep the sort partitioned."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    per_hour = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        (F.sum(dec("value")) / F.count(F.lit(1)))
        .cast("double")
        .alias("_avg"),
    )
    span = per_hour.groupBy("user_id").agg(
        F.min("hour_ts").alias("_mn"), F.max("hour_ts").alias("_mx")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("_mn", "_mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts"),
    )
    joined = grid.join(per_hour, ["user_id", "hour_ts"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_ts",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_events"),
        F.last("_avg", ignorenulls=True).over(w).alias("value_ffill"),
    )


@query("docs_importance_resample")
def docs_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply uniform-mixture resampling to the corpus
    (functions/sampling.importance_resample): the over-represented
    language (en is ~2x its fair share in the testdata) thins
    deterministically (md5 decision per doc_id) toward total/n_langs,
    under-represented languages pass through whole — the execution step
    of the docs_mix_weights plan."""
    from .functions.sampling import importance_resample

    return importance_resample(
        load(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars"
        ),
        group_col="lang",
        key_col="doc_id",
    ).select("doc_id", "source", "lang", "n_chars", "keep_rate")


@query("part_price_equidepth")
def part_price_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) price histogram: ntile(10) over
    (price, partkey) — each bucket holds the same row count, bucket
    boundaries adapt to the distribution (the complement of
    part_price_histogram's fixed-width buckets). Buckets via
    ranking.global_ntile's range-partitioned rank (same split as an
    ntile(10) window, no single-partition sort — the part dimension is
    billions of rows at 100 TB), then a 10-row aggregate."""
    # project BEFORE the range pass: the persisted range frame caches
    # its input as-is (cache blocks column pruning below it), so the
    # cached projection must already be the 2 needed columns
    p = load(spark, sf_dir, "part").select("p_retailprice", "p_partkey")
    return (
        RK.global_ntile(p, ["p_retailprice", "p_partkey"], 10, "bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("price_min"),
            F.max("p_retailprice").alias("price_max"),
            (F.sum(dec("p_retailprice")) / F.count(F.lit(1)))
            .cast("double")
            .alias("price_avg"),
        )
        .orderBy("bucket")
    )


@query("events_mad_outliers")
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report per event type: median, median absolute
    deviation (both exact interpolated percentiles — verified
    bit-identical across engines), and the count of events beyond
    3 MAD. Two passes over one shuffle key: medians first (tiny
    broadcast), then deviations against the broadcast medians —
    the robust complement of events_winsorize's p05/p95 clipping."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "median_value",
        F.abs(F.col("value") - F.col("median_value")).alias("_dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.first("median_value").alias("median_value"),
        F.expr("percentile(_dev, 0.5)").alias("mad"),
    )
    return (
        dev.drop("median_value")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("median_value").alias("median_value"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("_dev") > F.lit(3.0) * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@query("events_cohort_retention")
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-seen
    week; for each (cohort, weeks-since) cell, how many distinct cohort
    members were active. Two aggregates over one user-keyed shuffle
    (first-seen is a broadcast back onto the stream) — the standard
    product-analytics matrix."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


@query("events_markov_transitions")
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix: count and MLE probability
    of each (from_type -> to_type) step over time-ordered streams (lead
    window, tie-broken on event_id) — the sequence-feature builder for
    behavioral models. One user-keyed window, one 25-cell aggregate."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.withColumn(
        "to_type", F.lead("event_type").over(w)
    ).filter(F.col("to_type").isNotNull())
    counts = steps.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("_tot").cast("double")).alias(
                "prob"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query("orders_abc_pareto")
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of customers by revenue: cumulative
    share of exact-decimal spend, ordered by spend desc with custkey
    tie-break; class A = first 80% of revenue, B = next 15%, C = tail.
    The prefix sum runs through ranking.global_running_sum's two-pass
    range-partitioned plan (no single-partition sort of the customer
    aggregate); the share division is the single double op, identical
    in both engines."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("_rev")
    )
    total = per_cust.agg(F.sum("_rev").alias("_tot"))
    running = RK.global_running_sum(
        per_cust,
        [F.desc("_rev"), F.asc("o_custkey")],
        "_rev",
        "_cum",
    )
    return (
        running.join(F.broadcast(total))
        .withColumn(
            "cum_share",
            F.col("_cum").cast("double") / F.col("_tot").cast("double"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("_rev").cast("double").alias("revenue"),
            "cum_share",
            F.when(F.col("cum_share") <= 0.80, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
    )


@query("dedup_cluster_stats")
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the near-dup graph: how many dedup
    clusters have 2, 3, ... members (singletons excluded — docs with no
    near-dup edge never enter CC). The curation report that says how
    much the corpus shrinks under dedup; two tiny aggregates over the CC
    output."""
    clusters = D.connected_components(
        D.minhash_lsh_pairs(load(spark, sf_dir, "documents"), scores=False),
        dedupe_edges=False,
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


@query("events_funnel_step_latency")
def events_funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency distribution between funnel steps: for users completing
    view -> click -> purchase (events_funnel's chained conditional
    mins), the min/median/max seconds spent on each hop. Exact
    interpolated percentiles (bit-identical across engines); one row per
    hop."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    hops = (
        s2.join(s3, "user_id")
        .select(
            "user_id",
            (F.col("t2").cast("double") - F.col("t1").cast("double")).alias(
                "view_to_click_s"
            ),
            (F.col("t3").cast("double") - F.col("t2").cast("double")).alias(
                "click_to_purchase_s"
            ),
        )
    )
    melted = hops.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view_to_click").alias("hop"),
                    F.col("view_to_click_s").alias("seconds"),
                ),
                F.struct(
                    F.lit("click_to_purchase").alias("hop"),
                    F.col("click_to_purchase_s").alias("seconds"),
                ),
            )
        ).alias("h")
    ).select("h.hop", "h.seconds")
    return (
        melted.groupBy("hop")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("seconds").alias("min_s"),
            F.expr("percentile(seconds, 0.5)").alias("median_s"),
            F.max("seconds").alias("max_s"),
        )
        .orderBy("hop")
    )


@query("emb_random_projection")
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection 64 -> 8 dims
    (functions/similarity.random_projection): the distance-preserving
    shrink applied before ANN indexing/clustering at corpus scale. Sign
    matrix derived from md5 parity so both engines rebuild it
    independently; long-form output (vec_id, dim, value)."""
    return S.random_projection(load(spark, sf_dir, "embeddings"))


@query("docs_incremental_dedup")
def docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup (functions/dedup.incremental_dedup):
    docs with doc_id % 5 == 0 arrive as today's batch, the rest are the
    already-ingested base; each batch doc gets its verdict (owner of its
    fingerprint in the base, admitted or not). The daily-crawl-increment
    shape: base participates only through its fingerprint state table."""
    docs = load(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return D.incremental_dedup(base, batch)


@query("events_nearest_join")
def events_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event temporal join (operators/joins.nearest_join): every
    click is paired with the user's nearest purchase within ±5 minutes
    (bidirectional — the merge_asof(direction='nearest') complement of
    events_asof_join's backward-only search). Bucketed at
    grain = tolerance so the inequality never reaches the join; argmin
    is a struct-min aggregate, not a window sort."""
    from .operators.joins import nearest_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("amount")
    )
    return nearest_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts_col="ts",
        right_cols=["event_id", "amount"],
        tolerance_us=300_000_000,
        tiebreak_col="event_id",
    ).select(
        "click_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("ts_near").alias("purchase_ts"),
        F.col("dt_us_near").alias("dt_us"),
        F.col("event_id_near").alias("purchase_id"),
        F.col("amount_near").alias("amount"),
    )


@query("streaming_sliding_parity")
def streaming_sliding_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window aggregation, driver-verified end to end
    (streaming/events.run_sliding_stream): replay the events table
    through a parquet file-drop topic, drain a watermarked 1h/15min
    sliding count+sum per event_type under availableNow into a parquet
    sink, and return the sink contents. Zero watermark delay + payload
    event time => append mode emits exactly the windows whose end <= max
    event time, which is what the batch oracle computes."""
    import os

    from .streaming.events import run_sliding_stream

    base = scratch_dir("dfx_slide_parity_")
    topic = os.path.join(base, "topic")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    ev = load(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(topic)

    q = run_sliding_stream(
        spark, topic, output_dir=out, checkpoint_dir=ckpt, schema=ev.schema
    )
    drain(q, 600)
    return spark.read.parquet(out)


@query("streaming_join_parity")
def streaming_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join, driver-verified end to end
    (streaming/events.run_click_purchase_join_stream): purchases pair
    with the same user's clicks in the preceding 30 minutes, as a
    bucketed stream-stream join (state O(rate x interval) per side)
    drained under availableNow. Inner matches emit without waiting on
    the watermark, so the sink equals the batch inequality join the
    oracle runs."""
    import os

    from .streaming.events import run_click_purchase_join_stream

    base = scratch_dir("dfx_join_parity_")
    topic = os.path.join(base, "topic")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    ev = load(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(topic)

    q = run_click_purchase_join_stream(
        spark, topic, output_dir=out, checkpoint_dir=ckpt, schema=ev.schema
    )
    drain(q, 600)
    return spark.read.parquet(out)


@query("events_ewma")
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted recent value per user (half-life = one
    event): over each user's 20 most recent events, weight 2^(20-rank)
    and divide weighted sum by weight sum. Weights are integral powers
    of two and values go through DECIMAL, so both aggregates are exact
    and the single final double division is IEEE-identical across
    engines. One window rank per user (state bounded by the per-user
    tail, not history) + one aggregate."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    tail = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
    )
    wgt = F.pow(F.lit(2.0), 20 - F.col("rn")).cast("decimal(18,0)")
    return tail.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_used"),
        (
            F.sum(dec("value") * wgt).cast("double")
            / F.sum(wgt).cast("double")
        ).alias("ewma_value"),
    )


@query("text_substring_dup")
def text_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copied-passage candidates (functions/dedup.substring_dup_pairs):
    document pairs sharing >= 1 aligned 30-char stride-10 shingle — the
    fixed-cost hash-join relaxation of suffix-array substring dedup."""
    return D.substring_dup_pairs(load(spark, sf_dir, "documents"))


@query("docs_cluster_balanced_sample")
def docs_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced subset: spherical k-means assignment
    (functions/similarity.kmeans_assign, the sim_kmeans_assign contract)
    followed by a deterministic md5-ranked quota of 5 vectors per
    cluster — semantic-diversity sampling, the embedding-space
    complement of docs_cap_per_source's per-domain quota. Clusters are
    a HOT partition key (16 clusters over the whole corpus), so the
    quota runs through ranking.grouped_top_k's salted two-level
    row_number instead of one sort task per cluster."""
    assign = S.kmeans_assign(load(spark, sf_dir, "embeddings"))
    return RK.grouped_top_k(
        assign.select("cluster", "vec_id"),
        ["cluster"],
        [
            F.md5(F.concat_ws(":", F.lit("cbs"), F.col("vec_id"))),
            F.col("vec_id"),
        ],
        5,
        salt_expr=F.xxhash64("vec_id"),
        rank_col="samp_rank",
    ).select("cluster", "vec_id", "samp_rank")


@query("events_point_in_time_join")
def events_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) fact-to-dimension join: SCD-2 state history is
    derived from the non-purchase event stream (same gaps-and-islands
    shape as events_scd2_intervals), then each purchase is joined to the
    state run in effect at its timestamp via the as-of machinery
    (operators/joins.asof_join — one exchange, no inequality nested
    loop). The ML-feature-store correctness primitive: features must be
    read as of the fact's event time, never the current version."""
    from pyspark.sql.window import Window

    from .operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    runs = (
        base.withColumn(
            "_isl", F.row_number().over(w_all) - F.row_number().over(w_typ)
        )
        .groupBy("user_id", "event_type", "_isl")
        .agg(F.min("ts").alias("ts"), F.count(F.lit(1)).alias("run_events"))
        .select(
            "user_id",
            F.col("event_type").alias("state_type"),
            "ts",
            "run_events",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.col("value").alias("amount"),
    )
    return asof_join(
        purchases,
        runs,
        keys=["user_id"],
        ts_col="ts",
        right_cols=["state_type", "run_events"],
        tiebreak_col="state_type",
    ).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "amount",
        F.col("state_type_asof").alias("state_type"),
        F.col("ts_asof").alias("state_since"),
        F.col("run_events_asof").alias("run_events"),
    )


@query("events_rolling_active_users")
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct active users per hour, decomposed for scale:
    distinct (user, hour) pairs each fan out to the 24 report hours they
    support (map-side explode), then one distinct-count per report hour —
    no 24-hour window state, no per-hour rescans. Report hours are
    clamped to the data's max event hour (1-row broadcast scalar)."""
    ev = load(spark, sf_dir, "events")
    uh = ev.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    mx = ev.agg(F.date_trunc("hour", F.max("ts")).alias("_mx"))
    fan = uh.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("h"),
                F.least(
                    F.col("h") + F.expr("INTERVAL 23 HOURS"), F.col("_mx")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("report_hour"),
    )
    return fan.groupBy("report_hour").agg(
        F.count_distinct("user_id").alias("active_users_24h")
    )


@query("events_psi_drift")
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor per event_type: value
    distributions of the first half of the month (days 1-15) vs the
    rest, over 10 fixed-width buckets (floor(value/50) clamped), with
    add-one smoothing so empty buckets stay finite.
    PSI = Σ (p_a - p_b)·ln(p_a/p_b) — the standard feature-drift gate a
    training pipeline runs before ingesting a new dump. Two scans'
    worth of partial counts in one grouped aggregate; bucket
    probabilities are exact decimals, only the final ln/multiply is
    float."""
    ev = load(spark, sf_dir, "events")
    # non-finite values get a NULL bucket (their own report row) rather
    # than an ANSI CAST_OVERFLOW from floor(Inf) -> Long.MAX -> int
    b = F.when(
        is_finite(F.col("value")),
        F.least(
            F.greatest(F.floor(F.col("value") / 50).cast("int"), F.lit(0)),
            F.lit(9),
        ),
    )
    tagged = ev.select(
        "event_type",
        b.alias("bucket"),
        (F.dayofmonth("ts") <= 15).alias("_in_a"),
    )
    counts = tagged.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("_in_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("_in_a"), 1).otherwise(0)).alias("nb"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    # probabilities as exact-integer -> double division (IEEE-identical
    # across engines; decimal division would round at engine-specific
    # quotient scales)
    pa = (F.col("na") + 1).cast("double") / (F.col("ta") + 10).cast("double")
    pb = (F.col("nb") + 1).cast("double") / (F.col("tb") + 10).cast("double")
    return (
        counts.join(tot, "event_type")
        .select(
            "event_type",
            ((pa - pb) * (F.log(pa) - F.log(pb))).alias("_term"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.col("_term").cast(DEC)).cast("double").alias("psi")
        )
    )


@query("emb_norm_outliers")
def emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-hygiene gate: vectors whose L2 norm sits more than 2
    standard deviations from their label's mean norm (broken encoders
    and zero-pads show up here first). The per-VECTOR squared-norm fold
    stays a sorted fold (64 components — constant-bounded); the
    per-LABEL moments use numerics.fixed_point_sum, because a label's
    group holds its whole slice of the corpus and the former sorted
    collect-fold was an OOM at 100 TB — the fixed-point sum keeps O(1)
    aggregation state and is engine-exact."""
    from .functions.numerics import fixed_point_sum

    emb = load(spark, sf_dir, "embeddings")
    sq_fold = F.aggregate(
        F.sort_array(
            F.transform(
                F.col("embedding"),
                lambda x: x.cast("double") * x.cast("double"),
            )
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # keep zero-norm vectors (zero-pads are exactly what this gate must
    # surface) but drop NaN/Inf norms — they poison the decimal moment
    # sums; is_finite(NULL)=NULL also drops NULL-vector rows here
    norms = emb.select(
        "vec_id", "label", F.sqrt(sq_fold).alias("norm")
    ).filter(is_finite(F.col("norm")))
    stats = norms.groupBy("label").agg(
        (fixed_point_sum(F.col("norm")) / F.count(F.lit(1))).alias(
            "mean_norm"
        ),
        (
            fixed_point_sum(F.col("norm") * F.col("norm"))
            / F.count(F.lit(1))
        ).alias("_m2"),
    )
    # try_divide: a label whose norms are all identical (e.g. a single
    # member) has zero variance -> z undefined -> NULL -> not an outlier
    z = F.try_divide(
        F.col("norm") - F.col("mean_norm"),
        F.sqrt(F.col("_m2") - F.col("mean_norm") * F.col("mean_norm")),
    )
    return (
        norms.join(F.broadcast(stats), "label")
        .select("vec_id", "label", "norm", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2)
    )


@query("docs_bloom_decontaminate")
def docs_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned decontamination: train-split documents whose 12-token
    prefix fingerprint collides with the eval (test) split — the same
    audit as docs_split_decontamination from the train side, but the
    corpus scan is pre-pruned by a Bloom filter built from the eval
    fingerprints (functions/bloom.py), so at 100 TB only ~fpr x N rows
    plus true collisions ever reach the join shuffle instead of the
    whole corpus. Candidates are exactly verified by the final join, so
    the bloom affects cost only, never results (the oracle is the plain
    exact join)."""
    from .functions.bloom import bloom_build, bloom_filter_candidates
    from .functions.sampling import train_test_split
    from .functions.text import fingerprint

    docs = load(spark, sf_dir, "documents")
    # fingerprint and split are row-wise maps over one scan — composed
    # as a single projection, not computed separately and joined back
    # on doc_id (that shape shuffled the full corpus twice; r10).
    fp = train_test_split(
        fingerprint(docs, prefix_tokens=12), "doc_id", test_fraction=0.2
    )
    # The eval-split fingerprints are read TWICE — once eagerly by
    # bloom_build (during plan construction) and once by eval_agg at
    # execution. Persisting them lets the construct-time build job
    # double as the cache fill, so execution's eval side is a cache
    # read instead of a second scan+fingerprint pass (VERDICT r9 #1).
    # Scale-safe: two narrow columns of the EVAL split only — a real
    # decontamination eval set is ~1e4-1e6 rows, a model artifact like
    # the bloom's bit array, never corpus-sized.
    from .functions.cachereg import register_persisted

    eval_fp = register_persisted(
        fp.filter(F.col("split") == "test")
        .select("doc_id", "fingerprint_md5")
        .persist()
    )
    words = bloom_build(eval_fp, "fingerprint_md5")
    candidates = bloom_filter_candidates(
        fp.filter(F.col("split") == "train"), "fingerprint_md5", words
    ).filter(F.col("_bloom_hit"))
    eval_agg = eval_fp.groupBy("fingerprint_md5").agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.min("doc_id").alias("first_eval_doc"),
    )
    # No explicit broadcast hint on eval_agg: its size is proportional
    # to the eval split's distinct fingerprints, which is small for a
    # realistic decontamination (eval sets are ~1e4-1e6 rows) but the
    # synthetic 20% split here is corpus-proportional, so at true 100 TB
    # a forced broadcast would exceed limits. AQE picks broadcast when
    # the aggregated relation's runtime stats fit and falls back to a
    # shuffled join on the bloom-pruned candidates when they don't.
    return (
        candidates.select(
            F.col("doc_id").alias("train_doc_id"), "fingerprint_md5"
        )
        .join(eval_agg, "fingerprint_md5")
        .select("train_doc_id", "n_eval_matches", "first_eval_doc")
    )


@query("events_zorder_layout")
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order file-layout audit: interleave (user_id bucket, hour-of-
    month) into a Morton key, assign 64 target files by its high bits,
    and report each file's zone map (min/max of both dimensions). Tight
    per-file ranges are what make parquet row-group skipping work on
    BOTH predicates at 100 TB — writing the layout is the same plan with
    repartitionByRange(zvalue).sortWithinPartitions, so this audit is
    the measurable half of OPTIMIZE ZORDER (functions/layout.py)."""
    from .functions.layout import zorder_value

    ev = load(spark, sf_dir, "events")
    d1 = F.pmod(F.col("user_id"), F.lit(1024))
    d2 = (F.dayofmonth("ts") - 1) * 24 + F.hour("ts")
    z = zorder_value(d1, d2, bits=10)
    return (
        ev.select(
            d1.alias("_d1"), d2.alias("_d2"), z.alias("_z")
        )
        .select(
            "_d1", "_d2", F.shiftright(F.col("_z"), 14).alias("file_id")
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_d1").alias("min_user_bucket"),
            F.max("_d1").alias("max_user_bucket"),
            F.min("_d2").alias("min_hour"),
            F.max("_d2").alias("max_hour"),
        )
    )


@query("orders_join_skew_report")
def orders_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-skew diagnostic on orders.o_custkey: the 10 heaviest keys
    with their share of the table and the salting factor a skewed join
    would need (ceil(key_rows * n_keys / total_rows) — how many times
    above the mean the key sits). At scale this is the query you run
    BEFORE the big join to decide between AQE skew handling and explicit
    salting; one groupBy plus a tiny top-k, no wide shuffle."""
    orders = load(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_keys")
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .orderBy(F.desc("n_rows"), "o_custkey")
        .limit(10)
        .select(
            "o_custkey",
            "n_rows",
            (
                F.col("n_rows").cast("double")
                * 100.0
                / F.col("_total").cast("double")
            ).alias("pct_of_rows"),
            F.floor(
                (
                    F.col("n_rows") * F.col("_keys")
                    + F.col("_total")
                    - 1
                )
                / F.col("_total")
            ).alias("salt_factor"),
        )
    )


@query("docs_ngram_dup_rate")
def docs_ngram_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplication health per source: of all (doc, 3-gram
    shingle) occurrences, what fraction are repeats of a shingle already
    seen in another document of the same source (1 - distinct/total —
    the Gopher-style corpus dup-rate that decides whether a crawl dump
    needs fuzzy dedup before mixing). One explode + one grouped
    aggregate; count_distinct is the only wide state and is bounded by
    the shingle vocabulary, which grows sub-linearly in corpus size."""
    from .functions.dedup import shingles

    docs = load(spark, sf_dir, "documents")
    sh = shingles(docs, k=3).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return sh.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_shingles"),
        F.count_distinct("shingle").alias("distinct_shingles"),
        (
            F.lit(1.0)
            - F.count_distinct("shingle").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )


@query("events_arrival_lateness")
def events_arrival_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: replay events in simulated arrival order
    (arrival = ts + md5-derived 0-29 s network delay, engine-portable)
    and measure each event's lateness against the running max event time
    of everything that arrived before it — exactly the quantity a
    Structured Streaming watermark must exceed to avoid dropping the
    event. Per event_type: arrivals, late arrivals, would-be drops at a
    10 s watermark, and the max observed lateness. The sequential
    running max uses the range-partitioned two-pass prefix scan
    (functions/diagnostics.py), so global arrival order costs one range
    exchange, not one task."""
    from .functions.diagnostics import running_prefix_max
    from .functions.sampling import hash_bucket

    ev = load(spark, sf_dir, "events")
    delay = hash_bucket(F.col("event_id"), "lat") % 30
    arr = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.timestamp_add("SECOND", delay.cast("int"), F.col("ts")).alias(
            "arrival_ts"
        ),
    )
    traced = running_prefix_max(
        arr, ["arrival_ts", "event_id"], "ts", out_col="wm"
    )
    late_us = F.greatest(
        F.lit(0).cast("bigint"),
        F.unix_micros(F.col("wm")) - F.unix_micros(F.col("ts")),
    )
    return (
        traced.select(
            "event_type", late_us.alias("_late_us")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("_late_us") > 0).cast("bigint")).alias("n_late"),
            F.sum(
                (F.col("_late_us") > 10_000_000).cast("bigint")
            ).alias("n_dropped_10s"),
            F.max("_late_us").alias("max_late_us"),
        )
    )


@query("streaming_session_parity")
def streaming_session_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows, driver-verified end to end
    (streaming/events.run_session_stream): replay events through a
    parquet file-drop topic, drain a watermarked session_window
    (30 min gap) per-user count+sum under availableNow into a parquet
    sink, and return the sink. Zero watermark delay => append emits
    exactly the sessions whose end (last event + gap) <= max event
    time; the oracle computes the same subset with the batch lag-gap
    islands rule, proving session_window's merge semantics equal the
    batch sessionize."""
    import os

    from .streaming.events import run_session_stream

    base = scratch_dir("dfx_sess_parity_")
    topic = os.path.join(base, "topic")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    ev = load(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(topic)

    q = run_session_stream(
        spark, topic, output_dir=out, checkpoint_dir=ckpt, schema=ev.schema
    )
    drain(q, 600)
    return spark.read.parquet(out)


@query("events_salted_distinct_users")
def events_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type via salted two-phase
    aggregation (functions/diagnostics.salted_distinct_count): the
    distinct set of a hot key is split across 16 disjoint salt buckets
    (hash of the DISTINCT column), so no single reducer ever holds a
    whole group's state — the standard fix once one event_type
    dominates a 100 TB log. Exactly equal to the plain COUNT(DISTINCT)
    the oracle runs."""
    from .functions.diagnostics import salted_distinct_count

    ev = load(spark, sf_dir, "events")
    return salted_distinct_count(ev, "event_type", "user_id")


@query("docs_tfidf_top_terms")
def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (score = tf * ln(N/df), ties by
    term): the classic salience ranking a curation pipeline uses for
    topic tagging. Term frequencies and document frequencies are exact
    integers; N/df is an exact-int double division so ln() sees
    identical inputs in both engines. Two grouped aggregates plus the
    (term, df) vocabulary join — unhinted (r11): vocabulary grows with
    the corpus (Heaps' law), so AQE decides broadcast-vs-shuffle from
    the df aggregate's runtime size instead of a forced hint."""
    docs = load(spark, sf_dir, "documents")
    from .functions.text import tokens
    from pyspark.sql.window import Window

    # corpus size as a broadcast 1-row aggregate (no driver action)
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    tf = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf").cast("double") * F.log(
        F.col("_n").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", "tf", score.alias("score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "score", "rnk")
    )


@query("orders_top_percentile")
def orders_top_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in the top 1% by price within their priority class:
    percent_rank + cume_dist analytics (exact rationals — (rank-1)/
    (n-1) and peers/n of integer counts, so doubles are bit-identical
    across engines).

    The 5 priority classes are HOT partition keys — a per-priority
    window is one sort task over 1/5 of all orders. Both analytics are
    pure functions of tie-group counts, so they come from a per-
    (priority, price) aggregate instead: cnt_le = grouped prefix sum of
    tie-group sizes (ranking.grouped_running_sum, packing-style range
    partitioning), rank = cnt_le - tie_size + 1, percent_rank =
    (rank-1)/(n-1), cume_dist = cnt_le/n — the same integer rationals
    the window functions produce, joined back to orders on the
    (priority, price) key with a plain hash join."""
    orders = load(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority", "o_totalprice").agg(
        F.count(F.lit(1)).alias("_c")
    )
    g2 = RK.grouped_running_sum(
        g, ["o_orderpriority"], [F.asc("o_totalprice")], "_c", "_cnt_le"
    )
    n_per = g.groupBy("o_orderpriority").agg(F.sum("_c").alias("_n"))
    stats = (
        g2.join(F.broadcast(n_per), "o_orderpriority")
        .select(
            "o_orderpriority",
            "o_totalprice",
            F.when(
                F.col("_n") > 1,
                (F.col("_cnt_le") - F.col("_c")).cast("double")
                / (F.col("_n") - 1).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            (
                F.col("_cnt_le").cast("double") / F.col("_n").cast("double")
            ).alias("cume"),
        )
        .filter(F.col("pct_rank") >= 0.99)
    )
    return orders.join(
        stats, ["o_orderpriority", "o_totalprice"]
    ).select(
        "o_orderpriority", "o_orderkey", "o_totalprice", "pct_rank", "cume"
    )


@query("events_dq_checks")
def events_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality constraint report in ONE pass: every
    constraint is a conditional aggregate over the same scan, so adding
    checks costs columns, not jobs — the pattern that keeps a 100 TB
    validation suite at one table read. Emits (constraint, observed,
    violations, passed) per rule: completeness, uniqueness, domain
    membership, range, and timestamp sanity."""
    ev = load(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("user_id").isNull().cast("bigint")).alias("_null_user"),
        F.sum(F.col("value").isNull().cast("bigint")).alias("_null_value"),
        (
            F.count(F.lit(1)) - F.count_distinct("event_id")
        ).alias("_dup_event_id"),
        F.sum(
            (
                ~F.col("event_type").isin(
                    "click", "view", "purchase", "signup", "error"
                )
            ).cast("bigint")
        ).alias("_bad_type"),
        F.sum((F.col("value") < 0).cast("bigint")).alias("_neg_value"),
        F.sum((F.col("value") > 100).cast("bigint")).alias("_gt_100"),
        F.sum(
            (F.year("ts") != 2024).cast("bigint")
        ).alias("_ts_out_of_range"),
    )
    checks = [
        ("user_id_not_null", "_null_user"),
        ("value_not_null", "_null_value"),
        ("event_id_unique", "_dup_event_id"),
        ("event_type_in_domain", "_bad_type"),
        ("value_non_negative", "_neg_value"),
        ("value_le_100", "_gt_100"),
        ("ts_in_2024", "_ts_out_of_range"),
    ]
    rules = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.col("_n").alias("observed"),
                F.col(c).alias("violations"),
                (F.col(c) == 0).alias("passed"),
            )
            for name, c in checks
        ]
    )
    return agg.select(F.explode(rules).alias("r")).select(
        "r.constraint", "r.observed", "r.violations", "r.passed"
    )


@query("events_snapshot_diff")
def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (the batch half of CDC): per-user activity profile
    of the first half of the month vs the second, full-outer joined on
    the key and classified added / removed / changed / unchanged. At
    scale this is one co-partitioned shuffle on the key — the standard
    audit before publishing a refreshed derived table."""
    ev = load(spark, sf_dir, "events")

    def snap(pred):
        return (
            ev.filter(pred)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(dec("value")).cast("double").alias("sum_value"),
            )
        )

    a = snap(F.dayofmonth("ts") <= 15).alias("a")
    b = snap(F.dayofmonth("ts") > 15).alias("b")
    joined = a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full_outer")
    status = (
        F.when(F.col("a.user_id").isNull(), F.lit("added"))
        .when(F.col("b.user_id").isNull(), F.lit("removed"))
        .when(
            (F.col("a.n_events") != F.col("b.n_events"))
            | (F.col("a.sum_value") != F.col("b.sum_value")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        status.alias("status"),
        F.col("a.n_events").alias("n_events_before"),
        F.col("b.n_events").alias("n_events_after"),
    ).filter(F.col("status") != "unchanged")


@query("events_feature_hash")
def events_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick categorical features: (event_type x hour-of-day)
    tokens hash into 64 buckets with md5-derived index and ±1 sign
    (collision debiasing), summed per user — the fixed-width featurizer
    that needs no vocabulary pass, so it runs in one shuffle at any
    cardinality. Output is the exploded sparse vector (user, bucket,
    weight); weights are exact integers."""
    from .functions.sampling import hash_bucket

    ev = load(spark, sf_dir, "events")
    token = F.concat(
        F.col("event_type"), F.lit(":"), F.hour("ts").cast("string")
    )
    idx = hash_bucket(token, "fh", 64)
    sign = (
        F.when(hash_bucket(token, "fhs", 2) == 0, F.lit(1)).otherwise(
            F.lit(-1)
        )
    ).cast("bigint")
    return (
        ev.select("user_id", idx.alias("bucket"), sign.alias("_s"))
        .groupBy("user_id", "bucket")
        .agg(F.sum("_s").alias("weight"))
        .filter(F.col("weight") != 0)
    )


@query("events_daily_value_quantiles")
def events_daily_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated p50/p90 of value per day — the ground-truth
    twin of the approx_percentile sketches: both engines sort the day's
    values and linearly interpolate at the same rank fractions, so the
    doubles agree bit-for-bit. Per-day groups bound the sort; at 100 TB
    each day partition sorts independently (and the sketch variant is
    the first resort when even that is too wide)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.dayofmonth("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
        )
    )


@query("text_readability")
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability proxy per document: sentences by
    [.!?]+ runs, words by the shared token contract, syllables by
    vowel-group runs — all regexp_count-able in both engines, so the
    score (206.835 - 1.015*words/sentence - 84.6*syllables/word) is
    exact-int ratios in IEEE doubles. Pure map-side projection."""
    from .functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    words = F.size(tokens(F.col("text")))
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    )
    syllables = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")),
        F.lit(1),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double"))
    )
    return docs.filter(words > 0).select(
        "doc_id",
        words.alias("n_words"),
        sentences.cast("bigint").alias("n_sentences"),
        syllables.cast("bigint").alias("n_syllables"),
        score.alias("flesch_score"),
    )


@query("events_chi2_independence")
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency for event_type x day-of-week: per-cell
    observed vs expected (row_total * col_total / N) and the cell's
    chi2 contribution — the independence screen a feature pipeline runs
    before trusting a categorical crossing. Marginals are two tiny
    broadcast aggregates over the one observed-counts shuffle; all
    counts exact, expected/contrib are exact-int double divisions."""
    ev = load(spark, sf_dir, "events")
    obs = (
        ev.select("event_type", F.dayofweek("ts").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    row_t = obs.groupBy("event_type").agg(F.sum("observed").alias("_rt"))
    col_t = obs.groupBy("dow").agg(F.sum("observed").alias("_ct"))
    tot = obs.agg(F.sum("observed").alias("_n"))
    e = (
        F.col("_rt").cast("double")
        * F.col("_ct").cast("double")
        / F.col("_n").cast("double")
    )
    o = F.col("observed").cast("double")
    return (
        obs.join(F.broadcast(row_t), "event_type")
        .join(F.broadcast(col_t), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            "observed",
            e.alias("expected"),
            ((o - e) * (o - e) / e).alias("chi2_contrib"),
        )
    )


@query("events_latest_per_user")
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record compaction (the batch form of CDC upsert
    materialization): one row per user carrying their most recent event
    (order by ts, then event_id for full determinism), via a single
    struct-max aggregate — a map-side-combinable argmax, not a window
    sort, so hot users cost one combiner cell instead of a per-key
    sort at 100 TB."""
    ev = load(spark, sf_dir, "events")
    m = F.max(
        F.struct("ts", "event_id", "event_type", "value")
    ).alias("_m")
    return (
        ev.groupBy("user_id")
        .agg(m)
        .select(
            "user_id",
            F.col("_m.ts").alias("last_ts"),
            F.col("_m.event_id").alias("last_event_id"),
            F.col("_m.event_type").alias("last_event_type"),
            F.col("_m.value").alias("last_value"),
        )
    )


@query("events_gap_duration_stats")
def events_gap_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap profile per event_type: each event's distance
    (microseconds) to the same user's previous event, aggregated by the
    later event's type — count, min, max, and exact mean (integer sum /
    integer count in one IEEE division). The lag window partitions by
    user, so no partition exceeds one user's history."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    gaps = ev.select("event_type", gap.alias("_gap")).filter(
        F.col("_gap").isNotNull()
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("_gap").alias("min_gap_us"),
        F.max("_gap").alias("max_gap_us"),
        (
            F.sum("_gap").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_gap_us"),
    )


@query("orders_running_total")
def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative revenue in order-date order (ties broken
    by order key): the customer-lifetime-value curve. The running sum
    stays in exact DECIMAL until the final cast, and the window
    partitions by customer, so each task sorts one customer's orders —
    bounded state at any corpus size."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias(
            "cum_revenue"
        ),
    )


@query("events_daily_autocorr")
def events_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event count per event_type —
    the seasonality screen for forecasting features. The (day, next
    day) pairs come from one lag window over the tiny per-day count
    series; every sum in Pearson's r is an exact integer, so the single
    final division/sqrt is IEEE-identical across engines."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.dayofmonth("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = (
        daily.withColumn("c_next", F.lead("c").over(w))
        .filter(F.col("c_next").isNotNull())
        .select(
            "event_type",
            F.col("c").alias("x"),
            F.col("c_next").alias("y"),
        )
    )
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "event_type", "n", (num / den).alias("lag1_autocorr")
    )


@query("lineitem_basket_pairs")
def lineitem_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket part co-occurrence with lift: part pairs appearing
    together in >= 2 orders, scored by lift = N * n_ab / (n_a * n_b).
    The self-join is keyed on the order, so fan-out is bounded by order
    size squared (~7^2), never by part popularity — the safe basket
    shape at any scale. The per-part marginals have part-dimension
    cardinality (they scale with SF), so their broadcast is size-gated
    on the part table via ``dim_bcast`` rather than forced (ADVICE r11:
    a forced hint here is the same warehouse-scale OOM class dim_bcast
    exists to remove); over the gate, AQE still converts when
    runtime stats turn out small. Counts exact; lift is one exact-int
    double expression."""
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    marg = items.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_part")
    )
    tot = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        pairs.join(
            dim_bcast(
                marg.withColumnRenamed("part", "part_a")
                .withColumnRenamed("n_part", "n_a"),
                sf_dir,
                "part",
            ),
            "part_a",
        )
        .join(
            dim_bcast(
                marg.withColumnRenamed("part", "part_b")
                .withColumnRenamed("n_part", "n_b"),
                sf_dir,
                "part",
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            (
                F.col("_n").cast("double") * F.col("n_ab").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


@query("suppliers_full_nation_parts")
def suppliers_full_nation_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: suppliers that shipped EVERY distinct part
    any Brand#13 order line ever shipped from their nation — the
    for-all quantifier SQL lacks as a primitive, expressed as
    count-distinct-equality against a broadcast per-nation requirement.
    Division by counting is the scale-safe form: no nested NOT EXISTS
    double anti-join over the fact table."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    brand = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    shipped = (
        li.join(dim_bcast(brand, sf_dir, "part"), li.l_partkey == brand.p_partkey)
        .join(
            dim_bcast(supp.select("s_suppkey", "s_nationkey"), sf_dir, "supplier"),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_nationkey", "s_suppkey", "l_partkey")
        .distinct()
    )
    req = shipped.groupBy("s_nationkey").agg(
        F.count_distinct("l_partkey").alias("_req")
    )
    got = shipped.groupBy("s_nationkey", "s_suppkey").agg(
        F.count_distinct("l_partkey").alias("n_parts")
    )
    return (
        got.join(F.broadcast(req), "s_nationkey")
        .filter(F.col("n_parts") == F.col("_req"))
        .select("s_nationkey", "s_suppkey", "n_parts")
    )


@query("events_user_streaks")
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps-and-islands:
    day - dense_rank is constant within a run of consecutive days).
    Users with streaks >= 5 days. Distinct days first, so the window
    input is <= 31 rows per user regardless of event volume."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.dayofmonth("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = days.withColumn(
        "_grp", F.col("day") - F.row_number().over(w)
    )
    streaks = runs.groupBy("user_id", "_grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
    )
    best = streaks.groupBy("user_id").agg(
        F.max(F.struct("len", F.col("start_day"))).alias("_b")
    )
    return (
        best.select(
            "user_id",
            F.col("_b.len").alias("longest_streak"),
            F.col("_b.start_day").alias("streak_start_day"),
        )
        .filter(F.col("longest_streak") >= 5)
    )


@query("orders_revenue_yoy_growth")
def orders_revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per order priority: exact DECIMAL
    yearly totals, lag window over the tiny (priority, year) series,
    growth as one double division of exact decimals. The wide data
    collapses in the first aggregate; everything after runs on
    priority x year rows."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    yearly = (
        orders.groupBy(
            "o_orderpriority", F.year("o_orderdate").alias("year")
        )
        .agg(F.sum(dec("o_totalprice")).alias("_rev"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("year")
    prev = F.lag("_rev").over(w)
    return yearly.select(
        "o_orderpriority",
        "year",
        F.col("_rev").cast("double").alias("revenue"),
        (
            (F.col("_rev") - prev).cast("double") / prev.cast("double")
        ).alias("yoy_growth"),
    )


@query("orders_customer_gini")
def orders_customer_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers — the
    inequality gauge for skew dashboards. Per-customer totals first
    (the only wide aggregate), then the global rank comes from
    ranking.global_row_number's two-pass range partitioning (no
    single-partition sort of the customer series);
    G = (2*sum(i*x_i))/(n*sum(x)) - (n+1)/n with exact DECIMAL sums,
    one final double expression."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("_rev")
    )
    ranked = RK.global_row_number(
        per_cust, ["_rev", "o_custkey"], out_col="_i"
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_rev").alias("sx"),
        F.sum(F.col("_i") * F.col("_rev")).alias("six"),
    )
    n = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("sx").cast("double").alias("total_revenue"),
        (
            F.lit(2.0) * F.col("six").cast("double")
            / (n * F.col("sx").cast("double"))
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
    )


@query("streaming_enrich_parity")
def streaming_enrich_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment, driver-verified end to end
    (streaming/events.run_enrich_stream): the events stream broadcast-
    joins a static per-user tier dimension (derived deterministically
    from user_id) and drains to parquet under availableNow. Stream-
    static joins are stateless — every micro-batch just broadcast-probes
    the dimension — so the sink equals the batch join the oracle runs.
    Output is the per-(type, tier) count/sum rollup of the enriched
    stream (compact and order-insensitive)."""
    import os

    from .streaming.events import enrich_rollup, run_enrich_stream, user_tier_dim

    base = scratch_dir("dfx_enrich_parity_")
    topic = os.path.join(base, "topic")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    ev = load(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(topic)
    q = run_enrich_stream(
        spark, topic, user_tier_dim(ev), output_dir=out, checkpoint_dir=ckpt,
        schema=ev.schema,
    )
    drain(q, 600)
    return enrich_rollup(spark.read.parquet(out))


@query("events_attribution_first_touch")
def events_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credits the user's
    EARLIEST click in the preceding 24 h (vs the last-touch join of the
    streaming parity). Min-struct argmin over the bucketed candidate
    join, so hot users never sort — the same bounded-state shape as
    events_nearest_join. Purchases with no qualifying click are
    excluded (inner attribution)."""
    ev = load(spark, sf_dir, "events")
    window_s = 86400
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    g = F.lit(window_s).cast("long")
    p = purchases.withColumn(
        "_b", F.floor(F.unix_timestamp("purchase_ts") / g).cast("long")
    )
    c = clicks.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("click_ts") / g).cast("long"),
                F.floor(
                    (F.unix_timestamp("click_ts") + window_s) / g
                ).cast("long"),
            )
        ),
    )
    cand = p.join(
        c,
        (p["_b"] == c["_b"])
        & (p["user_id"] == c["c_user"])
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            > F.col("purchase_ts") - F.expr(f"INTERVAL {window_s} SECONDS")
        ),
    )
    first = cand.groupBy("purchase_id").agg(
        F.min(F.struct("click_ts", "click_id")).alias("_f"),
        # constant within the group (one purchase row fans out); min is
        # the deterministic way to say "the" value
        F.min("user_id").alias("user_id"),
        F.min("purchase_ts").alias("purchase_ts"),
    )
    return first.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("_f.click_ts").alias("first_click_ts"),
        F.col("_f.click_id").alias("first_click_id"),
    )


@query("docs_cross_source_dup_matrix")
def docs_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source x source contamination matrix: how many distinct
    normalized fingerprints each ordered source pair shares — the
    corpus-health view that tells you which crawls copied from which
    before you pick mixture weights. Per-(fingerprint, source) distinct
    first (the only wide shuffle), then the self-join runs on the
    fingerprint level with fan-out bounded by sources-per-fingerprint,
    never corpus size."""
    from .functions.text import fingerprint

    docs = load(spark, sf_dir, "documents")
    # ``source`` rides the fingerprint projection (row-wise map), not a
    # join-back on doc_id (r10) — the distinct is the only wide shuffle.
    fp = (
        fingerprint(docs, prefix_tokens=12, extra_cols=("source",))
        .select("fingerprint_md5", "source")
        .distinct()
    )
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint_md5") == F.col("b.fingerprint_md5"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
    )


@query("events_burst_detection")
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detector: minutes whose event count exceeds the type's
    mean by 3 sigma (moment-based, exact integer sums until the final
    compare) — the ops alarm for traffic spikes / runaway producers.
    Two grouped aggregates; the minute series per type is bounded by
    the time range, not event volume. Zero-variance types (every minute
    identical — a real outcome at small inputs) have no defined z-score
    and by definition no burst: the z expression is NULL-guarded so
    ANSI mode cannot raise DIVIDE_BY_ZERO (driver_probe caught this at
    sf0.001), and the NULL z falls out of the > 3.0 filter, matching
    the oracle's NULLIF guard."""
    ev = load(spark, sf_dir, "events")
    per_min = (
        ev.groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("minute"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_min.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = (
        F.col("s2").cast("double") / F.col("n").cast("double")
        - mean * mean
    )
    z = F.try_divide(F.col("c").cast("double") - mean, F.sqrt(var))
    return (
        per_min.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "minute",
            "c",
            mean.alias("mean_per_min"),
            z.alias("z"),
        )
        .filter(F.col("z") > 3.0)
    )


@query("events_user_lifecycle")
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, how many active users are new
    (first-ever day), retained (also active the previous day), or
    resurrected (seen before, but not yesterday). Distinct user-days
    first, then two windows over each user's <= 31-day series — state
    bounded by days, not events. The standard DAU decomposition every
    usage dashboard starts from."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.dayofmonth("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    tagged = days.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("_prev"),
    ).select(
        "day",
        F.when(F.col("_prev").isNull(), F.lit("new"))
        .when(F.col("_prev") == F.col("day") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("status"),
    )
    return tagged.groupBy("day").agg(
        F.sum((F.col("status") == "new").cast("bigint")).alias("n_new"),
        F.sum((F.col("status") == "retained").cast("bigint")).alias(
            "n_retained"
        ),
        F.sum((F.col("status") == "resurrected").cast("bigint")).alias(
            "n_resurrected"
        ),
    )


@query("events_trailing_hour_sum")
def events_trailing_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h spend per user at every event (RANGE frame over
    event-time seconds, not row counts — the frame Spark evaluates by
    value, so sparse and bursty streams get the same window
    semantics). DECIMAL-exact sum; per-user partitions bound the frame
    state. Returns one row per purchase event with its trailing-hour
    total."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.withColumn(
            "trailing_1h_value",
            F.sum(dec("value")).over(w).cast("double"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "trailing_1h_value")
    )


@query("events_multi_distinct_profile")
def events_multi_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several exact COUNT(DISTINCT)s in one aggregate (users, types,
    active minutes per day) — Spark plans this with expand + two-level
    aggregation so each distinct gets its own dedup path in one pass
    over the scan; the daily activity profile every usage report
    needs."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.dayofmonth("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("event_type").alias("n_types"),
        F.count_distinct(
            F.date_trunc("minute", F.col("ts"))
        ).alias("n_active_minutes"),
    )


@query("events_model_score")
def events_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch inference with a fixed logistic model as pure column
    expressions: z = w.x over derived features (value, hour, weekend,
    is-purchase), sigmoid in one exp() — no UDF, so scoring runs inside
    whole-stage codegen at scan speed, the shape batch model-apply
    should take before anyone reaches for mapInPandas. Returns events
    scored above 0.8."""
    ev = load(spark, sf_dir, "events")
    z = (
        F.lit(-2.0)
        + F.lit(0.015) * F.col("value").cast("double")
        + F.lit(0.05) * F.hour("ts").cast("double")
        + F.lit(0.3) * (F.dayofweek("ts").isin(1, 7)).cast("double")
        + F.lit(1.2) * (F.col("event_type") == "purchase").cast("double")
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        ev.select("event_id", "user_id", "event_type", score.alias("score"))
        .filter(F.col("score") > 0.8)
    )


@query("events_k_anonymity")
def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (event_type, hour
    bucket, value decile): equivalence classes with fewer than k=5
    members are re-identification risks a training-data release must
    suppress or generalize. One grouped count plus a summary row per
    violating class — the privacy twin of the DQ report."""
    ev = load(spark, sf_dir, "events")
    classes = (
        ev.select(
            "event_type",
            F.hour("ts").alias("hour"),
            # NULL bucket for non-finite values (its own equivalence
            # class) instead of an ANSI overflow on floor(Inf) -> int
            F.when(
                is_finite(F.col("value")),
                F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9)),
            ).alias("value_bucket"),
        )
        .groupBy("event_type", "hour", "value_bucket")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    return classes.filter(F.col("class_size") < 5)


@query("events_weekend_ttest")
def events_weekend_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic for weekday-vs-weekend value per event_type
    — the two-sample test a feature owner runs before claiming a
    behavioral difference. All five moments per side are exact integer/
    decimal sums in ONE conditional aggregate (no second scan); only
    the final t expression is float."""
    ev = load(spark, sf_dir, "events")
    is_we = F.dayofweek("ts").isin(1, 7)
    v = dec("value")
    agg = ev.groupBy("event_type").agg(
        F.sum(F.when(is_we, 1).otherwise(0)).alias("n_we"),
        F.sum(F.when(~is_we, 1).otherwise(0)).alias("n_wd"),
        F.sum(F.when(is_we, v).otherwise(F.lit(0).cast(DEC))).alias("s_we"),
        F.sum(F.when(~is_we, v).otherwise(F.lit(0).cast(DEC))).alias("s_wd"),
        F.sum(F.when(is_we, v * v).otherwise(F.lit(0).cast(DEC))).alias(
            "q_we"
        ),
        F.sum(F.when(~is_we, v * v).otherwise(F.lit(0).cast(DEC))).alias(
            "q_wd"
        ),
    )
    # Portable wide casts (numerics.dec_wide_to_double): mean_diff and
    # the variance assembly subtract near-equal quantities whose
    # condition number grows ~sqrt(n) — measured kappa up to 4.3e3 at
    # sf0.1, at the gate's ~4.5e3 canonicalization threshold — so every
    # wide sum must reach double bit-identically on both engines.
    # try_divide throughout: a type with no weekend (or no weekday)
    # events, or zero variance on both sides, leaves the statistic
    # undefined -> NULL rather than an ANSI DIVIDE_BY_ZERO
    n_we_d = F.col("n_we").cast("double")
    n_wd_d = F.col("n_wd").cast("double")
    m_we = F.try_divide(_wd(F.col("s_we"), 6), n_we_d)
    m_wd = F.try_divide(_wd(F.col("s_wd"), 6), n_wd_d)
    var_we = F.try_divide(_wd(F.col("q_we"), 12), n_we_d) - m_we * m_we
    var_wd = F.try_divide(_wd(F.col("q_wd"), 12), n_wd_d) - m_wd * m_wd
    t_stat = F.try_divide(
        m_we - m_wd,
        F.sqrt(
            F.try_divide(var_we, n_we_d) + F.try_divide(var_wd, n_wd_d)
        ),
    )
    return agg.select(
        "event_type",
        "n_we",
        "n_wd",
        (m_we - m_wd).alias("mean_diff"),
        t_stat.alias("t_stat"),
    )


@query("emb_dim_variance")
def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance profile of the embedding space — dead or
    near-constant dimensions (broken encoder heads, zero-padding) show
    up as variance ~0 and waste index space. posexplode pivots vectors
    to (dim, value); per-dim moments use numerics.fixed_point_sum —
    order-independent AND O(1) aggregation state (each dim group holds
    the whole corpus, so the former sorted collect-fold was an OOM at
    100 TB; the fixed-point sum is a true streaming aggregate with
    map-side combine, engine-exact by construction)."""
    from .functions.numerics import fixed_point_sum

    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode("embedding").alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    stats = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        (fixed_point_sum(F.col("v")) / F.count(F.lit(1))).alias("mean_v"),
        (
            fixed_point_sum(F.col("v") * F.col("v")) / F.count(F.lit(1))
        ).alias("_m2"),
    )
    return stats.select(
        "dim",
        "n",
        "mean_v",
        (F.col("_m2") - F.col("mean_v") * F.col("mean_v")).alias("var_v"),
    )


@query("docs_dedup_threshold_sweep")
def docs_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity sweep for near-dup removal: surviving LSH
    candidate pairs at each Jaccard cutoff in ONE pass (the candidate
    scores fan out over a literal threshold array) — the tuning curve
    you inspect before fixing the production cutoff. Candidate
    generation and exact scoring run once; the sweep is a constant-
    width explode over the scored pairs."""
    from .functions.dedup import jaccard_on_candidates, minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    scored = jaccard_on_candidates(docs, minhash_lsh_pairs(docs))
    thresholds = F.array(
        *[F.lit(x) for x in (0.5, 0.6, 0.7, 0.8, 0.9)]
    )
    return (
        scored.select(
            "jaccard", F.explode(thresholds).alias("threshold")
        )
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query("events_sequence_violations")
def events_sequence_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-constraint validation: users whose first purchase
    precedes their first click AND first view — an impossible funnel
    order that flags instrumentation bugs or replayed/forged traffic.
    One conditional min-aggregate per user (no window, no join): the
    state-machine check collapses to comparing conditional firsts."""
    ev = load(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    agg = ev.groupBy("user_id").agg(
        first_ts("purchase").alias("first_purchase"),
        first_ts("click").alias("first_click"),
        first_ts("view").alias("first_view"),
    )
    return agg.filter(
        F.col("first_purchase").isNotNull()
        & (
            F.col("first_click").isNull()
            | (F.col("first_purchase") < F.col("first_click"))
        )
        & (
            F.col("first_view").isNull()
            | (F.col("first_purchase") < F.col("first_view"))
        )
    )


@query("lineitem_supplier_hhi")
def lineitem_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supply-concentration index per part brand:
    sum of squared supplier revenue shares (10000 = single-source risk,
    ->0 = fragmented). Shares come from exact DECIMAL revenue sums; the
    share squaring is the only float step. Two grouped aggregates over
    one scan-side join with the broadcast part dim."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = (
        li.join(
            dim_bcast(part.select("p_partkey", "p_brand"), sf_dir, "part"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(dec("l_extendedprice")).alias("_rev"))
    )
    tot = rev.groupBy("p_brand").agg(F.sum("_rev").alias("_tot"))
    share = F.col("_rev").cast("double") / F.col("_tot").cast("double")
    return (
        rev.join(F.broadcast(tot), "p_brand")
        .select("p_brand", (share * share * F.lit(10000.0)).alias("_h"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("_h").cast(DEC)).cast("double").alias("hhi")
        )
    )


@query("events_value_benford")
def events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on the value column: observed first-
    significant-digit frequencies vs the log10(1+1/d) expectation —
    the classic fabricated-data / unit-mixup detector. First digits
    come from floor(v / 10^floor(log10 v)) (correctly-rounded libm on
    both engines); expected shares are exact log10 expressions."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    digit = F.floor(
        v / F.pow(F.lit(10.0), F.floor(F.log10(v)))
    ).cast("int")
    obs = (
        # finite guard: NaN compares greater-than-everything in Spark, so
        # `v > 0` alone admits NaN (whose floor lands digit 0 -> a 1/0
        # in the benford_share expression); Inf likewise
        ev.filter((v > 0) & is_finite(v))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    tot = obs.agg(F.sum("observed").alias("_n"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "observed",
            (
                F.col("observed").cast("double")
                / F.col("_n").cast("double")
            ).alias("observed_share"),
            F.log10(
                F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
            ).alias("benford_share"),
        )
    )


@query("events_bounce_rate")
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate by entry event type: share of 30-min-gap
    sessions that contain exactly one event, keyed by how the session
    started — the engagement metric layered on the same islands rule as
    events_sessionize. Struct-min picks the deterministic entry event;
    rates are exact-int divisions."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "_new",
        (
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
            )
        ).cast("int"),
    ).withColumn(
        "_sess",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = flagged.groupBy("user_id", "_sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.struct("ts", "event_id", "event_type")).alias("_first"),
    )
    return (
        sessions.select(
            F.col("_first.event_type").alias("entry_type"),
            (F.col("n_events") == 1).cast("bigint").alias("_bounce"),
        )
        .groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("_bounce").alias("n_bounces"),
            (
                F.sum("_bounce").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("bounce_rate"),
        )
    )


@query("events_top_minutes_with_ties")
def events_top_minutes_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 busiest minutes per event_type WITH TIES (rank, not
    row_number): every minute tied with the third-busiest is included,
    the correct leaderboard semantics when counts collide. The rank
    window runs over per-minute pre-aggregates, bounded by the time
    range."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    per_min = (
        ev.groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("minute"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("c"))
    return (
        per_min.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "minute", "c", "rnk")
    )


@query("docs_vocab_growth")
def docs_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct-term count as
    the corpus accretes source by source (alphabetical order) — the
    curve that says whether the next crawl still adds vocabulary. Each
    term contributes at its FIRST source (min over sources), so the
    cumulative count is a running sum over the tiny per-source series;
    no term is ever counted twice."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    from .functions.text import tokens

    first_src = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.min("source").alias("first_source"))
    )
    new_terms = first_src.groupBy("first_source").agg(
        F.count(F.lit(1)).alias("new_terms")
    )
    w = Window.orderBy("first_source").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return new_terms.select(
        F.col("first_source").alias("source"),
        "new_terms",
        F.sum("new_terms").over(w).alias("cum_vocab"),
    )


@query("docs_jsonl_ingest")
def docs_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest with corrupt-record quarantine, end to end: the
    documents table is serialized to JSON lines in-plan (to_json), lines
    for doc_id % 97 == 0 are deterministically truncated (simulated
    transfer corruption), written as text, and read back through
    sources/jsonl.read_jsonl's PERMISSIVE + corrupt-column contract.
    Returns per-lang clean-row counts plus a '_quarantined' row — the
    oracle recomputes both from the clean table, proving the parse path
    loses nothing and quarantines exactly the corrupted subset."""
    import os

    from .sources.jsonl import read_jsonl, split_quarantine

    docs = load(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "lang", "source", "n_chars"))
    corrupted = F.when(
        F.col("doc_id") % 97 == 0,
        F.substring(line, 1, 20),
    ).otherwise(line)
    base = scratch_dir("dfx_jsonl_")
    path = os.path.join(base, "docs.jsonl")
    docs.select(corrupted.alias("value")).write.mode("overwrite").text(path)

    # cache: Spark disallows projecting ONLY the corrupt column off a
    # raw JSON scan; materializing the parsed frame is the documented
    # contract (see sources/jsonl.split_quarantine)
    parsed = read_jsonl(
        spark, path, "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"
    ).cache()
    clean, quarantined = split_quarantine(parsed)
    per_lang = clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    q = quarantined.agg(
        F.lit("_quarantined").alias("lang"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_lang.unionByName(q)


@query("docs_langid_confusion")
def docs_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the stopword
    heuristic's prediction against the labeled lang column, with
    per-cell share of the true-label row — the in-engine classifier
    report a curation pipeline keeps beside the classifier itself.
    Prediction and marginals are two grouped aggregates over one
    langid pass."""
    from .functions.text import language_id

    docs = load(spark, sf_dir, "documents")
    # the labeled lang rides the langid projection (row-wise map), not
    # a join-back on doc_id (r10 — same fix as the fingerprint family)
    joined = language_id(docs, extra_cols=("lang",)).select(
        "lang", "lang_pred"
    )
    cells = joined.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = cells.groupBy("lang").agg(F.sum("n").alias("_rt"))
    return (
        cells.join(F.broadcast(row_tot), "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            (
                F.col("n").cast("double") / F.col("_rt").cast("double")
            ).alias("row_share"),
        )
    )


@query("sim_lsh_recall_eval")
def sim_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as a query: recall@5 of the LSH top-k against the
    exact cosine top-k per query vector — the evaluation loop that
    belongs in the engine next to the index. Both sides run their
    normal plans; the metric is one semi-join + exact-int division.
    At 100 TB the exact side runs on a sampled query panel (here: the
    10-vector panel the topk queries already use)."""
    from .functions import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    q = _query_vectors(spark, sf_dir)
    exact = S.cosine_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    ann = S.lsh_topk(emb, q, k=5, n_planes=8, dim=64).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    # queries whose ANN list misses everything still need a row
    all_q = exact.select("query_id").distinct()
    return (
        all_q.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(5.0)
            ).alias("recall_at_5"),
        )
    )


@query("dedup_minhash_error_eval")
def dedup_minhash_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy evaluation: per LSH candidate pair, the minhash
    similarity estimate (fraction of equal signature components)
    against the exact n-gram Jaccard, with the absolute error — the
    number that justifies the production band/width configuration.
    Signatures and candidates are computed once; the exact side runs
    candidate-scoped as always."""
    from .functions.dedup import (
        jaccard_on_candidates,
        minhash_lsh_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    est = minhash_lsh_pairs(docs)
    exact = jaccard_on_candidates(docs, est.select("doc_a", "doc_b"))
    return (
        est.join(exact, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            "jaccard",
            F.abs(F.col("est_jaccard") - F.col("jaccard")).alias(
                "abs_err"
            ),
        )
    )


@query("events_session_duration_histogram")
def events_session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed session-duration histogram: sessions from the
    30-min islands rule, duration = last - first event, bucket =
    floor(log2(seconds + 1)) so each bar spans a doubling — the
    long-tail-friendly histogram for dwell-time dashboards. Exact
    integer durations; log2 on integers is correctly rounded in both
    engines."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "_new",
        (
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
            )
        ).cast("int"),
    ).withColumn(
        "_sess",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = flagged.groupBy("user_id", "_sess").agg(
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).alias("_dur_us")
    )
    bucket = F.floor(
        F.log2(F.col("_dur_us") / F.lit(1_000_000) + F.lit(1))
    ).cast("int")
    return (
        sessions.select(bucket.alias("duration_bucket"))
        .groupBy("duration_bucket")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@query("emb_label_separability")
def emb_label_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-separability report on the labeled embedding space: per
    label, the mean cosine of members to their OWN label centroid vs
    the mean cosine to the BEST OTHER centroid — the margin says
    whether labels are actually separable before anyone trains on
    them. Centroids come from label_centroids (fixed-point sums);
    per-vector cosines fan out over the broadcast 8-row centroid
    table; per-label means use numerics.fixed_point_sum — each label
    group holds its whole corpus slice, so the former sorted
    collect-fold was an OOM at 100 TB."""
    from .functions.numerics import fixed_point_sum
    from .functions.similarity import cosine, label_centroids, valid_vectors

    # direction-based metric: zero-norm / NaN vectors have no cosine to
    # any centroid — NULL-and-drop them before scoring
    emb = valid_vectors(load(spark, sf_dir, "embeddings"))
    cents = (
        label_centroids(emb)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "centroid"))
                ),
                lambda s: s["centroid"],
            ).alias("cv")
        )
        .select(F.col("label").alias("c_label"), "cv")
    )
    scored = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "label",
            "c_label",
            cosine(F.col("embedding"), F.col("cv")).alias("_cos"),
        )
    )
    per_vec = scored.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("label") == F.col("c_label"), F.col("_cos"))).alias(
            "own_cos"
        ),
        F.max(F.when(F.col("label") != F.col("c_label"), F.col("_cos"))).alias(
            "best_other_cos"
        ),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (fixed_point_sum(F.col("own_cos")) / F.count(F.lit(1))).alias(
            "mean_own_cos"
        ),
        (
            fixed_point_sum(F.col("best_other_cos")) / F.count(F.lit(1))
        ).alias("mean_best_other_cos"),
    )


@query("orders_size_distribution")
def orders_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size (lineitems per order) distribution — the basket-size
    histogram. Two tiny grouped counts; the first collapses the fact
    table, the second runs on per-order rows."""
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items")
    )
    return per_order.groupBy("n_items").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query("events_peak_concurrent_sessions")
def events_peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by sweep line: session
    intervals from the 30-min islands rule (attributed to their start
    day), exploded to +1/-1 boundary events, running-summed in time
    order with ends sorting BEFORE starts at ties (touching sessions
    are not concurrent), max per day — the capacity-planning number for
    connection-pool sizing. A single day's boundaries scale with the
    user base (days are HOT keys), so the sweep runs through
    ranking.grouped_running_sum's range-partitioned prefix sum instead
    of one sort task per day; tie order within an equal (t, d) group
    cannot change the prefix-value multiset (equal increments commute),
    so the per-day max is identical."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "_new",
        (
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
            )
        ).cast("int"),
    ).withColumn(
        "_sess",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = flagged.groupBy("user_id", "_sess").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    bounds = sessions.select(
        F.dayofmonth("s").alias("day"),
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("b"),
    ).select("day", "b.t", "b.d")
    running = RK.grouped_running_sum(
        bounds, ["day"], [F.asc("t"), F.asc("d")], "d", "_open"
    )
    return running.groupBy("day").agg(
        F.max("_open").alias("peak_concurrent")
    )


@query("docs_dq_by_source")
def docs_dq_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped data-quality report: per source, completeness and
    sanity rates (non-empty text, known lang, n_chars agrees with the
    text length) — the per-supplier scorecard that decides which feed
    needs fixing. One conditional aggregate per source, single scan."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.length("text") > 0).cast("bigint")
        ).alias("n_nonempty_text"),
        F.sum(
            F.col("lang").isin("en", "de", "es", "fr").cast("bigint")
        ).alias("n_known_lang"),
        F.sum(
            (F.length("text") == F.col("n_chars")).cast("bigint")
        ).alias("n_len_consistent"),
        (
            F.sum((F.length("text") == F.col("n_chars")).cast("bigint"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("len_consistency_rate"),
    )


@query("events_dow_anova")
def events_dow_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of value across days-of-week per
    event_type (the k-group generalization of the weekend t-test):
    between/within sums of squares assembled from exact per-group
    integer/decimal moments — one grouped aggregate plus a tiny
    per-type combine, single scan."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type", F.dayofweek("ts").alias("dow")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).alias("s"),
        F.sum(dec("value") * dec("value")).alias("q"),
    )
    t = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("N"),
        F.sum("s").alias("S"),
        F.sum("q").alias("Q"),
        # pinned sorted fold: a raw double sum of the s^2/n terms is
        # partition-order-dependent (observed on the 150-user ICC), and
        # a decimal cast tie-breaks differently across engines on exact
        # half-digit values (the label_centroids hazard) — sorting the
        # terms and folding sequentially is deterministic AND portable
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    (
                        _wd(F.col("s"), 6)
                        * _wd(F.col("s"), 6)
                    )
                    / F.col("n").cast("double")
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ssb_raw"),
    )
    ssb = F.col("ssb_raw") - (
        _wd(F.col("S"), 6) * _wd(F.col("S"), 6)
    ) / F.col("N").cast("double")
    ssw = _wd(F.col("Q"), 12) - F.col("ssb_raw")
    # try_divide at every stage: k=1 (no between-groups df), N=k (no
    # within df), or zero within-variance each leave F undefined -> NULL
    f_stat = F.try_divide(
        F.try_divide(ssb, F.col("k").cast("double") - F.lit(1.0)),
        F.try_divide(
            ssw, F.col("N").cast("double") - F.col("k").cast("double")
        ),
    )
    return t.select(
        "event_type",
        F.col("k").alias("n_groups"),
        F.col("N").alias("n_obs"),
        f_stat.alias("f_stat"),
    )


@query("emb_quantization_report")
def emb_quantization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level int8 quantization quality: per label, the worst and
    pinned-fold mean of the per-vector max reconstruction error, plus a
    count of bound violations (error > scale/2 — must be 0 by
    construction, so a nonzero is a broken quantizer). The invariant
    check rides the same scan as the report."""
    from .functions.similarity import quantize_int8

    emb = load(spark, sf_dir, "embeddings")
    q = quantize_int8(emb).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    fold = lambda c: F.aggregate(  # noqa: E731
        F.sort_array(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    return q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.max("max_abs_err").alias("worst_err"),
        (fold(F.col("max_abs_err")) / F.count(F.lit(1))).alias("mean_err"),
        F.sum(
            (
                F.col("max_abs_err") > F.col("scale") / 2 + F.lit(1e-12)
            ).cast("bigint")
        ).alias("n_bound_violations"),
    )


@query("events_type_entropy")
def events_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the value-bucket distribution per event_type
    (how spread out each type's values are, in nats) plus perplexity
    (exp entropy = effective number of buckets). Bucket counts are
    exact; -sum(p ln p) folds through exact decimal terms so the float
    result is engine-identical."""
    ev = load(spark, sf_dir, "events")
    # NULL bucket for non-finite values (counted as its own bucket)
    # instead of an ANSI overflow on floor(Inf) -> int
    b = F.when(
        is_finite(F.col("value")),
        F.least(
            F.greatest(F.floor(F.col("value") / 50).cast("int"), F.lit(0)),
            F.lit(9),
        ),
    )
    counts = ev.groupBy("event_type", b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("event_type").agg(F.sum("c").alias("t"))
    p = F.col("c").cast("double") / F.col("t").cast("double")
    return (
        counts.join(F.broadcast(tot), "event_type")
        .select("event_type", (-p * F.log(p)).alias("_term"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("_term").cast(DEC)).cast("double").alias("entropy")
        )
        .select(
            "event_type",
            "entropy",
            F.exp(F.col("entropy")).alias("perplexity"),
        )
    )


@query("docs_lang_diversity")
def docs_lang_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language diversity per source as effective language count
    (exp of Shannon entropy over the lang mix) — 1.0 means
    monolingual, higher means balanced multilingual; the number
    mixture planning actually wants, not raw counts."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("source").agg(F.sum("c").alias("t"))
    p = F.col("c").cast("double") / F.col("t").cast("double")
    return (
        counts.join(F.broadcast(tot), "source")
        .select("source", (-p * F.log(p)).alias("_term"))
        .groupBy("source")
        .agg(
            F.sum(F.col("_term").cast(DEC)).cast("double").alias("entropy")
        )
        .select(
            "source",
            "entropy",
            F.exp(F.col("entropy")).alias("effective_languages"),
        )
    )


@query("docs_char_trigram_profile")
def docs_char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 character trigrams per language (counts over the lowercased
    text, ties alphabetical) — the char-level feature profile real
    language ID models are built on, and a second text representation
    beside word shingles. Counting runs in the ``char_trigram_counts``
    mapInArrow kernel (r15): the old expression form's per-position
    ``substring`` was O(len^2) per document and serialized the whole
    query into one 9.5 s task at sf0.1 (kernel: 5.87 -> 0.91 s
    min-of-6 same-JVM; bit-parity INCLUDING the short/NULL-doc edge
    semantics is pinned in tests/test_text_functions.py). One shuffle
    on (lang, trigram)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    counts = T.char_trigram_counts(docs, group_col="lang", text_col="text")
    w = Window.partitionBy("lang").orderBy(
        F.desc("n"), F.asc("trigram")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "trigram", "n", "rnk")
    )


@query("events_hourly_variance_explained")
def events_hourly_variance_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each event_type's value variance hour-of-day
    seasonality explains (the R^2 of the hour-mean model): 1 -
    SSW/SST where SSW sums within-hour squared deviations — assembled
    entirely from exact per-(type, hour) integer/decimal moments, one
    scan, no residual materialization."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type", F.hour("ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).alias("s"),
        F.sum(dec("value") * dec("value")).alias("q"),
    )
    t = g.groupBy("event_type").agg(
        F.sum("n").alias("N"),
        F.sum("s").alias("S"),
        F.sum("q").alias("Q"),
        # pinned sorted fold: a raw double sum of the s^2/n terms is
        # partition-order-dependent (observed on the 150-user ICC), and
        # a decimal cast tie-breaks differently across engines on exact
        # half-digit values (the label_centroids hazard) — sorting the
        # terms and folding sequentially is deterministic AND portable
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    (
                        _wd(F.col("s"), 6)
                        * _wd(F.col("s"), 6)
                    )
                    / F.col("n").cast("double")
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ssb_raw"),
    )
    sst = _wd(F.col("Q"), 12) - (
        _wd(F.col("S"), 6) * _wd(F.col("S"), 6)
    ) / F.col("N").cast("double")
    ssw = _wd(F.col("Q"), 12) - F.col("ssb_raw")
    # try_divide: a type whose values are all identical has SST=0 and no
    # defined R^2 -> NULL
    return t.select(
        "event_type",
        F.col("N").alias("n_obs"),
        (F.lit(1.0) - F.try_divide(ssw, sst)).alias("variance_explained"),
    )


@query("tables_row_counts")
def tables_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog sanity report: row count of every table in the dataset —
    the first query every migration runs against both engines. Ten
    count(*) scans (column-pruned to zero columns by Spark's count
    optimization) unioned into one frame."""
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    parts = [
        load(spark, sf_dir, n).agg(
            F.lit(n).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        for n in names
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query("events_user_powerlaw_alpha")
def events_user_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-tail screen: the MLE power-law exponent of the events-per-
    user distribution (alpha = 1 + n / sum ln(x/xmin), xmin = 1) — says
    whether user activity is Zipf-like (a few users dominate; plan for
    skew) or flat. The ln sum is a numerics.fixed_point_sum — the
    former global sorted collect-fold held one ln term PER USER in a
    single buffer (billions at 100 TB); the fixed-point sum is a
    streaming aggregate with O(1) state, engine-exact."""
    from .functions.numerics import fixed_point_sum

    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.max("x").alias("max_events"),
        (
            F.lit(1.0)
            + F.count(F.lit(1)).cast("double")
            / fixed_point_sum(F.log(F.col("x").cast("double")))
        ).alias("alpha"),
    )


@query("events_bot_users")
def events_bot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-traffic heuristic: users whose event rate over their active
    span exceeds 2 events/minute AND whose inter-arrival variance is
    implausibly low (metronomic automation) — the cleaning gate run
    before behavioral data enters training. Rates and gap moments are
    exact integer/decimal arithmetic from one pass plus a per-user lag
    window bounded by each user's history."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts"))
        - F.unix_micros(F.lag("ts").over(w))
    ).cast("double") / F.lit(1_000_000.0)
    per_user = (
        ev.withColumn("_gap", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                (
                    F.unix_micros(F.max("ts"))
                    - F.unix_micros(F.min("ts"))
                ).cast("double")
                / F.lit(60_000_000.0)
            ).alias("span_min"),
            F.count("_gap").alias("_ng"),
            F.sum(F.col("_gap").cast(DEC)).alias("_gs"),
            F.sum(
                (F.col("_gap") * F.col("_gap")).cast(DEC)
            ).alias("_gq"),
        )
    )
    rate = F.col("n_events").cast("double") / F.greatest(
        F.col("span_min"), F.lit(1.0)
    )
    gmean = F.col("_gs").cast("double") / F.col("_ng").cast("double")
    gvar = (
        F.col("_gq").cast("double") / F.col("_ng").cast("double")
        - gmean * gmean
    )
    cv = F.sqrt(gvar) / gmean  # coefficient of variation; bots << 1
    return (
        per_user.filter(F.col("_ng") >= 10)
        .select(
            "user_id",
            "n_events",
            rate.alias("events_per_min"),
            cv.alias("gap_cv"),
        )
        .filter((rate > 2.0) & (cv < 0.3))
    )


@query("events_attribution_latency")
def events_attribution_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase latency distribution: log2-bucketed minutes
    between each purchase and its first-touch click (same bucketed
    candidate join as events_attribution_first_touch) — the conversion-
    lag curve that sets the attribution window itself. Exact integer
    durations; one extra grouped count over the argmin output."""
    ev = load(spark, sf_dir, "events")
    first = QUERIES["events_attribution_first_touch"](spark, sf_dir)
    lat_min = (
        F.unix_micros(F.col("purchase_ts"))
        - F.unix_micros(F.col("first_click_ts"))
    ) / F.lit(60_000_000.0)
    bucket = F.floor(F.log2(lat_min + F.lit(1.0))).cast("int")
    return (
        first.select(bucket.alias("latency_bucket"))
        .groupBy("latency_bucket")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


@query("docs_hash_partition_balance")
def docs_hash_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioner-quality audit: docs spread across 32 md5-derived
    partitions — max/min/mean bucket sizes and the imbalance ratio
    (max/mean). A ratio near 1 certifies the content-hash partitioning
    the dedup and split families rely on actually balances load; a
    high ratio means hot partitions at 100 TB. One grouped count plus
    a 32-row summary."""
    from .functions.sampling import hash_bucket

    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        hash_bucket(F.col("doc_id"), "part", 32).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.min("n").alias("min_docs"),
        F.max("n").alias("max_docs"),
        (
            F.sum("n").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_docs"),
        (
            F.max("n").cast("double")
            * F.count(F.lit(1)).cast("double")
            / F.sum("n").cast("double")
        ).alias("imbalance_ratio"),
    )


@query("events_kpi_summary")
def events_kpi_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row executive KPI rollup: events, users, purchase count and
    rate, exact decimal GMV, average daily actives — the dashboard
    header every pipeline ultimately feeds. One pass, one conditional
    aggregate (count_distinct is the only wide state)."""
    ev = load(spark, sf_dir, "events")
    purchases = (F.col("event_type") == "purchase").cast("bigint")
    return ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(purchases).alias("n_purchases"),
        (
            F.sum(purchases).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("purchase_rate"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", dec("value")
            ).otherwise(F.lit(0).cast(DEC))
        ).cast("double").alias("gmv"),
        F.count_distinct(
            "user_id", F.dayofmonth("ts")
        ).alias("user_days"),
    )


@query("lineitem_brand_price_qty_corr")
def lineitem_brand_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation (quantity vs extended price per part
    brand): every sum in r is exact integer/decimal, assembled per
    group in one scan — the grouped twin of lineitem_corr_stats, for
    when the question is 'does the relationship hold in every
    segment'."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(
        dim_bcast(part.select("p_partkey", "p_brand"), sf_dir, "part"),
        li.l_partkey == F.col("p_partkey"),
    )
    x = dec("l_quantity")
    y = dec("l_extendedprice")
    s = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    # Cancellation in exact decimal, portable nearest-double conversion
    # on the compact integer parts (numerics.pearson_exact_parts: the
    # double-first assembly diverged from DuckDB at sf0.1 via its
    # double-rounding wide-decimal->double cast).
    from .functions.numerics import dec_int_to_double, pearson_exact_parts

    num, den_x, den_y = pearson_exact_parts()
    corr = dec_int_to_double(num) / F.sqrt(
        dec_int_to_double(den_x) * dec_int_to_double(den_y)
    )
    return s.select("p_brand", "n", corr.alias("corr_qty_price"))


@query("orders_customer_lifetime")
def orders_customer_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime distribution: months between first and last
    order per customer, bucketed — the retention-horizon histogram
    subscription planning reads. Integer month arithmetic
    (12*yeardiff + monthdiff), two tiny aggregates."""
    orders = load(spark, sf_dir, "orders")
    span = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_o"),
        F.max("o_orderdate").alias("last_o"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    months = (
        (F.year("last_o") - F.year("first_o")) * 12
        + (F.month("last_o") - F.month("first_o"))
    )
    return (
        span.select(
            (F.floor(months / 12)).cast("int").alias("lifetime_years"),
        )
        .groupBy("lifetime_years")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query("events_transition_entropy")
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral predictability: conditional entropy H(next | current)
    of the per-user event-type Markov chain, per current state — low
    entropy states are deterministic funnels, high entropy states are
    branch points. Transition counts are exact; the -sum(p ln p) terms
    fold through exact decimals like events_type_entropy."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("_next", F.lead("event_type").over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col("event_type").alias("cur"),
            F.col("_next").alias("nxt"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = trans.groupBy("cur").agg(F.sum("c").alias("t"))
    p = F.col("c").cast("double") / F.col("t").cast("double")
    return (
        trans.join(F.broadcast(tot), "cur")
        .select("cur", (-p * F.log(p)).alias("_term"))
        .groupBy("cur")
        .agg(
            F.sum(F.col("_term").cast(DEC)).cast("double").alias(
                "conditional_entropy"
            )
        )
    )


@query("supplier_acctbal_boxstats")
def supplier_acctbal_boxstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-number box-plot summary of supplier account balance per
    nation (exact interpolated quartiles + min/max) — the grouped
    distribution snapshot every ops report draws. Per-nation sorts are
    bounded by group size; the sketch twin (approx_percentile) is the
    fallback when even that is too wide."""
    supp = load(spark, sf_dir, "supplier")
    return supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("s_acctbal").alias("min_bal"),
        F.percentile("s_acctbal", 0.25).alias("q1"),
        F.percentile("s_acctbal", 0.5).alias("median"),
        F.percentile("s_acctbal", 0.75).alias("q3"),
        F.max("s_acctbal").alias("max_bal"),
    )


@query("orders_reorder_consistency")
def orders_reorder_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-rhythm profile: for customers with >= 5 orders, the mean
    and coefficient of variation of their inter-order gaps (days) —
    low CV means subscription-like cadence. Gap moments are exact
    integer day arithmetic; the per-customer lag window is bounded by
    order history."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate"), F.lag("o_orderdate").over(w)
    ).cast("bigint")
    g = (
        orders.withColumn("_gap", gap)
        .filter(F.col("_gap").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("_gap").alias("s"),
            F.sum(F.col("_gap") * F.col("_gap")).alias("q"),
        )
        .filter(F.col("n_gaps") >= 4)
    )
    mean = F.col("s").cast("double") / F.col("n_gaps").cast("double")
    var = (
        F.col("q").cast("double") / F.col("n_gaps").cast("double")
        - mean * mean
    )
    return g.select(
        "o_custkey",
        "n_gaps",
        mean.alias("mean_gap_days"),
        (F.sqrt(var) / mean).alias("gap_cv"),
    )


@query("docs_dedup_savings")
def docs_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ROI report: per source, how many documents and characters
    exact dedup would drop (duplicates beyond each content group's
    keeper) — the bytes-saved number that justifies running the fuzzy
    families at all. One md5 groupBy plus a per-source rollup, exact
    integer sums."""
    docs = load(spark, sf_dir, "documents")
    groups = docs.groupBy(F.md5("text").alias("_h"), "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.max("n_chars").alias("keeper_chars"),
    )
    return groups.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.col("n") - 1).alias("n_dropped"),
        F.sum(
            F.col("chars") - F.col("keeper_chars")
        ).alias("chars_saved"),
        (
            F.sum(F.col("n") - 1).cast("double")
            / F.sum("n").cast("double")
        ).alias("drop_rate"),
    )


@query("part_type_hierarchy_stats")
def part_type_hierarchy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-hierarchy ROLLUP: p_type ('STANDARD POLISHED BRASS')
    splits into (grade, finish) levels; ROLLUP aggregates part counts
    and exact-decimal mean retail price at every level including the
    grand total — dimensional modeling from a string column with no
    dimension table."""
    part = load(spark, sf_dir, "part")
    # F.get (not getItem): single-word types must yield NULL finish
    # under ANSI mode, matching string_split(...)[2] in the oracle
    lv = part.select(
        F.get(F.split(F.col("p_type"), " "), 0).alias("grade"),
        F.get(F.split(F.col("p_type"), " "), 1).alias("finish"),
        "p_retailprice",
    )
    return (
        lv.rollup("grade", "finish")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (
                F.sum(dec("p_retailprice")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_price"),
        )
    )


@query("docs_neardup_degree_distribution")
def docs_neardup_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structure of the near-dup graph: how many docs have 1, 2, ...
    LSH partners (degree histogram over the candidate pairs) — stars
    and cliques need different dedup strategies, and this is the query
    that tells them apart. Pair fan-out is the already-bounded LSH
    output; two tiny grouped counts after."""
    from .functions.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, scores=False)
    degree = (
        pairs.select(F.col("doc_a").alias("doc"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc")))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return degree.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query("events_time_to_first_purchase")
def events_time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation latency: hours from each user's first event to their
    first purchase (users who never purchase are excluded), bucketed
    by day — the activation curve growth teams tune onboarding
    against. Two conditional min-aggregates per user, exact integer
    microsecond arithmetic."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    hours = (
        F.unix_micros(F.col("first_purchase"))
        - F.unix_micros(F.col("first_seen"))
    ) / F.lit(3_600_000_000.0)
    return (
        agg.filter(F.col("first_purchase").isNotNull())
        .select(
            F.floor(hours / 24).cast("int").alias("days_to_activate")
        )
        .groupBy("days_to_activate")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query("orders_segment_priority_mix")
def orders_segment_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix per market segment (share within segment):
    the broadcast-dim share matrix marketing reads weekly. One
    broadcast join of the customer dim + two grouped counts."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    j = orders.join(
        dim_bcast(cust.select("c_custkey", "c_mktsegment"), sf_dir, "customer"),
        orders.o_custkey == F.col("c_custkey"),
    )
    cells = j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.groupBy("c_mktsegment").agg(F.sum("n").alias("_t"))
    return (
        cells.join(F.broadcast(tot), "c_mktsegment")
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "n",
            (
                F.col("n").cast("double") / F.col("_t").cast("double")
            ).alias("segment_share"),
        )
    )


@query("events_daily_drawdown")
def events_daily_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown of the daily purchase-GMV series: each day's gap to
    the best day so far (running max), plus the worst gap overall per
    event stream — the health metric that catches revenue cliffs a
    mean hides. Exact decimal daily sums; the running max runs over
    the tiny per-day series."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.dayofmonth("ts").alias("day"))
        .agg(F.sum(dec("value")).alias("_gmv"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.withColumn("_peak", F.max("_gmv").over(w))
    return run.select(
        "day",
        F.col("_gmv").cast("double").alias("gmv"),
        F.col("_peak").cast("double").alias("peak_gmv"),
        (
            (F.col("_peak") - F.col("_gmv")).cast("double")
            / F.col("_peak").cast("double")
        ).alias("drawdown"),
    )


@query("docs_quality_length_matrix")
def docs_quality_length_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint quality x length profile: documents cross-tabbed by
    quality-score bucket (floor(score*10), clamped) and log2 length
    bucket — the 2-D view that shows whether low quality is just
    shortness (filter on one axis) or independent (filter on both).
    Composes the quality_score operator; one extra grouped count."""
    from .functions.text import quality_score

    docs = load(spark, sf_dir, "documents")
    # n_chars rides the scoring projection (row-wise map), not a
    # join-back on doc_id (r10 — see fingerprint)
    q = quality_score(docs, extra_cols=("n_chars",))
    qb = F.least(
        F.greatest(
            F.floor(F.col("quality_score") * 10).cast("int"), F.lit(0)
        ),
        F.lit(9),
    )
    lb = F.floor(F.log2(F.col("n_chars") + 1)).cast("int")
    return q.groupBy(
        qb.alias("quality_bucket"), lb.alias("length_bucket")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@query("lineitem_returns_by_brand")
def lineitem_returns_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per part brand (share of lineitems with returnflag
    'R' and the exact-decimal revenue at risk) — the supplier-quality
    triage list. One broadcast part-dim join, one conditional
    aggregate."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    ret = (F.col("l_returnflag") == "R").cast("bigint")
    return (
        li.join(
            dim_bcast(part.select("p_partkey", "p_brand"), sf_dir, "part"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(ret).alias("n_returned"),
            (
                F.sum(ret).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("return_rate"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R", dec("l_extendedprice")
                ).otherwise(F.lit(0).cast(DEC))
            ).cast("double").alias("returned_revenue"),
        )
    )


@query("events_hourly_profile_similarity")
def events_hourly_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types share a usage rhythm: cosine similarity
    between types' 24-hour activity profiles (pairs ordered, ties by
    name). Profiles are exact counts assembled into dense 24-vectors;
    the cosine folds run in index order on both engines. The pair
    space is types^2 — trivial after the one real aggregate."""
    ev = load(spark, sf_dir, "events")
    prof = (
        ev.groupBy("event_type", F.hour("ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("h", "c"))),
                lambda s: s["c"].cast("double"),
            ).alias("v")
        )
    )
    from .functions.similarity import cosine

    a = prof.select(
        F.col("event_type").alias("type_a"), F.col("v").alias("va")
    )
    b = prof.select(
        F.col("event_type").alias("type_b"), F.col("v").alias("vb")
    )
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            cosine(F.col("va"), F.col("vb")).alias("profile_cosine"),
        )
    )


@query("emb_centroid_drift")
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-embedding drift monitor: per label, the L2 distance between
    the centroid of the first half of vectors (by vec_id) and the
    second half — the validation run after an encoder swap, where
    large drift on a stable label means the new embedding space moved.
    Component means via numerics.fixed_point_sum (each (label, half,
    pos) cell holds that label's whole corpus slice — the former sorted
    collect-fold was an OOM at 100 TB); the final 64-term distance fold
    stays a sorted fold (constant-bounded). Engine-exact either way.

    Single-pass shape (r16, guide §1.2): both halves' sums and counts
    are conditional aggregates of ONE groupBy(label, pos) — one scan,
    one exchange — instead of groupBy(label, half, pos) fanned into two
    filtered branches re-joined on (label, pos) (two post-shuffle
    aggregate evaluations plus a join exchange). Equivalence:
    fixed_point_sum is an order-independent decimal sum and `when`
    without `otherwise` NULL-skips the other half exactly as the
    half-filtered groups did; `count(when(half, 1))` counts all of the
    half's rows including NULL `_v`, matching the old `count(1)` per
    (label, half, pos) group; requiring both half-counts > 0 reproduces
    the inner join's (label, pos) membership (a cell existed for a half
    iff it had >= 1 row). The divides cannot hit ANSI 0-division: a
    0-count half has a NULL sum, and NULL/0 short-circuits to NULL
    before the divisor check — and those rows are filtered anyway."""
    from .functions.numerics import fixed_point_sum

    emb = load(spark, sf_dir, "embeddings")
    # NULL vec_id lands in half "b", exactly as the old
    # when(...).otherwise("b") routed it — a raw boolean would NULL-skip
    # such rows from BOTH halves.
    is_a = F.when(F.col("vec_id") % 2 == 0, F.lit(True)).otherwise(
        F.lit(False)
    )
    comp = emb.select(
        "label",
        is_a.alias("_ia"),
        F.posexplode("embedding").alias("pos", "_v"),
    )
    v = F.col("_v").cast("double")
    cells = comp.groupBy("label", "pos").agg(
        fixed_point_sum(F.when(F.col("_ia"), v)).alias("_sa"),
        F.count(F.when(F.col("_ia"), F.lit(1))).alias("_na"),
        fixed_point_sum(F.when(~F.col("_ia"), v)).alias("_sb"),
        F.count(F.when(~F.col("_ia"), F.lit(1))).alias("_nb"),
    )
    paired = cells.filter(
        (F.col("_na") > 0) & (F.col("_nb") > 0)
    ).select(
        "label",
        (F.col("_sa") / F.col("_na")).alias("ma"),
        (F.col("_sb") / F.col("_nb")).alias("mb"),
    )
    d2 = (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
    fold2 = F.aggregate(
        F.sort_array(F.collect_list(d2)), F.lit(0.0), lambda acc, x: acc + x
    )
    return paired.groupBy("label").agg(
        F.sqrt(fold2).alias("centroid_l2_drift")
    )


@query("ri_check_report")
def ri_check_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the schema's foreign keys
    (lineitem->orders, lineitem->part, lineitem->supplier,
    orders->customer, customer->nation, supplier->nation,
    nation->region): child rows, distinct keys, and orphan count per
    edge — the first structural check of any migration.

    One pass per edge (r16, guide §1.2): the child is grouped by key
    ONCE (map-side combine shuffles distinct keys, not rows), left-
    joined against the distinct parent keys with a hit marker, and all
    three report numbers come out of one final aggregate — instead of
    the old 7 × (full-child agg with a count_distinct expand + a
    SECOND full-child pass through a left-anti join + a 1-row broadcast
    crossJoin). Halves the child passes, drops 7 driver-blocking
    broadcast builds and every crossJoin, and at warehouse scale the
    only child-table shuffle left carries map-side-combined distinct
    keys (the left_anti shuffled every child ROW once the parent side
    outgrew broadcast). Two rejected variants, both measured same-JVM
    alternating min-of-6 at sf0.1: a tagged-union single pipeline over
    all 7 edges (1.42 s vs 0.76/0.80 — unioning destroys the per-edge
    broadcast locality) and the status quo (r15's 2.55 s for this query
    was the throttled-disk artifact, see OPTIMIZATION_r16.md; its real
    post-tmpfs cost is ~0.8 s, which this shape matches locally while
    winning at scale).

    Equivalence (oracle-pinned at 3 SFs + exact-parity A/B): per key
    group `_cnt` = child rows with that key, so sum(_cnt) = count(*);
    count of non-NULL group keys = count(DISTINCT k) (count_distinct
    ignores NULLs; the NULL group contributes 0 to `count(_k)`); a
    group with no parent match (`_hit` NULL — including the NULL-key
    group, which never equi-joins) contributes `_cnt` orphan rows,
    exactly the rows the old left_anti kept. On an empty child the
    group-less `agg()` still emits one row and the sums coalesce to 0,
    matching the old per-edge count-only row."""
    tables = {
        n: load(spark, sf_dir, n)
        for n in [
            "region", "nation", "customer", "supplier",
            "part", "orders", "lineitem",
        ]
    }
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    zero = F.lit(0).cast("bigint")
    parts = []
    for child, ck, parent, pk in edges:
        per_key = tables[child].groupBy(F.col(ck).alias("_k")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        p = (
            tables[parent]
            .select(F.col(pk).alias("_k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        parts.append(
            per_key.join(p, "_k", "left").agg(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("fk_edge"),
                F.coalesce(F.sum("_cnt"), zero).alias("child_rows"),
                F.count("_k").alias("distinct_keys"),
                F.coalesce(
                    F.sum(F.when(F.col("_hit").isNull(), F.col("_cnt"))),
                    zero,
                ).alias("orphan_rows"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


@query("lineitem_linenumber_integrity")
def lineitem_linenumber_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-sequence contract check: l_linenumber must be exactly
    1..n within every order (no gaps, no duplicates, starts at 1).
    Verified without a sort via the arithmetic identity: count = max,
    min = 1, and sum = n(n+1)/2 — three aggregates per order, then
    one violation rollup. The integrity op for any positional child
    table."""
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_linenumber").alias("mn"),
        F.max("l_linenumber").alias("mx"),
        F.sum("l_linenumber").alias("s"),
    )
    ok = (
        (F.col("mn") == 1)
        & (F.col("mx") == F.col("n"))
        & (F.col("s") == F.col("n") * (F.col("n") + 1) / 2)
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((~ok).cast("bigint")).alias("n_violations"),
        F.max("n").alias("max_lines_per_order"),
    )


@query("events_error_pchart")
def events_error_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart (SPC control chart) for the daily error-event share:
    each day's error proportion against the corpus-wide center line
    with 3-sigma binomial control limits (sqrt(p(1-p)/n)), flagging
    out-of-control days — the ops chart that separates noise from
    regressions. Exact counts; the center line is one broadcast 1-row
    aggregate."""
    ev = load(spark, sf_dir, "events")
    is_err = (F.col("event_type") == "error").cast("bigint")
    daily = ev.groupBy(F.dayofmonth("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_err).alias("errs"),
    )
    center = daily.agg(
        (
            F.sum("errs").cast("double") / F.sum("n").cast("double")
        ).alias("_p")
    )
    share = F.col("errs").cast("double") / F.col("n").cast("double")
    sigma = F.sqrt(
        F.col("_p") * (F.lit(1.0) - F.col("_p"))
        / F.col("n").cast("double")
    )
    ucl = F.col("_p") + F.lit(3.0) * sigma
    lcl = F.greatest(F.col("_p") - F.lit(3.0) * sigma, F.lit(0.0))
    return (
        daily.crossJoin(F.broadcast(center))
        .select(
            "day",
            "n",
            "errs",
            share.alias("error_share"),
            F.col("_p").alias("center_line"),
            ucl.alias("ucl"),
            lcl.alias("lcl"),
            ((share > ucl) | (share < lcl)).alias("out_of_control"),
        )
    )


@query("docs_dup_shardability")
def docs_dup_shardability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Can dedup shard by source? Near-duplicate groups (12-token
    prefix fingerprint, the decontamination key) classified as
    within-source vs cross-source — if cross-source dups are rare, the
    100 TB dedup can run per-source shards with a tiny cross-shard
    reconciliation pass; if common, it needs the global shuffle. One
    fingerprint groupBy carrying a distinct-source count, then a
    two-row rollup. ``source`` rides the fingerprint projection itself
    (row-wise map) instead of a join-back on doc_id (r10)."""
    from .functions.text import fingerprint

    docs = load(spark, sf_dir, "documents")
    fp = fingerprint(docs, prefix_tokens=12, extra_cols=("source",))
    groups = (
        fp.groupBy("fingerprint_md5")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("source").alias("n_sources"),
        )
        .filter(F.col("n") > 1)
    )
    scope = F.when(
        F.col("n_sources") == 1, F.lit("within_source")
    ).otherwise(F.lit("cross_source"))
    return groups.groupBy(scope.alias("dup_scope")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.col("n") - 1).alias("n_redundant_docs"),
    )


@query("events_lorenz_concentration")
def events_lorenz_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve concentration points: what share of all events the
    top 1 / 5 / 10 / 20 percent of users generate — the curve behind
    the Gini number, read directly by capacity and abuse teams. Rank
    and cumulative count both come from ONE two-pass range-partitioned
    prefix pass (ranking.global_running_sum over [count, 1] — no
    single-partition sort of the per-user aggregate); thresholds are a
    constant-width explode."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("c")
    ).withColumn("_one", F.lit(1))
    tot = per_user.agg(
        F.sum("c").alias("_t"), F.count(F.lit(1)).alias("_n")
    )
    ranked = (
        RK.global_running_sum(
            per_user,
            [F.desc("c"), F.asc("user_id")],
            ["_one", "c"],
            ["_r", "_cum"],
        )
        .crossJoin(F.broadcast(tot))
    )
    pct = F.explode(
        F.array(*[F.lit(x) for x in (1, 5, 10, 20)])
    ).alias("top_pct")
    fan = ranked.select("_r", "_cum", "_t", "_n", pct)
    k = F.greatest(
        F.floor(F.col("_n") * F.col("top_pct") / 100).cast("int"),
        F.lit(1),
    )
    return (
        fan.filter(F.col("_r") == k)
        .select(
            "top_pct",
            F.col("_r").cast("int").alias("n_top_users"),
            (
                F.col("_cum").cast("double") / F.col("_t").cast("double")
            ).alias("event_share"),
        )
    )


@query("docs_fingerprint_collision_rate")
def docs_fingerprint_collision_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How lossy is the compact 32-bit fingerprint key? Distinct md5
    fingerprints vs distinct 32-bit prefixes, and the number of 32-bit
    values shared by more than one md5 (true collisions) — the
    evaluation behind using the compact key for bucketing. One
    distinct + two grouped counts."""
    from .functions.text import fingerprint

    docs = load(spark, sf_dir, "documents")
    fp = fingerprint(docs).select(
        "fingerprint_md5", "fingerprint32"
    ).distinct()
    per32 = fp.groupBy("fingerprint32").agg(
        F.count(F.lit(1)).alias("n_md5")
    )
    return per32.agg(
        F.sum("n_md5").alias("distinct_md5"),
        F.count(F.lit(1)).alias("distinct_fp32"),
        F.sum(
            (F.col("n_md5") > 1).cast("bigint")
        ).alias("colliding_fp32"),
    )


@query("supplier_portfolio_breadth")
def supplier_portfolio_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier portfolio breadth histogram: how many suppliers ship 1,
    2, ... distinct parts — single-part specialists vs broad-line
    suppliers, the supply-base segmentation view. Two grouped counts
    on the fact table."""
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        F.count_distinct("l_partkey").alias("n_parts")
    )
    return per.groupBy("n_parts").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )


@query("events_session_type_lift")
def events_session_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types co-occur in the same session beyond chance:
    market-basket lift over islands sessions (baskets = distinct types
    per session, pairs ordered). The self-join keys on the session, so
    fan-out is bounded by types-per-session (<= 5), never by type
    popularity — the association view that catches 'errors cluster
    with purchases' patterns."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "_new",
        (
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
            )
        ).cast("int"),
    ).withColumn(
        "_sess",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # r15 restructure (guide §1.2 #1): the old shape derived pairs,
    # marginals and the basket total from an `items` distinct that fed
    # FOUR consumers — the profiler showed the whole sessionize window
    # pipeline computed TWICE per execution (column pruning makes the
    # consumers' subtrees differ, defeating exchange reuse) plus four
    # downstream shuffles and a self-join. Now: ONE sessionize pass ->
    # per-session sorted type set (collect_set absorbs the distinct) ->
    # one combined explode emitting, per basket, every ordered type
    # pair (ta < tb — identical to the old a.type < b.type self-join
    # count over distinct (sid, type)), every single type (ta, NULL)
    # (= the old marginal: one items row per (sid, type)), and one
    # (NULL, NULL) basket marker (= the old distinct-sid total) -> ONE
    # aggregation, localCheckpointed (it is tiny: <= |types|^2 rows) so
    # the three readers below do not re-run the pipeline. NULL
    # event_types: collect_set drops them, but the old query's NULL
    # marginal row never joined a pair row (pairs exclude NULL by the
    # `<` comparison) and the sid universe is unchanged, so results
    # are identical — oracle-verified at three SFs.
    baskets = flagged.groupBy(
        F.concat_ws("#", "user_id", "_sess").alias("sid")
    ).agg(F.sort_array(F.collect_set("event_type")).alias("_ts"))
    entries = baskets.select(
        F.explode(
            F.expr(
                """
                concat(
                  array(named_struct(
                    'ta', CAST(NULL AS STRING), 'tb', CAST(NULL AS STRING))),
                  transform(_ts, t -> named_struct(
                    'ta', t, 'tb', CAST(NULL AS STRING))),
                  flatten(transform(_ts, (x, i) ->
                    transform(slice(_ts, i + 2, size(_ts)), y ->
                      named_struct('ta', x, 'tb', y))))
                )
                """
            )
        ).alias("e")
    ).select("e.ta", "e.tb")
    g = (
        entries.groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint()
    )
    pairs = g.filter(
        F.col("ta").isNotNull() & F.col("tb").isNotNull()
    ).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("_cnt").alias("n_ab"),
    )
    marg = g.filter(
        F.col("ta").isNotNull() & F.col("tb").isNull()
    ).select(F.col("ta").alias("t"), F.col("_cnt").alias("n_t"))
    tot = g.filter(
        F.col("ta").isNull() & F.col("tb").isNull()
    ).select(F.col("_cnt").alias("_n"))
    return (
        pairs.join(
            F.broadcast(
                marg.withColumnRenamed("t", "type_a")
                .withColumnRenamed("n_t", "n_a")
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                marg.withColumnRenamed("t", "type_b")
                .withColumnRenamed("n_t", "n_b")
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (
                F.col("_n").cast("double") * F.col("n_ab").cast("double")
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                )
            ).alias("lift"),
        )
    )


@query("events_churn_risk")
def events_churn_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk list: users silent for >= 7 days at the end of the
    observation window, with their historical cadence (events per
    active day) — the re-engagement targeting query. Conditional
    aggregates per user plus one broadcast 1-row corpus max-date; risk
    tiers from exact day arithmetic."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_seen"),
        F.count_distinct(F.dayofmonth("ts")).alias("active_days"),
    )
    horizon = ev.agg(F.max("ts").alias("_end"))
    silent_days = F.floor(
        (
            F.unix_micros(F.col("_end"))
            - F.unix_micros(F.col("last_seen"))
        )
        / F.lit(86_400_000_000.0)
    ).cast("int")
    return (
        per_user.crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            "n_events",
            "active_days",
            silent_days.alias("silent_days"),
            (
                F.col("n_events").cast("double")
                / F.col("active_days").cast("double")
            ).alias("events_per_active_day"),
        )
        .filter(F.col("silent_days") >= 7)
    )


@query("orders_cohort_repeat")
def orders_cohort_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annual-cohort repeat curve: customers grouped by first-order
    year, tracked by how many are still ordering 1, 2, ... years later
    — the relational-side retention triangle (the events-side twin is
    events_cohort_retention). First-order year via one min-aggregate;
    the triangle is a distinct-count grid over (cohort, age)."""
    orders = load(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    aged = orders.join(first, "o_custkey").select(
        "cohort_year",
        (F.year("o_orderdate") - F.col("cohort_year")).alias("age_years"),
        "o_custkey",
    )
    return aged.groupBy("cohort_year", "age_years").agg(
        F.count_distinct("o_custkey").alias("active_customers")
    )


@query("events_user_icc")
def events_user_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation of value by user: how much of total value
    variance is BETWEEN users vs within them (ICC(1) from the one-way
    ANOVA decomposition) — high ICC means user-level features carry
    signal, near-zero means per-event modeling. Same exact-moment
    assembly as events_dow_anova, grouped by user instead of time."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).alias("s"),
        F.sum(dec("value") * dec("value")).alias("q"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("N"),
        F.sum("s").alias("S"),
        F.sum("q").alias("Q"),
        # pinned sorted fold: a raw double sum of the s^2/n terms is
        # partition-order-dependent (observed on the 150-user ICC), and
        # a decimal cast tie-breaks differently across engines on exact
        # half-digit values (the label_centroids hazard) — sorting the
        # terms and folding sequentially is deterministic AND portable
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    (
                        _wd(F.col("s"), 6)
                        * _wd(F.col("s"), 6)
                    )
                    / F.col("n").cast("double")
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ssb_raw"),
    )
    ssb = F.col("ssb_raw") - (
        _wd(F.col("S"), 6) * _wd(F.col("S"), 6)
    ) / F.col("N").cast("double")
    ssw = _wd(F.col("Q"), 12) - F.col("ssb_raw")
    msb = ssb / (F.col("k").cast("double") - F.lit(1.0))
    msw = ssw / (F.col("N").cast("double") - F.col("k").cast("double"))
    n0 = (F.col("N").cast("double") * F.col("N").cast("double")) / (
        F.col("N").cast("double") * F.col("k").cast("double")
    )
    return t.select(
        F.col("k").alias("n_users"),
        F.col("N").alias("n_events"),
        ((msb - msw) / (msb + (n0 - 1) * msw)).alias("icc"),
    )


@query("orders_month_seasonal_index")
def orders_month_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonal index: each calendar month's mean share
    of annual revenue vs 1/12 (index > 1 = peak month), averaged over
    the seven order years — the classical seasonal decomposition a
    demand planner starts from. Exact decimal sums; two tiny grouped
    aggregates after the first collapse."""
    orders = load(spark, sf_dir, "orders")
    ym = orders.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    ).agg(F.sum(dec("o_totalprice")).alias("_rev"))
    yr = ym.groupBy("y").agg(F.sum("_rev").alias("_yr"))
    share = F.col("_rev").cast("double") / F.col("_yr").cast("double")
    return (
        ym.join(F.broadcast(yr), "y")
        .select("m", share.alias("_share"))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_years"),
            (
                F.sum(F.col("_share").cast(DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(12.0)
            ).alias("seasonal_index"),
        )
    )


@query("lineitem_ship_lag_profile")
def lineitem_ship_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority: days between the
    order date and each lineitem's ship date, bucketed by week — the
    fulfillment-SLA histogram behind q4's late-count. One fact-fact
    join co-partitioned on the order key, exact day arithmetic."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    j = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    lag_weeks = F.floor(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) / 7
    ).cast("int")
    return j.groupBy(
        "o_orderpriority", lag_weeks.alias("lag_weeks")
    ).agg(F.count(F.lit(1)).alias("n_items"))


@query("events_first_session_conversion")
def events_first_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-session conversion: of users who ever purchase, what share
    converted inside their very first 30-min session — the activation
    quality number separating 'product sells itself' from 'needs
    nurture'. Sessions from the islands rule; firsts from conditional
    mins; one summary row."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "_new",
        (
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
            )
        ).cast("int"),
    ).withColumn(
        "_sess",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_user = flagged.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("_sess"))
        ).alias("first_purchase_sess")
    )
    converted = per_user.filter(
        F.col("first_purchase_sess").isNotNull()
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_converting_users"),
        F.sum(
            (F.col("first_purchase_sess") == 1).cast("bigint")
        ).alias("n_first_session"),
        (
            F.sum((F.col("first_purchase_sess") == 1).cast("bigint"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("first_session_share"),
    )


@query("orders_status_year_matrix")
def orders_status_year_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status aging matrix: status mix (O/F/P) per order year
    with within-year shares — old years should be ~all F; open orders
    concentrated in recent years is the healthy pattern, anything else
    is a stuck-workflow signal. Two grouped counts."""
    orders = load(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.year("o_orderdate").alias("year"), "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.groupBy("year").agg(F.sum("n").alias("_t"))
    return (
        cells.join(F.broadcast(tot), "year")
        .select(
            "year",
            "o_orderstatus",
            "n",
            (
                F.col("n").cast("double") / F.col("_t").cast("double")
            ).alias("year_share"),
        )
    )


@query("emb_1nn_label_consistency")
def emb_1nn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality via 1-NN consistency: for a deterministic probe
    panel (the 200 vectors with the smallest md5 hash buckets — a FIXED
    panel size at any corpus scale), does each probe's cosine nearest
    neighbor share its label? High agreement certifies the labels
    respect the embedding geometry before anyone trains a probe head.
    The capped panel bounds the exact scan at 200 x corpus rows and
    keeps the broadcast side O(1) in SF (VERDICT r11 finding 1 — the
    old vec_id % 10 panel was 10% of the corpus, an unbounded broadcast
    and a 0.1*N^2 intermediate). Panel membership is a pure function of
    vec_id (hash_bucket, then vec_id tie-break), so it is reproducible
    across runs, partitionings, and engines; the DuckDB oracle computes
    the identical panel. Spark compiles orderBy().limit() to
    TakeOrderedAndProject: per-partition top-200, driver merge of
    200/partition — no global sort. Ties break by neighbor id; shares
    are exact-int divisions. Shared implementation:
    functions/similarity.py label_consistency_1nn (also exercised by
    tools/scale_smoke_ann.py on the 10x/100x/1000x amplified corpus)."""
    return S.label_consistency_1nn(
        load(spark, sf_dir, "embeddings"), panel_n=200
    )


@query("orders_basket_size_trend")
def orders_basket_size_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size trend: average lineitems per order by order year
    (exact integer ratio) — the simplest demand-shape drift signal.
    One co-partitioned fact-fact count then a per-year combine."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items")
    )
    j = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey
    )
    return j.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n_items").alias("n_items"),
        (
            F.sum("n_items").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_items_per_order"),
    )


@query("supplier_quartile_mobility")
def supplier_quartile_mobility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue-rank mobility: quartile (by shipped revenue) in
    1996 vs quartile in 1999, as a transition matrix — a diagonal-heavy
    matrix means a static supply base, off-diagonal churn means rank
    volatility. Exact decimal revenue; each year's quartile assignment
    uses ranking.global_ntile's two-pass range-partitioned rank (same
    split as the ntile(4) window, no single-partition sort of the
    per-supplier aggregate)."""
    li = load(spark, sf_dir, "lineitem")

    def year_quartile(y):
        rev = (
            li.filter(F.year("l_shipdate") == y)
            .groupBy("l_suppkey")
            .agg(F.sum(dec("l_extendedprice")).alias("_rev"))
        )
        return RK.global_ntile(
            rev, ["_rev", "l_suppkey"], 4, f"q{y}"
        ).select("l_suppkey", f"q{y}")
    a = year_quartile(1996)
    b = year_quartile(1999)
    return (
        a.join(b, "l_suppkey")
        .groupBy("q1996", "q1999")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
