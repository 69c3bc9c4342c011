"""DuckDB oracle SQL, one entry per query in ``queries.QUERIES``.

Each statement runs against the driver's pre-registered views (region,
nation, customer, supplier, part, orders, lineitem, events, documents,
embeddings) and must match the Spark result exactly: same column names,
same types (cast deliberately), same deterministic tie-breaks, and
bit-identical doubles (exact DECIMAL arithmetic cast to double at the end;
dyadic rationals for synthesized values).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

# Shared synthesis CTEs (contract documented in synth.py): one reading per
# (station, second) with eid = min(event_id); per-lane values from integer
# modulus / dyadic-rational arithmetic so the CSV string round-trip is exact.
_TRAFFIC_LANES_CTE = """
readings AS (
    SELECT CAST(user_id % 50 AS INTEGER) AS station,
           date_trunc('second', ts) AS ts_sec,
           min(event_id) AS eid
    FROM events
    GROUP BY 1, 2
),
lanes AS (
    SELECT
        'S' || lpad(CAST(station AS VARCHAR), 3, '0') AS station_id,
        'lane' || CAST(i.i AS VARCHAR) AS lane,
        CAST(i.i AS INTEGER) AS lane_idx,
        (['N','S','E','W'])[CAST(eid % 4 AS INTEGER) + 1] AS direction,
        CAST(eid % 5 AS VARCHAR) AS freeway,
        strftime(ts_sec, '%m/%d/%Y %H:%M:%S') AS recorded_timestamp,
        CAST((eid * i.i) % 100 AS INTEGER) AS lane_flow,
        CAST((eid * 7 + i.i) % 128 AS DOUBLE) / 128.0 AS lane_avg_occ,
        40.0 + CAST((eid * 13 + i.i * 5) % 512 AS DOUBLE) / 8.0 AS lane_avg_speed,
        CAST(eid % 300 AS INTEGER) AS total_flow,
        ts_sec
    FROM readings, generate_series(1, 8) AS i(i)
)
"""

# Deterministic max-by key (SURVEY.md §2.4): lexicographic on
# (zero-padded lane_flow, lane_idx, recorded_timestamp) == the Spark
# operator's struct(lane_flow, lane_idx, recorded_timestamp) ordering for
# non-negative flows; unique per group because (station, second) readings
# are deduplicated in synthesis.
_MAXBY_KEY = (
    "lpad(CAST(lane_flow AS VARCHAR), 10, '0') "
    "|| CAST(lane_idx AS VARCHAR) || recorded_timestamp"
)


def _traffic_max_sql(window_sql: str) -> str:
    return f"""
WITH {_TRAFFIC_LANES_CTE},
win AS (
    SELECT l.*, {window_sql} AS window_timestamp
    FROM lanes l{", generate_series(0, 59) AS k(k)" if "k.k" in window_sql else ""}
)
SELECT
    station_id,
    arg_max(direction, {_MAXBY_KEY}) AS direction,
    arg_max(freeway, {_MAXBY_KEY}) AS freeway,
    arg_max(lane_flow, {_MAXBY_KEY}) AS lane_max_flow,
    arg_max(lane, {_MAXBY_KEY}) AS lane,
    arg_max(lane_avg_occ, {_MAXBY_KEY}) AS avg_occ,
    arg_max(lane_avg_speed, {_MAXBY_KEY}) AS avg_speed,
    arg_max(total_flow, {_MAXBY_KEY}) AS total_flow,
    arg_max(recorded_timestamp, {_MAXBY_KEY}) AS recorded_timestamp,
    window_timestamp
FROM win
GROUP BY station_id, window_timestamp
"""


# sliding 60-minute windows every 1 minute, epoch-aligned (Spark F.window)
ORACLES["traffic_max_lane_flow"] = _traffic_max_sql(
    "make_timestamp(CAST((floor(epoch(ts_sec) / 60) * 60 - k.k * 60 + 3600)"
    " * 1000000 AS BIGINT))"
)

# tumbling 60-minute windows
ORACLES["traffic_max_lane_flow_tumbling"] = _traffic_max_sql(
    "make_timestamp(CAST((floor(epoch(ts_sec) / 3600) * 3600 + 3600)"
    " * 1000000 AS BIGINT))"
)

ORACLES["traffic_lane_info"] = f"""
WITH {_TRAFFIC_LANES_CTE}
SELECT station_id, lane, lane_idx, direction, freeway, recorded_timestamp,
       lane_flow, lane_avg_occ, lane_avg_speed, total_flow,
       ts_sec AS event_ts
FROM lanes
"""

ORACLES["starter_pipeline"] = """
SELECT upper(v) AS value FROM (VALUES ('Hello'), ('World')) t(v)
"""

ORACLES["events_tumbling_agg"] = """
SELECT
    date_trunc('hour', ts) AS window_start,
    date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
    event_type,
    count(*) AS n_events,
    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value,
    CAST(min(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value,
    CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value
FROM events
GROUP BY 1, 2, 3
"""

ORACLES["events_sliding_agg"] = """
WITH win AS (
    SELECT e.*,
           make_timestamp(CAST((floor(epoch(ts) / 900) * 900 - k.k * 900)
                               * 1000000 AS BIGINT)) AS window_start
    FROM events e, generate_series(0, 3) AS k(k)
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM win
GROUP BY 1, 2, 3
"""

# session windows: gaps-and-islands; new session when the gap is
# STRICTLY > 30 min — F.session_window merges on inclusive interval
# touch, so two events exactly gap apart are ONE session (pinned by the
# r14 tie probe, tests/test_session_tie_parity.py; the old >= here
# split at the tie and only passed because the fixture never produces
# an exact 1800 s gap). Spark session windows are half-open
# [start, last_ts + gap).
ORACLES["events_sessionize"] = """
WITH flagged AS (
    SELECT user_id, ts, CAST(value AS DECIMAL(18,6)) AS v,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       CAST(sum(v) AS DOUBLE) AS sum_value,
       min(ts) AS first_event_ts,
       max(ts) AS last_event_ts
FROM sessions
GROUP BY user_id, sess_id
"""

# exact-decimal money arithmetic; scales chosen so every product stays
# exact in both engines (see queries.py DEC discipline)
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (CAST(1 AS DECIMAL(7,6)) - CAST(l_discount AS DECIMAL(8,6)))"
)

ORACLES["q1_pricing_summary"] = f"""
SELECT
    l_returnflag,
    l_linestatus,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
    CAST(sum({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
    CAST(sum({_DISC_PRICE} * (CAST(1 AS DECIMAL(7,6)) + CAST(l_tax AS DECIMAL(8,6)))) AS DOUBLE) AS sum_charge,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
    count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q3_shipping_priority"] = f"""
SELECT
    l_orderkey,
    CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue,
    o_orderdate,
    o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

ORACLES["q5_local_supplier_volume"] = f"""
SELECT n_name,
       CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""

# ------------------------------------------------------- text / dedup / sim
# Shared fragments mirroring functions/text.py + functions/dedup.py +
# functions/similarity.py exactly: same tokenizer, same md5-derived 32-bit
# hash, same pinned left-fold order for double sums (bit-exact parity).

_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)
_TOKS_CTE = f"toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)"


def fpsum(expr: str) -> str:
    """Fixed-point deterministic sum (mirror of numerics.fixed_point_sum):
    floor-quantize each double term to the 1e-12 grid, sum exactly as
    integers, divide back — order-independent and bit-identical to the
    Spark side, with O(1) aggregation state instead of a sorted
    collect-fold of the whole group.

    The integer sum accumulates in HUGEINT and reaches DOUBLE through
    the compensated nearest-double conversion (via DECIMAL(38,0) and
    ``_dec_int_to_double_sql``): DuckDB's raw wide-int->DOUBLE cast is
    not correctly rounded (observed truncating, e.g.
    -9007601624385538 -> -9007601624385536.0) while Spark's
    DECIMAL->DOUBLE rounds to nearest — with a raw cast the engines
    diverge by 1 ulp whenever |group sum| > ~9007. An earlier mirror
    narrowed through BIGINT instead (correctly rounded but capping the
    oracle's domain at |group sum| < ~9.2e6, a cliff a 10M-row ln-count
    group would hit); the compensated cast is exact-identical to
    Spark's for |scaled sum| < ~2e31, i.e. |group sum| < ~2e19, with
    ~1e-31 relative drift at most beyond."""
    i = (
        "CAST(sum(CAST(floor((" + expr + ") * 1e12) AS HUGEINT)) "
        "AS DECIMAL(38,0))"
    )
    return f"({_dec_int_to_double_sql(i)} / 1e12)"


def _dec_int_to_double_sql(col: str) -> str:
    """Mirror of numerics.dec_int_to_double: nearest-double of an
    integer-valued DECIMAL(38,0) column. DuckDB's raw int128->double
    conversion is NOT correctly rounded (two-limb assembly; ~2% of a
    2,928-value 54..126-bit property sweep was 1 ulp off), so compensate:
    ``hi`` is DuckDB's own cast, the residual ``col - decimal(hi)`` is
    EXACT (DuckDB's double->decimal is binary-exact, and the residual is
    small enough to convert exactly), and the final IEEE addition is
    correctly rounded — the result is nearest(col) regardless of how
    ``hi`` rounded. The Spark side is a PLAIN cast: its scale-0
    decimal->double is already correctly rounded, and this compensation
    would corrupt it there (Spark's double->decimal goes through
    Double.toString, not the exact binary value). Sweep-verified equal to
    Python's correctly-rounded float() on both engines."""
    return (
        f"(CAST({col} AS DOUBLE) + CAST({col} - "
        f"CAST(CAST({col} AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE))"
    )


def _dec_wide_to_double_sql(col: str, frac_digits: int) -> str:
    """Mirror of numerics.dec_wide_to_double: portable double of a wide
    decimal sum with ``frac_digits`` of true decimal content. Narrows to
    DECIMAL(38-shift_digits, frac) first — DuckDB errors when a product's
    combined precision exceeds 38, so the narrowing buys room for the
    exact scale-shift multiply (bounding the domain at 10^(38-shift-frac)
    integer digits, enforced loudly) — then shifts to a scale-0 integer,
    converts via the compensated nearest-double cast, and divides by the
    exact power-of-ten double."""
    remaining = frac_digits
    cur = col
    # Shift in <=6-digit chunks with re-narrowing between steps (DuckDB
    # errors when a product's p1+p2 exceeds 38); domain |value| < ~1e19.
    while remaining > 0:
        step = min(6, remaining)
        m = 10**step
        sd = len(str(m))
        cur = (
            f"CAST(CAST({cur} AS DECIMAL({38 - sd},{remaining})) "
            f"* CAST({m} AS DECIMAL({sd},0)) "
            f"AS DECIMAL(38,{remaining - step}))"
        )
        remaining -= step
    i = f"CAST({cur} AS DECIMAL(38,0))"
    return f"({_dec_int_to_double_sql(i)} / {float(10**frac_digits)!r})"


def _hash32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# distinct 3-word shingles per doc (dedup.shingles, k=3); scalar range()
# returns a list, so the shingle enumeration stays expression-level
# (DuckDB's generate_series table function can't see lateral columns)
_SHINGLES_CTE = f"""{_TOKS_CTE},
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS shingle
    FROM toks
    WHERE len(t) >= 3
)"""

ORACLES["text_token_stats"] = f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct_tokens,
       CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
           / len(t) AS avg_token_len,
       CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS type_token_ratio
FROM documents JOIN toks USING (doc_id)
"""

_SW = {
    "de": ("der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
}


def _hits(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in _SW[lang])
    return f"len(list_filter(t, x -> list_contains([{arr}], x)))"


ORACLES["text_language_id"] = f"""
WITH {_TOKS_CTE},
h AS (
    SELECT doc_id,
           {", ".join(f"{_hits(lang)} AS hits_{lang}" for lang in sorted(_SW))}
    FROM toks
)
SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
       CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
            {" ".join(f"WHEN hits_{lang} = greatest(hits_de, hits_en, hits_es, hits_fr) THEN '{lang}'" for lang in sorted(_SW))}
       END AS lang_pred
FROM h
"""

ORACLES["text_quality_score"] = f"""
WITH {_TOKS_CTE},
m AS (
    SELECT d.doc_id,
           length(text) AS _len,
           len(t) AS _nt,
           {_hits("en")} AS _stop,
           length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS _punct,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS _digit
    FROM documents d JOIN toks USING (doc_id)
)
SELECT doc_id,
       CAST(_stop AS DOUBLE) / greatest(_nt, 1) AS stopword_ratio,
       CAST(_punct AS DOUBLE) / greatest(_len, 1) AS punct_ratio,
       CAST(_digit AS DOUBLE) / greatest(_len, 1) AS digit_ratio,
       least(CAST(_nt AS DOUBLE) / 256.0, 1.0) AS length_saturation,
       (CAST(_stop AS DOUBLE) / greatest(_nt, 1)) * 0.5
         + (1.0 - CAST(_punct AS DOUBLE) / greatest(_len, 1)) * 0.25
         + least(CAST(_nt AS DOUBLE) / 256.0, 1.0) * 0.25
         - (CAST(_digit AS DOUBLE) / greatest(_len, 1)) * 0.125 AS quality_score
FROM m
"""

ORACLES["text_fingerprint"] = f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       md5(array_to_string(t, ' ')) AS fingerprint_md5,
       {_hash32_sql("array_to_string(t, ' ')")} AS fingerprint32
FROM toks
"""

# chunking: starts step by stride while <= n_tokens; final chunks short.
# DuckDB list slicing t[a:b] is 1-based inclusive and clamps at the end,
# mirroring Spark's F.slice(_t, s, 64).
ORACLES["text_chunks"] = f"""
WITH {_TOKS_CTE},
starts AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, 48)) AS s
    FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST((s - 1) / 48 AS INTEGER) AS chunk_idx,
       array_to_string(t[s : s + 63], ' ') AS chunk_text,
       CAST(least(64, len(t) - s + 1) AS BIGINT) AS n_chunk_tokens
FROM starts
"""

ORACLES["text_salient_terms"] = f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
               / CAST(df.df AS DOUBLE) AS salience
    FROM tf JOIN df USING (term), n
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY salience DESC, term ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, salience, rank FROM ranked WHERE rank <= 3
"""

ORACLES["text_vocab_top_terms"] = f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
per_doc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
stats AS (
    SELECT term, count(*) AS doc_freq, CAST(sum(tf) AS BIGINT) AS total_tf
    FROM per_doc GROUP BY term
),
ranked AS (
    SELECT *, CAST(row_number() OVER (ORDER BY doc_freq DESC, term ASC)
                   AS INTEGER) AS rank
    FROM stats
)
SELECT term, doc_freq, total_tf, rank FROM ranked WHERE rank <= 100
"""


# deterministic sampling: same md5 bucket arithmetic as functions/sampling.py
def _bucket_sql(salt: str, key: str = "doc_id") -> str:
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))"
        " AS BIGINT) % 10000"
    )


ORACLES["docs_hash_sample"] = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_bucket_sql("sample")} < 1000
"""

ORACLES["docs_train_test_split"] = f"""
SELECT doc_id, lang,
       CASE WHEN {_bucket_sql("split")} < 2000
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""

ORACLES["docs_stratified_sample"] = f"""
SELECT lang, count(*) AS n_docs
FROM documents
WHERE {_bucket_sql("strata")}
      < (CASE WHEN lang = 'en' THEN 1000 ELSE 5000 END)
GROUP BY lang
"""


def _pivot_sum(t: str) -> str:
    return (
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN"
        f" CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_{t}"
    )


ORACLES["events_pivot_by_type"] = f"""
SELECT user_id,
       {", ".join(_pivot_sum(t) for t in ("click", "error", "purchase", "signup", "view"))}
FROM events
GROUP BY user_id
"""

ORACLES["lineitem_unpivot_measures"] = """
WITH base AS (
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS quantity,
           CAST(l_extendedprice AS DOUBLE) AS extendedprice,
           CAST(l_discount AS DOUBLE) AS discount
    FROM lineitem WHERE l_orderkey <= 100
)
SELECT l_orderkey, l_linenumber, 'quantity' AS measure, quantity AS val FROM base
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice', extendedprice FROM base
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', discount FROM base
"""

# DuckDB has no width_bucket; the closed-form equivalent for values in
# [lo, hi): 1 + floor((v - lo) / bin_width)
ORACLES["part_price_histogram"] = """
SELECT CAST(1 + floor((p_retailprice - 900.0) / 5.0) AS BIGINT) AS bucket,
       count(*) AS n_parts,
       min(p_retailprice) AS min_price,
       max(p_retailprice) AS max_price
FROM part
GROUP BY 1
"""

ORACLES["docs_source_domains"] = """
SELECT regexp_extract(source, '^([a-z]+)', 1) AS prefix,
       CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 4 AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""

ORACLES["supplier_name_near_dups"] = """
SELECT a.s_nationkey, a.s_suppkey AS key_a, b.s_suppkey AS key_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS edit_dist
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
"""

ORACLES["nation_segments_agg"] = """
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
           AS segments,
       count(*) AS n_customers
FROM customer
GROUP BY c_nationkey
"""

# curation composition: exact-dedup reps ∩ quality gate ∩ 50% sample,
# mirroring each stage's library contract
ORACLES["docs_curation_pipeline"] = f"""
WITH {_TOKS_CTE},
reps AS (
    SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
m AS (
    SELECT d.doc_id,
           length(text) AS _len,
           len(t) AS _nt,
           {_hits("en")} AS _stop,
           length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS _punct,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS _digit
    FROM documents d JOIN toks USING (doc_id)
),
quality AS (
    SELECT doc_id FROM m
    WHERE (CAST(_stop AS DOUBLE) / greatest(_nt, 1)) * 0.5
          + (1.0 - CAST(_punct AS DOUBLE) / greatest(_len, 1)) * 0.25
          + least(CAST(_nt AS DOUBLE) / 256.0, 1.0) * 0.25
          - (CAST(_digit AS DOUBLE) / greatest(_len, 1)) * 0.125 >= 0.3
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE doc_id IN (SELECT doc_id FROM reps)
  AND doc_id IN (SELECT doc_id FROM quality)
  AND {_bucket_sql("curate")} < 5000
GROUP BY lang
"""

ORACLES["orders_monthly_growth"] = """
WITH monthly AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
)
SELECT month,
       CAST(rev AS DOUBLE) AS revenue,
       n_orders,
       CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_delta
FROM monthly
"""

# per-language prefix-sum packing (functions/packing.py): start_offset =
# sum of earlier docs' token counts in doc_id order; window b holds tokens
# [b*256, (b+1)*256)
ORACLES["docs_pack_budget"] = f"""
WITH {_TOKS_CTE},
base AS (
    SELECT d.lang AS "group", d.doc_id, CAST(len(t) AS BIGINT) AS n_tokens
    FROM documents d JOIN toks USING (doc_id)
    WHERE len(t) > 0
),
offs AS (
    SELECT *,
           CAST(sum(n_tokens) OVER (PARTITION BY "group" ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                AS BIGINT) AS start_offset
    FROM base
)
SELECT "group", doc_id, n_tokens, start_offset,
       CAST(floor(start_offset / 256) AS BIGINT) AS first_bin,
       CAST(floor((start_offset + n_tokens - 1) / 256) AS BIGINT) AS last_bin,
       CAST(floor((start_offset + n_tokens - 1) / 256)
            - floor(start_offset / 256) + 1 AS BIGINT) AS n_bins
FROM offs
"""

# long-form label centroids: fixed-point sum (floor-quantized integer
# addition) mirrors functions/similarity.label_centroids bit-exactly
# with O(1) aggregation state on both sides
ORACLES["emb_label_centroids"] = f"""
WITH comp AS (
    SELECT label,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
)
SELECT label, pos,
       {fpsum('v')} / count(*) AS centroid,
       count(*) AS n_vectors
FROM comp
GROUP BY label, pos
"""

ORACLES["dedup_exact"] = """
SELECT min(doc_id) AS doc_id, md5(text) AS content_md5, count(*) AS n_dups
FROM documents
GROUP BY md5(text)
"""

ORACLES["dedup_exact_normalized"] = f"""
WITH {_TOKS_CTE}
SELECT min(doc_id) AS doc_id,
       md5(array_to_string(t, ' ')) AS norm_md5,
       count(*) AS n_dups
FROM toks
GROUP BY md5(array_to_string(t, ' '))
"""

_N_MINHASH, _BAND = 16, 4
# two-word universal scheme (dedup.minhash_signatures): one md5 per
# shingle, h_i = (h1 + i*h2) mod 2^32
_H1 = "CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)"
_H2 = "CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT)"
_SIG_COLS = ", ".join(
    f"min(({_H1} + {i} * {_H2}) % 4294967296) AS mh{i}"
    for i in range(_N_MINHASH)
)
_BAND_MATCH = " OR ".join(
    "("
    + " AND ".join(
        f"a.mh{b * _BAND + r} = b.mh{b * _BAND + r}" for r in range(_BAND)
    )
    + ")"
    for b in range(_N_MINHASH // _BAND)
)
_EQ_SUM = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(_N_MINHASH)
)

ORACLES["dedup_minhash_lsh"] = f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({_EQ_SUM} AS DOUBLE) / {_N_MINHASH} AS est_jaccard
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
"""

# Exact Jaccard evaluated only on the MinHash-LSH candidate pairs —
# mirrors queries.dedup_jaccard_pairs (LSH generates, exact verifies).
ORACLES["dedup_jaccard_pairs"] = f"""
WITH {_SHINGLES_CTE},
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
inter AS (
    SELECT p.doc_a, p.doc_b, count(*) AS n_common
    FROM pairs p
    JOIN sh a ON a.doc_id = p.doc_a
    JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.2
"""

_BITS = 32
_BIT_SUMS = ", ".join(
    f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(_BITS)
)
_SIMHASH = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
    for j in range(_BITS)
)

ORACLES["dedup_simhash_pairs"] = f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
hashed AS (SELECT doc_id, {_hash32_sql("tk")} AS h FROM tok),
bits AS (SELECT doc_id, {_BIT_SUMS} FROM hashed GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIMHASH} AS simhash FROM bits)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ------------------------------------------------------------- multimodal
# The media table is synthesized from documents (payload = UTF-8 text
# bytes), so md5(text) over VARCHAR equals Python hashlib.md5(payload) —
# verified byte parity for the ASCII corpus.

_MEDIA_TYPE = (
    "(['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1]"
)

ORACLES["mm_media_metadata"] = f"""
SELECT doc_id,
       {_MEDIA_TYPE} AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""

ORACLES["mm_frame_sample"] = """
WITH f AS (
    SELECT doc_id, text,
           unnest(range(0, octet_length(encode(text)) % 5 + 1)) AS frame_idx
    FROM documents
)
SELECT doc_id, frame_idx,
       md5(text || CAST(frame_idx AS VARCHAR)) AS frame_md5
FROM f
"""


def _md5_byte(n: int) -> str:
    return f"CAST(('0x' || substr(md5(text), {2 * n + 1}, 2)) AS INTEGER)"


ORACLES["mm_decode_fake"] = f"""
SELECT doc_id,
       {_MEDIA_TYPE} AS media_type,
       CAST(1 + {_md5_byte(0)} % 64 AS INTEGER) AS width,
       CAST(1 + {_md5_byte(1)} % 64 AS INTEGER) AS height,
       CAST(1 + {_md5_byte(2)} % 4 AS INTEGER) AS channels
FROM documents
"""


# pinned left-fold dot/norm (functions/similarity.py: F.aggregate fold order)
def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}),"
        " x -> x[1] * x[2])), (acc, x) -> acc + x)"
    )


def _norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform({a},"
        " x -> x * x)), (acc, x) -> acc + x))"
    )


def _cosine(a: str, b: str) -> str:
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


_COS = _cosine("qv", "cv")

ORACLES["sim_cosine_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id, {_COS} AS cosine_sim
    FROM c, q WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def _plane_literal(plane_id: int, dim: int = 64) -> str:
    # mirror similarity.hyperplane exactly (dyadic rationals -> exact doubles)
    vals = [
        ((plane_id * 73856093 + d * 19349663 + 83492791) % 2000 - 1000) / 1024.0
        for d in range(dim)
    ]
    return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"


def _bucket_expr(n_planes: int, offset: int = 0, vec: str = "v") -> str:
    """Sign-projection bucket id over planes [offset, offset + n_planes) —
    mirrors similarity.lsh_bucket(vec, n_planes, dim, plane_offset)."""
    return " + ".join(
        f"(CASE WHEN {_dot(vec, _plane_literal(offset + p))} >= 0"
        f" THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        for p in range(n_planes)
    )


_BUCKET = _bucket_expr(8)

ORACLES["sim_lsh_topk"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_BUCKET} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b),
scored AS (
    SELECT query_id, neighbor_id, {_COS} AS cosine_sim
    FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""

# Multi-table LSH near-dup — mirrors similarity.multi_lsh_near_dup_pairs
# (8 tables x 4 planes, disjoint plane sets, candidates = shared bucket in
# any table, exact cosine re-rank).
_MT_TABLES, _MT_PLANES = 8, 4
_MT_BUCKETS = "\n    UNION ALL ".join(
    f"SELECT vec_id, {t} AS table_id,"
    f" {_bucket_expr(_MT_PLANES, t * _MT_PLANES)} AS bucket FROM e"
    for t in range(_MT_TABLES)
)

ORACLES["sim_embedding_near_dup"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (
    {_MT_BUCKETS}
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
    FROM b a JOIN b bb
      ON a.table_id = bb.table_id AND a.bucket = bb.bucket
     AND a.vec_id < bb.vec_id
)
SELECT id_a, id_b, {_cosine("ea.v", "eb.v")} AS cosine_sim
FROM cand
JOIN e ea ON ea.vec_id = id_a
JOIN e eb ON eb.vec_id = id_b
WHERE {_cosine("ea.v", "eb.v")} >= 0.4
"""

ORACLES["top_customers_per_nation"] = """
WITH ranked AS (
    SELECT c_nationkey, c_custkey, c_name, c_acctbal,
           CAST(row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey ASC)
                AS INTEGER) AS rank_in_nation
    FROM customer
)
SELECT * FROM ranked WHERE rank_in_nation <= 3
"""

# ------------------------------------------------- relational breadth (§2.1)

ORACLES["q6_forecast_revenue"] = """
SELECT
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
             * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
    count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["q4_late_shipment_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
"""

ORACLES["q13_customer_order_distribution"] = """
WITH per_cust AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN (
        SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT'
    ) o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""

ORACLES["q16_parts_never_ordered"] = """
SELECT p_brand, count(*) AS never_ordered
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 40
)
GROUP BY p_brand
"""

ORACLES["q22_idle_rich_customers"] = """
WITH avg_bal AS (
    SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) / count(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE CAST(c_acctbal AS DECIMAL(18,6)) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""

ORACLES["q10_returned_items"] = f"""
SELECT c_custkey, c_name,
       CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["q15_top_supplier"] = f"""
WITH revenue AS (
    SELECT l_suppkey, sum({_DISC_PRICE}) AS r
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM revenue)
ORDER BY s_suppkey
"""

ORACLES["q17_small_quantity_revenue"] = """
WITH avg_q AS (
    SELECT l_partkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) / count(*)
                AS DECIMAL(18,6)) AS aq
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
            / CAST(7 AS DECIMAL(18,6)) AS DOUBLE) AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_q ON avg_q.l_partkey = lineitem.l_partkey
WHERE p_brand = 'BRAND_1'
  AND CAST(l_quantity AS DECIMAL(18,6))
      < CAST(0.2 AS DECIMAL(18,6)) * aq
"""

ORACLES["q19_disjunctive_predicates"] = f"""
SELECT CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'BRAND_1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
   OR (p_brand = 'BRAND_2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
   OR (p_brand = 'BRAND_3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
"""

ORACLES["q8_market_share"] = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(coalesce(sum(CASE WHEN n1.n_name = 'NATION_1'
                              THEN {_DISC_PRICE} END), 0) AS DOUBLE)
           / CAST(sum({_DISC_PRICE}) AS DOUBLE) AS mkt_share,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""

ORACLES["distinct_order_priorities"] = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""

ORACLES["set_ops_customer_cohorts"] = """
WITH a AS (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
b AS (
    SELECT DISTINCT o_custkey AS c_custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
)
SELECT 'union' AS op, c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'except' AS op, c_custkey
FROM (SELECT DISTINCT * FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
"""

# dynamic-gap sessions: interval-merge islands — new session when ts
# STRICTLY clears the running max of previous (ts + own gap); end = max
# end. Strict > because F.session_window merges when ts lands exactly
# on the previous end (inclusive touch; r14 tie probe,
# tests/test_session_tie_parity.py — the old >= split at the tie).
ORACLES["events_sessionize_dynamic"] = """
WITH g AS (
    SELECT user_id, ts,
           ts + CASE WHEN event_type = 'purchase'
                     THEN INTERVAL 60 MINUTE
                     ELSE INTERVAL 30 MINUTE END AS ts_end
    FROM events
),
m AS (
    SELECT *,
           max(ts_end) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max_end
    FROM g
),
flagged AS (
    SELECT *, CASE WHEN prev_max_end IS NULL OR ts > prev_max_end
                   THEN 1 ELSE 0 END AS new_sess
    FROM m
),
sessions AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts_end) AS session_end,
       count(*) AS n_events,
       min(ts) AS first_event_ts,
       max(ts) AS last_event_ts
FROM sessions
GROUP BY user_id, sid
"""

# exact ranking oracle: with 5 distinct values approx_top_k tracks all
# items exactly, so sketch == exact counts
ORACLES["events_top_types_sketch"] = """
SELECT event_type, count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY n_events DESC, event_type ASC
"""

ORACLES["events_funnel"] = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts >= s1.t1
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
    GROUP BY e.user_id
)
SELECT count(*) AS n_viewed,
       count(t2) AS n_clicked_after_view,
       count(t3) AS n_purchased_after_click
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""

ORACLES["grouping_sets_revenue"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
           AS grouping_level
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLES["events_lead_lag_ntile"] = """
SELECT event_type, event_id, value AS v,
       lag(value) OVER w AS prev_v,
       lead(value) OVER w AS next_v,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM events
WHERE event_type = 'signup'
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""

# Spark's grouping_id() for rollup(a, b): 0 = (a,b), 1 = (a), 3 = ()
ORACLES["rollup_revenue"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
           AS grouping_level
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# ------------------------------------------------------- temporal joins

# As-of: DuckDB's native ASOF JOIN, right side pre-deduped per (user, ts)
# by greatest event_id — the operator's documented tie-break.
ORACLES["events_asof_join"] = """
WITH purchases AS (
    SELECT user_id, ts,
           arg_max(event_id, event_id) AS event_id,
           arg_max(value, event_id) AS value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
),
clicks AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id AS click_id,
       c.user_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       p.event_id AS purchase_id,
       p.value AS purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""

ORACLES["events_range_join"] = """
WITH clicks AS (
    SELECT event_id AS click_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
),
bursts AS (
    SELECT event_id AS burst_id, ts AS burst_start,
           ts + INTERVAL 1 HOUR AS burst_end
    FROM events WHERE event_type = 'error' AND value > 90
)
SELECT c.click_id, c.click_ts, b.burst_id, b.burst_start, b.burst_end
FROM clicks c JOIN bursts b
  ON c.click_ts >= b.burst_start AND c.click_ts < b.burst_end
"""

# IVF: identical deterministic coarse quantization (seed centroids =
# vec_id < 16; nearest-by-cosine, smallest cid on ties via lexicographic
# [cos, -cid] arg_max), probe 4 lists, exact re-rank.
ORACLES["sim_ivf_topk"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
assign_scored AS (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cosine("e.v", "c.cv")} DESC, c.cid ASC
           ) AS rn
    FROM e, cents c
),
assign AS (SELECT vec_id, v, cid AS list_id FROM assign_scored WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
probe_scored AS (
    SELECT q.query_id, q.qv, c.cid,
           row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {_cosine("q.qv", "c.cv")} DESC, c.cid ASC
           ) AS pr
    FROM q, cents c
),
probes AS (
    SELECT query_id, qv, cid AS list_id FROM probe_scored WHERE pr <= 4
),
scored AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           {_cosine("p.qv", "a.v")} AS cosine_sim
    FROM assign a JOIN probes p ON a.list_id = p.list_id
    WHERE a.vec_id <> p.query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""

# Gap-session throttle: first event of each 30-minute session per
# (user_id, event_type); every event refreshes the clock (lag-based).
ORACLES["events_throttle"] = """
WITH ordered AS (
    SELECT event_id, user_id, event_type, ts, value,
           lag(ts) OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) AS prev_ts
    FROM events
)
SELECT event_id, user_id, event_type, ts, value
FROM ordered
WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
"""

ORACLES["mm_extract_features"] = f"""
SELECT doc_id,
       {_MEDIA_TYPE} AS media_type,
       {", ".join(f"CAST(('0x' || substr(md5(text), {2 * j + 1}, 2)) AS INTEGER) / 255.0 AS f{j}" for j in range(8))}
FROM documents
"""

ORACLES["events_user_stats"] = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""

ORACLES["text_bpe_tokens"] = r"""
WITH p AS (
    SELECT doc_id, text,
           len(regexp_extract_all(lower(text),
               ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+')) AS n
    FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS DOUBLE) / n AS chars_per_token
FROM p
"""

# per-user z-score with exact-decimal moments; the double expressions
# mirror queries.events_user_zscore shape-for-shape
ORACLES["events_variant_props"] = """
WITH k AS (
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(k AS DECIMAL(18,6))) AS DOUBLE) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM k
GROUP BY event_type
"""

ORACLES["events_user_zscore"] = """
WITH stats AS (
    SELECT user_id,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,6))) AS s1,
           sum(CAST(CAST(value AS DECIMAL(18,6))
                    * CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,12))) AS s2
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    HAVING count(*) >= 2
)
SELECT e.user_id, e.event_id,
       e.value AS raw_value,
       (CAST(e.value AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
           / sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n))
                  / (n - 1)) AS zscore
FROM events e JOIN stats USING (user_id)
WHERE e.event_type = 'purchase'
"""

# Bound-assertion oracles for the sketch queries: Spark computes both
# its deterministic sketch estimate and the exact value and emits a
# within-tolerance boolean; the oracle reproduces the portable columns
# (groups + exact counts) and asserts literal TRUE. An exact hash match
# that pins sketch accuracy, replacing round-5's weaker rows-only check.
ORACLES["events_approx_distinct"] = """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
"""

ORACLES["events_approx_percentiles"] = """
SELECT event_type,
       count(*) AS n_events,
       TRUE AS p50_within_bound,
       TRUE AS p90_within_bound
FROM events
GROUP BY event_type
"""

# No oracle-free queries remain; kept (empty) for the contract tests.
ORACLE_FREE = frozenset()

ORACLES["q18_large_volume_customers"] = """
WITH big AS (
    SELECT l_orderkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       o_totalprice AS total_price, total_qty
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

ORACLES["sim_lsh_near_dup"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_BUCKET} AS bucket FROM e)
SELECT a.vec_id AS id_a, bb.vec_id AS id_b,
       {_cosine("a.v", "bb.v")} AS cosine_sim
FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
WHERE {_cosine("a.v", "bb.v")} >= 0.4
"""

ORACLES["emb_center_by_label"] = f"""
WITH comp AS (
    SELECT vec_id, label,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
cent AS (
    SELECT label, pos,
           {fpsum('v')} / count(*) AS centroid
    FROM comp GROUP BY label, pos
)
SELECT c.vec_id, c.label, c.pos, c.v - cent.centroid AS centered
FROM comp c JOIN cent USING (label, pos)
WHERE c.pos < 8
"""

# semantic dedup clusters: multi-table LSH pairs -> recursive min-label walk
ORACLES["sim_semantic_dedup_clusters"] = f"""
WITH RECURSIVE e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
b AS (
    {_MT_BUCKETS}
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
    FROM b a JOIN b bb
      ON a.table_id = bb.table_id AND a.bucket = bb.bucket
     AND a.vec_id < bb.vec_id
),
pairs AS (
    SELECT id_a, id_b
    FROM cand
    JOIN e ea ON ea.vec_id = id_a
    JOIN e eb ON eb.vec_id = id_b
    WHERE {_cosine("ea.v", "eb.v")} >= 0.4
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
walk(id, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e2.src, w.label FROM edges e2 JOIN walk w ON e2.dst = w.id
)
SELECT id AS vec_id, min(label) AS cluster_id FROM walk GROUP BY id
"""

# spherical k-means, 2 unrolled iterations mirroring similarity.kmeans_assign:
# assign (cosine argmax, lowest cid ties) -> centroid update (fixed-point
# component means, ordered assembly) -> reassign
ORACLES["sim_kmeans_assign"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, v AS cv FROM e WHERE vec_id < 8),
a1s AS (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cosine("e.v", "c.cv")} DESC,
                                       c.cid ASC) AS rn
    FROM e, c0 c
),
a1 AS (SELECT vec_id, v, cid AS cluster FROM a1s WHERE rn = 1),
comp AS (
    SELECT cluster,
           CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS pos,
           unnest(v) AS val
    FROM a1
),
m AS (
    SELECT cluster, pos,
           {fpsum('val')} / count(*) AS mval
    FROM comp GROUP BY cluster, pos
),
c1n AS (SELECT cluster AS cid, list(mval ORDER BY pos) AS cv FROM m
        GROUP BY cluster),
c1 AS (
    SELECT cid, cv FROM c1n
    UNION ALL
    SELECT cid, cv FROM c0 WHERE cid NOT IN (SELECT cid FROM c1n)
),
a2s AS (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cosine("e.v", "c.cv")} DESC,
                                       c.cid ASC) AS rn
    FROM e, c1 c
)
SELECT vec_id, cid AS cluster FROM a2s WHERE rn = 1
"""

ORACLES["sql_interface"] = """
SELECT n.n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
           AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

# Connected components over the LSH pair edges: recursive label walk —
# every label reachable from a node; component id = min reachable id.
ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(id, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
)
SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id
"""

# salted two-phase == direct aggregate (decomposable aggs); oracle is the
# direct form — that equality is exactly what the hash-match proves.
ORACLES["events_salted_agg"] = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""

ORACLES["cube_order_stats"] = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
           AS grouping_level
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ORACLES["events_json_props"] = """
WITH k AS (
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(k AS DECIMAL(18,6))) AS DOUBLE) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM k
GROUP BY event_type
"""

ORACLES["q14_promo_effect"] = f"""
SELECT 100.0 * CAST(coalesce(sum(CASE WHEN p_type LIKE 'PROMO%'
                                      THEN {_DISC_PRICE} END),
                             0) AS DOUBLE)
           / CAST(sum({_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-02-01'
"""

ORACLES["events_running_sum"] = """
SELECT user_id, event_id, ts,
       CAST(row_number() OVER w AS INTEGER) AS seq,
       CAST(sum(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value,
       CAST(sum(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
            / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS moving_avg_5
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLES["events_value_percentiles"] = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50_value,
       quantile_cont(value, 0.9) AS p90_value,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""

ORACLES["q7_volume_shipping"] = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""

ORACLES["events_column_profile"] = """
SELECT column_name, n_rows, n_nulls, n_distinct FROM (
  SELECT 'event_id' AS column_name, count(*) AS n_rows,
         CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
         count(DISTINCT event_id) AS n_distinct FROM events
  UNION ALL
  SELECT 'ts', count(*),
         CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT ts) FROM events
  UNION ALL
  SELECT 'user_id', count(*),
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT user_id) FROM events
  UNION ALL
  SELECT 'event_type', count(*),
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT event_type) FROM events
  UNION ALL
  SELECT 'value', count(*),
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT value) FROM events
  UNION ALL
  SELECT 'props', count(*),
         CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT props) FROM events
)
"""

ORACLES["orders_month_gapfill"] = """
WITH bounds AS (
    SELECT date_trunc('month', min(o_orderdate)) AS lo,
           date_trunc('month', max(o_orderdate)) AS hi
    FROM orders
),
cal AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH))
                AS TIMESTAMP) AS month
    FROM bounds
),
monthly AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev,
           count(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT cal.month,
       coalesce(CAST(rev AS DOUBLE), 0.0) AS revenue,
       coalesce(n_orders, 0) AS n_orders
FROM cal LEFT JOIN monthly ON cal.month = monthly.month
"""

ORACLES["lineitem_corr_stats"] = f"""
WITH s AS (
    SELECT l_returnflag,
           count(*) AS n,
           sum(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
           sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
           sum(CAST(l_quantity AS DECIMAL(19,6))
               * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy,
           sum(CAST(l_quantity AS DECIMAL(19,6))
               * CAST(l_quantity AS DECIMAL(19,6))) AS sx2,
           sum(CAST(l_extendedprice AS DECIMAL(19,6))
               * CAST(l_extendedprice AS DECIMAL(19,6))) AS sy2
    FROM lineitem GROUP BY l_returnflag
)
-- Cancellation in exact decimal, assembled as integer-valued parts
-- (mirror of numerics.pearson_exact_parts: the double-first assembly
-- failed the sf0.1 gate by ~1e-11 relative — DuckDB's nonzero-scale
-- decimal->double cast double-rounds, Spark's rounds once, and
-- n*sxy - sx*sy amplifies that last ulp ~4 orders of magnitude; the
-- 10^k scale shifts below cancel algebraically in r, so every double
-- op after the portable casts is the same IEEE op on both engines).
, p AS (
    SELECT l_returnflag, n,
           CAST(CAST(
               CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,2))
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,2))
             AS DECIMAL(33,2)) * CAST(100 AS DECIMAL(3,0))
             AS DECIMAL(38,0)) AS num_i,
           CAST(
               CAST(n AS DECIMAL(12,0)) * CAST(sx2 AS DECIMAL(19,0))
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
             AS DECIMAL(38,0)) AS den_x_i,
           CAST(CAST(
               CAST(n AS DECIMAL(12,0)) * CAST(sy2 AS DECIMAL(26,4))
                 - CAST(sy AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2))
             AS DECIMAL(33,4)) * CAST(10000 AS DECIMAL(5,0))
             AS DECIMAL(38,0)) AS den_y_i
    FROM s
)
SELECT l_returnflag, n,
       {_dec_int_to_double_sql('num_i')}
       / sqrt({_dec_int_to_double_sql('den_x_i')} * {_dec_int_to_double_sql('den_y_i')})
           AS corr_qty_price,
       sqrt({_dec_int_to_double_sql('den_x_i')}
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty
FROM p
"""

ORACLES["docs_split_decontamination"] = f"""
WITH {_TOKS_CTE},
fp AS (
    SELECT doc_id, md5(array_to_string(t[1:12], ' ')) AS f,
           CASE WHEN {_bucket_sql("split")} < 2000
                THEN 'test' ELSE 'train' END AS split
    FROM toks
),
train AS (
    SELECT f, count(*) AS n_train_matches, min(doc_id) AS first_train_doc
    FROM fp WHERE split = 'train' GROUP BY f
)
SELECT fp.doc_id AS test_doc_id, n_train_matches, first_train_doc
FROM fp JOIN train ON fp.f = train.f
WHERE fp.split = 'test'
"""


# token-granular Gopher repetition rules: bigram list via 1-indexed
# list_transform; per-doc mode count by scanning the doc's own bigram list
ORACLES["text_repetition_filter"] = f"""
WITH {_TOKS_CTE},
g AS (
    SELECT doc_id, t,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i + 1])
                ELSE [] END AS bg
    FROM toks
),
m AS (
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
               AS dup_token_frac,
           CAST(coalesce(list_max(list_transform(list_distinct(bg),
                    d -> len(list_filter(bg, x -> x = d)))), 0) AS BIGINT)
               AS top_bigram_count,
           CASE WHEN len(bg) > 0
                THEN CAST(list_max(list_transform(list_distinct(bg),
                         d -> len(list_filter(bg, x -> x = d)))) AS DOUBLE)
                     / len(bg)
                ELSE 0.0 END AS top_bigram_frac
    FROM g
)
SELECT *,
       (n_tokens >= 5 AND dup_token_frac < 0.6
        AND (top_bigram_count <= 1 OR top_bigram_frac < 0.2)) AS keep
FROM m
"""

# same planted-PII construction and the same Java-regex/RE2-common patterns
# as queries.text_pii_redact / functions/text.pii_redact
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_PHONE = "[+][0-9]{8,15}"
ORACLES["text_pii_redact"] = f"""
WITH planted AS (
    SELECT doc_id,
           CASE
             WHEN doc_id % 7 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com now'
             WHEN doc_id % 11 = 0 THEN
               text || ' call +431' || lpad(CAST(doc_id % 100000 AS VARCHAR),
                                            5, '0')
             ELSE text
           END AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
           AS n_phones,
       regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                      '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
FROM planted
"""

# uniform-target mixture weights; division sequence pinned to match
# sampling.source_mix_weights (actual = n/total, target = 1/n_sources,
# weight = target/actual)
ORACLES["docs_mix_weights"] = """
WITH per AS (
    SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(sum(n_docs) AS BIGINT) AS total,
           count(*) AS n_sources
    FROM per
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_docs AS DOUBLE) / total AS actual_frac,
       1.0 / n_sources AS target_frac,
       (1.0 / n_sources) / (CAST(n_docs AS DOUBLE) / total) AS weight
FROM per, tot
"""


# symmetric int8 quantization; floor(x/scale + 0.5) is the shared
# half-up rule (round() diverges between engines on exact halves)
ORACLES["emb_quantize_int8"] = """
WITH v AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
    FROM embeddings
),
s AS (
    SELECT vec_id, dv,
           list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale
    FROM v
),
q AS (
    SELECT vec_id, dv, scale,
           CASE WHEN scale = 0
                THEN list_transform(dv, x -> 0)
                ELSE list_transform(dv,
                         x -> CAST(floor(x / scale + 0.5) AS INTEGER))
           END AS qvec
    FROM s
)
SELECT vec_id, scale,
       CAST(to_json(qvec) AS VARCHAR) AS qvec,
       coalesce(list_max(list_transform(range(1, len(dv) + 1),
           i -> abs(dv[i] - CAST(qvec[i] AS DOUBLE) * scale))), 0.0)
           AS max_abs_err
FROM q
"""


# streaming availableNow drain == batch tumbling windows closed by the
# final watermark (max event time, zero delay): the append-mode emission
# contract, computable exactly from the batch definition
ORACLES["streaming_traffic_parity"] = (
    "SELECT * FROM ("
    + _traffic_max_sql(
        "make_timestamp(CAST((floor(epoch(ts_sec) / 3600) * 3600 + 3600)"
        " * 1000000 AS BIGINT))"
    )
    + ") WHERE window_timestamp <= "
    "(SELECT max(date_trunc('second', ts)) FROM events)"
)


# mean unigram surprisal; pinned sorted fold mirrors unigram_surprisal
ORACLES["text_unigram_logprob"] = f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
vocab AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM vocab),
s AS (
    SELECT doc_id, -ln(CAST(tf AS DOUBLE) / total) AS sv
    FROM tok JOIN vocab USING (term), tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       list_reduce(list_prepend(0.0, list_sort(list(sv))),
                   (acc, x) -> acc + x) / count(*) AS avg_surprisal
FROM s
GROUP BY doc_id
"""

# token accounting toward a uniform mixture at a 1M-token epoch budget
ORACLES["docs_token_budget_plan"] = f"""
WITH d AS (
    SELECT source, CAST(len({_TOKS}) AS BIGINT) AS nt FROM documents
),
per AS (
    SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
    FROM d GROUP BY source
),
tot AS (SELECT count(*) AS n_sources FROM per)
SELECT source, n_docs, n_tokens,
       1.0 / n_sources AS target_frac,
       (1.0 / n_sources) * 1000000.0 AS tokens_per_epoch,
       CAST(n_tokens AS DOUBLE) / ((1.0 / n_sources) * 1000000.0)
           AS epochs_to_exhaust
FROM per, tot
"""


# winsorization at p05/p95 per event_type; quantile_cont matches Spark's
# exact interpolating percentile (parity proven by events_value_percentiles)
ORACLES["events_winsorize"] = """
WITH bounds AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS lo,
           quantile_cont(value, 0.95) AS hi
    FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       least(greatest(value, lo), hi) AS value_winsorized,
       (value < lo OR value > hi) AS clipped
FROM events e JOIN bounds USING (event_type)
"""


# pairwise source vocabulary Jaccard (inclusion-exclusion on distinct
# (source, term) sets)
ORACLES["docs_source_vocab_overlap"] = f"""
WITH st AS (
    SELECT DISTINCT source, unnest({_TOKS}) AS term FROM documents
),
sizes AS (SELECT source, count(*) AS n_terms FROM st GROUP BY source),
inter AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_common
    FROM st a JOIN st b USING (term)
    WHERE a.source < b.source
    GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.n_terms + sb.n_terms - n_common)
           AS jaccard
FROM inter
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""


# per-source cap: same md5-order row_number rule
ORACLES["docs_cap_per_source"] = """
SELECT doc_id, source, lang, n_chars FROM (
    SELECT doc_id, source, lang, n_chars,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 10
"""

# ------------------------------------------------- round 5: TPC-H completion

ORACLES["q2_min_cost_supplier"] = """
WITH supply AS (
    SELECT l_partkey, l_suppkey,
           min(l_extendedprice / l_quantity) AS supply_cost
    FROM lineitem GROUP BY 1, 2
),
eu AS (
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM supply
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'LARGE' AND p_size <= 25 AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM eu
WHERE supply_cost = (
    SELECT min(supply_cost) FROM eu e2 WHERE e2.p_partkey = eu.p_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

ORACLES["q9_product_type_profit"] = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum({_DISC_PRICE}
                - CAST(p_retailprice AS DECIMAL(18,6))
                  * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

ORACLES["q11_important_stock"] = """
WITH value AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS v
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY 1
)
SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
FROM value
WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) FROM value) * 0.001
ORDER BY part_value DESC, p_partkey
"""

ORACLES["q12_shipmode_priority"] = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'MEDIUM'
            ELSE 'SLOW' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY ship_bucket
"""

ORACLES["q20_promo_part_suppliers"] = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,6)))
             > CAST(50 AS DECIMAL(18,6))
  )
ORDER BY s_name
"""

ORACLES["q21_late_suppliers"] = """
WITH late AS (
    SELECT DISTINCT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
),
pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
        SELECT 1 FROM pairs l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

ORACLES["streaming_dedup_parity"] = """
SELECT DISTINCT md5(text) AS content_md5, n_chars
FROM documents
"""

# same fixed point as dedup_clusters (labels = component minima); the
# iteration scheme differs only Spark-side
ORACLES["dedup_clusters_star"] = ORACLES["dedup_clusters"]

# Skew-capped LSH: same signatures, but band buckets over the cap are
# excluded from pair generation. The bands relation is the per-(doc, band)
# key explode; DISTINCT pairs may arise from several surviving bands.
_LSH_CAP = 16
_BANDS_UNION = "\n    UNION ALL\n    ".join(
    f"SELECT doc_id, {b} AS band_id, "
    + ", ".join(f"mh{b * _BAND + r} AS k{r}" for r in range(_BAND))
    + " FROM sig"
    for b in range(_N_MINHASH // _BAND)
)
_BAND_KEYS = ", ".join(["band_id"] + [f"k{r}" for r in range(_BAND)])
ORACLES["dedup_minhash_lsh_capped"] = f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS (
    {_BANDS_UNION}
),
ok AS (
    SELECT {_BAND_KEYS} FROM bands
    GROUP BY {_BAND_KEYS} HAVING count(*) <= {_LSH_CAP}
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x
    JOIN ok USING ({_BAND_KEYS})
    JOIN bands y USING ({_BAND_KEYS})
    WHERE x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       CAST({_EQ_SUM} AS DOUBLE) / {_N_MINHASH} AS est_jaccard
FROM cand
JOIN sig a ON cand.doc_a = a.doc_id
JOIN sig b ON cand.doc_b = b.doc_id
"""

ORACLES["docs_pack_bins"] = f"""
WITH {_TOKS_CTE},
base AS (
    SELECT d.lang AS "group", d.doc_id, CAST(len(t) AS BIGINT) AS n_tokens
    FROM documents d JOIN toks USING (doc_id)
    WHERE len(t) > 0
),
offs AS (
    SELECT *,
           CAST(sum(n_tokens) OVER (PARTITION BY "group" ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                AS BIGINT) AS start_offset
    FROM base
)
SELECT "group", CAST(floor(start_offset / 256) AS BIGINT) AS bin,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM offs
GROUP BY 1, 2
ORDER BY "group", bin
"""

ORACLES["events_session_funnel_windowed"] = """
WITH flagged AS (
    SELECT user_id, event_type, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
),
s1 AS (
    SELECT user_id, sess_id, min(ts) AS t1 FROM sessions
    WHERE event_type = 'view' GROUP BY 1, 2
),
s2 AS (
    SELECT s.user_id, s.sess_id, min(s.ts) AS t2
    FROM sessions s JOIN s1 USING (user_id, sess_id)
    WHERE s.event_type = 'click' AND s.ts >= s1.t1
    GROUP BY 1, 2
),
s3 AS (
    SELECT s.user_id, s.sess_id, min(s.ts) AS t3
    FROM sessions s JOIN s2 USING (user_id, sess_id)
    WHERE s.event_type = 'purchase' AND s.ts >= s2.t2
    GROUP BY 1, 2
)
SELECT CAST(count(t1) AS BIGINT) AS n_sessions_viewed,
       CAST(count(t2) AS BIGINT) AS n_sessions_clicked,
       CAST(count(t3) AS BIGINT) AS n_sessions_purchased
FROM s1
LEFT JOIN s2 USING (user_id, sess_id)
LEFT JOIN s3 USING (user_id, sess_id)
"""

ORACLES["docs_minhash_containment"] = f"""
WITH {_SHINGLES_CTE},
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
inter AS (
    SELECT p.doc_a, p.doc_b, count(*) AS n_common
    FROM pairs p
    JOIN sh x ON x.doc_id = p.doc_a
    JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / ca.n_sh AS containment_a,
       CAST(n_common AS DOUBLE) / cb.n_sh AS containment_b
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
"""

ORACLES["events_interval_overlap_count"] = """
WITH marks AS (
    SELECT user_id, ts AS t, 1 AS delta FROM events
    UNION ALL
    SELECT user_id,
           make_timestamp((epoch_ms(ts)
                           + CAST(round(value * 1000) AS BIGINT)) * 1000),
           -1
    FROM events
),
running AS (
    SELECT user_id,
           sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                            ROWS UNBOUNDED PRECEDING) AS r
    FROM marks
)
SELECT user_id, CAST(max(r) AS BIGINT) AS max_concurrent
FROM running GROUP BY user_id ORDER BY user_id
"""

ORACLES["docs_quality_gate_report"] = f"""
WITH {_TOKS_CTE},
flags AS (
    SELECT
        CASE WHEN d.n_chars >= 100 THEN 1 ELSE 0 END AS min_chars,
        CASE WHEN d.n_chars <= 400 THEN 1 ELSE 0 END AS max_chars,
        CASE WHEN len(t) >= 30 THEN 1 ELSE 0 END AS min_words,
        CASE WHEN CAST(length(regexp_replace(lower(d.text), '[^a-z0-9]',
                                             '', 'g')) AS DOUBLE) / len(t)
                  BETWEEN 2.0 AND 12.0
             THEN 1 ELSE 0 END AS mean_word_len,
        CASE WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.3
             THEN 1 ELSE 0 END AS distinct_ratio
    FROM documents d JOIN toks USING (doc_id)
),
stacked AS (
    SELECT 'min_chars' AS rule, min_chars AS passed FROM flags
    UNION ALL SELECT 'max_chars', max_chars FROM flags
    UNION ALL SELECT 'min_words', min_words FROM flags
    UNION ALL SELECT 'mean_word_len', mean_word_len FROM flags
    UNION ALL SELECT 'distinct_ratio', distinct_ratio FROM flags
)
SELECT rule, CAST(sum(passed) AS BIGINT) AS n_pass,
       CAST(sum(1 - passed) AS BIGINT) AS n_fail,
       CAST(sum(passed) AS DOUBLE) / count(*) AS pass_rate
FROM stacked GROUP BY rule ORDER BY rule
"""

# PQ: squared-L2 per (vector, centroid, subspace) with the pinned fold;
# rank per (vec, subspace) with centroid-id tie-break, pivot wide.
_PQ_M, _PQ_SUB, _PQ_K = 4, 16, 4


def _pq_dist(m: int) -> str:
    lo, hi = m * _PQ_SUB + 1, (m + 1) * _PQ_SUB
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip(vv[{lo}:{hi}], cv[{lo}:{hi}]),"
        " x -> (x[1] - x[2]) * (x[1] - x[2]))), (acc, x) -> acc + x)"
    )


_PQ_UNION = "\n    UNION ALL\n    ".join(
    f"SELECT vec_id, _cid, {m} AS m, {_pq_dist(m)} AS dist FROM v, c"
    for m in range(_PQ_M)
)
_PQ_CODES = ", ".join(
    f"CAST(max(CASE WHEN m = {m} THEN _cid END) AS INTEGER) AS code_{m}"
    for m in range(_PQ_M)
)
ORACLES["emb_pq_codes"] = f"""
WITH c AS (SELECT vec_id AS _cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id < {_PQ_K}),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
dists AS (
    {_PQ_UNION}
),
ranked AS (
    SELECT vec_id, m, _cid,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist, _cid) AS rn
    FROM dists
)
SELECT vec_id, {_PQ_CODES}
FROM ranked WHERE rn = 1
GROUP BY vec_id
ORDER BY vec_id
"""

ORACLES["docs_shingle_novelty"] = f"""
WITH {_SHINGLES_CTE},
first_owner AS (SELECT shingle, min(doc_id) AS _first FROM sh GROUP BY 1)
SELECT sh.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN _first = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       CAST(sum(CASE WHEN _first = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS novelty
FROM sh JOIN first_owner USING (shingle)
GROUP BY sh.doc_id
"""

# ADC: per-query (subspace, centroid) distance tables; candidate score is
# the CASE-pivoted fixed-order sum of the entries its codes select.
_ADC_DTAB_UNION = "\n    UNION ALL\n    ".join(
    f"SELECT query_id, _cid, {m} AS m, {_pq_dist(m)} AS d FROM v, c"
    for m in range(_PQ_M)
)
_ADC_SUM = " + ".join(f"d{m}" for m in range(_PQ_M))
_ADC_PIVOT = ", ".join(
    f"min(CASE WHEN t.m = {m} THEN t.d END) AS d{m}" for m in range(_PQ_M)
)
ORACLES["sim_pq_adc_topk"] = f"""
WITH c AS (SELECT vec_id AS _cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id < {_PQ_K}),
allv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
v AS (SELECT * FROM allv),
dists AS (
    {_PQ_UNION}
),
codes AS (
    SELECT vec_id, m, _cid AS code
    FROM (SELECT vec_id, m, _cid,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY dist, _cid) AS rn
          FROM dists)
    WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, vv FROM allv WHERE vec_id < 10),
dtab AS (
    {_ADC_DTAB_UNION.replace("FROM v, c", "FROM (SELECT query_id, vv FROM q) v, c")}
),
scored AS (
    SELECT t.query_id, k.vec_id AS neighbor_id, {_ADC_PIVOT}
    FROM codes k
    JOIN dtab t ON t.m = k.m AND t._cid = k.code
    GROUP BY t.query_id, k.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, {_ADC_SUM} AS adc_dist,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY {_ADC_SUM}, neighbor_id) AS INTEGER) AS rank
    FROM scored
    WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, adc_dist, rank FROM ranked WHERE rank <= 5
"""

ORACLES["events_scd2_intervals"] = """
WITH islands AS (
    SELECT user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS _isl
    FROM events
),
runs AS (
    SELECT user_id, event_type, _isl,
           min(ts) AS valid_from, count(*) AS n_events
    FROM islands GROUP BY 1, 2, 3
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to,
       n_events
FROM runs
"""

ORACLES["text_bigram_logprob"] = f"""
WITH {_TOKS_CTE},
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                  i -> struct_pack(w1 := t[i],
                                   bigram := t[i] || ' ' || t[i + 1]))) AS p
    FROM toks WHERE len(t) >= 2
),
pairs AS (SELECT doc_id, p.w1 AS w1, p.bigram AS bigram FROM bg),
cb AS (SELECT bigram, count(*) AS c12 FROM pairs GROUP BY bigram),
c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
s AS (
    SELECT doc_id, -ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) AS sv
    FROM pairs JOIN cb USING (bigram) JOIN c1 USING (w1)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       list_reduce(list_prepend(0.0, list_sort(list(sv))),
                   (acc, x) -> acc + x) / count(*) AS avg_surprisal
FROM s
GROUP BY doc_id
"""

ORACLES["docs_dedup_survivorship"] = f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(id, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
),
labels AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id)
SELECT d.doc_id,
       coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       CASE WHEN l.cluster_id IS NULL OR l.cluster_id = d.doc_id
            THEN 'kept' ELSE 'dropped_near_dup' END AS status
FROM documents d LEFT JOIN labels l USING (doc_id)
"""

ORACLES["orders_rfm_segments"] = """
WITH per_cust AS (
    SELECT o_custkey AS c_custkey,
           max(o_orderdate) AS last_order,
           count(*) AS frequency,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS monetary
    FROM orders GROUP BY 1
),
q AS (
    SELECT *,
           CAST(ntile(4) OVER (ORDER BY last_order, c_custkey) AS INTEGER)
               AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY frequency, c_custkey) AS INTEGER)
               AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY monetary, c_custkey) AS INTEGER)
               AS m_quartile
    FROM per_cust
)
SELECT c_custkey, last_order, frequency, monetary,
       r_quartile, f_quartile, m_quartile,
       'R' || r_quartile || 'F' || f_quartile || 'M' || m_quartile
           AS segment
FROM q
"""

# Spark dayofweek() is 1=Sunday..7; DuckDB dayofweek() is 0=Sunday..6
ORACLES["events_hourly_seasonality"] = """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hour,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) / count(*) AS DOUBLE)
           AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY dow, hour
"""

ORACLES["events_resample_ffill"] = """
WITH per_hour AS (
    SELECT user_id, date_trunc('hour', ts) AS hour_ts,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) / count(*) AS DOUBLE)
               AS avg_value
    FROM events GROUP BY 1, 2
),
span AS (
    SELECT user_id, min(hour_ts) AS mn, max(hour_ts) AS mx
    FROM per_hour GROUP BY 1
),
grid AS (
    SELECT user_id,
           unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
    FROM span
)
SELECT g.user_id, g.hour_ts,
       CAST(coalesce(p.n, 0) AS BIGINT) AS n_events,
       last_value(p.avg_value IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.hour_ts
                 ROWS UNBOUNDED PRECEDING) AS value_ffill
FROM grid g
LEFT JOIN per_hour p ON p.user_id = g.user_id AND p.hour_ts = g.hour_ts
"""

ORACLES["docs_importance_resample"] = """
WITH sizes AS (SELECT lang, count(*) AS gn FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(gn) AS DOUBLE) AS t, count(*) AS k FROM sizes),
rates AS (
    SELECT lang,
           least(1.0, (t / k) / CAST(gn AS DOUBLE)) AS keep_rate
    FROM sizes, tot
)
SELECT doc_id, source, d.lang, n_chars, keep_rate
FROM documents d JOIN rates USING (lang)
WHERE CAST(('0x' || substr(md5('resample' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000
      < floor(keep_rate * 10000)
"""

ORACLES["part_price_equidepth"] = """
WITH b AS (
    SELECT p_retailprice,
           CAST(ntile(10) OVER (ORDER BY p_retailprice, p_partkey)
                AS INTEGER) AS bucket
    FROM part
)
SELECT bucket, count(*) AS n_parts,
       min(p_retailprice) AS price_min,
       max(p_retailprice) AS price_max,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) / count(*) AS DOUBLE)
           AS price_avg
FROM b GROUP BY bucket ORDER BY bucket
"""

ORACLES["events_mad_outliers"] = """
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS median_value
    FROM events GROUP BY 1
),
dev AS (
    SELECT e.event_type, abs(e.value - m.median_value) AS d, m.median_value
    FROM events e JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(d, 0.5) AS mad
    FROM dev GROUP BY 1
)
SELECT dev.event_type,
       CAST(min(dev.median_value) AS DOUBLE) AS median_value,
       CAST(min(mad.mad) AS DOUBLE) AS mad,
       CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       count(*) AS n_events
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
ORDER BY dev.event_type
"""

ORACLES["events_cohort_retention"] = """
WITH first AS (
    SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
    FROM events GROUP BY 1
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, date_trunc('week', e.ts)) / 7
            AS INTEGER) AS weeks_since,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM events e JOIN first USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, weeks_since
"""

ORACLES["events_markov_transitions"] = """
WITH steps AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type, count(*) AS n
    FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT from_type, sum(n) AS tot FROM counts GROUP BY 1)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS prob
FROM counts JOIN totals USING (from_type)
ORDER BY from_type, to_type
"""

ORACLES["orders_abc_pareto"] = """
WITH per_cust AS (
    SELECT o_custkey AS c_custkey,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
    FROM orders GROUP BY 1
),
tot AS (SELECT sum(rev) AS t FROM per_cust),
ranked AS (
    SELECT c_custkey, rev,
           CAST(sum(rev) OVER (ORDER BY rev DESC, c_custkey
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(t AS DOUBLE) AS cum_share
    FROM per_cust, tot
)
SELECT c_custkey, CAST(rev AS DOUBLE) AS revenue, cum_share,
       CASE WHEN cum_share <= 0.80 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
ORDER BY revenue DESC, c_custkey
"""

ORACLES["dedup_cluster_stats"] = f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(id, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
),
labels AS (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id),
sizes AS (SELECT cluster_id, count(*) AS cluster_size
          FROM labels GROUP BY 1)
SELECT cluster_size, count(*) AS n_clusters
FROM sizes GROUP BY 1 ORDER BY cluster_size
"""

ORACLES["events_funnel_step_latency"] = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts >= s1.t1
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
    GROUP BY 1
),
hops AS (
    SELECT s2.user_id,
           CAST(epoch_us(s2.t2) AS DOUBLE) / 1000000.0
           - CAST(epoch_us(s2.t1) AS DOUBLE) / 1000000.0
               AS view_to_click_s,
           CAST(epoch_us(s3.t3) AS DOUBLE) / 1000000.0
           - CAST(epoch_us(s2.t2) AS DOUBLE) / 1000000.0
               AS click_to_purchase_s
    FROM s2 JOIN s3 USING (user_id)
),
melted AS (
    SELECT 'view_to_click' AS hop, view_to_click_s AS seconds FROM hops
    UNION ALL
    SELECT 'click_to_purchase', click_to_purchase_s FROM hops
)
SELECT hop, count(*) AS n_users,
       min(seconds) AS min_s,
       quantile_cont(seconds, 0.5) AS median_s,
       max(seconds) AS max_s
FROM melted GROUP BY hop ORDER BY hop
"""

ORACLES["emb_random_projection"] = """
WITH comp AS (
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
signs AS (
    SELECT k._k, j.pos,
           CASE WHEN CAST(('0x' || substr(
                    md5('rp:' || CAST(k._k AS VARCHAR) || ':'
                        || CAST(j.pos AS VARCHAR)), 1, 1)) AS INTEGER)
                    % 2 = 0
                THEN 1.0 ELSE -1.0 END AS s
    FROM (SELECT CAST(unnest(generate_series(0, 7)) AS INTEGER) AS _k) k,
         (SELECT CAST(unnest(generate_series(0, 63)) AS INTEGER) AS pos) j
)
SELECT c.vec_id, s._k AS dim,
       list_reduce(list_prepend(0.0, list_sort(list(c.v * s.s))),
                   (acc, x) -> acc + x) / 8.0 AS value
FROM comp c JOIN signs s ON c.pos = s.pos
GROUP BY c.vec_id, s._k
"""

ORACLES["docs_incremental_dedup"] = """
WITH base AS (
    SELECT md5(text) AS content_md5, min(doc_id) AS base_doc_id
    FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
),
batch AS (
    SELECT doc_id, md5(text) AS content_md5
    FROM documents WHERE doc_id % 5 = 0
),
win AS (
    SELECT content_md5, min(doc_id) AS batch_min FROM batch GROUP BY 1
)
SELECT t.doc_id, t.content_md5, b.base_doc_id,
       (b.base_doc_id IS NULL AND t.doc_id = w.batch_min) AS is_new
FROM batch t
JOIN win w USING (content_md5)
LEFT JOIN base b USING (content_md5)
"""

ORACLES["events_nearest_join"] = """
WITH c AS (
    SELECT event_id AS click_id, user_id, ts
    FROM events WHERE event_type = 'click'
),
p AS (
    SELECT event_id AS purchase_id, user_id, ts AS pts, value AS amount
    FROM events WHERE event_type = 'purchase'
),
cand AS (
    SELECT c.click_id, c.user_id, c.ts, p.pts, p.purchase_id, p.amount,
           epoch_us(p.pts) - epoch_us(c.ts) AS dt_us
    FROM c JOIN p ON c.user_id = p.user_id
    WHERE abs(epoch_us(p.pts) - epoch_us(c.ts)) <= 300000000
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY click_id
        ORDER BY abs(dt_us), pts, purchase_id
    ) AS rn
    FROM cand
)
SELECT click_id, user_id, ts AS click_ts, pts AS purchase_ts,
       dt_us, purchase_id, amount
FROM ranked WHERE rn = 1
"""

ORACLES["streaming_sliding_parity"] = """
WITH mx AS (SELECT max(ts) AS m FROM events),
win AS (
    SELECT e.*,
           make_timestamp(CAST((floor(epoch(ts) / 900) * 900 - k.k * 900)
                               * 1000000 AS BIGINT)) AS window_start
    FROM events e, generate_series(0, 3) AS k(k)
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM win
GROUP BY 1, 2, 3
HAVING window_start + INTERVAL 1 HOUR <= (SELECT m FROM mx)
"""

ORACLES["streaming_join_parity"] = """
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       p.value AS amount
FROM events p
JOIN events c
  ON p.user_id = c.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1800 SECONDS
"""


ORACLES["events_ewma"] = """
WITH ranked AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
),
tail AS (SELECT * FROM ranked WHERE rn <= 20)
SELECT user_id,
       count(*) AS n_used,
       CAST(sum(CAST(value AS DECIMAL(18,6))
                * CAST(power(2.0, 20 - rn) AS DECIMAL(18,0))) AS DOUBLE)
       / CAST(sum(CAST(power(2.0, 20 - rn) AS DECIMAL(18,0))) AS DOUBLE)
           AS ewma_value
FROM tail GROUP BY user_id
"""

ORACLES["text_substring_dup"] = """
WITH sh AS (
    SELECT DISTINCT doc_id,
           substr(text, CAST(p AS INTEGER), 30) AS shingle
    FROM documents,
         unnest(generate_series(1, length(text) - 29, 10)) AS t(p)
    WHERE length(text) >= 30
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

ORACLES["docs_cluster_balanced_sample"] = f"""
WITH assign AS ({ORACLES["sim_kmeans_assign"]}),
ranked AS (
    SELECT cluster, vec_id,
           row_number() OVER (
               PARTITION BY cluster
               ORDER BY md5('cbs:' || CAST(vec_id AS VARCHAR)), vec_id
           ) AS samp_rank
    FROM assign
)
SELECT cluster, vec_id, samp_rank FROM ranked WHERE samp_rank <= 5
"""

ORACLES["events_point_in_time_join"] = """
WITH base AS (
    SELECT user_id, event_type, ts, event_id
    FROM events WHERE event_type <> 'purchase'
),
isl AS (
    SELECT *,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS g
    FROM base
),
runs AS (
    SELECT user_id, event_type AS state_type, min(ts) AS ts,
           count(*) AS run_events
    FROM isl GROUP BY user_id, event_type, g
),
ded AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, ts
            ORDER BY state_type DESC, run_events DESC) AS rn
        FROM runs
    ) WHERE rn = 1
),
p AS (
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           value AS amount
    FROM events WHERE event_type = 'purchase'
),
cand AS (
    SELECT p.*, r.state_type, r.ts AS state_since, r.run_events,
           row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY r.ts DESC NULLS LAST) AS rn
    FROM p LEFT JOIN ded r
      ON r.user_id = p.user_id AND r.ts <= p.purchase_ts
)
SELECT purchase_id, user_id, purchase_ts, amount,
       state_type, state_since, run_events
FROM cand WHERE rn = 1
"""

ORACLES["events_rolling_active_users"] = """
WITH uh AS (
    SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
),
mx AS (SELECT date_trunc('hour', max(ts)) AS m FROM events),
fan AS (
    SELECT user_id,
           unnest(generate_series(
               h,
               least(h + INTERVAL 23 HOURS, (SELECT m FROM mx)),
               INTERVAL 1 HOUR)) AS report_hour
    FROM uh
)
SELECT report_hour, count(DISTINCT user_id) AS active_users_24h
FROM fan GROUP BY 1
"""

ORACLES["events_psi_drift"] = """
WITH tagged AS (
    SELECT event_type,
           least(greatest(CAST(floor(value / 50) AS INTEGER), 0), 9)
               AS bucket,
           (day(ts) <= 15) AS in_a
    FROM events
),
counts AS (
    SELECT event_type, bucket,
           sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS na,
           sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS nb
    FROM tagged GROUP BY 1, 2
),
tot AS (
    SELECT event_type, sum(na) AS ta, sum(nb) AS tb
    FROM counts GROUP BY 1
),
terms AS (
    SELECT c.event_type,
           (CAST(na + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE)
            - CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE))
           * (ln(CAST(na + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
              - ln(CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
               AS term
    FROM counts c JOIN tot USING (event_type)
)
SELECT event_type,
       CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS psi
FROM terms GROUP BY event_type
"""

ORACLES["emb_norm_outliers"] = f"""
WITH norms AS (
    SELECT vec_id, label,
           sqrt(list_reduce(
               list_prepend(0.0, list_sort(
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> x * x))),
               (acc, x) -> acc + x)) AS norm
    FROM embeddings
),
stats AS (
    SELECT label,
           {fpsum('norm')} / count(*) AS mean_norm,
           {fpsum('norm * norm')} / count(*) AS m2
    FROM norms GROUP BY label
)
SELECT vec_id, n.label, norm,
       (norm - mean_norm) / sqrt(m2 - mean_norm * mean_norm) AS z
FROM norms n JOIN stats USING (label)
WHERE abs((norm - mean_norm) / sqrt(m2 - mean_norm * mean_norm)) > 2
"""


ORACLES["docs_bloom_decontaminate"] = f"""
WITH {_TOKS_CTE},
fp AS (
    SELECT doc_id, md5(array_to_string(t[1:12], ' ')) AS f,
           CASE WHEN {_bucket_sql("split")} < 2000
                THEN 'test' ELSE 'train' END AS split
    FROM toks
),
ev AS (
    SELECT f, count(*) AS n_eval_matches, min(doc_id) AS first_eval_doc
    FROM fp WHERE split = 'test' GROUP BY f
)
SELECT fp.doc_id AS train_doc_id, n_eval_matches, first_eval_doc
FROM fp JOIN ev ON fp.f = ev.f
WHERE fp.split = 'train'
"""


# the Morton interleave is generated by the same helper the Spark plan
# uses, so both engines evaluate the literally-identical bit formula
from .functions.layout import zorder_value_sql as _zsql

ORACLES["events_zorder_layout"] = f"""
WITH d AS (
    SELECT CAST(user_id % 1024 AS BIGINT) AS _d1,
           CAST((day(ts) - 1) * 24 + hour(ts) AS BIGINT) AS _d2
    FROM events
),
z AS (SELECT _d1, _d2, ({_zsql("_d1", "_d2", 10)}) AS _z FROM d)
SELECT (_z >> 14) AS file_id,
       count(*) AS n_rows,
       min(_d1) AS min_user_bucket, max(_d1) AS max_user_bucket,
       min(_d2) AS min_hour, max(_d2) AS max_hour
FROM z GROUP BY 1
"""


ORACLES["orders_join_skew_report"] = """
WITH per_key AS (
    SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY 1
),
tot AS (SELECT sum(n_rows) AS _total, count(*) AS _keys FROM per_key)
SELECT o_custkey, n_rows,
       CAST(n_rows AS DOUBLE) * 100.0 / CAST(_total AS DOUBLE)
           AS pct_of_rows,
       CAST(floor((n_rows * _keys + _total - 1) / _total) AS BIGINT)
           AS salt_factor
FROM per_key, tot
ORDER BY n_rows DESC, o_custkey
LIMIT 10
"""


ORACLES["docs_ngram_dup_rate"] = f"""
WITH {_SHINGLES_CTE}
SELECT d.source,
       count(*) AS total_shingles,
       count(DISTINCT sh.shingle) AS distinct_shingles,
       1.0 - CAST(count(DISTINCT sh.shingle) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS dup_rate
FROM sh JOIN documents d USING (doc_id)
GROUP BY d.source
"""


ORACLES["events_arrival_lateness"] = f"""
WITH arr AS (
    SELECT event_id, event_type, ts,
           ts + to_seconds({_bucket_sql("lat", "event_id")} % 30)
               AS arrival_ts
    FROM events
),
traced AS (
    SELECT event_type, ts,
           max(ts) OVER (ORDER BY arrival_ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS wm
    FROM arr
),
l AS (
    SELECT event_type,
           greatest(0, coalesce(epoch_us(wm) - epoch_us(ts), 0))
               AS _late_us
    FROM traced
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN _late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
       CAST(sum(CASE WHEN _late_us > 10000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped_10s,
       max(_late_us) AS max_late_us
FROM l GROUP BY 1
"""


ORACLES["streaming_session_parity"] = """
WITH flagged AS (
    SELECT user_id, ts, CAST(value AS DECIMAL(18,6)) AS v,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
),
agg AS (
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(sum(v) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, sess_id
)
SELECT user_id, session_start, session_end, n_events, sum_value
FROM agg
WHERE session_end <= (SELECT max(ts) FROM events)
"""


ORACLES["events_salted_distinct_users"] = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY 1
"""


ORACLES["docs_tfidf_top_terms"] = f"""
WITH {_TOKS_CTE},
tf AS (
    SELECT doc_id, u.term, count(*) AS tf
    FROM toks, unnest(t) AS u(term)
    GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS _n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           CAST(tf.tf AS DOUBLE)
               * ln(CAST(_n AS DOUBLE) / CAST(df AS DOUBLE)) AS score
    FROM tf JOIN dfreq USING (term), n
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS rnk
    FROM scored
)
SELECT doc_id, term, tf, score, rnk FROM ranked WHERE rnk <= 3
"""


ORACLES["orders_top_percentile"] = """
WITH r AS (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
)
SELECT * FROM r WHERE pct_rank >= 0.99
"""


ORACLES["events_dq_checks"] = """
WITH agg AS (
    SELECT count(*) AS _n,
           CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
               AS _null_user,
           CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
               AS _null_value,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
               AS _dup_event_id,
           CAST(count(*) FILTER (WHERE event_type NOT IN
                ('click','view','purchase','signup','error')) AS BIGINT)
               AS _bad_type,
           CAST(count(*) FILTER (WHERE value < 0) AS BIGINT) AS _neg_value,
           CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS _gt_100,
           CAST(count(*) FILTER (WHERE year(ts) != 2024) AS BIGINT)
               AS _ts_out_of_range
    FROM events
)
SELECT r."constraint", agg._n AS observed, r.v AS violations,
       r.v = 0 AS passed
FROM agg, LATERAL (VALUES
    ('user_id_not_null', _null_user),
    ('value_not_null', _null_value),
    ('event_id_unique', _dup_event_id),
    ('event_type_in_domain', _bad_type),
    ('value_non_negative', _neg_value),
    ('value_le_100', _gt_100),
    ('ts_in_2024', _ts_out_of_range)) AS r("constraint", v)
"""


ORACLES["events_snapshot_diff"] = """
WITH a AS (
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events WHERE day(ts) <= 15 GROUP BY 1
),
b AS (
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events WHERE day(ts) > 15 GROUP BY 1
)
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       CASE WHEN a.user_id IS NULL THEN 'added'
            WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.n_events != b.n_events
                 OR a.sum_value != b.sum_value THEN 'changed'
            ELSE 'unchanged' END AS status,
       a.n_events AS n_events_before,
       b.n_events AS n_events_after
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
WHERE (CASE WHEN a.user_id IS NULL THEN 'added'
            WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.n_events != b.n_events
                 OR a.sum_value != b.sum_value THEN 'changed'
            ELSE 'unchanged' END) != 'unchanged'
"""


ORACLES["events_feature_hash"] = """
WITH tok AS (
    SELECT user_id,
           event_type || ':' || CAST(hour(ts) AS VARCHAR) AS t
    FROM events
),
h AS (
    SELECT user_id,
           CAST(('0x' || substr(md5('fh' || t), 1, 8)) AS BIGINT) % 64
               AS bucket,
           CASE WHEN CAST(('0x' || substr(md5('fhs' || t), 1, 8))
                     AS BIGINT) % 2 = 0
                THEN 1 ELSE -1 END AS s
    FROM tok
)
SELECT user_id, bucket, CAST(sum(s) AS BIGINT) AS weight
FROM h GROUP BY 1, 2
HAVING sum(s) != 0
"""


ORACLES["events_daily_value_quantiles"] = """
SELECT day(ts) AS day, count(*) AS n,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90
FROM events GROUP BY 1
"""


ORACLES["text_readability"] = f"""
WITH m AS (
    SELECT doc_id,
           len({_TOKS}) AS n_words,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences,
           greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS n_syllables
    FROM documents
)
SELECT doc_id,
       CAST(n_words AS INTEGER) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       206.835
           - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
           - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
           AS flesch_score
FROM m WHERE n_words > 0
"""


ORACLES["events_chi2_independence"] = """
WITH obs AS (
    SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS observed
    FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, sum(observed) AS _rt FROM obs GROUP BY 1),
ct AS (SELECT dow, sum(observed) AS _ct FROM obs GROUP BY 1),
n AS (SELECT sum(observed) AS _n FROM obs)
SELECT obs.event_type, obs.dow, obs.observed,
       CAST(_rt AS DOUBLE) * CAST(_ct AS DOUBLE) / CAST(_n AS DOUBLE)
           AS expected,
       (CAST(observed AS DOUBLE)
        - CAST(_rt AS DOUBLE) * CAST(_ct AS DOUBLE) / CAST(_n AS DOUBLE))
       * (CAST(observed AS DOUBLE)
          - CAST(_rt AS DOUBLE) * CAST(_ct AS DOUBLE) / CAST(_n AS DOUBLE))
       / (CAST(_rt AS DOUBLE) * CAST(_ct AS DOUBLE) / CAST(_n AS DOUBLE))
           AS chi2_contrib
FROM obs JOIN rt USING (event_type) JOIN ct USING (dow), n
"""


ORACLES["events_latest_per_user"] = """
WITH r AS (
    SELECT user_id, ts, event_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM r WHERE rn = 1
"""


ORACLES["events_gap_duration_stats"] = """
WITH g AS (
    SELECT event_type,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id))
               AS _gap
    FROM events
)
SELECT event_type,
       count(*) AS n_gaps,
       min(_gap) AS min_gap_us,
       max(_gap) AS max_gap_us,
       CAST(sum(_gap) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_gap_us
FROM g WHERE _gap IS NOT NULL
GROUP BY 1
"""


ORACLES["orders_running_total"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
FROM orders
"""


ORACLES["events_daily_autocorr"] = """
WITH daily AS (
    SELECT event_type, day(ts) AS day, count(*) AS c
    FROM events GROUP BY 1, 2
),
pairs AS (
    SELECT event_type, c AS x,
           lead(c) OVER (PARTITION BY event_type ORDER BY day) AS y
    FROM daily
),
s AS (
    SELECT event_type,
           count(*) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM pairs WHERE y IS NOT NULL GROUP BY 1
)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) AS lag1_autocorr
FROM s
"""


ORACLES["lineitem_basket_pairs"] = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_ab
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
),
marg AS (SELECT l_partkey AS part, count(*) AS n_part FROM items GROUP BY 1),
tot AS (SELECT count(DISTINCT l_orderkey) AS _n FROM items)
SELECT part_a, part_b, n_ab,
       (CAST(_n AS DOUBLE) * CAST(n_ab AS DOUBLE))
       / (CAST(ma.n_part AS DOUBLE) * CAST(mb.n_part AS DOUBLE)) AS lift
FROM pairs
JOIN marg ma ON ma.part = pairs.part_a
JOIN marg mb ON mb.part = pairs.part_b, tot
"""


ORACLES["suppliers_full_nation_parts"] = """
WITH shipped AS (
    SELECT DISTINCT s.s_nationkey, s.s_suppkey, l.l_partkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
),
req AS (
    SELECT s_nationkey, count(DISTINCT l_partkey) AS _req
    FROM shipped GROUP BY 1
),
got AS (
    SELECT s_nationkey, s_suppkey,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM shipped GROUP BY 1, 2
)
SELECT got.s_nationkey, got.s_suppkey, got.n_parts
FROM got JOIN req USING (s_nationkey)
WHERE got.n_parts = req._req
"""


ORACLES["events_user_streaks"] = """
WITH days AS (
    SELECT DISTINCT user_id, day(ts) AS day FROM events
),
runs AS (
    SELECT user_id, day,
           day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS _grp
    FROM days
),
streaks AS (
    SELECT user_id, _grp, count(*) AS len, min(day) AS start_day
    FROM runs GROUP BY 1, 2
),
best AS (
    SELECT user_id, len AS longest_streak, start_day AS streak_start_day,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY len DESC, start_day DESC) AS rn
    FROM streaks
)
SELECT user_id, longest_streak, streak_start_day
FROM best WHERE rn = 1 AND longest_streak >= 5
"""


ORACLES["orders_revenue_yoy_growth"] = """
WITH yearly AS (
    SELECT o_orderpriority, year(o_orderdate) AS year,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS _rev
    FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, year,
       CAST(_rev AS DOUBLE) AS revenue,
       CAST(_rev - lag(_rev) OVER w AS DOUBLE)
           / CAST(lag(_rev) OVER w AS DOUBLE) AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY year)
"""


ORACLES["orders_customer_gini"] = """
WITH per_cust AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS _rev
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT _rev, row_number() OVER (ORDER BY _rev, o_custkey) AS _i
    FROM per_cust
),
s AS (
    SELECT count(*) AS n, sum(_rev) AS sx, sum(_i * _rev) AS six
    FROM ranked
)
SELECT n AS n_customers,
       CAST(sx AS DOUBLE) AS total_revenue,
       2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
           - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM s
"""


ORACLES["streaming_enrich_parity"] = """
WITH dim AS (
    SELECT DISTINCT user_id,
           CASE WHEN user_id % 3 = 0 THEN 'gold'
                WHEN user_id % 3 = 1 THEN 'silver'
                ELSE 'bronze' END AS tier
    FROM events
)
SELECT e.event_type, d.tier,
       count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events e JOIN dim d USING (user_id)
GROUP BY 1, 2
"""


ORACLES["events_attribution_first_touch"] = """
WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT event_id AS click_id, user_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
),
cand AS (
    SELECT p.purchase_id, p.user_id, p.purchase_ts,
           c.click_ts, c.click_id
    FROM p JOIN c ON c.user_id = p.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts > p.purchase_ts - INTERVAL 86400 SECOND
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY purchase_id
                                 ORDER BY click_ts, click_id) AS rn
    FROM cand
)
SELECT purchase_id, user_id, purchase_ts,
       click_ts AS first_click_ts, click_id AS first_click_id
FROM r WHERE rn = 1
"""


ORACLES["docs_cross_source_dup_matrix"] = f"""
WITH {_TOKS_CTE},
fp AS (
    SELECT DISTINCT md5(array_to_string(t[1:12], ' ')) AS f, d.source
    FROM toks JOIN documents d USING (doc_id)
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS shared_fingerprints
FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
GROUP BY 1, 2
"""


ORACLES["events_burst_detection"] = """
WITH per_min AS (
    SELECT event_type, date_trunc('minute', ts) AS minute, count(*) AS c
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, count(*) AS n, sum(c) AS s1, sum(c * c) AS s2
    FROM per_min GROUP BY 1
)
SELECT p.event_type, p.minute, p.c,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_per_min,
       (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       / NULLIF(sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 0.0) AS z
FROM per_min p JOIN stats USING (event_type)
WHERE (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      / NULLIF(sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 0.0) > 3.0
"""


ORACLES["events_user_lifecycle"] = """
WITH days AS (
    SELECT DISTINCT user_id, day(ts) AS day FROM events
),
tagged AS (
    SELECT day,
           CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day)
                     IS NULL THEN 'new'
                WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day)
                     = day - 1 THEN 'retained'
                ELSE 'resurrected' END AS status
    FROM days
)
SELECT day,
       CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
       CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_resurrected
FROM tagged GROUP BY 1
"""


ORACLES["events_trailing_hour_sum"] = """
WITH w AS (
    SELECT event_id, user_id, ts, event_type,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) // 1000000
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_1h_value
    FROM events
)
SELECT event_id, user_id, ts, trailing_1h_value
FROM w WHERE event_type = 'purchase'
"""


ORACLES["events_multi_distinct_profile"] = """
SELECT day(ts) AS day,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(count(DISTINCT date_trunc('minute', ts)) AS BIGINT)
           AS n_active_minutes
FROM events GROUP BY 1
"""


ORACLES["events_model_score"] = """
WITH s AS (
    SELECT event_id, user_id, event_type,
           1.0 / (1.0 + exp(-(
               -2.0
               + 0.015 * CAST(value AS DOUBLE)
               + 0.05 * CAST(hour(ts) AS DOUBLE)
               + 0.3 * (CASE WHEN dayofweek(ts) + 1 IN (1, 7)
                             THEN 1.0 ELSE 0.0 END)
               + 1.2 * (CASE WHEN event_type = 'purchase'
                             THEN 1.0 ELSE 0.0 END)
           ))) AS score
    FROM events
)
SELECT * FROM s WHERE score > 0.8
"""


ORACLES["events_k_anonymity"] = """
SELECT event_type, hour(ts) AS hour,
       CAST(least(CAST(floor(value / 50) AS INTEGER), 9) AS INTEGER)
           AS value_bucket,
       count(*) AS class_size
FROM events
GROUP BY 1, 2, 3
HAVING count(*) < 5
"""


ORACLES["events_weekend_ttest"] = """
WITH agg AS (
    SELECT event_type,
           CAST(sum(CASE WHEN dayofweek(ts) + 1 IN (1, 7)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_we,
           CAST(sum(CASE WHEN dayofweek(ts) + 1 NOT IN (1, 7)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_wd,
           sum(CASE WHEN dayofweek(ts) + 1 IN (1, 7)
               THEN CAST(value AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS s_we,
           sum(CASE WHEN dayofweek(ts) + 1 NOT IN (1, 7)
               THEN CAST(value AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS s_wd,
           sum(CASE WHEN dayofweek(ts) + 1 IN (1, 7)
               THEN CAST(value AS DECIMAL(18,6))
                    * CAST(value AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS q_we,
           sum(CASE WHEN dayofweek(ts) + 1 NOT IN (1, 7)
               THEN CAST(value AS DECIMAL(18,6))
                    * CAST(value AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS q_wd
    FROM events GROUP BY 1
)
-- Portable wide casts (mirror of numerics.dec_wide_to_double via
-- _dec_wide_to_double_sql, inlined): the subtraction below cancels
-- near-equal quantities (measured condition number up to 2.5e4 vs the
-- gate's ~4.5e3 threshold), so every wide decimal sum must reach
-- double bit-identically on both engines.
, d AS (
    SELECT event_type, n_we, n_wd,
           ((CAST(CAST(CAST(CAST(s_we AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s_we AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s_we AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) AS s_we_d,
           ((CAST(CAST(CAST(CAST(s_wd AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s_wd AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s_wd AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) AS s_wd_d,
           ((CAST(CAST(CAST(CAST(CAST(CAST(q_we AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(CAST(CAST(q_we AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(CAST(CAST(q_we AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000000000.0) AS q_we_d,
           ((CAST(CAST(CAST(CAST(CAST(CAST(q_wd AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(CAST(CAST(q_wd AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(CAST(CAST(q_wd AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000000000.0) AS q_wd_d
    FROM agg
)
SELECT event_type, n_we, n_wd,
       (s_we_d / CAST(n_we AS DOUBLE)
        - s_wd_d / CAST(n_wd AS DOUBLE)) AS mean_diff,
       (s_we_d / CAST(n_we AS DOUBLE)
        - s_wd_d / CAST(n_wd AS DOUBLE))
       / sqrt((q_we_d / CAST(n_we AS DOUBLE)
               - (s_we_d / CAST(n_we AS DOUBLE))
                 * (s_we_d / CAST(n_we AS DOUBLE)))
              / CAST(n_we AS DOUBLE)
              + (q_wd_d / CAST(n_wd AS DOUBLE)
                 - (s_wd_d / CAST(n_wd AS DOUBLE))
                   * (s_wd_d / CAST(n_wd AS DOUBLE)))
                / CAST(n_wd AS DOUBLE)) AS t_stat
FROM d
"""


# fixed 64-dim embeddings (TESTDATA.md); range(0, 64) instead of a
# lateral len() because DuckDB's table-function ranges cannot see
# lateral columns (same note as the shingles CTE)
ORACLES["emb_dim_variance"] = f"""
WITH exploded AS (
    SELECT CAST(i AS INTEGER) AS dim,
           CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE) AS v
    FROM embeddings, range(0, 64) t(i)
),
stats AS (
    SELECT dim, count(*) AS n,
           {fpsum('v')} / count(*) AS mean_v,
           {fpsum('v * v')} / count(*) AS m2
    FROM exploded GROUP BY dim
)
SELECT dim, n, mean_v, (m2 - mean_v * mean_v) AS var_v FROM stats
"""


ORACLES["docs_dedup_threshold_sweep"] = f"""
WITH {_SHINGLES_CTE},
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
inter AS (
    SELECT p.doc_a, p.doc_b, count(*) AS n_common
    FROM pairs p
    JOIN sh a ON a.doc_id = p.doc_a
    JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
    GROUP BY 1, 2
),
scored AS (
    SELECT CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
               AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.2
)
SELECT t.threshold, count(*) AS n_pairs
FROM scored s
JOIN (SELECT CAST(x AS DOUBLE) AS threshold
      FROM (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) v(x)) t
  ON s.jaccard >= t.threshold
GROUP BY 1
"""


ORACLES["events_sequence_violations"] = """
WITH agg AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase,
           min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
           min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
    FROM events GROUP BY 1
)
SELECT * FROM agg
WHERE first_purchase IS NOT NULL
  AND (first_click IS NULL OR first_purchase < first_click)
  AND (first_view IS NULL OR first_purchase < first_view)
"""


ORACLES["lineitem_supplier_hhi"] = """
WITH rev AS (
    SELECT p.p_brand, l.l_suppkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS _rev
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
),
tot AS (SELECT p_brand, sum(_rev) AS _tot FROM rev GROUP BY 1)
SELECT rev.p_brand,
       CAST(sum(CAST(
           (CAST(_rev AS DOUBLE) / CAST(_tot AS DOUBLE))
           * (CAST(_rev AS DOUBLE) / CAST(_tot AS DOUBLE)) * 10000.0
           AS DECIMAL(18,6))) AS DOUBLE) AS hhi
FROM rev JOIN tot USING (p_brand)
GROUP BY 1
"""


ORACLES["events_value_benford"] = """
WITH d AS (
    SELECT CAST(floor(value / pow(10.0, floor(log10(value))))
               AS INTEGER) AS digit
    FROM events WHERE value > 0
),
obs AS (SELECT digit, count(*) AS observed FROM d GROUP BY 1),
tot AS (SELECT sum(observed) AS _n FROM obs)
SELECT digit, observed,
       CAST(observed AS DOUBLE) / CAST(_n AS DOUBLE) AS observed_share,
       log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS benford_share
FROM obs, tot
"""


ORACLES["events_bounce_rate"] = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS _new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS _sess
    FROM flagged
),
grouped AS (
    SELECT user_id, _sess, count(*) AS n_events,
           min({'ts': ts, 'event_id': event_id,
                'event_type': event_type}) AS _first
    FROM sess GROUP BY 1, 2
)
SELECT _first.event_type AS entry_type,
       count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS bounce_rate
FROM grouped GROUP BY 1
"""


ORACLES["events_top_minutes_with_ties"] = """
WITH per_min AS (
    SELECT event_type, date_trunc('minute', ts) AS minute, count(*) AS c
    FROM events GROUP BY 1, 2
)
SELECT event_type, minute, c,
       CAST(rank() OVER (PARTITION BY event_type ORDER BY c DESC)
            AS INTEGER) AS rnk
FROM per_min
QUALIFY rnk <= 3
"""


ORACLES["docs_vocab_growth"] = f"""
WITH {_TOKS_CTE},
terms AS (
    SELECT u.term, min(d.source) AS first_source
    FROM toks JOIN documents d USING (doc_id), unnest(t) AS u(term)
    GROUP BY 1
),
new_terms AS (
    SELECT first_source AS source, count(*) AS new_terms
    FROM terms GROUP BY 1
)
SELECT source, new_terms,
       CAST(sum(new_terms) OVER (ORDER BY source
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_vocab
FROM new_terms
"""


ORACLES["docs_jsonl_ingest"] = """
SELECT lang, count(*) AS n_docs
FROM documents WHERE doc_id % 97 != 0
GROUP BY 1
UNION ALL
SELECT '_quarantined' AS lang, count(*) AS n_docs
FROM documents WHERE doc_id % 97 = 0
"""


ORACLES["docs_langid_confusion"] = f"""
WITH {_TOKS_CTE},
h AS (
    SELECT doc_id,
           {", ".join(f"{_hits(lang)} AS hits_{lang}" for lang in sorted(_SW))}
    FROM toks
),
pred AS (
    SELECT doc_id,
           CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0
                THEN 'und'
                {" ".join(f"WHEN hits_{lang} = greatest(hits_de, hits_en, hits_es, hits_fr) THEN '{lang}'" for lang in sorted(_SW))}
           END AS lang_pred
    FROM h
),
cells AS (
    SELECT d.lang, p.lang_pred, count(*) AS n
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2
),
rt AS (SELECT lang, sum(n) AS _rt FROM cells GROUP BY 1)
SELECT cells.lang, lang_pred, n,
       CAST(n AS DOUBLE) / CAST(_rt AS DOUBLE) AS row_share
FROM cells JOIN rt USING (lang)
"""


ORACLES["sim_lsh_recall_eval"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q0 AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q0.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q0.query_id
                   ORDER BY {_cosine("qv", "c.v")} DESC, c.vec_id ASC)
                   AS rank
        FROM e c, q0 WHERE c.vec_id <> q0.query_id
    ) WHERE rank <= 5
),
b AS (SELECT vec_id, v, {_BUCKET} AS bucket FROM e),
qb AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
       WHERE vec_id < 10),
ann AS (
    SELECT query_id, neighbor_id FROM (
        SELECT qb.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qb.query_id
                   ORDER BY {_cosine("qv", "c.v")} DESC, c.vec_id ASC)
                   AS rank
        FROM b c JOIN qb USING (bucket) WHERE c.vec_id <> qb.query_id
    ) WHERE rank <= 5
),
hits AS (
    SELECT exact.query_id, count(*) AS n_hits
    FROM exact SEMI JOIN ann
      ON exact.query_id = ann.query_id
     AND exact.neighbor_id = ann.neighbor_id
    GROUP BY 1
)
SELECT q0.query_id,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
FROM q0 LEFT JOIN hits ON hits.query_id = q0.query_id
"""


ORACLES["dedup_minhash_error_eval"] = f"""
WITH {_SHINGLES_CTE},
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({_EQ_SUM} AS DOUBLE) / {_N_MINHASH} AS est_jaccard
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
inter AS (
    SELECT p.doc_a, p.doc_b, count(*) AS n_common
    FROM pairs p
    JOIN sh a ON a.doc_id = p.doc_a
    JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
    GROUP BY 1, 2
),
exact AS (
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
               AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.2
)
SELECT p.doc_a, p.doc_b, p.est_jaccard, e.jaccard,
       abs(p.est_jaccard - e.jaccard) AS abs_err
FROM pairs p JOIN exact e USING (doc_a, doc_b)
"""


ORACLES["events_session_duration_histogram"] = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS _new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS _sess
    FROM flagged
),
dur AS (
    SELECT epoch_us(max(ts)) - epoch_us(min(ts)) AS _dur_us
    FROM sess GROUP BY user_id, _sess
)
SELECT CAST(floor(log2(_dur_us / 1000000 + 1)) AS INTEGER)
           AS duration_bucket,
       count(*) AS n_sessions
FROM dur GROUP BY 1
"""


ORACLES["emb_label_separability"] = f"""
WITH comp AS (
    SELECT label,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
cent_long AS (
    SELECT label, pos,
           {fpsum('v')} / count(*) AS centroid
    FROM comp GROUP BY label, pos
),
cents AS (
    SELECT label AS c_label,
           list(centroid ORDER BY pos) AS cv
    FROM cent_long GROUP BY label
),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings),
scored AS (
    SELECT vec_id, label, c_label, {_cosine("qv", "cv")} AS _cos
    FROM e, cents
),
per_vec AS (
    SELECT vec_id, label,
           max(CASE WHEN label = c_label THEN _cos END) AS own_cos,
           max(CASE WHEN label != c_label THEN _cos END)
               AS best_other_cos
    FROM scored GROUP BY 1, 2
)
SELECT label,
       count(*) AS n_vectors,
       {fpsum('own_cos')} / count(*) AS mean_own_cos,
       {fpsum('best_other_cos')} / count(*) AS mean_best_other_cos
FROM per_vec GROUP BY label
"""


ORACLES["orders_size_distribution"] = """
WITH per_order AS (
    SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1
)
SELECT n_items, count(*) AS n_orders FROM per_order GROUP BY 1
"""


ORACLES["events_peak_concurrent_sessions"] = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS _new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS _sess
    FROM flagged
),
iv AS (
    SELECT min(ts) AS s, max(ts) AS e
    FROM sess GROUP BY user_id, _sess
),
bounds AS (
    SELECT day(s) AS day, s AS t, 1 AS d FROM iv
    UNION ALL
    SELECT day(s) AS day, e AS t, -1 AS d FROM iv
),
running AS (
    SELECT day,
           sum(d) OVER (PARTITION BY day ORDER BY t, d
                        ROWS UNBOUNDED PRECEDING) AS _open
    FROM bounds
)
SELECT day, CAST(max(_open) AS BIGINT) AS peak_concurrent
FROM running GROUP BY 1
"""


ORACLES["docs_dq_by_source"] = """
SELECT source,
       count(*) AS n_docs,
       CAST(count(*) FILTER (WHERE length(text) > 0) AS BIGINT)
           AS n_nonempty_text,
       CAST(count(*) FILTER (WHERE lang IN ('en','de','es','fr'))
            AS BIGINT) AS n_known_lang,
       CAST(count(*) FILTER (WHERE length(text) = n_chars) AS BIGINT)
           AS n_len_consistent,
       CAST(count(*) FILTER (WHERE length(text) = n_chars) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS len_consistency_rate
FROM documents GROUP BY 1
"""


ORACLES["events_dow_anova"] = """
WITH g AS (
    SELECT event_type, dayofweek(ts) + 1 AS dow,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,6))) AS s,
           sum(CAST(value AS DECIMAL(18,6))
               * CAST(value AS DECIMAL(18,6))) AS q
    FROM events GROUP BY 1, 2
),
t AS (
    SELECT event_type,
           count(*) AS k,
           CAST(sum(n) AS BIGINT) AS N,
           sum(s) AS S,
           sum(q) AS Q,
           list_reduce(list_prepend(0.0, list_sort(
               list(((CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) * ((CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0)
                    / CAST(n AS DOUBLE)))),
               (acc, x) -> acc + x) AS ssb_raw
    FROM g GROUP BY 1
)
-- Portable wide casts (mirror of numerics.dec_wide_to_double via
-- _dec_wide_to_double_sql, inlined): the subtraction below cancels
-- near-equal quantities (measured condition number up to 2.5e4 vs the
-- gate's ~4.5e3 threshold), so every wide decimal sum must reach
-- double bit-identically on both engines.
, d AS (
    SELECT *, ((CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) AS s_d, ((CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000000000.0) AS q_d FROM t
)
SELECT event_type,
       k AS n_groups,
       N AS n_obs,
       ((ssb_raw - s_d * s_d
                   / CAST(N AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
       / ((q_d - ssb_raw)
          / (CAST(N AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat
FROM d
"""


ORACLES["emb_quantization_report"] = """
WITH v AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
    FROM embeddings
),
s AS (
    SELECT vec_id, label, dv,
           list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale
    FROM v
),
q AS (
    SELECT vec_id, label, dv, scale,
           CASE WHEN scale = 0
                THEN list_transform(dv, x -> 0)
                ELSE list_transform(dv,
                         x -> CAST(floor(x / scale + 0.5) AS INTEGER))
           END AS qvec
    FROM s
),
e AS (
    SELECT vec_id, label, scale,
           coalesce(list_max(list_transform(range(1, len(dv) + 1),
               i -> abs(dv[i] - CAST(qvec[i] AS DOUBLE) * scale))), 0.0)
               AS max_abs_err
    FROM q
)
SELECT label,
       count(*) AS n_vectors,
       max(max_abs_err) AS worst_err,
       list_reduce(list_prepend(0.0, list_sort(list(max_abs_err))),
                   (acc, x) -> acc + x) / count(*) AS mean_err,
       CAST(count(*) FILTER (WHERE max_abs_err > scale / 2 + 1e-12)
            AS BIGINT) AS n_bound_violations
FROM e GROUP BY 1
"""


ORACLES["events_type_entropy"] = """
WITH counts AS (
    SELECT event_type,
           least(greatest(CAST(floor(value / 50) AS INTEGER), 0), 9)
               AS bucket,
           count(*) AS c
    FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(c) AS t FROM counts GROUP BY 1),
terms AS (
    SELECT counts.event_type,
           CAST(-(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                * ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                AS DECIMAL(18,6)) AS _term
    FROM counts JOIN tot USING (event_type)
)
SELECT event_type,
       CAST(sum(_term) AS DOUBLE) AS entropy,
       exp(CAST(sum(_term) AS DOUBLE)) AS perplexity
FROM terms GROUP BY 1
"""


ORACLES["docs_lang_diversity"] = """
WITH counts AS (
    SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, sum(c) AS t FROM counts GROUP BY 1),
terms AS (
    SELECT counts.source,
           CAST(-(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                * ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                AS DECIMAL(18,6)) AS _term
    FROM counts JOIN tot USING (source)
)
SELECT source,
       CAST(sum(_term) AS DOUBLE) AS entropy,
       exp(CAST(sum(_term) AS DOUBLE)) AS effective_languages
FROM terms GROUP BY 1
"""


ORACLES["docs_char_trigram_profile"] = """
WITH d AS (SELECT lang, lower(text) AS _t FROM documents),
tris AS (
    SELECT lang,
           unnest(list_transform(range(1, greatest(length(_t) - 2, 0) + 1),
                                 i -> substr(_t, CAST(i AS INTEGER), 3)))
               AS trigram
    FROM d
),
counts AS (
    SELECT lang, trigram, count(*) AS n FROM tris GROUP BY 1, 2
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY n DESC, trigram ASC) AS INTEGER) AS rnk
    FROM counts
)
SELECT lang, trigram, n, rnk FROM ranked WHERE rnk <= 3
"""


ORACLES["events_hourly_variance_explained"] = """
WITH g AS (
    SELECT event_type, hour(ts) AS hour,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,6))) AS s,
           sum(CAST(value AS DECIMAL(18,6))
               * CAST(value AS DECIMAL(18,6))) AS q
    FROM events GROUP BY 1, 2
),
t AS (
    SELECT event_type,
           CAST(sum(n) AS BIGINT) AS N,
           sum(s) AS S,
           sum(q) AS Q,
           list_reduce(list_prepend(0.0, list_sort(
               list(((CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) * ((CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0)
                    / CAST(n AS DOUBLE)))),
               (acc, x) -> acc + x) AS ssb_raw
    FROM g GROUP BY 1
)
-- Portable wide casts (mirror of numerics.dec_wide_to_double via
-- _dec_wide_to_double_sql, inlined): the subtraction below cancels
-- near-equal quantities (measured condition number up to 2.5e4 vs the
-- gate's ~4.5e3 threshold), so every wide decimal sum must reach
-- double bit-identically on both engines.
, d AS (
    SELECT *, ((CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) AS s_d, ((CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000000000.0) AS q_d FROM t
)
SELECT event_type,
       N AS n_obs,
       1.0 - (q_d - ssb_raw)
             / (q_d
                - s_d * s_d
                  / CAST(N AS DOUBLE)) AS variance_explained
FROM d
"""


ORACLES["tables_row_counts"] = """
SELECT 'region' AS table_name, count(*) AS n_rows FROM region
UNION ALL SELECT 'nation', count(*) FROM nation
UNION ALL SELECT 'customer', count(*) FROM customer
UNION ALL SELECT 'supplier', count(*) FROM supplier
UNION ALL SELECT 'part', count(*) FROM part
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'events', count(*) FROM events
UNION ALL SELECT 'documents', count(*) FROM documents
UNION ALL SELECT 'embeddings', count(*) FROM embeddings
"""


ORACLES["events_user_powerlaw_alpha"] = f"""
WITH per_user AS (
    SELECT user_id, count(*) AS x FROM events GROUP BY 1
)
SELECT count(*) AS n_users,
       max(x) AS max_events,
       1.0 + CAST(count(*) AS DOUBLE)
           / {fpsum('ln(CAST(x AS DOUBLE))')} AS alpha
FROM per_user
"""


ORACLES["events_bot_users"] = """
WITH g AS (
    SELECT user_id, ts,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))
               AS DOUBLE) / 1000000.0 AS _gap
    FROM events
),
per_user AS (
    SELECT user_id,
           count(*) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE)
               / 60000000.0 AS span_min,
           count(_gap) AS _ng,
           sum(CAST(_gap AS DECIMAL(18,6))) AS _gs,
           sum(CAST(_gap * _gap AS DECIMAL(18,6))) AS _gq
    FROM g GROUP BY 1
),
m AS (
    SELECT user_id, n_events,
           CAST(n_events AS DOUBLE) / greatest(span_min, 1.0)
               AS events_per_min,
           sqrt(CAST(_gq AS DOUBLE) / CAST(_ng AS DOUBLE)
                - (CAST(_gs AS DOUBLE) / CAST(_ng AS DOUBLE))
                  * (CAST(_gs AS DOUBLE) / CAST(_ng AS DOUBLE)))
           / (CAST(_gs AS DOUBLE) / CAST(_ng AS DOUBLE)) AS gap_cv
    FROM per_user WHERE _ng >= 10
)
SELECT user_id, n_events, events_per_min, gap_cv
FROM m WHERE events_per_min > 2.0 AND gap_cv < 0.3
"""


ORACLES["events_attribution_latency"] = """
WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT event_id AS click_id, user_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
),
cand AS (
    SELECT p.purchase_id, p.purchase_ts, c.click_ts, c.click_id
    FROM p JOIN c ON c.user_id = p.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts > p.purchase_ts - INTERVAL 86400 SECOND
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY purchase_id
                                 ORDER BY click_ts, click_id) AS rn
    FROM cand
),
lat AS (
    SELECT CAST(epoch_us(purchase_ts) - epoch_us(click_ts) AS DOUBLE)
               / 60000000.0 AS lat_min
    FROM r WHERE rn = 1
)
SELECT CAST(floor(log2(lat_min + 1.0)) AS INTEGER) AS latency_bucket,
       count(*) AS n_purchases
FROM lat GROUP BY 1
"""


ORACLES["docs_hash_partition_balance"] = """
WITH per AS (
    SELECT CAST(('0x' || substr(md5('part' || CAST(doc_id AS VARCHAR)),
                1, 8)) AS BIGINT) % 32 AS bucket,
           count(*) AS n
    FROM documents GROUP BY 1
)
SELECT count(*) AS n_buckets,
       min(n) AS min_docs,
       max(n) AS max_docs,
       CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_docs,
       CAST(max(n) AS DOUBLE) * CAST(count(*) AS DOUBLE)
           / CAST(sum(n) AS DOUBLE) AS imbalance_ratio
FROM per
"""


ORACLES["events_kpi_summary"] = """
SELECT count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_purchases,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS purchase_rate,
       CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS gmv,
       CAST(count(DISTINCT (user_id, day(ts))) AS BIGINT) AS user_days
FROM events
"""


ORACLES["lineitem_brand_price_qty_corr"] = f"""
WITH s AS (
    SELECT p.p_brand,
           count(*) AS n,
           sum(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
           sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
           sum(CAST(l_quantity AS DECIMAL(19,6))
               * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy,
           sum(CAST(l_quantity AS DECIMAL(19,6))
               * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
           sum(CAST(l_extendedprice AS DECIMAL(19,6))
               * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
)
-- Cancellation in exact decimal, assembled as integer-valued parts
-- (mirror of numerics.pearson_exact_parts: the double-first assembly
-- failed the sf0.1 gate by ~1e-11 relative — DuckDB's nonzero-scale
-- decimal->double cast double-rounds, Spark's rounds once, and
-- n*sxy - sx*sy amplifies that last ulp ~4 orders of magnitude; the
-- 10^k scale shifts below cancel algebraically in r, so every double
-- op after the portable casts is the same IEEE op on both engines).
, p AS (
    SELECT p_brand, n,
           CAST(CAST(
               CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,2))
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,2))
             AS DECIMAL(33,2)) * CAST(100 AS DECIMAL(3,0))
             AS DECIMAL(38,0)) AS num_i,
           CAST(
               CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(19,0))
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
             AS DECIMAL(38,0)) AS den_x_i,
           CAST(CAST(
               CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(26,4))
                 - CAST(sy AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2))
             AS DECIMAL(33,4)) * CAST(10000 AS DECIMAL(5,0))
             AS DECIMAL(38,0)) AS den_y_i
    FROM s
)
SELECT p_brand, n,
       {_dec_int_to_double_sql('num_i')}
       / sqrt({_dec_int_to_double_sql('den_x_i')} * {_dec_int_to_double_sql('den_y_i')})
           AS corr_qty_price
FROM p
"""


ORACLES["orders_customer_lifetime"] = """
WITH span AS (
    SELECT o_custkey,
           min(o_orderdate) AS first_o,
           max(o_orderdate) AS last_o
    FROM orders GROUP BY 1
)
SELECT CAST(floor(((year(last_o) - year(first_o)) * 12
                   + (month(last_o) - month(first_o))) / 12)
            AS INTEGER) AS lifetime_years,
       count(*) AS n_customers
FROM span GROUP BY 1
"""


ORACLES["events_transition_entropy"] = """
WITH t AS (
    SELECT user_id, event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
),
trans AS (
    SELECT cur, nxt, count(*) AS c FROM t WHERE nxt IS NOT NULL
    GROUP BY 1, 2
),
tot AS (SELECT cur, sum(c) AS tt FROM trans GROUP BY 1),
terms AS (
    SELECT trans.cur,
           CAST(-(CAST(c AS DOUBLE) / CAST(tt AS DOUBLE))
                * ln(CAST(c AS DOUBLE) / CAST(tt AS DOUBLE))
                AS DECIMAL(18,6)) AS _term
    FROM trans JOIN tot USING (cur)
)
SELECT cur, CAST(sum(_term) AS DOUBLE) AS conditional_entropy
FROM terms GROUP BY 1
"""


ORACLES["supplier_acctbal_boxstats"] = """
SELECT s_nationkey,
       count(*) AS n,
       min(s_acctbal) AS min_bal,
       quantile_cont(s_acctbal, 0.25) AS q1,
       quantile_cont(s_acctbal, 0.5) AS median,
       quantile_cont(s_acctbal, 0.75) AS q3,
       max(s_acctbal) AS max_bal
FROM supplier GROUP BY 1
"""


ORACLES["orders_reorder_consistency"] = """
WITH g AS (
    SELECT o_custkey,
           date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS _gap
    FROM orders
),
m AS (
    SELECT o_custkey,
           count(*) AS n_gaps,
           sum(_gap) AS s,
           sum(_gap * _gap) AS q
    FROM g WHERE _gap IS NOT NULL
    GROUP BY 1
    HAVING count(*) >= 4
)
SELECT o_custkey,
       CAST(n_gaps AS BIGINT) AS n_gaps,
       CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_days,
       sqrt(CAST(q AS DOUBLE) / CAST(n_gaps AS DOUBLE)
            - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
              * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
       / (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS gap_cv
FROM m
"""


ORACLES["docs_dedup_savings"] = """
WITH groups AS (
    SELECT md5(text) AS _h, source,
           count(*) AS n,
           sum(n_chars) AS chars,
           max(n_chars) AS keeper_chars
    FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(n - 1) AS BIGINT) AS n_dropped,
       CAST(sum(chars - keeper_chars) AS BIGINT) AS chars_saved,
       CAST(sum(n - 1) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS drop_rate
FROM groups GROUP BY 1
"""


ORACLES["part_type_hierarchy_stats"] = """
WITH lv AS (
    SELECT string_split(p_type, ' ')[1] AS grade,
           string_split(p_type, ' ')[2] AS finish,
           p_retailprice
    FROM part
)
SELECT grade, finish,
       count(*) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_price
FROM lv GROUP BY ROLLUP (grade, finish)
"""


ORACLES["docs_neardup_degree_distribution"] = f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
),
degree AS (
    SELECT doc, count(*) AS degree FROM (
        SELECT doc_a AS doc FROM pairs
        UNION ALL SELECT doc_b AS doc FROM pairs
    ) GROUP BY 1
)
SELECT degree, count(*) AS n_docs FROM degree GROUP BY 1
"""


ORACLES["events_time_to_first_purchase"] = """
WITH agg AS (
    SELECT user_id,
           min(ts) AS first_seen,
           min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
    FROM events GROUP BY 1
)
SELECT CAST(floor((CAST(epoch_us(first_purchase)
                        - epoch_us(first_seen) AS DOUBLE)
                   / 3600000000.0) / 24) AS INTEGER)
           AS days_to_activate,
       count(*) AS n_users
FROM agg WHERE first_purchase IS NOT NULL
GROUP BY 1
"""


ORACLES["orders_segment_priority_mix"] = """
WITH cells AS (
    SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
tot AS (SELECT c_mktsegment, sum(n) AS _t FROM cells GROUP BY 1)
SELECT cells.c_mktsegment, o_orderpriority, n,
       CAST(n AS DOUBLE) / CAST(_t AS DOUBLE) AS segment_share
FROM cells JOIN tot USING (c_mktsegment)
"""


ORACLES["events_daily_drawdown"] = """
WITH daily AS (
    SELECT day(ts) AS day,
           sum(CAST(value AS DECIMAL(18,6))) AS _gmv
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
),
run AS (
    SELECT day, _gmv,
           max(_gmv) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS _peak
    FROM daily
)
SELECT day,
       CAST(_gmv AS DOUBLE) AS gmv,
       CAST(_peak AS DOUBLE) AS peak_gmv,
       CAST(_peak - _gmv AS DOUBLE) / CAST(_peak AS DOUBLE) AS drawdown
FROM run
"""


ORACLES["docs_quality_length_matrix"] = f"""
WITH {_TOKS_CTE},
m AS (
    SELECT d.doc_id, d.n_chars,
           (CAST({_hits("en")} AS DOUBLE) / greatest(len(t), 1)) * 0.5
             + (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]',
                        '', 'g')) AS DOUBLE) / greatest(length(text), 1))
               * 0.25
             + least(CAST(len(t) AS DOUBLE) / 256.0, 1.0) * 0.25
             - (CAST(length(text) - length(regexp_replace(text, '[0-9]',
                        '', 'g')) AS DOUBLE) / greatest(length(text), 1))
               * 0.125 AS quality_score
    FROM documents d JOIN toks USING (doc_id)
)
SELECT CAST(least(greatest(CAST(floor(quality_score * 10) AS INTEGER),
                           0), 9) AS INTEGER) AS quality_bucket,
       CAST(floor(log2(n_chars + 1)) AS INTEGER) AS length_bucket,
       count(*) AS n_docs
FROM m GROUP BY 1, 2
"""


ORACLES["lineitem_returns_by_brand"] = """
SELECT p.p_brand,
       count(*) AS n_items,
       CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
           AS n_returned,
       CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS return_rate,
       CAST(sum(CASE WHEN l_returnflag = 'R'
                THEN CAST(l_extendedprice AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           AS returned_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
"""


ORACLES["events_hourly_profile_similarity"] = f"""
WITH counts AS (
    SELECT event_type, hour(ts) AS h, count(*) AS c
    FROM events GROUP BY 1, 2
),
prof AS (
    SELECT event_type,
           list_transform(
               list_sort(list({{'h': h, 'c': c}})),
               s -> CAST(s.c AS DOUBLE)) AS v
    FROM counts GROUP BY 1
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       {_cosine("a.v", "b.v")} AS profile_cosine
FROM prof a JOIN prof b ON a.event_type < b.event_type
"""


ORACLES["emb_centroid_drift"] = f"""
WITH comp AS (
    SELECT label,
           CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS half,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
cents AS (
    SELECT label, half, pos,
           {fpsum('v')} / count(*) AS m
    FROM comp GROUP BY 1, 2, 3
),
j AS (
    SELECT a.label, a.pos,
           (a.m - b.m) * (a.m - b.m) AS d2
    FROM cents a JOIN cents b
      ON a.label = b.label AND a.pos = b.pos
     AND a.half = 'a' AND b.half = 'b'
)
SELECT label,
       sqrt(list_reduce(list_prepend(0.0, list_sort(list(d2))),
                        (acc, x) -> acc + x)) AS centroid_l2_drift
FROM j GROUP BY label
"""


ORACLES["ri_check_report"] = """
SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk_edge,
       count(*) AS child_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS distinct_keys,
       CAST(count(*) FILTER (WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders)) AS BIGINT) AS orphan_rows
FROM lineitem
UNION ALL
SELECT 'lineitem.l_partkey->part.p_partkey', count(*),
       CAST(count(DISTINCT l_partkey) AS BIGINT),
       CAST(count(*) FILTER (WHERE l_partkey NOT IN
            (SELECT p_partkey FROM part)) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.l_suppkey->supplier.s_suppkey', count(*),
       CAST(count(DISTINCT l_suppkey) AS BIGINT),
       CAST(count(*) FILTER (WHERE l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier)) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders.o_custkey->customer.c_custkey', count(*),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_custkey NOT IN
            (SELECT c_custkey FROM customer)) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer.c_nationkey->nation.n_nationkey', count(*),
       CAST(count(DISTINCT c_nationkey) AS BIGINT),
       CAST(count(*) FILTER (WHERE c_nationkey NOT IN
            (SELECT n_nationkey FROM nation)) AS BIGINT)
FROM customer
UNION ALL
SELECT 'supplier.s_nationkey->nation.n_nationkey', count(*),
       CAST(count(DISTINCT s_nationkey) AS BIGINT),
       CAST(count(*) FILTER (WHERE s_nationkey NOT IN
            (SELECT n_nationkey FROM nation)) AS BIGINT)
FROM supplier
UNION ALL
SELECT 'nation.n_regionkey->region.r_regionkey', count(*),
       CAST(count(DISTINCT n_regionkey) AS BIGINT),
       CAST(count(*) FILTER (WHERE n_regionkey NOT IN
            (SELECT r_regionkey FROM region)) AS BIGINT)
FROM nation
"""


ORACLES["lineitem_linenumber_integrity"] = """
WITH per AS (
    SELECT l_orderkey, count(*) AS n,
           min(l_linenumber) AS mn, max(l_linenumber) AS mx,
           sum(l_linenumber) AS s
    FROM lineitem GROUP BY 1
)
SELECT count(*) AS n_orders,
       CAST(count(*) FILTER (WHERE NOT (mn = 1 AND mx = n
            AND s = n * (n + 1) / 2)) AS BIGINT) AS n_violations,
       CAST(max(n) AS BIGINT) AS max_lines_per_order
FROM per
"""


ORACLES["events_error_pchart"] = """
WITH daily AS (
    SELECT day(ts) AS day, count(*) AS n,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS errs
    FROM events GROUP BY 1
),
center AS (
    SELECT CAST(sum(errs) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS _p
    FROM daily
)
SELECT day, n, errs,
       CAST(errs AS DOUBLE) / CAST(n AS DOUBLE) AS error_share,
       _p AS center_line,
       _p + 3.0 * sqrt(_p * (1.0 - _p) / CAST(n AS DOUBLE)) AS ucl,
       greatest(_p - 3.0 * sqrt(_p * (1.0 - _p) / CAST(n AS DOUBLE)),
                0.0) AS lcl,
       (CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)
        > _p + 3.0 * sqrt(_p * (1.0 - _p) / CAST(n AS DOUBLE)))
       OR (CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)
           < greatest(_p - 3.0 * sqrt(_p * (1.0 - _p)
                      / CAST(n AS DOUBLE)), 0.0)) AS out_of_control
FROM daily, center
"""


ORACLES["docs_dup_shardability"] = f"""
WITH {_TOKS_CTE},
fp AS (
    SELECT t.doc_id, md5(array_to_string(t.t[1:12], ' ')) AS f, d.source
    FROM toks t JOIN documents d USING (doc_id)
),
groups AS (
    SELECT f, count(*) AS n, count(DISTINCT source) AS n_sources
    FROM fp GROUP BY 1
    HAVING count(*) > 1
)
SELECT CASE WHEN n_sources = 1 THEN 'within_source'
            ELSE 'cross_source' END AS dup_scope,
       count(*) AS n_groups,
       CAST(sum(n - 1) AS BIGINT) AS n_redundant_docs
FROM groups GROUP BY 1
"""


ORACLES["events_lorenz_concentration"] = """
WITH per_user AS (
    SELECT user_id, count(*) AS c FROM events GROUP BY 1
),
tot AS (SELECT sum(c) AS _t, count(*) AS _n FROM per_user),
ranked AS (
    SELECT row_number() OVER (ORDER BY c DESC, user_id) AS _r,
           sum(c) OVER (ORDER BY c DESC, user_id
                        ROWS UNBOUNDED PRECEDING) AS _cum
    FROM per_user
)
SELECT p.top_pct,
       CAST(ranked._r AS BIGINT) AS n_top_users,
       CAST(_cum AS DOUBLE) / CAST(_t AS DOUBLE) AS event_share
FROM ranked, tot,
     (SELECT CAST(x AS INTEGER) AS top_pct
      FROM (VALUES (1), (5), (10), (20)) v(x)) p
WHERE ranked._r = greatest(CAST(floor(_n * p.top_pct / 100)
                                AS INTEGER), 1)
"""


ORACLES["docs_fingerprint_collision_rate"] = f"""
WITH {_TOKS_CTE},
fp AS (
    SELECT DISTINCT md5(array_to_string(t, ' ')) AS fingerprint_md5,
           CAST(('0x' || substr(md5(array_to_string(t, ' ')), 1, 8))
                AS BIGINT) AS fingerprint32
    FROM toks
),
per32 AS (
    SELECT fingerprint32, count(*) AS n_md5 FROM fp GROUP BY 1
)
SELECT CAST(sum(n_md5) AS BIGINT) AS distinct_md5,
       count(*) AS distinct_fp32,
       CAST(count(*) FILTER (WHERE n_md5 > 1) AS BIGINT)
           AS colliding_fp32
FROM per32
"""


ORACLES["supplier_portfolio_breadth"] = """
WITH per AS (
    SELECT l_suppkey,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY 1
)
SELECT n_parts, count(*) AS n_suppliers FROM per GROUP BY 1
"""


ORACLES["events_session_type_lift"] = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS _new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS _sess
    FROM flagged
),
items AS (
    SELECT DISTINCT CAST(user_id AS VARCHAR) || '#'
               || CAST(_sess AS VARCHAR) AS sid,
           event_type
    FROM sess
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_ab
    FROM items a JOIN items b
      ON a.sid = b.sid AND a.event_type < b.event_type
    GROUP BY 1, 2
),
marg AS (SELECT event_type AS t, count(*) AS n_t FROM items GROUP BY 1),
tot AS (SELECT count(DISTINCT sid) AS _n FROM items)
SELECT type_a, type_b, n_ab,
       CAST(_n AS DOUBLE) * CAST(n_ab AS DOUBLE)
       / (CAST(ma.n_t AS DOUBLE) * CAST(mb.n_t AS DOUBLE)) AS lift
FROM pairs
JOIN marg ma ON ma.t = pairs.type_a
JOIN marg mb ON mb.t = pairs.type_b, tot
"""


ORACLES["events_churn_risk"] = """
WITH per_user AS (
    SELECT user_id, count(*) AS n_events, max(ts) AS last_seen,
           CAST(count(DISTINCT day(ts)) AS BIGINT) AS active_days
    FROM events GROUP BY 1
),
horizon AS (SELECT max(ts) AS _end FROM events)
SELECT user_id, n_events, active_days,
       CAST(floor(CAST(epoch_us(_end) - epoch_us(last_seen) AS DOUBLE)
                  / 86400000000.0) AS INTEGER) AS silent_days,
       CAST(n_events AS DOUBLE) / CAST(active_days AS DOUBLE)
           AS events_per_active_day
FROM per_user, horizon
WHERE floor(CAST(epoch_us(_end) - epoch_us(last_seen) AS DOUBLE)
            / 86400000000.0) >= 7
"""


ORACLES["orders_cohort_repeat"] = """
WITH first AS (
    SELECT o_custkey, min(year(o_orderdate)) AS cohort_year
    FROM orders GROUP BY 1
)
SELECT f.cohort_year,
       year(o.o_orderdate) - f.cohort_year AS age_years,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS active_customers
FROM orders o JOIN first f USING (o_custkey)
GROUP BY 1, 2
"""


ORACLES["events_user_icc"] = """
WITH g AS (
    SELECT user_id, count(*) AS n,
           sum(CAST(value AS DECIMAL(18,6))) AS s,
           sum(CAST(value AS DECIMAL(18,6))
               * CAST(value AS DECIMAL(18,6))) AS q
    FROM events GROUP BY 1
),
t AS (
    SELECT count(*) AS k,
           CAST(sum(n) AS BIGINT) AS N,
           sum(s) AS S,
           sum(q) AS Q,
           list_reduce(list_prepend(0.0, list_sort(
               list(((CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) * ((CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(s AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0)
                    / CAST(n AS DOUBLE)))),
               (acc, x) -> acc + x) AS ssb_raw
    FROM g
)
-- Portable wide casts (mirror of numerics.dec_wide_to_double via
-- _dec_wide_to_double_sql, inlined): the subtraction below cancels
-- near-equal quantities (measured condition number up to 2.5e4 vs the
-- gate's ~4.5e3 threshold), so every wide decimal sum must reach
-- double bit-identically on both engines.
, d AS (
    SELECT *, ((CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(S AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000.0) AS s_d, ((CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) + CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) - CAST(CAST(CAST(CAST(CAST(CAST(CAST(Q AS DECIMAL(31,12)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS DECIMAL(31,6)) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS DECIMAL(38,0)) AS DOUBLE)) / 1000000000000.0) AS q_d FROM t
)
SELECT k AS n_users, N AS n_events,
       ((ssb_raw - s_d * s_d
                   / CAST(N AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)
        - (q_d - ssb_raw)
          / (CAST(N AS DOUBLE) - CAST(k AS DOUBLE)))
       / ((ssb_raw - s_d * s_d
                     / CAST(N AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)
          + ((CAST(N AS DOUBLE) * CAST(N AS DOUBLE))
             / (CAST(N AS DOUBLE) * CAST(k AS DOUBLE)) - 1.0)
            * (q_d - ssb_raw)
              / (CAST(N AS DOUBLE) - CAST(k AS DOUBLE))) AS icc
FROM d
"""


ORACLES["orders_month_seasonal_index"] = """
WITH ym AS (
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS _rev
    FROM orders GROUP BY 1, 2
),
yr AS (SELECT y, sum(_rev) AS _yr FROM ym GROUP BY 1),
sh AS (
    SELECT m,
           CAST(CAST(_rev AS DOUBLE) / CAST(_yr AS DOUBLE)
                AS DECIMAL(18,6)) AS _share
    FROM ym JOIN yr USING (y)
)
SELECT m, count(*) AS n_years,
       CAST(sum(_share) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 12.0
           AS seasonal_index
FROM sh GROUP BY 1
"""


ORACLES["lineitem_ship_lag_profile"] = """
SELECT o.o_orderpriority,
       CAST(floor(date_diff('day', o.o_orderdate, l.l_shipdate) / 7)
            AS INTEGER) AS lag_weeks,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


ORACLES["events_first_session_conversion"] = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS _new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS _sess
    FROM flagged
),
per_user AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'purchase' THEN _sess END)
               AS first_purchase_sess
    FROM sess GROUP BY 1
)
SELECT count(*) AS n_converting_users,
       CAST(sum(CASE WHEN first_purchase_sess = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_first_session,
       CAST(sum(CASE WHEN first_purchase_sess = 1 THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS first_session_share
FROM per_user WHERE first_purchase_sess IS NOT NULL
"""


ORACLES["orders_status_year_matrix"] = """
WITH cells AS (
    SELECT year(o_orderdate) AS year, o_orderstatus, count(*) AS n
    FROM orders GROUP BY 1, 2
),
tot AS (SELECT year, sum(n) AS _t FROM cells GROUP BY 1)
SELECT cells.year, o_orderstatus, n,
       CAST(n AS DOUBLE) / CAST(_t AS DOUBLE) AS year_share
FROM cells JOIN tot USING (year)
"""


ORACLES["emb_1nn_label_consistency"] = f"""
-- e mirrors Spark's valid_vectors guard: unlike the other similarity
-- oracles (where an invalid vector only perturbs its own pair rows,
-- and the clean-fixture convention suffices), the LIMIT-200 panel
-- boundary is divergence-sensitive — one invalid vector inside the
-- smallest-bucket set would shift panel membership for every row.
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings
           WHERE embedding IS NOT NULL AND len(embedding) > 0
             AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x)
                             WHERE x IS NULL OR isnan(x) OR isinf(x))
             AND EXISTS (SELECT 1 FROM unnest(embedding) AS t(x)
                         WHERE x <> 0)),
probes AS (
    SELECT vec_id AS query_id, v AS qv, label AS q_label
    FROM e
    ORDER BY {_bucket_sql("1nn-panel", key="vec_id")}, vec_id
    LIMIT 200
),
nn AS (
    SELECT query_id, q_label, n_label FROM (
        SELECT p.query_id, p.q_label, c.label AS n_label,
               row_number() OVER (PARTITION BY p.query_id
                   ORDER BY {_cosine("p.qv", "c.v")} DESC, c.vec_id ASC)
                   AS _r
        FROM e c, probes p WHERE c.vec_id <> p.query_id
    ) WHERE _r = 1
)
SELECT q_label,
       count(*) AS n_probes,
       CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_label_match,
       CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS consistency
FROM nn GROUP BY 1
"""


ORACLES["orders_basket_size_trend"] = """
WITH per_order AS (
    SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1
)
SELECT year(o.o_orderdate) AS year,
       count(*) AS n_orders,
       CAST(sum(p.n_items) AS BIGINT) AS n_items,
       CAST(sum(p.n_items) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS avg_items_per_order
FROM orders o JOIN per_order p ON p.l_orderkey = o.o_orderkey
GROUP BY 1
"""


ORACLES["supplier_quartile_mobility"] = """
WITH a AS (
    SELECT l_suppkey,
           ntile(4) OVER (ORDER BY sum(CAST(l_extendedprice
               AS DECIMAL(18,6))), l_suppkey) AS q1996
    FROM lineitem WHERE year(l_shipdate) = 1996
    GROUP BY l_suppkey
),
b AS (
    SELECT l_suppkey,
           ntile(4) OVER (ORDER BY sum(CAST(l_extendedprice
               AS DECIMAL(18,6))), l_suppkey) AS q1999
    FROM lineitem WHERE year(l_shipdate) = 1999
    GROUP BY l_suppkey
)
SELECT q1996, q1999, count(*) AS n_suppliers
FROM a JOIN b USING (l_suppkey)
GROUP BY 1, 2
"""
