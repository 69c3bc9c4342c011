"""Explicit schemas for the traffic pipeline.

The reference declares three schemas in code: the positional CSV layout
(TrafficMaxLaneFlow.java:192-200), the ``LaneInfo`` POJO
(TrafficMaxLaneFlow.java:94-126, all fields @Nullable), and the BigQuery
output ``TableSchema`` (TrafficMaxLaneFlow.java:282-295). We declare the
same three as StructTypes — never inferred, because the positional parse
semantics must be reproduced exactly (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

N_LANES = 8

# Timestamp format of field 0 (TrafficMaxLaneFlow.java:174-175).
TS_FORMAT_SPARK = "MM/dd/yyyy HH:mm:ss"
TS_FORMAT_DUCKDB = "%m/%d/%Y %H:%M:%S"

# Minimum field count. The reference guards `items.length < 48`
# (TrafficMaxLaneFlow.java:187) but lane 8 reads items[48], so a row with
# exactly 48 fields crashes the reference (latent off-by-one,
# SURVEY.md §2.3 item 2). We require >= 49 — identical on valid data,
# drop-instead-of-crash on the 48-field edge. Documented deviation.
MIN_FIELDS = 49

# Intermediate one-row-per-(reading, lane) record; LaneInfo equivalent.
# `lane_idx` (1..8) is carried alongside the reference's "lane1".."lane8"
# string (TrafficMaxLaneFlow.java:207) because the deterministic max-by
# tie-break orders on it.
LANE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.StringType()),
        T.StructField("lane", T.StringType()),
        T.StructField("lane_idx", T.IntegerType()),
        T.StructField("direction", T.StringType()),
        T.StructField("freeway", T.StringType()),
        T.StructField("recorded_timestamp", T.StringType()),
        T.StructField("lane_flow", T.IntegerType()),
        T.StructField("lane_avg_occ", T.DoubleType()),
        T.StructField("lane_avg_speed", T.DoubleType()),
        T.StructField("total_flow", T.IntegerType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

# Output table; mirrors FormatMaxesFn.getSchema()
# (TrafficMaxLaneFlow.java:282-295). BigQuery INTEGER is 64-bit but the
# source values are Java Integer — IntegerType is faithful to the data.
MAX_LANE_FLOW_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.StringType()),
        T.StructField("direction", T.StringType()),
        T.StructField("freeway", T.StringType()),
        T.StructField("lane_max_flow", T.IntegerType()),
        T.StructField("lane", T.StringType()),
        T.StructField("avg_occ", T.DoubleType()),
        T.StructField("avg_speed", T.DoubleType()),
        T.StructField("total_flow", T.IntegerType()),
        T.StructField("recorded_timestamp", T.StringType()),
        T.StructField("window_timestamp", T.TimestampType()),
    ]
)
