"""Dirty-input robustness sweep: run every registry query against copies
of the ten tables with adversarial rows appended.

The empty sweep (tools/empty_input_sweep.py) pins the degenerate limit;
this sweep pins the other input-shape hazard class a 100 TB corpus is
guaranteed to contain: NULLs in every nullable column, NaN/Inf doubles,
zero-norm / empty / wrong-dimension embedding vectors, empty and
whitespace and unicode text, malformed JSON props, source tags with no
numeric suffix, epoch-0 and far-future timestamps, dangling foreign
keys, and duplicate primary keys. Under the pinned
``spark.sql.ansi.enabled=true`` each of these is a potential runtime
crash (CAST/DIVIDE errors), not a silent wrong answer — so "survives
dirty input" is a checkable no-crash property, matching the session's
documented NULL-and-drop contract for unparseable values.

    python tools/dirty_input_sweep.py [names...]

Builds the dirty tables (real sf0.001 data + adversarial tail rows,
schema-identical) under a temp dir on each run. A query passes if it
executes to completion; row counts are informational (dirty rows may
legitimately join away, NULL out, or add groups).
"""

from __future__ import annotations

import glob
import sys
import tempfile
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.001"

NAN = float("nan")
INF = float("inf")
# timestamp[us] extremes that still fit DuckDB/Spark/Arrow ranges
TS_EPOCH = 0  # 1970-01-01
TS_FAR = 253370764800000000  # 9999-01-01 in microseconds
LONG_TEXT = ("lorem ipsum dolor sit amet " * 4000).strip()  # ~100 KB
UNICODE = "naïve café 你好 🚀  line sep \x00null? tab\there"

# Per-table adversarial tail rows (column -> list of values; all lists
# the same length per table). None = NULL. IDs are huge so they cannot
# collide with real keys, except the explicit duplicate-key rows.
DIRTY: dict[str, dict[str, list]] = {
    "customer": {
        "c_custkey": [900001, 900002, 900003, 1],
        "c_name": [None, "", UNICODE, "dup-key-row"],
        "c_nationkey": [None, 999, -1, 0],
        "c_acctbal": [None, NAN, -INF, 0.0],
        "c_mktsegment": [None, "", "BUILDING", "NOSUCHSEG"],
    },
    "documents": {
        "doc_id": [900001, 900002, 900003, 900004, 900005, 900006],
        "text": [None, "", "   \t\n  ", UNICODE, LONG_TEXT, "a"],
        "lang": [None, "", "zz", "en", None, "en"],
        "source": [None, "", "no-digit-tail", "web-7", "web-", "web-900006"],
        "n_chars": [None, 0, 7, len(UNICODE), len(LONG_TEXT), -5],
    },
    "embeddings": {
        "vec_id": [900001, 900002, 900003, 900004, 900005, 900006, 1],
        "embedding": [
            None,  # NULL vector
            [],  # empty vector
            None,  # placeholder -> zero-norm, filled below
            None,  # placeholder -> NaN element, filled below
            None,  # placeholder -> Inf element, filled below
            [1.0, 2.0],  # wrong (short) dimension
            None,  # duplicate vec_id with NULL vector
        ],
        "label": [None, -1, 0, 999, 0, 0, None],
    },
    "events": {
        "event_id": [900001, 900002, 900003, 900004, 900005, 1],
        "ts": [None, TS_EPOCH, TS_FAR, None, TS_EPOCH, TS_FAR],
        "user_id": [None, -1, 900001, 0, None, 900001],
        "event_type": [None, "", "click", "NOSUCHTYPE", UNICODE, "click"],
        "value": [None, NAN, INF, -INF, 0.0, -1.0],
        "props": [None, "", "{not json", '{"a":', "[1,2", '{"k":"v"}'],
    },
    "lineitem": {
        "l_orderkey": [900001, 900002, 900003, 900004],
        "l_partkey": [None, -1, 900001, 1],
        "l_suppkey": [None, -1, 900001, 1],
        "l_linenumber": [None, 0, -1, 99],
        "l_quantity": [None, NAN, -1.0, 0.0],
        "l_extendedprice": [None, NAN, INF, -0.0],
        "l_discount": [None, NAN, 2.0, -1.0],
        "l_tax": [None, NAN, INF, 0.0],
        "l_returnflag": [None, "", "R", "?"],
        "l_linestatus": [None, "", "F", "?"],
        "l_shipdate": [None, TS_EPOCH, TS_FAR, None],
    },
    "nation": {
        "n_nationkey": [900001, 900002],
        "n_name": [None, ""],
        "n_regionkey": [None, 999],
    },
    "orders": {
        "o_orderkey": [900001, 900002, 900003, 900004],
        "o_custkey": [None, -1, 900001, 1],
        "o_orderstatus": [None, "", "F", "?"],
        "o_totalprice": [None, NAN, -INF, 0.0],
        "o_orderdate": [None, TS_EPOCH, TS_FAR, None],
        "o_orderpriority": [None, "", "1-URGENT", "9-NOPRIO"],
    },
    "part": {
        "p_partkey": [900001, 900002, 900003, 900004],
        "p_name": [None, "", UNICODE, "dup"],
        "p_brand": [None, "", "Brand#1", "Brand#1"],
        "p_type": [None, "", "single", "a b c d e"],
        "p_size": [None, -1, 0, 999],
        "p_retailprice": [None, NAN, INF, 0.0],
    },
    "region": {
        "r_regionkey": [900001],
        "r_name": [None],
    },
    "supplier": {
        "s_suppkey": [900001, 900002, 900003],
        "s_name": [None, "", "Supplier#900003"],
        "s_nationkey": [None, 999, 0],
        "s_acctbal": [None, NAN, -INF],
    },
}


def _embedding_specials(dim: int) -> None:
    """Fill the zero-norm / NaN / Inf embedding rows at the real
    dimensionality (read from the source table)."""
    emb = DIRTY["embeddings"]["embedding"]
    emb[2] = [0.0] * dim
    emb[3] = [NAN] + [0.1] * (dim - 1)
    emb[4] = [INF] + [0.1] * (dim - 1)


def build_dirty_tables(dest: str) -> None:
    for f in sorted(glob.glob(f"{SRC}/*.parquet")):
        name = Path(f).stem
        real = pq.read_table(f)
        schema = real.schema
        if name == "embeddings":
            first = real.column("embedding")[0].as_py()
            _embedding_specials(len(first))
        cols = DIRTY[name]
        arrays = [
            pa.array(cols[fld.name], type=fld.type) for fld in schema
        ]
        tail = pa.table(arrays, schema=schema)
        pq.write_table(pa.concat_tables([real, tail]), f"{dest}/{name}.parquet")


def main() -> int:
    from dataflow_example_spark import queries as Q
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    dest = tempfile.mkdtemp(prefix="dfx_dirty_")
    build_dirty_tables(dest)
    spark = get_spark(app_name="dirty-sweep", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(Q.QUERIES)
    fails = []
    for name in names:
        t0 = time.time()
        try:
            df = Q.QUERIES[name](spark, dest)
            # noop write, not count(): count() lets Catalyst prune final
            # projections, hiding crashes in output expressions
            df.write.format("noop").mode("overwrite").save()
            print(f"ok    {name} ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 - sweep reports, not raises
            first = str(e).strip().splitlines()
            fails.append(name)
            print(f"FAIL  {name}: {first[0][:200] if first else type(e).__name__}")
        finally:
            cleanup()
    print(f"{len(names) - len(fails)}/{len(names)} queries survive dirty input")
    if fails:
        print("failures:", ", ".join(fails))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
