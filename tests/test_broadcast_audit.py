"""tools/broadcast_audit.py contract: the static taint rule must catch
the exact shape VERDICT r11 flagged (F.broadcast of a filter-only
derivation of an SF-scaling table) and must NOT flag the sanctioned
alternatives (dim_bcast, .agg-bounded, .limit-bounded, constant dims).
"""

from __future__ import annotations

import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.broadcast_audit import audit_file  # noqa: E402


def _audit(src: str, tmp_path: Path) -> list[str]:
    p = tmp_path / "snippet.py"
    p.write_text(textwrap.dedent(src))
    return audit_file(p)


def test_catches_pre_r12_emb_1nn_shape(tmp_path):
    # the literal pre-fix shape: 10%-of-corpus panel, forced broadcast
    fails = _audit(
        """
        def emb_1nn(spark, sf_dir):
            emb = valid_vectors(load(spark, sf_dir, "embeddings"))
            probes = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id")
            return cand.crossJoin(F.broadcast(probes))
        """,
        tmp_path,
    )
    assert len(fails) == 1 and "embeddings" in fails[0]


def test_limit_bounds_the_panel(tmp_path):
    # the r12 fix: orderBy(hash).limit(200) -> bounded, allowed
    fails = _audit(
        """
        def emb_1nn(spark, sf_dir):
            emb = valid_vectors(load(spark, sf_dir, "embeddings"))
            probes = emb.orderBy("_hb", "vec_id").limit(200).select("vec_id")
            return cand.crossJoin(F.broadcast(probes))
        """,
        tmp_path,
    )
    assert fails == []


def test_global_agg_bounds(tmp_path):
    fails = _audit(
        """
        def q(spark, sf_dir):
            ev = load(spark, sf_dir, "events")
            tot = ev.agg(F.count(F.lit(1)).alias("_n"))
            return per.crossJoin(F.broadcast(tot))
        """,
        tmp_path,
    )
    assert fails == []


def test_dim_bcast_is_never_flagged(tmp_path):
    fails = _audit(
        """
        def q(spark, sf_dir):
            part = load(spark, sf_dir, "part")
            brand = part.filter(F.col("p_brand") == "Brand#13")
            return li.join(dim_bcast(brand, sf_dir, "part"), "p_partkey")
        """,
        tmp_path,
    )
    assert fails == []


def test_constant_dims_allowed(tmp_path):
    fails = _audit(
        """
        def q(spark, sf_dir):
            n = load(spark, sf_dir, "nation")
            return s.join(F.broadcast(n), "n_nationkey")
        """,
        tmp_path,
    )
    assert fails == []


def test_taint_flows_through_join_and_wrappers(tmp_path):
    fails = _audit(
        """
        def q(spark, sf_dir):
            docs = hash_sample(load(spark, sf_dir, "documents"), "doc_id", 0.1)
            side = docs.select("doc_id").withColumnRenamed("doc_id", "d")
            both = side.join(other, "d")
            return big.join(F.broadcast(both), "d")
        """,
        tmp_path,
    )
    assert len(fails) == 1 and "documents" in fails[0]


def test_registry_is_clean():
    repo = Path(__file__).resolve().parent.parent
    assert audit_file(repo / "dataflow_example_spark" / "queries.py") == []


def test_nested_def_reported_once_for_inner(tmp_path):
    # nested defs get their own pass with a fresh env; the outer pass
    # must not descend (pre-fix this reported the violation twice)
    fails = _audit(
        """
        def outer(spark, sf_dir):
            def inner():
                emb = load(spark, sf_dir, "embeddings")
                probes = emb.filter(x)
                return c.crossJoin(F.broadcast(probes))
            return inner
        """,
        tmp_path,
    )
    assert len(fails) == 1 and "(inner)" in fails[0]
