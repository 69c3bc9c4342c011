"""Pin the relational scale smoke's amplification contract (r11).

`tools/scale_smoke_relational.py` is judged evidence for the 100 TB
relational story, so its corpus builder must not bit-rot: amplification
must produce a COMPLETE sf_dir (all ten tables loadable), exactly
factor x N fact rows with globally distinct keys and copy 0 identical
to the source, keep referential integrity (every o_custkey resolves in
customer, every l_orderkey in orders), and the smoke's exact x-factor
result invariants must hold end-to-end through the real registry
queries at sf0.001.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from dataflow_example_spark.tables import TABLES, load

SF_DIR = "/root/testdata/sf0.001"
FACTOR = 2


@pytest.fixture(scope="module")
def amplified(spark):
    from scale_smoke_relational import amplify

    dest = tempfile.mkdtemp(prefix="relsmoke_test_")
    amplify(spark, dest, FACTOR, src=SF_DIR)
    yield dest
    shutil.rmtree(dest, ignore_errors=True)


def test_complete_sf_dir_and_fact_counts(spark, amplified):
    for name in TABLES:
        n_src = load(spark, SF_DIR, name).count()
        n_amp = load(spark, amplified, name).count()
        want = (
            FACTOR * n_src
            if name in ("customer", "orders", "lineitem")
            else n_src
        )
        assert n_amp == want, f"{name}: {n_amp} != {want}"


def test_keys_distinct_and_copy0_identical(spark, amplified):
    for name, key in (("customer", "c_custkey"), ("orders", "o_orderkey")):
        amp = load(spark, amplified, name)
        base = load(spark, SF_DIR, name)
        assert amp.select(key).distinct().count() == FACTOR * base.count()
        copy0 = amp.filter(F.col(key) < 10**8)
        assert copy0.exceptAll(base).count() == 0
        assert base.exceptAll(copy0).count() == 0


def test_referential_integrity(spark, amplified):
    c = load(spark, amplified, "customer").select("c_custkey")
    o = load(spark, amplified, "orders")
    l = load(spark, amplified, "lineitem")
    dangling_cust = o.join(
        c, o.o_custkey == c.c_custkey, "left_anti"
    ).count()
    assert dangling_cust == 0
    dangling_order = l.join(
        o.select("o_orderkey"),
        l.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).count()
    assert dangling_order == 0


def test_exact_factor_invariants_end_to_end(spark, amplified):
    """The smoke's own invariant checker passes on real registry-query
    results: base sf0.001 vs the factor-2 replica."""
    from scale_smoke_relational import INVARIANTS, check_invariants

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def results(sf_dir):
        return {
            name: {
                tuple(r[k] for k in INVARIANTS[name][0]): r.asDict()
                for r in qs[name](spark, sf_dir).collect()
            }
            for name in INVARIANTS
        }

    check_invariants(results(SF_DIR), results(amplified), FACTOR)
