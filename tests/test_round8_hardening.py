"""Round-8 hardening regressions.

Pins the behaviors introduced by the round-8 ADVICE/VERDICT fixes:

1. ANSI NULL-and-drop for the regex-extracted numeric source id in
   ``docs_source_domains`` (a malformed tag must degrade to a NULL
   shard, never an ANSI CAST error — ADVICE r7 item 2).
2. The WindowExec "No Partition Defined" warning is suppressed at the
   logger (bounded windows are pinned correct by the plan-audit rule
   ``bounded_single_partition``; the WARN spam masked real signals —
   VERDICT r7 item 4).
3. ``tools/kappa_probe.py`` is a real acceptance gate: an over-threshold
   probe outside the HARDENED allowlist exits 1 (ADVICE r7 item 1).
4. ``docs_bloom_decontaminate`` carries no explicit broadcast hint on
   the eval-side aggregate (its size is corpus-proportional for the
   synthetic split, so the plan must leave broadcast-vs-shuffle to AQE
   runtime stats — VERDICT r7 item 5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_example_spark import queries as q
from tests.conftest import SF_SMOKE


def test_source_domains_malformed_tag_degrades_to_null(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(20)
        .withColumn("source", F.lit("tagwithoutdigits"))
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = q.QUERIES["docs_source_domains"](spark, str(tmp_path)).collect()
    # one group: prefix parses, the numeric id (and hence shard) is NULL
    assert len(rows) == 1
    assert rows[0]["prefix"] == "tagwithoutdigits"
    assert rows[0]["shard"] is None
    assert rows[0]["n_docs"] == 20


def test_windowexec_warning_logger_raised_to_error(spark):
    jvm = spark.sparkContext._jvm
    lvl = jvm.org.apache.logging.log4j.LogManager.getLogger(
        "org.apache.spark.sql.execution.window.WindowExec"
    ).getLevel()
    assert str(lvl) == "ERROR"


def test_kappa_probe_gate_fails_on_unhardened_over_threshold(monkeypatch):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import kappa_probe

    # HARDENED is an EXPLICIT literal (r9, ADVICE): a probe added to the
    # source is NOT automatically exempt — the old frozenset(PROBES)
    # made the gate tautological. It must stay a strict subset contract:
    # every hardened name corresponds to a real probe.
    assert kappa_probe.HARDENED <= frozenset(kappa_probe.PROBES)

    # a NEW over-threshold assembly (not in the literal allowlist — the
    # default for anything a developer adds) must flip the exit code to 1
    monkeypatch.setattr(
        kappa_probe,
        "PROBES",
        {"new_unhardened_assembly": lambda con: kappa_probe.THRESHOLD * 10},
    )
    monkeypatch.setattr(
        sys, "argv", ["kappa_probe.py", "--sf", SF_SMOKE]
    )
    assert kappa_probe.main() == 1

    # and a passing new assembly keeps exit 0
    monkeypatch.setattr(
        kappa_probe,
        "PROBES",
        {"new_safe_assembly": lambda con: 1.0},
    )
    assert kappa_probe.main() == 0


def test_kappa_probe_detects_removed_portable_cast(monkeypatch):
    """Mutation test (VERDICT r8 item 5): hardened assemblies' regression
    vector is someone stripping the portable cast from the query source
    (kappa itself is intrinsic conditioning and cannot regress). Mutate a
    hardened query to a marker-free body and the gate must exit 1."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import kappa_probe

    # current source: every hardened query carries its marker
    assert kappa_probe.hardening_markers_missing() == []

    def mutated_query(spark, sf_dir):
        # simulates the regression: statistic rebuilt with plain casts
        return None

    monkeypatch.setitem(q.QUERIES, "lineitem_corr_stats", mutated_query)
    assert kappa_probe.hardening_markers_missing() == ["lineitem_corr_stats"]

    # and the gate surfaces it as exit 1 even when every kappa passes
    monkeypatch.setattr(
        kappa_probe, "PROBES", {"new_safe_assembly": lambda con: 1.0}
    )
    monkeypatch.setattr(sys, "argv", ["kappa_probe.py", "--sf", SF_SMOKE])
    assert kappa_probe.main() == 1


def test_bloom_decontaminate_has_no_forced_broadcast(spark):
    df = q.QUERIES["docs_bloom_decontaminate"](spark, SF_SMOKE)
    # the logical plan must not carry a broadcast hint: with AQE on, the
    # runtime decides from the aggregated relation's actual stats; a
    # forced hint would OOM the driver at 100 TB where the synthetic
    # eval split is corpus-proportional
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint broadcast" not in logical
    assert "ResolvedHint (strategy=broadcast)" not in logical
