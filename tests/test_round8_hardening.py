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

    # the shipped probes are all hardened -> allowlisted at import time
    assert kappa_probe.HARDENED == frozenset(kappa_probe.PROBES)

    # a NEW over-threshold assembly (added after import, so not in the
    # frozen allowlist) must flip the exit code to 1
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


def test_bloom_decontaminate_has_no_forced_broadcast(spark):
    df = q.QUERIES["docs_bloom_decontaminate"](spark, SF_SMOKE)
    # the logical plan must not carry a broadcast hint: with AQE on, the
    # runtime decides from the aggregated relation's actual stats; a
    # forced hint would OOM the driver at 100 TB where the synthetic
    # eval split is corpus-proportional
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint broadcast" not in logical
    assert "ResolvedHint (strategy=broadcast)" not in logical
