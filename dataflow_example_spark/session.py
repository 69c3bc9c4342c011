"""SparkSession factory.

The reference delegates all execution configuration to the Dataflow runner
(runTrafficMaxLaneFlow.sh:4-6, autoscaling 1-4 workers). Spark makes those
choices explicit; this factory pins the ones that affect semantics or scale:

- **UTC session timezone** — the reference parses ``MM/dd/yyyy HH:mm:ss``
  with the JVM default zone (TrafficMaxLaneFlow.java:174-175, an implicit
  dependency); we pin UTC so results are environment-independent.
- **AQE on** — runtime shuffle-partition coalescing and skew-join handling;
  at 100 TB this is what keeps a static ``spark.sql.shuffle.partitions``
  from being wrong in both directions.
- **Arrow on** — pandas-UDF paths (beyond-reference operators) use Arrow
  batches, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

# require this much free tmpfs before adopting it for shuffle scratch —
# far above anything local-mode runs write (MBs), far below the sandbox's
# 126 GiB /dev/shm, and a natural "not on a RAM-starved box" guard.
_TMPFS_MIN_FREE_BYTES = 8 * 1024**3


def _default_local_dir(master: str) -> str | None:
    """Scratch dir (``spark.local.dir``) for LOCAL-mode sessions.

    Shuffle blocks, spills and the bypass-merge file concatenation all
    land on ``spark.local.dir``; on this sandbox that defaults to /tmp on
    a virtio disk whose write throughput is *burst-throttled* — measured
    in-round (OPTIMIZATION_r16.md "Inherited state"): the first ~100 MB
    written after an idle period sustains 3-4 MB/s before recovering to
    250 MB/s, so any query shuffling real bytes periodically pays tens of
    seconds for single-digit MB of scratch I/O (the flagship's 138-456 s
    cold outliers across r14-r16 all trace to exactly this — executor
    stacks sit in BypassMergeSortShuffleWriter/FileChannelImpl.map, ~5 s
    CPU out of ~80 s wall). Local mode's scratch traffic is MB-scale by
    construction, so tmpfs is the right medium: this is the local-mode
    equivalent of provisioning adequate shuffle SSDs on a real cluster
    (guide §2.1: "local disk bandwidth for shuffle files can be the
    tighter limit"), not a data-size-dependent tune.

    Resolution order:
    - ``$SPARK_GRAFT_LOCAL_DIR`` — explicit override (empty string means
      "leave Spark's default alone");
    - ``/dev/shm/spark-local`` when the session is local-mode and tmpfs
      has comfortable headroom;
    - otherwise ``None`` (Spark's own default). Non-local masters always
      get ``None``: on a real cluster shuffle data exceeds RAM and
      local dirs are the cluster operator's call.
    """
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env is not None:
        return env or None
    if not master.startswith("local"):
        return None
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize >= _TMPFS_MIN_FREE_BYTES:
            d = os.path.join(shm, "spark-local")
            os.makedirs(d, exist_ok=True)
            return d
    except OSError:
        pass
    return None


def get_spark(
    app_name: str = "dataflow-example-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's semantic defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` via spark-submit and these
    configs still apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    # local[N] runs executors inside the driver JVM, so the driver heap is
    # the *entire* executor memory budget: 8g with 32 concurrent tasks GC-
    # thrashes under shuffle-heavy queries (observed 2-4x timing variance
    # at sf0.1). 48g leaves headroom on the 128 GiB sandbox while staying
    # irrelevant on a real cluster, where executors get their own JVMs.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
    )
    local_dir = _default_local_dir(master)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    builder = (
        builder
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Spark 4 default, pinned so a deployment that flipped the
        # cluster default cannot change semantics: every parse path uses
        # try_cast/try_to_timestamp, so malformed input still degrades to
        # NULL-and-drop rather than job failure, while genuine overflow
        # (e.g. numerics.fixed_point_sum outside its documented domain)
        # raises instead of silently wrapping.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _silence_bounded_window_warning(spark)
    return spark


def _silence_bounded_window_warning(spark: SparkSession) -> None:
    """Raise the WindowExec logger to ERROR.

    Every unpartitioned window in this repo runs over a *bounded*
    relation — per-partition totals (ranking.py), per-month/day/source
    aggregates, or an already-reduced top-k — pinned by the plan-audit
    rule ``bounded_single_partition`` (tools/plan_audit.py). The stock
    "No Partition Defined ... single partition" WARN fired 229 times in
    the round-7 gate log, drowning real signals, so it is suppressed
    here at the logger (not globally via setLogLevel). An *unbounded*
    single-partition window would still be caught: the plan audit fails
    any WindowExec without a partition spec that is not fed by an
    aggregation or limit.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments: warning is cosmetic, never fail


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's *runtime-settable* semantic defaults to an
    externally created session (e.g. the driver harness's).

    Only touches confs that are safe to set post-launch; idempotent, so
    the registry wrapper re-applies it before every query — a prior
    query (or an external tool like the plan audit, which disables AQE
    on its own session) can never leak conf state into the next run.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    _silence_bounded_window_warning(spark)
    return spark
