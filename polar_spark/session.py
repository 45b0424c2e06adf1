"""SparkSession factory.

Local-mode settings mirror what we would submit cluster-side via
``spark-submit --py-files``: AQE on (runtime skew-join splitting for
hub vertices), Arrow on (every Python-side operator is
pandas/Arrow-vectorized, never per-row), shuffle partitions sized to
cores rather than the 200 default.  At 100 TB these become
cluster-level equivalents (shuffle partitions ~ 2-3x total cores,
executor memory sizing) — the code itself is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "polar_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster the submitter sets master/executors and this factory
    only contributes SQL confs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    # Shuffle/local dirs on tmpfs: local-mode shuffles are disk I/O bound
    # otherwise and stop scaling with cores (cluster equivalent: local
    # NVMe via spark.local.dir / YARN local dirs).
    local_dir = os.environ.get("POLAR_SPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/polar-spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("POLAR_SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge when size conditions are
        # met (guide §3.1/§9): removes the two per-join sorts that SMJ
        # pays; iterative loops already pin shuffle_hash via hints, this
        # extends the choice to unhinted joins.  Interleaved A/B at
        # sf0.1 (wl/scan/tie/steiner/item_cf panel): 46.5/44.5 s vs
        # 54.6/46.4 s with SMJ preferred.  Scale posture: AQE skew-join
        # stays on and the AQE local-map threshold below converts only
        # bounded build sides, so a cluster run keeps SMJ's graceful
        # spill where partitions are actually large.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        # map_concat with duplicate keys: update wins — the graph-store
        # props-merge (SET semantics) depends on this
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
