"""Streaming quantile maintenance: per-group log₂ histograms folded
across micro-batches.

The batch operator (``sketches.log_hist_quantiles``) answers "p50/p90/
p99 of THIS table"; the streaming form SUMS every arriving micro-
batch's bucket counters into one versioned histogram table, so
"quantiles per group so far" is answerable at any time in
O(groups · 64) state — never a per-value buffer.  Relative error is
bounded by the bucket width exactly as in the batch sketch (estimate =
1.5·2^b for true value ∈ [2^b, 2^{b+1})).

State layout matches the other maintainers (immutable versioned
parquet + atomic json pointer):

    hist/v{n}/     histogram table (g, bucket, cnt), ≤ groups·64 rows
    state.json     atomic pointer {version, last_batch_id, ...}

Like the count-min fold (and UNLIKE the HLL max-merge), summing
counters is NOT idempotent — replaying a batch double-counts — so
exactly-once rides the recorded foreachBatch ``batch_id``: replays of
a recorded batch are SKIPPED, and that skip is load-bearing (tested by
replaying a batch and asserting the histogram is unchanged).

Reference analog: Polar's Cassini test harness reports per-class
latency percentiles over windows (src/agents/cassini/test/README.md);
this is the bounded-state form of that rollup a 1000-executor stream
deploys.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from polar_spark.operators.sketches import log2_bucket


def quantiles_from_hist(
    hist: DataFrame, qs: list[float], group_col: str = "g"
) -> DataFrame:
    """Per-group quantile estimates from a (g, bucket, cnt) histogram —
    the same deterministic rank rule as ``log_hist_quantiles``
    (rank = CEIL(q·N), first bucket whose cumulative count reaches it),
    factored out so the batch sketch and the streaming state share it."""
    w = Window.partitionBy("g").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("g").agg(F.sum("cnt").alias("tot"))
    qrows = tot.select(
        "g", "tot", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    picked = (
        cum.join(qrows, "g")
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("tot")))
        .groupBy(F.col("g").alias(group_col), "q")
        .agg(F.min("bucket").alias("bucket"))
    )
    return picked.select(
        group_col,
        "q",
        (F.lit(1.5) * F.pow(F.lit(2.0), F.col("bucket").cast("double"))).alias("est"),
    )


class QuantileMaintainer:
    """Versioned log₂-histogram state, counter-summed per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        value_col: str = "v",
        group_col: str = "g",
        retention: int = 3,
    ) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.value_col = value_col
        self.group_col = group_col
        self.retention = retention
        os.makedirs(os.path.join(work_dir, "hist"), exist_ok=True)
        self._state_path = os.path.join(work_dir, "state.json")

    def state(self) -> dict | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)

    def histogram(self) -> DataFrame | None:
        s = self.state()
        if s is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.work_dir, "hist", f"v{s['version']}")
        )

    def _gc(self, current_version: int) -> None:
        base = os.path.join(self.work_dir, "hist")
        for d in os.listdir(base):
            if d.startswith("v") and int(d[1:]) <= current_version - self.retention:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    def _batch_hist(self, df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.col(self.group_col).alias("g"),
                log2_bucket(F.col(self.value_col)).alias("bucket"),
            )
            .agg(F.count("*").cast("long").alias("cnt"))
        )

    def apply_batch(self, df: DataFrame, batch_id: int | None = None) -> dict:
        """Folds one micro-batch: bucket its values, SUM counters into
        the state histogram, write the new version, swap the pointer.
        Counter sums are NOT idempotent, so recorded ``batch_id``
        replays MUST be skipped (the count-min discipline) — this guard
        is the exactly-once mechanism, not an optimization."""
        s = self.state()
        if (
            batch_id is not None
            and s is not None
            and s.get("last_batch_id") is not None
            and batch_id <= s["last_batch_id"]
        ):
            return {**s, "skipped_replay": True}
        batch = self._batch_hist(df)
        prev = self.histogram()
        merged = (
            batch
            if prev is None
            else prev.unionByName(batch)
            .groupBy("g", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        nv = (s["version"] + 1) if s else 1
        path = os.path.join(self.work_dir, "hist", f"v{nv}")
        merged.write.mode("overwrite").parquet(path)
        new_state = {
            "version": nv,
            "last_batch_id": batch_id,
            "batch_rows": df.count(),
            "hist_rows": self.spark.read.parquet(path).count(),
        }
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, self._state_path)  # atomic pointer swap
        self._gc(nv)
        return new_state

    def quantiles(self, qs: list[float] | None = None) -> DataFrame:
        """Current per-group quantile estimates from the state."""
        qs = qs or [0.5, 0.9, 0.99]
        hist = self.histogram()
        if hist is None:
            return self.spark.createDataFrame(
                [], f"{self.group_col} string, q double, est double"
            )
        return quantiles_from_hist(hist, qs, self.group_col)


def start_quantile_maintenance(
    stream: DataFrame, maintainer: QuantileMaintainer, checkpoint: str
) -> StreamingQuery:
    """foreachBatch driver: availableNow drains the backlog and stops."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maintainer.apply_batch(batch_df, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
