"""Streaming exact deduplication: a seen-hash table maintained across
micro-batches.

The batch operator (``dedup.exact_dedup``) answers "which rows survive
within THIS table"; a training-data ingest needs the streaming form —
"which of the rows arriving NOW were never seen before, across every
batch so far".  State is the content-hash table itself (one sha256 +
first doc id per distinct content — the minimal exactly-once dedup
state), kept as immutable versioned parquet with an atomic json
pointer, the same durability layout as ``RankMaintainer``:

    seen/v{n}/    immutable seen-hash versions
    state.json    atomic pointer {version, seen, batch_kept, ...}

Idempotent under at-least-once delivery: replaying a batch keeps
nothing new (every hash already in the seen table), so the maintainer
composes with checkpointed foreachBatch exactly like the graph
maintainers.  At 100 TB the seen table is big but hash-partitioned and
joined by its key only (one shuffle-or-broadcast semi-join per batch);
no driver-side state.

Reference analog: Polar's single-writer actor serializes merges to
keep nodes unique (SURVEY §2.3 M1); this is the set-oriented streaming
equivalent for content identity.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


class DedupMaintainer:
    """Versioned seen-hash state with per-batch novelty filtering."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        retention: int = 3,
    ) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.text_col = text_col
        self.id_col = id_col
        self.retention = retention
        os.makedirs(os.path.join(work_dir, "seen"), exist_ok=True)
        self._state_path = os.path.join(work_dir, "state.json")

    def state(self) -> dict | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)

    def seen(self) -> DataFrame | None:
        s = self.state()
        if s is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.work_dir, "seen", f"v{s['version']}")
        )

    def _gc(self, current_version: int) -> None:
        base = os.path.join(self.work_dir, "seen")
        for d in os.listdir(base):
            if d.startswith("v") and int(d[1:]) <= current_version - self.retention:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    def apply_batch(self, docs: DataFrame) -> dict:
        """Filters the batch to first-seen content and folds its hashes
        into the seen table.  Within a batch, duplicates keep the
        smallest id (deterministic); across batches, previously seen
        hashes drop via one anti-join on the hash key.  Returns the new
        state dict (version, seen, batch_rows, batch_kept)."""
        hashed = docs.select(
            F.col(self.id_col).alias("id"),
            F.sha2(F.col(self.text_col).cast("binary"), 256).alias("h"),
        )
        batch_rows = hashed.count()
        # within-batch: min id per hash (one map-side-combinable agg)
        firsts = hashed.groupBy("h").agg(F.min("id").alias("id"))
        prev = self.seen()
        novel = firsts if prev is None else firsts.join(prev, "h", "left_anti")
        s = self.state()
        nv = (s["version"] + 1) if s else 1
        new_seen = novel if prev is None else prev.unionByName(novel)
        path = os.path.join(self.work_dir, "seen", f"v{nv}")
        new_seen.write.mode("overwrite").parquet(path)
        seen_n = self.spark.read.parquet(path).count()
        kept = novel.count()
        new_state = {
            "version": nv,
            "seen": seen_n,
            "batch_rows": batch_rows,
            "batch_kept": kept,
        }
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, self._state_path)  # atomic pointer swap
        self._gc(nv)
        return new_state

    def kept_ids(self, docs: DataFrame) -> DataFrame:
        """The ids :meth:`apply_batch` would keep for ``docs`` —
        side-effect-free preview (same plan, no state fold)."""
        hashed = docs.select(
            F.col(self.id_col).alias("id"),
            F.sha2(F.col(self.text_col).cast("binary"), 256).alias("h"),
        )
        firsts = hashed.groupBy("h").agg(F.min("id").alias("id"))
        prev = self.seen()
        novel = firsts if prev is None else firsts.join(prev, "h", "left_anti")
        return novel.select("id")


def start_dedup_maintenance(
    stream: DataFrame, maintainer: DedupMaintainer, checkpoint: str
) -> StreamingQuery:
    """foreachBatch driver: each micro-batch folds into the seen table;
    availableNow drains the backlog and stops (the graceful-drain
    contract the ingest layer uses)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maintainer.apply_batch(batch_df)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
