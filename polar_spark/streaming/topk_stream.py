"""Streaming heavy hitters: a count-min sketch + bounded candidate
list maintained across micro-batches.

The batch operator (``sketches.cm_heavy_hitters``) answers "what are
the top keys of THIS table"; the streaming form folds every arriving
micro-batch into one mergeable sketch and keeps a bounded candidate
list, so "top keys so far" is answerable at any time without storing
per-key exact counts.  State layout matches the other maintainers
(immutable versioned parquet + atomic json pointer):

    sketch/v{n}/      CM cell table (≤ depth·width rows)
    cand/v{n}/        bounded candidate keys with sketch estimates
    state.json        atomic pointer {version, last_batch_id, ...}

Unlike the seen-hash dedup fold, a sketch fold is NOT naturally
idempotent — replaying a batch double-counts.  Exactly-once therefore
rides the foreachBatch ``batch_id``: the maintainer records the last
applied id and skips replays (the standard idempotent-sink protocol;
Structured Streaming guarantees the same batch id re-delivers the same
data).

At 100 TB the sketch is a constant ≤ depth·width rows (broadcast to
probes), the per-batch fold is one map-side-combinable aggregation over
the batch, and the candidate list is bounded by ``max_candidates`` —
no state component grows with the stream.

Reference analog: Polar's Cassini metrics actors keep rolling counters
per topic (SURVEY §2.8); this is the set-oriented bounded-memory
equivalent for unbounded key domains.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from polar_spark.operators.sketches import cm_estimate, cm_merge, cm_sketch


class HeavyHittersMaintainer:
    """Versioned CM-sketch state with a bounded candidate list."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key_col: str = "key",
        depth: int = 4,
        width: int = 512,
        seed: int = 0,
        max_candidates: int = 200,
        retention: int = 3,
    ) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.seed = seed
        self.max_candidates = max_candidates
        self.retention = retention
        os.makedirs(os.path.join(work_dir, "sketch"), exist_ok=True)
        os.makedirs(os.path.join(work_dir, "cand"), exist_ok=True)
        self._state_path = os.path.join(work_dir, "state.json")

    def state(self) -> dict | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)

    def _read(self, kind: str, version: int) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.work_dir, kind, f"v{version}")
        )

    def sketch(self) -> DataFrame | None:
        s = self.state()
        return None if s is None else self._read("sketch", s["version"])

    def candidates(self) -> DataFrame | None:
        s = self.state()
        return None if s is None else self._read("cand", s["version"])

    def _gc(self, current_version: int) -> None:
        for kind in ("sketch", "cand"):
            base = os.path.join(self.work_dir, kind)
            for d in os.listdir(base):
                if d.startswith("v") and int(d[1:]) <= current_version - self.retention:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    def apply_batch(self, df: DataFrame, batch_id: int | None = None) -> dict:
        """Folds one micro-batch: merge its sketch cells into the state
        sketch, refresh candidate estimates, keep the top
        ``max_candidates`` (est desc, key asc — deterministic).  A
        replayed ``batch_id`` (≤ the last applied) is skipped entirely,
        making the at-least-once foreachBatch delivery exactly-once."""
        s = self.state()
        if (
            batch_id is not None
            and s is not None
            and s.get("last_batch_id") is not None
            and batch_id <= s["last_batch_id"]
        ):
            return {**s, "skipped_replay": True}
        batch_sketch = cm_sketch(df, self.key_col, self.depth, self.width, self.seed)
        prev_sketch = self.sketch()
        merged = (
            batch_sketch if prev_sketch is None else cm_merge(prev_sketch, batch_sketch)
        )
        nv = (s["version"] + 1) if s else 1
        sk_path = os.path.join(self.work_dir, "sketch", f"v{nv}")
        merged.write.mode("overwrite").parquet(sk_path)
        merged = self.spark.read.parquet(sk_path)
        # candidate refresh: prior candidates ∪ this batch's keys, all
        # re-estimated against the MERGED sketch, bounded deterministic cut
        batch_keys = df.select(self.key_col).distinct()
        prev_cand = self.candidates()
        cand_keys = (
            batch_keys
            if prev_cand is None
            else prev_cand.select(self.key_col).unionByName(batch_keys).distinct()
        )
        est = cm_estimate(
            merged, cand_keys, self.key_col, self.depth, self.width, self.seed
        ).orderBy(F.desc("est"), F.asc(self.key_col)).limit(self.max_candidates)
        cand_path = os.path.join(self.work_dir, "cand", f"v{nv}")
        est.write.mode("overwrite").parquet(cand_path)
        new_state = {
            "version": nv,
            "last_batch_id": batch_id,
            "batch_rows": df.count(),
            "candidates": self.spark.read.parquet(cand_path).count(),
        }
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, self._state_path)  # atomic pointer swap
        self._gc(nv)
        return new_state

    def topk(self, k: int = 10) -> DataFrame:
        """Current top-k by sketch estimate (est desc, key asc)."""
        cand = self.candidates()
        if cand is None:
            return self.spark.createDataFrame([], f"{self.key_col} long, est long")
        return cand.orderBy(F.desc("est"), F.asc(self.key_col)).limit(k)


def start_heavy_hitters_maintenance(
    stream: DataFrame, maintainer: HeavyHittersMaintainer, checkpoint: str
) -> StreamingQuery:
    """foreachBatch driver: exactly-once via the recorded batch_id;
    availableNow drains the backlog and stops."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maintainer.apply_batch(batch_df, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
