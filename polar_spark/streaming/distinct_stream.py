"""Streaming distinct-count maintenance: HyperLogLog registers folded
across micro-batches.

The batch operator (``sketches.hll_registers``/``hll_estimate``)
answers "how many distinct keys in THIS table"; the streaming form
max-merges every arriving micro-batch's registers into one versioned
register table, so "distinct keys per group so far" is answerable at
any time in O(groups · 2^p) state — never per-key state.

State layout matches the other maintainers (immutable versioned
parquet + atomic json pointer):

    regs/v{n}/     register table (grp, bucket, m_j), ≤ groups·256 rows
    state.json     atomic pointer {version, last_batch_id, ...}

Unlike the count-min fold (sums — replay double-counts), the HLL fold
is max-merge and therefore IDEMPOTENT: replaying a batch cannot change
any register.  The maintainer still skips recorded ``batch_id``
replays (cheaper and keeps version counting stable), but correctness
does not depend on it — tested by replaying a batch explicitly.

Reference analog: Polar's metrics actors keep exact per-entity sets to
answer distinct-count questions (src/agents/*/metrics); this is the
bounded-memory form a 1000-executor stream deploys.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from polar_spark.operators.sketches import hll_estimate, hll_merge, hll_registers


class DistinctCountMaintainer:
    """Versioned HLL register state, max-merged per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key_col: str = "key",
        group_col: str = "grp",
        p: int = 8,
        seed: int = 0,
        retention: int = 3,
    ) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.key_col = key_col
        self.group_col = group_col
        self.p = p
        self.seed = seed
        self.retention = retention
        os.makedirs(os.path.join(work_dir, "regs"), exist_ok=True)
        self._state_path = os.path.join(work_dir, "state.json")

    def state(self) -> dict | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)

    def registers(self) -> DataFrame | None:
        s = self.state()
        if s is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.work_dir, "regs", f"v{s['version']}")
        )

    def _gc(self, current_version: int) -> None:
        base = os.path.join(self.work_dir, "regs")
        for d in os.listdir(base):
            if d.startswith("v") and int(d[1:]) <= current_version - self.retention:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    def apply_batch(self, df: DataFrame, batch_id: int | None = None) -> dict:
        """Folds one micro-batch: build its registers, element-wise MAX
        into the state registers, write the new version, swap the
        pointer.  Recorded ``batch_id`` replays are skipped; even if
        they were not, the max-merge is idempotent."""
        s = self.state()
        if (
            batch_id is not None
            and s is not None
            and s.get("last_batch_id") is not None
            and batch_id <= s["last_batch_id"]
        ):
            return {**s, "skipped_replay": True}
        batch_regs = hll_registers(df, self.key_col, self.group_col, self.p, self.seed)
        prev = self.registers()
        merged = batch_regs if prev is None else hll_merge(prev, batch_regs)
        nv = (s["version"] + 1) if s else 1
        path = os.path.join(self.work_dir, "regs", f"v{nv}")
        merged.write.mode("overwrite").parquet(path)
        new_state = {
            "version": nv,
            "last_batch_id": batch_id,
            "batch_rows": df.count(),
            "register_rows": self.spark.read.parquet(path).count(),
        }
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, self._state_path)  # atomic pointer swap
        self._gc(nv)
        return new_state

    def estimates(self) -> DataFrame:
        """Current per-group distinct estimates from the state registers."""
        regs = self.registers()
        if regs is None:
            return self.spark.createDataFrame(
                [], "grp string, present long, zeros long, s2 long, est double"
            )
        return hll_estimate(regs, self.p)


def start_distinct_maintenance(
    stream: DataFrame, maintainer: DistinctCountMaintainer, checkpoint: str
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
