"""Stateful streaming high-water mark: the reference's per-ref
``last_seen`` map as an ``applyInPandasWithState`` operator.

The git observer keeps ``last_seen: HashMap<ref, Oid>`` and only emits
commits newer than the mark (/root/reference/src/agents/git/observe/
src/lib.rs:471-477, 615-654, 693-701).  Streaming-native equivalent:
group the commit stream by (repo, ref), keep the max commit time seen
in state, and emit only rows that advance past it.  Batch-side
equivalent of the same contract is ``git_projection.incremental_walk``
with a watermark table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("ref_name", T.StringType()),
        T.StructField("oid", T.StringType()),
        T.StructField("time", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("last_time", T.LongType())])


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else -1
    out = []
    mx = last
    for pdf in pdfs:
        fresh = pdf[pdf["time"] > last]
        if not fresh.empty:
            out.append(fresh[["repo", "ref_name", "oid", "time"]])
            mx = max(mx, int(fresh["time"].max()))
    if mx > last:
        state.update((int(mx),))
    if out:
        yield pd.concat(out, ignore_index=True)


def incremental_commits_stream(commits: DataFrame) -> DataFrame:
    """Streaming commits (repo, ref_name, oid, time long, ...) → only
    rows newer than the per-(repo, ref) high-water mark; the mark is
    Spark-managed keyed state (checkpointed, restored on restart)."""
    return commits.groupBy("repo", "ref_name").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
