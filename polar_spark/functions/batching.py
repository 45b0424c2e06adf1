"""Group-preserving re-batching for ``mapInPandas`` folds.

Spark slices each partition into Arrow batches of
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (default 10,000)
with no regard for group boundaries, so ``repartition(key) +
sortWithinPartitions(key)`` guarantees a key group is contiguous
*within the partition* but NOT within a single batch.  Any per-group
fold that treats one batch as the grouping universe silently emits
partial results for groups that straddle a boundary — invisible at
test scale, guaranteed at corpus scale.

``grouped_batches`` fixes this generically: it re-chunks the batch
iterator so no key group is ever split across the frames it yields,
by carrying the trailing group of each batch into the next.  Memory
overhead is one group (bounded by the largest group, exactly the same
bound ``groupBy().applyInPandas`` would impose) — not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def grouped_batches(
    batches: Iterator[pd.DataFrame], keys: list[str]
) -> Iterator[pd.DataFrame]:
    """Yield frames in which every ``keys`` group is whole.

    Requires the input partition to be sorted by ``keys`` (use
    ``repartition(*keys).sortWithinPartitions(*keys)`` upstream) so a
    group is contiguous; the trailing group of each incoming batch is
    held back and prepended to the next batch, then flushed at the end.
    """
    pending: pd.DataFrame | None = None
    for pdf in batches:
        if pdf.empty:
            continue
        if pending is not None:
            pdf = pd.concat([pending, pdf], ignore_index=True)
            pending = None
        last = pdf.iloc[-1]
        mask = pd.Series(True, index=pdf.index)
        for k in keys:
            mask &= pdf[k] == last[k]
        pending = pdf[mask]
        head = pdf[~mask]
        if not head.empty:
            yield head
    if pending is not None and not pending.empty:
        yield pending
