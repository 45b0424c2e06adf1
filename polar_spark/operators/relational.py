"""Relational operators Spark lacks as single primitives.

- ``as_of_join``: per-key backward as-of join (latest right row with
  ts ≤ left ts).  Implemented as a *cogrouped* Arrow operator —
  ``groupBy(key).cogroup(...).applyInPandas(pd.merge_asof)`` — so each
  key's match runs vectorized in pandas after one co-partitioning
  shuffle per side (the recommended Spark pattern for range/as-of
  semantics; no cross join, no window over the union).
- ``sessionize``: gap-based session ids via lag + running sum — the
  batch analog of ``session_window`` (used by the reference's per-ref
  observation scheduling semantics only implicitly; exposed here as a
  first-class operator).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for every left row, the latest right row of
    the same ``by`` key with ``right.ts <= left.ts``.  Right columns are
    appended with ``suffix`` (ts column included as ``{ts}{suffix}``).
    """
    rcols = right_cols or [c for c in right.columns if c not in (by,)]
    # Alias right columns to their suffixed names IN SPARK (not pandas):
    # when both cogroup sides share one source relation, column names
    # that collide across sides get mangled by relation deduplication and
    # the right frame arrives pruned — distinct names sidestep it.
    r = right.select(F.col(by), *[F.col(c).alias(c + suffix) for c in rcols])

    out_fields = [left.schema[c] for c in left.columns]
    for c in rcols:
        f = right.schema[c]
        out_fields.append(T.StructField(c + suffix, f.dataType, True))
    out_schema = T.StructType(out_fields)
    lcols = list(left.columns)

    def merge(l: pd.DataFrame, rr: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        l = l.sort_values(ts, kind="mergesort")
        if rr.empty:
            out = l.copy()
            for c in rcols:
                out[c + suffix] = None
            return out[[f.name for f in out_fields]]
        rr = rr.sort_values(ts + suffix, kind="mergesort")
        out = pd.merge_asof(
            l,
            rr.drop(columns=[by]),
            left_on=ts,
            right_on=ts + suffix,
            direction="backward",
        )
        return out[[f.name for f in out_fields]]

    return (
        left.groupBy(by)
        .cogroup(r.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
        .select(*lcols, *[c + suffix for c in rcols])
    )


def sessionize(
    events: DataFrame,
    ts: str = "ts",
    by: str = "user_id",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Adds ``session_id`` (``{by}#{n}``): a new session starts when the
    gap to the previous event of the same key exceeds ``gap_minutes``."""
    order = [F.asc(ts)] + ([F.asc(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    gap = F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess_n = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return events.withColumn(
        "session_id", F.concat_ws("#", F.col(by).cast("string"), sess_n.cast("string"))
    )
