"""Deterministic sampling / split assignment for corpus mixing.

A 100 TB training pipeline needs REPRODUCIBLE subset selection: the
same row must land in the same split / sample on every run, on any
cluster size, with no RNG state to ship.  Everything here is a pure map
stage over an arithmetic hash of the row id — no shuffle, no Python,
resumable by construction — using the repo's SQL-replayable
xorshift-multiply mix (the same family `plans/pregel.py` uses for HLL
registers and MIS priorities, every intermediate < 2^31 so int64
engines can replay it verbatim).

Reference analog: Polar samples/partitions entity streams per-agent
config (src/agents/*/config); here the selection is a declarative
column so Catalyst can push it into scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket resolution — weights are exact multiples of 1/10000
BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 0) -> Column:
    """Deterministic bucket in [0, BUCKETS) from an integer id column —
    xorshift-multiply mix, overflow-safe below 2^62 (DuckDB-replayable)."""
    x0 = (id_col * F.lit(2654435761) + F.lit(seed)) % F.lit(2**31)
    x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
    h = x1.bitwiseXOR(F.shiftright(x1, 17))
    return (h % F.lit(BUCKETS)).cast("long")


def split_assign(
    df: DataFrame,
    splits: list[tuple[str, float]],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assigns every row to a named split (e.g. train/val/test) by its
    hash bucket: cumulative weight thresholds over ``BUCKETS``.  Weights
    must sum to 1 (±1/BUCKETS).  Adds ``bucket`` and ``split`` columns;
    pure map stage."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1.0 / BUCKETS:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), seed)
    expr = None
    acc = 0.0
    for name, w in splits:
        acc += w
        cond = bucket < F.lit(int(round(acc * BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float rounding can leave the last threshold a hair under BUCKETS
    expr = expr.otherwise(F.lit(splits[-1][0]))
    return df.select("*", bucket.alias("bucket"), expr.alias("split"))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keeps each row iff its hash bucket falls under its stratum's
    fraction — per-source mixing rates for corpus construction.  The
    fraction table is inlined as a CASE expression (strata counts are
    small); selection is a pushdown-friendly filter, deterministic
    across runs and cluster sizes."""
    bucket = hash_bucket(F.col(id_col), seed)
    thresh = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        lim = F.lit(int(round(frac * BUCKETS)))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = (
        thresh.otherwise(F.lit(int(round(default_fraction * BUCKETS))))
        if thresh is not None
        else F.lit(int(round(default_fraction * BUCKETS)))
    )
    return df.where(bucket < thresh)


def weighted_bernoulli(
    df: DataFrame,
    weight_col: str,
    weight_cap: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keeps each row independently with probability
    ``min(1, weight/weight_cap)`` — weighted Bernoulli sampling (e.g.
    length-proportional document selection) with the same deterministic
    hash-bucket coin as :func:`split_assign`, so the decision is pure
    integer arithmetic (``bucket·weight_cap < weight·BUCKETS``),
    reproducible on any cluster size and exactly replayable in ANSI
    SQL.  A pushdown-friendly filter; no shuffle."""
    bucket = hash_bucket(F.col(id_col), seed)
    return df.where(
        bucket * F.lit(int(weight_cap)) < F.col(weight_col) * F.lit(BUCKETS)
    )
