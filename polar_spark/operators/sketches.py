"""Count-min sketch + skew diagnostics — the streaming-scale frequency
toolkit (Cormode & Muthukrishnan, J.Alg 2005).

At 100 TB a per-key exact count of a high-cardinality column is a
full-size shuffle; the count-min sketch is the standard sublinear
substitute: ``depth`` hash rows × ``width`` counters, point estimate =
min over rows, overestimate bounded by ε·N with ε = e/width at
probability 1 − (1/e)^depth.  Built here as ONE map-side-combinable
aggregation over ``depth × N`` cell keys into a bounded ``depth·width``
cell table — no per-key state, mergeable across partitions/batches by
construction (cells just add).

The hash family is the repo's SQL-replayable xorshift-multiply mix
(every intermediate < 2^62), so a SQL engine replays the exact sketch —
the same cross-engine-exactness property the MinHash/SimHash arithmetic
families use.

Reference analog: Polar's metrics counters are exact per-key actor
state (src/agents/*/metrics); this is the bounded-memory equivalent a
1000-executor stream would actually deploy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_col(key: Column, row: int, width: int, seed: int) -> Column:
    """Counter index of ``key`` in hash row ``row`` — xorshift-multiply
    mix, deterministic, every intermediate below 2^62."""
    x0 = (key * F.lit(2654435761) + F.lit(row * 1000003 + seed)) % F.lit(2**31)
    x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
    h = x1.bitwiseXOR(F.shiftright(x1, 17))
    return (h % F.lit(width)).cast("long")


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 0,
) -> DataFrame:
    """Builds the sketch cell table ``(row, col, cnt)`` — at most
    ``depth · width`` rows regardless of input size.  One aggregation,
    partial-combined map-side; cells from different inputs merge by
    summing ``cnt`` (use :func:`cm_merge`)."""
    key = F.col(key_col).cast("long")
    cells = F.array(
        *[
            F.struct(F.lit(r).cast("long").alias("row"), _cm_col(key, r, width, seed).alias("col"))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merges sketches built with identical (depth, width, seed) —
    cells add; the mergeability that makes the sketch shard- and
    stream-friendly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 0,
) -> DataFrame:
    """Point-estimates every key in ``keys``: est = min over hash rows
    of the addressed counter.  The sketch (≤ depth·width rows) is
    broadcast — the probe side never shuffles."""
    key = F.col(key_col).cast("long")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        _cm_col(key, r, width, seed).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def cm_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 512,
    seed: int = 0,
) -> DataFrame:
    """Top-k keys by sketch-estimated frequency (deterministic
    tie-break: est desc, key asc).  The candidate set is the distinct
    keys of ``df`` — at true stream scale a space-saving candidate list
    replaces it; the estimate path is identical."""
    sk = cm_sketch(df, key_col, depth, width, seed)
    keys = df.select(key_col).distinct()
    est = cm_estimate(sk, keys, key_col, depth, width, seed)
    return est.orderBy(F.desc("est"), F.asc(key_col)).limit(k)


def skew_report(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Shuffle-key skew diagnostic: the ``top`` heaviest keys with
    their row count and share of the table (integer parts-per-million —
    exact cross-engine arithmetic) — the number you read before
    deciding to salt a join.  One aggregation + a bounded top-k."""
    total = df.count()
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(top)
        .select(
            key_col,
            "n",
            F.expr(f"CAST((n * 1000000) DIV {total} AS BIGINT)").alias("share_ppm"),
        )
    )
