"""Per-partition CSR adjacency blocks (north-star Phase 4).

The join-aggregate formulation materializes one row per edge per
iteration.  The CSR path instead packs each src-block's adjacency into
numpy arrays once (``applyInPandas`` build), and each PageRank
iteration does a *vectorized SpMV per block* — the multiply+gather
runs at numpy speed with zero per-edge row materialization; only the
per-(block, dst) partial sums hit the shuffle, which is strictly less
data than the edge-wise contribution rows of the DataFrame path
(hub dsts pre-combine inside every block).

Layout: block = ``pmod(src, n_blocks)``; per block we store

    blocks(block int, src_ids array<long>, out_deg array<long>,
           indptr array<long>, dst_ids array<long>)

``indptr``/``dst_ids`` are the classic CSR arrays over the block's
sorted src list.  Rank state joins the block by the same ``pmod`` —
co-partitioned, no extra shuffle — and the cogrouped kernel emits
``(dst, partial_contribution)``.

Correctness is cross-checked against the pure-DataFrame engine
(tests/test_csr.py): identical dangling handling, teleport and
convergence criterion; scores allclose 1e-9.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polar_spark.functions.batching import grouped_batches
from polar_spark.plans.pregel import (
    IterationStats,
    _auto_partitions,
    _shuffle_conf,
    normalize_edges,
    vertices_of,
)

BLOCK_SCHEMA = (
    "block int, src_ids array<long>, out_deg array<long>, "
    "indptr array<long>, dst_ids array<long>"
)


def build_csr_blocks(edges: DataFrame, n_blocks: int) -> DataFrame:
    """Pack normalized (src, dst) edges into per-block CSR arrays.

    A block may emit MULTIPLE rows (Arrow slices partitions at
    ``maxRecordsPerBatch``); that is additively correct in ``spmv``
    *provided every src's adjacency is whole in one row* — otherwise a
    chunk-local out_deg would distribute the src's full rank once per
    chunk.  ``grouped_batches`` on (block, src) guarantees wholeness:
    rows are sorted by (block, src) within the partition and the
    trailing src group is carried across batch boundaries.
    """
    e = normalize_edges(edges).withColumn("block", F.pmod("src", F.lit(n_blocks)).cast("int"))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in grouped_batches(batches, ["block", "src"]):
            for blk, grp in pdf.groupby("block"):
                src = grp["src"].to_numpy(np.int64)
                dst = grp["dst"].to_numpy(np.int64)
                order = np.argsort(src, kind="stable")
                src, dst = src[order], dst[order]
                uniq, counts = np.unique(src, return_counts=True)
                indptr = np.zeros(len(uniq) + 1, dtype=np.int64)
                np.cumsum(counts, out=indptr[1:])
                yield pd.DataFrame(
                    {
                        "block": [int(blk)],
                        "src_ids": [uniq.tolist()],
                        "out_deg": [counts.tolist()],
                        "indptr": [indptr.tolist()],
                        "dst_ids": [dst.tolist()],
                    }
                )

    # a block lands whole in one partition; (block, src) sort keeps each
    # src's adjacency contiguous for the grouped_batches carry
    return (
        e.repartition(n_blocks, "block")
        .sortWithinPartitions("block", "src")
        .mapInPandas(pack, schema=BLOCK_SCHEMA)
    )


def pagerank_csr(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    n_blocks: int | None = None,
    dangling: bool = True,
) -> tuple[DataFrame, IterationStats]:
    """PageRank over CSR blocks; same contract as ``pregel.pagerank``."""
    spark = edges.sparkSession
    e = normalize_edges(edges).persist()
    m0 = e.count()
    if m0 == 0:  # same contract as pregel.pagerank on the empty graph
        e.unpersist()
        return (
            spark.createDataFrame([], "id long, rank double"),
            IterationStats(algorithm="pagerank_csr", edges=0, vertices=0, converged=True),
        )
    blocks_n = n_blocks or _auto_partitions(spark, m0, None)
    with _shuffle_conf(spark, blocks_n):
        return _pagerank_csr_loop(spark, e, m0, blocks_n, damping, tol, max_iter, dangling)


def _pagerank_csr_loop(spark, e, m0, blocks_n, damping, tol, max_iter, dangling):
    blocks = build_csr_blocks(e, blocks_n).repartition(blocks_n, "block").localCheckpoint(eager=True)
    verts = vertices_of(e).localCheckpoint(eager=True)
    n = verts.count()
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    dang = (
        verts.join(out_deg, "id", "left_anti").localCheckpoint(eager=True)
        if dangling
        else None
    )
    e.unpersist()
    stats = IterationStats(algorithm="pagerank_csr", edges=m0, vertices=n)
    inv_n = 1.0 / n

    ranks = verts.select(
        "id", (F.lit(inv_n)).alias("rank"), F.pmod("id", F.lit(blocks_n)).cast("int").alias("block")
    ).localCheckpoint(eager=True)

    def spmv(block_pdf: pd.DataFrame, rank_pdf: pd.DataFrame) -> pd.DataFrame:
        # one block row; ranks of every vertex whose id % n_blocks == block
        if block_pdf.empty or rank_pdf.empty:
            return pd.DataFrame({"dst": pd.Series([], dtype="int64"), "c": pd.Series([], dtype="float64")})
        out_frames = []
        rmap = pd.Series(
            rank_pdf["rank"].to_numpy(np.float64), index=rank_pdf["id"].to_numpy(np.int64)
        )
        for _, row in block_pdf.iterrows():
            src_ids = np.asarray(row["src_ids"], dtype=np.int64)
            deg = np.asarray(row["out_deg"], dtype=np.int64)
            indptr = np.asarray(row["indptr"], dtype=np.int64)
            dst = np.asarray(row["dst_ids"], dtype=np.int64)
            r = rmap.reindex(src_ids).to_numpy(np.float64)
            per_src = r / deg
            contrib = np.repeat(per_src, np.diff(indptr))
            # pre-combine per dst inside the block (hub compression)
            uniq_dst, inv = np.unique(dst, return_inverse=True)
            sums = np.bincount(inv, weights=contrib)
            out_frames.append(pd.DataFrame({"dst": uniq_dst, "c": sums}))
        return pd.concat(out_frames, ignore_index=True)

    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        partials = (
            blocks.groupBy("block")
            .cogroup(ranks.groupBy("block"))
            .applyInPandas(spmv, schema="dst long, c double")
        )
        sums = partials.groupBy(F.col("dst").alias("id")).agg(F.sum("c").alias("s"))
        if dang is not None:
            tot = ranks.join(dang, "id", "left_semi").agg(F.sum("rank").alias("_dm"))
            dm_col = F.greatest(F.lit(0.0), F.coalesce(F.col("_dm"), F.lit(0.0)))
        else:
            tot = None
            dm_col = F.lit(0.0)
        joined = ranks.withColumnRenamed("rank", "old").join(
            sums.hint("shuffle_hash"), "id", "left"
        )
        if tot is not None:
            joined = joined.crossJoin(F.broadcast(tot))
        new_state = joined.select(
            "id",
            (
                F.lit((1.0 - damping) * inv_n)
                + F.lit(damping * inv_n) * dm_col
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
            F.col("old"),
            F.col("block"),
        ).localCheckpoint(eager=False)
        delta = float(
            new_state.agg(F.max(F.abs(F.col("rank") - F.col("old")))).collect()[0][0]
        )
        ranks = new_state.select("id", "rank", "block")
        stats.iterations = it
        stats.deltas.append(delta)
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.final_delta = delta
        if delta < tol:
            stats.converged = True
            break
    return ranks.select("id", "rank"), stats
