"""Pregel-style iterative graph algorithms as DataFrame join-aggregate loops.

The reference stores its graph in Neo4j and leaves analytics to Cypher
traversals (/root/reference/scripts/pipeline/smoke-test.nu:122-138;
/root/reference/docs/architecture/git/modeling.md:263-272).  The north
rule requires the link-graph layer — PageRank, connected components,
label propagation, triangle counting — implemented natively on the
edge table.  Everything here is declarative DataFrame code: Catalyst
plans each iteration (shuffled hash join + partial-aggregated shuffle),
AQE splits skewed hub keys at runtime, and the driver loop only
controls convergence, lineage-cutting and checkpointing.

Scale design (100 TB / 10^9+ vertices):

- Edges are normalized once to ``(src long, dst long)``, hash-
  repartitioned by the join key and cached; per-iteration state
  (ranks/components/labels) is the only thing reshuffled each round.
- Aggregations rely on map-side partial aggregation; for pathological
  hubs an explicit two-phase *salted* aggregation
  (``salt_buckets``) pre-combines contributions of a hub vertex in
  ``salt`` sub-groups before the final combine — bit-identical result,
  bounded reducer size.
- Logical lineage is cut EVERY round via ``localCheckpoint`` (the state
  feeds the next plan twice, so an uncut plan doubles per round —
  exponential analysis cost); durable parquet snapshots with
  per-iteration metrics + per-partition lineage rows land every
  ``checkpoint_every`` rounds under ``checkpoint_dir`` — the resume
  protocol reads the newest complete snapshot and continues
  mid-computation.
- Convergence is an aggregate action per iteration (max |delta|);
  at cluster scale this is one lightweight job over the vertex state.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------------------
# plumbing


@dataclass
class IterationStats:
    """Per-run metrics (the 'convergence metrics' of the north rule)."""

    algorithm: str
    iterations: int = 0
    converged: bool = False
    final_delta: float | None = None
    deltas: list[float] = field(default_factory=list)
    iter_seconds: list[float] = field(default_factory=list)
    edges: int | None = None
    vertices: int | None = None
    resumed_from: int | None = None
    # fused fixed-iteration mode: iterations ran as one lazily-chained
    # job, so iter_seconds entries are the chunk wall divided evenly
    fused: bool = False

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


class _shuffle_conf:
    """Temporarily pin ``spark.sql.shuffle.partitions`` AND disable AQE
    for an iterative run; both restored on exit.

    Partitions: iteration shuffles are sized to the *graph*, not the
    session default — tiny graphs on 200-partition defaults spend 10x
    more time scheduling empty tasks than computing (measured 0.55s vs
    7s per iteration).  At cluster scale the cap is the session
    default, so big inputs keep full parallelism.

    AQE: its stage-by-stage replanning is a driver-serial round trip
    per stage — measured ~2x the per-iteration wall on pinned-partition
    loops (BENCH/BASELINE.md).  The loop pins its partition counts and
    handles skew explicitly (salting), so adaptive replanning buys
    nothing here; AQE stays on for everything outside iterative runs."""

    def __init__(self, spark: SparkSession, n: int):
        self.spark = spark
        self.n = n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.old_aqe = self.spark.conf.get("spark.sql.adaptive.enabled")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        self.spark.conf.set("spark.sql.adaptive.enabled", self.old_aqe)


def _auto_partitions(spark: SparkSession, m: int, requested: int | None) -> int:
    """Partitions for a graph with m edges: ~50k edge-rows per partition,
    capped at the session default (cluster parallelism), floor 1."""
    if requested:
        return requested
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(default, m // 50_000 + 1))


def normalize_edges(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Distinct (src, dst) longs, self-loops dropped (self-edge guard,
    /root/reference/src/agents/git/process/src/main.rs:78-82),
    hash-partitioned by src for iteration joins."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    return e


def compact_ids(e: DataFrame, m0: int, cols: tuple[str, str] = ("src", "dst")) -> DataFrame:
    """Cast (src, dst) to int32 when every id fits (|V| < 2³¹ and ids
    are small) — every per-iteration shuffle row in the loops (rank
    exchange, partial-aggregated contributions, component labels) then
    carries 4-byte keys instead of 8.  One setup aggregate over the
    already-persisted edge set decides; xxhash64-derived ids (full
    64-bit — ``GraphStore.edge_table``) keep long and the loops are
    type-agnostic either way.  Dense re-mapping of large ids is NOT done
    here: it would cost two extra joins per run (map + unmap), which
    only pays off past ~50 iterations."""
    if m0 == 0:
        return e
    a, b_ = cols
    r = e.agg(
        F.min(F.least(a, b_)).alias("lo"),
        F.max(F.greatest(a, b_)).alias("hi"),
    ).collect()[0]
    if r["lo"] is not None and r["lo"] >= -(2**31) and r["hi"] < 2**31:
        return e.select(F.col(a).cast("int"), F.col(b_).cast("int"))
    return e


def vertices_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: edges ∪ reversed, distinct."""
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per vertex."""
    return symmetrize(edges).groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))


class _Ckpt:
    """Durable per-iteration vertex-state snapshots with lineage.

    Layout: ``{dir}/{algo}/iter=N/`` parquet + ``{dir}/{algo}/meta.json``
    (list of completed iterations with convergence metric and
    per-partition row counts).  Equivalent cluster-side: an Iceberg
    table partitioned by iteration — snapshot isolation gives the same
    resume contract.
    """

    def __init__(self, spark: SparkSession, root: str, algo: str):
        self.spark = spark
        self.dir = os.path.join(root, algo)
        os.makedirs(self.dir, exist_ok=True)
        self.meta_path = os.path.join(self.dir, "meta.json")

    def completed(self) -> list[dict]:
        if not os.path.exists(self.meta_path):
            return []
        with open(self.meta_path) as f:
            return json.load(f)

    def latest(self) -> dict | None:
        c = self.completed()
        return c[-1] if c else None

    def save(self, iteration: int, state: DataFrame, delta: float | None) -> DataFrame:
        path = os.path.join(self.dir, f"iter={iteration}")
        state.write.mode("overwrite").parquet(path)
        reread = self.spark.read.parquet(path)
        lineage = [
            {"partition_id": int(r["pid"]), "rows": int(r["rows"])}
            for r in reread.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        ]
        meta = self.completed()
        meta = [m for m in meta if m["iteration"] < iteration]
        meta.append({"iteration": iteration, "delta": delta, "partitions": lineage})
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.meta_path)
        return reread

    def load(self, iteration: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.dir, f"iter={iteration}"))


def _hard_cut(df: DataFrame) -> DataFrame:
    """Materialize and cut BOTH the logical plan and its statistics.

    ``localCheckpoint`` truncates the plan but its ``LogicalRDD`` leaf
    inherits the origin plan's ``sizeInBytes`` ESTIMATE — in a
    self-join loop (MSF pointer doubling) that estimate squares per
    hop and compounds across rounds until Catalyst's BigInteger stats
    arithmetic dominates planning (observed: minutes of single-threaded
    driver CPU at sf0.1).  ``persist`` resets stats via the actual
    InMemoryRelation size but does NOT cut the plan, so the logical
    tree grows 16x per chunk instead.  This helper does the checkpoint
    (plan cut + materialization), then rebuilds a DataFrame from the
    checkpointed RDD so the leaf carries the session-default size —
    constant per chunk, never compounding.  Falls back to the plain
    checkpoint if the internal JVM constructor is unavailable.
    """
    ck = df.localCheckpoint(eager=True)
    try:
        spark = df.sparkSession
        jdf = ck._jdf
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(jnew, spark)
    except Exception:  # pragma: no cover - connect/API drift fallback
        return ck


def _stats_leaf(df: DataFrame) -> DataFrame:
    """Reset a checkpointed DataFrame's leaf statistics WITHOUT a second
    materialization pass: rebuild the DataFrame over the SAME (possibly
    still-lazy) checkpoint RDD via the internal constructor, so the
    leaf carries the session-default sizeInBytes instead of the origin
    plan's inherited estimate (the compounding-stats pathology
    ``_hard_cut`` fixes — but ``_hard_cut`` is eager, costing one job
    per call; this is the lazy-flow variant for loops whose single
    per-round action materializes a chain of lazy checkpoints)."""
    try:
        spark = df.sparkSession
        jdf = df._jdf
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(jnew, spark)
    except Exception:  # pragma: no cover - connect/API drift fallback
        return df


def _cut_lineage(
    df: DataFrame,
    it: int,
    delta: float | None,
    ckpt: _Ckpt | None,
    every: int,
) -> DataFrame:
    if it % every != 0:
        return df
    if ckpt is not None:
        return ckpt.save(it, df, delta)
    return df.localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# PageRank


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    salt_buckets: int | None = None,
    num_partitions: int | None = None,
    dangling: bool = True,
    fuse: bool | None = None,
    init_ranks: DataFrame | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Power-iteration PageRank to ``tol`` (L∞ of the rank delta).

    ``fuse=None`` (default) chains rounds lazily into one job per
    checkpoint chunk whenever ``tol == 0`` (fixed-iteration mode needs
    no per-round convergence decision); pass False to force the classic
    one-job-per-round loop.

    ``init_ranks`` (id, rank) warm-starts the iteration — the
    incremental-update path for streaming edge deltas: pass the
    converged ranks of the previous graph version and the loop
    converges in the few rounds the perturbation needs instead of a
    cold start's O(log(1/tol)/log(1/d)).  Vertices absent from
    ``init_ranks`` seed at 1/n; the warm vector is renormalized to
    total mass 1 so convergence semantics are unchanged (power
    iteration has a unique fixpoint — warm and cold starts agree to
    tolerance).

    One iteration = join(edges ⨝ ranks on src) → per-dst sum → blend
    with teleport + (optionally) redistributed dangling mass.  Edge
    side is partitioned+cached once; ranks reshuffle each round (the
    inherent cost of the algorithm).  ``salt_buckets`` enables explicit
    two-phase aggregation for hub dst vertices.

    Returns (ranks(id, rank), stats).  Scores sum to ~1.
    """
    spark = edges.sparkSession
    e0 = normalize_edges(edges).persist()
    m0 = e0.count()
    if m0 == 0:
        e0.unpersist()
        return (
            spark.createDataFrame([], "id long, rank double"),
            IterationStats(algorithm="pagerank", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    e = compact_ids(e0, m0)
    with _shuffle_conf(spark, shuffle):
        return _pagerank_loop(
            spark, e, e0, m0, shuffle, damping, tol, max_iter, checkpoint_dir,
            checkpoint_every, resume, salt_buckets, dangling, fuse, init_ranks,
        )


def _pagerank_loop(
    spark, e, e_base, m0, shuffle, damping, tol, max_iter, checkpoint_dir,
    checkpoint_every, resume, salt_buckets, dangling, fuse=None, init_ranks=None,
):
    id_type = dict(e.dtypes)["src"]  # 'int' when compact_ids applied
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    # weighted edges: contribution fraction per edge, built once.
    # localCheckpoint (not persist): the input may carry an arbitrarily
    # deep plan (extraction pipelines, Python UDF stages) and these two
    # datasets are referenced by EVERY iteration's plan — truncating to
    # a LogicalRDD keeps per-iteration analysis cost independent of how
    # the edges were produced.
    ew = _hard_cut(
        e.join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition(shuffle, "src")
    )
    # dangling flag folded into the vertex state: the per-iteration
    # dangling mass is then a by-product of the SAME aggregate that
    # computes the convergence delta — no separate semi-join job, three
    # fewer stages per round (stage count is the driver-serial floor
    # that caps strong scaling)
    verts = (
        vertices_of(e)
        .join(out_deg.select("id", F.lit(True).alias("_nd")), "id", "left")
        .select("id", F.coalesce(F.col("_nd"), F.lit(False)).alias("not_dangling"))
        .repartition(shuffle, "id")
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    m = ew.count()
    e_base.unpersist()
    stats = IterationStats(algorithm="pagerank", edges=m, vertices=n)

    ckpt = _Ckpt(spark, checkpoint_dir, "pagerank") if checkpoint_dir else None
    start_iter = 0
    if resume and ckpt is not None and (last := ckpt.latest()) is not None:
        # checkpoints store id as long (stable resume contract); cast to
        # the loop's id type so the join stays type-homogeneous
        loaded = (
            ckpt.load(last["iteration"])
            .select(F.col("id").cast(id_type).alias("id"), "rank")
            .repartition(shuffle, "id")
        )
        ranks = loaded.join(verts, "id").select("id", "rank", "not_dangling")
        start_iter = last["iteration"]
        stats.resumed_from = start_iter
    elif init_ranks is not None:
        # warm start from a previous graph version's converged ranks:
        # new vertices seed at 1/n, then renormalize total mass to 1
        warm = verts.join(
            init_ranks.select(
                F.col("id").cast(id_type).alias("id"), F.col("rank").alias("_warm")
            ),
            "id",
            "left",
        ).select(
            "id",
            F.coalesce(F.col("_warm"), F.lit(1.0 / n)).alias("rank"),
            "not_dangling",
        )
        total = float(warm.agg(F.sum("rank")).collect()[0][0])
        ranks = warm.select(
            "id", (F.col("rank") / F.lit(total)).alias("rank"), "not_dangling"
        ).repartition(shuffle, "id")
    else:
        ranks = verts.select("id", (F.lit(1.0) / n).alias("rank"), "not_dangling")

    ranks = ranks.localCheckpoint(eager=True)
    inv_n = 1.0 / n
    # dangling-free detection: one setup count on the checkpointed
    # vertex state; graphs where every vertex has out-edges (most link
    # graphs after normalization) then skip the dangling-mass branch of
    # every iteration — one less aggregate input per round, and the
    # fused path needs no per-iteration broadcast at all
    n_dang = verts.where(~F.col("not_dangling")).count() if dangling else 0
    dangling_on = dangling and n_dang > 0
    if (fuse is None and tol == 0.0) or fuse:
        # fixed-iteration mode: no convergence decision is needed
        # between rounds, so iterations chain LAZILY and materialize as
        # ONE job per checkpoint chunk — per-round driver round-trips
        # (collect + eager checkpoint + Py4J) drop out of the serial
        # floor, and adjacent rounds' final-agg/update-join/next-exchange
        # fuse into single stages at shuffle boundaries
        return _pagerank_fused(
            ew, verts, ranks, n, damping, tol, max_iter, start_iter, ckpt,
            checkpoint_every, salt_buckets, dangling_on, stats,
        )
    # dangling mass of the CURRENT state (dm enters the next update as a
    # python literal; recomputed per round by the convergence aggregate)
    dm = (
        float(
            ranks.where(~F.col("not_dangling")).agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        if dangling_on
        else 0.0
    )
    dangling = dangling_on
    # Iteration discipline: the rank state is *localCheckpoint*ed every
    # round.  The state feeds the next plan twice (contribution join +
    # in-row delta), so without truncation the analyzed logical plan
    # doubles per round — exponential driver-side analysis cost long
    # before any executor works.  The cut keeps the per-round plan
    # constant-size; the dangling mass (1 - Σ distributed contributions;
    # total mass is invariantly 1) rides the same job as a broadcast
    # 1-row cross join, and the convergence aggregate reads the fresh
    # checkpoint.  Durable parquet snapshots (resume protocol) happen
    # every ``checkpoint_every`` rounds on top.
    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.monotonic()
        # shuffle_hash: both sides are already hash-partitioned on the key;
        # SMJ would add two 10M-row sorts per iteration for nothing
        contrib = ew.join(
            ranks.withColumnRenamed("id", "src").hint("shuffle_hash"), "src"
        ).select("src", "dst", (F.col("w") * F.col("rank")).alias("c"))
        if salt_buckets:
            # two-phase: pre-combine within (dst, salt=src%B) then final
            # combine — deterministic, bounds any single reducer's input
            # for hub dst vertices.
            contrib = (
                contrib.withColumn("_salt", F.pmod(F.col("src"), F.lit(salt_buckets)))
                .groupBy("dst", "_salt")
                .agg(F.sum("c").alias("c"))
            )
        sums = contrib.groupBy(F.col("dst").alias("id")).agg(F.sum("c").alias("s"))
        joined = ranks.withColumnRenamed("rank", "old").join(
            sums.hint("shuffle_hash"), "id", "left"
        )
        base = (1.0 - damping) * inv_n + damping * inv_n * (dm if dangling else 0.0)
        # lazy localCheckpoint: the convergence aggregate below is the
        # job that materializes it — one job per iteration total; the
        # same aggregate also yields the next round's dangling mass
        new_state = joined.select(
            "id",
            (
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
            F.col("old"),
            F.col("not_dangling"),
        ).localCheckpoint(eager=False)
        agg_row = new_state.agg(
            F.max(F.abs(F.col("rank") - F.col("old"))).alias("delta"),
            F.sum(F.when(~F.col("not_dangling"), F.col("rank")).otherwise(F.lit(0.0))).alias("dm"),
        ).collect()[0]
        delta = float(agg_row["delta"])
        dm = float(agg_row["dm"] or 0.0)
        ranks = new_state.select("id", "rank", "not_dangling")
        if ckpt is not None and it % checkpoint_every == 0:
            ckpt.save(it, ranks.select(F.col("id").cast("long").alias("id"), "rank"), delta)
        stats.iterations = it
        stats.deltas.append(delta)
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.final_delta = delta
        if delta < tol:
            stats.converged = True
            break
    if ckpt is not None and stats.iterations % checkpoint_every != 0:
        ckpt.save(
            stats.iterations,
            ranks.select(F.col("id").cast("long").alias("id"), "rank"),
            stats.final_delta,
        )
    ew.unpersist()
    verts.unpersist()
    return ranks.select(F.col("id").cast("long").alias("id"), "rank"), stats


def _pagerank_fused(
    ew, verts, ranks, n, damping, tol, max_iter, start_iter, ckpt,
    checkpoint_every, salt_buckets, dangling_on, stats,
):
    """Fixed-iteration PageRank with lazily-chained rounds.

    Each round is built but NOT acted on; the chunk's single action (the
    delta aggregate, which doubles as the materializer for every lazy
    localCheckpoint in the chain) runs all rounds back-to-back.  Stage
    shape per round: [state exchange by src → contribution join +
    partial agg] + [final agg + update join + next round's projection]
    — the update join and the next exchange share a stage, and there is
    no per-round collect.  Dangling mass (when the graph has dangling
    vertices at all) rides a per-round 1-row broadcast aggregate instead
    of a driver literal."""
    inv_n = 1.0 / n
    it = start_iter
    while it < max_iter:
        # chunk size: checkpoint cadence if checkpointing, else — when a
        # tolerance is active — the convergence-check cadence; tol=0
        # with no checkpointing chains ALL rounds into one job
        chunk = min(
            checkpoint_every if (ckpt is not None or tol > 0.0) else max_iter - it,
            max_iter - it,
        )
        t0 = time.monotonic()
        last = None
        for _ in range(chunk):
            contrib = ew.join(
                ranks.withColumnRenamed("id", "src").hint("shuffle_hash"), "src"
            ).select("src", "dst", (F.col("w") * F.col("rank")).alias("c"))
            if salt_buckets:
                contrib = (
                    contrib.withColumn("_salt", F.pmod(F.col("src"), F.lit(salt_buckets)))
                    .groupBy("dst", "_salt")
                    .agg(F.sum("c").alias("c"))
                )
            sums = contrib.groupBy(F.col("dst").alias("id")).agg(F.sum("c").alias("s"))
            joined = ranks.withColumnRenamed("rank", "old").join(
                sums.hint("shuffle_hash"), "id", "left"
            )
            if dangling_on:
                dmagg = ranks.agg(
                    F.coalesce(
                        F.sum(F.when(~F.col("not_dangling"), F.col("rank"))), F.lit(0.0)
                    ).alias("_dm")
                )
                joined = joined.crossJoin(F.broadcast(dmagg))
                rank_expr = (
                    F.lit((1.0 - damping) * inv_n)
                    + F.lit(damping * inv_n) * F.col("_dm")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                )
            else:
                rank_expr = F.lit((1.0 - damping) * inv_n) + F.lit(damping) * F.coalesce(
                    F.col("s"), F.lit(0.0)
                )
            last = joined.select(
                "id", rank_expr.alias("rank"), F.col("old"), "not_dangling"
            ).localCheckpoint(eager=False)
            ranks = last.select("id", "rank", "not_dangling")
        delta = float(
            last.agg(F.max(F.abs(F.col("rank") - F.col("old")))).collect()[0][0]
        )
        wall = time.monotonic() - t0
        it += chunk
        stats.iterations = it
        stats.deltas.append(delta)  # the chunk's LAST round's delta
        stats.iter_seconds.extend([wall / chunk] * chunk)
        stats.final_delta = delta
        if ckpt is not None:
            ckpt.save(it, ranks.select(F.col("id").cast("long").alias("id"), "rank"), delta)
        ranks = ranks.localCheckpoint(eager=True)  # lineage cut between chunks
        # fuse=True with a tolerance: the chunk delta is already computed,
        # so honor it — convergence granularity is the chunk, not the
        # round (tol=0 keeps pure fixed-iteration behavior)
        if tol > 0.0 and delta < tol:
            stats.converged = True
            break
    stats.fused = True
    ew.unpersist()
    verts.unpersist()
    return ranks.select(F.col("id").cast("long").alias("id"), "rank"), stats


def hits(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """HITS hubs & authorities (Kleinberg): fixed-iteration mutual
    reinforcement — auth(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v} auth(v),
    each L2-normalized per half-step (the standard formulation).  Fixed
    iterations from the all-ones start keep the arithmetic unrollable
    in ANSI SQL for the cross-engine oracle; each half-step is one
    join-aggregate (the PageRank stage shape — partial aggregation
    map-side, one shuffle per half-step).  Returns
    ``(id, hub, authority)`` for every vertex."""
    spark = edges.sparkSession
    e = _hard_cut(normalize_edges(edges))
    verts = vertices_of(e).localCheckpoint(eager=True)
    state = verts.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    for _ in range(n_iter):
        a_new = (
            e.join(state.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("a"))
        )
        a_full = verts.join(a_new, "id", "left").select(
            "id", F.coalesce(F.col("a"), F.lit(0.0)).alias("a")
        )
        a_norm = a_full.crossJoin(
            F.broadcast(a_full.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("_n")))
        ).select("id", (F.col("a") / F.col("_n")).alias("auth"))
        h_new = (
            e.join(a_norm.select(F.col("id").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("h"))
        )
        h_full = verts.join(h_new, "id", "left").select(
            "id", F.coalesce(F.col("h"), F.lit(0.0)).alias("h")
        )
        h_norm = h_full.crossJoin(
            F.broadcast(h_full.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("_n")))
        ).select("id", (F.col("h") / F.col("_n")).alias("hub"))
        state = (
            h_norm.join(a_norm, "id")
            .select("id", "hub", "auth")
            .localCheckpoint(eager=False)
        )
    return state.select(
        F.col("id").cast("long"), F.col("hub"), F.col("auth").alias("authority")
    )


def salsa(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """SALSA (Lempel & Moran 2001): degree-NORMALIZED mutual
    reinforcement — auth(v) = Σ_{u→v} hub(u)/outdeg(u), hub(u) =
    Σ_{u→v} auth(v)/indeg(v) — i.e. HITS on the stochastic matrices of
    the bipartite hub/authority walk, which damps the TKC (tightly-knit
    community) over-amplification HITS suffers.  Fixed iterations from
    the all-ones start, L1-normalized per half-step (the walk is
    measure-preserving on the non-dangling part; normalization restores
    lost dangling mass so halves stay comparable).  Same plan shape as
    :func:`hits`: one join-aggregate per half-step, degree dimensions
    broadcast.  Returns ``(id, hub, authority)``."""
    e = _hard_cut(normalize_edges(edges))
    verts = vertices_of(e).localCheckpoint(eager=True)
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("outd"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("ind"))
    state = verts.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    for _ in range(n_iter):
        a_new = (
            e.join(
                state.join(outd, "id").select(
                    F.col("id").alias("src"), (F.col("hub") / F.col("outd")).alias("m")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("m").alias("a"))
        )
        a_full = verts.join(a_new, "id", "left").select(
            "id", F.coalesce(F.col("a"), F.lit(0.0)).alias("a")
        )
        a_norm = a_full.crossJoin(
            F.broadcast(a_full.agg(F.sum("a").alias("_n")))
        ).select("id", (F.col("a") / F.col("_n")).alias("auth"))
        h_new = (
            e.join(
                a_norm.join(ind, "id").select(
                    F.col("id").alias("dst"), (F.col("auth") / F.col("ind")).alias("m")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("m").alias("h"))
        )
        h_full = verts.join(h_new, "id", "left").select(
            "id", F.coalesce(F.col("h"), F.lit(0.0)).alias("h")
        )
        h_norm = h_full.crossJoin(
            F.broadcast(h_full.agg(F.sum("h").alias("_n")))
        ).select("id", (F.col("h") / F.col("_n")).alias("hub"))
        state = (
            h_norm.join(a_norm, "id")
            .select("id", "hub", "auth")
            .localCheckpoint(eager=False)
        )
    return state.select(
        F.col("id").cast("long"), F.col("hub"), F.col("auth").alias("authority")
    )


def pagerank_fixed(
    edges: DataFrame, n_iter: int = 5, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank *without* dangling redistribution —
    the SQL-expressible formulation used for cross-engine oracle
    checks (identical unrolled arithmetic in ANSI SQL).
    """
    # ew/verts materialized once (katz/hits discipline): both re-enter
    # every unrolled round, so an uncut plan re-embeds the caller's
    # edge build n_iter times and the final action re-runs it for each
    e = normalize_edges(edges)
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    ew = _hard_cut(
        e.join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
    )
    verts = vertices_of(e).localCheckpoint(eager=True)
    n = verts.count()
    ranks = verts.select("id", (F.lit(1.0) / n).alias("rank"))
    for _ in range(n_iter):
        sums = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("rank")).alias("s"))
        )
        ranks = (
            verts.join(sums.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def katz(
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    n_iter: int = 4,
) -> DataFrame:
    """Katz centrality, fixed-iteration truncation of
    x = Σ_k αᵏ(Aᵀ)ᵏ·β1: x_{t+1}(v) = β + α·Σ_{u→v} x_t(u) from the
    all-β start — the walk-counting centrality that, unlike PageRank,
    does not normalize by out-degree, so prolific dependers amplify
    rather than dilute (the "how reachable is this repo along short
    dependency chains" ranking on the DEPENDS_ON graph; reference
    centrality queries live in Polar's graph query surface,
    src/agents/graph/*).  Each round is one join-aggregate over the raw
    edge table (no per-edge weight join needed — partial aggregation
    map-side, one shuffle per round); rounds chain lazily and the
    arithmetic is unrollable in ANSI SQL for the cross-engine oracle.
    ``alpha`` must stay below 1/λ_max for the infinite series to
    converge; truncated fixed iterations are well-defined for any α.
    Returns (id, katz)."""
    e = _hard_cut(normalize_edges(edges))
    verts = vertices_of(e).localCheckpoint(eager=True)
    x = verts.select("id", F.lit(beta).alias("katz"))
    for _ in range(n_iter):
        sums = (
            e.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("katz").alias("s"))
        )
        x = (
            verts.join(sums, "id", "left")
            .select(
                "id",
                (
                    F.lit(beta) + F.lit(alpha) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("katz"),
            )
            .localCheckpoint(eager=False)
        )
    return x.select(F.col("id").cast("long"), "katz")


def personalized_pagerank_fixed(
    edges: DataFrame,
    sources: list[int],
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration personalized PageRank: the teleport distribution
    concentrates on ``sources`` (uniform over them) instead of all
    vertices — the "related to these seeds" ranking Cypher users build
    with weighted traversals.  SQL-expressible (no dangling term), so
    the driver oracle replays identical unrolled arithmetic.

    r_0 = e_S;  r_{k+1} = (1-d)·e_S + d·Pᵀ r_k,  e_S uniform on S.
    """
    # ew/verts materialized once — the pagerank_fixed discipline
    e = normalize_edges(edges)
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    ew = _hard_cut(
        e.join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
    )
    verts = vertices_of(e).localCheckpoint(eager=True)
    inv_s = 1.0 / len(sources)
    seed = F.when(F.col("id").isin(sources), F.lit(inv_s)).otherwise(F.lit(0.0))
    ranks = verts.select("id", seed.alias("rank"))
    for _ in range(n_iter):
        sums = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("rank")).alias("s"))
        )
        ranks = (
            verts.join(sums.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * seed
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_weighted_fixed(
    edges: DataFrame,
    n_iter: int = 4,
    damping: float = 0.85,
    weight_col: str = "weight",
) -> DataFrame:
    """Fixed-iteration PageRank with edge-weighted transition
    probabilities: each src distributes rank proportionally to
    ``weight`` instead of uniformly (the strength-of-dependency
    semantics — e.g. how many order lines tie a customer to a
    supplier).  SQL-expressible; the driver oracle replays identical
    unrolled arithmetic."""
    e = (
        edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col(weight_col).cast("double").alias("wt"),
        )
        .where((F.col("src") != F.col("dst")) & (F.col("wt") > 0))
        .groupBy("src", "dst")
        .agg(F.sum("wt").alias("wt"))
    )
    wsum = e.groupBy(F.col("src")).agg(F.sum("wt").alias("ws"))
    # ew/verts materialized once — the pagerank_fixed discipline
    ew = _hard_cut(
        e.join(wsum, "src")
        .select("src", "dst", (F.col("wt") / F.col("ws")).alias("w"))
    )
    verts = vertices_of(e).localCheckpoint(eager=True)
    n = verts.count()
    ranks = verts.select("id", (F.lit(1.0) / n).alias("rank"))
    for _ in range(n_iter):
        sums = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("rank")).alias("s"))
        )
        ranks = (
            verts.join(sums.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 20,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Multi-source BFS hop distances over the directed edge table —
    the variable-length-path reachability Cypher expresses as
    ``-[:REL*1..k]->``.  Exact: every reachable vertex gets its minimum
    hop count.  Frontier-based: each round expands only the *new*
    frontier (anti-join against visited), so total work is O(E) across
    all rounds, not O(E·depth)."""
    spark = edges.sparkSession
    e0 = normalize_edges(edges).persist()
    m0 = e0.count()
    shuffle = _auto_partitions(spark, m0, num_partitions)
    e_c = compact_ids(e0, m0)
    id_type = dict(e_c.dtypes)["src"]
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e_c.repartition(shuffle, "src"))
        e0.unpersist()
        stats = IterationStats(algorithm="bfs", edges=m0)
        frontier = (
            spark.createDataFrame([(int(s), 0) for s in sources], "id long, dist int")
            .select(F.col("id").cast(id_type).alias("id"), "dist")
            .localCheckpoint(eager=True)
        )
        visited = frontier
        # fused chunks (the core_numbers discipline): BFS depths chain
        # lazily, one frontier-count action per chunk; an empty frontier
        # makes later depths no-ops, so the chunk's LAST count being 0
        # is a sound drain test.  dist = frontier.dist + 1 (not
        # F.lit(depth)) keeps every round's plan textually identical so
        # whole-stage codegen compiles once per shape.
        depth = 0
        while depth < max_depth:
            chunk = min(4, max_depth - depth)
            t0 = time.monotonic()
            nxt = None
            for _ in range(chunk):
                depth += 1
                nxt = (
                    e.join(frontier.withColumnRenamed("id", "src"), "src")
                    .select(F.col("dst").alias("id"), (F.col("dist") + F.lit(1)).alias("dist"))
                    .dropDuplicates(["id"])
                    .join(visited.select("id"), "id", "left_anti")
                    .localCheckpoint(eager=False)
                )
                visited = visited.unionByName(nxt).localCheckpoint(eager=False)
                frontier = nxt
            n = nxt.count()
            wall = time.monotonic() - t0
            stats.iterations = depth
            stats.iter_seconds.extend([wall / chunk] * chunk)
            stats.deltas.append(float(n))
            if n == 0:
                stats.converged = True
                break
            visited = visited.localCheckpoint(eager=True)
        return visited.select(F.col("id").cast("long").alias("id"), "dist"), stats


def pseudo_diameter(
    edges: DataFrame,
    start: int | None = None,
    max_depth: int = 12,
) -> DataFrame:
    """Pseudo-diameter by double-sweep BFS (Magnien/Latapy/Habib; the
    igraph/NetworKit `pseudo_diameter` surface): BFS from ``start``
    (default: the minimum vertex id), take the farthest vertex (max
    dist, ties to the smaller id), BFS again from it — the second
    eccentricity is a lower bound on the true diameter that is exact
    on trees and empirically tight on real graphs, at the cost of TWO
    frontier BFS runs instead of all-pairs (the only tractable form at
    10^9 vertices).  Both sweeps reuse :func:`bfs_distances` (frontier
    anti-join discipline, O(E) total per sweep).  The two argmax picks
    are 1-row collects — bounded by construction.

    Directed edges are used as given — pass a symmetrized table for
    the undirected bound.  ``max_depth`` truncates both sweeps
    identically (distances ≤ max_depth are exact minima).  Returns one
    row: ``(start_id, reached, far_id, ecc1, far2_id,
    pseudo_diameter)``.
    """
    spark = edges.sparkSession
    e = normalize_edges(edges)
    if start is None:
        start = e.agg(F.min("src")).collect()[0][0]
        if start is None:  # empty edge table → empty result, not a crash
            return spark.createDataFrame(
                [],
                "start_id long, reached long, far_id long, ecc1 long, "
                "far2_id long, pseudo_diameter long",
            )
    d1, _ = bfs_distances(e, [int(start)], max_depth=max_depth)
    far1 = d1.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    reached = d1.count()
    d2, _ = bfs_distances(e, [int(far1["id"])], max_depth=max_depth)
    far2 = d2.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    return spark.createDataFrame(
        [
            (
                int(start),
                int(reached),
                int(far1["id"]),
                int(far1["dist"]),
                int(far2["id"]),
                int(far2["dist"]),
            )
        ],
        "start_id long, reached long, far_id long, ecc1 long, "
        "far2_id long, pseudo_diameter long",
    )


def densest_subgraph(
    edges: DataFrame,
    eps_num: int = 3,
    eps_den: int = 2,
    max_rounds: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """(2+2ε)-approximate densest subgraph by parallel peeling (Bahmani,
    Kumar & Vassilvitskii, VLDB 2012, "Densest subgraph in streaming and
    MapReduce"): each round removes EVERY vertex whose degree is ≤
    (1+ε)·(average degree of the current subgraph), records the round's
    density, and the answer is the subgraph alive at the start of the
    densest round.  ε = ``eps_num/eps_den − 1`` (default 3/2 → ε=0.5);
    the sequential exact peel (Charikar's one-vertex-at-a-time 2-approx)
    does not distribute, this removes a constant fraction per round so
    the schedule is O(log_{1+ε} |V|) rounds of one degree aggregate +
    two semi-joins each — the MapReduce formulation.

    Determinism across engines/partitionings: the removal test is the
    cross-multiplied integer comparison ``deg·V·eps_den ≤ 2E·eps_num``
    (no float enters the schedule), and the best round is chosen by the
    exact rational compare ``2E_r·V_s vs 2E_s·V_r`` with ties to the
    earliest round.  Each round removes at least the minimum-degree
    vertex (min ≤ avg ≤ (1+ε)avg), so termination is guaranteed; the
    per-round 2-row stats collect is the only driver action (bounded by
    the O(log V) round count).  Overflow bound: ``deg·V·eps_den`` stays
    below 2⁶³ for |V| ≤ 10⁹ with single-digit ε ratios.

    Returns ``(per_vertex, stats)`` where per_vertex is
    ``(id, peel_round, in_densest)`` — peel_round is 1-based, and
    ``in_densest = 1`` iff the vertex was still alive at the start of
    the densest round (peel_round ≥ best_round).  Pass an undirected
    edge table; it is symmetrized internally.
    """
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    stats = IterationStats(algorithm="densest_subgraph", edges=m0)
    if m0 == 0:
        sym0.unpersist()
        stats.converged = True
        return (
            spark.createDataFrame([], "id long, peel_round long, in_densest long"),
            stats,
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(sym0.repartition(shuffle, "src"))
        verts = vertices_of(e).localCheckpoint(eager=True)
        sym0.unpersist()
        peeled: list[DataFrame] = []
        round_stats: list[tuple[int, int, int]] = []  # (round, V, 2E)
        # ONE action per round: degs is a lazy checkpoint materialized by
        # the 2-row stats collect; the previous round's verts/e lazy
        # checkpoints materialize inside the same job (they feed degs),
        # and the peeled snapshots stay lazy until the final union —
        # was 5 eager jobs per round (guide §1.2: cut the driver-serial
        # job floor before touching per-task work)
        for rnd in range(1, max_rounds + 1):
            t0 = time.monotonic()
            degs = (
                verts.join(
                    e.groupBy(F.col("src").alias("id")).agg(
                        F.count("*").alias("deg")
                    ),
                    "id",
                    "left",
                )
                .select("id", F.coalesce("deg", F.lit(0)).alias("deg"))
                .localCheckpoint(eager=False)
            )
            agg = degs.agg(
                F.count("*").alias("nv"), F.sum("deg").alias("m2")
            ).collect()[0]
            nv, m2 = int(agg["nv"]), int(agg["m2"] or 0)
            if nv == 0:
                break
            round_stats.append((rnd, nv, m2))
            removed = degs.where(
                F.col("deg") * F.lit(nv) * F.lit(eps_den)
                <= F.lit(m2) * F.lit(eps_num)
            ).select("id")
            peeled.append(
                removed.select("id", F.lit(rnd).cast("long").alias("peel_round"))
                .localCheckpoint(eager=False)
            )
            verts = verts.join(removed, "id", "left_anti").localCheckpoint(eager=False)
            e = (
                e.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=False)
            )
            stats.iterations = rnd
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(nv))
        # exact rational argmax over per-round densities, ties → earliest
        best_round, best_v, best_m2 = 1, 1, 0
        for rnd, nv, m2 in round_stats:
            if m2 * best_v > best_m2 * nv:
                best_round, best_v, best_m2 = rnd, nv, m2
        stats.converged = True
        out = peeled[0]
        for p in peeled[1:]:
            out = out.unionByName(p)
        return (
            out.select(
                F.col("id").cast("long"),
                "peel_round",
                (F.col("peel_round") >= F.lit(best_round))
                .cast("long")
                .alias("in_densest"),
            ),
            stats,
        )


def bfs_relabel(
    edges: DataFrame,
    start: int | None = None,
    max_depth: int = 32,
    rank_buckets: int = 4096,
) -> DataFrame:
    """Locality-preserving BFS vertex relabeling — the ordering step of
    WebGraph-style compressed adjacency layouts (Boldi & Vigna, WWW'04):
    vertices are renumbered in breadth-first order from ``start``
    (default: minimum id) so that neighbors get nearby ids and the
    delta-encoded adjacency gaps shrink.  New id = rank in the global
    ``(level, old_id)`` order; unreached vertices sort after all reached
    ones (level = max_depth+1), again by old id — fully deterministic.

    The global rank is NOT a single-partition window: ranks are
    assigned with the two-phase distributed prefix sum used by
    ``packing.pack_sequences`` — bucket by ``(level, old_id range)``,
    compute per-bucket counts (small), broadcast exclusive offsets
    back, then row_number WITHIN each bucket — so the heavy pass
    parallelises across ``rank_buckets``·levels partitions.

    Returns ``(id, level, new_id)``; new_id is 0-based.
    """
    # materialized once: e feeds the start argmin, the BFS, vertices_of
    # and the final rank join — several actions that would otherwise
    # each re-run the caller's edge-construction plan
    e = _hard_cut(normalize_edges(edges))
    if start is None:
        start = e.agg(F.min("src")).collect()[0][0]
        if start is None:  # empty edge table → empty mapping, not a crash
            return edges.sparkSession.createDataFrame(
                [], "id long, level long, new_id long"
            )
    dists, _ = bfs_distances(e, [int(start)], max_depth=max_depth)
    verts = vertices_of(e)
    lv = verts.join(dists, "id", "left").select(
        "id", F.coalesce("dist", F.lit(max_depth + 1)).cast("long").alias("level")
    )
    hi = lv.agg(F.max("id").alias("hi")).collect()[0]["hi"]
    width = max(1, (int(hi) + rank_buckets) // rank_buckets)
    lv = lv.withColumn("_bkt", (F.col("id") / F.lit(width)).cast("long"))
    counts = lv.groupBy("level", "_bkt").agg(F.count("*").alias("_n"))
    # exclusive running offsets over the tiny (levels × buckets) table
    w = Window.orderBy("level", "_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "level", "_bkt", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_off")
    )
    in_bkt = Window.partitionBy("level", "_bkt").orderBy("id")
    return (
        lv.join(F.broadcast(offsets), ["level", "_bkt"])
        .select(
            "id",
            "level",
            (F.col("_off") + F.row_number().over(in_bkt) - 1)
            .cast("long")
            .alias("new_id"),
        )
    )


def wl_colors(
    edges: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """Weisfeiler-Lehman color refinement (1-WL): iteratively recolor
    every vertex by the dense rank of (its color, the sorted multiset
    of its neighbors' colors) — the canonical structural fingerprint
    (graph-isomorphism screening, GNN expressiveness bound, structural
    dedup of subgraphs).  ``rounds`` sweeps; colors start at degree.

    Engine-exact: the multiset signature is the comma-joined
    numerically-sorted neighbor color list, and the recoloring is a
    dense rank over ``(previous color, signature)`` computed with the
    two-phase distributed prefix sum (bucketed by the previous color —
    refinement only ever SPLITS classes, so that order is monotone and
    no single-partition window appears).  Each round is one join + one
    groupBy + the rank — O(E) per round.  Pass a symmetrized table for
    undirected semantics.  Returns ``(id, color)``; equal colors after
    k rounds ⇔ indistinguishable by k-hop 1-WL.
    """
    from polar_spark.operators.text import _dense_rank_pairs

    # materialize the normalized edges ONCE: e is referenced by every
    # round's neigh join and by several actions per round (the dense-
    # rank bucket collect + the colors checkpoint) — without the cut
    # each action re-executes the caller's full edge-construction plan
    # (measured: the co-order self-join re-ran ~6x, 30 s → 8 s at sf0.1)
    e = _hard_cut(normalize_edges(edges))
    colors = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("color"))
        .localCheckpoint(eager=True)
    )
    # colors are degrees (round 0) then dense ranks — both bounded by the
    # vertex count, so one count on the checkpointed init replaces the
    # per-round max-aggregate inside _dense_rank_pairs, and the fixed
    # rounds chain LAZILY into the caller's single action (no per-round
    # driver round-trip; the rank is bucket-width-invariant, see
    # _dense_rank_pairs).
    n_verts = colors.count()
    for _ in range(rounds):
        neigh = e.join(
            colors.select(F.col("id").alias("dst"), F.col("color").alias("nc")),
            "dst",
        ).select(F.col("src").alias("id"), "nc")
        sigs = neigh.groupBy("id").agg(
            F.concat_ws(",", F.sort_array(F.collect_list("nc"))).alias("sig")
        )
        paired = colors.join(sigs, "id").select(
            "id", F.col("color").alias("r1"), F.col("sig").alias("r2")
        )
        colors = (
            _dense_rank_pairs(paired, hi=max(int(n_verts), 1))
            .select("id", F.col("new_rank").alias("color"))
            .localCheckpoint(eager=False)
        )
    return colors.select(F.col("id").cast("long"), F.col("color").cast("long"))


def bfs_per_source(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 20,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Per-source BFS hop distances: ``(source, id, dist)`` for every
    (landmark, reachable vertex) pair — the primitive behind landmark
    centralities (harmonic/closeness estimates sample a landmark set
    instead of all-pairs BFS, the only tractable form at 10^9 vertices).
    Same frontier discipline as :func:`bfs_distances` but state is keyed
    on (source, id), so total work is O(|landmarks| · E)."""
    spark = edges.sparkSession
    e0 = normalize_edges(edges).persist()
    m0 = e0.count()
    shuffle = _auto_partitions(spark, m0, num_partitions)
    e_c = compact_ids(e0, m0)
    id_type = dict(e_c.dtypes)["src"]
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e_c.repartition(shuffle, "src"))
        e0.unpersist()
        stats = IterationStats(algorithm="bfs_per_source", edges=m0)
        frontier = (
            spark.createDataFrame(
                [(int(s), int(s), 0) for s in sources], "source long, id long, dist int"
            )
            .select(
                F.col("source").cast(id_type).alias("source"),
                F.col("id").cast(id_type).alias("id"),
                "dist",
            )
            .localCheckpoint(eager=True)
        )
        visited = frontier
        # fused chunks + shape-stable dist (see bfs_distances): one
        # frontier-count action per 4 depths, codegen compiled once
        depth = 0
        while depth < max_depth:
            chunk = min(4, max_depth - depth)
            t0 = time.monotonic()
            nxt = None
            for _ in range(chunk):
                depth += 1
                nxt = (
                    e.join(frontier.withColumnRenamed("id", "src"), "src")
                    .select(
                        "source", F.col("dst").alias("id"),
                        (F.col("dist") + F.lit(1)).alias("dist"),
                    )
                    .dropDuplicates(["source", "id"])
                    .join(visited.select("source", "id"), ["source", "id"], "left_anti")
                    .localCheckpoint(eager=False)
                )
                visited = visited.unionByName(nxt).localCheckpoint(eager=False)
                frontier = nxt
            n = nxt.count()
            wall = time.monotonic() - t0
            stats.iterations = depth
            stats.iter_seconds.extend([wall / chunk] * chunk)
            stats.deltas.append(float(n))
            if n == 0:
                stats.converged = True
                break
            visited = visited.localCheckpoint(eager=True)
        return (
            visited.select(
                F.col("source").cast("long").alias("source"),
                F.col("id").cast("long").alias("id"),
                "dist",
            ),
            stats,
        )


def harmonic_centrality(
    edges: DataFrame,
    landmarks: list[int],
    max_depth: int = 20,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Landmark harmonic centrality: ``H(v) = Σ_s 1/dist(s, v)`` over the
    landmark set (dist > 0).  Exact for the given landmarks; sampling
    landmarks uniformly gives the standard unbiased estimator of full
    harmonic centrality (Boldi & Vigna, "Axioms for centrality", 2014)
    without the O(V·E) all-pairs cost."""
    dist, stats = bfs_per_source(edges, landmarks, max_depth, num_partitions)
    h = (
        dist.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum(F.lit(1.0) / F.col("dist").cast("double")).alias("harmonic"))
    )
    return h, stats


# --------------------------------------------------------------------------
# k-core decomposition (iterative peeling)


def kcore(
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """k-core of the undirected graph: the maximal subgraph in which
    every vertex has degree ≥ k.  Iteratively peels vertices with
    degree < k until a fixpoint — each round is one degree aggregate
    plus two semi-joins filtering the edge set, all shuffles pinned on
    the vertex key.  Returns ``(id, deg)`` — core members with their
    within-core degree — plus stats (``converged`` is always True at
    return unless ``max_iter`` was hit; extra rounds after the fixpoint
    are no-ops, which is what makes a fixed-round unrolled-SQL oracle
    exact).  Peeling is the standard distributed formulation (each
    round removable in O(E) with map-side combine); the sequential
    min-degree ordering used by single-node implementations does not
    distribute."""
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "id long, deg long"),
            IterationStats(algorithm="kcore", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    sym_c = compact_ids(sym0, m0)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(sym_c.repartition(shuffle, "src"))
        sym0.unpersist()
        stats = IterationStats(algorithm="kcore", edges=m0)
        prev_m = e.count()
        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            keep = (
                e.groupBy("src")
                .agg(F.count("*").alias("deg"))
                .where(F.col("deg") >= k)
                .select(F.col("src").alias("id"))
            )
            e_next = (
                e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            m = e_next.count()
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(prev_m - m))
            e = e_next
            if m == prev_m:
                stats.converged = True
                break
            prev_m = m
        core = e.groupBy(F.col("src").cast("long").alias("id")).agg(
            F.count("*").alias("deg")
        )
        return core, stats


def core_numbers(
    edges: DataFrame,
    max_iter: int = 200,
    num_partitions: int | None = None,
    fuse_rounds: int = 8,
) -> tuple[DataFrame, IterationStats]:
    """Full k-core decomposition: every vertex → its coreness (the max k
    such that it belongs to the k-core).  H-index fixpoint iteration
    (Lü, Zhou, Zhang & Stanley, "The H-index of a network node", 2016):
    h₀(v) = degree(v); each round h(v) ← H-index of its neighbors'
    h-values; the fixpoint is exactly the coreness.  Monotone
    non-increasing, so convergence is detected with one count of changed
    vertices per round; the H-index is a per-vertex sort-window +
    max(least(rank, value)) — both engines compute it identically, and
    rounds past the fixpoint are no-ops (what makes the unrolled-SQL
    oracle exact).  Unlike sequential min-degree peeling this is a
    per-round O(E) data-parallel sweep — the distributable formulation.

    Frontier-scoped: h(v) only changes when a neighbor's h changed, so
    after the first sweep each round recomputes ONLY vertices adjacent
    to the previous round's changed set — identical fixpoint, and the
    long convergence tail (dozens of rounds with a handful of changes)
    costs per-round work proportional to the shrinking frontier's
    neighborhood instead of O(E).

    Fused rounds: ``fuse_rounds`` rounds chain lazily (the
    ``_pagerank_fused`` pattern — each round's state is a lazy
    localCheckpoint, the chunk's single changed-count action
    materializes the whole chain), so the driver pays one job per chunk
    instead of one per round.  Convergence is checked at chunk
    granularity: a round with zero changes empties the frontier, so
    every later round is a no-op and the chunk's LAST round's changed
    count is a sound convergence test — the fixpoint is identical, at
    most ``fuse_rounds - 1`` no-op rounds run past it.  At sf0.1 the
    38-round tail was driver-action-bound (~1 s/round floor); fusing
    cuts those 38 scheduling round-trips to ~10 while keeping the
    frontier-scoped per-round work."""
    spark = edges.sparkSession
    from pyspark.sql.window import Window

    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "id long, core long"),
            IterationStats(algorithm="core_numbers", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    sym_c = compact_ids(sym0, m0)
    with _shuffle_conf(spark, shuffle):
        # edges keyed by dst: the per-round h-lookup join is then
        # EXCHANGE-FREE (h is hash-partitioned on id; renaming id→dst
        # carries the partitioning, shuffle_hash joins in place — the
        # fused-PageRank alignment).  Each round pays exactly TWO stage
        # barriers: the contrib shuffle to src for the H-aggregate, and
        # the chunk's action; everything else pipelines.
        # plain localCheckpoint (NOT _hard_cut): the leaf inherits the
        # origin plan's size estimate, which keeps the frontier semi-join
        # (nbr ⨝ cand) broadcastable — with the default huge estimate the
        # planner shuffles nbr every round (A/B: 27.6 s vs 37.1 s at
        # sf0.1).  The loop's other joins are pinned by shuffle_hash
        # hints, so the small estimate cannot mis-broadcast the edge side.
        e_dst = sym_c.repartition(shuffle, "dst").localCheckpoint(eager=True)
        sym0.unpersist()
        h = (
            e_dst.groupBy(F.col("src").alias("id"))
            .agg(F.count("*").cast("long").alias("h"))
            .localCheckpoint(eager=True)
        )
        stats = IterationStats(algorithm="core_numbers", edges=m0, vertices=h.count())
        cand = None  # None = all vertices (first sweep)
        it = 0
        while it < max_iter:
            chunk = min(max(1, fuse_rounds), max_iter - it)
            t0 = time.monotonic()
            merged = None
            for _ in range(chunk):
                nbr = e_dst.join(
                    h.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst"
                ).select(F.col("src").alias("id"), F.col("h").alias("hv"))
                if cand is not None:
                    # frontier scope rides the SAME exchange the groupBy
                    # needs (join on id → output partitioned by id → no
                    # extra shuffle before the aggregate); the per-round
                    # SHUFFLE is thus bounded by the changed neighborhood
                    # (the map-side h-lookup stays O(E) from local cache —
                    # the same per-round cost class as the fused PageRank
                    # contrib join)
                    nbr = nbr.join(cand, "id", "left_semi")
                h_cand = (
                    # H-index = max_i min(i, arr[i]) over the desc-sorted
                    # neighbor h-values — one groupBy + JVM array
                    # expressions (no per-round row_number sort window)
                    nbr.groupBy("id")
                    .agg(F.sort_array(F.collect_list("hv"), asc=False).alias("arr"))
                    .select(
                        "id",
                        F.expr(
                            "array_max(zip_with(arr, sequence(1, size(arr)),"
                            " (x, i) -> least(x, CAST(i AS BIGINT))))"
                        ).alias("h_new"),
                    )
                )
                merged = (
                    h.join(h_cand.hint("shuffle_hash"), "id", "left")
                    .select(
                        "id",
                        F.coalesce(F.col("h_new"), F.col("h")).alias("h"),
                        (F.coalesce(F.col("h_new"), F.col("h")) != F.col("h")).alias(
                            "_chg"
                        ),
                    )
                    # lazy: the chunk's single changed-count action
                    # materializes every round's checkpoint in the chain
                    .localCheckpoint(eager=False)
                )
                h = merged.select("id", "h")
                # next round: only neighbors of changed vertices can move.
                # changed is partitioned by id; renamed dst it aligns with
                # e_dst, so the semi-join is exchange-free too.  No
                # .distinct(): a semi-join probe needs no dedup.
                cand = (
                    e_dst.join(
                        merged.where(F.col("_chg"))
                        .select("id")
                        .withColumnRenamed("id", "dst")
                        .hint("shuffle_hash"),
                        "dst",
                        "left_semi",
                    )
                    .select(F.col("src").alias("id"))
                )
            # one action per CHUNK; zero changes in the chunk's last round
            # ⇒ empty frontier ⇒ fixpoint (monotone, frontier-scoped)
            changed = int(
                merged.agg(F.sum(F.col("_chg").cast("long"))).collect()[0][0] or 0
            )
            wall = time.monotonic() - t0
            it += chunk
            stats.iterations = it
            stats.iter_seconds.extend([wall / chunk] * chunk)
            stats.deltas.append(float(changed))
            if changed == 0:
                stats.converged = True
                break
        return (
            h.select(F.col("id").cast("long").alias("id"), F.col("h").alias("core")),
            stats,
        )


def ktruss(
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """k-truss of the undirected graph: the maximal subgraph in which
    every edge participates in ≥ k−2 triangles.  Simultaneous-drop
    peeling (the standard distributed formulation): each round computes
    per-edge triangle support and removes every under-supported edge at
    once, until a fixpoint.  Support is computed by id-ordered triangle
    enumeration over canonical (src<dst) edges — each triangle found
    exactly once and attributed to its three edges — so per-round cost
    is the triangle-join cost, not the hub-squared wedge cost.  Returns
    the surviving edges with their within-truss support.  Rounds past
    the fixpoint are no-ops (unrolled-SQL-oracle exactness)."""
    if k < 3:
        raise ValueError("k-truss is defined for k >= 3 (k-2 triangles per edge)")
    spark = edges.sparkSession
    und0 = (
        symmetrize(normalize_edges(edges))
        .where(F.col("src") < F.col("dst"))
        .persist()
    )
    m0 = und0.count()
    if m0 == 0:
        und0.unpersist()
        return (
            spark.createDataFrame([], "src long, dst long, support long"),
            IterationStats(algorithm="ktruss", edges=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    e_c = compact_ids(und0, m0)
    with _shuffle_conf(spark, shuffle):
        cur = _hard_cut(e_c.repartition(shuffle, "src"))
        und0.unpersist()
        stats = IterationStats(algorithm="ktruss", edges=m0)
        prev_m = cur.count()

        def support(e: DataFrame) -> DataFrame:
            ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
            ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
            tri = ab.join(bc, "b").join(ac, ["a", "c"])
            per_edge = (
                tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
                .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
                .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
            )
            return per_edge.groupBy("src", "dst").agg(
                F.count("*").cast("long").alias("support")
            )

        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            sup = support(cur)
            nxt = cur.join(
                sup.where(F.col("support") >= k - 2), ["src", "dst"], "left_semi"
            ).localCheckpoint(eager=True)
            m = nxt.count()
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(prev_m - m))
            cur = nxt
            if m == prev_m:
                stats.converged = True
                break
            prev_m = m
        out = cur.join(support(cur), ["src", "dst"], "left").select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support"),
        )
        return out, stats


def random_walks(
    edges: DataFrame,
    walk_length: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic random-walk corpus generation (the node2vec /
    DeepWalk input): one walk per vertex with out-edges, advanced
    ``walk_length`` steps by picking the neighbor at index
    ``(cur·31 + step·17 + seed) mod out_degree`` in the id-ordered
    adjacency list.  The pick function is plain integer arithmetic so
    the walks are (a) reproducible across runs and engines — the SQL
    oracle unrolls the same steps — and (b) resumable/shardable with no
    RNG state.  Walks stop early at sinks.  Returns
    ``(start, step, vertex)`` rows; each step is one join against the
    ranked adjacency list, so the whole corpus is O(L·V) join rows —
    no Python in the path.  For training-embedding corpora swap the
    arithmetic pick for ``xxhash64`` (same shape, better mixing);
    kept linear here for cross-engine oracle equality."""
    from pyspark.sql.window import Window

    e = normalize_edges(edges)
    nbr = e.withColumn(
        "rnk", F.row_number().over(Window.partitionBy("src").orderBy("dst")).cast("long")
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    nbr = nbr.join(deg, "src")
    walk = deg.select(
        F.col("src").alias("start"), F.lit(0).alias("step"), F.col("src").alias("cur")
    )
    out = walk
    for step in range(1, walk_length + 1):
        pick = (
            (F.col("cur") * F.lit(31) + F.lit(step * 17) + F.lit(seed)) % F.col("deg")
        ) + F.lit(1)
        walk = (
            walk.join(nbr, walk.cur == nbr.src)
            .where(F.col("rnk") == pick)
            .select("start", F.lit(step).alias("step"), F.col("dst").alias("cur"))
        )
        out = out.unionByName(walk)
    return out.select(
        F.col("start").cast("long"),
        F.col("step").cast("int"),
        F.col("cur").cast("long").alias("vertex"),
    )


def random_walks_biased(
    edges: DataFrame,
    walk_length: int,
    w_ret: int = 4,
    w_bfs: int = 2,
    w_dfs: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Second-order (node2vec-style) deterministic walk corpus: the
    (p, q) bias expressed as INTEGER weights per candidate class —
    ``w_ret`` for returning to the previous vertex (node2vec 1/p),
    ``w_bfs`` for candidates that are direct successors of the previous
    vertex (distance 1, weight 1 in node2vec — scaled), ``w_dfs`` for
    everything else (1/q).  Defaults (4, 2, 1) encode p=0.5, q=2.

    The step picks the candidate whose cumulative weight interval (over
    the id-ordered adjacency) contains
    ``(cur·31 + prev·13 + step·17 + seed) mod Σw`` — pure integer
    arithmetic, so walks are reproducible across runs/engines and the
    SQL oracle unrolls identical steps.  The distance-1 test uses the
    directed successor set of ``prev`` (documented deviation from
    undirected node2vec).  The first step has no predecessor and picks
    uniformly like :func:`random_walks`.  Cost: each biased step joins
    the frontier's full out-neighborhood once against the edge table to
    classify candidates — O(L·E) join rows worst case, the inherent
    price of second-order bias; no Python anywhere.  Returns
    ``(start, step, vertex)``."""
    from pyspark.sql.window import Window

    e = normalize_edges(edges)
    nbr = e.withColumn(
        "rnk", F.row_number().over(Window.partitionBy("src").orderBy("dst")).cast("long")
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    nbr = nbr.join(deg, "src")
    out = deg.select(
        F.col("src").alias("start"), F.lit(0).alias("step"), F.col("src").alias("vertex")
    )
    # step 1: uniform (no predecessor yet), carrying prev forward
    pick1 = ((F.col("cur") * F.lit(31) + F.lit(17) + F.lit(seed)) % F.col("deg")) + F.lit(1)
    walk = (
        deg.select(F.col("src").alias("start"), F.col("src").alias("cur"))
        .join(nbr, F.col("cur") == nbr.src)
        .where(F.col("rnk") == pick1)
        .select("start", F.col("cur").alias("prev"), F.col("dst").alias("cur"))
    )
    out = out.unionByName(
        walk.select("start", F.lit(1).alias("step"), F.col("cur").alias("vertex"))
    )
    ep = e.select(F.col("src").alias("prev"), F.col("dst").alias("_pd"), F.lit(True).alias("_common"))
    for step in range(2, walk_length + 1):
        c = walk.alias("w").join(nbr.alias("n"), F.col("w.cur") == F.col("n.src"))
        c = c.join(
            ep.alias("p"),
            (F.col("w.prev") == F.col("p.prev")) & (F.col("n.dst") == F.col("p._pd")),
            "left",
        ).select(
            F.col("w.start").alias("start"),
            F.col("w.prev").alias("prev"),
            F.col("w.cur").alias("cur"),
            F.col("n.dst").alias("dst"),
            F.when(F.col("n.dst") == F.col("w.prev"), F.lit(w_ret))
            .when(F.col("p._common").isNotNull(), F.lit(w_bfs))
            .otherwise(F.lit(w_dfs))
            .cast("long")
            .alias("wt"),
        )
        wcum = (
            Window.partitionBy("start")
            .orderBy("dst")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wtot = Window.partitionBy("start")
        r = (
            F.col("cur") * F.lit(31) + F.col("prev") * F.lit(13) + F.lit(step * 17 + seed)
        ) % F.col("tot")
        walk = (
            c.withColumn("cum", F.sum("wt").over(wcum))
            .withColumn("tot", F.sum("wt").over(wtot))
            .where((F.col("cum") - F.col("wt") <= r) & (r < F.col("cum")))
            .select("start", F.col("cur").alias("prev"), F.col("dst").alias("cur"))
        )
        out = out.unionByName(
            walk.select("start", F.lit(step).alias("step"), F.col("cur").alias("vertex"))
        )
    return out.select(
        F.col("start").cast("long"),
        F.col("step").cast("int"),
        F.col("vertex").cast("long"),
    )


def strongly_connected_components(
    edges: DataFrame,
    max_outer: int = 100,
    max_iter: int = 500,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Exact SCCs of the directed graph by iterative coloring (Orzan;
    the FW-BW decomposition in its data-parallel form):

    1. forward max-propagation to a fixpoint — color(v) = max id that
       can reach v;
    2. every v with color(v) == v is a root; the SCC of root r is
       exactly the set of vertices with color r from which r is
       backward-reachable through color-r vertices (collected with a
       frontier sweep);
    3. peel all discovered SCCs (every root's, simultaneously) and
       repeat on the remainder.

    Each outer round is a handful of join-aggregate sweeps; all SCCs
    whose max vertex dominates their neighborhood extract in round 1,
    so outer depth is small on real graphs.  Labels are remapped to
    min(member id) — the same contract as connected_components and the
    transitive-closure SQL oracle.  Returns (id, scc) for every vertex
    appearing in the (self-loop-stripped) edge set."""
    spark = edges.sparkSession
    e0 = normalize_edges(edges).persist()
    m0 = e0.count()
    if m0 == 0:
        e0.unpersist()
        return (
            spark.createDataFrame([], "id long, scc long"),
            IterationStats(algorithm="scc", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    e_c = compact_ids(e0, m0)
    id_type = dict(e_c.dtypes)["src"]
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e_c.repartition(shuffle, "src"))
        e0.unpersist()
        remaining = vertices_of(e).localCheckpoint(eager=True)
        stats = IterationStats(algorithm="scc", edges=m0, vertices=remaining.count())
        assigned = spark.createDataFrame([], f"id {id_type}, root {id_type}")
        for outer in range(1, max_outer + 1):
            if remaining.count() == 0:
                stats.converged = True
                break
            stats.iterations = outer
            t0 = time.monotonic()
            # 1. forward max coloring to fixpoint.  Rounds chain LAZILY
            # in chunks of `_chunk` with ONE changed-count action per
            # chunk (the _pagerank_fused pattern): max-propagation is
            # monotone, so "last round of the chunk changed nothing" is
            # a sound fixpoint test, and the convergence tail pays one
            # driver round-trip per chunk instead of per round.
            color = remaining.select("id", F.col("id").alias("color")).localCheckpoint(
                eager=True
            )
            _chunk = 4
            done = 0
            chg = -1
            while done < max_iter and chg != 0:
                new_color = None
                for _ in range(min(_chunk, max_iter - done)):
                    nbr = (
                        e.join(color.withColumnRenamed("id", "src"), "src")
                        .groupBy(F.col("dst").alias("id"))
                        .agg(F.max("color").alias("nbr_color"))
                    )
                    new_color = (
                        color.join(nbr, "id", "left")
                        .select(
                            "id",
                            F.greatest(
                                F.col("color"), F.coalesce(F.col("nbr_color"), F.col("color"))
                            ).alias("color"),
                            (
                                F.coalesce(F.col("nbr_color"), F.col("color")) > F.col("color")
                            ).alias("_chg"),
                        )
                        .localCheckpoint(eager=False)
                    )
                    color = new_color.select("id", "color")
                    done += 1
                chg = int(
                    new_color.agg(F.sum(F.col("_chg").cast("long"))).collect()[0][0] or 0
                )
            if chg != 0:
                # proceeding with partially propagated colors would
                # produce WRONG SCC labels — refuse instead
                raise RuntimeError(
                    f"scc forward coloring did not converge in {max_iter} rounds "
                    f"({chg} colors still changing) — raise max_iter"
                )
            # 2. backward sweep from roots within same color
            frontier = color.where(F.col("color") == F.col("id")).localCheckpoint(eager=True)
            members = frontier
            while True:
                nxt = (
                    e.join(frontier.withColumnRenamed("id", "dst"), "dst")
                    .select(F.col("src").alias("id"), "color")
                    .dropDuplicates(["id", "color"])
                    .join(color.withColumnRenamed("color", "_c"), "id")
                    .where(F.col("_c") == F.col("color"))
                    .select("id", "color")
                    .join(members, ["id", "color"], "left_anti")
                    .localCheckpoint(eager=True)
                )
                if nxt.count() == 0:
                    break
                members = members.unionByName(nxt).localCheckpoint(eager=True)
                frontier = nxt
            # 3. peel
            assigned = assigned.unionByName(
                members.select("id", F.col("color").alias("root"))
            ).localCheckpoint(eager=True)
            remaining = remaining.join(members.select("id"), "id", "left_anti").localCheckpoint(
                eager=True
            )
            e = (
                e.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(remaining.count()))
        # remap root → min member id (stable, engine-agnostic label)
        label = assigned.groupBy("root").agg(F.min("id").alias("scc"))
        out = assigned.join(label, "root").select(
            F.col("id").cast("long").alias("id"), F.col("scc").cast("long").alias("scc")
        )
        return out, stats


def anf(
    edges: DataFrame,
    rounds: int,
    replicas: int = 8,
    seed: int = 1,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Approximate neighborhood function (ANF / HyperANF family,
    Palmer-Gibbons-Faloutsos KDD'02; Boldi-Rosa-Vigna WWW'11): per
    vertex, an estimate of how many vertices are reachable within
    ``rounds`` hops, from Flajolet-Martin bit registers OR-merged along
    edges — the sketch that answers reachability-cardinality questions
    at 10^9-vertex scale where exact per-source BFS is O(V·E).

    Everything is JVM expressions: register init is
    ``1 << ρ(h(v, j))`` with the deterministic arithmetic hash
    ``h = (v·2654435761 + j·97 + seed) mod 2³¹`` and ρ = trailing-zero
    count via ``bit_count((h & -h) - 1)``; each round OR-merges
    out-neighbor registers (``bit_or`` aggregate — partial-aggregatable,
    one shuffle per round); the estimate is ``2^(mean_j ρ₀)/0.77351``
    with ρ₀ the lowest unset bit.  Deterministic ⇒ the unrolled-SQL
    oracle computes the identical registers and estimates; accuracy is
    governed by ``replicas`` (stddev ≈ 1.1/√R as usual for FM).
    Returns (id, est) plus per-round stats."""
    spark = edges.sparkSession
    e0 = normalize_edges(edges).persist()
    m0 = e0.count()
    if m0 == 0:
        e0.unpersist()
        return (
            spark.createDataFrame([], "id long, est double"),
            IterationStats(algorithm="anf", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e0.repartition(shuffle, "src"))
        verts = vertices_of(e).localCheckpoint(eager=True)
        e0.unpersist()
        stats = IterationStats(algorithm="anf", edges=m0, vertices=verts.count())
        # xorshift-multiply mix, every intermediate kept < 2^31 so the
        # <2^62 products are overflow-safe in engines that error on
        # int64 overflow (DuckDB) — the SQL oracle repeats it verbatim
        j = F.col("j")
        x0 = (F.col("id") * F.lit(2654435761) + j * F.lit(97) + F.lit(seed)) % F.lit(
            2**31
        )
        x1 = (
            x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)
        ) % F.lit(2**31)
        h = x1.bitwiseXOR(F.shiftright(x1, 17))
        rho = F.least(
            F.bit_count((h.bitwiseAND(-h)) - F.lit(1)), F.lit(62)
        )
        reg = (
            verts.crossJoin(
                spark.range(replicas).select(F.col("id").cast("int").alias("j"))
            )
            .select("id", "j", rho.alias("rho"))
            .select(
                "id", "j", F.expr("shiftleft(CAST(1 AS BIGINT), rho)").alias("reg")
            )
            .localCheckpoint(eager=True)
        )
        for it in range(1, rounds + 1):
            t0 = time.monotonic()
            nbr = (
                e.join(reg.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"), "j")
                .agg(F.expr("bit_or(reg)").alias("nbr_reg"))
            )
            reg = (
                reg.join(nbr, ["id", "j"], "left")
                .select(
                    "id",
                    "j",
                    F.col("reg")
                    .bitwiseOR(F.coalesce(F.col("nbr_reg"), F.lit(0)))
                    .alias("reg"),
                )
                .localCheckpoint(eager=True)
            )
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
        stats.converged = True
        # ρ₀ = position of the lowest UNSET bit: isolate with ~reg & (reg+1)
        rho0 = F.bit_count(
            (F.bitwise_not(F.col("reg")).bitwiseAND(F.col("reg") + F.lit(1))) - F.lit(1)
        )
        est = (
            reg.select("id", rho0.cast("double").alias("r0"))
            .groupBy("id")
            .agg(
                (F.pow(F.lit(2.0), F.avg("r0")) / F.lit(0.77351)).alias("est")
            )
        )
        return est.select(F.col("id").cast("long"), "est"), stats


def betweenness_landmarks(
    edges: DataFrame,
    landmarks: list[int],
    max_depth: int = 4,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Bounded-depth Brandes betweenness from a landmark set over the
    undirected graph: forward level-synchronous sweep accumulates
    shortest-path counts σ(s,v); the backward sweep accumulates
    dependencies δ(s,v) = Σ_w σv/σw·(1+δw) level by level; bc(v) =
    Σ_s δ(s,v).  Landmark sampling is the standard unbiased estimator
    (Brandes-Pich 2007) — exact all-sources Brandes is O(V·E) and does
    not exist at 10^9 vertices; ``max_depth`` truncates to paths of
    ≤ max_depth hops (k-betweenness), which both this and the unrolled
    SQL oracle implement identically.  All phases are keyed on
    (source, vertex), so every landmark advances in the same
    join-aggregate sweep."""
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "id long, bc double"),
            IterationStats(algorithm="betweenness", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(sym0.repartition(shuffle, "src"))
        verts = vertices_of(e).localCheckpoint(eager=True)
        sym0.unpersist()
        stats = IterationStats(algorithm="betweenness", edges=m0, vertices=verts.count())
        levels: list[DataFrame] = [
            spark.createDataFrame(
                [(int(s), int(s), 1) for s in landmarks], "source long, id long, sigma long"
            ).localCheckpoint(eager=True)
        ]
        visited = levels[0].select("source", "id")
        for _d in range(1, max_depth + 1):
            t0 = time.monotonic()
            nxt = (
                e.join(levels[-1].withColumnRenamed("id", "src"), "src")
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(visited, ["source", "id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.count() == 0:
                break
            levels.append(nxt)
            visited = visited.unionByName(nxt.select("source", "id")).localCheckpoint(
                eager=True
            )
            stats.iterations += 1
            stats.iter_seconds.append(time.monotonic() - t0)
        # backward dependency accumulation (deepest level has δ = 0)
        deep = len(levels) - 1
        delta = levels[deep].select("source", "id", F.lit(0.0).alias("delta"))
        acc: DataFrame | None = None
        for d in range(deep - 1, -1, -1):
            t0 = time.monotonic()
            succ = delta.join(
                levels[d + 1].select("source", "id", F.col("sigma").alias("sigma_w")),
                ["source", "id"],
            ).select(
                "source", F.col("id").alias("dst"), "sigma_w", F.col("delta").alias("delta_w")
            )
            contrib = (
                levels[d]
                .withColumnRenamed("id", "src")
                .join(e, "src")
                .join(succ, ["source", "dst"])
                .groupBy("source", F.col("src").alias("id"))
                .agg(
                    F.sum(
                        F.col("sigma").cast("double")
                        / F.col("sigma_w").cast("double")
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("delta")
                )
            )
            delta = (
                levels[d]
                .select("source", "id")
                .join(contrib, ["source", "id"], "left")
                .select("source", "id", F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"))
                .localCheckpoint(eager=True)
            )
            if d >= 1:  # the source itself (level 0) is excluded from bc
                acc = delta if acc is None else acc.unionByName(delta)
            stats.iter_seconds.append(time.monotonic() - t0)
        stats.converged = True
        if acc is None:
            bc = verts.select("id", F.lit(0.0).alias("bc"))
        else:
            per_vertex = acc.groupBy("id").agg(F.sum("delta").alias("bc"))
            bc = verts.join(per_vertex, "id", "left").select(
                "id", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc")
            )
        return bc.select(F.col("id").cast("long"), "bc"), stats


def sssp(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 200,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Weighted single-source (multi-source) shortest paths by
    frontier-scoped Bellman-Ford relaxation over a directed
    ``(src, dst, w)`` edge table with non-negative integer weights:
    each round relaxes only edges out of vertices whose distance
    improved last round, so total work is O(E · hop-depth-of-change),
    and the loop converges when no distance improves.  Relaxation past
    the fixpoint is a no-op — the unrolled-SQL-oracle property shared
    by the peel/H-index operators.  Returns (id, dist) for reached
    vertices."""
    spark = edges.sparkSession
    e0 = (
        edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w").cast("long")
        )
        .where(F.col("src") != F.col("dst"))
        # parallel edges: keep the MINIMUM weight deterministically (a
        # dropDuplicates here would keep an arbitrary one — wrong
        # distances on multigraph inputs)
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    m0 = e0.count()
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e0.repartition(shuffle, "src"))
        e0.unpersist()
        stats = IterationStats(algorithm="sssp", edges=m0)
        dist = spark.createDataFrame(
            [(int(s), 0) for s in sources], "id long, dist long"
        ).localCheckpoint(eager=True)
        frontier = dist
        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            cand = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
            )
            merged = (
                dist.join(cand, "id", "full")
                .select(
                    "id",
                    F.least(
                        F.coalesce(F.col("dist"), F.col("nd")),
                        F.coalesce(F.col("nd"), F.col("dist")),
                    ).alias("dist"),
                    (
                        F.col("dist").isNull()
                        | (F.coalesce(F.col("nd"), F.col("dist")) < F.col("dist"))
                    ).alias("_imp"),
                )
                .localCheckpoint(eager=False)
            )
            improved = int(
                merged.agg(F.sum(F.col("_imp").cast("long"))).collect()[0][0] or 0
            )
            frontier = merged.where(F.col("_imp")).select("id", "dist")
            dist = merged.select("id", "dist")
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(improved))
            if improved == 0:
                stats.converged = True
                break
        return dist.select(F.col("id").cast("long"), F.col("dist").cast("long")), stats


#: sentinel capacity for widest-path sources — far above any realistic
#: integer edge weight while leaving LEAST() arithmetic overflow-free.
WIDEST_INF = 9_000_000_000_000_000


def widest_paths(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 200,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Widest (maximin / bottleneck) paths from the sources over a
    directed ``(src, dst, w)`` edge table with positive integer
    weights: cap(v) = MAX over paths of the MIN edge weight along the
    path — the max-min semiring twin of :func:`sssp`, same
    frontier-scoped relaxation (only vertices whose capacity improved
    last round propagate) and the same relax-past-fixpoint-is-a-no-op
    property the unrolled SQL oracles rely on.  Sources carry the
    ``WIDEST_INF`` sentinel.  Parallel edges keep the MAXIMUM weight
    (the widest of the parallel links is the one a bottleneck path
    uses).  Returns (id, cap) for reached vertices, sources included."""
    spark = edges.sparkSession
    e0 = (
        edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w").cast("long")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        .persist()
    )
    m0 = e0.count()
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e0.repartition(shuffle, "src"))
        e0.unpersist()
        stats = IterationStats(algorithm="widest_paths", edges=m0)
        cap = spark.createDataFrame(
            [(int(s), WIDEST_INF) for s in sources], "id long, cap long"
        ).localCheckpoint(eager=True)
        frontier = cap
        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            cand = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max(F.least(F.col("cap"), F.col("w"))).alias("nc"))
            )
            merged = (
                cap.join(cand, "id", "full")
                .select(
                    "id",
                    F.greatest(
                        F.coalesce(F.col("cap"), F.col("nc")),
                        F.coalesce(F.col("nc"), F.col("cap")),
                    ).alias("cap"),
                    (
                        F.col("cap").isNull()
                        | (F.coalesce(F.col("nc"), F.col("cap")) > F.col("cap"))
                    ).alias("_imp"),
                )
                .localCheckpoint(eager=False)
            )
            improved = int(
                merged.agg(F.sum(F.col("_imp").cast("long"))).collect()[0][0] or 0
            )
            frontier = merged.where(F.col("_imp")).select("id", "cap")
            cap = merged.select("id", "cap")
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(improved))
            if improved == 0:
                stats.converged = True
                break
        return cap.select(F.col("id").cast("long"), F.col("cap").cast("long")), stats


def sssp_per_source(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 200,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Weighted shortest paths kept SEPARATELY per source (the weighted
    analog of :func:`bfs_per_source`, the landmark-distance input for
    weighted harmonic/closeness estimates): state is keyed
    ``(source, id)``, each round relaxes only edges out of pairs whose
    distance improved (frontier-scoped Bellman-Ford), converging when
    no pair improves.  Non-negative integer weights — the per-pair
    distances are cross-engine exact for the unrolled SQL oracle.
    Returns ``(source, id, dist)`` for reached pairs."""
    spark = edges.sparkSession
    e0 = (
        edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w").cast("long")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    m0 = e0.count()
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e0.repartition(shuffle, "src"))
        e0.unpersist()
        stats = IterationStats(algorithm="sssp_per_source", edges=m0)
        dist = spark.createDataFrame(
            [(int(s), int(s), 0) for s in sources], "source long, id long, dist long"
        ).localCheckpoint(eager=True)
        frontier = dist
        # fused chunks (the core_numbers discipline): rounds chain
        # lazily, one improved-count action per chunk.  Rounds past the
        # fixpoint are no-ops (empty frontier ⇒ empty cand ⇒ _imp all
        # false), so the chunk's LAST round having zero improvements is
        # a sound convergence test — identical distances, at most
        # chunk-1 no-op rounds run past the fixpoint.
        it = 0
        fuse_rounds = 4
        while it < max_iter:
            chunk = min(fuse_rounds, max_iter - it)
            t0 = time.monotonic()
            merged = None
            for _ in range(chunk):
                cand = (
                    e.join(frontier.withColumnRenamed("id", "src"), "src")
                    .groupBy("source", F.col("dst").alias("id"))
                    .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
                )
                merged = (
                    dist.join(cand, ["source", "id"], "full")
                    .select(
                        "source",
                        "id",
                        F.least(
                            F.coalesce(F.col("dist"), F.col("nd")),
                            F.coalesce(F.col("nd"), F.col("dist")),
                        ).alias("dist"),
                        (
                            F.col("dist").isNull()
                            | (F.coalesce(F.col("nd"), F.col("dist")) < F.col("dist"))
                        ).alias("_imp"),
                    )
                    .localCheckpoint(eager=False)
                )
                frontier = merged.where(F.col("_imp")).select("source", "id", "dist")
                dist = merged.select("source", "id", "dist")
            improved = int(
                merged.agg(F.sum(F.col("_imp").cast("long"))).collect()[0][0] or 0
            )
            wall = time.monotonic() - t0
            it += chunk
            stats.iterations = it
            stats.iter_seconds.extend([wall / chunk] * chunk)
            stats.deltas.append(float(improved))
            if improved == 0:
                stats.converged = True
                break
        return (
            dist.select(
                F.col("source").cast("long"), F.col("id").cast("long"),
                F.col("dist").cast("long"),
            ),
            stats,
        )


def maximal_independent_set(
    edges: DataFrame,
    seed: int = 11,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Maximal independent set by Luby's algorithm with DETERMINISTIC
    unique priorities: an undecided vertex enters the set when its
    priority beats every undecided neighbor's; it and its neighbors
    then leave the undecided pool; repeat to exhaustion (O(log n)
    rounds w.h.p.).  Priority = 30-bit xorshift-mixed hash of the id
    shifted left 33 bits plus the id — provably unique for any
    id < 2³³ (≈8.6e9, past the 1e9-vertex target; inputs beyond that
    are rejected) and reproducible, so runs are idempotent, shards
    agree, and the unrolled-SQL oracle computes the identical set.
    Unique priorities guarantee ≥1 winner per round; if ``max_iter``
    is still exhausted the function RAISES rather than silently
    returning a non-maximal set.  Returns ``(id, in_mis)`` for every
    vertex of the undirected graph."""
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "id long, in_mis boolean"),
            IterationStats(algorithm="mis", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(sym0.repartition(shuffle, "src"))
        verts = vertices_of(e).localCheckpoint(eager=True)
        sym0.unpersist()
        vrow = verts.agg(
            F.count("*").alias("n"), F.max("id").alias("mx"), F.min("id").alias("mn")
        ).collect()[0]
        if int(vrow["mx"]) >= 2**33 or int(vrow["mn"]) < 0:
            raise ValueError(
                "maximal_independent_set priorities are unique only for "
                f"0 <= id < 2^33; got id range [{vrow['mn']}, {vrow['mx']}] — "
                "compact ids first (plans.pregel.compact_ids)"
            )
        stats = IterationStats(algorithm="mis", edges=m0, vertices=int(vrow["n"]))
        x0 = (F.col("id") * F.lit(2654435761) + F.lit(seed)) % F.lit(2**31)
        x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
        # 30-bit mix << 33 | id: strictly unique for id < 2^33 and fits
        # signed int64 ((2^30-1)*2^33 + 2^33-1 < 2^63)
        p = (x1.bitwiseXOR(F.shiftright(x1, 17)) % F.lit(2**30)) * F.lit(2**33) + F.col("id")
        pri = verts.select("id", p.alias("p")).localCheckpoint(eager=True)
        undecided = pri
        mis = spark.createDataFrame([], "id long")
        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            nbr_min = (
                e.join(undecided.select("id").withColumnRenamed("id", "src"), "src", "left_semi")
                .join(
                    undecided.select(F.col("id").alias("dst"), F.col("p").alias("p_n")), "dst"
                )
                .groupBy(F.col("src").alias("id"))
                .agg(F.min("p_n").alias("min_nbr"))
            )
            winners = (
                undecided.join(nbr_min, "id", "left")
                .where(F.col("min_nbr").isNull() | (F.col("p") < F.col("min_nbr")))
                .select("id")
                .localCheckpoint(eager=True)
            )
            n_w = winners.count()
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(n_w))
            if n_w == 0:
                stats.converged = True
                break
            mis = mis.unionByName(winners).localCheckpoint(eager=True)
            excluded = (
                e.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            undecided = (
                undecided.join(winners, "id", "left_anti")
                .join(excluded, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if undecided.count() == 0:
                stats.converged = True
                break
        if not stats.converged:
            raise RuntimeError(
                f"maximal_independent_set did not exhaust the undecided pool in "
                f"{max_iter} rounds — the result would be non-maximal; raise max_iter"
            )
        out = verts.join(mis.withColumn("in_mis", F.lit(True)), "id", "left").select(
            F.col("id").cast("long"),
            F.coalesce(F.col("in_mis"), F.lit(False)).alias("in_mis"),
        )
        return out, stats


def greedy_coloring(
    edges: DataFrame,
    seed: int = 11,
    max_rounds: int = 40,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Greedy graph coloring by the Jones–Plassmann parallel schedule
    (Jones & Plassmann, SIAM J.Sci.Comput. 1993): vertices carry the
    deterministic unique priorities of :func:`maximal_independent_set`;
    each round every uncolored vertex that out-prioritizes all its
    uncolored neighbors takes the smallest color unused by its already-
    colored neighbors (the ready set is independent, so simultaneous
    assignment equals the sequential greedy in priority order — the
    result is UNIQUE given the priority family, which is what the
    unrolled SQL oracle replays).  Dense graphs serialize this schedule
    (rounds ≈ longest decreasing-priority path); intended for bounded-
    degree graphs, raising loudly if ``max_rounds`` is hit.

    Per round: one aggregate over uncolored-neighbor priorities, one
    colored-neighbor color-set aggregate, and a JVM-array mex
    (``array_min(array_except(sequence(0, n), used))``).  Returns
    (``id, color``, stats); ``deltas`` records ready-set sizes.
    """
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "id long, color long"),
            IterationStats(algorithm="coloring", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(sym0.repartition(shuffle, "src"))
        verts = vertices_of(e).localCheckpoint(eager=True)
        sym0.unpersist()
        vrow = verts.agg(
            F.count("*").alias("n"), F.max("id").alias("mx"), F.min("id").alias("mn")
        ).collect()[0]
        if int(vrow["mx"]) >= 2**33 or int(vrow["mn"]) < 0:
            raise ValueError(
                "greedy_coloring priorities are unique only for 0 <= id < 2^33; "
                f"got id range [{vrow['mn']}, {vrow['mx']}] — compact ids first"
            )
        stats = IterationStats(algorithm="coloring", edges=m0, vertices=int(vrow["n"]))
        x0 = (F.col("id") * F.lit(2654435761) + F.lit(seed)) % F.lit(2**31)
        x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
        p = (x1.bitwiseXOR(F.shiftright(x1, 17)) % F.lit(2**30)) * F.lit(2**33) + F.col("id")
        uncolored = verts.select("id", p.alias("p")).localCheckpoint(eager=True)
        colored = spark.createDataFrame([], "id long, color long")
        for rnd in range(1, max_rounds + 1):
            t0 = time.monotonic()
            nbr_max = (
                e.join(
                    uncolored.select(F.col("id").alias("dst"), F.col("p").alias("p_n")),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"))
                .agg(F.max("p_n").alias("max_nbr"))
            )
            ready = (
                uncolored.join(nbr_max, "id", "left")
                .where(F.col("max_nbr").isNull() | (F.col("p") > F.col("max_nbr")))
                .select("id")
                .localCheckpoint(eager=True)
            )
            n_ready = ready.count()
            stats.iterations = rnd
            stats.deltas.append(float(n_ready))
            if n_ready == 0:
                stats.converged = True
                stats.iter_seconds.append(time.monotonic() - t0)
                break
            used = (
                e.join(ready.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(colored.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.collect_set("color").alias("used"))
            )
            newly = (
                ready.join(used, "id", "left")
                .select(
                    "id",
                    F.coalesce(
                        F.array_min(
                            F.array_except(
                                F.sequence(F.lit(0).cast("long"), F.size("used").cast("long")),
                                F.col("used"),
                            )
                        ),
                        F.lit(0).cast("long"),
                    ).alias("color"),
                )
            )
            colored = colored.unionByName(newly).localCheckpoint(eager=True)
            uncolored = (
                uncolored.join(ready, "id", "left_anti").localCheckpoint(eager=True)
            )
            stats.iter_seconds.append(time.monotonic() - t0)
        if not stats.converged:
            raise RuntimeError(
                f"greedy_coloring did not finish in {max_rounds} rounds (graph too "
                "dense for the Jones-Plassmann schedule) — raise max_rounds"
            )
        return colored.select(F.col("id").cast("long"), F.col("color").cast("long")), stats


def minimum_spanning_forest(
    edges: DataFrame,
    max_rounds: int = 40,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Minimum spanning forest by Borůvka's algorithm over a weighted
    undirected ``(src, dst, w)`` edge table (the data-parallel MST:
    every round each component hooks its minimum incident edge, then
    components contract — O(log V) rounds, each a relabel-join + one
    min-aggregate).  The spanning-tree analog of the reference's graph
    maintenance: extracting the cheapest connectivity backbone of the
    dependency/observability graph.

    Determinism: edges are ranked by the TOTAL order ``(w, u, v)``
    (canonical ``u < v``, parallel edges pre-collapsed to their minimum
    weight), which makes the MSF unique even with duplicate weights —
    the result equals Kruskal's under the same order, which is how the
    SQL oracle replays it.

    Contraction uses pointer doubling (path halving) over the selection
    arcs instead of plain hash-min propagation: each component has
    exactly one outgoing arc, the only cycles are the mutual minimum
    pairs (broken toward the smaller label, which becomes the root), so
    doubling reaches every root in O(log chain-depth) joins over the
    ACTIVE COMPONENT SET — geometrically shrinking, never the full
    vertex set.  Returns (``u, v, w`` MSF edges, stats); ``deltas``
    records the active-component count per round.
    """
    spark = edges.sparkSession
    e0 = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("u"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("v"),
            F.col("w").cast("long").alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    m0 = e0.count()
    stats = IterationStats(algorithm="msf", edges=m0)
    if m0 == 0:
        e0.unpersist()
        stats.converged = True
        return spark.createDataFrame([], "u long, v long, w long"), stats
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        # both directions, keeping the canonical (u, v, w) identity on
        # every row so the per-component min is a lexicographic struct
        sym = (
            e0.select(F.col("u").alias("a"), F.col("v").alias("b"), "w", "u", "v")
            .unionByName(
                e0.select(F.col("v").alias("a"), F.col("u").alias("b"), "w", "u", "v")
            )
            .repartition(shuffle, "a")
            .localCheckpoint(eager=True)
        )
        e0.unpersist()
        comp = (
            sym.select(F.col("a").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("comp"))
            .localCheckpoint(eager=True)
        )
        stats.vertices = comp.count()
        msf = spark.createDataFrame([], "u long, v long, w long")
        for rnd in range(1, max_rounds + 1):
            t0 = time.monotonic()
            ca = comp.select(F.col("id").alias("a"), F.col("comp").alias("ca"))
            cb = comp.select(F.col("id").alias("b"), F.col("comp").alias("cb"))
            # lazy: the active-count action materializes sel AND the
            # previous round's lazily-checkpointed comp/hop chain — one
            # job per round instead of one per sub-step
            sel = (
                sym.join(ca, "a")
                .join(cb, "b")
                .where(F.col("ca") != F.col("cb"))
                .groupBy("ca")
                .agg(F.min(F.struct("w", "u", "v", "cb")).alias("m"))
                .localCheckpoint(eager=False)
            )
            active = sel.count()
            stats.iterations = rnd
            stats.deltas.append(float(active))
            if active == 0:
                stats.converged = True
                stats.iter_seconds.append(time.monotonic() - t0)
                break
            msf = (
                msf.unionByName(sel.select("m.u", "m.v", "m.w").distinct())
                .localCheckpoint(eager=False)  # materializes with comp below
            )
            # selection arcs ca → cb; mutual minimum pairs are the only
            # cycles — root them at the smaller label, then double.
            # Doubling reaches every root in ceil(log2(chain)) steps, so
            # run EXACTLY that many lazily-chained hops with no per-step
            # convergence action (extra hops past the root are no-ops:
            # p(root) = root) — the whole contraction costs zero extra
            # jobs beyond the one comp materialization.
            arcs = sel.select("ca", F.col("m.cb").alias("nb"))
            rev = arcs.select(F.col("ca").alias("nb"), F.col("nb").alias("_back"))
            p = (
                arcs.join(rev, "nb", "left")
                .select(
                    F.col("ca").alias("id"),
                    F.when(
                        (F.col("_back") == F.col("ca")) & (F.col("ca") < F.col("nb")),
                        F.col("ca"),
                    )
                    .otherwise(F.col("nb"))
                    .alias("p"),
                )
            )
            # Each hop is a SELF-join (p appears twice), so a fully lazy
            # chain doubles the plan per hop — materialize every 4 hops
            # through _hard_cut, which truncates the plan AND drops the
            # inherited sizeInBytes estimate (plain localCheckpoint
            # carries it forward and this loop squares it per hop until
            # BigInteger stats arithmetic dominates planning; persist
            # resets stats but leaves the plan tree growing 16x/chunk).
            hops_needed = max(1, math.ceil(math.log2(max(active, 2))))
            done_h = 0
            while done_h < hops_needed:
                k = min(4, hops_needed - done_h)
                for _ in range(k):
                    hop = p.select(F.col("id").alias("p"), F.col("p").alias("pp"))
                    p = p.join(hop, "p").select("id", F.col("pp").alias("p"))
                # eager _hard_cut: A/B-measured faster than the lazy
                # _stats_leaf chain here (13.0 vs 14.7 s at sf0.1) — the
                # pointer-doubling self-joins re-enter the plan twice per
                # hop, so deferring materialization deepens the analyzed
                # tree faster than it saves jobs
                p = _hard_cut(p)
                done_h += k
            comp = _hard_cut(
                comp.join(p.withColumnRenamed("id", "comp"), "comp", "left")
                .select("id", F.coalesce(F.col("p"), F.col("comp")).alias("comp"))
            )
            stats.iter_seconds.append(time.monotonic() - t0)
        if not stats.converged:
            raise RuntimeError(
                f"minimum_spanning_forest did not contract to a fixpoint in "
                f"{max_rounds} rounds — raise max_rounds"
            )
        out = msf.select("u", "v", "w").localCheckpoint(eager=True)
        return out, stats


# --------------------------------------------------------------------------
# Connected components (hash-min)


def connected_components(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    num_partitions: int | None = None,
    init_components: DataFrame | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Hash-min label propagation to a fixpoint: every vertex converges
    to the minimum vertex id of its (undirected) component.  Exact.

    Converges in O(diameter) rounds; each round is one join + one
    min-aggregate.  (Large-star/small-star would shorten long chains —
    tracked as an optimization; hash-min is exact and simpler.)

    ``init_components`` warm-starts the labels — exact for EDGE-ADD
    deltas when seeded with the previous fixpoint: every seed label is
    the id of a vertex inside the (grown) component, so the hash-min
    fixpoint is still the true minimum, reached in rounds proportional
    to the merge diameter instead of the full graph diameter.  Edge
    REMOVALS can split components and make old labels stale-low —
    callers must cold-start in that case (ComponentsMaintainer does).
    Unseeded vertices fall back to their own id; ignored when resuming
    from a checkpoint.
    """
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "id long, comp long"),
            IterationStats(algorithm="connected_components", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    sym_c = compact_ids(sym0, m0)
    with _shuffle_conf(spark, shuffle):
        return _cc_loop(
            spark, sym_c, sym0, shuffle, max_iter, checkpoint_dir, checkpoint_every, resume,
            init_components,
        )


def _cc_loop(
    spark, sym_in, sym_base, shuffle, max_iter, checkpoint_dir, checkpoint_every, resume,
    init_components=None,
):
    id_type = dict(sym_in.dtypes)["src"]  # 'int' when compact_ids applied
    # lineage cut: referenced by every iteration (see _pagerank_loop)
    sym = _hard_cut(sym_in.repartition(shuffle, "src"))
    verts = vertices_of(sym).localCheckpoint(eager=True)
    stats = IterationStats(
        algorithm="connected_components", edges=sym.count(), vertices=verts.count()
    )
    sym_base.unpersist()
    ckpt = _Ckpt(spark, checkpoint_dir, "cc") if checkpoint_dir else None
    start_iter = 0
    if resume and ckpt is not None and (last := ckpt.latest()) is not None:
        comp = (
            ckpt.load(last["iteration"])
            .select(F.col("id").cast(id_type).alias("id"), F.col("comp").cast(id_type).alias("comp"))
            .repartition(shuffle, "id")
        )
        start_iter = last["iteration"]
        stats.resumed_from = start_iter
    elif init_components is not None:
        seed = init_components.select(
            F.col("id").cast(id_type).alias("id"),
            F.col("comp").cast(id_type).alias("_seed"),
        )
        comp = verts.join(seed, "id", "left").select(
            "id", F.coalesce(F.col("_seed"), F.col("id")).alias("comp")
        )
    else:
        comp = verts.select("id", F.col("id").alias("comp"))
    comp = comp.localCheckpoint(eager=True)

    # localCheckpoint every round: comp feeds the next plan twice (join +
    # least-compare) — without the cut the analyzed plan doubles per round
    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.monotonic()
        # shuffle_hash: both sides are hash-partitioned state tables —
        # SMJ would sort the edge table every round (the pagerank hint
        # discipline, guide §3.1)
        nbr_min = (
            sym.join(comp.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_comp = (
            comp.join(nbr_min.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
                (F.coalesce(F.col("nbr_comp"), F.col("comp")) < F.col("comp")).alias("_chg"),
            )
            .localCheckpoint(eager=False)  # materialized by the changed-count agg
        )
        changed = int(
            new_comp.agg(F.sum(F.col("_chg").cast("long"))).collect()[0][0] or 0
        )
        comp = new_comp.select("id", "comp")
        if ckpt is not None and it % checkpoint_every == 0:
            comp = ckpt.save(it, comp, float(changed))
        stats.iterations = it
        stats.deltas.append(float(changed))
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.final_delta = float(changed)
        if changed == 0:
            stats.converged = True
            break
    if ckpt is not None and stats.iterations % checkpoint_every != 0:
        ckpt.save(stats.iterations, comp, stats.final_delta)
    sym.unpersist()
    verts.unpersist()
    return (
        comp.select(
            F.col("id").cast("long").alias("id"), F.col("comp").cast("long").alias("comp")
        ),
        stats,
    )


def connected_components_multi(
    keyed_edges: DataFrame,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Hash-min connected components over SEVERAL independent edge sets
    at once, distinguished by a ``k`` column: state is ``(k, id, comp)``
    and every round is ONE join + ONE min-aggregate for all runs
    together — n independent CC invocations collapse from n driver
    loops (n × setup + n × per-round actions) to one (guide §2.6's
    fill-the-scheduler lesson applied inside a single job instead of
    threads).  Per-key results are IDENTICAL to per-key
    :func:`connected_components` — hash-min converges to the minimum
    member id of each component regardless of what other keys share the
    rounds; rounds run until every key is quiet (extra rounds are
    no-ops for already-converged keys, frontier-free by the changed
    flag).  Input: ``(k, src, dst)``; self-loops dropped, symmetrized
    internally.  Returns ``((k, id, comp), stats)``."""
    spark = keyed_edges.sparkSession
    e0 = (
        keyed_edges.select("k", F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
    )
    sym0 = (
        e0.unionByName(
            e0.select("k", F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates(["k", "src", "dst"])
        .persist()
    )
    m0 = sym0.count()
    stats = IterationStats(algorithm="connected_components_multi", edges=m0)
    if m0 == 0:
        sym0.unpersist()
        stats.converged = True
        return spark.createDataFrame([], "k long, id long, comp long"), stats
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        sym = _hard_cut(sym0.repartition(shuffle, "k", "src"))
        sym0.unpersist()
        verts = (
            sym.select("k", F.col("src").alias("id"))
            .dropDuplicates(["k", "id"])
            .localCheckpoint(eager=True)
        )
        stats.vertices = verts.count()
        comp = verts.select("k", "id", F.col("id").alias("comp")).localCheckpoint(
            eager=True
        )
        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            nbr_min = (
                sym.join(
                    comp.withColumnRenamed("id", "src").hint("shuffle_hash"),
                    ["k", "src"],
                )
                .groupBy("k", F.col("dst").alias("id"))
                .agg(F.min("comp").alias("nbr_comp"))
            )
            new_comp = (
                comp.join(nbr_min.hint("shuffle_hash"), ["k", "id"], "left")
                .select(
                    "k",
                    "id",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                    ).alias("comp"),
                    (F.coalesce(F.col("nbr_comp"), F.col("comp")) < F.col("comp")).alias(
                        "_chg"
                    ),
                )
                .localCheckpoint(eager=False)
            )
            changed = int(
                new_comp.agg(F.sum(F.col("_chg").cast("long"))).collect()[0][0] or 0
            )
            comp = new_comp.select("k", "id", "comp")
            stats.iterations = it
            stats.deltas.append(float(changed))
            stats.iter_seconds.append(time.monotonic() - t0)
            if changed == 0:
                stats.converged = True
                break
        return comp, stats


def connected_components_star(
    edges: DataFrame,
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Exact connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log² n) rounds independent of diameter, vs hash-min's
    O(diameter).  The scale path for long-chain graphs; results are
    golden-tested equal to :func:`connected_components`.

    Round = large-star (hook every neighbor larger than the center to
    the center's minimum) then small-star (contract every smaller
    neighbor and the center itself onto the minimum).  The edge set
    converges to per-component stars rooted at the component minimum;
    convergence is detected by an order-insensitive (count, Σhash)
    signature of the edge set — one extra aggregate per round.
    """
    spark = edges.sparkSession
    e0 = normalize_edges(edges).persist()
    m0 = e0.count()
    if m0 == 0:
        e0.unpersist()
        return (
            spark.createDataFrame([], "id long, comp long"),
            IterationStats(algorithm="cc_star", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        return _cc_star_loop(spark, e0, shuffle, max_iter)


def _cc_star_loop(spark, e0, shuffle, max_iter):
    verts = vertices_of(e0).localCheckpoint(eager=True)
    stats = IterationStats(algorithm="cc_star", vertices=verts.count())
    # canonical high→low pairs (a > b); invariant maintained each round
    cur = (
        e0.select(F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
        .repartition(shuffle, "a")
        .localCheckpoint(eager=True)
    )
    stats.edges = cur.count()
    e0.unpersist()

    def signature(df: DataFrame) -> tuple[int, int]:
        # order-insensitive set signature: count + xor of pair hashes
        # (xor never overflows; pairs are distinct so nothing cancels)
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    sig = signature(cur)
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        # -- large-star: center c sees ALL neighbors; every n > c hooks
        # to m(c) = min(Γ(c) ∪ {c})
        sym = cur.select(F.col("a").alias("c"), F.col("b").alias("n")).unionByName(
            cur.select(F.col("b").alias("c"), F.col("a").alias("n"))
        )
        mins = sym.groupBy("c").agg(F.least(F.min("n"), F.first("c")).alias("m"))
        large = (
            sym.join(mins, "c")
            .where(F.col("n") > F.col("c"))
            .select(F.col("n").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .dropDuplicates(["a", "b"])
        )
        # -- small-star: pairs are (a > b); center a contracts itself and
        # every small neighbor onto m = min of its small neighbors
        grp = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            large.join(grp, "a")
            .select(F.col("b").alias("a2"), F.col("m").alias("b2"))
            .where(F.col("a2") != F.col("b2"))
            .unionByName(grp.select(F.col("a").alias("a2"), F.col("m").alias("b2")))
            .select(F.col("a2").alias("a"), F.col("b2").alias("b"))
            .dropDuplicates(["a", "b"])
        )
        cur = small.repartition(shuffle, "a").localCheckpoint(eager=True)
        new_sig = signature(cur)
        stats.iterations = it
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.deltas.append(float(abs(new_sig[0] - sig[0])))
        if new_sig == sig:
            stats.converged = True
            break
        sig = new_sig
    # fixpoint is a star per component: (vertex, component-min) pairs;
    # roots and isolated vertices map to themselves
    comp = (
        verts.join(cur.select(F.col("a").alias("id"), F.col("b").alias("comp")), "id", "left")
        .select("id", F.coalesce(F.col("comp"), F.col("id")).alias("comp"))
    )
    verts.unpersist()
    return comp, stats


# --------------------------------------------------------------------------
# Label propagation


def label_propagation(
    edges: DataFrame,
    max_iter: int = 5,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Synchronous LPA over the undirected graph.

    Each round every vertex adopts the most frequent label among its
    neighbors; ties break to the *smallest* label (deterministic — the
    tie-break is part of the contract and encoded identically in the
    SQL oracle).  Isolated behavior: a vertex keeps its label when it
    has no neighbors.  Runs exactly ``max_iter`` rounds (synchronous
    LPA can oscillate; a fixed round count keeps results reproducible).
    """
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "id long, label long"),
            IterationStats(algorithm="label_propagation", edges=0, vertices=0),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    sym_c = compact_ids(sym0, m0)
    with _shuffle_conf(spark, shuffle):
        return _lpa_loop(spark, sym_c, sym0, shuffle, max_iter)


def label_propagation_weighted(
    edges: DataFrame,
    max_iter: int = 5,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Weighted synchronous LPA over an undirected ``(src, dst, w)``
    edge table: each round every vertex adopts the label with the
    LARGEST TOTAL INCIDENT WEIGHT among its neighbors (ties → smallest
    label — same deterministic contract as the unweighted variant, with
    the vote count replaced by a weight sum).  Parallel edges are
    pre-summed per (src, dst); integer weights keep the vote sums
    cross-engine exact for the SQL oracle.  Fixed round count for
    reproducibility (synchronous LPA can oscillate)."""
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("u"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("v"),
            F.col("w").cast("long").alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    m0 = und.count()
    if m0 == 0:
        und.unpersist()
        return (
            spark.createDataFrame([], "id long, label long"),
            IterationStats(algorithm="label_propagation_weighted", edges=0, vertices=0),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        sym = (
            und.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
            .unionByName(und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))
            .repartition(shuffle, "src")
            .localCheckpoint(eager=True)
        )
        und.unpersist()
        verts = vertices_of(sym).localCheckpoint(eager=True)
        stats = IterationStats(
            algorithm="label_propagation_weighted", edges=sym.count(), vertices=verts.count()
        )
        labels = verts.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            votes = (
                sym.join(labels.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
                .groupBy(F.col("dst").alias("id"), "label")
                .agg(F.sum("w").alias("wsum"))
            )
            winner = votes.groupBy("id").agg(
                F.expr("max_by(label, struct(wsum, -label))").alias("new_label")
            )
            labels = (
                labels.join(winner, "id", "left")
                .select("id", F.coalesce(F.col("new_label"), F.col("label")).alias("label"))
                # lazy: fixed rounds, caller's first action materializes
                .localCheckpoint(eager=False)
            )
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
        sym.unpersist()
        verts.unpersist()
        return (
            labels.select(
                F.col("id").cast("long").alias("id"),
                F.col("label").cast("long").alias("label"),
            ),
            stats,
        )


def label_propagation_states(
    edges: DataFrame,
    iters: tuple[int, ...] = (2, 3),
    num_partitions: int | None = None,
) -> dict[int, DataFrame]:
    """Snapshots of synchronous LPA after each requested round, from ONE
    run: LPA rounds are deterministic, so the round-k state of a
    ``max(iters)``-round run is bit-identical to a separate k-round run
    — callers comparing successive sweeps (ARI audits) pay one loop and
    one graph build instead of one per snapshot."""
    keep = {int(k) for k in iters}
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        empty = spark.createDataFrame([], "id long, label long")
        return {k: empty for k in keep}
    shuffle = _auto_partitions(spark, m0, num_partitions)
    sym_c = compact_ids(sym0, m0)
    with _shuffle_conf(spark, shuffle):
        out: dict[int, DataFrame] = {}
        _lpa_loop(spark, sym_c, sym0, shuffle, max(keep), snapshots=out, keep=keep)
        return out


def _lpa_loop(spark, sym_in, sym_base, shuffle, max_iter, snapshots=None, keep=()):
    # lineage cut: referenced by every iteration (see _pagerank_loop)
    sym = _hard_cut(sym_in.repartition(shuffle, "src"))
    verts = vertices_of(sym).localCheckpoint(eager=True)
    stats = IterationStats(algorithm="label_propagation", edges=sym.count(), vertices=verts.count())
    sym_base.unpersist()
    labels = verts.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        counts = (
            sym.join(labels.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count("*").alias("n"))
        )
        # most-frequent neighbor label, ties → smallest label: one
        # aggregate (max_by on (count, -label)), no window sort
        winner = counts.groupBy("id").agg(
            F.expr("max_by(label, struct(n, -label))").alias("new_label")
        )
        labels = (
            labels.join(winner, "id", "left")
            .select("id", F.coalesce(F.col("new_label"), F.col("label")).alias("label"))
            # lazy: fixed rounds need no per-round decision — the
            # caller's first action materializes the chain (snapshot
            # references materialize their prefix identically)
            .localCheckpoint(eager=False)
        )
        stats.iterations = it
        stats.iter_seconds.append(time.monotonic() - t0)
        if snapshots is not None and it in keep:
            snapshots[it] = labels.select(
                F.col("id").cast("long").alias("id"),
                F.col("label").cast("long").alias("label"),
            )
    sym.unpersist()
    verts.unpersist()
    return (
        labels.select(
            F.col("id").cast("long").alias("id"), F.col("label").cast("long").alias("label")
        ),
        stats,
    )


# --------------------------------------------------------------------------
# Triangle counting


def triangle_count(
    edges: DataFrame, num_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """Exact triangle counting by degree-ordered edge orientation.

    Never materializes unfiltered 2-paths: edges are oriented from the
    lower-(degree, id) endpoint to the higher, so every wedge is rooted
    at its smallest corner and each triangle is found exactly once.
    Hub vertices have *low* orientation rank only if their degree is
    low — the classic bound on wedge explosion (cf. Suri & Vassilvitskii
    MapReduce triangle counting).

    Returns (per_vertex(id, triangles), total).
    """
    spark = edges.sparkSession
    und = (
        normalize_edges(edges)
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .dropDuplicates(["u", "v"])
        .persist()
    )
    m0 = und.count()
    shuffle = _auto_partitions(spark, m0, num_partitions)
    und_c = compact_ids(und, m0, cols=("u", "v"))
    with _shuffle_conf(spark, shuffle):
        return _triangle_loop(und_c, und, shuffle)


def _triangle_loop(und: DataFrame, und_base: DataFrame, shuffle: int) -> tuple[DataFrame, int]:
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ranked = und.join(du, "u").join(dv, "v")
    # orient: a = lower (deg, id); b = higher
    oriented = ranked.select(
        F.when(
            (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
        )
        .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
        .alias("e")
    ).select("e.a", "e.b").repartition(shuffle, "a").persist()
    e1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    e2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    # canonical (id-ordered) wedge pair; the closing edge is checked in
    # canonical undirected form, so rank-vs-id order cannot disagree
    wedges = e1.join(e2, "a").where(F.col("x") < F.col("y"))
    tri = wedges.join(
        und.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
    ).select(F.col("a").alias("v1"), F.col("x").alias("v2"), F.col("y").alias("v3"))
    tri = tri.persist()
    total = tri.count()
    per_vertex = (
        tri.select(F.explode(F.array("v1", "v2", "v3")).alias("id"))
        .select(F.col("id").cast("long").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
        .localCheckpoint(eager=True)  # materialize so the caches below can go
    )
    tri.unpersist()
    oriented.unpersist()
    und_base.unpersist()
    return per_vertex, total


def node_similarity(
    edges: DataFrame,
    k: int = 3,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-Jaccard node similarity, top-k per vertex (the
    standard "node similarity" graph query — e.g. Neo4j GDS
    nodeSimilarity; reference graph-query surface: Polar's Cypher
    queries over shared-neighbor structure): for vertex pairs (a, b)
    sharing ≥1 neighbor, J = |N(a)∩N(b)| / |N(a)∪N(b)|, ranked per
    vertex by (J desc, other asc).

    Intersections come from wedge enumeration — two copies of the
    symmetric edge table joined on the wedge CENTER with ``a < b``
    canonicalization, then one count aggregate — the triangle-count
    plan shape: no all-pairs join, cost Σ_w deg(w)², concentrated on
    hub centers.  At 100-TB scale hubs dominate; ``max_center_degree``
    drops wedge centers above the cutoff (GDS's degreeCutoff posture —
    documented bias: pairs connected ONLY through super-hubs are
    missed; exact when None).  Returns (id, other, sim, rnk ≤ k)."""
    from pyspark.sql.window import Window

    sym = _hard_cut(symmetrize(normalize_edges(edges)))
    centers = sym
    if max_center_degree is not None:
        heavy = (
            sym.groupBy("src")
            .agg(F.count("*").alias("_d"))
            .where(F.col("_d") > max_center_degree)
            .select("src")
        )
        centers = sym.join(heavy, "src", "left_anti")
    a = centers.select(F.col("src").alias("w"), F.col("dst").alias("a"))
    b = centers.select(F.col("src").alias("w"), F.col("dst").alias("b"))
    inter = (
        a.join(b, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    pairs = (
        inter.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter")
                / (F.col("da") + F.col("db") - F.col("inter")).cast("double")
            ).alias("sim"),
        )
    )
    both = pairs.select(F.col("a").alias("id"), F.col("b").alias("other"), "sim").unionByName(
        pairs.select(F.col("b").alias("id"), F.col("a").alias("other"), "sim")
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("other"))
    return (
        both.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("id").cast("long"),
            F.col("other").cast("long"),
            "sim",
            F.col("rnk").cast("long"),
        )
    )


def personalized_pagerank_multi(
    edges: DataFrame,
    seed_sets: dict[int, list[int]],
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Batched personalized PageRank: ALL seed sets advance in the same
    keyed join-aggregate sweep — state is (gid, id, rank), one shuffle
    per round TOTAL instead of per seed set (the per-source trick
    `bfs_per_source`/`sssp_per_source` use, applied to PPR).  This is
    the recommendation-serving shape: at 100 TB you rank "related to
    user X's repos" for thousands of X in one job, not one job per X —
    edge weights are computed once and the rank state is just |G|×|V|
    keyed rows.

    r⁰_g = e_g;  r^{k+1}_g = (1−d)·e_g + d·Pᵀ r^k_g, e_g uniform on
    seed_sets[g].  SQL-expressible (no dangling term): the oracle
    replays identical unrolled arithmetic per group.  Returns
    (gid, id, rank)."""
    spark = edges.sparkSession
    e = _hard_cut(normalize_edges(edges))
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    ew = _hard_cut(
        e.join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
    )
    verts = vertices_of(e).localCheckpoint(eager=True)
    seeds = spark.createDataFrame(
        [(g, v, 1.0 / len(vs)) for g, vs in seed_sets.items() for v in vs],
        "gid long, id long, s double",
    )
    base = verts.crossJoin(spark.createDataFrame([(g,) for g in seed_sets], "gid long"))
    seeded = base.join(seeds, ["gid", "id"], "left").select(
        "gid", "id", F.coalesce(F.col("s"), F.lit(0.0)).alias("seed")
    ).localCheckpoint(eager=True)
    ranks = seeded.select("gid", "id", F.col("seed").alias("rank"))
    for _ in range(n_iter):
        sums = (
            ew.join(
                ranks.select("gid", F.col("id").alias("src"), "rank"), "src"
            )
            .groupBy("gid", F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("s"))
        )
        ranks = (
            seeded.join(sums, ["gid", "id"], "left")
            .select(
                "gid",
                "id",
                (
                    F.lit(1.0 - damping) * F.col("seed")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("gid").cast("long"), F.col("id").cast("long"), "rank")


def betweenness_weighted(
    edges: DataFrame,
    landmarks: list[int],
    relax_rounds: int = 6,
    acc_rounds: int = 6,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """K-bounded *weighted* Brandes betweenness from a landmark set over
    a ``(src, dst, w)`` edge table with positive integer weights (caller
    symmetrizes for undirected semantics).  Three synchronous phases,
    each a fixed number of keyed (source, id) join-aggregate rounds so
    every landmark advances in the same sweep and the unrolled SQL
    oracle replays the identical recursion bit-for-bit:

    1. distances — ``relax_rounds`` Bellman-Ford rounds (frontier-scoped
       in the engine; equal to full relaxation round-for-round because
       candidates from unimproved vertices were already offered);
    2. σ path counts — the shortest-path DAG is ``du + w == dv`` (acyclic
       since w > 0), and σ is recomputed synchronously for
       ``acc_rounds`` rounds from the sparse seed σ(s)=1;
    3. δ dependencies — ``acc_rounds`` synchronous backward rounds of
       δ(v) = Σ_{(v,w)∈DAG, σw>0} σv/σw·(1+δw), then bc(v) = Σ_s δ(s,v)
       excluding v = s.

    Weighted counterpart of :func:`betweenness_landmarks` (landmark
    sampling per Brandes-Pich 2007 — exact all-sources Brandes does not
    exist at 10^9 vertices).  Reference runs betweenness via its graph
    backend on the observability graph; here it is native join-aggregate
    iteration."""
    spark = edges.sparkSession
    e0 = (
        edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w").cast("long")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    m0 = e0.count()
    if m0 == 0:
        e0.unpersist()
        return (
            spark.createDataFrame([], "id long, bc double"),
            IterationStats(algorithm="betweenness_w", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e0.repartition(shuffle, "src"))
        e0.unpersist()
        verts = vertices_of(e).localCheckpoint(eager=True)
        stats = IterationStats(
            algorithm="betweenness_w", edges=m0, vertices=verts.count()
        )
        lm = spark.createDataFrame(
            [(int(s), int(s)) for s in landmarks], "source long, id long"
        ).localCheckpoint(eager=True)
        dist = lm.select("source", "id", F.lit(0).cast("long").alias("dist"))
        dist = dist.localCheckpoint(eager=True)
        frontier = dist
        for _r in range(relax_rounds):
            t0 = time.monotonic()
            cand = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
            )
            merged = (
                dist.join(cand, ["source", "id"], "full")
                .select(
                    "source",
                    "id",
                    F.least(
                        F.coalesce(F.col("dist"), F.col("nd")),
                        F.coalesce(F.col("nd"), F.col("dist")),
                    ).alias("dist"),
                    (
                        F.col("dist").isNull()
                        | (F.coalesce(F.col("nd"), F.col("dist")) < F.col("dist"))
                    ).alias("_imp"),
                )
                .localCheckpoint(eager=False)
            )
            improved = int(
                merged.agg(F.sum(F.col("_imp").cast("long"))).collect()[0][0] or 0
            )
            frontier = merged.where(F.col("_imp")).select("source", "id", "dist")
            dist = merged.select("source", "id", "dist").localCheckpoint(eager=True)
            stats.iterations += 1
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(improved))
            if improved == 0:
                stats.converged = True
                break
        # shortest-path DAG: du + w == dv (strictly increasing dist ⇒ acyclic)
        dag = (
            e.join(
                dist.select(
                    "source", F.col("id").alias("src"), F.col("dist").alias("du")
                ),
                "src",
            )
            .join(
                dist.select(
                    "source", F.col("id").alias("dst"), F.col("dist").alias("dv")
                ),
                ["source", "dst"],
            )
            .where(F.col("du") + F.col("w") == F.col("dv"))
            .select("source", "src", "dst")
            .localCheckpoint(eager=True)
        )
        src_row = lm.select("source", "id", F.lit(1).cast("long").alias("sigma"))
        sigma = src_row
        for _r in range(acc_rounds):
            preds = (
                dag.join(
                    sigma.select(
                        "source", F.col("id").alias("src"), "sigma"
                    ),
                    ["source", "src"],
                )
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.sum("sigma").cast("long").alias("sigma"))
            )
            sigma = src_row.unionByName(preds).localCheckpoint(eager=True)
        reached = dist.select("source", "id")
        delta = reached.select("source", "id", F.lit(0.0).alias("delta"))
        for _r in range(acc_rounds):
            contrib = (
                dag.join(
                    sigma.select(
                        "source", F.col("id").alias("src"), F.col("sigma").alias("sigma_v")
                    ),
                    ["source", "src"],
                )
                .join(
                    sigma.select(
                        "source", F.col("id").alias("dst"), F.col("sigma").alias("sigma_w")
                    ),
                    ["source", "dst"],
                )
                .where(F.col("sigma_w") > 0)
                .join(
                    delta.select(
                        "source", F.col("id").alias("dst"), F.col("delta").alias("delta_w")
                    ),
                    ["source", "dst"],
                )
                .groupBy("source", F.col("src").alias("id"))
                .agg(
                    F.sum(
                        F.col("sigma_v").cast("double")
                        / F.col("sigma_w").cast("double")
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("d")
                )
            )
            delta = (
                reached.join(contrib, ["source", "id"], "left")
                .select(
                    "source", "id", F.coalesce(F.col("d"), F.lit(0.0)).alias("delta")
                )
                .localCheckpoint(eager=True)
            )
        per_vertex = (
            delta.where(F.col("id") != F.col("source"))
            .groupBy("id")
            .agg(F.sum("delta").alias("bc"))
        )
        bc = verts.join(per_vertex, "id", "left").select(
            F.col("id").cast("long"), F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc")
        )
        return bc, stats


def eigenvector_centrality(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """Eigenvector centrality by fixed-iteration power method from the
    all-ones start: x ← L2-normalize(Σ_{u→v} x(u)) per round (caller
    symmetrizes for undirected semantics).  Fixed rounds keep the
    arithmetic unrollable in ANSI SQL for the cross-engine oracle; each
    round is one join-aggregate shuffle plus a 1-row broadcast norm —
    the HITS half-step shape without the mutual reinforcement."""
    e = _hard_cut(normalize_edges(edges))
    verts = vertices_of(e).localCheckpoint(eager=True)
    if verts.rdd.isEmpty():
        spark = edges.sparkSession
        return spark.createDataFrame([], "id long, eig double")
    x = verts.select("id", F.lit(1.0).alias("x"))
    for _ in range(n_iter):
        s = (
            e.join(x.select(F.col("id").alias("src"), "x"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("s"))
        )
        full = verts.join(s, "id", "left").select(
            "id", F.coalesce(F.col("s"), F.lit(0.0)).alias("s")
        )
        x = (
            full.crossJoin(
                F.broadcast(
                    full.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("_n"))
                )
            )
            .select("id", (F.col("s") / F.col("_n")).alias("x"))
            .localCheckpoint(eager=False)
        )
    return x.select(F.col("id").cast("long"), F.col("x").alias("eig"))


def score(
    edges: DataFrame,
    s: int,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """s-core of a weighted undirected graph (Eidsaa-Almaas 2013): the
    maximal subgraph in which every vertex's STRENGTH (sum of incident
    edge weights) is ≥ s — the weighted generalization of k-core.
    Caller passes the symmetrized ``(src, dst, w)`` table.  Iteratively
    peels vertices with strength < s until a fixpoint; each round is
    one strength aggregate plus two semi-joins on the vertex key, and
    rounds past the fixpoint are no-ops (the unrolled-SQL-oracle
    property of the peel family).  Returns ``(id, strength)`` — core
    members with their within-core strength."""
    spark = edges.sparkSession
    e0 = (
        edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w").cast("long")
        )
        .where(F.col("src") != F.col("dst"))
        .persist()
    )
    m0 = e0.count()
    if m0 == 0:
        e0.unpersist()
        return (
            spark.createDataFrame([], "id long, strength long"),
            IterationStats(algorithm="score", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(e0.repartition(shuffle, "src"))
        e0.unpersist()
        stats = IterationStats(algorithm="score", edges=m0)
        prev_m = e.count()
        for it in range(1, max_iter + 1):
            t0 = time.monotonic()
            keep = (
                e.groupBy("src")
                .agg(F.sum("w").alias("st"))
                .where(F.col("st") >= s)
                .select(F.col("src").alias("id"))
            )
            e_next = (
                e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst", "w")
                .localCheckpoint(eager=True)
            )
            m = e_next.count()
            e = e_next
            stats.iterations = it
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(prev_m - m))
            if m == prev_m:
                stats.converged = True
                break
            prev_m = m
        core = e.groupBy("src").agg(F.sum("w").alias("strength"))
        return (
            core.select(F.col("src").cast("long").alias("id"), "strength").orderBy("id"),
            stats,
        )


# --------------------------------------------------------------------------
# SimRank, DAG layering, rectangle (4-cycle) counts


def simrank(
    edges: DataFrame,
    c: float = 0.8,
    n_iter: int = 3,
    max_pairs: int = 2_000_000,
) -> tuple[DataFrame, IterationStats]:
    """SimRank (Jeh & Widom 2002) by fixed-iteration pair propagation:
    two vertices are similar when their in-neighbors are similar —
    s(a,b) = c / (|I(a)||I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j), s(a,a)=1.

    The pair-score table is kept SPARSE (only reachable-pair entries
    exist; the diagonal is re-unioned each round instead of stored
    through the join), and each round is one double edge-expansion join
    + one partial-aggregated shuffle — the same join-aggregate shape as
    the PageRank loop, over pairs instead of vertices.  Fixed rounds
    keep the arithmetic unrollable in ANSI SQL for the cross-engine
    oracle.

    SCALE GUARD: the pair table is inherently O(|V|²) in the worst
    case; ``max_pairs`` aborts loudly instead of letting a dense graph
    quietly explode the shuffle.  At 100 TB run this on a bounded
    entity subset (the reference's Cypher similarity queries are
    equally scoped — /root/reference/docs/architecture/git/modeling.md).

    Returns ``((a, b, s) with the diagonal included, stats)``.
    """
    e = _hard_cut(normalize_edges(edges))
    stats = IterationStats(algorithm="simrank")
    spark = edges.sparkSession
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "a long, b long, s double"), stats
    verts = vertices_of(e).localCheckpoint(eager=True)
    indeg = (
        e.groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").cast("double").alias("d"))
        .localCheckpoint(eager=True)
    )
    stats.edges = e.count()
    stats.vertices = verts.count()
    diag = verts.select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.lit(1.0).alias("s")
    )
    s = diag
    ea = e.select(F.col("src").alias("a"), F.col("dst").alias("a2"))
    eb = e.select(F.col("src").alias("b"), F.col("dst").alias("b2"))
    for it in range(1, n_iter + 1):
        t0 = time.monotonic()
        t = (
            s.join(ea, "a")
            .join(eb, "b")
            .groupBy(F.col("a2").alias("a"), F.col("b2").alias("b"))
            .agg(F.sum("s").alias("t"))
        )
        off = (
            t.where(F.col("a") != F.col("b"))
            .join(indeg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a")
            .join(indeg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("t") / (F.col("da") * F.col("db"))).alias("s"),
            )
        )
        s = off.unionByName(diag).localCheckpoint(eager=True)
        n = s.count()
        if n > max_pairs:
            raise ValueError(
                f"simrank pair table hit {n} > max_pairs={max_pairs} at "
                f"iteration {it} — scope the input to a bounded subgraph"
            )
        stats.iterations = it
        stats.iter_seconds.append(time.monotonic() - t0)
    stats.converged = True  # fixed-iteration contract
    return s, stats


def dag_longest_path(
    edges: DataFrame, max_iter: int = 200, probe_every: int = 4
) -> tuple[DataFrame, IterationStats]:
    """Longest-path layering of a DAG: level(v) = length (in edges) of
    the longest path from any source vertex to v — the topological
    'generation' index (commit-DAG depth, build-stage number).

    Bellman-Ford-style max-propagation: level ← max(level, 1 +
    max_{u→v} level(u)) until a fixpoint; converges in exactly
    longest-path-length rounds on a DAG.  Each round is one edge⨝state
    join + max-aggregate; levels are monotone non-decreasing, so the
    change test is a single SUM aggregate (sum strictly grows iff any
    level grew).  Rounds are FUSED ``probe_every`` at a time — they
    chain lazily (the state enters each round's plan once, so the plan
    grows linearly, no self-join blowup) and only the chunk boundary
    pays a driver action; rounds past the fixpoint are no-ops, so the
    chunk-granularity probe is sound at the cost of ≤ probe_every−1
    wasted no-op rounds.  If ``max_iter`` rounds pass without a
    fixpoint the input has a cycle — raises instead of returning wrong
    levels (a cycle makes 'longest path' unbounded).
    """
    e = _hard_cut(normalize_edges(edges))
    stats = IterationStats(algorithm="dag_longest_path", fused=probe_every > 1)
    spark = edges.sparkSession
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "id long, lvl long"), stats
    verts = vertices_of(e).localCheckpoint(eager=True)
    stats.edges = e.count()
    stats.vertices = verts.count()
    lvl = verts.select("id", F.lit(0).cast("long").alias("lvl")).localCheckpoint(
        eager=True
    )
    prev_sum = 0
    it = 0
    while it < max_iter:
        t0 = time.monotonic()
        k = min(probe_every, max_iter - it)
        for j in range(k):
            upd = (
                e.join(lvl.select(F.col("id").alias("src"), "lvl"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg((F.max("lvl") + F.lit(1)).alias("nl"))
            )
            lvl = (
                lvl.join(upd, "id", "left")
                .select(
                    "id",
                    F.greatest(
                        F.col("lvl"), F.coalesce(F.col("nl"), F.lit(0))
                    ).alias("lvl"),
                )
                .localCheckpoint(eager=(j == k - 1))
            )
        it += k
        cur_sum = lvl.agg(F.sum("lvl")).collect()[0][0]
        stats.iterations = it
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.deltas.append(float(cur_sum - prev_sum))
        if cur_sum == prev_sum:
            stats.converged = True
            break
        prev_sum = cur_sum
    if not stats.converged:
        raise ValueError(
            f"dag_longest_path did not reach a fixpoint in {max_iter} rounds — "
            "the input graph has a cycle (or raise max_iter)"
        )
    return lvl, stats


def square_counts(sym_edges: DataFrame) -> DataFrame:
    """Per-vertex rectangle (4-cycle, non-induced) counts: squares(v) =
    Σ_{w≠v} C(cn(v,w), 2), where cn(v,w) is the number of common
    neighbors — each unordered pair of common neighbors {x, y} closes
    the 4-cycle v–x–w–y with v and w as opposite corners, so summing
    over v's opposite corner counts every rectangle through v exactly
    once.  The link-graph spam/nepotism motif one level up from
    triangles (caller passes the symmetrized edge table).

    One wedge self-join + two aggregations, all integer arithmetic —
    the Σdeg² wedge table is the cost driver at scale, same as
    triangle counting's 2-path stage; bound the input (degree cap or
    subgraph scope) the same way.
    """
    e = _hard_cut(normalize_edges(sym_edges))
    spark = sym_edges.sparkSession
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "id long, squares long")
    wedges = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("x"))
        .join(e.select(F.col("src").alias("x"), F.col("dst").alias("w")), "x")
        .where(F.col("v") != F.col("w"))
        .groupBy("v", "w")
        .agg(F.count("*").alias("cn"))
    )
    sq = wedges.groupBy(F.col("v").alias("id")).agg(
        F.sum((F.col("cn") * (F.col("cn") - F.lit(1))) / F.lit(2))
        .cast("long")
        .alias("squares")
    )
    return (
        vertices_of(e)
        .join(sq, "id", "left")
        .select("id", F.coalesce(F.col("squares"), F.lit(0)).cast("long").alias("squares"))
    )


def louvain_move(weighted_sym_edges: DataFrame) -> DataFrame:
    """One synchronous Louvain move round from singleton communities on
    a weighted undirected graph (caller passes the symmetrized
    ``(src, dst, w)`` table): every vertex moves to the neighbor whose
    (singleton) community yields the largest positive modularity gain
    ΔQ(v→{u}) = w_vu/m − k_v·k_u/(2m²), tie-broken (gain desc, u asc);
    vertices with no positive gain keep their own label.  This is the
    deterministic first sweep of Louvain phase 1 (Blondel et al. 2008)
    — the sweep that does most of the modularity work — kept to ONE
    synchronous round so the arithmetic replays exactly in ANSI SQL
    (later sweeps depend on sequential visit order, which a
    distributed engine deliberately does not promise).

    One strength aggregate + one edge join + one per-vertex top-1 —
    the same shuffle shape as a label-propagation round.  Returns
    ``(id, comm)``.
    """
    from pyspark.sql.window import Window

    e = (
        weighted_sym_edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("w").cast("double"),
        )
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    spark = weighted_sym_edges.sparkSession
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "id long, comm long")
    # m = total undirected weight = half the symmetrized sum
    m_row = e.agg((F.sum("w") / F.lit(2.0)).alias("m"))
    strength = e.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    cand = (
        e.join(strength.withColumnRenamed("id", "src").withColumnRenamed("k", "kv"), "src")
        .join(strength.withColumnRenamed("id", "dst").withColumnRenamed("k", "ku"), "dst")
        .crossJoin(F.broadcast(m_row))
        .select(
            F.col("src").alias("id"),
            F.col("dst").alias("u"),
            (
                F.col("w") / F.col("m")
                - F.col("kv") * F.col("ku") / (F.lit(2.0) * F.col("m") * F.col("m"))
            ).alias("g"),
        )
        .where(F.col("g") > 0)
    )
    win = Window.partitionBy("id").orderBy(F.desc("g"), F.asc("u"))
    best = (
        cand.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .select("id", F.col("u").alias("comm"))
    )
    return (
        vertices_of(e)
        .join(best, "id", "left")
        .select("id", F.coalesce(F.col("comm"), F.col("id")).alias("comm"))
    )


def modularity(weighted_sym_edges: DataFrame, comm: DataFrame) -> float:
    """Newman modularity Q = Σ_c [Σin_c/(2m) − (Σtot_c/(2m))²] of a
    partition over a SYMMETRIZED weighted edge table (self-loop rows
    carry 2× their undirected weight — the contraction convention of
    :func:`louvain`).  One edge⨝comm join + one community aggregate."""
    e = weighted_sym_edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("w").cast("double")
    )
    c = comm.select(F.col("id").cast("long"), F.col("comm").cast("long"))
    two_m = e.agg(F.sum("w")).collect()[0][0]
    if not two_m:
        return 0.0
    lab = (
        e.join(c.withColumnRenamed("id", "src").withColumnRenamed("comm", "cs"), "src")
        .join(c.withColumnRenamed("id", "dst").withColumnRenamed("comm", "cd"), "dst")
    )
    intra = (
        lab.where(F.col("cs") == F.col("cd"))
        .groupBy("cs")
        .agg(F.sum("w").alias("win"))
    )
    tot = lab.groupBy("cs").agg(F.sum("w").alias("ktot"))
    row = (
        tot.join(intra, "cs", "left")
        .select(
            (
                F.coalesce(F.col("win"), F.lit(0.0)) / F.lit(float(two_m))
                - (F.col("ktot") / F.lit(float(two_m))) ** 2
            ).alias("q")
        )
        .agg(F.sum("q"))
        .collect()[0][0]
    )
    return float(row or 0.0)


def louvain(
    weighted_sym_edges: DataFrame,
    max_levels: int = 6,
    max_sweeps: int = 12,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, IterationStats]:
    """Full multi-level Louvain (Blondel et al. 2008) on a weighted
    undirected graph, distributed-deterministic.

    Phase 1 runs SYNCHRONOUS move sweeps with parity alternation (only
    vertices with ``id % 2 == sweep % 2`` may move in a sweep — the
    standard distributed-Louvain guard against two adjacent vertices
    swapping communities forever; deterministic, unlike per-thread visit
    order in the sequential original).  Each sweep considers moving v to
    a NEIGHBOR community: ΔQ = (w_{v→c'} − w_{v→c_v∖v})/m −
    k_v·(Σtot_{c'} − Σtot_{c_v} + k_v)/(2m²), ties (gain desc, comm
    asc); a move needs ΔQ > 0.  Phase 1 ends when a sweep PAIR (both
    parities) moves nothing.  Phase 2 contracts communities to vertices
    (groupBy-sum; intra weight becomes self-loop rows at 2× undirected
    weight — the convention ``modularity`` reads) and recurses until a
    level makes no moves or ``max_levels``.

    FRONTIER-SCOPED (the active-set rule of Grappolo/NetworKit): after
    the first sweep only vertices still awaiting their parity turn,
    last sweep's movers, and the movers' neighbors re-evaluate —
    frontier' = (frontier ∖ processed) ∪ movers ∪ nbrs(movers).  Late
    sweeps touch Σ|E(frontier)| instead of |E| (measured 65 s → ~25 s
    at sf0.1 on the 2.4M-edge co-order graph); the python golden
    replays the same frontier schedule bit-for-bit.

    Graph-state convention: ``(src, dst, w)`` with both directions
    present for src≠dst and self-loops carrying 2× undirected weight;
    m = Σw/2; k_v = Σ_dst w(v,dst) (self-loop included — its 2× weight
    is exactly the standard 2·w_loop term).  Per sweep: one strength
    agg, one community-total agg, one edges⨝comm join-agg, one
    per-vertex top-1 window — the LPA shuffle shape.  Sums stay exact
    (hence deterministic) when weights are integers; the pytest golden
    replays the identical schedule in pure python.  Returns
    ``(orig_id → comm, stats)``; stats.iterations = total sweeps,
    stats.deltas = moves per sweep.

    Checkpoint/resume (the pagerank/cc contract, level granularity):
    with ``checkpoint_dir``, each completed level durably snapshots the
    orig→comm mapping AND the contracted graph as one packed parquet
    (kind 'm'/'e' rows) with per-partition lineage in meta.json;
    ``resume=True`` reloads the latest level and continues — a killed
    multi-hour hierarchy run restarts at its last contraction, not from
    scratch.

    Reference parity: rebuilds the community hierarchy Polar's graph
    queries read off its store (cf. /root/reference/src/agents/graph —
    vocabulary-level only; the reference ships no Louvain), as the
    natural multi-level extension of :func:`louvain_move`.
    """
    from pyspark.sql.window import Window

    stats = IterationStats(algorithm="louvain")
    spark = weighted_sym_edges.sparkSession
    e = (
        weighted_sym_edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("w").cast("double"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "id long, comm long"), stats
    stats.edges = e.count()
    # orig_id -> current community (community ids live in vertex-id space)
    mapping = vertices_of(e).select("id", F.col("id").alias("comm"))
    mapping = _hard_cut(mapping)
    stats.vertices = mapping.count()

    ckpt = _Ckpt(spark, checkpoint_dir, "louvain") if checkpoint_dir else None
    start_level = 0
    if resume and ckpt is not None and (last := ckpt.latest()) is not None:
        packed = ckpt.load(last["iteration"])
        mapping = _hard_cut(
            packed.where(F.col("kind") == "m").select(
                F.col("a").alias("id"), F.col("b").alias("comm")
            )
        )
        e = _hard_cut(
            packed.where(F.col("kind") == "e").select(
                F.col("a").alias("src"), F.col("b").alias("dst"), "w"
            )
        )
        start_level = int(last["iteration"])
        stats.resumed_from = start_level

    for _level in range(start_level, max_levels):
        comm = vertices_of(e).select("id", F.col("id").alias("comm"))
        comm = _hard_cut(comm)
        m_total = e.agg((F.sum("w") / F.lit(2.0)).alias("m")).collect()[0][0]
        if not m_total:
            break
        strength = _hard_cut(
            e.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
        )
        # vertex-bounded side tables (comm / strength / tot / moves) are
        # broadcast when the LEVEL's vertex count is measured small —
        # every sweep join but the vc aggregate then runs map-side, no
        # exchange of the edge table or the vertex state (guide §3.1).
        # Levels above the gate (cluster-scale level 0) keep shuffle
        # joins; contraction shrinks later levels under it quickly.
        n_vl = comm.count()
        bb = F.broadcast if n_vl <= 2_000_000 else (lambda df: df)
        level_moves = 0
        idle_pair = 0
        frontier: DataFrame | None = None  # None => every vertex
        for sweep in range(max_sweeps):
            t0 = time.monotonic()
            # community totals under the current assignment
            tot = (
                comm.join(bb(strength), "id")
                .groupBy("comm")
                .agg(F.sum("k").alias("ktot"))
            )
            # v -> neighbor-community edge mass (self edge excluded),
            # frontier-scoped: only active-set sources re-evaluate
            e_live = e.where(F.col("src") != F.col("dst"))
            if frontier is not None:
                e_live = e_live.join(
                    bb(frontier.withColumnRenamed("id", "src")), "src", "left_semi"
                )
            vc = (
                e_live.join(
                    bb(
                        comm.withColumnRenamed("id", "dst").withColumnRenamed(
                            "comm", "c_dst"
                        )
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"), F.col("c_dst").alias("cand"))
                .agg(F.sum("w").alias("w_vc"))
            )
            cur = comm.withColumnRenamed("comm", "c_cur")
            # w_own folded into a window over the single vc⨝cur join
            # (was: a semi-join to build own + a left join back — two
            # extra vertex-table joins per sweep); the window partitions
            # by id over at most one matching row, so the sum IS the
            # old w_own value, rows and results identical.
            vcj = vc.join(bb(cur), "id")
            base = (
                vcj.withColumn(
                    "w_own",
                    F.coalesce(
                        F.sum(
                            F.when(F.col("cand") == F.col("c_cur"), F.col("w_vc"))
                        ).over(Window.partitionBy("id")),
                        F.lit(0.0),
                    ),
                )
                .where(F.col("cand") != F.col("c_cur"))
                .join(bb(strength.withColumnRenamed("k", "kv")), "id")
                .join(bb(tot.withColumnRenamed("comm", "cand").withColumnRenamed("ktot", "t_cand")), "cand")
                .join(bb(tot.withColumnRenamed("comm", "c_cur").withColumnRenamed("ktot", "t_cur")), "c_cur")
            )
            gain = (
                (F.col("w_vc") - F.col("w_own")) / F.lit(float(m_total))
                - F.col("kv")
                * (F.col("t_cand") - F.col("t_cur") + F.col("kv"))
                / (F.lit(2.0) * F.lit(float(m_total)) * F.lit(float(m_total)))
            )
            win = Window.partitionBy("id").orderBy(F.desc("g"), F.asc("cand"))
            # ONE action per sweep (was three _hard_cut jobs + a count +
            # an isEmpty): moves/comm'/frontier' chain as lazy
            # checkpoints, the combined 1-row (n_moves × frontier-size)
            # collect materializes the whole chain, and _stats_leaf
            # resets the inherited size estimates so Catalyst's stats
            # arithmetic cannot compound across sweeps (the _hard_cut
            # pathology) without paying _hard_cut's second pass.
            all_ids = frontier if frontier is not None else comm.select("id")
            moves = (
                base.select("id", "cand", gain.alias("g"))
                .where(F.col("g") > 0)
                .where(F.pmod(F.col("id"), F.lit(2)) == F.lit(sweep % 2))
                .withColumn("_rn", F.row_number().over(win))
                .where(F.col("_rn") == 1)
                .select("id", F.col("cand").alias("comm_new"))
                .localCheckpoint(eager=False)
            )
            comm_next = _stats_leaf(
                comm.join(bb(moves), "id", "left")
                .select(
                    "id",
                    F.coalesce(F.col("comm_new"), F.col("comm")).alias("comm"),
                    F.col("comm_new").isNotNull().alias("_mv"),
                )
                .localCheckpoint(eager=False)
            )
            movers = comm_next.where(F.col("_mv")).select("id")
            unprocessed = all_ids.where(
                F.pmod(F.col("id"), F.lit(2)) != F.lit(sweep % 2)
            )
            nbrs = (
                e.where(F.col("src") != F.col("dst"))
                .join(bb(movers.withColumnRenamed("id", "src")), "src", "left_semi")
                .select(F.col("dst").alias("id"))
            )
            frontier_next = _stats_leaf(
                unprocessed.unionByName(movers)
                .unionByName(nbrs)
                .distinct()
                .localCheckpoint(eager=False)
            )
            row = (
                comm_next.agg(F.sum(F.col("_mv").cast("long")).alias("mv"))
                .crossJoin(
                    F.broadcast(frontier_next.agg(F.count("*").alias("fr")))
                )
                .collect()[0]
            )
            n_moves, frontier_n = int(row["mv"] or 0), int(row["fr"])
            comm = comm_next.select("id", "comm")
            frontier = frontier_next
            stats.iterations += 1
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(float(n_moves))
            level_moves += n_moves
            idle_pair = idle_pair + 1 if n_moves == 0 else 0
            if idle_pair >= 2:  # both parities idle -> phase-1 fixpoint
                break
            if frontier_n == 0:
                break
        if level_moves == 0:
            stats.converged = True
            break
        # relabel each community to its min member id (stable ids across
        # levels; keeps labels in vertex-id space)
        rep = comm.groupBy("comm").agg(F.min("id").alias("rep"))
        comm = comm.join(bb(rep), "comm").select("id", F.col("rep").alias("comm"))
        comm = _hard_cut(comm)
        # compose the orig->comm mapping
        mapping = _hard_cut(
            mapping.join(
                bb(comm.select(F.col("id").alias("comm"), F.col("comm").alias("comm_new"))),
                "comm",
            ).select("id", F.col("comm_new").alias("comm"))
        )
        # phase 2: contract communities (intra mass -> self-loops, 2x)
        e_new = (
            e.join(bb(comm.withColumnRenamed("id", "src").withColumnRenamed("comm", "cs")), "src")
            .join(bb(comm.withColumnRenamed("id", "dst").withColumnRenamed("comm", "cd")), "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        e = _hard_cut(e_new)
        if ckpt is not None:
            packed = mapping.select(
                F.lit("m").alias("kind"),
                F.col("id").alias("a"),
                F.col("comm").alias("b"),
                F.lit(None).cast("double").alias("w"),
            ).unionByName(
                e.select(
                    F.lit("e").alias("kind"),
                    F.col("src").alias("a"),
                    F.col("dst").alias("b"),
                    "w",
                )
            )
            ckpt.save(_level + 1, packed, float(level_moves))
        n_next = vertices_of(e).count()
        if n_next <= 1:
            stats.converged = True
            break
    return mapping, stats


def dag_path_counts(
    edges: DataFrame, max_iter: int = 200
) -> tuple[DataFrame, IterationStats]:
    """Source-to-vertex path counting on a DAG: p(v) = number of
    distinct directed paths from any source (in-degree-0) vertex to v,
    counting the empty path at sources — the DP behind provenance
    multiplicity ('how many build paths reach this artifact') and
    DAG-width diagnostics.

    FRONTIER-SCOPED: round k propagates f_k(v) = number of paths of
    length exactly k ending at v (f_0 = 1 at sources); each round is
    one edges⨝frontier join + sum-aggregate over only the still-active
    frontier — total work is Σ_k |E(frontier_k)|, which shrinks as the
    DAG drains, instead of |E|·depth for the full-state formulation.
    p = Σ_k f_k is one final union-aggregate.  The frontier empties at
    longest-path-length rounds; ``max_iter`` exhaustion means a
    source-REACHABLE cycle (path count diverges) — raises.  A cycle no
    source reaches never enters any frontier (zero counts inside it —
    a valid fixpoint, not an error), and its vertices report 0.
    """
    e = _hard_cut(normalize_edges(edges))
    stats = IterationStats(algorithm="dag_path_counts")
    spark = edges.sparkSession
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "id long, paths long"), stats
    verts = vertices_of(e).localCheckpoint(eager=True)
    stats.edges = e.count()
    stats.vertices = verts.count()
    frontier = (
        verts.join(e.select(F.col("dst").alias("id")).distinct(), "id", "left_anti")
        .select("id", F.lit(1).cast("long").alias("f"))
        .localCheckpoint(eager=True)
    )
    layers = [frontier]
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        frontier = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("f").alias("f"))
            .localCheckpoint(eager=True)
        )
        n = frontier.count()
        stats.iterations = it
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.deltas.append(float(n))
        if n == 0:
            stats.converged = True
            break
        layers.append(frontier)
    if not stats.converged:
        raise ValueError(
            f"dag_path_counts did not drain its frontier in {max_iter} rounds — "
            "a source-reachable cycle (or raise max_iter)"
        )
    acc = layers[0]
    for lay in layers[1:]:
        acc = acc.unionByName(lay)
    p = (
        verts.join(acc.groupBy("id").agg(F.sum("f").alias("s")), "id", "left")
        .select("id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("paths"))
        .localCheckpoint(eager=True)
    )
    return p, stats


def maximal_matching(
    edges: DataFrame, max_iter: int = 60
) -> tuple[DataFrame, IterationStats]:
    """Distributed maximal matching by mutual-proposal rounds (the
    edge-side sibling of Luby MIS): every undirected edge gets a
    deterministic SQL-replayable xorshift priority; each round every
    still-free vertex points at its highest-priority incident edge,
    edges chosen from BOTH endpoints join the matching, and all edges
    touching newly matched vertices drop out.  O(log E) rounds with
    high probability; each round is two vertex-side argmax aggregates
    + one semi/anti join — the LPA shuffle shape.  Rounds past the
    fixpoint are no-ops, so a SQL oracle may unroll extra rounds.

    Returns ``((a, b) matched pairs with a < b, stats)``; raises if
    ``max_iter`` rounds leave edges standing (pathological priority
    ties — cannot happen with the injective packed key below for
    ids < 2^31).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    stats = IterationStats(algorithm="maximal_matching")
    spark = edges.sparkSession
    if und.rdd.isEmpty():
        return spark.createDataFrame([], "a long, b long"), stats
    # injective 62-bit pack -> xorshift mix; unique per edge for ids < 2^31
    key = F.col("a") * F.lit(2**31) + F.col("b")
    x0 = (key % F.lit(2**31)).bitwiseXOR(F.shiftright(key, 31) % F.lit(2**31))
    x1 = (x0 * F.lit(2654435761)) % F.lit(2**31)
    x2 = (x1.bitwiseXOR(F.shiftright(x1, 13)) * F.lit(1274126177)) % F.lit(2**31)
    # tie-break on (a, b) keeps the argmax total even if mixes collide
    e = und.select(
        "a", "b", x2.bitwiseXOR(F.shiftright(x2, 17)).alias("p")
    ).localCheckpoint(eager=True)
    stats.edges = e.count()
    matched = spark.createDataFrame([], "a long, b long")
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        inc = e.select(F.col("a").alias("v"), "a", "b", "p").unionByName(
            e.select(F.col("b").alias("v"), "a", "b", "p")
        )
        from pyspark.sql.window import Window as _W

        w = _W.partitionBy("v").orderBy(F.desc("p"), F.asc("a"), F.asc("b"))
        top = (
            inc.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("v", "a", "b")
        )
        sel = (
            top.groupBy("a", "b")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") == 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_sel = sel.count()
        matched = matched.unionByName(sel).localCheckpoint(eager=True)
        mv = sel.select(F.col("a").alias("v")).unionByName(
            sel.select(F.col("b").alias("v"))
        )
        e = (
            e.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b", "p")
            .localCheckpoint(eager=True)
        )
        m = e.count()
        stats.iterations = it
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.deltas.append(float(n_sel))
        if m == 0:
            stats.converged = True
            break
    if not stats.converged:
        raise RuntimeError(
            f"maximal_matching left {m} edges after {max_iter} rounds"
        )
    return matched.select("a", "b"), stats


def shortest_path_counts(
    edges: DataFrame, source: int, max_depth: int = 100
) -> tuple[DataFrame, IterationStats]:
    """Single-source shortest-path COUNTS (the σ table of Brandes'
    betweenness forward phase, exposed as its own operator): for every
    reachable vertex, its hop distance and the number of distinct
    shortest paths from ``source`` — all-integer, so the cross-engine
    parity is exact.

    Frontier propagation: σ(v) = Σ σ(u) over frontier in-neighbors u
    at distance d−1; each round is one frontier⨝edges join + one sum
    aggregate + one anti-join against visited (O(E) total across
    rounds).  Rounds past the last frontier are no-ops (empty
    frontier), so a SQL oracle may over-unroll safely.
    """
    e = _hard_cut(normalize_edges(edges))
    spark = edges.sparkSession
    stats = IterationStats(algorithm="shortest_path_counts")
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "id long, dist int, sigma long"), stats
    stats.edges = e.count()
    frontier = spark.createDataFrame(
        [(int(source), 0, 1)], "id long, dist int, sigma long"
    ).localCheckpoint(eager=True)
    visited = frontier
    for depth in range(1, max_depth + 1):
        t0 = time.monotonic()
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.lit(depth).alias("dist"), F.sum("sigma").alias("sigma"))
            .join(visited.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        stats.iterations = depth
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.deltas.append(float(n))
        if n == 0:
            stats.converged = True
            break
        # lazy: the next round's frontier count materializes it (one
        # job per round instead of two)
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    # if max_depth truncated the sweep, stats.converged stays False and
    # the table covers vertices within max_depth hops only
    return (
        visited.select(
            F.col("id").cast("long"), F.col("dist").cast("int"), F.col("sigma").cast("long")
        ),
        stats,
    )


def ppr_push(
    edges: DataFrame,
    source: int,
    alpha: float = 0.15,
    n_iter: int = 4,
) -> DataFrame:
    """Approximate personalized PageRank by SYNCHRONOUS lazy-walk push
    (the batch formulation of Andersen–Chung–Lang forward push): mass
    starts as residual r = e_source; each round settles α·r into p and
    spreads the rest half-lazily —

        p ← p + α·r
        r ← (1−α)/2 · r  +  (1−α)/2 · Pᵀ r

    After k rounds p lower-bounds the true PPR with total outstanding
    mass Σr = (1−α)^k; the residual column quantifies the
    approximation, which is the operator's point — LOCAL mass stays
    near the seed, so per-round work is proportional to the touched
    neighborhood, not the graph (the sparse frontier is the 100 TB
    story; the fixed round count keeps the arithmetic unrollable for
    the SQL oracle).  Returns ``(id, p, r)`` over all vertices.
    """
    e = _hard_cut(normalize_edges(edges))
    spark = edges.sparkSession
    if e.rdd.isEmpty():
        return spark.createDataFrame([], "id long, p double, r double")
    verts = vertices_of(e).localCheckpoint(eager=True)
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    w = _hard_cut(
        e.join(deg.withColumnRenamed("id", "src"), "src").select(
            "src", "dst", (F.lit(1.0) / F.col("d")).alias("wt")
        )
    )
    state = verts.select(
        "id",
        F.lit(0.0).alias("p"),
        F.when(F.col("id") == source, F.lit(1.0)).otherwise(F.lit(0.0)).alias("r"),
    )
    half = (1.0 - alpha) / 2.0
    for _ in range(n_iter):
        spread = (
            w.join(
                state.select(F.col("id").alias("src"), F.col("r").alias("rs")), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("wt") * F.col("rs")).alias("inm"))
        )
        state = (
            state.join(spread, "id", "left")
            .select(
                "id",
                (F.col("p") + F.lit(alpha) * F.col("r")).alias("p"),
                (
                    F.lit(half) * F.col("r")
                    + F.lit(half) * F.coalesce(F.col("inm"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return state.localCheckpoint(eager=True)


def bipartite_report(
    edges: DataFrame,
    max_depth: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-component bipartiteness audit by BFS 2-coloring — the
    pre-flight every bipartite-only algorithm (SALSA, bipartite
    projection, Hopcroft-Karp matching) needs before trusting its
    input.  A component is bipartite iff BFS layering from any vertex
    yields no edge inside a layer-parity class, i.e. no edge whose
    endpoints sit at equal hop-distance parity (such an edge closes an
    odd cycle; König).

    Three O(E)-per-round primitives, no per-vertex Python:

    1. hash-min :func:`connected_components` → every vertex labelled
       with its component's minimum id;
    2. one multi-source frontier BFS seeded at every component
       representative **simultaneously** (``id == comp`` — seeds come
       from a join, never a driver-side collect, so a 10^9-component
       graph costs the same plan);  distances are exact minima per
       component because components are disjoint;
    3. one edge-side join of both endpoint distances + a per-component
       aggregate counting equal-parity edges.

    Returns one row per component:
    ``(comp, n_vertices, n_edges, odd_edges, is_bipartite)`` where
    ``n_edges`` counts undirected (canonical ``src < dst``) edges and
    ``odd_edges`` the parity-violating ones.  Reference posture:
    structural audits over the extracted dependency graph (cmu-sei/
    Polar queries walk typed edge families that are bipartite by
    schema; this verifies the property instead of assuming it).
    """
    spark = edges.sparkSession
    und = normalize_edges(edges).where(F.col("src") != F.col("dst"))
    und = (
        und.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
        .persist()
    )
    m0 = und.count()
    if m0 == 0:
        und.unpersist()
        return spark.createDataFrame(
            [],
            "comp long, n_vertices long, n_edges long, odd_edges long, "
            "is_bipartite boolean",
        )
    comps, _stats = connected_components(und, num_partitions=num_partitions)
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = (
            und.select("src", "dst")
            .unionByName(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .repartition(shuffle, "src")
            .localCheckpoint(eager=True)
        )
        comps = comps.localCheckpoint(eager=True)
        und.unpersist()
        # seeds: the component representative itself (id == comp) — a
        # filter, not a collect; all components BFS in the same rounds
        frontier = comps.where(F.col("id") == F.col("comp")).select(
            "id", F.lit(0).alias("dist")
        ).localCheckpoint(eager=True)
        visited = frontier
        for depth in range(1, max_depth + 1):
            nxt = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"), F.lit(depth).alias("dist"))
                .dropDuplicates(["id"])
                .join(visited.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.count() == 0:
                break
            # lazy: the next round's frontier count materializes it (one
            # job per round instead of two)
            visited = visited.unionByName(nxt).localCheckpoint(eager=False)
            frontier = nxt
        parity = visited.select("id", (F.col("dist") % 2).alias("par"))
        edge_par = (
            und_from_sym(e)
            .join(parity.withColumnRenamed("id", "src").withColumnRenamed("par", "ps"), "src")
            .join(parity.withColumnRenamed("id", "dst").withColumnRenamed("par", "pd"), "dst")
            .join(comps.withColumnRenamed("id", "src"), "src")
        )
        out = (
            edge_par.groupBy("comp")
            .agg(
                F.count("*").alias("n_edges"),
                F.sum((F.col("ps") == F.col("pd")).cast("long")).alias("odd_edges"),
            )
            .join(comps.groupBy("comp").agg(F.count("*").alias("n_vertices")), "comp")
            .select(
                F.col("comp").cast("long"),
                "n_vertices",
                "n_edges",
                "odd_edges",
                (F.col("odd_edges") == 0).alias("is_bipartite"),
            )
        )
        return out


def und_from_sym(e: DataFrame) -> DataFrame:
    """Canonical undirected (src < dst) edge view of a symmetrized table."""
    return e.where(F.col("src") < F.col("dst"))


def ppr_sweep(
    edges_sym: DataFrame,
    source: int,
    alpha: float = 0.15,
    n_iter: int = 6,
    top: int = 24,
) -> DataFrame:
    """PageRank-Nibble conductance sweep (Andersen/Chung/Lang
    FOCS'06): run :func:`ppr_push` from ``source``, order touched
    vertices by degree-normalized mass p/d (ties: rounded score desc,
    id asc), and for every prefix of the top-``top`` candidates report
    ``(t, id, d, cut, vol, phi)`` with conductance
    phi = cut / min(vol, vol_total − vol).  The minimum-phi prefix is
    the local community around the seed.

    Scale shape: the push touches O(1/(alpha·eps)) mass, not O(V);
    the sweep windows run over ``top`` rows, never the graph; cut and
    vol are INTEGER-exact via rank difference arrays (+1 at the edge's
    min rank, −1 at its max rank, prefix-summed), so phi is one exact
    integer division, rounded 6dp (0.0 when the prefix is the whole
    graph).  ``edges_sym`` must be a symmetrized edge table.

    Reference posture: local neighborhood queries around a flagged
    entity (Polar walks bounded-depth typed edges from a seed node —
    e.g. src/agents/graph queries); this is the density-aware version
    that finds the seed's community boundary instead of a fixed-depth
    ball."""
    # materialize the symmetrized input ONCE: it feeds the push (its own
    # action), the vol_total count, and the deg/und joins of the final
    # plan — without the cut each of those re-runs the caller's full
    # graph-construction plan
    edges_sym = _hard_cut(edges_sym)
    vol_total = edges_sym.count()  # sum of degrees = 2m
    spark = edges_sym.sparkSession
    # pinned partitions + AQE off for the push rounds and the candidate
    # materialization (_shuffle_conf, the iterative-loop discipline):
    # AQE's per-stage replanning on the many small push/rank stages was
    # measured 9.8 s vs 5.7 s for the whole nibble query at sf0.1
    with _shuffle_conf(spark, _auto_partitions(spark, vol_total, None)):
        out = ppr_push(edges_sym, source=source, alpha=alpha, n_iter=n_iter)
        deg = edges_sym.groupBy("src").agg(F.count("*").alias("d"))
        cand = (
            out.join(deg, out.id == deg.src)
            .where(F.col("p") > 0)
            .select("id", "d", F.round(F.col("p") / F.col("d"), 7).alias("score"))
        )
        wt = Window.orderBy(F.desc("score"), F.asc("id"))
        rk = (
            cand.withColumn("t", F.row_number().over(wt))
            .where(F.col("t") <= top)
            .select("id", "d", "t")
            .localCheckpoint(eager=True)  # <= top rows; reused by three joins
        )
    # cut(t) = vol(t) - 2*internal(t): internal edges have BOTH
    # endpoints at rank <= t, so edges leaving the prefix to
    # non-candidate vertices are counted through vol automatically
    und = edges_sym.where(F.col("src") < F.col("dst"))
    ev = (
        und.join(rk.select(F.col("id").alias("src"), F.col("t").alias("ta")), "src")
        .join(rk.select(F.col("id").alias("dst"), F.col("t").alias("tb")), "dst")
        .select(F.greatest("ta", "tb").alias("hi"))
    )
    deltas = ev.groupBy(F.col("hi").alias("t")).agg(F.count("*").alias("dint"))
    ws = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        rk.join(deltas, "t", "left")
        .withColumn("internal", F.sum(F.coalesce("dint", F.lit(0))).over(ws))
        .withColumn("vol", F.sum("d").over(ws))
        .withColumn("cut", F.col("vol") - F.lit(2) * F.col("internal"))
    )
    denom = F.least(F.col("vol"), F.lit(int(vol_total)) - F.col("vol"))
    return sweep.select(
        F.col("t").cast("long").alias("t"),
        F.col("id").cast("long").alias("id"),
        F.col("d").cast("long").alias("d"),
        F.col("cut").cast("long").alias("cut"),
        F.col("vol").cast("long").alias("vol"),
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                F.col("cut").cast("double") / denom.cast("double")
            ),
            6,
        ).alias("phi"),
    ).orderBy("t")


def harmonic_labels(
    edges_sym: DataFrame,
    seeds: DataFrame,
    n_labels: int,
    rounds: int = 3,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Semi-supervised label spreading by the harmonic-function
    iteration (Zhu/Ghahramani/Lafferty ICML'03): seed vertices carry a
    clamped one-hot label distribution; every round each vertex
    replaces its distribution with the degree-normalized sum of its
    neighbors', seeds re-clamped.  The label-mass algebra here is
    INTEGER-EXACT: masses are ``scale``-scaled BIGINTs and each
    neighbor contribution is ``f_u DIV d_u`` (integer floor division),
    so the per-vertex sums are order- and partitioning-independent —
    a SQL engine replays the fixpoint bit-for-bit (the same discipline
    as the repo's scaled-BIGINT log-prob sums).  The floor leaks
    < d_u ulps of mass per vertex per round — a defined, deterministic
    variant of the textbook float iteration.

    ``seeds``: (id, lbl) with lbl in [0, n_labels).  Returns
    ``(id, pred, m0..m{n-1})`` after ``rounds`` sweeps, where pred is
    the argmax label (ties → smaller label; vertices never reached
    carry pred = -1).  One join + one aggregate per round, same
    exchange shape as PageRank.  Reference posture: propagating a
    known classification (e.g. vulnerability state) from a few labeled
    nodes across the dependency graph."""
    spark = edges_sym.sparkSession
    # materialized once: e feeds deg, verts and every round's inm join —
    # without the cut each round's action re-runs the caller's full
    # graph-construction plan
    e = _hard_cut(edges_sym.select("src", "dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    verts = vertices_of(e)
    onehot = [
        F.when(F.col("lbl") == i, F.lit(scale)).otherwise(F.lit(0)).cast("long").alias(f"m{i}")
        for i in range(n_labels)
    ]
    seed_state = seeds.select("id", *onehot)
    state = (
        verts.join(seed_state, "id", "left")
        .select(
            "id",
            *[F.coalesce(F.col(f"m{i}"), F.lit(0)).cast("long").alias(f"m{i}") for i in range(n_labels)],
        )
        .localCheckpoint(eager=True)
    )
    seed_ids = seeds.select("id", F.col("lbl").alias("_slbl"))
    for _ in range(rounds):
        contrib = state.join(deg, state.id == deg.src).select(
            F.col("src").alias("_u"),
            # true integer division (never float-divide-then-cast: the
            # double quotient can round UP across an integer boundary)
            *[F.expr(f"m{i} div d").cast("long").alias(f"c{i}") for i in range(n_labels)],
        )
        inm = (
            e.join(contrib.hint("shuffle_hash"), e.src == F.col("_u"))
            .groupBy(F.col("dst").alias("id"))
            .agg(*[F.sum(f"c{i}").alias(f"m{i}") for i in range(n_labels)])
        )
        state = (
            verts.join(inm, "id", "left")
            .join(seed_ids, "id", "left")
            .select(
                "id",
                *[
                    F.when(F.col("_slbl").isNotNull(),
                           F.when(F.col("_slbl") == i, F.lit(scale)).otherwise(F.lit(0)))
                    .otherwise(F.coalesce(F.col(f"m{i}"), F.lit(0)))
                    .cast("long")
                    .alias(f"m{i}")
                    for i in range(n_labels)
                ],
            )
            # lazy: fixed rounds need no per-round decision — the
            # caller's single action materializes the whole chain
            .localCheckpoint(eager=False)
        )
    total = sum(F.col(f"m{i}") for i in range(n_labels))
    best = F.lit(-1)
    bestm = F.lit(-1).cast("long")
    # argmax with smaller-label ties: scan labels in reverse so the
    # earliest label wins on >=
    for i in reversed(range(n_labels)):
        cond = F.col(f"m{i}") >= bestm
        best = F.when(cond, F.lit(i)).otherwise(best)
        bestm = F.when(cond, F.col(f"m{i}")).otherwise(bestm)
    return state.select(
        "id",
        F.when(total == 0, F.lit(-1)).otherwise(best).cast("int").alias("pred"),
        *[F.col(f"m{i}") for i in range(n_labels)],
    )


def burt_constraint(
    edges: DataFrame,
    max_degree: int = 60,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Burt's network constraint (structural holes, Burt 1992/2004) on
    the induced subgraph of vertices with degree ≤ ``max_degree`` —
    the brokerage metric: constraint is HIGH when a vertex's contacts
    are redundant (all connected to each other), LOW when it bridges
    otherwise-disconnected groups.  Unweighted form: p_ij = 1/d_i,
    c_ij = (p_ij + Σ_q p_iq·p_qj)² over shared neighbors q, and
    C_i = Σ_{j∈N(i)} c_ij.

    INTEGER-EXACT algebra: p-terms are ``scale DIV d_i`` /
    ``scale DIV (d_i·d_q)`` BIGINTs summed per (i,j) (order- and
    partitioning-independent), squared at reduced precision
    ``((b DIV 1e3)² DIV 1e6)`` to stay inside int64, then summed per
    vertex — no float parity surface; the readable constraint is one
    final exact-integer division.  Plan: one wedge join (Σ d² bounded
    by the degree cutoff — the same hub-cutoff discipline as
    node-similarity) + one adjacency semi-join + two aggregations.

    Returns ``(id, d, c_scaled, c_r)``.  Reference posture: which
    dependency in the graph brokers between otherwise-separate
    clusters (the single point whose removal disconnects supply)."""
    sym = symmetrize(normalize_edges(edges)).where(F.col("src") != F.col("dst")).distinct()
    deg_full = sym.groupBy("src").agg(F.count("*").alias("d0"))
    keep = deg_full.where(F.col("d0") <= max_degree).select(F.col("src").alias("id"))
    e2 = (
        sym.join(keep.withColumnRenamed("id", "src"), "src")
        .join(keep.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    d = e2.groupBy("src").agg(F.count("*").alias("d"))
    iq = e2.select(F.col("src").alias("i"), F.col("dst").alias("q"))
    qj = e2.select(F.col("src").alias("q"), F.col("dst").alias("j"))
    wedge = iq.join(qj, "q").where(F.col("i") != F.col("j"))
    adj = e2.select(F.col("src").alias("i"), F.col("dst").alias("j"))
    closed = wedge.join(adj, ["i", "j"], "left_semi")
    di = d.select(F.col("src").alias("i"), F.col("d").alias("di"))
    dq = d.select(F.col("src").alias("q"), F.col("d").alias("dq"))
    ind = (
        closed.join(di, "i")
        .join(dq, "q")
        .select("i", "j", F.expr(f"{scale} div (di * dq)").alias("t"))
        .groupBy("i", "j")
        .agg(F.sum("t").alias("ts"))
    )
    base = (
        adj.join(di, "i")
        .join(ind, ["i", "j"], "left")
        .select(
            "i",
            "di",
            (
                F.expr(f"{scale} div di") + F.coalesce(F.col("ts"), F.lit(0))
            ).alias("b"),
        )
    )
    cij = F.expr("((b div 1000) * (b div 1000)) div 1000000")
    out = (
        base.select("i", "di", cij.alias("c"))
        .groupBy("i")
        .agg(F.first("di").alias("d"), F.sum("c").alias("c_scaled"))
    )
    return out.select(
        F.col("i").cast("long").alias("id"),
        F.col("d").cast("long").alias("d"),
        F.col("c_scaled").cast("long").alias("c_scaled"),
        F.round(F.col("c_scaled").cast("double") / F.lit(float(scale)), 6).alias("c_r"),
    )


def hitting_time(edges: DataFrame, targets: list[int], n_iter: int = 6) -> DataFrame:
    """Horizon-truncated expected hitting time to a landmark set by
    fixed-round value iteration on the absorbing random walk:
    ``h_0 ≡ 0``; ``h_{t+1}(v) = 0`` for v ∈ T, else
    ``1 + mean_{u ∈ N(v)} h_t(u)``.  After k rounds ``h_k(v) =
    E[min(τ_T, k)]`` — exact for walks absorbed within the horizon and
    a uniform lower bound otherwise, the distributable form of the
    absorbing-chain linear system (full absorption needs a solve; k
    join-aggregate rounds stream at any |E|).  The hitting-time family
    is the random-walk proximity the reference's graph queries motivate
    for dependency closeness (PageRank's additive dual).  Caller
    symmetrizes for undirected semantics; fixed rounds keep the
    arithmetic unrollable in ANSI SQL for the cross-engine oracle.
    Each round is one join-aggregate shuffle on the pre-partitioned
    edge table — the eigenvector_centrality plan shape."""
    e = _hard_cut(normalize_edges(edges))
    spark = edges.sparkSession
    verts = vertices_of(e)
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("double").alias("deg"))
        .localCheckpoint(eager=True)
    )
    if not deg.take(1):
        return spark.createDataFrame([], "id long, h double")
    t_set = [int(t) for t in targets]
    h = verts.select("id", F.lit(0.0).alias("h"))
    for _ in range(n_iter):
        s = (
            e.join(h.select(F.col("id").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("s"))
        )
        h = (
            deg.join(s, "id", "left")
            .select(
                "id",
                F.when(F.col("id").isin(t_set), F.lit(0.0))
                .otherwise(1.0 + F.coalesce(F.col("s"), F.lit(0.0)) / F.col("deg"))
                .alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    return h.select(F.col("id").cast("long"), "h")


def trophic_levels(edges: DataFrame, n_iter: int = 4, scale: int = 1_000_000) -> DataFrame:
    """Trophic levels (MacKay/Johnson/Jones flow-hierarchy analysis) of
    a directed graph by fixed-round Jacobi iteration on the defining
    linear system  h(v) = 1 + mean_{u ∈ in(v)} h(u),  basal vertices
    (no in-edges) pinned at h = 1.  On a DAG the iteration is exact for
    every vertex whose longest in-path is < n_iter (each round extends
    the resolved prefix one level, the dag_longest_path discipline).
    All arithmetic in integer micro-units: h₀ = scale everywhere,
    h' = scale + (Σ h_in) div indeg — positive operands so Spark DIV
    and DuckDB // agree, and the unrolled SQL oracle replays every bit.
    Each round is one join-aggregate shuffle on the pre-partitioned
    edge table; the level vector is the hierarchy/layering signal a
    dependency graph reads for build staging (reference graph queries:
    /root/reference/src/agents/graph/queries — layering family)."""
    e = _hard_cut(normalize_edges(edges))
    spark = edges.sparkSession
    verts = vertices_of(e)
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").cast("long").alias("indeg")
    )
    base = verts.join(indeg, "id", "left").select(
        "id", F.coalesce(F.col("indeg"), F.lit(0)).alias("indeg")
    ).localCheckpoint(eager=True)
    if not base.take(1):
        return spark.createDataFrame([], "id long, h_us long")
    h = base.select("id", F.lit(int(scale)).cast("long").alias("h"))
    for _ in range(n_iter):
        s = (
            e.join(h.select(F.col("id").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").cast("long").alias("s"))
        )
        h = (
            base.join(s, "id", "left")
            .select(
                "id",
                F.when(F.col("indeg") == 0, F.lit(int(scale)).cast("long"))
                .otherwise(
                    F.lit(int(scale))
                    + F.expr("s div indeg").cast("long")
                )
                .alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    return h.select(F.col("id").cast("long"), F.col("h").alias("h_us"))


def onion_layers(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard, Sci.
    Rep. 2016): the within-core peel structure that refines coreness.
    Round ℓ: raise the running core threshold k to the minimum current
    degree, remove EVERY vertex with degree ≤ k simultaneously — that
    batch is layer ℓ with coreness k.  Layer index separates a core's
    boundary from its bulk (same k-core, different depth), the
    centrality/robustness signal coreness alone can't see.  Exact,
    integer, deterministic; identical round structure to the SQL
    oracle's unroll.  Per round: one semi-join degree recount + one
    1-row min/count action — O(#layers) rounds, each linear in the
    remaining edge set (the kcore peel discipline).  Raises if the
    peel hasn't drained within ``max_rounds``."""
    e0 = normalize_edges(edges)
    und = (
        e0.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    sym = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    out_schema = "id long, layer long, core long"
    verts = sym.select(F.col("src").alias("id")).distinct().localCheckpoint(eager=True)
    if not verts.take(1):
        return spark.createDataFrame([], out_schema)
    rem_e = sym
    rem_v = verts
    k = 0
    assigned: DataFrame | None = None
    for layer in range(1, max_rounds + 1):
        deg = (
            rem_v.join(
                rem_e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d")),
                "id",
                "left",
            )
            .select("id", F.coalesce(F.col("d"), F.lit(0)).alias("d"))
            .localCheckpoint(eager=True)
        )
        row = deg.agg(F.min("d").alias("mn"), F.count("*").alias("n")).collect()[0]
        if row["n"] == 0:
            break
        k = max(k, int(row["mn"]))
        batch = deg.where(F.col("d") <= k).select(
            "id",
            F.lit(layer).cast("long").alias("layer"),
            F.lit(k).cast("long").alias("core"),
        ).localCheckpoint(eager=True)
        assigned = batch if assigned is None else assigned.unionByName(batch)
        bv = batch.select("id")
        rem_v = rem_v.join(bv, "id", "left_anti").localCheckpoint(eager=True)
        rem_e = (
            rem_e.join(bv.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(bv.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"onion_layers: peel not drained after {max_rounds} rounds")
    return assigned.select(
        F.col("id").cast("long"), F.col("layer"), F.col("core")
    )


def temporal_earliest_arrival(
    edges_t: DataFrame, seeds: list[int], n_iter: int = 4
) -> DataFrame:
    """Earliest-arrival time-respecting reachability (Wu et al., VLDB'14
    single-pass semantics, expressed as synchronous relaxation): an edge
    ``(u, v, t)`` is traversable iff ``t ≥ arr(u)``, and then
    ``arr(v) ← min(arr(v), t)``.  Seeds start at ``arr = 0``.  Each
    round relaxes every edge once (one join-aggregate shuffle), so k
    rounds cover every time-respecting path of ≤ k hops — the
    Bellman-Ford unroll discipline of betweenness_w, which keeps the
    recursion replayable round-for-round in ANSI SQL.  arr is an exact
    integer (days), so cross-engine parity has no float surface.
    Min-propagation is monotone: rounds past the fixpoint are no-ops.
    Input: ``(src, dst, t)`` with integer t ≥ 0."""
    spark = edges_t.sparkSession
    e = _hard_cut(
        edges_t.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), F.col("t").cast("long")
        )
        .dropDuplicates(["src", "dst", "t"])
    )
    arr = spark.createDataFrame([(int(s), 0) for s in seeds], "id long, arr long")
    for _ in range(n_iter):
        cand = (
            e.join(arr.select(F.col("id").alias("src"), F.col("arr").alias("au")), "src")
            .where(F.col("t") >= F.col("au"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("t").alias("arr"))
        )
        arr = (
            arr.unionByName(cand)
            .groupBy("id")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=False)
        )
    return arr.select(F.col("id").cast("long"), F.col("arr").cast("long"))


def fiedler_vector(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """Fiedler-direction estimate (the spectral-bisection axis) by
    deflated power iteration on ``M = cI − L`` with ``c = d_max + 1``:
    M's top eigenvector is the constant (deflated by re-centering every
    round), so the iterate converges toward the eigenvector of the
    SECOND-smallest Laplacian eigenvalue — the classic spectral
    partitioning direction (Fiedler 1973).  Deterministic non-constant
    start x₀ ∝ center(id); each round is one join-aggregate shuffle
    plus two 1-row broadcast scalars (mean, L2 norm) — the
    eigenvector_centrality plan shape.  Fixed rounds keep the
    arithmetic unrollable in ANSI SQL for the cross-engine oracle.
    Caller symmetrizes.  Returns ``(id, f)``; sign is determined by the
    deterministic start, not meaningful on its own."""
    e = _hard_cut(normalize_edges(edges))
    spark = edges.sparkSession
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("double").alias("deg"))
        .localCheckpoint(eager=True)
    )
    if not deg.take(1):
        return spark.createDataFrame([], "id long, f double")
    c = float(deg.agg(F.max("deg")).collect()[0][0]) + 1.0

    def _center_normalize(y: DataFrame) -> DataFrame:
        stats = F.broadcast(y.agg(F.avg("y").alias("_m")))
        z = y.crossJoin(stats).select("id", (F.col("y") - F.col("_m")).alias("z"))
        nrm = F.broadcast(z.agg(F.sqrt(F.sum(F.col("z") * F.col("z"))).alias("_n")))
        return z.crossJoin(nrm).select("id", (F.col("z") / F.col("_n")).alias("x"))

    x = _center_normalize(deg.select("id", F.col("id").cast("double").alias("y")))
    x = x.localCheckpoint(eager=False)
    for _ in range(n_iter):
        s = (
            e.join(x.select(F.col("id").alias("src"), "x"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("s"))
        )
        y = (
            deg.join(x, "id")
            .join(s, "id", "left")
            .select(
                "id",
                (
                    (F.lit(c) - F.col("deg")) * F.col("x")
                    + F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("y"),
            )
        )
        x = _center_normalize(y).localCheckpoint(eager=False)
    return x.select(F.col("id").cast("long"), F.col("x").alias("f"))


def influence_seeds(edges: DataFrame, k: int = 5) -> DataFrame:
    """Greedy influence-maximization seed selection by single discount
    (Chen-Wang-Yang, KDD'09 "DegreeDiscount" family, the degree-only
    variant): pick the highest-degree vertex, then repeatedly the
    vertex maximizing ``deg(v) − |chosen ∩ N(v)|`` — discounting edges
    already "spent" on earlier seeds, which beats plain top-k-degree
    because hub neighborhoods overlap.  Integer arithmetic end-to-end;
    ties break on vertex id, so selection is total-ordered and the SQL
    oracle replays it round-for-round.  Each of the k rounds is one
    semi-join discount aggregate plus a global top-1 (TakeOrdered — no
    driver-side loop over collect()ed data).  Caller symmetrizes.
    Returns ``(rank, id, dd)`` for the k seeds."""
    e = _hard_cut(normalize_edges(edges))
    spark = edges.sparkSession
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    chosen = spark.createDataFrame([], "id long, rank long, dd long")
    if not deg.take(1):
        return chosen.select("rank", "id", "dd")
    for i in range(1, k + 1):
        t = (
            e.join(chosen.select(F.col("id").alias("dst")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").cast("long").alias("t"))
        )
        cand = (
            deg.join(chosen.select("id"), "id", "left_anti")
            .join(t, "id", "left")
            .select(
                "id", (F.col("deg") - F.coalesce(F.col("t"), F.lit(0))).alias("dd")
            )
        )
        pick = (
            cand.orderBy(F.desc("dd"), F.asc("id"))
            .limit(1)
            .select("id", F.lit(i).cast("long").alias("rank"), "dd")
        )
        chosen = chosen.unionByName(pick).localCheckpoint(eager=True)
    return chosen.select("rank", "id", "dd")


def edge_common_neighbors(und: DataFrame) -> DataFrame:
    """Per-edge common-neighbor counts ``(u, v, cn)`` for a canonical
    (src < dst) undirected edge table, by degree-ordered triangle
    enumeration: cn(u,v) = number of triangles through the edge, and
    each triangle is found exactly once from its lowest-(degree, id)
    apex, then credited to its three canonical edges.  Replaces the
    u-keyed wedge join whose intermediate is Σ_u d(u)² rows (~143M on
    the sf0.1 co-order graph) with the Σ_v d_out(v)² oriented wedge
    table, d_out ≤ √(2m) — the triangle_count orientation applied to
    the per-EDGE statistic (guide §2.3).  Edges in no triangle are
    absent (callers coalesce to 0)."""
    sym = symmetrize(und)
    deg = sym.groupBy(F.col("src").alias("x")).agg(F.count("*").alias("d"))
    rank = F.struct(F.col("d"), F.col("x").alias("_i"))
    dd = deg.select(F.col("x"), rank.alias("r"))
    oriented = (
        und.join(dd.select(F.col("x").alias("src"), F.col("r").alias("rs")), "src")
        .join(dd.select(F.col("x").alias("dst"), F.col("r").alias("rd")), "dst")
        .select(
            F.when(F.col("rs") < F.col("rd"), F.col("src")).otherwise(F.col("dst")).alias("a"),
            F.when(F.col("rs") < F.col("rd"), F.col("dst")).otherwise(F.col("src")).alias("b"),
        )
    )
    oriented = _hard_cut(oriented)
    w1 = oriented.select(F.col("a"), F.col("b").alias("p"))
    w2 = oriented.select(F.col("a"), F.col("b").alias("q"))
    tri = (
        w1.join(w2, "a")
        .where(F.col("p") < F.col("q"))
        .join(und.select(F.col("src").alias("p"), F.col("dst").alias("q")), ["p", "q"], "left_semi")
    )
    return (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.least("a", "p").alias("u"), F.greatest("a", "p").alias("v")),
                    F.struct(F.least("a", "q").alias("u"), F.greatest("a", "q").alias("v")),
                    F.struct(F.col("p").alias("u"), F.col("q").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )


def scan_clusters(
    edges: DataFrame,
    eps_num: int = 7,
    eps_den: int = 10,
    mu: int = 3,
) -> DataFrame:
    """SCAN structural clustering (Xu et al., KDD'07): vertices whose
    ε-neighborhood (closed structural similarity σ(u,v) =
    (|N(u)∩N(v)| + 2) / √((d(u)+1)(d(v)+1)) ≥ ε) has ≥ μ members are
    CORES; clusters are connected components of core–core σ-edges;
    non-cores σ-adjacent to a core are BORDER, the rest OUTLIER — the
    community paradigm that, unlike modularity methods, explicitly
    separates hubs/noise from communities.  The ε-screen is exact
    integer cross-multiplication ((cn+2)²·den² ≥ num²·(du+1)(dv+1)) —
    no float anywhere, so the SQL oracle replays it bit-for-bit.  Plan:
    one wedge join for per-edge common neighbors (the triangle-count
    shape), one degree aggregate, hash-min components on the (much
    smaller) core subgraph.  Cluster id = min vertex id in the
    component; outliers carry cluster −1.  Caller may pass either
    orientation; edges are symmetrized internally."""
    spark = edges.sparkSession
    sym = _hard_cut(symmetrize(normalize_edges(edges)))
    if not sym.take(1):
        return spark.createDataFrame([], "id long, role string, cluster long")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    und = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    # oriented-triangle per-edge counts instead of the Σd² wedge join
    cn = edge_common_neighbors(
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    sig = (
        und.join(cn, ["u", "v"], "left")
        .join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dv")), "v")
        .where(
            (F.coalesce(F.col("cn"), F.lit(0)) + 2)
            * (F.coalesce(F.col("cn"), F.lit(0)) + 2)
            * F.lit(eps_den * eps_den)
            >= F.lit(eps_num * eps_num) * (F.col("du") + 1) * (F.col("dv") + 1)
        )
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    ssym = sig.unionByName(sig.select(F.col("v").alias("u"), F.col("u").alias("v")))
    core = (
        ssym.groupBy(F.col("u").alias("id"))
        .agg(F.count("*").alias("c"))
        .where(F.col("c") + 1 >= mu)
        .select("id")
        .localCheckpoint(eager=True)
    )
    core_edges = (
        ssym.join(core.select(F.col("id").alias("u")), "u")
        .join(core.select(F.col("id").alias("v")), "v")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    comp, _stats = connected_components(core_edges)
    core_comp = core.join(comp, "id", "left").select(
        "id", F.coalesce(F.col("comp"), F.col("id")).cast("long").alias("cluster")
    )
    border = (
        ssym.join(
            core_comp.select(F.col("id").alias("v"), "cluster"), "v"
        )
        .join(core.select(F.col("id").alias("u")), "u", "left_anti")
        .groupBy(F.col("u").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    verts = vertices_of(sym)
    return (
        verts.join(core_comp.withColumn("role", F.lit("core")), "id", "left")
        .join(
            border.withColumnRenamed("cluster", "b_cluster").withColumn(
                "b_role", F.lit("border")
            ),
            "id",
            "left",
        )
        .select(
            F.col("id").cast("long"),
            F.coalesce(F.col("role"), F.col("b_role"), F.lit("outlier")).alias("role"),
            F.coalesce(F.col("cluster"), F.col("b_cluster"), F.lit(-1))
            .cast("long")
            .alias("cluster"),
        )
    )


def edge_betweenness_landmarks(
    edges: DataFrame,
    landmarks: list[int],
    max_depth: int = 4,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Bounded-depth EDGE betweenness from a landmark set — the
    Girvan-Newman centrality (edges with high betweenness are the
    inter-community bridges; iteratively removing the max is the GN
    community algorithm).  Identical forward σ sweep and backward δ
    recursion as :func:`betweenness_landmarks`; the per-edge score is
    the Brandes backward term BEFORE vertex aggregation:
    c(u→w) = σ(u)/σ(w) · (1 + δ(w)) summed over sources, folded onto
    the canonical undirected edge (min, max).  Unlike the vertex form,
    edges incident to the source DO contribute (level-0 rows are
    included).  Returns ``(u, v, eb)`` for every undirected edge."""
    spark = edges.sparkSession
    sym0 = symmetrize(normalize_edges(edges)).persist()
    m0 = sym0.count()
    if m0 == 0:
        sym0.unpersist()
        return (
            spark.createDataFrame([], "u long, v long, eb double"),
            IterationStats(algorithm="edge_betweenness", edges=0, vertices=0, converged=True),
        )
    shuffle = _auto_partitions(spark, m0, num_partitions)
    with _shuffle_conf(spark, shuffle):
        e = _hard_cut(sym0.repartition(shuffle, "src"))
        und = e.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
        sym0.unpersist()
        stats = IterationStats(algorithm="edge_betweenness", edges=m0)
        levels: list[DataFrame] = [
            spark.createDataFrame(
                [(int(s), int(s), 1) for s in landmarks], "source long, id long, sigma long"
            ).localCheckpoint(eager=True)
        ]
        visited = levels[0].select("source", "id")
        for _d in range(1, max_depth + 1):
            t0 = time.monotonic()
            nxt = (
                e.join(levels[-1].withColumnRenamed("id", "src"), "src")
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(visited, ["source", "id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.count() == 0:
                break
            levels.append(nxt)
            visited = visited.unionByName(nxt.select("source", "id")).localCheckpoint(
                eager=True
            )
            stats.iterations += 1
            stats.iter_seconds.append(time.monotonic() - t0)
        deep = len(levels) - 1
        delta = levels[deep].select("source", "id", F.lit(0.0).alias("delta"))
        edge_acc: DataFrame | None = None
        for d in range(deep - 1, -1, -1):
            t0 = time.monotonic()
            succ = delta.join(
                levels[d + 1].select("source", "id", F.col("sigma").alias("sigma_w")),
                ["source", "id"],
            ).select(
                "source", F.col("id").alias("dst"), "sigma_w", F.col("delta").alias("delta_w")
            )
            per_edge = (
                levels[d]
                .withColumnRenamed("id", "src")
                .join(e, "src")
                .join(succ, ["source", "dst"])
                .select(
                    "source",
                    "src",
                    "dst",
                    (
                        F.col("sigma").cast("double")
                        / F.col("sigma_w").cast("double")
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("c"),
                )
                .localCheckpoint(eager=True)
            )
            edge_acc = (
                per_edge if edge_acc is None else edge_acc.unionByName(per_edge)
            )
            contrib = per_edge.groupBy("source", F.col("src").alias("id")).agg(
                F.sum("c").alias("delta")
            )
            delta = (
                levels[d]
                .select("source", "id")
                .join(contrib, ["source", "id"], "left")
                .select("source", "id", F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"))
                .localCheckpoint(eager=True)
            )
            stats.iter_seconds.append(time.monotonic() - t0)
        stats.converged = True
        if edge_acc is None:
            eb = und.select("u", "v", F.lit(0.0).alias("eb"))
        else:
            per_und = (
                edge_acc.select(
                    F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"),
                    "c",
                )
                .groupBy("u", "v")
                .agg(F.sum("c").alias("eb"))
            )
            eb = und.join(per_und, ["u", "v"], "left").select(
                "u", "v", F.coalesce(F.col("eb"), F.lit(0.0)).alias("eb")
            )
        return eb.select(F.col("u").cast("long"), F.col("v").cast("long"), "eb"), stats


def coarsen_hem(
    wedges: DataFrame, max_iter: int = 60
) -> tuple[DataFrame, DataFrame, IterationStats]:
    """One level of heavy-edge-matching graph coarsening (the METIS /
    multilevel-partitioning primitive, Karypis-Kumar 1998): compute a
    maximal matching that greedily prefers HEAVY edges — every free
    vertex points at its max-weight incident edge ((w desc, a, b)
    total order, so the run is deterministic and SQL-replayable),
    mutual proposals match — then contract each matched pair into a
    supervertex labeled min(a, b) and re-aggregate edge weights
    (parallel coarse edges sum, self-loops drop).  Coarsening halves
    the graph while preserving heavy structure, which is why the
    matching must be weight-greedy rather than random.  All-integer
    arithmetic.  Input ``(src, dst, w)`` in either orientation
    (parallel inputs sum).  Returns ``(coarse_edges(u, v, w),
    mapping(id, super), stats)``; raises if ``max_iter`` mutual-
    proposal rounds leave edges standing."""
    spark = wedges.sparkSession
    und = (
        wedges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("w").cast("long").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    stats = IterationStats(algorithm="coarsen_hem")
    if not und.take(1):
        empty_e = spark.createDataFrame([], "u long, v long, w long")
        empty_m = spark.createDataFrame([], "id long, super long")
        stats.converged = True
        return empty_e, empty_m, stats
    e = und
    stats.edges = e.count()
    matched = spark.createDataFrame([], "a long, b long")
    from pyspark.sql.window import Window as _W

    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        inc = e.select(F.col("a").alias("v"), "a", "b", "w").unionByName(
            e.select(F.col("b").alias("v"), "a", "b", "w")
        )
        win = _W.partitionBy("v").orderBy(F.desc("w"), F.asc("a"), F.asc("b"))
        top = (
            inc.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("v", "a", "b")
        )
        sel = (
            top.groupBy("a", "b")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") == 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_sel = sel.count()
        matched = matched.unionByName(sel).localCheckpoint(eager=True)
        mv = sel.select(F.col("a").alias("v")).unionByName(
            sel.select(F.col("b").alias("v"))
        )
        e = (
            e.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b", "w")
            .localCheckpoint(eager=True)
        )
        m = e.count()
        stats.iterations = it
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.deltas.append(float(n_sel))
        if m == 0:
            stats.converged = True
            break
    if not stats.converged:
        raise RuntimeError(f"coarsen_hem left {m} edges after {max_iter} rounds")
    verts = und.select(F.col("a").alias("id")).unionByName(
        und.select(F.col("b").alias("id"))
    ).distinct()
    pair_map = matched.select(F.col("a").alias("id"), F.col("a").alias("super")).unionByName(
        matched.select(F.col("b").alias("id"), F.col("a").alias("super"))
    )
    mapping = (
        verts.join(pair_map, "id", "left")
        .select("id", F.coalesce(F.col("super"), F.col("id")).cast("long").alias("super"))
        .localCheckpoint(eager=True)
    )
    coarse = (
        und.join(mapping.select(F.col("id").alias("a"), F.col("super").alias("sa")), "a")
        .join(mapping.select(F.col("id").alias("b"), F.col("super").alias("sb")), "b")
        .where(F.col("sa") != F.col("sb"))
        .select(
            F.least("sa", "sb").alias("u"),
            F.greatest("sa", "sb").alias("v"),
            "w",
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    return (
        coarse.select(F.col("u").cast("long"), F.col("v").cast("long"), F.col("w").cast("long")),
        mapping.select(F.col("id").cast("long"), "super"),
        stats,
    )


def odd_closed_walks(
    edges: DataFrame,
    max_len: int = 9,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Shortest ODD closed walk through each vertex via the bipartite
    double cover: vertex ``(v, parity)`` is encoded as ``2v + parity``;
    every undirected edge ``(u, v)`` lifts to ``(2u, 2v+1)`` and
    ``(2u+1, 2v)``, and the cover distance ``d((v,0), (v,1))`` equals
    the length of the shortest odd closed walk through ``v`` — finite
    iff ``v``'s component is non-bipartite (3 exactly when ``v`` lies on
    a triangle), the per-vertex bipartiteness-violation depth read next
    to :func:`bipartite_report`.  One keyed multi-source BFS
    (:func:`bfs_per_source`) bounded at ``max_len``; vertices with no
    odd walk within the bound are omitted.  Seeds collect the vertex
    set to the driver — intended for bounded audit subgraphs (the
    registered query caps the graph), not the 10^9-vertex path."""
    und = symmetrize(normalize_edges(edges))
    cover = und.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    ).unionByName(
        und.select((F.col("src") * 2 + 1).alias("src"), (F.col("dst") * 2).alias("dst"))
    )
    verts = sorted(r[0] for r in vertices_of(und).collect())
    dist, stats = bfs_per_source(
        cover,
        [2 * int(v) for v in verts],
        max_depth=max_len,
        num_partitions=num_partitions,
    )
    out = dist.where(F.col("id") == F.col("source") + 1).select(
        (F.col("source") / 2).cast("long").alias("id"),
        F.col("dist").cast("long").alias("odd_len"),
    )
    return out, stats


def four_node_census(
    edges: DataFrame,
    num_partitions: int | None = None,
) -> DataFrame:
    """Complete INDUCED 4-node graphlet census (the connected classes:
    path P4, claw K1,3, paw = triangle+pendant, cycle C4, diamond =
    K4−e, clique K4) via the closed-form aggregate inversion used by
    PGD/ESCAPE (Ahmed et al. ICDM'15; Pinar et al. WWW'17) instead of
    subgraph enumeration: every non-induced count is a degree /
    triangle / edge-support / codegree aggregate —

      wedges   = Σ_v C(d_v,2)            claw_ni = Σ_v C(d_v,3)
      p4_ni    = Σ_e (d_u−1)(d_v−1) − 3T paw_ni  = Σ_v t_v·(d_v−2)
      diam_ni  = Σ_e C(sup_e,2)          c4_ni   = ½ Σ_{u<v} C(codeg,2)

    and the induced counts follow by Möbius inversion over the
    containment lattice (K4 ⊃ diamond ⊃ {C4, paw} ⊃ {P4, claw}):
      i_k4 = k4                i_diamond = diam_ni − 6·k4
      i_c4 = c4_ni − i_diamond − 3·k4
      i_paw = paw_ni − 4·i_diamond − 12·k4
      i_claw = claw_ni − i_paw − 2·i_diamond − 4·k4
      i_p4 = p4_ni − 4·i_c4 − 2·i_paw − 6·i_diamond − 12·k4

    Everything is exact BIGINT arithmetic over id-ordered triangle /
    clique joins (each subgraph found once), so the SQL oracle replays
    it bit-for-bit.  Cost is the triangle-join + codegree-pair cost —
    the scalable census shape (no 4-subset enumeration)."""
    und = _hard_cut(
        symmetrize(normalize_edges(edges)).where(F.col("src") < F.col("dst"))
    )
    spark = und.sparkSession
    sym = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").cast("long").alias("d"))

    # canonical triangles (a < b < c), each exactly once
    ab = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"]).localCheckpoint(eager=True)

    tv = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("t"))
    )
    sup = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("s"))
    )
    # K4: canonical triangle + fourth vertex d > c adjacent to a, b, c
    cd = und.select(F.col("src").alias("c"), F.col("dst").alias("d"))
    bd = und.select(F.col("src").alias("b"), F.col("dst").alias("d"))
    ad = und.select(F.col("src").alias("a"), F.col("dst").alias("d"))
    k4 = (
        tri.join(cd, "c").join(bd, ["b", "d"]).join(ad, ["a", "d"]).count()
    )
    # codegree pairs via id-ordered wedge enumeration (u < v sharing w)
    wl = sym.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    wr = sym.select(F.col("dst").alias("w"), F.col("src").alias("v"))
    codeg = (
        wl.join(wr, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("c"))
    )

    d_stats = deg.agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("d") / 2).cast("long").alias("m"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("wedges"),
        F.sum(
            F.col("d") * (F.col("d") - 1) * (F.col("d") - 2) / 6
        ).cast("long").alias("claw_ni"),
    ).collect()[0]
    t_total = tri.count()
    paw_ni = (
        tv.join(deg.withColumnRenamed("src", "v"), "v")
        .agg(F.sum(F.col("t") * (F.col("d") - 2)).cast("long").alias("x"))
        .collect()[0]["x"]
        or 0
    )
    diam_ni = (
        sup.agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).cast("long").alias("x"))
        .collect()[0]["x"]
        or 0
    )
    p4_walks = (
        und.join(deg.withColumnRenamed("src", "u_").alias("du"), F.col("src") == F.col("u_"))
        .join(
            deg.withColumnRenamed("src", "v_").withColumnRenamed("d", "d2").alias("dv"),
            F.col("dst") == F.col("v_"),
        )
        .agg(F.sum((F.col("d") - 1) * (F.col("d2") - 1)).cast("long").alias("x"))
        .collect()[0]["x"]
        or 0
    )
    p4_ni = int(p4_walks) - 3 * int(t_total)
    c4_ni = int(
        (
            codeg.agg(
                (F.sum(F.col("c") * (F.col("c") - 1) / 2) / 2).cast("long").alias("x")
            ).collect()[0]["x"]
            or 0
        )
    )
    i_k4 = int(k4)
    i_diamond = int(diam_ni) - 6 * i_k4
    i_c4 = c4_ni - i_diamond - 3 * i_k4
    i_paw = int(paw_ni) - 4 * i_diamond - 12 * i_k4
    i_claw = int(d_stats["claw_ni"]) - i_paw - 2 * i_diamond - 4 * i_k4
    i_p4 = p4_ni - 4 * i_c4 - 2 * i_paw - 6 * i_diamond - 12 * i_k4
    und.unpersist()
    tri.unpersist()
    return spark.createDataFrame(
        [
            (
                int(d_stats["n"]),
                int(d_stats["m"]),
                int(d_stats["wedges"]),
                int(t_total),
                i_p4,
                i_claw,
                i_paw,
                i_c4,
                i_diamond,
                i_k4,
            )
        ],
        "n long, m long, wedges long, triangles long, i_p4 long, i_claw long,"
        " i_paw long, i_c4 long, i_diamond long, i_k4 long",
    )


def local_bridges(
    edges: DataFrame,
    max_span: int = 8,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Local bridges with span (Granovetter; Easley-Kleinberg ch. 3):
    an edge (u, v) is a LOCAL BRIDGE iff its endpoints share no common
    neighbor (triangle support 0 — embeddedness 0), and its span is the
    u→v distance once the edge itself is removed (≥ 3 by definition;
    the higher the span, the more the tie brokers).  Support comes from
    the id-ordered triangle join; spans come from ONE keyed BFS — state
    ``(bu, bv, id, dist)``, every bridge advancing simultaneously, the
    excluded edge carried in the key so each key relaxes over G − e —
    bounded at ``max_span`` rounds.  Returns (u, v, span) with span −1
    when u and v are further than ``max_span`` apart (or disconnected)
    after removal."""
    und0 = _hard_cut(
        symmetrize(normalize_edges(edges)).where(F.col("src") < F.col("dst"))
    )
    spark = und0.sparkSession
    sym = _hard_cut(
        und0.unionByName(
            und0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    ab = und0.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = und0.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = und0.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    sup = (
        tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
        .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
        .distinct()
    )
    bridges = und0.join(sup, ["src", "dst"], "left_anti").select(
        F.col("src").alias("bu"), F.col("dst").alias("bv")
    ).localCheckpoint(eager=True)
    stats = IterationStats(algorithm="local_bridges", edges=sym.count() // 2)
    # pinned partitions + AQE off, sized to the (often tiny, cap-bounded)
    # graph: the keyed BFS at session partitions pays ~20 rounds of
    # 32-task stages over a few-hundred-edge graph — pure scheduling
    frontier = bridges.select("bu", "bv", F.col("bu").alias("id"), F.lit(0).alias("dist"))
    visited = frontier.localCheckpoint(eager=True)
    found = None
    frontier = visited
    # fused chunks (the core_numbers discipline): BFS depths chain
    # lazily, one frontier-count action per chunk.  An empty frontier
    # makes every later depth a no-op, so the chunk's LAST step being
    # empty is a sound drain test — identical spans, at most chunk-1
    # empty joins run past the drain.
    with _shuffle_conf(
        spark, _auto_partitions(spark, stats.edges * 2, num_partitions)
    ):
        depth = 0
        while depth < max_span:
            chunk = min(4, max_span - depth)
            step = None
            for _ in range(chunk):
                depth += 1
                step = (
                    frontier.join(sym.withColumnRenamed("src", "id"), "id")
                    .where(
                        ~(
                            ((F.col("id") == F.col("bu")) & (F.col("dst") == F.col("bv")))
                            | ((F.col("id") == F.col("bv")) & (F.col("dst") == F.col("bu")))
                        )
                    )
                    # dist+1 from the carried frontier column (not
                    # F.lit(depth)): every round's plan is then
                    # TEXTUALLY identical, so whole-stage codegen
                    # compiles once and every later round hits the cache
                    .select(
                        "bu", "bv", F.col("dst").alias("id"),
                        (F.col("dist") + F.lit(1)).alias("dist"),
                    )
                    .dropDuplicates(["bu", "bv", "id"])
                    .join(visited.select("bu", "bv", "id"), ["bu", "bv", "id"], "left_anti")
                    .localCheckpoint(eager=False)
                )
                visited = visited.unionByName(step).localCheckpoint(eager=False)
                frontier = step
            n = step.count()
            stats.iterations = depth
            stats.deltas.append(float(n))
            if n == 0:
                stats.converged = True
                break
            visited = visited.localCheckpoint(eager=True)
    found = visited.where(F.col("id") == F.col("bv")).select(
        "bu", "bv", F.col("dist").alias("span")
    )
    out = (
        bridges.join(found, ["bu", "bv"], "left")
        .select(
            F.col("bu").cast("long").alias("u"),
            F.col("bv").cast("long").alias("v"),
            F.coalesce(F.col("span"), F.lit(-1)).cast("long").alias("span"),
        )
    )
    und0.unpersist()
    return out, stats


def articulation_points(
    edges: DataFrame,
    max_rounds: int = 40,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Articulation points (cut vertices) — the vertex analog of the
    bridge test behind `two_edge_cc`: v is an articulation point iff
    its neighbors fall into ≥ 2 components of G − v, i.e. removing v
    disconnects part of its component.  Exact, via ONE simultaneous
    keyed BFS: every degree-≥2 vertex v is a key, state ``(v, id)``
    seeded at v's MINIMUM neighbor, each key relaxing over G − v (the
    excluded VERTEX carried in the key, the `local_bridges` shape with
    the exclusion on the endpoint instead of the edge); run to
    convergence (raises if the frontier didn't drain — never reports
    from a truncated BFS).  v is articulation iff some neighbor was
    never reached.  Working set Σ_v |comp(v)| — intended for bounded
    subgraphs (the `graph_center` posture); at corpus scale run it on
    the community/backbone subgraph that scoping pass produced.

    Returns ``(df, stats)`` with df = (id, n_nbrs, reached_nbrs,
    is_articulation) over all degree-≥2 candidates.
    """
    und0 = _hard_cut(
        symmetrize(normalize_edges(edges)).where(F.col("src") < F.col("dst"))
    )
    sym = _hard_cut(
        und0.unionByName(
            und0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    nbrs = sym.select(F.col("src").alias("v"), F.col("dst").alias("nbr"))
    deg = nbrs.groupBy("v").agg(
        F.count("*").cast("long").alias("n_nbrs"), F.min("nbr").alias("x0")
    )
    cand = deg.where(F.col("n_nbrs") >= 2).localCheckpoint(eager=True)
    stats = IterationStats(algorithm="articulation_points", edges=sym.count() // 2)
    visited = cand.select("v", F.col("x0").alias("id")).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_rounds + 1):
        step = (
            frontier.join(sym.withColumnRenamed("src", "id"), "id")
            .where(F.col("dst") != F.col("v"))
            .select("v", F.col("dst").alias("id"))
            .dropDuplicates(["v", "id"])
            .join(visited, ["v", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        n = step.count()
        stats.iterations = depth
        stats.deltas.append(float(n))
        if n == 0:
            stats.converged = True
            break
        # lazy: the next round's frontier count materializes it
        visited = visited.unionByName(step).localCheckpoint(eager=False)
        frontier = step
    if not stats.converged:
        raise RuntimeError(
            f"articulation_points: BFS not drained after {max_rounds} rounds"
        )
    reached = (
        nbrs.join(cand.select("v"), "v")
        .join(
            visited.withColumnRenamed("id", "nbr"), ["v", "nbr"], "left_semi"
        )
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("reached_nbrs"))
    )
    out = (
        cand.join(reached, "v", "left")
        .select(
            F.col("v").cast("long").alias("id"),
            "n_nbrs",
            F.coalesce("reached_nbrs", F.lit(0)).cast("long").alias("reached_nbrs"),
            (F.coalesce("reached_nbrs", F.lit(0)) < F.col("n_nbrs")).alias(
                "is_articulation"
            ),
        )
    )
    und0.unpersist()
    return out, stats


def clique_percolation3(edges: DataFrame) -> DataFrame:
    """3-clique percolation communities (Palla et al., Nature 2005):
    connected components of the triangle-adjacency graph (triangles
    adjacent iff they share an edge); a vertex belongs to every
    community whose triangles contain it — the OVERLAPPING community
    model.  Triangle vertex key a·2⁴² + b·2²¹ + c is exact for ids
    < 2²¹ (swap in a `compact_ids` surrogate beyond that); adjacency
    cost is Σ_e t_e², so screen the input (weight/truss) first at
    corpus scale.  Returns (comm, vertex) membership pairs, comm = the
    minimum member-triangle key."""
    # und/tri materialized once: und is referenced by three join arms
    # and tri by the incidence union + the final membership join, each
    # consumed by several actions (the CC run, the final collect) — the
    # cuts stop the caller's backbone build re-running per action
    und = _hard_cut(
        symmetrize(normalize_edges(edges)).where(F.col("src") < F.col("dst"))
    )
    a = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    b_ = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    c_ = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    k = F.lit(1 << 21)
    tri = (
        a.join(b_, "b")
        .join(c_, ["a", "c"])
        .select(
            "a",
            "b",
            "c",
            (F.col("a") * k * k + F.col("b") * k + F.col("c")).alias("tid"),
        )
    )
    tri = _hard_cut(tri)
    em = (
        tri.select("tid", (F.col("a") * k + F.col("b")).alias("ek"))
        .unionByName(tri.select("tid", (F.col("a") * k + F.col("c")).alias("ek")))
        .unionByName(tri.select("tid", (F.col("b") * k + F.col("c")).alias("ek")))
    )
    te = (
        em.alias("x")
        .join(em.alias("y"), "ek")
        .where(F.col("x.tid") < F.col("y.tid"))
        .select(F.col("x.tid").alias("src"), F.col("y.tid").alias("dst"))
    )
    comp, _ = connected_components(te)
    lab = (
        tri.select("tid")
        .distinct()
        .join(comp.withColumnRenamed("id", "tid"), "tid", "left")
        .select("tid", F.coalesce("comp", F.col("tid")).alias("comm"))
    )
    return (
        tri.join(lab, "tid")
        .select("comm", F.explode(F.array("a", "b", "c")).alias("vertex"))
        .distinct()
        .select(F.col("comm").cast("long"), F.col("vertex").cast("long"))
    )


def b_matching(
    edges: DataFrame, b: int = 2, max_iter: int = 60
) -> tuple[DataFrame, IterationStats]:
    """Greedy maximal b-matching: like :func:`maximal_matching` but
    every vertex may take up to ``b`` incident matched edges — the
    degree-constrained subgraph primitive behind peer sampling /
    overlay construction (each node keeps its b best partners).  Same
    deterministic xorshift edge priorities and mutual-proposal rounds;
    a round's eligible set is the remaining edges whose BOTH endpoints
    still have spare capacity, so the globally highest-priority
    eligible edge is always selected (progress guarantee), and rounds
    past the fixpoint are no-ops (a SQL oracle may unroll extra
    rounds).  Returns ``((a, b) selected pairs, stats)``; raises if
    ``max_iter`` rounds leave eligible edges standing."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    stats = IterationStats(algorithm="b_matching")
    spark = edges.sparkSession
    if und.rdd.isEmpty():
        return spark.createDataFrame([], "a long, b long"), stats
    key = F.col("a") * F.lit(2**31) + F.col("b")
    x0 = (key % F.lit(2**31)).bitwiseXOR(F.shiftright(key, 31) % F.lit(2**31))
    x1 = (x0 * F.lit(2654435761)) % F.lit(2**31)
    x2 = (x1.bitwiseXOR(F.shiftright(x1, 13)) * F.lit(1274126177)) % F.lit(2**31)
    e = und.select(
        "a", "b", x2.bitwiseXOR(F.shiftright(x2, 17)).alias("p")
    ).localCheckpoint(eager=True)
    stats.edges = e.count()
    matched = spark.createDataFrame([], "a long, b long")
    from pyspark.sql.window import Window as _W

    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        used = (
            matched.select(F.col("a").alias("v"))
            .unionByName(matched.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("u"))
        )
        elig = (
            e.join(used.withColumnRenamed("v", "a").withColumnRenamed("u", "ua"), "a", "left")
            .join(used.withColumnRenamed("v", "b").withColumnRenamed("u", "ub"), "b", "left")
            .where(
                (F.coalesce("ua", F.lit(0)) < b) & (F.coalesce("ub", F.lit(0)) < b)
            )
            .select("a", "b", "p")
            .localCheckpoint(eager=True)
        )
        m = elig.count()
        stats.iterations = it
        if m == 0:
            stats.converged = True
            stats.iter_seconds.append(time.monotonic() - t0)
            stats.deltas.append(0.0)
            break
        inc = elig.select(F.col("a").alias("v"), "a", "b", "p").unionByName(
            elig.select(F.col("b").alias("v"), "a", "b", "p")
        )
        w = _W.partitionBy("v").orderBy(F.desc("p"), F.asc("a"), F.asc("b"))
        top = (
            inc.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("v", "a", "b")
        )
        sel = (
            top.groupBy("a", "b")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") == 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_sel = sel.count()
        matched = matched.unionByName(sel).localCheckpoint(eager=True)
        e = (
            e.join(sel, ["a", "b"], "left_anti")
            .select("a", "b", "p")
            .localCheckpoint(eager=True)
        )
        stats.iter_seconds.append(time.monotonic() - t0)
        stats.deltas.append(float(n_sel))
    if not stats.converged:
        raise RuntimeError(f"b_matching left eligible edges after {max_iter} rounds")
    return matched, stats


def biconnected_components(
    edges: DataFrame,
    max_rounds: int = 60,
) -> tuple[DataFrame, IterationStats]:
    """Biconnected components (blocks) — the third member of the
    connectivity family next to bridges (`two_edge_cc`) and cut
    vertices (`articulation_points`): the edge partition into maximal
    subgraphs with no internal cut vertex; a bridge is exactly a
    1-edge block.  Distributed form of the classic characterization —
    two edges meeting at v lie in the same block iff their far
    endpoints stay CONNECTED in G − v, and blocks are the transitive
    closure of that relation:

    1. one simultaneous MULTI-SEED min-label propagation, state
       ``(v, u, lab)``: every neighbor x of v seeds G − v with label
       x; at the fixpoint lab(v, u) = the minimum seed that reaches u
       with v removed (working set Σ_v |comp(v)| · labels — run it on
       a screened/backbone subgraph at corpus scale, the
       articulation_points discipline);
    2. at each v, edges to neighbors with equal labels share a block:
       each incident edge links to its group's minimum-neighbor
       representative edge, and hash-min CC over the packed edge keys
       (a·2²¹ + b, ids < 2²¹ — compact_ids beyond) closes the
       relation across vertices.

    Returns ``(df, stats)`` with one row per edge:
    ``(a, b, block)`` where block = the minimum member edge key."""
    und0 = _hard_cut(
        symmetrize(normalize_edges(edges)).where(F.col("src") < F.col("dst"))
    )
    spark = und0.sparkSession
    sym = _hard_cut(
        und0.unionByName(
            und0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    stats = IterationStats(algorithm="biconnected_components", edges=sym.count() // 2)
    cur = sym.select(
        F.col("src").alias("v"), F.col("dst").alias("u"), F.col("dst").alias("lab")
    ).localCheckpoint(eager=True)
    for it in range(1, max_rounds + 1):
        prop = (
            cur.join(sym.withColumnRenamed("src", "u"), "u")
            .where(F.col("dst") != F.col("v"))
            .select("v", F.col("dst").alias("u"), "lab")
        )
        merged = (
            cur.unionByName(prop)
            .groupBy("v", "u")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.join(
                cur.select("v", "u", F.col("lab").alias("old")), ["v", "u"], "left"
            )
            .where(F.col("old").isNull() | (F.col("lab") < F.col("old")))
            .count()
        )
        stats.iterations = it
        stats.deltas.append(float(changed))
        # drop the superseded round's checkpoint blocks — the state is
        # Σ_v |comp(v)| rows and keeping every round's copy OOMs a
        # default-sized driver
        cur.unpersist()
        cur = merged
        if changed == 0:
            stats.converged = True
            break
    if not stats.converged:
        raise RuntimeError(
            f"biconnected_components: labels not stable after {max_rounds} rounds"
        )
    k = F.lit(1 << 21)
    inc = sym.select(F.col("src").alias("v"), F.col("dst").alias("x"))
    labeled = inc.join(
        cur.select("v", F.col("u").alias("x"), "lab"), ["v", "x"]
    )
    reps = labeled.groupBy("v", "lab").agg(F.min("x").alias("minx"))
    ekey = lambda a, b: (  # noqa: E731
        F.least(a, b) * k + F.greatest(a, b)
    )
    links = (
        labeled.join(reps, ["v", "lab"])
        .select(
            ekey(F.col("v"), F.col("x")).alias("src"),
            ekey(F.col("v"), F.col("minx")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    comp, _ = connected_components(links)
    all_edges = und0.select(
        "src", "dst", ekey(F.col("src"), F.col("dst")).alias("key")
    )
    out = (
        all_edges.join(comp.withColumnRenamed("id", "key"), "key", "left")
        .select(
            F.col("src").cast("long").alias("a"),
            F.col("dst").cast("long").alias("b"),
            F.coalesce("comp", F.col("key")).cast("long").alias("block"),
        )
    )
    und0.unpersist()
    return out, stats
