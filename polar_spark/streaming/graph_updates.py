"""Incremental link-graph maintenance from streaming edge deltas.

The reference rebuilds its graph by replaying scan events; analytics
then re-run from scratch.  This module closes the streaming loop for
the link-graph layer: edge deltas (adds/removes) arrive as a stream,
each micro-batch folds them into a durable versioned edge table and
recomputes PageRank *warm-started from the previous converged ranks*
(``pregel.pagerank(init_ranks=...)``) — a small perturbation converges
in a handful of rounds instead of a cold start's O(log(1/tol)/log(1/d)).

Durability layout under ``work_dir``::

    edges/v{n}/   immutable edge-table versions
    ranks/v{n}/   converged ranks per version
    state.json    atomic pointer {version, iterations, delta}

The same at-least-once contract as ingestion: replaying a delta batch
is idempotent (adds merge by key, removes are anti-joins), and the
streaming checkpoint tracks source offsets across restarts.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from polar_spark.plans import pregel

DELTA_SCHEMA = "src long, dst long, op string"  # op ∈ {add, remove}


class RankMaintainer:
    """Versioned (edges, ranks) state with warm-start recompute."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        tol: float = 1e-6,
        max_iter: int = 100,
        retention: int = 4,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.tol = tol
        self.max_iter = max_iter
        self.retention = max(1, retention)
        os.makedirs(work_dir, exist_ok=True)
        self._state_path = os.path.join(work_dir, "state.json")

    def _gc(self, current_version: int) -> None:
        """Drop edges/ranks version dirs older than the retention window
        (mirrors GraphStore._gc) — a long-running delta stream otherwise
        grows disk without bound, one immutable version per micro-batch."""
        import shutil

        floor = current_version - self.retention
        for sub in ("edges", "ranks"):
            d = os.path.join(self.work_dir, sub)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= floor:
                    shutil.rmtree(os.path.join(d, name), ignore_errors=True)

    def state(self) -> dict | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)

    def edges(self) -> DataFrame | None:
        s = self.state()
        if s is None:
            return None
        return self.spark.read.parquet(os.path.join(self.work_dir, "edges", f"v{s['version']}"))

    def ranks(self) -> DataFrame | None:
        s = self.state()
        if s is None:
            return None
        return self.spark.read.parquet(os.path.join(self.work_dir, "ranks", f"v{s['version']}"))

    def apply_deltas(self, deltas: DataFrame) -> dict:
        """Fold one delta batch into the edge table and bring the ranks
        to the new fixpoint.  Two paths (VERDICT r2 #3):

        - **scoped / scoped_grow / scoped_shrink / scoped_mixed** (the
          delta path): whenever both graphs are dangling-free, the new
          ranks on the new vertex set V' are (n/n')·(r₀|V' + x) where x
          solves x = c + M·x with M = d·Pᵀ_new (supported on V') and
          c = d·(P_new − P_old)ᵀ·r₀ restricted to V' targets, plus
          (1−d)/n on fresh vertices — sparse, supported only on the
          perturbation's neighborhood.  Removed vertices contribute
          NEGATIVE residual mass through their vanished out-edges
          (their edges appear in the remove delta, so they are
          "changed srcs" with w_new = 0); the signed series converges
          identically since ‖d·Pᵀ‖ ≤ d < 1.  The n/n' renormalization
          folds the DENSE uniform-teleport change ((1−d)/n → (1−d)/n')
          analytically: its series sum γ·(I−M)⁻¹·1 is proportional to
          the answer itself — the identity holds for shrink exactly as
          for growth (derivation: (I−dM'ᵀ)(r₀|V' + x) = (1−d)/n·1').
          The Jacobi series is iterated as sparse DataFrames: round k
          touches the k-hop out-neighborhood of the perturbation, so
          per-batch cost scales with the delta neighborhood, not
          O(E)·rounds.
        - **warm_full**: any dangling vertex in either graph (the
          uniform redistribution row makes the residual dense) falls
          back to the full-graph recompute warm-started from r₀.

        Returns the new state dict (version, mode, iterations,
        final_delta, edges, support_rows).
        """
        adds = deltas.where(F.col("op") == "add").select("src", "dst")
        removes = deltas.where(F.col("op") == "remove").select("src", "dst")
        cur = self.edges()
        new_edges = adds if cur is None else cur.unionByName(adds)
        new_edges = new_edges.join(removes, ["src", "dst"], "left_anti").dropDuplicates(
            ["src", "dst"]
        )
        s = self.state()
        nv = (s["version"] + 1) if s else 1
        epath = os.path.join(self.work_dir, "edges", f"v{nv}")
        new_edges.write.mode("overwrite").parquet(epath)
        new_edges = self.spark.read.parquet(epath)

        prev_ranks = self.ranks()
        scoped = None
        if prev_ranks is not None and cur is not None:
            scoped = self._scoped_update(cur, new_edges, adds, removes, prev_ranks)
        if scoped is not None:
            ranks, meta = scoped
        else:
            ranks, st = pregel.pagerank(
                new_edges, tol=self.tol, max_iter=self.max_iter, init_ranks=prev_ranks
            )
            meta = {
                "mode": "warm_full" if prev_ranks is not None else "cold",
                "iterations": st.iterations,
                "first_delta": st.deltas[0] if st.deltas else None,
                "final_delta": st.final_delta,
                "edges": st.edges,
                "support_rows": None,
            }
        rpath = os.path.join(self.work_dir, "ranks", f"v{nv}")
        ranks.write.mode("overwrite").parquet(rpath)
        new_state = {
            "version": nv,
            "warm_start": prev_ranks is not None,
            **meta,
        }
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, self._state_path)  # atomic pointer swap
        self._gc(nv)
        return new_state

    def _scoped_update(
        self,
        old_edges: DataFrame,
        new_edges: DataFrame,
        adds: DataFrame,
        removes: DataFrame,
        r0: DataFrame,
    ) -> tuple[DataFrame, dict] | None:
        """Residual (Jacobi-series) rank update scoped to the perturbed
        neighborhood; None when the delta is not eligible (see
        apply_deltas).  Exactness: the returned ranks equal the new
        fixpoint within tol — the truncated tail Σ_{k>K} M^k c has
        L∞ ≤ ‖M^K c‖∞ · d/(1−d), so the loop stops at
        ‖term‖∞ < tol·(1−d)/d."""
        damping = 0.85  # pregel.pagerank default — the operator being maintained
        eo = pregel.normalize_edges(old_edges)
        en = pregel.normalize_edges(new_edges)

        # eligibility: BOTH graphs must be dangling-free (a residual
        # landing on a dangling vertex redistributes uniformly — dense;
        # and r0 must satisfy the no-dangling-term fixpoint equation).
        # The vertex set may grow AND shrink: fresh vertices get the
        # sparse teleport correction, removed vertices inject negative
        # residuals through their vanished out-edges and are dropped
        # from the final state.
        vo, vn = pregel.vertices_of(eo), pregel.vertices_of(en)
        so = eo.select(F.col("src").alias("id")).distinct()
        sn = en.select(F.col("src").alias("id")).distinct()
        if (
            vn.join(sn, "id", "left_anti").limit(1).count() > 0  # new graph dangling
            or vo.join(so, "id", "left_anti").limit(1).count() > 0  # old graph dangling
        ):
            return None

        spark = new_edges.sparkSession
        m = en.count()
        shuffle = pregel._auto_partitions(spark, m, None)
        with pregel._shuffle_conf(spark, shuffle):
            # full new weighted operator, built once for the loop
            deg_n = en.groupBy("src").agg(F.count("*").alias("dn"))
            ew = (
                en.join(deg_n, "src")
                .select("src", "dst", (F.lit(damping) / F.col("dn")).alias("w"))
                .repartition(shuffle, "src")
                .localCheckpoint(eager=True)
            )
            # c = d·Σ_u [w_new(u,v) − w_old(u,v)]·r0(u), u ∈ changed srcs —
            # changed srcs gain/lose edges OR change out-degree
            changed = (
                adds.select("src").unionByName(removes.select("src")).distinct()
            )
            wn = en.join(changed, "src").join(deg_n, "src").select(
                "src", "dst", (F.lit(1.0) / F.col("dn")).alias("wn")
            )
            deg_o = eo.groupBy("src").agg(F.count("*").alias("do"))
            wo = eo.join(changed, "src").join(deg_o, "src").select(
                "src", "dst", (F.lit(1.0) / F.col("do")).alias("wo")
            )
            # residuals live on V' only: weight changes whose dst was
            # removed have no target in the new system — drop them (the
            # lost rank mass is exactly what the n/n' renormalization
            # accounts for)
            diff = (
                wn.join(wo, ["src", "dst"], "full_outer")
                .select(
                    "src",
                    "dst",
                    (
                        F.coalesce(F.col("wn"), F.lit(0.0))
                        - F.coalesce(F.col("wo"), F.lit(0.0))
                    ).alias("dw"),
                )
                .where(F.col("dw") != 0.0)
                .join(vn.withColumnRenamed("id", "dst"), "dst", "left_semi")
            )
            # vertex-set growth (V' ⊃ V): split the teleport-change
            # residual into its uniform part and a sparse part.  The
            # uniform part γ·(I−M)⁻¹·1 is proportional to the ANSWER
            # (r_new = (1−d)/n'·(I−M)⁻¹·1), so it folds into a final
            # renormalization r_new = (n/n')·(r0_ext + x_sparse); the
            # sparse part adds (1−d)/n on each NEW vertex to the usual
            # d·ΔPᵀ·r0 term.  With n'==n this reduces exactly to the
            # fixed-vertex-set update.
            n_old = vo.count()
            n_new = vn.count()
            c_sparse = (
                diff.join(r0.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg((F.lit(damping) * F.sum(F.col("dw") * F.col("rank"))).alias("x"))
            )
            # fresh/removed counted explicitly — a mixed batch can add
            # and remove the same NUMBER of vertices, so n_new == n_old
            # does not imply an unchanged vertex set
            n_fresh = vn.join(vo, "id", "left_anti").count()
            n_removed = vo.join(vn, "id", "left_anti").count()
            if n_fresh:
                fresh = vn.join(vo, "id", "left_anti").select(
                    "id", F.lit((1.0 - damping) / n_old).alias("x")
                )
                c_sparse = (
                    c_sparse.unionByName(fresh)
                    .groupBy("id")
                    .agg(F.sum("x").alias("x"))
                )
            c = c_sparse.where(F.col("x") != 0.0).localCheckpoint(eager=True)

            eps = self.tol * (1.0 - damping) / damping
            term = c
            x = c
            support_rows = 0
            iterations = 0
            push_norm = float(
                term.agg(F.coalesce(F.max(F.abs("x")), F.lit(0.0))).collect()[0][0]
            )
            while push_norm >= eps and iterations < self.max_iter:
                iterations += 1
                support_rows += term.count()
                term = (
                    ew.join(term.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum(F.col("w") * F.col("x")).alias("x"))
                    .localCheckpoint(eager=True)
                )
                x = (
                    x.unionByName(term)
                    .groupBy("id")
                    .agg(F.sum("x").alias("x"))
                    .localCheckpoint(eager=True)
                )
                push_norm = float(
                    term.agg(F.coalesce(F.max(F.abs("x")), F.lit(0.0))).collect()[0][0]
                )
            # full outer over r0 RESTRICTED to V' (removed vertices
            # leave the state); fresh vertices exist only in x;
            # renormalize by n/n' (the folded uniform-teleport
            # correction — see above; same identity for shrink)
            renorm = float(n_old) / float(n_new)
            r0v = r0.join(vn, "id", "left_semi")
            ranks = (
                r0v.join(x, "id", "full_outer")
                .select(
                    "id",
                    (
                        F.lit(renorm)
                        * (
                            F.coalesce(F.col("rank"), F.lit(0.0))
                            + F.coalesce(F.col("x"), F.lit(0.0))
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            ew.unpersist()
            if n_fresh and n_removed:
                mode = "scoped_mixed"
            elif n_fresh:
                mode = "scoped_grow"
            elif n_removed:
                mode = "scoped_shrink"
            else:
                mode = "scoped"
            return ranks, {
                "mode": mode,
                "iterations": iterations,
                "first_delta": None,
                "final_delta": push_norm,
                "edges": m,
                "support_rows": support_rows,
            }


class ComponentsMaintainer:
    """Versioned (edges, comps) state: connected components maintained
    over streaming edge deltas.

    Edge ADDS only merge components, so hash-min warm-started from the
    previous fixpoint is exact (every seed label is an id inside the
    grown component) and converges in rounds proportional to the merge
    diameter, not the graph diameter.  Edge REMOVES can split a
    component — stale-low labels would survive a warm start — so a
    batch containing removes cold-starts the recompute.  Same layout
    and at-least-once replay contract as :class:`RankMaintainer`:
    ``edges/v{n}``, ``comps/v{n}``, atomic ``state.json`` pointer,
    retention GC."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        max_iter: int = 100,
        retention: int = 4,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.max_iter = max_iter
        self.retention = max(1, retention)
        os.makedirs(work_dir, exist_ok=True)
        self._state_path = os.path.join(work_dir, "state.json")

    def _gc(self, current_version: int) -> None:
        import shutil

        floor = current_version - self.retention
        for sub in ("edges", "comps"):
            d = os.path.join(self.work_dir, sub)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= floor:
                    shutil.rmtree(os.path.join(d, name), ignore_errors=True)

    def state(self) -> dict | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)

    def edges(self) -> DataFrame | None:
        s = self.state()
        if s is None:
            return None
        return self.spark.read.parquet(os.path.join(self.work_dir, "edges", f"v{s['version']}"))

    def comps(self) -> DataFrame | None:
        s = self.state()
        if s is None:
            return None
        return self.spark.read.parquet(os.path.join(self.work_dir, "comps", f"v{s['version']}"))

    def apply_deltas(self, deltas: DataFrame) -> dict:
        """Fold one delta batch into the edge table and bring the
        component labels to the new fixpoint (warm for add-only batches,
        cold when the batch removes edges).  Returns the new state."""
        adds = deltas.where(F.col("op") == "add").select("src", "dst")
        removes = deltas.where(F.col("op") == "remove").select("src", "dst")
        n_removes = removes.count()
        cur = self.edges()
        new_edges = adds if cur is None else cur.unionByName(adds)
        new_edges = new_edges.join(removes, ["src", "dst"], "left_anti").dropDuplicates(
            ["src", "dst"]
        )
        s = self.state()
        nv = (s["version"] + 1) if s else 1
        epath = os.path.join(self.work_dir, "edges", f"v{nv}")
        new_edges.write.mode("overwrite").parquet(epath)
        new_edges = self.spark.read.parquet(epath)

        prev = self.comps()
        warm = prev is not None and n_removes == 0
        comp, st = pregel.connected_components(
            new_edges,
            max_iter=self.max_iter,
            init_components=prev if warm else None,
        )
        cpath = os.path.join(self.work_dir, "comps", f"v{nv}")
        comp.write.mode("overwrite").parquet(cpath)
        new_state = {
            "version": nv,
            "mode": "warm_adds" if warm else ("cold_removes" if prev is not None else "cold"),
            "iterations": st.iterations,
            "edges": st.edges,
            "vertices": st.vertices,
        }
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, self._state_path)
        self._gc(nv)
        return new_state


def read_delta_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(DELTA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def start_rank_maintenance(
    deltas: DataFrame,
    maintainer: RankMaintainer,
    checkpoint_dir: str,
    query_name: str = "polar_rank_maintenance",
) -> StreamingQuery:
    """Delta stream → warm-started rank recompute per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintainer.apply_deltas(batch_df)

    return (
        deltas.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def start_components_maintenance(
    deltas: DataFrame,
    maintainer: ComponentsMaintainer,
    checkpoint_dir: str,
    query_name: str = "polar_components_maintenance",
) -> StreamingQuery:
    """Delta stream → warm-started component recompute per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintainer.apply_deltas(batch_df)

    return (
        deltas.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
