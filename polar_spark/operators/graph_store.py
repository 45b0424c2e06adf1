"""The graph-upsert algebra: Polar's ``GraphOp`` semantics, set-oriented.

The reference compiles five mutation operators to Cypher and funnels
every write through one serialized actor, one transaction per op
(/root/reference/src/agents/lib/src/graph/controller.rs:168-229,
432-461).  That single-writer serialization is its scalability ceiling.
Here each operator is a *batch* merge over columnar tables: duplicate
keys inside a batch collapse deterministically (latest ``observed_at``
wins — the set-oriented equivalent of replaying serialized SETs), and a
whole batch commits as one atomic snapshot.  On a cluster these tables
are Iceberg and each commit is a ``MERGE INTO`` under snapshot
isolation; in this environment (no Iceberg jars) the same contract is
provided by a minimal versioned-parquet format.

Commit protocol (Iceberg-equivalent, bucket-scoped):

- tables are partitioned by label / rel_type / resource_label AND
  sub-bucketed by ``hash(entity key) % buckets`` — a commit writes ONLY
  the (partition, bucket) cells its batch touches into a new immutable
  ``v{n}`` directory and repoints those cells in ``manifest.json``
  (atomic rename is the commit point).  Untouched cells keep their
  existing files byte-for-byte — commit I/O is O(touched buckets), so a
  hot rel_type (all CONTAINS edges of a big scan) rewrites 1/B of its
  partition per batch, not the whole partition.
- a multi-table write (``ensure_edges``' endpoint stubs + edges,
  ``update_state``'s history + vertices + edges) lands as ONE snapshot:
  a reader can never observe stub vertices without their edges
  (cross-table atomicity, matching the reference's per-op transaction).
- merges are bucket-pruned the same way: the full-outer merge joins the
  batch against only the touched cells' current files (keys hash to
  their bucket, so a key's current row is always co-located).
- the manifest retains the last ``retention`` snapshots (per-cell
  pointer maps); ``table_at(name, version)`` time-travels to any
  retained snapshot and readers that pinned a manifest stay valid for
  the whole retention horizon.  Version directories referenced by no
  retained snapshot are garbage-collected.
- every ``compact_every`` commits, tables whose live pointers span many
  version directories are auto-compacted (rewrite-data-files); manual
  ``compact()`` remains available.
- ``collect_stats=True`` records per-partition row counts in each
  snapshot (the manifest-stats used by planners).

Semantics contracts (ported from
/root/reference/src/agents/lib/src/graph/tests.rs):

- upsert same key ×3        → exactly 1 vertex, props updated   (218-246)
- ensure_edge ×3            → exactly 1 edge, both endpoint
  stubs created, later upserts fill props                        (248-312)
- update_state ×N           → N immutable history rows
  (append-only), exactly one HAS_STATE pointer, pointing at the
  latest instance                                                (314-437)
- replaying any batch is idempotent (same final state)           (458-460)

Tables:

- vertices(label, key, id, props map<string,string>, observed_at)
- edges(src_label, src_key, dst_label, dst_key, rel_type,
        props map<string,string>, observed_at)
- state_history(resource_label, resource_key, state_type, instance_key,
        valid_from, props)  — append-only, never updated
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from polar_spark.functions.normalize import vertex_id

VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("observed_at", T.StringType(), True),
    ]
)
EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src_label", T.StringType(), False),
        T.StructField("src_key", T.StringType(), False),
        T.StructField("dst_label", T.StringType(), False),
        T.StructField("dst_key", T.StringType(), False),
        T.StructField("rel_type", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("observed_at", T.StringType(), True),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("resource_label", T.StringType(), False),
        T.StructField("resource_key", T.StringType(), False),
        T.StructField("state_type", T.StringType(), False),
        T.StructField("instance_key", T.StringType(), False),
        T.StructField("valid_from", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_SCHEMAS = {"vertices": VERTEX_SCHEMA, "edges": EDGE_SCHEMA, "state_history": STATE_SCHEMA}

_VKEY = ["label", "key"]
_EKEY = ["src_label", "src_key", "dst_label", "dst_key", "rel_type"]

# merged props: existing overridden by update's keys — the batch analog
# of Cypher's ``SET n.prop = $p`` per-property update (controller.rs:
# 252-276); requires mapKeyDedupPolicy=LAST_WIN (set in session.py)
def _merge_props(old: F.Column, new: F.Column) -> F.Column:
    return F.map_concat(
        F.coalesce(old, F.create_map()), F.coalesce(new, F.create_map())
    )


class GraphStore:
    """Versioned columnar property-graph store with Polar's write algebra."""

    # physical layout: vertices partitioned by label, edges by rel_type,
    # history by resource_label — label/rel_type predicates become
    # partition pruning at the scan AND partition-scoped commits at the
    # write (the SURVEY §1.3 schema decision; Iceberg partition spec
    # equivalent).  Each partition is sub-bucketed by the hash of the
    # MUTATION key — the key every write operator addresses rows by —
    # so a commit rewrites O(touched buckets), never a whole hot
    # partition, and replace/remove selectors prune to single buckets.
    _PARTITION_BY = {"vertices": "label", "edges": "rel_type", "state_history": "resource_label"}
    _BUCKET_BY = {
        "vertices": ["key"],
        "edges": ["src_label", "src_key"],  # replace/remove address (src, rel_type)
        "state_history": ["resource_key"],
    }

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        retention: int = 8,
        collect_stats: bool = False,
        buckets: int = 8,
        compact_every: int = 64,
    ):
        self.spark = spark
        self.path = path
        self.retention = max(1, retention)
        self.collect_stats = collect_stats
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)
        self._manifest_path = os.path.join(path, "manifest.json")
        if not os.path.exists(self._manifest_path):
            self._write_manifest(
                {
                    "version": 0,
                    "buckets": max(1, buckets),
                    "last_compact": 0,
                    "tables": {n: {} for n in _SCHEMAS},
                    "history": [],
                }
            )
        # bucket count is a physical layout constant per store — reopening
        # with a different value would mis-route merge pruning
        self.buckets = int(self._manifest().get("buckets", max(1, buckets)))

    # ---------------------------------------------------------------- io

    def _manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def _bucket_expr(self, name: str) -> F.Column:
        return F.pmod(F.xxhash64(*self._BUCKET_BY[name]), F.lit(self.buckets))

    @staticmethod
    def _cell_key(value: str, bucket: int) -> str:
        # bucket first: value may contain any character, the int prefix
        # and first '|' make the composite unambiguous
        return f"{bucket}|{value}"

    @staticmethod
    def _cell_value(cell: str) -> str:
        return cell.split("|", 1)[1]

    def _read_parts(self, name: str, parts: dict[str, dict]) -> DataFrame:
        schema = _SCHEMAS[name]
        if not parts:
            return self.spark.createDataFrame([], schema)
        paths = [
            os.path.join(self.path, name, f"v{p['v']}", p["dir"]) for p in parts.values()
        ]
        df = self.spark.read.parquet(*paths)
        # fixed column order/types regardless of physical file layout
        return df.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])

    def _parts_for(self, name: str, values: list[str] | None = None) -> dict[str, dict]:
        parts = self._manifest()["tables"][name]
        if values is None:
            return parts
        want = set(values)
        return {k: v for k, v in parts.items() if self._cell_value(k) in want}

    def _table(self, name: str, values: list[str] | None = None) -> DataFrame:
        """Current snapshot of ``name``; ``values`` prunes to the given
        partition values (label / rel_type / resource_label) — both the
        scan and any downstream merge then touch only those files."""
        return self._read_parts(name, self._parts_for(name, values))

    def table_at(self, name: str, version: int) -> DataFrame:
        """Time-travel read: the table exactly as of commit ``version``
        (must be within the retention horizon)."""
        for snap in self._manifest()["history"]:
            if snap["version"] == version:
                return self._read_parts(name, snap["tables"][name])
        raise ValueError(
            f"version {version} not retained (horizon = last {self.retention} commits)"
        )

    def snapshots(self) -> list[dict]:
        """Retained commit snapshots, oldest first: version, per-table
        cell pointers, and (if enabled) per-partition row counts."""
        return list(self._manifest()["history"])

    @property
    def version(self) -> int:
        return self._manifest()["version"]

    def _commit_many(
        self,
        writes: list[tuple[str, DataFrame, list[tuple[str, int]]]],
        _auto: bool = True,
    ) -> None:
        """Atomically commit one or more tables: write ONLY each batch's
        touched (partition value, bucket) cells into a shared new version
        dir, then repoint every touched cell in ONE manifest swap —
        readers see all tables move together (the reference's per-op
        transaction, controller.rs:432-461, as a snapshot).  A touched
        cell that ends up empty (e.g. remove_edges drained it) loses its
        pointer."""
        writes = [(n, df, t) for n, df, t in writes if t]
        if not writes:
            return
        m = self._manifest()
        nv = m["version"] + 1
        sep = "\x1f"
        for name, df, touched in writes:
            out = os.path.join(self.path, name, f"v{nv}")
            pc = self._PARTITION_BY[name]
            cell = F.concat_ws(sep, F.col(pc), self._bucket_expr(name).cast("string"))
            keys = [f"{v}{sep}{b}" for v, b in touched]
            # duplicate partition/bucket cols so data files keep them —
            # single-cell reads need no directory-name reconstruction.
            # Repartition to ~one task per touched cell so every cell
            # lands as ONE file (dynamic partitionBy otherwise sprays a
            # file per task × cell — the small-file overhead that made
            # bucket-scoped commits slower than partition-scoped ones).
            (
                df.where(cell.isin(keys))
                .withColumn("pv", F.col(pc))
                .withColumn("pb", self._bucket_expr(name))
                .repartition(max(1, len(keys)), "pv", "pb")
                .write.mode("overwrite")
                .partitionBy("pv", "pb")
                .parquet(out)
            )
            written: dict[str, str] = {}
            for d1 in os.listdir(out):
                if not d1.startswith("pv="):
                    continue
                for d2 in os.listdir(os.path.join(out, d1)):
                    if d2.startswith("pb="):
                        written[self._cell_key(unquote(d1[3:]), int(d2[3:]))] = os.path.join(d1, d2)
            parts = dict(m["tables"][name])
            for value, bucket in touched:
                ck = self._cell_key(value, bucket)
                if ck in written:
                    parts[ck] = {"v": nv, "dir": written[ck]}
                else:
                    parts.pop(ck, None)  # cell drained
            m["tables"][name] = parts
        m["version"] = nv
        snap = {"version": nv, "tables": {t: dict(m["tables"][t]) for t in _SCHEMAS}}
        if self.collect_stats:
            snap["stats"] = {}
            for name, _df, touched in writes:
                pc = self._PARTITION_BY[name]
                values = sorted({v for v, _b in touched})
                cur = self._read_parts(name, self._parts_for_m(m, name, values))
                stats = cur.groupBy(pc).count().collect()
                snap["stats"][name] = {r[pc]: r["count"] for r in stats}
        m["history"] = (m["history"] + [snap])[-self.retention :]
        self._write_manifest(m)
        self._gc(m)
        if _auto and self.compact_every and nv - m.get("last_compact", 0) >= self.compact_every:
            self._auto_compact(nv)

    def _parts_for_m(self, m: dict, name: str, values: list[str]) -> dict[str, dict]:
        want = set(values)
        return {k: v for k, v in m["tables"][name].items() if self._cell_value(k) in want}

    def _commit(self, name: str, df: DataFrame, touched: list[tuple[str, int]]) -> None:
        self._commit_many([(name, df, touched)])

    def _gc(self, m: dict) -> None:
        """Drop version dirs referenced by no retained snapshot — readers
        pinned to any retained snapshot keep every file they can see."""
        for name in _SCHEMAS:
            live = {p["v"] for p in m["tables"][name].values()}
            for snap in m["history"]:
                live |= {p["v"] for p in snap["tables"][name].values()}
            tdir = os.path.join(self.path, name)
            if not os.path.isdir(tdir):
                continue
            for d in os.listdir(tdir):
                if d.startswith("v") and d[1:].isdigit() and int(d[1:]) not in live:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)

    def compact(self, name: str, _auto: bool = False) -> None:
        """Rewrite every current cell of ``name`` into one new version
        directory — bounds the version-dir sprawl of many bucket-scoped
        commits (the Iceberg rewrite-data-files maintenance action).
        Old versions age out with retention.  Runs automatically every
        ``compact_every`` commits for fragmented tables."""
        parts = self._manifest()["tables"][name]
        if not parts:
            return
        touched = []
        for ck in parts:
            bucket, value = ck.split("|", 1)
            touched.append((value, int(bucket)))
        self._commit_many([(name, self._read_parts(name, parts), touched)], _auto=_auto)

    def _auto_compact(self, nv: int) -> None:
        """Compact tables whose live pointers span many version dirs;
        record the sweep so the next one is ``compact_every`` away."""
        m = self._manifest()
        for name in _SCHEMAS:
            versions = {p["v"] for p in m["tables"][name].values()}
            if len(versions) > 4:
                self.compact(name, _auto=False)
        m = self._manifest()
        m["last_compact"] = m["version"]
        self._write_manifest(m)

    def _touched(self, df: DataFrame, name: str) -> list[tuple[str, int]]:
        """Distinct (partition value, bucket) cells a batch addresses —
        bounded by label/rel_type vocabulary × bucket count, a
        driver-side list, never data-sized."""
        pc = self._PARTITION_BY[name]
        rows = (
            df.select(F.col(pc).alias("_pv"), self._bucket_expr(name).alias("_pb"))
            .where(F.col("_pv").isNotNull())
            .distinct()
            .collect()
        )
        return [(r["_pv"], int(r["_pb"])) for r in rows]

    # ------------------------------------------------------------- reads

    @property
    def vertices(self) -> DataFrame:
        return self._table("vertices")

    @property
    def edges(self) -> DataFrame:
        return self._table("edges")

    @property
    def state_history(self) -> DataFrame:
        return self._table("state_history")

    @property
    def current_state(self) -> DataFrame:
        """Latest state instance per resource — the HAS_STATE pointer as
        a derived view (``row_number()=1`` over the append-only history,
        replacing the reference's pointer-replace write,
        controller.rs:390-414)."""
        w = Window.partitionBy("resource_label", "resource_key").orderBy(
            F.desc("valid_from"), F.desc("instance_key")
        )
        return (
            self.state_history.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def edge_table(self, rel_type: str | None = None) -> DataFrame:
        """Analytics-ready (src, dst, etype) long-id edge table for the
        pregel layer; a rel_type filter reads only that partition."""
        e = self._table("edges", [rel_type]) if rel_type else self.edges
        return e.select(
            vertex_id("src_label", "src_key").alias("src"),
            vertex_id("dst_label", "dst_key").alias("dst"),
            F.col("rel_type").alias("etype"),
        )

    def raw_query(self, sql: str) -> DataFrame:
        """M6 RawQuery escape hatch (controller.rs:213-228): arbitrary
        SQL over the graph tables."""
        self.vertices.createOrReplaceTempView("vertices")
        self.edges.createOrReplaceTempView("edges")
        self.state_history.createOrReplaceTempView("state_history")
        self.current_state.createOrReplaceTempView("current_state")
        return self.spark.sql(sql)

    # ------------------------------------------------------------ writes

    @staticmethod
    def _dedup_latest(df: DataFrame, keys: list[str]) -> DataFrame:
        """Deterministic batch collapse: latest observed_at wins (ties →
        larger props map last by map string) — replaces the reference's
        single-writer serialization of SETs."""
        w = Window.partitionBy(*keys).orderBy(
            F.desc_nulls_last("observed_at"), F.desc(F.to_json(F.col("props")))
        )
        return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")

    def _merged_vertices(self, updates: DataFrame) -> tuple[DataFrame, list[tuple[str, int]]]:
        u = self._conform(updates, VERTEX_SCHEMA, with_id=True)
        # materialize the (batch-sized) deduped updates once: the touched
        # collect and every downstream table write would otherwise each
        # re-run the caller's whole upstream pipeline
        u = self._dedup_latest(u, _VKEY).localCheckpoint(eager=True)
        touched = self._touched(u, "vertices")
        # bucket-pruned merge: only the touched cells' current rows join
        cells = {self._cell_key(v, b) for v, b in touched}
        cur = self._read_parts(
            "vertices",
            {ck: p for ck, p in self._manifest()["tables"]["vertices"].items() if ck in cells},
        )
        merged = (
            cur.alias("t")
            .join(u.alias("s"), _VKEY, "full_outer")
            .select(
                *[F.col(k) for k in _VKEY],
                F.coalesce(F.col("t.id"), F.col("s.id")).alias("id"),
                F.when(F.col("s.key").isNotNull(), _merge_props(F.col("t.props"), F.col("s.props")))
                .otherwise(F.col("t.props"))
                .alias("props"),
                F.coalesce(F.col("s.observed_at"), F.col("t.observed_at")).alias("observed_at"),
            )
        )
        return merged, touched

    def upsert_nodes(self, updates: DataFrame) -> None:
        """M1 UpsertNode (controller.rs:171-175,252-276): create-if-
        absent, merge props if present; empty-props form = ensure-exists.

        ``updates``: (label, key, props?, observed_at?).
        """
        merged, touched = self._merged_vertices(updates)
        self._commit("vertices", merged, touched)

    @staticmethod
    def _endpoint_stubs(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("src_label").alias("label"), F.col("src_key").alias("key"))
            .unionByName(
                e.select(F.col("dst_label").alias("label"), F.col("dst_key").alias("key"))
            )
            .distinct()
            .withColumn("props", F.create_map().cast("map<string,string>"))
            .withColumn("observed_at", F.lit(None).cast("string"))
        )

    def _merged_edges(
        self, ensure: DataFrame | None, replace: DataFrame | None
    ) -> tuple[DataFrame, list[tuple[str, int]]]:
        """One-pass edge merge: ``replace`` rows first delete ALL current
        edges of their (src, rel_type), then both batches MERGE by the
        full edge key (ensure semantics).  The bucket hash covers only
        (src_label, src_key), so the replace deletion prunes to exactly
        the touched cells."""
        batches = [b for b in (ensure, replace) if b is not None]
        s = batches[0]
        for b in batches[1:]:
            s = s.unionByName(b)
        # materialized once for the same reason as _merged_vertices
        s = self._dedup_latest(s, _EKEY).localCheckpoint(eager=True)
        touched = self._touched(s, "edges")
        cells = {self._cell_key(v, b) for v, b in touched}
        cur = self._read_parts(
            "edges",
            {ck: p for ck, p in self._manifest()["tables"]["edges"].items() if ck in cells},
        )
        if replace is not None:
            sel = ["src_label", "src_key", "rel_type"]
            cur = cur.join(replace.select(*sel).distinct(), sel, "left_anti")
        merged = (
            cur.alias("t")
            .join(s.alias("s"), _EKEY, "full_outer")
            .select(
                *[F.col(k) for k in _EKEY],
                F.when(
                    F.col("s.rel_type").isNotNull(), _merge_props(F.col("t.props"), F.col("s.props"))
                )
                .otherwise(F.col("t.props"))
                .alias("props"),
                F.coalesce(F.col("s.observed_at"), F.col("t.observed_at")).alias("observed_at"),
            )
        )
        return merged, touched

    def ensure_edges(self, new_edges: DataFrame) -> None:
        """M2 EnsureEdge (controller.rs:178-183,278-314): MERGE both
        endpoints (stubs if absent) then MERGE the edge, in ONE atomic
        snapshot — no reader can observe the stubs without the edges
        (the reference bundles both in one tx); idempotent.

        ``new_edges``: (src_label, src_key, dst_label, dst_key,
        rel_type, props?, observed_at?).
        """
        # one materialization feeds both the endpoint stubs and the edge
        # merge (the caller's pipeline runs once, not once per table job)
        e = self._conform(new_edges, EDGE_SCHEMA).localCheckpoint(eager=True)
        mv, tv = self._merged_vertices(self._endpoint_stubs(e))
        me, te = self._merged_edges(e, None)
        self._commit_many([("vertices", mv, tv), ("edges", me, te)])

    def replace_edges(self, replacements: DataFrame) -> None:
        """M3 ReplaceEdge (controller.rs:186-192,315-337): atomically
        delete ALL outgoing ``rel_type`` edges of each (src, rel_type)
        in the batch, then create the single new edge — the
        latest-pointer pattern.  One snapshot (stubs + edges).

        ``replacements``: same shape as ensure_edges input; one row per
        (src, rel_type) after dedup (latest observed_at wins).
        """
        r = self._dedup_latest(
            self._conform(replacements, EDGE_SCHEMA), ["src_label", "src_key", "rel_type"]
        ).localCheckpoint(eager=True)
        mv, tv = self._merged_vertices(self._endpoint_stubs(r))
        me, te = self._merged_edges(None, r)
        self._commit_many([("vertices", mv, tv), ("edges", me, te)])

    def remove_edges(self, selectors: DataFrame) -> None:
        """M4 RemoveEdges (controller.rs:194-198,339-354): delete all
        outgoing ``rel_type`` edges of each (src, rel_type) row.  The
        selector addresses exactly one bucket per (src, rel_type)."""
        sel = ["src_label", "src_key", "rel_type"]
        s = selectors.select(*sel).distinct()
        touched = self._touched(s, "edges")
        cells = {self._cell_key(v, b) for v, b in touched}
        kept = self._read_parts(
            "edges",
            {ck: p for ck, p in self._manifest()["tables"]["edges"].items() if ck in cells},
        ).join(s, sel, "left_anti")
        self._commit("edges", kept, touched)

    def update_state(self, transitions: DataFrame) -> None:
        """M5 UpdateState (controller.rs:200-212,355-417): the 5-step
        temporal pattern, set-oriented — the whole batch lands in ONE
        atomic snapshot spanning history, vertices and edges (the
        reference wraps the five steps in one transaction):

        1. ensure the state-type taxonomy node,
        2. append the *immutable* state instance (history is append-only
           — duplicate (resource, instance) rows are idempotent no-ops,
           existing instances are never modified),
        3. TRANSITIONED_TO edge resource→instance (history chain),
        4. OF_TYPE edge instance→type,
        5. replace the single HAS_STATE pointer to the newest instance.

        ``transitions``: (resource_label, resource_key, state_type,
        instance_key, valid_from, props?).
        """
        t = self._conform(transitions, STATE_SCHEMA).localCheckpoint(eager=True)
        # (2) append-only history: only genuinely new instances append;
        # re-delivery of an already-recorded instance must not mutate it
        hist_keys = ["resource_label", "resource_key", "state_type", "instance_key"]
        w = Window.partitionBy(*hist_keys).orderBy(F.desc("valid_from"))
        t_dedup = t.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
        touched_hist = self._touched(t_dedup, "state_history")
        cells = {self._cell_key(v, b) for v, b in touched_hist}
        hist = self._read_parts(
            "state_history",
            {ck: p for ck, p in self._manifest()["tables"]["state_history"].items() if ck in cells},
        )
        fresh = t_dedup.join(hist.select(*hist_keys), hist_keys, "left_anti")
        hist_merged = hist.unionByName(fresh)

        inst_label = F.concat(F.col("state_type"), F.lit("State"))
        # (1) taxonomy node + resource + instance nodes + instance props
        # (immutable — only fresh instances carry props)
        nodes = (
            t.select(F.lit("State").alias("label"), F.col("state_type").alias("key"))
            .unionByName(t.select(F.col("resource_label").alias("label"), F.col("resource_key").alias("key")))
            .unionByName(t.select(inst_label.alias("label"), F.col("instance_key").alias("key")))
            .distinct()
            .withColumn("props", F.create_map().cast("map<string,string>"))
            .withColumn("observed_at", F.lit(None).cast("string"))
            .unionByName(
                fresh.select(
                    F.concat(F.col("state_type"), F.lit("State")).alias("label"),
                    F.col("instance_key").alias("key"),
                    F.col("props"),
                    F.col("valid_from").alias("observed_at"),
                )
            )
        )
        mv, tv = self._merged_vertices(nodes)

        # (3) + (4) ensure-batch, (5) replace-batch — one edges merge
        trans = t.select(
            F.col("resource_label").alias("src_label"),
            F.col("resource_key").alias("src_key"),
            inst_label.alias("dst_label"),
            F.col("instance_key").alias("dst_key"),
            F.lit("TRANSITIONED_TO").alias("rel_type"),
            F.create_map(F.lit("valid_from"), F.col("valid_from")).alias("props"),
            F.col("valid_from").alias("observed_at"),
        )
        of_type = t.select(
            inst_label.alias("src_label"),
            F.col("instance_key").alias("src_key"),
            F.lit("State").alias("dst_label"),
            F.col("state_type").alias("dst_key"),
            F.lit("OF_TYPE").alias("rel_type"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.lit(None).cast("string").alias("observed_at"),
        )
        wp = Window.partitionBy("resource_label", "resource_key").orderBy(
            F.desc("valid_from"), F.desc("instance_key")
        )
        latest = t.withColumn("_rn", F.row_number().over(wp)).where(F.col("_rn") == 1).drop("_rn")
        has_state = latest.select(
            F.col("resource_label").alias("src_label"),
            F.col("resource_key").alias("src_key"),
            F.concat(F.col("state_type"), F.lit("State")).alias("dst_label"),
            F.col("instance_key").alias("dst_key"),
            F.lit("HAS_STATE").alias("rel_type"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("valid_from").alias("observed_at"),
        )
        me, te = self._merged_edges(trans.unionByName(of_type), has_state)
        self._commit_many(
            [
                ("state_history", hist_merged, touched_hist),
                ("vertices", mv, tv),
                ("edges", me, te),
            ]
        )

    # ---------------------------------------------------------- helpers

    def _conform(self, df: DataFrame, schema: T.StructType, with_id: bool = False) -> DataFrame:
        # Required (non-nullable) string columns — labels, keys, rel_type —
        # are normalized: null/empty becomes the '__unset__' sentinel.
        # Dynamic labels from scan data (kube owner_refs.kind, provenance
        # backend labels) CAN be null/''; without this, Spark writes '' as
        # pv=__HIVE_DEFAULT_PARTITION__ (never matching the touched value,
        # so the partition pointer is popped as drained) and null-valued
        # rows silently miss the touched-cell commit filter.  Normalizing
        # also keeps merge-join keys non-null (null keys never equi-match).
        def _required(c: F.Column) -> F.Column:
            return F.when(c.isNull() | (c == ""), F.lit("__unset__")).otherwise(c)

        exprs: dict[str, F.Column] = {}
        for f in schema.fields:
            if f.name == "id" and with_id:
                continue
            c = (
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType)
            )
            if not f.nullable and isinstance(f.dataType, T.StringType):
                c = _required(c)
            exprs[f.name] = c
        if with_id:
            # id derives from the NORMALIZED label/key so sentinel rows
            # hash consistently with how they are stored
            exprs["id"] = vertex_id(exprs["label"], exprs["key"])
        return df.select(*[exprs[f.name].alias(f.name) for f in schema.fields])
