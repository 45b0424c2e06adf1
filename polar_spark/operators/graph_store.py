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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from polar_spark.functions.normalize import vertex_id
from polar_spark.operators.store_backend import StoreBackend, VersionedParquetBackend

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
        backend: StoreBackend | None = None,
    ):
        self.spark = spark
        self.path = path
        # the physical half lives behind the StoreBackend seam
        # (store_backend.py) — a real Iceberg catalog drops in via
        # ``backend=IcebergBackend(...)`` when the runtime jars exist
        self._backend = backend or VersionedParquetBackend(
            spark,
            path,
            schemas=_SCHEMAS,
            partition_by=self._PARTITION_BY,
            bucket_by=self._BUCKET_BY,
            retention=retention,
            buckets=buckets,
            compact_every=compact_every,
            collect_stats=collect_stats,
        )
        self.buckets = self._backend.buckets

    # ------------------------------------------------- storage delegation

    def _table(self, name: str, values: list[str] | None = None) -> DataFrame:
        """Current snapshot of ``name``; ``values`` prunes to the given
        partition values (label / rel_type / resource_label) — both the
        scan and any downstream merge then touch only those files."""
        return self._backend.table(name, values)

    def table_at(self, name: str, version: int) -> DataFrame:
        """Time-travel read: the table exactly as of commit ``version``
        (must be within the retention horizon)."""
        return self._backend.table_at(name, version)

    def snapshots(self) -> list[dict]:
        """Retained commit snapshots, oldest first: version, per-table
        cell pointers, and (if enabled) per-partition row counts."""
        return self._backend.snapshots()

    @property
    def version(self) -> int:
        return self._backend.version

    def compact(self, name: str) -> None:
        """Rewrite-data-files maintenance action (see the backend)."""
        self._backend.compact(name)

    def _commit_many(
        self, writes: list[tuple[str, DataFrame, list[tuple[str, int]]]]
    ) -> None:
        self._backend.commit(writes)

    def _commit(self, name: str, df: DataFrame, touched: list[tuple[str, int]]) -> None:
        self._backend.commit([(name, df, touched)])

    # introspection shims (tests/tools peek at the parquet manifest)
    def _manifest(self) -> dict:
        return self._backend._manifest()

    def _parts_for(self, name: str, values: list[str] | None = None) -> dict[str, dict]:
        return self._backend._parts_for(name, values)

    def _touched(self, df: DataFrame, name: str) -> list[tuple[str, int]]:
        """Distinct (partition value, bucket) cells a batch addresses —
        bounded by label/rel_type vocabulary × bucket count, a
        driver-side list, never data-sized."""
        pc = self._PARTITION_BY[name]
        rows = (
            df.select(F.col(pc).alias("_pv"), self._backend.bucket_expr(name).alias("_pb"))
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
        cur = self._backend.read_cells("vertices", touched)
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
        cur = self._backend.read_cells("edges", touched)
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
        kept = self._backend.read_cells("edges", touched).join(s, sel, "left_anti")
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
        hist = self._backend.read_cells("state_history", touched_hist)
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
