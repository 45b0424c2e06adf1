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
provided by a minimal versioned-parquet format: every commit writes a
new immutable version directory and atomically swaps ``manifest.json``
(rename is the commit point), readers pin the manifest they opened.

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

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._manifest_path = os.path.join(path, "manifest.json")
        if not os.path.exists(self._manifest_path):
            self._write_manifest({"vertices": 0, "edges": 0, "state_history": 0})

    # ---------------------------------------------------------------- io

    def _manifest(self) -> dict[str, int]:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict[str, int]) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def _table(self, name: str, schema: T.StructType) -> DataFrame:
        v = self._manifest()[name]
        if v == 0:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(os.path.join(self.path, name, f"v{v}"))

    # physical layout: vertices partitioned by label, edges by rel_type —
    # label/rel_type predicates become partition pruning at the scan
    # (the SURVEY §1.3 schema decision; Iceberg partition spec equivalent)
    _PARTITION_BY = {"vertices": "label", "edges": "rel_type"}

    def _commit(self, name: str, df: DataFrame) -> None:
        m = self._manifest()
        nv = m[name] + 1
        out = os.path.join(self.path, name, f"v{nv}")
        writer = df.write.mode("overwrite")
        part = self._PARTITION_BY.get(name)
        if part:
            writer = writer.partitionBy(part)
        writer.parquet(out)
        m[name] = nv
        self._write_manifest(m)
        old = os.path.join(self.path, name, f"v{nv - 2}")
        if nv >= 3 and os.path.exists(old):  # retain one old snapshot
            shutil.rmtree(old, ignore_errors=True)

    # ------------------------------------------------------------- reads

    @property
    def vertices(self) -> DataFrame:
        return self._table("vertices", VERTEX_SCHEMA)

    @property
    def edges(self) -> DataFrame:
        return self._table("edges", EDGE_SCHEMA)

    @property
    def state_history(self) -> DataFrame:
        return self._table("state_history", STATE_SCHEMA)

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
        pregel layer."""
        e = self.edges
        if rel_type:
            e = e.where(F.col("rel_type") == rel_type)
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

    def upsert_nodes(self, updates: DataFrame) -> None:
        """M1 UpsertNode (controller.rs:171-175,252-276): create-if-
        absent, merge props if present; empty-props form = ensure-exists.

        ``updates``: (label, key, props?, observed_at?).
        """
        u = self._conform(updates, VERTEX_SCHEMA, with_id=True)
        u = self._dedup_latest(u, _VKEY)
        cur = self.vertices
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
        self._commit("vertices", merged)

    def ensure_edges(self, new_edges: DataFrame) -> None:
        """M2 EnsureEdge (controller.rs:178-183,278-314): MERGE both
        endpoints (stubs if absent) then MERGE the edge; idempotent.

        ``new_edges``: (src_label, src_key, dst_label, dst_key,
        rel_type, props?, observed_at?).
        """
        e = self._conform(new_edges, EDGE_SCHEMA)
        stubs = (
            e.select(F.col("src_label").alias("label"), F.col("src_key").alias("key"))
            .unionByName(
                e.select(F.col("dst_label").alias("label"), F.col("dst_key").alias("key"))
            )
            .distinct()
            .withColumn("props", F.create_map().cast("map<string,string>"))
            .withColumn("observed_at", F.lit(None).cast("string"))
        )
        self.upsert_nodes(stubs)
        e = self._dedup_latest(e, _EKEY)
        cur = self.edges
        merged = (
            cur.alias("t")
            .join(e.alias("s"), _EKEY, "full_outer")
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
        self._commit("edges", merged)

    def replace_edges(self, replacements: DataFrame) -> None:
        """M3 ReplaceEdge (controller.rs:186-192,315-337): atomically
        delete ALL outgoing ``rel_type`` edges of each (src, rel_type)
        in the batch, then create the single new edge — the
        latest-pointer pattern.

        ``replacements``: same shape as ensure_edges input; one row per
        (src, rel_type) after dedup (latest observed_at wins).
        """
        r = self._dedup_latest(
            self._conform(replacements, EDGE_SCHEMA), ["src_label", "src_key", "rel_type"]
        )
        sel = ["src_label", "src_key", "rel_type"]
        kept = self.edges.join(r.select(*sel).distinct(), sel, "left_anti")
        merged = kept.unionByName(r)
        # endpoints must exist (MERGE both sides)
        stubs = (
            r.select(F.col("src_label").alias("label"), F.col("src_key").alias("key"))
            .unionByName(
                r.select(F.col("dst_label").alias("label"), F.col("dst_key").alias("key"))
            )
            .distinct()
            .withColumn("props", F.create_map().cast("map<string,string>"))
            .withColumn("observed_at", F.lit(None).cast("string"))
        )
        self.upsert_nodes(stubs)
        self._commit("edges", merged)

    def remove_edges(self, selectors: DataFrame) -> None:
        """M4 RemoveEdges (controller.rs:194-198,339-354): delete all
        outgoing ``rel_type`` edges of each (src, rel_type) row."""
        sel = ["src_label", "src_key", "rel_type"]
        s = selectors.select(*sel).distinct()
        self._commit("edges", self.edges.join(s, sel, "left_anti"))

    def update_state(self, transitions: DataFrame) -> None:
        """M5 UpdateState (controller.rs:200-212,355-417): the 5-step
        temporal pattern, set-oriented —

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
        t = self._conform(transitions, STATE_SCHEMA)
        # (2) append-only history: only genuinely new instances append;
        # re-delivery of an already-recorded instance must not mutate it
        hist_keys = ["resource_label", "resource_key", "state_type", "instance_key"]
        w = Window.partitionBy(*hist_keys).orderBy(F.desc("valid_from"))
        t_dedup = t.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
        fresh = t_dedup.join(self.state_history.select(*hist_keys), hist_keys, "left_anti")
        self._commit("state_history", self.state_history.unionByName(fresh))

        inst_label = F.concat(F.col("state_type"), F.lit("State"))
        # (1) taxonomy node + resource + instance nodes
        nodes = (
            t.select(F.lit("State").alias("label"), F.col("state_type").alias("key"))
            .unionByName(t.select(F.col("resource_label").alias("label"), F.col("resource_key").alias("key")))
            .unionByName(t.select(inst_label.alias("label"), F.col("instance_key").alias("key")))
            .distinct()
            .withColumn("props", F.create_map().cast("map<string,string>"))
            .withColumn("observed_at", F.lit(None).cast("string"))
        )
        self.upsert_nodes(nodes)
        # instance props live on the instance vertex (immutable — only
        # fresh instances carry props here)
        self.upsert_nodes(
            fresh.select(
                F.concat(F.col("state_type"), F.lit("State")).alias("label"),
                F.col("instance_key").alias("key"),
                F.col("props"),
                F.col("valid_from").alias("observed_at"),
            )
        )
        # (3) + (4): append-only edges
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
        self.ensure_edges(trans.unionByName(of_type))
        # (5) pointer replace: newest instance per resource in this batch
        wp = Window.partitionBy("resource_label", "resource_key").orderBy(
            F.desc("valid_from"), F.desc("instance_key")
        )
        latest = t.withColumn("_rn", F.row_number().over(wp)).where(F.col("_rn") == 1).drop("_rn")
        self.replace_edges(
            latest.select(
                F.col("resource_label").alias("src_label"),
                F.col("resource_key").alias("src_key"),
                F.concat(F.col("state_type"), F.lit("State")).alias("dst_label"),
                F.col("instance_key").alias("dst_key"),
                F.lit("HAS_STATE").alias("rel_type"),
                F.lit(None).cast("map<string,string>").alias("props"),
                F.col("valid_from").alias("observed_at"),
            )
        )

    # ---------------------------------------------------------- helpers

    def _conform(self, df: DataFrame, schema: T.StructType, with_id: bool = False) -> DataFrame:
        cols = []
        for f in schema.fields:
            if f.name == "id" and with_id:
                cols.append(vertex_id("label", "key").alias("id"))
            elif f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)
