"""Storage-backend seam for :class:`~polar_spark.operators.graph_store.GraphStore`.

The graph-store engine (merge semantics, dedup, state algebra) is
backend-independent; everything PHYSICAL — snapshot commits, cell
layout, time travel, GC, compaction — lives behind the
:class:`StoreBackend` contract so a table format with native snapshot
isolation (Iceberg) can drop in without touching the engine.

Backend contract (all cell addresses are ``(partition_value, bucket)``
tuples; ``bucket = hash(mutation key) % buckets``):

- ``table(name, values=None)`` — current snapshot, optionally pruned to
  the given partition values.
- ``read_cells(name, cells)`` — current rows of exactly the given
  cells (absent cells read as empty).  The engine's merges are
  bucket-pruned through this.
- ``commit(writes)`` — ``writes`` is ``[(name, df, touched_cells)]``;
  ALL tables move in ONE atomic snapshot; a touched cell whose new
  content is empty is dropped (drain).
- ``table_at(name, version)`` / ``snapshots()`` / ``version`` — time
  travel within the retention horizon.
- ``compact(name)`` — rewrite-data-files maintenance action.
- ``buckets`` / ``bucket_expr(name)`` — the physical bucket routing
  (a layout constant per store).

``VersionedParquetBackend`` implements the contract on a minimal
versioned-parquet format (this environment has no Iceberg jars).
``IcebergBackend`` documents the 1:1 mapping onto a real Iceberg
catalog and raises until the runtime jars are present.

Reference parity: the reference funnels every write through one
serialized actor transaction (/root/reference/src/agents/lib/src/graph/
controller.rs:168-229); the snapshot-atomic multi-table ``commit`` here
is the set-oriented equivalent of that per-op transaction.
"""

from __future__ import annotations

import json
import os
import shutil
from abc import ABC, abstractmethod
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Cell = tuple[str, int]


class StoreBackend(ABC):
    """Cell-addressed snapshot store: the physical half of GraphStore."""

    buckets: int

    @abstractmethod
    def table(self, name: str, values: list[str] | None = None) -> DataFrame: ...

    @abstractmethod
    def read_cells(self, name: str, cells: list[Cell]) -> DataFrame: ...

    @abstractmethod
    def commit(self, writes: list[tuple[str, DataFrame, list[Cell]]]) -> None: ...

    @abstractmethod
    def table_at(self, name: str, version: int) -> DataFrame: ...

    @abstractmethod
    def snapshots(self) -> list[dict]: ...

    @property
    @abstractmethod
    def version(self) -> int: ...

    @abstractmethod
    def compact(self, name: str) -> None: ...

    @abstractmethod
    def bucket_expr(self, name: str) -> F.Column: ...


class VersionedParquetBackend(StoreBackend):
    """The minimal Iceberg-equivalent on plain parquet: immutable
    ``v{n}`` version directories + a JSON manifest whose atomic rename
    is the commit point.  Commit I/O is O(touched cells); the manifest
    retains ``retention`` snapshots (time travel + reader pinning);
    unreferenced version dirs are GC'd; fragmented tables auto-compact
    every ``compact_every`` commits."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schemas: dict[str, T.StructType],
        partition_by: dict[str, str],
        bucket_by: dict[str, list[str]],
        retention: int = 8,
        buckets: int = 8,
        compact_every: int = 64,
        collect_stats: bool = False,
    ):
        self.spark = spark
        self.path = path
        self._schemas = schemas
        self._partition_by = partition_by
        self._bucket_by = bucket_by
        self.retention = max(1, retention)
        self.compact_every = compact_every
        self.collect_stats = collect_stats
        os.makedirs(path, exist_ok=True)
        self._manifest_path = os.path.join(path, "manifest.json")
        if not os.path.exists(self._manifest_path):
            self._write_manifest(
                {
                    "version": 0,
                    "buckets": max(1, buckets),
                    "last_compact": 0,
                    "tables": {n: {} for n in schemas},
                    "history": [],
                }
            )
        # bucket count is a physical layout constant per store — reopening
        # with a different value would mis-route merge pruning
        self.buckets = int(self._manifest().get("buckets", max(1, buckets)))

    # ------------------------------------------------------------- io

    def _manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def bucket_expr(self, name: str) -> F.Column:
        return F.pmod(F.xxhash64(*self._bucket_by[name]), F.lit(self.buckets))

    @staticmethod
    def _cell_key(value: str, bucket: int) -> str:
        # bucket first: value may contain any character, the int prefix
        # and first '|' make the composite unambiguous
        return f"{bucket}|{value}"

    @staticmethod
    def _cell_value(cell: str) -> str:
        return cell.split("|", 1)[1]

    def _read_parts(self, name: str, parts: dict[str, dict]) -> DataFrame:
        schema = self._schemas[name]
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

    # ------------------------------------------------------- contract

    def table(self, name: str, values: list[str] | None = None) -> DataFrame:
        return self._read_parts(name, self._parts_for(name, values))

    def read_cells(self, name: str, cells: list[Cell]) -> DataFrame:
        want = {self._cell_key(v, b) for v, b in cells}
        parts = {ck: p for ck, p in self._manifest()["tables"][name].items() if ck in want}
        return self._read_parts(name, parts)

    def table_at(self, name: str, version: int) -> DataFrame:
        for snap in self._manifest()["history"]:
            if snap["version"] == version:
                return self._read_parts(name, snap["tables"][name])
        raise ValueError(
            f"version {version} not retained (horizon = last {self.retention} commits)"
        )

    def snapshots(self) -> list[dict]:
        return list(self._manifest()["history"])

    @property
    def version(self) -> int:
        return self._manifest()["version"]

    def commit(
        self, writes: list[tuple[str, DataFrame, list[Cell]]], _auto: bool = True
    ) -> None:
        """Write ONLY each batch's touched cells into a shared new
        version dir, then repoint every touched cell in ONE manifest
        swap — readers see all tables move together.  A touched cell
        that ends up empty loses its pointer."""
        writes = [(n, df, t) for n, df, t in writes if t]
        if not writes:
            return
        m = self._manifest()
        nv = m["version"] + 1
        sep = "\x1f"
        for name, df, touched in writes:
            out = os.path.join(self.path, name, f"v{nv}")
            pc = self._partition_by[name]
            cell = F.concat_ws(sep, F.col(pc), self.bucket_expr(name).cast("string"))
            keys = [f"{v}{sep}{b}" for v, b in touched]
            # duplicate partition/bucket cols so data files keep them —
            # single-cell reads need no directory-name reconstruction.
            # Repartition to ~one task per touched cell so every cell
            # lands as ONE file (dynamic partitionBy otherwise sprays a
            # file per task × cell).
            (
                df.where(cell.isin(keys))
                .withColumn("pv", F.col(pc))
                .withColumn("pb", self.bucket_expr(name))
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
        snap = {"version": nv, "tables": {t: dict(m["tables"][t]) for t in self._schemas}}
        if self.collect_stats:
            snap["stats"] = {}
            for name, _df, touched in writes:
                pc = self._partition_by[name]
                values = sorted({v for v, _b in touched})
                want = set(values)
                parts = {
                    k: v for k, v in m["tables"][name].items() if self._cell_value(k) in want
                }
                cur = self._read_parts(name, parts)
                stats = cur.groupBy(pc).count().collect()
                snap["stats"][name] = {r[pc]: r["count"] for r in stats}
        m["history"] = (m["history"] + [snap])[-self.retention :]
        self._write_manifest(m)
        self._gc(m)
        if _auto and self.compact_every and nv - m.get("last_compact", 0) >= self.compact_every:
            self._auto_compact(nv)

    def _gc(self, m: dict) -> None:
        """Drop version dirs referenced by no retained snapshot — readers
        pinned to any retained snapshot keep every file they can see."""
        for name in self._schemas:
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
        commits (the Iceberg rewrite-data-files maintenance action)."""
        parts = self._manifest()["tables"][name]
        if not parts:
            return
        touched = []
        for ck in parts:
            bucket, value = ck.split("|", 1)
            touched.append((value, int(bucket)))
        self.commit([(name, self._read_parts(name, parts), touched)], _auto=_auto)

    def _auto_compact(self, nv: int) -> None:
        m = self._manifest()
        for name in self._schemas:
            versions = {p["v"] for p in m["tables"][name].values()}
            if len(versions) > 4:
                self.compact(name, _auto=False)
        m = self._manifest()
        m["last_compact"] = m["version"]
        self._write_manifest(m)


class IcebergBackend(StoreBackend):
    """Adapter onto a real Iceberg catalog — requires the Iceberg Spark
    runtime jars, absent from this environment, so the constructor
    raises with the required conf.  The contract maps 1:1:

    - ``table(name, values)`` → ``spark.table(f"{catalog}.{db}.{name}")``
      with a partition-column predicate (Iceberg partition pruning).
    - ``read_cells`` → the same scan with an additional
      ``bucket_col IN (...)`` predicate over the table's hidden
      ``bucket(N, key)`` partition transform.
    - ``commit`` → one transaction: per table a ``MERGE INTO`` (or
      ``overwrite_partitions``) of the touched cells; multi-table
      atomicity via a single-catalog transaction (Iceberg ≥1.4) or a
      WAP (write-audit-publish) branch promoted once.
    - ``table_at`` → ``VERSION AS OF`` / ``snapshot_id``.
    - ``snapshots`` → the ``<table>.snapshots`` metadata table.
    - ``compact`` → ``CALL catalog.system.rewrite_data_files(...)``.
    - retention/GC → ``expire_snapshots``.

    Spark conf to enable (then drop this class in as
    ``GraphStore(..., backend=IcebergBackend(...))``):

    .. code-block:: text

        spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
        spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
        spark.sql.catalog.polar=org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.polar.type=hadoop
        spark.sql.catalog.polar.warehouse=<warehouse path>
    """

    def __init__(self, *_args, **_kwargs):
        raise ImportError(
            "IcebergBackend needs the iceberg-spark-runtime jars on the "
            "session (not present in this environment); see the class "
            "docstring for the required Spark conf"
        )

    # -------------------------------------------------------- SQL builders
    # The exact statements the contract methods run once construction
    # succeeds.  Static so they are testable WITHOUT the jars: the
    # golden-text contract suite (tests/test_store_backend.py) pins each
    # one, making the adapter's SQL reviewable/checkable in this env.

    @staticmethod
    def ddl_create_table(
        fq: str, schema: T.StructType, partition_col: str, bucket_by: list[str], buckets: int
    ) -> str:
        cols = ", ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields)
        transforms = [f"{partition_col}"] + [f"bucket({buckets}, {c})" for c in bucket_by]
        return (
            f"CREATE TABLE IF NOT EXISTS {fq} ({cols}) USING iceberg "
            f"PARTITIONED BY ({', '.join(transforms)}) "
            f"TBLPROPERTIES ('format-version'='2', 'write.merge.mode'='merge-on-read')"
        )

    @staticmethod
    def sql_merge_into(fq: str, key_cols: list[str], cols: list[str], source_view: str) -> str:
        on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in key_cols)
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {fq} t USING {source_view} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    @staticmethod
    def sql_delete_cells(fq: str, partition_col: str, values: list[str]) -> str:
        in_list = ", ".join(f"'{v}'" for v in values)
        return f"DELETE FROM {fq} WHERE {partition_col} IN ({in_list})"

    @staticmethod
    def sql_read_pruned(
        fq: str, partition_col: str, values: list[str], bucket_pred: str | None = None
    ) -> str:
        in_list = ", ".join(f"'{v}'" for v in values)
        where = f"{partition_col} IN ({in_list})"
        if bucket_pred:
            where += f" AND {bucket_pred}"
        return f"SELECT * FROM {fq} WHERE {where}"

    @staticmethod
    def sql_time_travel(fq: str, snapshot_id: int) -> str:
        return f"SELECT * FROM {fq} VERSION AS OF {snapshot_id}"

    @staticmethod
    def sql_snapshots(fq: str) -> str:
        return (
            f"SELECT snapshot_id, committed_at, operation FROM {fq}.snapshots "
            f"ORDER BY committed_at"
        )

    @staticmethod
    def sql_compact(catalog: str, db_table: str) -> str:
        return (
            f"CALL {catalog}.system.rewrite_data_files("
            f"table => '{db_table}', strategy => 'binpack')"
        )

    @staticmethod
    def sql_expire_snapshots(catalog: str, db_table: str, retain_last: int) -> str:
        return (
            f"CALL {catalog}.system.expire_snapshots("
            f"table => '{db_table}', retain_last => {retain_last})"
        )

    @staticmethod
    def sql_wap_publish(catalog: str, db_table: str, branch: str) -> str:
        # multi-table atomicity: stage every table's MERGE on a WAP
        # branch, then fast-forward main to it once — one commit point
        return (
            f"CALL {catalog}.system.fast_forward("
            f"table => '{db_table}', branch => 'main', to => '{branch}')"
        )

    # contract methods unreachable until construction succeeds
    def table(self, name, values=None):  # pragma: no cover
        raise NotImplementedError

    def read_cells(self, name, cells):  # pragma: no cover
        raise NotImplementedError

    def commit(self, writes):  # pragma: no cover
        raise NotImplementedError

    def table_at(self, name, version):  # pragma: no cover
        raise NotImplementedError

    def snapshots(self):  # pragma: no cover
        raise NotImplementedError

    @property
    def version(self):  # pragma: no cover
        raise NotImplementedError

    def compact(self, name):  # pragma: no cover
        raise NotImplementedError

    def bucket_expr(self, name):  # pragma: no cover
        raise NotImplementedError
