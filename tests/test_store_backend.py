"""GraphStore storage-contract tests, parameterized over the backend
seam — the suite a real Iceberg catalog must pass to drop in via
``GraphStore(..., backend=IcebergBackend(...))``.

Only ``VersionedParquetBackend`` is constructible in this environment
(no Iceberg jars); the parameterization is the point: every assertion
goes through the ``StoreBackend`` interface, never the parquet layout.
"""

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.graph_store import GraphStore
from polar_spark.operators.store_backend import (
    IcebergBackend,
    StoreBackend,
    VersionedParquetBackend,
)

BACKENDS = ["versioned_parquet"]


def _make_store(spark, tmp_path, backend_name, **kw) -> GraphStore:
    # each backend constructs through the seam explicitly
    if backend_name == "versioned_parquet":
        from polar_spark.operators.graph_store import _SCHEMAS

        be = VersionedParquetBackend(
            spark,
            str(tmp_path / backend_name),
            schemas=_SCHEMAS,
            partition_by=GraphStore._PARTITION_BY,
            bucket_by=GraphStore._BUCKET_BY,
            **kw,
        )
        return GraphStore(spark, str(tmp_path / backend_name), backend=be)
    raise ValueError(backend_name)


@pytest.mark.parametrize("backend_name", BACKENDS)
def test_contract_upsert_idempotent_and_snapshot_versions(spark, tmp_path, backend_name):
    store = _make_store(spark, tmp_path, backend_name)
    batch = spark.createDataFrame(
        [("Repo", "r1", {"lang": "rust"}, "2024-01-01")],
        "label string, key string, props map<string,string>, observed_at string",
    )
    for _ in range(3):
        store.upsert_nodes(batch)
    assert store.vertices.count() == 1
    assert store.version == 3  # every commit advances the snapshot


@pytest.mark.parametrize("backend_name", BACKENDS)
def test_contract_multi_table_atomic_commit(spark, tmp_path, backend_name):
    """ensure_edges lands stubs + edges in ONE snapshot: the pre-commit
    version has neither, the post-commit version has both."""
    store = _make_store(spark, tmp_path, backend_name)
    v0 = store.version
    edges = spark.createDataFrame(
        [("Repo", "r1", "File", "f1", "CONTAINS")],
        "src_label string, src_key string, dst_label string, dst_key string, rel_type string",
    )
    store.ensure_edges(edges)
    assert store.version == v0 + 1
    assert store.vertices.count() == 2 and store.edges.count() == 1
    # time travel to v0: empty on BOTH tables (atomicity)
    assert store.table_at("vertices", v0).count() == 0 if v0 else True


@pytest.mark.parametrize("backend_name", BACKENDS)
def test_contract_time_travel_and_retention(spark, tmp_path, backend_name):
    store = _make_store(spark, tmp_path, backend_name, retention=3)
    for i in range(4):
        store.upsert_nodes(
            spark.createDataFrame(
                [("Repo", f"r{i}", None, None)],
                "label string, key string, props map<string,string>, observed_at string",
            )
        )
    assert store.vertices.count() == 4
    # horizon: last 3 snapshots retained
    versions = [s["version"] for s in store.snapshots()]
    assert versions == [2, 3, 4]
    assert store.table_at("vertices", 2).count() == 2
    with pytest.raises(ValueError):
        store.table_at("vertices", 1)


@pytest.mark.parametrize("backend_name", BACKENDS)
def test_contract_cell_reads_and_drain(spark, tmp_path, backend_name):
    store = _make_store(spark, tmp_path, backend_name)
    edges = spark.createDataFrame(
        [("A", "a", "B", "b", "REL"), ("A", "a2", "B", "b2", "OTHER")],
        "src_label string, src_key string, dst_label string, dst_key string, rel_type string",
    )
    store.ensure_edges(edges)
    # partition-pruned read through the seam
    assert store._table("edges", ["REL"]).count() == 1
    # drain: removing the only REL edge drops the cell
    store.remove_edges(
        spark.createDataFrame(
            [("A", "a", "REL")], "src_label string, src_key string, rel_type string"
        )
    )
    assert store._table("edges", ["REL"]).count() == 0
    assert store._table("edges", ["OTHER"]).count() == 1


@pytest.mark.parametrize("backend_name", BACKENDS)
def test_contract_compaction_preserves_current_table(spark, tmp_path, backend_name):
    store = _make_store(spark, tmp_path, backend_name)
    for i in range(5):
        store.upsert_nodes(
            spark.createDataFrame(
                [("Repo", f"r{i}", {"n": str(i)}, "2024-01-01")],
                "label string, key string, props map<string,string>, observed_at string",
            )
        )
    before = sorted(
        (r["label"], r["key"]) for r in store.vertices.select("label", "key").collect()
    )
    store.compact("vertices")
    after = sorted(
        (r["label"], r["key"]) for r in store.vertices.select("label", "key").collect()
    )
    assert before == after


def test_iceberg_backend_documents_required_conf():
    """The Iceberg adapter is present as a documented seam: it raises
    until the runtime jars exist, and its docstring carries the conf."""
    assert issubclass(IcebergBackend, StoreBackend)
    with pytest.raises(ImportError, match="iceberg-spark-runtime"):
        IcebergBackend()
    doc = IcebergBackend.__doc__
    assert "MERGE INTO" in doc and "spark.sql.catalog" in doc


# ---------------------------------------------------------------------------
# Iceberg adapter golden-text contract (checkable without the jars)


def test_iceberg_sql_builders_golden():
    from pyspark.sql import types as T

    from polar_spark.operators.store_backend import IcebergBackend as IB

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("label", T.StringType()),
            T.StructField("props", T.MapType(T.StringType(), T.StringType())),
            T.StructField("updated_at", T.LongType()),
        ]
    )
    assert IB.ddl_create_table(
        "polar.graph.vertices", schema, "label", ["key"], 8
    ) == (
        "CREATE TABLE IF NOT EXISTS polar.graph.vertices "
        "(key STRING, label STRING, props MAP<STRING,STRING>, updated_at BIGINT) "
        "USING iceberg PARTITIONED BY (label, bucket(8, key)) "
        "TBLPROPERTIES ('format-version'='2', 'write.merge.mode'='merge-on-read')"
    )
    assert IB.sql_merge_into(
        "polar.graph.vertices", ["key"], ["key", "label", "updated_at"], "staged_v"
    ) == (
        "MERGE INTO polar.graph.vertices t USING staged_v s ON t.key = s.key "
        "WHEN MATCHED THEN UPDATE SET t.label = s.label, t.updated_at = s.updated_at "
        "WHEN NOT MATCHED THEN INSERT (key, label, updated_at) "
        "VALUES (s.key, s.label, s.updated_at)"
    )
    assert IB.sql_read_pruned(
        "polar.graph.vertices", "label", ["GitlabPipeline", "KubePod"],
        bucket_pred="bucket_id IN (0, 3)",
    ) == (
        "SELECT * FROM polar.graph.vertices WHERE label IN "
        "('GitlabPipeline', 'KubePod') AND bucket_id IN (0, 3)"
    )
    assert IB.sql_delete_cells("polar.graph.edges", "rel_type", ["OWNS"]) == (
        "DELETE FROM polar.graph.edges WHERE rel_type IN ('OWNS')"
    )
    assert IB.sql_time_travel("polar.graph.vertices", 4242) == (
        "SELECT * FROM polar.graph.vertices VERSION AS OF 4242"
    )
    assert IB.sql_snapshots("polar.graph.vertices") == (
        "SELECT snapshot_id, committed_at, operation FROM "
        "polar.graph.vertices.snapshots ORDER BY committed_at"
    )
    assert IB.sql_compact("polar", "graph.vertices") == (
        "CALL polar.system.rewrite_data_files(table => 'graph.vertices', "
        "strategy => 'binpack')"
    )
    assert IB.sql_expire_snapshots("polar", "graph.vertices", 8) == (
        "CALL polar.system.expire_snapshots(table => 'graph.vertices', "
        "retain_last => 8)"
    )
    assert IB.sql_wap_publish("polar", "graph.vertices", "wap_commit_17") == (
        "CALL polar.system.fast_forward(table => 'graph.vertices', "
        "branch => 'main', to => 'wap_commit_17')"
    )


def test_iceberg_ddl_strings_parse_in_spark(spark):
    """The DML/SELECT statements must at least PARSE in Spark's SQL
    parser (catalyst accepts MERGE INTO / VERSION AS OF syntactically
    even without an Iceberg catalog) — catches malformed SQL the golden
    text alone would pin wrong."""
    from polar_spark.operators.store_backend import IcebergBackend as IB

    for stmt in [
        IB.sql_merge_into("c.d.t", ["key"], ["key", "label"], "s_view"),
        IB.sql_read_pruned("c.d.t", "label", ["A"]),
        IB.sql_time_travel("c.d.t", 1),
        IB.sql_delete_cells("c.d.t", "label", ["A"]),
    ]:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(stmt)
        assert plan is not None
