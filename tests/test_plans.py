"""Physical-plan shape assertions — the scan/join properties the 100 TB
posture depends on, checked against `.explain` output so a regression
in plan quality fails CI, not just a benchmark.

- predicate pushdown reaches the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema carries only used cols)
- dimension joins broadcast (BroadcastHashJoin, no shuffle of the fact)
- GraphStore partition pruning reads only the requested label's files
"""

import pytest
from pyspark.sql import functions as F

from polar_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    orders = load_table(spark, "orders", SF_DIR).where(F.col("o_custkey") < 100)
    plan = _plan(orders.select("o_orderkey"))
    assert "PushedFilters" in plan
    assert "LessThan(o_custkey,100)" in plan


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    plan = _plan(li.select("l_orderkey", "l_suppkey"))
    # ReadSchema must carry ONLY the projected columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_suppkey"}


def test_dimension_join_broadcasts(spark):
    """The flagship pattern: big edge/rank side joined to a small
    dimension must be a BroadcastHashJoin, not a shuffled sort-merge."""
    orders = load_table(spark, "orders", SF_DIR)
    nation = load_table(spark, "nation", SF_DIR)
    cust = load_table(spark, "customer", SF_DIR)
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).join(
        nation, cust.c_nationkey == nation.n_nationkey
    )
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan


def test_graph_store_partition_pruned_read(spark, tmp_path):
    """A label-filtered store read must list ONLY that label's partition
    directories (file-level pruning via the manifest, the Iceberg
    partition-spec equivalent)."""
    from polar_spark.operators.graph_store import GraphStore

    store = GraphStore(spark, str(tmp_path / "g"))
    rows = [("Pod", f"p{i}", None, None) for i in range(5)] + [
        ("Job", f"j{i}", None, None) for i in range(5)
    ]
    store.upsert_nodes(
        spark.createDataFrame(rows, "label string, key string, props map<string,string>, observed_at string")
    )
    pruned = store._table("vertices", ["Pod"])
    files = [
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("pv=Pod" in f for f in files)
    assert pruned.count() == 5


def test_cosine_pairs_stays_batched(spark):
    """The near-dup verify stage must never evaluate Python row-at-a-
    time.  Since the r6 optimization round the pair dot products run as
    ONE numpy accumulation per Arrow batch inside mapInPandas (guide
    §4.2 — the former zip_with/aggregate fold is CodegenFallback,
    interpreted per array element, measured 20x slower); the gate is
    therefore: exactly one batch-level Python node, no scalar
    BatchEvalPython, and the scan still at the bottom."""
    from polar_spark.operators.similarity import cosine_pairs

    emb = load_table(spark, "embeddings", SF_DIR)
    plan = _plan(cosine_pairs(emb, 0.35, max_rows=None))
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "MapInPandas" in plan  # the one vectorized batch stage
    assert "Scan parquet" in plan


def test_cosine_pairs_matches_jvm_fold(spark):
    """The batched numpy path accumulates dimension-by-dimension in
    ascending order — bit-identical to the JVM left-to-right aggregate
    fold it replaced.  Golden check against the old expression."""
    from pyspark.sql import functions as SF

    from polar_spark.operators.similarity import _normalized, cosine_pairs

    emb = load_table(spark, "embeddings", SF_DIR).limit(50)
    base = _normalized(emb, "embedding", "vec_id")
    a = base.select(SF.col("_id").alias("id_a"), SF.col("v").alias("va"))
    b = base.select(SF.col("_id").alias("id_b"), SF.col("v").alias("vb"))
    dot = SF.aggregate(
        SF.zip_with("va", "vb", lambda x, y: x * y), SF.lit(0.0), lambda a_, x: a_ + x
    )
    old = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in a.join(b, SF.col("id_a") < SF.col("id_b"))
        .select("id_a", "id_b", dot.alias("cos"))
        .where(SF.col("cos") >= 0.2)
        .collect()
    }
    new = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_pairs(emb, 0.2, max_rows=None).collect()
    }
    assert old == new  # exact float equality, not approx


# --------------------------------------------------------------------------
# Z-order layout


def test_zorder_key_matches_python_interleave(spark):
    from polar_spark.operators.layout import zorder_key

    def py_z(a, b, bits=21):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(a, b) for a in (0, 1, 7, 100, 2**20, 2**21 - 1) for b in (0, 3, 64, 2**21 - 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == py_z(a, b), (a, b)


def test_zorder_aligned_box_is_contiguous(spark):
    """An axis-aligned power-of-two box in key space is ONE contiguous
    Morton range — the property that makes file min/max stats tight on
    both columns after a z-order layout pass."""
    from polar_spark.operators.layout import zorder_key

    grid = spark.createDataFrame(
        [(a, b) for a in range(64) for b in range(64)], "a long, b long"
    ).select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z"))
    # the 16x16 box [16,32)x[32,48): 256 cells, z range exactly 256 wide
    box = grid.where("a >= 16 and a < 32 and b >= 32 and b < 48").agg(
        F.min("z").alias("lo"), F.max("z").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert box["n"] == 256
    assert box["hi"] - box["lo"] + 1 == 256


def test_zorder_layout_keeps_both_columns_tight(spark, tmp_path):
    """After the layout pass every output file's (min, max) span on
    EACH key column is far tighter than the global span — the file-
    skipping win, measured on the actual written files."""
    import pyarrow.parquet as pq

    from polar_spark.operators.layout import zorder_layout

    n = 64
    df = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(n)], "a long, b long"
    )
    out = str(tmp_path / "zorder")
    zorder_layout(df, "a", "b", num_partitions=16).write.parquet(out)
    import glob

    spans_a, spans_b = [], []
    for f in glob.glob(out + "/*.parquet"):
        t = pq.read_table(f)
        aa, bb = t["a"].to_pylist(), t["b"].to_pylist()
        if aa:
            spans_a.append(max(aa) - min(aa))
            spans_b.append(max(bb) - min(bb))
    # global span is 63; a z-ordered 16-file layout keeps the AVERAGE
    # per-file span of BOTH columns well under half the global span
    # (a single-column sort would leave column b's spans at ~63)
    assert sum(spans_a) / len(spans_a) < 32, spans_a
    assert sum(spans_b) / len(spans_b) < 32, spans_b


def test_semdedup_pair_join_stays_jvm(spark):
    """SemDedup's within-cluster verification must stay whole-stage
    JVM (zip_with/aggregate dot products — no EvalPython) and join on
    the cluster key, not as a cartesian of the corpus."""
    from polar_spark.operators.similarity import semdedup

    emb = load_table(spark, "embeddings", SF_DIR)
    out = semdedup(emb, k=4, n_iter=1, threshold=0.9)
    plan = _plan(out)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_eigenvector_rounds_stay_jvm(spark):
    from polar_spark.plans import pregel

    edf = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    out = pregel.eigenvector_centrality(edf, n_iter=2)
    plan = _plan(out)
    assert "EvalPython" not in plan


def test_heavy_hitters_probe_broadcasts(spark, tmp_path):
    """The streaming heavy-hitter candidate refresh probes the merged
    sketch via broadcast — the probe side must not shuffle the sketch."""
    from polar_spark.streaming.topk_stream import HeavyHittersMaintainer

    m = HeavyHittersMaintainer(spark, str(tmp_path / "hh"), key_col="k")
    m.apply_batch(spark.createDataFrame([(x % 5,) for x in range(50)], "k long"), 0)
    from polar_spark.operators.sketches import cm_estimate

    probe = cm_estimate(m.sketch(), spark.range(5).select(F.col("id").alias("k")), "k")
    assert "BroadcastHashJoin" in _plan(probe)


def test_weighted_bernoulli_is_pure_pushdown_filter(spark):
    """The hash-coin keep decision must stay a map-stage filter: no
    Exchange, no Python eval — the plan a 100 TB corpus filter needs."""
    from polar_spark.operators.sampling import weighted_bernoulli

    docs = load_table(spark, "documents", SF_DIR)
    kept = weighted_bernoulli(docs, "n_chars", 2000, id_col="doc_id", seed=37)
    plan = _plan(kept.select("doc_id"))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_quantize_int8_dim_stats_broadcast(spark):
    """Per-dimension min/max (64 rows) must come back via broadcast —
    the exploded fact side never reshuffles on pos."""
    from polar_spark.operators.similarity import quantize_int8

    emb = load_table(spark, "embeddings", SF_DIR)
    out = quantize_int8(emb)
    assert "BroadcastHashJoin" in _plan(out)


def test_louvain_gain_scan_stays_jvm(spark):
    """The modularity-gain candidate table is pure JVM arithmetic —
    no Python eval anywhere in the sweep."""
    from polar_spark.plans import pregel

    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 2.0), (3, 2, 2.0)],
        "src long, dst long, w double",
    )
    out = pregel.louvain_move(e)
    assert "Python" not in _plan(out)


def test_hnsw_plan_one_mapinpandas_no_cross(spark):
    """hnsw_topk: exactly ONE python stage (the per-shard index+search
    fold) and no cartesian product anywhere — the shard fan-out is a
    single repartition, the reduce a window."""
    from polar_spark.operators.similarity import hnsw_topk

    import re

    emb = load_table(spark, "embeddings", SF_DIR)
    plan = _plan(hnsw_topk(emb, query_ids=[0, 1, 2], k=3, n_shards=4))
    # formatted plans list each node in tree + detail: count detail headers
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_lsh_multiprobe_plan_no_cross_join(spark):
    """Multiprobe LSH: probe×index candidate generation is an equi-join
    on (table, key) — never a cartesian product; exact rerank joins are
    equi-joins on ids."""
    from polar_spark.operators.similarity import cosine_topk_lsh

    emb = load_table(spark, "embeddings", SF_DIR)
    out = cosine_topk_lsh(emb, k=3)
    # cosine_topk_lsh localCheckpoints its result; build the same plan
    # unexecuted for inspection instead
    from polar_spark.operators import similarity as sim
    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window

    base = sim._normalized(emb, "embedding", "vec_id")
    keys = sim._hyperplane_keys(base, 64, 10, 5, 7)
    probes = sim._hyperplane_keys(base, 64, 10, 5, 7, multiprobe=1)
    cand = probes.select("table", "key", F2.col("_id").alias("query_id")).join(
        keys.select("table", "key", F2.col("_id").alias("neighbor_id")),
        ["table", "key"],
    )
    plan = _plan(cand)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert out.count() > 0  # executed path sanity
