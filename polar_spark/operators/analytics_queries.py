"""Driver-contract queries: each entry pairs a Spark DataFrame plan with
an ANSI-SQL oracle (DuckDB) over the same parquet tables.

Graph queries run over edge tables derived from the TPC-H-ish star
schema (FIXTURES.md §8): the *supplier co-part graph* (suppliers joined
by sharing a part in ``lineitem``) and the *customer→supplier* demand
graph (via ``orders ⨝ lineitem``).  These stand in for the repo-
dependency DEPENDS_ON table of the north star so that every link-graph
operator has a SQL-expressible cross-engine oracle; the same engine
functions run on the extracted source-code edge table in the benchmark.

Parity rules (driver compares row count + schema + order-insensitive
value hash):
- every computed column is explicitly aliased identically on both sides;
- aggregates are cast (DuckDB SUM(bigint) is HUGEINT, Spark is long);
- floating-point results are rounded (7 d.p. for rank scores, 6 for
  similarities) so cross-engine summation-order noise cannot flip bits.
"""

from __future__ import annotations

import math as _math

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.plans import pregel
from polar_spark.sources.tables import load_table

DAMPING = 0.85

# --------------------------------------------------------------------------
# derived edge tables


def _pair_expand(grouped: DataFrame, arr: str = "ps") -> DataFrame:
    """All (src < dst) pairs from a distinct-element array column, as
    two codegen'd Generate (explode) nodes + a value filter.  Replaces
    the distinct-self-join pair build: the grouped arrays arrive off
    ONE exchange (map-side partial ``collect_set``), the join's second
    exchange and its hash build disappear, and only the narrow pair
    rows hit the final distinct's shuffle (guide §2.3/§2.4 — shuffle
    fewer bytes, remove shuffles outright).  The ``src < dst`` VALUE
    comparison canonicalizes pairs without sorting the array, and the
    double explode runs in whole-stage codegen — A/B vs the previous
    interpreted ``transform(slice(...))`` fold: 2.1-2.9 s vs 4.8-8.1 s
    on the sf0.1 co-part build, identical pair multiset (set-valued
    arrays ⇒ exactly one emission per unordered pair per group).
    Group sizes are bounded by the per-key fan-out, so the quadratic
    expansion is a constant per group at any scale."""
    return (
        grouped.select(F.explode(arr).alias("src"), F.col(arr).alias("_a"))
        .select("src", F.explode("_a").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )


def copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected supplier co-part edges: (src < dst) supplier
    pairs sharing ≥1 part.  The J4-style content-hash identity join of
    the reference (same key observed in two streams —
    /root/reference/src/agents/build-processor/src/linker.rs:284-297)
    re-expressed on the test schema.  Built by grouping suppliers per
    part and expanding pairs JVM-side (see :func:`_pair_expand`) — one
    exchange feeds the expansion instead of the distinct + self-join's
    two."""
    li = load_table(spark, "lineitem", sf_dir)
    groups = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .groupBy("p")
        .agg(F.collect_set("s").alias("ps"))
        .where(F.size("ps") >= 2)
    )
    return _pair_expand(groups).distinct()


_COPART_SQL = """
pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
und AS (SELECT DISTINCT a.s AS src, b.s AS dst
        FROM pairs a JOIN pairs b ON a.p = b.p AND a.s < b.s)
"""


def coorder_edges(
    spark: SparkSession, sf_dir: str, part_cap: int | None = None
) -> DataFrame:
    """Canonical undirected part co-order edges: (src < dst) part pairs
    appearing in the same order.  Unlike the supplier co-part graph —
    which is near-COMPLETE at every sf (every supplier pair shares ≥5
    parts), making triangle counts degenerate — this graph is sparse
    (~0.6% density at sf0.1, max degree ~200) with real community
    structure, so the iterative-algorithm benchmarks measure structure,
    not a clique.

    Built by grouping parts per order and expanding (src < dst) pairs
    JVM-side (:func:`_pair_expand`): one exchange (map-side partial
    collect_set) + the pair distinct, vs the former distinct + self-
    join + distinct (guide §2.4).  ``part_cap`` pre-filters
    ``l_partkey < part_cap`` at the SCAN (PushedFilters), equivalent to
    filtering both pair endpoints afterwards — callers that cap the
    graph pass it here so pushdown survives the rewrite."""
    li = load_table(spark, "lineitem", sf_dir)
    if part_cap is not None:
        li = li.where(F.col("l_partkey") < F.lit(part_cap))
    groups = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.collect_set("p").alias("ps"))
        .where(F.size("ps") >= 2)
    )
    return _pair_expand(groups).distinct()


_COORDER_SQL = """
op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)
"""


def _sym(und: DataFrame) -> DataFrame:
    return und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


_SYM_SQL = "e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)"


def demand_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→supplier demand edges via orders ⨝ lineitem."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )


# --------------------------------------------------------------------------
# queries


def q_copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copart_edges(spark, sf_dir).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


def q_top_depended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 in-degree ('most depended upon') with deterministic top-10."""
    e = demand_edges(spark, sf_dir)
    return (
        e.groupBy(F.col("dst").alias("s_suppkey"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("s_suppkey"))
        .limit(10)
    )


def q_pagerank_fixed5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _sym(copart_edges(spark, sf_dir))
    ranks = pregel.pagerank_fixed(e, n_iter=5, damping=DAMPING)
    return ranks.select("id", F.round("rank", 7).alias("rank_r")).orderBy("id")


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = copart_edges(spark, sf_dir)
    comp, _ = pregel.connected_components(e)
    return comp.select(F.col("id").cast("long"), F.col("comp").cast("long")).orderBy("id")


def q_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-star/small-star CC — same recursive-CTE oracle as the
    hash-min path (both must be exact-equal)."""
    e = copart_edges(spark, sf_dir)
    comp, _ = pregel.connected_components_star(e)
    return comp.select(F.col("id").cast("long"), F.col("comp").cast("long")).orderBy("id")


def q_lpa_fixed2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = copart_edges(spark, sf_dir)
    labels, _ = pregel.label_propagation(e, max_iter=2)
    return labels.select(F.col("id").cast("long"), F.col("label").cast("long")).orderBy("id")


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = copart_edges(spark, sf_dir)
    per_vertex, _total = pregel.triangle_count(e)
    return per_vertex.select(
        F.col("id").cast("long"), F.col("triangles").cast("long")
    ).orderBy("id")


def q_coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return coorder_edges(spark, sf_dir).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


def q_triangles_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-vertex triangles on the sparse co-order graph — the
    non-degenerate counterpart of ``triangles``."""
    e = coorder_edges(spark, sf_dir)
    per_vertex, _total = pregel.triangle_count(e)
    return per_vertex.select(
        F.col("id").cast("long"), F.col("triangles").cast("long")
    ).orderBy("id")


def q_ppr_fixed3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from supplier seeds {1,2} (fixed 3 rounds,
    SQL-expressible teleport-to-seeds formulation)."""
    e = _sym(copart_edges(spark, sf_dir))
    ranks = pregel.personalized_pagerank_fixed(e, sources=[1, 2], n_iter=3, damping=DAMPING)
    return ranks.select("id", F.round("rank", 7).alias("rank_r")).orderBy("id")


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability (Cypher's ``-[*1..k]->``): BFS hop
    distances from the smallest part id over the undirected co-order
    graph, depth-bounded at 8."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    src0 = e.agg(F.min("src")).collect()[0][0]
    dist, _ = pregel.bfs_distances(e, sources=[int(src0)], max_depth=8)
    return dist.select(F.col("id").cast("long"), F.col("dist").cast("int")).orderBy("id")


def q_pagerank_weighted4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-weighted PageRank on the demand graph: weight = number of
    order lines tying customer to supplier (dependency strength)."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )
    ranks = pregel.pagerank_weighted_fixed(e, n_iter=4, damping=DAMPING)
    return ranks.select("id", F.round("rank", 7).alias("rank_r")).orderBy("id")


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-order graph (A4 family: the first
    thing anyone profiles about a link graph)."""
    e = _sym(coorder_edges(spark, sf_dir))
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    return deg.groupBy("deg").agg(F.count("*").alias("n_vertices"))


def q_edge_embeddedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction features per existing edge: common-neighbor count
    and Adamic-Adar score (Σ 1/ln(deg w) over common neighbors w) on the
    sparse co-order graph — the neighborhood-overlap primitives used to
    score candidate links at corpus scale.  Restricted to pairs < 400 to
    keep the oracle cheap."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    sym = _sym(coorder_edges(spark, sf_dir))
    deg = sym.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("dw"))
    su = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    sv = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    pairs = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    common = (
        pairs.join(su, "u")
        .join(sv, ["v", "w"])
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("dw").cast("double"))), 6).alias("adamic_adar"),
        )
    )
    return pairs.join(common, ["u", "v"], "left").select(
        "u",
        "v",
        F.coalesce(F.col("common_neighbors"), F.lit(0)).alias("common_neighbors"),
        F.coalesce(F.col("adamic_adar"), F.lit(0.0)).alias("adamic_adar"),
    )


def q_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 'current state' pointer as a window view (latest event per
    user — controller.rs:390-414 analog)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.unix_timestamp("ts").alias("ts_epoch"),
            F.round("value", 2).alias("value_r"),
        )
    )


def q_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only history rollup per resource (A1/A4 family)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min(F.unix_timestamp("ts")).alias("first_epoch"),
        F.max(F.unix_timestamp("ts")).alias("last_epoch"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 batch-dedup semantics: duplicate keys in one batch collapse,
    latest wins, deterministically."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_obs", F.count("*").over(Window.partitionBy("user_id", "event_type")))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.round("value", 2).alias("last_value"),
            F.col("n_obs").cast("long"),
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (md5 here; the engine's content
    identity is sha256 per the reference — md5 keeps the oracle cheap)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_md5")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace("text", r"[^aeiou]", "")).cast("long").alias("n_vowels"),
        F.round(
            F.length(F.regexp_replace("text", r"\s", "")).cast("double")
            / F.size(toks).cast("double"),
            4,
        ).alias("avg_token_len"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling fingerprint Σ i·ascii(char_i) mod p —
    document fingerprinting with identical arithmetic in both engines."""
    docs = load_table(spark, "documents", sf_dir)
    chars = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"), "text"
    )
    return (
        chars.select(
            "doc_id",
            (F.col("i").cast("long") * F.ascii(F.substring(F.col("text"), F.col("i"), F.lit(1)))).alias("t"),
        )
        .groupBy("doc_id")
        .agg((F.sum("t") % F.lit(1000000007)).cast("long").alias("fingerprint"))
    )


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 neighbors for the first 20 query
    vectors — the exact baseline for ANN; computed in double on both
    engines, rounded to 6 d.p."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        q.crossJoin(emb)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cos_r"),
            F.col("_rn").cast("long").alias("rnk"),
        )
    )


def q_bigram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup scoring over consecutive doc pairs
    (word bigrams; distinct-shingle Jaccard)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("i", "w")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    grams = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("b.i") == F.col("a.i") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.w"), F.col("b.w")).alias("g"),
        )
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = docs.select(F.col("doc_id").alias("doc_a")).join(
        docs.select(F.col("doc_id").alias("doc_b")),
        F.col("doc_b") == F.col("doc_a") + 1,
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("g_a"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("g_b"))
    inter = (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .where(F.col("g_b") == F.col("g_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("c"), F.lit(0))).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join operator family: customers with no orders, per
    market segment."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_no_orders"))
    )


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders by totalprice per customer (window family)."""
    orders = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price_r"),
            F.col("rk").cast("long"),
        )
    )


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation (grouping-sets family, native in our engine,
    absent in the reference — SURVEY §2.6)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-safe ANSI)

_PR_ITER = """
r{K} AS (
  SELECT v.id,
         0.15 * inv.x + 0.85 * COALESCE(s.s, 0) AS r
  FROM verts v
  CROSS JOIN inv
  LEFT JOIN (
    SELECT w.dst AS id, SUM(w.wt * p.r) AS s
    FROM w JOIN r{KM1} p ON p.id = w.src
    GROUP BY w.dst
  ) s ON s.id = v.id
)"""


def _pagerank_sql(n_iter: int = 5) -> str:
    iters = "".join(
        "," + _PR_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1)
    )
    return f"""
WITH {_COPART_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
inv AS (SELECT 1.0 / COUNT(*) AS x FROM verts),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
w AS (SELECT e.src, e.dst, 1.0 / deg.d AS wt FROM e JOIN deg ON deg.src = e.src),
r0 AS (SELECT id, (SELECT x FROM inv) AS r FROM verts)
{iters}
SELECT id, ROUND(r, 7) AS rank_r FROM r{n_iter} ORDER BY id
"""


_LPA_ROUND = """
c{K} AS (SELECT e.dst AS id, p.label AS lbl, COUNT(*) AS c
         FROM e JOIN l{KM1} p ON p.id = e.src GROUP BY e.dst, p.label),
w{K} AS (SELECT id, lbl FROM (
           SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lbl ASC) AS rn
           FROM c{K}) t WHERE rn = 1),
l{K} AS (SELECT v.id, CAST(COALESCE(w{K}.lbl, v.id) AS BIGINT) AS label
         FROM verts v LEFT JOIN w{K} ON w{K}.id = v.id)"""


_PPR_ITER = """
p{K} AS (
  SELECT v.id,
         0.15 * (CASE WHEN v.id IN (1, 2) THEN 0.5 ELSE 0.0 END) + 0.85 * COALESCE(s.s, 0) AS r
  FROM verts v
  LEFT JOIN (
    SELECT w.dst AS id, SUM(w.wt * p.r) AS s
    FROM w JOIN p{KM1} p ON p.id = w.src
    GROUP BY w.dst
  ) s ON s.id = v.id
)"""


def _ppr_sql(n_iter: int = 3) -> str:
    iters = "".join("," + _PPR_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH {_COPART_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
w AS (SELECT e.src, e.dst, 1.0 / deg.d AS wt FROM e JOIN deg ON deg.src = e.src),
p0 AS (SELECT id, CASE WHEN id IN (1, 2) THEN 0.5 ELSE 0.0 END AS r FROM verts)
{iters}
SELECT id, ROUND(r, 7) AS rank_r FROM p{n_iter} ORDER BY id
"""


def _lpa_sql(n_iter: int = 2) -> str:
    rounds = "".join("," + _LPA_ROUND.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH {_COPART_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)
{rounds}
SELECT id, label FROM l{n_iter} ORDER BY id
"""


ORACLES: dict[str, str] = {
    "copart_edges": f"WITH {_COPART_SQL} SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM und",
    "coorder_edges": f"WITH {_COORDER_SQL} SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM und",
    "triangles_coorder": f"""
        WITH {_COORDER_SQL},
        tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
                FROM und a JOIN und b ON b.src = a.dst
                JOIN und c ON c.src = a.src AND c.dst = b.dst),
        corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        SELECT CAST(id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM corners GROUP BY id ORDER BY id
    """,
    "top_depended": """
        WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT dst AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM e GROUP BY dst ORDER BY n_customers DESC, s_suppkey ASC LIMIT 10
    """,
    "pagerank_fixed5": _pagerank_sql(5),
    "ppr_fixed3": _ppr_sql(3),
    "pagerank_weighted4": """
        WITH e AS (SELECT o_custkey AS src, l_suppkey AS dst, CAST(COUNT(*) AS DOUBLE) AS wt
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   WHERE o_custkey != l_suppkey
                   GROUP BY o_custkey, l_suppkey),
        wsum AS (SELECT src, SUM(wt) AS ws FROM e GROUP BY src),
        w AS (SELECT e.src, e.dst, e.wt / wsum.ws AS wt FROM e JOIN wsum ON wsum.src = e.src),
        verts AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
        inv AS (SELECT 1.0 / COUNT(*) AS x FROM verts),
        r0 AS (SELECT id, (SELECT x FROM inv) AS r FROM verts),
        r1 AS (SELECT v.id, 0.15 * inv.x + 0.85 * COALESCE(s.s, 0) AS r FROM verts v CROSS JOIN inv
               LEFT JOIN (SELECT w.dst AS id, SUM(w.wt * p.r) AS s FROM w JOIN r0 p ON p.id = w.src GROUP BY w.dst) s ON s.id = v.id),
        r2 AS (SELECT v.id, 0.15 * inv.x + 0.85 * COALESCE(s.s, 0) AS r FROM verts v CROSS JOIN inv
               LEFT JOIN (SELECT w.dst AS id, SUM(w.wt * p.r) AS s FROM w JOIN r1 p ON p.id = w.src GROUP BY w.dst) s ON s.id = v.id),
        r3 AS (SELECT v.id, 0.15 * inv.x + 0.85 * COALESCE(s.s, 0) AS r FROM verts v CROSS JOIN inv
               LEFT JOIN (SELECT w.dst AS id, SUM(w.wt * p.r) AS s FROM w JOIN r2 p ON p.id = w.src GROUP BY w.dst) s ON s.id = v.id),
        r4 AS (SELECT v.id, 0.15 * inv.x + 0.85 * COALESCE(s.s, 0) AS r FROM verts v CROSS JOIN inv
               LEFT JOIN (SELECT w.dst AS id, SUM(w.wt * p.r) AS s FROM w JOIN r3 p ON p.id = w.src GROUP BY w.dst) s ON s.id = v.id)
        SELECT id, ROUND(r, 7) AS rank_r FROM r4 ORDER BY id
    """,
    "degree_histogram": f"""
        WITH {_COORDER_SQL}, {_SYM_SQL},
        deg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY src)
        SELECT CAST(deg AS BIGINT) AS deg, CAST(COUNT(*) AS BIGINT) AS n_vertices
        FROM deg GROUP BY deg
    """,
    "edge_embeddedness": f"""
        WITH {_COORDER_SQL}, {_SYM_SQL},
        p AS (SELECT src AS u, dst AS v FROM und WHERE src < 400 AND dst < 400),
        deg AS (SELECT src AS w, COUNT(*) AS dw FROM e GROUP BY src),
        common AS (
          SELECT p.u, p.v, CAST(COUNT(*) AS BIGINT) AS cn,
                 ROUND(SUM(1.0 / LN(CAST(deg.dw AS DOUBLE))), 6) AS aa
          FROM p
          JOIN e su ON su.src = p.u
          JOIN e sv ON sv.src = p.v AND sv.dst = su.dst
          JOIN deg ON deg.w = su.dst
          GROUP BY p.u, p.v)
        SELECT p.u, p.v,
               CAST(COALESCE(common.cn, 0) AS BIGINT) AS common_neighbors,
               COALESCE(common.aa, 0.0) AS adamic_adar
        FROM p LEFT JOIN common ON common.u = p.u AND common.v = p.v
    """,
    "bfs_hops": f"""
        WITH RECURSIVE {_COORDER_SQL}, {_SYM_SQL},
        s0 AS (SELECT MIN(src) AS id FROM e),
        reach(id, d) AS (
            SELECT id, 0 FROM s0
            UNION
            SELECT e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id WHERE r.d < 8
        )
        SELECT CAST(id AS BIGINT) AS id, CAST(MIN(d) AS INT) AS dist
        FROM reach GROUP BY id ORDER BY id
    """,
    "components": f"""
        WITH RECURSIVE {_COPART_SQL}, {_SYM_SQL},
        verts AS (SELECT DISTINCT src AS id FROM e),
        reach(id, comp) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id WHERE r.comp < e.dst
        )
        SELECT id, CAST(MIN(comp) AS BIGINT) AS comp FROM reach GROUP BY id ORDER BY id
    """,
    "lpa_fixed2": _lpa_sql(2),
    "components_star": f"""
        WITH RECURSIVE {_COPART_SQL}, {_SYM_SQL},
        verts AS (SELECT DISTINCT src AS id FROM e),
        reach(id, comp) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id WHERE r.comp < e.dst
        )
        SELECT id, CAST(MIN(comp) AS BIGINT) AS comp FROM reach GROUP BY id ORDER BY id
    """,
    "triangles": f"""
        WITH {_COPART_SQL},
        tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
                FROM und a JOIN und b ON b.src = a.dst
                JOIN und c ON c.src = a.src AND c.dst = b.dst),
        corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        SELECT CAST(id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM corners GROUP BY id ORDER BY id
    """,
    "current_state": """
        SELECT user_id, event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_epoch,
               ROUND(value, 2) AS value_r
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) t
        WHERE rn = 1
    """,
    "state_history": """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(MIN(FLOOR(epoch(ts))) AS BIGINT) AS first_epoch,
               CAST(MAX(FLOOR(epoch(ts))) AS BIGINT) AS last_epoch,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY user_id
    """,
    "upsert_latest_wins": """
        SELECT user_id, event_type, ROUND(value, 2) AS last_value,
               CAST(n_obs AS BIGINT) AS n_obs
        FROM (SELECT *,
                     ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn,
                     COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_obs
              FROM events) t
        WHERE rn = 1
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
        FROM documents GROUP BY md5(text)
    """,
    "text_stats": r"""
        SELECT doc_id,
               CAST(LENGTH(text) AS INT) AS n_chars_calc,
               CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(LENGTH(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
               ROUND(CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                     / CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS DOUBLE), 4) AS avg_token_len
        FROM documents
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               CAST(SUM(i * ascii(substr(text, CAST(i AS INT), 1))) % 1000000007 AS BIGINT) AS fingerprint
        FROM (SELECT doc_id, text, UNNEST(generate_series(1, LENGTH(text))) AS i
              FROM documents) t
        GROUP BY doc_id
    """,
    "knn_cosine": """
        WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                          CAST(UNNEST(embedding) AS DOUBLE) AS x
                   FROM embeddings),
        nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS n FROM e GROUP BY vec_id),
        dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS d
                 FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 20 AND a.vec_id != b.vec_id
                 GROUP BY a.vec_id, b.vec_id),
        scored AS (SELECT query_id, neighbor_id, d / (na.n * nb.n) AS cos
                   FROM dots JOIN nrm na ON na.vec_id = query_id
                             JOIN nrm nb ON nb.vec_id = neighbor_id)
        SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_r, CAST(rn AS BIGINT) AS rnk
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
              FROM scored) t
        WHERE rn <= 3
    """,
    "bigram_jaccard": r"""
        WITH toks AS (SELECT doc_id,
                             generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
                             UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
                      FROM documents),
        grams AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS g
                  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS c
                  FROM pairs p
                  JOIN grams ga ON ga.doc_id = p.doc_a
                  JOIN grams gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
                  GROUP BY p.doc_a, p.doc_b)
        SELECT p.doc_a, p.doc_b,
               ROUND(CAST(COALESCE(i.c, 0) AS DOUBLE)
                     / CAST(na.n + nb.n - COALESCE(i.c, 0) AS DOUBLE), 6) AS jaccard
        FROM pairs p
        JOIN sizes na ON na.doc_id = p.doc_a
        JOIN sizes nb ON nb.doc_id = p.doc_b
        LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    """,
    "anti_join_customers": """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_no_orders
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "window_topk": """
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price_r, CAST(rk AS BIGINT) AS rk
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders WHERE o_custkey < 100) t
        WHERE rk <= 2
    """,
    "rollup_lineitem": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "copart_edges": q_copart_edges,
    "coorder_edges": q_coorder_edges,
    "triangles_coorder": q_triangles_coorder,
    "top_depended": q_top_depended,
    "pagerank_fixed5": q_pagerank_fixed5,
    "ppr_fixed3": q_ppr_fixed3,
    "bfs_hops": q_bfs_hops,
    "pagerank_weighted4": q_pagerank_weighted4,
    "degree_histogram": q_degree_histogram,
    "edge_embeddedness": q_edge_embeddedness,
    "components": q_components,
    "components_star": q_components_star,
    "lpa_fixed2": q_lpa_fixed2,
    "triangles": q_triangles,
    "current_state": q_current_state,
    "state_history": q_state_history,
    "upsert_latest_wins": q_upsert_latest_wins,
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "doc_fingerprint": q_doc_fingerprint,
    "knn_cosine": q_knn_cosine,
    "bigram_jaccard": q_bigram_jaccard,
    "anti_join_customers": q_anti_join_customers,
    "window_topk": q_window_topk,
    "rollup_lineitem": q_rollup_lineitem,
}


# --------------------------------------------------------------------------
# round-1 extension: as-of / session / pivot / cube / set-op / text / knn ops


def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): for each purchase, the user's latest
    signup at-or-before it — cogrouped Arrow ``merge_asof`` operator."""
    from polar_spark.operators.relational import as_of_join

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = ev.where(F.col("event_type") == "signup").select("user_id", "ts")
    j = as_of_join(purchases, signups, ts="ts", by="user_id")
    return j.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp("ts_right").alias("signup_epoch"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — lag + running sum."""
    from polar_spark.operators.relational import sessionize

    ev = load_table(spark, "events", sf_dir)
    out = sessionize(ev, ts="ts", by="user_id", gap_minutes=30.0, order_tiebreak="event_id")
    return out.select("event_id", "user_id", "session_id")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES]
    )


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def q_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op family: users with BOTH purchase and error events."""
    ev = load_table(spark, "events", sf_dir)
    a = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    return a.intersect(b)


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polar_spark.operators.text import language_scores

    docs = load_table(spark, "documents", sf_dir)
    out = language_scores(docs)
    return out.select(
        "doc_id",
        F.round("score_en", 6).alias("score_en_r"),
        F.round("score_es", 6).alias("score_es_r"),
        F.round("score_de", 6).alias("score_de_r"),
        "lang_pred",
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polar_spark.operators.text import quality_scores

    docs = load_table(spark, "documents", sf_dir)
    out = quality_scores(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio_r"),
        F.round("digit_ratio", 6).alias("digit_ratio_r"),
        F.round("stopword_ratio", 6).alias("stopword_ratio_r"),
        F.col("quality").alias("quality_r"),
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polar_spark.operators.text import token_counts

    docs = load_table(spark, "documents", sf_dir)
    return token_counts(docs).select("doc_id", "ws_tokens", "bpe_tokens")


def q_knn_bruteforce_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numpy-matmul brute-force ANN baseline vs the same SQL oracle
    as q_knn_cosine — validates the vectorized operator end-to-end."""
    from polar_spark.operators.similarity import cosine_topk_bruteforce

    emb = load_table(spark, "embeddings", sf_dir)
    out = cosine_topk_bruteforce(emb, query_ids=list(range(20)), k=3)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 6).alias("cos_r"), F.col("rnk")
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (n_shared_bands + estimated jaccard)
    over the SQL-replayable hash family — the 64-slot signature fold is
    64 MIN aggregates in one groupBy (whole-stage codegen, one shuffle),
    and DuckDB recomputes the identical signatures as the oracle.  The
    xxhash64/numpy production variant is cross-validated against exact
    jaccard in tests/test_dedup.py and benched as minhash_neardup."""
    from polar_spark.operators.dedup import minhash_pairs_arith

    docs = load_table(spark, "documents", sf_dir)
    return minhash_pairs_arith(docs)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded Hamming candidates over the SQL-replayable family
    (60-bit fingerprint = signs of 60 affine-permutation parity sums;
    the fold is 60 SUM aggregates in one groupBy) — DuckDB replays the
    fingerprints bit-for-bit as the oracle."""
    from polar_spark.operators.dedup import simhash_pairs_arith

    docs = load_table(spark, "documents", sf_dir)
    return simhash_pairs_arith(docs)


_STOP_SQL = {
    "en": "'the','and','of','to','in','is','that','for','with','a'",
    "es": "'el','la','de','que','y','en','los','del','las','un'",
    "de": "'der','die','und','das','von','zu','mit','den','ist','ein'",
    "fr": "'le','la','de','et','les','des','en','un','du','que'",
    "zh": "'的','了','是','在','我','有','和','就','不','人'",
}


def _lang_score_sql(lang: str) -> str:
    return (
        f"CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL[lang]}))) AS DOUBLE)"
        " / GREATEST(len(toks), 1)"
    )


# --------------------------------------------------------------------------
# round-2 extension: GitLab domain projections driven by sf-table-derived
# scan inputs — the projection code is the SAME code that a real GitLab
# scan feeds; the derivation is deterministic so DuckDB can replay it.


def _gl_pipelines_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → pipeline-scan shape: project = custkey mod 200, duration
    = floor(totalprice) mod 86400, urgent orders 'fail'."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        F.lit("gl0").alias("instance_id"),
        (F.col("o_custkey") % 200).cast("string").alias("project_id"),
        F.col("o_orderkey").cast("string").alias("pipeline_id"),
        (F.col("o_orderstatus") == "O").alias("active"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("created_at"),
        F.lit(None).cast("string").alias("finished_at"),
        F.lit(None).cast("string").alias("sha"),
        F.lit(False).alias("child"),
        (F.col("o_orderstatus") == "F").alias("complete"),
        (F.floor("o_totalprice").cast("long") % 86400).alias("duration"),
        F.lit(1).cast("long").alias("total_jobs"),
        F.lit(None).cast("double").alias("compute_minutes"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("urgent_timeout")).alias(
            "failure_reason"
        ),
        F.lit("push").alias("source"),
        F.lit(False).alias("trigger"),
        F.lit(False).alias("latest"),
        F.lit("t0").alias("observed_at"),
    )


def q_gitlab_pipeline_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAS_PIPELINE rollup per project over the *projected* vertices —
    aggregates read back out of the props map (string-typed, as stored),
    proving the projection carries values end-to-end."""
    from polar_spark.operators.gitlab_projection import project_pipelines

    verts, edges = project_pipelines(_gl_pipelines_from_orders(spark, sf_dir))
    pipe = verts.where(F.col("label") == "GitlabPipeline").select("key", "props")
    he = edges.where(F.col("rel_type") == "HAS_PIPELINE").select("src_key", "dst_key")
    joined = he.join(pipe, he.dst_key == pipe.key)
    return joined.groupBy(F.col("src_key").alias("project_key")).agg(
        F.count("*").alias("n_pipelines"),
        F.sum(F.col("props")["duration"].cast("long")).alias("total_duration"),
        F.sum(F.when(F.col("props")["active"] == "true", 1).otherwise(0))
        .cast("long")
        .alias("n_active"),
        F.sum(F.when(F.col("props")["failure_reason"] != "", 1).otherwise(0))
        .cast("long")
        .alias("n_failed"),
    )


def q_gitlab_users_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN_GROUP membership count per group via project_group_members
    (customer → user, nation → group)."""
    from polar_spark.operators.gitlab_projection import project_group_members

    c = load_table(spark, "customer", sf_dir)
    members = c.select(
        F.lit("gl0").alias("instance_id"),
        F.col("c_nationkey").cast("string").alias("group_id"),
        F.col("c_custkey").cast("string").alias("user_id"),
        F.lit("t0").alias("observed_at"),
    )
    _v, e = project_group_members(members)
    return e.groupBy(F.col("dst_key").alias("group_key")).agg(
        F.countDistinct("src_key").alias("n_users")
    )


def q_gitlab_runner_util(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED_BY utilization per runner (lineitem → jobs; lines ≥5
    carry no runner, exercising the reference's null guard materially —
    pipelines.rs:194-206)."""
    from polar_spark.operators.gitlab_projection import project_jobs

    li = load_table(spark, "lineitem", sf_dir)
    # distinct job per (order, line): the synthetic lineitem repeats
    # (orderkey, linenumber), so pre-aggregate deterministically — a
    # scan re-delivering the same job is the upsert case, not a new job
    jl = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(F.floor("l_quantity").cast("long")).alias("dur"),
        F.min("l_suppkey").alias("supp"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("failed"),
    )
    jobs = jl.select(
        F.lit("gl0").alias("instance_id"),
        F.col("l_orderkey").cast("string").alias("pipeline_id"),
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("job_id"),
        F.when(F.col("failed") == 1, "failed").otherwise("success").alias("status"),
        F.lit("job").alias("name"),
        F.lit(None).cast("string").alias("created_at"),
        F.lit("abc").alias("short_sha"),
        F.col("dur").alias("duration"),
        F.lit(None).cast("string").alias("failure_message"),
        F.when(F.col("l_linenumber") < 5, F.col("supp").cast("string")).alias("runner_id"),
        F.lit("t0").alias("observed_at"),
    )
    verts, edges = project_jobs(jobs)
    jv = verts.select("key", "props")
    ex = edges.where(F.col("rel_type") == "EXECUTED_BY").select("src_key", "dst_key")
    joined = ex.join(jv, ex.src_key == jv.key)
    return joined.groupBy(F.col("dst_key").alias("runner_key")).agg(
        F.count("*").alias("n_jobs"),
        F.sum(F.col("props")["duration"].cast("long")).alias("total_duration"),
        F.sum(F.when(F.col("props")["status"] == "failed", 1).otherwise(0))
        .cast("long")
        .alias("n_failed"),
    )


def q_gitlab_member_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEMBER_OF *edge-prop* rollup (access_level lives on the edge, as
    in users.rs:178-199; created_at is emitted conditionally and counted
    from the props map)."""
    from polar_spark.operators.gitlab_projection import project_project_memberships

    c = load_table(spark, "customer", sf_dir)
    mem = c.select(
        F.lit("gl0").alias("instance_id"),
        F.col("c_custkey").cast("string").alias("user_id"),
        F.col("c_mktsegment").alias("project_id"),
        (F.col("c_nationkey") % 50 + 10).cast("int").alias("access_level"),
        F.when(F.col("c_custkey") % 3 != 0, F.lit("2024-01-01")).alias("created_at"),
        F.lit(None).cast("string").alias("expires_at"),
        F.lit("t0").alias("observed_at"),
    )
    _v, e = project_project_memberships(mem)
    return e.groupBy(F.col("dst_key").alias("project_key")).agg(
        F.count("*").alias("n_members"),
        F.round(F.avg(F.col("props")["access_level"].cast("double")), 4).alias("avg_access"),
        F.sum(F.when(F.col("props").getItem("created_at").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_with_created"),
    )


ORACLES.update(
    {
        "gitlab_pipeline_rollup": """
            SELECT 'gl0/' || CAST(o_custkey % 200 AS VARCHAR) AS project_key,
                   CAST(COUNT(*) AS BIGINT) AS n_pipelines,
                   CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT) % 86400) AS BIGINT) AS total_duration,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
                   CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
            FROM orders GROUP BY o_custkey % 200
        """,
        "gitlab_users_per_group": """
            SELECT 'gl0/' || CAST(c_nationkey AS VARCHAR) AS group_key,
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_users
            FROM customer GROUP BY c_nationkey
        """,
        "gitlab_runner_util": """
            WITH jl AS (
              SELECT l_orderkey, l_linenumber,
                     SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS dur,
                     MIN(l_suppkey) AS supp,
                     MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
              FROM lineitem GROUP BY l_orderkey, l_linenumber)
            SELECT 'gl0/' || CAST(supp AS VARCHAR) AS runner_key,
                   CAST(COUNT(*) AS BIGINT) AS n_jobs,
                   CAST(SUM(dur) AS BIGINT) AS total_duration,
                   CAST(SUM(failed) AS BIGINT) AS n_failed
            FROM jl WHERE l_linenumber < 5 GROUP BY supp
        """,
        "gitlab_member_access": """
            SELECT 'gl0/' || c_mktsegment AS project_key,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   ROUND(AVG(CAST(c_nationkey % 50 + 10 AS DOUBLE)), 4) AS avg_access,
                   CAST(SUM(CASE WHEN c_custkey % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_created
            FROM customer GROUP BY c_mktsegment
        """,
    }
)

QUERIES.update(
    {
        "gitlab_pipeline_rollup": q_gitlab_pipeline_rollup,
        "gitlab_users_per_group": q_gitlab_users_per_group,
        "gitlab_runner_util": q_gitlab_runner_util,
        "gitlab_member_access": q_gitlab_member_access,
    }
)


ORACLES.update(
    {
        "asof_last_signup": """
            SELECT e1.event_id, e1.user_id,
                   CAST(FLOOR(epoch(e1.ts)) AS BIGINT) AS ts_epoch,
                   CAST(FLOOR(epoch((SELECT MAX(e2.ts) FROM events e2
                                     WHERE e2.user_id = e1.user_id
                                       AND e2.event_type = 'signup'
                                       AND e2.ts <= e1.ts))) AS BIGINT) AS signup_epoch
            FROM events e1 WHERE e1.event_type = 'purchase'
        """,
        "sessionize": """
            WITH g AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                            OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id, user_id,
                   CAST(user_id AS VARCHAR) || '#' ||
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS session_id
            FROM g
        """,
        "pivot_events": """
            SELECT user_id,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "cube_orders": """
            SELECT o_orderpriority, o_orderstatus,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total_price
            FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        "intersect_users": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        """,
        "langid": f"""
            WITH t AS (SELECT doc_id,
                              regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
                       FROM documents),
            s AS (SELECT doc_id,
                         {_lang_score_sql("de")} AS s_de,
                         {_lang_score_sql("en")} AS s_en,
                         {_lang_score_sql("es")} AS s_es,
                         {_lang_score_sql("fr")} AS s_fr,
                         {_lang_score_sql("zh")} AS s_zh
                  FROM t)
            SELECT doc_id,
                   ROUND(s_en, 6) AS score_en_r,
                   ROUND(s_es, 6) AS score_es_r,
                   ROUND(s_de, 6) AS score_de_r,
                   CASE WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                        WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                        WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                        WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                        ELSE 'zh' END AS lang_pred
            FROM s
        """,
        "quality": """
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks,
                     CAST(LENGTH(text) AS DOUBLE) AS n_chr,
                     CAST(LENGTH(regexp_replace(text, '[^.,;:!?''"()\\[\\]]', '', 'g')) AS DOUBLE) AS punct,
                     CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digit
              FROM documents),
            s AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     punct / GREATEST(n_chr, 1) AS punct_ratio,
                     digit / GREATEST(n_chr, 1) AS digit_ratio,
                     CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','for','with','a'))) AS DOUBLE)
                       / GREATEST(len(toks), 1) AS stopword_ratio
              FROM t)
            SELECT doc_id, n_tokens,
                   ROUND(punct_ratio, 6) AS punct_ratio_r,
                   ROUND(digit_ratio, 6) AS digit_ratio_r,
                   ROUND(stopword_ratio, 6) AS stopword_ratio_r,
                   0.4 * LEAST(n_tokens / 64.0, 1.0)
                         + 0.3 * LEAST(stopword_ratio * 5, 1.0)
                         + 0.3 * (1.0 - LEAST(digit_ratio * 10, 1.0)) AS quality_r
            FROM s
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
            FROM documents
        """,
    }
)
ORACLES["knn_bruteforce_op"] = ORACLES["knn_cosine"]


def _neardup_oracles() -> dict[str, str]:
    from polar_spark.operators.dedup import minhash_pairs_arith_sql, simhash_pairs_arith_sql

    return {
        "minhash_pairs": minhash_pairs_arith_sql(),
        "simhash_pairs": simhash_pairs_arith_sql(),
    }


ORACLES.update(_neardup_oracles())

QUERIES.update(
    {
        "asof_last_signup": q_asof_last_signup,
        "sessionize": q_sessionize,
        "pivot_events": q_pivot_events,
        "cube_orders": q_cube_orders,
        "intersect_users": q_intersect_users,
        "langid": q_langid,
        "quality": q_quality,
        "token_counts": q_token_counts,
        "knn_bruteforce_op": q_knn_bruteforce_op,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
    }
)


# --------------------------------------------------------------------------
# round-3 extension: provenance + kube domain projections under driver
# oracles (VERDICT r2 #2) — deterministic scan inputs derived from the sf
# tables feed the SAME projection code a real scan feeds; DuckDB replays
# the derivation arithmetic directly over the base tables.


def _conform_events(df: DataFrame) -> DataFrame:
    """Pad a partial provenance-event frame to the full EVENT_SCHEMA."""
    from polar_spark.operators.provenance import EVENT_SCHEMA

    schema = df.sparkSession.createDataFrame([], EVENT_SCHEMA).schema
    return df.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in df.columns else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in schema.fields
        ]
    )


def _prov_stage_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → StageCompleted provenance events: build = order, stage
    = line number (deduped — a scan re-delivering a stage is the upsert
    case), duration from quantity, outcome from the return flag."""
    li = load_table(spark, "lineitem", sf_dir)
    jl = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(F.floor("l_quantity").cast("long")).alias("dur"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("failed"),
    )
    return _conform_events(
        jl.select(
            F.lit("stage_completed").alias("type"),
            F.col("l_orderkey").cast("string").alias("build_id"),
            F.col("l_linenumber").cast("string").alias("stage_id"),
            F.col("dur").alias("duration_secs"),
            F.when(F.col("failed") == 1, "failed").otherwise("success").alias("outcome"),
            F.lit("t0").alias("observed_at"),
        )
    )


def q_prov_stage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-duration rollup per BuildJob over the *projected* HAS_STAGE
    edges + BuildStage props (projection.rs:98-181 semantics: stage
    vertices carry outcome/duration, the job aggregates them)."""
    from polar_spark.operators.provenance import project_events

    verts, edges, _trans = project_events(_prov_stage_events(spark, sf_dir))
    stages = verts.where(F.col("label") == "BuildStage").select("key", "props")
    hs = edges.where(F.col("rel_type") == "HAS_STAGE").select("src_key", "dst_key")
    joined = hs.join(stages, hs.dst_key == stages.key)
    return joined.groupBy(F.col("src_key").alias("build_key")).agg(
        F.count("*").alias("n_stages"),
        F.sum(F.col("props")["duration_secs"].cast("long")).alias("total_duration"),
        F.sum(F.when(F.col("props")["outcome"] == "failed", 1).otherwise(0))
        .cast("long")
        .alias("n_failed"),
    )


def q_prov_depends_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEPENDS_ON fan-out per root package over the projected SBOM tree
    (linker.rs:154-223), exercising BOTH branches materially: even part
    groups carry an explicit root dep entry (restricted to every 3rd
    member), odd groups carry none and take the flat fallback (root →
    every component)."""
    from polar_spark.operators.provenance import project_events

    p = load_table(spark, "part", sf_dir).select(
        (F.col("p_partkey") % 100).alias("g"), F.col("p_partkey").alias("k")
    )
    grp = p.groupBy("g").agg(
        F.collect_list(F.concat(F.lit("pkg:p/"), F.col("k"))).alias("comps"),
        # collect_list drops nulls → only every-3rd member
        F.collect_list(
            F.when(F.col("k") % 3 == 0, F.concat(F.lit("pkg:p/"), F.col("k")))
        ).alias("evens"),
    )
    root = F.concat(F.lit("pkg:root/"), F.col("g"))
    events = _conform_events(
        grp.select(
            F.lit("sbom_analyzed").alias("type"),
            root.alias("root_purl"),
            F.concat(F.lit("sb"), F.col("g")).alias("sbom_content_hash"),
            F.col("comps").alias("components"),
            F.when(
                F.col("g") % 2 == 0,
                F.array(F.struct(root.alias("from_ref"), F.col("evens").alias("to_refs"))),
            ).alias("dep_edges"),
            F.lit("t0").alias("observed_at"),
        )
    )
    _v, edges, _t = project_events(events)
    dep = edges.where(F.col("rel_type") == "DEPENDS_ON")
    return dep.groupBy(F.col("src_key").alias("root_purl")).agg(
        F.countDistinct("dst_key").alias("n_deps")
    )


def _kube_deployments_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → deployment status observations: uid per user, counters
    and conditions derived from the event timestamp/type so duplicate
    (user, ts) observations carry identical values (deterministic
    latest-wins)."""
    ev = load_table(spark, "events", sf_dir)
    ts_epoch = F.unix_timestamp("ts")
    return ev.select(
        F.concat(F.lit("d"), F.col("user_id")).alias("uid"),
        F.lit("dep").alias("name"),
        F.lit(None).cast("string").alias("namespace"),
        (ts_epoch % 5).cast("int").alias("available_replicas"),
        F.lit(None).cast("int").alias("updated_replicas"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).cast("int").alias("unavailable_replicas"),
        F.lit(None).cast("string").alias("progressing_condition"),
        F.when(ts_epoch % 2 == 0, "True").otherwise("False").alias("available_condition"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("observed_at"),
    )


def q_kube_deploy_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeploymentState transition rollup per deployment over the
    *projected* transitions (lib.rs:697-882): instance count, unavailable
    total, latest condition — the per-kind state vocabulary end-to-end."""
    from polar_spark.operators.kube_resources import project_deployments

    _verts, trans = project_deployments(_kube_deployments_from_events(spark, sf_dir))
    w = Window.partitionBy("resource_key").orderBy(
        F.desc("valid_from"), F.desc("instance_key")
    )
    latest = (
        trans.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("resource_key", F.col("props")["available_condition"].alias("last_avail"))
    )
    agg = trans.groupBy("resource_key").agg(
        F.countDistinct("instance_key").alias("n_transitions"),
        F.sum(F.col("props")["unavailable_replicas"].cast("long")).alias("n_unavailable"),
        F.max(F.col("props")["available_replicas"].cast("long")).alias("max_available"),
    )
    return agg.join(latest, "resource_key").select(
        F.col("resource_key").alias("deploy_key"),
        "n_transitions",
        "n_unavailable",
        "max_available",
        "last_avail",
    )


def q_kube_owns_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop OWNS chain Deployment → ReplicaSet → Pod over projected
    owner-ref edges (dynamic src labels, lib.rs:85-296): pods per
    deployment."""
    from polar_spark.operators.kube_resources import project_pods, project_replicasets

    orders = load_table(spark, "orders", sf_dir)
    rs = orders.select(
        F.concat(F.lit("rs"), F.col("o_orderkey")).alias("uid"),
        F.lit("rs").alias("name"),
        F.lit(None).cast("string").alias("namespace"),
        F.lit(1).alias("replicas"),
        F.lit(1).alias("ready_replicas"),
        F.lit(1).alias("available_replicas"),
        F.array(
            F.struct(
                F.lit("KubeDeployment").alias("kind"),
                F.concat(F.lit("d"), F.col("o_custkey")).alias("uid"),
            )
        ).alias("owner_refs"),
        F.lit("t0").alias("valid_from"),
        F.lit("t0").alias("observed_at"),
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_linenumber").distinct()
    pods = li.select(
        F.concat_ws("-", F.concat(F.lit("p"), F.col("l_orderkey")), F.col("l_linenumber")).alias("uid"),
        F.lit("pod").alias("name"),
        F.lit(None).cast("string").alias("namespace"),
        F.lit(None).cast("string").alias("sa_name"),
        F.lit("Running").alias("phase"),
        F.lit(True).alias("ready"),
        F.array(
            F.struct(
                F.lit("KubeReplicaSet").alias("kind"),
                F.concat(F.lit("rs"), F.col("l_orderkey")).alias("uid"),
            )
        ).alias("owner_refs"),
        F.lit("t0").alias("valid_from"),
        F.lit("t0").alias("observed_at"),
    )
    _rv, rs_edges, _rt = project_replicasets(rs)
    _pv, pod_edges, _pt = project_pods(pods)
    d_rs = rs_edges.where(
        (F.col("rel_type") == "OWNS") & (F.col("src_label") == "KubeDeployment")
    ).select(F.col("src_key").alias("deploy_key"), F.col("dst_key").alias("rs_key"))
    rs_pod = pod_edges.where(
        (F.col("rel_type") == "OWNS") & (F.col("src_label") == "KubeReplicaSet")
    ).select(F.col("src_key").alias("rs_key"), F.col("dst_key").alias("pod_key"))
    return d_rs.join(rs_pod, "rs_key").groupBy("deploy_key").agg(
        F.countDistinct("pod_key").alias("n_pods"),
        F.countDistinct("rs_key").alias("n_replicasets"),
    )


def q_kube_containers_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAS_CONTAINER per pod with the image null guard exercised
    materially (lines ≥6 carry no image and must be skipped —
    lib.rs:389-391)."""
    from polar_spark.operators.kube_resources import project_pod_containers

    li = load_table(spark, "lineitem", sf_dir)
    jl = li.groupBy("l_orderkey", "l_linenumber").agg(F.min("l_suppkey").alias("supp"))
    containers = jl.select(
        F.concat(F.lit("p"), F.col("l_orderkey")).alias("pod_uid"),
        F.lit(None).cast("string").alias("namespace"),
        F.concat(F.lit("c"), F.col("l_linenumber")).alias("name"),
        F.when(
            F.col("l_linenumber") < 6, F.concat(F.lit("img:"), F.col("supp"))
        ).alias("image"),
        F.lit(None).cast("string").alias("image_pull_policy"),
        F.lit(None).cast("string").alias("restart_policy"),
        F.lit(None).cast("string").alias("working_dir"),
        F.lit(None).cast("string").alias("stdin"),
        F.lit(None).cast("string").alias("tty"),
        F.lit(None).cast(
            "array<struct<name:string,value:string,config_map:string,secret:string>>"
        ).alias("env"),
        F.lit(None).cast("array<struct<name:string,container_port:int>>").alias("ports"),
        F.lit(None).cast("struct<cpu:string,memory:string>").alias("resources"),
        F.lit("t0").alias("observed_at"),
    )
    verts, edges = project_pod_containers(containers)
    hc = edges.where(F.col("rel_type") == "HAS_CONTAINER")
    return hc.groupBy(F.col("src_key").alias("pod_key")).agg(
        F.countDistinct("dst_key").alias("n_containers")
    )


def doc_trigrams(docs: DataFrame) -> DataFrame:
    """Distinct word 3-grams per document as (doc_id, g) — the shared
    exact-ngram base of `exact_jaccard_pairs`, `containment_pairs`,
    `minhash_calibration` and `novelty` (positional self-joins on the
    whitespace tokenization; same gram text as the DuckDB oracles)."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("i", "w")
    )
    a, b, c = toks.alias("a"), toks.alias("b"), toks.alias("c")
    return (
        a.join(b, (F.col("b.doc_id") == F.col("a.doc_id")) & (F.col("b.i") == F.col("a.i") + 1))
        .join(c, (F.col("c.doc_id") == F.col("a.doc_id")) & (F.col("c.i") == F.col("a.i") + 2))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.w"), F.col("b.w"), F.col("c.w")).alias("g"),
        )
        .distinct()
    )


def q_exact_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram Jaccard ≥ 0.2 over the (bounded, ≤500-doc)
    documents slice — the SQL-expressible ground truth that brackets the
    MinHash-LSH rows-only queries (VERDICT r2 #8); recall vs this set is
    pinned in tests/test_dedup.py."""
    docs = load_table(spark, "documents", sf_dir)
    grams = doc_trigrams(docs)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("g"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("g"))
    inter = (
        ga.join(gb, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    raw = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")).cast("double")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        # filter on the RAW ratio (exact int inputs → IEEE-identical in
        # both engines); round only the emitted column
        .where(raw >= 0.2)
        .select("id_a", "id_b", F.round(raw, 6).alias("jaccard_r"))
    )


ORACLES.update(
    {
        "prov_stage_rollup": """
            WITH jl AS (
              SELECT l_orderkey, l_linenumber,
                     SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS dur,
                     MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
              FROM lineitem GROUP BY l_orderkey, l_linenumber)
            SELECT CAST(l_orderkey AS VARCHAR) AS build_key,
                   CAST(COUNT(*) AS BIGINT) AS n_stages,
                   CAST(SUM(dur) AS BIGINT) AS total_duration,
                   CAST(SUM(failed) AS BIGINT) AS n_failed
            FROM jl GROUP BY l_orderkey
        """,
        "prov_depends_fanout": """
            WITH p AS (SELECT p_partkey AS k, p_partkey % 100 AS g FROM part),
            deps AS (
              SELECT 'pkg:root/' || CAST(g AS VARCHAR) AS root,
                     'pkg:p/' || CAST(k AS VARCHAR) AS dep
              FROM p WHERE g % 2 = 0 AND k % 3 = 0
              UNION ALL
              SELECT 'pkg:root/' || CAST(g AS VARCHAR),
                     'pkg:p/' || CAST(k AS VARCHAR)
              FROM p WHERE g % 2 = 1
            )
            SELECT root AS root_purl, CAST(COUNT(DISTINCT dep) AS BIGINT) AS n_deps
            FROM deps GROUP BY root
        """,
        "kube_deploy_transitions": """
            WITH obs AS (
              SELECT 'd' || CAST(user_id AS VARCHAR) AS uid,
                     strftime(ts, '%Y-%m-%d %H:%M:%S') AS vf,
                     CAST(FLOOR(epoch(ts)) AS BIGINT) % 5 AS avail,
                     CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS unavail,
                     CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT) % 2 = 0
                          THEN 'True' ELSE 'False' END AS cond
              FROM events),
            latest AS (
              SELECT uid, cond FROM (
                SELECT uid, cond,
                       ROW_NUMBER() OVER (PARTITION BY uid
                                          ORDER BY vf DESC, uid || '@' || vf DESC) AS rn
                FROM obs) t WHERE rn = 1)
            SELECT o.uid AS deploy_key,
                   CAST(COUNT(DISTINCT o.uid || '@' || o.vf) AS BIGINT) AS n_transitions,
                   CAST(SUM(o.unavail) AS BIGINT) AS n_unavailable,
                   CAST(MAX(o.avail) AS BIGINT) AS max_available,
                   MAX(latest.cond) AS last_avail
            FROM obs o JOIN latest ON latest.uid = o.uid
            GROUP BY o.uid
        """,
        "kube_owns_chain": """
            WITH pods AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
            SELECT 'd' || CAST(o_custkey AS VARCHAR) AS deploy_key,
                   CAST(COUNT(DISTINCT 'p' || CAST(p.l_orderkey AS VARCHAR) || '-'
                              || CAST(p.l_linenumber AS VARCHAR)) AS BIGINT) AS n_pods,
                   CAST(COUNT(DISTINCT 'rs' || CAST(o.o_orderkey AS VARCHAR)) AS BIGINT) AS n_replicasets
            FROM orders o JOIN pods p ON p.l_orderkey = o.o_orderkey
            GROUP BY o_custkey
        """,
        "kube_containers_guard": """
            SELECT 'p' || CAST(l_orderkey AS VARCHAR) AS pod_key,
                   CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_containers
            FROM lineitem WHERE l_linenumber < 6
            GROUP BY l_orderkey
        """,
        "exact_jaccard_pairs": r"""
            WITH toks AS (SELECT doc_id,
                                 generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
                                 UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
                          FROM documents),
            grams AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
                      FROM toks a
                      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                      JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
            inter AS (SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, COUNT(*) AS c
                      FROM grams ga JOIN grams gb ON gb.g = ga.g AND ga.doc_id < gb.doc_id
                      GROUP BY ga.doc_id, gb.doc_id)
            SELECT i.id_a, i.id_b,
                   ROUND(CAST(i.c AS DOUBLE) / CAST(na.n + nb.n - i.c AS DOUBLE), 6) AS jaccard_r
            FROM inter i
            JOIN sizes na ON na.doc_id = i.id_a
            JOIN sizes nb ON nb.doc_id = i.id_b
            WHERE CAST(i.c AS DOUBLE) / CAST(na.n + nb.n - i.c AS DOUBLE) >= 0.2
        """,
    }
)

QUERIES.update(
    {
        "prov_stage_rollup": q_prov_stage_rollup,
        "prov_depends_fanout": q_prov_depends_fanout,
        "kube_deploy_transitions": q_kube_deploy_transitions,
        "kube_owns_chain": q_kube_owns_chain,
        "kube_containers_guard": q_kube_containers_guard,
        "exact_jaccard_pairs": q_exact_jaccard_pairs,
    }
)


# --------------------------------------------------------------------------
# round 3: k-core, landmark harmonic centrality, embedding near-dup


def q_kcore10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=10) of the undirected demand graph:
    iterative degree-peel to fixpoint (pregel.kcore) — the densest-
    region extraction used to focus crawl/centrality budgets.  The SQL
    oracle unrolls 6 peel rounds; peeling is idempotent after the
    fixpoint (reached in 2 rounds at sf0.01, asserted in pytest), so
    the fixed-round oracle is exact."""
    e = demand_edges(spark, sf_dir)
    core, _stats = pregel.kcore(e, k=10)
    return core.select(
        F.col("id").cast("long"), F.col("deg").cast("long")
    ).orderBy("id")


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark harmonic centrality on the co-order graph: per-source
    BFS from the 4 smallest vertex ids, H(v) = Σ_s 1/dist(s,v), depth-
    bounded at 6 (matches the recursive-CTE oracle's bound)."""
    e = _sym(coorder_edges(spark, sf_dir))
    lm = [int(r[0]) for r in e.select("src").distinct().orderBy("src").limit(4).collect()]
    h, _stats = pregel.harmonic_centrality(e, lm, max_depth=6)
    return h.select(
        F.col("id").cast("long"), F.round("harmonic", 6).alias("harmonic")
    ).orderBy("id")


def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (cos ≥ 0.35): the verify
    stage of embedding near-dup as a JVM expression (zip_with +
    aggregate over normalized doubles).  Threshold sits ≥ 2.8e-5 from
    every pair at sf0.01, so float64 association-order differences
    (~1e-15) cannot flip membership vs DuckDB's list_cosine_similarity."""
    from polar_spark.operators.similarity import cosine_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    return (
        cosine_pairs(emb, threshold=0.35, max_rows=500_000)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round("cos", 7).alias("cos_r"),
        )
        .orderBy("id_a", "id_b")
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate clustering end-to-end: threshold
    pair graph → connected components (single-link clusters) → keep
    rep_id = min(vec_id); every vector mapped (singletons to
    themselves).  Exact verification here (oracle-checkable); the LSH-
    bucketed candidate path of the same operator is recall-tested in
    pytest (tests/test_similarity.py)."""
    from polar_spark.operators.similarity import cosine_neardup

    emb = load_table(spark, "embeddings", sf_dir)
    return (
        cosine_neardup(emb, threshold=0.35, exact=True)
        .select(F.col("vec_id").cast("long"), F.col("rep_id").cast("long"))
        .orderBy("vec_id")
    )


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled fixed-round peel over the symmetrized demand graph.
    UNION (distinct) matches pregel.symmetrize's dropDuplicates — a
    (a,b)/(b,a) pair in the directed input must not double-count."""
    parts = [
        "und AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey)",
        "e0 AS (SELECT src, dst FROM und UNION SELECT dst, src FROM und)",
    ]
    for i in range(rounds):
        parts.append(
            f"d{i} AS (SELECT src AS id FROM e{i} GROUP BY src HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i} e "
            f"JOIN d{i} a ON a.id = e.src JOIN d{i} b ON b.id = e.dst)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(src AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS deg"
        f"\nFROM e{rounds} GROUP BY src ORDER BY id"
    )


ORACLES.update(
    {
        "kcore10": _kcore_sql(10, 6),
        "harmonic_centrality": f"""
            WITH RECURSIVE {_COORDER_SQL}, {_SYM_SQL},
            lm AS (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 4),
            reach(s, id, d) AS (
                SELECT id, id, 0 FROM lm
                UNION
                SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
                WHERE r.d < 6
            ),
            dmin AS (SELECT s, id, MIN(d) AS d FROM reach GROUP BY s, id)
            SELECT CAST(id AS BIGINT) AS id, ROUND(SUM(1.0 / d), 6) AS harmonic
            FROM dmin WHERE d > 0 GROUP BY id ORDER BY id
        """,
        "cosine_pairs": """
            WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings)
            SELECT CAST(a.vec_id AS BIGINT) AS id_a,
                   CAST(b.vec_id AS BIGINT) AS id_b,
                   ROUND(list_cosine_similarity(a.v, b.v), 7) AS cos_r
            FROM emb a JOIN emb b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
            ORDER BY id_a, id_b
        """,
        "embed_neardup": """
            WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                                   FROM embeddings),
            p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
                  WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
            e AS (SELECT ia AS src, ib AS dst FROM p
                  UNION SELECT ib, ia FROM p),
            verts AS (SELECT vec_id AS id FROM emb),
            reach(id, comp) AS (
                SELECT id, id FROM verts
                UNION
                SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
                WHERE r.comp < e.dst
            )
            SELECT CAST(id AS BIGINT) AS vec_id, CAST(MIN(comp) AS BIGINT) AS rep_id
            FROM reach GROUP BY id ORDER BY id
        """,
    }
)

QUERIES.update(
    {
        "kcore10": q_kcore10,
        "harmonic_centrality": q_harmonic_centrality,
        "cosine_pairs": q_cosine_pairs,
        "embed_neardup": q_embed_neardup,
    }
)


def q_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-core decomposition of the demand graph: coreness per
    vertex via the H-index fixpoint (pregel.core_numbers).  The SQL
    oracle unrolls 20 H-index rounds (fixpoint at 15 on sf0.01, 2 on
    sf0.001; rounds past the fixpoint are no-ops)."""
    e = demand_edges(spark, sf_dir)
    core, _stats = pregel.core_numbers(e)
    return core.select(
        F.col("id").cast("long"), F.col("core").cast("long")
    ).orderBy("id")


def _coreness_sql(rounds: int) -> str:
    """Unrolled H-index iteration over the symmetrized demand graph."""
    parts = [
        "und AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey)",
        "e AS (SELECT src, dst FROM und UNION SELECT dst, src FROM und)",
        "h0 AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS h FROM e GROUP BY src)",
    ]
    for i in range(rounds):
        parts.append(
            f"h{i + 1} AS (SELECT id, MAX(LEAST(rn, hv)) AS h FROM ("
            f"SELECT e.src AS id, h{i}.h AS hv, "
            f"ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY h{i}.h DESC) AS rn "
            f"FROM e JOIN h{i} ON h{i}.id = e.dst) t{i} GROUP BY id)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(id AS BIGINT) AS id, CAST(h AS BIGINT) AS core"
        f"\nFROM h{rounds} ORDER BY id"
    )


ORACLES.update({"core_numbers": _coreness_sql(20)})
QUERIES.update({"core_numbers": q_core_numbers})


def q_ktruss6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-truss (every edge in ≥4 triangles within the subgraph) of the
    co-order graph restricted to parts < 600 — the same oracle-cost cap
    as edge_embeddedness: the full graph converges identically but its
    unrolled oracle costs minutes in DuckDB.  Simultaneous-drop support
    peeling (pregel.ktruss); SQL oracle unrolls 8 peel rounds (fixpoint
    at 5 on sf0.01, 1 on sf0.001; rounds past the fixpoint are no-ops);
    emitted support is recomputed on the final edge set by both
    engines."""
    e = coorder_edges(spark, sf_dir, part_cap=600)
    truss, _stats = pregel.ktruss(e, k=6)
    return truss.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("support")
    ).orderBy("src", "dst")


def _ktruss_parts(k: int, rounds: int) -> list[str]:
    """Unrolled simultaneous-drop truss-peel CTE parts over the bounded
    co-order graph (shared by the ktruss6 and truss_components oracles).
    Support per canonical edge (u<v) counts common neighbors over the
    undirected closure of the CURRENT edge set each round."""
    # MATERIALIZED: every e{i}/s{i} is referenced several times; without
    # it DuckDB inlines the whole prefix per reference (4^rounds scans)
    parts = [
        "op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem WHERE l_partkey < 600)",
        "e0 AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
    ]
    sup = (
        "SELECT c.src AS u, c.dst AS v, COUNT(*) AS s "
        "FROM e{i} c "
        "JOIN s{i} a ON a.src = c.src "
        "JOIN s{i} b ON b.src = c.dst AND b.dst = a.dst "
        "GROUP BY c.src, c.dst"
    )
    for i in range(rounds):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT src, dst FROM e{i} UNION ALL SELECT dst, src FROM e{i})"
        )
        parts.append(f"sup{i} AS MATERIALIZED ({sup.format(i=i)})")
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i} e "
            f"JOIN sup{i} ON sup{i}.u = e.src AND sup{i}.v = e.dst "
            f"WHERE sup{i}.s >= {k - 2})"
        )
    parts.append(
        f"s{rounds} AS MATERIALIZED (SELECT src, dst FROM e{rounds} "
        f"UNION ALL SELECT dst, src FROM e{rounds})"
    )
    parts.append(f"sup{rounds} AS MATERIALIZED ({sup.format(i=rounds)})")
    return parts


def _ktruss_sql(k: int, rounds: int) -> str:
    parts = _ktruss_parts(k, rounds)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(e.src AS BIGINT) AS src, CAST(e.dst AS BIGINT) AS dst,
               CAST(COALESCE(sup{rounds}.s, 0) AS BIGINT) AS support
        FROM e{rounds} e
        LEFT JOIN sup{rounds} ON sup{rounds}.u = e.src AND sup{rounds}.v = e.dst
        ORDER BY e.src, e.dst"""
    )


ORACLES.update({"ktruss6": _ktruss_sql(6, 8)})
QUERIES.update({"ktruss6": q_ktruss6})


def q_random_walks4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-walk corpus over the demand graph (node2vec/DeepWalk
    input): 4 deterministic steps per start vertex, neighbor picked by
    (cur·31 + step·17 + seed) mod out-degree over the id-ranked
    adjacency — identical arithmetic in the unrolled SQL oracle."""
    e = demand_edges(spark, sf_dir)
    walks = pregel.random_walks(e, walk_length=4, seed=42)
    return walks.orderBy("start", "step")


def _walks_sql(walk_length: int, seed: int) -> str:
    parts = [
        "e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey)",
        "nbr AS MATERIALIZED (SELECT src, dst, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) AS rnk, "
        "CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS deg FROM e)",
        "w0 AS (SELECT src AS start, src AS cur FROM nbr GROUP BY src)",
    ]
    for s in range(1, walk_length + 1):
        parts.append(
            f"w{s} AS MATERIALIZED (SELECT w{s - 1}.start, nbr.dst AS cur "
            f"FROM w{s - 1} JOIN nbr ON nbr.src = w{s - 1}.cur "
            f"AND nbr.rnk = ((w{s - 1}.cur * 31 + {s * 17} + {seed}) % nbr.deg) + 1)"
        )
    union = "\nUNION ALL ".join(
        f"SELECT start, {s} AS step, cur FROM w{s}" for s in range(walk_length + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(start AS BIGINT) AS start, CAST(step AS INT) AS step,
               CAST(cur AS BIGINT) AS vertex
        FROM ({union}) u ORDER BY start, step"""
    )


ORACLES.update({"random_walks4": _walks_sql(4, 42)})
QUERIES.update({"random_walks4": q_random_walks4})


def q_random_walks_biased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order (p,q)-biased walk corpus over the demand graph:
    integer class weights (return 4 / common-successor 2 / far 1 ≙
    p=0.5, q=2), candidate picked by cumulative-weight interval at
    (cur·31 + prev·13 + step·17 + seed) mod Σw — unrolled identically
    in the SQL oracle."""
    e = demand_edges(spark, sf_dir)
    walks = pregel.random_walks_biased(e, walk_length=3, seed=42)
    return walks.orderBy("start", "step")


def _walks_biased_sql(
    walk_length: int, seed: int, w_ret: int = 4, w_bfs: int = 2, w_dfs: int = 1
) -> str:
    parts = [
        "e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey)",
        "nbr AS MATERIALIZED (SELECT src, dst, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) AS rnk, "
        "CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS deg FROM e)",
        # step 1 is the uniform pick, carrying prev forward
        "w1 AS MATERIALIZED (SELECT src AS start, src AS prev, dst AS cur "
        f"FROM nbr WHERE rnk = ((src * 31 + 17 + {seed}) % deg) + 1)",
    ]
    for s in range(2, walk_length + 1):
        r = f"(cur * 31 + prev * 13 + {s * 17 + seed}) % tot"
        parts.append(
            f"c{s} AS (SELECT w.start, w.prev, w.cur, n.dst, "
            f"CAST(CASE WHEN n.dst = w.prev THEN {w_ret} "
            f"WHEN p.src IS NOT NULL THEN {w_bfs} ELSE {w_dfs} END AS BIGINT) AS wt "
            f"FROM w{s - 1} w JOIN nbr n ON n.src = w.cur "
            "LEFT JOIN e p ON p.src = w.prev AND p.dst = n.dst)"
        )
        parts.append(
            f"w{s} AS MATERIALIZED (SELECT start, cur AS prev, dst AS cur FROM ("
            "SELECT *, SUM(wt) OVER (PARTITION BY start ORDER BY dst "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            f"SUM(wt) OVER (PARTITION BY start) AS tot FROM c{s}) t "
            f"WHERE cum - wt <= {r} AND {r} < cum)"
        )
    union = "\nUNION ALL ".join(
        ["SELECT src AS start, 0 AS step, src AS cur FROM nbr GROUP BY src"]
        + [f"SELECT start, {s} AS step, cur FROM w{s}" for s in range(1, walk_length + 1)]
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(start AS BIGINT) AS start, CAST(step AS INT) AS step,
               CAST(cur AS BIGINT) AS vertex
        FROM ({union}) u ORDER BY start, step"""
    )


ORACLES.update({"random_walks_biased3": _walks_biased_sql(3, 42)})
QUERIES.update({"random_walks_biased3": q_random_walks_biased})


def q_hits3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the directed demand graph, 3 fixed
    mutual-reinforcement iterations with per-half-step L2
    normalization — unrolled identically in the SQL oracle."""
    e = demand_edges(spark, sf_dir)
    out = pregel.hits(e, n_iter=3)
    return out.select(
        "id", F.round("hub", 7).alias("hub_r"), F.round("authority", 7).alias("auth_r")
    ).orderBy("id")


def _hits_sql(n_iter: int) -> str:
    parts = [
        "e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey)",
        "v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "s0 AS (SELECT id, 1.0 AS hub, 1.0 AS auth FROM v)",
    ]
    for i in range(1, n_iter + 1):
        parts += [
            f"ar{i} AS (SELECT e.dst AS id, SUM(s{i - 1}.hub) AS a "
            f"FROM e JOIN s{i - 1} ON s{i - 1}.id = e.src GROUP BY e.dst)",
            f"af{i} AS (SELECT v.id, COALESCE(ar{i}.a, 0) AS a FROM v LEFT JOIN ar{i} USING (id))",
            f"an{i} AS (SELECT id, a / (SELECT sqrt(sum(a * a)) FROM af{i}) AS auth FROM af{i})",
            f"hr{i} AS (SELECT e.src AS id, SUM(an{i}.auth) AS h "
            f"FROM e JOIN an{i} ON an{i}.id = e.dst GROUP BY e.src)",
            f"hf{i} AS (SELECT v.id, COALESCE(hr{i}.h, 0) AS h FROM v LEFT JOIN hr{i} USING (id))",
            f"s{i} AS (SELECT hn.id, hn.hub, an{i}.auth FROM "
            f"(SELECT id, h / (SELECT sqrt(sum(h * h)) FROM hf{i}) AS hub FROM hf{i}) hn "
            f"JOIN an{i} USING (id))",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, ROUND(hub, 7) AS hub_r,
               ROUND(auth, 7) AS auth_r
        FROM s{n_iter} ORDER BY id"""
    )


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the undirected co-order graph: Pearson
    correlation of endpoint degrees over the symmetric edge list (one
    scalar — the classic mixing-pattern diagnostic)."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    paired = (
        e.join(deg, "src")
        .select("dst", F.col("deg").alias("deg_src"))
        .join(deg.withColumnRenamed("src", "dst"), "dst")
        .select(F.col("deg_src").cast("double"), F.col("deg").cast("double").alias("deg_dst"))
    )
    return paired.agg(F.round(F.corr("deg_src", "deg_dst"), 6).alias("assortativity"))


_ASSORT_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)
SELECT ROUND(corr(ds.deg::DOUBLE, dd.deg::DOUBLE), 6) AS assortativity
FROM e JOIN deg ds ON ds.src = e.src JOIN deg dd ON dd.src = e.dst
"""


def q_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (whitespace tokens, natural-log
    idf over the full corpus) — the curation-pipeline term-salience
    primitive; identical arithmetic in the oracle."""
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).where(F.length("w") > 0)
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").cast("double").alias("tf"))
    df_ = toks.select("doc_id", "w").distinct().groupBy("w").agg(
        F.count("*").cast("double").alias("df")
    )
    scored = tf.join(df_, "w").select(
        "doc_id",
        "w",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", F.col("w").alias("term"), F.round("score", 6).alias("score_r"), "rnk")
        .orderBy("doc_id", "rnk")
    )


_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, w
  FROM documents, unnest(regexp_split_to_array(trim(text), '\s+')) AS u(w)
  WHERE length(w) > 0
), tf AS (
  SELECT doc_id, w, COUNT(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, w
), df AS (
  SELECT w, COUNT(DISTINCT doc_id)::DOUBLE AS df FROM toks GROUP BY w
), n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.w, tf.tf * ln((SELECT n FROM n) / df.df) AS score
  FROM tf JOIN df USING (w)
), ranked AS (
  SELECT doc_id, w, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, w ASC) AS BIGINT) AS rnk
  FROM scored
)
SELECT doc_id, w AS term, ROUND(score, 6) AS score_r, rnk
FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


ORACLES.update(
    {
        "hits3": _hits_sql(3),
        "degree_assortativity": _ASSORT_SQL,
        "tfidf_top3": _TFIDF_SQL,
    }
)
QUERIES.update(
    {
        "hits3": q_hits3,
        "degree_assortativity": q_degree_assortativity,
        "tfidf_top3": q_tfidf_top3,
    }
)


def q_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the 2-round LPA partition on the co-part
    graph: Q = within/2m − Σ_c (K_c/2m)² — the community-quality scalar
    that grades a labeling, computed from the SAME deterministic labels
    the lpa_fixed2 oracle replays."""
    e = copart_edges(spark, sf_dir)
    labels, _ = pregel.label_propagation(e, max_iter=2)
    sym = _sym(e)
    m2 = sym.count()
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
    within = (
        sym.join(la, "src").join(lb, "dst").where(F.col("la") == F.col("lb")).count()
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    sq = (
        labels.join(deg, "id")
        .groupBy("label")
        .agg(F.sum("deg").alias("kc"))
        .agg(F.sum((F.col("kc") / m2) * (F.col("kc") / m2)).alias("s"))
        .collect()[0]["s"]
    )
    q = within / m2 - float(sq)
    return spark.createDataFrame([(round(q, 6),)], "modularity double")


def _modularity_sql(n_iter: int = 2) -> str:
    rounds = "".join("," + _LPA_ROUND.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH {_COPART_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)
{rounds},
deg AS (SELECT src AS id, COUNT(*)::DOUBLE AS deg FROM e GROUP BY src),
m2 AS (SELECT COUNT(*)::DOUBLE AS m2 FROM e),
w AS (SELECT COUNT(*)::DOUBLE AS w FROM e
      JOIN l{n_iter} a ON a.id = e.src JOIN l{n_iter} b ON b.id = e.dst
      WHERE a.label = b.label),
comm AS (SELECT a.label, SUM(deg.deg) AS kc FROM l{n_iter} a JOIN deg ON deg.id = a.id GROUP BY a.label)
SELECT ROUND((SELECT w FROM w) / (SELECT m2 FROM m2)
       - (SELECT SUM((kc / (SELECT m2 FROM m2)) * (kc / (SELECT m2 FROM m2))) FROM comm),
       6) AS modularity
"""


def q_eccentricity4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark eccentricities on the undirected co-order graph: BFS
    from the 4 smallest part ids, depth-bounded at 12; the max over
    landmarks is the standard diameter lower bound."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    sources = [int(r["src"]) for r in e.select("src").distinct().orderBy("src").limit(4).collect()]
    dist, _stats = pregel.bfs_per_source(e, sources=sources, max_depth=12)
    return (
        dist.groupBy(F.col("source").cast("long").alias("source"))
        .agg(
            F.max("dist").cast("long").alias("eccentricity"),
            F.count("*").cast("long").alias("reached"),
        )
        .orderBy("source")
    )


_ECC_SQL = f"""
WITH RECURSIVE {_COORDER_SQL},
{_SYM_SQL},
lm AS (SELECT src AS s FROM e GROUP BY src ORDER BY src LIMIT 4),
reach(s, id, d) AS (
    SELECT s, s, 0 FROM lm
    UNION
    SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id WHERE r.d < 12
),
dist AS (SELECT s, id, MIN(d) AS d FROM reach GROUP BY s, id)
SELECT CAST(s AS BIGINT) AS source, CAST(MAX(d) AS BIGINT) AS eccentricity,
       CAST(COUNT(*) AS BIGINT) AS reached
FROM dist GROUP BY s ORDER BY source
"""


def q_link_prediction5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction: score NON-adjacent distance-2
    pairs of the co-order graph (pairs < 400, the oracle-cost cap
    precedent) and keep the top-5 candidates per vertex — the
    neighborhood-overlap recommender the reference's modeling docs
    motivate for dependency discovery."""
    sym = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    su = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    sv = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    two_hop = (
        su.join(sv, "w")
        .where((F.col("u") < F.col("v")) & (F.col("u") < 400) & (F.col("v") < 400))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    non_edges = two_hop.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    win = Window.partitionBy("u").orderBy(F.desc("cn"), F.asc("v"))
    return (
        non_edges.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("u", "v", F.col("cn").cast("long").alias("common_neighbors"), "rnk")
        .orderBy("u", "rnk")
    )


_LINKPRED_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
two_hop AS (
    SELECT a.src AS u, b.dst AS v, COUNT(*) AS cn
    FROM e a JOIN e b ON a.dst = b.src
    WHERE a.src < b.dst AND a.src < 400 AND b.dst < 400
    GROUP BY a.src, b.dst
),
non_edges AS (
    SELECT t.* FROM two_hop t
    LEFT JOIN e ON e.src = t.u AND e.dst = t.v
    WHERE e.src IS NULL
),
ranked AS (
    SELECT u, v, cn,
           CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY cn DESC, v ASC) AS BIGINT) AS rnk
    FROM non_edges
)
SELECT u, v, CAST(cn AS BIGINT) AS common_neighbors, rnk
FROM ranked WHERE rnk <= 5 ORDER BY u, rnk
"""


def q_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-nation order-value percentiles (p50/p90/p99, linear
    interpolation — Spark's exact ``percentile`` == DuckDB's
    ``quantile_cont``): the distribution-shape diagnostic every
    analytics engine is asked for."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").cast("long").alias("nation"))
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
        )
        .orderBy("nation")
    )


_PERCENTILES_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nation,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey ORDER BY nation
"""


ORACLES.update(
    {
        "modularity_lpa": _modularity_sql(2),
        "eccentricity4": _ECC_SQL,
        "link_prediction5": _LINKPRED_SQL,
        "order_percentiles": _PERCENTILES_SQL,
    }
)
QUERIES.update(
    {
        "modularity_lpa": q_modularity_lpa,
        "eccentricity4": q_eccentricity4,
        "link_prediction5": q_link_prediction5,
        "order_percentiles": q_order_percentiles,
    }
)


def q_scc_custgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of a deterministic functional-ish
    directed graph over customers: c → (31c+7) mod n, plus
    c → (17c+3) mod n for c ≡ 0 (mod 3) — cycles with trees hanging off
    them, so SCCs are non-trivial.  Labels = min member id; vertices
    outside any cycle are singleton SCCs (mapped to themselves).  Oracle
    = transitive closure + mutual-reachability in SQL."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    n = cust.count()
    c = F.col("c_custkey")
    e = (
        cust.select(c.alias("src"), ((c * 31 + 7) % n).alias("dst"))
        .unionByName(
            cust.where(c % 3 == 0).select(c.alias("src"), ((c * 17 + 3) % n).alias("dst"))
        )
    )
    scc, _stats = pregel.strongly_connected_components(e)
    verts = cust.select(c.cast("long").alias("id"))
    return (
        verts.join(scc, "id", "left")
        .select("id", F.coalesce(F.col("scc"), F.col("id")).alias("scc"))
        .orderBy("id")
    )


ORACLES.update(
    {
        "scc_custgraph": """
            WITH RECURSIVE
            nn AS (SELECT COUNT(*) AS n FROM customer),
            verts AS (SELECT c_custkey AS id FROM customer),
            e0 AS (SELECT id AS src, (id * 31 + 7) % nn.n AS dst FROM verts CROSS JOIN nn
                   UNION
                   SELECT id, (id * 17 + 3) % nn.n FROM verts CROSS JOIN nn WHERE id % 3 = 0),
            e AS (SELECT src, dst FROM e0 WHERE src != dst),
            reach(a, b) AS (
                SELECT src, dst FROM e
                UNION
                SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
            ),
            mutual AS (SELECT r1.a AS a, r1.b AS b
                       FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a)
            SELECT CAST(v.id AS BIGINT) AS id,
                   CAST(COALESCE(MIN(m.b), v.id) AS BIGINT) AS scc
            FROM verts v LEFT JOIN mutual m ON m.a = v.id
            GROUP BY v.id ORDER BY v.id
        """,
    }
)
QUERIES.update({"scc_custgraph": q_scc_custgraph})


def q_anf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighborhood function (2 hops) on the demand graph:
    Flajolet-Martin registers OR-merged along edges (pregel.anf).  The
    sketch is deterministic (overflow-safe xorshift-multiply hash), so
    the SQL oracle reproduces the registers and estimates exactly."""
    e = demand_edges(spark, sf_dir)
    est, _stats = pregel.anf(e, rounds=2, replicas=8, seed=1)
    return est.select(
        F.col("id").cast("long"), F.round("est", 6).alias("est_r")
    ).orderBy("id")


def _anf_sql(rounds: int, replicas: int, seed: int) -> str:
    parts = [
        "e AS MATERIALIZED (SELECT src, dst FROM ("
        "SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey) "
        "WHERE src != dst)",
        "verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        f"js AS (SELECT UNNEST(range({replicas})) AS j)",
        f"""m AS (SELECT id, CAST(j AS INT) AS j,
              (v.id * 2654435761 + j * 97 + {seed}) % 2147483648 AS x0
            FROM verts v CROSS JOIN js)""",
        "m1 AS (SELECT id, j, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM m)",
        "m2 AS (SELECT id, j, xor(x1, x1 >> 17) AS h FROM m1)",
        "r0 AS MATERIALIZED (SELECT id, j, "
        "CAST(1 AS BIGINT) << LEAST(bit_count(((h & -h) - 1)), 62) AS reg FROM m2)",
    ]
    for i in range(rounds):
        parts.append(
            f"n{i} AS MATERIALIZED (SELECT e.src AS id, r.j, bit_or(r.reg) AS nreg "
            f"FROM e JOIN r{i} r ON r.id = e.dst GROUP BY e.src, r.j)"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED (SELECT r.id, r.j, "
            f"r.reg | COALESCE(n.nreg, 0) AS reg "
            f"FROM r{i} r LEFT JOIN n{i} n ON n.id = r.id AND n.j = r.j)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id,
               ROUND(POW(2.0, AVG(CAST(bit_count((((~reg) & (reg + 1)) - 1)) AS DOUBLE)))
                     / 0.77351, 6) AS est_r
        FROM r{rounds} GROUP BY id ORDER BY id"""
    )


ORACLES.update({"anf2": _anf_sql(2, 8, 1)})
QUERIES.update({"anf2": q_anf2})


def q_betweenness4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark betweenness (bounded-depth Brandes, 4 landmarks, depth
    4) on the co-order graph restricted to parts < 400 (oracle-cost cap,
    same as edge_embeddedness).  Forward σ sweep + backward δ
    accumulation, level-synchronous; the unrolled SQL oracle runs the
    identical truncated recursion."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    sym = _sym(und)
    lm = [int(r[0]) for r in sym.select("src").distinct().orderBy("src").limit(4).collect()]
    bc, _stats = pregel.betweenness_landmarks(sym, lm, max_depth=4)
    return bc.select(
        F.col("id").cast("long"), F.round("bc", 6).alias("bc_r")
    ).orderBy("id")


def _betweenness_sql(depth: int) -> str:
    parts = [
        "op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey < 400)",
        "und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
        "e AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "verts AS (SELECT DISTINCT src AS id FROM e)",
        "lm AS (SELECT id FROM verts ORDER BY id LIMIT 4)",
        "l0 AS MATERIALIZED (SELECT id AS source, id, CAST(1 AS BIGINT) AS sigma FROM lm)",
        "v0 AS (SELECT source, id FROM l0)",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"l{d} AS MATERIALIZED (SELECT t.source, t.id, SUM(t.sigma) AS sigma FROM ("
            f"SELECT p.source, e.dst AS id, p.sigma FROM l{d - 1} p "
            f"JOIN e ON e.src = p.id) t "
            f"WHERE NOT EXISTS (SELECT 1 FROM v{d - 1} v "
            f"WHERE v.source = t.source AND v.id = t.id) "
            f"GROUP BY t.source, t.id)"
        )
        parts.append(
            f"v{d} AS MATERIALIZED (SELECT source, id FROM v{d - 1} "
            f"UNION ALL SELECT source, id FROM l{d})"
        )
    parts.append(f"dd{depth} AS (SELECT source, id, 0.0 AS delta FROM l{depth})")
    for d in range(depth - 1, 0, -1):
        parts.append(
            f"dd{d} AS MATERIALIZED (SELECT l.source, l.id, "
            f"COALESCE(c.delta, 0.0) AS delta FROM l{d} l LEFT JOIN ("
            f"SELECT p.source, p.id, "
            f"SUM(CAST(p.sigma AS DOUBLE) / w.sigma * (1.0 + dw.delta)) AS delta "
            f"FROM l{d} p JOIN e ON e.src = p.id "
            f"JOIN l{d + 1} w ON w.source = p.source AND w.id = e.dst "
            f"JOIN dd{d + 1} dw ON dw.source = p.source AND dw.id = e.dst "
            f"GROUP BY p.source, p.id) c ON c.source = l.source AND c.id = l.id)"
        )
    union = "\nUNION ALL ".join(
        f"SELECT id, delta FROM dd{d}" for d in range(1, depth)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(v.id AS BIGINT) AS id,
               ROUND(COALESCE(SUM(u.delta), 0.0), 6) AS bc_r
        FROM verts v LEFT JOIN ({union}) u ON u.id = v.id
        GROUP BY v.id ORDER BY v.id"""
    )


ORACLES.update({"betweenness4": _betweenness_sql(4)})
QUERIES.update({"betweenness4": q_betweenness4})


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths from the smallest vertex over the
    undirected demand graph (edge weight = total order lines between
    the pair): frontier-scoped Bellman-Ford relaxation (pregel.sssp).
    SQL oracle unrolls 8 relaxation rounds (fixpoint at 4 on both
    sf0.001 and sf0.01; relaxation past the fixpoint is a no-op)."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    dir_w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    und = dir_w.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.sum("w").alias("w"))
    e = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    src0 = int(e.agg(F.min("src")).collect()[0][0])
    dist, _stats = pregel.sssp(e, sources=[src0])
    return dist.orderBy("id")


def _sssp_sql(rounds: int) -> str:
    parts = [
        "dw AS MATERIALIZED (SELECT o_custkey AS src, l_suppkey AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey GROUP BY 1, 2)",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "CAST(SUM(w) AS BIGINT) AS w FROM dw GROUP BY 1, 2)",
        "e AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM und "
        "UNION ALL SELECT b, a, w FROM und)",
        "d0 AS (SELECT MIN(src) AS id, CAST(0 AS BIGINT) AS dist FROM e)",
    ]
    for i in range(rounds):
        parts.append(
            f"d{i + 1} AS MATERIALIZED (SELECT id, MIN(dist) AS dist FROM ("
            f"SELECT id, dist FROM d{i} "
            f"UNION ALL "
            f"SELECT e.dst AS id, d.dist + e.w FROM d{i} d JOIN e ON e.src = d.id"
            f") t GROUP BY id)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist
        FROM d{rounds} ORDER BY id"""
    )


ORACLES.update({"sssp_weighted": _sssp_sql(8)})
QUERIES.update({"sssp_weighted": q_sssp_weighted})


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient on the co-order graph:
    cc(v) = 2·triangles(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2 — the
    neighborhood-density profile, composed from the existing per-vertex
    triangle count and undirected degree primitives."""
    e = coorder_edges(spark, sf_dir)
    per_vertex, _total = pregel.triangle_count(e)
    deg = pregel.degrees(e)
    return (
        deg.join(per_vertex, "id", "left")
        .select(
            F.col("id").cast("long"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce(F.col("triangles"), F.lit(0)).cast("double")
                    / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("cc_r"),
        )
        .orderBy("id")
    )


ORACLES.update(
    {
        "clustering_coeff": f"""
            WITH {_COORDER_SQL},
            tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
                    FROM und a JOIN und b ON b.src = a.dst
                    JOIN und c ON c.src = a.src AND c.dst = b.dst),
            corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
                        UNION ALL SELECT z FROM tri),
            pv AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id),
            {_SYM_SQL},
            deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src)
            SELECT CAST(deg.id AS BIGINT) AS id,
                   ROUND(CASE WHEN deg.d >= 2
                         THEN 2.0 * COALESCE(pv.t, 0) / (deg.d * (deg.d - 1))
                         ELSE 0.0 END, 6) AS cc_r
            FROM deg LEFT JOIN pv ON pv.id = deg.id
            ORDER BY deg.id
        """,
    }
)
QUERIES.update({"clustering_coeff": q_clustering_coeff})


def q_mis_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set (deterministic Luby) on the co-order
    graph — the symmetry-breaking primitive behind distributed coloring
    and scheduling.  Unrolled-SQL oracle computes the identical set
    (10 rounds; fixpoint at 7 on sf0.01, 3 on sf0.001)."""
    e = coorder_edges(spark, sf_dir)
    mis, _stats = pregel.maximal_independent_set(e, seed=11)
    return mis.orderBy("id")


def _mis_sql(rounds: int, seed: int) -> str:
    parts = [
        _COORDER_SQL.strip(),
        "e AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "v AS (SELECT DISTINCT src AS id FROM e)",
        f"h0 AS (SELECT id, (id * 2654435761 + {seed}) % 2147483648 AS x0 FROM v)",
        "h1 AS (SELECT id, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM h0)",
        "pri AS MATERIALIZED (SELECT id, (xor(x1, x1 >> 17) % 1073741824)"
        " * 8589934592 + id AS p FROM h1)",
        "u0 AS (SELECT id, p FROM pri)",
    ]
    for i in range(rounds):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT u.id FROM u{i} u LEFT JOIN ("
            f"SELECT e.src AS id, MIN(p2.p) AS minp FROM e "
            f"JOIN u{i} u2 ON u2.id = e.dst JOIN u{i} u1 ON u1.id = e.src "
            f"JOIN pri p2 ON p2.id = e.dst GROUP BY e.src) n ON n.id = u.id "
            f"JOIN pri ON pri.id = u.id "
            f"WHERE n.minp IS NULL OR pri.p < n.minp)"
        )
        parts.append(
            f"u{i + 1} AS MATERIALIZED (SELECT u.id, u.p FROM u{i} u "
            f"WHERE u.id NOT IN (SELECT id FROM m{i}) "
            f"AND u.id NOT IN (SELECT e.dst FROM e JOIN m{i} m ON m.id = e.src))"
        )
    union = "\nUNION ALL ".join(f"SELECT id FROM m{i}" for i in range(rounds))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(v.id AS BIGINT) AS id, (mis.id IS NOT NULL) AS in_mis
        FROM v LEFT JOIN ({union}) mis ON mis.id = v.id
        ORDER BY v.id"""
    )


ORACLES.update({"mis_luby": _mis_sql(10, 11)})
QUERIES.update({"mis_luby": q_mis_luby})


# --------------------------------------------------------------------------
# round-4 extension: corpus-curation screens a pre-training pipeline runs at
# full corpus scale — PII scrub (pure map stage), Gopher-style repetition
# signals (one explode + two hash aggs), and benchmark-contamination
# screening (broadcast join against the tiny eval set; the corpus side
# never shuffles for the join).  Reference analog: Polar's per-entity
# sanitize/normalize passes (src/agents/*/processor) — here re-expressed
# as declarative whole-stage-codegen expressions.

_PII_SQL = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def _pii_augmented(docs: DataFrame) -> DataFrame:
    """Deterministically plant PII in the synthetic corpus (both engines
    derive the identical augmented text, so counts AND the redacted
    sha256 are exact cross-engine invariants)."""
    d = F.col("doc_id")
    ssn = F.when(
        d % 3 == 0,
        F.format_string(" ssn %03d-%02d-%04d", d % 1000, d % 100, d % 10000),
    ).otherwise(F.lit(""))
    aug = F.format_string(
        "%s contact user%d@ex%d.org call %03d-555-%04d ip 10.%d.0.%d%s",
        F.col("text"),
        d,
        d % 7,
        d % 900 + 100,
        d % 10000,
        d % 256,
        d % 200 + 1,
        ssn,
    )
    return docs.select("doc_id", aug.alias("text"))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polar_spark.operators.text import pii_scrub

    docs = load_table(spark, "documents", sf_dir)
    out = pii_scrub(_pii_augmented(docs))
    return out.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ipv4",
        F.sha2(F.col("redacted").cast("binary"), 256).alias("redacted_sha256"),
    )


def _pii_sql() -> str:
    aug = (
        "printf('%s contact user%d@ex%d.org call %03d-555-%04d ip 10.%d.0.%d%s', "
        "text, doc_id, doc_id % 7, doc_id % 900 + 100, doc_id % 10000, "
        "doc_id % 256, doc_id % 200 + 1, "
        "CASE WHEN doc_id % 3 = 0 THEN printf(' ssn %03d-%02d-%04d', "
        "doc_id % 1000, doc_id % 100, doc_id % 10000) ELSE '' END)"
    )
    red = "text"
    for _name, pat, token in _PII_SQL:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _token in _PII_SQL
    )
    return f"""
        WITH aug AS (SELECT doc_id, {aug} AS text FROM documents)
        SELECT doc_id,
               {counts},
               sha256({red}) AS redacted_sha256
        FROM aug
    """


ORACLES.update({"pii_scrub": _pii_sql()})
QUERIES.update({"pii_scrub": q_pii_scrub})


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polar_spark.operators.text import ngram_repetition

    docs = load_table(spark, "documents", sf_dir)
    out = ngram_repetition(docs.select("doc_id", "text"))
    return out.select(
        "doc_id",
        F.round("dup_bigram_frac", 6).alias("dup_bigram_frac_r"),
        F.round("dup_trigram_frac", 6).alias("dup_trigram_frac_r"),
        "max_bigram_count",
        "max_trigram_count",
    )


ORACLES.update(
    {
        "repetition": r"""
        WITH toks AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS t
                      FROM documents),
        g AS (
            SELECT doc_id, 2 AS n, array_to_string(t[i + 1 : i + 2], ' ') AS g
            FROM toks, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2
            UNION ALL
            SELECT doc_id, 3 AS n, array_to_string(t[i + 1 : i + 3], ' ') AS g
            FROM toks, unnest(range(len(t) - 2)) AS u(i) WHERE len(t) >= 3
        ),
        pg AS (SELECT doc_id, n, g, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
        agg AS (SELECT doc_id,
                       SUM(CASE WHEN n = 2 THEN c END) AS tot2,
                       SUM(CASE WHEN n = 2 THEN 1 END) AS dst2,
                       MAX(CASE WHEN n = 2 THEN c END) AS max2,
                       SUM(CASE WHEN n = 3 THEN c END) AS tot3,
                       SUM(CASE WHEN n = 3 THEN 1 END) AS dst3,
                       MAX(CASE WHEN n = 3 THEN c END) AS max3
                FROM pg GROUP BY doc_id)
        SELECT d.doc_id,
               ROUND(CASE WHEN tot2 > 0 THEN 1.0 - CAST(dst2 AS DOUBLE) / CAST(tot2 AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_bigram_frac_r,
               ROUND(CASE WHEN tot3 > 0 THEN 1.0 - CAST(dst3 AS DOUBLE) / CAST(tot3 AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_trigram_frac_r,
               CAST(COALESCE(max2, 0) AS BIGINT) AS max_bigram_count,
               CAST(COALESCE(max3, 0) AS BIGINT) AS max_trigram_count
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """
    }
)
QUERIES.update({"repetition": q_repetition})


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval set = the first-20-token 5-grams of every 97th document (a
    deterministic planted overlap); screen the whole corpus against it."""
    from polar_spark.operators.text import contamination_overlap

    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    head = F.slice(toks, 1, 20)
    bench = (
        docs.where(F.col("doc_id") % 97 == 0)
        .select(
            F.explode(
                F.when(
                    F.size(head) >= 5,
                    F.transform(
                        F.sequence(F.lit(1), F.size(head) - 4),
                        lambda i: F.array_join(F.slice(head, i, 5), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g")
        )
    )
    out = contamination_overlap(docs.select("doc_id", "text"), bench, n=5)
    return out.select(
        "doc_id",
        "n_contaminated_grams",
        "n_contaminated_occurrences",
        "contaminated",
    )


ORACLES.update(
    {
        "contamination": r"""
        WITH toks AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS t
                      FROM documents),
        grams AS (SELECT doc_id, array_to_string(t[i + 1 : i + 5], ' ') AS g
                  FROM toks, unnest(range(len(t) - 4)) AS u(i) WHERE len(t) >= 5),
        bench AS (SELECT DISTINCT array_to_string(t[i + 1 : i + 5], ' ') AS g
                  FROM toks, unnest(range(LEAST(len(t), 20) - 4)) AS u(i)
                  WHERE doc_id % 97 = 0 AND len(t) >= 5),
        hits AS (SELECT d.doc_id, COUNT(DISTINCT d.g) AS ng, COUNT(*) AS occ
                 FROM grams d JOIN bench b ON b.g = d.g GROUP BY d.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(ng, 0) AS BIGINT) AS n_contaminated_grams,
               CAST(COALESCE(occ, 0) AS BIGINT) AS n_contaminated_occurrences,
               (COALESCE(ng, 0) > 0) AS contaminated
        FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
    """
    }
)
QUERIES.update({"contamination": q_contamination})


def q_kmeans8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 3 update rounds) over the
    embeddings table — assignment is a pure map stage with the centroids
    inlined as literals (no shuffle, no Python); update is one k-key
    aggregation per round.  DuckDB replays the identical arithmetic
    (same init, same tie-break, same sum/count averaging)."""
    from polar_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, "embeddings", sf_dir)
    out, _cents = kmeans_lloyd(emb, k=8, n_iter=3)
    return out.select("id", "cluster", F.round("dist", 6).alias("dist_r"))


def _kmeans_parts(k: int, n_iter: int) -> tuple[list[str], str]:
    """Shared unrolled-Lloyd CTE chain (init from k smallest ids,
    argmin tie-break (dist, cid), sum/count averaging, empty clusters
    keep their previous centroid) — reused by the k-means oracle and
    every oracle that builds on its assignment (SemDedup)."""
    dist = (
        "list_sum(list_transform(list_zip(e.v, c.v), "
        "t -> (t[1] - t[2]) * (t[1] - t[2])))"
    )
    parts = [
        "e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings WHERE embedding IS NOT NULL)",
        f"c0 AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid, v "
        f"FROM (SELECT id, v FROM e ORDER BY id LIMIT {k}) s)",
    ]
    for t in range(n_iter):
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT id, v, cid FROM ("
            f"SELECT e.id, e.v, c.cid, "
            f"ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {dist}, c.cid) AS rn "
            f"FROM e CROSS JOIN c{t} c) x WHERE rn = 1)"
        )
        parts.append(
            f"u{t} AS (SELECT cid, i, AVG(x) AS m FROM ("
            f"SELECT cid, generate_subscripts(v, 1) AS i, UNNEST(v) AS x "
            f"FROM a{t}) z GROUP BY cid, i)"
        )
        parts.append(
            f"c{t + 1} AS MATERIALIZED (SELECT c.cid, COALESCE(nv.v, c.v) AS v "
            f"FROM c{t} c LEFT JOIN (SELECT cid, list(m ORDER BY i) AS v "
            f"FROM u{t} GROUP BY cid) nv ON nv.cid = c.cid)"
        )
    return parts, dist


def _kmeans_sql(k: int, n_iter: int) -> str:
    """Unrolled Lloyd's k-means — the same arithmetic q_kmeans8 runs
    distributed (see :func:`_kmeans_parts`)."""
    parts, dist = _kmeans_parts(k, n_iter)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT id, CAST(cid AS BIGINT) AS cluster, ROUND(dist, 6) AS dist_r
        FROM (SELECT e.id, c.cid, {dist} AS dist,
                     ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {dist}, c.cid) AS rn
              FROM e CROSS JOIN c{n_iter} c) x
        WHERE rn = 1"""
    )


ORACLES.update({"kmeans8": _kmeans_sql(8, 3)})
QUERIES.update({"kmeans8": q_kmeans8})




_MIX_SQL = (
    "SELECT doc_id, source, "
    "xor(x1, x1 >> 17) % 10000 AS bucket FROM ("
    "SELECT doc_id, source, "
    "(xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM ("
    "SELECT doc_id, source, "
    "(doc_id * 2654435761 + {seed}) % 2147483648 AS x0 FROM documents) a) b"
)


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by hash bucket —
    reproducible on any cluster size, no RNG state."""
    from polar_spark.operators.sampling import split_assign

    docs = load_table(spark, "documents", sf_dir)
    out = split_assign(
        docs, [("train", 0.9), ("val", 0.05), ("test", 0.05)], seed=11
    )
    return out.select("doc_id", "bucket", "split")


ORACLES.update(
    {
        "split_assign": f"""
        SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM ({_MIX_SQL.format(seed=11)}) m
    """
    }
)
QUERIES.update({"split_assign": q_split_assign})


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixing rates: keep 100% of src0, 50% of src1, 25% of
    src2, 10% of src3, 5% of everything else — the corpus-construction
    sampling pass, a pure pushdown-friendly filter."""
    from polar_spark.operators.sampling import stratified_sample

    docs = load_table(spark, "documents", sf_dir)
    out = stratified_sample(
        docs,
        {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
        seed=23,
        default_fraction=0.05,
    )
    return out.select("doc_id", "source")


ORACLES.update(
    {
        "stratified_sample": f"""
        SELECT doc_id, source
        FROM ({_MIX_SQL.format(seed=23)}) m
        WHERE bucket < CASE source
                           WHEN 'src0' THEN 10000
                           WHEN 'src1' THEN 5000
                           WHEN 'src2' THEN 2500
                           WHEN 'src3' THEN 1000
                           ELSE 500 END
    """
    }
)
QUERIES.update({"stratified_sample": q_stratified_sample})


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length training-sequence layout (GPT-style concatenate-and-
    chunk, seq_len=256, 1 EOD separator per doc): per document, its
    absolute stream offset and the sequence-id range it spans —
    computed with the two-phase distributed prefix sum (no global
    single-partition window)."""
    from polar_spark.operators.packing import pack_sequences

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    out = pack_sequences(toks, seq_len=256, buckets=32)
    return out.select(
        "doc_id", "n_tokens", "start_offset", "first_seq", "last_seq", "n_seqs"
    )


ORACLES.update(
    {
        "seq_packing": r"""
        SELECT doc_id, n_tokens,
               start_offset,
               CAST(FLOOR(start_offset / 256.0) AS BIGINT) AS first_seq,
               CAST(FLOOR((start_offset + GREATEST(n_tokens, 1) - 1) / 256.0) AS BIGINT) AS last_seq,
               CAST(FLOOR((start_offset + GREATEST(n_tokens, 1) - 1) / 256.0)
                    - FLOOR(start_offset / 256.0) + 1 AS BIGINT) AS n_seqs
        FROM (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens + 1) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                       AS start_offset
            FROM (
                SELECT doc_id,
                       CAST(len(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
                FROM documents
            ) t
        ) s
    """
    }
)
QUERIES.update({"seq_packing": q_seq_packing})


def q_msf_copart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest (Borůvka, deterministic (w,u,v) total
    order) of the weighted supplier co-part graph — w = number of
    shared parts, so the MSF is the cheapest connectivity backbone of
    the supplier network.  Oracle replays the identical unique MSF with
    a recursive-CTE Kruskal under the same edge order."""
    li = load_table(spark, "lineitem", sf_dir)
    # grouped pair expansion (the copart_edges rewrite): one exchange
    # feeds the per-part supplier pairs instead of distinct + self-join
    groups = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .groupBy("p")
        .agg(F.collect_set("s").alias("ps"))
        .where(F.size("ps") >= 2)
    )
    wund = _pair_expand(groups).groupBy("src", "dst").agg(F.count("*").alias("w"))
    msf, _ = pregel.minimum_spanning_forest(wund)
    return msf.select(
        F.col("u").cast("long"), F.col("v").cast("long"), F.col("w").cast("long")
    ).orderBy("w", "u", "v")


ORACLES.update(
    {
        # Kruskal under the (w, u, v) total order, one MERGE per
        # recursion step (the next-accepted edge is the min-rank edge
        # whose endpoints differ in component; skipped edges are
        # internal forever, so jumping merge-to-merge is exact and
        # V-1 steps instead of E)
        "msf_copart": """
        WITH RECURSIVE
        pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
        g AS (SELECT a.s AS u, b.s AS v, COUNT(*) AS w
              FROM pairs a JOIN pairs b ON a.p = b.p AND a.s < b.s
              GROUP BY a.s, b.s),
        verts AS (SELECT DISTINCT id FROM (SELECT u AS id FROM g UNION ALL SELECT v FROM g) t),
        ranked AS (SELECT u, v, w, ROW_NUMBER() OVER (ORDER BY w, u, v) AS r FROM g),
        uf AS (
          SELECT 0 AS step, id, id AS comp FROM verts
          UNION ALL
          SELECT step + 1, id,
                 CASE WHEN comp IN (mcu, mcv) THEN LEAST(mcu, mcv) ELSE comp END AS comp
          FROM (
            SELECT step, id, comp, r, mr,
                   MAX(CASE WHEN r = mr THEN cu END) OVER (PARTITION BY step) AS mcu,
                   MAX(CASE WHEN r = mr THEN cv END) OVER (PARTITION BY step) AS mcv,
                   ROW_NUMBER() OVER (PARTITION BY step, id ORDER BY r) AS rn
            FROM (
              SELECT step, id, comp, r, cu, cv,
                     MIN(CASE WHEN cu <> cv THEN r END) OVER (PARTITION BY step) AS mr
              FROM (
                SELECT x.step, x.id, x.comp, x.r,
                       MAX(CASE WHEN x.id = x.eu THEN x.comp END)
                           OVER (PARTITION BY x.step, x.r) AS cu,
                       MAX(CASE WHEN x.id = x.ev THEN x.comp END)
                           OVER (PARTITION BY x.step, x.r) AS cv
                FROM (
                  SELECT u0.step, u0.id, u0.comp, e.r, e.u AS eu, e.v AS ev
                  FROM uf u0 JOIN ranked e ON u0.id = e.u OR u0.id = e.v
                ) x
              ) l2
            ) l3
          ) l4
          WHERE rn = 1 AND mr IS NOT NULL
        )
        SELECT CAST(e.u AS BIGINT) AS u, CAST(e.v AS BIGINT) AS v, CAST(e.w AS BIGINT) AS w
        FROM (
          SELECT a.step, MIN(e.r) AS mr
          FROM ranked e
          JOIN uf a ON a.id = e.u
          JOIN uf b ON b.step = a.step AND b.id = e.v
          WHERE a.comp <> b.comp
          GROUP BY a.step
        ) c JOIN ranked e ON e.r = c.mr
        ORDER BY e.w, e.u, e.v
    """
    }
)
QUERIES.update({"msf_copart": q_msf_copart})


def _cm_col_sql(key: str, r: int, width: int, seed: int) -> str:
    """The count-min hash row in DuckDB arithmetic — byte-for-byte the
    sketches._cm_col mix (every intermediate < 2^62)."""
    x0 = f"(({key} * 2654435761 + {r * 1000003 + seed}) % 2147483648)"
    x1 = f"((xor({x0}, {x0} >> 13) * 1274126177) % 2147483648)"
    return f"(xor({x1}, {x1} >> 17) % {width})"


def q_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over event user_ids (depth 4,
    width 512): top-15 keys by estimated frequency, deterministic
    tie-break.  The oracle replays the identical sketch cells in SQL —
    cross-engine-exact hash family, not an approximation comparison."""
    from polar_spark.operators.sketches import cm_heavy_hitters

    ev = load_table(spark, "events", sf_dir)
    return cm_heavy_hitters(ev, "user_id", k=15, depth=4, width=512, seed=7).select(
        F.col("user_id").cast("long"), F.col("est").cast("long")
    )


def _cm_hh_sql(depth: int, width: int, seed: int, k: int) -> str:
    build = "\nUNION ALL ".join(
        f"SELECT {r} AS row, {_cm_col_sql('user_id', r, width, seed)} AS col FROM events"
        for r in range(depth)
    )
    probe = "\nUNION ALL ".join(
        f"SELECT user_id, {r} AS row, {_cm_col_sql('user_id', r, width, seed)} AS col FROM ks"
        for r in range(depth)
    )
    return f"""
        WITH cells AS (
          SELECT row, col, COUNT(*) AS cnt FROM ({build}) b GROUP BY row, col
        ),
        ks AS (SELECT DISTINCT user_id FROM events),
        probes AS ({probe})
        SELECT CAST(p.user_id AS BIGINT) AS user_id, CAST(MIN(c.cnt) AS BIGINT) AS est
        FROM probes p JOIN cells c ON p.row = c.row AND p.col = c.col
        GROUP BY p.user_id
        ORDER BY est DESC, user_id ASC
        LIMIT {k}
    """


ORACLES.update({"cm_heavy_hitters": _cm_hh_sql(4, 512, 7, 15)})
QUERIES.update({"cm_heavy_hitters": q_cm_heavy_hitters})


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic on lineitem's part key: the top-10
    heaviest keys with count and integer-ppm share — the pre-join salt
    decision input."""
    from polar_spark.operators.sketches import skew_report

    li = load_table(spark, "lineitem", sf_dir)
    return skew_report(li, "l_partkey", top=10).select(
        F.col("l_partkey").cast("long"), F.col("n").cast("long"), "share_ppm"
    )


ORACLES.update(
    {
        "skew_report": """
        WITH tot AS (SELECT COUNT(*) AS t FROM lineitem)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST((COUNT(*) * 1000000) // (SELECT t FROM tot) AS BIGINT) AS share_ppm
        FROM lineitem
        GROUP BY l_partkey
        ORDER BY n DESC, l_partkey ASC
        LIMIT 10
    """
    }
)
QUERIES.update({"skew_report": q_skew_report})


_LPA_W_ROUND = """
cw{K} AS (SELECT e.dst AS id, p.label AS lbl, SUM(e.w) AS ws
          FROM ew e JOIN lw{KM1} p ON p.id = e.src GROUP BY e.dst, p.label),
ww{K} AS (SELECT id, lbl FROM (
            SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY ws DESC, lbl ASC) AS rn
            FROM cw{K}) t WHERE rn = 1),
lw{K} AS (SELECT v.id, CAST(COALESCE(ww{K}.lbl, v.id) AS BIGINT) AS label
          FROM vw v LEFT JOIN ww{K} ON ww{K}.id = v.id)"""


def q_lpa_weighted2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted LPA (2 rounds) on the weighted supplier co-part graph
    (w = shared-part count): labels follow the heaviest neighborhood
    vote instead of the plain majority."""
    li = load_table(spark, "lineitem", sf_dir)
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    wund = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    labels, _ = pregel.label_propagation_weighted(wund, max_iter=2)
    return labels.select(
        F.col("id").cast("long"), F.col("label").cast("long")
    ).orderBy("id")


def _lpa_w_sql(n_iter: int = 2) -> str:
    rounds = "".join("," + _LPA_W_ROUND.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
wund AS (SELECT a.s AS u, b.s AS v, COUNT(*) AS w
         FROM pairs a JOIN pairs b ON a.p = b.p AND a.s < b.s
         GROUP BY a.s, b.s),
ew AS (SELECT u AS src, v AS dst, w FROM wund UNION ALL SELECT v, u, w FROM wund),
vw AS (SELECT DISTINCT src AS id FROM ew),
lw0 AS (SELECT id, id AS label FROM vw)
{rounds}
SELECT id, label FROM lw{n_iter} ORDER BY id
"""


ORACLES.update({"lpa_weighted2": _lpa_w_sql(2)})
QUERIES.update({"lpa_weighted2": q_lpa_weighted2})


def q_coloring_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jones-Plassmann greedy coloring of the bounded-degree top-3-
    neighbor backbone of the co-order graph (each vertex keeps its 3
    smallest neighbors; the JP schedule needs bounded degree — on the
    dense graph it serializes).  Unique result given the deterministic
    priority family; the oracle replays the rounds unrolled."""
    und = coorder_edges(spark, sf_dir)
    symall = _sym(und)
    w = Window.partitionBy("src").orderBy("dst")
    t3 = symall.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    g = t3.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    colors, _ = pregel.greedy_coloring(g, seed=11, max_rounds=40)
    return colors.select(
        F.col("id").cast("long"), F.col("color").cast("long")
    ).orderBy("id")


def _coloring_sql(rounds: int, seed: int) -> str:
    parts = [
        _COORDER_SQL.strip(),
        "symall AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "t3 AS (SELECT src, dst FROM (SELECT src, dst,"
        " ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn FROM symall) t"
        " WHERE rn <= 3)",
        "g AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM t3)",
        "e AS MATERIALIZED (SELECT u AS src, v AS dst FROM g UNION ALL SELECT v, u FROM g)",
        "vv AS (SELECT DISTINCT src AS id FROM e)",
        f"h0 AS (SELECT id, (id * 2654435761 + {seed}) % 2147483648 AS x0 FROM vv)",
        "h1 AS (SELECT id, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM h0)",
        "pri AS MATERIALIZED (SELECT id, (xor(x1, x1 >> 17) % 1073741824)"
        " * 8589934592 + id AS p FROM h1)",
        "u0 AS (SELECT id FROM vv)",
        "c0 AS (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS color WHERE FALSE)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"n{k} AS (SELECT e.src AS id, MAX(p2.p) AS maxp FROM e "
            f"JOIN u{k - 1} un ON un.id = e.dst JOIN pri p2 ON p2.id = e.dst "
            f"GROUP BY e.src)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT u.id FROM u{k - 1} u "
            f"JOIN pri ON pri.id = u.id LEFT JOIN n{k} ON n{k}.id = u.id "
            f"WHERE n{k}.maxp IS NULL OR pri.p > n{k}.maxp)"
        )
        parts.append(
            f"mx{k} AS (SELECT id, COALESCE(MIN(CASE WHEN col <> rn - 1 THEN rn - 1 END),"
            f" COUNT(*)) AS mex FROM ("
            f"SELECT nc.id, nc.col, ROW_NUMBER() OVER (PARTITION BY nc.id ORDER BY nc.col) AS rn "
            f"FROM (SELECT DISTINCT e.src AS id, c.color AS col FROM e "
            f"JOIN c{k - 1} c ON c.id = e.dst "
            f"WHERE e.src IN (SELECT id FROM r{k})) nc) t GROUP BY id)"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT id, color FROM c{k - 1} UNION ALL "
            f"SELECT r.id, CAST(COALESCE(m.mex, 0) AS BIGINT) FROM r{k} r "
            f"LEFT JOIN mx{k} m ON m.id = r.id)"
        )
        parts.append(
            f"u{k} AS MATERIALIZED (SELECT id FROM u{k - 1} "
            f"WHERE id NOT IN (SELECT id FROM r{k}))"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, CAST(color AS BIGINT) AS color
        FROM c{rounds} ORDER BY id"""
    )


ORACLES.update({"coloring_top3": _coloring_sql(40, 11)})
QUERIES.update({"coloring_top3": q_coloring_top3})


def q_degree_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal graph snapshot diff: per-supplier demand in-degree
    (distinct customers) in the early window (< 1998) vs the late
    window, and the delta — two snapshots in ONE pass via conditional
    aggregates (no second scan, no join, one shuffle)."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        j.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.count_distinct(
                F.when(F.col("o_orderdate") < cut, F.col("o_custkey"))
            ).alias("deg_early"),
            F.count_distinct(
                F.when(F.col("o_orderdate") >= cut, F.col("o_custkey"))
            ).alias("deg_late"),
        )
        .select(
            "s_suppkey",
            F.col("deg_early").cast("long"),
            F.col("deg_late").cast("long"),
            (F.col("deg_late") - F.col("deg_early")).cast("long").alias("delta"),
        )
        .orderBy("s_suppkey")
    )


ORACLES.update(
    {
        "degree_delta": """
        SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
               CAST(COUNT(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                                        THEN o_custkey END) AS BIGINT) AS deg_early,
               CAST(COUNT(DISTINCT CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                                        THEN o_custkey END) AS BIGINT) AS deg_late,
               CAST(COUNT(DISTINCT CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                                        THEN o_custkey END)
                    - COUNT(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                                          THEN o_custkey END) AS BIGINT) AS delta
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey
        ORDER BY s_suppkey
    """
    }
)
QUERIES.update({"degree_delta": q_degree_delta})


def q_curation_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation filter in one pass: keep documents
    that clear the quality gate (composite >= 0.5), the length gate
    (8..10000 tokens), and exact dedup (smallest doc_id per identical
    text wins).  Quality/length are pure map expressions over the scan;
    the dedup keeper is a single md5 groupBy broadcast back — the
    curation pipeline's shippable shape."""
    from polar_spark.operators.text import quality_scores

    docs = load_table(spark, "documents", sf_dir)
    q = quality_scores(docs)
    keepers = docs.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    return (
        q.withColumn("h", F.md5(F.col("text")))
        .join(F.broadcast(keepers), "h")
        .where(
            (F.col("doc_id") == F.col("keep_id"))
            & (F.col("quality") >= 0.5)
            & F.col("n_tokens").between(8, 10000)
        )
        .select("doc_id", "n_tokens", F.round("quality", 6).alias("quality_r"))
        .orderBy("doc_id")
    )


ORACLES.update(
    {
        "curation_pass": r"""
        WITH t AS (
          SELECT doc_id, md5(text) AS h,
                 CAST(len(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS BIGINT) AS n_tokens,
                 CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                   / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1) AS digit_ratio,
                 CAST(len(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                      x -> x IN ('the','and','of','to','in','is','that','for','with','a'))) AS DOUBLE)
                   / GREATEST(len(regexp_split_to_array(TRIM(LOWER(text)), '\s+')), 1) AS stopword_ratio
          FROM documents),
        s AS (
          SELECT doc_id, h, n_tokens,
                 0.4 * LEAST(n_tokens / 64.0, 1.0)
                 + 0.3 * LEAST(stopword_ratio * 5, 1.0)
                 + 0.3 * (1.0 - LEAST(digit_ratio * 10, 1.0)) AS quality
          FROM t),
        k AS (SELECT h, MIN(doc_id) AS keep_id FROM s GROUP BY h)
        SELECT s.doc_id, s.n_tokens, ROUND(s.quality, 6) AS quality_r
        FROM s JOIN k ON s.h = k.h
        WHERE s.doc_id = k.keep_id AND s.quality >= 0.5
              AND s.n_tokens BETWEEN 8 AND 10000
        ORDER BY s.doc_id
    """
    }
)
QUERIES.update({"curation_pass": q_curation_pass})


def q_sssp_multi4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-landmark weighted shortest paths (the weighted analog of
    bfs_per_source; landmark-distance input for weighted harmonic /
    closeness): distances kept separately for the 4 smallest vertices
    of the weighted undirected demand graph."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    dw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    und = (
        dw.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), "w")
        .groupBy("a", "b")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    e = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    srcs = [r[0] for r in e.select("src").distinct().orderBy("src").limit(4).collect()]
    d, _ = pregel.sssp_per_source(e, srcs)
    return d.select("source", "id", "dist").orderBy("source", "id")


def _sssp_multi_parts(rounds: int, n_sources: int) -> list[str]:
    """Unrolled per-landmark Bellman-Ford CTE parts over the weighted
    undirected demand graph (shared by sssp_multi4 and steiner_tree4)."""
    parts = [
        "dw AS MATERIALIZED (SELECT o_custkey AS src, l_suppkey AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey GROUP BY 1, 2)",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "CAST(SUM(w) AS BIGINT) AS w FROM dw GROUP BY 1, 2)",
        "e AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM und "
        "UNION ALL SELECT b, a, w FROM und)",
        f"srcs AS (SELECT DISTINCT src AS s FROM e ORDER BY s LIMIT {n_sources})",
        "d0 AS (SELECT s AS source, s AS id, CAST(0 AS BIGINT) AS dist FROM srcs)",
    ]
    for i in range(rounds):
        parts.append(
            f"d{i + 1} AS MATERIALIZED (SELECT source, id, MIN(dist) AS dist FROM ("
            f"SELECT source, id, dist FROM d{i} "
            f"UNION ALL "
            f"SELECT d.source, e.dst AS id, d.dist + e.w FROM d{i} d JOIN e ON e.src = d.id"
            f") t GROUP BY source, id)"
        )
    return parts


def _sssp_multi_sql(rounds: int, n_sources: int) -> str:
    parts = _sssp_multi_parts(rounds, n_sources)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(source AS BIGINT) AS source, CAST(id AS BIGINT) AS id,
               CAST(dist AS BIGINT) AS dist
        FROM d{rounds} ORDER BY source, id"""
    )


ORACLES.update({"sssp_multi4": _sssp_multi_sql(8, 4)})
QUERIES.update({"sssp_multi4": q_sssp_multi4})


def q_katz4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (4 truncated iterations, α=0.05, β=1) on the
    directed customer→supplier demand graph — walk-counting centrality
    without out-degree normalization."""
    ranks = pregel.katz(demand_edges(spark, sf_dir), alpha=0.05, beta=1.0, n_iter=4)
    # normalized to a share (Σ = 1): raw Katz grows with graph size, so
    # a fixed decimal rounding would not stay safely coarser than float
    # summation noise across scale factors; the share is O(1/n) like the
    # rank queries, where 7 dp is the established safe margin
    total = ranks.agg(F.sum("katz").alias("_t"))
    return (
        ranks.crossJoin(F.broadcast(total))
        .select("id", F.round(F.col("katz") / F.col("_t"), 7).alias("katz_r"))
        .orderBy("id")
    )


_KATZ_ITER = """
x{K} AS MATERIALIZED (
  SELECT v.id, 1.0::DOUBLE + 0.05::DOUBLE * COALESCE(s.s, 0::DOUBLE) AS x
  FROM verts v
  LEFT JOIN (SELECT e.dst AS id, SUM(p.x) AS s
             FROM e JOIN x{KM1} p ON p.id = e.src GROUP BY e.dst) s
  ON s.id = v.id
)"""


def _katz_sql(n_iter: int = 4) -> str:
    iters = "".join("," + _KATZ_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH e AS MATERIALIZED (SELECT src, dst FROM (
       SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
     WHERE src != dst),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
x0 AS (SELECT id, 1.0::DOUBLE AS x FROM verts)
{iters}
SELECT CAST(id AS BIGINT) AS id,
       ROUND(x / (SELECT SUM(x) FROM x{n_iter}), 7) AS katz_r
FROM x{n_iter} ORDER BY id
"""


ORACLES.update({"katz4": _katz_sql(4)})
QUERIES.update({"katz4": q_katz4})


_BLOOM_CUT = 480000
_BLOOM_WORDS = 32
_BLOOM_K = 3
_BLOOM_SEED = 5


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime join pruning: build the filter over the
    custkeys of high-value orders (bounded word table, one bit_or agg),
    broadcast the masks as a literal array, and prune `customer` in a
    pure map stage — the survivors (true members AND the filter's false
    positives) with an exact-membership flag.  Cross-engine equality of
    the candidate set proves the filter arithmetic is replayed
    bit-for-bit by an independent engine."""
    from polar_spark.operators.sketches import bloom_build, bloom_masks, bloom_member

    orders = load_table(spark, "orders", sf_dir)
    members = (
        orders.where(F.col("o_totalprice") > _BLOOM_CUT)
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    words = bloom_build(members, "key", _BLOOM_WORDS, _BLOOM_K, _BLOOM_SEED)
    masks = bloom_masks(words, _BLOOM_WORDS)
    cust = load_table(spark, "customer", sf_dir)
    pruned = cust.where(
        bloom_member(F.col("c_custkey"), masks, _BLOOM_K, _BLOOM_SEED)
    ).select(F.col("c_custkey").cast("long"))
    return (
        pruned.join(
            F.broadcast(members.select(F.col("key").alias("c_custkey"), F.lit(True).alias("_m"))),
            "c_custkey",
            "left",
        )
        .select("c_custkey", F.coalesce(F.col("_m"), F.lit(False)).alias("actual"))
        .orderBy("c_custkey")
    )


def _bloom_sql() -> str:
    bits = _BLOOM_WORDS * 62
    hash_cte = (
        "SELECT key, i, "
        f"xor(x1, x1 >> 17) % {bits} AS idx FROM ("
        "SELECT key, i, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM ("
        f"SELECT key, i, (key * 2654435761 + i * 1000003 + {_BLOOM_SEED}) % 2147483648 AS x0 "
        "FROM {src} CROSS JOIN js))"
    )
    return f"""
WITH members AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > {_BLOOM_CUT}),
js AS (SELECT UNNEST(range({_BLOOM_K})) AS i),
baddr AS ({hash_cte.format(src='members')}),
words AS MATERIALIZED (
  SELECT idx // 62 AS word, bit_or(CAST(1 AS BIGINT) << CAST(idx % 62 AS INT)) AS mask
  FROM baddr GROUP BY 1),
probe AS (SELECT c_custkey AS key FROM customer),
paddr AS ({hash_cte.format(src='probe')}),
checks AS (
  SELECT p.key,
         SUM(CASE WHEN ((COALESCE(w.mask, 0) >> CAST(p.idx % 62 AS INT)) & 1) = 1
                  THEN 1 ELSE 0 END) AS ok
  FROM paddr p LEFT JOIN words w ON w.word = p.idx // 62
  GROUP BY p.key)
SELECT CAST(c.key AS BIGINT) AS c_custkey,
       (m.key IS NOT NULL) AS actual
FROM checks c LEFT JOIN members m ON m.key = c.key
WHERE c.ok = {_BLOOM_K}
ORDER BY c_custkey
"""


ORACLES.update({"bloom_prune": _bloom_sql()})
QUERIES.update({"bloom_prune": q_bloom_prune})


def q_dup_spans8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated 8-token spans (substring-dedup
    candidates): span-hash rows occurring in ≥2 distinct documents."""
    from polar_spark.operators.text import dup_spans

    docs = load_table(spark, "documents", sf_dir)
    out = dup_spans(docs, "text", "doc_id", k=8)
    return out.select(
        "h", F.col("n_docs").cast("long"), F.col("n_occ").cast("long")
    ).orderBy("h")


def _dup_spans_sql(k: int = 8) -> str:
    from polar_spark.operators.dedup import _P31, _polyhash_sql
    from polar_spark.operators.text import SPAN_B

    # two-level hash, mirroring text.dup_spans: per-token char fold
    # ONCE (w is the lambda variable here — _polyhash_sql's internal
    # lambda uses `i`, so the inlined expression must not reference an
    # outer `i`), then a k-wide polynomial over the token hashes per
    # window position
    return f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
th AS (SELECT doc_id, list_transform(t, w -> {_polyhash_sql("w")}) AS ths FROM toks),
w AS (SELECT doc_id,
        list_reduce(list_prepend(0::BIGINT, ths[p:p+{k - 1}]),
                    (acc, hv) -> (acc * {SPAN_B} + hv) % {_P31}) AS h
      FROM th, unnest(range(1, greatest(len(ths) - {k} + 2, 1))) AS u(p)),
g AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ FROM w GROUP BY h)
SELECT h, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_occ AS BIGINT) AS n_occ
FROM g WHERE n_docs >= 2 ORDER BY h
"""


ORACLES.update({"dup_spans8": _dup_spans_sql(8)})
QUERIES.update({"dup_spans8": q_dup_spans8})


def q_fm_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier FM-sketch distinct-part estimate next to the exact
    count — the bounded-memory (8 longs/group) substitute for exact
    COUNT(DISTINCT) at stream scale, deterministic registers replayed
    by the oracle."""
    from polar_spark.operators.sketches import fm_distinct

    li = load_table(spark, "lineitem", sf_dir)
    est = fm_distinct(li, "l_suppkey", "l_partkey", replicas=8, seed=1)
    exact = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact")
    )
    return (
        est.join(exact, "l_suppkey")
        .select(
            F.col("l_suppkey").cast("long"),
            F.round("est", 6).alias("est_r"),
            "exact",
        )
        .orderBy("l_suppkey")
    )


def _fm_distinct_sql(replicas: int = 8, seed: int = 1) -> str:
    return f"""
WITH js AS (SELECT UNNEST(range({replicas})) AS j),
m AS (SELECT l_suppkey, l_partkey AS key, j,
        (l_partkey * 2654435761 + j * 97 + {seed}) % 2147483648 AS x0
      FROM lineitem CROSS JOIN js),
m1 AS (SELECT l_suppkey, key, j, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM m),
m2 AS (SELECT l_suppkey, key, j, xor(x1, x1 >> 17) AS h FROM m1),
regs AS (SELECT l_suppkey, j,
           bit_or(CAST(1 AS BIGINT) << LEAST(bit_count((h & -h) - 1), 62)) AS reg
         FROM m2 GROUP BY l_suppkey, j),
est AS (SELECT l_suppkey,
          POW(2.0, AVG(CAST(bit_count((((~reg) & (reg + 1)) - 1)) AS DOUBLE))) / 0.77351 AS est
        FROM regs GROUP BY l_suppkey),
exact AS (SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact
          FROM lineitem GROUP BY l_suppkey)
SELECT CAST(e.l_suppkey AS BIGINT) AS l_suppkey, ROUND(e.est, 6) AS est_r, x.exact
FROM est e JOIN exact x ON x.l_suppkey = e.l_suppkey
ORDER BY l_suppkey
"""


ORACLES.update({"fm_distinct_parts": _fm_distinct_sql(8, 1)})
QUERIES.update({"fm_distinct_parts": q_fm_distinct_parts})


def q_node_similarity3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard node similarity, top-3 per vertex, on the
    sparse co-order graph (wedge enumeration — the triangle-count plan
    shape, no all-pairs join)."""
    e = coorder_edges(spark, sf_dir)
    sims = pregel.node_similarity(e, k=3)
    return sims.select(
        "id", "other", F.round("sim", 6).alias("sim_r"), "rnk"
    ).orderBy("id", "rnk")


def _node_similarity_sql(k: int = 3) -> str:
    return f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
inter AS (SELECT x.dst AS a, y.dst AS b, COUNT(*) AS inter
          FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst
          GROUP BY 1, 2),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY src),
pairs AS (SELECT i.a, i.b,
            i.inter / CAST(da.deg + db.deg - i.inter AS DOUBLE) AS sim
          FROM inter i JOIN deg da ON da.id = i.a JOIN deg db ON db.id = i.b),
dirs AS (SELECT a AS id, b AS other, sim FROM pairs
         UNION ALL SELECT b, a, sim FROM pairs),
ranked AS (SELECT id, other, sim,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY sim DESC, other ASC) AS rnk
           FROM dirs)
SELECT CAST(id AS BIGINT) AS id, CAST(other AS BIGINT) AS other,
       ROUND(sim, 6) AS sim_r, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {k} ORDER BY id, rnk
"""


ORACLES.update({"node_similarity3": _node_similarity_sql(3)})
QUERIES.update({"node_similarity3": q_node_similarity3})


def q_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM quality scores per document (CCNet-style
    perplexity filter with the corpus as its own LM)."""
    from polar_spark.operators.text import unigram_logprob

    docs = load_table(spark, "documents", sf_dir)
    out = unigram_logprob(docs, "text", "doc_id")
    return out.select(
        "doc_id", "n_tokens", F.round("logppl", 6).alias("logppl_r")
    ).orderBy("doc_id")


_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(trim(lower(text)), ' ')) AS w FROM documents),
dw AS (SELECT doc_id, w, COUNT(*) AS cnt FROM toks GROUP BY doc_id, w),
freq AS (SELECT w, SUM(cnt) AS c FROM dw GROUP BY w),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM dw)
SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       ROUND(SUM(cnt * -log2(c / (SELECT t FROM tot))) / SUM(cnt), 6) AS logppl_r
FROM dw JOIN freq USING (w) GROUP BY doc_id ORDER BY doc_id
"""


ORACLES.update({"unigram_ppl": _UNIGRAM_SQL})
QUERIES.update({"unigram_ppl": q_unigram_ppl})


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority p50/p90/p99 of order value from the log₂-histogram
    sketch (≤63 counters/group of state — the mergeable bounded-memory
    quantile path; `order_percentiles` is the exact counterpart)."""
    from polar_spark.operators.sketches import log_hist_quantiles

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", F.floor("o_totalprice").cast("long").alias("v")
    )
    out = log_hist_quantiles(orders, "v", "o_orderpriority", [0.5, 0.9, 0.99])
    return out.select("o_orderpriority", "q", "est").orderBy("o_orderpriority", "q")


_HIST_Q_SQL = """
WITH hist AS (
  SELECT o_orderpriority AS g,
         length(bin(greatest(CAST(FLOOR(o_totalprice) AS BIGINT), 1))) - 1 AS bucket,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2),
cum AS (
  SELECT g, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
         SUM(cnt) OVER (PARTITION BY g) AS tot
  FROM hist),
qs AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q),
picked AS (
  SELECT g, q, MIN(bucket) AS bucket
  FROM cum CROSS JOIN qs WHERE cum >= CEIL(q * tot) GROUP BY g, q)
SELECT g AS o_orderpriority, CAST(q AS DOUBLE) AS q,
       1.5 * POW(2.0, CAST(bucket AS DOUBLE)) AS est
FROM picked ORDER BY o_orderpriority, q
"""


ORACLES.update({"hist_quantiles": _HIST_Q_SQL})
QUERIES.update({"hist_quantiles": q_hist_quantiles})


def q_closeness_w4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted closeness centrality of the 4 landmark vertices from
    their truncated (8-round) per-source shortest-path distances:
    closeness = (reach−1)/Σdist over the reached set — the composition
    of `sssp_per_source` the harmonic/eccentricity queries model for
    BFS, on the weighted demand graph."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    dw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    und = (
        dw.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), "w")
        .groupBy("a", "b")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    e = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    srcs = [r[0] for r in e.select("src").distinct().orderBy("src").limit(4).collect()]
    d, _ = pregel.sssp_per_source(e, srcs)
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("reach"),
            F.round(
                (F.count("*") - F.lit(1)) / F.sum("dist").cast("double"), 7
            ).alias("closeness_r"),
        )
        .where(F.col("reach") > 1)
        .select(F.col("source").cast("long"), "reach", "closeness_r")
        .orderBy("source")
    )


def _closeness_sql(rounds: int, n_sources: int) -> str:
    inner = _sssp_multi_sql(rounds, n_sources)
    return f"""
SELECT CAST(source AS BIGINT) AS source, CAST(COUNT(*) AS BIGINT) AS reach,
       ROUND((COUNT(*) - 1) / CAST(SUM(dist) AS DOUBLE), 7) AS closeness_r
FROM ({inner}) t
GROUP BY source HAVING COUNT(*) > 1 ORDER BY source
"""


ORACLES.update({"closeness_w4": _closeness_sql(8, 4)})
QUERIES.update({"closeness_w4": q_closeness_w4})


_PPR_MULTI_SEEDS: dict[int, list[int]] = {0: [1, 2], 1: [3], 2: [4, 5, 6]}


def q_ppr_multi3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched personalized PageRank — 3 seed sets advance in ONE keyed
    sweep (one shuffle per round total, not per set)."""
    e = _sym(copart_edges(spark, sf_dir))
    ranks = pregel.personalized_pagerank_multi(
        e, _PPR_MULTI_SEEDS, n_iter=3, damping=DAMPING
    )
    return ranks.select("gid", "id", F.round("rank", 7).alias("rank_r")).orderBy(
        "gid", "id"
    )


_PPR_MULTI_ITER = """
p{K} AS MATERIALIZED (
  SELECT b.gid, b.id, 0.15 * b.seed + 0.85 * COALESCE(s.s, 0) AS r
  FROM seeded b
  LEFT JOIN (SELECT p.gid, w.dst AS id, SUM(w.wt * p.r) AS s
             FROM w JOIN p{KM1} p ON p.id = w.src GROUP BY p.gid, w.dst) s
  ON s.gid = b.gid AND s.id = b.id
)"""


def _ppr_multi_sql(n_iter: int = 3) -> str:
    seed_rows = ", ".join(
        f"({g}, {v}, {1.0 / len(vs)})"
        for g, vs in _PPR_MULTI_SEEDS.items()
        for v in vs
    )
    gids = ", ".join(f"({g})" for g in _PPR_MULTI_SEEDS)
    iters = "".join(
        "," + _PPR_MULTI_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1)
    )
    return f"""
WITH {_COPART_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
w AS (SELECT e.src, e.dst, 1.0 / deg.d AS wt FROM e JOIN deg ON deg.src = e.src),
seedrows(gid, id, s) AS (VALUES {seed_rows}),
gids(gid) AS (VALUES {gids}),
seeded AS MATERIALIZED (
  SELECT g.gid, v.id, COALESCE(sr.s, 0.0) AS seed
  FROM verts v CROSS JOIN gids g
  LEFT JOIN seedrows sr ON sr.gid = g.gid AND sr.id = v.id),
p0 AS (SELECT gid, id, seed AS r FROM seeded)
{iters}
SELECT CAST(gid AS BIGINT) AS gid, CAST(id AS BIGINT) AS id, ROUND(r, 7) AS rank_r
FROM p{n_iter} ORDER BY gid, id
"""


ORACLES.update({"ppr_multi3": _ppr_multi_sql(3)})
QUERIES.update({"ppr_multi3": q_ppr_multi3})


def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law exponent, continuous MLE
    (Clauset-Shalizi-Newman 2009, eq. 3.1 with x_min = min degree):
    α̂ = 1 + n / Σ ln(dᵢ/(x_min − ½)) on the co-order graph — the
    skew diagnostic that tells you whether hub salting will matter
    before you run the iterative job."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    dmin = deg.agg(F.min("d").alias("m"))
    return (
        deg.crossJoin(F.broadcast(dmin))
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.min("m").cast("long").alias("dmin"),
            F.round(
                F.lit(1.0)
                + F.count("*")
                / F.sum(F.log(F.col("d") / (F.col("m") - F.lit(0.5)))),
                6,
            ).alias("alpha_r"),
        )
    )


_POWERLAW_SQL = f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
dmin AS (SELECT MIN(d) AS m FROM deg)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(MIN(m) AS BIGINT) AS dmin,
       ROUND(1.0 + COUNT(*) / SUM(ln(d / (m - 0.5))), 6) AS alpha_r
FROM deg CROSS JOIN dmin
"""


ORACLES.update({"powerlaw_alpha": _POWERLAW_SQL})
QUERIES.update({"powerlaw_alpha": q_powerlaw_alpha})


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) codes for the distinct (part, supplier) pairs —
    the multi-column clustering key a 100-TB layout pass range-
    partitions by (cross-engine bit-exactness is what makes the layout
    reproducible across writers)."""
    from polar_spark.operators.layout import zorder_key

    li = load_table(spark, "lineitem", sf_dir)
    pairs = li.select(
        F.col("l_partkey").cast("long").alias("p"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    return (
        pairs.select("p", "s", zorder_key(F.col("p"), F.col("s")).alias("z"))
        .orderBy("z", "p", "s")
        .limit(2000)
    )


def _zorder_sql() -> str:
    from polar_spark.operators.layout import zorder_sql

    return f"""
WITH pairs AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS p,
                               CAST(l_suppkey AS BIGINT) AS s FROM lineitem)
SELECT p, s, {zorder_sql("p", "s")} AS z
FROM pairs ORDER BY z, p, s LIMIT 2000
"""


ORACLES.update({"zorder_keys": _zorder_sql()})
QUERIES.update({"zorder_keys": q_zorder_keys})


def q_textrank5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword salience — PageRank (5 fixed rounds) over the
    corpus word co-occurrence graph (window 2): the composition of the
    text layer (edge construction) and the link-graph engine."""
    from polar_spark.operators.text import textrank

    docs = load_table(spark, "documents", sf_dir)
    out = textrank(docs, "text", window=2, n_iter=5)
    return out.select("word", F.round("rank", 7).alias("rank_r")).orderBy("word")


def _textrank_sql(n_iter: int = 5, window: int = 2) -> str:
    from polar_spark.operators.dedup import _polyhash_sql

    iters = "".join("," + _PR_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH toks AS (SELECT string_split(trim(lower(text)), ' ') AS t FROM documents),
pr AS (SELECT t, p, d FROM toks,
       unnest(range(1, greatest(len(t), 1))) u(p),
       unnest(range(1, {window + 1})) v(d)
       WHERE p + d <= len(t)),
wp AS (SELECT t[p] AS wa, t[CAST(p + d AS INT)] AS wb FROM pr
       WHERE t[p] != t[CAST(p + d AS INT)]),
hashed AS (SELECT wa, wb, {_polyhash_sql("wa")} AS ha, {_polyhash_sql("wb")} AS hb FROM wp),
und AS (SELECT DISTINCT LEAST(ha, hb) AS src, GREATEST(ha, hb) AS dst,
               CASE WHEN ha <= hb THEN wa ELSE wb END AS src_word,
               CASE WHEN ha <= hb THEN wb ELSE wa END AS dst_word
        FROM hashed),
{_SYM_SQL},
words AS (SELECT DISTINCT id, word FROM (
  SELECT src AS id, src_word AS word FROM und
  UNION ALL SELECT dst, dst_word FROM und)),
verts AS (SELECT DISTINCT src AS id FROM e),
inv AS (SELECT 1.0 / COUNT(*) AS x FROM verts),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
w AS (SELECT e.src, e.dst, 1.0 / deg.d AS wt FROM e JOIN deg ON deg.src = e.src),
r0 AS (SELECT id, (SELECT x FROM inv) AS r FROM verts)
{iters}
SELECT wd.word, ROUND(r.r, 7) AS rank_r
FROM r{n_iter} r JOIN words wd ON wd.id = r.id ORDER BY wd.word
"""


ORACLES.update({"textrank5": _textrank_sql(5, 2)})
QUERIES.update({"textrank5": q_textrank5})


def q_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup curation DECISION rule: single-link clusters from the
    embedding-cosine graph, keep the highest-quality member per cluster
    (tie → smallest doc id) instead of an arbitrary representative —
    clusters ⨝ quality scores ⨝ window argmax.  The quality composite
    is deterministic per-row IEEE arithmetic, so the cross-engine
    argmax agrees bit-for-bit."""
    from polar_spark.operators.similarity import cosine_neardup
    from polar_spark.operators.text import quality_scores

    emb = load_table(spark, "embeddings", sf_dir)
    clusters = cosine_neardup(emb, threshold=0.35, exact=True)
    docs = load_table(spark, "documents", sf_dir)
    qual = quality_scores(docs).select(
        F.col("doc_id").alias("vec_id"), F.col("quality")
    )
    joined = clusters.join(qual, "vec_id")
    w = Window.partitionBy("rep_id").orderBy(F.desc("quality"), F.asc("vec_id"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("rep_id")).cast("long"),
        )
        .where(F.col("_rn") == 1)
        .select(
            F.col("rep_id").cast("long").alias("cluster"),
            F.col("vec_id").cast("long").alias("kept_doc"),
            F.round("quality", 6).alias("kept_quality_r"),
            "cluster_size",
        )
        .orderBy("cluster")
    )


_KEEP_BEST_SQL = """
WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
e AS (SELECT ia AS src, ib AS dst FROM p
      UNION SELECT ib, ia FROM p),
verts AS (SELECT vec_id AS id FROM emb),
reach(id, comp) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
    WHERE r.comp < e.dst
),
clusters AS (SELECT CAST(id AS BIGINT) AS vec_id, CAST(MIN(comp) AS BIGINT) AS rep_id
             FROM reach GROUP BY id),
t AS (SELECT doc_id,
             regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks,
             CAST(LENGTH(text) AS DOUBLE) AS n_chr,
             CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digit
      FROM documents),
q AS (SELECT doc_id,
             0.4 * LEAST(len(toks) / 64.0, 1.0)
             + 0.3 * LEAST((CAST(len(list_filter(toks, x -> x IN
                 ('the','and','of','to','in','is','that','for','with','a'))) AS DOUBLE)
                 / GREATEST(len(toks), 1)) * 5, 1.0)
             + 0.3 * (1.0 - LEAST((digit / GREATEST(n_chr, 1)) * 10, 1.0)) AS quality
      FROM t),
j AS (SELECT c.rep_id, c.vec_id, q.quality,
             ROW_NUMBER() OVER (PARTITION BY c.rep_id
                                ORDER BY q.quality DESC, c.vec_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY c.rep_id) AS cluster_size
      FROM clusters c JOIN q ON q.doc_id = c.vec_id)
SELECT rep_id AS cluster, vec_id AS kept_doc,
       ROUND(quality, 6) AS kept_quality_r,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM j WHERE rn = 1 ORDER BY cluster
"""


ORACLES.update({"neardup_keep_best": _KEEP_BEST_SQL})
QUERIES.update({"neardup_keep_best": q_neardup_keep_best})


def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance entries of the embedding dimensions —
    the reduction distributed PCA runs on (`similarity.pca_fit` uses
    the per-partition numpy Gram form of the same sums; this query is
    the declarative JVM formulation: one posexplode² + one groupBy)."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()
    ij = emb.select(
        F.posexplode("v").alias("i", "x"), F.col("v").alias("v2")
    ).select("i", "x", F.posexplode("v2").alias("j", "y")).where(
        F.col("i") <= F.col("j")
    )
    return (
        ij.groupBy("i", "j")
        .agg(
            (
                (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.lit(float(n)))
                / F.lit(float(n - 1))
            ).alias("cov")
        )
        .select(
            F.col("i").cast("long"),
            F.col("j").cast("long"),
            F.round("cov", 6).alias("cov_r"),
        )
        .orderBy("i", "j")
    )


_EMBED_COV_SQL = """
WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT COUNT(*)::DOUBLE AS n FROM emb),
ij AS (SELECT i - 1 AS i, j - 1 AS j, v[i] AS x, v[j] AS y
       FROM emb, unnest(range(1, len(v) + 1)) u(i), unnest(range(1, len(v) + 1)) w(j)
       WHERE i <= j)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       ROUND((SUM(x * y) - SUM(x) * SUM(y) / (SELECT n FROM n))
             / ((SELECT n FROM n) - 1), 6) AS cov_r
FROM ij GROUP BY i, j ORDER BY i, j
"""


ORACLES.update({"embed_covariance": _EMBED_COV_SQL})
QUERIES.update({"embed_covariance": q_embed_covariance})


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing report: per-source document/token counts, token
    share (integer ppm — exact cross-engine), and the uniform-target
    downsampling keep fraction (ppm) a mixing pass would apply so every
    source contributes equally — the DoReMi/Pile-style rebalancing
    input.  Two aggregations; the totals ride a 1-row broadcast."""
    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        "source", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("_nt")
    ).groupBy("source").agg(
        F.count("*").cast("long").alias("docs"),
        F.sum("_nt").cast("long").alias("tokens"),
    )
    tot = per.agg(
        F.sum("tokens").cast("long").alias("_tt"),
        F.count("*").cast("long").alias("_ns"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "docs",
            "tokens",
            F.expr("CAST(tokens * 1000000 DIV _tt AS BIGINT)").alias("share_ppm"),
            F.expr(
                "CAST(LEAST(CAST(1000000 AS BIGINT), (_tt * 1000000) DIV (_ns * tokens)) AS BIGINT)"
            ).alias("keep_ppm"),
        )
        .orderBy("source")
    )


_SOURCE_MIX_SQL = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
         CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt, CAST(COUNT(*) AS BIGINT) AS ns FROM per)
SELECT source, docs, tokens,
       CAST(tokens * 1000000 // tt AS BIGINT) AS share_ppm,
       CAST(LEAST(1000000, (tt * 1000000) // (ns * tokens)) AS BIGINT) AS keep_ppm
FROM per CROSS JOIN tot ORDER BY source
"""


ORACLES.update({"source_mix": _SOURCE_MIX_SQL})
QUERIES.update({"source_mix": q_source_mix})


def q_betweenness_w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted landmark betweenness (K-bounded weighted Brandes, 3
    landmarks, 6 relax + 6 accumulation rounds) on the capped demand
    graph (customer/supplier keys < 250; weight = order-line count
    between the pair, parallel directions summed).  Distances, σ path
    counts over the du+w==dv shortest-path DAG, and backward δ rounds
    are all synchronous fixed-round recursions the SQL oracle unrolls
    identically."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    dir_w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            (F.col("o_custkey") != F.col("l_suppkey"))
            & (F.col("o_custkey") < 250)
            & (F.col("l_suppkey") < 250)
        )
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    und = dir_w.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.sum("w").alias("w"))
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    lm = [int(r[0]) for r in sym.select("src").distinct().orderBy("src").limit(3).collect()]
    bc, _stats = pregel.betweenness_weighted(sym, lm, relax_rounds=6, acc_rounds=6)
    return bc.select(
        F.col("id").cast("long"), F.round("bc", 6).alias("bc_r")
    ).orderBy("id")


def _betweenness_w_sql(relax: int, acc: int) -> str:
    parts = [
        "dir_w AS MATERIALIZED (SELECT o_custkey AS src, l_suppkey AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey AND o_custkey < 250 AND l_suppkey < 250 "
        "GROUP BY 1, 2)",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "CAST(SUM(w) AS BIGINT) AS w FROM dir_w GROUP BY 1, 2)",
        "e AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM und "
        "UNION ALL SELECT b, a, w FROM und)",
        "verts AS (SELECT DISTINCT src AS id FROM e)",
        "lm AS (SELECT id FROM verts ORDER BY id LIMIT 3)",
        "d0 AS MATERIALIZED (SELECT id AS source, id, CAST(0 AS BIGINT) AS dist FROM lm)",
    ]
    for r in range(1, relax + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT source, id, MIN(dist) AS dist FROM ("
            f"SELECT source, id, dist FROM d{r - 1} "
            f"UNION ALL SELECT p.source, e.dst AS id, p.dist + e.w AS dist "
            f"FROM d{r - 1} p JOIN e ON e.src = p.id) GROUP BY source, id)"
        )
    parts.append(
        f"dag AS MATERIALIZED (SELECT du.source, e.src, e.dst FROM e "
        f"JOIN d{relax} du ON du.id = e.src "
        f"JOIN d{relax} dv ON dv.source = du.source AND dv.id = e.dst "
        f"WHERE du.dist + e.w = dv.dist)"
    )
    parts.append("s0 AS (SELECT id AS source, id, CAST(1 AS BIGINT) AS sigma FROM lm)")
    for r in range(1, acc + 1):
        parts.append(
            f"s{r} AS MATERIALIZED ("
            f"SELECT id AS source, id, CAST(1 AS BIGINT) AS sigma FROM lm "
            f"UNION ALL SELECT g.source, g.dst AS id, CAST(SUM(p.sigma) AS BIGINT) AS sigma "
            f"FROM s{r - 1} p JOIN dag g ON g.source = p.source AND g.src = p.id "
            f"GROUP BY g.source, g.dst)"
        )
    parts.append(f"reached AS (SELECT source, id FROM d{relax})")
    parts.append("x0 AS (SELECT source, id, CAST(0.0 AS DOUBLE) AS delta FROM reached)")
    for r in range(1, acc + 1):
        parts.append(
            f"x{r} AS MATERIALIZED (SELECT rr.source, rr.id, "
            f"COALESCE(c.d, 0.0) AS delta FROM reached rr LEFT JOIN ("
            f"SELECT g.source, g.src AS id, "
            f"SUM(CAST(sv.sigma AS DOUBLE) / CAST(sw.sigma AS DOUBLE) "
            f"* (1.0 + xw.delta)) AS d "
            f"FROM dag g "
            f"JOIN s{acc} sv ON sv.source = g.source AND sv.id = g.src "
            f"JOIN s{acc} sw ON sw.source = g.source AND sw.id = g.dst "
            f"JOIN x{r - 1} xw ON xw.source = g.source AND xw.id = g.dst "
            f"WHERE sw.sigma > 0 "
            f"GROUP BY g.source, g.src) c "
            f"ON c.source = rr.source AND c.id = rr.id)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(v.id AS BIGINT) AS id,
       ROUND(COALESCE(SUM(x.delta), 0.0), 6) AS bc_r
FROM verts v LEFT JOIN (SELECT source, id, delta FROM x{acc} WHERE id != source) x
  ON x.id = v.id
GROUP BY v.id ORDER BY v.id"""
    )


ORACLES.update({"betweenness_w3": _betweenness_w_sql(6, 6)})
QUERIES.update({"betweenness_w3": q_betweenness_w3})


def q_semdedup8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup (Abbas et al. 2023) over the embeddings table: k-means
    (k=8, 3 Lloyd rounds, deterministic init) bounds the pairwise work
    to within-cluster, then the keep-first-id screening rule drops any
    vector with an earlier same-cluster neighbor at cos ≥ 0.35.  The
    oracle replays the identical Lloyd rounds (shared CTE chain with
    kmeans8) and the identical drop rule."""
    from polar_spark.operators.similarity import semdedup

    emb = load_table(spark, "embeddings", sf_dir)
    out = semdedup(emb, k=8, n_iter=3, threshold=0.35)
    return out.select(
        F.col("id").cast("long"), F.col("cluster").cast("long"), "keep"
    ).orderBy("id")


def _semdedup_sql(k: int, n_iter: int, tau: float) -> str:
    parts, dist = _kmeans_parts(k, n_iter)
    parts.append(
        f"asg AS MATERIALIZED (SELECT id, v, cid FROM ("
        f"SELECT e.id, e.v, c.cid, "
        f"ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {dist}, c.cid) AS rn "
        f"FROM e CROSS JOIN c{n_iter} c) x WHERE rn = 1)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT m.id, CAST(m.cid AS BIGINT) AS cluster,
       NOT EXISTS (SELECT 1 FROM asg y WHERE y.cid = m.cid AND y.id < m.id
                   AND list_cosine_similarity(y.v, m.v) >= {tau}) AS keep
FROM asg m ORDER BY m.id"""
    )


ORACLES.update({"semdedup8": _semdedup_sql(8, 3, 0.35)})
QUERIES.update({"semdedup8": q_semdedup8})


def q_adamic_adar5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-order graph: non-adjacent
    distance-2 pairs (u, v < 400, the oracle-cost cap precedent) scored
    Σ_w 1/ln(deg(w)) over common neighbors (deg over the FULL graph —
    every common neighbor has deg ≥ 2, so ln never vanishes), top-5 per
    vertex ranked on the 6-dp-rounded score so cross-engine summation
    noise cannot reorder."""
    sym = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    deg = sym.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("dw"))
    su = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    sv = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    two_hop = (
        su.join(sv, "w")
        .where((F.col("u") < F.col("v")) & (F.col("u") < 400) & (F.col("v") < 400))
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(F.round(F.sum(F.lit(1.0) / F.log("dw")), 6).alias("aa_r"))
    )
    non_edges = two_hop.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    win = Window.partitionBy("u").orderBy(F.desc("aa_r"), F.asc("v"))
    return (
        non_edges.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("u", "v", "aa_r", "rnk")
        .orderBy("u", "rnk")
    )


_ADAMIC_ADAR_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS w, COUNT(*) AS dw FROM e GROUP BY src),
two_hop AS (
    SELECT a.src AS u, b.dst AS v, ROUND(SUM(1.0 / ln(d.dw)), 6) AS aa_r
    FROM e a JOIN e b ON a.dst = b.src JOIN deg d ON d.w = a.dst
    WHERE a.src < b.dst AND a.src < 400 AND b.dst < 400
    GROUP BY a.src, b.dst
),
non_edges AS (
    SELECT t.* FROM two_hop t
    LEFT JOIN e ON e.src = t.u AND e.dst = t.v
    WHERE e.src IS NULL
),
ranked AS (
    SELECT u, v, aa_r,
           CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY aa_r DESC, v ASC) AS BIGINT) AS rnk
    FROM non_edges
)
SELECT u, v, aa_r, rnk FROM ranked WHERE rnk <= 5 ORDER BY u, rnk
"""


ORACLES.update({"adamic_adar5": _ADAMIC_ADAR_SQL})
QUERIES.update({"adamic_adar5": q_adamic_adar5})


def q_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the co-order graph at degree
    thresholds k ∈ {4, 8, 16, 32, 64}: among the n_k vertices with
    deg > k, the fraction of the n_k(n_k−1)/2 possible edges present,
    as exact integer ppm (hub-interconnection diagnostic — whether the
    high-degree core is a clique or a star field).  Thresholds ride a
    5-row broadcast; one aggregation per side."""
    und = coorder_edges(spark, sf_dir)
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    ks = spark.createDataFrame([(4,), (8,), (16,), (32,), (64,)], "k long")
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(F.sum((F.col("deg") > F.col("k")).cast("long")).alias("n_k"))
    )
    ek = (
        und.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dd")), "dst")
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                ((F.col("ds") > F.col("k")) & (F.col("dd") > F.col("k"))).cast("long")
            ).alias("e_k")
        )
    )
    return (
        nk.join(ek, "k")
        .select(
            "k",
            "n_k",
            "e_k",
            F.expr(
                "CASE WHEN n_k > 1 THEN e_k * 2000000 DIV (n_k * (n_k - 1)) "
                "ELSE CAST(0 AS BIGINT) END"
            ).alias("phi_ppm"),
        )
        .orderBy("k")
    )


_RICHCLUB_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY src),
ks AS (SELECT CAST(UNNEST([4, 8, 16, 32, 64]) AS BIGINT) AS k),
nk AS (SELECT k, CAST(SUM(CASE WHEN deg > k THEN 1 ELSE 0 END) AS BIGINT) AS n_k
       FROM deg CROSS JOIN ks GROUP BY k),
ek AS (SELECT k, CAST(SUM(CASE WHEN ds.deg > k AND dd.deg > k THEN 1 ELSE 0 END) AS BIGINT) AS e_k
       FROM und JOIN deg ds ON ds.id = und.src JOIN deg dd ON dd.id = und.dst
       CROSS JOIN ks GROUP BY k)
SELECT nk.k, n_k, e_k,
       CAST(CASE WHEN n_k > 1 THEN e_k * 2000000 // (n_k * (n_k - 1)) ELSE 0 END AS BIGINT) AS phi_ppm
FROM nk JOIN ek ON ek.k = nk.k ORDER BY nk.k
"""


ORACLES.update({"richclub": _RICHCLUB_SQL})
QUERIES.update({"richclub": q_richclub})


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate profile: documents, distinct sha256
    content hashes (the reference's per-row content invariant), dup
    count and dup rate in exact integer ppm — the per-domain dedup
    report a curation pipeline emits before mixing."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("docs"),
            F.countDistinct(F.sha2(F.col("text"), 256)).cast("long").alias("uniq"),
        )
        .select(
            "source",
            "docs",
            "uniq",
            (F.col("docs") - F.col("uniq")).alias("dup_docs"),
            F.expr("(docs - uniq) * 1000000 DIV docs").alias("dup_ppm"),
        )
        .orderBy("source")
    )


_DEDUP_RATE_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS uniq,
       CAST(COUNT(*) - COUNT(DISTINCT sha256(text)) AS BIGINT) AS dup_docs,
       CAST((COUNT(*) - COUNT(DISTINCT sha256(text))) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
FROM documents GROUP BY source ORDER BY source
"""


ORACLES.update({"dedup_rate_by_source": _DEDUP_RATE_SQL})
QUERIES.update({"dedup_rate_by_source": q_dedup_rate_by_source})


def q_trigram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word trigrams (lowercased, whitespace tokens):
    the n-gram frequency table behind contamination screens and boiler-
    plate detection.  One explode + one count aggregation; ordering is
    total (count desc, gram asc) so the cut is deterministic."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("_t")).where(
        F.size("_t") >= 3
    )
    tri = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(_t) - 3), "
                "i -> concat_ws(' ', _t[i], _t[i + 1], _t[i + 2]))"
            )
        ).alias("gram")
    )
    return (
        tri.groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(20)
    )


_TRIGRAM_SQL = """
WITH toks AS (SELECT string_split(trim(lower(text)), ' ') AS t FROM documents),
tri AS (
    SELECT t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
    FROM toks, LATERAL (SELECT UNNEST(generate_series(1, len(t) - 2)) AS i)
    WHERE len(t) >= 3
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM tri GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT 20
"""


ORACLES.update({"trigram_top20": _TRIGRAM_SQL})
QUERIES.update({"trigram_top20": q_trigram_top20})


def q_eigencentrality4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality on the symmetric co-order graph: 4 power-
    iteration rounds from the all-ones start, L2-normalized per round
    (pregel.eigenvector_centrality) — the spectral hub score the Katz /
    HITS family converges toward.  Unrolled identically in the SQL
    oracle."""
    sym = _sym(coorder_edges(spark, sf_dir))
    out = pregel.eigenvector_centrality(sym, n_iter=4)
    return out.select("id", F.round("eig", 7).alias("eig_r")).orderBy("id")


def _eigen_sql(n_iter: int) -> str:
    parts = [
        _COORDER_SQL.strip(),
        _SYM_SQL,
        "v AS (SELECT DISTINCT src AS id FROM e)",
        "x0 AS (SELECT id, 1.0 AS x FROM v)",
    ]
    for i in range(1, n_iter + 1):
        parts += [
            f"r{i} AS (SELECT e.dst AS id, SUM(x{i - 1}.x) AS s "
            f"FROM e JOIN x{i - 1} ON x{i - 1}.id = e.src GROUP BY e.dst)",
            f"f{i} AS (SELECT v.id, COALESCE(r{i}.s, 0) AS s FROM v LEFT JOIN r{i} USING (id))",
            f"x{i} AS (SELECT id, s / (SELECT sqrt(sum(s * s)) FROM f{i}) AS x FROM f{i})",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, ROUND(x, 7) AS eig_r
        FROM x{n_iter} ORDER BY id"""
    )


ORACLES.update({"eigencentrality4": _eigen_sql(4)})
QUERIES.update({"eigencentrality4": q_eigencentrality4})


def q_hard_negatives3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each of the
    first 20 query vectors, the top-3 most cosine-similar vectors with
    a DIFFERENT label — similarity search under a predicate, the
    retrieval-negative generator.  Same bounded-Q broadcast shape as
    the brute-force kNN baseline."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        q.crossJoin(emb)
        .where(F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cos_r"),
            F.col("_rn").cast("long").alias("rnk"),
        )
    )


_HARD_NEG_SQL = """
WITH e AS (SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 20),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(q.qv, e.v) AS cos
    FROM q CROSS JOIN e WHERE e.label != q.qlabel
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_r, rnk
FROM ranked WHERE rnk <= 3
"""


ORACLES.update({"hard_negatives3": _HARD_NEG_SQL})
QUERIES.update({"hard_negatives3": q_hard_negatives3})


def q_score45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s-core (weighted k-core, strength ≥ 45) of the weighted demand
    graph — the weighted-densest-region extraction (pregel.score).
    Peel fixpoint is reached in 2 rounds at sf0.001 and sf0.01
    (asserted in pytest); the SQL oracle unrolls 6 rounds, exact by
    the peel family's past-fixpoint idempotence.  Strengths are
    integer sums — no float parity surface."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    dir_w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    und = dir_w.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.sum("w").alias("w"))
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    core, _stats = pregel.score(sym, s=45)
    return core.select("id", F.col("strength").cast("long")).orderBy("id")


def _score_sql(s: int, rounds: int) -> str:
    parts = [
        "dir_w AS (SELECT o_custkey AS src, l_suppkey AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey GROUP BY 1, 2)",
        "und AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "CAST(SUM(w) AS BIGINT) AS w FROM dir_w GROUP BY 1, 2)",
        "e0 AS (SELECT a AS src, b AS dst, w FROM und "
        "UNION ALL SELECT b, a, w FROM und)",
    ]
    for i in range(rounds):
        parts.append(
            f"k{i} AS (SELECT src AS id FROM e{i} GROUP BY src HAVING SUM(w) >= {s})"
        )
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.src, e.dst, e.w FROM e{i} e "
            f"JOIN k{i} a ON a.id = e.src JOIN k{i} b ON b.id = e.dst)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(src AS BIGINT) AS id, CAST(SUM(w) AS BIGINT) AS strength"
        f"\nFROM e{rounds} GROUP BY src ORDER BY id"
    )


ORACLES.update({"score45": _score_sql(45, 6)})
QUERIES.update({"score45": q_score45})


def q_clustering_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Barrat weighted clustering coefficient on the weighted co-order
    graph (parts < 400; weight = shared-order count):
    cc_w(v) = Σ_{(v,u),(v,w) closing a triangle} (w_vu + w_vw) /
              (2 · s_v · (k_v − 1)), 0 when deg < 2 — how much of a
    vertex's STRENGTH sits inside closed triangles.  Triangle closing
    reuses the degree-ordered 2-path shape; integer weight sums keep
    the only float a single final division (rounded 6 dp)."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).where(
        F.col("l_partkey") < 400
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    wund = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    sym = wund.select("src", "dst", "w").unionByName(
        wund.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    stats = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("s"), F.count("*").alias("k")
    )
    pair = (
        sym.select(F.col("src").alias("v"), F.col("dst").alias("u"), F.col("w").alias("wu"))
        .join(
            sym.select(F.col("src").alias("v"), F.col("dst").alias("x"), F.col("w").alias("wx")),
            "v",
        )
        .where(F.col("u") < F.col("x"))
        .join(
            wund.select(F.col("src").alias("u"), F.col("dst").alias("x")),
            ["u", "x"],
            "left_semi",
        )
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum(F.col("wu") + F.col("wx")).cast("long").alias("tw"))
    )
    return (
        stats.join(pair, "id", "left")
        .select(
            "id",
            F.when(
                F.col("k") < 2, F.lit(0.0)
            )
            .otherwise(
                F.coalesce(F.col("tw"), F.lit(0)).cast("double")
                / (F.lit(2.0) * F.col("s") * (F.col("k") - 1))
            )
            .alias("ccw"),
        )
        .select("id", F.round("ccw", 6).alias("ccw_r"))
        .orderBy("id")
    )


_CLUSTERING_W_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
wund AS (SELECT a.p AS src, b.p AS dst, CAST(COUNT(*) AS BIGINT) AS w
         FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
e AS (SELECT src, dst, w FROM wund
      UNION ALL SELECT dst, src, w FROM wund),
stats AS (SELECT src AS id, SUM(w) AS s, COUNT(*) AS k FROM e GROUP BY src),
tri AS (SELECT a.src AS id, CAST(SUM(a.w + b.w) AS BIGINT) AS tw
        FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
        WHERE EXISTS (SELECT 1 FROM wund t WHERE t.src = a.dst AND t.dst = b.dst)
        GROUP BY a.src)
SELECT CAST(st.id AS BIGINT) AS id,
       ROUND(CASE WHEN st.k < 2 THEN 0.0
                  ELSE CAST(COALESCE(tri.tw, 0) AS DOUBLE) / (2.0 * st.s * (st.k - 1))
             END, 6) AS ccw_r
FROM stats st LEFT JOIN tri ON tri.id = st.id ORDER BY st.id
"""


ORACLES.update({"clustering_w": _CLUSTERING_W_SQL})
QUERIES.update({"clustering_w": q_clustering_w})


# --------------------------------------------------------------------------
# session 6: SimRank, DAG layering, rectangles, reciprocity, PMI,
# int8 quantization, weighted sampling


def q_simrank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimRank (3 rounds, C=0.8) on the symmetrized co-order subgraph
    (parts < 100): structural link similarity — two parts are similar
    when their co-order neighbors are similar (pregel.simrank).  Fixed
    rounds unroll exactly in the SQL oracle; pair table is bounded by
    the subgraph scope (the operator's max_pairs guard enforces it)."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 100)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    out, _stats = pregel.simrank(_sym(und), c=0.8, n_iter=3)
    return (
        out.where(F.col("a") < F.col("b"))
        .select("a", "b", F.round("s", 6).alias("s_r"))
        .orderBy("a", "b")
    )


def _simrank_sql(c: float, n_iter: int) -> str:
    parts = [
        "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey < 100)",
        "und AS (SELECT DISTINCT a.p AS src, b.p AS dst "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
        "e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "indeg AS (SELECT dst AS id, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY dst)",
        "v AS (SELECT DISTINCT src AS id FROM e)",
        "s0 AS (SELECT id AS a, id AS b, 1.0 AS s FROM v)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT ea.dst AS a, eb.dst AS b, SUM(s{i - 1}.s) AS t "
            f"FROM s{i - 1} JOIN e ea ON ea.src = s{i - 1}.a "
            f"JOIN e eb ON eb.src = s{i - 1}.b GROUP BY 1, 2)"
        )
        parts.append(
            f"s{i} AS (SELECT t{i}.a, t{i}.b, {c} * t{i}.t / (da.d * db.d) AS s "
            f"FROM t{i} JOIN indeg da ON da.id = t{i}.a "
            f"JOIN indeg db ON db.id = t{i}.b WHERE t{i}.a <> t{i}.b "
            "UNION ALL SELECT id, id, 1.0 FROM v)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, ROUND(s, 6) AS s_r
        FROM s{n_iter} WHERE a < b ORDER BY a, b"""
    )


ORACLES.update({"simrank3": _simrank_sql(0.8, 3)})
QUERIES.update({"simrank3": q_simrank3})


def q_dag_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-path layering (pregel.dag_longest_path) of the per-
    customer order-succession DAG: each order points at the customer's
    next TWO orders by date (a multi-parent DAG with merges, the
    commit-graph shape) — the level of an order is provably its
    position index, so the iterative operator is checked against a
    closed-form window oracle."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = orders.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    )
    a, b = r.alias("a"), r.alias("b")
    edges = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.rn") - F.col("a.rn")).isin(1, 2),
    ).select(F.col("a.o_orderkey").alias("src"), F.col("b.o_orderkey").alias("dst"))
    lvl, _stats = pregel.dag_longest_path(edges)
    return lvl.select("id", "lvl").orderBy("id")


_DAG_LEVELS_SQL = """
WITH r AS (SELECT o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_custkey) AS c
           FROM orders)
SELECT CAST(o_orderkey AS BIGINT) AS id, CAST(rn - 1 AS BIGINT) AS lvl
FROM r WHERE c >= 2 ORDER BY id
"""


ORACLES.update({"dag_levels": _DAG_LEVELS_SQL})
QUERIES.update({"dag_levels": q_dag_levels})


def q_squares_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex rectangle (4-cycle) counts on the bounded co-order
    graph (parts < 400) — the link-spam/nepotism motif one level up
    from triangles (pregel.square_counts): squares(v) = Σ_w C(cn(v,w),
    2) over opposite corners w.  All-integer arithmetic."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    return pregel.square_counts(_sym(und)).orderBy("id")


_SQUARES_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
wg AS (SELECT a.src AS v, b.dst AS w, COUNT(*) AS cn
       FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst
       GROUP BY 1, 2),
sq AS (SELECT v AS id, CAST(SUM(cn * (cn - 1) / 2) AS BIGINT) AS squares
       FROM wg GROUP BY v),
vt AS (SELECT DISTINCT src AS id FROM e)
SELECT CAST(vt.id AS BIGINT) AS id,
       CAST(COALESCE(sq.squares, 0) AS BIGINT) AS squares
FROM vt LEFT JOIN sq USING (id) ORDER BY id
"""


ORACLES.update({"squares_coorder": _SQUARES_SQL})
QUERIES.update({"squares_coorder": q_squares_coorder})


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity of the directed supplier-succession graph
    (within each order, supplier of line n → supplier of line n+1;
    lines pre-aggregated per (order, linenumber) — see Parity rules):
    the fraction of directed edges whose reverse also exists, the
    classic directed-link-graph mutuality diagnostic."""
    li = load_table(spark, "lineitem", sf_dir)
    lines = li.groupBy(
        F.col("l_orderkey").alias("o"), F.col("l_linenumber").alias("n")
    ).agg(F.min("l_suppkey").alias("s"))
    a, b = lines.alias("a"), lines.alias("b")
    succ = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("b.n") == F.col("a.n") + 1)
            & (F.col("a.s") != F.col("b.s")),
        )
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    rev = succ.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("_r")
    )
    return succ.join(rev, ["src", "dst"], "left").agg(
        F.count("*").cast("long").alias("n_edges"),
        F.count("_r").cast("long").alias("n_recip"),
        F.round(F.count("_r") / F.count("*"), 6).alias("ratio_r"),
    )


_RECIPROCITY_SQL = """
WITH lines AS (SELECT l_orderkey AS o, l_linenumber AS n, MIN(l_suppkey) AS s
               FROM lineitem GROUP BY 1, 2),
succ AS (SELECT DISTINCT a.s AS src, b.s AS dst
         FROM lines a JOIN lines b ON a.o = b.o AND b.n = a.n + 1 AND a.s <> b.s)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(r.src) AS BIGINT) AS n_recip,
       ROUND(CAST(COUNT(r.src) AS DOUBLE) / COUNT(*), 6) AS ratio_r
FROM succ s LEFT JOIN succ r ON r.src = s.dst AND r.dst = s.src
"""


ORACLES.update({"reciprocity": _RECIPROCITY_SQL})
QUERIES.update({"reciprocity": q_reciprocity})


def q_pmi_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations (adjacent word bigrams, count ≥ 5):
    pmi = ln((c_xy/N_bigrams) / ((c_x/N_tokens)·(c_y/N_tokens))) — the
    phrase-mining / tokenizer-merge-candidate signal.  Two linear
    explodes + counts; the corpus totals ride a 1-row broadcast."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    uni = toks.select(F.explode("t").alias("w"))
    cu = uni.groupBy("w").agg(F.count("*").alias("c"))
    big = toks.where(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cb = big.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    totals = uni.agg(F.count("*").cast("double").alias("nu")).crossJoin(
        big.agg(F.count("*").cast("double").alias("nb"))
    )
    return (
        cb.where(F.col("c") >= 5)
        .join(cu.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(cu.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("cnt"),
            F.round(
                F.log(
                    (F.col("c") / F.col("nb"))
                    / ((F.col("c1") / F.col("nu")) * (F.col("c2") / F.col("nu")))
                ),
                6,
            ).alias("pmi_r"),
        )
        .orderBy(F.desc("pmi_r"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


_PMI_SQL = """
WITH toks AS (SELECT string_split(trim(lower(text)), ' ') AS t FROM documents),
uni AS (SELECT t[i] AS w FROM toks, unnest(range(1, len(t) + 1)) u(i)),
cu AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
big AS (SELECT t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(range(1, len(t))) u(i) WHERE len(t) >= 2),
cb AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY 1, 2),
n AS (SELECT (SELECT COUNT(*) FROM uni)::DOUBLE AS nu,
             (SELECT COUNT(*) FROM big)::DOUBLE AS nb)
SELECT w1, w2, CAST(cb.c AS BIGINT) AS cnt,
       ROUND(LN((cb.c / n.nb) / ((a.c / n.nu) * (b.c / n.nu))), 6) AS pmi_r
FROM cb CROSS JOIN n
JOIN cu a ON a.w = cb.w1 JOIN cu b ON b.w = cb.w2
WHERE cb.c >= 5
ORDER BY pmi_r DESC, w1 ASC, w2 ASC LIMIT 20
"""


ORACLES.update({"pmi_top20": _PMI_SQL})
QUERIES.update({"pmi_top20": q_pmi_top20})


def q_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector reconstruction report of per-dimension affine int8
    quantization over the embeddings table (similarity.quantize_int8)
    — mse, max abs error, and the exact integer code sum (which pins
    every code value cross-engine without array-type hashing)."""
    from polar_spark.operators.similarity import quantize_int8

    emb = load_table(spark, "embeddings", sf_dir)
    out = quantize_int8(emb, id_col="vec_id", vec_col="embedding")
    return out.select(
        F.col("id").alias("vec_id"),
        F.round("mse", 8).alias("mse_r"),
        F.round("max_abs_err", 6).alias("maxerr_r"),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("code_sum"),
    ).orderBy("vec_id")


_INT8_SQL = """
WITH x AS (SELECT vec_id AS id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
dims AS (SELECT pos, MIN(x) AS mn,
                CASE WHEN MAX(x) = MIN(x) THEN 1.0
                     ELSE (MAX(x) - MIN(x)) / 255.0 END AS scale
         FROM x GROUP BY pos),
q AS (SELECT id, x.x, mn, scale,
             LEAST(255, GREATEST(0,
                 CAST(FLOOR((x.x - mn) / scale + 0.5) AS BIGINT))) AS code
      FROM x JOIN dims USING (pos)),
e AS (SELECT id, code, x - (mn + code * scale) AS err FROM q)
SELECT CAST(id AS BIGINT) AS vec_id,
       ROUND(AVG(err * err), 8) AS mse_r,
       ROUND(MAX(ABS(err)), 6) AS maxerr_r,
       CAST(SUM(code) AS BIGINT) AS code_sum
FROM e GROUP BY id ORDER BY vec_id
"""


ORACLES.update({"int8_quant": _INT8_SQL})
QUERIES.update({"int8_quant": q_int8_quant})


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional document sampling: keep probability
    min(1, n_chars/2000) decided by the deterministic hash-bucket coin
    (sampling.weighted_bernoulli) — pure integer compare, reproducible
    on any cluster size, exactly replayable in SQL."""
    from polar_spark.operators.sampling import weighted_bernoulli

    docs = load_table(spark, "documents", sf_dir)
    out = weighted_bernoulli(docs, "n_chars", 2000, id_col="doc_id", seed=37)
    return out.select("doc_id", "source", "n_chars")


_WSAMPLE_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars, xor(x1, x1 >> 17) % 10000 AS bucket FROM (
    SELECT doc_id, source, n_chars,
           (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM (
      SELECT doc_id, source, n_chars,
             (doc_id * 2654435761 + 37) % 2147483648 AS x0 FROM documents) a) b) c
WHERE bucket * 2000 < n_chars * 10000
"""


ORACLES.update({"weighted_sample": _WSAMPLE_SQL})
QUERIES.update({"weighted_sample": q_weighted_sample})


def q_bowtie_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie decomposition (Broder et al. 2000) of the directed
    part-succession graph, anchored at the minimum vertex id: CORE =
    the pivot's SCC (forward ∩ backward reachability, two frontier
    BFS runs — pregel.bfs_distances), IN = reaches the core, OUT =
    reachable from it, OTHER = tendrils/disconnected.  The web-graph
    macro-structure query, replayed by two recursive CTEs.  Edges are
    first-line → second-line part pairs only (one per order) — the
    full succession graph is strongly connected at every sf (all-core,
    a vacuous decomposition); this sparser cut yields all four
    classes."""
    li = load_table(spark, "lineitem", sf_dir)
    lines = li.groupBy(
        F.col("l_orderkey").alias("o"), F.col("l_linenumber").alias("n")
    ).agg(F.min("l_partkey").alias("p"))
    a, b = lines.alias("a"), lines.alias("b")
    succ = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("b.n") == F.col("a.n") + 1)
            & (F.col("a.n") == 1)
            & (F.col("a.p") != F.col("b.p")),
        )
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    verts = pregel.vertices_of(succ)
    pivot = int(verts.agg(F.min("id")).collect()[0][0])
    fwd, _ = pregel.bfs_distances(succ, [pivot], max_depth=200)
    rev = succ.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bwd, _ = pregel.bfs_distances(rev, [pivot], max_depth=200)
    f = fwd.select("id", F.lit(1).alias("_f"))
    bk = bwd.select("id", F.lit(1).alias("_b"))
    return (
        verts.join(f, "id", "left")
        .join(bk, "id", "left")
        .select(
            "id",
            F.when(F.col("_f").isNotNull() & F.col("_b").isNotNull(), F.lit("core"))
            .when(F.col("_f").isNotNull(), F.lit("out"))
            .when(F.col("_b").isNotNull(), F.lit("in"))
            .otherwise(F.lit("other"))
            .alias("cls"),
        )
        .orderBy("id")
    )


_BOWTIE_SQL = """
WITH RECURSIVE
lines AS (SELECT l_orderkey AS o, l_linenumber AS n, MIN(l_partkey) AS p
          FROM lineitem GROUP BY 1, 2),
succ AS (SELECT DISTINCT a.p AS src, b.p AS dst
         FROM lines a JOIN lines b
           ON a.o = b.o AND b.n = a.n + 1 AND a.n = 1 AND a.p <> b.p),
v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM succ
                               UNION ALL SELECT dst FROM succ) t),
fwd(id) AS (SELECT (SELECT MIN(id) FROM v)
            UNION
            SELECT succ.dst FROM succ JOIN fwd ON succ.src = fwd.id),
bwd(id) AS (SELECT (SELECT MIN(id) FROM v)
            UNION
            SELECT succ.src FROM succ JOIN bwd ON succ.dst = bwd.id)
SELECT CAST(v.id AS BIGINT) AS id,
       CASE WHEN f.id IS NOT NULL AND b.id IS NOT NULL THEN 'core'
            WHEN f.id IS NOT NULL THEN 'out'
            WHEN b.id IS NOT NULL THEN 'in'
            ELSE 'other' END AS cls
FROM v LEFT JOIN fwd f ON f.id = v.id LEFT JOIN bwd b ON b.id = v.id
ORDER BY v.id
"""


ORACLES.update({"bowtie_parts": _BOWTIE_SQL})
QUERIES.update({"bowtie_parts": q_bowtie_parts})


def q_spam_mass3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank spam mass (Gyöngyi et al. 2004) on the co-part graph:
    global PageRank (3 fixed rounds) vs PageRank personalized on the
    trusted seed set {1,2,3}; mass(v) = (pr − trust)/pr — the share of
    a vertex's rank NOT flowing from trusted sources, the canonical
    link-spam demotion signal.  Both rank vectors unroll in the SQL
    oracle with identical arithmetic."""
    e = pregel._hard_cut(_sym(copart_edges(spark, sf_dir)))  # materialize once: multiple consumers
    pr = pregel.pagerank_fixed(e, n_iter=3, damping=DAMPING)
    tr = pregel.personalized_pagerank_fixed(e, sources=[1, 2, 3], n_iter=3, damping=DAMPING)
    return (
        pr.join(tr.withColumnRenamed("rank", "trust"), "id")
        .select(
            "id",
            F.round((F.col("rank") - F.col("trust")) / F.col("rank"), 6).alias(
                "mass_r"
            ),
        )
        .orderBy("id")
    )


_SPAM_ITER = """
q{K} AS (
  SELECT v.id,
         0.15 * (CASE WHEN v.id IN (1, 2, 3) THEN 1.0 / 3.0 ELSE 0.0 END)
         + 0.85 * COALESCE(s.s, 0) AS r
  FROM verts v
  LEFT JOIN (
    SELECT w.dst AS id, SUM(w.wt * p.r) AS s
    FROM w JOIN q{KM1} p ON p.id = w.src
    GROUP BY w.dst
  ) s ON s.id = v.id
)"""


def _spam_mass_sql(n_iter: int = 3) -> str:
    pr_iters = "".join(
        "," + _PR_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1)
    )
    tr_iters = "".join(
        "," + _SPAM_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1)
    )
    return f"""
WITH {_COPART_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
inv AS (SELECT 1.0 / COUNT(*) AS x FROM verts),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
w AS (SELECT e.src, e.dst, 1.0 / deg.d AS wt FROM e JOIN deg ON deg.src = e.src),
r0 AS (SELECT id, (SELECT x FROM inv) AS r FROM verts)
{pr_iters},
q0 AS (SELECT id, CASE WHEN id IN (1, 2, 3) THEN 1.0 / 3.0 ELSE 0.0 END AS r FROM verts)
{tr_iters}
SELECT r{n_iter}.id,
       ROUND((r{n_iter}.r - q{n_iter}.r) / r{n_iter}.r, 6) AS mass_r
FROM r{n_iter} JOIN q{n_iter} ON q{n_iter}.id = r{n_iter}.id
ORDER BY r{n_iter}.id
"""


ORACLES.update({"spam_mass3": _spam_mass_sql(3)})
QUERIES.update({"spam_mass3": q_spam_mass3})


def q_louvain_move1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First synchronous Louvain sweep (pregel.louvain_move) on the
    weighted co-order graph (parts < 400, weight = shared-order
    count): each vertex joins the neighbor community with the largest
    positive modularity gain — deterministic (gain desc, neighbor asc)
    so the argmax replays exactly in SQL."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    wund = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count("*").cast("double").alias("w"))
    )
    sym = wund.unionByName(
        wund.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return pregel.louvain_move(sym).orderBy("id")


_LOUVAIN_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
wund AS (SELECT a.p AS src, b.p AS dst, CAST(COUNT(*) AS DOUBLE) AS w
         FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
e AS (SELECT src, dst, w FROM wund UNION ALL SELECT dst, src, w FROM wund),
m AS (SELECT SUM(w) / 2.0 AS m FROM e),
st AS (SELECT src AS id, SUM(w) AS k FROM e GROUP BY src),
cand AS (SELECT e.src AS id, e.dst AS u,
                e.w / m.m - kv.k * ku.k / (2.0 * m.m * m.m) AS g
         FROM e CROSS JOIN m
         JOIN st kv ON kv.id = e.src JOIN st ku ON ku.id = e.dst),
best AS (SELECT id, u FROM (
           SELECT id, u, ROW_NUMBER() OVER (PARTITION BY id
                                            ORDER BY g DESC, u ASC) AS rn
           FROM cand WHERE g > 0) t WHERE rn = 1),
v AS (SELECT DISTINCT src AS id FROM e)
SELECT CAST(v.id AS BIGINT) AS id,
       CAST(COALESCE(best.u, v.id) AS BIGINT) AS comm
FROM v LEFT JOIN best ON best.id = v.id ORDER BY v.id
"""


ORACLES.update({"louvain_move1": _LOUVAIN_SQL})
QUERIES.update({"louvain_move1": q_louvain_move1})


def q_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (size 64, stride 48) of every
    document — the RAG / pretraining context-window layout pass: one
    row per chunk with its token offsets.  Pure map + bounded explode;
    integer arithmetic only."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n"),
    )
    chunks = toks.withColumn(
        "n_chunks",
        F.lit(1)
        + F.floor(
            (F.greatest(F.col("n") - F.lit(64), F.lit(0)) + F.lit(47)) / F.lit(48)
        ),
    )
    return (
        chunks.select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long"),
            (F.col("chunk_idx") * 48).cast("long").alias("start_tok"),
            F.least(F.col("chunk_idx") * 48 + 64, F.col("n"))
            .cast("long")
            .alias("end_tok"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_CHUNK_SQL = """
WITH toks AS (SELECT doc_id,
                     len(string_split(trim(text), ' ')) AS n
              FROM documents),
c AS (SELECT doc_id, n,
             1 + CAST(FLOOR((GREATEST(n - 64, 0) + 47) / 48.0) AS BIGINT) AS n_chunks
      FROM toks)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * 48 AS BIGINT) AS start_tok,
       CAST(LEAST(i * 48 + 64, n) AS BIGINT) AS end_tok
FROM c, unnest(range(0, n_chunks)) u(i)
ORDER BY doc_id, chunk_idx
"""


ORACLES.update({"chunk_spans": _CHUNK_SQL})
QUERIES.update({"chunk_spans": q_chunk_spans})


def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the unigram token distribution from
    the corpus distribution — the domain-shift / mixture diagnostic a
    data-mixing pass reads before reweighting sources.  Two counts and
    one weighted log-sum; every source term exists in the corpus so no
    smoothing is needed."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    cs = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    ns = toks.groupBy("source").agg(F.count("*").cast("double").alias("n_s"))
    cw = toks.groupBy("w").agg(F.count("*").alias("cw"))
    n_row = toks.agg(F.count("*").cast("double").alias("n"))
    return (
        cs.join(ns, "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(n_row))
        .groupBy("source")
        .agg(
            F.round(
                F.sum(
                    (F.col("c") / F.col("n_s"))
                    * F.log((F.col("c") / F.col("n_s")) / (F.col("cw") / F.col("n")))
                ),
                6,
            ).alias("kl_r"),
            F.max(F.col("n_s")).cast("long").alias("n_tokens"),
        )
        .orderBy("source")
    )


_SOURCE_KL_SQL = """
WITH toks AS (SELECT source, t.w AS w
              FROM (SELECT source, string_split(trim(lower(text)), ' ') AS ws
                    FROM documents) d, unnest(d.ws) t(w)),
cs AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
ns AS (SELECT source, COUNT(*)::DOUBLE AS n_s FROM toks GROUP BY 1),
cw AS (SELECT w, COUNT(*) AS cw FROM toks GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n FROM toks)
SELECT cs.source,
       ROUND(SUM((cs.c / ns.n_s) * LN((cs.c / ns.n_s) / (cw.cw / n.n))), 6) AS kl_r,
       CAST(MAX(ns.n_s) AS BIGINT) AS n_tokens
FROM cs JOIN ns USING (source) JOIN cw USING (w) CROSS JOIN n
GROUP BY cs.source ORDER BY cs.source
"""


ORACLES.update({"source_kl": _SOURCE_KL_SQL})
QUERIES.update({"source_kl": q_source_kl})


def q_dag_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct source→vertex path counts (pregel.dag_path_counts) on
    the multi-parent order-succession DAG (edges to the next TWO
    orders): p follows the Fibonacci recurrence along each customer's
    chain, so the counts grow combinatorially — a real integer-exact
    DP check.  The SQL oracle unrolls 30 rounds; rounds past the
    fixpoint are no-ops by the operator's contract."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = orders.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
    a, b = r.alias("a"), r.alias("b")
    edges = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.rn") - F.col("a.rn")).isin(1, 2),
    ).select(F.col("a.o_orderkey").alias("src"), F.col("b.o_orderkey").alias("dst"))
    p, _stats = pregel.dag_path_counts(edges)
    return p.select("id", "paths").orderBy("id")


def _dag_paths_sql(rounds: int) -> str:
    parts = [
        "r AS (SELECT o_orderkey, o_custkey, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)",
        "e AS (SELECT a.o_orderkey AS src, b.o_orderkey AS dst "
        "FROM r a JOIN r b ON a.o_custkey = b.o_custkey "
        "AND b.rn - a.rn IN (1, 2))",
        "v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e "
        "UNION ALL SELECT dst FROM e) t)",
        "base AS (SELECT v.id, CASE WHEN d.dst IS NULL THEN 1 ELSE 0 END AS b "
        "FROM v LEFT JOIN (SELECT DISTINCT dst FROM e) d ON d.dst = v.id)",
        "p0 AS (SELECT id, CAST(b AS BIGINT) AS paths FROM base)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT base.id, "
            f"CAST(base.b + COALESCE(s.s, 0) AS BIGINT) AS paths "
            f"FROM base LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(p{i - 1}.paths) AS s "
            f"FROM e JOIN p{i - 1} ON p{i - 1}.id = e.src GROUP BY e.dst"
            f") s ON s.id = base.id)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, paths FROM p{rounds} ORDER BY id"""
    )


ORACLES.update({"dag_paths": _dag_paths_sql(30)})
QUERIES.update({"dag_paths": q_dag_paths})


def q_twohop_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-hop neighborhood size per vertex (distinct vertices at
    distance ≤ 2, self excluded) on the bounded co-order graph — the
    exact ground truth the ANF/HLL sketch approximates; one wedge
    self-join + one distinct-count aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    e = _sym(und)
    two = e.select(F.col("src").alias("v"), F.col("dst").alias("x")).join(
        e.select(F.col("src").alias("x"), F.col("dst").alias("w")), "x"
    ).where(F.col("v") != F.col("w")).select("v", "w")
    reach = two.unionByName(
        e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    ).distinct()
    return (
        reach.groupBy(F.col("v").alias("id"))
        .agg(F.count("*").cast("long").alias("n2"))
        .orderBy("id")
    )


_TWOHOP_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
reach AS (
    SELECT DISTINCT v, w FROM (
        SELECT a.src AS v, b.dst AS w
        FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst
        UNION ALL
        SELECT src AS v, dst AS w FROM e) t)
SELECT CAST(v AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n2
FROM reach GROUP BY v ORDER BY id
"""


ORACLES.update({"twohop_sizes": _TWOHOP_SQL})
QUERIES.update({"twohop_sizes": q_twohop_sizes})


def q_bpe_merge_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge-candidate table: adjacent CHARACTER pairs inside
    distinct words, weighted by corpus word frequency — the argmax is
    the first merge a byte-pair-encoding tokenizer would learn.  The
    word-frequency table collapses the corpus before the char explode
    (vocab · word-length rows, not corpus · word-length)."""
    docs = load_table(spark, "documents", sf_dir)
    wf = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .where(F.length("w") >= 2)
    )
    pairs = wf.select(
        "f",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> struct(substring(w, i, 1) AS c1, substring(w, i + 1, 1) AS c2))"
            )
        ).alias("p"),
    ).select("f", "p.c1", "p.c2")
    return (
        pairs.groupBy("c1", "c2")
        .agg(F.sum("f").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("c1"), F.asc("c2"))
        .limit(10)
    )


_BPE_SQL = """
WITH wf AS (SELECT t.w AS w, COUNT(*) AS f
            FROM (SELECT string_split(trim(lower(text)), ' ') AS ws
                  FROM documents) d, unnest(d.ws) t(w)
            GROUP BY t.w HAVING LENGTH(t.w) >= 2),
pairs AS (SELECT f, SUBSTRING(w, i, 1) AS c1, SUBSTRING(w, i + 1, 1) AS c2
          FROM wf, unnest(range(1, LENGTH(w))) u(i))
SELECT c1, c2, CAST(SUM(f) AS BIGINT) AS cnt
FROM pairs GROUP BY c1, c2
ORDER BY cnt DESC, c1 ASC, c2 ASC LIMIT 10
"""


ORACLES.update({"bpe_merge_top10": _BPE_SQL})
QUERIES.update({"bpe_merge_top10": q_bpe_merge_top10})


def q_nation_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical attribute assortativity (Newman 2003) of the demand
    graph by nation: the weighted mixing matrix e_ij (customer-nation →
    supplier-nation edge-weight shares), same-nation share tr(e), and
    the assortativity coefficient r = (tr(e) − Σaᵢbᵢ)/(1 − Σaᵢbᵢ) —
    does demand stay in-country?  One fact join + two 25-row aggregates
    riding a 1-row broadcast."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("c_nationkey").alias("i"), F.col("s_nationkey").alias("j"))
        .agg(F.count("*").cast("double").alias("w"))
    )
    tot = w.agg(F.sum("w").alias("t"))
    e = w.crossJoin(F.broadcast(tot)).select("i", "j", (F.col("w") / F.col("t")).alias("e"))
    tr = e.where(F.col("i") == F.col("j")).agg(F.sum("e").alias("tr"))
    ab = (
        e.groupBy("i").agg(F.sum("e").alias("a"))
        .join(e.groupBy("j").agg(F.sum("e").alias("b")), F.col("i") == F.col("j"))
        .agg(F.sum(F.col("a") * F.col("b")).alias("ab"))
    )
    return (
        tr.crossJoin(F.broadcast(ab))
        .select(
            F.round(F.col("tr"), 6).alias("same_frac_r"),
            F.round((F.col("tr") - F.col("ab")) / (F.lit(1.0) - F.col("ab")), 6).alias(
                "assortativity_r"
            ),
        )
    )


_NATION_MIX_SQL = """
WITH w AS (SELECT c.c_nationkey AS i, s.s_nationkey AS j,
                  CAST(COUNT(*) AS DOUBLE) AS w
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY 1, 2),
t AS (SELECT SUM(w) AS t FROM w),
e AS (SELECT i, j, w / (SELECT t FROM t) AS e FROM w),
tr AS (SELECT SUM(e) AS tr FROM e WHERE i = j),
ab AS (SELECT SUM(a.a * b.b) AS ab
       FROM (SELECT i, SUM(e) AS a FROM e GROUP BY i) a
       JOIN (SELECT j, SUM(e) AS b FROM e GROUP BY j) b ON a.i = b.j)
SELECT ROUND((SELECT tr FROM tr), 6) AS same_frac_r,
       ROUND(((SELECT tr FROM tr) - (SELECT ab FROM ab))
             / (1.0 - (SELECT ab FROM ab)), 6) AS assortativity_r
"""


ORACLES.update({"nation_mixing": _NATION_MIX_SQL})
QUERIES.update({"nation_mixing": q_nation_mixing})


def q_node_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash neighbor-set similarity on the bounded co-order graph
    (parts < 400): 4-seed min-hash signatures of each vertex's
    neighbor set (the SQL-replayable xorshift family), candidate pairs
    = vertices agreeing on ANY seed's minimum, estimate Ĵ = agreeing
    seeds / 4 — the sketch-based scale path for node similarity (the
    exact counterpart is `node_similarity3`).  Signature build is one
    4x explode + min aggregate; candidates come from band joins, never
    all pairs."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    e = _sym(und)
    seeds = F.explode(F.array(*[F.lit(j) for j in (1, 2, 3, 4)])).alias("seed")
    hx = e.select(F.col("src").alias("v"), F.col("dst").alias("x"), seeds)
    x0 = (F.col("x") * F.lit(2654435761) + F.col("seed") * F.lit(1000003)) % F.lit(2**31)
    x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
    h = x1.bitwiseXOR(F.shiftright(x1, 17))
    sig = (
        hx.select("v", "seed", h.alias("h"))
        .groupBy("v", "seed")
        .agg(F.min("h").alias("mh"))
    )
    cand = (
        sig.alias("sa")
        .join(
            sig.alias("sb"),
            (F.col("sa.seed") == F.col("sb.seed"))
            & (F.col("sa.mh") == F.col("sb.mh"))
            & (F.col("sa.v") < F.col("sb.v")),
        )
        .select(F.col("sa.v").alias("a"), F.col("sb.v").alias("b"))
        .distinct()
    )
    agree = (
        cand.join(sig.select(F.col("v").alias("a"), "seed", F.col("mh").alias("ha")), "a")
        .join(
            sig.select(F.col("v").alias("b"), "seed", F.col("mh").alias("hb")),
            ["b", "seed"],
        )
        .groupBy("a", "b")
        .agg(F.sum((F.col("ha") == F.col("hb")).cast("long")).alias("m"))
    )
    return agree.select(
        "a", "b", (F.col("m") / F.lit(4.0)).alias("jhat")
    ).orderBy("a", "b")


_NODE_MINHASH_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
hx AS (SELECT e.src AS v, e.dst AS x, s.seed AS seed
       FROM e CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS seed) s),
m0 AS (SELECT v, seed, (x * 2654435761 + seed * 1000003) % 2147483648 AS x0 FROM hx),
m1 AS (SELECT v, seed, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM m0),
sig AS (SELECT v, seed, MIN(xor(x1, x1 >> 17)) AS mh FROM m1 GROUP BY v, seed),
cand AS (SELECT DISTINCT sa.v AS a, sb.v AS b
         FROM sig sa JOIN sig sb
           ON sa.seed = sb.seed AND sa.mh = sb.mh AND sa.v < sb.v),
agree AS (SELECT c.a, c.b,
                 SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS m
          FROM cand c
          JOIN sig x ON x.v = c.a
          JOIN sig y ON y.v = c.b AND y.seed = x.seed
          GROUP BY c.a, c.b)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, m / 4.0 AS jhat
FROM agree ORDER BY a, b
"""


ORACLES.update({"node_minhash": _NODE_MINHASH_SQL})
QUERIES.update({"node_minhash": q_node_minhash})


def q_matching_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed maximal matching (pregel.maximal_matching) on the
    bounded co-order graph (parts < 400): mutual-proposal rounds over
    deterministic xorshift edge priorities — the edge-side sibling of
    Luby MIS and the primitive under b-matching / coarsening.  The SQL
    oracle unrolls 12 rounds; past-fixpoint rounds are no-ops."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    m, _stats = pregel.maximal_matching(und)
    return m.select("a", "b").orderBy("a", "b")


def _matching_sql(rounds: int) -> str:
    parts = [
        "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey < 400)",
        "und AS (SELECT DISTINCT a.p AS a, b.p AS b "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
        "k0 AS (SELECT a, b, a * 2147483648 + b AS key FROM und)",
        "k1 AS (SELECT a, b, xor(key % 2147483648, (key >> 31) % 2147483648) AS x0 FROM k0)",
        "k2 AS (SELECT a, b, (x0 * 2654435761) % 2147483648 AS x1 FROM k1)",
        "k3 AS (SELECT a, b, (xor(x1, x1 >> 13) * 1274126177) % 2147483648 AS x2 FROM k2)",
        "e0 AS (SELECT a, b, xor(x2, x2 >> 17) AS p FROM k3)",
        "m0 AS (SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"inc{i} AS (SELECT a AS v, a, b, p FROM e{i - 1} "
            f"UNION ALL SELECT b, a, b, p FROM e{i - 1})",
            f"top{i} AS (SELECT v, a, b FROM ("
            f"SELECT v, a, b, ROW_NUMBER() OVER (PARTITION BY v "
            f"ORDER BY p DESC, a ASC, b ASC) AS rn FROM inc{i}) t WHERE rn = 1)",
            f"sel{i} AS MATERIALIZED (SELECT a, b FROM top{i} "
            f"GROUP BY a, b HAVING COUNT(*) = 2)",
            f"m{i} AS (SELECT a, b FROM m{i - 1} UNION ALL SELECT a, b FROM sel{i})",
            f"mv{i} AS (SELECT a AS v FROM sel{i} UNION ALL SELECT b FROM sel{i})",
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b, e.p FROM e{i - 1} e "
            f"WHERE e.a NOT IN (SELECT v FROM mv{i}) "
            f"AND e.b NOT IN (SELECT v FROM mv{i}))",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
        FROM m{rounds} ORDER BY a, b"""
    )


ORACLES.update({"matching_coorder": _matching_sql(12)})
QUERIES.update({"matching_coorder": q_matching_coorder})


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source containment matrix: for every source pair, how many
    distinct 5-gram shingles they SHARE — the between-source half of
    the dedup report (`dedup_rate_by_source` is the within-source
    half); exact-text overlap is empty on this corpus, shingle overlap
    is the signal a cross-corpus screen actually thresholds."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    ).where(F.size("t") >= 5)
    grams = toks.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 5), i -> "
                "concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))"
            )
        ).alias("g"),
    ).distinct()
    a, b = grams.alias("a"), grams.alias("b")
    return (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").cast("long").alias("shared"))
        .orderBy("src_a", "src_b")
    )


_SOURCE_OVERLAP_SQL = """
WITH toks AS (SELECT source, string_split(trim(lower(text)), ' ') AS t
              FROM documents),
grams AS (SELECT DISTINCT source,
                 t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                 t[i+3] || ' ' || t[i+4] AS g
          FROM toks, unnest(range(1, len(t) - 3)) u(i)
          WHERE len(t) >= 5)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES.update({"source_overlap": _SOURCE_OVERLAP_SQL})
QUERIES.update({"source_overlap": q_source_overlap})


def q_funnel_svp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → purchase over the
    event stream: per-user FIRST timestamps per stage, a user converts
    at stage k when its first-timestamp chain is strictly increasing —
    one conditional-min aggregate per user, no self-joins."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t2"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t3"),
    )
    s1 = F.col("t1").isNotNull()
    s2 = s1 & F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))
    s3 = s2 & F.col("t3").isNotNull() & (F.col("t3") > F.col("t2"))
    return firsts.agg(
        F.sum(s1.cast("long")).alias("n_signup"),
        F.sum(s2.cast("long")).alias("n_signup_view"),
        F.sum(s3.cast("long")).alias("n_signup_view_purchase"),
    )


_FUNNEL_SQL = """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t2,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
    FROM events GROUP BY user_id)
SELECT CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_signup,
       CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t2 > t1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view,
       CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t2 > t1
                     AND t3 IS NOT NULL AND t3 > t2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view_purchase
FROM firsts
"""


ORACLES.update({"funnel_svp": _FUNNEL_SQL})
QUERIES.update({"funnel_svp": q_funnel_svp})


def q_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort matrix: users bucketed by the ISO week
    of their first event, counted in every subsequent week they were
    active — (cohort_week, week_n, users).  Two aggregates and one
    broadcast-joinable cohort dimension."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    active = ev.distinct()
    cohort = active.groupBy("user_id").agg(F.min("wk").alias("cw"))
    return (
        active.join(F.broadcast(cohort), "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            F.floor(F.datediff(F.col("wk"), F.col("cw")) / 7)
            .cast("long")
            .alias("week_n"),
        )
        .agg(F.count("*").cast("long").alias("users"))
        .orderBy("cohort_week", "week_n")
    )


_RETENTION_SQL = """
WITH active AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS DATE) AS wk
                FROM events),
cohort AS (SELECT user_id, MIN(wk) AS cw FROM active GROUP BY user_id)
SELECT c.cw AS cohort_week,
       CAST(FLOOR(datediff('day', c.cw, a.wk) / 7.0) AS BIGINT) AS week_n,
       CAST(COUNT(*) AS BIGINT) AS users
FROM active a JOIN cohort c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES.update({"retention_weekly": _RETENTION_SQL})
QUERIES.update({"retention_weekly": q_retention_weekly})


def q_nsp_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-path counts (Brandes σ, pregel.shortest_path_counts)
    from the minimum vertex of the bounded co-order graph: (id, dist,
    sigma) for every reachable vertex — all-integer parity.  The SQL
    oracle unrolls 12 frontier rounds (over-unrolling is a no-op once
    the frontier empties)."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    e = _sym(und)
    seed = int(pregel.vertices_of(e).agg(F.min("id")).collect()[0][0])
    out, _stats = pregel.shortest_path_counts(e, seed)
    return out.select("id", F.col("dist").cast("long"), "sigma").orderBy("id")


def _nsp_sql(rounds: int) -> str:
    parts = [
        "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey < 400)",
        "und AS (SELECT DISTINCT a.p AS src, b.p AS dst "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
        "e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "vv AS (SELECT MIN(src) AS s FROM e)",
        "f0 AS (SELECT (SELECT s FROM vv) AS id, 0 AS dist, CAST(1 AS BIGINT) AS sigma)",
        "vis0 AS (SELECT id, dist, sigma FROM f0)",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"f{i} AS MATERIALIZED (SELECT e.dst AS id, {i} AS dist, "
            f"CAST(SUM(f{i - 1}.sigma) AS BIGINT) AS sigma "
            f"FROM e JOIN f{i - 1} ON f{i - 1}.id = e.src "
            f"WHERE e.dst NOT IN (SELECT id FROM vis{i - 1}) GROUP BY e.dst)",
            f"vis{i} AS MATERIALIZED (SELECT id, dist, sigma FROM vis{i - 1} "
            f"UNION ALL SELECT id, dist, sigma FROM f{i})",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist, sigma
        FROM vis{rounds} ORDER BY id"""
    )


ORACLES.update({"nsp_seed": _nsp_sql(12)})
QUERIES.update({"nsp_seed": q_nsp_seed})


def q_conductance_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community quality audit: conductance φ(C) = cut(C) /
    min(vol(C), 2m − vol(C)) of every 2-round LPA community on the
    SPARSE co-order graph — the metric that tells whether propagation
    found real clusters (on the near-complete co-part graph LPA
    collapses to one whole-graph community, a vacuous φ=0 row; whole-
    graph communities are defined as φ=0 since cut and the denominator
    are both 0).  Reuses the `lpa_fixed2` unrolled-round SQL replay;
    cut/volume are two aggregates over the labeled symmetric edges."""
    und = pregel._hard_cut(coorder_edges(spark, sf_dir))
    e = _sym(und)
    labels, _ = pregel.label_propagation(und, max_iter=2)
    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    el = (
        e.join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "ld"), "dst")
    )
    m2 = el.count()  # 2m (symmetrized edge rows)
    vol = el.groupBy(F.col("ls").alias("label")).agg(F.count("*").alias("vol"))
    cut = (
        el.where(F.col("ls") != F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.count("*").alias("cut"))
    )
    return (
        vol.join(cut, "label", "left")
        .select(
            "label",
            F.col("vol").cast("long"),
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            F.when(
                F.least(F.col("vol"), F.lit(m2) - F.col("vol")) == 0, F.lit(0.0)
            )
            .otherwise(
                F.round(
                    F.coalesce(F.col("cut"), F.lit(0))
                    / F.least(F.col("vol"), F.lit(m2) - F.col("vol")).cast("double"),
                    6,
                )
            )
            .alias("phi_r"),
        )
        .orderBy("label")
    )


def _conductance_sql() -> str:
    lpa_rounds = "".join(
        "," + _LPA_ROUND.format(K=k, KM1=k - 1) for k in (1, 2)
    )
    return f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)
{lpa_rounds},
el AS (SELECT e.src, e.dst, a.label AS ls, b.label AS ld
       FROM e JOIN l2 a ON a.id = e.src JOIN l2 b ON b.id = e.dst),
m2 AS (SELECT COUNT(*) AS m2 FROM el),
vol AS (SELECT ls AS label, COUNT(*) AS vol FROM el GROUP BY ls),
cut AS (SELECT ls AS label, COUNT(*) AS cut FROM el WHERE ls <> ld GROUP BY ls)
SELECT vol.label, CAST(vol.vol AS BIGINT) AS vol,
       CAST(COALESCE(cut.cut, 0) AS BIGINT) AS cut,
       CASE WHEN LEAST(vol.vol, (SELECT m2 FROM m2) - vol.vol) = 0 THEN 0.0
            ELSE ROUND(COALESCE(cut.cut, 0) /
                 CAST(LEAST(vol.vol, (SELECT m2 FROM m2) - vol.vol) AS DOUBLE),
                 6) END AS phi_r
FROM vol LEFT JOIN cut ON cut.label = vol.label
ORDER BY vol.label
"""


ORACLES.update({"conductance_lpa": _conductance_sql()})
QUERIES.update({"conductance_lpa": q_conductance_lpa})


def q_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel-candidate mining over embeddings: distance of every
    vector to its own label centroid, bottom-3 cosine per label — the
    curation screen that surfaces wrongly-tagged examples.  Centroids
    are one posexplode aggregate broadcast back; the score pass is a
    pure map stage."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "vec_id", "label", (dot / (nrm(F.col("v")) * nrm(F.col("cv")))).alias("cos")
    )
    w = Window.partitionBy("label").orderBy(F.asc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select("label", "vec_id", F.round("cos", 6).alias("cos_r"))
        .orderBy("label", "vec_id")
    )


_LABEL_OUTLIERS_SQL = """
WITH x AS (SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
cent AS (SELECT label, pos, AVG(x) AS c FROM x GROUP BY label, pos),
dots AS (SELECT x.vec_id, x.label,
                SUM(x.x * cent.c) AS dot,
                SQRT(SUM(x.x * x.x)) AS nv,
                SQRT(SUM(cent.c * cent.c)) AS nc
         FROM x JOIN cent ON cent.label = x.label AND cent.pos = x.pos
         GROUP BY x.vec_id, x.label),
scored AS (SELECT vec_id, label, dot / (nv * nc) AS cos FROM dots),
rk AS (SELECT label, vec_id, cos,
              ROW_NUMBER() OVER (PARTITION BY label
                                 ORDER BY cos ASC, vec_id ASC) AS rn
       FROM scored)
SELECT CAST(label AS INTEGER) AS label, vec_id, ROUND(cos, 6) AS cos_r
FROM rk WHERE rn <= 3 ORDER BY label, vec_id
"""


ORACLES.update({"label_outliers": _LABEL_OUTLIERS_SQL})
QUERIES.update({"label_outliers": q_label_outliers})


def q_backbone_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex top-3 weighted backbone of the co-order graph (the
    k-NN graph sparsifier under embedding/link pipelines): each vertex
    keeps its 3 heaviest co-order edges (weight desc, neighbor asc),
    kept edges are the symmetric union — output canonical (a < b)
    pairs with weight."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a, b = op.alias("a"), op.alias("b")
    wund = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    sym = wund.unionByName(
        wund.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    win = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    kept = sym.withColumn("_rn", F.row_number().over(win)).where(F.col("_rn") <= 3)
    return (
        kept.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), "w"
        )
        .dropDuplicates(["a", "b"])
        .orderBy("a", "b")
    )


_BACKBONE_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
wund AS (SELECT a.p AS src, b.p AS dst, CAST(COUNT(*) AS BIGINT) AS w
         FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
sym AS (SELECT src, dst, w FROM wund UNION ALL SELECT dst, src, w FROM wund),
kept AS (SELECT src, dst, w FROM (
           SELECT src, dst, w, ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY w DESC, dst ASC) AS rn
           FROM sym) t WHERE rn <= 3)
SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, w
FROM kept ORDER BY a, b
"""


ORACLES.update({"backbone_top3": _BACKBONE_SQL})
QUERIES.update({"backbone_top3": q_backbone_top3})


def q_rank_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal centrality drift: PageRank (3 fixed rounds) of the
    demand graph restricted to orders BEFORE vs SINCE 1998-01-01 —
    per-supplier rank delta, the 'who is gaining importance' snapshot
    diff (degree_delta's centrality-level sibling).  Both epochs
    unroll in one SQL oracle; suppliers absent from an epoch carry
    rank 0."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    cut = F.lit("1998-01-01").cast("timestamp")

    def epoch(cond):
        return (
            li.join(orders.where(cond), li.l_orderkey == orders.o_orderkey)
            .where(F.col("o_custkey") != F.col("l_suppkey"))
            .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
            .distinct()
        )

    r_old = pregel.pagerank_fixed(
        _sym(epoch(F.col("o_orderdate") < cut)), n_iter=3, damping=DAMPING
    )
    r_new = pregel.pagerank_fixed(
        _sym(epoch(F.col("o_orderdate") >= cut)), n_iter=3, damping=DAMPING
    )
    suppliers = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("id")
    )
    return (
        suppliers.join(r_old.withColumnRenamed("rank", "r_old"), "id", "left")
        .join(r_new.withColumnRenamed("rank", "r_new"), "id", "left")
        .select(
            "id",
            F.round(F.coalesce(F.col("r_old"), F.lit(0.0)), 7).alias("rank_old_r"),
            F.round(F.coalesce(F.col("r_new"), F.lit(0.0)), 7).alias("rank_new_r"),
            F.round(
                F.coalesce(F.col("r_new"), F.lit(0.0))
                - F.coalesce(F.col("r_old"), F.lit(0.0)),
                7,
            ).alias("delta_r"),
        )
        .orderBy("id")
    )


def _rank_drift_sql(n_iter: int = 3) -> str:
    def chain(tag: str, cond: str) -> str:
        parts = [
            f"e_{tag} AS (SELECT DISTINCT o.o_custkey AS s, l.l_suppkey AS d "
            f"FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            f"WHERE {cond} AND o.o_custkey <> l.l_suppkey)",
            # DISTINCT matters: both (a,b) and (b,a) demand pairs exist, and
            # the operator's normalize_edges dedups the symmetrized table
            f"g_{tag} AS (SELECT s AS src, d AS dst FROM e_{tag} "
            f"UNION SELECT d, s FROM e_{tag})",
            f"v_{tag} AS (SELECT DISTINCT src AS id FROM g_{tag})",
            f"inv_{tag} AS (SELECT 1.0 / COUNT(*) AS x FROM v_{tag})",
            f"dg_{tag} AS (SELECT src, COUNT(*) AS dd FROM g_{tag} GROUP BY src)",
            f"w_{tag} AS (SELECT g.src, g.dst, 1.0 / dg.dd AS wt "
            f"FROM g_{tag} g JOIN dg_{tag} dg ON dg.src = g.src)",
            f"r0_{tag} AS (SELECT id, (SELECT x FROM inv_{tag}) AS r FROM v_{tag})",
        ]
        for k in range(1, n_iter + 1):
            parts.append(
                f"r{k}_{tag} AS (SELECT v.id, "
                f"0.15 * (SELECT x FROM inv_{tag}) + 0.85 * COALESCE(s.s, 0) AS r "
                f"FROM v_{tag} v LEFT JOIN ("
                f"SELECT w.dst AS id, SUM(w.wt * p.r) AS s "
                f"FROM w_{tag} w JOIN r{k - 1}_{tag} p ON p.id = w.src "
                f"GROUP BY w.dst) s ON s.id = v.id)"
            )
        return ",\n".join(parts)

    return f"""
WITH {chain("old", "o.o_orderdate < TIMESTAMP '1998-01-01'")},
{chain("new", "o.o_orderdate >= TIMESTAMP '1998-01-01'")}
SELECT s.s_suppkey AS id,
       ROUND(COALESCE(ro.r, 0), 7) AS rank_old_r,
       ROUND(COALESCE(rn.r, 0), 7) AS rank_new_r,
       ROUND(COALESCE(rn.r, 0) - COALESCE(ro.r, 0), 7) AS delta_r
FROM supplier s
LEFT JOIN r{n_iter}_old ro ON ro.id = s.s_suppkey
LEFT JOIN r{n_iter}_new rn ON rn.id = s.s_suppkey
ORDER BY s.s_suppkey
"""


ORACLES.update({"rank_drift": _rank_drift_sql(3)})
QUERIES.update({"rank_drift": q_rank_drift})


def q_degree_centralization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freeman degree centralization of the co-order graph: Σ(maxdeg −
    deg) / ((n−1)(n−2)) — one number separating hub-and-spoke from
    egalitarian topologies; plus n, edges, max degree for context."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    # Σ(maxdeg − deg) = n·maxdeg − Σdeg, so one aggregate suffices
    return deg.agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("d") / 2).cast("long").alias("m"),
        F.max("d").cast("long").alias("max_deg"),
        F.round(
            (F.count("*") * F.max("d") - F.sum("d"))
            / ((F.count("*") - 1) * (F.count("*") - 2)).cast("double"),
            6,
        ).alias("centralization_r"),
    )


_DEGREE_CENTRALIZATION_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(d) / 2 AS BIGINT) AS m,
       CAST(MAX(d) AS BIGINT) AS max_deg,
       ROUND((COUNT(*) * MAX(d) - SUM(d))
             / CAST((COUNT(*) - 1) * (COUNT(*) - 2) AS DOUBLE), 6)
           AS centralization_r
FROM deg
"""


ORACLES.update({"degree_centralization": _DEGREE_CENTRALIZATION_SQL})
QUERIES.update({"degree_centralization": q_degree_centralization})


def q_ppr_push4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-push approximate PPR (pregel.ppr_push, 4 synchronous
    lazy-walk rounds from supplier 1) on the co-part graph: settled
    mass p plus the outstanding residual r per vertex — the bounded-
    work local-clustering primitive next to the exact `ppr_fixed3`."""
    e = _sym(copart_edges(spark, sf_dir))
    out = pregel.ppr_push(e, source=1, alpha=0.15, n_iter=4)
    return out.select(
        "id", F.round("p", 7).alias("p_r"), F.round("r", 7).alias("res_r")
    ).orderBy("id")


def _ppr_push_parts(n_iter: int = 4, alpha: float = 0.15) -> list[str]:
    """CTE chain for the unrolled forward-push PPR on the co-part
    graph — shared by the ppr_push4 oracle and the ppr_nibble sweep."""
    half = (1.0 - alpha) / 2.0
    parts = [
        _COPART_SQL.strip(),
        _SYM_SQL,
        "verts AS (SELECT DISTINCT src AS id FROM e)",
        "deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src)",
        "w AS (SELECT e.src, e.dst, 1.0 / deg.d AS wt "
        "FROM e JOIN deg ON deg.src = e.src)",
        "s0 AS (SELECT id, 0.0 AS p, "
        "CASE WHEN id = 1 THEN 1.0 ELSE 0.0 END AS r FROM verts)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f"s{k} AS (SELECT v.id, s.p + {alpha} * s.r AS p, "
            f"{half} * s.r + {half} * COALESCE(m.inm, 0) AS r "
            f"FROM verts v JOIN s{k - 1} s ON s.id = v.id LEFT JOIN ("
            f"SELECT w.dst AS id, SUM(w.wt * s{k - 1}.r) AS inm "
            f"FROM w JOIN s{k - 1} ON s{k - 1}.id = w.src GROUP BY w.dst"
            f") m ON m.id = v.id)"
        )
    return parts


def _ppr_push_sql(n_iter: int = 4, alpha: float = 0.15) -> str:
    return (
        "WITH "
        + ",\n".join(_ppr_push_parts(n_iter, alpha))
        + f"""
        SELECT id, ROUND(p, 7) AS p_r, ROUND(r, 7) AS res_r
        FROM s{n_iter} ORDER BY id"""
    )


ORACLES.update({"ppr_push4": _ppr_push_sql(4, 0.15)})
QUERIES.update({"ppr_push4": q_ppr_push4})


def q_sage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style neighborhood feature aggregation: mean of each
    vector's top-3 cosine neighbors' embeddings, per dimension — the
    GNN message-passing prep pass (sample → aggregate) over the kNN
    graph of the embeddings table.  Exploded (vec_id, dim, value)
    output keeps the cross-engine compare array-free."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        q.crossJoin(emb)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    nbrs = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    nx = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.posexplode("v").alias("pos", "x")
    )
    return (
        nbrs.join(nx, "neighbor_id")
        .groupBy(F.col("query_id").alias("vec_id"), "pos")
        .agg(F.round(F.avg("x"), 6).alias("agg_r"))
        .select("vec_id", F.col("pos").cast("long"), "agg_r")
        .orderBy("vec_id", "pos")
    )


_SAGE_SQL = """
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(UNNEST(embedding) AS DOUBLE) AS x
           FROM embeddings),
nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS n FROM e GROUP BY vec_id),
dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS d
         FROM e a JOIN e b ON a.i = b.i AND a.vec_id != b.vec_id
         GROUP BY a.vec_id, b.vec_id),
scored AS (SELECT query_id, neighbor_id, d / (na.n * nb.n) AS cos
           FROM dots JOIN nrm na ON na.vec_id = query_id
                     JOIN nrm nb ON nb.vec_id = neighbor_id),
nbrs AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id ASC) AS rn
           FROM scored) t WHERE rn <= 3)
SELECT nbrs.query_id AS vec_id, CAST(e.i - 1 AS BIGINT) AS pos,
       ROUND(AVG(e.x), 6) AS agg_r
FROM nbrs JOIN e ON e.vec_id = nbrs.neighbor_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES.update({"sage_agg": _SAGE_SQL})
QUERIES.update({"sage_agg": q_sage_agg})


def q_wedge_sample_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge-sampling estimate of the global clustering coefficient on
    the FULL co-order graph (Seshadhri et al. 2013): enumerate wedges
    once, keep a deterministic ~2% hash sample (the shared xorshift
    coin over the (center, endpoints) triple — SQL-replayable, no RNG
    state), closure-check ONLY the sample.  The closure semi-join —
    the expensive stage of exact triangle counting — touches 2% of
    wedges; at 100 TB that is the difference between feasible and not.
    Output: total wedges, sampled, closed, cc estimate, and the implied
    triangle estimate."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    wedges = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("a"))
        .join(e.select(F.col("src").alias("v"), F.col("dst").alias("b")), "v")
        .where(F.col("a") < F.col("b"))
    )
    # reduce the packed key mod 2^31 BEFORE the multiply — the raw
    # key times the mix constant overflows int64 for large part ids
    key = (
        F.col("v") * F.lit(4_000_037) + F.col("a") * F.lit(2_003) + F.col("b")
    ) % F.lit(2**31)
    x0 = (key * F.lit(2654435761) + F.lit(13)) % F.lit(2**31)
    x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
    bucket = x1.bitwiseXOR(F.shiftright(x1, 17)) % F.lit(10_000)
    tagged = wedges.select("v", "a", "b", (bucket < 200).alias("_s"))
    sampled = tagged.where("_s")
    und = coorder_edges(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    closed = sampled.join(und, ["a", "b"], "left_semi")
    stats = tagged.agg(
        F.count("*").cast("long").alias("total_wedges"),
        F.sum(F.col("_s").cast("long")).alias("sampled"),
    ).crossJoin(F.broadcast(closed.agg(F.count("*").cast("long").alias("closed"))))
    return stats.select(
        "total_wedges",
        "sampled",
        "closed",
        F.round(F.col("closed") / F.col("sampled"), 6).alias("cc_est_r"),
        F.floor(
            F.col("closed") / F.col("sampled") * F.col("total_wedges") / F.lit(3.0)
        )
        .cast("long")
        .alias("tri_est"),
    )


_WEDGE_SAMPLE_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
w AS (SELECT x.src AS v, x.dst AS a, y.dst AS b
      FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst),
t AS (SELECT v, a, b,
             (xor(x1, x1 >> 17) % 10000) < 200 AS s
      FROM (SELECT v, a, b,
                   (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1
            FROM (SELECT v, a, b,
                         (((v * 4000037 + a * 2003 + b) % 2147483648)
                              * 2654435761 + 13) % 2147483648 AS x0
                  FROM w) q0) q1),
c AS (SELECT COUNT(*) AS closed FROM t
      WHERE t.s AND EXISTS (SELECT 1 FROM und u
                            WHERE u.src = t.a AND u.dst = t.b)),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_wedges,
               CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS sampled
        FROM t)
SELECT total_wedges, sampled, CAST(c.closed AS BIGINT) AS closed,
       ROUND(CAST(c.closed AS DOUBLE) / sampled, 6) AS cc_est_r,
       CAST(FLOOR(CAST(c.closed AS DOUBLE) / sampled * total_wedges / 3.0)
            AS BIGINT) AS tri_est
FROM agg CROSS JOIN c
"""


ORACLES.update({"wedge_sample_cc": _WEDGE_SAMPLE_SQL})
QUERIES.update({"wedge_sample_cc": q_wedge_sample_cc})


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage diagnostic: share of each source's
    tokens covered by the corpus-wide top-10 word vocabulary (count
    desc, word asc cut — deterministic; the synthetic corpus has only
    31 distinct words, so any larger cut is vacuously 1.0) — the
    out-of-vocabulary-rate report read before fixing a tokenizer
    vocab.  Vocabulary rides a broadcast semi-join; two linear
    aggregates otherwise."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(10)
        .select("w")
    )
    cover = toks.join(F.broadcast(vocab), "w", "left_semi")
    tot = toks.groupBy("source").agg(F.count("*").alias("n"))
    cov = cover.groupBy("source").agg(F.count("*").alias("k"))
    return (
        tot.join(cov, "source", "left")
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("covered"),
            F.round(F.coalesce(F.col("k"), F.lit(0)) / F.col("n"), 6).alias(
                "coverage_r"
            ),
        )
        .orderBy("source")
    )


_VOCAB_COVERAGE_SQL = """
WITH toks AS (SELECT source, t.w AS w
              FROM (SELECT source, string_split(trim(lower(text)), ' ') AS ws
                    FROM documents) d, unnest(d.ws) t(w)),
vocab AS (SELECT w FROM (SELECT w, COUNT(*) AS c FROM toks GROUP BY w
                         ORDER BY c DESC, w ASC LIMIT 10) v),
tot AS (SELECT source, COUNT(*) AS n FROM toks GROUP BY source),
cov AS (SELECT source, COUNT(*) AS k FROM toks
        WHERE w IN (SELECT w FROM vocab) GROUP BY source)
SELECT tot.source, CAST(tot.n AS BIGINT) AS n_tokens,
       CAST(COALESCE(cov.k, 0) AS BIGINT) AS covered,
       ROUND(CAST(COALESCE(cov.k, 0) AS DOUBLE) / tot.n, 6) AS coverage_r
FROM tot LEFT JOIN cov USING (source) ORDER BY tot.source
"""


ORACLES.update({"vocab_coverage": _VOCAB_COVERAGE_SQL})
QUERIES.update({"vocab_coverage": q_vocab_coverage})


def q_hnsw_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded graph-ANN (NSW-per-partition, the hnswlib-on-Spark
    serving pattern) answering the SAME panel as ``knn_cosine`` — with
    beam width ≥ shard size the shard-union reduce is exact, so the
    exact-kNN SQL oracle checks it value-for-value (approximation shows
    only when ef_search < shard size at corpus scale)."""
    from polar_spark.operators.similarity import hnsw_topk

    emb = load_table(spark, "embeddings", sf_dir)
    out = hnsw_topk(emb, query_ids=list(range(20)), k=3, n_shards=8)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 6).alias("cos_r"), F.col("rnk")
    )


ORACLES.update({"hnsw_knn": ORACLES["knn_cosine"]})
QUERIES.update({"hnsw_knn": q_hnsw_knn})


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    per-doc log importance = Σ_w c_{w,d}·(ln p_target(w) − ln p_raw(w))
    with add-1 smoothing over the corpus vocabulary; target domain =
    source 'src0'.  The data-selection pass that resamples a raw crawl
    toward a target distribution before pretraining.

    Plan: ONE token explode (linear), two word-count aggregates over the
    tiny vocabulary, per-word log-ratio BROADCAST back onto the exploded
    tokens, one per-doc sum — no shuffle wider than the explode; at
    100 TB the vocabulary table (hashed n-gram buckets in the paper)
    stays a broadcast dimension."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    )
    raw = toks.groupBy("w").agg(F.count("*").alias("c_raw"))
    tgt = (
        toks.where(F.col("source") == "src0")
        .groupBy("w")
        .agg(F.count("*").alias("c_tgt"))
    )
    consts = raw.agg(
        F.sum("c_raw").alias("n_raw"), F.count("*").alias("v")
    ).crossJoin(toks.where(F.col("source") == "src0").agg(F.count("*").alias("n_tgt")))
    ratio = (
        raw.join(tgt, "w", "left")
        .na.fill({"c_tgt": 0})
        .crossJoin(F.broadcast(consts))
        .select(
            "w",
            (
                F.log((F.col("c_tgt") + 1) / (F.col("n_tgt") + F.col("v")))
                - F.log((F.col("c_raw") + 1) / (F.col("n_raw") + F.col("v")))
            ).alias("lr"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "w")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lr"), 6).alias("log_weight_r"))
        .select(
            "doc_id", "log_weight_r", (F.col("log_weight_r") > 0).alias("keep")
        )
    )


_DSIR_SQL = r"""
WITH toks AS (SELECT doc_id, source, t.w AS w
              FROM (SELECT doc_id, source,
                           string_split(trim(lower(text)), ' ') AS ws
                    FROM documents) d, unnest(d.ws) t(w)),
raw AS (SELECT w, COUNT(*) AS c_raw FROM toks GROUP BY w),
tgt AS (SELECT w, COUNT(*) AS c_tgt FROM toks WHERE source = 'src0' GROUP BY w),
consts AS (SELECT (SELECT SUM(c_raw) FROM raw) AS n_raw,
                  (SELECT COUNT(*) FROM raw) AS v,
                  (SELECT COUNT(*) FROM toks WHERE source = 'src0') AS n_tgt),
ratio AS (SELECT raw.w,
                 LN(CAST(COALESCE(tgt.c_tgt, 0) + 1 AS DOUBLE) / (consts.n_tgt + consts.v))
               - LN(CAST(raw.c_raw + 1 AS DOUBLE) / (consts.n_raw + consts.v)) AS lr
          FROM raw LEFT JOIN tgt USING (w) CROSS JOIN consts),
perdoc AS (SELECT doc_id, ROUND(SUM(lr), 6) AS log_weight_r
           FROM toks JOIN ratio USING (w) GROUP BY doc_id)
SELECT doc_id, log_weight_r, log_weight_r > 0 AS keep FROM perdoc
"""


def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity via an INVERTED-INDEX
    self-join (Bayardo et al. 2007 'Scaling Up All Pairs Similarity
    Search' candidate shape): candidate pairs share ≥1 term, the dot
    product accumulates per shared term in one groupBy, norms join back,
    threshold keeps near-duplicate pairs.  On a real corpus the index
    drops ultra-frequent terms (df cutoff) and applies prefix filtering;
    this fixture's 31-word vocabulary makes every term frequent, so the
    bound here is the similarity threshold alone (documented knob).

    tf = in-doc count, idf = ln(N/df); similarity rounded to 6 d.p.;
    pairs (a < b) with cos ≥ 0.9."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    )
    n_docs = docs.count()
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df_w = tf.groupBy("w").agg(F.count("*").alias("df"))
    tfidf = tf.join(F.broadcast(df_w), "w").select(
        "doc_id", "w", (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("x")
    )
    nrm = tfidf.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n"))
    a = tfidf.select(F.col("doc_id").alias("doc_a"), "w", F.col("x").alias("xa"))
    b = tfidf.select(F.col("doc_id").alias("doc_b"), "w", F.col("x").alias("xb"))
    dots = (
        a.join(b, "w")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
    )
    return (
        dots.join(nrm.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(nrm.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos_r"),
        )
        .where(F.col("cos_r") >= 0.9)
    )


_SPARSE_COSINE_SQL = r"""
WITH toks AS (SELECT doc_id, t.w AS w
              FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws
                    FROM documents) d, unnest(d.ws) t(w)),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
dfw AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
tfidf AS (SELECT doc_id, tf.w,
                 tf.tf * LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / dfw.df) AS x
          FROM tf JOIN dfw ON dfw.w = tf.w),
nrm AS (SELECT doc_id, SQRT(SUM(x * x)) AS n FROM tfidf GROUP BY doc_id),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.x * b.x) AS dot
         FROM tfidf a JOIN tfidf b ON b.w = a.w AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b, ROUND(dot / (na.n * nb.n), 6) AS cos_r
FROM dots JOIN nrm na ON na.doc_id = doc_a JOIN nrm nb ON nb.doc_id = doc_b
WHERE ROUND(dot / (na.n * nb.n), 6) >= 0.9
"""


ORACLES.update({"dsir_weights": _DSIR_SQL, "sparse_cosine_pairs": _SPARSE_COSINE_SQL})
QUERIES.update(
    {"dsir_weights": q_dsir_weights, "sparse_cosine_pairs": q_sparse_cosine_pairs}
)


def q_salsa3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA hubs & authorities (degree-normalized HITS — damps the
    tightly-knit-community over-amplification) on the directed demand
    graph, 3 fixed iterations, L1 half-step normalization — unrolled
    identically in the SQL oracle."""
    e = demand_edges(spark, sf_dir)
    out = pregel.salsa(e, n_iter=3)
    return out.select(
        "id", F.round("hub", 7).alias("hub_r"), F.round("authority", 7).alias("auth_r")
    ).orderBy("id")


def _salsa_sql(n_iter: int) -> str:
    parts = [
        "e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey)",
        "v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "od AS MATERIALIZED (SELECT src AS id, COUNT(*) AS outd FROM e GROUP BY src)",
        "idg AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS ind FROM e GROUP BY dst)",
        "s0 AS (SELECT id, 1.0 AS hub, 1.0 AS auth FROM v)",
    ]
    for i in range(1, n_iter + 1):
        parts += [
            f"ar{i} AS (SELECT e.dst AS id, SUM(s{i - 1}.hub / od.outd) AS a "
            f"FROM e JOIN s{i - 1} ON s{i - 1}.id = e.src "
            f"JOIN od ON od.id = e.src GROUP BY e.dst)",
            f"af{i} AS (SELECT v.id, COALESCE(ar{i}.a, 0) AS a FROM v LEFT JOIN ar{i} USING (id))",
            f"an{i} AS (SELECT id, a / (SELECT SUM(a) FROM af{i}) AS auth FROM af{i})",
            f"hr{i} AS (SELECT e.src AS id, SUM(an{i}.auth / idg.ind) AS h "
            f"FROM e JOIN an{i} ON an{i}.id = e.dst "
            f"JOIN idg ON idg.id = e.dst GROUP BY e.src)",
            f"hf{i} AS (SELECT v.id, COALESCE(hr{i}.h, 0) AS h FROM v LEFT JOIN hr{i} USING (id))",
            f"s{i} AS (SELECT hn.id, hn.hub, an{i}.auth FROM "
            f"(SELECT id, h / (SELECT SUM(h) FROM hf{i}) AS hub FROM hf{i}) hn "
            f"JOIN an{i} USING (id))",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, ROUND(hub, 7) AS hub_r,
               ROUND(auth, 7) AS auth_r
        FROM s{n_iter} ORDER BY id"""
    )


ORACLES.update({"salsa3": _salsa_sql(3)})
QUERIES.update({"salsa3": q_salsa3})


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source re-balancing (the multilingual-corpus
    upsampling rule, XLM/mT5 style, α = 0.5): target share q_s ∝ c_s^α
    flattens the source distribution; per-source keep rate =
    min(1, N_target·√c_s / (Σ√c · c_s)) with N_target = half the corpus,
    decided per doc by the deterministic hash-bucket coin (integer
    compare, partitioning-invariant).  α = 0.5 keeps the powers on
    IEEE-exact sqrt so both engines compute identical rates.  Returns
    per-source (n_docs, n_kept, rate_r)."""
    from polar_spark.operators.sampling import BUCKETS, hash_bucket

    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("source").agg(F.count("*").alias("c"))
    consts = stats.agg(
        F.sum(F.sqrt(F.col("c"))).alias("z"), F.sum("c").alias("n")
    )
    rates = stats.crossJoin(F.broadcast(consts)).select(
        "source",
        "c",
        F.least(
            F.lit(1.0),
            (F.col("n") / 2.0) * F.sqrt(F.col("c")) / (F.col("z") * F.col("c")),
        ).alias("rate"),
    )
    coin = hash_bucket(F.col("doc_id"), 53)
    kept = (
        docs.join(F.broadcast(rates), "source")
        .where(coin < F.col("rate") * F.lit(BUCKETS))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("c").alias("n_docs"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.round("rate", 6).alias("rate_r"),
        )
        .orderBy("source")
    )


_TEMPERATURE_SQL = """
WITH stats AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
consts AS (SELECT SUM(SQRT(c)) AS z, SUM(c) AS n FROM stats),
rates AS (SELECT source, c,
                 LEAST(1.0, (n / 2.0) * SQRT(c) / (z * c)) AS rate
          FROM stats CROSS JOIN consts),
coin AS (SELECT doc_id, source, xor(x1, x1 >> 17) % 10000 AS bucket FROM (
           SELECT doc_id, source,
                  (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM (
             SELECT doc_id, source,
                    (doc_id * 2654435761 + 53) % 2147483648 AS x0
             FROM documents) a) b),
kept AS (SELECT coin.source, COUNT(*) AS n_kept
         FROM coin JOIN rates ON rates.source = coin.source
         WHERE bucket < rate * 10000 GROUP BY coin.source)
SELECT rates.source, CAST(c AS BIGINT) AS n_docs,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       ROUND(rate, 6) AS rate_r
FROM rates LEFT JOIN kept ON kept.source = rates.source
ORDER BY rates.source
"""


ORACLES.update({"temperature_sample": _TEMPERATURE_SQL})
QUERIES.update({"temperature_sample": q_temperature_sample})


def q_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection per document: k-gram
    count, selected-fingerprint count, and the fingerprint checksum —
    the whole selection is a per-document map (zero shuffle)."""
    from polar_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, "documents", sf_dir)
    out = winnow_fingerprints(docs, "text", "doc_id", k=4, w=5)
    return out.select(
        F.col("doc_id").cast("long"),
        "n_kgrams",
        "n_fps",
        F.aggregate("fps", F.lit(0).cast("long"), lambda a, b: a + b).alias(
            "fps_sum"
        ),
    ).orderBy("doc_id")


def _winnow_sql(k: int = 4, w: int = 5) -> str:
    from polar_spark.operators.dedup import _P31, _polyhash_sql
    from polar_spark.operators.text import _WIN_POS_BITS, SPAN_B

    pos_mul = 1 << _WIN_POS_BITS
    # mirror text.winnow_fingerprints: token polyhash once, k-wide
    # second-level fold per position, (hash·2^20 + pos) keys, min per
    # w-window (DuckDB list slices clamp at the list end exactly like
    # the operator's F.least(w, nk-s+1) slice length), >> to recover
    # the hash, distinct, sum (order-independent checksum)
    return f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
th AS (SELECT doc_id, list_transform(t, x -> {_polyhash_sql("x")}) AS ths FROM toks),
kg AS (SELECT doc_id,
        CASE WHEN len(ths) >= {k} THEN
          list_transform(range(1, len(ths) - {k} + 2),
            p -> list_reduce(list_prepend(0::BIGINT, ths[p:p+{k - 1}]),
                             (acc, hv) -> (acc * {SPAN_B} + hv) % {_P31}))
        ELSE []::BIGINT[] END AS kgs
       FROM th),
keyed AS (SELECT doc_id, len(kgs) AS nk,
        list_transform(range(1, len(kgs) + 1), p -> kgs[p] * {pos_mul} + p) AS ks
       FROM kg),
win AS (SELECT doc_id, nk,
        CASE WHEN nk >= 1 THEN
          list_distinct(list_transform(
            range(1, greatest(nk - {w - 1}, 1) + 1),
            s -> list_min(ks[s:s+{w - 1}]) >> {_WIN_POS_BITS}))
        ELSE []::BIGINT[] END AS fps
       FROM keyed)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(nk AS BIGINT) AS n_kgrams,
       CAST(len(fps) AS BIGINT) AS n_fps,
       CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS fps_sum
FROM win ORDER BY doc_id
"""


ORACLES.update({"winnow_fp": _winnow_sql()})
QUERIES.update({"winnow_fp": q_winnow_fp})


def q_adamic_adar5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar + resource-allocation link prediction on the
    co-order graph: degree-weighted common-neighbor scores for
    NON-adjacent pairs (top-5 per vertex) — the wedge-enumeration plan
    of `link_prediction5` with 1/ln(deg) center weights.  Scores are
    integer-exact (floor(1e9/ln d) summed as BIGINT) so ranking ties
    break identically across engines and partitionings — float sums
    are order-dependent; scaled-integer sums are not."""
    sym = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    deg = sym.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("dw"))
    su = sym.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    sv = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    scores = (
        su.join(sv, "w")
        .where((F.col("u") < F.col("v")) & (F.col("u") < 400) & (F.col("v") < 400))
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(
            F.sum(F.floor(F.lit(1e9) / F.log("dw"))).alias("aa_scaled"),
            F.sum(F.floor(F.lit(1e9) / F.col("dw"))).alias("ra_scaled"),
            F.count("*").alias("cn"),
        )
    )
    non_edges = scores.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    win = Window.partitionBy("u").orderBy(F.desc("aa_scaled"), F.asc("v"))
    return (
        non_edges.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= 5)
        .select(
            "u",
            "v",
            F.col("aa_scaled").cast("long"),
            F.col("ra_scaled").cast("long"),
            F.col("cn").cast("long"),
            "rnk",
        )
        .orderBy("u", "rnk")
    )


_ADAMIC_ADAR_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS w, COUNT(*) AS dw FROM e GROUP BY src),
wedges AS (SELECT a.src AS w, a.dst AS u, b.dst AS v
           FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
           WHERE a.dst < 400 AND b.dst < 400),
sc AS (SELECT u, v,
         SUM(CAST(FLOOR(1e9 / LN(dw)) AS BIGINT)) AS aa_scaled,
         SUM(CAST(FLOOR(1e9 / dw) AS BIGINT)) AS ra_scaled,
         COUNT(*) AS cn
       FROM wedges JOIN deg USING (w) GROUP BY u, v),
ne AS (SELECT sc.* FROM sc LEFT JOIN e ON e.src = sc.u AND e.dst = sc.v
       WHERE e.src IS NULL),
ranked AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY u ORDER BY aa_scaled DESC, v ASC) AS rnk FROM ne)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(aa_scaled AS BIGINT) AS aa_scaled,
       CAST(ra_scaled AS BIGINT) AS ra_scaled,
       CAST(cn AS BIGINT) AS cn, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5 ORDER BY u, rnk
"""


ORACLES.update({"adamic_adar5": _ADAMIC_ADAR_SQL})
QUERIES.update({"adamic_adar5": q_adamic_adar5})


def q_pseudo_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep BFS pseudo-diameter of the (symmetrized) co-order
    graph: eccentricity of the farthest vertex from the minimum id —
    the diameter lower bound two O(E) sweeps buy instead of all-pairs
    BFS."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    return pregel.pseudo_diameter(e, max_depth=12)


_PSEUDO_DIAMETER_SQL = f"""
WITH RECURSIVE {_COORDER_SQL},
{_SYM_SQL},
s0 AS (SELECT MIN(src) AS s FROM e),
r1(id, d) AS (
    SELECT s, 0 FROM s0
    UNION
    SELECT e.dst, r1.d + 1 FROM r1 JOIN e ON e.src = r1.id WHERE r1.d < 12),
d1 AS (SELECT id, MIN(d) AS d FROM r1 GROUP BY id),
far1 AS (SELECT id, d FROM d1 ORDER BY d DESC, id ASC LIMIT 1),
r2(id, d) AS (
    SELECT id, 0 FROM far1
    UNION
    SELECT e.dst, r2.d + 1 FROM r2 JOIN e ON e.src = r2.id WHERE r2.d < 12),
d2 AS (SELECT id, MIN(d) AS d FROM r2 GROUP BY id),
far2 AS (SELECT id, d FROM d2 ORDER BY d DESC, id ASC LIMIT 1)
SELECT CAST((SELECT s FROM s0) AS BIGINT) AS start_id,
       CAST((SELECT COUNT(*) FROM d1) AS BIGINT) AS reached,
       CAST((SELECT id FROM far1) AS BIGINT) AS far_id,
       CAST((SELECT d FROM far1) AS BIGINT) AS ecc1,
       CAST((SELECT id FROM far2) AS BIGINT) AS far2_id,
       CAST((SELECT d FROM far2) AS BIGINT) AS pseudo_diameter
"""


ORACLES.update({"pseudo_diameter": _PSEUDO_DIAMETER_SQL})
QUERIES.update({"pseudo_diameter": q_pseudo_diameter})


def q_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level exact-substring dedup with corpus rewrite over the
    documents table: per-doc kept/removed block counts plus the sha256
    of the reassembled cleaned text (cross-engine content identity —
    the per-row invariant family)."""
    from polar_spark.operators.text import block_dedup

    out = block_dedup(
        load_table(spark, "documents", sf_dir), "text", "doc_id", block=4
    )
    return out.select(
        F.col("doc_id").cast("long"),
        "n_blocks",
        "n_kept",
        "n_removed",
        F.sha2("clean_text", 256).alias("clean_sha"),
    ).orderBy("doc_id")


def _block_dedup_sql(block: int = 4, min_occ: int = 2) -> str:
    from polar_spark.operators.dedup import _polyhash_sql

    return f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
b AS (SELECT doc_id, p AS idx,
        array_to_string(t[p*{block}+1 : p*{block}+{block}], ' ') AS btxt
      FROM toks,
      UNNEST(range(0, CAST(CEIL(len(t) / {block}.0) AS BIGINT))) AS u(p)),
h AS (SELECT doc_id, idx, btxt, {_polyhash_sql("btxt")} AS bh FROM b),
c AS (SELECT bh, COUNT(*) AS occ FROM h GROUP BY bh),
kept AS (SELECT doc_id, idx, btxt FROM h JOIN c USING (bh) WHERE occ < {min_occ}),
tot AS (SELECT doc_id, COUNT(*) AS n_blocks FROM h GROUP BY doc_id),
cl AS (SELECT doc_id, COUNT(*) AS n_kept,
              string_agg(btxt, ' ' ORDER BY idx) AS clean_text
       FROM kept GROUP BY doc_id)
SELECT CAST(tot.doc_id AS BIGINT) AS doc_id,
       CAST(n_blocks AS BIGINT) AS n_blocks,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       CAST(n_blocks - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
       sha256(COALESCE(clean_text, '')) AS clean_sha
FROM tot LEFT JOIN cl ON cl.doc_id = tot.doc_id ORDER BY doc_id
"""


ORACLES.update({"block_dedup": _block_dedup_sql()})
QUERIES.update({"block_dedup": q_block_dedup})


_BM25_QUERIES = [
    ("q0", "table scan fast"),
    ("q1", "join merge batch"),
    ("q2", "stream window agg"),
    ("q3", "customer order value"),
    ("q4", "spark query key sort"),
]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval over the documents corpus for a fixed
    5-query panel — inverted-index scoring with the query-term table
    broadcast, per-term contributions floored to scaled BIGINTs so
    scores are order-independent integer sums (see text.bm25_topk)."""
    from polar_spark.operators.text import bm25_topk

    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    return bm25_topk(load_table(spark, "documents", sf_dir), qdf)


def _bm25_sql(k1: float = 1.2, b: float = 0.75, scale: int = 1_000_000) -> str:
    vals = ", ".join(f"('{q}', '{t}')" for q, t in _BM25_QUERIES)
    # float constants mirror the Spark expression bit-for-bit: repr()
    # is the shortest round-tripping form of the python-computed double
    return f"""
WITH q(query_id, qtext) AS (VALUES {vals}),
toks AS (SELECT doc_id AS _id, UNNEST(string_split(trim(text), ' ')) AS term
         FROM documents),
postings AS (SELECT _id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT _id, COUNT(*) AS dl FROM toks GROUP BY 1),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS L FROM dl),
dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
qt AS (SELECT DISTINCT query_id, UNNEST(string_split(trim(qtext), ' ')) AS term
       FROM q),
sc AS (SELECT query_id, _id,
         SUM(CAST(FLOOR({float(scale)!r} * LN(1.0 + (n - df + 0.5) / (df + 0.5))
             * (tf * {k1 + 1.0!r})
             / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl * n / L)))
             AS BIGINT)) AS score_scaled,
         COUNT(*) AS n_hit_terms
       FROM postings JOIN qt USING (term) JOIN dft USING (term)
            JOIN dl USING (_id), st
       GROUP BY 1, 2),
ranked AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY score_scaled DESC, _id ASC) AS rnk
           FROM sc)
SELECT query_id, CAST(_id AS BIGINT) AS doc_id,
       CAST(score_scaled AS BIGINT) AS score_scaled,
       CAST(n_hit_terms AS BIGINT) AS n_hit_terms, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk
"""


ORACLES.update({"bm25_search": _bm25_sql()})
QUERIES.update({"bm25_search": q_bm25_search})


def q_nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier: trained on the
    deterministic 80% hash split, scored over every document —
    integer-exact counts and scaled-BIGINT log-probabilities make
    train AND predict bit-reproducible (see classify.nb_classify)."""
    from polar_spark.operators.classify import nb_classify

    return nb_classify(load_table(spark, "documents", sf_dir)).orderBy("doc_id")


def _nb_cte_body(scale: int = 1_000_000, train_bp: int = 8000, seed: int = 0) -> str:
    """The shared NB train+score CTE chain (through the per-(doc, class)
    score table ``sc``) — composed by both the classifier oracle and the
    margin-calibration oracle, mirroring classify.nb_class_scores."""
    return f"""base AS (
  SELECT doc_id AS _id, lang AS label, string_split(trim(text), ' ') AS t,
         CASE WHEN xor(x1, x1 >> 17) % 10000 < {train_bp} THEN 1 ELSE 0 END
           AS is_train
  FROM (SELECT *, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1
        FROM (SELECT *, (doc_id * 2654435761 + {seed}) % 2147483648 AS x0
              FROM documents) a) b),
toks AS (SELECT _id, label, is_train, UNNEST(t) AS tok FROM base),
tr AS (SELECT * FROM toks WHERE is_train = 1),
c_lt AS (SELECT label AS cls, tok, COUNT(*) AS c FROM tr GROUP BY 1, 2),
tot_l AS (SELECT label AS cls, COUNT(*) AS tot FROM tr GROUP BY 1),
vv AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM tr),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base WHERE is_train = 1),
nl AS (SELECT label AS cls, COUNT(*) AS nl FROM base WHERE is_train = 1
       GROUP BY 1),
llp AS (SELECT cls, tok,
          CAST(FLOOR({float(scale)!r} * LN((c + 1.0) / (tot + v))) AS BIGINT)
            AS llp
        FROM c_lt JOIN tot_l USING (cls), vv),
ls AS (SELECT cls,
         CAST(FLOOR({float(scale)!r} * LN(1.0 / (tot + v))) AS BIGINT)
           AS default_llp,
         CAST(FLOOR({float(scale)!r} * LN(nl / n)) AS BIGINT) AS prior
       FROM tot_l JOIN nl USING (cls), vv, nd),
sc AS (SELECT _id, cls,
         SUM(COALESCE(llp, default_llp)) + ANY_VALUE(prior) AS score_scaled
       FROM toks CROSS JOIN ls LEFT JOIN llp USING (cls, tok)
       GROUP BY 1, 2)"""


def _nb_sql(scale: int = 1_000_000, train_bp: int = 8000, seed: int = 0) -> str:
    return f"""
WITH {_nb_cte_body(scale, train_bp, seed)},
pred AS (SELECT _id, cls AS pred, score_scaled FROM
           (SELECT *, ROW_NUMBER() OVER
              (PARTITION BY _id ORDER BY score_scaled DESC, cls ASC) AS rnk
            FROM sc) WHERE rnk = 1)
SELECT CAST(b._id AS BIGINT) AS doc_id, b.label, p.pred,
       CAST(CASE WHEN b.label = p.pred THEN 1 ELSE 0 END AS BIGINT) AS correct,
       CAST(b.is_train AS BIGINT) AS is_train,
       CAST(p.score_scaled AS BIGINT) AS score_scaled
FROM base b JOIN pred p ON p._id = b._id ORDER BY doc_id
"""


ORACLES.update({"nb_lang_classify": _nb_sql()})
QUERIES.update({"nb_lang_classify": q_nb_lang_classify})


def q_densest_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(2+2ε)-approx densest subgraph (ε=0.5) of the co-order graph by
    Bahmani-style parallel peeling — per-vertex peel round + membership
    of the densest prefix; integer-exact schedule (see
    pregel.densest_subgraph)."""
    e = _sym(coorder_edges(spark, sf_dir))
    out, _ = pregel.densest_subgraph(e, eps_num=3, eps_den=2)
    return out.orderBy("id")


def _densest_sql(n_rounds: int = 28, eps_num: int = 3, eps_den: int = 2) -> str:
    # MATERIALIZED: each round references `e`/`v{r}` several times —
    # without it DuckDB inlines the CTE and re-opens the parquet per
    # reference, blowing the fd limit at 28 unrolled rounds
    parts = [
        _COORDER_SQL.strip().rstrip(","),
        _SYM_SQL.replace("e AS (", "e AS MATERIALIZED (", 1),
        "v1 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e)",
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (SELECT v.id, COUNT(ee.src) AS deg
  FROM v{r} v LEFT JOIN (SELECT a.src, a.dst FROM e a
       JOIN v{r} x ON a.src = x.id JOIN v{r} y ON a.dst = y.id) ee
    ON ee.src = v.id GROUP BY v.id)"""
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT COUNT(*) AS nv, "
            f"COALESCE(SUM(deg), 0) AS m2 FROM d{r})"
        )
        parts.append(
            f"rm{r} AS MATERIALIZED (SELECT id FROM d{r}, s{r} "
            f"WHERE deg * nv * {eps_den} <= m2 * {eps_num})"
        )
        parts.append(
            f"v{r + 1} AS MATERIALIZED "
            f"(SELECT id FROM v{r} EXCEPT SELECT id FROM rm{r})"
        )
    stats_union = " UNION ALL ".join(
        f"SELECT {r} AS rnd, nv, m2 FROM s{r}" for r in range(1, n_rounds + 1)
    )
    peel_union = " UNION ALL ".join(
        f"SELECT id, {r} AS peel_round FROM rm{r}" for r in range(1, n_rounds + 1)
    )
    parts.append(f"stats AS ({stats_union})")
    parts.append(
        """best AS (SELECT rnd FROM stats s1 WHERE s1.nv > 0 AND NOT EXISTS (
  SELECT 1 FROM stats s2 WHERE s2.nv > 0 AND
    (s2.m2 * s1.nv > s1.m2 * s2.nv OR
     (s2.m2 * s1.nv = s1.m2 * s2.nv AND s2.rnd < s1.rnd))))"""
    )
    parts.append(f"peeled AS ({peel_union})")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(p.id AS BIGINT) AS id, CAST(p.peel_round AS BIGINT) AS peel_round,
       CAST(CASE WHEN p.peel_round >= b.rnd THEN 1 ELSE 0 END AS BIGINT)
         AS in_densest
FROM peeled p, best b ORDER BY id
"""
    )


ORACLES.update({"densest_sub": _densest_sql()})
QUERIES.update({"densest_sub": q_densest_sub})


def q_bfs_relabel_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS locality relabeling of the co-order graph (WebGraph ordering
    posture) + per-vertex delta-encoded adjacency cost: bits to gap-
    encode each sorted neighbor list under the OLD ids vs the NEW BFS
    ids (zigzag first gap vs the source, plain gaps after; cost =
    bit-length, length(bin(x)) in both engines).  The summary judges
    whether the reordering actually buys compression."""
    e = _sym(coorder_edges(spark, sf_dir))
    mapping = pregel.bfs_relabel(e, max_depth=32)

    def gap_bits(adj: DataFrame) -> DataFrame:
        w = Window.partitionBy("u").orderBy("n")
        g = adj.withColumn("p", F.lag("n").over(w))
        enc = F.when(
            F.col("p").isNull(),
            F.when(
                F.col("n") >= F.col("u"), 2 * (F.col("n") - F.col("u"))
            ).otherwise(2 * (F.col("u") - F.col("n")) + 1),
        ).otherwise(F.col("n") - F.col("p"))
        return g.groupBy("u").agg(
            F.count("*").alias("deg"),
            F.sum(F.length(F.bin(enc))).alias("bits"),
        )

    old_bits = gap_bits(e.select(F.col("src").alias("u"), F.col("dst").alias("n")))
    m1 = mapping.select(F.col("id").alias("src"), F.col("new_id").alias("u"))
    m2 = mapping.select(F.col("id").alias("dst"), F.col("new_id").alias("n"))
    new_bits = gap_bits(e.join(m1, "src").join(m2, "dst").select("u", "n"))
    return (
        mapping.join(
            old_bits.select(F.col("u").alias("id"), F.col("bits").alias("bits_old"), "deg"),
            "id",
        )
        .join(
            new_bits.select(F.col("u").alias("new_id"), F.col("bits").alias("bits_new")),
            "new_id",
        )
        .select(
            F.col("id").cast("long"),
            F.col("level").cast("long"),
            F.col("new_id").cast("long"),
            F.col("deg").cast("long"),
            F.col("bits_old").cast("long"),
            F.col("bits_new").cast("long"),
        )
        .orderBy("id")
    )


_BFS_RELABEL_SQL = f"""
WITH RECURSIVE {_COORDER_SQL},
{_SYM_SQL},
s0 AS (SELECT MIN(src) AS s FROM e),
r1(id, d) AS (
    SELECT s, 0 FROM s0
    UNION
    SELECT e.dst, r1.d + 1 FROM r1 JOIN e ON e.src = r1.id WHERE r1.d < 32),
lvl AS (SELECT id, MIN(d) AS level FROM r1 GROUP BY id),
verts AS (SELECT DISTINCT src AS id FROM e),
lv AS (SELECT v.id, COALESCE(lvl.level, 33) AS level
       FROM verts v LEFT JOIN lvl ON lvl.id = v.id),
map AS (SELECT id, level,
          ROW_NUMBER() OVER (ORDER BY level, id) - 1 AS new_id FROM lv),
go AS (SELECT src AS u, dst AS n, LAG(dst) OVER
         (PARTITION BY src ORDER BY dst) AS p FROM e),
bo AS (SELECT u, COUNT(*) AS deg, SUM(length(bin(
         CASE WHEN p IS NULL THEN
           CASE WHEN n >= u THEN 2 * (n - u) ELSE 2 * (u - n) + 1 END
         ELSE n - p END))) AS bits FROM go GROUP BY u),
en AS (SELECT m1.new_id AS u, m2.new_id AS n
       FROM e JOIN map m1 ON e.src = m1.id JOIN map m2 ON e.dst = m2.id),
gn AS (SELECT u, n, LAG(n) OVER (PARTITION BY u ORDER BY n) AS p FROM en),
bn AS (SELECT u, SUM(length(bin(
         CASE WHEN p IS NULL THEN
           CASE WHEN n >= u THEN 2 * (n - u) ELSE 2 * (u - n) + 1 END
         ELSE n - p END))) AS bits FROM gn GROUP BY u)
SELECT CAST(map.id AS BIGINT) AS id, CAST(map.level AS BIGINT) AS level,
       CAST(map.new_id AS BIGINT) AS new_id, CAST(bo.deg AS BIGINT) AS deg,
       CAST(bo.bits AS BIGINT) AS bits_old, CAST(bn.bits AS BIGINT) AS bits_new
FROM map JOIN bo ON bo.u = map.id JOIN bn ON bn.u = map.new_id
ORDER BY id
"""


ORACLES.update({"bfs_relabel_gaps": _BFS_RELABEL_SQL})
QUERIES.update({"bfs_relabel_gaps": q_bfs_relabel_gaps})


def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption over the documents table: deterministic
    hash-coin masking, contiguous runs collapsed to sentinels, input
    and target texts reassembled in token order (see
    text.span_corruption)."""
    from polar_spark.operators.text import span_corruption

    return span_corruption(load_table(spark, "documents", sf_dir)).orderBy(
        "doc_id"
    )


def _span_corrupt_sql(mask_rate_bp: int = 1500, seed: int = 11) -> str:
    key = "(_id * 8191 + pos % 8191)"
    x0 = f"(({key} * 2654435761 + {seed}) % 2147483648)"
    x1 = f"((xor({x0}, {x0} >> 13) * 1274126177) % 2147483648)"
    coin = f"(xor({x1}, {x1} >> 17) % 10000)"
    return f"""
WITH toks0 AS (SELECT doc_id AS _id, string_split(trim(text), ' ') AS t
               FROM documents),
toks1 AS (SELECT _id, p AS pos, t[p + 1] AS tok
          FROM toks0, UNNEST(range(0, len(t))) AS u(p)),
toks2 AS (SELECT _id, pos, tok,
            CASE WHEN {coin} < {mask_rate_bp} THEN 1 ELSE 0 END AS masked
          FROM toks1),
toks3 AS (SELECT *, CASE WHEN masked = 1 AND COALESCE(LAG(masked) OVER
              (PARTITION BY _id ORDER BY pos), 0) = 0 THEN 1 ELSE 0 END
            AS is_head FROM toks2),
toks4 AS (SELECT *, CASE WHEN masked = 1 THEN SUM(is_head) OVER
              (PARTITION BY _id ORDER BY pos ROWS UNBOUNDED PRECEDING) - 1
            END AS span FROM toks3),
agg AS (SELECT _id, COUNT(*) AS n_tokens, SUM(masked) AS n_masked,
          COALESCE(MAX(span), -1) + 1 AS n_spans,
          string_agg(CASE WHEN masked = 0 THEN tok
                          WHEN is_head = 1 THEN '<extra_id_' || span || '>'
                     END, ' ' ORDER BY pos) AS input_text,
          string_agg(CASE WHEN is_head = 1
                            THEN '<extra_id_' || span || '> ' || tok
                          WHEN masked = 1 THEN tok
                     END, ' ' ORDER BY pos) AS target_text
        FROM toks4 GROUP BY _id)
SELECT CAST(_id AS BIGINT) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_masked AS BIGINT) AS n_masked, CAST(n_spans AS BIGINT) AS n_spans,
       COALESCE(input_text, '') AS input_text,
       CASE WHEN n_spans > 0
            THEN COALESCE(target_text, '') || ' <extra_id_' || n_spans || '>'
            ELSE '' END AS target_text
FROM agg ORDER BY doc_id
"""


ORACLES.update({"span_corrupt": _span_corrupt_sql()})
QUERIES.update({"span_corrupt": q_span_corrupt})


def q_suffix_ranks40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed suffix-array ranks (prefix doubling) over the token
    stream of docs 0..39 — the exact-substring-dedup index machinery.
    The oracle is INDEPENDENT, not a replay: DuckDB sorts the actual
    suffix strings directly (token-sequence order coincides with
    space-joined string order because ' ' < every token character), so
    agreement here validates the doubling algorithm itself."""
    from polar_spark.operators.text import suffix_ranks

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 40)
    return suffix_ranks(docs).orderBy("pos")


_SUFFIX_RANKS_SQL = """
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t
           FROM documents WHERE doc_id < 40),
off AS (SELECT doc_id, t, COALESCE(SUM(len(t)) OVER
          (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          0) AS o FROM d),
toks AS (SELECT doc_id, o + p AS pos, t[p + 1] AS tok
         FROM off, UNNEST(range(0, len(t))) AS u(p)),
s AS (SELECT list(tok ORDER BY pos) AS arr FROM toks)
SELECT CAST(pos AS BIGINT) AS pos, CAST(doc_id AS BIGINT) AS doc_id, tok,
       CAST(DENSE_RANK() OVER
         (ORDER BY array_to_string(arr[pos + 1:], ' ')) AS BIGINT) AS rank
FROM toks, s ORDER BY pos
"""


ORACLES.update({"suffix_ranks40": _SUFFIX_RANKS_SQL})
QUERIES.update({"suffix_ranks40": q_suffix_ranks40})


def q_bpe_train8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 8-round BPE tokenizer training over the documents corpus:
    per-word final segmentation after the learned merge schedule (ties
    → lexicographically smallest pair; greedy left-to-right merge
    application — see text.bpe_train)."""
    from polar_spark.operators.text import bpe_train

    out, _ = bpe_train(load_table(spark, "documents", sf_dir), n_merges=8)
    return out.orderBy("word")


def _bpe_sql(n_merges: int = 8) -> str:
    sep = "chr(31)"
    parts = [
        """w0 AS MATERIALIZED (
  SELECT word, COUNT(*) AS cnt,
         array_to_string(string_split(word, ''), chr(31)) AS cur
  FROM (SELECT UNNEST(string_split(trim(text), ' ')) AS word FROM documents)
  GROUP BY word)"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT l[i] AS a, l[i + 1] AS b, SUM(cnt) AS c
  FROM (SELECT cnt, string_split(cur, {sep}) AS l FROM w{r}),
       UNNEST(range(1, len(l))) AS t(i)
  GROUP BY 1, 2 ORDER BY c DESC, a ASC, b ASC LIMIT 1)"""
        )
        parts.append(
            f"""w{r + 1} AS MATERIALIZED (
  SELECT word, cnt,
    CASE WHEN p.a IS NULL THEN cur ELSE
      list_reduce(list_prepend('', string_split(cur, {sep})), (acc, s) ->
        CASE WHEN acc = '' THEN s
             WHEN (acc = p.a OR ends_with(acc, {sep} || p.a)) AND s = p.b
               THEN left(acc, length(acc) - length(p.a)) || p.a || p.b
             ELSE acc || {sep} || s END)
    END AS cur
  FROM w{r} LEFT JOIN p{r} p ON TRUE)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT word, CAST(cnt AS BIGINT) AS cnt,
       replace(cur, {sep}, ' ') AS seg,
       CAST(len(string_split(cur, {sep})) AS BIGINT) AS n_syms
FROM w{n_merges} ORDER BY word
""",
        parts,
    )


ORACLES.update({"bpe_train8": _bpe_sql()[0]})
QUERIES.update({"bpe_train8": q_bpe_train8})


def q_bpe_encode8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every document with the 8-merge
    BPE model just trained on the same corpus — the train→apply
    composition a real pipeline runs.  The model is the vocab-sized
    word→segmentation table broadcast onto one corpus explode; output
    is per-doc whitespace vs BPE token counts (the packing/accounting
    input)."""
    from polar_spark.operators.text import bpe_train

    docs = load_table(spark, "documents", sf_dir)
    words, _ = bpe_train(docs, n_merges=8)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    )
    return (
        toks.join(F.broadcast(words.select("word", "n_syms")), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("ws_tokens"),
            F.sum("n_syms").alias("bpe_tokens"),
        )
        .select(
            F.col("doc_id").cast("long"),
            F.col("ws_tokens").cast("long"),
            F.col("bpe_tokens").cast("long"),
        )
        .orderBy("doc_id")
    )


def _bpe_encode_sql(n_merges: int = 8) -> str:
    _, parts = _bpe_sql(n_merges)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(string_split(cur, chr(31)))) AS BIGINT) AS bpe_tokens
FROM (SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS word
      FROM documents) t
JOIN w{n_merges} USING (word)
GROUP BY doc_id ORDER BY doc_id
"""
    )


ORACLES.update({"bpe_encode8": _bpe_encode_sql()})
QUERIES.update({"bpe_encode8": q_bpe_encode8})


def q_kmeanspp_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| scalable seeding over the embeddings table (Bahmani
    et al. 2012): 3 oversampling rounds at l=4, integer-exact Bernoulli
    schedule, per-candidate nearest-point weights (see
    similarity.kmeans_parallel_init)."""
    from polar_spark.operators.similarity import kmeans_parallel_init

    return kmeans_parallel_init(load_table(spark, "embeddings", sf_dir))


def _kmeanspp_sql(
    l: int = 4, rounds: int = 3, seed: int = 5, scale: int = 2**20
) -> str:
    def d2(vx: str, vc: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform("
            f"range(1, len({vx}) + 1), i -> ({vx}[i] - {vc}[i]) * "
            f"({vx}[i] - {vc}[i]))), (acc, x) -> acc + x)"
        )

    def bucket(key: str) -> str:
        x0 = f"(({key}) * 2654435761 + {seed}) % 2147483648"
        x1 = f"((xor(({x0}), ({x0}) >> 13)) * 1274126177) % 2147483648"
        return f"(xor(({x1}), ({x1}) >> 17) % 10000)"

    parts = [
        """b AS MATERIALIZED (SELECT vec_id AS id,
  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)""",
        """c0 AS MATERIALIZED (SELECT id AS cand_id, 0 AS round_added, v
  FROM b ORDER BY id LIMIT 1)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""k{r} AS MATERIALIZED (
  SELECT b.id, CAST(FLOOR({float(scale)!r} * MIN({d2('b.v', 'c.v')}))
    AS BIGINT) AS cost
  FROM b, c{r - 1} c GROUP BY b.id)"""
        )
        parts.append(f"t{r} AS (SELECT SUM(cost) AS total FROM k{r})")
        parts.append(
            f"""s{r} AS MATERIALIZED (
  SELECT b.id, b.v FROM b JOIN k{r} USING (id), t{r}
  WHERE {bucket(f'b.id * 131 + {r}')} <
        LEAST(({l * 10000} * cost) // NULLIF(total, 0), 10000)
    AND b.id NOT IN (SELECT cand_id FROM c{r - 1}))"""
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT * FROM c{r - 1} UNION ALL SELECT id, {r}, v FROM s{r})"""
        )
    parts.append(
        f"""nearest AS (SELECT id, cand_id FROM (
  SELECT b.id, c.cand_id, ROW_NUMBER() OVER (PARTITION BY b.id
    ORDER BY {d2('b.v', 'c.v')}, c.cand_id) AS rn
  FROM b, c{rounds} c) WHERE rn = 1)"""
    )
    parts.append(
        "w AS (SELECT cand_id, COUNT(*) AS weight FROM nearest GROUP BY 1)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(c.cand_id AS BIGINT) AS cand_id,
       CAST(c.round_added AS BIGINT) AS round_added,
       CAST(COALESCE(w.weight, 0) AS BIGINT) AS weight
FROM c{rounds} c LEFT JOIN w USING (cand_id) ORDER BY cand_id
"""
    )


ORACLES.update({"kmeanspp_seed": _kmeanspp_sql()})
QUERIES.update({"kmeanspp_seed": q_kmeanspp_seed})


def q_wl_colors3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round Weisfeiler-Lehman color refinement on the co-order
    graph — per-vertex structural fingerprints (see pregel.wl_colors)."""
    e = _sym(coorder_edges(spark, sf_dir))
    return pregel.wl_colors(e, rounds=3).orderBy("id")


def _wl_sql(rounds: int = 3) -> str:
    parts = [
        _COORDER_SQL.strip().rstrip(","),
        _SYM_SQL.replace("e AS (", "e AS MATERIALIZED (", 1),
        "c0 AS MATERIALIZED (SELECT src AS id, COUNT(*) AS col FROM e GROUP BY src)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""s{r} AS MATERIALIZED (
  SELECT e.src AS id, string_agg(c.col, ',' ORDER BY c.col) AS sig
  FROM e JOIN c{r - 1} c ON c.id = e.dst GROUP BY e.src)"""
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT c.id, DENSE_RANK() OVER (ORDER BY c.col, s.sig) AS col
  FROM c{r - 1} c JOIN s{r} s USING (id))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(id AS BIGINT) AS id, CAST(col AS BIGINT) AS color
FROM c{rounds} ORDER BY id
"""
    )


ORACLES.update({"wl_colors3": _wl_sql()})
QUERIES.update({"wl_colors3": q_wl_colors3})


# ---------------------------------------------------------------------------
# round-5 session additions: vertex cover, bipartiteness audit, robust
# outliers (MAD), exact AUC (Mann-Whitney), HyperLogLog distinct counts,
# reciprocal-rank-fusion hybrid retrieval


def q_vertex_cover2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-approximation vertex cover = endpoints of a maximal matching
    (Gavril/Yannakakis — the classic primal-dual bound): reuses
    pregel.maximal_matching on the bounded co-part graph, so the cover
    inherits the O(log E)-round mutual-proposal schedule and the SQL
    oracle wraps the identical 12-round unrolled matching replay.
    Every edge has >= 1 endpoint in the cover (tested), and |cover| <=
    2 OPT.  Reference posture: minimal guard sets over the dependency
    graph (which vertices to monitor so every edge is observed)."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    m, _stats = pregel.maximal_matching(und)
    return (
        m.select(F.col("a").alias("v"))
        .unionByName(m.select(F.col("b").alias("v")))
        .distinct()
        .select(F.col("v").cast("long").alias("v"))
        .orderBy("v")
    )


_VCOVER_SQL = f"""
WITH m AS ({_matching_sql(12)})
SELECT DISTINCT CAST(v AS BIGINT) AS v
FROM (SELECT a AS v FROM m UNION ALL SELECT b FROM m) t
ORDER BY v
"""


def q_bipartite_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component bipartiteness audit (pregel.bipartite_report) over
    a deliberately heterogeneous graph: the order->part incidence slice
    (bipartite by construction, part ids offset into a disjoint range)
    unioned with the dense co-part core (odd cycles).  BFS 2-coloring
    from every component representative SIMULTANEOUSLY (seeds come from
    a join, not a collect), one edge-side parity join — a component is
    bipartite iff no edge connects equal BFS-layer parity.  The oracle
    replays components, the multi-seed BFS, and the parity count with
    two recursive CTEs."""
    li = load_table(spark, "lineitem", sf_dir)
    inc = (
        li.where(F.col("l_orderkey") % 97 == 0)
        .select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    cop = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .where((F.col("a.l_partkey") < 60) & (F.col("b.l_partkey") < 60))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    return pregel.bipartite_report(inc.unionByName(cop)).orderBy("comp")


_BIPARTITE_SQL = """
WITH RECURSIVE
inc AS (SELECT DISTINCT l_orderkey AS src, l_partkey + 10000000 AS dst
        FROM lineitem WHERE l_orderkey % 97 = 0),
cop AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey < 60 AND b.l_partkey < 60),
und AS (SELECT src, dst FROM inc UNION SELECT src, dst FROM cop),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
verts AS (SELECT DISTINCT src AS id FROM e),
reach(id, comp) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id WHERE r.comp < e.dst
),
c AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
bfs(id, d) AS (
    SELECT comp, 0 FROM (SELECT DISTINCT comp FROM c) s
    UNION
    SELECT e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.id WHERE b.d < 64
),
dist AS MATERIALIZED (SELECT id, MIN(d) AS d FROM bfs GROUP BY id),
ep AS (SELECT c.comp,
              CASE WHEN d1.d % 2 = d2.d % 2 THEN 1 ELSE 0 END AS odd
       FROM und
       JOIN c ON c.id = und.src
       JOIN dist d1 ON d1.id = und.src
       JOIN dist d2 ON d2.id = und.dst)
SELECT CAST(ep.comp AS BIGINT) AS comp,
       nv.n_vertices,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(odd) AS BIGINT) AS odd_edges,
       SUM(odd) = 0 AS is_bipartite
FROM ep
JOIN (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_vertices FROM c GROUP BY comp) nv
  ON nv.comp = ep.comp
GROUP BY ep.comp, nv.n_vertices
ORDER BY comp
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (median
    absolute deviation) of the event value, outliers = deviation >
    3 * MAD — the robust z-score every telemetry pipeline runs before
    alerting (Polar's metrics actors threshold raw counters; this is
    the distribution-aware form).  CROSS-ENGINE-EXACT BY CONSTRUCTION:
    values are scaled to BIGINT micro-units first, so every percentile
    interpolation lands on exact binary fractions (halves/quarters)
    and the > comparison can never flip on a ulp.  Three passes, each
    one group-aggregate with the tiny stats table broadcast back."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.floor(F.col("value") * 1e6 + F.lit(0.5)).alias("v6")
    )
    med = ev.groupBy("event_type").agg(F.percentile("v6", 0.5).alias("med6"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med6", F.abs(F.col("v6") - F.col("med6")).alias("dev6")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med6").alias("med6"),
        F.percentile("dev6", 0.5).alias("mad6"),
        F.count("*").alias("n"),
    )
    flagged = dev.select("event_type", "dev6").join(
        F.broadcast(mad.select("event_type", "mad6")), "event_type"
    )
    cnt = flagged.groupBy("event_type").agg(
        F.sum((F.col("dev6") > F.lit(3.0) * F.col("mad6")).cast("long")).alias(
            "n_outliers"
        )
    )
    return (
        mad.join(cnt, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            (F.col("med6") * 2).cast("long").alias("med6_x2"),
            (F.col("mad6") * 4).cast("long").alias("mad6_x4"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_MAD_SQL = """
WITH ev AS (SELECT event_type, CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v6
            FROM events),
med AS (SELECT event_type, quantile_cont(v6, 0.5) AS med6 FROM ev GROUP BY 1),
dev AS (SELECT ev.event_type, med.med6, ABS(ev.v6 - med.med6) AS dev6
        FROM ev JOIN med USING (event_type)),
mad AS (SELECT event_type, ANY_VALUE(med6) AS med6,
               quantile_cont(dev6, 0.5) AS mad6, COUNT(*) AS n
        FROM dev GROUP BY event_type),
cnt AS (SELECT dev.event_type,
               SUM(CASE WHEN dev.dev6 > 3.0 * mad.mad6 THEN 1 ELSE 0 END) AS n_outliers
        FROM dev JOIN mad USING (event_type) GROUP BY dev.event_type)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(med6 * 2 AS BIGINT) AS med6_x2,
       CAST(mad6 * 4 AS BIGINT) AS mad6_x4,
       CAST(n_outliers AS BIGINT) AS n_outliers
FROM mad JOIN cnt USING (event_type)
ORDER BY event_type
"""


def q_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the event value as a predictor of the
    'purchase' class — the Mann-Whitney U rank-sum identity
    (AUC = P(score_pos > score_neg) + P(=)/2), the quality-classifier
    calibration readout every filter-model pipeline needs.  INTEGER-
    EXACT end-to-end: values scale to BIGINT micro-units, ties get
    2x-midranks (always integer), and the rank prefix sum is the
    repo's TWO-PHASE distributed pattern (per-bucket totals on a
    monotone shiftright bucketing -> tiny bucket window -> within-
    bucket window) — no single-partition global window at any scale.
    u2 = 2*R_pos - n_pos*(n_pos+1) is the exact integer statistic;
    auc = u2 / (2*n_pos*n_neg)."""
    ev = load_table(spark, "events", sf_dir).select(
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).alias("v6"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    g = ev.groupBy("v6").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("np")
    )
    # two-phase prefix sum over ascending v6: shiftright(v6, 22) is
    # monotone in v6 -> bucket-level cumulative totals are a window
    # over a ~hundreds-row table, never the data
    g = g.withColumn("bkt", F.shiftright(F.col("v6"), 22))
    btot = g.groupBy("bkt").agg(F.sum("cnt").alias("btot"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bpre = btot.select("bkt", F.coalesce(F.sum("btot").over(wb), F.lit(0)).alias("bpre"))
    ww = (
        Window.partitionBy("bkt")
        .orderBy("v6")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        g.join(F.broadcast(bpre), "bkt")
        .withColumn("wpre", F.coalesce(F.sum("cnt").over(ww), F.lit(0)))
        .withColumn("cum_before", F.col("bpre") + F.col("wpre"))
        .withColumn("midrank2", F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1))
    )
    agg = ranked.agg(
        F.sum(F.col("np") * F.col("midrank2")).alias("r2"),
        F.sum("np").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).alias("n_neg"),
    )
    return agg.select(
        F.col("n_pos").cast("long"),
        F.col("n_neg").cast("long"),
        (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("long").alias("u2"),
        F.round(
            (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


_AUC_SQL = """
WITH ev AS (SELECT CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v6,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
            FROM events),
g AS (SELECT v6, COUNT(*) AS cnt, SUM(pos) AS np FROM ev GROUP BY v6),
ranked AS (SELECT v6, cnt, np,
                  COALESCE(SUM(cnt) OVER (ORDER BY v6
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM g),
agg AS (SELECT SUM(np * (2 * cum_before + cnt + 1)) AS r2,
               SUM(np) AS n_pos, SUM(cnt - np) AS n_neg
        FROM ranked)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       ROUND(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
             / (2.0 * n_pos * n_neg), 6) AS auc
FROM agg
"""


def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type
    (sketches.hll_registers/hll_estimate): 256 registers per group in
    ONE map-side-combinable max-aggregation — the bounded-state
    COUNT(DISTINCT) that merges across shards/batches.  The oracle
    replays the xorshift hash, bucket/rho split, register maxima, the
    integer harmonic reduction s2 = sum 2^(60-M_j), and the final
    estimate expression bit-for-bit."""
    from polar_spark.operators.sketches import hll_estimate, hll_registers

    ev = load_table(spark, "events", sf_dir)
    regs = hll_registers(ev, "user_id", "event_type")
    return hll_estimate(regs).orderBy("grp")


def _hll_sql(p: int = 8, seed: int = 0) -> str:
    m = 1 << p
    width = 31 - p
    from polar_spark.operators.sketches import HLL_ALPHA_256

    return f"""
WITH h0 AS (SELECT event_type AS grp,
                   (user_id * 2654435761 + {1000003 + seed}) % 2147483648 AS x0
            FROM events),
h1 AS (SELECT grp, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM h0),
h AS (SELECT grp, xor(x1, x1 >> 17) AS h FROM h1),
b AS (SELECT grp, h % {m} AS bucket, h >> {p} AS suffix FROM h),
r AS (SELECT grp, bucket,
             CASE WHEN suffix = 0 THEN {width + 1}
                  ELSE {width + 1} - LENGTH(bin(suffix)) END AS rho
      FROM b),
regs AS (SELECT grp, bucket, MAX(rho) AS m_j FROM r GROUP BY grp, bucket),
agg AS (SELECT grp, COUNT(*) AS present,
               SUM(CAST(1 AS BIGINT) << (50 - CAST(m_j AS INT))) AS s_present
        FROM regs GROUP BY grp),
est AS (SELECT grp, present,
               CAST({m} - present AS BIGINT) AS zeros,
               s_present + ({m} - present) * CAST(1125899906842624 AS BIGINT) AS s2
        FROM agg),
fin AS (SELECT grp, present, zeros, s2,
               CAST({HLL_ALPHA_256!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)
                 * CAST({float(2**50)!r} AS DOUBLE) / CAST(s2 AS DOUBLE) AS raw
        FROM est)
SELECT grp, CAST(present AS BIGINT) AS present, zeros, s2,
       ROUND(CASE WHEN raw <= CAST({2.5 * m!r} AS DOUBLE) AND zeros > 0
                  THEN CAST({float(m)!r} AS DOUBLE)
                       * LN(CAST({float(m)!r} AS DOUBLE) / CAST(zeros AS DOUBLE))
                  ELSE raw END, 4) AS est
FROM fin
ORDER BY grp
"""


_RRF_PANEL = (3, 11, 19, 27, 42)


def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack/Clarke/
    Buettcher SIGIR'09, the Elasticsearch/Vespa default): fuse BM25
    (lexical, text.bm25_topk over the documents corpus with the query
    document's own text as the query) and dense cosine top-20 (over
    the aligned embeddings table) with score = sum floor(1e9/(60+rank))
    — integer RRF so the fused ordering is engine-exact.  Self-hits
    are excluded from both arms; each arm contributes its top-20; the
    fused top-10 per query is returned.  At 100 TB both arms are
    already bounded (inverted-index join / ANN), and the fusion is a
    join on (query, doc) of two rank tables."""
    from polar_spark.operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    panel = list(_RRF_PANEL)
    qdf = docs.where(F.col("doc_id").isin(panel)).select(
        F.col("doc_id").cast("string").alias("query_id"), F.col("text").alias("qtext")
    )
    bm = (
        bm25_topk(docs, qdf, topk=21)
        .select(
            F.col("query_id").cast("long").alias("qid"),
            F.col("doc_id").alias("did"),
            "score_scaled",
        )
        .where(F.col("qid") != F.col("did"))
    )
    wb = Window.partitionBy("qid").orderBy(F.desc("score_scaled"), F.asc("did"))
    bm = bm.withColumn("brank", F.row_number().over(wb)).where(F.col("brank") <= 20)

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id").isin(panel)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        q.crossJoin(emb)
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("did"),
            (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
        )
    )
    wc = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("did"))
    co = scored.withColumn("crank", F.row_number().over(wc)).where(F.col("crank") <= 20)

    fused = (
        bm.select("qid", "did", "brank")
        .join(co.select("qid", "did", "crank"), ["qid", "did"], "full_outer")
        .select(
            "qid",
            "did",
            F.coalesce("brank", F.lit(0)).cast("long").alias("brank"),
            F.coalesce("crank", F.lit(0)).cast("long").alias("crank"),
        )
        .withColumn(
            "rrf",
            (
                F.when(
                    F.col("brank") > 0,
                    F.floor(F.lit(1e9) / (F.lit(60.0) + F.col("brank"))),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("crank") > 0,
                    F.floor(F.lit(1e9) / (F.lit(60.0) + F.col("crank"))),
                ).otherwise(F.lit(0))
            ).cast("long"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("did"))
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("long"))
        .where(F.col("rnk") <= 10)
        .select("qid", "did", "rrf", "brank", "crank", "rnk")
        .orderBy("qid", "rnk")
    )


def _rrf_sql(k1: float = 1.2, b: float = 0.75, scale: int = 1_000_000) -> str:
    panel = ", ".join(str(i) for i in _RRF_PANEL)
    return f"""
WITH toks AS (SELECT doc_id AS _id, UNNEST(string_split(trim(text), ' ')) AS term
              FROM documents),
postings AS (SELECT _id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT _id, COUNT(*) AS dl FROM toks GROUP BY 1),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS L FROM dl),
dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
qt AS (SELECT DISTINCT _id AS qid, term FROM toks WHERE _id IN ({panel})),
sc AS (SELECT qt.qid, p._id AS did,
         SUM(CAST(FLOOR({float(scale)!r} * LN(1.0 + (n - df + 0.5) / (df + 0.5))
             * (tf * {k1 + 1.0!r})
             / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl * n / L)))
             AS BIGINT)) AS score_scaled
       FROM postings p
       JOIN qt ON qt.term = p.term
       JOIN dft ON dft.term = p.term
       JOIN dl ON dl._id = p._id
       CROSS JOIN st
       WHERE p._id != qt.qid
       GROUP BY qt.qid, p._id),
bm AS (SELECT qid, did, rn AS brank FROM (
         SELECT qid, did, ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY score_scaled DESC, did ASC) AS rn
         FROM sc) t WHERE rn <= 20),
e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(UNNEST(embedding) AS DOUBLE) AS x
      FROM embeddings),
nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nn FROM e GROUP BY vec_id),
dots AS (SELECT a.vec_id AS qid, b.vec_id AS did, SUM(a.x * b.x) AS d
         FROM e a JOIN e b ON a.i = b.i AND a.vec_id IN ({panel})
          AND a.vec_id != b.vec_id
         GROUP BY a.vec_id, b.vec_id),
cosr AS (SELECT qid, did, d / (na.nn * nb.nn) AS cos
         FROM dots JOIN nrm na ON na.vec_id = qid JOIN nrm nb ON nb.vec_id = did),
co AS (SELECT qid, did, rn AS crank FROM (
         SELECT qid, did, ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY cos DESC, did ASC) AS rn
         FROM cosr) t WHERE rn <= 20),
fused AS (SELECT COALESCE(bm.qid, co.qid) AS qid,
                 COALESCE(bm.did, co.did) AS did,
                 COALESCE(brank, 0) AS brank, COALESCE(crank, 0) AS crank
          FROM bm FULL OUTER JOIN co ON bm.qid = co.qid AND bm.did = co.did),
rr AS (SELECT qid, did, brank, crank,
              (CASE WHEN brank > 0
                    THEN CAST(FLOOR(1e9 / (60.0 + brank)) AS BIGINT) ELSE 0 END
             + CASE WHEN crank > 0
                    THEN CAST(FLOOR(1e9 / (60.0 + crank)) AS BIGINT) ELSE 0 END)
              AS rrf
       FROM fused)
SELECT CAST(qid AS BIGINT) AS qid, CAST(did AS BIGINT) AS did, rrf,
       CAST(brank AS BIGINT) AS brank, CAST(crank AS BIGINT) AS crank,
       CAST(rn AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
          ORDER BY rrf DESC, did ASC) AS rn FROM rr) t
WHERE rn <= 10
ORDER BY qid, rnk
"""


ORACLES.update(
    {
        "vertex_cover2": _VCOVER_SQL,
        "bipartite_check": _BIPARTITE_SQL,
        "mad_outliers": _MAD_SQL,
        "auc_score": _AUC_SQL,
        "hll_users": _hll_sql(),
        "rrf_hybrid": _rrf_sql(),
    }
)
QUERIES.update(
    {
        "vertex_cover2": q_vertex_cover2,
        "bipartite_check": q_bipartite_check,
        "mad_outliers": q_mad_outliers,
        "auc_score": q_auc_score,
        "hll_users": q_hll_users,
        "rrf_hybrid": q_rrf_hybrid,
    }
)


def q_ppr_nibble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank-Nibble local clustering (Andersen/Chung/Lang FOCS'06):
    approximate PPR by forward push from supplier 1 (pregel.ppr_push,
    6 rounds) on the co-part graph, then the conductance sweep over
    the degree-normalized-mass order (pregel.ppr_sweep) — the full
    24-row sweep table IS the deliverable; its minimum-phi prefix is
    the local community.  The oracle unrolls the identical push
    recursion and replays the sweep."""
    e = _sym(copart_edges(spark, sf_dir))
    return pregel.ppr_sweep(e, source=1, alpha=0.15, n_iter=6, top=24)


def _ppr_nibble_sql(n_iter: int = 6, alpha: float = 0.15, top: int = 24) -> str:
    parts = _ppr_push_parts(n_iter, alpha)
    parts += [
        f"""cand AS (SELECT s.id, deg.d, ROUND(s.p / deg.d, 7) AS score
        FROM s{n_iter} s JOIN deg ON deg.src = s.id WHERE s.p > 0)""",
        f"""rk AS MATERIALIZED (SELECT id, d, t FROM (
          SELECT id, d, ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS t
          FROM cand) q WHERE t <= {top})""",
        "vt AS (SELECT COUNT(*) AS vol_total FROM e)",
        """ev AS (SELECT GREATEST(ra.t, rb.t) AS hi
        FROM e JOIN rk ra ON ra.id = e.src JOIN rk rb ON rb.id = e.dst
        WHERE e.src < e.dst)""",
        """deltas AS (SELECT hi AS t, COUNT(*) AS dint FROM ev GROUP BY hi)""",
        """sweep AS (SELECT t, id, d, vol, vol - 2 * internal AS cut FROM (
          SELECT rk.t, rk.id, rk.d,
            SUM(COALESCE(deltas.dint, 0)) OVER (ORDER BY rk.t) AS internal,
            SUM(rk.d) OVER (ORDER BY rk.t) AS vol
          FROM rk LEFT JOIN deltas ON deltas.t = rk.t) q)""",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + """
        SELECT CAST(t AS BIGINT) AS t, CAST(id AS BIGINT) AS id,
               CAST(d AS BIGINT) AS d, CAST(cut AS BIGINT) AS cut,
               CAST(vol AS BIGINT) AS vol,
               ROUND(CASE WHEN LEAST(vol, vt.vol_total - vol) = 0 THEN 0.0
                          ELSE CAST(cut AS DOUBLE)
                               / CAST(LEAST(vol, vt.vol_total - vol) AS DOUBLE)
                     END, 6) AS phi
        FROM sweep CROSS JOIN vt ORDER BY t"""
    )


def q_disparity_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disparity-filter graph backbone (Serrano/Boguna/Vespignani PNAS
    2009): keep a weighted edge iff its weight is statistically
    significant against the uniform null for EITHER endpoint —
    p = (1 - w/s_i)^(k_i - 1) < alpha with vertex strength s_i and
    degree k_i.  The multiscale alternative to the global-threshold /
    top-k backbone (q_backbone_top3): hubs keep only their salient
    edges, leaf vertices keep their few.  One strength/degree
    aggregate joined back to edges — a pure linear pass, no iteration.
    Weighted graph: customer-supplier demand (w = lineitem
    multiplicity; supplier ids offset into a disjoint range) — the
    co-order/co-part graphs are too weight-uniform for the null to
    reject; the demand graph's skewed weights give a real backbone.
    Output = surviving canonical edges with both one-sided p-values
    rounded; alpha = 0.05."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000)).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    sym = e.select("src", "dst", "w").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    sd = sym.groupBy("src").agg(
        F.sum("w").alias("s"), F.count("*").alias("k")
    )
    j = (
        e.join(
            sd.select(F.col("src").alias("a"), F.col("s").alias("sa"), F.col("k").alias("ka")),
            F.col("src") == F.col("a"),
        )
        .join(
            sd.select(F.col("src").alias("b"), F.col("s").alias("sb"), F.col("k").alias("kb")),
            F.col("dst") == F.col("b"),
        )
        .select(
            "src",
            "dst",
            "w",
            F.pow(
                F.lit(1.0) - F.col("w").cast("double") / F.col("sa").cast("double"),
                (F.col("ka") - F.lit(1)).cast("double"),
            ).alias("pa"),
            F.pow(
                F.lit(1.0) - F.col("w").cast("double") / F.col("sb").cast("double"),
                (F.col("kb") - F.lit(1)).cast("double"),
            ).alias("pb"),
        )
    )
    return (
        j.where((F.col("pa") < 0.05) | (F.col("pb") < 0.05))
        .select(
            "src",
            "dst",
            F.col("w").cast("long").alias("w"),
            F.round("pa", 6).alias("pa_r"),
            F.round("pb", 6).alias("pb_r"),
        )
        .orderBy("src", "dst")
    )


_DISPARITY_SQL = """
WITH wund AS (SELECT o_custkey AS src, l_suppkey + 1000000 AS dst,
                COUNT(*) AS w
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
sym AS (SELECT src, dst, w FROM wund UNION ALL SELECT dst, src, w FROM wund),
sd AS (SELECT src, SUM(w) AS s, COUNT(*) AS k FROM sym GROUP BY src),
j AS (SELECT wund.src, wund.dst, wund.w,
        POWER(1.0 - CAST(wund.w AS DOUBLE) / CAST(sa.s AS DOUBLE),
              CAST(sa.k - 1 AS DOUBLE)) AS pa,
        POWER(1.0 - CAST(wund.w AS DOUBLE) / CAST(sb.s AS DOUBLE),
              CAST(sb.k - 1 AS DOUBLE)) AS pb
      FROM wund JOIN sd sa ON sa.src = wund.src JOIN sd sb ON sb.src = wund.dst)
SELECT src, dst, CAST(w AS BIGINT) AS w,
       ROUND(pa, 6) AS pa_r, ROUND(pb, 6) AS pb_r
FROM j WHERE pa < 0.05 OR pb < 0.05
ORDER BY src, dst
"""


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval audit (Kusupati et al. NeurIPS
    2022 posture): for the first 20 query vectors, exact cosine top-3
    under the FULL embedding vs top-3 under the first-16-dimension
    prefix, reporting the per-query overlap — the cheap-first-pass /
    rerank-depth calibration every truncated-vector index needs.
    Both rankings are the knn_cosine expression (deterministic
    (cos desc, id) order); overlap is an integer join count."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )

    def top3(frame: DataFrame) -> DataFrame:
        q = frame.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        scored = (
            q.crossJoin(frame)
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("query_id", "neighbor_id")
        )

    full = top3(emb)
    pref = top3(emb.select("vec_id", F.slice("v", 1, 16).alias("v")))
    inter = (
        full.join(pref, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("overlap3"))
    )
    return (
        full.select("query_id")
        .distinct()
        .join(inter, "query_id", "left")
        .select(
            F.col("query_id").cast("long"),
            F.coalesce("overlap3", F.lit(0)).cast("long").alias("overlap3"),
        )
        .orderBy("query_id")
    )


_MATRYOSHKA_SQL = """
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(UNNEST(embedding) AS DOUBLE) AS x
           FROM embeddings),
nrmf AS (SELECT vec_id, SQRT(SUM(x * x)) AS n FROM e GROUP BY vec_id),
dotsf AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS d
          FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 20 AND a.vec_id != b.vec_id
          GROUP BY a.vec_id, b.vec_id),
topf AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY d / (na.n * nb.n) DESC, neighbor_id ASC) AS rn
           FROM dotsf JOIN nrmf na ON na.vec_id = query_id
                      JOIN nrmf nb ON nb.vec_id = neighbor_id) t
         WHERE rn <= 3),
ep AS (SELECT vec_id, i, x FROM e WHERE i <= 16),
nrmp AS (SELECT vec_id, SQRT(SUM(x * x)) AS n FROM ep GROUP BY vec_id),
dotsp AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS d
          FROM ep a JOIN ep b ON a.i = b.i AND a.vec_id < 20 AND a.vec_id != b.vec_id
          GROUP BY a.vec_id, b.vec_id),
topp AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY d / (na.n * nb.n) DESC, neighbor_id ASC) AS rn
           FROM dotsp JOIN nrmp na ON na.vec_id = query_id
                      JOIN nrmp nb ON nb.vec_id = neighbor_id) t
         WHERE rn <= 3),
inter AS (SELECT f.query_id, COUNT(*) AS overlap3
          FROM topf f JOIN topp p
            ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
          GROUP BY f.query_id)
SELECT q.query_id, CAST(COALESCE(inter.overlap3, 0) AS BIGINT) AS overlap3
FROM (SELECT DISTINCT query_id FROM topf) q
LEFT JOIN inter ON inter.query_id = q.query_id
ORDER BY q.query_id
"""


def q_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM perplexity with add-one smoothing — the
    two-gram upgrade of `unigram_ppl` (CCNet-posture quality filter:
    the corpus is its own language model).  logp(w2|w1) =
    ln((c(w1 w2) + 1) / (c(w1 ·) + V)); per-bigram contributions are
    floored to 1e6-scaled BIGINTs BEFORE summation (bm25 discipline)
    so the per-doc log-likelihood is an order-independent integer sum;
    ppl = exp(-ll / (1e6 · n)) is one deterministic float on exact
    integers, rounded 4dp.  Skew discipline: (doc, bigram, count)
    collapses BEFORE the Zipf-skewed corpus-count join."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("i", "w"),
    )
    big = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.i") == F.col("a.i") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.w"), F.col("b.w")).alias("g"),
            F.col("a.w").alias("w1"),
        )
    )
    dg = big.groupBy("doc_id", "g", "w1").agg(F.count("*").alias("n"))
    cb = dg.groupBy("g").agg(F.sum("n").alias("cb"))
    cu = dg.groupBy("w1").agg(F.sum("n").alias("cu"))
    v = toks.select("w").distinct().count()
    contrib = F.floor(
        F.lit(1e6)
        * F.log(
            (F.col("cb") + F.lit(1.0)).cast("double")
            / (F.col("cu") + F.lit(float(v))).cast("double")
        )
    )
    per_doc = (
        dg.join(cb, "g")
        .join(cu, "w1")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * contrib).alias("ll_scaled"),
            F.sum("n").alias("n_bigrams"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bigrams").cast("long"),
        F.col("ll_scaled").cast("long"),
        F.round(
            F.exp(
                -F.col("ll_scaled").cast("double")
                / (F.lit(1e6) * F.col("n_bigrams").cast("double"))
            ),
            4,
        ).alias("ppl_r"),
    ).orderBy("doc_id")


_BIGRAM_PPL_SQL = r"""
WITH toks AS (SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
                     UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
              FROM documents),
big AS (SELECT a.doc_id, a.w || ' ' || b.w AS g, a.w AS w1
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
dg AS (SELECT doc_id, g, w1, COUNT(*) AS n FROM big GROUP BY 1, 2, 3),
cb AS (SELECT g, SUM(n) AS cb FROM dg GROUP BY g),
cu AS (SELECT w1, SUM(n) AS cu FROM dg GROUP BY w1),
v AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v FROM toks),
per_doc AS (SELECT dg.doc_id,
              SUM(dg.n * CAST(FLOOR(1e6 * LN(
                CAST(cb.cb + 1.0 AS DOUBLE) / CAST(cu.cu + v.v AS DOUBLE)
              )) AS BIGINT)) AS ll_scaled,
              SUM(dg.n) AS n_bigrams
            FROM dg JOIN cb USING (g) JOIN cu USING (w1) CROSS JOIN v
            GROUP BY dg.doc_id)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(ll_scaled AS BIGINT) AS ll_scaled,
       ROUND(EXP(-CAST(ll_scaled AS DOUBLE) / (1e6 * CAST(n_bigrams AS DOUBLE))), 4)
         AS ppl_r
FROM per_doc ORDER BY doc_id
"""


ORACLES.update(
    {
        "ppr_nibble": _ppr_nibble_sql(),
        "disparity_backbone": _DISPARITY_SQL,
        "matryoshka_recall": _MATRYOSHKA_SQL,
        "bigram_ppl": _BIGRAM_PPL_SQL,
    }
)
QUERIES.update(
    {
        "ppr_nibble": q_ppr_nibble,
        "disparity_backbone": q_disparity_backbone,
        "matryoshka_recall": q_matryoshka_recall,
        "bigram_ppl": q_bigram_ppl,
    }
)


def q_label_spread3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised harmonic label spreading (Zhu/Ghahramani/
    Lafferty ICML'03) on the co-order graph: parts with id % 50 == 0
    are seeds labeled (id div 50) % 3; three clamped-seed sweeps of
    pregel.harmonic_labels propagate the one-hot distributions.  The
    label-mass algebra is INTEGER-EXACT (1e9-scaled BIGINTs, per-
    neighbor contribution = f div d), so the oracle replays every
    sweep bit-for-bit — no float parity surface at all."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))
    verts = e.select(F.col("src").alias("id")).distinct()
    seeds = verts.where(F.col("id") % 50 == 0).select(
        "id", ((F.col("id") / 50).cast("long") % 3).cast("int").alias("lbl")
    )
    return pregel.harmonic_labels(e, seeds, n_labels=3, rounds=3).orderBy("id")


def _label_spread_sql(rounds: int = 3, scale: int = 1_000_000_000) -> str:
    def clamp(i: int, src: str) -> str:
        return (
            f"CASE WHEN s.lbl IS NOT NULL THEN "
            f"CASE WHEN s.lbl = {i} THEN {scale} ELSE 0 END "
            f"ELSE {src} END AS m{i}"
        )

    parts = [
        _COORDER_SQL.strip().rstrip(","),
        _SYM_SQL,
        "verts AS (SELECT DISTINCT src AS id FROM e)",
        "deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src)",
        "seeds AS (SELECT id, CAST((id // 50) % 3 AS INT) AS lbl "
        "FROM verts WHERE id % 50 = 0)",
        "st0 AS (SELECT v.id, "
        + ", ".join(clamp(i, "0") for i in range(3))
        + " FROM verts v LEFT JOIN seeds s USING (id))",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"c{r} AS (SELECT st.id, "
            + ", ".join(f"st.m{i} // deg.d AS c{i}" for i in range(3))
            + f" FROM st{r - 1} st JOIN deg ON deg.id = st.id)"
        )
        parts.append(
            f"i{r} AS (SELECT e.dst AS id, "
            + ", ".join(f"SUM(c.c{i}) AS m{i}" for i in range(3))
            + f" FROM e JOIN c{r} c ON c.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"st{r} AS MATERIALIZED (SELECT v.id, "
            + ", ".join(clamp(i, f"COALESCE(i.m{i}, 0)") for i in range(3))
            + f" FROM verts v LEFT JOIN seeds s USING (id) "
            f"LEFT JOIN i{r} i USING (id))"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(id AS BIGINT) AS id,
       CAST(CASE WHEN m0 + m1 + m2 = 0 THEN -1
                 WHEN m0 >= m1 AND m0 >= m2 THEN 0
                 WHEN m1 >= m2 THEN 1 ELSE 2 END AS INT) AS pred,
       CAST(m0 AS BIGINT) AS m0, CAST(m1 AS BIGINT) AS m1,
       CAST(m2 AS BIGINT) AS m2
FROM st{rounds} ORDER BY id"""
    )


def q_kcenter8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection over the embeddings table
    (similarity.kcenter_init, k = 8 from vec_id 0): the diversity
    sampler / k-means warm start — each round adds the point farthest
    (cosine) from its nearest chosen center.  The oracle unrolls the
    eight data-dependent argmax rounds with chained scalar
    subqueries."""
    from polar_spark.operators.similarity import kcenter_init

    emb = load_table(spark, "embeddings", sf_dir)
    return kcenter_init(emb, k=8, start_id=0)


def _kcenter_sql(k: int = 8) -> str:
    parts = [
        """e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(UNNEST(embedding) AS DOUBLE) AS x FROM embeddings)""",
        "nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS n FROM e GROUP BY vec_id)",
        """d0 AS (SELECT b.vec_id, 1.0 - SUM(a.x * b.x) / (na.n * nb.n) AS dist
        FROM e a JOIN e b ON a.i = b.i AND a.vec_id = 0
        JOIN nrm na ON na.vec_id = 0 JOIN nrm nb ON nb.vec_id = b.vec_id
        GROUP BY b.vec_id, na.n, nb.n)""",
        "dm1 AS MATERIALIZED (SELECT vec_id, dist AS dmin FROM d0)",
    ]
    excl = ["0"]
    for r in range(1, k):
        parts.append(
            f"""s{r} AS MATERIALIZED (SELECT vec_id, dmin FROM dm{r}
        WHERE vec_id NOT IN ({", ".join(excl)})
        ORDER BY ROUND(dmin, 9) DESC, vec_id ASC LIMIT 1)"""
        )
        excl.append(f"(SELECT vec_id FROM s{r})")
        if r < k - 1:
            parts.append(
                f"""d{r} AS (SELECT b.vec_id, 1.0 - SUM(a.x * b.x) / (na.n * nb.n) AS dist
        FROM e a JOIN e b ON a.i = b.i AND a.vec_id = (SELECT vec_id FROM s{r})
        JOIN nrm na ON na.vec_id = (SELECT vec_id FROM s{r})
        JOIN nrm nb ON nb.vec_id = b.vec_id
        GROUP BY b.vec_id, na.n, nb.n)"""
            )
            parts.append(
                f"""dm{r + 1} AS MATERIALIZED (SELECT dm.vec_id,
        LEAST(dm.dmin, d.dist) AS dmin
        FROM dm{r} dm JOIN d{r} d ON d.vec_id = dm.vec_id)"""
            )
    rows = ["SELECT 0 AS sel, CAST(0 AS BIGINT) AS center_id, 0.0 AS dmin_r"]
    rows += [
        f"SELECT {r}, CAST(vec_id AS BIGINT), ROUND(dmin, 6) FROM s{r}"
        for r in range(1, k)
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(rows) + "\nORDER BY sel"
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination detector: MinHash+LSH near-dup
    candidate pairs (dedup.minhash_pairs_arith, the replayable family
    behind `minhash_pairs`) with estimated Jaccard >= 0.5 whose two
    documents landed in DIFFERENT train/val/test splits
    (sampling.split_assign, the `split_assign` buckets) — the leakage
    audit every eval pipeline must run AFTER splitting, because
    document-level splits do not respect near-duplicate clusters.
    Pure composition of two existing bounded operators: banded
    candidates (never all pairs) joined twice against the split map."""
    from polar_spark.operators.dedup import minhash_pairs_arith
    from polar_spark.operators.sampling import split_assign

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_pairs_arith(docs)
    splits = split_assign(
        docs, [("train", 0.9), ("val", 0.05), ("test", 0.05)], seed=11
    ).select("doc_id", "split")
    return (
        pairs.where(F.col("est_j") >= 0.5)
        .join(
            splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")),
            "id_a",
        )
        .join(
            splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")),
            "id_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "n_shared_bands", "est_j")
        .orderBy("id_a", "id_b")
    )


def _split_leakage_sql() -> str:
    from polar_spark.operators.dedup import minhash_pairs_arith_sql

    mix = (
        "SELECT doc_id, xor(x1, x1 >> 17) % 10000 AS bucket FROM ("
        "SELECT doc_id, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM ("
        "SELECT doc_id, (doc_id * 2654435761 + 11) % 2147483648 AS x0 "
        "FROM documents) a) b"
    )
    return f"""
WITH mp AS ({minhash_pairs_arith_sql()}),
sp AS (SELECT doc_id, CASE WHEN bucket < 9000 THEN 'train'
                           WHEN bucket < 9500 THEN 'val'
                           ELSE 'test' END AS split FROM ({mix}) m)
SELECT mp.id_a, mp.id_b, a.split AS split_a, b.split AS split_b,
       mp.n_shared_bands, mp.est_j
FROM mp JOIN sp a ON a.doc_id = mp.id_a JOIN sp b ON b.doc_id = mp.id_b
WHERE mp.est_j >= 0.5 AND a.split != b.split
ORDER BY mp.id_a, mp.id_b
"""


ORACLES.update(
    {
        "label_spread3": _label_spread_sql(),
        "kcenter8": _kcenter_sql(),
        "split_leakage": _split_leakage_sql(),
    }
)
QUERIES.update(
    {
        "label_spread3": q_label_spread3,
        "kcenter8": q_kcenter8,
        "split_leakage": q_split_leakage,
    }
)


def q_burt_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burt's network constraint (structural-holes brokerage) on the
    degree-bounded co-order subgraph (pregel.burt_constraint, cutoff
    60): high constraint = redundant contacts, low = a broker bridging
    groups.  Fully INTEGER-EXACT p-term algebra (scale DIV d products,
    reduced-precision squares) so the oracle replays every sum
    bit-for-bit.  Graph: the sparse l_partkey % 7 = 0 co-order slice
    (degrees ~6-36 at test SFs) — the full co-order graph's degrees
    exceed any brokerage-meaningful cutoff."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.where(F.col("l_partkey") % 7 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a_, b_ = op.alias("a"), op.alias("b")
    e = (
        a_.join(b_, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    return pregel.burt_constraint(e, max_degree=60).orderBy("id")


_BURT_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            WHERE l_partkey % 7 = 0),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
sym AS (SELECT src, dst FROM und UNION SELECT dst, src FROM und),
degf AS (SELECT src, COUNT(*) AS d0 FROM sym GROUP BY src),
keep AS (SELECT src AS id FROM degf WHERE d0 <= 60),
e2 AS MATERIALIZED (SELECT sym.src, sym.dst FROM sym
      JOIN keep ka ON ka.id = sym.src JOIN keep kb ON kb.id = sym.dst),
d AS (SELECT src, COUNT(*) AS d FROM e2 GROUP BY src),
wedge AS (SELECT iq.src AS i, iq.dst AS q, qj.dst AS j
          FROM e2 iq JOIN e2 qj ON qj.src = iq.dst
          WHERE iq.src != qj.dst),
closed AS (SELECT w.i, w.q, w.j FROM wedge w
           WHERE EXISTS (SELECT 1 FROM e2 WHERE e2.src = w.i AND e2.dst = w.j)),
ind AS (SELECT c.i, c.j, SUM(1000000000000 // (di.d * dq.d)) AS ts
        FROM closed c JOIN d di ON di.src = c.i JOIN d dq ON dq.src = c.q
        GROUP BY c.i, c.j),
base AS (SELECT a.src AS i, di.d AS di,
                1000000000000 // di.d + COALESCE(ind.ts, 0) AS b
         FROM e2 a JOIN d di ON di.src = a.src
         LEFT JOIN ind ON ind.i = a.src AND ind.j = a.dst),
cc AS (SELECT i, di, ((b // 1000) * (b // 1000)) // 1000000 AS c FROM base)
SELECT CAST(i AS BIGINT) AS id, CAST(ANY_VALUE(di) AS BIGINT) AS d,
       CAST(SUM(c) AS BIGINT) AS c_scaled,
       ROUND(CAST(SUM(c) AS DOUBLE) / 1000000000000.0, 6) AS c_r
FROM cc GROUP BY i ORDER BY id
"""


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-model QA: the 3-way confusion table between the true
    language label, the Naive Bayes classifier prediction
    (classify.nb_classify — trained on the 80% hash split) and the
    stopword-heuristic prediction (text.language_scores) — the
    agreement audit run before trusting either as a corpus filter.
    Pure composition of two existing scorers + one count aggregate."""
    from polar_spark.operators.classify import nb_classify
    from polar_spark.operators.text import language_scores

    docs = load_table(spark, "documents", sf_dir)
    nb = nb_classify(docs).select("doc_id", "label", F.col("pred").alias("nb_pred"))
    heur = language_scores(docs).select(
        "doc_id", F.col("lang_pred").alias("heur_pred")
    )
    return (
        nb.join(heur, "doc_id")
        .groupBy("label", "nb_pred", "heur_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("label", "nb_pred", "heur_pred")
    )


def _lang_confusion_sql() -> str:
    return f"""
WITH nb AS (SELECT doc_id, label, pred AS nb_pred FROM ({_nb_sql()}) x),
heur AS (SELECT doc_id, lang_pred AS heur_pred FROM ({ORACLES["langid"]}) y)
SELECT label, nb_pred, heur_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM nb JOIN heur USING (doc_id)
GROUP BY label, nb_pred, heur_pred
ORDER BY label, nb_pred, heur_pred
"""


ORACLES.update(
    {
        "burt_constraint": _BURT_SQL,
        "lang_confusion": _lang_confusion_sql(),
    }
)
QUERIES.update(
    {
        "burt_constraint": q_burt_constraint,
        "lang_confusion": q_lang_confusion,
    }
)


def q_percolation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bond-percolation profile of the weighted co-order graph: for
    weight thresholds w >= 2..5, the surviving edge/vertex counts,
    number of connected components and the giant-component size — the
    robustness curve (does co-occurrence strength t still hold the
    graph together?) every backbone/threshold choice should consult
    before filtering edges.  Four hash-min component runs over rapidly
    shrinking subgraphs; each threshold's stats are two bounded
    aggregates.  The oracle replays each threshold with a recursive
    reach CTE."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a_, b_ = op.alias("a"), op.alias("b")
    wund = (
        a_.join(b_, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .persist()
    )
    rows = []
    for thr in (2, 3, 4, 5):
        e = wund.where(F.col("w") >= thr).select("src", "dst")
        n_edges = e.count()
        if n_edges == 0:
            rows.append((thr, 0, 0, 0, 0))
            continue
        comps, _stats = pregel.connected_components(e)
        sizes = comps.groupBy("comp").agg(F.count("*").alias("n"))
        agg = sizes.agg(
            F.count("*").alias("nc"), F.max("n").alias("giant"), F.sum("n").alias("nv")
        ).collect()[0]
        rows.append((thr, int(agg["nv"]), n_edges, int(agg["nc"]), int(agg["giant"])))
    wund.unpersist()
    return spark.createDataFrame(
        rows, "thr long, n_vertices long, n_edges long, n_components long, giant long"
    ).orderBy("thr")


def _percolation_sql(thresholds: tuple[int, ...] = (2, 3, 4, 5)) -> str:
    parts = [
        "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)",
        """wund AS MATERIALIZED (SELECT a.p AS src, b.p AS dst, COUNT(*) AS w
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)""",
    ]
    selects = []
    for t in thresholds:
        parts += [
            f"u{t} AS MATERIALIZED (SELECT src, dst FROM wund WHERE w >= {t})",
            f"e{t} AS (SELECT src, dst FROM u{t} UNION ALL SELECT dst, src FROM u{t})",
            f"v{t} AS (SELECT DISTINCT src AS id FROM e{t})",
            f"""r{t}(id, comp) AS (
            SELECT id, id FROM v{t}
            UNION
            SELECT e.dst, r.comp FROM r{t} r JOIN e{t} e ON e.src = r.id
            WHERE r.comp < e.dst)""",
            f"c{t} AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM r{t} GROUP BY id)",
            f"""s{t} AS (SELECT comp, COUNT(*) AS n FROM c{t} GROUP BY comp)""",
        ]
        selects.append(
            f"""SELECT {t} AS thr,
            (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM s{t}) AS n_vertices,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM u{t}) AS n_edges,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM s{t}) AS n_components,
            (SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) FROM s{t}) AS giant"""
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY thr"
    )


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster-size histogram: hash-min connected
    components over the MinHash candidate pairs with est_j >= 0.5
    (the same replayable family as `minhash_pairs`), then the count of
    clusters at each size — the dedup report's shape summary (how much
    of the corpus collapses, and into how large groups) that decides
    keep-one-per-cluster budgets.  Singleton documents (no near-dup)
    are by definition not clusters here."""
    from polar_spark.operators.dedup import minhash_pairs_arith

    docs = load_table(spark, "documents", sf_dir)
    pairs = (
        minhash_pairs_arith(docs)
        .where(F.col("est_j") >= 0.5)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comps, _stats = pregel.connected_components(pairs)
    sizes = comps.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long"),
            F.col("n_clusters").cast("long"),
        )
        .orderBy("cluster_size")
    )


def _neardup_clusters_sql() -> str:
    from polar_spark.operators.dedup import minhash_pairs_arith_sql

    return f"""
WITH RECURSIVE mp AS ({minhash_pairs_arith_sql()}),
p AS (SELECT id_a AS src, id_b AS dst FROM mp WHERE est_j >= 0.5),
e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
verts AS (SELECT DISTINCT src AS id FROM e),
reach(id, comp) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id WHERE r.comp < e.dst
),
c AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
sizes AS (SELECT comp, COUNT(*) AS cluster_size FROM c GROUP BY comp)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""


ORACLES.update(
    {
        "percolation_profile": _percolation_sql(),
        "neardup_clusters": _neardup_clusters_sql(),
    }
)
QUERIES.update(
    {
        "percolation_profile": q_percolation_profile,
        "neardup_clusters": q_neardup_clusters,
    }
)


def q_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected triad census of the co-order graph: counts of
    3-vertex subsets with 0/1/2/3 edges, derived in closed form from
    n, m, the wedge count W = Σ C(d_v, 2) and the exact triangle total
    T (degree-ordered orientation) — N3 = T, N2 = W − 3T,
    N1 = m(n−2) − 2·N2 − 3T, N0 = C(n,3) − N1 − N2 − N3.  All exact
    int64 (C(n,3) ≈ 1.3e15 at n = 200k parts — in range); the heavy
    work is one degree aggregation plus the already-scale-shaped
    triangle count, so this is the census a 100-TB link graph can
    actually afford (no triad enumeration)."""
    # checkpointed: three actions read und (degree stats, edge count,
    # triangle count) — was three co-order builds
    und = pregel._hard_cut(coorder_edges(spark, sf_dir))
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    stats = deg.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("w"),
    ).collect()[0]
    n, wedges = int(stats["n"]), int(stats["w"])
    m = und.count()
    _pv, tri = pregel.triangle_count(und)
    n3 = tri
    n2 = wedges - 3 * tri
    n1 = m * (n - 2) - 2 * n2 - 3 * tri
    n0 = n * (n - 1) * (n - 2) // 6 - n1 - n2 - n3
    return spark.createDataFrame(
        [(n, m, wedges, n0, n1, n2, n3)],
        "n long, m long, wedges long, empty long, one_edge long, path long, triangle long",
    )


_TRIAD_CENSUS_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w
         FROM deg),
m_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM und a JOIN und b ON b.src = a.src AND b.dst > a.dst
        JOIN und c ON c.src = a.dst AND c.dst = b.dst)
SELECT n, m, w AS wedges,
       n * (n - 1) * (n - 2) // 6 - (m * (n - 2) - 2 * (w - 3 * t) - 3 * t)
         - (w - 3 * t) - t AS empty,
       m * (n - 2) - 2 * (w - 3 * t) - 3 * t AS one_edge,
       w - 3 * t AS path,
       t AS triangle
FROM base, m_, tri
"""


def q_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: stream the corpus in doc_id
    order, checkpoint at each decile, and report cumulative documents,
    tokens and DISTINCT vocabulary — the curve that tells a data
    pipeline whether more raw data still buys new vocabulary.  The
    distributed shape is checkpoint-friendly: a token's contribution to
    the curve is its FIRST-occurrence decile (one groupBy(token) MIN —
    no prefix-distinct over an ordered stream), then a 10-row cumsum.
    Decile = ceil(10·(doc_id+1)/N) with N = max(doc_id)+1, a pure map
    (no global rank window)."""
    docs = load_table(spark, "documents", sf_dir)
    n_scale = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    )
    def bucket(c):
        # ceil(10·(c+1)/N) as exact integer floor-div (values « 2^53)
        return F.floor(((c + 1) * 10 + n_scale - 1) / n_scale).cast("long")
    vocab = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("first_id"))
        .groupBy(bucket(F.col("first_id")).alias("bucket"))
        .agg(F.count("*").alias("new_vocab"))
    )
    per_doc = docs.select(
        bucket(F.col("doc_id")).alias("bucket"),
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("ntok"),
    ).groupBy("bucket").agg(
        F.count("*").alias("n_docs"), F.sum("ntok").alias("n_toks")
    )
    buckets = spark.range(1, 11).select(F.col("id").alias("bucket"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        buckets.join(per_doc, "bucket", "left")
        .join(vocab, "bucket", "left")
        .na.fill(0)
        .select(
            "bucket",
            F.sum("n_docs").over(w).cast("long").alias("docs_cum"),
            F.sum("n_toks").over(w).cast("long").alias("tokens_cum"),
            F.sum("new_vocab").over(w).cast("long").alias("vocab_cum"),
        )
        .orderBy("bucket")
    )


_HEAPS_SQL = r"""
WITH nsc AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
toks AS (SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS tok
         FROM documents),
firsts AS (SELECT tok, MIN(doc_id) AS first_id FROM toks GROUP BY tok),
fb AS (SELECT ((first_id + 1) * 10 + (SELECT n FROM nsc) - 1) // (SELECT n FROM nsc) AS bucket
       FROM firsts),
vocab AS (SELECT bucket, COUNT(*) AS new_vocab FROM fb GROUP BY bucket),
db AS (SELECT ((doc_id + 1) * 10 + (SELECT n FROM nsc) - 1) // (SELECT n FROM nsc) AS bucket,
              len(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS ntok
       FROM documents),
per_doc AS (SELECT bucket, COUNT(*) AS n_docs, SUM(ntok) AS n_toks
            FROM db GROUP BY bucket),
b AS (SELECT UNNEST(generate_series(1, 10)) AS bucket)
SELECT CAST(b.bucket AS BIGINT) AS bucket,
       CAST(SUM(COALESCE(n_docs, 0)) OVER (ORDER BY b.bucket) AS BIGINT) AS docs_cum,
       CAST(SUM(COALESCE(n_toks, 0)) OVER (ORDER BY b.bucket) AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(new_vocab, 0)) OVER (ORDER BY b.bucket) AS BIGINT) AS vocab_cum
FROM b LEFT JOIN per_doc ON per_doc.bucket = b.bucket
LEFT JOIN vocab ON vocab.bucket = b.bucket
ORDER BY b.bucket
"""


def q_gini_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the co-order degree distribution — the
    inequality number next to `powerlaw_alpha` in a link-graph skew
    report.  The ranked weighted sum Σ i·d_(i) is computed from the
    DEGREE HISTOGRAM, not a global sort: ranks within a tied block
    contribute c·C_prev + c(c+1)/2, so the only window runs over the
    ≤ max-degree histogram rows.  All sums exact int64; the single
    final division is exact-int → double (both engines correctly
    rounded, canon round 9)."""
    und = coorder_edges(spark, sf_dir)
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    hist = deg.groupBy("d").agg(F.count("*").alias("c"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "d", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("c_prev")
    )
    agg = ranked.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("d") * F.col("c")).cast("long").alias("sum_d"),
        F.sum(
            F.col("d")
            * (F.col("c") * F.col("c_prev") + F.expr("c * (c + 1) DIV 2"))
        ).cast("long").alias("s"),
    )
    return agg.select(
        "n",
        "sum_d",
        "s",
        F.round(
            (2 * F.col("s") - (F.col("n") + 1) * F.col("sum_d")).cast("double")
            / (F.col("n") * F.col("sum_d")).cast("double"),
            9,
        ).alias("gini_r"),
    )


_GINI_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
hist AS (SELECT d, COUNT(*) AS c FROM deg GROUP BY d),
ranked AS (SELECT d, c,
                  COALESCE(SUM(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS c_prev
           FROM hist),
agg AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(d * c) AS BIGINT) AS sum_d,
               CAST(SUM(d * (c * c_prev + c * (c + 1) // 2)) AS BIGINT) AS s
        FROM ranked)
SELECT n, sum_d, s,
       ROUND(CAST(2 * s - (n + 1) * sum_d AS DOUBLE)
             / CAST(n * sum_d AS DOUBLE), 9) AS gini_r
FROM agg
"""


def q_k4_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex 4-clique participation on the co-order graph — the
    motif one step past triangles (used for dense-block detection in
    link graphs).  Scale shape: vertices are ordered by the surrogate
    key deg·2³² + id (the triangle count's degree-ordered orientation,
    totally ordered), every K4 is enumerated exactly once rooted at its
    lowest-rank corner, and each join extends from the root's oriented
    adjacency — wedge fan-out is bounded by the orientation's
    low-out-degree property (Chiba–Nishizeki), not by hub degree."""
    und = coorder_edges(spark, sf_dir)
    return k4_per_vertex(und)


def k4_per_vertex(und: DataFrame) -> DataFrame:
    """Exact per-vertex 4-clique counts of a canonical (src < dst)
    undirected edge list — see q_k4_cliques for the orientation
    argument."""
    und = pregel._hard_cut(und)
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    keyed = (
        und.join(deg.select(F.col("id").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            (F.col("ds") * F.lit(4294967296) + F.col("src")).alias("ks"),
            (F.col("dd") * F.lit(4294967296) + F.col("dst")).alias("kd"),
        )
    )
    # materialized with a stats cut + shuffle_hash hints on every
    # closure join: A/B-measured fastest (2.8 s vs 5.6 s persist/auto
    # and 6.2 s sort-merge at sf0.1) — no broadcast rebuilds of the
    # oriented table, no per-join sorts (guide §3.1); semi-joins for
    # the membership checks (o is a set, so inner ≡ semi)
    o = pregel._hard_cut(
        keyed.select(F.least("ks", "kd").alias("a"), F.greatest("ks", "kd").alias("b"))
    )
    e1 = o.select("a", F.col("b").alias("v"))
    e2 = o.select("a", F.col("b").alias("w"))
    tri = (
        e1.join(e2.hint("shuffle_hash"), "a")
        .where(F.col("v") < F.col("w"))
        .join(
            o.select(F.col("a").alias("v"), F.col("b").alias("w")).hint("shuffle_hash"),
            ["v", "w"],
            "left_semi",
        )
    )
    ext = o.select("a", F.col("b").alias("x"))
    k4 = (
        tri.join(ext.hint("shuffle_hash"), "a")
        .where(F.col("x") > F.col("w"))
        .join(
            o.select(F.col("a").alias("v"), F.col("b").alias("x")).hint("shuffle_hash"),
            ["v", "x"],
            "left_semi",
        )
        .join(
            o.select(F.col("a").alias("w"), F.col("b").alias("x")).hint("shuffle_hash"),
            ["w", "x"],
            "left_semi",
        )
    )
    out = (
        k4.select(F.explode(F.array("a", "v", "w", "x")).alias("key"))
        .select((F.col("key") % F.lit(4294967296)).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("k4"))
        .select(F.col("id").cast("long"), F.col("k4").cast("long"))
        .orderBy("id")
    )
    return out.localCheckpoint(eager=True)


_K4_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
keyed AS (SELECT ds.d * 4294967296 + und.src AS ks,
                 dd.d * 4294967296 + und.dst AS kd
          FROM und JOIN deg ds ON ds.id = und.src JOIN deg dd ON dd.id = und.dst),
o AS MATERIALIZED (SELECT LEAST(ks, kd) AS a, GREATEST(ks, kd) AS b FROM keyed),
tri AS (SELECT e1.a, e1.b AS v, e2.b AS w
        FROM o e1 JOIN o e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b),
k4 AS (SELECT t.a, t.v, t.w, ex.b AS x
       FROM tri t JOIN o ex ON ex.a = t.a AND ex.b > t.w
       JOIN o f1 ON f1.a = t.v AND f1.b = ex.b
       JOIN o f2 ON f2.a = t.w AND f2.b = ex.b),
corners AS (SELECT a AS key FROM k4 UNION ALL SELECT v FROM k4
            UNION ALL SELECT w FROM k4 UNION ALL SELECT x FROM k4)
SELECT CAST(key % 4294967296 AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS k4
FROM corners GROUP BY 1 ORDER BY id
"""


def q_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication matrix: MinHash candidate pairs at
    est_j ≥ 0.5 bucketed by the (unordered) source pair of the two
    documents — the report that tells a curation pipeline WHICH corpora
    duplicate each other (and how much is within-source boilerplate vs
    cross-source syndication).  One broadcast-sized join against the
    documents dimension per side."""
    from polar_spark.operators.dedup import minhash_pairs_arith

    docs = load_table(spark, "documents", sf_dir)
    src = docs.select("doc_id", "source")
    pairs = (
        minhash_pairs_arith(docs)
        .where(F.col("est_j") >= 0.5)
        .join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
    )
    return (
        pairs.groupBy(
            F.least("sa", "sb").alias("source_lo"),
            F.greatest("sa", "sb").alias("source_hi"),
        )
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("source_lo", "source_hi")
    )


def _source_dup_matrix_sql() -> str:
    from polar_spark.operators.dedup import minhash_pairs_arith_sql

    return f"""
WITH mp AS ({minhash_pairs_arith_sql()})
SELECT LEAST(da.source, db.source) AS source_lo,
       GREATEST(da.source, db.source) AS source_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM mp JOIN documents da ON da.doc_id = mp.id_a
JOIN documents db ON db.doc_id = mp.id_b
WHERE mp.est_j >= 0.5
GROUP BY 1, 2 ORDER BY source_lo, source_hi
"""


def q_tok_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by predicted language: per langid class, the
    exact corpus sums of whitespace tokens, BPE-ish regex tokens and
    characters, plus fertility ratios in integer ppm (BPE tokens per
    whitespace token; chars per BPE token ×1000) — the per-language
    budget table (does the tokenizer fragment one language more than
    another?).  Composes the existing langid + token-count expressions;
    all JVM-side, one groupBy."""
    from polar_spark.operators.text import language_scores, token_counts

    docs = load_table(spark, "documents", sf_dir)
    lang = language_scores(docs).select("doc_id", "lang_pred")
    tok = token_counts(docs).select("doc_id", "ws_tokens", "bpe_tokens")
    chars = docs.select("doc_id", F.length("text").alias("n_chr"))
    return (
        lang.join(tok, "doc_id")
        .join(chars, "doc_id")
        .groupBy("lang_pred")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("ws_tokens"),
            F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
            F.sum("n_chr").cast("long").alias("n_chars"),
        )
        .select(
            "lang_pred",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            "n_chars",
            F.expr("bpe_tokens * 1000000 DIV GREATEST(ws_tokens, 1)").alias(
                "bpe_per_ws_ppm"
            ),
            F.expr("n_chars * 1000 DIV GREATEST(bpe_tokens, 1)").alias(
                "chars_per_bpe_milli"
            ),
        )
        .orderBy("lang_pred")
    )


_TOK_FERTILITY_SQL = rf"""
WITH t AS (SELECT doc_id,
                  regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks,
                  CAST(len(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS ws_tokens,
                  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{{1,3}}|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
                  CAST(LENGTH(text) AS BIGINT) AS n_chr
           FROM documents),
s AS (SELECT doc_id, ws_tokens, bpe_tokens, n_chr,
             {_lang_score_sql("de")} AS s_de,
             {_lang_score_sql("en")} AS s_en,
             {_lang_score_sql("es")} AS s_es,
             {_lang_score_sql("fr")} AS s_fr,
             {_lang_score_sql("zh")} AS s_zh
      FROM t),
cls AS (SELECT doc_id, ws_tokens, bpe_tokens, n_chr,
               CASE WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                    WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                    WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                    WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                    ELSE 'zh' END AS lang_pred
        FROM s)
SELECT lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens,
       CAST(SUM(n_chr) AS BIGINT) AS n_chars,
       CAST(SUM(bpe_tokens) * 1000000 // GREATEST(SUM(ws_tokens), 1) AS BIGINT) AS bpe_per_ws_ppm,
       CAST(SUM(n_chr) * 1000 // GREATEST(SUM(bpe_tokens), 1) AS BIGINT) AS chars_per_bpe_milli
FROM cls GROUP BY lang_pred ORDER BY lang_pred
"""


ORACLES.update(
    {
        "triad_census": _TRIAD_CENSUS_SQL,
        "heaps_curve": _HEAPS_SQL,
        "gini_degree": _GINI_SQL,
        "k4_cliques": _K4_SQL,
        "source_dup_matrix": _source_dup_matrix_sql(),
        "tok_fertility": _TOK_FERTILITY_SQL,
    }
)
QUERIES.update(
    {
        "triad_census": q_triad_census,
        "heaps_curve": q_heaps_curve,
        "gini_degree": q_gini_degree,
        "k4_cliques": q_k4_cliques,
        "source_dup_matrix": q_source_dup_matrix,
        "tok_fertility": q_tok_fertility,
    }
)


# ---------------------------------------------------------------------------
# TPC-H-classic analytics over the star schema.  Revenue arithmetic is
# EXACT: prices/discounts are 2-decimal doubles, so cents =
# CAST(ROUND(x*100)) is an exact integer on both engines and
# revenue_e4 = Σ cents·(100 − disc_pct) is an order-independent BIGINT
# (≤ 1.05e9/line — no overflow at any sf) — the micro-units discipline
# that keeps large-group revenue sums hash-stable cross-engine.

_REV_SPARK = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)
_REV_DUCK = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def q_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped BUILDING-segment
    orders by revenue as of 1998-06-01.  Plan shape: the customer
    dimension filter broadcasts into the orders scan, both date filters
    push to parquet, and revenue is one map-side-combinable integer
    aggregate — the canonical pushdown/broadcast showcase."""
    cust = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"SUM({_REV_SPARK})").alias("revenue_e4"))
        .select(
            F.col("l_orderkey").cast("long"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_e4",
        )
        .orderBy(F.desc("revenue_e4"), "l_orderkey")
        .limit(10)
    )


_Q3_SQL = f"""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM({_REV_DUCK}) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10
"""


def q_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): revenue per nation from orders
    where customer and supplier share the nation, ASIA region, orders
    in 1997.  Exercises the 6-table snowflake join with every dimension
    broadcast and the two fact tables shuffle-joined on orderkey; the
    nation-local predicate is applied post-join (classic Q5 shape)."""
    nat = (
        load_table(spark, "nation", sf_dir)
        .join(
            load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.expr(f"SUM({_REV_SPARK})").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "n_name")
    )


_Q5_SQL = f"""
SELECT n_name, CAST(SUM({_REV_DUCK}) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY revenue_e4 DESC, n_name
"""


def q_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in 1998H1 — the churn-damage report.  Fact-fact
    shuffle join on orderkey; customer and nation dims broadcast."""
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nat = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr(f"SUM({_REV_SPARK})").alias("revenue_e4"),
            F.round(F.first("c_acctbal"), 2).alias("c_acctbal_r"),
        )
        .select(
            F.col("c_custkey").cast("long"),
            "c_name",
            "n_name",
            "revenue_e4",
            "c_acctbal_r",
        )
        .orderBy(F.desc("revenue_e4"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       CAST(SUM({_REV_DUCK}) AS BIGINT) AS revenue_e4,
       ROUND(ANY_VALUE(c_acctbal), 2) AS c_acctbal_r
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate < TIMESTAMP '1998-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, c_custkey LIMIT 20
"""


def q_cascade_lt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-threshold influence cascade (Kempe–Kleinberg–Tardos) on
    the co-order graph, 4 unrolled rounds: seeds = the 2 highest-degree
    parts, uniform incoming weights 1/deg(v), per-vertex threshold from
    the replayable Knuth hash — activate when
    active_neighbors(v)·(1e9 DIV deg(v)) ≥ thr(v)·1e6.  All-integer
    activation algebra (no float threshold compare can flip
    cross-engine); each round is one frontier join + one anti-join,
    monotone so state is just (id, act_round).  The influence-reach
    primitive for seeding/virality questions on link graphs."""
    sym = _sym(coorder_edges(spark, sf_dir)).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    stats = deg.select(
        "id",
        "d",
        F.expr("(id * 2654435761) % 1000 + 1").alias("thr"),
        F.expr("1000000000 DIV d").alias("cw"),
    )
    seeds = deg.orderBy(F.desc("d"), "id").limit(2).select("id")
    act = seeds.select("id", F.lit(0).alias("act_round"))
    # rounds chain lazily (fixed count, no per-round decision): the
    # caller's single action materializes the whole chain — was one
    # eager checkpoint job per round
    for r in range(1, 5):
        cnt = (
            sym.join(act.select(F.col("id").alias("src")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count("*").alias("k"))
        )
        newly = (
            cnt.join(stats, "id")
            .where(F.col("k") * F.col("cw") >= F.col("thr") * F.lit(1000000))
            .join(act.select("id"), "id", "left_anti")
            .select("id", F.lit(r).alias("act_round"))
        )
        act = act.unionByName(newly).localCheckpoint(eager=False)
    return act.select(F.col("id").cast("long"), F.col("act_round").cast("int")).orderBy(
        "id"
    )


def _cascade_lt_sql(rounds: int = 4) -> str:
    parts = [
        _COORDER_SQL.strip(),
        "e AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src)",
        "stats AS (SELECT id, d, (id * 2654435761) % 1000 + 1 AS thr,"
        " 1000000000 // d AS cw FROM deg)",
        "seeds AS (SELECT id FROM deg ORDER BY d DESC, id LIMIT 2)",
        "a0 AS (SELECT id, 0 AS act_round FROM seeds)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"n{r} AS (SELECT e.dst AS id, COUNT(*) AS k FROM e "
            f"JOIN a{r - 1} a ON a.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT id, act_round FROM a{r - 1} UNION ALL "
            f"SELECT n.id, {r} AS act_round FROM n{r} n JOIN stats s ON s.id = n.id "
            f"WHERE n.k * s.cw >= s.thr * 1000000 "
            f"AND n.id NOT IN (SELECT id FROM a{r - 1}))"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(id AS BIGINT) AS id, CAST(act_round AS INT) AS act_round"
        f" FROM a{rounds} ORDER BY id"
    )


def q_eff_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-diameter curve of the demand graph via ANF: for h =
    1..4, the total approximate neighborhood mass Σ_v |ball(v, h)| from
    the deterministic FM sketch, plus the 90 %-threshold flag — the
    smallest flagged h IS the effective diameter (Leskovec et al.'s
    shrinking-diameter diagnostic).  Per-vertex estimates are fixed to
    BIGINT micro-units before summation (order-independent), and the
    0.9 threshold is the INTEGER compare 10·reach ≥ 9·final — no float
    boundary can flip cross-engine.  Report shape: one anf() run per h
    here; at scale the per-round curve rides a single run's round
    snapshots."""
    e = demand_edges(spark, sf_dir)
    rows = []
    for h in (1, 2, 3, 4):
        est, _stats = pregel.anf(e, rounds=h, replicas=8, seed=1)
        tot = est.agg(
            F.sum(F.expr("CAST(ROUND(est * 1000000) AS BIGINT)")).alias("m")
        ).collect()[0]["m"]
        rows.append((h, int(tot)))
    final = rows[-1][1]
    return spark.createDataFrame(
        [(h, t, 10 * t >= 9 * final) for h, t in rows],
        "h int, reach_micro long, within_90pct boolean",
    ).orderBy("h")


def _eff_diameter_sql(rounds: int = 4, replicas: int = 8, seed: int = 1) -> str:
    # identical register chain to _anf_sql (demand graph), with a
    # per-round micro-unit total instead of the final-round per-id view
    parts = [
        "e AS MATERIALIZED (SELECT src, dst FROM ("
        "SELECT DISTINCT o_custkey AS src, l_suppkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey) "
        "WHERE src != dst)",
        "verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        f"js AS (SELECT UNNEST(range({replicas})) AS j)",
        f"""m AS (SELECT id, CAST(j AS INT) AS j,
              (v.id * 2654435761 + j * 97 + {seed}) % 2147483648 AS x0
            FROM verts v CROSS JOIN js)""",
        "m1 AS (SELECT id, j, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM m)",
        "m2 AS (SELECT id, j, xor(x1, x1 >> 17) AS h FROM m1)",
        "r0 AS MATERIALIZED (SELECT id, j, "
        "CAST(1 AS BIGINT) << LEAST(bit_count(((h & -h) - 1)), 62) AS reg FROM m2)",
    ]
    est = (
        "POW(2.0, AVG(CAST(bit_count((((~reg) & (reg + 1)) - 1)) AS DOUBLE)))"
        " / 0.77351"
    )
    sums = []
    for i in range(rounds):
        parts.append(
            f"n{i} AS MATERIALIZED (SELECT e.src AS id, r.j, bit_or(r.reg) AS nreg "
            f"FROM e JOIN r{i} r ON r.id = e.dst GROUP BY e.src, r.j)"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED (SELECT r.id, r.j, "
            f"r.reg | COALESCE(n.nreg, 0) AS reg "
            f"FROM r{i} r LEFT JOIN n{i} n ON n.id = r.id AND n.j = r.j)"
        )
        parts.append(
            f"s{i + 1} AS (SELECT CAST(SUM(CAST(ROUND(est * 1000000) AS BIGINT)) AS BIGINT)"
            f" AS reach FROM (SELECT id, {est} AS est FROM r{i + 1} GROUP BY id))"
        )
        sums.append(
            f"SELECT {i + 1} AS h, (SELECT reach FROM s{i + 1}) AS reach_micro,"
            f" 10 * (SELECT reach FROM s{i + 1}) >= 9 * (SELECT reach FROM s{rounds})"
            f" AS within_90pct"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL ".join(sums)
        + "\nORDER BY h"
    )


def q_densification_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densification curve of the co-order graph: per order-month, the
    NEW edges (part pairs first co-ordered that month) and NEW vertices
    (parts in their first co-order edge), with running totals — the
    Leskovec densification-law audit (is |E| growing superlinearly in
    |V|?) every growing link graph should track.  First-appearance is
    one groupBy-MIN per entity; the cumulative window runs over ≤ the
    number of months, never the data."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    op = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"), "ym")
        .distinct()
    )
    a_, b_ = op.alias("a"), op.alias("b")
    efirst = (
        a_.join(b_, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(
            F.col("a.p").alias("src"), F.col("b.p").alias("dst"), F.col("a.ym").alias("ym")
        )
        .groupBy("src", "dst")
        .agg(F.min("ym").alias("first_ym"))
    )
    vfirst = (
        efirst.select(F.col("src").alias("id"), "first_ym")
        .unionByName(efirst.select(F.col("dst").alias("id"), "first_ym"))
        .groupBy("id")
        .agg(F.min("first_ym").alias("first_ym"))
    )
    em = efirst.groupBy(F.col("first_ym").alias("ym")).agg(
        F.count("*").alias("new_edges")
    )
    vm = vfirst.groupBy(F.col("first_ym").alias("ym")).agg(
        F.count("*").alias("new_vertices")
    )
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    return (
        em.join(vm, "ym", "full")
        .na.fill(0)
        .select(
            F.col("ym").cast("int"),
            F.col("new_edges").cast("long"),
            F.col("new_vertices").cast("long"),
            F.sum("new_edges").over(w).cast("long").alias("cum_edges"),
            F.sum("new_vertices").over(w).cast("long").alias("cum_vertices"),
        )
        .orderBy("ym")
    )


_DENSIFICATION_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p,
                   CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS INT) AS ym
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
efirst AS (SELECT a.p AS src, b.p AS dst, MIN(a.ym) AS first_ym
           FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
vfirst AS (SELECT id, MIN(first_ym) AS first_ym FROM (
             SELECT src AS id, first_ym FROM efirst
             UNION ALL SELECT dst, first_ym FROM efirst) GROUP BY id),
em AS (SELECT first_ym AS ym, COUNT(*) AS new_edges FROM efirst GROUP BY 1),
vm AS (SELECT first_ym AS ym, COUNT(*) AS new_vertices FROM vfirst GROUP BY 1)
SELECT CAST(COALESCE(em.ym, vm.ym) AS INT) AS ym,
       CAST(COALESCE(new_edges, 0) AS BIGINT) AS new_edges,
       CAST(COALESCE(new_vertices, 0) AS BIGINT) AS new_vertices,
       CAST(SUM(COALESCE(new_edges, 0)) OVER (ORDER BY COALESCE(em.ym, vm.ym)) AS BIGINT) AS cum_edges,
       CAST(SUM(COALESCE(new_vertices, 0)) OVER (ORDER BY COALESCE(em.ym, vm.ym)) AS BIGINT) AS cum_vertices
FROM em FULL JOIN vm ON vm.ym = em.ym
ORDER BY ym
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability profile: sentence / word / vowel-group
    counts and the two Flesch-family ratios in exact integer milli
    units (words per sentence, vowel-groups-as-syllables per word) —
    the curation feature that separates prose from boilerplate.  Pure
    map over the corpus, zero shuffles, all JVM regex expressions."""
    docs = load_table(spark, "documents", sf_dir)
    sents = F.size(
        F.filter(
            F.split(F.col("text"), r"[.!?]+"),
            lambda s: F.length(F.trim(s)) > 0,
        )
    ).cast("long")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    vgroups = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    return docs.select(
        "doc_id",
        sents.alias("n_sentences"),
        words.alias("n_words"),
        vgroups.alias("n_vowel_groups"),
    ).select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_vowel_groups",
        F.expr("n_words * 1000 DIV GREATEST(n_sentences, 1)").alias(
            "words_per_sent_milli"
        ),
        F.expr("n_vowel_groups * 1000 DIV GREATEST(n_words, 1)").alias(
            "syll_per_word_milli"
        ),
    )


_READABILITY_SQL = r"""
WITH t AS (SELECT doc_id,
                  CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                       s -> LENGTH(TRIM(s)) > 0)) AS BIGINT) AS n_sentences,
                  CAST(len(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS n_words,
                  CAST(len(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS BIGINT) AS n_vowel_groups
           FROM documents)
SELECT doc_id, n_sentences, n_words, n_vowel_groups,
       CAST(n_words * 1000 // GREATEST(n_sentences, 1) AS BIGINT) AS words_per_sent_milli,
       CAST(n_vowel_groups * 1000 // GREATEST(n_words, 1) AS BIGINT) AS syll_per_word_milli
FROM t
"""


ORACLES.update(
    {
        "q3_shipping": _Q3_SQL,
        "q5_local_volume": _Q5_SQL,
        "q10_returned": _Q10_SQL,
        "cascade_lt": _cascade_lt_sql(),
        "eff_diameter": _eff_diameter_sql(),
        "densification_curve": _DENSIFICATION_SQL,
        "readability": _READABILITY_SQL,
    }
)
QUERIES.update(
    {
        "q3_shipping": q_q3_shipping,
        "q5_local_volume": q_q5_local_volume,
        "q10_returned": q_q10_returned,
        "cascade_lt": q_cascade_lt,
        "eff_diameter": q_eff_diameter,
        "densification_curve": q_densification_curve,
        "readability": q_readability,
    }
)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram containment: document pairs where the smaller
    gram set is ≥ 40 % contained in the other — catches quotes,
    subsets and boilerplate wrappers that symmetric Jaccard dilutes
    (|A∩B|/|A∪B| stays small when |A| ≪ |B| even at full containment).
    The filter is the INTEGER compare 5·|A∩B| ≥ 2·min(|A|,|B|) and both
    containment directions are emitted in exact integer ppm — zero
    float surface.  Same bounded documents slice as
    ``exact_jaccard_pairs``."""
    docs = load_table(spark, "documents", sf_dir)
    grams = doc_trigrams(docs)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("g"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("g"))
    inter = (
        ga.join(gb, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .where(F.col("c") * 5 >= F.least("na", "nb") * 2)
        .select(
            "id_a",
            "id_b",
            F.expr("c * 1000000 DIV na").alias("cont_a_ppm"),
            F.expr("c * 1000000 DIV nb").alias("cont_b_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


_CONTAINMENT_SQL = r"""
WITH toks AS (SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
                     UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
              FROM documents),
grams AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
          FROM toks a
          JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
          JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, COUNT(*) AS c
          FROM grams ga JOIN grams gb ON gb.g = ga.g AND ga.doc_id < gb.doc_id
          GROUP BY ga.doc_id, gb.doc_id)
SELECT i.id_a, i.id_b,
       CAST(i.c * 1000000 // na.n AS BIGINT) AS cont_a_ppm,
       CAST(i.c * 1000000 // nb.n AS BIGINT) AS cont_b_ppm
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE i.c * 5 >= LEAST(na.n, nb.n) * 2
ORDER BY i.id_a, i.id_b
"""


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-calibration audit: MinHash candidate pairs bucketed by
    estimated-Jaccard decile, each band reporting its pair count, the
    POOLED estimate and the POOLED exact 3-gram Jaccard (Σ∩ / Σ∪), all
    in exact integer ppm — the table that tells you how biased the
    64-permutation estimator is before you trust its threshold.
    est_j is always a multiple of 1/64 (dyadic), so the decile floor
    cannot flip cross-engine; pooled ratios are integer sums divided
    once."""
    from polar_spark.operators.dedup import minhash_pairs_arith

    docs = load_table(spark, "documents", sf_dir)
    mh = minhash_pairs_arith(docs).select(
        "id_a", "id_b", F.expr("CAST(ROUND(est_j * 64) AS BIGINT)").alias("k")
    )
    grams = doc_trigrams(docs)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("g"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("g"))
    inter = (
        ga.join(gb, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    joined = (
        mh.join(inter, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .na.fill({"c": 0})
        .select(
            F.expr("k * 10 DIV 64").alias("band"),
            "k",
            "c",
            (F.col("na") + F.col("nb") - F.col("c")).alias("u"),
        )
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("SUM(k) * 1000000 DIV (64 * COUNT(*))").alias("pooled_est_ppm"),
            F.expr("SUM(c) * 1000000 DIV GREATEST(SUM(u), 1)").alias(
                "pooled_exact_ppm"
            ),
        )
        .select(F.col("band").cast("int"), "n_pairs", "pooled_est_ppm", "pooled_exact_ppm")
        .orderBy("band")
    )


def _minhash_calibration_sql() -> str:
    from polar_spark.operators.dedup import minhash_pairs_arith_sql

    return rf"""
WITH mh AS (SELECT id_a, id_b, CAST(ROUND(est_j * 64) AS BIGINT) AS k
            FROM ({minhash_pairs_arith_sql()})),
toks AS (SELECT doc_id,
                generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
                UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
         FROM documents),
grams AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
          FROM toks a
          JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
          JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, COUNT(*) AS c
          FROM grams ga JOIN grams gb ON gb.g = ga.g AND ga.doc_id < gb.doc_id
          GROUP BY ga.doc_id, gb.doc_id),
joined AS (SELECT mh.k * 10 // 64 AS band, mh.k,
                  COALESCE(i.c, 0) AS c,
                  na.n + nb.n - COALESCE(i.c, 0) AS u
           FROM mh LEFT JOIN inter i ON i.id_a = mh.id_a AND i.id_b = mh.id_b
           JOIN sizes na ON na.doc_id = mh.id_a
           JOIN sizes nb ON nb.doc_id = mh.id_b)
SELECT CAST(band AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(k) * 1000000 // (64 * COUNT(*)) AS BIGINT) AS pooled_est_ppm,
       CAST(SUM(c) * 1000000 // GREATEST(SUM(u), 1) AS BIGINT) AS pooled_exact_ppm
FROM joined GROUP BY band ORDER BY band
"""


def q_attack_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted-attack robustness (Albert–Jeong–Barabási) of the
    co-order graph: remove the top-k highest-degree hubs for
    k ∈ {0, 10, 50, 100} and report the surviving vertex/edge counts
    and giant-component size — how fast the link graph shatters when
    its hubs go.  Hub selection is deterministic (degree DESC, id);
    each k is one anti-join + one hash-min components run on a
    shrinking subgraph."""
    und = coorder_edges(spark, sf_dir).persist()
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    ranked = deg.orderBy(F.desc("d"), "id").limit(100).collect()
    rows = []
    for k in (0, 10, 50, 100):
        hubs = {int(r["id"]) for r in ranked[:k]}
        e = und.where(~F.col("src").isin(hubs) & ~F.col("dst").isin(hubs)) if hubs else und
        n_edges = e.count()
        if n_edges == 0:
            rows.append((k, 0, 0, 0))
            continue
        comps, _stats = pregel.connected_components(e)
        agg = (
            comps.groupBy("comp")
            .agg(F.count("*").alias("n"))
            .agg(F.sum("n").alias("nv"), F.max("n").alias("giant"))
            .collect()[0]
        )
        rows.append((k, int(agg["nv"]), n_edges, int(agg["giant"])))
    und.unpersist()
    return spark.createDataFrame(
        rows, "k int, n_vertices long, n_edges long, giant long"
    ).orderBy("k")


def _attack_tolerance_sql(ks: tuple[int, ...] = (0, 10, 50, 100)) -> str:
    parts = [
        _COORDER_SQL.strip(),
        "es AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "deg AS (SELECT src AS id, COUNT(*) AS d FROM es GROUP BY src)",
        "hubs AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER (ORDER BY d DESC, id) AS rk FROM deg)",
    ]
    selects = []
    for k in ks:
        parts += [
            f"u{k} AS MATERIALIZED (SELECT src, dst FROM und "
            f"WHERE src NOT IN (SELECT id FROM hubs WHERE rk <= {k}) "
            f"AND dst NOT IN (SELECT id FROM hubs WHERE rk <= {k}))",
            f"e{k} AS (SELECT src, dst FROM u{k} UNION ALL SELECT dst, src FROM u{k})",
            f"v{k} AS (SELECT DISTINCT src AS id FROM e{k})",
            f"""r{k}(id, comp) AS (
            SELECT id, id FROM v{k}
            UNION
            SELECT e.dst, r.comp FROM r{k} r JOIN e{k} e ON e.src = r.id
            WHERE r.comp < e.dst)""",
            f"c{k} AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM r{k} GROUP BY id)",
            f"s{k} AS (SELECT comp, COUNT(*) AS n FROM c{k} GROUP BY comp)",
        ]
        selects.append(
            f"""SELECT {k} AS k,
            (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM s{k}) AS n_vertices,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM u{k}) AS n_edges,
            (SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) FROM s{k}) AS giant"""
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY k"
    )


ORACLES.update(
    {
        "containment_pairs": _CONTAINMENT_SQL,
        "minhash_calibration": _minhash_calibration_sql(),
        "attack_tolerance": _attack_tolerance_sql(),
    }
)
QUERIES.update(
    {
        "containment_pairs": q_containment_pairs,
        "minhash_calibration": q_minhash_calibration,
        "attack_tolerance": q_attack_tolerance,
    }
)


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between NATION_0 and
    NATION_1 — revenue per (supplier nation, customer nation, year) for
    the two cross directions, 1996–1998.  Same exact integer-cent
    revenue discipline as Q3/Q5; the nation-pair predicate collapses to
    two broadcast semi-filters."""
    nat = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    cust = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    ).where(F.col("yr").between(1996, 1998))
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(
            ((F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1"))
            | ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0"))
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.expr(f"SUM({_REV_SPARK})").alias("revenue_e4"))
        .select("supp_nation", "cust_nation", F.col("yr").cast("int"), "revenue_e4")
        .orderBy("supp_nation", "cust_nation", "yr")
    )


_Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(SUM({_REV_DUCK}) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE ((sn.n_name = 'NATION_0' AND cn.n_name = 'NATION_1')
    OR (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_0'))
  AND YEAR(o_orderdate) BETWEEN 1996 AND 1998
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 essence on this schema (no shipmode column): per order
    priority, line items shipped more than 90 days after the order date
    — the SLA-breach profile, with the breach rate in exact integer
    ppm.  One fact-fact join, one aggregate; the date math is integer
    day arithmetic on both engines."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(
                (
                    F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
                ).cast("long")
            ).alias("n_late"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            "n_late",
            F.expr("n_late * 1000000 DIV n_lines").alias("late_ppm"),
        )
        .orderBy("o_orderpriority")
    )


_Q12_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS late_ppm
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 120 units, with customer and exact centi-unit totals —
    HAVING pushdown + the order-level semi-join back to detail.  Top-20
    by quantity with deterministic tie-break."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)").alias("qc")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qc").alias("total_qty_c"))
        .where(F.col("total_qty_c") > 12000)
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").cast("long"),
            "c_name",
            F.col("l_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "total_qty_c",
        )
        .orderBy(F.desc("total_qty_c"), "o_orderkey")
        .limit(20)
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS total_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 12000)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(big.l_orderkey AS BIGINT) AS o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       total_qty_c
FROM big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty_c DESC, o_orderkey LIMIT 20
"""


def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction (exact ppm) of a
    document's distinct 3-grams whose FIRST corpus occurrence (by
    doc_id order) is this document — the marginal-information score a
    dedup-aware curation pass ranks on (near-1.0 = fresh content,
    near-0 = recombined boilerplate).  One global groupBy(gram) MIN +
    one per-doc aggregate — same first-occurrence shape as
    ``heaps_curve``, so it scales the same way."""
    docs = load_table(spark, "documents", sf_dir)
    grams = doc_trigrams(docs)
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_id"))
    return (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("first_id") == F.col("doc_id")).cast("long")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("n_novel * 1000000 DIV n_grams").alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


_NOVELTY_SQL = r"""
WITH toks AS (SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
                     UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
              FROM documents),
grams AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
          FROM toks a
          JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
          JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
first AS (SELECT g, MIN(doc_id) AS first_id FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_id = grams.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN first_id = grams.doc_id THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
FROM grams JOIN first ON first.g = grams.g
GROUP BY grams.doc_id ORDER BY grams.doc_id
"""


ORACLES.update(
    {
        "q7_nation_volume": _Q7_SQL,
        "late_shipments": _Q12_SQL,
        "q18_large_orders": _Q18_SQL,
        "novelty": _NOVELTY_SQL,
    }
)
QUERIES.update(
    {
        "q7_nation_volume": q_q7_nation_volume,
        "late_shipments": q_late_shipments,
        "q18_large_orders": q_q18_large_orders,
        "novelty": q_novelty,
    }
)


def q_q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): per 1998 month, PROMO-type revenue
    vs total revenue with the share in exact integer ppm — the
    campaign-effect monitor.  The part dimension joins on partkey (left
    to AQE: broadcast at bench scale, shuffle at 100 TB where part is
    fact-sized); revenue stays in exact integer micro-units end to
    end."""
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    ).where((F.col("ym") >= 199801) & (F.col("ym") <= 199812))
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("ym")
        .agg(
            F.expr(f"SUM({_REV_SPARK})").alias("total_rev_e4"),
            F.expr(
                f"SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SPARK} ELSE CAST(0 AS BIGINT) END)"
            ).alias("promo_rev_e4"),
        )
        .select(
            F.col("ym").cast("int"),
            "promo_rev_e4",
            "total_rev_e4",
            F.expr("promo_rev_e4 * 1000000 DIV total_rev_e4").alias("promo_ppm"),
        )
        .orderBy("ym")
    )


_Q14_SQL = f"""
SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS INT) AS ym,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_DUCK} ELSE 0 END) AS BIGINT) AS promo_rev_e4,
       CAST(SUM({_REV_DUCK}) AS BIGINT) AS total_rev_e4,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_DUCK} ELSE 0 END) * 1000000
            // SUM({_REV_DUCK}) AS BIGINT) AS promo_ppm
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE YEAR(o_orderdate) = 1998
GROUP BY 1 ORDER BY ym
"""


def q_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): per (brand, type), how
    many parts and how many DISTINCT suppliers ship them — the sourcing
    diversity report.  Supply pairs come from lineitem (this schema has
    no partsupp table); two count-distincts in one aggregate."""
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_type")
    pairs = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_partkey").cast("long").alias("n_parts"),
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        )
        .orderBy("p_brand", "p_type")
    )


_Q16_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM pairs JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_q22_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): per nation, customers with
    above-average positive account balance and no orders since
    1999-01-01 (the "recent window" that makes the opportunity set
    non-empty at TPC-H order densities — every customer has SOME
    historical order).  The
    average compare is the INTEGER cross-multiplication
    cents·n_pos > sum_pos_cents (no float average can flip a boundary
    customer cross-engine); the no-orders test is one anti-join."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("bal_c"),
    )
    pos = cust.where(F.col("bal_c") > 0).agg(
        F.count("*").alias("n_pos"), F.sum("bal_c").alias("sum_pos")
    ).collect()[0]
    n_pos, sum_pos = int(pos["n_pos"]), int(pos["sum_pos"])
    orders = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.where(F.col("bal_c") * n_pos > sum_pos)
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_custs"),
            F.sum("bal_c").cast("long").alias("total_bal_c"),
        )
        .select(F.col("c_nationkey").cast("long"), "n_custs", "total_bal_c")
        .orderBy("c_nationkey")
    )


_Q22_SQL = """
WITH cb AS (SELECT c_custkey, c_nationkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
            FROM customer),
pos AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pos, CAST(SUM(bal_c) AS BIGINT) AS sum_pos
        FROM cb WHERE bal_c > 0)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(bal_c) AS BIGINT) AS total_bal_c
FROM cb, pos
WHERE bal_c * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = cb.c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1 ORDER BY 1
"""


ORACLES.update(
    {
        "q14_promo_ratio": _Q14_SQL,
        "q16_supplier_counts": _Q16_SQL,
        "q22_idle_rich": _Q22_SQL,
    }
)
QUERIES.update(
    {
        "q14_promo_ratio": q_q14_promo_ratio,
        "q16_supplier_counts": q_q16_supplier_counts,
        "q22_idle_rich": q_q22_idle_rich,
    }
)


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration: the exact share (integer ppm) of
    total lifetime revenue captured by the top 1 % and top 10 % of
    customers — the whale-curve number a marketplace health report
    leads with.  Top-k selection is a distributed ORDER BY ... LIMIT k
    with the deterministic (revenue DESC, custkey) tie-break; revenue
    stays in exact integer micro-units throughout, so both shares are
    pure integer arithmetic."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir)
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.expr(f"SUM({_REV_SPARK})").alias("rev"))
        .persist()
    )
    agg = per_cust.agg(F.count("*").alias("n"), F.sum("rev").alias("tot")).collect()[0]
    n, tot = int(agg["n"]), int(agg["tot"])
    shares = []
    for pct in (1, 10):
        k = max(n * pct // 100, 1)
        top = (
            per_cust.orderBy(F.desc("rev"), "o_custkey")
            .limit(k)
            .agg(F.sum("rev"))
            .collect()[0][0]
        )
        shares.append((pct, k, int(top), int(top) * 1000000 // tot))
    per_cust.unpersist()
    return spark.createDataFrame(
        shares, "top_pct int, k_customers long, top_rev_e4 long, share_ppm long"
    ).orderBy("top_pct")


_REV_CONC_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM({_REV_DUCK}) AS BIGINT) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS t FROM per_cust),
ranked AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rk FROM per_cust)
SELECT p.top_pct,
       CAST(GREATEST(t.n * p.top_pct // 100, 1) AS BIGINT) AS k_customers,
       (SELECT CAST(SUM(rev) AS BIGINT) FROM ranked
        WHERE rk <= GREATEST(t.n * p.top_pct // 100, 1)) AS top_rev_e4,
       (SELECT CAST(SUM(rev) * 1000000 // t.t AS BIGINT) FROM ranked
        WHERE rk <= GREATEST(t.n * p.top_pct // 100, 1)) AS share_ppm
FROM (SELECT CAST(UNNEST([1, 10]) AS INT) AS top_pct) p, tot t
ORDER BY p.top_pct
"""


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order cadence per customer: number of orders, median and
    maximum day-gap between consecutive orders — the churn-risk
    cadence feature.  The lag window is PARTITIONED by customer (never
    a global sort); the median is computed on 2×-scaled integer days so
    even-count interpolation lands on an exact integer (the mad_outliers
    micro-unit lesson).  Customers with < 2 orders are excluded (no
    gap is defined)."""
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"),
                F.lag("o_orderdate").over(
                    Window.partitionBy("o_custkey").orderBy("o_orderdate")
                ),
            ).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            (F.count("*") + 1).cast("long").alias("n_orders"),
            F.expr("CAST(percentile(gap * 2, 0.5) AS BIGINT)").alias("median_gap_x2"),
            F.max("gap").cast("long").alias("max_gap_days"),
        )
        .select(
            F.col("o_custkey").cast("long"),
            "n_orders",
            "median_gap_x2",
            "max_gap_days",
        )
        .orderBy("o_custkey")
    )


_ORDER_GAPS_SQL = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day', LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate),
                   o_orderdate) AS gap
  FROM orders),
gg AS (SELECT o_custkey, gap FROM g WHERE gap IS NOT NULL)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_orders,
       CAST(MEDIAN(gap * 2) AS BIGINT) AS median_gap_x2,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days
FROM gg GROUP BY o_custkey ORDER BY o_custkey
"""


def q_degree_core_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between degree and core number on the demand
    graph — the one-number audit of whether hubs actually sit in the
    dense core (they can be star centers with low coreness).  All five
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are exact int64
    sums; the final r is one deterministic IEEE expression over them,
    rounded to 9."""
    e = demand_edges(spark, sf_dir).where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("x"))
    core, _stats = pregel.core_numbers(e)
    joined = deg.join(core.select("id", F.col("core").alias("y")), "id")
    s = joined.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return s.select(
        "n",
        "sx",
        "sy",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            ),
            9,
        ).alias("pearson_r"),
    )


def _degree_core_corr_sql() -> str:
    return f"""
WITH core AS ({_coreness_sql(20)}),
undc AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_custkey != l_suppkey),
ec AS (SELECT src, dst FROM undc UNION SELECT dst, src FROM undc),
deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS x FROM ec GROUP BY src),
j AS (SELECT deg.x, core.core AS y FROM deg JOIN core ON core.id = deg.id),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM j)
SELECT n, sx, sy,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS pearson_r
FROM s
"""


ORACLES.update(
    {
        "revenue_concentration": _REV_CONC_SQL,
        "order_gaps": _ORDER_GAPS_SQL,
        "degree_core_corr": _degree_core_corr_sql(),
    }
)
QUERIES.update(
    {
        "revenue_concentration": q_revenue_concentration,
        "order_gaps": q_order_gaps,
        "degree_core_corr": q_degree_core_corr,
    }
)


def q_graph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row profile card of the co-order graph — the summary every
    other graph query's docstring assumes: vertices, edges, density
    (exact ppm), max/mean degree (milli), triangle total, global
    clustering coefficient (ppm, from the same integer wedge/triangle
    counts as triad_census), component count and giant-component share
    (ppm).  Pure composition of the scale-shaped primitives; every
    ratio is integer-derived so the row is hash-stable."""
    und = coorder_edges(spark, sf_dir).persist()
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    stats = deg.agg(
        F.count("*").alias("n"),
        F.max("d").alias("dmax"),
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("w"),
    ).collect()[0]
    n, dmax, wedges = int(stats["n"]), int(stats["dmax"]), int(stats["w"])
    m = und.count()
    _pv, tri = pregel.triangle_count(und)
    comps, _s = pregel.connected_components(und)
    csz = (
        comps.groupBy("comp")
        .agg(F.count("*").alias("s"))
        .agg(F.count("*").alias("nc"), F.max("s").alias("giant"))
        .collect()[0]
    )
    und.unpersist()
    row = (
        n,
        m,
        m * 2000000 // (n * (n - 1)),
        dmax,
        2 * m * 1000 // n,
        tri,
        (3 * tri * 1000000 // wedges) if wedges else 0,
        int(csz["nc"]),
        int(csz["giant"]) * 1000000 // n,
    )
    return spark.createDataFrame(
        [row],
        "n_vertices long, n_edges long, density_ppm long, max_degree long, "
        "mean_degree_milli long, triangles long, global_cc_ppm long, "
        "n_components long, giant_share_ppm long",
    )


_GRAPH_PROFILE_SQL = f"""
WITH RECURSIVE {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(d) AS BIGINT) AS dmax,
                CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w
         FROM deg),
m_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM und a JOIN und b ON b.src = a.src AND b.dst > a.dst
        JOIN und c ON c.src = a.dst AND c.dst = b.dst),
v AS (SELECT DISTINCT src AS id FROM e),
r(id, comp) AS (
    SELECT id, id FROM v
    UNION
    SELECT e.dst, r.comp FROM r JOIN e ON e.src = r.id WHERE r.comp < e.dst),
c AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM r GROUP BY id),
cs AS (SELECT CAST(COUNT(DISTINCT comp) AS BIGINT) AS nc,
              CAST(MAX(s) AS BIGINT) AS giant
       FROM (SELECT comp, COUNT(*) AS s FROM c GROUP BY comp))
SELECT n AS n_vertices, m AS n_edges,
       m * 2000000 // (n * (n - 1)) AS density_ppm,
       dmax AS max_degree,
       2 * m * 1000 // n AS mean_degree_milli,
       t AS triangles,
       CASE WHEN w > 0 THEN 3 * t * 1000000 // w ELSE 0 END AS global_cc_ppm,
       nc AS n_components,
       giant * 1000000 // n AS giant_share_ppm
FROM base, m_, tri, cs
"""


ORACLES.update({"graph_profile": _GRAPH_PROFILE_SQL})
QUERIES.update({"graph_profile": q_graph_profile})


def q_hitting_time6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizon-truncated expected hitting time to the 4 smallest
    co-order vertices (pregel.hitting_time, 6 value-iteration rounds on
    the absorbing walk): the random-walk proximity measure dual to
    PageRank — "how many clicks from here to a hub" — used for
    dependency-closeness ranking on link graphs.  The SQL oracle
    unrolls the identical recursion; the single float surface is the
    per-round mean, rounded 6 d.p. only at output (Parity rules)."""
    # checkpointed: the targets collect and the hitting-time run each
    # consumed a separate co-order build otherwise
    sym = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))
    targets = [
        int(r["src"]) for r in sym.select("src").distinct().orderBy("src").limit(4).collect()
    ]
    out = pregel.hitting_time(sym, targets, n_iter=6)
    return out.select("id", F.round("h", 6).alias("hit_r")).orderBy("id")


def _hitting_sql(n_iter: int, n_targets: int) -> str:
    parts = [
        _COORDER_SQL.strip(),
        _SYM_SQL,
        "v AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        f"t AS (SELECT id FROM v ORDER BY id LIMIT {n_targets})",
        "h0 AS (SELECT id, 0.0 AS h FROM v)",
    ]
    for i in range(1, n_iter + 1):
        parts += [
            f"s{i} AS (SELECT e.dst AS id, SUM(h{i - 1}.h) AS s "
            f"FROM e JOIN h{i - 1} ON h{i - 1}.id = e.src GROUP BY e.dst)",
            f"h{i} AS (SELECT v.id, CASE WHEN v.id IN (SELECT id FROM t) THEN 0.0 "
            f"ELSE 1.0 + COALESCE(s{i}.s, 0) / v.deg END AS h "
            f"FROM v LEFT JOIN s{i} USING (id))",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(id AS BIGINT) AS id, ROUND(h, 6) AS hit_r FROM h{n_iter} ORDER BY id"""
    )


ORACLES.update({"hitting_time6": _hitting_sql(6, 4)})
QUERIES.update({"hitting_time6": q_hitting_time6})


def temporal_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal interaction edges (customer ↔ supplier, day): each
    order line is a timestamped contact, traversable in both directions
    at its day — the temporal-graph view of the order stream.  Supplier
    ids are offset by 1,000,000 into a disjoint vertex space; t is
    exact integer days since 1995-01-01 (no float parity surface)."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    inter = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_suppkey").alias("s"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias("t"),
        )
        .distinct()
    )
    fwd = inter.select(
        F.col("c").alias("src"), (F.lit(1_000_000) + F.col("s")).alias("dst"), "t"
    )
    bwd = inter.select(
        (F.lit(1_000_000) + F.col("s")).alias("src"), F.col("c").alias("dst"), "t"
    )
    return fwd.unionByName(bwd)


def q_temporal_reach4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting earliest-arrival reachability from the 3
    smallest customers (pregel.temporal_earliest_arrival, 4 relaxation
    rounds): an edge (u, v, t) is traversable only if t ≥ arr(u) — the
    "who could have been influenced by day X" query that static
    reachability over-approximates (a path through an EARLIER contact
    is not a causal path).  Exact integer arithmetic end-to-end; the
    oracle replays the relaxation round-for-round."""
    et = pregel._hard_cut(temporal_edges(spark, sf_dir))
    seeds = [
        int(r["src"])
        for r in et.where(F.col("src") < 1_000_000)
        .select("src")
        .distinct()
        .orderBy("src")
        .limit(3)
        .collect()
    ]
    out = pregel.temporal_earliest_arrival(et, seeds, n_iter=4)
    return out.select("id", "arr").orderBy("id")


def _temporal_reach_sql(n_iter: int, n_seeds: int) -> str:
    parts = [
        "inter AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s, "
        "date_diff('day', DATE '1995-01-01', o_orderdate) AS t "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey)",
        "e AS (SELECT c AS src, 1000000 + s AS dst, t FROM inter "
        "UNION ALL SELECT 1000000 + s, c, t FROM inter)",
        f"seeds AS (SELECT DISTINCT src AS id FROM e WHERE src < 1000000 "
        f"ORDER BY id LIMIT {n_seeds})",
        "a0 AS (SELECT id, CAST(0 AS BIGINT) AS arr FROM seeds)",
    ]
    for i in range(1, n_iter + 1):
        parts += [
            f"c{i} AS (SELECT e.dst AS id, MIN(e.t) AS arr FROM e "
            f"JOIN a{i - 1} ON a{i - 1}.id = e.src AND e.t >= a{i - 1}.arr "
            f"GROUP BY e.dst)",
            f"a{i} AS (SELECT id, MIN(arr) AS arr FROM "
            f"(SELECT * FROM a{i - 1} UNION ALL SELECT * FROM c{i}) GROUP BY id)",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(id AS BIGINT) AS id, CAST(arr AS BIGINT) AS arr FROM a{n_iter} ORDER BY id"""
    )


ORACLES.update({"temporal_reach4": _temporal_reach_sql(4, 3)})
QUERIES.update({"temporal_reach4": q_temporal_reach4})


def q_fiedler4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiedler-direction estimate on the co-order graph
    (pregel.fiedler_vector, 4 deflated power-iteration rounds on
    M = cI − L): the spectral-bisection axis — sorting vertices by this
    value is the classic min-ratio-cut partitioning heuristic, the
    spectral capability the registry's centrality family lacks.  The
    oracle unrolls the identical recursion (per-round re-center +
    L2 normalize); output rounded 6 d.p. (Parity rules)."""
    sym = _sym(coorder_edges(spark, sf_dir))
    out = pregel.fiedler_vector(sym, n_iter=4)
    return out.select("id", F.round("f", 6).alias("f_r")).orderBy("id")


def _fiedler_sql(n_iter: int) -> str:
    parts = [
        _COORDER_SQL.strip(),
        _SYM_SQL,
        "v AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        "cc AS (SELECT MAX(deg) + 1.0 AS c FROM v)",
        "y0 AS MATERIALIZED (SELECT id, CAST(id AS DOUBLE) AS y FROM v)",
        "z0 AS MATERIALIZED (SELECT id, y - (SELECT AVG(y) FROM y0) AS z FROM y0)",
        "x0 AS MATERIALIZED "
        "(SELECT id, z / (SELECT sqrt(sum(z * z)) FROM z0) AS x FROM z0)",
    ]
    # every CTE below is referenced more than once (x_{i-1} feeds both the
    # neighbor sum and the diagonal term; y/z feed their own mean/norm
    # scalar subqueries) — MATERIALIZED stops DuckDB re-inlining the whole
    # prefix chain exponentially (the densest_sub oracle lesson)
    for i in range(1, n_iter + 1):
        parts += [
            f"s{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(x{i - 1}.x) AS s "
            f"FROM e JOIN x{i - 1} ON x{i - 1}.id = e.src GROUP BY e.dst)",
            f"y{i} AS MATERIALIZED (SELECT v.id, "
            f"((SELECT c FROM cc) - v.deg) * x{i - 1}.x + COALESCE(s{i}.s, 0) AS y "
            f"FROM v JOIN x{i - 1} USING (id) LEFT JOIN s{i} USING (id))",
            f"z{i} AS MATERIALIZED "
            f"(SELECT id, y - (SELECT AVG(y) FROM y{i}) AS z FROM y{i})",
            f"x{i} AS MATERIALIZED "
            f"(SELECT id, z / (SELECT sqrt(sum(z * z)) FROM z{i}) AS x FROM z{i})",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(id AS BIGINT) AS id, ROUND(x, 6) AS f_r FROM x{n_iter} ORDER BY id"""
    )


ORACLES.update({"fiedler4": _fiedler_sql(4)})
QUERIES.update({"fiedler4": q_fiedler4})


def q_influence_seeds5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influence-maximization seeding on the co-order graph
    (pregel.influence_seeds, 5 single-discount greedy rounds): the
    campaign/probe placement primitive — beats plain top-5-degree
    because hub neighborhoods overlap.  Integer arithmetic end-to-end;
    the oracle replays the greedy selection round-for-round."""
    sym = _sym(coorder_edges(spark, sf_dir))
    return pregel.influence_seeds(sym, k=5).orderBy("rank")


def _influence_sql(k: int) -> str:
    parts = [
        _COORDER_SQL.strip(),
        _SYM_SQL,
        "v AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "ch0 AS (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS rank, "
        "CAST(NULL AS BIGINT) AS dd WHERE 1 = 0)",
    ]
    # ch{i-1} is referenced three times per round (discount join, NOT IN
    # screen, union) — MATERIALIZED stops exponential re-inlining
    for i in range(1, k + 1):
        parts += [
            f"t{i} AS MATERIALIZED (SELECT e.src AS id, CAST(COUNT(*) AS BIGINT) AS t "
            f"FROM e JOIN ch{i - 1} c ON e.dst = c.id GROUP BY e.src)",
            f"cand{i} AS MATERIALIZED (SELECT v.id, v.deg - COALESCE(t{i}.t, 0) AS dd "
            f"FROM v LEFT JOIN t{i} USING (id) "
            f"WHERE v.id NOT IN (SELECT id FROM ch{i - 1}))",
            f"pick{i} AS MATERIALIZED (SELECT id, CAST({i} AS BIGINT) AS rank, dd "
            f"FROM cand{i} ORDER BY dd DESC, id LIMIT 1)",
            f"ch{i} AS MATERIALIZED (SELECT * FROM ch{i - 1} UNION ALL "
            f"SELECT id, rank, dd FROM pick{i})",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT rank, id, dd FROM ch{k} ORDER BY rank"""
    )


ORACLES.update({"influence_seeds5": _influence_sql(5)})
QUERIES.update({"influence_seeds5": q_influence_seeds5})


def _community_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic planted-block community graph over customer keys
    (the scc_custgraph precedent: rule-derived graphs give the
    structure the TPC-H projection graphs lack — co-order σ maxes at
    0.23, copart is complete, so SCAN is vacuous on both): blocks of
    40 consecutive keys joined by 1-,2-,3-chords (interior σ = 6/7),
    sparse block-head bridges (σ ≈ 0.5 — below ε, so blocks are
    separate clusters)."""
    cust = load_table(spark, "customer", sf_dir).select(F.col("c_custkey").alias("c"))
    n = cust.count()
    parts = [
        cust.where(((F.col("c") % 40) + d < 40) & (F.col("c") + d < n)).select(
            F.col("c").alias("src"), (F.col("c") + d).alias("dst")
        )
        for d in (1, 2, 3)
    ]
    bridge = cust.where((F.col("c") % 40 == 0) & (F.col("c") + 40 < n)).select(
        F.col("c").alias("src"), (F.col("c") + 40).alias("dst")
    )
    out = parts[0]
    for p in parts[1:] + [bridge]:
        out = out.unionByName(p)
    return out


def q_scan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCAN structural clustering of the planted-block community graph
    (pregel.scan_clusters, ε = 0.7, μ = 3): cores / borders / outliers
    with min-id cluster labels — the community paradigm that separates
    hubs and noise from communities instead of forcing every vertex
    into one (Xu et al., KDD'07).  The ε-screen is exact integer
    cross-multiplication, components replay via the recursive-CTE
    hash-min pattern — no float anywhere."""
    return pregel.scan_clusters(
        _community_edges(spark, sf_dir), eps_num=7, eps_den=10, mu=3
    ).orderBy("id")


_SCAN_SQL = """
WITH RECURSIVE
cust AS (SELECT c_custkey AS c FROM customer),
n_ AS (SELECT COUNT(*) AS n FROM cust),
und AS (
    SELECT c AS src, c + d AS dst
    FROM cust, (SELECT UNNEST([1, 2, 3]) AS d)
    WHERE (c % 40) + d < 40 AND c + d < (SELECT n FROM n_)
    UNION ALL
    SELECT c AS src, c + 40 AS dst FROM cust
    WHERE c % 40 = 0 AND c + 40 < (SELECT n FROM n_)
),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
v AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
uv AS (SELECT src AS u, dst AS v FROM e WHERE src < dst),
cn AS MATERIALIZED (
    SELECT uv.u, uv.v, COUNT(*) AS cn
    FROM uv JOIN e a ON a.src = uv.u JOIN e b ON b.src = uv.v AND b.dst = a.dst
    GROUP BY uv.u, uv.v),
sig AS MATERIALIZED (
    SELECT uv.u, uv.v FROM uv
    LEFT JOIN cn USING (u, v)
    JOIN v du ON du.id = uv.u JOIN v dv ON dv.id = uv.v
    WHERE (COALESCE(cn.cn, 0) + 2) * (COALESCE(cn.cn, 0) + 2) * 100
          >= 49 * (du.d + 1) * (dv.d + 1)),
ssym AS MATERIALIZED (SELECT u, v FROM sig UNION ALL SELECT v AS u, u AS v FROM sig),
core AS MATERIALIZED (SELECT u AS id FROM ssym GROUP BY u HAVING COUNT(*) + 1 >= 3),
ce AS MATERIALIZED (
    SELECT s.u AS src, s.v AS dst FROM ssym s
    JOIN core a ON a.id = s.u JOIN core b ON b.id = s.v),
reach(id, comp) AS (
    SELECT id, id FROM core
    UNION
    SELECT ce.dst, r.comp FROM reach r JOIN ce ON ce.src = r.id WHERE r.comp < ce.dst),
cc AS MATERIALIZED (SELECT id, MIN(comp) AS cluster FROM reach GROUP BY id),
border AS MATERIALIZED (
    SELECT s.u AS id, MIN(cc.cluster) AS cluster FROM ssym s
    JOIN cc ON cc.id = s.v
    WHERE s.u NOT IN (SELECT id FROM core) GROUP BY s.u)
SELECT CAST(v.id AS BIGINT) AS id,
       CASE WHEN cc.cluster IS NOT NULL THEN 'core'
            WHEN b.cluster IS NOT NULL THEN 'border'
            ELSE 'outlier' END AS role,
       CAST(COALESCE(cc.cluster, b.cluster, -1) AS BIGINT) AS cluster
FROM v LEFT JOIN cc ON cc.id = v.id LEFT JOIN border b ON b.id = v.id
ORDER BY id
"""


ORACLES.update({"scan_clusters": _SCAN_SQL})
QUERIES.update({"scan_clusters": q_scan_clusters})


def q_edge_betweenness4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark EDGE betweenness (Girvan-Newman centrality; bounded-
    depth Brandes, 4 landmarks, depth 4) on the co-order graph
    restricted to parts < 400 (oracle-cost cap, same as betweenness4):
    the inter-community-bridge score whose iterative-removal form is
    the GN community algorithm.  Identical σ/δ recursion as
    betweenness4; the per-edge Brandes term is kept BEFORE vertex
    aggregation and folded onto the canonical undirected edge."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    sym = _sym(und)
    lm = [int(r[0]) for r in sym.select("src").distinct().orderBy("src").limit(4).collect()]
    eb, _stats = pregel.edge_betweenness_landmarks(sym, lm, max_depth=4)
    return eb.select("u", "v", F.round("eb", 6).alias("eb_r")).orderBy("u", "v")


def _edge_betweenness_sql(depth: int) -> str:
    parts = [
        "op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey < 400)",
        "und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
        "e AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)",
        "verts AS (SELECT DISTINCT src AS id FROM e)",
        "lm AS (SELECT id FROM verts ORDER BY id LIMIT 4)",
        "l0 AS MATERIALIZED (SELECT id AS source, id, CAST(1 AS BIGINT) AS sigma FROM lm)",
        "v0 AS (SELECT source, id FROM l0)",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"l{d} AS MATERIALIZED (SELECT t.source, t.id, SUM(t.sigma) AS sigma FROM ("
            f"SELECT p.source, e.dst AS id, p.sigma FROM l{d - 1} p "
            f"JOIN e ON e.src = p.id) t "
            f"WHERE NOT EXISTS (SELECT 1 FROM v{d - 1} v "
            f"WHERE v.source = t.source AND v.id = t.id) "
            f"GROUP BY t.source, t.id)"
        )
        parts.append(
            f"v{d} AS MATERIALIZED (SELECT source, id FROM v{d - 1} "
            f"UNION ALL SELECT source, id FROM l{d})"
        )
    parts.append(f"dd{depth} AS (SELECT source, id, 0.0 AS delta FROM l{depth})")
    for d in range(depth - 1, 0, -1):
        parts.append(
            f"dd{d} AS MATERIALIZED (SELECT l.source, l.id, "
            f"COALESCE(c.delta, 0.0) AS delta FROM l{d} l LEFT JOIN ("
            f"SELECT p.source, p.id, "
            f"SUM(CAST(p.sigma AS DOUBLE) / w.sigma * (1.0 + dw.delta)) AS delta "
            f"FROM l{d} p JOIN e ON e.src = p.id "
            f"JOIN l{d + 1} w ON w.source = p.source AND w.id = e.dst "
            f"JOIN dd{d + 1} dw ON dw.source = p.source AND dw.id = e.dst "
            f"GROUP BY p.source, p.id) c ON c.source = l.source AND c.id = l.id)"
        )
    # per-edge Brandes terms, one CTE per backward level INCLUDING level 0
    # (edges incident to the source carry edge betweenness)
    for d in range(depth - 1, -1, -1):
        parts.append(
            f"ce{d} AS MATERIALIZED (SELECT p.source, p.id AS a, e.dst AS b, "
            f"CAST(p.sigma AS DOUBLE) / w.sigma * (1.0 + dw.delta) AS c "
            f"FROM l{d} p JOIN e ON e.src = p.id "
            f"JOIN l{d + 1} w ON w.source = p.source AND w.id = e.dst "
            f"JOIN dd{d + 1} dw ON dw.source = p.source AND dw.id = e.dst)"
        )
    union = "\nUNION ALL ".join(f"SELECT a, b, c FROM ce{d}" for d in range(depth))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(und.src AS BIGINT) AS u, CAST(und.dst AS BIGINT) AS v,
               ROUND(COALESCE(SUM(x.c), 0.0), 6) AS eb_r
        FROM und LEFT JOIN (
            SELECT LEAST(a, b) AS cu, GREATEST(a, b) AS cv, c FROM ({union})
        ) x ON x.cu = und.src AND x.cv = und.dst
        GROUP BY und.src, und.dst ORDER BY u, v"""
    )


ORACLES.update({"edge_betweenness4": _edge_betweenness_sql(4)})
QUERIES.update({"edge_betweenness4": q_edge_betweenness4})


def q_coarsen_hem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One level of heavy-edge-matching coarsening
    (pregel.coarsen_hem) on the weighted demand graph (edge weight =
    order lines between the pair, the sssp_weighted graph): the
    multilevel-partitioning primitive — weight-greedy mutual-proposal
    matching, matched pairs contract to min-id supervertices, coarse
    edge weights re-aggregate.  All-integer; the oracle replays the
    matching round-for-round (12 unrolled rounds; past-fixpoint rounds
    are no-ops) and the contraction as one aggregate."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    dir_w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    coarse, _mapping, _stats = pregel.coarsen_hem(dir_w)
    return coarse.orderBy("u", "v")


def _coarsen_sql(rounds: int) -> str:
    parts = [
        "dw AS (SELECT o_custkey AS src, l_suppkey AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey GROUP BY 1, 2)",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "CAST(SUM(w) AS BIGINT) AS w FROM dw GROUP BY 1, 2)",
        "e0 AS (SELECT a, b, w FROM und)",
        "m0 AS (SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"inc{i} AS (SELECT a AS v, a, b, w FROM e{i - 1} "
            f"UNION ALL SELECT b, a, b, w FROM e{i - 1})",
            f"top{i} AS (SELECT v, a, b FROM ("
            f"SELECT v, a, b, ROW_NUMBER() OVER (PARTITION BY v "
            f"ORDER BY w DESC, a ASC, b ASC) AS rn FROM inc{i}) t WHERE rn = 1)",
            f"sel{i} AS MATERIALIZED (SELECT a, b FROM top{i} "
            f"GROUP BY a, b HAVING COUNT(*) = 2)",
            f"m{i} AS (SELECT a, b FROM m{i - 1} UNION ALL SELECT a, b FROM sel{i})",
            f"mv{i} AS (SELECT a AS v FROM sel{i} UNION ALL SELECT b FROM sel{i})",
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b, e.w FROM e{i - 1} e "
            f"WHERE e.a NOT IN (SELECT v FROM mv{i}) "
            f"AND e.b NOT IN (SELECT v FROM mv{i}))",
        ]
    parts += [
        "verts AS (SELECT a AS id FROM und UNION SELECT b FROM und)",
        f"pmap AS (SELECT a AS id, a AS s FROM m{rounds} "
        f"UNION ALL SELECT b, a FROM m{rounds})",
        "map_ AS MATERIALIZED (SELECT v.id, COALESCE(p.s, v.id) AS s "
        "FROM verts v LEFT JOIN pmap p ON p.id = v.id)",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + """
        SELECT CAST(LEAST(ma.s, mb.s) AS BIGINT) AS u,
               CAST(GREATEST(ma.s, mb.s) AS BIGINT) AS v,
               CAST(SUM(und.w) AS BIGINT) AS w
        FROM und JOIN map_ ma ON ma.id = und.a JOIN map_ mb ON mb.id = und.b
        WHERE ma.s != mb.s GROUP BY 1, 2 ORDER BY u, v"""
    )


ORACLES.update({"coarsen_hem": _coarsen_sql(12)})
QUERIES.update({"coarsen_hem": q_coarsen_hem})


def q_fiedler_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilevel spectral partitioning (the METIS composition): one
    HEM coarsening level of the weighted demand graph, the Fiedler
    direction computed ON THE COARSE GRAPH (4 deflated power-iteration
    rounds — coarsening is exactly what makes spectral methods
    affordable at scale), then projected back to every original vertex
    through the supervertex mapping.  Isolated supervertices carry 0.
    The oracle concatenates the coarsening replay with the fiedler
    recursion on the coarse edge set."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    dir_w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    coarse, mapping, _stats = pregel.coarsen_hem(dir_w)
    f = pregel.fiedler_vector(
        pregel.symmetrize(coarse.select(F.col("u").alias("src"), F.col("v").alias("dst"))),
        n_iter=4,
    )
    return (
        mapping.join(f.withColumnRenamed("id", "super"), "super", "left")
        .select(
            "id",
            "super",
            F.round(F.coalesce(F.col("f"), F.lit(0.0)), 6).alias("f_r"),
        )
        .orderBy("id")
    )


def _fiedler_coarse_sql(rounds: int, n_iter: int) -> str:
    # coarsening replay (same CTE chain as _coarsen_sql) ...
    coarsen_with = _coarsen_sql(rounds)
    prefix, _final = coarsen_with.rsplit("SELECT CAST(LEAST", 1)
    parts = [
        prefix.removeprefix("WITH ").rstrip().rstrip(","),
        """co AS MATERIALIZED (
    SELECT LEAST(ma.s, mb.s) AS u, GREATEST(ma.s, mb.s) AS v
    FROM und JOIN map_ ma ON ma.id = und.a JOIN map_ mb ON mb.id = und.b
    WHERE ma.s != mb.s GROUP BY 1, 2)""",
        "fe AS MATERIALIZED (SELECT u AS src, v AS dst FROM co "
        "UNION ALL SELECT v, u FROM co)",
        "fv AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg FROM fe GROUP BY src)",
        "fcc AS (SELECT MAX(deg) + 1.0 AS c FROM fv)",
        "fy0 AS MATERIALIZED (SELECT id, CAST(id AS DOUBLE) AS y FROM fv)",
        "fz0 AS MATERIALIZED (SELECT id, y - (SELECT AVG(y) FROM fy0) AS z FROM fy0)",
        "fx0 AS MATERIALIZED "
        "(SELECT id, z / (SELECT sqrt(sum(z * z)) FROM fz0) AS x FROM fz0)",
    ]
    for i in range(1, n_iter + 1):
        parts += [
            f"fs{i} AS MATERIALIZED (SELECT fe.dst AS id, SUM(fx{i - 1}.x) AS s "
            f"FROM fe JOIN fx{i - 1} ON fx{i - 1}.id = fe.src GROUP BY fe.dst)",
            f"fy{i} AS MATERIALIZED (SELECT fv.id, "
            f"((SELECT c FROM fcc) - fv.deg) * fx{i - 1}.x + COALESCE(fs{i}.s, 0) AS y "
            f"FROM fv JOIN fx{i - 1} USING (id) LEFT JOIN fs{i} USING (id))",
            f"fz{i} AS MATERIALIZED "
            f"(SELECT id, y - (SELECT AVG(y) FROM fy{i}) AS z FROM fy{i})",
            f"fx{i} AS MATERIALIZED "
            f"(SELECT id, z / (SELECT sqrt(sum(z * z)) FROM fz{i}) AS x FROM fz{i})",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(m.id AS BIGINT) AS id, CAST(m.s AS BIGINT) AS super,
       ROUND(COALESCE(fx{n_iter}.x, 0.0), 6) AS f_r
FROM map_ m LEFT JOIN fx{n_iter} ON fx{n_iter}.id = m.s
ORDER BY id"""
    )


ORACLES.update({"fiedler_coarse": _fiedler_coarse_sql(12, 4)})
QUERIES.update({"fiedler_coarse": q_fiedler_coarse})


# ---------------------------------------------------------------------------
# Session-8: completing the TPC-H classic family (the queries expressible
# on this schema — no partsupp table, so Q2/Q9/Q11/Q20 are out of scope).
# Same micro-unit discipline as Q3/Q5/Q10: revenue stays integer e4 units
# end-to-end so Zipf-sized group sums cannot drift cross-engine.


def q_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): one filter-aggregate over
    lineitem — shipdate in 1997, discount 5–7 %, quantity < 24.  The
    whole query is a single parquet scan with every predicate pushed
    down and a map-side-combinable integer sum (revenue here is
    price·discount, the amount that WOULD be recovered if the discount
    were eliminated).  Discount is compared as an integer percent so no
    float boundary can flip a row cross-engine."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_pct = F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & disc_pct.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                " * CAST(ROUND(l_discount * 100) AS BIGINT))"
            ).alias("forecast_rev_e4"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS forecast_rev_e4,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_q13_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): histogram of customers
    by order count INCLUDING zero-order customers — the left join that
    distinguishes Q13 from a plain groupBy.  The classic excludes
    "special request" orders by comment pattern; this schema has no
    comment column, so the analog exclusion is the lowest priority
    class.  Two aggregations: per-customer count (shuffle on custkey),
    then the count-of-counts histogram (tiny)."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum revenue
    from lineitems shipped in 1997Q1 — the scalar-subquery-max shape.
    Per-supplier revenue is one shuffle; the max is a 1-row aggregate
    broadcast back (never a sort of the full supplier list), so the
    plan is two scans + one broadcast join at any scale.  Ties all
    surface (integer revenue makes tie detection exact)."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.expr(f"SUM({_REV_SPARK})").alias("total_rev_e4"))
    mx = rev.agg(F.max("total_rev_e4").alias("mx"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev_e4 == F.col("mx"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "total_rev_e4")
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REV_DUCK}) AS BIGINT) AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_rev_e4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
ORDER BY s_suppkey
"""


ORACLES.update(
    {"q6_forecast": _Q6_SQL, "q13_order_dist": _Q13_SQL, "q15_top_supplier": _Q15_SQL}
)
QUERIES.update(
    {
        "q6_forecast": q_q6_forecast,
        "q13_order_dist": q_q13_order_dist,
        "q15_top_supplier": q_q15_top_supplier,
    }
)


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_1's share of PROMO-part
    revenue among AMERICA-region customers per order year 1995-1997.
    Both nation dimensions broadcast (customer side region-filtered,
    supplier side carries the flag); the share is a conditional sum over
    one fact join.  Numerator/denominator stay exact BIGINT e4 units;
    the published share is their single IEEE division rounded 9 d.p.
    (bit-identical cross-engine for identical int inputs)."""
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).where(F.col("r_name") == "AMERICA")
    cust_nat = nat.join(reg, nat.n_regionkey == reg.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    cust = load_table(spark, "customer", sf_dir).join(
        F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", (F.col("n_name") == "NATION_1").alias("is_target"))
    )
    part = load_table(spark, "part", sf_dir).where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    rev = F.expr(_REV_SPARK)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("is_target"), rev).otherwise(F.lit(0))).alias(
                "nation_rev_e4"
            ),
            F.sum(rev).alias("total_rev_e4"),
        )
        .select(
            "o_year",
            "nation_rev_e4",
            "total_rev_e4",
            F.round(
                F.col("nation_rev_e4").cast("double") / F.col("total_rev_e4"), 9
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


_Q8_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_DUCK} ELSE 0 END)
            AS BIGINT) AS nation_rev_e4,
       CAST(SUM({_REV_DUCK}) AS BIGINT) AS total_rev_e4,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_DUCK} ELSE 0 END)
                  AS BIGINT)
             / CAST(SUM({_REV_DUCK}) AS BIGINT), 9) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def q_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost to Brand#3
    lineitems whose quantity is below 20 % of that part's average.  The
    per-part average rides ONE window over the partkey shuffle (no
    second join); the 0.2·avg compare is the integer cross-mult
    5·qty_c·n < sum_qty_c so no float average can flip a boundary line.
    The brand filter broadcasts into the fact scan first, so the window
    only ever sees the selected parts' lines."""
    part = load_table(spark, "part", sf_dir).where(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    li = load_table(spark, "lineitem", sf_dir).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    qty_c = F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
    w = Window.partitionBy("l_partkey")
    stats = li.select(
        qty_c.alias("qty_c"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("price_c"),
        F.sum(qty_c).over(w).alias("sum_qty_c"),
        F.count("*").over(w).alias("n_part"),
    )
    return stats.where(F.lit(5) * F.col("qty_c") * F.col("n_part") < F.col("sum_qty_c")).agg(
        F.sum("price_c").cast("long").alias("lost_rev_c"),
        F.count("*").cast("long").alias("n_lines"),
    )


_Q17_SQL = """
WITH sel AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
             OVER (PARTITION BY l_partkey) AS sum_qty_c,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n_part
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3')
SELECT CAST(SUM(price_c) AS BIGINT) AS lost_rev_c,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM sel WHERE 5 * qty_c * n_part < sum_qty_c
"""


def q_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    brand/size/quantity branches OR-ed together.  The join stays a pure
    equi-join on partkey (the disjunction never leaks into the join
    condition — the classic Q19 planning trap that degrades to a
    nested-loop join); branch predicates evaluate post-join as one
    vectorized boolean.  Quantity compares as an exact integer."""
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey",
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("qty"),
        F.expr(_REV_SPARK).alias("rev_e4"),
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("qty").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("qty").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("qty").between(20, 30))
    )
    return j.where(branch).agg(
        F.sum("rev_e4").alias("revenue_e4"), F.count("*").cast("long").alias("n_lines")
    )


_Q19_SQL = f"""
SELECT CAST(SUM({_REV_DUCK}) AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
"""


ORACLES.update(
    {
        "q8_market_share": _Q8_SQL,
        "q17_small_qty": _Q17_SQL,
        "q19_disjunctive": _Q19_SQL,
    }
)
QUERIES.update(
    {
        "q8_market_share": q_q8_market_share,
        "q17_small_qty": q_q17_small_qty,
        "q19_disjunctive": q_q19_disjunctive,
    }
)


def q_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders placed in 1997Q3 with
    at least ONE lineitem shipped more than 60 days after the order
    date, counted per priority.  This is the order-level EXISTS — a
    left-semi join, never a join-then-distinct (the semi join stops at
    the first matching line per order, so no dedup shuffle of the fact
    join output).  Distinct from q12/late_shipments, which counts
    LINES; Q4 counts ORDERS."""
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.datediff(li.l_shipdate, orders.o_orderdate) > 60),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND date_diff('day', o_orderdate, l_shipdate) > 60)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): on multi-supplier
    orders, the suppliers who were the ONLY late one (late = any of
    their lines shipped > 90 days after the order date — the
    commitdate/receiptdate analog on this schema).  Shape: collapse
    lineitem to (order, supplier, late_any) with one groupBy, then the
    exists/not-exists pair becomes two window counts over the SAME
    orderkey partitioning (one shuffle, no self-joins).  Top-10 by wait
    count with deterministic tie-break."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90).cast("long")
            ).alias("late_any")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.select(
        "l_suppkey",
        "late_any",
        F.count("*").over(w).alias("n_supp"),
        F.sum("late_any").over(w).alias("n_late"),
    )
    waiting = flagged.where(
        (F.col("late_any") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(10)
    )


_Q21_SQL = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                  THEN 1 ELSE 0 END) AS late_any
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey),
flagged AS (
  SELECT l_suppkey, late_any,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         SUM(late_any) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per_os)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
WHERE late_any = 1 AND n_supp > 1 AND n_late = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey LIMIT 10
"""


ORACLES.update({"q4_priority_check": _Q4_SQL, "q21_waiting_supplier": _Q21_SQL})
QUERIES.update(
    {
        "q4_priority_check": q_q4_priority_check,
        "q21_waiting_supplier": q_q21_waiting_supplier,
    }
)


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 sketch over event user_ids (k=16 ±1-sign estimators):
    one map-side-combinable aggregation, one row per estimator with the
    signed sum and its square (E[x²] = Σ f_i² — the self-join-size /
    skew moment).  Every row also carries the exact F2 (1-row broadcast
    cross join) so the estimator error is on the result surface.  The
    sign hash is the SQL-replayable xorshift mix — the oracle rebuilds
    the sketch bit-for-bit."""
    from polar_spark.operators.sketches import ams_f2

    ev = load_table(spark, "events", sf_dir)
    sk = ams_f2(ev, "user_id", k=16, seed=11)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_f2"))
    )
    return sk.crossJoin(F.broadcast(exact)).orderBy("est_id")


def _ams_sign_sql(key: str, j: int, seed: int) -> str:
    x0 = f"(({key} * 2654435761 + {j * 1000003 + seed}) % 2147483648)"
    x1 = f"((xor({x0}, {x0} >> 13) * 1274126177) % 2147483648)"
    return f"(1 - 2 * (xor({x1}, {x1} >> 17) % 2))"


def _ams_f2_sql(k: int, seed: int) -> str:
    xs = ",\n       ".join(
        f"CAST(SUM({_ams_sign_sql('user_id', j, seed)}) AS BIGINT) AS x_{j}"
        for j in range(k)
    )
    ests = "\nUNION ALL ".join(
        f"SELECT {j} AS est_id, x_{j} AS x, x_{j} * x_{j} AS x2 FROM sk" for j in range(k)
    )
    return f"""
WITH sk AS (SELECT {xs} FROM events),
exact AS (SELECT CAST(SUM(f * f) AS BIGINT) AS exact_f2
          FROM (SELECT COUNT(*) AS f FROM events GROUP BY user_id)),
ests AS ({ests})
SELECT CAST(est_id AS BIGINT) AS est_id, x, x2, exact_f2
FROM ests, exact ORDER BY est_id
"""


def q_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection on the event stream: hourly
    event counts flagged when they deviate from the trailing-24h mean
    by more than 3 trailing standard deviations.  The heavy lift (hour
    bucketing + counts) is one distributed groupBy; the trailing window
    then runs on the PRE-AGGREGATED hour table (bounded by calendar
    hours, not data volume — ~9k rows/year at any sf).  The 3σ test is
    the all-integer cross-multiplication
    (n·x − S)² · n > 9 · (n·SS − S²) · n  ⇔  (x−μ)² > 9σ²
    so no float mean/variance can flip a boundary hour cross-engine."""
    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.orderBy("hour").rowsBetween(-24, -1)
    stats = hourly.select(
        "hour",
        "n_events",
        F.count("n_events").over(w).alias("n_trail"),
        F.sum("n_events").over(w).alias("s_trail"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss_trail"),
    )
    dev = F.col("n_trail") * F.col("n_events") - F.col("s_trail")
    var_n2 = F.col("n_trail") * F.col("ss_trail") - F.col("s_trail") * F.col("s_trail")
    return stats.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_events",
        F.col("n_trail").cast("long").alias("n_trail"),
        F.when(
            (F.col("n_trail") >= 12) & (dev * dev > F.lit(9) * var_n2),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_anomaly"),
    ).orderBy("hour")


_HOURLY_ANOMALY_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
stats AS (
  SELECT hour, n_events,
         COUNT(n_events) OVER w AS n_trail,
         SUM(n_events) OVER w AS s_trail,
         SUM(n_events * n_events) OVER w AS ss_trail
  FROM hourly
  WINDOW w AS (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT STRFTIME(hour, '%Y-%m-%d %H:%M:%S') AS hour, n_events,
       CAST(n_trail AS BIGINT) AS n_trail,
       CAST(CASE WHEN n_trail >= 12
                  AND (n_trail * n_events - s_trail) * (n_trail * n_events - s_trail)
                      > 9 * (n_trail * ss_trail - s_trail * s_trail)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM stats ORDER BY hour
"""


ORACLES.update({"ams_f2": _ams_f2_sql(16, 11), "hourly_anomaly": _HOURLY_ANOMALY_SQL})
QUERIES.update({"ams_f2": q_ams_f2, "hourly_anomaly": q_hourly_anomaly})


def q_ari_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index between successive label-propagation sweeps
    (round 2 vs round 3) on the co-order graph — the clustering-
    agreement audit (Hubert & Arabie 1985) used as a convergence-
    stability probe: ARI → 1 as LPA stops moving vertices, so the
    index is the principled "has the community pass settled?" signal
    (vs counting raw label flips, which ignores chance agreement).
    All pair-counting sufficient statistics (Σ C(n_ij,2), Σ C(a_i,2),
    Σ C(b_j,2), C(n,2)) stay exact BIGINT from one contingency
    groupBy; the index itself is one fixed-shape double expression
    over those four ints (bit-stable cross-engine), with the
    degenerate both-trivial case handled by an integer predicate."""
    e = coorder_edges(spark, sf_dir)
    # one 3-round LPA run; the round-2 snapshot is bit-identical to a
    # separate 2-round run (deterministic sweeps) — halves the graph
    # builds and the loop actions
    states = pregel.label_propagation_states(e, iters=(2, 3))
    l2, l3 = states[2], states[3]
    joined = (
        l2.select("id", F.col("label").alias("comp"))
        .join(l3.select("id", "label"), "id")
        .select("comp", "label")
    )
    cells = joined.groupBy("comp", "label").agg(F.count("*").alias("n"))
    pij = cells.agg(
        F.sum(F.expr("n * (n - 1) DIV 2")).cast("long").alias("sum_pairs_cells")
    )
    pa = (
        cells.groupBy("comp")
        .agg(F.sum("n").alias("a"))
        .agg(F.sum(F.expr("a * (a - 1) DIV 2")).cast("long").alias("sum_pairs_comp"))
    )
    pb = (
        cells.groupBy("label")
        .agg(F.sum("n").alias("b"))
        .agg(F.sum(F.expr("b * (b - 1) DIV 2")).cast("long").alias("sum_pairs_label"))
    )
    nn = joined.agg(
        F.expr("COUNT(*) * (COUNT(*) - 1) DIV 2").cast("long").alias("total_pairs")
    )
    return (
        pij.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .crossJoin(F.broadcast(nn))
        .select(
            "sum_pairs_cells",
            "sum_pairs_comp",
            "sum_pairs_label",
            "total_pairs",
            # denominator == 0  ⟺  nn·(a+b) == 2·a·b (integer test, no float
            # boundary) — both partitions are then the trivial single
            # cluster, identical by construction: ARI = 1 by convention.
            F.when(
                F.col("total_pairs")
                * (F.col("sum_pairs_comp") + F.col("sum_pairs_label"))
                == F.lit(2) * F.col("sum_pairs_comp") * F.col("sum_pairs_label"),
                F.lit(1.0),
            )
            .otherwise(
                F.round(
                    (
                        F.col("sum_pairs_cells").cast("double")
                        - F.col("sum_pairs_comp").cast("double")
                        * F.col("sum_pairs_label").cast("double")
                        / F.col("total_pairs").cast("double")
                    )
                    / (
                        (
                            F.col("sum_pairs_comp").cast("double")
                            + F.col("sum_pairs_label").cast("double")
                        )
                        / F.lit(2.0)
                        - F.col("sum_pairs_comp").cast("double")
                        * F.col("sum_pairs_label").cast("double")
                        / F.col("total_pairs").cast("double")
                    ),
                    9,
                )
            )
            .alias("ari_r"),
        )
    )


def _ari_sql() -> str:
    lpa_rounds = "".join("," + _LPA_ROUND.format(K=k, KM1=k - 1) for k in (1, 2, 3))
    return f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)
{lpa_rounds},
joined AS (SELECT a.label AS comp, b.label AS label
           FROM l2 a JOIN l3 b ON b.id = a.id),
cells AS (SELECT comp, label, COUNT(*) AS n FROM joined GROUP BY 1, 2),
pij AS (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS sum_pairs_cells FROM cells),
pa AS (SELECT CAST(SUM(a * (a - 1) // 2) AS BIGINT) AS sum_pairs_comp
       FROM (SELECT SUM(n) AS a FROM cells GROUP BY comp)),
pb AS (SELECT CAST(SUM(b * (b - 1) // 2) AS BIGINT) AS sum_pairs_label
       FROM (SELECT SUM(n) AS b FROM cells GROUP BY label)),
nn AS (SELECT CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS total_pairs FROM joined)
SELECT sum_pairs_cells, sum_pairs_comp, sum_pairs_label, total_pairs,
       CASE WHEN total_pairs * (sum_pairs_comp + sum_pairs_label)
                 = 2 * sum_pairs_comp * sum_pairs_label
            THEN 1.0
            ELSE ROUND((CAST(sum_pairs_cells AS DOUBLE)
              - CAST(sum_pairs_comp AS DOUBLE) * CAST(sum_pairs_label AS DOUBLE)
                / CAST(total_pairs AS DOUBLE))
             / ((CAST(sum_pairs_comp AS DOUBLE) + CAST(sum_pairs_label AS DOUBLE)) / 2.0
                - CAST(sum_pairs_comp AS DOUBLE) * CAST(sum_pairs_label AS DOUBLE)
                  / CAST(total_pairs AS DOUBLE)), 9) END AS ari_r
FROM pij, pa, pb, nn
"""


def q_tie_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granovetter weak-tie audit on the co-order graph: per-edge
    neighborhood overlap |Γu∩Γv| / |Γu∪Γv∖{u,v}| (Onnela et al., PNAS
    2007) bucketed into integer-exact deciles — the strength-of-weak-
    ties distribution (overlap 0 = local bridge).  The per-edge common-
    neighbor count is the same degree-bounded wedge join as the
    triangle counter (one shuffle class); the decile is pure integer
    DIV so no float boundary flips a bucket."""
    und = pregel._hard_cut(coorder_edges(spark, sf_dir))
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("x")).agg(F.count("*").alias("d"))
    # per-edge common-neighbor counts via oriented triangle enumeration
    # (pregel.edge_common_neighbors) — replaces the u-keyed wedge join
    # whose intermediate was Σ_u d(u)² rows (~143M at sf0.1); measured
    # 20.7 s → ~6 s (guide §2.3)
    cn = pregel.edge_common_neighbors(und).select(
        F.col("u"), F.col("v"), F.col("cn")
    )
    per_edge = (
        und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(cn, ["u", "v"], "left")
        .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
            (F.col("du") + F.col("dv") - F.lit(2)).alias("dd"),
        )
    )
    decile = F.when(
        F.col("dd") - F.col("cn") == 0, F.lit(10)
    ).otherwise(F.expr("(10 * cn) DIV (dd - cn)"))
    return (
        per_edge.select(decile.cast("long").alias("overlap_decile"))
        .groupBy("overlap_decile")
        .agg(F.count("*").cast("long").alias("n_edges"))
        .orderBy("overlap_decile")
    )


_TIE_OVERLAP_SQL = f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
deg AS (SELECT src AS x, COUNT(*) AS d FROM e GROUP BY src),
cn AS (SELECT p.src AS u, p.dst AS v, COUNT(*) AS cn
       FROM und p
       JOIN e su ON su.src = p.src
       JOIN e sv ON sv.src = p.dst AND sv.dst = su.dst
       GROUP BY p.src, p.dst),
per_edge AS (
  SELECT COALESCE(cn.cn, 0) AS cn, du.d + dv.d - 2 AS dd
  FROM und p
  LEFT JOIN cn ON cn.u = p.src AND cn.v = p.dst
  JOIN deg du ON du.x = p.src
  JOIN deg dv ON dv.x = p.dst)
SELECT CAST(CASE WHEN dd - cn = 0 THEN 10
                 ELSE (10 * cn) // (dd - cn) END AS BIGINT) AS overlap_decile,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM per_edge GROUP BY 1 ORDER BY 1
"""


ORACLES.update({"ari_partitions": _ari_sql(), "tie_overlap": _TIE_OVERLAP_SQL})
QUERIES.update({"ari_partitions": q_ari_partitions, "tie_overlap": q_tie_overlap})


def q_silhouette8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster silhouette score for the k=8 Lloyd's clustering
    (centroid variant: a = squared L2 to own centroid, b = to the
    nearest other; s = (b−a)/max(a,b)) — the cluster-quality audit
    read next to `kmeans8`.  Assignment + both distances come from ONE
    pure map stage (the 8 final centroids inlined as array literals,
    array_sort over (dist, cid) structs — no shuffle, no Python); the
    per-point s is rounded to integer micro-units BEFORE the per-
    cluster mean so the float sum is order-independent (the same
    micro-unit discipline as the revenue queries)."""
    from polar_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, "embeddings", sf_dir)
    _out, cents = kmeans_lloyd(emb, k=8, n_iter=3)
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
    ).where(F.col("embedding").isNotNull())

    def _d2(c: list[float]) -> F.Column:
        lit = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(F.col("v"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    arr = F.array_sort(
        F.array(
            *[
                F.struct(_d2(c).alias("d"), F.lit(j).alias("c"))
                for j, c in enumerate(cents)
            ]
        )
    )
    a_d, a_c, b_d = arr[0]["d"], arr[0]["c"], arr[1]["d"]
    s = F.when(F.greatest(a_d, b_d) == 0.0, F.lit(0.0)).otherwise(
        (b_d - a_d) / F.greatest(a_d, b_d)
    )
    pts = base.select(
        a_c.cast("long").alias("cluster"),
        F.round(s * 1000000).cast("long").alias("s_u"),
    )
    return (
        pts.groupBy("cluster")
        .agg(F.count("*").cast("long").alias("n_points"), F.sum("s_u").alias("sum_s_u"))
        .select(
            "cluster",
            "n_points",
            F.round(
                F.col("sum_s_u").cast("double")
                / (F.lit(1000000.0) * F.col("n_points").cast("double")),
                6,
            ).alias("mean_sil_r"),
        )
        .orderBy("cluster")
    )


def _silhouette_sql(k: int, n_iter: int) -> str:
    parts, dist = _kmeans_parts(k, n_iter)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
ranked AS (SELECT e.id, c.cid, {dist} AS d2,
                  ROW_NUMBER() OVER (PARTITION BY e.id
                                     ORDER BY {dist}, c.cid) AS rn
           FROM e CROSS JOIN c{n_iter} c),
ab AS (SELECT a.id, a.cid AS cluster, a.d2 AS a2, b.d2 AS b2
       FROM ranked a JOIN ranked b ON b.id = a.id AND b.rn = 2
       WHERE a.rn = 1),
su AS (SELECT cluster,
              CAST(ROUND(CASE WHEN GREATEST(a2, b2) = 0 THEN 0.0
                              ELSE (b2 - a2) / GREATEST(a2, b2) END
                         * 1000000) AS BIGINT) AS s_u
       FROM ab)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(CAST(SUM(s_u) AS DOUBLE) / (1000000.0 * COUNT(*)), 6) AS mean_sil_r
FROM su GROUP BY cluster ORDER BY cluster"""
    )


def q_greedy_cover4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage source selection (the submodular
    data-selection primitive): pick 4 of the 20 sources that together
    cover the most distinct word trigrams — which corpus shards buy
    the most vocabulary.  Lazy-greedy shape: each of the 4 rounds is
    one anti-join against the covered set + a 20-key gain aggregate +
    a 1-row argmax collect (the bounded chained-argmax posture of
    `kcenter8`); the (1−1/e) guarantee is the textbook one.  All
    counts integer; tie-break (gain DESC, source ASC) replays exactly
    in the oracle's chained scalar subqueries."""
    docs = load_table(spark, "documents", sf_dir)
    sg = (
        doc_trigrams(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "g")
        .distinct()
        .persist()
    )
    covered = None
    rows = []
    cum = 0
    for rank in range(1, 5):
        remaining = sg if covered is None else sg.join(covered, "g", "left_anti")
        best = (
            remaining.groupBy("source")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("source"))
            .limit(1)
            .collect()
        )[0]
        cum += int(best["gain"])
        rows.append((rank, best["source"], int(best["gain"]), cum))
        picked = sg.where(F.col("source") == best["source"]).select("g")
        covered = picked if covered is None else covered.unionByName(picked).distinct()
    sg.unpersist()
    return spark.createDataFrame(
        rows, "pick_rank long, source string, new_grams long, cum_grams long"
    )


def _greedy_cover_sql(n_picks: int) -> str:
    parts = [
        r"""toks AS (SELECT doc_id, source,
        generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
        UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
      FROM documents)""",
        """sg AS (SELECT DISTINCT a.source, a.w || ' ' || b.w || ' ' || c.w AS g
       FROM toks a
       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2)""",
    ]
    selects = []
    for k in range(1, n_picks + 1):
        prev_cov = f"c{k - 1}" if k > 1 else None
        remaining = (
            "sg"
            if prev_cov is None
            else f"(SELECT * FROM sg WHERE g NOT IN (SELECT g FROM {prev_cov}))"
        )
        parts.append(
            f"g{k} AS (SELECT source, COUNT(*) AS gain FROM {remaining} r{k} "
            f"GROUP BY source)"
        )
        parts.append(
            f"p{k} AS (SELECT source, gain FROM g{k} "
            f"ORDER BY gain DESC, source LIMIT 1)"
        )
        cov_body = f"SELECT g FROM sg WHERE source IN (SELECT source FROM p{k})"
        if prev_cov is not None:
            cov_body += f" UNION SELECT g FROM {prev_cov}"
        parts.append(f"c{k} AS MATERIALIZED (SELECT DISTINCT g FROM ({cov_body}) u)")
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS pick_rank, "
            f"(SELECT source FROM p{k}) AS source, "
            f"CAST((SELECT gain FROM p{k}) AS BIGINT) AS new_grams, "
            f"CAST((SELECT COUNT(*) FROM c{k}) AS BIGINT) AS cum_grams"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


ORACLES.update(
    {"silhouette8": _silhouette_sql(8, 3), "greedy_cover4": _greedy_cover_sql(4)}
)
QUERIES.update({"silhouette8": q_silhouette8, "greedy_cover4": q_greedy_cover4})


def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS revenue report — (nation), (segment),
    (nation, segment), and the grand total in ONE pass (completes the
    OLAP surface next to `cube_orders`/`rollup_lineitem`: arbitrary
    set lists, not just the cube/rollup lattices).  Spark expands the
    sets with a single Expand node over one shuffle — no 4× re-scan;
    `grouping_id` disambiguates the NULL-as-total rows exactly as the
    SQL standard does."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey", "c_mktsegment")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("price_c")
    )
    nat = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    )
    base.createOrReplaceTempView("gs_base")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment,
               CAST(grouping_id(n_name, c_mktsegment) AS BIGINT) AS gid,
               CAST(SUM(price_c) AS BIGINT) AS revenue_c,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM gs_base
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment), ())
        ORDER BY gid, n_name, c_mktsegment
        """
    )


_GROUPING_SETS_SQL = """
WITH base AS (
  SELECT n_name, c_mktsegment, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
SELECT n_name, c_mktsegment,
       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
       CAST(SUM(price_c) AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM base
GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment), ())
ORDER BY gid, n_name, c_mktsegment
"""


def q_rolling_revenue7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue per nation — the RANGE-frame window
    (value-based, not row-based: days with no orders still shrink the
    frame correctly) over the PRE-AGGREGATED (nation, day) table, so
    the window input is bounded by calendar days × nations, never raw
    order volume.  Day key is integer days-since-epoch; revenue stays
    integer cents."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("day"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("price_c"),
    )
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "day")
        .agg(F.sum("price_c").alias("rev_c"), F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("day").rangeBetween(-6, 0)
    return (
        daily.select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.col("day").cast("long").alias("day"),
            F.sum("rev_c").over(w).cast("long").alias("rev7_c"),
            F.sum("n").over(w).cast("long").alias("n7"),
        )
        .where(F.col("day") % 7 == 0)  # weekly report rows; window still daily
        .orderBy("c_nationkey", "day")
    )


_ROLLING7_SQL = """
WITH daily AS (
  SELECT c_nationkey,
         date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c,
         COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, CAST(day AS BIGINT) AS day,
       CAST(SUM(rev_c) OVER w AS BIGINT) AS rev7_c,
       CAST(SUM(n) OVER w AS BIGINT) AS n7
FROM daily
WINDOW w AS (PARTITION BY c_nationkey ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
QUALIFY day % 7 = 0
ORDER BY c_nationkey, day
"""


def q_edit_dist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-duplicate pairs by edit distance: block on the
    lowercased 16-char prefix (equi-join — candidates only ever meet
    inside a block, the scalable fuzzy-dedup shape), then Levenshtein
    on the 64-char heads, keep distance ≤ 8.  Levenshtein runs
    JVM-side (built-in, no Python); the blocking keeps the quadratic
    strictly inside prefix groups — the same bounded-candidates
    discipline as the MinHash band buckets."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.lower(F.substring("text", 1, 16)).alias("pfx"),
        F.substring("text", 1, 64).alias("s64"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pfx") == F.col("b.pfx")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.s64"), F.col("b.s64")).cast("long").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 8)
        .orderBy("id_a", "id_b")
    )


_EDIT_DIST_SQL = """
WITH d AS (SELECT doc_id, lower(substr(text, 1, 16)) AS pfx,
                  substr(text, 1, 64) AS s64
           FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.s64, b.s64) AS BIGINT) AS edit_dist
FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
WHERE levenshtein(a.s64, b.s64) <= 8
ORDER BY id_a, id_b
"""


def q_temporal_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal relay motifs (Paranjape et al., WSDM'17 class): for
    each supplier hub w, the number of time-respecting contact relays
    u→w→v with the second contact 1–3 days after the first and v ≠ u.
    Counted WITHOUT pair enumeration: two RANGE-frame window counts
    over the same (hub, day) ordering — total relays = Σ(later
    contacts in window) minus Σ(later contacts by the SAME customer),
    so the per-hub quadratic never materializes (the frame is a
    value-range scan).  Top-15 hubs, all-integer."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    contacts = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("w"),
            F.col("o_custkey").alias("u"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("t"),
        )
        .distinct()
    )
    w_all = Window.partitionBy("w").orderBy("t").rangeBetween(1, 3)
    w_same = Window.partitionBy("w", "u").orderBy("t").rangeBetween(1, 3)
    per_contact = contacts.select(
        "w",
        (F.count("*").over(w_all) - F.count("*").over(w_same)).alias("relays"),
    )
    return (
        per_contact.groupBy("w")
        .agg(F.sum("relays").cast("long").alias("n_relays"))
        .select(F.col("w").cast("long").alias("w"), "n_relays")
        .orderBy(F.desc("n_relays"), "w")
        .limit(15)
    )


_TEMPORAL_MOTIFS_SQL = """
WITH contacts AS (
  SELECT DISTINCT l_suppkey AS w, o_custkey AS u,
         date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS t
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
per_contact AS (
  SELECT w,
         COUNT(*) OVER (PARTITION BY w ORDER BY t
                        RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
         - COUNT(*) OVER (PARTITION BY w, u ORDER BY t
                          RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS relays
  FROM contacts)
SELECT CAST(w AS BIGINT) AS w, CAST(SUM(relays) AS BIGINT) AS n_relays
FROM per_contact GROUP BY w
ORDER BY n_relays DESC, w LIMIT 15
"""


ORACLES.update(
    {
        "grouping_sets_orders": _GROUPING_SETS_SQL,
        "rolling_revenue7": _ROLLING7_SQL,
        "edit_dist_pairs": _EDIT_DIST_SQL,
        "temporal_motifs": _TEMPORAL_MOTIFS_SQL,
    }
)
QUERIES.update(
    {
        "grouping_sets_orders": q_grouping_sets_orders,
        "rolling_revenue7": q_rolling_revenue7,
        "edit_dist_pairs": q_edit_dist_pairs,
        "temporal_motifs": q_temporal_motifs,
    }
)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: one lag window per user (ordered ts, event_id
    tie-break — the sessionize ordering), then a 25-key count
    aggregate; row-normalized probabilities in exact integer ppm
    (count·10⁶ DIV row_total).  The user-behavior model behind
    next-event prediction and funnel-leak hunting; window input is
    co-partitioned by user so the lag never crosses executors."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).where(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    wrow = Window.partitionBy("from_type")
    return (
        counts.withColumn("row_total", F.sum("n").over(wrow))
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("n * 1000000 DIV row_total").cast("long").alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events),
counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
FROM counts ORDER BY from_type, to_type
"""


ORACLES.update({"event_transitions": _EVENT_TRANSITIONS_SQL})
QUERIES.update({"event_transitions": q_event_transitions})


def q_weighted_jaccard20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Jaccard (Ruzicka) similarity between suppliers on their
    part-quantity vectors, evaluated ONLY on existing co-part edges —
    never all pairs: the candidate set is the edge table, so the cost
    is Σ|shared parts| per edge, not |S|².  Uses the identity
    Σmax = T_a + T_b − Σmin (per-supplier totals are a broadcastable
    dimension), so only the shared-part Σmin needs the pair join.
    Quantities stay integer centi-units; the similarity is exact
    integer ppm.  Top-20, deterministic tie-break."""
    li = load_table(spark, "lineitem", sf_dir)
    ps = li.groupBy(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).agg(F.sum(F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")).alias("q"))
    totals = ps.groupBy("s").agg(F.sum("q").alias("t"))
    # the pair set sharing ≥1 part IS the co-part edge set, so Σmin can
    # be grouped by PART and pair-expanded JVM-side (suppliers per part
    # are bounded) instead of joining every co-part edge against both
    # endpoints' full part vectors — the former intermediate was
    # |edges|·|parts per supplier| (~35M rows at sf0.1), this one is
    # Σ_p C(|suppliers_p|, 2) (~320k) — guide §2.3.
    grouped = (
        ps.groupBy("p")
        .agg(F.sort_array(F.collect_list(F.struct("s", "q"))).alias("sq"))
        .where(F.size("sq") >= 2)
    )
    shared = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(sq, (x, i) -> "
                    "transform(slice(sq, i + 2, size(sq)), "
                    "y -> struct(x.s AS src, y.s AS dst, least(x.q, y.q) AS m))))"
                )
            ).alias("_t")
        )
        .select("_t.src", "_t.dst", "_t.m")
        .groupBy("src", "dst")
        .agg(F.sum("m").alias("sum_min"))
    )
    ta = totals.select(F.col("s").alias("src"), F.col("t").alias("ta"))
    tb = totals.select(F.col("s").alias("dst"), F.col("t").alias("tb"))
    return (
        shared.join(ta, "src")
        .join(tb, "dst")
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.expr("sum_min * 1000000 DIV (ta + tb - sum_min)")
            .cast("long")
            .alias("wj_ppm"),
        )
        .orderBy(F.desc("wj_ppm"), "src", "dst")
        .limit(20)
    )


_WEIGHTED_JACCARD_SQL = f"""
WITH {_COPART_SQL},
ps AS (SELECT l_suppkey AS s, l_partkey AS p,
              SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS q
       FROM lineitem GROUP BY 1, 2),
totals AS (SELECT s, SUM(q) AS t FROM ps GROUP BY s),
shared AS (SELECT u.src, u.dst, SUM(LEAST(a.q, b.q)) AS sum_min
           FROM und u
           JOIN ps a ON a.s = u.src
           JOIN ps b ON b.s = u.dst AND b.p = a.p
           GROUP BY u.src, u.dst)
SELECT CAST(sh.src AS BIGINT) AS src, CAST(sh.dst AS BIGINT) AS dst,
       CAST(sum_min * 1000000 // (ta.t + tb.t - sum_min) AS BIGINT) AS wj_ppm
FROM shared sh
JOIN totals ta ON ta.s = sh.src
JOIN totals tb ON tb.s = sh.dst
ORDER BY wj_ppm DESC, src, dst LIMIT 20
"""


ORACLES.update({"weighted_jaccard20": _WEIGHTED_JACCARD_SQL})
QUERIES.update({"weighted_jaccard20": q_weighted_jaccard20})


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: directed
    rules part_a → part_b ranked by lift, with support/confidence in
    exact integer ppm.  The pair join is keyed on the order, so cost is
    Σ basket² (TPC-H baskets are ≤ ~10 lines) — never |parts|²; basket
    totals and the order count are tiny broadcast dimensions.  Lift
    rides one integer cross-multiplication, no floats anywhere."""
    li = load_table(spark, "lineitem", sf_dir)
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = items.select("o").distinct().agg(
        F.count("*").cast("long").alias("n_orders")
    )
    item_n = items.groupBy("p").agg(F.count("*").cast("long").alias("n_item"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("ante"), F.col("b.p").alias("cons"))
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    na = F.broadcast(item_n.select(F.col("p").alias("ante"), F.col("n_item").alias("n_a")))
    nb = F.broadcast(item_n.select(F.col("p").alias("cons"), F.col("n_item").alias("n_b")))
    return (
        pairs.join(na, "ante")
        .join(nb, "cons")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("ante").cast("long").alias("ante"),
            F.col("cons").cast("long").alias("cons"),
            "n_ab",
            F.expr("n_ab * 1000000 DIV n_a").cast("long").alias("conf_ppm"),
            F.expr("n_ab * n_orders * 1000000 DIV (n_a * n_b)")
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "ante", "cons")
        .limit(20)
    )


_ASSOC_RULES_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
tot AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM items),
item_n AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_item FROM items GROUP BY p),
pairs AS (
  SELECT a.p AS ante, b.p AS cons, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b ON a.o = b.o AND a.p <> b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT CAST(ante AS BIGINT) AS ante, CAST(cons AS BIGINT) AS cons, n_ab,
       CAST(n_ab * 1000000 // na.n_item AS BIGINT) AS conf_ppm,
       CAST(n_ab * n_orders * 1000000 // (na.n_item * nb.n_item) AS BIGINT) AS lift_ppm
FROM pairs
JOIN item_n na ON na.p = pairs.ante
JOIN item_n nb ON nb.p = pairs.cons
CROSS JOIN tot
ORDER BY lift_ppm DESC, ante, cons LIMIT 20
"""


ORACLES.update({"assoc_rules": _ASSOC_RULES_SQL})
QUERIES.update({"assoc_rules": q_assoc_rules})


def q_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 essence (product-type profit): revenue from 'blue'
    parts by supplier nation × order year.  The test schema has no
    partsupp, so profit is the discounted-revenue term only (exact
    integer e4 cents, same engineering as Q3/Q5).  Plan shape: part
    filter broadcasts into the lineitem scan, supplier→nation is a
    two-hop broadcast dimension, and the only shuffle joins the two
    fact tables on orderkey before one small group-by."""
    part = (
        load_table(spark, "part", sf_dir)
        .where(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    nat = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.expr(f"SUM({_REV_SPARK})").alias("sum_profit_e4"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV_DUCK}) AS BIGINT) AS sum_profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%blue%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


ORACLES.update({"q9_profit": _Q9_SQL})
QUERIES.update({"q9_profit": q_q9_profit})


def q_friendship_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friendship paradox audit on the co-order graph: the
    edge-perspective mean neighbor degree Σd²/Σd versus the vertex
    mean degree Σd/n, plus the fraction of vertices whose mean
    neighbor degree exceeds their own (compared as the exact integer
    cross-product Σ_nbr d > d² — no division).  One degree aggregate
    and one degree-join — both linear in |E|; everything BIGINT."""
    und = coorder_edges(spark, sf_dir)
    e = _sym(und)
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    nbr = (
        e.join(deg.select(F.col("src").alias("dst"), F.col("deg").alias("deg_n")), "dst")
        .groupBy("src")
        .agg(F.sum("deg_n").alias("s_nbr"))
    )
    per_v = deg.join(nbr, "src").select(
        "deg", "s_nbr", (F.col("s_nbr") > F.col("deg") * F.col("deg")).alias("parad")
    )
    return per_v.agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.sum(F.col("parad").cast("long")).cast("long").alias("n_paradox"),
        F.expr("SUM(CAST(parad AS BIGINT)) * 1000000 DIV COUNT(*)")
        .cast("long")
        .alias("paradox_ppm"),
        F.expr("SUM(deg) * 1000000 DIV COUNT(*)").cast("long").alias("mean_deg_ppm"),
        F.expr("SUM(deg * deg) * 1000000 DIV SUM(deg)")
        .cast("long")
        .alias("nbr_mean_deg_ppm"),
    )


_FRIENDSHIP_PARADOX_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
nbr AS (SELECT e.src, SUM(d2.deg) AS s_nbr
        FROM e JOIN deg d2 ON d2.src = e.dst GROUP BY e.src),
per_v AS (SELECT deg.deg, nbr.s_nbr, nbr.s_nbr > deg.deg * deg.deg AS parad
          FROM deg JOIN nbr ON nbr.src = deg.src)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(CAST(parad AS BIGINT)) AS BIGINT) AS n_paradox,
       CAST(SUM(CAST(parad AS BIGINT)) * 1000000 // COUNT(*) AS BIGINT) AS paradox_ppm,
       CAST(SUM(deg) * 1000000 // COUNT(*) AS BIGINT) AS mean_deg_ppm,
       CAST(SUM(deg * deg) * 1000000 // SUM(deg) AS BIGINT) AS nbr_mean_deg_ppm
FROM per_v
"""


ORACLES.update({"friendship_paradox": _FRIENDSHIP_PARADOX_SQL})
QUERIES.update({"friendship_paradox": q_friendship_paradox})


def q_knn_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-assortativity curve knn(k) on the co-order graph: mean
    neighbor degree per degree class (the shape behind the scalar
    degree_assortativity — decaying knn(k) = disassortative hubs).
    Because deg is constant within a class, the class mean of
    s_nbr/deg is Σs_nbr · 10⁶ DIV (k·n_k) — exact integers, no
    per-vertex division.  One degree aggregate + one degree join."""
    und = coorder_edges(spark, sf_dir)
    e = _sym(und)
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    nbr = (
        e.join(deg.select(F.col("src").alias("dst"), F.col("deg").alias("deg_n")), "dst")
        .groupBy("src")
        .agg(F.sum("deg_n").alias("s_nbr"))
    )
    return (
        deg.join(nbr, "src")
        .groupBy("deg")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.expr("SUM(s_nbr) * 1000000 DIV (deg * COUNT(*))")
            .cast("long")
            .alias("knn_ppm"),
        )
        .orderBy("deg")
    )


_KNN_CURVE_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
nbr AS (SELECT e.src, SUM(d2.deg) AS s_nbr
        FROM e JOIN deg d2 ON d2.src = e.dst GROUP BY e.src)
SELECT deg.deg, CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(s_nbr) * 1000000 // (deg.deg * COUNT(*)) AS BIGINT) AS knn_ppm
FROM deg JOIN nbr ON nbr.src = deg.src
GROUP BY deg.deg ORDER BY deg.deg
"""


ORACLES.update({"knn_curve": _KNN_CURVE_SQL})
QUERIES.update({"knn_curve": q_knn_curve})


def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value decile table: NTILE(10) over exact
    integer order-revenue cents (deterministic ordering: revenue desc,
    custkey), per-decile customer count / revenue / share-of-total in
    ppm.  The whale curve behind revenue_concentration, as a full
    table.  NTILE is one global sort of the CUSTOMER aggregate (tiny
    vs the fact table) — at 100 TB the per-customer rollup shuffles
    once and the decile window runs on the reduced table."""
    orders = load_table(spark, "orders", sf_dir)
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("rev_cents")
    )
    w = Window.orderBy(F.desc("rev_cents"), "o_custkey")
    tot = Window.partitionBy()
    return (
        rev.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("rev_cents").alias("rev_cents"),
        )
        .withColumn(
            "share_ppm",
            F.expr("rev_cents * 1000000 DIV SUM(rev_cents) OVER ()").cast("long"),
        )
        .orderBy("decile")
    )


_CUSTOMER_DECILES_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY o_custkey),
tiles AS (
  SELECT rev_cents,
         CAST(NTILE(10) OVER (ORDER BY rev_cents DESC, o_custkey) AS BIGINT) AS decile
  FROM rev),
agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
  FROM tiles GROUP BY decile)
SELECT decile, n_customers, rev_cents,
       CAST(rev_cents * 1000000 // SUM(rev_cents) OVER () AS BIGINT) AS share_ppm
FROM agg ORDER BY decile
"""


ORACLES.update({"customer_deciles": _CUSTOMER_DECILES_SQL})
QUERIES.update({"customer_deciles": q_customer_deciles})


def q_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly order revenue in exact
    cents plus growth vs the previous month in ppm.  Growth rides
    cur·10⁶ DIV prev − 10⁶ so the integer division only ever sees
    positive operands — Spark DIV truncates toward zero while DuckDB
    // floors, and the two disagree on negatives; keeping the quotient
    positive sidesteps the mismatch exactly."""
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("rev_cents")
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .select(
            "month",
            "rev_cents",
            F.expr(
                "CASE WHEN prev_cents IS NULL THEN NULL"
                " ELSE rev_cents * 1000000 DIV prev_cents - 1000000 END"
            )
            .cast("long")
            .alias("growth_ppm"),
        )
        .orderBy("month")
    )


_REVENUE_MOM_SQL = """
WITH monthly AS (
  SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1),
lagged AS (
  SELECT month, rev_cents,
         LAG(rev_cents) OVER (ORDER BY month) AS prev_cents
  FROM monthly)
SELECT month, CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST(CASE WHEN prev_cents IS NULL THEN NULL
                 ELSE rev_cents * 1000000 // prev_cents - 1000000 END AS BIGINT)
         AS growth_ppm
FROM lagged ORDER BY month
"""


ORACLES.update({"revenue_mom": _REVENUE_MOM_SQL})
QUERIES.update({"revenue_mom": q_revenue_mom})


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` sessionization of the events table
    (30-min gap): per-session event count, distinct-type count, and
    exact span seconds.  The batch twin of
    ``streaming.session_stream.sessionize_stream`` — same engine
    operator that runs unbounded with watermark state; the oracle
    replays Spark's [start, start+gap) merge semantics as classic
    gaps-and-islands SQL (new session iff Δt ≥ gap).  Top-50 sessions
    by n_events with full deterministic tie-break."""
    from polar_spark.streaming.session_stream import sessionize_batch

    ev = load_table(spark, "events", sf_dir)
    return (
        sessionize_batch(ev, gap="30 minutes")
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
            "n_events",
            "n_types",
            "span_sec",
        )
        .orderBy(F.desc("n_events"), "user_id", "s_start")
        .limit(50)
    )


_SESSION_WINDOWS_SQL = """
WITH ev AS (
  -- microsecond precision: Spark merges session windows on exact
  -- timestamps; EPOCH() would compare lossy doubles
  SELECT user_id, ts, event_type, EPOCH_US(ts) AS us FROM events),
lagged AS (
  SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
  FROM ev),
marked AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM lagged),
ids AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked)
SELECT CAST(user_id AS BIGINT) AS user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
       STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       -- unix_timestamp truncates each endpoint to whole seconds
       CAST(MAX(us) // 1000000 - MIN(us) // 1000000 AS BIGINT) AS span_sec
FROM ids GROUP BY user_id, sess_id
ORDER BY n_events DESC, user_id, s_start LIMIT 50
"""


ORACLES.update({"session_windows": _SESSION_WINDOWS_SQL})
QUERIES.update({"session_windows": q_session_windows})


def q_partition_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition 'performance' of the 2-round LPA communities on the
    co-order graph: the fraction of vertex PAIRS the partition
    classifies correctly — intra-community edges plus non-adjacent
    inter-community pairs, over C(n,2).  Complements conductance
    (per-community) and modularity (null-model) with the pair-counting
    view; everything is closed-form from |V|, |E|, intra-edge count and
    community sizes — exact BIGINT, no pair enumeration anywhere."""
    # one checkpointed co-order build shared by the LPA run and the
    # final edge-label plan (was built twice)
    und = pregel._hard_cut(coorder_edges(spark, sf_dir))
    labels, _ = pregel.label_propagation(und, max_iter=2)
    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    el = und.join(
        lab.withColumnRenamed("id", "src").withColumnRenamed("label", "ls"), "src"
    ).join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "ld"), "dst")
    counts = el.agg(
        F.count("*").cast("long").alias("m"),
        F.sum((F.col("ls") == F.col("ld")).cast("long")).cast("long").alias("intra_e"),
    )
    sizes = lab.groupBy("label").agg(F.count("*").cast("long").alias("nc"))
    pairs = sizes.agg(
        F.sum("nc").cast("long").alias("n"),
        F.sum(F.expr("nc * (nc - 1) DIV 2")).cast("long").alias("intra_pairs"),
    )
    return (
        counts.crossJoin(F.broadcast(pairs))
        .select(
            "n",
            "m",
            "intra_e",
            "intra_pairs",
            F.expr(
                "(2 * intra_e + n * (n - 1) DIV 2 - intra_pairs - m) * 1000000"
                " DIV (n * (n - 1) DIV 2)"
            )
            .cast("long")
            .alias("perf_ppm"),
        )
    )


def _partition_performance_sql() -> str:
    lpa_rounds = "".join("," + _LPA_ROUND.format(K=k, KM1=k - 1) for k in (1, 2))
    return f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)
{lpa_rounds},
el AS (SELECT a.label AS ls, b.label AS ld
       FROM und JOIN l2 a ON a.id = und.src JOIN l2 b ON b.id = und.dst),
counts AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                  CAST(SUM(CASE WHEN ls = ld THEN 1 ELSE 0 END) AS BIGINT) AS intra_e
           FROM el),
sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nc FROM l2 GROUP BY label),
pairs AS (SELECT CAST(SUM(nc) AS BIGINT) AS n,
                 CAST(SUM(nc * (nc - 1) // 2) AS BIGINT) AS intra_pairs
          FROM sizes)
SELECT n, m, intra_e, intra_pairs,
       CAST((2 * intra_e + n * (n - 1) // 2 - intra_pairs - m) * 1000000
            // (n * (n - 1) // 2) AS BIGINT) AS perf_ppm
FROM counts CROSS JOIN pairs
"""


ORACLES.update({"partition_performance": _partition_performance_sql()})
QUERIES.update({"partition_performance": q_partition_performance})


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness per user (Goh-Barabási B = (σ−μ)/(σ+μ)
    over consecutive event gaps): B→−1 periodic, 0 Poisson, →1 bursty.
    Gaps are exact integer seconds (µs-ordered lag, floored µs diff);
    σ and μ derive from the BIGINT sufficient stats (n, Σg, Σg²) with
    one identical double expression on both engines, so the rounded
    output cannot drift.  Top-30 burstiest users, ≥5 gaps, span > 0."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .where(F.col("prev_us").isNotNull())
        .select("user_id", F.expr("(us - prev_us) DIV 1000000").alias("g"))
    )
    stats = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("g").cast("long").alias("sg"),
            F.sum(F.expr("g * g")).cast("long").alias("sg2"),
        )
        .where((F.col("n_gaps") >= 5) & (F.col("sg") > 0))
    )
    return (
        stats.select(
            F.col("user_id").cast("long").alias("user_id"),
            "n_gaps",
            F.round(F.expr("sg / n_gaps"), 6).alias("mean_gap_sec"),
            F.round(
                F.expr(
                    "(SQRT(sg2 / n_gaps - (sg / n_gaps) * (sg / n_gaps)) - sg / n_gaps)"
                    " / (SQRT(sg2 / n_gaps - (sg / n_gaps) * (sg / n_gaps)) + sg / n_gaps)"
                ),
                6,
            ).alias("burstiness_r"),
        )
        .orderBy(F.desc("burstiness_r"), "user_id")
        .limit(30)
    )


_BURSTINESS_SQL = """
WITH ev AS (SELECT user_id, EPOCH_US(ts) AS us FROM events),
lagged AS (SELECT user_id, us,
                  LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
           FROM ev),
gaps AS (SELECT user_id, (us - prev_us) // 1000000 AS g
         FROM lagged WHERE prev_us IS NOT NULL),
stats AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(g) AS BIGINT) AS sg, CAST(SUM(g * g) AS BIGINT) AS sg2
          FROM gaps GROUP BY user_id
          HAVING COUNT(*) >= 5 AND SUM(g) > 0)
SELECT CAST(user_id AS BIGINT) AS user_id, n_gaps,
       ROUND(sg / n_gaps, 6) AS mean_gap_sec,
       ROUND((SQRT(sg2 / n_gaps - (sg / n_gaps) * (sg / n_gaps)) - sg / n_gaps)
             / (SQRT(sg2 / n_gaps - (sg / n_gaps) * (sg / n_gaps)) + sg / n_gaps),
             6) AS burstiness_r
FROM stats
ORDER BY burstiness_r DESC, user_id LIMIT 30
"""


ORACLES.update({"burstiness": _BURSTINESS_SQL})
QUERIES.update({"burstiness": q_burstiness})


def q_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) proper: per (returnflag,
    linestatus) the sums/averages/count over shipped lineitems, every
    money column engineered exact — qty in centi-units, price in
    cents, disc-price in e4, charge = price·(1−disc)·(1+tax) in e6
    cents — and the averages as integer DIV of those sums (floor; both
    engines).  One map-side-combinable aggregate over the fact scan
    with the date filter pushed to parquet."""
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    cents = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    disc = "CAST(ROUND(l_discount * 100) AS BIGINT)"
    tax = "CAST(ROUND(l_tax * 100) AS BIGINT)"
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")).alias("sum_qty_centi"),
            F.sum(F.expr(cents)).alias("sum_base_cents"),
            F.sum(F.expr(f"{cents} * (100 - {disc})")).alias("sum_disc_e4"),
            F.sum(F.expr(f"{cents} * (100 - {disc}) * (100 + {tax})")).alias("sum_charge_e6"),
            F.count("*").cast("long").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty_centi",
            "sum_base_cents",
            "sum_disc_e4",
            "sum_charge_e6",
            F.expr("sum_qty_centi DIV count_order").cast("long").alias("avg_qty_centi"),
            F.expr("sum_base_cents DIV count_order").cast("long").alias("avg_price_cents"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_centi,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
              * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
         CAST(COUNT(*) AS BIGINT) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, sum_qty_centi, sum_base_cents,
       sum_disc_e4, sum_charge_e6,
       CAST(sum_qty_centi // count_order AS BIGINT) AS avg_qty_centi,
       CAST(sum_base_cents // count_order AS BIGINT) AS avg_price_cents,
       count_order
FROM agg ORDER BY l_returnflag, l_linestatus
"""


ORACLES.update({"q1_pricing": _Q1_SQL})
QUERIES.update({"q1_pricing": q_q1_pricing})


def q_partition_cut_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-cut audit of three 8-way partitioning strategies on the
    co-order graph — the quantity that decides shuffle volume for
    every iterative operator at 100 TB: hash (pmod id), range (id·8
    DIV (max+1)), and community-aware (2-round LPA label mod 8).  An
    edge is cut when its endpoints land in different partitions; cut
    fraction in exact ppm.  Community-aware placement should cut far
    fewer edges — the measured justification for bucketing the edge
    table by community/range rather than by raw hash."""
    # one checkpointed co-order build shared by the LPA run, the max-id
    # aggregate and the final cut plan (was built three times)
    und = pregel._hard_cut(coorder_edges(spark, sf_dir))
    labels, _ = pregel.label_propagation(und, max_iter=2)
    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    mx = und.agg(
        F.greatest(F.max("src"), F.max("dst")).cast("long").alias("mx")
    )
    el = (
        und.join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "ld"), "dst")
        .crossJoin(F.broadcast(mx))
    )
    return el.agg(
        F.count("*").cast("long").alias("m"),
        F.sum((F.pmod("src", F.lit(8)) != F.pmod("dst", F.lit(8))).cast("long"))
        .cast("long")
        .alias("cut_hash"),
        F.sum(
            (F.expr("src * 8 DIV (mx + 1)") != F.expr("dst * 8 DIV (mx + 1)")).cast("long")
        )
        .cast("long")
        .alias("cut_range"),
        F.sum((F.pmod("ls", F.lit(8)) != F.pmod("ld", F.lit(8))).cast("long"))
        .cast("long")
        .alias("cut_lpa"),
    ).select(
        "m",
        "cut_hash",
        "cut_range",
        "cut_lpa",
        F.expr("cut_hash * 1000000 DIV m").cast("long").alias("hash_ppm"),
        F.expr("cut_range * 1000000 DIV m").cast("long").alias("range_ppm"),
        F.expr("cut_lpa * 1000000 DIV m").cast("long").alias("lpa_ppm"),
    )


def _partition_cut_sql() -> str:
    lpa_rounds = "".join("," + _LPA_ROUND.format(K=k, KM1=k - 1) for k in (1, 2))
    return f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)
{lpa_rounds},
mx AS (SELECT CAST(GREATEST(MAX(src), MAX(dst)) AS BIGINT) AS mx FROM und),
el AS (SELECT und.src, und.dst, a.label AS ls, b.label AS ld, mx.mx
       FROM und JOIN l2 a ON a.id = und.src JOIN l2 b ON b.id = und.dst
       CROSS JOIN mx),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
       CAST(SUM(CASE WHEN src % 8 <> dst % 8 THEN 1 ELSE 0 END) AS BIGINT) AS cut_hash,
       CAST(SUM(CASE WHEN src * 8 // (mx + 1) <> dst * 8 // (mx + 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS cut_range,
       CAST(SUM(CASE WHEN ls % 8 <> ld % 8 THEN 1 ELSE 0 END) AS BIGINT) AS cut_lpa
       FROM el)
SELECT m, cut_hash, cut_range, cut_lpa,
       CAST(cut_hash * 1000000 // m AS BIGINT) AS hash_ppm,
       CAST(cut_range * 1000000 // m AS BIGINT) AS range_ppm,
       CAST(cut_lpa * 1000000 // m AS BIGINT) AS lpa_ppm
FROM agg
"""


ORACLES.update({"partition_cut_audit": _partition_cut_sql()})
QUERIES.update({"partition_cut_audit": q_partition_cut_audit})


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order to
    the 1998-12-31 anchor), frequency (order count), monetary (exact
    cents) — each quintiled with fully deterministic NTILE ordering,
    concatenated to a 3-digit segment code; output is customers and
    revenue per segment.  Quintiles run on the per-customer rollup
    (tiny vs the fact table), so the only full-scan work is one
    groupBy."""
    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-31").cast("timestamp"), F.max("o_orderdate")
        )
        .cast("long")
        .alias("rec_days"),
        F.count("*").cast("long").alias("freq"),
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("mon_cents"),
    )
    seg = per_cust.select(
        F.ntile(5).over(Window.orderBy("rec_days", "o_custkey")).alias("r"),
        F.ntile(5).over(Window.orderBy(F.desc("freq"), "o_custkey")).alias("f"),
        F.ntile(5).over(Window.orderBy(F.desc("mon_cents"), "o_custkey")).alias("m"),
        "mon_cents",
    )
    return (
        seg.groupBy(
            F.concat_ws("", F.col("r"), F.col("f"), F.col("m")).alias("segment")
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("mon_cents").cast("long").alias("rev_cents"),
        )
        .orderBy("segment")
    )


_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(DATE_DIFF('day', MAX(o_orderdate), TIMESTAMP '1998-12-31') AS BIGINT)
           AS rec_days,
         CAST(COUNT(*) AS BIGINT) AS freq,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mon_cents
  FROM orders GROUP BY o_custkey),
seg AS (
  SELECT NTILE(5) OVER (ORDER BY rec_days, o_custkey) AS r,
         NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
         NTILE(5) OVER (ORDER BY mon_cents DESC, o_custkey) AS m,
         mon_cents
  FROM per_cust)
SELECT CONCAT(CAST(r AS VARCHAR), CAST(f AS VARCHAR), CAST(m AS VARCHAR)) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(mon_cents) AS BIGINT) AS rev_cents
FROM seg GROUP BY 1 ORDER BY segment
"""


ORACLES.update({"rfm_segments": _RFM_SQL})
QUERIES.update({"rfm_segments": q_rfm_segments})


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed leading-digit
    distribution of o_totalprice (in cents, so the digit is scale-
    free) vs the Benford expectation log10(1+1/d), both in ppm, plus
    the absolute deviation.  The classic fraud/synthetic-data screen;
    one pure-map digit extraction and a 9-row aggregate."""
    orders = load_table(spark, "orders", sf_dir)
    digits = orders.select(
        F.substring(
            F.expr("CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING)"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    tot = Window.partitionBy()
    return (
        digits.groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "digit",
            "n",
            F.expr("n * 1000000 DIV SUM(n) OVER ()").cast("long").alias("obs_ppm"),
            F.expr("CAST(ROUND(LOG10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)").alias(
                "benford_ppm"
            ),
        )
        .withColumn(
            "abs_dev_ppm", F.abs(F.col("obs_ppm") - F.col("benford_ppm")).cast("long")
        )
        .orderBy("digit")
    )


_BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders),
counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit)
SELECT digit, n,
       CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS obs_ppm,
       CAST(ROUND(LOG10(1.0 + 1.0 / digit) * 1000000) AS BIGINT) AS benford_ppm,
       CAST(ABS(CAST(n * 1000000 // SUM(n) OVER () AS BIGINT)
                - CAST(ROUND(LOG10(1.0 + 1.0 / digit) * 1000000) AS BIGINT))
            AS BIGINT) AS abs_dev_ppm
FROM counts ORDER BY digit
"""


ORACLES.update({"benford_digits": _BENFORD_SQL})
QUERIES.update({"benford_digits": q_benford_digits})


def q_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: parts sorted
    by exact revenue_e4, classified A while the RUNNING share ≤ 80 %,
    B ≤ 95 %, else C — the running share compare is integer
    cross-multiplication (cum·100 vs total·80), no division.  Output:
    class, part count, revenue, revenue share ppm.  The window runs on
    the per-part rollup; deterministic tie-break on partkey."""
    li = load_table(spark, "lineitem", sf_dir)
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.expr(_REV_SPARK)).alias("rev_e4")
    )
    w = Window.orderBy(F.desc("rev_e4"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    classed = per_part.select(
        "rev_e4",
        F.sum("rev_e4").over(w).alias("cum"),
        F.sum("rev_e4").over(tot).alias("total"),
    ).select(
        "rev_e4",
        F.when(F.expr("cum * 100 <= total * 80"), F.lit("A"))
        .when(F.expr("cum * 100 <= total * 95"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev_e4").cast("long").alias("rev_e4"),
        )
        .withColumn(
            # rev_e4 * 1e6 overflows long past sf0.001 — downscale both
            # operands by 1e4 first (identical on both engines)
            "share_ppm",
            F.expr(
                "(rev_e4 DIV 10000) * 1000000 DIV (SUM(rev_e4) OVER () DIV 10000)"
            ).cast("long"),
        )
        .orderBy("abc")
    )


_ABC_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, SUM({_REV_DUCK}) AS rev_e4
  FROM lineitem GROUP BY l_partkey),
classed AS (
  SELECT rev_e4,
         CASE WHEN SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                                     ROWS UNBOUNDED PRECEDING) * 100
                   <= SUM(rev_e4) OVER () * 80 THEN 'A'
              WHEN SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                                     ROWS UNBOUNDED PRECEDING) * 100
                   <= SUM(rev_e4) OVER () * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM per_part),
agg AS (
  SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(rev_e4) AS BIGINT) AS rev_e4
  FROM classed GROUP BY abc)
SELECT abc, n_parts, rev_e4,
       CAST((rev_e4 // 10000) * 1000000 // (SUM(rev_e4) OVER () // 10000)
            AS BIGINT) AS share_ppm
FROM agg ORDER BY abc
"""


ORACLES.update({"abc_parts": _ABC_SQL})
QUERIES.update({"abc_parts": q_abc_parts})


def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: MRR of the BM25 top-10 against an
    exact boolean-AND relevance set (docs containing EVERY query term)
    for the fixed 5-query panel.  Per query: relevant-corpus size,
    rank of the first relevant hit inside the top-10 (0 = miss), and
    the reciprocal rank in exact ppm (10⁶ DIV rank).  The relevance
    join broadcasts the query-term table onto the postings — same
    plan shape as the scorer it audits."""
    from polar_spark.operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    top10 = bm25_topk(docs, qdf)

    qt = qdf.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.trim("qtext"), " "))).alias("term"),
    )
    n_terms = qt.groupBy("query_id").agg(F.count("*").cast("long").alias("n_terms"))
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " "))).alias("term"),
    )
    rel = (
        dt.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("matched"))
        .join(F.broadcast(n_terms), "query_id")
        .where(F.col("matched") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )
    n_rel = rel.groupBy("query_id").agg(F.count("*").cast("long").alias("n_relevant"))
    first = (
        top10.join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.min("rnk").cast("long").alias("first_rank"))
    )
    base = spark.createDataFrame(
        [(q,) for q, _t in _BM25_QUERIES], "query_id string"
    )
    return (
        base.join(n_rel, "query_id", "left")
        .join(first, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.coalesce("first_rank", F.lit(0)).cast("long").alias("first_rank"),
            F.when(F.col("first_rank").isNull(), F.lit(0))
            .otherwise(F.expr("1000000 DIV first_rank"))
            .cast("long")
            .alias("rr_ppm"),
        )
        .orderBy("query_id")
    )


def _mrr_sql(k1: float = 1.2, b: float = 0.75, scale: int = 1_000_000) -> str:
    bm25 = _bm25_sql(k1, b, scale)
    # reuse the scorer's replay verbatim as a CTE and grade it
    body = bm25.strip()
    assert body.startswith("WITH ")
    inner = body[len("WITH ") :]
    head, _select = inner.rsplit("SELECT query_id,", 1)
    return f"""
WITH {head.rstrip()},
top10 AS (SELECT query_id, CAST(_id AS BIGINT) AS doc_id, rnk
          FROM ranked WHERE rnk <= 10),
nt AS (SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
       FROM qt GROUP BY query_id),
rel AS (SELECT qt.query_id, toks._id AS doc_id
        FROM (SELECT DISTINCT _id, term FROM toks) toks
        JOIN qt ON qt.term = toks.term
        JOIN nt ON nt.query_id = qt.query_id
        GROUP BY qt.query_id, toks._id, nt.n_terms
        HAVING COUNT(DISTINCT toks.term) = nt.n_terms),
n_rel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
          FROM rel GROUP BY query_id),
first AS (SELECT t.query_id, CAST(MIN(t.rnk) AS BIGINT) AS first_rank
          FROM top10 t JOIN rel r ON r.query_id = t.query_id
                                 AND r.doc_id = t.doc_id
          GROUP BY t.query_id)
SELECT q.query_id,
       CAST(COALESCE(n_rel.n_relevant, 0) AS BIGINT) AS n_relevant,
       CAST(COALESCE(first.first_rank, 0) AS BIGINT) AS first_rank,
       CAST(CASE WHEN first.first_rank IS NULL THEN 0
                 ELSE 1000000 // first.first_rank END AS BIGINT) AS rr_ppm
FROM q LEFT JOIN n_rel ON n_rel.query_id = q.query_id
       LEFT JOIN first ON first.query_id = q.query_id
ORDER BY q.query_id
"""


ORACLES.update({"mrr_eval": _mrr_sql()})
QUERIES.update({"mrr_eval": q_mrr_eval})


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-cohort LTV curve: customers grouped by first-order
    month, revenue per (cohort, months-since-acquisition) with the
    running cumulative — the payback curve behind every acquisition
    decision.  Month index is pure integer arithmetic (year·12+month
    difference); revenue exact cents; the cumulative window runs only
    over ≤ n_months rows per cohort."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("mi"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cohort = orders.groupBy("o_custkey").agg(F.min("mi").alias("c0"))
    w = Window.partitionBy("cohort").orderBy("month_idx")
    return (
        orders.join(cohort, "o_custkey")
        .groupBy(
            F.col("c0").alias("cohort"),
            (F.col("mi") - F.col("c0")).cast("long").alias("month_idx"),
        )
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("n_active"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
        .withColumn("cum_rev_cents", F.sum("rev_cents").over(w).cast("long"))
        .orderBy("cohort", "month_idx")
    )


_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT) AS mi,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
cohort AS (SELECT o_custkey, MIN(mi) AS c0 FROM o GROUP BY o_custkey),
agg AS (
  SELECT c0 AS cohort, CAST(o.mi - c0 AS BIGINT) AS month_idx,
         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM o JOIN cohort ON cohort.o_custkey = o.o_custkey
  GROUP BY 1, 2)
SELECT cohort, month_idx, n_active, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY month_idx
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_rev_cents
FROM agg ORDER BY cohort, month_idx
"""


ORACLES.update({"cohort_ltv": _COHORT_LTV_SQL})
QUERIES.update({"cohort_ltv": q_cohort_ltv})


def q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency SLA profile per order priority: P50/P90/P99
    of (shipdate − orderdate) days by the NEAREST-RANK definition
    (value at row ⌈p·n⌉ of the sorted latencies) — an exact integer
    selection both engines replay identically, no interpolation
    boundary to drift.  One partitioned row_number window over the
    latency table; the fact join ships only two date columns."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("days")
    ranked = lat.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("o_orderpriority"))
    )
    picks = ranked.where(
        (F.col("rn") == F.expr("CAST(CEIL(n * 0.5) AS BIGINT)"))
        | (F.col("rn") == F.expr("CAST(CEIL(n * 0.9) AS BIGINT)"))
        | (F.col("rn") == F.expr("CAST(CEIL(n * 0.99) AS BIGINT)"))
    )
    return (
        picks.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.min(
                F.when(F.col("rn") == F.expr("CAST(CEIL(n * 0.5) AS BIGINT)"), F.col("days"))
            )
            .cast("long")
            .alias("p50_days"),
            F.min(
                F.when(F.col("rn") == F.expr("CAST(CEIL(n * 0.9) AS BIGINT)"), F.col("days"))
            )
            .cast("long")
            .alias("p90_days"),
            F.min(
                F.when(F.col("rn") == F.expr("CAST(CEIL(n * 0.99) AS BIGINT)"), F.col("days"))
            )
            .cast("long")
            .alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


_SHIP_LATENCY_SQL = """
WITH lat AS (
  SELECT o_orderpriority,
         CAST(DATE_DIFF('day', o_orderdate, l_shipdate) AS BIGINT) AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ranked AS (
  SELECT o_orderpriority, days,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY days) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM lat)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT) THEN days END)
            AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT) THEN days END)
            AS BIGINT) AS p90_days,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(n * 0.99) AS BIGINT) THEN days END)
            AS BIGINT) AS p99_days
FROM ranked
WHERE rn = CAST(CEIL(n * 0.5) AS BIGINT)
   OR rn = CAST(CEIL(n * 0.9) AS BIGINT)
   OR rn = CAST(CEIL(n * 0.99) AS BIGINT)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


ORACLES.update({"ship_latency": _SHIP_LATENCY_SQL})
QUERIES.update({"ship_latency": q_ship_latency})


# ---------------------------------------------------------------------------
# Session-14: completing the TPC-H family.  Q2/Q11/Q20 were declared out
# of scope for lack of a partsupp table, but the Q9 precedent stands —
# lineitem is the supply-fact surrogate (who supplied which part, at what
# price and quantity), so all three get an essence on this schema and the
# full 22-query family is covered.  Same integer micro-unit discipline as
# the rest of the family: money in cents/e4, quantities in centi-units,
# ratio compares by integer cross-multiplication.

_UNIT_E4_SPARK = (
    "(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000)"
    " DIV CAST(ROUND(l_quantity * 100) AS BIGINT)"
)
_UNIT_E4_DUCK = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000"
    " // CAST(ROUND(l_quantity * 100) AS BIGINT)"
)
_QTY_CENTI = "CAST(ROUND(l_quantity * 100) AS BIGINT)"


def q_q2_min_cost_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 essence (min-cost supplier): for every '%bolt' part, the
    EUROPE supplier(s) offering the lowest observed unit price.  The
    offer book is re-derived from lineitem: offer(part, supp) = MIN over
    their lines of the unit price in e4 units, computed as the exact
    integer division (price cents · 10⁴) DIV centi-quantity — both
    operands positive, so Spark's truncating DIV and DuckDB's flooring
    // agree.  Plan shape: both dimensions broadcast (the part-name
    filter and the region-scoped supplier list), the fact aggregates
    ONCE on (part, supplier), and the per-part minimum — a tiny table —
    joins back; never a global sort, and ties at the best offer all
    surface (the Q15 max-shape precedent)."""
    part = (
        load_table(spark, "part", sf_dir)
        .where(F.col("p_name").like("%bolt"))
        .select("p_partkey", "p_name")
    )
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    eur_nat = nat.join(reg, nat.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(eur_nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    li = load_table(spark, "lineitem", sf_dir)
    offers = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(supp.select(F.col("s_suppkey").alias("sk"))),
            li.l_suppkey == F.col("sk"),
        )
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.expr(f"MIN({_UNIT_E4_SPARK})").alias("offer_e4"))
    )
    best = offers.groupBy("p_partkey").agg(F.min("offer_e4").alias("best_e4"))
    return (
        offers.join(best, "p_partkey")
        .where(F.col("offer_e4") == F.col("best_e4"))
        .join(F.broadcast(part), "p_partkey")
        .join(F.broadcast(supp), offers.l_suppkey == supp.s_suppkey)
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_name",
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
            F.col("offer_e4").cast("long").alias("offer_e4"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


_Q2_SQL = f"""
WITH pf AS (SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%bolt'),
eur AS (SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
offers AS (SELECT p_partkey, l_suppkey, MIN({_UNIT_E4_DUCK}) AS offer_e4
           FROM lineitem JOIN pf ON l_partkey = p_partkey
           JOIN eur ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
best AS (SELECT p_partkey, MIN(offer_e4) AS best_e4 FROM offers GROUP BY 1)
SELECT CAST(o.p_partkey AS BIGINT) AS p_partkey, pf.p_name,
       CAST(o.l_suppkey AS BIGINT) AS s_suppkey, e.s_name, e.n_name,
       CAST(o.offer_e4 AS BIGINT) AS offer_e4
FROM offers o
JOIN best b ON o.p_partkey = b.p_partkey AND o.offer_e4 = b.best_e4
JOIN pf ON pf.p_partkey = o.p_partkey
JOIN eur e ON e.s_suppkey = o.l_suppkey
ORDER BY p_partkey, s_suppkey
"""


def q_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 essence (important stock): per-part supplied value from
    NATION_3's suppliers, keeping parts whose value exceeds 0.05 % of
    that nation's total — the scalar-subquery-threshold shape.  Value is
    the exact integer e4 revenue (lineitem as the partsupp surrogate);
    the threshold is the integer cross-multiply value·2000 > total, so
    no float boundary exists (headroom: total ≈ 6·10¹⁴ e4-units at
    sf0.1, ×2000 ≈ 1.2·10¹⁸ < 2⁶³).  The published share rides the
    abc_parts downscale lesson: both operands DIV 10⁴ before the ppm
    multiply.  Plan: supplier list broadcasts, one fact shuffle on
    partkey, the 1-row total broadcasts back."""
    nat = load_table(spark, "nation", sf_dir).where(F.col("n_name") == "NATION_3")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("sk"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    value = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("sk"))
        .groupBy("l_partkey")
        .agg(F.expr(f"SUM({_REV_SPARK})").alias("value_e4"))
    )
    tot = value.agg(F.sum("value_e4").alias("total_e4"))
    return (
        value.join(F.broadcast(tot), F.col("value_e4") * 2000 > F.col("total_e4"))
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            F.col("value_e4").cast("long").alias("value_e4"),
            F.expr(
                "(value_e4 DIV 10000) * 1000000 DIV (total_e4 DIV 10000)"
            ).cast("long").alias("share_ppm"),
        )
        .orderBy(F.desc("value_e4"), "p_partkey")
    )


_Q11_SQL = f"""
WITH supp AS (SELECT s_suppkey FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3'),
value AS (SELECT l_partkey, CAST(SUM({_REV_DUCK}) AS BIGINT) AS value_e4
          FROM lineitem JOIN supp ON l_suppkey = s_suppkey
          GROUP BY 1),
tot AS (SELECT SUM(value_e4) AS total_e4 FROM value)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       CAST(value_e4 AS BIGINT) AS value_e4,
       CAST((value_e4 // 10000) * 1000000 // (total_e4 // 10000) AS BIGINT)
         AS share_ppm
FROM value, tot
WHERE value_e4 * 2000 > total_e4
ORDER BY value_e4 DESC, p_partkey
"""


def q_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 essence (dominant suppliers): EUROPE suppliers that
    supplied MORE THAN HALF of some 'cold %' part's total quantity —
    Q20's share-of-supply predicate with lineitem as the partsupp
    surrogate.  The share compare is 2·supp_qty > part_total on exact
    centi-quantities.  Plan: part + supplier dimensions broadcast, the
    fact aggregates once on (part, supplier), and the per-part total is
    a second aggregate OVER THE GROUPED RESULT (no second fact scan);
    the dominant set then rolls up per supplier."""
    part = (
        load_table(spark, "part", sf_dir)
        .where(F.col("p_name").like("cold %"))
        .select("p_partkey")
    )
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    eur_nat = nat.join(reg, nat.n_regionkey == reg.r_regionkey).select("n_nationkey")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(eur_nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    li = load_table(spark, "lineitem", sf_dir)
    qsum = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(supp.select(F.col("s_suppkey").alias("sk"))),
            li.l_suppkey == F.col("sk"),
        )
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.expr(f"SUM({_QTY_CENTI})").alias("sq"))
    )
    tot = qsum.groupBy("p_partkey").agg(F.sum("sq").alias("tq"))
    dom = qsum.join(tot, "p_partkey").where(F.col("sq") * 2 > F.col("tq"))
    return (
        dom.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n_dominant_parts"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_dominant_parts",
        )
        .orderBy("s_suppkey")
    )


_Q20_SQL = f"""
WITH pf AS (SELECT p_partkey FROM part WHERE p_name LIKE 'cold %'),
eur AS (SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
qsum AS (SELECT p_partkey, l_suppkey, SUM({_QTY_CENTI}) AS sq
         FROM lineitem JOIN pf ON l_partkey = p_partkey
         JOIN eur ON l_suppkey = s_suppkey
         GROUP BY 1, 2),
tot AS (SELECT p_partkey, SUM(sq) AS tq FROM qsum GROUP BY 1),
dom AS (SELECT l_suppkey FROM qsum JOIN tot USING (p_partkey)
        WHERE 2 * sq > tq)
SELECT CAST(e.s_suppkey AS BIGINT) AS s_suppkey, e.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
FROM dom JOIN eur e ON e.s_suppkey = dom.l_suppkey
GROUP BY 1, 2
ORDER BY s_suppkey
"""


ORACLES.update(
    {
        "q2_min_cost_supp": _Q2_SQL,
        "q11_important_stock": _Q11_SQL,
        "q20_excess_suppliers": _Q20_SQL,
    }
)
QUERIES.update(
    {
        "q2_min_cost_supp": q_q2_min_cost_supp,
        "q11_important_stock": q_q11_important_stock,
        "q20_excess_suppliers": q_q20_excess_suppliers,
    }
)


# ---------------------------------------------------------------------------
# Session-14 graph science: bipartite butterfly census, configuration-model
# null audit, clustering-vs-degree curve.  All three stay in the exact
# integer algebra (closed forms from degree/triangle sufficient statistics;
# any IEEE value is ONE identical expression over identical BIGINTs on
# both engines).


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite butterfly census on the order-part incidence graph
    (the bipartite source of the co-order projection).  One row:
    edges |E|, left/right wedge counts sum C(b_o,2) / sum C(d_p,2),
    3-paths (caterpillars) sum over (o,p) in E of (b_o-1)(d_p-1),
    butterflies (bipartite 4-cycles) sum over p1<p2 of C(co,2), and the
    Aksoy/Lind bipartite clustering 4*butterflies/caterpillars in
    integer ppm.  Cost: the pair table is the same sum-b_o-squared work
    as coorder_edges (per-order baskets are small and bounded) and
    everything else is degree algebra; no quadratic blowup on either
    side."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    bo = op.groupBy("o").agg(F.count("*").alias("b"))
    dp = op.groupBy("p").agg(F.count("*").alias("d"))
    wedges_o = bo.agg(
        F.sum(F.expr("b * (b - 1) DIV 2")).cast("long").alias("wedges_orders")
    )
    wedges_p = dp.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("wedges_parts")
    )
    cater = (
        op.join(bo, "o")
        .join(dp, "p")
        .agg(F.sum(F.expr("(b - 1) * (d - 1)")).cast("long").alias("caterpillars"))
    )
    a, b2 = op.alias("a"), op.alias("b")
    co = (
        a.join(b2, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count("*").alias("c"))
    )
    bf = co.agg(
        F.coalesce(F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0))
        .cast("long")
        .alias("butterflies")
    )
    edges = op.agg(F.count("*").cast("long").alias("edges"))
    return (
        edges.crossJoin(wedges_o)
        .crossJoin(wedges_p)
        .crossJoin(cater)
        .crossJoin(bf)
        .select(
            "edges",
            "wedges_orders",
            "wedges_parts",
            "caterpillars",
            "butterflies",
            F.expr(
                "CASE WHEN caterpillars > 0"
                " THEN 4 * butterflies * 1000000 DIV caterpillars"
                " ELSE 0 END"
            )
            .cast("long")
            .alias("bip_clustering_ppm"),
        )
    )


_BUTTERFLIES_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
bo AS (SELECT o, COUNT(*) AS b FROM op GROUP BY o),
dp AS (SELECT p, COUNT(*) AS d FROM op GROUP BY p),
co AS (SELECT a.p AS p1, b.p AS p2, COUNT(*) AS c
       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
s AS (SELECT
  (SELECT COUNT(*) FROM op) AS edges,
  (SELECT SUM(b * (b - 1) // 2) FROM bo) AS wedges_orders,
  (SELECT SUM(d * (d - 1) // 2) FROM dp) AS wedges_parts,
  (SELECT SUM((b - 1) * (d - 1))
   FROM op JOIN bo USING (o) JOIN dp USING (p)) AS caterpillars,
  (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) FROM co) AS butterflies)
SELECT CAST(edges AS BIGINT) AS edges,
       CAST(wedges_orders AS BIGINT) AS wedges_orders,
       CAST(wedges_parts AS BIGINT) AS wedges_parts,
       CAST(caterpillars AS BIGINT) AS caterpillars,
       CAST(butterflies AS BIGINT) AS butterflies,
       CAST(CASE WHEN caterpillars > 0
            THEN 4 * butterflies * 1000000 // caterpillars
            ELSE 0 END AS BIGINT) AS bip_clustering_ppm
FROM s
"""


def q_config_model_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Configuration-model null audit of the co-order graph: actual
    triangle count vs the Newman expectation E[T] = (S2/S1)^3 / 6 with
    S1 = sum(d), S2 = sum(d(d-1)) -- 'is the observed clustering
    explained by the degree sequence alone?'.  S1/S2/T are exact
    BIGINTs; the expectation and the excess ratio are each ONE IEEE
    expression over those integers (explicit x*x*x, never pow(), so no
    libm divergence), and transitivity is the integer 6T*10^6 DIV S2.
    Everything is two degree aggregates plus the already-counted
    triangles -- no new quadratic work."""
    e = coorder_edges(spark, sf_dir)
    deg = pregel.degrees(e)
    stats = deg.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("degree").cast("long").alias("s1"),
        F.sum(F.expr("CAST(degree AS BIGINT) * (degree - 1)"))
        .cast("long")
        .alias("s2"),
    )
    _pv, total = pregel.triangle_count(e)
    tri = spark.createDataFrame([(int(total),)], "triangles long")
    return stats.crossJoin(F.broadcast(tri)).select(
        "n",
        "s1",
        "s2",
        "triangles",
        F.expr(
            "ROUND((CAST(s2 AS DOUBLE) / s1) * (CAST(s2 AS DOUBLE) / s1)"
            " * (CAST(s2 AS DOUBLE) / s1) / 6.0, 6)"
        ).alias("expected_tri_r"),
        F.expr(
            "ROUND(CAST(triangles AS DOUBLE) /"
            " ((CAST(s2 AS DOUBLE) / s1) * (CAST(s2 AS DOUBLE) / s1)"
            "  * (CAST(s2 AS DOUBLE) / s1) / 6.0), 6)"
        ).alias("excess_ratio_r"),
        F.expr("CASE WHEN s2 > 0 THEN 6 * triangles * 1000000 DIV s2 ELSE 0 END")
        .cast("long")
        .alias("transitivity_ppm"),
    )


_CONFIG_MODEL_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d) AS BIGINT) AS s1,
              CAST(SUM(d * (d - 1)) AS BIGINT) AS s2 FROM deg),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst)
SELECT n, s1, s2, triangles,
       ROUND((CAST(s2 AS DOUBLE) / s1) * (CAST(s2 AS DOUBLE) / s1)
             * (CAST(s2 AS DOUBLE) / s1) / 6.0, 6) AS expected_tri_r,
       ROUND(CAST(triangles AS DOUBLE) /
             ((CAST(s2 AS DOUBLE) / s1) * (CAST(s2 AS DOUBLE) / s1)
              * (CAST(s2 AS DOUBLE) / s1) / 6.0), 6) AS excess_ratio_r,
       CAST(CASE WHEN s2 > 0 THEN 6 * triangles * 1000000 // s2 ELSE 0 END
            AS BIGINT) AS transitivity_ppm
FROM st, tri
"""


def q_clustering_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-vs-degree curve c(k) on the co-order graph: per degree
    class k >= 2 the POOLED clustering 2*sum(tri)*10^6 DIV
    (n_k*k*(k-1)) -- pooled, not mean-of-ratios, so the whole curve
    stays in exact integer algebra (the knn_curve precedent).
    Hierarchical networks show c(k) ~ 1/k; a flat curve means
    degree-independent cohesion.  Composes the per-vertex triangle
    count and degree primitives -- one extra tiny groupBy over the
    vertex table."""
    e = coorder_edges(spark, sf_dir)
    per_vertex, _total = pregel.triangle_count(e)
    deg = pregel.degrees(e)
    return (
        deg.join(per_vertex, "id", "left")
        .where(F.col("degree") >= 2)
        .groupBy(F.col("degree").cast("long").alias("k"))
        .agg(
            F.count("*").cast("long").alias("n_k"),
            F.sum(F.coalesce("triangles", F.lit(0))).cast("long").alias("tri_sum"),
        )
        .select(
            "k",
            "n_k",
            "tri_sum",
            F.expr("2 * tri_sum * 1000000 DIV (n_k * k * (k - 1))")
            .cast("long")
            .alias("cc_pooled_ppm"),
        )
        .orderBy("k")
    )


_CLUSTERING_CURVE_SQL = f"""
WITH {_COORDER_SQL},
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst),
corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri),
pv AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id),
{_SYM_SQL},
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
cls AS (SELECT CAST(deg.d AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(COALESCE(pv.t, 0)) AS BIGINT) AS tri_sum
        FROM deg LEFT JOIN pv ON pv.id = deg.id
        WHERE deg.d >= 2 GROUP BY 1)
SELECT k, n_k, tri_sum,
       CAST(2 * tri_sum * 1000000 // (n_k * k * (k - 1)) AS BIGINT)
         AS cc_pooled_ppm
FROM cls ORDER BY k
"""


ORACLES.update(
    {
        "butterflies": _BUTTERFLIES_SQL,
        "config_model_audit": _CONFIG_MODEL_SQL,
        "clustering_curve": _CLUSTERING_CURVE_SQL,
    }
)
QUERIES.update(
    {
        "butterflies": q_butterflies,
        "config_model_audit": q_config_model_audit,
        "clustering_curve": q_clustering_curve,
    }
)


# ---------------------------------------------------------------------------
# Session-14 evaluation & attribution: nDCG@10 retrieval grading, NB
# margin-calibration (reliability) audit, last-touch conversion
# attribution.  The nDCG log2 discounts are precomputed ONCE in Python
# and baked into BOTH plans as integer literals, so no libm log call
# ever runs inside either engine — the cross-engine float lesson applied
# at the metric level.

_NDCG_K = 10
_NDCG_W = [round(1_000_000 / _math.log2(r + 1)) for r in range(1, _NDCG_K + 1)]
_NDCG_IDCG = [sum(_NDCG_W[: i + 1]) for i in range(_NDCG_K)]


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval #2: binary-relevance nDCG@10 of the BM25
    top-10 against the exact boolean-AND relevance set (the mrr_eval
    ground truth).  Discount weights w_r = round(10^6 / log2(r+1)) and
    their prefix sums (the ideal DCG) are module-level Python constants
    embedded as literals in both engines' plans; dcg = Σ w_rank over
    relevant hits and ndcg_ppm = dcg·10^6 DIV idcg(min(R,10)) are then
    pure BIGINT algebra.  Same broadcast posture as the scorer under
    audit."""
    from polar_spark.operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    top10 = bm25_topk(docs, qdf)

    qt = qdf.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.trim("qtext"), " "))).alias("term"),
    )
    n_terms = qt.groupBy("query_id").agg(F.count("*").cast("long").alias("n_terms"))
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " "))).alias("term"),
    )
    rel = (
        dt.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("matched"))
        .join(F.broadcast(n_terms), "query_id")
        .where(F.col("matched") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )
    n_rel = rel.groupBy("query_id").agg(F.count("*").cast("long").alias("n_relevant"))
    w_arr = "ARRAY(" + ", ".join(str(w) for w in _NDCG_W) + ")"
    idcg_arr = "ARRAY(" + ", ".join(str(v) for v in _NDCG_IDCG) + ")"
    dcg = (
        top10.join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("hits10"),
            F.sum(F.expr(f"element_at({w_arr}, CAST(rnk AS INT))"))
            .cast("long")
            .alias("dcg_e6"),
        )
    )
    base = spark.createDataFrame([(q,) for q, _t in _BM25_QUERIES], "query_id string")
    return (
        base.join(n_rel, "query_id", "left")
        .join(dcg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.coalesce("hits10", F.lit(0)).cast("long").alias("hits10"),
            F.coalesce("dcg_e6", F.lit(0)).cast("long").alias("dcg_e6"),
            F.expr(
                f"CASE WHEN COALESCE(n_relevant, 0) = 0 THEN 0"
                f" ELSE COALESCE(dcg_e6, 0) * 1000000 DIV element_at({idcg_arr},"
                f" CAST(LEAST(n_relevant, {_NDCG_K}) AS INT)) END"
            )
            .cast("long")
            .alias("ndcg_ppm"),
        )
        .orderBy("query_id")
    )


def _ndcg_sql(k1: float = 1.2, b: float = 0.75, scale: int = 1_000_000) -> str:
    bm25 = _bm25_sql(k1, b, scale)
    body = bm25.strip()
    assert body.startswith("WITH ")
    inner = body[len("WITH ") :]
    head, _select = inner.rsplit("SELECT query_id,", 1)
    w_rows = ", ".join(f"({r + 1}, {w})" for r, w in enumerate(_NDCG_W))
    i_rows = ", ".join(f"({r + 1}, {v})" for r, v in enumerate(_NDCG_IDCG))
    return f"""
WITH {head.rstrip()},
top10 AS (SELECT query_id, CAST(_id AS BIGINT) AS doc_id, rnk
          FROM ranked WHERE rnk <= 10),
w(rnk, w) AS (VALUES {w_rows}),
ic(r, idcg) AS (VALUES {i_rows}),
nt AS (SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
       FROM qt GROUP BY query_id),
rel AS (SELECT qt.query_id, toks._id AS doc_id
        FROM (SELECT DISTINCT _id, term FROM toks) toks
        JOIN qt ON qt.term = toks.term
        JOIN nt ON nt.query_id = qt.query_id
        GROUP BY qt.query_id, toks._id, nt.n_terms
        HAVING COUNT(DISTINCT toks.term) = nt.n_terms),
n_rel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
          FROM rel GROUP BY query_id),
dcg AS (SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS hits10,
               CAST(SUM(w.w) AS BIGINT) AS dcg_e6
        FROM top10 t JOIN rel r ON r.query_id = t.query_id
                             AND r.doc_id = t.doc_id
        JOIN w ON w.rnk = t.rnk
        GROUP BY t.query_id)
SELECT q.query_id,
       CAST(COALESCE(n_rel.n_relevant, 0) AS BIGINT) AS n_relevant,
       CAST(COALESCE(dcg.hits10, 0) AS BIGINT) AS hits10,
       CAST(COALESCE(dcg.dcg_e6, 0) AS BIGINT) AS dcg_e6,
       CAST(CASE WHEN COALESCE(n_rel.n_relevant, 0) = 0 THEN 0
            ELSE COALESCE(dcg.dcg_e6, 0) * 1000000 //
                 (SELECT idcg FROM ic
                  WHERE r = LEAST(n_rel.n_relevant, {_NDCG_K}))
            END AS BIGINT) AS ndcg_ppm
FROM q LEFT JOIN n_rel ON n_rel.query_id = q.query_id
       LEFT JOIN dcg ON dcg.query_id = q.query_id
ORDER BY q.query_id
"""


def q_nb_margin_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier reliability audit: decile calibration curve of the NB
    language classifier's confidence MARGIN (top-1 minus top-2 scaled
    log-posterior — an exact BIGINT, unlike a softmax probability).
    Documents are NTILE(10)-binned by (margin, doc_id) — fully
    deterministic — and each bin reports size, accuracy in exact ppm,
    and its margin span; a well-behaved classifier shows accuracy
    rising with margin.  The global NTILE is a diagnostics-sized sort
    over one row per document score, not a data-path stage."""
    from polar_spark.operators.classify import nb_class_scores

    base, scored = nb_class_scores(load_table(spark, "documents", sf_dir))
    win = Window.partitionBy("_id").orderBy(F.desc("score_scaled"), F.asc("cls"))
    top2 = (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= 2)
        .groupBy("_id")
        .agg(
            F.max(F.when(F.col("rnk") == 1, F.col("score_scaled"))).alias("s1"),
            F.max(F.when(F.col("rnk") == 1, F.col("cls"))).alias("pred"),
            F.max(F.when(F.col("rnk") == 2, F.col("score_scaled"))).alias("s2"),
        )
    )
    m = base.join(top2, "_id").select(
        "_id",
        (F.col("s1") - F.col("s2")).cast("long").alias("margin"),
        (F.col("label") == F.col("pred")).cast("long").alias("correct"),
    )
    binned = m.withColumn(
        "bin", F.ntile(10).over(Window.orderBy("margin", "_id"))
    )
    return (
        binned.groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("correct").cast("long").alias("n_correct"),
            F.expr("SUM(correct) * 1000000 DIV COUNT(*)")
            .cast("long")
            .alias("acc_ppm"),
            F.min("margin").cast("long").alias("margin_min"),
            F.max("margin").cast("long").alias("margin_max"),
        )
        .orderBy("bin")
    )


def _nb_margin_sql(scale: int = 1_000_000, train_bp: int = 8000, seed: int = 0) -> str:
    return f"""
WITH {_nb_cte_body(scale, train_bp, seed)},
ranked AS (SELECT _id, cls, score_scaled,
                  ROW_NUMBER() OVER (PARTITION BY _id
                    ORDER BY score_scaled DESC, cls ASC) AS rnk
           FROM sc),
top2 AS (SELECT _id,
                MAX(CASE WHEN rnk = 1 THEN score_scaled END) AS s1,
                MAX(CASE WHEN rnk = 1 THEN cls END) AS pred,
                MAX(CASE WHEN rnk = 2 THEN score_scaled END) AS s2
         FROM ranked WHERE rnk <= 2 GROUP BY _id),
m AS (SELECT b._id, CAST(t.s1 - t.s2 AS BIGINT) AS margin,
             CASE WHEN b.label = t.pred THEN 1 ELSE 0 END AS correct
      FROM base b JOIN top2 t ON t._id = b._id),
binned AS (SELECT *, NTILE(10) OVER (ORDER BY margin, _id) AS bin FROM m)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(correct) AS BIGINT) AS n_correct,
       CAST(SUM(correct) * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm,
       CAST(MIN(margin) AS BIGINT) AS margin_min,
       CAST(MAX(margin) AS BIGINT) AS margin_max
FROM binned GROUP BY bin ORDER BY bin
"""


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each 'purchase' event is
    credited to the user's most recent PRECEDING non-purchase event
    within a 24 h window ('direct' when none) — the classic marketing
    funnel credit model.  One user-partitioned window pass with an
    ignore-nulls last_value carries (touch ts, touch type) forward; the
    24 h cutoff is an exact integer microsecond compare; the rollup is
    a tiny groupBy.  Never a global sort — the window key is the
    natural event partitioning."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_us = F.last(
        F.when(F.col("event_type") != "purchase", F.col("us")),
        ignorenulls=True,
    ).over(w)
    pur = (
        ev.withColumn("t_type", touch_type)
        .withColumn("t_us", touch_us)
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.when(
                F.col("t_us").isNotNull()
                & (F.col("us") - F.col("t_us") <= F.lit(86_400_000_000)),
                F.col("t_type"),
            )
            .otherwise(F.lit("direct"))
            .alias("touch_type"),
        )
    )
    return (
        pur.groupBy("touch_type")
        .agg(
            F.count("*").cast("long").alias("conversions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("touch_type")
    )


_ATTRIBUTION_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, EPOCH_US(ts) AS us FROM events),
tagged AS (
  SELECT *,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_type,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_us
  FROM ev),
pur AS (
  SELECT user_id,
         CASE WHEN t_us IS NOT NULL AND us - t_us <= 86400000000
              THEN t_type ELSE 'direct' END AS touch_type
  FROM tagged WHERE event_type = 'purchase')
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS conversions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM pur GROUP BY touch_type ORDER BY touch_type
"""


ORACLES.update(
    {
        "ndcg_eval": _ndcg_sql(),
        "nb_margin_calibration": _nb_margin_sql(),
        "attribution_last_touch": _ATTRIBUTION_SQL,
    }
)
QUERIES.update(
    {
        "ndcg_eval": q_ndcg_eval,
        "nb_margin_calibration": q_nb_margin_calibration,
        "attribution_last_touch": q_attribution_last_touch,
    }
)


# ---------------------------------------------------------------------------
# Session-14 paths & matching: widest (bottleneck) paths, reciprocal
# top-1 matching, conversion-lag survival percentiles.


def q_widest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widest (maximin bottleneck) paths from the smallest vertex over
    the weighted undirected demand graph (edge weight = order lines
    between the pair — link capacity): cap(v) = MAX over paths of the
    MIN edge weight, the routing/throughput dual of sssp_weighted on
    the SAME graph.  Frontier-scoped max-min relaxation
    (pregel.widest_paths); the SQL oracle unrolls 20 rounds —
    bottleneck chains run LONGER on sparser graphs (measured fixpoint:
    6 rounds at sf0.001, 18 at sf0.01, 8 at the denser sf0.1), and
    relaxation past the fixpoint is a no-op.  The source row carries
    the INF sentinel and is excluded from the published result."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    dir_w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    und = dir_w.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.sum("w").alias("w"))
    e = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    src0 = int(e.agg(F.min("src")).collect()[0][0])
    cap, _stats = pregel.widest_paths(e, sources=[src0])
    return (
        cap.where(F.col("id") != src0)
        .select(F.col("id").cast("long"), F.col("cap").cast("long"))
        .orderBy("id")
    )


def _widest_sql(rounds: int) -> str:
    parts = [
        "dw AS MATERIALIZED (SELECT o_custkey AS src, l_suppkey AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_custkey != l_suppkey GROUP BY 1, 2)",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "CAST(SUM(w) AS BIGINT) AS w FROM dw GROUP BY 1, 2)",
        "e AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM und "
        "UNION ALL SELECT b, a, w FROM und)",
        f"c0 AS (SELECT MIN(src) AS id, CAST({pregel.WIDEST_INF} AS BIGINT) AS cap "
        "FROM e)",
    ]
    for i in range(rounds):
        parts.append(
            f"c{i + 1} AS MATERIALIZED (SELECT id, MAX(cap) AS cap FROM ("
            f"SELECT id, cap FROM c{i} "
            f"UNION ALL "
            f"SELECT e.dst AS id, LEAST(c.cap, e.w) FROM c{i} c JOIN e ON e.src = c.id"
            f") t GROUP BY id)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, CAST(cap AS BIGINT) AS cap
        FROM c{rounds} WHERE id != (SELECT id FROM c0) ORDER BY id"""
    )


def q_mutual_top1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest-neighbor matching on the weighted supplier
    co-part graph (weight = number of shared parts): pairs where each
    endpoint is the other's single strongest neighbor — the
    mutual-top-1 rule used for high-precision entity matching and
    duplicate pairing.  Per-vertex top-1 is one row_number window over
    the vertex's adjacency (co-partitioned, never global); the
    reciprocity check is a self-join on the two directed picks.
    Deterministic tie-break (w DESC, neighbor ASC)."""
    li = load_table(spark, "lineitem", sf_dir)
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    w_und = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("x"), F.col("b.s").alias("y"))
        .agg(F.count("*").alias("w"))
    )
    adj = w_und.select("x", "y", "w").unionByName(
        w_und.select(F.col("y").alias("x"), F.col("x").alias("y"), "w")
    )
    win = Window.partitionBy("x").orderBy(F.desc("w"), F.asc("y"))
    top1 = (
        adj.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") == 1)
        .select("x", "y", "w")
    )
    t1, t2 = top1.alias("t1"), top1.alias("t2")
    return (
        t1.join(
            t2,
            (F.col("t1.y") == F.col("t2.x"))
            & (F.col("t2.y") == F.col("t1.x"))
            & (F.col("t1.x") < F.col("t1.y")),
        )
        .select(
            F.col("t1.x").cast("long").alias("a"),
            F.col("t1.y").cast("long").alias("b"),
            F.col("t1.w").cast("long").alias("shared_parts"),
        )
        .orderBy("a")
    )


_MUTUAL_TOP1_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
wu AS (SELECT a.s AS x, b.s AS y, CAST(COUNT(*) AS BIGINT) AS w
       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
adj AS (SELECT x, y, w FROM wu UNION ALL SELECT y, x, w FROM wu),
top1 AS (SELECT x, y, w FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY x
                       ORDER BY w DESC, y ASC) AS rnk FROM adj)
         WHERE rnk = 1)
SELECT CAST(t1.x AS BIGINT) AS a, CAST(t1.y AS BIGINT) AS b,
       CAST(t1.w AS BIGINT) AS shared_parts
FROM top1 t1 JOIN top1 t2 ON t1.y = t2.x AND t2.y = t1.x AND t1.x < t1.y
ORDER BY a
"""


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-lag curve: among users whose first 'purchase' follows
    their first 'signup', the nearest-rank p25/p50/p75/p90 of the
    signup-to-purchase lag — the activation-latency summary a growth
    funnel reads.  Lags are exact integer microseconds (published as
    floored days via integer DIV); nearest-rank percentiles are
    interpolation-free, the ship_latency precedent.  One groupBy over
    events per user, one ranked pass over the (small) converter set."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    firsts = (
        ev.where(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias("su"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias("pu"),
        )
        .where(F.col("su").isNotNull() & F.col("pu").isNotNull() & (F.col("pu") > F.col("su")))
        .select((F.col("pu") - F.col("su")).alias("lag_us"))
    )
    win = Window.orderBy("lag_us")
    ranked = firsts.withColumn("rn", F.row_number().over(win)).withColumn(
        "n", F.count("*").over(Window.partitionBy())
    )
    picks = " OR ".join(
        f"rn = CAST(CEIL(n * 0.{p}) AS BIGINT)" for p in (25, 50, 75, 90)
    )
    sel = [
        F.min(
            F.when(
                F.expr(f"rn = CAST(CEIL(n * 0.{p}) AS BIGINT)"),
                F.expr("lag_us DIV 86400000000"),
            )
        )
        .cast("long")
        .alias(f"p{p}_days")
        for p in (25, 50, 75, 90)
    ]
    return ranked.where(F.expr(picks)).agg(
        F.max("n").cast("long").alias("n_converted"), *sel
    )


_CONVERSION_LAG_SQL = """
WITH ev AS (SELECT user_id, event_type, EPOCH_US(ts) AS us FROM events),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN us END) AS su,
         MIN(CASE WHEN event_type = 'purchase' THEN us END) AS pu
  FROM ev WHERE event_type IN ('signup', 'purchase')
  GROUP BY user_id),
lags AS (SELECT pu - su AS lag_us FROM firsts
         WHERE su IS NOT NULL AND pu IS NOT NULL AND pu > su),
ranked AS (SELECT lag_us, ROW_NUMBER() OVER (ORDER BY lag_us) AS rn,
                  COUNT(*) OVER () AS n FROM lags)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(n * 0.25) AS BIGINT)
                THEN lag_us // 86400000000 END) AS BIGINT) AS p25_days,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(n * 0.50) AS BIGINT)
                THEN lag_us // 86400000000 END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(n * 0.75) AS BIGINT)
                THEN lag_us // 86400000000 END) AS BIGINT) AS p75_days,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(n * 0.90) AS BIGINT)
                THEN lag_us // 86400000000 END) AS BIGINT) AS p90_days
FROM ranked
WHERE rn = CAST(CEIL(n * 0.25) AS BIGINT)
   OR rn = CAST(CEIL(n * 0.50) AS BIGINT)
   OR rn = CAST(CEIL(n * 0.75) AS BIGINT)
   OR rn = CAST(CEIL(n * 0.90) AS BIGINT)
"""


ORACLES.update(
    {
        "widest_paths": _widest_sql(20),
        "mutual_top1_pairs": _MUTUAL_TOP1_SQL,
        "conversion_lag": _CONVERSION_LAG_SQL,
    }
)
QUERIES.update(
    {
        "widest_paths": q_widest_paths,
        "mutual_top1_pairs": q_mutual_top1_pairs,
        "conversion_lag": q_conversion_lag,
    }
)


def q_path3_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-induced path/motif census of the co-order graph in closed
    form — the P4 companion of ``triad_census``: wedges (paths of
    length 2) from the degree sequence, triangles from one oriented
    enumeration, and paths of length 3 on 4 distinct vertices via the
    identity  P4 = Σ_{(a,b)∈E} (d_a−1)(d_b−1) − 3·T  (the u=v closures
    of the edge-centered product are exactly 3 per triangle).  All
    BIGINT; global transitivity as an integer ppm ratio.  At scale:
    two degree aggregates + the oriented triangle join — no 4-vertex
    enumeration ever materializes."""
    und = coorder_edges(spark, sf_dir)
    e = _sym(und)
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    wedge_row = deg.agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.expr("SUM(deg * (deg - 1)) DIV 2").cast("long").alias("wedges"),
    )
    _per, tri_total = pregel.triangle_count(und)
    edge_prod = (
        und.join(deg.select(F.col("src"), F.col("deg").alias("da")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("db")),
            "dst",
        )
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum((F.col("da") - 1) * (F.col("db") - 1)).cast("long").alias("prod_sum"),
        )
    )
    tri_df = spark.createDataFrame([(int(tri_total),)], "triangles long")
    return (
        wedge_row.crossJoin(edge_prod)
        .crossJoin(F.broadcast(tri_df))
        .select(
            "n_vertices",
            "n_edges",
            "wedges",
            "triangles",
            (F.col("prod_sum") - 3 * F.col("triangles")).cast("long").alias("p3_paths"),
            F.expr("3 * triangles * 1000000 DIV wedges").cast("long").alias("transitivity_ppm"),
        )
    )


_PATH3_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst),
tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles FROM tri),
wr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
              CAST(SUM(deg * (deg - 1)) // 2 AS BIGINT) AS wedges FROM deg),
ep AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
              CAST(SUM((da.deg - 1) * (db.deg - 1)) AS BIGINT) AS prod_sum
       FROM und JOIN deg da ON da.src = und.src
       JOIN deg db ON db.src = und.dst)
SELECT n_vertices, n_edges, wedges, triangles,
       CAST(prod_sum - 3 * triangles AS BIGINT) AS p3_paths,
       CAST(3 * triangles * 1000000 // wedges AS BIGINT) AS transitivity_ppm
FROM wr CROSS JOIN ep CROSS JOIN tr
"""


def _ci_slice_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse co-order slice (l_partkey % 7 == 0, the burt_constraint
    precedent): the full co-order graph is 2-hop-complete at sf ≥ 0.01,
    which would make any radius-2 ball metric degenerate."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.where(F.col("l_partkey") % 7 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )


_CI_SLICE_SQL = """
op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       FROM lineitem WHERE l_partkey % 7 = 0),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)
"""


def q_collective_influence2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collective Influence at ball radius ℓ=2 (Morone & Makse, Nature
    2015): CI(v) = (d_v − 1) · Σ_{u ∈ ∂Ball(v,2)} (d_u − 1), the optimal-
    percolation influencer score — hubs-of-hubs beat raw degree.  The
    frontier ∂Ball(v,2) is the distance-EXACTLY-2 set: distinct 2-hop
    pairs minus direct neighbors minus self.  Integer-exact end to end;
    top-20 by (ci desc, id).  At scale the 2-hop materialization is one
    self-join bounded by Σ d² — run on a degree-capped backbone first
    (the documented slice here), never on a 2-hop-complete graph."""
    und = _ci_slice_edges(spark, sf_dir)
    e = _sym(und)
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    two = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("x"))
        .join(e.select(F.col("src").alias("x"), F.col("dst").alias("w")), "x")
        .where(F.col("v") != F.col("w"))
        .select("v", "w")
        .distinct()
    )
    frontier = two.join(
        e.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "left_anti",
    )
    ball = (
        frontier.join(
            deg.select(F.col("src").alias("w"), F.col("deg").alias("dw")), "w"
        )
        .groupBy("v")
        .agg(F.sum(F.col("dw") - 1).cast("long").alias("ball_sum"))
    )
    return (
        deg.select(F.col("src").alias("v"), "deg")
        .join(ball, "v", "left")
        .select(
            F.col("v").cast("long").alias("id"),
            F.col("deg"),
            ((F.col("deg") - 1) * F.coalesce(F.col("ball_sum"), F.lit(0)))
            .cast("long")
            .alias("ci"),
        )
        .orderBy(F.desc("ci"), F.asc("id"))
        .limit(20)
    )


_CI2_SQL = f"""
WITH {_CI_SLICE_SQL},
{_SYM_SQL},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
two AS (SELECT DISTINCT a.src AS v, b.dst AS w
        FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst),
frontier AS (SELECT v, w FROM two EXCEPT SELECT src, dst FROM e),
ball AS (SELECT f.v, SUM(d.deg - 1) AS ball_sum
         FROM frontier f JOIN deg d ON d.src = f.w GROUP BY f.v)
SELECT CAST(deg.src AS BIGINT) AS id, deg.deg,
       CAST((deg.deg - 1) * COALESCE(ball.ball_sum, 0) AS BIGINT) AS ci
FROM deg LEFT JOIN ball ON ball.v = deg.src
ORDER BY ci DESC, id ASC LIMIT 20
"""


def q_core_periphery_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Borgatti–Everett core–periphery audit on the co-order
    graph: core = top ⌈n/10⌉ vertices by (degree desc, id asc), then
    the three block-edge counts (core–core, core–periphery, periphery–
    periphery) and their densities in integer ppm.  An ideal
    core–periphery graph has cc_density → 1, pp_density → 0; the gap
    between cc and pp densities is the fit signal.  One degree
    aggregate, one rank, one labeled-edge aggregate — all linear."""
    und = coorder_edges(spark, sf_dir)
    e = _sym(und)
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    w = Window.orderBy(F.desc("deg"), F.asc("src"))
    n_row = deg.agg(F.count("*").alias("n")).collect()[0][0]
    k = (int(n_row) + 9) // 10
    lab = deg.select(
        F.col("src").alias("id"), (F.row_number().over(w) <= k).alias("is_core")
    )
    blocks = (
        und.join(lab.select(F.col("id").alias("src"), F.col("is_core").alias("ca")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("is_core").alias("cb")), "dst")
        .agg(
            F.sum((F.col("ca") & F.col("cb")).cast("long")).cast("long").alias("cc_edges"),
            F.sum((F.col("ca") != F.col("cb")).cast("long")).cast("long").alias("cp_edges"),
            F.sum((~F.col("ca") & ~F.col("cb")).cast("long")).cast("long").alias("pp_edges"),
        )
    )
    nc, np_ = k, int(n_row) - k
    return blocks.select(
        F.lit(nc).cast("long").alias("n_core"),
        F.lit(np_).cast("long").alias("n_periph"),
        "cc_edges",
        "cp_edges",
        "pp_edges",
        F.expr(f"cc_edges * 1000000 DIV {nc * (nc - 1) // 2}").cast("long").alias("cc_density_ppm"),
        F.expr(f"cp_edges * 1000000 DIV {nc * np_}").cast("long").alias("cp_density_ppm"),
        F.expr(f"pp_edges * 1000000 DIV {max(np_ * (np_ - 1) // 2, 1)}").cast("long").alias("pp_density_ppm"),
    )


_CORE_PERIPHERY_SQL = f"""
WITH {_COORDER_SQL},
{_SYM_SQL},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST((COUNT(*) + 9) // 10 AS BIGINT) AS k FROM deg),
lab AS (SELECT src AS id,
               ROW_NUMBER() OVER (ORDER BY deg DESC, src ASC) <= (SELECT k FROM nk) AS is_core
        FROM deg),
blocks AS (SELECT
    CAST(SUM(CASE WHEN la.is_core AND lb.is_core THEN 1 ELSE 0 END) AS BIGINT) AS cc_edges,
    CAST(SUM(CASE WHEN la.is_core <> lb.is_core THEN 1 ELSE 0 END) AS BIGINT) AS cp_edges,
    CAST(SUM(CASE WHEN NOT la.is_core AND NOT lb.is_core THEN 1 ELSE 0 END) AS BIGINT) AS pp_edges
    FROM und JOIN lab la ON la.id = und.src JOIN lab lb ON lb.id = und.dst)
SELECT CAST(nk.k AS BIGINT) AS n_core,
       CAST(nk.n - nk.k AS BIGINT) AS n_periph,
       cc_edges, cp_edges, pp_edges,
       CAST(cc_edges * 1000000 // (nk.k * (nk.k - 1) // 2) AS BIGINT) AS cc_density_ppm,
       CAST(cp_edges * 1000000 // (nk.k * (nk.n - nk.k)) AS BIGINT) AS cp_density_ppm,
       CAST(pp_edges * 1000000 // GREATEST((nk.n - nk.k) * (nk.n - nk.k - 1) // 2, 1) AS BIGINT) AS pp_density_ppm
FROM blocks CROSS JOIN nk
"""


def q_trophic_levels4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trophic levels (pregel.trophic_levels, 4 Jacobi rounds) on the
    multi-parent order-succession DAG (each order → the customer's next
    TWO orders, the commit-graph shape): basal vertices sit at level 1,
    every other vertex at 1 + mean of its in-neighbors — the flow-
    hierarchy coordinate (MacKay et al. 2020).  Integer micro-units end
    to end, so the 4-round unrolled SQL oracle replays bit-for-bit."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = orders.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
    a, b = r.alias("a"), r.alias("b")
    edges = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.rn") - F.col("a.rn")).isin(1, 2),
    ).select(F.col("a.o_orderkey").alias("src"), F.col("b.o_orderkey").alias("dst"))
    h = pregel.trophic_levels(edges, n_iter=4)
    return h.select(F.col("id").cast("long"), F.col("h_us").cast("long")).orderBy("id")


_TROPHIC_ROUND = """
h{K} AS (SELECT base.id,
                CASE WHEN base.indeg = 0 THEN 1000000
                     ELSE 1000000 + s.s // base.indeg END AS h
         FROM base
         LEFT JOIN (SELECT de.dst AS id, SUM(p.h) AS s
                    FROM de JOIN h{KM1} p ON p.id = de.src
                    GROUP BY de.dst) s ON s.id = base.id)"""


def _trophic_sql(n_iter: int = 4) -> str:
    rounds = "".join(
        "," + _TROPHIC_ROUND.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1)
    )
    return f"""
WITH r AS (SELECT o_orderkey,
                  o_custkey,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders),
de AS (SELECT a.o_orderkey AS src, b.o_orderkey AS dst
       FROM r a JOIN r b ON a.o_custkey = b.o_custkey
       AND b.rn - a.rn IN (1, 2)),
verts AS (SELECT DISTINCT src AS id FROM de UNION SELECT DISTINCT dst FROM de),
indeg AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS indeg FROM de GROUP BY dst),
base AS (SELECT verts.id, COALESCE(indeg.indeg, 0) AS indeg
         FROM verts LEFT JOIN indeg ON indeg.id = verts.id),
h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h FROM base)
{rounds}
SELECT CAST(id AS BIGINT) AS id, CAST(h AS BIGINT) AS h_us
FROM h{n_iter} ORDER BY id
"""


def q_leiden_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leiden refinement pass (Traag et al. 2019's fix for Louvain's
    disconnected-community defect): take the deterministic Louvain
    sweep's partition on the weighted co-order graph (parts < 400, the
    louvain_move1 query) and split every community into its CONNECTED
    pieces — hash-min components restricted to intra-community edges;
    a vertex with no intra-community edge keeps its own id.  Output is
    (id, comm, refined); refined ≠ comm-rep exactly where Louvain
    glued disconnected vertex sets together.  At scale: one label
    join + the CC rounds on the (strictly smaller) intra-community
    edge subset — no new quadratic surface."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    wund = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count("*").cast("double").alias("w"))
    )
    sym = wund.unionByName(
        wund.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    comm = pregel.louvain_move(sym).localCheckpoint(eager=True)
    intra = (
        wund.select("src", "dst")
        .join(comm.select(F.col("id").alias("src"), F.col("comm").alias("ca")), "src")
        .join(comm.select(F.col("id").alias("dst"), F.col("comm").alias("cb")), "dst")
        .where(F.col("ca") == F.col("cb"))
        .select("src", "dst")
    )
    cc, _stats = pregel.connected_components(intra)
    return (
        comm.join(cc, "id", "left")
        .select(
            F.col("id").cast("long"),
            F.col("comm").cast("long"),
            F.coalesce(F.col("comp"), F.col("id")).cast("long").alias("refined"),
        )
        .orderBy("id")
    )


_LEIDEN_REFINE_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
wund AS (SELECT a.p AS src, b.p AS dst, CAST(COUNT(*) AS DOUBLE) AS w
         FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
e AS (SELECT src, dst, w FROM wund UNION ALL SELECT dst, src, w FROM wund),
m AS (SELECT SUM(w) / 2.0 AS m FROM e),
st AS (SELECT src AS id, SUM(w) AS k FROM e GROUP BY src),
cand AS (SELECT e.src AS id, e.dst AS u,
                e.w / m.m - kv.k * ku.k / (2.0 * m.m * m.m) AS g
         FROM e CROSS JOIN m
         JOIN st kv ON kv.id = e.src JOIN st ku ON ku.id = e.dst),
best AS (SELECT id, u FROM (
           SELECT id, u, ROW_NUMBER() OVER (PARTITION BY id
                                            ORDER BY g DESC, u ASC) AS rn
           FROM cand WHERE g > 0) t WHERE rn = 1),
v AS (SELECT DISTINCT src AS id FROM e),
comm AS (SELECT v.id, COALESCE(best.u, v.id) AS comm
         FROM v LEFT JOIN best ON best.id = v.id),
intra AS (SELECT wund.src, wund.dst
          FROM wund JOIN comm ca ON ca.id = wund.src
          JOIN comm cb ON cb.id = wund.dst
          WHERE ca.comm = cb.comm),
ie AS (SELECT src, dst FROM intra UNION SELECT dst, src FROM intra),
iv AS (SELECT DISTINCT src AS id FROM ie),
reach(id, comp) AS (
    SELECT id, id FROM iv
    UNION
    SELECT ie.dst, r.comp FROM reach r JOIN ie ON ie.src = r.id
    WHERE r.comp < ie.dst
),
cc AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
SELECT CAST(comm.id AS BIGINT) AS id,
       CAST(comm.comm AS BIGINT) AS comm,
       CAST(COALESCE(cc.comp, comm.id) AS BIGINT) AS refined
FROM comm LEFT JOIN cc ON cc.id = comm.id
ORDER BY comm.id
"""


def q_scc_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation (quotient DAG) of a planted block-cycle graph over
    customers: SCCs via pregel.strongly_connected_components, then the
    quotient edge table (distinct cross-SCC edges) layered with
    pregel.dag_longest_path — the component-DAG view a build scheduler
    reads off a dependency graph (strongly-coupled clusters become
    single schedulable units; lvl = stage index).  The fixture plants
    50-vertex directed cycles (one SCC per block) with forward DAG
    edges to the next two blocks — the functional graph of
    scc_custgraph is one giant SCC at every sf (measured), which would
    make the condensation a single row.  Per-SCC row: (scc, n_members,
    lvl, out_deg)."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    n = cust.count()
    c = F.col("c_custkey")
    B = 50
    blk = F.expr(f"c_custkey DIV {B}").cast("long")
    pos = c % B
    bs = F.least(F.lit(B).cast("long"), F.lit(int(n)) - blk * B)
    intra = cust.select(
        c.alias("src"), (blk * B + (pos + 1) % bs).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    cross1 = cust.where((pos == 0) & ((blk + 1) * B < n)).select(
        c.alias("src"), ((blk + 1) * B).alias("dst")
    )
    cross2 = cust.where((pos == 1) & ((blk + 2) * B < n)).select(
        c.alias("src"), ((blk + 2) * B).alias("dst")
    )
    e = intra.unionByName(cross1).unionByName(cross2)
    scc, _stats = pregel.strongly_connected_components(e)
    verts = cust.select(c.cast("long").alias("id"))
    lab = (
        verts.join(scc, "id", "left")
        .select("id", F.coalesce(F.col("scc"), F.col("id")).alias("scc"))
        .localCheckpoint(eager=True)
    )
    qe = (
        e.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .join(lab.select(F.col("id").alias("src"), F.col("scc").alias("ca")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("scc").alias("cb")), "dst")
        .where(F.col("ca") != F.col("cb"))
        .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        .distinct()
    )
    lvl, _lp_stats = pregel.dag_longest_path(qe)
    sizes = lab.groupBy("scc").agg(F.count("*").cast("long").alias("n_members"))
    outd = qe.groupBy(F.col("src").alias("scc")).agg(
        F.count("*").cast("long").alias("out_deg")
    )
    return (
        sizes.join(lvl.withColumnRenamed("id", "scc"), "scc", "left")
        .join(outd, "scc", "left")
        .select(
            F.col("scc").cast("long"),
            "n_members",
            F.coalesce(F.col("lvl"), F.lit(0)).cast("long").alias("lvl"),
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"),
        )
        .orderBy("scc")
    )


_SCC_CONDENSATION_SQL = """
WITH RECURSIVE
nn AS (SELECT COUNT(*) AS n FROM customer),
verts AS (SELECT c_custkey AS id FROM customer),
geo AS (SELECT id, id // 50 AS blk, id % 50 AS pos,
               LEAST(50, nn.n - (id // 50) * 50) AS bs
        FROM verts CROSS JOIN nn),
e0 AS (SELECT id AS src, blk * 50 + (pos + 1) % bs AS dst FROM geo
       UNION ALL
       SELECT id, (blk + 1) * 50 FROM geo CROSS JOIN nn
       WHERE pos = 0 AND (blk + 1) * 50 < nn.n
       UNION ALL
       SELECT id, (blk + 2) * 50 FROM geo CROSS JOIN nn
       WHERE pos = 1 AND (blk + 2) * 50 < nn.n),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src != dst),
reach(a, b) AS (
    SELECT src, dst FROM e
    UNION
    SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
mutual AS (SELECT r1.a AS a, r1.b AS b
           FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a),
lab AS MATERIALIZED (
    SELECT v.id, COALESCE(MIN(m.b), v.id) AS scc
    FROM verts v LEFT JOIN mutual m ON m.a = v.id
    GROUP BY v.id),
qe AS MATERIALIZED (
    SELECT DISTINCT la.scc AS src, lb.scc AS dst
    FROM e JOIN lab la ON la.id = e.src JOIN lab lb ON lb.id = e.dst
    WHERE la.scc != lb.scc),
qv AS (SELECT DISTINCT scc FROM lab),
paths(c, l) AS (
    SELECT scc, 0 FROM qv
    UNION
    SELECT qe.dst, p.l + 1 FROM paths p JOIN qe ON qe.src = p.c
),
lvl AS (SELECT c AS scc, MAX(l) AS lvl FROM paths GROUP BY c),
sizes AS (SELECT scc, CAST(COUNT(*) AS BIGINT) AS n_members FROM lab GROUP BY scc),
outd AS (SELECT src AS scc, CAST(COUNT(*) AS BIGINT) AS out_deg FROM qe GROUP BY src)
SELECT CAST(sizes.scc AS BIGINT) AS scc,
       sizes.n_members,
       CAST(COALESCE(lvl.lvl, 0) AS BIGINT) AS lvl,
       CAST(COALESCE(outd.out_deg, 0) AS BIGINT) AS out_deg
FROM sizes LEFT JOIN lvl ON lvl.scc = sizes.scc
LEFT JOIN outd ON outd.scc = sizes.scc
ORDER BY sizes.scc
"""


def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98) — the retrieval-diversity pass between search and a RAG
    context window: from each query's BM25 top-10, greedily pick 4
    docs maximizing  relevance − max-similarity-to-already-picked.
    Relevance is the integer rank score (11−rank)·10⁵ ppm; similarity
    is exact 3-gram Jaccard in integer ppm between candidates, so
    every greedy argmax (score desc, doc asc) is engine-exact and the
    SQL oracle replays the 4-step selection verbatim.  At scale the
    pairwise-similarity surface is k²·|queries| (candidates only),
    never corpus-quadratic."""
    from polar_spark.operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    top = bm25_topk(docs, qdf)
    cand = top.select(
        "query_id",
        F.col("doc_id").alias("did"),
        "rnk",
        ((11 - F.col("rnk")) * 100000).cast("long").alias("rel_ppm"),
    ).localCheckpoint(eager=True)
    cdocs = cand.select(F.col("did").alias("doc_id")).distinct()
    grams = doc_trigrams(docs.join(cdocs, "doc_id", "left_semi"))
    sz = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    it = (
        grams.select(F.col("doc_id").alias("a"), "g")
        .join(grams.select(F.col("doc_id").alias("b"), "g"), "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    jp = (
        it.join(sz.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sz.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.expr("c * 1000000 DIV (na + nb - c)").cast("long").alias("j_ppm"),
        )
    )
    jsym = jp.unionByName(
        jp.select(F.col("b").alias("a"), F.col("a").alias("b"), "j_ppm")
    )
    cd = cand.select("query_id", "did")
    pairs = (
        cd.select("query_id", F.col("did").alias("a"))
        .join(cd.select("query_id", F.col("did").alias("b")), "query_id")
        .where(F.col("a") != F.col("b"))
        .join(jsym, ["a", "b"], "left")
        .select(
            "query_id",
            "a",
            "b",
            F.coalesce(F.col("j_ppm"), F.lit(0)).cast("long").alias("j_ppm"),
        )
        .localCheckpoint(eager=True)
    )
    sel = cand.where(F.col("rnk") == 1).select(
        "query_id",
        "did",
        F.lit(1).cast("long").alias("pick_order"),
        F.col("rel_ppm").cast("long").alias("score"),
    )
    for t in range(2, 5):
        rem = cand.join(sel.select("query_id", "did"), ["query_id", "did"], "left_anti")
        pen = (
            pairs.join(sel.select("query_id", F.col("did").alias("b")), ["query_id", "b"])
            .groupBy("query_id", F.col("a").alias("did"))
            .agg(F.max("j_ppm").alias("mj"))
        )
        scored = rem.join(pen, ["query_id", "did"], "left").select(
            "query_id",
            "did",
            (F.col("rel_ppm") - F.coalesce(F.col("mj"), F.lit(0)))
            .cast("long")
            .alias("score"),
        )
        wsel = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("did"))
        pick = (
            scored.withColumn("rn", F.row_number().over(wsel))
            .where(F.col("rn") == 1)
            .select(
                "query_id", "did", F.lit(t).cast("long").alias("pick_order"), "score"
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select(
        "query_id",
        F.col("did").cast("long").alias("doc_id"),
        "pick_order",
        "score",
    ).orderBy("query_id", "pick_order")


def _mmr_sql(k: int = 4) -> str:
    bm25 = _bm25_sql()
    body = bm25.strip()
    assert body.startswith("WITH ")
    inner = body[len("WITH ") :]
    head, _select = inner.rsplit("SELECT query_id,", 1)
    steps = []
    for t in range(2, k + 1):
        steps.append(
            f""",
rem{t} AS (SELECT c.* FROM cand c
           WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} s
                             WHERE s.query_id = c.query_id AND s.did = c.did)),
pen{t} AS (SELECT p.query_id, p.a AS did, MAX(p.j_ppm) AS mj
           FROM pairs p JOIN sel{t - 1} s
             ON s.query_id = p.query_id AND s.did = p.b
           GROUP BY p.query_id, p.a),
sc{t} AS (SELECT r.query_id, r.did,
                 r.rel_ppm - COALESCE(p.mj, 0) AS score
          FROM rem{t} r LEFT JOIN pen{t} p
            ON p.query_id = r.query_id AND p.did = r.did),
pick{t} AS (SELECT query_id, did, {t} AS pick_order, score FROM (
              SELECT sc{t}.*, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY score DESC, did ASC) AS rn FROM sc{t}) x
            WHERE rn = 1),
sel{t} AS MATERIALIZED (
    SELECT query_id, did, pick_order, score FROM sel{t - 1}
    UNION ALL
    SELECT query_id, did, pick_order, score FROM pick{t})"""
        )
    return f"""
WITH {head.rstrip()},
cand AS MATERIALIZED (
    SELECT query_id, CAST(_id AS BIGINT) AS did, rnk,
           CAST((11 - rnk) * 100000 AS BIGINT) AS rel_ppm
    FROM ranked WHERE rnk <= 10),
mtoks AS (SELECT doc_id,
                 generate_subscripts(regexp_split_to_array(TRIM(text), '\\s+'), 1) AS i,
                 UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS w
          FROM documents
          WHERE doc_id IN (SELECT did FROM cand)),
mgrams AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
           FROM mtoks a
           JOIN mtoks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
           JOIN mtoks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
msz AS (SELECT doc_id, COUNT(*) AS n FROM mgrams GROUP BY doc_id),
mit AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS c
        FROM mgrams ga JOIN mgrams gb ON gb.g = ga.g AND ga.doc_id < gb.doc_id
        GROUP BY 1, 2),
jp AS (SELECT mit.a, mit.b,
              CAST(mit.c * 1000000 // (na.n + nb.n - mit.c) AS BIGINT) AS j_ppm
       FROM mit JOIN msz na ON na.doc_id = mit.a
       JOIN msz nb ON nb.doc_id = mit.b),
jsym AS (SELECT a, b, j_ppm FROM jp UNION ALL SELECT b, a, j_ppm FROM jp),
pairs AS MATERIALIZED (
    SELECT x.query_id, x.did AS a, y.did AS b,
           CAST(COALESCE(jsym.j_ppm, 0) AS BIGINT) AS j_ppm
    FROM cand x JOIN cand y ON y.query_id = x.query_id AND x.did != y.did
    LEFT JOIN jsym ON jsym.a = x.did AND jsym.b = y.did),
sel1 AS MATERIALIZED (
    SELECT query_id, did, 1 AS pick_order, rel_ppm AS score
    FROM cand WHERE rnk = 1)
{''.join(steps)}
SELECT query_id, CAST(did AS BIGINT) AS doc_id,
       CAST(pick_order AS BIGINT) AS pick_order, CAST(score AS BIGINT) AS score
FROM sel{k} ORDER BY query_id, pick_order
"""


def q_onion_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onion decomposition (pregel.onion_layers) of the bounded
    co-order graph (parts < 400): per-vertex (layer, coreness) where
    the layer is the peel round that removed the vertex — the
    within-core depth signal coreness alone can't see (Hébert-Dufresne
    et al. 2016).  Measured peel depth 21/22/13 rounds at
    sf0.001/0.01/0.1; the SQL oracle unrolls 26 rounds (rounds past
    drain are no-ops on an empty remainder)."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    return pregel.onion_layers(und).orderBy("id")


_ONION_ROUND = """,
d{T} AS MATERIALIZED (
  SELECT r.id, COALESCE(c.cnt, 0) AS d
  FROM rem{TM1} r LEFT JOIN (
    SELECT e.src AS id, COUNT(*) AS cnt
    FROM e JOIN rem{TM1} r2 ON r2.id = e.dst
    GROUP BY e.src) c ON c.id = r.id),
k{T} AS MATERIALIZED (
  SELECT GREATEST((SELECT k FROM k{TM1}),
                  COALESCE((SELECT MIN(d) FROM d{T}),
                           (SELECT k FROM k{TM1}))) AS k),
s{T} AS MATERIALIZED (
  SELECT id, {T} AS layer, (SELECT k FROM k{T}) AS core
  FROM d{T} WHERE d <= (SELECT k FROM k{T})),
rem{T} AS MATERIALIZED (
  SELECT id FROM rem{TM1} WHERE id NOT IN (SELECT id FROM s{T}))"""


def _onion_sql(n_rounds: int = 26) -> str:
    rounds = "".join(_ONION_ROUND.format(T=t, TM1=t - 1) for t in range(1, n_rounds + 1))
    union = "\nUNION ALL\n".join(f"SELECT * FROM s{t}" for t in range(1, n_rounds + 1))
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
rem0 AS (SELECT DISTINCT src AS id FROM e),
k0 AS (SELECT 0 AS k)
{rounds}
SELECT CAST(id AS BIGINT) AS id, CAST(layer AS BIGINT) AS layer,
       CAST(core AS BIGINT) AS core
FROM ({union}) ORDER BY id
"""


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram Shannon entropy in nats — the lexical-
    diversity / repetitiveness signal read next to source_kl when
    weighing corpus mixtures: H = ln N − (Σ c·ln c)/N from the exact
    integer token counts, one groupBy cascade, rounded 6 dp so
    cross-engine float-sum order can't flip a bit."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    cs = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    return (
        cs.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("vocab"),
            F.round(
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
            ).alias("entropy_r"),
        )
        .orderBy("source")
    )


_TOKEN_ENTROPY_SQL = """
WITH toks AS (SELECT source, t.w AS w
              FROM (SELECT source, string_split(trim(lower(text)), ' ') AS ws
                    FROM documents) d, unnest(d.ws) t(w)),
cs AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 6) AS entropy_r
FROM cs GROUP BY source ORDER BY source
"""


def q_pagerank_residuals6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank convergence curve on the bounded co-order graph
    (parts < 400 — irregular degrees, so the curve is non-trivial;
    the copart graph is regular and converges at iteration 0):
    per-iteration L1 residual ‖r_t − r_{t−1}‖₁ for 6 rounds — the
    convergence-metrics surface the north rule requires, exposed as a
    query with cross-engine parity (geometric decay bounded by the
    0.85 damping contraction is the expected shape).  Each round is
    one join-aggregate plus a 1-row residual action."""
    li = load_table(spark, "lineitem", sf_dir)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    oa, ob = op.alias("a"), op.alias("b")
    und = (
        oa.join(ob, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    e = pregel._hard_cut(_sym(und))
    verts = e.select(F.col("src").alias("id")).distinct().localCheckpoint(eager=True)
    n = verts.count()
    inv = 1.0 / n
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    w = (
        e.join(deg, "src")
        .select("src", "dst", (1.0 / F.col("d")).alias("wt"))
        .localCheckpoint(eager=True)
    )
    r = verts.select("id", F.lit(inv).alias("r")).localCheckpoint(eager=True)
    rows = []
    for t in range(1, 7):
        s = (
            w.join(r.select(F.col("id").alias("src"), F.col("r").alias("pr")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("wt") * F.col("pr")).alias("s"))
        )
        rn = (
            verts.join(s, "id", "left")
            .select(
                "id",
                (0.15 * inv + 0.85 * F.coalesce(F.col("s"), F.lit(0.0))).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        res = (
            rn.join(r.withColumnRenamed("r", "rp"), "id")
            .agg(F.round(F.sum(F.abs(F.col("r") - F.col("rp"))), 6).alias("l1"))
            .collect()[0][0]
        )
        rows.append((t, float(res)))
        r = rn
    return spark.createDataFrame(rows, "iter long, residual_r double")


_PR_RES_ITER = """,
r{K} AS MATERIALIZED (
  SELECT v.id,
         0.15 * inv.x + 0.85 * COALESCE(s.s, 0) AS r
  FROM verts v
  CROSS JOIN inv
  LEFT JOIN (
    SELECT w.dst AS id, SUM(w.wt * p.r) AS s
    FROM w JOIN r{KM1} p ON p.id = w.src
    GROUP BY w.dst
  ) s ON s.id = v.id
)"""


def _pagerank_residual_sql(n_iter: int = 6) -> str:
    iters = "".join(_PR_RES_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    rows = "\nUNION ALL\n".join(
        f"SELECT {t} AS iter, ROUND((SELECT SUM(ABS(a.r - b.r)) "
        f"FROM r{t} a JOIN r{t - 1} b ON b.id = a.id), 6) AS residual_r"
        for t in range(1, n_iter + 1)
    )
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
{_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
inv AS (SELECT 1.0 / COUNT(*) AS x FROM verts),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
w AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / deg.d AS wt
                   FROM e JOIN deg ON deg.src = e.src),
r0 AS MATERIALIZED (SELECT id, (SELECT x FROM inv) AS r FROM verts)
{iters}
SELECT CAST(iter AS BIGINT) AS iter, residual_r FROM ({rows}) ORDER BY iter
"""


ORACLES.update(
    {
        "path3_census": _PATH3_SQL,
        "trophic_levels4": _trophic_sql(4),
        "leiden_refine": _LEIDEN_REFINE_SQL,
        "scc_condensation": _SCC_CONDENSATION_SQL,
        "mmr_diversify": _mmr_sql(4),
        "onion_layers": _onion_sql(26),
        "token_entropy": _TOKEN_ENTROPY_SQL,
        "pagerank_residuals6": _pagerank_residual_sql(6),
        "collective_influence2": _CI2_SQL,
        "core_periphery_fit": _CORE_PERIPHERY_SQL,
    }
)
QUERIES.update(
    {
        "path3_census": q_path3_census,
        "trophic_levels4": q_trophic_levels4,
        "leiden_refine": q_leiden_refine,
        "scc_condensation": q_scc_condensation,
        "mmr_diversify": q_mmr_diversify,
        "onion_layers": q_onion_layers,
        "token_entropy": q_token_entropy,
        "pagerank_residuals6": q_pagerank_residuals6,
        "collective_influence2": q_collective_influence2,
        "core_periphery_fit": q_core_periphery_fit,
    }
)


def q_truss_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truss communities (Cohen 2008 / Neo4j GDS follow-on): connected
    components of the 6-truss subgraph — the dense community CORES that
    plain CC can't isolate (CC merges everything bridged by a single
    edge; the truss drops bridges first).  Composition of two existing
    iterative operators: pregel.ktruss (simultaneous-drop support peel)
    then pregel.connected_components (hash-min) restricted to surviving
    edges.  Same parts<600 co-order graph + 8-round unroll as ktruss6;
    the CC half is the embed_neardup recursive-CTE shape."""
    e = coorder_edges(spark, sf_dir, part_cap=600)
    truss, _stats = pregel.ktruss(e, k=6)
    comp, _ = pregel.connected_components(truss.select("src", "dst"))
    return comp.select(F.col("id").cast("long"), F.col("comp").cast("long")).orderBy("id")


def _truss_cc_sql(k: int, rounds: int) -> str:
    parts = _ktruss_parts(k, rounds)
    return (
        "WITH RECURSIVE "
        + ",\n".join(parts)
        + f""",
        tverts AS (SELECT src AS id FROM e{rounds} UNION SELECT dst FROM e{rounds}),
        tsym AS (SELECT src, dst FROM e{rounds} UNION ALL SELECT dst, src FROM e{rounds}),
        reach(id, comp) AS (
            SELECT id, id FROM tverts
            UNION
            SELECT tsym.dst, r.comp FROM reach r JOIN tsym ON tsym.src = r.id
            WHERE r.comp < tsym.dst
        )
        SELECT CAST(id AS BIGINT) AS id, CAST(MIN(comp) AS BIGINT) AS comp
        FROM reach GROUP BY id ORDER BY id"""
    )


def q_struct_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReFeX-lite structural roles (Henderson et al. KDD'11 posture):
    per-vertex integer feature vector on the bounded co-order graph —
    degree, neighbor-degree sum (one recursive aggregation round), and
    triangle count — bucketed into log₂ role coordinates via the
    hist_quantiles trick (length(bin(v))−1 == floor(log₂ v); no float
    log at 2^k edges).  The hub/connector/periphery signature RolX
    clusters; everything integer-exact end-to-end."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    e = _sym(und)
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    nds = (
        e.join(
            deg.select(F.col("src").alias("dst"), F.col("d").alias("dd")), "dst"
        )
        .groupBy("src")
        .agg(F.sum("dd").alias("s"))
    )
    tri, _total = pregel.triangle_count(und)
    feats = (
        deg.select(F.col("src").alias("id"), "d")
        .join(nds.select(F.col("src").alias("id"), "s"), "id")
        .join(tri, "id", "left")
        .select("id", "d", "s", F.coalesce(F.col("triangles"), F.lit(0)).alias("t"))
    )
    return feats.select(
        F.col("id").cast("long"),
        F.col("d").cast("long").alias("deg"),
        F.col("s").cast("long").alias("nbr_deg_sum"),
        F.col("t").cast("long").alias("tri"),
        (F.length(F.bin(F.col("d"))) - 1).cast("long").alias("role_d"),
        (F.length(F.bin(F.col("s") + 1)) - 1).cast("long").alias("role_s"),
        (F.length(F.bin(F.col("t") + 1)) - 1).cast("long").alias("role_t"),
    ).orderBy("id")


_STRUCT_ROLES_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
nds AS (SELECT e.src AS id, SUM(dd.d) AS s
        FROM e JOIN deg dd ON dd.id = e.dst GROUP BY e.src),
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst),
corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri),
tcnt AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id)
SELECT CAST(deg.id AS BIGINT) AS id,
       CAST(d AS BIGINT) AS deg,
       CAST(s AS BIGINT) AS nbr_deg_sum,
       CAST(COALESCE(t, 0) AS BIGINT) AS tri,
       CAST(LENGTH(BIN(d)) - 1 AS BIGINT) AS role_d,
       CAST(LENGTH(BIN(s + 1)) - 1 AS BIGINT) AS role_s,
       CAST(LENGTH(BIN(COALESCE(t, 0) + 1)) - 1 AS BIGINT) AS role_t
FROM deg JOIN nds ON nds.id = deg.id
LEFT JOIN tcnt ON tcnt.id = deg.id
ORDER BY id
"""


def q_ols_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS regression of extended price (integer cents) on
    quantity — the closed-form normal-equations fit done as ONE
    aggregation pass (the Spark-first shape: six exact integer sums per
    group, no per-row Python, no second pass).  slope / intercept / R²
    derive from the exact BIGINT sums with an identical double-precision
    expression tree in both engines (n·Σy² overflows int64 at sf≥0.1, so
    the DERIVED arithmetic is double over exact integer aggregates —
    deterministic cross-engine because the operand sequence is
    identical), rounded 6 dp."""
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nat = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    xy = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
    )
    agg = xy.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sx2d, sy2d = F.col("sx2").cast("double"), F.col("sy2").cast("double")
    num = nd * sxyd - sxd * syd
    den = nd * sx2d - sxd * sxd
    deny = nd * sy2d - syd * syd
    icnum = syd * sx2d - sxd * sxyd
    return agg.select(
        "n_name",
        F.col("n").alias("n_rows"),
        F.round(num / den, 6).alias("slope_r"),
        F.round(icnum / den, 6).alias("intercept_r"),
        F.round((num * num) / (den * deny), 6).alias("r2_r"),
    ).orderBy("n_name")


_OLS_SQL = """
WITH xy AS (SELECT n_name,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey),
agg AS (SELECT n_name, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
        FROM xy GROUP BY n_name)
SELECT n_name,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope_r,
       ROUND((CAST(sy AS DOUBLE) * CAST(sx2 AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS intercept_r,
       ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2_r
FROM agg ORDER BY n_name
"""


def q_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square term–source association (the classic feature-selection
    screen for source classifiers / contamination triage): per (source,
    term) doc-frequency contingency vs the rest of the corpus.  With
    a = in-source df, ns = source docs, df = global df, nd = corpus
    docs, the 2×2 chi² collapses to nd·(a·nd − ns·df)² /
    (ns·(nd−ns)·df·(nd−df)) — all counts exact BIGINTs; the final ratio
    is double over exact integers with an identical operand sequence in
    both engines (deterministic), rounded 6 dp; top-5 terms per source
    ranked (chi2_r desc, term) — the adamic_adar round-then-rank rule."""
    docs = load_table(spark, "documents", sf_dir)
    dt = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("w"),
    )
    nd = docs.count()
    st = docs.groupBy("source").agg(F.count("*").cast("long").alias("ns"))
    ts = dt.groupBy("source", "w").agg(F.count("*").cast("long").alias("a"))
    tt = dt.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    j = (
        ts.join(tt, "w")
        .join(st, "source")
        .where((F.col("df") >= 5) & (F.col("df") < nd))
    )
    adnd = (F.col("a") * F.lit(nd).cast("long") - F.col("ns") * F.col("df")).cast(
        "double"
    )
    ndd = F.lit(float(nd))
    num = ndd * adnd * adnd
    den = (
        F.col("ns").cast("double")
        * (F.lit(nd).cast("long") - F.col("ns")).cast("double")
        * F.col("df").cast("double")
        * (F.lit(nd).cast("long") - F.col("df")).cast("double")
    )
    scored = j.select(
        "source", F.col("w").alias("term"), "a", "df", F.round(num / den, 6).alias("chi2_r")
    )
    wr = Window.partitionBy("source").orderBy(F.col("chi2_r").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 5)
        .select("source", "term", "a", "df", "chi2_r", F.col("rnk").cast("int"))
        .orderBy("source", "rnk")
    )


_CHI2_SQL = """
WITH dt AS (SELECT DISTINCT doc_id, source, t.w AS w
            FROM (SELECT doc_id, source,
                         string_split(trim(lower(text)), ' ') AS ws
                  FROM documents) d, unnest(d.ws) t(w)),
n AS (SELECT COUNT(*) AS nd FROM documents),
st AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY source),
ts AS (SELECT source, w, COUNT(*) AS a FROM dt GROUP BY source, w),
tt AS (SELECT w, COUNT(*) AS df FROM dt GROUP BY w),
j AS (SELECT ts.source, ts.w, ts.a, tt.df, st.ns, n.nd
      FROM ts JOIN tt ON tt.w = ts.w JOIN st ON st.source = ts.source, n
      WHERE tt.df >= 5 AND tt.df < n.nd),
scored AS (SELECT source, w AS term, a, df,
       ROUND(CAST(nd AS DOUBLE)
             * CAST(a * nd - ns * df AS DOUBLE)
             * CAST(a * nd - ns * df AS DOUBLE)
             / (CAST(ns AS DOUBLE) * CAST(nd - ns AS DOUBLE)
                * CAST(df AS DOUBLE) * CAST(nd - df AS DOUBLE)), 6) AS chi2_r
       FROM j),
ranked AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY source ORDER BY chi2_r DESC, term) AS rnk
           FROM scored)
SELECT source, term, CAST(a AS BIGINT) AS a, CAST(df AS BIGINT) AS df,
       chi2_r, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5 ORDER BY source, rnk
"""


def q_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-correlation audit between degree and 5-round PageRank on
    the bounded co-order graph — does the cheap centrality (degree)
    predict the expensive one?  Spearman ρ from integer rank
    differences and Kendall τ from exact concordant/discordant pair
    counts over the top-100 vertices by (degree desc, id); PageRank is
    ranked on its 6-dp ROUNDED score with id tie-break (the katz/
    adamic_adar lesson) so cross-engine float noise cannot reorder.
    The 100-row rank windows are single-partition by construction
    (bounded audit set, not a scale path)."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    e = pregel._hard_cut(_sym(und))
    pr = pregel.pagerank_fixed(e, n_iter=5, damping=DAMPING)
    deg = e.groupBy("src").agg(F.count("*").alias("d")).select(
        F.col("src").alias("id"), "d"
    )
    j = deg.join(pr, "id").select("id", "d", F.round("rank", 6).alias("pr_r"))
    top = j.orderBy(F.col("d").desc(), F.col("id")).limit(100)
    ranked = top.select(
        "id",
        F.row_number().over(Window.orderBy(F.col("d").desc(), F.col("id"))).alias("rd"),
        F.row_number()
        .over(Window.orderBy(F.col("pr_r").desc(), F.col("id")))
        .alias("rp"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    pairs = a.join(b, F.col("a.rd") < F.col("b.rd")).select(
        F.col("a.rp").alias("pa"), F.col("b.rp").alias("pb")
    )
    s1 = pairs.agg(
        F.sum(F.when(F.col("pa") < F.col("pb"), 1).otherwise(0))
        .cast("long")
        .alias("conc"),
        F.sum(F.when(F.col("pa") > F.col("pb"), 1).otherwise(0))
        .cast("long")
        .alias("disc"),
    )
    s2 = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("rd") - F.col("rp")) * (F.col("rd") - F.col("rp")))
        .cast("long")
        .alias("sum_d2"),
    )
    ndc = F.col("n").cast("double")
    return s2.crossJoin(s1).select(
        "n",
        "sum_d2",
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.round(
            F.lit(1.0) - F.lit(6.0) * F.col("sum_d2").cast("double") / (ndc * (ndc * ndc - F.lit(1.0))),
            6,
        ).alias("spearman_r"),
        F.round(
            (F.col("conc").cast("double") - F.col("disc").cast("double"))
            / (ndc * (ndc - F.lit(1.0)) / F.lit(2.0)),
            6,
        ).alias("kendall_r"),
    )


def _rank_corr_sql(n_iter: int = 5) -> str:
    iters = "".join("," + _PR_ITER.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
verts AS (SELECT DISTINCT src AS id FROM e),
inv AS (SELECT 1.0 / COUNT(*) AS x FROM verts),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
w AS (SELECT e.src, e.dst, 1.0 / deg.d AS wt FROM e JOIN deg ON deg.src = e.src),
r0 AS (SELECT id, (SELECT x FROM inv) AS r FROM verts)
{iters},
j AS (SELECT deg.src AS id, deg.d, ROUND(r{n_iter}.r, 6) AS pr_r
      FROM deg JOIN r{n_iter} ON r{n_iter}.id = deg.src),
top AS (SELECT * FROM j ORDER BY d DESC, id LIMIT 100),
ranked AS (SELECT id,
    ROW_NUMBER() OVER (ORDER BY d DESC, id) AS rd,
    ROW_NUMBER() OVER (ORDER BY pr_r DESC, id) AS rp FROM top),
pairs AS (SELECT a.rp AS pa, b.rp AS pb
          FROM ranked a JOIN ranked b ON a.rd < b.rd),
s1 AS (SELECT SUM(CASE WHEN pa < pb THEN 1 ELSE 0 END) AS conc,
              SUM(CASE WHEN pa > pb THEN 1 ELSE 0 END) AS disc FROM pairs),
s2 AS (SELECT COUNT(*) AS n, SUM((rd - rp) * (rd - rp)) AS sum_d2 FROM ranked)
SELECT CAST(n AS BIGINT) AS n, CAST(sum_d2 AS BIGINT) AS sum_d2,
       CAST(conc AS BIGINT) AS concordant, CAST(disc AS BIGINT) AS discordant,
       ROUND(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)), 6)
         AS spearman_r,
       ROUND((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0), 6) AS kendall_r
FROM s2, s1
"""


def q_steiner_tree4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-approximate Steiner tree (Kou-Markowsky-Berman metric-closure
    construction) connecting the 4 smallest vertices of the weighted
    demand graph: per-terminal shortest paths (pregel.sssp_per_source,
    the sssp_multi4 landmark sweep) build the T×T metric closure, then
    the closure MST (pregel.minimum_spanning_forest, deterministic
    (w,u,v) Kruskal order) is the classic ≤2·OPT backbone.  Integer
    distances end-to-end; the oracle replays the identical Bellman-Ford
    unroll and — because a 3-edge subgraph of K4 touching all 4
    terminals is necessarily a spanning tree — picks the MST as the
    lexicographically-minimal rank triple (the matroid characterization
    of the unique MST under a total edge order).  Returns the chosen
    closure edges (terminal pair + closure distance)."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    dw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") != F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    und = (
        dw.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), "w"
        )
        .groupBy("a", "b")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    e = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    srcs = [r[0] for r in e.select("src").distinct().orderBy("src").limit(4).collect()]
    d, _ = pregel.sssp_per_source(e, srcs)
    closure = (
        d.where(F.col("id").isin([int(s) for s in srcs]))
        .where(F.col("source") < F.col("id"))
        .select(F.col("source").alias("src"), F.col("id").alias("dst"), F.col("dist").alias("w"))
    )
    mst, _ = pregel.minimum_spanning_forest(closure)
    return mst.select(
        F.col("u").cast("long"), F.col("v").cast("long"), F.col("w").cast("long")
    ).orderBy("w", "u", "v")


def _steiner_sql(rounds: int = 8, n_sources: int = 4) -> str:
    parts = _sssp_multi_parts(rounds, n_sources)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
clo AS (SELECT d.source AS u, d.id AS v, d.dist AS w
        FROM d{rounds} d JOIN srcs s ON s.s = d.id WHERE d.source < d.id),
ranked AS (SELECT u, v, w, ROW_NUMBER() OVER (ORDER BY w, u, v) AS r FROM clo),
combos AS (SELECT a.r AS r1, b.r AS r2, c.r AS r3,
                  a.u AS u1, a.v AS v1, a.w AS w1,
                  b.u AS u2, b.v AS v2, b.w AS w2,
                  c.u AS u3, c.v AS v3, c.w AS w3
           FROM ranked a JOIN ranked b ON a.r < b.r JOIN ranked c ON b.r < c.r),
trees AS (SELECT * FROM combos
          WHERE len(list_distinct([u1, v1, u2, v2, u3, v3])) = {n_sources}),
best AS (SELECT * FROM trees ORDER BY r1, r2, r3 LIMIT 1),
edges AS (SELECT u1 AS u, v1 AS v, w1 AS w FROM best
          UNION ALL SELECT u2, v2, w2 FROM best
          UNION ALL SELECT u3, v3, w3 FROM best)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, CAST(w AS BIGINT) AS w
FROM edges ORDER BY w, u, v"""
    )


def q_pca_power3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding covariance by THREE
    distributed power-iteration rounds (y ← C·x, x ← y/‖y‖₂) over the
    covariance held as (i, j, cov) rows — the declarative companion of
    similarity.pca_fit: the d×d matrix-vector product is one
    join-aggregate, never materialized on the driver.  Parity: the
    matrix is PINNED by rounding each covariance entry to 6 dp first
    (the embed_covariance precedent), the all-ones start fixes the sign,
    and the emitted loadings are rounded (eigencentrality4's shape).
    Output: per-dimension loading + the round-3 Rayleigh quotient
    (eigenvalue estimate) on every row."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()
    ij = (
        emb.select(F.posexplode("v").alias("i", "x"), F.col("v").alias("v2"))
        .select("i", "x", F.posexplode("v2").alias("j", "y"))
        .where(F.col("i") <= F.col("j"))
    )
    cov_u = ij.groupBy("i", "j").agg(
        F.round(
            (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.lit(float(n)))
            / F.lit(float(n - 1)),
            6,
        ).alias("c")
    )
    cmat = cov_u.unionByName(
        cov_u.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    ).localCheckpoint(eager=True)
    dims = cmat.select(F.col("i").alias("d")).distinct()
    x = dims.select("d", F.lit(1.0).alias("x")).localCheckpoint(eager=True)
    for _ in range(3):
        y = (
            cmat.join(x.select(F.col("d").alias("j"), "x"), "j")
            .groupBy(F.col("i").alias("d"))
            .agg(F.sum(F.col("c") * F.col("x")).alias("y"))
        )
        nrm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
        x = (
            y.crossJoin(F.broadcast(nrm))
            .select("d", (F.col("y") / F.col("nrm")).alias("x"))
            .localCheckpoint(eager=True)
        )
    cx = (
        cmat.join(x.select(F.col("d").alias("j"), "x"), "j")
        .groupBy(F.col("i").alias("d"))
        .agg(F.sum(F.col("c") * F.col("x")).alias("cx"))
    )
    ray = (
        x.join(cx, "d")
        .agg(F.round(F.sum(F.col("x") * F.col("cx")), 6).alias("eig_r"))
    )
    return (
        x.crossJoin(F.broadcast(ray))
        .select(
            F.col("d").cast("long").alias("dim"),
            F.round("x", 6).alias("loading_r"),
            "eig_r",
        )
        .orderBy("dim")
    )


_PCA_ROUND = """,
y{K} AS MATERIALIZED (
  SELECT cmat.i AS d, SUM(cmat.c * x{KM1}.x) AS y
  FROM cmat JOIN x{KM1} ON x{KM1}.d = cmat.j GROUP BY cmat.i),
nrm{K} AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS nrm FROM y{K}),
x{K} AS MATERIALIZED (SELECT d, y / (SELECT nrm FROM nrm{K}) AS x FROM y{K})"""


def _pca_sql(n_iter: int = 3) -> str:
    rounds = "".join(_PCA_ROUND.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT COUNT(*)::DOUBLE AS n FROM emb),
ij AS (SELECT i - 1 AS i, j - 1 AS j, v[i] AS x, v[j] AS y
       FROM emb, unnest(range(1, len(v) + 1)) u(i), unnest(range(1, len(v) + 1)) w(j)
       WHERE i <= j),
cov_u AS MATERIALIZED (
  SELECT i, j,
         ROUND((SUM(x * y) - SUM(x) * SUM(y) / (SELECT n FROM n))
               / ((SELECT n FROM n) - 1), 6) AS c
  FROM ij GROUP BY i, j),
cmat AS MATERIALIZED (SELECT i, j, c FROM cov_u
                      UNION ALL SELECT j, i, c FROM cov_u WHERE i < j),
x0 AS (SELECT DISTINCT i AS d, 1.0::DOUBLE AS x FROM cmat)
{rounds},
cx AS MATERIALIZED (
  SELECT cmat.i AS d, SUM(cmat.c * x{n_iter}.x) AS cx
  FROM cmat JOIN x{n_iter} ON x{n_iter}.d = cmat.j GROUP BY cmat.i),
ray AS (SELECT ROUND(SUM(x.x * cx.cx), 6) AS eig_r
        FROM x{n_iter} x JOIN cx ON cx.d = x.d)
SELECT CAST(x.d AS BIGINT) AS dim, ROUND(x.x, 6) AS loading_r,
       (SELECT eig_r FROM ray) AS eig_r
FROM x{n_iter} x ORDER BY dim
"""


def q_odd_walk_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex shortest odd closed walk (bipartite double cover —
    pregel.odd_closed_walks) on the bounded co-order graph: 3 for
    triangle vertices, larger for vertices whose only odd structure is
    further out, absent for bipartite-side vertices.  The per-vertex
    refinement of bipartite_report's component verdict."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    out, _stats = pregel.odd_closed_walks(und, max_len=9)
    return out.orderBy("id")


_ODD_WALK_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
cov AS (SELECT src * 2 AS src, dst * 2 + 1 AS dst FROM e
        UNION ALL SELECT src * 2 + 1, dst * 2 FROM e),
verts AS (SELECT DISTINCT src AS v FROM e),
reach(s, id, d) AS (
    SELECT v * 2, v * 2, 0 FROM verts
    UNION
    SELECT r.s, cov.dst, r.d + 1 FROM reach r JOIN cov ON cov.src = r.id
    WHERE r.d < 9
),
dmin AS (SELECT s, id, MIN(d) AS d FROM reach GROUP BY s, id)
SELECT CAST(s / 2 AS BIGINT) AS id, CAST(d AS BIGINT) AS odd_len
FROM dmin WHERE id = s + 1 ORDER BY id
"""


def q_cusum_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint statistic over hourly event counts (Page
    1954), integer-exact: with x_t the hourly count, nh hours and
    `total` events, the drift-free deviations a_t = nh·x_t − total sum
    to zero, and the one-sided CUSUM S_t = max(0, S_{t−1} + a_t)
    rewrites as the PREFIX form S_t = P_t − min(0, min_{s≤t} P_s) —
    two cumulative windows over the pre-aggregated hour table (bounded
    by calendar hours, the hourly_anomaly posture), no sequential
    recurrence.  Alarm when the scaled cumulative excess passes five
    mean hours (S_t > 5·total ⇔ excess > 5·mean)."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count("*").cast("long").alias("n_events")
    )
    tot = hourly.agg(
        F.sum("n_events").cast("long").alias("total"),
        F.count("*").cast("long").alias("nh"),
    )
    h2 = hourly.crossJoin(F.broadcast(tot)).select(
        "hour",
        "n_events",
        "total",
        (F.col("nh") * F.col("n_events") - F.col("total")).alias("a"),
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    p = h2.select(
        "hour", "n_events", "total", F.sum("a").over(w).cast("long").alias("p")
    )
    p2 = p.select(
        "hour",
        "n_events",
        "total",
        "p",
        F.least(F.lit(0).cast("long"), F.min("p").over(w)).alias("pmin"),
    )
    return p2.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_events",
        (F.col("p") - F.col("pmin")).cast("long").alias("cusum_scaled"),
        F.when(F.col("p") - F.col("pmin") > F.lit(5) * F.col("total"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("alarm"),
    ).orderBy("hour")


_CUSUM_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
tot AS (SELECT SUM(n_events) AS total, COUNT(*) AS nh FROM hourly),
h2 AS (SELECT hour, n_events, total, nh * n_events - total AS a
       FROM hourly, tot),
p AS (SELECT hour, n_events, total,
             SUM(a) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS p
      FROM h2),
p2 AS (SELECT hour, n_events, total, p,
              LEAST(0, MIN(p) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING)) AS pmin
       FROM p)
SELECT STRFTIME(hour, '%Y-%m-%d %H:%M:%S') AS hour, n_events,
       CAST(p - pmin AS BIGINT) AS cusum_scaled,
       CAST(CASE WHEN p - pmin > 5 * total THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM p2 ORDER BY hour
"""


def q_rake_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    token runs between stopword delimiters ('the'/'a' — present in the
    synthetic vocabulary) form candidate phrases (1–4 tokens); word
    degree = Σ phrase length over occurrences, word frequency = #
    occurrences, phrase score = Σ deg(w)/freq(w) over its words.  Top
    10 phrases by (rounded score desc, phrase) — deg/freq ratios are
    exact-integer divisions so the 6-dp round is cross-engine stable.
    Phrase segmentation is a per-doc cumulative window (partitioned by
    doc — parallel, not a global sort); everything else is explode +
    groupBy, fully JVM."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("pos", "w"),
    ).withColumn("is_delim", F.col("w").isin("the", "a"))
    wp = Window.partitionBy("doc_id").orderBy("pos")
    seg = (
        toks.withColumn("phrase_id", F.sum(F.col("is_delim").cast("int")).over(wp))
        .where(~F.col("is_delim"))
    )
    phrases = (
        seg.groupBy("doc_id", "phrase_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "w"))).alias("sw"))
        .select(F.transform("sw", lambda s: s["w"]).alias("words"))
        .where((F.size("words") >= 1) & (F.size("words") <= 4))
        .select(F.array_join("words", " ").alias("phrase"), F.size("words").alias("plen"))
    )
    wstats = (
        phrases.select(F.explode(F.split("phrase", " ")).alias("w"), "plen")
        .groupBy("w")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    pcounts = phrases.groupBy("phrase").agg(F.count("*").cast("long").alias("n"))
    scored = (
        pcounts.select("phrase", "n", F.explode(F.split("phrase", " ")).alias("w"))
        .join(wstats, "w")
        .groupBy("phrase", "n")
        .agg(
            F.round(F.sum(F.col("deg").cast("double") / F.col("freq").cast("double")), 6).alias(
                "score_r"
            )
        )
    )
    return (
        scored.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("score_r").desc(), F.col("phrase"))),
        )
        .where(F.col("rnk") <= 10)
        .select("phrase", "n", "score_r", F.col("rnk").cast("int"))
        .orderBy("rnk")
    )


_RAKE_SQL = """
WITH d AS (SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws FROM documents),
toks AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w,
                CASE WHEN ws[i] IN ('the', 'a') THEN 1 ELSE 0 END AS is_delim
         FROM d, unnest(range(1, len(ws) + 1)) u(i)),
seg AS (SELECT doc_id, pos, w,
               SUM(is_delim) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS UNBOUNDED PRECEDING) AS phrase_id
        FROM toks WHERE TRUE QUALIFY is_delim = 0),
phr0 AS (SELECT doc_id, phrase_id, list(w ORDER BY pos) AS words
         FROM seg GROUP BY doc_id, phrase_id),
phrases AS (SELECT array_to_string(words, ' ') AS phrase, len(words) AS plen
            FROM phr0 WHERE len(words) BETWEEN 1 AND 4),
wstats AS (SELECT t.w AS w, COUNT(*) AS freq, SUM(plen) AS deg
           FROM phrases, unnest(string_split(phrase, ' ')) t(w)
           GROUP BY t.w),
pcounts AS (SELECT phrase, COUNT(*) AS n FROM phrases GROUP BY phrase),
scored AS (SELECT p.phrase, p.n,
                  ROUND(SUM(CAST(ws.deg AS DOUBLE) / CAST(ws.freq AS DOUBLE)), 6)
                    AS score_r
           FROM pcounts p, unnest(string_split(p.phrase, ' ')) t(w)
           JOIN wstats ws ON ws.w = t.w
           GROUP BY p.phrase, p.n),
ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score_r DESC, phrase) AS rnk
           FROM scored)
SELECT phrase, CAST(n AS BIGINT) AS n, score_r, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 10 ORDER BY rnk
"""


def _cosine_pair_scan(
    emb: DataFrame, k: int, eps: float | None, rank_on: str = "cos"
) -> DataFrame:
    """One vectorized pass over all cosine pairs (the similarity.py
    mapInPandas shape): the L2-normalized matrix is broadcast, each
    Arrow batch does ONE numpy matmul against it, and only the small
    outputs leave the executor — per-row top-``k`` neighbors with
    ``rn`` 1..k, plus (rn=0) every further pair whose rounded distance
    is ≤ ``eps``.  ``rank_on='cos'`` orders by (round(cos,7) DESC, id)
    — the snn_clusters oracle's key; ``rank_on='dist'`` orders by
    (round(1−cos,7) ASC, id) — the dbscan_star oracle's key (the two
    roundings can disagree at a 7-dp boundary, so the ranking must use
    the SAME rounded quantity as its oracle).  Replaces the interpreted
    zip_with/aggregate fold (CodegenFallback — the dup_spans lesson)
    that made the exact pair join the bench bottleneck; at corpus scale
    the broadcast matrix is replaced by the LSH-bucketed candidate
    path."""
    import numpy as np
    import pandas as pd

    rows = emb.select("vec_id", "v").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    kk, ee, on_dist = int(k), eps, rank_on == "dist"

    def scan(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.array(pdf["v"].tolist(), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            qid = pdf["vec_id"].to_numpy(np.int64)
            cos = q @ all_mat.T  # (B, N)
            out = {"qid": [], "nid": [], "cos_r": [], "d_r": [], "rn": []}
            for i in range(len(qid)):
                row = cos[i]
                cr = np.round(row, 7)
                dr = np.round(1.0 - row, 7)
                valid = np.flatnonzero(all_ids != qid[i])
                rank_key = dr[valid] if on_dist else -cr[valid]
                key = np.lexsort((all_ids[valid], rank_key))
                top = valid[key[:kk]]
                out["qid"].append(np.full(len(top), qid[i], dtype=np.int64))
                out["nid"].append(all_ids[top])
                out["cos_r"].append(cr[top])
                out["d_r"].append(dr[top])
                out["rn"].append(np.arange(1, len(top) + 1, dtype=np.int32))
                if ee is not None:
                    sel = np.setdiff1d(valid[dr[valid] <= ee], top)
                    out["qid"].append(np.full(len(sel), qid[i], dtype=np.int64))
                    out["nid"].append(all_ids[sel])
                    out["cos_r"].append(cr[sel])
                    out["d_r"].append(dr[sel])
                    out["rn"].append(np.zeros(len(sel), dtype=np.int32))
            if not out["qid"]:
                continue
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out["qid"]),
                    "nid": np.concatenate(out["nid"]),
                    "cos_r": np.concatenate(out["cos_r"]),
                    "d_r": np.concatenate(out["d_r"]),
                    "rn": np.concatenate(out["rn"]),
                }
            )

    return emb.select("vec_id", "v").mapInPandas(
        scan, schema="qid long, nid long, cos_r double, d_r double, rn int"
    )


def q_snn_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-nearest-neighbor clustering (Ertöz-Steinbach-Kumar SDM'03,
    the Jarvis-Patrick family): exact cosine 5-NN lists per vector
    (ranked on the 7-dp ROUNDED similarity with id tie-break — the
    cosine_pairs parity margin), an SNN edge where the 5-NN relation is
    MUTUAL and the two lists share ≥ 2 neighbors, then hash-min
    connected components over the SNN edges.  Density-based grouping
    that survives varying cluster density where a global cosine
    threshold (embed_neardup) can't.  Emits (vec_id, cluster rep) for
    vertices with at least one SNN edge."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    knn = (
        _cosine_pair_scan(emb, k=5, eps=None, rank_on="cos")
        .select("qid", "nid")
        .localCheckpoint(eager=True)
    )
    mutual = (
        knn.alias("f")
        .join(
            knn.select(F.col("qid").alias("nid"), F.col("nid").alias("qid")).alias("r"),
            ["qid", "nid"],
        )
        .where(F.col("qid") < F.col("nid"))
    )
    shared = (
        mutual.alias("m")
        .join(knn.select(F.col("qid").alias("qid"), F.col("nid").alias("x")), "qid")
        .join(
            knn.select(F.col("qid").alias("nid"), F.col("nid").alias("y")),
            "nid",
        )
        .where(F.col("x") == F.col("y"))
        .groupBy("qid", "nid")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )
    comp, _ = pregel.connected_components(
        shared.select(F.col("qid").alias("src"), F.col("nid").alias("dst"))
    )
    return comp.select(
        F.col("id").cast("long").alias("vec_id"), F.col("comp").cast("long").alias("cluster")
    ).orderBy("vec_id")


_SNN_SQL = """
WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
scored AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                  ROUND(list_cosine_similarity(a.v, b.v), 7) AS cos_r
           FROM emb a JOIN emb b ON a.vec_id != b.vec_id),
knn AS (SELECT qid, nid FROM (
          SELECT qid, nid,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos_r DESC, nid) AS rn
          FROM scored) t WHERE rn <= 5),
mutual AS (SELECT f.qid, f.nid FROM knn f
           JOIN knn r ON r.qid = f.nid AND r.nid = f.qid
           WHERE f.qid < f.nid),
shared AS (SELECT m.qid, m.nid
           FROM mutual m
           JOIN knn ka ON ka.qid = m.qid
           JOIN knn kb ON kb.qid = m.nid AND kb.nid = ka.nid
           GROUP BY m.qid, m.nid HAVING COUNT(*) >= 2),
e AS (SELECT qid AS src, nid AS dst FROM shared
      UNION SELECT nid, qid FROM shared),
verts AS (SELECT DISTINCT src AS id FROM e),
reach(id, comp) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
    WHERE r.comp < e.dst
)
SELECT CAST(id AS BIGINT) AS vec_id, CAST(MIN(comp) AS BIGINT) AS cluster
FROM reach GROUP BY id ORDER BY id
"""


def q_molloy_reed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Molloy-Reed percolation criterion on the co-order graph: κ =
    ⟨k²⟩/⟨k⟩ from the exact integer degree moments, giant-component
    existence iff κ > 2, and the random-failure percolation threshold
    f_c = 1 − 1/(κ−1) — the closed-form robustness number
    attack_tolerance measures empirically.  One degree aggregation;
    the only floats are two final divisions of exact BIGINTs."""
    e = pregel._hard_cut(_sym(coorder_edges(spark, sf_dir)))  # materialize once: multiple consumers
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    agg = deg.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("sum_d"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sum_d2"),
    )
    kappa = F.col("sum_d2").cast("double") / F.col("sum_d").cast("double")
    return agg.select(
        "n",
        (F.col("sum_d") / 2).cast("long").alias("m"),
        "sum_d2",
        F.round(kappa, 6).alias("kappa_r"),
        F.round(F.lit(1.0) - F.lit(1.0) / (kappa - F.lit(1.0)), 6).alias("fc_r"),
    )


_MOLLOY_REED_SQL = f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
agg AS (SELECT COUNT(*) AS n, SUM(d) AS sum_d, SUM(d * d) AS sum_d2 FROM deg)
SELECT CAST(n AS BIGINT) AS n,
       CAST(sum_d / 2 AS BIGINT) AS m,
       CAST(sum_d2 AS BIGINT) AS sum_d2,
       ROUND(CAST(sum_d2 AS DOUBLE) / CAST(sum_d AS DOUBLE), 6) AS kappa_r,
       ROUND(1.0 - 1.0 / (CAST(sum_d2 AS DOUBLE) / CAST(sum_d AS DOUBLE) - 1.0), 6)
         AS fc_r
FROM agg
"""


def q_sbm_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-corrected SBM log-likelihood (Karrer-Newman 2011, the
    unnormalized form 𝓛 = Σ_rs m_rs ln(m_rs/(κ_r κ_s)) over directed
    block pairs) of the 2-round LPA partition on the sparse co-order
    graph — the model-selection companion to modularity_lpa /
    conductance_lpa: higher 𝓛 = the blocks explain the edges better
    than degree alone.  m_rs and κ_r are exact integers from the SAME
    deterministic labels the lpa_fixed2 oracle replays; each block-pair
    term is one deterministic double expression and the final sum is
    rounded 4 dp."""
    # checkpointed: und feeds the LPA run (its own actions) AND the
    # final block-count plan — one co-order build instead of two
    und = pregel._hard_cut(coorder_edges(spark, sf_dir))
    e = _sym(und)
    labels, _ = pregel.label_propagation(und, max_iter=2)
    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    el = (
        e.join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "ld"), "dst")
    )
    mrs = el.groupBy("ls", "ld").agg(F.count("*").cast("long").alias("m_rs"))
    kap = el.groupBy("ls").agg(F.count("*").cast("long").alias("kappa"))
    terms = (
        mrs.join(kap.select(F.col("ls"), F.col("kappa").alias("kr")), "ls")
        .join(kap.select(F.col("ls").alias("ld"), F.col("kappa").alias("ks")), "ld")
        .select(
            "ls",
            "ld",
            "m_rs",
            (
                F.col("m_rs").cast("double")
                * F.log(
                    F.col("m_rs").cast("double")
                    / (F.col("kr").cast("double") * F.col("ks").cast("double"))
                )
            ).alias("t"),
        )
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_block_pairs"),
        F.sum("m_rs").cast("long").alias("m2"),
        F.round(F.sum("t"), 4).alias("loglik_r"),
    )


def _sbm_sql() -> str:
    lpa_rounds = "".join("," + _LPA_ROUND.format(K=k, KM1=k - 1) for k in (1, 2))
    return f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
verts AS (SELECT DISTINCT src AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)
{lpa_rounds},
el AS (SELECT e.src, e.dst, a.label AS ls, b.label AS ld
       FROM e JOIN l2 a ON a.id = e.src JOIN l2 b ON b.id = e.dst),
mrs AS (SELECT ls, ld, COUNT(*) AS m_rs FROM el GROUP BY ls, ld),
kap AS (SELECT ls, COUNT(*) AS kappa FROM el GROUP BY ls),
terms AS (SELECT mrs.ls, mrs.ld, mrs.m_rs,
                 CAST(mrs.m_rs AS DOUBLE)
                 * LN(CAST(mrs.m_rs AS DOUBLE)
                      / (CAST(kr.kappa AS DOUBLE) * CAST(ks.kappa AS DOUBLE))) AS t
          FROM mrs JOIN kap kr ON kr.ls = mrs.ls
                   JOIN kap ks ON ks.ls = mrs.ld)
SELECT CAST(COUNT(*) AS BIGINT) AS n_block_pairs,
       CAST(SUM(m_rs) AS BIGINT) AS m2,
       ROUND(SUM(t), 4) AS loglik_r
FROM terms
"""


def q_err_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval #3: Expected Reciprocal Rank @10
    (Chapelle et al. CIKM'09 cascade model, binary relevance with stop
    probability θ = 0.5) of the BM25 top-10 against the boolean-AND
    relevance set — ERR = Σ_{relevant hits} θ(1−θ)^k / rank with k the
    number of relevant hits ranked above.  Unlike MRR it credits
    multiple hits, unlike nDCG it discounts by what the user already
    saw.  Powers of 0.5 are exact in binary floating point and 1/rank
    is a deterministic double, so 6-dp rounding is cross-engine safe."""
    from polar_spark.operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    top10 = bm25_topk(docs, qdf)
    qt = qdf.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.trim("qtext"), " "))).alias("term"),
    )
    n_terms = qt.groupBy("query_id").agg(F.count("*").cast("long").alias("n_terms"))
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " "))).alias("term"),
    )
    rel = (
        dt.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("matched"))
        .join(F.broadcast(n_terms), "query_id")
        .where(F.col("matched") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )
    hits = top10.join(rel, ["query_id", "doc_id"]).select("query_id", "rnk")
    wprev = Window.partitionBy("query_id").orderBy("rnk")
    scored = hits.select(
        "query_id",
        (
            F.pow(F.lit(0.5), F.row_number().over(wprev).cast("double"))
            / F.col("rnk").cast("double")
        ).alias("c"),
    )
    err = scored.groupBy("query_id").agg(
        F.count("*").cast("long").alias("hits10"),
        F.round(F.sum("c"), 6).alias("err_r"),
    )
    base = spark.createDataFrame([(q,) for q, _t in _BM25_QUERIES], "query_id string")
    return (
        base.join(err, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits10"), F.lit(0)).cast("long").alias("hits10"),
            F.coalesce(F.col("err_r"), F.lit(0.0)).alias("err_r"),
        )
        .orderBy("query_id")
    )


def _err_sql(k1: float = 1.2, b: float = 0.75, scale: int = 1_000_000) -> str:
    bm25 = _bm25_sql(k1, b, scale)
    body = bm25.strip()
    assert body.startswith("WITH ")
    inner = body[len("WITH ") :]
    head, _select = inner.rsplit("SELECT query_id,", 1)
    return f"""
WITH {head.rstrip()},
top10 AS (SELECT query_id, CAST(_id AS BIGINT) AS doc_id, rnk
          FROM ranked WHERE rnk <= 10),
nt AS (SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
       FROM qt GROUP BY query_id),
rel AS (SELECT qt.query_id, toks._id AS doc_id
        FROM (SELECT DISTINCT _id, term FROM toks) toks
        JOIN qt ON qt.term = toks.term
        JOIN nt ON nt.query_id = qt.query_id
        GROUP BY qt.query_id, toks._id, nt.n_terms
        HAVING COUNT(DISTINCT toks.term) = nt.n_terms),
hits AS (SELECT t.query_id, t.rnk,
                ROW_NUMBER() OVER (PARTITION BY t.query_id ORDER BY t.rnk) AS k1
         FROM top10 t JOIN rel r ON r.query_id = t.query_id
                              AND r.doc_id = t.doc_id),
err AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS hits10,
               ROUND(SUM(POWER(0.5, CAST(k1 AS DOUBLE))
                         / CAST(rnk AS DOUBLE)), 6) AS err_r
        FROM hits GROUP BY query_id)
SELECT q.query_id,
       CAST(COALESCE(err.hits10, 0) AS BIGINT) AS hits10,
       COALESCE(err.err_r, 0.0) AS err_r
FROM q LEFT JOIN err ON err.query_id = q.query_id
ORDER BY q.query_id
"""


ORACLES.update(
    {
        "truss_components": _truss_cc_sql(6, 8),
        "struct_roles": _STRUCT_ROLES_SQL,
        "ols_price_qty": _OLS_SQL,
        "chi2_terms": _CHI2_SQL,
        "rank_corr": _rank_corr_sql(5),
        "steiner_tree4": _steiner_sql(8, 4),
        "pca_power3": _pca_sql(3),
        "odd_walk_len": _ODD_WALK_SQL,
        "cusum_hourly": _CUSUM_SQL,
        "rake_top10": _RAKE_SQL,
        "snn_clusters": _SNN_SQL,
        "molloy_reed": _MOLLOY_REED_SQL,
        "sbm_likelihood": _sbm_sql(),
        "err_eval": _err_sql(),
    }
)


def q_graphlet4_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete induced 4-node graphlet census (P4 / claw / paw / C4 /
    diamond / K4) of the bounded co-order graph via the PGD/ESCAPE
    closed-form aggregate inversion (pregel.four_node_census) — no
    4-subset enumeration; the operator is validated against brute-force
    enumeration on hand graphs in pytest and the SQL oracle replays the
    identical integer aggregates + Möbius inversion."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    return pregel.four_node_census(und)


_GRAPHLET4_SQL = """
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS d FROM e GROUP BY src),
tri AS MATERIALIZED (SELECT a.src AS x, a.dst AS y, b.dst AS z
       FROM und a JOIN und b ON b.src = a.dst
       JOIN und c ON c.src = a.src AND c.dst = b.dst),
tv AS (SELECT v, COUNT(*) AS t FROM (
         SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri) GROUP BY v),
sup AS (SELECT u, w, COUNT(*) AS s FROM (
          SELECT x AS u, y AS w FROM tri UNION ALL SELECT y, z FROM tri
          UNION ALL SELECT x, z FROM tri) GROUP BY u, w),
k4c AS (SELECT COUNT(*) AS k4 FROM tri
        JOIN und e1 ON e1.src = tri.z
        JOIN und e2 ON e2.src = tri.y AND e2.dst = e1.dst
        JOIN und e3 ON e3.src = tri.x AND e3.dst = e1.dst),
codeg AS (SELECT a.dst AS u, b.dst AS v, COUNT(*) AS c
          FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
          GROUP BY a.dst, b.dst),
dstats AS (SELECT COUNT(*) AS n,
                  CAST(SUM(d) / 2 AS BIGINT) AS m,
                  CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS wedges,
                  CAST(SUM(d * (d - 1) * (d - 2) / 6) AS BIGINT) AS claw_ni
           FROM deg),
tt AS (SELECT COUNT(*) AS t_total FROM tri),
pawc AS (SELECT CAST(COALESCE(SUM(tv.t * (deg.d - 2)), 0) AS BIGINT) AS paw_ni
         FROM tv JOIN deg ON deg.v = tv.v),
diamc AS (SELECT CAST(COALESCE(SUM(s * (s - 1) / 2), 0) AS BIGINT) AS diam_ni
          FROM sup),
p4w AS (SELECT CAST(COALESCE(SUM((du.d - 1) * (dv.d - 1)), 0) AS BIGINT) AS p4_walks
        FROM und JOIN deg du ON du.v = und.src JOIN deg dv ON dv.v = und.dst),
c4c AS (SELECT CAST(COALESCE(SUM(c * (c - 1) / 2) / 2, 0) AS BIGINT) AS c4_ni
        FROM codeg),
raw AS (SELECT dstats.n, dstats.m, dstats.wedges, dstats.claw_ni,
               tt.t_total, pawc.paw_ni, diamc.diam_ni,
               p4w.p4_walks - 3 * tt.t_total AS p4_ni, c4c.c4_ni, k4c.k4
        FROM dstats, tt, pawc, diamc, p4w, c4c, k4c),
inv AS (SELECT *,
               diam_ni - 6 * k4 AS i_diamond,
               c4_ni - (diam_ni - 6 * k4) - 3 * k4 AS i_c4,
               paw_ni - 4 * (diam_ni - 6 * k4) - 12 * k4 AS i_paw
        FROM raw)
SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
       CAST(wedges AS BIGINT) AS wedges,
       CAST(t_total AS BIGINT) AS triangles,
       CAST(p4_ni - 4 * i_c4 - 2 * i_paw - 6 * i_diamond - 12 * k4 AS BIGINT) AS i_p4,
       CAST(claw_ni - i_paw - 2 * i_diamond - 4 * k4 AS BIGINT) AS i_claw,
       CAST(i_paw AS BIGINT) AS i_paw,
       CAST(i_c4 AS BIGINT) AS i_c4,
       CAST(i_diamond AS BIGINT) AS i_diamond,
       CAST(k4 AS BIGINT) AS i_k4
FROM inv
"""


ORACLES.update({"graphlet4_census": _GRAPHLET4_SQL})
QUERIES.update({"graphlet4_census": q_graphlet4_census})


def q_nbt_centrality3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-backtracking walk centrality (Martin-Zhang-Newman 2014, the
    Hashimoto-matrix power iteration that fixes eigenvector
    centrality's hub-self-inflation): state lives on DIRECTED EDGES,
    x'_{(v,w)} = Σ_{(u,v), u≠w} x_{(u,v)} — each round one
    join-aggregate with the backtrack-exclusion predicate.  Run 3
    rounds UNNORMALIZED from x₀ = 1, so x₃ is the exact INTEGER count
    of non-backtracking walks of length 3 ending on each edge, and the
    per-vertex centrality Σ_{e into v} x₃(e) is BIGINT-exact
    cross-engine (bounded graph keeps counts < 2^40)."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    e = pregel._hard_cut(_sym(und))
    x = e.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).cast("long").alias("x"))
    for _ in range(3):
        x = (
            x.join(e.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v")
            .where(F.col("w") != F.col("u"))
            .groupBy(F.col("v").alias("u"), F.col("w").alias("v"))
            .agg(F.sum("x").cast("long").alias("x"))
            .localCheckpoint(eager=True)
        )
    return (
        x.groupBy(F.col("v").alias("id"))
        .agg(F.sum("x").cast("long").alias("nbt3"))
        .select(F.col("id").cast("long"), "nbt3")
        .orderBy("id")
    )


_NBT_ROUND = """,
x{K} AS MATERIALIZED (
  SELECT p.v AS u, e.dst AS v, SUM(p.x) AS x
  FROM x{KM1} p JOIN e ON e.src = p.v AND e.dst != p.u
  GROUP BY p.v, e.dst)"""


def _nbt_sql(n_iter: int = 3) -> str:
    rounds = "".join(_NBT_ROUND.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
x0 AS (SELECT src AS u, dst AS v, CAST(1 AS BIGINT) AS x FROM e)
{rounds}
SELECT CAST(v AS BIGINT) AS id, CAST(SUM(x) AS BIGINT) AS nbt3
FROM x{n_iter} GROUP BY v ORDER BY id
"""


def q_forman_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forman-Ricci edge-curvature distribution (Sreejith et al. 2016,
    the triangle-augmented combinatorial form F(e) = 4 − d_u − d_v +
    3·t_e) over the co-order graph: negatively curved edges are the
    bridges/bottlenecks information flow crowds through, positive ones
    sit inside dense communities.  Degrees + per-edge triangle support
    (the id-ordered triangle join) make it one pass of exact integers;
    reported as the curvature histogram."""
    und = pregel._hard_cut(coorder_edges(spark, sf_dir))
    sym = _sym(und)
    deg = sym.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    # per-edge triangle support via the degree-oriented enumeration
    # (pregel.edge_common_neighbors) — same triangle set as the former
    # id-ordered 3-join, found from the lowest-(deg, id) apex instead,
    # which minimizes the wedge intermediate (guide §2.3); und is
    # checkpointed so the 4 plan references stop re-running the build
    sup = pregel.edge_common_neighbors(und).select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.col("cn").cast("long").alias("t")
    )
    curved = (
        und.join(sup, ["src", "dst"], "left")
        .join(deg.select(F.col("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("src").alias("dst"), F.col("d").alias("dv")), "dst")
        .select(
            (
                F.lit(4)
                - F.col("du")
                - F.col("dv")
                + F.lit(3) * F.coalesce(F.col("t"), F.lit(0))
            ).cast("long").alias("curv")
        )
    )
    return (
        curved.groupBy("curv")
        .agg(F.count("*").cast("long").alias("n_edges"))
        .orderBy("curv")
    )


_FORMAN_SQL = f"""
WITH {_COORDER_SQL}, {_SYM_SQL},
deg AS (SELECT src AS v, COUNT(*) AS d FROM e GROUP BY src),
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst),
sup AS (SELECT u, w, COUNT(*) AS t FROM (
          SELECT x AS u, y AS w FROM tri UNION ALL SELECT y, z FROM tri
          UNION ALL SELECT x, z FROM tri) GROUP BY u, w),
curved AS (SELECT 4 - du.d - dv.d + 3 * COALESCE(sup.t, 0) AS curv
           FROM und
           LEFT JOIN sup ON sup.u = und.src AND sup.w = und.dst
           JOIN deg du ON du.v = und.src
           JOIN deg dv ON dv.v = und.dst)
SELECT CAST(curv AS BIGINT) AS curv, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM curved GROUP BY curv ORDER BY curv
"""


ORACLES.update(
    {"nbt_centrality3": _nbt_sql(3), "forman_curvature": _FORMAN_SQL}
)
QUERIES.update(
    {"nbt_centrality3": q_nbt_centrality3, "forman_curvature": q_forman_curvature}
)


def q_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granovetter local bridges with span (pregel.local_bridges) on the
    bounded co-order graph: embeddedness-0 edges (the weak ties
    tie_overlap histograms) plus HOW weak — the detour distance once
    the tie is cut, from one simultaneous keyed BFS over G−e per
    bridge, capped at 8 (span −1 = endpoints ≥ 9 apart or
    disconnected)."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    out, _stats = pregel.local_bridges(und, max_span=8)
    return out.orderBy("u", "v")


_LOCAL_BRIDGES_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst),
supd AS (SELECT DISTINCT u, w FROM (
           SELECT x AS u, y AS w FROM tri UNION ALL SELECT y, z FROM tri
           UNION ALL SELECT x, z FROM tri)),
bridges AS (SELECT und.src AS bu, und.dst AS bv FROM und
            LEFT JOIN supd ON supd.u = und.src AND supd.w = und.dst
            WHERE supd.u IS NULL),
reach(bu, bv, id, d) AS (
    SELECT bu, bv, bu, 0 FROM bridges
    UNION
    SELECT r.bu, r.bv, e.dst, r.d + 1
    FROM reach r JOIN e ON e.src = r.id
    WHERE r.d < 8
      AND NOT ((e.src = r.bu AND e.dst = r.bv)
               OR (e.src = r.bv AND e.dst = r.bu))
),
dmin AS (SELECT bu, bv, MIN(d) AS span FROM reach WHERE id = bv GROUP BY bu, bv)
SELECT CAST(b.bu AS BIGINT) AS u, CAST(b.bv AS BIGINT) AS v,
       CAST(COALESCE(dmin.span, -1) AS BIGINT) AS span
FROM bridges b LEFT JOIN dmin ON dmin.bu = b.bu AND dmin.bv = b.bv
ORDER BY u, v
"""


ORACLES.update({"local_bridges": _LOCAL_BRIDGES_SQL})
QUERIES.update({"local_bridges": q_local_bridges})


def q_two_edge_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-edge-connected components of the bounded co-order graph: every
    support-0 edge whose endpoints stay CONNECTED after removal is a
    mere local bridge, but the ones that don't are true cut edges —
    pregel.local_bridges run to CONVERGENCE (max_span 40 ≫ diameter;
    raises if the keyed BFS didn't drain) makes span = −1 exactly the
    global bridge set, and hash-min CC over the bridge-free edge set
    gives the 2-edge-connected components (vertices incident only to
    bridges become singletons).  The robustness partition: inside a
    component, NO single link failure can disconnect."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    lb, stats = pregel.local_bridges(und, max_span=40)
    if not stats.converged and stats.iterations >= 40:
        raise RuntimeError("bridge BFS did not drain within 40 rounds")
    bridges = lb.where(F.col("span") == -1).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    rest = und.join(bridges, ["src", "dst"], "left_anti")
    comp, _ = pregel.connected_components(rest)
    verts = (
        und.select(F.col("src").alias("id"))
        .unionByName(und.select(F.col("dst").alias("id")))
        .distinct()
    )
    singles = verts.join(comp.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    return (
        comp.select("id", "comp")
        .unionByName(singles)
        .select(F.col("id").cast("long"), F.col("comp").cast("long"))
        .orderBy("id")
    )


_TWO_EDGE_CC_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst),
supd AS (SELECT DISTINCT u, w FROM (
           SELECT x AS u, y AS w FROM tri UNION ALL SELECT y, z FROM tri
           UNION ALL SELECT x, z FROM tri)),
cand AS (SELECT und.src AS bu, und.dst AS bv FROM und
         LEFT JOIN supd ON supd.u = und.src AND supd.w = und.dst
         WHERE supd.u IS NULL),
-- reachability only (no depth column): dedup on (bu, bv, id) keeps the
-- working set <= |cand| x |V| instead of re-admitting every vertex at
-- every walk parity/depth
reach(bu, bv, id) AS (
    SELECT bu, bv, bu FROM cand
    UNION
    SELECT r.bu, r.bv, e.dst
    FROM reach r JOIN e ON e.src = r.id
    WHERE NOT ((e.src = r.bu AND e.dst = r.bv)
               OR (e.src = r.bv AND e.dst = r.bu))
),
alive AS (SELECT DISTINCT bu, bv FROM reach WHERE id = bv),
realb AS (SELECT c.bu, c.bv FROM cand c
          LEFT JOIN alive a ON a.bu = c.bu AND a.bv = c.bv
          WHERE a.bu IS NULL),
rest AS (SELECT und.src, und.dst FROM und
         LEFT JOIN realb ON realb.bu = und.src AND realb.bv = und.dst
         WHERE realb.bu IS NULL),
re AS (SELECT src, dst FROM rest UNION ALL SELECT dst, src FROM rest),
verts AS (SELECT DISTINCT src AS id FROM e),
cc(id, comp) AS (
    SELECT id, id FROM verts
    UNION
    SELECT re.dst, c.comp FROM cc c JOIN re ON re.src = c.id
    WHERE c.comp < re.dst
)
SELECT CAST(id AS BIGINT) AS id, CAST(MIN(comp) AS BIGINT) AS comp
FROM cc GROUP BY id ORDER BY id
"""


def q_packing_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing efficiency CURVE: the seq_packing layout
    (concatenate-and-chunk with 1 EOD separator, two-phase distributed
    prefix sum) evaluated at context lengths 128 / 512 / 2048 / 8192 —
    per length: total sequences, documents split across a boundary
    (exact ppm), and tail padding waste.  The context-length trade-off
    table a training-data engineer reads before fixing seq_len; all
    integers."""
    from polar_spark.operators.packing import pack_sequences

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    outs = []
    for seq_len in (128, 512, 2048, 8192):
        out = pack_sequences(toks, seq_len=seq_len, buckets=32)
        agg = out.agg(
            F.lit(seq_len).cast("long").alias("seq_len"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("n_tokens") + 1).cast("long").alias("stream_tokens"),
            F.sum((F.col("first_seq") != F.col("last_seq")).cast("long"))
            .cast("long")
            .alias("n_split"),
        ).select(
            "seq_len",
            "n_docs",
            "stream_tokens",
            F.ceil(F.col("stream_tokens") / F.lit(float(seq_len)))
            .cast("long")
            .alias("n_seqs"),
            "n_split",
            F.floor(F.col("n_split") * 1_000_000 / F.col("n_docs"))
            .cast("long")
            .alias("split_ppm"),
        )
        outs.append(agg)
    cur = outs[0]
    for o in outs[1:]:
        cur = cur.unionByName(o)
    return cur.select(
        "seq_len",
        "n_docs",
        "stream_tokens",
        "n_seqs",
        "n_split",
        "split_ppm",
        (F.col("n_seqs") * F.col("seq_len") - F.col("stream_tokens"))
        .cast("long")
        .alias("tail_waste"),
    ).orderBy("seq_len")


_PACKING_CURVE_SQL = """
WITH toks AS (SELECT doc_id,
                     CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
              FROM documents),
offs AS (SELECT doc_id, n_tokens,
                SUM(n_tokens + 1) OVER (ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING)
                  - (n_tokens + 1) AS start_offset
         FROM toks),
lens(seq_len) AS (VALUES (128), (512), (2048), (8192)),
per AS (SELECT l.seq_len, o.doc_id, o.n_tokens, o.start_offset,
               CAST(FLOOR(o.start_offset / (l.seq_len * 1.0)) AS BIGINT) AS first_seq,
               CAST(FLOOR((o.start_offset + GREATEST(o.n_tokens, 1) - 1)
                          / (l.seq_len * 1.0)) AS BIGINT) AS last_seq
        FROM lens l CROSS JOIN offs o),
agg AS (SELECT seq_len,
               COUNT(*) AS n_docs,
               SUM(n_tokens + 1) AS stream_tokens,
               SUM(CASE WHEN first_seq != last_seq THEN 1 ELSE 0 END) AS n_split
        FROM per GROUP BY seq_len)
SELECT CAST(seq_len AS BIGINT) AS seq_len,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(stream_tokens AS BIGINT) AS stream_tokens,
       CAST(CEIL(stream_tokens / (seq_len * 1.0)) AS BIGINT) AS n_seqs,
       CAST(n_split AS BIGINT) AS n_split,
       CAST(FLOOR(n_split * 1000000 / n_docs) AS BIGINT) AS split_ppm,
       CAST(CAST(CEIL(stream_tokens / (seq_len * 1.0)) AS BIGINT) * seq_len
            - stream_tokens AS BIGINT) AS tail_waste
FROM agg ORDER BY seq_len
"""


ORACLES.update(
    {"two_edge_cc": _TWO_EDGE_CC_SQL, "packing_curve": _PACKING_CURVE_SQL}
)
QUERIES.update({"two_edge_cc": q_two_edge_cc, "packing_curve": q_packing_curve})


def q_dbscan_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN* (Campello et al. 2013 — the core-points-only DBSCAN that
    HDBSCAN generalizes) over the embeddings in cosine distance:
    core_dist = 4th-NN distance (rounded 7 dp, the cosine_pairs parity
    margin), core points have core_dist ≤ ε = 0.68, clusters =
    connected components of core-core pairs within ε, everything else
    noise (−1).  The density-based family member next to kmeans8
    (centroidal), snn_clusters (shared-neighbor) and embed_neardup
    (global threshold); ε measured non-degenerate at sf0.001 AND sf0.01
    (12/11 clusters, ~20% core).  At scale the pair join is the
    LSH-bucketed candidate path (similarity.py); exact here for the
    oracle."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scan = _cosine_pair_scan(emb, k=4, eps=0.68, rank_on="dist").localCheckpoint(
        eager=True
    )
    cores = (
        scan.where((F.col("rn") == 4) & (F.col("d_r") <= 0.68))
        .select("qid")
        .localCheckpoint(eager=True)
    )
    e = (
        scan.where(F.col("d_r") <= 0.68)
        .join(cores, "qid")
        .join(cores.select(F.col("qid").alias("nid")), "nid")
        .select(F.col("qid").alias("src"), F.col("nid").alias("dst"))
    )
    comp, _ = pregel.connected_components(e)
    clustered = comp.select(F.col("id").alias("vec_id"), F.col("comp").alias("cluster"))
    # core points with no core neighbor within eps are their own cluster
    lone = cores.join(
        clustered.select(F.col("vec_id").alias("qid")), "qid", "left_anti"
    ).select(F.col("qid").alias("vec_id"), F.col("qid").alias("cluster"))
    noise = emb.select("vec_id").join(
        cores.select(F.col("qid").alias("vec_id")), "vec_id", "left_anti"
    ).select("vec_id", F.lit(-1).cast("long").alias("cluster"))
    return (
        clustered.unionByName(lone)
        .unionByName(noise)
        .select(F.col("vec_id").cast("long"), F.col("cluster").cast("long"))
        .orderBy("vec_id")
    )


_DBSCAN_SQL = """
WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
pd AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
              ROUND(1 - list_cosine_similarity(a.v, b.v), 7) AS d
       FROM emb a JOIN emb b ON a.vec_id != b.vec_id),
core AS (SELECT qid, d AS core_d FROM (
           SELECT qid, d, ROW_NUMBER() OVER (PARTITION BY qid
                                             ORDER BY d, nid) AS rn
           FROM pd) t WHERE rn = 4),
cores AS (SELECT qid FROM core WHERE core_d <= 0.68),
e AS (SELECT pd.qid AS src, pd.nid AS dst FROM pd
      JOIN cores ca ON ca.qid = pd.qid
      JOIN cores cb ON cb.qid = pd.nid
      WHERE pd.d <= 0.68),
verts AS (SELECT qid AS id FROM cores),
cc(id, comp) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.dst, c.comp FROM cc c JOIN e ON e.src = c.id
    WHERE c.comp < e.dst
),
fin AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id)
SELECT CAST(emb.vec_id AS BIGINT) AS vec_id,
       CAST(COALESCE(fin.comp, -1) AS BIGINT) AS cluster
FROM emb LEFT JOIN fin ON fin.id = emb.vec_id
ORDER BY vec_id
"""


ORACLES.update({"dbscan_star": _DBSCAN_SQL})
QUERIES.update({"dbscan_star": q_dbscan_star})


def q_absorb_funnel6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain funnel: P(user reaches 'purchase' before 'error')
    from each transient event state, by 6 rounds of value iteration on
    the empirical per-user transition matrix (consecutive events ordered
    by ts, event_id) with the two absorbing states pinned at 1/0 — the
    truncated-horizon lower bound, exact for walks absorbing within 6
    steps (the hitting_time6 posture).  Transition probabilities are
    ratios of exact integer counts, so the 6-dp rounded values are
    cross-engine stable."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair = ev.select(
        F.col("event_type").alias("s"), F.lead("event_type").over(w).alias("t")
    ).where(F.col("t").isNotNull())
    cnt = pair.groupBy("s", "t").agg(F.count("*").cast("long").alias("n"))
    tot = cnt.groupBy("s").agg(F.sum("n").cast("long").alias("ns"))
    prob = cnt.join(tot, "s").select(
        "s", "t", (F.col("n").cast("double") / F.col("ns").cast("double")).alias("p")
    ).localCheckpoint(eager=True)
    states = prob.select(F.col("s").alias("st")).distinct()
    val = states.select(
        "st",
        F.when(F.col("st") == "purchase", 1.0)
        .when(F.col("st") == "error", 0.0)
        .otherwise(0.0)
        .alias("v"),
    ).localCheckpoint(eager=True)
    for _ in range(6):
        nxt = (
            prob.join(val.select(F.col("st").alias("t"), "v"), "t")
            .groupBy(F.col("s").alias("st"))
            .agg(F.sum(F.col("p") * F.col("v")).alias("v"))
        )
        val = (
            states.join(nxt, "st", "left")
            .select(
                "st",
                F.when(F.col("st") == "purchase", 1.0)
                .when(F.col("st") == "error", 0.0)
                .otherwise(F.coalesce(F.col("v"), F.lit(0.0)))
                .alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return val.select(
        F.col("st").alias("state"), F.round("v", 6).alias("p_purchase_r")
    ).orderBy("state")


_ABSORB_ROUND = """,
v{K} AS MATERIALIZED (
  SELECT states.st,
         CASE WHEN states.st = 'purchase' THEN 1.0
              WHEN states.st = 'error' THEN 0.0
              ELSE COALESCE(s.v, 0.0) END AS v
  FROM states
  LEFT JOIN (SELECT prob.s AS st, SUM(prob.p * p.v) AS v
             FROM prob JOIN v{KM1} p ON p.st = prob.t
             GROUP BY prob.s) s ON s.st = states.st)"""


def _absorb_sql(n_iter: int = 6) -> str:
    rounds = "".join(_ABSORB_ROUND.format(K=k, KM1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH pair AS (SELECT event_type AS s,
                     LEAD(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS t
              FROM events),
cnt AS (SELECT s, t, COUNT(*) AS n FROM pair WHERE t IS NOT NULL GROUP BY s, t),
tot AS (SELECT s, SUM(n) AS ns FROM cnt GROUP BY s),
prob AS MATERIALIZED (SELECT cnt.s, cnt.t,
               CAST(cnt.n AS DOUBLE) / CAST(tot.ns AS DOUBLE) AS p
        FROM cnt JOIN tot ON tot.s = cnt.s),
states AS (SELECT DISTINCT s AS st FROM prob),
v0 AS (SELECT st, CASE WHEN st = 'purchase' THEN 1.0
                       WHEN st = 'error' THEN 0.0 ELSE 0.0 END AS v
       FROM states)
{rounds}
SELECT st AS state, ROUND(v, 6) AS p_purchase_r
FROM v{n_iter} ORDER BY state
"""


def q_event_trigrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining (lite): the 10 most frequent
    3-step event-type sequences over per-user timelines (consecutive
    triples by ts/event_id) — the raw material of funnel discovery;
    exact integer counts, (count desc, t1, t2, t3) tie-break."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), "t1", "t2", "t3")
            ),
        )
        .where(F.col("rnk") <= 10)
        .select("t1", "t2", "t3", "n", F.col("rnk").cast("int"))
        .orderBy("rnk")
    )


_EVENT_TRIGRAMS_SQL = """
WITH tri AS (SELECT event_type AS t1,
                    LEAD(event_type, 1) OVER w AS t2,
                    LEAD(event_type, 2) OVER w AS t3
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
cnt AS (SELECT t1, t2, t3, COUNT(*) AS n FROM tri
        WHERE t3 IS NOT NULL GROUP BY t1, t2, t3),
ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, t1, t2, t3) AS rnk
           FROM cnt)
SELECT t1, t2, t3, CAST(n AS BIGINT) AS n, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 10 ORDER BY rnk
"""


ORACLES.update(
    {"absorb_funnel6": _absorb_sql(6), "event_trigrams_top": _EVENT_TRIGRAMS_SQL}
)
QUERIES.update(
    {"absorb_funnel6": q_absorb_funnel6, "event_trigrams_top": q_event_trigrams_top}
)


def q_subgraph_centrality4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated subgraph centrality (Estrada-Rodríguez-Velázquez 2005)
    to walk length 4, INTEGER-exact: 4!·SC₄(v) = 24 + 12·d_v + 8·t_v +
    w4_v where the closed-4-walk count w4_v = Σ_{u≠v} codeg(v,u)² +
    d_v² ((A⁴)_vv, verified against dense matrix powers in pytest) and
    (A³)_vv = 2t_v — closed-walk centrality without any eigendecomp,
    from degree/triangle/codegree aggregates on the bounded co-order
    graph."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    sym = _sym(und)
    deg = sym.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    tri, _total = pregel.triangle_count(und)
    wl = sym.select(F.col("dst").alias("w"), F.col("src").alias("v"))
    wr = sym.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    codeg2 = (
        wl.join(wr, "w")
        .where(F.col("v") != F.col("u"))
        .groupBy("v", "u")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("v")
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("c2"))
    )
    return (
        deg.select(F.col("src").alias("id"), "d")
        .join(tri, "id", "left")
        .join(codeg2.withColumnRenamed("v", "id"), "id", "left")
        .select(
            F.col("id").cast("long"),
            (
                F.lit(24)
                + F.lit(12) * F.col("d")
                + F.lit(8) * F.coalesce(F.col("triangles"), F.lit(0))
                + F.coalesce(F.col("c2"), F.lit(0))
                + F.col("d") * F.col("d")
            )
            .cast("long")
            .alias("sc24"),
        )
        .orderBy("id")
    )


_SUBGRAPH_CENT_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 400),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM und a JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst),
corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri),
tcnt AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id),
codeg AS (SELECT a.src AS v, b.src AS u, COUNT(*) AS c
          FROM e a JOIN e b ON a.dst = b.dst AND a.src != b.src
          GROUP BY a.src, b.src),
c2 AS (SELECT v AS id, SUM(c * c) AS c2 FROM codeg GROUP BY v)
SELECT CAST(deg.id AS BIGINT) AS id,
       CAST(24 + 12 * deg.d + 8 * COALESCE(tcnt.t, 0)
            + COALESCE(c2.c2, 0) + deg.d * deg.d AS BIGINT) AS sc24
FROM deg LEFT JOIN tcnt ON tcnt.id = deg.id
LEFT JOIN c2 ON c2.id = deg.id
ORDER BY deg.id
"""


def q_graph_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-component center/periphery structure of the small-cap
    co-order graph (parts < 150): eccentricity of EVERY vertex from the
    all-sources keyed BFS (exact, unlike the eccentricity4 landmark
    lower bounds), per-component radius and diameter, and the center
    flag (ecc == radius).  The all-pairs pass is the bounded-audit
    complement of pseudo_diameter's two-sweep bound on the full
    graph."""
    und = coorder_edges(spark, sf_dir, part_cap=150)
    sym = _sym(und)
    verts = sorted(r[0] for r in sym.select("src").distinct().collect())
    dist, _ = pregel.bfs_per_source(sym, verts, max_depth=30)
    ecc = dist.groupBy(F.col("source").alias("id")).agg(
        F.max("dist").cast("long").alias("ecc")
    )
    comp, _ = pregel.connected_components(und)
    j = ecc.join(comp, "id")
    wc = Window.partitionBy("comp")
    return (
        j.select(
            F.col("id").cast("long"),
            F.col("comp").cast("long"),
            "ecc",
            F.min("ecc").over(wc).cast("long").alias("radius"),
            F.max("ecc").over(wc).cast("long").alias("diameter"),
            (F.col("ecc") == F.min("ecc").over(wc)).cast("long").alias("is_center"),
        )
        .orderBy("id")
    )


_GRAPH_CENTER_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 150),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
verts AS (SELECT DISTINCT src AS v FROM e),
reach(s, id, d) AS (
    SELECT v, v, 0 FROM verts
    UNION
    SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
    WHERE r.d < 30
),
dmin AS (SELECT s, id, MIN(d) AS d FROM reach GROUP BY s, id),
ecc AS (SELECT s AS id, MAX(d) AS ecc FROM dmin GROUP BY s),
cc(id, comp) AS (
    SELECT v, v FROM verts
    UNION
    SELECT e.dst, c.comp FROM cc c JOIN e ON e.src = c.id
    WHERE c.comp < e.dst
),
comp AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id),
j AS (SELECT ecc.id, comp.comp, ecc.ecc FROM ecc JOIN comp ON comp.id = ecc.id)
SELECT CAST(id AS BIGINT) AS id, CAST(comp AS BIGINT) AS comp,
       CAST(ecc AS BIGINT) AS ecc,
       CAST(MIN(ecc) OVER (PARTITION BY comp) AS BIGINT) AS radius,
       CAST(MAX(ecc) OVER (PARTITION BY comp) AS BIGINT) AS diameter,
       CAST(CASE WHEN ecc = MIN(ecc) OVER (PARTITION BY comp)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_center
FROM j ORDER BY id
"""


ORACLES.update(
    {
        "subgraph_centrality4": _SUBGRAPH_CENT_SQL,
        "graph_center": _GRAPH_CENTER_SQL,
    }
)
QUERIES.update(
    {
        "subgraph_centrality4": q_subgraph_centrality4,
        "graph_center": q_graph_center,
    }
)


def q_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic of the cosine 5-NN graph (Radovanović et al.
    JMLR'10): the IN-degree histogram of the directed kNN relation —
    in high dimensions a few 'hub' vectors appear in everyone's
    neighbor list (in-degree ≫ k) while antihubs appear in none
    (in-degree 0), which silently skews ANN recall and kNN
    classification.  One vectorized pair scan (the snn_clusters
    ranking: round(cos,7) desc, id) then one integer aggregation;
    vectors appearing in no list enter the 0 bucket."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    knn = _cosine_pair_scan(emb, k=5, eps=None, rank_on="cos").select("qid", "nid")
    indeg = knn.groupBy(F.col("nid").alias("vec_id")).agg(
        F.count("*").cast("long").alias("indeg")
    )
    full = emb.select("vec_id").join(indeg, "vec_id", "left").select(
        F.coalesce(F.col("indeg"), F.lit(0)).cast("long").alias("indeg")
    )
    return (
        full.groupBy("indeg")
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .orderBy("indeg")
    )


_KNN_HUBNESS_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
scored AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                  ROUND(list_cosine_similarity(a.v, b.v), 7) AS cos_r
           FROM emb a JOIN emb b ON a.vec_id != b.vec_id),
knn AS (SELECT qid, nid FROM (
          SELECT qid, nid,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos_r DESC, nid) AS rn
          FROM scored) t WHERE rn <= 5),
indeg AS (SELECT nid AS vec_id, COUNT(*) AS indeg FROM knn GROUP BY nid),
filled AS (SELECT emb.vec_id, COALESCE(indeg.indeg, 0) AS indeg
           FROM emb LEFT JOIN indeg ON indeg.vec_id = emb.vec_id)
SELECT CAST(indeg AS BIGINT) AS indeg, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM filled GROUP BY indeg ORDER BY indeg
"""


def q_embed_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy report WITHOUT a pair join: for
    unit-normalized vectors the mean pairwise cosine equals
    (‖Σv̂‖² − n) / (n(n−1)) — one per-dimension sum aggregation instead
    of n² pairs (the identity Σ_{i≠j} v̂ᵢ·v̂ⱼ = ‖Σv̂‖² − Σ‖v̂‖²).  High
    mean cosine = anisotropic cone (the common 'all embeddings point
    the same way' pathology that deflates cosine contrast); also
    reports the mean raw norm.  The scale shape: nothing quadratic
    anywhere."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    base = emb.select("v", nrm.alias("norm"))
    n = base.count()
    comps = base.select(
        F.posexplode(F.transform("v", lambda x: x / F.col("norm"))).alias("j", "x"),
        "norm",
    )
    dims = comps.groupBy("j").agg(F.sum("x").alias("s"))
    ssum = dims.agg(F.sum(F.col("s") * F.col("s")).alias("s2")).collect()[0]["s2"]
    mean_norm = base.agg(F.avg("norm").alias("m")).collect()[0]["m"]
    avg_cos = (float(ssum) - n) / (n * (n - 1))
    return spark.createDataFrame(
        [(int(n), round(float(mean_norm), 6), round(avg_cos, 6))],
        "n long, mean_norm_r double, avg_cos_r double",
    )


_EMBED_ISOTROPY_SQL = """
WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
base AS (SELECT v, SQRT(list_dot_product(v, v)) AS norm FROM emb),
n AS (SELECT COUNT(*) AS n FROM base),
comps AS (SELECT i - 1 AS j, v[i] / norm AS x
          FROM base, unnest(range(1, len(v) + 1)) u(i)),
dims AS (SELECT j, SUM(x) AS s FROM comps GROUP BY j),
s2 AS (SELECT SUM(s * s) AS s2 FROM dims)
SELECT CAST(n.n AS BIGINT) AS n,
       ROUND((SELECT AVG(norm) FROM base), 6) AS mean_norm_r,
       ROUND((s2.s2 - n.n) / (n.n * (n.n - 1.0)), 6) AS avg_cos_r
FROM n, s2
"""


ORACLES.update(
    {"knn_hubness": _KNN_HUBNESS_SQL, "embed_isotropy": _EMBED_ISOTROPY_SQL}
)
QUERIES.update(
    {"knn_hubness": q_knn_hubness, "embed_isotropy": q_embed_isotropy}
)


def q_interval_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (the temporal-algebra operator family
    beside asof_last_signup): each supplier's shipping-activity window
    [first_shipdate, last_shipdate], then per nation the number of
    supplier pairs whose windows overlap (a.start ≤ b.end ∧ b.start ≤
    a.end, a < b) and the pair total — concurrent-activity density.
    The pair join is keyed on the REGION (same-nation pairs are empty
    at sf0.001 — 10 suppliers across 10 nations, measured; bounded
    per-group fan-out either way, the assoc_rules posture); date
    comparisons are day-exact integers."""
    li = load_table(spark, "lineitem", sf_dir).select("l_suppkey", "l_shipdate")
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nat = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_regionkey")
    reg = load_table(spark, "region", sf_dir).select("r_regionkey", "r_name")
    win = (
        li.groupBy("l_suppkey")
        .agg(
            F.min("l_shipdate").alias("lo"),
            F.max("l_shipdate").alias("hi"),
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", F.col("l_suppkey").alias("sk"), "lo", "hi")
    )
    a, b = win.alias("a"), win.alias("b")
    pairs = a.join(
        b,
        (F.col("a.r_name") == F.col("b.r_name")) & (F.col("a.sk") < F.col("b.sk")),
    )
    return (
        pairs.groupBy(F.col("a.r_name").alias("r_name"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(
                (
                    (F.col("a.lo") <= F.col("b.hi")) & (F.col("b.lo") <= F.col("a.hi"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_overlap"),
        )
        .orderBy("r_name")
    )


_INTERVAL_OVERLAPS_SQL = """
WITH win AS (SELECT r_name, l_suppkey AS sk,
                    MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi
             FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name, l_suppkey)
SELECT a.r_name,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN a.lo <= b.hi AND b.lo <= a.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap
FROM win a JOIN win b ON a.r_name = b.r_name AND a.sk < b.sk
GROUP BY a.r_name ORDER BY a.r_name
"""


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit in one pass per table — the validation suite
    an ingestion engine runs before committing a snapshot: row counts,
    primary-key duplicate counts, and referential-integrity violation
    counts across the star joins (lineitem→orders/part/supplier,
    orders→customer, customer/supplier→nation, nation→region).  Every
    check one integer; FK checks are left-anti joins (broadcast where
    the dimension is small)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir)

    def dup(df, cols):
        return (
            df.groupBy(*cols).count().where(F.col("count") > 1).count()
        )

    def fk(child, ckey, parent, pkey):
        return (
            child.select(F.col(ckey).alias("k"))
            .where(F.col("k").isNotNull())
            .join(parent.select(F.col(pkey).alias("k")).distinct(), "k", "left_anti")
            .count()
        )

    checks = [
        ("rows_lineitem", li.count()),
        ("rows_orders", orders.count()),
        ("dup_orders_pk", dup(orders, ["o_orderkey"])),
        ("dup_lineitem_pk", dup(li, ["l_orderkey", "l_linenumber"])),
        ("fk_lineitem_orders", fk(li, "l_orderkey", orders, "o_orderkey")),
        ("fk_lineitem_part", fk(li, "l_partkey", part, "p_partkey")),
        ("fk_lineitem_supplier", fk(li, "l_suppkey", sup, "s_suppkey")),
        ("fk_orders_customer", fk(orders, "o_custkey", cust, "c_custkey")),
        ("fk_customer_nation", fk(cust, "c_nationkey", nat, "n_nationkey")),
        ("fk_supplier_nation", fk(sup, "s_nationkey", nat, "n_nationkey")),
        ("fk_nation_region", fk(nat, "n_regionkey", reg, "r_regionkey")),
        (
            "neg_quantity",
            li.where(F.col("l_quantity") <= 0).count(),
        ),
        (
            "ship_before_order",
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .where(F.col("l_shipdate") < F.col("o_orderdate"))
            .count(),
        ),
    ]
    return spark.createDataFrame(
        [(name, int(v)) for name, v in checks], "check_name string, n_bad long"
    ).orderBy("check_name")


_DQ_REPORT_SQL = """
SELECT * FROM (
  SELECT 'rows_lineitem' AS check_name, CAST(COUNT(*) AS BIGINT) AS n_bad FROM lineitem
  UNION ALL
  SELECT 'rows_orders', CAST(COUNT(*) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'dup_orders_pk', CAST(COUNT(*) AS BIGINT) FROM (
    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'dup_lineitem_pk', CAST(COUNT(*) AS BIGINT) FROM (
    SELECT l_orderkey, l_linenumber FROM lineitem
    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'fk_lineitem_orders', CAST(COUNT(*) AS BIGINT) FROM lineitem
  WHERE l_orderkey IS NOT NULL
    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  UNION ALL
  SELECT 'fk_lineitem_part', CAST(COUNT(*) AS BIGINT) FROM lineitem
  WHERE l_partkey IS NOT NULL
    AND l_partkey NOT IN (SELECT p_partkey FROM part)
  UNION ALL
  SELECT 'fk_lineitem_supplier', CAST(COUNT(*) AS BIGINT) FROM lineitem
  WHERE l_suppkey IS NOT NULL
    AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
  UNION ALL
  SELECT 'fk_orders_customer', CAST(COUNT(*) AS BIGINT) FROM orders
  WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
  UNION ALL
  SELECT 'fk_customer_nation', CAST(COUNT(*) AS BIGINT) FROM customer
  WHERE c_nationkey IS NOT NULL
    AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
  UNION ALL
  SELECT 'fk_supplier_nation', CAST(COUNT(*) AS BIGINT) FROM supplier
  WHERE s_nationkey IS NOT NULL
    AND s_nationkey NOT IN (SELECT n_nationkey FROM nation)
  UNION ALL
  SELECT 'fk_nation_region', CAST(COUNT(*) AS BIGINT) FROM nation
  WHERE n_regionkey IS NOT NULL
    AND n_regionkey NOT IN (SELECT r_regionkey FROM region)
  UNION ALL
  SELECT 'neg_quantity', CAST(COUNT(*) AS BIGINT) FROM lineitem
  WHERE l_quantity <= 0
  UNION ALL
  SELECT 'ship_before_order', CAST(COUNT(*) AS BIGINT)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate < o_orderdate
) ORDER BY check_name
"""


ORACLES.update(
    {"interval_overlaps": _INTERVAL_OVERLAPS_SQL, "dq_report": _DQ_REPORT_SQL}
)
QUERIES.update(
    {"interval_overlaps": q_interval_overlaps, "dq_report": q_dq_report}
)
QUERIES.update(
    {
        "truss_components": q_truss_components,
        "struct_roles": q_struct_roles,
        "ols_price_qty": q_ols_price_qty,
        "chi2_terms": q_chi2_terms,
        "rank_corr": q_rank_corr,
        "steiner_tree4": q_steiner_tree4,
        "pca_power3": q_pca_power3,
        "odd_walk_len": q_odd_walk_len,
        "cusum_hourly": q_cusum_hourly,
        "rake_top10": q_rake_top10,
        "snn_clusters": q_snn_clusters,
        "molloy_reed": q_molloy_reed,
        "sbm_likelihood": q_sbm_likelihood,
        "err_eval": q_err_eval,
    }
)


# ---------------------------------------------------------------------------
# round-5 session-15 additions: Kneser-Ney LM, Markov entropy rate,
# Kaplan-Meier survival, item-item CF, clique percolation, articulation
# points, JL projection audit, integer-exact logistic regression.


def q_kn_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney bigram
    LM (Kneser & Ney ICASSP'95; Chen-Goodman 1998 eq. 4.25) — the
    smoothing that actually ships in n-gram LMs, vs `bigram_ppl`'s
    add-one: p(w₂|w₁) = max(c−D,0)/c(w₁·) + D·N₁₊(w₁·)/c(w₁·) ·
    p_cont(w₂), with the continuation probability p_cont(w₂) =
    N₁₊(·w₂)/|bigram types| (how many CONTEXTS a word follows, not how
    often — the "San Francisco" correction).  D = 0.75 is exact in
    binary, every count is an exact integer, and the probability is ONE
    identically-ordered double expression both engines; per-bigram log
    contributions are floored to 1e6-scaled BIGINTs BEFORE summation
    (order-independent), bm25 discipline.  Skew discipline: (doc,
    bigram) collapses before the Zipf-skewed corpus-count joins; the
    corpus stats are two small aggregates any 100-TB run broadcasts."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("i", "w"),
    )
    big = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.i") == F.col("a.i") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.w").alias("w1"),
            F.col("b.w").alias("w2"),
        )
    )
    dg = big.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n"))
    cb = dg.groupBy("w1", "w2").agg(F.sum("n").alias("c"))
    cu = cb.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count("*").alias("n1f")
    )
    cont = cb.groupBy("w2").agg(F.count("*").alias("n1b"))
    nt = cb.count()  # distinct bigram types (1-row scalar)
    p = (
        F.greatest(F.col("c").cast("double") - F.lit(0.75), F.lit(0.0))
        + F.lit(0.75)
        * F.col("n1f").cast("double")
        * (F.col("n1b").cast("double") / F.lit(float(nt)))
    ) / F.col("cw1").cast("double")
    contrib = F.floor(F.lit(1e6) * F.log(p))
    per_doc = (
        dg.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .join(cont, "w2")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * contrib).alias("ll_scaled"),
            F.sum("n").alias("n_bigrams"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bigrams").cast("long"),
        F.col("ll_scaled").cast("long"),
        F.round(
            F.exp(
                -F.col("ll_scaled").cast("double")
                / (F.lit(1e6) * F.col("n_bigrams").cast("double"))
            ),
            4,
        ).alias("ppl_r"),
    ).orderBy("doc_id")


_KN_BIGRAM_PPL_SQL = r"""
WITH toks AS (SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(TRIM(text), '\s+'), 1) AS i,
                     UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
              FROM documents),
big AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
dg AS (SELECT doc_id, w1, w2, COUNT(*) AS n FROM big GROUP BY 1, 2, 3),
cb AS (SELECT w1, w2, SUM(n) AS c FROM dg GROUP BY w1, w2),
cu AS (SELECT w1, SUM(c) AS cw1, COUNT(*) AS n1f FROM cb GROUP BY w1),
cont AS (SELECT w2, COUNT(*) AS n1b FROM cb GROUP BY w2),
nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM cb),
per_doc AS (
  SELECT dg.doc_id,
         SUM(dg.n * CAST(FLOOR(1e6 * LN(
           (GREATEST(CAST(cb.c AS DOUBLE) - 0.75, 0.0)
            + 0.75 * CAST(cu.n1f AS DOUBLE) * (CAST(cont.n1b AS DOUBLE) / nt.v))
           / CAST(cu.cw1 AS DOUBLE)
         )) AS BIGINT)) AS ll_scaled,
         SUM(dg.n) AS n_bigrams
  FROM dg JOIN cb USING (w1, w2) JOIN cu USING (w1) JOIN cont USING (w2)
       CROSS JOIN nt
  GROUP BY dg.doc_id)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(ll_scaled AS BIGINT) AS ll_scaled,
       ROUND(EXP(-CAST(ll_scaled AS DOUBLE) / (1e6 * CAST(n_bigrams AS DOUBLE))), 4)
         AS ppl_r
FROM per_doc ORDER BY doc_id
"""


def q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy of the first-order event Markov
    chain (the uncertainty left after seeing the previous event — the
    information-theoretic companion to `event_transitions`): H(x) =
    ln n_x − (Σ_y n_xy·ln n_xy)/n_x from exact integer counts, with
    each n·ln n term floored to a 1e6-scaled BIGINT before the sum so
    the per-state statistic is order-independent.  The same
    co-partitioned lag window as event_transitions (25-key aggregate —
    trivially broadcastable at any scale); states ordered for the
    driver compare."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).where(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    nlogn = F.floor(
        F.lit(1e6)
        * (F.col("n").cast("double") * F.log(F.col("n").cast("double")))
    )
    per_state = counts.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_x"),
        F.count("*").cast("long").alias("n_succ"),
        F.sum(nlogn).cast("long").alias("s_scaled"),
    )
    h = F.log(F.col("n_x").cast("double")) - F.col("s_scaled").cast(
        "double"
    ) / (F.lit(1e6) * F.col("n_x").cast("double"))
    return per_state.select(
        "from_type", "n_x", "n_succ", "s_scaled", F.round(h, 6).alias("h_r")
    ).orderBy("from_type")


_TRANSITION_ENTROPY_SQL = """
WITH seq AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
per_state AS (
  SELECT from_type, SUM(n) AS n_x, COUNT(*) AS n_succ,
         SUM(CAST(FLOOR(1e6 * (CAST(n AS DOUBLE) * LN(CAST(n AS DOUBLE))))
             AS BIGINT)) AS s_scaled
  FROM counts GROUP BY from_type)
SELECT from_type, CAST(n_x AS BIGINT) AS n_x, CAST(n_succ AS BIGINT) AS n_succ,
       CAST(s_scaled AS BIGINT) AS s_scaled,
       ROUND(LN(CAST(n_x AS DOUBLE))
             - CAST(s_scaled AS DOUBLE) / (1e6 * CAST(n_x AS DOUBLE)), 6) AS h_r
FROM per_state ORDER BY from_type
"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve of the time-to-next-
    order (the churn model behind every retention dashboard), with
    right-censoring: each order contributes the day-gap to that
    customer's next order (event) or to the corpus's last order date
    (censored — the customer may order again after the window).  At
    each distinct event time t: n_risk = subjects with time ≥ t
    (censored-at-t still at risk — the standard events-before-censoring
    tie convention), d = events at t, S(t) = Π(1 − d/n).  The product
    is computed as exp of a CUMULATIVE INTEGER sum of floor(1e6·ln((n−d)/n))
    (order-independent, the bm25 discipline); the Nelson-Aalen
    cumulative hazard rides the exact integer d·10⁹ DIV n.  The heavy
    lift (gaps) is one customer-partitioned lag window; the survival
    windows run on the PRE-AGGREGATED distinct-time table (bounded by
    calendar days, not data volume — the hourly_anomaly posture)."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    staged = o.select(
        "o_orderdate", nxt.alias("nxt")
    ).crossJoin(F.broadcast(o.agg(F.max("o_orderdate").alias("maxd"))))
    sub = staged.select(
        F.when(
            F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate")
        )
        .otherwise(F.datediff("maxd", "o_orderdate"))
        .alias("t"),
        F.col("nxt").isNotNull().cast("long").alias("ev"),
    )
    agg = sub.groupBy("t").agg(
        F.count("*").cast("long").alias("r"), F.sum("ev").cast("long").alias("d")
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risked = agg.select(
        "t",
        "d",
        (
            F.sum("r").over(w_all) - F.coalesce(F.sum("r").over(w_prev), F.lit(0))
        ).cast("long").alias("n_risk"),
    ).where(F.col("d") >= 1)
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.lit(1e6)
            * F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
        ),
    ).otherwise(F.lit(0))
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    cum = risked.select(
        "t",
        "n_risk",
        "d",
        F.sum(term).over(w_cum).cast("long").alias("ln_s_scaled"),
        F.sum(F.expr("d * 1000000000 DIV n_risk")).over(w_cum)
        .cast("long")
        .alias("na9"),
        F.max((F.col("d") >= F.col("n_risk")).cast("int"))
        .over(w_cum)
        .alias("dropped"),
    )
    return cum.select(
        F.col("t").cast("long").alias("t_days"),
        "n_risk",
        "d",
        "na9",
        F.when(F.col("dropped") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("ln_s_scaled").cast("double") / F.lit(1e6)), 6)
        )
        .alias("s_r"),
    ).orderBy("t_days")


_KAPLAN_MEIER_SQL = """
WITH o AS (
  SELECT o_orderdate,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders),
mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
sub AS (
  SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', o_orderdate, nxt)
              ELSE date_diff('day', o_orderdate, mx.maxd) END AS t,
         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM o CROSS JOIN mx),
agg AS (SELECT t, COUNT(*) AS r, SUM(ev) AS d FROM sub GROUP BY t),
risked AS (
  SELECT t, d,
         SUM(r) OVER () - COALESCE(SUM(r) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM agg),
ev AS (SELECT t, d, n_risk FROM risked WHERE d >= 1),
cum AS (
  SELECT t, n_risk, d,
         SUM(CASE WHEN d < n_risk THEN CAST(FLOOR(1e6 * LN(
               CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
             AS BIGINT) ELSE 0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS ln_s_scaled,
         SUM(d * 1000000000 // n_risk)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS na9,
         MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dropped
  FROM ev)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d, CAST(na9 AS BIGINT) AS na9,
       CASE WHEN dropped = 1 THEN 0.0
            ELSE ROUND(EXP(CAST(ln_s_scaled AS DOUBLE) / 1e6), 6) END AS s_r
FROM cum ORDER BY t_days
"""


def q_item_cf10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al. WWW'01): for
    each part, the top-10 most-similar parts by co-purchase cosine
    co(a,b)/√(n_a·n_b) over order baskets — the classic "customers who
    bought this also bought" recommender primitive.  The pair join is
    keyed on the order (cost Σ basket², baskets ≤ ~10 lines — the
    assoc_rules shape), part totals join back on the pair table; one
    shuffle for the pair aggregate.  Ranked on the 6-dp ROUNDED cosine
    with partner-id tie-break (the adamic_adar ordering lesson) so
    cross-engine float noise cannot reorder."""
    li = load_table(spark, "lineitem", sf_dir)
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    na = baskets.groupBy("p").agg(F.count("*").cast("long").alias("n"))
    a, b = baskets.alias("a"), baskets.alias("b")
    co = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").cast("long").alias("co"))
    )
    sym = co.select("pa", "pb", "co").unionByName(
        co.select(
            F.col("pb").alias("pa"), F.col("pa").alias("pb"), F.col("co")
        )
    )
    scored = (
        sym.join(na.select(F.col("p").alias("pa"), F.col("n").alias("nna")), "pa")
        .join(na.select(F.col("p").alias("pb"), F.col("n").alias("nnb")), "pb")
        .select(
            "pa",
            "pb",
            "co",
            F.round(
                F.col("co").cast("double")
                / F.sqrt(F.col("nna").cast("double") * F.col("nnb").cast("double")),
                6,
            ).alias("cos_r"),
        )
    )
    w = Window.partitionBy("pa").orderBy(F.desc("cos_r"), F.asc("pb"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select(
            F.col("pa").cast("long").alias("part"),
            F.col("pb").cast("long").alias("nbr"),
            "co",
            "cos_r",
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("part", "rn")
    )


_ITEM_CF10_SQL = """
WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
na AS (SELECT p, COUNT(*) AS n FROM baskets GROUP BY p),
co AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS co
       FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
       GROUP BY 1, 2),
sym AS (SELECT pa, pb, co FROM co
        UNION ALL SELECT pb AS pa, pa AS pb, co FROM co),
scored AS (
  SELECT pa, pb, co,
         ROUND(CAST(co AS DOUBLE) /
               SQRT(CAST(x.n AS DOUBLE) * CAST(y.n AS DOUBLE)), 6) AS cos_r
  FROM sym JOIN na x ON x.p = sym.pa JOIN na y ON y.p = sym.pb),
ranked AS (
  SELECT pa, pb, co, cos_r,
         ROW_NUMBER() OVER (PARTITION BY pa ORDER BY cos_r DESC, pb) AS rn
  FROM scored)
SELECT CAST(pa AS BIGINT) AS part, CAST(pb AS BIGINT) AS nbr,
       CAST(co AS BIGINT) AS co, cos_r, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 10 ORDER BY part, rn
"""


ORACLES.update(
    {
        "kn_bigram_ppl": _KN_BIGRAM_PPL_SQL,
        "transition_entropy": _TRANSITION_ENTROPY_SQL,
        "kaplan_meier": _KAPLAN_MEIER_SQL,
        "item_cf10": _ITEM_CF10_SQL,
    }
)
QUERIES.update(
    {
        "kn_bigram_ppl": q_kn_bigram_ppl,
        "transition_entropy": q_transition_entropy,
        "kaplan_meier": q_kaplan_meier,
        "item_cf10": q_item_cf10,
    }
)


_W2_BACKBONE_SQL = """
op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
wund AS MATERIALIZED (SELECT a.p AS src, b.p AS dst, COUNT(*) AS w
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
sub AS MATERIALIZED (SELECT src, dst FROM wund WHERE w >= 2)
"""


def _w2_backbone(
    spark: SparkSession, sf_dir: str, part_cap: int | None = None
) -> DataFrame:
    """Weight-≥2 co-order backbone: part pairs co-ordered at least
    twice (the `percolation_profile` threshold-2 graph) — sparse with
    real block structure at every sf, unlike the raw co-order graph
    whose density inverts between sf0.001 (near-clique neighborhoods)
    and sf0.01."""
    li = load_table(spark, "lineitem", sf_dir)
    if part_cap is not None:
        # scan-level pushdown (the coorder_edges part_cap discipline):
        # capping l_partkey before grouping is equivalent to filtering
        # both pair endpoints afterwards
        li = li.where(F.col("l_partkey") < F.lit(part_cap))
    groups = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.collect_set("p").alias("ps"))
        .where(F.size("ps") >= 2)
    )
    return (
        _pair_expand(groups)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 2)
        .select("src", "dst")
    )


def q_kclique_comm3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-clique percolation communities (Palla et al., Nature 2005 —
    CPM): communities are connected components of the TRIANGLE
    adjacency graph (two triangles adjacent iff they share an edge), a
    vertex belonging to every community whose triangles contain it —
    the OVERLAPPING community model none of the partition methods
    (LPA/Louvain/SCAN) can express.  Triangles come from the canonical
    ordered 3-join on the weight-≥2 co-order backbone; each triangle
    becomes one vertex keyed a·2⁴² + b·2²¹ + c (exact for ids < 2²¹ —
    at larger id spaces swap in a dense surrogate from `compact_ids`),
    adjacency is the self-join of the 3-edge incidence table keyed by
    the shared edge (cost Σ_e t_e² — the backbone keeps per-edge
    triangle counts bounded; at corpus scale run CPM after a k-truss
    or weight screen exactly as here), and hash-min CC labels each
    community by its minimum triangle key.  Output: (comm, vertex)
    membership pairs — vertices in several communities appear once per
    community."""
    sub = _w2_backbone(spark, sf_dir)
    return pregel.clique_percolation3(sub).orderBy("comm", "vertex")


_KCLIQUE_COMM3_SQL = f"""
WITH RECURSIVE {_W2_BACKBONE_SQL.strip()},
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c,
         e1.src * 4398046511104 + e1.dst * 2097152 + e2.dst AS tid
  FROM sub e1 JOIN sub e2 ON e2.src = e1.src AND e2.dst > e1.dst
       JOIN sub e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
em AS MATERIALIZED (
  SELECT tid, a * 2097152 + b AS ek FROM tri
  UNION ALL SELECT tid, a * 2097152 + c FROM tri
  UNION ALL SELECT tid, b * 2097152 + c FROM tri),
te AS MATERIALIZED (
  SELECT x.tid AS src, y.tid AS dst
  FROM em x JOIN em y ON x.ek = y.ek AND x.tid < y.tid),
e2 AS MATERIALIZED (SELECT src, dst FROM te UNION ALL SELECT dst, src FROM te),
v AS (SELECT DISTINCT tid AS id FROM tri),
r(id, comp) AS (
  SELECT id, id FROM v
  UNION
  SELECT e.dst, r.comp FROM r JOIN e2 e ON e.src = r.id
  WHERE r.comp < e.dst),
c AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM r GROUP BY id)
SELECT DISTINCT CAST(c.comp AS BIGINT) AS comm, CAST(u.vertex AS BIGINT) AS vertex
FROM tri JOIN c ON c.id = tri.tid, UNNEST([tri.a, tri.b, tri.c]) AS u(vertex)
ORDER BY comm, vertex
"""


def q_articulation_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Articulation points of the weight-≥2 co-order backbone
    (pregel.articulation_points): the single-PART failure analysis
    beside `two_edge_cc`'s single-link one — per degree-≥2 vertex, the
    count of its neighbors reachable once the vertex itself is removed,
    and the cut-vertex flag.  One simultaneous keyed BFS run to
    convergence (raises rather than reporting from a truncated
    frontier); the oracle replays the reachability recursion with NO
    depth column (the two_edge_cc blow-up lesson)."""
    sub = _w2_backbone(spark, sf_dir)
    out, stats = pregel.articulation_points(sub, max_rounds=40)
    if not stats.converged:
        raise RuntimeError("articulation BFS did not drain")
    return out.orderBy("id")


_ARTICULATION_SQL = f"""
WITH RECURSIVE {_W2_BACKBONE_SQL.strip()},
e AS MATERIALIZED (SELECT src, dst FROM sub UNION ALL SELECT dst, src FROM sub),
deg AS (SELECT src AS v, COUNT(*) AS n_nbrs, MIN(dst) AS x0 FROM e GROUP BY src),
cand AS MATERIALIZED (SELECT v, n_nbrs, x0 FROM deg WHERE n_nbrs >= 2),
-- reachability only: state (v, id), the excluded vertex in the key;
-- no depth column (re-admission blow-up lesson from two_edge_cc)
reach(v, id) AS (
  SELECT v, x0 FROM cand
  UNION
  SELECT r.v, e.dst FROM reach r JOIN e ON e.src = r.id WHERE e.dst <> r.v),
rc AS (SELECT c.v, COUNT(*) AS reached
       FROM cand c JOIN e ON e.src = c.v
            JOIN reach r ON r.v = c.v AND r.id = e.dst
       GROUP BY c.v)
SELECT CAST(c.v AS BIGINT) AS id, CAST(c.n_nbrs AS BIGINT) AS n_nbrs,
       CAST(COALESCE(rc.reached, 0) AS BIGINT) AS reached_nbrs,
       COALESCE(rc.reached, 0) < c.n_nbrs AS is_articulation
FROM cand c LEFT JOIN rc ON rc.v = c.v ORDER BY id
"""


ORACLES.update(
    {
        "kclique_comm3": _KCLIQUE_COMM3_SQL,
        "articulation_pts": _ARTICULATION_SQL,
    }
)
QUERIES.update(
    {
        "kclique_comm3": q_kclique_comm3,
        "articulation_pts": q_articulation_pts,
    }
)


def _jl_signs(m: int = 16, d: int = 64, seed: int = 11) -> list[list[float]]:
    """Deterministic ±1 JL projection matrix from the 63-bit LCG
    (`affine_params` family) — plain literals both engines inline."""
    s = seed
    mat = []
    for _ in range(m):
        row = []
        for _ in range(d):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(1.0 if (s >> 32) & 1 else -1.0)
        mat.append(row)
    return mat


def q_jl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch-retrieval audit: exact cosine top-3
    under a 16-dim SIGNED RANDOM PROJECTION (Achlioptas 2003 ±1
    variant, deterministic matrix) vs top-3 under the full 64-dim
    embedding, per-query overlap — the dimensionality-reduction
    companion to `matryoshka_recall` (prefix truncation assumes
    importance-ordered dims; JL works for ANY embedding).  Every dot
    product is an index-ORDERED fold (Spark `aggregate` == DuckDB
    `list_reduce` with the same prepended init), so both engines
    produce bit-identical doubles and the (cos desc, id) ranking needs
    no rounding step at all."""
    signs = _jl_signs()
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def proj(col: F.Column) -> F.Column:
        comps = [
            F.aggregate(
                F.zip_with(
                    col,
                    F.array(*[F.lit(x) for x in row]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for row in signs
        ]
        return F.array(*comps)

    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )

    def top3(frame: DataFrame) -> DataFrame:
        q = frame.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        scored = (
            q.crossJoin(frame)
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("query_id", "neighbor_id")
        )

    full = top3(emb)
    sk = top3(emb.select("vec_id", proj(F.col("v")).alias("v")))
    inter = (
        full.join(sk, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("overlap3"))
    )
    return (
        full.select("query_id")
        .distinct()
        .join(inter, "query_id", "left")
        .select(
            F.col("query_id").cast("long"),
            F.coalesce("overlap3", F.lit(0)).cast("long").alias("overlap3"),
        )
        .orderBy("query_id")
    )


def _jl_recall_sql() -> str:
    signs = _jl_signs()

    def fold(expr: str, var: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {expr}), "
            f"(acc{var}, x{var}) -> acc{var} + x{var})"
        )

    proj_exprs = []
    for j, row in enumerate(signs):
        lits = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in row) + "]"
        prods = (
            f"list_transform(range(1, 65), p{j} -> "
            f"CAST(embedding[p{j}] AS DOUBLE) * ({lits})[p{j}])"
        )
        proj_exprs.append(fold(prods, f"f{j}"))
    pv = "[" + ",\n    ".join(proj_exprs) + "]"
    dot = fold(
        "list_transform(range(1, len(a.v) + 1), k -> a.v[k] * b.v[k])", "d"
    )
    n1 = fold("list_transform(a.v, e1 -> e1 * e1)", "n1")
    n2 = fold("list_transform(b.v, e2 -> e2 * e2)", "n2")
    top3 = f"""
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
           ({dot}) / (SQRT({n1}) * SQRT({n2})) DESC, b.vec_id) AS rn
  FROM {{src}} a JOIN {{src}} b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 20"""
    return f"""
WITH fullv AS (SELECT vec_id,
        list_transform(range(1, 65), q -> CAST(embedding[q] AS DOUBLE)) AS v
      FROM embeddings),
proj AS (SELECT vec_id, {pv} AS v FROM embeddings),
ft AS (SELECT query_id, neighbor_id FROM ({top3.format(src='fullv')}) WHERE rn <= 3),
pt AS (SELECT query_id, neighbor_id FROM ({top3.format(src='proj')}) WHERE rn <= 3),
ov AS (SELECT ft.query_id, COUNT(*) AS overlap3
       FROM ft JOIN pt ON pt.query_id = ft.query_id
                      AND pt.neighbor_id = ft.neighbor_id
       GROUP BY ft.query_id)
SELECT q.query_id, CAST(COALESCE(ov.overlap3, 0) AS BIGINT) AS overlap3
FROM (SELECT DISTINCT query_id FROM ft) q
LEFT JOIN ov ON ov.query_id = q.query_id
ORDER BY q.query_id
"""


_LOGREG_M = 1 << 26  # positive-shift for floor division (5e7 < 2·2²⁶ ⇒ scale-free)


def q_logreg_gd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression by 3 full-batch gradient-descent rounds,
    INTEGER-EXACT end to end: predict l_returnflag = 'R' from
    (1, disc_pct, qty_units).  Weights live as 1e6-scaled BIGINTs; each
    round's margin is an exact integer dot product, the per-row
    gradient factor t = floor(1e6·(σ(m) − y)) is floored BEFORE the
    feature products so every gradient component is an
    order-independent BIGINT sum, and the update w ← w − mean·lr rides
    the POSITIVE-SHIFTED floor division (g + M·2n) DIV 2n − M (Spark
    DIV truncates toward zero, DuckDB // floors — they disagree on
    negatives, the revenue_mom lesson; the shift keeps the numerator
    positive, M = 2²⁶ dominates |g|/2n ≤ 2.5e7 at any sf).  Output: the
    three weights and the 0.5-threshold confusion counts — all BIGINT,
    zero float parity surface.  Three passes over the fact table, each
    one map + one partial-aggregated reduce; per-round weights are
    1-row scalars (the convergence-aggregate collect discipline)."""
    li = load_table(spark, "lineitem", sf_dir)
    f = li.select(
        F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x1"),
        F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT) DIV 100").alias("x2"),
    )
    n = f.count()
    d = 2 * n  # lr = 1/2 over the mean gradient
    w = [0, 0, 0]
    for _ in range(3):
        m_e6 = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-(m_e6.cast("double") / F.lit(1e6)))
        )
        t = F.floor(F.lit(1e6) * (p - F.col("y").cast("double")))
        g = f.agg(
            F.sum(t).cast("long").alias("g0"),
            F.sum(t * F.col("x1")).cast("long").alias("g1"),
            F.sum(t * F.col("x2")).cast("long").alias("g2"),
        ).collect()[0]
        w = [
            w[j] - ((g[f"g{j}"] + _LOGREG_M * d) // d - _LOGREG_M)
            for j in range(3)
        ]
    m_e6 = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    pred = (m_e6 > 0).cast("long")
    return f.agg(
        F.lit(w[0]).alias("w0_e6"),
        F.lit(w[1]).alias("w1_e6"),
        F.lit(w[2]).alias("w2_e6"),
        F.sum(pred * F.col("y")).cast("long").alias("tp"),
        F.sum(pred * (1 - F.col("y"))).cast("long").alias("fp"),
        F.sum((1 - pred) * F.col("y")).cast("long").alias("fn"),
        F.sum((1 - pred) * (1 - F.col("y"))).cast("long").alias("tn"),
    )


def _logreg_sql(rounds: int = 3) -> str:
    m = _LOGREG_M
    parts = [
        """f AS MATERIALIZED (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x1,
         CAST(ROUND(l_quantity * 100) AS BIGINT) // 100 AS x2
  FROM lineitem)""",
        "nn AS (SELECT COUNT(*) AS n FROM f)",
        "w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""g{k} AS MATERIALIZED (
  SELECT SUM(t) AS g0, SUM(t * x1) AS g1, SUM(t * x2) AS g2 FROM (
    SELECT CAST(FLOOR(1e6 * (
             1.0 / (1.0 + EXP(-(CAST(w.a + w.b * f.x1 + w.c * f.x2 AS DOUBLE) / 1e6)))
             - CAST(f.y AS DOUBLE))) AS BIGINT) AS t,
           f.x1, f.x2
    FROM f CROSS JOIN w{k - 1} w))""",
        )
        parts.append(
            f"""w{k} AS (
  SELECT w.a - ((g.g0 + {m} * 2 * nn.n) // (2 * nn.n) - {m}) AS a,
         w.b - ((g.g1 + {m} * 2 * nn.n) // (2 * nn.n) - {m}) AS b,
         w.c - ((g.g2 + {m} * 2 * nn.n) // (2 * nn.n) - {m}) AS c
  FROM w{k - 1} w CROSS JOIN g{k} g CROSS JOIN nn)""",
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(w.a AS BIGINT) AS w0_e6, CAST(w.b AS BIGINT) AS w1_e6,
       CAST(w.c AS BIGINT) AS w2_e6,
       CAST(SUM(CASE WHEN w.a + w.b * f.x1 + w.c * f.x2 > 0 AND f.y = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN w.a + w.b * f.x1 + w.c * f.x2 > 0 AND f.y = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN NOT (w.a + w.b * f.x1 + w.c * f.x2 > 0) AND f.y = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN NOT (w.a + w.b * f.x1 + w.c * f.x2 > 0) AND f.y = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM f CROSS JOIN w{rounds} w
GROUP BY w.a, w.b, w.c
"""
    )


ORACLES.update(
    {"jl_recall": _jl_recall_sql(), "logreg_gd3": _logreg_sql()}
)
QUERIES.update({"jl_recall": q_jl_recall, "logreg_gd3": q_logreg_gd3})


_EWMA_K = 20  # dyadic EWMA horizon: weight of lag j is exactly 2^-(j+1)


def q_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead revenue forecasting by EXPONENTIAL smoothing with
    α = 1/2 — the EWMA control chart / SES forecaster, INTEGER-EXACT:
    with a dyadic α every weight α(1−α)^j = 2^-(j+1) is exact in
    binary, so the 20-term truncated EWMA numerator Σ_j lag_j·2^(19−j)
    is an exact BIGINT over revenue cents (truncation tail < 2⁻²⁰ of
    total weight).  Forecast error e_t = x_t·2²⁰ − num_{t−1} is again
    exact — zero float anywhere.  The heavy lift (daily cents) is one
    distributed aggregate; the 20 lag terms run on the PRE-AGGREGATED
    day table (bounded by calendar, the hourly_anomaly posture).  Rows
    start once a full 20-day history exists."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    num = None
    for j in range(_EWMA_K):
        term = F.lag("cents", j).over(w) * F.lit(1 << (_EWMA_K - 1 - j))
        num = term if num is None else num + term
    hist = F.count("*").over(
        Window.orderBy("day").rowsBetween(-(_EWMA_K - 1), 0)
    )
    staged = daily.select(
        "day", "cents", num.alias("num"), hist.alias("hist")
    )
    return (
        staged.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            F.col("num").cast("long").alias("ewma_num"),
            (
                F.col("cents") * F.lit(1 << _EWMA_K)
                - F.lag("num").over(Window.orderBy("day"))
            )
            .cast("long")
            .alias("err_num"),
            "hist",
        )
        .where(F.col("hist") >= _EWMA_K + 0)
        .where(F.col("err_num").isNotNull())
        .drop("hist")
        .orderBy("day")
    )


def _ewma_sql() -> str:
    k = _EWMA_K
    terms = " + ".join(
        f"LAG(cents, {j}) OVER (ORDER BY day) * {1 << (k - 1 - j)}"
        for j in range(1, k)
    )
    terms = f"cents * {1 << (k - 1)} + " + terms
    return f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
staged AS (
  SELECT day, cents, {terms} AS num,
         COUNT(*) OVER (ORDER BY day ROWS BETWEEN {k - 1} PRECEDING
                        AND CURRENT ROW) AS hist
  FROM daily),
final AS (
  SELECT strftime(day, '%Y-%m-%d') AS day, cents,
         CAST(num AS BIGINT) AS ewma_num,
         CAST(cents * {1 << k} - LAG(num) OVER (ORDER BY day) AS BIGINT)
           AS err_num,
         hist
  FROM staged)
SELECT day, cents, ewma_num, err_num FROM final
WHERE hist >= {k} AND err_num IS NOT NULL ORDER BY day
"""


def q_kmeans_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation of the kmeans8 partition against
    the embeddings' ground-truth labels: normalized mutual information
    NMI = I(C;L)/√(H(C)·H(L)) plus purity — the pair-counting
    complement to `ari_partitions` for a centroid clustering.  Every
    entropy/MI cell term is floored to a 1e6-scaled BIGINT BEFORE
    summation (the transition_entropy discipline) and purity is the
    exact integer Σ_c max_l n_cl, so the only float is the one final
    NMI expression on exact integers.  Contingency is an 8×|labels|
    aggregate — trivially broadcastable at any corpus size."""
    from polar_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, "embeddings", sf_dir)
    asg, _ = kmeans_lloyd(emb, k=8, n_iter=3)
    lab = emb.select(F.col("vec_id").alias("id"), F.col("label").cast("long"))
    ct = (
        asg.select("id", "cluster")
        .join(lab, "id")
        .groupBy("cluster", "label")
        .agg(F.count("*").cast("long").alias("n_cl"))
    )
    n_c = ct.groupBy("cluster").agg(F.sum("n_cl").alias("nc"))
    n_l = ct.groupBy("label").agg(F.sum("n_cl").alias("nl"))
    n_tot = F.sum("n_cl").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cells = (
        ct.join(n_c, "cluster")
        .join(n_l, "label")
        .select(
            "cluster",
            "label",
            "n_cl",
            "nc",
            "nl",
            n_tot.alias("n"),
        )
    )
    i_term = F.floor(
        F.lit(1e6)
        * (
            F.col("n_cl").cast("double")
            * F.log(
                F.col("n").cast("double")
                * F.col("n_cl").cast("double")
                / (F.col("nc").cast("double") * F.col("nl").cast("double"))
            )
        )
    )
    maxl = cells.groupBy("cluster").agg(F.max("n_cl").alias("mx"))
    nlogn = lambda c: F.floor(  # noqa: E731
        F.lit(1e6) * (F.col(c).cast("double") * F.log(F.col(c).cast("double")))
    )
    summary = cells.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.max("n").cast("long").alias("n"),
        F.sum(i_term).cast("long").alias("i_scaled"),
    )
    sc = n_c.agg(F.sum(nlogn("nc")).cast("long").alias("sc_scaled"))
    sl = n_l.agg(F.sum(nlogn("nl")).cast("long").alias("sl_scaled"))
    pur = maxl.agg(F.sum("mx").cast("long").alias("purity_num"))
    out = summary.crossJoin(sc).crossJoin(sl).crossJoin(pur)
    nd = F.col("n").cast("double")
    hc = F.log(nd) - F.col("sc_scaled").cast("double") / (F.lit(1e6) * nd)
    hl = F.log(nd) - F.col("sl_scaled").cast("double") / (F.lit(1e6) * nd)
    i_val = F.col("i_scaled").cast("double") / (F.lit(1e6) * nd)
    return out.select(
        "n_cells",
        "n",
        "i_scaled",
        "sc_scaled",
        "sl_scaled",
        F.expr("purity_num * 1000000 DIV n").cast("long").alias("purity_ppm"),
        F.round(i_val / F.sqrt(hc * hl), 6).alias("nmi_r"),
    )


def _kmeans_nmi_sql(k: int = 8, n_iter: int = 3) -> str:
    parts, dist = _kmeans_parts(k, n_iter)
    parts.append(
        f"asg AS MATERIALIZED (SELECT id, cid FROM ("
        f"SELECT e.id, c.cid, "
        f"ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {dist}, c.cid) AS rn "
        f"FROM e CROSS JOIN c{n_iter} c) x WHERE rn = 1)"
    )
    parts += [
        "lab AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label FROM embeddings)",
        "ct AS MATERIALIZED (SELECT cid AS cluster, label, COUNT(*) AS n_cl "
        "FROM asg JOIN lab USING (id) GROUP BY 1, 2)",
        "nc AS (SELECT cluster, SUM(n_cl) AS nc FROM ct GROUP BY cluster)",
        "nl AS (SELECT label, SUM(n_cl) AS nl FROM ct GROUP BY label)",
        "nt AS (SELECT SUM(n_cl) AS n FROM ct)",
        """cells AS MATERIALIZED (
  SELECT ct.cluster, ct.label, ct.n_cl, nc.nc, nl.nl, nt.n
  FROM ct JOIN nc USING (cluster) JOIN nl USING (label) CROSS JOIN nt)""",
        """summary AS (
  SELECT COUNT(*) AS n_cells, MAX(n) AS n,
         SUM(CAST(FLOOR(1e6 * (CAST(n_cl AS DOUBLE) * LN(
           CAST(n AS DOUBLE) * CAST(n_cl AS DOUBLE)
           / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE))))) AS BIGINT))
           AS i_scaled
  FROM cells)""",
        "sc AS (SELECT SUM(CAST(FLOOR(1e6 * (CAST(nc AS DOUBLE) * "
        "LN(CAST(nc AS DOUBLE)))) AS BIGINT)) AS sc_scaled FROM nc)",
        "sl AS (SELECT SUM(CAST(FLOOR(1e6 * (CAST(nl AS DOUBLE) * "
        "LN(CAST(nl AS DOUBLE)))) AS BIGINT)) AS sl_scaled FROM nl)",
        "pur AS (SELECT SUM(mx) AS purity_num FROM "
        "(SELECT cluster, MAX(n_cl) AS mx FROM cells GROUP BY cluster))",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(s.n_cells AS BIGINT) AS n_cells, CAST(s.n AS BIGINT) AS n,
       CAST(s.i_scaled AS BIGINT) AS i_scaled,
       CAST(sc.sc_scaled AS BIGINT) AS sc_scaled,
       CAST(sl.sl_scaled AS BIGINT) AS sl_scaled,
       CAST(pur.purity_num * 1000000 // s.n AS BIGINT) AS purity_ppm,
       ROUND((CAST(s.i_scaled AS DOUBLE) / (1e6 * CAST(s.n AS DOUBLE)))
             / SQRT((LN(CAST(s.n AS DOUBLE))
                     - CAST(sc.sc_scaled AS DOUBLE) / (1e6 * CAST(s.n AS DOUBLE)))
                  * (LN(CAST(s.n AS DOUBLE))
                     - CAST(sl.sl_scaled AS DOUBLE) / (1e6 * CAST(s.n AS DOUBLE)))),
             6) AS nmi_r
FROM summary s CROSS JOIN sc CROSS JOIN sl CROSS JOIN pur
"""
    )


ORACLES.update(
    {"ewma_forecast": _ewma_sql(), "kmeans_nmi": _kmeans_nmi_sql()}
)
QUERIES.update(
    {"ewma_forecast": q_ewma_forecast, "kmeans_nmi": q_kmeans_nmi}
)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style match report over the winnowing fingerprints
    (Schleimer-Wilkes-Aiken SIGMOD'03): document pairs sharing ≥ 2
    selected fingerprints, after dropping fingerprints present in more
    than 50 documents (the "ignore common code/boilerplate" screen MOSS
    applies before pairing — it is also the skew guard that keeps the
    hash-keyed pair join from exploding on a ubiquitous fingerprint).
    Composes `winnow_fp`'s per-document selection; candidate
    generation is one fingerprint-keyed self-join, exactly the LSH
    band-bucket shape.

    The fingerprint arrays are MATERIALIZED (localCheckpoint) before
    the explode: CollapseProject merges the winnow operator's staged
    projections into the Generate input, re-inlining the nested
    higher-order chain so each window position recomputes every
    upstream transform — measured runaway (minutes for 500 docs,
    single interpreted task) vs ~5 s materialized.  Same family as the
    DuckDB multi-referenced-CTE MATERIALIZED lesson, on the Spark
    side."""
    from polar_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, "documents", sf_dir)
    wf = winnow_fingerprints(docs, "text", "doc_id", k=4, w=5).localCheckpoint(
        eager=True
    )
    fps = wf.select("doc_id", F.explode("fps").alias("fp")).distinct()
    rare = fps.groupBy("fp").agg(F.count("*").alias("df")).where(F.col("df") <= 50)
    kept = fps.join(rare.select("fp"), "fp")
    pairs = (
        kept.alias("x")
        .join(kept.alias("y"), "fp")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= 2)
    )
    return pairs.select(
        F.col("a").cast("long"), F.col("b").cast("long"), "shared"
    ).orderBy(F.desc("shared"), "a", "b")


def _winnow_pairs_sql() -> str:
    base = _winnow_sql().rsplit("SELECT CAST(doc_id", 1)[0].rstrip().rstrip(",")
    return (
        base
        + """,
fpx AS (SELECT DISTINCT doc_id, UNNEST(fps) AS fp FROM win),
rare AS (SELECT fp FROM fpx GROUP BY fp HAVING COUNT(*) <= 50),
kept AS (SELECT doc_id, fp FROM fpx JOIN rare USING (fp)),
pr AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS shared
       FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
       GROUP BY 1, 2)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(shared AS BIGINT) AS shared
FROM pr WHERE shared >= 2 ORDER BY shared DESC, a, b
"""
    )


def q_knn_homophily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label homophily of the exact cosine 5-NN graph — the
    embedding-quality probe behind every kNN classifier: per label, the
    fraction of 5-NN edges that stay within the label (exact integer
    ppm) next to the random-neighbor BASELINE (n_l−1)/(N−1) — a useful
    embedding separates labels iff same_ppm ≫ base_ppm.  Reuses the
    snn_clusters kNN construction (7-dp-rounded rank, id tie-break);
    all ratios integer cross-multiplied."""
    emb = load_table(spark, "embeddings", sf_dir)
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    knn = _cosine_pair_scan(vecs, k=5, eps=None, rank_on="cos").select("qid", "nid")
    lab = emb.select(F.col("vec_id"), F.col("label").cast("long"))
    n_tot = emb.count()
    scored = (
        knn.join(lab.withColumnRenamed("vec_id", "qid").withColumnRenamed("label", "lq"), "qid")
        .join(lab.withColumnRenamed("vec_id", "nid").withColumnRenamed("label", "ln"), "nid")
    )
    per = scored.groupBy(F.col("lq").alias("label")).agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum((F.col("lq") == F.col("ln")).cast("long")).cast("long").alias("n_same"),
    )
    sizes = lab.groupBy("label").agg(F.count("*").cast("long").alias("n_l"))
    return (
        per.join(sizes, "label")
        .select(
            "label",
            "n_l",
            "n_edges",
            "n_same",
            F.expr("n_same * 1000000 DIV n_edges").cast("long").alias("same_ppm"),
            F.expr(f"(n_l - 1) * 1000000 DIV {n_tot - 1}").cast("long").alias("base_ppm"),
        )
        .orderBy("label")
    )


_KNN_HOMOPHILY_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                  ROUND(list_cosine_similarity(a.v, b.v), 7) AS cos_r
           FROM emb a JOIN emb b ON a.vec_id != b.vec_id),
knn AS (SELECT qid, nid FROM (
          SELECT qid, nid,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos_r DESC, nid) AS rn
          FROM scored) t WHERE rn <= 5),
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
nt AS (SELECT COUNT(*) AS n FROM lab),
per AS (SELECT lq.label, COUNT(*) AS n_edges,
               SUM(CASE WHEN lq.label = ln.label THEN 1 ELSE 0 END) AS n_same
        FROM knn JOIN lab lq ON lq.vec_id = knn.qid
                 JOIN lab ln ON ln.vec_id = knn.nid
        GROUP BY lq.label),
sizes AS (SELECT label, COUNT(*) AS n_l FROM lab GROUP BY label)
SELECT p.label, CAST(s.n_l AS BIGINT) AS n_l,
       CAST(p.n_edges AS BIGINT) AS n_edges,
       CAST(p.n_same AS BIGINT) AS n_same,
       CAST(p.n_same * 1000000 // p.n_edges AS BIGINT) AS same_ppm,
       CAST((s.n_l - 1) * 1000000 // (nt.n - 1) AS BIGINT) AS base_ppm
FROM per p JOIN sizes s USING (label) CROSS JOIN nt
ORDER BY p.label
"""


def q_bmatching2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximal b-matching (b = 2) on the bounded co-order graph
    (pregel.b_matching): every part keeps up to its 2 best partners
    under the deterministic edge-priority order — the
    degree-constrained overlay/peer-selection primitive that
    `matching_coorder` (b = 1) can't express.  The oracle unrolls the
    capacity-tracked mutual-proposal rounds; rounds past the fixpoint
    are no-ops, so the unroll is padded."""
    und = coorder_edges(spark, sf_dir, part_cap=400)
    out, stats = pregel.b_matching(und, b=2, max_iter=24)
    return out.select(
        F.col("a").cast("long"), F.col("b").cast("long")
    ).orderBy("a", "b")


def _bmatching_sql(rounds: int, cap: int = 2) -> str:
    parts = [
        "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey < 400)",
        "und AS (SELECT DISTINCT a.p AS a, b.p AS b "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
        "k0 AS (SELECT a, b, a * 2147483648 + b AS key FROM und)",
        "k1 AS (SELECT a, b, xor(key % 2147483648, (key >> 31) % 2147483648) AS x0 FROM k0)",
        "k2 AS (SELECT a, b, (x0 * 2654435761) % 2147483648 AS x1 FROM k1)",
        "k3 AS (SELECT a, b, (xor(x1, x1 >> 13) * 1274126177) % 2147483648 AS x2 FROM k2)",
        "e0 AS (SELECT a, b, xor(x2, x2 >> 17) AS p FROM k3)",
        "m0 AS (SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"used{i} AS (SELECT v, COUNT(*) AS u FROM ("
            f"SELECT a AS v FROM m{i - 1} UNION ALL SELECT b FROM m{i - 1}) z GROUP BY v)",
            f"elig{i} AS MATERIALIZED (SELECT e.a, e.b, e.p FROM e{i - 1} e "
            f"LEFT JOIN used{i} ua ON ua.v = e.a "
            f"LEFT JOIN used{i} ub ON ub.v = e.b "
            f"WHERE COALESCE(ua.u, 0) < {cap} AND COALESCE(ub.u, 0) < {cap})",
            f"inc{i} AS (SELECT a AS v, a, b, p FROM elig{i} "
            f"UNION ALL SELECT b, a, b, p FROM elig{i})",
            f"top{i} AS (SELECT v, a, b FROM ("
            f"SELECT v, a, b, ROW_NUMBER() OVER (PARTITION BY v "
            f"ORDER BY p DESC, a ASC, b ASC) AS rn FROM inc{i}) t WHERE rn = 1)",
            f"sel{i} AS MATERIALIZED (SELECT a, b FROM top{i} "
            f"GROUP BY a, b HAVING COUNT(*) = 2)",
            f"m{i} AS (SELECT a, b FROM m{i - 1} UNION ALL SELECT a, b FROM sel{i})",
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b, e.p FROM e{i - 1} e "
            f"LEFT JOIN sel{i} s ON s.a = e.a AND s.b = e.b WHERE s.a IS NULL)",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
        FROM m{rounds} ORDER BY a, b"""
    )


ORACLES.update(
    {
        "winnow_pairs": _winnow_pairs_sql(),
        "knn_homophily": _KNN_HOMOPHILY_SQL,
        "bmatching2": _bmatching_sql(24),
    }
)
QUERIES.update(
    {
        "winnow_pairs": q_winnow_pairs,
        "knn_homophily": q_knn_homophily,
        "bmatching2": q_bmatching2,
    }
)


def q_transitive_reduction2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortcut-edge removal (bounded transitive reduction, k = 2) of
    the per-customer order-succession DAG — the `git log`-style
    history-simplification pass: an edge (u, v) is dropped iff an
    alternate 2-hop path u→w→v exists (one directed self-join, no
    reachability closure — at 100 TB the k-bounded rule is the only
    affordable shape, and on interval-order DAGs like this one it IS
    the exact transitive reduction: every next-2 shortcut is witnessed
    by two next-1 hops).  Returns the kept edge set."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = orders.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    )
    a, b = r.alias("a"), r.alias("b")
    edges = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.rn") - F.col("a.rn")).isin(1, 2),
    ).select(
        F.col("a.o_orderkey").alias("src"), F.col("b.o_orderkey").alias("dst")
    )
    mid = edges.select(F.col("src").alias("w_src"), F.col("dst").alias("w"))
    tail = edges.select(F.col("src").alias("w"), F.col("dst").alias("w_dst"))
    two_hop = (
        mid.join(tail, "w")
        .select(F.col("w_src").alias("src"), F.col("w_dst").alias("dst"))
        .distinct()
    )
    return (
        edges.join(two_hop, ["src", "dst"], "left_anti")
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .orderBy("src", "dst")
    )


_TRANSITIVE_REDUCTION_SQL = """
WITH r AS (SELECT o_custkey, o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders),
edges AS (SELECT a.o_orderkey AS src, b.o_orderkey AS dst
          FROM r a JOIN r b ON b.o_custkey = a.o_custkey
          AND (b.rn - a.rn) IN (1, 2)),
two_hop AS (SELECT DISTINCT m.src, t.dst
            FROM edges m JOIN edges t ON t.src = m.dst)
SELECT CAST(e.src AS BIGINT) AS src, CAST(e.dst AS BIGINT) AS dst
FROM edges e LEFT JOIN two_hop h ON h.src = e.src AND h.dst = e.dst
WHERE h.src IS NULL ORDER BY e.src, e.dst
"""


def q_triadic_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal triadic-closure rate on the weight-≥2 co-order
    backbone: wedges are grouped by their FORMATION month (the later of
    the two edges' first-appearance months, the densification_curve
    machinery), and a wedge counts as closed iff its closing edge
    first appears in a STRICTLY LATER month — the time-respecting
    link-prediction ground truth ("friends of friends become friends",
    Granovetter/Kossinets-Watts); multi-center 2-hop pairs collapse to
    their EARLIEST formation month.  Wedge enumeration is center-keyed
    (cost Σ d², bounded by the backbone screen — the node_similarity
    hub discipline); closure is one join against the dated edge set;
    exact integer ppm."""
    li = load_table(spark, "lineitem", sf_dir)
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    op = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"), "m")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    wund = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(
            F.count("*").alias("wt"),
            F.min(F.least(F.col("a.m"), F.col("b.m")).cast("date")).alias("fm"),
        )
        .where(F.col("wt") >= 2)
        .select("src", "dst", "fm")
    )
    sym = wund.unionByName(
        wund.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "fm"
        )
    )
    l_, r_ = sym.alias("l"), sym.alias("r")
    wedges = (
        l_.join(r_, F.col("l.src") == F.col("r.src"))
        .where(F.col("l.dst") < F.col("r.dst"))
        .select(
            F.col("l.dst").alias("u"),
            F.col("r.dst").alias("v"),
            F.greatest(F.col("l.fm"), F.col("r.fm")).alias("wm"),
        )
        .groupBy("u", "v")
        .agg(F.min("wm").alias("formed"))
    )
    closed = wund.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("fm").alias("cm")
    )
    jm = wedges.join(closed, ["u", "v"], "left")
    per_month = jm.groupBy(F.col("formed").alias("month")).agg(
        F.count("*").cast("long").alias("n_wedges"),
        F.sum(
            (F.col("cm").isNotNull() & (F.col("cm") > F.col("formed"))).cast("long")
        )
        .cast("long")
        .alias("n_closed_later"),
    )
    return per_month.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        "n_wedges",
        "n_closed_later",
        F.expr("n_closed_later * 1000000 DIV n_wedges").cast("long").alias(
            "close_ppm"
        ),
    ).orderBy("month")


_TRIADIC_CLOSURE_SQL = """
WITH op AS (SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p,
                   date_trunc('month', o.o_orderdate) AS m
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
wund AS MATERIALIZED (
  SELECT a.p AS src, b.p AS dst,
         CAST(MIN(LEAST(a.m, b.m)) AS DATE) AS fm
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT src, dst, fm FROM wund
        UNION ALL SELECT dst, src, fm FROM wund),
wedges AS (
  SELECT l.dst AS u, r.dst AS v, MIN(GREATEST(l.fm, r.fm)) AS formed
  FROM sym l JOIN sym r ON r.src = l.src AND l.dst < r.dst
  GROUP BY 1, 2),
jm AS (SELECT w.formed, c.fm AS cm
       FROM wedges w LEFT JOIN wund c ON c.src = w.u AND c.dst = w.v),
per_month AS (
  SELECT formed AS month, COUNT(*) AS n_wedges,
         SUM(CASE WHEN cm IS NOT NULL AND cm > formed THEN 1 ELSE 0 END)
           AS n_closed_later
  FROM jm GROUP BY formed)
SELECT strftime(month, '%Y-%m') AS month,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_closed_later AS BIGINT) AS n_closed_later,
       CAST(n_closed_later * 1000000 // n_wedges AS BIGINT) AS close_ppm
FROM per_month ORDER BY month
"""


ORACLES.update(
    {
        "transitive_reduction2": _TRANSITIVE_REDUCTION_SQL,
        "triadic_closure": _TRIADIC_CLOSURE_SQL,
    }
)
QUERIES.update(
    {
        "transitive_reduction2": q_transitive_reduction2,
        "triadic_closure": q_triadic_closure,
    }
)


_EPS_THRESHOLDS = (30, 35, 40, 45)  # cosine thresholds in centi-units


def q_eps_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-graph percolation curve over the embedding space: pair /
    vertex / component / giant counts of the cosine-threshold graph at
    τ ∈ {0.30, 0.35, 0.40, 0.45} — the threshold-choice report behind
    `embed_neardup` and `dbscan_star`, exactly what `percolation_profile`
    is for the weighted co-order graph.  Pairs are computed ONCE at the
    loosest threshold (bounded exact path) and filtered per τ; every
    threshold sits far from any pair's cosine (0.35 precedent:
    ≥ 2.8e-5 margin) so float association-order noise cannot flip
    membership.  Four hash-min component runs over shrinking pair
    sets.  max_rows covers the 2000-vector fixture's exact path (2M
    candidate pairs at sf0.1); beyond that route pair generation
    through the LSH buckets — embed_neardup's scale posture."""
    from polar_spark.operators.similarity import cosine_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    base = cosine_pairs(emb, threshold=0.30, max_rows=2_100_000).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cos"
    ).localCheckpoint(eager=True)
    # all four thresholds ride ONE keyed hash-min CC (k = thr_centi):
    # per-threshold labels/stats are identical to four separate runs,
    # but 4 × (setup + rounds) driver actions collapse to one loop
    keyed = base.select(
        F.explode(
            F.filter(
                F.array(*[F.lit(t) for t in _EPS_THRESHOLDS]),
                lambda t: F.col("cos") >= t.cast("double") / F.lit(100.0),
            )
        ).alias("k"),
        "src",
        "dst",
    )
    pair_counts = {
        int(r["k"]): int(r["n"])
        for r in keyed.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    comp, _ = pregel.connected_components_multi(keyed)
    cstats = comp.groupBy("k", "comp").agg(F.count("*").alias("n"))
    aggs = {
        int(r["k"]): r
        for r in cstats.groupBy("k")
        .agg(F.sum("n").alias("nv"), F.count("*").alias("nc"), F.max("n").alias("g"))
        .collect()
    }
    rows = []
    for t in _EPS_THRESHOLDS:
        if pair_counts.get(t, 0) == 0:
            rows.append((t, 0, 0, 0, 0))
        else:
            a = aggs[t]
            rows.append((t, pair_counts[t], int(a["nv"]), int(a["nc"]), int(a["g"])))
    return spark.createDataFrame(
        rows, "thr_centi long, n_pairs long, n_vertices long, n_components long, giant long"
    ).orderBy("thr_centi")


def _eps_components_sql() -> str:
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        """p AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst, list_cosine_similarity(a.v, b.v) AS c
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.30)""",
    ]
    selects = []
    for t in _EPS_THRESHOLDS:
        parts += [
            f"u{t} AS MATERIALIZED (SELECT src, dst FROM p WHERE c >= {t / 100.0})",
            f"s{t} AS (SELECT src, dst FROM u{t} UNION ALL SELECT dst, src FROM u{t})",
            f"v{t} AS (SELECT DISTINCT src AS id FROM s{t})",
            f"""r{t}(id, comp) AS (
            SELECT id, id FROM v{t}
            UNION
            SELECT e.dst, r.comp FROM r{t} r JOIN s{t} e ON e.src = r.id
            WHERE r.comp < e.dst)""",
            f"c{t} AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM r{t} GROUP BY id)",
            f"g{t} AS (SELECT comp, COUNT(*) AS n FROM c{t} GROUP BY comp)",
        ]
        selects.append(
            f"""SELECT {t} AS thr_centi,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM u{t}) AS n_pairs,
            (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM g{t}) AS n_vertices,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM g{t}) AS n_components,
            (SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) FROM g{t}) AS giant"""
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY thr_centi"
    )


_LP_SPLIT = "1998-01-01"


def q_lp_auc_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction evaluation with a TEMPORAL split: score every
    non-adjacent 2-hop pair of the pre-1998 weight-≥2 co-order backbone
    by its common-neighbor count, label it positive iff the pair IS a
    backbone edge over the full period but was NOT one before the
    split (a genuinely new link), and report the exact Mann-Whitney
    AUC of the score — the honest out-of-time eval the static
    `link_prediction5` top-k can't give.  INTEGER-EXACT: scores are
    small integers, 2×-midranks ride a window over the ≤ max-cn-row
    score histogram (never the data), u2 = ΣR₊·2 − n₊(n₊+1)."""
    li = load_table(spark, "lineitem", sf_dir)
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.col("o_orderdate").alias("odate")
    )
    op = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.col("l_orderkey").alias("o"),
            F.col("l_partkey").alias("p"),
            "odate",
        )
        .distinct()
    )

    def backbone(frame: DataFrame) -> DataFrame:
        a, b = frame.alias("a"), frame.alias("b")
        return (
            a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
            .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
            .agg(F.count("*").alias("w"))
            .where(F.col("w") >= 2)
            .select("src", "dst")
        )

    bb_t = backbone(op.where(F.col("odate") < F.lit(_LP_SPLIT))).localCheckpoint(
        eager=True
    )
    bb_full = backbone(op)
    sym = bb_t.unionByName(
        bb_t.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    l_, r_ = sym.alias("l"), sym.alias("r")
    cand = (
        l_.join(r_, F.col("l.src") == F.col("r.src"))
        .where(F.col("l.dst") < F.col("r.dst"))
        .groupBy(F.col("l.dst").alias("u"), F.col("r.dst").alias("v"))
        .agg(F.count("*").cast("long").alias("cn"))
        .join(
            bb_t.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    )
    lab = cand.join(
        bb_full.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).alias("pos")),
        ["u", "v"],
        "left",
    ).select("cn", F.coalesce("pos", F.lit(0)).cast("long").alias("pos"))
    g = lab.groupBy("cn").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("np")
    )
    w = Window.orderBy("cn").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn("midrank2", F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1))
    agg = ranked.agg(
        F.sum(F.col("np") * F.col("midrank2")).alias("r2"),
        F.sum("np").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).alias("n_neg"),
    )
    u2 = F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n_pairs"),
        F.col("n_pos").cast("long"),
        F.col("n_neg").cast("long"),
        u2.cast("long").alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                u2.cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_pos").cast("double")
                    * F.col("n_neg").cast("double")
                ),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("auc_r"),
    )


_LP_AUC_CN_SQL = f"""
WITH op AS (SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p, o.o_orderdate AS odate
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
bbt AS MATERIALIZED (
  SELECT a.p AS src, b.p AS dst
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  WHERE a.odate < DATE '{_LP_SPLIT}' AND b.odate < DATE '{_LP_SPLIT}'
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
bbf AS MATERIALIZED (
  SELECT a.p AS src, b.p AS dst
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT src, dst FROM bbt UNION ALL SELECT dst, src FROM bbt),
cand AS (
  SELECT l.dst AS u, r.dst AS v, COUNT(*) AS cn
  FROM sym l JOIN sym r ON r.src = l.src AND l.dst < r.dst
  GROUP BY 1, 2),
nonadj AS (SELECT c.u, c.v, c.cn FROM cand c
           LEFT JOIN bbt t ON t.src = c.u AND t.dst = c.v
           WHERE t.src IS NULL),
lab AS (SELECT n.cn,
               CASE WHEN f.src IS NOT NULL THEN 1 ELSE 0 END AS pos
        FROM nonadj n LEFT JOIN bbf f ON f.src = n.u AND f.dst = n.v),
g AS (SELECT cn, COUNT(*) AS cnt, SUM(pos) AS np FROM lab GROUP BY cn),
ranked AS (
  SELECT cn, cnt, np,
         COALESCE(SUM(cnt) OVER (ORDER BY cn
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM g),
agg AS (
  SELECT SUM(np * (2 * cum_before + cnt + 1)) AS r2,
         SUM(np) AS n_pos, SUM(cnt - np) AS n_neg
  FROM ranked)
SELECT CAST(n_pos + n_neg AS BIGINT) AS n_pairs,
       CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN ROUND(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
            ELSE 0.0 END AS auc_r
FROM agg
"""


ORACLES.update(
    {
        "eps_components": _eps_components_sql(),
        "lp_auc_cn": _LP_AUC_CN_SQL,
    }
)
QUERIES.update(
    {
        "eps_components": q_eps_components,
        "lp_auc_cn": q_lp_auc_cn,
    }
)


def q_attribution_markov5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution by REMOVAL EFFECT (Anderl et al. 2016):
    how much of the overall conversion probability (reach 'purchase'
    before 'error', 6-round truncated value iteration — the
    absorb_funnel6 engine) disappears when a channel's state is
    knocked out (pinned to 0, so any walk entering it is lost)?
    Conversion is averaged over the EMPIRICAL start distribution
    (each user's first event).  The data-dependent model fits in a
    handful of states, so all six value iterations are join-aggregate
    rounds over ≤ |states|² rows; transition probabilities are ratios
    of exact integer counts and the output is 6-dp rounded."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair = ev.select(
        F.col("event_type").alias("s"), F.lead("event_type").over(w).alias("t")
    ).where(F.col("t").isNotNull())
    cnt = pair.groupBy("s", "t").agg(F.count("*").cast("long").alias("n"))
    tot = cnt.groupBy("s").agg(F.sum("n").cast("long").alias("ns"))
    prob = (
        cnt.join(tot, "s")
        .select(
            "s",
            "t",
            (F.col("n").cast("double") / F.col("ns").cast("double")).alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    states = prob.select(F.col("s").alias("st")).distinct().localCheckpoint(eager=True)
    first = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    start = first.groupBy(F.col("event_type").alias("st")).agg(
        F.count("*").cast("long").alias("nu")
    ).localCheckpoint(eager=True)
    n_users = start.agg(F.sum("nu")).collect()[0][0]

    def conv(removed: str | None) -> float:
        pinned0 = {"error"} | ({removed} if removed else set())
        val = states.select(
            "st",
            F.when(F.col("st") == "purchase", 1.0)
            .when(F.col("st").isin(list(pinned0)), 0.0)
            .otherwise(0.0)
            .alias("v"),
        ).localCheckpoint(eager=True)
        for _ in range(6):
            nxt = (
                prob.join(val.select(F.col("st").alias("t"), "v"), "t")
                .groupBy(F.col("s").alias("st"))
                .agg(F.sum(F.col("p") * F.col("v")).alias("v"))
            )
            val = (
                states.join(nxt, "st", "left")
                .select(
                    "st",
                    F.when(F.col("st") == "purchase", 1.0)
                    .when(F.col("st").isin(list(pinned0)), 0.0)
                    .otherwise(F.coalesce(F.col("v"), F.lit(0.0)))
                    .alias("v"),
                )
                .localCheckpoint(eager=True)
            )
        got = (
            start.join(val, "st")
            .agg(F.sum(F.col("nu").cast("double") * F.col("v")))
            .collect()[0][0]
        )
        return (got or 0.0) / n_users

    base = conv(None)
    chans = sorted(
        r["st"] for r in states.collect() if r["st"] not in ("purchase", "error")
    )
    rows = []
    for c in chans:
        cc = conv(c)
        rows.append(
            (c, round(base, 6), round(cc, 6), round((base - cc) / base, 6))
        )
    return spark.createDataFrame(
        rows, "channel string, conv_base_r double, conv_removed_r double, effect_r double"
    ).orderBy("channel")


def _attribution_sql(rounds: int = 6) -> str:
    # one unrolled value iteration per variant: base + one per removable
    # channel; channels are data-independent here (the events generator
    # vocabulary), matching the operator's discovered-state set
    chans = ["click", "error", "purchase", "signup", "view"]
    removable = [c for c in chans if c not in ("purchase", "error")]
    parts = [
        """seq AS (SELECT event_type AS s,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t
        FROM events)""",
        "cnt AS (SELECT s, t, COUNT(*) AS n FROM seq WHERE t IS NOT NULL GROUP BY s, t)",
        "tot AS (SELECT s, SUM(n) AS ns FROM cnt GROUP BY s)",
        """prob AS MATERIALIZED (SELECT cnt.s, cnt.t,
            CAST(cnt.n AS DOUBLE) / CAST(tot.ns AS DOUBLE) AS p
        FROM cnt JOIN tot USING (s))""",
        "st AS MATERIALIZED (SELECT DISTINCT s AS st FROM prob)",
        """strt AS MATERIALIZED (
  SELECT event_type AS st, COUNT(*) AS nu FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events) z WHERE rn = 1 GROUP BY event_type)""",
        "nu AS (SELECT SUM(nu) AS n FROM strt)",
    ]
    convs = []
    for tag, removed in [("base", None)] + [(c, c) for c in removable]:
        pin0 = "'error'" + (f", '{removed}'" if removed else "")
        parts.append(
            f"v_{tag}_0 AS (SELECT st, CASE WHEN st = 'purchase' THEN 1.0 "
            f"WHEN st IN ({pin0}) THEN 0.0 ELSE 0.0 END AS v FROM st)"
        )
        for k in range(1, rounds + 1):
            parts.append(
                f"""v_{tag}_{k} AS MATERIALIZED (
  SELECT st.st, CASE WHEN st.st = 'purchase' THEN 1.0
                     WHEN st.st IN ({pin0}) THEN 0.0
                     ELSE COALESCE(nx.v, 0.0) END AS v
  FROM st LEFT JOIN (
    SELECT prob.s AS st, SUM(prob.p * pv.v) AS v
    FROM prob JOIN v_{tag}_{k - 1} pv ON pv.st = prob.t
    GROUP BY prob.s) nx ON nx.st = st.st)"""
            )
        parts.append(
            f"c_{tag} AS (SELECT SUM(CAST(strt.nu AS DOUBLE) * v.v) "
            f"/ (SELECT CAST(n AS DOUBLE) FROM nu) AS conv "
            f"FROM strt JOIN v_{tag}_{rounds} v USING (st))"
        )
        if removed:
            convs.append(
                f"SELECT '{removed}' AS channel, "
                f"ROUND((SELECT conv FROM c_base), 6) AS conv_base_r, "
                f"ROUND((SELECT conv FROM c_{tag}), 6) AS conv_removed_r, "
                f"ROUND(((SELECT conv FROM c_base) - (SELECT conv FROM c_{tag})) "
                f"/ (SELECT conv FROM c_base), 6) AS effect_r"
            )
    return (
        "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(convs)
        + "\nORDER BY channel"
    )


def q_subseq_support3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern supports (PrefixSpan posture, length-3, gaps
    allowed): for every ordered event-type triple (a, b, c), the number
    of users whose timeline CONTAINS it as a subsequence — the
    non-contiguous upgrade of `event_trigrams_top`.  Uses the
    EARLIEST-EMBEDDING DP (a subsequence embeds iff the greedy
    earliest one does): f(u,a) = first a; g(u,a,b) = first b after
    f(u,a); support(a,b,c) = #users with any c after g(u,a,b).  Each
    stage is one join + aggregate over |events|·|types| rows — never a
    3-way event self-join; strict time comparisons make same-timestamp
    events unchainable identically in both engines."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.col("event_type").alias("ty"), "ts"
    )
    f = ev.groupBy("user_id", F.col("ty").alias("a")).agg(F.min("ts").alias("fa"))
    g = (
        ev.join(f, "user_id")
        .where(F.col("ts") > F.col("fa"))
        .groupBy("user_id", "a", F.col("ty").alias("b"))
        .agg(F.min("ts").alias("gb"))
    )
    h = (
        ev.join(g, "user_id")
        .where(F.col("ts") > F.col("gb"))
        .select("user_id", "a", "b", F.col("ty").alias("c"))
        .distinct()
    )
    return (
        h.groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("support"))
        .orderBy("a", "b", "c")
    )


_SUBSEQ_SUPPORT_SQL = """
WITH ev AS (SELECT user_id, event_type AS ty, ts FROM events),
f AS (SELECT user_id, ty AS a, MIN(ts) AS fa FROM ev GROUP BY 1, 2),
g AS (SELECT ev.user_id, f.a, ev.ty AS b, MIN(ev.ts) AS gb
      FROM ev JOIN f ON f.user_id = ev.user_id AND ev.ts > f.fa
      GROUP BY 1, 2, 3),
h AS (SELECT DISTINCT ev.user_id, g.a, g.b, ev.ty AS c
      FROM ev JOIN g ON g.user_id = ev.user_id AND ev.ts > g.gb)
SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS support
FROM h GROUP BY a, b, c ORDER BY a, b, c
"""


ORACLES.update(
    {
        "attribution_markov5": _attribution_sql(),
        "subseq_support3": _SUBSEQ_SUPPORT_SQL,
    }
)
QUERIES.update(
    {
        "attribution_markov5": q_attribution_markov5,
        "subseq_support3": q_subseq_support3,
    }
)


def q_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-retrieval audit completing the trilogy with
    `matryoshka_recall` (truncation) and `jl_recall` (projection):
    exact cosine top-3 under the int8-DEQUANTIZED embeddings
    (similarity.quantize_int8's per-dimension affine codes) vs the full
    float embedding, per-query overlap — what 4× storage compression
    costs at serving time.  min/max/scale/codes are all
    comparison-or-integer derived (no summation), and every dot
    product is an index-ORDERED fold, so both engines rank identical
    doubles — no rounding step anywhere (the dequantization is inlined
    rather than routed through similarity.quantize_int8 so the fold
    order stays pinned)."""
    emb = load_table(spark, "embeddings", sf_dir)
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    x = emb.select(
        F.col("vec_id"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    dims = x.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    dims = dims.select(
        "pos",
        "mn",
        F.when(F.col("mx") == F.col("mn"), F.lit(1.0))
        .otherwise((F.col("mx") - F.col("mn")) / F.lit(255.0))
        .alias("scale"),
    )
    dq = (
        x.join(F.broadcast(dims), "pos")
        .select(
            "vec_id",
            "pos",
            (
                F.col("mn")
                + F.least(
                    F.lit(255),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col("x") - F.col("mn")) / F.col("scale") + F.lit(0.5)
                        ),
                    ),
                )
                * F.col("scale")
            ).alias("dqv"),
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "dqv"))),
                lambda s: s["dqv"],
            ).alias("v")
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, t: acc + t * t)
    )

    def top3(frame: DataFrame) -> DataFrame:
        q = frame.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        scored = (
            q.crossJoin(frame)
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("query_id", "neighbor_id")
        )

    full = top3(vecs)
    qz = top3(dq)
    inter = (
        full.join(qz, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("overlap3"))
    )
    return (
        full.select("query_id")
        .distinct()
        .join(inter, "query_id", "left")
        .select(
            F.col("query_id").cast("long"),
            F.coalesce("overlap3", F.lit(0)).cast("long").alias("overlap3"),
        )
        .orderBy("query_id")
    )


def _int8_recall_sql() -> str:
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {expr}), "
        "(acc{v}, t{v}) -> acc{v} + t{v})"
    )
    dot = fold.format(
        expr="list_transform(range(1, len(a.v) + 1), k -> a.v[k] * b.v[k])", v="d"
    )
    n1 = fold.format(expr="list_transform(a.v, e1 -> e1 * e1)", v="n1")
    n2 = fold.format(expr="list_transform(b.v, e2 -> e2 * e2)", v="n2")
    top3 = f"""
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
           ({dot}) / (SQRT({n1}) * SQRT({n2})) DESC, b.vec_id) AS rn
  FROM {{src}} a JOIN {{src}} b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 20"""
    return f"""
WITH fullv AS (SELECT vec_id,
        list_transform(range(1, 65), q -> CAST(embedding[q] AS DOUBLE)) AS v
      FROM embeddings),
x AS (SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
dims AS (SELECT pos, MIN(x) AS mn,
                CASE WHEN MAX(x) = MIN(x) THEN 1.0
                     ELSE (MAX(x) - MIN(x)) / 255.0 END AS scale
         FROM x GROUP BY pos),
dqrows AS (SELECT vec_id, pos,
             mn + LEAST(255, GREATEST(0,
               CAST(FLOOR((x.x - mn) / scale + 0.5) AS BIGINT))) * scale AS dqv
           FROM x JOIN dims USING (pos)),
dq AS (SELECT vec_id, list(dqv ORDER BY pos) AS v FROM dqrows GROUP BY vec_id),
ft AS (SELECT query_id, neighbor_id FROM ({top3.format(src='fullv')}) WHERE rn <= 3),
qt AS (SELECT query_id, neighbor_id FROM ({top3.format(src='dq')}) WHERE rn <= 3),
ov AS (SELECT ft.query_id, COUNT(*) AS overlap3
       FROM ft JOIN qt ON qt.query_id = ft.query_id
                      AND qt.neighbor_id = ft.neighbor_id
       GROUP BY ft.query_id)
SELECT q.query_id, CAST(COALESCE(ov.overlap3, 0) AS BIGINT) AS overlap3
FROM (SELECT DISTINCT query_id FROM ft) q
LEFT JOIN ov ON ov.query_id = q.query_id
ORDER BY q.query_id
"""


def q_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week revenue seasonality profile: per ISO weekday, day
    count, exact total cents, integer mean, and the seasonal index
    (share vs uniform, exact ppm via total·7·10⁶ DIV grand) — the
    seasonal-profile companion to `hourly_anomaly` (level shifts) /
    `cusum_hourly` (changepoints) / `ewma_forecast` (trend).  Weekday
    is Monday-based 1..7 on both engines (Spark weekday()+1 == DuckDB
    isodow); one distributed day aggregate, then a 7-row rollup."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    per = daily.groupBy((F.weekday("day") + F.lit(1)).alias("dow")).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    grand = F.sum("total_cents").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        per.withColumn("grand", grand)
        .select(
            F.col("dow").cast("long"),
            "n_days",
            "total_cents",
            F.expr("total_cents DIV n_days").cast("long").alias("mean_cents"),
            F.expr("total_cents * 7 * 1000000 DIV grand").cast("long").alias(
                "idx_ppm"
            ),
        )
        .orderBy("dow")
    )


_SEASONALITY_DOW_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
per AS (
  SELECT isodow(day) AS dow, COUNT(*) AS n_days, SUM(cents) AS total_cents
  FROM daily GROUP BY 1),
g AS (SELECT SUM(total_cents) AS grand FROM per)
SELECT CAST(dow AS BIGINT) AS dow, CAST(n_days AS BIGINT) AS n_days,
       CAST(total_cents AS BIGINT) AS total_cents,
       CAST(total_cents // n_days AS BIGINT) AS mean_cents,
       CAST(total_cents * 7 * 1000000 // g.grand AS BIGINT) AS idx_ppm
FROM per CROSS JOIN g ORDER BY dow
"""


ORACLES.update(
    {
        "int8_recall": _int8_recall_sql(),
        "seasonality_dow": _SEASONALITY_DOW_SQL,
    }
)
QUERIES.update(
    {
        "int8_recall": q_int8_recall,
        "seasonality_dow": q_seasonality_dow,
    }
)


def q_wilson_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-sample-aware part ranking by return rate: the Wilson score
    95% LOWER bound on p(returnflag = 'R') per part — the
    "sort by rating" correction (a 1/1 part must not outrank a 45/50
    one, which the raw ratio does).  n and k are exact integers; the
    bound is ONE identically-written double expression on them, and the
    ranking is on the 7-dp ROUNDED bound with part-id tie-break (the
    adamic_adar ordering lesson).  Top-50; one groupBy, no joins."""
    li = load_table(spark, "lineitem", sf_dir)
    g = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).cast("long").alias("k"),
    )
    z2 = 3.8415  # z^2 at 95% (1.96^2), exact decimal literal both engines
    nn = F.col("n").cast("double")
    p = F.col("k").cast("double") / nn
    lb = (
        p
        + F.lit(z2) / (F.lit(2.0) * nn)
        - F.sqrt(
            F.lit(z2)
            * (p * (F.lit(1.0) - p) + F.lit(z2) / (F.lit(4.0) * nn))
            / nn
        )
    ) / (F.lit(1.0) + F.lit(z2) / nn)
    scored = g.select("part", "n", "k", F.round(lb, 7).alias("wilson_lb_r"))
    w = Window.orderBy(F.desc("wilson_lb_r"), F.asc("part"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("part", "n", "k", "wilson_lb_r", F.col("rn").cast("long"))
        .orderBy("rn")
    )


_WILSON_RETURNS_SQL = """
WITH g AS (
  SELECT l_partkey AS part, COUNT(*) AS n,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS k
  FROM lineitem GROUP BY 1),
scored AS (
  SELECT part, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
         ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                + 3.8415 / (2.0 * CAST(n AS DOUBLE))
                - SQRT(3.8415 * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        + 3.8415 / (4.0 * CAST(n AS DOUBLE)))
                       / CAST(n AS DOUBLE)))
               / (1.0 + 3.8415 / CAST(n AS DOUBLE)), 7) AS wilson_lb_r
  FROM g),
ranked AS (
  SELECT part, n, k, wilson_lb_r,
         ROW_NUMBER() OVER (ORDER BY wilson_lb_r DESC, part) AS rn
  FROM scored)
SELECT CAST(part AS BIGINT) AS part, n, k, wilson_lb_r, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 50 ORDER BY rn
"""


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on monthly revenue: S =
    Σ_{i<j} sign(x_j − x_i) over the ordered month series — EXACT
    integers end-to-end (revenue in cents, S from a bounded month×month
    pair join, tie-corrected variance from integer tie-group counts);
    the z statistic is one final double expression, 6-dp rounded.  The
    principled "is revenue actually trending" answer beside
    `revenue_mom`'s raw deltas; everything runs on the ≤ ~100-row
    month table."""
    o = load_table(spark, "orders", sf_dir)
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    s = (
        a.join(b, F.col("a.m") < F.col("b.m"))
        .agg(
            F.sum(F.signum(F.col("b.cents") - F.col("a.cents")).cast("long"))
            .cast("long")
            .alias("s"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    nrow = monthly.agg(F.count("*").cast("long").alias("n"))
    ties = (
        monthly.groupBy("cents")
        .agg(F.count("*").cast("long").alias("t"))
        .where(F.col("t") >= 2)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    out = s.crossJoin(nrow).crossJoin(ties)
    var18 = (
        F.col("n") * (F.col("n") - 1) * (F.lit(2) * F.col("n") + 5)
        - F.col("tie_term")
    ).cast("long")
    sd = F.col("s").cast("double")
    z = F.when(F.col("s") > 0, (sd - F.lit(1.0)))\
        .when(F.col("s") < 0, (sd + F.lit(1.0)))\
        .otherwise(F.lit(0.0)) / F.sqrt(var18.cast("double") / F.lit(18.0))
    return out.select(
        "n",
        "n_pairs",
        "s",
        var18.alias("var18"),
        F.round(z, 6).alias("z_r"),
    )


_MANN_KENDALL_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
s AS (SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM monthly a JOIN monthly b ON a.m < b.m),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly),
ties AS (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                 AS tie_term
         FROM (SELECT COUNT(*) AS t FROM monthly GROUP BY cents
               HAVING COUNT(*) >= 2) z)
SELECT nn.n, s.n_pairs, s.s,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS BIGINT)
         AS var18,
       ROUND((CASE WHEN s.s > 0 THEN CAST(s.s AS DOUBLE) - 1.0
                   WHEN s.s < 0 THEN CAST(s.s AS DOUBLE) + 1.0
                   ELSE 0.0 END)
             / SQRT(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
                    AS DOUBLE) / 18.0), 6) AS z_r
FROM s CROSS JOIN nn CROSS JOIN ties
"""


ORACLES.update(
    {
        "wilson_returns": _WILSON_RETURNS_SQL,
        "mann_kendall": _MANN_KENDALL_SQL,
    }
)
QUERIES.update(
    {
        "wilson_returns": q_wilson_returns,
        "mann_kendall": q_mann_kendall,
    }
)


_CLIQUE_KMAX = 6


def q_clique_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-clique census (k = 2..6) of the weight-≥2 co-order
    backbone — the clique number ω is the largest k with a nonzero
    count (measured: ω = 5 at sf0.001, 3 at sf0.01), the dense-core
    readout beside `k4_cliques`/`truss_components`.  Enumeration is the
    ORDERED extension on canonical (src < dst) edges: a (k+1)-clique is
    a k-clique (v₁<…<v_k) plus a neighbor of v_k adjacent to every vᵢ
    — each clique generated exactly once, per-level fan-out bounded by
    the last vertex's forward degree (Chiba-Nishizeki discipline; the
    backbone screen keeps level sizes tiny — at corpus scale run the
    census after exactly this kind of weight/truss screen)."""
    sub = _w2_backbone(spark, sf_dir).localCheckpoint(eager=True)
    rows = [(2, sub.count())]
    cur = sub.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    k = 2
    while k < _CLIQUE_KMAX:
        ext = cur.join(
            sub.select(F.col("src").alias(f"v{k}"), F.col("dst").alias(f"v{k + 1}")),
            f"v{k}",
        )
        for i in range(1, k):
            ext = ext.join(
                sub.select(
                    F.col("src").alias(f"v{i}"), F.col("dst").alias(f"v{k + 1}")
                ),
                [f"v{i}", f"v{k + 1}"],
                "left_semi",
            )
        cur = ext.select(*[f"v{i}" for i in range(1, k + 2)]).localCheckpoint(
            eager=True
        )
        k += 1
        n = cur.count()
        rows.append((k, n))
        if n == 0:
            break
    for kk in range(k + 1, _CLIQUE_KMAX + 1):
        rows.append((kk, 0))
    return spark.createDataFrame(rows, "k long, n_cliques long").orderBy("k")


def _clique_census_sql() -> str:
    parts = [_W2_BACKBONE_SQL.strip()]
    parts.append("c2 AS MATERIALIZED (SELECT src AS v1, dst AS v2 FROM sub)")
    selects = ["SELECT 2 AS k, (SELECT CAST(COUNT(*) AS BIGINT) FROM c2) AS n_cliques"]
    for k in range(2, _CLIQUE_KMAX):
        vs = ", ".join(f"t.v{i}" for i in range(1, k + 1))
        exists = " AND ".join(
            f"EXISTS (SELECT 1 FROM sub e{i} WHERE e{i}.src = t.v{i} "
            f"AND e{i}.dst = s.dst)"
            for i in range(1, k)
        )
        where = f"WHERE {exists}" if exists else ""
        parts.append(
            f"c{k + 1} AS MATERIALIZED (SELECT {vs}, s.dst AS v{k + 1} "
            f"FROM c{k} t JOIN sub s ON s.src = t.v{k} {where})"
        )
        selects.append(
            f"SELECT {k + 1} AS k, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM c{k + 1}) AS n_cliques"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY k"
    )


ORACLES.update({"clique_census": _clique_census_sql()})
QUERIES.update({"clique_census": q_clique_census})


def q_biconnected_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biconnected components of the weight-≥2 co-order backbone
    (pregel.biconnected_components) — the block decomposition
    completing the connectivity family (`two_edge_cc` = bridges,
    `articulation_pts` = cut vertices): per block, its edge count,
    vertex count, and the bridge flag (a 1-edge block IS a bridge).
    Inside a block no single vertex failure disconnects; blocks
    overlap exactly at articulation points.  The backbone is capped at
    part ids < 1000 (the keyed min-label state is Σ_v |comp(v)|·labels
    — ~12M rows uncapped at sf0.01, which busts a default 1 GB driver;
    the cap keeps it < 1M while the label structure stays rich: same
    bounded-subgraph discipline as `graph_center`)."""
    sub = _w2_backbone(spark, sf_dir, part_cap=1000)
    out, stats = pregel.biconnected_components(sub)
    if not stats.converged:
        raise RuntimeError("biconnected label propagation did not converge")
    ends = (
        out.select("block", F.explode(F.array("a", "b")).alias("v"))
        .distinct()
        .groupBy("block")
        .agg(F.count("*").cast("long").alias("n_vertices"))
    )
    per = out.groupBy("block").agg(F.count("*").cast("long").alias("n_edges"))
    return (
        per.join(ends, "block")
        .select(
            F.col("block").cast("long"),
            "n_edges",
            "n_vertices",
            (F.col("n_edges") == 1).alias("is_bridge"),
        )
        .orderBy("block")
    )


_BICONNECTED_SQL = f"""
WITH RECURSIVE {_W2_BACKBONE_SQL.strip()},
subc AS MATERIALIZED (SELECT src, dst FROM sub WHERE src < 1000 AND dst < 1000),
e AS MATERIALIZED (SELECT src, dst FROM subc UNION ALL SELECT dst, src FROM subc),
-- multi-seed min-label: every neighbor x of v seeds G - v with label x
r(v, u, lab) AS (
  SELECT src, dst, dst FROM e
  UNION
  SELECT r.v, e.dst, r.lab FROM r JOIN e ON e.src = r.u WHERE e.dst <> r.v),
lmin AS MATERIALIZED (SELECT v, u, MIN(lab) AS lab FROM r GROUP BY v, u),
labx AS MATERIALIZED (
  SELECT e.src AS v, e.dst AS x, lmin.lab
  FROM e JOIN lmin ON lmin.v = e.src AND lmin.u = e.dst),
reps AS (SELECT v, lab, MIN(x) AS minx FROM labx GROUP BY v, lab),
links AS (
  SELECT LEAST(l.v, l.x) * 2097152 + GREATEST(l.v, l.x) AS src,
         LEAST(l.v, rp.minx) * 2097152 + GREATEST(l.v, rp.minx) AS dst
  FROM labx l JOIN reps rp ON rp.v = l.v AND rp.lab = l.lab
  WHERE LEAST(l.v, l.x) * 2097152 + GREATEST(l.v, l.x)
        <> LEAST(l.v, rp.minx) * 2097152 + GREATEST(l.v, rp.minx)),
le AS MATERIALIZED (SELECT src, dst FROM links
      UNION SELECT dst, src FROM links),
ek AS (SELECT src, dst, src * 2097152 + dst AS key FROM subc),
reach(id, comp) AS (
  SELECT key, key FROM ek
  UNION
  SELECT le.dst, reach.comp FROM reach JOIN le ON le.src = reach.id
  WHERE reach.comp < le.dst),
c AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
member AS (SELECT ek.src, ek.dst, c.comp AS block
           FROM ek JOIN c ON c.id = ek.key),
ends AS (SELECT block, COUNT(DISTINCT v) AS n_vertices FROM (
           SELECT block, src AS v FROM member
           UNION ALL SELECT block, dst FROM member) z GROUP BY block)
SELECT CAST(m.block AS BIGINT) AS block,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(MAX(ends.n_vertices) AS BIGINT) AS n_vertices,
       COUNT(*) = 1 AS is_bridge
FROM member m JOIN ends ON ends.block = m.block
GROUP BY m.block ORDER BY m.block
"""


ORACLES.update({"biconnected_blocks": _BICONNECTED_SQL})
QUERIES.update({"biconnected_blocks": q_biconnected_blocks})


# ---------------------------------------------------------------------------
# Session-17 batch A: estimation / smoothing / feature-hashing audits.


_KMV_K = 64


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.
    RANDOM'02; the DataSketches theta-sketch core) for users per event
    type — the order-statistics complement of `hll_users` on the same
    grouping, sharing its replayable xorshift hash family.  The sketch
    state per group is the K smallest distinct hash values (mergeable
    by union+trim, the shard-combine at 100 TB); the estimator is
    (K−1)·2³¹ / h_(K), or the exact distinct-hash count below
    saturation.  One distinct + one bounded window — no per-key state
    beyond K values."""
    ev = load_table(spark, "events", sf_dir)
    x0 = (F.col("user_id") * F.lit(2654435761) + F.lit(1000003)) % F.lit(2147483648)
    h0 = ev.select(
        F.col("event_type").alias("grp"),
        x0.cast("long").alias("x0"),
    )
    h1 = h0.select(
        "grp",
        (
            (F.col("x0").bitwiseXOR(F.shiftright("x0", 13)) * F.lit(1274126177))
            % F.lit(2147483648)
        ).alias("x1"),
    )
    h = h1.select(
        "grp", F.col("x1").bitwiseXOR(F.shiftright("x1", 17)).alias("h")
    ).dropDuplicates(["grp", "h"])
    wk = Window.partitionBy("grp").orderBy("h")
    topk = h.withColumn("rnk", F.row_number().over(wk)).where(F.col("rnk") <= _KMV_K)
    per = topk.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_min"),
        F.max("h").cast("long").alias("kth"),
    )
    tot = h.groupBy("grp").agg(F.count("*").cast("long").alias("n_hashes"))
    exact = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return (
        per.join(tot, "grp")
        .join(exact, "grp")
        .select(
            "grp",
            "n_users",
            "n_hashes",
            F.when(F.col("n_min") < _KMV_K, F.lit(0))
            .otherwise(F.col("kth"))
            .cast("long")
            .alias("kth_min"),
            F.when(F.col("n_min") < _KMV_K, F.col("n_hashes").cast("double"))
            .otherwise(
                F.round(
                    F.lit(float((_KMV_K - 1) * 2147483648))
                    / F.col("kth").cast("double"),
                    4,
                )
            )
            .alias("est"),
        )
        .orderBy("grp")
    )


_KMV_SQL = f"""
WITH h0 AS (SELECT event_type AS grp,
                   (user_id * 2654435761 + 1000003) % 2147483648 AS x0
            FROM events),
h1 AS (SELECT grp, (xor(x0, x0 >> 13) * 1274126177) % 2147483648 AS x1 FROM h0),
h AS (SELECT DISTINCT grp, xor(x1, x1 >> 17) AS h FROM h1),
rk AS (SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rnk FROM h),
per AS (SELECT grp, COUNT(*) AS n_min, MAX(h) AS kth
        FROM rk WHERE rnk <= {_KMV_K} GROUP BY grp),
tot AS (SELECT grp, COUNT(*) AS n_hashes FROM h GROUP BY grp),
exact AS (SELECT event_type AS grp, COUNT(DISTINCT user_id) AS n_users
          FROM events GROUP BY event_type)
SELECT per.grp, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_hashes AS BIGINT) AS n_hashes,
       CAST(CASE WHEN n_min < {_KMV_K} THEN 0 ELSE kth END AS BIGINT) AS kth_min,
       CASE WHEN n_min < {_KMV_K} THEN CAST(n_hashes AS DOUBLE)
            ELSE ROUND(CAST({float((_KMV_K - 1) * 2147483648)!r} AS DOUBLE)
                       / CAST(kth AS DOUBLE), 4) END AS est
FROM per JOIN tot ON tot.grp = per.grp JOIN exact ON exact.grp = per.grp
ORDER BY per.grp
"""


def q_gt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus word-3-gram
    occurrence counts (Gale & Sampson'95 without the regression arm —
    the raw Turing estimates for the reliable low-r region; unigrams
    are useless here: the synthetic vocabulary is 31 types with min
    count 26, so the mass sits in 3-gram contexts): frequency-of-
    frequencies N_r for r = 1..6, the adjusted count
    r* = (r+1)·N_{r+1}/N_r in exact integer micro-units, and the r = 0
    row carrying the unseen-mass estimate P₀ = N₁/N.  Two integer
    groupBys over the gram-frequency table (corpus-size invariant
    ≤7-row output — at 100 TB it is the same reduction off the n-gram
    count table every LM pipeline already materializes)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("i", "w")
    )
    a, b, c = toks.alias("a"), toks.alias("b"), toks.alias("c")
    grams = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id")) & (F.col("b.i") == F.col("a.i") + 1),
        )
        .join(
            c,
            (F.col("c.doc_id") == F.col("a.doc_id")) & (F.col("c.i") == F.col("a.i") + 2),
        )
        .select(F.concat_ws(" ", F.col("a.w"), F.col("b.w"), F.col("c.w")).alias("tok"))
    )
    counts = grams.groupBy("tok").agg(F.count("*").cast("long").alias("r"))
    toks = grams
    fof = counts.groupBy("r").agg(F.count("*").cast("long").alias("n_r"))
    w = Window.orderBy("r")
    star = (
        fof.withColumn("r_next", F.lead("r").over(w))
        .withColumn("n_next", F.lead("n_r").over(w))
        .where(F.col("r") <= 6)
        .select(
            "r",
            "n_r",
            F.when(
                (F.col("r_next") == F.col("r") + 1) & (F.col("n_r") > 0),
                F.expr("(r + 1) * n_next * 1000000 DIV n_r"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("r_star_micro"),
        )
    )
    totals = toks.agg(F.count("*").cast("long").alias("n_tokens")).crossJoin(
        counts.where(F.col("r") == 1).agg(F.count("*").cast("long").alias("n1"))
    )
    zero = totals.select(
        F.lit(0).cast("long").alias("r"),
        F.col("n_tokens").alias("n_r"),
        F.expr("n1 * 1000000 DIV n_tokens").cast("long").alias("r_star_micro"),
    )
    return zero.unionByName(star).orderBy("r")


_GT_SQL = """
WITH toks AS (SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(TRIM(text), '\\s+'), 1) AS i,
                     UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS w
              FROM documents),
tk AS (SELECT a.w || ' ' || b.w || ' ' || c.w AS tok
       FROM toks a
       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
counts AS (SELECT tok, COUNT(*) AS r FROM tk GROUP BY tok),
fof AS (SELECT r, COUNT(*) AS n_r FROM counts GROUP BY r),
star AS (
  SELECT r, n_r,
         LEAD(r) OVER (ORDER BY r) AS r_next,
         LEAD(n_r) OVER (ORDER BY r) AS n_next
  FROM fof),
rows_r AS (
  SELECT CAST(r AS BIGINT) AS r, CAST(n_r AS BIGINT) AS n_r,
         CAST(CASE WHEN r_next = r + 1 AND n_r > 0
                   THEN (r + 1) * n_next * 1000000 // n_r
                   ELSE 0 END AS BIGINT) AS r_star_micro
  FROM star WHERE r <= 6),
zero AS (
  SELECT CAST(0 AS BIGINT) AS r,
         CAST((SELECT COUNT(*) FROM tk) AS BIGINT) AS n_r,
         CAST((SELECT COUNT(*) FROM counts WHERE r = 1) * 1000000
              // (SELECT COUNT(*) FROM tk) AS BIGINT) AS r_star_micro)
SELECT * FROM zero UNION ALL SELECT * FROM rows_r ORDER BY r
"""


_FH_BUCKETS = 1024


def q_feature_hash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit (Weinberger et al. ICML'09): the
    corpus 3-gram vocabulary with df ≥ 2 hashed into 1024 feature
    buckets via the replayable polynomial char hash; output is the
    bucket-load histogram (load → #buckets) with the corpus-level
    collision rate — colliding feature pairs over all vocabulary
    pairs, in ppm — on every row.  This is the audit a 100-TB
    featurizer runs before fixing its hash width: the histogram is
    bucket-bounded (≤1024 rows) no matter the vocabulary size, and df
    screening keeps hapax noise out of the load estimate."""
    from polar_spark.operators.dedup import polyhash

    docs = load_table(spark, "documents", sf_dir)
    dt = doc_trigrams(docs).select("doc_id", F.col("g").alias("tok"))
    vocab = (
        dt.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= 2)
        .select("tok", (polyhash(F.col("tok")) % F.lit(_FH_BUCKETS)).alias("bucket"))
    )
    loads = vocab.groupBy("bucket").agg(F.count("*").cast("long").alias("load"))
    hist = loads.groupBy("load").agg(F.count("*").cast("long").alias("n_buckets"))
    tot = loads.agg(
        F.sum("load").cast("long").alias("n_tokens"),
        F.sum(F.expr("load * (load - 1) DIV 2")).cast("long").alias("coll_pairs"),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "load",
            "n_buckets",
            "n_tokens",
            F.expr(
                "CASE WHEN n_tokens > 1 THEN coll_pairs * 1000000"
                " DIV (n_tokens * (n_tokens - 1) DIV 2) ELSE 0 END"
            )
            .cast("long")
            .alias("collision_ppm"),
        )
        .orderBy("load")
    )


def _feature_hash_sql() -> str:
    from polar_spark.operators.dedup import _polyhash_sql

    return f"""
WITH toks AS (SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(TRIM(text), '\\s+'), 1) AS i,
                     UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS w
              FROM documents),
dt AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS tok
       FROM toks a
       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
vocab AS (SELECT tok, {_polyhash_sql('tok')} % {_FH_BUCKETS} AS bucket
          FROM dt GROUP BY tok HAVING COUNT(*) >= 2),
loads AS (SELECT bucket, COUNT(*) AS load FROM vocab GROUP BY bucket),
hist AS (SELECT load, COUNT(*) AS n_buckets FROM loads GROUP BY load),
tot AS (SELECT SUM(load) AS n_tokens,
               SUM(load * (load - 1) // 2) AS coll_pairs FROM loads)
SELECT CAST(load AS BIGINT) AS load, CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(CASE WHEN n_tokens > 1 THEN coll_pairs * 1000000
                 // (n_tokens * (n_tokens - 1) // 2) ELSE 0 END AS BIGINT)
         AS collision_ppm
FROM hist CROSS JOIN tot ORDER BY load
"""


ORACLES.update(
    {
        "kmv_distinct": _KMV_SQL,
        "gt_smoothing": _GT_SQL,
        "feature_hash_audit": _feature_hash_sql(),
    }
)
QUERIES.update(
    {
        "kmv_distinct": q_kmv_distinct,
        "gt_smoothing": q_gt_smoothing,
        "feature_hash_audit": q_feature_hash_audit,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch B: time-series statistics (autocorrelation, Pettitt
# changepoint, two-group log-rank survival test).


def q_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily revenue series at lags 1..7 (the
    weekly-structure diagnostic ahead of any forecasting model):
    Pearson r over calendar-matched day pairs (d, d+lag), both days
    present.  Exactness: daily revenue rides exact integer kilodollars
    (cents DIV 100000 — cents = CAST(ROUND(price·100)), the q1_pricing
    discipline; kilodollars keep nΣx² ≪ 2⁶³ at any sf where dollars
    would overflow the BIGINT guard), all five Pearson sufficient statistics are
    BIGINT sums, and the final r is one double expression with
    identical operand order in both engines, rounded to 6 dp.  The
    pair join is calendar-bounded (≤ #days rows) regardless of order
    volume — the hourly_anomaly posture."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("d"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100000").alias("x"),
        )
        .groupBy("d")
        .agg(F.sum("x").cast("long").alias("x"))
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("d"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.col("d") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("xa").cast("long").alias("sx"),
            F.sum("xb").cast("long").alias("sy"),
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
            F.sum(F.col("xa") * F.col("xa")).cast("long").alias("sxx"),
            F.sum(F.col("xb") * F.col("xb")).cast("long").alias("syy"),
        )
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    return pairs.select(
        F.col("lag").cast("long"),
        "n_pairs",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                (
                    F.col("n_pairs").cast("double") * F.col("sxy").cast("double")
                    - F.col("sx").cast("double") * F.col("sy").cast("double")
                )
                / F.sqrt(
                    (
                        F.col("n_pairs").cast("double") * F.col("sxx").cast("double")
                        - F.col("sx").cast("double") * F.col("sx").cast("double")
                    )
                    * (
                        F.col("n_pairs").cast("double") * F.col("syy").cast("double")
                        - F.col("sy").cast("double") * F.col("sy").cast("double")
                    )
                ),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("acf_r"),
    ).orderBy("lag")


_REVENUE_ACF_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000) AS x
  FROM orders GROUP BY 1),
lags AS (SELECT UNNEST(range(1, 8)) AS lag),
pairs AS (
  SELECT lag, COUNT(*) AS n_pairs,
         SUM(a.x) AS sx, SUM(b.x) AS sy,
         SUM(a.x * b.x) AS sxy, SUM(a.x * a.x) AS sxx, SUM(b.x * b.x) AS syy
  FROM lags, daily a JOIN daily b ON b.d = a.d + lag
  GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf_r
FROM pairs ORDER BY lag
"""


def q_pettitt_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test (Pettitt'79, the standard nonparametric
    single-changepoint detector for hydrology/KPI series) on the daily
    order-count series: U_t = Σ_{i≤t} r_i − t(n+1) in DOUBLED rank
    units (average ranks with ties are half-integers; doubling keeps
    the whole statistic BIGINT-exact — r2 = 2·RANK + ties − 1), the
    test statistic K = max|U_t|, and the changepoint flag where the
    maximum is attained.  One rank window + one prefix sum over the
    calendar-bounded daily table."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("x"))
    )
    wr = Window.orderBy("x")
    wt = Window.partitionBy("x")
    ranked = daily.select(
        "d",
        "x",
        (2 * F.rank().over(wr) + F.count("*").over(wt) - 1).cast("long").alias("r2"),
    )
    n = ranked.agg(F.count("*").cast("long").alias("n"))
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wt_idx = Window.orderBy("d")
    cum = ranked.crossJoin(F.broadcast(n)).select(
        "d",
        "x",
        (
            F.sum("r2").over(wd) - F.row_number().over(wt_idx) * (F.col("n") + 1)
        ).cast("long").alias("u2"),
    )
    return cum.select(
        "d",
        "x",
        "u2",
        F.max(F.abs("u2")).over(wall).cast("long").alias("k2"),
        (F.abs("u2") == F.max(F.abs("u2")).over(wall)).alias("is_change_point"),
    ).orderBy("d")


_PETTITT_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
         COUNT(*) AS x
  FROM orders GROUP BY 1),
ranked AS (
  SELECT d, x,
         2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1 AS r2
  FROM daily),
n AS (SELECT COUNT(*) AS n FROM ranked),
cum AS (
  SELECT d, x,
         SUM(r2) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
           - ROW_NUMBER() OVER (ORDER BY d) * ((SELECT n FROM n) + 1) AS u2
  FROM ranked)
SELECT CAST(d AS BIGINT) AS d, CAST(x AS BIGINT) AS x, CAST(u2 AS BIGINT) AS u2,
       CAST(MAX(ABS(u2)) OVER () AS BIGINT) AS k2,
       ABS(u2) = MAX(ABS(u2)) OVER () AS is_change_point
FROM cum ORDER BY d
"""


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test (Mantel'66) on the kaplan_meier
    time-to-next-order cohort, split by customer-nation parity: at
    each distinct event time, observed group-1 events d1 vs expected
    e1 = d·n1/n under the null, with the hypergeometric variance —
    the statistical completion of the survival family (kaplan_meier
    gives the curves; this says whether they differ).  Every per-time
    term is an exact BIGINT in fixed-point units (e1 in micro-units,
    the variance in milli-units via staged DIV so no product exceeds
    2⁶³ at sf0.1), so the cross-engine sums are bit-identical and the
    final χ² is one double expression over four exact integers."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"),
        (F.col("c_nationkey") % 2 == 0).cast("long").alias("g1"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    staged = (
        o.select("o_custkey", "o_orderdate", nxt.alias("nxt"))
        .crossJoin(F.broadcast(o.agg(F.max("o_orderdate").alias("maxd"))))
        .join(F.broadcast(cust), "o_custkey")
    )
    sub = staged.select(
        F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate"))
        .otherwise(F.datediff("maxd", "o_orderdate"))
        .alias("t"),
        F.col("nxt").isNotNull().cast("long").alias("ev"),
        "g1",
    )
    agg = sub.groupBy("t").agg(
        F.count("*").cast("long").alias("r"),
        F.sum("g1").cast("long").alias("r1"),
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.col("ev") * F.col("g1")).cast("long").alias("d1"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risked = agg.select(
        "t",
        "d",
        "d1",
        (F.sum("r").over(w_all) - F.coalesce(F.sum("r").over(w_prev), F.lit(0)))
        .cast("long")
        .alias("n"),
        (F.sum("r1").over(w_all) - F.coalesce(F.sum("r1").over(w_prev), F.lit(0)))
        .cast("long")
        .alias("n1"),
    ).where(F.col("d") >= 1)
    terms = risked.select(
        "d",
        "d1",
        "n",
        "n1",
        F.expr("d * n1 * 1000000 DIV n").alias("e1_micro"),
        F.expr(
            "CASE WHEN n > 1 THEN (d * (n - d) DIV (n - 1)) * n1 * (n - n1)"
            " * 1000 DIV (n * n) ELSE 0 END"
        ).alias("v_milli"),
    )
    tot = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.max("n1").cast("long").alias("n1"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_micro").cast("long").alias("e1_micro"),
        F.sum("v_milli").cast("long").alias("v_milli"),
    )
    return tot.select(
        "n",
        "n1",
        "o1",
        "e1_micro",
        "v_milli",
        F.round(
            F.pow(
                F.col("o1").cast("double") - F.col("e1_micro").cast("double") / F.lit(1e6),
                F.lit(2.0),
            )
            / (F.col("v_milli").cast("double") / F.lit(1e3)),
            6,
        ).alias("chi2_r"),
    )


_LOGRANK_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders),
mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
cust AS (SELECT c_custkey, CASE WHEN c_nationkey % 2 = 0 THEN 1 ELSE 0 END AS g1
         FROM customer),
sub AS (
  SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', o_orderdate, nxt)
              ELSE date_diff('day', o_orderdate, mx.maxd) END AS t,
         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev,
         cust.g1
  FROM o CROSS JOIN mx JOIN cust ON cust.c_custkey = o.o_custkey),
agg AS (SELECT t, COUNT(*) AS r, SUM(g1) AS r1, SUM(ev) AS d,
               SUM(ev * g1) AS d1
        FROM sub GROUP BY t),
risked AS (
  SELECT t, d, d1,
         SUM(r) OVER () - COALESCE(SUM(r) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
         SUM(r1) OVER () - COALESCE(SUM(r1) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
  FROM agg),
terms AS (
  SELECT d, d1, n, n1,
         d * n1 * 1000000 // n AS e1_micro,
         CASE WHEN n > 1 THEN (d * (n - d) // (n - 1)) * n1 * (n - n1)
                              * 1000 // (n * n) ELSE 0 END AS v_milli
  FROM risked WHERE d >= 1),
tot AS (SELECT MAX(n) AS n, MAX(n1) AS n1, SUM(d1) AS o1,
               SUM(e1_micro) AS e1_micro, SUM(v_milli) AS v_milli
        FROM terms)
SELECT CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n1,
       CAST(o1 AS BIGINT) AS o1, CAST(e1_micro AS BIGINT) AS e1_micro,
       CAST(v_milli AS BIGINT) AS v_milli,
       ROUND(POWER(CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1e6, 2)
             / (CAST(v_milli AS DOUBLE) / 1e3), 6) AS chi2_r
FROM tot
"""


ORACLES.update(
    {
        "revenue_acf": _REVENUE_ACF_SQL,
        "pettitt_change": _PETTITT_SQL,
        "logrank_test": _LOGRANK_SQL,
    }
)
QUERIES.update(
    {
        "revenue_acf": q_revenue_acf,
        "pettitt_change": q_pettitt_change,
        "logrank_test": q_logrank_test,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch C: retrieval/ML evaluation (average precision, linear
# CKA representation similarity, split-conformal p-values).


def q_ap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval #3: average precision at 10 of the BM25
    ranking against the exact boolean-AND relevance set (the mrr_eval
    ground truth; ndcg_eval grades gain placement, AP grades precision
    at every recall step).  For the j-th relevant hit at rank r the
    precision term is ⌊10⁶·j/r⌋; AP@10 = Σterms DIV min(R,10) — all
    BIGINT, so the cross-engine grade is exact.  Same broadcast
    posture as the scorer under audit."""
    from polar_spark.operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    top10 = bm25_topk(docs, qdf)

    qt = qdf.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.trim("qtext"), " "))).alias("term"),
    )
    n_terms = qt.groupBy("query_id").agg(F.count("*").cast("long").alias("n_terms"))
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " "))).alias("term"),
    )
    rel = (
        dt.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("matched"))
        .join(F.broadcast(n_terms), "query_id")
        .where(F.col("matched") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )
    n_rel = rel.groupBy("query_id").agg(F.count("*").cast("long").alias("n_relevant"))
    wj = Window.partitionBy("query_id").orderBy("rnk")
    hits = (
        top10.join(rel, ["query_id", "doc_id"])
        .withColumn("j", F.row_number().over(wj))
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("hits10"),
            F.sum(F.expr("j * 1000000 DIV rnk")).cast("long").alias("terms_sum"),
        )
    )
    base = spark.createDataFrame([(q,) for q, _t in _BM25_QUERIES], "query_id string")
    return (
        base.join(n_rel, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.coalesce("hits10", F.lit(0)).cast("long").alias("hits10"),
            F.expr(
                "CASE WHEN COALESCE(n_relevant, 0) = 0 THEN 0"
                " ELSE COALESCE(terms_sum, 0) DIV LEAST(n_relevant, 10) END"
            )
            .cast("long")
            .alias("ap_ppm"),
        )
        .orderBy("query_id")
    )


def _ap_sql(k1: float = 1.2, b: float = 0.75, scale: int = 1_000_000) -> str:
    bm25 = _bm25_sql(k1, b, scale)
    body = bm25.strip()
    assert body.startswith("WITH ")
    inner = body[len("WITH ") :]
    head, _select = inner.rsplit("SELECT query_id,", 1)
    return f"""
WITH {head.rstrip()},
top10 AS (SELECT query_id, CAST(_id AS BIGINT) AS doc_id, rnk
          FROM ranked WHERE rnk <= 10),
nt AS (SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
       FROM qt GROUP BY query_id),
rel AS (SELECT qt.query_id, toks._id AS doc_id
        FROM (SELECT DISTINCT _id, term FROM toks) toks
        JOIN qt ON qt.term = toks.term
        JOIN nt ON nt.query_id = qt.query_id
        GROUP BY qt.query_id, toks._id, nt.n_terms
        HAVING COUNT(DISTINCT toks.term) = nt.n_terms),
n_rel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
          FROM rel GROUP BY query_id),
hit AS (SELECT t.query_id, t.rnk,
               ROW_NUMBER() OVER (PARTITION BY t.query_id ORDER BY t.rnk) AS j
        FROM top10 t JOIN rel r ON r.query_id = t.query_id
                               AND r.doc_id = t.doc_id),
hits AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS hits10,
                SUM(j * 1000000 // rnk) AS terms_sum
         FROM hit GROUP BY query_id)
SELECT q.query_id,
       CAST(COALESCE(n_rel.n_relevant, 0) AS BIGINT) AS n_relevant,
       CAST(COALESCE(hits.hits10, 0) AS BIGINT) AS hits10,
       CAST(CASE WHEN COALESCE(n_rel.n_relevant, 0) = 0 THEN 0
                 ELSE COALESCE(hits.terms_sum, 0)
                      // LEAST(n_rel.n_relevant, 10) END AS BIGINT) AS ap_ppm
FROM q LEFT JOIN n_rel ON n_rel.query_id = q.query_id
       LEFT JOIN hits ON hits.query_id = q.query_id
ORDER BY q.query_id
"""


def q_cka_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (Kornblith et al. ICML'19) between the two halves of
    the embedding space (dims 0..31 as view X vs 32..63 as view Y) —
    the standard representation-similarity score used to compare
    layers/checkpoints: CKA = ‖C_xy‖²_F / (‖C_xx‖_F·‖C_yy‖_F) over
    centered cross-covariance blocks.  The covariance entries are the
    pca_power3/embed_covariance reduction (one groupBy over posexploded
    (i, j) pairs) PINNED by 6-dp rounding before the Frobenius sums, so
    the cross-engine block norms agree bit-for-bit at the rounded
    grid.  At 100 TB the whole computation is one d²-bounded aggregate
    — data never shuffles, only the 64×64 matrix does."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()
    ij = (
        emb.select(F.posexplode("v").alias("i", "x"), F.col("v").alias("v2"))
        .select("i", "x", F.posexplode("v2").alias("j", "y"))
        .where(F.col("i") <= F.col("j"))
    )
    cov_u = ij.groupBy("i", "j").agg(
        F.round(
            (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.lit(float(n)))
            / F.lit(float(n - 1)),
            6,
        ).alias("c")
    )
    cmat = cov_u.unionByName(
        cov_u.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    )
    h = 32
    blocks = cmat.select(
        "c",
        F.when((F.col("i") < h) & (F.col("j") < h), F.lit("xx"))
        .when((F.col("i") >= h) & (F.col("j") >= h), F.lit("yy"))
        .otherwise(F.lit("xy"))
        .alias("blk"),
    )
    sums = blocks.groupBy("blk").agg(F.sum(F.col("c") * F.col("c")).alias("s2"))
    piv = sums.groupBy().pivot("blk", ["xx", "yy", "xy"]).agg(F.first("s2"))
    return piv.select(
        F.lit(n).cast("long").alias("n"),
        F.round(F.col("xy"), 6).alias("fro2_xy"),
        F.round(F.col("xx"), 6).alias("fro2_xx"),
        F.round(F.col("yy"), 6).alias("fro2_yy"),
        F.round(
            F.col("xy") / F.sqrt(F.col("xx") * F.col("yy")), 6
        ).alias("cka_r"),
    )


_CKA_SQL = """
WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT COUNT(*)::DOUBLE AS n FROM emb),
ij AS (SELECT i - 1 AS i, j - 1 AS j, v[i] AS x, v[j] AS y
       FROM emb, unnest(range(1, len(v) + 1)) u(i), unnest(range(1, len(v) + 1)) w(j)
       WHERE i <= j),
cov_u AS MATERIALIZED (
  SELECT i, j,
         ROUND((SUM(x * y) - SUM(x) * SUM(y) / (SELECT n FROM n))
               / ((SELECT n FROM n) - 1), 6) AS c
  FROM ij GROUP BY i, j),
cmat AS (SELECT i, j, c FROM cov_u
         UNION ALL SELECT j, i, c FROM cov_u WHERE i < j),
blocks AS (
  SELECT c, CASE WHEN i < 32 AND j < 32 THEN 'xx'
                 WHEN i >= 32 AND j >= 32 THEN 'yy'
                 ELSE 'xy' END AS blk
  FROM cmat),
sums AS (SELECT blk, SUM(c * c) AS s2 FROM blocks GROUP BY blk)
SELECT CAST((SELECT COUNT(*) FROM emb) AS BIGINT) AS n,
       ROUND((SELECT s2 FROM sums WHERE blk = 'xy'), 6) AS fro2_xy,
       ROUND((SELECT s2 FROM sums WHERE blk = 'xx'), 6) AS fro2_xx,
       ROUND((SELECT s2 FROM sums WHERE blk = 'yy'), 6) AS fro2_yy,
       ROUND((SELECT s2 FROM sums WHERE blk = 'xy')
             / SQRT((SELECT s2 FROM sums WHERE blk = 'xx')
                    * (SELECT s2 FROM sums WHERE blk = 'yy')), 6) AS cka_r
"""


def q_conformal_pvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal label-conditional p-values (Vovk et al.; the
    distribution-free uncertainty layer production classifiers bolt
    on): calibration = even vec_ids, nonconformity = 1 − cos(x,
    centroid of own label) against centroids fit on calibration only
    (PINNED at 6 dp, the pca discipline), test panel = vec_id % 50
    == 1.  p = (1 + #{calib same-label scores ≥ s_test}) / (n_L + 1)
    in exact ppm — the count compares 6-dp-rounded scores so the
    cross-engine rank cannot sit on an ulp.  The calib×test join is
    label-blocked and panel-bounded; at 100 TB the centroids are one
    broadcast and the p-value a per-label rank lookup."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    calib = emb.where(F.col("vec_id") % 2 == 0)
    test = emb.where(F.col("vec_id") % 50 == 1)
    dims = calib.select("label", F.posexplode("v").alias("i", "x"))
    cent = dims.groupBy("label", "i").agg(F.round(F.avg("x"), 6).alias("c"))

    def _score(df: DataFrame) -> DataFrame:
        d = df.select("vec_id", "label", F.posexplode("v").alias("i", "x"))
        return (
            d.join(cent, ["label", "i"])
            .groupBy("vec_id", "label")
            .agg(
                F.round(
                    F.lit(1.0)
                    - F.sum(F.col("x") * F.col("c"))
                    / (
                        F.sqrt(F.sum(F.col("x") * F.col("x")))
                        * F.sqrt(F.sum(F.col("c") * F.col("c")))
                    ),
                    6,
                ).alias("s")
            )
        )

    cs = _score(calib).select(
        F.col("label").alias("lb"), F.col("s").alias("s_cal")
    )
    nl = cs.groupBy("lb").agg(F.count("*").cast("long").alias("n_l"))
    ts = _score(test)
    counted = (
        ts.join(cs, ts["label"] == cs["lb"])
        .groupBy("vec_id", "label", "s")
        .agg(F.sum((F.col("s_cal") >= F.col("s")).cast("long")).alias("ge"))
    )
    return (
        counted.join(nl, counted["label"] == nl["lb"])
        .select(
            "vec_id",
            counted["label"].cast("long").alias("label"),
            F.col("s").alias("score_r"),
            F.expr("(1 + ge) * 1000000 DIV (n_l + 1)").cast("long").alias("p_ppm"),
        )
        .orderBy("vec_id")
    )


_CONFORMAL_SQL = """
WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
calib AS (SELECT * FROM emb WHERE vec_id % 2 = 0),
test AS (SELECT * FROM emb WHERE vec_id % 50 = 1),
cent AS (SELECT label, i - 1 AS i, ROUND(AVG(v[i]), 6) AS c
         FROM calib, unnest(range(1, len(v) + 1)) u(i)
         GROUP BY label, i - 1),
cal_d AS (SELECT vec_id, label, u.i AS i, v[u.i + 1] AS x
          FROM calib, unnest(range(0, len(v))) u(i)),
cal_s AS (
  SELECT d.vec_id, d.label,
         ROUND(1.0 - SUM(d.x * cent.c)
               / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(cent.c * cent.c))), 6) AS s
  FROM cal_d d JOIN cent ON cent.label = d.label AND cent.i = d.i
  GROUP BY d.vec_id, d.label),
test_d AS (SELECT vec_id, label, u.i AS i, v[u.i + 1] AS x
           FROM test, unnest(range(0, len(v))) u(i)),
test_s AS (
  SELECT d.vec_id, d.label,
         ROUND(1.0 - SUM(d.x * cent.c)
               / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(cent.c * cent.c))), 6) AS s
  FROM test_d d JOIN cent ON cent.label = d.label AND cent.i = d.i
  GROUP BY d.vec_id, d.label),
nl AS (SELECT label, COUNT(*) AS n_l FROM cal_s GROUP BY label),
counted AS (
  SELECT t.vec_id, t.label, t.s,
         SUM(CASE WHEN c.s >= t.s THEN 1 ELSE 0 END) AS ge
  FROM test_s t JOIN cal_s c ON c.label = t.label
  GROUP BY t.vec_id, t.label, t.s)
SELECT counted.vec_id, CAST(counted.label AS BIGINT) AS label,
       s AS score_r,
       CAST((1 + ge) * 1000000 // (nl.n_l + 1) AS BIGINT) AS p_ppm
FROM counted JOIN nl ON nl.label = counted.label
ORDER BY counted.vec_id
"""


ORACLES.update(
    {
        "ap_eval": _ap_sql(),
        "cka_views": _CKA_SQL,
        "conformal_pvalues": _CONFORMAL_SQL,
    }
)
QUERIES.update(
    {
        "ap_eval": q_ap_eval,
        "cka_views": q_cka_views,
        "conformal_pvalues": q_conformal_pvalues,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch D: graph structure (Eulerian classification,
# δ-hyperbolicity audit).


def q_euler_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component Eulerian classification of the small-cap co-order
    graph (the route-inspection precondition, and a cheap structural
    fingerprint): component size, edge count, number of odd-degree
    vertices, and the circuit/trail verdicts (connected + all even ⇒
    Eulerian circuit; exactly two odd ⇒ open trail).  Degrees are one
    groupBy over the symmetric edges; components ride the hash-min
    fixpoint — both linear, shuffle-bounded stages at any scale."""
    und = coorder_edges(spark, sf_dir, part_cap=150)
    sym = _sym(und)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    comp, _ = pregel.connected_components(und)
    j = deg.join(comp, "id")
    per = j.groupBy("comp").agg(
        F.count("*").cast("long").alias("n_vertices"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        F.sum((F.col("deg") % 2).cast("long")).cast("long").alias("n_odd"),
    )
    return per.select(
        F.col("comp").cast("long"),
        "n_vertices",
        "n_edges",
        "n_odd",
        (F.col("n_odd") == 0).alias("euler_circuit"),
        (F.col("n_odd") == 2).alias("euler_trail"),
    ).orderBy("comp")


_EULER_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 150),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
verts AS (SELECT DISTINCT src AS v FROM e),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY src),
cc(id, comp) AS (
    SELECT v, v FROM verts
    UNION
    SELECT e.dst, c.comp FROM cc c JOIN e ON e.src = c.id
    WHERE c.comp < e.dst
),
comp AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id),
per AS (
  SELECT comp.comp, COUNT(*) AS n_vertices,
         SUM(deg.deg) / 2 AS n_edges,
         SUM(CASE WHEN deg.deg % 2 = 1 THEN 1 ELSE 0 END) AS n_odd
  FROM deg JOIN comp ON comp.id = deg.id
  GROUP BY comp.comp)
SELECT CAST(comp AS BIGINT) AS comp, CAST(n_vertices AS BIGINT) AS n_vertices,
       CAST(n_edges AS BIGINT) AS n_edges, CAST(n_odd AS BIGINT) AS n_odd,
       n_odd = 0 AS euler_circuit, n_odd = 2 AS euler_trail
FROM per ORDER BY comp
"""


def q_hyperbolicity4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled Gromov δ-hyperbolicity of the small-cap co-order graph
    (the tree-likeness constant behind hyperbolic-embedding claims):
    over every 4-subset of a deterministic vertex panel (v ≡ 0 mod 5)
    with all six pairwise distances finite, the three perfect-matching
    distance sums are formed and 2δ = (largest − second largest).
    Output is the 2δ histogram with the panel-wide maximum on every
    row.  Distances come from the keyed multi-source BFS (exact, the
    graph_center primitive); the quadruple join is panel-bounded
    (C(|panel|,4)) regardless of graph size — the standard sampled
    estimator, made deterministic."""
    und = coorder_edges(spark, sf_dir, part_cap=150)
    sym = _sym(und)
    verts = sorted(
        r[0] for r in sym.select("src").distinct().where(F.col("src") % 5 == 0).collect()
    )
    dist, _ = pregel.bfs_per_source(sym, verts, max_depth=30)
    panel = set(verts)
    pd_ = (
        dist.where(F.col("id").isin(list(panel)))
        .where(F.col("source") < F.col("id"))
        .select(
            F.col("source").alias("a"), F.col("id").alias("b"), F.col("dist").alias("d")
        )
        .localCheckpoint(eager=True)
    )
    vs = pd_.select(F.col("a").alias("v")).unionByName(
        pd_.select(F.col("b").alias("v"))
    ).distinct()
    quads = (
        vs.alias("p")
        .crossJoin(vs.alias("q"))
        .where(F.expr("p.v < q.v"))
        .crossJoin(vs.alias("r"))
        .where(F.expr("q.v < r.v"))
        .crossJoin(vs.alias("s"))
        .where(F.expr("r.v < s.v"))
        .select(
            F.expr("p.v").alias("a"),
            F.expr("q.v").alias("b"),
            F.expr("r.v").alias("c"),
            F.expr("s.v").alias("dd"),
        )
    )

    def dj(x: str, y: str, name: str):
        return (
            pd_.select(
                F.col("a").alias(x), F.col("b").alias(y), F.col("d").alias(name)
            )
        )

    full = (
        quads.join(dj("a", "b", "dab"), ["a", "b"])
        .join(dj("a", "c", "dac"), ["a", "c"])
        .join(
            pd_.select(
                F.col("a").alias("a"), F.col("b").alias("dd"), F.col("d").alias("dad")
            ),
            ["a", "dd"],
        )
        .join(dj("b", "c", "dbc"), ["b", "c"])
        .join(
            pd_.select(
                F.col("a").alias("b"), F.col("b").alias("dd"), F.col("d").alias("dbd")
            ),
            ["b", "dd"],
        )
        .join(
            pd_.select(
                F.col("a").alias("c"), F.col("b").alias("dd"), F.col("d").alias("dcd")
            ),
            ["c", "dd"],
        )
    )
    sums = full.select(
        (F.col("dab") + F.col("dcd")).alias("s1"),
        (F.col("dac") + F.col("dbd")).alias("s2"),
        (F.col("dad") + F.col("dbc")).alias("s3"),
    )
    delta = sums.select(
        (
            F.greatest("s1", "s2", "s3")
            - (
                F.col("s1")
                + F.col("s2")
                + F.col("s3")
                - F.greatest("s1", "s2", "s3")
                - F.least("s1", "s2", "s3")
            )
        )
        .cast("long")
        .alias("delta2")
    )
    hist = delta.groupBy("delta2").agg(F.count("*").cast("long").alias("n_quads"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return hist.select(
        "delta2", "n_quads", F.max("delta2").over(wall).cast("long").alias("max_delta2")
    ).orderBy("delta2")


_HYPER_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 150),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
panel AS (SELECT DISTINCT src AS v FROM e WHERE src % 5 = 0),
reach(s, id, d) AS (
    SELECT v, v, 0 FROM panel
    UNION
    SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
    WHERE r.d < 30
),
dmin AS (SELECT s, id, MIN(d) AS d FROM reach GROUP BY s, id),
pd AS MATERIALIZED (
  SELECT s AS a, id AS b, d FROM dmin
  WHERE id IN (SELECT v FROM panel) AND s < id),
vs AS (SELECT DISTINCT v FROM (SELECT a AS v FROM pd
                                UNION ALL SELECT b FROM pd) z),
quads AS (
  SELECT p.v AS a, q.v AS b, r.v AS c, s.v AS dd
  FROM vs p JOIN vs q ON p.v < q.v JOIN vs r ON q.v < r.v
            JOIN vs s ON r.v < s.v),
full_q AS (
  SELECT ab.d + cd.d AS s1, ac.d + bd.d AS s2, ad.d + bc.d AS s3
  FROM quads
  JOIN pd ab ON ab.a = quads.a AND ab.b = quads.b
  JOIN pd ac ON ac.a = quads.a AND ac.b = quads.c
  JOIN pd ad ON ad.a = quads.a AND ad.b = quads.dd
  JOIN pd bc ON bc.a = quads.b AND bc.b = quads.c
  JOIN pd bd ON bd.a = quads.b AND bd.b = quads.dd
  JOIN pd cd ON cd.a = quads.c AND cd.b = quads.dd),
delta AS (
  SELECT GREATEST(s1, s2, s3)
         - (s1 + s2 + s3 - GREATEST(s1, s2, s3) - LEAST(s1, s2, s3)) AS delta2
  FROM full_q),
hist AS (SELECT delta2, COUNT(*) AS n_quads FROM delta GROUP BY delta2)
SELECT CAST(delta2 AS BIGINT) AS delta2, CAST(n_quads AS BIGINT) AS n_quads,
       CAST(MAX(delta2) OVER () AS BIGINT) AS max_delta2
FROM hist ORDER BY delta2
"""


ORACLES.update(
    {
        "euler_check": _EULER_SQL,
        "hyperbolicity4": _HYPER_SQL,
    }
)
QUERIES.update(
    {
        "euler_check": q_euler_check,
        "hyperbolicity4": q_hyperbolicity4,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch E: walk-length spectrum, A/B experiment audit, rank-1 ALS.


def q_walk_spectrum8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex walk-length spectrum from fixed sources (v ≡ 0 mod
    50) on the small-cap co-order graph: the exact set of walk lengths
    ≤ 8 from source to vertex, encoded as a bitmask (bit d set ⇔ a
    length-d walk exists) — the generalization of BFS distance
    (lowest set bit), odd_walk_len's parity reachability (odd bits),
    and the second-shortest-walk question (second-lowest bit) in one
    8-round frontier iteration whose per-round state is one distinct
    (source, id, d) triple per reachable pair — bounded by 9·|V| per
    source no matter the edge count."""
    und = coorder_edges(spark, sf_dir, part_cap=150)
    sym = _sym(und).localCheckpoint(eager=True)
    srcs = sym.select(F.col("src").alias("s")).where(F.col("s") % 50 == 0).distinct()
    layer = srcs.select("s", F.col("s").alias("id"), F.lit(0).alias("d"))
    layers = [layer]
    for _ in range(8):
        layer = (
            layer.join(sym, layer["id"] == sym["src"])
            .select("s", F.col("dst").alias("id"), (F.col("d") + 1).alias("d"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        layers.append(layer)
    reach = layers[0]
    for l in layers[1:]:
        reach = reach.unionByName(l)
    return (
        reach.groupBy("s", "id")
        .agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(d AS INT))"))
            .cast("long")
            .alias("mask"),
            F.count("*").cast("long").alias("n_lens"),
            F.min("d").cast("long").alias("min_len"),
            F.max((F.col("d") % 2).cast("long")).cast("long").alias("has_odd"),
            F.max(
                F.when((F.col("d") % 2 == 0) & (F.col("d") > 0), 1).otherwise(0)
            ).cast("long").alias("has_even"),
        )
        .select(
            F.col("s").cast("long").alias("source"),
            F.col("id").cast("long"),
            "mask",
            "n_lens",
            "min_len",
            "has_odd",
            "has_even",
        )
        .orderBy("source", "id")
    )


_WALK_SPECTRUM_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 150),
und AS (SELECT DISTINCT a.p AS src, b.p AS dst
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
srcs AS (SELECT DISTINCT src AS s FROM e WHERE src % 50 = 0),
reach(s, id, d) AS (
    SELECT s, s, 0 FROM srcs
    UNION
    SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
    WHERE r.d < 8
)
SELECT CAST(s AS BIGINT) AS source, CAST(id AS BIGINT) AS id,
       CAST(SUM(1::BIGINT << d) AS BIGINT) AS mask,
       CAST(COUNT(*) AS BIGINT) AS n_lens,
       CAST(MIN(d) AS BIGINT) AS min_len,
       CAST(MAX(CASE WHEN d % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS has_odd,
       CAST(MAX(CASE WHEN d % 2 = 0 AND d > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS has_even
FROM reach GROUP BY s, id ORDER BY source, id
"""


def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment health + outcome audit on the events stream with
    event-id parity as the (deterministic 50/50) impression-level
    assignment (user-level would saturate: the synthetic stream has
    ~15 users/sf-milli and every one purchases): the sample-ratio-
    mismatch χ² (the guardrail every experimentation platform checks
    before reading results) and the two-proportion z-statistic on the
    purchase rate.  All four sufficient counts are exact integers from
    one aggregation; both test statistics are single double
    expressions over them — at 100 TB this is one pass over the
    exposure log."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy((F.col("event_id") % 2 == 0).alias("is_a")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).cast("long").alias("x"),
    )
    piv = agg.groupBy().pivot("is_a", [True, False]).agg(
        F.first("n").alias("n"), F.first("x").alias("x")
    )
    na, xa = F.col("true_n"), F.col("true_x")
    nb, xb = F.col("false_n"), F.col("false_x")
    dna, dxa = na.cast("double"), xa.cast("double")
    dnb, dxb = nb.cast("double"), xb.cast("double")
    phat = (dxa + dxb) / (dna + dnb)
    z = (dxa / dna - dxb / dnb) / F.sqrt(
        phat * (F.lit(1.0) - phat) * (F.lit(1.0) / dna + F.lit(1.0) / dnb)
    )
    return piv.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        xa.alias("x_a"),
        xb.alias("x_b"),
        F.round((na - nb).cast("double") * (na - nb).cast("double") / (dna + dnb), 6)
        .alias("srm_chi2_r"),
        F.round(z, 6).alias("z_r"),
    )


_AB_SRM_SQL = """
WITH agg AS (
  SELECT SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN event_id % 2 = 0 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS x_a,
         SUM(CASE WHEN event_id % 2 <> 0 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS x_b
  FROM events)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(x_a AS BIGINT) AS x_a, CAST(x_b AS BIGINT) AS x_b,
       ROUND(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)), 6) AS srm_chi2_r,
       ROUND((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / SQRT(((CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                    * (1.0 - (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
                             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
         AS z_r
FROM agg
"""


def q_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One rank-1 ALS alternation pair (Koren/Bell/Volinsky's
    factorization step stripped to its closed form) on the
    customer×part quantity matrix: v⁰ = 1, u = R v⁰ / ‖v⁰‖²_obs,
    v = Rᵀu / ‖u‖²_obs, denominators over each row/column's OBSERVED
    support (the sparse-ALS convention).  The whole computation is
    fixed-point BIGINT: u and v in micro-units with explicit floor
    division, so both alternations — two join-aggregates, the exact
    shape of a distributed ALS sweep — are engine-exact.  Output: the
    top-20 parts by the learned item factor."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    r = (
        li.join(o, "l_orderkey")
        .groupBy(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    u = r.groupBy("cust").agg(
        F.expr("SUM(q) * 1000000 DIV COUNT(*)").cast("long").alias("u_micro")
    )
    v = (
        r.join(u, "cust")
        .groupBy("part")
        .agg(
            F.count("*").cast("long").alias("n_raters"),
            F.expr(
                "SUM(q * u_micro) * 1000000"
                " DIV SUM((u_micro * u_micro) DIV 1000000)"
            )
            .cast("long")
            .alias("v_micro"),
        )
    )
    w = Window.orderBy(F.desc("v_micro"), F.asc("part"))
    return (
        v.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select(
            F.col("part").cast("long"),
            "n_raters",
            "v_micro",
            F.col("rnk").cast("long"),
        )
        .orderBy("rnk")
    )


_ALS_SQL = """
WITH r AS (
  SELECT o.o_custkey AS cust, l.l_partkey AS part,
         SUM(CAST(l.l_quantity AS BIGINT)) AS q
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey, l.l_partkey),
u AS (
  SELECT cust, SUM(q) * 1000000 // COUNT(*) AS u_micro
  FROM r GROUP BY cust),
v AS (
  SELECT part, COUNT(*) AS n_raters,
         SUM(q * u_micro) * 1000000
           // SUM((u_micro * u_micro) // 1000000) AS v_micro
  FROM r JOIN u ON u.cust = r.cust GROUP BY part),
ranked AS (
  SELECT part, n_raters, v_micro,
         ROW_NUMBER() OVER (ORDER BY v_micro DESC, part ASC) AS rnk
  FROM v)
SELECT CAST(part AS BIGINT) AS part, CAST(n_raters AS BIGINT) AS n_raters,
       CAST(v_micro AS BIGINT) AS v_micro, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 20 ORDER BY rnk
"""


ORACLES.update(
    {
        "walk_spectrum8": _WALK_SPECTRUM_SQL,
        "ab_srm": _AB_SRM_SQL,
        "als_rank1": _ALS_SQL,
    }
)
QUERIES.update(
    {
        "walk_spectrum8": q_walk_spectrum8,
        "ab_srm": q_ab_srm,
        "als_rank1": q_als_rank1,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch F: combinatorial optimization + classical k-sample /
# contingency statistics.


def q_maxcut_sweep2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic max-cut local search on the weight-≥2 co-order
    backbone: start from the id-parity 2-coloring, then two
    synchronous improvement sweeps under Luby-style local-minimum
    scheduling — a vertex WANTS to flip iff its same-side degree
    exceeds its cross-side degree, and actually flips only if no
    NEIGHBORING candidate has a smaller id (the flip set is an
    independent set, so simultaneous flips cannot clash and the cut is
    provably monotone non-decreasing; plain parity scheduling measured
    NON-monotone here — adjacent same-parity candidates flip on stale
    state).  Output: cut size at each stage plus flip counts — the
    GW-free local-search baseline every graph-partitioning harness
    starts from.  Each sweep is two join-aggregates over the edges;
    state is one side bit per vertex."""
    sub = pregel._hard_cut(_w2_backbone(spark, sf_dir, part_cap=2000))
    sym = _sym(sub).localCheckpoint(eager=True)
    side = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", (F.col("id") % 2).cast("long").alias("side"))
        .localCheckpoint(eager=True)
    )

    def cut_size(s: DataFrame) -> DataFrame:
        return (
            sub.join(s.select(F.col("id").alias("src"), F.col("side").alias("sa")), "src")
            .join(s.select(F.col("id").alias("dst"), F.col("side").alias("sb")), "dst")
            .agg(F.sum((F.col("sa") != F.col("sb")).cast("long")).cast("long").alias("cut"))
        )

    cuts = [cut_size(side).collect()[0]["cut"]]
    nflips = []
    for _ in range(2):
        nbr = (
            sym.join(
                side.select(F.col("id").alias("dst"), F.col("side").alias("nside")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.sum((F.col("nside") == 1).cast("long")).alias("n1"),
                F.count("*").alias("deg"),
            )
        )
        cand = (
            side.join(nbr, "id", "left")
            .select(
                "id",
                "side",
                (
                    F.when(F.col("side") == 1, F.coalesce("n1", F.lit(0)))
                    .otherwise(F.coalesce("deg", F.lit(0)) - F.coalesce("n1", F.lit(0)))
                    * 2
                    > F.coalesce("deg", F.lit(0))
                ).alias("want"),
            )
            .localCheckpoint(eager=True)
        )
        min_cand_nbr = (
            sym.join(
                cand.where("want").select(F.col("id").alias("dst")), "dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("dst").alias("min_cnbr"))
        )
        new_side = (
            cand.join(min_cand_nbr, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("want")
                    & (F.col("min_cnbr").isNull() | (F.col("id") < F.col("min_cnbr"))),
                    F.lit(1) - F.col("side"),
                )
                .otherwise(F.col("side"))
                .cast("long")
                .alias("side"),
                F.col("side").alias("old_side"),
            )
            .localCheckpoint(eager=True)
        )
        nflips.append(
            new_side.agg(
                F.sum((F.col("side") != F.col("old_side")).cast("long")).alias("f")
            ).collect()[0]["f"]
        )
        side = new_side.select("id", "side").localCheckpoint(eager=True)
        cuts.append(cut_size(side).collect()[0]["cut"])
    c0, c1, c2 = cuts
    f1, f2 = nflips
    m = sub.count()
    return spark.createDataFrame(
        [(int(m), int(c0), int(f1), int(c1), int(f2), int(c2))],
        "n_edges long, cut_init long, flips1 long, cut1 long, flips2 long, cut2 long",
    )


_MAXCUT_SQL = f"""
WITH {_W2_BACKBONE_SQL.strip()},
e0 AS (SELECT src, dst FROM sub WHERE src < 2000 AND dst < 2000),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
v AS (SELECT DISTINCT src AS id FROM e),
s0 AS (SELECT id, id % 2 AS side FROM v),
cut0 AS (SELECT SUM(CASE WHEN a.side <> b.side THEN 1 ELSE 0 END) AS c
         FROM e0 JOIN s0 a ON a.id = e0.src JOIN s0 b ON b.id = e0.dst),
n1_1 AS (SELECT e.src AS id, SUM(s0.side) AS n1, COUNT(*) AS deg
         FROM e JOIN s0 ON s0.id = e.dst GROUP BY e.src),
c1 AS (SELECT s0.id, s0.side,
              2 * (CASE WHEN s0.side = 1 THEN COALESCE(n1_1.n1, 0)
                        ELSE COALESCE(n1_1.deg, 0) - COALESCE(n1_1.n1, 0) END)
                > COALESCE(n1_1.deg, 0) AS want
       FROM s0 LEFT JOIN n1_1 ON n1_1.id = s0.id),
m1 AS (SELECT e.src AS id, MIN(e.dst) AS min_cnbr
       FROM e JOIN c1 ON c1.id = e.dst AND c1.want GROUP BY e.src),
s1 AS (SELECT c1.id,
              CASE WHEN c1.want AND (m1.min_cnbr IS NULL OR c1.id < m1.min_cnbr)
                   THEN 1 - c1.side ELSE c1.side END AS side,
              c1.side AS old_side
       FROM c1 LEFT JOIN m1 ON m1.id = c1.id),
cut1 AS (SELECT SUM(CASE WHEN a.side <> b.side THEN 1 ELSE 0 END) AS c
         FROM e0 JOIN s1 a ON a.id = e0.src JOIN s1 b ON b.id = e0.dst),
f1 AS (SELECT SUM(CASE WHEN side <> old_side THEN 1 ELSE 0 END) AS f FROM s1),
n1_2 AS (SELECT e.src AS id, SUM(s1.side) AS n1, COUNT(*) AS deg
         FROM e JOIN s1 ON s1.id = e.dst GROUP BY e.src),
c2 AS (SELECT s1.id, s1.side,
              2 * (CASE WHEN s1.side = 1 THEN COALESCE(n1_2.n1, 0)
                        ELSE COALESCE(n1_2.deg, 0) - COALESCE(n1_2.n1, 0) END)
                > COALESCE(n1_2.deg, 0) AS want
       FROM s1 LEFT JOIN n1_2 ON n1_2.id = s1.id),
m2 AS (SELECT e.src AS id, MIN(e.dst) AS min_cnbr
       FROM e JOIN c2 ON c2.id = e.dst AND c2.want GROUP BY e.src),
s2 AS (SELECT c2.id,
              CASE WHEN c2.want AND (m2.min_cnbr IS NULL OR c2.id < m2.min_cnbr)
                   THEN 1 - c2.side ELSE c2.side END AS side,
              c2.side AS old_side
       FROM c2 LEFT JOIN m2 ON m2.id = c2.id),
cut2 AS (SELECT SUM(CASE WHEN a.side <> b.side THEN 1 ELSE 0 END) AS c
         FROM e0 JOIN s2 a ON a.id = e0.src JOIN s2 b ON b.id = e0.dst),
f2 AS (SELECT SUM(CASE WHEN side <> old_side THEN 1 ELSE 0 END) AS f FROM s2)
SELECT CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
       CAST((SELECT c FROM cut0) AS BIGINT) AS cut_init,
       CAST((SELECT f FROM f1) AS BIGINT) AS flips1,
       CAST((SELECT c FROM cut1) AS BIGINT) AS cut1,
       CAST((SELECT f FROM f2) AS BIGINT) AS flips2,
       CAST((SELECT c FROM cut2) AS BIGINT) AS cut2
"""


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate of monthly revenue: the median
    of all pairwise slopes (kilodollars/month; breakdown point 29%,
    the robust companion to mann_kendall's sign test and
    ols_price_qty's least squares).  Slopes are floor-scaled to
    milli-units via the POSITIVE-SHIFTED floor division (slopes can be
    negative and Spark DIV truncates toward zero while DuckDB //
    floors — the logreg_gd3/revenue_mom lesson), the median is the
    nearest-rank lower median with (slope, i, j) tie-break.  The pair
    table is month-bounded (≤ C(84,2) rows) regardless of order
    volume."""
    o = load_table(spark, "orders", sf_dir)
    monthly = (
        o.select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("mi"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100000").alias("x"),
        )
        .groupBy("mi")
        .agg(F.sum("x").cast("long").alias("y"))
    )
    a = monthly.select(F.col("mi").alias("i"), F.col("y").alias("yi"))
    b = monthly.select(F.col("mi").alias("j"), F.col("y").alias("yj"))
    big = 10_000_000_000_000
    pairs = (
        a.crossJoin(b)
        .where(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            F.expr(
                f"((yj - yi) * 1000 + CAST({big} AS BIGINT) * (j - i))"
                f" DIV (j - i) - CAST({big} AS BIGINT)"
            )
            .cast("long")
            .alias("slope_milli"),
        )
    )
    w = Window.orderBy("slope_milli", "i", "j")
    ranked = pairs.withColumn("rnk", F.row_number().over(w))
    n = pairs.count()
    med_rank = (n + 1) // 2
    med = ranked.where(F.col("rnk") == med_rank).select(
        F.col("slope_milli").alias("median_slope_milli")
    )
    return (
        med.crossJoin(
            pairs.agg(
                F.count("*").cast("long").alias("n_pairs"),
                F.sum((F.col("slope_milli") > 0).cast("long"))
                .cast("long")
                .alias("n_positive"),
            )
        )
        .select("n_pairs", "n_positive", "median_slope_milli")
    )


_THEIL_SEN_SQL = """
WITH monthly AS (
  SELECT (YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1) AS mi,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000) AS y
  FROM orders GROUP BY 1),
pairs AS (
  SELECT a.mi AS i, b.mi AS j,
         ((b.y - a.y) * 1000 + CAST(10000000000000 AS BIGINT) * (b.mi - a.mi))
           // (b.mi - a.mi) - CAST(10000000000000 AS BIGINT) AS slope_milli
  FROM monthly a JOIN monthly b ON a.mi < b.mi),
ranked AS (
  SELECT slope_milli,
         ROW_NUMBER() OVER (ORDER BY slope_milli, i, j) AS rnk
  FROM pairs),
n AS (SELECT COUNT(*) AS n FROM pairs)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_pairs,
       CAST((SELECT COUNT(*) FROM pairs WHERE slope_milli > 0) AS BIGINT)
         AS n_positive,
       CAST((SELECT slope_milli FROM ranked
             WHERE rnk = ((SELECT n FROM n) + 1) // 2) AS BIGINT)
         AS median_slope_milli
"""


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of daily revenue across ISO weekdays (the
    k-group extension of the rank machinery behind pettitt_change and
    mann_kendall): doubled average ranks keep ties BIGINT-exact, each
    group's R²/n term is floored to an exact integer before summing
    (the kmeans_nmi per-cell discipline), and H plus its tie
    correction are single double expressions over those integers.
    Output: one row per weekday (n, rank sum) with the global H and
    tie-corrected H_c on every row."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.select(
            F.to_date("o_orderdate").alias("day"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100000").alias("x"),
        )
        .groupBy("day")
        .agg(F.sum("x").cast("long").alias("x"))
        .select((F.weekday("day") + 1).cast("long").alias("wd"), "x")
    )
    wr = Window.orderBy("x")
    wt = Window.partitionBy("x")
    ranked = daily.select(
        "wd",
        "x",
        (2 * F.rank().over(wr) + F.count("*").over(wt) - 1).cast("long").alias("r2"),
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count("*").cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie3")
        )
    )
    per = ranked.groupBy("wd").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2").cast("long").alias("r2_sum"),
    )
    tot = per.agg(F.sum("n").cast("long").alias("nn")).crossJoin(ties)
    terms = per.crossJoin(F.broadcast(tot)).select(
        "wd",
        "n",
        "r2_sum",
        "nn",
        "tie3",
        F.expr("r2_sum * r2_sum DIV n").alias("q"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    h = (
        F.lit(3.0)
        * F.sum("q").over(wall).cast("double")
        / (F.col("nn").cast("double") * (F.col("nn").cast("double") + F.lit(1.0)))
        - F.lit(3.0) * (F.col("nn").cast("double") + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("tie3").cast("double") / (
        F.col("nn").cast("double") * F.col("nn").cast("double") * F.col("nn").cast("double")
        - F.col("nn").cast("double")
    )
    return terms.select(
        "wd",
        "n",
        "r2_sum",
        F.round(h, 6).alias("h_r"),
        F.round(h / corr, 6).alias("h_tie_r"),
    ).orderBy("wd")


_KRUSKAL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000) AS x
  FROM orders GROUP BY 1),
wd_t AS (SELECT isodow(day) AS wd, x FROM daily),
ranked AS (
  SELECT wd, x,
         2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1 AS r2
  FROM wd_t),
ties AS (SELECT SUM(t * t * t - t) AS tie3
         FROM (SELECT COUNT(*) AS t FROM wd_t GROUP BY x) z),
per AS (SELECT wd, COUNT(*) AS n, SUM(r2) AS r2_sum FROM ranked GROUP BY wd),
tot AS (SELECT SUM(n) AS nn FROM per),
terms AS (SELECT wd, n, r2_sum, r2_sum * r2_sum // n AS q FROM per),
agg AS (SELECT SUM(q) AS sq FROM terms)
SELECT CAST(wd AS BIGINT) AS wd, CAST(n AS BIGINT) AS n,
       CAST(r2_sum AS BIGINT) AS r2_sum,
       ROUND(3.0 * CAST((SELECT sq FROM agg) AS DOUBLE)
             / (CAST((SELECT nn FROM tot) AS DOUBLE)
                * (CAST((SELECT nn FROM tot) AS DOUBLE) + 1.0))
             - 3.0 * (CAST((SELECT nn FROM tot) AS DOUBLE) + 1.0), 6) AS h_r,
       ROUND((3.0 * CAST((SELECT sq FROM agg) AS DOUBLE)
              / (CAST((SELECT nn FROM tot) AS DOUBLE)
                 * (CAST((SELECT nn FROM tot) AS DOUBLE) + 1.0))
              - 3.0 * (CAST((SELECT nn FROM tot) AS DOUBLE) + 1.0))
             / (1.0 - CAST((SELECT tie3 FROM ties) AS DOUBLE)
                      / (CAST((SELECT nn FROM tot) AS DOUBLE)
                         * CAST((SELECT nn FROM tot) AS DOUBLE)
                         * CAST((SELECT nn FROM tot) AS DOUBLE)
                         - CAST((SELECT nn FROM tot) AS DOUBLE))), 6) AS h_tie_r
FROM terms ORDER BY wd
"""


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence test of event type × ISO weekday (the
    contingency-table sibling of chi2_terms' feature selection), with
    Cramér's V effect size: each cell's contribution
    (o − rc/N)²/(rc/N) is a fixed-operand-order double over exact
    integer margins FLOORED to micro-units before summation (the
    kmeans_nmi cell discipline — (oN − rc)² overflows int64 at sf0.1,
    so the double form is the exact-int-derived one).  Output: one row
    per event type (row margin + per-type χ² share) with the global
    χ², degrees of freedom and V on every row."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", (F.weekday(F.to_date("ts")) + 1).cast("long").alias("wd")
    )
    cells = ev.groupBy("event_type", "wd").agg(F.count("*").cast("long").alias("o"))
    rows_m = cells.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    cols_m = cells.groupBy("wd").agg(F.sum("o").cast("long").alias("c"))
    nn = cells.agg(F.sum("o").cast("long").alias("nn"))
    e = (
        cells.join(rows_m, "event_type")
        .join(cols_m, "wd")
        .crossJoin(F.broadcast(nn))
    )
    exp = F.col("r").cast("double") * F.col("c").cast("double") / F.col("nn").cast("double")
    cell_micro = F.floor(
        F.lit(1e6)
        * (F.col("o").cast("double") - exp)
        * (F.col("o").cast("double") - exp)
        / exp
    ).cast("long")
    per_type = (
        e.select("event_type", "r", "nn", cell_micro.alias("cm"))
        .groupBy("event_type", "r", "nn")
        .agg(F.sum("cm").cast("long").alias("chi2_micro_type"))
    )
    nr = rows_m.count()
    ncol = cols_m.count()
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    chi2_tot = F.sum("chi2_micro_type").over(wall).cast("long")
    dof = (nr - 1) * (ncol - 1)
    mindim = min(nr - 1, ncol - 1)
    return per_type.select(
        "event_type",
        F.col("r").alias("n_row"),
        "chi2_micro_type",
        chi2_tot.alias("chi2_micro"),
        F.lit(dof).cast("long").alias("dof"),
        F.round(
            F.sqrt(
                chi2_tot.cast("double")
                / F.lit(1e6)
                / (F.col("nn").cast("double") * F.lit(float(mindim)))
            ),
            6,
        ).alias("cramers_v_r"),
    ).orderBy("event_type")


_CHI2_IND_SQL = """
WITH ev AS (SELECT event_type, isodow(CAST(ts AS DATE)) AS wd FROM events),
cells AS (SELECT event_type, wd, COUNT(*) AS o FROM ev GROUP BY 1, 2),
rows_m AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
cols_m AS (SELECT wd, SUM(o) AS c FROM cells GROUP BY 1),
nn AS (SELECT SUM(o) AS nn FROM cells),
e AS (SELECT cells.event_type, cells.wd, cells.o, rows_m.r, cols_m.c,
             (SELECT nn FROM nn) AS nn
      FROM cells JOIN rows_m ON rows_m.event_type = cells.event_type
                 JOIN cols_m ON cols_m.wd = cells.wd),
cellv AS (
  SELECT event_type, r, nn,
         CAST(FLOOR(1e6 * (CAST(o AS DOUBLE)
                           - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                             / CAST(nn AS DOUBLE))
                        * (CAST(o AS DOUBLE)
                           - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                             / CAST(nn AS DOUBLE))
                        / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                           / CAST(nn AS DOUBLE))) AS BIGINT) AS cm
  FROM e),
per_type AS (SELECT event_type, r, nn, SUM(cm) AS chi2_micro_type
             FROM cellv GROUP BY 1, 2, 3),
dims AS (SELECT (SELECT COUNT(*) FROM rows_m) AS nr,
                (SELECT COUNT(*) FROM cols_m) AS nc),
tot AS (SELECT SUM(chi2_micro_type) AS chi2_micro FROM per_type)
SELECT event_type, CAST(r AS BIGINT) AS n_row,
       CAST(chi2_micro_type AS BIGINT) AS chi2_micro_type,
       CAST((SELECT chi2_micro FROM tot) AS BIGINT) AS chi2_micro,
       CAST(((SELECT nr FROM dims) - 1) * ((SELECT nc FROM dims) - 1) AS BIGINT)
         AS dof,
       ROUND(SQRT(CAST((SELECT chi2_micro FROM tot) AS DOUBLE) / 1e6
                  / (CAST(nn AS DOUBLE)
                     * CAST(LEAST((SELECT nr FROM dims) - 1,
                                  (SELECT nc FROM dims) - 1) AS DOUBLE))), 6)
         AS cramers_v_r
FROM per_type ORDER BY event_type
"""


ORACLES.update(
    {
        "maxcut_sweep2": _MAXCUT_SQL,
        "theil_sen": _THEIL_SEN_SQL,
        "kruskal_wallis": _KRUSKAL_SQL,
        "chi2_independence": _CHI2_IND_SQL,
    }
)
QUERIES.update(
    {
        "maxcut_sweep2": q_maxcut_sweep2,
        "theil_sen": q_theil_sen,
        "kruskal_wallis": q_kruskal_wallis,
        "chi2_independence": q_chi2_independence,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch G: B-cubed clustering eval, random-walk entropy rate,
# k-anonymity audit.


def q_bcubed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed precision/recall/F of the kmeans8 partition against the
    embedding labels (Bagga & Baldwin'98; the per-ITEM clustering
    grade that, unlike ari_partitions' pair counting and kmeans_nmi's
    information terms, weights every element equally and so is the
    standard for skewed cluster sizes): precision = E_i[|C_i ∩ L_i|/
    |C_i|], recall = E_i[|C_i ∩ L_i|/|L_i|].  Entirely integer: each
    contingency cell contributes n_cl²·10⁶ DIV margin, the expectation
    is one more DIV, and F folds the two ppm values harmonically —
    zero float surface (no ln, unlike NMI).  Contingency is the same
    broadcastable 8×|labels| aggregate."""
    from polar_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, "embeddings", sf_dir)
    asg, _ = kmeans_lloyd(emb, k=8, n_iter=3)
    lab = emb.select(F.col("vec_id").alias("id"), F.col("label").cast("long"))
    ct = (
        asg.select("id", "cluster")
        .join(lab, "id")
        .groupBy("cluster", "label")
        .agg(F.count("*").cast("long").alias("n_cl"))
    )
    n_c = ct.groupBy("cluster").agg(F.sum("n_cl").cast("long").alias("nc"))
    n_l = ct.groupBy("label").agg(F.sum("n_cl").cast("long").alias("nl"))
    cells = ct.join(n_c, "cluster").join(n_l, "label")
    agg = cells.agg(
        F.sum("n_cl").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.expr("n_cl * n_cl * 1000000 DIV nc")).cast("long").alias("p_num"),
        F.sum(F.expr("n_cl * n_cl * 1000000 DIV nl")).cast("long").alias("r_num"),
    )
    return agg.select(
        "n",
        "n_cells",
        F.expr("p_num DIV n").cast("long").alias("bcubed_p_ppm"),
        F.expr("r_num DIV n").cast("long").alias("bcubed_r_ppm"),
        F.expr(
            "CASE WHEN p_num DIV n + r_num DIV n > 0"
            " THEN 2 * (p_num DIV n) * (r_num DIV n)"
            " DIV (p_num DIV n + r_num DIV n) ELSE 0 END"
        )
        .cast("long")
        .alias("bcubed_f_ppm"),
    )


def _bcubed_sql(k: int = 8, n_iter: int = 3) -> str:
    parts, dist = _kmeans_parts(k, n_iter)
    parts.append(
        f"asg AS MATERIALIZED (SELECT id, cid FROM ("
        f"SELECT e.id, c.cid, "
        f"ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {dist}, c.cid) AS rn "
        f"FROM e CROSS JOIN c{n_iter} c) x WHERE rn = 1)"
    )
    parts += [
        "lab AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label FROM embeddings)",
        "ct AS MATERIALIZED (SELECT cid AS cluster, label, COUNT(*) AS n_cl "
        "FROM asg JOIN lab USING (id) GROUP BY 1, 2)",
        "nc AS (SELECT cluster, SUM(n_cl) AS nc FROM ct GROUP BY cluster)",
        "nl AS (SELECT label, SUM(n_cl) AS nl FROM ct GROUP BY label)",
        """agg AS (
  SELECT SUM(ct.n_cl) AS n, COUNT(*) AS n_cells,
         SUM(ct.n_cl * ct.n_cl * 1000000 // nc.nc) AS p_num,
         SUM(ct.n_cl * ct.n_cl * 1000000 // nl.nl) AS r_num
  FROM ct JOIN nc USING (cluster) JOIN nl USING (label))""",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
       CAST(p_num // n AS BIGINT) AS bcubed_p_ppm,
       CAST(r_num // n AS BIGINT) AS bcubed_r_ppm,
       CAST(CASE WHEN p_num // n + r_num // n > 0
                 THEN 2 * (p_num // n) * (r_num // n)
                      // (p_num // n + r_num // n) ELSE 0 END AS BIGINT)
         AS bcubed_f_ppm
FROM agg
"""
    )


def q_walk_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the simple random walk on the weight-≥2
    co-order backbone (Lovász's h = Σ_v π_v·ln d_v with π_v = d_v/2m —
    the information-theoretic mixing descriptor that upper-bounds how
    fast node2vec-style samplers decorrelate), plus the stationary-
    distribution entropy H(π) = ln 2m − h and the uniform bound ln n̄.
    Per-vertex cells d·ln d are floored to 1e6-scaled BIGINTs before
    the single sum (the kmeans_nmi discipline); everything else is
    exact integer degree algebra — one groupBy at any scale."""
    sub = _w2_backbone(spark, sf_dir)
    deg = _sym(sub).groupBy("src").agg(F.count("*").cast("long").alias("d"))
    agg = deg.agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.sum("d").cast("long").alias("deg_sum"),
        F.sum(
            F.floor(F.lit(1e6) * F.col("d").cast("double") * F.log(F.col("d").cast("double")))
        )
        .cast("long")
        .alias("dlnd_scaled"),
    )
    h_rate = F.col("dlnd_scaled").cast("double") / (
        F.lit(1e6) * F.col("deg_sum").cast("double")
    )
    return agg.select(
        "n_vertices",
        (F.col("deg_sum") / 2).cast("long").alias("n_edges"),
        "dlnd_scaled",
        F.round(h_rate, 6).alias("h_rate_r"),
        F.round(F.log(F.col("deg_sum").cast("double")) - h_rate, 6).alias("h_pi_r"),
        F.round(F.log(F.col("n_vertices").cast("double")), 6).alias("h_uniform_r"),
    )


_WALK_ENTROPY_SQL = f"""
WITH {_W2_BACKBONE_SQL.strip()},
e AS (SELECT src, dst FROM sub UNION ALL SELECT dst, src FROM sub),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
agg AS (
  SELECT COUNT(*) AS n_vertices, SUM(d) AS deg_sum,
         SUM(CAST(FLOOR(1e6 * CAST(d AS DOUBLE) * LN(CAST(d AS DOUBLE)))
             AS BIGINT)) AS dlnd_scaled
  FROM deg)
SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
       CAST(deg_sum / 2 AS BIGINT) AS n_edges,
       CAST(dlnd_scaled AS BIGINT) AS dlnd_scaled,
       ROUND(CAST(dlnd_scaled AS DOUBLE) / (1e6 * CAST(deg_sum AS DOUBLE)), 6)
         AS h_rate_r,
       ROUND(LN(CAST(deg_sum AS DOUBLE))
             - CAST(dlnd_scaled AS DOUBLE) / (1e6 * CAST(deg_sum AS DOUBLE)), 6)
         AS h_pi_r,
       ROUND(LN(CAST(n_vertices AS DOUBLE)), 6) AS h_uniform_r
FROM agg
"""


def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table under the
    quasi-identifier (nation, market segment) with the account-balance
    sign as the sensitive attribute (Sweeney'02 / Machanavajjhala'06
    — the release-readiness check any privacy pipeline runs before
    publishing an extract): the equivalence-class size histogram
    (k → #classes, #rows) with the global minima and the re-
    identifiable mass (rows in classes with k < 5) on every row.
    Two integer groupBys; the histogram is QI-cardinality-bounded."""
    c = load_table(spark, "customer", sf_dir)
    grp = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("k"),
        F.countDistinct(F.signum("c_acctbal").cast("long")).cast("long").alias("l"),
    )
    hist = grp.groupBy("k").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("k").cast("long").alias("n_rows"),
        F.min("l").cast("long").alias("min_l_at_k"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return hist.select(
        "k",
        "n_classes",
        "n_rows",
        "min_l_at_k",
        F.min("k").over(wall).cast("long").alias("min_k"),
        F.min("min_l_at_k").over(wall).cast("long").alias("min_l"),
        F.expr(
            "SUM(CASE WHEN k < 5 THEN n_rows ELSE 0 END) OVER"
            " (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
            " * 1000000 DIV SUM(n_rows) OVER"
            " (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        )
        .cast("long")
        .alias("small_class_ppm"),
    ).orderBy("k")


_KANON_SQL = """
WITH grp AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS k,
         COUNT(DISTINCT CAST(SIGN(c_acctbal) AS BIGINT)) AS l
  FROM customer GROUP BY 1, 2),
hist AS (
  SELECT k, COUNT(*) AS n_classes, SUM(k) AS n_rows, MIN(l) AS min_l_at_k
  FROM grp GROUP BY k)
SELECT CAST(k AS BIGINT) AS k, CAST(n_classes AS BIGINT) AS n_classes,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(min_l_at_k AS BIGINT) AS min_l_at_k,
       CAST(MIN(k) OVER () AS BIGINT) AS min_k,
       CAST(MIN(min_l_at_k) OVER () AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN k < 5 THEN n_rows ELSE 0 END) OVER () * 1000000
            // SUM(n_rows) OVER () AS BIGINT) AS small_class_ppm
FROM hist ORDER BY k
"""


ORACLES.update(
    {
        "bcubed_eval": _bcubed_sql(),
        "walk_entropy": _WALK_ENTROPY_SQL,
        "kanon_audit": _KANON_SQL,
    }
)
QUERIES.update(
    {
        "bcubed_eval": q_bcubed_eval,
        "walk_entropy": q_walk_entropy,
        "kanon_audit": q_kanon_audit,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch H: drift detection, two-sample KS, decision stump.


_PH_DELTA_MICRO = 500_000  # δ = 0.5 orders/day drift allowance


def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector on the daily order-count series
    (completing the drift family: cusum_hourly watches a FIXED
    reference mean, pettitt_change tests retrospectively — PH tracks
    the RUNNING mean, the streaming-drift formulation): m_t =
    Σ_{i≤t}(x_i − x̄_i − δ) with x̄_i the prefix mean, PH_t = m_t −
    min_{s≤t} m_s, alarm when PH exceeds λ = 50·10⁶ micro-units.
    Every term is exact BIGINT micro-units (prefix mean via S_i·10⁶
    DIV i); the whole detector is two window passes over the
    calendar-bounded daily table."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("x"))
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wi = Window.orderBy("d")
    staged = daily.select(
        "d",
        "x",
        F.sum("x").over(wd).cast("long").alias("s"),
        F.row_number().over(wi).cast("long").alias("i"),
    ).select(
        "d",
        "x",
        F.expr(f"x * 1000000 - (s * 1000000 DIV i) - {_PH_DELTA_MICRO}")
        .cast("long")
        .alias("term_micro"),
    )
    cum = staged.select(
        "d",
        "x",
        F.sum("term_micro").over(wd).cast("long").alias("m_micro"),
    )
    return cum.select(
        "d",
        "x",
        "m_micro",
        (F.col("m_micro") - F.min("m_micro").over(wd)).cast("long").alias("ph_micro"),
        (
            (F.col("m_micro") - F.min("m_micro").over(wd)) > F.lit(50_000_000)
        ).alias("alarm"),
    ).orderBy("d")


_PAGE_HINKLEY_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
         COUNT(*) AS x
  FROM orders GROUP BY 1),
staged AS (
  SELECT d, x,
         x * 1000000
           - (SUM(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) * 1000000
              // ROW_NUMBER() OVER (ORDER BY d))
           - {_PH_DELTA_MICRO} AS term_micro
  FROM daily),
cum AS (
  SELECT d, x,
         SUM(term_micro) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS m_micro
  FROM staged)
SELECT CAST(d AS BIGINT) AS d, CAST(x AS BIGINT) AS x,
       CAST(m_micro AS BIGINT) AS m_micro,
       CAST(m_micro - MIN(m_micro) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS ph_micro,
       m_micro - MIN(m_micro) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
         > 50000000 AS alarm
FROM cum ORDER BY d
"""


def q_ks_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the first
    and second calendar halves of the daily-revenue distribution (the
    distribution-shift check run on every data refresh; the
    full-distribution sibling of the mean/rank drift detectors):
    D = max_x |F₁(x) − F₂(x)| held exactly as max |c₁n₂ − c₂n₁| over
    the pooled value grid — pure BIGINT cross-multiplication, one sort
    window over the calendar-bounded daily table.  Output: one row
    with both sample sizes, the scaled D numerator, D in exact ppm,
    and the value where the maximum gap is attained."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("d"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100000").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").cast("long").alias("x"))
    )
    mid = daily.agg(
        F.expr("(MIN(d) + MAX(d)) DIV 2").cast("long").alias("mid")
    )
    tagged = daily.crossJoin(F.broadcast(mid)).select(
        "x", (F.col("d") <= F.col("mid")).cast("long").alias("g1")
    )
    sizes = tagged.agg(
        F.sum("g1").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("g1")).cast("long").alias("n2"),
    )
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        tagged.groupBy("x")
        .agg(
            F.sum("g1").cast("long").alias("a1"),
            F.sum(F.lit(1) - F.col("g1")).cast("long").alias("a2"),
        )
        .select(
            "x",
            F.sum("a1").over(wv).cast("long").alias("c1"),
            F.sum("a2").over(wv).cast("long").alias("c2"),
        )
    )
    gaps = cum.crossJoin(F.broadcast(sizes)).select(
        "x",
        "n1",
        "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        .cast("long")
        .alias("gap"),
    )
    w = Window.orderBy(F.desc("gap"), F.asc("x"))
    return (
        gaps.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "n1",
            "n2",
            F.col("gap").alias("d_scaled"),
            F.expr("gap * 1000000 DIV (n1 * n2)").cast("long").alias("d_ppm"),
            F.col("x").alias("at_value"),
        )
    )


_KS_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000) AS x
  FROM orders GROUP BY 1),
mid AS (SELECT (MIN(d) + MAX(d)) // 2 AS mid FROM daily),
tagged AS (SELECT x, CASE WHEN d <= (SELECT mid FROM mid) THEN 1 ELSE 0 END AS g1
           FROM daily),
sizes AS (SELECT SUM(g1) AS n1, SUM(1 - g1) AS n2 FROM tagged),
cum AS (
  SELECT x,
         SUM(SUM(g1)) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(SUM(1 - g1)) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS c2
  FROM tagged GROUP BY x),
gaps AS (
  SELECT x, sizes.n1, sizes.n2,
         ABS(c1 * sizes.n2 - c2 * sizes.n1) AS gap
  FROM cum CROSS JOIN sizes),
best AS (SELECT *, ROW_NUMBER() OVER (ORDER BY gap DESC, x ASC) AS rn FROM gaps)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(gap AS BIGINT) AS d_scaled,
       CAST(gap * 1000000 // (n1 * n2) AS BIGINT) AS d_ppm,
       CAST(x AS BIGINT) AS at_value
FROM best WHERE rn = 1
"""


def q_best_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact best decision stump on lineitem: the single split
    l_discount ≤ θ minimizing weighted Gini impurity for predicting a
    return (l_returnflag = 'R') — the CART/XGBoost split-search
    primitive as one pass: candidate thresholds are the distinct
    discount grid (integer percent), left/right class counts come
    from one cumulative window over the per-threshold histogram, and
    each branch's Gini is held exactly as FLOOR(2·10⁶·pos·neg/n²)
    before the weighted fold (the chi2_independence cell discipline).
    Output: every candidate's weighted impurity plus the argmin
    flag."""
    li = load_table(spark, "lineitem", sf_dir)
    base = li.select(
        F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)").alias("disc"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    hist = base.groupBy("disc").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wv = Window.orderBy("disc").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "disc",
        F.sum("n").over(wv).cast("long").alias("nl"),
        F.sum("pos").over(wv).cast("long").alias("pl"),
        F.sum("n").over(wall).cast("long").alias("nt"),
        F.sum("pos").over(wall).cast("long").alias("pt"),
    ).where(F.col("nl") < F.col("nt"))
    gini = cum.select(
        "disc",
        "nl",
        "pl",
        (F.col("nt") - F.col("nl")).alias("nr"),
        (F.col("pt") - F.col("pl")).alias("pr"),
        F.expr(
            "CAST(FLOOR(2e6 * CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE)"
            " / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE))) AS BIGINT)"
        ).alias("gl_micro"),
        F.expr(
            "CAST(FLOOR(2e6 * CAST(pt - pl AS DOUBLE)"
            " * CAST((nt - nl) - (pt - pl) AS DOUBLE)"
            " / (CAST(nt - nl AS DOUBLE) * CAST(nt - nl AS DOUBLE))) AS BIGINT)"
        ).alias("gr_micro"),
        "nt",
    )
    weighted = gini.select(
        "disc",
        "nl",
        F.col("nr").cast("long"),
        "pl",
        F.col("pr").cast("long"),
        F.expr("(nl * gl_micro + nr * gr_micro) DIV nt").cast("long").alias("gini_micro"),
    )
    return weighted.select(
        "*",
        (
            F.col("gini_micro")
            == F.min("gini_micro").over(
                Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            )
        ).alias("is_best"),
    ).orderBy("disc")


_BEST_STUMP_SQL = """
WITH base AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
hist AS (SELECT disc, COUNT(*) AS n, SUM(y) AS pos FROM base GROUP BY disc),
cum AS (
  SELECT disc,
         SUM(n) OVER (ORDER BY disc ROWS UNBOUNDED PRECEDING) AS nl,
         SUM(pos) OVER (ORDER BY disc ROWS UNBOUNDED PRECEDING) AS pl,
         SUM(n) OVER () AS nt, SUM(pos) OVER () AS pt
  FROM hist),
g AS (
  SELECT disc, nl, pl, nt - nl AS nr, pt - pl AS pr, nt,
         CAST(FLOOR(2e6 * CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE)
              / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE))) AS BIGINT) AS gl_micro,
         CAST(FLOOR(2e6 * CAST(pt - pl AS DOUBLE)
              * CAST((nt - nl) - (pt - pl) AS DOUBLE)
              / (CAST(nt - nl AS DOUBLE) * CAST(nt - nl AS DOUBLE))) AS BIGINT)
           AS gr_micro
  FROM cum WHERE nl < nt),
weighted AS (
  SELECT disc, nl, nr, pl, pr,
         (nl * gl_micro + nr * gr_micro) // nt AS gini_micro
  FROM g)
SELECT CAST(disc AS BIGINT) AS disc, CAST(nl AS BIGINT) AS nl,
       CAST(nr AS BIGINT) AS nr, CAST(pl AS BIGINT) AS pl,
       CAST(pr AS BIGINT) AS pr, CAST(gini_micro AS BIGINT) AS gini_micro,
       gini_micro = MIN(gini_micro) OVER () AS is_best
FROM weighted ORDER BY disc
"""


ORACLES.update(
    {
        "page_hinkley": _PAGE_HINKLEY_SQL,
        "ks_2samp": _KS_SQL,
        "best_stump": _BEST_STUMP_SQL,
    }
)
QUERIES.update(
    {
        "page_hinkley": q_page_hinkley,
        "ks_2samp": q_ks_2samp,
        "best_stump": q_best_stump,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch I: Simpson's-paradox probe, Lorenz/Gini concentration,
# popularity-baseline recommender eval.


def q_simpson_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox probe on quantity ~ discount: the pooled OLS
    slope versus the per-returnflag-group slopes (the aggregation
    pitfall every analytics reviewer checks before trusting a pooled
    trend).  Slopes ride the ols_price_qty discipline — five exact
    BIGINT sufficient statistics per group (x = discount in integer
    percent, y = integer quantity), the slope one identically-written
    double over them, 6-dp rounded.  Output: per-group n/slope with
    the pooled slope and the reversal flag on every row."""
    li = load_table(spark, "lineitem", sf_dir)
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )

    def stats(df: DataFrame, keys: list[str]) -> DataFrame:
        g = df.groupBy(*keys) if keys else df.groupBy()
        return g.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )

    slope = lambda: F.round(  # noqa: E731
        (
            F.col("n").cast("double") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        ),
        6,
    )
    per = stats(base, ["grp"]).select("grp", "n", slope().alias("slope_r"))
    pooled = stats(base, []).select(slope().alias("pooled_slope_r"))
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "grp",
            "n",
            "slope_r",
            "pooled_slope_r",
            ((F.col("slope_r") > 0) != (F.col("pooled_slope_r") > 0)).alias(
                "sign_reversed"
            ),
        )
        .orderBy("grp")
    )


_SIMPSON_SQL = """
WITH base AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem),
per AS (
  SELECT grp, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM base GROUP BY grp),
pooled AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM base),
ps AS (SELECT ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS s
       FROM pooled)
SELECT grp, CAST(n AS BIGINT) AS n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope_r,
       (SELECT s FROM ps) AS pooled_slope_r,
       (ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) > 0)
         <> ((SELECT s FROM ps) > 0) AS sign_reversed
FROM per ORDER BY grp
"""


def q_lorenz_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve + Gini coefficient of customer revenue (the
    inequality summary behind `revenue_concentration`'s whale shares
    and `abc_parts`' Pareto classes, made exact): customers sorted by
    (revenue, custkey) into revenue deciles, per-decile exact cent
    totals and cumulative share in ppm, and the exact-rank Gini
    G = (2Σi·xᵢ − (n+1)Σx)/(n·Σx) — integer numerator/denominator,
    one double at the end.  The sort is customer-bounded, never
    order-volume-bounded."""
    o = load_table(spark, "orders", sf_dir)
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    wr = Window.orderBy("cents", "o_custkey")
    ranked = rev.select(
        "cents",
        F.row_number().over(wr).cast("long").alias("i"),
        F.ntile(10).over(wr).cast("long").alias("decile"),
    )
    per = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("cents"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("ix_sum"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot_c = F.sum("cents").over(wall)
    tot_n = F.sum("n_cust").over(wall)
    tot_ix = F.sum("ix_sum").over(wall)
    return per.select(
        "decile",
        "n_cust",
        "cents",
        F.expr(
            "SUM(cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)"
            " * 1000000 DIV SUM(cents) OVER"
            " (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        )
        .cast("long")
        .alias("cum_share_ppm"),
        F.round(
            (
                F.lit(2.0) * tot_ix.cast("double")
                - (tot_n.cast("double") + F.lit(1.0)) * tot_c.cast("double")
            )
            / (tot_n.cast("double") * tot_c.cast("double")),
            6,
        ).alias("gini_r"),
    ).orderBy("decile")


_LORENZ_SQL = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
         NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
  FROM rev),
per AS (
  SELECT decile, COUNT(*) AS n_cust, SUM(cents) AS cents,
         SUM(i * cents) AS ix_sum
  FROM ranked GROUP BY decile)
SELECT CAST(decile AS BIGINT) AS decile, CAST(n_cust AS BIGINT) AS n_cust,
       CAST(cents AS BIGINT) AS cents,
       CAST(SUM(cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            * 1000000 // SUM(cents) OVER () AS BIGINT) AS cum_share_ppm,
       ROUND((2.0 * CAST(SUM(ix_sum) OVER () AS DOUBLE)
              - (CAST(SUM(n_cust) OVER () AS DOUBLE) + 1.0)
                * CAST(SUM(cents) OVER () AS DOUBLE))
             / (CAST(SUM(n_cust) OVER () AS DOUBLE)
                * CAST(SUM(cents) OVER () AS DOUBLE)), 6) AS gini_r
FROM per ORDER BY decile
"""


def q_popularity_hit10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity-baseline recommender evaluation with a leave-last-
    order-out split (the floor any personalized model — als_rank1,
    item_cf10 — must beat): each customer's LAST order (by date, then
    orderkey) is held out; the global top-10 parts by TRAINING order
    frequency are 'recommended' to everyone; a customer counts as hit
    if the held-out basket contains any recommended part.  Counts are
    all exact integers; the top-10 is one aggregate + limit; the
    eval join is a broadcast semi-join against 10 ids at any scale.
    Customers with a single order have no training signal and are
    excluded (reported)."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    marked = o.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_orders", F.count("*").over(Window.partitionBy("o_custkey"))
    )
    test = marked.where((F.col("rn") == 1) & (F.col("n_orders") >= 2)).select(
        "o_custkey", "o_orderkey"
    )
    train = marked.where(F.col("rn") > 1).select("o_orderkey")
    top10 = (
        li.join(train, li.l_orderkey == train.o_orderkey)
        .groupBy("l_partkey")
        .agg(F.countDistinct(li.l_orderkey).cast("long").alias("cnt"))
    )
    wt = Window.orderBy(F.desc("cnt"), F.asc("l_partkey"))
    top10 = top10.withColumn("rnk", F.row_number().over(wt)).where(F.col("rnk") <= 10)
    held = test.join(li, test.o_orderkey == li.l_orderkey).select(
        "o_custkey", "l_partkey"
    )
    hits = (
        held.join(F.broadcast(top10.select("l_partkey")), "l_partkey", "left_semi")
        .select("o_custkey")
        .distinct()
    )
    n_eval = test.count()
    n_hits = hits.count()
    n_single = marked.where(
        (F.col("rn") == 1) & (F.col("n_orders") == 1)
    ).count()
    return spark.createDataFrame(
        [
            (
                int(n_eval),
                int(n_single),
                int(n_hits),
                int(n_hits * 1_000_000 // max(n_eval, 1)),
            )
        ],
        "n_eval long, n_excluded long, n_hits long, hit_ppm long",
    )


_POPULARITY_SQL = """
WITH marked AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
  FROM orders),
test AS (SELECT o_custkey, o_orderkey FROM marked
         WHERE rn = 1 AND n_orders >= 2),
train AS (SELECT o_orderkey FROM marked WHERE rn > 1),
top10 AS (
  SELECT l_partkey FROM (
    SELECT l.l_partkey, COUNT(DISTINCT l.l_orderkey) AS cnt,
           ROW_NUMBER() OVER (ORDER BY COUNT(DISTINCT l.l_orderkey) DESC,
                              l.l_partkey ASC) AS rnk
    FROM lineitem l JOIN train t ON t.o_orderkey = l.l_orderkey
    GROUP BY l.l_partkey) z
  WHERE rnk <= 10),
hits AS (
  SELECT DISTINCT test.o_custkey
  FROM test JOIN lineitem l ON l.l_orderkey = test.o_orderkey
  WHERE l.l_partkey IN (SELECT l_partkey FROM top10))
SELECT CAST((SELECT COUNT(*) FROM test) AS BIGINT) AS n_eval,
       CAST((SELECT COUNT(*) FROM marked WHERE rn = 1 AND n_orders = 1)
            AS BIGINT) AS n_excluded,
       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_hits,
       CAST((SELECT COUNT(*) FROM hits) * 1000000
            // GREATEST((SELECT COUNT(*) FROM test), 1) AS BIGINT) AS hit_ppm
"""


ORACLES.update(
    {
        "simpson_probe": _SIMPSON_SQL,
        "lorenz_revenue": _LORENZ_SQL,
        "popularity_hit10": _POPULARITY_SQL,
    }
)
QUERIES.update(
    {
        "simpson_probe": q_simpson_probe,
        "lorenz_revenue": q_lorenz_revenue,
        "popularity_hit10": q_popularity_hit10,
    }
)


# ---------------------------------------------------------------------------
# Session-17 batch J: randomness + long-memory diagnostics of the daily
# revenue series.


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of the daily-revenue series against
    its own median (the randomness sanity check completing the
    drift/trend family — Pettitt/PH/KS look for CHANGE, the runs test
    looks for serial dependence of any sign): median is the
    deterministic nearest-rank lower median on the (value, day) total
    order, tie days (== median) are dropped per the classical
    procedure, runs are counted with one lag window, and E[R]/Var[R]/z
    are single double expressions over the exact integer (n₁, n₂, R)."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("d"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100000").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").cast("long").alias("x"))
    )
    wv = Window.orderBy("x", "d")
    n_all = daily.count()
    med_rank = (n_all + 1) // 2
    med = (
        daily.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == med_rank)
        .select(F.col("x").alias("med"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("x") != F.col("med"))
        .select("d", (F.col("x") > F.col("med")).cast("long").alias("s"))
    )
    wd = Window.orderBy("d")
    runs = signed.select(
        "s",
        (F.lag("s").over(wd).isNull() | (F.lag("s").over(wd) != F.col("s")))
        .cast("long")
        .alias("new_run"),
    ).agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("r"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    e_r = F.lit(1.0) + F.lit(2.0) * n1d * n2d / nd
    var_r = (
        F.lit(2.0)
        * n1d
        * n2d
        * (F.lit(2.0) * n1d * n2d - nd)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    return runs.select(
        "n1",
        "n2",
        "r",
        F.round(e_r, 6).alias("expected_r"),
        F.round((F.col("r").cast("double") - e_r) / F.sqrt(var_r), 6).alias("z_r"),
    )


_RUNS_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000) AS x
  FROM orders GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM daily),
med AS (SELECT x AS med FROM (
          SELECT x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn FROM daily) z
        WHERE rn = ((SELECT n FROM n) + 1) // 2),
signed AS (SELECT d, CASE WHEN x > (SELECT med FROM med) THEN 1 ELSE 0 END AS s
           FROM daily WHERE x <> (SELECT med FROM med)),
runs AS (
  SELECT SUM(s) AS n1, SUM(1 - s) AS n2,
         SUM(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END) AS r
  FROM (SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM signed) z)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(r AS BIGINT) AS r,
       ROUND(1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)), 6) AS expected_r,
       ROUND((CAST(r AS DOUBLE)
              - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
             / SQRT(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))), 6)
         AS z_r
FROM runs
"""


_HURST_WINDOWS = (8, 16, 32, 64)


def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by rescaled-range (R/S)
    analysis (Mandelbrot/Wallis; H ≈ 0.5 = memoryless, > 0.5 =
    persistent long memory — the long-range complement of
    revenue_acf's short lags): for block sizes m ∈ {8,16,32,64} the
    series splits into complete blocks, the within-block cumulative
    deviation D_j = m·Σ_{i≤j}x_i − j·S_block stays INTEGER (scaling by
    m avoids the fractional mean), R/S = (max D − min D)/√(m·Σx² − S²)
    is one double per block floored to micro-units, and the per-m mean
    is an exact integer DIV.  H is the log-log OLS slope over the four
    (ln m, ln mean-R/S) points.  Everything is windows over the
    calendar-bounded daily table."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("d"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100000").alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").cast("long").alias("x"))
    )
    wi = Window.orderBy("d")
    idx = daily.select(
        "x", (F.row_number().over(wi) - 1).cast("long").alias("i")
    ).localCheckpoint(eager=True)
    ms = spark.createDataFrame([(m,) for m in _HURST_WINDOWS], "m long")
    blocks = idx.crossJoin(F.broadcast(ms)).select(
        "m",
        "x",
        F.expr("i DIV m").alias("b"),
        F.expr("i % m").alias("j"),
    )
    wb = (
        Window.partitionBy("m", "b")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wblk = Window.partitionBy("m", "b")
    staged = blocks.select(
        "m",
        "b",
        "x",
        F.sum("x").over(wb).alias("cum"),
        (F.col("j") + 1).alias("j1"),
        F.count("*").over(wblk).alias("cnt"),
        F.sum("x").over(wblk).alias("s_blk"),
        F.sum(F.col("x") * F.col("x")).over(wblk).alias("sxx_blk"),
    ).where(F.col("cnt") == F.col("m"))
    devs = staged.select(
        "m",
        "b",
        (F.col("m") * F.col("cum") - F.col("j1") * F.col("s_blk")).alias("dev"),
        "s_blk",
        "sxx_blk",
    )
    per_block = devs.groupBy("m", "b", "s_blk", "sxx_blk").agg(
        F.max("dev").alias("dmax"), F.min("dev").alias("dmin")
    )
    rs = per_block.select(
        "m",
        F.floor(
            F.lit(1e6)
            * (F.col("dmax") - F.col("dmin")).cast("double")
            / F.sqrt(
                (
                    F.col("m") * F.col("sxx_blk") - F.col("s_blk") * F.col("s_blk")
                ).cast("double")
            )
        )
        .cast("long")
        .alias("rs_micro"),
    )
    per_m = rs.groupBy("m").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.expr("SUM(rs_micro) DIV COUNT(*)").cast("long").alias("mean_rs_micro"),
    )
    pts = per_m.select(
        "m",
        "n_blocks",
        "mean_rs_micro",
        F.log(F.col("m").cast("double")).alias("lx"),
        F.log(F.col("mean_rs_micro").cast("double") / F.lit(1e6)).alias("ly"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    k = F.count("*").over(wall).cast("double")
    sx = F.sum("lx").over(wall)
    sy = F.sum("ly").over(wall)
    sxy = F.sum(F.col("lx") * F.col("ly")).over(wall)
    sxx = F.sum(F.col("lx") * F.col("lx")).over(wall)
    return pts.select(
        "m",
        "n_blocks",
        "mean_rs_micro",
        F.round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6).alias("hurst_r"),
    ).orderBy("m")


_HURST_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000) AS x
  FROM orders GROUP BY 1),
idx AS (SELECT x, ROW_NUMBER() OVER (ORDER BY d) - 1 AS i FROM daily),
ms AS (SELECT UNNEST(ARRAY{list(_HURST_WINDOWS)}) AS m),
blocks AS (SELECT m, x, i // m AS b, i % m AS j FROM idx CROSS JOIN ms),
staged AS (
  SELECT m, b, x,
         SUM(x) OVER (PARTITION BY m, b ORDER BY j ROWS UNBOUNDED PRECEDING) AS cum,
         j + 1 AS j1,
         COUNT(*) OVER (PARTITION BY m, b) AS cnt,
         SUM(x) OVER (PARTITION BY m, b) AS s_blk,
         SUM(x * x) OVER (PARTITION BY m, b) AS sxx_blk
  FROM blocks),
devs AS (SELECT m, b, m * cum - j1 * s_blk AS dev, s_blk, sxx_blk
         FROM staged WHERE cnt = m),
per_block AS (SELECT m, b, s_blk, sxx_blk,
                     MAX(dev) AS dmax, MIN(dev) AS dmin
              FROM devs GROUP BY m, b, s_blk, sxx_blk),
rs AS (SELECT m,
              CAST(FLOOR(1e6 * CAST(dmax - dmin AS DOUBLE)
                   / SQRT(CAST(m * sxx_blk - s_blk * s_blk AS DOUBLE)))
                AS BIGINT) AS rs_micro
       FROM per_block),
per_m AS (SELECT m, COUNT(*) AS n_blocks,
                 SUM(rs_micro) // COUNT(*) AS mean_rs_micro
          FROM rs GROUP BY m),
pts AS (SELECT m, n_blocks, mean_rs_micro,
               LN(CAST(m AS DOUBLE)) AS lx,
               LN(CAST(mean_rs_micro AS DOUBLE) / 1e6) AS ly
        FROM per_m)
SELECT CAST(m AS BIGINT) AS m, CAST(n_blocks AS BIGINT) AS n_blocks,
       CAST(mean_rs_micro AS BIGINT) AS mean_rs_micro,
       ROUND((COUNT(*) OVER () * SUM(lx * ly) OVER ()
              - SUM(lx) OVER () * SUM(ly) OVER ())
             / (COUNT(*) OVER () * SUM(lx * lx) OVER ()
                - SUM(lx) OVER () * SUM(lx) OVER ()), 6) AS hurst_r
FROM pts ORDER BY m
"""


ORACLES.update(
    {
        "runs_test": _RUNS_SQL,
        "hurst_rs": _HURST_SQL,
    }
)
QUERIES.update(
    {
        "runs_test": q_runs_test,
        "hurst_rs": q_hurst_rs,
    }
)


# ---------------------------------------------------------------------------
# Driver CORRECTNESS-window rotation (round 5).  The round driver samples
# the FIRST 50 entries of queries() for CORRECTNESS_r{N}.json; rounds 3-4
# checked the identical first-registered 50, leaving every newer query
# without an artifact-of-record row.  Reorder so the window covers the
# newest/riskiest families first (iterative graph ops, sketches, curation
# ops), then the remaining never-driver-checked queries in registration
# order, then the 50 the driver already verified green in r3+r4.  The
# full-registry sweep stays covered by tests/test_entry_contract.py (all
# oracles at sf0.001) and the committed SWEEP_r5.json (sf0.01).

_CHECKED_R3_R4 = [
    "copart_edges", "coorder_edges", "triangles_coorder", "top_depended",
    "pagerank_fixed5", "ppr_fixed3", "bfs_hops", "pagerank_weighted4",
    "degree_histogram", "edge_embeddedness", "components", "components_star",
    "lpa_fixed2", "triangles", "current_state", "state_history",
    "upsert_latest_wins", "dedup_exact", "text_stats", "doc_fingerprint",
    "knn_cosine", "bigram_jaccard", "anti_join_customers", "window_topk",
    "rollup_lineitem", "gitlab_pipeline_rollup", "gitlab_users_per_group",
    "gitlab_runner_util", "gitlab_member_access", "asof_last_signup",
    "sessionize", "pivot_events", "cube_orders", "intersect_users", "langid",
    "quality", "token_counts", "knn_bruteforce_op", "minhash_pairs",
    "simhash_pairs", "prov_stage_rollup", "prov_depends_fanout",
    "kube_deploy_transitions", "kube_owns_chain", "kube_containers_guard",
    "exact_jaccard_pairs", "kcore10", "harmonic_centrality", "cosine_pairs",
    "embed_neardup",
]

# riskiest-first within the fresh window: this session's additions are
# the newest (never driver-checked anywhere), then the VERDICT r4
# families
_ROUND5_PRIORITY = [
    "kmv_distinct", "gt_smoothing", "feature_hash_audit",
    "revenue_acf", "pettitt_change", "logrank_test",
    "ap_eval", "cka_views", "conformal_pvalues",
    "euler_check", "hyperbolicity4",
    "walk_spectrum8", "ab_srm", "als_rank1",
    "maxcut_sweep2", "theil_sen", "kruskal_wallis", "chi2_independence",
    "bcubed_eval", "walk_entropy", "kanon_audit",
    "page_hinkley", "ks_2samp", "best_stump",
    "simpson_probe", "lorenz_revenue", "popularity_hit10",
    "runs_test", "hurst_rs",
    "kn_bigram_ppl", "transition_entropy", "kaplan_meier", "item_cf10",
    "kclique_comm3", "articulation_pts", "jl_recall", "logreg_gd3",
    "ewma_forecast", "kmeans_nmi", "winnow_pairs", "knn_homophily",
    "bmatching2", "transitive_reduction2", "triadic_closure",
    "eps_components", "lp_auc_cn", "attribution_markov5", "subseq_support3",
    "int8_recall", "seasonality_dow", "wilson_returns", "mann_kendall",
    "clique_census", "biconnected_blocks",
    "truss_components", "struct_roles", "ols_price_qty",
    "chi2_terms", "rank_corr", "steiner_tree4", "pca_power3",
    "odd_walk_len", "cusum_hourly", "rake_top10", "snn_clusters",
    "molloy_reed", "sbm_likelihood", "err_eval", "graphlet4_census",
    "nbt_centrality3", "forman_curvature", "local_bridges",
    "two_edge_cc", "packing_curve", "dbscan_star",
    "absorb_funnel6", "event_trigrams_top",
    "subgraph_centrality4", "graph_center", "knn_hubness", "embed_isotropy",
    "interval_overlaps", "dq_report",
    "path3_census", "collective_influence2", "core_periphery_fit",
    "trophic_levels4", "leiden_refine", "scc_condensation", "mmr_diversify",
    "onion_layers", "token_entropy", "pagerank_residuals6",
    "q6_forecast", "q13_order_dist", "q15_top_supplier",
    "q8_market_share", "q17_small_qty", "q19_disjunctive",
    "q4_priority_check", "q21_waiting_supplier", "ams_f2", "hourly_anomaly",
    "ari_partitions", "tie_overlap", "silhouette8", "greedy_cover4",
    "grouping_sets_orders", "rolling_revenue7", "edit_dist_pairs",
    "temporal_motifs", "event_transitions", "weighted_jaccard20",
    "assoc_rules", "q9_profit", "friendship_paradox",
    "knn_curve", "customer_deciles", "revenue_mom", "session_windows",
    "partition_performance", "burstiness", "q1_pricing",
    "partition_cut_audit", "rfm_segments", "benford_digits", "abc_parts",
    "mrr_eval", "cohort_ltv", "ship_latency",
    "hitting_time6", "temporal_reach4", "fiedler4", "influence_seeds5",
    "scan_clusters", "edge_betweenness4", "coarsen_hem", "fiedler_coarse",
    "vertex_cover2", "bipartite_check", "mad_outliers", "auc_score",
    "hll_users", "rrf_hybrid", "ppr_nibble", "disparity_backbone",
    "matryoshka_recall", "bigram_ppl", "label_spread3", "kcenter8",
    "split_leakage", "burt_constraint", "lang_confusion",
    "percolation_profile", "neardup_clusters", "triad_census", "heaps_curve",
    "gini_degree", "k4_cliques", "source_dup_matrix", "tok_fertility",
    "q3_shipping", "q5_local_volume", "q10_returned", "cascade_lt",
    "eff_diameter", "densification_curve", "readability",
    "containment_pairs", "minhash_calibration", "attack_tolerance",
    "q7_nation_volume", "late_shipments", "q18_large_orders", "novelty",
    "q14_promo_ratio", "q16_supplier_counts", "q22_idle_rich",
    "revenue_concentration", "order_gaps", "degree_core_corr",
    "graph_profile",
    "msf_copart", "dag_paths", "dag_levels", "louvain_move1",
    "random_walks_biased3", "semdedup8", "seq_packing", "cm_heavy_hitters",
    "fm_distinct_parts", "bloom_prune", "skew_report", "betweenness_w3",
    "closeness_w4", "ktruss6", "ppr_push4", "wedge_sample_cc", "sage_agg",
    "hnsw_knn", "kmeans8", "int8_quant", "pii_scrub", "dup_spans8",
    "source_overlap", "vocab_coverage", "bowtie_parts", "matching_coorder",
    "simrank3", "spam_mass3", "scc_custgraph", "mis_luby",
]


def _rotated(order_first: list[str], then_last: list[str]) -> list[str]:
    rest = [q for q in QUERIES if q not in set(order_first) | set(then_last)]
    return order_first + rest + then_last


_ROTATION = _rotated(_ROUND5_PRIORITY, _CHECKED_R3_R4)
QUERIES = {name: QUERIES[name] for name in _ROTATION}
ORACLES = {name: ORACLES[name] for name in _ROTATION if name in ORACLES}
