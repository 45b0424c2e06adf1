"""Dedup operator tests: planted duplicates, minhash estimate quality,
simhash Hamming behavior, candidate completeness for near-identical docs."""

import pytest
from pyspark.sql import functions as F

from polar_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # 0/1: exact duplicates; 2: near-dup of 0 (one word changed);
    # 3: half-overlap; 4..9: unrelated
    rows.append((0, BASE))
    rows.append((1, BASE))
    rows.append((2, BASE.replace("lazy", "sleepy")))
    rows.append((3, BASE[: len(BASE) // 2] + " completely different tail of words here"))
    for i in range(4, 10):
        rows.append((i, " ".join(f"w{i}_{j} token{j * i}" for j in range(30))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = dedup.exact_dedup(docs).collect()
    dupg = [g for g in groups if g["n_docs"] > 1]
    assert len(dupg) == 1
    assert dupg[0]["n_docs"] == 2 and dupg[0]["keep_id"] == 0


def test_shingles_deterministic(docs):
    a = sorted(map(tuple, dedup.shingles(docs).collect()))
    b = sorted(map(tuple, dedup.shingles(docs).collect()))
    assert a == b
    # identical docs → identical shingle sets
    sh = dedup.shingles(docs)
    s0 = {r["shingle_hash"] for r in sh.where(F.col("_id") == 0).collect()}
    s1 = {r["shingle_hash"] for r in sh.where(F.col("_id") == 1).collect()}
    assert s0 == s1


def test_minhash_lsh_finds_planted_pairs(docs):
    out = dedup.minhash_lsh_dedup(docs, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)]["jaccard"] == 1.0
    assert (0, 2) in pairs and (1, 2) in pairs  # near-dup found
    assert pairs[(0, 2)]["jaccard"] > 0.5
    # unrelated docs never pass
    assert all(a <= 3 and b <= 3 for a, b in pairs)


def test_minhash_estimate_close_to_exact(docs):
    out = dedup.minhash_lsh_dedup(docs, threshold=0.5).collect()
    for r in out:
        assert abs(r["est_jaccard"] - r["jaccard"]) < 0.25


def test_simhash_exact_dup_zero_hamming(docs):
    sig = dedup.simhash_signatures(docs)
    cand = dedup.simhash_candidates(sig)
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in cand.collect()}
    assert ham.get((0, 1)) == 0
    if (0, 2) in ham:
        assert ham[(0, 2)] <= 16  # near-dup → small distance


def test_simhash_deterministic(docs):
    s1 = sorted(map(tuple, dedup.simhash_signatures(docs).collect()))
    s2 = sorted(map(tuple, dedup.simhash_signatures(docs).collect()))
    assert s1 == s2


@pytest.fixture(scope="module")
def big_docs(spark):
    # two docs, each >1000 distinct shingles — far beyond the shrunken
    # Arrow batch below, so each doc MUST straddle batch boundaries
    rows = [
        (100, " ".join(f"alpha{j} beta{j}" for j in range(600))),
        (200, " ".join(f"gamma{j} delta{j}" for j in range(600))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _with_small_batches(spark, fn):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        return fn()
    finally:
        spark.conf.set(key, old)


def test_minhash_signature_survives_batch_split(spark, big_docs):
    """Regression: a doc whose shingle rows straddle the Arrow batch
    boundary must still yield exactly ONE signature, identical to the
    unsplit run (pre-fix: one partial signature per batch chunk)."""
    sh = dedup.shingles(big_docs)
    assert sh.groupBy("_id").count().agg(F.min("count")).collect()[0][0] > 1000
    ref = {r["_id"]: tuple(r["sig"]) for r in dedup.minhash_signatures(sh).collect()}
    rows = _with_small_batches(spark, lambda: dedup.minhash_signatures(sh).collect())
    assert len(rows) == 2  # one row per doc, no partial signatures
    assert {r["_id"]: tuple(r["sig"]) for r in rows} == ref


def test_simhash_signature_survives_batch_split(spark, big_docs):
    ref = {r["_id"]: r["simhash"] for r in dedup.simhash_signatures(big_docs).collect()}
    rows = _with_small_batches(
        spark, lambda: dedup.simhash_signatures(big_docs).collect()
    )
    assert len(rows) == 2
    assert {r["_id"]: r["simhash"] for r in rows} == ref

def test_minhash_lsh_dedup_releases_caches(docs):
    """minhash_lsh_dedup must not leak persisted RDDs into the session
    (VERDICT r2 #6): both the exact-verify and estimate-only paths
    unpersist their corpus-sized intermediates before returning."""
    from polar_spark.operators.dedup import minhash_lsh_dedup

    spark = docs.sparkSession
    # DataFrame.persist registers in the SQL CacheManager (localCheckpoint
    # RDDs do not, and are released with their DataFrame by the context
    # cleaner) — so an empty CacheManager proves sh/sigs were unpersisted
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    out = minhash_lsh_dedup(docs, threshold=0.5, exact_verify=True)
    assert out.count() >= 0 and cm.isEmpty()
    out2 = minhash_lsh_dedup(docs, threshold=0.5, exact_verify=False)
    assert out2.count() >= 0 and cm.isEmpty()

def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Recall pin (VERDICT r2 #8): MinHash-LSH (16 bands x 4 rows) must
    find >= 95% of all pairs whose EXACT 3-gram Jaccard >= 0.8, on a
    corpus of 120 docs with planted mutations straddling the threshold.
    Precision is exact by construction (candidates are exact-verified),
    asserted as got ⊆ truth."""
    import random

    rng = random.Random(5)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    did = 0
    for b in range(60):
        base = [rng.choice(vocab) for _ in range(60)]
        rows.append((did, " ".join(base)))
        did += 1
        mut = list(base)
        n_mut = 1 if b % 3 else 3  # most pairs land above 0.8, some below
        for _ in range(n_mut):
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
        rows.append((did, " ".join(mut)))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = dedup.shingles(docs)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n"))
    ga = sh.select(F.col("_id").alias("id_a"), "shingle_hash")
    gb = sh.select(F.col("_id").alias("id_b"), "shingle_hash")
    inter = (
        ga.join(gb, "shingle_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("nb"))
    j = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    exact = inter.join(na, "id_a").join(nb, "id_b").where(j >= 0.8)
    truth = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert len(truth) >= 30  # non-vacuous ground truth

    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_dedup(docs, threshold=0.8).collect()
    }
    assert got <= truth  # exact-verify ⇒ no false positives
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, f"recall {recall:.3f} over {len(truth)} true pairs"


def test_minhash_arith_finds_planted_pairs_and_estimates(docs):
    """The SQL-replayable minhash family behaves like the xxhash64 one:
    exact dups estimate 1.0, planted near-dups surface, unrelated docs
    never pair."""
    out = {(r["id_a"], r["id_b"]): r for r in dedup.minhash_pairs_arith(docs).collect()}
    assert out[(0, 1)]["est_j"] == 1.0
    assert out[(0, 1)]["n_shared_bands"] == 16
    assert (0, 2) in out and out[(0, 2)]["est_j"] > 0.5
    assert all(a <= 3 and b <= 3 for a, b in out)


def test_simhash_arith_exact_dup_zero_hamming(docs):
    ham = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs_arith(docs).collect()
    }
    assert ham.get((0, 1)) == 0
    assert all(h <= 12 for h in ham.values())
