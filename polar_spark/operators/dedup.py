"""Deduplication operators for large-scale corpus curation.

Four families, scale-ranked:

- exact:      sha256 hash-groupBy (one shuffle, partial-agg combined)
- minhash+LSH: shingle → minhash signature → band buckets → bucket join
               (candidate generation never compares all pairs)
- simhash:    64-bit sign-of-weighted-sum fingerprint, banded for
               Hamming-neighbor candidate generation
- n-gram Jaccard: exact verification joins for candidate pairs

Design for 100 TB: everything before the candidate join is linear in
the corpus and stays in whole-stage codegen (shingling/hashing are
``split``/``explode``/``xxhash64``); the only Python is the per-doc
signature fold, which is a vectorized numpy ``applyInPandas`` over
pre-hashed shingles (Arrow batches, no per-row Python).  Candidate
pairs are generated per LSH band bucket — bucket sizes bound reducer
fan-out, and a ``max_bucket`` guard drops degenerate buckets (all-equal
content) the way production dedup pipelines do.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.functions.batching import grouped_batches

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content sha256 (the reference's content
    addressing — /root/reference/src/agents/lib/src/events.rs:175-177).
    Returns (content_sha256, n_docs, keep_id) — keep the smallest id."""
    return (
        df.groupBy(F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha256"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingle hashes per doc: (id, shingle_hash).
    Pure JVM: split → slide via expression window on position → xxhash64."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    )
    # n-gram via transform over index range: gram_i = concat(t[i..i+n-1])
    grams = toks.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("_t") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i + 1, n)),
            )
        ).alias("shingle"),
    ).where(F.length("shingle") > 0)
    return grams.select(
        "_id", F.xxhash64("shingle").alias("shingle_hash")
    ).dropDuplicates(["_id", "shingle_hash"])


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = 64, seed: int = 7
) -> DataFrame:
    """(id, sig array<long>) — minhash over the deterministic hash
    family h_i(x) = ((a_i·(x mod M) + b_i) mod M) with the a·x product
    wrapping mod 2^64 (numpy uint64 arithmetic; M = 2^61-1 reduces the
    final value).  Not a true mod-M universal family — the mod-2^64
    wrap composes in — but a fixed, seeded, uniformly-mixing 64-bit
    family, which is all MinHash needs.  The fold is a vectorized numpy
    broadcast per re-chunked Arrow batch (``applyInPandas`` per doc
    group would add per-group Arrow overhead; instead we sort-group
    within partitions after a single repartition by id and re-chunk
    with ``grouped_batches`` so a doc is never split across the Arrow
    batch boundary)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in grouped_batches(batches, ["_id"]):
            out_ids, out_sigs = [], []
            for did, grp in pdf.groupby("_id"):
                x = grp["shingle_hash"].to_numpy(dtype=np.uint64)
                # (H, S) broadcast in uint64 (wraps mod 2^64), reduced mod M
                hx = (
                    (a.astype(np.uint64)[:, None] * (x[None, :] % _MERSENNE)) + b.astype(np.uint64)[:, None]
                ) % np.uint64(_MERSENNE)
                out_ids.append(did)
                out_sigs.append(hx.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({"_id": out_ids, "sig": out_sigs})

    # a doc's shingles land in one partition (repartition), are contiguous
    # (sortWithinPartitions), and grouped_batches keeps them in one frame
    part = shingle_df.repartition("_id").sortWithinPartitions("_id")
    return part.mapInPandas(fold, schema="_id long, sig array<long>")


def minhash_lsh_candidates(
    sig_df: DataFrame, bands: int = 16, rows_per_band: int = 4, max_bucket: int = 1000
) -> DataFrame:
    """Band the signatures and self-join buckets → candidate pairs
    (id_a < id_b, n_shared_bands).  ``max_bucket`` drops degenerate
    buckets to bound the quadratic blow-up."""
    banded = sig_df.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), bidx * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    sized = banded.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).where(F.col("_n") <= max_bucket)
    l = sized.select("band", "bucket", F.col("_id").alias("id_a"))
    r = sized.select("band", "bucket", F.col("_id").alias("id_b"))
    return (
        l.join(r, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def minhash_estimate(sig_df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard per candidate pair = fraction of equal minhash
    slots (zip_with over the two signatures)."""
    sa = sig_df.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig_df.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"))
    eq = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            (eq.cast("double") / F.size("sig_a")).alias("est_jaccard"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    exact_verify: bool = True,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle → minhash → LSH candidates →
    (optionally) exact Jaccard verification of candidates only.
    Returns (id_a, id_b, est_jaccard[, jaccard]) above threshold."""
    sh = shingles(df, text_col, id_col, n).persist()
    sigs = minhash_signatures(sh, num_hashes).persist()
    rows_per_band = num_hashes // bands
    cand = minhash_lsh_candidates(sigs, bands, rows_per_band)
    est = minhash_estimate(sigs, cand)
    if not exact_verify:
        # materialize before releasing the caches (the result is tiny —
        # pairs above threshold — while sh/sigs are corpus-sized; leaving
        # them cached would accumulate across queries in one session)
        out = est.where(F.col("est_jaccard") >= threshold).localCheckpoint(eager=True)
        sigs.unpersist()
        sh.unpersist()
        return out
    ga = sh.select(F.col("_id").alias("id_a"), F.col("shingle_hash").alias("h"))
    gb = sh.select(F.col("_id").alias("id_b"), F.col("shingle_hash").alias("h"))
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    inter = (
        est.select("id_a", "id_b")
        .join(ga, "id_a")
        .join(gb, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("nb"))
    out = (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("c"), F.lit(0)))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .localCheckpoint(eager=True)  # materialize, then release the caches
    )
    sigs.unpersist()
    sh.unpersist()
    return out


# ------------------------------------------------------------- replayable
# SQL-replayable near-dup family.  Every hash is explicit 64-bit-safe
# integer arithmetic — a polynomial char hash mod 2^31-1 for the
# shingle/token value, affine permutations h_i(x) = (a_i*x + b_i) mod
# 2^31-1 for the signature slots — so an independent SQL engine (the
# correctness oracle) recomputes the signatures bit-for-bit.  The
# signature fold is a plain groupBy with ``num_hashes`` MIN (or SUM)
# aggregates: whole-stage codegen, ONE shuffle with map-side partial
# aggregation, zero Python — at 100 TB this is the preferred plan shape;
# the xxhash64/numpy path above keeps the full 64-bit hash space for
# collision-sensitive corpora.

_P31 = (1 << 31) - 1  # Mersenne prime 2^31-1: a*x+b < 2^62 fits int64
_POLY_B = 131


def affine_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the permutation family, derived from
    a 63-bit LCG — plain integer literals the oracle SQL inlines."""
    params, s = [], seed
    for _ in range(num_hashes):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = 1 + s % (_P31 - 1)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        params.append((a, s % _P31))
    return params


def polyhash(col: F.Column) -> F.Column:
    """Order-dependent polynomial char hash: fold (acc·B + codepoint)
    mod 2^31-1 over the string — JVM higher-order expression; DuckDB
    replays it with list_reduce over the same codepoints."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.ascii(F.substring(col, i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * _POLY_B + c) % _P31
    )


def _polyhash_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform("
        f"range(1, length({expr}) + 1), i -> ascii(substr({expr}, i, 1))::BIGINT)), "
        f"(acc, c) -> (acc * {_POLY_B} + c) % {_P31})"
    )


def minhash_pairs_arith(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash+LSH candidate pairs over the replayable hash family:
    (id_a, id_b, n_shared_bands, est_j).  Same pipeline shape as
    ``minhash_lsh_dedup`` (linear shingle/signature stages, banded
    bucket join with a ``max_bucket`` degeneracy guard) with the
    signature fold as ``num_hashes`` MIN aggregates in one groupBy."""
    rows = num_hashes // bands
    params = affine_params(num_hashes, seed)
    toks = df.select(
        F.col(id_col).alias("_id"), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t")
    )
    grams = toks.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("_t") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i + 1, n)),
            )
        ).alias("g"),
    ).where(F.length("g") > 0)
    xs = grams.select("_id", polyhash(F.col("g")).alias("x")).dropDuplicates(["_id", "x"])
    sigs = xs.groupBy("_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(_P31)).alias(f"s{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"s{j * rows + k}").cast("string") for k in range(rows)]
                ).alias("bucket"),
            )
            for j in range(bands)
        ]
    )
    banded = sigs.select("_id", F.explode(band_structs).alias("bb")).select(
        "_id", "bb.band", "bb.bucket"
    )
    sized = banded.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).where(F.col("_n") <= max_bucket)
    l = sized.select("band", "bucket", F.col("_id").alias("id_a"))
    r = sized.select("band", "bucket", F.col("_id").alias("id_b"))
    cand = (
        l.join(r, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )
    sa = sigs.select(
        F.col("_id").alias("id_a"), *[F.col(f"s{i}").alias(f"sa{i}") for i in range(num_hashes)]
    )
    sb = sigs.select(
        F.col("_id").alias("id_b"), *[F.col(f"s{i}").alias(f"sb{i}") for i in range(num_hashes)]
    )
    eq_terms = [
        (F.col(f"sa{i}") == F.col(f"sb{i}")).cast("int") for i in range(num_hashes)
    ]
    eq = eq_terms[0]
    for t in eq_terms[1:]:
        eq = eq + t
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            F.round(eq.cast("double") / num_hashes, 6).alias("est_j"),
        )
    )


def minhash_pairs_arith_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    max_bucket: int = 1000,
) -> str:
    """DuckDB SQL replaying ``minhash_pairs_arith`` bit-for-bit."""
    rows = num_hashes // bands
    params = affine_params(num_hashes, seed)
    mins = ",\n    ".join(
        f"min(({a} * x + {b}) % {_P31}) AS s{i}" for i, (a, b) in enumerate(params)
    )
    band_selects = "\n    UNION ALL ".join(
        f"SELECT _id, {j} AS band, "
        + " || ',' || ".join(f"s{j * rows + k}::VARCHAR" for k in range(rows))
        + " AS bucket FROM sigs"
        for j in range(bands)
    )
    eq = " + ".join(
        f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS _id, regexp_split_to_array(trim({text_col}), '\\s+') AS t
  FROM {table}
), grams AS (
  SELECT _id, array_to_string(t[i + 1 : i + {n}], ' ') AS g
  FROM toks, unnest(range(0, greatest(len(t) - {n}, 0) + 1)) AS u(i)
), xs AS (
  SELECT DISTINCT _id, {_polyhash_sql('g')} AS x
  FROM grams WHERE length(g) > 0
), sigs AS (
  SELECT _id, {mins}
  FROM xs GROUP BY _id
), banded AS (
  {band_selects}
), sized AS (
  SELECT * FROM banded QUALIFY count(*) OVER (PARTITION BY band, bucket) <= {max_bucket}
), cand AS (
  SELECT l._id AS id_a, r._id AS id_b, count(*) AS n_shared_bands
  FROM sized l JOIN sized r USING (band, bucket)
  WHERE l._id < r._id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b, c.n_shared_bands,
       round(({eq})::DOUBLE / {num_hashes}, 6) AS est_j
FROM cand c JOIN sigs a ON c.id_a = a._id JOIN sigs b ON c.id_b = b._id
ORDER BY c.id_a, c.id_b
"""


def simhash_pairs_arith(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    band_bits: int = 15,
    seed: int = 7,
    max_hamming: int = 12,
) -> DataFrame:
    """SimHash banded Hamming candidates over the replayable family:
    (id_a, id_b, hamming).  Bit i of the fingerprint is the sign of
    Σ_tokens (2·((a_i·x + b_i) mod p mod 2) − 1); 60 bits keep the
    fingerprint strictly inside a signed int64 so both engines agree on
    shifts and xor.  Candidate generation catches every pair with
    Hamming distance < bits/band_bits."""
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    params = affine_params(bits, seed)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    ).where(F.length("w") > 0)
    xs = toks.select("_id", polyhash(F.col("w")).alias("x"))
    scores = xs.groupBy("_id").agg(
        *[
            F.sum(
                2 * ((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(_P31) % 2) - 1
            ).alias(f"c{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    fp = scores.select(
        "_id",
        sum(
            [
                F.when(F.col(f"c{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
                for i in range(bits)
            ],
            F.lit(0).cast("long"),
        ).alias("fp"),
    )
    banded = fp.select(
        "_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftrightunsigned("fp", j * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for j in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "fp", "bb.band", "bb.key")
    l = banded.select("band", "key", F.col("_id").alias("id_a"), F.col("fp").alias("fp_a"))
    r = banded.select("band", "key", F.col("_id").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        l.join(r, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_arith_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    band_bits: int = 15,
    seed: int = 7,
    max_hamming: int = 12,
) -> str:
    """DuckDB SQL replaying ``simhash_pairs_arith`` bit-for-bit."""
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    params = affine_params(bits, seed)
    sums = ",\n    ".join(
        f"sum(2 * (({a} * x + {b}) % {_P31} % 2) - 1) AS c{i}"
        for i, (a, b) in enumerate(params)
    )
    fp = " + ".join(
        f"CASE WHEN c{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END" for i in range(bits)
    )
    band_selects = "\n    UNION ALL ".join(
        f"SELECT _id, fp, {j} AS band, (fp >> {j * band_bits}) & {mask} AS key FROM fp"
        for j in range(nbands)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS _id, w
  FROM {table}, unnest(regexp_split_to_array(trim({text_col}), '\\s+')) AS u(w)
  WHERE length(w) > 0
), xs AS (
  SELECT _id, {_polyhash_sql('w')} AS x FROM toks
), scores AS (
  SELECT _id, {sums}
  FROM xs GROUP BY _id
), fp AS (
  SELECT _id, {fp} AS fp FROM scores
), banded AS (
  {band_selects}
)
SELECT DISTINCT l._id AS id_a, r._id AS id_b,
       bit_count(xor(l.fp, r.fp))::BIGINT AS hamming
FROM banded l JOIN banded r USING (band, key)
WHERE l._id < r._id AND bit_count(xor(l.fp, r.fp)) <= {max_hamming}
ORDER BY id_a, id_b
"""


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit sum of token-hash
    bits.  Token hashing is JVM (xxhash64); the per-doc bit fold is
    numpy over Arrow batches."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    ).select("_id", F.xxhash64("w").alias("h"))

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in grouped_batches(batches, ["_id"]):
            ids, sigs = [], []
            for did, grp in pdf.groupby("_id"):
                h = grp["h"].to_numpy(dtype=np.uint64)
                bitsm = (h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & np.uint64(1)
                score = (2 * bitsm.astype(np.int64) - 1).sum(axis=0)
                sig = np.uint64(0)
                for i in range(bits):
                    if score[i] > 0:
                        sig |= np.uint64(1) << np.uint64(i)
                ids.append(did)
                sigs.append(np.int64(sig))
            yield pd.DataFrame({"_id": ids, "simhash": sigs})

    part = toks.repartition("_id").sortWithinPartitions("_id")
    return part.mapInPandas(fold, schema="_id long, simhash long")


def simhash_candidates(sig_df: DataFrame, band_bits: int = 16) -> DataFrame:
    """Hamming-neighbor candidates: split the 64-bit fingerprint into
    64/band_bits bands; pairs sharing any band are candidates (catches
    all pairs with Hamming distance < 64/band_bits).  Returns
    (id_a, id_b, hamming)."""
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sig_df.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.key")
    l = banded.select("band", "key", F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    r = banded.select("band", "key", F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        l.join(r, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
    )
