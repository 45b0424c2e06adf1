"""Text-analysis operators for corpus curation — all JVM expressions
(whole-stage codegen), no Python in the hot path.

- language-ID: stopword-profile n-gram heuristic
- quality scoring: length / punctuation / stopword / digit ratios
- token counting: whitespace + BPE-ish regex
- document fingerprinting: positional rolling hash + content sha256
- PII detection/redaction: email/phone/SSN/IPv4 regex counts + scrub
- repetition scoring: duplicate word-n-gram fractions (Gopher-style)
- contamination screening: benchmark n-gram overlap via broadcast join
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# minimal stopword profiles (top function words per language)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}


def _tokens(text_col: str) -> F.Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``score_<lang>`` (stopword hit fraction) and ``lang_pred``
    (argmax, ties → alphabetical) columns."""
    toks = _tokens(text_col)
    out = df.withColumn("_toks", toks)
    for lang, words in STOPWORDS.items():
        overlap = F.aggregate(
            F.col("_toks"),
            F.lit(0),
            lambda acc, t: acc + F.when(t.isin(words), 1).otherwise(0),
        )
        out = out.withColumn(
            f"score_{lang}", overlap.cast("double") / F.greatest(F.size("_toks"), F.lit(1))
        )
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )
    return out.withColumn("lang_pred", pred).drop("_toks")


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds curation-quality features + a composite [0,1] score:
    n_tokens, mean_token_len, punct_ratio, digit_ratio, stopword_ratio,
    upper_ratio, quality."""
    toks = _tokens(text_col)
    n_tok = F.size(toks).cast("double")
    n_chr = F.length(text_col).cast("double")
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?'\"()\[\]]", "")).cast("double")
    digit = F.length(F.regexp_replace(text_col, r"[^0-9]", "")).cast("double")
    upper = F.length(F.regexp_replace(text_col, r"[^A-Z]", "")).cast("double")
    en = STOPWORDS["en"]
    stop = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.when(t.isin(en), 1).otherwise(0)
    ).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    safe_chr = F.greatest(n_chr, F.lit(1.0))
    out = df.select(
        "*",
        n_tok.cast("long").alias("n_tokens"),
        (F.length(F.regexp_replace(text_col, r"\s", "")).cast("double") / safe_tok).alias(
            "mean_token_len"
        ),
        (punct / safe_chr).alias("punct_ratio"),
        (digit / safe_chr).alias("digit_ratio"),
        (upper / safe_chr).alias("upper_ratio"),
        (stop / safe_tok).alias("stopword_ratio"),
    )
    # composite: length sweet-spot, low digit noise, some stopwords
    len_term = F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0))
    # no rounding: the composite is deterministic per-row IEEE arithmetic
    # (identical bit pattern in any engine evaluating the same formula);
    # rounding would *introduce* cross-engine half-boundary mismatches
    qual = (
        F.lit(0.4) * len_term
        + F.lit(0.3) * F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.col("digit_ratio") * 10, F.lit(1.0)))
    )
    return out.withColumn("quality", qual)


_BPE_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish sub-token count (letters runs,
    ≤3-digit number chunks, single punctuation — a cheap proxy for
    training-token accounting)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), F.lit(0)))
    return df.select(
        "*",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """content sha256 (reference identity invariant) + positional
    rolling hash Σ i·ascii(c_i) mod (1e9+7)."""
    chars = F.explode(F.sequence(F.lit(1), F.length(text_col)))
    rolled = (
        df.select("*", chars.alias("_i"))
        .select(
            "*",
            (
                F.col("_i").cast("long")
                * F.ascii(F.substring(F.col(text_col), F.col("_i"), F.lit(1)))
            ).alias("_t"),
        )
        .groupBy(*df.columns)
        .agg((F.sum("_t") % F.lit(1000000007)).cast("long").alias("rolling_fp"))
    )
    return rolled.withColumn("content_sha256", F.sha2(F.col(text_col).cast("binary"), 256))


# -- PII detection / redaction ---------------------------------------------
# Patterns kept to the Java-regex ∩ RE2 common dialect so the DuckDB oracle
# replays them byte-identically.  Redaction order is fixed (email → SSN →
# phone → IPv4); the classes are mutually non-overlapping by construction.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_<class>`` match counts per PII class and a ``redacted``
    column with every match replaced by its placeholder token — the
    standard pre-training scrub pass.  All JVM regexp (codegen); at
    100 TB this is a pure map stage, no shuffle."""
    out = df
    red = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).cast(
                "long"
            ),
        )
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)


def ngram_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: for word bigrams and trigrams the
    duplicate fraction (1 − distinct/total) and the max single-gram
    count.  One explode + two hash aggregations (map-side combined);
    the doc_id keys are unique per group so there is no skew beyond
    document length."""
    toks = _tokens(text_col)
    base = df.select("*", toks.alias("_t"))

    def grams(n: int) -> F.Column:
        # positions 1 .. size-n+1, each an n-token space-joined gram,
        # tagged with n so both sizes ride ONE explode/shuffle; guarded:
        # sequence(1, 0) would generate a DESCENDING [1, 0] in Spark
        return F.when(
            F.size("_t") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - (n - 1)),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.array_join(F.slice(F.col("_t"), i, n), " ").alias("g"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    exploded = base.select(
        *df.columns, F.explode(F.concat(grams(2), grams(3))).alias("_gr")
    ).select(*df.columns, F.col("_gr.n").alias("_n"), F.col("_gr.g").alias("_g"))
    per_gram = exploded.groupBy(*df.columns, "_n", "_g").agg(
        F.count("*").alias("_c")
    )
    two = F.col("_n") == 2
    three = F.col("_n") == 3
    agg = per_gram.groupBy(*df.columns).agg(
        F.coalesce(F.sum(F.when(two, F.col("_c"))), F.lit(0)).alias("_tot2"),
        F.coalesce(F.sum(F.when(two, 1)), F.lit(0)).alias("_dst2"),
        F.coalesce(F.max(F.when(two, F.col("_c"))), F.lit(0)).alias("max_bigram_count"),
        F.coalesce(F.sum(F.when(three, F.col("_c"))), F.lit(0)).alias("_tot3"),
        F.coalesce(F.sum(F.when(three, 1)), F.lit(0)).alias("_dst3"),
        F.coalesce(F.max(F.when(three, F.col("_c"))), F.lit(0)).alias(
            "max_trigram_count"
        ),
    )
    frac = lambda tot, dst: F.when(  # noqa: E731
        F.col(tot) > 0,
        F.lit(1.0) - F.col(dst).cast("double") / F.col(tot).cast("double"),
    ).otherwise(F.lit(0.0))
    # left join back: documents too short for any gram keep 0-rows
    return df.join(agg, df.columns, "left").select(
        *df.columns,
        frac("_tot2", "_dst2").alias("dup_bigram_frac"),
        frac("_tot3", "_dst3").alias("dup_trigram_frac"),
        F.coalesce(F.col("max_bigram_count"), F.lit(0))
        .cast("long")
        .alias("max_bigram_count"),
        F.coalesce(F.col("max_trigram_count"), F.lit(0))
        .cast("long")
        .alias("max_trigram_count"),
    )


def contamination_overlap(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination screen: counts each document's word
    ``n``-gram overlap with an eval set.  ``bench`` must expose a single
    string column ``g`` of benchmark n-grams (deduplicated here).  The
    eval set is tiny relative to a 100 TB corpus, so it is broadcast —
    the corpus side never shuffles for the join; the per-doc count is a
    partial-aggregated groupBy on unique doc keys.  Returns every input
    row with ``n_contaminated_grams`` (distinct benchmark grams hit),
    ``n_contaminated_occurrences`` (total gram occurrences hit) and a
    boolean ``contaminated``."""
    toks = _tokens(text_col)
    grams = df.select(
        *df.columns,
        F.explode(
            # guard: sequence(1, 0) would be a DESCENDING [1, 0] in Spark
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_g"),
    )
    hits = (
        grams.join(F.broadcast(bench.select(F.col("g").alias("_g")).distinct()), "_g")
        .groupBy(*df.columns)
        .agg(
            F.count_distinct("_g").alias("n_contaminated_grams"),
            F.count("*").alias("n_contaminated_occurrences"),
        )
    )
    return df.join(hits, df.columns, "left").select(
        *df.columns,
        F.coalesce("n_contaminated_grams", F.lit(0)).alias("n_contaminated_grams"),
        F.coalesce("n_contaminated_occurrences", F.lit(0)).alias(
            "n_contaminated_occurrences"
        ),
        (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
    )


SPAN_B = 1_000_003  # second-level multiplier: acc<2^31 keeps acc*B < 2^51


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    hash_family: str = "arith",
) -> DataFrame:
    """Cross-document duplicated k-token spans — the n-gram-hash form
    of substring-level training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): suffix
    arrays find verbatim repeats at any offset; at cluster scale the
    standard substitute is hashing every k-token sliding window and
    grouping.  Linear in total tokens (one explode, ~tokens rows/doc),
    ONE groupBy with map-side partial aggregation, zero Python — the
    span hash is SQL-replayable, so the DuckDB oracle recomputes every
    window hash bit-for-bit.

    The hash is TWO-LEVEL: each token is char-folded ONCE (the repo's
    polynomial char hash), then each window folds its k token-hashes
    with a second polynomial.  Higher-order expressions are
    CodegenFallback (interpreted), so hashing characters per WINDOW
    would pay ~k× the char work per token — measured 10× slower at
    100k docs; per-token char folding keeps the interpreted op count
    at O(text length + k·windows).

    Returns one row per duplicated span hash:
    ``(h, n_docs, n_occ)`` with ``n_docs ≥ 2`` (distinct documents
    containing the span).  A scrub pass semi-joins windows back on
    ``h`` to locate (doc, pos) cut points.

    ``hash_family``: "arith" = the SQL-replayable polynomial char fold
    (oracle path); "xxhash64" = JVM codegen token hash folded into the
    same 31-bit space (production path — same dual-family precedent as
    MinHash; ~2× faster, full 64-bit collision resistance at the token
    level).

    """
    from polar_spark.operators.dedup import _P31, polyhash

    if hash_family == "xxhash64":
        def tok_h(w: F.Column) -> F.Column:
            return F.pmod(F.xxhash64(w), F.lit(_P31))
    elif hash_family == "arith":
        tok_h = polyhash
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    )
    th = toks.select(
        "_id", F.transform(F.col("_t"), tok_h).alias("_th")
    )

    # Window folding runs as k vectorized numpy passes per Arrow batch
    # (guide §4.2: batch the native work) instead of the former
    # interpreted transform(sequence)/aggregate(slice) expression —
    # higher-order functions are CodegenFallback, and the per-window
    # fold burned ~k interpreted ops per window (A/B at 100k docs:
    # 17.4 s → see OPTIMIZATION_r06.md).  The arithmetic is the SAME
    # integer recurrence (acc·SPAN_B + hv) mod P31 in int64 — acc < 2³¹
    # and SPAN_B < 2²⁰ keep every product < 2⁵¹, so numpy int64 matches
    # the JVM fold bit-for-bit.  Only (_id, _th) cross the boundary
    # (project before the opaque op, guide §4.1); all documents in a
    # batch are folded TOGETHER over one concatenated token array with
    # a ragged-range index selecting in-document windows.
    import numpy as np
    import pandas as pd

    def fold_windows(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            # null text → null token array: the old expression emitted no
            # windows for it; preserve that by treating it as empty
            arrs = [
                np.asarray(t, dtype=np.int64) if t is not None else np.zeros(0, np.int64)
                for t in pdf["_th"]
            ]
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            counts = np.maximum(lens - (k - 1), 0)
            total = int(counts.sum())
            if total == 0:
                continue
            flat = np.concatenate(arrs) if arrs else np.zeros(0, np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # ragged ranges: global start positions of every in-doc window
            sel = counts > 0
            starts = np.repeat(offs[sel], counts[sel])
            seq = np.arange(total, dtype=np.int64)
            starts = starts + seq - np.repeat(
                np.concatenate(([0], np.cumsum(counts[sel])[:-1])), counts[sel]
            )
            h = np.zeros(total, dtype=np.int64)
            for j in range(k):
                h = (h * SPAN_B + flat[starts + j]) % _P31
            yield pd.DataFrame(
                {
                    "_id": np.repeat(
                        pdf["_id"].to_numpy(np.int64)[sel], counts[sel]
                    ),
                    "h": h,
                }
            )

    spans = th.mapInPandas(fold_windows, schema="_id long, h long")
    return (
        spans.groupBy("h")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
    )


_WIN_POS_BITS = 20  # winnowing tie-break: key = h·2^20 + pos (h < 2^31 ⇒ key < 2^51)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting scheme): hash every
    k-token window, then from every run of ``w`` consecutive k-gram
    hashes select the minimum — the guarantee is at least one selected
    fingerprint per ``w`` window, so any shared span of
    ``k + w - 1`` tokens between two documents shares a fingerprint.
    Positional dedup signal the global-MinHash family cannot give
    (reference analogue: the per-file content identity of
    `src/agents/provenance/mod.rs`-style ANALYZED_AS joins, localized
    to spans).

    Selection is made deterministic and SQL-replayable by keying
    ``(hash, position)`` into one int64 (``h·2^20 + pos`` — leftmost
    minimum on hash ties), and the hash is the repo's TWO-LEVEL
    polynomial family (per-token char fold once, k-wide second-level
    fold — the dup_spans CodegenFallback lesson).  The whole selection
    is a PURE PER-DOCUMENT MAP — arrays never leave the row, zero
    shuffle, so the stage scales embarrassingly; only the cross-doc
    sharing count aggregates (one explode + one groupBy, linear in
    selected fingerprints ≈ 2·tokens/w).

    Returns ``(id, n_kgrams, n_fps, fps)`` — selected distinct
    fingerprint hashes per document.
    """
    from polar_spark.operators.dedup import _P31, polyhash

    pos_mul = F.lit(1 << _WIN_POS_BITS)
    staged = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.split(F.trim(F.col(text_col)), r"\s+"), polyhash).alias("_th"),
    )
    n_kg = F.size("_th") - F.lit(k - 1)
    staged = staged.select(
        "_id",
        F.when(
            n_kg >= 1,
            F.transform(
                F.sequence(F.lit(1), n_kg),
                lambda i: F.aggregate(
                    F.slice(F.col("_th"), i, F.lit(k)),
                    F.lit(0).cast("long"),
                    lambda acc, hv: (acc * SPAN_B + hv) % F.lit(_P31),
                ),
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("_kg"),
    )
    nk = F.size("_kg")
    keys = F.transform(F.col("_kg"), lambda h, i: h * pos_mul + i + 1)
    staged = staged.select("_id", F.col("_kg"), keys.alias("_keys"))
    n_win = F.greatest(nk - F.lit(w - 1), F.least(nk, F.lit(1)))
    winners = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda s: F.array_min(F.slice(F.col("_keys"), s, F.least(F.lit(w), nk - s + 1))),
    )
    fps = F.array_distinct(
        F.transform(winners, lambda key: F.shiftright(key, _WIN_POS_BITS))
    )
    return staged.select(
        F.col("_id").alias(id_col),
        F.greatest(nk, F.lit(0)).cast("long").alias("n_kgrams"),
        F.when(nk >= 1, fps).otherwise(F.array().cast("array<bigint>")).alias("fps"),
    ).withColumn("n_fps", F.size("fps").cast("long"))


def block_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 8,
    min_occ: int = 2,
) -> DataFrame:
    """Block-level exact-substring dedup WITH corpus rewrite — the
    scalable aligned-block approximation of suffix-array ExactSubstr
    dedup (Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better"): chunk each document into fixed ``block``-token
    blocks, hash each block, drop every occurrence of any block whose
    corpus-wide occurrence count reaches ``min_occ``, and reassemble
    the surviving blocks in document order.  Unlike `dup_spans` (a
    *report* of duplicated spans) this operator emits the cleaned
    corpus — the transform a training pipeline actually applies.

    Plan shape: one explode (linear), ONE map-side-combinable count
    aggregate on the block hash, one linear join back (AQE handles a
    boilerplate-block skew key), one per-doc reassembly aggregate —
    no quadratic stage, no Python.  Returns
    ``(id, n_blocks, n_kept, n_removed, clean_text)``; documents whose
    every block is duplicated come back with ``clean_text = ''``.
    """
    from polar_spark.operators.dedup import polyhash

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    )
    nb = F.ceil(F.size("_t") / F.lit(block)).cast("int")
    blocks = toks.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nb - 1),
                lambda i: F.array_join(
                    F.slice("_t", i * block + 1, F.lit(block)), " "
                ),
            )
        ).alias("idx", "btxt"),
    )
    hashed = blocks.withColumn("bh", polyhash(F.col("btxt")))
    counts = hashed.groupBy("bh").agg(F.count("*").alias("_occ"))
    kept = hashed.join(counts, "bh").where(F.col("_occ") < min_occ)
    totals = hashed.groupBy("_id").agg(F.count("*").alias("n_blocks"))
    clean = kept.groupBy("_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "btxt"))),
                lambda s: s.btxt,
            ),
        ).alias("clean_text"),
    )
    return (
        totals.join(clean, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_blocks").cast("long"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_blocks") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def unigram_logprob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-LM quality scoring, unigram form (the CCNet/Gopher
    perplexity-filter posture with the corpus itself as the language
    model): p(w) = corpus frequency of w, per-document score =
    mean over tokens of −log₂ p(token), ``ppl = 2^score``.  Documents
    full of rare tokens (noise, boilerplate IDs, non-language) score
    high; plain prose scores low — the standard curation signal when a
    trained LM is unavailable.

    The token stream is collapsed to (doc, token, count) FIRST — the
    map-side shrink that keeps the frequency join linear in distinct
    (doc, token) pairs instead of total tokens; the corpus frequency
    table derives from the same collapsed relation (one extra
    aggregation, no second scan).  The join key is Zipf-skewed by
    construction ("the" meets every document), so at cluster scale run
    with AQE skew-join on or broadcast the frequency table when the
    vocabulary fits.  Zero Python throughout.  Returns
    (id, n_tokens, logppl)."""
    dw = (
        df.select(F.col(id_col).alias("_id"), F.explode(_tokens(text_col)).alias("w"))
        .groupBy("_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    dw = dw.localCheckpoint(eager=True)  # two consumers: freq + the join
    freq = dw.groupBy("w").agg(F.sum("cnt").alias("c"))
    total = dw.agg(F.sum("cnt")).collect()[0][0]
    return (
        dw.join(freq, "w")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("cnt") * -F.log2(F.col("c") / F.lit(float(total))))
                / F.sum("cnt")
            ).alias("logppl"),
        )
    )


def cooccurrence_edges(
    df: DataFrame, text_col: str = "text", window: int = 2
) -> DataFrame:
    """Word co-occurrence graph: an undirected edge between tokens
    appearing within ``window`` positions of each other in the same
    document (the TextRank graph construction, Mihalcea & Tarau
    EMNLP 2004).  Vertex ids are the repo's polynomial char hash of the
    token (SQL-replayable; collision probability ~|vocab|²/2³¹ —
    astronomically small at realistic per-corpus vocabularies and
    deterministic either way).  One explode (positions × window
    offsets), one distinct — linear in total tokens.  Returns
    (src, dst, src_word, dst_word) with src < dst hash order."""
    from polar_spark.operators.dedup import polyhash

    toks = df.select(F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_t"))
    pos = toks.select(
        "_t",
        F.explode(
            F.when(
                F.size("_t") >= 2, F.sequence(F.lit(1), F.size("_t") - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
    )
    pairs = pos.select(
        "_t",
        "p",
        F.explode(
            F.filter(
                F.sequence(F.lit(1), F.lit(window)),
                lambda d: F.col("p") + d <= F.size("_t"),
            )
        ).alias("d"),
    ).select(
        F.element_at("_t", F.col("p")).alias("wa"),
        F.element_at("_t", (F.col("p") + F.col("d")).cast("int")).alias("wb"),
    ).where(F.col("wa") != F.col("wb"))
    hashed = pairs.select(
        F.least(polyhash(F.col("wa")), polyhash(F.col("wb"))).alias("src"),
        F.greatest(polyhash(F.col("wa")), polyhash(F.col("wb"))).alias("dst"),
        F.when(polyhash(F.col("wa")) <= polyhash(F.col("wb")), F.col("wa"))
        .otherwise(F.col("wb"))
        .alias("src_word"),
        F.when(polyhash(F.col("wa")) <= polyhash(F.col("wb")), F.col("wb"))
        .otherwise(F.col("wa"))
        .alias("dst_word"),
    )
    return hashed.dropDuplicates(["src", "dst"])


def textrank(
    df: DataFrame, text_col: str = "text", window: int = 2, n_iter: int = 5
) -> DataFrame:
    """TextRank keyword salience: PageRank over the corpus word
    co-occurrence graph (fixed iterations, the SQL-expressible
    formulation) — the composition of this repo's two halves: a text
    operator builds the edge table, the link-graph engine ranks it.
    Returns (word, rank)."""
    from polar_spark.plans import pregel

    e = cooccurrence_edges(df, text_col, window)
    words = (
        e.select(F.col("src").alias("id"), F.col("src_word").alias("word"))
        .unionByName(e.select(F.col("dst").alias("id"), F.col("dst_word").alias("word")))
        .dropDuplicates(["id"])
    )
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pregel.pagerank_fixed(sym, n_iter=n_iter)
    return ranks.join(words, "id").select("word", "rank")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """BM25 retrieval (Robertson/Spärck Jones, the Lucene-default
    ranking function) over the corpus for a set of queries: classic
    inverted-index scoring expressed as DataFrame joins — postings =
    per-(doc, term) term frequencies, the tiny query-term table is
    BROADCAST onto the postings (never the other way), scores aggregate
    per (query, doc), top-``topk`` per query by a bounded window.

    ``queries`` must be ``(query_id: string, qtext: string)``.  IDF is
    the standard ``ln(1 + (N − df + 0.5)/(df + 0.5))``; the per-term
    contribution ``idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl·N/L))`` is
    floored to a ``scale``-scaled BIGINT **before** summation so the
    per-(query, doc) score is an order-independent integer sum —
    float-addition order would otherwise differ between engines and
    partitionings.  (L = total corpus token count, so ``dl·N/L`` is
    dl/avgdl with the division order fixed.)  Duplicate terms in a
    query count once (standard bag-of-words query with binary qtf).

    Returns ``(query_id, doc_id, score_scaled, n_hit_terms, rnk)``.
    At 100 TB the postings table shuffles once on term; corpus stats
    (N, L) are a 1-row aggregate broadcast into the expression.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    postings = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    ).collect()[0]
    n_docs, total_len = int(stats["n_docs"]), int(stats["total_len"])
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("qtext")), r"\s+"))).alias(
            "term"
        ),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl") * F.lit(float(n_docs)) / F.lit(float(total_len))
    )
    contrib = F.floor(
        F.lit(float(scale)) * idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(df_t, "term")
        .join(dl, "_id")
        .groupBy("query_id", "_id")
        .agg(
            F.sum(contrib).alias("score_scaled"),
            F.count("*").alias("n_hit_terms"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.asc("_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= topk)
        .select(
            "query_id",
            F.col("_id").alias(id_col).cast("long"),
            F.col("score_scaled").cast("long"),
            F.col("n_hit_terms").cast("long"),
            "rnk",
        )
        .orderBy("query_id", "rnk")
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_rate_bp: int = 1500,
    seed: int = 11,
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020): mask ~15% of
    tokens with a deterministic hash coin, collapse each contiguous
    masked run into one ``<extra_id_k>`` sentinel in the input, and emit
    the target as sentinel-prefixed spans plus the closing sentinel —
    the actual seq2seq pretraining example builder, as one explode +
    per-doc windows (no Python, no shuffle beyond the doc key).

    The coin is the shared xorshift bucket on ``doc_id·8191 + pos%8191``
    (SQL-replayable, partitioning-invariant); ``mask_rate_bp`` is in
    basis points of 10000.  Returns ``(id, n_tokens, n_masked, n_spans,
    input_text, target_text)``.
    """
    from polar_spark.operators.sampling import hash_bucket

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "tok"),
    )
    key = F.col("_id") * F.lit(8191) + F.col("pos") % F.lit(8191)
    toks = toks.withColumn(
        "masked", (hash_bucket(key, seed) < F.lit(mask_rate_bp)).cast("int")
    )
    # islands: a masked run starts where masked flips 0→1; span id =
    # running count of run heads (0-based) — no dense_rank over a
    # null-polluted key
    mwin = Window.partitionBy("_id").orderBy("pos")
    toks = toks.withColumn(
        "is_head",
        ((F.col("masked") == 1) & (F.lag("masked", 1, 0).over(mwin) == 0)).cast(
            "int"
        ),
    ).withColumn(
        "span",
        F.when(
            F.col("masked") == 1,
            F.sum("is_head").over(
                mwin.rowsBetween(Window.unboundedPreceding, 0)
            )
            - 1,
        ),
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("span"), F.lit(">"))
    inp_tok = F.when(F.col("masked") == 0, F.col("tok")).when(
        F.col("is_head") == 1, sentinel
    )
    tgt_tok = F.when(
        F.col("is_head") == 1, F.concat(sentinel, F.lit(" "), F.col("tok"))
    ).when(F.col("masked") == 1, F.col("tok"))
    agg = toks.groupBy("_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("masked").alias("n_masked"),
        (F.coalesce(F.max("span"), F.lit(-1)) + 1).alias("n_spans"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(inp_tok.isNotNull(), F.struct("pos", inp_tok.alias("t")))
                    )
                ),
                lambda s: s.t,
            ),
        ).alias("input_text"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(tgt_tok.isNotNull(), F.struct("pos", tgt_tok.alias("t")))
                    )
                ),
                lambda s: s.t,
            ),
        ).alias("target_text"),
    )
    closing = F.concat(F.lit("<extra_id_"), F.col("n_spans"), F.lit(">"))
    return agg.select(
        F.col("_id").alias(id_col),
        F.col("n_tokens").cast("long"),
        F.col("n_masked").cast("long"),
        F.col("n_spans").cast("long"),
        "input_text",
        F.when(F.col("n_spans") > 0, F.concat(F.col("target_text"), F.lit(" "), closing))
        .otherwise(F.lit(""))
        .alias("target_text"),
    )


def _dense_rank_pairs(
    pairs: DataFrame, c1: str = "r1", c2: str = "r2", n_buckets: int = 512,
    hi: int | None = None,
) -> DataFrame:
    """Dense rank of (c1, c2) pairs WITHOUT a single-partition global
    window: distinct pairs are bucketed by a monotone range function of
    ``c1``, per-bucket counts give broadcastable exclusive offsets (the
    only sequential pass runs over ≤ n_buckets rows), and the in-bucket
    row_number is a window partitioned BY BUCKET — the two-phase
    distributed prefix-sum pattern shared with ``packing`` and
    ``pregel.bfs_relabel``.  Adds ``new_rank`` (1-based, dense).

    ``hi``: optional UPPER BOUND on ``max(c1)``.  The final rank is the
    global (c1, c2) order rank and is identical for ANY bucket width —
    a loose bound only leaves some buckets empty — so callers that know
    a bound (vertex count, token count) pass it and skip the per-call
    max aggregate action, letting fixed-round loops chain lazily."""
    d = pairs.select(c1, c2).distinct()
    if hi is None:
        hi = d.agg(F.max(c1).alias("hi")).collect()[0]["hi"]
    if hi is None:
        return pairs.withColumn("new_rank", F.lit(None).cast("long"))
    width = max(1, (int(hi) + n_buckets) // n_buckets)
    db = d.withColumn("_bkt", (F.col(c1) / F.lit(width)).cast("long"))
    w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        db.groupBy("_bkt")
        .agg(F.count("*").alias("_n"))
        .select("_bkt", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_off"))
    )
    inb = Window.partitionBy("_bkt").orderBy(c1, c2)
    ranked = db.join(F.broadcast(offs), "_bkt").select(
        c1,
        c2,
        (F.col("_off") + F.row_number().over(inb)).cast("long").alias("new_rank"),
    )
    return pairs.join(ranked, [c1, c2])


def suffix_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rounds: int = 24,
) -> DataFrame:
    """Distributed suffix-array construction over the corpus token
    stream by prefix doubling (Manber & Myers 1990) — the index behind
    exact-substring dedup (Lee et al. 2022 build suffix arrays for
    ExactSubstr; ``block_dedup`` is the aligned approximation, this is
    the exact machinery).  Documents concatenate in ``id_col`` order
    into one global token stream; after round j every position carries
    the dense rank of its first 2^j tokens, and doubling joins each
    position with ``pos + 2^j`` until all ranks are distinct — O(log n)
    rounds, each one self-equi-join on the position key plus one
    two-phase dense rank (no single-partition window anywhere; see
    :func:`_dense_rank_pairs`).  The initial token ranking is a window
    over DISTINCT tokens — bounded by vocabulary, not corpus, size.

    Returns ``(pos, doc_id, tok, rank)``: ``rank`` is the 1-based
    lexicographic rank of the suffix starting at ``pos`` under token-
    sequence order (shorter suffix sorts before its extensions, the
    standard convention).  One 1-row convergence aggregate per round.
    """
    spark = df.sparkSession
    from polar_spark.operators.packing import pack_sequences

    base = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    ).withColumn("n_tokens", F.size("_t").cast("long"))
    laid = pack_sequences(base, seq_len=2**62, sep_tokens=0, id_col="_id")
    toks = laid.select(
        "_id",
        F.posexplode("_t").alias("p", "tok"),
        F.col("start_offset"),
    ).select(
        (F.col("start_offset") + F.col("p")).alias("pos"),
        F.col("_id").alias("doc_id"),
        "tok",
    )
    n = toks.count()
    vocab = toks.select("tok").distinct()
    vw = Window.orderBy("tok")  # bounded by |vocab|, documented above
    tok_rank = vocab.select("tok", F.row_number().over(vw).cast("long").alias("rank"))
    cur = (
        toks.join(F.broadcast(tok_rank), "tok")
        .select("pos", "doc_id", "tok", "rank")
        .localCheckpoint(eager=True)
    )
    shift = 1
    for _ in range(max_rounds):
        if cur.agg(F.max("rank")).collect()[0][0] == n:
            break
        nxt = cur.select((F.col("pos") - F.lit(shift)).alias("pos"), F.col("rank").alias("r2"))
        paired = (
            cur.withColumnRenamed("rank", "r1")
            .join(nxt, "pos", "left")
            .withColumn("r2", F.coalesce("r2", F.lit(0)))
        )
        # lazy: the next round's convergence aggregate materializes it
        # (one job per doubling round instead of two); ranks are bounded
        # by the token count, so hi=n skips the per-round max aggregate
        # inside _dense_rank_pairs (rank is bucket-width-invariant)
        cur = (
            _dense_rank_pairs(paired, hi=max(int(n), 1))
            .select("pos", "doc_id", "tok", F.col("new_rank").alias("rank"))
            .localCheckpoint(eager=False)
        )
        shift *= 2
        if shift >= n:
            # one final pass may still be pending; loop re-checks via max
            if cur.agg(F.max("rank")).collect()[0][0] == n:
                break
    return cur.select(F.col("pos").cast("long"), F.col("doc_id").cast("long"), "tok", "rank")


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    sep: str = "\x1f",
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Full iterative byte-pair-encoding training (Sennrich et al.
    2016) over the corpus word-type table: each round counts adjacent
    symbol pairs weighted by word frequency, merges the most frequent
    pair (ties → lexicographically smallest (a, b)) greedily
    left-to-right in every word, and repeats ``n_merges`` times — the
    actual tokenizer-training loop, not just one merge-candidate round.

    The greedy merge is a fold over each word's symbol string (unit
    separator ``sep``): merge when the accumulator's LAST symbol is
    ``a`` and the incoming symbol is ``b`` — exactly the sequential
    left-to-right scan (a merged symbol a||b can never re-trigger as
    ``a`` because it is strictly longer), and the same fold replays in
    DuckDB's list_reduce character-for-character.

    Scale: the state is the DISTINCT word table (vocabulary-, not
    corpus-sized); each round is one explode + one map-side-combinable
    count + a 1-row argmax collect + one pure-map fold.  Returns
    ``(words, merges)`` where words is ``(word, cnt, seg, n_syms)``
    with ``seg`` the final space-joined segmentation, and merges is the
    learned ``[(a, b, pair_count), ...]`` schedule.
    """
    words = (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("cur", F.array_join(F.split("word", ""), sep))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        syms = F.split("cur", sep)
        pairs = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("a"),
                    F.element_at(syms, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        # argmax as ONE aggregate (min of (-count, a, b) — identical
        # winner and tie-break to the former global sort + limit 1,
        # without the sort's extra exchange); this collect is also the
        # action that materializes the previous round's lazy fold
        top = (
            words.select("cnt", F.explode(pairs).alias("pr"))
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), "a", "b")).alias("m"))
            .collect()
        )
        if not top or top[0]["m"] is None:
            break
        m = top[0]["m"]
        a, b, c = m["a"], m["b"], int(-m["nc"])
        merges.append((a, b, c))
        merged = a + b
        fold = F.aggregate(
            F.split("cur", sep),
            F.lit(""),
            lambda acc, s: F.when(acc == F.lit(""), s)
            .when(
                ((acc == F.lit(a)) | acc.endswith(F.lit(sep + a)))
                & (s == F.lit(b)),
                F.concat(
                    acc.substr(F.lit(1), F.length(acc) - F.lit(len(a))),
                    F.lit(merged),
                ),
            )
            .otherwise(F.concat(acc, F.lit(sep), s)),
        )
        # lazy: the next round's argmax collect (or the caller's final
        # action) materializes the fold — halves the per-merge job count
        words = words.withColumn("cur", fold).localCheckpoint(eager=False)
    out = words.select(
        "word",
        F.col("cnt").cast("long"),
        F.replace(F.col("cur"), F.lit(sep), F.lit(" ")).alias("seg"),
        F.size(F.split("cur", sep)).cast("long").alias("n_syms"),
    )
    return out, merges
