"""Text-analysis operators for corpus curation — all JVM expressions
(whole-stage codegen), no Python in the hot path.

- language-ID: stopword-profile n-gram heuristic
- quality scoring: length / punctuation / stopword / digit ratios
- token counting: whitespace + BPE-ish regex
- document fingerprinting: positional rolling hash + content sha256
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
