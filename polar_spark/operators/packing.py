"""Sequence packing: lay a document corpus out into fixed-length
training sequences (the GPT-style concatenate-and-chunk pass).

Every document contributes its tokens plus one end-of-document
separator to a single global token stream ordered by ``doc_id``; the
stream is cut into sequences of ``seq_len`` tokens.  The operator
computes, per document, its absolute start offset in the stream and the
range of sequence ids it lands in — exactly what a sharded tokenizer /
loader needs to materialize packed training batches deterministically.

Scale design — the global running total is a **two-phase distributed
prefix sum**, not a single-partition window:

1. bucket documents by a monotone range function of ``doc_id`` (order
   within and across buckets = global order);
2. one small aggregation computes per-bucket token totals (``buckets``
   rows, bounded); their exclusive running sum — the only sequential
   step — runs on that tiny set and is broadcast-joined back;
3. the per-document cumulative sum is a window partitioned BY BUCKET,
   so the heavy pass parallelises across buckets instead of serialising
   the corpus through one reducer.

Everything is JVM expressions (split/size/window/floor) — no Python in
the pipeline — and the result is reproducible on any cluster size.

Reference analog: Polar batches entity streams into fixed-size commit
chunks per agent config; here the chunking is a declarative layout over
the corpus with an exact SQL replay (plain ``SUM() OVER (ORDER BY)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_count_col: str = "n_tokens",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
    buckets: int = 256,
) -> DataFrame:
    """Adds the packed-layout columns to ``df``:

    ``start_offset``  absolute token offset of the doc's first token,
    ``first_seq`` / ``last_seq``  sequence ids covering the doc,
    ``n_seqs``  how many training sequences the doc spans.

    ``token_count_col`` must be a non-negative integer column (e.g.
    ``ws_tokens`` from :func:`polar_spark.operators.text.token_counts`).
    Documents are laid out in ascending ``id_col`` order; each is
    followed by ``sep_tokens`` separator tokens that belong to the
    stream but not to the document's own span.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = (F.col(token_count_col) + F.lit(sep_tokens)).cast("long")

    # 1. monotone range bucketing: bucket boundaries follow id order, so
    # per-bucket prefixes + within-bucket cumsums compose to the exact
    # global prefix sum.  One cheap max(id) action sizes the ranges.
    hi = df.agg(F.max(F.col(id_col)).cast("long")).first()[0]
    if hi is None:
        return df.select(
            "*",
            F.lit(None).cast("long").alias("start_offset"),
            F.lit(None).cast("long").alias("first_seq"),
            F.lit(None).cast("long").alias("last_seq"),
            F.lit(None).cast("long").alias("n_seqs"),
        ).where(F.lit(False))
    width = max(1, (int(hi) + buckets) // buckets)
    bucket = (F.col(id_col).cast("long") / F.lit(width)).cast("long")
    base = df.withColumn("_bkt", bucket).withColumn("_n", n)

    # 2. per-bucket totals (≤ `buckets` rows) → exclusive running sum
    # over the buckets, broadcast back.  This tiny window is the only
    # sequential step; the corpus itself never passes through it.
    totals = base.groupBy("_bkt").agg(F.sum("_n").alias("_tot"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(wb), F.lit(0)).alias("_prefix")
    )

    # 3. within-bucket exclusive cumsum — parallel across buckets.
    ww = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(id_col).cast("long"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_prefix") + F.coalesce(F.sum("_n").over(ww), F.lit(0))
    # the doc's own tokens span [start, start + token_count); an empty
    # doc still "lands" at its start offset (first_seq == last_seq).
    last_tok = start + F.greatest(F.col(token_count_col).cast("long"), F.lit(1)) - F.lit(1)
    first_seq = F.floor(start / F.lit(seq_len)).cast("long")
    last_seq = F.floor(last_tok / F.lit(seq_len)).cast("long")
    return (
        base.join(F.broadcast(prefixes), "_bkt")
        .select(
            *df.columns,
            start.cast("long").alias("start_offset"),
            first_seq.alias("first_seq"),
            last_seq.alias("last_seq"),
            (last_seq - first_seq + F.lit(1)).cast("long").alias("n_seqs"),
        )
    )


def packing_stats(packed: DataFrame, seq_len: int, sep_tokens: int = 1) -> DataFrame:
    """One-row layout summary: total docs, total stream tokens, number
    of ``seq_len`` sequences, and fill ratio (payload tokens / stream
    capacity) — the packing-efficiency number a pipeline reports."""
    return packed.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.max(F.col("start_offset") + F.col("n_tokens")) + F.lit(sep_tokens))
        .cast("long")
        .alias("stream_tokens"),
        F.ceil(
            (F.max(F.col("start_offset") + F.col("n_tokens")) + F.lit(sep_tokens))
            / F.lit(seq_len)
        )
        .cast("long")
        .alias("n_sequences"),
        (
            F.sum("n_tokens")
            / (F.max(F.col("start_offset") + F.col("n_tokens")) + F.lit(sep_tokens))
        ).alias("fill_ratio"),
    )
