"""Distributed multinomial Naive Bayes text classification — the
fastText-class quality/language-filter stage of an LLM data pipeline
(CCNet trains a lang/quality classifier and scores every document;
here both halves are declarative DataFrame plans).

Why Naive Bayes and not logistic regression: the trained model is
nothing but token counts — exact integers under any partitioning — and
the per-document score is a sum of per-token log-probabilities that we
floor to scaled BIGINTs *before* summation, so train AND predict are
bit-reproducible across engines, cluster sizes, and row orders.  A
gradient-descent classifier's float accumulation order is not.

Scale posture (100 TB): training is ONE groupBy over (label, token)
with map-side combine; the model (|V|·|labels| rows) is broadcast onto
the prediction pass, which is a single explode + broadcast-join +
groupBy on the document key.  No iteration, no driver loop, no Python.

Reference analog: Polar scores/classifies entities with per-type
heuristic rules (src/agents/*/consumer.rs); the trainable classifier is
the LLM-pipeline generalization SURVEY §2 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def nb_class_scores(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    train_bp: int = 8000,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """The shared train+score passes behind :func:`nb_classify` and the
    margin-calibration audit: returns ``(base, scored)`` where ``base``
    is ``(_id, label, is_train)`` per document and ``scored`` is the
    full per-(document, class) scaled-BIGINT log-posterior table —
    one row per document per training label.
    """
    from polar_spark.operators.sampling import BUCKETS, hash_bucket

    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("label"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
        (hash_bucket(F.col(id_col), seed) < F.lit(train_bp)).cast("int").alias(
            "is_train"
        ),
    )
    toks = base.select(
        "_id", "label", "is_train", F.explode("_t").alias("tok")
    )
    tr = toks.where(F.col("is_train") == 1)
    # model: exact integer sufficient statistics
    c_lt = tr.groupBy("label", "tok").agg(F.count("*").alias("c"))
    tot_l = tr.groupBy("label").agg(F.count("*").alias("tot"))
    vocab_v = c_lt.select("tok").distinct().count()
    n_docs = base.where(F.col("is_train") == 1).count()
    n_l = (
        base.where(F.col("is_train") == 1)
        .groupBy("label")
        .agg(F.count("*").alias("nl"))
    )
    llp = c_lt.join(tot_l, "label").select(
        F.col("label").alias("cls"),
        "tok",
        F.floor(
            F.lit(float(scale))
            * F.log((F.col("c") + F.lit(1.0)) / (F.col("tot") + F.lit(float(vocab_v))))
        ).alias("llp"),
    )
    label_stats = tot_l.join(n_l, "label").select(
        F.col("label").alias("cls"),
        F.floor(
            F.lit(float(scale))
            * F.log(F.lit(1.0) / (F.col("tot") + F.lit(float(vocab_v))))
        ).alias("default_llp"),
        F.floor(
            F.lit(float(scale)) * F.log(F.col("nl") / F.lit(float(n_docs)))
        ).alias("prior"),
    )
    # predict: every doc token × every label, unseen → per-label default
    scored = (
        toks.crossJoin(F.broadcast(label_stats))
        .join(F.broadcast(llp), ["cls", "tok"], "left")
        .groupBy("_id", "cls")
        .agg(
            (
                F.sum(F.coalesce("llp", "default_llp"))
                + F.first("prior")
            ).alias("score_scaled")
        )
    )
    return base.select("_id", "label", "is_train"), scored


def nb_classify(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    train_bp: int = 8000,
    seed: int = 0,
) -> DataFrame:
    """Train a multinomial Naive Bayes classifier on a deterministic
    ~``train_bp``/10000 hash split of ``docs`` and score EVERY document
    (the production posture: the filter model is fit on a sample, then
    applied to the full corpus).

    Laplace-smoothed: p(t|l) = (c_tl + 1)/(tot_l + V) with V = training
    vocabulary size; unseen (token, label) pairs take the per-label
    default ln(1/(tot_l + V)).  Every log-probability is floored to a
    ``scale``-scaled BIGINT, so document scores are order-independent
    integer sums; argmax ties break to the lexicographically smallest
    label.  Returns ``(id, label, pred, correct, is_train,
    score_scaled)`` — one row per document.
    """
    base, scored = nb_class_scores(
        docs, text_col, label_col, id_col, scale, train_bp, seed
    )
    win = Window.partitionBy("_id").orderBy(F.desc("score_scaled"), F.asc("cls"))
    pred = (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") == 1)
        .select("_id", F.col("cls").alias("pred"), "score_scaled")
    )
    return (
        base.join(pred, "_id")
        .select(
            F.col("_id").alias(id_col).cast("long"),
            "label",
            "pred",
            (F.col("label") == F.col("pred")).cast("long").alias("correct"),
            F.col("is_train").cast("long"),
            F.col("score_scaled").cast("long"),
        )
    )
