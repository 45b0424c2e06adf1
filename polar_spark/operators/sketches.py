"""Count-min sketch + skew diagnostics — the streaming-scale frequency
toolkit (Cormode & Muthukrishnan, J.Alg 2005).

At 100 TB a per-key exact count of a high-cardinality column is a
full-size shuffle; the count-min sketch is the standard sublinear
substitute: ``depth`` hash rows × ``width`` counters, point estimate =
min over rows, overestimate bounded by ε·N with ε = e/width at
probability 1 − (1/e)^depth.  Built here as ONE map-side-combinable
aggregation over ``depth × N`` cell keys into a bounded ``depth·width``
cell table — no per-key state, mergeable across partitions/batches by
construction (cells just add).

The hash family is the repo's SQL-replayable xorshift-multiply mix
(every intermediate < 2^62), so a SQL engine replays the exact sketch —
the same cross-engine-exactness property the MinHash/SimHash arithmetic
families use.

Reference analog: Polar's metrics counters are exact per-key actor
state (src/agents/*/metrics); this is the bounded-memory equivalent a
1000-executor stream would actually deploy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_col(key: Column, row: int, width: int, seed: int) -> Column:
    """Counter index of ``key`` in hash row ``row`` — xorshift-multiply
    mix, deterministic, every intermediate below 2^62."""
    x0 = (key * F.lit(2654435761) + F.lit(row * 1000003 + seed)) % F.lit(2**31)
    x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
    h = x1.bitwiseXOR(F.shiftright(x1, 17))
    return (h % F.lit(width)).cast("long")


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 0,
) -> DataFrame:
    """Builds the sketch cell table ``(row, col, cnt)`` — at most
    ``depth · width`` rows regardless of input size.  One aggregation,
    partial-combined map-side; cells from different inputs merge by
    summing ``cnt`` (use :func:`cm_merge`)."""
    key = F.col(key_col).cast("long")
    cells = F.array(
        *[
            F.struct(F.lit(r).cast("long").alias("row"), _cm_col(key, r, width, seed).alias("col"))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merges sketches built with identical (depth, width, seed) —
    cells add; the mergeability that makes the sketch shard- and
    stream-friendly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 0,
) -> DataFrame:
    """Point-estimates every key in ``keys``: est = min over hash rows
    of the addressed counter.  The sketch (≤ depth·width rows) is
    broadcast — the probe side never shuffles."""
    key = F.col(key_col).cast("long")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        _cm_col(key, r, width, seed).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def cm_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 512,
    seed: int = 0,
) -> DataFrame:
    """Top-k keys by sketch-estimated frequency (deterministic
    tie-break: est desc, key asc).  The candidate set is the distinct
    keys of ``df`` — at true stream scale a space-saving candidate list
    replaces it; the estimate path is identical."""
    sk = cm_sketch(df, key_col, depth, width, seed)
    keys = df.select(key_col).distinct()
    est = cm_estimate(sk, keys, key_col, depth, width, seed)
    return est.orderBy(F.desc("est"), F.asc(key_col)).limit(k)


def skew_report(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Shuffle-key skew diagnostic: the ``top`` heaviest keys with
    their row count and share of the table (integer parts-per-million —
    exact cross-engine arithmetic) — the number you read before
    deciding to salt a join.  One aggregation + a bounded top-k."""
    total = df.count()
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(top)
        .select(
            key_col,
            "n",
            F.expr(f"CAST((n * 1000000) DIV {total} AS BIGINT)").alias("share_ppm"),
        )
    )

# --------------------------------------------------------------------------
# Bloom-filter runtime join pruning


def _bloom_word_bit(key: Column, i: int, num_words: int, seed: int) -> tuple[Column, Column]:
    """(word, bit) address of hash ``i`` for ``key`` — the same
    xorshift-multiply mix as the count-min family (SQL-replayable,
    every intermediate < 2^62).  62 usable bits per int64 word keeps
    ``1 << bit`` strictly positive in engines that error on the sign
    bit."""
    h = _cm_col(key, i, num_words * 62, seed)
    return (h / F.lit(62)).cast("long"), h % F.lit(62)


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_words: int = 64,
    k: int = 3,
    seed: int = 5,
) -> DataFrame:
    """Builds a Bloom filter over ``df[key_col]`` as a bounded word
    table ``(word, mask)`` — at most ``num_words`` rows regardless of
    input size: each key sets ``k`` bits, words OR-merge via one
    map-side-combinable ``bit_or`` aggregation.  Filters from different
    shards/batches merge by OR-ing masks (same property as cm_merge).

    This is the runtime-filter side of a 100-TB semi-join: build on the
    small/filtered side, broadcast ``num_words`` longs, and prune the
    big probe side in a pure map stage BEFORE its shuffle — the shape
    Spark's own InjectRuntimeFilter picks when statistics allow, made
    explicit and deterministic here (reference analog: Polar narrows
    graph scans by key set before traversal, src/agents/graph queries)."""
    key = F.col(key_col).cast("long")
    cells = []
    for i in range(k):
        w, b = _bloom_word_bit(key, i, num_words, seed)
        cells.append(F.struct(w.alias("word"), b.alias("bit")))
    return (
        df.select(F.explode(F.array(*cells)).alias("c"))
        .groupBy(F.col("c.word").alias("word"))
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), c.bit))").alias("mask"))
    )


def bloom_masks(words: DataFrame, num_words: int) -> list[int]:
    """Collects the word table into a dense python mask list (bounded:
    ``num_words`` longs — this is the broadcast)."""
    present = {r["word"]: r["mask"] for r in words.collect()}
    return [int(present.get(w, 0)) for w in range(num_words)]


def bloom_member(
    key: Column, masks: list[int], k: int = 3, seed: int = 5
) -> Column:
    """Membership predicate against a collected mask list — a pure
    JVM expression (array literal + shifts), zero shuffle, zero Python:
    the probe side of the runtime filter.  False positives possible
    (rate ≈ (1-e^{-kn/m})^k), false negatives impossible."""
    num_words = len(masks)
    arr = F.array(*[F.lit(m).cast("long") for m in masks])
    key = key.cast("long")
    cond = F.lit(True)
    for i in range(k):
        w, b = _bloom_word_bit(key, i, num_words, seed)
        word_mask = F.element_at(arr, (w + F.lit(1)).cast("int"))
        bit_set = F.call_function(
            "shiftright", word_mask, b.cast("int")
        ).bitwiseAND(F.lit(1)) == F.lit(1)
        cond = cond & bit_set
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_words: int = 64,
    k: int = 3,
    seed: int = 5,
) -> DataFrame:
    """Bloom-pruned semi-join: probe rows surviving the broadcast mask
    filter (pure map stage — only the survivors ever reach the exact
    join's shuffle), then the exact left-semi join removes the false
    positives.  At 100 TB the map-stage prune is what keeps a selective
    semi-join from shuffling the full fact table."""
    words = bloom_build(build, build_key, num_words, k, seed)
    masks = bloom_masks(words, num_words)
    pruned = probe.where(bloom_member(F.col(probe_key), masks, k, seed))
    return pruned.join(
        F.broadcast(build.select(F.col(build_key).alias(probe_key)).distinct()),
        probe_key,
        "left_semi",
    )


# --------------------------------------------------------------------------
# Flajolet-Martin per-group distinct-count estimation


def fm_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    replicas: int = 8,
    seed: int = 1,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT key): Flajolet-Martin bit
    registers (the same deterministic register family `pregel.anf`
    OR-merges along edges, applied to plain aggregation).  Each
    (group, key, replica) contributes ``1 << ρ(h(key, j))``; registers
    OR-merge in ONE map-side-combinable ``bit_or`` aggregation, so the
    per-group state is ``replicas`` longs — the bounded-memory
    substitute for an exact count-distinct shuffle of every key at
    100 TB (exact needs the full key set per group; this needs
    8 longs).  Estimate = 2^(mean_j ρ₀)/0.77351 with ρ₀ the lowest
    unset register bit.  Deterministic hash ⇒ a SQL oracle replays the
    registers and estimates bit-for-bit.  Returns (group, est)."""
    g = F.col(group_col)
    key = F.col(key_col).cast("long")
    regs = []
    for j in range(replicas):
        x0 = (key * F.lit(2654435761) + F.lit(j * 97 + seed)) % F.lit(2**31)
        x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
        h = x1.bitwiseXOR(F.shiftright(x1, 17))
        rho = F.least(F.bit_count((h.bitwiseAND(-h)) - F.lit(1)), F.lit(62))
        regs.append(
            F.call_function("shiftleft", F.lit(1).cast("long"), rho.cast("int"))
        )
    agg = df.groupBy(g.alias(group_col)).agg(
        *[F.bit_or(regs[j]).alias(f"r{j}") for j in range(replicas)]
    )
    rho0 = [
        F.bit_count(
            (F.bitwise_not(F.col(f"r{j}")).bitwiseAND(F.col(f"r{j}") + F.lit(1)))
            - F.lit(1)
        ).cast("double")
        for j in range(replicas)
    ]
    mean_rho0 = sum(rho0[1:], rho0[0]) / F.lit(float(replicas))
    return agg.select(
        group_col,
        (F.pow(F.lit(2.0), mean_rho0) / F.lit(0.77351)).alias("est"),
    )


# --------------------------------------------------------------------------
# log2-histogram quantile sketch


def log2_bucket(value: Column) -> Column:
    """⌊log₂ v⌋ for v ≥ 1 via the binary-string length — pure integer
    arithmetic (no float log at power-of-two boundaries), identical in
    Spark and DuckDB (`length(bin(v)) - 1`).  Values < 1 clamp to
    bucket 0."""
    return (F.length(F.bin(F.greatest(value.cast("long"), F.lit(1)))) - F.lit(1)).cast(
        "long"
    )


def log_hist_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: list[float],
) -> DataFrame:
    """Approximate per-group quantiles from a log₂ histogram — the
    mergeable bounded-state substitute for exact percentile sort at
    stream/100-TB scale: per group the whole state is ≤ 63 bucket
    counters (one map-side-combinable aggregation; histograms from
    shards/batches merge by adding counters), relative error bounded by
    the bucket width (estimate = arithmetic bucket midpoint 1.5·2^b,
    true value ∈ [2^b, 2^{b+1})).  Exact counterpart on this repo:
    the `order_percentiles` query (Spark `percentile`).  Returns
    (group, q, est) — deterministic, SQL-replayable (rank = CEIL(q·N),
    first bucket whose cumulative count reaches it)."""
    from pyspark.sql.window import Window

    hist = (
        df.groupBy(
            F.col(group_col).alias("g"),
            log2_bucket(F.col(value_col)).alias("bucket"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("g").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("g").agg(F.sum("cnt").alias("tot"))
    qrows = tot.select(
        "g", "tot", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    picked = (
        cum.join(qrows, "g")
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("tot")))
        .groupBy(F.col("g").alias(group_col), "q")
        .agg(F.min("bucket").alias("bucket"))
    )
    return picked.select(
        group_col,
        "q",
        (F.lit(1.5) * F.pow(F.lit(2.0), F.col("bucket").cast("double"))).alias("est"),
    )


HLL_ALPHA_256 = 0.7213 / (1.0 + 1.079 / 256.0)  # Flajolet et al. 2007, m >= 128


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 8,
    seed: int = 0,
) -> DataFrame:
    """HyperLogLog register table per group — COUNT(DISTINCT key)'s
    mergeable bounded-state substitute (Flajolet/Fusy/Gandouet/Meunier,
    AofA 2007): ``m = 2^p`` registers per group, register j = max over
    keys hashing to bucket j of rho(suffix) (position of the leftmost
    1-bit in the remaining hash bits).

    One map stage (bucket + rho are pure JVM integer expressions) plus
    ONE map-side-combinable max-aggregation into at most ``m`` rows per
    group — at 100 TB the shuffle carries register rows, never keys.
    Registers from disjoint shards merge by element-wise MAX
    (max-of-max), exactly like FM — tested.

    The hash is the repo's SQL-replayable xorshift-multiply family
    (2^31 space ⇒ 31 − p suffix bits: rho ≤ 32 − p, cardinality
    ceiling ~10^8 per group before hash collisions bias the estimate —
    swap ``xxhash64`` for the production 64-bit family, agreement
    pattern as text.dup_spans).  Reference analog: Polar counts
    distinct entities with exact per-actor sets
    (src/agents/*/metrics); this is the sublinear form.
    """
    key = F.col(key_col).cast("long")
    x0 = (key * F.lit(2654435761) + F.lit(1000003 + seed)) % F.lit(2**31)
    x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
    h = x1.bitwiseXOR(F.shiftright(x1, 17))
    m = 1 << p
    bucket = (h % F.lit(m)).cast("long")
    suffix = F.shiftright(h, p)  # 31 - p significant bits
    width = 31 - p
    rho = (
        F.when(suffix == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(suffix)))
        .cast("long")
    )
    return (
        df.select(F.col(group_col).alias("grp"), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Element-wise MAX merge of register tables (shards / batches)."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("grp", "bucket").agg(F.max("m_j").alias("m_j"))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Cardinality estimate per group from a register table.

    All-integer reduction: ``s2 = Σ_j 2^(50 − M_j)`` with absent
    registers contributing ``2^50`` (M = 0) — exact in BIGINT since
    M ≤ 32 − p ≪ 50 and the 256-register sum stays below 2^58 — then one double division for the harmonic mean
    (IEEE-deterministic, replayed by the oracle with the identical
    expression shape).  Small-range correction: linear counting
    ``m·ln(m/zeros)`` when raw ≤ 2.5·m and zero registers remain.
    Returns ``(grp, present, zeros, s2, est)`` with est rounded 4dp.
    """
    m = 1 << p
    agg = registers.groupBy("grp").agg(
        F.count("*").alias("present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 50 - cast(m_j as int))")).alias(
            "s_present"
        ),
    )
    s2 = F.col("s_present") + (F.lit(m) - F.col("present")) * F.lit(2**50)
    zeros = (F.lit(m) - F.col("present")).cast("long")
    raw = (
        F.lit(HLL_ALPHA_256 if p == 8 else 0.7213 / (1.0 + 1.079 / m))
        * F.lit(float(m * m))
        * F.lit(float(2**50))
        / s2.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        "grp",
        F.col("present").cast("long").alias("present"),
        zeros.alias("zeros"),
        s2.cast("long").alias("s2"),
        F.round(est, 4).alias("est"),
    )


def ams_f2(df: DataFrame, key_col: str, k: int = 16, seed: int = 0) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy, STOC'96):
    ``k`` independent ±1 sign hashes; each estimator is
    ``X_j = Σ_i s_j(i)·f_i`` and ``E[X_j²] = F2 = Σ f_i²``.

    Built as ONE map-side-combinable aggregation: each input row
    contributes its k signs via k conditional sums (no per-key state,
    no explode — k columns wide, constant memory), so shards merge by
    adding the ``x`` columns.  At 100 TB this replaces the full-width
    ``groupBy(key).count()`` + sum-of-squares (a full shuffle of the
    key space) with a k-cell sketch.  The sign hash is the repo's
    SQL-replayable xorshift-multiply mix, so the oracle replays the
    sketch bit-for-bit.

    Returns one row per estimator: ``(est_id, x, x2)`` — medians/means
    over ``x2`` are the caller's F2 estimate.

    Reference analog: Polar's metrics counters are exact per-key actor
    state (src/agents/*/metrics); this is the bounded-memory second-
    moment (skew / self-join size) estimate a 1000-executor stream
    would deploy.
    """
    key = F.col(key_col).cast("long")

    def _sign(j: int) -> Column:
        x0 = (key * F.lit(2654435761) + F.lit(j * 1000003 + seed)) % F.lit(2**31)
        x1 = (x0.bitwiseXOR(F.shiftright(x0, 13)) * F.lit(1274126177)) % F.lit(2**31)
        h = x1.bitwiseXOR(F.shiftright(x1, 17))
        return F.lit(1) - F.lit(2) * (h % F.lit(2))

    agg = df.agg(
        *[F.sum(_sign(j)).cast("long").alias(f"x_{j}") for j in range(k)]
    )
    ests = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("est_id"),
                F.col(f"x_{j}").alias("x"),
                (F.col(f"x_{j}") * F.col(f"x_{j}")).alias("x2"),
            )
            for j in range(k)
        ]
    )
    return agg.select(F.explode(ests).alias("e")).select("e.est_id", "e.x", "e.x2")
