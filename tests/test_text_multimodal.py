"""Text-analysis + multimodal plumbing tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from polar_spark.operators import multimodal, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog are in the garden of the house"),
        (1, "el perro y el gato de la casa que en los árboles del parque un día"),
        (2, "le chat et le chien de la maison les oiseaux des arbres en un jour"),
        (3, "der Hund und die Katze von dem Haus mit den Vögeln ist ein Tag"),
        (4, "12345 67890 999 000 111 222"),
        (5, "word " * 100),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in text.language_scores(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "fr"
    assert out[3] == "de"


def test_quality_scores(docs):
    rows = {r["doc_id"]: r for r in text.quality_scores(docs).collect()}
    # digit-noise doc scores below natural-language doc
    assert rows[4]["quality"] < rows[0]["quality"]
    assert rows[4]["digit_ratio"] > 0.5
    assert 0.0 <= rows[0]["quality"] <= 1.0
    assert rows[0]["stopword_ratio"] > 0.2


def test_token_counts(docs):
    rows = {r["doc_id"]: r for r in text.token_counts(docs).collect()}
    assert rows[0]["ws_tokens"] == 15
    assert rows[4]["bpe_tokens"] >= rows[4]["ws_tokens"]  # digit chunking splits


def test_fingerprints_match_reference_computation(docs):
    rows = {r["doc_id"]: r for r in text.fingerprints(docs).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, t in src.items():
        assert rows[did]["content_sha256"] == hashlib.sha256(t.encode()).hexdigest()
        exp = sum((i + 1) * ord(c) for i, c in enumerate(t)) % 1000000007
        assert rows[did]["rolling_fp"] == exp


@pytest.fixture(scope="module")
def media(spark):
    df = multimodal.gen_media_table(spark, n=60).cache()
    df.count()
    return df


def test_media_schema(media):
    assert set(media.columns) == {"media_id", "kind", "content", "meta"}
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_image_features_plumbing(media):
    feats = multimodal.decode_image_features(media, feat_dim=16)
    rows = feats.collect()
    assert len(rows) == media.where(F.col("kind") == "image").count()
    for r in rows[:5]:
        assert len(r["features"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["features"])
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in multimodal.decode_image_features(media, 16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_video_frame_sampling(media):
    frames = multimodal.sample_video_frames(media, every_s=2.0)
    rows = frames.collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    meta = {r["media_id"]: r["meta"] for r in media.where(F.col("kind") == "video").collect()}
    for mid, rs in by_media.items():
        dur, fps = float(meta[mid]["duration_s"]), float(meta[mid]["fps"])
        assert len(rs) == max(int(dur / 2.0), 1)
        for r in rs:
            assert r["frame_idx"] == int(r["t_offset_s"] * fps)
            assert r["t_offset_s"] < dur


def test_audio_chunk_plan(media):
    chunks = multimodal.audio_chunk_plan(media, chunk_s=5.0)
    rows = chunks.collect()
    assert rows
    for r in rows:
        assert r["end_s"] > r["start_s"]
        assert r["n_samples"] == int((r["end_s"] - r["start_s"]) * 8000)


def test_wav_roundtrip():
    import numpy as np

    sr = 8000
    t = np.arange(sr) / sr
    x = 0.3 * np.sin(2 * np.pi * 440.0 * t)
    sr2, y = multimodal.decode_wav_pcm16(multimodal.encode_wav_pcm16(x, sr))
    assert sr2 == sr and len(y) == len(x)
    assert float(abs(y - x).max()) < 1e-4  # 16-bit quantization only


def test_audio_features_of_pure_tone(spark):
    """REAL DSP check: a 440 Hz sine's spectral centroid lands at
    ~440 Hz, zero-crossing rate at ~2x440/s, RMS at amp/sqrt(2)."""
    import numpy as np
    from pyspark.sql import functions as F

    sr, amp, f0 = 8000, 0.5, 440.0
    t = np.arange(2 * sr) / sr
    wav = multimodal.encode_wav_pcm16(amp * np.sin(2 * np.pi * f0 * t), sr)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), {"sample_rate": str(sr)})],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    r = multimodal.decode_audio_features(df).collect()[0]
    assert r["sample_rate"] == sr and r["n_samples"] == 2 * sr
    assert abs(r["rms"] - amp / 2**0.5) < 1e-3
    assert abs(r["spectral_centroid_hz"] - f0) < 5.0
    assert abs(r["zcr"] - 2 * f0) < 10.0
    assert len(r["band_energies"]) == 8
    # a 440 Hz tone at sr=8000 lives in the lowest of 8 linear bands
    assert r["band_energies"][0] == max(r["band_energies"])


def test_audio_features_over_generated_table(media):
    from pyspark.sql import functions as F

    feats = multimodal.decode_audio_features(media).collect()
    assert feats
    for r in feats:
        # generated tones are 200-1100 Hz + small noise
        assert 100.0 < r["spectral_centroid_hz"] < 2500.0
        assert 0.2 < r["rms"] < 0.5


def test_decode_image_features_single_python_stage(spark):
    """Plan gate: the whole image-feature path is ONE Arrow-batched
    Python stage (mapInPandas) — no extra Python round trips and no
    shuffle between filter and features.  (A plain createDataFrame
    input keeps the generator's own mapInPandas out of the plan.)"""
    df_in = spark.createDataFrame(
        [(1, "image", bytearray(b"\x01\x02"), {"width": "8", "height": "8"})],
        multimodal.MEDIA_SCHEMA,
    )
    df = multimodal.decode_image_features(df_in, feat_dim=16)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("MapInPandas (") == 1  # tree form: exactly one stage
    assert "Exchange" not in plan


# -- round-4 corpus-curation screens ---------------------------------------


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (0, "mail a@b.org or c.d+e@sub.ex.com call 555-123-4567 ssn 123-45-6789 ip 10.0.0.1"),
        (1, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ssn"], out[0]["n_ipv4"]) == (
        2,
        1,
        1,
        1,
    )
    assert out[0]["redacted"] == "mail <EMAIL> or <EMAIL> call <PHONE> ssn <SSN> ip <IP>"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ssn"], out[1]["n_ipv4"]) == (
        0,
        0,
        0,
        0,
    )
    assert out[1]["redacted"] == "no pii here at all"


def test_ngram_repetition_fractions(spark):
    rows = [
        (0, "a b a b a b"),  # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
        (1, "all words here are unique tokens"),
        (2, "one"),  # too short for any gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.ngram_repetition(df).collect()}
    assert out[0]["dup_bigram_frac"] == pytest.approx(1 - 2 / 5)
    assert out[0]["max_bigram_count"] == 3  # "a b" x3
    # trigrams: aba bab aba bab -> 4 total 2 distinct
    assert out[0]["dup_trigram_frac"] == pytest.approx(1 - 2 / 4)
    assert out[1]["dup_bigram_frac"] == 0.0
    assert out[1]["dup_trigram_frac"] == 0.0
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["max_bigram_count"] == 0
    assert len(out) == 3


def test_contamination_overlap_planted(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "unrelated words that never overlap anything at all"),
            (2, "prefix alpha beta gamma delta epsilon suffix words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "g string"
    )
    out = {
        r["doc_id"]: r
        for r in text.contamination_overlap(corpus, bench, n=5).collect()
    }
    assert out[0]["contaminated"] and out[0]["n_contaminated_grams"] == 1
    assert out[2]["contaminated"] and out[2]["n_contaminated_occurrences"] == 1
    assert not out[1]["contaminated"] and out[1]["n_contaminated_grams"] == 0


def test_contamination_broadcasts_bench(spark):
    corpus = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("a b c d e",)], "g string")
    plan = text.contamination_overlap(corpus, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dup_spans_finds_planted_span(spark):
    from polar_spark.operators.text import dup_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    rows = [
        (0, f"one two three {shared} four five"),
        (1, f"{shared} six seven eight nine ten eleven"),
        (2, "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
        (3, "short doc"),  # fewer than k tokens → zero windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dup_spans(df, "text", "doc_id", k=8).collect()
    # exactly one duplicated 8-token span (the planted one), seen once
    # in each of two documents
    assert len(got) == 1
    assert got[0]["n_docs"] == 2 and got[0]["n_occ"] == 2


def test_dup_spans_counts_within_doc_repeats(spark):
    from polar_spark.operators.text import dup_spans

    span = "a b c d e f g h"
    df = spark.createDataFrame(
        [(0, f"{span} x {span}"), (1, f"y {span} z")], "doc_id long, text string"
    )
    got = {r["h"]: (r["n_docs"], r["n_occ"]) for r in dup_spans(df, "text", "doc_id", k=8).collect()}
    # the planted span occurs twice in doc 0 and once in doc 1
    assert (2, 3) in got.values()


def test_dup_spans_stays_jvm(spark):
    from polar_spark.operators.text import dup_spans

    df = spark.createDataFrame([(0, "a b c d e f g h i")], "doc_id long, text string")
    plan = dup_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def _py_winnow(text_str: str, k: int, w: int):
    """Pure-python golden for winnow_fingerprints (exact replay)."""
    from polar_spark.operators.dedup import _P31, _POLY_B
    from polar_spark.operators.text import _WIN_POS_BITS, SPAN_B

    def ph(tok):
        acc = 0
        for ch in tok:
            acc = (acc * _POLY_B + ord(ch)) % _P31
        return acc

    th = [ph(t) for t in text_str.strip().split()]
    kgs = []
    for i in range(len(th) - k + 1):
        acc = 0
        for hv in th[i : i + k]:
            acc = (acc * SPAN_B + hv) % _P31
        kgs.append(acc)
    keys = [(h << _WIN_POS_BITS) + i + 1 for i, h in enumerate(kgs)]
    nk = len(kgs)
    if nk == 0:
        return 0, set()
    winners = [min(keys[s : s + w]) for s in range(max(nk - w + 1, 1))]
    return nk, {key >> _WIN_POS_BITS for key in winners}


def test_winnow_matches_python_golden(spark):
    from polar_spark.operators.text import winnow_fingerprints

    rows = [
        (0, "one two three alpha beta gamma delta epsilon four five six seven"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "a b c d"),  # exactly k tokens → one k-gram, one fingerprint
        (3, "x y"),  # fewer than k tokens → zero windows
        (4, "rep rep rep rep rep rep rep rep rep rep"),  # degenerate ties
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_kgrams"], set(r["fps"]), r["n_fps"])
        for r in winnow_fingerprints(df, "text", "doc_id", k=4, w=5).collect()
    }
    for doc_id, text_str in rows:
        nk, fps = _py_winnow(text_str, 4, 5)
        assert got[doc_id] == (nk, fps, len(fps)), doc_id


def test_winnow_guarantee_shared_span(spark):
    """SWA guarantee: any shared run of k+w-1 tokens shares a
    selected fingerprint between the two documents."""
    from polar_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # k+w-1 = 8 tokens
    rows = [
        (0, f"one two three {shared} four five six"),
        (1, f"{shared} nine ten eleven twelve thirteen"),
        (2, "totally different words with no overlap at all here friend"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in winnow_fingerprints(df, "text", "doc_id", k=4, w=5).collect()
    }
    assert fps[0] & fps[1], "shared 8-token span must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_winnow_pure_map_plan(spark):
    """Selection is a per-document map: no python stage, no Exchange."""
    from polar_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j k l m n")], "doc_id long, text string"
    )
    out = winnow_fingerprints(df, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
    row = out.collect()[0]
    assert 1 <= row["n_fps"] <= row["n_kgrams"]


def test_block_dedup_rewrites_corpus(spark):
    from polar_spark.operators.text import block_dedup

    rows = [
        (0, "a b c d e f g h"),  # dup block + unique block
        (1, "a b c d x y z w"),  # same dup block, different tail
        (2, "a b c d"),  # entirely duplicated → empty rewrite
        (3, "p q r s p q r s"),  # within-doc repeat also removed
        (4, "m n o p q"),  # partial tail block, all unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["n_removed"], r["clean_text"])
        for r in block_dedup(df, "text", "doc_id", block=4).collect()
    }
    assert got[0] == (2, 1, 1, "e f g h")
    assert got[1] == (2, 1, 1, "x y z w")
    assert got[2] == (1, 0, 1, "")
    assert got[3] == (2, 0, 2, "")
    assert got[4] == (2, 2, 0, "m n o p q")


def test_block_dedup_stays_jvm(spark):
    from polar_spark.operators.text import block_dedup

    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    plan = block_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_unigram_logprob_hand_computed(spark):
    import math

    from polar_spark.operators.text import unigram_logprob

    # corpus: 'a' x3, 'b' x2, 'c' x1 → p(a)=1/2, p(b)=1/3, p(c)=1/6
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_tokens"], r["logppl"]) for r in unigram_logprob(df).collect()}
    want0 = (2 * -math.log2(1 / 2) + -math.log2(1 / 3)) / 3
    want1 = (-math.log2(1 / 2) + -math.log2(1 / 3) + -math.log2(1 / 6)) / 3
    assert got[0][0] == 3 and abs(got[0][1] - want0) < 1e-12
    assert got[1][0] == 3 and abs(got[1][1] - want1) < 1e-12
    # the rare-token doc scores strictly higher (the filter signal)
    assert got[1][1] > got[0][1]


def test_unigram_logprob_stays_jvm(spark):
    from polar_spark.operators.text import unigram_logprob

    df = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    plan = unigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_dup_spans_hash_families_agree_on_duplicates(spark):
    """Production xxhash64 tokens and the oracle arith family must
    find the same duplicated spans (hash values differ; the grouped
    (n_docs, n_occ) multiset must not)."""
    from collections import Counter

    from polar_spark.operators.text import dup_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(0, f"x {shared} y"), (1, f"{shared} z w v u t s"), (2, "unrelated words only here nothing repeats at all")],
        "doc_id long, text string",
    )
    a = Counter((r["n_docs"], r["n_occ"]) for r in dup_spans(df, k=8).collect())
    b = Counter(
        (r["n_docs"], r["n_occ"])
        for r in dup_spans(df, k=8, hash_family="xxhash64").collect()
    )
    assert a == b and sum(a.values()) >= 1


def test_textrank_hub_word_wins(spark):
    from polar_spark.operators.text import cooccurrence_edges, textrank

    # 'core' co-occurs with every other word; the rest only with 'core'
    df = spark.createDataFrame(
        [(0, "core alpha core beta core gamma core delta")],
        "doc_id long, text string",
    )
    e = cooccurrence_edges(df, window=2)
    assert e.where("src = dst").count() == 0
    got = sorted(
        ((r["rank"], r["word"]) for r in textrank(df, window=2).collect()), reverse=True
    )
    assert got[0][1] == "core"
