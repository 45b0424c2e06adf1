"""Naive Bayes classifier + BM25 retrieval + span corruption tests —
python-golden replicas of the exact scaled-integer math, so any
engine-side drift in the hash coin, smoothing, or flooring fails loudly.
"""

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

SCALE = 1_000_000.0


def _bucket(key: int, seed: int = 0) -> int:
    x0 = (key * 2654435761 + seed) % 2**31
    x1 = ((x0 ^ (x0 >> 13)) * 1274126177) % 2**31
    return (x1 ^ (x1 >> 17)) % 10000


NB_ROWS = [
    (0, "apple banana apple fruit", "en"),
    (1, "apfel banane apfel obst", "de"),
    (2, "banana fruit fruit salad", "en"),
    (3, "banane obst obst salat", "de"),
    (4, "apple salad banana", "en"),
    (5, "apfel salat banane", "de"),
    (6, "fruit banana apple apple", "en"),
    (7, "obst banane apfel apfel", "de"),
    (8, "apple obst banana", "en"),
    (9, "apfel fruit banane", "de"),
    (12, "apple banana fruit salad", "en"),  # bucket 8681 → test split
    (15, "apfel banane obst salat", "de"),  # bucket 9063 → test split
]


def _nb_golden(train_bp=8000, seed=0):
    is_train = {i: int(_bucket(i, seed) < train_bp) for i, _, _ in NB_ROWS}
    c = Counter()
    tot = Counter()
    nl = Counter()
    vocab = set()
    n = 0
    for i, txt, lab in NB_ROWS:
        if not is_train[i]:
            continue
        n += 1
        nl[lab] += 1
        for t in txt.split():
            c[(lab, t)] += 1
            tot[lab] += 1
            vocab.add(t)
    v = float(len(vocab))
    labels = sorted(nl)
    out = {}
    for i, txt, lab in NB_ROWS:
        best = None
        for cls in labels:
            default = math.floor(SCALE * math.log(1.0 / (tot[cls] + v)))
            prior = math.floor(SCALE * math.log(nl[cls] / float(n)))
            s = prior
            for t in txt.split():
                if (cls, t) in c:
                    s += math.floor(
                        SCALE * math.log((c[(cls, t)] + 1.0) / (tot[cls] + v))
                    )
                else:
                    s += default
            if best is None or s > best[1] or (s == best[1] and cls < best[0]):
                best = (cls, s)
        out[i] = (lab, best[0], int(lab == best[0]), is_train[i], best[1])
    return out


def test_nb_classify_matches_python_golden(spark):
    from polar_spark.operators.classify import nb_classify

    df = spark.createDataFrame(NB_ROWS, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (
            r["label"],
            r["pred"],
            r["correct"],
            r["is_train"],
            r["score_scaled"],
        )
        for r in nb_classify(df).collect()
    }
    want = _nb_golden()
    assert got == want
    # the hash split actually produced a non-trivial train/test mix
    assert 0 < sum(v[3] for v in want.values()) < len(want)


def test_nb_classify_stays_jvm(spark):
    from polar_spark.operators.classify import nb_classify

    df = spark.createDataFrame(NB_ROWS, "doc_id long, text string, lang string")
    plan = nb_classify(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


BM25_DOCS = [
    (0, "spark shuffle join"),
    (1, "spark spark spark broadcast"),
    (2, "join join hash merge"),
    (3, "filter scan prune"),
]


def _bm25_golden(query_terms, k1=1.2, b=0.75, topk=10):
    tf = defaultdict(Counter)
    for i, txt in BM25_DOCS:
        for t in txt.split():
            tf[i][t] += 1
    dl = {i: len(txt.split()) for i, txt in BM25_DOCS}
    n = float(len(BM25_DOCS))
    total = float(sum(dl.values()))
    df_t = Counter(t for i in tf for t in tf[i])
    scores = {}
    for i in tf:
        s, hits = 0, 0
        for t in set(query_terms):
            if t not in tf[i]:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df_t[t] + 0.5) / (df_t[t] + 0.5))
            denom = tf[i][t] + k1 * ((1.0 - b) + b * dl[i] * n / total)
            s += math.floor(SCALE * idf * (tf[i][t] * (k1 + 1.0)) / denom)
        if hits:
            scores[i] = (s, hits)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:topk]
    return [
        (i, s, h, rnk + 1) for rnk, (i, (s, h)) in enumerate(ranked)
    ]


def test_bm25_matches_python_golden(spark):
    from polar_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(BM25_DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [("qa", "spark join"), ("qb", "scan scan prune")],
        "query_id string, qtext string",
    )
    got = defaultdict(list)
    for r in bm25_topk(docs, queries).collect():
        got[r["query_id"]].append(
            (r["doc_id"], r["score_scaled"], r["n_hit_terms"], r["rnk"])
        )
    assert got["qa"] == _bm25_golden(["spark", "join"])
    # duplicate query terms count once (binary qtf)
    assert got["qb"] == _bm25_golden(["scan", "prune"])
    # qa: doc1 (3× spark) should outrank doc3 (no hit → absent)
    qa_ids = [x[0] for x in got["qa"]]
    assert set(qa_ids) == {0, 1, 2}


def _span_golden(doc_id, text, mask_rate_bp=1500, seed=11):
    toks = text.split()
    masked = [
        int(_bucket(doc_id * 8191 + p % 8191, seed) < mask_rate_bp)
        for p in range(len(toks))
    ]
    inp, tgt, span = [], [], -1
    for p, (t, m) in enumerate(zip(toks, masked)):
        head = m and (p == 0 or not masked[p - 1])
        if head:
            span += 1
            inp.append(f"<extra_id_{span}>")
            tgt.append(f"<extra_id_{span}> {t}")
        elif m:
            tgt.append(t)
        else:
            inp.append(t)
    n_spans = span + 1
    target = " ".join(tgt) + f" <extra_id_{n_spans}>" if n_spans else ""
    return (
        len(toks),
        sum(masked),
        n_spans,
        " ".join(inp),
        target,
    )


def test_span_corruption_matches_python_golden(spark):
    from polar_spark.operators.text import span_corruption

    rows = [(i, " ".join(f"w{j}" for j in range(40 + i))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_masked"],
            r["n_spans"],
            r["input_text"],
            r["target_text"],
        )
        for r in span_corruption(df).collect()
    }
    want = {i: _span_golden(i, txt) for i, txt in rows}
    assert got == want
    # the coin actually masked something somewhere and left spans intact
    assert sum(v[1] for v in want.values()) > 0


def test_span_corruption_stays_jvm(spark):
    from polar_spark.operators.text import span_corruption

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = span_corruption(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def _bpe_golden(texts, n_merges):
    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, cnt in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return words, segs, merges


def test_bpe_train_matches_python_golden(spark):
    from polar_spark.operators.text import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new wider wide",
        "low new wide widest lowest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out, merges = bpe_train(df, n_merges=6)
    words, segs, gold_merges = _bpe_golden(texts, 6)
    assert merges == gold_merges
    got = {r["word"]: (r["cnt"], r["seg"], r["n_syms"]) for r in out.collect()}
    want = {w: (c, " ".join(segs[w]), len(segs[w])) for w, c in words.items()}
    assert got == want


def test_bpe_merge_fold_overlap_rule(spark):
    # 'aaaa' with pair (a,a): greedy left-to-right gives [aa, aa], never
    # [a, aa, a] or a triple-consume
    from polar_spark.operators.text import bpe_train

    df = spark.createDataFrame([(0, "aaaa aaa")], "doc_id long, text string")
    out, merges = bpe_train(df, n_merges=1)
    got = {r["word"]: r["seg"] for r in out.collect()}
    assert merges[0][:2] == ("a", "a")
    assert got == {"aaaa": "aa aa", "aaa": "aa a"}


def test_suffix_ranks_matches_sorted_suffixes(spark):
    from polar_spark.operators.text import suffix_ranks

    texts = ["b a b a", "a b b", "c a b a b"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["pos"]: (r["doc_id"], r["tok"], r["rank"])
           for r in suffix_ranks(df).collect()}
    stream = []
    for i, t in enumerate(texts):
        stream += [(i, w) for w in t.split()]
    suffixes = sorted(range(len(stream)),
                      key=lambda p: [w for _, w in stream[p:]])
    rank = {p: i + 1 for i, p in enumerate(suffixes)}
    want = {p: (stream[p][0], stream[p][1], rank[p]) for p in range(len(stream))}
    assert got == want
    # all ranks distinct and 1..n
    assert sorted(r for _, _, r in got.values()) == list(range(1, len(stream) + 1))
