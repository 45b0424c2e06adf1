"""Sequence packing (operators/packing.py): the two-phase distributed
prefix sum must equal the naive global cumsum for every bucket count,
offsets must tile the stream exactly, and the layout must be invariant
to input partitioning (the reproducibility contract)."""

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.packing import pack_sequences, packing_stats


@pytest.fixture(scope="module")
def toks(spark):
    # irregular token counts incl. a zero-token doc and a doc longer
    # than one sequence
    data = [(i, (7 * i * i + 3 * i) % 90 + (200 if i % 17 == 0 else 0)) for i in range(300)]
    data[5] = (5, 0)
    return spark.createDataFrame(data, "doc_id long, n_tokens long")


def _naive(rows, seq_len, sep=1):
    out = {}
    off = 0
    for i, n in sorted(rows):
        first = off // seq_len
        last = (off + max(n, 1) - 1) // seq_len
        out[i] = (off, first, last, last - first + 1)
        off += n + sep
    return out


def test_matches_naive_for_every_bucket_count(toks):
    rows = [(r["doc_id"], r["n_tokens"]) for r in toks.collect()]
    want = _naive(rows, 64)
    for buckets in (1, 7, 32, 1000):
        got = {
            r["doc_id"]: (r["start_offset"], r["first_seq"], r["last_seq"], r["n_seqs"])
            for r in pack_sequences(toks, 64, buckets=buckets).collect()
        }
        assert got == want, f"buckets={buckets}"


def test_offsets_tile_the_stream(toks):
    out = pack_sequences(toks, 64).orderBy("doc_id").collect()
    off = 0
    for r in out:
        assert r["start_offset"] == off
        off += r["n_tokens"] + 1


def test_partitioning_invariance(toks):
    a = pack_sequences(toks, 128, buckets=16).collect()
    b = pack_sequences(toks.repartition(13), 128, buckets=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_long_doc_spans_multiple_sequences(spark):
    df = spark.createDataFrame([(0, 10), (1, 300), (2, 5)], "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_sequences(df, 100).collect()}
    assert out[1]["n_seqs"] == 4           # tokens 11..310 → seqs 0..3
    assert out[2]["first_seq"] == 3        # starts at offset 312


def test_empty_input_and_bad_seq_len(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, 64).count() == 0
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(empty, 0)


def test_stats(spark):
    df = spark.createDataFrame([(0, 10), (1, 20), (2, 30)], "doc_id long, n_tokens long")
    st = packing_stats(pack_sequences(df, 32), 32).first()
    # stream = 10+1+20+1+30+1 = 63 tokens → 2 sequences, fill 60/63
    assert st["n_docs"] == 3
    assert st["stream_tokens"] == 63
    assert st["n_sequences"] == 2
    assert abs(st["fill_ratio"] - 60 / 63) < 1e-9
