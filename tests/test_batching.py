"""grouped_batches: no key group is ever split across yielded frames."""

import pandas as pd

from polar_spark.functions.batching import grouped_batches


def _frames(rows, sizes):
    out, i = [], 0
    for s in sizes:
        out.append(pd.DataFrame(rows[i : i + s]))
        i += s
    return out


def test_groups_never_split():
    rows = [{"k": k, "v": j} for k in range(5) for j in range(7)]
    for sizes in ([3] * 11 + [2], [10, 10, 10, 5], [1] * 35, [35]):
        seen_keys = []
        total = 0
        for f in grouped_batches(iter(_frames(rows, sizes)), ["k"]):
            ks = f["k"].unique().tolist()
            seen_keys.extend(ks)
            total += len(f)
            # every key group inside a frame must be whole (7 rows)
            assert (f.groupby("k").size() == 7).all()
        assert total == 35
        assert sorted(seen_keys) == list(range(5))  # each key exactly once


def test_multi_key_and_empty():
    rows = [{"a": 1, "b": b, "v": j} for b in range(3) for j in range(4)]
    frames = [pd.DataFrame(), *_frames(rows, [5, 5, 2]), pd.DataFrame()]
    out = list(grouped_batches(iter(frames), ["a", "b"]))
    assert sum(len(f) for f in out) == 12
    for f in out:
        assert (f.groupby(["a", "b"]).size() == 4).all()
    assert list(grouped_batches(iter([pd.DataFrame()]), ["a"])) == []
