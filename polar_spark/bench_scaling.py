"""Scaling-evidence job: identical PageRank work at a chosen parallelism.

The north rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors; in this sandbox (single host) the evidence is the same job on
the same deterministic input at ``local[N]`` vs ``local[4N]``
(BASELINE.md, task-driver note).  Run via::

    python -m polar_spark.bench_scaling --cpus 8  --edges 10000000
    python -m polar_spark.bench_scaling --cpus 32 --edges 10000000

Each invocation is its own JVM (fresh scheduler, no warm-cache bleed)
and prints one JSON line with edges/sec over fixed PageRank iterations.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from polar_spark.plans import pregel
    from polar_spark.session import get_spark
    from polar_spark.sources.synthetic import gen_zipf_edges

    # 3x waves per stage: with exactly one task wave a single straggler
    # (hub-dst partition) stalls the stage; oversubscription smooths it —
    # the same sizing rule as a real cluster (2-3x total cores)
    parts = 3 * args.cpus
    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name=f"polar_scaling_{args.cpus}",
        shuffle_partitions=parts,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    edges = gen_zipf_edges(
        spark, args.edges, args.vertices, seed=args.seed, partitions=parts
    )
    t0 = time.monotonic()
    _ranks, st = pregel.pagerank(
        edges, tol=0.0, max_iter=args.iters, num_partitions=parts
    )
    wall = time.monotonic() - t0
    iter_wall = sum(st.iter_seconds)
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "edges": st.edges,
                "vertices": st.vertices,
                "iterations": st.iterations,
                "wall_sec": round(wall, 3),
                "iter_sec": round(iter_wall, 3),
                "iters_per_sec": round(st.iterations / iter_wall, 4),
                "edges_per_sec": round(st.edges * st.iterations / iter_wall),
                "final_delta": st.final_delta,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
