"""Scaling-evidence job: identical PageRank work at a chosen parallelism.

The north rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors; in this sandbox (single host) the evidence is the same job on
the same deterministic input at N vs 4N separate executor JVMs
(``local-cluster`` mode — BASELINE.md, task-driver note).  The round-2
protocol (see BENCH/BASELINE.md) pins the SAME partition count on both
legs so the physical plans are identical::

    python -m polar_spark.bench_scaling --executors 1 --cores-per-executor 4 \
        --partitions 48 --edges 40000000 --vertices 200000
    python -m polar_spark.bench_scaling --executors 4 --cores-per-executor 4 \
        --partitions 48 --edges 40000000 --vertices 200000

Each invocation is its own JVM set (fresh scheduler, no warm-cache
bleed) and prints one JSON line with edges/sec over fixed PageRank
iterations (the fused lazily-chained loop by default).  Host
interference varies identical runs up to 3x between minutes —
interleave legs and take best-of-N (the capability estimator least
distorted by shared-host neighbors).

``--study N`` runs the whole interleaved protocol in ONE process:
N repetitions of (leg₁, leg₂, …) back-to-back — each leg still gets a
fresh SparkSession/scheduler, but consecutive legs now share the same
measurement window as tightly as the host allows — and prints one JSON
line per run plus a summary line with same-rep and pooled-best-of
efficiencies.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None, help="local[N] thread mode")
    ap.add_argument(
        "--executors",
        type=int,
        default=None,
        help="local-cluster[N,cores,mem] mode: N separate executor JVMs "
        "(the closest single-host analog of N cluster executors)",
    )
    ap.add_argument("--cores-per-executor", type=int, default=4)
    ap.add_argument("--executor-mem-mb", type=int, default=6144)
    ap.add_argument(
        "--partitions",
        type=int,
        default=None,
        help="pin the shuffle/graph partition count (default 3x total cores); "
        "pass the SAME value to both legs for a bit-identical-plan comparison",
    )
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--algo",
        choices=["pagerank", "cc"],
        default="pagerank",
        help="operator under measurement: pagerank (fixed --iters) or "
        "cc (hash-min connected components to fixpoint; deterministic "
        "round count on a fixed input, so throughput is comparable "
        "across parallelism levels)",
    )
    ap.add_argument(
        "--no-fuse",
        action="store_true",
        help="force the classic one-job-per-iteration loop; the fused "
        "lazily-chained path (default) removes per-round driver round "
        "trips and measured fastest on both legs in quiet windows",
    )
    ap.add_argument(
        "--study",
        type=int,
        default=0,
        metavar="REPS",
        help="run REPS interleaved repetitions of --study-legs in one "
        "process (fresh session per leg) and print a summary with "
        "same-rep + pooled-best-of scaling efficiencies",
    )
    ap.add_argument(
        "--study-legs",
        type=str,
        default="1,4",
        help="comma-separated executor counts for --study (default 1,4)",
    )
    ap.add_argument(
        "--warmup-iters",
        type=int,
        default=0,
        help="untimed PageRank iterations run first on the same session/graph "
        "so JIT/codegen/executor-registration warmup is excluded from the "
        "steady-state throughput of BOTH legs (0 disables)",
    )
    args = ap.parse_args()

    if args.study:
        legs = [int(x) for x in args.study_legs.split(",")]
        runs: list[dict] = []
        for rep in range(1, args.study + 1):
            for ex in legs:
                out = run_leg(args, executors=ex)
                out["rep"] = rep
                print(json.dumps(out), flush=True)
                runs.append(out)
        by_leg = {ex: [r for r in runs if r["executors"] == ex] for ex in legs}
        lo, hi = min(legs), max(legs)
        ratio = hi / lo
        best = {ex: max(r["edges_per_sec"] for r in by_leg[ex]) for ex in legs}
        same_rep = [
            round(b["edges_per_sec"] / a["edges_per_sec"] / ratio, 3)
            for a, b in zip(by_leg[lo], by_leg[hi])
        ]
        print(
            json.dumps(
                {
                    "summary": "scaling_study",
                    "legs": legs,
                    "reps": args.study,
                    "best_eps": best,
                    "pooled_best_of_efficiency": round(best[hi] / best[lo] / ratio, 3),
                    "same_rep_efficiencies": same_rep,
                }
            )
        )
        return

    out = run_leg(args, executors=args.executors)
    print(json.dumps(out))


def run_leg(args, executors: int | None) -> dict:
    from polar_spark.plans import pregel
    from polar_spark.session import get_spark
    from polar_spark.sources.synthetic import gen_zipf_edges

    if executors:
        total_cores = executors * args.cores_per_executor
        master = f"local-cluster[{executors},{args.cores_per_executor},{args.executor_mem_mb}]"
        label = f"local-cluster[{executors}x{args.cores_per_executor}]"
        import os

        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/polar-spark-local")
    else:
        total_cores = args.cpus or 8
        master = f"local[{total_cores}]"
        label = master
    # 3x waves per stage: with exactly one task wave a single straggler
    # (hub-dst partition) stalls the stage; oversubscription smooths it —
    # the same sizing rule as a real cluster (2-3x total cores)
    parts = args.partitions or (3 * total_cores)
    spark = get_spark(
        master=master,
        app_name=f"polar_scaling_{label}",
        shuffle_partitions=parts,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.executor.memory": f"{args.executor_mem_mb}m",
            # AQE's stage-by-stage replanning is a per-stage DRIVER-serial
            # round trip — measured ~2x the per-iteration wall on this
            # loop.  The scaling job pins partition counts explicitly
            # (identical plans across parallelism levels is part of the
            # protocol), so adaptive replanning buys nothing here; leave
            # AQE on for ad-hoc queries, off for the pinned iteration loop.
            "spark.sql.adaptive.enabled": "false",
        },
    )
    edges = gen_zipf_edges(
        spark, args.edges, args.vertices, seed=args.seed, partitions=parts
    )
    if args.warmup_iters > 0:
        pregel.pagerank(
            edges, tol=0.0, max_iter=args.warmup_iters, num_partitions=parts, fuse=False
        )
    t0 = time.monotonic()
    if getattr(args, "algo", "pagerank") == "cc":
        _comp, st = pregel.connected_components(edges, num_partitions=parts)
    else:
        _ranks, st = pregel.pagerank(
            edges,
            tol=0.0,
            max_iter=args.iters,
            num_partitions=parts,
            fuse=False if args.no_fuse else None,
        )
    wall = time.monotonic() - t0
    iter_wall = sum(st.iter_seconds)
    out = {
        "mode": label,
        "algo": getattr(args, "algo", "pagerank"),
        "executors": executors,
        "total_cores": total_cores,
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
    spark.stop()
    return out


if __name__ == "__main__":
    main()
