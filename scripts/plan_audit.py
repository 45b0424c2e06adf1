#!/usr/bin/env python
"""Emit PLANS_r5.md: the formatted physical plans of representative
headline queries, annotated with the property each plan is expected to
show (pushdown reaching the scan, broadcast on dimensions, exchange
counts, whole-stage codegen spans).  The committed artifact lets a
reviewer check "is this the plan you'd want at 100x" without running
anything.

Usage: python scripts/plan_audit.py [--sf DIR] [--out PLANS_r5.md]
"""

from __future__ import annotations

import os
import sys

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo_root)

# (query name, what to verify in the plan)
AUDITS = [
    (
        "q3_shipping",
        "date + segment filters appear in PushedFilters on the parquet "
        "scans; customer dim joins as BroadcastHashJoin; revenue is one "
        "partial_sum/final merge (map-side combine).",
    ),
    (
        "q1_pricing",
        "shipdate filter pushed to the scan; ONE hash aggregate pair "
        "(partial + final) over 6 groups; everything inside "
        "WholeStageCodegen.",
    ),
    (
        "q9_profit",
        "part name filter broadcasts into the lineitem scan; "
        "supplier→nation is a broadcast chain; the single shuffle join "
        "is lineitem ⨝ orders on orderkey.",
    ),
    (
        "weighted_jaccard20",
        "candidate set = the co-part edge table (no cartesian / no "
        "all-pairs); per-supplier totals join as broadcasts.",
    ),
    (
        "session_windows",
        "native SessionWindow aggregate (no Python stage); one exchange "
        "on user_id.",
    ),
    (
        "partition_cut_audit",
        "three cut counters fold in ONE aggregate over the labeled edge "
        "table; LPA labels come from two join-aggregate rounds, no "
        "Python.",
    ),
    (
        "dedup_exact",
        "one exchange (the hash groupBy), partial aggregation before it.",
    ),
    (
        "knn_cosine",
        "bounded query side broadcast; dot products are JVM higher-order "
        "functions inside codegen — no BatchEvalPython.",
    ),
    (
        "forman_curvature",
        "degrees + per-edge triangle support fold into the curvature "
        "expression in one pass: the triangle join is id-ordered "
        "(sort-merge or shuffle-hash on edge keys, no cartesian), the "
        "histogram is one partial+final aggregate pair.",
    ),
    (
        "cusum_hourly",
        "the heavy lift (hour bucketing + counts) is ONE distributed "
        "groupBy before the bounded calendar-hour window; the totals "
        "ride a 1-row broadcast; no Python stage anywhere.",
    ),
    (
        "chi2_terms",
        "doc-frequency aggregates are two groupBys over the exploded "
        "token table; the scoring is pure JVM arithmetic; the top-5 "
        "window is partitioned BY SOURCE (parallel, not a global sort).",
    ),
    (
        "ols_price_qty",
        "ONE aggregation pass computes all six sufficient statistics "
        "(partial + final merge); the two dimension joins broadcast; "
        "derived slope/intercept/R² are projection-only.",
    ),
    (
        "dq_report",
        "every FK check is a left-anti join with the dimension side "
        "broadcast where small; no check materializes more than a "
        "counter.",
    ),
    (
        "kn_bigram_ppl",
        "(doc, bigram) collapses in a groupBy BEFORE the corpus-count "
        "joins (skew discipline); the bigram-type scalar rides a 1-row "
        "literal; all log terms JVM-side, no Python stage.",
    ),
    (
        "item_cf10",
        "the pair join is keyed on the order (no cartesian); part "
        "totals join the pair table; the top-10 window is partitioned "
        "BY PART (parallel, never a global sort).",
    ),
    (
        "kaplan_meier",
        "the heavy lift (gaps) is a customer-partitioned lag window; "
        "the survival windows run on the pre-aggregated distinct-time "
        "table (bounded by calendar days — the single-partition "
        "WindowExec there is intentional and bounded).",
    ),
    (
        "ewma_forecast",
        "daily cents is ONE distributed aggregate (partial + final); "
        "the 20 lag terms run on the bounded day table; zero Python, "
        "zero floats.",
    ),
    (
        "knn_homophily",
        "exact 5-NN via the single vectorized mapInPandas pair scan "
        "(ONE Python stage by design, Arrow-batched); label joins and "
        "ppm ratios are JVM-side aggregates.",
    ),
    (
        "logreg_gd3",
        "each GD round is one map + one partially-aggregated reduce "
        "over the fact table; weights ride as literals (no shuffle of "
        "model state); no Python stage.",
    ),
    (
        "kmv_distinct",
        "hash chain is pure JVM arithmetic inside codegen; the distinct "
        "+ per-group top-K window partitions BY GROUP (parallel); exact "
        "count joins broadcast the 5-row sketch sides.",
    ),
    (
        "logrank_test",
        "the heavy lift (gaps) is ONE customer-partitioned lag window; "
        "customer group bits broadcast onto orders; all risk-set windows "
        "run on the pre-aggregated distinct-time table (bounded by "
        "calendar days); the χ² is projection-only over one final row.",
    ),
    (
        "cka_views",
        "the d² covariance reduction is one partial+final aggregate over "
        "posexploded (i,j) pairs — data never shuffles, only the 64×64 "
        "matrix; block Frobenius sums are a 3-row pivot; no Python.",
    ),
    (
        "als_rank1",
        "both alternations are join-aggregates: user factors groupBy "
        "cust, item factors join u then groupBy part (partial + final "
        "merges); the top-20 window is the only ordered stage.",
    ),
    (
        "best_stump",
        "class histogram is ONE distributed groupBy over the fact "
        "table; cumulative/total windows run on the ≤11-row threshold "
        "grid (bounded single-partition window is intentional); no "
        "Python stage.",
    ),
    (
        "ks_2samp",
        "daily aggregation is the only fact-table pass; half-tagging "
        "rides a 1-row broadcast; cumulative counts and the argmax "
        "window run on the bounded daily grid.",
    ),
]


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    out = os.path.join(repo_root, "PLANS_r5.md")
    args = sys.argv[1:]
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--out" in args:
        out = args[args.index("--out") + 1]

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("polar_spark_plan_audit")
        .getOrCreate()
    )
    qs = entry_mod.queries()
    lines = [
        "# PLANS_r5 — physical-plan audit of representative queries",
        "",
        f"Generated by `scripts/plan_audit.py` at `{sf_dir}` "
        "(plan SHAPE is scale-independent; only statistics differ).",
        "",
    ]
    for name, expect in AUDITS:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines += [
            f"## {name}",
            "",
            f"**Expect:** {expect}",
            "",
            "```",
            plan.strip(),
            "```",
            "",
        ]
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({len(AUDITS)} plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
