"""Generate SCALING.md — measured runtime growth of the headline queries
across sf0.001 / sf0.01 / sf0.1 (100x data span).

The 100 TB argument in one number per query: r = t(sf0.1) / t(sf0.01)
over a 10x data step. r <~ 3 means fixed overhead (session, planning,
codegen) still dominates at this scale; r ~ 10 means the query is
data-bound and scaling linearly; r >> 10 would flag a super-linear
operator (none expected: no cartesian products, no all-pairs joins —
enforced by tests/test_plans.py).

Method mirrors bench.py: one local[32] session, page cache pre-warmed per
SF, min-of-2 per query, noop sink (full computation, no collect).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, bench_overrides, materialize  # noqa: E402

SFS = ("0.001", "0.01", "0.1")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    from transitlog_hfp_sink_spark.queries import queries as all_queries
    from transitlog_hfp_sink_spark.session import build_session
    from transitlog_hfp_sink_spark.sources.files import read_table

    spark = build_session(app_name="scaling", master="local[32]",
                          shuffle_partitions=32)
    qs = all_queries()
    qs.update(bench_overrides())
    spark.range(1000).count()

    results: dict[str, dict[str, float]] = {n: {} for n in BENCH_QUERIES}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for t in TABLES:
            read_table(spark, sf_dir, t).count()
        for name in BENCH_QUERIES:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                materialize(qs[name](spark, sf_dir))
                best = min(best, time.time() - t0)
            results[name][sf] = round(best, 3)

    lines = [
        "# SCALING — measured runtime vs scale factor (local[32], min-of-2)",
        "",
        "100x data span (sf0.001 -> sf0.1). `r = t(sf0.1)/t(sf0.01)` over a",
        "10x data step: r <~ 3 = fixed-overhead bound at this scale, r ~ 10 =",
        "data-bound linear scaling, r >> 10 would flag a super-linear plan",
        "(none present — cartesian/all-pairs shapes are excluded by",
        "tests/test_plans.py). Regenerate: `python tools/scaling_report.py`.",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | r (10x step) |",
        "|---|---|---|---|---|",
    ]
    for name in BENCH_QUERIES:
        r = results[name]
        ratio = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("nan")
        lines.append(
            f"| {name} | {r['0.001']:.3f} | {r['0.01']:.3f} | {r['0.1']:.3f} "
            f"| {ratio:.2f} |"
        )
    totals = {sf: sum(results[n][sf] for n in BENCH_QUERIES) for sf in SFS}
    lines.append(
        f"| **total** | {totals['0.001']:.3f} | {totals['0.01']:.3f} "
        f"| {totals['0.1']:.3f} | {totals['0.1'] / totals['0.01']:.2f} |"
    )
    lines.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "SCALING.md")
    # preserve hand-written / other-tool sections (## ...) after the table
    try:
        with open(out_path) as f:
            old = f.read().splitlines()
        first_section = next(
            i for i, ln in enumerate(old) if ln.startswith("## ")
        )
        lines.extend(old[first_section:] + [""])
    except (FileNotFoundError, StopIteration):
        pass
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
