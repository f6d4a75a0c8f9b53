"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query executes fully via the noop sink (no driver collect, no
result materialisation cost — measures the plan, not the pickle).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from process_alphafold3_outputs_spark.plans import driver_queries as dq
from process_alphafold3_outputs_spark.plans import driver_queries_ext  # noqa: F401
from process_alphafold3_outputs_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "screen_filter",
    "ordered_concat",
    "conditional_sum",
    "semi_join",
    "collect_set_sorted",
    "topk_per_group",
    "range_threshold",
    "sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard",
    "dedup_simhash",
    "similarity_topk",
    "text_language_id",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
]


def _af3_bench_corpus(sf: float) -> str:
    """Deterministic AF3 corpus scaled by sf (cached on disk): the
    flagship pipeline benchmark input."""
    import glob

    from process_alphafold3_outputs_spark.fixtures import write_corpus

    # scale=6 ⇒ chains of ~70-115 residues, pae ~30-50k rows/job — per-job
    # compute resembling real AF3 jobs; job count grows with sf
    n_jobs = max(10, int(1000 * sf))
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".cache", f"af3_bench_{n_jobs}_s6")
    if not glob.glob(os.path.join(d, "atoms.parquet")):
        write_corpus(d, n_jobs=n_jobs, seed=13, scale=6)
    return d


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("af3spark-bench")

    # warm the JVM + parquet footers once so timings measure query
    # execution, not first-touch session setup
    dq.pricing_summary(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # AF3 flagship: screen → PAE kernel → contacts → islands → report
    from process_alphafold3_outputs_spark.params import ScreenParams
    from process_alphafold3_outputs_spark.plans.pipeline import interaction_report

    af3_dir = _af3_bench_corpus(sf)
    af3 = {
        n: spark.read.parquet(os.path.join(af3_dir, f"{n}.parquet"))
        for n in ("predictions", "chains", "pae_long", "atoms")
    }
    def timed(build) -> float:
        """min of 2 runs — the host VM shows up to 3× run-to-run noise;
        the min is the closest observable to true query cost."""
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    timings: dict[str, float] = {}
    timings["af3_flagship"] = timed(
        lambda: interaction_report(
            af3["predictions"], af3["chains"], af3["pae_long"], af3["atoms"],
            ScreenParams(),
        )
    )
    for name in HEADLINE:
        fn = dq._QUERIES[name]
        timings[name] = timed(lambda: fn(spark, sf_dir))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
