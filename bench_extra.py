"""Round-7 optimization helper bench (bench.py itself is FROZEN).

Times any subset of the declared queries with bench.py's exact protocol
(one untimed warm pass, then min-of-N timed noop-sink passes) and can dump
``.explain("formatted")`` for each into plans/r07/<query>_<tag>.txt.

Usage:
  python bench_extra.py q1_pricing_summary corpus_assembly    # time these
  python bench_extra.py --plans before q1_pricing_summary     # dump plans
  python bench_extra.py --cc                                  # cc_1m/10m legs
  python bench_extra.py --kg                                  # kg bench legs
  python bench_extra.py --delta                               # delta fold leg

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_tag = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        del args[i : i + 2]
    do_cc = "--cc" in args
    do_kg = "--kg" in args
    do_delta = "--delta" in args
    args = [a for a in args if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    import __spark_entry__ as entry_mod
    from omop_concept_automapper_spark.benchkit import force
    from omop_concept_automapper_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus)
    qmap = entry_mod.queries()
    timings: dict[str, float] = {}

    if args:
        force(qmap["q1_pricing_summary"](spark, sf_dir))  # pool warmup
    for name in args:
        if plans_tag:
            os.makedirs("plans/r07", exist_ok=True)
            df = qmap[name](spark, sf_dir)
            with open(f"plans/r07/{name}_{plans_tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        force(qmap[name](spark, sf_dir))  # warm, untimed
        best = float("inf")
        for _ in range(n_reps):
            t0 = time.perf_counter()
            force(qmap[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    if do_cc:
        from pyspark.sql import functions as F

        from omop_concept_automapper_spark.operators.connected_components import (
            connected_components,
        )

        for label, n_hub, n_cc in (
            ("cc_components_1m", 200_000, 1_000_000),
            ("cc_components_10m", 2_000_000, 10_000_000),
        ):
            hub = spark.range(1, n_hub).select(
                F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
            )
            rest = spark.range(n_hub, n_cc).select(
                F.col("id").alias("src"),
                (F.col("id") - F.col("id") % 50).cast("long").alias("dst"),
            )
            cc_edges = hub.union(rest).localCheckpoint(eager=True)
            spark.sparkContext.setJobDescription(f"bench_extra: {label}")
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                force(connected_components(cc_edges))
                best = min(best, time.perf_counter() - t0)
            timings[label] = round(best, 3)
            spark.sparkContext.setJobDescription(None)

    if do_kg:
        from omop_concept_automapper_spark.benchkit import run_kg_bench

        work = tempfile.mkdtemp(prefix="kg_benchx_")
        try:
            kg = run_kg_bench(
                spark,
                transcripts_path=os.path.join(work, "transcripts"),
                out_dir=os.path.join(work, "out"),
                n_conversations=int(
                    os.environ.get("SPARK_GRAFT_KG_CONVS", "200000")
                ),
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
        timings["kg_extract_link"] = kg["sec_extract_link"]
        timings["kg_extract_link_fileidx"] = kg["sec_extract_link_fileidx"]
        timings["kg_canonicalize"] = kg["sec_canonicalize"]
        timings["kg_turns_per_sec"] = kg["turns_per_sec_extract_link"]
        timings["kg_turns_per_sec_fileidx"] = kg["turns_per_sec_fileidx"]

    if do_delta:
        from omop_concept_automapper_spark.benchkit import run_delta_fold_bench

        work_delta = tempfile.mkdtemp(prefix="kg_deltax_")
        try:
            dd = run_delta_fold_bench(
                spark,
                work_delta,
                n_conversations=int(
                    os.environ.get("SPARK_GRAFT_KG_CONVS", "200000")
                ),
                delta_frac=0.01,
            )
        finally:
            shutil.rmtree(work_delta, ignore_errors=True)
        timings["kg_delta_fold_1pct"] = dd["sec_delta_fold"]
        timings["kg_delta_from_scratch_base_sec"] = dd["sec_from_scratch_base"]

    sys.stdout.write(json.dumps(timings) + "\n")


if __name__ == "__main__":
    main()
