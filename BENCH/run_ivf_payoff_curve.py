"""One-off calm-host sweep: IVF payoff vs corpus size.

The in-bench payoff entry (bench.py, run_ivf_payoff_bench) uses one
corpus size; this sweep shows the TREND the scale argument rests on —
as the corpus grows, brute-force query cost grows linearly while the
IVF query cost grows with scan_fraction * corpus + fixed job latency,
so speedup climbs toward 1/scan_fraction.  Writes
BENCH/ivf_payoff_curve.json.

Run:  python BENCH/run_ivf_payoff_curve.py [sizes...]
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omop_concept_automapper_spark.benchkit import run_ivf_payoff_bench
from omop_concept_automapper_spark.session import get_spark


def main() -> None:
    # (n_vectors, n_centroids) — more centroids shrink the probed scan
    # fraction; bigger corpora amortize the fixed per-job latency.  Args
    # override as n or n:centroids.
    pts_in = [
        (int(a.split(":")[0]), int(a.split(":")[1]) if ":" in a else 64)
        for a in sys.argv[1:]
    ] or [
        (2_000_000, 64),
        (2_000_000, 128),
        (8_000_000, 64),
        (8_000_000, 128),
        (16_000_000, 128),
    ]
    spark = get_spark("ivf-payoff-curve", cores=32)
    points = []
    for n, cents in pts_in:
        work = tempfile.mkdtemp(prefix="ivfcurve_")
        try:
            r = run_ivf_payoff_bench(spark, work, n_vectors=n,
                                     n_centroids=cents, include_pq=False)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        pt = {
            "n_vectors": n,
            "n_centroids": cents,
            "sec_brute_query": r["sec_brute_query"],
            "sec_ivf_query": r["sec_ivf_query"],
            "sec_ivf_build": r["sec_ivf_build"],
            "speedup_query": r["speedup_query"],
            "recall_at_k": r["recall_at_k"],
            "scan_fraction": r["scan_fraction"],
        }
        points.append(pt)
        print(json.dumps(pt), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ivf_payoff_curve.json")
    with open(out, "w") as f:
        json.dump({"points": points, "cores": 32}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
