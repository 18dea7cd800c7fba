"""Opt-in CC scale probe: 10^8 edges with a 20M-degree hub (10x the
cc_components_10m bench entry; NOT part of bench.py's default run so the
per-round driver artifact stays comparable).

Evidences the SCALE.md claim at another order of magnitude: hubs contract
in one large-star round regardless of degree (AQE skew-split carries the
hub join), and per-round cost stays 2 shuffles + 1 job.  Prints one JSON
line: {"edges": 1e8, "sec": ..., "rounds": ...}.

Run: python bench_cc_100m.py  [n_edges]  (default 100_000_000)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_cc = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n_hub = n_cc // 5  # hub degree = 20% of edges, same ratio as the 10m entry

    from omop_concept_automapper_spark.operators.connected_components import (
        connected_components,
    )
    from omop_concept_automapper_spark.session import get_spark

    spark = get_spark("cc100m", cores=32)
    hub = spark.range(1, n_hub).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    rest = spark.range(n_hub, n_cc).select(
        F.col("id").alias("src"),
        (F.col("id") - F.col("id") % 50).cast("long").alias("dst"),
    )
    edges = hub.union(rest).localCheckpoint(eager=True)  # input untimed
    stats: dict = {}
    t0 = time.perf_counter()
    n_components = (
        connected_components(edges, stats=stats)
        .select("component")
        .distinct()
        .count()
    )
    sec = round(time.perf_counter() - t0, 3)
    sys.stdout.write(
        json.dumps(
            {
                "edges": n_cc,
                "hub_degree": n_hub - 1,
                "sec": sec,
                "rounds": stats.get("rounds"),
                "n_components": n_components,
            }
        )
        + "\n"
    )


if __name__ == "__main__":
    main()
