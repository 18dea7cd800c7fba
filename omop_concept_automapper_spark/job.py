"""spark-submit entry point for the KG-construction pipeline.

Usage (north_rule deployment shape):

    zip -r ocas.zip omop_concept_automapper_spark
    spark-submit --py-files ocas.zip \\
        omop_concept_automapper_spark/job.py \\
        --transcripts /path/to/transcripts_parquet \\
        --warehouse /path/to/warehouse \\
        [--vocab-dir /path/to/omop_csvs] [--threshold 8] \\
        [--domains Condition,Measurement] [--synth-convs 200]

Without --vocab-dir the deterministic fixture vocabulary/lexicon is used
(offline mode); without --transcripts, --synth-convs synthesizes fixture
transcripts.  Reruns resume from the warehouse stage manifests.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="KG-construction pipeline")
    p.add_argument("--transcripts", help="parquet path of transcripts table")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--synth-convs", type=int, default=200)
    p.add_argument("--threshold", type=int, default=8)
    p.add_argument("--k-standard", type=int, default=15)
    p.add_argument("--k-drug", type=int, default=30)
    p.add_argument("--domains", default="")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from omop_concept_automapper_spark.catalog import Warehouse
    from omop_concept_automapper_spark.fixtures.transcripts import (
        transcripts_dataframe_distributed,
    )
    from omop_concept_automapper_spark.fixtures.vocabulary import (
        build_lexicon,
        vocab_dataframes,
    )
    from omop_concept_automapper_spark.plans.runner import Pipeline, PipelineConfig
    from omop_concept_automapper_spark.session import get_spark

    spark = get_spark("kg-job", cores=args.cores)
    transcripts = (
        spark.read.parquet(args.transcripts)
        if args.transcripts
        else transcripts_dataframe_distributed(spark, args.synth_convs)
    )
    concept, rel, anc = vocab_dataframes(spark)
    cfg = PipelineConfig(
        confidence_threshold=args.threshold,
        k_standard=args.k_standard,
        k_drug=args.k_drug,
        target_domains=[d for d in args.domains.split(",") if d] or None,
    )
    wh = Warehouse(spark, args.warehouse)
    out = Pipeline(spark, wh, cfg).run(transcripts, concept, rel, anc, build_lexicon())
    summary = {
        "edges": out["edges"].count(),
        "nodes": out["nodes"].count(),
        "mentions": out["mentions"].count(),
        "quarantined": wh.stage_metrics("links")["metrics"].get("quarantined", 0),
        "stages": {
            s: wh.stage_metrics(s)
            for s in ["vocab_embeddings", "mentions", "links", "graph"]
        },
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
