"""Link-prediction evaluation: filtered ranks, MRR, Hits@k.

The consumer of the KG pipeline's edges + ``kg_negative_samples`` output
is a link-prediction trainer; this operator is its standard evaluation
harness (Bordes et al., TransE, NeurIPS 2013 protocol): for every positive
triple, rank its score against the scores of its corrupted candidates,
report MRR and Hits@k.  "Filtered" semantics: other TRUE candidates of the
same instance are removed from the ranking before the rank is read off.

All arithmetic is 64-bit integer (scores enter as integer basis points,
reciprocal ranks as parts-per-million via DIV), so the DuckDB oracle is
bit-identical and the result is layout/retry-independent.

Shape at scale: ONE shuffle, keyed by the ranking instance.  Each group
holds 1 + n_neg candidate rows (tiny, uniform by construction), so the
window state is bounded and no key can skew — the instance key includes
the subject, and negatives are drawn per-edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MRR_SCALE = 1_000_000  # reciprocal ranks in parts-per-million


def link_prediction_ranks(
    candidates: DataFrame,
    instance_cols: list[str],
    candidate_col: str = "candidate",
    score_col: str = "score",
    is_true_col: str = "is_true",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Filtered rank of every true candidate within its instance.

    ``candidates``: one row per (instance, candidate) — REQUIRED unique
    (duplicate candidate rows would make row_number nondeterministic);
    ``score_col`` must be an integer column (basis points etc.) so
    ordering is exact; ties break by ``candidate_col`` ascending; NULL
    scores sort last (a zero-norm embedding can't accidentally win).

    Returns the true rows with ``rank`` = 1 + number of non-true
    candidates strictly ahead (filtered protocol: co-true candidates
    ahead of this one are discounted via the running true count).
    ``keep_cols``: extra columns carried through unchanged (must be
    constant per instance — e.g. a breakdown dimension).
    """
    keep_cols = keep_cols or []
    w = Window.partitionBy(*instance_cols).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(candidate_col).asc()
    )
    truth = F.col(is_true_col).cast("int")
    ranked = candidates.select(
        *instance_cols,
        *keep_cols,
        candidate_col,
        score_col,
        truth.alias("_is_true"),
        F.row_number().over(w).alias("_rn"),
        F.sum(truth).over(w).alias("_cum_true"),
    )
    return ranked.where(F.col("_is_true") == 1).select(
        *instance_cols,
        *keep_cols,
        candidate_col,
        score_col,
        (F.col("_rn") - (F.col("_cum_true") - 1)).alias("rank"),
    )


def link_prediction_eval(
    candidates: DataFrame,
    instance_cols: list[str],
    by: list[str] | None = None,
    ks: tuple[int, ...] = (1, 3, 10),
    candidate_col: str = "candidate",
    score_col: str = "score",
    is_true_col: str = "is_true",
) -> DataFrame:
    """MRR (ppm, integer DIV) + Hits@k over the filtered ranks.

    ``by``: optional breakdown columns (must be functionally determined
    by ``instance_cols`` — e.g. the subject's partition or predicate);
    omitted -> one global row.  Output columns: by..., ``n_instances``,
    ``sum_recip_ppm`` (exact integer sum of MRR_SCALE DIV rank),
    ``mrr_ppm`` (its integer mean), ``hits_<k>`` per requested k.
    """
    ranks = link_prediction_ranks(
        candidates,
        instance_cols,
        candidate_col,
        score_col,
        is_true_col,
        keep_cols=[c for c in (by or []) if c not in instance_cols],
    )
    recip = F.expr(f"{MRR_SCALE} DIV rank")
    aggs = [
        F.count(F.lit(1)).alias("n_instances"),
        F.sum(recip).alias("sum_recip_ppm"),
        *[
            F.sum((F.col("rank") <= k).cast("long")).alias(f"hits_{k}")
            for k in ks
        ],
    ]
    grouped = ranks.groupBy(*(by or [])).agg(*aggs)
    return grouped.withColumn(
        "mrr_ppm", F.expr("sum_recip_ppm DIV n_instances")
    )
