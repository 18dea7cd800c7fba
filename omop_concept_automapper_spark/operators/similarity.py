"""Similarity search over an embedding column (array<float>).

* ``ann_topk`` — brute-force cosine top-k for one query vector, pure column
  expressions + TakeOrderedAndProject (no UDF).
* ``knn_join`` — batch k-NN join: broadcast query matrix, blocked numpy
  matmul inside mapInPandas (same kernel family as operators/knn.py) —
  the scale path: each data partition streams past the broadcast queries,
  no shuffle at all; results reduce with a per-query top-k.
* ``lsh_bucketed_topk`` — sign-of-hyperplane (first ``n_planes`` dims)
  coarse bucketing, then top-k WITHIN bucket: the IVF-style scale variant
  where the full cross product is replaced by a bucket-equijoin.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from omop_concept_automapper_spark.operators.dedup import cosine_col


def ann_topk(
    embeddings: DataFrame, query_vector: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k against a literal query vector; ties -> vec_id asc."""
    qcol = F.array(*[F.lit(float(x)) for x in query_vector]).cast("array<double>")
    scored = embeddings.select(
        "vec_id",
        F.round(cosine_col(F.col("embedding"), qcol) * 10000)
        .cast("long")
        .alias("cosine_bp"),
    )
    return scored.orderBy(F.desc("cosine_bp"), F.asc("vec_id")).limit(k)


def knn_join(
    spark: SparkSession,
    queries: pd.DataFrame,
    embeddings: DataFrame,
    k: int = 5,
) -> DataFrame:
    """k nearest neighbors (cosine) of each query vector among ``embeddings``.

    ``queries``: pandas (query_id int, vector list[float]).  The query
    matrix is broadcast; each partition of the (huge) embeddings table is
    scored locally and emits its partial per-query top-k; a final
    groupBy(query_id) top-k merge reduces partials — the standard
    distributed exact-kNN plan.
    """
    qids = queries["query_id"].to_numpy(np.int64)
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in queries["vector"]])
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0
    qmat = qmat / qnorm
    bc = spark.sparkContext.broadcast((qids, qmat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            enorm = np.linalg.norm(emat, axis=1, keepdims=True)
            enorm[enorm == 0] = 1.0
            emat = emat / enorm
            scores = qmat_ @ emat.T  # (n_q, n_e)
            vec_ids = pdf["vec_id"].to_numpy(np.int64)
            out = []
            for qi in range(scores.shape[0]):
                row = scores[qi]
                kk = min(k, row.size)
                # partial top-k within this partition's batch, with the
                # pinned (-score, vec_id asc) tie rule: boundary ties at the
                # kth score must not depend on argpartition's arbitrary
                # placement, or the global merge becomes partitioning-
                # dependent and can disagree with the oracle's vec_id-asc
                # tie-break.
                if row.size > kk:
                    kth = np.partition(row, row.size - kk)[row.size - kk]
                    cand = np.flatnonzero(row >= kth)
                else:
                    cand = np.arange(row.size)
                order = np.lexsort((vec_ids[cand], -row[cand]))
                for j in cand[order[:kk]]:
                    out.append((int(qids_[qi]), int(vec_ids[j]), float(row[j])))
            yield pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])

    partials = embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "rank",
            F.round(F.col("cosine") * 10000).cast("long").alias("cosine_bp"),
        )
    )


def ivf_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate kNN: k-means coarse quantizer, search only the
    ``n_probe`` nearest inverted lists per query.

    The scale path for ANN over billions of vectors: the quantizer is
    trained once (sampled), every vector is assigned a list id (map-only),
    and a query touches n_probe/n_centroids of the data via a cluster-id
    equijoin instead of a full scan.  With n_probe == n_centroids this
    degrades to EXACT brute force (tested), so recall loss is an explicit,
    tunable knob.  Deterministic: fixed seed, tie-break (cosine desc,
    vec_id asc).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        "vec_id", "embedding", array_to_vector("embedding").alias("features")
    )
    model = KMeans(k=n_centroids, seed=42, featuresCol="features").fit(feats)
    assigned = model.transform(feats).select(
        "vec_id", "embedding", F.col("prediction").alias("cluster")
    )

    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    cnorm = np.linalg.norm(centroids, axis=1, keepdims=True)
    cnorm[cnorm == 0] = 1.0
    centroids = centroids / cnorm

    q_rows = (
        embeddings.where(F.col("vec_id").isin([int(i) for i in query_ids]))
        .select("vec_id", "embedding")
        .collect()
    )
    probe_pairs = []
    for r in q_rows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(qv)
        qv = qv / n if n > 0 else qv
        sims = centroids @ qv
        order = np.lexsort((np.arange(len(sims)), -sims))[:n_probe]
        for c in order:
            probe_pairs.append((int(r["vec_id"]), int(c)))
    probes = spark.createDataFrame(probe_pairs, "query_id long, cluster int")
    queries = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in q_rows],
        "query_id long, q_embedding array<double>",
    )

    cand = (
        probes.join(assigned, "cluster")
        .join(F.broadcast(queries), "query_id")
        .where(F.col("vec_id") != F.col("query_id"))
    )
    cos = cosine_col(F.col("q_embedding"), F.col("embedding"))
    scored = cand.select(
        "query_id", "vec_id",
        F.round(cos * 10000).cast("long").alias("cosine_bp"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_bp"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine_bp")
    )


def rademacher_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic ±1 random hyperplanes (signed-projection LSH).

    Rademacher entries make the projection an ADD/SUB chain of the raw
    coordinates — bitwise-reproducible in any engine that evaluates the
    same left-to-right double sum, which is what lets a DuckDB oracle
    hash-check the bucketing exactly.
    """
    rng = np.random.default_rng(seed)
    return rng.choice(np.array([-1.0, 1.0]), size=(n_planes, dim))


def planes_for_corpus(n_rows: int, target_bucket: int = 64) -> int:
    """Bucket-count scaling rule: 2^n_planes buckets keep the EXPECTED
    bucket size near ``target_bucket`` as the corpus grows — the fix for
    fixed-cardinality blocking, whose block size grows O(n) and turns the
    within-block self-join quadratic at 100x (SCALE.md)."""
    import math

    if n_rows <= target_bucket:
        return 4
    return max(4, math.ceil(math.log2(n_rows / target_bucket)))


def hyperplane_bucket(col, planes: np.ndarray):
    """LSH bucket id: concatenated signs of ``planes @ v``, as a pure column
    expression (left-to-right double adds, no UDF)."""
    parts = []
    for plane in planes:
        dot = None
        for i, w in enumerate(plane):
            term = F.element_at(col, i + 1).cast("double")
            if w < 0:
                term = -term
            dot = term if dot is None else dot + term
        parts.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)


def sign_bucket(col, n_planes: int = 4):
    """Deprecated coarse bucket (signs of the FIRST n dims): kept only for
    comparison; fixed 2^n buckets degrade to O(n^2/2^n) at scale.  Use
    ``hyperplane_bucket`` + ``planes_for_corpus``."""
    parts = [
        F.when(F.element_at(col, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_planes)
    ]
    return F.concat(*parts)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates restricted to the same
    random-hyperplane bucket (bucket-equijoin instead of cross join).
    ``n_planes`` defaults to the corpus-scaled rule so bucket sizes stay
    bounded as the table grows."""
    if n_planes is None:
        n_planes = planes_for_corpus(embeddings.count())
    planes = rademacher_planes(dim, n_planes, seed)
    base = embeddings.select(
        "vec_id",
        "embedding",
        hyperplane_bucket(F.col("embedding"), planes).alias("bkt"),
    )
    l, r = base.alias("l"), base.alias("r")
    cos = cosine_col(F.col("l.embedding"), F.col("r.embedding"))
    scored = l.join(
        r, (F.col("l.bkt") == F.col("r.bkt")) & (F.col("l.vec_id") != F.col("r.vec_id"))
    ).select(
        F.col("l.vec_id").alias("query_id"),
        F.col("r.vec_id").alias("vec_id"),
        F.round(cos * 10000).cast("long").alias("cosine_bp"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_bp"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine_bp")
    )
