"""Product quantization: distributed encode/search vs the sequential
twins (layout-equality under repartitioning), reconstruction sanity, and
the compression claim (codes are m small ints per vector)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.fixtures.gatefiles import (
    ivf_embedding_rows,
)
from omop_concept_automapper_spark.operators.pq import (
    ivfpq_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    sequential_ivfpq_topk,
    sequential_pq_encode,
    sequential_pq_topk,
    _encode,
)


@pytest.fixture(scope="module")
def fixture_df(spark):
    vec_ids, vectors = ivf_embedding_rows()
    rows = [(int(v), [float(x) for x in vec]) for v, vec in zip(vec_ids, vectors)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_match_sequential_twin_under_repartition(spark, fixture_df):
    vec_ids, vectors = ivf_embedding_rows()
    want = dict(sequential_pq_encode(vec_ids, vectors, m=8, ks=16))
    for df in (fixture_df, fixture_df.repartition(13, "vec_id")):
        got = {
            r["vec_id"]: "|".join(str(c) for c in r["codes"])
            for r in pq_encode(spark, df, m=8, ks=16).collect()
        }
        assert got == want


def test_topk_matches_sequential_twin_under_repartition(spark, fixture_df):
    vec_ids, vectors = ivf_embedding_rows()
    want = sequential_pq_topk(vec_ids, vectors, [0, 3, 7], k=5, m=8, ks=16)
    for df in (fixture_df, fixture_df.repartition(7)):
        got = sorted(
            (r["query_id"], r["vec_id"], r["rank"], int(r["adc_dist"]))
            for r in pq_adc_topk(spark, df, [0, 3, 7], k=5, m=8, ks=16).collect()
        )
        assert got == sorted(want)


def test_ivfpq_matches_sequential_twin_under_repartition(spark, fixture_df):
    vec_ids, vectors = ivf_embedding_rows()
    want = sequential_ivfpq_topk(
        vec_ids, vectors, [0, 5, 11], k=5, n_centroids=16, n_probe=4
    )
    for df in (fixture_df, fixture_df.repartition(9)):
        got = sorted(
            (r["query_id"], r["vec_id"], r["rank"], int(r["adc_dist"]))
            for r in ivfpq_topk(
                spark, df, [0, 5, 11], k=5, n_centroids=16, n_probe=4
            ).collect()
        )
        assert got == sorted(want)


def test_ivfpq_full_k_and_self_recall(spark):
    # every query gets exactly k ranked hits from its probed lists, and
    # the query itself survives quantization into its own top-k.  (A
    # stronger "residual beats flat PQ" claim is deliberately NOT
    # asserted: on this fixture the flat space's 16 well-separated
    # centers quantize better than the near-uniform residuals — which
    # way the tradeoff goes is data-dependent.)
    vec_ids, vectors = ivf_embedding_rows()
    rows = sequential_ivfpq_topk(vec_ids, vectors, list(range(8)), k=5)
    by_q: dict[int, list[tuple[int, int]]] = {}
    for q, v, r, d in rows:
        by_q.setdefault(q, []).append((r, v))
    assert set(by_q) == set(range(8))
    for q, hits in by_q.items():
        assert sorted(r for r, _ in hits) == [1, 2, 3, 4, 5]
        assert q in {v for _, v in hits}


def test_ivfpq_built_index_search_matches_fused_path(spark, fixture_df, tmp_path):
    # the materialized code table + ivfpq_search equals the fused
    # ivfpq_topk (same sample rules -> same coarse/codebooks -> same ADC),
    # modulo ivf_search-style self-exclusion
    import pandas as pd

    from omop_concept_automapper_spark.operators.pq import (
        ivfpq_build_index,
        ivfpq_search,
        ivfpq_search_rerank,
    )

    path = str(tmp_path / "pq_index")
    coarse, cbs = ivfpq_build_index(
        spark, fixture_df, path, n_centroids=16, m=8, ks=16,
        fit_sample_rows=500,
    )
    qids = [0, 9]
    qpdf = fixture_df.where(F.col("vec_id").isin(qids)).orderBy("vec_id").toPandas()
    queries = pd.DataFrame(
        {"query_id": qpdf["vec_id"], "vector": list(qpdf["embedding"])}
    )
    index = spark.read.parquet(path)
    got = sorted(
        (r["query_id"], r["vec_id"], int(r["adc_dist"]))
        for r in ivfpq_search(
            spark, index, coarse, cbs, queries, k=5, n_probe=4
        ).collect()
    )
    fused = ivfpq_topk(
        spark, fixture_df, qids, k=6, n_centroids=16, n_probe=4
    ).collect()
    # fused asked k=6 including self; drop self, keep each query's best 5
    # by the (adc_dist, vec_id) tie rule
    per_q: dict[int, list] = {}
    for r in fused:
        if r["vec_id"] != r["query_id"]:
            per_q.setdefault(r["query_id"], []).append(
                (int(r["adc_dist"]), r["vec_id"])
            )
    want5 = sorted(
        (q, v, d)
        for q, rows in per_q.items()
        for d, v in sorted(rows)[:5]
    )
    assert got == want5

    # the rerank stage returns exact L2 over the shortlist, self excluded
    rer = ivfpq_search_rerank(
        spark, index, coarse, cbs,
        fixture_df.select("vec_id", "embedding"), queries,
        k=3, shortlist=20, n_probe=4,
    ).collect()
    assert {r["query_id"] for r in rer} == set(qids)
    for r in rer:
        assert r["vec_id"] != r["query_id"]
        assert r["rank"] in (1, 2, 3)


def test_self_is_nearest_and_adc_reconstructs(spark):
    # ADC distance of a vector to itself equals its quantization error:
    # small relative to distances to other clusters, so rank-1 is self
    vec_ids, vectors = ivf_embedding_rows()
    rows = sequential_pq_topk(vec_ids, vectors, [0, 5], k=3, m=8, ks=16)
    by_q = {}
    for q, v, r, d in rows:
        by_q.setdefault(q, []).append((r, v, d))
    for q, hits in by_q.items():
        hits.sort()
        assert hits[0][1] == q  # rank 1 = the query itself
        assert hits[0][2] < hits[-1][2]


def test_adc_exact_on_integer_data():
    # integer data + integer-snapped codebooks: the ADC sum is an exact
    # float64 integer, the precondition for the VALUES oracle
    vec_ids, vectors = ivf_embedding_rows(n=300)
    cb = pq_fit(vectors[:100].astype(np.float64), m=8, ks=8)
    assert np.array_equal(cb, np.round(cb))
    codes = _encode(vectors.astype(np.float64), cb)
    assert codes.shape == (300, 8)
    assert codes.dtype == np.int32
    assert codes.min() >= 0 and codes.max() < 8


def test_dim_must_divide_into_subspaces():
    _, vectors = ivf_embedding_rows(n=50, dim=30)
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(vectors.astype(np.float64), m=8, ks=4)


def test_encode_is_map_only(spark, fixture_df):
    plan = (
        pq_encode(spark, fixture_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
