"""Broadcast cosine top-k retrieval + rerank — the linker's heart (J9/O4/U-RRK).

Reference semantics reproduced (SURVEY.md §2.3 J9, §2.6 O4, §2.9 U-RRK):

* query = embedded mention text; collection = embedded standard concepts
  (always filtered to ``type=standard`` — our index only CONTAINS standard
  embeddable concepts, mirroring the always-on filter,
  reference src/backend/auto_mapper.py:49);
* optional ``domain_id`` filter = Qdrant MatchAny over scalar payload
  (reference src/backend/llms/vector_store.py:141-156);
* optional ``atc7_codes`` filter = MatchAny against an ARRAY payload field,
  i.e. any-overlap semantics (SURVEY.md hard part (b));
* k = 30 for the drug path, 15 otherwise (reference auto_mapper.py:69);
* zero hits after filtering -> no output row (reference auto_mapper.py:76-77);
* rerank = deterministic scorer over candidate names, 0-indexed selection,
  first-candidate/confidence-1 fallback (reference reranker.py:42-58).

Spark-first design: the vocabulary index is a numpy matrix broadcast to
executors; scoring is a blocked matrix multiply inside ``mapInPandas``
(Arrow batches, no per-row Python in the hot loop).  Retrieval and rerank
happen in the SAME task — no extra shuffle between stages.  At 100 TB /
full-OMOP scale the matrix (~4M x 1024 float32 ≈ 16 GB) exceeds a single
broadcast: ``block_rows`` already bounds working memory, and the index dict
is shard-able (score per shard, union partial top-k, re-reduce — exact
semantics preserved; tie-break (-score, concept_id) makes shard merges
order-stable, SURVEY.md hard part (f)).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.embedder import embed_texts
from omop_concept_automapper_spark.functions.reranker import (
    confidence_from_score,
    rerank_scores,
)

LINK_RESULT_SCHEMA = (
    "mention_id long, mention_id2 long, mention_text string, "
    "is_drug boolean, atc7 string, "
    "concept_id int, concept_name string, score float, confidence int, "
    "k_used int, n_candidates int, mapping_method string, "
    "candidate_ids array<int>, error string"
)

_LINK_COLUMNS = [
    "mention_id", "mention_id2", "mention_text", "is_drug", "atc7",
    "concept_id", "concept_name", "score", "confidence", "k_used",
    "n_candidates", "mapping_method", "candidate_ids", "error",
]


def build_vocab_index(vocab_pdf: pd.DataFrame) -> dict:
    """Build the broadcastable index from the vocab_embeddings table
    (columns: concept_id, concept_name, domain_id, atc7_codes, vector).

    Rows are sorted by concept_id so every executor sees the identical
    layout (deterministic tie-breaks).
    """
    pdf = vocab_pdf.sort_values("concept_id").reset_index(drop=True)
    if len(pdf) >= (1 << _IDX_BITS):
        # _order_keys packs the column index into _IDX_BITS low bits; beyond
        # that the composite keys overlap and top-k ordering silently
        # corrupts — fail loudly instead (full OMOP is ~4M, headroom 4x).
        raise ValueError(
            f"vocabulary has {len(pdf)} rows, exceeding the 2^{_IDX_BITS} "
            "composite-key index capacity; widen _IDX_BITS before indexing"
        )
    matrix = np.asarray([np.asarray(v, dtype=np.float32) for v in pdf["vector"]])
    # L2-normalize defensively; cosine == dot on unit rows
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matrix = (matrix / norms).astype(np.float32)

    atc7_inverted: dict[str, list[int]] = {}
    for i, codes in enumerate(pdf["atc7_codes"]):
        for code in codes if codes is not None else []:
            atc7_inverted.setdefault(code, []).append(i)

    index = {
        "matrix": matrix,
        "concept_id": pdf["concept_id"].to_numpy(np.int64),
        "concept_name": pdf["concept_name"].to_numpy(object),
        "domain_id": pdf["domain_id"].to_numpy(object),
        "atc7_codes": [list(c) if c is not None else [] for c in pdf["atc7_codes"]],
        "atc7_inverted": {k: np.asarray(v) for k, v in atc7_inverted.items()},
    }
    # optional metadata columns (interactive search filters, lifecycle 3.3)
    for extra in ("vocabulary_id", "concept_class_id", "concept_code"):
        if extra in pdf.columns:
            index[extra] = pdf[extra].to_numpy(object)
    return index


def _topk_masked(
    scores: np.ndarray, concept_ids: np.ndarray, k: int
) -> np.ndarray:
    """Exact top-k indices with deterministic (-score, concept_id) order.

    Boundary ties are resolved by selecting ALL rows scoring >= the kth
    score, sorting by (-score, concept_id), then truncating — so the result
    never depends on argpartition's arbitrary tie placement (SURVEY.md hard
    part (f): order-stable shard merges need a pinned tie rule).
    """
    valid = np.flatnonzero(scores > -np.inf)
    if valid.size == 0:
        return valid
    if valid.size > k:
        kth = np.partition(scores[valid], valid.size - k)[valid.size - k]
        part = valid[scores[valid] >= kth]
    else:
        part = valid
    order = np.lexsort((concept_ids[part], -scores[part]))
    return part[order][:k]


_IDX_BITS = 24  # supports vocabularies up to 2^24 (~16.7M) concepts


def _order_keys(scores: np.ndarray, col_idx: np.ndarray) -> np.ndarray:
    """Composite int64 sort key encoding (score DESC, index ASC) exactly.

    float32 bits are mapped to a monotone signed-int order (IEEE trick),
    shifted left, and the complemented column index packed into the low
    bits — so a plain integer max/argpartition realizes the pinned
    (-score, concept_id) tie rule with NO tie ambiguity (keys are unique).
    This is what makes blocked / sharded top-k merges exact (SURVEY.md hard
    part (f)).
    """
    b = np.ascontiguousarray(scores, dtype=np.float32).view(np.int32).astype(np.int64)
    mono = np.where(b >= 0, b, np.int64(-2147483648) - b)
    return (mono << _IDX_BITS) | ((np.int64(1 << _IDX_BITS) - 1) - col_idx)


def _decode_idx(keys: np.ndarray) -> np.ndarray:
    return (np.int64(1 << _IDX_BITS) - 1) - (keys & np.int64((1 << _IDX_BITS) - 1))


def _blocked_topk(
    q: np.ndarray,
    shards: list[tuple[int, np.ndarray]],
    k: int,
    base_mask: np.ndarray | None,
    block_rows: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact streaming top-k over a sharded vocabulary matrix.

    ``shards`` is a list of (global_row_offset, matrix_slice); scoring
    streams block by block within each shard, keeping a running per-query
    top-k of composite keys.  Peak memory is O(batch × block_rows), never
    O(batch × vocab), and because keys are globally unique the shard merge
    is EXACT — this is what lets a full-OMOP index (16 GB) ship as several
    independent broadcasts (SCALE.md).  Returns
    (keys (n,k) int64 sorted desc, count of valid candidates per row)."""
    n_q = q.shape[0]
    run = np.full((n_q, 0), np.iinfo(np.int64).min, dtype=np.int64)
    neg_inf_key = _order_keys(np.float32(-np.inf).reshape(1, 1), np.zeros(1, np.int64))[0, 0]
    for offset, matrix in shards:
        n_v = matrix.shape[0]
        if offset + n_v > (1 << _IDX_BITS):
            raise ValueError(
                f"shard rows reach {offset + n_v} > 2^{_IDX_BITS} composite-key "
                "capacity; widen _IDX_BITS"
            )
        for start in range(0, n_v, block_rows):
            end = min(start + block_rows, n_v)
            s = q @ matrix[start:end].T
            if base_mask is not None:
                s[:, ~base_mask[offset + start : offset + end]] = -np.inf
            keys = _order_keys(
                s, np.arange(offset + start, offset + end, dtype=np.int64)
            )
            kk = min(k, end - start)
            if end - start > kk:
                part = np.argpartition(keys, -kk, axis=1)[:, -kk:]
                keys = np.take_along_axis(keys, part, axis=1)
            cat = np.concatenate([run, keys], axis=1)
            if cat.shape[1] > k:
                sel = np.argpartition(cat, -k, axis=1)[:, -k:]
                cat = np.take_along_axis(cat, sel, axis=1)
            run = cat
    run = -np.sort(-run, axis=1)  # final order: score desc, concept_id asc
    valid_counts = (run > (neg_inf_key | np.int64((1 << _IDX_BITS) - 1))).sum(axis=1)
    return run, valid_counts


def _shards_of(index: dict) -> list[tuple[int, np.ndarray]]:
    return index.get("shards") or [(0, index["matrix"])]


def _gather_rows(shards: list[tuple[int, np.ndarray]], idxs: np.ndarray) -> np.ndarray:
    """Gather matrix rows by GLOBAL index across shards."""
    out = np.empty((idxs.size, shards[0][1].shape[1]), dtype=shards[0][1].dtype)
    for offset, matrix in shards:
        sel = (idxs >= offset) & (idxs < offset + matrix.shape[0])
        if sel.any():
            out[sel] = matrix[idxs[sel] - offset]
    return out


def link_batch(
    pdf: pd.DataFrame,
    index: dict,
    k_standard: int = 15,
    k_drug: int = 30,
    target_domains: list[str] | None = None,
    block_rows: int = 65536,
    embed_fn=None,
    rerank_fn=None,
    retry_policy=None,
) -> pd.DataFrame:
    """Retrieve + rerank one Arrow batch of mentions.

    Expects columns: mention_id, mention_text, is_drug, atc7 ('' if none).

    ``embed_fn``/``rerank_fn`` are the model-endpoint seam (X7, reference
    emb_model.py:47-61): inject real API-backed callables with a
    ``RetryPolicy`` (functions/endpoint.py) and transient failures retry
    in-UDF; failures that survive every retry land the affected rows in
    quarantine (the existing per-row path below), never failing the job.
    Defaults are the deterministic stand-ins, called with no retry.
    """
    from omop_concept_automapper_spark.functions.endpoint import (
        call_with_retry,
    )

    shards = _shards_of(index)
    concept_ids = index["concept_id"]
    names = index["concept_name"]
    out_rows: list[tuple] = []
    if len(pdf) == 0:
        return pd.DataFrame(columns=_LINK_COLUMNS)

    # second 128-bit id half is a pure pass-through; pandas-level callers
    # that don't carry it (unit tests, ad-hoc batches) default to 0
    mid2 = (
        pdf["mention_id2"]
        if "mention_id2" in pdf.columns
        else pd.Series([0] * len(pdf), index=pdf.index)
    )
    texts = pdf["mention_text"].tolist()
    embed = embed_fn if embed_fn is not None else embed_texts
    embed_errors: dict[int, str] = {}
    try:
        q = call_with_retry(embed, retry_policy, texts)
    except Exception:
        # batch-level embed failed even after retries: degrade to per-row
        # embedding so only the rows that truly can't embed are quarantined.
        # Hard-outage short-circuit (r3 advice): the batch call already
        # exhausted the retry budget, so after N CONSECUTIVE per-row
        # failures the endpoint is treated as down and the remaining rows
        # are quarantined immediately with the last error — without this,
        # one 65k-row Arrow batch could stall a task for days (rows x
        # attempts x sleep) instead of quarantining quickly.  A single
        # per-row success resets the streak (row-specific poison inputs
        # keep degrading gracefully).
        dim = shards[0][1].shape[1]
        q = np.zeros((len(texts), dim), dtype=np.float32)
        consecutive, max_consecutive = 0, 5
        last_err = None
        for i, t in enumerate(texts):
            if consecutive >= max_consecutive:
                embed_errors[i] = (
                    f"embed endpoint down (short-circuit after "
                    f"{max_consecutive} consecutive failures): {last_err}"
                )
                continue
            try:
                q[i] = call_with_retry(embed, retry_policy, [t])[0]
                consecutive = 0
            except Exception as exc:  # noqa: BLE001
                last_err = f"{type(exc).__name__}: {exc}"
                embed_errors[i] = last_err
                consecutive += 1
    base_mask = None
    if target_domains:
        base_mask = np.isin(index["domain_id"], np.asarray(target_domains, object))

    k_max = max(k_standard, k_drug)
    top_keys, _ = _blocked_topk(q, shards, k_max, base_mask, block_rows)
    neg_inf_key = _order_keys(
        np.float32(-np.inf).reshape(1, 1), np.zeros(1, np.int64)
    )[0, 0]

    for row_i, (mention_id, mention_id2, text, is_drug, atc7) in enumerate(
        zip(pdf["mention_id"], mid2, pdf["mention_text"], pdf["is_drug"], pdf["atc7"])
    ):
        is_drug = bool(is_drug)
        k = k_drug if is_drug else k_standard
        method = "auto_drug" if is_drug else "auto_standard"
        if row_i in embed_errors:
            out_rows.append(
                (
                    int(mention_id), int(mention_id2), str(text), is_drug,
                    str(atc7 or ""),
                    None, None, None, 0, int(k), 0, method, None,
                    embed_errors[row_i],
                )
            )
            continue
        try:
            if is_drug and atc7:
                # MatchAny over the atc7_codes ARRAY payload = any-overlap:
                # restrict candidates to concepts carrying this code —
                # scored directly via the inverted index (tiny subset)
                allowed = index["atc7_inverted"].get(atc7)
                if allowed is not None and base_mask is not None:
                    allowed = allowed[base_mask[allowed]]
                if allowed is None or allowed.size == 0:
                    continue  # zero hits -> no mapping (auto_mapper.py:76-77)
                sub_scores = _gather_rows(shards, allowed) @ q[row_i]
                sub_top = _topk_masked(sub_scores, concept_ids[allowed], k)
                top = allowed[sub_top]
                row_scores_of = {
                    int(a): float(s)
                    for a, s in zip(allowed[sub_top], sub_scores[sub_top])
                }
            else:
                keys = top_keys[row_i]
                keys = keys[keys > neg_inf_key][:k]
                if keys.size == 0:
                    continue  # zero hits -> no mapping (auto_mapper.py:76-77)
                top = _decode_idx(keys)
                row_scores_of = {
                    int(t): float(s)
                    for t, s in zip(
                        top,
                        (_gather_rows(shards, top) @ q[row_i]).astype(np.float32),
                    )
                }
            cand_names = [str(names[j]) for j in top]
            # default resolves the module global at call time (test seam);
            # an injected rerank_fn goes through the retry policy
            if rerank_fn is not None:
                rr = call_with_retry(rerank_fn, retry_policy, str(text), cand_names)
            else:
                rr = rerank_scores(str(text), cand_names)
            sel = max(range(len(rr)), key=lambda i: (rr[i], -i))
            confidence = confidence_from_score(rr[sel])
            chosen = top[sel]
            out_rows.append(
                (
                    int(mention_id), int(mention_id2), str(text), is_drug,
                    str(atc7 or ""),
                    int(concept_ids[chosen]), str(names[chosen]),
                    row_scores_of[int(chosen)], int(confidence), int(k),
                    int(top.size), method,
                    [int(concept_ids[j]) for j in top], None,
                )
            )
        except Exception as exc:  # per-row quarantine (auto_mapper.py:207-211)
            out_rows.append(
                (
                    int(mention_id), int(mention_id2), str(text), is_drug,
                    str(atc7 or ""),
                    None, None, None, 0, int(k), 0, method, None,
                    f"{type(exc).__name__}: {exc}",
                )
            )
    return pd.DataFrame(out_rows, columns=_LINK_COLUMNS)


# ---------------------------------------------------------------------------
# File-backed vocab index: the full-OMOP scale path.
#
# The in-memory path (link_mentions(vocab_pdf=...)) requires the DRIVER to
# hold the whole embedding matrix in pandas before broadcasting — at full
# OMOP (~4M x 1024 fp32 ≈ 16 GB) that kills the driver before any shard
# helps.  Here the index is written as block-aligned parquet shards by
# Spark executors (distributed write, partitionBy(shard)); link tasks load
# their shards lazily from storage inside the UDF with a per-process cache.
# Driver peak memory is O(n_ids) — the sorted concept_id list used to place
# block-aligned shard boundaries — never O(n x d).
#
# Exactness: shard boundaries are block_rows multiples of the same global
# concept_id order the in-memory path uses, so every gemm call is
# shape-identical and results are bitwise equal to the single-broadcast
# plan (tests/test_operators.py::test_file_index_exact_equality).
# ---------------------------------------------------------------------------

_META_COLUMNS = ["concept_id", "concept_name", "domain_id", "atc7_codes"]
_FILE_INDEX_CACHE: dict[str, dict] = {}


def vocab_content_key(vocab: DataFrame) -> str:
    """Order-independent content fingerprint of a vocab index input: row
    count + bit-XOR of per-row xxhash64 over every indexed column (XOR makes
    the aggregate partition-layout independent).  One small dimension-table
    job; used to decide whether an index rebuild would be content-identical.
    """
    cols = [c for c in vocab.columns]
    row = vocab.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr(f"bit_xor(xxhash64({', '.join(cols)}))"), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return f"{int(row['n'])}:{int(row['h'])}"


def build_vocab_index_files(
    vocab: DataFrame,
    path: str,
    n_shards: int = 4,
    block_rows: int = 65536,
    content_key: str | None = None,
) -> dict:
    """Write the vocab index as parquet files; returns the manifest.

    Layout: ``meta/`` (metadata columns), ``vectors/shard=i/`` (concept_id +
    vector, one block-aligned slice of the concept_id-sorted matrix per
    shard), ``manifest.json`` (row offsets per shard).  Vectors never pass
    through the driver — executors write their own shard partitions.

    The manifest carries a CONTENT key (``content_key`` argument, or a
    computed :func:`vocab_content_key` when omitted) rather than a per-build
    uuid (r3 verdict defect: a fresh uuid per rebuild invalidated every
    executor's shard cache even for content-identical rebuilds, so e.g.
    every benchmark repeat re-read the whole index from storage).  A rebuild
    whose content key matches the existing manifest is a NO-OP returning the
    recorded manifest: identical bytes on disk, executor caches stay warm.
    """
    if content_key is None:
        content_key = vocab_content_key(vocab)
    manifest_path = os.path.join(path, "manifest.json")
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = None
        if existing is not None and existing.get("content_key") == content_key:
            return existing
    try:
        ids_tbl = vocab.select("concept_id").orderBy("concept_id").toArrow()
        ids = ids_tbl.column("concept_id").to_numpy()
    except AttributeError:  # Spark < 4.0 fallback
        ids = (
            vocab.select("concept_id").orderBy("concept_id").toPandas()
        )["concept_id"].to_numpy()
    n = int(ids.size)
    if n >= (1 << _IDX_BITS):
        raise ValueError(
            f"vocabulary has {n} rows, exceeding the 2^{_IDX_BITS} "
            "composite-key index capacity; widen _IDX_BITS before indexing"
        )
    n_blocks = -(-n // block_rows) if n else 1
    eff_shards = max(1, min(n_shards, n_blocks))
    rows_per_shard = (-(-n_blocks // eff_shards)) * block_rows
    offsets = list(range(0, max(n, 1), rows_per_shard))
    # boundary concept ids for the CASE-chain shard assignment (no sampling
    # nondeterminism, unlike repartitionByRange)
    boundary_ids = [int(ids[o]) for o in offsets[1:] if o < n]

    shard_expr = F.lit(0)
    for b in boundary_ids:
        shard_expr = shard_expr + F.when(F.col("concept_id") >= b, 1).otherwise(0)
    (
        vocab.select("concept_id", "vector", shard_expr.alias("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, "vectors"))
    )
    meta_cols = [c for c in vocab.columns if c != "vector"]
    vocab.select(*meta_cols).write.mode("overwrite").parquet(
        os.path.join(path, "meta")
    )
    manifest = {
        "n": n,
        "dim": None,  # filled lazily by the loader
        "block_rows": block_rows,
        "offsets": [o for o in offsets if o < n] or [0],
        "n_shards": eff_shards,
        # content identity, NOT a per-build uuid: identical input -> byte-
        # identical manifest -> the loader's content-hash cache key is a HIT
        # across rebuilds; any data change flips the key and invalidates
        "content_key": content_key,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def _read_parquet_dir(path: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return pq.ParquetDataset(files).read().to_pandas()


def load_vocab_index_files(path: str) -> dict:
    """Executor-side loader with a per-process cache: reconstructs the exact
    index dict (metadata arrays + block-aligned matrix shards) from the
    files written by ``build_vocab_index_files``."""
    manifest_path = os.path.join(path, "manifest.json")
    # key on the manifest CONTENT (carries the data's content_key), not
    # mtime: object stores don't guarantee useful mtimes, and a same-content
    # rewrite/rebuild must NOT invalidate the cache while a rebuild over
    # changed data (new content_key) must
    with open(manifest_path, "rb") as f:
        manifest_bytes = f.read()
    cache_key = f"{path}@{hashlib.blake2b(manifest_bytes, digest_size=16).hexdigest()}"
    cached = _FILE_INDEX_CACHE.get(cache_key)
    if cached is not None:
        return cached
    manifest = json.loads(manifest_bytes)
    meta = _read_parquet_dir(os.path.join(path, "meta"))
    meta = meta.sort_values("concept_id").reset_index(drop=True)

    atc7_inverted: dict[str, list[int]] = {}
    for i, codes in enumerate(meta["atc7_codes"]):
        for code in codes if codes is not None else []:
            atc7_inverted.setdefault(code, []).append(i)

    shards: list[tuple[int, np.ndarray]] = []
    for shard_i, offset in enumerate(manifest["offsets"]):
        pdf = _read_parquet_dir(
            os.path.join(path, "vectors", f"shard={shard_i}")
        ).sort_values("concept_id")
        matrix = np.asarray(
            [np.asarray(v, dtype=np.float32) for v in pdf["vector"]]
        )
        norms = np.linalg.norm(matrix, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        shards.append((int(offset), (matrix / norms).astype(np.float32)))

    index = {
        "shards": shards,
        "concept_id": meta["concept_id"].to_numpy(np.int64),
        "concept_name": meta["concept_name"].to_numpy(object),
        "domain_id": meta["domain_id"].to_numpy(object),
        "atc7_codes": [
            list(c) if c is not None else [] for c in meta["atc7_codes"]
        ],
        "atc7_inverted": {k: np.asarray(v) for k, v in atc7_inverted.items()},
    }
    for extra in ("vocabulary_id", "concept_class_id", "concept_code"):
        if extra in meta.columns:
            index[extra] = meta[extra].to_numpy(object)
    _FILE_INDEX_CACHE.clear()  # one live index per process is enough
    _FILE_INDEX_CACHE[cache_key] = index
    return index


def _select_link_input(mentions: DataFrame) -> DataFrame:
    """Project the linker's input columns; callers without the second
    128-bit id half (ad-hoc batches) get a 0 placeholder."""
    if "mention_id2" not in mentions.columns:
        mentions = mentions.withColumn("mention_id2", F.lit(0).cast("long"))
    return mentions.select(
        "mention_id", "mention_id2", "mention_text", "is_drug", "atc7"
    )


def link_mentions_file_index(
    spark: SparkSession,
    mentions: DataFrame,
    index_path: str,
    k_standard: int = 15,
    k_drug: int = 30,
    target_domains: list[str] | None = None,
    block_rows: int = 65536,
    embed_fn=None,
    rerank_fn=None,
    retry_policy=None,
) -> DataFrame:
    """Distributed retrieve+rerank against a file-backed vocab index.

    No broadcast, no driver-resident matrix: each executor process loads
    the shard files once (cache above) from shared storage — the shape a
    16 GB full-OMOP index needs on a 1000-executor cluster.
    ``embed_fn``/``rerank_fn``/``retry_policy`` = the model-endpoint seam
    (see ``link_batch``); callables must be picklable.
    """
    domains = list(target_domains) if target_domains else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = load_vocab_index_files(index_path)
        for pdf in batches:
            yield link_batch(
                pdf, idx, k_standard=k_standard, k_drug=k_drug,
                target_domains=domains, block_rows=block_rows,
                embed_fn=embed_fn, rerank_fn=rerank_fn,
                retry_policy=retry_policy,
            )

    return _select_link_input(mentions).mapInPandas(run, schema=LINK_RESULT_SCHEMA)


def link_mentions(
    spark: SparkSession,
    mentions: DataFrame,
    vocab_pdf: pd.DataFrame,
    k_standard: int = 15,
    k_drug: int = 30,
    target_domains: list[str] | None = None,
    n_shards: int = 1,
    block_rows: int = 65536,
    embed_fn=None,
    rerank_fn=None,
    retry_policy=None,
) -> DataFrame:
    """Distributed retrieve+rerank: one ``mapInPandas`` pass over mentions.

    ``n_shards > 1`` ships the embedding matrix as that many independent
    broadcasts (the full-OMOP path where one 16 GB broadcast is
    impractical); shard boundaries are aligned to ``block_rows`` multiples
    so every configuration issues bitwise-identical gemm calls — BLAS
    results can differ at the last ulp across matrix shapes, which would
    otherwise flip near-tied tail candidates.  Results are therefore
    EXACTLY equal to the single-broadcast plan
    (tests/test_operators.py::test_sharded_index_exact_equality).
    """
    index = build_vocab_index(vocab_pdf)
    domains = list(target_domains) if target_domains else None
    sc = spark.sparkContext

    if n_shards <= 1:
        meta_bc, shard_bcs = sc.broadcast(index), []
    else:
        matrix = index.pop("matrix")
        n = matrix.shape[0]
        # shard bounds MUST be block_rows multiples (exactness invariant);
        # a vocab smaller than n_shards * block_rows gets fewer shards —
        # sharding exists for vocabularies with many blocks.
        n_blocks = -(-n // block_rows)
        eff_shards = min(n_shards, n_blocks)
        blocks_per_shard = -(-n_blocks // eff_shards)
        bounds = list(range(0, n, blocks_per_shard * block_rows)) + [n]
        shard_bcs = [
            sc.broadcast((int(a), np.ascontiguousarray(matrix[a:b])))
            for a, b in zip(bounds[:-1], bounds[1:])
            if b > a
        ]
        meta_bc = sc.broadcast(index)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = meta_bc.value
        if shard_bcs:
            idx = dict(idx)
            idx["shards"] = [b.value for b in shard_bcs]
        for pdf in batches:
            yield link_batch(
                pdf, idx, k_standard=k_standard, k_drug=k_drug,
                target_domains=domains, block_rows=block_rows,
                embed_fn=embed_fn, rerank_fn=rerank_fn,
                retry_policy=retry_policy,
            )

    return _select_link_input(mentions).mapInPandas(run, schema=LINK_RESULT_SCHEMA)
