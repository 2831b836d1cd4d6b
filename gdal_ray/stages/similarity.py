"""Similarity search over embedding columns.

Brute-force cosine top-k per batch against a broadcast query matrix
(numpy matmul — the baseline), and an IVF-style variant that buckets
vectors by nearest coarse centroid so only matching buckets are scanned
(the scale path: the bucket id doubles as the shuffle/partition key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ._pool import autoscale as _autoscale


def _to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # list<float> → (n, d); Arrow list arrays flatten zero-copy
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms > 0, norms, 1.0)


class CosineTopK:
    """Actor callable: for each query vector (broadcast once), emit the
    top-k most-similar rows seen in this batch; partial top-ks are
    merged by a final small groupby-sort (caller's job or use
    ``cosine_topk``)."""

    def __init__(self, queries_ref, k: int = 10, key_col: str = "vec_id",
                 vec_col: str = "embedding"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.key_col, self.vec_col = key_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_to_matrix(batch[self.vec_col]))
        sims = self.q @ emb.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        nq = sims.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int32), k)
        flat_idx = idx.ravel()
        return pa.table({
            "query_id": pa.array(qid, pa.int32()),
            self.key_col: pa.array(keys[flat_idx]),
            "cosine": pa.array(sims[np.repeat(np.arange(nq), k), flat_idx],
                               pa.float64()),
        })


def cosine_topk(ds, queries: np.ndarray, k: int = 10,
                key_col: str = "vec_id", vec_col: str = "embedding",
                concurrency=None):
    """Global top-k per query: per-batch partial top-k (actor pool) →
    per-query merge.  The shuffle moves only (nq × k × batches) partial
    rows, never the vectors."""
    ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, key_col=key_col,
                                   vec_col=vec_col),
        batch_format="pyarrow", concurrency=_autoscale(concurrency))

    def merge(g: pa.Table) -> pa.Table:
        # arrow in/out (repo invariant: map_groups results stay arrow)
        idx = pc.sort_indices(g, sort_keys=[("cosine", "descending"),
                                            (key_col, "ascending")])
        return g.take(idx[:k])

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pyarrow")


class CosineThresholdJoiner:
    """Actor callable for the EXACT cosine threshold self-join: the full
    normalized matrix + keys are broadcast once (``ray.put``); each batch
    matmuls against it and emits (key_a < key_b, cosine) pairs over the
    threshold.  Every pair is produced by exactly one batch (the one
    holding its smaller key), so no global dedup shuffle is needed.
    Baseline for the LSH near-dup path (which trades recall for not
    broadcasting); at 100 TB use LSH — this is the ground-truth oracle."""

    def __init__(self, all_ref, threshold: float, key_col: str = "vec_id",
                 vec_col: str = "embedding"):
        all_keys, all_mat = ray.get(all_ref) \
            if isinstance(all_ref, ray.ObjectRef) else all_ref
        order = np.argsort(all_keys, kind="stable")
        self.keys = all_keys[order]
        self.mat = _normalize(np.asarray(all_mat, dtype=np.float64))[order]
        self.threshold = threshold
        self.key_col, self.vec_col = key_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_to_matrix(batch[self.vec_col]))
        bkeys = batch[self.key_col].to_numpy(zero_copy_only=False)
        sims = emb @ self.mat.T  # (nb, N)
        hit_b, hit_all = np.nonzero(sims >= self.threshold)
        ka, kb = bkeys[hit_b], self.keys[hit_all]
        m = ka < kb  # one emitter per pair; also drops self-pairs
        return pa.table({
            "key_a": pa.array(ka[m]),
            "key_b": pa.array(kb[m]),
            "cosine": pa.array(sims[hit_b[m], hit_all[m]], pa.float64()),
        })


MAX_SELF_JOIN_ROWS = 2_000_000


def cosine_threshold_self_join(ds, threshold: float = 0.3,
                               key_col: str = "vec_id",
                               vec_col: str = "embedding", concurrency=None,
                               max_rows: int = MAX_SELF_JOIN_ROWS):
    """Exact all-pairs cosine ≥ threshold (key_a < key_b).

    TEST ORACLE, not a production path: it broadcasts the full
    normalized matrix to every worker (O(N·dim) driver + per-actor
    memory).  ``max_rows`` fences it — use `embedding_near_dup_pairs`
    (banded hyperplane LSH) for corpora beyond the fence."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_threshold_self_join is the exact test oracle and "
            f"materializes all {n} rows (> max_rows={max_rows}); use "
            f"embedding_near_dup_pairs for production-scale near-dup")
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    keys = tbl[key_col].to_numpy(zero_copy_only=False)
    mat = _to_matrix(tbl[vec_col])
    ref = ray.put((keys, mat))
    return ds.map_batches(
        CosineThresholdJoiner,
        fn_constructor_kwargs=dict(all_ref=ref, threshold=threshold,
                                   key_col=key_col),
        batch_format="pyarrow", concurrency=_autoscale(concurrency))


class IVFIndexer:
    """IVF bucketing: assign each vector to its nearest coarse centroid
    (centroids broadcast once).  Search then scans only the probe-list
    buckets — at scale the bucket id is the partition key, so a query
    touches a bounded subset of partitions."""

    def __init__(self, centroids_ref, vec_col: str = "embedding",
                 out: str = "ivf_bucket"):
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) \
            else centroids_ref
        self.c = _normalize(np.asarray(c, dtype=np.float64))
        self.vec_col, self.out = vec_col, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_to_matrix(batch[self.vec_col]))
        bucket = np.argmax(emb @ self.c.T, axis=1).astype(np.int32)
        return batch.append_column(self.out, pa.array(bucket, pa.int32()))


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 3) -> np.ndarray:
    """Mini k-means on a driver-side sample (deterministic seed)."""
    rs = np.random.RandomState(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    c = X[rs.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ c.T, axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                c[j] = X[m].mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(ds, queries: np.ndarray, centroids: np.ndarray, k: int = 10,
             nprobe: int = 2, key_col: str = "vec_id",
             vec_col: str = "embedding", concurrency=None):
    """IVF search: bucket the dataset, keep only buckets within the
    queries' nprobe nearest centroids, then exact cosine top-k on the
    surviving subset."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))
    bucketed = ds.map_batches(
        IVFIndexer, fn_constructor_kwargs=dict(centroids_ref=cref,
                                               vec_col=vec_col),
        batch_format="pyarrow", concurrency=_autoscale(concurrency))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    sims = qn @ cn.T
    # stable: exact cosine ties resolve to the LOWER centroid id on
    # both the engine and the SQL oracle (ORDER BY cos DESC, cid ASC)
    probe = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    wanted = sorted(set(probe.ravel().tolist()))
    filtered = bucketed.map_batches(
        lambda b: b.filter(pa.compute.is_in(b["ivf_bucket"],
                                            value_set=pa.array(wanted,
                                                               pa.int32()))),
        batch_format="pyarrow")
    return cosine_topk(filtered, queries, k, key_col, vec_col, concurrency)
