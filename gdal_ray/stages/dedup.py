"""Deduplication stages: exact, MinHash-LSH, SimHash, embedding near-dup.

Exact dedup is the per-url invariant stage (FIXTURES.md: 1% duplicate
urls with byte-identical text must collapse to exactly one row).  The
reference has no dedup primitive (FID uniqueness is assumed per layer,
SURVEY.md §2.7) — these are the training-data-pipeline operators the
engine adds as first-class components.

Scale notes: exact dedup is hash-partition groupby + per-group first —
before the shuffle we (a) drop wide payload columns not needed
downstream and (b) pre-dedup within each batch, so the all-to-all moves
at most one row per (key, batch).  MinHash-LSH follows the standard
shingle → signature → band → bucket-groupby plan; the only all-to-all
is on (band, band_hash) pairs, rows are (key, band, hash) triples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as _text
from ._pool import autoscale as _autoscale


def _first_per_key_batch(batch: pa.Table, keys: list[str],
                         order_col: str | None):
    """Within-batch pre-dedup (combiner) — keeps the winning row per key
    under the same rule as the final stage."""
    if order_col:
        idx = pc.sort_indices(
            batch, sort_keys=[(order_col, "ascending")]
            + [(k, "ascending") for k in keys])
        batch = batch.take(idx)
    df_keys = batch.select(keys).to_pandas()
    keep = ~df_keys.duplicated(keep="first").values
    return batch.filter(pa.array(keep))


_BUCKET_COL = "__dedup_bucket"


def _hash_bucket(batch: pa.Table, keys: list[str], buckets: int) -> np.ndarray:
    """Deterministic vectorized key(s) → bucket (pandas cython siphash
    with a fixed hash_key — stable across processes and runs)."""
    df = batch.select(keys).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False,
                                   hash_key="gdal_ray_dedup_0")
    return (h.values % np.uint64(buckets)).astype(np.int32)


def dedup_exact(ds, key="url", order_col: str | None = "warc_ts",
                drop_cols=None, buckets: int = 256,
                pre_combine: bool = False):
    """Exactly one row per key (str or list of str); winner = smallest
    order_col.

    Plan (all stages vectorized — no per-key Python):
      1. optional within-batch combiner (``pre_combine``): one surviving
         row per (key, batch).  Enable ONLY when a single batch is
         likely to hold many rows of the same key — e.g. raw crawl
         shards with url-clustered dups.  When dup keys are rare or
         cross-batch (a spatial-join output cannot repeat (url, poly)
         within a batch at all), the combiner is pure overhead: a full
         sort + row-hash per batch that removes ~nothing;
      2. hash-bucket shuffle: groupby(hash(key) % buckets) co-locates
         every row of a key in one group call — each call then dedups
         THOUSANDS of keys at once with pandas ``drop_duplicates``
         (contrast per-key map_groups, whose per-group Python overhead
         dominates at ≥10^5 keys).  ``buckets`` bounds group size:
         scale it with the cluster (e.g. 4× total cores).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if drop_cols:
        ds = ds.drop_columns(drop_cols)

    def combine(b: pa.Table) -> pa.Table:
        if pre_combine:
            b = _first_per_key_batch(b, keys, order_col)
        return b.append_column(
            _BUCKET_COL, pa.array(_hash_bucket(b, keys, buckets)))

    ds = ds.map_batches(combine, batch_format="pyarrow")

    def bucket_dedup(g: pa.Table) -> pa.Table:
        # arrow in/out: payload columns never roundtrip through pandas
        # (keeps block type arrow and timestamp units intact)
        sk = [(k, "ascending") for k in keys]
        if order_col:
            sk += [(order_col, "ascending")]
        g = g.take(pc.sort_indices(g, sort_keys=sk))
        kdf = g.select(keys).to_pandas()
        keep = ~kdf.duplicated(keep="first").values
        return g.filter(pa.array(keep)).drop_columns([_BUCKET_COL])

    return ds.groupby(_BUCKET_COL).map_groups(bucket_dedup,
                                              batch_format="pyarrow")


# --- MinHash + LSH near-dedup ---------------------------------------------


class MinHasher:
    """Actor callable: text → MinHash signature columns (one row per
    (doc, band)).  Permutation params fixed per pool (seeded)."""

    def __init__(self, key_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 seed: int = 1):
        assert num_perm % bands == 0
        self.a, self.b = _text.minhash_params(num_perm, seed)
        self.key_col, self.text_col = key_col, text_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def signatures(self, batch: pa.Table) -> np.ndarray:
        texts = batch[self.text_col].to_pylist()
        sig = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sh = _text.shingle_hashes(t or "", self.k)
            sig[i] = _text.minhash_signature(sh, self.a, self.b)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit (key, band_id, band_hash) rows — the LSH bucketing key."""
        sig = self.signatures(batch)
        n = len(batch)
        bh = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            band = sig[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for c in range(band.shape[1]):
                    acc = acc * np.uint64(1000003) + band[:, c]
            bh[:, b] = acc
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            self.key_col: pa.array(np.repeat(keys, self.bands)),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                        n)),
            "band_hash": pa.array(bh.ravel(), pa.uint64()),
        })


def minhash_candidate_pairs(ds, key_col: str = "doc_id",
                            text_col: str = "text", num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 3,
                            concurrency=None):
    """documents → candidate near-dup pairs (key_a < key_b) via LSH:
    shingle→minhash→band rows → groupby(band_id, band_hash) → pairs.
    Verification (exact Jaccard) is the caller's second stage."""
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(key_col=key_col, text_col=text_col,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=_autoscale(concurrency))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ks = np.sort(g[key_col].values)
        ia, ib = np.triu_indices(len(ks), k=1)
        return pd.DataFrame({"key_a": ks[ia], "key_b": ks[ib]})

    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # distinct pairs (a pair can collide in several bands)
    return pairs.groupby(["key_a", "key_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def jaccard_verify_pairs(ds, pairs_ds, key_col: str = "doc_id",
                         text_col: str = "text", shingle_k: int = 3,
                         threshold: float = 0.5):
    """Stage 2 of MinHash-LSH near-dedup: exact n-gram (k-shingle)
    Jaccard over the candidate pairs.  The texts of both sides are
    joined to the (small) pair list via a broadcast map — candidate
    pairs after LSH are O(dups), orders of magnitude below the corpus,
    so the pair table is the broadcast side, never the documents."""
    import ray as _ray

    pair_tbl = pa.concat_tables(
        [b for b in pairs_ds.iter_batches(batch_size=65536,
                                          batch_format="pyarrow")],
        promote_options="permissive")
    wanted = set(pair_tbl["key_a"].to_pylist()) \
        | set(pair_tbl["key_b"].to_pylist())
    wanted_arr = pa.array(sorted(wanted))
    docs = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[key_col], value_set=wanted_arr)),
        batch_format="pyarrow")
    texts = {}
    for b in docs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        texts.update(zip(b[key_col].to_pylist(), b[text_col].to_pylist()))
    ka = pair_tbl["key_a"].to_pylist()
    kb = pair_tbl["key_b"].to_pylist()
    sims = [_text.ngram_jaccard(texts.get(a, ""), texts.get(b, ""),
                                shingle_k) for a, b in zip(ka, kb)]
    out = pa.table({
        "key_a": pair_tbl["key_a"],
        "key_b": pair_tbl["key_b"],
        "jaccard": pa.array(np.round(sims, 6), pa.float64()),
    })
    return out.filter(pc.greater_equal(out["jaccard"], threshold))


class SimHasher:
    """Actor callable: append a 64-bit SimHash column."""

    def __init__(self, text_col: str = "text", out: str = "simhash",
                 shingle_k: int = 2):
        self.text_col, self.out, self.k = text_col, out, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = np.empty(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch[self.text_col].to_pylist()):
            hs[i] = _text.simhash64(_text.shingle_hashes(t or "", self.k))
        return batch.append_column(self.out, pa.array(hs, pa.uint64()))


def embedding_near_dup_pairs(ds, key_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95, buckets: int = 8,
                             seed: int = 5):
    """Embedding-cosine near-dup via random-hyperplane LSH bucketing +
    in-bucket exact cosine.  One shuffle on the bucket key; exact check
    vectorized per bucket."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        emb = np.stack([np.asarray(v, dtype=np.float64)
                        for v in batch[vec_col].to_pylist()])
        dim = emb.shape[1]
        rs = np.random.RandomState(seed)
        planes = rs.normal(size=(dim, buckets))  # deterministic per call
        bits = (emb @ planes) > 0
        bucket = (bits.astype(np.uint64)
                  << np.arange(buckets, dtype=np.uint64)).sum(axis=1)
        norm = np.linalg.norm(emb, axis=1)
        return pa.table({
            key_col: batch[key_col],
            "bucket": pa.array(bucket, pa.uint64()),
            "vec": pa.array((emb / np.where(norm > 0, norm, 1.0)[:, None])
                            .tolist()),
        })

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_dups(g: pd.DataFrame) -> pd.DataFrame:
        ks = g[key_col].values
        if len(g) < 2:
            return pd.DataFrame({
                "key_a": np.array([], dtype=ks.dtype),
                "key_b": np.array([], dtype=ks.dtype),
                "cosine": np.array([], dtype=np.float64)})
        order = np.argsort(ks, kind="stable")
        ks = ks[order]
        V = np.stack(g["vec"].values)[order]
        sims = V @ V.T
        ia, ib = np.triu_indices(len(ks), k=1)
        m = sims[ia, ib] >= threshold
        return pd.DataFrame({"key_a": ks[ia[m]], "key_b": ks[ib[m]],
                             "cosine": sims[ia[m], ib[m]]})

    return bucketed.groupby("bucket").map_groups(
        bucket_dups, batch_format="pandas")
