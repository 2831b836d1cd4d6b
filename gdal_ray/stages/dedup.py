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

import ray.data as rd

from ..functions import text as _text
from ._pool import autoscale as _autoscale


def _list_col_to_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """Arrow list<float> / fixed_size_list column → (n, dim) float64
    matrix without a Python-list round-trip."""
    arr = col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(
        flat.reshape(len(arr), -1).astype(np.float64, copy=False))


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

# per-worker-process cache for task-pool stages (workers are reused
# across tasks, so "build once per process" ≡ actor-pool economics
# without pool sizing or actor spin-up)
_WORKER_CACHE: dict = {}


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
        if order_col:
            sk = [(k, "ascending") for k in keys] \
                + [(order_col, "ascending")]
            g = g.take(pc.sort_indices(g, sort_keys=sk))
        # with no order column ANY representative wins — skip the
        # multi-key sort entirely (hash-based duplicated() needs no
        # ordering; the sort was ~1/3 of the headline dedup CPU)
        kdf = g.select(keys).to_pandas()
        keep = ~kdf.duplicated(keep="first").values
        return g.filter(pa.array(keep)).drop_columns([_BUCKET_COL])

    return ds.groupby(_BUCKET_COL).map_groups(bucket_dedup,
                                              batch_format="pyarrow")


# --- MinHash + LSH near-dedup ---------------------------------------------


class MinHasher:
    """Actor callable: text → MinHash signature columns (one row per
    (doc, band)).  Permutation params fixed per pool (seeded).

    Shingles are md5-token-based (functions/text.py:
    md5_shingle_hashes) and every arithmetic step — (a·h+b) mod 2^64
    mod (2^61−1), then the per-band base-1000003 fold mod 2^64 —
    restates exactly in DuckDB HUGEINT, which is what lets
    docs_minhash_pairs / docs_near_dup_verified / docs_near_dedup
    carry value-checked SQL oracles (r5)."""

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
            sh = _text.md5_shingle_hashes(t or "", self.k)
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


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci-hash mix constant


def dedup_pairs(pairs_ds, buckets: int = 256):
    """Distinct (key_a, key_b) rows: ONE hash-bucket exchange +
    vectorized ``drop_duplicates`` per bucket — the `dedup_exact` plan,
    never a per-pair Python call.  Extra columns (e.g. cosine) keep the
    first-seen value (identical across bands by construction)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            _BUCKET_COL,
            pa.array(_hash_bucket(b, ["key_a", "key_b"], buckets)))

    def bucket_dedup(g: pa.Table) -> pa.Table:
        kdf = g.select(["key_a", "key_b"]).to_pandas()
        keep = ~kdf.duplicated(keep="first").values
        return g.filter(pa.array(keep)).drop_columns([_BUCKET_COL])

    return pairs_ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby(_BUCKET_COL).map_groups(bucket_dedup,
                                         batch_format="pyarrow")


def _emit_segment_pairs(seg: np.ndarray, order_payload: list,
                        max_bucket: int):
    """Intra-segment candidate pairs over rows sorted by segment id.

    ``seg`` is the sorted segment array; ``order_payload`` is a list of
    (already-sorted) per-row arrays to pair up (keys, and optionally
    vectors).  Returns (ia, ib) global row indices of each pair.

    Segments with ≤ max_bucket rows emit all C(n,2) pairs; larger
    (hot LSH buckets — mass-duplicated boilerplate is the common case
    at scale) emit the STAR around the segment's minimum key —
    (k[0], k[i]) for i ≥ 1 on sorted rows — O(b) edges whose
    transitive closure spans the same connected component AND whose
    every member is directly verified against one representative
    (a sorted-adjacency chain would let a verify stage drop a middle
    link and silently lose direct pairs; star keeps one hop max).
    Pair COMPLETENESS is still capped in hot buckets: consumers of the
    raw pair list see O(b) of the O(b²) true pairs."""
    starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    ends = np.r_[starts[1:], len(seg)]
    sizes = ends - starts
    ia_all, ib_all = [], []
    for si in np.flatnonzero(sizes >= 2):
        s, n = starts[si], sizes[si]
        if n <= max_bucket:
            ia, ib = np.triu_indices(n, k=1)
            ia_all.append(s + ia)
            ib_all.append(s + ib)
        else:
            idx = np.arange(s, s + n)
            ia_all.append(np.full(n - 1, s, dtype=np.int64))
            ib_all.append(idx[1:])
    if not ia_all:
        e = np.array([], dtype=np.int64)
        return e, e
    return np.concatenate(ia_all), np.concatenate(ib_all)


def minhash_candidate_pairs(ds, key_col: str = "doc_id",
                            text_col: str = "text", num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 3,
                            max_bucket: int = 64,
                            n_buckets: int | None = None,
                            concurrency=None):
    """documents → distinct candidate near-dup pairs (key_a < key_b).

    Plan (two exchanges, everything vectorized):
      1. MinHasher emits (key, band_id, band_hash) rows; a coarse
         bucket key mix(band_hash, band_id) % B co-locates each LSH
         bucket without one Python call per (band, hash) group;
      2. per coarse bucket: sort rows by segment id, emit pairs per
         segment (all-pairs ≤ max_bucket, adjacency chain above — a hot
         bucket of b near-identical docs emits O(b) not O(b²) rows);
      3. `dedup_pairs` hash-bucket exchange removes multi-band repeats.
    """
    from ._pool import cluster_cpus
    B = n_buckets or max(16, cluster_cpus() * 4)

    # TASK pool with a per-worker-process MinHasher cache: the state is
    # just the permutation params — an actor pool's spin-up (~1.5 s)
    # would dominate at bench scale and buys nothing at any scale
    mh_key = (key_col, text_col, num_perm, bands, shingle_k)

    def minhash_batch(b: pa.Table) -> pa.Table:
        mh = _WORKER_CACHE.get(("minhash", mh_key))
        if mh is None:
            mh = MinHasher(key_col=key_col, text_col=text_col,
                           num_perm=num_perm, bands=bands,
                           shingle_k=shingle_k)
            _WORKER_CACHE[("minhash", mh_key)] = mh
        return mh(b)

    band_rows = ds.map_batches(minhash_batch, batch_format="pyarrow")

    def add_seg(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            seg = b["band_hash"].to_numpy(zero_copy_only=False) * _GOLDEN \
                + b["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            key_col: b[key_col],
            "seg": pa.array(seg, pa.uint64()),
            _BUCKET_COL: pa.array((seg % np.uint64(B)).astype(np.int32)),
        })

    segged = band_rows.map_batches(add_seg, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        seg = g["seg"].to_numpy(zero_copy_only=False)
        key = g[key_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, seg))
        seg, key = seg[order], key[order]
        ia, ib = _emit_segment_pairs(seg, [key], max_bucket)
        kt = g[key_col].type
        return pa.table({"key_a": pa.array(key[ia], type=kt),
                         "key_b": pa.array(key[ib], type=kt)})

    pairs = segged.groupby(_BUCKET_COL).map_groups(bucket_pairs,
                                                   batch_format="pyarrow")
    return dedup_pairs(pairs)


class _ShingleSets:
    """Actor callable: text → sorted-unique k-shingle hash set column
    (list<uint64>) — the exact-Jaccard operand."""

    def __init__(self, key_col: str, text_col: str, k: int):
        self.key_col, self.text_col, self.k = key_col, text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sets = [np.unique(_text.shingle_hashes(t or "", self.k))
                for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.key_col: batch[self.key_col],
            "shingles": pa.array([s.tolist() for s in sets],
                                 pa.list_(pa.uint64())),
        })


def jaccard_verify_pairs(ds, pairs_ds, key_col: str = "doc_id",
                         text_col: str = "text", shingle_k: int = 3,
                         threshold: float = 0.5,
                         n_buckets: int | None = None, concurrency=None,
                         broadcast_max_pairs: int = 100_000):
    """Stage 2 of MinHash-LSH near-dedup: exact k-shingle Jaccard over
    the candidate pairs — fully DISTRIBUTED (returns a Dataset; no
    driver dicts, no driver Jaccard loop).

    Plan: the pair-KEY set (small side, O(dups) keys) is broadcast via
    ``ray.put`` to semi-join-filter the corpus; surviving docs compute
    their sorted-unique shingle sets once; two hash-bucket exchanges
    then do the work:
      1. key-bucket co-group: attach each doc's shingles to every pair
         leg that references it;
      2. pair-bucket co-group: the two legs of a pair meet, Jaccard =
         |∩| / |∪| via ``np.intersect1d`` on the sorted sets.
    """
    import ray as _ray

    from ._pool import cluster_cpus
    B = n_buckets or max(16, cluster_cpus() * 2)

    # --- small side: distinct keys referenced by any pair ------------------
    # pairs after LSH are O(dups) — materialize once so the LSH pipeline
    # is not re-executed by the key scan AND the legs map below
    pairs_ds = pairs_ds.materialize()
    key_batches = [b for b in pairs_ds.iter_batches(
        batch_size=65536, batch_format="pyarrow") if len(b)]
    if not key_batches:
        kt = pairs_ds.schema().base_schema.field("key_a").type
        return rd.from_arrow(pa.table({
            "key_a": pa.array([], kt), "key_b": pa.array([], kt),
            "jaccard": pa.array([], pa.float64())}))
    pair_keys = pa.concat_tables(
        [pa.table({"k": b["key_a"]}) for b in key_batches]
        + [pa.table({"k": b["key_b"]}) for b in key_batches])
    wanted_ref = _ray.put(pc.unique(pair_keys["k"]))
    n_pairs = sum(len(b) for b in key_batches)

    sh0 = _ShingleSets(key_col, text_col, shingle_k)

    # --- size dispatch (the join_auto pattern): pairs after LSH are
    # O(dups); under the threshold the referenced docs' shingle sets
    # broadcast once and pairs verify in ONE map — no exchange at all.
    # The two bucketed exchanges below are the scale path (tests force
    # it with broadcast_max_pairs=0).
    if broadcast_max_pairs and n_pairs <= broadcast_max_pairs:
        def doc_shingles(b: pa.Table) -> pa.Table:
            wanted = _ray.get(wanted_ref)
            b = b.filter(pc.is_in(b[key_col], value_set=wanted))
            return sh0(b).select([key_col, "shingles"])

        sets: dict = {}
        for b in ds.map_batches(doc_shingles, batch_format="pyarrow") \
                .iter_batches(batch_size=65536, batch_format="pyarrow"):
            for k, s in zip(b[key_col].to_pylist(),
                            b["shingles"].to_pylist()):
                sets[k] = np.asarray(s, dtype=np.uint64)
        sets_ref = _ray.put(sets)

        def verify(b: pa.Table) -> pa.Table:
            ss = _ray.get(sets_ref)
            ka = b["key_a"].to_pylist()
            kb = b["key_b"].to_pylist()
            keep_i, inter, union = [], [], []
            for i, (a, c) in enumerate(zip(ka, kb)):
                sa, sc = ss.get(a), ss.get(c)
                if sa is None or sc is None:
                    continue
                hit = int(np.intersect1d(sa, sc,
                                         assume_unique=True).size)
                keep_i.append(i)
                inter.append(hit)
                union.append(len(sa) + len(sc) - hit)
            ia = np.asarray(inter, np.int64)
            ua = np.asarray(union, np.int64)
            jac = np.where(ua > 0, ia / np.maximum(ua, 1), 1.0)
            sel = pa.array(np.asarray(keep_i, np.int64))
            out = pa.table({
                "key_a": b["key_a"].take(sel).combine_chunks(),
                "key_b": b["key_b"].take(sel).combine_chunks(),
                "jaccard": pa.array(jac, pa.float64()),
            })
            return out.filter(pc.greater_equal(out["jaccard"],
                                               threshold))

        return pairs_ds.map_batches(verify, batch_format="pyarrow")

    def pair_legs(b: pa.Table) -> pa.Table:
        ka = b["key_a"].combine_chunks()
        kb = b["key_b"].combine_chunks()
        key = pa.concat_arrays([ka, kb])
        t = pa.table({"key": key})
        return pa.table({
            _BUCKET_COL: pa.array(_hash_bucket(t, ["key"], B)),
            "key": key, "src": pa.array(np.zeros(len(key), np.int8)),
            "key_a": pa.concat_arrays([ka, ka]),
            "key_b": pa.concat_arrays([kb, kb]),
            "shingles": pa.array([None] * len(key), pa.list_(pa.uint64())),
        })

    sh = _ShingleSets(key_col, text_col, shingle_k)

    def doc_side(b: pa.Table) -> pa.Table:
        # task pool: the wanted-key set is plasma-local after the first
        # ray.get on each worker — no actor pool spin-up
        wanted = _ray.get(wanted_ref)
        b = b.filter(pc.is_in(b[key_col], value_set=wanted))
        t = sh(b)
        key = t[key_col].combine_chunks()
        kt = pa.table({"key": key})
        n = len(t)
        return pa.table({
            _BUCKET_COL: pa.array(_hash_bucket(kt, ["key"], B)),
            "key": key, "src": pa.array(np.ones(n, np.int8)),
            "key_a": pa.nulls(n, key.type),
            "key_b": pa.nulls(n, key.type),
            "shingles": t["shingles"],
        })

    both = pairs_ds.map_batches(pair_legs, batch_format="pyarrow").union(
        ds.map_batches(doc_side, batch_format="pyarrow"))

    def attach(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy(zero_copy_only=False)
        keys = g["key"].to_pylist()
        sh_col = g["shingles"].to_pylist()
        doc_sh = {keys[i]: sh_col[i] for i in np.flatnonzero(src == 1)}
        legs = pa.array(np.flatnonzero(src == 0))
        return pa.table({
            "key_a": g["key_a"].take(legs),
            "key_b": g["key_b"].take(legs),
            "key": g["key"].take(legs),
            "shingles": pa.array(
                [doc_sh.get(keys[i]) for i in legs.to_pylist()],
                pa.list_(pa.uint64())),
        })

    attached = both.groupby(_BUCKET_COL).map_groups(
        attach, batch_format="pyarrow")

    def pair_bucket(b: pa.Table) -> pa.Table:
        t = pa.table({"key_a": b["key_a"].combine_chunks(),
                      "key_b": b["key_b"].combine_chunks()})
        return b.append_column(
            "__pb", pa.array(_hash_bucket(t, ["key_a", "key_b"], B)))

    def join_legs(g: pa.Table) -> pa.Table:
        """Fully vectorized: pair ids via pandas groupby codes; exact
        Jaccard = duplicate count over the concatenated sorted-unique
        shingle multiset (each leg's set is unique, so a (pair, value)
        seen twice IS an intersection hit) — no per-pair Python."""
        kt = g["key_a"].type
        npairs_df = g.select(["key_a", "key_b"]).to_pandas()
        pid = npairs_df.groupby(["key_a", "key_b"], sort=False) \
            .ngroup().values
        npairs = int(pid.max()) + 1 if len(pid) else 0
        if not npairs:
            return pa.table({"key_a": pa.array([], kt),
                             "key_b": pa.array([], kt),
                             "jaccard": pa.array([], pa.float64())})
        is_a = pc.equal(g["key"], g["key_a"]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        sh = g["shingles"].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(sh), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        la = np.full(npairs, -1, np.int64)
        lb = np.full(npairs, -1, np.int64)
        has = lens >= 0
        la[pid[is_a & has]] = lens[is_a & has]
        lb[pid[~is_a & has]] = lens[~is_a & has]
        valid = (la >= 0) & (lb >= 0)
        # flatten all shingle values; row → pair id; keep only rows of
        # valid pairs (both legs present)
        flat = sh.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        row_of = np.repeat(np.arange(len(g)), np.maximum(lens, 0))
        vpid = pid[row_of]
        m = valid[vpid]
        vpid, flat = vpid[m], flat[m]
        order = np.lexsort((flat, vpid))
        vpid, flat = vpid[order], flat[order]
        dup = np.r_[False, (vpid[1:] == vpid[:-1]) & (flat[1:] == flat[:-1])]
        inter = np.bincount(vpid[dup], minlength=npairs)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        first = np.unique(pid, return_index=True)[1]
        keep = valid[pid[first]]
        first = first[keep]
        sel = pa.array(first)
        return pa.table({
            "key_a": g["key_a"].take(sel).combine_chunks(),
            "key_b": g["key_b"].take(sel).combine_chunks(),
            # RAW double, not round(·, 6): i/u is the identical IEEE
            # division on both engines (the oracle emits the same),
            # and rounding first would admit j in [0.4999995, 0.5)
            # that the integer threshold rule 2i >= u rejects
            "jaccard": pa.array(jac[pid[first]], pa.float64()),
        })

    verified = attached.map_batches(pair_bucket, batch_format="pyarrow") \
        .groupby("__pb").map_groups(join_legs, batch_format="pyarrow")
    return verified.map_batches(
        lambda b: b.filter(pc.greater_equal(b["jaccard"], threshold)),
        batch_format="pyarrow")


class SimHasher:
    """Actor callable: append a 64-bit SimHash column.  Token hashes
    are md5-derived (functions/text.py:md5_shingle_hashes) so the full
    bit construction restates literally in DuckDB — the docs_simhash
    oracle checks every output bit."""

    def __init__(self, text_col: str = "text", out: str = "simhash",
                 shingle_k: int = 2):
        self.text_col, self.out, self.k = text_col, out, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = np.empty(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch[self.text_col].to_pylist()):
            hs[i] = _text.simhash64(
                _text.md5_shingle_hashes(t or "", self.k))
        return batch.append_column(self.out, pa.array(hs, pa.uint64()))


def embedding_near_dup_pairs(ds, key_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95,
                             n_bands: int = 8, bits_per_band: int = 12,
                             max_bucket: int = 256,
                             n_buckets: int | None = None, seed: int = 5):
    """Embedding-cosine near-dup via BANDED random-hyperplane LSH
    (SimHash bands, the MinHash-band analog): each vector emits one
    bucket key per band = the packed sign-bit pattern of that band's
    hyperplanes, so bucket cardinality scales with N (2^bits_per_band
    per band) instead of the round-1 fixed 256 buckets; multiple bands
    recover the recall a single longer code would lose.

    Per band-bucket the check is EXACT cosine (all-pairs ≤ max_bucket
    rows, sorted-adjacency chain above — O(b) on hot buckets of
    mass-duplicated vectors); `dedup_pairs` removes multi-band repeats.
    Vectors travel as Arrow list columns end-to-end (no Python lists)."""
    from ._pool import cluster_cpus
    B = n_buckets or max(16, cluster_cpus() * 4)

    def band_rows(batch: pa.Table) -> pa.Table:
        emb = _list_col_to_matrix(batch[vec_col])
        n, dim = emb.shape
        rs = np.random.RandomState(seed)  # same planes in every task
        planes = rs.normal(size=(dim, n_bands * bits_per_band))
        bits = (emb @ planes) > 0
        weights = (np.uint64(1) << np.arange(bits_per_band,
                                             dtype=np.uint64))
        norm = np.linalg.norm(emb, axis=1)
        unit = emb / np.where(norm > 0, norm, 1.0)[:, None]
        segs = np.empty((n, n_bands), dtype=np.uint64)
        for bi in range(n_bands):
            code = bits[:, bi * bits_per_band:(bi + 1) * bits_per_band] \
                .astype(np.uint64) @ weights
            with np.errstate(over="ignore"):
                segs[:, bi] = code * _GOLDEN + np.uint64(bi)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        seg_flat = segs.ravel()
        return pa.table({
            key_col: pa.array(np.repeat(keys, n_bands)),
            "seg": pa.array(seg_flat, pa.uint64()),
            _BUCKET_COL: pa.array((seg_flat % np.uint64(B))
                                  .astype(np.int32)),
            # float32 through the exchange: cosine at threshold
            # granularity doesn't need f64, and the band replication
            # makes vector bytes the dominant shuffle traffic
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(np.repeat(unit.astype(np.float32), n_bands,
                                   axis=0).ravel()), dim),
        })

    segged = ds.map_batches(band_rows, batch_format="pyarrow")

    def bucket_dups(g: pa.Table) -> pa.Table:
        seg = g["seg"].to_numpy(zero_copy_only=False)
        key = g[key_col].to_numpy(zero_copy_only=False)
        V = _list_col_to_matrix(g["vec"])
        order = np.lexsort((key, seg))
        seg, key, V = seg[order], key[order], V[order]
        ia, ib = _emit_segment_pairs(seg, [key], max_bucket)
        kt = g[key_col].type
        if len(ia) == 0:
            return pa.table({"key_a": pa.array([], kt),
                             "key_b": pa.array([], kt),
                             "cosine": pa.array([], pa.float64())})
        cos = np.einsum("ij,ij->i", V[ia], V[ib])
        m = cos >= threshold
        return pa.table({
            "key_a": pa.array(key[ia[m]], type=kt),
            "key_b": pa.array(key[ib[m]], type=kt),
            "cosine": pa.array(np.round(cos[m], 9), pa.float64()),
        })

    pairs = segged.groupby(_BUCKET_COL).map_groups(bucket_dups,
                                                   batch_format="pyarrow")
    return dedup_pairs(pairs)


def _cc_round(rows, buckets: int):
    """One hash-to-min round over the membership Dataset (v, u) ≡
    "u ∈ C(v)".  Per v: m = min C(v); emit (m, u) for every u (send
    C(v) to the minimum) and (u, m) for every u (point every member
    at the minimum) — Rastogi et al. 2013, "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds" (public
    algorithm).  Dedup = the `dedup_pairs`-style bucket exchange."""

    def add_bucket_v(b: pa.Table) -> pa.Table:
        return b.append_column(
            _BUCKET_COL, pa.array(_hash_bucket(b, ["v"], buckets)))

    def emit(g: pa.Table) -> pa.Table:
        vdf = g.select(["v", "u"]).to_pandas()
        order = np.lexsort((vdf["u"].values, vdf["v"].values))
        v = vdf["v"].values[order]
        u = vdf["u"].values[order]
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        sizes = np.diff(np.r_[starts, len(v)])
        # rows are sorted by (v, u): u[starts] is min C(v) per segment
        m = np.repeat(u[starts], sizes)
        ut = g["u"].type
        return pa.table({
            "v": pa.array(np.concatenate([m, u]), type=ut),
            "u": pa.array(np.concatenate([u, m]), type=ut),
        })

    def add_bucket_vu(b: pa.Table) -> pa.Table:
        return b.append_column(
            _BUCKET_COL, pa.array(_hash_bucket(b, ["v", "u"], buckets)))

    def distinct(g: pa.Table) -> pa.Table:
        kdf = g.select(["v", "u"]).to_pandas()
        keep = ~kdf.duplicated(keep="first").values
        return g.filter(pa.array(keep)).drop_columns([_BUCKET_COL])

    emitted = rows.map_batches(add_bucket_v, batch_format="pyarrow") \
        .groupby(_BUCKET_COL).map_groups(emit, batch_format="pyarrow")
    return emitted.map_batches(add_bucket_vu, batch_format="pyarrow") \
        .groupby(_BUCKET_COL).map_groups(distinct, batch_format="pyarrow")


def _ds_signature(rows) -> tuple:
    """(row_count, order-independent checksum) of a (v, u) Dataset —
    the convergence test for hash-to-min (the membership sets shrink
    monotonically toward the fixed point, so signature equality over
    one round means convergence; the 64-bit sum makes a count-equal
    false positive ~2^-64)."""

    def sig(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.select(["v", "u"]).to_pandas(), index=False,
            hash_key="gdal_ray_ccsig_0").values
        return pa.table({
            "n": pa.array([len(b)], pa.int64()),
            "s": pa.array([int(np.bitwise_xor.reduce(h)) if len(h)
                           else 0], pa.uint64()),
        })

    parts = rows.map_batches(sig, batch_format="pyarrow").to_pandas()
    return (int(parts["n"].sum()),
            int(np.bitwise_xor.reduce(parts["s"].values.astype(np.uint64)))
            if len(parts) else 0)


def jaccard_similarity_join(ds, key_col: str = "doc_id",
                            text_col: str = "text", k: int = 3,
                            threshold: float = 0.5,
                            n_buckets: int | None = None,
                            max_rows: int = 100_000):
    """EXACT n-gram Jaccard similarity self-join: every document pair
    whose k-token-gram Jaccard ≥ threshold, via a distributed inverted
    index (gram → posting list → per-gram pair emission → one bucketed
    pair-count exchange).  Grams are LITERAL lowercased token k-grams
    (``\\S+`` tokens joined by single spaces), so the result is
    SQL-checkable end to end — the ground-truth oracle for the
    MinHash-LSH + hashed-shingle approximate path
    (minhash_candidate_pairs → jaccard_verify_pairs).

    All-pairs emission is quadratic in a gram's posting-list length, so
    this is FENCED at ``max_rows`` documents (the emb_threshold_join
    pattern): beyond it use the LSH path, which trades exactness for
    never materializing hot posting lists."""
    import re as _re

    from ._pool import cluster_cpus

    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"jaccard_similarity_join is the exact (quadratic-per-gram) "
            f"path, fenced at {max_rows} rows (got {n}); use "
            f"minhash_candidate_pairs + jaccard_verify_pairs at scale")
    B = n_buckets or max(16, cluster_cpus() * 2)
    tok_re = _re.compile(r"\S+")
    ds = ds.materialize()

    def gram_rows(b: pa.Table) -> pa.Table:
        out_k, out_g = [], []
        sizes_k, sizes_n = [], []
        for key, txt in zip(b[key_col].to_pylist(),
                            b[text_col].to_pylist()):
            toks = tok_re.findall((txt or "").lower())
            gs = sorted({" ".join(toks[i:i + k])
                         for i in range(len(toks) - k + 1)})
            out_k.extend([key] * len(gs))
            out_g.extend(gs)
            sizes_k.append(key)
            sizes_n.append(len(gs))
        t = pa.table({"gram": pa.array(out_g, pa.string())})
        return pa.table({
            "key": pa.array(out_k, pa.int64()),
            "gram": t["gram"],
            _BUCKET_COL: pa.array(_hash_bucket(t, ["gram"], B)),
        })

    def size_rows(b: pa.Table) -> pa.Table:
        ks, ns = [], []
        for key, txt in zip(b[key_col].to_pylist(),
                            b[text_col].to_pylist()):
            toks = tok_re.findall((txt or "").lower())
            ks.append(key)
            ns.append(len({" ".join(toks[i:i + k])
                           for i in range(len(toks) - k + 1)}))
        return pa.table({"key": pa.array(ks, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")
    sizes_t = pa.concat_tables(
        [t for t in
         __import__("ray").get(list(
             ds.map_batches(size_rows, batch_format="pyarrow")
             .to_arrow_refs())) if t.num_rows])
    sk = sizes_t["key"].to_numpy(zero_copy_only=False)
    sn = sizes_t["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(sk, kind="stable")
    import ray as _ray
    sizes_ref = _ray.put((sk[order], sn[order]))

    def emit_pairs(g: pa.Table) -> pa.Table:
        gr = g["gram"].to_numpy(zero_copy_only=False)
        ky = g["key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ky, gr))
        gr_s, ky_s = gr[order], ky[order]
        starts = np.flatnonzero(np.r_[True, gr_s[1:] != gr_s[:-1]])
        ends = np.r_[starts[1:], len(gr_s)]
        aa, bb = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            seg = ky_s[s:e]
            iu = np.triu_indices(m, 1)
            aa.append(seg[iu[0]])
            bb.append(seg[iu[1]])
        if not aa:
            return pa.table({"key_a": pa.array([], pa.int64()),
                             "key_b": pa.array([], pa.int64())})
        return pa.table({"key_a": pa.array(np.concatenate(aa)),
                         "key_b": pa.array(np.concatenate(bb))})

    pairs = grams.groupby(_BUCKET_COL).map_groups(emit_pairs,
                                                  batch_format="pyarrow")

    def rebucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            _BUCKET_COL,
            pa.array(_hash_bucket(b, ["key_a", "key_b"], B)))

    def count_and_score(g: pa.Table) -> pa.Table:
        a = g["key_a"].to_numpy(zero_copy_only=False)
        b_ = g["key_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b_, a))
        a, b_ = a[order], b_[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (b_[1:] != b_[:-1])]
        starts = np.flatnonzero(new)
        inter = np.r_[starts[1:], len(a)] - starts
        ua, ub = a[starts], b_[starts]
        rk, rv = _ray.get(sizes_ref)
        na = rv[np.searchsorted(rk, ua)]
        nb = rv[np.searchsorted(rk, ub)]
        jac = inter / (na + nb - inter)
        keep = jac >= threshold
        return pa.table({
            "key_a": pa.array(ua[keep]),
            "key_b": pa.array(ub[keep]),
            "jaccard_q6": pa.array(
                np.floor(jac[keep] * 1000000.0 + 0.5).astype(np.int64)),
        })

    return pairs.map_batches(rebucket, batch_format="pyarrow") \
        .groupby(_BUCKET_COL).map_groups(count_and_score,
                                         batch_format="pyarrow")


def connected_components(pairs_ds, buckets: int | None = None,
                         max_rounds: int = 40,
                         driver_limit: int = 5_000_000):
    """Distributed connected components over an edge Dataset
    (key_a, key_b) → label Dataset (key, label) with label = the
    component's minimum key.  Hash-to-min label sets: O(log d) rounds,
    each round two hash-bucket exchanges; no driver-side per-pair
    Python, no driver dicts — the only driver traffic is one
    (count, checksum) pair per round.

    Size-dispatched (the join_auto / value_at_points_auto pattern):
    edge lists ≤ ``driver_limit`` collapse on the driver with
    VECTORIZED numpy label propagation (np.minimum.at scatter +
    pointer jumping — the same O(log d) iteration, zero per-pair
    Python, microseconds per round) since each distributed round costs
    a fixed all-to-all barrier that dwarfs small graphs; larger graphs
    take the distributed rounds."""
    from ._pool import cluster_cpus
    B = buckets or max(16, cluster_cpus() * 2)

    pairs_ds = pairs_ds.materialize()
    if driver_limit and pairs_ds.count() <= driver_limit:
        import ray as _ray
        parts = [t.select(["key_a", "key_b"])
                 for t in _ray.get(list(pairs_ds.to_arrow_refs()))
                 if t.num_rows]
        try:
            kt = pairs_ds.schema().base_schema.field("key_a").type
        except Exception:
            kt = parts[0]["key_a"].type if parts else pa.int64()
        if not parts:
            return rd.from_arrow(pa.table({
                "key": pa.array([], kt), "label": pa.array([], kt)}))
        t = pa.concat_tables(parts)
        a = t["key_a"].to_numpy(zero_copy_only=False)
        b = t["key_b"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(np.concatenate([a, b]),
                              return_inverse=True)
        ia, ib = inv[:len(a)], inv[len(a):]
        lab = np.arange(len(keys), dtype=np.int64)
        for _ in range(64):
            nxt = lab.copy()
            np.minimum.at(nxt, ia, lab[ib])
            np.minimum.at(nxt, ib, lab[ia])
            nxt = np.minimum(nxt, nxt[nxt])  # pointer jumping
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        else:
            raise RuntimeError("local CC did not converge in 64 rounds")
        # keys are sorted, so index-min ≡ key-min
        return rd.from_arrow(pa.table({
            "key": pa.array(keys, type=kt),
            "label": pa.array(keys[lab], type=kt)}))

    def seed(b: pa.Table) -> pa.Table:
        ka = b["key_a"].combine_chunks()
        kb = b["key_b"].combine_chunks()
        ut = ka.type
        return pa.table({
            "v": pa.concat_arrays([ka, kb, ka, kb]),
            "u": pa.array(pa.concat_arrays([kb, ka, ka, kb]), type=ut),
        })

    rows = pairs_ds.map_batches(seed, batch_format="pyarrow") \
        .materialize()
    prev = _ds_signature(rows)
    for _ in range(max_rounds):
        rows = _cc_round(rows, B).materialize()
        cur = _ds_signature(rows)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds (hash-to-min covers diameter ~2^{max_rounds})")

    # label(v) = min C(v): one more bucketed min-reduce
    def add_bucket_v(b: pa.Table) -> pa.Table:
        return b.append_column(
            _BUCKET_COL, pa.array(_hash_bucket(b, ["v"], B)))

    def label(g: pa.Table) -> pa.Table:
        vdf = g.select(["v", "u"]).to_pandas()
        order = np.lexsort((vdf["u"].values, vdf["v"].values))
        v = vdf["v"].values[order]
        u = vdf["u"].values[order]
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        ut = g["u"].type
        return pa.table({"key": pa.array(v[starts], type=ut),
                         "label": pa.array(u[starts], type=ut)})

    return rows.map_batches(add_bucket_v, batch_format="pyarrow") \
        .groupby(_BUCKET_COL).map_groups(label, batch_format="pyarrow")


def near_dup_dedup(ds, pairs_ds, key_col: str = "doc_id",
                   broadcast_limit: int = 2_000_000):
    """Final stage of near-dedup: drop all but one document from every
    near-duplicate CLUSTER (connected component of the verified pair
    graph); the keeper is the smallest key (deterministic).

    The components come from DISTRIBUTED hash-to-min label propagation
    (`connected_components` — no driver union-find, no per-pair Python).
    Applying the drop set is size-dispatched, the
    `value_at_points_auto` pattern: ≤ broadcast_limit dropped keys →
    one `ray.put` + vectorized `is_in` filter per batch (no corpus
    shuffle); above it → hash-bucketed anti-join so neither side ever
    materializes on one node (the 100-TB boilerplate-heavy-crawl
    case)."""
    import ray as _ray

    labels = connected_components(pairs_ds)
    drops = labels.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["key"], b["label"])))
        .select(["key"]), batch_format="pyarrow").materialize()
    n_drop = drops.count()
    if n_drop == 0:
        return ds
    if n_drop <= broadcast_limit:
        parts = [t for t in _ray.get(list(drops.to_arrow_refs()))
                 if t.num_columns]  # groupby emits schema-less empties
        drop_ref = _ray.put(
            pa.concat_tables(parts)["key"].combine_chunks())

        def keep(b: pa.Table) -> pa.Table:
            d = _ray.get(drop_ref)
            return b.filter(pc.invert(pc.is_in(b[key_col], value_set=d)))

        return ds.map_batches(keep, batch_format="pyarrow")

    # large drop set: bucketed anti-join (corpus + drops co-grouped)
    from ._pool import cluster_cpus
    B = max(64, cluster_cpus() * 4)

    def corpus_side(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b[key_col].combine_chunks()})
        return b.append_column("__src", pa.array(
            np.zeros(len(b), np.int8))).append_column(
            _BUCKET_COL, pa.array(_hash_bucket(t, ["k"], B)))

    corpus_schema = ds.schema()

    def drop_side(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b["key"].combine_chunks()})
        cols = {name: pa.nulls(len(b), typ) for name, typ in
                zip(corpus_schema.names, corpus_schema.types)}
        cols[key_col] = b["key"].combine_chunks()
        out = pa.table(cols)
        return out.append_column("__src", pa.array(
            np.ones(len(b), np.int8))).append_column(
            _BUCKET_COL, pa.array(_hash_bucket(t, ["k"], B)))

    both = ds.map_batches(corpus_side, batch_format="pyarrow").union(
        drops.map_batches(drop_side, batch_format="pyarrow"))

    def anti(g: pa.Table) -> pa.Table:
        src = g["__src"].to_numpy(zero_copy_only=False)
        dropped = pc.unique(g[key_col].filter(pa.array(src == 1)))
        keep_rows = pa.array(src == 0)
        g = g.filter(keep_rows)
        g = g.filter(pc.invert(pc.is_in(g[key_col], value_set=dropped)))
        return g.drop_columns(["__src", _BUCKET_COL])

    return both.groupby(_BUCKET_COL).map_groups(anti,
                                                batch_format="pyarrow")


def simhash_near_dup_pairs(ds, key_col: str = "doc_id",
                           text_col: str = "text", shingle_k: int = 2,
                           max_hamming: int = 3,
                           n_bands: int = 4, max_bucket: int = 64,
                           n_buckets: int | None = None):
    """SimHash near-dup: 64-bit fingerprints, banded into ``n_bands``
    16-bit segments (two fingerprints within Hamming distance
    n_bands-1 share at least one band — the pigeonhole guarantee), one
    bucket exchange per the MinHash plan, exact Hamming verify
    in-bucket, `dedup_pairs` for multi-band repeats."""
    from ._pool import cluster_cpus
    B = n_buckets or max(16, cluster_cpus() * 4)
    assert 64 % n_bands == 0
    bits = 64 // n_bands

    hasher = SimHasher(text_col=text_col, shingle_k=shingle_k)

    def band_rows(b: pa.Table) -> pa.Table:
        t = hasher(b)
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        segs, ks, hs = [], [], []
        mask = np.uint64((1 << bits) - 1)
        for bi in range(n_bands):
            code = (h >> np.uint64(bi * bits)) & mask
            with np.errstate(over="ignore"):
                segs.append(code * _GOLDEN + np.uint64(bi))
            ks.append(keys)
            hs.append(h)
        seg = np.concatenate(segs)
        return pa.table({
            key_col: pa.array(np.concatenate(ks)),
            "seg": pa.array(seg, pa.uint64()),
            "h": pa.array(np.concatenate(hs), pa.uint64()),
            _BUCKET_COL: pa.array((seg % np.uint64(B)).astype(np.int32)),
        })

    segged = ds.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        seg = g["seg"].to_numpy(zero_copy_only=False)
        key = g[key_col].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((key, seg))
        seg, key, h = seg[order], key[order], h[order]
        ia, ib = _emit_segment_pairs(seg, [key], max_bucket)
        kt = g[key_col].type
        if len(ia) == 0:
            return pa.table({"key_a": pa.array([], kt),
                             "key_b": pa.array([], kt),
                             "hamming": pa.array([], pa.int32())})
        x = h[ia] ^ h[ib]
        # vectorized popcount via the uint8 view
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                            axis=1).sum(axis=1).astype(np.int32)
        m = ham <= max_hamming
        return pa.table({
            "key_a": pa.array(key[ia[m]], type=kt),
            "key_b": pa.array(key[ib[m]], type=kt),
            "hamming": pa.array(ham[m], pa.int32()),
        })

    pairs = segged.groupby(_BUCKET_COL).map_groups(bucket_pairs,
                                                   batch_format="pyarrow")
    return dedup_pairs(pairs)
