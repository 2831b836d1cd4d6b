"""Web-text analysis kernels for large-scale training-data pipelines.

Not present in the reference (GDAL has no text ops); these are the
payload-side operators a 100 TB Common-Crawl-style pipeline needs:
language ID, quality scoring, token counting, fingerprinting, shingling
and MinHash/SimHash signatures.  Hot paths use pyarrow's RE2-backed
string kernels (``count_substring_regex``, ``utf8_length``) — one C++
pass per metric, no Python per row.  Signature functions (MinHash /
SimHash) hash per-token with zlib.crc32 (C speed, deterministic across
processes — never builtin ``hash``) and vectorize the permutations in
numpy.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- token counting --------------------------------------------------------

_WORD_RE = r"[A-Za-z0-9_]+(?:'[A-Za-z]+)?"


def token_count_batch(batch: pa.Table, col: str = "text",
                      out: str = "n_tokens") -> pa.Table:
    """Whitespace-delimited token count (vectorized regex count)."""
    n = pc.count_substring_regex(batch[col], r"\S+")
    return batch.append_column(out, pc.cast(n, pa.int64()))


def word_count_batch(batch: pa.Table, col: str = "text",
                     out: str = "n_words") -> pa.Table:
    """BPE-ish word token count (letters/digits runs with apostrophes)."""
    n = pc.count_substring_regex(batch[col], _WORD_RE)
    return batch.append_column(out, pc.cast(n, pa.int64()))


# --- quality scoring -------------------------------------------------------

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "des", "est", "pour", "dans"],
    "es": ["el", "la", "los", "las", "de", "que", "es", "por", "con"],
    "pt": ["o", "a", "os", "as", "de", "que", "em", "para", "com", "não"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}


def quality_score_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append length/punctuation/alpha-ratio quality features.

    All ratios are computed as C1-pass regex counts over the raw text:
    n_chars, n_tokens, punct_ratio, alpha_ratio, digit_ratio,
    mean_token_len.
    """
    text = batch[col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.float64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.float64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_toks = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    out = batch.append_column("n_chars", pc.cast(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column("punct_ratio", pc.divide(n_punct, safe_chars))
    out = out.append_column("alpha_ratio", pc.divide(n_alpha, safe_chars))
    out = out.append_column("digit_ratio", pc.divide(n_digit, safe_chars))
    # mean token length over non-space chars
    n_nonspace = pc.cast(pc.count_substring_regex(text, r"\S"), pa.float64())
    out = out.append_column("mean_token_len", pc.divide(n_nonspace, safe_toks))
    return out


def lang_id_batch(batch: pa.Table, col: str = "text",
                  out: str = "lang_pred") -> pa.Table:
    """Stopword-profile language ID over the supported language set.

    One vectorized word-boundary regex count per language; prediction =
    argmax of stopword hits normalized by token count; ties and zero
    hits → 'und' (undetermined).
    """
    text = batch[col]
    langs = list(_STOPWORDS)
    scores = np.zeros((len(langs), len(batch)), dtype=np.float64)
    for i, lang in enumerate(langs):
        words = _STOPWORDS[lang]
        if lang == "zh":
            pat = "|".join(map(re.escape, words))
        else:
            pat = r"(?i)\b(?:" + "|".join(map(re.escape, words)) + r")\b"
        scores[i] = pc.count_substring_regex(text, pat).to_numpy(
            zero_copy_only=False
        )
    best = np.argmax(scores, axis=0)
    hits = scores[best, np.arange(scores.shape[1])]
    pred = np.where(hits > 0, np.asarray(langs, dtype=object)[best], "und")
    return batch.append_column(out, pa.array(pred.tolist(), pa.string()))


# --- fingerprinting --------------------------------------------------------


def fingerprint_batch(batch: pa.Table, col: str = "text",
                      out: str = "fingerprint") -> pa.Table:
    """MD5 content fingerprint of the raw text bytes (hex string) — the
    exact-dedup key; SQL-oracle-equivalent to DuckDB ``md5(text)``."""
    import hashlib

    vals = batch[col].to_pylist()
    fps = [hashlib.md5(("" if v is None else v).encode("utf-8")).hexdigest()
           for v in vals]
    return batch.append_column(out, pa.array(fps, pa.string()))


def crc_tokens(text: str, pattern: re.Pattern) -> np.ndarray:
    """Deterministic uint64 token hashes (crc32 — C speed)."""
    return np.array(
        [zlib.crc32(t.encode("utf-8")) for t in pattern.findall(text.lower())],
        dtype=np.uint64,
    )


_SHINGLE_RE = re.compile(r"\S+")

# MinHash permutation parameters: (a*h + b) mod p, p Mersenne-ish prime
_MH_PRIME = np.uint64((1 << 61) - 1)


def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, 1 << 61, size=num_perm).astype(np.uint64)
    b = rs.randint(0, 1 << 61, size=num_perm).astype(np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingle hashes (rolling over crc32 token hashes)."""
    toks = crc_tokens(text, _SHINGLE_RE)
    if len(toks) < k:
        return toks if len(toks) else np.array([0], dtype=np.uint64)
    # combine k consecutive token hashes with distinct multipliers
    mults = np.array([1000003, 999983, 31337][:k] + [7] * max(0, k - 3),
                     dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(toks, k)
    return (windows * mults).sum(axis=1, dtype=np.uint64)


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*h+b) mod p over the shingle set."""
    with np.errstate(over="ignore"):
        hv = (sh[None, :] * a[:, None] + b[:, None]) % _MH_PRIME
    return hv.min(axis=1)


def md5_shingle_hashes(text: str, k: int = 2) -> np.ndarray:
    """SQL-replicable shingles for SimHash: token hash = first 8 md5
    hex digits (32 bits — DuckDB: ('0x' || substr(md5(t),1,8))::
    UBIGINT), k-window combine h_i·1000003 + h_{i+1}·999983.  All
    values stay under 2^53, so the arithmetic is exact (no modular
    wrap) in BOTH numpy uint64 and DuckDB BIGINT — that is what lets
    docs_simhash carry a literal-bit SQL oracle."""
    import hashlib

    toks = np.array(
        [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
         for t in _SHINGLE_RE.findall(text.lower())],
        dtype=np.uint64)
    if len(toks) < k:
        return toks if len(toks) else np.array([0], dtype=np.uint64)
    mults = np.array([1000003, 999983, 31337][:k] + [7] * max(0, k - 3),
                     dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(toks, k)
    return (windows * mults).sum(axis=1, dtype=np.uint64)


def simhash64(sh: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of the shingle multiset."""
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    w = np.ones(len(sh)) if weights is None else weights
    acc = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    return np.uint64(((acc > 0).astype(np.uint64)
                      << np.arange(64, dtype=np.uint64)).sum())


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard similarity between two texts."""
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --- corpus document frequency (inverted-index statistics) ------------------

_DF_TOKEN_RE = re.compile(r"[a-z0-9]+")


def term_df_partial_batch(batch: pa.Table, col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Per-batch (token, df, tf) partials for corpus document-frequency:
    tf counts every occurrence, df counts each document once (documents
    are one row each, so per-row dedup is globally exact).  Tokens are
    lowercase [a-z0-9]+ runs — the same RE2 class DuckDB's
    regexp_extract_all(lower(text), '[a-z0-9]+') matches."""
    tokens, dfs, tfs = {}, {}, {}
    for txt in pc.utf8_lower(batch[col]).to_pylist():
        toks = _DF_TOKEN_RE.findall(txt or "")
        for t in toks:
            tfs[t] = tfs.get(t, 0) + 1
        for t in set(toks):
            dfs[t] = dfs.get(t, 0) + 1
    keys = sorted(dfs)
    return pa.table({
        "token": pa.array(keys, pa.string()),
        "df": pa.array([dfs[k] for k in keys], pa.int64()),
        "tf": pa.array([tfs[k] for k in keys], pa.int64()),
    })


def term_df(ds, top_k: int = 50, buckets: int = 64):
    """Corpus document-frequency table, top_k by (df desc, tf desc,
    token asc): per-batch partials collapse the vocabulary BEFORE one
    hash-bucket exchange sums them; the tiny aggregated table sorts
    globally.  The inverted-index statistics pass of a training-data
    pipeline — the exchange width is the vocabulary, not the corpus."""
    import pandas as pd

    partials = ds.map_batches(term_df_partial_batch,
                              batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(b["token"].to_pandas(),
                                       index=False,
                                       hash_key="gdal_ray_gagg_00")
        return b.append_column(
            "__b", pa.array((h.values % np.uint64(buckets))
                            .astype(np.int32)))

    def merge(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("token", as_index=False) \
            .agg(df=("df", "sum"), tf=("tf", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    merged = partials.map_batches(bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(merge, batch_format="pyarrow")
    return merged.sort(["df", "tf", "token"],
                       descending=[True, True, False]).limit(top_k)


# --- deterministic curation: hash sampling + per-group caps -----------------

def hash_sample_batch(batch: pa.Table, col: str = "text",
                      rate_denom: int = 8, keep: int = 0) -> pa.Table:
    """Deterministic content-hash sampling — the reproducible
    subsampling pass of a training-data pipeline: keep rows whose
    md5-prefix bucket (first 8 hex digits as uint32) % rate_denom ==
    keep.  Pure filter, no state, identical on any cluster shape;
    restates in SQL as ('0x' || substr(md5(x), 1, 8))::UBIGINT %
    rate_denom."""
    import hashlib

    vals = batch[col].to_pylist()
    m = np.array([int(hashlib.md5(("" if v is None else v)
                                  .encode("utf-8")).hexdigest()[:8], 16)
                  % rate_denom == keep for v in vals], dtype=bool)
    return batch.filter(pa.array(m))


def cap_per_group(ds, key_col: str, order_col: str, n: int,
                  buckets: int = 64):
    """Per-group cap (class balancing): keep at most ``n`` rows per
    key, chosen by ascending ``order_col`` (deterministic — the
    ROW_NUMBER() <= n rule).  Hash-bucket exchange + one lexsort /
    cumcount kernel per bucket; only (key, order) move until the final
    semi-join-free emit (rows carry their payload through the
    exchange — cap the columns you ship)."""
    import pandas as pd

    def bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(b[key_col].to_pandas(),
                                       index=False,
                                       hash_key="gdal_ray_gagg_00")
        return b.append_column(
            "__b", pa.array((h.values % np.uint64(buckets))
                            .astype(np.int32)))

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        o = g[order_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, k))
        ks = k[order]
        new = np.r_[True, ks[1:] != ks[:-1]]
        # rank within key = index - index of key start
        starts = np.flatnonzero(new)
        run_start = starts[np.cumsum(new) - 1]
        rank = np.arange(len(ks)) - run_start
        keep_rows = order[rank < n]
        out = g.take(pa.array(np.sort(keep_rows)))
        return out.drop_columns(["__b"])

    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pyarrow")


def tfidf_scores(ds, id_col: str = "doc_id", col: str = "text",
                 buckets: int = 64):
    """Per-document TF-IDF scoring: score(d) = Σ_{t ∈ d}
    tf(t, d) · ln(N / df(t)) over lowercase [a-z0-9]+ tokens — the
    corpus-statistics + per-doc pass of a relevance/quality pipeline.
    The df table is vocabulary-sized (term_df partials), broadcast via
    ray.put under the hood of a second map — the corpus streams twice,
    the vocabulary never shuffles wider than itself.  Returns
    (id_col, n_tokens, score)."""
    import ray as _ray

    partials = ds.map_batches(
        lambda b: term_df_partial_batch(b, col, id_col),
        batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        import pandas as pd
        h = pd.util.hash_pandas_object(b["token"].to_pandas(),
                                       index=False,
                                       hash_key="gdal_ray_gagg_00")
        return b.append_column(
            "__b", pa.array((h.values % np.uint64(buckets))
                            .astype(np.int32)))

    def merge(g: pa.Table) -> pa.Table:
        import pandas as pd
        df = g.to_pandas().groupby("token", as_index=False) \
            .agg(df=("df", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    df_t = pa.concat_tables(
        [b for b in partials.map_batches(bucket,
                                         batch_format="pyarrow")
         .groupby("__b").map_groups(merge, batch_format="pyarrow")
         .iter_batches(batch_size=65536, batch_format="pyarrow")
         if b.num_rows])
    n_docs = float(ds.count())
    idf = {t: np.log(n_docs / d) for t, d in
           zip(df_t["token"].to_pylist(), df_t["df"].to_pylist())}
    idf_ref = _ray.put(idf)

    def score(b: pa.Table) -> pa.Table:
        w = _ray.get(idf_ref)
        ids, nt, sc = [], [], []
        for i, txt in zip(b[id_col].to_pylist(),
                          pc.utf8_lower(b[col]).to_pylist()):
            toks = _DF_TOKEN_RE.findall(txt or "")
            s = 0.0
            for t in toks:
                s += w.get(t, 0.0)
            ids.append(i)
            nt.append(len(toks))
            sc.append(s)
        return pa.table({id_col: pa.array(ids),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "score": pa.array(sc, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")
