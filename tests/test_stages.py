"""Stage-level tests over small in-memory Datasets (Ray session fixture).

Oracles are brute-force numpy recomputations of each stage's contract —
the reference's autotest pattern of tiny fixtures with exact expected
outputs (SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.geom import predicates, wkb
from gdal_ray.stages import tiling
from gdal_ray.stages.aggregate import partial_final_agg, salted_group_count
from gdal_ray.stages.dedup import dedup_exact, minhash_candidate_pairs
from gdal_ray.stages.join import broadcast_join
from gdal_ray.stages.knn import knn_lookup
from gdal_ray.stages.similarity import cosine_threshold_self_join, cosine_topk
from gdal_ray.stages.spatial_join import SpatialJoinIndex, spatial_join


def _points_ds(ray_session, n=500, seed=0, npartitions=4):
    import ray.data as rd

    rs = np.random.RandomState(seed)
    t = pa.table({
        "pid": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(rs.uniform(-170, 170, n)),
        "lat": pa.array(rs.uniform(-80, 80, n)),
        "val": pa.array(rs.uniform(0, 100, n)),
    })
    return rd.from_arrow(t).repartition(npartitions), t


def _zones() -> pa.Table:
    return pa.table({
        "poly_id": pa.array(np.arange(3, dtype=np.int32)),
        "zname": pa.array(["a", "b", "c"]),
        "geometry": pa.array([
            wkb.box_polygon(-100, -50, 0, 0),
            wkb.box_polygon(-20, -20, 60, 60),  # overlaps zone a
            wkb.encode_polygon([[(120, 0), (160, 40), (120, 70), (100, 30)]]),
        ], pa.binary()),
    })


def _brute_pairs(t: pa.Table, zones: pa.Table):
    lon = t["lon"].to_numpy()
    lat = t["lat"].to_numpy()
    out = []
    for pid, blob in enumerate(zones["geometry"].to_pylist()):
        m = predicates.points_in_polygon_wkb(lon, lat, blob)
        out.extend((int(r), pid) for r in np.nonzero(m)[0])
    return set(out)


def test_spatial_join_intersection_matches_bruteforce(ray_session):
    ds, t = _points_ds(ray_session)
    zones = _zones()
    got = spatial_join(ds, zones, operation="intersection", concurrency=2) \
        .to_pandas()
    expect = _brute_pairs(t, zones)
    got_pairs = set(zip(got["pid"].astype(int), got["poly_id"].astype(int)))
    assert got_pairs == expect
    # schema-merge rule: no collisions here → plain concatenation
    assert list(got.columns) == ["pid", "lon", "lat", "val",
                                 "poly_id", "zname"]


def test_spatial_join_collision_prefixes(ray_session):
    """Name collisions get input_/method_ prefixes
    (set_result_schema, ogrlayer.cpp:5117-5199)."""
    ds, t = _points_ds(ray_session, n=50)
    zones = _zones().rename_columns(["poly_id", "val", "geometry"])
    got = spatial_join(ds, zones, operation="intersection", concurrency=1) \
        .to_pandas()
    assert "input_val" in got.columns and "method_val" in got.columns


def test_spatial_join_semi_anti_partition(ray_session):
    ds, t = _points_ds(ray_session)
    zones = _zones()
    semi = spatial_join(ds, zones, operation="semi", concurrency=2).to_pandas()
    anti = spatial_join(ds, zones, operation="anti", concurrency=2).to_pandas()
    matched = {r for r, _ in _brute_pairs(t, zones)}
    assert set(semi["pid"]) == matched
    assert set(anti["pid"]) == set(range(len(t))) - matched
    assert len(semi) + len(anti) == len(t)


def test_spatial_join_identity_left(ray_session):
    ds, t = _points_ds(ray_session, n=200)
    zones = _zones()
    got = spatial_join(ds, zones, operation="identity", concurrency=2) \
        .to_pandas()
    pairs = _brute_pairs(t, zones)
    matched = {r for r, _ in pairs}
    # every input row appears; unmatched rows once with null method fields
    assert len(got) == len(pairs) + (len(t) - len(matched))
    unmatched = got[got["poly_id"].isna()]
    assert set(unmatched["pid"]) == set(range(len(t))) - matched


def test_spatial_join_index_candidates_superset():
    """Phase-1 cell pruning must never drop a true hit (two-phase filter
    contract, ogrlayer.cpp:4004-4075)."""
    zones = _zones()
    idx = SpatialJoinIndex(zones)
    rs = np.random.RandomState(5)
    lon = rs.uniform(-180, 180, 2000)
    lat = rs.uniform(-85, 85, 2000)
    rows, polys = idx.candidate_pairs(lon, lat)
    cand = set(zip(rows.tolist(), polys.tolist()))
    t = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    assert _brute_pairs(t, zones) <= cand


def test_knn_tie_goes_to_later_scanned(ray_session):
    """gdalgrid.cpp:963-967 '<=' compare: later reference point wins."""
    import ray.data as rd

    refs = pa.table({
        "ref_id": pa.array([10, 20], pa.int64()),
        "x": pa.array([0.0, 2.0]),
        "y": pa.array([0.0, 0.0]),
    })
    q = rd.from_arrow(pa.table({"lon": pa.array([1.0]),
                                "lat": pa.array([0.0])}))
    out = knn_lookup(q, refs, concurrency=1).to_pandas()
    assert out["nearest_id"].tolist() == [20]


def test_knn_radius_nodata(ray_session):
    import ray.data as rd

    refs = pa.table({"ref_id": pa.array([1], pa.int64()),
                     "x": pa.array([0.0]), "y": pa.array([0.0])})
    q = rd.from_arrow(pa.table({"lon": pa.array([0.5, 50.0]),
                                "lat": pa.array([0.0, 0.0])}))
    out = knn_lookup(q, refs, radius=1.0, concurrency=1).to_pandas()
    assert out["nearest_id"].tolist()[0] == 1
    assert pd.isna(out["nearest_id"].tolist()[1])
    assert np.isnan(out["nearest_dist"].values[1])


def test_knn_idw_hand_computed(ray_session):
    """IDW weights 1/d^2, NODATA below min_points
    (gdalgrid.cpp:307-339)."""
    import ray.data as rd

    refs = pa.table({
        "ref_id": pa.array([0, 1, 2], pa.int64()),
        "x": pa.array([0.0, 4.0, 100.0]),
        "y": pa.array([0.0, 0.0, 0.0]),
        "v": pa.array([10.0, 20.0, 99.0]),
    })
    q = rd.from_arrow(pa.table({"lon": pa.array([1.0, 50.0]),
                                "lat": pa.array([0.0, 0.0])}))
    out = knn_lookup(q, refs, value_col="v", max_points=2, min_points=2,
                     power=2.0, radius=10.0, concurrency=1).to_pandas()
    # point 0: d=1 (v=10), d=3 (v=20): (10/1 + 20/9)/(1 + 1/9) = 11
    assert out["nearest_idw"].values[0] == pytest.approx(11.0)
    assert out["nearest_n"].values[0] == 2
    # point 1: only ref 2 within radius 10 → n=1 < min_points → NaN
    assert np.isnan(out["nearest_idw"].values[1])


def test_knn_idw_exact_hit(ray_session):
    import ray.data as rd

    refs = pa.table({"ref_id": pa.array([0, 1], pa.int64()),
                     "x": pa.array([0.0, 1.0]), "y": pa.array([0.0, 0.0]),
                     "v": pa.array([42.0, 7.0])})
    q = rd.from_arrow(pa.table({"lon": pa.array([0.0]),
                                "lat": pa.array([0.0])}))
    out = knn_lookup(q, refs, value_col="v", max_points=2, min_points=1,
                     concurrency=1).to_pandas()
    assert out["nearest_idw"].values[0] == 42.0


def test_dedup_exact_keeps_earliest(ray_session):
    import ray.data as rd

    t = pa.table({
        "url": pa.array(["u1", "u2", "u1", "u3", "u2", "u1"]),
        "warc_ts": pa.array([5, 1, 3, 9, 0, 7], pa.int64()),
        "text": pa.array(["a", "b", "c", "d", "e", "f"]),
    })
    out = dedup_exact(rd.from_arrow(t).repartition(3), key="url",
                      order_col="warc_ts").to_pandas()
    got = dict(zip(out["url"], out["warc_ts"]))
    assert got == {"u1": 3, "u2": 0, "u3": 9}


def test_minhash_identical_docs_pair(ray_session):
    import ray.data as rd

    text = "the quick brown fox jumps over the lazy dog " * 5
    other = "completely different content about graph engines " * 5
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([text, text, other])})
    out = minhash_candidate_pairs(rd.from_arrow(t), concurrency=1).to_pandas()
    pairs = set(zip(out["key_a"].astype(int), out["key_b"].astype(int)))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_jaccard_verify_pairs(ray_session):
    import ray.data as rd

    from gdal_ray.functions.text import ngram_jaccard
    from gdal_ray.stages.dedup import jaccard_verify_pairs

    near = "the quick brown fox jumps over the lazy dog and runs away"
    near2 = "the quick brown fox jumps over the lazy dog and walks away"
    far = "completely different text about distributed query engines"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([near, near2, far]),
    }))
    pairs = rd.from_arrow(pa.table({
        "key_a": pa.array([1, 1], pa.int64()),
        "key_b": pa.array([2, 3], pa.int64()),
    }))
    out = jaccard_verify_pairs(docs, pairs, threshold=0.5).to_pandas()
    assert set(zip(out["key_a"], out["key_b"])) == {(1, 2)}
    # raw double (r5: rounding dropped — engine value is the identical
    # IEEE i/u division the SQL oracle emits)
    expect = ngram_jaccard(near, near2, 3)
    assert out["jaccard"].iloc[0] == expect


def test_broadcast_join_matches_pandas(ray_session):
    import ray.data as rd

    rs = np.random.RandomState(8)
    big = pa.table({"k": pa.array(rs.randint(0, 20, 300)),
                    "v": pa.array(rs.uniform(0, 1, 300))})
    small = pa.table({"k": pa.array(np.arange(0, 15)),
                      "name": pa.array([f"n{i}" for i in range(15)])})
    got = broadcast_join(rd.from_arrow(big).repartition(3), small, keys="k") \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    exp = big.to_pandas().merge(small.to_pandas(), on="k") \
        .sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_partial_final_agg_matches_pandas(ray_session):
    import ray.data as rd

    rs = np.random.RandomState(3)
    df = pd.DataFrame({"g": rs.choice(list("abcd"), 1000),
                       "x": rs.uniform(0, 10, 1000)})
    ds = rd.from_pandas(df).repartition(5)
    got = partial_final_agg(ds, "g", [("x", "sum", "sx"), ("x", "min", "mn"),
                                      ("x", "max", "mx"), ("x", "mean", "avg"),
                                      (None, "count", "n")]) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    exp = df.groupby("g")["x"].agg(["sum", "min", "max", "mean", "count"]) \
        .reset_index()
    np.testing.assert_allclose(got["sx"], exp["sum"], rtol=1e-12)
    np.testing.assert_allclose(got["mn"], exp["min"])
    np.testing.assert_allclose(got["mx"], exp["max"])
    np.testing.assert_allclose(got["avg"], exp["mean"], rtol=1e-12)
    np.testing.assert_array_equal(got["n"], exp["count"])


def test_salted_group_count(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["hot"] * 900 + ["cold"] * 100})
    out = salted_group_count(rd.from_pandas(df).repartition(4), "k",
                             buckets=8).to_pandas()
    assert dict(zip(out["k"], out["n"])) == {"hot": 900, "cold": 100}


def test_tile_counts_and_pyramid_conservation(ray_session):
    ds, t = _points_ds(ray_session, n=400)
    base = tiling.tile_counts(ds, [6])
    base_t = base.to_pandas()
    assert base_t["n_pages"].sum() == 400
    pyr = tiling.pyramid_counts_ds(base, base_zoom=6, min_zoom=3).to_pandas()
    for z in (3, 4, 5, 6):
        assert pyr[pyr["z"] == z]["n_pages"].sum() == 400
    # driver-side variant agrees
    pyr2 = tiling.pyramid_counts(pa.Table.from_pandas(base_t),
                                 min_zoom=3).to_pandas()
    a = pyr.sort_values(["z", "x", "y"]).reset_index(drop=True)
    b = pyr2.sort_values(["z", "x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()],
                                  check_dtype=False)


def test_render_tiles_counts(ray_session):
    import zlib

    ds, t = _points_ds(ray_session, n=300)
    tiles_out = tiling.render_tiles(ds, zoom=3).to_pandas()
    assert tiles_out["n_pages"].sum() == 300
    # each raster decodes to a 256x256 grid summing to the tile's count
    for _, row in tiles_out.head(5).iterrows():
        grid = np.frombuffer(zlib.decompress(row["raster"]),
                             dtype=">u2").reshape(256, 256)
        assert grid.sum() == row["n_pages"]


def test_png_encoder_valid_signature():
    grid = np.zeros((256, 256), dtype=">u2")
    grid[10, 20] = 5
    png = tiling.encode_png_gray16(grid.tobytes())
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in png[:30] and png[-8:-4] == b"IEND"


def test_cosine_topk_matches_bruteforce(ray_session):
    import ray.data as rd

    rs = np.random.RandomState(13)
    emb = rs.normal(size=(200, 16))
    t = pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                  "embedding": pa.array(emb.tolist())})
    q = emb[:3]
    got = cosine_topk(rd.from_arrow(t).repartition(4), q, k=5,
                      concurrency=1).to_pandas()
    V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    Q = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = Q @ V.T
    for qi in range(3):
        exp = set(np.argsort(-sims[qi], kind="stable")[:5].tolist())
        sub = got[got["query_id"] == qi]
        assert set(sub["vec_id"].astype(int)) == exp
        assert sub["vec_id"].iloc[0] == qi  # self is most similar


def test_cosine_threshold_self_join_exact(ray_session):
    import ray.data as rd

    rs = np.random.RandomState(17)
    emb = rs.normal(size=(100, 8))
    t = pa.table({"vec_id": pa.array(np.arange(100, dtype=np.int64)),
                  "embedding": pa.array(emb.tolist())})
    got = cosine_threshold_self_join(rd.from_arrow(t).repartition(3),
                                     threshold=0.5).to_pandas()
    V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    S = V @ V.T
    ia, ib = np.triu_indices(100, 1)
    m = S[ia, ib] >= 0.5
    exp = set(zip(ia[m].tolist(), ib[m].tolist()))
    assert set(zip(got["key_a"].astype(int), got["key_b"].astype(int))) == exp


def test_minhash_hot_bucket_emits_linear_pairs(ray_session):
    """A hot LSH bucket (1000 identical docs) must emit O(b) chain
    edges, not O(b^2) all-pairs — the 100-TB boilerplate case."""
    import ray.data as rd

    n = 1000
    text = "identical boilerplate document body repeated verbatim " * 4
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array([text] * n)})
    out = minhash_candidate_pairs(rd.from_arrow(t).repartition(4),
                                  max_bucket=64, concurrency=1).to_pandas()
    # identical docs share every band bucket; the sorted-adjacency chain
    # is the same (k[i], k[i+1]) in every band, so after pair-dedup the
    # result is exactly the n-1 chain edges
    assert len(out) == n - 1
    # chain edges span one connected component over all n docs
    ids = set(out["key_a"]) | set(out["key_b"])
    assert ids == set(range(n))


def test_jaccard_verify_empty_pairs(ray_session):
    """No LSH collisions → empty verified Dataset (not a crash)."""
    import ray.data as rd

    from gdal_ray.stages.dedup import jaccard_verify_pairs

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta", "unrelated words here"]),
    }))
    pairs = rd.from_arrow(pa.table({
        "key_a": pa.array([], pa.int64()),
        "key_b": pa.array([], pa.int64()),
    }))
    out = jaccard_verify_pairs(docs, pairs, threshold=0.5)
    assert out.count() == 0
    # Dataset schema survives the empty case (to_pandas drops columns
    # of a 0-row dataset — a Ray quirk, so assert on the schema)
    assert set(out.schema().names) == {"key_a", "key_b", "jaccard"}


def test_embedding_near_dup_exact_dups_full_recall(ray_session):
    """Identical vectors agree on every hyperplane band → every exact
    duplicate pair is found; non-dup cross-cluster pairs are excluded
    by the in-bucket exact cosine check."""
    import ray.data as rd

    from gdal_ray.stages.dedup import embedding_near_dup_pairs

    rs = np.random.RandomState(3)
    n_clusters, per = 20, 3
    base = rs.normal(size=(n_clusters, 16))
    vecs = np.repeat(base, per, axis=0)  # exact dups within cluster
    ids = np.arange(n_clusters * per, dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    })
    out = embedding_near_dup_pairs(
        rd.from_arrow(t).repartition(3), "vec_id", "embedding",
        threshold=0.999).to_pandas()
    got = set(zip(out["key_a"], out["key_b"]))
    expect = set()
    for c in range(n_clusters):
        ks = ids[c * per:(c + 1) * per]
        for i in range(per):
            for j in range(i + 1, per):
                expect.add((ks[i], ks[j]))
    assert expect <= got  # full recall on exact dups
    # precision: nothing below threshold sneaks in
    for a, b in got:
        va = vecs[a] / np.linalg.norm(vecs[a])
        vb = vecs[b] / np.linalg.norm(vecs[b])
        assert va @ vb >= 0.999 - 1e-9


def test_tile_directory_sink_layout_and_resume(ray_session, tmp_path):
    """z/x/y.png layout + --resume skip, mirroring
    autotest/utilities/test_gdalalg_raster_tile.py:55-69's exact
    recursive-listing assertion."""
    import os

    ds, _ = _points_ds(ray_session, n=300)
    tiles = tiling.render_tiles(ds, zoom=2)
    out_dir = str(tmp_path / "tiles")
    res = tiling.write_tile_directory(tiles, out_dir).to_pandas()
    assert res["written"].all()
    # exact recursive listing == one z/x/y.png per tile row
    listing = sorted(
        os.path.relpath(os.path.join(r, f), out_dir)
        for r, _, fs in os.walk(out_dir) for f in fs)
    expect = sorted(f"2/{int(x)}/{int(y)}.png"
                    for x, y in zip(res["x"], res["y"]))
    assert listing == expect
    # every file is a valid 16-bit gray PNG
    with open(os.path.join(out_dir, listing[0]), "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    # resume: delete one file, re-run -> only that one rewritten
    victim = os.path.join(out_dir, listing[0])
    os.remove(victim)
    tiles2 = tiling.render_tiles(ds, zoom=2)
    res2 = tiling.write_tile_directory(tiles2, out_dir,
                                       resume=True).to_pandas()
    assert res2["written"].sum() == 1
    assert os.path.exists(victim)


def test_near_dup_dedup_end_to_end(ray_session):
    """Full near-dedup pipeline on a corpus with exact duplicates:
    identical docs always collide in every LSH band (recall 1), so the
    end-to-end result equals exact dedup — one survivor per cluster,
    smallest key wins."""
    import ray.data as rd

    from gdal_ray.stages.dedup import (jaccard_verify_pairs,
                                       near_dup_dedup)

    texts = {
        1: "alpha beta gamma delta epsilon zeta " * 5,
        2: "alpha beta gamma delta epsilon zeta " * 5,   # dup of 1
        3: "one two three four five six seven eight " * 5,
        4: "one two three four five six seven eight " * 5,  # dup of 3
        5: "totally different content about ray datasets " * 5,
    }
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values())),
    }))
    cands = minhash_candidate_pairs(docs, concurrency=1)
    verified = jaccard_verify_pairs(docs, cands, threshold=0.9)
    kept = near_dup_dedup(docs, verified).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3, 5]


def test_ivf_topk_recall_vs_bruteforce(ray_session):
    """IVF with corpus-trained centroids and nprobe recovers most of
    the brute-force top-k (ANN recall sanity: >= 80% at nprobe=half
    the centroids on clustered data)."""
    import ray.data as rd

    from gdal_ray.stages.similarity import (cosine_topk, ivf_topk,
                                            train_centroids)

    rs = np.random.RandomState(9)
    centers = rs.normal(size=(8, 32)) * 4
    vecs = np.vstack([c + rs.normal(size=(100, 32)) for c in centers])
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs.astype(np.float64)),
                                        pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(4)
    queries = vecs[rs.choice(len(vecs), 5, replace=False)] \
        + rs.normal(size=(5, 32)) * 0.1
    cents = train_centroids(vecs[rs.choice(len(vecs), 256,
                                           replace=False)], 8)
    exact = cosine_topk(ds, queries, k=10, concurrency=1).to_pandas()
    approx = ivf_topk(rd.from_arrow(t).repartition(4), queries, cents,
                      k=10, nprobe=4, concurrency=1).to_pandas()
    recall = 0.0
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall += len(e & a) / len(e)
    assert recall / 5 >= 0.8


def test_ivf_recall_on_sorted_corpus_random_sample(ray_session):
    """Corpus SORTED by cluster (worst case for prefix sampling): a
    seeded ds.random_sample-trained index must still reach >= 80%
    recall — a limit() prefix would train every centroid on cluster 0
    and collapse the partitioning (the q_emb_ivf_topk sampling path)."""
    import ray.data as rd

    from gdal_ray.stages.similarity import (cosine_topk, ivf_topk,
                                            train_centroids)

    rs = np.random.RandomState(3)
    centers = rs.normal(size=(8, 32)) * 4
    # sorted: all of cluster 0 first, then cluster 1, ...
    vecs = np.vstack([c + rs.normal(size=(100, 32)) for c in centers])
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs.astype(np.float64)),
                                        pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(8)
    # the query-level sampling recipe: seeded random_sample over ALL
    # blocks, capped
    samp = ds.random_sample(min(1.0, 512 / len(vecs)), seed=7) \
        .limit(256).to_pandas()
    sample = np.stack([np.asarray(v) for v in samp["embedding"]])
    cents = train_centroids(sample, 8)
    queries = vecs[rs.choice(len(vecs), 5, replace=False)] \
        + rs.normal(size=(5, 32)) * 0.1
    exact = cosine_topk(ds, queries, k=10, concurrency=1).to_pandas()
    approx = ivf_topk(ds, queries, cents, k=10, nprobe=4,
                      concurrency=1).to_pandas()
    recall = 0.0
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall += len(e & a) / len(e)
    assert recall / 5 >= 0.8


def test_colormap_rgba_tiles(ray_session):
    import struct
    import zlib as _z

    ds, _ = _points_ds(ray_session, n=300)
    tiles = tiling.render_tiles(ds, zoom=2)
    out = tiling.colormap_tiles(
        tiles, stops=[(0.0, (0, 0, 255)), (1.0, (255, 0, 0))]).to_pandas()
    png = out["png"].iloc[0]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR: 256x256, bit depth 8, color type 6 (RGBA)
    w, h, depth, ctype = struct.unpack(">IIBB", png[16:26])
    assert (w, h, depth, ctype) == (256, 256, 8, 6)
    # decode the IDAT and check nodata alpha / colored pixels
    idat_len = struct.unpack(">I", png[33:37])[0]
    raw = _z.decompress(png[41:41 + idat_len])
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(256, 4 * 256 + 1)
    rgba = rows[:, 1:].reshape(256, 256, 4)
    grid = np.frombuffer(_z.decompress(out.merge(
        tiling.render_tiles(ds, zoom=2).to_pandas(),
        on=["z", "x", "y"]).iloc[0]["raster"]), dtype=">u2") \
        .reshape(256, 256)
    assert (rgba[grid == 0, 3] == 0).all()       # nodata → alpha 0
    assert (rgba[grid > 0, 3] == 255).all()


def test_simhash_near_dup_pairs(ray_session):
    """Identical docs pair at Hamming 0; near docs (one token swap)
    pair within the threshold; unrelated docs don't pair."""
    import ray.data as rd

    from gdal_ray.stages.dedup import simhash_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("lazy", "sleepy")
    far = "completely different material on distributed arrow engines " * 6
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array([base, base, near, far])})
    out = simhash_near_dup_pairs(rd.from_arrow(t).repartition(2),
                                 max_hamming=12).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(out["key_a"], out["key_b"])}
    assert (1, 2) in pairs
    ham12 = int(out[(out["key_a"] == 1) & (out["key_b"] == 2)]
                ["hamming"].iloc[0])
    assert ham12 == 0
    assert not any(4 in p for p in pairs)


def test_select_expr_functions():
    """compile_select/select_batch: scalar-function + CAST coverage of
    the swq select-expr evaluator, checked against hand-computed rows."""
    import pyarrow as pa
    from gdal_ray.functions.expr import compile_select, select_batch

    t = pa.table({
        "event_id": [1, 22, 333],
        "event_type": ["click", "view", "purchase"],
        "value": [1.5, None, -3.75],
    })
    out = select_batch(
        t,
        "event_id, CAST(event_id % 7 + 1 AS BIGINT) AS w, "
        "UPPER(SUBSTR(event_type, 1, 3)) AS tag, "
        "LOWER(CONCAT('X', event_type)) AS lx, "
        "CAST(FLOOR(ABS(COALESCE(value, 0.0)) * 100.0 + 0.5) AS BIGINT)"
        " AS cents, "
        "ROUND(POWER(CAST(LENGTH(event_type) AS DOUBLE), 2), 0) AS l2, "
        "value * 2")
    d = out.to_pydict()
    assert d["event_id"] == [1, 22, 333]
    assert d["w"] == [2, 2, 5]
    assert d["tag"] == ["CLI", "VIE", "PUR"]
    assert d["lx"] == ["xclick", "xview", "xpurchase"]
    assert d["cents"] == [150, 0, 375]
    assert d["l2"] == [25.0, 16.0, 64.0]
    assert d["expr1"] == [3.0, None, -7.5]  # anonymous expression name
    # alias bookkeeping
    names = [n for n, _ in compile_select("a, b AS c, a + b")]
    assert names == ["a", "c", "expr1"]
    # errors: non-literal SUBSTR offset, unknown function
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compile_select("SUBSTR(event_type, event_id)")
    with _pytest.raises(ValueError):
        compile_select("NO_SUCH_FN(event_id)")


def test_select_expr_registry_step(ray_session):
    import ray.data as rd
    from gdal_ray.pipelines.registry import REGISTRY

    ds = rd.from_items([{"a": 1, "s": "ab"}, {"a": 2, "s": "cd"}])
    out = REGISTRY["select_expr"](
        ds, {"exprs": "a * 10 AS a10, UPPER(s) AS u"})
    d = out.to_pandas().sort_values("a10").reset_index(drop=True)
    assert list(d["a10"]) == [10, 20]
    assert list(d["u"]) == ["AB", "CD"]


def test_join_auto_paths_agree(ray_session):
    """join_auto: broadcast path (small side fits) and forced shuffle
    path (ceiling 0) produce identical joined rows."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.join import join_auto

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 21, 31], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "tag": pa.array(["b", "c", "d"])}))

    def rows(ds):
        d = ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        return list(map(tuple, d[["k", "v", "tag"]].itertuples(index=False)))

    bcast = rows(join_auto(left, right, keys="k", right_keys="rk"))
    shuf = rows(join_auto(left, right, keys="k", right_keys="rk",
                          broadcast_max_bytes=0))
    assert bcast == shuf
    assert len(bcast) == 5 and {t[2] for t in bcast} == {"b", "c", "d"}


def test_execute_sql_shapes(ray_session):
    """execute_sql: projection, DISTINCT, ORDER/LIMIT/OFFSET, grouped
    and global aggregates, plus clause/argument validation errors."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd
    from gdal_ray.functions.sql import execute_sql

    t = pa.table({
        "k": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
        "v": pa.array([10.0, 20.0, 5.0, 15.0, 25.0, 7.0]),
        "s": pa.array(["a", "a", "b", "b", "b", "c"]),
    })
    tables = {"t": rd.from_arrow(t).repartition(3)}

    g = execute_sql(
        "SELECT s, COUNT(*) AS n, SUM(CAST(v * 2.0 AS BIGINT)) AS sv "
        "FROM t GROUP BY s", tables).to_pandas() \
        .sort_values("s").reset_index(drop=True)
    assert list(g["s"]) == ["a", "b", "c"]
    assert list(g["n"]) == [2, 3, 1]
    assert list(g["sv"]) == [60, 90, 14]

    d = execute_sql("SELECT DISTINCT k FROM t WHERE v > 6.0", tables)
    assert sorted(d.to_pandas()["k"]) == [1, 2, 3]

    lo = execute_sql("SELECT k, v FROM t ORDER BY v DESC LIMIT 3 OFFSET 1",
                     tables)
    assert list(lo.to_pandas()["v"]) == [20.0, 15.0, 10.0]

    ga = execute_sql("SELECT COUNT(*) AS n, AVG(v) AS m, MIN(v) AS lo, "
                     "MAX(v) AS hi FROM t", tables).to_pandas()
    assert int(ga["n"][0]) == 6 and ga["lo"][0] == 5.0 and ga["hi"][0] == 25.0
    assert abs(ga["m"][0] - (82.0 / 6.0)) < 1e-12

    with _pytest.raises(ValueError):
        execute_sql("SELECT k FROM missing", tables)
    with _pytest.raises(ValueError):
        execute_sql("SELECT v FROM t GROUP BY k", tables)  # v not grouped
    with _pytest.raises(ValueError):
        execute_sql("SELECT COUNT(v) AS n FROM t", tables)  # COUNT(col)
    with _pytest.raises(ValueError):
        execute_sql("SELECT k FROM t OFFSET 2", tables)  # OFFSET sans LIMIT


def test_execute_sql_joins(ray_session):
    """FROM … [LEFT] JOIN … ON: inner drops unmatched, left keeps them
    with nulls; qualified alias.col names are stripped."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.functions.sql import execute_sql

    tables = {
        "t": rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([10, 20, 30, 40], pa.int64())})),
        "r": rd.from_arrow(pa.table({
            "rk": pa.array([2, 3], pa.int64()),
            "tag": pa.array(["b", "c"])})),
    }
    inner = execute_sql("SELECT t.k, r.tag FROM t JOIN r ON t.k = r.rk "
                        "ORDER BY k", tables).to_pandas()
    assert list(inner["k"]) == [2, 3] and list(inner["tag"]) == ["b", "c"]
    left = execute_sql("SELECT k, tag FROM t LEFT JOIN r ON k = rk "
                       "ORDER BY k", tables).to_pandas()
    assert list(left["k"]) == [1, 2, 3, 4]
    assert left["tag"].isna().tolist() == [True, False, False, True]
    agg = execute_sql("SELECT tag, SUM(v) AS sv FROM t JOIN r ON k = rk "
                      "GROUP BY tag ORDER BY tag", tables).to_pandas()
    assert list(agg["sv"]) == [20, 30]


def test_execute_sql_count_distinct_having(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.functions.sql import execute_sql

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b", "c"]),
        "u": pa.array([1, 1, 2, 3, 3, 4], pa.int64()),
    })
    tables = {"t": rd.from_arrow(t).repartition(3)}
    out = execute_sql(
        "SELECT g, COUNT(*) AS n, COUNT(DISTINCT u) AS nu FROM t "
        "GROUP BY g ORDER BY g", tables).to_pandas()
    assert list(out["n"]) == [3, 2, 1]
    assert list(out["nu"]) == [2, 1, 1]
    hv = execute_sql(
        "SELECT g, COUNT(*) AS n FROM t GROUP BY g HAVING n >= 2 "
        "ORDER BY g", tables).to_pandas()
    assert list(hv["g"]) == ["a", "b"]
    glob = execute_sql("SELECT COUNT(DISTINCT u) AS nu FROM t",
                       tables).to_pandas()
    assert int(glob["nu"][0]) == 4


def test_execute_sql_union_all(ray_session):
    """UNION ALL concatenates members; trailing ORDER BY/LIMIT applies
    to the whole union."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.functions.sql import execute_sql

    tables = {
        "p": rd.from_arrow(pa.table({"k": pa.array([1, 3], pa.int64())})),
        "q": rd.from_arrow(pa.table({"k": pa.array([2, 4], pa.int64())})),
    }
    out = execute_sql("SELECT k FROM p UNION ALL SELECT k FROM q "
                      "ORDER BY k DESC LIMIT 3", tables).to_pandas()
    assert list(out["k"]) == [4, 3, 2]
    # duplicates preserved (ALL semantics)
    dup = execute_sql("SELECT k FROM p UNION ALL SELECT k FROM p",
                      tables).to_pandas()
    assert sorted(dup["k"]) == [1, 1, 3, 3]


def test_execute_sql_advice_fixes(ray_session):
    """Round-3 ADVICE regressions: NULL-excluding COUNT(DISTINCT),
    qualifier stripping skips string literals, SUM(a)+SUM(b) gets an
    explicit error, FROM (SELECT ...) subqueries recurse."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd
    from gdal_ray.functions.sql import execute_sql

    t = pa.table({
        "g": pa.array(["a", "a", "b", "b"]),
        "u": pa.array([1, None, None, None], pa.int64()),
        "tag": pa.array(["t.high", "low", "t.high", "low"]),
        "v": pa.array([10, 20, 30, 40], pa.int64()),
    })
    tables = {"t": rd.from_arrow(t).repartition(2)}

    # COUNT(DISTINCT u) must NOT count the NULL group ('b' has only
    # NULLs → 0, like SQL)
    out = execute_sql("SELECT g, COUNT(DISTINCT u) AS nu FROM t "
                      "GROUP BY g ORDER BY g", tables).to_pandas()
    assert list(out["nu"]) == [1, 0]

    # 't.' inside a string literal must survive qualifier stripping
    lit = execute_sql("SELECT t.v FROM t WHERE t.tag = 't.high' "
                      "ORDER BY v", tables).to_pandas()
    assert list(lit["v"]) == [10, 30]

    # expression over aggregates → explicit unsupported error
    with _pytest.raises(ValueError, match="aggregate"):
        execute_sql("SELECT SUM(v) + SUM(u) AS s FROM t", tables)

    # derived table: aggregate over a subquery's projection
    sub = execute_sql(
        "SELECT g, SUM(dv) AS s FROM "
        "(SELECT g, v * CAST(2 AS BIGINT) AS dv FROM t WHERE v > 10) q "
        "GROUP BY g ORDER BY g", tables).to_pandas()
    assert list(sub["g"]) == ["a", "b"] and list(sub["s"]) == [40, 140]
    # subquery containing a JOIN keyword inside (must not split outer)
    j = execute_sql("SELECT COUNT(*) AS n FROM "
                    "(SELECT v FROM t WHERE tag = 'low') q", tables)
    assert int(j.to_pandas()["n"][0]) == 2


def test_jaccard_similarity_join_exact(ray_session):
    """Inverted-index exact Jaccard join vs a brute-force recompute;
    fence raises beyond max_rows."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd
    from gdal_ray.stages.dedup import jaccard_similarity_join

    docs = [
        (0, "a b c d e f"),
        (1, "a b c d e f"),           # exact dup of 0
        (2, "a b c d e g"),           # near dup of 0
        (3, "x y z w q r"),           # unrelated
        (4, "x y z w q s"),           # near dup of 3
    ]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs])})
    out = jaccard_similarity_join(rd.from_arrow(t).repartition(2),
                                  threshold=0.3).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(out["key_a"], out["key_b"], out["jaccard_q6"])}

    def jac(s1, s2):
        g1 = {" ".join(s1.split()[i:i + 3])
              for i in range(len(s1.split()) - 2)}
        g2 = {" ".join(s2.split()[i:i + 3])
              for i in range(len(s2.split()) - 2)}
        return len(g1 & g2) / len(g1 | g2)

    expect = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            v = jac(docs[i][1], docs[j][1])
            if v >= 0.3:
                expect[(docs[i][0], docs[j][0])] = int(
                    np.floor(v * 1e6 + 0.5))
    assert got == expect
    assert got[(0, 1)] == 1_000_000  # exact dup
    with _pytest.raises(ValueError):
        jaccard_similarity_join(rd.from_arrow(t), max_rows=2)


def test_cell_coverage_exact():
    """Fractional coverage: clipped-cell areas reproduce closed-form
    polygon areas exactly (boxes, diamond, holes)."""
    import numpy as np
    from gdal_ray.stages.zonal import cell_coverage

    gt = (-180.0, 2.5, 90.0, -2.5)
    r = 40.0025
    diamond = np.array([(r, 0.0), (0.0, r), (-r, 0.0), (0.0, -r),
                        (r, 0.0)])
    py, px, fr = cell_coverage([(1.0, diamond)], gt, 144, 72)
    assert abs(fr.sum() * 6.25 - 2 * r * r) < 1e-9
    assert fr.max() <= 1.0 + 1e-12 and fr.min() > 0.0

    box = np.array([(-10.0, -5.0), (7.5, -5.0), (7.5, 5.0),
                    (-10.0, 5.0), (-10.0, -5.0)])
    hole = np.array([(-5.0, -2.5), (-5.0, 2.5), (0.0, 2.5),
                     (0.0, -2.5), (-5.0, -2.5)])
    _, _, fr2 = cell_coverage([(1.0, box), (-1.0, hole)], gt, 144, 72)
    assert abs(fr2.sum() * 6.25 - (175.0 - 25.0)) < 1e-9
    # clipping at the grid edge: west-overhanging box only counts the
    # on-grid part
    over = np.array([(-185.0, 0.0), (-177.5, 0.0), (-177.5, 2.5),
                     (-185.0, 2.5), (-185.0, 0.0)])
    _, pxs, fr3 = cell_coverage([(1.0, over)], gt, 144, 72)
    assert pxs.min() == 0 and abs(fr3.sum() * 6.25 - 2.5 * 2.5) < 1e-12


def test_st_functions_in_expressions(ray_session):
    """ST_* geometry scalar UDFs compose into dataset-expression
    projections and the SQL executor (SQLite-dialect tier)."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd
    from gdal_ray.functions.expr import select_batch
    from gdal_ray.functions.sql import execute_sql
    from gdal_ray.geom import wkb as _wkb

    t = pa.table({
        "gid": pa.array([1, 2], pa.int64()),
        "geometry": pa.array([_wkb.encode_point(3.5, -2.0),
                              _wkb.encode_point(-10.0, 45.0)],
                             pa.binary()),
    })
    out = select_batch(t, "gid, ST_X(geometry) AS x, "
                          "ST_Y(geometry) AS y")
    assert out["x"].to_pylist() == [3.5, -10.0]
    assert out["y"].to_pylist() == [-2.0, 45.0]

    zt = pa.table({
        "gid": pa.array([1], pa.int64()),
        "geometry": pa.array([_wkb.box_polygon(0, 0, 4, 3)],
                             pa.binary()),
    })
    res = execute_sql(
        "SELECT gid, ST_AREA(geometry) AS a, "
        "ST_NPOINTS(geometry) AS n, ST_ISVALID(geometry) AS ok "
        "FROM t WHERE ST_AREA(geometry) > 10.0",
        {"t": rd.from_arrow(zt)}).to_pandas()
    assert list(res["a"]) == [12.0] and list(res["n"]) == [5]
    assert bool(res["ok"][0])
    with _pytest.raises(ValueError):
        select_batch(t, "ST_AREA(geometry, 2)")


def test_sessionize_gap_semantics(ray_session):
    """Gap sessionization: strict > gap splits, exact gap and ties do
    not; per-key session_idx counts from 0 in time order."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.sessionize import sessionize

    base = 1_700_000_000
    rows = [
        # user 1: [0, 5, 5, 15] gap10 -> one session (dt 10 == gap)
        (1, 0), (1, 5), (1, 5), (1, 15),
        # then 26 -> new session (dt 11 > 10)
        (1, 26), (1, 30),
        # user 2: single event
        (2, 100),
        # user 3: three sessions
        (3, 0), (3, 50), (3, 200),
    ]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([(base + s) * 1_000_000 for _, s in rows],
                       pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(t).repartition(3), "user_id", "ts",
                     gap_s=10.0, n_buckets=4).to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    got = [(r.user_id, r.session_idx, r.n_events,
            r.t_start - base, r.t_end - base)
           for r in out.itertuples()]
    assert got == [
        (1, 0, 4, 0, 15), (1, 1, 2, 26, 30),
        (2, 0, 1, 100, 100),
        (3, 0, 1, 0, 0), (3, 1, 1, 50, 50), (3, 2, 1, 200, 200),
    ]


def test_sessionize_string_keys(ray_session):
    """String key columns go through pandas hash_pandas_object's
    hash_key path, which requires a 16-byte key — regression for the
    15-byte key that raised ValueError on any string-keyed stream."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.sessionize import sessionize

    base = 1_700_000_000
    rows = [("alice", 0), ("alice", 5), ("alice", 40),
            ("bob", 7), ("bob", 100)]
    t = pa.table({
        "user": pa.array([u for u, _ in rows], pa.string()),
        "ts": pa.array([(base + s) * 1_000_000 for _, s in rows],
                       pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(t).repartition(2), "user", "ts",
                     gap_s=10.0, n_buckets=4).to_pandas() \
        .sort_values(["user", "session_idx"]).reset_index(drop=True)
    got = [(r.user, r.session_idx, r.n_events, r.t_start - base)
           for r in out.itertuples()]
    assert got == [("alice", 0, 2, 0), ("alice", 1, 1, 40),
                   ("bob", 0, 1, 7), ("bob", 1, 1, 100)]


def test_asof_join_broadcast(ray_session):
    """Backward as-of: latest right row at-or-before, per group; no
    candidate or unknown group → null (DuckDB ASOF LEFT semantics)."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.join import asof_join_broadcast

    left = pa.table({
        "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "g": pa.array([0, 0, 0, 1, 9], pa.int64()),
        "t": pa.array([5, 50, 90, 100, 100], pa.int64()),
    })
    right = pa.table({
        "g": pa.array([0, 0, 1], pa.int64()),
        "rt": pa.array([50, 90, 200], pa.int64()),
        "v": pa.array([7.0, 8.0, 9.0]),
    })
    out = asof_join_broadcast(rd.from_arrow(left).repartition(2),
                              right, on="t", by="g", right_on="rt") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    import numpy as np
    assert np.isnan(out["v"][0])       # t=5 before first rate
    assert out["v"][1] == 7.0          # exact boundary matches (>=)
    assert out["v"][2] == 8.0
    assert np.isnan(out["v"][3])       # group 1 rate is in the future
    assert np.isnan(out["v"][4])       # unknown group


def test_asof_join_preserves_int64_values(ray_session):
    """Value columns keep their dtype through the as-of join — the
    float64 working buffer silently corrupted int64 beyond 2^53
    (r4 verdict item 8)."""
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.join import asof_join_broadcast

    big = (1 << 53) + 1  # not representable in float64
    left = pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "g": pa.array([0, 0], pa.int64()),
        "t": pa.array([10, 3], pa.int64()),
    })
    right = pa.table({
        "g": pa.array([0], pa.int64()),
        "rt": pa.array([5], pa.int64()),
        "v": pa.array([big], pa.int64()),
    })
    out = asof_join_broadcast(rd.from_arrow(left), right,
                              on="t", by="g", right_on="rt") \
        .take_batch(10, batch_format="pyarrow")
    out = out.sort_by("id")
    assert out.schema.field("v").type == pa.int64()
    assert out["v"][0].as_py() == big      # exact — no float64 pass
    assert out["v"][1].as_py() is None     # t=3 before first rate


def test_st_tier2_functions(ray_session):
    """ST_DISTANCE / ST_INTERSECTS / ST_CONTAINS / ST_BUFFER compose
    through the expression layer (SQLite-dialect tier 2)."""
    import numpy as np
    import pyarrow as pa
    from gdal_ray.functions.expr import select_batch
    from gdal_ray.geom import wkb as _wkb

    t = pa.table({
        "geometry": pa.array([_wkb.box_polygon(0, 0, 10, 10),
                              _wkb.box_polygon(20, 20, 30, 30)],
                             pa.binary()),
        "probe": pa.array([_wkb.encode_point(5.0, 5.0)] * 2,
                          pa.binary()),
        "line": pa.array([_wkb.encode_linestring([(-5, 5), (15, 5)])] * 2,
                         pa.binary()),
    })
    out = select_batch(
        t, "ST_DISTANCE(geometry, probe) AS d, "
           "ST_INTERSECTS(geometry, probe) AS i, "
           "ST_INTERSECTS(geometry, line) AS il, "
           "ST_CONTAINS(geometry, probe) AS c, "
           "ST_CONTAINS(geometry, line) AS cl, "
           "ST_AREA(ST_BUFFER(probe, 2.0)) AS ba").to_pydict()
    assert out["d"][0] == 0.0
    assert out["d"][1] == float(np.hypot(15.0, 15.0))
    assert out["i"] == [True, False]
    assert out["il"] == [True, False]  # line crosses box 1 only
    assert out["c"] == [True, False]
    assert out["cl"] == [False, False]  # line exits the box
    assert abs(out["ba"][0] - 60 * 4.0 * np.sin(np.pi / 60)) < 1e-12
    # boundary point: intersects but NOT contained (OGC)
    t2 = pa.table({
        "geometry": pa.array([_wkb.box_polygon(0, 0, 10, 10)],
                             pa.binary()),
        "probe": pa.array([_wkb.encode_point(0.0, 5.0)], pa.binary()),
    })
    out2 = select_batch(t2, "ST_INTERSECTS(geometry, probe) AS i, "
                            "ST_CONTAINS(geometry, probe) AS c")
    assert out2.to_pydict() == {"i": [True], "c": [False]}


def test_st_tier3_measures(ray_session):
    """ST_LENGTH / ST_PERIMETER / ST_ENVELOPE / ST_GEOMETRYTYPE /
    ST_ASTEXT (spatialite-tier breadth)."""
    import pyarrow as pa
    from gdal_ray.functions.expr import select_batch
    from gdal_ray.geom import wkb as _wkb

    t = pa.table({
        "g": pa.array([_wkb.box_polygon(1, 2, 4, 6)], pa.binary()),
        "l": pa.array([_wkb.encode_linestring([(0, 0), (3, 4),
                                               (3, 10)])], pa.binary()),
        "p": pa.array([_wkb.encode_point(2.5, -1.0)], pa.binary()),
    })
    out = select_batch(
        t, "ST_LENGTH(l) AS ll, ST_LENGTH(g) AS lg, "
           "ST_PERIMETER(g) AS pg, ST_PERIMETER(l) AS pl, "
           "ST_AREA(ST_ENVELOPE(l)) AS ea, "
           "ST_GEOMETRYTYPE(g) AS tg, ST_GEOMETRYTYPE(p) AS tp, "
           "ST_ASTEXT(p) AS wp").to_pydict()
    assert out["ll"] == [11.0]      # 5 + 6
    assert out["lg"] == [0.0]       # polygons have no curve length
    assert out["pg"] == [14.0]      # 2*(3+4)
    assert out["pl"] == [0.0]
    assert out["ea"] == [30.0]      # envelope of the line: 3 x 10
    assert out["tg"] == ["POLYGON"] and out["tp"] == ["POINT"]
    assert out["wp"] == ["POINT (2.5 -1)"]


def test_st_centroid_composition(ray_session):
    import pyarrow as pa
    from gdal_ray.functions.expr import select_batch
    from gdal_ray.geom import wkb as _wkb

    t = pa.table({"geometry": pa.array([_wkb.box_polygon(2, 4, 6, 10)],
                                       pa.binary())})
    out = select_batch(t, "ST_X(ST_CENTROID(geometry)) AS cx, "
                          "ST_Y(ST_CENTROID(geometry)) AS cy, "
                          "ST_NPOINTS(ST_CENTROID(geometry)) AS n")
    assert out.to_pydict() == {"cx": [4.0], "cy": [7.0], "n": [1]}


def test_lag_deltas_exact_stats(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.sessionize import lag_deltas

    us = 1_000_000
    rows = [
        # user 1: gaps 10s, 2h, 0s (tie broken by event_id)
        (1, 0, 1), (1, 10 * us, 2), (1, 10 * us + 7200 * us, 3),
        (1, 10 * us + 7200 * us, 4),
        # user 2: single event -> excluded
        (2, 50 * us, 5),
        # user 3: two events 1 day + 5 us apart (mod check)
        (3, 0, 6), (3, 86_400_000_005, 7),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
    })
    out = lag_deltas(rd.from_arrow(t).repartition(3), "user_id", "ts",
                     "event_id").to_pandas() \
        .set_index("user_id").sort_index()
    assert list(out.index) == [1, 3]
    u1 = out.loc[1]
    assert u1["n_deltas"] == 3
    assert u1["max_gap_us"] == 7200 * us
    assert u1["n_gaps_over"] == 1
    assert u1["gap_mod_sum"] == 10 * us + 7200 * us + 0
    u3 = out.loc[3]
    assert u3["n_deltas"] == 1
    assert u3["max_gap_us"] == 86_400_000_005
    assert u3["n_gaps_over"] == 1
    assert u3["gap_mod_sum"] == 5  # 1 day + 5 us, mod 1 day


def test_grouped_quantiles_match_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.aggregate import grouped_quantiles

    rs = np.random.RandomState(11)
    # float values, all distinct (lossless histogram), odd + even n
    ks = np.repeat(["a", "b", "c"], [101, 200, 7])
    vs = np.round(rs.uniform(0, 100, len(ks)), 3)
    t = pa.table({"k": pa.array(ks), "v": pa.array(vs)})
    out = grouped_quantiles(rd.from_arrow(t).repartition(5), "k", "v",
                            q=0.9).to_pandas().set_index("k")
    con = duckdb.connect()
    con.register("t", t)
    ref = con.execute(
        "SELECT k, count(*) n, median(v) m, quantile_cont(v, 0.9) q "
        "FROM t GROUP BY k").df().set_index("k")
    for k in ("a", "b", "c"):
        assert out.loc[k, "n"] == ref.loc[k, "n"]
        assert abs(out.loc[k, "median_v"] - ref.loc[k, "m"]) < 1e-9
        assert abs(out.loc[k, "quantile_v"] - ref.loc[k, "q"]) < 1e-9


def test_overview_modes_kernels(ray_session):
    import zlib
    import numpy as np
    import ray.data as rd
    from gdal_ray.stages.tiling import overview_level

    g = np.zeros((256, 256), np.int64)
    # block (0,0): [5,2,2,9] -> mode 2 (2nd occurrence first), min 2,
    # max 9, rms floor(sqrt((25+4+4+81)/4)+.5)=floor(5.33+.5)=5
    g[0, 0], g[0, 1], g[1, 0], g[1, 1] = 5, 2, 2, 9
    # block (1,0): all distinct [1,2,3,4] -> mode keeps first (1)
    g[0, 2], g[0, 3], g[1, 2], g[1, 3] = 1, 2, 3, 4
    # block (2,0): [7,3,7,3] -> 7 reaches count 2 first
    g[0, 4], g[0, 5], g[1, 4], g[1, 5] = 7, 3, 7, 3
    tds = rd.from_items([{"z": 3, "x": 0, "y": 0, "n_pages": 1,
                          "raster": zlib.compress(
                              g.astype(">u2").tobytes(), 6)}])
    out = overview_level(tds, resampling=["min", "max", "rms",
                                          "mode"]).to_pandas()
    assert sorted(out["method"]) == ["max", "min", "mode", "rms"]
    got = {}
    for _, row in out.iterrows():
        d = np.frombuffer(zlib.decompress(row["raster"]),
                          dtype=">u2").reshape(256, 256)
        got[row["method"]] = d
    assert got["min"][0, 0] == 2 and got["max"][0, 0] == 9
    assert got["rms"][0, 0] == 5
    assert got["mode"][0, 0] == 2
    assert got["mode"][0, 1] == 1
    assert got["mode"][0, 2] == 7


def test_lineref_locate_and_mileposts(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.lineref import (create_mileposts, line_locate)

    line = [(0.0, 0.0), (10.0, 0.0), (10.0, 5.0)]
    pts = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lon": pa.array([2.0, 10.0, 11.0, 12.0], pa.float64()),
        "lat": pa.array([1.0, -1.0, 2.0, 7.0], pa.float64()),
    })
    out = line_locate(rd.from_arrow(pts), line).to_pandas() \
        .set_index("event_id").sort_index()
    # point 0: on segment 0 at x=2, offset 1
    assert out.loc[0, "seg"] == 0
    assert abs(out.loc[0, "measure"] - 2.0) < 1e-12
    assert abs(out.loc[0, "line_dist"] - 1.0) < 1e-12
    # point 1: exactly at the shared vertex region -> tie goes to seg 0
    assert out.loc[1, "seg"] == 0
    assert abs(out.loc[1, "measure"] - 10.0) < 1e-12
    # point 2: beside segment 1
    assert out.loc[2, "seg"] == 1
    assert abs(out.loc[2, "measure"] - 12.0) < 1e-12
    # point 3: past the end -> clamped to the line end
    assert out.loc[3, "seg"] == 1
    assert abs(out.loc[3, "measure"] - 15.0) < 1e-12

    mp = create_mileposts(line, 4.0)
    assert [m["measure"] for m in mp] == [0.0, 4.0, 8.0, 12.0]
    assert mp[3]["x"] == 10.0 and abs(mp[3]["y"] - 2.0) < 1e-12


def test_cap_per_group_rule(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.functions.text import cap_per_group

    t = pa.table({
        "grp": pa.array(["a"] * 7 + ["b"] * 2 + ["c"] * 3),
        "doc_id": pa.array([9, 3, 5, 1, 7, 2, 8, 10, 4, 6, 0, 11],
                           pa.int64()),
    })
    out = cap_per_group(rd.from_arrow(t).repartition(4), "grp",
                        "doc_id", 3).to_pandas()
    by = out.groupby("grp")["doc_id"].apply(sorted).to_dict()
    assert by["a"] == [1, 2, 3]     # 3 smallest ids of 7
    assert by["b"] == [4, 10]       # under the cap: all kept
    assert by["c"] == [0, 6, 11]


def test_jaccard_verify_both_paths_agree(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.dedup import jaccard_verify_pairs

    docs = rd.from_items([
        {"doc_id": 1, "text": "the quick brown fox jumps over"},
        {"doc_id": 2, "text": "the quick brown fox jumps high"},
        {"doc_id": 3, "text": "completely different content here"},
        {"doc_id": 4, "text": "the quick brown fox jumps over"},
    ])
    pairs = rd.from_arrow(pa.table({
        "key_a": pa.array([1, 1, 2], pa.int64()),
        "key_b": pa.array([2, 4, 3], pa.int64()),
    }))
    fast = jaccard_verify_pairs(docs, pairs, threshold=0.3) \
        .to_pandas().sort_values(["key_a", "key_b"]) \
        .reset_index(drop=True)
    dist = jaccard_verify_pairs(docs, pairs, threshold=0.3,
                                broadcast_max_pairs=0) \
        .to_pandas().sort_values(["key_a", "key_b"]) \
        .reset_index(drop=True)
    assert fast.equals(dist)
    assert fast.loc[fast.key_a.eq(1) & fast.key_b.eq(4),
                    "jaccard"].iloc[0] == 1.0


def test_user_tracks_antimeridian_wrap(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.stages.sessionize import user_tracks

    us = 1_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, us, 2 * us, 0], pa.timestamp("us")),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lon": pa.array([170.0, -175.0, -170.0, 0.0], pa.float64()),
        "lat": pa.array([0.0, 0.0, 3.0, 0.0], pa.float64()),
    })
    out = user_tracks(rd.from_arrow(t).repartition(2), "user_id",
                      "ts", "event_id").to_pandas() \
        .set_index("user_id").sort_index()
    u1 = out.loc[1]
    # 170 -> -175 wraps: dlon = +15 (not -345); then 5 deg + 3 deg
    assert abs(u1["track_len"] - (15.0 + np.sqrt(25.0 + 9.0))) < 1e-9
    assert u1["n_points"] == 3 and u1["n_segments"] == 2
    assert u1["min_lon"] == -175.0 and u1["max_lon"] == 170.0
    u2 = out.loc[2]
    assert u2["n_segments"] == 0 and u2["track_len"] == 0.0
