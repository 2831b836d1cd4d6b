"""Distributed connected components (hash-to-min) over pair Datasets —
the near-dedup cluster-collapse path (no driver union-find)."""

import numpy as np
import pyarrow as pa

from gdal_ray.stages.dedup import connected_components, near_dup_dedup


def _labels(pairs, **kw):
    import ray.data as rd

    t = pa.table({"key_a": pa.array([a for a, _ in pairs], pa.int64()),
                  "key_b": pa.array([b for _, b in pairs], pa.int64())})
    out = connected_components(rd.from_arrow(t).repartition(3),
                               **kw).to_pandas()
    return dict(zip(out["key"], out["label"]))


def test_cc_two_components(ray_session):
    for dl in (5_000_000, 0):  # driver-vectorized AND distributed
        lbl = _labels([(1, 2), (2, 3), (10, 11), (5, 3)],
                      driver_limit=dl)
        assert lbl == {1: 1, 2: 1, 3: 1, 5: 1, 10: 10, 11: 10}


def test_cc_long_chain(ray_session):
    """A path graph (worst-case diameter) converges in O(log d)
    rounds — the hash-to-min guarantee the hot-bucket star/chain
    emission relies on — on both dispatch paths."""
    n = 200
    for dl in (5_000_000, 0):
        lbl = _labels([(i, i + 1) for i in range(n)], driver_limit=dl)
        assert set(lbl.values()) == {0}
        assert len(lbl) == n + 1


def test_cc_string_keys(ray_session):
    import ray.data as rd

    t = pa.table({"key_a": pa.array(["u3", "u1"]),
                  "key_b": pa.array(["u2", "u2"])})
    for dl in (5_000_000, 0):
        out = connected_components(rd.from_arrow(t),
                                   driver_limit=dl).to_pandas()
        assert dict(zip(out["key"], out["label"])) == \
            {"u1": "u1", "u2": "u1", "u3": "u1"}


def test_cc_million_pairs_no_driver_dicts(ray_session):
    """10^6 synthetic pairs: mixture of stars (mass-duplicate
    boilerplate clusters) and 64-long chains (the capped hot-bucket
    emission shape).  Completes via bucketed exchanges only — the
    driver never holds a per-pair dict."""
    import ray.data as rd

    ka, kb = [], []
    # 15000 stars of width 64 (~960k pairs)
    base = np.arange(15000, dtype=np.int64) * 1000
    for off in range(1, 65):
        ka.append(base)
        kb.append(base + off)
    # 625 chains of length 64 (~40k pairs), disjoint id space
    cbase = 100_000_000 + np.arange(625, dtype=np.int64) * 1000
    for off in range(63):
        ka.append(cbase + off)
        kb.append(cbase + off + 1)
    t = pa.table({"key_a": pa.array(np.concatenate(ka)),
                  "key_b": pa.array(np.concatenate(kb))})
    assert len(t) == 15000 * 64 + 625 * 63
    # driver_limit=0 forces the DISTRIBUTED rounds (the 100-TB path)
    labels = connected_components(rd.from_arrow(t).repartition(8),
                                  driver_limit=0)
    out = labels.to_pandas()
    assert len(out) == 15000 * 65 + 625 * 64
    # every star member labeled by its hub; every chain by its head
    star = out[out["key"] < 100_000_000]
    assert (star["label"].values == (star["key"].values // 1000) * 1000).all()
    chain = out[out["key"] >= 100_000_000]
    assert (chain["label"].values ==
            ((chain["key"].values - 100_000_000) // 1000) * 1000
            + 100_000_000).all()


def test_near_dup_dedup_anti_join_path(ray_session):
    """broadcast_limit=0 forces the bucketed anti-join branch; result
    must equal the broadcast branch."""
    import ray.data as rd

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(20, dtype=np.int64)),
        "text": pa.array([f"doc {i}" for i in range(20)]),
    })).repartition(3)
    pairs = rd.from_arrow(pa.table({
        "key_a": pa.array([1, 2, 7], pa.int64()),
        "key_b": pa.array([2, 3, 9], pa.int64()),
    }))
    kept_b = near_dup_dedup(docs, pairs).to_pandas()
    kept_a = near_dup_dedup(docs, pairs, broadcast_limit=0).to_pandas()
    exp = sorted(set(range(20)) - {2, 3, 9})
    assert sorted(kept_b["doc_id"]) == exp
    assert sorted(kept_a["doc_id"]) == exp
    assert sorted(kept_a.columns) == sorted(kept_b.columns)
