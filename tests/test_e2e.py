"""End-to-end pipeline tests: flagship chain, the per-url byte-identity
invariant (BASELINE.json input_hint), and dual-parallelism determinism
(SURVEY.md §5 oracle d)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.pipelines.flagship import flagship
from gdal_ray.sources import pages as _pages

N_PAGES = 3000


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    _pages.write_pages_parquet(str(d), N_PAGES, rows_per_file=1000)
    return str(d)


def test_fixture_dup_urls_have_identical_text(pages_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(pages_dir).to_pandas()
    assert len(t) == N_PAGES
    by_url = t.groupby("url")["text"].nunique()
    assert (by_url == 1).all()  # byte-identical text per url
    assert (t.groupby("url").size() > 1).any()  # dups exist


def test_flagship_join_and_tiles(ray_session, pages_dir):
    joined, tiles = flagship(pages_dir, zooms=(4, 6))
    jdf = joined.to_pandas()
    n_unique_urls = 3000 - 29  # 1% dup rule: ids 199,299,... <3000
    # every joined row keeps its page fields + polygon fields
    for c in ("url", "text", "lat", "lon", "cell", "poly_id", "name"):
        assert c in jdf.columns
    # urban boxes catch the hot-cell pages: ~80% of pages are hot and
    # hot pages always fall inside their ±0.05° urban box
    assert len(jdf) > 0.5 * n_unique_urls
    # text byte-identity survives the full chain
    src = {u: t for u, t in zip(jdf["url"], jdf["text"])}
    ids = [int(u.rsplit("/", 1)[1]) for u in jdf["url"]]
    for (u, t), i in zip(src.items(), ids):
        assert f"page {i} " in t
    tdf = tiles.to_pandas()
    assert set(tdf["z"]) == {4, 6}
    # per-zoom conservation: every join row lands in exactly one tile
    assert (tdf[tdf["z"] == 4]["n_pages"].sum()
            == tdf[tdf["z"] == 6]["n_pages"].sum() == len(jdf))


def test_dedup_earliest_wins_e2e(ray_session, pages_dir):
    joined, _ = flagship(pages_dir, zooms=(4,))
    jdf = joined.to_pandas()
    # duplicate urls (i%100==99 duplicates i-99) arrive later; dedup
    # must keep the ORIGINAL warc_ts = EPOCH + orig_id*1000
    dup_urls = [f"https://site{i % 1000}.example/page/{i}"
                for i in range(99, N_PAGES - 99, 100)]
    present = jdf[jdf["url"].isin(dup_urls)]
    for _, row in present.iterrows():
        orig_id = int(row["url"].rsplit("/", 1)[1])
        expect_ms = _pages.EPOCH_MS + orig_id * 1000
        assert int(row["warc_ts"].value // 10**6) == expect_ms


def test_parallelism_determinism(ray_session, pages_dir):
    """Same bytes at parallelism 1 and 8 (canonical sort before compare;
    SURVEY.md §4 ordering row)."""
    outs = []
    for par in (1, 8):
        joined, tiles = flagship(pages_dir, zooms=(5,), parallelism=par)
        jdf = joined.to_pandas().sort_values(["url", "poly_id"]) \
            .reset_index(drop=True)
        tdf = tiles.to_pandas().sort_values(["z", "x", "y"]) \
            .reset_index(drop=True)
        outs.append((jdf, tdf))
    pd.testing.assert_frame_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])


def test_entry_contract(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    res = em.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) >= 0 and len(df.columns) > 0
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles) <= set(qs)  # every oracle key has a query
    assert len(qs) >= 30
