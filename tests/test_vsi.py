"""VSI-analog retry filesystem: flaky reads succeed within the retry
budget, exhaust beyond it, and ray.data.read_parquet streams through
the wrapper."""

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq
import pytest

from gdal_ray.sources.vsi import (RetryHandler, read_parquet_retry,
                                  retry_filesystem)


class FlakyHandler(pafs.FileSystemHandler):
    """Local FS that fails the first ``fail_n`` open/info calls per
    path with OSError (the transient-HTTP-error stand-in)."""

    def __init__(self, fail_n: int):
        self.base = pafs.LocalFileSystem()
        self.fail_n = fail_n
        self.counts: dict = {}

    def _maybe_fail(self, op, path):
        k = (op, str(path))
        self.counts[k] = self.counts.get(k, 0) + 1
        if self.counts[k] <= self.fail_n:
            raise OSError(f"transient failure {self.counts[k]} on {k}")

    def get_type_name(self):
        return "flaky"

    def get_file_info(self, paths):
        return self.base.get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self.base.get_file_info(selector)

    def open_input_file(self, path):
        self._maybe_fail("open_input_file", path)
        return self.base.open_input_file(path)

    def open_input_stream(self, path):
        self._maybe_fail("open_input_stream", path)
        return self.base.open_input_stream(path)

    def normalize_path(self, path):
        return self.base.normalize_path(path)

    def create_dir(self, path, recursive):
        self.base.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self.base.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self.base.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        pass

    def delete_file(self, path):
        self.base.delete_file(path)

    def move(self, src, dest):
        self.base.move(src, dest)

    def copy_file(self, src, dest):
        self.base.copy_file(src, dest)

    def open_output_stream(self, path, metadata):
        return self.base.open_output_stream(path, metadata=metadata)

    def open_append_stream(self, path, metadata):
        return self.base.open_append_stream(path, metadata=metadata)


def _write_fixture(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": list(range(100))}), p)
    return p


def test_retry_recovers_within_budget(tmp_path):
    p = _write_fixture(tmp_path)
    flaky = pafs.PyFileSystem(FlakyHandler(fail_n=2))
    fs = pafs.PyFileSystem(RetryHandler(flaky, max_retry=3,
                                        retry_delay=0.001))
    t = pq.read_table(p, filesystem=fs)
    assert t.num_rows == 100


def test_retry_exhausts_beyond_budget(tmp_path):
    p = _write_fixture(tmp_path)
    flaky = pafs.PyFileSystem(FlakyHandler(fail_n=10))
    fs = pafs.PyFileSystem(RetryHandler(flaky, max_retry=2,
                                        retry_delay=0.001))
    with pytest.raises(OSError):
        pq.read_table(p, filesystem=fs)


def test_retry_backoff_counts(tmp_path):
    p = _write_fixture(tmp_path)
    h = FlakyHandler(fail_n=2)
    fs = pafs.PyFileSystem(RetryHandler(pafs.PyFileSystem(h),
                                        max_retry=3, retry_delay=0.001))
    with fs.open_input_file(p) as f:
        f.read(4)
    # exactly fail_n failures + 1 success on the retried op
    assert h.counts[("open_input_file", p)] == 3


def test_read_parquet_retry_streams(tmp_path, ray_session):
    # FlakyHandler lives in this test module, which Ray workers can't
    # import — ship it by value (the engine's own pickle contract,
    # see __ray_entry__.py)
    import sys

    import ray.cloudpickle as rcp
    rcp.register_pickle_by_value(sys.modules[__name__])
    p = _write_fixture(tmp_path)
    flaky = pafs.PyFileSystem(FlakyHandler(fail_n=1))
    ds = read_parquet_retry(p, filesystem=flaky, max_retry=3,
                            retry_delay=0.001)
    assert ds.count() == 100
    # default wrapper over the local fs also streams
    ds2 = read_parquet_retry(p)
    assert ds2.count() == 100


def test_retry_filesystem_passthrough_writes(tmp_path):
    fs = retry_filesystem(max_retry=1, retry_delay=0.001)
    out = str(tmp_path / "w.parquet")
    pq.write_table(pa.table({"b": [1, 2]}), out, filesystem=fs)
    assert pq.read_table(out, filesystem=fs).num_rows == 2


def test_cached_filesystem_read_through(tmp_path):
    """VSI cache layer: second read of the same file is served fully
    from the LRU (zero new base reads), bytes identical."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from gdal_ray.sources.vsi import cached_filesystem

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": np.arange(50000),
                             "b": np.random.rand(50000)}), p)
    fs, handler = cached_filesystem()
    t1 = pq.read_table(p, filesystem=fs)
    misses_after_first = handler.cache.misses
    t2 = pq.read_table(p, filesystem=fs)
    assert t1.equals(t2)
    assert handler.cache.misses == misses_after_first  # all hits
    assert handler.cache.hits > 0


def test_cached_filesystem_lru_bound(tmp_path):
    """The cache never holds more than its byte budget (strict LRU
    eviction, cpl_vsil_cache.cpp semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from gdal_ray.sources.vsi import cached_filesystem

    p = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table({"x": [b"\x00" * 1024] * 4096}), p)  # ~4 MB
    fs, handler = cached_filesystem(cache_bytes=64 * 1024, chunk=16 * 1024)
    t = pq.read_table(p, filesystem=fs)
    assert len(t) == 4096
    assert handler.cache._bytes <= 64 * 1024
    # re-read still correct after evictions
    assert pq.read_table(p, filesystem=fs).equals(t)


def test_cached_filesystem_composes_with_retry(tmp_path):
    """Cache handler inherits the retry policy: a flaky base succeeds
    through backoff and the result lands in the cache."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq
    from gdal_ray.sources.vsi import CacheHandler

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": np.arange(1000)}), p)
    flaky = pafs.PyFileSystem(FlakyHandler(fail_n=2))
    handler = CacheHandler(flaky, max_retry=3, retry_delay=0.001)
    fs = pafs.PyFileSystem(handler)
    t = pq.read_table(p, filesystem=fs)
    assert len(t) == 1000
