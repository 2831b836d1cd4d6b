"""Remote-filesystem read hardening — the /vsicurl retry analog.

The reference retries transient remote failures with exponential
backoff at the VSI layer (``GDAL_HTTP_MAX_RETRY`` /
``GDAL_HTTP_RETRY_DELAY``, port/cpl_http.cpp:518,1151; curl handler
port/cpl_vsil_curl.cpp:179-184).  Here the same policy wraps any
pyarrow filesystem: metadata and open-for-read calls retry
``max_retry`` times with doubling delay, so a flaky object store
surfaces to Ray Data as a slow read, not a dead task.  Composes with
Ray's own task-level retries (``ray_remote_args={'max_retries': ...,
'retry_exceptions': True}``) — VSI retries handle transient I/O inside
one task attempt; Ray retries replace the whole task on worker loss.
"""

from __future__ import annotations

import os
import time

import pyarrow.fs as pafs

DEFAULT_MAX_RETRY = int(os.environ.get("GDAL_RAY_HTTP_MAX_RETRY", "3"))
DEFAULT_RETRY_DELAY = float(os.environ.get("GDAL_RAY_HTTP_RETRY_DELAY",
                                           "0.05"))


class RetryHandler(pafs.FileSystemHandler):
    """Delegating pyarrow FileSystemHandler that retries read-side
    operations with exponential backoff (cpl_http.cpp:518 semantics:
    attempt, sleep d, d*=2, up to max_retry extra attempts)."""

    RETRIED = ("get_file_info", "get_file_info_selector",
               "open_input_stream", "open_input_file")

    def __init__(self, base: pafs.FileSystem,
                 max_retry: int = DEFAULT_MAX_RETRY,
                 retry_delay: float = DEFAULT_RETRY_DELAY):
        self.base = base
        self.max_retry = int(max_retry)
        self.retry_delay = float(retry_delay)

    def _retry(self, fn, *args):
        delay = self.retry_delay
        for attempt in range(self.max_retry + 1):
            try:
                return fn(*args)
            except (OSError, IOError):
                if attempt == self.max_retry:
                    raise
                time.sleep(delay)
                delay *= 2.0

    # --- retried read-side surface ---------------------------------
    def get_type_name(self):
        return f"retry({self.base.type_name})"

    def get_file_info(self, paths):
        return self._retry(self.base.get_file_info, paths)

    def get_file_info_selector(self, selector):
        return self._retry(self.base.get_file_info, selector)

    def open_input_stream(self, path):
        return self._retry(self.base.open_input_stream, path)

    def open_input_file(self, path):
        return self._retry(self.base.open_input_file, path)

    def normalize_path(self, path):
        return self.base.normalize_path(path)

    # --- write/maintenance surface: pass through, no retry (the
    # reference retries GETs; mutating verbs are not idempotent) -----
    def create_dir(self, path, recursive):
        self.base.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self.base.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self.base.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        self.base.delete_dir_contents("/", accept_root_dir=True)

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


class _LRUBlockCache:
    """Chunk-granular LRU byte cache shared by one filesystem wrapper —
    the VSI cache layer analog (port/cpl_vsil_cache.cpp:117: 25 MB
    default budget via VSI_CACHE_SIZE; the curl handler keeps a 16 MB
    LRU of 16 KB regions, port/cpl_vsil_curl.cpp:179-184).  Keyed by
    (path, chunk index); eviction is strict LRU on total bytes."""

    def __init__(self, max_bytes: int, chunk: int):
        from collections import OrderedDict

        self.max_bytes = int(max_bytes)
        self.chunk = int(chunk)
        self._d: "OrderedDict[tuple, bytes]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, key):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
            self.hits += 1
        else:
            self.misses += 1
        return v

    def put(self, key, blob: bytes):
        if key in self._d:
            return
        self._d[key] = blob
        self._bytes += len(blob)
        while self._bytes > self.max_bytes and self._d:
            _, old = self._d.popitem(last=False)
            self._bytes -= len(old)


class CachedInputFile:
    """Read-through wrapper over a pyarrow RandomAccessFile: every
    range read is served chunk-by-chunk from the shared LRU (the
    VSICachedFile read path — cpl_vsil_cache.cpp).  Satisfies the
    duck-typed surface parquet reading uses (read_at/seek/read/size);
    positional state is tracked locally so cached reads never touch
    the base handle's cursor."""

    def __init__(self, base, path: str, cache: _LRUBlockCache):
        self._base = base
        self._path = path
        self._cache = cache
        self._size = base.size()
        self._pos = 0

    # --- pyarrow NativeFile-ish surface -----------------------------
    def size(self):
        return self._size

    def tell(self):
        return self._pos

    def seek(self, offset, whence=0):
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            self._pos = self._size + offset
        return self._pos

    def read_at(self, nbytes, offset):
        end = min(self._size, offset + nbytes)
        if offset >= end:
            return b""
        c = self._cache.chunk
        first, last = offset // c, (end - 1) // c
        parts = []
        for ci in range(first, last + 1):
            key = (self._path, ci)
            blob = self._cache.get(key)
            if blob is None:
                blob = self._base.read_at(min(c, self._size - ci * c),
                                          ci * c)
                self._cache.put(key, blob)
            parts.append(blob)
        buf = b"".join(parts)
        lo = offset - first * c
        return buf[lo:lo + (end - offset)]

    def read(self, nbytes=None):
        n = (self._size - self._pos) if nbytes is None else nbytes
        out = self.read_at(n, self._pos)
        self._pos += len(out)
        return out

    def close(self):
        self._base.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    @property
    def closed(self):
        return getattr(self._base, "closed", False)


class CacheHandler(RetryHandler):
    """Retry + read-through cache filesystem: open_input_file returns
    a CachedInputFile over the (retried) base handle.  Stream opens
    pass through uncached (sequential scans don't revisit ranges; the
    reference likewise caches only the random-access path)."""

    def __init__(self, base: pafs.FileSystem,
                 max_retry: int = DEFAULT_MAX_RETRY,
                 retry_delay: float = DEFAULT_RETRY_DELAY,
                 cache_bytes: int = 25 * 1024 * 1024,
                 chunk: int = 256 * 1024):
        super().__init__(base, max_retry, retry_delay)
        self.cache = _LRUBlockCache(cache_bytes, chunk)

    def get_type_name(self):
        return f"cache({self.base.type_name})"

    def open_input_file(self, path):
        import pyarrow as pa

        f = self._retry(self.base.open_input_file, path)
        # PythonFile bridges the duck-typed cached wrapper back into a
        # NativeFile for the C++ reader (seekable => random access)
        return pa.PythonFile(CachedInputFile(f, path, self.cache),
                             mode="r")


def cached_filesystem(base: pafs.FileSystem | None = None,
                      cache_bytes: int = 25 * 1024 * 1024,
                      chunk: int = 256 * 1024,
                      max_retry: int = DEFAULT_MAX_RETRY,
                      retry_delay: float = DEFAULT_RETRY_DELAY):
    """Retry + LRU read-cache wrapper (VSI cache semantics).  NOTE:
    per-process cache — each Ray worker builds its own on unpickle,
    which is exactly the reference's per-process VSI cache shape; the
    cross-task dedup of hot footers/row-groups is what it buys on a
    remote store."""
    handler = CacheHandler(base or pafs.LocalFileSystem(), max_retry,
                           retry_delay, cache_bytes, chunk)
    return pafs.PyFileSystem(handler), handler


def retry_filesystem(base: pafs.FileSystem | None = None,
                     max_retry: int = DEFAULT_MAX_RETRY,
                     retry_delay: float = DEFAULT_RETRY_DELAY
                     ) -> pafs.PyFileSystem:
    """Wrap ``base`` (default: local) in the VSI retry policy."""
    return pafs.PyFileSystem(RetryHandler(base or pafs.LocalFileSystem(),
                                          max_retry, retry_delay))


def read_parquet_retry(paths, *, filesystem: pafs.FileSystem | None = None,
                       max_retry: int = DEFAULT_MAX_RETRY,
                       retry_delay: float = DEFAULT_RETRY_DELAY,
                       task_max_retries: int = 2, **kwargs):
    """ray.data.read_parquet with both retry layers armed: the VSI
    backoff wrapper inside each read task, plus Ray task-level
    retry-on-exception for whole-task replacement."""
    import ray.data as rd

    fs = retry_filesystem(filesystem, max_retry, retry_delay)
    ra = dict(kwargs.pop("ray_remote_args", {}) or {})
    ra.setdefault("retry_exceptions", True)
    ra.setdefault("max_retries", task_max_retries)
    return rd.read_parquet(paths, filesystem=fs, ray_remote_args=ra,
                           **kwargs)
