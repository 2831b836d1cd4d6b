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
