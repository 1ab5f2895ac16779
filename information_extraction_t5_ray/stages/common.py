"""Shared partitioning primitives for bucketed two-phase stages."""

from __future__ import annotations

import zlib

import numpy as np


def bucket_of(keys, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per key, identical in every worker
    process: integer keys take the modulo path, anything else hashes
    crc32 of the string form.  NEVER use Python ``hash()`` here — it is
    salted per process, and workers are separate processes, so the same
    key would land in different buckets and split its group.

    Accepts a numpy array or pandas Series; returns int32 ndarray.
    """
    arr = np.asarray(keys)
    if np.issubdtype(arr.dtype, np.integer):
        return (arr.astype(np.int64) % num_buckets).astype(np.int32)
    return np.fromiter(
        (zlib.crc32(str(k).encode()) % num_buckets for k in arr),
        np.int32,
        count=len(arr),
    )
