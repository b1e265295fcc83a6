"""Lazy host views of whole-chunk device blocks.

Chunked replay returns (K, ...) device arrays; materializing them row by row
would issue K tiny device->host reads over the TPU relay.  These wrappers
cache ONE block transfer on first access and serve rows from it.
"""
from __future__ import annotations

import numpy as np


class LazyRows:
    """Host-cached view of a (K, ...) device array block: materializes the
    whole block once on first access instead of issuing K tiny slice ops
    over the device relay."""

    def __init__(self, arr):
        self.arr = arr
        self._np = None

    def np(self):
        if self._np is None:
            self._np = np.asarray(self.arr)
        return self._np

    def row(self, k):
        return LazyRow(self, k)


class LazyRow:
    def __init__(self, rows: LazyRows, k: int):
        self._rows = rows
        self._k = k

    def __array__(self, dtype=None, copy=None):
        out = self._rows.np()[self._k]
        return out.astype(dtype) if dtype is not None else out


class ChunkMetrics:
    """Per-scan metrics view into whole-chunk device blocks (lazy)."""

    def __init__(self, blocks: dict, k: int):
        self._blocks = blocks
        self._k = k

    def __getitem__(self, key):
        return self._blocks[key].np()[self._k]

    def keys(self):
        return self._blocks.keys()

    def items(self):
        return ((k, self[k]) for k in self._blocks)
