"""Fixed-shape data structures for the front-end (replaces cloud_msgs/cloud_info.msg
and the reference's per-scan PCL containers, StateEstimator.hpp:74-170).

Everything is a NamedTuple of arrays with static shapes + validity masks so the
whole per-scan pipeline stays inside one XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RangeImage(NamedTuple):
    """Projected scan on the (line_num, scan_num) grid.

    Replaces rangeMat/fullCloud/groundMat/labelMat cv::Mats
    (image_projection_node.cpp:160-162).
    """

    xyz: jnp.ndarray        # (L, S, 3) point position; 0 where invalid
    rng: jnp.ndarray        # (L, S) range; +inf where invalid
    valid: jnp.ndarray      # (L, S) bool — a point landed in this cell
    ground: jnp.ndarray     # (L, S) bool — ground-flagged cell
    label: jnp.ndarray      # (L, S) int32 — component id, -1 ground/invalid, -2 outlier
    start_orientation: jnp.ndarray  # scalar
    orientation_diff: jnp.ndarray   # scalar


class SegmentedScan(NamedTuple):
    """Per-ring compacted segmented cloud (replaces cloud_info.msg arrays).

    Ring i's points occupy slots [0, count[i]); the layout mirrors the
    reference's flat segmented array split by ring
    (image_projection_node.cpp:294-321).
    """

    xyz: jnp.ndarray        # (L, S, 3)
    rng: jnp.ndarray        # (L, S)
    col: jnp.ndarray        # (L, S) int32 column index in the range image
    ground: jnp.ndarray     # (L, S) bool
    valid: jnp.ndarray      # (L, S) bool
    count: jnp.ndarray      # (L,) int32
    rel_time: jnp.ndarray   # (L, S) in [0, 1] — azimuth fraction of the sweep
    start_orientation: jnp.ndarray
    orientation_diff: jnp.ndarray


class FeatureCloud(NamedTuple):
    """A padded feature set (one of sharp/less-sharp/flat/less-flat/outlier)."""

    xyz: jnp.ndarray        # (K, 3)
    rel_time: jnp.ndarray   # (K,)
    ring: jnp.ndarray       # (K,) int32
    valid: jnp.ndarray      # (K,) bool

    @property
    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


class ScanFeatures(NamedTuple):
    """All feature sets for one scan (replaces Scan, StateEstimator.hpp:74-170)."""

    sharp: FeatureCloud       # cornerPointsSharp
    less_sharp: FeatureCloud  # cornerPointsLessSharp
    flat: FeatureCloud        # surfPointsFlat
    less_flat: FeatureCloud   # surfPointsLessFlat
    outlier: FeatureCloud     # outlier cloud (for the mapping backend)
