"""Fused per-scan front-end: raw cloud -> segmented scan + feature sets.

One jit region per scan replacing the whole image_projection_node
(image_projection_node.cpp:179-189) plus the feature-extraction half of
StateEstimator::processPCL (StateEstimator.hpp:284-289).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.frontend import features as F
from lins_tpu.frontend import projection as P
from lins_tpu.frontend import segmentation as Seg
from lins_tpu.frontend.types import RangeImage, ScanFeatures, SegmentedScan


def process_cloud(xyz: jnp.ndarray, n_points: jnp.ndarray, cfg: SlamConfig):
    """Full front-end for one raw scan.

    Args:
      xyz: (max_points, 3) raw lidar cloud, padded.
      n_points: scalar int32 — number of valid leading points.
    Returns:
      (RangeImage, SegmentedScan, ScanFeatures)
    """
    xyz_img, rng_img, valid, start, diff = P.project(xyz, n_points, cfg)
    ground = P.ground_removal(xyz_img, valid, cfg)
    label, seg_valid, outlier = Seg.segment(rng_img, valid, ground, cfg)

    seg = F.compact_rings(xyz_img, rng_img, seg_valid, ground, start, diff, cfg)
    feats = F.extract_features(seg, xyz_img, outlier, cfg)

    img = RangeImage(xyz=xyz_img, rng=rng_img, valid=valid, ground=ground,
                     label=label, start_orientation=start,
                     orientation_diff=diff)
    return img, seg, feats


def make_frontend(cfg: SlamConfig):
    """jit-compiled front-end closure for a fixed config."""
    return jax.jit(partial(process_cloud, cfg=cfg))
