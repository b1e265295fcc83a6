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


# --- split-dispatch variant (Pallas label kernel as its own dispatch) ------
#
# The connected-components Pallas kernel cannot live inside the big fused
# scan graph in this environment (the remote-compile relay rejects mixed
# payloads), so the pipelined hot path splits into three dispatches:
# pre (XLA) -> label kernel (Mosaic) -> rest (XLA).  With the sync-free
# driver the dispatches pipeline, so throughput follows device time.

def frontend_pre(xyz, n_points, cfg: SlamConfig):
    """Projection + ground + adjacency edges (everything before labeling)."""
    xyz_img, rng_img, valid, start, diff = P.project(xyz, n_points, cfg)
    ground = P.ground_removal(xyz_img, valid, cfg)
    eligible = valid & ~ground
    e_right, e_down = Seg.edge_masks(rng_img, eligible, cfg)
    return dict(xyz_img=xyz_img, rng_img=rng_img, valid=valid, ground=ground,
                eligible=eligible, e_right=e_right, e_down=e_down,
                start=start, diff=diff)


def frontend_post(labels, pre: dict, cfg: SlamConfig):
    """Everything after labeling: selection, compaction, features."""
    label, seg_valid, outlier = Seg.segment_from_labels(
        labels, pre["eligible"], pre["ground"], cfg)
    seg = F.compact_rings(pre["xyz_img"], pre["rng_img"], seg_valid,
                          pre["ground"], pre["start"], pre["diff"], cfg)
    feats = F.extract_features(seg, pre["xyz_img"], outlier, cfg)
    return seg, feats
