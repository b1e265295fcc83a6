"""Per-ring compaction, undistortion timing, curvature and LOAM feature
extraction (reference C7-C10).

Re-implements the reference's sequential per-sector greedy picking
(StateEstimator.hpp:656-827) with exact semantics: vmapped over rings, a
`lax.scan` over the 6 sectors (suppression crosses sector boundaries), and a
`fori_loop` of masked argmax/argmin greedy picks inside each sector.  The
BFS-era `halfPassed` azimuth unwrapping (StateEstimator.hpp:619-654) is
replaced by a direct `mod 2π` sweep fraction, which is the function that loop
approximates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig
from lins_tpu.frontend.types import FeatureCloud, ScanFeatures, SegmentedScan
from lins_tpu.geom import so3


# ---------------------------------------------------------------------------
# Per-ring compaction (cloud_info equivalent)
# ---------------------------------------------------------------------------

def compact_rings(xyz_img, rng_img, seg_valid, ground, start, diff,
                  cfg: SlamConfig) -> SegmentedScan:
    """Compact selected cells of each ring to the front of a (L,S) layout.

    Mirrors the flat segmented-cloud construction of
    image_projection_node.cpp:294-321 but keeps a per-ring axis so all sector
    arithmetic stays static-shape.  Also applies the lidar->vehicle extrinsic
    yaw (StateEstimator.hpp:1104-1114) and computes each point's sweep
    fraction (rel_time).
    """
    L, S = cfg.line_num, cfg.scan_num
    cols = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (L, S))

    # stable per-ring compaction: order by (not selected, column)
    key = jnp.where(seg_valid, cols, S + cols)
    order = jnp.argsort(key, axis=1)

    take = jnp.take_along_axis
    xyz_c = take(xyz_img, order[..., None], axis=1)
    rng_c = take(rng_img, order, axis=1)
    grd_c = take(ground, order, axis=1)
    col_c = take(cols, order, axis=1)
    valid_c = take(seg_valid, order, axis=1)
    count = jnp.sum(seg_valid.astype(jnp.int32), axis=1)

    # extrinsic yaw rotation (rotatePoint): lidar frame -> vehicle frame
    yaw = jnp.asarray(so3.deg2rad(cfg.imu_lidar_extrinsic_angle), xyz_c.dtype)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = c * xyz_c[..., 0] - s * xyz_c[..., 1]
    y = s * xyz_c[..., 0] + c * xyz_c[..., 1]
    xyz_v = jnp.stack([x, y, xyz_c[..., 2]], axis=-1)

    # sweep fraction from azimuth (replaces the halfPassed loop)
    ori = -jnp.arctan2(xyz_v[..., 1], xyz_v[..., 0])
    rel = jnp.mod(ori - start, 2.0 * jnp.pi) / jnp.maximum(diff, 1e-6)
    rel = jnp.clip(rel, 0.0, 1.0)

    return SegmentedScan(
        xyz=jnp.where(valid_c[..., None], xyz_v, 0.0),
        rng=jnp.where(valid_c, rng_c, 0.0),
        col=col_c, ground=grd_c & valid_c, valid=valid_c, count=count,
        rel_time=jnp.where(valid_c, rel, 0.0),
        start_orientation=start, orientation_diff=diff,
    )


# ---------------------------------------------------------------------------
# Curvature + occlusion masking (per ring, vectorized shifts)
# ---------------------------------------------------------------------------

def _shift(a, k, fill):
    """Shift a 1-D array right by k (k>0) or left (k<0), filling with `fill`."""
    if k == 0:
        return a
    pad = jnp.full((abs(k),) + a.shape[1:], fill, a.dtype)
    if k > 0:
        return jnp.concatenate([pad, a[:-k]])
    return jnp.concatenate([a[-k:], pad])


def curvature_ring(rng_row, count):
    """LOAM curvature (StateEstimator.hpp:656-678) over one compacted ring."""
    S = rng_row.shape[0]
    acc = -10.0 * rng_row
    for k in range(1, 6):
        acc = acc + _shift(rng_row, k, 0.0) + _shift(rng_row, -k, 0.0)
    curv = acc * acc
    idx = jnp.arange(S)
    ok = (idx >= 5) & (idx <= count - 6)
    return jnp.where(ok, curv, 0.0), ok


def occlusion_ring(rng_row, col_row, count):
    """Occluded / parallel-beam suppression (StateEstimator.hpp:680-713)."""
    S = rng_row.shape[0]
    idx = jnp.arange(S)
    in_rng = (idx >= 5) & (idx <= count - 7)

    nxt = _shift(rng_row, -1, jnp.inf)            # r[i+1]
    col_next = _shift(col_row, -1, 10 ** 6)
    col_close = jnp.abs(col_next - col_row) < 10

    occ_a = in_rng & col_close & (rng_row - nxt > 0.3)   # suppress i-5..i
    occ_b = in_rng & col_close & (nxt - rng_row > 0.3)   # suppress i+1..i+6

    picked = jnp.zeros(S, bool)
    for k in range(0, 6):           # picked[j] |= occ_a[j+k], k=0..5
        picked = picked | _shift(occ_a, -k, False)
    for k in range(1, 7):           # picked[j] |= occ_b[j-k], k=1..6
        picked = picked | _shift(occ_b, k, False)

    prev = _shift(rng_row, 1, jnp.inf)
    diff1 = jnp.abs(prev - rng_row)
    diff2 = jnp.abs(nxt - rng_row)
    parallel = in_rng & (diff1 > 0.02 * rng_row) & (diff2 > 0.02 * rng_row)
    return picked | parallel


# ---------------------------------------------------------------------------
# Greedy sector picking (exact reference semantics)
# ---------------------------------------------------------------------------

def _suppress(picked, ind, gap_ok, do):
    """Mark ±5 neighbors of `ind` picked, stopping at column gaps > 10
    (StateEstimator.hpp:763-777).  gap_ok[i] == (|col[i]-col[i-1]| <= 10)."""
    S = picked.shape[0]
    picked = picked.at[ind].max(do)
    run = do
    for l in range(1, 6):
        run = run & gap_ok[jnp.clip(ind + l, 0, S - 1)]
        picked = picked.at[jnp.clip(ind + l, 0, S - 1)].max(run & (ind + l < S))
    run = do
    for l in range(1, 6):
        run = run & gap_ok[jnp.clip(ind - l + 1, 0, S - 1)]
        picked = picked.at[jnp.clip(ind - l, 0, S - 1)].max(run & (ind - l >= 0))
    return picked


def extract_ring(ring: dict, cfg: SlamConfig):
    """Feature labels for one compacted ring.

    ring: dict with rng (S,), col (S,), ground (S,), valid (S,), count ().
    Returns label (S,) int32: 2 sharp, 1 less-sharp, -1 flat, 0 other.
    Mirrors extractFeatures (StateEstimator.hpp:719-827).
    """
    S = ring["rng"].shape[0]
    count = ring["count"]
    curv, curv_ok = curvature_ring(ring["rng"], count)
    picked0 = occlusion_ring(ring["rng"], ring["col"], count)

    gap_ok = jnp.abs(ring["col"] - _shift(ring["col"], 1, 10 ** 6)) <= 10
    idx = jnp.arange(S)

    s_idx = jnp.int32(5)
    e_idx = count - 6

    def sector_body(carry, j):
        picked, label = carry
        sp = (s_idx * (6 - j) + e_idx * j) // 6
        ep = (s_idx * (5 - j) + e_idx * (j + 1)) // 6 - 1
        sector = (idx >= sp) & (idx <= ep) & curv_ok & ring["valid"]
        nonempty = sp < ep

        # --- corners: up to 20 greedy picks, top-2 labeled sharp ---
        def corner_pick(t, st):
            picked, label, n = st
            cand = sector & ~picked & (curv > cfg.edge_threshold) & ~ring["ground"]
            do = jnp.any(cand) & nonempty
            ind = jnp.argmax(jnp.where(cand, curv, -jnp.inf))
            lab_val = jnp.where(n < cfg.edge_feature_num, 2, 1)
            label = label.at[ind].set(jnp.where(do, lab_val, label[ind]))
            picked = _suppress(picked, ind, gap_ok, do)
            return picked, label, n + do.astype(jnp.int32)

        picked, label, _ = jax.lax.fori_loop(
            0, cfg.edge_less_feature_num, corner_pick, (picked, label, jnp.int32(0)))

        # --- flats: up to 4 greedy picks on ground points ---
        def flat_pick(t, st):
            picked, label = st
            cand = sector & ~picked & (curv < cfg.surf_threshold) & ring["ground"]
            do = jnp.any(cand) & nonempty
            ind = jnp.argmin(jnp.where(cand, curv, jnp.inf))
            label = label.at[ind].set(jnp.where(do, -1, label[ind]))
            picked = _suppress(picked, ind, gap_ok, do)
            return picked, label

        picked, label = jax.lax.fori_loop(
            0, cfg.surf_feature_num, flat_pick, (picked, label))
        return (picked, label), None

    label0 = jnp.zeros(S, jnp.int32)
    (picked, label), _ = jax.lax.scan(
        sector_body, (picked0, label0), jnp.arange(6, dtype=jnp.int32))

    # less-flat candidates: any in-sector point not labeled as a corner
    sector_all = (idx >= s_idx) & (idx <= e_idx) & ring["valid"]
    less_flat = sector_all & (label <= 0)
    return label, less_flat


# ---------------------------------------------------------------------------
# Voxel downsampling (per ring, centroid per voxel — pcl::VoxelGrid analogue)
# ---------------------------------------------------------------------------

def voxel_downsample_ring(xyz, rel, mask, leaf):
    """Centroid-per-voxel downsample of one ring's masked points.

    Fixed-shape: sorts by a mixed voxel hash, computes run centroids with
    cumsum differences.  Returns (xyz (S,3), rel (S,), mask (S,)) with
    centroids at run-start slots.
    """
    S = xyz.shape[0]
    v = jnp.floor(xyz / leaf).astype(jnp.int32)
    h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
    h = jnp.where(mask, h, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(h)
    hs = h[order]
    xs = xyz[order]
    rs = rel[order]
    ms = mask[order]

    start = jnp.concatenate([jnp.asarray([True]), hs[1:] != hs[:-1]]) & ms
    # run boundaries via cumulative sums
    cx = jnp.concatenate([jnp.zeros((1, 3), xs.dtype), jnp.cumsum(
        jnp.where(ms[:, None], xs, 0.0), axis=0)])
    cr = jnp.concatenate([jnp.zeros((1,), rs.dtype),
                          jnp.cumsum(jnp.where(ms, rs, 0.0))])
    cn = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                          jnp.cumsum(ms.astype(jnp.int32))])

    starts_idx = jnp.where(start, jnp.arange(S), S - 1)
    # end of run i = next run start (or end of valid points)
    next_start = jnp.concatenate([start[1:], jnp.asarray([True])])
    # for each position, the index of the next run start strictly after it:
    # compute via reverse cumulative min of start positions
    pos = jnp.where(next_start, jnp.arange(1, S + 1), S)
    next_pos = jax.lax.associative_scan(jnp.minimum, pos, reverse=True)

    n_run = cn[next_pos] - cn[jnp.arange(S)]
    n_safe = jnp.maximum(n_run, 1)
    cent = (cx[next_pos] - cx[jnp.arange(S)]) / n_safe[:, None]
    cent_rel = (cr[next_pos] - cr[jnp.arange(S)]) / n_safe
    return (jnp.where(start[:, None], cent, 0.0),
            jnp.where(start, cent_rel, 0.0), start)


# ---------------------------------------------------------------------------
# Flat compaction of (L,S) masked sets into padded FeatureClouds
# ---------------------------------------------------------------------------

def _compact(xyz, rel, mask, cap):
    """Gather masked entries of an (L,S,...) set into a (cap,...) cloud."""
    L, S = mask.shape
    rings = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, S))
    flat_mask = mask.reshape(-1)
    order = jnp.argsort(~flat_mask)  # stable: valid first, original order kept
    sel = order[:cap]
    return FeatureCloud(
        xyz=xyz.reshape(-1, 3)[sel],
        rel_time=rel.reshape(-1)[sel],
        ring=rings.reshape(-1)[sel],
        valid=flat_mask[sel],
    )


def extract_features(seg: SegmentedScan, outlier_xyz, outlier_mask,
                     cfg: SlamConfig) -> ScanFeatures:
    """All feature sets for a segmented scan (vmapped over rings)."""
    label, less_flat_mask = jax.vmap(partial(extract_ring, cfg=cfg))(
        dict(rng=seg.rng, col=seg.col, ground=seg.ground,
             valid=seg.valid, count=seg.count))

    vds = jax.vmap(partial(voxel_downsample_ring, leaf=cfg.surf_leaf_size))
    lf_xyz, lf_rel, lf_mask = vds(seg.xyz, seg.rel_time, less_flat_mask)

    sharp = _compact(seg.xyz, seg.rel_time, label == 2, cfg.max_sharp)
    less_sharp = _compact(seg.xyz, seg.rel_time, label >= 1, cfg.max_less_sharp)
    flat = _compact(seg.xyz, seg.rel_time, label == -1, cfg.max_flat)
    less_flat = _compact(lf_xyz, lf_rel, lf_mask, cfg.max_less_flat)
    outlier = _compact(outlier_xyz, jnp.zeros(outlier_mask.shape),
                       outlier_mask, cfg.max_outlier)
    return ScanFeatures(sharp=sharp, less_sharp=less_sharp, flat=flat,
                        less_flat=less_flat, outlier=outlier)
