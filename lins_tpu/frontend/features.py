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
import numpy as np

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

    # stable per-ring compaction via prefix-sum scatter (fastest measured
    # variant on TPU vs argsort-gather and searchsorted-gather); all six
    # channels packed into one (L,S,6) scatter — cols < 2^24 are exact in
    # f32, ground is 0/1
    pos = jnp.cumsum(seg_valid.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(seg_valid, pos, S)
    rows = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, S))

    packed = jnp.concatenate([
        xyz_img, rng_img[..., None], cols.astype(xyz_img.dtype)[..., None],
        ground.astype(xyz_img.dtype)[..., None]], axis=-1)
    out = jnp.zeros((L, S + 1, 6), packed.dtype).at[rows, tgt].set(packed)
    xyz_c = out[:, :S, 0:3]
    rng_c = out[:, :S, 3]
    col_c = out[:, :S, 4].astype(jnp.int32)
    grd_c = out[:, :S, 5] > 0.5
    count = jnp.sum(seg_valid.astype(jnp.int32), axis=1)
    valid_c = jnp.arange(S)[None, :] < count[:, None]

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
# Fast extraction: local-extrema picking (TPU hot path)
# ---------------------------------------------------------------------------

def _window_extreme(x, radius, mode):
    """Per-position max/min of x over a ±radius window along axis 1."""
    out = x
    for k in range(1, radius + 1):
        a = jnp.roll(x, k, axis=1)
        b = jnp.roll(x, -k, axis=1)
        if mode == "max":
            out = jnp.maximum(out, jnp.maximum(a, b))
        else:
            out = jnp.minimum(out, jnp.minimum(a, b))
    return out


def extract_features_fast(seg: SegmentedScan, cfg: SlamConfig):
    """Vectorized feature picking: curvature local extrema in ±5 windows.

    The reference's greedy suppression admits at most one pick per ±5-point
    neighborhood (StateEstimator.hpp:763-777); window local-extrema picking
    enforces the same spacing in ~60 vector ops with no sequential loops.
    Per-sector caps (2 sharp / 20 less-sharp / 4 flat) apply in column order;
    sharp = the per-sector top-2 local maxima by curvature.
    Returns (label (L,S) int32, less_flat mask) like extract_ring.
    """
    L, S = seg.rng.shape
    counts = seg.count
    idx = jnp.arange(S)[None, :]

    curv, curv_ok = jax.vmap(curvature_ring)(seg.rng, counts)
    occl = jax.vmap(occlusion_ring)(seg.rng, seg.col, counts)

    s_idx = 5
    e_idx = (counts - 6)[:, None]
    in_range = (idx >= s_idx) & (idx <= e_idx) & curv_ok & seg.valid

    # sector ids over the compacted per-ring layout
    span = jnp.maximum(e_idx - s_idx + 1, 1)
    sector_id_f = jnp.clip((idx - s_idx) * 6 // jnp.maximum(span, 1), 0, 5)

    # --- corners ---
    cand_c = in_range & ~occl & (curv > cfg.edge_threshold) & ~seg.ground
    cmax = _window_extreme(jnp.where(cand_c, curv, -1.0), 5, "max")
    pick_c = cand_c & (curv >= cmax)
    # break ties in a window: keep the first of any tied pair
    tie = pick_c & jnp.roll(pick_c, 1, axis=1) & (
        jnp.abs(curv - jnp.roll(curv, 1, axis=1)) < 1e-12)
    pick_c = pick_c & ~tie

    # less-sharp cap (20) per sector, column order — all 6 sectors batched
    # on a sector axis (one (L,6,S) pass instead of a 6-iteration Python
    # loop of (L,S) ops: ~5x fewer HLO ops, same math; a per-sector mask is
    # zero outside its sector so full-row cumsum/max = in-sector cumsum/max)
    nsec = cfg.sections_total
    sec = sector_id_f[:, None, :] == jnp.arange(nsec, dtype=jnp.int32)[None, :, None]
    curv6 = curv[:, None, :]
    m = pick_c[:, None, :] & sec
    m20 = m & (jnp.cumsum(m, axis=-1) <= cfg.edge_less_feature_num)
    less_sharp = jnp.any(m20, axis=1)
    # top-2 by curvature within each sector
    cv = jnp.where(m20, curv6, -1.0)
    mx1 = jnp.max(cv, axis=-1, keepdims=True)
    m1 = (cv >= mx1) & m20
    m1 = m1 & (jnp.cumsum(m1, axis=-1) == 1)
    cv2 = jnp.where(m20 & ~m1, curv6, -1.0)
    mx2 = jnp.max(cv2, axis=-1, keepdims=True)
    m2 = (cv2 >= mx2) & m20 & ~m1
    m2 = m2 & (jnp.cumsum(m2, axis=-1) == 1)
    sharp = jnp.any((m1 & (mx1 > 0)) | (m2 & (mx2 > 0)), axis=1)

    # --- flats: spaced low-curvature ground points, 4 per sector ---
    # (on flat ground the reference's greedy-min + ±5 suppression reduces to
    # picking every 6th candidate — the spacing rule reproduces that exactly
    # and stays within the curvature threshold in general)
    cand_f = in_range & ~occl & (curv < cfg.surf_threshold) & seg.ground
    mf = cand_f[:, None, :] & sec
    rank = jnp.cumsum(mf, axis=-1) - 1
    spaced = mf & (rank % 6 == 0)
    spaced = spaced & (jnp.cumsum(spaced, axis=-1) <= cfg.surf_feature_num)
    flat = jnp.any(spaced, axis=1)

    lab = jnp.where(sharp, 2, jnp.where(less_sharp, 1,
                                        jnp.where(flat, -1, 0)))
    less_flat_mask = in_range & (lab <= 0)
    return lab, less_flat_mask


def _cap_per_ring(mask, cap):
    """Keep the first `cap` True entries per ring (column order)."""
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    return mask & (rank < cap)


# ---------------------------------------------------------------------------
# Voxel downsampling (per ring, centroid per voxel — pcl::VoxelGrid analogue)
# ---------------------------------------------------------------------------

def voxel_mask_hash(xyz, mask, leaf, table: int = 1 << 14):
    """O(n) sort-free voxel thinning: keep the first masked point of each
    occupied voxel via a scatter-min hash table.

    Trades the reference's per-voxel centroid for first-point-per-voxel
    (rare hash collisions drop points rather than corrupt them) — the TPU
    hot path; golden ATE validated against the centroid version.
    Returns a thinned boolean mask of xyz's leading shape.
    """
    shape = mask.shape
    x = xyz.reshape(-1, 3)
    m = mask.reshape(-1)
    n = x.shape[0]
    v = jnp.floor(x / leaf).astype(jnp.int32)
    h = ((v[:, 0] * 73856093) ^ (v[:, 1] * 19349663)
         ^ (v[:, 2] * 83492791)) & (table - 1)
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(m, idx, n)
    tbl = jnp.full((table,), n, jnp.int32).at[h].min(key)
    keep = m & (tbl[h] == idx)
    return keep.reshape(shape)

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
    """Compact masked entries of an (L,S,...) set into a (cap,...) cloud via
    searchsorted gather (stable, no sort, no scatter)."""
    L, S = mask.shape
    rings = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, S))
    fm = mask.reshape(-1)
    c = jnp.cumsum(fm.astype(jnp.int32))
    src = jnp.minimum(jnp.searchsorted(
        c, jnp.arange(1, cap + 1, dtype=jnp.int32)), L * S - 1)
    n = jnp.minimum(c[-1], cap)

    return FeatureCloud(
        xyz=xyz.reshape(-1, 3)[src],
        rel_time=rel.reshape(-1)[src],
        ring=rings.reshape(-1)[src],
        valid=jnp.arange(cap) < n,
    )


def _compact_scatter_packed(seg: SegmentedScan, label, lf_xyz, lf_rel,
                            lf_mask, outlier_xyz, outlier_mask,
                            lf_same_source: bool, cfg: SlamConfig
                            ) -> ScanFeatures:
    """All five feature-set compactions as (at most) three scatters into one
    packed buffer — ~2.8x faster on TPU than five independent
    searchsorted-gather compactions (`_compact`), bit-identical output.

    Disjointness lets sets share a scatter: sharp (label 2) + flat (-1) ride
    one scatter, less_sharp (>=1) + less_flat (<=0, voxel-thinned) a second,
    outlier (its own source grid) a third.  Ranks for every set come from a
    single stacked cumsum.  When less_flat's source differs from the
    segmented grid (exact mode's per-ring centroid downsample), it gets its
    own scatter instead of sharing.
    """
    L, S = label.shape
    n = L * S
    dtype = seg.xyz.dtype
    rings = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None],
                             (L, S)).reshape(-1).astype(dtype)[:, None]
    xyz = seg.xyz.reshape(-1, 3)
    rel = seg.rel_time.reshape(-1)

    caps = (cfg.max_sharp, cfg.max_flat, cfg.max_less_flat, cfg.max_outlier,
            cfg.max_less_sharp)
    base = np.cumsum((0,) + caps)          # static slot offsets
    total = int(base[-1])

    masks = jnp.stack([(label == 2).reshape(-1),
                       (label == -1).reshape(-1),
                       lf_mask.reshape(-1),
                       outlier_mask.reshape(-1),
                       (label >= 1).reshape(-1)])
    ranks = jnp.cumsum(masks.astype(jnp.int32), axis=1) - 1
    counts = jnp.minimum(ranks[:, -1] + 1, jnp.asarray(caps, jnp.int32))

    def tgt(i):
        r = ranks[i]
        return jnp.where(masks[i] & (r < caps[i]), base[i] + r, total)

    packed = jnp.concatenate([xyz, rel[:, None], rings], axis=-1)
    buf = jnp.zeros((total + 1, 5), dtype)
    t_o = tgt(3)
    packed_o = jnp.concatenate(
        [outlier_xyz.reshape(-1, 3), jnp.zeros((n, 1), dtype), rings], axis=-1)
    if lf_same_source:
        # sharp+flat | less_sharp+less_flat | outlier: 3 scatters
        buf = buf.at[jnp.minimum(tgt(0), tgt(1))].set(packed)
        buf = buf.at[t_o].set(packed_o)
        buf = buf.at[jnp.minimum(tgt(4), tgt(2))].set(packed)
    else:
        buf = buf.at[jnp.minimum(tgt(0), tgt(1))].set(packed)
        buf = buf.at[t_o].set(packed_o)
        buf = buf.at[tgt(4)].set(packed)
        packed_lf = jnp.concatenate(
            [lf_xyz.reshape(-1, 3), lf_rel.reshape(-1)[:, None], rings],
            axis=-1)
        buf = buf.at[tgt(2)].set(packed_lf)

    def cloud(i):
        sl = slice(int(base[i]), int(base[i + 1]))
        return FeatureCloud(xyz=buf[sl, 0:3], rel_time=buf[sl, 3],
                            ring=buf[sl, 4].astype(jnp.int32),
                            valid=jnp.arange(caps[i]) < counts[i])

    return ScanFeatures(sharp=cloud(0), less_sharp=cloud(4), flat=cloud(1),
                        less_flat=cloud(2), outlier=cloud(3))


def extract_features(seg: SegmentedScan, outlier_xyz, outlier_mask,
                     cfg: SlamConfig) -> ScanFeatures:
    """All feature sets for a segmented scan."""
    if cfg.feature_mode == "fast":
        label, less_flat_mask = extract_features_fast(seg, cfg)
        lf_mask = voxel_mask_hash(seg.xyz, less_flat_mask, cfg.surf_leaf_size)
        lf_xyz, lf_rel = seg.xyz, seg.rel_time
        same = True
    else:
        label, less_flat_mask = jax.vmap(partial(extract_ring, cfg=cfg))(
            dict(rng=seg.rng, col=seg.col, ground=seg.ground,
                 valid=seg.valid, count=seg.count))
        vds = jax.vmap(partial(voxel_downsample_ring,
                               leaf=cfg.surf_leaf_size))
        lf_xyz, lf_rel, lf_mask = vds(seg.xyz, seg.rel_time, less_flat_mask)
        same = False

    return _compact_scatter_packed(seg, label, lf_xyz, lf_rel, lf_mask,
                                   outlier_xyz, outlier_mask, same, cfg)
