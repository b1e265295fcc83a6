"""Cloud segmentation as grid connected-components (reference C6).

Replaces the sequential BFS region growing of image_projection_node.cpp:289-415
with a TPU-friendly iterative min-label propagation + pointer jumping on the
(line_num, scan_num) grid: no dynamic queue, O(log grid) sweeps, one XLA
program.  Component validity uses the same rules: size >= 30, or size >=
segment_valid_point_num with >= segment_valid_line_num rings touched (ring span
equals distinct-ring count for a grid-connected component).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lins_tpu.config import SlamConfig

_BIG = jnp.int32(2 ** 30)


def _edge(r_a, r_b, ok_a, ok_b, alpha, theta):
    """Region-growing adjacency test (image_projection_node.cpp:370-382)."""
    d1 = jnp.maximum(r_a, r_b)
    d2 = jnp.minimum(r_a, r_b)
    angle = jnp.arctan2(d2 * jnp.sin(alpha), d1 - d2 * jnp.cos(alpha))
    return ok_a & ok_b & (angle > theta)


def edge_masks(rng_img, eligible, cfg: SlamConfig):
    """4-neighbor adjacency masks under the angle criterion."""
    S = cfg.scan_num
    ax = jnp.asarray(cfg.segment_alpha_x, rng_img.dtype)
    ay = jnp.asarray(cfg.segment_alpha_y, rng_img.dtype)
    th = jnp.asarray(cfg.segment_theta, rng_img.dtype)

    # horizontal edges (columns wrap): right neighbor of (i,j) is (i, j+1 mod S)
    r_right = jnp.roll(rng_img, -1, axis=1)
    e_right = _edge(rng_img, r_right, eligible,
                    jnp.roll(eligible, -1, axis=1), ax, th)
    # vertical edges (no wrap): down neighbor of (i,j) is (i+1, j)
    r_down = jnp.concatenate(
        [rng_img[1:], jnp.full((1, S), jnp.inf, rng_img.dtype)])
    ok_down = jnp.concatenate([eligible[1:], jnp.zeros((1, S), bool)])
    e_down = _edge(rng_img, r_down, eligible, ok_down, ay, th)
    return e_right, e_down


def label_components(rng_img: jnp.ndarray, eligible: jnp.ndarray, cfg: SlamConfig):
    """Connected components of `eligible` cells under the angle criterion.

    Returns (labels (L,S) int32 — flat index of the component representative,
    or _BIG for non-eligible cells).
    """
    e_right, e_down = edge_masks(rng_img, eligible, cfg)
    return label_from_edges(e_right, e_down, eligible)


def label_from_edges(e_right: jnp.ndarray, e_down: jnp.ndarray,
                     eligible: jnp.ndarray):
    """label_components from precomputed adjacency masks — the XLA
    union-find propagation with the same (edges -> representative labels)
    contract as the Mosaic kernel (ops/pallas_label.py), used where that
    kernel cannot compile (its internal stack exceeds the 16 MB scoped
    VMEM at 64-row sensors regardless of batch size — round-4 HDL-64
    finding)."""
    L, S = eligible.shape
    e_left = jnp.roll(e_right, 1, axis=1)
    e_up = jnp.concatenate([jnp.zeros((1, S), bool), e_down[:-1]])

    flat_ids = jnp.arange(L * S, dtype=jnp.int32).reshape(L, S)
    labels = jnp.where(eligible, flat_ids, _BIG)

    def neighbor_min(lab):
        right = jnp.roll(lab, -1, axis=1)
        left = jnp.roll(lab, 1, axis=1)
        down = jnp.concatenate([lab[1:], jnp.full((1, S), _BIG)])
        up = jnp.concatenate([jnp.full((1, S), _BIG), lab[:-1]])
        m = lab
        m = jnp.minimum(m, jnp.where(e_right, right, _BIG))
        m = jnp.minimum(m, jnp.where(e_left, left, _BIG))
        m = jnp.minimum(m, jnp.where(e_down, down, _BIG))
        m = jnp.minimum(m, jnp.where(e_up, up, _BIG))
        return jnp.where(eligible, m, _BIG)

    LS = L * S

    def body(state):
        lab, _ = state
        prev = lab.reshape(-1)
        flat = neighbor_min(lab).reshape(-1)
        # union-find "hook": children scatter-min their new value onto their
        # previous representative, so a smaller label entering an
        # already-converged region reaches every member through one jump
        # instead of crawling the grid one cell per sweep
        A = jnp.full((LS + 1,), _BIG, jnp.int32).at[
            jnp.minimum(prev, LS)].min(flat)
        flat = jnp.minimum(flat, A[:LS])
        # pointer doubling (rebuild the table each hop)
        for _ in range(2):
            ext = jnp.concatenate([flat, jnp.asarray([_BIG], jnp.int32)])
            flat = jnp.minimum(flat, ext[jnp.minimum(flat, LS)])
        new = jnp.where(eligible, flat.reshape(L, S), _BIG)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.asarray(True)))
    return labels


def segment(rng_img, valid, ground, cfg: SlamConfig):
    """Full segmentation: components + validity + outlier/segment selection.

    Returns (label (L,S) int32 with -1 = not part of any cluster,
             seg_valid (L,S) bool — cell is part of a kept cluster,
             outlier (L,S) bool — cell goes to the outlier cloud).
    Mirrors cloudSegmentation (image_projection_node.cpp:289-334) +
    labelComponents validity (:398-414).
    """
    eligible = valid & ~ground
    # NOTE: always the XLA labeler here — the Pallas kernel runs as its own
    # dispatch in the split pipeline (frontend_pre/post); embedding Mosaic
    # kernels in the big fused graph crashes this environment's compiler
    labels = label_components(rng_img, eligible, cfg)
    return segment_from_labels(labels, eligible, ground, cfg)


def segment_from_labels(labels, eligible, ground, cfg: SlamConfig):
    """Component validity + outlier/segment selection given labels."""
    L, S = cfg.line_num, cfg.scan_num
    flat_lab = labels.reshape(-1)
    safe_lab = jnp.minimum(flat_lab, L * S)  # _BIG -> overflow slot
    rows = (jnp.arange(L * S, dtype=jnp.int32) // S)

    # one scatter-add of a per-row one-hot instead of a scatter-add (size)
    # plus a scatter-max (max_row): size = row-sum of the (L*S+1, L) table,
    # max_row = highest nonzero column (measured 0.82 vs 1.01 ms/scan)
    onehot = ((jnp.arange(L, dtype=jnp.int32)[None, :] == rows[:, None])
              & eligible.reshape(-1)[:, None])
    tab = jnp.zeros((L * S + 1, L), jnp.int32).at[safe_lab].add(
        onehot.astype(jnp.int32))
    size = jnp.sum(tab, axis=1)
    max_row = jnp.max(
        jnp.where(tab > 0, jnp.arange(L, dtype=jnp.int32)[None, :], -1),
        axis=1)
    # the component label IS its minimum flat id (min-label propagation /
    # Pallas closure both converge to it), and flat ids are row-major, so
    # the label's row is the component's minimum row — no third scatter
    min_row = jnp.arange(L * S + 1, dtype=jnp.int32) // S
    ring_span = max_row - min_row + 1

    seg_ok = (size >= 30) | (
        (size >= cfg.segment_valid_point_num)
        & (ring_span >= cfg.segment_valid_line_num))

    cell_ok = eligible & seg_ok[safe_lab].reshape(L, S)
    cell_bad = eligible & ~cell_ok

    cols = jnp.arange(S, dtype=jnp.int32)[None, :]
    rows2d = jnp.arange(L, dtype=jnp.int32)[:, None]
    # outliers: invalid clusters, rings above ground region, 1-in-5 columns
    outlier = cell_bad & (rows2d > cfg.ground_scan_ind) & (cols % 5 == 0)

    # segmented cloud: valid clusters + downsampled ground
    ground_keep = ground & ~((cols % 5 != 0) & (cols > 5) & (cols < S - 5))
    seg_valid = cell_ok | ground_keep

    out_label = jnp.where(cell_ok, labels, -1)
    return out_label, seg_valid, outlier
