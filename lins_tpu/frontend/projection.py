"""Range-image projection + ground removal (reference C4/C5).

Re-designs image_projection_node.cpp:191-287 as fixed-shape jnp scatters on the
(line_num, scan_num) grid.  Deviation from the reference: on cell collisions we
keep the *closest* point (deterministic min-scatter) instead of
last-written-wins; and start/end orientation uses the last point's own x,y
(the reference mixes y[N-1] with x[N-2], image_projection_node.cpp:195-196).
"""
from __future__ import annotations

import jax.numpy as jnp

from lins_tpu.config import SlamConfig


def find_start_end_angle(xyz: jnp.ndarray, n_points: jnp.ndarray):
    """Start/end azimuth of the sweep (image_projection_node.cpp:191-203)."""
    first = xyz[0]
    last = xyz[jnp.maximum(n_points - 1, 0)]
    start = -jnp.arctan2(first[1], first[0])
    end = -jnp.arctan2(last[1], last[0]) + 2.0 * jnp.pi
    diff = end - start
    end = jnp.where(diff > 3.0 * jnp.pi, end - 2.0 * jnp.pi,
                    jnp.where(diff < jnp.pi, end + 2.0 * jnp.pi, end))
    return start, end - start


def project(xyz: jnp.ndarray, n_points: jnp.ndarray, cfg: SlamConfig):
    """Project an unordered cloud (N,3) into the range image.

    Returns (xyz_img (L,S,3), rng_img (L,S), valid (L,S), start, diff).
    Mirrors projectPointCloud (image_projection_node.cpp:205-241).
    """
    L, S = cfg.line_num, cfg.scan_num
    n = xyz.shape[0]
    idx_valid = jnp.arange(n) < n_points
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    nonzero = jnp.sum(xyz * xyz, axis=-1) > 1e-6
    ok = idx_valid & finite & nonzero

    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    horiz_dist = jnp.sqrt(x * x + y * y)
    vert_angle = jnp.arctan2(z, horiz_dist) * (180.0 / jnp.pi)
    row = jnp.floor((vert_angle + cfg.ang_bottom) / cfg.ang_res_y).astype(jnp.int32)

    horizon_angle = jnp.arctan2(x, y) * (180.0 / jnp.pi)
    col = (-jnp.round((horizon_angle - 90.0) / cfg.ang_res_x)).astype(jnp.int32) + S // 2
    col = jnp.where(col >= S, col - S, col)

    rng = jnp.sqrt(x * x + y * y + z * z)
    ok = ok & (row >= 0) & (row < L) & (col >= 0) & (col < S)

    # keep the closest point per cell: scatter-min on range, then re-scatter
    # the winning point's index
    flat = jnp.where(ok, row * S + col, L * S)  # overflow slot for invalid
    rng_key = jnp.where(ok, rng, jnp.inf)
    rng_img = jnp.full((L * S + 1,), jnp.inf, rng.dtype).at[flat].min(rng_key)

    # winner index per cell: scatter-min of (rank-encoded) point index where
    # this point's range equals the cell min (ties -> lowest index)
    is_winner = ok & (rng_key == rng_img[flat])
    pidx = jnp.where(is_winner, jnp.arange(n, dtype=jnp.int32), n)
    win = jnp.full((L * S + 1,), n, jnp.int32).at[flat].min(pidx)

    win_img = win[: L * S].reshape(L, S)
    valid = win_img < n
    safe = jnp.where(valid, win_img, 0)
    xyz_img = jnp.where(valid[..., None], xyz[safe], 0.0)
    rng_out = rng_img[: L * S].reshape(L, S)

    start, diff = find_start_end_angle(xyz, n_points)
    return xyz_img, rng_out, valid, start, diff


def ground_removal(xyz_img: jnp.ndarray, valid: jnp.ndarray, cfg: SlamConfig):
    """Ground flags via inter-ring slope (image_projection_node.cpp:243-287).

    A cell (i,j), i < ground_scan_ind, and the cell above it are ground when the
    slope angle between them is within 10 deg of the sensor mount angle.
    """
    L, S = cfg.line_num, cfg.scan_num
    g = cfg.ground_scan_ind

    lower = xyz_img[:g]            # rings 0..g-1
    upper = xyz_img[1:g + 1]       # rings 1..g
    both = valid[:g] & valid[1:g + 1]

    d = upper - lower
    angle = jnp.arctan2(d[..., 2], jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2))
    angle = angle * (180.0 / jnp.pi)
    is_ground_pair = both & (jnp.abs(angle - cfg.sensor_mount_angle) <= 10.0)

    ground = jnp.zeros((L, S), bool)
    ground = ground.at[:g].set(is_ground_pair)
    ground = ground.at[1:g + 1].max(is_ground_pair)
    return ground & valid
