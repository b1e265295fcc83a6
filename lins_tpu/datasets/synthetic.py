"""Synthetic LiDAR-inertial world: analytic trajectories, VLP-16 raycasting,
IMU synthesis.  The reference has no test data generator (SURVEY.md §4); this
module provides golden-trajectory fixtures: a world of ground plane + walls +
poles, raycast scans with real motion distortion, and IMU samples derived from
the analytic trajectory via autodiff.

Scan point layout is azimuth-major (all rings per firing), matching the VLP-16
driver ordering the reference assumes (image_projection_node.cpp:191-203).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lins_tpu.config import SlamConfig
from lins_tpu.geom import so3


@dataclasses.dataclass(frozen=True)
class World:
    """Vertical rectangular walls, vertical cylinder poles, ground z=0."""

    walls: tuple = ()   # each: (x0, y0, x1, y1, height)
    poles: tuple = ()   # each: (cx, cy, radius, height)

    def as_arrays(self):
        walls = np.asarray(self.walls, np.float32).reshape(-1, 5)
        poles = np.asarray(self.poles, np.float32).reshape(-1, 4)
        return jnp.asarray(walls), jnp.asarray(poles)


def default_world() -> World:
    """A corridor with poles — planar surfs, wall-corner + pole edges."""
    walls = (
        (-10.0, -8.0, 40.0, -8.0, 4.0),   # right wall
        (-10.0, 8.0, 40.0, 8.0, 4.0),     # left wall
        (40.0, -8.0, 40.0, 8.0, 4.0),     # far wall
        (-10.0, -8.0, -10.0, 8.0, 4.0),   # rear wall
        # jutting partitions: their free ends are true fixed edge features
        (6.0, -8.0, 6.0, -5.5, 3.0),
        (12.0, 8.0, 12.0, 5.0, 3.0),
        (15.0, -8.0, 15.0, -3.0, 3.0),
        (20.0, 8.0, 20.0, 4.5, 3.0),
        (25.0, -8.0, 25.0, -4.0, 3.0),
        (30.0, 8.0, 30.0, 3.0, 3.0),
        (35.0, -8.0, 35.0, -5.0, 3.0),
        (2.0, 8.0, 2.0, 5.5, 3.0),
    )
    # thin poles: small radius keeps the viewpoint-dependent silhouette shift
    # (a cylinder artifact) well below the lidar noise floor
    poles = (
        (5.0, -4.0, 0.06, 5.0),
        (8.0, 3.0, 0.06, 5.0),
        (18.0, 2.0, 0.05, 5.0),
        (22.0, -5.0, 0.06, 5.0),
        (30.0, 0.0, 0.07, 5.0),
        (12.0, 6.0, 0.05, 5.0),
        (34.0, -6.0, 0.06, 5.0),
        (2.0, 6.5, 0.05, 5.0),
    )
    return World(walls=walls, poles=poles)


def big_world() -> World:
    """A large ring course: 94x64 m outer hall around a 46x20 m inner
    island, partitions + poles along the circuit.  Built for the `bigloop`
    trajectory (~181 m lap, extent 70 m) whose span EXCEEDS the 50 m
    radius-mode window — the sequence where loop closure is the only path
    to accuracy (VERDICT r3 #3)."""
    walls = (
        # outer hall
        (-12.0, -32.0, 82.0, -32.0, 5.0),
        (-12.0, 32.0, 82.0, 32.0, 5.0),
        (82.0, -32.0, 82.0, 32.0, 5.0),
        (-12.0, -32.0, -12.0, 32.0, 5.0),
        # inner island
        (12.0, -10.0, 58.0, -10.0, 4.0),
        (12.0, 10.0, 58.0, 10.0, 4.0),
        (58.0, -10.0, 58.0, 10.0, 4.0),
        (12.0, -10.0, 12.0, 10.0, 4.0),
        # partitions jutting from the outer walls (fixed edge features)
        (0.0, -32.0, 0.0, -28.0, 4.0),
        (25.0, -32.0, 25.0, -29.0, 4.0),
        (50.0, -32.0, 50.0, -29.0, 4.0),
        (75.0, -32.0, 75.0, -28.0, 4.0),
        (0.0, 32.0, 0.0, 28.0, 4.0),
        (25.0, 32.0, 25.0, 29.0, 4.0),
        (50.0, 32.0, 50.0, 29.0, 4.0),
        (75.0, 32.0, 75.0, 28.0, 4.0),
        (-12.0, 0.0, -8.0, 0.0, 4.0),
        (82.0, 0.0, 78.0, 0.0, 4.0),
        # partitions jutting from the island
        (20.0, -10.0, 20.0, -13.0, 3.5),
        (45.0, -10.0, 45.0, -13.0, 3.5),
        (20.0, 10.0, 20.0, 13.0, 3.5),
        (45.0, 10.0, 45.0, 13.0, 3.5),
        (12.0, 0.0, 9.0, 0.0, 3.5),
        (58.0, 0.0, 61.0, 0.0, 3.5),
    )
    poles = (
        (-5.0, 15.0, 0.06, 5.0), (-5.0, -15.0, 0.06, 5.0),
        (10.0, 25.0, 0.06, 5.0), (30.0, 27.0, 0.07, 5.0),
        (55.0, 26.0, 0.06, 5.0), (75.0, 15.0, 0.06, 5.0),
        (78.0, -12.0, 0.05, 5.0), (60.0, -26.0, 0.06, 5.0),
        (30.0, -28.0, 0.07, 5.0), (5.0, -25.0, 0.06, 5.0),
        (67.0, 24.0, 0.05, 5.0), (8.0, -17.0, 0.05, 5.0),
    )
    return World(walls=walls, poles=poles)


# ---------------------------------------------------------------------------
# Trajectories (analytic, differentiated with jax for exact IMU)
# ---------------------------------------------------------------------------

def make_trajectory(kind: str = "gentle", speed: float = 1.0,
                    z0: float = 0.8, loop_scale: float = 1.0) -> Callable:
    """Returns pose(t) -> (p_world (3,), q_wb (4,) wxyz) as a jax-traceable fn.

    Body x-axis tracks the direction of travel (yaw from velocity), with
    small smooth roll/pitch wobble so all IMU axes are exercised.
    """
    if kind == "static":
        def pos(t):
            return jnp.stack([0.0 * t, 0.0 * t, z0 + 0.0 * t])
    elif kind == "straight":
        def pos(t):
            return jnp.stack([speed * t, 0.0 * t, z0 + 0.0 * t])
    elif kind == "gentle":
        def pos(t):
            return jnp.stack([
                speed * t,
                1.5 * jnp.sin(0.15 * t),
                z0 + 0.05 * jnp.sin(0.3 * t),
            ])
    elif kind == "turny":
        # y amplitude 3.5 (max 7 m) keeps the arc INSIDE the default
        # corridor's y = +-8 walls: the round-2 version (amplitude 6,
        # y up to 12) drove through the left wall and out of the raycast
        # world for the last ~20% of a 13 s run — those out-of-world scans
        # carried 11x the per-scan odometry error and were the entire
        # "turny is 10x worse than gentle" gap (round-3 diagnosis).
        def pos(t):
            return jnp.stack([
                8.0 * jnp.sin(0.12 * speed * t),
                3.5 * (1 - jnp.cos(0.12 * speed * t)),
                z0 + 0.05 * jnp.sin(0.4 * t),
            ])
    elif kind == "loop":
        # closed ellipse circuit inside the corridor, starting/ending at
        # the origin: after one lap (~64 m / `speed` seconds) the vehicle
        # REVISITS its starting area, so end-to-end loop closure can fire
        # (detect radius 5 m + age 30 s, lidar_mapping_node.cpp:1043-1112).
        # Run >= 1.05 laps: e.g. 450 scans at speed 1.5.  loop_scale
        # shrinks the circuit (tests use a small lap + reduced
        # loop_time_gate to close a loop quickly on CPU).
        a, b = 14.0 * loop_scale, 5.5 * loop_scale
        # Ramanujan perimeter; omega scales so mean speed ~= `speed`
        per = np.pi * (3.0 * (a + b)
                       - np.sqrt((3.0 * a + b) * (a + 3.0 * b)))
        om = 2.0 * np.pi * speed / per

        def pos(t):
            return jnp.stack([
                a * (1.0 - jnp.cos(om * t)),
                b * jnp.sin(om * t),
                z0 + 0.05 * jnp.sin(0.3 * t),
            ])
    elif kind == "bigloop":
        # the big_world() ring course: a 35x22 m half-axis ellipse
        # (~181 m lap — at 1.5 m/s a ~121 s lap, 4x the 30 s age gate)
        # whose 70 m extent exceeds the 50 m radius window, so revisits
        # depend on loop closure, not direct radius-mode map reuse
        a, b = 35.0, 22.0
        per = np.pi * (3.0 * (a + b)
                       - np.sqrt((3.0 * a + b) * (a + 3.0 * b)))
        om = 2.0 * np.pi * speed / per

        def pos(t):
            return jnp.stack([
                a * (1.0 - jnp.cos(om * t)),
                b * jnp.sin(om * t),
                z0 + 0.05 * jnp.sin(0.3 * t),
            ])
    else:
        raise ValueError(kind)

    vel = jax.jacfwd(pos)

    def pose(t):
        p = pos(t)
        v = vel(t)
        yaw = jnp.arctan2(v[1], jnp.where(jnp.abs(v[0]) < 1e-9, 1e-9, v[0]))
        roll = 0.02 * jnp.sin(0.5 * t)
        pitch = 0.02 * jnp.sin(0.37 * t + 1.0)
        q = so3.rpy_to_quat(jnp.stack([roll, pitch, yaw]))
        return p, q

    return pose


# ---------------------------------------------------------------------------
# Raycasting
# ---------------------------------------------------------------------------

def _ray_world_hits(origin, direction, walls, poles, max_range):
    """Min positive hit distance of one ray against ground/walls/poles."""
    t_best = jnp.asarray(max_range, origin.dtype)

    # ground plane z = 0
    dz = direction[2]
    t_g = jnp.where(dz < -1e-6, -origin[2] / jnp.where(dz < -1e-6, dz, -1.0),
                    jnp.inf)
    t_best = jnp.minimum(t_best, jnp.where(t_g > 0.1, t_g, jnp.inf))

    # walls: vertical plane through segment (x0,y0)-(x1,y1)
    x0, y0, x1, y1, h = (walls[:, 0], walls[:, 1], walls[:, 2], walls[:, 3],
                         walls[:, 4])
    ex, ey = x1 - x0, y1 - y0
    # plane normal (ey, -ex, 0)
    denom = direction[0] * ey - direction[1] * ex
    num = (x0 - origin[0]) * ey - (y0 - origin[1]) * ex
    t_w = jnp.where(jnp.abs(denom) > 1e-9, num / denom, jnp.inf)
    px = origin[0] + t_w * direction[0]
    py = origin[1] + t_w * direction[1]
    pz = origin[2] + t_w * direction[2]
    seg_len2 = ex * ex + ey * ey
    u = ((px - x0) * ex + (py - y0) * ey) / jnp.maximum(seg_len2, 1e-9)
    ok = (t_w > 0.1) & (u >= 0.0) & (u <= 1.0) & (pz >= 0.0) & (pz <= h)
    t_best = jnp.minimum(t_best, jnp.min(jnp.where(ok, t_w, jnp.inf)))

    # poles: |o_xy + t d_xy - c|^2 = r^2
    cx, cy, r, ph = poles[:, 0], poles[:, 1], poles[:, 2], poles[:, 3]
    ox, oy = origin[0] - cx, origin[1] - cy
    a = direction[0] ** 2 + direction[1] ** 2
    b = 2.0 * (ox * direction[0] + oy * direction[1])
    c = ox * ox + oy * oy - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_p = (-b - sq) / jnp.maximum(2 * a, 1e-9)
    pz = origin[2] + t_p * direction[2]
    ok = (disc > 0) & (t_p > 0.1) & (pz >= 0.0) & (pz <= ph)
    t_best = jnp.minimum(t_best, jnp.min(jnp.where(ok, t_p, jnp.inf)))
    return t_best


@partial(jax.jit, static_argnames=("cfg", "distort", "pose_fn"))
def raycast_scan(pose_fn, t0, walls, poles, cfg: SlamConfig,
                 distort: bool = True, max_range: float = 80.0):
    """One full sweep starting at time t0.  Returns (xyz (L*S, 3), hit mask).

    Points are emitted azimuth-major in the *sensor frame at firing time*
    (i.e. physically motion-distorted when `distort`).
    """
    L, S = cfg.line_num, cfg.scan_num
    cols = jnp.arange(S)
    rel = cols / S
    times = t0 + jnp.where(distort, rel, 0.0) * cfg.scan_period

    # beam directions in sensor frame: azimuth sweep a = 2*pi*rel,
    # oriented so ori = -atan2(y, x) increases from -pi over the sweep
    az = jnp.pi - 2.0 * jnp.pi * rel
    elev = so3.deg2rad(-cfg.ang_bottom + 0.1 + cfg.ang_res_y *
                       jnp.arange(L, dtype=jnp.float32))
    ce, se = jnp.cos(elev), jnp.sin(elev)
    ca, sa = jnp.cos(az), jnp.sin(az)
    # dir[s, l] in sensor frame
    dirs = jnp.stack([
        ce[None, :] * ca[:, None],
        ce[None, :] * sa[:, None],
        jnp.broadcast_to(se[None, :], (S, L)),
    ], axis=-1)  # (S, L, 3)

    def per_col(t, d_col):
        p, q = pose_fn(t)
        d_world = so3.quat_rotate(q[None, :], d_col)
        hit = jax.vmap(lambda dw: _ray_world_hits(p, dw, walls, poles,
                                                  max_range))(d_world)
        return hit

    ranges = jax.vmap(per_col)(times, dirs)  # (S, L)
    hit = ranges < max_range - 1e-3
    pts = dirs * ranges[..., None]
    return pts.reshape(L * S, 3), hit.reshape(L * S)


def compact_scan(pts: np.ndarray, hit: np.ndarray, max_points: int):
    """Drop misses, pad to capacity — host-side (replaces removeNaN)."""
    pts = np.asarray(pts)[np.asarray(hit)]
    n = min(len(pts), max_points)
    out = np.zeros((max_points, 3), np.float32)
    out[:n] = pts[:n]
    return out, np.int32(n)


# ---------------------------------------------------------------------------
# IMU synthesis
# ---------------------------------------------------------------------------

def generate_imu(pose_fn, t_start, t_end, rate, ba=(0, 0, 0), bw=(0, 0, 0),
                 acc_noise=0.0, gyr_noise=0.0, seed=0, gravity=9.81):
    """IMU samples on [t_start, t_end] from the analytic trajectory.

    acc = R_wbᵀ (p̈ - g) + ba + n,  gyr = (R_wbᵀ Ṙ_wb)∨ + bw + n,
    with derivatives from jax autodiff (exact).
    """
    def p_of_t(t):
        return pose_fn(t)[0]

    def q_of_t(t):
        return pose_fn(t)[1]

    acc_w_fn = jax.jacfwd(jax.jacfwd(p_of_t))
    dq_fn = jax.jacfwd(q_of_t)

    @jax.jit
    def sample(t):
        p, q = pose_fn(t)
        a_w = acc_w_fn(t)
        g = jnp.asarray([0.0, 0.0, -gravity])
        f_b = so3.quat_rotate_inv(q, a_w - g)
        dq = dq_fn(t)
        # omega_body: q_dot = 0.5 * q ⊗ [0, w]  =>  [0, w] = 2 q^{-1} ⊗ q_dot
        wq = 2.0 * so3.quat_mul(so3.quat_conj(q), dq)
        return f_b, wq[1:4]

    n = int(round((t_end - t_start) * rate)) + 1
    times = np.asarray(t_start + np.arange(n) / rate, np.float64)
    accs, gyrs = jax.vmap(sample)(jnp.asarray(times))
    rng = np.random.default_rng(seed)
    accs = np.asarray(accs) + np.asarray(ba) + rng.normal(0, acc_noise, (n, 3))
    gyrs = np.asarray(gyrs) + np.asarray(bw) + rng.normal(0, gyr_noise, (n, 3))
    return times, accs.astype(np.float64), gyrs.astype(np.float64)


# ---------------------------------------------------------------------------
# Full sequence
# ---------------------------------------------------------------------------

def generate_sequence(cfg: SlamConfig, n_scans: int = 20, kind: str = "gentle",
                      speed: float = 1.0, world: World | None = None,
                      imu_rate: float = 400.0, ba=(0, 0, 0), bw=(0, 0, 0),
                      acc_noise: float = 0.0, gyr_noise: float = 0.0,
                      distort: bool = True, seed: int = 0,
                      loop_scale: float = 1.0):
    """Scans + IMU + ground-truth poses for n_scans sweeps from t=0.

    Returns a dict of host numpy arrays:
      scans_xyz (n, max_points, 3), scans_n (n,), scan_times (n,) [sweep start],
      imu_times/acc/gyr, gt_pos/gt_quat at each sweep *end* time.
    """
    world = world or (big_world() if kind == "bigloop" else default_world())
    walls, poles = world.as_arrays()
    pose_fn = make_trajectory(kind, speed, loop_scale=loop_scale)

    scans, counts = [], []
    for k in range(n_scans):
        pts, hit = raycast_scan(pose_fn, jnp.float32(k * cfg.scan_period),
                                walls, poles, cfg, distort)
        xyz, n = compact_scan(pts, hit, cfg.max_points)
        scans.append(xyz)
        counts.append(n)

    t_end = n_scans * cfg.scan_period
    imu_t, acc, gyr = generate_imu(pose_fn, 0.0, t_end + 0.01, imu_rate,
                                   ba, bw, acc_noise, gyr_noise, seed,
                                   cfg.gravity)

    scan_times = np.arange(n_scans) * cfg.scan_period
    end_times = scan_times + cfg.scan_period
    gt_p, gt_q = jax.vmap(pose_fn)(jnp.asarray(end_times, jnp.float32))
    return dict(
        scans_xyz=np.stack(scans), scans_n=np.asarray(counts),
        scan_times=scan_times, imu_times=imu_t, imu_acc=acc, imu_gyr=gyr,
        gt_pos=np.asarray(gt_p), gt_quat=np.asarray(gt_q),
        pose_fn=pose_fn,
    )
