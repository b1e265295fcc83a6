"""Front-end tests: projection, ground, segmentation, features (SURVEY.md §4.1).

Uses the synthetic raycast world as fixture — known planes/poles must produce
known ground flags, cluster structure, and feature labels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.frontend import make_frontend, process_cloud
from lins_tpu.frontend import projection as P
from lins_tpu.frontend import segmentation as S

CFG = VLP16.replace(max_points=28800)


@pytest.fixture(scope="module")
def scan0():
    world = syn.default_world()
    walls, poles = world.as_arrays()
    pose_fn = syn.make_trajectory("gentle", 1.0)
    pts, hit = syn.raycast_scan(pose_fn, jnp.float32(0.0), walls, poles, CFG,
                                distort=True)
    xyz, n = syn.compact_scan(np.asarray(pts), np.asarray(hit), CFG.max_points)
    return jnp.asarray(xyz), jnp.asarray(n)


@pytest.fixture(scope="module")
def frontend_out(scan0):
    fe = make_frontend(CFG)
    return fe(*scan0)


class TestPaddedEdges:
    """Padded-array boundary cases: zero valid points, full capacity."""

    def test_zero_points_no_nan(self):
        xyz = jnp.zeros((CFG.max_points, 3), jnp.float32)
        _, seg, feats = process_cloud(xyz, jnp.int32(0), CFG)
        assert int(seg.count.sum()) == 0
        for name in ("sharp", "less_sharp", "flat", "less_flat", "outlier"):
            fc = getattr(feats, name)
            assert int(fc.valid.sum()) == 0
            assert bool(jnp.all(jnp.isfinite(fc.xyz)))

    def test_exactly_full_capacity(self, scan0):
        xyz, n = scan0
        full = jnp.broadcast_to(xyz[:1], (CFG.max_points, 3)) * 0 + xyz
        _, seg, feats = process_cloud(full, jnp.int32(CFG.max_points), CFG)
        assert bool(jnp.all(jnp.isfinite(feats.less_flat.xyz)))
        # caps respected
        assert int(feats.sharp.valid.sum()) <= CFG.max_sharp
        assert int(feats.less_flat.valid.sum()) <= CFG.max_less_flat


class TestProjection:
    def test_known_point_cell(self):
        # point straight ahead (+x), elevation ~ +1 deg above horizontal
        r = 10.0
        elev = np.deg2rad(1.0)
        xyz = np.zeros((CFG.max_points, 3), np.float32)
        xyz[0] = [r * np.cos(elev), 0.0, r * np.sin(elev)]
        img, rng, valid, start, diff = P.project(
            jnp.asarray(xyz), jnp.int32(1), CFG)
        # row = floor((1 + 15.1)/2) = 8 ; col: horizonAngle=atan2(x,y)=90deg
        # -> col = 0 + 900
        assert bool(valid[8, 900])
        np.testing.assert_allclose(float(rng[8, 900]), r, rtol=1e-5)

    def test_collision_keeps_closest(self):
        xyz = np.zeros((CFG.max_points, 3), np.float32)
        xyz[0] = [10.0, 0.0, 0.1]
        xyz[1] = [5.0, 0.0, 0.05]  # same cell, closer
        img, rng, valid, *_ = P.project(jnp.asarray(xyz), jnp.int32(2), CFG)
        row = int(np.floor((np.rad2deg(np.arctan2(0.1, 10.0)) + CFG.ang_bottom)
                           / CFG.ang_res_y))
        np.testing.assert_allclose(float(rng[row, 900]), 5.0, rtol=1e-3)

    def test_full_scan_projects_all(self, scan0, frontend_out):
        img = frontend_out[0]
        # raycast emits exactly one point per (ring, col) cell that hit
        assert int(img.valid.sum()) == int(scan0[1])

    def test_orientation_diff_near_2pi(self, frontend_out):
        diff = float(frontend_out[0].orientation_diff)
        assert 1.5 * np.pi < diff < 2.5 * np.pi


class TestGround:
    def test_bottom_rings_ground(self, frontend_out):
        img = frontend_out[0]
        g = np.asarray(img.ground)
        # downward-looking rings over a flat floor must be mostly ground
        frac = g[:4].sum() / max(np.asarray(img.valid)[:4].sum(), 1)
        assert frac > 0.8
        # rings above the ground band are never flagged
        assert g[CFG.ground_scan_ind + 1:].sum() == 0


class TestSegmentation:
    def test_walls_form_clusters(self, frontend_out):
        img = frontend_out[0]
        lab = np.asarray(img.label)
        valid_labels = lab[lab >= 0]
        # a few large clusters (walls/poles), not thousands of fragments
        uniq, counts = np.unique(valid_labels, return_counts=True)
        # every kept cluster satisfies the validity rule (>=5 points)
        assert counts.min() >= CFG.segment_valid_point_num
        assert counts.max() > 1000  # the long walls survive as large components

    def test_small_isolated_cluster_outlier(self):
        # a lone small blob high above the ground, away from everything
        xyz = np.zeros((CFG.max_points, 3), np.float32)
        # 4 points on ring 12 (elev ~ +9deg), adjacent cols: small cluster
        elev = np.deg2rad(-15.1 + 2.0 * 12 + 0.5)
        for i, az_deg in enumerate([0.1, 0.3, 0.5, 0.7]):
            az = np.deg2rad(az_deg)
            d = 20.0
            xyz[i] = [d * np.cos(elev) * np.cos(az),
                      d * np.cos(elev) * np.sin(az), d * np.sin(elev)]
        img, rng, valid, start, diff = P.project(jnp.asarray(xyz),
                                                 jnp.int32(4), CFG)
        ground = P.ground_removal(img, valid, CFG)
        label, seg_valid, outlier = S.segment(rng, valid, ground, CFG)
        lab = np.asarray(label)
        assert (lab >= 0).sum() == 0  # cluster of 4 rejected (<5 pts)

    def test_ground_downsampled_in_segmented(self, frontend_out):
        seg = frontend_out[1]
        # ground rings keep ~1/5 of columns
        c = np.asarray(seg.count)
        assert np.all(c[:5] < 500)


class TestFeatures:
    def test_flat_counts_exact(self, frontend_out):
        feats = frontend_out[2]
        # 4 flat picks per sector on every fully-ground ring (ref behavior)
        assert int(feats.flat.valid.sum()) == 6 * CFG.sections_total * 4

    def test_sharp_subset_of_less_sharp_budget(self, frontend_out):
        feats = frontend_out[2]
        n_sharp = int(feats.sharp.valid.sum())
        n_less = int(feats.less_sharp.valid.sum())
        assert 0 < n_sharp <= 16 * 6 * 2
        assert n_sharp <= n_less <= 16 * 6 * 20

    def test_sharp_points_on_structure(self, frontend_out):
        # sharp (edge) points should be on poles or wall corners — i.e. NOT on
        # the ground plane
        feats = frontend_out[2]
        xyz = np.asarray(feats.sharp.xyz)[np.asarray(feats.sharp.valid)]
        # sensor sits at 0.8 m: all edges must be above the world ground plane
        assert np.all(xyz[:, 2] > -0.79)
        # and edges never come from the ground band rings alone
        rings = np.asarray(feats.sharp.ring)[np.asarray(feats.sharp.valid)]
        assert rings.max() > CFG.ground_scan_ind

    def test_masks_consistent(self, frontend_out):
        feats = frontend_out[2]
        for fc in feats:
            v = np.asarray(fc.valid)
            xyz = np.asarray(fc.xyz)
            assert np.all(np.isfinite(xyz[v]))
            # invalid slots zeroed or garbage but finite masks
            assert v.dtype == bool

    def test_rel_time_range(self, frontend_out):
        seg = frontend_out[1]
        rel = np.asarray(seg.rel_time)[np.asarray(seg.valid)]
        assert rel.min() >= 0.0 and rel.max() <= 1.0
        assert rel.std() > 0.2  # spans the sweep

    def test_jit_stability(self, scan0):
        # second call with different data must not retrace (same shapes)
        fe = make_frontend(CFG)
        out1 = fe(*scan0)
        xyz2 = scan0[0] * 1.001
        out2 = fe(xyz2, scan0[1])
        assert int(out2[2].sharp.valid.sum()) > 0


class TestTrajectoryWorldConsistency:
    def test_standard_trajectories_stay_inside_world(self):
        """Regression guard for the round-2 turny artifact: the trajectory
        drove through the corridor's y=8 wall and out of the raycast world
        for the last ~20% of a 13 s run, and those out-of-world scans
        carried 11x the per-scan odometry error — the entire 'turny is 10x
        worse than gentle' accuracy gap.  Every standard benchmark
        trajectory must stay inside the default world with >= 1 m of wall
        clearance for its benchmark horizon."""
        import jax
        import jax.numpy as jnp

        from lins_tpu.datasets import synthetic as syn

        horizons = {"gentle": (1.5, 13.3), "turny": (1.5, 13.3),
                    "straight": (1.5, 13.3), "loop": (1.5, 45.0)}
        for kind, (speed, t_end) in horizons.items():
            pose_fn = syn.make_trajectory(kind, speed)
            ts = jnp.linspace(0.0, t_end, 400)
            p = np.asarray(jax.vmap(pose_fn)(ts)[0])
            assert p[:, 0].min() > -9.0 and p[:, 0].max() < 39.0, kind
            assert np.abs(p[:, 1]).max() < 7.01, (kind, p[:, 1].max())
            assert p[:, 2].min() > 0.2, kind

    def test_bigloop_stays_in_ring(self):
        """bigloop lives in big_world(): inside the outer hall, outside the
        inner island, >= 2 m clearance to both for 1.1 laps."""
        import jax
        import jax.numpy as jnp

        from lins_tpu.datasets import synthetic as syn

        pose_fn = syn.make_trajectory("bigloop", 1.5)
        ts = jnp.linspace(0.0, 135.0, 1200)   # ~1.1 laps at 1.5 m/s
        p = np.asarray(jax.vmap(pose_fn)(ts)[0])
        assert p[:, 0].min() > -10.0 and p[:, 0].max() < 80.0
        assert np.abs(p[:, 1]).max() < 30.0
        inside_island = ((p[:, 0] > 10.0) & (p[:, 0] < 60.0)
                         & (np.abs(p[:, 1]) < 12.0))
        assert not inside_island.any()
        # the circuit's extent must exceed the 50 m radius window
        assert p[:, 0].max() - p[:, 0].min() > 60.0
