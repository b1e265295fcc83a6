"""Pallas connected-components kernel vs the exact XLA union-find labeling
(same component PARTITION, representatives may differ)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lins_tpu.config import VLP16
from lins_tpu.datasets import synthetic as syn
from lins_tpu.frontend import projection as P
from lins_tpu.frontend import segmentation as S
from lins_tpu.ops.pallas_label import label_components_pallas

CFG = VLP16.replace(max_points=28800)


def partitions_equal(a, b, eligible):
    """Two labelings define the same partition of eligible cells."""
    a = np.asarray(a)[np.asarray(eligible)]
    b = np.asarray(b)[np.asarray(eligible)]
    # map a-labels to b-labels bijectively
    _, ai = np.unique(a, return_inverse=True)
    _, bi = np.unique(b, return_inverse=True)
    return np.array_equal(ai, bi)


@pytest.fixture(scope="module")
def scan_edges():
    data = syn.generate_sequence(CFG, n_scans=1, kind="straight", speed=1.5)
    xyz = jnp.asarray(data["scans_xyz"][0])
    n = jnp.asarray(data["scans_n"][0])
    xyz_img, rng_img, valid, start, diff = jax.jit(
        lambda a, b: P.project(a, b, CFG))(xyz, n)
    ground = jax.jit(lambda a, b: P.ground_removal(a, b, CFG))(xyz_img, valid)
    eligible = valid & ~ground
    e_right, e_down = S.edge_masks(rng_img, eligible, CFG)
    labels_xla = S.label_components(rng_img, eligible, CFG)
    return e_right, e_down, eligible, labels_xla


def test_matches_xla_partition(scan_edges):
    e_right, e_down, eligible, labels_xla = scan_edges
    labels_pl = label_components_pallas(e_right, e_down, eligible, n_alt=5,
                                        interpret=True)
    assert partitions_equal(labels_pl, labels_xla, eligible)


def test_wrap_seam_merges():
    # one ring: cells 0..9 and S-10..S-1 all connected across the seam
    L, S_ = 4, 64
    eligible = jnp.zeros((L, S_), bool).at[1, :10].set(True).at[1, -10:].set(
        True)
    e_right = jnp.zeros((L, S_), bool)
    for j in list(range(0, 9)) + list(range(S_ - 10, S_ - 1)) + [S_ - 1]:
        e_right = e_right.at[1, j].set(True)
    # mask edges to eligible pairs only (seam edge S-1 -> 0 eligible)
    e_down = jnp.zeros((L, S_), bool)
    labels = label_components_pallas(e_right, e_down, eligible, n_alt=3,
                                     interpret=True)
    lab = np.asarray(labels)[1]
    vals = lab[np.asarray(eligible)[1]]
    assert len(np.unique(vals)) == 1  # one component across the seam


def test_vertical_chain():
    L, S_ = 8, 32
    eligible = jnp.zeros((L, S_), bool).at[:, 5].set(True)
    e_down = jnp.zeros((L, S_), bool).at[:-1, 5].set(True)
    e_right = jnp.zeros((L, S_), bool)
    labels = label_components_pallas(e_right, e_down, eligible, n_alt=3,
                                     interpret=True)
    vals = np.asarray(labels)[:, 5]
    assert len(np.unique(vals)) == 1


def test_zigzag_component():
    # snake: alternating row segments joined at alternating ends
    L, S_ = 6, 16
    eligible = jnp.zeros((L, S_), bool)
    e_right = jnp.zeros((L, S_), bool)
    e_down = jnp.zeros((L, S_), bool)
    for r in range(L):
        eligible = eligible.at[r, 2:14].set(True)
        for j in range(2, 13):
            e_right = e_right.at[r, j].set(True)
        join = 13 if r % 2 == 0 else 2
        if r + 1 < L:
            e_down = e_down.at[r, join].set(True)
    labels = label_components_pallas(e_right, e_down, eligible, n_alt=6,
                                     interpret=True)
    vals = np.asarray(labels)[np.asarray(eligible)]
    assert len(np.unique(vals)) == 1


def test_xla_label_from_edges_parity():
    """label_from_edges (the XLA union-find the estimator routes 64-row
    sensors to — the Mosaic kernel's scoped stack exceeds VMEM there) has
    the identical edges -> representative-labels contract.  Random
    production-consistent edge graphs (edges only between eligible cells);
    adversarial random graphs need n_alt=8 (the default 5 covers the
    zigzag depths real raycast scans produce, not these)."""
    from lins_tpu.frontend.segmentation import label_from_edges

    rng = np.random.default_rng(0)
    for L, S_, n_alt in ((16, 256, 5), (16, 1800, 8), (64, 360, 8)):
        el = rng.integers(0, 2, (L, S_)).astype(bool)
        er = rng.integers(0, 2, (L, S_)).astype(bool) & el \
            & np.roll(el, -1, axis=1)
        ed = rng.integers(0, 2, (L, S_)).astype(bool) & el
        ed[:-1] &= el[1:]
        ed[-1] = False
        a = np.asarray(label_components_pallas(
            jnp.asarray(er), jnp.asarray(ed), jnp.asarray(el),
            n_alt=n_alt, interpret=True))
        b = np.asarray(label_from_edges(jnp.asarray(er), jnp.asarray(ed),
                                        jnp.asarray(el)))
        np.testing.assert_array_equal(a, b, err_msg=f"{L}x{S_}")


class TestBlockedLabel:
    """Row-blocked Mosaic labeling + exact seam merge
    (label_components_blocked) vs the exact XLA union-find — the 64-row
    production path (round-5 HDL-64 throughput fix)."""

    def _random_edges(self, L, S_, seed, p=0.55):
        rng = np.random.default_rng(seed)
        eligible = jnp.asarray(rng.random((L, S_)) < 0.7)
        e_right = jnp.asarray(rng.random((L, S_)) < p) & eligible \
            & jnp.roll(eligible, -1, axis=1)
        e_down = (jnp.asarray(rng.random((L, S_)) < p) & eligible
                  & jnp.concatenate([eligible[1:],
                                     jnp.zeros((1, S_), bool)]))
        return e_right, e_down, eligible

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_xla_partition_random(self, seed):
        """Adversarial random graphs pin the SEAM-MERGE exactness; their
        zigzag depth exceeds the production n_alt=5 (which is validated on
        raycast geometry below / in test_matches_xla_64row_scan), so the
        per-block closure runs at n_alt=12 here."""
        from lins_tpu.ops.pallas_label import label_components_blocked

        L, S_ = 64, 200
        e_right, e_down, eligible = self._random_edges(L, S_, seed)
        lab_b = label_components_blocked(e_right, e_down, eligible,
                                         n_alt=12, interpret=True)
        lab_x = S.label_from_edges(e_right, e_down, eligible)
        assert partitions_equal(lab_b, lab_x, eligible)

    def test_representatives_are_min_members(self):
        from lins_tpu.ops.pallas_label import label_components_blocked

        e_right, e_down, eligible = self._random_edges(64, 128, 7)
        lab = np.asarray(label_components_blocked(e_right, e_down, eligible,
                                                  n_alt=12, interpret=True))
        el = np.asarray(eligible)
        labs = lab[el]
        ids = (np.arange(64 * 128).reshape(64, 128))[el]
        for rep in np.unique(labs):
            assert rep == ids[labs == rep].min()

    def test_tall_component_crossing_all_seams(self):
        from lins_tpu.ops.pallas_label import label_components_blocked

        L, S_ = 64, 64
        eligible = jnp.zeros((L, S_), bool).at[:, 5].set(True)
        e_down = jnp.zeros((L, S_), bool).at[:-1, 5].set(True)
        e_right = jnp.zeros((L, S_), bool)
        lab = np.asarray(label_components_blocked(e_right, e_down, eligible,
                                                  interpret=True))
        col = lab[:, 5]
        assert (col == col[0]).all() and col[0] == 5

    def test_matches_xla_64row_scan(self):
        """Production-n_alt parity on real raycast geometry at 64 rows —
        the shapes the blocked path actually serves (HDL-64/OS1-64)."""
        from lins_tpu.config import SlamConfig
        from lins_tpu.ops.pallas_label import label_components_blocked

        cfg = SlamConfig(line_num=64, scan_num=225, ang_res_x=1.6,
                         ang_res_y=26.9 / 63, ang_bottom=24.9,
                         ground_scan_ind=50, max_points=14400)
        data = syn.generate_sequence(cfg, n_scans=1, kind="straight",
                                     speed=1.5)
        xyz = jnp.asarray(data["scans_xyz"][0])
        n = jnp.asarray(data["scans_n"][0])
        xyz_img, rng_img, valid, start, diff = jax.jit(
            lambda a, b: P.project(a, b, cfg))(xyz, n)
        ground = jax.jit(
            lambda a, b: P.ground_removal(a, b, cfg))(xyz_img, valid)
        eligible = valid & ~ground
        e_right, e_down = S.edge_masks(rng_img, eligible, cfg)
        lab_b = label_components_blocked(e_right, e_down, eligible,
                                         interpret=True)
        lab_x = S.label_from_edges(e_right, e_down, eligible)
        assert partitions_equal(lab_b, lab_x, eligible)
