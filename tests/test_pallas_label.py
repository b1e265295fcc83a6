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
