"""Grid connected-components as a single Pallas kernel (segmentation hot
path, SURVEY.md C6).

The XLA label-propagation loop costs ~5 ms/scan in per-op dispatch; this
kernel runs the whole closure in VMEM with log-shift propagation:

  * horizontal closure: within-run min propagation by shifts 1,2,4,…  —
    a cell absorbs the label k columns away iff both share a *run id*
    (prefix count of broken edges), which closes every row run in
    log2(2S) steps.  Column wrap is handled by doubling the columns, so
    seam-crossing runs are contiguous; the doubled halves fold with min.
  * vertical closure: same with shifts 1,2,4,8 over the 16 rows.
  * H/V closures alternate `n_alt` times — enough for any component whose
    row/column zigzag depth is ≤ n_alt (validated against the exact XLA
    union-find labeling on raycast scans).

Sized for 16-row sensors: on 64-row grids the default n_alt=5 can leave
deep zigzag components unconverged (adversarial random-graph case needs 8;
tests/test_frontend.py pins kernel-vs-XLA parity), and the kernel's scoped
VMEM stack (~250 B/cell, batch-independent) exceeds the 16 MB limit at
(64, 1800) anyway — estimator._kernel_label_fits routes such shapes to the
XLA path (frontend/segmentation.label_from_edges, identical contract).

No gathers, no scatters — only rolls, compares, min — i.e. pure VPU work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2 ** 30  # python literal: jnp constants would be captured consts in pallas


def _roll(x, k, axis=1):
    """pltpu.roll with negative-shift support (shift right by k)."""
    return pltpu.roll(x, k % x.shape[axis], axis)


def _prefix_sum_row(x):
    """Inclusive prefix sum along axis 1 via log shifts (wrap-safe because
    callers only compare equality of monotone run ids)."""
    n = x.shape[1]
    out = x
    k = 1
    while k < n:
        shifted = _roll(out, k)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        out = out + jnp.where(col >= k, shifted, 0)
        k *= 2
    return out


def _closure_h(lab, conn_right):
    """Min-closure along rows within runs of connected cells (doubled row)."""
    S2 = lab.shape[1]
    # run id: prefix count of breaks; edge between col i-1 and i is
    # conn_right rolled by 1
    conn_left = _roll(conn_right, 1)
    breaks = 1 - conn_left
    run = _prefix_sum_row(breaks)
    k = 1
    while k < S2:
        same = run == _roll(run, k)
        lab = jnp.minimum(lab, jnp.where(same, _roll(lab, k), _BIG))
        same_b = run == _roll(run, -k)
        lab = jnp.minimum(lab, jnp.where(same_b, _roll(lab, -k), _BIG))
        k *= 2
    return lab


def _closure_v(lab, conn_down, L):
    """Min-closure along columns within vertical runs (no wrap)."""
    row = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 0)
    conn_up = _roll(conn_down, 1, 0)
    breaks = jnp.where(row == 0, 1, 1 - conn_up)
    # vertical prefix sum over 16 rows
    run = breaks
    k = 1
    while k < L:
        shifted = _roll(run, k, 0)
        run = run + jnp.where(row >= k, shifted, 0)
        k *= 2
    k = 1
    while k < L:
        same = (run == _roll(run, k, 0)) & (row >= k)
        lab = jnp.minimum(lab, jnp.where(same, _roll(lab, k, 0), _BIG))
        same_b = (run == _roll(run, -k, 0)) & (row < L - k)
        lab = jnp.minimum(lab, jnp.where(same_b, _roll(lab, -k, 0), _BIG))
        k *= 2
    return lab


def _label_kernel(e_right_ref, e_down_ref, eligible_ref, out_ref, *,
                  n_alt: int):
    L, S = e_right_ref.shape
    er = e_right_ref[...]
    ed = e_down_ref[...]
    el = eligible_ref[...]

    ids = (jax.lax.broadcasted_iota(jnp.int32, (L, S), 0) * S
           + jax.lax.broadcasted_iota(jnp.int32, (L, S), 1))
    lab = jnp.where(el > 0, ids, _BIG)

    er2 = jnp.concatenate([er, er], axis=1)
    for _ in range(n_alt):
        lab2 = jnp.concatenate([lab, lab], axis=1)
        lab2 = _closure_h(lab2, er2)
        lab = jnp.minimum(lab2[:, :S], lab2[:, S:])
        lab = _closure_v(lab, ed, L)
    out_ref[...] = jnp.where(el > 0, lab, _BIG)


@functools.partial(jax.jit, static_argnames=("n_alt", "interpret"))
def label_components_pallas(e_right, e_down, eligible, n_alt: int = 5,
                            interpret: bool = False):
    """Connected components from edge masks.  e_right (L,S): edge between
    (i,j) and (i,j+1 mod S); e_down: edge between (i,j) and (i+1,j);
    eligible (L,S).  Returns int32 labels (representative flat id, _BIG for
    ineligible cells)."""
    L, S = eligible.shape
    return pl.pallas_call(
        functools.partial(_label_kernel, n_alt=n_alt),
        out_shape=jax.ShapeDtypeStruct((L, S), jnp.int32),
        interpret=interpret,
    )(e_right.astype(jnp.int32), e_down.astype(jnp.int32),
      eligible.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("block_rows", "n_alt",
                                             "interpret"))
def label_components_blocked(e_right, e_down, eligible, block_rows: int = 16,
                             n_alt: int = 5, interpret: bool = False):
    """Connected components on tall grids via row-blocked Mosaic labeling +
    an exact union-find seam merge (round-5 HDL-64 throughput fix).

    The monolithic kernel's scoped-VMEM stack (~250 B/cell, batch-
    independent) exceeds the 16 MB limit at 64-row sensors, and the XLA
    union-find fallback costs 26.7 ms/scan at (64, 1800) — 48% of the whole
    HDL-64 pipeline (tools/r5_hdl64_prof.py).  Here the grid is split into
    L/block_rows row blocks that each fit the kernel comfortably (7.2 MB at
    (16, 1800)); blocks are labeled independently (cross-seam e_down edges
    masked out), block labels are globalized by row offset, and components
    crossing seams are unioned EXACTLY by min-hooking + pointer doubling on
    the label graph, iterated to a fixpoint.  Same (edges -> representative
    min-member flat id) contract as label_components_pallas /
    label_from_edges; parity-pinned in tests/test_pallas_label.py.
    """
    L, S = eligible.shape
    bR = block_rows
    assert L % bR == 0, (L, bR)
    nb = L // bR
    LS = L * S

    er_b = e_right.astype(jnp.int32).reshape(nb, bR, S)
    el_b = eligible.astype(jnp.int32).reshape(nb, bR, S)
    ed = e_down.astype(jnp.int32)
    # mask the seam edges out of the per-block kernel (they connect row
    # bR-1 of block b to row 0 of block b+1 and are re-applied in the merge)
    row = jnp.arange(L)[:, None]
    ed_in = jnp.where((row % bR) == bR - 1, 0, ed).reshape(nb, bR, S)

    kern = functools.partial(label_components_pallas, n_alt=n_alt,
                             interpret=interpret)
    lab_b = jax.vmap(kern)(er_b, ed_in, el_b)        # (nb, bR, S) local ids
    offs = (jnp.arange(nb, dtype=jnp.int32) * bR * S)[:, None, None]
    lab = jnp.where(lab_b < _BIG, lab_b + offs, _BIG).reshape(L, S)

    # seam pairs: labels on both sides of each kept cross-block edge
    seam_rows = jnp.arange(nb - 1, dtype=jnp.int32) * bR + (bR - 1)
    la = lab[seam_rows]                              # (nb-1, S)
    lb = lab[seam_rows + 1]
    ok = (ed[seam_rows] > 0) & (la < _BIG) & (lb < _BIG)
    a = jnp.where(ok, la, LS).reshape(-1)
    b = jnp.where(ok, lb, LS).reshape(-1)

    parent0 = jnp.arange(LS + 1, dtype=jnp.int32)

    def merge_once(parent):
        pa, pb = parent[a], parent[b]
        m = jnp.minimum(pa, pb)
        parent = parent.at[pa].min(m).at[pb].min(m)
        parent = parent[parent]
        return parent[parent]

    def cond(state):
        parent, prev, changed = state
        return changed

    def body(state):
        parent, _, _ = state
        new = merge_once(parent)
        return new, parent, jnp.any(new != parent)

    parent, _, _ = jax.lax.while_loop(
        cond, body, (merge_once(parent0), parent0, jnp.bool_(True)))
    return jnp.where(lab < _BIG, parent[jnp.minimum(lab, LS)], _BIG)
