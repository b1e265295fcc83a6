"""Mosaic partial-selection kernel: nearest-C prune of the scan-to-map
candidate gather (the designed round-3 fix for the (Q, B) wide sort in
ops/grid_nn.gather_candidates — VERDICT r3 #1; unblocked in round 4 when
the compile canary `tools/r4_mosaic_canary.py` showed the Mosaic compile
pathology that stalls ops/pallas_assoc.py does NOT affect this kernel
class: 0.8 s compiles at the production (6144, 1728) shape).

The selection is C+1 sequential min+extract passes over the gathered
candidate block, entirely in VMEM/registers:

  pass i: m   = row-min of d2                      (lane reduction)
          fi  = first lane index attaining m       (min of masked iota)
          out[:, i] = (m, x[fi], y[fi], z[fi])     (masked-sum extraction)
          d2[fi] = +BIG                            (mask out)

vs the XLA route (one 4-operand variadic lax.sort): O(C·B) cheap VPU ops
instead of O(B log^2 B) compare-exchange stages carrying 4 arrays.  The
(C+1)-th pass value is the first-DROPPED distance — exactly the `d2C`
prune bound the GN loop's staleness argument needs (scan2map.stale), so
the output contract matches gather_candidates bit-for-bit in meaning:
(cand (Q,C,3), cand_ok (Q,C), d2C (Q,), with candidates in ascending-d2
order and exhausted slots parked on the query point at +inf).

No gathers, no scatters, no dynamic lane stores (Mosaic requires
128-multiple lane offsets — outputs accumulate in registers via one-hot
column masks and store once).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# "infinity" that survives arithmetic without NaN risk in the kernel
_BIG = 3.0e38


def _select_kernel(qx_ref, qy_ref, qz_ref, cx_ref, cy_ref, cz_ref, ok_ref,
                   d2_ref, x_ref, y_ref, z_ref, *, C: int):
    cx = cx_ref[...]
    cy = cy_ref[...]
    cz = cz_ref[...]
    dx = cx - qx_ref[...]
    dy = cy - qy_ref[...]
    dz = cz - qz_ref[...]
    d2 = dx * dx + dy * dy + dz * dz
    # d2 < 1e17 also excludes SENTINEL-parked tombstone slots (d2 ~ 3e18,
    # counted in-bucket by the voxel map's hwm — grid_nn._FAR2 contract)
    d2 = jnp.where((ok_ref[...] > 0.5) & (d2 < 1e17), d2, _BIG)

    blk, B = d2.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (blk, B), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, C + 1), 1)
    zeros = jnp.zeros((blk, C + 1), jnp.float32)

    def body(i, carry):
        d2c, od, ox, oy, oz = carry
        m = jnp.min(d2c, axis=1)
        hit = d2c <= m[:, None]
        fi = jnp.min(jnp.where(hit, idx, jnp.int32(2 ** 30)), axis=1)
        first = idx == fi[:, None]
        sel = jnp.where(first, 1.0, 0.0)
        hot = col == i
        od = od + jnp.where(hot, m[:, None], 0.0)
        ox = ox + jnp.where(hot, jnp.sum(sel * cx, axis=1)[:, None], 0.0)
        oy = oy + jnp.where(hot, jnp.sum(sel * cy, axis=1)[:, None], 0.0)
        oz = oz + jnp.where(hot, jnp.sum(sel * cz, axis=1)[:, None], 0.0)
        return jnp.where(first, _BIG, d2c), od, ox, oy, oz

    _, od, ox, oy, oz = jax.lax.fori_loop(
        0, C + 1, body, (d2, zeros, zeros, zeros, zeros))
    d2_ref[...] = od
    x_ref[...] = ox
    y_ref[...] = oy
    z_ref[...] = oz


@functools.partial(jax.jit,
                   static_argnames=("C", "interpret"))
def select_candidates(query, q_valid, cx, cy, cz, ok, C: int,
                      interpret: bool = False):
    """Nearest-C selection of each query's gathered candidate row.

    query (Q,3) f32; q_valid (Q,); cx/cy/cz (Q,B) candidate coordinates
    (grid.cells neighborhood flattened cell-major, as in gather_candidates);
    ok (Q,B) candidate validity.  Returns (cand (Q,C,3), cand_ok (Q,C),
    d2k (Q,C), d2C (Q,)) exactly like the XLA sort path: ascending d2,
    exhausted slots = +inf / query point; d2C = distance^2 of the first
    pruned candidate (+inf when nothing valid was dropped).
    """
    Q, B = ok.shape
    # row block: bounded by VMEM (4 wide (blk, B) f32 operands, double
    # buffered); pad Q up to a block multiple if needed
    blk = 128 if B <= 4096 else 32
    blk = min(blk, Q)
    pad = (-Q) % blk
    if pad:
        query = jnp.concatenate([query, jnp.zeros((pad, 3), query.dtype)])
        q_valid = jnp.concatenate([q_valid, jnp.zeros((pad,), bool)])
        cx, cy, cz, ok = (jnp.concatenate(
            [a, jnp.zeros((pad, B), a.dtype)]) for a in (cx, cy, cz, ok))
    Qp = Q + pad
    okf = (ok & q_valid[:, None]).astype(jnp.float32)
    q2 = [query[:, i:i + 1] for i in range(3)]

    row = pl.BlockSpec((blk, 1), lambda i: (i, 0))
    wide = pl.BlockSpec((blk, B), lambda i: (i, 0))
    out = pl.BlockSpec((blk, C + 1), lambda i: (i, 0))
    d2o, xo, yo, zo = pl.pallas_call(
        functools.partial(_select_kernel, C=C),
        grid=(Qp // blk,),
        in_specs=[row, row, row, wide, wide, wide, wide],
        out_specs=[out, out, out, out],
        out_shape=[jax.ShapeDtypeStruct((Qp, C + 1), jnp.float32)] * 4,
        interpret=interpret,
    )(*q2, cx, cy, cz, okf)
    if pad:
        query = query[:Q]
        d2o, xo, yo, zo = d2o[:Q], xo[:Q], yo[:Q], zo[:Q]

    d2k = d2o[:, :C]
    cand_ok = d2k < _BIG * 0.5
    d2k = jnp.where(cand_ok, d2k, jnp.inf)
    cand = jnp.stack([xo[:, :C], yo[:, :C], zo[:, :C]], axis=-1)
    cand = jnp.where(cand_ok[:, :, None], cand, query[:, None, :])
    d2C = jnp.where(d2o[:, C] < _BIG * 0.5, d2o[:, C], jnp.inf)
    return cand, cand_ok, d2k, d2C
