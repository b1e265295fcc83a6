"""Voxel-hash grid k-NN: the TPU-native replacement for the mapping KD-trees
(lidar_mapping_node.cpp:1355-1357, 1465) on large reference sets.

`top_k_nn` (ops/voxel.py) is exact brute force: it streams a (Q, R) distance
matrix through HBM and a `lax.top_k` per chunk — ~34 ms per scan-to-map GN
iteration at the VLP-16 local-map sizes (4096x65536 surf + 1024x32768
corner), 10 iterations per mapping step.  But scan-to-map only *accepts* a
correspondence when the 5th neighbor lies within 1 m (`d2[:, 4] < 1.0`,
cornerOptimization/surfOptimization's `pointSearchSqDis[4] < 1.0`), so
neighbors beyond 1 m never matter.  This module exploits that: bin map
points into 1 m voxel cells once per mapping step, then each query gathers
candidates only from its 27-cell neighborhood — every point within 1 m of
the query is guaranteed covered, so the accepted correspondence set is
IDENTICAL to brute force except when a cell overflows its fixed capacity
(rare at map voxel-filter densities; at the default leaf sizes a 1 m cell
holds at most ceil(1/leaf)^3 voxel centroids, i.e. 27 at the 0.4 m surf
leaf — within the default cap).

Layout matters on TPU: candidates are stored DENSELY per bucket as
(table, cap*3) rows so a query's neighborhood is 27 wide-row gathers
(~384 B each) instead of 27*cap scattered 12 B row gathers — measured 4.5x
faster on v5e.  Build cost: one argsort of R int32 keys + one scatter.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HashGrid:
    cells: jnp.ndarray    # (table, 3, cap) bucket-major candidate points
    cnt: jnp.ndarray      # (table,) valid points per bucket (<= cap)
    cell: float = dataclasses.field(metadata=dict(static=True))
    table: int = dataclasses.field(metadata=dict(static=True))
    cap: int = dataclasses.field(metadata=dict(static=True))
    # neighborhood arity: 27 = classic +-1-cell block around floor(q/cell)
    # (covers radius `cell`); 8 = SUPERCELL mode, the 2x2x2 block around
    # floor(q/cell - 1/2) (covers radius >= cell/2).  Supercells (cell 2 m,
    # cap = (cell/leaf)^3) cut the gather's DMA-descriptor count 3.4x — the
    # dominant cost of the NN on TPU (wide rows amortize; measured
    # descriptor-bound at ~36 ns/row on v5e).
    nb: int = dataclasses.field(default=27, metadata=dict(static=True))


def _bucket_of(cid: jnp.ndarray, table: int) -> jnp.ndarray:
    """Hash integer cell coords (..., 3) to a bucket id in [0, table).

    Mixed hash (ops/voxel.hash3) — the classic XOR-of-products spatial hash
    collides structurally for symmetric coords, wasting bucket capacity."""
    from lins_tpu.ops.voxel import hash3

    return jnp.abs(hash3(cid)) % table


def build_grid(pts: jnp.ndarray, valid: jnp.ndarray, cell: float,
               table: int = 16384, cap: int = 32) -> HashGrid:
    """Bin a masked (R, 3) point set into hashed voxel-cell buckets.

    Points are sorted by bucket id (one lax.sort carrying x/y/z as values —
    cheaper than argsort + a narrow-row gather on TPU), assigned a slot
    (rank within their bucket's run), and scattered component-wise into a
    dense (table, 3, cap) store; slots beyond `cap` are dropped (counted
    out of `cnt` too, so queries never see stale zeros as candidates).
    """
    R = pts.shape[0]
    cid = jnp.floor(pts / cell).astype(jnp.int32)
    b = _bucket_of(cid, table)
    b = jnp.where(valid, b, table).astype(jnp.int32)

    b_s, xs, ys, zs = jax.lax.sort(
        (b, pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=1)

    # slot = rank within the bucket's run of the sorted array
    ar = jnp.arange(R, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, ar, -1))
    slot = ar - run_start

    keep = (b_s < table) & (slot < cap)
    flat = jnp.where(keep, b_s * 3 * cap + slot, table * 3 * cap)
    buf = jnp.zeros((table * 3 * cap + 1,), pts.dtype)
    for i, c in ((0, xs), (1, ys), (2, zs)):
        buf = buf.at[flat + i * cap].set(c, mode="drop")
    cells = buf[:-1].reshape(table, 3, cap)
    cnt = jnp.zeros((table,), jnp.int32).at[jnp.minimum(b_s, table - 1)].add(
        keep.astype(jnp.int32), mode="drop")
    return HashGrid(cells=cells, cnt=cnt, cell=float(cell),
                    table=int(table), cap=int(cap))


def build_grid_voxelized(pts: jnp.ndarray, valid: jnp.ndarray, leaf: float,
                         m: int, table: int = 16384, cap: int = 32,
                         nb: int = 27):
    """Voxel-filter a masked (R, 3) point set AND bin the centroids into the
    hash grid, fused into ONE sort.

    Replaces the two-stage `voxel_downsample(raw local map)` +
    `build_grid(filtered map)` pipeline of the mapping backend (PCL
    VoxelGrid at lidar_mapping_node.cpp:283-291, KD-tree build :1355): the
    raw window points are sorted once by a composite key
    (cell bucket | voxel-in-cell | cell checksum); voxel centroids are run
    means, and each voxel-run's rank within its cell run is its slot in the
    dense (table, 3, cap) store.

    The grid cell edge is `leaf * m` — an exact multiple so voxels never
    straddle cell boundaries (the centroid set is identical to running PCL's
    filter then binning).  `m` must satisfy leaf*m >= 1.0 (nb=27) or >= 2.0
    (nb=8 supercells) for the 1 m NN acceptance-gate coverage argument.
    Voxel identity inside the sort is (bucket*m^3 + lid) + the EXACT integer
    voxel coordinates as three further sort keys — two distinct voxels can
    never merge.  (Round 2 used a secondary 32-bit hash: same-key pairs —
    two cells sharing a bucket with matching in-cell ids — are common
    enough at map scales that single hash collisions produced corrupt
    merged centroids, ~1 per 6e4-point build.)

    Returns (HashGrid, n_voxels) — n_voxels the exact voxel-centroid count
    (the `sum(map_valid)` equivalent for sufficiency checks).
    """
    R = pts.shape[0]
    m3 = m * m * m
    imax = jnp.iinfo(jnp.int32).max
    vox = jnp.floor(pts / leaf).astype(jnp.int32)
    cellv = jnp.floor_divide(vox, m)
    bucket = _bucket_of(cellv, table)
    lv = vox - cellv * m                                       # in [0, m)^3
    lid = (lv[:, 0] * m + lv[:, 1]) * m + lv[:, 2]
    sentinel = table * m3
    key = jnp.where(valid, bucket * m3 + lid, sentinel).astype(jnp.int32)
    wv = jnp.where(valid[:, None], vox, imax)

    key_s, v0, v1, v2, xs, ys, zs = jax.lax.sort(
        (key, wv[:, 0], wv[:, 1], wv[:, 2],
         pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=4)
    vmask = key_s < sentinel                                   # valid rows

    ar = jnp.arange(R, dtype=jnp.int32)
    vstart = jnp.concatenate([
        jnp.ones((1,), bool),
        (key_s[1:] != key_s[:-1]) | (v0[1:] != v0[:-1])
        | (v1[1:] != v1[:-1]) | (v2[1:] != v2[:-1])]) & vmask

    # voxel-run centroids via cumulative sums (cf. ops/voxel.py)
    def runsum(c):
        cs = jnp.concatenate([jnp.zeros((1,), c.dtype),
                              jnp.cumsum(jnp.where(vmask, c, 0.0))])
        return cs

    nxt = jnp.concatenate([vstart[1:], jnp.ones((1,), bool)])
    pos = jnp.where(nxt, ar + 1, R)
    next_pos = jax.lax.associative_scan(jnp.minimum, pos, reverse=True)
    cs_mask = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(vmask.astype(jnp.int32))])
    cnt_run = cs_mask[next_pos] - cs_mask[ar]
    denom = jnp.maximum(cnt_run, 1).astype(pts.dtype)
    cent = [(runsum(c)[next_pos] - runsum(c)[ar]) / denom
            for c in (xs, ys, zs)]

    # slot = rank of this voxel run within its cell bucket's run
    bkt_s = key_s // m3
    bstart = jnp.concatenate([jnp.ones((1,), bool),
                              bkt_s[1:] != bkt_s[:-1]])
    ex = jnp.cumsum(vstart.astype(jnp.int32)) - vstart.astype(jnp.int32)
    base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(bstart, ex, -1))
    slot = ex - base

    keep = vstart & (slot < cap)
    bkt_c = jnp.minimum(bkt_s, table - 1)
    flat = jnp.where(keep, bkt_c * 3 * cap + slot, table * 3 * cap)
    buf = jnp.zeros((table * 3 * cap + 1,), pts.dtype)
    for i, c in enumerate(cent):
        buf = buf.at[flat + i * cap].set(c, mode="drop")
    cells = buf[:-1].reshape(table, 3, cap)
    cnt = jnp.zeros((table,), jnp.int32).at[bkt_c].add(
        keep.astype(jnp.int32), mode="drop")
    n_voxels = jnp.sum(vstart.astype(jnp.int32))
    grid = HashGrid(cells=cells, cnt=cnt, cell=float(leaf * m),
                    table=int(table), cap=int(cap), nb=int(nb))
    return grid, n_voxels


# Squared-distance cutoff above which a candidate is a PARKED slot, not a
# point: ops/voxel_map.py tombstones dead slots at SENTINEL=1e9 (d² ~ 3e18,
# finite in f32) and its hwm-based `cnt` counts them as in-bucket, so the
# `ok` masks alone no longer exclude them (the pre-round-3 isfinite
# "exhausted slot" contract).  Physical map coordinates are << 1e5 m
# (d² << 1e11), so d² >= 1e17 identifies sentinels unambiguously; every
# gather below maps them back to +inf, restoring the isfinite contract for
# all consumers.
_FAR2 = 1.0e17

# the 27 neighbor-cell offsets, (27, 3) — numpy so importing this module
# never initializes a JAX backend
_OFFS = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3),
                             indexing="ij"), -1).reshape(-1, 3)
# the 8 supercell-block offsets, (8, 3) in {0, 1}^3
_OFFS8 = np.stack(np.meshgrid(*([np.arange(0, 2)] * 3),
                              indexing="ij"), -1).reshape(-1, 3)


def _neighborhood(query: jnp.ndarray, grid: HashGrid):
    """Neighbor-cell integer coords (Q, nb, 3) + per-query guaranteed
    coverage radius (Q,) for the grid's neighborhood mode."""
    c = grid.cell
    if grid.nb == 27:
        base = jnp.floor(query / c).astype(jnp.int32)
        nbc = base[:, None, :] + jnp.asarray(_OFFS, jnp.int32)[None]
        # block spans [c(b-1), c(b+2)) per axis; distance from q in
        # [cb, cb+c) to either edge is >= c
        cover = jnp.full(query.shape[:1], c, query.dtype)
    else:
        base = jnp.floor(query / c - 0.5).astype(jnp.int32)
        nbc = base[:, None, :] + jnp.asarray(_OFFS8, jnp.int32)[None]
        lo = base.astype(query.dtype) * c
        cover = jnp.min(jnp.minimum(query - lo, lo + 2 * c - query), axis=1)
    return nbc, cover


def gather_candidates(query: jnp.ndarray, q_valid: jnp.ndarray,
                      grid: HashGrid, C: int, use_pallas: bool = False,
                      interpret: bool = False):
    """ONE-SHOT candidate gather + prune to a compact (Q, C, 3) cache.

    This is the expensive half of the 5-NN (the (Q, nb, cap) HBM gather is
    DMA-descriptor-bound); the scan-to-map GN runs it once per mapping step
    and re-ranks the cached candidates per iteration (knn_from_candidates),
    re-gathering only when provably necessary:

      * coverage bound: the block covers radius `cover` around the
        gather-time query position; after the pose moves a query by d, the
        1 m acceptance ball is still covered while d <= cover - 1.
      * prune bound: the C-th candidate distance d2C bounds what pruning
        can hide; every point within 1 m of the moved query is still in the
        kept set while d <= sqrt(d2C) - 1  (d2C = +inf when nothing within
        the coverage ball was pruned).

    use_pallas: route the nearest-C selection through the Mosaic
    partial-selection kernel (ops/pallas_select.py, C+1 min+extract passes
    in VMEM) instead of the XLA variadic sort — same contract, with the
    tighter first-DROPPED d2C bound instead of the C-th-kept distance.

    Returns (cand (Q,C,3), cand_ok (Q,C), d2C (Q,), cover (Q,)).
    """
    Q = query.shape[0]
    cap = grid.cap
    nbc, cover = _neighborhood(query, grid)
    bb = _bucket_of(nbc, grid.table)                            # (Q, nb)
    n_off = bb.shape[1]
    B = n_off * cap
    # mask duplicate buckets (two neighbor cells hashing together would
    # contribute the same candidates twice)
    tri = np.tril(np.ones((n_off, n_off), bool), -1)
    dup = jnp.any((bb[:, :, None] == bb[:, None, :]) & tri[None], axis=-1)

    cand = grid.cells[bb]                  # (Q, nb, 3, cap) wide-row gather
    n_in = grid.cnt[bb]
    ok = (jnp.arange(cap, dtype=jnp.int32)[None, None, :] < n_in[:, :, None]
          ) & ~dup[:, :, None]
    if use_pallas:
        from lins_tpu.ops.pallas_select import select_candidates

        flat_c = cand.transpose(0, 2, 1, 3).reshape(Q, 3, B)
        out, cand_ok, _, d2C = select_candidates(
            query, q_valid, flat_c[:, 0], flat_c[:, 1], flat_c[:, 2],
            ok.reshape(Q, B), C, interpret=interpret)
        return out, cand_ok, d2C, cover
    diff = cand - query[:, None, :, None]
    d2 = jnp.sum(diff * diff, axis=2)
    d2 = jnp.where(ok & (d2 < _FAR2), d2, jnp.inf).reshape(Q, B)
    d2 = jnp.where(q_valid[:, None], d2, jnp.inf)
    flat_c = cand.transpose(0, 2, 1, 3).reshape(Q, 3, B)

    # nearest-C prune as ONE variadic sort carrying the coordinates, then a
    # static slice — measured 11.0 ms vs 13.3 ms for lax.top_k +
    # 3x take_along_axis at (6144, 1728) on v5e (the takes alone cost
    # 5.2 ms; the d2-only top_k 4.6 ms over the 3.5 ms gather floor)
    d2s, xs, ys, zs = jax.lax.sort(
        (d2, flat_c[:, 0], flat_c[:, 1], flat_c[:, 2]), dimension=1,
        num_keys=1)
    d2k = d2s[:, :C]                                           # (Q, C) asc
    out = jnp.stack([xs[:, :C], ys[:, :C], zs[:, :C]], axis=-1)
    cand_ok = jnp.isfinite(d2k)
    out = jnp.where(cand_ok[:, :, None], out, query[:, None, :])
    return out, cand_ok, d2k[:, -1], cover


def gather_block(query: jnp.ndarray, q_valid: jnp.ndarray, grid: HashGrid):
    """FULL-neighborhood candidate cache: every grid point in each query's
    neighborhood block, as (Q, nb*cap, 3) + validity — no top-k compaction,
    no prune bound.

    NOT the production path.  This was the round-3 "no pruning" experiment:
    it removes the gather-time top-C selection and the d2C re-gather bound,
    but the per-GN-iteration re-rank then runs over the full 1728–5832-wide
    blocks and benched at 22.4 scans/s vs the pruned cache's 75+ (PARITY.md
    "negative results").  Production uses `gather_candidates`
    (mapping/scan2map.py); this function is kept only for the
    tools/r3_s2m_prof.py measurement evidence.

    Returns (cand (Q, nb*cap, 3), ok (Q, nb*cap), cover (Q,)).
    """
    cap = grid.cap
    nbc, cover = _neighborhood(query, grid)
    bb = _bucket_of(nbc, grid.table)                            # (Q, nb)
    n_off = bb.shape[1]
    tri = np.tril(np.ones((n_off, n_off), bool), -1)
    dup = jnp.any((bb[:, :, None] == bb[:, None, :]) & tri[None], axis=-1)

    cand = grid.cells[bb]                  # (Q, nb, 3, cap) wide-row gather
    n_in = grid.cnt[bb]
    ok = (jnp.arange(cap, dtype=jnp.int32)[None, None, :] < n_in[:, :, None]
          ) & ~dup[:, :, None] & q_valid[:, None, None]
    Q = query.shape[0]
    cand = cand.transpose(0, 1, 3, 2).reshape(Q, n_off * cap, 3)
    return cand, ok.reshape(Q, n_off * cap), cover


def knn_from_candidates(p_w: jnp.ndarray, q_valid: jnp.ndarray,
                        cand: jnp.ndarray, cand_ok: jnp.ndarray, k: int = 5):
    """k nearest of each query's CACHED candidate set (gather_candidates)
    at the current pose — per-GN-iteration re-ranking, all dense math.

    Selection is k min+one-hot-contraction passes: the selected point is
    recovered as `first_hit @ cand` (a batched matvec) instead of
    take_along_axis — argmin+gather rounds measured 3.2 ms per call at
    (6144, 64) on v5e; the gather-free form is pure VPU/MXU work and fuses.

    DO NOT replace this with a 4-operand payload-carrying lax.sort.  The
    sort form is semantically identical (stable, same tie order; measured
    marginally faster standalone: 1.51 vs 1.77 ms at (6144, 64)) and is
    EXACT when jitted in isolation (tools/r4_knn_precision_probe.py: d2
    error ~5e-7, 0% wrong 1-NN on TPU) — but inside the full fused mapping
    program on the v5e relay stack it produced WRONG nearest neighbors
    (round-4 finding: scan-to-map matches dropped 2216 -> 1375 on an
    identical step, GN stopped converging, gentle-sequence ATE 0.010 ->
    0.0255; bisected by swapping only this function's body with the
    surrounding program unchanged, tools/r4_step_diff.py).  CPU results
    are identical for both forms, so only an on-device oracle catches it.
    Returns (nn (Q,k,3), d2 (Q,k)); exhausted slots get +inf distance and
    the query point itself as nn."""
    diff = cand - p_w[:, None, :]
    # explicit contraction with precision=HIGHEST: XLA may rewrite the
    # reduce-of-squares into a dot, and TPU f32 dots default to bf16
    # passes — |coord|^2 * 2^-8-scale distance error, i.e. wrong nearest
    # neighbors (the round-3 on-device pathology, PARITY "bf16 matmul
    # distance error")
    d2 = jnp.einsum("qci,qci->qc", diff, diff,
                    precision=jax.lax.Precision.HIGHEST)
    # d2 < _FAR2: exclude SENTINEL-parked tombstone slots that reach here
    # with cand_ok=True via gather_block's count-only masks
    d2 = jnp.where(cand_ok & q_valid[:, None] & (d2 < _FAR2), d2, jnp.inf)
    sels, ds = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=1)
        hit = (d2 <= m[:, None]) & jnp.isfinite(d2)
        first = hit & (jnp.cumsum(hit.astype(jnp.int32), axis=1) == 1)
        sels.append(first.astype(cand.dtype))
        ds.append(m)
        d2 = jnp.where(first, jnp.inf, d2)
    # one batched (k, C) @ (C, 3) contraction recovers all k points.
    # NO precision override here: with precision=HIGHEST this contraction
    # comes back WRONG inside the fused mapping program on the v5e relay
    # stack (round-4 bisect: matches 2216 -> 1375 with HIGHEST, correct
    # without — tools/r4_step_diff.py; same context-sensitive miscompile
    # class as the sort-carry ban above).  The default lowering keeps this
    # tiny (k, C) one-hot matvec on the VPU where it is exact f32.
    nn = jnp.einsum("qkc,qci->qki", jnp.stack(sels, axis=1), cand)
    d2k = jnp.stack(ds, axis=1)
    nn = jnp.where(jnp.isfinite(d2k)[:, :, None], nn, p_w[:, None, :])
    return nn, d2k


def grid_knn(query: jnp.ndarray, q_valid: jnp.ndarray, grid: HashGrid,
             k: int = 5):
    """k nearest grid points of each query within its 27-cell neighborhood.

    Returns (nn (Q, k, 3), d2 (Q, k)); slots beyond the number of in-range
    candidates get +inf distance (and the query point itself as `nn`, so
    downstream math stays finite).  Matches brute-force `top_k_nn` wherever
    the 5th-NN-within-1-cell acceptance gate passes, except on bucket
    overflow (see build_grid).
    """
    Q = query.shape[0]
    cap = grid.cap
    cid = jnp.floor(query / grid.cell).astype(jnp.int32)        # (Q, 3)
    nb = cid[:, None, :] + jnp.asarray(_OFFS, jnp.int32)[None]  # (Q, 27, 3)
    bb = _bucket_of(nb, grid.table)                             # (Q, 27)
    # two neighbor cells hashing to the same bucket would contribute the
    # same candidates twice and let top_k pick duplicate points (wrong 5-NN
    # geometry); keep only the first occurrence of each bucket per query
    n_off = bb.shape[1]
    tri = np.tril(np.ones((n_off, n_off), bool), -1)
    dup = jnp.any((bb[:, :, None] == bb[:, None, :]) & tri[None], axis=-1)

    cand = grid.cells[bb]                  # (Q, 27, 3, cap) wide-row gather
    n_in = grid.cnt[bb]                                         # (Q, 27)
    ok = (jnp.arange(cap, dtype=jnp.int32)[None, None, :] < n_in[:, :, None]
          ) & ~dup[:, :, None]

    diff = cand - query[:, None, :, None]
    d2 = jnp.sum(diff * diff, axis=2)                           # (Q, 27, cap)
    d2 = jnp.where(ok & (d2 < _FAR2), d2, jnp.inf).reshape(Q, n_off * cap)
    d2 = jnp.where(q_valid[:, None], d2, jnp.inf)
    neg_d, sel = jax.lax.top_k(-d2, k)
    # recover the selected points component-wise ((Q, 27*cap) flat order
    # matches d2's cell-major flatten)
    flat_c = cand.transpose(0, 2, 1, 3).reshape(Q, 3, n_off * cap)
    nn = jnp.stack([jnp.take_along_axis(flat_c[:, i, :], sel, axis=1)
                    for i in range(3)], axis=-1)                # (Q, k, 3)
    d2k = -neg_d
    # inf-distance slots: park nn on the query itself (finite, in-bounds)
    nn = jnp.where(jnp.isfinite(d2k)[:, :, None], nn, query[:, None, :])
    return nn, d2k
