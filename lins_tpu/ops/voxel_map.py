"""Incremental voxel-hash map: per-keyframe delta insert/evict over the
local-map NN grids.

The reference re-concatenates and re-voxel-filters the whole 50-keyframe
window every mapping step (lidar_mapping_node.cpp:1206-1235 deque push/pop +
:1285-1313 re-filter; KD-tree rebuild :1355-1357).  Round 2 cached that work
per window *change* — but at walking speed every 0.3 s mapping step crosses
the 0.3 m keyframe gate, so the cached grids were re-sorted (the whole
~3·10⁵-point window ring through one big lax.sort) on every step anyway.

This module makes the map truly incremental.  Each grid cell slot holds a
voxel's running (sum, count) over ALL window points inside it, so:

  * insert keyframe  = voxelize only its ~7k world-frame points (one small
    sort) into a `VoxDelta`, then find-or-allocate each delta voxel's slot
    and scatter-ADD its (sum, count);
  * evict keyframe   = scatter-SUBTRACT its stored `VoxDelta` (kept per ring
    slot); a voxel whose count reaches zero becomes a tombstone — its
    centroid parks at a far sentinel so the unchanged `gather_candidates` /
    `knn_from_candidates` path never selects it, and its identity stays in
    the slot so a revisit revives it in place;
  * centroid         = sum / count, bit-comparable (up to float summation
    order) with the full union voxel filter the reference computes.

Tombstones of voxels never revisited leak slots, and f32 add/subtract drifts
over many updates, so the mapper triggers a full compaction rebuild
(`build_voxel_map`, the round-2 fused sort) every `rebuild_interval`
keyframes or when an allocation overflows a cell — amortized to ~1/64 of the
old per-step cost.

Voxel identity is the EXACT integer voxel coordinate triple, both inside
the build sort (three extra int32 keys) and in the per-slot identity store
(`vcoord`) — two distinct voxels can never merge.  (An earlier design used
a 32-bit secondary hash; same-key pairs — two cells sharing a hash bucket
with matching in-cell ids — are common enough at map scales that single
hash collisions produced corrupt merged centroids, ~1 per 6·10⁴-point
build, each poisoning the 5-NN fits around it.)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lins_tpu.ops.grid_nn import HashGrid, _bucket_of

# far-away parking spot for dead/never-used slots: distances to it are
# ~1e18 (finite in f32) so top-k ranks real candidates first and the 1 m
# acceptance gate rejects it if it ever surfaces
SENTINEL = 1.0e9
# identity sentinel for never-used slots (no physical voxel coordinate)
_VFREE = jnp.iinfo(jnp.int32).min


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelMap:
    cells: jnp.ndarray   # (table, 3, cap) centroids; dead slots = SENTINEL
    hwm: jnp.ndarray     # (table,) int32 per-bucket high-water mark
    vcoord: jnp.ndarray  # (table, 3, cap) int32 voxel coords, _VFREE unused
    vsum: jnp.ndarray    # (table, 3, cap) running point sums
    vcnt: jnp.ndarray    # (table, cap) int32 running point counts (0=dead)
    n_live: jnp.ndarray  # () int32 live-voxel count
    overflow: jnp.ndarray  # () bool: some allocation dropped since build
    leaf: float = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    table: int = dataclasses.field(metadata=dict(static=True))
    cap: int = dataclasses.field(metadata=dict(static=True))
    nb: int = dataclasses.field(default=27, metadata=dict(static=True))

    def as_grid(self) -> HashGrid:
        """Zero-copy HashGrid view for gather_candidates/grid_knn: `cnt` is
        the high-water mark (slots below it are live voxels or sentinel
        tombstones; tombstones lose every distance comparison)."""
        return HashGrid(cells=self.cells, cnt=self.hwm,
                        cell=float(self.leaf * self.m), table=self.table,
                        cap=self.cap, nb=self.nb)


class VoxDelta(NamedTuple):
    """One scan's voxelized contribution, sorted by (bucket, lid): run-start
    rows (`ok`) carry the per-voxel point sum and count."""
    bucket: jnp.ndarray  # (N,) int32 cell bucket (table = invalid sentinel)
    vox: jnp.ndarray     # (N, 3) int32 exact voxel coords
    psum: jnp.ndarray    # (N, 3) point-coordinate sum over the voxel run
    cnt: jnp.ndarray     # (N,) int32 points in the voxel run
    ok: jnp.ndarray      # (N,) bool: valid voxel-run start


def empty_voxel_map(leaf: float, m: int, table: int, cap: int,
                    nb: int = 27, dtype=jnp.float32) -> VoxelMap:
    return VoxelMap(
        cells=jnp.full((table, 3, cap), SENTINEL, dtype),
        hwm=jnp.zeros((table,), jnp.int32),
        vcoord=jnp.full((table, 3, cap), _VFREE, jnp.int32),
        vsum=jnp.zeros((table, 3, cap), dtype),
        vcnt=jnp.zeros((table, cap), jnp.int32),
        n_live=jnp.int32(0), overflow=jnp.bool_(False),
        leaf=float(leaf), m=int(m), table=int(table), cap=int(cap),
        nb=int(nb))


def _keyed(pts, valid, leaf, m, table):
    """Shared voxelization front half: bucket/lid composite key + exact
    voxel-coordinate tie-break keys, sorted."""
    m3 = m * m * m
    imax = jnp.iinfo(jnp.int32).max
    vox = jnp.floor(pts / leaf).astype(jnp.int32)
    cellv = jnp.floor_divide(vox, m)
    bucket = _bucket_of(cellv, table)
    lv = vox - cellv * m
    lid = (lv[:, 0] * m + lv[:, 1]) * m + lv[:, 2]
    sentinel = table * m3
    key = jnp.where(valid, bucket * m3 + lid, sentinel).astype(jnp.int32)
    wv = jnp.where(valid[:, None], vox, imax)
    return jax.lax.sort(
        (key, wv[:, 0], wv[:, 1], wv[:, 2],
         pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=4), sentinel


def scan_delta(pts: jnp.ndarray, valid: jnp.ndarray, leaf: float, m: int,
               table: int) -> VoxDelta:
    """Voxelize a masked (N, 3) world-frame cloud into per-voxel (sum, cnt)
    runs — ONE sort of N rows (vs. the ~W*N full-window sort)."""
    N = pts.shape[0]
    m3 = m * m * m
    (key_s, v0, v1, v2, xs, ys, zs), sentinel = _keyed(
        pts, valid, leaf, m, table)
    vmask = key_s < sentinel
    ar = jnp.arange(N, dtype=jnp.int32)
    vstart = jnp.concatenate([
        jnp.ones((1,), bool),
        (key_s[1:] != key_s[:-1]) | (v0[1:] != v0[:-1])
        | (v1[1:] != v1[:-1]) | (v2[1:] != v2[:-1])]) & vmask

    nxt = jnp.concatenate([vstart[1:], jnp.ones((1,), bool)])
    pos = jnp.where(nxt, ar + 1, N)
    next_pos = jax.lax.associative_scan(jnp.minimum, pos, reverse=True)

    def runsum(c):
        cs = jnp.concatenate([jnp.zeros((1,), c.dtype),
                              jnp.cumsum(jnp.where(vmask, c, 0.0))])
        return cs[next_pos] - cs[ar]

    cs_mask = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(vmask.astype(jnp.int32))])
    cnt_run = cs_mask[next_pos] - cs_mask[ar]
    psum = jnp.stack([runsum(xs), runsum(ys), runsum(zs)], axis=1)
    return VoxDelta(bucket=(key_s // m3).astype(jnp.int32),
                    vox=jnp.stack([v0, v1, v2], axis=1),
                    psum=psum, cnt=cnt_run.astype(jnp.int32), ok=vstart)


def apply_delta(vm: VoxelMap, d: VoxDelta, sign: int,
                enable=True) -> VoxelMap:
    """Scatter one scan's VoxDelta into the map.

    sign=+1 inserts (find-or-allocate each voxel's slot, add sums/counts,
    revive tombstones in place); sign=-1 evicts (find, subtract; a count
    reaching zero tombstones the slot).  `enable` (traced bool) masks the
    whole application — the no-evict case of a not-yet-full window ring.
    """
    assert sign in (+1, -1)
    cap, table = vm.cap, vm.table
    ok = d.ok & enable

    bkt = jnp.minimum(d.bucket, table - 1)          # clamp for gathers
    rows = vm.vcoord[bkt]                           # (N, 3, cap)
    match = (jnp.all(rows == d.vox[:, :, None], axis=1)
             & ok[:, None])                         # (N, cap)
    found = jnp.any(match, axis=1)
    slot_m = jnp.argmax(match, axis=1).astype(jnp.int32)

    if sign > 0:
        # allocate fresh slots above the bucket's high-water mark; delta rows
        # are bucket-sorted, so rank new voxels within each bucket's run
        is_new = ok & ~found
        bstart = jnp.concatenate([jnp.ones((1,), bool),
                                  d.bucket[1:] != d.bucket[:-1]])
        ex = jnp.cumsum(is_new.astype(jnp.int32)) - is_new.astype(jnp.int32)
        base = jax.lax.associative_scan(
            jnp.maximum, jnp.where(bstart, ex, -1))
        rank = ex - base
        slot_a = vm.hwm[bkt] + rank
        alloc = is_new & (slot_a < cap)
        overflow = vm.overflow | jnp.any(is_new & (slot_a >= cap))
    else:
        # an entry absent from the map (cap-dropped at insert) is skipped
        ok = ok & found
        slot_a = jnp.zeros_like(slot_m)
        alloc = jnp.zeros_like(found)
        overflow = vm.overflow

    use = found | alloc
    slot = jnp.where(found, slot_m, slot_a)
    # out-of-range bucket index drops the scatter (mode="drop")
    b_sc = jnp.where(use, bkt, table)

    old_cnt = jnp.where(found, vm.vcnt[bkt, slot_m], 0)
    old_sum = jnp.where(found[:, None],
                        vm.vsum[bkt, :, slot_m], 0.0)
    new_cnt = old_cnt + sign * d.cnt
    new_sum = old_sum + sign * d.psum
    live = new_cnt > 0
    cent = jnp.where(
        live[:, None],
        new_sum / jnp.maximum(new_cnt, 1)[:, None].astype(new_sum.dtype),
        jnp.asarray(SENTINEL, new_sum.dtype))

    vcnt = vm.vcnt.at[b_sc, slot].set(jnp.maximum(new_cnt, 0), mode="drop")
    vsum = vm.vsum.at[b_sc, :, slot].set(new_sum, mode="drop")
    cells = vm.cells.at[b_sc, :, slot].set(cent, mode="drop")
    b_al = jnp.where(alloc, bkt, table)
    vcoord = vm.vcoord.at[b_al, :, slot].set(d.vox, mode="drop")
    hwm = vm.hwm.at[b_al].add(1, mode="drop")

    born = jnp.sum(alloc.astype(jnp.int32))
    revived = jnp.sum((found & (old_cnt <= 0) & live).astype(jnp.int32))
    died = jnp.sum((found & (old_cnt > 0) & ~live).astype(jnp.int32))
    return dataclasses.replace(
        vm, cells=cells, hwm=hwm, vcoord=vcoord, vsum=vsum,
        vcnt=vcnt,
        n_live=(vm.n_live + born + revived - died).astype(jnp.int32),
        overflow=overflow)


def build_voxel_map(pts: jnp.ndarray, valid: jnp.ndarray, leaf: float,
                    m: int, table: int, cap: int, nb: int = 27) -> VoxelMap:
    """Full compaction build: voxel-filter a masked (R, 3) point union AND
    populate every VoxelMap field in the same fused sort as
    grid_nn.build_grid_voxelized (which it supersedes on the mapping path —
    identical centroid set; additionally keeps sums/counts/identities so
    apply_delta can update it incrementally)."""
    R = pts.shape[0]
    m3 = m * m * m
    dtype = pts.dtype
    (key_s, v0, v1, v2, xs, ys, zs), sentinel = _keyed(
        pts, valid, leaf, m, table)
    vmask = key_s < sentinel
    ar = jnp.arange(R, dtype=jnp.int32)
    vstart = jnp.concatenate([
        jnp.ones((1,), bool),
        (key_s[1:] != key_s[:-1]) | (v0[1:] != v0[:-1])
        | (v1[1:] != v1[:-1]) | (v2[1:] != v2[:-1])]) & vmask

    nxt = jnp.concatenate([vstart[1:], jnp.ones((1,), bool)])
    pos = jnp.where(nxt, ar + 1, R)
    next_pos = jax.lax.associative_scan(jnp.minimum, pos, reverse=True)

    def runsum(c):
        cs = jnp.concatenate([jnp.zeros((1,), c.dtype),
                              jnp.cumsum(jnp.where(vmask, c, 0.0))])
        return cs[next_pos] - cs[ar]

    cs_mask = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(vmask.astype(jnp.int32))])
    cnt_run = (cs_mask[next_pos] - cs_mask[ar]).astype(jnp.int32)
    sums = [runsum(c) for c in (xs, ys, zs)]
    denom = jnp.maximum(cnt_run, 1).astype(dtype)
    cents = [s / denom for s in sums]

    # slot = rank of this voxel run within its cell bucket's run
    bkt_s = (key_s // m3).astype(jnp.int32)
    bstart = jnp.concatenate([jnp.ones((1,), bool),
                              bkt_s[1:] != bkt_s[:-1]])
    ex = jnp.cumsum(vstart.astype(jnp.int32)) - vstart.astype(jnp.int32)
    base = jax.lax.associative_scan(jnp.maximum, jnp.where(bstart, ex, -1))
    slot = ex - base

    keep = vstart & (slot < cap)
    bkt_c = jnp.minimum(bkt_s, table - 1)
    b_sc = jnp.where(keep, bkt_c, table)

    cells = jnp.full((table, 3, cap), SENTINEL, dtype)
    vsum = jnp.zeros((table, 3, cap), dtype)
    vcoord = jnp.full((table, 3, cap), _VFREE, jnp.int32)
    for i, (cent_i, sum_i, v_i) in enumerate(
            zip(cents, sums, (v0, v1, v2))):
        cells = cells.at[b_sc, i, slot].set(cent_i, mode="drop")
        vsum = vsum.at[b_sc, i, slot].set(sum_i, mode="drop")
        vcoord = vcoord.at[b_sc, i, slot].set(v_i, mode="drop")
    vcnt = jnp.zeros((table, cap), jnp.int32).at[b_sc, slot].set(
        cnt_run, mode="drop")
    hwm = jnp.zeros((table,), jnp.int32).at[b_sc].add(1, mode="drop")
    n_live = jnp.sum(keep.astype(jnp.int32)).astype(jnp.int32)
    return VoxelMap(cells=cells, hwm=hwm, vcoord=vcoord,
                    vsum=vsum, vcnt=vcnt, n_live=n_live,
                    overflow=jnp.any(vstart & (slot >= cap)),
                    leaf=float(leaf), m=int(m), table=int(table),
                    cap=int(cap), nb=int(nb))
