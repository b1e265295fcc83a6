"""Checkpoint / resume (SURVEY.md §5 — absent from the reference, which
keeps keyframe clouds only in process memory, lidar_mapping_node.cpp:113-115).

Serializes the full engine state — estimator pytrees, keyframe store, pose
graph — to a single .npz at keyframe cadence; resume reloads and continues.
This is also the basis for long-run elasticity and the global-map export
(C24: the saved store IS the map).

Affordability: the mapper's LOCAL MAP (cached voxel grids + per-slot
deltas, ~200 MB of derived arrays at VLP-16 scale) is NOT serialized — it
is a pure function of the keyframe store and is rebuilt on load
(LinsMapper.rebuild_local_map), and the archive is written UNCOMPRESSED
(zlib at ~10 MB/s was the round-2 "minutes per save"; the padded-cloud
store is ~50 MB, I/O-bound in well under a second)."""
from __future__ import annotations

import numpy as np

import jax


def _flatten(tree, prefix, out):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[f"{prefix}/__len__"] = np.asarray(len(leaves))
    for i, leaf in enumerate(leaves):
        out[f"{prefix}/{i}"] = np.asarray(leaf)
    return treedef


# archive layout version: bump when the serialized pytree layout changes
# (v2 = round-3 layout with the derived lmap excluded from mapper_state)
_FORMAT = 2


def save_state(path: str, odometry=None, mapper=None, extra=None):
    """Save estimator + mapper state to an npz file."""
    out = {}
    meta = {"format": _FORMAT}
    if odometry is not None:
        meta["odo"] = dict(status=odometry.status, time=odometry.time)
        if odometry.filter_state is not None:
            _flatten(odometry.filter_state, "filter_state", out)
        if odometry.global_state is not None:
            _flatten(odometry.global_state, "global_state", out)
        if odometry.last_surf is not None:
            _flatten(odometry.last_surf, "last_surf", out)
            _flatten(odometry.last_corner, "last_corner", out)
    if mapper is not None:
        # lmap is derived state (rebuildable from the store): skip it
        _flatten(mapper.state._replace(lmap=None), "mapper_state", out)
        meta["mapper"] = dict(last_time=mapper.last_time,
                              last_loop_time=mapper.last_loop_time)
    if extra:
        for k, v in extra.items():
            out[f"extra/{k}"] = np.asarray(v)
    import json

    out["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **out)


def _unflatten(data, prefix, template):
    n = int(data[f"{prefix}/__len__"])
    leaves = [data[f"{prefix}/{i}"] for i in range(n)]
    treedef = jax.tree_util.tree_structure(template)
    import jax.numpy as jnp
    t_leaves = jax.tree_util.tree_leaves(template)
    if n != len(t_leaves):
        # a zip would silently truncate/misassign leaves into the wrong
        # fields; incompatible (e.g. older-format) archives must fail loudly
        raise ValueError(
            f"checkpoint '{prefix}' has {n} leaves but the current state "
            f"layout expects {len(t_leaves)} — archive written by an "
            f"incompatible lins_tpu version (format {_FORMAT} expected)")
    leaves = [jnp.asarray(l, t.dtype if hasattr(t, "dtype") else None)
              for l, t in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_state(path: str, odometry=None, mapper=None):
    """Restore estimator + mapper state in place.  Returns the parsed meta."""
    import json

    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    if odometry is not None and "odo" in meta:
        odometry.status = meta["odo"]["status"]
        odometry.time = meta["odo"]["time"]
        if "filter_state/__len__" in data and odometry.filter_state is None:
            from lins_tpu.imu import eskf
            odometry.filter_state = eskf.initial_state(
                odometry.cfg, dtype=odometry.dtype)
        if odometry.filter_state is not None and "filter_state/__len__" in data:
            odometry.filter_state = _unflatten(data, "filter_state",
                                               odometry.filter_state)
            odometry.global_state = _unflatten(data, "global_state",
                                               odometry.global_state)
        if "last_surf/__len__" in data:
            if odometry.last_surf is None:
                from lins_tpu.parallel.replay import dummy_feature_ref
                odometry.last_surf = dummy_feature_ref(
                    odometry.cfg.max_less_flat, None, odometry.dtype)
                odometry.last_corner = dummy_feature_ref(
                    odometry.cfg.max_less_sharp, None, odometry.dtype)
            odometry.last_surf = _unflatten(data, "last_surf",
                                            odometry.last_surf)
            odometry.last_corner = _unflatten(data, "last_corner",
                                              odometry.last_corner)
    if mapper is not None and "mapper_state/__len__" in data:
        lmap = mapper.state.lmap
        loaded = _unflatten(data, "mapper_state",
                            mapper.state._replace(lmap=None))
        mapper.state = loaded._replace(lmap=lmap)
        mapper.last_time = meta["mapper"]["last_time"]
        mapper.last_loop_time = meta["mapper"]["last_loop_time"]
        mapper.rebuild_local_map()
    return meta


def export_global_map(path: str, mapper, leaf: float = 0.4,
                      cap: int = 1 << 20):
    """Export the keyframe map as one world-frame .npz cloud (C24: replaces
    the visualizeGlobalMapThread rviz publishing with offline export)."""
    import jax.numpy as jnp

    from lins_tpu.geom import so3
    from lins_tpu.ops.voxel import voxel_downsample

    from lins_tpu.mapping import keyframes as kfm

    store = mapper.state.store
    keep = kfm.live_mask(store)

    def to_world(cloud, valid, p, q, k):
        return (so3.quat_rotate(q[None, :], cloud) + p[None, :], valid & k)

    sw, sv = jax.vmap(to_world)(store.surf, store.surf_valid, store.pos,
                                store.quat, keep)
    cw, cv = jax.vmap(to_world)(store.corner, store.corner_valid, store.pos,
                                store.quat, keep)
    ow, ov = jax.vmap(to_world)(store.outlier, store.outlier_valid, store.pos,
                                store.quat, keep)
    xyz = jnp.concatenate([sw.reshape(-1, 3), cw.reshape(-1, 3),
                           ow.reshape(-1, 3)])
    ok = jnp.concatenate([sv.reshape(-1), cv.reshape(-1), ov.reshape(-1)])
    ds, ds_ok = voxel_downsample(xyz, ok, leaf, min(cap, xyz.shape[0]))
    pts = np.asarray(ds)[np.asarray(ds_ok)]
    if path.endswith(".ply"):
        write_ply(path, pts)
    else:
        np.savez_compressed(path, points=pts)
    return pts.shape[0]


def write_ply(path: str, points: np.ndarray):
    """Write an (N,3) cloud as binary little-endian PLY (interop with the
    PCL/CloudCompare tooling users of the reference already have)."""
    points = np.ascontiguousarray(points, np.float32)
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {len(points)}\n"
              "property float x\nproperty float y\nproperty float z\n"
              "end_header\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(points.tobytes())
