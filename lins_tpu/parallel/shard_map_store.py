"""Keyframe/map-block sharding across a device mesh (SURVEY.md §2 P3).

The keyframe store's arrays are sharded along the keyframe axis with
`NamedSharding`; the windowed local-map assembly then runs under jit with
those shardings and XLA inserts the gather collectives (the scaling-book
recipe: pick a mesh, annotate shardings, let XLA place the all-gathers).
Single-device and sharded assemblies are bit-identical (tested on the
virtual 8-device mesh).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lins_tpu.mapping import keyframes as kf


def shard_store(store: kf.KeyframeStore, mesh: Mesh,
                axis: str = "seq") -> kf.KeyframeStore:
    """Place every per-keyframe array sharded along the keyframe axis."""

    def put(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, store)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
