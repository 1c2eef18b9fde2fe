"""Checkpoint save/restore for the full device-state pytree.

The reference's ``StoreBackups`` writes restart text files with **no loader**
(``src/algorithms.jl:264-303``; SURVEY §5 "there is no loader").  This module
is the upgrade: the complete device state — chain-state pytree, per-chain PRNG
keys, acceptance counters, move parameters, and the step counter — round-trips
through a single ``.npz`` file, so a run can actually resume.

Keys (typed PRNG arrays) are serialised via ``jax.random.key_data`` and
rebuilt with ``jax.random.wrap_key_data``.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save", "restore", "resume_state"]

_KEY_MARK = "__prngkey__"


def _to_host(leaf) -> np.ndarray:
    """Host transfer that all-gathers sharded multi-host leaves."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils
        leaf = multihost_utils.process_allgather(leaf, tiled=True)
    return np.asarray(leaf)


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
                      for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def save(path: str, dstate: Any) -> None:
    """Serialise a device-state pytree to ``path`` (.npz).

    Multi-host: collective (all processes must call it — sharded leaves are
    all-gathered); only process 0 writes the file.
    """
    paths, leaves, _ = _flatten_with_paths(dstate)
    arrays = {}
    meta = {}
    for i, (p, leaf) in enumerate(zip(paths, leaves)):
        name = f"leaf_{i}"
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key):
            arrays[name] = _to_host(jax.random.key_data(leaf))
            meta[name] = {"path": p, _KEY_MARK: str(jax.random.key_impl(leaf))}
        else:
            arrays[name] = _to_host(leaf)
            meta[name] = {"path": p}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    if jax.process_index() == 0:
        np.savez(path, **arrays)


def restore(path: str, like: Any) -> Any:
    """Rebuild a device-state pytree from ``path``, using ``like`` (a pytree
    with the same structure, e.g. ``Simulation.init_device_state()``) as the
    structural template."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    _, like_leaves, treedef = _flatten_with_paths(like)
    n = len(like_leaves)
    leaves = []
    for i in range(n):
        name = f"leaf_{i}"
        arr = data[name]
        if _KEY_MARK in meta[name]:
            leaves.append(jax.random.wrap_key_data(
                jnp.asarray(arr), impl=meta[name][_KEY_MARK]))
        else:
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def resume_state(simulation, path: str) -> None:
    """Load a checkpoint into ``simulation`` so a subsequent ``run`` (with
    schedules beyond the checkpointed step) continues from it."""
    template = simulation.init_device_state()
    dstate = restore(path, template)
    if simulation.mesh is not None:
        # re-place on the mesh: restore() yields unsharded host arrays
        from .parallel.mesh import shard_device_state
        dstate = shard_device_state(dstate, simulation.mesh,
                                    simulation.n_chains)
    simulation.device_state = dstate
    simulation.t = int(dstate["t"])
