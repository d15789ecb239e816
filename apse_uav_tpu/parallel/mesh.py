"""Mesh construction and data-parallel wrappers.

Usage pattern (the scaling recipe: pick a mesh, annotate shardings, let XLA
insert collectives):

    mesh = data_mesh()                        # all local devices on axis "data"
    infer = sharded_inference_fn(mesh, lambda p, x: model.apply(...), params)
    dets = infer(frames)                      # frames sharded over "data"
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over local devices (ICI within a slice)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Place a host batch with the leading axis sharded over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def sharded_inference_fn(
    mesh: Mesh,
    fn: Callable,
    params: Any,
    axis: str = "data",
) -> Callable:
    """jit ``fn(params, batch)`` with params replicated and batch sharded.

    The batch size must be a multiple of the mesh size.  XLA partitions the
    whole program; per-image work (detection heads, NMS) is embarrassingly
    parallel so no collectives are emitted on the forward path.
    """
    repl = replicate(mesh)
    batched = batch_sharding(mesh, axis)
    params = jax.device_put(params, repl)
    jfn = jax.jit(fn, in_shardings=(repl, batched), out_shardings=batched)

    def run(batch):
        return jfn(params, jax.device_put(batch, batched))

    return run


def shard_map_batch(mesh: Mesh, fn: Callable, axis: str = "data") -> Callable:
    """Run ``fn(batch)`` per device on its local shard of the leading axis.

    Unlike :func:`sharded_inference_fn` (which lets XLA's auto-partitioner
    split a jitted program), shard_map runs the UNPARTITIONED program once
    per device — required for programs containing custom kernels
    (pallas_call) that the partitioner cannot split.  This is how the ArUco
    preproc/detection front scales over frames on a multi-chip mesh.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def tree_spec(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def run(batch):
        sharded = shard_map(
            fn,
            mesh=mesh,
            in_specs=tree_spec(batch, P(axis)),
            out_specs=P(axis),
        )
        return jax.jit(sharded)(batch)

    return run


def mean_across_devices(mesh: Mesh, fn: Callable, axis: str = "data") -> Callable:
    """shard_map wrapper computing a cross-device mean of per-shard metrics
    (the eval-aggregation psum pattern)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def reducer(x):
        local = fn(x)
        return jax.lax.pmean(local, axis)

    return jax.jit(
        shard_map(
            reducer, mesh=mesh, in_specs=P(axis), out_specs=P(),
        )
    )
