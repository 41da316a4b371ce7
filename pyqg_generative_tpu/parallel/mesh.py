"""Device-mesh parallelism: sharded ensembles, data-parallel and
tensor-parallel training.

The reference's only parallelism is SLURM job arrays over independent
processes (reference scripts/slurm_helpers.py, SURVEY §2 'Parallelism
inventory'). The TPU-native mapping:

* **ensemble parallelism (ep)** — online ensemble members are a vmapped axis
  sharded over the mesh; each chip integrates its members, collectives only
  appear in end-of-run reductions;
* **data parallelism (dp)** — training batches sharded over the mesh; params
  replicated, XLA inserts the gradient all-reduce;
* **tensor parallelism (tp)** — conv output channels of the widest layers
  sharded over a second mesh axis; XLA partitions the convs and inserts the
  activation collectives.

All of it via `jax.sharding.NamedSharding` annotations on a `Mesh` + `jit`:
no hand-written NCCL/MPI analogue anywhere.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ensemble_sharding", "batch_sharding",
           "replicated", "shard_params_tp"]


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh from the first prod(sizes) devices. Default: all devices
    on a single 'ens' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"ens": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(sizes)
    return Mesh(arr, names)


def ensemble_sharding(mesh: Mesh, axis: str = "ens") -> NamedSharding:
    """Shard the leading (member) axis over `axis`."""
    return NamedSharding(mesh, P(axis))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh, axis: str = "tp"):
    """Sharding tree for a params pytree: conv/dense kernels whose output
    channel count divides the tp axis get their last dim sharded; everything
    else is replicated. Returns a pytree of NamedShardings matching params."""
    tp = mesh.shape[axis]

    def spec(x):
        shape = np.shape(x)
        if len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= tp:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)
