"""Device mesh + sharding rules (data x model).

The reference trains strictly single-GPU (SURVEY.md section 2.4), so this whole
subsystem is net-new capability, built the TPU way: one ``jax.sharding.Mesh``
with ('data', 'model') axes, ``NamedSharding`` annotations on the batch and on
the large parameters, and XLA/GSPMD inserting the collectives (gradient
all-reduce over the data axis rides ICI; tensor-parallel matmuls shard their
contraction/output dims over the model axis).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code spans hosts — the mesh is built from ``jax.devices()`` which is then
global.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(
    mcfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    mcfg = mcfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, mcfg.model)
    data = mcfg.data if mcfg.data > 0 else max(1, n // model)
    use = data * model
    if use > n:
        raise ValueError(f"mesh {data}x{model} needs {use} devices, have {n}")
    mesh_devices = mesh_utils.create_device_mesh(
        (data, model), devices=devices[:use]
    )
    return Mesh(mesh_devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Utterance batches shard over the data axis (DP; SURVEY.md section 2.4)."""
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, T] stacks of prefetched batches: scan axis replicated, batch
    axis sharded over 'data' (feeds ``Trainer.train_steps``)."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_TP_MIN_SIZE = 1 << 14  # don't bother sharding tiny tensors


def _spec_for(path: str, shape: tuple, model_size: int) -> P:
    """Tensor-parallel rule: shard the output/feature axis of the big matmul
    weights over 'model' when divisible; everything else replicated.

    Covers: complex conv kernels [kh,kw,I,O] (shard O), LSTM w_ih/w_hh
    [F,4H] (shard 4H), projections [F,P] (shard P), ABF convs [kh,kw,I,O].
    """
    if model_size <= 1 or not shape:
        return P()
    size = int(np.prod(shape))
    if size < _TP_MIN_SIZE:
        return P()
    last = shape[-1]
    if last % model_size == 0 and last >= model_size:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings implementing the TP rule over a param tree."""
    model_size = mesh.shape["model"]

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        pstr = "/".join(str(p) for p in path)
        specs.append(
            NamedSharding(mesh, _spec_for(pstr, tuple(leaf.shape), model_size))
        )
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_tree(tree: Any, shardings: Any):
    return jax.device_put(tree, shardings)
