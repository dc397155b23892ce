"""Device mesh + sharding for data-parallel UDA training.

The reference's entire distribution stack — MMDataParallel, the per-submodule
DistributedDataParallelWrapper (reference mmseg/core/ddp_wrapper.py:11-137,
needed because frozen teacher/CycleGAN break DDP gradient sync), NCCL
all-reduce of the three separate backwards — dissolves into GSPMD: the batch
is sharded over a ``data`` mesh axis, the state is replicated, and XLA
inserts the gradient all-reduce (over ICI in-slice, DCN across slices)
because every loss is a global mean.  The EMA teacher and frozen CycleGAN
are just replicated pytrees inside the same jitted step.

An optional ``space`` axis shards the spatial (height) dimension of the
512x512 token grid — the sequence-parallel analogue for this workload
(SURVEY.md §2.10/§5.7); conv halos and attention re-gathers are handled by
XLA's SPMD partitioner.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_space: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    devs = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devs, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Batch arrays: dim0 over 'data', optionally dim1 (H) over 'space'."""
    spec = P("data", "space") if spatial else P("data")
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Place a host batch dict onto the mesh (leading dim sharded)."""
    sh_img = batch_sharding(mesh, spatial)
    sh_flat = batch_sharding(mesh, False)

    def place(x):
        sh = sh_img if (spatial and x.ndim >= 3) else sh_flat
        return jax.device_put(x, sh)

    return jax.tree.map(place, batch)


def make_parallel_train_step(trainer, mesh: Mesh, *, donate: bool = True,
                             spatial: bool = False):
    """jit the DACS step over the mesh: state replicated, batch data-sharded.

    GSPMD turns the global-mean losses into per-shard means + all-reduce; the
    parameter update and EMA blend stay replicated (no ZeRO sharding needed:
    ~210M fp32 params fit comfortably per chip)."""
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, spatial)

    def step(state, batch, rng):
        return trainer.train_step(state, batch, rng)

    return jax.jit(
        step,
        in_shardings=(repl, bsh, repl),   # prefix shardings broadcast to leaves
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else ())
