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

An optional ``model`` axis tensor-parallelizes the MiT encoder blocks
(Megatron column/row pairing over fc1/fc2 and q,kv/proj — _TP_RULES):
weights, EMA twins and AdamW moments all carry the shard, so per-chip
state shrinks with the axis and the optimizer/EMA updates stay local.
The reference has no model parallelism (torch DDP only); this is the
TPU-native extension for backbones that outgrow one chip.
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_space: int = 1,
              devices=None, n_model: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_space * n_model)
    devs = np.asarray(devices[: n_data * n_space * n_model]).reshape(
        n_data, n_space, n_model)
    return Mesh(devs, axis_names=("data", "space", "model"))


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


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Multi-host bring-up (the reference's init_dist/NCCL launcher path,
    tools/train.py:100-104): jax.distributed.initialize + (process_index,
    process_count). On a single-host run (no coordinator and no cluster env)
    this is a no-op returning (0, 1).

    Initializes only when explicitly asked (coordinator/num_processes) or
    when a multi-worker coordinator env is present — single-worker
    sandboxes export TPU_* vars too, so those must not trigger a cluster
    bring-up. Double-initialization is tolerated."""
    import os
    explicit = coordinator_address or (num_processes and num_processes > 1)
    env_coord = any(os.environ.get(k) for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if explicit or env_coord:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError:  # already initialized
            pass
    return jax.process_index(), jax.process_count()


_BARRIER_SEQ: dict = {}


def coordination_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Block until every process reaches this barrier (no-op single-process).

    Goes through the jax.distributed coordination service — NOT through a
    device collective — so it is safe to call while processes are minutes
    apart (compiling, loading, finishing uneven shards). Use it to align
    processes immediately before the FIRST execution of a program with
    cross-process collectives: the collective clique bring-up has a short
    handshake window (XLA:CPU gloo publishes endpoints with a 30 s
    GetKeyValue deadline) that a peer still busy tracing/compiling will
    miss. Every process must call with the same sequence of names; a
    per-name counter keeps repeated barriers distinct."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed
    client = getattr(distributed.global_state, "client", None)
    if client is None:
        return
    seq = _BARRIER_SEQ.get(name, 0)
    _BARRIER_SEQ[name] = seq + 1
    client.wait_at_barrier(f"cmda_{name}_{seq}", timeout_ms)


def shard_files_for_host(files: list, process_index: int | None = None,
                         process_count: int | None = None) -> list:
    """Per-host file-list shard — the DistributedSampler equivalent
    (reference mmseg/datasets/builder.py:136-139): host k takes every
    process_count-th file starting at k, so the global stream partitions
    without coordination."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return list(files)
    return list(files)[pi::pc]


def shard_batch_multihost(batch, mesh: Mesh, spatial: bool = False):
    """Assemble a GLOBAL batch from per-host local batches: each host feeds
    its local shard; jax.make_array_from_process_local_data builds the
    global sharded arrays (the multi-host twin of shard_batch)."""
    sh_img = batch_sharding(mesh, spatial)
    sh_flat = batch_sharding(mesh, False)

    def place(x):
        sh = sh_img if (spatial and x.ndim >= 3) else sh_flat
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(place, batch)


def opt_state_sharding(opt_state, mesh: Mesh):
    """ZeRO-1-style sharding spec for the optimizer state: dim-0 of every
    moment tensor is sharded over 'data' when divisible, scalars/counts
    replicated. On the ~210M-param flagship the f32 AdamW moments are
    ~1.7 GB — sharding them over an 8-chip data axis returns ~1.5 GB/chip
    (the 'optimizer-state sharding' lever of docs/SCALING.md). XLA inserts
    the update all-gather; gradients stay a single psum."""
    n = mesh.shape["data"]

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] % n == 0 and x.shape[0] > 0):
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, opt_state)


# Megatron-style tensor parallelism for the MiT encoder scan blocks
# (the reference has no TP at all — torch DDP only, ddp_wrapper.py; this is
# the TPU-native extension for backbones that outgrow one chip's HBM).
# Rule: (parent module, leaf) -> which dim carries the 'model' shard.
# fc1 / q / kv split their OUTPUT features; fc2 / attn-proj split their
# INPUT (reduction) features, so XLA closes each block with one psum —
# the classic column-then-row parallel pairing. The depthwise 3x3 between
# fc1 and fc2 is per-channel, so it shards with the hidden dim for free.
_TP_RULES = {
    ("fc1", "kernel"): -1, ("fc1", "bias"): -1,
    ("dwconv", "kernel"): -1, ("dwconv", "bias"): -1,
    ("q", "kernel"): -1, ("q", "bias"): -1,
    ("kv", "kernel"): -1, ("kv", "bias"): -1,
    ("fc2", "kernel"): -2,
    ("proj", "kernel"): -2,
}

_TP_STAGE = re.compile(r"blocks[1-4]")


def _path_parts(path) -> list:
    out = []
    for p in path:
        out.append(getattr(p, "name", None) or getattr(p, "key", None)
                   or str(p))
    return [str(s) for s in out]


def tp_spec(path, x, n_model: int):
    """PartitionSpec for one leaf under tensor parallelism (or P() if the
    leaf is not a sharded-block param / not divisible). Works for params,
    ema_params AND the AdamW moments: optax mu/nu mirror the param tree,
    so the (module, leaf) path suffix is identical."""
    parts = _path_parts(path)
    if not any(_TP_STAGE.fullmatch(s) for s in parts):
        return P()  # only the MiT encoder stages are tensor-parallel
    dim = _TP_RULES.get(tuple(parts[-2:]))
    if dim is None or not hasattr(x, "ndim") or x.ndim < abs(dim):
        return P()
    if n_model <= 1 or x.shape[dim] % n_model:
        return P()
    spec = [None] * x.ndim
    spec[dim % x.ndim] = "model"
    return P(*spec)


def tp_state_sharding(state, mesh: Mesh):
    """NamedSharding tree for the full train state under tensor parallelism:
    encoder block params / EMA params / AdamW moments carry the 'model'
    axis per tp_spec; everything else (batch stats, frozen nets, counters)
    is replicated."""
    n = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, tp_spec(path, x, n)), state)


def make_parallel_train_step(trainer, mesh: Mesh, *, donate: bool = True,
                             spatial: bool = False,
                             shard_opt_state: bool = False,
                             tensor_parallel: bool = False):
    """jit the DACS step over the mesh: state replicated, batch data-sharded.

    GSPMD turns the global-mean losses into per-shard means + all-reduce;
    the parameter update and EMA blend stay replicated (~210M fp32 params
    fit per chip). ``shard_opt_state=True`` additionally distributes the
    AdamW moments over the 'data' axis (opt_state_sharding) — numerically
    identical (tests/test_parallel.py), one extra update all-gather.
    ``tensor_parallel=True`` shards the encoder block weights, their EMA
    twins and their AdamW moments over the 'model' axis (tp_state_sharding)
    — the update and EMA blend then run shard-local with no gather."""
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, spatial)

    def step(state, batch, rng):
        return trainer.train_step(state, batch, rng)

    def synced_first_call(jit_fn):
        """Multi-process: AOT-compile on the first call, rendezvous at a
        coordination barrier, THEN execute — so every process enters the
        first collective run together. Without this, the fastest process
        dispatches while peers are still tracing/compiling and the
        collective clique bring-up times out (XLA:CPU gloo gives peers
        only 30 s to publish endpoints). Single-process: the jit fn as-is."""
        if jax.process_count() <= 1:
            return jit_fn
        cache = {}

        def stepper(state, batch, rng):
            if "fn" not in cache:
                cache["fn"] = jit_fn.lower(state, batch, rng).compile()
                coordination_barrier("train_step_ready")
            return cache["fn"](state, batch, rng)

        return stepper

    if not (shard_opt_state or tensor_parallel):
        return synced_first_call(jax.jit(
            step,
            in_shardings=(repl, bsh, repl),  # prefix shardings broadcast
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else ()))

    def state_shardings(state):
        if tensor_parallel:
            tree = tp_state_sharding(state, mesh)
            if not shard_opt_state:
                return tree
            return tree.replace(opt_state=opt_state_sharding(
                state.opt_state, mesh))
        tree = jax.tree.map(lambda _: repl, state)
        return tree.replace(opt_state=opt_state_sharding(state.opt_state,
                                                         mesh))

    def jit_for(state):
        sh = state_shardings(state)
        return jax.jit(
            step,
            in_shardings=(sh, bsh, repl),
            out_shardings=((sh, repl)),
            donate_argnums=(0,) if donate else ())

    # shardings depend on the concrete opt-state tree; build on first call
    cache = {}

    def stepper(state, batch, rng):
        if "fn" not in cache:
            cache["fn"] = synced_first_call(jit_for(state))
        return cache["fn"](state, batch, rng)

    return stepper
