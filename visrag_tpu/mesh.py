"""Device mesh construction and canonical sharding rules.

The reference's distributed runtime is torchrun+NCCL / Ray+FSDP meshes
(SURVEY.md §2.6); here the whole control plane is the JAX single controller and
the data plane is XLA collectives over mesh axes:

  replica — across DCN slices (HSDP outer axis; replicated weights)
  data    — DP/FSDP within a slice over ICI
  seq     — sequence parallelism (Ulysses-style all_to_all / ring attention)
  model   — tensor parallelism for serving

A 1-chip mesh degenerates every axis to 1 and all collectives become no-ops,
so the same program runs from 1 chip to a multi-pod deployment.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig

REPLICA, DATA, SEQ, MODEL = "replica", "data", "seq", "model"


def build_mesh(cfg: Optional[MeshConfig] = None,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = {REPLICA: cfg.replica, DATA: cfg.data, SEQ: cfg.seq, MODEL: cfg.model}
    fixed = math.prod(v for v in sizes.values() if v > 0)
    free = [k for k, v in sizes.items() if v <= 0]
    if free:
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {sizes}")
        fill = n // fixed
        for k in free[:-1]:
            sizes[k] = 1
        sizes[free[-1]] = fill
    if math.prod(sizes.values()) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    shape = tuple(sizes[a] for a in cfg.axis_names)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, cfg.axis_names)


def single_device_mesh() -> Mesh:
    return build_mesh(MeshConfig(data=1), devices=jax.devices()[:1])


def init_distributed(coordinator: Optional[str] = None,
                     process_id: Optional[int] = None,
                     num_processes: Optional[int] = None):
    """Multi-host (DCN) bootstrap — the torchrun / Ray-cluster role
    (reference visrag_scripts/train_retriever/train.sh torchrun block;
    rsgrpo/verl/trainer/main.py:110-121 ray.init). Call once per process
    BEFORE any device use; after it, jax.devices() spans every host and the
    single-controller programs below scale unchanged (the mesh's `replica`
    axis rides DCN, everything else ICI).

    Flags beat env vars (VISRAG_COORDINATOR / VISRAG_PROCESS_ID /
    VISRAG_NUM_PROCESSES). No coordinator configured → single-host no-op.
    Returns (process_id, num_processes)."""
    import os
    coordinator = coordinator or os.environ.get("VISRAG_COORDINATOR")
    if coordinator is None:
        return 0, 1
    process_id = int(process_id if process_id is not None
                     else os.environ["VISRAG_PROCESS_ID"])
    num_processes = int(num_processes if num_processes is not None
                        else os.environ["VISRAG_NUM_PROCESSES"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return process_id, num_processes


def multihost_mesh_config(cfg: MeshConfig, num_processes: int) -> MeshConfig:
    """Derive the mesh layout for an n-process run: the replica axis spans
    processes (weights replicated across DCN slices — HSDP outer axis), the
    data axis fills each process's local chips. An explicitly-set replica
    axis wins; it must then be a multiple of the process count so each
    DCN slice holds whole replicas."""
    import dataclasses
    if num_processes <= 1:
        return cfg
    if cfg.replica in (1, -1, 0):
        return dataclasses.replace(cfg, replica=num_processes)
    if cfg.replica % num_processes != 0:
        raise ValueError(
            f"replica={cfg.replica} not a multiple of num_processes="
            f"{num_processes}: replicas would straddle DCN slices")
    return cfg


# ---------------------------------------------------------------------------
# Sharding helpers
# ---------------------------------------------------------------------------


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard dim 0 (batch) over (replica, data); replicate the rest."""
    return NamedSharding(mesh, P((REPLICA, DATA), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(shape: tuple, mesh: Mesh, min_size: int = 2 ** 16) -> P:
    """ZeRO-3-style weight sharding rule: shard the largest divisible axis of
    each big parameter over `data`; small params stay replicated.

    Equivalent role to torch FSDP FULL_SHARD (reference fsdp_workers.py:243-286)
    but expressed as a static NamedSharding on the param pytree — XLA inserts
    the all-gathers/reduce-scatters.
    """
    n_data = mesh.shape[DATA]
    if n_data <= 1 or math.prod(shape) < min_size:
        return P(*([None] * len(shape)))
    # prefer sharding the first axis that divides; fall back to replication
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n_data == 0:
            spec = [None] * len(shape)
            spec[i] = DATA
            return P(*spec)
    return P(*([None] * len(shape)))


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Apply fsdp_param_spec across a param pytree, returning sharded arrays."""
    def place(x):
        spec = fsdp_param_spec(x.shape, mesh, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, params)


# Megatron-style tensor-parallel rules for transformer kernels stored in
# torch (out, in) layout: column-parallel ops shard the OUT dim, their
# row-parallel counterparts shard the IN dim so the pair needs one psum
# (inserted by GSPMD). Everything else replicates over `model`.
# Name sets cover both HF-style (q_proj/...) and this repo's module names
# (attn_q/attn_k/attn_v + mlp_gate/mlp_up in the Qwen text stack — sharding
# the attention OUT dims over `model` keeps q/k/v head-aligned with the
# kvh-sharded KV pools, so the paged decode kernel's shard_map needs no
# collectives; see serving/paged_kv.paged_decode_attention).
_TP_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "attn_qkv",
           "mlp_fc1", "kv_proj", "lm_head",
           "attn_q", "attn_k", "attn_v", "mlp_gate", "mlp_up")
_TP_ROW = ("o_proj", "down_proj", "attn_proj", "mlp_fc2", "out_proj",
           "attn_o", "mlp_down")


def tp_param_spec(path: Sequence[str], shape: tuple, mesh: Mesh) -> P:
    """Tensor-parallel NamedSharding rule by module-path name (serving-time
    TP — the vLLM tensor_parallel_size role, fsdp_workers.py:331-350)."""
    n_model = mesh.shape[MODEL]
    spec = [None] * len(shape)
    if n_model <= 1 or len(shape) < 1:
        return P(*spec)
    names = set(path)
    if path and path[-1] == "embedding" and len(shape) == 2 \
            and shape[0] % n_model == 0:
        spec[0] = MODEL                       # vocab-sharded embedding
    elif any(n in names for n in _TP_COL) and shape[0] % n_model == 0:
        spec[0] = MODEL
    elif any(n in names for n in _TP_ROW) and len(shape) >= 2 \
            and shape[-1] % n_model == 0:
        spec[-1] = MODEL
    return P(*spec)


def shard_params_tp(params, mesh: Mesh):
    """Apply tp_param_spec across a param pytree (path-aware)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    out = {}

    def place(path, x):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        spec = tp_param_spec(keys, x.shape, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    leaves = [(p, place(p, x)) for p, x in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], [x for _, x in leaves])


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[REPLICA] * mesh.shape[DATA]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} data shards")
    return global_batch // n
