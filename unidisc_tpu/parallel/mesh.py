"""Device mesh and sharding rules (GSPMD).

TPU-native replacement for the reference's torch_xla SPMD mesh setup
(reference: main.py:943-998) and FSDPv2 wrapping
(reference: unidisc/utils/xla_utils.py:79-267). The same three mesh axes are
kept — ('dcn', 'fsdp', 'tensor') — where 'dcn' is the multislice
data-parallel axis riding the data-center network, 'fsdp' shards parameters
and the batch over ICI, and 'tensor' is reserved for tensor parallelism.

Design: instead of wrapping modules, we derive a `PartitionSpec` per
parameter from its shape (largest-dim rule, mirroring
xla_utils.py:161-208), hand the specs to `jax.jit` as in/out shardings, and
let XLA insert all collectives (reduce-scatter/all-gather over ICI,
cross-slice all-reduce over DCN).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unidisc_tpu.config import MeshConfig

# Parameters smaller than this stay replicated (reference: xla_utils.py:259-262
# keeps small/frozen params unsharded).
MIN_SHARD_SIZE = 2 ** 14


def resolve_mesh_shape(cfg: MeshConfig, n_devices: int) -> tuple:
    sizes = (cfg.dcn, cfg.fsdp, cfg.tensor, getattr(cfg, "seq", 1),
             getattr(cfg, "pp", 1), getattr(cfg, "ep", 1))
    known = [d for d in sizes if d != -1]
    prod = math.prod(known) if known else 1
    remaining = n_devices // max(prod, 1)
    shape = tuple(remaining if d == -1 else d for d in sizes)
    if math.prod(shape) != n_devices:
        raise ValueError(
            f"mesh {shape} does not cover {n_devices} devices")
    return shape


def make_mesh(cfg: MeshConfig, devices: Optional[list] = None) -> Mesh:
    """Build the ('dcn','fsdp','tensor','seq') device mesh.

    For multislice topologies (dcn > 1) uses a hybrid mesh so the 'dcn' axis
    maps onto the slice boundary (reference HybridMesh, main.py:976-981).
    The 'seq' axis (sequence/context parallelism, ring attention) should
    stay within a slice — it carries per-layer ppermute traffic.
    """
    devices = devices if devices is not None else jax.devices()
    shape = resolve_mesh_shape(cfg, len(devices))
    if shape[0] > 1 and devices[0].platform == "tpu":
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            (1,) + shape[1:], (shape[0],) + (1,) * (len(shape) - 1),
            devices=devices)
    else:
        mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, cfg.axis_names())


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------

# megatron-style 2D rules for the tensor axis (reference scaffolding:
# xla_utils.py:183-203 spmd_2d_sharding — q/k/v ('fsdp','model'),
# projections ('model','fsdp')): column-parallel up-projections put the
# output dim on 'tensor', row-parallel down-projections put the input dim
# on 'tensor'; XLA inserts the psum after row-parallel matmuls.
_TP_COL = ("attn_qkv/kernel", "mlp_0/kernel", "adaLN_modulation/kernel")
_TP_ROW = ("attn_out/kernel", "mlp_2/kernel")


def param_spec(path: str, shape: tuple, mesh: Mesh) -> P:
    """FSDP (+ optional tensor-parallel) sharding rule for one parameter.

    Shard the largest dimension that divides the 'fsdp' axis size; replicate
    small params (reference: xla_utils.py:161-208 shards each param's largest
    dim and replicates small/frozen ones). Scan-stacked block params carry a
    leading 'layers' axis (n_blocks) which is skipped — sharding the layer
    axis would turn the per-layer scan into a collective per step. When the
    mesh has a 'tensor' axis > 1, block matrices additionally get
    megatron-style 2D sharding.
    """
    fsdp = mesh.shape["fsdp"]
    tensor = mesh.shape.get("tensor", 1)
    if math.prod(shape) < MIN_SHARD_SIZE:
        return P()

    dims = list(range(len(shape)))
    pp = mesh.shape.get("pp", 1)
    pp_dim = None
    if "blocks" in path and len(shape) > 1:
        dims = dims[1:]  # skip scan 'layers' axis for fsdp/tensor
        if pp > 1 and shape[0] % pp == 0:
            # pipeline stages own contiguous layer groups: the stacked
            # layer axis shards over 'pp' so each stage's weights are
            # resident in its own HBM (parallel/pipeline.py)
            pp_dim = 0
    # expert parallelism: MoE expert-stacked weights (models/moe.py names
    # them under a 'moe' module) put their leading expert axis on 'ep' so
    # each device group owns a subset of experts; the dispatch/combine
    # einsums then lower to all_to_alls under GSPMD
    ep = mesh.shape.get("ep", 1)
    ep_dim = None
    if ep > 1 and "/moe/" in f"/{path}" and len(dims) >= 2 \
            and path.rsplit("/", 1)[-1] in ("w1", "w2", "b1", "b2"):
        e_dim = dims[0]
        if shape[e_dim] % ep == 0:
            ep_dim = e_dim
            dims = dims[1:]  # fsdp/tensor pick from the remaining dims

    def finish(spec):
        if pp_dim is not None:
            spec[pp_dim] = "pp"
        if ep_dim is not None:
            spec[ep_dim] = "ep"
        return P(*spec)

    if tensor > 1 and len(dims) == 2:
        d_in, d_out = dims
        col = any(path.endswith(s) for s in _TP_COL)
        row = any(path.endswith(s) for s in _TP_ROW)
        if col and shape[d_out] % tensor == 0:
            spec = [None] * len(shape)
            spec[d_out] = "tensor"
            if fsdp > 1 and shape[d_in] % fsdp == 0:
                spec[d_in] = "fsdp"
            return finish(spec)
        if row and shape[d_in] % tensor == 0:
            spec = [None] * len(shape)
            spec[d_in] = "tensor"
            if fsdp > 1 and shape[d_out] % fsdp == 0:
                spec[d_out] = "fsdp"
            return finish(spec)

    if fsdp <= 1:
        return finish([None] * len(shape))
    # largest shardable dim
    best = None
    for d in sorted(dims, key=lambda d: -shape[d]):
        if shape[d] % fsdp == 0:
            best = d
            break
    if best is None:
        return finish([None] * len(shape))
    spec = [None] * len(shape)
    spec[best] = "fsdp"
    return finish(spec)


def params_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a parameter (or optimizer-state) pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def one(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                        for p in path_entries)
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_spec(path, leaf.shape, mesh))

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [one(p, l) for p, l in flat])


def _seq_axis(mesh: Mesh):
    return "seq" if mesh.shape.get("seq", 1) > 1 else None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batch sharded over (dcn, fsdp) on the leading (batch) dim
    (reference: xla_utils.py:270-278 input sharding (('dcn','fsdp'), None));
    with sequence parallelism active, (B, L) data additionally shards L
    over 'seq'."""
    if _seq_axis(mesh):
        return NamedSharding(mesh, P(("dcn", "fsdp"), "seq"))
    return NamedSharding(mesh, P(("dcn", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def logits_constraint(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Keep activations/logits batch-sharded inside the jitted step
    (reference: xla_utils.py:6-18 shard_output)."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(("dcn", "fsdp"), _seq_axis(mesh), None)))
