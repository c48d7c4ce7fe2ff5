"""Device mesh and parameter sharding rules.

TPU-native replacement for the reference's torch.distributed NCCL stack
(SURVEY.md section 2.8: legacy_ddp data parallelism + optional fsdp_wrap): one
``Mesh(('data', 'model'))``; the batch is sharded over 'data', the big matmul
dimensions over 'model' (Megatron-style column/row split of attention heads and
FFN), and XLA inserts the psum/all-gather collectives over ICI.  There is no
unused-parameter machinery — grads of untouched params are structurally zero.

FSDP/ZeRO is a sharding choice, not a wrapper: ``fsdp=True`` shards every
parameter's first large axis over 'data' as well.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Megatron-style rules keyed on parameter path suffixes.  Column-parallel
# (output dim sharded): qkv projections, fc1.  Row-parallel (input dim
# sharded): out_proj, fc2 — their outputs need a psum, inserted by XLA.
_RULES = (
    (r"(q_proj|k_proj|v_proj)/kernel$",        P(None, "model")),
    (r"(q_proj|k_proj|v_proj)/bias$",          P("model")),
    (r"out_proj/kernel$",                      P("model", None)),
    (r"fc1/kernel$",                           P(None, "model")),
    (r"fc1/bias$",                             P("model")),
    (r"fc2/kernel$",                           P("model", None)),
    (r"embed_tokens/embedding$",               P(None, "model")),
    (r"output_projection/kernel$",             P(None, "model")),
    (r"proj/kernel$",                          P(None, "model")),   # CTC head
    (r"label_embs_concat$",                    P(None, None)),
)


def param_spec(path: str, shape: tuple, fsdp: bool = False,
               n_data: int = 1, n_model: int = 1) -> P:
    """Sharding spec for one parameter.

    ZeRO/FSDP shards the first *unsharded* axis whose size divides the 'data'
    axis — params with no such axis (tiny biases, odd conv dims) stay
    replicated, which is exactly torch FSDP's behavior for unshardable leaves.
    """
    ndim = len(shape)

    def _zero_extend(spec: P) -> P:
        if not fsdp:
            return spec
        parts = list(spec) + [None] * (ndim - len(spec))
        for i, p in enumerate(parts):
            if p is None and shape[i] % n_data == 0 and shape[i] >= n_data:
                parts[i] = "data"
                break
        return P(*parts)

    for pattern, spec in _RULES:
        if re.search(pattern, path):
            # drop the 'model' split when the axis doesn't divide n_model
            parts = list(spec) + [None] * (ndim - len(spec))
            for i, p in enumerate(parts):
                if p == "model" and (i >= ndim or shape[i] % n_model != 0):
                    parts[i] = None
            return _zero_extend(P(*parts))
    return _zero_extend(P())


def _flatten_path(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def params_shardings(params, mesh: Mesh, fsdp: bool = False):
    """Pytree of NamedSharding matching ``params``."""
    n_data = mesh.shape.get("data", 1)
    n_model = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        return NamedSharding(
            mesh,
            param_spec(_flatten_path(path), tuple(getattr(leaf, "shape", ())),
                       fsdp, n_data=n_data, n_model=n_model),
        )

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_shardings(batch, mesh: Mesh, batch_axis: int = 0):
    """Shard every array's batch axis over 'data' (axis 1 for accumulation
    batches, whose leading axis is the microbatch scan axis)."""
    spec = P(*([None] * batch_axis + ["data"]))
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, spec), batch
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_decode_variables(variables, mesh: Mesh, tensor_parallel: bool = False):
    """Place model variables for multi-device inference: replicated for
    data-parallel decode, Megatron-split (the _RULES above) when
    ``tensor_parallel`` — the TPU-native counterpart of the reference's
    fairseq-generate --distributed-world-size decode, which has no in-tree
    implementation (SURVEY.md 2.8)."""
    if not tensor_parallel:
        return jax.device_put(
            variables, jax.tree_util.tree_map(
                lambda _: replicated(mesh), variables)
        )
    out = dict(variables)
    out["params"] = jax.device_put(
        variables["params"], params_shardings(variables["params"], mesh)
    )
    for k, v in variables.items():
        if k != "params":
            out[k] = jax.device_put(
                v, jax.tree_util.tree_map(lambda _: replicated(mesh), v)
            )
    return out


def shard_decode_batch(args, mesh: Mesh):
    """device_put positional decode inputs with the batch axis over 'data'.
    Batch size must be a multiple of the 'data' axis (pad the tail batch)."""
    n_data = mesh.shape.get("data", 1)
    out = []
    for a in args:
        assert a.shape[0] % n_data == 0, (
            f"batch {a.shape[0]} not divisible by data axis {n_data}"
        )
        out.append(jax.device_put(a, NamedSharding(mesh, P("data"))))
    return tuple(out)
