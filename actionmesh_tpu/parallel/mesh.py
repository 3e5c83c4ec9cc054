"""Device mesh + sharding rules (the reference has no distributed code).

The reference is single-GPU (SURVEY.md §2.4: no torch.distributed / NCCL
anywhere); its memory knobs were split_cfg_batch and lazy model residency.
On TPU these are replaced by first-class SPMD sharding over an ICI mesh:

  * ``dp`` axis — data parallel over the CFG guidance branch (the natural
    2-way batch, reference guidance.py:56) and frames.
  * ``tp`` axis — tensor parallel over attention heads / FF inner dim
    (Megatron-style column->row sharding); XLA GSPMD inserts the
    all-reduces over ICI.

Everything uses ``jax.sharding.NamedSharding`` annotations on params and
batch inputs; the compute functions are unchanged — XLA propagates the
shardings through the whole denoise scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    sp: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Create a (dp, tp[, sp]) mesh. Defaults: dp=2 (CFG branches), rest tp.

    ``sp`` > 1 adds a sequence-parallel axis: the flash attention path then
    shards the inflated token sequence and runs a ring schedule
    (ops/attention.ring_attention_local) with KV ppermute over ICI.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    sp_size = 1 if sp is None else sp
    inner = n_devices // sp_size
    assert inner * sp_size == n_devices, "sp must divide n_devices"
    if dp is None and tp is None:
        dp = 2 if inner % 2 == 0 and inner > 1 else 1
        tp = inner // dp
    elif dp is None:
        dp = inner // tp
    elif tp is None:
        tp = inner // dp
    assert dp * tp * sp_size == n_devices, (
        f"dp*tp*sp must equal n_devices ({n_devices})"
    )
    if sp is None:
        dev_array = np.asarray(devices).reshape(dp, tp)
        return Mesh(dev_array, axis_names=("dp", "tp"))
    dev_array = np.asarray(devices).reshape(dp, tp, sp_size)
    return Mesh(dev_array, axis_names=("dp", "tp", "sp"))


def _attention_spec(mesh: Mesh) -> dict:
    """Column-parallel qkv, row-parallel output projection."""
    col = NamedSharding(mesh, P(None, "tp"))
    row = NamedSharding(mesh, P("tp", None))
    col_bias = NamedSharding(mesh, P("tp"))
    rep = NamedSharding(mesh, P())
    return {
        "to_q": {"kernel": col, "bias": col_bias},
        "to_k": {"kernel": col, "bias": col_bias},
        "to_v": {"kernel": col, "bias": col_bias},
        "to_out": {"kernel": row, "bias": rep},
        "norm_q": {"scale": rep},
        "norm_k": {"scale": rep},
        "norm_cross": {"scale": rep, "bias": rep},
    }


def _ff_spec(mesh: Mesh) -> dict:
    col = NamedSharding(mesh, P(None, "tp"))
    row = NamedSharding(mesh, P("tp", None))
    col_bias = NamedSharding(mesh, P("tp"))
    rep = NamedSharding(mesh, P())
    return {
        "net_0": {"kernel": col, "bias": col_bias},
        "net_2": {"kernel": row, "bias": rep},
    }


def _block_spec(mesh: Mesh) -> dict:
    rep_ln = {"scale": NamedSharding(mesh, P()), "bias": NamedSharding(mesh, P())}
    return {
        "norm_s_attn": rep_ln,
        "s_attn": _attention_spec(mesh),
        "norm_x_attn": rep_ln,
        "x_attn": _attention_spec(mesh),
        "norm_ff": rep_ln,
        "ff": _ff_spec(mesh),
        "norm_skip": rep_ln,
        "linear_skip": {
            "kernel": NamedSharding(mesh, P()),
            "bias": NamedSharding(mesh, P()),
        },
    }


def _prune_to(tree_spec, params, mesh: Mesh):
    """Keep only spec entries whose keys exist in params (dicts and lists).

    Params without a spec entry replicate."""
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            spec_v = tree_spec.get(k) if isinstance(tree_spec, dict) else None
            if spec_v is None:
                out[k] = (
                    _prune_to(None, v, mesh)
                    if isinstance(v, (dict, list))
                    else NamedSharding(mesh, P())
                )
            else:
                out[k] = _prune_to(spec_v, v, mesh)
        return out
    if isinstance(params, list):
        spec_list = (
            tree_spec
            if isinstance(tree_spec, list) and len(tree_spec) == len(params)
            else [tree_spec] * len(params)
        )
        return [_prune_to(s, p, mesh) for s, p in zip(spec_list, params)]
    if tree_spec is None:
        return NamedSharding(mesh, P())
    return tree_spec


def denoiser_param_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedSharding pytree for the Stage I denoiser parameters."""
    rep = NamedSharding(mesh, P())
    rep_ln = {"scale": rep, "bias": rep}
    block = _block_spec(mesh)
    spec = {
        "time_proj": {
            "linear_1": {
                "kernel": NamedSharding(mesh, P(None, "tp")),
                "bias": NamedSharding(mesh, P("tp")),
            },
            "linear_2": {
                "kernel": NamedSharding(mesh, P("tp", None)),
                "bias": rep,
            },
        },
        "proj_in": {"kernel": rep, "bias": rep},
        "blocks": [block] * len(params["blocks"]),
        "norm_out": rep_ln,
        "proj_out": {"kernel": rep, "bias": rep},
    }
    return _prune_to(spec, params, mesh)


def autoencoder_param_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedSharding pytree for the Stage II autoencoder parameters."""
    rep = NamedSharding(mesh, P())
    rep_ln = {"scale": rep, "bias": rep}
    block = _block_spec(mesh)
    spec = {
        "blocks": [block] * len(params["blocks"]),
        "proj_query": {"kernel": rep, "bias": rep},
        "norm_out": rep_ln,
        "proj_out": {"kernel": rep, "bias": rep},
        "post_quant": {"kernel": rep, "bias": rep},
    }
    return _prune_to(spec, params, mesh)


def shard_params(params: dict, shardings: dict) -> dict:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (CFG/guidance) batch axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
