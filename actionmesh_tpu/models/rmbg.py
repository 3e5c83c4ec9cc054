"""RMBG-1.4 background matting (BriaRMBG / ISNet, U2-Net RSU family) in JAX.

TPU-native replacement for the reference's HF trust_remote_code wrapper
(reference: actionmesh/preprocessing/background_removal.py:41-148, model
briaai/RMBG-1.4 run at 1024x1024). Architecture is ISNet-DIS: a stride-2
input conv, six RSU (ReSidual U-block) encoder stages, five RSU decoder
stages with skip concats, and 3x3 side heads; the matte is sigmoid(side1).

Implementation notes (TPU-first):
  * NHWC layout, convs via lax.conv_general_dilated (XLA maps to MXU).
  * BatchNorm folds into the preceding conv at weight-conversion time;
    dev-mode random init uses identity BN.
  * The whole frame batch matts in one jitted forward.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

Params = dict

# (name, type, in, mid, out) per ISNet/BriaRMBG stage
_STAGES = [
    ("stage1", "RSU7", 64, 32, 64),
    ("stage2", "RSU6", 64, 32, 128),
    ("stage3", "RSU5", 128, 64, 256),
    ("stage4", "RSU4", 256, 128, 512),
    ("stage5", "RSU4F", 512, 256, 512),
    ("stage6", "RSU4F", 512, 256, 512),
]
_DSTAGES = [
    ("stage5d", "RSU4F", 1024, 256, 512),
    ("stage4d", "RSU4", 1024, 128, 256),
    ("stage3d", "RSU5", 512, 64, 128),
    ("stage2d", "RSU6", 256, 32, 64),
    ("stage1d", "RSU7", 128, 16, 64),
]
_RSU_HEIGHT = {"RSU7": 7, "RSU6": 6, "RSU5": 5, "RSU4": 4, "RSU4F": 4}


def _init_conv(key, in_ch, out_ch, ksize=3, dtype=jnp.float32) -> Params:
    fan_in = in_ch * ksize * ksize
    w = jax.random.normal(key, (ksize, ksize, in_ch, out_ch)) * (
        2.0 / fan_in
    ) ** 0.5
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((out_ch,), dtype)}


def _conv(params: Params, x, stride=1, dilation=1):
    return (
        jax.lax.conv_general_dilated(
            x,
            params["kernel"].astype(x.dtype),
            window_strides=(stride, stride),
            padding=[(dilation, dilation), (dilation, dilation)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + params["bias"].astype(x.dtype)
    )


def _rebnconv(params: Params, x, dilation=1):
    """Conv(+folded BN) + ReLU."""
    return jax.nn.relu(_conv(params, x, dilation=dilation))


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )


def _upsample_to(x, target_hw):
    return jax.image.resize(
        x, (x.shape[0],) + tuple(target_hw) + (x.shape[3],), method="bilinear"
    )


def _init_rsu(key, kind: str, in_ch: int, mid_ch: int, out_ch: int) -> Params:
    h = _RSU_HEIGHT[kind]
    keys = jax.random.split(key, 2 * h + 1)
    params = {"rebnconvin": _init_conv(keys[0], in_ch, out_ch)}
    # encoder convs 1..h
    ch = out_ch
    for i in range(1, h + 1):
        cin = ch if i == 1 else mid_ch
        params[f"rebnconv{i}"] = _init_conv(keys[i], cin, mid_ch)
    # decoder convs (h-1)..1
    for i in range(h - 1, 0, -1):
        cout = out_ch if i == 1 else mid_ch
        params[f"rebnconv{i}d"] = _init_conv(keys[h + i], 2 * mid_ch, cout)
    return params


def _rsu_forward(params: Params, x, kind: str):
    h = _RSU_HEIGHT[kind]
    hxin = _rebnconv(params["rebnconvin"], x)

    if kind == "RSU4F":
        # fully dilated: no pooling, dirates 1, 2, 4, 8 then 4, 2, 1
        hx1 = _rebnconv(params["rebnconv1"], hxin, dilation=1)
        hx2 = _rebnconv(params["rebnconv2"], hx1, dilation=2)
        hx3 = _rebnconv(params["rebnconv3"], hx2, dilation=4)
        hx4 = _rebnconv(params["rebnconv4"], hx3, dilation=8)
        hx3d = _rebnconv(
            params["rebnconv3d"], jnp.concatenate([hx4, hx3], -1), dilation=4
        )
        hx2d = _rebnconv(
            params["rebnconv2d"], jnp.concatenate([hx3d, hx2], -1), dilation=2
        )
        hx1d = _rebnconv(
            params["rebnconv1d"], jnp.concatenate([hx2d, hx1], -1), dilation=1
        )
        return hx1d + hxin

    # standard RSU: encoder with pools, innermost dilated, decoder with ups
    enc = []
    hx = hxin
    for i in range(1, h):
        hx = _rebnconv(params[f"rebnconv{i}"], hx)
        enc.append(hx)
        if i < h - 1:
            hx = _maxpool2(hx)
    hx_last = _rebnconv(params[f"rebnconv{h}"], enc[-1], dilation=2)

    hx = hx_last
    for i in range(h - 1, 0, -1):
        hx = _rebnconv(
            params[f"rebnconv{i}d"], jnp.concatenate([hx, enc[i - 1]], -1)
        )
        if i > 1:
            hx = _upsample_to(hx, enc[i - 2].shape[1:3])
    return hx + hxin


@dataclasses.dataclass(frozen=True)
class RMBGConfig:
    in_ch: int = 3
    out_ch: int = 1
    input_size: int = 1024


def init_rmbg(key: jax.Array, cfg: RMBGConfig = RMBGConfig()) -> Params:
    n = 1 + len(_STAGES) + len(_DSTAGES) + 6
    keys = jax.random.split(key, n)
    ki = iter(range(n))
    params: Params = {
        "conv_in": _init_conv(keys[next(ki)], cfg.in_ch, 64),
    }
    for name, kind, cin, mid, cout in _STAGES + _DSTAGES:
        params[name] = _init_rsu(keys[next(ki)], kind, cin, mid, cout)
    side_in = [64, 64, 128, 256, 512, 512]
    for i in range(6):
        params[f"side{i + 1}"] = _init_conv(
            keys[next(ki)], side_in[i], cfg.out_ch
        )
    return params


@functools.partial(jax.jit, static_argnames=())
def rmbg_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, 3) normalized -> matte logits (B, H, W, 1) (side1)."""
    in_hw = x.shape[1:3]
    hxin = _conv(params["conv_in"], x, stride=2)

    hx1 = _rsu_forward(params["stage1"], hxin, "RSU7")
    hx = _maxpool2(hx1)
    hx2 = _rsu_forward(params["stage2"], hx, "RSU6")
    hx = _maxpool2(hx2)
    hx3 = _rsu_forward(params["stage3"], hx, "RSU5")
    hx = _maxpool2(hx3)
    hx4 = _rsu_forward(params["stage4"], hx, "RSU4")
    hx = _maxpool2(hx4)
    hx5 = _rsu_forward(params["stage5"], hx, "RSU4F")
    hx = _maxpool2(hx5)
    hx6 = _rsu_forward(params["stage6"], hx, "RSU4F")

    hx6up = _upsample_to(hx6, hx5.shape[1:3])
    hx5d = _rsu_forward(
        params["stage5d"], jnp.concatenate([hx6up, hx5], -1), "RSU4F"
    )
    hx5dup = _upsample_to(hx5d, hx4.shape[1:3])
    hx4d = _rsu_forward(
        params["stage4d"], jnp.concatenate([hx5dup, hx4], -1), "RSU4"
    )
    hx4dup = _upsample_to(hx4d, hx3.shape[1:3])
    hx3d = _rsu_forward(
        params["stage3d"], jnp.concatenate([hx4dup, hx3], -1), "RSU5"
    )
    hx3dup = _upsample_to(hx3d, hx2.shape[1:3])
    hx2d = _rsu_forward(
        params["stage2d"], jnp.concatenate([hx3dup, hx2], -1), "RSU6"
    )
    hx2dup = _upsample_to(hx2d, hx1.shape[1:3])
    hx1d = _rsu_forward(
        params["stage1d"], jnp.concatenate([hx2dup, hx1], -1), "RSU7"
    )

    d1 = _conv(params["side1"], hx1d)
    return _upsample_to(d1, in_hw)


def convert_rmbg_weights(state: dict[str, np.ndarray]) -> Params:
    """Convert briaai/RMBG-1.4 torch state dict, folding BN into convs.

    torch names: stage1.rebnconvin.conv_s1.{weight,bias},
    stage1.rebnconvin.bn_s1.{weight,bias,running_mean,running_var}, ...
    conv_in.{weight,bias}, side1..side6.{weight,bias}.
    """

    def fold(conv_prefix: str, bn_prefix: Optional[str]) -> Params:
        w = state[f"{conv_prefix}.weight"]  # OIHW
        b = state.get(f"{conv_prefix}.bias")
        b = np.zeros(w.shape[0]) if b is None else b
        if bn_prefix is not None and f"{bn_prefix}.weight" in state:
            gamma = state[f"{bn_prefix}.weight"]
            beta = state[f"{bn_prefix}.bias"]
            mean = state[f"{bn_prefix}.running_mean"]
            var = state[f"{bn_prefix}.running_var"]
            scale = gamma / np.sqrt(var + 1e-5)
            w = w * scale[:, None, None, None]
            b = (b - mean) * scale + beta
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }

    try:
        params: Params = {"conv_in": fold("conv_in", None)}
        for name, kind, _, _, _ in _STAGES + _DSTAGES:
            h = _RSU_HEIGHT[kind]
            sub: Params = {
                "rebnconvin": fold(
                    f"{name}.rebnconvin.conv_s1", f"{name}.rebnconvin.bn_s1"
                )
            }
            for i in range(1, h + 1):
                sub[f"rebnconv{i}"] = fold(
                    f"{name}.rebnconv{i}.conv_s1", f"{name}.rebnconv{i}.bn_s1"
                )
            for i in range(h - 1, 0, -1):
                sub[f"rebnconv{i}d"] = fold(
                    f"{name}.rebnconv{i}d.conv_s1", f"{name}.rebnconv{i}d.bn_s1"
                )
            params[name] = sub
        for i in range(1, 7):
            params[f"side{i}"] = fold(f"side{i}", None)
    except KeyError as e:
        from actionmesh_tpu.utils.weights import describe_state_dict

        raise KeyError(
            f"RMBG key mapping mismatch: missing {e}.\n"
            "Checkpoint structure:\n" + describe_state_dict(state)
        ) from e
    return params


class RMBGModel:
    """BriaRMBG matting: PIL frame -> (H, W) uint8 alpha."""

    def __init__(self, params: Params, cfg: RMBGConfig = RMBGConfig()):
        self.params = params
        self.cfg = cfg

    @classmethod
    def from_pretrained(cls, path: Path) -> "RMBGModel":
        from actionmesh_tpu.utils.weights import load_safetensors_dir

        state = load_safetensors_dir(Path(path))
        return cls(convert_rmbg_weights(state))

    @classmethod
    def from_random(cls, seed: int = 0) -> "RMBGModel":
        return cls(init_rmbg(jax.random.PRNGKey(seed)))

    def predict_alpha(self, frame: Image.Image) -> np.ndarray:
        size = self.cfg.input_size
        orig_w, orig_h = frame.size
        img = frame.convert("RGB").resize((size, size), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        x = (x - 0.5) / 1.0  # RMBG-1.4 normalize: mean 0.5, std 1.0
        logits = rmbg_forward(self.params, jnp.asarray(x)[None])
        matte = jax.nn.sigmoid(logits)[0, :, :, 0]
        matte = np.asarray(matte, np.float32)
        # min-max stretch (as the HF pipeline does) then resize back
        lo, hi = matte.min(), matte.max()
        matte = (matte - lo) / max(hi - lo, 1e-8)
        alpha = Image.fromarray((matte * 255).astype(np.uint8)).resize(
            (orig_w, orig_h), Image.BILINEAR
        )
        return np.asarray(alpha)
