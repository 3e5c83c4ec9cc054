"""safetensors(torch) -> JAX pytree weight conversion.

The reference loads four checkpoint families (reference:
actionmesh/pipeline.py:70-85, temporal_denoiser.py:17, SURVEY.md §5
checkpoint notes): ActionMesh denoiser/autoencoder (PyTorchModelHubMixin),
DINOv2-L, RMBG-1.4 and TripoSG. This module converts their torch
safetensors into our functional param pytrees: torch Linear weights (out,
in) transpose to (in, out) kernels; conv kernels OIHW -> HWIO; norm weights
map to scale/bias. qkv stay as separate to_q/to_k/to_v (the reference fuses
at runtime, attention_processor.py:106-115 — XLA fuses the three matmuls
itself).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Iterator

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# safetensors loading (sharded or single-file)
# ---------------------------------------------------------------------------

def load_safetensors_dir(path: Path, check_finite: bool = True) -> dict[str, np.ndarray]:
    """Load all *.safetensors under `path` (handles HF shard indexes).

    With ``check_finite`` (default), every float tensor is scanned for
    inf/nan on load — fp16 checkpoints (TripoSG ships fp16,
    ref:actionmesh/external/triposg.py:140-142) can carry overflowed values
    that would otherwise surface only as silent garbage after conversion.
    """
    from safetensors.numpy import load_file

    path = Path(path)
    if path.is_file():
        state = dict(load_file(str(path)))
    else:
        index = path / "model.safetensors.index.json"
        files: list[Path]
        if index.exists():
            shard_names = sorted(
                set(json.loads(index.read_text())["weight_map"].values())
            )
            files = [path / name for name in shard_names]
        else:
            files = sorted(path.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"No safetensors files under {path}")
        state = {}
        for f in files:
            state.update(load_file(str(f)))
    if check_finite:
        check_finite_state(state, str(path))
    return state


def check_finite_state(state: dict, source: str = "<state dict>") -> None:
    """Raise if any float tensor contains inf/nan, naming every offender.

    First-contact guard: a corrupted or fp16-overflowed checkpoint must
    fail here with tensor names, not as garbage model output later.
    """
    bad: list[str] = []
    for k, v in state.items():
        a = np.asarray(v)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        # np.isfinite handles fp16/32/64 natively (an f32 upcast would
        # both copy multi-GB checkpoints and turn finite f64 values above
        # f32-max into false inf); only non-native dtypes (bf16, fp8)
        # need the upcast
        if a.dtype in (np.float16, np.float32, np.float64):
            n = int(a.size - np.isfinite(a).sum())
        else:
            n = int(a.size - np.isfinite(a.astype(np.float32)).sum())
        if n:
            bad.append(f"{k}: {n}/{a.size} non-finite ({a.dtype}, shape {tuple(a.shape)})")
    if bad:
        raise ValueError(
            f"{source}: checkpoint contains non-finite values in "
            f"{len(bad)} tensor(s):\n  " + "\n  ".join(bad[:20])
            + (f"\n  ... {len(bad) - 20} more" if len(bad) > 20 else "")
        )


def _to_jnp(x: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(x, dtype=dtype)


def _linear(state: dict, prefix: str, dtype) -> dict:
    out = {"kernel": _to_jnp(state[f"{prefix}.weight"].T, dtype)}
    if f"{prefix}.bias" in state:
        out["bias"] = _to_jnp(state[f"{prefix}.bias"], dtype)
    return out


def _layer_norm(state: dict, prefix: str) -> dict:
    return {
        "scale": _to_jnp(state[f"{prefix}.weight"], jnp.float32),
        "bias": _to_jnp(state[f"{prefix}.bias"], jnp.float32),
    }


def _rms_norm(state: dict, prefix: str) -> dict:
    return {"scale": _to_jnp(state[f"{prefix}.weight"], jnp.float32)}


def _permute_head_channels(tree: dict, heads: int, perm) -> dict:
    """Permute per-head output channels of a q/k projection (+ norm scale).

    Applies the interleaved->half RoPE layout permutation
    (ops/rotary.rope_half_permutation) to a converted linear: kernel
    (in, H*Dh) columns and bias are permuted within each head. Attention
    scores are invariant because q and k receive the same permutation.
    """
    def perm_vec(v: jnp.ndarray) -> jnp.ndarray:
        return v.reshape(heads, -1)[:, perm].reshape(v.shape)

    out = {"kernel": tree["kernel"].reshape(
        tree["kernel"].shape[0], heads, -1)[:, :, perm].reshape(
        tree["kernel"].shape)}
    if "bias" in tree:
        out["bias"] = perm_vec(tree["bias"])
    return out


def _check_fused_qkv(state: dict, prefix: str) -> None:
    """Diagnose a fused-qkv checkpoint layout before a bare KeyError fires.

    The reference fuses q/k/v at RUNTIME (ref:actionmesh/model/utils/
    attention_processor.py:106-115) from split to_q/to_k/to_v checkpoint
    tensors; a snapshot that instead SHIPS a fused tensor (or ships it
    transposed) must fail with the layout spelled out, not with
    "KeyError: to_q.weight".
    """
    if f"{prefix}.to_q.weight" in state:
        return
    for fused in (f"{prefix}.qkv.weight", f"{prefix}.to_qkv.weight"):
        if fused not in state:
            continue
        shape = tuple(np.asarray(state[fused]).shape)
        hint = ""
        if len(shape) == 2:
            rows, cols = shape
            if rows == 3 * cols:
                hint = (
                    f" Layout looks like torch fused (3*dim, dim)={shape}; "
                    "split rows into thirds (q, k, v) and re-save as "
                    f"{prefix}.to_{{q,k,v}}.weight."
                )
            elif cols == 3 * rows:
                hint = (
                    f" Layout {shape} is TRANSPOSED fused qkv "
                    f"((dim, 3*dim) instead of torch's (3*dim, dim)); "
                    "transpose, then split rows into q/k/v."
                )
        raise ValueError(
            f"{prefix}: checkpoint ships a FUSED qkv tensor '{fused}' "
            f"{shape} where split {prefix}.to_q/.to_k/.to_v weights are "
            f"expected (the reference stores them split and fuses at "
            f"runtime).{hint}"
        )


def _attention(
    state: dict, prefix: str, dtype, fp32: bool = False,
    rope_half_heads: int = 0,
) -> dict:
    adtype = jnp.float32 if fp32 else dtype
    _check_fused_qkv(state, prefix)
    out = {
        "to_q": _linear(state, f"{prefix}.to_q", adtype),
        "to_k": _linear(state, f"{prefix}.to_k", adtype),
        "to_v": _linear(state, f"{prefix}.to_v", adtype),
        "to_out": _linear(state, f"{prefix}.to_out.0", adtype),
    }
    if f"{prefix}.norm_q.weight" in state:
        out["norm_q"] = _rms_norm(state, f"{prefix}.norm_q")
        out["norm_k"] = _rms_norm(state, f"{prefix}.norm_k")
    if f"{prefix}.norm_cross.weight" in state:
        out["norm_cross"] = _layer_norm(state, f"{prefix}.norm_cross")
    if rope_half_heads:
        from actionmesh_tpu.ops.rotary import rope_half_permutation

        dim_head = out["to_q"]["kernel"].shape[1] // rope_half_heads
        perm = rope_half_permutation(dim_head)
        out["to_q"] = _permute_head_channels(out["to_q"], rope_half_heads, perm)
        out["to_k"] = _permute_head_channels(out["to_k"], rope_half_heads, perm)
        # per-head rms-norm scales live in head-dim channel order
        for name in ("norm_q", "norm_k"):
            if name in out:
                out[name] = {"scale": out[name]["scale"][perm]}
    return out


def _flow_block(
    state: dict, prefix: str, dtype, fp32: bool = False,
    rope_half_heads: int = 0,
) -> dict:
    adtype = jnp.float32 if fp32 else dtype
    out: dict = {}
    # the presence gates below key on to_q.weight; a fused-qkv checkpoint
    # (to_q absent, qkv present) must diagnose, not silently drop the block
    _check_fused_qkv(state, f"{prefix}.s_attn")
    _check_fused_qkv(state, f"{prefix}.x_attn")
    if f"{prefix}.s_attn.to_q.weight" in state:
        out["norm_s_attn"] = _layer_norm(state, f"{prefix}.norm_s_attn")
        # self-attention receives RoPE -> permute to the half channel layout
        out["s_attn"] = _attention(
            state, f"{prefix}.s_attn", dtype, fp32,
            rope_half_heads=rope_half_heads,
        )
    if f"{prefix}.x_attn.to_q.weight" in state:
        out["norm_x_attn"] = _layer_norm(state, f"{prefix}.norm_x_attn")
        out["x_attn"] = _attention(state, f"{prefix}.x_attn", dtype, fp32)
    out["norm_ff"] = _layer_norm(state, f"{prefix}.norm_ff")
    out["ff"] = {
        "net_0": _linear(state, f"{prefix}.ff.net.0.proj", adtype),
        "net_2": _linear(state, f"{prefix}.ff.net.2", adtype),
    }
    if f"{prefix}.linear_skip.weight" in state:
        out["norm_skip"] = _layer_norm(state, f"{prefix}.norm_skip")
        out["linear_skip"] = _linear(state, f"{prefix}.linear_skip", adtype)
    return out


# ---------------------------------------------------------------------------
# Converted-tree verification (fail fast at first real-weight contact)
# ---------------------------------------------------------------------------

def tree_shape_mismatches(converted, expected, path="") -> list[str]:
    """Structural diff of a converted param tree vs the model init's tree.

    Returns human-readable lines for every missing key, extra key, and
    shape mismatch. A wrong-but-present hyperparameter in a checkpoint's
    config.json (e.g. width 1536 where the model expects 2048) converts
    "successfully" name-wise — this catches it before a forward pass can
    produce garbage (round-2 verdict: converters must fail fast).
    """
    out: list[str] = []
    if isinstance(expected, dict) or isinstance(converted, dict):
        exp = expected if isinstance(expected, dict) else {}
        got = converted if isinstance(converted, dict) else {}
        if not isinstance(converted, dict):
            return [f"{path or '<root>'}: expected mapping, got {type(converted).__name__}"]
        if not isinstance(expected, dict):
            return [f"{path or '<root>'}: expected {type(expected).__name__}, got mapping"]
        for k in sorted(set(exp) | set(got)):
            sub = f"{path}.{k}" if path else str(k)
            if k not in got:
                out.append(f"{sub}: MISSING from checkpoint conversion")
            elif k not in exp:
                out.append(f"{sub}: UNEXPECTED (model has no such parameter)")
            else:
                out += tree_shape_mismatches(got[k], exp[k], sub)
        return out
    if isinstance(expected, (list, tuple)) or isinstance(converted, (list, tuple)):
        if not isinstance(converted, (list, tuple)) or not isinstance(
            expected, (list, tuple)
        ):
            return [f"{path}: list/leaf structure mismatch"]
        if len(converted) != len(expected):
            out.append(
                f"{path}: {len(converted)} entries, model expects {len(expected)}"
            )
        for i, (c, e) in enumerate(zip(converted, expected)):
            out += tree_shape_mismatches(c, e, f"{path}[{i}]")
        return out
    cs = tuple(getattr(converted, "shape", ()))
    es = tuple(getattr(expected, "shape", ()))
    if cs != es:
        out.append(f"{path}: checkpoint shape {cs}, model expects {es}")
    return out


def verify_converted(converted: dict, init_thunk, family: str) -> dict:
    """Raise with a full structural report if `converted` doesn't match the
    model the config describes (shapes from ``jax.eval_shape(init_thunk)``).
    """
    import jax

    expected = jax.eval_shape(init_thunk)
    problems = tree_shape_mismatches(converted, expected)
    if problems:
        head = problems[:40]
        more = f"\n  ... {len(problems) - 40} more" if len(problems) > 40 else ""
        raise ValueError(
            f"{family}: converted checkpoint does not match the configured "
            f"architecture ({len(problems)} problems):\n  " + "\n  ".join(head) + more
        )
    return converted


# ---------------------------------------------------------------------------
# Model-specific converters
# ---------------------------------------------------------------------------

def load_denoiser(path: Path, cfg, dtype=jnp.bfloat16) -> dict:
    """Convert the Stage-I denoiser checkpoint (facebook/ActionMesh denoiser)."""
    return convert_denoiser(load_safetensors_dir(path), cfg, dtype)


def convert_denoiser(
    state: dict, cfg, dtype=jnp.bfloat16, verify: bool = True
) -> dict:
    state = {k: np.asarray(v) for k, v in state.items()}
    try:
        converted = {
            "time_proj": {
                "linear_1": _linear(state, "time_proj.linear_1", dtype),
                "linear_2": _linear(state, "time_proj.linear_2", dtype),
            },
            "proj_in": _linear(state, "proj_in", dtype),
            "blocks": [
                _flow_block(
                    state, f"blocks.{i}", dtype,
                    rope_half_heads=cfg.num_attention_heads,
                )
                for i in range(cfg.num_layers)
            ],
            "norm_out": _layer_norm(state, "norm_out"),
            "proj_out": _linear(state, "proj_out", dtype),
        }
    except KeyError as e:
        raise KeyError(
            f"Stage-I denoiser key mapping mismatch: missing {e}.\n"
            "Checkpoint structure:\n" + describe_state_dict(state)
        ) from e
    if verify:
        import jax

        from actionmesh_tpu.models.denoiser import init_denoiser

        verify_converted(
            converted,
            lambda: init_denoiser(jax.random.PRNGKey(0), cfg, dtype=dtype),
            "stage1_denoiser",
        )
    return converted


def load_autoencoder(path: Path, cfg, dtype=jnp.bfloat16) -> dict:
    """Convert the Stage-II autoencoder checkpoint.

    The final cross-attention block, proj_query, norm_out and proj_out stay
    float32 (the reference's fp32 island, temporal_autoencoder.py:240,266).
    """
    return convert_autoencoder(load_safetensors_dir(path), cfg, dtype)


def convert_autoencoder(
    state: dict, cfg, dtype=jnp.bfloat16, verify: bool = True
) -> dict:
    state = {k: np.asarray(v) for k, v in state.items()}
    n = cfg.num_layers
    try:
        blocks = [
            _flow_block(
                state, f"blocks.{i}", dtype,
                rope_half_heads=cfg.num_attention_heads,
            )
            for i in range(n)
        ]
        # final cross-attention block: no RoPE, no permutation
        blocks.append(_flow_block(state, f"blocks.{n}", dtype, fp32=True))
        converted = {
            "blocks": blocks,
            "proj_query": _linear(state, "proj_query", jnp.float32),
            "norm_out": _layer_norm(state, "norm_out"),
            "proj_out": _linear(state, "proj_out", jnp.float32),
            "post_quant": _linear(state, "post_quant", dtype),
        }
    except KeyError as e:
        raise KeyError(
            f"Stage-II autoencoder key mapping mismatch: missing {e}.\n"
            "Checkpoint structure:\n" + describe_state_dict(state)
        ) from e
    if verify:
        import jax

        from actionmesh_tpu.models.autoencoder import init_autoencoder

        verify_converted(
            converted,
            lambda: init_autoencoder(jax.random.PRNGKey(0), cfg, dtype=dtype),
            "stage2_autoencoder",
        )
    return converted


def load_dinov2(path: Path, cfg, dtype=jnp.bfloat16) -> dict:
    """Convert an HF transformers Dinov2Model checkpoint (facebook/dinov2-large)."""
    return convert_dinov2(load_safetensors_dir(path), cfg, dtype)


def convert_dinov2(state: dict, cfg, dtype=jnp.bfloat16, verify: bool = True) -> dict:
    """Convert a Dinov2Model state dict (torch tensors or numpy arrays)."""
    state = {k: np.asarray(v) for k, v in state.items()}

    def block(i: int) -> dict:
        p = f"encoder.layer.{i}"
        return {
            "norm1": _layer_norm(state, f"{p}.norm1"),
            "attention": {
                "query": _linear(state, f"{p}.attention.attention.query", dtype),
                "key": _linear(state, f"{p}.attention.attention.key", dtype),
                "value": _linear(state, f"{p}.attention.attention.value", dtype),
                "output": _linear(state, f"{p}.attention.output.dense", dtype),
            },
            "layer_scale1": {
                "lambda1": _to_jnp(state[f"{p}.layer_scale1.lambda1"], jnp.float32)
            },
            "norm2": _layer_norm(state, f"{p}.norm2"),
            "mlp": {
                "fc1": _linear(state, f"{p}.mlp.fc1", dtype),
                "fc2": _linear(state, f"{p}.mlp.fc2", dtype),
            },
            "layer_scale2": {
                "lambda1": _to_jnp(state[f"{p}.layer_scale2.lambda1"], jnp.float32)
            },
        }

    try:
        proj = state["embeddings.patch_embeddings.projection.weight"]  # OIHW
        converted = {
            "patch_embed": {
                "kernel": _to_jnp(proj.transpose(2, 3, 1, 0), dtype),
                "bias": _to_jnp(
                    state["embeddings.patch_embeddings.projection.bias"], dtype
                ),
            },
            "cls_token": _to_jnp(state["embeddings.cls_token"], jnp.float32),
            "pos_embed": _to_jnp(
                state["embeddings.position_embeddings"], jnp.float32
            ),
            "blocks": [block(i) for i in range(cfg.num_layers)],
            "norm": _layer_norm(state, "layernorm"),
        }
    except KeyError as e:
        raise KeyError(
            f"DINOv2 key mapping mismatch: missing {e}.\n"
            "Checkpoint structure:\n" + describe_state_dict(state)
        ) from e
    if verify:
        import jax

        from actionmesh_tpu.models.dinov2 import init_dinov2

        verify_converted(
            converted,
            lambda: init_dinov2(jax.random.PRNGKey(0), cfg, dtype=dtype),
            "dinov2",
        )
    return converted


# ---------------------------------------------------------------------------
# Native checkpoint save/load (flattened npz)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix="") -> Iterator[tuple[str, np.ndarray]]:
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}.")
    else:
        yield prefix[:-1], np.asarray(tree)


_BF16_SUFFIX = "::bf16"


def save_params(params, path: str | Path) -> None:
    """Flattened-npz checkpoint. bfloat16 leaves (which numpy's npz cannot
    represent) are stored as uint16 bit patterns under a ``::bf16`` key
    suffix and restored transparently by load_params."""
    flat = {}
    for key, value in _flatten(params):
        if value.dtype == jnp.bfloat16:
            flat[key + _BF16_SUFFIX] = value.view(np.uint16)
        else:
            flat[key] = value
    np.savez(path, **flat)


def load_params(path: str | Path) -> dict:
    """Inverse of save_params: rebuild nested dicts/lists from flat keys."""
    flat = dict(np.load(path))
    root: dict = {}
    for key, value in flat.items():
        if key.endswith(_BF16_SUFFIX):
            key = key[: -len(_BF16_SUFFIX)]
            value = value.view(jnp.bfloat16)
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


# ---------------------------------------------------------------------------
# TripoSG converters (best-effort name mapping — upstream source was not
# vendorable in this environment; failures raise with the available keys so
# the mapping can be corrected against the real checkpoint)
# ---------------------------------------------------------------------------

def describe_state_dict(state: dict, max_lines: int = 60) -> str:
    """Human-readable architecture summary of a checkpoint state dict.

    Groups keys into families (``blocks.N.foo.weight`` -> ``blocks.*.foo``),
    reports each family's count and shape, and infers layer count / model
    width / qkv fusion where recognizable. Used by the TripoSG converters'
    error paths so a real-checkpoint mismatch yields an actionable report
    rather than a bare KeyError (the upstream source is not vendored; the
    converter mapping is a documented best-effort guess).
    """
    import re

    families: dict[str, tuple[int, tuple]] = {}
    layer_ids: set[int] = set()
    for k, v in state.items():
        fam = re.sub(r"\.\d+\.", ".*.", k)
        shape = tuple(np.asarray(v).shape)
        cnt, _ = families.get(fam, (0, shape))
        families[fam] = (cnt + 1, shape)
        for m in re.finditer(r"\.(\d+)\.", k):
            layer_ids.add(int(m.group(1)))

    lines = [f"{len(state)} tensors, {len(families)} key families"]
    if layer_ids:
        lines.append(
            f"numeric indices 0..{max(layer_ids)} "
            f"(=> likely {max(layer_ids) + 1} layers)"
        )
    widths = [
        s[-1] for _, (_, s) in families.items() if len(s) == 2 and s[0] == s[-1]
    ]
    if widths:
        from collections import Counter

        lines.append(f"square linear widths: {Counter(widths).most_common(3)}")
    for fam in sorted(families)[:max_lines]:
        cnt, shape = families[fam]
        lines.append(f"  {fam}  x{cnt}  {shape}")
    if len(families) > max_lines:
        lines.append(f"  ... {len(families) - max_lines} more families")
    return "\n".join(lines)

def convert_triposg_dit(
    state: dict, cfg, dtype=jnp.bfloat16, verify: bool = True
) -> dict:
    """Convert the TripoSG shape transformer.

    The ActionMesh Stage-I denoiser is derived from this DiT, so the
    expected parameter layout matches load_denoiser's
    (time_proj/proj_in/blocks.N/.../norm_out/proj_out).
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    try:
        converted = {
            "time_proj": {
                "linear_1": _linear(state, "time_proj.linear_1", dtype),
                "linear_2": _linear(state, "time_proj.linear_2", dtype),
            },
            "proj_in": _linear(state, "proj_in", dtype),
            "blocks": [
                _flow_block(state, f"blocks.{i}", dtype)
                for i in range(cfg.num_layers)
            ],
            "norm_out": _layer_norm(state, "norm_out"),
            "proj_out": _linear(state, "proj_out", dtype),
        }
    except KeyError as e:
        raise KeyError(
            f"TripoSG transformer key mapping mismatch: {e}.\n"
            "The mapping assumes the ActionMesh denoiser layout (the Stage-I "
            "model is an inflation of this DiT). Checkpoint structure:\n"
            + describe_state_dict(state)
        ) from e
    if verify:
        import jax

        from actionmesh_tpu.models.triposg.dit import init_triposg_dit

        verify_converted(
            converted,
            lambda: init_triposg_dit(jax.random.PRNGKey(0), cfg, dtype=dtype),
            "triposg_dit",
        )
    return converted


def convert_triposg_vae(
    state: dict, cfg, dtype=jnp.bfloat16, verify: bool = True
) -> dict:
    """Convert the TripoSG vecset VAE (encoder + decoder + SDF head)."""
    state = {k: np.asarray(v) for k, v in state.items()}

    def first_prefix(*candidates: str) -> str:
        for c in candidates:
            if any(k.startswith(c) for k in state):
                return c
        raise KeyError(
            f"None of {candidates} found. Available prefixes: "
            f"{sorted({k.split('.')[0] for k in state})}"
        )

    try:
        enc = first_prefix("encoder", "enc")
        dec = first_prefix("decoder", "dec")
        converted = {
            "proj_point": _linear(state, f"{enc}.proj_in", dtype),
            "enc_cross_attn": _attention(
                state, f"{enc}.cross_attn.attn", dtype
            ),
            "enc_norm_cross": _layer_norm(state, f"{enc}.cross_attn.norm"),
            "enc_blocks": [
                _flow_block(state, f"{enc}.blocks.{i}", dtype)
                for i in range(cfg.encoder_layers)
            ],
            "enc_norm_out": _layer_norm(state, f"{enc}.norm_out"),
            "enc_proj_out": _linear(state, f"{enc}.proj_out", dtype),
            "post_quant": _linear(state, "post_quant", dtype),
            "dec_blocks": [
                _flow_block(state, f"{dec}.blocks.{i}", dtype)
                for i in range(cfg.decoder_layers)
            ],
            "proj_query": _linear(state, f"{dec}.proj_query", jnp.float32),
            "dec_cross_attn": _attention(
                state, f"{dec}.cross_attn.attn", dtype, fp32=True
            ),
            "dec_norm_cross_q": _layer_norm(state, f"{dec}.cross_attn.norm"),
            "dec_norm_out": _layer_norm(state, f"{dec}.norm_out"),
            "dec_proj_out": _linear(state, f"{dec}.proj_out", jnp.float32),
        }
    except KeyError as e:
        raise KeyError(
            f"TripoSG VAE key mapping mismatch: {e}.\n"
            "Fix the prefix table in convert_triposg_vae against this "
            "checkpoint structure:\n" + describe_state_dict(state)
        ) from e
    if verify:
        import jax

        from actionmesh_tpu.models.triposg.vae import init_triposg_vae

        verify_converted(
            converted,
            lambda: init_triposg_vae(jax.random.PRNGKey(0), cfg, dtype=dtype),
            "triposg_vae",
        )
    return converted
