"""Multi-head attention dispatch: Pallas flash kernel / chunked XLA fallback.

The reference hard-requires fused SDPA because Stage I self-attention spans
T*(N+1) ~= 32,784 tokens (reference: actionmesh/model/utils/
attention_processor.py:25-34,133-139) — a materialized score matrix would be
~68 GB. On TPU we provide:

  * ``flash``   — a Pallas fused flash-attention kernel (ops/flash_attention.py),
                  fp32 online softmax, used on TPU devices.
  * ``chunked`` — pure-XLA online-softmax attention scanning over KV blocks;
                  numerically identical semantics, used on CPU (tests) and as
                  a safe fallback.
  * ``naive``   — materialized softmax, for tiny shapes in unit tests.

All variants compute the softmax in float32 and return q.dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def naive_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention with materialized (S, Skv) scores. Test-only."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _pad_axis(x: jnp.ndarray, axis: int, multiple: int) -> tuple[jnp.ndarray, int]:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, 0
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads), pad


def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    q_chunk: int = 512,
    k_chunk: int = 1024,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Memory-efficient attention: online softmax over KV chunks.

    q (B, H, Sq, D); k, v (B, H, Sk, D); kv_mask (B, Sk) True=valid.
    Peak memory is O(q_chunk * k_chunk) per (B, H) instead of O(Sq * Sk).

    ``return_stats=True`` also returns the per-row online-softmax
    statistics ``(m, l)`` (running max and exp-sum, fp32, (B, H, Sq)) —
    the same contract as ``flash_attention_pipelined(return_stats=True)``,
    which lets the sequence-parallel ring (ring_attention_local) merge
    partials from this pure-XLA implementation too (used off-TPU, e.g.
    the production-shape GSPMD audit on the virtual CPU mesh).
    """
    orig_dtype = q.dtype
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, Sq, D = q.shape
    Sk = k.shape[2]

    q, q_pad = _pad_axis(q, 2, q_chunk)
    k, k_pad = _pad_axis(k, 2, k_chunk)
    v, _ = _pad_axis(v, 2, k_chunk)
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), dtype=bool)
    kv_mask, _ = _pad_axis(kv_mask, 1, k_chunk)  # pad with False

    n_q = q.shape[2] // q_chunk
    n_k = k.shape[2] // k_chunk

    # (n_k, B, H, k_chunk, D)
    k_blocks = jnp.moveaxis(
        k.reshape(B, H, n_k, k_chunk, D), 2, 0
    )
    v_blocks = jnp.moveaxis(
        v.reshape(B, H, n_k, k_chunk, D), 2, 0
    )
    mask_blocks = jnp.moveaxis(kv_mask.reshape(B, n_k, k_chunk), 1, 0)

    def process_q_block(q_blk):
        # q_blk: (B, H, q_chunk, D)
        def kv_step(carry, blk):
            acc, m, l = carry
            k_blk, v_blk, msk = blk
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q_blk, k_blk,
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(msk[:, None, None, :], s, NEG_INF)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + p.sum(axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32,
            )
            return (acc_new, m_new, l_new), None

        init = (
            jnp.zeros((B, H, q_chunk, D), jnp.float32),
            jnp.full((B, H, q_chunk), NEG_INF, jnp.float32),
            jnp.zeros((B, H, q_chunk), jnp.float32),
        )
        (acc, m, l), _ = jax.lax.scan(
            kv_step, init, (k_blocks, v_blocks, mask_blocks)
        )
        return acc / jnp.maximum(l[..., None], 1e-30), m, l

    q_qblocks = jnp.moveaxis(q.reshape(B, H, n_q, q_chunk, D), 2, 0)
    out_blocks, m_blocks, l_blocks = jax.lax.map(
        process_q_block, q_qblocks
    )  # (n_q, B, H, qc[, D])
    out = jnp.moveaxis(out_blocks, 0, 2).reshape(B, H, n_q * q_chunk, D)
    if q_pad:
        out = out[:, :, :Sq]
    out = out.astype(orig_dtype)
    if not return_stats:
        return out
    m = jnp.moveaxis(m_blocks, 0, 2).reshape(B, H, n_q * q_chunk)
    l = jnp.moveaxis(l_blocks, 0, 2).reshape(B, H, n_q * q_chunk)
    if q_pad:
        m, l = m[:, :, :Sq], l[:, :, :Sq]
    return out, (m, l)


# ---------------------------------------------------------------------------
# Trainable chunked attention: O(S)-memory backward in pure XLA
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def chunked_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    q_chunk: int = 512,
    k_chunk: int = 1024,
) -> jnp.ndarray:
    """``chunked_attention`` with an O(S)-memory backward.

    Plain autodiff of the KV scan saves per-chunk probability residuals —
    O(Sq*Sk) total, ~4.3 GB fp32 per (batch, head) at the 33k-token
    Stage-I sequence (the round-3 training audit measured 1.3 TB of temps
    at production shape). This custom_vjp recomputes probabilities from
    the forward's online-softmax stats instead — the same scheme as the
    Pallas backward (ops/flash_attention_bwd.py), in pure XLA so it runs
    everywhere. No external kv mask (training needs none)."""
    return chunked_attention(
        q, k, v, scale=scale, q_chunk=q_chunk, k_chunk=k_chunk
    )


def _chunked_trainable_fwd(q, k, v, scale, q_chunk, k_chunk):
    o, (m, l) = chunked_attention(
        q, k, v, scale=scale, q_chunk=q_chunk, k_chunk=k_chunk,
        return_stats=True,
    )
    return o, (q, k, v, o, m, l)


def _chunked_trainable_bwd(scale, q_chunk, k_chunk, res, do):
    q, k, v, o, m, l = res
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if scale is None:
        scale = D ** -0.5

    lse = jnp.where(
        l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), jnp.float32(-NEG_INF)
    )  # (B, H, Sq)
    dof = do.astype(jnp.float32)
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1)  # (B, H, Sq)

    kp, _ = _pad_axis(k, 2, k_chunk)
    vp, _ = _pad_axis(v, 2, k_chunk)
    valid = jnp.ones((B, Sk), dtype=bool)
    valid, _ = _pad_axis(valid, 1, k_chunk)  # pad with False
    n_k = kp.shape[2] // k_chunk
    k_blocks = jnp.moveaxis(kp.reshape(B, H, n_k, k_chunk, D), 2, 0)
    v_blocks = jnp.moveaxis(vp.reshape(B, H, n_k, k_chunk, D), 2, 0)
    m_blocks = jnp.moveaxis(valid.reshape(B, n_k, k_chunk), 1, 0)

    def kv_step(dq, blk):
        k_b, v_b, msk = blk
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_b, preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(msk[:, None, None, :], s, NEG_INF)
        p = jnp.exp(s - lse[..., None])  # (B, H, Sq, kc) fp32
        dv_b = jnp.einsum(
            "bhqk,bhqd->bhkd", p.astype(v.dtype), do,
            preferred_element_type=jnp.float32,
        )
        dp = jnp.einsum(
            "bhqd,bhkd->bhqk", do, v_b, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum(
            "bhqk,bhkd->bhqd", ds.astype(k.dtype), k_b,
            preferred_element_type=jnp.float32,
        )
        dk_b = jnp.einsum(
            "bhqk,bhqd->bhkd", ds.astype(q.dtype), q,
            preferred_element_type=jnp.float32,
        )
        return dq, (dk_b, dv_b)

    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        kv_step,
        jnp.zeros((B, H, Sq, D), jnp.float32),
        (k_blocks, v_blocks, m_blocks),
    )
    dk = jnp.moveaxis(dk_blocks, 0, 2).reshape(B, H, n_k * k_chunk, D)
    dv = jnp.moveaxis(dv_blocks, 0, 2).reshape(B, H, n_k * k_chunk, D)
    return (
        dq.astype(q.dtype),
        dk[:, :, :Sk].astype(k.dtype),
        dv[:, :, :Sk].astype(v.dtype),
    )


chunked_attention_trainable.defvjp(_chunked_trainable_fwd, _chunked_trainable_bwd)


def ring_attention_local(q, k, v, scale, kv_mask, axis_name, sp,
                         impl: str = "flash"):
    """Sequence-parallel attention inside shard_map (ring schedule).

    Each device holds S/sp query rows and S/sp KV rows. KV shards rotate
    around the ``axis_name`` ring via ppermute (riding ICI neighbor links);
    per step the local kernel (Pallas flash on TPU; the pure-XLA chunked
    implementation elsewhere — both expose ``return_stats``) produces a
    partial result with its online-softmax stats (m, l), and partials
    merge with the standard log-sum-exp combination — mathematically
    identical to full attention.
    """
    import jax

    from actionmesh_tpu.ops.flash_attention import flash_attention_pipelined

    local = flash_attention_pipelined if impl == "flash" else chunked_attention

    def partial_fn(kc, vc, mc):
        return local(
            q, kc, vc, scale=scale, kv_mask=mc, return_stats=True
        )

    out, (m, l) = partial_fn(k, v, kv_mask)
    num = out.astype(jnp.float32) * l[..., None]
    perm = [(j, (j + 1) % sp) for j in range(sp)]
    kc, vc, mc = k, v, kv_mask
    for _ in range(sp - 1):
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        if mc is not None:
            mc = jax.lax.ppermute(mc, axis_name, perm)
        out_i, (m_i, l_i) = partial_fn(kc, vc, mc)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_i - m_new)
        num = num * alpha[..., None] + out_i.astype(jnp.float32) * (
            l_i * beta
        )[..., None]
        l = l * alpha + l_i * beta
        m = m_new
    return (num / jnp.maximum(l[..., None], 1e-30)).astype(q.dtype)


def _sharded_attention(q, k, v, scale, kv_mask, mesh, impl):
    """Run a local attention implementation per-shard under shard_map.

    GSPMD cannot partition a ``pallas_call`` — and (measured, round-3 HLO
    audit) it mis-partitions the chunked scan, inserting full-sequence
    activation all-gathers (72 GB/step at production shape). So under a
    device mesh BOTH implementations are explicitly mapped: batch (the CFG
    branch axis) over ``dp``, attention heads over ``tp``, and — when the
    mesh has an ``sp`` axis — the sequence over ``sp`` with a ring
    schedule (ring_attention_local; both local kernels expose the
    online-softmax stats the ring merge needs, so sp works with flash on
    TPU and with the pure-XLA chunked path off-TPU, e.g. the
    production-shape GSPMD audit). Head-sharded attention needs no
    collectives —
    the softmax is per (batch, head, row) — and the surrounding Megatron
    col->row projections keep their GSPMD-inserted reduces unchanged.
    Per-shard results are bitwise-identical to unsharded: heads and batch
    entries are independent.

    Axes that don't divide evenly stay replicated on that mesh axis (e.g.
    Stage II's B=1 under dp=2 replicates the batch).
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from actionmesh_tpu.ops.flash_attention import flash_attention_pipelined

    if impl == "flash_train":
        from actionmesh_tpu.ops.flash_attention_bwd import (
            flash_attention_trainable,
        )

        def local(q_, k_, v_, scale=None, kv_mask=None):
            assert kv_mask is None
            return flash_attention_trainable(q_, k_, v_, scale)
    elif impl == "chunked_train":
        def local(q_, k_, v_, scale=None, kv_mask=None):
            assert kv_mask is None
            return chunked_attention_trainable(q_, k_, v_, scale)
    else:
        local = (
            flash_attention_pipelined if impl == "flash" else chunked_attention
        )
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    B, H, Sq = q.shape[0], q.shape[1], q.shape[2]
    Sk = k.shape[2]
    dp = axis_sizes.get("dp", 1)
    b_ax = "dp" if dp > 1 and B % dp == 0 else None
    h_ax = "tp" if axis_sizes.get("tp", 1) > 1 and H % axis_sizes["tp"] == 0 else None
    sp = axis_sizes.get("sp", 1)
    s_ax = (
        "sp"
        if sp > 1 and Sq % sp == 0 and Sk % sp == 0 and Sq == Sk
        else None
    )
    if s_ax is None and sp > 1:
        # Per-frame (spatial/cross) attention on an sp mesh: the sequence
        # cannot ring (odd per-frame length / Sq != Sk), but the merged
        # (g*B*T) batch axis divides sp — shard IT over sp instead of
        # replicating. This removes the per-layer q/k/v re-gather from the
        # sp-sharded inflated output (134 MB x 22/step at production shape
        # — the "spatial reshard" caveat of BENCH_NOTES r3c) because the
        # sp sequence-shard boundary falls on a frame boundary (T % sp == 0),
        # so the reshard is a local relayout; per-frame compute also halves
        # per device. Batch entries are independent => bitwise identical.
        if b_ax is not None and B % (dp * sp) == 0:
            b_ax = ("dp", "sp")
        elif b_ax is None and B % sp == 0:
            b_ax = "sp"
    qkv_spec = P(b_ax, h_ax, s_ax, None)
    mask_spec = P(b_ax, s_ax)

    if s_ax is not None:
        fn = shard_map(
            lambda q_, k_, v_, m_: ring_attention_local(
                q_, k_, v_, scale, m_, "sp", sp, impl=impl
            ),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
            out_specs=qkv_spec,
            check_rep=False,
        )
        return fn(
            q, k, v,
            kv_mask if kv_mask is not None
            else jnp.ones((B, Sk), jnp.int32),
        )

    if kv_mask is None:
        fn = shard_map(
            functools.partial(local, scale=scale),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec),
            out_specs=qkv_spec,
            check_rep=False,
        )
        return fn(q, k, v)
    fn = shard_map(
        lambda q_, k_, v_, m_: local(q_, k_, v_, scale=scale, kv_mask=m_),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(b_ax, None)),
        out_specs=qkv_spec,
        check_rep=False,
    )
    return fn(q, k, v, kv_mask)


@functools.partial(
    jax.jit, static_argnames=("scale", "impl", "q_chunk", "k_chunk", "mesh")
)
def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    q_chunk: int = 512,
    k_chunk: int = 1024,
    mesh=None,
) -> jnp.ndarray:
    """Fused multi-head attention. q (B,H,Sq,D), k/v (B,H,Sk,D).

    impl: 'auto' picks the Pallas flash kernel on TPU, chunked XLA otherwise.
    With a ``mesh``, the local kernel runs per-shard via shard_map:
    dp over batch, tp over heads, and — when the mesh has an ``sp`` axis
    and the sequence divides it — sp over the sequence with a ring
    schedule (ring_attention_local; flash and chunked both expose the
    online-softmax stats the ring merge needs). GSPMD mis-partitions the
    chunked scan otherwise (full-sequence all-gathers, see
    _sharded_attention). 'naive' partitions under GSPMD (test-only).
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "chunked"
    if impl == "auto_train":
        impl = (
            "flash_train"
            if jax.default_backend() == "tpu"
            else "chunked_train"
        )
    if impl in ("flash_train", "chunked_train"):
        # Differentiable fused attention with an O(S) backward: Pallas
        # fwd+bwd on TPU (ops/flash_attention_bwd.py), the custom_vjp
        # chunked-XLA pair elsewhere. External-kv-mask and sp-ring
        # variants fall back to the plain chunked path (differentiable but
        # with O(Sq*Sk) autodiff residuals — training uses neither).
        if kv_mask is not None:
            impl = "chunked"
        elif mesh is not None:
            axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            if axis_sizes.get("sp", 1) > 1:
                impl = "chunked"
    if impl == "chunked_train":
        if mesh is not None:
            return _sharded_attention(q, k, v, scale, None, mesh, "chunked_train")
        return chunked_attention_trainable(
            q, k, v, scale, q_chunk, k_chunk
        )
    if impl == "flash_train":
        from actionmesh_tpu.ops.flash_attention_bwd import (
            flash_attention_trainable,
        )

        if mesh is not None:
            return _sharded_attention(
                q, k, v, scale, None, mesh, "flash_train"
            )
        return flash_attention_trainable(q, k, v, scale)
    if impl == "flash":
        from actionmesh_tpu.ops.flash_attention import flash_attention_pipelined

        if mesh is not None:
            return _sharded_attention(q, k, v, scale, kv_mask, mesh, "flash")
        return flash_attention_pipelined(q, k, v, scale=scale, kv_mask=kv_mask)
    if impl == "chunked":
        if mesh is not None:
            return _sharded_attention(q, k, v, scale, kv_mask, mesh, "chunked")
        return chunked_attention(
            q, k, v, scale=scale, kv_mask=kv_mask, q_chunk=q_chunk, k_chunk=k_chunk
        )
    if impl == "naive":
        return naive_attention(q, k, v, scale=scale, kv_mask=kv_mask)
    raise ValueError(f"unknown attention impl: {impl}")
