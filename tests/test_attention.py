"""Attention correctness: chunked online-softmax vs naive; mask handling."""

import jax
import jax.numpy as jnp
import numpy as np

from actionmesh_tpu.ops.attention import (
    chunked_attention,
    naive_attention,
)


def test_chunked_matches_naive():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 4, 37, 16))
    k = jax.random.normal(kk, (2, 4, 53, 16))
    v = jax.random.normal(kv, (2, 4, 53, 16))
    ref = naive_attention(q, k, v)
    out = chunked_attention(q, k, v, q_chunk=16, k_chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_chunked_with_kv_mask():
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 10, 8))
    k = jax.random.normal(kk, (1, 2, 20, 8))
    v = jax.random.normal(kv, (1, 2, 20, 8))
    mask = jnp.arange(20)[None, :] < 13  # only first 13 kv valid
    ref = naive_attention(q[:, :, :, :], k[:, :, :13], v[:, :, :13])
    out = chunked_attention(q, k, v, kv_mask=mask, q_chunk=4, k_chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_chunked_bf16_stability():
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 2, 64, 32), dtype=jnp.bfloat16)
    out = chunked_attention(q, q, q, q_chunk=32, k_chunk=32)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_chunked_return_stats():
    """(m, l) from chunked_attention reconstruct the true softmax stats.

    The stats contract (shared with flash_attention_pipelined) is what the
    sequence-parallel ring merge consumes, so it is pinned directly:
    m = rowwise max of valid scaled scores, l = sum exp(scores - m),
    both fp32 (B, H, Sq). Exercised with a kv mask and with a q length
    not divisible by q_chunk (the pad/slice path).
    """
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, Sq, Sk, D = 2, 3, 21, 40, 16  # Sq % q_chunk != 0
    q = jax.random.normal(kq, (B, H, Sq, D))
    k = jax.random.normal(kk, (B, H, Sk, D))
    v = jax.random.normal(kv, (B, H, Sk, D))
    kv_mask = jnp.arange(Sk)[None, :] < jnp.array([[33], [17]])

    out, (m, l) = chunked_attention(
        q, k, v, kv_mask=kv_mask, q_chunk=8, k_chunk=16, return_stats=True
    )
    assert m.shape == l.shape == (B, H, Sq)
    assert m.dtype == l.dtype == jnp.float32

    scale = D ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = jnp.where(kv_mask[:, None, None, :], scores, -jnp.inf)
    m_ref = scores.max(axis=-1)
    l_ref = jnp.exp(scores - m_ref[..., None]).sum(axis=-1)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(l), np.asarray(l_ref), rtol=1e-5, atol=1e-5
    )
    # and the normalized output is unchanged by requesting stats
    out_plain = chunked_attention(
        q, k, v, kv_mask=kv_mask, q_chunk=8, k_chunk=16
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_plain))


def test_flash_interpret_mode_matches_naive():
    """Pallas kernel in interpreter mode (CPU) vs naive attention."""
    from actionmesh_tpu.ops import flash_attention as fa
    import functools
    from jax.experimental import pallas as pl

    # run the kernel via interpret mode by monkeypatching pallas_call
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 256, 128))
    k = jax.random.normal(kk, (1, 2, 384, 128))
    v = jax.random.normal(kv, (1, 2, 384, 128))

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    finally:
        pl.pallas_call = orig
    ref = naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_fused_interpret_matches_unfused():
    """Fused rms-norm+RoPE flash kernel vs the composed reference path."""
    import functools

    from jax.experimental import pallas as pl

    from actionmesh_tpu.models.layers import rms_norm
    from actionmesh_tpu.ops import flash_attention as fa
    from actionmesh_tpu.ops.rotary import (
        apply_rotary_embedding,
        compute_rotary_embeddings,
    )

    B, H, S, D = 1, 2, 300, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv, ks = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, S, D))
    k = jax.random.normal(kk, (B, H, S, D))
    v = jax.random.normal(kv, (B, H, S, D))
    qs = jax.random.normal(ks, (D,)) * 0.1 + 1.0
    ksc = qs * 0.9
    cos, sin = compute_rotary_embeddings(D, jnp.linspace(0, 3, S))
    cosb, sinb = cos[None], sin[None]
    qn = rms_norm({"scale": qs}, q)
    kn = rms_norm({"scale": ksc}, k)
    ref = naive_attention(
        apply_rotary_embedding(qn, cosb, sinb),
        apply_rotary_embedding(kn, cosb, sinb),
        v,
    )
    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = fa.flash_attention_fused(
            q, k, v, cosb, sinb, qs, ksc, block_q=128, block_k=128
        )
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_rope_half_layout_equivalence():
    """Half-layout RoPE on permuted q/k == interleaved RoPE, score-exactly.

    The checkpoint converter permutes to_q/to_k columns by
    rope_half_permutation so models can use the shuffle-free half layout
    (ops/rotary.py); this pins the underlying invariance: applying the
    permutation to the head channels and switching both the tables and the
    rotation to `half` leaves attention scores unchanged.
    """
    from actionmesh_tpu.ops.rotary import (
        apply_rotary_embedding,
        compute_rotary_embeddings,
        rope_half_permutation,
    )

    B, H, S, D = 2, 3, 17, 8
    key = jax.random.PRNGKey(3)
    kq, kk = jax.random.split(key)
    q = jax.random.normal(kq, (B, H, S, D))
    k = jax.random.normal(kk, (B, H, S, D))
    positions = jnp.linspace(-2.0, 5.0, S)

    cos_i, sin_i = compute_rotary_embeddings(D, positions)
    q_i = apply_rotary_embedding(q, cos_i[None], sin_i[None])
    k_i = apply_rotary_embedding(k, cos_i[None], sin_i[None])
    scores_ref = jnp.einsum("bhqd,bhkd->bhqk", q_i, k_i)

    perm = rope_half_permutation(D)
    cos_h, sin_h = compute_rotary_embeddings(D, positions, layout="half")
    q_h = apply_rotary_embedding(q[..., perm], cos_h[None], sin_h[None], layout="half")
    k_h = apply_rotary_embedding(k[..., perm], cos_h[None], sin_h[None], layout="half")
    scores_half = jnp.einsum("bhqd,bhkd->bhqk", q_h, k_h)

    # rotated vectors are the permutation of the interleaved-rotated ones...
    np.testing.assert_allclose(
        np.asarray(q_h), np.asarray(q_i[..., perm]), atol=1e-6
    )
    # ...so scores agree exactly
    np.testing.assert_allclose(
        np.asarray(scores_half), np.asarray(scores_ref), atol=1e-5
    )


def test_fused_rms_rope_matches_separate_ops():
    """ops/rope_norm.py fused kernel == rms_norm -> apply_rotary_embedding.

    Covers all four mode combinations plus non-divisible S (padding path),
    batched tables, and bf16 activations.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from actionmesh_tpu.models.layers import rms_norm
    from actionmesh_tpu.ops.rope_norm import fused_rms_rope
    from actionmesh_tpu.ops.rotary import (
        apply_rotary_embedding,
        compute_rotary_embeddings,
    )

    B, H, S, D = 2, 3, 100, 128  # S % 8 != 0 exercises the pad/slice path
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.float32)
    scale = jax.random.normal(jax.random.PRNGKey(1), (D,)) * 0.1 + 1.0
    pos = jax.random.uniform(jax.random.PRNGKey(2), (S,)) * 10
    cos, sin = compute_rotary_embeddings(D, pos, layout="half")
    cosb = jnp.stack([cos, cos * 0.5])
    sinb = jnp.stack([sin, sin * 0.5])

    ref = apply_rotary_embedding(
        rms_norm({"scale": scale}, x), cos, sin, layout="half"
    )
    np.testing.assert_allclose(
        np.asarray(fused_rms_rope(x, scale, cos, sin)), np.asarray(ref),
        rtol=2e-6, atol=2e-6,
    )

    ref_b = apply_rotary_embedding(
        rms_norm({"scale": scale}, x), cosb, sinb, layout="half"
    )
    np.testing.assert_allclose(
        np.asarray(fused_rms_rope(x, scale, cosb, sinb)), np.asarray(ref_b),
        rtol=2e-6, atol=2e-6,
    )

    np.testing.assert_allclose(
        np.asarray(fused_rms_rope(x, scale, None, None)),
        np.asarray(rms_norm({"scale": scale}, x)), rtol=2e-6, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(fused_rms_rope(x, None, cos, sin)),
        np.asarray(apply_rotary_embedding(x, cos, sin, layout="half")),
        rtol=2e-6, atol=2e-6,
    )

    xb = x.astype(jnp.bfloat16)
    ref16 = apply_rotary_embedding(
        rms_norm({"scale": scale}, xb), cos, sin, layout="half"
    )
    np.testing.assert_allclose(
        np.asarray(fused_rms_rope(xb, scale, cos, sin), dtype=np.float32),
        np.asarray(ref16, dtype=np.float32), rtol=2e-2, atol=2e-2,
    )
