"""Flash-attention backward kernel vs autodiff of exact attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actionmesh_tpu.ops.flash_attention_bwd import (
    flash_attention_bwd,
    flash_attention_trainable,
)


def exact_attention(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def make_qkv(key, B=1, H=2, Sq=200, Sk=200, D=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, Sq, D), dtype)
    k = jax.random.normal(kk, (B, H, Sk, D), dtype)
    v = jax.random.normal(kv, (B, H, Sk, D), dtype)
    return q, k, v


@pytest.mark.parametrize("sq,sk", [(200, 200), (256, 512), (130, 390)])
def test_trainable_grads_match_exact(sq, sk):
    """Padding paths exercised: 200/130/390 are not block multiples."""
    q, k, v = make_qkv(jax.random.PRNGKey(0), Sq=sq, Sk=sk)
    scale = q.shape[-1] ** -0.5
    do = jax.random.normal(jax.random.PRNGKey(1), q.shape, jnp.float32)

    def loss_exact(q, k, v):
        return jnp.vdot(exact_attention(q, k, v, scale), do)

    def loss_flash(q, k, v):
        return jnp.vdot(
            flash_attention_trainable(q, k, v, scale, 128, 128), do
        )

    g_exact = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for ge, gf, name in zip(g_exact, g_flash, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(ge), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_trainable_forward_matches_exact():
    q, k, v = make_qkv(jax.random.PRNGKey(2), Sq=300, Sk=300)
    o = flash_attention_trainable(q, k, v, None, 128, 128)
    ref = exact_attention(q, k, v, q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_bwd_direct_call_matches_autodiff():
    """flash_attention_bwd from explicitly-passed residuals/stats."""
    from actionmesh_tpu.ops.flash_attention import flash_attention_pipelined

    q, k, v = make_qkv(jax.random.PRNGKey(3), Sq=256, Sk=256)
    scale = q.shape[-1] ** -0.5
    o, (m, l) = flash_attention_pipelined(q, k, v, scale=scale, return_stats=True)
    do = jax.random.normal(jax.random.PRNGKey(4), q.shape, jnp.float32)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, m, l, do, scale=scale, block_q=128, block_k=128
    )

    def loss(q, k, v):
        return jnp.vdot(exact_attention(q, k, v, scale), do)

    ge_q, ge_k, ge_v = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(ge_q), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(ge_k), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(ge_v), rtol=2e-4, atol=2e-4)


def test_trainable_bf16_grads_close():
    """bf16 inputs: gradients within bf16 tolerance of the fp32 exact path."""
    q, k, v = make_qkv(jax.random.PRNGKey(5), Sq=256, Sk=256, dtype=jnp.bfloat16)
    scale = q.shape[-1] ** -0.5
    do = jax.random.normal(jax.random.PRNGKey(6), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.vdot(
            flash_attention_trainable(q, k, v, scale, 128, 128).astype(
                jnp.float32
            ),
            do,
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)

    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))

    def loss_exact(q, k, v):
        return jnp.vdot(exact_attention(q, k, v, scale), do)

    ge = jax.grad(loss_exact, argnums=(0, 1, 2))(qf, kf, vf)
    for a, b, name in zip(gf, ge, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b),
            rtol=0.1, atol=0.05, err_msg=f"d{name}",
        )


@pytest.mark.slow
def test_flow_training_grads_flash_train_vs_chunked():
    """End-to-end: denoiser training loss grads via the Pallas-backward
    flash path match the chunked-XLA path (interpret mode off-TPU)."""
    from actionmesh_tpu.models.denoiser import init_denoiser
    from actionmesh_tpu.training import flow_matching_loss
    from tests.test_training import TINY, tiny_batch

    params = init_denoiser(jax.random.PRNGKey(0), TINY)
    batch = tiny_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)

    def loss(p, impl):
        return flow_matching_loss(
            p, TINY, batch, key, p_uncond=0.0, attn_impl=impl, remat=True
        )

    l_c, g_c = jax.value_and_grad(lambda p: loss(p, "chunked"))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, "flash_train"))(params)
    np.testing.assert_allclose(float(l_f), float(l_c), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        g_f,
        g_c,
    )


@pytest.mark.slow
def test_flash_train_sharded_grads_match_unsharded():
    """custom_vjp flash backward under shard_map (dp x tp) under grad."""
    from actionmesh_tpu.models.denoiser import init_denoiser
    from actionmesh_tpu.parallel.mesh import (
        batch_sharding,
        denoiser_param_shardings,
        make_mesh,
        shard_params,
    )
    from actionmesh_tpu.training import flow_matching_loss
    from tests.test_training import TINY, tiny_batch

    params = init_denoiser(jax.random.PRNGKey(0), TINY)
    batch = tiny_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)

    g_ref = jax.grad(
        lambda p: flow_matching_loss(
            p, TINY, batch, key, p_uncond=0.0, attn_impl="flash_train"
        )
    )(params)

    mesh = make_mesh(n_devices=8)
    sh_params = shard_params(params, denoiser_param_shardings(params, mesh))
    sh_batch = {
        k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch.items()
    }
    g_sh = jax.grad(
        lambda p: flow_matching_loss(
            p, TINY, sh_batch, key, p_uncond=0.0,
            attn_impl="flash_train", mesh=mesh,
        )
    )(sh_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        g_sh,
        g_ref,
    )


def test_chunked_trainable_grads_match_plain_chunked():
    """The O(S)-backward chunked path == plain-autodiff chunked grads."""
    from actionmesh_tpu.ops.attention import (
        chunked_attention,
        chunked_attention_trainable,
    )

    q, k, v = make_qkv(jax.random.PRNGKey(7), Sq=300, Sk=300, D=32)
    scale = q.shape[-1] ** -0.5
    do = jax.random.normal(jax.random.PRNGKey(8), q.shape, jnp.float32)

    g_plain = jax.grad(
        lambda q, k, v: jnp.vdot(
            chunked_attention(q, k, v, scale=scale, q_chunk=128, k_chunk=128),
            do,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_train = jax.grad(
        lambda q, k, v: jnp.vdot(
            chunked_attention_trainable(q, k, v, scale, 128, 128), do
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g_train, g_plain, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name}",
        )


@pytest.mark.slow
def test_chunked_train_sharded_grads_match_unsharded():
    """The O(S)-backward chunked path under shard_map (dp x tp) under grad
    — the exact composition the production training audit compiles."""
    from actionmesh_tpu.ops.attention import dot_product_attention
    from actionmesh_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices=8)
    B, H, S, D = 2, 8, 256, 32
    q, k, v = make_qkv(jax.random.PRNGKey(9), B=B, H=H, Sq=S, Sk=S, D=D)
    do = jax.random.normal(jax.random.PRNGKey(10), q.shape, jnp.float32)

    def loss(q, k, v, mesh):
        return jnp.vdot(
            dot_product_attention(q, k, v, impl="chunked_train", mesh=mesh),
            do,
        )

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, None)
    g_sh = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, mesh)
    for a, b, name in zip(g_sh, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name}",
        )
