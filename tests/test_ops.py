"""Unit tests for foundational ops against reference semantics.

Worked examples come from the reference docstrings
(timesteps.py chunking examples, scheduler sigma math) and from
independent numpy re-derivations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actionmesh_tpu.ops import chunking, embeddings, rotary, tensor_ops
from actionmesh_tpu.sampling import flow_schedule
from actionmesh_tpu.sampling.guidance import make_guidance


class TestTensorOps:
    def test_roundtrips(self):
        x = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
        assert jnp.array_equal(
            tensor_ops.split_batch_time(tensor_ops.merge_batch_time(x), 3), x
        )
        assert jnp.array_equal(
            tensor_ops.split_time_tokens(tensor_ops.merge_time_tokens(x), 3), x
        )

    def test_inflation_reshape(self):
        # (B*T, N, D) -> (B, T*N, D): frame-major token order
        x = jnp.arange(6 * 2 * 1, dtype=jnp.float32).reshape(6, 2, 1)
        inflated = tensor_ops.flat_batch_to_flat_seq(x, n_frames=3)
        assert inflated.shape == (2, 6, 1)
        # batch 0 holds frames 0..2 of batch-item 0 in order
        assert jnp.array_equal(inflated[0, :, 0], jnp.array([0, 1, 2, 3, 4, 5.0]))
        back = tensor_ops.flat_seq_to_flat_batch(inflated, n_frames=3)
        assert jnp.array_equal(back, x)


class TestRotary:
    def test_against_manual(self):
        positions = jnp.array([0.0, 1.0, 2.5])
        cos, sin = rotary.compute_rotary_embeddings(8, positions)
        assert cos.shape == (3, 8)
        inv_freq = 1.0 / (10000.0 ** (np.arange(0, 8, 2) / 8))
        phases = np.outer(np.array([0.0, 1.0, 2.5]), inv_freq)
        np.testing.assert_allclose(
            np.asarray(cos), np.repeat(np.cos(phases), 2, axis=1), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sin), np.repeat(np.sin(phases), 2, axis=1), rtol=1e-5, atol=1e-6
        )

    def test_apply_preserves_norm(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 4, 6, 8))
        cos, sin = rotary.compute_rotary_embeddings(8, jnp.arange(6.0))
        out = rotary.apply_rotary_embedding(x, cos, sin)
        # rotation preserves pairwise L2 norms
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_zero_position_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 3, 8))
        cos, sin = rotary.compute_rotary_embeddings(8, jnp.zeros(3))
        out = rotary.apply_rotary_embedding(x, cos, sin)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


class TestChunking:
    def test_chunk_right_docstring_example(self):
        chunks = chunking.chunk_right(0, 10, 4, 2)
        expected = [[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7], [6, 7, 8, 9]]
        assert [c.tolist() for c in chunks] == expected

    def test_chunk_left_docstring_example(self):
        chunks = chunking.chunk_left(0, 10, 4, 2)
        expected = [[9, 8, 7, 6], [7, 6, 5, 4], [5, 4, 3, 2], [3, 2, 1, 0]]
        assert [c.tolist() for c in chunks] == expected

    def test_chunk_from_anchor0_31frames(self):
        # The production case: 31 frames, window 16, slide 15, anchor 0
        chunks = chunking.chunk_from(0, 31, 16, 15)
        assert len(chunks) == 2
        assert chunks[0].tolist() == list(range(16))
        assert chunks[1].tolist() == list(range(15, 31))

    def test_chunk_from_total_equals_size(self):
        chunks = chunking.chunk_from(2, 4, 4, 3)
        assert len(chunks) == 1
        assert chunks[0].tolist() == [2, 0, 1, 3]

    def test_chunk_from_middle_anchor(self):
        chunks = chunking.chunk_from(5, 20, 8, 7)
        # every index covered
        covered = set()
        for c in chunks:
            covered.update(c.tolist())
            assert len(c) == 8
        assert covered == set(range(20))

    def test_chunk_from_last_anchor(self):
        chunks = chunking.chunk_from(9, 10, 4, 2)
        covered = set()
        for c in chunks:
            covered.update(c.tolist())
        assert covered == set(range(10))


class TestFlowSchedule:
    def test_shift_one_is_linear(self):
        ts = flow_schedule.compute_timesteps(5, 1000, shift=1.0)
        np.testing.assert_allclose(ts, np.linspace(1000, 1, 5), rtol=1e-5)

    def test_shifted_schedule_properties(self):
        ts, dist = flow_schedule.get_schedule(30, 1000, shift=3.0)
        assert ts.shape == (31,) and dist.shape == (30,)
        assert ts[0] == pytest.approx(1000.0)
        assert np.all(np.diff(ts) < 0)  # strictly decreasing
        assert np.all(dist > 0)
        # total distance = (sigma_max - sigma_min)
        np.testing.assert_allclose(dist.sum(), (ts[0] - ts[-1]) / 1000, rtol=1e-6)
        # shift=3 concentrates steps at high noise: small steps early
        # (the shift map's derivative at sigma=1 is 1/shift^... < 1)
        assert dist[0] < dist[-1]

    def test_shift_formula(self):
        ts = flow_schedule.compute_timesteps(3, 1000, shift=3.0)
        # endpoint passes through the shift map twice (linspace endpoints are
        # already shifted sigmas, then the whole grid is shifted again)
        shift = lambda s: 3 * s / (1 + 2 * s)
        expected_min = shift(shift(1.0 / 1000)) * 1000
        np.testing.assert_allclose(ts[-1], expected_min, rtol=1e-5)
        assert ts[0] == pytest.approx(1000.0)


class TestGuidance:
    def test_cfg_batch_and_aggregate(self):
        g = make_guidance([[0, 1], [1, 1]], [7.5])
        latent = jnp.ones((1, 2, 3, 4))
        context = jnp.full((1, 2, 5, 6), 2.0)
        mask = jnp.array([[1.0, 0.0]])
        framestep = jnp.array([[0.0, 1.0]])
        lat, ctx, msk, fs = g.cfg_at_inference(latent, context, mask, framestep)
        assert lat.shape == (2, 2, 3, 4)
        # branch 0 = [0,1]: context zeroed, mask kept
        assert jnp.all(ctx[0] == 0) and jnp.all(ctx[1] == 2.0)
        assert jnp.array_equal(msk[0], mask[0]) and jnp.array_equal(msk[1], mask[0])
        assert fs.shape == (2, 2)

        # aggregation: v0 + s*(v1 - v0)
        v0 = jnp.zeros((1, 2, 3, 4))
        v1 = jnp.ones((1, 2, 3, 4))
        out = g.aggregate_cfg(jnp.concatenate([v0, v1], axis=0))
        np.testing.assert_allclose(np.asarray(out), 7.5, rtol=1e-6)

    def test_three_branch(self):
        g = make_guidance([[0, 0], [0, 1], [1, 1]], [2.0, 3.0])
        v = jnp.stack([jnp.full((2, 2), 1.0), jnp.full((2, 2), 2.0),
                       jnp.full((2, 2), 4.0)]).reshape(3, 2, 2)
        out = g.aggregate_cfg(v.reshape(3 * 1, 2, 2))
        # 1 + 2*(2-1) + 3*(4-2) = 9
        np.testing.assert_allclose(np.asarray(out), 9.0)

    def test_unobserved_mask(self):
        g = make_guidance([[0, 1], [1, 1]], [7.5])
        assert g.get_unobserved_mask(None) is None
        m = g.get_unobserved_mask(jnp.array([1, 0, 1]))
        assert m.tolist() == [False, True, False]


class TestEmbeddings:
    def test_sinusoidal_matches_diffusers_layout(self):
        # flip_sin_to_cos=False -> [sin | cos]
        t = jnp.array([5.0])
        emb = embeddings.sinusoidal_timestep_embedding(t, 8)
        half = 4
        exponent = -np.log(10000.0) * np.arange(half) / half
        freqs = np.exp(exponent)
        args = 5.0 * freqs
        expected = np.concatenate([np.sin(args), np.cos(args)])
        np.testing.assert_allclose(np.asarray(emb[0]), expected, rtol=1e-5)

    def test_timestep_embedder_multi_input(self):
        t1 = jnp.array([1.0, 2.0])
        t2 = jnp.array([3.0, 4.0])
        out = embeddings.timestep_embedder(t1, t2, frequency_embedding_size=8)
        assert out.shape == (2, 16)
        single = embeddings.timestep_embedder(t1, frequency_embedding_size=8)
        np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(single))
        # layout [cos | sin] per input
        freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4)
        np.testing.assert_allclose(
            np.asarray(single[0]),
            np.concatenate([np.cos(1.0 * freqs), np.sin(1.0 * freqs)]),
            rtol=1e-5,
        )

    def test_frequency_positional_embedding_dims(self):
        x = jnp.ones((2, 7, 3))
        out = embeddings.frequency_positional_embedding(x, num_freqs=8)
        assert out.shape == (2, 7, 51)
        assert embeddings.frequency_embedding_out_dim(3, 8) == 51

    def test_frequency_embedding_values(self):
        x = jnp.array([[1.0, 0.5, -1.0]])
        out = embeddings.frequency_positional_embedding(
            x, num_freqs=2, include_pi=False
        )
        # layout: [x(3), sin(x*f interleaved channel-major)(6), cos(6)]
        freqs = np.array([1.0, 2.0])
        flat = (np.array([[1.0, 0.5, -1.0]])[..., None] * freqs).reshape(1, 6)
        expected = np.concatenate(
            [np.array([[1.0, 0.5, -1.0]]), np.sin(flat), np.cos(flat)], axis=-1
        )
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_scale_timestep(self):
        t = jnp.array([[2.0, 4.0, 6.0]])
        np.testing.assert_allclose(
            np.asarray(embeddings.scale_timestep(t)), [[0.0, 2.0, 4.0]]
        )
        np.testing.assert_allclose(
            np.asarray(embeddings.scale_timestep(t, scale=True)),
            [[0.0, 0.5, 1.0]],
        )

    def test_interpolate_timesteps(self):
        ts = np.array([0.0, 1.0, 2.0, 3.0])
        out = embeddings.interpolate_timesteps(ts, subsampling_level=1)
        np.testing.assert_allclose(out, [[0.0, 1.0, 2.0, 3.0]])
        out2 = embeddings.interpolate_timesteps(
            ts, subsampling_level=1, drop_first=True
        )
        np.testing.assert_allclose(out2, [[1.0, 2.0, 3.0]])
        out3 = embeddings.interpolate_timesteps(ts, subsampling_level=2)
        assert out3.shape == (1, 7)

    def test_get_scaling_apply_scaling(self):
        ts = jnp.array([[10.0, 20.0, 30.0]])
        t_min, t_range = embeddings.get_scaling(ts)
        assert t_min[0] == 10.0 and t_range[0] == 20.0
        scaled = embeddings.apply_scaling(ts, t_min, t_range)
        np.testing.assert_allclose(np.asarray(scaled), [[0.0, 0.5, 1.0]])
