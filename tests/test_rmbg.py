"""RMBG (ISNet) matting model structure tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from actionmesh_tpu.models.rmbg import (
    RMBGConfig,
    RMBGModel,
    init_rmbg,
    rmbg_forward,
)
from actionmesh_tpu.preprocessing.background import (
    otsu_threshold,
    refine_mask,
    remove_small_components,
)


@pytest.mark.slow
def test_rmbg_forward_shape():
    params = init_rmbg(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = rmbg_forward(params, x)
    assert out.shape == (1, 64, 64, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow  # full-width ISNet forward: ~60 s on the 1-core CPU host
def test_rmbg_predict_alpha_api():
    model = RMBGModel.from_random(seed=0)
    model.cfg = RMBGConfig(input_size=64)
    frame = Image.new("RGB", (48, 40), (120, 80, 200))
    alpha = model.predict_alpha(frame)
    assert alpha.shape == (40, 48)
    assert alpha.dtype == np.uint8


def test_otsu_threshold_separates_bimodal():
    img = np.concatenate(
        [np.full(500, 30, np.uint8), np.full(500, 220, np.uint8)]
    )
    t = otsu_threshold(img)
    # threshold semantics: foreground = value > t, so t=30 is valid
    assert 30 <= t < 220


def test_remove_small_components():
    mask = np.zeros((20, 20), bool)
    mask[2:12, 2:12] = True  # big blob (100 px)
    mask[16:18, 16:18] = True  # small blob (4 px)
    out = remove_small_components(mask, min_size=10)
    assert out[5, 5] and not out[16, 16]


def test_refine_mask_binary_output():
    rng = np.random.default_rng(0)
    soft = np.zeros((32, 32), np.uint8)
    soft[8:24, 8:24] = 200
    soft += rng.integers(0, 20, soft.shape).astype(np.uint8)
    out = refine_mask(soft)
    assert set(np.unique(out)) <= {0, 255}
    assert out[16, 16] == 255 and out[0, 0] == 0
