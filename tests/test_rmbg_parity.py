"""RMBG (BriaRMBG / ISNet-DIS) parity: torch transcription vs JAX port.

Round-2 verdict item 5: models/rmbg.py had shape/threshold tests only — no
oracle for the RSU wiring or the BN folding. This transcribes the ISNet-DIS
architecture the reference loads via trust_remote_code
(reference: actionmesh/preprocessing/background_removal.py:41-148, model
briaai/RMBG-1.4), exports the state dict under the briaai parameter names
(stageN.rebnconvM.conv_s1/bn_s1...), converts through
``convert_rmbg_weights`` (exercising BN-fold), and asserts matte parity.

A channel-scaled tiny model keeps the default run fast; the full-size
1024x1024 check is ``slow``-marked (scripts/README two-tier test run).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from actionmesh_tpu.models.rmbg import (
    _RSU_HEIGHT,
    convert_rmbg_weights,
    rmbg_forward,
)


class REBNCONV(nn.Module):
    def __init__(self, in_ch, out_ch, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(
            in_ch, out_ch, 3, padding=dirate, dilation=dirate
        )
        self.bn_s1 = nn.BatchNorm2d(out_ch)
        self.relu_s1 = nn.ReLU(inplace=False)

    def forward(self, x):
        return self.relu_s1(self.bn_s1(self.conv_s1(x)))


def _upsample_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class RSU(nn.Module):
    """RSU7/RSU6/RSU5/RSU4 (height-parameterized, innermost dilated)."""

    def __init__(self, height, in_ch, mid_ch, out_ch):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        for i in range(1, height + 1):
            cin = out_ch if i == 1 else mid_ch
            dirate = 2 if i == height else 1
            setattr(self, f"rebnconv{i}", REBNCONV(cin, mid_ch, dirate=dirate))
        for i in range(height - 1, 0, -1):
            cout = out_ch if i == 1 else mid_ch
            setattr(self, f"rebnconv{i}d", REBNCONV(2 * mid_ch, cout))
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        h = self.height
        hxin = self.rebnconvin(x)
        enc = []
        hx = hxin
        for i in range(1, h):
            hx = getattr(self, f"rebnconv{i}")(hx)
            enc.append(hx)
            if i < h - 1:
                hx = self.pool(hx)
        hx = getattr(self, f"rebnconv{h}")(enc[-1])
        for i in range(h - 1, 0, -1):
            hx = getattr(self, f"rebnconv{i}d")(torch.cat([hx, enc[i - 1]], 1))
            if i > 1:
                hx = _upsample_like(hx, enc[i - 2])
        return hx + hxin


class RSU4F(nn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, dirate=1)
        self.rebnconv2 = REBNCONV(mid_ch, mid_ch, dirate=2)
        self.rebnconv3 = REBNCONV(mid_ch, mid_ch, dirate=4)
        self.rebnconv4 = REBNCONV(mid_ch, mid_ch, dirate=8)
        self.rebnconv3d = REBNCONV(2 * mid_ch, mid_ch, dirate=4)
        self.rebnconv2d = REBNCONV(2 * mid_ch, mid_ch, dirate=2)
        self.rebnconv1d = REBNCONV(2 * mid_ch, out_ch, dirate=1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat([hx4, hx3], 1))
        hx2d = self.rebnconv2d(torch.cat([hx3d, hx2], 1))
        hx1d = self.rebnconv1d(torch.cat([hx2d, hx1], 1))
        return hx1d + hxin


def _make_rsu(kind, in_ch, mid_ch, out_ch):
    if kind == "RSU4F":
        return RSU4F(in_ch, mid_ch, out_ch)
    return RSU(_RSU_HEIGHT[kind], in_ch, mid_ch, out_ch)


class RefISNet(nn.Module):
    """BriaRMBG (ISNet-DIS) with channels scaled by 1/scale_div.

    scale_div=1 reproduces the exact briaai/RMBG-1.4 architecture; larger
    values shrink every channel count uniformly for fast tests (the wiring,
    names and BN folding are identical).
    """

    def __init__(self, scale_div: int = 1):
        super().__init__()
        s = scale_div

        def c(n):
            return max(n // s, 2)

        self.conv_in = nn.Conv2d(3, c(64), 3, stride=2, padding=1)
        stages = [
            ("stage1", "RSU7", c(64), c(32), c(64)),
            ("stage2", "RSU6", c(64), c(32), c(128)),
            ("stage3", "RSU5", c(128), c(64), c(256)),
            ("stage4", "RSU4", c(256), c(128), c(512)),
            ("stage5", "RSU4F", c(512), c(256), c(512)),
            ("stage6", "RSU4F", c(512), c(256), c(512)),
            ("stage5d", "RSU4F", c(1024), c(256), c(512)),
            ("stage4d", "RSU4", c(1024), c(128), c(256)),
            ("stage3d", "RSU5", c(512), c(64), c(128)),
            ("stage2d", "RSU6", c(256), c(32), c(64)),
            ("stage1d", "RSU7", c(128), c(16), c(64)),
        ]
        for name, kind, cin, mid, cout in stages:
            setattr(self, name, _make_rsu(kind, cin, mid, cout))
        side_in = [c(64), c(64), c(128), c(256), c(512), c(512)]
        for i in range(6):
            setattr(self, f"side{i + 1}", nn.Conv2d(side_in[i], 1, 3, padding=1))
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hxin = self.conv_in(x)
        hx1 = self.stage1(hxin)
        hx2 = self.stage2(self.pool(hx1))
        hx3 = self.stage3(self.pool(hx2))
        hx4 = self.stage4(self.pool(hx3))
        hx5 = self.stage5(self.pool(hx4))
        hx6 = self.stage6(self.pool(hx5))
        hx5d = self.stage5d(torch.cat([_upsample_like(hx6, hx5), hx5], 1))
        hx4d = self.stage4d(torch.cat([_upsample_like(hx5d, hx4), hx4], 1))
        hx3d = self.stage3d(torch.cat([_upsample_like(hx4d, hx3), hx3], 1))
        hx2d = self.stage2d(torch.cat([_upsample_like(hx3d, hx2), hx2], 1))
        hx1d = self.stage1d(torch.cat([_upsample_like(hx2d, hx1), hx1], 1))
        d1 = self.side1(hx1d)
        return _upsample_like(d1, x)


def _randomize_bn(model: nn.Module, seed: int) -> None:
    """Give every BatchNorm non-trivial affine + running stats so that an
    incorrect BN fold cannot pass by accident (identity BN would)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.2)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.3
                )
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g)
                )


def _parity_case(scale_div: int, size: int, atol: float):
    import jax.numpy as jnp

    torch.manual_seed(3)
    model = RefISNet(scale_div=scale_div).eval()
    _randomize_bn(model, seed=4)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()
             if "num_batches_tracked" not in k}
    params = convert_rmbg_weights(state)

    rng = np.random.default_rng(5)
    x = rng.uniform(-0.5, 0.5, size=(1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(rmbg_forward(params, jnp.asarray(x)))
    ref_hwc = ref.transpose(0, 2, 3, 1)
    assert ours.shape == ref_hwc.shape
    np.testing.assert_allclose(ours, ref_hwc, atol=atol)


class TestRMBGParity:
    def test_tiny_isnet_matches_torch(self):
        """1/8-channel ISNet at 64x64: exact wiring + BN-fold parity."""
        _parity_case(scale_div=8, size=64, atol=2e-4)

    @pytest.mark.slow
    def test_full_isnet_matches_torch_at_1024(self):
        """Full briaai/RMBG-1.4 architecture at the production 1024x1024."""
        _parity_case(scale_div=1, size=1024, atol=1e-3)

    @pytest.mark.slow
    def test_full_state_dict_converts_and_runs(self):
        """Full-size converter dry-run: briaai-shaped state dict -> forward.

        This is the RMBG entry of the round-3 'synthetic checkpoint at
        production hyperparameters' suite (verdict item 3): asserts the
        converter consumes the exact full-size key set with nothing left
        over, and the folded model produces finite mattes.
        """
        import jax.numpy as jnp

        torch.manual_seed(6)
        model = RefISNet(scale_div=1).eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
              if "num_batches_tracked" not in k}
        params = convert_rmbg_weights(sd)
        n_leaves = sum(1 for _ in _iter_leaves(params))
        # every conv contributes kernel+bias; BN folded in -> 4 tensors per
        # REBNCONV collapse to the conv's 2 (count convs by 4-D weights —
        # name filtering fails: "rebnconv" contains "bn")
        n_convs = sum(1 for k, v in sd.items() if k.endswith(".weight") and v.ndim == 4)
        assert n_leaves == 2 * n_convs
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        out = np.asarray(rmbg_forward(params, x))
        assert out.shape == (1, 128, 128, 1)
        assert np.all(np.isfinite(out))


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree
