"""HF facebook/actionbench real-layout dry run (round-4 verdict item 6).

Slow tier: builds the byte-layout clone (<root>/actionbench/data/{uid}/
surfaces.npy + rgba_%02d.png — ref:actionbench/README.md:13-25), checks
the production frame loader consumes a sample dir directly, and runs
actionbench/evaluate_dataset.py UNMODIFIED as a CLI subprocess on
GT-derived predictions — proving day-one real evaluation is a path change.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scripts.actionbench_hf_dryrun import (
    build_hf_clone,
    predict_gt,
    run_evaluator_cli,
)


@pytest.fixture(scope="module")
def spec():
    from actionmesh_tpu.training.closed_loop import CascadeSpec

    return CascadeSpec()


def test_hf_clone_layout_and_loader(tmp_path, spec):
    uids = build_hf_clone(tmp_path, 2, seed=3, spec=spec)
    assert len(uids) == 2
    for uid in uids:
        d = tmp_path / "actionbench" / "data" / uid
        surf = np.load(d / "surfaces.npy")
        assert surf.shape == (spec.n_frames, 4096, 6)
        assert surf.dtype == np.float32
        pngs = sorted(d.glob("rgba_*.png"))
        assert len(pngs) == spec.n_frames

        # production auto-dispatch loader on the HF sample DIR: must natsort
        # the RGBA frames and ignore surfaces.npy
        from actionmesh_tpu.io.video_input import load_frames

        video = load_frames(d)
        assert video.n_frames == spec.n_frames
        assert video.frames[0].mode == "RGBA"


def test_evaluator_cli_unmodified_on_hf_layout(tmp_path, spec):
    # ONE sample: the evaluator's per-sample ICP is minutes on the 1-core
    # CI host (the multi-sample + real-pipeline version is
    # scripts/actionbench_hf_dryrun.py, exercised on the chip —
    # ACTIONBENCH_HF_DRYRUN.json)
    uids = build_hf_clone(tmp_path, 1, seed=3, spec=spec)
    pred_root = predict_gt(tmp_path, uids, seed=3, spec=spec)
    summary = run_evaluator_cli(tmp_path, pred_root, device="cpu")
    assert summary["n_total"] == 1
    assert summary["n_success"] == 1
    # GT-derived predictions sit at the sampling floor
    assert summary["cd_3d_mean"] < 0.05
    assert np.isfinite(summary["cd_4d_mean"])
    assert (tmp_path / "results.csv").exists()
