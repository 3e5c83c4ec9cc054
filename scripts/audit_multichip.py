"""AOT-lower the PRODUCTION-shape multi-chip programs and audit the HLO.

Wrapper over actionmesh_tpu/parallel/audit.py (see its docstring for what
risk this retires and the attention-fidelity caveat). Compiles the dp2xtp4
Stage-I denoise segment (seq 32784, 21 layers, 5-step scan) and the
Stage-II decode (40960-vertex bucket) on a virtual 8-CPU-device mesh,
checks the Megatron invariants, and writes MULTICHIP_AUDIT.json with every
collective op, per-device memory, and a program-derived ICI estimate.

Usage:  python scripts/audit_multichip.py   (self-bootstraps 8 CPU devices)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bootstrap(n_devices: int) -> None:
    import subprocess

    env = dict(os.environ)
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n_devices}".strip()
    )
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["_AUDIT_CHILD"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, cwd=REPO
    )
    sys.exit(proc.returncode)


def main() -> None:
    n_devices = 8
    import jax

    jax.config.update("jax_platform_name", "cpu")
    if os.environ.get("_AUDIT_CHILD") != "1" and jax.device_count() < n_devices:
        _bootstrap(n_devices)
        return

    sys.path.insert(0, REPO)
    from actionmesh_tpu.parallel.audit import (
        audit_stage1,
        audit_stage2,
        audit_train_step,
        check_megatron_invariants,
        check_sp_invariants,
        check_train_invariants,
        ici_estimate,
        ici_estimate_sp,
    )
    from actionmesh_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices=n_devices)
    dp, tp = mesh.devices.shape
    print(f"virtual mesh: dp={dp} x tp={tp} over {n_devices} CPU devices")

    s1 = audit_stage1(mesh)
    print(f"Stage I: lowered {s1['lower_s']}s, compiled {s1.get('compile_s')}s,"
          f" summary {json.dumps(s1.get('summary', {}))}")
    s2 = audit_stage2(mesh)
    print(f"Stage II: lowered {s2['lower_s']}s, compiled {s2.get('compile_s')}s,"
          f" summary {json.dumps(s2.get('summary', {}))}")

    # The sequence-parallel layout (r3a projected it better on paper) now
    # compiles at production shape too: the ring schedule lowers with
    # chunked partials (same collectives as the flash path on hardware).
    sp_mesh = make_mesh(n_devices=n_devices, dp=2, tp=2, sp=2)
    s1_sp = audit_stage1(sp_mesh)
    s1_sp["name"] = "stage1_denoise_window_sp"
    s1_sp["mesh"] = {"dp": 2, "tp": 2, "sp": 2}
    print(f"Stage I (dp2xtp2xsp2): lowered {s1_sp['lower_s']}s, compiled "
          f"{s1_sp.get('compile_s')}s, summary "
          f"{json.dumps(s1_sp.get('summary', {}))}")

    # Pure dp x sp layout (no tp): r5e measured that tp-sharded gemm
    # shapes run at materially lower MXU efficiency than full-width ones
    # (SHARD_COMPUTE.json: cross_kv 8.9 TF/s vs ~190 full-width), so a
    # layout that keeps every weight replicated and shards only batch
    # rows (dp) + sequence rows (sp ring attention) trades ICI reduces
    # for full-width gemms. Audit it at production shape.
    sp4_mesh = make_mesh(n_devices=n_devices, dp=2, tp=1, sp=4)
    s1_sp4 = audit_stage1(sp4_mesh)
    s1_sp4["name"] = "stage1_denoise_window_dp2xsp4"
    s1_sp4["mesh"] = {"dp": 2, "tp": 1, "sp": 4}
    print(f"Stage I (dp2xsp4): lowered {s1_sp4['lower_s']}s, compiled "
          f"{s1_sp4.get('compile_s')}s, summary "
          f"{json.dumps(s1_sp4.get('summary', {}))}")

    # Distilled single-branch program (configs/actionmesh_distilled.yaml):
    # no CFG pair, so the 8 chips all go to tp — audit the tp8 layout.
    tp8_mesh = make_mesh(n_devices=n_devices, dp=1)
    s1_d = audit_stage1(
        tp8_mesh, guidance_branches=((1, 1),), guidance_scales=()
    )
    s1_d["name"] = "stage1_denoise_window_distilled_tp8"
    s1_d["mesh"] = {"dp": 1, "tp": 8}
    print(f"Stage I distilled (tp8): lowered {s1_d['lower_s']}s, compiled "
          f"{s1_d.get('compile_s')}s, summary "
          f"{json.dumps(s1_d.get('summary', {}))}")

    # Training step (the framework's beyond-reference capability) at
    # production shape: fwd+bwd+adamw partitioning + memory certification.
    tr = audit_train_step(mesh)
    print(f"Train step: lowered {tr['lower_s']}s, compiled "
          f"{tr.get('compile_s')}s, summary "
          f"{json.dumps(tr.get('summary', {}))}")

    fails = check_megatron_invariants(s1, tp)
    fails += check_sp_invariants(s1_sp, sp=2)
    # dp2xsp4 is an EXPLORATORY candidate, not a shipping layout: its
    # memory finding is recorded as a warning, not a gate. The CPU buffer
    # assignment legalizes bf16 compute to fp32, so its temp bound is
    # ~2x the TPU assignment; sp4's 18.3 GB CPU bound is ~9.1 GB
    # bf16-adjusted (fits 14 GB with margin), but only on-silicon
    # compilation can certify that — production layouts keep the
    # conservative raw-bound gate.
    sp4_checks = check_sp_invariants(s1_sp4, sp=4, tp=1)
    memory_warnings = [
        "dp2xsp4 (exploratory): " + c for c in sp4_checks
        if "per-device temps" in c
    ]
    fails += [c for c in sp4_checks if "per-device temps" not in c]
    fails += check_megatron_invariants(s1_d, 8)
    fails += check_train_invariants(tr, tp)
    report = {
        "mesh": {"dp": int(dp), "tp": int(tp)},
        "programs": [s1, s2, s1_sp, s1_sp4, s1_d, tr],
        "invariant_failures": fails,
        "memory_warnings": memory_warnings,
        "ici_estimate": ici_estimate(s1, tp),
        "ici_estimate_sp": ici_estimate_sp(s1_sp, tp=2, sp=2),
        "ici_estimate_sp4": ici_estimate_sp(s1_sp4, tp=1, sp=4),
        "ici_estimate_distilled_tp8": ici_estimate(s1_d, 8),
    }
    out_path = os.path.join(REPO, "MULTICHIP_AUDIT.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    for p in report["programs"]:
        print(p["name"], "mem:", json.dumps(p.get("memory", {})))
    print("ici:", json.dumps(report["ici_estimate"]))
    if fails:
        print("INVARIANT FAILURES:\n" + "\n".join(fails))
        sys.exit(1)
    print(f"audit OK -> {out_path}")


if __name__ == "__main__":
    main()
