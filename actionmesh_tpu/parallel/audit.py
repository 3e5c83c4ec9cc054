"""Production-shape AOT lowering + HLO collective/memory audit.

The multi-chip risk this retires (round-2 verdict item 1): sharded
correctness had only ever been demonstrated at toy shapes, so GSPMD's
actual collective placement, activation sharding and per-device memory at
the production 33k-token sequence were unknown, and the v5e-8 scaling
projection was an assumption. AOT lowering + compilation on a virtual
8-device CPU mesh exercises the SAME GSPMD partitioner the TPU build uses,
with zero hardware: the partitioned HLO (collective ops, shapes, replica
groups) and the compiled buffer assignment are inspectable artifacts.

Attention fidelity note: programs lower with attn_impl="chunked" (pure
XLA). The Pallas flash kernel cannot trace at 33k sequence off-TPU
(interpret mode), and on hardware it runs per-shard under shard_map with
heads over tp — the same layout with zero internal collectives — so the
Megatron projection/FF collective structure audited here is exactly what
the flash path sees. The sequence-parallel ring is auditable the same
way: chunked_attention exposes the online-softmax stats the ring merge
needs (ops/attention.py), so an sp mesh lowers the REAL ring schedule
(KV ppermutes + log-sum-exp merge) with chunked partials standing in for
the flash kernel — identical collective structure.

Used by scripts/audit_multichip.py (full report -> MULTICHIP_AUDIT.json)
and __graft_entry__.dryrun_multichip (production-shape certification in
MULTICHIP_r{N}.json).
"""

from __future__ import annotations

import re
import time

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
COLLECTIVE_KINDS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shape_bytes(shape_str: str) -> int:
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(m.group(1), 4)


def parse_collectives(hlo_text: str) -> list[dict]:
    """Every collective op in optimized (post-SPMD) HLO text with its
    output shape, byte size and replica groups. Tuple outputs (combined
    collectives) sum their element sizes.

    ``tpu_bytes`` is the byte count the same program moves on a TPU
    backend: XLA:CPU legalizes bf16 dots to f32-with-converts, and the
    algebraic simplifier leaves GSPMD's collectives on the f32 side of
    those converts (measured: a minimal pure-bf16 Megatron matmul's
    all-reduce compiles as ``f32 all-reduce(%convert...)`` followed by a
    wrapped-convert back to bf16 — BENCH_NOTES r4b). On TPU, where bf16
    dots emit bf16, the collective runs in bf16 at HALF the bytes. An f32
    collective whose operand is a convert is therefore counted at bytes/2
    in ``tpu_bytes``; genuinely-fp32 collectives (no convert operand)
    keep their full size."""
    out = []
    for line in hlo_text.splitlines():
        for kind in COLLECTIVE_KINDS:
            m = re.search(r"=\s+(\([^)]*\)|\S+)\s+" + kind + r"(?:-start)?\(", line)
            if m:
                shape_str = m.group(1)
                if shape_str.startswith("("):
                    nbytes = sum(
                        _shape_bytes(s.strip())
                        for s in shape_str.strip("()").split(",")
                        if "[" in s
                    )
                else:
                    nbytes = _shape_bytes(shape_str)
                groups = re.search(
                    r"replica_groups=(\{[^}]*\}+|\[[^\]]*\])", line
                )
                operands = line[m.end():].split(")", 1)[0]
                cpu_f32_artifact = (
                    shape_str.startswith("f32") and "convert" in operands
                )
                out.append({
                    "kind": kind,
                    "shape": shape_str,
                    "bytes": nbytes,
                    "tpu_bytes": nbytes // 2 if cpu_f32_artifact else nbytes,
                    "cpu_f32_artifact": cpu_f32_artifact,
                    "replica_groups": groups.group(1)[:120] if groups else "",
                })
                break
    return out


def summarize_collectives(colls: list[dict]) -> dict:
    by_kind: dict[str, dict] = {}
    for c in colls:
        d = by_kind.setdefault(
            c["kind"], {"count": 0, "bytes": 0, "tpu_bytes": 0}
        )
        d["count"] += 1
        d["bytes"] += c["bytes"]
        d["tpu_bytes"] += c.get("tpu_bytes", c["bytes"])
    return by_kind


def memory_dict(mem) -> dict:
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        try:
            out[k] = int(getattr(mem, k))
        except Exception:
            pass
    return out


def abstract_sharded_params(init_thunk, shardings_fn, mesh):
    """ShapeDtypeStruct param tree with NamedShardings — nothing allocated."""
    import jax

    shapes = jax.eval_shape(init_thunk)
    shardings = shardings_fn(shapes, mesh)
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings,
    )


def audit_stage1(
    mesh,
    n_steps: int = 5,
    compile: bool = True,
    guidance_branches=((0, 1), (1, 1)),
    guidance_scales=(7.5,),
) -> dict:
    """Lower (+ GSPMD-compile) the production Stage-I denoise segment:
    B=1, T=16, N=2048, width 2048, seq 32784, `n_steps`-step scan — the
    exact per-launch program the pipeline runs (steps_per_launch=5).

    ``guidance_branches``/``guidance_scales`` default to the reference CFG
    pair; pass ``((1, 1),), ()`` for the distilled single-branch program
    (configs/actionmesh_distilled.yaml)."""
    import jax
    import jax.numpy as jnp

    from actionmesh_tpu.models.denoiser import DenoiserConfig, init_denoiser
    from actionmesh_tpu.parallel.mesh import denoiser_param_shardings
    from actionmesh_tpu.sampling.denoise_loop import denoise_window
    from actionmesh_tpu.sampling.guidance import make_guidance

    dcfg = DenoiserConfig()  # production
    B, T, N = 1, 16, dcfg.num_tokens_nominal
    S = 257  # DINOv2-L tokens at 224px

    params = abstract_sharded_params(
        lambda: init_denoiser(jax.random.PRNGKey(0), dcfg, dtype=jnp.bfloat16),
        denoiser_param_shardings, mesh,
    )
    guidance = make_guidance(
        [list(b) for b in guidance_branches], list(guidance_scales)
    )
    sds = jax.ShapeDtypeStruct
    t0 = time.time()
    lowered = denoise_window.lower(
        params, dcfg, guidance,
        sds((B, T, N, dcfg.in_channels), jnp.bfloat16),
        sds((B, T, S, dcfg.cross_attention_dim), jnp.bfloat16),
        sds((B, T), jnp.int32),
        sds((B, T), jnp.float32),
        sds((n_steps + 1,), jnp.float32),
        sds((n_steps,), jnp.float32),
        is_additive=True, attn_impl="chunked", mesh=mesh,
    )
    report = {
        "name": "stage1_denoise_window",
        "shapes": {"B": B, "T": T, "N": N, "width": dcfg.width,
                   "seq": T * (N + 1), "layers": dcfg.num_layers,
                   "steps_per_launch": n_steps,
                   "g_batch": len(guidance_branches) * B},
        "lower_s": round(time.time() - t0, 1),
    }
    if compile:
        t0 = time.time()
        compiled = lowered.compile()
        report["compile_s"] = round(time.time() - t0, 1)
        colls = parse_collectives(compiled.as_text())
        report["collectives"] = colls
        report["summary"] = summarize_collectives(colls)
        report["memory"] = memory_dict(compiled.memory_analysis())
    return report


def audit_stage2(mesh, compile: bool = True) -> dict:
    """Lower (+ compile) the production Stage-II decode: 40960-vertex
    bucket (pipeline.py vertex bucketing), T_out=5 (decode_target_chunk)."""
    import jax
    import jax.numpy as jnp

    from actionmesh_tpu.models.autoencoder import (
        AutoencoderConfig, autoencoder_forward, init_autoencoder,
    )
    from actionmesh_tpu.parallel.mesh import autoencoder_param_shardings

    acfg = AutoencoderConfig()  # production
    B, T, N, V, T_out = 1, 16, 2048, 40960, 5

    def init_bf16():
        p = init_autoencoder(jax.random.PRNGKey(0), acfg)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)

    params = abstract_sharded_params(
        init_bf16, autoencoder_param_shardings, mesh
    )
    sds = jax.ShapeDtypeStruct
    fn = jax.jit(
        autoencoder_forward,
        static_argnames=("cfg", "attn_impl", "compute_dtype", "mesh"),
    )
    t0 = time.time()
    lowered = fn.lower(
        params, acfg,
        sds((B, T, N, acfg.latent_channels), jnp.bfloat16),
        sds((B, T), jnp.float32),
        sds((B,), jnp.float32),
        sds((B, T_out), jnp.float32),
        sds((B, V, 6), jnp.float32),
        attn_impl="chunked", compute_dtype=jnp.bfloat16, mesh=mesh,
    )
    report = {
        "name": "stage2_decode",
        "shapes": {"B": B, "T": T, "N": N, "V": V, "T_out": T_out,
                   "width": acfg.width, "layers": acfg.num_layers},
        "lower_s": round(time.time() - t0, 1),
    }
    if compile:
        t0 = time.time()
        compiled = lowered.compile()
        report["compile_s"] = round(time.time() - t0, 1)
        colls = parse_collectives(compiled.as_text())
        report["collectives"] = colls
        report["summary"] = summarize_collectives(colls)
        report["memory"] = memory_dict(compiled.memory_analysis())
    return report


def audit_train_step(mesh, compile: bool = True) -> dict:
    """Lower (+ GSPMD-compile) the production TRAINING step: rectified-flow
    loss + grad + adamw over the full 21-layer width-2048 denoiser at seq
    32,784, remat on, fp32 masters + bf16 compute, batch over dp, params/
    moments over tp. Certifies that the 1.26B-param training program
    partitions and that its per-device buffers fit a v5e (16 GB)."""
    import jax
    import jax.numpy as jnp
    import optax

    from actionmesh_tpu.models.denoiser import DenoiserConfig, init_denoiser
    from actionmesh_tpu.parallel.mesh import (
        batch_sharding,
        denoiser_param_shardings,
        replicated,
    )
    from actionmesh_tpu.training.flow_train import (
        make_train_step,
        optimizer_state_shardings,
    )

    dcfg = DenoiserConfig()  # production
    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("dp", 1)
    B, T, N = max(2, dp), 16, dcfg.num_tokens_nominal
    S = 257

    params = abstract_sharded_params(
        lambda: init_denoiser(jax.random.PRNGKey(0), dcfg),  # fp32 masters
        denoiser_param_shardings, mesh,
    )
    optimizer = optax.adamw(1e-4)
    opt_shapes = jax.eval_shape(optimizer.init, params)
    opt_shardings = optimizer_state_shardings(
        params, denoiser_param_shardings(params, mesh), optimizer
    )
    opt_state = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        opt_shapes, opt_shardings,
    )
    sds = jax.ShapeDtypeStruct
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": sds((), jnp.int32, sharding=replicated(mesh)),
    }
    bsh = batch_sharding(mesh)
    batch = {
        "latents": sds((B, T, N, dcfg.in_channels), jnp.float32, sharding=bsh),
        "context": sds(
            (B, T, S, dcfg.cross_attention_dim), jnp.bfloat16, sharding=bsh
        ),
        "framestep": sds((B, T), jnp.float32, sharding=bsh),
        "mask": sds((B, T), jnp.float32, sharding=bsh),
    }
    step = make_train_step(
        dcfg, optimizer, mesh=mesh, attn_impl="chunked_train",
        compute_dtype=jnp.bfloat16, remat=True,
    )
    t0 = time.time()
    lowered = step.lower(state, batch, sds((2,), jnp.uint32))
    report = {
        "name": "stage1_train_step",
        "shapes": {"B": B, "T": T, "N": N, "width": dcfg.width,
                   "seq": T * (N + 1), "layers": dcfg.num_layers,
                   "masters": "fp32", "compute": "bf16", "remat": True},
        "lower_s": round(time.time() - t0, 1),
    }
    if compile:
        t0 = time.time()
        compiled = lowered.compile()
        report["compile_s"] = round(time.time() - t0, 1)
        colls = parse_collectives(compiled.as_text())
        report["collectives"] = colls
        report["summary"] = summarize_collectives(colls)
        report["memory"] = memory_dict(compiled.memory_analysis())
    return report


def check_train_invariants(train_report: dict, tp: int) -> list[str]:
    """Failures list (empty = pass) for the production training step:
      * reduce traffic at least the forward Megatron floor (backward adds
        the mirror-image reduces on top),
      * NO full-sequence activation all-gather, and
      * per-device ARGUMENT bytes (sharded fp32 masters + Adam moments +
        batch) within a 16 GB v5e budget with headroom for activations.

    Temp bytes are reported but not asserted: the XLA:CPU buffer
    assignment does not reuse buffers across the sequentially-executed
    per-block backwards (measured 104 GB for a program whose live set
    under remat is a few GB; the TPU assignment differs — same caveat as
    the r3c sp-layout audit). The authoritative activation-memory datum
    is the on-chip training-step run (scripts/bench_train.py).
    """
    fails: list[str] = []
    if "collectives" not in train_report:
        return ["train step was not compiled — no collectives to audit"]
    sh = train_report["shapes"]
    full_act_bytes = 2 * sh["seq"] * sh["width"] * 2
    reduce_bytes = sum(
        c["bytes"] for c in train_report["collectives"]
        if c["kind"] in ("all-reduce", "reduce-scatter")
    )
    fwd_floor = sh["layers"] * 3 * (full_act_bytes // 2)
    if reduce_bytes < fwd_floor:
        fails.append(
            f"train: reduce traffic {reduce_bytes / 1e9:.1f} GB below the "
            f"forward Megatron floor {fwd_floor / 1e9:.1f} GB — tp "
            f"partitioning missing in fwd or bwd"
        )
    big_ag = [c for c in train_report["collectives"]
              if c["kind"] == "all-gather" and c["bytes"] >= full_act_bytes]
    if big_ag:
        fails.append(
            "train: full-sequence activation all-gather present: "
            + ", ".join(
                f"{c['shape']} ({c['bytes'] / 1e6:.0f} MB)" for c in big_ag[:5]
            )
        )
    mem = train_report.get("memory", {})
    args = mem.get("argument_size_in_bytes", 0)
    if args > 10e9:
        fails.append(
            f"train: per-device argument bytes {args / 1e9:.1f} GB leave "
            f"<6 GB activation headroom on a 16 GB v5e — param/moment "
            f"sharding regressed"
        )
    return fails


def check_megatron_invariants(stage1_report: dict, tp: int) -> list[str]:
    """Failures list (empty = pass):
      * enough all-reduce/reduce-scatter traffic that the 3 row-parallel
        reduces per block actually partitioned over tp, and
      * NO full-sequence activation all-gather (the way GSPMD silently
        de-shards when a sharding annotation is lost).
    """
    fails: list[str] = []
    if "collectives" not in stage1_report:
        return ["stage1 was not compiled — no collectives to audit"]
    sh = stage1_report["shapes"]
    # one row-parallel all-reduce output: (g*B, seq, width) bf16 per dp shard
    full_act_bytes = sh.get("g_batch", 2) * sh["seq"] * sh["width"] * 2
    # NOTE: the scan body prints ONCE in HLO regardless of trip count, so
    # parsed collective totals are PER-STEP (plus once-per-launch prologue).
    ar = [c for c in stage1_report["collectives"]
          if c["kind"] in ("all-reduce", "reduce-scatter")]
    got = sum(c["bytes"] for c in ar)
    min_bytes = sh["layers"] * 3 * (full_act_bytes // 2)  # 2x slack: combining
    if got < min_bytes:
        fails.append(
            f"stage1: expected >= {min_bytes / 1e9:.1f} GB of reduce traffic "
            f"per step (Megatron {sh['layers']}x3 row-parallel), found "
            f"{got / 1e9:.1f} GB in {len(ar)} ops — tp partitioning missing"
        )
    big_ag = [c for c in stage1_report["collectives"]
              if c["kind"] == "all-gather" and c["bytes"] >= full_act_bytes]
    if big_ag:
        fails.append(
            "stage1: full-sequence activation all-gather present: "
            + ", ".join(
                f"{c['shape']} ({c['bytes'] / 1e6:.0f} MB)" for c in big_ag[:5]
            )
        )
    return fails


def check_sp_invariants(stage1_report: dict, sp: int, tp: int = 2) -> list[str]:
    """Failures list (empty = pass) for a (dp, tp, sp) layout:
      * ring KV rotation present: >= one collective-permute per inflated
        self-attention call per ring step (21 layers x (sp-1) rounds, k+v
        at minimum),
      * NO full-sequence activation all-gather (GSPMD silently de-sharding
        the sp axis would reconstruct the 33k-token activations), and
      * the Megatron reduces did not disappear (tp partitioning intact;
        skipped when tp == 1 — a pure dp x sp layout has no tp reduces
        by design, its weights replicate).
    """
    fails: list[str] = []
    if "collectives" not in stage1_report:
        return ["stage1 (sp) was not compiled — no collectives to audit"]
    sh = stage1_report["shapes"]
    full_act_bytes = sh.get("g_batch", 2) * sh["seq"] * sh["width"] * 2
    colls = stage1_report["collectives"]
    perms = [c for c in colls if c["kind"] == "collective-permute"]
    min_perms = sh["layers"] * (sp - 1) * 2  # k and v per ring round
    if len(perms) < min_perms:
        fails.append(
            f"stage1 sp: expected >= {min_perms} KV ring ppermutes per step "
            f"({sh['layers']} layers x {sp - 1} rounds x k,v), found "
            f"{len(perms)} — ring schedule missing"
        )
    big_ag = [c for c in colls
              if c["kind"] == "all-gather" and c["bytes"] >= full_act_bytes]
    if big_ag:
        fails.append(
            "stage1 sp: full-sequence activation all-gather present: "
            + ", ".join(
                f"{c['shape']} ({c['bytes'] / 1e6:.0f} MB)" for c in big_ag[:5]
            )
        )
    reduce_bytes = sum(
        c["bytes"] for c in colls
        if c["kind"] in ("all-reduce", "reduce-scatter")
    )
    if reduce_bytes == 0 and tp > 1:
        fails.append("stage1 sp: no reduce traffic — tp partitioning missing")
    # Per-layer per-frame activation re-gathers (the r3c "spatial reshard"
    # pathology, fixed in r4 by batch-over-sp sharding of per-frame ops):
    # a single small output gather is fine; per-layer 100 MB+ ones are not.
    frame_act_bytes = 64 * 1024 * 1024
    big_frame_ag = [
        c for c in colls
        if c["kind"] == "all-gather" and c["bytes"] >= frame_act_bytes
    ]
    if len(big_frame_ag) > 2:
        fails.append(
            f"stage1 sp: {len(big_frame_ag)} per-layer activation "
            f"all-gathers >= 64 MB — per-frame ops are replicating over sp "
            f"again (first: {big_frame_ag[0]['shape']})"
        )
    # HBM budget: v5e has 16 GB; the CPU buffer assignment must leave
    # headroom for the (lower) TPU assignment to fit with weights+IO.
    temps = stage1_report.get("memory", {}).get("temp_size_in_bytes", 0)
    if temps > 14 * 1024**3:
        fails.append(
            f"stage1 sp: per-device temps {temps / 1e9:.2f} GB exceed the "
            "14 GB production budget (16 GB v5e HBM minus weights/IO)"
        )
    return fails


def _collective_bytes(colls: list[dict], kinds: tuple) -> tuple[int, int]:
    """(audited_cpu_bytes, tpu_expected_bytes) for the given kinds."""
    sel = [c for c in colls if c["kind"] in kinds]
    return (
        sum(c["bytes"] for c in sel),
        sum(c.get("tpu_bytes", c["bytes"]) for c in sel),
    )


# v5e ICI: 2D torus, ~45 GB/s/direction nominal per the scaling book; the
# sensitivity axis brackets link-level variation and protocol efficiency.
ICI_BW_POINTS = (3.5e10, 4.5e10, 5.5e10)
OVERLAP_POINTS = (0.0, 0.5, 1.0)


def _ici_surface(reduce_s: float, hideable_s: float) -> dict:
    """step-ICI seconds over bandwidth x overlap: the tp-ring reduce time
    is serial (it gates the next layer's input); ppermutes/gathers are
    overlappable with attention compute by construction, scaled by the
    overlap fraction actually achieved."""
    surface = {}
    for bw in ICI_BW_POINTS:
        scale = 4.5e10 / bw
        for ov in OVERLAP_POINTS:
            key = f"bw{bw / 1e9:.0f}GBs_overlap{ov:g}"
            surface[key] = round(
                reduce_s * scale + hideable_s * scale * (1.0 - ov), 4
            )
    return surface


def ici_estimate_sp(stage1_report: dict, tp: int, sp: int,
                    ici_bytes_per_s: float = 4.5e10) -> dict:
    """Per-step ICI seconds for the (dp, tp, sp) layout.

    Reduces ride a tp-ring within each (dp, sp) group (2(n-1)/n factor);
    ring-attention KV ppermutes each cross one neighbor hop and overlap
    with the next partial-attention compute by construction, so their
    seconds are reported separately (serial worst case), not summed into
    the reduce bound. All times are computed from ``tpu_bytes`` (bf16 on
    the wire where the f32 is a CPU-legalization artifact — see
    parse_collectives); the audited-CPU raw bytes are reported alongside.
    The ``ici_seconds_surface`` grid spans bandwidth x overlap so the
    projection is a sensitivity surface, not a single line.
    """
    if "collectives" not in stage1_report:
        return {}
    colls = stage1_report["collectives"]
    reduce_cpu, reduce_tpu = _collective_bytes(
        colls, ("all-reduce", "reduce-scatter")
    )
    perm_cpu, perm_tpu = _collective_bytes(colls, ("collective-permute",))
    gather_cpu, gather_tpu = _collective_bytes(colls, ("all-gather",))
    reduce_s = (
        reduce_tpu * 2 * (tp - 1) / tp / ici_bytes_per_s if tp > 1 else 0.0
    )
    perm_s = perm_tpu / ici_bytes_per_s
    gather_s = (
        gather_tpu * (sp - 1) / sp / ici_bytes_per_s if sp > 1 else 0.0
    )
    return {
        "stage1_reduce_bytes_per_step_cpu_audit": int(reduce_cpu),
        "stage1_reduce_bytes_per_step_tpu": int(reduce_tpu),
        "stage1_ppermute_bytes_per_step_tpu": int(perm_tpu),
        "stage1_allgather_bytes_per_step_cpu_audit": int(gather_cpu),
        "stage1_allgather_bytes_per_step_tpu": int(gather_tpu),
        "assumed_ici_bytes_per_s_per_dir": ici_bytes_per_s,
        "stage1_ici_seconds_per_step_tp_ring": round(reduce_s, 4),
        "stage1_ici_seconds_allgather": round(gather_s, 4),
        "stage1_ici_seconds_ppermute_overlappable": round(perm_s, 4),
        "ici_seconds_surface": _ici_surface(reduce_s, perm_s + gather_s),
    }


def ici_estimate(stage1_report: dict, tp: int,
                 ici_bytes_per_s: float = 4.5e10) -> dict:
    """Per-step tp-ring ICI seconds from the audited reduce traffic.

    Ring all-reduce moves 2(n-1)/n of the tensor over each link pair;
    4.5e10 B/s/direction is the v5e ICI figure (scaling-book). This
    replaces the round-2 'assumed ~70% scaling' with program-derived
    numbers. Times use ``tpu_bytes`` (bf16-on-the-wire where the audited
    f32 is CPU legalization — see parse_collectives); a bandwidth x
    overlap sensitivity surface brackets the projection.
    """
    if "collectives" not in stage1_report:
        return {}
    # scan body prints once in HLO => parsed totals are already per-step
    colls = stage1_report["collectives"]
    cpu_b, tpu_b = _collective_bytes(colls, ("all-reduce", "reduce-scatter"))
    ici_s = tpu_b * 2 * (tp - 1) / tp / ici_bytes_per_s
    return {
        "stage1_reduce_bytes_per_step_cpu_audit": int(cpu_b),
        "stage1_reduce_bytes_per_step_tpu": int(tpu_b),
        "assumed_ici_bytes_per_s_per_dir": ici_bytes_per_s,
        "stage1_ici_seconds_per_step_tp_ring": round(ici_s, 4),
        "ici_seconds_surface": _ici_surface(ici_s, 0.0),
    }
