"""Per-op trace attribution for the flagship train step (VERDICT r03 #8).

profile_train.py places the step at 84-88% of its XLA-cost-analysis HBM
roofline but cannot say where the remaining ~12% goes. This script takes ONE
`jax.profiler` trace of the jitted step (the same flagship config bench.py
times), parses the xplane protobuf directly (tensorflow.tsl xplane_pb2 — no
tensorboard UI needed on a headless box), and prints the top device ops with
their share of step time, grouped into components:

  conv / matmul    -> MXU work (fwd+bwd convolutions, attention einsums)
  groupnorm stats  -> the two-pass GN reductions (fused into neighbors where
                      XLA can; the residual shows up as 'reduce' fusions)
  optimizer tail   -> adamw moment walk + EMA + global-norm clip (fp32 master
                      reads/writes, 8.4 GB of the 41.8 GB step traffic)
  degrade          -> mask generation (sort or pallas kmask) + mean fills
  copies/layout    -> XLA-inserted copies, transposes, reshapes: pure
                      overhead, candidate for elimination

Usage (TPU, serialize with other TPU jobs):
  python benchmarks/trace_train.py              # flagship 64x64 batch 64
  PROF_STEPS=10 PROF_BATCH=64 python benchmarks/trace_train.py
  PROF_SELECT=indexing PROF_SCHEDULE=log python benchmarks/trace_train.py

Prints one JSON document: per-op table (top 25), per-component rollup, and
the measured-vs-roofline position. Companion numbers land in
docs/PERFORMANCE.md ("Trace attribution").
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROF_FORCE_CPU"):  # plumbing test: tiny shapes, CPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- xplane IO


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def device_op_durations(xspace) -> tuple[dict[str, float], float]:
    """Per-op device time (ms) and total module (whole-executable) time.

    Returns (op_totals, module_total_ms). A TPU device plane
    ('/device:TPU:N') carries SEVERAL lines over the same wall interval —
    'XLA Modules' (one event per executable invocation), 'XLA Ops' (leaf
    ops), 'Steps' (step-number markers), sometimes 'XLA TraceMe'. Summing
    every line double-counts each op and lets step-number events (named
    just '24') dominate — the r4 first cut did exactly that
    (docs/results_r4/trace.json: conv 111 ms inside a 51 ms step). Only
    'XLA Ops' events are op attribution; 'XLA Modules' is the ground-truth
    per-invocation device time the ops must add up to.

    On the CPU backend (plumbing tests) XLA ops ride 'tf_XLA'-prefixed host
    lines and there is no Modules line; accept those, return module total 0.
    """
    totals: dict[str, float] = defaultdict(float)
    module_ms = 0.0
    for plane in xspace.planes:
        name = plane.name
        is_device = name.startswith("/device:")
        is_cpu_xla = name == "/host:CPU"  # CPU backend: XLA ops ride host lines
        if not (is_device or is_cpu_xla):
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if is_device and line.name == "XLA Modules":
                module_ms += sum(ev.duration_ps / 1e9 for ev in line.events)
                continue
            if is_device and line.name != "XLA Ops":
                continue  # Steps / TraceMe lines re-cover the same interval
            if is_cpu_xla and not line.name.startswith("tf_XLA"):
                continue  # skip the python/runtime threads on the host plane
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                if meta is None or meta.name.startswith("ThunkExecutor"):
                    continue  # executor wrappers, not ops (CPU backend)
                totals[meta.name] += ev.duration_ps / 1e9  # ps -> ms
    return dict(totals), module_ms


# ------------------------------------------------------------- attribution

_COMPONENT_RULES = [
    # order matters: first match wins. Matched against the leading HLO
    # identifier only ("%convert_reduce_fusion.4 = ..." -> the identifier
    # "convert_reduce_fusion") — matching the whole HLO line let "convert"
    # satisfy /conv/ and put GN-stats reduces in the conv bucket (r4 first
    # cut). NOTE most TPU leaf events are "fusion.N" whose kind is not in
    # the name; deep per-op attribution needs the HLO module mapping —
    # the 'fusion/other' bucket is honest, not lazy.
    ("optimizer/ema", re.compile(r"adam|ema|clip|global_norm|multi_steps", re.I)),
    ("degrade/masks", re.compile(r"sort|kmask|degrade|threshold_count|iota", re.I)),
    ("attention", re.compile(r"attn|attention|softmax|flash", re.I)),
    ("conv/matmul", re.compile(r"convolution|^dot\b|dot\.|matmul|einsum", re.I)),
    ("norm/stats", re.compile(r"group_norm|groupnorm|norm|variance|reduce", re.I)),
    ("copies/layout", re.compile(
        r"^(copy|transpose|reshape|bitcast|pad|slice|dynamic-slice|"
        r"dynamic-update-slice|convert)", re.I)),
    ("collectives", re.compile(r"all-reduce|all-gather|reduce-scatter|psum", re.I)),
]


def component_of(op_name: str) -> str:
    ident = op_name.lstrip("%").split(" ", 1)[0].split("=", 1)[0]
    for comp, rx in _COMPONENT_RULES:
        if rx.search(ident):
            return comp
    if ident.startswith(("fusion", "loop_fusion", "input_fusion", "while")):
        return "fusion/other"
    return "other"


# ---------------------------------------------------------------- the step


def main() -> int:
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.train import (
        build_lr_schedule,
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    batch = int(os.environ.get("PROF_BATCH", 64))
    size = int(os.environ.get("PROF_DATA_SIZE", 64))
    n_steps = int(os.environ.get("PROF_STEPS", 8))
    select = os.environ.get("PROF_SELECT", "thresholding")
    schedule_name = os.environ.get("PROF_SCHEDULE", "linear")

    cfg = Config(
        method="mean_shift", data_size=size, ddpm_schedule=schedule_name,
        ddpm_num_steps=1000, select_degrade_pixel=select,
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="1-d_constant",
        momentum_adaptive="base_momentum",
        sampling_mask_dependency="independent",
        mixed_precision="bf16", batch_size=batch, use_ema=True,
    )
    schedule = build_schedule(schedule_name, 1000, size, select)
    used = schedule.timesteps_for_epoch(0, 10, scale=1)
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, dtype=jnp.bfloat16)
    lr = build_lr_schedule("cosine", 1e-4, 0, 1000)
    tx = build_optimizer("adamw", lr, 1.0)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch, size, size, 3), tx
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (batch, size, size, 3)),
        jnp.float32,
    )

    step_fn = make_train_step(model, schedule, cfg, tx, used, lr, donate=False)
    compiled = jax.jit(step_fn).lower(state, x, jax.random.PRNGKey(1)).compile()
    ca = compiled.cost_analysis()
    gbytes = float(ca.get("bytes accessed", 0.0)) / 1e9
    roofline_ms = gbytes / 819.0 * 1e3

    state, _ = compiled(state, x, jax.random.PRNGKey(2))  # warm
    jax.block_until_ready(state.params)

    # wall clock WITHOUT the profiler: tracing over the tunneled backend
    # inflates dispatch by 40x+ (r4 first cut: 2430 ms/step traced vs the
    # ~57 ms bench number), so the roofline position is measured untraced
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = compiled(state, x, jax.random.PRNGKey(100 + i))
    _ = float(jnp.sum(metrics["train_loss"]))  # scalar fetch = true sync
    wall_ms = (time.perf_counter() - t0) / n_steps * 1e3

    trace_dir = os.environ.get("PROF_TRACE_DIR") or tempfile.mkdtemp(
        prefix="mdt_trace_"
    )
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            state, metrics = compiled(state, x, jax.random.PRNGKey(3 + i))
        _ = float(jnp.sum(metrics["train_loss"]))  # scalar fetch = true sync

    ops, module_ms = device_op_durations(load_xspace(trace_dir))
    per_step = {k: v / n_steps for k, v in ops.items()}
    dev_total = sum(per_step.values())
    module_per_step = module_ms / n_steps

    comps: dict[str, float] = defaultdict(float)
    for name, ms in per_step.items():
        comps[component_of(name)] += ms

    top = sorted(per_step.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({
        "backend": jax.default_backend(),
        "batch": batch, "data_size": size, "n_steps": n_steps,
        "select": select, "schedule": schedule_name,
        "wall_ms_per_step": round(wall_ms, 2),
        # whole-executable device occupancy (XLA Modules line) — the number
        # the roofline position is judged against; ops_ms should cover it
        "device_ms_per_step": round(module_per_step, 2),
        "ops_ms_per_step": round(dev_total, 2),
        "hbm_roofline_ms_at_819GBs": round(roofline_ms, 2),
        "pct_of_roofline_wall": round(100 * roofline_ms / wall_ms, 1),
        "pct_of_roofline_device": (
            round(100 * roofline_ms / module_per_step, 1)
            if module_per_step else None
        ),
        "host_dispatch_gap_ms": round(wall_ms - module_per_step, 2),
        "components_ms": {
            k: round(v, 3) for k, v in
            sorted(comps.items(), key=lambda kv: -kv[1])
        },
        "top_ops_ms": [
            {"op": name[:120], "ms": round(ms, 3),
             "pct": round(100 * ms / dev_total, 1) if dev_total else 0.0}
            for name, ms in top
        ],
        "trace_dir": trace_dir,
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
