"""Measured verdicts for the round-3 Pallas candidates (run on the TPU).

A: fused degrade+update kernel (ops/pallas/fused_degrade.py) vs the XLA
   degrade pair + update, standalone and inside the full sampling scan, for
   the headline mode (linear/thresholding) and the reference-default mode
   (log/indexing).
B: stock Pallas flash attention vs the materialized-scores einsum at this
   family's attention shapes (flagship mid/up blocks at 64**2, and the
   unet6 zoo placements at 128**2 / 256**2).

Prints one JSON line per measurement; paste results into
docs/PERFORMANCE.md "pallas verdicts".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=100):
    """Amortized timing over n pipelined calls, drained by a scalar fetch.

    Per CLAUDE.md: over the axon tunnel block_until_ready on a pipelined
    burst under-reports (it returns from streamed ready notifications, not a
    device round trip) — the ground truth is a scalar fetch that depends on
    the last result, amortized over >=100 calls so the one real RTT is noise.
    """
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # compile + true sync
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args)
        if (i + 1) % 10 == 0:  # cap in-flight work: 100 queued programs OOM
            jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / n


def bench_fused_standalone(size=64, batch=64, select="thresholding"):
    from masked_diffusion_tpu.ops import degrade as degrade_ops
    from masked_diffusion_tpu.ops.pallas.fused_degrade import fused_degrade_update

    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32)
    if select == "thresholding":
        amt = jnp.full((batch,), 0.6, jnp.float32)
        amn = jnp.full((batch,), 0.55, jnp.float32)
    else:
        amt = jnp.full((batch,), size * size // 2, jnp.float32)
        amn = jnp.full((batch,), size * size // 2 - 17, jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def xla_pair_update(k, s_t, s_0, a_t, a_n):
        k1, k2 = jax.random.split(k)
        d_t, _, _ = degrade_ops.degrade_independent_base_sampling(
            k1, s_0, a_t, select, "1-channel", "degraded_area", "image-wise")
        d_n, m_n, _ = degrade_ops.degrade_independent_base_sampling(
            k2, s_0, a_n, select, "1-channel", "degraded_area", "image-wise")
        return s_t - d_t + d_n, m_n

    def fused(k, s_t, s_0, a_t, a_n):
        return fused_degrade_update(
            k, s_t, s_0, a_t, a_n, select=select,
            mean_mode="degraded_area", rule="base_momentum")

    t_xla = timeit(xla_pair_update, key, xt, x0, amt, amn)
    t_fused = timeit(fused, key, xt, x0, amt, amn)
    print(json.dumps({
        "bench": "fused_degrade_standalone", "size": size, "batch": batch,
        "select": select, "xla_ms": round(t_xla * 1e3, 3),
        "fused_ms": round(t_fused * 1e3, 3),
    }), flush=True)


def bench_fused_inloop(size=64, batch=64, schedule="linear",
                       select="thresholding", steps=200):
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample import make_sample_fn

    cfg = Config(
        method="mean_shift", data_size=size, ddpm_schedule=schedule,
        ddpm_num_steps=steps, select_degrade_pixel=select,
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="1-d_constant",
        momentum_adaptive="base_momentum",
        sampling_mask_dependency="independent", mixed_precision="bf16",
    )
    sched = build_schedule(schedule, steps, size, select)
    used = sched.timesteps_for_epoch(0, 10, 1)
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((1,)))
    latent = jnp.full((batch, size, size, 3), 0.1, jnp.float32)

    out = {}
    for arm, env in (("xla", "0"), ("fused", "1")):
        os.environ["MDT_PALLAS_FUSED"] = env
        fn = make_sample_fn(model, sched, cfg, used)
        t = timeit(fn, params, latent, jax.random.PRNGKey(1), n=3)
        out[f"{arm}_ms_per_step"] = round(t / len(used) * 1e3, 3)
    os.environ.pop("MDT_PALLAS_FUSED", None)
    print(json.dumps({
        "bench": "fused_degrade_inloop", "size": size, "batch": batch,
        "schedule": schedule, "select": select, "steps": int(len(used)),
        **out,
    }), flush=True)


def bench_attention_scan():
    """Unambiguous attention timing: one lax.scan of 100 AttentionBlock
    forwards per arm — a single compiled program, so per-step time is
    total/100 with no per-call dispatch ambiguity over the tunnel."""
    from masked_diffusion_tpu.models.unet import AttentionBlock

    shapes = [
        (64, 16, 512),  # zoo 128**2 deep placement: S=256
        (8, 32, 512),   # zoo 256**2 placement: S=1024
        (4, 64, 256),   # S=4096 stress (einsum failed to compile standalone)
    ]
    for b, s, c in shapes:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(b, s, s, c)), jnp.bfloat16
        )
        res = {}
        arms = [
            ("einsum", dict(flash=False)),
            ("flash", dict(flash=True)),
            # chunked: the pure-XLA large-S path (exact attention over query
            # blocks, models/unet.py AttentionBlock.chunk_q) — the contender
            # against flash where the full scores don't fit
            ("chunk512", dict(chunk_q=512)),
            # tinyhead: head-major flash for the family's 8-wide heads
            # (ops/pallas/tinyhead_attention.py): VMEM scores, no lane pad
            ("tinyhead", dict(tiny_flash=True)),
        ]
        for arm, kw in arms:
            blk = AttentionBlock(dtype=jnp.bfloat16, **kw)
            try:
                p = blk.init(jax.random.PRNGKey(0), x)

                @jax.jit
                def run(pp, xx):
                    def body(h, _):
                        return blk.apply(pp, h).astype(jnp.bfloat16), None

                    out, _ = jax.lax.scan(body, xx, None, length=100)
                    return out

                run(p, x)
                float(jnp.sum(run(p, x)))  # sync
                t0 = time.perf_counter()
                float(jnp.sum(run(p, x)))
                res[f"{arm}_ms"] = round((time.perf_counter() - t0) / 100 * 1e3, 3)
            except Exception as e:
                res[f"{arm}_ms"] = f"FAIL: {type(e).__name__}: {str(e)[:100]}"
        print(json.dumps({
            "bench": "attention_scan", "batch": b, "tokens": s * s,
            "channels": c, **res,
        }), flush=True)


def bench_attention_4k():
    """S=4096 escape-hatch ranking, one arm per PROCESS: a RESOURCE_EXHAUSTED
    from the (expected-to-fail) einsum arm poisons every later allocation in
    the same client (measured r4: all four arms FAIL together), so each arm
    gets a fresh TPU client. Serialized with an HBM-release sleep between."""
    import subprocess

    arm = os.environ.get("ATTN_ARM")
    if arm:  # child: run exactly this arm inline
        from masked_diffusion_tpu.models.unet import AttentionBlock

        b, s, c = 4, 64, 256
        kw = {
            "einsum": dict(flash=False),
            "flash": dict(flash=True),
            "chunk512": dict(chunk_q=512),
            "tinyhead": dict(tiny_flash=True),
        }[arm]
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(b, s, s, c)), jnp.bfloat16
        )
        blk = AttentionBlock(dtype=jnp.bfloat16, **kw)
        try:
            p = blk.init(jax.random.PRNGKey(0), x)

            @jax.jit
            def run(pp, xx):
                def body(h, _):
                    return blk.apply(pp, h).astype(jnp.bfloat16), None

                out, _ = jax.lax.scan(body, xx, None, length=20)
                return out

            float(jnp.sum(run(p, x)))  # compile + sync
            t0 = time.perf_counter()
            float(jnp.sum(run(p, x)))
            ms = round((time.perf_counter() - t0) / 20 * 1e3, 3)
        except Exception as e:
            ms = f"FAIL: {type(e).__name__}: {str(e)[:100]}"
        print(json.dumps({
            "bench": "attention_4k", "batch": b, "tokens": s * s,
            "channels": c, f"{arm}_ms": ms,
        }), flush=True)
        return

    # tinyhead/chunk512 first (the rows PERFORMANCE.md is missing), the
    # expected-to-fail einsum last; a per-arm TimeoutExpired is itself a
    # verdict and must not kill the remaining arms (r4: the first child's
    # 600 s timeout propagated and the whole section died with one line)
    for a, arm_timeout in (
        ("tinyhead", 420), ("chunk512", 420), ("flash", 420), ("einsum", 300)
    ):
        env = dict(os.environ, CHECK="attn4k", ATTN_ARM=a)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=arm_timeout, capture_output=True, text=True,
            )
            out = (r.stdout or "").strip().splitlines()
            line = out[-1] if out else json.dumps(
                {"bench": "attention_4k",
                 f"{a}_ms": f"NO-OUTPUT rc={r.returncode}"}
            )
        except subprocess.TimeoutExpired:
            line = json.dumps(
                {"bench": "attention_4k", f"{a}_ms": f"TIMEOUT>{arm_timeout}s"}
            )
            time.sleep(12)  # the killed child's HBM takes longer to release
        print(line, flush=True)
        time.sleep(8)  # HBM release before the next client


def bench_flash_attention():
    """Attention shapes actually reached by this family:
    - flagship 64**2 num_attention=1: mid 2x2@512 (S=4, skip), down level 4
      4x4@512 -> S=16, up deepest 4x4 -> S=16 ... too small to matter; the
      interesting shapes are the zoo unet6 tables: 128**2 attn at 16**2@512
      (S=256) and 32**2@256 (S=1024), 256**2 attn at 32**2 (S=1024) and the
      hypothetical shallow placement S=4096.
    Measured as one AttentionBlock forward, batch sized to the zoo smokes.
    """
    from masked_diffusion_tpu.models.unet import AttentionBlock

    shapes = [
        (64, 16, 512),   # zoo-ish deep level
        (8, 32, 512),    # 128**2 smoke batch 8, 32**2 tokens
        (8, 64, 256),    # S=4096
        (4, 64, 512),    # 256**2 smoke batch 4 at 64**2@512 -> S=4096
    ]
    for b, s, c in shapes:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(b, s, s, c)), jnp.bfloat16
        )
        res = {}
        for arm, flash in (("einsum", False), ("flash", True)):
            blk = AttentionBlock(flash=flash, dtype=jnp.bfloat16)
            try:
                p = blk.init(jax.random.PRNGKey(0), x)
                fn = jax.jit(lambda pp, xx: blk.apply(pp, xx))
                res[f"{arm}_ms"] = round(timeit(fn, p, x) * 1e3, 3)
            except Exception as e:  # kernel constraint failures are a verdict
                res[f"{arm}_ms"] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({
            "bench": "attention", "batch": b, "tokens": s * s, "channels": c,
            **res,
        }), flush=True)


def bench_groupnorm_scan():
    """Fused multi-image GroupNorm+SiLU kernel vs the XLA two-pass reference
    at the flagship forward's hottest norm shapes (one lax.scan of 100
    applications per arm — single compiled program, no dispatch ambiguity).
    Round 3's per-image version lost ~2x; round 4 batches up to 8 images per
    grid cell (_images_per_block). Paste into docs/PERFORMANCE.md."""
    from masked_diffusion_tpu.ops.pallas.groupnorm import (
        _gn_reference,
        group_norm_silu,
    )

    shapes = [
        (64, 64, 128),   # level-0 resblock norms: the traffic monster
        (64, 32, 256),   # level 2
        (64, 16, 512),   # level 4 (attention level)
        (8, 128, 128),   # 128**2 smoke shape
    ]
    for b, s, c in shapes:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(b, s, s, c)), jnp.bfloat16
        )
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        res = {}
        for arm, fn in (
            ("xla", lambda h: _gn_reference(h, scale, bias, 32, 1e-5, True)),
            ("fused", lambda h: group_norm_silu(h, scale, bias, 32, 1e-5, True)),
        ):
            try:
                @jax.jit
                def run(xx, fn=fn):
                    def body(h, _):
                        return fn(h).astype(jnp.bfloat16), None

                    out, _ = jax.lax.scan(body, xx, None, length=100)
                    return out

                float(jnp.sum(run(x)))  # compile + sync
                t0 = time.perf_counter()
                float(jnp.sum(run(x)))
                res[f"{arm}_ms"] = round((time.perf_counter() - t0) / 100 * 1e3, 3)
            except Exception as e:
                res[f"{arm}_ms"] = f"FAIL: {type(e).__name__}: {str(e)[:100]}"
        print(json.dumps({
            "bench": "groupnorm_scan", "batch": b, "hw": s * s, "channels": c,
            **res,
        }), flush=True)


def bench_tinyhead_inloop(size=128, batch=8, steps=200):
    """End-to-end effect of the tinyhead auto-on: the full sampling scan on
    the zoo unet6 table at 128² (attention at S=256/1024 — the shapes where
    the kernel measured 2.4-2.5x standalone; the flagship 64² family only
    has S<=16 attention, which the kernel's gate skips). Arms: MDT_TINYHEAD
    forced 0 (einsum) vs 1 (kernel), same model/params/latent."""
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models.zoo import Model
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample import make_sample_fn

    cfg = Config(
        method="mean_shift", data_size=size, ddpm_schedule="linear",
        ddpm_num_steps=steps, select_degrade_pixel="thresholding",
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="1-d_constant",
        momentum_adaptive="base_momentum",
        sampling_mask_dependency="independent", mixed_precision="bf16",
    )
    sched = build_schedule("linear", steps, size, "thresholding")
    used = sched.timesteps_for_epoch(0, 10, 1)
    model = Model("unet6", 3, size, size, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((1,)))
    latent = jnp.full((batch, size, size, 3), 0.1, jnp.float32)

    out = {}
    try:
        for arm, env in (("einsum", "0"), ("tinyhead", "1")):
            os.environ["MDT_TINYHEAD"] = env
            fn = make_sample_fn(model, sched, cfg, used)
            t = timeit(fn, params, latent, jax.random.PRNGKey(1), n=3)
            out[f"{arm}_ms_per_step"] = round(t / len(used) * 1e3, 3)
    finally:
        os.environ.pop("MDT_TINYHEAD", None)
    print(json.dumps({
        "bench": "tinyhead_inloop", "model": "unet6", "size": size,
        "batch": batch, "steps": int(len(used)), **out,
    }), flush=True)


def bench_encoder_reuse(size=64, batch=64, steps=200):
    """--encoder_reuse throughput + drift at the headline sampling config:
    ms/step for K in {exact, 2, 3} plus mean|exact - K| over the final
    samples (a perturbed model — the zero-init residual would make drift
    trivially 0). Paste into docs/PERFORMANCE.md "encoder reuse"."""
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample import make_sample_fn

    def cfg_k(k):
        return Config(
            method="mean_shift", data_size=size, ddpm_schedule="linear",
            ddpm_num_steps=steps, select_degrade_pixel="thresholding",
            degrade_channel="1-channel", mean_option="degraded_area",
            mean_area="image-wise", shift_type="1-d_constant",
            momentum_adaptive="base_momentum",
            sampling_mask_dependency="independent", mixed_precision="bf16",
            encoder_reuse=k,
        )

    sched = build_schedule("linear", steps, size, "thresholding")
    used = sched.timesteps_for_epoch(0, 10, 1)
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((1,)))
    # perturb per-tensor-scaled (a uniform +0.02 on every param — incl. norm
    # scales through 6 levels — blows the forward up to NaN; measured r4)
    leaves, treedef = jax.tree.flatten(params)
    pkeys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        l + 0.05 * (jnp.std(l) + 1e-3) * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, pkeys)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    latent = jnp.full((batch, size, size, 3), 0.1, jnp.float32)

    out = {}
    exact_sample = None
    for arm, k in (("exact", 0), ("reuse2", 2), ("reuse3", 3)):
        fn = make_sample_fn(model, sched, cfg_k(k), used)
        s = fn(params, latent, jax.random.PRNGKey(1))
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        s = fn(params, latent, jax.random.PRNGKey(1))
        float(jnp.sum(s))
        out[f"{arm}_ms_per_step"] = round(
            (time.perf_counter() - t0) / len(used) * 1e3, 3)
        if exact_sample is None:
            exact_sample = s
        else:
            drift = float(jnp.mean(jnp.abs(s - exact_sample)))
            out[f"{arm}_mean_abs_drift"] = (
                round(drift, 5) if np.isfinite(drift) else "NON-FINITE"
            )
    print(json.dumps({
        "bench": "encoder_reuse_inloop", "size": size, "batch": batch,
        "steps": int(len(used)), **out,
    }), flush=True)


def bench_feed(size=64, batch=64, n_data=1024, epochs=4):
    """Host-fed vs device-resident batch feeding through the REAL Trainer
    epoch loop (trainer._use_device_data): steps/s at the flagship training
    shape. The device path replaces the per-step ~3 MB host push over the
    28 ms-RTT tunnel with a 64-int index transfer + on-device gather.
    Epoch 1 pays the compile; epochs 2+ are timed."""
    import numpy as np

    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.data.datasets import InMemoryDataset, make_synthetic
    from masked_diffusion_tpu.train.trainer import Trainer

    data, labels = make_synthetic(n_data, size, seed=0, channels=3)
    out = {}
    try:
        for arm, env in (("host_fed", "0"), ("device_resident", "1")):
            os.environ["MDT_DEVICE_DATA"] = env
            cfg = Config(
                method="mean_shift", data_name="synthetic", data_size=size,
                batch_size=batch, num_epochs=epochs, ddpm_schedule="linear",
                ddpm_num_steps=200, select_degrade_pixel="thresholding",
                degrade_channel="1-channel", mean_option="degraded_area",
                mean_area="image-wise", shift_type="1-d_constant",
                mixed_precision="bf16", use_ema=True, use_wandb=False,
                lr=1e-4, lr_scheduler="constant", lr_warmup_steps=0,
                save_images_epochs=10**9,  # no cadence work inside the timing
            )
            trainer = Trainer(cfg, InMemoryDataset(data, labels))
            # train one epoch at a time so the compile epoch is separable
            trainer.train(0, 1)  # compile + warm
            t0 = time.perf_counter()
            # train() bounds are range(first_epoch, num_epochs) — the second
            # arg is the TOTAL epoch count, so this runs epochs-1 epochs
            trainer.train(1, epochs)
            elapsed = time.perf_counter() - t0
            steps = (n_data // batch) * (epochs - 1)
            out[f"{arm}_steps_per_sec"] = round(steps / elapsed, 3)
            # per-arm emission: the first r4 run wedged in the second arm's
            # compile and the single end-of-bench print lost BOTH arms
            print(json.dumps({
                "bench": "feed_path", "size": size, "batch": batch,
                "n_data": n_data, "arm": arm,
                "steps_per_sec": out[f"{arm}_steps_per_sec"],
            }), flush=True)
    finally:
        # never leak the forced feed mode into later CHECK sections
        os.environ.pop("MDT_DEVICE_DATA", None)
    print(json.dumps({
        "bench": "feed_path", "size": size, "batch": batch, "n_data": n_data,
        **out,
    }), flush=True)


def bench_epoch_scan(size=64, batch=64, n_data=1024, epochs=4):
    """Per-step loop vs whole-epoch lax.scan through the REAL Trainer
    (trainer._use_epoch_scan -> train/step.py:make_train_epoch), both on the
    device-resident feed: steps/s at the flagship training shape. The scan
    removes the per-step host dispatch the r4 trace showed sitting between
    roofline-saturated device steps. Epoch 1 pays the compile; 2+ timed."""
    import numpy as np

    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.data.datasets import InMemoryDataset, make_synthetic
    from masked_diffusion_tpu.train.trainer import Trainer

    data, labels = make_synthetic(n_data, size, seed=0, channels=3)
    try:
        os.environ["MDT_DEVICE_DATA"] = "1"
        for arm, env in (("step_loop", "0"), ("epoch_scan", "1")):
            os.environ["MDT_EPOCH_SCAN"] = env
            cfg = Config(
                method="mean_shift", data_name="synthetic", data_size=size,
                batch_size=batch, num_epochs=epochs, ddpm_schedule="linear",
                ddpm_num_steps=200, select_degrade_pixel="thresholding",
                degrade_channel="1-channel", mean_option="degraded_area",
                mean_area="image-wise", shift_type="1-d_constant",
                mixed_precision="bf16", use_ema=True, use_wandb=False,
                lr=1e-4, lr_scheduler="constant", lr_warmup_steps=0,
                save_images_epochs=10**9,
            )
            trainer = Trainer(cfg, InMemoryDataset(data, labels))
            trainer.train(0, 1)  # compile + warm
            t0 = time.perf_counter()
            trainer.train(1, epochs)  # total-epoch semantics: epochs-1 more
            elapsed = time.perf_counter() - t0
            steps = (n_data // batch) * (epochs - 1)
            print(json.dumps({
                "bench": "epoch_scan", "size": size, "batch": batch,
                "n_data": n_data, "arm": arm,
                "steps_per_sec": round(steps / elapsed, 3),
            }), flush=True)
    finally:
        os.environ.pop("MDT_EPOCH_SCAN", None)
        os.environ.pop("MDT_DEVICE_DATA", None)


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    which = os.environ.get("CHECK", "all")
    if which == "feed":
        bench_feed()
    if which == "scan":
        bench_epoch_scan()
    if which == "reuse":
        bench_encoder_reuse()
    if which == "gn":
        bench_groupnorm_scan()
    if which in ("all", "standalone"):
        bench_fused_standalone(select="thresholding")
        bench_fused_standalone(select="indexing")
    if which in ("all", "attn"):
        bench_attention_scan()
    if which == "attn4k":
        bench_attention_4k()
    if which == "attn_inloop":
        bench_tinyhead_inloop()
    if which in ("all", "inloop"):
        bench_fused_inloop(schedule="linear", select="thresholding")
        bench_fused_inloop(schedule="log", select="indexing", steps=1000)
    if which == "inloop_large":
        # 128²/256² indexing: the fused kernel vs the production XLA path
        # (which auto-uses the kmask kernel at these sizes, hw >= 16384)
        bench_fused_inloop(size=128, batch=8, schedule="log",
                           select="indexing", steps=1000)
        bench_fused_inloop(size=256, batch=4, schedule="log",
                           select="indexing", steps=1000)


if __name__ == "__main__":
    main()
