"""Pallas TPU kernel: fused per-step sampling degradation + update rule.

The reverse-loop body degrades x_0 twice per step (at t and t-1) and applies
the cold-diffusion update (sampler.py:167-216). On the XLA path that is, per
degrade: a threefry uniform draw, a mask compare (or an exact-k sort), a
masked mean reduction, and the fill — each materializing (B,H,W,C)
intermediates between fusion boundaries, with the threefry bit generation
alone costing a visible slice of the ~2.2 ms/step of non-UNet work at 64²
(docs/PERFORMANCE.md roofline table: 14.0 ms measured vs 11.8 ms forward
floor).

This kernel does the whole thing in ONE pass over VMEM-resident blocks of 8
images, with random bits from the on-chip PRNG (nearly free vs threefry):

    bits_t, bits_n  <- hardware PRNG            (2 draws per image)
    mask_t, mask_n  <- threshold (u > ratio) or exact-k bit-scan
    mu_t,  mu_n     <- masked mean over degraded pixels (image-wise) / const
    D_t,   D_n      <- m*x0 + (1-m)*mu
    out             <- sample_t - D_t + D_n     (base_momentum)
                       D_n                      (base_sampling)

Covered modes (the bench headline linear/thresholding and the
reference-default log/indexing, both with mean_option degraded_area
image-wise or const, 1-channel masks, independent dependency): everything
else falls back to the XLA path in sample/loop.py. Masks are
distribution-identical but not stream-equal to the jax.random path (same
caveat as ops/pallas/kmask.py; runs remain seed-deterministic per backend).
Indexing keeps the EXACT-k degraded-count contract including tied draws —
exact_k_degrade makes the scan keys unique by splicing the lane index into
the low bits (the bare bit-scan threshold alone would under-degrade by the
tie deficit, ~hw²/2³³ per image-step; a post-hoc cumsum correction has no
Mosaic lowering).

Layout: images enter as (B, C*HW) rows in channel-major order
(NHWC -> transpose to NCHW -> reshape), so a block of 8 images fills all 8
sublanes and the mask expands across channels by lane-concatenation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8  # images per grid step (full sublane occupancy)


def fused_supported(b: int, h: int, w: int, c: int) -> bool:
    """Shapes the kernel can lower: a block of _G images must fit the VMEM
    budget (~4 MB of f32 image rows; 256²x3 at 6.3 MB exceeds it — and the
    XLA+kmask path is the measured winner there anyway,
    docs/PERFORMANCE.md). Mosaic rejects sublane blocks of 1 outright
    (group=1 "fallback" never lowered on real TPUs), so sub-_G batches are
    handled by row padding in fused_degrade_update, not smaller groups."""
    return h * w * c * 4 * _G <= 4 * 1024 * 1024


def rowwise_kth_threshold(bits, k):
    """Per-row maximum uint32 T with count(row < T) <= k[row] — the greedy
    MSB-first scan of ops/pallas/kmask.py:greedy_kth_threshold, vectorized
    over rows. bits: (R, N) uint32, k: (R, 1) int32. Returns (R, 1) uint32.

    When draws TIE at the boundary value T, count(row < T) < k: thresholding
    on `< T` alone under-degrades by the tie deficit (~N²/2³³ per row expected
    — rare but nonzero). exact_k_degrade below de-duplicates the keys up
    front; use that for the exact-k contract."""

    def bit_step(b, t):
        cand = t | (jnp.uint32(1) << (31 - b))
        cnt = jnp.sum((bits < cand).astype(jnp.int32), axis=1, keepdims=True)
        return jnp.where(cnt <= k, cand, t)

    return jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((bits.shape[0], 1), jnp.uint32)
    )


def exact_k_degrade(bits, k):
    """Per-row boolean degrade-set of EXACTLY k[row] pixels: the k smallest
    draws, boundary ties broken by lane order (the same law as
    ops/degrade.py:masks_from_uniforms' cumsum tie correction, advisor r03).

    Ties are removed up FRONT instead of corrected after: the low
    ceil(log2(N)) bits of every draw are overwritten with the lane index, so
    composite keys are unique per row and one greedy 32-pass scan selects
    exactly k — no cumsum pass (Mosaic has no cumsum lowering for the TC
    kernel type; a post-hoc cumsum correction crashed the r4 TPU bench).
    Cost: zero extra passes. Distribution: "k smallest by (top
    32-log2(N) random bits, lane order)" — groups tied in their top bits
    break toward low lanes, a per-pixel inclusion bias of O(2^-(32-log2 N))
    (~2^-20 at 64²), far below the already-documented PRNG-stream deviation
    from the XLA path and the same lane-order law its tie-break applies.

    bits: (R, N) uint32, k: (R, 1) int32 in [0, N]. Returns (R, N) bool.
    """
    n = bits.shape[1]
    lane_bits = max(1, (n - 1).bit_length())
    hi = jnp.uint32((0xFFFFFFFF << lane_bits) & 0xFFFFFFFF)
    lane = jax.lax.broadcasted_iota(jnp.int32, bits.shape, 1).astype(jnp.uint32)
    keys = (bits & hi) | lane
    thr = rowwise_kth_threshold(keys, k)
    # strict `< thr` can never select a key equal to the max uint32, so
    # k == N (the schedule's forced last step degrades EVERY pixel,
    # scheduler.py:55) is handled explicitly
    return (keys < thr) | (k >= n)


def fused_rows(
    bits_t,
    bits_n,
    sample_t,
    sample_0,
    amount_t,
    amount_next,
    *,
    channels: int,
    select: str,
    mean_mode: str,
    mean_value: float,
    rule: str,
):
    """Pure-jnp row math shared by the kernel body and the CPU exactness
    tests (the TPU interpreter stubs the PRNG, so tests inject bits).

    bits_*: (R, HW) uint32; sample_*: (R, C*HW) f32 channel-major;
    amount_*: (R, 1) f32 (ratios for thresholding, counts for indexing).
    Returns (out, mask_n) with mask_n the (R, HW) keep-mask at t-1 (carried
    for parity with the XLA path's trajectory contract).
    """
    if select == "thresholding":
        # u > ratio keeps the pixel (ops/degrade.py:threshold_masks). Mosaic
        # has no uint32->f32 cast; take the top 24 bits (mantissa-exact in
        # f32) through an int32 cast instead — u uniform on [0, 1) at 2^-24
        # resolution
        inv24 = jnp.float32(1.0 / 16777216.0)
        u_t = (bits_t >> 8).astype(jnp.int32).astype(jnp.float32) * inv24
        u_n = (bits_n >> 8).astype(jnp.int32).astype(jnp.float32) * inv24
        keep_t = u_t > amount_t
        keep_n = u_n > amount_next
    elif select == "indexing":
        kt = amount_t.astype(jnp.int32)
        kn = amount_next.astype(jnp.int32)
        keep_t = ~exact_k_degrade(bits_t, kt)
        keep_n = ~exact_k_degrade(bits_n, kn)
    else:  # pragma: no cover - guarded by the dispatcher
        raise ValueError(select)

    mask_t = keep_t.astype(jnp.float32)
    mask_n = keep_n.astype(jnp.float32)
    # expand the shared 1-channel mask across channel-major lanes
    m_t = jnp.concatenate([mask_t] * channels, axis=1) if channels > 1 else mask_t
    m_n = jnp.concatenate([mask_n] * channels, axis=1) if channels > 1 else mask_n

    def mean_of(mask_full):
        if mean_mode == "const":
            return jnp.float32(mean_value)
        inv = 1.0 - mask_full
        s = jnp.sum(sample_0 * inv, axis=1, keepdims=True)
        cnt = jnp.sum(inv, axis=1, keepdims=True)
        return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)

    mu_t = mean_of(m_t)
    mu_n = mean_of(m_n)
    d_t = m_t * sample_0 + (1.0 - m_t) * mu_t
    d_n = m_n * sample_0 + (1.0 - m_n) * mu_n
    if rule == "base_momentum":
        out = sample_t - d_t + d_n  # cold diffusion (sampler.py:209-216)
    else:  # base_sampling (sampler.py:199-207)
        out = d_n
    return out, mask_n


def _kernel(
    amt_ref, amn_ref, seed_ref, xt_ref, x0_ref, out_ref, mask_ref, *,
    hw: int, channels: int, group: int, select: str, mean_mode: str,
    mean_value: float, rule: str,
):
    g = pl.program_id(0)
    # libtpu prng_seed accepts at most 2 values; mix the grid index into
    # word 0 (same scheme as ops/pallas/kmask.py)
    mix = g * np.int32(-1640531527)  # 0x9E3779B9 (golden ratio) as i32
    pltpu.prng_seed(seed_ref[0] ^ mix, seed_ref[1])
    bits_t = pltpu.bitcast(pltpu.prng_random_bits((group, hw)), jnp.uint32)
    bits_n = pltpu.bitcast(pltpu.prng_random_bits((group, hw)), jnp.uint32)
    # per-row amounts from the scalar-prefetch refs (static unrolled loop)
    amt = jnp.array(
        [amt_ref[g * group + r] for r in range(group)], jnp.float32
    ).reshape(group, 1)
    amn = jnp.array(
        [amn_ref[g * group + r] for r in range(group)], jnp.float32
    ).reshape(group, 1)
    out, mask_n = fused_rows(
        bits_t, bits_n, xt_ref[...], x0_ref[...], amt, amn,
        channels=channels, select=select, mean_mode=mean_mode,
        mean_value=mean_value, rule=rule,
    )
    out_ref[...] = out
    mask_ref[...] = mask_n


@functools.partial(
    jax.jit, static_argnames=("select", "mean_mode", "mean_value", "rule",
                              "interpret")
)
def fused_degrade_update(
    key,
    sample_t,
    sample_0,
    amount_t,
    amount_next,
    *,
    select: str,
    mean_mode: str,
    mean_value: float = 0.0,
    rule: str = "base_momentum",
    interpret: bool = False,
):
    """Fused degrade(t) + degrade(t-1) + update for the sampling loop.

    sample_t/sample_0: (B, H, W, C) f32 NHWC; amount_*: (B,) schedule
    amounts. Returns (new_sample_t, mask_next) with mask_next (B, H, W, C)
    keep-mask at t-1 (broadcast over channels like generate_masks).

    Batches not divisible by _G are row-padded to the next multiple (Mosaic
    refuses sublane blocks < 8; the padded rows' outputs are sliced off).
    Callers must check fused_supported() first — oversized images raise.
    """
    b, h, w, c = sample_t.shape
    hw = h * w
    if not fused_supported(b, h, w, c):
        raise ValueError(
            f"fused_degrade_update: {h}x{w}x{c} exceeds the VMEM block "
            "budget (fused_supported); use the XLA path"
        )
    group = _G
    b_pad = -(-b // _G) * _G

    # channel-major rows: NHWC -> NCHW -> (B, C*HW)
    xt = sample_t.transpose(0, 3, 1, 2).reshape(b, c * hw).astype(jnp.float32)
    x0 = sample_0.transpose(0, 3, 1, 2).reshape(b, c * hw).astype(jnp.float32)
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0))
        xt = jnp.pad(xt, pad)
        x0 = jnp.pad(x0, pad)
        amount_t = jnp.pad(jnp.asarray(amount_t, jnp.float32).reshape(b),
                           (0, b_pad - b))
        amount_next = jnp.pad(jnp.asarray(amount_next, jnp.float32).reshape(b),
                              (0, b_pad - b))

    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        raw = jax.random.key_data(key)
    else:
        raw = key
    seed = jax.lax.bitcast_convert_type(
        jnp.asarray(raw, dtype=jnp.uint32).reshape(-1)[:2], jnp.int32
    )
    amt = jnp.asarray(amount_t, jnp.float32).reshape(b_pad)
    amn = jnp.asarray(amount_next, jnp.float32).reshape(b_pad)

    out, mask_n = pl.pallas_call(
        functools.partial(
            _kernel, hw=hw, channels=c, group=group, select=select,
            mean_mode=mean_mode, mean_value=mean_value, rule=rule,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # amount_t, amount_next, seed
            grid=(b_pad // group,),
            in_specs=[
                pl.BlockSpec((group, c * hw), lambda i, *_: (i, 0)),
                pl.BlockSpec((group, c * hw), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((group, c * hw), lambda i, *_: (i, 0)),
                pl.BlockSpec((group, hw), lambda i, *_: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c * hw), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, hw), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(amt, amn, seed, xt, x0)

    new_sample_t = out[:b].reshape(b, c, h, w).transpose(0, 2, 3, 1)
    mask_next = jnp.broadcast_to(
        mask_n[:b].reshape(b, h, w, 1), (b, h, w, c)
    )
    return new_sample_t, mask_next


def fused_degrade_update_sharded(
    key,
    sample_t,
    sample_0,
    amount_t,
    amount_next,
    *,
    mesh,
    axis: str = "data",
    select: str,
    mean_mode: str,
    mean_value: float = 0.0,
    rule: str = "base_momentum",
    interpret: bool = False,
):
    """Data-parallel multi-chip form of fused_degrade_update.

    One kernel per 'data' shard over its LOCAL rows with an independent
    per-shard PRNG stream — semantics and caveats live in the shared harness
    (ops/pallas/shard.py:data_parallel_kernel). Per-shard local batches are
    row-padded to the sublane group independently, so any global batch
    divisible by the axis size works.
    """
    from masked_diffusion_tpu.ops.pallas.shard import data_parallel_kernel

    def fn(k, xt, x0, amt, amn):
        return fused_degrade_update(
            k, xt, x0, amt, amn, select=select, mean_mode=mean_mode,
            mean_value=mean_value, rule=rule, interpret=interpret,
        )

    return data_parallel_kernel(fn, mesh=mesh, axis=axis)(
        key, sample_t, sample_0,
        jnp.asarray(amount_t, jnp.float32).reshape(sample_t.shape[0]),
        jnp.asarray(amount_next, jnp.float32).reshape(sample_t.shape[0]),
    )
