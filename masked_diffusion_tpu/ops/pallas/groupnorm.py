"""Pallas TPU kernel: fused GroupNorm(+affine)(+SiLU).

The flagship UNet forward is HBM-bandwidth bound (XLA cost analysis: 1.9
TFLOP vs 9.7 GB accessed per forward at batch 64/64x64 — the roofline is the
byte count). XLA lowers GroupNorm as two passes over the tensor (reduce for
stats, then normalize+activate), i.e. 2 reads + 1 write. This kernel does
1 read + 1 write: a block of up to 8 images ((NB, HW, C), `_images_per_block`)
is staged in VMEM, per-image group stats are computed on-chip (channel sums
via one MXU matmul against a (C, G) one-hot group matrix — lane-dim
reductions are the VPU's weak axis), and the normalize + affine + SiLU
epilogue writes straight back out. Round 3's version ran ONE image per grid
cell and lost to XLA 26.8 vs 14.0 ms/step (per-cell fixed costs serialized
against tiny blocks); the multi-image block is the round-4 retry.

Gradients: jax.custom_vjp with a pure-jnp backward that recomputes stats —
training takes the standard XLA path cost in the backward while the forward
(and the sampling loop, the headline benchmark) gets the fused kernel.

Used by models/unet.py when `UNetConfig.pallas_norm` resolves true (TPU
backend and the per-image block fits the VMEM budget); otherwise the flax
GroupNorm path runs. Numerics match flax GroupNorm to fp32 tolerance
(tests/test_pallas_groupnorm.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-image fp32 staging budget; one (HW, C) block must fit comfortably in
# the ~16MB of VMEM next to the bf16 in/out blocks
_VMEM_BLOCK_BYTES = 8 * 1024 * 1024


def fits_vmem(hw: int, channels: int) -> bool:
    return hw * channels * 4 <= _VMEM_BLOCK_BYTES


def _group_onehot(channels: int, groups: int) -> np.ndarray:
    """(C, G) one-hot map of channel -> group (channels grouped contiguously,
    flax/torch GroupNorm convention)."""
    cg = channels // groups
    m = np.zeros((channels, groups), np.float32)
    for c in range(channels):
        m[c, c // cg] = 1.0
    return m


def _gn_silu_kernel(
    x_ref, scale_ref, bias_ref, onehot_ref, onehot_t_ref, o_ref, *, eps, silu, hw, cg
):
    x = x_ref[:].astype(jnp.float32)  # (NB, HW, C): NB images per grid cell
    onehot = onehot_ref[:]  # (C, G)
    onehot_t = onehot_t_ref[:]  # (G, C)
    n = jnp.float32(hw * cg)

    # per-image per-group sums: a sublane reduction to (NB, C), then one MXU
    # matmul folds channels into groups for the whole image block at once
    # (rank-2 operands — Mosaic dots need rank 2; the round-3 per-image grid
    # did this one image per cell and SERIALIZED, 26.8 vs 14.0 ms/step)
    col_sum = jnp.sum(x, axis=1)  # (NB, C)
    col_sumsq = jnp.sum(x * x, axis=1)
    g_sum = jnp.dot(col_sum, onehot, preferred_element_type=jnp.float32)  # (NB, G)
    g_sumsq = jnp.dot(col_sumsq, onehot, preferred_element_type=jnp.float32)

    mean_g = g_sum / n
    var_g = g_sumsq / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    # broadcast group stats back to channels: (NB, G) @ (G, C) -> (NB, C)
    mean_c = jnp.dot(mean_g, onehot_t, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, onehot_t, preferred_element_type=jnp.float32)

    y = (x - mean_c[:, None, :]) * rstd_c[:, None, :]
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[:] = y.astype(o_ref.dtype)


# multi-image working-set budget: the kernel's live VMEM per grid cell is
# roughly in-block + fp32 staging of x + fp32 y + out-block ~= 12-16 B/elem
# (vs 4 B/elem of fp32 input alone), so the multi-image cap must budget the
# WORKING SET, not just the staging — nb*hw*c*4 <= 4 MB models ~12-16 MB of
# live VMEM, the single-core budget. nb=1 keeps the round-3 gate (known to
# compile at every admitted shape).
_VMEM_MULTI_IMAGE_BYTES = 4 * 1024 * 1024


def _images_per_block(b: int, hw: int, c: int) -> int:
    """Largest divisor of b (capped at 8) whose WORKING SET fits VMEM.
    More images per grid cell amortizes the per-cell fixed cost that sank
    the round-3 per-image version (flagship 64²x128: nb=2; 16²x512: nb=8)."""
    nb = 1
    for cand in (2, 4, 8):
        if b % cand == 0 and cand * hw * c * 4 <= _VMEM_MULTI_IMAGE_BYTES:
            nb = cand
    return nb


def _gn_silu_fwd_impl(x, scale, bias, groups: int, eps: float, silu: bool, interpret: bool):
    b, h, w, c = x.shape
    hw = h * w
    nb = _images_per_block(b, hw, c)
    onehot = jnp.asarray(_group_onehot(c, groups))
    x3 = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(
            _gn_silu_kernel, eps=eps, silu=silu, hw=hw, cg=c // groups
        ),
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x3, scale.reshape(1, c), bias.reshape(1, c), onehot, onehot.T)
    return out.reshape(b, h, w, c)


def _gn_reference(x, scale, bias, groups: int, eps: float, silu: bool):
    """Pure-jnp GroupNorm(+SiLU): the XLA fallback path, the backward-pass
    math, and the numerical reference in tests.

    Statistics accumulate in fp32 via reduction dtype WITHOUT materializing
    an fp32 copy of the tensor — on bf16 activations an upcast would double
    the HBM traffic of every norm (measured +50% step time at the flagship
    config). Elementwise normalize/affine runs in the input dtype, matching
    flax GroupNorm's compute-dtype behavior."""
    b, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(b, h * w, groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(
        jnp.square(xg.astype(jnp.float32)), axis=(1, 3), keepdims=True,
        dtype=jnp.float32,
    )
    rstd = jax.lax.rsqrt(mean_sq - jnp.square(mean) + eps)
    y = (xg - mean.astype(x.dtype)) * rstd.astype(x.dtype)
    y = y.reshape(b, h, w, c) * scale.astype(x.dtype) + bias.astype(x.dtype)
    if silu:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_silu(x, scale, bias, groups: int, eps: float = 1e-5,
                    silu: bool = True, interpret: bool = False):
    """Fused GroupNorm + affine + optional SiLU over NHWC input."""
    return _gn_silu_fwd_impl(x, scale, bias, groups, eps, silu, interpret)


def _fwd(x, scale, bias, groups, eps, silu, interpret):
    out = _gn_silu_fwd_impl(x, scale, bias, groups, eps, silu, interpret)
    return out, (x, scale, bias)


def _bwd(groups, eps, silu, interpret, res, g):
    x, scale, bias = res
    # recompute-based backward through the pure-jnp reference: XLA fuses it
    # as well as the unfused forward would have been
    def f(x_, s_, b_):
        return _gn_reference(x_, s_, b_, groups, eps, silu).astype(jnp.float32)

    _, vjp = jax.vjp(f, x, scale, bias)
    dx, ds, db = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), ds.astype(scale.dtype), db.astype(bias.dtype)


group_norm_silu.defvjp(_fwd, _bwd)


def pallas_norm_supported(h: int, w: int, c: int, groups: int) -> bool:
    """Kernel eligibility: TPU backend, VMEM-sized block, lane-aligned
    channels, contiguous groups."""
    if jax.default_backend() != "tpu":
        return False
    if c % groups != 0 or c % 128 != 0:
        return False
    return fits_vmem(h * w, c)
