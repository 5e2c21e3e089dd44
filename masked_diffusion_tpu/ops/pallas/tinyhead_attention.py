"""Flash attention for tiny heads (head_dim <= 8) in head-major layout.

The UNet family's attention uses diffusers' head_dim=8 (utils/model.py:24-32
topology -> 64 heads at 512 channels). Neither stock path is TPU-shaped:

  * the einsum materializes (B, heads, S, S) scores to HBM — ~1 GB per
    forward at S=1024 batch 8, measured 6.56 ms vs a sub-2 ms roofline, and
    it cannot compile at S=4096 (8.6 GB);
  * the stock Pallas flash kernel tiles head_dim onto the 128-lane axis, a
    16x pad for 8-wide heads (measured 17.7 ms at S=1024 — worse than the
    einsum it was meant to beat).

This kernel instead keeps everything HEAD-MAJOR: q/k/v are transposed to
(B*heads, 8, S) so the fp32 (8, 128) tile fits EXACTLY (head_dim on the
8-sublane axis, sequence on lanes — zero pad at S % 128 == 0). Scores for
one query block live only in VMEM:

  per grid cell (bh, q_block):
    S_blk = q^T k          (QB, S)   contraction over the 8 sublanes (MXU)
    P     = softmax(S_blk) (QB, S)   fp32, rowwise over the full key axis
    out^T = v P^T          (8, QB)   contraction over S (MXU, well-tiled)

so HBM traffic is just q/k/v/out (the k/v blocks stay VMEM-resident across
a bh's query blocks — their index map ignores the q index). No online
softmax is needed: a full (QB, S) score block is <= 4 MB fp32 at QB=256,
S=4096, comfortably inside VMEM, and the softmax sees the whole row.

The 8-deep contraction uses 8/128 of the MXU's systolic rows — a FLOPs
inefficiency, not a bandwidth one, and attention FLOPs here are tiny
(~17 GFLOP at S=1024 batch 8). Bandwidth is what the einsum loses.

Differentiation: the kernel is forward-only; `tinyhead_attention` carries a
custom VJP whose backward recomputes attention with the XLA einsum
formulation (exact same math), so training through it is correct with the
einsum's backward memory profile. Sampling — the throughput path — never
differentiates.

Numerics: matmuls run in the CALLER's dtype (bf16 models -> bf16 matmuls
with fp32 accumulation, fp32 models -> fp32 matmuls), the softmax in fp32 —
the same precision recipe as the einsum path (models/unet.py:244-248); equal
to it within op-order rounding, pinned by tests/test_tinyhead_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8  # head_dim capacity = fp32 sublane tile


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_valid: int,
            mm_dtype):
    # blocks: q (1, 8, QB), k/v (1, 8, S_pad), o (1, 8, QB)
    # mm_dtype is the CALLER's dtype: bf16 models get bf16 matmuls (fp32
    # accumulation), fp32 models keep fp32 matmuls — exactly the precision
    # the einsum path would have used (models/unet.py:244-248), so opting
    # into the kernel never changes numerics beyond op-order rounding
    q = q_ref[0].astype(mm_dtype)
    k = k_ref[0].astype(mm_dtype)
    # scores (QB, S_pad): contract the 8-sublane head axis of q^T against k
    s = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    s_pad = s.shape[1]
    if s_valid < s_pad:  # mask padded keys out of the softmax
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_valid, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    # out^T (8, QB) = v (8, S) @ p^T (S, QB): contract the key axis
    o = jax.lax.dot_general(
        v_ref[0].astype(mm_dtype), p.astype(mm_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[0] = o


def tinyhead_supported(s: int, d: int) -> bool:
    """Shapes the kernel accepts: tiny heads, sequence >= one lane tile.

    Below S=128 the lane axis pads and the einsum's scores are small anyway
    (the flagship's S=64 attention costs ~nothing) — not worth routing."""
    return d <= _SUB and s >= _LANE


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def tinyhead_attention(q, k, v, scale: float, q_block: int = 256,
                       interpret: bool = False):
    """softmax(q k^T * scale) v for (B, heads, S, D<=8) inputs.

    Returns (B, heads, S, D) in q's dtype. Exact (no approximation): padding
    rows/columns are masked out of the softmax and sliced off the output.
    """
    return _forward(q, k, v, scale, q_block, interpret)


def _forward(q, k, v, scale, q_block, interpret):
    b, h, s, d = q.shape
    if not tinyhead_supported(s, d):
        raise ValueError(f"tinyhead_attention needs D<=8, S>=128; got S={s} D={d}")
    bh = b * h
    s_pad = _ceil_to(s, _LANE)
    qb = min(_ceil_to(min(q_block, s_pad), _LANE), s_pad)
    sq_pad = _ceil_to(s_pad, qb)

    def to_head_major(t, seq_pad):
        # (B, H, S, D) -> (BH, 8, seq_pad) fp32: head_dim on sublanes (padded
        # rows are zero: they add zero to the 8-deep contraction), sequence
        # on lanes (padded keys masked in-kernel, padded queries sliced off)
        t = t.reshape(bh, t.shape[2], d).astype(jnp.float32)
        t = jnp.pad(t, ((0, 0), (0, seq_pad - t.shape[1]), (0, _SUB - d)))
        return t.transpose(0, 2, 1)

    qm = to_head_major(q, sq_pad)
    km = to_head_major(k, s_pad)
    vm = to_head_major(v, s_pad)

    grid = (bh, sq_pad // qb)
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=float(scale), s_valid=s,
            mm_dtype=jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, _SUB, sq_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _SUB, qb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            # k/v index maps ignore j: the block stays VMEM-resident across
            # one bh's query blocks (no re-fetch)
            pl.BlockSpec((1, _SUB, s_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, s_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUB, qb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qm, km, vm)

    out = out.transpose(0, 2, 1)[:, :s, :d]  # (BH, S, D)
    return out.reshape(b, h, s, d).astype(q.dtype)


def _einsum_reference(q, k, v, scale):
    """The XLA formulation (models/unet.py:244-248) used for the backward."""
    a = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)
    a = jax.nn.softmax(a * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", a, v)


def _fwd(q, k, v, scale, q_block, interpret):
    return _forward(q, k, v, scale, q_block, interpret), (q, k, v)


def _bwd(scale, q_block, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _einsum_reference(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


tinyhead_attention.defvjp(_fwd, _bwd)
