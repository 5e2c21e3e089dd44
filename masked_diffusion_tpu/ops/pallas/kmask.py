"""Pallas TPU kernel: exact-k random pixel masks without sorting.

The 'indexing' degrade mode (the reference default, main_train_masked.py:395)
needs, per image, a uniformly random subset of exactly k pixels. The XLA-path
implementation (ops/degrade.py:exact_count_masks) ranks per-pixel uniforms
with two argsorts over (B, H*W) — sorting is one of the TPU's weakest ops and
runs twice per degrade call (and the sampler degrades twice per step).

This kernel replaces the sorts with a bitwise greedy search for the k-th
order statistic over on-chip PRNG bits:

  * seed the per-core PRNG from (base_seed, image index),
  * draw one uint32 per pixel (padding slots pinned to 0xFFFFFFFF),
  * build the threshold T bit-by-bit from the MSB: set a bit while
    count(bits < T|bit) <= k — count(bits < T) is monotone in T, so the
    greedy scan finds the maximum T with count <= k, which for distinct
    draws is exactly the k-th smallest value,
  * mask = (bits < T) then selects exactly k pixels (ties across 2^32 draws
    are ~HW/2^32 probable and cost at most the tie size),
  * 32 compare+reduce passes over a VMEM-resident (8, HW/8) block — no sort,
    no HBM round-trips.

Each grid step handles one image. Random bits come from the TPU PRNG, so
masks differ from the jax.random path bit-for-bit but are
distribution-identical; tests check exactness and uniformity instead of
stream equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8


def greedy_kth_threshold(s, k):
    """Maximum uint32 T with count(s < T) <= k, built greedily from the MSB.

    For distinct values this is exactly the k-th smallest element of `s`
    (0-indexed), so (s < T) selects exactly k elements. Pure jnp — shared by
    the kernel body and the CPU logic tests.
    """
    def bit_step(b, t):
        cand = t | (jnp.uint32(1) << (31 - b))
        cnt = jnp.sum((s < cand).astype(jnp.int32))
        return jnp.where(cnt <= k, cand, t)

    return jax.lax.fori_loop(0, 32, bit_step, jnp.uint32(0))


def _kmask_kernel(counts_ref, seed_ref, out_ref, *, hw_pad: int, hw: int):
    img = pl.program_id(0)
    # both 32-bit words of the jax key feed the seed: a single int31 seed
    # collides between distinct keys at ~n^2/2^32 — hundreds of whole-batch
    # mask-pattern reuses over a ~1e6-step run; two words push that to
    # ~2^-64. libtpu's prng_seed takes at most TWO values, so the per-image
    # index is golden-ratio-mixed into word 0 instead of passed separately.
    mix = img * np.int32(-1640531527)  # 0x9E3779B9 (golden ratio) as i32
    pltpu.prng_seed(seed_ref[0] ^ mix, seed_ref[1])

    cols = hw_pad // _ROWS
    s = pltpu.prng_random_bits((_ROWS, cols))
    s = pltpu.bitcast(s, jnp.uint32)

    # padding slots (flat index >= hw) must never be selected: pin to max
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 0) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 1)
    )
    s = jnp.where(flat < hw, s, jnp.uint32(0xFFFFFFFF))

    t = greedy_kth_threshold(s, counts_ref[img])
    black = s < t
    out_ref[0] = jnp.where(black, 0.0, 1.0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 5))
def exact_count_masks_pallas(
    key, batch: int, height: int, width: int, counts, interpret: bool = False
):
    """Drop-in for ops.degrade.exact_count_masks: (B, H, W, 1) float32 masks
    with exactly counts[i] zeros, selected uniformly at random."""
    hw = height * width
    hw_pad = -(-hw // (128 * _ROWS)) * (128 * _ROWS)
    cols = hw_pad // _ROWS

    # seed with the key's raw 32-bit words (not one drawn int31 — see kernel)
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        raw = jax.random.key_data(key)
    else:
        raw = key
    seed = jax.lax.bitcast_convert_type(
        jnp.asarray(raw, dtype=jnp.uint32).reshape(-1)[:2], jnp.int32
    )
    counts = jnp.asarray(counts, dtype=jnp.int32).reshape(batch)

    out = pl.pallas_call(
        functools.partial(_kmask_kernel, hw_pad=hw_pad, hw=hw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # counts, seed
            grid=(batch,),
            in_specs=[],
            out_specs=pl.BlockSpec(
                (1, _ROWS, cols), lambda i, *_: (i, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, _ROWS, cols), jnp.float32),
        # TPU interpreter (not the generic one): supports pltpu PRNG on CPU
        interpret=pltpu.InterpretParams() if interpret else False,
    )(counts, seed)

    masks = out.reshape(batch, hw_pad)[:, :hw]
    return masks.reshape(batch, height, width, 1)


def exact_count_masks_pallas_sharded(
    key,
    batch: int,
    height: int,
    width: int,
    counts,
    *,
    mesh,
    axis: str = "data",
    interpret: bool = False,
):
    """Data-parallel multi-chip form of exact_count_masks_pallas.

    One per-shard grid over the LOCAL batch with an independent per-shard
    PRNG stream — semantics and the batch-divisibility check live in the
    shared harness (ops/pallas/shard.py:data_parallel_kernel). `batch` is
    the GLOBAL batch.
    """
    from masked_diffusion_tpu.ops.pallas.shard import data_parallel_kernel

    n = mesh.shape[axis]

    def fn(k, c):
        return exact_count_masks_pallas(
            k, batch // n, height, width, c, interpret
        )

    return data_parallel_kernel(fn, mesh=mesh, axis=axis)(
        key, jnp.asarray(counts, jnp.int32).reshape(batch)
    )
