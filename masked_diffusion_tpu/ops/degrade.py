"""Vectorized mask generation and mean-fill degradation ops (NHWC, TPU-first).

The reference generates per-image random pixel masks with a host-side Python
loop over torch.randperm (scheduler.py:281-284 — its single worst CPU hotspot)
and fills the masked pixels with a mean value. Here everything is a batched
device computation:

  * 'indexing' (exact-k pixels): k smallest of per-pixel uniforms via one
    value sort + a cumsum tie correction (masks_from_uniforms) — exact pixel
    counts even under fp32 ties, fully parallel.
  * 'thresholding' (binomial count): per-pixel uniform > ratio, 1-channel
    (shared mask broadcast over channels) or 3-channel (independent per
    channel) — already the reference's formulation (scheduler.py:286-296).
  * dependent masks: one shared uniform field thresholded at two levels gives
    nested masks for adjacent timesteps (scheduler.py:480-549).

Mask convention matches the reference: mask value 1 = kept pixel, 0 = degraded
("black") pixel. All ops take/return NHWC arrays (TPU conv layout); callers at
the torch-compat boundary transpose at the edges.

Mean-fill semantics (scheduler.py:298-323, preserved exactly — including the
sign-flipped 'non_degraded_area' formula and its NaN guard, which is observable
behavior):
  const v            : mean = v
  'degraded_area'    : mean of the degraded pixels, image-wise (B,1,1,1) or
                       channel-wise (B,1,1,C)
  'non_degraded_area': -(sum of KEPT pixels)/(count of DEGRADED pixels) per
                       channel, NaN -> 0

Degradation composition D(x) = (1-m)*mu + m*x (scheduler.py:319).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from masked_diffusion_tpu.config import parse_mean_option

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# mask generation
# ---------------------------------------------------------------------------


def masks_from_uniforms(u: Array, counts: Array) -> Array:
    """(B, HW) keep-masks with exactly counts[i] zeros: the counts[i] rank-
    smallest entries of u[i] (ties broken by pixel index, stable-sort order).

    One VALUE sort + a cumsum tie correction. A bare value-threshold
    (u >= kth smallest) is cheapest but WRONG under ties: jax fp32 uniforms
    take ~2^23 distinct values, so the expected tied pairs per row is
    ~hw^2/2^24 — about ONE per row at 64^2 (most rows contain a tie) — and
    the contract breaks whenever a tie straddles the threshold, P ~ hw/2^23
    (~0.05% of masks at 64^2, ~0.8% at 256^2): both tied pixels stay kept
    and the mask comes up a pixel short. The correction degrades all u < thr
    plus exactly the first (k - #below) tied-at-thr pixels in pixel-index
    order — the same selection a STABLE argsort's first k positions give, so
    this is bit-for-bit the double-argsort ranks at one sort plus a cumsum.
    (A payload sort + scatter is also exact but measured 2.4 ms/step slower
    in the flagship indexing-mode loop — TPU scatters are expensive.)
    """
    batch, hw = u.shape
    counts = counts.astype(jnp.int32)
    su = jnp.sort(u, axis=1)
    kidx = jnp.clip(counts - 1, 0, hw - 1)
    thr = jnp.take_along_axis(su, kidx[:, None], axis=1)  # k-th smallest
    below = u < thr
    n_below = jnp.sum(below, axis=1, keepdims=True, dtype=jnp.int32)
    tied = u == thr
    tie_rank = jnp.cumsum(tied.astype(jnp.int32), axis=1)  # 1-based, index order
    degrade = below | (tied & (tie_rank <= counts[:, None] - n_below))
    degrade = jnp.where(counts[:, None] <= 0, False, degrade)
    return 1.0 - degrade.astype(jnp.float32)


def exact_count_masks(key: Array, batch: int, height: int, width: int, counts: Array) -> Array:
    """Per-image masks with exactly counts[i] zero ("black") pixels.

    Replaces the reference's per-image randperm prefix loop
    (scheduler.py:281-284): the k smallest of i.i.d. uniforms are a uniform
    random k-subset, so rank(u) < k selects exactly k pixels.

    Returns (B, H, W, 1) float32 masks (1 = keep, 0 = degraded).
    """
    hw = height * width
    u = jax.random.uniform(key, (batch, hw))
    keep = masks_from_uniforms(u, counts)
    return keep.reshape(batch, height, width, 1)


def threshold_masks(
    key: Array,
    batch: int,
    height: int,
    width: int,
    channels: int,
    ratios: Array,
    per_channel: bool,
) -> Array:
    """Per-pixel uniform-vs-ratio masks (scheduler.py:286-296).

    per_channel=False -> (B, H, W, 1) shared mask ('1-channel');
    per_channel=True  -> (B, H, W, C) independent masks ('3-channel').
    """
    c = channels if per_channel else 1
    u = jax.random.uniform(key, (batch, height, width, c))
    ratios = ratios.astype(jnp.float32).reshape(batch, 1, 1, 1)
    return (u > ratios).astype(jnp.float32)


def nested_threshold_masks(
    key: Array,
    batch: int,
    height: int,
    width: int,
    channels: int,
    ratios_a: Array,
    ratios_b: Array,
    per_channel: bool,
) -> Tuple[Array, Array]:
    """One shared uniform field thresholded at two levels -> nested masks
    (degrade_dependent_base_sampling, scheduler.py:494-513)."""
    c = channels if per_channel else 1
    u = jax.random.uniform(key, (batch, height, width, c))
    mask_a = (u > ratios_a.astype(jnp.float32).reshape(batch, 1, 1, 1)).astype(jnp.float32)
    mask_b = (u > ratios_b.astype(jnp.float32).reshape(batch, 1, 1, 1)).astype(jnp.float32)
    return mask_a, mask_b


# image area at/above which the pallas kernel beats the XLA sort (v5e,
# in-loop, log/indexing): 64^2 (hw=4096) kernel LOSES 14.62 vs 14.29
# ms/step; 128^2 (hw=16384, batch 8) WINS 7.17 vs 7.32; 256^2 (hw=65536,
# batch 4) WINS 55.13 vs 56.37 — sort grows O(HW log HW), the 32-pass
# bit-scan O(32*HW); crossover sits between 4096 and 16384
_PALLAS_KMASK_MIN_HW = 16384


def _use_pallas_kmask(hw: int, batch: int = 0, mesh=None) -> bool:
    """TPU kernel for the indexing path: auto-on at large images (see
    _PALLAS_KMASK_MIN_HW measurements), forced with MDT_PALLAS_KMASK=1/0.

    At the flagship 64x64 shape the XLA sort wins (standalone 1.92 ms pallas
    vs 1.84 ms; in-loop 14.62 vs 14.29 ms/step — XLA overlaps the small
    (64,4096) sorts well); at 256x256 the kernel wins by ~1.2 ms/step. The
    kernel draws TPU-PRNG bits, so masks are distribution-identical but not
    stream-equal to the jax.random path (same-backend runs stay seed-
    deterministic).

    pallas_call has no GSPMD partitioning rule, so under a multi-chip mesh
    with the batch sharded over 'data' a plain jit would replicate the call
    (all-gathering the batch, negating the measured ~1 ms win). Multi-device
    auto-on therefore requires the caller to pass its `mesh` — generate_masks
    then routes through the shard_map wrapper
    (ops/pallas/kmask.py:exact_count_masks_pallas_sharded), provided the
    batch divides across the 'data' axis. Without a mesh, auto-on stays
    single-device-only; MDT_PALLAS_KMASK=1 still forces the kernel for
    callers who wrap it themselves."""
    import os

    env = os.environ.get("MDT_PALLAS_KMASK", "").lower()
    if env in ("0", "false"):
        return False
    if jax.device_count() > 1:
        # only the shard_map route is safe inside a multi-device jit; that
        # needs a mesh whose 'data' axis really shards the batch (data=1
        # TP/SP meshes would trace the UNSHARDED pallas_call into the
        # multi-device program — an untested lowering). Callers who wrap the
        # kernel themselves can still force with MDT_PALLAS_KMASK=1 + no mesh.
        sharded_ok = (
            mesh is not None
            and mesh.shape["data"] > 1
            and batch % mesh.shape["data"] == 0
        )
        if not sharded_ok and (env not in ("1", "true") or mesh is not None):
            return False
    if env not in ("1", "true") and hw < _PALLAS_KMASK_MIN_HW:
        return False
    return jax.default_backend() == "tpu"


def generate_masks(
    key: Array,
    img: Array,
    amount: Array,
    select_degrade_pixel: str,
    degrade_channel: str,
    mesh=None,
) -> Array:
    """Dispatch mask generation; returns masks broadcast to img's shape.

    `mesh` (a jax Mesh with a 'data' axis, batch sharded over it) lets the
    pallas kmask path stay eligible on multi-chip runs via shard_map — see
    _use_pallas_kmask."""
    b, h, w, c = img.shape
    if select_degrade_pixel == "indexing":
        if _use_pallas_kmask(h * w, b, mesh):
            if mesh is not None and mesh.shape["data"] > 1:
                from masked_diffusion_tpu.ops.pallas.kmask import (
                    exact_count_masks_pallas_sharded,
                )

                masks = exact_count_masks_pallas_sharded(
                    key, b, h, w, amount, mesh=mesh
                )
            else:
                from masked_diffusion_tpu.ops.pallas.kmask import (
                    exact_count_masks_pallas,
                )

                masks = exact_count_masks_pallas(key, b, h, w, amount)
        else:
            masks = exact_count_masks(key, b, h, w, amount)
        return jnp.broadcast_to(masks, img.shape)
    if select_degrade_pixel == "thresholding":
        per_channel = degrade_channel == "3-channel"
        masks = threshold_masks(key, b, h, w, c, amount, per_channel)
        return jnp.broadcast_to(masks, img.shape)
    raise ValueError(f"unknown select_degrade_pixel: {select_degrade_pixel!r}")


# ---------------------------------------------------------------------------
# mean computation
# ---------------------------------------------------------------------------


def compute_mean_pixel(
    img: Array,
    masks: Array,
    mean_option,
    mean_area: str,
) -> Array:
    """Fill value for degraded pixels (scheduler.py:298-317)."""
    mode, value = parse_mean_option(mean_option)
    b, _, _, c = img.shape

    if mode == "const":
        return jnp.full((b, 1, 1, c), value, dtype=img.dtype)

    inv = 1.0 - masks
    if mode == "degraded_area":
        if mean_area == "image-wise":
            axes = (1, 2, 3)
        elif mean_area == "channel-wise":
            axes = (1, 2)
        else:
            raise ValueError(f"unknown mean_area: {mean_area!r}")
        sum_pixel = jnp.sum(img * inv, axis=axes, keepdims=True)
        count = jnp.sum(inv, axis=axes, keepdims=True)
        # division by a zero count yields NaN in the reference too, but guard it:
        # a zero degraded count means nothing gets filled, so the value is inert.
        return jnp.where(count > 0, sum_pixel / jnp.maximum(count, 1.0), 0.0)

    if mode == "non_degraded_area":
        # Reference formula (scheduler.py:311-314): channel-wise sums, the
        # *kept* pixels summed but divided by the *degraded* count, negated,
        # with NaN -> 0. Preserved verbatim; it is observable behavior.
        sum_pixel = jnp.sum(img * masks, axis=(1, 2), keepdims=True)
        count = jnp.sum(inv, axis=(1, 2), keepdims=True)
        mean = jnp.where(count > 0, sum_pixel / jnp.maximum(count, 1.0) * -1.0, 0.0)
        return mean

    raise ValueError(f"unsupported mean_option mode: {mode!r}")


# ---------------------------------------------------------------------------
# degradation ops
# ---------------------------------------------------------------------------


def degrade_training(
    key: Array,
    img: Array,
    amount: Array,
    select_degrade_pixel: str,
    degrade_channel: str,
    mean_option,
    mean_area: str,
    mesh=None,
) -> Tuple[Array, Array, Array, Array]:
    """Training-time degradation (scheduler.py:266-323).

    Returns (degrade_img, masks, degrade_mask, mean_mask):
      degrade_img  = (1-m)*mu + m*x
      masks        = binary masks broadcast to x
      degrade_mask = (1-m)*mu + m       (mu on degraded pixels, 1 elsewhere)
      mean_mask    = mu everywhere
    """
    masks = generate_masks(
        key, img, amount, select_degrade_pixel, degrade_channel, mesh
    )
    mean_pixel = compute_mean_pixel(img, masks, mean_option, mean_area)
    inv = 1.0 - masks
    degrade_img = inv * mean_pixel + masks * img
    degrade_mask = inv * mean_pixel + masks
    mean_mask = jnp.broadcast_to(mean_pixel, img.shape)
    return degrade_img, masks, degrade_mask, mean_mask


def degrade_independent_base_sampling(
    key: Array,
    img: Array,
    amount: Array,
    select_degrade_pixel: str,
    degrade_channel: str,
    mean_option,
    mean_area: str,
    mesh=None,
) -> Tuple[Array, Array, Array]:
    """Sampling-time degradation with a fresh independent mask
    (scheduler.py:418-477). Returns (degrade_img, degrade_mask, mean_mask)
    where degrade_mask is the *binary* mask (unlike training)."""
    masks = generate_masks(
        key, img, amount, select_degrade_pixel, degrade_channel, mesh
    )
    mean_pixel = compute_mean_pixel(img, masks, mean_option, mean_area)
    degrade_img = (1.0 - masks) * mean_pixel + masks * img
    mean_mask = jnp.broadcast_to(mean_pixel, img.shape)
    return degrade_img, masks, mean_mask


def degrade_dependent_base_sampling(
    key: Array,
    img: Array,
    amount_t: Array,
    amount_next_t: Array,
    degrade_channel: str,
    mean_option,
    mean_area: str,
) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """Nested masks for (t, t-1) from one shared uniform field
    (scheduler.py:480-549; thresholding only — the reference's 'indexing'
    branch is an explicit pass)."""
    b, h, w, c = img.shape
    per_channel = degrade_channel == "3-channel"
    mask_t, mask_next = nested_threshold_masks(
        key, b, h, w, c, amount_t, amount_next_t, per_channel
    )
    mask_t = jnp.broadcast_to(mask_t, img.shape)
    mask_next = jnp.broadcast_to(mask_next, img.shape)

    mean_t = compute_mean_pixel(img, mask_t, mean_option, mean_area)
    mean_next = compute_mean_pixel(img, mask_next, mean_option, mean_area)

    degrade_t = (1.0 - mask_t) * mean_t + mask_t * img
    degrade_next = (1.0 - mask_next) * mean_next + mask_next * img
    mean_mask_t = jnp.broadcast_to(mean_t, img.shape)
    mean_mask_next = jnp.broadcast_to(mean_next, img.shape)
    return degrade_t, mask_t, mean_mask_t, degrade_next, mask_next, mean_mask_next


def degrade_with_mask(img: Array, masks: Array, mean_option, mean_area: str) -> Array:
    """Degrade with a caller-provided mask (scheduler.py:572-598); used by the
    'dependent_prev' sampling mode to reuse the previous step's mask."""
    mean_pixel = compute_mean_pixel(img, masks, mean_option, mean_area)
    return (1.0 - masks) * mean_pixel + masks * img


def degrade_index_sampling(
    index: Array,
    count_t: Array,
    img: Array,
    mean_option,
    mean_area: str,
) -> Tuple[Array, Array, Array]:
    """Degrade the first count_t entries of a fixed per-image pixel permutation
    (scheduler.py:379-415). `index` is (B, H*W) int32; count is taken from
    count_t[0] as in the reference (all images share the count at a step).

    jit-friendly formulation: instead of scattering a dynamic-length prefix,
    mark each permutation slot with its position and keep pixels whose slot
    position is >= count.
    """
    b, h, w, _ = img.shape
    hw = h * w
    positions = jnp.broadcast_to(jnp.arange(hw)[None, :], (b, hw))
    # slot_of_pixel[i, p] = j where index[i, j] == p
    slot = jnp.zeros((b, hw), dtype=jnp.int32)
    slot = jax.vmap(lambda s, idx, pos: s.at[idx].set(pos))(slot, index, positions)
    count = count_t.astype(jnp.int32).reshape(-1)[0]
    masks = (slot >= count).astype(jnp.float32).reshape(b, h, w, 1)
    masks = jnp.broadcast_to(masks, img.shape)

    mean_pixel = compute_mean_pixel(img, masks, mean_option, mean_area)
    degrade_img = (1.0 - masks) * mean_pixel + masks * img
    mean_mask = jnp.broadcast_to(mean_pixel, img.shape)
    return degrade_img, masks, mean_mask


def degrade_dependent_momentum_sampling(
    sample_t: Array,
    sample_0: Array,
    index_list: Array,
    index_start: Array,
    index_end: Array,
    mean_option,
) -> Tuple[Array, Array, Array]:
    """Composite degradation on a shared randperm index list
    (scheduler.py:326-376): pixels in positions [0, index_start) keep
    sample_t's values, [index_start, index_end) take sample_0's values, and
    the rest are mean-filled.

    jit-friendly: per-pixel slot positions compared against the two cut
    points replace the dynamic-width scatters.
    """
    b, h, w, c = sample_t.shape
    hw = h * w
    positions = jnp.broadcast_to(jnp.arange(hw)[None, :], (b, hw))
    slot = jnp.zeros((b, hw), dtype=jnp.int32)
    slot = jax.vmap(lambda s, idx, pos: s.at[idx].set(pos))(slot, index_list, positions)
    slot = slot.reshape(b, h, w, 1)

    start = jnp.asarray(index_start, dtype=jnp.int32)
    end = jnp.asarray(index_end, dtype=jnp.int32)
    masks_t = (slot < start).astype(jnp.float32)
    masks_0 = ((slot >= start) & (slot < end)).astype(jnp.float32)
    mask = (slot < end).astype(jnp.float32)

    preserved = sample_t * masks_t + sample_0 * masks_0

    mode, value = parse_mean_option(mean_option)
    if mode == "const":
        mean_pixel = jnp.full((b, 1, 1, c), value, dtype=sample_t.dtype)
    elif mode == "non_degraded_area":
        # Reference (scheduler.py:364-367): image-wise sums over the preserved
        # region divided by the (1-channel) degraded count and channel count.
        sum_pixel = jnp.sum(preserved * mask, axis=(1, 2, 3), keepdims=True)
        count = jnp.sum(1.0 - mask, axis=(1, 2, 3), keepdims=True)
        mean_pixel = jnp.where(count > 0, sum_pixel / jnp.maximum(count, 1.0) / c * -1.0, 0.0)
    else:
        raise ValueError(
            f"mean_option {mean_option!r} unsupported for dependent momentum sampling"
        )

    noisy_img = (1.0 - mask) * mean_pixel + preserved
    mean_masks = (1.0 - mask) * mean_pixel
    return noisy_img, mean_masks, jnp.broadcast_to(mean_pixel, sample_t.shape)


def degrade_interpolation_sampling(
    key: Array,
    img: Array,
    amount: Array,
    mean_option,
    mean_area: str = "image-wise",
) -> Tuple[Array, Array, Array]:
    """One shared mask across the whole batch (scheduler.py:552-569), used by
    the interpolation sampler so every latent sees the same degradation."""
    b, h, w, c = img.shape
    u = jax.random.uniform(key, (1, h, w, 1))
    ratios = amount.astype(jnp.float32).reshape(b, 1, 1, 1)
    masks = (jnp.broadcast_to(u, (b, h, w, 1)) > ratios).astype(jnp.float32)
    masks = jnp.broadcast_to(masks, img.shape)

    mode, value = parse_mean_option(mean_option)
    if mode == "const":
        mean_pixel = jnp.full((b, 1, 1, c), value, dtype=img.dtype)
    else:
        # reference falls through to image-wise degraded-area mean (:561-563)
        inv = 1.0 - masks
        sum_pixel = jnp.sum(img * inv, axis=(1, 2, 3), keepdims=True)
        count = jnp.sum(inv, axis=(1, 2, 3), keepdims=True)
        mean_pixel = jnp.where(count > 0, sum_pixel / jnp.maximum(count, 1.0), 0.0)

    degrade_img = (1.0 - masks) * mean_pixel + masks * img
    mean_mask = jnp.broadcast_to(mean_pixel, img.shape)
    return degrade_img, masks, mean_mask
