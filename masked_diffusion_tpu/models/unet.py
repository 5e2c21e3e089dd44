"""Time-conditioned U-Net denoiser (Flax, NHWC, bf16-ready).

One native U-Net family covering the design space the reference exercises —
the diffusers UNet2DModel built by utils/model.py:24-32 (6 levels,
block_out_channels=(128,128,256,256,512,512), layers_per_block=2, optional
self-attention per level) and the zoo variants in code/models/unet/ (resblocks
+ GroupNorm + self-attention + sinusoidal time embedding). Architecture
matches UNet2DModel semantics: ResnetBlock2D (GroupNorm→SiLU→Conv with
time-projection add), Attn blocks with head_dim-partitioned heads, stride-2
conv downsampling, nearest×2+conv upsampling, skip concatenation, and a
zero-initialized output conv (unet6.py:414 convention) so the predicted
residual starts at zero.

TPU notes:
  * NHWC layout end-to-end — XLA's native conv layout on TPU.
  * `dtype` is the compute/activation dtype (bfloat16 for MXU throughput);
    `param_dtype` stays float32. flax modules cast per-op.
  * attention is a batched einsum; at the reference's resolutions the
    sequence is ≤ HW = 4096 tokens (attention sits at the downsampled
    levels) so the full score matrix fits in VMEM-friendly tiles and XLA's
    fused attention is the measured-fastest path (see docs/PERFORMANCE.md
    "pallas verdicts" for the flash-attention measurement).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _norm_groups(channels: int, preferred: int = 32) -> int:
    # keep >=2 channels per group: with one channel per group, GroupNorm
    # exactly cancels the per-channel time-embedding add in ResnetBlock
    g = min(preferred, max(1, channels // 2))
    while channels % g != 0:
        g -= 1
    return g


def timestep_embedding(
    timesteps: Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> Array:
    """Sinusoidal timestep embedding (diffusers Timesteps semantics)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        out = jnp.concatenate([cos, sin], axis=-1)
    else:
        out = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class GroupNormAct(nn.Module):
    """GroupNorm + affine + optional fused SiLU.

    Owns the same (scale, bias) parameter leaves as flax nn.GroupNorm, so
    checkpoints are interchangeable between the XLA and Pallas paths. When
    `pallas` resolves true (TPU backend, VMEM-sized block, lane-aligned
    channels) the fused single-pass kernel (ops/pallas/groupnorm.py) runs —
    the UNet forward is HBM-bound, and fusing GN's two passes into one is
    worth ~one full tensor read per norm. Otherwise: fp32-stat jnp math,
    numerically the flax GroupNorm formulation.
    """

    num_groups: int
    epsilon: float = 1e-5
    use_silu: bool = True
    pallas: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from masked_diffusion_tpu.ops.pallas.groupnorm import (
            _gn_reference,
            group_norm_silu,
            pallas_norm_supported,
        )

        b, h, w, c = x.shape
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if self.pallas and pallas_norm_supported(h, w, c, self.num_groups):
            out = group_norm_silu(
                x, scale, bias, self.num_groups, self.epsilon, self.use_silu
            )
        else:
            out = _gn_reference(x, scale, bias, self.num_groups, self.epsilon, self.use_silu)
        return out.astype(self.dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    norm_groups: int = 32
    norm_eps: float = 1e-5
    pallas_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _norm_act(self, x: Array, channels: int, use_silu: bool, name: str) -> Array:
        # identical param leaves either way: {name}/{scale,bias}
        if self.pallas_norm:
            return GroupNormAct(
                num_groups=_norm_groups(channels, self.norm_groups),
                epsilon=self.norm_eps, use_silu=use_silu, pallas=True,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )(x)
        h = nn.GroupNorm(
            num_groups=_norm_groups(channels, self.norm_groups), epsilon=self.norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )(x)
        return nn.silu(h) if use_silu else h

    @nn.compact
    def __call__(self, x: Array, temb: Array, deterministic: bool = True) -> Array:
        c_in = x.shape[-1]
        h = self._norm_act(x, c_in, True, "norm1")
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv1",
        )(h)

        t = nn.Dense(
            self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_emb_proj",
        )(nn.silu(temb))
        h = h + t[:, None, None, :]

        h = self._norm_act(h, self.out_channels, True, "norm2")
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv2",
        )(h)

        if c_in != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_shortcut",
            )(x)
        return x + h


def _tinyhead_auto() -> bool:
    """Resolve UNetConfig.tinyhead_attention=None (auto) at trace time.

    Auto-on follows the measured verdict (docs/PERFORMANCE.md "pallas
    verdicts" b2: 2.4-2.5x vs the einsum at S=256/1024): single-device TPU
    only — pallas_call has no GSPMD partitioning rule, so any multi-device
    run (DP/TP/SP meshes) stays on the einsum unless explicitly forced.
    MDT_TINYHEAD=1/0 overrides (same convention as MDT_PALLAS_FUSED,
    sample/loop.py:_use_fused_degrade). Called inside __call__ so the same
    model object resolves per backend (CPU tests stay on the einsum)."""
    import os

    env = os.environ.get("MDT_TINYHEAD", "").lower()
    if env in ("1", "true"):
        return True
    if env in ("0", "false"):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


class AttentionBlock(nn.Module):
    """Spatial self-attention over HW tokens with head_dim-partitioned heads.

    `flash=True` routes through the stock Pallas TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) instead of the
    materialized-scores einsum — opt-in via UNetConfig.pallas_attention; see
    docs/PERFORMANCE.md "pallas verdicts" for the measurement."""

    head_dim: int = 8
    norm_groups: int = 32
    norm_eps: float = 1e-5
    pallas_norm: bool = False
    flash: bool = False
    # tiny_flash: head-major Pallas flash kernel for this family's 8-wide
    # heads (ops/pallas/tinyhead_attention.py) — scores stay in VMEM (the
    # einsum round-trips the (B,heads,S,S) matrix through HBM) with ZERO
    # lane padding (stock flash pads head_dim 8->128). Falls back to the
    # einsum where unsupported (S < 128 or head_dim > 8).
    tiny_flash: bool = False
    # chunk_q > 0: lax.map over query blocks of that size — exact attention
    # with the score tensor bounded to (B, heads, chunk_q, S) instead of the
    # full (B, heads, S, S); the pure-XLA alternative to `flash` for large S
    # where the materialized scores don't fit (S=4096 needs 8.6 GB f32)
    chunk_q: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        heads = max(1, c // self.head_dim)
        dim_head = c // heads

        if self.pallas_norm:
            hidden = GroupNormAct(
                num_groups=_norm_groups(c, self.norm_groups), epsilon=self.norm_eps,
                use_silu=False, pallas=True,
                dtype=self.dtype, param_dtype=self.param_dtype, name="group_norm",
            )(x)
        else:
            hidden = nn.GroupNorm(
                num_groups=_norm_groups(c, self.norm_groups), epsilon=self.norm_eps,
                dtype=self.dtype, param_dtype=self.param_dtype, name="group_norm",
            )(x)
        hidden = hidden.reshape(b, h * w, c)

        q = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_q")(hidden)
        k = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_k")(hidden)
        v = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_v")(hidden)

        def split_heads(t):
            return t.reshape(b, h * w, heads, dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / math.sqrt(dim_head)
        use_tiny = False
        if self.tiny_flash:
            import os

            from masked_diffusion_tpu.ops.pallas.tinyhead_attention import (
                tinyhead_attention,
                tinyhead_supported,
            )

            # like every pallas kernel here, production routing is TPU-only
            # (off-TPU falls back to the einsum, never to interpret-mode
            # emulation in a hot path); MDT_TINYHEAD_INTERPRET=1 is the test
            # hook that exercises the module routing on the CPU interpreter
            interpret = os.environ.get("MDT_TINYHEAD_INTERPRET") == "1"
            use_tiny = tinyhead_supported(h * w, dim_head) and (
                jax.default_backend() == "tpu" or interpret
            )
        if use_tiny:
            out = tinyhead_attention(q, k, v, scale, interpret=interpret)
        elif self.flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            out = flash_attention(q, k, v, sm_scale=scale)
        elif self.chunk_q:
            # exact attention, one query block at a time: lax.map compiles to
            # a scan whose live score tensor is (B, heads, chunk_q, S); this
            # family's head_dim=8 makes flash pad 16x on the lane axis, so a
            # chunked einsum is the XLA-native way to reach S where the full
            # scores don't fit
            bq = int(self.chunk_q)
            s = q.shape[2]
            pad = (-s) % bq
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else q
            nc = qp.shape[2] // bq
            qc = qp.reshape(b, heads, nc, bq, dim_head).transpose(2, 0, 1, 3, 4)

            def one_block(q_blk):
                a = jnp.einsum(
                    "bhsd,bhtd->bhst", q_blk, k,
                    preferred_element_type=jnp.float32,
                )
                a = jax.nn.softmax(a * scale, axis=-1).astype(v.dtype)
                return jnp.einsum("bhst,bhtd->bhsd", a, v)

            out = jax.lax.map(one_block, qc)
            out = out.transpose(1, 2, 0, 3, 4).reshape(b, heads, nc * bq, dim_head)
            out = out[:, :, :s]
        else:
            # (B, heads, S, S) attention — fused by XLA; S = H*W <= 4096 at
            # the reference's resolutions so the score matrix fits comfortably.
            attn = jnp.einsum(
                "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
            )
            attn = jax.nn.softmax(attn * scale, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhst,bhtd->bhsd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    layers_per_block: int = 2
    # attn_down: shallowest level first (diffusers down_block_types order);
    # attn_up: DEEPEST block first (diffusers up_block_types order)
    attn_down: Tuple[bool, ...] = (False, False, False, False, True, False)
    attn_up: Tuple[bool, ...] = (False, True, False, False, False, False)
    attention_head_dim: int = 8
    norm_groups: int = 32
    norm_eps: float = 1e-5
    dropout: float = 0.0
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    remat: bool = False  # jax.checkpoint each level (trade FLOPs for HBM)
    # fused Pallas GroupNorm+SiLU (ops/pallas/groupnorm.py): opt-in. Measured
    # on v5e at the flagship config it LOSES to XLA's two-pass GN (26.8 vs
    # 14.0 ms/step): the per-image kernel grid serializes what XLA batches,
    # and the forward already runs at ~84% of its HBM roofline. Kept as the
    # kernel seam for future multi-image blocking; None resolves to off.
    pallas_norm: Optional[bool] = None
    # stock Pallas TPU flash attention in every AttentionBlock: opt-in. At
    # this family's shapes (head_dim=8, S <= 4096 on downsampled levels) the
    # materialized-scores einsum is the measured-faster path — see
    # docs/PERFORMANCE.md "pallas verdicts"; None resolves to off.
    pallas_attention: Optional[bool] = None
    # exact chunked attention (AttentionBlock.chunk_q): query blocks of this
    # size bound the live score tensor to (B, heads, chunk, S) — the pure-XLA
    # route to S=4096+ where materialized scores don't fit and flash pads the
    # 8-wide heads 16x on the lane axis; None resolves to off.
    attention_chunk: Optional[int] = None
    # head-major tiny-head flash kernel (AttentionBlock.tiny_flash,
    # ops/pallas/tinyhead_attention.py): exact attention with scores
    # VMEM-resident and zero lane padding for the family's 8-wide heads.
    # Measured 2.4-2.5x faster than the einsum at S=256/1024 on the v5e
    # (docs/PERFORMANCE.md "pallas verdicts" b2), so None = AUTO: on for
    # single-device TPU runs (pallas_call has no GSPMD rule, so sharded
    # meshes stay on the einsum), MDT_TINYHEAD=1/0 forces. True/False is an
    # explicit override in either direction. Shapes outside the kernel's
    # support (S < 128 or head_dim > 8) always fall back to the einsum.
    tinyhead_attention: Optional[bool] = None

    def __post_init__(self):
        n = len(self.block_out_channels)
        if len(self.attn_down) != n or len(self.attn_up) != n:
            raise ValueError("attention placement length must match block count")


class UNet2D(nn.Module):
    """forward: (x NHWC, t) -> residual NHWC.

    The training contract matches the reference's model(x, t).sample usage
    (trainer_masked_mean_shift.py:140, sampler.py:145): the output is the
    residual added to the (shifted) degraded input to reconstruct x_0.
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        timesteps: Array,
        deterministic: bool = True,
        cached=None,
        return_cached: bool = False,
    ) -> Array:
        """`cached`/`return_cached` support encoder reuse across sampling
        steps ("Faster Diffusion", arXiv:2312.09608; PAPERS.md): with
        `return_cached=True` the call also returns the encoder state
        (post-middle hidden + skip activations); passing that state back as
        `cached` SKIPS conv_in + the down path + the middle blocks and runs
        only the up path on the replayed activations (x is then unused).
        Decode-given-cache is exact (tests/test_unet.py); reusing a cache
        across timesteps is the paper's approximation, wired as the
        sampler's opt-in --encoder_reuse (sample/loop.py)."""
        cfg = self.config
        ch = cfg.block_out_channels
        n_levels = len(ch)
        time_embed_dim = ch[0] * 4

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        # ---- time embedding
        temb = timestep_embedding(
            timesteps, ch[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = nn.Dense(
            time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_dense1",
        )(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(
            time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_dense2",
        )(temb)

        dtype_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pallas_norm = bool(cfg.pallas_norm) if cfg.pallas_norm is not None else False
        flash = bool(cfg.pallas_attention) if cfg.pallas_attention is not None else False
        block_kw = dict(
            norm_groups=cfg.norm_groups, norm_eps=cfg.norm_eps,
            pallas_norm=pallas_norm, **dtype_kw,
        )
        if cfg.tinyhead_attention is None:
            # auto never overrides an explicitly requested flash/chunk path
            # (tiny_flash outranks both in AttentionBlock's routing)
            tiny_flash = (
                not flash and not cfg.attention_chunk and _tinyhead_auto()
            )
        else:
            tiny_flash = bool(cfg.tinyhead_attention)
        attn_kw = dict(
            head_dim=cfg.attention_head_dim, flash=flash,
            chunk_q=cfg.attention_chunk,
            tiny_flash=tiny_flash,
            **block_kw,
        )
        res_kw = dict(dropout=cfg.dropout, **block_kw)
        # rematerialization via flax's LIFTED transform: jax.checkpoint around
        # a bound module call leaks tracers at init (param creation is a side
        # effect inside the checkpointed region); nn.remat threads the param
        # store through the transform. argnums count self, so `deterministic`
        # (self, x, temb, deterministic) is static argnum 3.
        ResBlock = (
            nn.remat(ResnetBlock, static_argnums=(3,)) if cfg.remat else ResnetBlock
        )

        if cached is None:
            # ---- encoder: conv_in -> down path -> middle
            h = nn.Conv(
                ch[0], (3, 3), padding=1, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_in",
            )(x.astype(self.dtype))
            skips = [h]
            for level in range(n_levels):
                for layer in range(cfg.layers_per_block):
                    h = ResBlock(ch[level], name=f"down_{level}_res_{layer}", **res_kw)(
                        h, temb, deterministic
                    )
                    if cfg.attn_down[level]:
                        h = AttentionBlock(
                            name=f"down_{level}_attn_{layer}", **attn_kw,
                        )(h)
                    skips.append(h)
                if level != n_levels - 1:
                    h = Downsample(
                        ch[level], name=f"down_{level}_downsample", **dtype_kw
                    )(h)
                    skips.append(h)

            # ---- middle
            h = ResnetBlock(ch[-1], name="mid_res_1", **res_kw)(h, temb, deterministic)
            h = AttentionBlock(name="mid_attn", **attn_kw)(h)
            h = ResnetBlock(ch[-1], name="mid_res_2", **res_kw)(h, temb, deterministic)
            new_cached = (h, tuple(skips))
        else:
            # replay the encoder state; only the up path runs (x unused) —
            # flax looks params up by name, so skipping the encoder modules
            # under apply() is fine (init always takes the cached=None path)
            h, cached_skips = cached
            h = h.astype(self.dtype)
            skips = [s.astype(self.dtype) for s in cached_skips]
            new_cached = cached

        # ---- up path (processing order: deepest level first). attn_up is in
        # diffusers up_block_types order — index 0 = deepest block (2x2 at
        # 64x64 input), matching utils/model.py:6-20 where e.g. num_attention=1
        # puts AttnUpBlock2D at position 1 (4x4), NOT at a shallow level.
        rev_ch = tuple(reversed(ch))
        for i in range(n_levels):
            for layer in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(self.dtype)], axis=-1)
                h = ResBlock(rev_ch[i], name=f"up_{i}_res_{layer}", **res_kw)(
                    h, temb, deterministic
                )
                if cfg.attn_up[i]:
                    h = AttentionBlock(
                        name=f"up_{i}_attn_{layer}", **attn_kw,
                    )(h)
            if i != n_levels - 1:
                h = Upsample(rev_ch[i], name=f"up_{i}_upsample", **dtype_kw)(h)

        # ---- out
        if pallas_norm:
            h = GroupNormAct(
                num_groups=_norm_groups(ch[0], cfg.norm_groups), epsilon=cfg.norm_eps,
                use_silu=True, pallas=True,
                dtype=self.dtype, param_dtype=self.param_dtype, name="norm_out",
            )(h)
        else:
            h = nn.GroupNorm(
                num_groups=_norm_groups(ch[0], cfg.norm_groups), epsilon=cfg.norm_eps,
                dtype=self.dtype, param_dtype=self.param_dtype, name="norm_out",
            )(h)
            h = nn.silu(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros,  # residual starts at zero
            bias_init=nn.initializers.zeros,
            name="conv_out",
        )(h)
        if return_cached:
            return h, new_cached
        return h


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
