"""Cross-framework reverse-loop parity (VERDICT r4 next-step 6).

test_torch_parity pins the UNet forward and test_train_parity the train-step
loss, but the sampling loop — shift -> model -> inverse shift -> degrade(t),
degrade(t-1) -> update rule (reference sampler.py:109-261) — was verified
only against this repo's own reading of the reference. This test
transliterates that loop into the torch twin and runs both frameworks for a
few steps on IDENTICAL inputs:

  * weights ported from the torch twin (tests/test_torch_parity.port_weights),
  * masks and shifts replaced by FIXTURES — deterministic functions of a
    fixed uniform field shared by both sides (cross-framework RNG streams
    can't match, SURVEY.md §4) — monkeypatched into the jax loop's degrade/
    shift ops and computed inline on the torch side,
  * the same schedule tables (ops/schedule.build_schedule) on both sides.

Final-sample parity over N steps then pins every x_{t-1} of the
dependency x rule grid: any misreading of the update rules
(sampler.py:199-250), the t/t-1 degrade pairing (:167-196), the
dependent-mask carry (:184-196), or the shift round-trip (:142-152) shifts
the result.

Deliberate deviations preserved on BOTH sides (documented in ops/degrade.py):
the degraded_area mean guards a zero degraded-pixel count to 0 (the fill is
inert there; the reference NaN-poisons the image), 'momentum' zero-inits its
EMA buffer (the reference reads an undefined variable on step one), and
'boosting' reproduces the reference's effective momentum-overwrite
(sampler.py:248-249).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from benchmarks.torch_cpu_reference import build_torch_unet
from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.models.unet import UNet2D, UNetConfig
from masked_diffusion_tpu.ops import degrade as degrade_ops
from masked_diffusion_tpu.ops import shift as shift_ops
from masked_diffusion_tpu.ops.schedule import build_schedule
from masked_diffusion_tpu.sample import make_sample_fn
from tests.test_torch_parity import (
    ATTN_DOWN,
    ATTN_UP,
    CHANNELS,
    LAYERS,
    port_weights,
)

SIZE = 16
N = 2
T = 5
MOMENTUM_RATE = 0.1

# ---------------------------------------------------------------- fixtures
# One fixed uniform field drives every mask on both sides; masks at two
# amounts are nested (same field, two thresholds) which is fine for wiring
# parity — the loop structure, not mask randomness, is under test.
_rng = np.random.default_rng(42)
U_NP = _rng.uniform(size=(N, SIZE, SIZE, 1)).astype(np.float32)
_flat = U_NP.reshape(N, -1)
RANK_NP = (
    np.argsort(np.argsort(_flat, axis=1), axis=1)
    .reshape(N, SIZE, SIZE, 1)
    .astype(np.float32)
)
SHIFT_DRAW_NP = _rng.uniform(-1.0, 1.0, size=(N,)).astype(np.float32)


def _fixture_masks_jax(amount, select):
    a = amount.astype(jnp.float32)[:, None, None, None]
    if select == "thresholding":
        return (jnp.asarray(U_NP) > a).astype(jnp.float32)
    # indexing: degrade the `amount` lowest-rank pixels (exact count)
    return (jnp.asarray(RANK_NP) >= a).astype(jnp.float32)


def fixture_independent_jax(
    key, img, amount, select_degrade_pixel, degrade_channel,
    mean_option, mean_area, mesh=None,
):
    masks = jnp.broadcast_to(
        _fixture_masks_jax(amount, select_degrade_pixel), img.shape
    )
    mean_pixel = degrade_ops.compute_mean_pixel(img, masks, mean_option, mean_area)
    degraded = (1.0 - masks) * mean_pixel + masks * img
    return degraded, masks, jnp.broadcast_to(mean_pixel, img.shape)


def fixture_dependent_jax(
    key, img, amount_t, amount_next_t, degrade_channel, mean_option, mean_area,
):
    out = []
    for amount in (amount_t, amount_next_t):
        masks = jnp.broadcast_to(
            _fixture_masks_jax(amount, "thresholding"), img.shape
        )
        mean_pixel = degrade_ops.compute_mean_pixel(
            img, masks, mean_option, mean_area
        )
        degraded = (1.0 - masks) * mean_pixel + masks * img
        out += [degraded, masks, jnp.broadcast_to(mean_pixel, img.shape)]
    return tuple(out)


def fixture_shift_jax(
    key, ratios_t, shape, shift_type, noise_mean=0.0, dtype=jnp.float32,
    combine_perturbation=False,
):
    if shift_type == "non_shift":
        return jnp.zeros(shape, dtype)
    # deterministic 1-d_constant analogue: fixed per-image draw x ratio
    shift = (jnp.asarray(SHIFT_DRAW_NP) * ratios_t.astype(jnp.float32))[
        :, None, None, None
    ]
    return jnp.broadcast_to(shift.astype(dtype), shape)


# ----------------------------------------------------- torch transliteration


def _mean_pixel_torch(img, masks, mean_option, mean_area):
    """scheduler.py:451-469 mean fills (with the documented zero-count guard
    of ops/degrade.compute_mean_pixel applied identically)."""
    inv = 1.0 - masks
    if mean_option == "degraded_area":
        dims = (1, 2, 3) if mean_area == "image-wise" else (2, 3)
        s = (img * inv).sum(dim=dims, keepdim=True)
        c = inv.sum(dim=dims, keepdim=True)
        return torch.where(c > 0, s / c.clamp(min=1.0), torch.zeros_like(s))
    if mean_option == "non_degraded_area":
        s = (img * masks).sum(dim=(2, 3), keepdim=True)
        c = inv.sum(dim=(2, 3), keepdim=True)
        m = torch.where(c > 0, s / c.clamp(min=1.0) * -1.0, torch.zeros_like(s))
        return m
    return torch.full(
        (img.shape[0], img.shape[1], 1, 1), float(mean_option)
    )


def _fixture_masks_torch(amount, select):
    u = torch.from_numpy(U_NP.transpose(0, 3, 1, 2))  # (N,1,H,W)
    rank = torch.from_numpy(RANK_NP.transpose(0, 3, 1, 2))
    a = torch.as_tensor(amount, dtype=torch.float32)[:, None, None, None]
    if select == "thresholding":
        return (u > a).float()
    return (rank >= a).float()


def _degrade_fixture_torch(img, amount, select, mean_option, mean_area):
    masks = _fixture_masks_torch(amount, select).expand_as(img)
    m = _mean_pixel_torch(img, masks, mean_option, mean_area)
    return (1.0 - masks) * m + masks * img, masks


def torch_reverse_loop(
    tmodel, amounts, shift_ratios, used, dependency, rule, select,
    shift_on, latent_value, mean_option="degraded_area", mean_area="image-wise",
):
    """Transliteration of _sample_mean_shift_momentum (sampler.py:109-261)
    with fixture masks/shifts: for i = len(used)-1 .. 0: shift (:142-143) ->
    model (:145) -> inverse shift (:152) -> next_t (:166-169) -> degrade per
    dependency (:175-196) -> update per rule (:199-250)."""
    sample_t = torch.full((N, 3, SIZE, SIZE), latent_value)
    mask_next_prev = torch.zeros_like(sample_t)  # sampler.py:111-113
    momentum = torch.zeros_like(sample_t)  # deliberate zero-init (module doc)
    shift_draw = torch.from_numpy(SHIFT_DRAW_NP)
    sample_0 = sample_t

    with torch.no_grad():
        for i in range(len(used) - 1, -1, -1):
            t = int(used[i])
            tvec = torch.full((N,), float(t))
            if shift_on:
                shift = (shift_draw * float(shift_ratios[t - 1]))[
                    :, None, None, None
                ]
            else:
                shift = torch.zeros(1)
            shifted = sample_t + shift  # perturb_shift (scheduler.py:757-766)
            out = tmodel(shifted, tvec)
            shifted_0 = shifted + out  # sampler.py:146
            sample_0 = shifted_0 - shift  # perturb_shift_inverse (:769-777)

            next_t = t - 1 if i > 0 else t  # sampler.py:166-169
            a_t = amounts[t - 1 : t].repeat(N)
            a_next = amounts[next_t - 1 : next_t].repeat(N)

            if dependency == "independent":  # sampler.py:175-181
                degraded_t, _ = _degrade_fixture_torch(
                    sample_0, a_t, select, mean_option, mean_area
                )
                degraded_next, mask_next = _degrade_fixture_torch(
                    sample_0, a_next, select, mean_option, mean_area
                )
            elif dependency == "dependent_prev":  # sampler.py:184-188
                m = _mean_pixel_torch(
                    sample_0, mask_next_prev, mean_option, mean_area
                )
                degraded_t = (
                    (1.0 - mask_next_prev) * m + mask_next_prev * sample_0
                )
                degraded_next, mask_next = _degrade_fixture_torch(
                    sample_0, a_next, select, mean_option, mean_area
                )
            else:  # dependent_t, sampler.py:191-196 (shared field, two levels)
                degraded_t, _ = _degrade_fixture_torch(
                    sample_0, a_t, "thresholding", mean_option, mean_area
                )
                degraded_next, mask_next = _degrade_fixture_torch(
                    sample_0, a_next, "thresholding", mean_option, mean_area
                )
            mask_next_prev = mask_next

            if rule == "base_sampling":  # sampler.py:199-207
                if i == 0:
                    break
                sample_t = degraded_next
            elif rule == "base_momentum":  # sampler.py:209-216
                if i > 0:
                    sample_t = sample_t + degraded_next - degraded_t
            elif rule == "momentum":  # sampler.py:229-237
                diff = sample_t - degraded_t
                momentum = (1 - MOMENTUM_RATE) * momentum + MOMENTUM_RATE * diff
                sample_t = momentum + degraded_next
            else:  # boosting — effective behavior, sampler.py:239-250
                momentum = sample_t - degraded_t
                sample_t = momentum + degraded_next
    return sample_0


# ------------------------------------------------------------------- the test


@pytest.fixture(scope="module")
def twins():
    torch.manual_seed(3)
    tmodel = build_torch_unet(
        channels=CHANNELS, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN, attn_up=ATTN_UP, in_ch=3,
    ).eval()
    jcfg = UNetConfig(
        sample_size=SIZE, in_channels=3, out_channels=3,
        block_out_channels=tuple(CHANNELS), layers_per_block=LAYERS,
        attn_down=tuple(ATTN_DOWN), attn_up=tuple(ATTN_UP),
    )
    jmodel = UNet2D(config=jcfg)
    # port_weights returns numpy VIEWS of torch tensors — fine here (no torch
    # training), converted to device arrays immediately
    params = jax.tree.map(jnp.asarray, port_weights(tmodel))
    return tmodel, jmodel, params


def _run_cell(twins, monkeypatch, dependency, rule, select, shift_on):
    tmodel, jmodel, params = twins
    schedule_name = "log" if select == "indexing" else "linear"
    cfg = Config(
        method="mean_shift", data_size=SIZE, ddpm_schedule=schedule_name,
        ddpm_num_steps=T, select_degrade_pixel=select,
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise",
        shift_type="1-d_constant" if shift_on else "non_shift",
        sample_num=N, out_channel=3, sampling_mask_dependency=dependency,
        momentum_adaptive=rule, adaptive_momentum_rate=MOMENTUM_RATE,
        mixed_precision="no",
    )
    schedule = build_schedule(schedule_name, T, SIZE, select)
    used = schedule.timesteps_for_epoch(0, 10, scale=1)

    monkeypatch.setattr(
        degrade_ops, "degrade_independent_base_sampling", fixture_independent_jax
    )
    monkeypatch.setattr(
        degrade_ops, "degrade_dependent_base_sampling", fixture_dependent_jax
    )
    monkeypatch.setattr(shift_ops, "schedule_shift", fixture_shift_jax)

    latent_value = 0.25
    fn = make_sample_fn(jmodel, schedule, cfg, used)
    latent = jnp.full((N, SIZE, SIZE, 3), latent_value, jnp.float32)
    j_out = np.asarray(fn(params, latent, jax.random.PRNGKey(0)))

    tmax = int(np.max(np.asarray(used)))
    amounts = torch.from_numpy(
        np.asarray(schedule.degrade_amount(jnp.arange(1, tmax + 1)), np.float32)
    )
    shift_ratios = np.asarray(
        schedule.shift_ratio(jnp.arange(1, tmax + 1)), np.float32
    )
    t_out = (
        torch_reverse_loop(
            tmodel, amounts, shift_ratios, np.asarray(used), dependency, rule,
            select, shift_on, latent_value,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    assert np.isfinite(j_out).all() and np.isfinite(t_out).all()
    np.testing.assert_allclose(j_out, t_out, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize(
    "dependency", ["independent", "dependent_prev", "dependent_t"]
)
@pytest.mark.parametrize(
    "rule", ["base_sampling", "base_momentum", "momentum", "boosting"]
)
def test_reverse_loop_parity_grid(twins, monkeypatch, dependency, rule):
    """Full dependency x rule grid at thresholding (every cell runnable)."""
    _run_cell(twins, monkeypatch, dependency, rule, "thresholding", False)


def test_reverse_loop_parity_indexing(twins, monkeypatch):
    """Reference-default selection (indexing, main_train_masked.py:395) with
    exact-count fixture masks on the log schedule."""
    _run_cell(
        twins, monkeypatch, "independent", "base_momentum", "indexing", False
    )


def test_reverse_loop_parity_with_shift(twins, monkeypatch):
    """Mean-shift on: the shift -> forward -> inverse-shift round trip
    (sampler.py:142-152) with a deterministic 1-d_constant analogue."""
    _run_cell(
        twins, monkeypatch, "independent", "base_momentum", "thresholding", True
    )
