"""Fixture-injected training parity vs the PyTorch twin (SURVEY.md §4,
BASELINE.md "loss curves match within tolerance at fixed seed").

Cross-framework RNG streams can't match, so the stochastic pieces (masks,
mean fills, timesteps) are precomputed ONCE in numpy and injected into both
frameworks: each side sees the same degraded inputs and targets, starts from
the same ported weights, and runs the same optimizer (Adam, lr 1e-3,
clip-by-global-norm 1.0). The per-step MSE losses must then track each other
to float32 tolerance for the parity claim to hold end-to-end through
forward, backward, clipping, and the optimizer update.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from benchmarks.torch_cpu_reference import build_torch_unet
from masked_diffusion_tpu.models.unet import UNet2D, UNetConfig
from tests.test_torch_parity import ATTN_DOWN, ATTN_UP, CHANNELS, LAYERS, port_weights

N_STEPS = 8
BATCH, SIZE = 4, 16
LR = 1e-3


def _fixtures():
    """Shared numpy fixtures: degraded inputs, clean targets, timesteps."""
    rng = np.random.default_rng(42)
    xs, ys, ts = [], [], []
    for _ in range(N_STEPS):
        clean = rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)
        # reference degradation D(x) = (1-m)*mu + m*x with an exact-k mask
        # and image-wise degraded-area mean (scheduler.py:266-323), done in
        # numpy so both frameworks see identical inputs
        masks = np.ones((BATCH, SIZE, SIZE, 1), np.float32)
        for b in range(BATCH):
            k = rng.integers(16, SIZE * SIZE - 16)
            idx = rng.permutation(SIZE * SIZE)[:k]
            m = masks[b].reshape(-1)
            m[idx] = 0.0
        inv = 1.0 - masks
        mu = (clean * inv).sum(axis=(1, 2, 3), keepdims=True) / np.maximum(
            inv.sum(axis=(1, 2, 3), keepdims=True), 1.0
        )
        degraded = inv * mu + masks * clean
        xs.append(degraded)
        ys.append(clean)
        ts.append(rng.integers(1, 100, (BATCH,)).astype(np.float32))
    return xs, ys, ts


def _torch_losses(tmodel, xs, ys, ts):
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    losses = []
    for x, y, t in zip(xs, ys, ts):
        opt.zero_grad()
        xin = torch.from_numpy(x.transpose(0, 3, 1, 2))
        out = tmodel(xin, torch.from_numpy(t))
        recon = xin + out
        loss = torch.mean((recon - torch.from_numpy(y.transpose(0, 3, 1, 2))) ** 2)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _jax_losses(jmodel, params, xs, ys, ts):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(LR))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, t):
        def loss_fn(p):
            out = jmodel.apply(p, x, t)
            recon = x + out
            return jnp.mean((recon - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for x, y, t in zip(xs, ys, ts):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(t)
        )
        losses.append(float(loss))
    return losses


def test_training_loss_parity():
    torch.manual_seed(0)
    tmodel = build_torch_unet(
        channels=CHANNELS, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN, attn_up=ATTN_UP, in_ch=3,
    )
    cfg = UNetConfig(
        sample_size=SIZE, in_channels=3, out_channels=3,
        block_out_channels=CHANNELS, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN, attn_up=ATTN_UP,
    )
    jmodel = UNet2D(config=cfg)
    # port_weights returns numpy VIEWS of the torch tensors, and jnp.asarray
    # zero-copies aligned arrays on CPU — torch's in-place optimizer updates
    # would then mutate the "ported" params. Deep-copy before converting.
    params = jax.tree.map(lambda a: jnp.asarray(np.array(a, copy=True)), port_weights(tmodel))

    xs, ys, ts = _fixtures()
    t_losses = _torch_losses(tmodel, xs, ys, ts)
    j_losses = _jax_losses(jmodel, params, xs, ys, ts)

    # identical inputs + weights + optimizer: losses track to fp32 tolerance
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)
    # and training actually makes progress on both sides
    assert t_losses[-1] < t_losses[0]
    assert j_losses[-1] < j_losses[0]


# ---------------------------------------------------------- mean-shift parity

# second topology (VERDICT r03 next-step 4): 3 levels, attention at the
# middle level both ways (attn_up deepest-first), so the shifted path crosses
# an attentive up block — the wiring the single-topology test never reached
CHANNELS2 = (64, 64, 128)
ATTN_DOWN2 = (False, True, False)
ATTN_UP2 = (False, True, False)


def _shift_fixtures():
    """Per-step per-image constant shifts (the 1-d_constant family,
    scheduler.py:616-651: one scalar per image broadcast over the mask),
    fixture-injected so both frameworks see identical shifted inputs."""
    rng = np.random.default_rng(77)
    return [
        rng.uniform(-0.5, 0.5, (BATCH, 1, 1, 1)).astype(np.float32)
        for _ in range(N_STEPS)
    ]


def _torch_losses_shift(tmodel, xs, ys, ts, shifts):
    """Mean-shift step: shift -> UNet -> recon in shifted space -> inverse
    shift -> MSE vs clean in UN-shifted space
    (trainer_masked_mean_shift.py:112-153)."""
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    losses = []
    for x, y, t, s in zip(xs, ys, ts, shifts):
        opt.zero_grad()
        s_t = torch.from_numpy(s.transpose(0, 3, 1, 2))
        xin = torch.from_numpy(x.transpose(0, 3, 1, 2)) + s_t
        out = tmodel(xin, torch.from_numpy(t))
        recon = (xin + out) - s_t
        loss = torch.mean((recon - torch.from_numpy(y.transpose(0, 3, 1, 2))) ** 2)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _jax_losses_shift(jmodel, params, xs, ys, ts, shifts):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(LR))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, t, s):
        def loss_fn(p):
            xin = x + s
            out = jmodel.apply(p, xin, t)
            recon = (xin + out) - s
            return jnp.mean((recon - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for x, y, t, s in zip(xs, ys, ts, shifts):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(t), jnp.asarray(s),
        )
        losses.append(float(loss))
    return losses


def test_mean_shift_training_loss_parity_second_topology():
    torch.manual_seed(1)
    tmodel = build_torch_unet(
        channels=CHANNELS2, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN2, attn_up=ATTN_UP2, in_ch=3,
    )
    cfg = UNetConfig(
        sample_size=SIZE, in_channels=3, out_channels=3,
        block_out_channels=CHANNELS2, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN2, attn_up=ATTN_UP2,
    )
    jmodel = UNet2D(config=cfg)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.array(a, copy=True)),
        port_weights(tmodel, CHANNELS2, LAYERS, ATTN_DOWN2, ATTN_UP2),
    )

    xs, ys, ts = _fixtures()
    shifts = _shift_fixtures()
    t_losses = _torch_losses_shift(tmodel, xs, ys, ts, shifts)
    j_losses = _jax_losses_shift(jmodel, params, xs, ys, ts, shifts)

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)
    assert t_losses[-1] < t_losses[0]
    assert j_losses[-1] < j_losses[0]
