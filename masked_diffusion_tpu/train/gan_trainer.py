"""Legacy GAN/EBM trainer serving main_train.py.

The reference's legacy entry point (code/main_train.py:28) imports a
`trainer` module that does not exist in the repo — the path is dead as
checked in (SURVEY.md §0/§3.5). Its argparse surface (Langevin length/lr/
noise-lr, weight_reg, G/D optimizers with min/max LR) indicates an
EBM-flavored GAN: this module provides a working implementation so the entry
point runs:

  * non-saturating GAN losses on logits (BCE-with-logits),
  * optional Langevin refinement of latents against the discriminator energy
    (z <- z + lr/2 * grad_z D(G(z)) + noise_lr * eps, langevin_length steps),
  * logit L2 regularization scaled by weight_reg (EBM energy stabilizer),
  * cosine LR from lr_max to lr_min for both networks.

Both optimizer steps are one jitted program each; state is explicit.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from masked_diffusion_tpu.models.gan import Discriminator, Generator


class GANState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: any = flax.struct.field(pytree_node=True)
    d_params: any = flax.struct.field(pytree_node=True)
    g_opt: any = flax.struct.field(pytree_node=True)
    d_opt: any = flax.struct.field(pytree_node=True)


def _bce_logits(logits, target_ones: bool):
    # -log sigmoid(l) for ones, -log(1 - sigmoid(l)) for zeros
    if target_ones:
        return jnp.mean(jax.nn.softplus(-logits))
    return jnp.mean(jax.nn.softplus(logits))


class GANTrainer:
    def __init__(
        self,
        dim_latent: int = 100,
        dim_features: int = 32,
        out_channels: int = 1,
        lr_g: float = 2e-4,
        lr_d: float = 2e-4,
        lr_g_min: float = 0.0,
        lr_d_min: float = 0.0,
        total_steps: int = 10_000,
        weight_reg: float = 0.0,
        langevin_length: int = 0,
        langevin_lr: float = 0.0,
        langevin_noise_lr: float = 0.0,
        optim_name: str = "adam",
        seed: int = 0,
    ):
        self.dim_latent = dim_latent
        self.weight_reg = weight_reg
        self.langevin_length = int(langevin_length)
        self.langevin_lr = langevin_lr
        self.langevin_noise_lr = langevin_noise_lr

        self.G = Generator(dim_features=dim_features, out_channels=out_channels)
        self.D = Discriminator(dim_features=dim_features)

        def make_tx(lr_max, lr_min):
            sched = optax.cosine_decay_schedule(lr_max, max(1, total_steps), alpha=lr_min / max(lr_max, 1e-12))
            if optim_name.lower() == "sgd":
                return optax.sgd(sched)
            if optim_name.lower() == "adamw":
                return optax.adamw(sched)
            return optax.adam(sched)

        self.tx_g = make_tx(lr_g, lr_g_min)
        self.tx_d = make_tx(lr_d, lr_d_min)

        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        z0 = jnp.zeros((1, dim_latent))
        g_params = self.G.init(k1, z0)
        x0 = self.G.apply(g_params, z0)
        d_params = self.D.init(k2, x0)
        self.state = GANState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_opt=self.tx_g.init(g_params),
            d_opt=self.tx_d.init(d_params),
        )
        self._step = jax.jit(self._make_step())

    # ------------------------------------------------------------------
    def _refine_latent(self, d_params, g_params, z, key):
        """Langevin refinement against the discriminator energy."""
        if self.langevin_length <= 0:
            return z

        def energy(zz):
            return jnp.sum(self.D.apply(d_params, self.G.apply(g_params, zz)))

        def body(i, carry):
            z, key = carry
            key, k = jax.random.split(key)
            g = jax.grad(energy)(z)
            noise = jax.random.normal(k, z.shape)
            z = z + 0.5 * self.langevin_lr * g + self.langevin_noise_lr * noise
            return (z, key)

        z, _ = jax.lax.fori_loop(0, self.langevin_length, body, (z, key))
        return z

    def _make_step(self):
        def step(state: GANState, real, key):
            b = real.shape[0]
            k_z, k_langevin = jax.random.split(key)
            z = jax.random.normal(k_z, (b, self.dim_latent))
            z = self._refine_latent(state.d_params, state.g_params, z, k_langevin)

            fake = self.G.apply(state.g_params, z)

            # ---- D step
            def d_loss_fn(d_params):
                real_logits = self.D.apply(d_params, real)
                fake_logits = self.D.apply(d_params, jax.lax.stop_gradient(fake))
                loss = _bce_logits(real_logits, True) + _bce_logits(fake_logits, False)
                if self.weight_reg > 0:
                    loss = loss + self.weight_reg * (
                        jnp.mean(real_logits**2) + jnp.mean(fake_logits**2)
                    )
                return loss

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            d_updates, d_opt = self.tx_d.update(d_grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)

            # ---- G step (non-saturating)
            def g_loss_fn(g_params):
                fake2 = self.G.apply(g_params, z)
                return _bce_logits(self.D.apply(d_params, fake2), True)

            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
            g_updates, g_opt = self.tx_g.update(g_grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)

            new_state = GANState(
                step=state.step + 1, g_params=g_params, d_params=d_params,
                g_opt=g_opt, d_opt=d_opt,
            )
            return new_state, {"loss_d": d_loss, "loss_g": g_loss}

        return step

    # ------------------------------------------------------------------
    def train(self, dataset, batch_size: int, num_epochs: int, seed: int = 0,
              dirs=None, sample_every: int = 10) -> Dict:
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        history = []
        for epoch in range(num_epochs):
            losses = []
            for batch in dataset.epoch_batches(rng, batch_size):
                key, k = jax.random.split(key)
                self.state, metrics = self._step(self.state, jnp.asarray(batch), k)
                losses.append({k2: float(v) for k2, v in metrics.items()})
            if losses:
                history.append(
                    {k2: float(np.mean([m[k2] for m in losses])) for k2 in losses[0]}
                )
            if dirs is not None and (epoch + 1) % sample_every == 0:
                self._save_samples(dirs, epoch, key)
        return {"history": history}

    def sample(self, key, n: int = 64):
        z = jax.random.normal(key, (n, self.dim_latent))
        return self.G.apply(self.state.g_params, z)

    def _save_samples(self, dirs, epoch: int, key) -> None:
        from masked_diffusion_tpu.utils.grids import save_image_grid

        imgs = np.asarray(self.sample(key, 64))
        save_image_grid(
            imgs, "image", dirs.list_dir["sample_img"], f"gan_sample_{epoch:05d}.png"
        )
