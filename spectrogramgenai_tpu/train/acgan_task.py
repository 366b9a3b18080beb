"""ACGAN training task (reference train_acgan.py:16-344).

Two-player loop as ONE jitted SPMD step: G-step (BCE real/fake + NLL class,
halved) then D-step on real and detached fake (quarter-weighted sums),
RMSprop(lr 0.002) on both nets, optional acoustic-index regression head
(use_aind) and optional transformer-denoiser preprocessing.

State plumbing the reference gets for free from torch mutability is explicit
here: BatchNorm stats + spectral-norm power-iteration vectors live in the
`stats` collections of the generator/discriminator and are threaded through
the step (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from spectrogramgenai_tpu.core.config import ACGANConfig
from spectrogramgenai_tpu.data.transforms import renorm_m1_1
from spectrogramgenai_tpu.models.gan import Discriminator, Generator
from spectrogramgenai_tpu.train import common


class GANTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_stats: Any
    g_opt: Any
    d_params: Any
    d_stats: Any
    d_opt: Any
    rng: jax.Array


def bce(pred, target):
    """torch nn.BCELoss on sigmoid outputs (mean)."""
    eps = 1e-7
    pred = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target) * jnp.log(1.0 - pred))


def nll(log_probs, labels):
    """torch nn.NLLLoss on log-softmax outputs (mean)."""
    return -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=1))


class ACGANTask:
    def __init__(self, cfg: ACGANConfig, mesh, denoiser_apply=None):
        self.cfg = cfg
        self.mesh = mesh
        dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
        self.total_noise = cfg.noise_dim + cfg.num_classes + (cfg.n_ind if cfg.use_aind else 0)
        self.generator = Generator(noise_dim=self.total_noise, dtype=dt)
        self.discriminator = Discriminator(
            n_classes=cfg.num_classes, n_ind=cfg.n_ind if cfg.use_aind else None, dtype=dt
        )
        self.g_tx = common.make_rmsprop(cfg.lr, cfg.rmsprop_alpha, cfg.rmsprop_eps)
        self.d_tx = common.make_rmsprop(cfg.lr, cfg.rmsprop_alpha, cfg.rmsprop_eps)
        self.denoiser_apply = denoiser_apply  # optional: x ← renorm(x − denoise(x))
        self.img_size = cfg.data.img_size

    def init_state(self, seed: int | None = None) -> GANTrainState:
        seed = self.cfg.run.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        kg, kd, krun = jax.random.split(key, 3)
        g_vars = self.generator.init(kg, jnp.zeros((1, self.total_noise)), train=False)
        d_vars = self.discriminator.init(kd, jnp.zeros((1, self.img_size, self.img_size, 1)), train=False)
        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            g_stats=g_vars.get("batch_stats", {}),
            g_opt=self.g_tx.init(g_vars["params"]),
            d_params=d_vars["params"],
            d_stats=d_vars.get("batch_stats", {}),
            d_opt=self.d_tx.init(d_vars["params"]),
            rng=krun,
        )
        return common.shard_state(self.mesh, state, mode=self.cfg.run.param_sharding)

    # -- noise construction (train_acgan.py:235-248) ---------------------------
    def build_noise(self, key, labels, a_ind=None):
        n = labels.shape[0]
        z = jax.random.normal(key, (n, self.total_noise))
        onehot = jax.nn.one_hot(labels, self.cfg.num_classes, dtype=z.dtype)
        z = z.at[:, : self.cfg.num_classes].set(onehot)
        if a_ind is not None:
            z = z.at[:, self.cfg.num_classes : self.cfg.num_classes + a_ind.shape[-1]].set(a_ind)
        return z

    def _preprocess(self, images):
        x = renorm_m1_1(images)
        if self.denoiser_apply is not None:
            x = renorm_m1_1(x - self.denoiser_apply(x))
        return x

    def _micro_grads(self, state: GANTrainState, g_stats, d_stats, images, labels,
                     a_ind, k_noise, k_labels):
        """One microbatch's G and D gradients at the CURRENT params, with
        BatchNorm/spectral-norm stats threaded in (and the updated stats
        returned) — the shared core of the plain step and the grad-accum scan
        body. Gradients for both players are taken before either update, as
        in the reference loop (G's fakes are judged by the pre-step D, D sees
        the pre-step G's detached fakes, train_acgan.py:232-299)."""
        cfg = self.cfg
        n = images.shape[0]
        real = self._preprocess(images)

        valid = jnp.ones((n, 1), jnp.float32)
        fake = jnp.zeros((n, 1), jnp.float32)
        fake_labels = jax.random.randint(k_labels, (n,), 0, cfg.num_classes)
        z = self.build_noise(k_noise, fake_labels, a_ind if cfg.use_aind else None)

        # ---------------- G grads ------------------------------------------
        def g_loss_fn(g_params):
            gen_imgs, g_updated = self.generator.apply(
                {"params": g_params, "batch_stats": g_stats}, z, train=True,
                mutable=["batch_stats"],
            )
            # D is a fixed judge inside the G step (no stats update).
            outs = self.discriminator.apply(
                {"params": state.d_params, "batch_stats": d_stats}, gen_imgs, train=False
            )
            if cfg.use_aind:
                validity, pred_label, aind_out = outs
                # literal 0.33 multiplier, matching train_acgan.py:259 exactly
                loss = 0.33 * (bce(validity, valid) + nll(pred_label, fake_labels)
                               + jnp.mean((aind_out - a_ind) ** 2))
            else:
                validity, pred_label = outs
                loss = 0.5 * (bce(validity, valid) + nll(pred_label, fake_labels))
            return loss, (gen_imgs, g_updated)

        (loss_g, (gen_imgs, g_updated)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )

        # ---------------- D grads ------------------------------------------
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            variables = {"params": d_params, "batch_stats": d_stats}
            outs_real, d_updated = self.discriminator.apply(
                variables, real, train=True, mutable=["batch_stats"]
            )
            outs_fake, d_updated2 = self.discriminator.apply(
                {"params": d_params, **d_updated}, gen_detached, train=True, mutable=["batch_stats"]
            )
            if cfg.use_aind:
                real_pred, real_aux, aind_r = outs_real
                fake_pred, fake_aux, aind_f = outs_fake
                d_real = 0.33 * (bce(real_pred, valid) + nll(real_aux, labels) + jnp.mean((aind_r - a_ind) ** 2))
                d_fake = 0.33 * (bce(fake_pred, fake) + nll(fake_aux, fake_labels) + jnp.mean((aind_f - a_ind) ** 2))
            else:
                real_pred, real_aux = outs_real
                fake_pred, fake_aux = outs_fake
                d_real = (bce(real_pred, valid) + nll(real_aux, labels)) / 2.0
                d_fake = (bce(fake_pred, fake) + nll(fake_aux, fake_labels)) / 2.0
            loss = (d_real + d_fake) / 2.0
            # discriminator class accuracy over real+fake (train_acgan.py:294-296)
            preds = jnp.concatenate([jnp.argmax(real_aux, 1), jnp.argmax(fake_aux, 1)])
            gts = jnp.concatenate([labels, fake_labels])
            acc = jnp.mean((preds == gts).astype(jnp.float32))
            return loss, (d_updated2, acc)

        (loss_d, (d_updated, d_acc)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        metrics = {"loss_G": loss_g, "loss_D": loss_d, "d_acc": d_acc}
        return (g_updated["batch_stats"], d_updated["batch_stats"],
                g_grads, d_grads, metrics)

    def _train_step(self, state: GANTrainState, images: jax.Array, labels: jax.Array, a_ind=None):
        cfg = self.cfg
        rng, k_noise, k_labels = jax.random.split(state.rng, 3)
        k = max(1, int(cfg.grad_accum))

        if k == 1:
            g_stats, d_stats, g_grads, d_grads, metrics = self._micro_grads(
                state, state.g_stats, state.d_stats, images, labels, a_ind, k_noise, k_labels
            )
        else:
            # Gradient accumulation (train/common.py): both players' grads
            # accumulate at the pre-step params across k microbatches
            # (fresh noise/fake-labels per microbatch), BN stats thread
            # through the carry, then ONE RMSprop update each.
            tree = {"im": images, "la": labels}
            if a_ind is not None:
                tree["aind"] = a_ind
            xs = common.microbatch_split(tree, k, self.mesh)
            xs["k_noise"] = jax.random.split(k_noise, k)
            xs["k_labels"] = jax.random.split(k_labels, k)

            def body(carry, x):
                g_st, d_st = carry
                g_st, d_st, gg, dg, m = self._micro_grads(
                    state, g_st, d_st, x["im"], x["la"], x.get("aind"),
                    x["k_noise"], x["k_labels"]
                )
                return (g_st, d_st), {"g_grads": gg, "d_grads": dg, **m}

            (g_stats, d_stats), out = common.microbatch_accumulate(
                body, (state.g_stats, state.d_stats), xs, k
            )
            g_grads, d_grads = out["g_grads"], out["d_grads"]
            metrics = {n: out[n] for n in ("loss_G", "loss_D", "d_acc")}

        g_upd, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_upd)
        d_upd, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_upd)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_stats=g_stats,
            g_opt=g_opt,
            d_params=d_params,
            d_stats=d_stats,
            d_opt=d_opt,
            rng=rng,
        )
        return new_state, metrics

    def make_train_step(self):
        return jax.jit(self._train_step, donate_argnums=(0,))

    def generate(self, state: GANTrainState, z: jax.Array):
        """Eval-noise sample grids (train_acgan.py:324)."""
        return self.generator.apply(
            {"params": state.g_params, "batch_stats": state.g_stats}, z, train=False
        )
