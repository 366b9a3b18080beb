"""Source-separation ("specunet") task (reference helpers.py:1084-1181).

Trains a network mapping a mixed spectrogram → 2-channel output
(noise spectrogram, bird spectrogram) with MSE, on MixDataset-style batches
(audio/mix.py). Backbone = the transformer denoiser with out_channels=2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from spectrogramgenai_tpu.core.config import SpecUNetConfig
from spectrogramgenai_tpu.models.denoiser import TransformerDenoiser
from spectrogramgenai_tpu.train import common
from spectrogramgenai_tpu.train.state import TrainState, new_train_state


class SpecUNetTask:
    def __init__(self, cfg: SpecUNetConfig, mesh):
        self.cfg = cfg
        self.mesh = mesh
        dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
        self.denoise_mode = getattr(cfg, "mode", "separate") == "denoise"
        self.model = TransformerDenoiser(out_channels=1 if self.denoise_mode else 2, dtype=dt)
        self.tx = optax.adam(cfg.lr)

    def init_state(self, img_size: int = 256, seed: int | None = None) -> TrainState:
        seed = self.cfg.run.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_init, k_run = jax.random.split(key)
        x = jnp.zeros((1, img_size, img_size, 1))
        variables = self.model.init({"params": k_init}, x)
        state = new_train_state(variables["params"], self.tx, k_run)
        return common.shard_state(self.mesh, state, mode=self.cfg.run.param_sharding)

    def _train_step(self, state: TrainState, mix, noise_spec, bird_spec):
        rng, k_drop = jax.random.split(state.rng)
        if self.denoise_mode:
            target = noise_spec  # mix → noise component (x − net(x) usage)
        else:
            target = jnp.concatenate([noise_spec, bird_spec], axis=-1)

        def loss_fn(params, mix_b, target_b, key):
            pred = self.model.apply({"params": params}, mix_b, deterministic=False,
                                    rngs={"dropout": key})
            return jnp.mean((pred - target_b) ** 2)

        k = max(1, int(self.cfg.grad_accum))
        if k == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, mix, target, k_drop)
        else:
            # Gradient accumulation (train/common.py): one dropout key per
            # microbatch, averaged grads, one Adam update.
            xs = common.microbatch_split({"mix": mix, "target": target}, k, self.mesh)
            xs["key"] = jax.random.split(k_drop, k)

            def body(_, x):
                li, gi = jax.value_and_grad(loss_fn)(state.params, x["mix"], x["target"], x["key"])
                return None, {"grads": gi, "loss": li}

            _, out = common.microbatch_accumulate(body, None, xs, k)
            grads, loss = out["grads"], out["loss"]

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng), {
            "train_mse": loss
        }

    def make_train_step(self):
        return jax.jit(self._train_step, donate_argnums=(0,))

    def separate(self, state: TrainState, mix):
        pred = self.model.apply({"params": state.params}, mix, deterministic=True)
        return pred[..., :1], pred[..., 1:]
