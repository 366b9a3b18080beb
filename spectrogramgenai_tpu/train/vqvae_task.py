"""VQ-VAE training task (reference spec_vae.py:12-208).

Loss = MSE reconstruction + commitment(β·‖z − sg(z_q)‖²) + codebook loss,
Adam 2e-4. The EMA codebook update runs inside the jitted step via the
mutable ``codebook`` collection; with the batch sharded over the data axis
the EMA statistics are global-batch reductions (models/vqvae.py docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spectrogramgenai_tpu.core.config import VQVAEConfig
from spectrogramgenai_tpu.data.transforms import renorm_m1_1
from spectrogramgenai_tpu.models.vqvae import VQVAE
from spectrogramgenai_tpu.train import common
from spectrogramgenai_tpu.train.state import TrainState, new_train_state


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class VQVAETask:
    def __init__(self, cfg: VQVAEConfig, mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.model = VQVAE(
            input_dim=cfg.input_dim,
            hidden_dim=cfg.hidden_dim,
            latent_dim=cfg.latent_dim,
            n_embeddings=cfg.n_embeddings,
            commitment_cost=cfg.commitment_cost,
            ema_decay=cfg.ema_decay,
            ema_eps=cfg.ema_eps,
            dtype=_dtype(cfg.compute_dtype),
        )
        self.tx = common.make_adam(cfg.lr)

    def init_state(self, img_size: int = 256, seed: int | None = None) -> TrainState:
        seed = self.cfg.run.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_init, k_run = jax.random.split(key)
        x = jnp.zeros((1, img_size, img_size, self.cfg.input_dim), jnp.float32)
        variables = self.model.init({"params": k_init}, x)
        state = new_train_state(
            variables["params"], self.tx, k_run, stats={"codebook": variables["codebook"]}
        )
        return common.shard_state(self.mesh, state, mode=self.cfg.run.param_sharding)

    def variables(self, state: TrainState):
        """Full variable dict (params + codebook) — what latent diffusion loads."""
        return {"params": state.params, **state.stats}

    def _loss(self, params, stats, x):
        (x_hat, z, z_q, commit, codebook_loss, perplexity), updated = self.model.apply(
            {"params": params, **stats}, x, train=True, mutable=["codebook"]
        )
        recon = jnp.mean((x_hat - x) ** 2)
        loss = recon + commit + codebook_loss
        aux = {"recon_mse": recon, "commitment": commit, "codebook": codebook_loss,
               "perplexity": perplexity, "loss": loss}
        return loss, (aux, updated)

    def _train_step(self, state: TrainState, images: jax.Array):
        k = max(1, int(self.cfg.grad_accum))
        if k == 1:
            x = renorm_m1_1(images)
            (loss, (aux, updated)), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, state.stats, x)
            stats = dict(updated)
        else:
            # Gradient accumulation (train/common.py): the EMA codebook
            # threads through the scan carry, so microbatch i quantizes
            # against the codebook updated by microbatch i−1 — exactly the
            # semantics of feeding the chunks as successive batches, at one
            # optimizer update.
            xs = common.microbatch_split({"im": images}, k, self.mesh)

            def body(stats, xb):
                x = renorm_m1_1(xb["im"])
                (li, (aux_i, updated)), gi = jax.value_and_grad(self._loss, has_aux=True)(
                    state.params, stats, x)
                return dict(updated), {"grads": gi, **aux_i}

            stats, out = common.microbatch_accumulate(body, dict(state.stats), xs, k)
            grads = out.pop("grads")
            aux = out

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, stats=stats
        )
        return new_state, aux

    def make_train_step(self):
        return jax.jit(self._train_step, donate_argnums=(0,))

    def _eval_step(self, state: TrainState, images: jax.Array):
        x = renorm_m1_1(images)
        x_hat, z, z_q, commit, codebook_loss, perplexity = self.model.apply(
            {"params": state.params, **state.stats}, x, train=False
        )
        recon = jnp.mean((x_hat - x) ** 2)
        return {"val_loss": recon + commit + codebook_loss, "val_recon_mse": recon,
                "val_perplexity": perplexity}

    def make_eval_step(self):
        return jax.jit(self._eval_step)

    def reconstruct(self, state: TrainState, images: jax.Array):
        """(x_hat, z, z_q) for the recon-grid plots (spec_vae.py plot_images_torch)."""
        x = renorm_m1_1(images)
        x_hat, z, z_q, *_ = self.model.apply({"params": state.params, **state.stats}, x, train=False)
        return x_hat, z, z_q
