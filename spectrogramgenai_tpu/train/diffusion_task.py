"""Conditional DDPM training/sampling task (pixel or VQ-VAE latent space).

Rebuilds the reference Diffusion / DiffusionVAE runtimes
(diff_modules.py:370-776) as jitted SPMD functions over the mesh:

  * train_step: renorm → [frozen VQ encode] → q-sample → UNet ε-MSE →
    AdamW/OneCycle update → EMA update — one fused jit, batch sharded over
    the data axis, params optionally TP-sharded over the model axis.
  * sample: the full 999-step reverse chain as one jitted lax.scan with
    batched CFG, ending (latent mode) with codebook quantize + decode —
    the BASELINE north-star hot loop.

Notable reference quirks preserved deliberately:
  * latent training diffuses the UNQUANTIZED encoder output; quantization
    happens only in the decode path (diff_modules.py:720,702-704).
  * EMA is implemented *correctly* here (the reference never instantiates
    its EMA model — SURVEY.md §2.2 M14), with warmup-copy semantics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from spectrogramgenai_tpu.core.config import DDPMConfig
from spectrogramgenai_tpu.core.ema import ema_init, ema_update
from spectrogramgenai_tpu.data.transforms import renorm_m1_1
from spectrogramgenai_tpu.diffusion.ddpm import (
    DiffusionSchedule,
    ddim_sample,
    dpmpp_sample,
    ddpm_sample,
    diffusion_loss,
    linear_schedule,
    to_uint8,
)
from spectrogramgenai_tpu.models.unet import ConditionalUNet
from spectrogramgenai_tpu.models.vqvae import VQVAE
from spectrogramgenai_tpu.train import common
from spectrogramgenai_tpu.train.state import TrainState, new_train_state


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class DiffusionTask:
    def __init__(self, cfg: DDPMConfig, mesh, total_steps: int, vq_variables: Any | None = None,
                 vqvae: VQVAE | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.schedule: DiffusionSchedule = linear_schedule(cfg.noise_steps, cfg.beta_start, cfg.beta_end)
        dt = _dtype(cfg.compute_dtype)

        if cfg.latent:
            self.sample_size = cfg.img_size // cfg.latent_downscale
            self.channels = cfg.latent_dim
            self.vqvae = vqvae if vqvae is not None else VQVAE(
                hidden_dim=cfg.vq_hidden_dim,
                latent_dim=cfg.latent_dim,
                n_embeddings=cfg.vq_n_embeddings,
                dtype=dt,
            )
            if vq_variables is None:
                raise ValueError("latent diffusion needs trained VQ-VAE variables (cfg.vqae_ckpt)")
            # jnp-ify: checkpoint restores hand back NumPy leaves, and NumPy
            # fancy-indexing with a traced index (codebook lookup inside the
            # jitted sampler) raises TracerArrayConversionError.
            self.vq_variables = jax.tree_util.tree_map(jnp.asarray, vq_variables)
        else:
            self.sample_size = cfg.img_size
            self.channels = cfg.c_in
            self.vqvae = None
            self.vq_variables = None

        on_tpu = jax.default_backend() == "tpu"
        self.model = ConditionalUNet(
            c_in=self.channels,
            c_out=self.channels,
            time_dim=cfg.time_dim,
            num_classes=cfg.num_classes,
            remove_deep_conv=cfg.remove_deep_conv,
            width_mult=cfg.width_mult,
            # The Pallas attention kernel is differentiable (flash-style
            # custom VJP, ops/attention.py) — training uses it too on TPU;
            # the 1024/4096-token score matrices never touch HBM in either
            # pass. CPU keeps the einsum path (tested for grad parity).
            fused_attention=on_tpu,
            # SA remat exists to keep the einsum path's score matrices out
            # of the saved residuals; the fused kernel never materializes
            # them, so remat there only costs recompute — measured
            # 354→385 img/s (batch 10) and 527→594 (batch 32) without it,
            # still inside 16 GB HBM.
            remat_attention=not on_tpu,
            dtype=dt,
        )
        # training and sampling share one architecture since the fused
        # attention kernel became differentiable (custom VJP)
        self.sample_model = self.model
        self.tx = common.make_adamw_onecycle(cfg.lr, total_steps, eps=cfg.adam_eps)
        self._jit_sampler = None

    # -- state -----------------------------------------------------------------
    def init_state(self, seed: int | None = None) -> TrainState:
        seed = self.cfg.run.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_init, k_run = jax.random.split(key)
        x = jnp.zeros((1, self.sample_size, self.sample_size, self.channels), jnp.float32)
        variables = self.model.init(k_init, x, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32), jnp.ones((1,)))
        params = variables["params"]
        state = new_train_state(params, self.tx, k_run, ema_params=ema_init(params))
        return common.shard_state(self.mesh, state, mode=self.cfg.run.param_sharding)

    # -- embedding into latent space --------------------------------------------
    def _encode(self, images: jax.Array) -> jax.Array:
        """[0,1] grayscale NHWC → model input space (reference one_epoch preamble)."""
        x = renorm_m1_1(images)
        if self.vqvae is not None:
            x = self.vqvae.apply(self.vq_variables, x, method=VQVAE.encode)
        return x

    def _apply(self, params, x, t, y, cond_mask):
        return self.model.apply({"params": params}, x, t, y, cond_mask)

    def _apply_sample(self, params, x, t, y, cond_mask):
        return self.sample_model.apply({"params": params}, x, t, y, cond_mask)

    def make_encoder(self):
        """Jitted dataset→latent batch encode, for latent caching (the encode
        is frozen + deterministic, so it can run once per image instead of
        once per image×epoch — measured 22% of the train step at batch 32,
        tools/train_ablation.py)."""
        return jax.jit(self._encode)

    # -- train ------------------------------------------------------------------
    def _train_step(self, state: TrainState, images: jax.Array, labels: jax.Array,
                    encoded: bool = False):
        rng, step_key = jax.random.split(state.rng)

        def loss_fn(params, imgs, labs, key):
            x = imgs if encoded else self._encode(imgs)
            return diffusion_loss(
                self._apply, params, self.schedule, x, labs, key, self.cfg.label_drop
            )

        k = max(1, int(self.cfg.grad_accum))
        if k == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, images, labels, step_key)
        else:
            # Gradient accumulation (train/common.py helpers): only one
            # microbatch's activations are ever live (the VQ encode
            # included), so the effective batch scales past per-chip HBM.
            # Each microbatch draws its own t/noise/CFG-drop key; averaged
            # grads → one optimizer + EMA update, one LR-schedule tick.
            xs = common.microbatch_split({"im": images, "la": labels}, k, self.mesh)
            xs["key"] = jax.random.split(step_key, k)

            def body(_, x):
                li, gi = jax.value_and_grad(loss_fn)(state.params, x["im"], x["la"], x["key"])
                return None, {"grads": gi, "loss": li}

            _, acc = common.microbatch_accumulate(body, None, xs, k)
            grads, loss = acc["grads"], acc["loss"]
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.step, self.cfg.ema_beta, self.cfg.ema_start)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema_params, rng=rng
        )
        return new_state, {"train_mse": loss}

    def make_train_step(self, encoded: bool = False):
        """``encoded=True`` compiles the latent-cached variant: the batch is
        already model-space latents (make_encoder output) and the in-step
        renorm + frozen VQ encode is skipped. Same math as the image path
        (encode is frozen + deterministic; the rng split structure is
        unchanged) — exact in f32; bf16 can differ in the last bit because
        the encode runs in its own program (see data/latent_cache.py)."""
        import functools

        return jax.jit(functools.partial(self._train_step, encoded=encoded),
                       donate_argnums=(0,))

    def _eval_step(self, state: TrainState, images: jax.Array, labels: jax.Array, key):
        x = self._encode(images)
        loss = diffusion_loss(self._apply, state.params, self.schedule, x, labels, key, label_drop=0.0)
        return {"val_mse": loss}

    def make_eval_step(self):
        return jax.jit(self._eval_step)

    # -- sampling ----------------------------------------------------------------
    def _sample(self, params, key: jax.Array, labels: jax.Array, cfg_scale: float,
                sampler: str = "ddpm", num_steps: int = 50):
        shape = (self.sample_size, self.sample_size, self.channels)
        if sampler == "ddim":
            x = ddim_sample(self._apply_sample, params, self.schedule, key, labels, shape,
                            num_steps=num_steps, cfg_scale=cfg_scale)
        elif sampler == "dpmpp":
            x = dpmpp_sample(self._apply_sample, params, self.schedule, key, labels, shape,
                             num_steps=num_steps, cfg_scale=cfg_scale)
        else:
            x = ddpm_sample(self._apply_sample, params, self.schedule, key, labels, shape,
                            cfg_scale=cfg_scale)
        if self.vqvae is not None:
            # clamp → quantize → decode → uint8 (diff_modules.py:702-707)
            x = jnp.clip(x, -1.0, 1.0)
            x = self.vqvae.apply(self.vq_variables, x, method=VQVAE.decode_quantized)
            return ((jnp.clip(x, -1.0, 1.0) + 1.0) / 2.0 * 255.0).astype(jnp.uint8)
        return to_uint8(x)

    def make_sampler(self):
        """One jitted sampler per task — cached so repeated sample() calls
        (e.g. the generate CLI's rounds-per-chain loop) reuse the same trace
        instead of re-tracing the 999-step scan every round."""
        if self._jit_sampler is None:
            self._jit_sampler = jax.jit(
                self._sample, static_argnames=("cfg_scale", "sampler", "num_steps")
            )
        return self._jit_sampler

    def sample(self, state: TrainState, key, labels, use_ema: bool = False,
               cfg_scale: float | None = None, sampler: str = "ddpm", num_steps: int = 50):
        """Generate samples; on a multi-device mesh the label batch is sharded
        over the data axis so each chip runs an independent slice of the
        reverse chain (sampling is embarrassingly data-parallel)."""
        from spectrogramgenai_tpu.core.mesh import DATA_AXIS, batch_sharding

        params = state.ema_params if use_ema else state.params
        cfg_scale = self.cfg.cfg_scale if cfg_scale is None else cfg_scale
        if self.mesh.shape[DATA_AXIS] > 1 and labels.shape[0] % self.mesh.shape[DATA_AXIS] == 0:
            labels = jax.device_put(labels, batch_sharding(self.mesh))
        return self.make_sampler()(params, key, labels, cfg_scale=cfg_scale,
                                   sampler=sampler, num_steps=num_steps)
