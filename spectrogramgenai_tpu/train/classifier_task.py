"""Classifier training task (reference helpers.py:581-929, train_classifiers.py).

Per-step: renorm → [denoiser] → channel adapt → forward → CE
[+ knowledge distillation against BirdNET embeddings: KL at T=3, α=0.7] →
Adam(1e-3) with the reference's layer-freeze policy applied as an optax mask.
Evaluation streams logits into eval/classification.ClassificationMetrics
(macro P/R/F1, acc, top-1/3/5).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import optax

from spectrogramgenai_tpu.core.config import ClassifierConfig
from spectrogramgenai_tpu.data.transforms import expand_channels, renorm_m1_1
from spectrogramgenai_tpu.models.classifiers import MODEL_CHANNELS, build_classifier, trainable_mask
from spectrogramgenai_tpu.train import common
from spectrogramgenai_tpu.train.state import TrainState, new_train_state


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(logits, -1), labels[:, None], axis=1))


def kd_loss(logits: jax.Array, teacher_emb: jax.Array, temperature: float) -> jax.Array:
    """BirdNET-embedding distillation (helpers.py:450-457): KL between
    softened teacher logits and student log-probs, scaled by T²."""
    soft_targets = jax.nn.softmax(teacher_emb / temperature, axis=-1)
    soft_prob = jax.nn.log_softmax(logits / temperature, axis=-1)
    per_batch = jnp.sum(soft_targets * (jnp.log(soft_targets + 1e-12) - soft_prob))
    return per_batch / logits.shape[0] * temperature**2


class ClassifierTask:
    def __init__(self, cfg: ClassifierConfig, mesh, denoiser_apply=None):
        self.cfg = cfg
        self.mesh = mesh
        dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
        # freeze_prefix matches the optax trainable_mask applied below: the
        # reference's requires_grad=False layers never get a backward pass
        # (helpers.py:317-345), so neither should XLA build one
        self.model = build_classifier(cfg.model_name, cfg.num_classes, dtype=dt,
                                      freeze_prefix=True)
        self.n_channel = MODEL_CHANNELS.get(
            {"resnet18": "resnet", "vgg16": "vgg", "mobilenet_v2": "mobilenet"}.get(cfg.model_name, cfg.model_name),
            1,
        )
        self.denoiser_apply = denoiser_apply
        self.tx = None  # built in init_state (needs params for the mask)

    def init_state(self, img_size: int = 256, seed: int | None = None,
                   pretrained_path: str | None = None) -> TrainState:
        cfg = self.cfg
        seed = cfg.run.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_init, k_drop, k_run = jax.random.split(key, 3)
        x = jnp.zeros((1, img_size, img_size, self.n_channel if cfg.model_name != "ensemble" else 1))
        variables = self.model.init({"params": k_init, "dropout": k_drop}, x, train=False)
        params = variables["params"]

        if pretrained_path:
            params, variables = self._load_pretrained(params, variables, pretrained_path)

        mask = trainable_mask(params, cfg.model_name)
        self.tx = optax.chain(
            optax.masked(optax.adam(cfg.lr), mask),
        )
        stats = {k: v for k, v in variables.items() if k != "params"}
        state = new_train_state(params, self.tx, k_run, stats=stats)
        return common.shard_state(self.mesh, state, mode=self.cfg.run.param_sharding)

    def _load_pretrained(self, params, variables, path: str):
        """Merge converted ImageNet weights (tools/convert_torchvision.py) into
        the init tree, keeping the freshly-initialized classifier head — the
        reference's fine-tuning setup (helpers.py:314-345: pretrained backbone,
        replaced final FC)."""
        import flax
        from flax import serialization

        with open(path, "rb") as f:
            payload = f.read()
        loaded = serialization.msgpack_restore(payload)

        head_names = {"fc", "classifier", "classifier_6", "fc2"}  # per-model final layers
        flat_init = flax.traverse_util.flatten_dict(jax.device_get(params))
        flat_pre = flax.traverse_util.flatten_dict(loaded.get("params", {}))
        merged = {}
        n_used = 0
        for k, v in flat_init.items():
            pre = flat_pre.get(k)
            if pre is not None and k[0] not in head_names and pre.shape == v.shape:
                merged[k] = jnp.asarray(pre)
                n_used += 1
            else:
                merged[k] = v
        params = flax.traverse_util.unflatten_dict(merged)

        # BatchNorm running stats ride along when present.
        new_vars = dict(variables)
        if "batch_stats" in variables and "batch_stats" in loaded:
            flat_bs = flax.traverse_util.flatten_dict(jax.device_get(variables["batch_stats"]))
            flat_pre_bs = flax.traverse_util.flatten_dict(loaded["batch_stats"])
            merged_bs = {k: jnp.asarray(flat_pre_bs[k]) if k in flat_pre_bs and
                         flat_pre_bs[k].shape == v.shape else v for k, v in flat_bs.items()}
            new_vars["batch_stats"] = flax.traverse_util.unflatten_dict(merged_bs)
        logging.getLogger(__name__).info("loaded %d pretrained tensors from %s", n_used, path)
        return params, new_vars

    def _preprocess(self, images):
        x = renorm_m1_1(images)
        if self.denoiser_apply is not None and self.cfg.use_denoiser:
            x = renorm_m1_1(x - self.denoiser_apply(x))
        if self.cfg.model_name != "ensemble":
            x = expand_channels(x, self.n_channel)
        return x

    def _loss(self, params, stats, x, labels, embeddings, dropout_key, train):
        variables = {"params": params, **stats}
        mutable = [k for k in stats.keys()] if train else False
        out = self.model.apply(
            variables, x, train=train,
            rngs={"dropout": dropout_key} if train else None,
            mutable=mutable,
        )
        logits, updated = out if train else (out, stats)
        loss = cross_entropy(logits, labels)
        if embeddings is not None and self.cfg.knowledge_dist:
            dist = kd_loss(logits, embeddings, self.cfg.kd_temperature)
            loss = self.cfg.kd_alpha * dist + (1.0 - self.cfg.kd_alpha) * loss
        return loss, (logits, updated)

    def _train_step(self, state: TrainState, images, labels, embeddings=None):
        rng, k_drop = jax.random.split(state.rng)
        k = max(1, int(self.cfg.grad_accum))

        if k == 1:
            x = self._preprocess(images)

            def loss_fn(params):
                return self._loss(params, state.stats, x, labels, embeddings, k_drop, train=True)

            (loss, (logits, updated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            stats = dict(updated)
        else:
            # Gradient accumulation (train/common.py): the ensemble is the
            # workload that hard-crashed the 16 GB chip at batch 64 — k
            # sequential microbatches keep one microbatch's activations live
            # while BN stats thread through the scan carry. One optimizer
            # update on the averaged grads.
            tree = {"im": images, "la": labels}
            if embeddings is not None:
                tree["emb"] = embeddings
            xs = common.microbatch_split(tree, k, self.mesh)
            xs["key"] = jax.random.split(k_drop, k)

            def body(stats, x):
                def loss_fn(params):
                    return self._loss(params, stats, self._preprocess(x["im"]), x["la"],
                                      x.get("emb"), x["key"], train=True)

                (li, (logits, updated)), gi = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                acc_i = jnp.mean((jnp.argmax(logits, -1) == x["la"]).astype(jnp.float32))
                return dict(updated), {"grads": gi, "loss": li, "acc": acc_i}

            stats, out = common.microbatch_accumulate(body, dict(state.stats), xs, k)
            grads, loss, acc = out["grads"], out["loss"], out["acc"]

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, stats=stats, rng=rng
        )
        return new_state, {"train_loss": loss, "train_acc": acc}

    def make_train_step(self):
        return jax.jit(self._train_step, donate_argnums=(0,))

    def _eval_step(self, state: TrainState, images, labels):
        x = self._preprocess(images)
        variables = {"params": state.params, **state.stats}
        logits = self.model.apply(variables, x, train=False)
        loss = cross_entropy(logits, labels)
        return logits, loss

    def make_eval_step(self):
        return jax.jit(self._eval_step)
