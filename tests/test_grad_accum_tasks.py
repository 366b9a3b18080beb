"""Gradient accumulation for every task (train/common.py microbatch helpers).

The DDPM accum path has its own white-box parity test
(test_diffusion.py::test_grad_accum_matches_manual_microbatch_mean); these
mirror it for the classifier / VQ-VAE / ACGAN / SpecUNet tasks: the accum
step at grad_accum=k must equal ONE optimizer update on the mean of k
manually-computed microbatch grads, with sequential state (BN stats, the
VQ-EMA codebook) threaded microbatch-to-microbatch and per-microbatch RNG
keys split exactly as the implementation splits them.

Reference analog: helpers.py:740-798 (per-batch update) — accumulation is
how the rebuild trains effective batches past 16 GB/chip (the ensemble at
effective batch 64 hard-crashed the chip without it).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax

from spectrogramgenai_tpu.core.config import (
    ACGANConfig,
    ClassifierConfig,
    DataConfig,
    RunConfig,
    SpecUNetConfig,
    VQVAEConfig,
)
from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
from spectrogramgenai_tpu.train.acgan_task import ACGANTask
from spectrogramgenai_tpu.train.classifier_task import ClassifierTask
from spectrogramgenai_tpu.train.specunet_task import SpecUNetTask
from spectrogramgenai_tpu.train.vqvae_task import VQVAETask


def _assert_tree_close(got, want, rtol=5e-5, atol=2e-5):
    # atol covers cross-device reduction-order noise vs the manual
    # single-host math, amplified by Adam's 1/(√v+ε) at step 0 (near-zero
    # grads make the normalized update sign-like); a real averaging bug
    # errs at the 50% level, far above this
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=rtol, atol=atol)


def test_classifier_grad_accum_matches_manual():
    """custom classifier on the 8-device mesh: accum k=2 at batch 16 — also
    exercises microbatch_split's data-axis sharding constraint."""
    cfg = ClassifierConfig(model_name="custom", num_classes=5,
                           data=DataConfig(batch_size=16, img_size=32),
                           grad_accum=2, compute_dtype="float32",
                           run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=8, model=1))
    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=32, seed=0)

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (16, 32, 32, 1)).astype(np.float32)
    labels = rng.integers(0, 5, (16,)).astype(np.int32)

    # manual: same key split, same stats threading
    _, k_drop = jax.random.split(state.rng)
    keys = jax.random.split(k_drop, 2)
    stats = dict(state.stats)
    grads, losses = [], []
    for i in range(2):
        sl = slice(8 * i, 8 * (i + 1))
        x = task._preprocess(jnp.asarray(images[sl]))

        def loss_fn(params):
            return task._loss(params, stats, x, jnp.asarray(labels[sl]), None, keys[i], train=True)

        (li, (_, updated)), gi = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        stats = dict(updated)
        grads.append(gi)
        losses.append(float(li))
    g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *grads)
    updates, _ = task.tx.update(g_mean, state.opt_state, state.params)
    expected = jax.device_get(optax.apply_updates(state.params, updates))

    step = task.make_train_step()
    batch = shard_batch(mesh, {"image": images, "label": labels})
    new_state, m = step(state, batch["image"], batch["label"])
    assert int(new_state.step) == 1
    np.testing.assert_allclose(float(m["train_loss"]), np.mean(losses), rtol=1e-5)
    _assert_tree_close(new_state.params, expected)


def test_vqvae_grad_accum_matches_manual():
    """EMA codebook threads the scan carry: microbatch 1 quantizes against
    the codebook updated by microbatch 0."""
    cfg = VQVAEConfig(hidden_dim=32, n_embeddings=16, grad_accum=2,
                      compute_dtype="float32",
                      data=DataConfig(batch_size=8, img_size=32),
                      run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = VQVAETask(cfg, mesh)
    state = task.init_state(img_size=32, seed=0)

    rng = np.random.default_rng(1)
    images = rng.uniform(0, 1, (8, 32, 32, 1)).astype(np.float32)

    from spectrogramgenai_tpu.data.transforms import renorm_m1_1

    stats = dict(state.stats)
    grads = []
    for i in range(2):
        x = renorm_m1_1(jnp.asarray(images[4 * i: 4 * (i + 1)]))
        (_, (_, updated)), gi = jax.value_and_grad(task._loss, has_aux=True)(
            state.params, stats, x)
        stats = dict(updated)
        grads.append(gi)
    g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *grads)
    updates, _ = task.tx.update(g_mean, state.opt_state, state.params)
    expected_params = jax.device_get(
        jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates))
    expected_stats = jax.device_get(stats)

    new_state, aux = task.make_train_step()(state, jnp.asarray(images))
    assert np.isfinite(float(aux["loss"]))
    _assert_tree_close(new_state.params, expected_params)
    _assert_tree_close(new_state.stats, expected_stats)  # sequential EMA, not averaged


def test_acgan_grad_accum_matches_manual():
    """Both players: grads accumulate at pre-step params, ONE optimizer
    update each; BN stats thread through the carry.

    The optimizers are swapped for SGD: RMSprop's step-0 update is
    ≈ lr·10·sign(g) (ν = 0.01·g²), so the ~1e-4-absolute fp reassociation
    noise between the one-jit scan and the eager manual computation flips
    update SIGNS on near-zero-grad elements — with a linear update the
    params comparison tests exactly what this test is about (grad
    averaging + threading), at tight tolerance."""
    cfg = ACGANConfig(num_classes=5, grad_accum=2, compute_dtype="float32",
                      data=DataConfig(batch_size=4, img_size=256),
                      run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    # the generator's 512×16×16 reshape + 4 upsample blocks fix 256×256 output
    task = ACGANTask(cfg, mesh)
    task.g_tx = optax.sgd(0.1)
    task.d_tx = optax.sgd(0.1)
    state = task.init_state(seed=0)

    rng = np.random.default_rng(2)
    images = rng.uniform(0, 1, (4, 256, 256, 1)).astype(np.float32)
    labels = rng.integers(0, 5, (4,)).astype(np.int32)

    _, k_noise, k_labels = jax.random.split(state.rng, 3)
    kn = jax.random.split(k_noise, 2)
    kl = jax.random.split(k_labels, 2)
    g_st, d_st = state.g_stats, state.d_stats
    g_grads, d_grads = [], []
    for i in range(2):
        sl = slice(2 * i, 2 * (i + 1))
        g_st, d_st, gg, dg, _ = task._micro_grads(
            state, g_st, d_st, jnp.asarray(images[sl]), jnp.asarray(labels[sl]),
            None, kn[i], kl[i])
        g_grads.append(gg)
        d_grads.append(dg)
    gg_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *g_grads)
    dg_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *d_grads)
    g_upd, _ = task.g_tx.update(gg_mean, state.g_opt, state.g_params)
    d_upd, _ = task.d_tx.update(dg_mean, state.d_opt, state.d_params)
    expected_g = jax.device_get(optax.apply_updates(state.g_params, g_upd))
    expected_d = jax.device_get(optax.apply_updates(state.d_params, d_upd))
    expected_g_stats = jax.device_get(g_st)

    new_state, m = task.make_train_step()(state, jnp.asarray(images), jnp.asarray(labels))
    assert np.isfinite(float(m["loss_G"])) and np.isfinite(float(m["loss_D"]))
    _assert_tree_close(new_state.g_params, expected_g, atol=5e-5)
    _assert_tree_close(new_state.d_params, expected_d, atol=5e-5)
    _assert_tree_close(new_state.g_stats, expected_g_stats)


def test_specunet_grad_accum_matches_manual():
    cfg = SpecUNetConfig(grad_accum=2, compute_dtype="float32",
                         data=DataConfig(batch_size=8, img_size=64),
                         run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = SpecUNetTask(cfg, mesh)
    state = task.init_state(img_size=64, seed=0)

    rng = np.random.default_rng(3)
    mix = rng.uniform(0, 1, (8, 64, 64, 1)).astype(np.float32)
    noise_s = rng.uniform(0, 1, (8, 64, 64, 1)).astype(np.float32)
    bird_s = rng.uniform(0, 1, (8, 64, 64, 1)).astype(np.float32)
    target = np.concatenate([noise_s, bird_s], axis=-1)

    _, k_drop = jax.random.split(state.rng)
    keys = jax.random.split(k_drop, 2)
    grads = []
    for i in range(2):
        sl = slice(4 * i, 4 * (i + 1))

        def loss_fn(params):
            pred = task.model.apply({"params": params}, jnp.asarray(mix[sl]),
                                    deterministic=False, rngs={"dropout": keys[i]})
            return jnp.mean((pred - jnp.asarray(target[sl])) ** 2)

        grads.append(jax.grad(loss_fn)(state.params))
    g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *grads)
    updates, _ = task.tx.update(g_mean, state.opt_state, state.params)
    expected = jax.device_get(optax.apply_updates(state.params, updates))

    new_state, m = task.make_train_step()(
        state, jnp.asarray(mix), jnp.asarray(noise_s), jnp.asarray(bird_s))
    assert np.isfinite(float(m["train_mse"]))
    _assert_tree_close(new_state.params, expected)


def test_grad_accum_indivisible_batch_raises():
    cfg = VQVAEConfig(hidden_dim=32, n_embeddings=16, grad_accum=3,
                      compute_dtype="float32", run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = VQVAETask(cfg, mesh)
    state = task.init_state(img_size=32, seed=0)
    try:
        task.make_train_step()(state, jnp.zeros((8, 32, 32, 1)))
        raise AssertionError("expected ValueError for batch 8 with grad_accum=3")
    except ValueError as e:
        assert "grad_accum" in str(e)
