"""DDPM runtime: schedule, forward q-sample, ε-MSE loss, scan-compiled sampler.

Capability parity with the reference Diffusion/DiffusionVAE runtimes
(diff_modules.py:370-776): linear β schedule 1e-4→0.02 over 1000 steps,
t ~ U{1, …, 999} training timesteps, 10% classifier-free label dropout,
and the 999-step ancestral reverse chain with CFG
``lerp(uncond, cond, cfg_scale=3)``.

TPU-first design (the BASELINE north-star):
  * The whole reverse chain is ONE ``lax.scan`` inside one jit — zero Python
    per step, weights stay pinned in HBM/VMEM across all 999 steps.
  * The conditional and unconditional passes are batched into a single
    forward (2n batch with a cond_mask), halving kernel launches vs the
    reference's two sequential model calls per step
    (diff_modules.py:425-427).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    noise_steps: int
    beta_start: float
    beta_end: float

    # NumPy host constants (never tracers — safe to cache across jit traces).
    @functools.cached_property
    def beta(self) -> np.ndarray:
        return np.linspace(self.beta_start, self.beta_end, self.noise_steps, dtype=np.float32)

    @functools.cached_property
    def alpha(self) -> np.ndarray:
        return 1.0 - self.beta

    @functools.cached_property
    def alpha_hat(self) -> np.ndarray:
        return np.cumprod(self.alpha, axis=0, dtype=np.float32)


def linear_schedule(noise_steps: int = 1000, beta_start: float = 1e-4, beta_end: float = 0.02):
    return DiffusionSchedule(noise_steps, beta_start, beta_end)


def q_sample(schedule: DiffusionSchedule, x: jax.Array, t: jax.Array, noise: jax.Array):
    """Forward diffusion x_t = √ᾱ_t·x + √(1-ᾱ_t)·ε (diff_modules.py:404-409)."""
    ah = jnp.asarray(schedule.alpha_hat)[t]
    shape = (-1,) + (1,) * (x.ndim - 1)
    return jnp.sqrt(ah).reshape(shape) * x + jnp.sqrt(1.0 - ah).reshape(shape) * noise


def diffusion_loss(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    label_drop: float = 0.1,
):
    """ε-prediction MSE with classifier-free label dropout.

    Matches the reference one_epoch inner loop (diff_modules.py:460-489):
    per-batch label drop with prob `label_drop` (the reference drops the whole
    batch at once via np.random.random(), diff_modules.py:475).
    """
    n = images.shape[0]
    k_t, k_noise, k_drop = jax.random.split(key, 3)
    t = jax.random.randint(k_t, (n,), 1, schedule.noise_steps)
    noise = jax.random.normal(k_noise, images.shape, images.dtype)
    x_t = q_sample(schedule, images, t, noise)
    keep = (jax.random.uniform(k_drop, ()) >= label_drop).astype(jnp.float32)
    cond_mask = jnp.full((n,), keep)
    pred = apply_fn(params, x_t, t.astype(jnp.float32), labels, cond_mask)
    return jnp.mean((noise - pred) ** 2)


def ddpm_sample(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    key: jax.Array,
    labels: jax.Array,
    sample_shape: tuple[int, ...],
    cfg_scale: float = 3.0,
    callback: Callable[[jax.Array, jax.Array], Any] | None = None,
) -> jax.Array:
    """Reverse chain: (len(labels), *sample_shape) samples in [-1, 1]-ish.

    One jittable scan over i = noise_steps-1 … 1 (diff_modules.py:411-439).
    With cfg_scale > 0, each step runs ONE 2n-batch forward covering the
    conditional and unconditional branches.

    `callback(step_index, x)` is an optional pure function folded into the
    scan carry-free output (used by the denoising-trajectory dump feature).
    """
    n = labels.shape[0]
    x0 = jax.random.normal(key, (n, *sample_shape), jnp.float32)
    use_cfg = cfg_scale > 0

    def step(carry, i):
        x, k = carry
        k, k_noise = jax.random.split(k)
        t = jnp.full((n,), i, jnp.float32)
        if use_cfg:
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            yy = jnp.concatenate([labels, labels], axis=0)
            mask = jnp.concatenate([jnp.ones((n,)), jnp.zeros((n,))], axis=0)
            eps = apply_fn(params, xx, tt, yy, mask)
            cond, uncond = eps[:n], eps[n:]
            # torch.lerp(uncond, cond, s) = uncond + s·(cond - uncond)
            eps = uncond + cfg_scale * (cond - uncond)
        else:
            eps = apply_fn(params, x, t, labels, jnp.ones((n,)))

        alpha = jnp.asarray(schedule.alpha)[i]
        alpha_hat = jnp.asarray(schedule.alpha_hat)[i]
        beta = jnp.asarray(schedule.beta)[i]
        noise = jnp.where(i > 1, jax.random.normal(k_noise, x.shape), jnp.zeros_like(x))
        x = (1.0 / jnp.sqrt(alpha)) * (x - ((1.0 - alpha) / jnp.sqrt(1.0 - alpha_hat)) * eps) + jnp.sqrt(
            beta
        ) * noise
        out = callback(i, x) if callback is not None else None
        return (x, k), out

    steps = jnp.arange(schedule.noise_steps - 1, 0, -1)
    (x, _), outs = jax.lax.scan(step, (x0, key), steps)
    if callback is not None:
        return x, outs
    return x


def ddim_sample(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    key: jax.Array,
    labels: jax.Array,
    sample_shape: tuple[int, ...],
    num_steps: int = 50,
    cfg_scale: float = 3.0,
    eta: float = 0.0,
) -> jax.Array:
    """DDIM sampler (Song et al. 2020): deterministic (η=0) reverse process on
    a `num_steps`-subsequence of the training schedule.

    A capability BEYOND the reference (which only has the 999-step ancestral
    chain): ~20× fewer UNet evaluations for comparable sample quality. Same
    batched-CFG trick as ddpm_sample; one lax.scan, one jit.
    """
    n = labels.shape[0]
    x0 = jax.random.normal(key, (n, *sample_shape), jnp.float32)
    use_cfg = cfg_scale > 0

    # evenly spaced subsequence T-1 … 0 (inclusive), e.g. 999, …, 0
    ts = np.linspace(schedule.noise_steps - 1, 0, num_steps + 1).round().astype(np.int32)
    t_now, t_prev = ts[:-1], ts[1:]
    ah = jnp.asarray(schedule.alpha_hat)

    def step(carry, idx):
        x, k = carry
        i, j = idx  # current / previous timestep
        k, k_noise = jax.random.split(k)
        t = jnp.full((n,), i, jnp.float32)
        if use_cfg:
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            yy = jnp.concatenate([labels, labels], axis=0)
            mask = jnp.concatenate([jnp.ones((n,)), jnp.zeros((n,))], axis=0)
            eps = apply_fn(params, xx, tt, yy, mask)
            cond, uncond = eps[:n], eps[n:]
            eps = uncond + cfg_scale * (cond - uncond)
        else:
            eps = apply_fn(params, x, t, labels, jnp.ones((n,)))

        a_t = ah[i]
        a_prev = ah[j]
        x0_pred = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        sigma = eta * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev))
        dir_x = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        noise = jnp.where(sigma > 0, jax.random.normal(k_noise, x.shape), jnp.zeros_like(x))
        x = jnp.sqrt(a_prev) * x0_pred + dir_x + sigma * noise
        return (x, k), None

    (x, _), _ = jax.lax.scan(step, (x0, key), (jnp.asarray(t_now), jnp.asarray(t_prev)))
    return x


def dpmpp_timesteps(schedule: DiffusionSchedule, num_steps: int) -> np.ndarray:
    """Solver nodes uniform in log-SNR (λ), mapped to the integer t grid —
    the DPM-Solver paper's default node choice, and measurably load-bearing:
    uniform-t spacing leaves the FINAL λ-step ≈1.5 no matter how many steps
    you take (λ moves fastest at the t→0 tail of the linear-β schedule), so
    the tail's local error never converges and the 2M correction — whose
    weight c2 = h_k/(2 h_{k−1}) blows up when h grows step-over-step —
    amplifies it. Measured on smooth analytic ε-models: uniform-t dpmpp-20
    is ~30× WORSE than ddim-50; uniform-λ dpmpp-20 is 20-50× BETTER.
    """
    if num_steps + 1 > schedule.noise_steps:
        raise ValueError(
            f"num_steps={num_steps} too large for a {schedule.noise_steps}-step "
            "schedule: timestep subsequence has duplicates (h=0)")
    lam_all = schedule.alpha_hat.astype(np.float64)
    lam_all = np.log(np.sqrt(lam_all) / np.sqrt(1.0 - lam_all))
    targets = np.linspace(lam_all[schedule.noise_steps - 1], lam_all[0], num_steps + 1)
    # λ(t) is monotone decreasing in t — invert by nearest grid point, then
    # enforce a strictly decreasing t sequence (coarse grids can alias two
    # λ-targets onto one integer t; nudging costs ≪ one grid step of λ)
    ts = np.array([int(np.abs(lam_all - L).argmin()) for L in targets], dtype=np.int32)
    ts[0], ts[-1] = schedule.noise_steps - 1, 0  # pin both chain endpoints
    for i in range(len(ts) - 2, 0, -1):  # λ moves fastest at t→0: repair
        ts[i] = max(ts[i], ts[i + 1] + 1)  # from the t=0 anchor outward…
    for i in range(1, len(ts)):
        ts[i] = min(ts[i], ts[i - 1] - 1)  # …then settle any top-end overlap
    if ts[-1] != 0 or np.any(np.diff(ts) >= 0):
        raise ValueError(
            f"num_steps={num_steps} too large for a {schedule.noise_steps}-step "
            "schedule: timestep subsequence has duplicates (h=0)")
    return ts


def dpmpp_coefficients(schedule: DiffusionSchedule, num_steps: int) -> dict:
    """Host-precomputed per-step scan inputs for :func:`dpmpp_sample`.

    Nodes are uniform in log-SNR (:func:`dpmpp_timesteps`). lower_order_final
    (official DPM-Solver++ / diffusers behavior): when num_steps < 15 the
    FINAL step drops to first order (c2[-1] = 0) — a 2nd-order extrapolation
    through the steep schedule tail can overshoot at very low step counts.
    At ≥15 steps the final step stays 2nd-order (diffusers applies the guard
    only below 15), so the 20-step production path keeps full order.
    """
    ts = dpmpp_timesteps(schedule, num_steps)
    if len(np.unique(ts)) != len(ts):
        raise ValueError(
            f"num_steps={num_steps} too large for a {schedule.noise_steps}-step "
            "schedule: timestep subsequence has duplicates (h=0)")
    ah = schedule.alpha_hat[ts].astype(np.float64)
    alpha = np.sqrt(ah)
    sigma = np.sqrt(1.0 - ah)
    lam = np.log(alpha / sigma)
    h = lam[1:] - lam[:-1]  # (num_steps,), > 0

    # second-order correction weight: c2_k = 1/(2 r_k) = h_k / (2 h_{k-1});
    # c2_0 = 0 makes the first step collapse to first order (D_0 = x0_0)
    # without a branch in the scan body.
    c2 = np.concatenate([[0.0], h[1:] / (2.0 * h[:-1])])
    if num_steps < 15:
        c2[-1] = 0.0  # lower_order_final (see docstring)

    return {
        "t": jnp.asarray(ts[:-1], jnp.float32),
        "a_k": jnp.asarray(alpha[:-1], jnp.float32),
        "s_k": jnp.asarray(sigma[:-1], jnp.float32),
        "sig_ratio": jnp.asarray(sigma[1:] / sigma[:-1], jnp.float32),
        "coef": jnp.asarray(-alpha[1:] * np.expm1(-h), jnp.float32),
        "c2": jnp.asarray(c2, jnp.float32),
    }


def dpmpp_sample(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    key: jax.Array,
    labels: jax.Array,
    sample_shape: tuple[int, ...],
    num_steps: int = 20,
    cfg_scale: float = 3.0,
) -> jax.Array:
    """DPM-Solver++(2M) (Lu et al. 2022, arXiv 2211.01095): second-order
    multistep ODE solver in data-prediction (x0) space with exponential
    integrator steps sized in log-SNR (λ).

    A capability BEYOND the reference (diff_modules.py:630-707 only has the
    999-step ancestral chain): with uniform-log-SNR nodes
    (:func:`dpmpp_timesteps`), 20 steps integrate the probability-flow ODE
    more accurately than 50-step DDIM (measured 20-50× lower solution error
    on smooth analytic ε-models; see test_dpmpp_second_order_beats_ddim), at
    the SAME per-step cost (one batched-CFG UNet forward). One lax.scan, one
    jit — the multistep history (previous x0 prediction) rides the scan
    carry, so there is no extra model evaluation anywhere.

    Update rule (paper Algorithm 2), stepping node k → k+1 with
    h_k = λ_{k+1} − λ_k  and  r_k = h_{k−1}/h_k:

        D_k     = (1 + 1/(2 r_k))·x0_k − 1/(2 r_k)·x0_{k−1}     (D_0 = x0_0)
        x_{k+1} = (σ_{k+1}/σ_k)·x_k − α_{k+1}·expm1(−h_k)·D_k

    All per-step coefficients are host-precomputed NumPy scalars streamed to
    the scan as xs — nothing data-dependent is traced.
    """
    n = labels.shape[0]
    x0_init = jax.random.normal(key, (n, *sample_shape), jnp.float32)
    use_cfg = cfg_scale > 0
    xs = dpmpp_coefficients(schedule, num_steps)

    def step(carry, c):
        x, prev_x0 = carry
        t = jnp.full((n,), c["t"], jnp.float32)
        if use_cfg:
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            yy = jnp.concatenate([labels, labels], axis=0)
            mask = jnp.concatenate([jnp.ones((n,)), jnp.zeros((n,))], axis=0)
            eps = apply_fn(params, xx, tt, yy, mask)
            cond, uncond = eps[:n], eps[n:]
            eps = uncond + cfg_scale * (cond - uncond)
        else:
            eps = apply_fn(params, x, t, labels, jnp.ones((n,)))

        x0 = (x - c["s_k"] * eps) / c["a_k"]
        d = (1.0 + c["c2"]) * x0 - c["c2"] * prev_x0
        x = c["sig_ratio"] * x + c["coef"] * d
        return (x, x0), None

    (x, _), _ = jax.lax.scan(step, (x0_init, jnp.zeros_like(x0_init)), xs)
    return x


def to_uint8(x: jax.Array) -> jax.Array:
    """clamp(-1,1) → [0,255] uint8 (diff_modules.py:440-442)."""
    x = (jnp.clip(x, -1.0, 1.0) + 1.0) / 2.0
    return (x * 255.0).astype(jnp.uint8)
