"""VQ-VAE with EMA codebook (flax linen, NHWC).

Capability parity with the reference (diff_modules.py:220-367, spec_vae.py):
  * Encoder: two stride-2 convs (k=4) + two residual convs (k=3,1) + 1×1 proj
    → 4-channel latent at H/4 × W/4.
  * EMA codebook (512×4): nearest-neighbour by squared euclidean distance,
    EMA counts/weights with Laplace smoothing, straight-through estimator,
    commitment (β=0.25) + codebook losses, perplexity.
  * Decoder mirrors the encoder with stride-2 transposed convs (k=2).

The codebook lives in a mutable ``"codebook"`` variable collection; EMA
updates run inside the jitted train step. Because trainers shard the batch
over the mesh's data axis with jit/NamedSharding, the one-hot count and
Σ(onehotᵀ·x) statistics are global-batch reductions — XLA inserts the
cross-chip psums, so the codebook stays bit-identical on every device
(SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class VQEncoder(nn.Module):
    hidden_dim: int = 512
    latent_dim: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(self.hidden_dim, (4, 4), strides=2, padding=1, dtype=dt)(x)
        x = nn.Conv(self.hidden_dim, (4, 4), strides=2, padding=1, dtype=dt)(x)
        x = nn.relu(x)
        y = nn.Conv(self.hidden_dim, (3, 3), padding=1, dtype=dt)(x)
        y = y + x
        x = nn.relu(y)
        y = nn.Conv(self.hidden_dim, (1, 1), padding=0, dtype=dt)(x)
        y = y + x
        y = nn.Conv(self.latent_dim, (1, 1), dtype=dt)(y)
        return y.astype(jnp.float32)


class VQDecoder(nn.Module):
    hidden_dim: int = 512
    output_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        dt = self.dtype
        x = nn.Conv(self.hidden_dim, (1, 1), dtype=dt)(z.astype(dt))
        y = nn.Conv(self.hidden_dim, (1, 1), padding=0, dtype=dt)(x)
        y = y + x
        x = nn.relu(y)
        y = nn.Conv(self.hidden_dim, (3, 3), padding=1, dtype=dt)(x)
        y = y + x
        y = nn.relu(y)
        y = nn.ConvTranspose(self.hidden_dim, (2, 2), strides=(2, 2), padding="VALID", dtype=dt)(y)
        y = nn.ConvTranspose(self.output_dim, (2, 2), strides=(2, 2), padding="VALID", dtype=dt)(y)
        return y.astype(jnp.float32)


class VQEmbeddingEMA(nn.Module):
    """EMA-updated codebook (diff_modules.py:252-319)."""

    n_embeddings: int = 512
    embedding_dim: int = 4
    commitment_cost: float = 0.25
    decay: float = 0.999
    epsilon: float = 1e-5

    def setup(self):
        init_bound = 1.0 / self.n_embeddings

        def _init_embedding(key):
            return jax.random.uniform(
                key, (self.n_embeddings, self.embedding_dim), jnp.float32, -init_bound, init_bound
            )

        init_key = self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0)
        self.embedding = self.variable("codebook", "embedding", _init_embedding, init_key)
        self.ema_count = self.variable(
            "codebook", "ema_count", lambda: jnp.zeros((self.n_embeddings,), jnp.float32)
        )
        # jnp.copy: must not alias the embedding buffer (breaks jit donation)
        self.ema_weight = self.variable("codebook", "ema_weight", lambda: jnp.copy(self.embedding.value))

    def _nearest(self, x_flat):
        emb = self.embedding.value
        d2 = (
            jnp.sum(x_flat**2, axis=1, keepdims=True)
            - 2.0 * x_flat @ emb.T
            + jnp.sum(emb**2, axis=1)[None, :]
        )
        return jnp.argmin(d2, axis=-1)

    def encode(self, x):
        """(B,H,W,D) → (quantized, indices (B,H,W))."""
        b, h, w, d = x.shape
        x_flat = jax.lax.stop_gradient(x).reshape(-1, d)
        idx = self._nearest(x_flat)
        quantized = self.embedding.value[idx].reshape(b, h, w, d)
        return quantized, idx.reshape(b, h, w)

    def lookup(self, indices):
        return self.embedding.value[indices]

    def __call__(self, x, train: bool = False):
        b, h, w, d = x.shape
        m = self.n_embeddings
        x_flat = jax.lax.stop_gradient(x).reshape(-1, d)
        idx = self._nearest(x_flat)
        encodings = jax.nn.one_hot(idx, m, dtype=jnp.float32)
        quantized = self.embedding.value[idx].reshape(x.shape)

        if train:
            # Global-batch EMA statistics (psum'd by XLA under a sharded batch).
            counts = jnp.sum(encodings, axis=0)
            ema_count = self.decay * self.ema_count.value + (1.0 - self.decay) * counts
            n = jnp.sum(ema_count)
            ema_count = (ema_count + self.epsilon) / (n + m * self.epsilon) * n
            dw = encodings.T @ x_flat
            ema_weight = self.decay * self.ema_weight.value + (1.0 - self.decay) * dw
            self.ema_count.value = ema_count
            self.ema_weight.value = ema_weight
            self.embedding.value = ema_weight / ema_count[:, None]

        codebook_loss = jnp.mean((jax.lax.stop_gradient(x) - quantized) ** 2)
        e_latent_loss = jnp.mean((x - jax.lax.stop_gradient(quantized)) ** 2)
        commitment_loss = self.commitment_cost * e_latent_loss

        quantized_st = x + jax.lax.stop_gradient(quantized - x)

        avg_probs = jnp.mean(encodings, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        return quantized_st, commitment_loss, codebook_loss, perplexity


class VQVAE(nn.Module):
    """encode → quantize → decode (diff_modules.py:355-367)."""

    input_dim: int = 1
    hidden_dim: int = 512
    latent_dim: int = 4
    n_embeddings: int = 512
    output_dim: int = 1
    commitment_cost: float = 0.25
    ema_decay: float = 0.999
    ema_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VQEncoder(self.hidden_dim, self.latent_dim, dtype=self.dtype)
        self.codebook = VQEmbeddingEMA(
            self.n_embeddings, self.latent_dim, self.commitment_cost, self.ema_decay, self.ema_eps
        )
        self.decoder = VQDecoder(self.hidden_dim, self.output_dim, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        z = self.encoder(x)
        z_q, commitment_loss, codebook_loss, perplexity = self.codebook(z, train=train)
        x_hat = self.decoder(z_q)
        return x_hat, z, z_q, commitment_loss, codebook_loss, perplexity

    def encode(self, x):
        """Unquantized latent — the latent-diffusion training input
        (the reference diffuses encoder output pre-quantization,
        diff_modules.py:720)."""
        return self.encoder(x)

    def decode_quantized(self, z):
        """Quantize then decode — the latent-diffusion sampling tail
        (diff_modules.py:702-704)."""
        q, _ = self.codebook.encode(z)
        return self.decoder(q)
