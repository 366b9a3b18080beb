"""spectrogramgenai_tpu — TPU-native generative bioacoustics framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
SpectrogramGenAI codebase (see SURVEY.md): wav→mel spectrogram preprocessing,
ACGAN / conditional DDPM / latent (VQ-VAE) diffusion synthesis of 256×256
bird-call spectrograms, classifier training on real+synthetic mixes, and the
IS/FID/FAD evaluation stack — designed SPMD-first over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
