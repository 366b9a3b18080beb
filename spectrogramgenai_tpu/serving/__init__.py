"""Production serving layer: dynamic-batching spectrogram generation service.

The reference has no serving story (generation is the offline
ddpm_conditional_generate.py script); this subpackage adds one designed
around the TPU execution model: a single jitted fixed-shape sampler (no
retraces), a coalescing request queue that fills each chain with work from
many concurrent clients, and an HTTP front end.
"""

from spectrogramgenai_tpu.serving.server import (AudioReconstructor, BatchingSampler,
                                                  GenerationHTTPServer)

__all__ = ["AudioReconstructor", "BatchingSampler", "GenerationHTTPServer"]
