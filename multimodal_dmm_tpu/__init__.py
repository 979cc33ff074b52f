"""multimodal_dmm_tpu: a TPU-native (JAX/XLA/Pallas) framework for deep
generative modeling of incomplete multimodal time series.

Re-implements the full capability surface of ztangent/multimodal-dmm
(Multimodal Deep Markov Models with Backward-Forward Variational Inference,
plus Deep Kalman Smoother and multimodal VRNN baselines, the multimodal
sequence data engine with missing-data machinery, the trainer runtime and
the experiment-orchestration layer) as an idiomatic JAX framework:

- time loops are `jax.lax.scan` programs,
- per-modality experts are fused with vectorized product-of-experts math,
- training steps are single jitted functions with one `jax.grad`,
- scale-out is data parallelism over a `jax.sharding.Mesh`.

Reference behavior citations in docstrings point into /root/reference
(file:line) so parity can be audited.
"""

__version__ = "0.1.0"
