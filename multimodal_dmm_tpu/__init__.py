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


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache, on by default for every entry
    point that imports the package (CLIs, sweep trial subprocesses,
    bench.py, tests).

    Through the remote-compile tunnel a cold compile of the fused train
    step costs 5-10 minutes and every sweep trial runs in a fresh
    subprocess (experiments/tune.py isolate), so before this cache each
    trial of a 16-trial grid re-paid the full compile. Measured on the
    axon TPU backend: 3.3 s -> 0.1 s compile+run across processes with
    bit-identical outputs. Opt out with MDMM_JAX_CACHE=0; relocate with
    MDMM_JAX_CACHE_DIR.
    """
    import os
    if os.environ.get("MDMM_JAX_CACHE", "1") == "0":
        return
    try:
        import jax
        path = os.environ.get(
            "MDMM_JAX_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "multimodal_dmm_tpu", "jax"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Only persist compiles that actually hurt; never fail a run
        # over a cache I/O problem.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
        jax.config.update("jax_raise_persistent_cache_errors", False)
    except Exception:
        pass


_enable_persistent_compile_cache()
