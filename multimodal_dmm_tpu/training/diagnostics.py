"""Training diagnostics: gradient-flow plots, NaN checks, profiling.

- ``plot_grad_flow``: per-layer gradient magnitude / NaN bar chart,
  equivalent of /root/reference/utils.py:31-72 (hooked behind
  ``--gradients``, trainer.py:245-246), operating on a grads pytree.
- ``grad_stats``: host-side summary used by the same flag.
- ``StepTimer`` + ``profile_ctx``: per-step wall timing and
  ``jax.profiler`` trace capture (the reference has no profiler; this is
  the TPU-native observability layer, SURVEY §5.1).
"""

import contextlib
import time

import numpy as np

import jax


def _flatten_with_names(tree, prefix=""):
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            out += _flatten_with_names(tree[k],
                                       f"{prefix}{k}/" if prefix or True
                                       else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out += _flatten_with_names(v, f"{prefix}{i}/")
    else:
        out.append((prefix.rstrip("/"), tree))
    return out


def grad_stats(grads):
    """Per-leaf mean |grad| and NaN counts."""
    stats = []
    for name, leaf in _flatten_with_names(grads):
        a = np.asarray(leaf)
        stats.append({
            "name": name,
            "mean_abs": float(np.abs(a).mean()) if a.size else 0.0,
            "max_abs": float(np.abs(a).max()) if a.size else 0.0,
            "n_nan": int(np.isnan(a).sum()),
        })
    return stats


def plot_grad_flow(grads, save_path=None):
    """Bar chart of per-layer average gradient magnitude, NaNs flagged."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stats = grad_stats(grads)
    names = [s["name"] for s in stats]
    means = [s["mean_abs"] for s in stats]
    nans = [s["n_nan"] for s in stats]
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.3), 4))
    colors = ["r" if n else "c" for n in nans]
    ax.bar(range(len(names)), means, color=colors)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation="vertical", fontsize=4)
    ax.set_ylabel("average gradient magnitude")
    ax.set_title("Gradient flow (red = contains NaN)")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path)
    plt.close(fig)
    return stats


class StepTimer:
    """Rolling per-step wall-time statistics."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.time() - self._t0)
            self._t0 = None

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"steps": len(arr),
                "mean_ms": float(arr.mean() * 1e3),
                "median_ms": float(np.median(arr) * 1e3),
                "p90_ms": float(np.percentile(arr, 90) * 1e3)}


@contextlib.contextmanager
def profile_ctx(trace_dir=None):
    """Capture a jax.profiler trace when ``trace_dir`` is set."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
