"""Checkpointing: pytree save/load with the reference's file roles.

Same roles as /root/reference/trainer.py:397-403,529-546 — ``best.pth`` on
eval-metric improvement, ``epoch_N.pth`` every save_freq, ``last.pth`` at
the end — but the payload is a JAX pytree of numpy arrays and includes
optimizer state (an improvement over the reference, which saves weights
only; SURVEY §5.4).
"""

import pickle

import jax
import numpy as np


def save_checkpoint(path, modalities, params, state=None, opt_state=None,
                    extra=None):
    payload = {
        "modalities": list(modalities),
        "params": jax.tree_util.tree_map(np.asarray, params),
    }
    if state is not None:
        payload["state"] = jax.tree_util.tree_map(np.asarray, state)
    if opt_state is not None:
        payload["opt_state"] = jax.tree_util.tree_map(
            np.asarray, opt_state)
    if extra:
        payload.update(extra)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)
