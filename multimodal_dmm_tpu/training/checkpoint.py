"""Checkpointing: pytree save/load with the reference's file roles.

Same roles as /root/reference/trainer.py:397-403,529-546 — ``best.pth`` on
eval-metric improvement, ``epoch_N.pth`` every save_freq, ``last.pth`` at
the end — but the payload is a JAX pytree of numpy arrays and includes
optimizer state (an improvement over the reference, which saves weights
only; SURVEY §5.4).

Format history:
  1 (implicit, no "format" key): deconv kernels stored HWOI / WOI.
  2: deconv kernels stored pre-flipped HWIO / WIO — the kernel of the
     equivalent input-dilated forward conv (models/nn.py deconv*_init).
     Pure element permutation; v1 payloads are converted on load, Adam
     moments included (they mirror the params pytree, so the same
     permutation keeps optimizer state consistent).
"""

import pickle

import jax
import numpy as np

CHECKPOINT_FORMAT = 2


def _flip_deconv_w(w):
    """numpy v1→v2 kernel permutation (mirrors nn.deconv*_flip_to_v2)."""
    w = np.asarray(w)
    if w.ndim == 4:   # HWOI → flipped HWIO
        return np.ascontiguousarray(
            np.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2)))
    if w.ndim == 3:   # WOI → flipped WIO
        return np.ascontiguousarray(np.transpose(w[::-1, :, :], (0, 2, 1)))
    return w


def _convert_v1(obj):
    """Walk any pickled pytree (dicts / lists / tuples / namedtuples) and
    re-lay-out every ``deconvs`` kernel. Applied to params AND opt_state
    (optax Adam moments mirror the params structure)."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k == "deconvs" and isinstance(v, (list, tuple)):
                v = [{kk: (_flip_deconv_w(vv) if kk == "w" else vv)
                      for kk, vv in layer.items()} for layer in v]
            else:
                v = _convert_v1(v)
            out[k] = v
        return out
    if isinstance(obj, tuple):
        vals = [_convert_v1(v) for v in obj]
        if hasattr(obj, "_fields"):  # namedtuple (optax states)
            return type(obj)(*vals)
        return tuple(vals)
    if isinstance(obj, list):
        return [_convert_v1(v) for v in obj]
    return obj


def save_checkpoint(path, modalities, params, state=None, opt_state=None,
                    extra=None):
    payload = {
        "format": CHECKPOINT_FORMAT,
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
        payload = pickle.load(f)
    if payload.get("format", 1) < 2:
        for key in ("params", "opt_state"):
            if key in payload:
                payload[key] = _convert_v1(payload[key])
        payload["format"] = CHECKPOINT_FORMAT
    return payload
