"""Device-resident eval engine: pre-uploaded eval sets and on-device
eval-task composition.

The reference's evaluate loop (/root/reference/trainer.py:264-323)
re-corrupts every eval batch on the host with numpy
(`rand_delete`/`keep_segment`, multiseq.py:405-448), re-uploads it, and
the app metric hooks pull tensors back per batch. On a remote-dispatch
TPU backend that cost ~17 s per periodic eval and made multi-seed
suites wall-bound (ROADMAP r2). Here:

- `DeviceEvalData` collates each eval set ONCE (identical batching to
  `BatchLoader`) and leaves the padded target batches resident in HBM
  for the whole run;
- `compose_task` builds the eval-task inputs (random deletion, kept
  segment, dropped/kept modalities) INSIDE the jitted step with
  `jax.random` — same distributions as the reference operators: per
  (modality, sequence) it deletes exactly ``int(drop_frac·L)`` distinct
  valid timesteps chosen uniformly without replacement, then everything
  outside ``[int(start_frac·L), int(stop_frac·L))`` (documented RNG-
  source deviation from the host path's numpy, distributionally
  identical; deterministic tasks — drop_frac=0 — are bit-equivalent);
- the per-app metric kernels (apps' ``compute_metrics_device``) reduce
  to per-sequence scalars on device, so one small dict per batch is all
  that crosses the wire, drained in a single ``jax.device_get``.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .loader import BatchLoader


class _EvalBatch:
    """One collated eval batch: device targets/mask + host metadata."""

    __slots__ = ("targets", "mask", "lengths_dev", "lengths", "order",
                 "ids")

    def __init__(self, targets, mask, lengths_dev, lengths, order, ids):
        self.targets = targets
        self.mask = mask
        self.lengths_dev = lengths_dev
        self.lengths = lengths
        self.order = order
        self.ids = ids


class DeviceEvalData:
    """HBM-resident eval set with the exact `BatchLoader` batching."""

    def __init__(self, dataset, modalities, batch_size, len_bucket=0,
                 put=None):
        put = put or jax.device_put
        loader = BatchLoader(dataset, batch_size=batch_size,
                             len_bucket=len_bucket)
        self.batches = []
        for targets, mask, lengths, order, ids in loader:
            t_max, b_dim = mask.shape[:2]
            dev_targets = {m: put(jnp.asarray(targets[m]))
                           for m in targets if m in modalities}
            # Ghost columns get length 0 → fully masked everywhere.
            lengths_pad = np.zeros((b_dim,), np.float32)
            lengths_pad[:len(lengths)] = lengths
            self.batches.append(_EvalBatch(
                dev_targets, put(jnp.asarray(mask)),
                put(jnp.asarray(lengths_pad)),
                list(lengths), list(order), list(ids)))


def time_avg_dev(val, mask, lengths):
    """(T, B) per-step values → (B,) per-sequence time averages.

    Matches the apps' host ``time_avg`` (e.g. apps/spirals.py
    compute_metrics): zero out padded steps via the length mask, sum
    over time, divide by sequence length. Ghost columns (length 0)
    divide by 1 and are trimmed host-side.
    """
    val = jnp.where(mask[..., 0].astype(bool), val, 0.0)
    return jnp.sum(val, axis=0) / jnp.maximum(lengths, 1.0)


def compose_task(targets, lengths, key, drop_frac, start_frac,
                 stop_frac, drop_mods=(), keep_mods=(), modalities=None):
    """On-device eval-task input construction (trainer.py:283-292).

    targets : dict of (T, B, ...) device arrays (NaN = missing)
    lengths : (B,) float sequence lengths (0 for ghost columns)
    drop_frac/start_frac/stop_frac : traced scalars (one compile serves
        every task of a suite)
    drop_mods/keep_mods : STATIC modality-name tuples

    Per (modality, sequence): delete ``int(drop_frac·L)`` uniformly
    chosen valid timesteps (rand_delete), then all timesteps outside
    ``[int(start_frac·L), int(stop_frac·L))`` (keep_segment), then
    NaN-fill ``drop_mods`` and restore ``keep_mods`` from targets.
    """
    mods = list(modalities) if modalities is not None else list(targets)
    some = targets[mods[0]]
    t_max, b_dim = some.shape[:2]
    t_idx = jnp.arange(t_max)                       # (T,)
    lengths_i = lengths.astype(jnp.int32)           # (B,)
    valid = t_idx[:, None] < lengths_i[None, :]     # (T, B)

    # rand_delete: k-smallest of per-(m, b) uniform scores over valid
    # positions ≡ uniform sampling of k positions without replacement.
    n_del = (drop_frac * lengths).astype(jnp.int32)  # (B,)
    scores = jax.random.uniform(key, (len(mods), t_max, b_dim))
    scores = jnp.where(valid[None], scores, jnp.inf)
    kth_idx = jnp.clip(n_del - 1, 0, t_max - 1)      # (B,)
    sorted_scores = jnp.sort(scores, axis=1)         # (M, T, B)
    kth = jnp.take_along_axis(
        sorted_scores, jnp.broadcast_to(
            kth_idx[None, None, :], (len(mods), 1, b_dim)), axis=1)
    rand_del = (scores <= kth) & (n_del > 0)[None, None, :]

    # keep_segment: delete outside [t_start, t_stop).
    t_start = (start_frac * lengths).astype(jnp.int32)
    t_stop = (stop_frac * lengths).astype(jnp.int32)
    seg_del = ((t_idx[:, None] < t_start[None, :])
               | (t_idx[:, None] >= t_stop[None, :]))  # (T, B)

    inputs = {}
    for mi, m in enumerate(mods):
        if m not in targets:
            continue
        x = targets[m]
        if m in keep_mods:
            inputs[m] = x
            continue
        if m in drop_mods:
            inputs[m] = jnp.full_like(x, jnp.nan)
            continue
        dele = (rand_del[mi] | seg_del) & valid
        dele = dele.reshape(dele.shape + (1,) * (x.ndim - 2))
        inputs[m] = jnp.where(dele, jnp.nan, x)
    return inputs
