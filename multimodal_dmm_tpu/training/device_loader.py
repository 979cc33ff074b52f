"""Device-resident training data: upload the (padded) training set to
HBM once, then do per-epoch shuffling, batch gathering, and burst-
deletion augmentation on the device.

The reference's input pipeline re-collates numpy batches every epoch in
DataLoader workers (trainer.py:508-511); on hosts with few cores that
dominates wall-clock (measured ~9 s/epoch host vs 0.4 s/epoch device on
synthetic Weizmann). Here the whole pipeline is device work:

- `build` NaN-pads every (post-split) training sequence to the global
  max length and stacks per-modality (N, T, ...) arrays in HBM;
- `gather_and_burst` (jitted) takes a batch-index vector and a PRNG key,
  gathers (T, B, ...) batches, and applies the reference's burst
  deletion (one contiguous NaN window per sequence, width
  int(frac·len), start uniform in [0, len); trainer.py:234-235 +
  multiseq.py:428-434) — with jax.random instead of numpy (documented
  RNG-source deviation; distributionally identical).

Sequences are length-sorted before stacking so fixed-stride batches
mirror the collate contract (each batch internally sorted by length).
"""

import numpy as np

import jax
import jax.numpy as jnp


class DeviceTrainData:
    """HBM-resident training set + jitted batch construction."""

    def __init__(self, dataset, modalities, batch_size, burst_frac,
                 native_perms=None):
        self.batch_size = batch_size
        self.burst_frac = burst_frac
        # Modality → trailing-dim permutation: store those modalities in
        # the codec-native layout (e.g. video (C,H,W) → (H,W,C)), paid
        # once at upload so the train step needs zero edge transposes
        # (model.native_input_perms; the step must get native_mods).
        self.native_perms = dict(native_perms or {})
        n = len(dataset)
        items = [dataset[i] for i in range(n)]
        # Sort by length descending so every fixed-stride batch is
        # internally length-sorted (collate contract).
        order = sorted(range(n), key=lambda i: items[i]["length"],
                       reverse=True)
        items = [items[i] for i in order]
        self.lengths = np.array([it["length"] for it in items],
                                dtype=np.int32)
        t_max = int(self.lengths.max())
        self.t_max = t_max
        self.n = n
        self.modalities = [m for m in modalities]
        self.data = {}
        for m in self.modalities:
            dims = tuple(items[0][m].shape[1:])
            perm = self.native_perms.get(m)
            if perm is not None:
                if len(perm) != len(dims):
                    raise ValueError(
                        "native perm %r does not match %s dims %r"
                        % (perm, m, dims))
                dims = tuple(dims[p] for p in perm)
            arr = np.full((n, t_max) + dims, np.nan, np.float32)
            for i, it in enumerate(items):
                x = it[m]
                if perm is not None:
                    x = np.transpose(x, (0,) + tuple(1 + p
                                                     for p in perm))
                arr[i, :len(x)] = x
            self.data[m] = jax.device_put(arr)
        self.lengths_dev = jax.device_put(self.lengths)
        # The HBM-resident set is passed as an ARGUMENT to the jitted
        # gather, never closed over: closure arrays become HLO
        # constants, which bloats the compile payload by the full
        # dataset size (and trips request limits on remote-compile
        # backends).
        self._gather = jax.jit(self._gather_and_burst)

    def _gather_and_burst(self, data, lengths_all, idx, real, key):
        lengths = lengths_all[idx]                         # (B,)
        t_idx = jnp.arange(self.t_max)                     # (T,)
        mask = ((t_idx[:, None] < lengths[None, :])
                & real[None, :])[..., None]
        # One burst window per (modality, sequence) — the reference's
        # func_delete draws del_func independently for every modality
        # (multiseq.py:405-434).
        n_mods = len(self.modalities)
        start = jax.random.randint(
            key, (n_mods, len(idx)), 0,
            jnp.maximum(lengths, 1)[None, :])
        width = (self.burst_frac * lengths).astype(jnp.int32)
        stop = jnp.minimum(start + width[None, :], lengths[None, :])
        burst = ((t_idx[None, :, None] >= start[:, None, :])
                 & (t_idx[None, :, None] < stop[:, None, :]))  # (M,T,B)
        targets, inputs = {}, {}
        for mi, m in enumerate(self.modalities):
            x = jnp.take(data[m], idx, axis=0)        # (B, T, ...)
            x = jnp.moveaxis(x, 0, 1)                      # (T, B, ...)
            targets[m] = x
            bm = burst[mi].reshape(
                burst[mi].shape + (1,) * (x.ndim - 2))
            inputs[m] = jnp.where(bm, jnp.nan, x)
        return inputs, targets, mask.astype(jnp.float32)

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch(self, seed):
        """Yield (inputs, targets, mask, lengths_list) device batches."""
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        # Shuffle batch starting offsets (keeps per-batch length order).
        perm = rng.permutation(self.n)
        key = jax.random.PRNGKey(seed & 0x7FFFFFFF)
        for start in range(0, self.n, self.batch_size):
            sel = np.sort(perm[start:start + self.batch_size])
            n_real = len(sel)
            if n_real < self.batch_size:
                # Ghost-pad (host-loader parity): padded rows get an
                # all-False mask and contribute zero loss.
                sel = np.concatenate(
                    [sel, np.zeros(self.batch_size - n_real,
                                   dtype=sel.dtype)])
            real = np.arange(self.batch_size) < n_real
            key, sub = jax.random.split(key)
            inputs, targets, mask = self._gather(
                self.data, self.lengths_dev,
                jnp.asarray(sel, jnp.int32), jnp.asarray(real), sub)
            lengths = [int(l) for l in self.lengths[sel[:n_real]]]
            yield inputs, targets, mask, lengths
