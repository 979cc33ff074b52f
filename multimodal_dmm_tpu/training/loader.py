"""Host-side batch loader.

Replaces torch DataLoader (/root/reference/trainer.py:508-515): shuffles
with numpy RNG, collates with `seq_collate_dict`, and NaN-pads the batch
dimension so every batch in an epoch has the same static (T, B) — XLA
compiles the train step once per distinct shape.

Padding contract: padded "ghost" sequences have length 0, all-NaN data and
an all-False length mask, so they contribute exactly zero to the summed
losses; `lengths`/`order`/`seq_ids` are reported for the real sequences
only.
"""

import numpy as np

from ..data import multiseq as mseq


class BatchLoader:
    """Iterates a MultiseqDataset in collated batches."""

    def __init__(self, dataset, batch_size, shuffle=False,
                 pad_batch=True, max_len=None, len_bucket=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pad_batch = pad_batch
        self.max_len = max_len
        # Round each batch's time axis up to a multiple of ``len_bucket``
        # so ragged-length batches hit a small set of compiled shapes
        # (SURVEY §7.1: length-bucketed padding for XLA recompile
        # control). Padded steps are masked out of every loss/metric, so
        # bucketing is numerics-neutral.
        self.len_bucket = int(len_bucket or 0)

    def __len__(self):
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.shuffle(idx)
        for start in range(0, n, self.batch_size):
            items = [self.dataset[int(i)] for i in
                     idx[start:start + self.batch_size]]
            max_len = self.max_len
            if max_len is None and self.len_bucket > 1:
                t_max = max(d["length"] for d in items)
                max_len = (-(-t_max // self.len_bucket)
                           * self.len_bucket)
            batch, mask, lengths, order, ids = mseq.seq_collate_dict(
                items, max_len=max_len)
            n_real = len(lengths)
            if self.pad_batch and n_real < self.batch_size:
                pad = self.batch_size - n_real
                t_max = mask.shape[0]
                for m in batch:
                    shape = (t_max, pad) + batch[m].shape[2:]
                    batch[m] = np.concatenate(
                        [batch[m], np.full(shape, np.nan,
                                           batch[m].dtype)], axis=1)
                mask = np.concatenate(
                    [mask, np.zeros((t_max, pad, 1), mask.dtype)], axis=1)
            yield batch, mask, lengths, order, ids
