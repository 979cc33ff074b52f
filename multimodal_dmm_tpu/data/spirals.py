"""Noisy 2D spirals: synthetic dataset generator + loader.

Mirrors /root/reference/datasets/spirals.py — the deterministic, CPU-cheap
end-to-end fixture of the framework (fixed seed 1, 1000 spirals, 600 train /
400 test, 100 timesteps).
"""

import os

import numpy as np
import numpy.random as rand

from .multiseq import MultiseqDataset, seq_collate


class SpiralsDataset(MultiseqDataset):
    """Dataset of noisy spirals (spirals.py:17-45)."""

    def __init__(self, modalities, base_dir, subset,
                 base_rate=None, truncate=False, item_as_dict=False):
        subset_dir = os.path.join(base_dir, subset)
        if not os.path.exists(subset_dir):
            gen_dataset(data_dir=base_dir)
        if "metadata" not in modalities:
            modalities = list(modalities) + ["metadata"]
        regex = r"spiral_(\d+)\.csv"
        rates = 1.0
        preprocess = {
            "spiral-x": lambda df: df.loc[:, ["noisy_x"]],
            "spiral-y": lambda df: df.loc[:, ["noisy_y"]],
            "metadata": lambda df: df.drop(columns=["noisy_x", "noisy_y"]),
        }
        super().__init__(
            modalities, subset_dir, regex,
            [preprocess[m] for m in modalities],
            rates, base_rate if base_rate is not None else rates,
            truncate, [], item_as_dict)


def gen_spiral(start_r, stop_r, start_theta, stop_theta,
               aspect_ratio=1, timesteps=100):
    r = np.linspace(start_r, stop_r, timesteps)
    theta = np.linspace(start_theta, stop_theta, timesteps)
    x = (aspect_ratio ** 0.5) * r * np.cos(theta)
    y = (aspect_ratio ** -0.5) * r * np.sin(theta)
    return r, theta, x, y


def gen_dataset(n_examples=1000, n_train=600, timesteps=100,
                data_dir="./spirals"):
    """Generate the spiral CSV corpus (spirals.py:55-97, fixed seed 1)."""
    import pandas as pd
    if not os.path.exists(data_dir):
        os.makedirs(data_dir)
    for sub in ("train", "test"):
        if not os.path.exists(os.path.join(data_dir, sub)):
            os.makedirs(os.path.join(data_dir, sub))
    rand.seed(1)
    indices = list(range(n_examples))
    rand.shuffle(indices)
    spirals = []
    for i in range(n_examples):
        direction = 1 if (i >= n_examples / 2) else -1
        start_r = 0.25 + rand.random() * 0.5
        stop_r = 2.25 + rand.random() * 0.5
        start_theta = direction * (rand.random() * np.pi)
        stop_theta = direction * (rand.random() * np.pi + np.pi * 4)
        ratio = 2 ** (2 * rand.random() - 1)
        r, theta, x, y = gen_spiral(start_r, stop_r, start_theta,
                                    stop_theta, ratio, timesteps)
        noisy_x = x + 0.1 * rand.randn(timesteps)
        noisy_y = y + 0.1 * rand.randn(timesteps)
        spiral = np.stack([x, y, noisy_x, noisy_y, r, theta,
                           [direction] * timesteps,
                           [ratio] * timesteps], axis=1)
        spirals.append(spiral)
    for i in range(n_examples):
        subset = "train" if i < n_train else "test"
        fn = os.path.join(data_dir, subset,
                          "spiral_{:03d}.csv".format(indices[i]))
        pd.DataFrame(spirals[indices[i]],
                     columns=["x", "y", "noisy_x", "noisy_y",
                              "r", "theta", "direction", "ratio"]).\
            to_csv(fn, index=False)


def test_dataset(data_dir="./spirals", subset="train", stats=False):
    """Smoke-test loading + collation (spirals.py:99-124)."""
    print("Loading data...")
    dataset = SpiralsDataset(["spiral-x", "spiral-y"], data_dir, subset)
    print("Testing batch collation...")
    data = seq_collate([dataset[i] for i in range(min(10, len(dataset)))])
    print("Batch shapes:")
    for d in data[:-2]:
        print(d.shape)
    print("Sequence lengths: ", data[-1])
    for i in range(len(dataset)):
        x, y = dataset[i][:2]
        if len(x) != len(y):
            print("WARNING: Mismatched sequence lengths at",
                  dataset.seq_ids[i])
    if stats:
        m_mean, m_std = dataset.mean_and_std()
        m_max, m_min = dataset.max_and_min()
        for m in dataset.modalities:
            print("--", m, "--")
            print("Mean:", m_mean[m], "Std:", m_std[m])
            print("Max:", m_max[m], "Min:", m_min[m])


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_examples", type=int, default=1000)
    parser.add_argument("--n_train", type=int, default=600)
    parser.add_argument("--timesteps", type=int, default=100)
    parser.add_argument("--data_dir", type=str, default="./spirals")
    parser.add_argument("--test", action="store_true", default=False)
    parser.add_argument("--subset", type=str, default="train")
    parser.add_argument("--stats", action="store_true", default=False)
    args = parser.parse_args()
    if args.test:
        test_dataset(args.data_dir, args.subset, args.stats)
    else:
        gen_dataset(args.n_examples, args.n_train,
                    args.timesteps, args.data_dir)
