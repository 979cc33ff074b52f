"""Weizmann human-action video dataset.

Mirrors /root/reference/datasets/weizmann.py: modalities ``video``
(3×64×64 frames in [0,1]) and ``mask`` (1×64×64 silhouettes) loaded from
npy files named ``{person}_{action}.npy`` / ``{person}_{action}_mask.npy``,
with ``person``/``action`` label modalities derived from the filename IDs
via ``ids_as_mods``. The download pipeline (ffmpeg crop 180×144 → 128×128
→ 64×64, duplicate skipping) is reproduced for connected deployments;
``gen_synthetic`` builds an offline fixture with the same layout for
testing and benchmarking in zero-egress environments.
"""

import os

import numpy as np

from .multiseq import MultiseqDataset

fps = 25.0
persons = ['daria', 'denis', 'eli', 'ido', 'ira',
           'lena', 'lyova', 'moshe', 'shahar']
actions = ['bend', 'jack', 'jump', 'pjump', 'run',
           'side', 'skip', 'walk', 'wave1', 'wave2']
descriptions = ['Bend', 'Jumping jack', 'Jump',
                'Jump in place', 'Run', 'Gallop sideways',
                'Skip', 'Walk', 'One-hand wave', 'Two-hand wave']

duplicates = ['lena_walk', 'lena_run', 'lena_skip']


class WeizmannDataset(MultiseqDataset):
    """Weizmann human action video dataset (weizmann.py:26-38)."""

    def __init__(self, data_dir, base_rate=None, item_as_dict=False):
        if (not os.path.exists(data_dir) or
                len([f for f in os.listdir(data_dir)
                     if f[-3:] == 'npy']) == 0):
            download_weizmann(dest=data_dir)
        super().__init__(
            modalities=['video', 'mask'], dirs=data_dir,
            regex=[r"([^_\W]+)_([^_\W]+)\.npy",
                   r"([^_\W]+)_([^_\W]+)_mask\.npy"],
            preprocess=None, rates=25, base_rate=base_rate,
            truncate=False, ids_as_mods=['person', 'action'],
            item_as_dict=item_as_dict)


def download_weizmann(dest='./weizmann'):
    """Download + preprocess the Weizmann corpus (weizmann.py:40-91).

    Requires network egress and ffmpeg-backed video IO; raises a clear
    error in offline environments (use ``gen_synthetic`` instead)."""
    src_url = ('http://www.wisdom.weizmann.ac.il/~vision/'
               'VideoAnalysis/Demos/SpaceTimeActions/DB/')
    import zipfile
    try:
        import scipy.io
        import skvideo.io
    except ImportError as e:
        raise RuntimeError(
            "Weizmann download needs scipy + scikit-video; in offline "
            "environments use weizmann.gen_synthetic(dest) instead.") \
            from e
    from .download import download as dl

    ffmpeg_params = {'-s': '64x64', '-vf': 'crop=128:128:26:8'}
    if not os.path.exists(dest):
        os.makedirs(dest)
    if not os.path.exists(os.path.join(dest, 'classification_masks.mat')):
        dl('classification_masks.mat', source=src_url, dest=dest)
    masks = scipy.io.loadmat(
        os.path.join(dest, 'classification_masks.mat'))
    masks = masks['original_masks'][0, 0]

    for act in actions:
        zip_path = os.path.join(dest, act + '.zip')
        if not os.path.exists(zip_path):
            dl(act + '.zip', source=src_url, dest=dest)
        with zipfile.ZipFile(zip_path, "r") as f:
            vid_names = [vn for vn in f.namelist() if vn[-3:] == 'avi']
            print("Extracting '{}' videos... ({} files)".format(
                act, len(vid_names)))
            f.extractall(dest, members=vid_names)
        for vn in vid_names:
            vn_no_ext = vn[:-4]
            if vn_no_ext[:-1] in duplicates and vn_no_ext[-1] == '2':
                continue
            print("Converting {} to NPY...".format(vn))
            vid_data = skvideo.io.vread(
                os.path.join(dest, vn), outputdict=ffmpeg_params)
            vid_data = preprocess_video(vid_data)
            mask_data = preprocess_mask(masks[vn_no_ext])
            if vn_no_ext[:-1] in duplicates:
                vn_no_ext = vn_no_ext[:-1]
            np.save(os.path.join(dest, vn_no_ext + '.npy'), vid_data)
            np.save(os.path.join(dest, vn_no_ext + '_mask.npy'),
                    mask_data)


def preprocess_video(video):
    """Crop to central square, scale to [0,1], transpose to (T,C,H,W)
    (weizmann.py:93-105)."""
    height, width = video.shape[1:3]
    side = min(height, width)
    x0 = (width - side) // 2
    y0 = (height - side) // 2
    video = np.array(video[:, y0:y0 + side, x0:x0 + side])
    video = np.transpose(video, (0, 3, 1, 2))
    return video / 255.0


def preprocess_mask(mask):
    """Crop, resize to 64×64, add channel dim (weizmann.py:107-123)."""
    import skimage.transform
    height, width = mask.shape[0:2]
    side = min(height, width)
    x0 = (width - side) // 2
    y0 = (height - side) // 2
    mask = np.array(mask[y0:y0 + side, x0:x0 + side, :]).astype(
        np.float64)
    mask = np.transpose(mask, (2, 0, 1))
    mask = np.stack([skimage.transform.resize(mask[t], (64, 64))
                     for t in range(mask.shape[0])], axis=0)
    return mask[:, np.newaxis, :, :]


def gen_synthetic(dest, persons_subset=None, actions_subset=None,
                  t_range=(30, 60), img_size=64, seed=1):
    """Offline fixture: moving-blob videos + silhouettes with the real
    corpus's file layout ({person}_{action}.npy + _mask.npy).

    Deterministic per (person, action) so train/test splits are stable.
    """
    if persons_subset is None:
        persons_subset = persons
    if actions_subset is None:
        actions_subset = actions
    if not os.path.exists(dest):
        os.makedirs(dest)
    rng = np.random.RandomState(seed)
    for p_i, person in enumerate(persons_subset):
        for a_i, action in enumerate(actions_subset):
            t_len = rng.randint(*t_range)
            video = np.zeros((t_len, 3, img_size, img_size), np.float32)
            mask = np.zeros((t_len, 1, img_size, img_size), np.float32)
            # A moving square whose trajectory depends on the action id
            # and whose color depends on the person id.
            color = rng.rand(3) * 0.8 + 0.2
            for t in range(t_len):
                cx = int((img_size - 12) *
                         (0.5 + 0.4 * np.sin(0.2 * t + a_i)))
                cy = int((img_size - 12) *
                         (0.5 + 0.4 * np.cos(0.15 * t + p_i)))
                video[t, :, cy:cy + 12, cx:cx + 12] = color[:, None, None]
                mask[t, 0, cy:cy + 12, cx:cx + 12] = 1.0
            video += rng.rand(*video.shape).astype(np.float32) * 0.05
            video = np.clip(video, 0.0, 1.0)
            np.save(os.path.join(dest, f"{person}_{action}.npy"), video)
            np.save(os.path.join(dest, f"{person}_{action}_mask.npy"),
                    mask)


def test_dataset(data_dir='./weizmann', stats=False):
    """Dataset self-test CLI (weizmann.py:125-156)."""
    from .multiseq import seq_collate
    print("Loading data...")
    dataset = WeizmannDataset(data_dir)
    print("Number of sequences:", len(dataset))
    print("Sequence ID values:")
    for s in dataset.seq_id_sets:
        print(s)
    print("Testing batch collation...")
    data = seq_collate([dataset[i]
                        for i in range(min(10, len(dataset)))])
    print("Batch shapes:")
    for d in data[:-2]:
        print(d.shape)
    print("Sequence lengths: ", data[-1])
    for i in range(len(dataset)):
        video, mask, person, action = dataset[i]
        if (len(video) != len(person) or len(video) != len(action)
                or len(video) != len(mask)):
            print("WARNING: Mismatched sequence lengths at",
                  dataset.seq_ids[i])
    if stats:
        m_mean, m_std = dataset.mean_and_std()
        m_max, m_min = dataset.max_and_min()
        for m in ['video', 'person', 'action']:
            print("--", m, "--")
            print("Mean:", m_mean[m], "Std:", m_std[m])
            print("Max:", m_max[m], "Min:", m_min[m])


if __name__ == '__main__':
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', type=str, default='./weizmann')
    parser.add_argument('--stats', action='store_true', default=False)
    parser.add_argument('--synthetic', action='store_true', default=False,
                        help='generate the offline synthetic fixture')
    args = parser.parse_args()
    if args.synthetic:
        gen_synthetic(args.data_dir)
    test_dataset(args.data_dir, args.stats)
