"""VidTIMIT audio-video talking-heads dataset.

Mirrors /root/reference/datasets/vidTIMIT.py: ``audio`` (stacked STFT
spectrogram slices, (10, 1281) = 5 frames × (log-magnitude + phase),
25 slices/sec) and ``video`` (3×64×64), matched by
``{subject}_{sentence}.npy`` filenames under audio/ and video/ subdirs.
Includes the invertible spectrogram transform pair
``wav_to_spec``/``spec_to_wav`` (STFT window 2560 @ 32 kHz, 5-frame
channel stacking, magnitudes log-normalized to [0,1], phase normalized to
[0,1]) and an offline synthetic fixture generator.
"""

import os

import numpy as np

from .multiseq import MultiseqDataset

fps = 25.0
audio_rate = 32000
subjects = [
    'fadg0', 'faks0', 'fcft0', 'fcmh0', 'fcmr0', 'fcrh0', 'fdac1',
    'fdms0', 'fdrd1', 'fedw0', 'felc0', 'fgjd0', 'fjas0', 'fjem0',
    'fjre0', 'fjwb0', 'fkms0', 'fpkt0', 'fram1', 'mabw0', 'mbdg0',
    'mbjk0', 'mccs0', 'mcem0', 'mdab0', 'mdbb0', 'mdld0', 'mgwt0',
    'mjar0', 'mjsw0', 'mmdb1', 'mmdm2', 'mpdf0', 'mpgl0', 'mrcz0',
    'mreb0', 'mrgg0', 'mrjo0', 'msjs1', 'mstk0', 'mtas1', 'mtmr0',
    'mwbt0'
]


class VidTIMITDataset(MultiseqDataset):
    """VidTIMIT audio/video dataset (vidTIMIT.py:26-43)."""

    def __init__(self, data_dir, base_rate=None, item_as_dict=False):
        audio_dir = os.path.join(data_dir, 'audio')
        video_dir = os.path.join(data_dir, 'video')
        if (not os.path.exists(data_dir) or
                not os.path.exists(audio_dir) or
                not os.path.exists(video_dir) or
                len([f for f in os.listdir(audio_dir)
                     if f[-3:] == 'npy']) == 0 or
                len([f for f in os.listdir(video_dir)
                     if f[-3:] == 'npy']) == 0):
            download_vidTIMIT(dest=data_dir)
        super().__init__(
            modalities=['audio', 'video'], dirs=[audio_dir, video_dir],
            regex=r"(\w+)_(\w+)\.npy", preprocess=None,
            rates=fps, base_rate=base_rate, truncate=True,
            ids_as_mods=[], item_as_dict=item_as_dict)


def download_vidTIMIT(dest='./vidTIMIT'):
    """Download + preprocess VidTIMIT (vidTIMIT.py:45-107). Needs network
    egress; use ``gen_synthetic`` in offline environments."""
    src_url = 'https://zenodo.org/record/158963/files/'
    import zipfile
    import scipy.io.wavfile
    from .download import download as dl

    if not os.path.exists(dest):
        os.makedirs(dest)
    vid_dir = os.path.join(dest, 'video')
    aud_dir = os.path.join(dest, 'audio')
    for d in (vid_dir, aud_dir):
        if not os.path.exists(d):
            os.makedirs(d)

    for subj in subjects:
        subj_path = os.path.join(dest, subj)
        zip_path = subj_path + '.zip'
        if not os.path.exists(zip_path):
            dl(subj + '.zip', source=src_url, dest=dest)
        if not os.path.exists(subj_path):
            with zipfile.ZipFile(zip_path, "r") as f:
                print("Extracting subject '{}'".format(subj))
                f.extractall(dest)

        subj_vid_dir = os.path.join(subj_path, 'video')
        for vid_name in os.listdir(subj_vid_dir):
            vid_path = os.path.join(subj_vid_dir, vid_name)
            if not os.path.isdir(vid_path):
                continue
            if vid_name[:4] == 'head':  # skip head-rotation videos
                continue
            print("Converting {} to NPY...".format(vid_path))
            vid_data = preprocess_video(img_dir_to_npy(vid_path))
            np.save(os.path.join(vid_dir,
                                 subj + '_' + vid_name + '.npy'),
                    vid_data)

        subj_aud_dir = os.path.join(subj_path, 'audio')
        for aud_name in os.listdir(subj_aud_dir):
            if aud_name[-4:] != '.wav':
                continue
            aud_path = os.path.join(subj_aud_dir, aud_name)
            print("Converting {} to NPY...".format(aud_path))
            rate, aud_data = scipy.io.wavfile.read(aud_path)
            np.save(os.path.join(aud_dir,
                                 subj + '_' + aud_name[:-4] + '.npy'),
                    wav_to_spec(aud_data, rate))


def img_dir_to_npy(path):
    import PIL.Image
    fnames = sorted(os.listdir(path))
    return np.array([np.array(PIL.Image.open(os.path.join(path, f)))
                     for f in fnames])


def preprocess_video(video):
    """Central-square crop, resize to 64×64, [0,1], (T,C,H,W)
    (vidTIMIT.py:116-130)."""
    import skimage.transform
    height, width = video.shape[1:3]
    side = min(height, width)
    x0 = (width - side) // 2
    y0 = (height - side) // 2
    video = np.array(video[:, y0:y0 + side, x0:x0 + side])
    video = np.stack([skimage.transform.resize(video[t], (64, 64, 3))
                      for t in range(video.shape[0])], axis=0)
    return np.transpose(video, (0, 3, 1, 2))


def wav_to_spec(wav, rate):
    """Waveform → stacked spectrogram slices, 25 windows/sec
    (vidTIMIT.py:132-156)."""
    import scipy.signal
    win_sz = rate / fps * 2  # 2560 @ 32kHz
    f, t, spec = scipy.signal.stft(wav, rate, nperseg=win_sz,
                                   noverlap=win_sz / 2)
    spec = spec.T
    overlap = 2
    n_wins = spec.shape[0]
    spec = np.pad(spec, [(overlap, overlap), (0, 0)], mode='constant')
    spec = spec[np.arange(n_wins)[:, None]
                + np.arange(overlap * 2 + 1)]
    mag, phase = np.abs(spec), np.angle(spec)
    eps = 1e-7
    max_mag = win_sz * 2
    mag = ((np.log(mag + eps) - np.log(eps))
           / (np.log(max_mag + eps) - np.log(eps)))
    phase = (phase + np.pi) / (2 * np.pi)
    return np.concatenate([mag, phase], axis=1)


def spec_to_wav(spec, rate):
    """Inverse of ``wav_to_spec`` (vidTIMIT.py:158-178)."""
    import scipy.signal
    win_sz = rate / fps * 2
    eps = 1e-7
    max_mag = win_sz * 2
    mag = spec[:, :spec.shape[1] // 2]
    mag = np.exp(mag * (np.log(max_mag + eps) - np.log(eps))
                 + np.log(eps)) + eps
    phase = spec[:, spec.shape[1] // 2:]
    phase = phase * (2 * np.pi) - np.pi
    spec = mag * np.cos(phase) + mag * np.sin(phase) * 1j
    overlap = 2
    spec = spec[:, overlap, :]
    spec = spec.T
    t, wav = scipy.signal.istft(spec, rate, nperseg=win_sz,
                                noverlap=win_sz / 2)
    return wav


def gen_synthetic(dest, n_subjects=4, n_sentences=3, t_range=(40, 80),
                  seed=1):
    """Offline fixture with the real corpus layout: audio/ and video/
    subdirs of {subject}_{sentence}.npy, audio built by round-tripping a
    synthetic harmonic waveform through ``wav_to_spec``."""
    aud_dir = os.path.join(dest, 'audio')
    vid_dir = os.path.join(dest, 'video')
    for d in (dest, aud_dir, vid_dir):
        if not os.path.exists(d):
            os.makedirs(d)
    rng = np.random.RandomState(seed)
    sentences = ['sa1', 'sa2'] + [f'si{i}' for i in
                                  range(1, n_sentences - 1)]
    for s_i in range(n_subjects):
        subj = subjects[s_i]
        for sent in sentences[:n_sentences]:
            t_len = rng.randint(*t_range)
            n_samples = int(t_len * audio_rate / fps)
            ts = np.arange(n_samples) / audio_rate
            f0 = 100 + 30 * s_i
            wav = sum(np.sin(2 * np.pi * f0 * (k + 1) * ts) / (k + 1)
                      for k in range(4))
            wav = (wav * 0.3 + rng.randn(n_samples) * 0.01)
            spec = wav_to_spec(wav.astype(np.float32), audio_rate)
            video = np.zeros((t_len, 3, 64, 64), np.float32)
            color = rng.rand(3) * 0.8 + 0.2
            for t in range(t_len):
                cy = int(26 + 10 * np.sin(0.3 * t))
                video[t, :, cy:cy + 12, 26:38] = color[:, None, None]
            video += rng.rand(*video.shape).astype(np.float32) * 0.05
            video = np.clip(video, 0, 1)
            np.save(os.path.join(aud_dir, f"{subj}_{sent}.npy"),
                    spec.astype(np.float32))
            np.save(os.path.join(vid_dir, f"{subj}_{sent}.npy"), video)


def test_dataset(data_dir='./vidTIMIT', stats=False):
    """Dataset self-test CLI (vidTIMIT.py:180-209)."""
    from .multiseq import seq_collate
    print("Loading data...")
    dataset = VidTIMITDataset(data_dir)
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
        audio, video = dataset[i]
        if len(audio) != len(video):
            print("WARNING: Mismatched sequence lengths at",
                  dataset.seq_ids[i])
    if stats:
        m_mean, m_std = dataset.mean_and_std()
        m_max, m_min = dataset.max_and_min()
        for m in ['audio', 'video']:
            print("--", m, "--")
            print("Mean:", m_mean[m], "Std:", m_std[m])
            print("Max:", m_max[m], "Min:", m_min[m])


if __name__ == '__main__':
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', type=str, default='./vidTIMIT')
    parser.add_argument('--stats', action='store_true', default=False)
    parser.add_argument('--synthetic', action='store_true', default=False,
                        help='generate the offline synthetic fixture')
    args = parser.parse_args()
    if args.synthetic:
        gen_synthetic(args.data_dir)
    test_dataset(args.data_dir, args.stats)
