"""VidTIMIT application: audio-video trainer, metrics, spectrogram viz,
AVI+WAV export.

Mirrors /root/reference/vidTIMIT.py (VidTIMITTrainer): video+audio both
Bernoulli with conv / audio-conv codecs, z=h=256, train/test split by
sentence IDs sa1/sa2, video MSE+SSIM and audio MSE metrics, storyboard +
spectrogram visualization, and WAV reconstruction through the inverse
STFT.
"""

import copy
import os
from collections import defaultdict

import numpy as np

from ..data import vidtimit
from ..models import codecs
from ..ops import losses
from ..ops.ssim import eval_ssim
from ..training import trainer


class VidTIMITTrainer(trainer.Trainer):
    """Class for training on the VidTIMIT audio-visual dataset."""

    # deepcopy: argparse copy.copy shares _defaults/actions, so one
    # app's set_defaults would contaminate the others' parsers
    # when several apps are imported in-process (suites, tests).
    parser = copy.deepcopy(trainer.Trainer.parser)

    defaults = {
        'modalities': ['video', 'audio'],
        'batch_size': 25, 'split': 25, 'bylen': True,
        'epochs': 500, 'lr': 5e-4,
        'rec_mults': {'video': 1, 'audio': 1},
        'kld_anneal': 250, 'burst_frac': 0.1,
        'drop_frac': 0.0, 'start_frac': 0, 'stop_frac': 1,
        'eval_metric': 'rec_loss', 'viz_metric': 'ssim',
        'eval_freq': 10, 'save_freq': 10,
        'data_dir': './data/vidTIMIT',
        'save_dir': './vidTIMIT_save',
    }
    parser.set_defaults(**defaults)

    def build_model(self, constructor, args):
        """Conv + audio-conv codecs (vidTIMIT.py:50-69)."""
        dims = {'video': (3, 64, 64), 'audio': (10, 1281)}
        dists = {'video': 'Bernoulli', 'audio': 'Bernoulli'}
        z_dim = args.model_args.get('z_dim', 256)
        h_dim = args.model_args.get('h_dim', 256)
        gauss_out = (args.model not in ('MultiDKS', 'dks'))
        model_args = dict(args.model_args)
        model_args.pop('z_dim', None)
        model_args.pop('h_dim', None)
        dt = None
        if model_args.pop('bf16', False):
            import jax.numpy as jnp
            dt = jnp.bfloat16
        encoders = {
            'video': codecs.image_encoder_codec(z_dim, gauss_out,
                                                compute_dtype=dt),
            'audio': codecs.audio_encoder_codec(z_dim, gauss_out,
                                                compute_dtype=dt)}
        decoders = {
            'video': codecs.image_decoder_codec(z_dim, compute_dtype=dt),
            'audio': codecs.audio_decoder_codec(z_dim, compute_dtype=dt)}
        custom = [m for m in ('video', 'audio') if m in args.modalities]
        model = constructor(
            args.modalities,
            dims=[dims[m] for m in args.modalities],
            dists=[dists[m] for m in args.modalities],
            encoders={m: encoders[m] for m in custom},
            decoders={m: decoders[m] for m in custom},
            z_dim=z_dim, h_dim=h_dim, **model_args)
        return model

    def pre_build_args(self, args):
        args = super().pre_build_args(args)
        if args.method in ('b-skip', 'f-skip', 'b-mask', 'f-mask'):
            args.train_args['uni_loss'] = True
        return args

    def post_build_args(self, args):
        corrupt_mult = 1 / (1 - args.corrupt.get('uniform', 0.0))
        args.rec_mults = {m: args.rec_mults[m] * corrupt_mult
                          for m in args.modalities}
        return args

    def load_data(self, modalities, args):
        """Test on sa1/sa2 sentences (vidTIMIT.py:88-103)."""
        print("Loading data...")
        data_dir = os.path.abspath(args.data_dir)
        all_data = vidtimit.VidTIMITDataset(data_dir, item_as_dict=True)
        train_data = all_data.select([None, ['sa1', 'sa2']], invert=True)
        test_data = all_data.select([None, ['sa1', 'sa2']])
        print("Done.")
        if len(args.normalize) > 0:
            print("Normalizing ", args.normalize, "...")
            test_data.normalize_(modalities=args.normalize,
                                 ref_data=train_data)
            train_data.normalize_(modalities=args.normalize)
        return train_data, test_data

    def compute_metrics(self, model, infer, prior, recon, targets, mask,
                        lengths, order, args, rec_mults=None):
        """Video MSE+SSIM, audio MSE (vidTIMIT.py:105-138)."""
        metrics = {}
        t_max = np.asarray(mask).shape[0]
        n_real = len(lengths)
        lengths_f = np.asarray(lengths, np.float32)
        mask_np = np.asarray(mask).astype(bool)

        metrics['kld_loss'] = float(losses.kld_gauss(
            infer[0], infer[1], prior[0], prior[1], mask_np))
        dev_targets = {m: targets[m] for m in recon}
        metrics['rec_loss'] = float(model.rec_loss(
            dev_targets, recon, mask_np, args.rec_mults))

        def time_avg(val):
            val = np.where(mask_np[..., 0], val, 0.0)
            return val.sum(axis=0)[:n_real] / lengths_f

        rec_vid = recon['video'][0]
        tgt_vid = np.nan_to_num(np.asarray(targets['video']))
        v_mse = ((rec_vid - tgt_vid) ** 2
                 / np.prod(rec_vid.shape[2:])).sum(
            axis=tuple(range(2, rec_vid.ndim)))
        ssim = np.asarray(eval_ssim(
            rec_vid.reshape((-1,) + rec_vid.shape[2:]),
            tgt_vid.reshape((-1,) + tgt_vid.shape[2:])))
        ssim = ssim.reshape(t_max, rec_vid.shape[1])

        rec_aud = recon['audio'][0]
        tgt_aud = np.nan_to_num(np.asarray(targets['audio']))
        a_mse = ((rec_aud - tgt_aud) ** 2
                 / np.prod(rec_aud.shape[2:])).sum(
            axis=tuple(range(2, rec_aud.ndim)))

        metrics['v_mse'] = [time_avg(v_mse)[i] for i in order]
        metrics['ssim'] = [time_avg(ssim)[i] for i in order]
        metrics['a_mse'] = [time_avg(a_mse)[i] for i in order]
        return metrics

    def compute_metrics_device(self, model, infer, prior, recon,
                               targets, mask, lengths, rec_mults):
        """Traced per-batch metric kernel (device eval engine): same
        math as ``compute_metrics`` (vidTIMIT.py:105-138) in jnp."""
        import jax.numpy as jnp
        from ..training.eval_engine import time_avg_dev
        t_max, b_dim = mask.shape[:2]
        m_b = mask.astype(bool)
        mets = {
            'kld_loss': losses.kld_gauss(infer[0], infer[1], prior[0],
                                         prior[1], m_b),
            'rec_loss': model.rec_loss(
                {m: targets[m] for m in recon}, recon, m_b, rec_mults),
        }

        rec_vid = recon['video'][0]
        tgt_vid = jnp.nan_to_num(targets['video'])
        v_mse = ((rec_vid - tgt_vid) ** 2
                 / np.prod(rec_vid.shape[2:])).sum(
            axis=tuple(range(2, rec_vid.ndim)))
        ssim = eval_ssim(
            rec_vid.reshape((-1,) + rec_vid.shape[2:]),
            tgt_vid.reshape((-1,) + tgt_vid.shape[2:]))
        ssim = ssim.reshape(t_max, b_dim)

        rec_aud = recon['audio'][0]
        tgt_aud = jnp.nan_to_num(targets['audio'])
        a_mse = ((rec_aud - tgt_aud) ** 2
                 / np.prod(rec_aud.shape[2:])).sum(
            axis=tuple(range(2, rec_aud.ndim)))

        mets['v_mse'] = time_avg_dev(v_mse, mask, lengths)
        mets['ssim'] = time_avg_dev(ssim, mask, lengths)
        mets['a_mse'] = time_avg_dev(a_mse, mask, lengths)
        return mets

    def summarize_metrics(self, metrics, n_timesteps):
        summary = defaultdict(lambda: float('nan'))
        for key, val in metrics.items():
            if isinstance(val, list):
                summary[key] = np.mean(val)
                summary[key + '_std'] = np.std(val)
            else:
                summary[key] = val / n_timesteps
        print('Evaluation\tKLD: {:7.1f}\tRecon: {:7.1f}'.format(
            summary['kld_loss'], summary['rec_loss']))
        print('\tVideo\tMSE: {:2.3f} +/- {:2.3f}\tSSIM: {:2.3f} '
              '+/- {:2.3f}'.format(summary['v_mse'],
                                   summary['v_mse_std'],
                                   summary['ssim'],
                                   summary['ssim_std']))
        print('\tAudio\tMSE: {:2.3f} +/- {:2.3f}'.format(
            summary['a_mse'], summary['a_mse_std']))
        return summary

    def visualize(self, results, metric, args):
        """Video storyboards (col 1) + magnitude spectrograms (col 2)
        (vidTIMIT.py:160-286), headless."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        reference = results['targets']
        observed = results['inputs']
        predicted = results['recon']

        sel_idx = np.concatenate((np.argsort(metric)[-1:][::-1],
                                  np.argsort(metric)[:1]))
        fig, axes = plt.subplots(
            nrows=3 * len(sel_idx), ncols=2,
            figsize=(12, 4 * len(sel_idx) + 0.5))

        def stitch(video, times):
            nc = video.shape[1]
            board = [np.hstack([video[t].transpose(1, 2, 0),
                                np.ones((64, 1, nc))]) for t in times]
            return np.squeeze(np.hstack(board))

        def plot_board(axis, board, y_label):
            axis.set_xticks([])
            axis.set_yticks([])
            if board.ndim == 2:
                axis.imshow(board, cmap='gray')
            else:
                axis.imshow(board)
            axis.set_ylabel(y_label)

        def plot_spectrogram(axis, audio, y_label):
            audio = audio[:, :audio.shape[1] // 2]
            spec = audio[:, 2, :].T  # central window of the 5-stack
            axis.imshow(spec, aspect='auto', cmap='gray')
            axis.set_yticks([0, spec.shape[0] // 2, spec.shape[0] - 1])
            axis.set_ylabel(y_label)
            axis.tick_params(length=0)

        for i, idx in enumerate(sel_idx):
            true = reference['video'][idx]
            obsv = observed['video'][idx]
            pred = predicted['video'][idx][:, 0]
            times = np.linspace(0, len(true) - 1, 8, dtype=int)
            true_b = stitch(true, times)
            obsv_b = stitch(obsv, times)
            pred_b = stitch(np.clip(pred, 0, 1), times)
            obsv_b = np.where(np.isnan(obsv_b), 1.0, obsv_b)
            plot_board(axes[3 * i, 0], true_b, "Original")
            plot_board(axes[3 * i + 1, 0], obsv_b, "Observed")
            plot_board(axes[3 * i + 2, 0], pred_b, "Reconstructed")
            axes[3 * i, 0].set_title(
                'Metric: {:0.3f}'.format(metric[idx]),
                fontdict={'fontsize': 10}, loc='right')

            t_aud = reference['audio'][idx]
            o_aud = np.array(observed['audio'][idx], copy=True)
            p_aud = predicted['audio'][idx][:, 0]
            o_aud[np.isnan(o_aud)] = 1.0
            plot_spectrogram(axes[3 * i, 1], t_aud, "Original")
            plot_spectrogram(axes[3 * i + 1, 1], o_aud, "Observed")
            plot_spectrogram(axes[3 * i + 2, 1], p_aud, "Reconstructed")

        for ax in axes.ravel():
            for spine in ax.spines.values():
                spine.set_visible(False)
        plt.tight_layout()
        if getattr(args, 'eval_set', None) is not None:
            fig_path = os.path.join(args.save_dir,
                                    args.eval_set + '.pdf')
        else:
            fig_path = os.path.join(args.save_dir, 'visualize.pdf')
        plt.savefig(fig_path)
        plt.close(fig)

    def save_results(self, results, args):
        """AVI + WAV export; audio reconstructed via the inverse STFT
        (vidTIMIT.py:288-374)."""
        import cv2 as cv
        import scipy.io.wavfile
        print("Saving results...")
        seq_ids = results['seq_ids']
        reference = results['targets']
        observed = results['inputs']
        predicted = results['recon']

        save_args = {'one_file': True,
                     'filename': str(args.eval_set),
                     'comparison': True}
        save_args.update(args.save_args)

        shape = reference['video'][0].shape[2:4]
        if save_args['comparison']:
            shape = (shape[0] * 3, shape[1])
        fps = vidtimit.fps
        audio_rate = vidtimit.audio_rate

        if save_args['one_file']:
            path = os.path.join(args.save_dir, save_args['filename'])
            vwriter = cv.VideoWriter(path + '.avi', 0, fps, shape)
            wav_all = np.empty((0,), float)

        def preprocess(frame):
            return cv.cvtColor(
                (np.clip(np.nan_to_num(frame), 0, 1)
                 * 255).astype('uint8'), cv.COLOR_RGB2BGR)

        for i, seq_id in enumerate(seq_ids):
            r_wav = vidtimit.spec_to_wav(
                np.nan_to_num(reference['audio'][i]), audio_rate)
            o_wav = vidtimit.spec_to_wav(
                np.nan_to_num(observed['audio'][i]), audio_rate)
            p_wav = vidtimit.spec_to_wav(
                predicted['audio'][i][:, 0], audio_rate)
            if save_args['comparison']:
                wav = np.concatenate([r_wav, o_wav, p_wav], axis=0)
            else:
                wav = p_wav

            r_vid = reference['video'][i].transpose((0, 2, 3, 1))
            o_vid = observed['video'][i].transpose((0, 2, 3, 1))
            p_vid = predicted['video'][i][:, 0].transpose((0, 2, 3, 1))

            if not save_args['one_file']:
                path = os.path.join(
                    args.save_dir, '{}_{}'.format(seq_id[0], seq_id[1]))
                vwriter = cv.VideoWriter(path + '.avi', 0, fps, shape)

            for t in range(len(p_vid)):
                frame = preprocess(p_vid[t])
                if not save_args['comparison']:
                    vwriter.write(frame)
                    continue
                vwriter.write(np.hstack([preprocess(r_vid[t]),
                                         preprocess(o_vid[t]), frame]))
            if save_args['one_file']:
                wav_all = np.append(wav_all, wav, axis=0)
            else:
                vwriter.release()
                scipy.io.wavfile.write(path + '.wav', audio_rate, wav)
        if save_args['one_file']:
            vwriter.release()
            scipy.io.wavfile.write(path + '.wav', audio_rate, wav_all)


def main(argv=None):
    """Console entry point (pyproject: mdmm-vidtimit)."""
    args = VidTIMITTrainer.parser.parse_args(argv)
    VidTIMITTrainer(args).run(args)


if __name__ == "__main__":
    main()
