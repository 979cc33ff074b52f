"""Weizmann application: trainer subclass, metrics, storyboards, video
export.

Mirrors /root/reference/weizmann.py (WeizmannTrainer): video+person+action
(mask optional) with conv codecs, Bernoulli/Categorical dists, z=h=256,
leave-'shahar'-out split, MSE+SSIM and label-accuracy metrics, storyboard
visualization and AVI export.
"""

import copy
import os
from collections import defaultdict

import numpy as np

from ..data import weizmann
from ..models import codecs
from ..ops import losses
from ..ops.ssim import eval_ssim
from ..training import trainer


class WeizmannTrainer(trainer.Trainer):
    """Class for training on the Weizmann human action dataset."""

    # deepcopy: argparse copy.copy shares _defaults/actions, so one
    # app's set_defaults would contaminate the others' parsers
    # when several apps are imported in-process (suites, tests).
    parser = copy.deepcopy(trainer.Trainer.parser)
    parser.add_argument('--viz_mod', type=str, default='video',
                        metavar='M', help='image modality to visualize')

    defaults = {
        'modalities': ['video', 'person', 'action'],
        'batch_size': 25, 'split': 25, 'bylen': True,
        'epochs': 500, 'lr': 5e-4,
        'rec_mults': {'video': 1, 'mask': 1, 'person': 10, 'action': 10},
        'kld_anneal': 250, 'burst_frac': 0.2,
        'drop_frac': 0.5, 'start_frac': 0, 'stop_frac': 1,
        'eval_metric': 'rec_loss', 'viz_metric': 'ssim',
        'eval_freq': 10, 'save_freq': 10,
        'data_dir': './data/weizmann',
        'save_dir': './weizmann_save',
    }
    parser.set_defaults(**defaults)

    def build_model(self, constructor, args):
        """Conv codecs per image modality (weizmann.py:53-77)."""
        dims = {'video': (3, 64, 64), 'mask': (1, 64, 64),
                'person': 10, 'action': 10}
        dists = {'video': 'Bernoulli', 'mask': 'Bernoulli',
                 'person': 'Categorical', 'action': 'Categorical'}
        z_dim = args.model_args.get('z_dim', 256)
        h_dim = args.model_args.get('h_dim', 256)
        gauss_out = (args.model not in ('MultiDKS', 'dks'))
        model_args = dict(args.model_args)
        model_args.pop('z_dim', None)
        model_args.pop('h_dim', None)
        # bf16 codec compute (f32 masters/accumulation) via
        # --model_args '{bf16: true}'.
        dt = None
        if model_args.pop('bf16', False):
            import jax.numpy as jnp
            dt = jnp.bfloat16
        encoders = {
            'video': codecs.image_encoder_codec(z_dim, gauss_out,
                                                compute_dtype=dt),
            'mask': codecs.image_encoder_codec(z_dim, gauss_out,
                                               n_channels=1,
                                               compute_dtype=dt)}
        decoders = {
            'video': codecs.image_decoder_codec(z_dim, compute_dtype=dt),
            'mask': codecs.image_decoder_codec(z_dim, n_channels=1,
                                               compute_dtype=dt)}
        custom = [m for m in ('video', 'mask') if m in args.modalities]
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
            args.model_args['feat_to_z'] = True
            args.train_args['uni_loss'] = True
        return args

    def post_build_args(self, args):
        """Scale rec_mults by corruption (weizmann.py:90-96)."""
        corrupt_mult = 1 / (1 - args.corrupt.get('uniform', 0.0))
        args.rec_mults = {m: args.rec_mults[m] * corrupt_mult
                          for m in args.modalities}
        return args

    def load_data(self, modalities, args):
        """Leave-one-person-out split, 'shahar' held out
        (weizmann.py:98-114)."""
        print("Loading data...")
        data_dir = os.path.abspath(args.data_dir)
        all_data = weizmann.WeizmannDataset(data_dir, item_as_dict=True)
        train_data = all_data.select([['shahar'], None], invert=True)
        test_data = all_data.select([['shahar'], None])
        print("Done.")
        if len(args.normalize) > 0:
            print("Normalizing ", args.normalize, "...")
            test_data.normalize_(modalities=args.normalize,
                                 ref_data=train_data)
            train_data.normalize_(modalities=args.normalize)
        return train_data, test_data

    def compute_metrics(self, model, infer, prior, recon, targets, mask,
                        lengths, order, args, rec_mults=None):
        """KLD/rec losses, video & mask MSE+SSIM, label accuracy over
        time (weizmann.py:116-166)."""
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

        def img_metrics(rec, tgt):
            tgt_f = np.nan_to_num(tgt)
            per_px = (rec - tgt_f) ** 2 / np.prod(rec.shape[2:])
            mse = per_px.sum(axis=tuple(range(2, per_px.ndim)))
            b_dim = rec.shape[1]
            ssim = np.asarray(eval_ssim(
                rec.reshape((-1,) + rec.shape[2:]),
                tgt_f.reshape((-1,) + tgt_f.shape[2:])))
            return mse, ssim.reshape(t_max, b_dim)

        mse, ssim = img_metrics(recon['video'][0],
                                np.asarray(targets['video']))
        metrics['mse'] = [time_avg(mse)[i] for i in order]
        metrics['ssim'] = [time_avg(ssim)[i] for i in order]
        if 'mask' in recon:
            m_mse, m_ssim = img_metrics(recon['mask'][0],
                                        np.asarray(targets['mask']))
            metrics['m_mse'] = [time_avg(m_mse)[i] for i in order]
            metrics['m_ssim'] = [time_avg(m_ssim)[i] for i in order]

        def time_acc(probs, tgt):
            correct = (probs.argmax(axis=-1)
                       == np.nan_to_num(tgt)[..., 0].astype(int))
            correct = np.where(mask_np[..., 0], correct, 0)
            return correct.sum(axis=0)[:n_real] / lengths_f

        for m in ('action', 'person'):
            if m not in recon or m not in targets:
                metrics[m] = [0] * n_real
                continue
            acc = time_acc(recon[m][0], np.asarray(targets[m]))
            metrics[m] = [acc[i] for i in order]
        return metrics

    def compute_metrics_device(self, model, infer, prior, recon,
                               targets, mask, lengths, rec_mults):
        """Traced per-batch metric kernel (device eval engine): same
        math as ``compute_metrics`` (weizmann.py:116-166) in jnp —
        incl. on-device SSIM (ops/ssim.py is pure jnp)."""
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

        def img_metrics(rec, tgt):
            tgt_f = jnp.nan_to_num(tgt)
            per_px = (rec - tgt_f) ** 2 / np.prod(rec.shape[2:])
            mse = per_px.sum(axis=tuple(range(2, per_px.ndim)))
            ssim = eval_ssim(
                rec.reshape((-1,) + rec.shape[2:]),
                tgt_f.reshape((-1,) + tgt_f.shape[2:]))
            return mse, ssim.reshape(t_max, b_dim)

        mse, ssim = img_metrics(recon['video'][0], targets['video'])
        mets['mse'] = time_avg_dev(mse, mask, lengths)
        mets['ssim'] = time_avg_dev(ssim, mask, lengths)
        if 'mask' in recon:
            m_mse, m_ssim = img_metrics(recon['mask'][0],
                                        targets['mask'])
            mets['m_mse'] = time_avg_dev(m_mse, mask, lengths)
            mets['m_ssim'] = time_avg_dev(m_ssim, mask, lengths)

        for m in ('action', 'person'):
            if m not in recon or m not in targets:
                mets[m] = jnp.zeros((b_dim,))
                continue
            correct = (recon[m][0].argmax(axis=-1)
                       == jnp.nan_to_num(targets[m])[..., 0]
                       .astype(jnp.int32))
            mets[m] = time_avg_dev(correct.astype(jnp.float32),
                                   mask, lengths)
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
              '+/- {:2.3f}'.format(summary['mse'], summary['mse_std'],
                                   summary['ssim'],
                                   summary['ssim_std']))
        print('\tMask\tMSE: {:2.3f} +/- {:2.3f}\tSSIM: {:2.3f} '
              '+/- {:2.3f}'.format(summary['m_mse'],
                                   summary['m_mse_std'],
                                   summary['m_ssim'],
                                   summary['m_ssim_std']))
        print('\t\tAct: {:2.3f} +/- {:2.3f}\tPers: {:2.3f} '
              '+/- {:2.3f}'.format(summary['action'],
                                   summary['action_std'],
                                   summary['person'],
                                   summary['person_std']))
        return summary

    def visualize(self, results, metric, args):
        """Best/worst storyboards: original / observed / reconstructed
        rows with action labels (weizmann.py:192-293), headless."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        reference = results['targets']
        observed = results['inputs']
        predicted = results['recon']
        viz_mod = getattr(args, 'viz_mod', 'video')

        sel_idx = np.concatenate((np.argsort(metric)[-1:][::-1],
                                  np.argsort(metric)[:1]))
        fig, axes = plt.subplots(
            nrows=3 * len(sel_idx), ncols=1,
            figsize=(8, 4 * len(sel_idx) + 0.5),
            subplot_kw={'aspect': 'equal'})

        def stitch(video, times):
            nc = video.shape[1]
            board = [np.hstack([video[t].transpose(1, 2, 0),
                                np.ones((64, 1, nc))]) for t in times]
            return np.squeeze(np.hstack(board))

        def plot_board(axis, board, tick_labels, y_label):
            axis.set_xticks(np.arange(32, 65 * len(tick_labels), 65))
            axis.set_xticklabels(tick_labels)
            axis.set_yticks([])
            if board.ndim == 2:
                axis.imshow(board, cmap='gray')
            else:
                axis.imshow(board)
            axis.set_ylabel(y_label)
            axis.tick_params(length=0)

        for i, idx in enumerate(sel_idx):
            true = reference[viz_mod][idx]
            obsv = observed[viz_mod][idx]
            pred = predicted[viz_mod][idx][:, 0]
            t_act = reference['action'][idx]
            o_act = observed['action'][idx]
            p_act = (predicted['action'][idx][:, 0]
                     if 'action' in predicted else None)

            times = np.linspace(0, len(true) - 1, 8, dtype=int)
            true_board = stitch(true, times)
            obsv_board = stitch(obsv, times)
            pred_board = stitch(np.clip(pred, 0, 1), times)
            obsv_board = np.where(np.isnan(obsv_board), 1.0, obsv_board)

            t_labels = [weizmann.actions[int(t_act[t])] for t in times]
            o_labels = ['' if (o_act[t] != o_act[t]) else
                        weizmann.actions[int(o_act[t])] for t in times]
            if p_act is not None:
                pred_probs = p_act.max(axis=1)
                names = [weizmann.actions[a] for a in
                         p_act.argmax(axis=1)]
                p_labels = ['{} ({:0.1f})'.format(names[t],
                                                  pred_probs[t])
                            for t in times]
            else:
                p_labels = [''] * len(times)

            plot_board(axes[3 * i], true_board, t_labels, "Original")
            plot_board(axes[3 * i + 1], obsv_board, o_labels, "Observed")
            plot_board(axes[3 * i + 2], pred_board, p_labels,
                       "Reconstructed")
            axes[3 * i].set_title('Metric: {:0.3f}'.format(metric[idx]),
                                  fontdict={'fontsize': 10}, loc='right')
        for ax in axes:
            for spine in ax.spines.values():
                spine.set_visible(False)
        plt.tight_layout()
        if getattr(args, 'eval_set', None) is not None:
            plt.savefig(os.path.join(args.save_dir,
                                     args.eval_set + '.pdf'))
        plt.close(fig)

    def save_results(self, results, args):
        """AVI export with optional side-by-side comparison and label
        overlays (weizmann.py:295-391)."""
        import cv2 as cv
        print("Saving results...")
        reference = results['targets']
        observed = results['inputs']
        predicted = results['recon']

        save_args = {'one_file': True,
                     'filename': str(args.eval_set) + '.avi',
                     'labels': True,
                     'comparison': True}
        save_args.update(args.save_args)

        shape = reference['video'][0].shape[2:4]
        if save_args['comparison']:
            shape = (shape[0] * 3, shape[1])
        fps = weizmann.fps

        if save_args['one_file']:
            path = os.path.join(args.save_dir, save_args['filename'])
            vwriter = cv.VideoWriter(path, 0, fps, shape)

        def preprocess(frame):
            return cv.cvtColor(
                (np.clip(np.nan_to_num(frame), 0, 1)
                 * 255).astype('uint8'), cv.COLOR_RGB2BGR)

        def add_label(image, text, pos):
            cv.putText(image, text, pos, cv.FONT_HERSHEY_SIMPLEX,
                       0.4, (255, 255, 255), 1, cv.LINE_AA)

        for i in range(len(reference['video'])):
            r_vid = reference['video'][i].transpose((0, 2, 3, 1))
            o_vid = observed['video'][i].transpose((0, 2, 3, 1))
            p_vid = predicted['video'][i][:, 0].transpose((0, 2, 3, 1))

            if not save_args['one_file']:
                p_id = reference['person'][i][0]
                a_id = reference['action'][i][0]
                path = '{}_{}.avi'.format(
                    weizmann.persons[int(p_id)],
                    weizmann.actions[int(a_id)])
                vwriter = cv.VideoWriter(
                    os.path.join(args.save_dir, path), 0, fps, shape)

            for t in range(len(p_vid)):
                frame = preprocess(p_vid[t])
                if save_args['labels']:
                    if 'action' in predicted:
                        probs = predicted['action'][i][t, 0]
                        add_label(frame,
                                  weizmann.actions[int(np.argmax(probs))],
                                  (2, 10))
                    if 'person' in predicted:
                        probs = predicted['person'][i][t, 0]
                        add_label(frame,
                                  weizmann.persons[int(np.argmax(probs))],
                                  (2, 60))
                if not save_args['comparison']:
                    vwriter.write(frame)
                    continue
                r_frame = preprocess(r_vid[t])
                o_frame = preprocess(o_vid[t])
                if save_args['labels']:
                    r_idx = reference['action'][i][t]
                    o_idx = observed['action'][i][t]
                    add_label(r_frame, weizmann.actions[int(r_idx)],
                              (2, 10))
                    if o_idx == o_idx:
                        add_label(o_frame, weizmann.actions[int(o_idx)],
                                  (2, 10))
                    r_idx = reference['person'][i][t]
                    o_idx = observed['person'][i][t]
                    add_label(r_frame, weizmann.persons[int(r_idx)],
                              (2, 60))
                    if o_idx == o_idx:
                        add_label(o_frame, weizmann.persons[int(o_idx)],
                                  (2, 60))
                vwriter.write(np.hstack([r_frame, o_frame, frame]))
            if not save_args['one_file']:
                vwriter.release()
        if save_args['one_file']:
            vwriter.release()


def main(argv=None):
    """Console entry point (pyproject: mdmm-weizmann)."""
    args = WeizmannTrainer.parser.parse_args(argv)
    WeizmannTrainer(args).run(args)


if __name__ == "__main__":
    main()
