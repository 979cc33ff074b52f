"""Spirals application: trainer subclass, metrics, visualization.

Mirrors /root/reference/spirals.py (SpiralsTrainer): dataset defaults,
z=5/h=20 MDMM wiring, auto reconstruction-loss multipliers, per-sequence
time-averaged MSE metrics, and best/worst-4 spiral plots with 95%
confidence ellipses.
"""

import copy
import os

import numpy as np

from ..data.spirals import SpiralsDataset
from ..ops import losses
from ..training import trainer


class SpiralsTrainer(trainer.Trainer):
    """Class for training on noisy 2D spirals."""

    # deepcopy: argparse copy.copy shares _defaults/actions, so one
    # app's set_defaults would contaminate the others' parsers
    # when several apps are imported in-process (suites, tests).
    parser = copy.deepcopy(trainer.Trainer.parser)
    parser.add_argument('--train_subdir', type=str, default='train',
                        metavar='DIR', help='training data subdirectory')
    parser.add_argument('--test_subdir', type=str, default='test',
                        metavar='DIR', help='testing data subdirectory')

    defaults = {
        'modalities': ['spiral-x', 'spiral-y'],
        'batch_size': 100, 'split': 1, 'bylen': False,
        'epochs': 500, 'lr': 1e-4,
        'kld_anneal': 100, 'burst_frac': 0.1,
        'drop_frac': 0.5, 'start_frac': 0.25, 'stop_frac': 0.75,
        'eval_metric': 'mse', 'viz_metric': 'mse',
        'eval_freq': 10, 'save_freq': 10,
        'data_dir': './data/spirals',
        'save_dir': './spirals_save',
    }
    parser.set_defaults(**defaults)

    def build_model(self, constructor, args):
        """z=5, h=20 model over 1-D x/y modalities (spirals.py:44-51)."""
        dims = {'spiral-x': 1, 'spiral-y': 1}
        model = constructor(args.modalities,
                            dims=[dims[m] for m in args.modalities],
                            z_dim=5, h_dim=20, **args.model_args)
        return model

    def pre_build_args(self, args):
        """Method-specific tweaks (spirals.py:53-62)."""
        args = super().pre_build_args(args)
        if args.method in ('b-skip', 'f-skip', 'b-mask', 'f-mask'):
            args.model_args['feat_to_z'] = False
            args.train_args['uni_loss'] = False
        return args

    def post_build_args(self, args):
        """Auto rec_mults: (1/dim)/n_mods · 1/(1−corrupt) (spirals.py:64-73)."""
        if args.rec_mults == 'auto':
            dims = self.model.dims
            corrupt_mult = 1 / (1 - args.corrupt.get('uniform', 0.0))
            args.rec_mults = {
                m: ((1.0 / self.model._dim_of(m)) / len(args.modalities)
                    * corrupt_mult) for m in args.modalities}
        return args

    def load_data(self, modalities, args):
        print("Loading data...")
        data_dir = os.path.abspath(args.data_dir)
        train_data = SpiralsDataset(modalities, data_dir,
                                    args.train_subdir, truncate=True,
                                    item_as_dict=True)
        test_data = SpiralsDataset(modalities, data_dir,
                                   args.test_subdir, truncate=True,
                                   item_as_dict=True)
        print("Done.")
        if len(args.normalize) > 0:
            print("Normalizing ", args.normalize, "...")
            test_data.normalize_(modalities=args.normalize,
                                 ref_data=train_data)
            train_data.normalize_(modalities=args.normalize)
        return train_data, test_data

    def compute_metrics(self, model, infer, prior, recon, targets, mask,
                        lengths, order, args, rec_mults=None):
        """KLD/rec losses + per-sequence time-averaged 2D MSE
        (spirals.py:93-111)."""
        metrics = {}
        lengths_f = np.asarray(lengths, np.float32)
        mask_np = np.asarray(mask).astype(bool)
        metrics['kld_loss'] = float(losses.kld_gauss(
            infer[0], infer[1], prior[0], prior[1], mask_np))
        dev_targets = {m: targets[m] for m in recon}
        metrics['rec_loss'] = float(model.rec_loss(
            dev_targets, recon, mask_np, args.rec_mults))
        mse = sum((recon[m][0] - np.nan_to_num(targets[m]))**2
                  * ~np.isnan(targets[m]) for m in recon)
        mse = mse.sum(axis=tuple(range(2, mse.ndim)))
        mse = np.where(mask_np[..., 0], mse, 0.0)
        n_real = len(lengths)
        mse = mse.sum(axis=0)[:n_real] / lengths_f
        metrics['mse'] = [mse[i] for i in order]
        return metrics

    def compute_metrics_device(self, model, infer, prior, recon,
                               targets, mask, lengths, rec_mults):
        """Traced per-batch metric kernel (device eval engine).

        Same math as ``compute_metrics`` (spirals.py:93-111) but fully
        jnp: returns summed scalars + a (B,) per-sequence MSE array.
        """
        import jax.numpy as jnp
        from ..training.eval_engine import time_avg_dev
        m_b = mask.astype(bool)
        mets = {
            'kld_loss': losses.kld_gauss(infer[0], infer[1], prior[0],
                                         prior[1], m_b),
            'rec_loss': model.rec_loss(
                {m: targets[m] for m in recon}, recon, m_b, rec_mults),
        }
        mse = 0.0
        for m in recon:
            d = ((recon[m][0] - jnp.nan_to_num(targets[m])) ** 2
                 * ~jnp.isnan(targets[m]))
            mse = mse + d.sum(axis=tuple(range(2, d.ndim)))
        mets['mse'] = time_avg_dev(mse, mask, lengths)
        return mets

    def summarize_metrics(self, metrics, n_timesteps):
        """Mean±std over sequences / per-timestep averages
        (spirals.py:113-128)."""
        summary = {}
        for key, val in metrics.items():
            if isinstance(val, list):
                summary[key] = np.mean(val)
                summary[key + '_std'] = np.std(val)
            else:
                summary[key] = val / n_timesteps
        print(('Evaluation\tKLD: {:7.1f}\tRecon: {:7.1f}\t' +
               'MSE: {:6.3f} +-{:2.3f}').format(
                   summary['kld_loss'], summary['rec_loss'],
                   summary['mse'], summary['mse_std']))
        return summary

    def visualize(self, results, metric, args):
        """Best-4 / worst-4 spiral fits with 95% confidence ellipses
        (spirals.py:130-177), rendered headless to PDF."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from matplotlib.collections import EllipseCollection

        reference = results['targets']
        observed = results['inputs']
        predicted = results['recon']

        sel_idx = np.concatenate((np.argsort(metric)[:4],
                                  np.argsort(metric)[-4:][::-1]))
        fig, axes = plt.subplots(4, 2, figsize=(4, 8),
                                 subplot_kw={'aspect': 'equal'})
        for i, idx in enumerate(sel_idx):
            axis = axes[(i % 4), (i // 4)]
            true = reference['metadata'][idx][:, 0:2]
            data = (reference['spiral-x'][idx], reference['spiral-y'][idx])
            obsv = (observed['spiral-x'][idx], observed['spiral-y'][idx])
            pred = (predicted['spiral-x'][idx][:, 0],
                    predicted['spiral-y'][idx][:, 0])
            rng_ = (predicted['spiral-x'][idx][:, 1],
                    predicted['spiral-y'][idx][:, 1])
            ec = EllipseCollection(
                1.96 * rng_[0], 1.96 * rng_[1], (0,), units='x',
                facecolors=('c',), alpha=0.25,
                offsets=np.column_stack(pred),
                transOffset=axis.transData)
            axis.add_collection(ec)
            axis.plot(true[:, 0], true[:, 1], 'b-', linewidth=1.5)
            if (np.isnan(obsv[0]) != np.isnan(obsv[1])).any():
                axis.plot(obsv[0], data[1], '<', markersize=2,
                          color='#fe46a5')
                axis.plot(data[0], obsv[1], 'v', markersize=2,
                          color='#fec615')
            axis.plot(obsv[0], obsv[1], 'bo', markersize=3)
            axis.plot(pred[0], pred[1], '-', linewidth=1.5,
                      color='#04d8b2')
            axis.set_xlim(-4, 4)
            axis.set_ylim(-4, 4)
            axis.set_title("Metric = {:0.3f}".format(metric[idx]))
            axis.set_xlabel("Spiral {:03d}".format(idx))
        plt.tight_layout()
        if getattr(args, 'eval_set', None) is not None:
            fig_path = os.path.join(args.save_dir,
                                    args.eval_set + '.pdf')
            plt.savefig(fig_path)
        plt.close(fig)

    def save_results(self, results, args):
        pass


def main(argv=None):
    """Console entry point (pyproject: mdmm-spirals)."""
    args = SpiralsTrainer.parser.parse_args(argv)
    SpiralsTrainer(args).run(args)


if __name__ == "__main__":
    main()
