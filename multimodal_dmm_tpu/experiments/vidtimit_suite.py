"""Train and compare methods on a suite of inference tasks (VidTIMIT).

BEYOND-PARITY: the reference ships no vidTIMIT experiment script (only
the /root/reference/vidTIMIT.py app), so this suite extends the
spirals/weizmann suite pattern to the audio-visual pair: method × seed
grid on video+audio, task battery = temporal inference on video SSIM
(recon/half/fwd/bwd, the weizmann_suite task fracs) plus the two
cross-modal directions — a2v (video from audio only, SSIM) and v2a
(audio from video only, audio MSE).
"""

import argparse
import copy
import os

import pandas as pd
import yaml

from ..apps.vidtimit import VidTIMITTrainer
from . import tune
from .analysis import ExperimentAnalysis

parser = argparse.ArgumentParser(
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument('--analyze', action='store_true', default=False)
parser.add_argument('--n_repeats', type=int, default=1, metavar='N')
parser.add_argument('--trial_cpus', type=int, default=1, metavar='N')
parser.add_argument('--trial_gpus', type=int, default=0, metavar='N')
parser.add_argument('--max_cpus', type=int, default=None, metavar='N')
parser.add_argument('--max_gpus', type=int, default=None, metavar='N')
parser.add_argument('--local_dir', type=str, default="./")
parser.add_argument('--exp_name', type=str, default="vidtimit_suite")
parser.add_argument('--config', type=yaml.safe_load, default={})
parser.add_argument('--no_isolate', action='store_true', default=False,
                    help='run trials in-process instead of one fresh '
                         'subprocess per trial')
parser.add_argument('--resume', action='store_true', default=False,
                    help='skip trials already completed in exp_name '
                         '(continue an interrupted sweep)')

TASKS = ['recon', 'half', 'fwd', 'bwd', 'a2v', 'v2a']

TASK_ARGS = {
    'recon': {'drop_frac': 0.0, 'start_frac': 0.0, 'stop_frac': 1.0},
    'half': {'drop_frac': 0.5, 'start_frac': 0.0, 'stop_frac': 1.0},
    'fwd': {'drop_frac': 0.0, 'start_frac': 0.0, 'stop_frac': 0.75},
    'bwd': {'drop_frac': 0.0, 'start_frac': 0.25, 'stop_frac': 1.0},
    'a2v': {'drop_frac': 0.0, 'start_frac': 0.0, 'stop_frac': 1.0,
            'drop_mods': ['video']},
    'v2a': {'drop_frac': 0.0, 'start_frac': 0.0, 'stop_frac': 1.0,
            'drop_mods': ['audio']},
}

TASK_METRIC_NAMES = {
    'recon': 'ssim', 'half': 'ssim', 'fwd': 'ssim', 'bwd': 'ssim',
    'a2v': 'ssim', 'v2a': 'a_mse',
}


def run(args):
    data_dir = os.path.abspath(VidTIMITTrainer.defaults['data_dir'])
    config = {
        "data_dir": data_dir,
        "epochs": 500,
        "kld_anneal": 250,
        "save_freq": 50,
        "lr": 5e-4,
        "seed": tune.grid_search(list(range(args.n_repeats))),
        "method": tune.grid_search(['bfvi', 'b-mask', 'f-mask',
                                    'b-skip', 'f-skip']),
    }
    config.update(args.config)
    tune.register_trainable(
        "vidtimit_tune", lambda c, r: VidTIMITTrainer.tune(c, r))
    ckpts = tune.run("vidtimit_tune", name=args.exp_name, config=config,
                     local_dir=args.local_dir,
                     resources_per_trial={"cpu": args.trial_cpus,
                                          "gpu": args.trial_gpus},
                     resume=args.resume,
                     isolate=None if args.no_isolate else
                     "multimodal_dmm_tpu.apps.vidtimit:VidTIMITTrainer")
    tune.exit_on_errors(ckpts, args.exp_name)


def analyze(args):
    exp_dir = os.path.join(args.local_dir, args.exp_name)
    ea = ExperimentAnalysis(exp_dir)
    df = ea.dataframe().sort_values(['trial_id'])

    metrics = ['mean_loss', 'ssim']
    run_results = {m: [] for m in metrics}
    run_results['method'] = []
    task_results = {task: [] for task in TASKS}
    task_results_std = {task: [] for task in TASKS}
    task_results['method'] = []
    task_results_std['method'] = []
    per_seed_rows = []

    for i, trial in df.iterrows():
        print('===')
        print("Trial:", trial['experiment_tag'])
        print('===')
        try:
            trial_df = ea.trial_dataframe(trial['trial_id'])
        except (ValueError, pd.errors.EmptyDataError):
            print("No progress data to read for trial, skipping...")
            continue
        method = trial['method']
        best_idx = trial_df.mean_loss.idxmin()
        trial_results = {m: trial_df[m].iloc[best_idx] for m in metrics}
        run_results['method'].append(method)
        for m in metrics:
            run_results[m].append(trial_results[m])

        trial_config = ea._checkpoints[i]['config']
        trial_dir = os.path.join(exp_dir,
                                 os.path.basename(trial['logdir']))
        _, _, task_metrics, task_std = evaluate(trial_config, trial_dir)
        task_results['method'].append(method)
        task_results_std['method'].append(method)
        for task in TASKS:
            task_results[task].append(task_metrics[task])
            task_results_std[task].append(task_std[task])
        per_seed_rows.append(dict(method=method,
                                  seed=trial_config.get('seed'),
                                  **task_metrics))

    run_results = pd.DataFrame(run_results).groupby('method').mean()
    print(run_results)
    task_results = pd.DataFrame(task_results).groupby('method').mean()
    print(task_results)
    task_results_std = pd.DataFrame(task_results_std).\
        groupby('method').mean()
    print(task_results_std)
    run_results.to_csv(os.path.join(exp_dir, 'run_results.csv'))
    task_results.to_csv(os.path.join(exp_dir, 'task_results.csv'))
    task_results_std.to_csv(
        os.path.join(exp_dir, 'task_results_std.csv'))
    pd.DataFrame(per_seed_rows).to_csv(
        os.path.join(exp_dir, 'task_results_runs.csv'), index=False)


def evaluate(trial_config, trial_dir):
    base_args = VidTIMITTrainer.parser.parse_args([])
    vars(base_args).update(trial_config)
    base_args.load = os.path.join(trial_dir, base_args.save_dir,
                                  'best.pth')
    base_args.save_args = {'skip': True}
    base_args.eval_sets = ['test']
    task_train_metrics, task_train_std = {}, {}
    task_test_metrics, task_test_std = {}, {}
    # One trainer serves every task (see weizmann_suite.evaluate: the
    # device eval engine keeps the eval sets HBM-resident and takes the
    # deletion fracs as traced scalars).
    trainer = None
    for task in TASKS:
        print("==Inference Task: '{}'==".format(task))
        args = copy.deepcopy(base_args)
        vars(args).update(TASK_ARGS[task])
        args.save_dir = os.path.join(trial_dir, task + '_save')
        if trainer is None:
            trainer = VidTIMITTrainer(args)
        else:
            args = trainer.pre_build_args(args)
            args = trainer.post_build_args(args)
        train_metrics, test_metrics = trainer.run_eval(args)
        metric_name = TASK_METRIC_NAMES[task]
        task_train_metrics[task] = (float('nan') if train_metrics is
                                    None else
                                    train_metrics[metric_name])
        task_test_metrics[task] = test_metrics[metric_name]
        task_train_std[task] = (float('nan') if train_metrics is
                                None else
                                train_metrics[metric_name + '_std'])
        task_test_std[task] = test_metrics[metric_name + '_std']
    return (task_train_metrics, task_train_std,
            task_test_metrics, task_test_std)


if __name__ == "__main__":
    args = parser.parse_args()
    if not args.analyze:
        run(args)
    analyze(args)
