"""Abstract Trainer: config surface, jitted train loop, eval-task engine,
checkpointing, and the run/run_train/run_eval/run_find drivers.

JAX re-design of /root/reference/trainer.py. The public flag surface (flag
names, YAML-dict flags, --method remap, defaults) is preserved — it is the
framework's de-facto API (SURVEY §5.6). Differences by design:

- the whole training step (burst-deleted inputs → multi-forward BFVI
  objective → grads → Adam-with-L2 update) is ONE jitted function; the
  KLD annealing multiplier is a traced scalar so no recompile per batch;
- randomness is explicit: `--seed` seeds numpy (data corruption order,
  like the reference) and a root `jax.random` key (model sampling);
- checkpoints are pytree pickles that also carry optimizer state;
- `--device` selects the JAX platform; the default is the TPU backend.
"""

import argparse
import copy
import os

import numpy as np
import yaml

import jax
import jax.numpy as jnp
import optax

from .. import models
from ..data import multiseq as mseq
from ..ops.schedules import anneal
from .checkpoint import save_checkpoint, load_checkpoint
from .loader import BatchLoader


def _build_parser():
    """Flag surface mirroring /root/reference/trainer.py:28-153."""
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--modalities', type=str, nargs='+', default=[],
                        metavar='M', help='data modalities')
    parser.add_argument('--model', type=str, default='dmm', metavar='S',
                        help='name of model to train')
    parser.add_argument('--method', type=str, default=None, metavar='S',
                        help='inference method: bfvi, b/f-mask, or b/f-skip')
    parser.add_argument('--model_args', type=yaml.safe_load, default={},
                        metavar='DICT',
                        help='additional model arguments as yaml dict')
    parser.add_argument('--train_args', type=yaml.safe_load, default={},
                        metavar='DICT',
                        help='additional train arguments as yaml dict')
    parser.add_argument('--eval_args', type=yaml.safe_load, default={},
                        metavar='DICT',
                        help='additional eval. arguments as yaml dict')
    parser.add_argument('--save_args', type=yaml.safe_load, default={},
                        metavar='DICT',
                        help='results saving arguments as yaml dict')
    parser.add_argument('--batch_size', type=int, default=100, metavar='N')
    parser.add_argument('--batch_sz_eval', type=int, default=None,
                        metavar='N')
    parser.add_argument('--len_bucket', type=int, default=0, metavar='N',
                        help='pad eval batches to multiples of N '
                             'timesteps so ragged lengths reuse a small '
                             'set of compiled shapes (0 = exact pad)')
    parser.add_argument('--split', type=int, default=1, metavar='N',
                        help='split each training sequence into N chunks')
    parser.add_argument('--bylen', action='store_true', default=False,
                        help='whether to split by length')
    parser.add_argument('--epochs', type=int, default=100, metavar='N')
    parser.add_argument('--lr', type=float, default=1e-4, metavar='LR')
    parser.add_argument('--w_decay', type=float, default=1e-4, metavar='F')
    parser.add_argument('--clip_grad', type=float, default=None,
                        metavar='F')
    parser.add_argument('--seed', type=int, default=1, metavar='N')
    parser.add_argument('--kld_mult', type=float, default=1.0, metavar='F')
    parser.add_argument('--rec_mults', type=yaml.safe_load, default='auto',
                        metavar='DICT')
    parser.add_argument('--kld_anneal', type=int, default=100, metavar='N')
    parser.add_argument('--data_workers', type=int, default=1, metavar='N',
                        help='(accepted for parity; loader is in-process)')
    parser.add_argument('--pin_memory', type=bool, default=True,
                        metavar='B',
                        help='(accepted for parity; XLA manages transfers)')
    parser.add_argument('--no_skip_nonfinite', action='store_true',
                        default=False,
                        help='apply optimizer updates even when grads '
                             'are non-finite (reference behavior: the '
                             'run diverges permanently)')
    parser.add_argument('--host_loader', action='store_true',
                        default=False,
                        help='use the host-side numpy batch loader for '
                             'training instead of the HBM-resident '
                             'device pipeline')
    parser.add_argument('--edge_layout', action='store_true',
                        default=False,
                        help='store device-loader training batches in '
                             'the reference edge layout (channel-first) '
                             'instead of the codec-native layout the '
                             'fused step consumes transpose-free')
    parser.add_argument('--normalize', type=str, default=[], nargs='+',
                        metavar='M')
    parser.add_argument('--corrupt', type=yaml.safe_load, default={},
                        metavar='DICT')
    parser.add_argument('--burst_frac', type=float, default=0.1,
                        metavar='F')
    parser.add_argument('--drop_frac', type=float, default=0.5,
                        metavar='F')
    parser.add_argument('--start_frac', type=float, default=0.25,
                        metavar='F')
    parser.add_argument('--stop_frac', type=float, default=0.75,
                        metavar='F')
    parser.add_argument('--drop_mods', type=str, default=[], nargs='+',
                        metavar='M')
    parser.add_argument('--keep_mods', type=str, default=[], nargs='+',
                        metavar='M')
    parser.add_argument('--eval_mods', type=str, default='all', nargs='+',
                        metavar='M')
    parser.add_argument('--eval_metric', type=str, default='mse',
                        metavar='S')
    parser.add_argument('--viz_metric', type=str, default='mse',
                        metavar='S')
    parser.add_argument('--eval_freq', type=int, default=10, metavar='N')
    parser.add_argument('--save_freq', type=int, default=10, metavar='N')
    parser.add_argument('--load', type=str, default=None, metavar='PATH')
    parser.add_argument('--resume_trial', action='store_true',
                        default=False,
                        help='continue an interrupted training run from '
                             'the latest epoch_N.pth in save_dir '
                             '(params, optimizer state, best loss, and '
                             'the sampling RNG stream are all restored, '
                             'so the resumed run reproduces the '
                             'uninterrupted one bit-for-bit); no-op '
                             'when no epoch checkpoint exists. Also '
                             'enabled by MDMM_RESUME_TRIAL=1 (used by '
                             'the experiment runner for partial trials)')
    parser.add_argument('--data_dir', type=str, metavar='DIR')
    parser.add_argument('--save_dir', type=str, metavar='DIR')
    parser.add_argument('--visualize', action='store_true', default=False)
    parser.add_argument('--gradients', action='store_true', default=False,
                        help='plot per-layer gradient flow each batch')
    parser.add_argument('--profile_dir', type=str, default=None,
                        metavar='DIR',
                        help='capture a jax.profiler trace to this dir '
                             'and print per-step timing summaries')
    parser.add_argument('--device', type=str, default='tpu',
                        help='jax platform to use (tpu/cpu)')
    parser.add_argument('--mesh', type=str, default='0', metavar='SPEC',
                        help='device mesh: N = data-parallel over N '
                             'devices (0/1 = single device; batch axis '
                             'sharded over ICI, params/opt replicated, '
                             'gradient all-reduce inserted by GSPMD); '
                             'NxM = 2-D data x model mesh — batch over '
                             'the N-way data axis, the fused '
                             'objective\'s stacked variant/particle '
                             'rows over the M-way model axis '
                             '(MultiDMM only)')
    parser.add_argument('--anomaly_check', action='store_true',
                        default=False,
                        help='enable jax_debug_nans NaN checking')
    parser.add_argument('--evaluate', '--test', action='store_true',
                        default=False)
    parser.add_argument('--eval_sets', type=str, nargs='+', metavar='S',
                        default=['train', 'test'])
    parser.add_argument('--find_best', action='store_true', default=False)
    parser.add_argument('--rng_impl', type=str, default='threefry2x32',
                        choices=['threefry2x32', 'rbg', 'unsafe_rbg'],
                        help='jax PRNG implementation for model sampling '
                             '(rbg uses the TPU hardware RNG path: much '
                             'cheaper per-step bit generation, different '
                             'but equally valid draws; seeds reproduce '
                             'only within one impl)')
    parser.add_argument('--init_seed', type=int, default=None,
                        metavar='S',
                        help='override the parameter-init stream only '
                             '(--seed keeps driving data shuffle, '
                             'corruption, and model sampling); with '
                             '--init_seed S the init params equal a '
                             '--seed S run\'s exactly')
    parser.add_argument('--matmul_precision', type=str, default='default',
                        choices=['default', 'bfloat16', 'bfloat16_3x',
                                 'float32', 'highest'],
                        help='jax default matmul precision. On TPU the '
                             'backend DEFAULT rounds even f32 matmul '
                             'inputs through bfloat16 passes on the MXU; '
                             'float32/highest force full-precision '
                             '(multi-pass) contractions — the knob that '
                             'makes TPU training numerics match CPU/torch '
                             '(see RESULTS §20 DKS basin statistics)')
    return parser


class Trainer:
    """Abstract base class for training on multimodal sequential data."""

    parser = _build_parser()

    def __init__(self, args):
        # argparse hands out the SAME default object on every
        # parse_args call, so container-valued flags (the yaml dicts /
        # nargs lists) are shared across Namespaces from one parser.
        # Own them before any hook mutates them: the --method remap's
        # in-place eval_args update was observed leaking
        # flt_particles=200 into a later in-process parse, silently
        # turning a MAP eval into a 200-particle sampled one.
        import copy as _copy
        for _k, _v in list(vars(args).items()):
            if isinstance(_v, (dict, list)):
                setattr(args, _k, _copy.deepcopy(_v))

        # Platform selection must precede ANY jax device use (PRNGKey,
        # device_put): the preloaded TPU backend pins the process once
        # initialized (see tests/conftest.py).
        if str(args.device).startswith("cpu"):
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass

        # Persistent XLA compilation cache: amortizes the remote-compile
        # cost across processes and experiment trials. TPU-only: XLA:CPU
        # AOT cache keys do NOT include the host's CPU features, so a
        # cache written on one machine loads on another with a
        # feature-mismatch warning and slightly different numerics
        # (observed: device-vs-host eval exactness drifting to ~6e-4
        # when a stale cache was hit) — and CPU compiles are cheap
        # anyway.
        if not str(args.device).startswith("cpu"):
            try:
                jax.config.update(
                    "jax_compilation_cache_dir",
                    os.path.expanduser("~/.cache/multimodal_dmm_tpu_xla"))
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 2.0)
            except Exception:
                pass

        # Seeding (trainer.py:156-159): numpy drives data corruption,
        # a jax key drives model sampling.
        np.random.seed(args.seed)
        if getattr(args, 'rng_impl', 'threefry2x32') != 'threefry2x32':
            # Must precede PRNGKey creation: the impl is baked into the
            # key. rbg replaces threefry's ~20 u32 ops/word software
            # stream with the hardware RNG — the particle-noise streams
            # are a measurable slice of the train step.
            jax.config.update("jax_default_prng_impl", args.rng_impl)
        self.rng = jax.random.PRNGKey(args.seed)

        if args.anomaly_check:
            jax.config.update("jax_debug_nans", True)

        if getattr(args, 'matmul_precision', 'default') != 'default':
            # TPU's DEFAULT precision bf16-rounds f32 matmul inputs on
            # the MXU; 'float32'/'highest' restore CPU/torch-equivalent
            # contractions (multi-pass, ~same cost at suite-scale
            # shapes). This is the only numeric delta between our CPU
            # and TPU training runs (RNG is backend-identical).
            jax.config.update("jax_default_matmul_precision",
                              args.matmul_precision)

        args = self.pre_build_args(args)

        if not os.path.exists(args.save_dir):
            os.makedirs(args.save_dir)

        # Checkpoint auto-load (trainer.py:176-188).
        checkpoint = None
        if args.load is not None:
            checkpoint = load_checkpoint(args.load)
        elif args.evaluate:
            checkpoint = load_checkpoint(
                os.path.join(args.save_dir, "best.pth"))
        if checkpoint is not None:
            args.modalities = checkpoint["modalities"]

        self.train_data, self.test_data = self.load_data(
            args.modalities, args)

        # Model construction via registry (trainer.py:192-205).
        constructor = models.get_model(args.model)
        print('Constructing model...')
        self.model = self.build_model(constructor, args)
        self.rng, k_init = jax.random.split(self.rng)
        if getattr(args, 'init_seed', None) is not None:
            # Decouple the parameter-init stream from --seed (which
            # keeps driving data shuffle/corruption and model
            # sampling): lets basin-membership experiments attribute
            # the outcome to init vs the other seed-derived streams
            # (RESULTS §20).
            k_init = jax.random.split(
                jax.random.PRNGKey(args.init_seed))[1]
        self.params, self.state = self.model.init(k_init)
        n_params = sum(int(np.prod(np.shape(p))) for p in
                       jax.tree_util.tree_leaves(self.params))
        print('Number of parameters:', n_params)

        if checkpoint is not None:
            self.params = jax.tree_util.tree_map(
                jnp.asarray, checkpoint["params"])
            if "state" in checkpoint:
                self.state = jax.tree_util.tree_map(
                    jnp.asarray, checkpoint["state"])

        # Adam with torch-style additive L2 weight decay
        # (trainer.py:212-213: optim.Adam(..., weight_decay)).
        tx = []
        if args.clip_grad is not None and args.clip_grad > 0:
            tx.append(optax.clip_by_global_norm(args.clip_grad))
        if args.w_decay:
            tx.append(optax.add_decayed_weights(args.w_decay))
        tx.append(optax.adam(args.lr))
        self.optimizer = optax.chain(*tx)
        if not getattr(args, 'no_skip_nonfinite', False):
            # The model family occasionally produces non-finite grads on
            # pathological batches (long unobserved stretches × sharp
            # encoders); the reference diverges permanently and relies
            # on trial termination (trainer.py:536). Skipping the bad
            # update keeps training alive — finite-grad behavior is
            # bit-identical to the raw chain.
            self.optimizer = optax.apply_if_finite(
                self.optimizer, max_consecutive_errors=10 ** 6)
        self.opt_state = self.optimizer.init(self.params)
        if checkpoint is not None and "opt_state" in checkpoint:
            try:
                self.opt_state = jax.tree_util.tree_map(
                    jnp.asarray, checkpoint["opt_state"])
            except Exception:
                pass

        args = self.post_build_args(args)

        # Device mesh (SURVEY §5.8: pjit-DP over ICI is the TPU-native
        # scale-out; the reference is single-device). '--mesh N' is
        # 1-D data parallelism; '--mesh NxM' adds a model axis that
        # shards the fused objective's stacked variant/particle rows
        # (parallel.mesh.make_mesh_2d — the z-scan is sequential in T,
        # but V and B are embarrassingly parallel).
        self.mesh = None
        self._mesh_n_data = 1
        mesh_spec = str(getattr(args, 'mesh', 0) or 0).lower()
        n_data, n_model = ((int(v) for v in mesh_spec.split('x'))
                           if 'x' in mesh_spec else (int(mesh_spec), 1))
        if n_data * n_model > 1:
            from ..parallel import make_mesh, make_mesh_2d, replicated
            avail = len(jax.devices())
            if avail < n_data * n_model:
                raise ValueError(
                    f"--mesh {mesh_spec} needs {n_data * n_model} "
                    f"devices but only {avail} are visible")
            if args.batch_size % n_data:
                raise ValueError(
                    f"--batch_size {args.batch_size} must be divisible "
                    f"by the data axis of --mesh {mesh_spec}")
            if n_model > 1:
                if not hasattr(self.model, 'set_variant_mesh'):
                    raise ValueError(
                        f"--mesh {mesh_spec}: model "
                        f"{type(self.model).__name__} has no stacked-"
                        f"variant axis to shard; use --mesh N")
                self.mesh = make_mesh_2d(n_data, n_model)
                self.model.set_variant_mesh(self.mesh)
            else:
                self.mesh = make_mesh(n_data)
            self._mesh_n_data = n_data
            rep = replicated(self.mesh)
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
            print('Mesh: {} devices ({} data x {} model)'.format(
                n_data * n_model, n_data, n_model))

        self._train_step = None
        self._train_step_key = None
        self._fwd_cache = {}
        self._task_eval_cache = {}
        self._eval_dev_cache = {}  # key -> (dataset ref, DeviceEvalData)

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------

    def _make_train_step(self, rec_mults, train_args, with_grads=False):
        model, optimizer = self.model, self.optimizer
        train_args = dict(train_args)

        def train_step(params, state, opt_state, inputs, targets, mask,
                       kld_mult, n_data, rng):
            def loss_fn(p):
                loss, new_state = model.step(
                    p, state, inputs, mask, kld_mult, rec_mults, rng,
                    targets=targets, train=True, **train_args)
                return loss / n_data, (loss, new_state)

            grads, (loss, new_state) = jax.grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if with_grads:
                return new_params, new_state, new_opt, loss, grads
            return new_params, new_state, new_opt, loss

        donate = () if with_grads else (0, 2)
        if self.mesh is not None:
            from ..parallel import replicated
            rep = replicated(self.mesh)
            outs = (rep, rep, rep, rep) + ((rep,) if with_grads else ())
            return jax.jit(train_step, out_shardings=outs,
                           donate_argnums=donate)
        return jax.jit(train_step, donate_argnums=donate)

    @staticmethod
    def _canon_key(obj):
        """Order-insensitive hashable form of nested dict/list config
        values, so e.g. two --train_args dicts with different insertion
        orders hit the same jitted step instead of a minutes-long
        recompile on a remote-compile backend."""
        if isinstance(obj, dict):
            return tuple(sorted(
                (k, Trainer._canon_key(v)) for k, v in obj.items()))
        if isinstance(obj, (list, tuple)):
            return tuple(Trainer._canon_key(v) for v in obj)
        return obj

    def _get_train_step(self, args):
        key = (self._canon_key(args.rec_mults),
               self._canon_key(args.train_args),
               bool(args.gradients))
        if self._train_step is None or self._train_step_key != key:
            self._train_step = self._make_train_step(
                dict(args.rec_mults), dict(args.train_args),
                with_grads=args.gradients)
            self._train_step_key = key
        return self._train_step

    def _get_fwd(self, **fwd_kwargs):
        """Cache jitted MAP/sampled forwards per static-kwarg set."""
        key = tuple(sorted(fwd_kwargs.items()))
        if key not in self._fwd_cache:
            model = self.model

            def fwd(params, state, inputs, rng):
                return model.forward(params, state, inputs, rng=rng,
                                     **fwd_kwargs)
            self._fwd_cache[key] = jax.jit(fwd)
        return self._fwd_cache[key]

    # ------------------------------------------------------------------
    # train / evaluate (trainer.py:218-323)
    # ------------------------------------------------------------------

    def _shard(self, x):
        """Place one (T, B, ...) array on the mesh (batch axis sharded
        when divisible, else replicated); identity when no mesh."""
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel import batch_sharding, replicated
        if np.shape(x)[1] % self._mesh_n_data == 0:
            sh = batch_sharding(self.mesh, np.ndim(x), 1)
        else:
            sh = replicated(self.mesh)
        return jax.device_put(jnp.asarray(x), sh)

    def _to_device(self, batch):
        return {m: self._shard(batch[m]) for m in batch
                if m in self.model.modalities}

    def train(self, loader, epoch, args):
        """One epoch of batched gradient descent (trainer.py:218-262)."""
        from .diagnostics import StepTimer, plot_grad_flow

        loss_sum, data_num = 0.0, 0
        kld_mult = 0.0
        step_fn = self._get_train_step(args)
        n_batches = len(loader)
        timer = StepTimer()
        # One-step-delayed loss readback: the device loss of batch i is
        # converted to a Python float only after batch i+1 has been
        # dispatched, so host-side batch prep (burst deletion, padding,
        # H2D transfer) overlaps the device step — JAX dispatch is
        # asynchronous, the conversion is the only sync point.
        pending = None  # (b_num, device_loss, n_steps)

        def drain(p):
            nonlocal loss_sum, data_num
            b_prev, loss_dev, n_prev = p
            loss_sum += float(loss_dev)
            data_num += n_prev
            print('Batch: {:5d}\tLoss: {:10.1f}'.format(
                b_prev, loss_sum / data_num))

        from .device_loader import DeviceTrainData
        if isinstance(loader, DeviceTrainData):
            # HBM-resident pipeline: gather + burst deletion on device.
            if self.mesh is None:
                batches = ((i, t, m, le) for i, t, m, le in
                           loader.epoch(args.seed * 100003 + epoch))
            else:
                # Reshard the gathered batch over the mesh's data axis.
                batches = (({k: self._shard(v) for k, v in i.items()},
                            {k: self._shard(v) for k, v in t.items()},
                            self._shard(m), le)
                           for i, t, m, le in
                           loader.epoch(args.seed * 100003 + epoch))
        else:
            def _host_batches():
                for targets, mask, lengths, _, _ in loader:
                    # Burst deletion augmentation (trainer.py:234-235).
                    inputs = mseq.burst_delete(targets, args.burst_frac,
                                               lengths)
                    yield (self._to_device(inputs),
                           self._to_device(targets),
                           self._shard(mask), lengths)
            batches = _host_batches()

        for b_num, (dev_inputs, dev_targets, mask, lengths) in \
                enumerate(batches):
            b_tot = b_num + epoch * n_batches
            kld_mult = anneal(0.0, args.kld_mult, b_tot,
                              args.kld_anneal * n_batches)
            self.rng, sub = jax.random.split(self.rng)
            timer.start()
            out = step_fn(
                self.params, self.state, self.opt_state,
                dev_inputs, dev_targets, mask,
                jnp.float32(kld_mult), jnp.float32(sum(lengths)), sub)
            if args.gradients:
                self.params, self.state, self.opt_state, b_loss, \
                    grads = out
                plot_grad_flow(
                    grads, save_path=os.path.join(args.save_dir,
                                                  'grad_flow.pdf'))
            else:
                self.params, self.state, self.opt_state, b_loss = out
            timer.stop()
            if pending is not None:
                drain(pending)
            pending = (b_num, b_loss, sum(lengths))
        if pending is not None:
            drain(pending)
        if args.profile_dir:
            print('Step timing:', timer.summary())
        loss = loss_sum / max(data_num, 1)
        print('---')
        print('Epoch: {}\tLoss: {:10.1f}\tKLD-Mult: {:0.3f}'.format(
            epoch, loss, kld_mult))
        return loss

    def evaluate(self, loader, args, collect_results=True):
        """Eval-task engine (trainer.py:264-323): compose rand_delete +
        keep_segment + drop/keep_mods, run the MAP forward, compute
        metrics, decollate results.

        ``collect_results=False`` (the training-loop / find-best /
        metrics-only suite path) runs the fully device-resident engine
        when the app provides ``compute_metrics_device``: the eval set
        is pre-uploaded once, task composition + forward + per-sequence
        metric reduction are one jitted call per batch, and a single
        small ``device_get`` per eval crosses the wire (~17 s → ~1-2 s
        per periodic eval on the remote tunnel). Otherwise falls back
        to the host path below (collect path: visualization/artifact
        export needs the full reconstructions anyway).
        """
        collect_results = collect_results or args.visualize
        if (not collect_results
                and getattr(self, "compute_metrics_device", None)
                is not None):
            return self._evaluate_device(loader, args)
        n_timesteps = 0
        metrics = None
        results = {'seq_ids': [], 'targets': [], 'inputs': [], 'recon': []}
        rec_mults = dict(args.rec_mults)
        if args.eval_mods != 'all':
            for m in rec_mults:
                rec_mults[m] *= float(m in args.eval_mods)
        eval_args = {'sample': False}
        eval_args.update(args.eval_args)
        fwd = self._get_fwd(**eval_args)

        for b_num, (targets, mask, lengths, order, ids) in \
                enumerate(loader):
            inputs = mseq.rand_delete(targets, args.drop_frac, lengths)
            inputs = mseq.keep_segment(inputs, args.start_frac,
                                       args.stop_frac, lengths)
            for m in args.drop_mods:
                inputs[m][:] = float('nan')
            for m in args.keep_mods:
                inputs[m] = np.array(targets[m], copy=True)
            self.rng, sub = jax.random.split(self.rng)
            (infer, prior, recon), _ = fwd(
                self.params, self.state, self._to_device(inputs), sub)
            if collect_results:
                infer = tuple(np.asarray(x) for x in infer)
                prior = tuple(np.asarray(x) for x in prior)
                recon = {m: tuple(np.asarray(r) for r in rs)
                         for m, rs in recon.items()}
            n_timesteps += sum(lengths)
            b_metrics = self.compute_metrics(
                self.model, infer, prior, recon, targets, mask, lengths,
                order, args, rec_mults=rec_mults)
            metrics = (b_metrics if metrics is None else
                       {k: metrics[k] + b_metrics[k] for k in metrics})
            if collect_results:
                results['seq_ids'] += [ids[i] for i in order]
                results['targets'].append(
                    mseq.seq_decoll_dict(targets, lengths, order))
                results['inputs'].append(
                    mseq.seq_decoll_dict(inputs, lengths, order))
                results['recon'].append(
                    mseq.seq_decoll_dict(recon, lengths, order))
        if collect_results:
            for k in ('targets', 'inputs', 'recon'):
                modalities = list(results[k][0].keys())
                results[k] = {m: [seq for batch in results[k]
                                  for seq in batch[m]] for m in modalities}
            if args.visualize:
                self.visualize(results, metrics[args.viz_metric], args)
        metrics = self.summarize_metrics(metrics, n_timesteps)
        return results, metrics

    def _get_task_eval(self, rec_mults, eval_args, drop_mods, keep_mods):
        """Cache one jitted task-eval kernel per static config.

        drop/start/stop fracs are TRACED scalars, so a single compile
        serves every task of an experiment suite (recon/half/fwd/bwd/
        condgen differ only in those fracs and the static mod tuples).
        """
        key = (self._canon_key(rec_mults), self._canon_key(eval_args),
               tuple(drop_mods), tuple(keep_mods))
        fn = self._task_eval_cache.get(key)
        if fn is not None:
            return fn
        from .eval_engine import compose_task
        model = self.model
        metrics_dev = self.compute_metrics_device

        def task_eval(params, state, targets, mask, lengths, rng,
                      drop_frac, start_frac, stop_frac):
            k1, k2 = jax.random.split(rng)
            inputs = compose_task(targets, lengths, k1, drop_frac,
                                  start_frac, stop_frac, drop_mods,
                                  keep_mods,
                                  modalities=model.modalities)
            (infer, prior, recon), _ = model.forward(
                params, state, inputs, rng=k2, **eval_args)
            return metrics_dev(model, infer, prior, recon, targets,
                               mask, lengths, rec_mults)

        fn = jax.jit(task_eval)
        self._task_eval_cache[key] = fn
        return fn

    def _eval_put(self, x):
        """Mesh-aware placement for pre-uploaded eval batches: the batch
        axis (axis 1 for (T, B, ...) targets/mask, axis 0 for (B,)
        lengths) shards over the mesh data axis when divisible, else
        replicates — so multi-chip runs keep the device-resident eval
        path instead of falling back to host composition + per-batch
        re-upload (VERDICT r3 item 3)."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return jax.device_put(x)
        from ..parallel import batch_sharding, replicated
        b_axis = 0 if x.ndim == 1 else 1
        if x.shape[b_axis] % self._mesh_n_data == 0:
            sh = batch_sharding(self.mesh, x.ndim, b_axis)
        else:
            sh = replicated(self.mesh)
        return jax.device_put(x, sh)

    def _evaluate_device(self, loader, args):
        """Fully device-resident metrics-only eval (VERDICT r2 item 1).

        The eval set is collated + uploaded ONCE per (dataset, batching)
        and stays in HBM; per batch, task composition + MAP forward +
        per-sequence metric reduction run as one jitted call; all batch
        outputs are drained in a single ``jax.device_get``. Metric
        semantics (masked sums, per-sequence time averages, ``order``
        round-trip) match the host path bit-for-bit on deterministic
        tasks; random deletion draws from jax.random instead of numpy
        (documented deviation, distributionally identical).
        """
        from .eval_engine import DeviceEvalData

        dkey = (id(loader.dataset), loader.batch_size,
                getattr(loader, 'len_bucket', 0))
        cached = self._eval_dev_cache.get(dkey)
        if cached is None:
            dev = DeviceEvalData(loader.dataset, self.model.modalities,
                                 loader.batch_size,
                                 len_bucket=getattr(loader,
                                                    'len_bucket', 0),
                                 put=self._eval_put)
            # Pin the dataset object so id() stays unambiguous.
            self._eval_dev_cache[dkey] = (loader.dataset, dev)
        else:
            dev = cached[1]

        rec_mults = dict(args.rec_mults)
        if args.eval_mods != 'all':
            for m in rec_mults:
                rec_mults[m] *= float(m in args.eval_mods)
        eval_args = {'sample': False}
        eval_args.update(args.eval_args)
        fn = self._get_task_eval(rec_mults, eval_args,
                                 args.drop_mods, args.keep_mods)

        outs = []
        n_timesteps = 0
        for b in dev.batches:
            self.rng, sub = jax.random.split(self.rng)
            outs.append(fn(self.params, self.state, b.targets, b.mask,
                           b.lengths_dev, sub,
                           jnp.float32(args.drop_frac),
                           jnp.float32(args.start_frac),
                           jnp.float32(args.stop_frac)))
            n_timesteps += sum(b.lengths)
        outs = jax.device_get(outs)  # the one sync point

        metrics = None
        for b, out in zip(dev.batches, outs):
            b_metrics = {}
            for k, v in out.items():
                v = np.asarray(v)
                if v.ndim == 0:
                    b_metrics[k] = float(v)
                else:
                    # (B,)-padded per-seq values → original order, real
                    # sequences only (ghost columns live past n_real).
                    b_metrics[k] = [v[i] for i in b.order]
            metrics = (b_metrics if metrics is None else
                       {k: metrics[k] + b_metrics[k] for k in metrics})
        summary = self.summarize_metrics(metrics, n_timesteps)
        return ({'seq_ids': [], 'targets': [], 'inputs': [],
                 'recon': []}, summary)

    # ------------------------------------------------------------------
    # hooks (trainer.py:339-395)
    # ------------------------------------------------------------------

    def build_model(self, constructor, args):
        raise NotImplementedError

    def load_data(self, modalities, args):
        raise NotImplementedError

    def pre_build_args(self, args):
        """--method remap (trainer.py:349-370)."""
        if args.batch_sz_eval is None:
            args.batch_sz_eval = args.batch_size
        if args.method in ('bfvi', 'b-mask', 'f-mask', 'b-skip', 'f-skip'):
            print("Setting up '{}' inference method...".format(
                args.method))
            print("The --model and --model_args flags will be "
                  "overwritten.")
            if args.method == 'bfvi':
                args.model = 'dmm'
                if 'flt_particles' not in args.eval_args:
                    # Rebind (never mutate): the dict may be a parser
                    # default shared by other Namespaces.
                    args.eval_args = dict(args.eval_args,
                                          flt_particles=200)
            else:
                args.model = 'dks'
                args.model_args = {
                    "rnn_skip": 'skip' in args.method,
                    "rnn_dir": 'bwd' if args.method[0] == 'b' else 'fwd',
                }
        elif args.method is not None:
            print("Ignoring unknown inference method '{}'".format(
                args.method))
        return args

    def post_build_args(self, args):
        return args

    def compute_metrics(self, model, infer, prior, recon, targets, mask,
                        lengths, order, args, rec_mults=None):
        raise NotImplementedError

    def summarize_metrics(self, metrics, n_timesteps):
        raise NotImplementedError

    def visualize(self, results, metric, args):
        raise NotImplementedError

    def save_results(self, results, args):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # persistence (trainer.py:325-337,397-403)
    # ------------------------------------------------------------------

    def save_params(self, args):
        import pandas as pd
        fname = 'param_hist.tsv'
        df = pd.DataFrame([vars(args)], columns=list(vars(args).keys()))
        df = df[['save_dir', 'model', 'modalities',
                 'batch_size', 'split', 'epochs', 'lr', 'w_decay', 'seed',
                 'burst_frac', 'kld_mult', 'rec_mults', 'kld_anneal',
                 'model_args', 'train_args', 'eval_args']]
        df['h_dim'] = self.model.h_dim
        df['z_dim'] = self.model.z_dim
        df.to_csv(fname, mode='a', header=(not os.path.exists(fname)),
                  sep='\t')

    def _restore(self, checkpoint, opt=False):
        """Load checkpoint params/state onto the right devices
        (replicated over the mesh when one is active). ``opt=True``
        additionally restores the optimizer state (resume path)."""
        def place(t):
            t = jax.tree_util.tree_map(jnp.asarray, t)
            if self.mesh is not None:
                from ..parallel import replicated
                t = jax.device_put(t, replicated(self.mesh))
            return t
        self.params = place(checkpoint["params"])
        if "state" in checkpoint:
            self.state = place(checkpoint["state"])
        if opt and "opt_state" in checkpoint:
            self.opt_state = place(checkpoint["opt_state"])

    def save_checkpoint(self, modalities, path, extra=None):
        save_checkpoint(path, modalities, self.params, self.state,
                        self.opt_state, extra=extra)

    def _write_snapshot(self, snapshot, args, name, extra=None):
        """Serialize a deferred (params, state, opt_state) device
        snapshot (see run_train's best-checkpoint handling)."""
        params, state, opt_state = snapshot
        save_checkpoint(os.path.join(args.save_dir, name),
                        args.modalities, params, state, opt_state,
                        extra=extra)

    def load_checkpoint(self, path, device=None):
        return load_checkpoint(path)

    @staticmethod
    def _latest_epoch_checkpoint(save_dir):
        """Newest loadable ``epoch_N.pth`` in ``save_dir`` as
        ``(N, payload)``; ``(None, None)`` when none exists. A partially
        written newest file (the run was killed mid-pickle) falls back
        to the next-newest."""
        import re
        epochs = []
        for fname in os.listdir(save_dir) if os.path.isdir(save_dir) \
                else []:
            m = re.fullmatch(r"epoch_(\d+)\.pth", fname)
            if m:
                epochs.append(int(m.group(1)))
        for n in sorted(epochs, reverse=True):
            path = os.path.join(save_dir, "epoch_{}.pth".format(n))
            try:
                return n, load_checkpoint(path)
            except Exception as e:
                print("Skipping unreadable checkpoint {} ({!r})"
                      .format(path, e))
        return None, None

    # ------------------------------------------------------------------
    # drivers (trainer.py:405-579)
    # ------------------------------------------------------------------

    def run_eval(self, args):
        """Evaluate on train and/or test sets (trainer.py:405-435).

        ``--save_args "{skip: true}"`` computes metrics only: forward
        outputs stay on device and no artifacts (AVI/WAV/PDF) are
        written — the experiment suites use this for their 75+ task
        re-evaluations, where only the metric numbers feed the CSVs.
        """
        skip_save = (isinstance(args.save_args, dict)
                     and bool(args.save_args.get('skip')))
        train_metrics, test_metrics = None, None
        if 'train' in args.eval_sets:
            print("--Training--")
            loader = BatchLoader(self.train_data,
                                 batch_size=args.batch_sz_eval,
                                 len_bucket=args.len_bucket)
            args.eval_set = 'train'
            results, train_metrics = self.evaluate(
                loader, args, collect_results=not skip_save)
            if not skip_save:
                self.save_results(results, args)
        if 'test' in args.eval_sets:
            print("--Testing--")
            loader = BatchLoader(self.test_data,
                                 batch_size=args.batch_sz_eval,
                                 len_bucket=args.len_bucket)
            args.eval_set = 'test'
            results, test_metrics = self.evaluate(
                loader, args, collect_results=not skip_save)
            if not skip_save:
                self.save_results(results, args)
        self.save_params(args)
        return train_metrics, test_metrics

    def run_find(self, args):
        """Sweep saved epoch checkpoints for the best model
        (trainer.py:437-476)."""
        test_loader = BatchLoader(self.test_data,
                                  batch_size=args.batch_sz_eval,
                                  len_bucket=args.len_bucket)
        best_loss, best_epoch = float('inf'), -1
        args.eval_set = None
        for epoch in range(args.save_freq, args.epochs + 1,
                           args.save_freq):
            path = os.path.join(args.save_dir,
                                "epoch_{}.pth".format(epoch))
            if not os.path.exists(path):
                continue
            checkpoint = load_checkpoint(path)
            self._restore(checkpoint)
            print('--- Epoch {} ---'.format(epoch))
            _, metrics = self.evaluate(test_loader, args,
                                       collect_results=False)
            loss = metrics[args.eval_metric]
            if loss < best_loss:
                best_loss, best_epoch = loss, epoch
                self.save_checkpoint(
                    args.modalities,
                    os.path.join(args.save_dir, "best.pth"))
        print('=== Best Epoch : {} ==='.format(best_epoch))
        checkpoint = load_checkpoint(
            os.path.join(args.save_dir, "best.pth"))
        self._restore(checkpoint)
        results, metrics = self.evaluate(test_loader, args)
        self.save_params(args)
        return best_epoch, metrics

    def run_train(self, args, reporter=None):
        """Full training driver (trainer.py:478-554)."""
        train_data, test_data = self.train_data, self.test_data

        # Train-data corruption (trainer.py:491-503).
        if 'uniform' in args.corrupt:
            train_data = train_data.corrupt(args.corrupt['uniform'])
        if 'burst' in args.corrupt:
            train_data = train_data.corrupt(args.corrupt['burst'],
                                            mode='burst')
        if 'semi' in args.corrupt:
            train_data = train_data.corrupt(
                args.corrupt['semi'], mode='all_none',
                modalities=args.corrupt['modalities'])

        train_data = train_data.split(args.split, args.bylen)
        train_loader = None
        # native_mods is derived from the loader below, never carried
        # over from a previous run_train with a different loader.
        if 'native_mods' in args.train_args:
            args.train_args = {k: v for k, v in args.train_args.items()
                               if k != 'native_mods'}
        if not getattr(args, 'host_loader', False):
            # Codec-native batch storage: one permutation at upload,
            # zero per-step edge-layout copies in the fused step.
            native = {}
            if not getattr(args, 'edge_layout', False):
                native = getattr(self.model, 'native_input_perms',
                                 lambda: {})()
            try:
                from .device_loader import DeviceTrainData
                train_loader = DeviceTrainData(
                    train_data, self.model.modalities,
                    args.batch_size, args.burst_frac,
                    native_perms=native)
            except ValueError:
                # A native-perm/dims mismatch is a model-vs-dataset
                # config bug — surface it, don't silently fall back to
                # the 10-50x slower host loader.
                raise
            except Exception as e:
                print("Device loader unavailable ({!r}); using host "
                      "loader.".format(e))
            if train_loader is not None and native:
                args.train_args = dict(args.train_args)
                args.train_args['native_mods'] = tuple(
                    m for m in self.model.modalities if m in native)
        if train_loader is None:
            train_loader = BatchLoader(train_data,
                                       batch_size=args.batch_size,
                                       shuffle=True)
        test_loader = BatchLoader(test_data,
                                  batch_size=args.batch_sz_eval,
                                  len_bucket=args.len_bucket)

        best_loss = float('inf')
        best_snapshot = None
        loss = float('nan')
        metrics = {}
        args.eval_set = None
        start_epoch = 1
        # Intra-trial resume (--resume_trial / MDMM_RESUME_TRIAL=1):
        # continue from the latest epoch_N.pth. The shuffle order is a
        # pure function of (seed, epoch), the KLD anneal of the epoch
        # number, and the sampling stream is restored from the
        # checkpoint, so the resumed run is bit-identical to the
        # uninterrupted one (tests/test_resume_trial.py). Checkpoints
        # written before this feature lack the rng/best_loss extras;
        # they resume with a reset sampling stream and a re-learned
        # best (best.pth can regress by < save_freq epochs then).
        if (getattr(args, 'resume_trial', False)
                or os.environ.get('MDMM_RESUME_TRIAL') == '1'):
            latest, ck = self._latest_epoch_checkpoint(args.save_dir)
            if ck is not None:
                self._restore(ck, opt=True)
                start_epoch = int(ck.get("epoch", latest)) + 1
                if "best_loss" in ck:
                    best_loss = float(ck["best_loss"])
                if "rng" in ck:
                    self.rng = jnp.asarray(ck["rng"])
                print('--- Resuming from epoch {} checkpoint '
                      '(best_loss {:0.4g}) ---'.format(latest, best_loss))
        from .diagnostics import profile_ctx
        profile_epochs = {2} if getattr(args, 'profile_dir', None) \
            else set()
        # SIGTERM durability (ADVICE r2): the best snapshot is written
        # lazily every save_freq epochs; a polite kill between writes
        # would lose up to save_freq epochs of improvement. Convert
        # SIGTERM into an exception so the `finally` below persists the
        # pending snapshot first. (SIGKILL/OOM still can't be covered.)
        import signal

        def _on_term(signum, frame):
            raise KeyboardInterrupt("SIGTERM")

        prev_term = None
        try:
            prev_term = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not the main thread
        try:
          for epoch in range(start_epoch, args.epochs + 1):
            print('---')
            if epoch in profile_epochs:
                with profile_ctx(args.profile_dir):
                    self.train(train_loader, epoch, args)
            else:
                self.train(train_loader, epoch, args)
            if epoch % args.eval_freq == 0:
                _, metrics = self.evaluate(test_loader, args,
                                           collect_results=False)
                loss = metrics[args.eval_metric]
                if loss < best_loss:
                    best_loss = loss
                    # Snapshot the best params/state on DEVICE (cheap
                    # HBM copy; the train step donates the old buffers
                    # so references alone would die) and defer the disk
                    # write: serializing a checkpoint pulls the full
                    # params+optimizer state to the host (~10 s on a
                    # remote-dispatch tunnel), which at every-eval
                    # cadence dominated training wall-clock.
                    best_snapshot = jax.tree_util.tree_map(
                        jnp.copy,
                        (self.params, self.state, self.opt_state))
                if reporter is not None:
                    reporter(mean_loss=loss, best_loss=best_loss,
                             training_iteration=epoch,
                             done=bool(np.isnan(loss)), **metrics)
            if epoch % args.save_freq == 0:
                if best_snapshot is not None:
                    self._write_snapshot(best_snapshot, args, "best.pth",
                                         extra={"best_loss":
                                                float(best_loss)})
                    best_snapshot = None
                self.save_checkpoint(
                    args.modalities,
                    os.path.join(args.save_dir,
                                 "epoch_{}.pth".format(epoch)),
                    extra={"epoch": epoch,
                           "best_loss": float(best_loss),
                           "rng": np.asarray(self.rng)})
        finally:
            # StopTrial (reporter done=True, e.g. NaN loss) and SIGTERM
            # must still leave the best pre-termination checkpoint on
            # disk - the suites' analysis depends on it (reference
            # trial semantics).
            if best_snapshot is not None:
                self._write_snapshot(best_snapshot, args, "best.pth",
                                     extra={"best_loss":
                                            float(best_loss)})
            if prev_term is not None:
                try:
                    signal.signal(signal.SIGTERM, prev_term)
                except ValueError:
                    pass
        self.save_checkpoint(args.modalities,
                             os.path.join(args.save_dir, "last.pth"))
        self.save_params(args)
        if reporter is not None:
            reporter(mean_loss=loss, best_loss=best_loss,
                     training_iteration=args.epochs, done=True, **metrics)

    def run(self, args):
        if args.evaluate:
            self.run_eval(args)
            return
        if args.find_best:
            self.run_find(args)
            return
        self.run_train(args)

    @classmethod
    def tune(cls, config, reporter):
        """Trainable adapter for experiment orchestration
        (trainer.py:570-579)."""
        args = cls.parser.parse_args([])
        vars(args).update(config)
        trainer = cls(args)
        trainer.run_train(args, reporter)
