"""Extra trainer-path coverage: semi corruption, VRNN via the trainer,
unfused flag plumbing, gradient-flow plotting."""

import os

import numpy as np
import pytest

from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
from multimodal_dmm_tpu.data.spirals import gen_dataset
from multimodal_dmm_tpu.training.loader import BatchLoader


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("spirals_data")
    gen_dataset(n_examples=14, n_train=8, timesteps=16,
                data_dir=str(d))
    return str(d)


def make_args(data_dir, save_dir, **over):
    defaults = dict(data_dir=data_dir, save_dir=save_dir, epochs=1,
                    eval_freq=1, save_freq=1, batch_size=4,
                    device="cpu", seed=1)
    defaults.update(over)
    argv = []
    for k, v in defaults.items():
        if isinstance(v, bool):
            if v:
                argv.append("--" + k)
        else:
            argv += ["--" + k, str(v)]
    return SpiralsTrainer.parser.parse_args(argv)


def test_semi_corruption_training(tiny_env, tmp_path):
    """--corrupt '{semi: 0.5, modalities: [spiral-y]}' deletes whole
    modalities per sequence during training (trainer.py:499-503)."""
    args = make_args(tiny_env, str(tmp_path / "s"),
                     corrupt="{semi: 0.5, modalities: [spiral-y]}")
    trainer = SpiralsTrainer(args)
    # auto rec_mults unaffected by semi corruption
    trainer.run_train(args)
    assert os.path.exists(os.path.join(str(tmp_path / "s"), "last.pth"))


def test_uniform_corruption_scales_rec_mults(tiny_env, tmp_path):
    args = make_args(tiny_env, str(tmp_path / "u"),
                     corrupt="{uniform: 0.5}")
    trainer = SpiralsTrainer(args)
    # (1/1)/2 * 1/(1-0.5) = 1.0 (spirals.py:64-73)
    assert abs(args.rec_mults["spiral-x"] - 1.0) < 1e-9


def test_vrnn_through_trainer(tiny_env, tmp_path):
    args = make_args(tiny_env, str(tmp_path / "v"), model="vrnn")
    trainer = SpiralsTrainer(args)
    trainer.run_train(args)
    _, metrics = trainer.run_eval(args)


def test_unfused_train_args_plumbing(tiny_env, tmp_path):
    """--train_args '{fused: false}' reaches MultiDMM.step."""
    args = make_args(tiny_env, str(tmp_path / "nf"),
                     train_args="{fused: false}")
    trainer = SpiralsTrainer(args)
    train_data = trainer.train_data.split(args.split, args.bylen)
    loader = BatchLoader(train_data, batch_size=args.batch_size,
                         shuffle=True)
    loss = trainer.train(loader, 1, args)
    assert np.isfinite(loss)


def test_gradients_flag_writes_plot(tiny_env, tmp_path):
    save_dir = str(tmp_path / "g")
    args = make_args(tiny_env, save_dir, gradients=True)
    trainer = SpiralsTrainer(args)
    train_data = trainer.train_data.split(args.split, args.bylen)
    loader = BatchLoader(train_data, batch_size=args.batch_size,
                         shuffle=True)
    trainer.train(loader, 1, args)
    assert os.path.exists(os.path.join(save_dir, "grad_flow.pdf"))


def test_dks_through_trainer_bwd_skip(tiny_env, tmp_path):
    args = make_args(tiny_env, str(tmp_path / "d"), method="b-skip")
    trainer = SpiralsTrainer(args)
    assert args.model == "dks"
    assert args.model_args == {"rnn_skip": True, "rnn_dir": "bwd",
                               "feat_to_z": False}
    trainer.run_train(args)
    assert os.path.exists(os.path.join(str(tmp_path / "d"),
                                       "best.pth"))


def test_nonfinite_updates_are_skipped():
    """A NaN-grad batch must leave params unchanged; the next finite
    batch updates normally (optax.apply_if_finite wrapping)."""
    import jax.numpy as jnp
    import optax

    tx = optax.apply_if_finite(
        optax.chain(optax.add_decayed_weights(1e-4), optax.adam(1e-2)),
        max_consecutive_errors=10)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    bad = {"w": jnp.array([1.0, jnp.nan, 2.0])}
    up, st = tx.update(bad, st, params)
    p1 = optax.apply_updates(params, up)
    np.testing.assert_array_equal(np.asarray(p1["w"]),
                                  np.asarray(params["w"]))
    good = {"w": jnp.ones((3,))}
    up, st = tx.update(good, st, p1)
    p2 = optax.apply_updates(p1, up)
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(p1["w"]))


def test_sigterm_persists_pending_best_snapshot(tiny_env, tmp_path):
    """A polite SIGTERM between save points must still write the
    pending best.pth (deferred-snapshot durability, ADVICE r2)."""
    import signal

    save_dir = str(tmp_path / "sigterm_save")
    # eval every epoch, save only at epoch 100 → the best snapshot is
    # pending in memory when the signal lands at epoch 3.
    args = make_args(tiny_env, save_dir, epochs=100, eval_freq=1,
                     save_freq=100)
    trainer = SpiralsTrainer(args)
    orig_train = trainer.train
    calls = {"n": 0}

    def train_then_term(loader, epoch, a):
        out = orig_train(loader, epoch, a)
        calls["n"] += 1
        if calls["n"] == 3:
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    trainer.train = train_then_term
    with pytest.raises(KeyboardInterrupt):
        trainer.run_train(args)
    assert os.path.exists(os.path.join(save_dir, "best.pth"))
    # The previous SIGTERM disposition is restored.
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler) or callable(
        signal.getsignal(signal.SIGTERM))


def test_train_step_cache_key_order_insensitive(tiny_env, tmp_path):
    """Nested dicts with different insertion orders must hit the same
    jitted train step (no silent recompiles — VERDICT r2 weak 6)."""
    args = make_args(tiny_env, str(tmp_path / "ck"))
    trainer = SpiralsTrainer(args)
    args.train_args = {"sample": False, "extra": {"a": 1, "b": 2}}
    args.rec_mults = {"spiral-x": 1.0, "spiral-y": 2.0}
    step1 = trainer._get_train_step(args)
    args.train_args = {"extra": {"b": 2, "a": 1}, "sample": False}
    args.rec_mults = {"spiral-y": 2.0, "spiral-x": 1.0}
    step2 = trainer._get_train_step(args)
    assert step1 is step2


def test_checkpoint_v1_deconv_conversion(tmp_path):
    """A format-1 checkpoint (HWOI/WOI deconv kernels, no "format" key)
    loads as format 2 with every deconv kernel re-permuted — params and
    the Adam moments that mirror them — and the converted model produces
    the same decoder output as the original graph-side-flip math."""
    import pickle

    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_dmm_tpu.models import codecs
    from multimodal_dmm_tpu.training.checkpoint import load_checkpoint

    key = jax.random.PRNGKey(7)
    params, state, meta = codecs.image_decoder_init(
        key, z_dim=5, img_size=16, n_channels=3, n_kernels=8, n_layers=2)
    z = jax.random.normal(jax.random.PRNGKey(8), (4, 5))
    want, _ = codecs.image_decoder_apply(params, state, meta, z, train=False)

    # Forge the v1 payload: invert the storage permutation (flip+transpose
    # is an involution up to the axis swap) and drop the format key.
    def unflip(w):
        w = np.asarray(w)
        if w.ndim == 4:
            return np.transpose(w, (0, 1, 3, 2))[::-1, ::-1].copy()
        return w
    def to_v1(p):
        out = dict(p)
        out["deconvs"] = [{"w": unflip(l["w"]), "b": np.asarray(l["b"])}
                          for l in p["deconvs"]]
        return out
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    v1_opt_state = jax.tree_util.tree_map(np.asarray, opt_state)
    # Adam mu mirrors params: forge its deconv leaves to v1 layout too.
    v1_opt_state = (v1_opt_state[0]._replace(
        mu=to_v1(jax.tree_util.tree_map(np.asarray, opt_state[0].mu)),
        nu=to_v1(jax.tree_util.tree_map(np.asarray, opt_state[0].nu))),
        v1_opt_state[1])
    payload = {"modalities": ["video"],
               "params": to_v1(jax.tree_util.tree_map(np.asarray, params)),
               "opt_state": v1_opt_state}
    path = os.path.join(str(tmp_path), "best.pth")
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    loaded = load_checkpoint(path)
    assert loaded["format"] == 2
    for l_new, l_old in zip(loaded["params"]["deconvs"], params["deconvs"]):
        np.testing.assert_array_equal(l_new["w"], np.asarray(l_old["w"]))
    for l_new, l_old in zip(loaded["opt_state"][0].mu["deconvs"],
                            params["deconvs"]):
        assert l_new["w"].shape == l_old["w"].shape
    got, _ = codecs.image_decoder_apply(
        jax.tree_util.tree_map(jnp.asarray, loaded["params"]),
        state, meta, z, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_parser_default_dicts_not_contaminated_across_parses(tiny_env,
                                                             tmp_path):
    """argparse shares default objects across parse_args calls; building
    a --method bfvi trainer (whose remap adds flt_particles=200 to
    eval_args) must not leak into a later parse from the same parser —
    that leak silently turned later MAP evals into 200-particle sampled
    ones (device-vs-host eval exactness drift)."""
    from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer

    data_dir = tiny_env
    argv = ["--data_dir", data_dir, "--save_dir", str(tmp_path),
            "--device", "cpu", "--method", "bfvi"]
    args1 = SpiralsTrainer.parser.parse_args(argv)
    SpiralsTrainer(args1)
    assert args1.eval_args.get("flt_particles") == 200

    args2 = SpiralsTrainer.parser.parse_args(
        ["--data_dir", data_dir, "--save_dir", str(tmp_path),
         "--device", "cpu"])
    assert "flt_particles" not in args2.eval_args
    assert args2.model_args == {} and args2.train_args == {}


def test_matmul_precision_flag(tiny_env, tmp_path):
    """--matmul_precision highest forces full-precision contractions
    globally (the knob that makes TPU training numerics CPU/torch-
    equivalent, RESULTS §20); default leaves the backend default. The
    config is process-global, so suites apply it via their per-trial
    subprocess isolation — restore it here since tests share a
    process."""
    import jax

    before = jax.config.jax_default_matmul_precision
    try:
        args = make_args(tiny_env, str(tmp_path / "mp"),
                         matmul_precision="highest")
        trainer = SpiralsTrainer(args)
        assert jax.config.jax_default_matmul_precision == "highest"
        trainer.run_train(args)
        assert os.path.exists(os.path.join(str(tmp_path / "mp"),
                                           "last.pth"))
    finally:
        jax.config.update("jax_default_matmul_precision", before)


def test_init_seed_decouples_init_stream(tiny_env, tmp_path):
    """--init_seed S reproduces a --seed S run's init params exactly
    while --seed keeps driving the other streams (RESULTS §20 basin
    attribution)."""
    import jax
    import numpy as np

    t_ref = SpiralsTrainer(make_args(tiny_env, str(tmp_path / "a"),
                                     seed=3))
    t_ovr = SpiralsTrainer(make_args(tiny_env, str(tmp_path / "b"),
                                     seed=0, init_seed=3))
    t_base = SpiralsTrainer(make_args(tiny_env, str(tmp_path / "c"),
                                      seed=0))
    ref = jax.tree_util.tree_leaves(t_ref.params)
    ovr = jax.tree_util.tree_leaves(t_ovr.params)
    base = jax.tree_util.tree_leaves(t_base.params)
    for a, b in zip(ref, ovr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(base, ovr))
    # the sampling stream still follows --seed, not --init_seed
    assert np.array_equal(np.asarray(t_ovr.rng), np.asarray(t_base.rng))
