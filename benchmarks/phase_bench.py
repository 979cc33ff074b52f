"""Phase-level breakdown of the bench.py Weizmann-shaped train step.

Times each phase of the fused BFVI step in isolation (each under its own
jit, block_until_ready-timed) so the 60 ms step can be attributed:

  encode        conv encoder over T*B images
  bfilter       K=1 backward filtering scan over the VB variant batch
  sfilter       K=25 backward filtering scan (the smoothing mode's pass)
  fsmooth       K=1 forward smoothing scan (obs + filter-prior + inv experts)
  decode        conv decoder over T*VB latents (one mode's worth)
  loss_fwd      full fused objective, forward only
  grad_step     full objective + backward + Adam (what bench.py measures)

Usage: python benchmarks/phase_bench.py [--bf16] [--reps 20]
Prints one JSON line with per-phase median ms.
"""

import argparse
import json
import sys
import time

import numpy as np


def timeit(fn, args, reps):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1000, ts[int(len(ts) * 0.9)] * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (CPU correctness check)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_dmm_tpu.models.dmm import MultiDMM
    from multimodal_dmm_tpu.models.codecs import (image_encoder_codec,
                                                  image_decoder_codec)

    T, B, Z = (4, 2, 256) if args.smoke else (25, 25, 256)
    dt = jnp.bfloat16 if args.bf16 else None
    print("device:", jax.devices()[0], "dtype:",
          "bf16" if args.bf16 else "f32", file=sys.stderr, flush=True)

    model = MultiDMM(
        ["video", "person", "action"],
        [(3, 64, 64), 9, 10],
        dists=["Bernoulli", "Categorical", "Categorical"],
        encoders={"video": image_encoder_codec(Z, gauss_out=True,
                                               compute_dtype=dt)},
        decoders={"video": image_decoder_codec(Z, compute_dtype=dt)},
        z_dim=Z, h_dim=Z, scan_unroll=args.unroll)
    params, state = model.init(jax.random.PRNGKey(0))

    optimizer = optax.chain(optax.add_decayed_weights(1e-4),
                            optax.adam(5e-4))
    opt_state = optimizer.init(params)
    rec_mults = {"video": 1.0, "person": 10.0, "action": 10.0}

    rng = np.random.RandomState(0)
    video = rng.rand(T, B, 3, 64, 64).astype(np.float32)
    video[rng.rand(T, B) < 0.1] = np.nan
    inputs = {
        "video": jnp.asarray(video),
        "person": jnp.asarray(
            rng.randint(0, 9, (T, B, 1)).astype(np.float32)),
        "action": jnp.asarray(
            rng.randint(0, 10, (T, B, 1)).astype(np.float32)),
    }
    mask = jnp.ones((T, B, 1), jnp.float32)
    full_inputs = model._nan_fill_missing(inputs, T, B)
    key = jax.random.PRNGKey(1)

    results = {}

    # --- encode ---------------------------------------------------------
    @jax.jit
    def encode(p, s, xs):
        (zm, zs_, msk), _ = model.encode(p, s["enc"], xs, train=True)
        return zm, zs_, msk

    results["encode"], _ = timeit(encode, (params, state, full_inputs),
                                  args.reps)
    obs_mean, obs_std, obs_mask = encode(params, state, full_inputs)

    # Variant-stacked expert tensors, as _fused_mode_loss builds them.
    n_mods = model.n_mods
    V = 1 + n_mods
    vmat = jnp.concatenate([jnp.ones((1, n_mods)), jnp.eye(n_mods)])
    VB = V * B
    om = (obs_mask.astype(jnp.float32)[:, :, None, :]
          * jnp.transpose(vmat)[:, None, :, None]).reshape(n_mods, T, VB)
    tile = lambda x: jnp.broadcast_to(  # noqa: E731
        x[:, :, None], (n_mods, T, V, B, Z)).reshape(n_mods, T, VB, Z)
    zm, zs = tile(obs_mean), tile(obs_std)

    # --- bfilter (K=1) ----------------------------------------------------
    @jax.jit
    def bfilter(p, zm, zs, om, k):
        return model.z_filter(p, zm, zs, om, k, direction="bwd",
                              sample=True, n_particles=1)

    results["bfilter_K1"], _ = timeit(bfilter, (params, zm, zs, om, key),
                                      args.reps)

    # --- smoothing-mode filtering pass (K=25) ------------------------------
    @jax.jit
    def sfilter(p, zm, zs, om, k):
        return model.z_filter(p, zm, zs, om, k, direction="bwd",
                              sample=True, n_particles=25)

    results["sfilter_K25"], _ = timeit(sfilter, (params, zm, zs, om, key),
                                       args.reps)
    infer, prior, z_samples = sfilter(params, zm, zs, om, key)

    # --- forward smoothing scan (K=1, n_mods+2 experts) --------------------
    glb_mean, glb_std = model.prior_params(params, (T, VB, Z))
    inv_mean = jnp.broadcast_to(glb_mean, (T, VB, Z))
    inv_std = -jnp.broadcast_to(glb_std, (T, VB, Z))
    inv_mask = jnp.ones((T, VB))
    flt_mean, flt_std = prior
    flt_mask = jnp.ones((T, VB)).at[-1].set(0.0)
    cat = lambda a, b: jnp.concatenate([a, b[None]], axis=0)  # noqa: E731
    szm = cat(cat(zm, flt_mean), inv_mean)
    szs = cat(cat(zs, flt_std), inv_std)
    som = cat(cat(om, flt_mask), inv_mask)

    @jax.jit
    def fsmooth(p, zm, zs, om, k):
        return model.z_filter(p, zm, zs, om, k, direction="fwd",
                              sample=True, n_particles=1)

    results["fsmooth_K1"], _ = timeit(fsmooth,
                                      (params, szm, szs, som, key),
                                      args.reps)
    _, _, z_smp = fsmooth(params, szm, szs, som, key)

    # --- decode -----------------------------------------------------------
    @jax.jit
    def decode(p, s, z):
        recon, _ = model.decode(p, s["dec"], z, train=True)
        return recon

    results["decode"], _ = timeit(decode, (params, state, z_smp),
                                  args.reps)

    # --- full forward loss --------------------------------------------------
    @jax.jit
    def loss_fwd(p, s, k):
        loss, _ = model.step(p, s, inputs, mask, jnp.float32(1.0),
                             rec_mults, k, targets=inputs, train=True)
        return loss

    results["loss_fwd"], _ = timeit(loss_fwd, (params, state, key),
                                    args.reps)

    # --- full train step ------------------------------------------------
    def train_step(p, s, o, k):
        def loss_fn(pp):
            loss, ns = model.step(pp, s, inputs, mask, jnp.float32(1.0),
                                  rec_mults, k, targets=inputs,
                                  train=True)
            return loss / (T * B), (loss, ns)

        grads, (loss, ns) = jax.grad(loss_fn, has_aux=True)(p)
        updates, no = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), ns, no, loss

    step = jax.jit(train_step)
    results["grad_step"], results["grad_step_p90"] = timeit(
        step, (params, state, opt_state, key), args.reps)

    results = {k: round(v, 2) for k, v in results.items()}
    results["dtype"] = "bf16" if args.bf16 else "f32"
    results["unroll"] = args.unroll
    print(json.dumps(results))


if __name__ == "__main__":
    main()
