"""Benchmark: Weizmann-shaped BFVI training throughput (seqs/sec/chip).

Measures the full canonical Weizmann training step (BASELINE.md: batch 25,
25-frame chunks, z=h=256, video 3x64x64 Bernoulli + person/action
categorical; objective = 2 prior-matching rollouts + 4 filtering forwards
+ 4 smoothing forwards with 25 particles + backward + Adam) on synthetic
data, end to end under one jit.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seqs/sec", "vs_baseline": N}

vs_baseline is measured against the PyTorch-CPU implementation in
benchmarks/torch_baseline.py (result cached in
benchmarks/baseline_result.json).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_dmm_tpu.models.dmm import MultiDMM
    from multimodal_dmm_tpu.models.codecs import (image_encoder_codec,
                                                  image_decoder_codec)

    T, B, Z = 25, 25, 256
    # The TPU backend here is a remote-dispatch tunnel that can be
    # transiently down — and a dead tunnel WEDGES dispatches rather
    # than raising, so probe from a subprocess with its own timeout
    # and wait (bounded) for recovery before committing to the run.
    import subprocess
    probe = ("import jax, jax.numpy as jnp; "
             "jax.block_until_ready(jnp.ones((8,8)) @ jnp.ones((8,8))); "
             "print('PROBE_OK')")
    deadline = time.time() + float(os.environ.get("MDMM_BENCH_WAIT_S",
                                                  "600"))
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=120)
            if b"PROBE_OK" in r.stdout:
                break
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            log("device probe never succeeded; proceeding anyway")
            break
        log("device probe failed; retrying for {:.0f}s more"
            .format(deadline - time.time()))
        time.sleep(30)
    log("bench device:", jax.devices()[0])
    # bf16 conv codecs (f32 masters + accumulation) are the production
    # configuration: measured faster on device time (29.8 vs 31.8
    # ms/step) and quality-neutral (tests/test_bf16_codecs.py); --f32
    # opts out.
    bf16 = "--f32" not in sys.argv
    merge = "--merge" in sys.argv
    # Ragged two-mode scan (models/dmm.py z_filter_grouped): both
    # objective filtering passes share one scan without K-padding.
    # Default since round 5 (benched +2.3% over the two-scan step,
    # 1546 vs 1512 seqs/sec, results/tail_r5b/bench_ragged.log;
    # loss/grad-exact vs the unfused composition,
    # tests/test_fused_step.py); --no_ragged opts out.
    ragged = "--no_ragged" not in sys.argv
    bf16_gtf = "--bf16_gtf" in sys.argv
    scan_kernel = "--scan_kernel" in sys.argv
    # Codec-native batch layout (the trainer's device-loader default):
    # video stored (T, B, H, W, C), zero edge transposes in the step.
    # --edge (or the trainer's spelling --edge_layout) opts back into
    # channel-first batches.
    native = ("--edge" not in sys.argv
              and "--edge_layout" not in sys.argv)
    if "--rbg" in sys.argv:
        # Hardware-RNG particle noise (different but equally valid
        # draws); mirrors the Trainer's --rng_impl rbg.
        jax.config.update("jax_default_prng_impl", "rbg")
    if "--precision" in sys.argv:
        # Mirrors the Trainer's --matmul_precision: 'highest' forces
        # CPU-equivalent multi-pass f32 contractions (quantifies the
        # throughput cost of the DKS basin fix candidate, RESULTS §20).
        jax.config.update(
            "jax_default_matmul_precision",
            sys.argv[sys.argv.index("--precision") + 1])
    unroll = "auto"  # model default: full 25-step unroll on TPU
    if "--unroll" in sys.argv:
        unroll = int(sys.argv[sys.argv.index("--unroll") + 1])
    dt = jnp.bfloat16 if bf16 else None
    log("codec compute dtype:", "bf16" if bf16 else "f32",
        "| merge_mode_scans:", merge, "| ragged:", ragged,
        "| unroll:", unroll,
        "| bf16_gtf:", bf16_gtf, "| scan_kernel:", scan_kernel,
        "| rbg:", "--rbg" in sys.argv,
        "| layout:", "native" if native else "edge")

    model = MultiDMM(
        ["video", "person", "action"],
        [(3, 64, 64), 9, 10],
        dists=["Bernoulli", "Categorical", "Categorical"],
        encoders={"video": image_encoder_codec(Z, gauss_out=True,
                                               compute_dtype=dt)},
        decoders={"video": image_decoder_codec(Z, compute_dtype=dt)},
        z_dim=Z, h_dim=Z, scan_unroll=unroll, bf16_gtf=bf16_gtf,
        use_scan_kernel=scan_kernel)
    params, state = model.init(jax.random.PRNGKey(0))

    optimizer = optax.chain(optax.add_decayed_weights(1e-4),
                            optax.adam(5e-4))
    opt_state = optimizer.init(params)
    rec_mults = {"video": 1.0, "person": 10.0, "action": 10.0}

    rng = np.random.RandomState(0)
    video = rng.rand(T, B, 3, 64, 64).astype(np.float32)
    video[rng.rand(T, B) < 0.1] = np.nan
    if native:
        video = np.ascontiguousarray(video.transpose(0, 1, 3, 4, 2))
    native_mods = ("video",) if native else ()
    inputs = {
        "video": jnp.asarray(video),
        "person": jnp.asarray(
            rng.randint(0, 9, (T, B, 1)).astype(np.float32)),
        "action": jnp.asarray(
            rng.randint(0, 10, (T, B, 1)).astype(np.float32)),
    }
    mask = jnp.ones((T, B, 1), jnp.float32)

    def train_step(params, state, opt_state, inputs, kld_mult, key):
        def loss_fn(p):
            loss, new_state = model.step(
                p, state, inputs, mask, kld_mult, rec_mults, key,
                targets=inputs, train=True, merge_mode_scans=merge,
                ragged_mode_scans=ragged, native_mods=native_mods)
            return loss / (T * B), (loss, new_state)

        grads, (loss, new_state) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state, new_opt,
                loss)

    step = jax.jit(train_step, donate_argnums=(0, 2))

    key = jax.random.PRNGKey(1)
    log("compiling...")
    t0 = time.time()
    # AOT-compile so the SAME executable yields XLA's optimized-HLO
    # FLOP estimate (cost_analysis) — the MFU denominator is then
    # anchored to what actually runs, not a hand model.
    est_flops = 0.0
    try:
        compiled = step.lower(params, state, opt_state, inputs,
                              jnp.float32(1.0), key).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        est_flops = float((ca or {}).get("flops", 0.0))
        step = compiled
    except Exception as e:  # cost_analysis is backend-dependent
        log("cost_analysis unavailable ({}); MFU omitted".format(e))
    params, state, opt_state, loss = step(params, state, opt_state,
                                          inputs, jnp.float32(1.0), key)
    jax.block_until_ready(loss)
    log(f"compile+first step: {time.time() - t0:.1f}s "
        f"loss={float(loss):.1f}")

    # --- synchronous step latency (host-blocking each step) -----------
    n_sync = 20
    times = []
    for i in range(n_sync):
        key, sub = jax.random.split(key)
        t0 = time.time()
        params, state, opt_state, loss = step(
            params, state, opt_state, inputs, jnp.float32(1.0), sub)
        jax.block_until_ready(loss)
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    p90 = times[int(len(times) * 0.9)]
    log(f"sync step latency: p50 {med*1000:.1f}ms  p90 {p90*1000:.1f}ms"
        f" over {n_sync} steps")

    # --- pipelined steady-state throughput (the deployment number) ----
    # The Trainer's loop drains each step's loss ONE step late
    # (training/trainer.py), so device execution overlaps host work and
    # the tunnel round-trip; a remote-dispatch latency of tens of ms
    # (axon) otherwise doubles the apparent step time. Enqueue the
    # whole window and block once — JAX dispatch is asynchronous, this
    # is exactly the steady state the training loop reaches.
    n_pipe = 50
    t0 = time.time()
    for i in range(n_pipe):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(
            params, state, opt_state, inputs, jnp.float32(1.0), sub)
    jax.block_until_ready(loss)
    pipe_dt = (time.time() - t0) / n_pipe
    log(f"pipelined: {pipe_dt*1000:.1f}ms/step over {n_pipe} steps")
    seqs_per_sec = B / pipe_dt

    # MFU vs v5e bf16 MXU peak (197 TFLOP/s). XLA's flops estimate
    # counts optimized-HLO FLOPs, so this is a lower bound on silicon
    # utilization but an honest yardstick for step-time progress.
    V5E_PEAK_FLOPS = 197e12
    mfu_pct = tflops = None
    if est_flops > 0:
        tflops = est_flops / pipe_dt / 1e12
        mfu_pct = 100.0 * est_flops / pipe_dt / V5E_PEAK_FLOPS
        log(f"est FLOPs/step: {est_flops / 1e9:.1f} GF | achieved "
            f"{tflops:.2f} TFLOP/s | MFU {mfu_pct:.2f}% of v5e bf16 "
            f"peak (197 TFLOP/s)")

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "baseline_result.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("seqs_per_sec"):
            vs_baseline = seqs_per_sec / base["seqs_per_sec"]

    out = {
        "metric": "weizmann_bfvi_train_seqs_per_sec_per_chip",
        "value": round(seqs_per_sec, 3),
        "unit": "seqs/sec",
        "vs_baseline": (round(vs_baseline, 2)
                        if vs_baseline is not None else None),
    }
    if mfu_pct is not None:
        out["est_tflops_per_sec"] = round(tflops, 3)
        out["mfu_pct_v5e_bf16"] = round(mfu_pct, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
