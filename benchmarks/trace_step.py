"""Capture a jax.profiler trace of the bench train step and attribute
device time per op category — the honest roofline VERDICT r1 asked for.

Runs a few steps of the full fused objective (forward-only and
grad+Adam) under the profiler, then parses the emitted
.trace.json.gz and aggregates device-track op durations into buckets
(conv, matmul/dot, rng, scan overhead, elementwise, copies, infeed...).

Usage: python benchmarks/trace_step.py [--bf16] [--merge] [--out DIR]
Prints a JSON summary and a top-20 op table to stderr.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np


def build_step(bf16, merge, native=True):
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_dmm_tpu.models.dmm import MultiDMM
    from multimodal_dmm_tpu.models.codecs import (image_encoder_codec,
                                                  image_decoder_codec)

    T, B, Z = 25, 25, 256
    dt = jnp.bfloat16 if bf16 else None
    model = MultiDMM(
        ["video", "person", "action"],
        [(3, 64, 64), 9, 10],
        dists=["Bernoulli", "Categorical", "Categorical"],
        encoders={"video": image_encoder_codec(Z, gauss_out=True,
                                               compute_dtype=dt)},
        decoders={"video": image_decoder_codec(Z, compute_dtype=dt)},
        z_dim=Z, h_dim=Z)
    params, state = model.init(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.add_decayed_weights(1e-4),
                            optax.adam(5e-4))
    opt_state = optimizer.init(params)
    rec_mults = {"video": 1.0, "person": 10.0, "action": 10.0}

    rng = np.random.RandomState(0)
    video = rng.rand(T, B, 3, 64, 64).astype(np.float32)
    video[rng.rand(T, B) < 0.1] = np.nan
    if native:
        # Codec-native batch layout (bench/device-loader default):
        # video stored channels-last, zero edge transposes in the step.
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

    def train_step(params, state, opt_state, key):
        def loss_fn(p):
            loss, new_state = model.step(
                p, state, inputs, mask, jnp.float32(1.0), rec_mults,
                key, targets=inputs, train=True,
                merge_mode_scans=merge, native_mods=native_mods)
            return loss / (T * B), (loss, new_state)

        grads, (loss, new_state) = jax.grad(loss_fn, has_aux=True)(
            params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state,
                new_opt, loss)

    step = jax.jit(train_step)
    return step, (params, state, opt_state)


CATS = [
    ("conv", ("conv", "transpose-conv")),
    ("matmul", ("dot", "einsum", "matmul")),
    ("rng", ("rng", "threefry", "philox", "bit-generator", "erf-inv")),
    ("scan_loop", ("while", "condition", "body")),
    ("copy_layout", ("copy", "transpose", "bitcast", "reshape",
                     "broadcast", "concatenate", "slice", "pad",
                     "gather", "scatter", "dynamic")),
    ("reduce", ("reduce", "sum", "all-reduce")),
    ("elementwise", ("fusion", "add", "multiply", "subtract", "divide",
                     "exponential", "log", "tanh", "logistic",
                     "maximum", "minimum", "compare", "select",
                     "convert", "sqrt", "rsqrt", "power", "abs",
                     "negate", "and", "or", "not", "sign", "floor")),
]


def categorize(name):
    n = name.lower()
    for cat, keys in CATS:
        for k in keys:
            if k in n:
                return cat
    return "other"


def parse_trace(logdir):
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        return None
    path = sorted(paths)[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Identify device-side tracks (TPU op events carry 'dur' and live
    # on pids whose process_name mentions the device).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()
                or "xla" in n.lower()}
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # Skip container spans (whole-program events and bare track
        # ids) that would double-count their children.
        if name.startswith("jit_") or name.isdigit():
            continue
        us = float(e["dur"])
        per_op[name] += us
        per_cat[categorize(name)] += us
        total += us
    return {"total_us": total, "per_cat": dict(per_cat),
            "top_ops": sorted(per_op.items(), key=lambda kv: -kv[1])[:25],
            "trace_path": path}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--edge", action="store_true",
                    help="channel-first batch layout (default: the "
                         "bench/device-loader codec-native layout)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/step_trace")
    args = ap.parse_args()

    import jax

    step, (params, state, opt_state) = build_step(args.bf16, args.merge,
                                                  native=not args.edge)
    key = jax.random.PRNGKey(1)
    # Warm up / compile outside the trace.
    params, state, opt_state, loss = step(params, state, opt_state, key)
    jax.block_until_ready(loss)
    print("compiled; tracing...", file=sys.stderr, flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = step(params, state,
                                                  opt_state, sub)
        jax.block_until_ready(loss)

    summary = parse_trace(args.out)
    if summary is None:
        print(json.dumps({"error": "no trace found", "dir": args.out}))
        return
    n = args.steps
    cats = {k: round(v / n / 1000, 3)
            for k, v in sorted(summary["per_cat"].items(),
                               key=lambda kv: -kv[1])}
    print("top ops (us, total over {} steps):".format(n),
          file=sys.stderr)
    for name, us in summary["top_ops"]:
        print(f"  {us:12.0f}  {name[:90]}", file=sys.stderr)
    print(json.dumps({
        "per_step_ms_by_category": cats,
        "total_device_ms_per_step": round(
            summary["total_us"] / n / 1000, 3),
        "dtype": "bf16" if args.bf16 else "f32",
        "merge": args.merge,
        "trace": summary["trace_path"],
    }))


if __name__ == "__main__":
    main()
