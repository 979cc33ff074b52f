"""A/B bench: full-scan Pallas kernel vs lax.scan in the Weizmann-shaped
BFVI training step (run on TPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_dmm_tpu.models.dmm import MultiDMM
    from multimodal_dmm_tpu.models.codecs import (image_encoder_codec,
                                                  image_decoder_codec)

    T, B, Z = 25, 25, 256
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
    rec_mults = {"video": 1.0, "person": 10.0, "action": 10.0}

    def bench(use_kernel):
        model = MultiDMM(
            ["video", "person", "action"], [(3, 64, 64), 9, 10],
            dists=["Bernoulli", "Categorical", "Categorical"],
            encoders={"video": image_encoder_codec(Z, gauss_out=True)},
            decoders={"video": image_decoder_codec(Z)},
            z_dim=Z, h_dim=Z, use_scan_kernel=use_kernel)
        params, state = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(5e-4)
        ost = opt.init(params)

        def f(p, s, o, key):
            def loss_fn(pp):
                loss, ns = model.step(pp, s, inputs, mask, 1.0,
                                      rec_mults, key, targets=inputs,
                                      train=True)
                return loss / (T * B), (loss, ns)

            g, (loss, ns) = jax.grad(loss_fn, has_aux=True)(p)
            u, no = opt.update(g, o, p)
            return optax.apply_updates(p, u), ns, no, loss

        f = jax.jit(f)
        p, s, o = params, state, ost
        t0 = time.time()
        p, s, o, loss = f(p, s, o, jax.random.PRNGKey(1))
        jax.block_until_ready(loss)
        compile_t = time.time() - t0
        ts = []
        for i in range(5):
            t0 = time.time()
            p, s, o, loss = f(p, s, o, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(loss)
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"use_scan_kernel={use_kernel}: {med*1000:.1f}ms "
              f"(compile {compile_t:.0f}s, loss {float(loss):.0f})",
              flush=True)
        return med

    t_scan = bench(False)
    t_kern = bench(True)
    print(f"speedup: {t_scan / t_kern:.2f}x", flush=True)


if __name__ == "__main__":
    main()
