"""Full-scan Pallas kernel for the BFVI filtering pass.

The filtering loop (models/dmm.py z_filter) is a chain of small
per-timestep ops: GTF transition (6 small matmuls) → masked PoE →
reparameterized particle sampling. Executed as a `lax.scan`, every step
round-trips its state through XLA op boundaries; this module instead
runs the ENTIRE T-step loop inside one Pallas kernel with the particle
state and GTF weights resident in VMEM.

Conventions (one direction; callers pre-flip time for backward passes):

- obs_mean/obs_std: (T, M, B, D) expert parameters, obs_mask: (T, M, B)
- glb_mean/glb_std: (B, D) global prior (step 0 uses it directly)
- gtf: dict of the 6 linear layers (w: (in, out), b: (out,))
- eps: (T, K, B, D) pre-drawn noise; pass zeros for MAP paths —
  z = infer_mean exactly. All sampling modes reduce to eps content.

Returns (prior_mean, prior_std, infer_mean, infer_std, samples, z_traj)
with shapes (T, B, D) ×5 and (T, K, B, D).

`bfvi_scan_ref` is the pure-jnp reference (always used under autodiff
until the backward kernel lands; also the test oracle).
"""

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _gtf(gtf, z, min_std):
    """GaussianGTF on (..., D) inputs (models/nn.py gtf_apply)."""
    gate = jax.nn.sigmoid(
        jax.nn.relu(z @ gtf["gate_1"]["w"] + gtf["gate_1"]["b"])
        @ gtf["gate_2"]["w"] + gtf["gate_2"]["b"])
    z_lin = z @ gtf["z_lin"]["w"] + gtf["z_lin"]["b"]
    z_non = (jax.nn.relu(z @ gtf["nonlin_1"]["w"] + gtf["nonlin_1"]["b"])
             @ gtf["nonlin_2"]["w"] + gtf["nonlin_2"]["b"])
    q_std = jax.nn.softplus(
        z_non @ gtf["z_to_std"]["w"] + gtf["z_to_std"]["b"]) + min_std
    q_mean = (1 - gate) * z_lin + gate * z_non
    return q_mean, q_std


def _poe2(m1, s1, m2, s2):
    """Unmasked 2-expert PoE (both experts positive-std)."""
    p1 = 1.0 / (s1 * s1 + _EPS)
    p2 = 1.0 / (s2 * s2 + _EPS)
    denom = p1 + p2
    mean = (m1 * p1 + m2 * p2) / denom
    return mean, jax.lax.rsqrt(denom)


def _moe(mean, std):
    """Moment-matched mixture over axis 0 (K particles)."""
    mu = jnp.mean(mean, axis=0)
    var = (jnp.mean(std * std, axis=0)
           + jnp.mean(mean * mean, axis=0) - mu * mu)
    return mu, jnp.sqrt(jnp.maximum(var, 0.0))


def _poe_obs(prior_mean, prior_std, obs_mean, obs_std, obs_mask):
    """PoE of [positive-std prior; M signed-std masked obs experts].

    obs_*: (M, B, D); obs_mask: (M, B)."""
    prec_p = 1.0 / (prior_std * prior_std + _EPS)
    num = prior_mean * prec_p
    denom = prec_p
    n_exp = obs_mean.shape[0]
    for m in range(n_exp):
        mk = obs_mask[m][..., None]
        var = obs_std[m] * obs_std[m] + _EPS
        prec = jnp.where(mk > 0, jnp.sign(obs_std[m]) / var, 0.0)
        num = num + jnp.where(mk > 0, obs_mean[m] * prec, 0.0)
        denom = denom + prec
    low = denom < 1e-6  # ops/poe.py PREC_FLOOR semantics
    safe = jnp.where(low, 1.0, denom)
    mean = jnp.where(low, 0.0, num / safe)
    std = jnp.where(low, 1e3, jax.lax.rsqrt(safe))
    return mean, std


def bfvi_scan_ref(obs_mean, obs_std, obs_mask, glb_mean, glb_std, gtf,
                  eps, min_std):
    """Pure-jnp reference of the fused filtering loop."""
    t_max, n_exp, b_dim, d = obs_mean.shape
    k = eps.shape[1]

    def cell(z_prev, xs):
        om, os_, omask, ep, t = xs
        q_mean, q_std = _gtf(gtf, z_prev, min_std)
        pp_mean, pp_std = _poe2(jnp.broadcast_to(glb_mean, q_mean.shape),
                                jnp.broadcast_to(glb_std, q_std.shape),
                                q_mean, q_std)
        pm, ps = _moe(pp_mean, pp_std)
        prior_mean = jnp.where(t == 0, glb_mean, pm)
        prior_std = jnp.where(t == 0, glb_std, ps)
        infer_mean, infer_std = _poe_obs(prior_mean, prior_std,
                                         om, os_, omask)
        z = infer_mean[None] + ep * infer_std[None]
        return z, (prior_mean, prior_std, infer_mean, infer_std,
                   jnp.mean(z, axis=0), z)

    z0 = jnp.zeros((k, b_dim, d), obs_mean.dtype)
    _, outs = jax.lax.scan(
        cell, z0,
        (obs_mean, obs_std, obs_mask.astype(jnp.float32), eps,
         jnp.arange(t_max)))
    return outs


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(obs_mean_ref, obs_std_ref, obs_mask_ref,
                glb_mean_ref, glb_std_ref,
                g1w, g1b, g2w, g2b, lw, lb, n1w, n1b, n2w, n2b, sw, sb,
                eps_ref,
                prior_mean_ref, prior_std_ref, infer_mean_ref,
                infer_std_ref, samples_ref, z_traj_ref,
                z_scr, *, t_max, n_exp, k, min_std):
    glb_mean = glb_mean_ref[:]
    glb_std = glb_std_ref[:]
    z_scr[:] = jnp.zeros(z_scr.shape, z_scr.dtype)

    def body(t, _):
        z_prev = z_scr[:]                     # (K, TB, D)
        kk, tb, d = z_prev.shape
        zf = z_prev.reshape(kk * tb, d)
        gate = jax.nn.sigmoid(
            jax.nn.relu(
                jnp.dot(zf, g1w[:],
                        preferred_element_type=jnp.float32) + g1b[:])
            @ g2w[:] + g2b[:])
        z_lin = jnp.dot(zf, lw[:],
                        preferred_element_type=jnp.float32) + lb[:]
        z_non = (jax.nn.relu(
            jnp.dot(zf, n1w[:],
                    preferred_element_type=jnp.float32) + n1b[:])
            @ n2w[:] + n2b[:])
        q_std = jax.nn.softplus(
            jnp.dot(z_non, sw[:],
                    preferred_element_type=jnp.float32) + sb[:]) + min_std
        q_mean = (1 - gate) * z_lin + gate * z_non
        q_mean = q_mean.reshape(kk, tb, d)
        q_std = q_std.reshape(kk, tb, d)
        # PoE(glb, gtf) per particle
        p1 = 1.0 / (glb_std * glb_std + _EPS)
        p2 = 1.0 / (q_std * q_std + _EPS)
        denom2 = p1[None] + p2
        pp_mean = (glb_mean[None] * p1[None] + q_mean * p2) / denom2
        pp_std = jax.lax.rsqrt(denom2)
        # MoE over K
        mu = jnp.mean(pp_mean, axis=0)
        var = (jnp.mean(pp_std * pp_std, axis=0)
               + jnp.mean(pp_mean * pp_mean, axis=0) - mu * mu)
        ps = jnp.sqrt(jnp.maximum(var, 0.0))
        first = t == 0
        prior_mean = jnp.where(first, glb_mean, mu)
        prior_std = jnp.where(first, glb_std, ps)
        # PoE with obs experts
        prec_p = 1.0 / (prior_std * prior_std + _EPS)
        num = prior_mean * prec_p
        den = prec_p
        for m in range(n_exp):
            mk = obs_mask_ref[t, m]           # (TB, 1)
            om = obs_mean_ref[t, m]
            os_ = obs_std_ref[t, m]
            var_o = os_ * os_ + _EPS
            prec = jnp.where(mk > 0, jnp.sign(os_) / var_o, 0.0)
            num = num + jnp.where(mk > 0, om * prec, 0.0)
            den = den + prec
        low = den < 1e-6  # ops/poe.py PREC_FLOOR semantics
        safe_den = jnp.where(low, 1.0, den)
        infer_mean = jnp.where(low, 0.0, num / safe_den)
        infer_std = jnp.where(low, 1e3, jax.lax.rsqrt(safe_den))
        z = infer_mean[None] + eps_ref[t] * infer_std[None]
        z_scr[:] = z
        prior_mean_ref[t] = prior_mean
        prior_std_ref[t] = prior_std
        infer_mean_ref[t] = infer_mean
        infer_std_ref[t] = infer_std
        samples_ref[t] = jnp.mean(z, axis=0)
        z_traj_ref[t] = z
        return 0

    jax.lax.fori_loop(0, t_max, body, 0)


def _compiler_params(pltpu):
    # The (T, K, TB, D) noise/trajectory blocks exceed the default 16 MB
    # scoped-VMEM budget once Pallas double-buffers them; raise the cap
    # (v5e has 128 MB of VMEM per core).
    try:
        return pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    except TypeError:
        return None


def bfvi_scan_pallas(obs_mean, obs_std, obs_mask, glb_mean, glb_std,
                     gtf, eps, min_std, tile_b=None, interpret=False):
    """Pallas execution of the fused filtering loop (forward only)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_max, n_exp, b_dim, d = obs_mean.shape
    k = eps.shape[1]
    h = gtf["gate_1"]["w"].shape[1]

    if tile_b is None:
        # Budget EVERY per-batch-row block the kernel touches, not just
        # the eps/z_traj pair: the (T, M, TB, D) expert inputs and the
        # six (T, TB, D)-shaped outputs are the same order of magnitude,
        # and under jvp the outputs are additionally stack-allocated in
        # scoped VMEM (the round-3 sizer ignored them and OOM'd at the
        # bench shapes: 91.5 MB requested vs the 64 MB cap). Count f32
        # words per batch row, double for Pallas double-buffering.
        budget = 20 * 1024 * 1024
        per_b = (2 * t_max * n_exp * d      # obs mean/std blocks
                 + t_max * n_exp            # mask block
                 + 2 * t_max * k * d        # eps in + z_traj out
                 + 5 * t_max * d            # the five (T, TB, D) outs
                 + 2 * d                    # global prior rows
                 + 3 * k * d) * 4 * 2       # state scratch; x2 dbl-buf
        tile_b = max(8, min(b_dim, budget // max(per_b, 1)))
        tile_b = max(8, (tile_b // 8) * 8)
    pad = (-b_dim) % tile_b
    if pad:
        pad2 = ((0, 0), (0, 0), (0, pad), (0, 0))
        obs_mean = jnp.pad(obs_mean, pad2)
        obs_std = jnp.pad(obs_std, pad2, constant_values=1.0)
        obs_mask = jnp.pad(obs_mask, ((0, 0), (0, 0), (0, pad)))
        glb_mean = jnp.pad(glb_mean, ((0, pad), (0, 0)))
        glb_std = jnp.pad(glb_std, ((0, pad), (0, 0)),
                          constant_values=1.0)
        eps = jnp.pad(eps, ((0, 0), (0, 0), (0, pad), (0, 0)))
    bp = b_dim + pad
    grid = (bp // tile_b,)
    maskf = obs_mask.astype(jnp.float32)[..., None]  # (T, M, B, 1)

    wb = []
    for name in ("gate_1", "gate_2", "z_lin", "nonlin_1", "nonlin_2",
                 "z_to_std"):
        wb += [gtf[name]["w"], gtf[name]["b"].reshape(1, -1)]

    def w_spec(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))

    out_shape = tuple(
        [jax.ShapeDtypeStruct((t_max, bp, d), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((t_max, k, bp, d), jnp.float32)])
    out_specs = tuple(
        [pl.BlockSpec((t_max, tile_b, d), lambda i: (0, i, 0))] * 5
        + [pl.BlockSpec((t_max, k, tile_b, d), lambda i: (0, 0, i, 0))])

    kernel = functools.partial(_fwd_kernel, t_max=t_max, n_exp=n_exp,
                               k=k, min_std=min_std)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_max, n_exp, tile_b, d),
                         lambda i: (0, 0, i, 0)),
            pl.BlockSpec((t_max, n_exp, tile_b, d),
                         lambda i: (0, 0, i, 0)),
            pl.BlockSpec((t_max, n_exp, tile_b, 1),
                         lambda i: (0, 0, i, 0)),
            pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
        ] + [w_spec(a) for a in wb] + [
            pl.BlockSpec((t_max, k, tile_b, d), lambda i: (0, 0, i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((k, tile_b, d), jnp.float32)],
        compiler_params=_compiler_params(pltpu),
        interpret=interpret,
    )(obs_mean, obs_std, maskf, glb_mean, glb_std, *wb, eps)
    if pad:
        outs = tuple(o[:, :b_dim] if o.ndim == 3 else o[:, :, :b_dim]
                     for o in outs)
    return outs


# ---------------------------------------------------------------------------
# Pallas backward kernel (hand-derived VJP, rematerialized GTF)
# ---------------------------------------------------------------------------

def _bwd_kernel(obs_mean_ref, obs_std_ref, obs_mask_ref,
                glb_mean_ref, glb_std_ref,
                g1w, g1b, g2w, g2b, lw, lb, n1w, n1b, n2w, n2b, sw, sb,
                eps_ref, z_traj_ref,
                prior_mean_ref, prior_std_ref,
                g_pm_ref, g_ps_ref, g_im_ref, g_is_ref, g_smp_ref,
                d_obs_mean_ref, d_obs_std_ref,
                d_glb_mean_ref, d_glb_std_ref,
                dg1w, dg1b, dg2w, dg2b, dlw, dlb,
                dn1w, dn1b, dn2w, dn2b, dsw, dsb,
                gz_scr, dglbm_scr, dglbs_scr,
                *, t_max, n_exp, k, min_std):
    glb_mean = glb_mean_ref[:]
    glb_std = glb_std_ref[:]
    p1 = 1.0 / (glb_std * glb_std + _EPS)

    gz_scr[:] = jnp.zeros(gz_scr.shape, gz_scr.dtype)
    dglbm_scr[:] = jnp.zeros(dglbm_scr.shape, dglbm_scr.dtype)
    dglbs_scr[:] = jnp.zeros(dglbs_scr.shape, dglbs_scr.dtype)
    for r in (dg1w, dg1b, dg2w, dg2b, dlw, dlb, dn1w, dn1b, dn2w,
              dn2b, dsw, dsb):
        r[:] = jnp.zeros(r.shape, r.dtype)

    def body(i, _):
        t = t_max - 1 - i
        first = t == 0
        z_t = z_traj_ref[t]                      # (K, TB, D)
        kk, tb, d = z_t.shape
        prior_m = prior_mean_ref[t]
        prior_s = prior_std_ref[t]

        # ---- recompute the obs-PoE pieces -----------------------------
        var_p = prior_s * prior_s + _EPS
        prec_p = 1.0 / var_p
        num = prior_m * prec_p
        den = prec_p
        for m in range(n_exp):
            mk = obs_mask_ref[t, m]
            os_ = obs_std_ref[t, m]
            var_o = os_ * os_ + _EPS
            prec = jnp.where(mk > 0, jnp.sign(os_) / var_o, 0.0)
            num = num + jnp.where(mk > 0, obs_mean_ref[t, m] * prec,
                                  0.0)
            den = den + prec
        low = den < 1e-6
        safe_den = jnp.where(low, 1.0, den)
        im = jnp.where(low, 0.0, num / safe_den)
        is_ = jnp.where(low, 1e3, jax.lax.rsqrt(safe_den))

        # ---- cotangents into z_t → infer params -----------------------
        gz_tot = gz_scr[:] + g_smp_ref[t][None] / kk
        gim = g_im_ref[t] + jnp.sum(gz_tot, axis=0)
        gis = g_is_ref[t] + jnp.sum(gz_tot * eps_ref[t], axis=0)

        # ---- obs-PoE VJP ----------------------------------------------
        d_num = jnp.where(low, 0.0, gim / safe_den)
        d_den = jnp.where(
            low, 0.0, -gim * num / (safe_den * safe_den)
            - 0.5 * gis * safe_den ** -1.5)
        for m in range(n_exp):
            mk = obs_mask_ref[t, m]
            om = obs_mean_ref[t, m]
            os_ = obs_std_ref[t, m]
            var_o = os_ * os_ + _EPS
            prec = jnp.sign(os_) / var_o
            d_prec = jnp.where(mk > 0, d_num * om + d_den, 0.0)
            d_obs_mean_ref[t, m] = jnp.where(mk > 0, d_num * prec, 0.0)
            d_obs_std_ref[t, m] = d_prec * (
                -2.0 * jnp.sign(os_) * os_ / (var_o * var_o))
        d_prior_m = d_num * prec_p + g_pm_ref[t]
        d_prec_pp = d_num * prior_m + d_den
        d_prior_s = (d_prec_pp * (-2.0 * prior_s / (var_p * var_p))
                     + g_ps_ref[t])

        # ---- prior select: t==0 → global prior ------------------------
        dglbm_scr[:] = dglbm_scr[:] + jnp.where(first, d_prior_m, 0.0)
        dglbs_scr[:] = dglbs_scr[:] + jnp.where(first, d_prior_s, 0.0)
        d_mu = jnp.where(first, 0.0, d_prior_m)
        d_ps = jnp.where(first, 0.0, d_prior_s)

        # ---- recompute GTF + PoE2 + MoE on z_{t-1} ---------------------
        z_prev = jnp.where(first, jnp.zeros_like(z_t),
                           z_traj_ref[jnp.maximum(t - 1, 0)])
        zf = z_prev.reshape(kk * tb, d)
        a1 = jnp.dot(zf, g1w[:],
                     preferred_element_type=jnp.float32) + g1b[:]
        h1 = jax.nn.relu(a1)
        a2 = jnp.dot(h1, g2w[:],
                     preferred_element_type=jnp.float32) + g2b[:]
        gate = jax.nn.sigmoid(a2)
        zlin = jnp.dot(zf, lw[:],
                       preferred_element_type=jnp.float32) + lb[:]
        b1 = jnp.dot(zf, n1w[:],
                     preferred_element_type=jnp.float32) + n1b[:]
        hn = jax.nn.relu(b1)
        znon = jnp.dot(hn, n2w[:],
                       preferred_element_type=jnp.float32) + n2b[:]
        sraw = jnp.dot(znon, sw[:],
                       preferred_element_type=jnp.float32) + sb[:]
        q_std = jax.nn.softplus(sraw) + min_std
        q_mean = (1 - gate) * zlin + gate * znon
        q_mean3 = q_mean.reshape(kk, tb, d)
        q_std3 = q_std.reshape(kk, tb, d)
        p2 = 1.0 / (q_std3 * q_std3 + _EPS)
        den2 = p1[None] + p2
        num2 = glb_mean[None] * p1[None] + q_mean3 * p2
        ppm = num2 / den2
        pps = jax.lax.rsqrt(den2)
        mu = jnp.mean(ppm, axis=0)

        # ---- MoE VJP ---------------------------------------------------
        var = (jnp.mean(pps * pps, axis=0)
               + jnp.mean(ppm * ppm, axis=0) - mu * mu)
        ps_pos = var > 0
        ps_val = jnp.sqrt(jnp.maximum(var, _EPS))
        d_var = jnp.where(ps_pos, d_ps / (2.0 * ps_val), 0.0)
        d_ppm = (d_mu[None] / kk
                 + d_var[None] * 2.0 * (ppm - mu[None]) / kk)
        d_pps = d_var[None] * 2.0 * pps / kk

        # ---- PoE2 VJP ---------------------------------------------------
        d_num2 = d_ppm / den2
        d_den2 = (-d_ppm * num2 / (den2 * den2)
                  - 0.5 * d_pps * den2 ** -1.5)
        d_qm3 = d_num2 * p2
        d_p2 = d_num2 * q_mean3 + d_den2
        d_qs3 = d_p2 * (-2.0 * q_std3 / ((q_std3 * q_std3 + _EPS) ** 2))
        d_p1 = d_num2 * glb_mean[None] + d_den2
        dglbm_scr[:] = dglbm_scr[:] + jnp.where(
            first, 0.0, jnp.sum(d_num2 * p1[None], axis=0))
        dglbs_scr[:] = dglbs_scr[:] + jnp.where(
            first, 0.0,
            jnp.sum(d_p1, axis=0)
            * (-2.0 * glb_std / ((glb_std * glb_std + _EPS) ** 2)))

        # ---- GTF VJP (flattened) ----------------------------------------
        d_qmean = d_qm3.reshape(kk * tb, d)
        d_qstd = d_qs3.reshape(kk * tb, d)
        d_sraw = d_qstd * jax.nn.sigmoid(sraw)
        d_znon = (jnp.dot(d_sraw, sw[:].T,
                          preferred_element_type=jnp.float32)
                  + d_qmean * gate)
        d_gate = d_qmean * (znon - zlin)
        d_zlin = d_qmean * (1 - gate)
        d_a2 = d_gate * gate * (1 - gate)
        d_h1 = jnp.dot(d_a2, g2w[:].T,
                       preferred_element_type=jnp.float32)
        d_a1 = d_h1 * (a1 > 0)
        d_hn = jnp.dot(d_znon, n2w[:].T,
                       preferred_element_type=jnp.float32)
        d_b1 = d_hn * (b1 > 0)
        d_zf = (jnp.dot(d_a1, g1w[:].T,
                        preferred_element_type=jnp.float32)
                + jnp.dot(d_zlin, lw[:].T,
                          preferred_element_type=jnp.float32)
                + jnp.dot(d_b1, n1w[:].T,
                          preferred_element_type=jnp.float32))

        # weight grads (zero at t==0 because d_mu/d_ps are zero there,
        # which zeroes every d_* above)
        dsw[:] = dsw[:] + jnp.dot(znon.T, d_sraw,
                                  preferred_element_type=jnp.float32)
        dsb[:] = dsb[:] + jnp.sum(d_sraw, axis=0, keepdims=True)
        dn2w[:] = dn2w[:] + jnp.dot(hn.T, d_znon,
                                    preferred_element_type=jnp.float32)
        dn2b[:] = dn2b[:] + jnp.sum(d_znon, axis=0, keepdims=True)
        dn1w[:] = dn1w[:] + jnp.dot(zf.T, d_b1,
                                    preferred_element_type=jnp.float32)
        dn1b[:] = dn1b[:] + jnp.sum(d_b1, axis=0, keepdims=True)
        dg2w[:] = dg2w[:] + jnp.dot(h1.T, d_a2,
                                    preferred_element_type=jnp.float32)
        dg2b[:] = dg2b[:] + jnp.sum(d_a2, axis=0, keepdims=True)
        dg1w[:] = dg1w[:] + jnp.dot(zf.T, d_a1,
                                    preferred_element_type=jnp.float32)
        dg1b[:] = dg1b[:] + jnp.sum(d_a1, axis=0, keepdims=True)
        dlw[:] = dlw[:] + jnp.dot(zf.T, d_zlin,
                                  preferred_element_type=jnp.float32)
        dlb[:] = dlb[:] + jnp.sum(d_zlin, axis=0, keepdims=True)

        gz_scr[:] = jnp.where(first, 0.0, d_zf.reshape(kk, tb, d))
        return 0

    jax.lax.fori_loop(0, t_max, body, 0)
    d_glb_mean_ref[:] = dglbm_scr[:]
    d_glb_std_ref[:] = dglbs_scr[:]


def _gtf_names():
    return ("gate_1", "gate_2", "z_lin", "nonlin_1", "nonlin_2",
            "z_to_std")


def bfvi_scan_pallas_bwd(res, cots, min_std, tile_b, interpret):
    """Run the backward kernel; returns grads matching bfvi_scan args."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (obs_mean, obs_std, obs_mask, glb_mean, glb_std, gtf, eps,
     z_traj, prior_mean, prior_std) = res
    g_pm, g_ps, g_im, g_is, g_smp = cots
    t_max, n_exp, b_dim, d = obs_mean.shape
    k = eps.shape[1]
    h = gtf["gate_1"]["w"].shape[1]

    if tile_b is None:
        budget = 9 * 1024 * 1024
        per_b = (2 * t_max * k * d + 6 * k * d) * 4
        tile_b = max(8, min(b_dim, budget // max(per_b, 1)))
        tile_b = max(8, (tile_b // 8) * 8)
    pad = (-b_dim) % tile_b
    if pad:
        pad2 = ((0, 0), (0, 0), (0, pad), (0, 0))
        obs_mean = jnp.pad(obs_mean, pad2)
        obs_std = jnp.pad(obs_std, pad2, constant_values=1.0)
        obs_mask = jnp.pad(obs_mask, ((0, 0), (0, 0), (0, pad)))
        glb_mean = jnp.pad(glb_mean, ((0, pad), (0, 0)))
        glb_std = jnp.pad(glb_std, ((0, pad), (0, 0)),
                          constant_values=1.0)
        padk = ((0, 0), (0, 0), (0, pad), (0, 0))
        eps = jnp.pad(eps, padk)
        z_traj = jnp.pad(z_traj, padk)
        pad3 = ((0, 0), (0, pad), (0, 0))
        prior_mean = jnp.pad(prior_mean, pad3)
        prior_std = jnp.pad(prior_std, pad3, constant_values=1.0)
        g_pm = jnp.pad(g_pm, pad3)
        g_ps = jnp.pad(g_ps, pad3)
        g_im = jnp.pad(g_im, pad3)
        g_is = jnp.pad(g_is, pad3)
        g_smp = jnp.pad(g_smp, pad3)
    bp = b_dim + pad
    n_tiles = bp // tile_b
    grid = (n_tiles,)
    maskf = obs_mask.astype(jnp.float32)[..., None]

    wb = []
    for name in _gtf_names():
        wb += [gtf[name]["w"], gtf[name]["b"].reshape(1, -1)]

    def w_spec(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))

    def tmd_spec():
        return pl.BlockSpec((t_max, n_exp, tile_b, d),
                            lambda i: (0, 0, i, 0))

    def tbd_spec():
        return pl.BlockSpec((t_max, tile_b, d), lambda i: (0, i, 0))

    def tkd_spec():
        return pl.BlockSpec((t_max, k, tile_b, d),
                            lambda i: (0, 0, i, 0))

    dW_shapes, dW_specs = [], []
    for a in wb:
        dW_shapes.append(jax.ShapeDtypeStruct((n_tiles,) + a.shape,
                                              jnp.float32))
        dW_specs.append(pl.BlockSpec(
            (1,) + a.shape,
            (lambda i: (i, 0, 0))))

    out_shape = tuple(
        [jax.ShapeDtypeStruct((t_max, n_exp, bp, d), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((bp, d), jnp.float32)] * 2
        + dW_shapes)
    out_specs = tuple(
        [tmd_spec(), tmd_spec(),
         pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
         pl.BlockSpec((tile_b, d), lambda i: (i, 0))]
        + dW_specs)

    kernel = functools.partial(_bwd_kernel, t_max=t_max, n_exp=n_exp,
                               k=k, min_std=min_std)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tmd_spec(), tmd_spec(),
            pl.BlockSpec((t_max, n_exp, tile_b, 1),
                         lambda i: (0, 0, i, 0)),
            pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
        ] + [w_spec(a) for a in wb] + [
            tkd_spec(), tkd_spec(), tbd_spec(), tbd_spec(),
            tbd_spec(), tbd_spec(), tbd_spec(), tbd_spec(),
            tbd_spec(),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((k, tile_b, d), jnp.float32),
            pltpu.VMEM((tile_b, d), jnp.float32),
            pltpu.VMEM((tile_b, d), jnp.float32),
        ],
        compiler_params=_compiler_params(pltpu),
        interpret=interpret,
    )(obs_mean, obs_std, maskf, glb_mean, glb_std, *wb,
      eps, z_traj, prior_mean, prior_std,
      g_pm, g_ps, g_im, g_is, g_smp)

    d_obs_mean, d_obs_std, d_glb_mean, d_glb_std = outs[:4]
    dW = outs[4:]
    if pad:
        d_obs_mean = d_obs_mean[:, :, :b_dim]
        d_obs_std = d_obs_std[:, :, :b_dim]
        d_glb_mean = d_glb_mean[:b_dim]
        d_glb_std = d_glb_std[:b_dim]
    d_gtf = {}
    for idx, name in enumerate(_gtf_names()):
        dw = jnp.sum(dW[2 * idx], axis=0)
        db = jnp.sum(dW[2 * idx + 1], axis=(0, 1))
        d_gtf[name] = {"w": dw, "b": db}
    return d_obs_mean, d_obs_std, d_glb_mean, d_glb_std, d_gtf


# ---------------------------------------------------------------------------
# Differentiable public entry (custom VJP)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def bfvi_scan(obs_mean, obs_std, obs_mask, glb_mean, glb_std, gtf, eps,
              min_std, tile_b=None, interpret=False):
    """Fused BFVI filtering loop: Pallas forward + hand-derived Pallas
    backward. Returns (prior_mean, prior_std, infer_mean, infer_std,
    samples). obs_mask and eps are treated as constants by the VJP."""
    outs = bfvi_scan_pallas(obs_mean, obs_std, obs_mask, glb_mean,
                            glb_std, gtf, eps, min_std, tile_b,
                            interpret)
    return outs[:5]


def _bfvi_scan_fwd(obs_mean, obs_std, obs_mask, glb_mean, glb_std, gtf,
                   eps, min_std, tile_b, interpret):
    outs = bfvi_scan_pallas(obs_mean, obs_std, obs_mask, glb_mean,
                            glb_std, gtf, eps, min_std, tile_b,
                            interpret)
    prior_mean, prior_std = outs[0], outs[1]
    res = (obs_mean, obs_std, obs_mask, glb_mean, glb_std, gtf, eps,
           outs[5], prior_mean, prior_std)
    return outs[:5], res


def _bfvi_scan_bwd(min_std, tile_b, interpret, res, cots):
    d_obs_mean, d_obs_std, d_glb_mean, d_glb_std, d_gtf = \
        bfvi_scan_pallas_bwd(res, cots, min_std, tile_b, interpret)
    obs_mask, eps = res[2], res[6]
    return (d_obs_mean, d_obs_std, jnp.zeros_like(obs_mask,
                                                  dtype=jnp.float32),
            d_glb_mean, d_glb_std, d_gtf, jnp.zeros_like(eps))


bfvi_scan.defvjp(_bfvi_scan_fwd, _bfvi_scan_bwd)
