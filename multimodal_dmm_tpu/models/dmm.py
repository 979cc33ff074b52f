"""Multimodal Deep Markov Model with BFVI, as `jax.lax.scan` programs.

TPU-native re-design of /root/reference/models/dmm.py (MultiDMM):

- the two sequential filtering loops (`z_filter`, dmm.py:319-412) become
  `lax.scan`s over a fused per-step cell (conditional-prior GTF + masked
  product-of-experts + reparameterized particle sampling); the backward
  pass is a scan over time-reversed inputs;
- particles are a leading vmap axis with a closed-form mean-of-experts
  reduction (dmm.py:248-258);
- the smoothing pass appends the filtering pass's conditional priors and
  an **inverse global prior** expert (negative std ⇒ negative precision,
  dmm.py:473-489) to the observation-expert tensor;
- encode/decode run batched over the flattened (T·B) axis — pure matmul /
  conv work for the MXU.

Modes (dmm.py:420-494): 'bfilter' / 'ffilter' are a single filtering pass;
'fsmooth' / 'bsmooth' add the opposite-direction smoothing pass. The
training objective (dmm.py:503-554) combines fwd+bwd prior-matching KLD,
a filtering-mode ELBO and a smoothing-mode ELBO.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses
from ..ops.poe import (product_of_experts, product_of_experts_pair,
                       mean_of_experts)
from . import nn as tnn
from .base import (MultiDGTS, mlp_gaussian_codec, mlp_categorical_codec,
                   embed_gaussian_codec)


class MultiDMM(MultiDGTS):
    """Multimodal deep Markov model with bidirectional factorized
    variational inference."""

    def __init__(self, modalities, dims, dists=None,
                 encoders=None, decoders=None, h_dim=32, z_dim=32,
                 z0_mean=0.0, z0_std=1.0, min_std=1e-3,
                 use_pallas="auto", scan_unroll="auto",
                 use_scan_kernel=False, bf16_gtf=False):
        # bf16_gtf: run the GTF transition matmuls in bfloat16 (the
        # particle-heavy smoothing pass is MXU-FLOP-bound; opt-in since
        # it perturbs the recurrence numerics slightly).
        self.bf16_gtf = bf16_gtf
        self.use_pallas = use_pallas
        # lax.scan unroll factor for the filtering loops. The per-step
        # compute is tiny (a traced train-step spends ~9 of 19 ms in
        # 6 while-loops of ~47 sub-microsecond ops per iteration, r4
        # trace), so unrolling lets XLA fuse/overlap across timesteps:
        # measured 19.2 -> 17.0 ms/step on the Weizmann bench. "auto"
        # unrolls by 25 on accelerators and keeps the loop on CPU
        # (where the virtual-mesh test suite prefers small programs);
        # unroll is a pure lax.scan scheduling hint, numerics-exact.
        self.scan_unroll = scan_unroll
        # Full-scan Pallas kernel (ops/pallas/bfvi_scan): runs the whole
        # filtering loop in one kernel with VMEM-resident state and a
        # hand-derived backward; usable in training and eval.
        self.use_scan_kernel = use_scan_kernel
        self._scan_kernel_interpret = False
        # 2-D mesh prototype (SURVEY §5.8/§7.1): when set via
        # ``set_variant_mesh``, the stacked (V·B) variant batch of the
        # fused objective is sharding-constrained so the variant rows
        # spread over the mesh's 'model' axis and the data rows over
        # 'data' — the z-scan is sequential in T, but V and B are
        # embarrassingly parallel.
        self.vb_mesh = None
        self.vb_axes = ("model", "data")
        self.modalities = list(modalities)
        self.n_mods = len(self.modalities)
        self.dims = dict(zip(self.modalities, dims))
        self.h_dim = h_dim
        self.z_dim = z_dim
        if dists is None:
            dists = ["Normal"] * self.n_mods
        self.dists = dict(zip(self.modalities, dists))
        self.z0_mean_init = z0_mean
        self.z0_std_init = z0_std
        self.min_std = min_std

        # Default codecs (dmm.py:73-106); custom ones override.
        self.enc = {}
        self.dec = {}
        for m in self.modalities:
            if self.dists[m] == "Categorical":
                self.enc[m] = embed_gaussian_codec(
                    self._dim_of(m), z_dim, h_dim)
                self.dec[m] = mlp_categorical_codec(
                    z_dim, self._dim_of(m), h_dim)
            else:
                self.enc[m] = mlp_gaussian_codec(
                    self._dim_of(m), z_dim, h_dim)
                self.dec[m] = mlp_gaussian_codec(
                    z_dim, self._dim_of(m), h_dim)
        if encoders is not None:
            if isinstance(encoders, list):
                encoders = dict(zip(self.modalities, encoders))
            self.enc.update(encoders)
        if decoders is not None:
            if isinstance(decoders, list):
                decoders = dict(zip(self.modalities, decoders))
            self.dec.update(decoders)

    # -- parameters -----------------------------------------------------------

    def init(self, key):
        """Initialize (params, state) pytrees."""
        keys = jax.random.split(key, 2 * self.n_mods + 2)
        params = {"enc": {}, "dec": {}}
        state = {"enc": {}, "dec": {}}
        for i, m in enumerate(self.modalities):
            params["enc"][m], state["enc"][m] = self.enc[m].init(keys[i])
            params["dec"][m], state["dec"][m] = \
                self.dec[m].init(keys[self.n_mods + i])
        # Two learned GTF transitions (dmm.py:108-112).
        k_fwd, k_bwd = keys[-2], keys[-1]
        params["trans"] = {
            "fwd": tnn.gtf_init(k_fwd, self.z_dim, self.h_dim,
                                self.min_std),
            "bwd": tnn.gtf_init(k_bwd, self.z_dim, self.h_dim,
                                self.min_std),
        }
        # Learned global prior (dmm.py:114-117).
        params["z0_mean"] = jnp.full((1, self.z_dim), self.z0_mean_init,
                                     jnp.float32)
        params["z0_log_std"] = jnp.log(
            jnp.full((1, self.z_dim), self.z0_std_init, jnp.float32))
        return params, state

    def prior_params(self, params, shape):
        """Global prior broadcast to ``shape[:-1] + (z_dim,)``
        (dmm.py:124-129)."""
        target = tuple(shape[:-1]) + (self.z_dim,)
        mean = jnp.broadcast_to(params["z0_mean"][0], target)
        std = jnp.broadcast_to(
            jnp.exp(params["z0_log_std"][0]) + self.min_std, target)
        return mean, std

    # -- encode / decode ------------------------------------------------------

    def encode(self, params, state, inputs, train=False, combine=False,
               native=()):
        """Per-modality q'(z|x_m) params + NaN-derived masks
        (dmm.py:131-190). inputs must contain every modality (NaN-fill
        absent ones first). Returns ((M,T,B,z) mean/std, (M,T,B) mask),
        new encoder state. Modalities in ``native`` arrive in the
        codec-native trailing-dim layout and encode via
        ``enc.apply_native`` (no edge transpose); NaN-mask derivation is
        elementwise, hence layout-agnostic."""
        t_max, b_dim = inputs[self.modalities[0]].shape[:2]
        z_mean, z_std, masks = [], [], []
        new_state = dict(state)
        for m in self.modalities:
            x = inputs[m]
            flat = x.reshape(t_max * b_dim, -1)
            mask_m = ~jnp.isnan(flat).any(axis=-1)
            x_f = jnp.where(jnp.isnan(x), 0.0, x)
            x_flat = x_f.reshape((t_max * b_dim,) + x.shape[2:])
            enc_apply = (self.enc[m].apply_native if m in native
                         else self.enc[m].apply)
            (m_mean, m_std), new_state[m] = enc_apply(
                params["enc"][m], state[m], x_flat, train)
            z_mean.append(m_mean.reshape(t_max, b_dim, -1))
            z_std.append(m_std.reshape(t_max, b_dim, -1))
            masks.append(mask_m.reshape(t_max, b_dim))
        z_mean = jnp.stack(z_mean, axis=0)
        z_std = jnp.stack(z_std, axis=0)
        masks = jnp.stack(masks, axis=0)
        if combine:
            z_mean, z_std = product_of_experts(z_mean, z_std, masks)
            masks = masks.any(axis=0)
        return (z_mean, z_std, masks), new_state

    def decode(self, params, state, z, train=False):
        """z: (T, B, z_dim) → recon dict of (T, B, ...) param tuples
        (dmm.py:192-212). (The training objective bypasses this and
        decodes per-modality active variant rows through the codecs'
        logits channel — see ``_variant_objective``.)"""
        t_max, b_dim = z.shape[:2]
        flat = z.reshape(t_max * b_dim, self.z_dim)
        recon = {}
        new_state = dict(state)
        for m in self.modalities:
            out, new_state[m] = self.dec[m].apply(
                params["dec"][m], state[m], flat, train)
            recon[m] = tuple(
                r.reshape((t_max, b_dim) + r.shape[1:]) for r in out)
        return recon, new_state

    def native_input_perms(self):
        """Trailing-dim permutations (edge → codec-native) for the
        modalities the fused training step can consume natively: the
        encoder exposes ``apply_native`` and the Bernoulli loss runs
        through the decoder's logits channel, so neither the input nor
        the target ever needs an edge-layout copy inside the step."""
        out = {}
        for m in self.modalities:
            enc, dec = self.enc[m], self.dec[m]
            perm = getattr(enc, "raw_perm", None)
            # The decoder's logits layout must be THE SAME permutation
            # of the edge dims as the encoder's native input layout —
            # natively-stored targets are consumed against the logits
            # elementwise, and a mismatch with coinciding permuted
            # shapes (e.g. square images) would silently misalign the
            # BCE rather than shape-error.
            if (self.dists[m] == "Bernoulli" and perm is not None
                    and getattr(dec, "raw_perm", None) == tuple(perm)
                    and hasattr(enc, "apply_native")
                    and hasattr(dec, "apply_logits")):
                out[m] = tuple(perm)
        return out

    # -- latent dynamics ------------------------------------------------------

    def _scan_kernel_enabled(self):
        if self.use_scan_kernel is False:
            return False
        if self.use_scan_kernel is True:
            return True
        if self.z_dim % 128 != 0:
            return False
        try:
            return jax.default_backend() not in ("cpu",)
        except Exception:
            return False

    def _pallas_enabled(self, train):
        """Pallas cell on gradient-free paths, TPU backend, tiled dims."""
        if self.use_pallas is False or train:
            return False
        if self.z_dim % 128 != 0:
            return False
        try:
            return jax.default_backend() not in ("cpu",)
        except Exception:
            return False

    def _resolved_unroll(self):
        """Resolve scan_unroll="auto": unroll 25 steps on accelerator
        backends (latency-bound tiny-op loops, see __init__ note), keep
        the rolled loop on CPU (test-suite compile time)."""
        if self.scan_unroll != "auto":
            return self.scan_unroll
        try:
            return 1 if jax.default_backend() == "cpu" else 25
        except Exception:
            return 1

    def _packed_trans(self, params, direction):
        """GTF weights packed (and bf16-cast) ONCE, outside any scan —
        the scan body then runs 3 pre-fused matmuls with no per-step
        concatenation or weight casts (tnn.gtf_pack)."""
        dt = jnp.bfloat16 if self.bf16_gtf else None
        return tnn.gtf_pack(params["trans"][direction], compute_dtype=dt)

    def _z_next(self, trans, z, glb_mean, glb_std):
        """p(z_next|z) from particles z: (K, B, D) → (B, D) params
        (dmm.py:214-258): PoE(global prior, GTF(z_k)) per particle, then
        moment-matched average over particles. ``trans`` is a packed
        transition from ``_packed_trans``."""
        q_mean, q_std = tnn.gtf_apply_packed(trans, z, self.min_std)
        # Pair-specialized PoE: the global prior broadcasts lazily
        # instead of being materialized K·V·B-fold on a stacked expert
        # axis (bit-identical result, ops/poe.py).
        pp_mean, pp_std = product_of_experts_pair(
            glb_mean, glb_std, q_mean, q_std)
        return mean_of_experts(pp_mean, pp_std)

    def _filter_eps(self, rng, t_max, n_particles, b_dim, do_sample,
                    sample_init):
        """The filtering scan's Gaussian noise stream (T, K, B, D),
        drawn in ONE batched RNG kernel. Per-step slices are
        bit-identical to what per-step ``sample_gauss`` calls would
        draw from ``split(rng, t_max)`` (dmm.py:398-405)."""
        keys = jax.random.split(rng, t_max)
        if do_sample:
            return jax.vmap(lambda kk: jax.random.normal(
                kk, (n_particles, b_dim, self.z_dim)))(keys)
        if sample_init:
            eps0 = jax.random.normal(keys[0], (1, b_dim, self.z_dim))
            return jnp.zeros(
                (t_max, 1, b_dim, self.z_dim)).at[0].set(eps0)
        return jnp.zeros((t_max, 1, b_dim, self.z_dim))

    def z_filter(self, params, z_mean, z_std, z_masks, rng,
                 direction="fwd", sample=True, n_particles=1,
                 sample_init=False, use_pallas=False, eps=None):
        """Filtering scan (dmm.py:319-412).

        z_mean/z_std: (M', T, B, D); z_masks: (M', T, B). Returns
        (infer, prior, samples) in original time order.

        ``use_pallas`` fuses the PoE + particle sampling of each step
        into one VMEM-resident TPU kernel (gradient-free paths only —
        the kernel has no autodiff rule, so training keeps the XLA
        composite that `jax.grad` differentiates).

        ``eps``: optional pre-drawn noise (T, K, B, D) in SCAN time
        order (i.e. already flipped for a backward pass); when given,
        ``rng`` is unused and K overrides ``n_particles``. Callers use
        this to batch several logical passes into one scan.
        """
        n_exp, t_max, b_dim, z_dim = z_mean.shape
        glb_mean, glb_std = self.prior_params(params, (b_dim, self.z_dim))

        # Time-major expert tensors for scan; flip time for backward.
        xs_mean = jnp.moveaxis(z_mean, 1, 0)   # (T, M', B, D)
        xs_std = jnp.moveaxis(z_std, 1, 0)
        xs_mask = jnp.moveaxis(z_masks, 1, 0)  # (T, M', B)
        if direction == "bwd":
            xs_mean = xs_mean[::-1]
            xs_std = xs_std[::-1]
            xs_mask = xs_mask[::-1]
        is_first = (jnp.arange(t_max) == 0)
        do_sample = sample or n_particles > 1
        if eps is None:
            eps = self._filter_eps(rng, t_max, n_particles, b_dim,
                                   do_sample, sample_init)

        if self._scan_kernel_enabled():
            # Whole-loop Pallas kernel path; eps reproduces exactly
            # what the scan cell would draw from the same keys.
            from ..ops.pallas.bfvi_scan import bfvi_scan
            p_mean, p_std, i_mean, i_std, samples = bfvi_scan(
                xs_mean, xs_std, xs_mask.astype(jnp.float32),
                glb_mean, glb_std, params["trans"][direction], eps,
                self.min_std, None, self._scan_kernel_interpret)
            if direction == "bwd":
                p_mean, p_std = p_mean[::-1], p_std[::-1]
                i_mean, i_std = i_mean[::-1], i_std[::-1]
                samples = samples[::-1]
            return (i_mean, i_std), (p_mean, p_std), samples

        # Hoist everything loop-invariant or data-independent out of the
        # scan body: packed/cast GTF weights, and the whole Gaussian
        # noise stream (ONE batched RNG kernel instead of T small ones;
        # same keys → bit-identical draws to per-step sampling).
        trans = self._packed_trans(params, direction)
        k_init = eps.shape[1]

        def cell(z_prev, xs):
            om, os, omask, first, eps_t = xs
            # Conditional prior p(z_t|z_prev); replaced by the global
            # prior at the first step of the pass (dmm.py:376-382).
            pm, ps = self._z_next(trans, z_prev, glb_mean, glb_std)
            prior_mean_t = jnp.where(first, glb_mean, pm)
            prior_std_t = jnp.where(first, glb_std, ps)
            if do_sample and use_pallas:
                # Fused PoE + sampling kernel (same RNG stream).
                from ..ops.pallas.poe_cell import poe_sample_cell
                infer_mean_t, infer_std_t, z_t, sample_out = \
                    poe_sample_cell(prior_mean_t, prior_std_t, om, os,
                                    omask.astype(bool), eps_t)
                return z_t, (prior_mean_t, prior_std_t,
                             infer_mean_t, infer_std_t, sample_out)
            # PoE of [cond prior; per-expert observations] (dmm.py:387-393).
            all_mean = jnp.concatenate([prior_mean_t[None], om], axis=0)
            all_std = jnp.concatenate([prior_std_t[None], os], axis=0)
            all_mask = jnp.concatenate(
                [jnp.ones((1, b_dim), bool), omask.astype(bool)], axis=0)
            infer_mean_t, infer_std_t = product_of_experts(
                all_mean, all_std, all_mask)
            # Particle sampling (dmm.py:398-405) from the presampled
            # noise: mean + std·eps ≡ sample_gauss with the same key.
            z_t = infer_mean_t[None] + infer_std_t[None] * eps_t
            sample_out = jnp.mean(z_t, axis=0)
            return z_t, (prior_mean_t, prior_std_t,
                         infer_mean_t, infer_std_t, sample_out)

        z0 = jnp.zeros((k_init, b_dim, self.z_dim))
        _, (p_mean, p_std, i_mean, i_std, samples) = jax.lax.scan(
            cell, z0, (xs_mean, xs_std, xs_mask, is_first, eps),
            unroll=self._resolved_unroll())

        if direction == "bwd":
            p_mean, p_std = p_mean[::-1], p_std[::-1]
            i_mean, i_std = i_mean[::-1], i_std[::-1]
            samples = samples[::-1]
        return (i_mean, i_std), (p_mean, p_std), samples

    def z_filter_grouped(self, params, z_mean, z_std, z_masks, eps,
                         k_groups, direction="fwd"):
        """Several logical filtering passes over the SAME experts in ONE
        scan, with per-group particle counts (ragged K).

        The training objective runs two data-independent filtering
        passes in the same direction over identical expert tensors — the
        f-mode pass (K=flt_particles, usually 1) and the s-mode's
        filter pass (K=train_particles, usually 25). Two separate scans
        serialize two latency-bound while-loops; the earlier
        merge_mode_scans attempt (RESULTS §8) instead concatenated the
        batch and BROADCAST the K=1 group to K=25 — 25× its compute —
        and measured slower. This path shares one scan with a ragged
        particle axis: the GTF transition runs on all ΣK particles as
        one matmul batch, while the particle-mean (mean_of_experts) and
        PoE+sampling steps are segmented per group by STATIC slices, so
        each group computes exactly its own math.

        Bit-exactness vs per-group ``z_filter`` calls: matmuls are
        row-independent, each group's particle-mean reduces the same
        values in the same order, and the per-group PoE concatenates
        [prior_g; experts] exactly as the single-group cell does.
        Guarded by tests/test_fused_step.py.

        z_mean/z_std: (M', T, B, D); z_masks: (M', T, B); eps:
        (T, ΣK, B, D) in SCAN time order; k_groups: static tuple of
        per-group particle counts summing to ΣK. Returns
        (infer, prior, samples) with a leading group axis:
        ((G,T,B,D), (G,T,B,D)), ..., (G,T,B,D) in original time order.
        """
        n_exp, t_max, b_dim, z_dim = z_mean.shape
        k_groups = tuple(int(k) for k in k_groups)
        k_tot = sum(k_groups)
        assert eps.shape[1] == k_tot
        bounds = np.cumsum((0,) + k_groups)
        glb_mean, glb_std = self.prior_params(params, (b_dim, self.z_dim))

        xs_mean = jnp.moveaxis(z_mean, 1, 0)   # (T, M', B, D)
        xs_std = jnp.moveaxis(z_std, 1, 0)
        xs_mask = jnp.moveaxis(z_masks, 1, 0)  # (T, M', B)
        if direction == "bwd":
            xs_mean = xs_mean[::-1]
            xs_std = xs_std[::-1]
            xs_mask = xs_mask[::-1]
        is_first = (jnp.arange(t_max) == 0)
        trans = self._packed_trans(params, direction)

        def cell(z_prev, xs):
            om, os, omask, first, eps_t = xs
            # One GTF matmul over all groups' particles, then the
            # pair-PoE with the global prior — identical math to
            # _z_next minus its particle-mean, which must be segmented.
            q_mean, q_std = tnn.gtf_apply_packed(trans, z_prev,
                                                 self.min_std)
            pp_mean, pp_std = product_of_experts_pair(
                glb_mean, glb_std, q_mean, q_std)
            pm = jnp.stack([
                jnp.stack(mean_of_experts(pp_mean[s:e], pp_std[s:e]))
                for s, e in zip(bounds[:-1], bounds[1:])])  # (G, 2, B, D)
            prior_mean_t = jnp.where(first, glb_mean, pm[:, 0])
            prior_std_t = jnp.where(first, glb_std, pm[:, 1])

            def poe_with_prior(p_mean_g, p_std_g):
                all_mean = jnp.concatenate([p_mean_g[None], om], axis=0)
                all_std = jnp.concatenate([p_std_g[None], os], axis=0)
                all_mask = jnp.concatenate(
                    [jnp.ones((1, b_dim), bool), omask.astype(bool)],
                    axis=0)
                return product_of_experts(all_mean, all_std, all_mask)

            infer_mean_t, infer_std_t = jax.vmap(poe_with_prior)(
                prior_mean_t, prior_std_t)  # (G, B, D)
            z_t = jnp.concatenate([
                infer_mean_t[g][None] + infer_std_t[g][None]
                * eps_t[s:e]
                for g, (s, e) in enumerate(zip(bounds[:-1], bounds[1:]))
            ], axis=0)  # (ΣK, B, D)
            sample_out = jnp.stack([
                jnp.mean(z_t[s:e], axis=0)
                for s, e in zip(bounds[:-1], bounds[1:])])  # (G, B, D)
            return z_t, (prior_mean_t, prior_std_t,
                         infer_mean_t, infer_std_t, sample_out)

        z0 = jnp.zeros((k_tot, b_dim, self.z_dim))
        _, (p_mean, p_std, i_mean, i_std, samples) = jax.lax.scan(
            cell, z0, (xs_mean, xs_std, xs_mask, is_first, eps),
            unroll=self._resolved_unroll())

        if direction == "bwd":
            p_mean, p_std = p_mean[::-1], p_std[::-1]
            i_mean, i_std = i_mean[::-1], i_std[::-1]
            samples = samples[::-1]
        # (T, G, ...) → (G, T, ...)
        swap = lambda x: jnp.moveaxis(x, 1, 0)  # noqa: E731
        return ((swap(i_mean), swap(i_std)),
                (swap(p_mean), swap(p_std)), swap(samples))

    def z_sample(self, params, t_max, b_dim, rng, direction="fwd",
                 sample=True, n_particles=1, z_init=None, inclusive=False):
        """Ancestral rollout of the latent chain (dmm.py:260-317)."""
        glb_mean, glb_std = self.prior_params(params, (b_dim, self.z_dim))
        init_mean, init_std = (glb_mean, glb_std) if z_init is None \
            else z_init
        n_steps = t_max - int(inclusive)
        keys = jax.random.split(rng, max(n_steps, 1))
        do_sample = sample or n_particles > 1
        trans = self._packed_trans(params, direction)
        b_dim_ = init_mean.shape[0]
        if do_sample:
            eps = jax.vmap(lambda kk: jax.random.normal(
                kk, (n_particles, b_dim_, self.z_dim)))(keys[:n_steps])
        else:
            eps = jnp.zeros((n_steps, 1, b_dim_, self.z_dim))

        def cell(carry, xs):
            mean_t, std_t = carry
            eps_t = xs
            z_t = mean_t[None] + std_t[None] * eps_t
            nxt = self._z_next(trans, z_t, glb_mean, glb_std)
            return nxt, nxt

        _, (means, stds) = jax.lax.scan(
            cell, (init_mean, init_std), eps,
            unroll=self._resolved_unroll())
        if inclusive:
            means = jnp.concatenate([init_mean[None], means], axis=0)
            stds = jnp.concatenate([init_std[None], stds], axis=0)
        if direction == "bwd":
            means, stds = means[::-1], stds[::-1]
        return means, stds

    # -- forward --------------------------------------------------------------

    def forward(self, params, state, inputs, rng, lengths=None,
                mode="fsmooth", sample=True, sample_init=False,
                flt_particles=1, smt_particles=1, train=False):
        """BFVI forward (dmm.py:420-494). Returns
        ((infer, prior, recon), new_state)."""
        some = inputs[list(inputs.keys())[0]]
        t_max, b_dim = some.shape[:2]
        full_inputs = self._nan_fill_missing(inputs, t_max, b_dim)

        k_enc, k_flt, k_smt, k_dec = jax.random.split(rng, 4)
        (obs_mean, obs_std, obs_mask), enc_state = self.encode(
            params, state["enc"], full_inputs, train)
        use_pallas = self._pallas_enabled(train)

        # Filtering pass.
        direction = "fwd" if mode in ("ffilter", "bsmooth") else "bwd"
        flt_init = sample_init if mode in ("ffilter", "bfilter") else False
        infer, prior, z_samples = self.z_filter(
            params, obs_mean, obs_std, obs_mask.astype(jnp.float32),
            k_flt, direction=direction, sample=sample,
            n_particles=flt_particles, sample_init=flt_init,
            use_pallas=use_pallas)

        # Smoothing pass: append filter-prior + inverse-global-prior
        # experts (dmm.py:473-489).
        if mode in ("fsmooth", "bsmooth"):
            direction = "fwd" if mode == "fsmooth" else "bwd"
            glb_mean, glb_std = self.prior_params(
                params, (t_max, b_dim, self.z_dim))
            inv_mean = jnp.broadcast_to(glb_mean,
                                        (t_max, b_dim, self.z_dim))
            inv_std = -jnp.broadcast_to(glb_std,
                                        (t_max, b_dim, self.z_dim))
            inv_mask = jnp.ones((t_max, b_dim))
            flt_mean, flt_std = prior
            flt_mask = jnp.ones((t_max, b_dim)).at[-1].set(0.0)
            cat = lambda a, b: jnp.concatenate([a, b[None]], axis=0)  # noqa: E731
            infer, prior, z_samples = self.z_filter(
                params,
                cat(cat(obs_mean, flt_mean), inv_mean),
                cat(cat(obs_std, flt_std), inv_std),
                cat(cat(obs_mask.astype(jnp.float32), flt_mask), inv_mask),
                k_smt, direction=direction, sample=sample,
                n_particles=smt_particles, sample_init=sample_init,
                use_pallas=use_pallas)

        recon, dec_state = self.decode(params, state["dec"], z_samples,
                                       train)
        new_state = {"enc": enc_state, "dec": dec_state}
        return (infer, prior, recon), new_state

    def sample(self, params, state, t_max, b_dim, rng, direction="fwd"):
        """Unconditional generation (dmm.py:414-418)."""
        z_mean, _ = self.z_sample(params, t_max, b_dim, rng, direction,
                                  sample=True)
        recon, _ = self.decode(params, state["dec"], z_mean, train=False)
        return recon

    # -- objective ------------------------------------------------------------

    def kld_prior(self, params, rng, n_particles, direction="fwd"):
        """KL(p(z) ‖ E[p(z'|z)]) prior-matching regularizer
        (dmm.py:496-501)."""
        glb_mean, glb_std = self.prior_params(params, (1, 1, self.z_dim))
        nxt_mean, nxt_std = self.z_sample(
            params, 1, 1, rng, direction, sample=True,
            n_particles=n_particles)
        return losses.kld_gauss(glb_mean, glb_std, nxt_mean, nxt_std)

    def step(self, params, state, inputs, mask, kld_mult, rec_mults, rng,
             targets=None, uni_loss=True, train=True, fused=True,
             **kwargs):
        """Bidirectional training objective (dmm.py:503-554):
        match_mult·kld_mult·Σmask·(fwd+bwd prior matching)
        + f_mult·ELBO(bfilter) + s_mult·ELBO(fsmooth, 25 filter
        particles).

        ``fused=True`` (default) computes the joint + per-modality
        unimodal ELBOs of each mode as ONE forward over a stacked
        variant axis: the (1 + n_mods) forwards of the reference differ
        only in their expert-mask patterns, so encoding happens once and
        the filtering scans run with a (1 + n_mods)·B batch — identical
        math (the expert masks make excluded modalities drop out of the
        PoE exactly as absent inputs do), far better MXU utilization.
        ``fused=False`` reproduces the reference's loop of separate
        forwards (used by parity tests).
        """
        f_mode = kwargs.pop("f_mode", "bfilter")
        s_mode = kwargs.pop("s_mode", "fsmooth")
        f_mult = kwargs.pop("f_mult", 0.5)
        s_mult = kwargs.pop("s_mult", 0.5)
        match_mult = kwargs.pop("match_mult", 0.01)
        train_particles = kwargs.pop("train_particles", 25)
        match_particles = kwargs.pop("match_particles", 50)
        kwargs.pop("mode", None)
        flt_particles = kwargs.pop("flt_particles", 1)
        kwargs.pop("smt_particles", None)
        sample = kwargs.pop("sample", True)
        # Merge the two modes' filtering scans into one (see
        # _fused_two_mode_losses). Off by default: the K=1 group's
        # particle-mean reduction reintroduces ≤ulp f32 noise, and at
        # suite shapes the merged scan measured slower (RESULTS §8:
        # 51 vs 31 ms device time), so it stays opt-in via
        # --train_args '{merge_mode_scans: true}' / bench --merge.
        merge_mode_scans = kwargs.pop("merge_mode_scans", False)
        # Share ONE ragged-K scan between the two modes' filtering
        # passes (see _fused_two_mode_ragged / z_filter_grouped) —
        # strictly less work than the two scans it replaces, unlike
        # merge_mode_scans' broadcast padding.
        ragged_mode_scans = kwargs.pop("ragged_mode_scans", False)
        # Modalities whose inputs AND targets arrive in the codec-native
        # trailing-dim layout (device loader stores them permuted once;
        # the step then runs with zero edge-layout copies). Static.
        native_mods = tuple(kwargs.pop("native_mods", ()))

        k1, k2, k3, k4 = jax.random.split(rng, 4)
        loss = 0.0
        if match_mult > 0:
            msum = jnp.sum(mask).astype(jnp.float32)
            loss += (match_mult * kld_mult * msum *
                     self.kld_prior(params, k1, match_particles, "fwd"))
            loss += (match_mult * kld_mult * msum *
                     self.kld_prior(params, k2, match_particles, "bwd"))

        if not fused:
            if native_mods:
                raise ValueError(
                    "native_mods requires the fused step (the unfused "
                    "reference composition consumes edge layout)")
            f_loss, state = MultiDGTS.step(
                self, params, state, inputs, mask, kld_mult, rec_mults,
                k3, targets=targets, uni_loss=uni_loss, train=train,
                mode=f_mode, flt_particles=flt_particles, sample=sample,
                **kwargs)
            loss += f_mult * f_loss
            s_loss, state = MultiDGTS.step(
                self, params, state, inputs, mask, kld_mult, rec_mults,
                k4, targets=targets, uni_loss=uni_loss, train=train,
                mode=s_mode, flt_particles=train_particles,
                sample=sample, **kwargs)
            loss += s_mult * s_loss
            return loss, state

        # ---- fused path -------------------------------------------------
        inputs = {m: inputs[m] for m in inputs if m in self.modalities}
        if targets is None:
            targets = inputs
        some = inputs[list(inputs.keys())[0]]
        t_max, b_dim = some.shape[:2]
        full_inputs = self._nan_fill_missing(inputs, t_max, b_dim,
                                             native_mods=native_mods)
        # Encode ONCE; the 2 modes × (1+n_mods) variants reuse it.
        (obs_mean, obs_std, obs_mask), enc_state = self.encode(
            params, state["enc"], full_inputs, train,
            native=native_mods)
        # Variant expert-presence patterns (V, M): joint row of ones
        # (only when >1 modality, dgts.py:119) + one-hot rows for the
        # modalities actually present in the inputs (dgts.py:126).
        rows = []
        if len(self.modalities) > 1:
            rows.append(np.ones((self.n_mods,), np.float32))
        if uni_loss:
            rows += [np.eye(self.n_mods, dtype=np.float32)[i]
                     for i, m in enumerate(self.modalities)
                     if m in inputs]
        # Static numpy (V, M): the objective slices each modality's
        # loss to its active variants at trace time.
        vmat = np.stack(rows)

        dec_state = state["dec"]
        fdir = "fwd" if f_mode in ("ffilter", "bsmooth") else "bwd"
        sdir = "fwd" if s_mode in ("ffilter", "bsmooth") else "bwd"
        can_ragged = (ragged_mode_scans
                      and f_mode in ("ffilter", "bfilter")
                      and s_mode in ("fsmooth", "bsmooth")
                      and fdir == sdir
                      and not kwargs.get("sample_init", False))
        if can_ragged:
            f_loss, s_loss, dec_state = self._fused_two_mode_ragged(
                params, dec_state, obs_mean, obs_std, obs_mask, vmat,
                targets, mask, kld_mult, rec_mults, k3, k4,
                f_mode=f_mode, s_mode=s_mode,
                flt_particles=flt_particles,
                train_particles=train_particles, sample=sample,
                train=train, native_mods=native_mods, **kwargs)
            loss += f_mult * f_loss + s_mult * s_loss
            return loss, {"enc": enc_state, "dec": dec_state}
        can_merge = (merge_mode_scans
                     and f_mode in ("ffilter", "bfilter")
                     and s_mode in ("fsmooth", "bsmooth")
                     and fdir == sdir
                     and flt_particles in (1, train_particles)
                     and not kwargs.get("sample_init", False))
        if can_merge:
            f_loss, s_loss, dec_state = self._fused_two_mode_losses(
                params, dec_state, obs_mean, obs_std, obs_mask, vmat,
                targets, mask, kld_mult, rec_mults, k3, k4,
                f_mode=f_mode, s_mode=s_mode,
                flt_particles=flt_particles,
                train_particles=train_particles, sample=sample,
                train=train, native_mods=native_mods, **kwargs)
            loss += f_mult * f_loss + s_mult * s_loss
            return loss, {"enc": enc_state, "dec": dec_state}

        for mult, mode, fp, key in ((f_mult, f_mode, flt_particles, k3),
                                    (s_mult, s_mode, train_particles,
                                     k4)):
            mode_loss, dec_state = self._fused_mode_loss(
                params, dec_state, obs_mean, obs_std, obs_mask, vmat,
                targets, mask, kld_mult, rec_mults, key, mode=mode,
                sample=sample, flt_particles=fp, train=train,
                native_mods=native_mods, **kwargs)
            loss += mult * mode_loss
        return loss, {"enc": enc_state, "dec": dec_state}

    def _fused_two_mode_losses(self, params, dec_state, obs_mean,
                               obs_std, obs_mask, vmat, targets, mask,
                               kld_mult, rec_mults, kf, ks, f_mode,
                               s_mode, flt_particles, train_particles,
                               sample, smt_particles=1,
                               sample_init=False, train=True,
                               native_mods=()):
        """Both objective modes' filtering passes in ONE scan.

        The filtering-mode pass (e.g. bfilter, K=1) and the smoothing
        mode's filtering pass (e.g. fsmooth's backward pass, K=25) run
        over identical expert tensors in the same direction and differ
        only in particle count and RNG stream — so they batch into one
        scan of 2·V·B columns. The K=1 group's noise is broadcast
        across the K particles: every particle follows the identical
        trajectory and the particle-mean reductions reproduce the K=1
        math (up to ≤ulp-level f32 averaging noise). Halves the number
        of sequential scans on the training path; the per-mode decodes
        stay separate so BatchNorm batch statistics are unchanged.
        """
        n_mods, t_max, b_dim, z_dim = obs_mean.shape
        v_dim = vmat.shape[0]
        vb = v_dim * b_dim
        zm, zs, om = self._variant_experts(obs_mean, obs_std, obs_mask,
                                           vmat)
        zm, zs, om = self._constrain_vb(zm, zs, om, vb_axis=2)

        # Same key derivation as two _fused_mode_loss calls.
        kf_flt, _ = jax.random.split(kf)
        ks_flt, ks_smt = jax.random.split(ks)
        direction = "fwd" if f_mode in ("ffilter", "bsmooth") else "bwd"
        eps_f = self._filter_eps(kf_flt, t_max, flt_particles, vb,
                                 sample or flt_particles > 1, False)
        eps_s = self._filter_eps(ks_flt, t_max, train_particles, vb,
                                 sample or train_particles > 1, False)
        k_dim = max(eps_f.shape[1], eps_s.shape[1])
        eps_f = jnp.broadcast_to(eps_f, (t_max, k_dim, vb, z_dim))
        eps_s = jnp.broadcast_to(eps_s, (t_max, k_dim, vb, z_dim))
        eps = jnp.concatenate([eps_f, eps_s], axis=2)

        two = lambda x: jnp.concatenate([x, x], axis=2)  # noqa: E731
        infer, prior, z_samples = self.z_filter(
            params, two(zm), two(zs), two(om), kf_flt,
            direction=direction, sample=sample, n_particles=k_dim,
            eps=eps)
        f_infer = (infer[0][:, :vb], infer[1][:, :vb])
        f_prior = (prior[0][:, :vb], prior[1][:, :vb])
        f_samples = z_samples[:, :vb]
        s_prior = (prior[0][:, vb:], prior[1][:, vb:])

        # Smoothing pass for the s mode over its filter priors.
        s_direction = "fwd" if s_mode == "fsmooth" else "bwd"
        szm, szs, som = self._smooth_experts(params, zm, zs, om,
                                             s_prior)
        s_infer, s_prior, s_samples = self.z_filter(
            params, szm, szs, som, ks_smt, direction=s_direction,
            sample=sample, n_particles=smt_particles,
            sample_init=sample_init)

        # Per-mode objectives decode separately (same call structure as
        # the unmerged path, so BatchNorm statistics line up with it).
        f_loss, dec_state = self._variant_objective(
            params, dec_state, f_infer, f_prior, f_samples, vmat,
            targets, mask, kld_mult, rec_mults, train,
            native_mods=native_mods)
        s_loss, dec_state = self._variant_objective(
            params, dec_state, s_infer, s_prior, s_samples, vmat,
            targets, mask, kld_mult, rec_mults, train,
            native_mods=native_mods)
        return f_loss, s_loss, dec_state

    def _fused_two_mode_ragged(self, params, dec_state, obs_mean,
                               obs_std, obs_mask, vmat, targets, mask,
                               kld_mult, rec_mults, kf, ks, f_mode,
                               s_mode, flt_particles, train_particles,
                               sample, smt_particles=1,
                               sample_init=False, train=True,
                               native_mods=()):
        """Both objective modes' filtering passes in ONE ragged-K scan
        (see z_filter_grouped). Unlike _fused_two_mode_losses, the
        K=flt_particles group keeps its own particle count — no
        broadcast padding, no batch duplication — so the shared scan
        does strictly less work than the two scans it replaces.
        Key derivation and all downstream calls mirror the unmerged
        _fused_mode_loss composition exactly (loss/grad-exact,
        tests/test_fused_step.py)."""
        n_mods, t_max, b_dim, z_dim = obs_mean.shape
        v_dim = vmat.shape[0]
        vb = v_dim * b_dim
        zm, zs, om = self._variant_experts(obs_mean, obs_std, obs_mask,
                                           vmat)
        zm, zs, om = self._constrain_vb(zm, zs, om, vb_axis=2)

        # Same key derivation as two _fused_mode_loss calls.
        kf_flt, _ = jax.random.split(kf)
        ks_flt, ks_smt = jax.random.split(ks)
        direction = "fwd" if f_mode in ("ffilter", "bsmooth") else "bwd"
        eps_f = self._filter_eps(kf_flt, t_max, flt_particles, vb,
                                 sample or flt_particles > 1, False)
        eps_s = self._filter_eps(ks_flt, t_max, train_particles, vb,
                                 sample or train_particles > 1, False)
        eps = jnp.concatenate([eps_f, eps_s], axis=1)
        infer, prior, z_samples = self.z_filter_grouped(
            params, zm, zs, om, eps,
            k_groups=(eps_f.shape[1], eps_s.shape[1]),
            direction=direction)
        f_infer = (infer[0][0], infer[1][0])
        f_prior = (prior[0][0], prior[1][0])
        f_samples = z_samples[0]
        s_prior = (prior[0][1], prior[1][1])

        # Smoothing pass for the s mode over its filter priors.
        s_direction = "fwd" if s_mode == "fsmooth" else "bwd"
        szm, szs, som = self._smooth_experts(params, zm, zs, om,
                                             s_prior)
        s_infer, s_prior, s_samples = self.z_filter(
            params, szm, szs, som, ks_smt, direction=s_direction,
            sample=sample, n_particles=smt_particles,
            sample_init=sample_init)

        # Per-mode objectives decode separately (same call structure as
        # the unmerged path, so BatchNorm statistics line up with it).
        f_loss, dec_state = self._variant_objective(
            params, dec_state, f_infer, f_prior, f_samples, vmat,
            targets, mask, kld_mult, rec_mults, train,
            native_mods=native_mods)
        s_loss, dec_state = self._variant_objective(
            params, dec_state, s_infer, s_prior, s_samples, vmat,
            targets, mask, kld_mult, rec_mults, train,
            native_mods=native_mods)
        return f_loss, s_loss, dec_state

    def set_variant_mesh(self, mesh, axes=("model", "data")):
        """Enable 2-D sharding of the fused objective's stacked batch.

        ``mesh`` must have the two named axes in ``axes``: variant rows
        shard over the first, batch columns over the second. The V·B
        merged dimension is constrained with a tuple spec
        ``P(..., (model, data), ...)`` (V major), so V must divide the
        model-axis size × integer and B the data-axis size. Pass
        ``None`` to disable. Static at trace time — changing it forces
        a retrace.
        """
        self.vb_mesh = mesh
        self.vb_axes = tuple(axes)

    def _constrain_vb(self, *tensors, vb_axis):
        """Apply the 2-D (model × data) sharding constraint to stacked
        variant tensors whose ``vb_axis`` dimension is the merged V·B."""
        if self.vb_mesh is None:
            return tensors if len(tensors) > 1 else tensors[0]
        from jax.sharding import NamedSharding, PartitionSpec as P
        out = []
        for x in tensors:
            spec = [None] * x.ndim
            spec[vb_axis] = self.vb_axes
            sh = NamedSharding(self.vb_mesh, P(*spec))
            out.append(jax.lax.with_sharding_constraint(x, sh))
        return tuple(out) if len(out) > 1 else out[0]

    def _variant_experts(self, obs_mean, obs_std, obs_mask, vmat):
        """Stack the (1 + n_mods) loss variants into one (V·B) batch:
        per-variant expert masks (M,T,B)·(V,M) → (M,T,VB) and the
        observation experts broadcast over the variant axis."""
        n_mods, t_max, b_dim, z_dim = obs_mean.shape
        v_dim = vmat.shape[0]
        vb = v_dim * b_dim
        om = (obs_mask.astype(jnp.float32)[:, :, None, :]
              * jnp.transpose(vmat)[:, None, :, None])
        om = om.reshape(n_mods, t_max, vb)
        tile = lambda x: jnp.broadcast_to(  # noqa: E731
            x[:, :, None], (n_mods, t_max, v_dim, b_dim, z_dim)
        ).reshape(n_mods, t_max, vb, z_dim)
        return tile(obs_mean), tile(obs_std), om

    def _smooth_experts(self, params, zm, zs, om, flt_prior):
        """Append the filter-prior + inverse-global-prior experts for a
        smoothing pass (dmm.py:473-489)."""
        n_mods, t_max, vb, z_dim = zm.shape
        glb_mean, glb_std = self.prior_params(params, (t_max, vb,
                                                       self.z_dim))
        inv_mean = jnp.broadcast_to(glb_mean, (t_max, vb, z_dim))
        inv_std = -jnp.broadcast_to(glb_std, (t_max, vb, z_dim))
        inv_mask = jnp.ones((t_max, vb))
        flt_mean, flt_std = flt_prior
        flt_mask = jnp.ones((t_max, vb)).at[-1].set(0.0)
        cat = lambda a, b: jnp.concatenate([a, b[None]], axis=0)  # noqa: E731
        return (cat(cat(zm, flt_mean), inv_mean),
                cat(cat(zs, flt_std), inv_std),
                cat(cat(om, flt_mask), inv_mask))

    def _fused_mode_loss(self, params, dec_state, obs_mean, obs_std,
                         obs_mask, vmat, targets, mask, kld_mult,
                         rec_mults, rng, mode, sample, flt_particles,
                         smt_particles=1, sample_init=False, train=True,
                         native_mods=()):
        """One inference mode's joint + unimodal losses in a single
        forward over the stacked (V·B) variant batch."""
        n_mods, t_max, b_dim, z_dim = obs_mean.shape
        v_dim = vmat.shape[0]
        vb = v_dim * b_dim
        zm, zs, om = self._variant_experts(obs_mean, obs_std, obs_mask,
                                           vmat)
        zm, zs, om = self._constrain_vb(zm, zs, om, vb_axis=2)

        k_flt, k_smt = jax.random.split(rng)
        direction = "fwd" if mode in ("ffilter", "bsmooth") else "bwd"
        flt_init = sample_init if mode in ("ffilter", "bfilter") \
            else False
        infer, prior, z_samples = self.z_filter(
            params, zm, zs, om, k_flt, direction=direction,
            sample=sample, n_particles=flt_particles,
            sample_init=flt_init)
        if mode in ("fsmooth", "bsmooth"):
            direction = "fwd" if mode == "fsmooth" else "bwd"
            szm, szs, som = self._smooth_experts(params, zm, zs, om,
                                                 prior)
            infer, prior, z_samples = self.z_filter(
                params, szm, szs, som,
                k_smt, direction=direction, sample=sample,
                n_particles=smt_particles, sample_init=sample_init)

        loss, dec_state = self._variant_objective(
            params, dec_state, infer, prior, z_samples, vmat, targets,
            mask, kld_mult, rec_mults, train, native_mods=native_mods)
        return loss, dec_state

    def _variant_objective(self, params, dec_state, infer, prior,
                           z_samples, vmat, targets, mask, kld_mult,
                           rec_mults, train, native_mods=()):
        """Decode + KLD + weighted reconstruction over the stacked
        variant batch — equals the sum of the reference's per-forward
        losses (dgts.py:120-129 composition).

        ``vmat`` is a STATIC numpy (V, M) presence matrix. Each
        modality decodes ONLY its active variant rows — the joint row
        plus its own unimodal row — because the inactive rows'
        reconstructions enter no loss term, so the reference's autograd
        never runs their backward either; decoding them here would
        spend the dominant deconv FLOPs/HBM bytes on work whose
        cotangent is identically zero. (BatchNorm batch statistics are
        computed over the (T·A·B) active batch rather than the
        reference's per-forward (T·B); same class of documented
        deviation as the stacked decode this replaces.) Bernoulli
        modalities decode through the codec's logits channel and use
        the fused logit-space BCE (no materialized probability tensor;
        ops/losses.nll_bernoulli_logits semantics inlined)."""
        vmat = np.asarray(vmat)
        v_dim = vmat.shape[0]
        t_max = mask.shape[0]
        b_dim = mask.shape[1]

        # KLD over every variant, masked by the (tiled) length mask
        # (z-dim-sized tensors; tiling is cheap here).
        mask_v = jnp.broadcast_to(mask.astype(jnp.float32)[:, None],
                                  (t_max, v_dim) + mask.shape[1:])
        mask_v = mask_v.reshape((t_max, v_dim * b_dim) + mask.shape[2:])
        loss = kld_mult * losses.kld_gauss(
            infer[0], infer[1], prior[0], prior[1], mask_v)

        lmask = mask.astype(jnp.float32)  # (T, B, 1)
        z_samples = self._constrain_vb(z_samples, vb_axis=1)
        z_v = z_samples.reshape(t_max, v_dim, b_dim, self.z_dim)
        new_dec_state = dict(dec_state)
        for i, m in enumerate(self.modalities):
            active = np.nonzero(vmat[:, i])[0]
            if len(active) == 0:
                continue
            a_dim = len(active)
            za = z_v[:, active].reshape(t_max * a_dim * b_dim,
                                        self.z_dim)
            dec = self.dec[m]
            use_logits = (self.dists[m] == "Bernoulli"
                          and hasattr(dec, "apply_logits"))
            if use_logits:
                out, new_dec_state[m] = dec.apply_logits(
                    params["dec"][m], dec_state[m], za, train)
            else:
                out, new_dec_state[m] = dec.apply(
                    params["dec"][m], dec_state[m], za, train)
            if m not in targets:
                continue
            mult = rec_mults.get(m, 1.0) if rec_mults else 1.0
            if mult == 0:
                continue
            x = targets[m]  # (T, B, ...)
            raw_perm = getattr(dec, "raw_perm", None)
            if m in native_mods:
                # Targets were stored native by the device loader; the
                # logits are native too, so no layout op at all.
                if not use_logits:
                    raise ValueError(
                        "native_mods modality %r has no logits decode "
                        "path" % (m,))
            elif use_logits and raw_perm is not None:
                # apply_logits returns the decoder's native layout; the
                # BCE is layout-agnostic, so transpose the (V-free)
                # targets instead of copying the stacked activations.
                x = jnp.transpose(
                    x, (0, 1) + tuple(2 + p for p in raw_perm))
            # Length mask broadcastable over (T, A, B, ...): (T,1,B,1..)
            lm_a = lmask.reshape(
                (t_max, 1, b_dim) + (1,) * (x.ndim - 3) + (1,))
            rec = tuple(
                r.reshape((t_max, a_dim, b_dim) + r.shape[1:])
                for r in out)
            if use_logits:
                lg = rec[0]  # (T, A, B, ...) pre-sigmoid
                obs = ~jnp.isnan(x)
                xs = jnp.where(obs, x, 0.0)[:, None]
                cm = obs.astype(jnp.float32)[:, None] * lm_a
                # custom-VJP fused BCE: residuals are the inputs, the
                # backward is one closed-form σ(l)−x pass (see
                # ops/losses.bce_logits_masked_sum).
                loss += mult * losses.bce_logits_masked_sum(lg, xs, cm)
                continue
            xa = x[:, None]  # (T, 1, B, ...) broadcasts over A
            if self.dists[m] == "Bernoulli":
                loss += mult * losses.nll_bernoulli(rec[0], xa, lm_a)
            elif self.dists[m] == "Categorical":
                labels = jnp.broadcast_to(
                    xa, (t_max, a_dim) + x.shape[1:])
                loss += mult * losses.nll_categorical(
                    rec[0], labels, lm_a)
            else:
                loss += mult * losses.nll_gauss(rec[0], rec[1], xa,
                                                lm_a)
        return loss, new_dec_state


if __name__ == "__main__":
    # Smoke test mirroring /root/reference/models/dmm.py:556-582:
    # run `python -m multimodal_dmm_tpu.models.dmm` from the repo root.
    import argparse
    import jax as _jax
    from ..data.spirals import SpiralsDataset
    from ..data.multiseq import seq_collate_dict

    parser = argparse.ArgumentParser()
    parser.add_argument('--dir', type=str, default="./data/spirals")
    parser.add_argument('--subset', type=str, default="train")
    args = parser.parse_args()

    print("Loading data...")
    dataset = SpiralsDataset(['spiral-x', 'spiral-y'], args.dir,
                             args.subset, truncate=True,
                             item_as_dict=True)
    print("Building model...")
    model = MultiDMM(['spiral-x', 'spiral-y'], [1, 1])
    params, state = model.init(_jax.random.PRNGKey(0))
    print("Passing a sample through the model...")
    data, mask, lengths, order, _ = seq_collate_dict([dataset[0]])
    inputs = {m: jnp.asarray(v) for m, v in data.items()
              if m in model.modalities}
    (infer, prior, recon), _ = model.forward(
        params, state, inputs, rng=_jax.random.PRNGKey(1), sample=False)
    print("Predicted:")
    for x, y in zip(np.asarray(recon['spiral-x'][0]).ravel(),
                    np.asarray(recon['spiral-y'][0]).ravel()):
        print("{:+0.3f}, {:+0.3f}".format(x, y))
