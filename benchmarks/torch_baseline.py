"""PyTorch-CPU baseline: Weizmann-shaped MDMM/BFVI training step.

An independent torch implementation of the reference's training
computation (written from the BFVI equations; NOT imported/copied from
/root/reference) used solely to measure the PyTorch-CPU seqs/sec that
`bench.py` reports `vs_baseline` against (BASELINE.md north star:
"Weizmann BFVI training ≥ 20× PyTorch-CPU seqs/sec").

Cost structure matches /root/reference/models/dmm.py:503-554 per step:
2 prior-matching rollouts + (1 + n_mods) filtering forwards +
(1 + n_mods) smoothing forwards (25 filter particles), one backward,
one Adam update — each forward a sequential loop over T timesteps.

Run:  python benchmarks/torch_baseline.py [--steps 3] [--t 25] [--b 25]
Writes benchmarks/baseline_result.json.
"""

import argparse
import json
import math
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

Z = H = 256
EPS = 1e-8
MIN_STD = 1e-3


class GaussianHead(nn.Module):
    def __init__(self, i, o, h):
        super().__init__()
        self.f = nn.Sequential(nn.Linear(i, h), nn.ReLU())
        self.mu = nn.Linear(h, o)
        self.sd = nn.Sequential(nn.Linear(h, o), nn.Softplus())

    def forward(self, x):
        h = self.f(x)
        return self.mu(h), self.sd(h) + MIN_STD


class GTF(nn.Module):
    def __init__(self, z, h):
        super().__init__()
        self.gate = nn.Sequential(nn.Linear(z, h), nn.ReLU(),
                                  nn.Linear(h, z), nn.Sigmoid())
        self.lin = nn.Linear(z, z)
        self.nonlin = nn.Sequential(nn.Linear(z, h), nn.ReLU(),
                                    nn.Linear(h, z))
        self.sd = nn.Sequential(nn.Linear(z, z), nn.Softplus())

    def forward(self, z):
        g = self.gate(z)
        nl = self.nonlin(z)
        return (1 - g) * self.lin(z) + g * nl, self.sd(nl) + MIN_STD


class ImgEnc(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(3, 16, 3, 2, 1), nn.BatchNorm2d(16), nn.ReLU(),
            nn.Conv2d(16, 32, 3, 2, 1), nn.BatchNorm2d(32), nn.ReLU(),
            nn.Conv2d(32, 64, 3, 2, 1))
        self.mu = nn.Linear(64 * 8 * 8, Z)
        self.sd = nn.Sequential(nn.Linear(64 * 8 * 8, Z), nn.Softplus())

    def forward(self, x):
        f = self.conv(x).flatten(1)
        return self.mu(f), self.sd(f)


class ImgDec(nn.Module):
    def __init__(self):
        super().__init__()
        self.lin = nn.Sequential(nn.Linear(Z, 64 * 8 * 8), nn.ReLU())
        self.deconv = nn.Sequential(
            nn.ConvTranspose2d(64, 32, 4, 2, 1), nn.BatchNorm2d(32),
            nn.ReLU(),
            nn.ConvTranspose2d(32, 16, 4, 2, 1), nn.BatchNorm2d(16),
            nn.ReLU(),
            nn.ConvTranspose2d(16, 3, 4, 2, 1), nn.Sigmoid())

    def forward(self, z):
        return (self.deconv(self.lin(z).view(-1, 64, 8, 8)),)


class EmbEnc(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.emb = nn.Sequential(nn.Embedding(n, H), nn.ReLU())
        self.head = GaussianHead(H, Z, H)

    def forward(self, x):
        return self.head(self.emb(x.long().squeeze(-1)))


class CatDec(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.f = nn.Sequential(nn.Linear(Z, H), nn.ReLU(),
                               nn.Linear(H, n), nn.Softmax(dim=-1))

    def forward(self, z):
        return (self.f(z),)


def poe(mean, std, mask=None):
    var = std.pow(2) + EPS
    T = 1.0 / var * std.sign()
    if mask is not None:
        mf = mask.float().unsqueeze(-1)
        T = T * mf
        mean = mean * mf
    pm = (mean * T).sum(0) / T.sum(0)
    pm = torch.nan_to_num(pm, nan=0.0)
    ps = (1.0 / T.sum(0)).pow(0.5)
    return pm, ps


def moe(mean, std):
    m = mean.mean(0)
    v = std.pow(2).mean(0) + mean.pow(2).mean(0) - m.pow(2)
    return m, v.clamp_min(0).pow(0.5)


class TorchMDMM(nn.Module):
    MODS = ("video", "person", "action")
    DISTS = {"video": "Bernoulli", "person": "Categorical",
             "action": "Categorical"}
    NCLS = {"person": 9, "action": 10}

    def __init__(self):
        super().__init__()
        self.enc = nn.ModuleDict({
            "video": ImgEnc(),
            "person": EmbEnc(9), "action": EmbEnc(10)})
        self.dec = nn.ModuleDict({
            "video": ImgDec(),
            "person": CatDec(9), "action": CatDec(10)})
        self.trans = nn.ModuleDict({"fwd": GTF(Z, H), "bwd": GTF(Z, H)})
        self.z0_mean = nn.Parameter(torch.zeros(1, Z))
        self.z0_log_std = nn.Parameter(torch.zeros(1, Z))

    def prior(self, b):
        return (self.z0_mean.expand(b, Z),
                (self.z0_log_std.exp() + MIN_STD).expand(b, Z))

    def encode(self, inputs, t, b):
        means, stds, masks = [], [], []
        for m in self.MODS:
            if m not in inputs:
                continue
            x = inputs[m]
            mask = ~torch.isnan(x.flatten(2)).any(-1)
            x = torch.nan_to_num(x, nan=0.0)
            mu, sd = self.enc[m](x.flatten(0, 1))
            means.append(mu.view(t, b, Z))
            stds.append(sd.view(t, b, Z))
            masks.append(mask)
        return torch.stack(means), torch.stack(stds), torch.stack(masks)

    def z_next(self, z, direction, glb):
        k = z.shape[0]
        qm, qs = self.trans[direction](z.flatten(0, 1))
        gm = glb[0].repeat(k, 1)
        gs = glb[1].repeat(k, 1)
        pm, ps = poe(torch.stack([gm, qm]), torch.stack([gs, qs]))
        if k == 1:
            return pm, ps
        return moe(pm.view(*z.shape), ps.view(*z.shape))

    def z_filter(self, means, stds, masks, direction, n_particles):
        t_max, b = means.shape[1:3]
        glb = self.prior(b)
        rv = (lambda x: list(reversed(x))) if direction == "bwd" \
            else (lambda x: x)
        pri_m, pri_s, inf_m, inf_s, samples = [], [], [], [], []
        z_t = None
        for t in rv(range(t_max)):
            if z_t is None:
                pm, ps = glb
            else:
                pm, ps = self.z_next(z_t, direction, glb)
            pri_m.append(pm)
            pri_s.append(ps)
            em = torch.cat([pm.unsqueeze(0), means[:, t]], 0)
            es = torch.cat([ps.unsqueeze(0), stds[:, t]], 0)
            mk = torch.cat([torch.ones(1, b, dtype=torch.bool),
                            masks[:, t]], 0)
            im, isd = poe(em, es, mk)
            inf_m.append(im)
            inf_s.append(isd)
            eps = torch.randn(n_particles, b, Z)
            z_t = im.unsqueeze(0) + eps * isd.unsqueeze(0)
            samples.append(z_t.mean(0))
        return ((torch.stack(rv(inf_m)), torch.stack(rv(inf_s))),
                (torch.stack(rv(pri_m)), torch.stack(rv(pri_s))),
                torch.stack(rv(samples)))

    def forward(self, inputs, mode, flt_particles=1):
        some = next(iter(inputs.values()))
        t_max, b = some.shape[:2]
        om, os_, omask = self.encode(inputs, t_max, b)
        direction = "fwd" if mode in ("ffilter", "bsmooth") else "bwd"
        infer, prior, z = self.z_filter(om, os_, omask, direction,
                                        flt_particles)
        if mode in ("fsmooth", "bsmooth"):
            direction = "fwd" if mode == "fsmooth" else "bwd"
            glb = self.prior(b)
            inv_m = glb[0].expand(t_max, b, Z)
            inv_s = -glb[1].expand(t_max, b, Z)
            fm, fs = prior
            fmask = torch.ones(t_max, b, dtype=torch.bool)
            fmask[-1] = False
            means = torch.cat([om, fm.unsqueeze(0), inv_m.unsqueeze(0)], 0)
            stds = torch.cat([os_, fs.unsqueeze(0), inv_s.unsqueeze(0)], 0)
            masks = torch.cat([omask, fmask.unsqueeze(0),
                               torch.ones(1, t_max, b,
                                          dtype=torch.bool)], 0)
            infer, prior, z = self.z_filter(means, stds, masks,
                                            direction, 1)
        recon = {m: tuple(r.view(t_max, b, *r.shape[1:]) for r in
                          self.dec[m](z.view(-1, Z)))
                 for m in self.MODS}
        return infer, prior, recon

    def loss(self, targets, infer, prior, recon, mask, kld_mult,
             rec_mults):
        im, isd = infer
        pm, ps = prior
        kld_el = (2 * ps.log() - 2 * isd.log()
                  + (isd.pow(2) + (im - pm).pow(2)) / ps.pow(2) - 1)
        loss = kld_mult * 0.5 * kld_el.masked_select(
            mask.expand_as(kld_el)).sum()
        for m in targets:
            x = targets[m]
            mk = (~torch.isnan(x)) * mask.view(
                list(mask.shape) + [1] * (x.dim() - mask.dim()))
            if self.DISTS[m] == "Bernoulli":
                loss = loss + rec_mults[m] * F.binary_cross_entropy(
                    recon[m][0].masked_select(mk.bool()),
                    torch.nan_to_num(x).masked_select(mk.bool()),
                    reduction="sum")
            else:
                probs = recon[m][0]
                sel = torch.stack(
                    [probs[:, :, k:k + 1].masked_select(mk.bool())
                     for k in range(probs.shape[2])], -1)
                loss = loss + rec_mults[m] * F.nll_loss(
                    sel, torch.nan_to_num(x).masked_select(
                        mk.bool()).long(), reduction="sum")
        return loss

    def step(self, inputs, mask, targets, rec_mults):
        loss = 0.0
        # prior matching (50 particles, fwd+bwd)
        for d in ("fwd", "bwd"):
            glb = self.prior(1)
            eps = torch.randn(50, 1, Z)
            z = glb[0].unsqueeze(0) + eps * glb[1].unsqueeze(0)
            nm, ns = self.z_next(z, d, glb)
            kld = (2 * ns.log() - 2 * (glb[1]).log()
                   + (glb[1].pow(2) + (glb[0] - nm).pow(2))
                   / ns.pow(2) - 1).sum() * 0.5
            loss = loss + 0.01 * mask.sum() * kld
        for mode, fp in (("bfilter", 1), ("fsmooth", 25)):
            infer, prior, recon = self.forward(inputs, mode, fp)
            loss = loss + 0.5 * self.loss(targets, infer, prior, recon,
                                          mask, 1.0, rec_mults)
            for m in self.MODS:
                infer, prior, recon = self.forward({m: inputs[m]}, mode,
                                                   fp)
                loss = loss + 0.5 * self.loss(
                    {m: targets[m]}, infer, prior, recon, mask, 1.0,
                    rec_mults)
        return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--t", type=int, default=25)
    ap.add_argument("--b", type=int, default=25)
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    args = ap.parse_args()
    torch.set_num_threads(args.threads)
    torch.manual_seed(0)

    model = TorchMDMM()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4,
                           weight_decay=1e-4)
    T, B = args.t, args.b
    video = torch.rand(T, B, 3, 64, 64)
    video[torch.rand(T, B) < 0.1] = float("nan")
    person = torch.randint(0, 9, (T, B, 1)).float()
    action = torch.randint(0, 10, (T, B, 1)).float()
    inputs = {"video": video, "person": person, "action": action}
    mask = torch.ones(T, B, 1, dtype=torch.bool)
    rec_mults = {"video": 1.0, "person": 10.0, "action": 10.0}

    times = []
    for i in range(args.steps):
        t0 = time.time()
        loss = model.step(inputs, mask, inputs, rec_mults)
        (loss / (T * B)).backward()
        opt.step()
        opt.zero_grad()
        dt = time.time() - t0
        times.append(dt)
        print(f"step {i}: {dt:.2f}s loss={float(loss):.1f}", flush=True)

    steady = times[1:] if len(times) > 1 else times  # drop warmup step
    med = sorted(steady)[len(steady) // 2]
    result = {
        "metric": "weizmann_bfvi_train_seqs_per_sec",
        "seqs_per_sec": B / med,
        "step_time_s": med,
        "T": T, "B": B,
        "threads": args.threads,
        "torch": torch.__version__,
        "provenance": "benchmarks/torch_baseline.py (independent torch "
                      "impl of the reference BFVI step cost structure)",
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "baseline_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
