"""Torch-CPU reference implementation of the 2PL VIBO training step.

Two roles (SURVEY.md section 8, step 1):
1. Independent numerical oracle for the JAX implementation (same math,
   different framework — used in tests/test_oracle.py).
2. The CPU-reference throughput baseline for bench.py's vs_baseline ratio:
   the reference repo is a PyTorch CPU/GPU codebase, so "cells/sec of a torch
   CPU ELBO train step with the same architecture" is the honest denominator
   for the [B] ">= 50x the CPU reference" target.

Architecture mirrors vibo_tpu.models.vibo exactly: free per-item Gaussian
posteriors, amortized ability encoder MLP([r*m, m, flat(item sample)]) ->
(mu, logvar), reparameterized 1-sample ELBO with analytic KLs.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


class TorchVIBO2PL(nn.Module):
    def __init__(self, num_items: int, ability_dim: int = 4,
                 hidden_dim: int = 256, conditional: bool = True):
        super().__init__()
        m, k = num_items, ability_dim
        self.m, self.k, self.conditional = m, k, conditional
        self.item_mu_a = nn.Parameter(0.1 * torch.randn(m, k))
        self.item_lv_a = nn.Parameter(-2.0 * torch.ones(m, k))
        self.item_mu_b = nn.Parameter(0.1 * torch.randn(m, 1))
        self.item_lv_b = nn.Parameter(-2.0 * torch.ones(m, 1))
        feat = m * (k + 1) if conditional else 0
        self.encoder = nn.Sequential(
            nn.Linear(2 * m + feat, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, 2 * k))

    def elbo(self, resp: torch.Tensor, mask: torch.Tensor) -> torch.Tensor:
        m, k = self.m, self.k
        # sample items
        a = self.item_mu_a + torch.exp(0.5 * self.item_lv_a) * torch.randn_like(self.item_mu_a)
        b = self.item_mu_b + torch.exp(0.5 * self.item_lv_b) * torch.randn_like(self.item_mu_b)
        x = torch.cat([resp * mask, mask], dim=-1)
        if self.conditional:
            feats = torch.cat([a.reshape(-1), b.reshape(-1)]).expand(resp.shape[0], -1)
            x = torch.cat([x, feats], dim=-1)
        out = self.encoder(x)
        mu, logvar = out[:, :k], out[:, k:].clamp(-8, 8)
        theta = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        logits = theta @ a.T - b[:, 0]
        ll = (mask * (resp * logits - torch.nn.functional.softplus(logits))).sum()
        kl_theta = 0.5 * (mu.pow(2) + logvar.exp() - logvar - 1).sum()
        kl_items = sum(0.5 * (p.pow(2) + q.exp() - q - 1).sum()
                       for p, q in ((self.item_mu_a, self.item_lv_a),
                                    (self.item_mu_b, self.item_lv_b)))
        return ll - kl_theta - kl_items


class TorchVIBOGRM(nn.Module):
    """Torch-CPU graded (GRM) VIBO step — the polytomous counterpart of
    TorchVIBO2PL, used as bench.py's CPU denominator for --irt-model grm.
    Same generative story as vibo_tpu's graded stack: ordered thresholds
    kappa via softplus-cumsum over C-1 unconstrained coordinates, stable
    cumulative-logit category log-probs (ops/likelihood.py identities)."""

    def __init__(self, num_items: int, ability_dim: int = 4,
                 hidden_dim: int = 256, num_categories: int = 5,
                 conditional: bool = True):
        super().__init__()
        m, k, c = num_items, ability_dim, num_categories
        self.m, self.k, self.c, self.conditional = m, k, c, conditional
        self.item_mu_a = nn.Parameter(0.1 * torch.randn(m, k))
        self.item_lv_a = nn.Parameter(-2.0 * torch.ones(m, k))
        self.item_mu_b = nn.Parameter(0.1 * torch.randn(m, c - 1))
        self.item_lv_b = nn.Parameter(-2.0 * torch.ones(m, c - 1))
        feat = m * (k + c - 1) if conditional else 0
        self.encoder = nn.Sequential(
            nn.Linear(2 * m + feat, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, 2 * k))

    def elbo(self, resp: torch.Tensor, mask: torch.Tensor) -> torch.Tensor:
        m, k, c = self.m, self.k, self.c
        a = self.item_mu_a + torch.exp(0.5 * self.item_lv_a) * torch.randn_like(self.item_mu_a)
        bf = self.item_mu_b + torch.exp(0.5 * self.item_lv_b) * torch.randn_like(self.item_mu_b)
        x = torch.cat([resp * mask, mask], dim=-1)
        if self.conditional:
            feats = torch.cat([a.reshape(-1), bf.reshape(-1)]).expand(resp.shape[0], -1)
            x = torch.cat([x, feats], dim=-1)
        out = self.encoder(x)
        mu, logvar = out[:, :k], out[:, k:].clamp(-8, 8)
        theta = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        base = theta @ a.T                                       # (B, M)
        kappa = torch.cat([bf[:, :1],
                           bf[:, :1] + torch.cumsum(
                               torch.nn.functional.softplus(bf[:, 1:]), -1)],
                          dim=-1)                                # (M, C-1)
        big = torch.full_like(kappa[:, :1], 50.0)
        lo = torch.cat([-big, kappa], -1)                        # (M, C)
        hi = torch.cat([kappa, big], -1)
        xx = base.unsqueeze(-1) - lo                             # (B, M, C)
        yy = base.unsqueeze(-1) - hi
        dd = torch.clamp(lo - hi, max=-1e-6)
        logp = (-torch.nn.functional.softplus(-xx)
                - torch.nn.functional.softplus(yy)
                + torch.log1p(-torch.exp(dd)))
        onehot = torch.nn.functional.one_hot(resp.long(), c).float()
        ll = (mask.unsqueeze(-1) * onehot * logp).sum()
        kl_theta = 0.5 * (mu.pow(2) + logvar.exp() - logvar - 1).sum()
        kl_items = sum(0.5 * (p.pow(2) + q.exp() - q - 1).sum()
                       for p, q in ((self.item_mu_a, self.item_lv_a),
                                    (self.item_mu_b, self.item_lv_b)))
        return ll - kl_theta - kl_items


class TorchVIBOGPCM(nn.Module):
    """Torch-CPU partial-credit (GPCM) VIBO step — bench.py's CPU
    denominator for --irt-model gpcm and the independent numerical oracle
    for the JAX partial-credit stack (tests/test_oracle.py). Same generative
    story as vibo_tpu's gpcm: adjacent-category softmax over
    z_c = c * (a . theta) - cumsum(delta)_c with z_0 = 0
    (ops/likelihood.py gpcm_*; steps are unconstrained)."""

    def __init__(self, num_items: int, ability_dim: int = 4,
                 hidden_dim: int = 256, num_categories: int = 5,
                 conditional: bool = True):
        super().__init__()
        m, k, c = num_items, ability_dim, num_categories
        self.m, self.k, self.c, self.conditional = m, k, c, conditional
        self.item_mu_a = nn.Parameter(0.1 * torch.randn(m, k))
        self.item_lv_a = nn.Parameter(-2.0 * torch.ones(m, k))
        self.item_mu_b = nn.Parameter(0.1 * torch.randn(m, c - 1))
        self.item_lv_b = nn.Parameter(-2.0 * torch.ones(m, c - 1))
        feat = m * (k + c - 1) if conditional else 0
        self.encoder = nn.Sequential(
            nn.Linear(2 * m + feat, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, 2 * k))

    def elbo(self, resp: torch.Tensor, mask: torch.Tensor) -> torch.Tensor:
        m, k, c = self.m, self.k, self.c
        a = self.item_mu_a + torch.exp(0.5 * self.item_lv_a) * torch.randn_like(self.item_mu_a)
        bf = self.item_mu_b + torch.exp(0.5 * self.item_lv_b) * torch.randn_like(self.item_mu_b)
        x = torch.cat([resp * mask, mask], dim=-1)
        if self.conditional:
            feats = torch.cat([a.reshape(-1), bf.reshape(-1)]).expand(resp.shape[0], -1)
            x = torch.cat([x, feats], dim=-1)
        out = self.encoder(x)
        mu, logvar = out[:, :k], out[:, k:].clamp(-8, 8)
        theta = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        base = theta @ a.T                                       # (B, M)
        kap = torch.cumsum(bf, dim=-1)                           # (M, C-1)
        cats = torch.arange(1, c, dtype=base.dtype)
        z = base.unsqueeze(-1) * cats - kap                      # (B, M, C-1)
        z = torch.cat([torch.zeros_like(z[..., :1]), z], dim=-1)
        logp = torch.log_softmax(z, dim=-1)                      # (B, M, C)
        onehot = torch.nn.functional.one_hot(resp.long(), c).float()
        ll = (mask.unsqueeze(-1) * onehot * logp).sum()
        kl_theta = 0.5 * (mu.pow(2) + logvar.exp() - logvar - 1).sum()
        kl_items = sum(0.5 * (p.pow(2) + q.exp() - q - 1).sum()
                       for p, q in ((self.item_mu_a, self.item_lv_a),
                                    (self.item_mu_b, self.item_lv_b)))
        return ll - kl_theta - kl_items


def time_cpu_reference(num_persons: int = 2048, num_items: int = 1024,
                       ability_dim: int = 4, hidden_dim: int = 256,
                       steps: int = 3, repeats: int = 7, seed: int = 0,
                       irt_model: str = "2pl", num_categories: int = 5
                       ) -> dict:
    """Pinned CPU-reference protocol: cells/sec of the torch-CPU VIBO train
    step, MEDIAN over `repeats` timed windows of `steps` steps each, with the
    min/max spread and the host load average recorded.

    Why median-of-N (round-3 VERDICT weak #4): this image's single
    virtualized core is shared and its hypervisor has bimodal paging epochs,
    so a single 3-step average ranged 4.2-7.0 M cells/s across rounds and
    moved the headline vs_baseline ratio with zero device-side change. The
    median over interleaved windows is stable against one contended window;
    the recorded spread and loadavg make any residual drift attributable."""
    import os
    import statistics
    import time
    torch.manual_seed(seed)
    if irt_model == "grm":
        model = TorchVIBOGRM(num_items, ability_dim, hidden_dim,
                             num_categories)
        resp = torch.randint(0, num_categories,
                             (num_persons, num_items)).float()
    elif irt_model == "gpcm":
        model = TorchVIBOGPCM(num_items, ability_dim, hidden_dim,
                              num_categories)
        resp = torch.randint(0, num_categories,
                             (num_persons, num_items)).float()
    else:
        model = TorchVIBO2PL(num_items, ability_dim, hidden_dim)
        resp = (torch.rand(num_persons, num_items) < 0.5).float()
    opt = torch.optim.Adam(model.parameters(), lr=5e-3)
    mask = (torch.rand(num_persons, num_items) < 0.9).float()

    def window() -> float:
        t0 = time.perf_counter()
        for _ in range(steps):
            loss = -model.elbo(resp, mask)
            loss.backward()
            opt.step()
            opt.zero_grad()
        return (time.perf_counter() - t0) / steps

    window()  # warmup (allocator, thread pool)
    dts = [window() for _ in range(repeats)]
    cells = num_persons * num_items
    rates = sorted(cells / dt for dt in dts)
    return {
        "cells_per_sec": statistics.median(rates),
        "cells_per_sec_min": rates[0],
        "cells_per_sec_max": rates[-1],
        "repeats": repeats,
        "steps_per_repeat": steps,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "torch_threads": torch.get_num_threads(),
    }


def time_cpu_reference_step(num_persons: int = 2048, num_items: int = 1024,
                            ability_dim: int = 4, hidden_dim: int = 256,
                            steps: int = 3, seed: int = 0) -> float:
    """Back-compat scalar form of time_cpu_reference (median cells/sec)."""
    return time_cpu_reference(num_persons, num_items, ability_dim,
                              hidden_dim, steps=steps,
                              seed=seed)["cells_per_sec"]
