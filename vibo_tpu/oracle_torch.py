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


def time_cpu_reference_step(num_persons: int = 2048, num_items: int = 1024,
                            ability_dim: int = 4, hidden_dim: int = 256,
                            steps: int = 3, seed: int = 0) -> float:
    """Return response-cells/sec of the torch-CPU full VIBO train step."""
    import time
    torch.manual_seed(seed)
    model = TorchVIBO2PL(num_items, ability_dim, hidden_dim)
    opt = torch.optim.Adam(model.parameters(), lr=5e-3)
    resp = (torch.rand(num_persons, num_items) < 0.5).float()
    mask = (torch.rand(num_persons, num_items) < 0.9).float()
    # warmup
    loss = -model.elbo(resp, mask)
    loss.backward()
    opt.step()
    opt.zero_grad()
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = -model.elbo(resp, mask)
        loss.backward()
        opt.step()
        opt.zero_grad()
    dt = (time.perf_counter() - t0) / steps
    return num_persons * num_items / dt
