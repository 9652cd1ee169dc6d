"""Synthetic IRT response simulators with ground-truth parameters.

Samples theta ~ N(0, I_K), item params ~ N(0, I) (guess logits g~ ~ N(-1.5, 1)
so guess probs center near 0.18, classical for multiple-choice), responses
r_ij ~ Bernoulli(link(theta_i, d_j)); optional missing-at-random observation
mask. Returns ground truth for parameter-recovery correlation eval.

Parity contract: SURVEY.md section 3.3 "Synthetic IRT simulator" and
section 4.5; arXiv:2002.00276 section 6.1. Ground-truth recovery is the
reference family's de-facto integration test (SURVEY.md section 5).

Host-side NumPy (cheap, runs once); seeded and deterministic.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticIRT:
    """A simulated response matrix plus the ground truth that generated it."""
    response: np.ndarray        # (N, M) float32 in {0,1} (grm: {0..C-1})
    mask: np.ndarray            # (N, M) float32, 1 = observed (MAR missingness)
    theta: np.ndarray           # (N, K) true abilities
    a: np.ndarray               # (M, K) true discriminations (ones for 1PL;
                                # the item EMBEDDINGS d_j for "nonlinear")
    b: np.ndarray               # (M,)  true difficulties (grm: (M, C-1)
                                # ordered category thresholds kappa)
    g_hat: np.ndarray | None    # (M,)  true guess logits (3PL only)
    prob: np.ndarray            # (N, M) true response probabilities (grm:
                                # expected NORMALIZED score E[r]/(C-1))
    irt_model: str
    seed: int
    num_categories: int = 2     # grm only: ordinal categories C


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _nonlinear_logits(rng, theta, d, b):
    """Fixed random tanh-MLP link over [theta_i, d_j] pairs — the nonlinear
    generative family of arXiv:2002.00276 section 5.3 ("deep generative
    IRT"): response curves that are NOT of the form sigmoid(theta.a - b), so
    a bilinear 2PL is misspecified while VIBO's deep link (an MLP over
    (theta, d), models/networks.apply_deep_link) is correctly specified.

    Construction: h = tanh(W1 [theta; d] + c1); logits = scale * (w2 h)
    + quad * (theta . d)^2-ish interaction - b. The explicit multiplicative
    term guarantees curvature a bilinear form cannot absorb even if the
    random MLP happens to be near-linear at the sampled weights; weights are
    drawn from the SAME seeded rng stream so the dataset is reproducible."""
    k, kd = theta.shape[1], d.shape[1]
    hidden = 32
    w1 = rng.standard_normal((k + kd, hidden)) / np.sqrt(k + kd)
    c1 = rng.standard_normal(hidden) * 0.3
    w2 = rng.standard_normal(hidden) / np.sqrt(hidden)
    # pairwise interactions without a (N, M, k+kd) concat: split W1 into its
    # theta rows and d rows; the tanh couples the two projections nonlinearly
    t_proj = theta @ w1[:k]                      # (N, H)
    d_proj = d @ w1[k:] + c1                     # (M, H)
    h = np.tanh(t_proj[:, None, :] + d_proj[None, :, :])     # (N, M, H)
    mlp = h @ w2                                              # (N, M)
    inter = np.square(theta @ d.T) / np.sqrt(max(k, kd))      # (N, M)
    raw = 2.2 * mlp + 0.8 * inter
    # standardize to logit sd ~1.6 (the 2PL family's typical spread) so
    # held-out accuracy differences reflect link SHAPE, not logit scale;
    # clip the (heavy-tailed, via the squared interaction) extremes so no
    # probability saturates to exactly 0/1 in f32
    raw = (raw - raw.mean()) / (raw.std() + 1e-8) * 1.6
    return np.clip(raw - b[None, :], -10.0, 10.0)


def simulate_grm(num_persons: int, num_items: int, ability_dim: int = 1,
                 num_categories: int = 5, seed: int = 0,
                 missing_rate: float = 0.0) -> SyntheticIRT:
    """Simulate ordinal responses under Samejima's graded response model
    (the polytomous family of the VIBO journal extension arXiv:2108.11579):

      P(r_ij >= c) = sigmoid(a_j . theta_i - kappa_jc), kappa ordered.

    Thresholds are drawn as kappa_1 ~ N(-1, 0.5^2) with softplus(N(0, 1))
    increments (matching the model's unconstrained parameterization,
    ops.links.grm_thresholds), centered so categories are all populated.
    Sampling uses ONE uniform per cell: since P(>=c) is decreasing in c,
    r = #{c : u < P(>=c)} is an exact categorical draw."""
    rng = np.random.default_rng(seed)
    k, c = ability_dim, num_categories
    if c < 3:
        raise ValueError("simulate_grm needs num_categories >= 3")
    theta = rng.standard_normal((num_persons, k)).astype(np.float32)
    a = (rng.standard_normal((num_items, k)) / np.sqrt(k)).astype(np.float32)
    first = (-1.0 + 0.5 * rng.standard_normal((num_items, 1)))
    steps = np.logaddexp(0.0, rng.standard_normal((num_items, c - 2)))
    kappa = np.concatenate([first, first + np.cumsum(steps, -1)],
                           -1).astype(np.float32)
    base = theta @ a.T                                        # (N, M)
    p_ge = _sigmoid(base[..., None] - kappa[None])            # (N, M, C-1)
    u = rng.random((num_persons, num_items, 1))
    response = (u < p_ge).sum(-1).astype(np.float32)
    if missing_rate > 0.0:
        mask = (rng.random((num_persons, num_items))
                >= missing_rate).astype(np.float32)
    else:
        mask = np.ones((num_persons, num_items), dtype=np.float32)
    response = response * mask
    expected = p_ge.sum(-1).astype(np.float32) / (c - 1)      # E[r]/(C-1)
    return SyntheticIRT(response=response, mask=mask, theta=theta, a=a,
                        b=kappa, g_hat=None, prob=expected, irt_model="grm",
                        seed=seed, num_categories=c)


def simulate_gpcm(num_persons: int, num_items: int, ability_dim: int = 1,
                  num_categories: int = 5, seed: int = 0,
                  missing_rate: float = 0.0) -> SyntheticIRT:
    """Simulate ordinal responses under Muraki's generalized partial credit
    model (the second classical polytomous family next to the graded model):

      P(r_ij = c) = softmax_c( c * a_j . theta_i - sum_{v <= c} delta_jv ).

    Step parameters delta_jv ~ N(beta_j, 0.5^2) around an item location
    beta_j ~ N(0, 1) — the model's natural unconstrained coordinates
    (ops.links.gpcm_cumsteps; steps need no ordering), chosen so categories
    stay populated under theta ~ N(0, I). Sampling streams person blocks
    (the (B, M, C) probability tensor never exceeds ~block x M x C f32) and
    uses one uniform per cell against the category CDF. The `b` field holds
    the delta steps; `prob` the expected normalized score E[r]/(C-1)."""
    rng = np.random.default_rng(seed)
    k, c = ability_dim, num_categories
    if c < 3:
        raise ValueError("simulate_gpcm needs num_categories >= 3")
    theta = rng.standard_normal((num_persons, k)).astype(np.float32)
    a = (rng.standard_normal((num_items, k)) / np.sqrt(k)).astype(np.float32)
    beta = rng.standard_normal((num_items, 1))
    delta = (beta + 0.5 * rng.standard_normal((num_items, c - 1))
             ).astype(np.float32)
    kap = np.cumsum(delta, -1)                                # (M, C-1)
    cats = np.arange(1, c, dtype=np.float32)
    response = np.empty((num_persons, num_items), np.float32)
    expected = np.empty((num_persons, num_items), np.float32)
    for s in range(0, num_persons, 2048):
        e = min(s + 2048, num_persons)
        base = theta[s:e] @ a.T                               # (B, M)
        z = base[..., None] * cats - kap[None]                # (B, M, C-1)
        z = np.concatenate(
            [np.zeros(z.shape[:-1] + (1,), np.float32), z], -1)
        z -= z.max(-1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(-1, keepdims=True)                         # (B, M, C)
        cdf = np.cumsum(p[..., :-1], -1)                      # P(r <= c)
        u = rng.random((e - s, num_items, 1), np.float32)
        response[s:e] = (u > cdf).sum(-1)
        expected[s:e] = (p * np.arange(c, dtype=np.float32)).sum(-1) / (c - 1)
    if missing_rate > 0.0:
        mask = (rng.random((num_persons, num_items))
                >= missing_rate).astype(np.float32)
    else:
        mask = np.ones((num_persons, num_items), dtype=np.float32)
    response = response * mask
    return SyntheticIRT(response=response, mask=mask, theta=theta, a=a,
                        b=delta, g_hat=None, prob=expected, irt_model="gpcm",
                        seed=seed, num_categories=c)


def simulate_irt(irt_model: str, num_persons: int, num_items: int,
                 ability_dim: int = 1, seed: int = 0,
                 missing_rate: float = 0.0,
                 num_categories: int = 5) -> SyntheticIRT:
    """Simulate a dense binary response matrix under a 1PL/2PL/3PL model,
    under the NONLINEAR deep generative family ("nonlinear": fixed random
    tanh-MLP + multiplicative interaction link over (theta_i, d_j) — the
    data regime where the deep link earns its existence; see
    _nonlinear_logits), or ordinal responses under "grm" / "gpcm"
    (simulate_grm / simulate_gpcm; num_categories applies only there)."""
    if irt_model == "grm":
        return simulate_grm(num_persons, num_items, ability_dim,
                            num_categories, seed, missing_rate)
    if irt_model == "gpcm":
        return simulate_gpcm(num_persons, num_items, ability_dim,
                             num_categories, seed, missing_rate)
    if irt_model not in ("1pl", "2pl", "3pl", "nonlinear"):
        raise ValueError(f"simulate_irt supports 1pl/2pl/3pl/nonlinear/grm/"
                         f"gpcm, got {irt_model!r}")
    rng = np.random.default_rng(seed)
    k = ability_dim
    theta = rng.standard_normal((num_persons, k)).astype(np.float32)
    b = rng.standard_normal(num_items).astype(np.float32)
    if irt_model == "1pl":
        a = np.ones((num_items, k), dtype=np.float32)
        logits = theta.sum(-1, keepdims=True) - b[None, :]
    elif irt_model == "nonlinear":
        # item embeddings play the role of discriminations in the dataclass
        a = (rng.standard_normal((num_items, k)) / np.sqrt(k)).astype(np.float32)
        logits = _nonlinear_logits(rng, theta, a, 0.7 * b).astype(np.float32)
    else:
        # Discriminations scaled so the K-dim dot product keeps unit-ish scale
        # (a_jk ~ N(0,1)/sqrt(K)); keeps 2PL/3PL probabilities well-spread for
        # any ability_dim.
        a = (rng.standard_normal((num_items, k)) / np.sqrt(k)).astype(np.float32)
        logits = theta @ a.T - b[None, :]
    if irt_model == "3pl":
        g_hat = (rng.standard_normal(num_items) - 1.5).astype(np.float32)
        g = _sigmoid(g_hat)[None, :]
        prob = g + (1.0 - g) * _sigmoid(logits)
    else:
        g_hat = None
        prob = _sigmoid(logits)
    prob = prob.astype(np.float32)
    response = (rng.random((num_persons, num_items)) < prob).astype(np.float32)
    if missing_rate > 0.0:
        mask = (rng.random((num_persons, num_items)) >= missing_rate).astype(np.float32)
    else:
        mask = np.ones((num_persons, num_items), dtype=np.float32)
    # Unobserved responses are zeroed so they can never leak through a bug.
    response = response * mask
    return SyntheticIRT(response=response, mask=mask, theta=theta, a=a, b=b,
                        g_hat=g_hat, prob=prob, irt_model=irt_model, seed=seed)
