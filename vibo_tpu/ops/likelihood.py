"""Missingness-masked Bernoulli log-likelihood over student x item matrices.

This is the hottest op in the framework: the [B] benchmark metric
(response-cells/sec/chip) is the throughput of exactly this reduction fused
with the link matmul. This module provides the numerically-stable pure-JAX
path; vibo_tpu.ops.pallas_elbo provides the fused Pallas TPU kernel behind the
same semantics (verified against this module in tests).

Parity contract: SURVEY.md sections 3.4, 4.1; arXiv:2002.00276 section 4
(only observed cells (i,j) in Omega contribute likelihood).

Stability notes:
- For plain-sigmoid links (1PL/2PL/deep), log Bernoulli(r | sigmoid(l)) =
  r*l - softplus(l), computed without forming probabilities.
- For 3PL with pi = g + (1-g)*sigmoid(l), g = sigmoid(g~):
    log(1-pi) = -softplus(g~) - softplus(l)
    log(pi)   = logaddexp( -softplus(-g~), -softplus(g~) - softplus(-l) )
  both exact and overflow-free.

Masks are float (1.0 observed / 0.0 missing); responses may be any float in
[0,1] (binary in practice). Both are multiplied in, so missing cells never
produce NaN/Inf even if their logits are extreme.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bernoulli_loglik_from_logits(logits: jax.Array, response: jax.Array,
                                 mask: jax.Array) -> jax.Array:
    """Elementwise masked log p(r | sigmoid(logit)): mask * (r*l - softplus(l))."""
    ll = response * logits - jax.nn.softplus(logits)
    return mask * ll


def bernoulli_loglik_3pl(logits: jax.Array, g_hat: jax.Array, response: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """Elementwise masked 3PL log-lik with guess prob g = sigmoid(g_hat).

    logits (...,B,M), g_hat (M,) or broadcastable to (...,B,M).
    """
    g_hat = jnp.broadcast_to(g_hat[..., None, :], logits.shape) if g_hat.ndim == 1 else g_hat
    log_pi = jnp.logaddexp(-jax.nn.softplus(-g_hat),
                           -jax.nn.softplus(g_hat) - jax.nn.softplus(-logits))
    log_1m_pi = -jax.nn.softplus(g_hat) - jax.nn.softplus(logits)
    return mask * (response * log_pi + (1.0 - response) * log_1m_pi)


# ------------------------------------------------ graded response model (GRM)
#
# Polytomous responses r in {0..C-1} under cumulative logits (Samejima's
# graded response model; the polytomous family of the VIBO journal extension
# arXiv:2108.11579):
#   P(r_ij >= c) = sigmoid(base_ij - kappa_jc),  c = 1..C-1, kappa ordered
#   P(r_ij = c)  = P(>= c) - P(>= c+1),   P(>= 0) = 1, P(>= C) = 0.
# Stable log-category-probability via the identity
#   sigmoid(x) - sigmoid(y) = sigmoid(x) * sigmoid(-y) * (1 - e^{y-x})  (x > y)
#   => log P = -softplus(-x) - softplus(y) + log1p(-exp(y - x))
# with x = base - kappa_r, y = base - kappa_{r+1}. Boundary categories use
# sentinel thresholds +-_GRM_BIG: the corresponding softplus/exp terms
# underflow to exactly the one-sided formulas (log sigmoid(-kappa-ish)), so
# one branch-free expression covers all C categories.
#
# TPU shape strategy: NO (B, M, C) tensor is formed on the training path —
# the per-cell thresholds kappa_r / kappa_{r+1} are gathered by an unrolled
# C-way select (C is small and static), so the hot path stays one MXU matmul
# (base) plus VPU elementwise work on (B, M) arrays, packed-int8 friendly.

_GRM_BIG = 50.0   # exp(-50) ~ 2e-22, softplus(-50) == 0.0 in f32

# The sentinel algebra needs |base| well below _GRM_BIG: at base ~ -50 the
# r=0 boundary term -softplus(-(base + BIG)) no longer underflows to 0 and
# leaks a spurious -log 2 into the loglik (round-4 advisor). Unreachable
# under N(0,I) priors/MAP, but pure MLE places no bound on the predictor —
# so the graded paths saturate base at +-_GRM_CLAMP, where every category
# probability is already converged to within exp(-20) of its limit.
_GRM_CLAMP = 30.0


def graded_loglik_cells(base: jax.Array, kappa: jax.Array, response: jax.Array,
                        mask: jax.Array) -> jax.Array:
    """Elementwise masked GRM log P(r | base, kappa).

    base (..., B, M) linear predictor; kappa (M, C-1) ordered thresholds
    (links.grm_thresholds); response (..., B, M) float categories in
    {0..C-1}; mask 1.0 observed / 0.0 missing.
    """
    base = jnp.clip(base, -_GRM_CLAMP, _GRM_CLAMP)
    cm1 = kappa.shape[-1]
    lo = jnp.full(base.shape, -_GRM_BIG, base.dtype)   # kappa_r     (r=0: -BIG)
    hi = jnp.full(base.shape, _GRM_BIG, base.dtype)    # kappa_{r+1} (r=C-1: +BIG)
    for c in range(cm1):
        kc = kappa[..., :, c]                          # (M,) -> broadcast (B, M)
        lo = jnp.where(response == c + 1, kc, lo)
        hi = jnp.where(response == c, kc, hi)
    x = base - lo
    y = base - hi
    # interior gap kappa_r - kappa_{r+1} = -softplus(step) < 0; clamp so a
    # collapsing category (step -> 0) saturates the loglik instead of
    # producing -inf/NaN gradients
    d = jnp.minimum(lo - hi, -1e-6)
    ll = -jax.nn.softplus(-x) - jax.nn.softplus(y) + jnp.log1p(-jnp.exp(d))
    return mask * ll


def graded_logprob_all(base: jax.Array, kappa: jax.Array) -> jax.Array:
    """All-category GRM log-probabilities -> (..., B, M, C).

    Evaluation-path form (imputation argmax, calibration): materializes the
    category axis, so callers stream person blocks. Same stable expression
    as graded_loglik_cells with the category axis vectorized."""
    base = jnp.clip(base, -_GRM_CLAMP, _GRM_CLAMP)
    big = jnp.array(_GRM_BIG, base.dtype)
    pad = jnp.full(kappa.shape[:-1] + (1,), 1.0, kappa.dtype)
    lo = jnp.concatenate([-big * pad, kappa], -1)      # (M, C): kappa_c
    hi = jnp.concatenate([kappa, big * pad], -1)       # (M, C): kappa_{c+1}
    x = base[..., None] - lo                            # (..., B, M, C)
    y = base[..., None] - hi
    d = jnp.minimum(lo - hi, -1e-6)
    return -jax.nn.softplus(-x) - jax.nn.softplus(y) + jnp.log1p(-jnp.exp(d))


def graded_loglik_per_person(base: jax.Array, kappa: jax.Array,
                             response: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked GRM log-lik summed over the item axis -> (..., B)."""
    return graded_loglik_cells(base, kappa, response, mask).sum(-1)


# --------------------------------------- generalized partial credit (GPCM)
#
# Polytomous responses r in {0..C-1} under adjacent-category logits
# (Muraki's generalized partial credit model — the second classical
# polytomous family next to the graded model above):
#   P(r_ij = c) = softmax_c( z_c ),  z_c = c * base_ij - kap_jc,
# with kap_jc = sum_{v <= c} delta_jv (links.gpcm_cumsteps) and z_0 = 0.
# The softmax is exactly stable under max-subtraction, so unlike the GRM
# there is no sentinel algebra and no clamp: any real (base, delta) is fine.
#
# TPU shape strategy mirrors the graded path: NO (B, M, C) tensor on the
# training path — the C-way logit scan unrolls (C small, static) into
# mul-adds on (B, M) arrays with a streaming max, then C-1 exps feed one
# log. The observed category's logit z_r is gathered by the same unrolled
# select. Gradients are the textbook softmax forms: d ll / d base =
# r - E[c] (observed minus expected category) and d ll / d kap_c =
# p_c - 1[r = c] — which is what makes the fused kernel (ops/pallas_gpcm)
# even cheaper than the graded one.


def gpcm_loglik_cells(base: jax.Array, kap: jax.Array, response: jax.Array,
                      mask: jax.Array) -> jax.Array:
    """Elementwise masked GPCM log P(r | base, kap).

    base (..., B, M) linear predictor; kap (M, C-1) cumulative step sums
    (links.gpcm_cumsteps); response (..., B, M) float categories in
    {0..C-1}; mask 1.0 observed / 0.0 missing."""
    cm1 = kap.shape[-1]
    zr = jnp.zeros_like(base)                      # z_0 = 0 (category 0)
    mx = jnp.zeros_like(base)                      # running max over z_c
    zs = []
    for c in range(cm1):
        z = (c + 1) * base - kap[..., :, c]
        zs.append(z)
        zr = jnp.where(response == c + 1, z, zr)
        mx = jnp.maximum(mx, z)
    s = jnp.exp(-mx)                               # category-0 term
    for z in zs:
        s = s + jnp.exp(z - mx)
    return mask * (zr - mx - jnp.log(s))


def gpcm_logprob_all(base: jax.Array, kap: jax.Array) -> jax.Array:
    """All-category GPCM log-probabilities -> (..., B, M, C).

    Evaluation-path form (imputation argmax, calibration): materializes the
    category axis, so callers stream person blocks."""
    cm1 = kap.shape[-1]
    cats = jnp.arange(1, cm1 + 1, dtype=base.dtype)            # (C-1,)
    z = base[..., None] * cats - kap                           # (..., B, M, C-1)
    z = jnp.concatenate([jnp.zeros(z.shape[:-1] + (1,), z.dtype), z], -1)
    return jax.nn.log_softmax(z, axis=-1)


def gpcm_loglik_per_person(base: jax.Array, kap: jax.Array,
                           response: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked GPCM log-lik summed over the item axis -> (..., B)."""
    return gpcm_loglik_cells(base, kap, response, mask).sum(-1)


def gpcm_fisher_weight(base: jax.Array, kap: jax.Array) -> jax.Array:
    """GPCM: w = Var[c] under the category softmax — since d ll / d base =
    r - E[c], the expected information wrt the linear predictor is exactly
    the category variance (the polytomous exponential-family analog of
    p(1-p)). Materializes the (B, M, C) category axis; callers on big
    matrices should stream person blocks."""
    p = jnp.exp(gpcm_logprob_all(base, kap))                   # (..., B, M, C)
    cats = jnp.arange(p.shape[-1], dtype=p.dtype)
    e1 = (p * cats).sum(-1)
    e2 = (p * cats * cats).sum(-1)
    return e2 - e1 * e1


# ------------------------------------- categorical (polytomous) dispatchers
#
# Single switch between the two polytomous families for every consumer
# (VIBO decode, MLE/EM/HMC potentials, evaluation, serving). `table` is the
# family's per-item category table — links.categorical_table(irt_model,
# b_free): ordered thresholds (grm) or cumulative step sums (gpcm).

def categorical_loglik_cells(irt_model: str, base, table, response, mask):
    if irt_model == "grm":
        return graded_loglik_cells(base, table, response, mask)
    if irt_model == "gpcm":
        return gpcm_loglik_cells(base, table, response, mask)
    raise ValueError(f"not a categorical irt_model: {irt_model!r}")


def categorical_loglik_per_person(irt_model: str, base, table, response, mask):
    return categorical_loglik_cells(irt_model, base, table, response,
                                    mask).sum(-1)


def categorical_logprob_all(irt_model: str, base, table):
    if irt_model == "grm":
        return graded_logprob_all(base, table)
    if irt_model == "gpcm":
        return gpcm_logprob_all(base, table)
    raise ValueError(f"not a categorical irt_model: {irt_model!r}")


def categorical_fisher_weight(irt_model: str, base, table):
    if irt_model == "grm":
        return graded_fisher_weight(base, table)
    if irt_model == "gpcm":
        return gpcm_fisher_weight(base, table)
    raise ValueError(f"not a categorical irt_model: {irt_model!r}")


# ------------------------------------------------- expected Fisher weights
#
# Per-cell expected information of the linear predictor eta — the w_ij in
# the closed-form Laplace ability covariance (I + sum_j m_ij w_ij a_j
# a_j^T)^-1 (evaluation.laplace_sigma_from_items holds the numpy eval-path
# twins). These jax forms feed the Fisher-ANCHORED variational family's
# weighted pair statistics (models/vibo.VIBO._anchor_theta_head).

def bernoulli_fisher_weight(logits: jax.Array) -> jax.Array:
    """w = p(1-p) for the 1PL/2PL Bernoulli likelihood."""
    s = jax.nn.sigmoid(logits)
    return s * (1.0 - s)


def fisher_weight_3pl(logits: jax.Array, g_hat: jax.Array) -> jax.Array:
    """3PL: w = ((1-g) s(1-s))^2 / (p(1-p)), g = sigmoid(g_hat) (M,)."""
    g = jax.nn.sigmoid(g_hat)[..., None, :]
    s = jax.nn.sigmoid(logits)
    p = g + (1.0 - g) * s
    num = jnp.square((1.0 - g) * s * (1.0 - s))
    return num / jnp.clip(p * (1.0 - p), 1e-12, None)


def graded_fisher_weight(base: jax.Array, kappa: jax.Array) -> jax.Array:
    """GRM: w = sum_c (s'_c - s'_{c+1})^2 / P_c with s_c = sigmoid(base -
    kappa_c), boundary derivatives 0 — the polytomous generalization of
    p(1-p). Materializes the (B, M, C) category axis; callers on big
    matrices should stream person blocks."""
    sc = jax.nn.sigmoid(base[..., None] - kappa)            # (..., B, M, C-1)
    z = jnp.zeros(sc.shape[:-1] + (1,), sc.dtype)
    s_lo = jnp.concatenate([jnp.ones_like(z), sc], -1)       # P(>= c)
    s_hi = jnp.concatenate([sc, z], -1)                      # P(>= c+1)
    pcat = jnp.clip(s_lo - s_hi, 1e-12, None)
    d = sc * (1.0 - sc)
    d_lo = jnp.concatenate([z, d], -1)
    d_hi = jnp.concatenate([d, z], -1)
    return (jnp.square(d_lo - d_hi) / pcat).sum(-1)


def masked_loglik_per_person(logits: jax.Array, response: jax.Array, mask: jax.Array,
                             g_hat: jax.Array | None = None) -> jax.Array:
    """Sum the masked Bernoulli log-lik over the item axis -> (..., B)."""
    if g_hat is None:
        cells = bernoulli_loglik_from_logits(logits, response, mask)
    else:
        cells = bernoulli_loglik_3pl(logits, g_hat, response, mask)
    return cells.sum(-1)


def masked_loglik_total(logits, response, mask, g_hat=None) -> jax.Array:
    """Scalar masked log-likelihood over all cells."""
    return masked_loglik_per_person(logits, response, mask, g_hat).sum()
