"""IRT link functions: response-probability logits from ability + item params.

Conventions (pinned per SURVEY.md section 3.4; reference mount empty so these
follow the paper, arXiv:2002.00276 section 3, and classical IRT):

- ability theta_i in R^K, prior N(0, I_K)
- 1PL (Rasch):  p(r_ij=1) = sigmoid( sum_k theta_ik - b_j )
  (multidimensional 1PL sums the ability dims; discrimination fixed at 1)
- 2PL:          p = sigmoid( a_j . theta_i - b_j )
- 3PL:          p = g_j + (1 - g_j) * sigmoid( a_j . theta_i - b_j ),
  with the guess probability parameterized unconstrained as g_j = sigmoid(g~_j)
- deep:         logit = MLP([theta_i, d_j]) — lives in models/networks.py since
  it carries parameters; here we only expose the linear-link family.

All functions are batched over leading axes by construction (plain matmuls),
so they vmap/pjit cleanly. The student x item contraction is a single MXU
matmul; keep K >= 1 static.

Shapes:
  theta: (..., B, K)   ability
  a:     (M, K)        discrimination
  b:     (M,)          difficulty
  g_hat: (M,)          unconstrained guess logit (3PL only)
  -> logits / probs: (..., B, M)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IRT_MODELS = ("1pl", "2pl", "3pl", "grm", "gpcm", "deep")

# The polytomous (ordinal, C >= 3 categories) families. Both share the item
# parameterization {a: (M, K), b: (M, C-1) unconstrained} and the linear
# predictor base = a . theta; they differ only in how the C-1 coordinates
# become the per-category table (categorical_table) and in the category
# distribution given (base, table) — cumulative logits (grm) vs
# adjacent-category logits (gpcm). Everything downstream (encoders, KLs,
# bit-codes, sharding, serving) treats them uniformly via this tuple.
CATEGORICAL_MODELS = ("grm", "gpcm")


def logits_1pl(theta: jax.Array, b: jax.Array) -> jax.Array:
    """Rasch logits: sum_k theta_k - b_j.  theta (...,B,K), b (M,) -> (...,B,M)."""
    return theta.sum(-1, keepdims=True) - b[..., None, :]


def logits_2pl(theta: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """2PL logits: a_j . theta_i - b_j.  theta (...,B,K), a (M,K), b (M,)."""
    return jnp.einsum("...bk,mk->...bm", theta, a) - b[..., None, :]


def logits_3pl(theta: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """The sigmoid-logit part of 3PL (guessing handled in the likelihood)."""
    return logits_2pl(theta, a, b)


def grm_thresholds(b_free: jax.Array) -> jax.Array:
    """Ordered GRM category thresholds from unconstrained parameters.

    b_free (..., M, C-1) -> kappa (..., M, C-1) with kappa strictly
    increasing along the last axis: kappa_1 = b_free[..., 0] and
    kappa_{c+1} = kappa_c + softplus(b_free[..., c]). The unconstrained
    coordinates carry the N(0, I) prior (and the Gaussian variational
    posterior), so the ordering constraint costs no Jacobian bookkeeping
    anywhere in the framework — the prior is DEFINED on the unconstrained
    space, exactly like 3PL's g_hat (graded response model, Samejima 1969;
    the polytomous family of the VIBO journal extension arXiv:2108.11579).
    """
    first = b_free[..., :1]
    if b_free.shape[-1] == 1:
        return first
    steps = jax.nn.softplus(b_free[..., 1:])
    return jnp.concatenate([first, first + jnp.cumsum(steps, axis=-1)], -1)


def grm_base(theta: jax.Array, a: jax.Array) -> jax.Array:
    """GRM linear predictor a_j . theta_i -> (..., B, M). The cumulative
    logit for category boundary c is base - kappa_c (grm_thresholds)."""
    return jnp.einsum("...bk,mk->...bm", theta, a)


def gpcm_cumsteps(b_free: jax.Array) -> jax.Array:
    """GPCM cumulative step sums from unconstrained step parameters.

    b_free (..., M, C-1) are the per-item step parameters delta_1..delta_{C-1}
    of Muraki's generalized partial credit model; the category-c logit is
    z_c = c * base - sum_{v <= c} delta_v (z_0 = 0), so the per-item table
    this returns is kap_c = cumsum(delta)_c. Unlike the graded model's
    thresholds, GPCM steps need NO ordering constraint — any real deltas give
    a valid categorical distribution (the softmax normalizes) — so the
    unconstrained coordinates ARE the natural parameters: the N(0, I) prior
    and the Gaussian variational posterior sit on them directly, and the
    only reparameterization the kernels differentiate through is this cumsum
    (generalized partial credit model, Muraki 1992; the second classical
    polytomous IRT family next to the journal extension's graded model,
    arXiv:2108.11579)."""
    return jnp.cumsum(b_free, axis=-1)


def categorical_table(irt_model: str, b_free: jax.Array) -> jax.Array:
    """(..., M, C-1) per-item category table from the unconstrained item
    coordinates: ordered thresholds (grm) or cumulative step sums (gpcm).
    The single dispatch point between the two polytomous families' item
    parameterizations — likelihood.categorical_* consume its output."""
    if irt_model == "grm":
        return grm_thresholds(b_free)
    if irt_model == "gpcm":
        return gpcm_cumsteps(b_free)
    raise ValueError(f"not a categorical irt_model: {irt_model!r}")


def prob_1pl(theta, b):
    return jax.nn.sigmoid(logits_1pl(theta, b))


def prob_2pl(theta, a, b):
    return jax.nn.sigmoid(logits_2pl(theta, a, b))


def prob_3pl(theta, a, b, g_hat):
    """3PL success probability: g + (1-g) * sigmoid(a.theta - b), g = sigmoid(g~)."""
    g = jax.nn.sigmoid(g_hat)[..., None, :]
    return g + (1.0 - g) * jax.nn.sigmoid(logits_3pl(theta, a, b))


def response_prob(irt_model: str, theta, item_params) -> jax.Array:
    """Dispatch: item_params is a dict with keys among {'a','b','g_hat'}."""
    if irt_model == "1pl":
        return prob_1pl(theta, item_params["b"])
    if irt_model == "2pl":
        return prob_2pl(theta, item_params["a"], item_params["b"])
    if irt_model == "3pl":
        return prob_3pl(theta, item_params["a"], item_params["b"], item_params["g_hat"])
    raise ValueError(f"unknown linear-link irt_model {irt_model!r} (deep link lives in models/)")
