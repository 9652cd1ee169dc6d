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
