"""Training/eval objectives: ELBO and IWAE multi-sample bounds.

Parity contract: SURVEY.md section 3.4; arXiv:2002.00276 section 4 (ELBO with
analytic Gaussian KLs, item-KL scaled by batch_size/N under person
minibatching) and section 6.4 (IWAE-S bound, S ~= 100, for test log-lik).

These are assembly helpers over per-sample quantities the model computes; they
contain the minibatch-scaling and logsumexp conventions so every model/baseline
shares one implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elbo(loglik: jax.Array, kl_theta: jax.Array, kl_items: jax.Array,
         item_scale: float | jax.Array = 1.0) -> jax.Array:
    """ELBO = E_q[log p(r|theta,d)] - KL_theta - item_scale * KL_items.

    loglik:   scalar (or (S,) already averaged upstream) masked Bernoulli total
              for the minibatch, averaged over MC samples by the caller.
    kl_theta: scalar, sum of per-person ability KLs over the minibatch.
    kl_items: scalar, sum of per-item KLs (shared across the whole dataset).
    item_scale: batch_size / N_persons when minibatching persons, so the item
              KL is counted exactly once per epoch in expectation.
    """
    return loglik - kl_theta - item_scale * kl_items


def iwae_bound(log_w: jax.Array, axis: int = 0) -> jax.Array:
    """log (1/S) sum_s exp(log_w_s): the IWAE-S evidence lower bound.

    log_w: (S, ...) unnormalized importance log-weights
           log p(r, theta_s, d_s) - log q(theta_s, d_s).
    Returns the bound with the sample axis reduced. IWAE-1 equals the
    single-sample ELBO estimate; the bound is monotone in S.
    """
    s = log_w.shape[axis]
    return jax.scipy.special.logsumexp(log_w, axis=axis) - jnp.log(float(s))


def importance_log_weights(loglik_s: jax.Array,
                           log_p_theta_s: jax.Array,
                           log_q_theta_s: jax.Array,
                           log_p_items_s: jax.Array | None = None,
                           log_q_items_s: jax.Array | None = None,
                           item_scale: float | jax.Array = 1.0) -> jax.Array:
    """Per-sample joint log-weights for IWAE over a person minibatch.

    All inputs are (S,)-shaped totals for sample s. When the item posterior is
    sampled per IWAE sample, its prior/posterior terms enter scaled by
    item_scale (batch/N) like the ELBO's item KL.
    """
    log_w = loglik_s + log_p_theta_s - log_q_theta_s
    if log_p_items_s is not None:
        log_w = log_w + item_scale * (log_p_items_s - log_q_items_s)
    return log_w
