"""Gaussian building blocks: reparameterized sampling, KL, log-densities.

Parity contract: SURVEY.md section 3.4; arXiv:2002.00276 section 4 (all
variational families are diagonal Gaussians with N(0, I) priors).

We parameterize scale as logvar (log sigma^2) to match the reference family's
convention for VAE-style encoders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG2PI = 1.8378770664093453  # log(2*pi)


def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mu + sigma * eps, eps ~ N(0, I). Differentiable w.r.t. mu, logvar."""
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return reparameterize_eps(eps, mu, logvar)


def reparameterize_eps(eps: jax.Array, mu: jax.Array, logvar: jax.Array
                       ) -> jax.Array:
    """Reparameterization with exogenous noise: z = mu + sigma * eps.

    Used by the shard_map data-parallel step (train/trainer.py), where noise
    is generated OUTSIDE the shard with JAX's partitionable RNG so the
    sharded computation is deterministic and device-count-invariant."""
    return mu + jnp.exp(0.5 * logvar) * eps


def kl_standard_normal(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Elementwise KL( N(mu, exp(logvar)) || N(0, 1) ).

    Closed form: 0.5 * (mu^2 + sigma^2 - logvar - 1). Sum over trailing event
    dims at the call site.
    """
    return 0.5 * (jnp.square(mu) + jnp.exp(logvar) - logvar - 1.0)


def gaussian_log_prob(z: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Elementwise log N(z; mu, exp(logvar))."""
    return -0.5 * (LOG2PI + logvar + jnp.square(z - mu) * jnp.exp(-logvar))


def standard_normal_log_prob(z: jax.Array) -> jax.Array:
    """Elementwise log N(z; 0, 1)."""
    return -0.5 * (LOG2PI + jnp.square(z))
