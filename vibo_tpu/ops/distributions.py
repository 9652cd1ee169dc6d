"""Gaussian building blocks: reparameterized sampling, KL, log-densities.

Parity contract: SURVEY.md section 3.4; arXiv:2002.00276 section 4 (all
variational families are diagonal Gaussians with N(0, I) priors).

We parameterize scale as logvar (log sigma^2) to match the reference family's
convention for VAE-style encoders.

Beyond the reference, the `tril_*` family implements a FULL-covariance
Gaussian posterior via a Cholesky factor L: diag(L) = exp(0.5 * logvar),
strict lower triangle = `off` ((..., K(K-1)/2), row-major pair order
(1,0),(2,0),(2,1),...). `off=None` (or width 0) degrades every function to
the diagonal family bitwise. Motivation: at K>1 the mean-field q(theta)
matches the HMC gold posterior's MEANS but not its per-person WIDTHS
(measured 0.26 sd-correlation at K=4 vs 0.947 at K=1, RESULTS.md); the
correlated family adds only K(K-1)/2 numbers per person (6 at K=4) and all
its densities stay closed-form:

  z      = mu + L eps,            eps ~ N(0, I)
  KL     = 0.5 * (||mu||^2 + ||L||_F^2 - K - 2 log|det L|)
         = diag-KL + 0.5 * ||off||^2
  log q(z) at z = mu + L eps
         = -0.5 * (K log 2pi + sum(logvar) + ||eps||^2)      (no solve needed)
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


# ------------------------------------------- full-covariance (Cholesky) q

def tril_dim(k: int) -> int:
    """Number of strictly-lower-triangular entries of a (k, k) matrix."""
    return (k * (k - 1)) // 2


def tril_reparameterize_eps(eps: jax.Array, mu: jax.Array, logvar: jax.Array,
                            off: jax.Array | None = None) -> jax.Array:
    """z = mu + L eps with Cholesky factor L (see module docstring).

    eps/mu/logvar: (..., K); off: (..., K(K-1)/2) or None (diagonal family —
    bitwise identical to reparameterize_eps). The strict-lower mixing is an
    unrolled loop over K-1 tiny fused multiply-adds (K <= 8 in practice), so
    XLA fuses it into the surrounding elementwise chain — no (K, K) matmul,
    no batched triangular anything."""
    z = reparameterize_eps(eps, mu, logvar)
    if off is None or off.shape[-1] == 0:
        return z
    k = mu.shape[-1]
    if off.shape[-1] != tril_dim(k):
        raise ValueError(
            f"off has {off.shape[-1]} entries; K={k} needs {tril_dim(k)}")
    parts = [jnp.zeros(z.shape[:-1], z.dtype)]          # row 0: diag only
    idx = 0
    for i in range(1, k):
        w = off[..., idx:idx + i]                        # L[i, :i]
        parts.append((w * eps[..., :i]).sum(-1))
        idx += i
    return z + jnp.stack(parts, axis=-1)


def tril_reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array,
                        off: jax.Array | None = None) -> jax.Array:
    """Key-based form of tril_reparameterize_eps. Returns (z, eps): the
    noise is needed by tril_log_prob_from_eps (IWAE weights)."""
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return tril_reparameterize_eps(eps, mu, logvar, off), eps


def kl_standard_normal_tril(mu: jax.Array, logvar: jax.Array,
                            off: jax.Array | None = None) -> jax.Array:
    """PER-PERSON KL( N(mu, L L^T) || N(0, I) ), last axis reduced.

    tr(L L^T) = sum_i exp(logvar_i) + ||off||^2 and log|det LL^T| =
    sum_i logvar_i, so the closed form is the diagonal KL + 0.5 ||off||^2."""
    kl = kl_standard_normal(mu, logvar).sum(-1)
    if off is not None and off.shape[-1]:
        kl = kl + 0.5 * jnp.square(off).sum(-1)
    return kl


def tril_log_prob_from_eps(eps: jax.Array, logvar: jax.Array) -> jax.Array:
    """PER-PERSON log N(z; mu, L L^T) evaluated at z = mu + L eps.

    L^{-1}(z - mu) is exactly eps, so no triangular solve appears; `off`
    does not enter (the determinant is the diagonal's)."""
    k = eps.shape[-1]
    return -0.5 * (k * LOG2PI + logvar.sum(-1) + jnp.square(eps).sum(-1))


def tril_marginal_sigma(logvar: jax.Array, off: jax.Array | None = None
                        ) -> jax.Array:
    """Per-dimension MARGINAL posterior sds (..., K): sqrt(diag(L L^T)),
    i.e. row norms of L. off=None gives exp(0.5 * logvar)."""
    var = jnp.exp(logvar)
    if off is None or off.shape[-1] == 0:
        return jnp.sqrt(var)
    k = logvar.shape[-1]
    parts = [jnp.zeros(var.shape[:-1], var.dtype)]
    idx = 0
    for i in range(1, k):
        parts.append(jnp.square(off[..., idx:idx + i]).sum(-1))
        idx += i
    return jnp.sqrt(var + jnp.stack(parts, axis=-1))


def triu_flat_index(k: int):
    """(rows, cols) of the upper-triangle-incl-diagonal flat order used by
    the Fisher pair statistics: (0,0),(0,1),..,(0,K-1),(1,1),.. — the same
    np.triu_indices order evaluation.laplace_sigma_from_items assembles."""
    return [(i, j) for i in range(k) for j in range(i, k)]


def laplace_anchor_parts(c: jax.Array, s_flat: jax.Array):
    """(logvar, off) of the LAPLACE-ANCHORED posterior Cholesky.

    The amortized-width hybrid (round-4 VERDICT task #5): instead of
    predicting the posterior scale from scratch — which topped out at
    sd-correlation 0.62-0.64 vs the K=4 HMC gold while the closed-form
    Laplace width sits at 0.93-0.94 (RESULTS.md) — the encoder head
    predicts a small per-dim log correction c to the closed-form Fisher
    structure the data already determines:

        cov_i = (I_K + D_i S_i D_i)^{-1},   D_i = diag(exp(0.5 c_i)),

    with S_i = sum_j m_ij a_j a_j^T the per-person UNWEIGHTED information
    (one (B, M) x (M, K(K+1)/2) matmul — the same pair statistic the
    'stats' conditioning computes). The exact Bernoulli Fisher weight
    w_ij = p(1-p) in (0, 1/4] multiplies each item's rank-1 term; the head
    learns the per-person, per-dim part of that weight (c ~ log w-bar),
    while S_i carries the response-count and loading-direction structure
    that dominates width variation. c = log(1/4) recovers the worst-case
    Fisher bound exactly; the family nests the prior (c -> -inf).

    c (..., K); s_flat (..., K(K+1)/2) in triu_flat_index order.
    Returns (logvar, off) — 2 log diag(L) and strict-lower rows of
    L = chol(cov) — the exact (mu, logvar, off) token every tril_*
    consumer (sampling, KL, log q, marginal sigma, frame transport)
    already handles, so the family rides the chol machinery unchanged.
    Everything is unrolled over K (K <= 8): two tiny Cholesky
    factorizations and one triangular inverse as fused elementwise chains,
    no batched linalg primitives.
    """
    k = c.shape[-1]
    pairs = triu_flat_index(k)
    idx = {p: n for n, p in enumerate(pairs)}
    d = [jnp.exp(0.5 * c[..., i]) for i in range(k)]
    info = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i, k):
            v = d[i] * d[j] * s_flat[..., idx[(i, j)]]
            if i == j:
                v = v + 1.0
            info[i][j] = info[j][i] = v
    # R = chol(info), lower (Cholesky-Banachiewicz, unrolled)
    r = [[None] * k for _ in range(k)]
    for j in range(k):
        acc = info[j][j]
        for p in range(j):
            acc = acc - jnp.square(r[j][p])
        r[j][j] = jnp.sqrt(jnp.maximum(acc, 1e-12))
        for i in range(j + 1, k):
            acc = info[i][j]
            for p in range(j):
                acc = acc - r[i][p] * r[j][p]
            r[i][j] = acc / r[j][j]
    if k == 1:
        # diagonal family token: cov = 1 / info
        return -2.0 * jnp.log(r[0][0])[..., None], None
    # W = R^{-1} (lower, forward substitution unrolled)
    w = [[None] * k for _ in range(k)]
    for j in range(k):
        w[j][j] = 1.0 / r[j][j]
        for i in range(j + 1, k):
            acc = r[i][j] * w[j][j]
            for p in range(j + 1, i):
                acc = acc + r[i][p] * w[p][j]
            w[i][j] = -acc / r[i][i]
    # cov = info^{-1} = W^T W (symmetric)
    cov = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i, k):
            acc = 0.0
            for p in range(max(i, j), k):
                acc = acc + w[p][i] * w[p][j]
            cov[i][j] = cov[j][i] = acc
    # L = chol(cov)
    el = [[None] * k for _ in range(k)]
    for j in range(k):
        acc = cov[j][j]
        for p in range(j):
            acc = acc - jnp.square(el[j][p])
        el[j][j] = jnp.sqrt(jnp.maximum(acc, 1e-12))
        for i in range(j + 1, k):
            acc = cov[i][j]
            for p in range(j):
                acc = acc - el[i][p] * el[j][p]
            el[i][j] = acc / el[j][j]
    logvar = jnp.stack([2.0 * jnp.log(el[i][i]) for i in range(k)], axis=-1)
    off = jnp.stack([el[i][p] for i in range(1, k) for p in range(i)],
                    axis=-1)
    return logvar, off


def tril_matrix(logvar, off=None):
    """Materialize the (..., K, K) Cholesky factor L (cross-method frame
    transport of the full covariance; evaluation.rotate_tril_sigma)."""
    k = logvar.shape[-1]
    diag = jnp.exp(0.5 * logvar)
    rows = []
    idx = 0
    for i in range(k):
        cols = []
        if i and off is not None and off.shape[-1]:
            cols.append(off[..., idx:idx + i])
            idx += i
        elif i:
            cols.append(jnp.zeros(logvar.shape[:-1] + (i,), logvar.dtype))
        cols.append(diag[..., i:i + 1])
        if i + 1 < k:
            cols.append(jnp.zeros(logvar.shape[:-1] + (k - i - 1,),
                                  logvar.dtype))
        rows.append(jnp.concatenate(cols, axis=-1))
    return jnp.stack(rows, axis=-2)
