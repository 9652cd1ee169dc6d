"""Unit tests for core ops vs closed forms and naive/scipy/torch oracles.

Mirrors SURVEY.md section 5's required unit tests: Gaussian KL vs hand
formula; masked Bernoulli log-lik vs a naive Python loop; link functions vs
scipy; IWAE >= ELBO and IWAE-1 ~= ELBO; jit determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special
import scipy.stats

from vibo_tpu.ops import distributions as dist
from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops import links, objectives


def test_kl_standard_normal_closed_form(rng):
    mu = rng.standard_normal((5, 3)).astype(np.float32)
    logvar = rng.standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(dist.kl_standard_normal(jnp.array(mu), jnp.array(logvar)))
    sigma2 = np.exp(logvar)
    want = 0.5 * (mu**2 + sigma2 - logvar - 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # KL(N(0,1) || N(0,1)) == 0
    z = jnp.zeros((4,))
    np.testing.assert_allclose(np.asarray(dist.kl_standard_normal(z, z)), 0.0, atol=1e-7)


def test_gaussian_log_prob_vs_scipy(rng):
    z = rng.standard_normal(10).astype(np.float32)
    mu = rng.standard_normal(10).astype(np.float32)
    logvar = (0.5 * rng.standard_normal(10)).astype(np.float32)
    got = np.asarray(dist.gaussian_log_prob(jnp.array(z), jnp.array(mu), jnp.array(logvar)))
    want = scipy.stats.norm.logpdf(z, loc=mu, scale=np.exp(0.5 * logvar))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got0 = np.asarray(dist.standard_normal_log_prob(jnp.array(z)))
    np.testing.assert_allclose(got0, scipy.stats.norm.logpdf(z), rtol=1e-5, atol=1e-5)


def test_reparameterize_moments():
    key = jax.random.key(0)
    mu = jnp.array([1.5, -2.0])
    logvar = jnp.array([0.0, 1.0])
    zs = jax.vmap(lambda k: dist.reparameterize(k, mu, logvar))(
        jax.random.split(key, 20000))
    np.testing.assert_allclose(np.asarray(zs.mean(0)), np.asarray(mu), atol=0.05)
    np.testing.assert_allclose(np.asarray(zs.var(0)), np.exp(np.asarray(logvar)),
                               rtol=0.05)


def test_links_vs_scipy(rng):
    b_, m, k = 7, 11, 3
    theta = rng.standard_normal((b_, k)).astype(np.float32)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    g_hat = rng.standard_normal(m).astype(np.float32)

    p1 = np.asarray(links.prob_1pl(jnp.array(theta), jnp.array(b)))
    want1 = scipy.special.expit(theta.sum(-1, keepdims=True) - b[None])
    np.testing.assert_allclose(p1, want1, rtol=1e-5, atol=1e-6)

    p2 = np.asarray(links.prob_2pl(jnp.array(theta), jnp.array(a), jnp.array(b)))
    want2 = scipy.special.expit(theta @ a.T - b[None])
    np.testing.assert_allclose(p2, want2, rtol=1e-5, atol=1e-6)

    p3 = np.asarray(links.prob_3pl(jnp.array(theta), jnp.array(a), jnp.array(b),
                                   jnp.array(g_hat)))
    g = scipy.special.expit(g_hat)[None]
    want3 = g + (1 - g) * want2
    np.testing.assert_allclose(p3, want3, rtol=1e-5, atol=1e-6)


def test_masked_loglik_vs_naive_loop(rng):
    b_, m = 6, 9
    logits = (3 * rng.standard_normal((b_, m))).astype(np.float32)
    resp = (rng.random((b_, m)) < 0.5).astype(np.float32)
    mask = (rng.random((b_, m)) < 0.7).astype(np.float32)
    got = np.asarray(lik.masked_loglik_per_person(
        jnp.array(logits), jnp.array(resp), jnp.array(mask)))
    want = np.zeros(b_)
    for i in range(b_):
        for j in range(m):
            if mask[i, j] > 0:
                p = scipy.special.expit(logits[i, j])
                want[i] += resp[i, j] * np.log(p) + (1 - resp[i, j]) * np.log1p(-p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_masked_loglik_3pl_vs_naive(rng):
    b_, m = 5, 8
    logits = (2 * rng.standard_normal((b_, m))).astype(np.float32)
    g_hat = rng.standard_normal(m).astype(np.float32)
    resp = (rng.random((b_, m)) < 0.5).astype(np.float32)
    mask = (rng.random((b_, m)) < 0.8).astype(np.float32)
    got = np.asarray(lik.bernoulli_loglik_3pl(
        jnp.array(logits), jnp.array(g_hat), jnp.array(resp), jnp.array(mask)))
    g = scipy.special.expit(g_hat)[None]
    pi = g + (1 - g) * scipy.special.expit(logits)
    want = mask * (resp * np.log(pi) + (1 - resp) * np.log1p(-pi))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_masked_loglik_extreme_logits_no_nan():
    logits = jnp.array([[1e4, -1e4, 0.0]])
    resp = jnp.array([[1.0, 0.0, 1.0]])
    mask = jnp.array([[0.0, 1.0, 1.0]])  # the 1e4 cell is masked out
    out = lik.masked_loglik_per_person(logits, resp, mask)
    assert np.isfinite(np.asarray(out)).all()
    out3 = lik.bernoulli_loglik_3pl(logits, jnp.array([-1.0, -1.0, -1.0]), resp, mask)
    assert np.isfinite(np.asarray(out3)).all()


def test_iwae_bound_properties(rng):
    # IWAE-1 == mean of single weight; bound increases (in expectation) with S.
    log_w = jnp.array(rng.standard_normal((100, 4)).astype(np.float32))
    b1 = objectives.iwae_bound(log_w[:1])
    np.testing.assert_allclose(np.asarray(b1), np.asarray(log_w[0]), rtol=1e-6)
    b100 = objectives.iwae_bound(log_w)
    # logsumexp/S of iid weights >= mean log weight (Jensen)
    assert (np.asarray(b100) >= np.asarray(log_w.mean(0)) - 1e-5).all()


def test_elbo_assembly():
    got = objectives.elbo(jnp.float32(-100.0), jnp.float32(5.0), jnp.float32(40.0),
                          item_scale=0.25)
    np.testing.assert_allclose(np.asarray(got), -100.0 - 5.0 - 10.0, rtol=1e-6)


def test_jit_determinism(rng):
    theta = jnp.array(rng.standard_normal((4, 2)).astype(np.float32))
    a = jnp.array(rng.standard_normal((6, 2)).astype(np.float32))
    b = jnp.array(rng.standard_normal(6).astype(np.float32))
    f = jax.jit(links.logits_2pl)
    np.testing.assert_array_equal(np.asarray(f(theta, a, b)),
                                  np.asarray(f(theta, a, b)))


# -------------------------------------------- full-covariance (Cholesky) q

def _tril_oracle(logvar, off):
    """Numpy oracle for ops.distributions.tril_matrix: row-major strict
    lower entries (1,0),(2,0),(2,1),... below diag exp(0.5 * logvar)."""
    k = logvar.shape[-1]
    L = np.zeros(logvar.shape[:-1] + (k, k), np.float64)
    idx = 0
    for i in range(k):
        L[..., i, i] = np.exp(0.5 * logvar[..., i])
        for j in range(i):
            L[..., i, j] = off[..., idx]
            idx += 1
    return L


def test_tril_matrix_layout(rng):
    k = 4
    logvar = rng.standard_normal((6, k)).astype(np.float32)
    off = rng.standard_normal((6, dist.tril_dim(k))).astype(np.float32)
    got = np.asarray(dist.tril_matrix(jnp.array(logvar), jnp.array(off)))
    np.testing.assert_allclose(got, _tril_oracle(logvar, off),
                               rtol=1e-5, atol=1e-6)


def test_tril_reparameterize_matches_matmul(rng):
    k = 4
    mu = rng.standard_normal((5, k)).astype(np.float32)
    logvar = rng.standard_normal((5, k)).astype(np.float32)
    off = rng.standard_normal((5, dist.tril_dim(k))).astype(np.float32)
    eps = rng.standard_normal((5, k)).astype(np.float32)
    got = np.asarray(dist.tril_reparameterize_eps(
        jnp.array(eps), jnp.array(mu), jnp.array(logvar), jnp.array(off)))
    L = _tril_oracle(logvar, off)
    want = mu + np.einsum("nij,nj->ni", L, eps)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tril_kl_closed_form_vs_full_covariance(rng):
    """KL(N(mu, L L^T) || N(0,I)) via the closed form must equal the direct
    full-covariance formula 0.5 (tr(S) + mu.mu - K - log|S|), S = L L^T."""
    k = 3
    mu = rng.standard_normal((8, k)).astype(np.float32)
    logvar = (0.5 * rng.standard_normal((8, k))).astype(np.float32)
    off = rng.standard_normal((8, dist.tril_dim(k))).astype(np.float32)
    got = np.asarray(dist.kl_standard_normal_tril(
        jnp.array(mu), jnp.array(logvar), jnp.array(off)))
    L = _tril_oracle(logvar, off)
    S = L @ np.swapaxes(L, -1, -2)
    want = 0.5 * (np.trace(S, axis1=-2, axis2=-1) + (mu ** 2).sum(-1)
                  - k - np.log(np.linalg.det(S)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # off=None degrades to the diagonal KL exactly
    got_d = np.asarray(dist.kl_standard_normal_tril(jnp.array(mu),
                                                    jnp.array(logvar)))
    want_d = np.asarray(dist.kl_standard_normal(jnp.array(mu),
                                                jnp.array(logvar)).sum(-1))
    np.testing.assert_array_equal(got_d, want_d)


def test_tril_log_prob_vs_scipy_multivariate(rng):
    """log q(z) at z = mu + L eps equals scipy's multivariate-normal logpdf
    with covariance L L^T (the eps form sidesteps the triangular solve)."""
    k = 3
    mu = rng.standard_normal(k).astype(np.float32)
    logvar = (0.5 * rng.standard_normal(k)).astype(np.float32)
    off = rng.standard_normal(dist.tril_dim(k)).astype(np.float32)
    eps = rng.standard_normal((10, k)).astype(np.float32)
    L = _tril_oracle(logvar, off)
    z = mu + eps @ L.T
    got = np.asarray(dist.tril_log_prob_from_eps(jnp.array(eps),
                                                 jnp.array(logvar)))
    want = scipy.stats.multivariate_normal.logpdf(z, mean=mu, cov=L @ L.T)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tril_marginal_sigma_vs_row_norms(rng):
    k = 4
    logvar = rng.standard_normal((7, k)).astype(np.float32)
    off = rng.standard_normal((7, dist.tril_dim(k))).astype(np.float32)
    got = np.asarray(dist.tril_marginal_sigma(jnp.array(logvar),
                                              jnp.array(off)))
    L = _tril_oracle(logvar, off)
    want = np.sqrt(np.einsum("nij,nij->ni", L, L))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_d = np.asarray(dist.tril_marginal_sigma(jnp.array(logvar)))
    np.testing.assert_allclose(got_d, np.exp(0.5 * logvar), rtol=1e-5)


def test_tril_zero_off_matches_diag_family(rng):
    """off = zeros must reproduce the diagonal family bitwise — training
    starts in the diagonal basin (zero-init head bias) by construction."""
    k = 3
    mu = jnp.array(rng.standard_normal((4, k)).astype(np.float32))
    logvar = jnp.array(rng.standard_normal((4, k)).astype(np.float32))
    eps = jnp.array(rng.standard_normal((4, k)).astype(np.float32))
    zero = jnp.zeros((4, dist.tril_dim(k)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(dist.tril_reparameterize_eps(eps, mu, logvar, zero)),
        np.asarray(dist.reparameterize_eps(eps, mu, logvar)))
    np.testing.assert_array_equal(
        np.asarray(dist.kl_standard_normal_tril(mu, logvar, zero)),
        np.asarray(dist.kl_standard_normal(mu, logvar).sum(-1)))


def test_tril_reparameterize_sample_covariance():
    """Empirical covariance of z = mu + L eps converges to L L^T."""
    k = 2
    mu = jnp.array([0.5, -1.0])
    logvar = jnp.array([0.2, -0.4])
    off = jnp.array([0.7])
    zs, _ = jax.vmap(lambda kk: dist.tril_reparameterize(kk, mu, logvar, off)
                     )(jax.random.split(jax.random.key(0), 40000))
    zs = np.asarray(zs)
    L = _tril_oracle(np.asarray(logvar), np.asarray(off))
    want = L @ L.T
    np.testing.assert_allclose(np.cov(zs.T), want, rtol=0.05, atol=0.02)
    np.testing.assert_allclose(zs.mean(0), np.asarray(mu), atol=0.02)


# ---------------------------------------------------------------- GRM ops

def _grm_probs_np(base, kappa):
    """Naive f64 oracle: (B, M, C) category probabilities."""
    big = 1e9
    lo = np.concatenate([np.full(kappa.shape[:-1] + (1,), -big), kappa], -1)
    hi = np.concatenate([kappa, np.full(kappa.shape[:-1] + (1,), big)], -1)
    sx = scipy.special.expit(base[..., None] - lo)
    sy = scipy.special.expit(base[..., None] - hi)
    return sx - sy


def test_grm_thresholds_ordered(rng):
    b_free = rng.standard_normal((7, 4)).astype(np.float32)
    kappa = np.asarray(links.grm_thresholds(jnp.array(b_free)))
    assert np.all(np.diff(kappa, axis=-1) > 0)
    np.testing.assert_allclose(kappa[:, 0], b_free[:, 0], rtol=1e-6)
    want = b_free[:, :1] + np.cumsum(np.logaddexp(0.0, b_free[:, 1:]), -1)
    np.testing.assert_allclose(kappa[:, 1:], want, rtol=1e-5, atol=1e-6)


def test_grm_logprob_all_vs_naive(rng):
    b_num, m, c = 6, 9, 5
    base = (1.5 * rng.standard_normal((b_num, m))).astype(np.float32)
    kappa = np.sort(rng.standard_normal((m, c - 1)), -1).astype(np.float32)
    got = np.asarray(lik.graded_logprob_all(jnp.array(base), jnp.array(kappa)))
    want = np.log(_grm_probs_np(base.astype(np.float64), kappa.astype(np.float64)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # probabilities sum to one per cell
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-5)


def test_grm_loglik_cells_matches_gather_of_all(rng):
    b_num, m, c = 5, 8, 4
    base = rng.standard_normal((b_num, m)).astype(np.float32)
    kappa = np.sort(rng.standard_normal((m, c - 1)), -1).astype(np.float32)
    resp = rng.integers(0, c, (b_num, m)).astype(np.float32)
    mask = (rng.random((b_num, m)) < 0.8).astype(np.float32)
    got = np.asarray(lik.graded_loglik_cells(
        jnp.array(base), jnp.array(kappa), jnp.array(resp), jnp.array(mask)))
    allp = np.asarray(lik.graded_logprob_all(jnp.array(base), jnp.array(kappa)))
    want = mask * np.take_along_axis(
        allp, resp[..., None].astype(np.int64), -1)[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # masked cells contribute exactly zero even with extreme inputs
    assert np.all(got[mask == 0] == 0.0)


def test_grm_extreme_base_saturates_cleanly(rng):
    """Round-4 advisor: at |base| approaching the +-50 sentinels, boundary
    categories used to pick up a spurious -softplus penalty (base -49,
    r=0: x = base + 50 = 1 -> -softplus(-1) ~ -0.31 instead of ~0). The
    _GRM_CLAMP saturation keeps boundary log-probs ~0 and category probs
    summing to 1 for ANY predictor magnitude (reachable via pure MLE, which
    places no bound on base)."""
    m, c = 6, 5
    kappa = np.sort(rng.standard_normal((m, c - 1)), -1).astype(np.float32)
    for mag in (45.0, 49.0, 200.0):
        base = np.full((3, m), -mag, np.float32)     # far left: r=0 certain
        ll0 = np.asarray(lik.graded_loglik_cells(
            jnp.array(base), jnp.array(kappa),
            jnp.zeros((3, m), np.float32), jnp.ones((3, m), np.float32)))
        assert np.all(ll0 > -1e-4), (mag, ll0.min())
        base = np.full((3, m), mag, np.float32)      # far right: r=C-1
        lltop = np.asarray(lik.graded_loglik_cells(
            jnp.array(base), jnp.array(kappa),
            jnp.full((3, m), c - 1, np.float32), jnp.ones((3, m), np.float32)))
        assert np.all(lltop > -1e-4), (mag, lltop.min())
        allp = np.exp(np.asarray(lik.graded_logprob_all(
            jnp.array(base), jnp.array(kappa))))
        np.testing.assert_allclose(allp.sum(-1), 1.0, atol=1e-5)


def test_grm_two_categories_match_bernoulli(rng):
    """C=2 GRM with kappa = b reduces exactly to the 2PL Bernoulli loglik."""
    b_num, m, k = 6, 7, 2
    theta = rng.standard_normal((b_num, k)).astype(np.float32)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((m,)).astype(np.float32)
    resp = rng.integers(0, 2, (b_num, m)).astype(np.float32)
    mask = (rng.random((b_num, m)) < 0.9).astype(np.float32)
    base = links.grm_base(jnp.array(theta), jnp.array(a))
    got = np.asarray(lik.graded_loglik_per_person(
        base, jnp.array(b)[:, None], jnp.array(resp), jnp.array(mask)))
    logits = links.logits_2pl(jnp.array(theta), jnp.array(a), jnp.array(b))
    want = np.asarray(lik.masked_loglik_per_person(
        logits, jnp.array(resp), jnp.array(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_grm_loglik_grads_finite_extreme(rng):
    """Gradients stay finite at extreme predictors and near-collapsed
    categories (the clamp in graded_loglik_cells)."""
    m, c = 4, 4
    base = jnp.array([[40.0, -40.0, 0.0, 5.0]])
    b_free = jnp.concatenate(
        [jnp.zeros((m, 1)), jnp.full((m, c - 2), -20.0)], -1)  # tiny steps
    resp = jnp.array([[0.0, 3.0, 1.0, 2.0]])
    mask = jnp.ones((1, m))

    def loss(bf):
        kappa = links.grm_thresholds(bf)
        return lik.graded_loglik_cells(base, kappa, resp, mask).sum()

    val, g = jax.value_and_grad(loss)(b_free)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- GPCM ops

def _gpcm_probs_np(base, kap):
    """Naive f64 oracle: (B, M, C) category probabilities under the
    generalized partial credit model, z_c = c*base - kap_c, z_0 = 0."""
    c = kap.shape[-1] + 1
    cats = np.arange(1, c, dtype=np.float64)
    z = base[..., None] * cats - kap
    z = np.concatenate([np.zeros(z.shape[:-1] + (1,)), z], -1)
    e = np.exp(z - z.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_gpcm_cumsteps_and_table_dispatch(rng):
    b_free = rng.standard_normal((7, 4)).astype(np.float32)
    kap = np.asarray(links.gpcm_cumsteps(jnp.array(b_free)))
    np.testing.assert_allclose(kap, np.cumsum(b_free, -1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(links.categorical_table("gpcm", jnp.array(b_free))), kap)
    np.testing.assert_allclose(
        np.asarray(links.categorical_table("grm", jnp.array(b_free))),
        np.asarray(links.grm_thresholds(jnp.array(b_free))))
    with pytest.raises(ValueError):
        links.categorical_table("2pl", jnp.array(b_free))


def test_gpcm_logprob_all_vs_naive(rng):
    b_num, m, c = 6, 9, 5
    base = (1.5 * rng.standard_normal((b_num, m))).astype(np.float32)
    kap = rng.standard_normal((m, c - 1)).astype(np.float32)  # unordered: OK
    got = np.asarray(lik.gpcm_logprob_all(jnp.array(base), jnp.array(kap)))
    want = np.log(_gpcm_probs_np(base.astype(np.float64),
                                 kap.astype(np.float64)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-5)
    # dispatcher agrees
    np.testing.assert_allclose(
        np.asarray(lik.categorical_logprob_all("gpcm", jnp.array(base),
                                               jnp.array(kap))), got)


def test_gpcm_loglik_cells_matches_gather_of_all(rng):
    b_num, m, c = 5, 8, 4
    base = rng.standard_normal((b_num, m)).astype(np.float32)
    kap = rng.standard_normal((m, c - 1)).astype(np.float32)
    resp = rng.integers(0, c, (b_num, m)).astype(np.float32)
    mask = (rng.random((b_num, m)) < 0.8).astype(np.float32)
    got = np.asarray(lik.gpcm_loglik_cells(
        jnp.array(base), jnp.array(kap), jnp.array(resp), jnp.array(mask)))
    allp = np.asarray(lik.gpcm_logprob_all(jnp.array(base), jnp.array(kap)))
    want = mask * np.take_along_axis(
        allp, resp[..., None].astype(np.int64), -1)[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert np.all(got[mask == 0] == 0.0)


def test_gpcm_two_categories_match_bernoulli(rng):
    """C=2 GPCM with kap = b reduces exactly to the 2PL Bernoulli loglik:
    softmax([0, base - b]) is sigmoid(base - b)."""
    b_num, m, k = 6, 7, 2
    theta = rng.standard_normal((b_num, k)).astype(np.float32)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((m,)).astype(np.float32)
    resp = rng.integers(0, 2, (b_num, m)).astype(np.float32)
    mask = (rng.random((b_num, m)) < 0.9).astype(np.float32)
    base = links.grm_base(jnp.array(theta), jnp.array(a))
    got = np.asarray(lik.gpcm_loglik_per_person(
        base, jnp.array(b)[:, None], jnp.array(resp), jnp.array(mask)))
    logits = links.logits_2pl(jnp.array(theta), jnp.array(a), jnp.array(b))
    want = np.asarray(lik.masked_loglik_per_person(
        logits, jnp.array(resp), jnp.array(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gpcm_extreme_base_stable(rng):
    """The GPCM softmax needs no sentinel/clamp: extreme predictors keep
    the certain category's log-prob ~0, probs summing to 1, grads finite."""
    m, c = 6, 5
    kap = np.cumsum(rng.standard_normal((m, c - 1)), -1).astype(np.float32)
    for mag in (45.0, 200.0, 1e4):
        base = np.full((3, m), -mag, np.float32)     # far left: r=0 certain
        ll0 = np.asarray(lik.gpcm_loglik_cells(
            jnp.array(base), jnp.array(kap),
            jnp.zeros((3, m), np.float32), jnp.ones((3, m), np.float32)))
        assert np.all(ll0 > -1e-4), (mag, ll0.min())
        base = np.full((3, m), mag, np.float32)      # far right: r=C-1
        lltop = np.asarray(lik.gpcm_loglik_cells(
            jnp.array(base), jnp.array(kap),
            jnp.full((3, m), c - 1, np.float32), jnp.ones((3, m), np.float32)))
        assert np.all(lltop > -1e-4), (mag, lltop.min())
        allp = np.exp(np.asarray(lik.gpcm_logprob_all(
            jnp.array(base), jnp.array(kap))))
        np.testing.assert_allclose(allp.sum(-1), 1.0, atol=1e-5)

    def loss(bf):
        return lik.gpcm_loglik_cells(
            jnp.full((1, m), 40.0), links.gpcm_cumsteps(bf),
            jnp.full((1, m), 1.0), jnp.ones((1, m))).sum()

    val, g = jax.value_and_grad(loss)(jnp.asarray(kap))
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(g)))


def test_gpcm_score_identities(rng):
    """The GPCM score wrt the linear predictor is r - E[c] and wrt kap_c is
    p_c - 1[r = c] — the exponential-family identities the fused kernel
    (ops/pallas_gpcm.py) hard-codes; pin them against autodiff here."""
    b_num, m, c = 4, 5, 4
    base = rng.standard_normal((b_num, m)).astype(np.float32)
    kap = rng.standard_normal((m, c - 1)).astype(np.float32)
    resp = rng.integers(0, c, (b_num, m)).astype(np.float32)
    mask = np.ones((b_num, m), np.float32)

    g_base = jax.grad(lambda x: lik.gpcm_loglik_cells(
        x, jnp.array(kap), jnp.array(resp), jnp.array(mask)).sum())(
        jnp.array(base))
    g_kap = jax.grad(lambda t: lik.gpcm_loglik_cells(
        jnp.array(base), t, jnp.array(resp), jnp.array(mask)).sum())(
        jnp.array(kap))
    p = _gpcm_probs_np(base.astype(np.float64), kap.astype(np.float64))
    cats = np.arange(c, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(g_base), resp - (p * cats).sum(-1),
                               rtol=1e-4, atol=1e-5)
    onehot = np.eye(c)[resp.astype(np.int64)]                  # (B, M, C)
    want_kap = (p - onehot)[..., 1:].sum(0)                    # (M, C-1)
    np.testing.assert_allclose(np.asarray(g_kap), want_kap, rtol=1e-4,
                               atol=1e-5)


def test_gpcm_fisher_weight_matches_autodiff(rng):
    """gpcm_fisher_weight == sum_c P_c (d log P_c / d eta)^2 from autodiff
    (= Var[c], the expected information wrt the linear predictor)."""
    c = 5
    kap = np.cumsum(rng.standard_normal((1, c - 1)), -1).astype(np.float32)
    eta = 0.7

    def logp_c(e, cat):
        return lik.gpcm_logprob_all(jnp.full((1, 1), e),
                                    jnp.asarray(kap))[0, 0, cat]

    w_auto = 0.0
    for cat in range(c):
        g = jax.grad(logp_c)(jnp.float32(eta), cat)
        w_auto += float(jnp.exp(logp_c(jnp.float32(eta), cat))) * float(g) ** 2
    w_got = float(lik.gpcm_fisher_weight(jnp.full((1, 1), eta),
                                         jnp.asarray(kap))[0, 0])
    np.testing.assert_allclose(w_got, w_auto, rtol=1e-4)
    np.testing.assert_allclose(
        float(lik.categorical_fisher_weight("gpcm", jnp.full((1, 1), eta),
                                            jnp.asarray(kap))[0, 0]),
        w_auto, rtol=1e-4)
