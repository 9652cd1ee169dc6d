"""One-pass fused partial-credit (GPCM) training kernel vs the pure-JAX
reference (interpret mode on CPU; compiled on real TPU via the kernel smoke
script). Mirrors tests/test_pallas_grm.py's contract for the graded kernel:
value parity, uniform-cotangent gradient parity (theta exact for ANY
cotangent), vmap over the MC-sample axis, ragged tiles, and the model-level
use_pallas==plain equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops import links
from vibo_tpu.ops.pallas_elbo import pack_responses
from vibo_tpu.ops.pallas_gpcm import masked_loglik_gpcm_packed_train


def _inputs(rng, bsz, m, k, c):
    theta = jnp.asarray(rng.standard_normal((bsz, k)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    b_free = jnp.asarray(rng.standard_normal((m, c - 1)).astype(np.float32))
    resp = jnp.asarray(rng.integers(0, c, (bsz, m)).astype(np.float32))
    mask = jnp.asarray((rng.random((bsz, m)) < 0.8).astype(np.float32))
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
    return theta, a, b_free, resp, mask, packed


def _ref(theta, a, b_free, resp, mask):
    return lik.gpcm_loglik_per_person(
        links.grm_base(theta, a), links.gpcm_cumsteps(b_free), resp, mask)


@pytest.mark.parametrize("shape", [(8, 128, 1, 3), (16, 200, 4, 5),
                                   (300, 640, 2, 7)])
def test_gpcm_forward_matches_reference(rng, shape):
    bsz, m, k, c = shape
    theta, a, b_free, resp, mask, packed = _inputs(rng, bsz, m, k, c)
    got = masked_loglik_gpcm_packed_train(
        theta, a, links.gpcm_cumsteps(b_free), packed, interpret=True)
    want = _ref(theta, a, b_free, resp, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_gpcm_gradients_match_reference(rng):
    """Uniform-cotangent grads == XLA autodiff of the pure likelihood,
    INCLUDING the chain through the cumsum step reparameterization (the
    kernel emits dkap; JAX chains it to the unconstrained steps)."""
    theta, a, b_free, resp, mask, packed = _inputs(rng, 56, 300, 4, 5)

    def loss_kernel(theta, a, b_free):
        return masked_loglik_gpcm_packed_train(
            theta, a, links.gpcm_cumsteps(b_free), packed,
            interpret=True).sum()

    def loss_ref(theta, a, b_free):
        return _ref(theta, a, b_free, resp, mask).sum()

    v1 = loss_kernel(theta, a, b_free)
    v2 = loss_ref(theta, a, b_free)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(theta, a, b_free)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, a, b_free)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-5, atol=3e-4)

    # scaled-uniform cotangent (the mean-over-samples case) stays exact
    g3 = jax.grad(lambda t: 0.25 * loss_kernel(t, a, b_free))(theta)
    g4 = jax.grad(lambda t: 0.25 * loss_ref(t, a, b_free))(theta)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4),
                               rtol=3e-5, atol=3e-4)


def test_gpcm_dtheta_exact_for_nonuniform_cotangent(rng):
    """dtheta is exact for ANY per-person weighting (the contract's strong
    half); only da/dkap require uniformity."""
    theta, a, b_free, resp, mask, packed = _inputs(rng, 24, 130, 2, 4)
    w = jnp.asarray(rng.random(24).astype(np.float32)) + 0.5
    kap = links.gpcm_cumsteps(b_free)

    g1 = jax.grad(lambda t: (w * masked_loglik_gpcm_packed_train(
        t, a, kap, packed, interpret=True)).sum())(theta)
    g2 = jax.grad(lambda t: (w * _ref(t, a, b_free, resp, mask)).sum())(theta)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=3e-5, atol=3e-4)


def test_gpcm_vmap_sample_axis(rng):
    """vmap over the MC-sample axis with per-sample item draws (the
    elbo_packed usage pattern)."""
    theta, a, b_free, resp, mask, packed = _inputs(rng, 16, 130, 2, 5)
    s = 3
    thetas = jnp.stack([theta, theta + 0.1, theta - 0.1])
    as_ = jnp.stack([a, a * 1.05, a * 0.95])
    kaps = jnp.stack([links.gpcm_cumsteps(b_free + 0.01 * i)
                      for i in range(s)])

    def loss(thetas, as_, kaps):
        return masked_loglik_gpcm_packed_train(
            thetas, as_, kaps, packed, interpret=True).sum(-1).mean()

    v = loss(thetas, as_, kaps)
    g = jax.grad(loss, argnums=(0, 1, 2))(thetas, as_, kaps)
    assert np.isfinite(float(v))
    for x in g:
        assert np.isfinite(np.asarray(x)).all()
    # per-sample rows equal the single-sample kernel
    got = masked_loglik_gpcm_packed_train(
        thetas, as_, kaps, packed, interpret=True)
    for i, (t, aa, kk) in enumerate([(theta, a, 0.0), (theta + 0.1, a * 1.05,
                                                       0.01),
                                     (theta - 0.1, a * 0.95, 0.02)]):
        want = _ref(t, aa, b_free + kk, resp, mask)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gpcm_random_ragged_shapes(seed):
    """Random non-tile-multiple shapes and category counts: padding is inert."""
    rng = np.random.default_rng(200 + seed)
    bsz = int(rng.integers(3, 90))
    m = int(rng.integers(5, 700))
    k = int(rng.integers(1, 6))
    c = int(rng.integers(3, 9))
    theta, a, b_free, resp, mask, packed = _inputs(rng, bsz, m, k, c)
    kap = links.gpcm_cumsteps(b_free)
    got = masked_loglik_gpcm_packed_train(theta, a, kap, packed,
                                          interpret=True)
    want = _ref(theta, a, b_free, resp, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-4)
    g1 = jax.grad(lambda t, aa, bf: masked_loglik_gpcm_packed_train(
        t, aa, links.gpcm_cumsteps(bf), packed, interpret=True).sum(),
        argnums=(0, 1, 2))(theta, a, b_free)
    g2 = jax.grad(lambda t, aa, bf: _ref(t, aa, bf, resp, mask).sum(),
                  argnums=(0, 1, 2))(theta, a, b_free)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-5, atol=5e-4)


def test_gpcm_many_categories_fall_back_to_xla(rng):
    """Above _MAX_FUSED_CATEGORIES the wrapper routes to the XLA twin (the
    fused kernel would hold C-1 tile-sized exponential registers)."""
    theta, a, b_free, resp, mask, packed = _inputs(rng, 12, 40, 2, 20)
    got = masked_loglik_gpcm_packed_train(
        theta, a, links.gpcm_cumsteps(b_free), packed, interpret=True)
    want = _ref(theta, a, b_free, resp, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_gpcm_model_pallas_path(rng):
    """VIBOConfig(use_pallas=True, irt_model='gpcm') packed ELBO == the plain
    XLA packed ELBO (same params/noise) — value and one optimizer step."""
    import optax

    from vibo_tpu.data import holdout_split, simulate_irt
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.ops import objectives

    sim = simulate_irt("gpcm", 48, 96, ability_dim=2, num_categories=4,
                       seed=3, missing_rate=0.15)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=3, name="gpcm",
                       num_categories=4)
    kw = dict(num_items=96, irt_model="gpcm", num_categories=4,
              ability_dim=2, hidden_dim=24)
    base = VIBO(VIBOConfig(**kw))
    fused = VIBO(VIBOConfig(use_pallas=True, **kw))
    params = base.init_params(jax.random.key(1))
    pk = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    item_eps, theta_eps = base.sample_noise(params, jax.random.key(2),
                                            48, 3)
    rowv = jnp.asarray((ds.train_mask.sum(-1) > 0).astype(np.float32))

    def loss(model, p):
        ll, klt, kli = model.elbo_packed_sums(p, pk, item_eps, theta_eps,
                                              rowv)
        return -objectives.elbo(ll, klt, kli, 1.0)

    l1 = loss(base, params)
    l2 = loss(fused, params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    g1 = jax.grad(lambda p: loss(base, p))(params)
    g2 = jax.grad(lambda p: loss(fused, p))(params)
    opt = optax.adam(1e-2)
    st = opt.init(params)
    u1, _ = opt.update(g1, st)
    u2, _ = opt.update(g2, st)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=5e-3, atol=1e-5), u1, u2)
