"""Pallas fused masked-loglik kernel vs the pure-JAX reference
(interpret mode on CPU; the same asserts run compiled on real TPU via
bench.py --check). SURVEY.md section 5: 'Pallas kernels tested in
interpret=True mode vs the pure-JAX reference implementation.'"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops import links
from vibo_tpu.ops.pallas_elbo import masked_loglik_2pl


def _inputs(rng, bsz, m, k):
    theta = jnp.asarray(rng.standard_normal((bsz, k)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    resp = jnp.asarray((rng.random((bsz, m)) < 0.5).astype(np.float32))
    mask = jnp.asarray((rng.random((bsz, m)) < 0.8).astype(np.float32))
    return theta, a, b, resp, mask


def _ref(theta, a, b, resp, mask):
    return lik.masked_loglik_per_person(links.logits_2pl(theta, a, b), resp, mask)


@pytest.mark.parametrize("shape", [(8, 128, 1), (16, 256, 4), (300, 640, 8)])
def test_forward_matches_reference(rng, shape):
    bsz, m, k = shape
    args = _inputs(rng, bsz, m, k)
    got = masked_loglik_2pl(*args, interpret=True)
    want = _ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_gradients_match_reference(rng):
    theta, a, b, resp, mask = _inputs(rng, 64, 256, 4)

    def loss_pallas(theta, a, b):
        return masked_loglik_2pl(theta, a, b, resp, mask, interpret=True).sum()

    def loss_ref(theta, a, b):
        return _ref(theta, a, b, resp, mask).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(theta, a, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, a, b)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-5, atol=3e-4)


def test_weighted_cotangent(rng):
    """Backward must honor arbitrary per-person cotangents, not just sum()."""
    theta, a, b, resp, mask = _inputs(rng, 32, 128, 2)
    w = jnp.asarray(rng.standard_normal(32).astype(np.float32))

    def f(fn):
        return jax.grad(lambda t: (fn(t, a, b, resp, mask) * w).sum())(theta)

    g1 = f(lambda *xs: masked_loglik_2pl(*xs, interpret=True))
    g2 = f(lambda t, a, b, r, m: _ref(t, a, b, r, m))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=3e-5, atol=3e-4)


def test_vmap_sample_axis(rng):
    """IWAE-style leading sample axis on theta AND per-sample item draws."""
    s, bsz, m, k = 3, 16, 128, 2
    theta = jnp.asarray(rng.standard_normal((s, bsz, k)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((s, m, k)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((s, m)).astype(np.float32))
    resp = jnp.asarray((rng.random((bsz, m)) < 0.5).astype(np.float32))
    mask = jnp.ones((bsz, m), jnp.float32)
    got = masked_loglik_2pl(theta, a, b, resp, mask, interpret=True)
    want = jax.vmap(lambda t, aa, bb: _ref(t, aa, bb, resp, mask))(theta, a, b)
    assert got.shape == (s, bsz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)

    # shared items across samples
    got2 = masked_loglik_2pl(theta, a[0], b[0], resp, mask, interpret=True)
    want2 = jax.vmap(lambda t: _ref(t, a[0], b[0], resp, mask))(theta)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-4)


def test_ragged_tiles(rng):
    """Shapes not divisible by the block sizes still compute correctly."""
    args = _inputs(rng, 70, 330, 3)
    got = masked_loglik_2pl(*args, interpret=True)
    want = _ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.slow
def test_vibo_model_pallas_path(rng):
    """VIBOConfig(use_pallas=True) ELBO == use_pallas=False ELBO (same key)."""
    import os
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.data import simulate_irt
    sim = simulate_irt("2pl", 48, 160, ability_dim=2, seed=0, missing_rate=0.2)
    resp, mask = jnp.asarray(sim.response), jnp.asarray(sim.mask)
    key = jax.random.key(0)
    base = VIBO(VIBOConfig(num_items=160, irt_model="2pl", ability_dim=2,
                           hidden_dim=32))
    fused = VIBO(VIBOConfig(num_items=160, irt_model="2pl", ability_dim=2,
                            hidden_dim=32, use_pallas=True))
    params = base.init_params(jax.random.key(1))
    b1, _ = base.elbo(params, key, resp, mask, 1.0, 2)
    b2, _ = fused.elbo(params, key, resp, mask, 1.0, 2)
    np.testing.assert_allclose(float(b1), float(b2), rtol=1e-5)


@pytest.mark.slow
def test_packed_representation(rng):
    from vibo_tpu.ops.pallas_elbo import pack_responses, masked_loglik_2pl_packed
    theta, a, b, resp, mask = _inputs(rng, 48, 200, 3)
    packed = pack_responses(resp, mask)
    assert packed.dtype == jnp.int8
    got = masked_loglik_2pl_packed(theta, a, b, packed, interpret=True)
    want = _ref(theta, a, b, resp, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)

    # gradients
    g1 = jax.grad(lambda t, aa, bb: masked_loglik_2pl_packed(
        t, aa, bb, packed, interpret=True).sum(), argnums=(0, 1, 2))(theta, a, b)
    g2 = jax.grad(lambda t, aa, bb: _ref(t, aa, bb, resp, mask).sum(),
                  argnums=(0, 1, 2))(theta, a, b)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-5, atol=3e-4)

    # vmap over sample axis
    s = 3
    theta_s = jnp.stack([theta] * s) + 0.1
    got_s = masked_loglik_2pl_packed(theta_s, a, b, packed, interpret=True)
    assert got_s.shape == (s, 48)


# ------------------------------------------------------------------- 3PL

def _inputs_3pl(rng, bsz, m, k):
    theta, a, b, resp, mask = _inputs(rng, bsz, m, k)
    g_hat = jnp.asarray((rng.standard_normal(m) - 1.5).astype(np.float32))
    return theta, a, b, g_hat, resp, mask


def _ref_3pl(theta, a, b, g_hat, resp, mask):
    return lik.masked_loglik_per_person(links.logits_2pl(theta, a, b), resp,
                                        mask, g_hat=g_hat)


@pytest.mark.parametrize("shape", [(8, 128, 1), (48, 300, 4)])
def test_3pl_forward_matches_reference(rng, shape):
    from vibo_tpu.ops.pallas_elbo import masked_loglik_3pl
    bsz, m, k = shape
    args = _inputs_3pl(rng, bsz, m, k)
    got = masked_loglik_3pl(*args, interpret=True)
    want = _ref_3pl(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_3pl_gradients_match_reference(rng):
    from vibo_tpu.ops.pallas_elbo import masked_loglik_3pl
    theta, a, b, g_hat, resp, mask = _inputs_3pl(rng, 64, 256, 4)
    w = jnp.asarray(rng.standard_normal(64).astype(np.float32))

    def loss_pallas(theta, a, b, g_hat):
        return (w * masked_loglik_3pl(theta, a, b, g_hat, resp, mask,
                                      interpret=True)).sum()

    def loss_ref(theta, a, b, g_hat):
        return (w * _ref_3pl(theta, a, b, g_hat, resp, mask)).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(theta, a, b, g_hat)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(theta, a, b, g_hat)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-5, atol=3e-4)


def test_3pl_gradient_extreme_logits():
    """Branch-ratio gradients must stay finite at extreme logits/guess."""
    from vibo_tpu.ops.pallas_elbo import masked_loglik_3pl
    theta = jnp.array([[30.0], [-30.0], [0.0]], jnp.float32)
    a = jnp.ones((128, 1), jnp.float32)
    b = jnp.zeros(128, jnp.float32)
    g_hat = jnp.full(128, -25.0, jnp.float32)
    resp = jnp.ones((3, 128), jnp.float32)
    mask = jnp.ones((3, 128), jnp.float32)

    def loss(theta, a, b, g_hat):
        return masked_loglik_3pl(theta, a, b, g_hat, resp, mask,
                                 interpret=True).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(theta, a, b, g_hat)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_3pl_packed_matches_dense(rng):
    from vibo_tpu.ops.pallas_elbo import (masked_loglik_3pl,
                                          masked_loglik_3pl_packed,
                                          pack_responses)
    theta, a, b, g_hat, resp, mask = _inputs_3pl(rng, 40, 200, 2)
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))

    got = masked_loglik_3pl_packed(theta, a, b, g_hat, packed, interpret=True)
    want = _ref_3pl(theta, a, b, g_hat, resp, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)

    def loss_packed(theta, a, b, g_hat):
        return masked_loglik_3pl_packed(theta, a, b, g_hat, packed,
                                        interpret=True).sum()

    def loss_dense(theta, a, b, g_hat):
        return masked_loglik_3pl(theta, a, b, g_hat, resp, mask,
                                 interpret=True).sum()

    g1 = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(theta, a, b, g_hat)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(theta, a, b, g_hat)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-5, atol=3e-4)


@pytest.mark.slow
def test_3pl_vibo_model_pallas_path(rng):
    """Full 3PL VIBO ELBO: pallas path == pure-JAX path, dense and packed."""
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.ops.pallas_elbo import pack_responses
    n, m, k = 24, 140, 2
    resp = jnp.asarray((rng.random((n, m)) < 0.5).astype(np.float32))
    mask = jnp.asarray((rng.random((n, m)) < 0.8).astype(np.float32))
    base = dict(num_items=m, irt_model="3pl", ability_dim=k, hidden_dim=32)
    model_ref = VIBO(VIBOConfig(**base))
    model_pal = VIBO(VIBOConfig(**base, use_pallas=True))
    params = model_ref.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b_ref, _ = model_ref.elbo(params, key, resp, mask, 0.7, 2)
    b_pal, _ = model_pal.elbo(params, key, resp, mask, 0.7, 2)
    np.testing.assert_allclose(float(b_pal), float(b_ref), rtol=1e-5)
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
    b_pk, _ = model_pal.elbo_packed(params, key, packed, 0.7, 2)
    np.testing.assert_allclose(float(b_pk), float(b_ref), rtol=1e-5)


def test_train_variant_matches_general(rng):
    """One-pass train kernel: value + uniform-cotangent grads == general op."""
    from vibo_tpu.ops.pallas_elbo import (masked_loglik_2pl_packed,
                                          masked_loglik_2pl_packed_train,
                                          pack_responses)
    theta, a, b, resp, mask = _inputs(rng, 56, 300, 4)
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))

    got = masked_loglik_2pl_packed_train(theta, a, b, packed, interpret=True)
    want = masked_loglik_2pl_packed(theta, a, b, packed, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)

    def loss_train(theta, a, b):
        return masked_loglik_2pl_packed_train(theta, a, b, packed,
                                              interpret=True).sum()

    def loss_gen(theta, a, b):
        return masked_loglik_2pl_packed(theta, a, b, packed,
                                        interpret=True).sum()

    g1 = jax.grad(loss_train, argnums=(0, 1, 2))(theta, a, b)
    g2 = jax.grad(loss_gen, argnums=(0, 1, 2))(theta, a, b)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-5, atol=3e-4)

    # scaled-uniform cotangent (the mean-over-samples case) stays exact
    g3 = jax.grad(lambda t: 0.25 * loss_train(t, a, b))(theta)
    g4 = jax.grad(lambda t: 0.25 * loss_gen(t, a, b))(theta)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4),
                               rtol=3e-5, atol=3e-4)


@pytest.mark.slow
def test_train_variant_vmap_samples(rng):
    """vmap over the MC-sample axis (the elbo_packed usage pattern)."""
    from vibo_tpu.ops.pallas_elbo import (masked_loglik_2pl_packed_train,
                                          pack_responses)
    theta, a, b, resp, mask = _inputs(rng, 16, 130, 2)
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
    thetas = jnp.stack([theta, theta + 0.1, theta - 0.1])
    as_ = jnp.stack([a, a, a])
    bs = jnp.stack([b, b, b])

    def loss(thetas, as_, bs):
        return masked_loglik_2pl_packed_train(thetas, as_, bs, packed,
                                              interpret=True).sum(-1).mean()

    v = loss(thetas, as_, bs)
    g = jax.grad(loss)(thetas, as_, bs)
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()
    want = _ref(theta, a, b, resp, mask)
    one = masked_loglik_2pl_packed_train(theta, a, b, packed, interpret=True)
    np.testing.assert_allclose(np.asarray(one), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_3pl_train_variant_matches_general(rng):
    from vibo_tpu.ops.pallas_elbo import (masked_loglik_3pl_packed,
                                          masked_loglik_3pl_packed_train,
                                          pack_responses)
    theta, a, b, g_hat, resp, mask = _inputs_3pl(rng, 40, 260, 3)
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))

    got = masked_loglik_3pl_packed_train(theta, a, b, g_hat, packed,
                                         interpret=True)
    want = masked_loglik_3pl_packed(theta, a, b, g_hat, packed, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)

    def loss_train(theta, a, b, g_hat):
        return masked_loglik_3pl_packed_train(theta, a, b, g_hat, packed,
                                              interpret=True).sum()

    def loss_gen(theta, a, b, g_hat):
        return masked_loglik_3pl_packed(theta, a, b, g_hat, packed,
                                        interpret=True).sum()

    g1 = jax.grad(loss_train, argnums=(0, 1, 2, 3))(theta, a, b, g_hat)
    g2 = jax.grad(loss_gen, argnums=(0, 1, 2, 3))(theta, a, b, g_hat)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-5, atol=3e-4)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_random_shapes_all_kernels(seed):
    """Property test: random (B, M, K) incl. non-tile-aligned raggedness —
    every fused kernel (2PL/3PL x dense/packed/train) matches the pure-JAX
    reference in value and sum-loss gradients."""
    from vibo_tpu.ops import pallas_elbo as pe
    rng = np.random.default_rng(seed)
    bsz = int(rng.integers(3, 500))
    m_items = int(rng.integers(2, 700))
    k = int(rng.integers(1, 9))
    theta, a, b, resp, mask = _inputs(rng, bsz, m_items, k)
    g_hat = jnp.asarray((rng.standard_normal(m_items) - 1.5).astype(np.float32))
    packed = jnp.asarray(pe.pack_responses(np.asarray(resp), np.asarray(mask)))

    want2 = _ref(theta, a, b, resp, mask)
    want3 = _ref_3pl(theta, a, b, g_hat, resp, mask)
    for got, want in [
        (pe.masked_loglik_2pl(theta, a, b, resp, mask, interpret=True), want2),
        (pe.masked_loglik_2pl_packed(theta, a, b, packed, interpret=True), want2),
        (pe.masked_loglik_2pl_packed_train(theta, a, b, packed,
                                           interpret=True), want2),
        (pe.masked_loglik_3pl(theta, a, b, g_hat, resp, mask,
                              interpret=True), want3),
        (pe.masked_loglik_3pl_packed(theta, a, b, g_hat, packed,
                                     interpret=True), want3),
        (pe.masked_loglik_3pl_packed_train(theta, a, b, g_hat, packed,
                                           interpret=True), want3),
    ]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-4)

    g_ref = jax.grad(lambda t: _ref(t, a, b, resp, mask).sum())(theta)
    g_train = jax.grad(lambda t: pe.masked_loglik_2pl_packed_train(
        t, a, b, packed, interpret=True).sum())(theta)
    np.testing.assert_allclose(np.asarray(g_train), np.asarray(g_ref),
                               rtol=3e-5, atol=3e-4)


# ------------------- transposed-theta one-pass train kernels


def _mk_packed(rng, B, M):
    resp = (rng.random((B, M)) < 0.5).astype(np.float32)
    mask = (rng.random((B, M)) < 0.8).astype(np.float32)
    from vibo_tpu.ops.pallas_elbo import pack_responses
    return resp, mask, jnp.asarray(pack_responses(resp, mask))


def test_transposed_train_kernel_2pl_matches_legacy():
    """masked_loglik_2pl_packed_train_t(theta.T).sum-free scalar == the
    legacy per-person kernel summed, and all gradients match (transposed
    dtheta comes back as (K, B))."""
    from vibo_tpu.ops import pallas_elbo as pe
    rng = np.random.default_rng(0)
    B, M, K = 37, 29, 3
    theta = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    _, _, packed = _mk_packed(rng, B, M)

    def f_ref(th, aa, bb):
        return pe.masked_loglik_2pl_packed_train(th, aa, bb, packed,
                                                 interpret=True).sum()

    def f_t(thT, aa, bb):
        return pe.masked_loglik_2pl_packed_train_t(thT, aa, bb, packed,
                                                   interpret=True)

    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(theta, a, b)
    v_t, g_t = jax.value_and_grad(f_t, argnums=(0, 1, 2))(theta.T, a, b)
    np.testing.assert_allclose(float(v_ref), float(v_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_t[0]).T, np.asarray(g_ref[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_t[1]), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_t[2]), np.asarray(g_ref[2]),
                               rtol=1e-5, atol=1e-6)


def test_transposed_train_kernel_3pl_matches_legacy():
    from vibo_tpu.ops import pallas_elbo as pe
    rng = np.random.default_rng(1)
    B, M, K = 21, 35, 2
    theta = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    gh = jnp.asarray(rng.normal(size=(M,)).astype(np.float32) - 1.5)
    _, _, packed = _mk_packed(rng, B, M)

    def f_ref(th, aa, bb, gg):
        return pe.masked_loglik_3pl_packed_train(th, aa, bb, gg, packed,
                                                 interpret=True).sum()

    def f_t(thT, aa, bb, gg):
        return pe.masked_loglik_3pl_packed_train_t(thT, aa, bb, gg, packed,
                                                   interpret=True)

    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3))(
        theta, a, b, gh)
    v_t, g_t = jax.value_and_grad(f_t, argnums=(0, 1, 2, 3))(
        theta.T, a, b, gh)
    np.testing.assert_allclose(float(v_ref), float(v_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_t[0]).T, np.asarray(g_ref[0]),
                               rtol=1e-5, atol=1e-6)
    for i in (1, 2, 3):
        np.testing.assert_allclose(np.asarray(g_t[i]), np.asarray(g_ref[i]),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_elbo_packed_sums_transposed_matches_legacy():
    """The full transposed objective path (encoder head, reparam, KL, scalar
    kernel) == the legacy path when fed the SAME noise (transposed)."""
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.data import simulate_irt
    from vibo_tpu.ops.pallas_elbo import pack_responses
    B, M, K = 24, 40, 2
    sim = simulate_irt("2pl", B, M, ability_dim=K, seed=2, missing_rate=0.2)
    packed = jnp.asarray(pack_responses(sim.response, sim.mask))
    model = VIBO(VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                            hidden_dim=16, use_pallas=True))
    params = model.init_params(jax.random.key(0))
    rowv = jnp.asarray((sim.mask.sum(-1) > 0).astype(np.float32))
    item_eps, theta_eps = model.sample_noise(params, jax.random.key(1), B, 2)
    theta_epsT = jnp.swapaxes(theta_eps, 1, 2)

    def f_ref(p):
        ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps, theta_eps,
                                              rowv)
        return ll - klt - kli

    def f_t(p):
        ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps, theta_epsT,
                                              rowv, transposed=True)
        return ll - klt - kli

    v_ref, g_ref = jax.value_and_grad(f_ref)(params)
    v_t, g_t = jax.value_and_grad(f_t)(params)
    np.testing.assert_allclose(float(v_ref), float(v_t), rtol=1e-5)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-6), g_t, g_ref)

    # IWAE terms too
    def w_ref(p):
        local, ratio = model.iwae_packed_terms(p, packed, item_eps, theta_eps,
                                               rowv)
        return (local + 0.7 * ratio).sum()

    def w_t(p):
        local, ratio = model.iwae_packed_terms(p, packed, item_eps,
                                               theta_epsT, rowv,
                                               transposed=True)
        return (local + 0.7 * ratio).sum()

    v_ref, g_ref = jax.value_and_grad(w_ref)(params)
    v_t, g_t = jax.value_and_grad(w_t)(params)
    np.testing.assert_allclose(float(v_ref), float(v_t), rtol=1e-5)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-6), g_t, g_ref)
