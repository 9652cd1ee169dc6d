"""Fused deep-link training kernel vs the pure-JAX deep link (interpret
mode; SURVEY.md section 5's Pallas test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu.models import networks
from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops.pallas_deep import masked_loglik_deep_packed_train, supports
from vibo_tpu.ops.pallas_elbo import pack_responses

B, M, K, D, H = 48, 200, 4, 16, 128


def _setup(rng):
    link = networks.init_deep_link(jax.random.key(0), K, D, H)
    theta = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    resp = jnp.asarray((rng.random((B, M)) < 0.5).astype(np.float32))
    mask = jnp.asarray((rng.random((B, M)) < 0.8).astype(np.float32))
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
    return link, theta, d, resp, mask, packed


def _ref(link, theta, d, resp, mask):
    logits = networks.apply_deep_link(link, theta, d)
    return lik.masked_loglik_per_person(logits, resp, mask)


def test_supports():
    link = networks.init_deep_link(jax.random.key(0), K, D, H)
    assert supports(link)
    link96 = networks.init_deep_link(jax.random.key(0), K, D, 96)
    assert not supports(link96)


def test_deep_forward_matches_reference(rng):
    link, theta, d, resp, mask, packed = _setup(rng)
    got = masked_loglik_deep_packed_train(theta, d, link, packed,
                                          interpret=True)
    want = _ref(link, theta, d, resp, mask)
    # kernel matmuls are bf16 (f32 accumulate); reference is f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=0.5)


def test_deep_forward_f32_reference_bf16():
    """Tight check: compare against the XLA path ALSO in bf16."""
    rng = np.random.default_rng(7)
    link, theta, d, resp, mask, packed = _setup(rng)
    got = masked_loglik_deep_packed_train(theta, d, link, packed,
                                          interpret=True)
    logits = networks.apply_deep_link(link, theta, d,
                                      compute_dtype=jnp.bfloat16)
    want = lik.masked_loglik_per_person(logits, resp, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=0.15)


def test_deep_gradients_match_reference(rng):
    link, theta, d, resp, mask, packed = _setup(rng)

    def loss_pallas(theta, d, link):
        return masked_loglik_deep_packed_train(theta, d, link, packed,
                                               interpret=True).sum()

    def loss_ref(theta, d, link):
        return _ref(link, theta, d, resp, mask).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(theta, d, link)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, d, link)
    for x, y in zip(jax.tree.leaves(g1[:2]), jax.tree.leaves(g2[:2])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-2, atol=0.3)
    # weight grads: compare direction + magnitude loosely (bf16 matmuls)
    for x, y in zip(jax.tree.leaves(g1[2]), jax.tree.leaves(g2[2])):
        x, y = np.asarray(x).ravel(), np.asarray(y).ravel()
        denom = np.linalg.norm(x) * np.linalg.norm(y)
        if denom > 1e-8:
            assert np.dot(x, y) / denom > 0.999
        np.testing.assert_allclose(np.linalg.norm(x), np.linalg.norm(y),
                                   rtol=3e-2)


@pytest.mark.slow  # full profile; fast deep-kernel coverage: forward/grads
def test_deep_vibo_elbo_packed_uses_kernel(rng):
    """elbo_packed on a deep model with use_pallas: close to the XLA elbo."""
    from vibo_tpu.models import VIBO, VIBOConfig
    resp = jnp.asarray((rng.random((32, 140)) < 0.5).astype(np.float32))
    mask = jnp.asarray((rng.random((32, 140)) < 0.8).astype(np.float32))
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
    base = dict(num_items=140, irt_model="deep", ability_dim=K, hidden_dim=32,
                item_latent_dim=D, deep_hidden_dim=H)
    model_ref = VIBO(VIBOConfig(**base))
    model_pal = VIBO(VIBOConfig(**base, use_pallas=True,
                                deep_fused_kernel=True))
    params = model_ref.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b_ref, _ = model_ref.elbo(params, key, resp, mask, 0.7, 2)
    b_pal, _ = model_pal.elbo_packed(params, key, packed, 0.7, 2)
    np.testing.assert_allclose(float(b_pal), float(b_ref), rtol=2e-3)
