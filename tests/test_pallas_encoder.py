"""Fused packed-input encoder first layer (ops/pallas_encoder): interpret-
mode equality against the decode+XLA reference, gradients, and the VIBO-level
fused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu.ops import pallas_encoder
from vibo_tpu.ops.pallas_elbo import pack_responses


def _ref_first_layer(packed, wr, wm):
    pk = packed.astype(jnp.float32)
    m = jnp.minimum(pk, 1.0)
    rm = jnp.maximum(pk - 1.0, 0.0)
    return rm @ wr + m @ wm


@pytest.mark.parametrize("shape", [(64, 32, 128), (130, 257, 64),
                                   (512, 1024, 256), (7, 9, 16)])
def test_first_layer_matches_reference(rng, shape):
    b, m, h = shape
    resp = (rng.random((b, m)) < 0.5).astype(np.float32)
    mask = (rng.random((b, m)) < 0.8).astype(np.float32)
    packed = jnp.asarray(pack_responses(resp, mask))
    wr = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    got = pallas_encoder.packed_first_layer(packed, wr, wm, "float32")
    ref = _ref_first_layer(packed, wr, wm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_first_layer_gradients(rng):
    b, m, h = 48, 40, 32
    resp = (rng.random((b, m)) < 0.5).astype(np.float32)
    mask = (rng.random((b, m)) < 0.7).astype(np.float32)
    packed = jnp.asarray(pack_responses(resp, mask))
    wr = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)

    def loss_fused(wr, wm):
        return (pallas_encoder.packed_first_layer(packed, wr, wm, "float32")
                * cot).sum()

    def loss_ref(wr, wm):
        return (_ref_first_layer(packed, wr, wm) * cot).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(wr, wm)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(wr, wm)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-5, atol=1e-4)


def test_tiles_shrink_for_wide_hidden():
    """The tile picker must keep both (tm, h) weight tiles plus the (tb, h)
    activation tile inside the VMEM byte budgets at ANY hidden size —
    hidden=1024 OOM'd the old fixed (512, 1024) tiling on v5e."""
    for h in (16, 128, 512, 1024, 2048, 4096):
        tb, tm = pallas_encoder._tiles(10240, 1024, h)
        hp = max(-(-h // 128) * 128, 128)
        assert 8 * tm * hp <= pallas_encoder._W_TILE_BUDGET or tm == 128
        assert 4 * tb * hp <= pallas_encoder._H_TILE_BUDGET or tb == 8
        assert tb % 8 == 0 and tm % 128 == 0
    # the measured-fastest hidden=512 tiling is unchanged
    assert pallas_encoder._tiles(10240, 1024, 512) == (512, 1024)


def test_first_layer_wide_hidden_matches_reference(rng):
    """hidden=1024 (the size that OOM'd VMEM) through the shrunk tiling."""
    b, m, h = 72, 257, 1024
    resp = (rng.random((b, m)) < 0.5).astype(np.float32)
    mask = (rng.random((b, m)) < 0.8).astype(np.float32)
    packed = jnp.asarray(pack_responses(resp, mask))
    wr = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    got = pallas_encoder.packed_first_layer(packed, wr, wm, "float32")
    ref = _ref_first_layer(packed, wr, wm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_packed_row_valid():
    packed = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 2, 1], [0, 0, 2]],
                         jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(pallas_encoder.packed_row_valid(packed)),
        [0.0, 1.0, 1.0, 1.0])


def test_rejects_non_int8():
    with pytest.raises(ValueError, match="int8"):
        pallas_encoder.packed_first_layer(jnp.zeros((4, 8), jnp.float32),
                                          jnp.zeros((8, 16)),
                                          jnp.zeros((8, 16)))


@pytest.mark.slow  # full-profile e2e; fast coverage: first-layer grads etc.
def test_vibo_fused_encoder_matches_dense_elbo(rng):
    """elbo_packed with use_pallas=True (fused encoder + fused kernels,
    interpret mode on CPU) == elbo on the decoded data."""
    from vibo_tpu.data import simulate_irt, holdout_split
    from vibo_tpu.models import VIBO, VIBOConfig
    sim = simulate_irt("2pl", 96, 24, ability_dim=2, seed=5)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=5)
    model = VIBO(VIBOConfig(num_items=24, irt_model="2pl", ability_dim=2,
                            hidden_dim=32, use_pallas=True))
    model_ref = VIBO(VIBOConfig(num_items=24, irt_model="2pl", ability_dim=2,
                                hidden_dim=32, use_pallas=False))
    params = model.init_params(jax.random.key(1))
    key = jax.random.key(2)
    packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    b_fused, _ = model.elbo_packed(params, key, packed, 1.0, 2)
    b_ref, _ = model_ref.elbo(params, key, jnp.asarray(ds.response),
                              jnp.asarray(ds.train_mask), 1.0, 2)
    np.testing.assert_allclose(float(b_fused), float(b_ref), rtol=1e-5)

    # gradients through the fused path match the dense path
    def loss_fused(p):
        b, _ = model.elbo_packed(p, key, packed, 1.0, 1)
        return -b

    def loss_ref(p):
        b, _ = model_ref.elbo(p, key, jnp.asarray(ds.response),
                              jnp.asarray(ds.train_mask), 1.0, 1)
        return -b

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-4), g_fused, g_ref)
