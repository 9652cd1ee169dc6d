"""VIBO model tests: shapes, finiteness, IWAE/ELBO relations, all link types."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu.data import simulate_irt
from vibo_tpu.models import VIBO, VIBOConfig

N, M, K = 32, 24, 2


def _data(irt_model="2pl"):
    sim = simulate_irt(irt_model if irt_model != "deep" else "2pl",
                       N, M, ability_dim=K, seed=1, missing_rate=0.2)
    return jnp.asarray(sim.response), jnp.asarray(sim.mask)


@pytest.mark.parametrize("irt_model", ["1pl", "2pl", "3pl", "deep"])
@pytest.mark.parametrize("conditional", [True, False])
def test_elbo_finite_all_links(irt_model, conditional):
    resp, mask = _data(irt_model)
    cfg = VIBOConfig(num_items=M, irt_model=irt_model, ability_dim=K,
                     hidden_dim=32, conditional_posterior=conditional,
                     item_latent_dim=4, deep_hidden_dim=16)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    bound, aux = jax.jit(lambda p, k: model.elbo(p, k, resp, mask, 1.0, 2))(
        params, jax.random.key(1))
    assert np.isfinite(float(bound))
    assert float(aux["kl_items"]) >= 0
    assert float(aux["kl_theta"]) >= 0
    # masked cells only: loglik bounded by 0
    assert float(aux["loglik"]) <= 0


@pytest.mark.slow
@pytest.mark.parametrize("irt_model", ["2pl", "deep"])
def test_iwae_vs_elbo(irt_model):
    """IWAE-S >= IWAE-1 in expectation; both finite. (Monotonicity of the
    IWAE bound, Burda et al.; SURVEY.md section 5 unit-test list.)"""
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model=irt_model, ability_dim=K,
                     hidden_dim=32, item_latent_dim=4, deep_hidden_dim=16)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))

    keys = jax.random.split(jax.random.key(2), 16)
    i1 = np.mean([float(model.iwae(params, k, resp, mask, num_samples=1))
                  for k in keys])
    i25 = np.mean([float(model.iwae(params, k, resp, mask, num_samples=25))
                   for k in keys])
    assert np.isfinite(i1) and np.isfinite(i25)
    assert i25 >= i1 - 1.0  # monotone up to MC noise


def test_missing_cells_do_not_contribute():
    """Changing response values under mask=0 must not change the ELBO."""
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K, hidden_dim=32)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(3)
    b1, _ = model.elbo(params, key, resp * mask, mask, 1.0, 1)
    corrupted = resp * mask + (1 - mask) * 1.0
    b2, _ = model.elbo(params, key, corrupted * 0 + resp * mask, mask, 1.0, 1)
    # identical input -> identical output (determinism) and masked corruption:
    b3, _ = model.elbo(params, key, resp * mask + (1 - mask), mask, 1.0, 1)
    np.testing.assert_allclose(float(b1), float(b2), rtol=1e-6)
    # mean-field encoder sees (resp*mask, mask) so corruption is invisible by
    # construction; conditional likewise multiplies by mask before encoding.
    np.testing.assert_allclose(float(b1), float(b3), rtol=1e-6)


def test_impute_prob_shape_and_range():
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="3pl", ability_dim=K, hidden_dim=32)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    prob = np.asarray(model.impute_prob(params, resp, mask))
    assert prob.shape == (N, M)
    assert (prob >= 0).all() and (prob <= 1).all()


def test_elbo_grads_nonzero_and_finite():
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K, hidden_dim=32)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    grads = jax.grad(lambda p: -model.elbo(p, jax.random.key(1), resp, mask, 1.0, 1)[0])(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_bfloat16_compute_matches_f32_loosely():
    """bf16 encoder matmuls (f32 accumulate) track the f32 ELBO closely and
    train to the same quality (bench asserts quality on TPU)."""
    resp, mask = _data()
    kw = dict(num_items=M, irt_model="2pl", ability_dim=K, hidden_dim=32)
    m32 = VIBO(VIBOConfig(**kw))
    m16 = VIBO(VIBOConfig(**kw, compute_dtype="bfloat16"))
    params = m32.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b32, _ = m32.elbo(params, key, resp, mask, 1.0, 1)
    b16, _ = m16.elbo(params, key, resp, mask, 1.0, 1)
    np.testing.assert_allclose(float(b16), float(b32), rtol=0.02)


def test_deep_link_chunked_matches_dense():
    """Blockwise item streaming (remat) == dense pairwise MLP, values + grads."""
    from vibo_tpu.models import networks
    key = jax.random.key(0)
    params = networks.init_deep_link(key, ability_dim=3, item_latent_dim=4,
                                     hidden_dim=16)
    theta = jax.random.normal(jax.random.key(1), (10, 3))
    d = jax.random.normal(jax.random.key(2), (37, 4))  # ragged vs chunk 16
    dense = networks.apply_deep_link(params, theta, d)
    chunked = networks.apply_deep_link(params, theta, d, item_chunk=16)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda t: networks.apply_deep_link(params, t, d).sum())(theta)
    g2 = jax.grad(lambda t: networks.apply_deep_link(
        params, t, d, item_chunk=16).sum())(theta)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5,
                               atol=1e-5)


def test_deep_vibo_chunked_elbo():
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="deep", ability_dim=K,
                     hidden_dim=32, item_latent_dim=4, deep_hidden_dim=16,
                     deep_item_chunk=8)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    bound, _ = model.elbo(params, jax.random.key(1), resp, mask, 1.0, 1)
    cfg2 = VIBOConfig(num_items=M, irt_model="deep", ability_dim=K,
                      hidden_dim=32, item_latent_dim=4, deep_hidden_dim=16)
    bound2, _ = VIBO(cfg2).elbo(params, jax.random.key(1), resp, mask, 1.0, 1)
    np.testing.assert_allclose(float(bound), float(bound2), rtol=1e-5)


@pytest.mark.slow
def test_iwae_per_person():
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K, hidden_dim=32)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    pp = model.iwae_per_person(params, jax.random.key(1), resp, mask,
                               num_samples=30)
    assert pp.shape == (N,)
    assert np.isfinite(np.asarray(pp)).all()
    # sum of per-person bounds should be in the ballpark of the joint bound
    joint = model.iwae(params, jax.random.key(1), resp, mask, num_samples=30)
    assert abs(float(pp.sum()) - float(joint)) / abs(float(joint)) < 0.2


def test_elbo_packed_matches_dense():
    from vibo_tpu.ops.pallas_elbo import pack_responses
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K, hidden_dim=32)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b1, _ = model.elbo(params, key, resp, mask, 0.5, 2)
    b2, _ = model.elbo_packed(params, key, pack_responses(resp, mask), 0.5, 2)
    np.testing.assert_allclose(float(b2), float(b1), rtol=1e-5)
    # and with the pallas packed kernel path (interpret on CPU)
    cfgp = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                      hidden_dim=32, use_pallas=True)
    b3, _ = VIBO(cfgp).elbo_packed(params, key, pack_responses(resp, mask), 0.5, 2)
    np.testing.assert_allclose(float(b3), float(b1), rtol=1e-5)


def test_elbo_invariant_to_padding_rows():
    """Zero-mask padded person rows must leave the ELBO exactly unchanged
    (loglik masked to 0 AND their KL(theta) excluded)."""
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K, hidden_dim=32)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b1, _ = model.elbo(params, key, resp, mask, 1.0, 1)
    pad = 7
    resp_p = jnp.pad(resp, ((0, pad), (0, 0)))
    mask_p = jnp.pad(mask, ((0, pad), (0, 0)))
    b2, _ = model.elbo(params, key, resp_p, mask_p, 1.0, 1)
    # key split order differs only in theta noise for padded rows, which is
    # multiplied out; mu/logvar of padded rows exist but their KL is zeroed
    np.testing.assert_allclose(float(b2), float(b1), rtol=1e-6)

    from vibo_tpu.ops.pallas_elbo import pack_responses
    pk1 = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
    pk2 = jnp.asarray(pack_responses(np.asarray(resp_p), np.asarray(mask_p)))
    b3, _ = model.elbo_packed(params, key, pk1, 1.0, 1)
    b4, _ = model.elbo_packed(params, key, pk2, 1.0, 1)
    np.testing.assert_allclose(float(b4), float(b3), rtol=1e-6)


def test_condition_on_mean_runs_and_matches_packed():
    """condition_on="mean": the encoder conditions on item-posterior MEANS
    (noise-free, serving-consistent). Packed and dense paths must agree, and
    the config must reject unknown modes."""
    from vibo_tpu.ops.pallas_elbo import pack_responses
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, condition_on="mean")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b1, _ = model.elbo(params, key, resp, mask, 0.5, 2)
    b2, _ = model.elbo_packed(params, key, pack_responses(resp, mask), 0.5, 2)
    np.testing.assert_allclose(float(b2), float(b1), rtol=1e-5)
    iw = model.iwae(params, key, resp, mask, 3)
    assert np.isfinite(float(iw))
    with pytest.raises(ValueError, match="condition_on"):
        VIBOConfig(num_items=M, condition_on="bogus")


def test_condition_on_mean_limits_to_sample_at_tight_item_posterior():
    """As the item posterior collapses to a point mass, the sampled draw
    equals the mean, so condition_on="sample" and "mean" must give the SAME
    bound (same PRNG stream: both draw the item sample for the likelihood)."""
    resp, mask = _data()
    params = VIBO(VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                             hidden_dim=32)).init_params(jax.random.key(0))
    tight = {name: {"mu": p["mu"], "logvar": jnp.full_like(p["logvar"], -30.0)}
             for name, p in params["item_post"].items()}
    params = dict(params, item_post=tight)
    key = jax.random.key(2)
    b_s, _ = VIBO(VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                             hidden_dim=32, condition_on="sample")).elbo(
        params, key, resp, mask, 1.0, 2)
    b_m, _ = VIBO(VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                             hidden_dim=32, condition_on="mean")).elbo(
        params, key, resp, mask, 1.0, 2)
    np.testing.assert_allclose(float(b_s), float(b_m), rtol=1e-5)


def test_condition_on_mean_exogenous_noise_path():
    """elbo_packed_sums (the exogenous-noise trainer path) under
    condition_on="mean" matches elbo_packed with the same noise semantics:
    finite, and gradients flow to the encoder's item-feature block."""
    from vibo_tpu.ops.pallas_elbo import pack_responses
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, condition_on="mean")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    packed = jnp.asarray(pack_responses(resp, mask))
    item_eps, theta_eps = model.sample_noise(params, jax.random.key(3),
                                             N, 2)

    def loss(p):
        ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps, theta_eps)
        return -(ll - klt - kli)

    val, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    # the item-feature rows of the first encoder layer get gradient from the
    # mean-conditioning path
    w1 = g["encoder"][0]["w"]
    feat_rows = np.asarray(w1[2 * M:])
    assert feat_rows.size > 0 and np.abs(feat_rows).max() > 0


# ---------------------------------------- full-covariance (chol) q(theta)

def test_chol_head_width_and_k1_noop():
    """theta_posterior='chol' widens the encoder head by K(K-1)/2; at K=1
    there is nothing to correlate, so the family is a no-op (diag head)."""
    from vibo_tpu.models import networks
    cfg4 = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=4,
                      hidden_dim=32, theta_posterior="chol")
    p4 = VIBO(cfg4).init_params(jax.random.key(0))
    assert p4["encoder"][-1]["w"].shape[-1] == 2 * 4 + 6
    cfg1 = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=1,
                      hidden_dim=32, theta_posterior="chol")
    p1 = VIBO(cfg1).init_params(jax.random.key(0))
    assert p1["encoder"][-1]["w"].shape[-1] == 2
    assert networks.ability_head_dim(4, chol=True) == 14
    with pytest.raises(ValueError, match="theta_posterior"):
        VIBOConfig(num_items=M, theta_posterior="full")


def test_chol_zero_off_head_matches_diag_bitwise():
    """Embedding a trained DIAG model into the chol family with zero
    off-head rows must reproduce the diagonal ELBO exactly (same PRNG
    stream: eps shapes are identical, the strict-lower mixing adds 0)."""
    resp, mask = _data()
    kw = dict(num_items=M, irt_model="2pl", ability_dim=K, hidden_dim=32)
    m_diag = VIBO(VIBOConfig(**kw))
    m_chol = VIBO(VIBOConfig(**kw, theta_posterior="chol"))
    p = m_diag.init_params(jax.random.key(0))
    # widen the head: [mu(K), logvar(K)] -> [mu, logvar, off=0]
    from vibo_tpu.ops import distributions as dist
    extra = dist.tril_dim(K)
    last = p["encoder"][-1]
    p_chol = dict(p)
    p_chol["encoder"] = list(p["encoder"])
    p_chol["encoder"][-1] = {
        "w": jnp.concatenate([last["w"],
                              jnp.zeros((last["w"].shape[0], extra))], -1),
        "b": jnp.concatenate([last["b"], jnp.zeros((extra,))], -1)}
    key = jax.random.key(5)
    b_diag, _ = m_diag.elbo(p, key, resp, mask, 1.0, 2)
    b_chol, _ = m_chol.elbo(p_chol, key, resp, mask, 1.0, 2)
    np.testing.assert_allclose(float(b_chol), float(b_diag), rtol=1e-6)
    iw_d = m_diag.iwae(p, key, resp, mask, 3)
    iw_c = m_chol.iwae(p_chol, key, resp, mask, 3)
    np.testing.assert_allclose(float(iw_c), float(iw_d), rtol=1e-6)


def test_chol_elbo_packed_matches_dense_and_grads_flow():
    from vibo_tpu.ops.pallas_elbo import pack_responses
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="chol")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b1, _ = model.elbo(params, key, resp, mask, 0.5, 2)
    b2, _ = model.elbo_packed(params, key, pack_responses(resp, mask), 0.5, 2)
    np.testing.assert_allclose(float(b2), float(b1), rtol=1e-5)
    # gradients reach the off-diagonal head columns (the last tril_dim(K)
    # output columns of the final encoder layer)
    g = jax.grad(lambda p: -model.elbo(p, key, resp, mask, 1.0, 1)[0])(params)
    from vibo_tpu.ops import distributions as dist
    off_cols = np.asarray(g["encoder"][-1]["w"])[:, -dist.tril_dim(K):]
    assert np.isfinite(off_cols).all() and np.abs(off_cols).max() > 0


def test_chol_exogenous_noise_path_matches_keyed():
    """elbo_packed_sums (trainer path, exogenous eps) must carry the chol
    mixing too: with the SAME eps it matches a hand-assembled bound."""
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.ops import objectives
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="chol")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    packed = jnp.asarray(pack_responses(resp, mask))
    item_eps, theta_eps = model.sample_noise(params, jax.random.key(3), N, 2)
    ll, klt, kli = model.elbo_packed_sums(params, packed, item_eps, theta_eps)
    assert np.isfinite(float(ll)) and float(klt) >= 0
    # the off head contributes: zeroing the off columns changes the bound
    from vibo_tpu.ops import distributions as dist
    extra = dist.tril_dim(K)
    p0 = dict(params)
    p0["encoder"] = list(params["encoder"])
    last = params["encoder"][-1]
    p0["encoder"][-1] = {
        "w": last["w"].at[:, -extra:].set(0.0),
        "b": last["b"].at[-extra:].set(0.0)}
    ll0, klt0, _ = model.elbo_packed_sums(p0, packed, item_eps, theta_eps)
    assert not np.allclose(float(ll), float(ll0))


def test_laplace_anchor_matches_numpy_oracle():
    """ops.distributions.laplace_anchor_parts: L must equal
    chol((I + D S D)^-1) from numpy linalg, for K = 1, 2, 4."""
    from vibo_tpu.ops import distributions as dist
    rng = np.random.default_rng(0)
    for k in (1, 2, 4):
        bsz = 7
        c = rng.standard_normal((bsz, k)).astype(np.float32)
        a = rng.standard_normal((40, k))
        m = rng.random((bsz, 40)) < 0.8
        pairs = dist.triu_flat_index(k)
        a2 = np.stack([a[:, i] * a[:, j] for i, j in pairs], -1)
        s_flat = (m @ a2).astype(np.float32)
        logvar, off = dist.laplace_anchor_parts(jnp.asarray(c),
                                                jnp.asarray(s_flat))
        d_m = np.zeros((bsz, k, k))
        s_m = np.zeros((bsz, k, k))
        for b in range(bsz):
            d_m[b] = np.diag(np.exp(0.5 * c[b]))
            for n_, (i, j) in enumerate(pairs):
                s_m[b, i, j] = s_m[b, j, i] = s_flat[b, n_]
        cov = np.linalg.inv(np.eye(k)[None] + d_m @ s_m @ d_m)
        want = np.linalg.cholesky(cov)
        if off is None:
            got = np.exp(0.5 * np.asarray(logvar))[:, :, None]
        else:
            got = np.asarray(dist.tril_matrix(logvar, off))
        np.testing.assert_allclose(got.reshape(bsz, k, k), want, atol=1e-5)


def test_laplace_family_guards_and_head_shape():
    """laplace: diag-shaped head (2K outputs), c-block bias pre-set to
    log(0.15); deep link and item_encoder combinations refuse."""
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="laplace")
    p = VIBO(cfg).init_params(jax.random.key(0))
    assert p["encoder"][-1]["w"].shape[-1] == 2 * K
    np.testing.assert_allclose(np.asarray(p["encoder"][-1]["b"][K:]),
                               np.log(0.15), rtol=1e-6)
    with pytest.raises(ValueError, match="laplace"):
        VIBOConfig(num_items=M, irt_model="deep",
                   theta_posterior="laplace")
    with pytest.raises(ValueError, match="item_encoder"):
        VIBOConfig(num_items=M, irt_model="2pl", item_encoder=True,
                   theta_posterior="laplace")


def test_laplace_elbo_packed_matches_dense_and_grads_flow():
    """Packed and dense ELBOs agree for the laplace family, gradients
    reach the c-block head columns AND the item loading means through the
    Fisher pair statistics (the structured-VI coupling)."""
    from vibo_tpu.ops.pallas_elbo import pack_responses
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="laplace")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(1)
    b1, _ = model.elbo(params, key, resp, mask, 0.5, 2)
    b2, _ = model.elbo_packed(params, key, pack_responses(resp, mask), 0.5, 2)
    np.testing.assert_allclose(float(b2), float(b1), rtol=1e-5)
    g = jax.grad(lambda p: -model.elbo(p, key, resp, mask, 1.0, 1)[0])(params)
    c_cols = np.asarray(g["encoder"][-1]["w"])[:, K:]
    assert np.isfinite(c_cols).all() and np.abs(c_cols).max() > 0
    # widths depend on the item loading means via S = sum m a a^T
    ga = np.asarray(g["item_post"]["a"]["mu"])
    assert np.isfinite(ga).all() and np.abs(ga).max() > 0


def test_laplace_width_tracks_information():
    """The anchored width must SHRINK with response count even at fixed
    head outputs — the structure the from-scratch heads had to learn and
    didn't (round-4 VERDICT task #5): a person with every response
    observed gets a narrower posterior than one with 10% observed."""
    from vibo_tpu.ops import distributions as dist
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="laplace")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    resp, _ = _data()
    full = jnp.ones((N, M), jnp.float32)
    sparse = jnp.concatenate([jnp.ones((N, 2)), jnp.zeros((N, M - 2))], -1)
    item_mean = model.item_posterior_mean(params)
    _, lv_full, off_full = model.encode(params, resp, full, item_mean)
    _, lv_sp, off_sp = model.encode(params, resp, sparse, item_mean)
    sd_full = np.asarray(dist.tril_marginal_sigma(lv_full, off_full))
    sd_sp = np.asarray(dist.tril_marginal_sigma(lv_sp, off_sp))
    assert (sd_full < sd_sp).mean() > 0.95
    # and stay below the prior sd 1 (information only ever adds)
    assert (sd_full < 1.0).all()


@pytest.mark.parametrize("irt_model", ["1pl", "2pl", "3pl", "grm", "gpcm"])
def test_laplace_weighted_c0_equals_closed_form(irt_model):
    """laplace-w with the head's c-block forced to 0 must reproduce the
    closed-form Laplace covariance at the SAME theta mean — the family
    nests the post-hoc estimator exactly (its design contract), for every
    linear link including the graded model."""
    from vibo_tpu import evaluation
    from vibo_tpu.ops import distributions as dist
    c = 4 if irt_model in ("grm", "gpcm") else 2
    sim = simulate_irt(irt_model, N, M, ability_dim=K, seed=6,
                       missing_rate=0.2, num_categories=c)
    cfg = VIBOConfig(num_items=M, irt_model=irt_model, ability_dim=K,
                     hidden_dim=32, num_categories=c,
                     theta_posterior="laplace-w")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    # force c = 0: zero the c-block of the head
    last = params["encoder"][-1]
    params["encoder"] = list(params["encoder"])
    params["encoder"][-1] = {"w": last["w"].at[:, K:].set(0.0),
                             "b": last["b"].at[K:].set(0.0)}
    resp = jnp.asarray(sim.response)
    mask = jnp.asarray(sim.mask)
    item_mean = model.item_posterior_mean(params)
    mu, logvar, off = model.encode(params, resp, mask, item_mean)
    got = np.asarray(dist.tril_marginal_sigma(logvar, off))
    items_np = {k_: np.asarray(v) for k_, v in item_mean.items()}
    want = evaluation.laplace_sigma_from_items(
        items_np, irt_model, np.asarray(sim.mask), np.asarray(mu))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_laplace_exogenous_noise_path_runs():
    """elbo_packed_sums (trainer/DP building block) carries the anchored
    family: finite, KL >= 0, and the c head columns matter."""
    from vibo_tpu.ops.pallas_elbo import pack_responses
    resp, mask = _data()
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="laplace")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    packed = jnp.asarray(pack_responses(resp, mask))
    item_eps, theta_eps = model.sample_noise(params, jax.random.key(3), N, 2)
    ll, klt, kli = model.elbo_packed_sums(params, packed, item_eps, theta_eps)
    assert np.isfinite(float(ll)) and float(klt) >= 0
    p0 = dict(params)
    p0["encoder"] = list(params["encoder"])
    last = params["encoder"][-1]
    p0["encoder"][-1] = {"w": last["w"].at[:, K:].set(0.0),
                         "b": last["b"].at[K:].set(5.0)}
    ll0, klt0, _ = model.elbo_packed_sums(p0, packed, item_eps, theta_eps)
    assert not np.allclose(float(klt), float(klt0))


def test_laplace_training_improves_and_serves():
    """Short laplace-family fit trains and serves marginal sigmas + factor;
    K=1 degrades to the diagonal token (off None)."""
    from vibo_tpu.data import holdout_split, simulate_irt
    from vibo_tpu.train import Trainer, TrainConfig
    from vibo_tpu import evaluation
    sim = simulate_irt("2pl", N, M, ability_dim=K, seed=2)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=2)
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="laplace")
    model = VIBO(cfg)
    res = Trainer(model, TrainConfig(lr=1e-2, epochs=30, eval_every=15,
                                     log_every=15)).fit(ds)
    assert np.isfinite(res["final_elbo"])
    theta, items, sigma, tril = evaluation.infer_posterior_means(
        model, res["params"], ds, return_scale_tril=True)
    assert theta.shape == (N, K) and tril.shape == (N, K, K)
    np.testing.assert_allclose(sigma,
                               np.sqrt((tril ** 2).sum(-1)), rtol=1e-5)
    # K=1: diagonal token
    sim1 = simulate_irt("2pl", N, M, ability_dim=1, seed=3)
    m1 = VIBO(VIBOConfig(num_items=M, irt_model="2pl", ability_dim=1,
                         hidden_dim=32, theta_posterior="laplace"))
    p1 = m1.init_params(jax.random.key(0))
    _, lv, off = m1.encode(p1, jnp.asarray(sim1.response),
                           jnp.asarray(sim1.mask),
                           m1.item_posterior_mean(p1))
    assert off is None and lv.shape == (N, 1)


def test_chol_training_improves_and_serves():
    """Short chol-family fit trains (finite, improving) and the serving /
    posterior-mean path emits marginal sigmas + the Cholesky factor."""
    from vibo_tpu.data import holdout_split, simulate_irt
    from vibo_tpu.train import Trainer, TrainConfig
    from vibo_tpu import evaluation
    sim = simulate_irt("2pl", N, M, ability_dim=K, seed=2)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=2)
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, theta_posterior="chol")
    model = VIBO(cfg)
    res = Trainer(model, TrainConfig(lr=1e-2, epochs=30, eval_every=15,
                                     log_every=15)).fit(ds)
    assert np.isfinite(res["final_elbo"])
    theta, items, sigma, tril = evaluation.infer_posterior_means(
        model, res["params"], ds, return_scale_tril=True)
    assert theta.shape == (N, K) and sigma.shape == (N, K)
    assert tril.shape == (N, K, K)
    # marginal sigma must equal the row norms of the factor
    np.testing.assert_allclose(sigma, np.sqrt((tril ** 2).sum(-1)),
                               rtol=1e-4, atol=1e-5)
    # strictly-upper entries are zero by construction
    assert np.abs(np.triu(tril, 1)).max() == 0.0


# --------------------- compressed (sufficient-statistic) item conditioning

@pytest.mark.parametrize("irt_model", ["1pl", "2pl", "3pl", "deep"])
def test_condition_on_stats_finite_and_grads_flow(irt_model):
    """condition_on='stats' (the K>1-capable structured family): finite
    ELBO/IWAE on every link, and gradients flow to the item posterior
    THROUGH the encoder pathway (the structured-VI coupling that makes it
    q(theta | d, r) rather than a mean-field ablation)."""
    resp, mask = _data(irt_model)
    cfg = VIBOConfig(num_items=M, irt_model=irt_model, ability_dim=K,
                     hidden_dim=32, condition_on="stats",
                     item_latent_dim=4, deep_hidden_dim=16)
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    bound, aux = model.elbo(params, jax.random.key(1), resp, mask, 1.0, 2)
    assert np.isfinite(float(bound))
    assert np.isfinite(float(model.iwae(params, jax.random.key(2), resp,
                                        mask, num_samples=3)))
    # encoder-only pathway: differentiate the theta-KL (which touches the
    # item posterior ONLY via the stats-modulated encoder weights) wrt the
    # item posterior means — nonzero iff the conditioning is wired through
    def klt_only(p):
        post = p["item_post"]
        item_sample = {n: post[n]["mu"] for n in post}
        mu, logvar, off = model.encode(p, resp, mask, item_sample)
        return model.theta_kl(mu, logvar, off).sum()

    g = jax.grad(klt_only)(params)["item_post"]
    total = sum(float(jnp.abs(g[n]["mu"]).sum()) for n in g)
    assert total > 0.0


def test_condition_on_stats_feat_dim_and_head_rows():
    """Encoder first layer carries exactly 2M + Fr + Fm rows under 'stats'
    (vs 2M + M*(K+1) under 'sample'), and the algebraic identity
    rm @ (W + A_r Wf_r) == rm @ W + (rm @ A_r) @ Wf_r holds — i.e. the
    weight modulation computes statistic-input conditioning exactly."""
    from vibo_tpu.models import networks
    fr, fm = networks.condition_stat_dim("2pl", K)
    assert (fr, fm) == (K + 1, (K + 1) + K + 1 + (K * (K + 1)) // 2)
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, condition_on="stats")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    assert params["encoder"][0]["w"].shape[0] == 2 * M + fr + fm

    resp, mask = _data()
    post = params["item_post"]
    sample = model.sample_items(params, jax.random.key(3))
    a_r, a_m = networks.condition_stat_mats(sample, M, "2pl")
    assert a_r.shape == (M, fr) and a_m.shape == (M, fm)
    w1 = params["encoder"][0]
    w_r_eff, w_m_eff = networks.modulated_first_layer(w1, (a_r, a_m), M)
    rm = resp * mask
    wf = w1["w"][2 * M:]
    direct = (rm @ w1["w"][:M] + mask @ w1["w"][M:2 * M]
              + (rm @ a_r) @ wf[:fr] + (mask @ a_m) @ wf[fr:])
    np.testing.assert_allclose(np.asarray(rm @ w_r_eff + mask @ w_m_eff),
                               np.asarray(direct), rtol=1e-4, atol=1e-5)


def test_condition_on_stats_packed_matches_dense():
    from vibo_tpu.ops.pallas_elbo import pack_responses
    resp, mask = _data()
    key = jax.random.key(1)
    packed = pack_responses(resp, mask)
    for use_pallas in (False, True):
        cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                         hidden_dim=32, condition_on="stats",
                         use_pallas=use_pallas)
        model = VIBO(cfg)
        params = model.init_params(jax.random.key(0))
        b1, _ = model.elbo(params, key, resp, mask, 0.5, 2)
        b2, _ = model.elbo_packed(params, key, packed, 0.5, 2)
        np.testing.assert_allclose(float(b2), float(b1), rtol=1e-5)


def test_condition_on_stats_exogenous_noise_path():
    """elbo_packed_sums (the DP building block) under 'stats' matches
    elbo_packed driven by the same exogenous noise."""
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.ops import distributions as dist
    resp, mask = _data()
    packed = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=32, condition_on="stats")
    model = VIBO(cfg)
    params = model.init_params(jax.random.key(0))
    item_eps, theta_eps = model.sample_noise(params, jax.random.key(7), N, 3)
    ll, klt, kli = model.elbo_packed_sums(params, packed, item_eps, theta_eps)
    assert np.isfinite(float(ll)) and np.isfinite(float(klt))
    # manual recomputation from the same noise
    post = params["item_post"]
    lls = []
    for s in range(3):
        sample = {n: dist.reparameterize_eps(item_eps[n][s], post[n]["mu"],
                                             post[n]["logvar"])
                  for n in item_eps}
        mu, logvar, off = model.encode(params, resp, mask, sample)
        theta = dist.tril_reparameterize_eps(theta_eps[s], mu, logvar, off)
        lls.append(float(model.loglik_per_person(params, theta, sample,
                                                 resp, mask).sum()))
    np.testing.assert_allclose(float(ll), np.mean(lls), rtol=1e-5)


# --------------------- semi-amortized theta refinement

def test_refine_theta_posterior_improves_bound():
    """Per-person SVI refinement raises the per-person ELBO on average for
    both theta-posterior families and returns well-formed outputs."""
    from vibo_tpu.data import holdout_split, simulate_irt
    from vibo_tpu.train import Trainer, TrainConfig
    from vibo_tpu import evaluation
    sim = simulate_irt("2pl", 64, M, ability_dim=K, seed=3)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=3)
    for family in ("diag", "chol"):
        cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                         hidden_dim=16, theta_posterior=family)
        model = VIBO(cfg)
        res = Trainer(model, TrainConfig(epochs=12)).fit(ds)
        mu, sigma, tril, info = evaluation.refine_theta_posterior(
            model, res["params"], ds, steps=150, num_samples=6)
        assert mu.shape == (64, K) and sigma.shape == (64, K)
        assert tril.shape == (64, K, K)
        assert np.isfinite(mu).all() and np.isfinite(sigma).all()
        np.testing.assert_allclose(sigma, np.sqrt((tril ** 2).sum(-1)),
                                   rtol=1e-4, atol=1e-5)
        assert info["elbo_gain_per_person"] > 0, family
        # a refined per-person bound should rarely drop below its
        # amortized start (MC noise in the paired eval allows a few)
        assert info["persons_worse"] <= 6, family


def test_refine_theta_posterior_prior_oracle():
    """EXACT oracle: a person with zero observed responses has posterior ==
    prior, so refinement must drive their q(theta) to N(0, I) regardless of
    where the (extrapolating) encoder initializes it — mu -> 0, marginal
    sd -> 1, off-diagonals -> 0. The loglik term is identically zero under
    an all-zero mask, so the optimization is deterministic KL descent."""
    from vibo_tpu.data import holdout_split, simulate_irt
    from vibo_tpu.train import Trainer, TrainConfig
    from vibo_tpu import evaluation
    sim = simulate_irt("2pl", 48, M, ability_dim=K, seed=5)
    mask = np.asarray(sim.mask).copy()
    mask[:3] = 0.0                    # three all-missing persons
    ds = holdout_split(np.asarray(sim.response), mask, 0.1, seed=5)
    cfg = VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                     hidden_dim=16, theta_posterior="chol")
    model = VIBO(cfg)
    res = Trainer(model, TrainConfig(epochs=10)).fit(ds)
    mu, sigma, tril, _ = evaluation.refine_theta_posterior(
        model, res["params"], ds, steps=600, lr=0.05, num_samples=2)
    assert np.abs(mu[:3]).max() < 0.05
    np.testing.assert_allclose(sigma[:3], 1.0, atol=0.05)
    # off-diagonal mixing of the refined factor vanishes at the prior
    assert np.abs(np.tril(tril[:3], -1)).max() < 0.05
