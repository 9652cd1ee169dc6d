"""Graded response model (polytomous) tests: simulator, model objectives,
packed/sharded equality, evaluation suite, recovery.

The GRM is the polytomous family of the VIBO journal extension
(arXiv:2108.11579); SURVEY.md section 3.3's binary contracts are mirrored
here for the ordinal case (the low-level likelihood oracles live in
tests/test_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu import evaluation
from vibo_tpu.data import holdout_split, simulate_irt
from vibo_tpu.models import VIBO, VIBOConfig
from vibo_tpu.ops import links
from vibo_tpu.ops import likelihood as lik
from vibo_tpu.train import Trainer, TrainConfig

N, M, C, K = 64, 24, 4, 2


def _grm_setup(seed=0, n=N, m=M, c=C, k=K, missing=0.1, **cfg_kw):
    sim = simulate_irt("grm", n, m, ability_dim=k, num_categories=c,
                       seed=seed, missing_rate=missing)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=seed, name="grm",
                       num_categories=c)
    model = VIBO(VIBOConfig(num_items=m, irt_model="grm", num_categories=c,
                            ability_dim=k, hidden_dim=32, **cfg_kw))
    return sim, ds, model


# ----------------------------------------------------------------- simulator

def test_simulate_grm_properties():
    sim = simulate_irt("grm", 500, 30, ability_dim=1, num_categories=5,
                       seed=1, missing_rate=0.2)
    r = sim.response[sim.mask > 0]
    assert set(np.unique(r)) <= set(range(5))
    # all categories populated under the centered threshold draw
    assert len(np.unique(r)) == 5
    assert sim.b.shape == (30, 4)
    assert np.all(np.diff(sim.b, axis=-1) > 0)          # ordered thresholds
    assert sim.num_categories == 5
    # expected normalized score matches the empirical mean (LLN)
    dense = simulate_irt("grm", 4000, 8, num_categories=4, seed=2)
    np.testing.assert_allclose(dense.response.mean(0) / 3.0,
                               dense.prob.mean(0), atol=0.03)


def test_simulate_grm_validation():
    with pytest.raises(ValueError):
        simulate_irt("grm", 10, 5, num_categories=2)


def test_dataset_num_categories_propagates():
    from vibo_tpu.data.masking import pad_to_multiple, split_items, \
        split_persons
    sim, ds, _ = _grm_setup()
    assert ds.num_categories == C
    tr, te = split_persons(ds, 0.2, seed=0)
    assert tr.num_categories == te.num_categories == C
    tri, tei = split_items(ds, 0.2, seed=0)
    assert tri.num_categories == tei.num_categories == C
    assert pad_to_multiple(ds, 16, 32).num_categories == C


# ------------------------------------------------------------------- config

def test_grm_config_validation():
    with pytest.raises(ValueError):
        VIBOConfig(num_items=M, irt_model="grm")           # C=2 is 2pl
    with pytest.raises(ValueError):
        VIBOConfig(num_items=M, irt_model="grm", num_categories=33)
    with pytest.raises(ValueError):
        VIBOConfig(num_items=M, irt_model="2pl", num_categories=4)


# -------------------------------------------------------------- objectives

def test_grm_elbo_packed_matches_unpacked():
    from vibo_tpu.ops.pallas_elbo import pack_responses
    sim, ds, model = _grm_setup()
    params = model.init_params(jax.random.key(0))
    resp = jnp.asarray(ds.response)
    mask = jnp.asarray(ds.train_mask)
    key = jax.random.key(1)
    ref, aux = jax.jit(lambda p, k: model.elbo(p, k, resp, mask, 1.0, 2))(
        params, key)
    pk = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    got, _ = jax.jit(lambda p, k: model.elbo_packed(p, k, pk, 1.0, 2))(
        params, key)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_grm_iwae_bounds():
    """IWAE monotonicity (Burda et al.): IWAE-S >= IWAE-1 in expectation,
    and IWAE-1 matches the ELBO in expectation (stochastic vs analytic KL
    terms differ per draw)."""
    sim, ds, model = _grm_setup()
    params = model.init_params(jax.random.key(0))
    resp = jnp.asarray(ds.response)
    mask = jnp.asarray(ds.train_mask)
    keys = jax.random.split(jax.random.key(2), 16)
    i1 = np.mean([float(model.iwae(params, k, resp, mask, num_samples=1))
                  for k in keys])
    i25 = np.mean([float(model.iwae(params, k, resp, mask, num_samples=25))
                   for k in keys])
    e = np.mean([float(model.elbo(params, k, resp, mask, 1.0, 4)[0])
                 for k in keys])
    assert np.isfinite(i1) and np.isfinite(i25) and np.isfinite(e)
    assert i25 >= i1 - 1.0          # monotone up to MC noise
    assert abs(i1 - e) / abs(e) < 0.05  # same quantity in expectation


def test_grm_padding_invariance():
    """Zero-padded (mask=0) rows/columns leave the ELBO exactly unchanged."""
    from vibo_tpu.data.masking import pad_to_multiple
    sim, ds, model = _grm_setup()
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(3)
    ref, _ = model.elbo(params, key, jnp.asarray(ds.response),
                        jnp.asarray(ds.train_mask), 1.0, 2)
    pds = pad_to_multiple(ds, person_multiple=16, item_multiple=1)
    model_p = VIBO(VIBOConfig(num_items=pds.response.shape[1],
                              irt_model="grm", num_categories=C,
                              ability_dim=K, hidden_dim=32))
    # same weights where shapes match: person padding only (items unchanged)
    got, _ = model_p.elbo(params, key, jnp.asarray(pds.response),
                          jnp.asarray(pds.train_mask), 1.0, 2)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


# -------------------------------------------------------------- Fisher info

def test_grm_laplace_weight_matches_autodiff():
    """The closed-form GRM Fisher weight in laplace_sigma_from_items equals
    the expected information sum_c P_c (d log P_c / d eta)^2 from autodiff."""
    rng = np.random.default_rng(0)
    kappa = np.sort(rng.standard_normal((1, C - 1)), -1).astype(np.float32)
    eta = 0.7

    def logp_c(e, c):
        allp = lik.graded_logprob_all(jnp.full((1, 1), e),
                                      jnp.asarray(kappa))
        return allp[0, 0, c]

    w_auto = 0.0
    for c in range(C):
        g = jax.grad(logp_c)(jnp.float32(eta), c)
        w_auto += float(jnp.exp(logp_c(jnp.float32(eta), c))) * float(g) ** 2

    # closed form (mirrors evaluation.laplace_sigma_from_items grm branch)
    sc = 1.0 / (1.0 + np.exp(-(eta - kappa[0])))
    s_lo = np.concatenate([[1.0], sc])
    s_hi = np.concatenate([sc, [0.0]])
    pcat = s_lo - s_hi
    d_lo = np.concatenate([[0.0], sc * (1 - sc)])
    d_hi = np.concatenate([sc * (1 - sc), [0.0]])
    w_closed = (np.square(d_lo - d_hi) / pcat).sum()
    np.testing.assert_allclose(w_auto, w_closed, rtol=1e-4)


# -------------------------------------------------------------- eval suite

def test_grm_bitcode_roundtrip():
    sim, ds, _ = _grm_setup(c=7)
    code = np.asarray(evaluation.dataset_code_on_device(ds))
    resp, tmask, hmask = (np.asarray(x) for x in
                          evaluation._decode_bits(jnp.asarray(code), 7))
    np.testing.assert_array_equal(resp, ds.response)
    np.testing.assert_array_equal(tmask, ds.train_mask)
    np.testing.assert_array_equal(hmask, ds.heldout_mask)


def test_grm_bitcode_rejects_too_many_categories():
    """Round-4 advisor: a Dataset built directly with num_categories > 32
    (VIBOConfig caps C at 32 but holdout_split does not) would silently
    collide category bits with the mask bits 5/6 — the bit-code builder
    must fail loudly instead."""
    import dataclasses

    import pytest

    from vibo_tpu.data.masking import holdout_split

    rng = np.random.default_rng(0)
    resp = rng.integers(0, 33, (8, 6)).astype(np.float32)
    mask = np.ones((8, 6), np.float32)
    ds = holdout_split(resp, mask, 0.1, seed=0, num_categories=33)
    with pytest.raises(ValueError, match="32-category"):
        evaluation.dataset_code_on_device(ds)


def test_grm_eval_suite_runs():
    sim, ds, model = _grm_setup()
    params = model.init_params(jax.random.key(0))
    ev = evaluation.imputation_accuracy(model, params, ds)
    assert 0.0 <= ev["acc"] <= 1.0
    # base rate is the majority CATEGORY frequency among held-out cells
    r = ds.response[ds.heldout_mask > 0]
    want_base = max((r == c).mean() for c in range(C))
    np.testing.assert_allclose(ev["base_rate"], want_base, atol=1e-6)
    cal = evaluation.calibration(model, params, ds)
    assert 0.0 <= cal["ece"] <= 1.0
    assert 0.0 <= cal["brier"] <= 2.0                   # multiclass Brier
    iw = evaluation.iwae_loglik(model, params, jax.random.key(1), ds,
                                num_samples=5)
    assert np.isfinite(iw["loglik_per_cell"])
    sd = evaluation.laplace_theta_sigma(model, params, ds)
    assert sd.shape == (N, K) and np.all((sd > 0) & (sd <= 1.0 + 1e-6))


def test_grm_eval_sharded_matches_single(eight_devices):
    from vibo_tpu.parallel import make_mesh
    sim, ds, model = _grm_setup()
    params = model.init_params(jax.random.key(0))
    mesh = make_mesh(eight_devices)
    ref = evaluation.imputation_accuracy(model, params, ds)
    got = evaluation.imputation_accuracy_sharded(model, params, ds, mesh)
    assert got["num_heldout"] == ref["num_heldout"]
    np.testing.assert_allclose(got["acc"], ref["acc"], rtol=1e-6)
    cal_ref = evaluation.calibration(model, params, ds)
    cal_got = evaluation.calibration_sharded(model, params, ds, mesh)
    np.testing.assert_allclose(cal_got["brier"], cal_ref["brier"], rtol=1e-5)
    np.testing.assert_allclose(cal_got["ece"], cal_ref["ece"], atol=1e-6)


# ----------------------------------------------------------------- sharding

def test_grm_dp_step_matches_unsharded(eight_devices):
    """One shard_map DP packed train step == jax.grad of the identical
    unsharded loss (SGD so the comparison is linear in the gradient)."""
    import optax
    from vibo_tpu.ops import objectives
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.parallel import make_mesh
    sim, ds, model = _grm_setup()
    packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    rowv = jnp.ones(N, jnp.float32)
    key0, key1 = jax.random.key(0), jax.random.key(7)

    mesh = make_mesh(eight_devices)
    tr = Trainer(model, TrainConfig(lr=1e-2), mesh=mesh)
    tr.optimizer = optax.sgd(0.1)
    p0, o0 = tr.init_state(key0)
    step = tr.make_step_packed_dp(0.8, 2)
    sh_pk, sh_rv = tr._dp_in_shardings()
    p_dp, _, aux_dp = step(p0, o0, key1,
                           jax.device_put(packed, sh_pk),
                           jax.device_put(rowv, sh_rv))

    tr1 = Trainer(model, TrainConfig(lr=1e-2))
    tr1.optimizer = optax.sgd(0.1)
    p1, o1 = tr1.init_state(key0)
    item_eps, theta_eps = model.sample_noise(p1, key1, N, 2)

    def loss_fn(p):
        ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps, theta_eps,
                                              rowv)
        return -objectives.elbo(ll, klt, kli, 0.8)

    g = jax.grad(loss_fn)(p1)
    upd, _ = tr1.optimizer.update(g, o1, p1)
    p_ref = optax.apply_updates(p1, upd)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=2e-3, atol=1e-5), p_dp, p_ref)


def test_grm_2d_laplace_w_step_matches_unsharded(eight_devices):
    """The flagship graded recipe (stats conditioning + Fisher-WEIGHTED
    anchor) on the 4x2 ('students','items') mesh == jax.grad of the
    identical unsharded packed loss: the per-shard weighted pair blocks
    must psum over 'items' into the exact global per-person information,
    with the graded Fisher weights evaluated at the (already-global)
    psum'd head mean (RESULTS.md 'GRM at K=2')."""
    import optax
    from vibo_tpu.ops import objectives
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.parallel import make_mesh
    sim, ds, model = _grm_setup(condition_on="stats",
                                theta_posterior="laplace-w")
    packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    rowv = jnp.ones(N, jnp.float32)
    key0, key1 = jax.random.key(0), jax.random.key(7)

    mesh = make_mesh(eight_devices, item_axis=2)
    tr = Trainer(model, TrainConfig(lr=1e-2), mesh=mesh)
    tr.optimizer = optax.sgd(0.1)
    p0, o0 = tr.init_state(key0)
    step = tr.make_step_packed_dp(0.8, 2)
    sh_pk, sh_rv = tr._dp_in_shardings()
    p_dp, _, _ = step(p0, o0, key1,
                      jax.device_put(packed, sh_pk),
                      jax.device_put(rowv, sh_rv))

    tr1 = Trainer(model, TrainConfig(lr=1e-2))
    tr1.optimizer = optax.sgd(0.1)
    p1, o1 = tr1.init_state(key0)
    item_eps, theta_eps = model.sample_noise(p1, key1, N, 2)

    def loss_fn(p):
        ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps, theta_eps,
                                              rowv)
        return -objectives.elbo(ll, klt, kli, 0.8)

    g = jax.grad(loss_fn)(p1)
    upd, _ = tr1.optimizer.update(g, o1, p1)
    p_ref = optax.apply_updates(p1, upd)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=2e-3, atol=1e-5), p_dp, p_ref)


# ----------------------------------------------------------------- recovery

@pytest.mark.slow
def test_grm_recovery():
    """Statistical recovery on synthetic GRM data: inferred abilities and
    ordered thresholds correlate with the generating truth."""
    sim, ds, model = _grm_setup(seed=3, n=1500, m=60, c=5, k=1, **{})
    res = Trainer(model, TrainConfig(epochs=150, eval_every=150)).fit(ds)
    theta_hat, items = evaluation.infer_posterior_means(model, res["params"],
                                                        ds)
    corr = evaluation.correlation(theta_hat, sim.theta)
    assert corr["pearson"] > 0.85
    kappa_hat = np.asarray(links.grm_thresholds(jnp.asarray(items["b"])))
    kc = evaluation.correlation(kappa_hat.ravel(), sim.b.ravel())
    assert kc["pearson"] > 0.9
    ev = evaluation.imputation_accuracy(model, res["params"], ds)
    assert ev["acc"] > ev["base_rate"] + 0.02
