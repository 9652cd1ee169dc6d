"""Generalized partial credit model (polytomous) tests: simulator, model
objectives, packed/sharded equality, evaluation suite, baselines, recovery.

The GPCM (Muraki 1992) is the second classical polytomous family next to
the VIBO journal extension's graded response model (arXiv:2108.11579);
tests mirror tests/test_grm.py's contracts (the low-level likelihood
oracles live in tests/test_ops.py, the fused kernel in
tests/test_pallas_gpcm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu import evaluation
from vibo_tpu.data import holdout_split, simulate_irt
from vibo_tpu.models import VIBO, VIBOConfig
from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops import links
from vibo_tpu.train import Trainer, TrainConfig

N, M, C, K = 64, 24, 4, 2


def _gpcm_setup(seed=0, n=N, m=M, c=C, k=K, missing=0.1, **cfg_kw):
    sim = simulate_irt("gpcm", n, m, ability_dim=k, num_categories=c,
                       seed=seed, missing_rate=missing)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=seed, name="gpcm",
                       num_categories=c)
    model = VIBO(VIBOConfig(num_items=m, irt_model="gpcm", num_categories=c,
                            ability_dim=k, hidden_dim=32, **cfg_kw))
    return sim, ds, model


# ----------------------------------------------------------------- simulator

def test_simulate_gpcm_properties():
    sim = simulate_irt("gpcm", 500, 30, ability_dim=1, num_categories=5,
                       seed=1, missing_rate=0.2)
    r = sim.response[sim.mask > 0]
    assert set(np.unique(r)) <= set(range(5))
    # all categories populated under the centered step draw
    assert len(np.unique(r)) == 5
    assert sim.b.shape == (30, 4)          # unconstrained steps (no ordering)
    assert sim.num_categories == 5
    # expected normalized score matches the empirical mean (LLN)
    dense = simulate_irt("gpcm", 4000, 8, num_categories=4, seed=2)
    np.testing.assert_allclose(dense.response.mean(0) / 3.0,
                               dense.prob.mean(0), atol=0.03)


def test_simulate_gpcm_validation():
    with pytest.raises(ValueError):
        simulate_irt("gpcm", 10, 5, num_categories=2)


def test_simulate_gpcm_matches_likelihood():
    """The simulator's category frequencies match ops.likelihood's
    gpcm_logprob_all probabilities at the generating parameters (the two
    are independent implementations of the same family)."""
    sim = simulate_irt("gpcm", 6000, 4, ability_dim=1, num_categories=4,
                       seed=5)
    p_model = np.exp(np.asarray(lik.gpcm_logprob_all(
        jnp.asarray(sim.theta @ sim.a.T),
        links.gpcm_cumsteps(jnp.asarray(sim.b)))))      # (N, M, C)
    for c in range(4):
        emp = (sim.response == c).mean(0)
        np.testing.assert_allclose(emp, p_model[:, :, c].mean(0), atol=0.03)


# ------------------------------------------------------------------- config

def test_gpcm_config_validation():
    with pytest.raises(ValueError):
        VIBOConfig(num_items=M, irt_model="gpcm")          # C=2 is 2pl
    with pytest.raises(ValueError):
        VIBOConfig(num_items=M, irt_model="gpcm", num_categories=33)


# -------------------------------------------------------------- objectives

def test_gpcm_elbo_packed_matches_unpacked():
    from vibo_tpu.ops.pallas_elbo import pack_responses
    sim, ds, model = _gpcm_setup()
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


def test_gpcm_iwae_bounds():
    """IWAE monotonicity (Burda et al.): IWAE-S >= IWAE-1 in expectation,
    and IWAE-1 matches the ELBO in expectation."""
    sim, ds, model = _gpcm_setup()
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


def test_gpcm_padding_invariance():
    """Zero-padded (mask=0) rows leave the ELBO exactly unchanged."""
    from vibo_tpu.data.masking import pad_to_multiple
    sim, ds, model = _gpcm_setup()
    params = model.init_params(jax.random.key(0))
    key = jax.random.key(3)
    ref, _ = model.elbo(params, key, jnp.asarray(ds.response),
                        jnp.asarray(ds.train_mask), 1.0, 2)
    pds = pad_to_multiple(ds, person_multiple=16, item_multiple=1)
    model_p = VIBO(VIBOConfig(num_items=pds.response.shape[1],
                              irt_model="gpcm", num_categories=C,
                              ability_dim=K, hidden_dim=32))
    got, _ = model_p.elbo(params, key, jnp.asarray(pds.response),
                          jnp.asarray(pds.train_mask), 1.0, 2)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


# -------------------------------------------------------------- eval suite

def test_gpcm_eval_suite_runs():
    sim, ds, model = _gpcm_setup()
    params = model.init_params(jax.random.key(0))
    ev = evaluation.imputation_accuracy(model, params, ds)
    assert 0.0 <= ev["acc"] <= 1.0
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


def test_gpcm_eval_sharded_matches_single(eight_devices):
    from vibo_tpu.parallel import make_mesh
    sim, ds, model = _gpcm_setup()
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

def test_gpcm_dp_step_matches_unsharded(eight_devices):
    """One shard_map DP packed train step == jax.grad of the identical
    unsharded loss (SGD so the comparison is linear in the gradient)."""
    import optax
    from vibo_tpu.ops import objectives
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.parallel import make_mesh
    sim, ds, model = _gpcm_setup()
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


def test_gpcm_2d_laplace_w_step_matches_unsharded(eight_devices):
    """The flagship polytomous recipe (stats conditioning + Fisher-WEIGHTED
    anchor) on the 4x2 ('students','items') mesh == jax.grad of the
    identical unsharded packed loss — the GPCM Fisher weights (Var[c])
    evaluated at the psum'd global head mean."""
    import optax
    from vibo_tpu.ops import objectives
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.parallel import make_mesh
    sim, ds, model = _gpcm_setup(condition_on="stats",
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


# ---------------------------------------------------------------- baselines

def test_mle_gpcm_fits():
    """MAP point estimation under the partial-credit likelihood recovers
    theta on a small dense matrix."""
    from vibo_tpu.models import mle
    sim = simulate_irt("gpcm", 400, 30, ability_dim=1, num_categories=4,
                       seed=4)
    cfg = mle.MLEConfig(irt_model="gpcm", ability_dim=1, num_categories=4,
                        steps=400, seed=0)
    params, loss = mle.fit_mle(sim.response, sim.mask, cfg)
    assert np.isfinite(loss)
    # sign gauge: align via the loading correlation before correlating theta
    flip = np.sign(np.corrcoef(np.asarray(params["a"])[:, 0], sim.a[:, 0])[0, 1])
    r = np.corrcoef(flip * np.asarray(params["theta"])[:, 0],
                    sim.theta[:, 0])[0, 1]
    assert r > 0.8
    prob = np.asarray(mle.response_prob(params, cfg))
    assert prob.shape == (400, 30, 4)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-5)


def test_em_gpcm_recovery():
    """Bock-Aitkin MML for the partial-credit family: EAP abilities and
    step parameters recover the generating truth (sign gauge aligned)."""
    from vibo_tpu.models import em
    sim = simulate_irt("gpcm", 600, 40, ability_dim=1, seed=7,
                       num_categories=5, missing_rate=0.1)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=7,
                       num_categories=5)
    res = em.fit_em(ds.response, ds.train_mask,
                    em.EMConfig(irt_model="gpcm", num_categories=5))
    assert res["irt_model"] == "gpcm"
    flip = np.sign(np.corrcoef(res["a"], sim.a[:, 0])[0, 1])
    r_theta = np.corrcoef(flip * res["theta_eap"], sim.theta[:, 0])[0, 1]
    assert r_theta > 0.85
    # cumulative-step table agreement (location+sign gauge tolerated via
    # plain correlation)
    r_kap = np.corrcoef(res["kap"].ravel(),
                        np.cumsum(sim.b, -1).ravel())[0, 1]
    assert r_kap > 0.9
    # posterior-predictive category probabilities normalize and beat the
    # base rate on held-out cells
    prob = em.response_prob(res)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-4)
    h = ds.heldout_mask
    pred = prob.argmax(-1).astype(np.float32)
    acc = float((h * (pred == ds.response)).sum() / h.sum())
    base = max(float((h * (ds.response == c)).sum() / h.sum())
               for c in range(5))
    assert acc > base + 0.02


def test_em_gpcm_marginal_loglik_increases():
    from vibo_tpu.models import em
    sim = simulate_irt("gpcm", 200, 20, ability_dim=1, seed=3,
                       num_categories=4)
    resp = jnp.asarray(sim.response)
    mask = jnp.asarray(sim.mask)
    nodes, w = em.gauss_hermite_nodes(31)
    log_w = jnp.log(w)
    a = jnp.ones((20,), jnp.float32)
    b_free = em._gpcm_step_init(sim.response, sim.mask, 4)
    lls = []
    for _ in range(6):
        post, ll = em.e_step_grm(resp, mask, nodes, log_w, a, b_free, 4,
                                 irt_model="gpcm")
        lls.append(float(ll))
        n_qjc = jnp.stack([post.T @ (mask * (resp == cat))
                           for cat in range(4)], axis=-1)
        a, b_free = em.m_step_grm(n_qjc, nodes, a, b_free, 8,
                                  irt_model="gpcm")
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:])), lls


def test_hmc_gpcm_short_chain_runs():
    """A short partial-credit HMC chain runs end-to-end with finite
    diagnostics and category-prob posterior predictive (convergence is the
    slow tests' job; this pins the potential + ridge-move plumbing)."""
    from vibo_tpu.models import hmc
    sim = simulate_irt("gpcm", 60, 12, ability_dim=1, num_categories=4,
                       seed=9, missing_rate=0.1)
    cfg = hmc.HMCConfig(irt_model="gpcm", ability_dim=1, num_categories=4,
                        num_warmup=40, num_samples=40, num_chains=2,
                        num_leapfrog=8, seed=0)
    out = hmc.run_hmc(sim.response, sim.mask, cfg)
    assert out["samples"]["theta"].shape[1:] == (60, 1)
    assert out["samples"]["b"].shape[1:] == (12, 3)
    assert np.isfinite(out["diagnostics"]["rhat_max"])
    prob = hmc.posterior_mean_prob(out["samples"], "gpcm")
    assert prob.shape == (60, 12, 4)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-4)


# ----------------------------------------------------------------- recovery

@pytest.mark.slow
def test_gpcm_recovery():
    """Statistical recovery on synthetic GPCM data: inferred abilities and
    cumulative steps correlate with the generating truth."""
    sim, ds, model = _gpcm_setup(seed=3, n=1500, m=60, c=5, k=1, **{})
    res = Trainer(model, TrainConfig(epochs=150, eval_every=150)).fit(ds)
    theta_hat, items = evaluation.infer_posterior_means(model, res["params"],
                                                        ds)
    corr = evaluation.correlation(theta_hat, sim.theta)
    assert corr["pearson"] > 0.85
    kap_hat = np.asarray(links.gpcm_cumsteps(jnp.asarray(items["b"])))
    kc = evaluation.correlation(kap_hat.ravel(), np.cumsum(sim.b, -1).ravel())
    assert kc["pearson"] > 0.9
    ev = evaluation.imputation_accuracy(model, res["params"], ds)
    assert ev["acc"] > ev["base_rate"] + 0.02


@pytest.mark.parametrize("family", ["grm", "gpcm"])
def test_hmc_packed_potential_matches_dense(family):
    """The fused-kernel polytomous potential (use_packed_kernel=True) ==
    the dense XLA potential, value AND gradient (round 5: sampling rides
    the same one-pass kernels as the binary links)."""
    from vibo_tpu.models import hmc
    from vibo_tpu.ops.pallas_elbo import pack_responses
    sim = simulate_irt(family, 40, 16, ability_dim=2, num_categories=4,
                       seed=11, missing_rate=0.2)
    cfg = hmc.HMCConfig(irt_model=family, ability_dim=2, num_categories=4)
    pk = jnp.asarray(pack_responses(sim.response, sim.mask))
    u_dense = hmc.make_potential(sim.response, sim.mask, cfg)
    u_pack = hmc.make_potential(sim.response, sim.mask, cfg, packed=pk)
    rng = np.random.default_rng(0)
    params = {
        "theta": jnp.asarray(rng.standard_normal((40, 2)), jnp.float32),
        "a": jnp.asarray(rng.standard_normal((16, 2)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((16, 3)), jnp.float32),
    }
    v1, g1 = jax.value_and_grad(u_dense)(params)
    v2, g2 = jax.value_and_grad(u_pack)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-4), g1, g2)
