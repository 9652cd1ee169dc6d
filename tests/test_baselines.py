"""Baseline parity tests (SURVEY.md section 5, [B] config 5): MLE/MAP, EM,
and HMC on the same tiny synthetic sets — parameter recovery + imputation
above base rate, and cross-method agreement."""

import jax
import numpy as np
import pytest

from vibo_tpu import evaluation
from vibo_tpu.data import simulate_irt, holdout_split
from vibo_tpu.models import em, hmc, mle


@pytest.fixture(scope="module")
def synth_2pl():
    sim = simulate_irt("2pl", 400, 48, ability_dim=1, seed=5)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=5)
    return sim, ds


def test_mle_recovery(synth_2pl):
    sim, ds = synth_2pl
    cfg = mle.MLEConfig(irt_model="2pl", ability_dim=1, steps=400, lr=0.05)
    params, loss = mle.fit_mle(ds.response, ds.train_mask, cfg)
    assert np.isfinite(loss)
    corr = evaluation.correlation(np.asarray(params["theta"])[:, 0], sim.theta[:, 0])
    assert corr["pearson"] > 0.8
    bcorr = evaluation.correlation(np.asarray(params["b"]), sim.b)
    assert bcorr["pearson"] > 0.8
    # imputation above base rate
    prob = np.asarray(mle.response_prob(params, cfg))
    pred = (prob > 0.5).astype(np.float32)
    h = ds.heldout_mask
    acc = (h * (pred == ds.response)).sum() / h.sum()
    ones = (h * ds.response).sum() / h.sum()
    assert acc > max(ones, 1 - ones) + 0.02


def test_mle_1pl_and_3pl_run():
    sim = simulate_irt("3pl", 120, 24, ability_dim=1, seed=2)
    for model in ("1pl", "3pl"):
        cfg = mle.MLEConfig(irt_model=model, ability_dim=1, steps=100)
        params, loss = mle.fit_mle(sim.response, sim.mask, cfg)
        assert np.isfinite(loss)


def test_em_recovery(synth_2pl):
    sim, ds = synth_2pl
    res = em.fit_em(ds.response, ds.train_mask, em.EMConfig(irt_model="2pl"))
    assert res["iterations"] >= 2
    assert np.isfinite(res["log_marginal"])
    # recovery: note sim scales a by 1/sqrt(K)=1 here
    assert evaluation.correlation(res["b"], sim.b)["pearson"] > 0.85
    assert evaluation.correlation(res["a"], sim.a[:, 0])["pearson"] > 0.5
    assert evaluation.correlation(res["theta_eap"], sim.theta[:, 0])["pearson"] > 0.8


def test_em_marginal_loglik_increases(synth_2pl):
    """EM's defining property: the marginal log-lik is monotone."""
    sim, ds = synth_2pl
    import jax.numpy as jnp
    resp = jnp.asarray(ds.response)
    mask = jnp.asarray(ds.train_mask)
    nodes, w = em.gauss_hermite_nodes(41)
    log_w = np.log(np.asarray(w))
    a = np.ones(48, np.float32)
    pval = (ds.response * ds.train_mask).sum(0) / np.maximum(ds.train_mask.sum(0), 1)
    b = -np.log(np.clip(pval, 0.05, 0.95) / (1 - np.clip(pval, 0.05, 0.95)))
    lls = []
    import jax.numpy as jnp
    a_j, b_j = jnp.asarray(a), jnp.asarray(b)
    for _ in range(6):
        post, ll = em.e_step(resp, mask, nodes, jnp.asarray(log_w), a_j, b_j)
        lls.append(float(ll))
        a_j, b_j = em.m_step(resp, mask, post, nodes, a_j, b_j, 8, True)
    assert all(lls[i + 1] >= lls[i] - 1e-3 for i in range(len(lls) - 1)), lls


def test_em_1pl():
    sim = simulate_irt("1pl", 300, 30, ability_dim=1, seed=9)
    res = em.fit_em(sim.response, sim.mask, em.EMConfig(irt_model="1pl"))
    assert evaluation.correlation(res["b"], sim.b)["pearson"] > 0.9
    np.testing.assert_allclose(res["a"], 1.0)  # 1PL keeps a fixed


def test_em_posterior_predictive(synth_2pl):
    sim, ds = synth_2pl
    res = em.fit_em(ds.response, ds.train_mask, em.EMConfig(irt_model="2pl"))
    prob = em.response_prob(res)
    assert prob.shape == ds.response.shape
    pred = (prob > 0.5).astype(np.float32)
    h = ds.heldout_mask
    acc = (h * (pred == ds.response)).sum() / h.sum()
    ones = (h * ds.response).sum() / h.sum()
    assert acc > max(ones, 1 - ones) + 0.02


@pytest.fixture(scope="module")
def synth_grm_em():
    sim = simulate_irt("grm", 600, 40, ability_dim=1, seed=7,
                       num_categories=5)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=7, num_categories=5)
    res = em.fit_em(ds.response, ds.train_mask,
                    em.EMConfig(irt_model="grm", num_categories=5))
    return sim, ds, res


def test_em_grm_recovery(synth_grm_em):
    """Bock-Aitkin MML for the graded response model (round-4 VERDICT
    task #2): parameter recovery on synthetic GRM data. The K=1 graded
    marginal likelihood has the (theta, a) -> (-theta, -a) reflection
    gauge (simulate_grm draws SIGNED loadings), which correlation's
    align_sign handles; thresholds are gauge-free."""
    sim, ds, res = synth_grm_em
    assert res["iterations"] >= 2
    assert np.isfinite(res["log_marginal"])
    assert evaluation.correlation(
        res["theta_eap"], sim.theta[:, 0])["pearson"] > 0.8
    assert evaluation.correlation(res["a"], sim.a[:, 0])["pearson"] > 0.7
    kc = evaluation.correlation(res["kappa"].ravel(), sim.b.ravel(),
                                align_sign=False)
    assert kc["pearson"] > 0.95
    # EM's frame flip must be CONSISTENT between theta and a: flipping both
    # is the gauge; flipping one alone would break the likelihood
    s_theta = np.sign(np.corrcoef(res["theta_eap"], sim.theta[:, 0])[0, 1])
    s_a = np.sign(np.corrcoef(res["a"], sim.a[:, 0])[0, 1])
    assert s_theta == s_a


def test_em_grm_posterior_predictive(synth_grm_em):
    """(N, M, C) category probs: rows sum to 1, heldout categorical argmax
    accuracy beats the marginal-mode base rate."""
    sim, ds, res = synth_grm_em
    prob = em.response_prob(res)
    assert prob.shape == ds.response.shape + (5,)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=2e-3)
    h = ds.heldout_mask
    pred = prob.argmax(-1).astype(np.float32)
    acc = (h * (pred == ds.response)).sum() / h.sum()
    base = max((h * (ds.response == c)).sum() / h.sum() for c in range(5))
    assert acc > base + 0.02


def test_em_grm_marginal_loglik_increases(synth_grm_em):
    """EM's defining property holds for the graded E/M steps."""
    import jax.numpy as jnp
    sim, ds, _ = synth_grm_em
    resp = jnp.asarray(ds.response)
    mask = jnp.asarray(ds.train_mask)
    nodes, w = em.gauss_hermite_nodes(41)
    log_w = jnp.log(w)
    a = jnp.ones(40, jnp.float32)
    b_free = em._grm_threshold_init(ds.response, ds.train_mask, 5)
    lls = []
    for _ in range(6):
        post, ll = em.e_step_grm(resp, mask, nodes, log_w, a, b_free, 5)
        lls.append(float(ll))
        n_qjc = jnp.stack([post.T @ (mask * (resp == c)) for c in range(5)],
                          axis=-1)
        a, b_free = em.m_step_grm(n_qjc, nodes, a, b_free, 8)
    assert all(lls[i + 1] >= lls[i] - 1e-3 for i in range(len(lls) - 1)), lls


def test_em_grm_guards():
    sim = simulate_irt("grm", 50, 10, ability_dim=1, seed=3,
                       num_categories=4)
    with pytest.raises(ValueError, match="K=1 classical"):
        em.fit_em(sim.response, sim.mask,
                  em.EMConfig(irt_model="grm", num_categories=4,
                              ability_dim=2))
    with pytest.raises(ValueError, match="num_categories >= 3"):
        em.fit_em(sim.response, sim.mask,
                  em.EMConfig(irt_model="grm", num_categories=2))


@pytest.fixture(scope="module")
def hmc_run():
    sim = simulate_irt("2pl", 120, 24, ability_dim=1, seed=11)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=11)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=1, num_warmup=300,
                        num_samples=400, num_leapfrog=16, num_chains=2)
    out = hmc.run_hmc(ds.response, ds.train_mask, cfg)
    return sim, ds, out


@pytest.mark.slow
def test_hmc_diagnostics(hmc_run):
    sim, ds, out = hmc_run
    assert 0.4 < out["accept_rate"] <= 1.0, out
    assert out["step_size"] > 1e-4
    # 2 chains x 400 samples pooled
    assert out["samples"]["theta"].shape == (800, 120, 1)
    diag = out["diagnostics"]
    assert diag["num_chains"] == 2
    # a converged run on this easy posterior: chains agree (post sign
    # alignment — unaligned reflection modes measured R-hat ~ 5), clean run
    assert diag["rhat_max"] < 1.15, diag
    assert diag["divergences"] == 0
    assert diag["ess_min"] > 20
    assert set(diag["rhat"]) == {"theta", "a", "b"}
    # self-reported sd noise ceiling: split-half per-person theta-sd
    # agreement between chain halves — the bound on any sigma_vs_hmc
    r = diag["theta_sd_split_half_r"]
    assert np.isfinite(r) and 0.0 < r <= 1.0, diag


def test_split_rhat_detects_nonmixing():
    """Chains sampling different distributions must produce R-hat >> 1;
    identical well-mixed chains ~ 1."""
    rng = np.random.default_rng(0)
    mixed = rng.standard_normal((4, 500, 3))
    bad = mixed + np.arange(4)[:, None, None] * 5.0   # chains 5 sigma apart
    assert np.all(hmc.split_rhat(mixed) < 1.05)
    assert np.all(hmc.split_rhat(bad) > 2.0)
    # ESS: iid draws ~ C*S; a highly autocorrelated chain is far smaller
    ess_iid = hmc.effective_sample_size(mixed)
    assert np.all(ess_iid > 0.5 * 4 * 500)
    ar = np.zeros((2, 800, 1))
    eps = rng.standard_normal((2, 800, 1))
    for t in range(1, 800):
        ar[:, t] = 0.97 * ar[:, t - 1] + eps[:, t]
    assert np.all(hmc.effective_sample_size(ar) < 200)


@pytest.mark.slow
def test_hmc_recovery_and_imputation(hmc_run):
    sim, ds, out = hmc_run
    theta_mean = out["samples"]["theta"].mean(0)[:, 0]
    assert evaluation.correlation(theta_mean, sim.theta[:, 0])["pearson"] > 0.7
    b_mean = out["samples"]["b"].mean(0)
    assert evaluation.correlation(b_mean, sim.b)["pearson"] > 0.7
    prob = hmc.posterior_mean_prob(out["samples"], "2pl")
    pred = (prob > 0.5).astype(np.float32)
    h = ds.heldout_mask
    acc = (h * (pred == ds.response)).sum() / h.sum()
    ones = (h * ds.response).sum() / h.sum()
    assert acc > max(ones, 1 - ones)


def test_method_agreement(synth_2pl):
    """VIBO-family promise: methods agree on ability ranking (paper table)."""
    sim, ds = synth_2pl
    res_em = em.fit_em(ds.response, ds.train_mask, em.EMConfig(irt_model="2pl"))
    params, _ = mle.fit_mle(ds.response, ds.train_mask,
                            mle.MLEConfig(irt_model="2pl", steps=400))
    c = evaluation.correlation(res_em["theta_eap"],
                               np.asarray(params["theta"])[:, 0])
    assert c["pearson"] > 0.9


def test_em_3pl_recovery():
    """3PL EM (Fisher scoring + MAP guess prior): recovers difficulty and
    discrimination rankings, estimates guessing sanely, and beats the base
    rate on held-out imputation (round-1 VERDICT item 10)."""
    sim = simulate_irt("3pl", 1200, 48, ability_dim=1, seed=7)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=7)
    res = em.fit_em(ds.response, ds.train_mask,
                    em.EMConfig(irt_model="3pl", max_iters=200))
    assert np.isfinite(res["log_marginal"])
    assert "g_hat" in res and res["g_hat"].shape == (48,)
    # guess probabilities stay in a sane multiple-choice range
    g = 1.0 / (1.0 + np.exp(-res["g_hat"]))
    assert (g > 0.001).all() and (g < 0.75).all()
    assert evaluation.correlation(res["b"], sim.b)["pearson"] > 0.75
    assert evaluation.correlation(res["a"], sim.a[:, 0])["pearson"] > 0.4
    assert evaluation.correlation(res["theta_eap"],
                                  sim.theta[:, 0])["pearson"] > 0.75
    prob = em.response_prob(res)
    pred = (prob > 0.5).astype(np.float32)
    h = ds.heldout_mask
    acc = (h * (pred == ds.response)).sum() / h.sum()
    ones = (h * ds.response).sum() / h.sum()
    assert acc > max(ones, 1 - ones)


# --------------------- multidimensional EM (tensor-product GH grid, round 4)

def test_gh_grid_matches_1d():
    """gauss_hermite_grid(q, 1) is gauss_hermite_nodes(q) with a K axis."""
    nodes1, w1 = em.gauss_hermite_nodes(21)
    grid, logw = em.gauss_hermite_grid(21, 1)
    np.testing.assert_allclose(np.asarray(grid)[:, 0], np.asarray(nodes1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.exp(np.asarray(logw)), np.asarray(w1),
                               rtol=1e-5)


def test_gh_grid_integrates_gaussian_moments():
    """The K=2 product grid integrates low-order moments of N(0, I_2)."""
    grid, logw = em.gauss_hermite_grid(15, 2)
    g, w = np.asarray(grid), np.exp(np.asarray(logw))
    assert abs(w.sum() - 1.0) < 1e-5
    np.testing.assert_allclose(w @ g, [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.einsum("q,qi,qj->ij", w, g, g), np.eye(2),
                               atol=1e-4)


def test_em_multidim_recovery():
    """K=2 2PL EM: marginal loglik beats the K=1 fit on K=2-generated data,
    EAP abilities recover the truth after rotation alignment, and held-out
    imputation beats base rate."""
    sim = simulate_irt("2pl", 500, 60, ability_dim=2, seed=13)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=13)
    res = em.fit_em(ds.response, ds.train_mask,
                    em.EMConfig(irt_model="2pl", ability_dim=2))
    assert res["theta_eap"].shape == (500, 2)
    assert res["a"].shape == (60, 2)
    assert np.isfinite(res["log_marginal"])
    res1 = em.fit_em(ds.response, ds.train_mask,
                     em.EMConfig(irt_model="2pl", ability_dim=1))
    assert res["log_marginal"] > res1["log_marginal"]
    c = evaluation.correlation(res["theta_eap"], sim.theta,
                               align_rotation=True)
    assert c["pearson"] > 0.6, c
    prob = em.response_prob(res)
    pred = (prob > 0.5).astype(np.float32)
    h = ds.heldout_mask
    acc = (h * (pred == ds.response)).sum() / h.sum()
    ones = (h * ds.response).sum() / h.sum()
    acc1 = (h * ((em.response_prob(res1) > 0.5) == ds.response)).sum() / h.sum()
    assert acc > max(ones, 1 - ones) + 0.02
    assert acc >= acc1 - 0.005  # the extra dimension must not hurt


def test_em_multidim_marginal_monotone():
    """EM monotonicity holds through the multidim (K+1)x(K+1) M-step."""
    import jax.numpy as jnp
    sim = simulate_irt("2pl", 300, 30, ability_dim=2, seed=21)
    resp, mask = jnp.asarray(sim.response), jnp.asarray(sim.mask)
    nodes, log_w = em.gauss_hermite_grid(15, 2)
    rng = np.random.default_rng(0)
    a = jnp.asarray(
        np.concatenate([np.ones((30, 1)), 0.1 * rng.standard_normal((30, 1))],
                       axis=1), jnp.float32)
    pval = (sim.response * sim.mask).sum(0) / np.maximum(sim.mask.sum(0), 1)
    b = jnp.asarray(-np.log(np.clip(pval, 0.05, 0.95)
                            / (1 - np.clip(pval, 0.05, 0.95))), jnp.float32)
    lls = []
    for _ in range(6):
        post, ll = em.e_step(resp, mask, nodes, log_w, a, b)
        lls.append(float(ll))
        a, b = em.m_step(resp, mask, post, nodes, a, b, 8, True)
    assert all(lls[i + 1] >= lls[i] - 1e-3 for i in range(len(lls) - 1)), lls


def test_em_multidim_rejects_classical_forms():
    sim = simulate_irt("2pl", 50, 10, ability_dim=1, seed=1)
    with pytest.raises(ValueError, match="2pl-only"):
        em.fit_em(sim.response, sim.mask,
                  em.EMConfig(irt_model="3pl", ability_dim=2))
    with pytest.raises(ValueError, match="K=4"):
        em.fit_em(sim.response, sim.mask,
                  em.EMConfig(irt_model="2pl", ability_dim=5))


@pytest.mark.slow
def test_em_3pl_marginal_loglik_increases():
    """EM's monotonicity must survive the 3PL Fisher-scoring M-step."""
    sim = simulate_irt("3pl", 300, 24, ability_dim=1, seed=9)
    import jax.numpy as jnp
    resp = jnp.asarray(sim.response)
    mask = jnp.asarray(sim.mask)
    nodes, w = em.gauss_hermite_nodes(41)
    log_w = jnp.asarray(np.log(np.asarray(w)))
    a = jnp.ones(24, jnp.float32)
    pval = (sim.response * sim.mask).sum(0) / np.maximum(sim.mask.sum(0), 1)
    b = jnp.asarray(-np.log(np.clip(pval, 0.05, 0.95)
                            / (1 - np.clip(pval, 0.05, 0.95))))
    g = jnp.full((24,), -1.5, jnp.float32)
    lls = []
    for _ in range(6):
        post, ll = em.e_step(resp, mask, nodes, log_w, a, b, g)
        lls.append(float(ll))
        a, b, g = em.m_step_3pl(resp, mask, post, nodes, a, b, g, 8,
                                -1.5, 1.0)
    # MAP-regularized: monotone up to the (small) prior-term trade-off
    assert all(lls[i + 1] >= lls[i] - 1.0 for i in range(len(lls) - 1)), lls
    assert lls[-1] > lls[0]


def test_hmc_map_init_breaks_saddle():
    """The MAP initializer must not sit at the theta = a = 0 saddle (both
    gradients vanish identically there); the found mode must carry real
    discrimination/ability signal, and chains must start over-dispersed
    around it."""
    sim = simulate_irt("2pl", 120, 24, ability_dim=1, seed=3)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=3)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=1)
    u_fn = hmc.make_potential(
        np.asarray(ds.response, np.float32),
        np.asarray(ds.train_mask, np.float32), cfg)
    spec = hmc._flatten_spec(120, 24, cfg)
    mode = hmc._find_mode(u_fn, spec, cfg, jax.random.key(0))
    a = np.asarray(mode["a"])
    theta = np.asarray(mode["theta"])
    assert np.abs(a).mean() > 0.2, "MAP stuck at the a=0 saddle"
    assert np.abs(theta).std() > 0.2
    # the mode should recover the simulated abilities well
    corr = evaluation.correlation(theta[:, 0], sim.theta[:, 0])["pearson"]
    assert corr > 0.7, corr


@pytest.mark.slow
def test_hmc_prior_init_mode_still_mixes():
    """init_mode='prior' (the pre-MAP behavior) stays supported and mixes
    at small scale, where prior-scale starts are only a few posterior sds
    out."""
    sim = simulate_irt("2pl", 100, 20, ability_dim=1, seed=7)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=7)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=1, num_warmup=400,
                        num_samples=400, num_leapfrog=16, num_chains=2,
                        init_mode="prior")
    out = hmc.run_hmc(ds.response, ds.train_mask, cfg)
    assert out["diagnostics"]["rhat_max"] < 1.2, out["diagnostics"]
    assert out["accept_rate"] > 0.4


def test_hmc_packed_potential_matches_dense():
    """The packed-kernel potential (one-pass Pallas loglik+grads) must agree
    with the dense XLA potential in value and gradient for every link — the
    TPU HMC path runs entirely on it."""
    import jax.numpy as jnp
    from vibo_tpu.ops.pallas_elbo import pack_responses

    for model, k in (("1pl", 1), ("2pl", 2), ("3pl", 1)):
        sim = simulate_irt(model, 48, 24, ability_dim=k, seed=1)
        ds = holdout_split(sim.response, sim.mask, 0.1, seed=1)
        cfg = hmc.HMCConfig(irt_model=model, ability_dim=k)
        resp = jnp.asarray(ds.response, jnp.float32)
        mask = jnp.asarray(ds.train_mask, jnp.float32)
        pk = jnp.asarray(pack_responses(np.asarray(resp), np.asarray(mask)))
        u_dense = hmc.make_potential(resp, mask, cfg)
        u_packed = hmc.make_potential(resp, mask, cfg, packed=pk)
        spec = hmc._flatten_spec(48, 24, cfg)
        key = jax.random.key(0)
        params = {n: 0.3 * jax.random.normal(jax.random.fold_in(key, i), s)
                  for i, (n, s) in enumerate(sorted(spec.items()))}
        vd, gd = jax.value_and_grad(u_dense)(params)
        vp, gp = jax.value_and_grad(u_packed)(params)
        assert abs(float(vd) - float(vp)) < 1e-2, model
        for name in gd:
            d = float(jnp.abs(gd[name] - gp[name]).max())
            assert d < 1e-3, (model, name, d)


@pytest.mark.slow
def test_hmc_runs_with_packed_kernel():
    """run_hmc with use_packed_kernel=True (interpret mode off-TPU) executes
    the full vmapped multi-chain scan and produces finite diagnostics."""
    sim = simulate_irt("2pl", 64, 16, ability_dim=1, seed=2)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=2)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=1, num_warmup=60,
                        num_samples=60, num_leapfrog=8, num_chains=2,
                        use_packed_kernel=True)
    out = hmc.run_hmc(ds.response, ds.train_mask, cfg)
    assert np.isfinite(out["accept_rate"])
    assert out["samples"]["theta"].shape == (120, 64, 1)
    assert np.isfinite(out["diagnostics"]["rhat_max"])


def test_hmc_referenced_potential_constant_shift():
    """ll_ref referencing shifts U by a constant and leaves gradients (and
    hence the sampled posterior) unchanged — it exists purely to keep the
    f32 energy reduction well-resolved at large N*M."""
    import jax.numpy as jnp

    sim = simulate_irt("2pl", 60, 20, ability_dim=1, seed=4)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=4)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=1)
    resp = jnp.asarray(ds.response, jnp.float32)
    mask = jnp.asarray(ds.train_mask, jnp.float32)
    spec = hmc._flatten_spec(60, 20, cfg)
    key = jax.random.key(1)
    p1 = {n: 0.3 * jax.random.normal(jax.random.fold_in(key, i), s)
          for i, (n, s) in enumerate(sorted(spec.items()))}
    p2 = {n: v + 0.1 for n, v in p1.items()}
    ref = {n: 0.2 * jax.random.normal(jax.random.fold_in(key, 9 + i), s)
           for i, (n, s) in enumerate(sorted(spec.items()))}
    ll_ref = hmc._make_loglik_per_person(resp, mask, cfg)(ref)
    u0 = hmc.make_potential(resp, mask, cfg)
    u1 = hmc.make_potential(resp, mask, cfg, ll_ref=ll_ref)
    # same constant shift at two different positions
    s1 = float(u0(p1) - u1(p1))
    s2 = float(u0(p2) - u1(p2))
    assert abs(s1 - s2) < 1e-3, (s1, s2)
    assert abs(s1 + float(ll_ref.sum())) < 1e-3
    g0 = jax.grad(u0)(p1)
    g1 = jax.grad(u1)(p1)
    for n in g0:
        assert float(jnp.abs(g0[n] - g1[n]).max()) < 1e-5


def test_hmc_ridge_move_deltas_match_potential():
    """The ridge moves' analytic accept ratios must equal the true potential
    difference: likelihood exactly invariant, prior deltas exact."""
    import jax.numpy as jnp

    sim = simulate_irt("2pl", 80, 16, ability_dim=2, seed=6)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=6)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=2)
    resp = jnp.asarray(ds.response, jnp.float32)
    mask = jnp.asarray(ds.train_mask, jnp.float32)
    u = hmc.make_potential(resp, mask, cfg)
    spec = hmc._flatten_spec(80, 16, cfg)
    key = jax.random.key(2)
    pos = {nm: 0.4 * jax.random.normal(jax.random.fold_in(key, i), s)
           for i, (nm, s) in enumerate(sorted(spec.items()))}
    n, m, kd = 80, 16, 1

    # scale move on dim kd
    s = 0.07
    moved = dict(pos)
    moved["theta"] = pos["theta"].at[:, kd].mul(np.exp(s))
    moved["a"] = pos["a"].at[:, kd].mul(np.exp(-s))
    st = float(jnp.square(pos["theta"][:, kd]).sum())
    sa = float(jnp.square(pos["a"][:, kd]).sum())
    analytic = -0.5 * ((np.exp(2 * s) - 1) * st + (np.exp(-2 * s) - 1) * sa)
    true_delta = float(u(pos) - u(moved))   # -(U' - U) = logr without jacobian
    assert abs(true_delta - analytic) < 1e-2, (true_delta, analytic)

    # location move on dim kd
    c = 0.11
    moved = dict(pos)
    moved["theta"] = pos["theta"].at[:, kd].add(c)
    moved["b"] = pos["b"] + c * pos["a"][:, kd]
    ak = pos["a"][:, kd]
    analytic = -0.5 * (2 * c * float(pos["theta"][:, kd].sum()) + n * c * c
                       + 2 * c * float((pos["b"] * ak).sum())
                       + c * c * float(jnp.square(ak).sum()))
    true_delta = float(u(pos) - u(moved))
    assert abs(true_delta - analytic) < 1e-2, (true_delta, analytic)


def test_hmc_rotation_alignment():
    """Per-draw Procrustes alignment must undo arbitrary per-draw O(K)
    rotations exactly (the K>1 posterior is uniform over rotations in raw
    coordinates, so unaligned chains cannot pass R-hat)."""
    rng = np.random.default_rng(0)
    C, S, N, M, K = 3, 40, 30, 12, 2
    theta0 = rng.standard_normal((N, K))
    a0 = rng.standard_normal((M, K))
    ths, As = np.zeros((C, S, N, K)), np.zeros((C, S, M, K))
    for c in range(C):
        # each chain sits near its OWN rotation mode (how unidentified
        # chains actually behave) and drifts slowly through rotation space
        qc, _ = np.linalg.qr(rng.standard_normal((K, K)))
        ang = rng.uniform(0, 0.1)
        for s in range(S):
            drift = np.array([[np.cos(ang * s), -np.sin(ang * s)],
                              [np.sin(ang * s), np.cos(ang * s)]])
            q = qc @ drift
            ths[c, s] = (theta0 + 0.05 * rng.standard_normal((N, K))) @ q
            As[c, s] = (a0 + 0.05 * rng.standard_normal((M, K))) @ q
    raw = {"theta": ths, "a": As, "b": np.zeros((C, S, M))}
    # unaligned: rotation scrambling makes chains disagree wildly
    assert np.nanmax(hmc.split_rhat(raw["a"])) > 1.5
    aligned = hmc._align_chain_signs(raw)
    assert np.nanmax(hmc.split_rhat(aligned["a"])) < 1.1
    assert np.nanmax(hmc.split_rhat(aligned["theta"])) < 1.1
    # aligned draws stay faithful to the truth up to one global rotation
    ref = aligned["a"].mean((0, 1))
    err = np.abs(evaluation.correlation(
        ref, a0, align_rotation=True)["pearson"])
    assert err > 0.99


def test_rotation_move_preserves_potential():
    """The O(K) rotation Gibbs move relies on EXACT posterior invariance:
    U(theta R, a R, b, ...) == U(theta, a, b, ...) for orthogonal R."""
    sim = simulate_irt("2pl", 50, 16, ability_dim=3, seed=11)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=3)
    u = hmc.make_potential(sim.response, sim.mask, cfg)
    rng = np.random.default_rng(3)
    params = {"theta": jax.numpy.asarray(rng.normal(size=(50, 3)), "float32"),
              "a": jax.numpy.asarray(rng.normal(size=(16, 3)), "float32"),
              "b": jax.numpy.asarray(rng.normal(size=(16,)), "float32")}
    g = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(g)
    rot = jax.numpy.asarray(q * np.sign(np.diag(r)), "float32")
    u0 = float(u(params))
    u1 = float(u({"theta": params["theta"] @ rot, "a": params["a"] @ rot,
                  "b": params["b"]}))
    assert abs(u0 - u1) < 1e-2 * abs(u0) * 1e-3 + 0.05


def test_chain_programs_potential_matches_make_potential():
    """The production whitened potential (what the sampler integrates) must
    equal make_potential composed with q = center + scale * x — value AND
    gradient (round-2 advisor: the two paths must not drift)."""
    import dataclasses as dc

    sim = simulate_irt("2pl", 40, 12, ability_dim=2, seed=7)
    cfg = hmc.HMCConfig(irt_model="2pl", ability_dim=2,
                        use_packed_kernel=False)
    progs = hmc._chain_programs(hmc._programs_key(cfg, False), 40, 12)
    rng = np.random.default_rng(0)
    spec = hmc._flatten_spec(40, 12, cfg)
    center = {k: jax.numpy.asarray(rng.normal(size=s) * 0.3, "float32")
              for k, s in spec.items()}
    scale = {k: jax.numpy.asarray(0.5 + rng.uniform(size=s), "float32")
             for k, s in spec.items()}
    x = {k: jax.numpy.asarray(rng.normal(size=s), "float32")
         for k, s in spec.items()}
    data = {"resp": jax.numpy.asarray(sim.response),
            "mask": jax.numpy.asarray(sim.mask),
            "center": center, "scale": scale,
            "ll_ref": jax.numpy.zeros((40,), "float32")}
    u_ref = hmc.make_potential(sim.response, sim.mask, cfg)

    def u_composed(x):
        q = jax.tree.map(lambda c, s, xx: c + s * xx, center, scale, x)
        return u_ref(q)

    v_prod, g_prod = progs.vg(x, data)
    v_ref, g_ref = jax.value_and_grad(u_composed)(x)
    np.testing.assert_allclose(float(v_prod), float(v_ref), rtol=1e-5)
    for k in spec:
        np.testing.assert_allclose(np.asarray(g_prod[k]),
                                   np.asarray(g_ref[k]), rtol=1e-4,
                                   atol=1e-4)


@pytest.mark.slow
def test_hmc_deep_link_gold_posterior():
    """irt_model='deep': sample (theta, d) under a trained deep decoder —
    runs, mixes on a tiny problem, and its posterior-predictive imputation
    beats the base rate (the cfg-5 deep gold-posterior path)."""
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.train import Trainer, TrainConfig

    sim = simulate_irt("2pl", 150, 24, ability_dim=1, seed=9)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=9)
    model = VIBO(VIBOConfig(num_items=24, irt_model="deep", ability_dim=1,
                            hidden_dim=32, item_latent_dim=4,
                            deep_hidden_dim=32, deep_item_chunk=0))
    res = Trainer(model, TrainConfig(lr=5e-3, epochs=150,
                                     eval_every=150)).fit(ds)
    dp = res["params"]["deep_link"]
    cfg = hmc.HMCConfig(irt_model="deep", ability_dim=1, num_warmup=150,
                        num_samples=150, num_chains=2, num_leapfrog=8,
                        use_packed_kernel=False, seed=1)
    out = hmc.run_hmc(ds.response, ds.train_mask, cfg, deep_params=dp)
    assert sorted(out["samples"]) == ["d", "theta"]
    assert 0.2 < out["accept_rate"] <= 1.0
    assert out["diagnostics"]["divergences"] == 0
    prob = hmc.posterior_mean_prob(out["samples"], "deep", deep_params=dp)
    pred = (prob > 0.5).astype(np.float32)
    h = ds.heldout_mask
    acc = float((h * (pred == ds.response)).sum() / h.sum())
    ones = float((h * ds.response).sum() / h.sum())
    base = max(ones, 1 - ones)
    assert acc > base - 0.02
