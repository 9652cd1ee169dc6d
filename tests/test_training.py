"""Statistical integration tests (SURVEY.md section 5): synthetic recovery,
ELBO improvement, imputation beats base rate — the reference family's
de-facto integration test, made automatic."""

import numpy as np
import pytest

from vibo_tpu import evaluation
from vibo_tpu.data import simulate_irt, holdout_split
from vibo_tpu.models import VIBO, VIBOConfig
from vibo_tpu.train import Trainer, TrainConfig


@pytest.fixture(scope="module")
def trained_1pl():
    sim = simulate_irt("1pl", 600, 64, ability_dim=1, seed=0)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0)
    model = VIBO(VIBOConfig(num_items=64, irt_model="1pl", ability_dim=1,
                            hidden_dim=64))
    cfg = TrainConfig(lr=8e-3, epochs=150, eval_every=150, log_every=150)
    res = Trainer(model, cfg).fit(ds, truth=sim)
    return sim, ds, model, res


def test_elbo_improves(trained_1pl):
    sim, ds, model, res = trained_1pl
    evs = [h for h in res["history"] if h["event"] == "train"]
    assert evs[-1]["elbo"] > -1e9
    # compare against the untrained model's ELBO
    import jax, jax.numpy as jnp
    params0 = model.init_params(jax.random.key(99))
    b0, _ = model.elbo(params0, jax.random.key(1), jnp.asarray(ds.response),
                       jnp.asarray(ds.train_mask), 1.0, 1)
    assert evs[-1]["elbo"] > float(b0) + 100.0


def test_parameter_recovery_1pl(trained_1pl):
    sim, ds, model, res = trained_1pl
    theta_hat, items = evaluation.infer_posterior_means(model, res["params"], ds)
    assert evaluation.correlation(theta_hat, sim.theta)["pearson"] > 0.85
    assert evaluation.correlation(items["b"][:, 0], sim.b)["pearson"] > 0.85


def test_imputation_beats_base_rate(trained_1pl):
    sim, ds, model, res = trained_1pl
    ev = evaluation.imputation_accuracy(model, res["params"], ds)
    assert ev["acc"] > ev["base_rate"] + 0.03
    assert ev["acc"] > 0.6


def test_minibatch_training_runs():
    sim = simulate_irt("2pl", 200, 32, ability_dim=2, seed=3)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=3)
    model = VIBO(VIBOConfig(num_items=32, irt_model="2pl", ability_dim=2,
                            hidden_dim=32))
    cfg = TrainConfig(lr=5e-3, epochs=8, batch_size=64, eval_every=8, log_every=8)
    res = Trainer(model, cfg).fit(ds)
    assert np.isfinite(res["final_elbo"])


def test_iwae_eval_runs(trained_1pl):
    sim, ds, model, res = trained_1pl
    import jax
    # default protocol: held-out (test) log-likelihood
    out = evaluation.iwae_loglik(model, res["params"], jax.random.key(7), ds,
                                 num_samples=20)
    assert np.isfinite(out["loglik"])
    assert out["loglik_per_cell"] < 0
    assert out["num_cells"] == int(ds.heldout_mask.sum())
    # on train-visible cells a trained model beats coin-flip log-lik
    # (log 0.5); the held-out JOINT bound also carries the theta posterior
    # terms spread over ~10x fewer cells, so its per-cell line is lower
    out_tr = evaluation.iwae_loglik(model, res["params"], jax.random.key(7),
                                    ds, num_samples=20, on="train")
    assert out_tr["loglik_per_cell"] > np.log(0.5)
    assert out["loglik_per_cell"] < out_tr["loglik_per_cell"]


@pytest.mark.slow
def test_fused_fit_matches_stepwise():
    """fuse_epochs=True (lax.scan chunks) must reproduce the per-epoch path
    exactly: same PRNG split order, same updates, same final ELBO."""
    sim = simulate_irt("2pl", 200, 48, ability_dim=2, seed=3)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=3)
    model = VIBO(VIBOConfig(num_items=48, irt_model="2pl", ability_dim=2,
                            hidden_dim=32))
    kw = dict(lr=5e-3, epochs=30, eval_every=10, log_every=10, packed=False)
    res_fused = Trainer(model, TrainConfig(**kw, fuse_epochs=True)).fit(ds)
    res_step = Trainer(model, TrainConfig(**kw, fuse_epochs=False)).fit(ds)
    np.testing.assert_allclose(res_fused["final_elbo"], res_step["final_elbo"],
                               rtol=1e-5)
    accs_f = [h["acc"] for h in res_fused["history"] if h["event"] == "eval"]
    accs_s = [h["acc"] for h in res_step["history"] if h["event"] == "eval"]
    np.testing.assert_allclose(accs_f, accs_s, atol=1e-6)


def test_fused_fit_packed_auto_and_remainder():
    """Auto-packed fused fit with a chunk remainder (epochs not divisible by
    gcd(log_every, eval_every)) still hits every boundary and finishes."""
    sim = simulate_irt("1pl", 150, 40, ability_dim=1, seed=4)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=4)
    model = VIBO(VIBOConfig(num_items=40, irt_model="1pl", ability_dim=1,
                            hidden_dim=32))
    res = Trainer(model, TrainConfig(lr=8e-3, epochs=47, eval_every=20,
                                     log_every=10)).fit(ds)
    assert np.isfinite(res["final_elbo"])
    evals = [h for h in res["history"] if h["event"] == "eval"]
    assert [e["epoch"] for e in evals] == [19, 39, 46]


def test_packed_requires_full_batch():
    sim = simulate_irt("2pl", 64, 16, ability_dim=1, seed=0)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0)
    model = VIBO(VIBOConfig(num_items=16, irt_model="2pl", hidden_dim=16))
    with pytest.raises(ValueError, match="full-batch"):
        Trainer(model, TrainConfig(batch_size=16, packed=True)).fit(ds)


def test_iwae_loglik_block_size_consistent():
    """The shared item terms must be counted once regardless of blocking."""
    import jax
    from vibo_tpu import evaluation
    sim = simulate_irt("2pl", 256, 32, ability_dim=1, seed=1)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=1)
    model = VIBO(VIBOConfig(num_items=32, irt_model="2pl", hidden_dim=32))
    params = model.init_params(jax.random.key(0))
    one = evaluation.iwae_loglik(model, params, jax.random.key(5), ds,
                                 num_samples=200, block_size=256)
    four = evaluation.iwae_loglik(model, params, jax.random.key(5), ds,
                                  num_samples=200, block_size=64)
    # different block keys -> MC noise only; the old bug added the full item
    # ratio (~hundreds of nats) once per extra block
    assert abs(one["loglik"] - four["loglik"]) < 0.02 * abs(one["loglik"])


def test_blocked_evals_ragged_n_matches_single_block():
    """When N isn't a block multiple the evaluators pad the bit-code so every
    block shares one compiled shape (evaluation._blocked_code); the padded
    rows decode to all-zero masks and must leave every number unchanged."""
    import jax
    from vibo_tpu import evaluation
    sim = simulate_irt("2pl", 130, 24, ability_dim=2, seed=6)
    ds = holdout_split(sim.response, sim.mask, 0.12, seed=6)
    model = VIBO(VIBOConfig(num_items=24, irt_model="2pl", ability_dim=2,
                            hidden_dim=16))
    params = model.init_params(jax.random.key(1))

    one = evaluation.imputation_accuracy(model, params, ds, block_size=1024)
    rag = evaluation.imputation_accuracy(model, params, ds, block_size=64)
    assert one == rag

    c1 = evaluation.calibration(model, params, ds, block_size=1024)
    cr = evaluation.calibration(model, params, ds, block_size=64)
    assert c1["num_heldout"] == cr["num_heldout"]
    np.testing.assert_allclose(cr["ece"], c1["ece"], atol=1e-6)
    np.testing.assert_allclose(cr["brier"], c1["brier"], atol=1e-6)

    t1, _ = evaluation.infer_posterior_means(model, params, ds,
                                             block_size=1024)
    tr, _ = evaluation.infer_posterior_means(model, params, ds, block_size=64)
    assert t1.shape == tr.shape == (130, 2)
    np.testing.assert_allclose(tr, t1, atol=1e-5)

    iw1 = evaluation.iwae_loglik(model, params, jax.random.key(3), ds,
                                 num_samples=200, block_size=1024)
    iwr = evaluation.iwae_loglik(model, params, jax.random.key(3), ds,
                                 num_samples=200, block_size=64)
    assert iw1["num_cells"] == iwr["num_cells"]
    # blocks draw different keys and share item samples across fewer persons,
    # so the bound shifts by MC/tightness noise (measured ~3% here with
    # untrained params; an unpadded 2-block split drifts comparably). A
    # padding bug is two orders larger: counting item terms by PADDED rows
    # drifts the bound by O(item ratio) ~ hundreds of nats.
    assert abs(iw1["loglik"] - iwr["loglik"]) < 0.05 * abs(iw1["loglik"])


def test_iwae_loglik_padding_invariant():
    """All-missing padding rows (pad_to_multiple) must not shift the reported
    test log-lik: their theta prior/posterior factor marginalizes to exactly 1
    (round-1 advisor finding: lp/lq were summed over padding rows)."""
    import jax
    from vibo_tpu.data.masking import pad_to_multiple
    sim = simulate_irt("2pl", 50, 24, ability_dim=1, seed=2)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=2)
    padded = pad_to_multiple(ds, person_multiple=64, item_multiple=1)
    assert padded.response.shape[0] == 64
    model = VIBO(VIBOConfig(num_items=24, irt_model="2pl", hidden_dim=32))
    params = model.init_params(jax.random.key(0))
    for on in ("train", "heldout"):
        a = evaluation.iwae_loglik(model, params, jax.random.key(5), ds,
                                   num_samples=64, on=on)
        b = evaluation.iwae_loglik(model, params, jax.random.key(5), padded,
                                   num_samples=64, on=on)
        assert a["num_cells"] == b["num_cells"]
        np.testing.assert_allclose(a["loglik"], b["loglik"], rtol=1e-5)


@pytest.mark.slow
def test_iwae_training_objective():
    """objective='iwae' trains: bound improves, imputation beats base rate,
    and the packed fused-kernel path matches the dense path's semantics."""
    import jax
    sim = simulate_irt("2pl", 300, 48, ability_dim=1, seed=2)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=2)
    model = VIBO(VIBOConfig(num_items=48, irt_model="2pl", hidden_dim=32))
    cfg = TrainConfig(lr=8e-3, epochs=120, eval_every=60, log_every=60,
                      objective="iwae", num_mc_samples=5)
    res = Trainer(model, cfg).fit(ds)
    assert np.isfinite(res["final_elbo"])
    first = [h for h in res["history"] if h["event"] == "train"][0]["elbo"]
    assert res["final_elbo"] > first
    ev = [h for h in res["history"] if h["event"] == "eval"][-1]
    assert ev["acc"] > ev["base_rate"]

    # packed iwae == dense iwae on the same params/key
    from vibo_tpu.ops.pallas_elbo import pack_responses
    import jax.numpy as jnp
    packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    b1 = model.iwae(res["params"], jax.random.key(9),
                    jnp.asarray(ds.response), jnp.asarray(ds.train_mask),
                    num_samples=7, item_scale=1.0)
    b2 = model.iwae_packed(res["params"], jax.random.key(9), packed,
                           item_scale=1.0, num_samples=7)
    np.testing.assert_allclose(float(b2), float(b1), rtol=1e-5)


def test_bad_objective_rejected():
    model = VIBO(VIBOConfig(num_items=8, hidden_dim=16))
    with pytest.raises(ValueError, match="objective"):
        Trainer(model, TrainConfig(objective="elbow"))


def test_restarts_selects_best_final_bound(tmp_path):
    """cfg.restarts runs independent fits and returns the best FINAL training
    bound, promotes the winner's checkpoints to out_dir's root, and reports a
    per-restart summary (TrainConfig.restarts: K>1 basin selection)."""
    import os
    sim = simulate_irt("2pl", 200, 32, ability_dim=2, seed=0)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0)
    model = VIBO(VIBOConfig(num_items=32, irt_model="2pl", ability_dim=2,
                            hidden_dim=32))
    out = str(tmp_path / "run")
    cfg = TrainConfig(lr=8e-3, epochs=40, eval_every=20, log_every=40,
                      restarts=3, out_dir=out)
    res = Trainer(model, cfg).fit(ds)
    assert len(res["restarts"]) == 3
    elbos = [r["final_elbo"] for r in res["restarts"]]
    assert res["final_elbo"] == max(elbos)
    assert res["selected_restart"] == int(np.argmax(elbos))
    # seeds differ per restart -> the fits genuinely differ
    assert len({round(e, 3) for e in elbos}) > 1
    # winner's checkpoints promoted next to the per-restart dirs
    assert os.path.exists(os.path.join(out, "best.npz"))
    assert os.path.exists(
        os.path.join(out, f"restart{res['selected_restart']}", "best.npz"))
    # the promoted checkpoint IS the winner's (bitwise)
    with open(os.path.join(out, "best.npz"), "rb") as a, open(
            os.path.join(out, f"restart{res['selected_restart']}",
                         "best.npz"), "rb") as b:
        assert a.read() == b.read()


def test_restarts_rejects_resume_and_bad_count():
    model = VIBO(VIBOConfig(num_items=8, irt_model="1pl", ability_dim=1,
                            hidden_dim=16))
    with pytest.raises(ValueError, match="restarts"):
        Trainer(model, TrainConfig(restarts=0))
    sim = simulate_irt("1pl", 40, 8, ability_dim=1, seed=0)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0)
    with pytest.raises(ValueError, match="resume"):
        Trainer(model, TrainConfig(epochs=1, restarts=2)).fit(
            ds, resume="/nonexistent.npz")
