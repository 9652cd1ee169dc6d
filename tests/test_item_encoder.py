"""Amortized item-posterior encoder q(d_j | r_:,j): statistics, training
parity with the free-form posterior, new-item cold-start scoring, and the
packed/DP paths (paper section 4 inference networks; SURVEY.md section 3.3
"VIBO encoders ... free params and/or amortized from the item's response
column")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu import evaluation
from vibo_tpu.data import simulate_irt, holdout_split
from vibo_tpu.models import VIBO, VIBOConfig, networks
from vibo_tpu.train import Trainer, TrainConfig


def test_item_stats_person_permutation_invariant(rng):
    resp = (rng.random((40, 12)) < 0.6).astype(np.float32)
    mask = (rng.random((40, 12)) < 0.8).astype(np.float32)
    s1 = networks.item_stats(jnp.asarray(resp), jnp.asarray(mask))
    perm = rng.permutation(40)
    s2 = networks.item_stats(jnp.asarray(resp[perm]), jnp.asarray(mask[perm]))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    assert s1.shape == (12, networks.ITEM_STAT_DIM)


def test_item_stats_known_values():
    # 3 persons x 2 items, fully observed
    resp = jnp.asarray([[1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    mask = jnp.ones((3, 2))
    s = np.asarray(networks.item_stats(resp, mask))
    # p-values: item0 2/3, item1 1/3
    np.testing.assert_allclose(s[:, 0], [2 / 3, 1 / 3], atol=1e-6)
    # respondent mean raw scores: (0.5 + 1 + 0)/3 = 0.5 for both items
    np.testing.assert_allclose(s[:, 1], [0.5, 0.5], atol=1e-6)
    # observed fraction 1, log1p(count)=log(4)
    np.testing.assert_allclose(s[:, 4], [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(s[:, 5], np.log(4.0), atol=1e-6)


def test_item_stats_ignores_masked_cells(rng):
    resp = (rng.random((30, 8)) < 0.5).astype(np.float32)
    mask = (rng.random((30, 8)) < 0.7).astype(np.float32)
    # corrupting masked-out responses must not change any statistic
    corrupted = np.where(mask > 0, resp, 1.0 - resp)
    s1 = networks.item_stats(jnp.asarray(resp), jnp.asarray(mask))
    s2 = networks.item_stats(jnp.asarray(corrupted), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


@pytest.fixture(scope="module")
def amortized_2pl():
    sim = simulate_irt("2pl", 600, 64, ability_dim=1, seed=0)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0)
    model = VIBO(VIBOConfig(num_items=64, irt_model="2pl", ability_dim=1,
                            hidden_dim=64, item_encoder=True))
    cfg = TrainConfig(lr=8e-3, epochs=200, eval_every=200, log_every=200)
    res = Trainer(model, cfg).fit(ds, truth=sim)
    return sim, ds, model, res


def test_amortized_parity_with_free_form(amortized_2pl):
    """The amortized posterior must match free-form training within noise on
    synthetic 2PL (VERDICT round-1 'done' criterion)."""
    sim, ds, model, res = amortized_2pl
    ev = evaluation.imputation_accuracy(model, res["params"], ds)
    free_model = VIBO(VIBOConfig(num_items=64, irt_model="2pl", ability_dim=1,
                                 hidden_dim=64, item_encoder=False))
    free_res = Trainer(free_model, TrainConfig(lr=8e-3, epochs=200,
                                               eval_every=200, log_every=200)
                       ).fit(ds)
    free_ev = evaluation.imputation_accuracy(free_model, free_res["params"], ds)
    assert ev["acc"] > free_ev["acc"] - 0.03
    assert ev["acc"] > ev["base_rate"] + 0.03


def test_amortized_parameter_recovery(amortized_2pl):
    sim, ds, model, res = amortized_2pl
    theta_hat, items = evaluation.infer_posterior_means(model, res["params"], ds)
    assert evaluation.correlation(theta_hat, sim.theta)["pearson"] > 0.85
    assert evaluation.correlation(items["b"][:, 0], sim.b)["pearson"] > 0.7


def test_new_item_cold_start(amortized_2pl):
    """Items the model never trained on are scored from their response
    columns alone — the capability the free-form posterior cannot provide."""
    sim, ds, model, res = amortized_2pl
    from vibo_tpu.serve import AbilityScorer
    # fresh items answered by the same population
    new_sim = simulate_irt("2pl", 600, 32, ability_dim=1, seed=42)
    scorer = AbilityScorer(model, res["params"])
    out = scorer.score_items(new_sim.response, new_sim.mask)
    assert out["b_mu"].shape == (32, 1)
    assert (out["b_sigma"] > 0).all()
    corr = evaluation.correlation(out["b_mu"][:, 0], new_sim.b)["pearson"]
    assert corr > 0.7


def test_free_form_rejects_new_items():
    model = VIBO(VIBOConfig(num_items=8, irt_model="2pl", hidden_dim=16))
    params = model.init_params(jax.random.key(0))
    from vibo_tpu.serve import AbilityScorer
    with pytest.raises(ValueError, match="item_encoder"):
        AbilityScorer(model, params).score_items(np.zeros((4, 8)),
                                                 np.ones((4, 8)))
    # and an amortized model demands data for its posterior
    amod = VIBO(VIBOConfig(num_items=8, irt_model="2pl", hidden_dim=16,
                           item_encoder=True))
    aparams = amod.init_params(jax.random.key(0))
    with pytest.raises(ValueError, match="response"):
        amod.item_dist(aparams)


def test_amortized_packed_matches_dense():
    """elbo_packed == elbo on the same data with the amortized posterior."""
    from vibo_tpu.ops.pallas_elbo import pack_responses
    sim = simulate_irt("2pl", 96, 24, ability_dim=1, seed=3)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=3)
    model = VIBO(VIBOConfig(num_items=24, irt_model="2pl", hidden_dim=32,
                            item_encoder=True))
    params = model.init_params(jax.random.key(1))
    key = jax.random.key(2)
    b1, _ = model.elbo(params, key, jnp.asarray(ds.response),
                       jnp.asarray(ds.train_mask), 1.0, 2)
    packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    b2, _ = model.elbo_packed(params, key, packed, 1.0, 2)
    np.testing.assert_allclose(float(b1), float(b2), rtol=1e-5)


def test_amortized_iwae_bound(amortized_2pl):
    sim, ds, model, res = amortized_2pl
    out = evaluation.iwae_loglik(model, res["params"], jax.random.key(7), ds,
                                 num_samples=20, on="train")
    assert np.isfinite(out["loglik"])
    assert out["loglik_per_cell"] > np.log(0.5)
    # default (held-out) protocol runs and is below the train bound
    out_h = evaluation.iwae_loglik(model, res["params"], jax.random.key(7),
                                   ds, num_samples=20)
    assert np.isfinite(out_h["loglik"])
    assert out_h["loglik_per_cell"] < out["loglik_per_cell"]


@pytest.mark.slow
def test_amortized_dp_step_matches_unsharded(eight_devices):
    """The shard_map DP step with psum'd column statistics reproduces the
    unsharded update (device-count invariance of the amortized posterior)."""
    import optax
    from vibo_tpu.ops import objectives
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.parallel import make_mesh
    n, m = 64, 16
    sim = simulate_irt("2pl", n, m, ability_dim=1, seed=4)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=4)
    model = VIBO(VIBOConfig(num_items=m, irt_model="2pl", hidden_dim=32,
                            item_encoder=True))
    packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
    rowv = jnp.ones(n, jnp.float32)
    key0, key1 = jax.random.key(0), jax.random.key(7)

    mesh = make_mesh(eight_devices)
    tr = Trainer(model, TrainConfig(lr=1e-2), mesh=mesh)
    # SGD makes the update LINEAR in the gradient, so this asserts gradient
    # equality directly (Adam's sqrt(v)+eps denominator amplifies psum-vs-XLA
    # reduction-order float noise on the encoder's near-zero grads into
    # update-level mismatches).
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
    item_eps, theta_eps = model.sample_noise(p1, key1, n, 2)

    def loss_fn(p):
        ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps, theta_eps,
                                              rowv)
        return -objectives.elbo(ll, klt, kli, 0.8)

    g = jax.grad(loss_fn)(p1)
    upd, _ = tr1.optimizer.update(g, o1, p1)
    p_ref = optax.apply_updates(p1, upd)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=2e-3, atol=1e-5), p_dp, p_ref)


def test_amortized_new_item_eval():
    """Cold-start eval: items the model never trained on, scored from their
    response columns through the shared item encoder, beat the base rate."""
    import jax
    from vibo_tpu import evaluation
    from vibo_tpu.data import simulate_irt, holdout_split, split_items
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.train import Trainer, TrainConfig

    sim = simulate_irt("2pl", 1000, 64, ability_dim=1, seed=13)
    ds = holdout_split(sim.response, sim.mask, 0.15, seed=13)
    train_ds, test_ds = split_items(ds, test_frac=0.25, seed=13)
    assert train_ds.shape[1] + test_ds.shape[1] == 64
    model = VIBO(VIBOConfig(num_items=train_ds.shape[1], irt_model="2pl",
                            ability_dim=1, hidden_dim=64, item_encoder=True))
    res = Trainer(model, TrainConfig(epochs=400)).fit(train_ds)
    out = evaluation.amortized_new_item_eval(model, res["params"], train_ds,
                                             test_ds)
    assert out["num_new_items"] == test_ds.shape[1]
    assert out["acc"] > out["base_rate"] + 0.02, out
    # free-form posterior must refuse
    model2 = VIBO(VIBOConfig(num_items=train_ds.shape[1], irt_model="2pl",
                             ability_dim=1, hidden_dim=16))
    p2 = model2.init_params(jax.random.key(0))
    with pytest.raises(ValueError, match="item_encoder"):
        evaluation.amortized_new_item_eval(model2, p2, train_ds, test_ds)
