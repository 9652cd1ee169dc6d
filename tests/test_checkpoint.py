"""Checkpoint/resume: byte-exact round trip, structure-mismatch detection,
and exact-resume training equivalence (SURVEY.md section 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibo_tpu.data import simulate_irt, holdout_split
from vibo_tpu.models import VIBO, VIBOConfig
from vibo_tpu.train import Trainer, TrainConfig, save_checkpoint, load_checkpoint


def _setup():
    sim = simulate_irt("2pl", 64, 16, ability_dim=1, seed=0)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0)
    model = VIBO(VIBOConfig(num_items=16, irt_model="2pl", ability_dim=1,
                            hidden_dim=16))
    return ds, model


def test_roundtrip_exact(tmp_path):
    ds, model = _setup()
    tr = Trainer(model, TrainConfig(epochs=1))
    params, opt_state = tr.init_state(jax.random.key(0))
    key = jax.random.key(42)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, (params, opt_state), key, step=7, extra={"epoch": 3})
    template = tr.init_state(jax.random.key(1))
    (p2, o2), key2, step, extra = load_checkpoint(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert step == 7 and int(extra["epoch"]) == 3
    np.testing.assert_array_equal(jax.random.key_data(key), jax.random.key_data(key2))


def test_structure_mismatch_raises(tmp_path):
    ds, model = _setup()
    tr = Trainer(model, TrainConfig(epochs=1))
    state = tr.init_state(jax.random.key(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, jax.random.key(0), 0)
    other = VIBO(VIBOConfig(num_items=16, irt_model="2pl", ability_dim=1,
                            hidden_dim=32))
    bad_template = Trainer(other, TrainConfig(epochs=1)).init_state(jax.random.key(0))
    with pytest.raises(ValueError, match="structure mismatch"):
        load_checkpoint(path, bad_template)


def test_resume_is_exact(tmp_path):
    """Training 4 steps == training 2, checkpointing, resuming, training 2."""
    ds, model = _setup()
    tr = Trainer(model, TrainConfig(epochs=1))
    step_fn = tr.make_step(item_scale=1.0, num_samples=1)
    resp, mask = jnp.asarray(ds.response), jnp.asarray(ds.train_mask)

    def run(params, opt_state, key, steps):
        for _ in range(steps):
            key, k = jax.random.split(key)
            params, opt_state, _ = step_fn(params, opt_state, k, resp, mask)
        return params, opt_state, key

    p, o = tr.init_state(jax.random.key(0))
    p4, _, _ = run(p, o, jax.random.key(1), 4)

    p, o = tr.init_state(jax.random.key(0))
    p2, o2, key2 = run(p, o, jax.random.key(1), 2)
    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, (p2, o2), key2, step=2)
    template = tr.init_state(jax.random.key(5))
    (pr, orr), keyr, _, _ = load_checkpoint(path, template)
    pr4, _, _ = run(pr, orr, keyr, 2)

    for a, b in zip(jax.tree_util.tree_leaves(p4), jax.tree_util.tree_leaves(pr4)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_resume_continues_training(tmp_path):
    """fit(resume=ckpt) restores params/opt/PRNG and trains further —
    bitwise-equal to one uninterrupted run of the combined length."""
    import jax
    from vibo_tpu.data import simulate_irt, holdout_split
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.train import Trainer, TrainConfig, save_checkpoint

    sim = simulate_irt("2pl", 120, 24, ability_dim=1, seed=6)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=6)
    model = VIBO(VIBOConfig(num_items=24, irt_model="2pl", hidden_dim=16))
    kw = dict(lr=1e-2, eval_every=100, log_every=100, packed=False)

    # uninterrupted 20 epochs
    res_full = Trainer(model, TrainConfig(epochs=20, **kw)).fit(ds)

    # 10 epochs -> checkpoint -> resume 10 more
    tr1 = Trainer(model, TrainConfig(epochs=10, **kw))
    res1 = tr1.fit(ds)
    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, (res1["params"], res1["opt_state"]), res1["key"], 10)
    res2 = Trainer(model, TrainConfig(epochs=10, **kw)).fit(ds, resume=path)

    np.testing.assert_allclose(res2["final_elbo"], res_full["final_elbo"],
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6),
        res2["params"], res_full["params"])


def test_warm_start_transplant_is_function_preserving(tmp_path):
    """transplant_params embeds a trained mean-field/diag model into the
    conditional-stats + chol family with zero-filled appended slots, which
    must leave the computed function UNCHANGED at step 0: zero conditioning
    rows contribute zero first-layer modulation, zero off-diagonal head
    columns make chol bitwise-diagonal (the basin warm-start mechanism,
    TrainConfig.warm_start)."""
    from vibo_tpu.train import checkpoint as ckpt

    sim = simulate_irt("2pl", 96, 20, ability_dim=2, seed=11)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=11)
    kw = dict(num_items=20, irt_model="2pl", ability_dim=2, hidden_dim=16)
    src_model = VIBO(VIBOConfig(**kw, conditional_posterior=False))
    Trainer(src_model, TrainConfig(lr=1e-2, epochs=6, eval_every=3,
                                   log_every=100,
                                   out_dir=str(tmp_path))).fit(ds)
    src_params = ckpt.load_params_self_describing(str(tmp_path / "best.npz"))

    dst_model = VIBO(VIBOConfig(**kw, conditional_posterior=True,
                                condition_on="stats",
                                theta_posterior="chol"))
    tp = ckpt.transplant_params(src_params,
                                dst_model.init_params(jax.random.key(1)))

    resp = jnp.asarray(ds.response)
    mask = jnp.asarray(ds.train_mask)
    mu_s, lv_s, off_s = src_model.encode(src_params, resp, mask, None)
    item_mean = dst_model.item_posterior_mean(tp)
    mu_d, lv_d, off_d = dst_model.encode(tp, resp, mask, item_mean)
    assert off_s is None and off_d is not None
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv_d), np.asarray(lv_s), atol=1e-6)
    assert np.all(np.asarray(off_d) == 0.0)
    # item posteriors copied exactly
    src_items = src_model.item_posterior_mean(src_params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), item_mean, src_items)


def test_warm_start_rejects_scrambled_transplants(tmp_path):
    """check_transplant_compat (round-4 advisor): warm-starting across
    ability_dim (K=1 -> K=4 would corner-embed the source logvar column
    into the target mu block), narrowing chol -> diag, or crossing the
    'stats' encoder layout must raise BEFORE touching parameters; the
    documented widenings pass."""
    from vibo_tpu.train import checkpoint as ckpt

    src = dict(num_items=20, irt_model="2pl", ability_dim=1, hidden_dim=16,
               conditional_posterior=False, condition_on="sample",
               theta_posterior="diag", num_categories=2,
               item_latent_dim=16, deep_hidden_dim=128, item_encoder=False,
               item_encoder_hidden=64)
    ok_dst = VIBOConfig(num_items=20, irt_model="2pl", ability_dim=1,
                        hidden_dim=16, conditional_posterior=True,
                        condition_on="stats", theta_posterior="chol")
    ckpt.check_transplant_compat(src, ok_dst)   # documented widening: fine

    with pytest.raises(ValueError, match="ability_dim"):
        ckpt.check_transplant_compat(
            src, VIBOConfig(num_items=20, irt_model="2pl", ability_dim=4,
                            hidden_dim=16))
    with pytest.raises(ValueError, match="irt_model"):
        ckpt.check_transplant_compat(
            src, VIBOConfig(num_items=20, irt_model="3pl", ability_dim=1,
                            hidden_dim=16))
    chol_src = dict(src, theta_posterior="chol", ability_dim=2)
    with pytest.raises(ValueError, match="chol -> diag"):
        ckpt.check_transplant_compat(
            chol_src, VIBOConfig(num_items=20, irt_model="2pl",
                                 ability_dim=2, hidden_dim=16,
                                 theta_posterior="diag"))
    cond_src = dict(src, conditional_posterior=True, condition_on="stats")
    with pytest.raises(ValueError, match="condition_on"):
        ckpt.check_transplant_compat(
            cond_src, VIBOConfig(num_items=20, irt_model="2pl",
                                 ability_dim=1, hidden_dim=16,
                                 condition_on="sample"))
    # sample <-> mean share layout and semantics: allowed
    ckpt.check_transplant_compat(
        dict(src, conditional_posterior=True, condition_on="sample"),
        VIBOConfig(num_items=20, irt_model="2pl", ability_dim=1,
                   hidden_dim=16, condition_on="mean"))

    # end-to-end: the Trainer path raises through --warm-start
    sim = simulate_irt("2pl", 64, 20, ability_dim=1, seed=2)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=2)
    src_model = VIBO(VIBOConfig(num_items=20, irt_model="2pl",
                                ability_dim=1, hidden_dim=16))
    Trainer(src_model, TrainConfig(lr=1e-2, epochs=4, eval_every=4,
                                   log_every=100,
                                   out_dir=str(tmp_path))).fit(ds)
    wide = VIBO(VIBOConfig(num_items=20, irt_model="2pl", ability_dim=4,
                           hidden_dim=16))
    sim4 = simulate_irt("2pl", 64, 20, ability_dim=4, seed=2)
    ds4 = holdout_split(sim4.response, sim4.mask, 0.1, seed=2)
    with pytest.raises(ValueError, match="ability_dim"):
        Trainer(wide, TrainConfig(
            epochs=2, warm_start=str(tmp_path / "best.npz"))).fit(ds4)


def test_warm_start_cli_end_to_end(tmp_path):
    """train --warm-start CKPT: the wider-family run starts from the source
    basin and trains; warm_start + resume refuses."""
    from vibo_tpu.cli import main

    out1 = tmp_path / "mf"
    main(["train", "synthetic-2pl", "--num-persons", "96", "--num-items",
          "20", "--ability-dim", "2", "--hidden-dim", "16", "--epochs", "6",
          "--eval-every", "6", "--mean-field", "--out-dir", str(out1)])
    out2 = tmp_path / "warm"
    main(["train", "synthetic-2pl", "--num-persons", "96", "--num-items",
          "20", "--ability-dim", "2", "--hidden-dim", "16", "--epochs", "4",
          "--eval-every", "4", "--condition-on", "stats",
          "--theta-posterior", "chol",
          "--warm-start", str(out1 / "best.npz"), "--out-dir", str(out2)])
    assert (out2 / "best.npz").exists()

    model = VIBO(VIBOConfig(num_items=20, irt_model="2pl", ability_dim=2,
                            hidden_dim=16))
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(model, TrainConfig(
            epochs=2, warm_start=str(out1 / "best.npz"))).fit(
            holdout_split(simulate_irt("2pl", 96, 20, ability_dim=2,
                                       seed=3).response,
                          simulate_irt("2pl", 96, 20, ability_dim=2,
                                       seed=3).mask, 0.1, seed=3),
            resume=str(out1 / "best.npz"))
