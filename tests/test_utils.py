"""Utils tests: meters, JSONL metrics, timers, profiling helpers."""

import json

import numpy as np
import pytest

from vibo_tpu.utils.metrics import AverageMeter, MetricsLogger, Timer
from vibo_tpu.utils import prof


def test_average_meter():
    m = AverageMeter()
    assert m.avg == 0.0
    m.update(2.0)
    m.update(4.0, n=3)
    np.testing.assert_allclose(m.avg, (2 + 12) / 4)
    m.reset()
    assert m.count == 0


def test_metrics_logger_jsonl(tmp_path, capsys):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(str(path))
    log.log(event="train", epoch=1, elbo=-12.345678)
    log.log(event="eval", acc=0.91)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "train" and "time" in lines[0]
    assert lines[1]["acc"] == 0.91
    out = capsys.readouterr().out
    assert "elbo=-12.3457" in out


def test_timer_and_throughput():
    with Timer() as t:
        x = sum(range(1000))
    assert t.elapsed >= 0
    rep = prof.throughput_report(1_000_000, 0.5)
    np.testing.assert_allclose(rep["response_cells_per_sec"], 2e6)


def test_device_timer_forces():
    import jax.numpy as jnp
    box = {}
    with prof.device_timer(box) as b:
        y = jnp.ones((8, 8)).sum()
        b["force"](y)
    assert box["forced"] and box["seconds"] > 0


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Sets the persistent-cache config; env kill-switch disables it.

    Saves/restores the suite's own cache settings (conftest points the whole
    run at /tmp/vibo-test-jaxcache-*) so this test can't redirect later
    tests' compiles."""
    import jax
    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    saved = {k: getattr(jax.config, k) for k in keys}
    try:
        monkeypatch.delenv("VIBO_NO_COMPCACHE", raising=False)
        d = prof.enable_compilation_cache(str(tmp_path / "cc"))
        assert d == str(tmp_path / "cc")
        assert jax.config.jax_compilation_cache_dir == d
        assert (tmp_path / "cc").is_dir()
        monkeypatch.setenv("VIBO_NO_COMPCACHE", "1")
        assert prof.enable_compilation_cache(str(tmp_path / "cc2")) is None
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)


@pytest.mark.slow  # the user-facing --profile path stays fast (test_cli)
def test_profiler_trace(tmp_path):
    import jax.numpy as jnp
    with prof.trace(str(tmp_path)):
        jnp.ones((16, 16)).sum().block_until_ready()
    # a trace directory should have been produced
    import os
    found = any("plugins" in r or f for r, d, f in os.walk(tmp_path))
    assert found


def test_peak_hbm_bytes_defensive():
    """Returns an int byte count when the backend exposes memory_stats and
    None when it doesn't (CPU) — never raises."""
    out = prof.peak_hbm_bytes()
    assert out is None or (isinstance(out, int) and out >= 0)


def test_procrustes_aligned_correlation():
    """K>1 ability is identified only up to rotation: a randomly rotated
    copy of the truth must correlate ~1.0 after Procrustes alignment."""
    from vibo_tpu import evaluation
    rng = np.random.default_rng(0)
    truth = rng.standard_normal((500, 3))
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    rotated = truth @ q + 0.01 * rng.standard_normal((500, 3))
    raw = evaluation.correlation(rotated, truth)["pearson"]
    aligned = evaluation.correlation(rotated, truth,
                                     align_rotation=True)["pearson"]
    assert aligned > 0.999
    assert aligned > raw


def test_correlation_collapsed_dim_is_zero_not_nan():
    """A constant (collapsed) posterior dim must contribute 0 correlation,
    not a NaN that poisons the across-dim mean (seen with a collapsed K=4
    IWAE posterior at the flagship config)."""
    from vibo_tpu import evaluation
    rng = np.random.default_rng(1)
    truth = rng.standard_normal((200, 2))
    inferred = truth.copy()
    inferred[:, 1] = 3.14  # collapsed dim
    out = evaluation.correlation(inferred, truth)
    assert np.isfinite(out["pearson"]) and np.isfinite(out["spearman"])
    assert abs(out["pearson"] - 0.5) < 0.05  # dim0 ~1.0, dim1 == 0

    # NEAR-constant (std ~1e-9) dims slip past the exact-zero std guard and
    # NaN inside pearsonr via cancellation (seen with an undertrained deep
    # encoder's theta on linear data, round 4) — same contract: count as 0
    inferred[:, 1] = 3.14 + 1e-9 * rng.standard_normal(200)
    out = evaluation.correlation(inferred, truth)
    assert np.isfinite(out["pearson"]) and np.isfinite(out["spearman"])
    assert abs(out["pearson"] - 0.5) < 0.05


def test_correlation_spearman_sign_alignment():
    """A dim with near-zero Pearson but strongly negative Spearman must not
    report a misleading negative Spearman under align_sign (round-1 advisor
    finding: the flip was decided from Pearson alone)."""
    from vibo_tpu import evaluation
    n = 40
    truth = np.arange(n, dtype=np.float64)
    inferred = -truth.copy()
    inferred[-1] = 1e4  # one outlier drags Pearson to ~0 positive
    import scipy.stats
    assert scipy.stats.pearsonr(inferred, truth).statistic > 0
    assert scipy.stats.spearmanr(inferred, truth).statistic < -0.5
    out = evaluation.correlation(inferred, truth, align_sign=True)
    assert out["spearman"] > 0.5
    # and the two statistics carry ONE consistent sign convention
    assert out["pearson"] < 0


def test_calibration_from_probs():
    """ECE ~ 0 for probabilities that match empirical frequencies; large for
    overconfident ones; Brier = mean squared error on held-out cells."""
    from vibo_tpu import evaluation
    rng = np.random.default_rng(3)
    prob = rng.uniform(0.02, 0.98, size=(400, 50))
    resp = (rng.uniform(size=prob.shape) < prob).astype(np.float32)
    h = (rng.uniform(size=prob.shape) < 0.5).astype(np.float32)
    cal = evaluation.calibration_from_probs(prob, resp, h)
    assert cal["ece"] < 0.03, cal["ece"]       # well calibrated by design
    assert cal["num_heldout"] == int(h.sum())
    # sharpened (overconfident) probabilities miscalibrate
    sharp = np.clip(0.5 + 4.0 * (prob - 0.5), 0.001, 0.999)
    cal2 = evaluation.calibration_from_probs(sharp, resp, h)
    assert cal2["ece"] > 0.1, cal2["ece"]
    assert cal2["brier"] > cal["brier"]
    # brier check against direct computation
    direct = float((h * (prob - resp) ** 2).sum() / h.sum())
    assert abs(cal["brier"] - direct) < 1e-9


def test_calibration_model_path_matches_probs_path():
    """The blocked on-device VIBO calibration must agree with the numpy
    reference computation on the same probabilities."""
    import jax
    from vibo_tpu import evaluation
    from vibo_tpu.data import simulate_irt, holdout_split
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.train import Trainer, TrainConfig

    sim = simulate_irt("2pl", 80, 24, ability_dim=1, seed=5)
    ds = holdout_split(sim.response, sim.mask, 0.15, seed=5)
    model = VIBO(VIBOConfig(num_items=24, irt_model="2pl", ability_dim=1,
                            hidden_dim=32))
    res = Trainer(model, TrainConfig(epochs=30)).fit(ds)
    cal = evaluation.calibration(model, res["params"], ds, block_size=32)
    item_mean = evaluation.full_item_mean(model, res["params"], ds)
    import jax.numpy as jnp
    prob = np.asarray(model.impute_prob_with_items(
        res["params"], jnp.asarray(ds.response), jnp.asarray(ds.train_mask),
        item_mean))
    ref = evaluation.calibration_from_probs(prob, ds.response,
                                            ds.heldout_mask)
    assert abs(cal["ece"] - ref["ece"]) < 5e-3, (cal["ece"], ref["ece"])
    assert abs(cal["brier"] - ref["brier"]) < 5e-3
    assert cal["num_heldout"] == ref["num_heldout"]


def test_multiple_correlation():
    from vibo_tpu import evaluation
    rng = np.random.default_rng(1)
    X = rng.standard_normal((500, 2))
    # y is a noisy linear combination of X's columns: R should be high and
    # exceed the correlation with either single column
    y = 0.8 * X[:, 0] - 0.5 * X[:, 1] + 0.3 * rng.standard_normal(500)
    r = evaluation.multiple_correlation(y, X)
    assert r > 0.9
    single = abs(np.corrcoef(y, X[:, 0])[0, 1])
    assert r > single
    # independent y: R near zero
    z = rng.standard_normal(500)
    assert evaluation.multiple_correlation(z, X) < 0.15


def test_rotate_diag_sigma_recovers_frame():
    """Posterior sds are frame-dependent at K>1: build a 'method B' whose
    latents are a rotated copy of method A's, and check that transporting
    A's diagonal sds through the Procrustes rotation of the MEANS recovers
    B's per-dim sds (raw per-dim correlation is near-meaningless)."""
    from vibo_tpu import evaluation
    rng = np.random.default_rng(3)
    n, k = 400, 4
    mu_a = rng.standard_normal((n, k))
    sd_a = 0.1 + rng.random((n, k))
    q, _ = np.linalg.qr(rng.standard_normal((k, k)))
    mu_b = mu_a @ q
    # B's diagonal sds: diag of q^T diag(sd_a^2) q per person
    sd_b = np.sqrt((sd_a ** 2) @ (q ** 2))
    w = evaluation.procrustes_rotation(mu_a, mu_b)
    sd_rot = evaluation.rotate_diag_sigma(sd_a, w)
    raw = evaluation.correlation(sd_a, sd_b)["pearson"]
    rot = evaluation.correlation(sd_rot, sd_b)["pearson"]
    assert rot > 0.999
    assert rot > raw + 0.05


def test_rotate_tril_sigma_recovers_frame():
    """Full-covariance counterpart of test_rotate_diag_sigma_recovers_frame:
    transporting the Cholesky FACTOR through the Procrustes rotation of the
    means recovers the rotated frame's marginal sds EXACTLY (the diagonal
    transport is only exact when the covariance is diagonal)."""
    from vibo_tpu import evaluation
    from vibo_tpu.ops import distributions as dist
    rng = np.random.default_rng(7)
    n, k = 300, 3
    mu_a = rng.standard_normal((n, k))
    logvar = 0.3 * rng.standard_normal((n, k))
    off = rng.standard_normal((n, dist.tril_dim(k)))
    L = np.asarray(dist.tril_matrix(np.asarray(logvar, np.float32),
                                    np.asarray(off, np.float32)))
    q, _ = np.linalg.qr(rng.standard_normal((k, k)))
    mu_b = mu_a @ q
    # B's marginal sds: sqrt(diag(q^T L L^T q)) per person
    a = np.einsum("kd,nkj->ndj", q, L.astype(np.float64))
    sd_b = np.sqrt((a ** 2).sum(-1))
    w = evaluation.procrustes_rotation(mu_a, mu_b)
    got = evaluation.rotate_tril_sigma(L, w)
    assert evaluation.correlation(got, sd_b)["pearson"] > 0.9999
    # the diagonal-only transport of the SAME posterior is strictly worse
    sd_diag = np.sqrt(np.einsum("nij,nij->ni", L, L))
    partial = evaluation.correlation(
        evaluation.rotate_diag_sigma(sd_diag, w), sd_b)["pearson"]
    assert evaluation.correlation(got, sd_b)["pearson"] > partial


def test_laplace_theta_sigma_matches_autodiff_hessian():
    """For the canonical-link 2PL Bernoulli, the observed Hessian of the
    masked log-posterior at theta IS the expected Fisher information, so
    laplace_theta_sigma must equal inv(autodiff Hessian) exactly."""
    import jax
    import jax.numpy as jnp
    from vibo_tpu import evaluation

    rng = np.random.default_rng(5)
    n, m, k = 7, 12, 3
    a = rng.standard_normal((m, k))
    b = rng.standard_normal(m)
    theta = rng.standard_normal((n, k))
    mask = (rng.random((n, m)) < 0.8).astype(np.float64)
    items = {"a": a, "b": b}

    sds, tril = evaluation.laplace_sigma_from_items(
        items, "2pl", mask, theta, return_factor=True)

    aj, bj = jnp.asarray(a), jnp.asarray(b)
    for i in range(n):
        mi = jnp.asarray(mask[i])

        def neg_logpost(t):
            # the Hessian of -sum_j m_ij log p(r_j|t) is r-independent for
            # the canonical link: H[sum m log(1+e^eta)] = sum m p(1-p) a a^T;
            # the N(0, I) prior adds I_K
            eta = aj @ t - bj
            return (mi * jnp.log1p(jnp.exp(eta))).sum() + 0.5 * (t ** 2).sum()

        # Hessian of sum m*log(1+e^eta) wrt t == sum m p(1-p) a a^T exactly
        h = jax.hessian(neg_logpost)(jnp.asarray(theta[i]))
        cov = np.linalg.inv(np.asarray(h))
        np.testing.assert_allclose(sds[i], np.sqrt(np.diag(cov)), rtol=1e-6)
        np.testing.assert_allclose(tril[i] @ tril[i].T, cov, rtol=1e-5,
                                   atol=1e-8)


def test_laplace_3pl_reduces_to_2pl_at_zero_guess():
    """The 3PL Fisher weight ((1-g)s(1-s))^2 / (p(1-p)) at g -> 0 equals the
    2PL weight p(1-p)."""
    from vibo_tpu import evaluation

    rng = np.random.default_rng(6)
    n, m, k = 5, 10, 2
    items = {"a": rng.standard_normal((m, k)), "b": rng.standard_normal(m)}
    theta = rng.standard_normal((n, k))
    mask = np.ones((n, m))
    sd2 = evaluation.laplace_sigma_from_items(items, "2pl", mask, theta)
    items3 = dict(items, g_hat=np.full(m, -30.0))
    sd3 = evaluation.laplace_sigma_from_items(items3, "3pl", mask, theta)
    np.testing.assert_allclose(sd3, sd2, rtol=1e-6)


def test_scorer_laplace_sigma_serves():
    """serve.AbilityScorer.laplace_sigma: finite, positive, below the prior
    sd of 1 for observed students."""
    from vibo_tpu.data import simulate_irt, holdout_split
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.serve import AbilityScorer
    from vibo_tpu.train import Trainer, TrainConfig

    sim = simulate_irt("2pl", 80, 24, ability_dim=2, seed=7)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=7)
    model = VIBO(VIBOConfig(num_items=24, irt_model="2pl", ability_dim=2,
                            hidden_dim=16))
    res = Trainer(model, TrainConfig(epochs=8, eval_every=8)).fit(ds)
    sc = AbilityScorer(model, res["params"], pad_multiple=16)
    sds = sc.laplace_sigma(ds.response, ds.train_mask)
    assert sds.shape == (80, 2)
    assert np.all(np.isfinite(sds)) and np.all(sds > 0) and np.all(sds < 1.0)


def test_laplace_deep_reduces_to_linear_closed_form():
    """A deep decoder rigged into its ReLU-linear region computing
    eta_ij = sum_k theta_ik - d_j (a 1PL link with b_j = d_j) must give
    EXACTLY the linear closed form: the Gauss-Newton information with the
    autodiff link Jacobian is the Fisher information, and for a linear eta
    the Jacobian is the constant item loading."""
    import jax.numpy as jnp
    from vibo_tpu import evaluation

    rng = np.random.default_rng(11)
    n, m, k, big = 9, 14, 3, 50.0
    theta = rng.standard_normal((n, k)).astype(np.float32)
    d = rng.standard_normal((m, 1)).astype(np.float32)
    mask = (rng.random((n, m)) < 0.8).astype(np.float32)
    h = 2
    dp = {
        "w_theta": jnp.asarray(np.stack([np.ones(k), np.zeros(k)], 1)),
        "w_item": jnp.asarray([[0.0, 1.0]]),
        "b1": jnp.full((h,), big),
        "layer2": {"w": jnp.eye(h), "b": jnp.full((h,), big)},
        "out": {"w": jnp.asarray([[1.0], [-1.0]]), "b": jnp.zeros((1,))},
    }
    sds, tril = evaluation.laplace_sigma_deep(dp, d, mask, theta,
                                              return_factor=True)
    items = {"b": d[:, 0]}
    ref_sds, ref_tril = evaluation.laplace_sigma_from_items(
        items, "1pl", mask, theta, return_factor=True)
    np.testing.assert_allclose(sds, ref_sds, rtol=2e-5)
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", tril, tril),
        np.einsum("nij,nkj->nik", ref_tril, ref_tril), rtol=2e-5, atol=1e-7)


def test_laplace_deep_matches_naive_autodiff_ggn():
    """laplace_sigma_deep's batched one-hot-JVP assembly equals a naive
    per-person GGN built from jax.jacrev of that person's logits, for a
    generic random deep decoder; blocked == unblocked."""
    import jax
    import jax.numpy as jnp
    from vibo_tpu import evaluation
    from vibo_tpu.models import networks

    rng = np.random.default_rng(12)
    n, m, k, latent = 7, 10, 2, 3
    dp = networks.init_deep_link(jax.random.key(3), k, latent, 8)
    theta = rng.standard_normal((n, k)).astype(np.float32)
    d = rng.standard_normal((m, latent)).astype(np.float32)
    mask = (rng.random((n, m)) < 0.85).astype(np.float32)

    sds, tril = evaluation.laplace_sigma_deep(dp, d, mask, theta,
                                              return_factor=True)
    d_j = jnp.asarray(d)
    for i in range(n):
        def eta_i(t):
            return networks.apply_deep_link(dp, t[None], d_j)[0]

        jac = np.asarray(jax.jacrev(eta_i)(jnp.asarray(theta[i])),
                         np.float64)                        # (M, K)
        p = 1.0 / (1.0 + np.exp(-np.asarray(eta_i(jnp.asarray(theta[i])),
                                            np.float64)))
        w = mask[i].astype(np.float64) * p * (1.0 - p)
        info = np.eye(k) + (jac * w[:, None]).T @ jac
        cov = np.linalg.inv(info)
        np.testing.assert_allclose(sds[i], np.sqrt(np.diag(cov)), rtol=1e-4)
        np.testing.assert_allclose(tril[i] @ tril[i].T, cov, rtol=1e-4,
                                   atol=1e-7)

    sds_b = evaluation.laplace_sigma_deep(dp, d, mask, theta, block_size=3)
    np.testing.assert_allclose(sds_b, sds, rtol=1e-6)


def test_scorer_laplace_sigma_deep_serves():
    """serve.AbilityScorer.laplace_sigma under a trained deep model: finite,
    positive, below the prior sd of 1 for observed students."""
    from vibo_tpu.data import simulate_irt, holdout_split
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.serve import AbilityScorer
    from vibo_tpu.train import Trainer, TrainConfig

    sim = simulate_irt("nonlinear", 60, 20, ability_dim=2, seed=9)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=9)
    model = VIBO(VIBOConfig(num_items=20, irt_model="deep", ability_dim=2,
                            hidden_dim=16, deep_hidden_dim=16,
                            item_latent_dim=4))
    res = Trainer(model, TrainConfig(epochs=8, eval_every=8)).fit(ds)
    sc = AbilityScorer(model, res["params"], pad_multiple=16)
    sds = sc.laplace_sigma(ds.response, ds.train_mask)
    assert sds.shape == (60, 2)
    assert np.all(np.isfinite(sds)) and np.all(sds > 0) and np.all(sds < 1.0)
