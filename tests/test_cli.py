"""CLI harness tests: every [B] config shape runs end-to-end via main(argv)."""

import json

import numpy as np
import pytest

from vibo_tpu.cli import main


def run(argv):
    return main(argv)


def test_train_synthetic_1pl(tmp_path):
    s = run(["train", "synthetic-1pl", "--num-persons", "200", "--num-items",
             "32", "--epochs", "30", "--eval-every", "30",
             "--out-dir", str(tmp_path)])
    assert s["heldout_acc"] > 0.4
    assert (tmp_path / "metrics.jsonl").exists()
    assert (tmp_path / "best.npz").exists()


@pytest.mark.slow
def test_train_3pl_iwae():
    s = run(["train", "synthetic-3pl", "--irt-model", "3pl", "--num-persons",
             "128", "--num-items", "24", "--epochs", "10", "--eval-every", "10",
             "--missing-rate", "0.2", "--iwae-samples", "10"])
    assert "iwae_loglik_per_cell" in s
    assert s["iwae_loglik_per_cell"] < 0


def test_train_deep_link():
    s = run(["train", "synthetic-2pl", "--irt-model", "deep", "--num-persons",
             "96", "--num-items", "16", "--epochs", "10", "--eval-every", "10",
             "--hidden-dim", "32", "--item-latent-dim", "4"])
    assert s["final_elbo"] is not None


def test_train_minibatch_real_surrogate():
    s = run(["train", "gradescope", "--epochs", "5", "--eval-every", "5",
             "--batch-size", "256", "--hidden-dim", "32"])
    assert s["dataset"] == "gradescope-surrogate"


def test_baseline_mle():
    s = run(["baseline", "synthetic-2pl", "--method", "mle", "--num-persons",
             "150", "--num-items", "24", "--steps", "150"])
    assert s["heldout_acc"] is not None
    assert 0.0 <= s["ece"] <= 1.0      # calibration reported for baselines
    assert 0.0 <= s["brier"] <= 1.0


@pytest.mark.slow
def test_baseline_hmc():
    s = run(["baseline", "synthetic-1pl", "--method", "hmc", "--irt-model",
             "1pl", "--num-persons", "60", "--num-items", "12",
             "--hmc-warmup", "50", "--hmc-samples", "50",
             "--hmc-leapfrog", "12", "--hmc-target-accept", "0.7"])
    assert 0.2 < s["accept_rate"] <= 1.0
    assert 0.0 <= s["ece"] <= 1.0


def test_mean_field_ablation():
    s = run(["train", "synthetic-2pl", "--mean-field", "--num-persons", "96",
             "--num-items", "16", "--epochs", "10", "--eval-every", "10",
             "--hidden-dim", "32"])
    assert s["final_elbo"] is not None


def test_amortized_new_person_eval():
    s = run(["train", "synthetic-2pl", "--num-persons", "400", "--num-items",
             "32", "--epochs", "60", "--eval-every", "60",
             "--eval-new-persons", "0.2"])
    # amortized inference on 80 unseen students: one forward pass, above chance
    assert s["new_person_acc"] > s["new_person_base_rate"] - 0.02
    # throughput floor far above any per-person-optimization rate, but loose
    # enough to survive a contended single-core host (a background TPU run's
    # driver process shares the vCPU with this suite)
    assert s["new_persons_per_sec"] > 25


def test_compare_subcommand(capsys):
    from vibo_tpu.cli import main
    main(["compare", "synthetic-2pl", "--num-persons", "120",
          "--num-items", "30", "--epochs", "20", "--steps", "60",
          "--hmc-warmup", "20", "--hmc-samples", "20",
          "--methods", "mle,em"])
    import json
    out = capsys.readouterr().out.strip().splitlines()
    rep = json.loads(out[-1])
    methods = [r["method"] for r in rep["compare"]]
    assert methods == ["vibo", "mle", "em"]
    assert all(r["seconds"] > 0 for r in rep["compare"])


def test_compare_item_agreement_vs_hmc(capsys):
    """Cross-method ITEM-parameter agreement (SURVEY.md section 3.3: the
    real-data protocol correlates inferred item params against HMC too):
    every non-HMC row carries b_vs_hmc and a_vs_hmc, difficulties
    rotation-invariant, loadings transported through the theta Procrustes
    frame; the HMC row anchors both at 1.0."""
    from vibo_tpu.cli import main
    main(["compare", "synthetic-2pl", "--num-persons", "120",
          "--num-items", "30", "--ability-dim", "2", "--epochs", "20",
          "--steps", "60", "--hmc-warmup", "30", "--hmc-samples", "40",
          "--methods", "mle,hmc"])
    out = capsys.readouterr().out.strip().splitlines()
    rep = json.loads(out[-1])
    hmc_row = next(r for r in rep["compare"] if r["method"] == "hmc")
    assert hmc_row["b_vs_hmc"] == 1.0 and hmc_row["a_vs_hmc"] == 1.0
    for r in rep["compare"]:
        if r["method"] == "hmc":
            continue
        assert -1.0 <= r["b_vs_hmc"] <= 1.0
        assert -1.0 <= r["a_vs_hmc"] <= 1.0


def test_profile_flag(tmp_path):
    prof_dir = tmp_path / "trace"
    run(["train", "synthetic-1pl", "--num-persons", "64", "--num-items", "16",
         "--epochs", "3", "--eval-every", "3", "--hidden-dim", "32",
         "--profile", str(prof_dir)])
    import glob
    assert glob.glob(str(prof_dir / "plugins" / "profile" / "*" / "*.xplane.pb"))


def test_baseline_deep_requires_hmc():
    with pytest.raises(SystemExit):
        run(["baseline", "synthetic-2pl", "--method", "em", "--irt-model",
             "deep", "--num-persons", "60", "--num-items", "12"])
    with pytest.raises(SystemExit):
        # deep HMC without a decoder source
        run(["baseline", "synthetic-2pl", "--method", "hmc", "--irt-model",
             "deep", "--num-persons", "60", "--num-items", "12"])


@pytest.mark.slow
def test_compare_deep_uses_deep_hmc(capsys):
    main(["compare", "synthetic-2pl", "--irt-model", "deep", "--num-persons",
          "100", "--num-items", "16", "--epochs", "30", "--steps", "40",
          "--hmc-warmup", "30", "--hmc-samples", "30", "--methods", "mle,hmc",
          "--hidden-dim", "32"])
    out = capsys.readouterr().out.strip().splitlines()
    rep = json.loads(out[-1])
    hmc_row = next(r for r in rep["compare"] if r["method"] == "hmc")
    # the deep HMC row exists with diagnostics and agreement vs VIBO
    assert "rhat_max" in hmc_row
    vibo_row = next(r for r in rep["compare"] if r["method"] == "vibo")
    assert "theta_vs_hmc" in vibo_row


def test_restarts_and_condition_on_flags(tmp_path):
    """--restarts reports the per-restart table + promotes the winner's
    checkpoint; --condition-on mean trains the serving-consistent
    conditional family (VIBOConfig.condition_on)."""
    s = run(["train", "synthetic-2pl", "--num-persons", "96", "--num-items",
             "16", "--epochs", "12", "--eval-every", "12", "--hidden-dim",
             "32", "--restarts", "2", "--condition-on", "mean",
             "--out-dir", str(tmp_path)])
    assert len(s["restarts"]) == 2
    assert s["final_elbo"] == max(r["final_elbo"] for r in s["restarts"])
    assert (tmp_path / "best.npz").exists()
    assert (tmp_path / f"restart{s['selected_restart']}" / "best.npz").exists()


def test_nonlinear_dataset_and_chol_posterior_flags(tmp_path):
    """`train synthetic-nonlinear --theta-posterior chol`: the nonlinear
    generative family (data/synthetic._nonlinear_logits) is a first-class
    CLI dataset with ground-truth theta recovery reported, and the
    full-covariance ability posterior trains through the same entrypoint
    (round-4 additions)."""
    s = run(["train", "synthetic-nonlinear", "--num-persons", "96",
             "--num-items", "16", "--ability-dim", "2", "--epochs", "12",
             "--eval-every", "12", "--hidden-dim", "32",
             "--theta-posterior", "chol", "--iwae-samples", "8",
             "--out-dir", str(tmp_path)])
    assert s["dataset"] == "synthetic-nonlinear"
    assert np.isfinite(s["final_elbo"])
    assert "theta_pearson" in s          # simulator retains ground truth
    assert np.isfinite(s["iwae_loglik_per_cell"])
    assert (tmp_path / "best.npz").exists()


@pytest.mark.slow
def test_compare_hmc_cache_roundtrip(tmp_path, capsys):
    """--hmc-cache: first compare samples HMC and writes baseline_hmc.npz
    (write-through); the second reloads it (seconds==0, cached flag) with
    byte-identical agreement numbers; a seed mismatch refuses reuse."""
    argv = ["compare", "synthetic-2pl", "--num-persons", "120", "--num-items",
            "24", "--ability-dim", "2", "--hidden-dim", "32", "--epochs",
            "15", "--methods", "hmc", "--hmc-warmup", "15", "--hmc-samples",
            "15", "--hmc-leapfrog", "4", "--hmc-chains", "2",
            "--hmc-cache", str(tmp_path)]
    main(argv)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (tmp_path / "baseline_hmc.npz").exists()
    main(argv)
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hmc1 = next(r for r in first["compare"] if r["method"] == "hmc")
    hmc2 = next(r for r in second["compare"] if r["method"] == "hmc")
    assert hmc2["cached"] is True and hmc2["seconds"] == 0.0
    assert hmc2["heldout_acc"] == hmc1["heldout_acc"]
    vibo1 = next(r for r in first["compare"] if r["method"] == "vibo")
    vibo2 = next(r for r in second["compare"] if r["method"] == "vibo")
    assert vibo2["theta_vs_hmc"] == vibo1["theta_vs_hmc"]
    assert vibo2["sigma_vs_hmc"] == vibo1["sigma_vs_hmc"]
    with pytest.raises(SystemExit, match="invalid"):
        main(argv[:-2] + ["--seed", "9", "--hmc-cache", str(tmp_path)])


@pytest.mark.slow
def test_compare_deep_hmc_cache_fingerprint(tmp_path, capsys):
    """A cached DEEP gold posterior is only reusable under byte-identical
    decoder weights: same train config -> cache hit (deterministic
    training); different epochs -> different decoder -> loud refusal."""
    base = ["compare", "synthetic-2pl", "--irt-model", "deep",
            "--num-persons", "100", "--num-items", "16", "--hidden-dim",
            "32", "--methods", "hmc", "--hmc-warmup", "15", "--hmc-samples",
            "15", "--hmc-leapfrog", "4", "--hmc-chains", "2",
            "--hmc-cache", str(tmp_path)]
    main(base + ["--epochs", "20"])
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    import numpy as np
    with np.load(tmp_path / "baseline_hmc.npz") as z:
        assert "deep_fingerprint" in z.files
    main(base + ["--epochs", "20"])
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hmc2 = next(r for r in second["compare"] if r["method"] == "hmc")
    assert hmc2["cached"] is True
    with pytest.raises(SystemExit, match="decoder"):
        main(base + ["--epochs", "25"])


def test_train_gradescope_polytomous(tmp_path):
    """gradescope --irt-model grm loads the graded (partial-credit) protocol:
    the surrogate is GRM-generated with C categories end-to-end."""
    s = run(["train", "gradescope", "--irt-model", "grm",
             "--num-categories", "4", "--epochs", "10", "--eval-every", "10",
             "--out-dir", str(tmp_path)])
    assert s["dataset"] == "gradescope-surrogate"
    assert 0 < s["heldout_acc"] <= 1
    # binary links keep the binarized-at-full-credit loading
    b = run(["train", "gradescope", "--epochs", "5", "--eval-every", "5",
             "--out-dir", str(tmp_path)])
    assert b["heldout_base_rate"] != s["heldout_base_rate"]


def test_compare_synthetic_gpcm(capsys):
    """compare synthetic-gpcm: the partial-credit family's full parity
    sweep (vibo / mle / em / hmc) runs end-to-end with category-exact
    accuracy and item-agreement columns."""
    main(["compare", "synthetic-gpcm", "--num-persons", "100",
          "--num-items", "16", "--num-categories", "4", "--irt-model",
          "gpcm", "--epochs", "25", "--steps", "60",
          "--hmc-warmup", "30", "--hmc-samples", "30"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    methods = [r["method"] for r in rep["compare"]]
    assert methods == ["vibo", "mle", "em", "hmc"]
    for r in rep["compare"]:
        assert 0 <= r["heldout_acc"] <= 1
    assert "theta_vs_hmc" in rep["compare"][0]
