"""`cli score`: the serving surface end-to-end — train on a real-format CSV
(item vocabulary embedded in the checkpoint), then score NEW students from a
long-format CSV and from an .npz, and new ITEMS from an .npz.

Covers the id plumbing loaders.load_dataset -> Dataset.item_ids ->
Trainer checkpoint extra -> cmd_score vocabulary alignment (SURVEY.md
section 3.4 "fast inference for new students"; the reference has no serving
layer — SURVEY section 2 "no L5")."""

import csv
import json

import numpy as np
import pytest

from vibo_tpu import cli
from vibo_tpu.data import simulate_irt


def _write_pisa_csv(path, sim, item_ids):
    rows = [("student_id", "item_id", "correct")]
    n, m = sim.response.shape
    for p in range(n):
        for j in range(m):
            if sim.mask[p, j] > 0:
                rows.append((f"s{p:03d}", item_ids[j],
                             int(sim.response[p, j])))
    with open(path, "w", newline="") as f:
        csv.writer(f).writerows(rows)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a small model from a pisa-format CSV; return paths + sim."""
    tmp = tmp_path_factory.mktemp("score")
    item_ids = [f"Q-{j:02d}" for j in range(24)]
    sim = simulate_irt("2pl", 160, 24, ability_dim=1, seed=3,
                       missing_rate=0.1)
    _write_pisa_csv(tmp / "pisa.csv", sim, item_ids)
    out = tmp / "run"
    cli.main(["train", "pisa", "--data-dir", str(tmp), "--epochs", "60",
              "--eval-every", "20", "--out-dir", str(out), "--cpu"])
    return {"tmp": tmp, "ckpt": str(out / "best.npz"), "sim": sim,
            "item_ids": item_ids}


def test_checkpoint_embeds_item_vocab(trained):
    from vibo_tpu.train import checkpoint as ckpt
    extra = ckpt.peek_extra(trained["ckpt"])
    assert "item_ids" in extra
    vocab = json.loads(str(extra["item_ids"]))
    assert vocab == trained["item_ids"]


def test_score_from_csv_matches_npz(trained, tmp_path, capsys):
    """CSV-with-vocab scoring == npz scoring of the same response matrix."""
    sim, item_ids = trained["sim"], trained["item_ids"]
    rng = np.random.default_rng(7)
    new_resp = (rng.random((12, 24)) < 0.5).astype(np.float32)
    new_mask = (rng.random((12, 24)) < 0.8).astype(np.float32)
    new_resp *= new_mask

    # long CSV with one unknown-item row (must be dropped, not crash)
    rows = [("student_id", "item_id", "correct")]
    for p in range(12):
        for j in range(24):
            if new_mask[p, j] > 0:
                rows.append((f"n{p:02d}", item_ids[j], int(new_resp[p, j])))
    rows.append(("n00", "NOT-IN-VOCAB", 1))
    csv_path = tmp_path / "new.csv"
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)

    npz_path = tmp_path / "new.npz"
    np.savez(npz_path, response=new_resp, mask=new_mask)

    out_csv = tmp_path / "score_csv.npz"
    s1 = cli.main(["score", "--checkpoint", trained["ckpt"], "--input",
                   str(csv_path), "--output", str(out_csv), "--cpu"])
    out_npz = tmp_path / "score_npz.npz"
    s2 = cli.main(["score", "--checkpoint", trained["ckpt"], "--input",
                   str(npz_path), "--output", str(out_npz), "--cpu"])

    assert s1["num_persons"] == 12 and s2["num_persons"] == 12
    assert s1["num_unknown_item_responses"] == 1
    with np.load(out_csv) as a, np.load(out_npz) as b:
        # CSV person order is sorted n00..n11 == npz row order
        np.testing.assert_allclose(a["theta_mu"], b["theta_mu"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a["prob"], b["prob"],
                                   rtol=1e-5, atol=1e-6)
        assert list(a["person_ids"]) == [f"n{p:02d}" for p in range(12)]
        assert a["theta_sigma"].shape == (12, 1)

    # scoring agrees with the library serving API on identical inputs
    from vibo_tpu.serve import AbilityScorer
    scorer = AbilityScorer.from_checkpoint(trained["ckpt"])
    direct = scorer.score(new_resp, new_mask)
    with np.load(out_npz) as b:
        np.testing.assert_allclose(b["theta_mu"], direct["theta_mu"],
                                   rtol=1e-5, atol=1e-6)


def test_score_csv_without_vocab_requires_int_ids(trained, tmp_path):
    """A checkpoint with no embedded vocabulary falls back to integer column
    indices; string ids raise a clear error."""
    from vibo_tpu.serve import AbilityScorer
    from vibo_tpu.train import checkpoint as ckpt

    # strip the vocab by re-saving through the raw checkpoint API
    scorer = AbilityScorer.from_checkpoint(trained["ckpt"])
    extra = ckpt.peek_extra(trained["ckpt"])
    import jax
    stripped = tmp_path / "novocab.npz"
    ckpt.save_checkpoint(
        str(stripped), (scorer.params, None), jax.random.key(0), 0,
        extra={k: extra[k] for k in ("model_cfg", "opt_cfg")})
    # rebuild loadable template shape: save (params, opt_state) like Trainer
    from vibo_tpu.train.trainer import make_optimizer
    oc = json.loads(str(extra["opt_cfg"]))
    opt = make_optimizer(oc["lr"], oc["max_grad_norm"])
    ckpt.save_checkpoint(
        str(stripped), (scorer.params, opt.init(scorer.params)),
        jax.random.key(0), 0,
        extra={k: extra[k] for k in ("model_cfg", "opt_cfg")})

    csv_path = tmp_path / "intids.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(("student_id", "item_id", "correct"))
        for j in range(8):
            w.writerow(("p0", j, 1))
    s = cli.main(["score", "--checkpoint", str(stripped), "--input",
                  str(csv_path), "--cpu"])
    assert s["num_persons"] == 1

    bad = tmp_path / "strids.csv"
    with open(bad, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(("student_id", "item_id", "correct"))
        w.writerow(("p0", "Q-00", 1))
    with pytest.raises(ValueError, match="no item vocabulary"):
        cli.main(["score", "--checkpoint", str(stripped), "--input",
                  str(bad), "--cpu"])


def test_score_new_items_cold_start(tmp_path):
    """--items routes to score_items (needs item_encoder=True)."""
    import jax
    from vibo_tpu.data import holdout_split
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.train import Trainer, TrainConfig

    sim = simulate_irt("2pl", 120, 20, ability_dim=1, seed=5)
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0, name="t")
    model = VIBO(VIBOConfig(num_items=20, irt_model="2pl", ability_dim=1,
                            hidden_dim=32, item_encoder=True))
    out = tmp_path / "run"
    Trainer(model, TrainConfig(epochs=30, eval_every=15,
                               out_dir=str(out))).fit(ds)

    rng = np.random.default_rng(11)
    resp = (rng.random((120, 6)) < 0.5).astype(np.float32)
    np.savez(tmp_path / "newitems.npz", response=resp)
    s = cli.main(["score", "--checkpoint", str(out / "best.npz"),
                  "--input", str(tmp_path / "newitems.npz"), "--items",
                  "--output", str(tmp_path / "itemout.npz"), "--cpu"])
    assert s["mode"] == "items" and s["num_new_items"] == 6
    with np.load(tmp_path / "itemout.npz") as d:
        assert any(k.endswith("_mu") for k in d.files)
        mu_keys = [k for k in d.files if k.endswith("_mu")]
        assert all(d[k].shape[0] == 6 for k in mu_keys)


def test_score_refine_theta_outputs(trained, tmp_path):
    """`score --refine-theta` appends refined_{theta_mu,theta_sigma,
    theta_tril} to the output npz, shaped per person."""
    rng = np.random.default_rng(9)
    new_resp = (rng.random((9, 24)) < 0.5).astype(np.float32)
    new_mask = (rng.random((9, 24)) < 0.8).astype(np.float32)
    new_resp *= new_mask
    npz_path = tmp_path / "new.npz"
    np.savez(npz_path, response=new_resp, mask=new_mask)
    out_path = tmp_path / "score_refined.npz"
    s = cli.main(["score", "--checkpoint", trained["ckpt"], "--input",
                  str(npz_path), "--output", str(out_path), "--cpu",
                  "--refine-theta", "60"])
    assert s["num_persons"] == 9
    with np.load(out_path) as a:
        assert a["refined_theta_mu"].shape == (9, 1)
        assert a["refined_theta_sigma"].shape == (9, 1)
        assert a["refined_theta_tril"].shape == (9, 1, 1)
        assert np.isfinite(a["refined_theta_mu"]).all()
        assert (a["refined_theta_sigma"] > 0).all()
