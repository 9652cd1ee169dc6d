"""Data layer tests: simulator statistics, hold-out invariants, loaders."""

import numpy as np
import pytest

from vibo_tpu.data import simulate_irt, holdout_split, load_dataset
from vibo_tpu.data.loaders import long_to_matrix
from vibo_tpu.data.masking import pad_to_multiple, split_persons, batch_iterator


def test_simulator_reproducible_and_calibrated():
    s1 = simulate_irt("2pl", 500, 40, ability_dim=2, seed=7)
    s2 = simulate_irt("2pl", 500, 40, ability_dim=2, seed=7)
    np.testing.assert_array_equal(s1.response, s2.response)
    # empirical response rate tracks the true probabilities
    assert abs(s1.response.mean() - s1.prob.mean()) < 0.02


def test_simulator_3pl_guess_floor():
    s = simulate_irt("3pl", 2000, 30, seed=1)
    # even the hardest item's success rate should exceed half its guess prob
    g = 1 / (1 + np.exp(-s.g_hat))
    rates = s.response.mean(0)
    assert (rates > 0.25 * g).all()


def test_simulator_missingness():
    s = simulate_irt("1pl", 300, 20, seed=2, missing_rate=0.3)
    assert 0.6 < s.mask.mean() < 0.8
    assert (s.response * (1 - s.mask) == 0).all()


def test_holdout_split_invariants():
    s = simulate_irt("1pl", 200, 25, seed=3, missing_rate=0.2)
    ds = holdout_split(s.response, s.mask, holdout_frac=0.1, seed=3)
    # disjoint, and union = observed
    assert (ds.train_mask * ds.heldout_mask == 0).all()
    np.testing.assert_array_equal(ds.train_mask + ds.heldout_mask, s.mask)
    frac = ds.heldout_mask.sum() / s.mask.sum()
    assert 0.07 < frac < 0.13


def test_holdout_split_blocked_matches_one_shot():
    """The streamed row-block implementation must reproduce the historical
    one-shot draw BIT-FOR-BIT (Generator.random is sequential in the bit
    stream), so recorded RESULTS.md numbers stay reproducible."""
    s = simulate_irt("2pl", 300, 40, seed=9, missing_rate=0.15)
    ds = holdout_split(s.response, s.mask, holdout_frac=0.1, seed=9)
    rng = np.random.default_rng(9 + 101)
    observed = s.mask > 0
    hide = (rng.random(s.mask.shape) < 0.1) & observed
    np.testing.assert_array_equal(ds.heldout_mask, hide.astype(np.float32))
    np.testing.assert_array_equal(ds.train_mask,
                                  (observed & ~hide).astype(np.float32))
    # the property the blocked path relies on: sequential block draws from
    # one generator equal a single (N, M) draw
    n, m = s.mask.shape
    rng2 = np.random.default_rng(9 + 101)
    parts = [rng2.random((min(n, st + 7) - st, m)) for st in range(0, n, 7)]
    np.testing.assert_array_equal(
        np.concatenate(parts), np.random.default_rng(9 + 101).random((n, m)))


def test_split_persons():
    s = simulate_irt("1pl", 100, 10, seed=4)
    ds = holdout_split(s.response, s.mask, 0.1, seed=4)
    tr, te = split_persons(ds, test_frac=0.2, seed=4)
    assert tr.response.shape[0] + te.response.shape[0] == 100
    assert te.response.shape[0] == 20


def test_pad_to_multiple():
    s = simulate_irt("1pl", 100, 50, seed=5)
    ds = holdout_split(s.response, s.mask, 0.1, seed=5)
    padded = pad_to_multiple(ds, 8, 128)
    assert padded.response.shape == (104, 128)
    assert padded.train_mask[100:].sum() == 0
    assert padded.train_mask[:, 50:].sum() == 0
    assert padded.num_persons == 100 and padded.num_items == 50


def test_batch_iterator_covers_all_rows():
    s = simulate_irt("1pl", 37, 10, seed=6)
    ds = holdout_split(s.response, s.mask, 0.0, seed=6)
    seen = 0
    for resp, mask in batch_iterator(ds, 16, seed=0, epoch=0):
        assert resp.shape == (16, 10)
        seen += int((mask.sum(1) > 0).sum())
    assert seen == 37  # every person exactly once (mask>0 rows)


def test_long_to_matrix_filtering():
    rows = []
    for p in range(10):
        for i in range(8):
            rows.append((f"p{p}", f"i{i}", 1.0 if (p + i) % 2 else 0.0))
    rows.append(("sparse_person", "i0", 1.0))  # only 1 response -> dropped
    resp, mask = long_to_matrix(rows, min_per_person=5, min_per_item=5)
    assert resp.shape == (10, 8)
    assert mask.all()


def test_load_dataset_surrogates():
    for name in ("pisa", "wordbank", "gradescope"):
        ds = load_dataset(name, data_dir=None, seed=0)
        assert ds.name.endswith("surrogate")
        assert ds.response.shape[0] > 100
        assert (ds.train_mask * ds.heldout_mask == 0).all()
    with pytest.raises(ValueError):
        load_dataset("nope")


def test_load_dataset_from_csv(tmp_path):
    import csv
    path = tmp_path / "pisa.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["student_id", "item_id", "correct"])
        w.writeheader()
        for p in range(20):
            for i in range(10):
                w.writerow({"student_id": p, "item_id": i,
                            "correct": int((p * 7 + i) % 3 > 0)})
    ds = load_dataset("pisa", data_dir=str(tmp_path), seed=0)
    assert ds.name == "pisa"
    assert ds.response.shape == (20, 10)


def test_surrogate_deterministic_across_hash_seeds():
    """Surrogate datasets must be byte-identical regardless of Python's
    per-process hash salt (reproducible benchmarks/checkpoints)."""
    import subprocess
    import sys
    code = ("import sys; sys.path.insert(0, '/root/repo');"
            "from vibo_tpu.data.loaders import _surrogate;"
            "import numpy as np, zlib;"
            "r, m = _surrogate('pisa', 0);"
            "print(zlib.crc32(r.tobytes()), zlib.crc32(m.tobytes()))")
    outs = []
    for salt in ("1", "2"):
        env = {"PYTHONHASHSEED": salt, "PATH": "/usr/bin:/bin:/usr/local/bin",
               "JAX_PLATFORMS": "cpu"}
        outs.append(subprocess.run([sys.executable, "-c", code], env=env,
                                   capture_output=True, text=True).stdout)
    assert outs[0] == outs[1] and outs[0].strip()


def test_load_dataset_forwards_min_filters(tmp_path):
    """min_per_person/min_per_item must actually filter the parsed matrix."""
    import csv as _csv
    path = tmp_path / "pisa.csv"
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["student_id", "item_id", "correct"])
        w.writeheader()
        # 10 students x 6 items, fully crossed
        for s in range(10):
            for i in range(6):
                w.writerow({"student_id": f"s{s}", "item_id": f"i{i}",
                            "correct": (s + i) % 2})
    ds_loose = load_dataset("pisa", data_dir=str(tmp_path), holdout_frac=0.0,
                            min_per_person=5, min_per_item=5)
    assert ds_loose.shape == (10, 6)
    ds_strict = load_dataset("pisa", data_dir=str(tmp_path), holdout_frac=0.0,
                             min_per_person=7, min_per_item=5)
    # every person has only 6 responses -> all filtered
    assert ds_strict.shape[0] == 0 or ds_strict.shape[0] < 10


def test_simulator_nonlinear_family():
    """'nonlinear' (the deep link's generative regime, arXiv:2002.00276
    section 5.3): reproducible, valid probabilities, and the true logit
    matrix carries substantial energy OUTSIDE the rank-(K+1) subspace a
    bilinear 2PL link (theta @ a^T - b) can express — so a linear-link model
    is genuinely misspecified on it."""
    from vibo_tpu.data.synthetic import simulate_irt
    k = 2
    s1 = simulate_irt("nonlinear", 300, 60, ability_dim=k, seed=4)
    s2 = simulate_irt("nonlinear", 300, 60, ability_dim=k, seed=4)
    np.testing.assert_array_equal(s1.response, s2.response)
    assert s1.theta.shape == (300, k) and s1.a.shape == (60, k)
    assert np.all((s1.prob > 0) & (s1.prob < 1))
    assert set(np.unique(s1.response)) <= {0.0, 1.0}
    logits = np.log(s1.prob / (1 - s1.prob))
    sv = np.linalg.svd(logits - logits.mean(), compute_uv=False)
    tail = (sv[k + 1:] ** 2).sum() / (sv ** 2).sum()
    assert tail > 0.05, f"logits ~rank-{k+1}: tail energy {tail:.4f}"
    # the linear families stay exactly bilinear by the same measure
    lin = simulate_irt("2pl", 300, 60, ability_dim=k, seed=4)
    llog = np.log(lin.prob / (1 - lin.prob))
    sv_l = np.linalg.svd(llog - llog.mean(), compute_uv=False)
    assert (sv_l[k + 1:] ** 2).sum() / (sv_l ** 2).sum() < 1e-9


def test_load_gradescope_polytomous_surrogate():
    """num_categories=C keeps Gradescope graded: GRM-generated surrogate,
    Dataset.num_categories propagates, responses are ordinal."""
    ds = load_dataset("gradescope", data_dir=None, seed=0, num_categories=4)
    assert ds.num_categories == 4
    obs = ds.response[(ds.train_mask + ds.heldout_mask) > 0]
    assert set(np.unique(obs)) <= set(range(4))
    assert len(np.unique(obs)) >= 3            # actually graded, not binary
    # binary default unchanged
    b = load_dataset("gradescope", data_dir=None, seed=0)
    assert b.num_categories == 2
    # polytomous loading is a gradescope protocol only
    with pytest.raises(ValueError, match="gradescope"):
        load_dataset("pisa", num_categories=4)


def test_load_gradescope_polytomous_csv(tmp_path):
    """Partial-credit score/max_score quantizes to round(C-1 * frac)."""
    import csv as _csv
    path = tmp_path / "gradescope.csv"
    scores = {}
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["student_id", "question_id",
                                           "score", "max_score"])
        w.writeheader()
        for p in range(12):
            for i in range(6):
                s, m = (p * 5 + i * 3) % 11, 10
                scores[(str(p), str(i))] = s / m
                w.writerow({"student_id": p, "question_id": i,
                            "score": s, "max_score": m})
    ds = load_dataset("gradescope", data_dir=str(tmp_path), seed=0,
                      num_categories=5)
    assert ds.num_categories == 5
    assert ds.response.shape == (12, 6)
    # row/col vocabularies are sorted string ids
    ids = sorted(str(p) for p in range(12))
    for r, pid in enumerate(ids):
        for c, iid in enumerate(sorted(str(i) for i in range(6))):
            want = round(4 * scores[(pid, iid)])
            assert ds.response[r, c] == want, (pid, iid)
    # same file binarized at full credit under the default
    b = load_dataset("gradescope", data_dir=str(tmp_path), seed=0)
    assert b.num_categories == 2
    assert set(np.unique(b.response)) <= {0.0, 1.0}
