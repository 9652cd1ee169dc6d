"""Bounded end-to-end test of the at-scale pipeline (scripts/run_at_scale.py).

Parity contract: SURVEY.md section 3.2 sizes the design for "hundreds of
thousands of students" (DuoLingo scale); the full 135,800 x 2,048 single-chip
demonstration lives in RESULTS.md. This test exercises the SAME pipeline —
raw DuoLingo-format CSV -> native ingestion through load_dataset ->
person split -> packed full-batch scan training -> blocked evaluation +
amortized new-person scoring — at CPU-tractable shapes, so the production
path stays covered without a TPU or a 13M-row file.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_at_scale_pipeline_bounded(tmp_path):
    import gen_duolingo_csv
    import jax

    from vibo_tpu import evaluation
    from vibo_tpu.data.loaders import load_dataset
    from vibo_tpu.data.masking import split_persons
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.ops.pallas_elbo import pack_responses
    from vibo_tpu.train import Trainer, TrainConfig

    csv = tmp_path / "duolingo.csv"
    gen_duolingo_csv.generate(str(csv), rows=150_000, users=3_000,
                              lexemes=128, seed=2)

    ds = load_dataset("duolingo", data_dir=str(tmp_path), holdout_frac=0.1,
                      seed=2)
    n_all, m = ds.response.shape
    assert n_all > 2_000 and m > 100

    train_ds, new_ds = split_persons(ds, test_frac=0.05, seed=2)
    n = train_ds.response.shape[0]

    model = VIBO(VIBOConfig(num_items=m, irt_model="2pl", ability_dim=1,
                            hidden_dim=64, use_pallas=True))
    trainer = Trainer(model, TrainConfig(lr=5e-3))
    params, opt_state = trainer.init_state(jax.random.key(2))

    import jax.numpy as jnp
    code = jnp.asarray(pack_responses(train_ds.response, train_ds.train_mask))
    row_valid = jnp.asarray(
        (train_ds.train_mask.sum(-1) > 0).astype(np.float32))

    run = trainer.make_scan(1.0, 2, 100, packed=True, donate=False)
    key = jax.random.key(3)
    elbos = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, _, auxs = run(params, opt_state, sub, code,
                                         row_valid)
        elbos.append(float(auxs["elbo"][-1]))
    assert elbos[-1] > elbos[0]  # ELBO improves over 300 epochs

    acc = evaluation.imputation_accuracy(model, params, train_ds)
    assert acc["acc"] > acc["base_rate"] + 0.01

    iwae = evaluation.iwae_loglik(model, params, jax.random.key(7), train_ds,
                                  num_samples=10)
    assert np.isfinite(iwae["loglik_per_cell"])
    assert -1.0 < iwae["loglik_per_cell"] < 0.0

    # amortized scoring of students the model never trained on: one encoder
    # pass, no per-student optimization (arXiv:2002.00276 section 6 headline)
    new_person = evaluation.amortized_new_person_eval(model, params, new_ds)
    assert new_person["acc"] > acc["base_rate"] - 0.05
    assert new_person["persons_per_sec"] > 0
