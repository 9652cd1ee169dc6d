"""Evaluation suite: imputation accuracy, IWAE test log-lik, parameter recovery.

Parity contract: SURVEY.md section 3.3 "Evaluation suite" and section 4.2-4.3;
arXiv:2002.00276 sections 6.3-6.5:
- held-out missing-response imputation accuracy (p > 0.5 vs hidden cells);
- multi-sample IWAE bound on test log-likelihood (S ~= 100, vmap'd);
- Pearson/Spearman correlation of inferred vs ground-truth (synthetic) or
  vs HMC-posterior (real) parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from vibo_tpu.data.masking import Dataset
from vibo_tpu.models.vibo import VIBO


def _person_blocks(n: int, block: int):
    for start in range(0, n, block):
        yield start, min(start + block, n)


def full_item_dist(model: VIBO, params, ds: Dataset) -> dict:
    """Item posterior conditioned on the FULL train-visible matrix (one
    pass). The free-form posterior ignores the data; the amortized encoder
    (cfg.item_encoder) pools column statistics over every training person,
    which is the protocol all evaluations share regardless of person
    blocking."""
    if not model.cfg.item_encoder:
        return model.item_dist(params)
    f = jax.jit(model.item_dist)
    return f(params, jnp.asarray(ds.response), jnp.asarray(ds.train_mask))


def full_item_mean(model: VIBO, params, ds: Dataset) -> dict:
    return {name: p["mu"] for name, p in full_item_dist(model, params, ds).items()}


def imputation_accuracy(model: VIBO, params, ds: Dataset,
                        block_size: int = 4096,
                        item_mean: dict | None = None) -> dict:
    """Predict held-out cells from posterior means of the train-visible data.

    Returns accuracy, base-rate (majority-class) accuracy, and counts.
    item_mean: optional precomputed item-parameter means (e.g. from the
    TRAIN split when scoring unseen persons with an amortized item
    posterior); defaults to conditioning on this dataset's train mask.
    """
    if item_mean is None:
        item_mean = full_item_mean(model, params, ds)
    impute = jax.jit(model.impute_prob_with_items)
    correct = 0.0
    total = 0.0
    ones = 0.0
    n = ds.response.shape[0]
    for s, e in _person_blocks(n, block_size):
        resp = jnp.asarray(ds.response[s:e])
        tmask = jnp.asarray(ds.train_mask[s:e])
        hmask = np.asarray(ds.heldout_mask[s:e])
        prob = np.asarray(impute(params, resp, tmask, item_mean))
        pred = (prob > 0.5).astype(np.float32)
        truth = ds.response[s:e]
        correct += float((hmask * (pred == truth)).sum())
        total += float(hmask.sum())
        ones += float((hmask * truth).sum())
    base_rate = max(ones, total - ones) / max(total, 1.0)
    return {"acc": correct / max(total, 1.0), "base_rate": base_rate,
            "num_heldout": int(total)}


def iwae_loglik(model: VIBO, params, key: jax.Array, ds: Dataset,
                num_samples: int = 100, block_size: int = 2048,
                on: str = "heldout") -> dict:
    """IWAE-S bound on log p(r) over observed cells, summed over person blocks.

    on='heldout' (default — the paper's metric is TEST log-likelihood,
    SURVEY.md section 1) evaluates the hidden cells; on='train' the
    training-visible ones. The encoder conditions on the train-visible
    responses either way, matching the imputation protocol.
    """
    if model.cfg.use_pallas:
        # Eval runs once per fit: the XLA loglik vmaps over S samples in one
        # fast-compiling fused program, while vmapping the Pallas custom-VJP
        # op S times costs minutes of Mosaic compile (esp. 3PL) for no
        # runtime win here.
        import dataclasses
        model = VIBO(dataclasses.replace(model.cfg, use_pallas=False))
    n = ds.response.shape[0]
    total = 0.0
    cells = 0.0
    item_post = full_item_dist(model, params, ds)

    @jax.jit
    def block_bound(params, item_post, key, resp, tmask, emask, item_scale):
        # Encoder conditions on train-visible data; likelihood on emask cells.
        # Shared item prior/posterior terms enter scaled by block/N so the
        # sum over blocks counts them exactly once (the ELBO's item-KL
        # minibatch convention, SURVEY.md section 3.4).
        # Rows without evaluated cells (all-missing padding rows from
        # pad_to_multiple, or real persons with no held-out cells when
        # on='heldout') are excluded from the theta prior/posterior terms:
        # their factor marginalizes to exactly E_q[p(theta)/q(theta)] = 1, so
        # exclusion is exact, lowers variance, and makes the bound invariant
        # to padding (tested in tests/test_training.py).
        valid = (emask.sum(-1) > 0).astype(jnp.float32)

        def one_sample(k):
            from vibo_tpu.ops import distributions as dist
            from vibo_tpu.ops import objectives
            k_item, k_theta = jax.random.split(k)
            item_sample = model.sample_items_from(item_post, k_item)
            mu, logvar = model.encode(params, resp, tmask, item_sample)
            theta = dist.reparameterize(k_theta, mu, logvar)
            ll = model.loglik_per_person(params, theta, item_sample, resp, emask).sum()
            lp = (dist.standard_normal_log_prob(theta).sum(-1) * valid).sum()
            lq = (dist.gaussian_log_prob(theta, mu, logvar).sum(-1) * valid).sum()
            ratio = model.item_log_ratio_from(item_post, item_sample)
            return objectives.importance_log_weights(ll, lp, lq, ratio, 0.0,
                                                     item_scale)
        from vibo_tpu.ops import objectives
        log_w = jax.vmap(one_sample)(jax.random.split(key, num_samples))
        return objectives.iwae_bound(log_w)

    for i, (s, e) in enumerate(_person_blocks(n, block_size)):
        resp = jnp.asarray(ds.response[s:e])
        tmask = jnp.asarray(ds.train_mask[s:e])
        emask = tmask if on == "train" else jnp.asarray(ds.heldout_mask[s:e])
        key, sub = jax.random.split(key)
        total += float(block_bound(params, item_post, sub, resp, tmask, emask,
                                   (e - s) / n))
        cells += float(np.asarray(emask).sum())
    return {"loglik": total, "loglik_per_cell": total / max(cells, 1.0),
            "num_cells": int(cells), "num_samples": num_samples}


def infer_posterior_means(model: VIBO, params, ds: Dataset,
                          block_size: int = 4096, return_sigma: bool = False):
    """Posterior-mean abilities (N, K) and item-parameter means (dict).

    return_sigma=True additionally returns the (N, K) posterior standard
    deviations (VIBO's uncertainty — compared against HMC's posterior sd in
    the calibration eval)."""
    item_mean = full_item_mean(model, params, ds)
    encode = jax.jit(lambda p, r, m: model.encode(p, r, m, item_mean))
    thetas, sigmas = [], []
    for s, e in _person_blocks(ds.response.shape[0], block_size):
        mu, logvar = encode(params, jnp.asarray(ds.response[s:e]),
                            jnp.asarray(ds.train_mask[s:e]))
        thetas.append(np.asarray(mu))
        if return_sigma:
            sigmas.append(np.asarray(jnp.exp(0.5 * logvar)))
    theta = np.concatenate(thetas, 0)
    items = {k: np.asarray(v) for k, v in item_mean.items()}
    if return_sigma:
        return theta, items, np.concatenate(sigmas, 0)
    return theta, items


def amortized_new_person_eval(model: VIBO, params, test_ds: Dataset,
                              block_size: int = 4096) -> dict:
    """The paper's headline capability (arXiv:2002.00276 section 6): a trained
    VIBO encoder infers posteriors for UNSEEN students in one forward pass —
    no per-student optimization. Feed the test persons' train-visible
    responses through the trained encoder + item posterior means and score
    their held-out cells.

    Use with data.masking.split_persons: train on the train split, call this
    on the test split. Requires identical item sets (same num_items).
    """
    import time
    t0 = time.perf_counter()
    out = imputation_accuracy(model, params, test_ds, block_size)
    out["seconds"] = time.perf_counter() - t0
    out["persons_per_sec"] = test_ds.response.shape[0] / max(out["seconds"], 1e-9)
    return out


def procrustes_align(inferred: np.ndarray, truth: np.ndarray) -> np.ndarray:
    """Rotate inferred (N, K) onto truth with the orthogonal Procrustes
    solution W = UV^T, SVD(inferred^T truth) = U S V^T.

    Multidimensional IRT latents are identified only up to an orthogonal
    transform of (theta, a) jointly — raw per-dim correlations against
    ground truth are meaningless for K > 1 without this (standard factor-
    analysis practice; the reference's K>1 recovery eval needs the same)."""
    inferred = np.asarray(inferred, np.float64)
    truth = np.asarray(truth, np.float64)
    u, _, vt = np.linalg.svd(inferred.T @ truth)
    return inferred @ (u @ vt)


def correlation(inferred: np.ndarray, truth: np.ndarray,
                align_sign: bool = True, align_rotation: bool = False) -> dict:
    """Pearson/Spearman correlation per trailing dim, averaged.

    align_sign flips each inferred dim to positively correlate with truth —
    IRT latent dims are sign-invariant (theta, a) -> (-theta, -a).
    align_rotation applies the orthogonal Procrustes alignment first
    (subsumes sign flips; use for multidimensional ability recovery).
    """
    inferred = np.asarray(inferred, np.float64)
    truth = np.asarray(truth, np.float64)
    if inferred.ndim == 1:
        inferred, truth = inferred[:, None], truth[:, None]
    if align_rotation and truth.shape[1] > 1:
        inferred = procrustes_align(inferred, truth)
    pearsons, spearmans = [], []
    for d in range(truth.shape[1]):
        x, y = inferred[:, d], truth[:, d]
        p = scipy.stats.pearsonr(x, y).statistic
        s = scipy.stats.spearmanr(x, y).statistic
        # One sign flip per dim (negating x negates BOTH statistics exactly);
        # deciding from p + s rather than p alone avoids reporting a
        # misleading negative Spearman when Pearson is near zero.
        if align_sign and p + s < 0:
            p, s = -p, -s
        pearsons.append(p)
        spearmans.append(s)
    return {"pearson": float(np.mean(pearsons)),
            "spearman": float(np.mean(spearmans))}
