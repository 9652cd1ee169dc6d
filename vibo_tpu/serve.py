"""Serving API: amortized ability scoring for new students.

The paper's headline capability (arXiv:2002.00276 section 6.5; SURVEY.md
section 3.4 "amortized ... fast inference for new students") packaged as a
production scoring artifact: load a trained checkpoint once, then score
arbitrary batches of unseen students with a single jit'd encoder forward —
no per-student optimization, microseconds per student on TPU.

The reference has no serving layer (SURVEY.md section 2: "no L5"); this is
the TPU-native framework's addition for deployment.

Usage:
    scorer = AbilityScorer.from_checkpoint("runs/pisa/best.npz", model)
    out = scorer.score(responses, masks)     # (B, M) float arrays
    out["theta_mu"]          # (B, K) posterior ability means
    out["theta_sigma"]       # (B, K) posterior std devs
    out["prob"]              # (B, M) predicted correctness probabilities
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vibo_tpu.models.vibo import VIBO
from vibo_tpu.train import checkpoint as ckpt


class AbilityScorer:
    """Batched amortized inference on a trained VIBO model.

    Scoring is deterministic: the posterior-MEAN item parameters condition
    the encoder (no sampling), matching evaluation.infer_posterior_means /
    impute_prob semantics. Batches are zero-padded to `pad_multiple` so the
    jit cache holds a handful of shapes, not one per request size.
    """

    def __init__(self, model: VIBO, params: dict, pad_multiple: int = 256,
                 item_mean: dict | None = None):
        """item_mean: optional frozen item-parameter means (e.g. computed
        from the training matrix via evaluation.full_item_mean). Required
        semantics for amortized item posteriors (cfg.item_encoder) when the
        scoring batches are small/unrepresentative; if omitted, an amortized
        model conditions q(d | r) on each scoring batch's own columns."""
        self.model = model
        self.params = params
        self.pad_multiple = max(1, pad_multiple)
        self.item_mean = item_mean

    @classmethod
    def from_checkpoint(cls, path: str, model: VIBO | None = None,
                        optimizer=None, **kw) -> "AbilityScorer":
        """Load (params, opt_state) saved by Trainer (train/checkpoint.py).

        model: optional — Trainer checkpoints embed the model config
        (extra_model_cfg), so by default the model is reconstructed from the
        file itself.
        optimizer: optional optax transform matching the checkpoint; by
        default it is rebuilt from the optimizer config the Trainer embeds
        (extra_opt_cfg), so checkpoints saved with any lr/max_grad_norm —
        including max_grad_norm=None, whose opt-state structure differs —
        load with no extra arguments.
        """
        import json

        extra = ckpt.peek_extra(path)
        if model is None:
            if "model_cfg" not in extra:
                raise ValueError(
                    f"{path} has no embedded model config; pass model=")
            from vibo_tpu.models.vibo import VIBOConfig
            model = VIBO(VIBOConfig(**json.loads(str(extra["model_cfg"]))))
        params = model.init_params(jax.random.key(0))
        if optimizer is None:
            from vibo_tpu.train.trainer import make_optimizer
            if "opt_cfg" in extra:
                oc = json.loads(str(extra["opt_cfg"]))
                optimizer = make_optimizer(oc["lr"], oc["max_grad_norm"])
            else:  # pre-opt_cfg checkpoints: the historical Trainer defaults
                optimizer = make_optimizer(5e-3, 10.0)
        template = (params, optimizer.init(params))
        (params, _), _, _, _ = ckpt.load_checkpoint(path, template)
        return cls(model, params, **kw)

    @functools.cached_property
    def _score_fn(self):
        model = self.model
        fixed_item_mean = self.item_mean

        @jax.jit
        def score(params, response, mask):
            if fixed_item_mean is not None:
                item_mean = fixed_item_mean
            else:
                item_mean = model.item_posterior_mean(params, response, mask)
            mu, logvar, off = model.encode(params, response, mask, item_mean)
            if model.cfg.irt_model in ("grm", "gpcm"):
                # polytomous serving: (B, M, C) category probabilities
                prob = jnp.exp(model.category_logprobs(params, mu, item_mean))
            else:
                prob = model.response_prob(params, mu, item_mean)
            from vibo_tpu.ops import distributions as dist
            return mu, dist.tril_marginal_sigma(logvar, off), prob

        return score

    def score(self, response, mask) -> dict:
        """response/mask: (B, M) arrays (numpy or jax) -> dict of numpy.

        mask marks which cells of `response` were actually observed; `prob`
        predicts every cell (observed or not).
        """
        response = np.asarray(response, np.float32)
        mask = np.asarray(mask, np.float32)
        if response.ndim != 2 or response.shape != mask.shape:
            raise ValueError(
                f"expected matching (B, M) response/mask, got "
                f"{response.shape} vs {mask.shape}")
        b = response.shape[0]
        pad = (-b) % self.pad_multiple
        if pad:
            response = np.pad(response, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        mu, sigma, prob = self._score_fn(self.params, jnp.asarray(response),
                                         jnp.asarray(mask))
        return {"theta_mu": np.asarray(mu)[:b],
                "theta_sigma": np.asarray(sigma)[:b],
                "prob": np.asarray(prob)[:b]}

    def laplace_sigma(self, response, mask, theta_mu=None) -> np.ndarray:
        """(B, K) Laplace (Fisher) posterior widths at the amortized mean —
        closed form for linear links, Gauss-Newton via autodiff for the
        deep link; measured at the K=4 gold's own noise ceiling (0.94 vs
        HMC sds) where the encoder head reaches ~0.64
        (evaluation.laplace_theta_sigma). theta_mu defaults to this
        scorer's own score()["theta_mu"]."""
        from vibo_tpu import evaluation

        if theta_mu is None:
            theta_mu = self.score(response, mask)["theta_mu"]
        items = self.item_mean
        if items is None:
            items = jax.tree.map(
                np.asarray,
                self.model.item_posterior_mean(
                    self.params, jnp.asarray(np.asarray(response,
                                                        np.float32)),
                    jnp.asarray(np.asarray(mask, np.float32))))
        if self.model.cfg.irt_model == "deep":
            return evaluation.laplace_sigma_deep(
                self.params["deep_link"], items["d"], mask, theta_mu)
        return evaluation.laplace_sigma_from_items(
            items, self.model.cfg.irt_model, mask, theta_mu)

    def refine(self, response, mask, steps: int = 300, lr: float = 0.05,
               num_samples: int = 8, seed: int = 0) -> dict:
        """Semi-amortized scoring: per-person SVI refinement of q(theta)
        from the amortized init (evaluation.refine_theta_posterior's
        program, driven from raw serving arrays). One vectorized Adam run
        covers the whole batch — no per-student loops. Returns the refined
        {"theta_mu", "theta_sigma", "theta_tril", "elbo_gain_per_person"}."""
        from vibo_tpu import evaluation

        response = np.asarray(response, np.float32)
        mask = np.asarray(mask, np.float32)
        if response.ndim != 2 or response.shape != mask.shape:
            raise ValueError(
                f"expected matching (B, M) response/mask, got "
                f"{response.shape} vs {mask.shape}")
        b = response.shape[0]
        pad = (-b) % self.pad_multiple
        if pad:
            response = np.pad(response, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        items = self.item_mean
        if items is None:
            items = jax.tree.map(
                np.asarray,
                self.model.item_posterior_mean(
                    self.params, jnp.asarray(response), jnp.asarray(mask)))
        items_j = {k: jnp.asarray(v) for k, v in items.items()}
        resp_j, mask_j = jnp.asarray(response), jnp.asarray(mask)
        mu0, logvar0, off0 = self._encode_fn(self.params, resp_j, mask_j,
                                             items_j)
        q0 = {"mu": mu0, "logvar": logvar0}
        if off0 is not None:
            q0["off"] = off0
        if self.model.cfg.irt_model == "deep":
            items_j["__deep__"] = self.params["deep_link"]
        # the refinement program consumes the evaluation bit-code; build it
        # from the serving arrays (binary: bit 0 response, bit 1 mask;
        # polytomous: bits 0-4 category, bit 5 mask — evaluation._decode_bits)
        if self.model.cfg.num_categories > 2:
            code = (response.astype(np.uint8) & 31) \
                | ((mask > 0).astype(np.uint8) << 5)
        else:
            code = (response.astype(np.uint8) & 1) \
                | ((mask > 0).astype(np.uint8) << 1)
        refine_fn = evaluation._refine_theta_fn(
            self.model.cfg, int(steps), int(num_samples), float(lr))
        mu, sigma, tril, per0, per1 = refine_fn(
            items_j, jnp.asarray(code), q0, jax.random.key(seed))
        gain = (np.asarray(per1)[:b] - np.asarray(per0)[:b]).mean()
        return {"theta_mu": np.asarray(mu)[:b],
                "theta_sigma": np.asarray(sigma)[:b],
                "theta_tril": np.asarray(tril)[:b],
                "elbo_gain_per_person": float(gain)}

    @functools.cached_property
    def _encode_fn(self):
        model = self.model

        @jax.jit
        def encode(params, response, mask, item_mean):
            return model.encode(params, response, mask, item_mean)

        return encode

    @functools.cached_property
    def _item_score_fn(self):
        model = self.model

        @jax.jit
        def score(params, response, mask):
            post = model.item_dist(params, response, mask, new_items=True)
            return {name: (p["mu"], jnp.exp(0.5 * p["logvar"]))
                    for name, p in post.items()}

        return score

    def score_items(self, response, mask) -> dict:
        """NEW-item cold-start: infer item-parameter posteriors for unseen
        items from their response columns in one amortized forward pass.

        response/mask: (B, M_new) — rows are any set of respondents, columns
        the new items. Returns {"<param>_mu": (M_new, D),
        "<param>_sigma": (M_new, D)} per item-parameter head (e.g. a, b).
        Requires a model trained with item_encoder=True; the free-form
        posterior has no parameters for unseen items.
        """
        if not self.model.cfg.item_encoder:
            raise ValueError(
                "score_items needs an amortized item posterior — train with "
                "VIBOConfig(item_encoder=True); the free-form per-item "
                "posterior cannot score unseen items")
        response = np.asarray(response, np.float32)
        mask = np.asarray(mask, np.float32)
        if response.ndim != 2 or response.shape != mask.shape:
            raise ValueError(
                f"expected matching (B, M_new) response/mask, got "
                f"{response.shape} vs {mask.shape}")
        out = self._item_score_fn(self.params, jnp.asarray(response),
                                  jnp.asarray(mask))
        flat = {}
        for name, (mu, sigma) in out.items():
            flat[f"{name}_mu"] = np.asarray(mu)
            flat[f"{name}_sigma"] = np.asarray(sigma)
        return flat
