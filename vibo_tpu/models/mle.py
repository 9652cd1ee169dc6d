"""MLE / MAP baseline: point estimation of abilities + item parameters by SGD.

Parity contract: SURVEY.md section 3.3 "MLE / MAP baseline";
arXiv:2002.00276 section 6 — same masked Bernoulli objective as VIBO without
posteriors; MAP adds the N(0, I) log-prior.

TPU design: all persons' thetas are one (N, K) tensor, the whole objective is
one fused masked reduction (optionally the Pallas kernel), and the optimizer
is optax adam under jit — thousands of full-batch steps per second.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops import links


@dataclasses.dataclass(frozen=True)
class MLEConfig:
    irt_model: str = "2pl"
    ability_dim: int = 1
    num_categories: int = 2     # grm/gpcm only
    map_prior: bool = True      # False => pure MLE
    lr: float = 0.05
    steps: int = 500
    seed: int = 0


def init_point_params(key, num_persons, num_items, cfg: MLEConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "theta": 0.1 * jax.random.normal(k1, (num_persons, cfg.ability_dim)),
        "b": (0.1 * jax.random.normal(k3, (num_items,
                                           cfg.num_categories - 1))
              if cfg.irt_model in links.CATEGORICAL_MODELS
              else 0.1 * jax.random.normal(k3, (num_items,))),
    }
    if cfg.irt_model in ("2pl", "3pl", "grm", "gpcm"):
        params["a"] = (jax.random.normal(k2, (num_items, cfg.ability_dim))
                       / jnp.sqrt(cfg.ability_dim) * 0.5 + 0.0)
    if cfg.irt_model == "3pl":
        params["g_hat"] = jnp.full((num_items,), -1.5) + \
            0.1 * jax.random.normal(k4, (num_items,))
    return params


def neg_log_posterior(params, resp, mask, cfg: MLEConfig):
    theta = params["theta"]
    if cfg.irt_model in links.CATEGORICAL_MODELS:
        # "b" holds the UNCONSTRAINED coordinates (links.categorical_table:
        # grm thresholds / gpcm steps), exactly like the VIBO/HMC
        # parameterization
        ll = lik.categorical_loglik_cells(
            cfg.irt_model, links.grm_base(theta, params["a"]),
            links.categorical_table(cfg.irt_model, params["b"]),
            resp, mask).sum()
    else:
        if cfg.irt_model == "1pl":
            logits = links.logits_1pl(theta, params["b"])
            g_hat = None
        else:
            logits = links.logits_2pl(theta, params["a"], params["b"])
            g_hat = params.get("g_hat") if cfg.irt_model == "3pl" else None
        ll = lik.masked_loglik_total(logits, resp, mask, g_hat=g_hat)
    if cfg.map_prior:
        for v in params.values():
            ll = ll - 0.5 * jnp.square(v).sum()
    return -ll


def fit_mle(resp, mask, cfg: MLEConfig, key=None):
    """Returns (params, final_neg_log_posterior). resp/mask (N, M) arrays."""
    key = jax.random.key(cfg.seed) if key is None else key
    n, m = resp.shape
    params = init_point_params(key, n, m, cfg)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    resp = jnp.asarray(resp)
    mask = jnp.asarray(mask)

    @jax.jit
    def run(params, opt_state, resp, mask):
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(neg_log_posterior)(
                params, resp, mask, cfg)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=cfg.steps)
        return params, losses[-1]

    params, loss = run(params, opt_state, resp, mask)
    return params, float(loss)


def response_prob(params, cfg: MLEConfig):
    """(N, M) predicted probabilities from the point estimates (grm/gpcm:
    (N, M, C) category probabilities)."""
    item = {k: v for k, v in params.items() if k != "theta"}
    if cfg.irt_model in links.CATEGORICAL_MODELS:
        return jnp.exp(lik.categorical_logprob_all(
            cfg.irt_model, links.grm_base(params["theta"], item["a"]),
            links.categorical_table(cfg.irt_model, item["b"])))
    return links.response_prob(cfg.irt_model, params["theta"], item)
