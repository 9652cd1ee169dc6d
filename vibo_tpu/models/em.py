"""EM baseline: classical marginal-maximum-likelihood IRT estimation.

Parity contract: SURVEY.md section 3.3 "EM baseline"; arXiv:2002.00276
section 6 compares VIBO against the psychometrics-standard MML/EM method
(as in the R `mirt` package). Restricted to ability_dim=1 like classical IRT
(SURVEY.md section 8 "hard parts": product quadrature grids blow up for K>1).

Algorithm (Bock & Aitkin 1981):
- E-step: Gauss-Hermite quadrature over theta ~ N(0,1). Per-person posterior
  weights over the Q nodes come from two (N,M)x(M,Q) matmuls of the masked
  response matrix against per-node item log-probabilities — pure MXU work.
- M-step: per item, maximize the expected complete-data Bernoulli
  log-likelihood over (a, b) — Newton on the observed information — or, for
  3PL, over (a, b, g~) by Fisher scoring with a MAP prior on the guess
  logit g~ ~ N(-1.5, 1) matching the simulator/model family (the classical
  BILOG-style stabilization: the guessing parameter is weakly identified
  and unregularized MML drifts; SURVEY.md section 3.3 "EM baseline",
  round-1 VERDICT item 10). All items update in parallel (vmapped 3x3
  solves on TPU).

EM iterations run on-device in lax.scan chunks; the host only fetches one
scalar per chunk to test convergence (round-1 advisor: the per-iteration
host fetch contradicted the no-host-dispatch discipline).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EMConfig:
    irt_model: str = "2pl"         # 1pl | 2pl | 3pl
    num_quadrature: int = 61
    max_iters: int = 100
    newton_steps: int = 8
    tol: float = 1e-4              # relative marginal-loglik change
    seed: int = 0
    host_chunk: int = 5            # EM iterations per device dispatch
    g_prior_mean: float = -1.5     # MAP prior on the 3PL guess logit
    g_prior_var: float = 1.0


def gauss_hermite_nodes(q: int):
    """Nodes/weights for integrating against the standard normal density."""
    x, w = np.polynomial.hermite_e.hermegauss(q)  # probabilists' Hermite
    w = w / w.sum()
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def _item_logits(nodes, a, b):
    """(Q,) nodes x (M,) items -> (Q, M) logits a_j * theta_q - b_j."""
    return nodes[:, None] * a[None, :] - b[None, :]


def _item_prob(nodes, a, b, g_hat=None):
    """(Q, M) response probability per node/item; 3PL when g_hat given."""
    s = jax.nn.sigmoid(_item_logits(nodes, a, b))
    if g_hat is None:
        return s
    g = jax.nn.sigmoid(g_hat)[None, :]
    return g + (1.0 - g) * s


def e_step(resp, mask, nodes, log_w, a, b, g_hat=None):
    """Posterior node weights (N, Q) and the marginal log-lik (scalar)."""
    if g_hat is None:
        logits = _item_logits(nodes, a, b)                 # (Q, M)
        log_p = -jax.nn.softplus(-logits)                  # log sigmoid
        log_1mp = -jax.nn.softplus(logits)
    else:
        p = jnp.clip(_item_prob(nodes, a, b, g_hat), 1e-6, 1.0 - 1e-6)
        log_p = jnp.log(p)
        log_1mp = jnp.log1p(-p)
    # (N, M) @ (M, Q): masked response/non-response against node log-probs
    ll_nq = (resp * mask) @ log_p.T + ((1.0 - resp) * mask) @ log_1mp.T
    log_joint = ll_nq + log_w[None, :]                     # + prior weights
    log_marg = jax.scipy.special.logsumexp(log_joint, axis=1)   # (N,)
    post = jnp.exp(log_joint - log_marg[:, None])          # (N, Q)
    return post, log_marg.sum()


def m_step(resp, mask, post, nodes, a, b, newton_steps, estimate_a):
    """Per-item Newton updates for (a, b) on expected complete-data loglik.

    Sufficient stats per item j, node q:
      n_qj = sum_i post_iq * mask_ij      (expected attempts at node q)
      s_qj = sum_i post_iq * mask_ij * r_ij  (expected successes)
    Expected loglik_j(a,b) = sum_q s_qj log sig(a x_q - b) +
                             (n_qj - s_qj) log(1 - sig(...)).
    """
    n_qj = post.T @ mask                  # (Q, M)
    s_qj = post.T @ (resp * mask)         # (Q, M)

    # Newton ascent on the expected loglik: x += H^{-1} grad, H the (positive
    # definite) observed information. grad_a = sum_q x_q*err, grad_b = -sum err.
    def newton_clean(carry, _):
        a, b = carry
        logits = _item_logits(nodes, a, b)
        p = jax.nn.sigmoid(logits)
        w = n_qj * p * (1.0 - p)
        err = s_qj - n_qj * p
        x = nodes[:, None]
        grad_a = (x * err).sum(0)
        grad_b = -err.sum(0)
        h_aa = (x * x * w).sum(0) + 1e-6
        h_bb = w.sum(0) + 1e-6
        h_ab = -(x * w).sum(0)
        if estimate_a:
            det = h_aa * h_bb - h_ab * h_ab
            da = (h_bb * grad_a - h_ab * grad_b) / det
            db = (-h_ab * grad_a + h_aa * grad_b) / det
            a = jnp.clip(a + da, 0.05, 10.0)
            b = b + db
        else:
            b = b + grad_b / h_bb
        return (a, b), None

    (a, b), _ = jax.lax.scan(newton_clean, (a, b), None, length=newton_steps)
    return a, b


def m_step_3pl(resp, mask, post, nodes, a, b, g_hat, newton_steps,
               g_prior_mean, g_prior_var):
    """Per-item Fisher-scoring updates for (a, b, g~) with a MAP prior on g~.

    Fisher information I = sum_q n_qj (dp/dtheta)(dp/dtheta)^T / (p(1-p))
    is PSD by construction (Newton's observed information is not, for 3PL);
    the g~ prior adds 1/var to its diagonal. 3x3 solves vmap over items.
    """
    n_qj = post.T @ mask
    s_qj = post.T @ (resp * mask)
    x = nodes[:, None]

    def scoring(carry, _):
        a, b, g_hat = carry
        sig = jax.nn.sigmoid(_item_logits(nodes, a, b))      # (Q, M)
        g = jax.nn.sigmoid(g_hat)[None, :]
        p = jnp.clip(g + (1.0 - g) * sig, 1e-6, 1.0 - 1e-6)
        pq = p * (1.0 - p)
        err = (s_qj - n_qj * p) / pq                         # dLL/dp weights
        dp_dl = (1.0 - g) * sig * (1.0 - sig)                # p wrt logit
        dp_dg = (1.0 - sig) * (g * (1.0 - g))                # p wrt g~
        grad = jnp.stack([
            (x * err * dp_dl).sum(0),                        # a
            -(err * dp_dl).sum(0),                           # b
            (err * dp_dg).sum(0)                             # g~
            - (g_hat - g_prior_mean) / g_prior_var,
        ], axis=-1)                                          # (M, 3)
        w = n_qj / pq
        da = jnp.stack([x * dp_dl, -dp_dl, dp_dg], axis=-1)  # (Q, M, 3)
        fisher = jnp.einsum("qm,qmi,qmj->mij", w, da, da)
        fisher = fisher + jnp.diag(jnp.asarray([1e-3, 1e-3, 1e-3
                                                + 1.0 / g_prior_var]))
        step = jnp.linalg.solve(fisher, grad[..., None])[..., 0]   # (M, 3)
        a = jnp.clip(a + step[:, 0], 0.05, 10.0)
        b = b + step[:, 1]
        g_hat = jnp.clip(g_hat + step[:, 2], -6.0, 1.0)
        return (a, b, g_hat), None

    (a, b, g_hat), _ = jax.lax.scan(scoring, (a, b, g_hat), None,
                                    length=newton_steps)
    return a, b, g_hat


def fit_em(resp, mask, cfg: EMConfig):
    """Run EM to convergence. Returns dict with a, b [, g_hat], theta_eap,
    log_marginal, iterations."""
    if cfg.irt_model not in ("1pl", "2pl", "3pl"):
        raise ValueError("EM baseline supports irt_model in {'1pl','2pl','3pl'}")
    resp = jnp.asarray(resp, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    m = resp.shape[1]
    nodes, w = gauss_hermite_nodes(cfg.num_quadrature)
    log_w = jnp.log(w)
    is_3pl = cfg.irt_model == "3pl"
    estimate_a = cfg.irt_model != "1pl"
    a0 = jnp.ones((m,), jnp.float32)
    # moment-matched init for b: logit of item p-value
    pval = ((resp * mask).sum(0) + 0.5) / (mask.sum(0) + 1.0)
    b0 = -jnp.log(pval / (1.0 - pval))
    g0 = jnp.full((m,), cfg.g_prior_mean, jnp.float32) if is_3pl else None

    def one_iter(params):
        a, b, g_hat = params
        post, ll = e_step(resp, mask, nodes, log_w, a, b, g_hat)
        if is_3pl:
            a2, b2, g2 = m_step_3pl(resp, mask, post, nodes, a, b, g_hat,
                                    cfg.newton_steps, cfg.g_prior_mean,
                                    cfg.g_prior_var)
        else:
            a2, b2 = m_step(resp, mask, post, nodes, a, b,
                            cfg.newton_steps, estimate_a)
            g2 = g_hat
        return (a2, b2, g2), ll

    chunk = max(1, min(cfg.host_chunk, cfg.max_iters))

    @jax.jit
    def run_chunk(params):
        # `chunk` EM iterations in one dispatch; the host reads only the
        # per-iteration marginal logliks to test convergence between chunks
        def body(carry, _):
            params = carry
            params, ll = one_iter(params)
            return params, ll
        params, lls = jax.lax.scan(body, params, None, length=chunk)
        return params, lls

    @jax.jit
    def final_e_step(params):
        a, b, g_hat = params
        return e_step(resp, mask, nodes, log_w, a, b, g_hat)

    params = (a0, b0, g0)
    prev = -np.inf
    iters = 0
    done = False
    while iters < cfg.max_iters and not done:
        params, lls = run_chunk(params)
        lls = np.asarray(lls)   # ONE host fetch per chunk
        for ll in lls:
            iters += 1
            if abs(ll - prev) < cfg.tol * abs(prev):
                done = True
                break
            prev = float(ll)
    a, b, g_hat = params
    post, ll = final_e_step(params)
    theta_eap = post @ nodes                      # (N,) EAP abilities
    out = {"a": np.asarray(a), "b": np.asarray(b),
           "theta_eap": np.asarray(theta_eap),
           "log_marginal": float(ll), "iterations": iters,
           "posterior_node_weights": np.asarray(post)}
    if is_3pl:
        out["g_hat"] = np.asarray(g_hat)
    return out


def response_prob(result, nodes=None):
    """(N, M) posterior-predictive response probabilities from an EM fit:
    E_q[p(r=1 | theta_q, item)] under each person's node posterior."""
    q = result["posterior_node_weights"].shape[1]
    nodes_arr, _ = gauss_hermite_nodes(q)
    p = _item_prob(nodes_arr, jnp.asarray(result["a"]),
                   jnp.asarray(result["b"]),
                   jnp.asarray(result["g_hat"]) if "g_hat" in result else None)
    return np.asarray(jnp.asarray(result["posterior_node_weights"]) @ p)
