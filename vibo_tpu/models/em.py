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
  log-likelihood over (a, b) [, g for 3PL] given node occupancy/success
  sufficient statistics — a handful of Newton steps vmapped over items.

Everything jits; one EM iteration is a single XLA program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EMConfig:
    irt_model: str = "2pl"         # 1pl | 2pl (3pl via g estimation is fragile; 1pl/2pl match the paper's table)
    num_quadrature: int = 61
    max_iters: int = 100
    newton_steps: int = 8
    tol: float = 1e-4              # relative marginal-loglik change
    seed: int = 0


def gauss_hermite_nodes(q: int):
    """Nodes/weights for integrating against the standard normal density."""
    x, w = np.polynomial.hermite_e.hermegauss(q)  # probabilists' Hermite
    w = w / w.sum()
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def _item_logits(nodes, a, b):
    """(Q,) nodes x (M,) items -> (Q, M) logits a_j * theta_q - b_j."""
    return nodes[:, None] * a[None, :] - b[None, :]


def e_step(resp, mask, nodes, log_w, a, b):
    """Posterior node weights (N, Q) and the marginal log-lik (scalar)."""
    logits = _item_logits(nodes, a, b)                     # (Q, M)
    log_p = -jax.nn.softplus(-logits)                      # log sigmoid
    log_1mp = -jax.nn.softplus(logits)
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


def fit_em(resp, mask, cfg: EMConfig):
    """Run EM to convergence. Returns dict with a, b, theta_eap, log_marginal,
    iterations."""
    if cfg.irt_model not in ("1pl", "2pl"):
        raise ValueError(
            "EM baseline supports irt_model in {'1pl', '2pl'} — classical\n"
            "MML guess-parameter estimation is unstable (SURVEY.md section 8)\n"
            "and the paper's EM comparisons are 1PL/2PL")
    resp = jnp.asarray(resp, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    m = resp.shape[1]
    nodes, w = gauss_hermite_nodes(cfg.num_quadrature)
    log_w = jnp.log(w)
    estimate_a = cfg.irt_model != "1pl"
    a0 = jnp.ones((m,), jnp.float32)
    # moment-matched init for b: logit of item p-value
    pval = ((resp * mask).sum(0) + 0.5) / (mask.sum(0) + 1.0)
    b0 = -jnp.log(pval / (1.0 - pval))

    @jax.jit
    def iterate(a, b, resp, mask):
        post, ll = e_step(resp, mask, nodes, log_w, a, b)
        a2, b2 = m_step(resp, mask, post, nodes, a, b,
                        cfg.newton_steps, estimate_a)
        return a2, b2, ll

    a, b = a0, b0
    prev = -np.inf
    iters = 0
    for it in range(cfg.max_iters):
        a, b, ll = iterate(a, b, resp, mask)
        ll = float(ll)
        iters = it + 1
        if abs(ll - prev) < cfg.tol * abs(prev):
            break
        prev = ll
    post, ll = jax.jit(e_step, static_argnums=())(resp, mask, nodes, log_w, a, b)
    theta_eap = post @ nodes                      # (N,) EAP abilities
    return {"a": np.asarray(a), "b": np.asarray(b),
            "theta_eap": np.asarray(theta_eap),
            "log_marginal": float(ll), "iterations": iters,
            "posterior_node_weights": np.asarray(post)}


def response_prob(result, nodes=None):
    """(N, M) posterior-predictive response probabilities from an EM fit:
    E_q[sigmoid(a theta - b)] under each person's node posterior."""
    q = result["posterior_node_weights"].shape[1]
    nodes_arr, _ = gauss_hermite_nodes(q)
    logits = _item_logits(nodes_arr, jnp.asarray(result["a"]),
                          jnp.asarray(result["b"]))          # (Q, M)
    p = jax.nn.sigmoid(logits)
    return np.asarray(jnp.asarray(result["posterior_node_weights"]) @ p)
