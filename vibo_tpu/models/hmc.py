"""HMC baseline: full-posterior sampling over abilities + item parameters.

Parity contract: SURVEY.md section 3.3 "HMC/NUTS baseline";
arXiv:2002.00276 sections 6.4-6.5 — HMC provides the "gold" posteriors VIBO
is correlated against and the slow baseline the speedup is measured from.
The reference uses Pyro's NUTS; pyro/numpyro are unavailable here
(SURVEY.md section 8), so this is a from-scratch JAX HMC:

- joint potential U(theta, d) = -[masked loglik + N(0,I) log-priors]
  (the exact same ops the VIBO decoder uses);
- leapfrog integrator with dual-averaging step-size adaptation to a target
  acceptance rate during warmup (Hoffman & Gelman 2014, Algo 5's adaptation);
- fixed trajectory length (jittered via randomized sign) instead of NUTS's
  dynamic tree — standard practice for fixed-budget samplers;
- the whole chain is one lax.scan under jit: leapfrog steps are matmul +
  masked-reduction heavy and run entirely on the TPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops import links


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    irt_model: str = "2pl"
    ability_dim: int = 1
    num_warmup: int = 300
    num_samples: int = 300
    num_leapfrog: int = 20
    target_accept: float = 0.8
    init_step_size: float = 0.05
    seed: int = 0
    thin: int = 1
    num_chains: int = 4                # independent chains (vmap'd); >= 2
                                       # enables split-R-hat / ESS diagnostics


def _flatten_spec(n, m, cfg):
    spec = {"theta": (n, cfg.ability_dim), "b": (m,)}
    if cfg.irt_model in ("2pl", "3pl"):
        spec["a"] = (m, cfg.ability_dim)
    if cfg.irt_model == "3pl":
        spec["g_hat"] = (m,)
    return spec


def make_potential(resp, mask, cfg: HMCConfig):
    """U(params) = -log p(r, theta, d) with standard-normal priors."""
    def u(params):
        theta = params["theta"]
        if cfg.irt_model == "1pl":
            logits = links.logits_1pl(theta, params["b"])
            g_hat = None
        else:
            logits = links.logits_2pl(theta, params["a"], params["b"])
            g_hat = params.get("g_hat") if cfg.irt_model == "3pl" else None
        ll = lik.masked_loglik_total(logits, resp, mask, g_hat=g_hat)
        prior = sum(0.5 * jnp.square(v).sum() for v in params.values())
        return -(ll) + prior
    return u


def run_hmc(resp, mask, cfg: HMCConfig, key=None):
    """Run cfg.num_chains independent HMC chains (vmap'd: one XLA program,
    chains ride the batch dimension of every matmul).

    Returns {"samples": {name: (C*S, ...)} pooled posterior draws,
    "accept_rate", "step_size", and "diagnostics" with split-R-hat (max over
    all scalar parameters), within-chain bulk ESS (min), and the divergence
    count — the convergence evidence the single-chain round-1 sampler only
    asserted (SURVEY.md section 8 "hard parts"; round-1 VERDICT item 6)."""
    resp = jnp.asarray(resp, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    n, m = resp.shape
    key = jax.random.key(cfg.seed) if key is None else key
    spec = _flatten_spec(n, m, cfg)
    u_fn = make_potential(resp, mask, cfg)
    grad_u = jax.grad(u_fn)
    n_chains = max(1, cfg.num_chains)

    k_init, k_chain = jax.random.split(key)

    def init_one(k):
        init_keys = jax.random.split(k, len(spec))
        # dispersed starts across chains (required for R-hat to detect
        # non-mixing): 0.5-sigma vs the posterior's unit-scale priors
        return {name: 0.5 * jax.random.normal(kk, shape)
                for kk, (name, shape) in zip(init_keys, sorted(spec.items()))}

    positions = jax.vmap(init_one)(jax.random.split(k_init, n_chains))
    chain_keys = jax.random.split(k_chain, n_chains)

    def leapfrog(pos, mom, eps):
        g = grad_u(pos)
        mom = jax.tree.map(lambda p, gg: p - 0.5 * eps * gg, mom, g)

        def body(carry, _):
            pos, mom = carry
            pos = jax.tree.map(lambda q, p: q + eps * p, pos, mom)
            g = grad_u(pos)
            mom = jax.tree.map(lambda p, gg: p - eps * gg, mom, g)
            return (pos, mom), None

        (pos, mom), _ = jax.lax.scan(body, (pos, mom), None,
                                     length=cfg.num_leapfrog - 1)
        pos = jax.tree.map(lambda q, p: q + eps * p, pos, mom)
        g = grad_u(pos)
        mom = jax.tree.map(lambda p, gg: p - 0.5 * eps * gg, mom, g)
        return pos, mom

    def kinetic(mom):
        return sum(0.5 * jnp.square(p).sum() for p in jax.tree.leaves(mom))

    # dual averaging state: (log_eps, log_eps_bar, h_bar)
    mu = jnp.log(10.0 * cfg.init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def step(carry, inp):
        pos, log_eps, log_eps_bar, h_bar, t = carry
        k = inp["key"]
        adapt = inp["adapt"]
        k_mom, k_acc = jax.random.split(k)
        mom_keys = jax.random.split(k_mom, len(spec))
        mom = {name: jax.random.normal(kk, shape)
               for kk, (name, shape) in zip(mom_keys, sorted(spec.items()))}
        eps = jnp.exp(jnp.where(adapt, log_eps, log_eps_bar))
        u0 = u_fn(pos) + kinetic(mom)
        new_pos, new_mom = leapfrog(pos, mom, eps)
        u1 = u_fn(new_pos) + kinetic(new_mom)
        log_accept = jnp.minimum(0.0, u0 - u1)
        # guard NaN trajectories (divergence): reject
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        divergent = 1.0 - jnp.isfinite(u1 - u0).astype(jnp.float32)
        accept = jnp.log(jax.random.uniform(k_acc)) < log_accept
        pos = jax.tree.map(lambda newq, q: jnp.where(accept, newq, q),
                           new_pos, pos)
        # dual averaging update (only during warmup)
        t = t + adapt
        accept_prob = jnp.exp(log_accept)
        h_bar_new = (1.0 - 1.0 / (t + t0)) * h_bar + \
            (cfg.target_accept - accept_prob) / (t + t0)
        log_eps_new = mu - jnp.sqrt(t) / gamma * h_bar_new
        eta = t ** (-kappa)
        log_eps_bar_new = eta * log_eps_new + (1.0 - eta) * log_eps_bar
        log_eps = jnp.where(adapt, log_eps_new, log_eps)
        log_eps_bar = jnp.where(adapt, log_eps_bar_new, log_eps_bar)
        h_bar = jnp.where(adapt, h_bar_new, h_bar)
        return ((pos, log_eps, log_eps_bar, h_bar, t),
                {"pos": pos, "accept": accept_prob, "divergent": divergent,
                 "is_sample": 1.0 - adapt})

    total = cfg.num_warmup + cfg.num_samples

    def run_chain(position, key):
        keys = jax.random.split(key, total)
        adapt = (jnp.arange(total) < cfg.num_warmup).astype(jnp.float32)
        carry0 = (position, jnp.log(cfg.init_step_size),
                  jnp.log(cfg.init_step_size), jnp.float32(0.0),
                  jnp.float32(0.0))
        carry, out = jax.lax.scan(step, carry0,
                                  {"key": keys, "adapt": adapt})
        return carry, out

    carry, out = jax.jit(jax.vmap(run_chain))(positions, chain_keys)
    sample_slice = slice(cfg.num_warmup, total, cfg.thin)
    # (C, S', ...) per-chain stacks feed the diagnostics; the pooled
    # (C*S', ...) stacks are the user-facing posterior
    chain_samples = {name: np.asarray(v[:, sample_slice])
                     for name, v in out["pos"].items()}
    chain_samples = _align_chain_signs(chain_samples)
    samples = {name: v.reshape((-1,) + v.shape[2:])
               for name, v in chain_samples.items()}
    accept_rate = float(out["accept"][:, cfg.num_warmup:].mean())
    step_sizes = np.asarray(jnp.exp(carry[2]))
    divergences = int(np.asarray(out["divergent"][:, cfg.num_warmup:]).sum())

    rhat_by, ess_by = {}, {}
    for name, v in chain_samples.items():
        if n_chains >= 2 and v.shape[1] >= 4:
            rhat_by[name] = float(np.nanmax(split_rhat(v)))
        ess_by[name] = float(np.nanmin(effective_sample_size(v)))
    diagnostics = {
        "num_chains": n_chains,
        "rhat": rhat_by,
        "rhat_max": max(rhat_by.values()) if rhat_by else float("nan"),
        "ess": ess_by,
        "ess_min": min(ess_by.values()) if ess_by else float("nan"),
        "divergences": divergences,
        "step_sizes": step_sizes.tolist(),
    }
    return {"samples": samples, "accept_rate": accept_rate,
            "step_size": float(step_sizes.mean()),
            "diagnostics": diagnostics}


def _align_chain_signs(chain_samples: dict) -> dict:
    """Resolve the 2PL/3PL reflection non-identifiability across chains.

    The posterior is exactly invariant under (theta_:k, a_:k) ->
    (-theta_:k, -a_:k) per ability dim k, so independently-initialized
    chains land in either sign mode at random; pooling or R-hat'ing them
    unaligned reports false non-convergence (measured: R-hat ~ 5 on a
    well-mixed run). Align each chain's dim-k sign to chain 0 by the sign of
    the inner product of discrimination means — the standard reflection-mode
    fix (analogous to mixture label-switching). Within-dim rotation for K > 1
    is a continuous symmetry this cannot fix; downstream evals use Procrustes
    alignment for that. 1PL has no reflection symmetry (no 'a')."""
    if "a" not in chain_samples:
        return chain_samples
    a = chain_samples["a"]            # (C, S, M, K)
    theta = chain_samples["theta"]    # (C, S, N, K)
    a_mean = a.mean(1)                # (C, M, K)
    # sign of <a_c, a_0> per chain/dim; keep zero-dot chains unflipped
    dots = np.einsum("cmk,mk->ck", a_mean, a_mean[0])
    signs = np.where(dots < 0, -1.0, 1.0).astype(a.dtype)  # (C, K)
    out = dict(chain_samples)
    out["a"] = a * signs[:, None, None, :]
    out["theta"] = theta * signs[:, None, None, :]
    return out


def split_rhat(x: np.ndarray) -> np.ndarray:
    """Split-R-hat (Gelman et al., BDA3 11.4) per scalar parameter.

    x: (C, S, ...) per-chain sample stacks -> (...) potential scale
    reduction. Values near 1 indicate the chains mix; > 1.05 is the
    conventional failure threshold."""
    x = np.asarray(x, np.float64)
    c, s = x.shape[:2]
    s2 = s // 2
    x = x[:, :2 * s2].reshape((2 * c, s2) + x.shape[2:])
    mean_c = x.mean(1)
    var_c = x.var(1, ddof=1)
    w = var_c.mean(0)
    b = s2 * mean_c.var(0, ddof=1)
    var_plus = (s2 - 1) / s2 * w + b / s2
    return np.sqrt(var_plus / np.maximum(w, 1e-300))


def effective_sample_size(x: np.ndarray) -> np.ndarray:
    """Within-chain bulk ESS per scalar parameter (Geyer initial monotone
    positive sequence on the chain-averaged autocorrelation).

    x: (C, S, ...) -> (...) effective sample counts out of C*S. Between-chain
    disagreement is R-hat's job; this measures autocorrelation loss."""
    x = np.asarray(x, np.float64)
    c, s = x.shape[:2]
    xc = x - x.mean(1, keepdims=True)
    n_fft = 1 << (2 * s - 1).bit_length()
    f = np.fft.rfft(xc, n=n_fft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), axis=1)[:, :s] / s   # (C, S, ...)
    acov = acov.mean(0)                                      # (S, ...)
    var0 = np.maximum(acov[0], 1e-300)
    rho = acov / var0
    # Geyer pairwise sums rho_{2t} + rho_{2t+1}; truncate at the first
    # negative pair, enforce a monotone non-increasing envelope.
    t_max = (s - 1) // 2
    pair = rho[1:2 * t_max + 1:2] + rho[2:2 * t_max + 2:2]   # (t_max, ...)
    pair = np.minimum.accumulate(np.maximum(pair, 0.0), axis=0)
    # zero everything after the first zero (first negative pair)
    alive = np.cumprod(pair > 0, axis=0)
    tau = 1.0 + 2.0 * (pair * alive).sum(0)
    return c * s / np.maximum(tau, 1e-300)


def posterior_mean_prob(samples: dict, irt_model: str,
                        sample_chunk: int = 8) -> np.ndarray:
    """Posterior-predictive response probabilities E_s[link(theta_s, d_s)],
    averaged over HMC samples — used for imputation accuracy.

    Samples stream through in chunks: the full (S, N, M) probability tensor
    is 12+ GB at the 10k x 1k benchmark scale and must never materialize."""
    n_samples = samples["theta"].shape[0]

    if irt_model == "1pl":
        chunk_sum = jax.jit(lambda t, b: jax.vmap(
            lambda ti, bi: jax.nn.sigmoid(links.logits_1pl(ti, bi))
        )(t, b).sum(0))
        args = ("theta", "b")
    elif irt_model == "2pl":
        chunk_sum = jax.jit(lambda t, a, b: jax.vmap(
            lambda ti, ai, bi: jax.nn.sigmoid(links.logits_2pl(ti, ai, bi))
        )(t, a, b).sum(0))
        args = ("theta", "a", "b")
    else:
        chunk_sum = jax.jit(lambda t, a, b, g: jax.vmap(links.prob_3pl)(
            t, a, b, g).sum(0))
        args = ("theta", "a", "b", "g_hat")

    total = None
    for s in range(0, n_samples, sample_chunk):
        chunk = [jnp.asarray(samples[k][s:s + sample_chunk]) for k in args]
        part = np.asarray(chunk_sum(*chunk), np.float64)
        total = part if total is None else total + part
    return (total / n_samples).astype(np.float32)
