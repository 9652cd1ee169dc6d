"""VIBO: amortized variational inference for IRT (the framework's flagship).

Generative model (arXiv:2002.00276 section 3; SURVEY.md section 3.4):
  theta_i ~ N(0, I_K);  item d_j ~ N(0, I);  r_ij ~ Bernoulli(link(theta_i, d_j))
  for observed cells (i, j) only.

Structured posterior (section 4):
  q(theta, d | r) = q(d | r) * prod_i q(theta_i | d, r_i)
  - q(d | r): per-item diagonal Gaussians (networks.init_item_posterior);
  - q(theta_i | d, r_i): amortized MLP encoder on the person's masked response
    row, conditioned on a sampled d (conditional_posterior=True) or not
    (the mean-field ablation).

Objectives: reparameterized ELBO with analytic Gaussian KLs (item KL scaled
by batch/N under person minibatching) and the IWAE-S bound for test
log-likelihood — both assembled from vibo_tpu.ops.

TPU design: every method is a pure function of (params, arrays, key) under a
static, hashable config — jit/vmap/pjit compose directly. MC/IWAE samples run
under vmap (SURVEY.md section 3.2, "MC-sample parallel"). The masked
Bernoulli reduction dispatches to the fused Pallas kernel on TPU for linear
links (use_pallas=True).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vibo_tpu.models import networks
from vibo_tpu.ops import distributions as dist
from vibo_tpu.ops import likelihood as lik
from vibo_tpu.ops import links, objectives


def _mc_mean(one_sample, key: jax.Array, num_samples: int):
    """Tuple-of-scalars mean over num_samples MC draws of one_sample(key_s).

    S == 1 skips vmap entirely: the batched (1, B, K) intermediates
    otherwise force minor-axis relayout copies on TPU (profiled ~24 us/step
    at 10k x 1k on v5e). Numerics are identical — same per-sample keys."""
    keys = jax.random.split(key, num_samples)
    if num_samples == 1:
        return one_sample(keys[0])
    outs = jax.vmap(one_sample)(keys)
    return jax.tree.map(lambda x: x.mean(0), outs)


def _mc_stack(one_sample, keys: jax.Array):
    """(S, ...) stack of one_sample over per-sample keys; S == 1 without
    vmap (see _mc_mean)."""
    if keys.shape[0] == 1:
        out = one_sample(keys[0])
        return jax.tree.map(lambda x: jnp.expand_dims(x, 0), out)
    return jax.vmap(one_sample)(keys)


def _mc_eps(one_sample, item_eps: dict, theta_eps: jax.Array):
    """Like _mc_stack for exogenous-noise sampling: vmap over the leading
    sample axis of the eps arrays, skipped when S == 1."""
    if theta_eps.shape[0] == 1:
        out = one_sample(jax.tree.map(lambda x: x[0], item_eps),
                         theta_eps[0])
        return jax.tree.map(lambda x: jnp.expand_dims(x, 0), out)
    return jax.vmap(one_sample)(item_eps, theta_eps)


@dataclasses.dataclass(frozen=True)
class VIBOConfig:
    num_items: int
    irt_model: str = "2pl"              # 1pl | 2pl | 3pl | grm | gpcm | deep
    num_categories: int = 2             # grm/gpcm: ordinal categories C >= 3
                                        # (responses in {0..C-1}; binary
                                        # links require the default 2). The
                                        # packed int8 code and the eval
                                        # uint8 bit-code carry categories up
                                        # to C = 32.
    ability_dim: int = 1
    hidden_dim: int = 256               # ability-encoder width
    conditional_posterior: bool = True  # q(theta | d, r) vs mean-field q(theta | r)
    condition_on: str = "sample"        # conditional-posterior input:
                                        # "sample" = the per-MC-sample item
                                        # draw (classic VIBO, arXiv:2002.00276
                                        # section 4); "mean" = the item-
                                        # posterior means — deterministic
                                        # given data, so the encoder input
                                        # carries no item-sampling noise AND
                                        # training matches the eval/serving
                                        # path (which always conditioned on
                                        # means); "stats" = the item draw's
                                        # SUFFICIENT interaction statistics
                                        # (networks.condition_stat_mats):
                                        # keeps the paper's q(theta|d,r)
                                        # factorization but collapses the
                                        # encoder's item pathway from
                                        # M*(K+1) inputs (~5,120 at the K=4
                                        # flagship — measured to entrain a
                                        # collapsed basin, RESULTS.md) to
                                        # ~25, entering as a modulation of
                                        # the first-layer weights so every
                                        # fused/sharded path runs unchanged.
                                        # Ignored under mean-field.
    theta_posterior: str = "diag"       # ability-posterior covariance family:
                                        # "diag" = independent per-dim
                                        # Gaussians (the reference family);
                                        # "chol" = full covariance via a
                                        # Cholesky factor — the encoder head
                                        # grows K(K-1)/2 strict-lower outputs
                                        # (ops.distributions tril_*). Built
                                        # because the mean-field family's
                                        # per-person posterior WIDTHS
                                        # correlate only 0.26 with the
                                        # converged K=4 HMC gold (RESULTS.md)
                                        # while its means hit 0.99; K>1 IRT
                                        # posteriors are correlated across
                                        # ability dims and a diagonal q
                                        # cannot express that. No-op at K=1.
                                        # "laplace" = LAPLACE-ANCHORED full
                                        # covariance: the head predicts only
                                        # a per-dim log correction c to the
                                        # closed-form Fisher structure,
                                        # cov = (I + D S D)^-1 with
                                        # S_i = sum_j m_ij a_j a_j^T from
                                        # the item-posterior means and
                                        # D = diag(exp(c/2)) — the
                                        # information the data already
                                        # determines does the heavy lifting
                                        # (the from-scratch chol head
                                        # topped out at sd-corr 0.62-0.64
                                        # vs the K=4 gold while the
                                        # closed-form Laplace width sits at
                                        # 0.93; ops.distributions.
                                        # laplace_anchor_parts). Linear
                                        # links only; head width == diag.
                                        # "laplace-w" additionally weights
                                        # each item's rank-1 term by the
                                        # EXPECTED FISHER WEIGHT at the
                                        # head's own mean (w = p(1-p) etc.)
                                        # — c = 0 then IS the closed-form
                                        # Laplace covariance, and the head
                                        # learns only the curvature-vs-
                                        # spread residual. One extra (B, M)
                                        # predictor matmul per encode.
    item_latent_dim: int = 16           # deep link only
    deep_hidden_dim: int = 128          # deep link MLP width
    item_encoder: bool = False          # amortize q(d_j | r_:,j) from column
                                        # statistics (new-item cold-start)
                                        # instead of free per-item Gaussians
    item_encoder_hidden: int = 64       # item-encoder MLP width
    use_pallas: bool = False            # fused masked-ELBO kernel (linear links)
    compute_dtype: str = "float32"      # "bfloat16" runs encoder matmuls on
                                        # the MXU natively (f32 accumulate)
    deep_fused_kernel: bool = False     # opt-in fused Pallas deep kernel
                                        # (see VIBO._use_packed_kernel)
    deep_item_chunk: int = 256          # deep link: stream item blocks of this
                                        # size (remat) instead of B x M x H
                                        # (0 disables; 256 + bf16 measured
                                        # 4.4x faster than unchunked f32 at
                                        # 10k x 1k on v5e)

    def __post_init__(self):
        if self.irt_model not in links.IRT_MODELS:
            raise ValueError(f"irt_model must be one of {links.IRT_MODELS}")
        if self.condition_on not in ("sample", "mean", "stats"):
            raise ValueError(
                f"condition_on must be 'sample', 'mean' or 'stats', "
                f"got {self.condition_on!r}")
        if self.theta_posterior not in ("diag", "chol", "laplace",
                                        "laplace-w"):
            raise ValueError(
                f"theta_posterior must be 'diag', 'chol', 'laplace' or "
                f"'laplace-w', got {self.theta_posterior!r}")
        if self.theta_posterior.startswith("laplace"):
            if self.irt_model == "deep":
                raise ValueError(
                    "theta_posterior='laplace' anchors on the linear-link "
                    "Fisher pair statistics sum_j m_ij a_j a_j^T; the deep "
                    "link has no per-item loading vector (its Gauss-Newton "
                    "width lives in evaluation.laplace_sigma_deep)")
            if self.item_encoder:
                raise ValueError(
                    "theta_posterior='laplace' + item_encoder is not "
                    "supported: the anchor uses the item-posterior means, "
                    "which under the amortized item encoder depend on "
                    "global column statistics the sharded encode paths "
                    "would have to re-psum (use the free-form item "
                    "posterior, or theta_posterior='chol')")
        if self.irt_model in links.CATEGORICAL_MODELS:
            if not 3 <= self.num_categories <= 32:
                raise ValueError(
                    f"{self.irt_model} needs num_categories in [3, 32] "
                    f"(2 categories IS the 2pl model), "
                    f"got {self.num_categories}")
        elif self.num_categories != 2:
            raise ValueError(
                f"num_categories={self.num_categories} only applies to the "
                f"polytomous families {links.CATEGORICAL_MODELS} (binary "
                f"links are 2-category)")


class VIBO:
    """Pure-functional VIBO model; `cfg` is static, params are a pytree."""

    def __init__(self, cfg: VIBOConfig):
        self.cfg = cfg
        if not cfg.conditional_posterior:
            self._item_feat_dim = 0
        elif cfg.condition_on == "stats":
            self._item_feat_dim = sum(networks.condition_stat_dim(
                cfg.irt_model, cfg.ability_dim, cfg.item_latent_dim))
        else:
            self._item_feat_dim = networks.item_feat_dim(
                cfg.num_items, cfg.irt_model, cfg.ability_dim,
                cfg.item_latent_dim, cfg.num_categories)
        self._head_spec = networks.item_head_spec(
            cfg.irt_model, cfg.ability_dim, cfg.item_latent_dim,
            cfg.num_categories)
        # ability_dim passed to the encoder-head split iff the head carries
        # Cholesky outputs; None keeps the diagonal family's historical
        # halve-in-two contract (networks.split_ability_head)
        self._chol = cfg.theta_posterior == "chol" and cfg.ability_dim > 1
        self._enc_k = cfg.ability_dim if self._chol else None
        # laplace families: the head is DIAG-SHAPED (mu, c halves; _enc_k
        # None) — the full-covariance Cholesky comes from the Fisher anchor
        # (_anchor_theta_head), not from head outputs. laplace-w
        # additionally weights each item's rank-1 term by the expected
        # Fisher weight at the head's own mean.
        self._laplace = cfg.theta_posterior.startswith("laplace")
        self._laplace_weighted = cfg.theta_posterior == "laplace-w"

    # ------------------------------------------------------------- params

    def init_params(self, key: jax.Array) -> dict:
        cfg = self.cfg
        k_item, k_enc, k_deep = jax.random.split(key, 3)
        params = {
            "encoder": networks.init_ability_encoder(
                k_enc, cfg.num_items, self._item_feat_dim, cfg.ability_dim,
                cfg.hidden_dim, chol=self._chol),
        }
        if self._laplace and not self._laplace_weighted:
            # start the anchored information near the Bernoulli Fisher
            # weight's typical scale (w = p(1-p) averages ~0.15 under the
            # N(0, I) generative story; w <= 1/4 always) instead of the
            # c = 0 worst case — the head's c-block bias is the last K
            # outputs of the final layer. laplace-w keeps c = 0: its
            # statistic already carries the exact weights, so zero
            # correction IS the closed-form Laplace covariance.
            head = params["encoder"][-1]
            b = head["b"]
            k = cfg.ability_dim
            params["encoder"][-1] = {
                "w": head["w"],
                "b": jnp.concatenate([b[:k], b[k:] + jnp.log(0.15)]),
            }
        if cfg.item_encoder:
            k_mlp, k_res = jax.random.split(k_item)
            params["item_enc"] = networks.init_item_encoder(
                k_mlp, cfg.irt_model, cfg.ability_dim, cfg.item_latent_dim,
                cfg.item_encoder_hidden, cfg.num_categories)
            params["item_resid"] = networks.init_item_residual(
                k_res, cfg.num_items, cfg.irt_model, cfg.ability_dim,
                cfg.item_latent_dim, cfg.num_categories)
        else:
            params["item_post"] = networks.init_item_posterior(
                k_item, cfg.num_items, cfg.irt_model, cfg.ability_dim,
                cfg.item_latent_dim, cfg.num_categories)
        if cfg.irt_model == "deep":
            params["deep_link"] = networks.init_deep_link(
                k_deep, cfg.ability_dim, cfg.item_latent_dim, cfg.deep_hidden_dim)
        return params

    # ------------------------------------------------------ item posterior

    def item_dist(self, params: dict, response=None, mask=None,
                  axis_name: str | None = None, new_items: bool = False
                  ) -> dict:
        """The item posterior q(d | r) as {name: {'mu','logvar': (M, D)}}.

        Free-form (default): the per-item Gaussian parameters stored in
        `params` — data-independent, one posterior per TRAINING item.
        Amortized (cfg.item_encoder): semi-amortized — a shared encoder on
        the response columns' statistics (networks.item_stats) plus free
        per-item residuals for the training items (see
        networks.init_item_residual for why the residuals are required).
        The posterior is deterministic given (params, data), so callers
        compute it ONCE per objective and hoist it out of the MC-sample vmap.

        axis_name: under shard_map with students sharded, name of the mesh
        axis to psum the column statistics over (global, device-count-
        invariant stats).
        new_items: columns are items the model was NOT trained on — no
        residuals exist, so the shared encoder alone scores them
        (cold-start; any column count is accepted).
        """
        if not self.cfg.item_encoder:
            return params["item_post"]
        if response is None or mask is None:
            raise ValueError(
                "item_encoder=True amortizes q(d | r) from data: pass the "
                "(response, mask) the posterior should condition on")
        stats = networks.item_stats(response, mask, axis_name=axis_name)
        residual = None if new_items else params["item_resid"]
        return networks.apply_item_encoder(params["item_enc"], stats,
                                           self._head_spec, residual)

    def sample_items_from(self, post: dict, key: jax.Array) -> dict:
        """One reparameterized draw from an item_dist. Returns {name: (M, D)}."""
        keys = jax.random.split(key, len(post))
        return {name: dist.reparameterize(k, post[name]["mu"], post[name]["logvar"])
                for k, name in zip(keys, sorted(post))}

    def item_kl_from(self, post: dict) -> jax.Array:
        """Analytic sum_j KL(q(d_j) || N(0, I)) over all items and params."""
        return sum(dist.kl_standard_normal(p["mu"], p["logvar"]).sum()
                   for p in post.values())

    def item_log_ratio_from(self, post: dict, sample: dict) -> jax.Array:
        """log p(d_s) - log q(d_s) for an item sample (IWAE weights)."""
        total = 0.0
        for name, p in post.items():
            z = sample[name]
            total = total + (dist.standard_normal_log_prob(z).sum()
                             - dist.gaussian_log_prob(z, p["mu"], p["logvar"]).sum())
        return total

    # Data-free convenience forms (free-form posterior only; the amortized
    # posterior needs data — use item_dist + the *_from methods).

    def sample_items(self, params: dict, key: jax.Array) -> dict:
        return self.sample_items_from(self.item_dist(params), key)

    def item_kl(self, params: dict) -> jax.Array:
        return self.item_kl_from(self.item_dist(params))

    def item_log_ratio(self, params: dict, sample: dict) -> jax.Array:
        return self.item_log_ratio_from(self.item_dist(params), sample)

    def item_posterior_mean(self, params: dict, response=None, mask=None) -> dict:
        post = self.item_dist(params, response, mask)
        return {name: p["mu"] for name, p in post.items()}

    def _encoder_conditioning(self, post: dict, item_sample: dict | None):
        """What q(theta | r, .) conditions on: the per-MC-sample item draw
        (condition_on="sample", classic VIBO), the item-posterior MEANS
        (condition_on="mean" — deterministic given data, so the encoder
        input carries no item-sampling noise; measured decisive at K=4,
        RESULTS.md), or None (mean-field). The generative side (likelihood,
        KLs, IWAE ratios) always uses the item SAMPLE regardless."""
        if not self.cfg.conditional_posterior:
            return None
        if self.cfg.condition_on == "mean":
            return {name: p["mu"] for name, p in post.items()}
        return item_sample

    def _cond_args(self, conditioning: dict | None):
        """_encoder_conditioning output -> (item_feats, cond_mats) for the
        encoder: the flat M*(K+1) feature vector (condition_on=
        'sample'/'mean') or the compressed sufficient-statistic matrices
        (condition_on='stats'; networks.condition_stat_mats)."""
        if conditioning is None:
            return None, None
        if self.cfg.condition_on == "stats":
            return None, networks.condition_stat_mats(
                conditioning, self.cfg.num_items, self.cfg.irt_model)
        return networks.flatten_item_sample(conditioning), None

    # ---------------------------------------------------- ability encoder

    def _anchor_theta_head(self, params: dict, head, mask,
                           items_axis: str | None = None,
                           item_post: dict | None = None):
        """laplace / laplace-w families: reinterpret the head's second
        block as the per-dim log information correction c and produce the
        anchored (mu, logvar, off) Cholesky token
        (ops.distributions.laplace_anchor_parts).

        mask (B, M_local) in any float dtype. 'laplace' anchors on the
        UNWEIGHTED pair statistic S_i = sum_j m_ij a_j a_j^T; 'laplace-w'
        additionally multiplies each item's rank-1 term by the expected
        Fisher weight w_ij AT THE HEAD'S OWN MEAN (w = p(1-p) etc.,
        ops.likelihood.*fisher_weight*) — with c = 0 that IS the
        closed-form Laplace covariance, so the head only learns the
        residual between the curvature at the amortized mean and the true
        posterior spread (one extra (B, M) predictor matmul per encode).
        All statistics use the item-posterior MEANS (deterministic given
        data, matching eval/serving); gradients flow to the item means —
        and in laplace-w to the encoder mean through w — the structured-VI
        coupling. items_axis/item_post: on an item-sharded mesh the LOCAL
        block's statistics psum to the exact global per-person
        information."""
        if not self._laplace:
            return head
        mu, c, _ = head
        cfg = self.cfg
        k = cfg.ability_dim
        post = item_post if item_post is not None else params["item_post"]
        m_local = mask.shape[-1]
        if cfg.irt_model == "1pl":
            a = jnp.ones((m_local, k), jnp.float32)
        else:
            a = post["a"]["mu"]
        pairs = dist.triu_flat_index(k)
        a2 = jnp.stack([a[:, i] * a[:, j] for i, j in pairs], axis=-1)
        maskf = mask.astype(jnp.float32)
        if self._laplace_weighted:
            mu32 = mu.astype(jnp.float32)
            if cfg.irt_model in links.CATEGORICAL_MODELS:
                w = lik.categorical_fisher_weight(
                    cfg.irt_model, links.grm_base(mu32, a),
                    links.categorical_table(cfg.irt_model,
                                            post["b"]["mu"]))
            elif cfg.irt_model == "3pl":
                w = lik.fisher_weight_3pl(
                    links.logits_2pl(mu32, a, post["b"]["mu"][:, 0]),
                    post["g_hat"]["mu"][:, 0])
            else:   # 1pl shares the Bernoulli weight with unit loadings
                w = lik.bernoulli_fisher_weight(
                    links.logits_2pl(mu32, a, post["b"]["mu"][:, 0]))
            maskf = maskf * w
        s_flat = jnp.dot(maskf, a2, preferred_element_type=jnp.float32)
        if items_axis is not None:
            s_flat = jax.lax.psum(s_flat, items_axis)
        logvar, off = dist.laplace_anchor_parts(c, s_flat)
        return mu, logvar, off

    def encode(self, params: dict, response: jax.Array, mask: jax.Array,
               item_sample: dict | None):
        """-> (mu, logvar, off): the ability posterior q(theta_i | ...).
        off is None for the diagonal family, else the (B, K(K-1)/2)
        strict-lower Cholesky entries (theta_posterior='chol', or the
        Fisher-anchored 'laplace' family)."""
        if response.shape[-1] != self.cfg.num_items:
            raise ValueError(
                f"response has {response.shape[-1]} items but the model was "
                f"configured with num_items={self.cfg.num_items}")
        if self.cfg.conditional_posterior:
            assert item_sample is not None
        feats, cond = self._cond_args(
            item_sample if self.cfg.conditional_posterior else None)
        head = networks.apply_ability_encoder(
            params["encoder"], response, mask, feats,
            compute_dtype=jnp.dtype(self.cfg.compute_dtype),
            ability_dim=self._enc_k, cond_mats=cond)
        return self._anchor_theta_head(params, head, mask)

    # ---------------------------------------------- theta-posterior family

    def theta_kl(self, mu, logvar, off) -> jax.Array:
        """Per-person KL(q(theta_i) || N(0, I)) — (B,), last axis reduced;
        family-dispatched (diag == the historical formula bitwise)."""
        return dist.kl_standard_normal_tril(mu, logvar, off)

    def theta_logq(self, theta, eps, mu, logvar, off) -> jax.Array:
        """Per-person log q(theta_i) at theta = mu + L eps (IWAE weights).
        Diagonal family keeps the historical theta-based formula (bitwise
        compatibility with every recorded bound); chol uses the solve-free
        eps form (ops.distributions.tril_log_prob_from_eps)."""
        if off is None:
            return dist.gaussian_log_prob(theta, mu, logvar).sum(-1)
        return dist.tril_log_prob_from_eps(eps, logvar)

    # ------------------------------------------------------------ decoder

    def _link_params(self, item_sample: dict) -> dict:
        """Item-sample dict -> link-function kwargs (squeeze scalar dims;
        grm/gpcm keep their (M, C-1) unconstrained coordinate block whole)."""
        out = {}
        if "a" in item_sample:
            out["a"] = item_sample["a"]
        if "b" in item_sample:
            b = item_sample["b"]
            out["b"] = (b if self.cfg.irt_model in links.CATEGORICAL_MODELS
                        else b[..., 0])
        if "g_hat" in item_sample:
            out["g_hat"] = item_sample["g_hat"][..., 0]
        return out

    def loglik_per_person(self, params: dict, theta: jax.Array, item_sample: dict,
                          response: jax.Array, mask: jax.Array) -> jax.Array:
        """Masked Bernoulli log p(r_i | theta_i, d) summed over items -> (B,)."""
        cfg = self.cfg
        if cfg.irt_model == "deep":
            logits = networks.apply_deep_link(
                params["deep_link"], theta, item_sample["d"],
                item_chunk=cfg.deep_item_chunk,
                compute_dtype=jnp.dtype(cfg.compute_dtype))
            return lik.masked_loglik_per_person(logits, response, mask)
        lp = self._link_params(item_sample)
        if cfg.irt_model in links.CATEGORICAL_MODELS:
            base = links.grm_base(theta, lp["a"])
            table = links.categorical_table(cfg.irt_model, lp["b"])
            return lik.categorical_loglik_per_person(cfg.irt_model, base,
                                                     table, response, mask)
        if cfg.use_pallas and cfg.irt_model in ("1pl", "2pl", "3pl"):
            from vibo_tpu.ops import pallas_elbo
            a = lp.get("a")
            if a is None:  # 1PL == 2PL with unit discriminations on summed
                # theta; sized from the data so item-sharded tiles work
                a = jnp.ones((mask.shape[-1], cfg.ability_dim), theta.dtype)
            if cfg.irt_model == "3pl":
                return pallas_elbo.masked_loglik_3pl(theta, a, lp["b"],
                                                     lp["g_hat"], response, mask)
            return pallas_elbo.masked_loglik_2pl(theta, a, lp["b"], response, mask)
        if cfg.irt_model == "1pl":
            logits = links.logits_1pl(theta, lp["b"])
            return lik.masked_loglik_per_person(logits, response, mask)
        logits = links.logits_2pl(theta, lp["a"], lp["b"])
        g_hat = lp.get("g_hat") if cfg.irt_model == "3pl" else None
        return lik.masked_loglik_per_person(logits, response, mask, g_hat=g_hat)

    def response_prob(self, params: dict, theta: jax.Array, item_sample: dict
                      ) -> jax.Array:
        """p(r_ij = 1) matrix (B, M) — used for imputation."""
        cfg = self.cfg
        if cfg.irt_model in links.CATEGORICAL_MODELS:
            raise ValueError(f"{cfg.irt_model} responses are polytomous: use "
                             "category_logprobs / impute_category_with_items")
        if cfg.irt_model == "deep":
            return jax.nn.sigmoid(networks.apply_deep_link(
                params["deep_link"], theta, item_sample["d"],
                item_chunk=cfg.deep_item_chunk,
                compute_dtype=jnp.dtype(cfg.compute_dtype)))
        return links.response_prob(cfg.irt_model, theta, self._link_params(item_sample))

    def category_logprobs(self, params: dict, theta: jax.Array,
                          item_sample: dict) -> jax.Array:
        """Polytomous all-category log-probabilities -> (..., B, M, C).
        Evaluation path (imputation argmax, calibration); the training path
        never materializes the category axis (ops.likelihood
        .categorical_loglik_cells)."""
        del params
        if self.cfg.irt_model not in links.CATEGORICAL_MODELS:
            raise ValueError("category_logprobs is the grm/gpcm evaluation "
                             "path")
        lp = self._link_params(item_sample)
        return lik.categorical_logprob_all(
            self.cfg.irt_model, links.grm_base(theta, lp["a"]),
            links.categorical_table(self.cfg.irt_model, lp["b"]))

    # --------------------------------------------------------------- ELBO

    def elbo(self, params: dict, key: jax.Array, response: jax.Array,
             mask: jax.Array, item_scale: float | jax.Array = 1.0,
             num_samples: int = 1):
        """Minibatch ELBO (scalar) + aux metrics dict.

        E_q[log p(r | theta, d)] estimated with `num_samples` reparameterized
        draws (vmap over the sample axis); KLs analytic.
        """
        post = self.item_dist(params, response, mask)

        def one_sample(k):
            k_item, k_theta = jax.random.split(k)
            item_sample = self.sample_items_from(post, k_item)
            mu, logvar, off = self.encode(params, response, mask,
                                          self._encoder_conditioning(
                                              post, item_sample))
            theta, _ = dist.tril_reparameterize(k_theta, mu, logvar, off)
            ll = self.loglik_per_person(params, theta, item_sample, response, mask)
            # all-missing rows (zero-padded batches, pad_to_multiple) are
            # inert: their loglik is 0 by masking and their KL is excluded,
            # so objectives are EXACTLY invariant to padding (tested) and
            # match the shard_map dp path's row_weight convention.
            valid = (mask.sum(-1) > 0).astype(mu.dtype)
            kl_theta = self.theta_kl(mu, logvar, off) * valid
            return ll.sum(), kl_theta.sum()

        loglik, kl_theta = _mc_mean(one_sample, key, num_samples)
        kl_items = self.item_kl_from(post)
        bound = objectives.elbo(loglik, kl_theta, kl_items, item_scale)
        aux = {"elbo": bound, "loglik": loglik, "kl_theta": kl_theta,
               "kl_items": kl_items}
        return bound, aux

    # --------------------------------------------------------------- IWAE

    def iwae(self, params: dict, key: jax.Array, response: jax.Array,
             mask: jax.Array, num_samples: int = 100,
             item_scale: float | jax.Array = 1.0) -> jax.Array:
        """IWAE-S joint bound on log p(r) for the minibatch (scalar).

        log (1/S) sum_s exp( log p(r, theta_s, d_s) - log q(theta_s, d_s) ),
        item terms scaled by item_scale under minibatching (SURVEY.md 3.4).
        """
        post = self.item_dist(params, response, mask)

        def one_sample(k):
            k_item, k_theta = jax.random.split(k)
            item_sample = self.sample_items_from(post, k_item)
            mu, logvar, off = self.encode(params, response, mask,
                                          self._encoder_conditioning(
                                              post, item_sample))
            theta, eps = dist.tril_reparameterize(k_theta, mu, logvar, off)
            ll = self.loglik_per_person(params, theta, item_sample, response,
                                        mask).sum()
            valid = (mask.sum(-1) > 0).astype(mu.dtype)
            lp_theta = (dist.standard_normal_log_prob(theta).sum(-1) * valid).sum()
            lq_theta = (self.theta_logq(theta, eps, mu, logvar, off)
                        * valid).sum()
            item_ratio = self.item_log_ratio_from(post, item_sample)
            return objectives.importance_log_weights(
                ll, lp_theta, lq_theta, item_ratio, 0.0, item_scale)

        log_w = _mc_stack(one_sample, jax.random.split(key, num_samples))
        return objectives.iwae_bound(log_w)

    def _packed_train_loglik(self, params: dict, theta: jax.Array,
                             item_sample: dict, packed: jax.Array) -> jax.Array:
        """Per-person loglik via the one-pass fused training kernels (uniform
        cotangent: callers .sum() it into the loss). Dispatches by link."""
        cfg = self.cfg
        from vibo_tpu.ops import pallas_elbo
        if cfg.irt_model == "deep":
            from vibo_tpu.ops import pallas_deep
            return pallas_deep.masked_loglik_deep_packed_train(
                theta, item_sample["d"], params["deep_link"], packed)
        lp = self._link_params(item_sample)
        if cfg.irt_model == "grm":
            from vibo_tpu.ops import pallas_grm
            # thresholds reparameterized OUTSIDE the kernel: its dkappa
            # chains through the tiny softplus-cumsum in plain JAX
            return pallas_grm.masked_loglik_grm_packed_train(
                theta, lp["a"], links.grm_thresholds(lp["b"]), packed)
        if cfg.irt_model == "gpcm":
            from vibo_tpu.ops import pallas_gpcm
            # same pattern: the cumsum reparameterization chains outside
            return pallas_gpcm.masked_loglik_gpcm_packed_train(
                theta, lp["a"], links.gpcm_cumsteps(lp["b"]), packed)
        a = lp.get("a")
        if a is None:  # 1PL == 2PL with unit discriminations on summed
            # theta; sized from the data so item-sharded tiles work
            a = jnp.ones((packed.shape[-1], cfg.ability_dim), theta.dtype)
        if cfg.irt_model == "3pl":
            return pallas_elbo.masked_loglik_3pl_packed_train(
                theta, a, lp["b"], lp["g_hat"], packed)
        return pallas_elbo.masked_loglik_2pl_packed_train(theta, a, lp["b"],
                                                          packed)

    def _use_fused_encoder(self, packed: jax.Array) -> bool:
        """Fused Pallas decode+first-layer encoder (networks.
        apply_ability_encoder_packed): on whenever the Pallas pipeline is on
        and the data really is the int8 code."""
        return self.cfg.use_pallas and packed.dtype == jnp.int8

    def wants_transposed_theta(self) -> bool:
        """True when the packed train paths should run the theta pipeline in
        the TRANSPOSED (K, B) layout: encoder head, noise, reparameterization
        and KL all stay in (K, B) row-major, feeding the transposed one-pass
        kernels. Eliminates the (B, K)-minor layout tax — XLA's preferred
        T(4,128) layout vs Mosaic's required row-major inserted 8 relayout
        copies (~28 us) per step at 10k x 1k (K=4) on v5e, plus padded
        (B, 1)/(B, K) tile traffic. Callers must pass the SAME flag to
        sample_noise and elbo_packed_sums/iwae_packed_terms.

        The chol family stays on the standard (B, K) layout: its strict-
        lower mixing is a per-person K-vector recurrence whose transposed
        form would be written against (K, B) slabs — implementable, but the
        layout win it protects (~28 us/step) is small next to the family's
        purpose (posterior quality), so it is not built yet. The laplace
        family likewise stays (B, K): its anchor produces a full Cholesky
        token."""
        return (self.cfg.use_pallas and not self._chol and not self._laplace
                and self.cfg.irt_model in ("1pl", "2pl", "3pl"))

    def _packed_train_loglik_t(self, params: dict, thetaT: jax.Array,
                               item_sample: dict, packed: jax.Array
                               ) -> jax.Array:
        """Scalar sum-of-persons loglik via the transposed one-pass kernels
        (thetaT is (K, B); see pallas_elbo 'transposed-theta' section)."""
        from vibo_tpu.ops import pallas_elbo
        cfg = self.cfg
        lp = self._link_params(item_sample)
        a = lp.get("a")
        if a is None:
            a = jnp.ones((packed.shape[-1], cfg.ability_dim), thetaT.dtype)
        if cfg.irt_model == "3pl":
            return pallas_elbo.masked_loglik_3pl_packed_train_t(
                thetaT, a, lp["b"], lp["g_hat"], packed)
        return pallas_elbo.masked_loglik_2pl_packed_train_t(thetaT, a, lp["b"],
                                                            packed)

    def _encode_packed(self, params: dict, packed: jax.Array, response, mask,
                       item_sample: dict | None, transposed: bool = False):
        """Ability encoder for the packed pipeline: fused int8 path when
        available, otherwise the decoded-data encoder. Returns
        (mu, logvar, off) like encode(); transposed=True returns
        (muT, logvarT, None) as (K, B) — fused diag path only (the chol
        family never requests it, see wants_transposed_theta)."""
        if transposed and self._chol:
            raise ValueError("the transposed (K, B) theta pipeline does not "
                             "carry the chol family (wants_transposed_theta)")
        if self._use_fused_encoder(packed):
            if packed.shape[-1] != self.cfg.num_items:
                raise ValueError(
                    f"packed has {packed.shape[-1]} items but the model was "
                    f"configured with num_items={self.cfg.num_items}")
            feats, cond = self._cond_args(
                item_sample if self.cfg.conditional_posterior else None)
            head = networks.apply_ability_encoder_packed(
                params["encoder"], packed, feats,
                compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                transposed_head=transposed, ability_dim=self._enc_k,
                cond_mats=cond)
            if not self._laplace:
                return head
            # laplace: mask was force-decoded (_decode_if_needed) for the
            # Fisher pair statistics
            return self._anchor_theta_head(params, head, mask)
        # item_sample here is ALREADY what the caller wants conditioned on
        # (callers route through _encoder_conditioning) — pass it through
        if transposed:
            mu, logvar, _ = self.encode(params, response, mask, item_sample)
            return mu.T, logvar.T, None
        return self.encode(params, response, mask, item_sample)

    def _decode_if_needed(self, params: dict, packed: jax.Array):
        """(response, mask) in compute dtype — or (None, None) when no
        consumer needs the decoded matrices (fused encoder + fused kernel +
        free-form posterior), saving their HBM materialization."""
        cfg = self.cfg
        # laplace: the Fisher anchor needs the decoded mask for its pair
        # statistics (one extra (B, M) materialization on the packed path)
        need = (cfg.item_encoder or self._laplace
                or not self._use_fused_encoder(packed)
                or not self._use_packed_kernel(params))
        if not need:
            return None, None
        pk = packed.astype(jnp.dtype(cfg.compute_dtype))
        return jnp.maximum(pk - 1.0, 0.0), jnp.minimum(pk, 1.0)

    def _use_packed_kernel(self, params: dict) -> bool:
        if not self.cfg.use_pallas:
            return False
        if self.cfg.irt_model == "deep":
            # The fused deep kernel (ops/pallas_deep.py) is correct but the
            # deep link is MXU-compute-bound and XLA's chunked bf16 path
            # already runs near peak (5.7 vs 11.9 ms/step at 10k x 1k on
            # v5e) — opt in explicitly via deep_fused_kernel.
            from vibo_tpu.ops import pallas_deep
            return (self.cfg.deep_fused_kernel
                    and pallas_deep.supports(params["deep_link"]))
        return self.cfg.irt_model in ("1pl", "2pl", "3pl", "grm", "gpcm")

    def elbo_packed(self, params: dict, key: jax.Array, packed: jax.Array,
                    item_scale: float | jax.Array = 1.0, num_samples: int = 1,
                    row_valid: jax.Array | None = None):
        """ELBO from the packed int8 response code (pack_responses).

        The perf pipeline (bench.py / packed train step): the int8 matrix is
        the ONLY response-sized array read from HBM — the encoder consumes a
        compute_dtype decode of it, and the masked loglik runs the packed
        Pallas kernel (1PL/2PL/3PL on TPU). Semantics == elbo() on the
        unpacked data (tested).

        row_valid ((B,) f32, optional): precomputed has-any-observed-cell
        indicator. It is CONSTANT across training steps, but when derived
        from `packed` inside the step XLA fuses the (B, M) int8 reduction
        with loop-variant consumers and re-runs it every scan iteration
        (profiled: 2 x ~60 us/step at 10k x 1k on v5e). Callers that loop
        (Trainer, bench) pass it once; None computes it on the fly.
        """
        cfg = self.cfg
        use_packed_kernel = self._use_packed_kernel(params)
        response, mask = self._decode_if_needed(params, packed)
        post = self.item_dist(params, response, mask)
        if row_valid is None:
            from vibo_tpu.ops.pallas_encoder import packed_row_valid
            row_valid = packed_row_valid(packed)
        valid = row_valid

        def one_sample(k):
            k_item, k_theta = jax.random.split(k)
            item_sample = self.sample_items_from(post, k_item)
            mu, logvar, off = self._encode_packed(
                params, packed, response, mask,
                self._encoder_conditioning(post, item_sample))
            theta, _ = dist.tril_reparameterize(k_theta, mu, logvar, off)
            if use_packed_kernel:
                # one-pass fused kernel: ll.sum() below => uniform cotangent,
                # the train variant's contract
                ll = self._packed_train_loglik(params, theta, item_sample,
                                               packed)
            else:
                ll = self.loglik_per_person(params, theta, item_sample,
                                            response.astype(jnp.float32),
                                            mask.astype(jnp.float32))
            kl_theta = self.theta_kl(mu, logvar, off) * valid
            return ll.sum(), kl_theta.sum()

        loglik, kl_theta = _mc_mean(one_sample, key, num_samples)
        kl_items = self.item_kl_from(post)
        bound = objectives.elbo(loglik, kl_theta, kl_items, item_scale)
        return bound, {"elbo": bound, "loglik": loglik, "kl_theta": kl_theta,
                       "kl_items": kl_items}

    def iwae_packed(self, params: dict, key: jax.Array, packed: jax.Array,
                    item_scale: float | jax.Array = 1.0,
                    num_samples: int = 10,
                    row_valid: jax.Array | None = None) -> jax.Array:
        """IWAE-S joint bound from the packed int8 response code (scalar).

        Training-objective counterpart of elbo_packed (arXiv:2108.11579
        trains with multi-sample bounds; row_valid as there). The one-pass
        fused kernels remain valid: the gradient of logsumexp gives every
        person within sample s the SAME weight w_s, so each per-sample
        kernel call sees a uniform cotangent (the train kernels' contract)."""
        cfg = self.cfg
        use_packed_kernel = self._use_packed_kernel(params)
        response, mask = self._decode_if_needed(params, packed)
        post = self.item_dist(params, response, mask)
        if row_valid is None:
            from vibo_tpu.ops.pallas_encoder import packed_row_valid
            row_valid = packed_row_valid(packed)
        valid = row_valid

        def one_sample(k):
            k_item, k_theta = jax.random.split(k)
            item_sample = self.sample_items_from(post, k_item)
            mu, logvar, off = self._encode_packed(
                params, packed, response, mask,
                self._encoder_conditioning(post, item_sample))
            theta, eps = dist.tril_reparameterize(k_theta, mu, logvar, off)
            if use_packed_kernel:
                ll = self._packed_train_loglik(params, theta, item_sample,
                                               packed).sum()
            else:
                ll = self.loglik_per_person(
                    params, theta, item_sample,
                    response.astype(jnp.float32),
                    mask.astype(jnp.float32)).sum()
            lp = (dist.standard_normal_log_prob(theta).sum(-1) * valid).sum()
            lq = (self.theta_logq(theta, eps, mu, logvar, off) * valid).sum()
            ratio = self.item_log_ratio_from(post, item_sample)
            return objectives.importance_log_weights(ll, lp, lq, ratio, 0.0,
                                                     item_scale)

        log_w = _mc_stack(one_sample, jax.random.split(key, num_samples))
        return objectives.iwae_bound(log_w)

    def sample_noise(self, params: dict, key: jax.Array, batch: int,
                     num_samples: int, transposed: bool = False):
        """Exogenous reparameterization noise for elbo_packed_sums:
        ({name: (S, M, D)} item eps, (S, B, K) theta eps). Generated with the
        partitionable RNG so values are sharding-invariant. Shapes come from
        the head spec, so this works for free-form AND amortized posteriors.

        transposed=True emits theta eps as (S, K, B) for the transposed
        packed train path (wants_transposed_theta) — pass the same flag to
        the consuming objective."""
        del params
        k_item, k_theta = jax.random.split(key)
        spec = self._head_spec
        item_keys = jax.random.split(k_item, len(spec))

        def numel(shape):
            n = 1
            for d in shape:
                n *= d
            return n

        # Generate FLAT and keep it flat THROUGH the barrier: a (S, B, K)
        # draw has minor dim K ~ 4, so threefry+erfinv runs at K/128 lane
        # efficiency. Reshaping before the barrier (round 1) let XLA fuse
        # the erfinv into the padded (B, K)-layout materialization anyway —
        # profiled 41 us/step at 10k x 1k on v5e for the 41k theta values;
        # flat it is ~3 us and the post-barrier reshape is a compact copy.
        # The barrier itself is still required: without it XLA fuses the
        # threefry+erfinv chain into its consumer fusions AND rematerializes
        # it in the backward pass (2 x ~60 us/step) vs ~160 KB of stored eps.
        item_shapes = {name: (num_samples, self.cfg.num_items, spec[name])
                       for name in spec}
        theta_shape = ((num_samples, self.cfg.ability_dim, batch) if transposed
                       else (num_samples, batch, self.cfg.ability_dim))
        flat_items = {name: jax.random.normal(
                          k, (numel(item_shapes[name]),), jnp.float32)
                      for k, name in zip(item_keys, sorted(spec))}
        flat_theta = jax.random.normal(k_theta, (numel(theta_shape),),
                                       jnp.float32)
        flat_items, flat_theta = jax.lax.optimization_barrier(
            (flat_items, flat_theta))
        item_eps = {name: flat_items[name].reshape(item_shapes[name])
                    for name in flat_items}
        return item_eps, flat_theta.reshape(theta_shape)

    def elbo_packed_sums(self, params: dict, packed: jax.Array, item_eps: dict,
                         theta_eps: jax.Array,
                         row_weight: jax.Array | None = None,
                         axis_name: str | None = None,
                         transposed: bool = False):
        """Deterministic ELBO partial sums from exogenous noise:
        (loglik_sum, kl_theta_sum, kl_items), the first two averaged over the
        sample axis.

        The data-parallel building block: per-student-shard values that the
        shard_map step psums across the mesh; kl_items is shard-INVARIANT
        (identical on every shard — free-form params, or amortized from
        psum'd global statistics), so the caller divides it by the shard
        count before psumming. Same per-cell math as elbo_packed.

        row_weight ((B,), optional): 0.0 marks padding rows added to make the
        student axis divisible by the mesh — their KL(theta) is excluded
        (their loglik is already exactly 0 via the all-missing mask).
        axis_name: shard_map student axis to psum the amortized item
        encoder's column statistics over (no-op for the free-form posterior).
        transposed: run the theta pipeline in (K, B) layout feeding the
        transposed kernels (wants_transposed_theta); theta_eps must come
        from sample_noise(..., transposed=True). Identical math."""
        cfg = self.cfg
        use_packed_kernel = self._use_packed_kernel(params)
        if transposed and not use_packed_kernel:
            raise ValueError("transposed=True requires the packed Pallas "
                             "train kernels (linear links, use_pallas=True)")
        response, mask = self._decode_if_needed(params, packed)
        post = (self.item_dist(params, response, mask, axis_name=axis_name)
                if cfg.item_encoder else params["item_post"])
        if row_weight is None:
            from vibo_tpu.ops.pallas_encoder import packed_row_valid
            valid = packed_row_valid(packed)
        else:
            # row_weight IS the validity: callers fold has-any-observed-cell
            # AND padding into it host-side, once — deriving it from `packed`
            # inside the step re-runs a (B, M) int8 reduction every scan
            # iteration (profiled ~60 us/step at 10k x 1k on v5e)
            valid = row_weight

        def one_sample(i_eps, t_eps):
            item_sample = {
                name: dist.reparameterize_eps(i_eps[name], post[name]["mu"],
                                              post[name]["logvar"])
                for name in i_eps}
            mu, logvar, off = self._encode_packed(
                params, packed, response, mask,
                self._encoder_conditioning(post, item_sample),
                transposed=transposed)
            if transposed:
                theta = dist.reparameterize_eps(t_eps, mu, logvar)
                ll_sum = self._packed_train_loglik_t(params, theta,
                                                     item_sample, packed)
                kl_theta = dist.kl_standard_normal(mu, logvar).sum(0) * valid
                return ll_sum, kl_theta.sum()
            theta = dist.tril_reparameterize_eps(t_eps, mu, logvar, off)
            if use_packed_kernel:
                ll = self._packed_train_loglik(params, theta, item_sample,
                                               packed)
            else:
                ll = self.loglik_per_person(params, theta, item_sample,
                                            response.astype(jnp.float32),
                                            mask.astype(jnp.float32))
            kl_theta = self.theta_kl(mu, logvar, off) * valid
            return ll.sum(), kl_theta.sum()

        lls, kl_thetas = _mc_eps(one_sample, item_eps, theta_eps)
        return lls.mean(), kl_thetas.mean(), self.item_kl_from(post)

    def _encode_item_sharded(self, params: dict, response, mask, post: dict,
                             item_sample: dict | None, item_index,
                             items_axis: str, cd):
        """Ability encoder on a 2D mesh tile, routing the conditional
        posterior's input per condition_on: the raw local item dict
        ('sample'/'mean' — the sharded encoder flattens it against its
        weight rows) or the LOCAL sufficient-statistic blocks ('stats' —
        scaled at GLOBAL num_items so the psum over item shards reproduces
        the unsharded statistics exactly)."""
        conditioning = self._encoder_conditioning(post, item_sample)
        cond = None
        if conditioning is not None and self.cfg.condition_on == "stats":
            cond = networks.condition_stat_mats(
                conditioning, self.cfg.num_items, self.cfg.irt_model)
            conditioning = None
        return networks.apply_ability_encoder_item_sharded(
            params["encoder"], response, mask, conditioning,
            self.cfg.num_items, item_index, items_axis, compute_dtype=cd,
            ability_dim=self._enc_k, cond_mats=cond)

    def _tile_item_post(self, params: dict, response, mask, item_index,
                        m_l: int, students_axis: str, items_axis: str) -> dict:
        """Item posterior for THIS item block on a 2D ('students','items')
        mesh tile.

        Free-form: slice the per-item Gaussians at item_index*m_l (gradients
        are block-sparse; the varying-types auto-psum reassembles them).
        Amortized (cfg.item_encoder): the column statistics of the LOCAL
        items are exact globals after psumming partial sums over
        `students_axis` (and the per-person raw score over `items_axis` —
        see networks.item_stats), so the shared encoder plus the sliced
        per-item residuals reproduce the unsharded posterior bitwise for
        this block (tested)."""
        off = item_index * m_l
        if not self.cfg.item_encoder:
            return {name: {k: jax.lax.dynamic_slice_in_dim(v[k], off, m_l, 0)
                           for k in ("mu", "logvar")}
                    for name, v in params["item_post"].items()}
        stats = networks.item_stats(response, mask, axis_name=students_axis,
                                    item_axis_name=items_axis)
        residual = {name: {k: jax.lax.dynamic_slice_in_dim(v[k], off, m_l, 0)
                           for k in ("mu", "logvar")}
                    for name, v in params["item_resid"].items()}
        return networks.apply_item_encoder(params["item_enc"], stats,
                                           self._head_spec, residual)

    def elbo_packed_sums_2d(self, params: dict, packed: jax.Array,
                            item_eps: dict, theta_eps: jax.Array,
                            row_weight: jax.Array,
                            item_index, items_axis: str = "items",
                            students_axis: str = "students"):
        """Shard-local ELBO partial sums on a 2D ('students','items') mesh
        tile: packed is this shard's (B_local, M_local) block; item
        posteriors/noise are sliced from the replicated arrays at
        item_index*M_local (their gradients are block-sparse, so the
        varying-types auto-psum reassembles the full gradient).

        Returns (ll_local, klt_local, kli_local):
          ll_local  — this tile's masked loglik (sums over the whole mesh);
          klt_local — this student shard's theta KL, IDENTICAL on every item
                      shard (theta comes from the psum'd sharded encoder),
                      so the caller divides by the item-shard count;
          kli_local — this item block's KL, identical on every student
                      shard, so the caller divides by the student-shard
                      count. (SURVEY.md section 3.2: the 2D mesh is the
                      natural generalization; round-1 VERDICT item 3.)
        """
        cfg = self.cfg
        cd = jnp.dtype(cfg.compute_dtype)
        pk = packed.astype(cd)
        mask = jnp.minimum(pk, 1.0)
        response = jnp.maximum(pk - 1.0, 0.0)
        use_packed_kernel = self._use_packed_kernel(params)
        m_l = packed.shape[1]
        off = item_index * m_l
        post = self._tile_item_post(params, response, mask, item_index, m_l,
                                    students_axis, items_axis)
        # row_weight is the GLOBAL row validity (has-any-observed-cell AND
        # not-padding), folded host-side by the trainer: a person can have
        # zero observed cells in THIS item block yet be valid, so it must
        # not be derived from the local tile
        valid = row_weight

        def one_sample(i_eps, t_eps):
            item_sample = {}
            for name in i_eps:
                eps_loc = jax.lax.dynamic_slice_in_dim(i_eps[name], off, m_l, 0)
                item_sample[name] = dist.reparameterize_eps(
                    eps_loc, post[name]["mu"], post[name]["logvar"])
            mu, logvar, c_off = self._anchor_theta_head(
                params, self._encode_item_sharded(
                    params, response, mask, post, item_sample, item_index,
                    items_axis, cd),
                mask, items_axis=items_axis, item_post=post)
            theta = dist.tril_reparameterize_eps(t_eps, mu, logvar, c_off)
            if use_packed_kernel:
                ll = self._packed_train_loglik(params, theta, item_sample,
                                               packed)
            else:
                ll = self.loglik_per_person(params, theta, item_sample,
                                            response.astype(jnp.float32),
                                            mask.astype(jnp.float32))
            kl_theta = self.theta_kl(mu, logvar, c_off) * valid
            return ll.sum(), kl_theta.sum()

        lls, kl_thetas = _mc_eps(one_sample, item_eps, theta_eps)
        kli = sum(dist.kl_standard_normal(p["mu"], p["logvar"]).sum()
                  for p in post.values())
        return lls.mean(), kl_thetas.mean(), kli

    def iwae_packed_terms_2d(self, params: dict, packed: jax.Array,
                             item_eps: dict, theta_eps: jax.Array,
                             row_weight: jax.Array, item_index,
                             item_scale: float | jax.Array = 1.0,
                             items_axis: str = "items",
                             students_axis: str = "students") -> jax.Array:
        """Per-sample LOCAL IWAE log-weight contributions on a 2D
        ('students','items') mesh tile -> (S,).

        Scalings mirror elbo_packed_sums_2d: the masked loglik is unique per
        tile; the theta prior/posterior terms are identical on every item
        shard (psum'd sharded encoder) so they enter /n_items_shards; the
        item log-ratio of the LOCAL block is identical on every student
        shard so it enters * item_scale / n_student_shards. Therefore
            log_w = psum(local, (students_axis, items_axis))
        is the exact global per-sample log-weight vector, computed
        identically on every chip, and the cross-shard logsumexp is exact
        (the 2D generalization of iwae_packed_terms; SURVEY.md section 3.2
        "MC-sample parallel ... fused with the student shard")."""
        cfg = self.cfg
        cd = jnp.dtype(cfg.compute_dtype)
        pk = packed.astype(cd)
        mask = jnp.minimum(pk, 1.0)
        response = jnp.maximum(pk - 1.0, 0.0)
        use_packed_kernel = self._use_packed_kernel(params)
        m_l = packed.shape[1]
        off = item_index * m_l
        post = self._tile_item_post(params, response, mask, item_index, m_l,
                                    students_axis, items_axis)
        valid = row_weight
        n_i = jax.lax.axis_size(items_axis)
        n_s = jax.lax.axis_size(students_axis)

        def one_sample(i_eps, t_eps):
            item_sample = {}
            for name in i_eps:
                eps_loc = jax.lax.dynamic_slice_in_dim(i_eps[name], off, m_l, 0)
                item_sample[name] = dist.reparameterize_eps(
                    eps_loc, post[name]["mu"], post[name]["logvar"])
            mu, logvar, c_off = self._anchor_theta_head(
                params, self._encode_item_sharded(
                    params, response, mask, post, item_sample, item_index,
                    items_axis, cd),
                mask, items_axis=items_axis, item_post=post)
            theta = dist.tril_reparameterize_eps(t_eps, mu, logvar, c_off)
            if use_packed_kernel:
                ll = self._packed_train_loglik(params, theta, item_sample,
                                               packed).sum()
            else:
                ll = self.loglik_per_person(params, theta, item_sample,
                                            response.astype(jnp.float32),
                                            mask.astype(jnp.float32)).sum()
            lp = (dist.standard_normal_log_prob(theta).sum(-1) * valid).sum()
            lq = (self.theta_logq(theta, t_eps, mu, logvar, c_off)
                  * valid).sum()
            ratio = self.item_log_ratio_from(post, item_sample)
            return ll + (lp - lq) / n_i + item_scale * ratio / n_s

        return _mc_eps(one_sample, item_eps, theta_eps)

    def iwae_packed_terms(self, params: dict, packed: jax.Array,
                          item_eps: dict, theta_eps: jax.Array,
                          row_weight: jax.Array | None = None,
                          axis_name: str | None = None,
                          transposed: bool = False):
        """Per-sample LOCAL IWAE log-weight contributions from exogenous
        noise: the data-parallel IWAE building block.

        Returns (local (S,), ratio (S,)):
          local_s = masked loglik + log p(theta_s) - log q(theta_s), summed
                    over THIS shard's persons (valid/padding rows excluded);
          ratio_s = log p(d_s) - log q(d_s) for the item sample — computed
                    from shard-invariant inputs, so IDENTICAL on every shard.
        The trainer combines them across the mesh:
          log_w = psum(local + item_scale * ratio / n_shards)   # (S,)
          bound = logsumexp(log_w) - log S
        psum(ratio / n_shards) == ratio, so the nonlinear logsumexp sees the
        exact global log-weights while every input stays shard-local
        (SURVEY.md section 3.2 "MC-sample parallel ... fused with the student
        shard"; round-1 VERDICT item 4)."""
        cfg = self.cfg
        use_packed_kernel = self._use_packed_kernel(params)
        response, mask = self._decode_if_needed(params, packed)
        post = (self.item_dist(params, response, mask, axis_name=axis_name)
                if cfg.item_encoder else params["item_post"])
        if row_weight is None:
            from vibo_tpu.ops.pallas_encoder import packed_row_valid
            valid = packed_row_valid(packed)
        else:
            # row_weight IS the validity: callers fold has-any-observed-cell
            # AND padding into it host-side, once — deriving it from `packed`
            # inside the step re-runs a (B, M) int8 reduction every scan
            # iteration (profiled ~60 us/step at 10k x 1k on v5e)
            valid = row_weight

        if transposed and not use_packed_kernel:
            raise ValueError("transposed=True requires the packed Pallas "
                             "train kernels (linear links, use_pallas=True)")
        kdim = 0 if transposed else -1

        def one_sample(i_eps, t_eps):
            item_sample = {
                name: dist.reparameterize_eps(i_eps[name], post[name]["mu"],
                                              post[name]["logvar"])
                for name in i_eps}
            mu, logvar, off = self._encode_packed(
                params, packed, response, mask,
                self._encoder_conditioning(post, item_sample),
                transposed=transposed)
            theta = (dist.reparameterize_eps(t_eps, mu, logvar) if transposed
                     else dist.tril_reparameterize_eps(t_eps, mu, logvar, off))
            if transposed:
                ll = self._packed_train_loglik_t(params, theta, item_sample,
                                                 packed)
            elif use_packed_kernel:
                ll = self._packed_train_loglik(params, theta, item_sample,
                                               packed).sum()
            else:
                ll = self.loglik_per_person(params, theta, item_sample,
                                            response.astype(jnp.float32),
                                            mask.astype(jnp.float32)).sum()
            lp = (dist.standard_normal_log_prob(theta).sum(kdim) * valid).sum()
            lq = ((dist.gaussian_log_prob(theta, mu, logvar).sum(kdim)
                   if transposed
                   else self.theta_logq(theta, t_eps, mu, logvar, off))
                  * valid).sum()
            ratio = self.item_log_ratio_from(post, item_sample)
            return ll + lp - lq, ratio

        return _mc_eps(one_sample, item_eps, theta_eps)

    def iwae_per_person(self, params: dict, key: jax.Array, response: jax.Array,
                        mask: jax.Array, num_samples: int = 100,
                        num_persons_total: int | None = None) -> jax.Array:
        """Per-person IWAE-S bounds on log p(r_i) -> (B,).

        Item-parameter prior/posterior terms are apportioned 1/N per person
        (they are shared across the dataset), matching the ELBO's item-KL
        scaling convention (SURVEY.md section 3.4).
        """
        n_total = num_persons_total or response.shape[-2]
        post = self.item_dist(params, response, mask)

        def one_sample(k):
            k_item, k_theta = jax.random.split(k)
            item_sample = self.sample_items_from(post, k_item)
            mu, logvar, off = self.encode(params, response, mask,
                                          self._encoder_conditioning(
                                              post, item_sample))
            theta, eps = dist.tril_reparameterize(k_theta, mu, logvar, off)
            ll = self.loglik_per_person(params, theta, item_sample, response,
                                        mask)                      # (B,)
            valid = (mask.sum(-1) > 0).astype(mu.dtype)
            lp = dist.standard_normal_log_prob(theta).sum(-1) * valid  # (B,)
            lq = self.theta_logq(theta, eps, mu, logvar, off) * valid
            item_ratio = self.item_log_ratio_from(post, item_sample) / n_total
            return ll + lp - lq + item_ratio

        log_w = _mc_stack(one_sample, jax.random.split(key, num_samples))
        return objectives.iwae_bound(log_w)  # (B,)

    # ---------------------------------------------------------- imputation

    def impute_prob(self, params: dict, response: jax.Array, mask: jax.Array
                    ) -> jax.Array:
        """Predicted response probabilities from posterior means (B, M).

        Protocol per SURVEY.md section 4.3: encode the train-visible
        responses, take posterior means for theta and d, push through the
        link. Hidden cells are then thresholded at 0.5 by the caller.
        (For the amortized item posterior, d's means come from THIS batch's
        columns; pass precomputed means via impute_prob_with_items when the
        posterior should condition on the full training matrix.)
        """
        item_mean = self.item_posterior_mean(params, response, mask)
        return self.impute_prob_with_items(params, response, mask, item_mean)

    def impute_prob_with_items(self, params: dict, response: jax.Array,
                               mask: jax.Array, item_mean: dict) -> jax.Array:
        """impute_prob with explicit item-parameter means — lets evaluation
        compute the (amortized) item posterior once from the full training
        matrix and reuse it across person blocks."""
        mu, _, _ = self.encode(params, response, mask, item_mean)
        return self.response_prob(params, mu, item_mean)

    def impute_category_with_items(self, params: dict, response: jax.Array,
                                   mask: jax.Array, item_mean: dict
                                   ) -> jax.Array:
        """Polytomous (grm/gpcm) imputation: most-probable category per
        cell -> (B, M) int32.

        Same protocol as impute_prob_with_items (encode the train-visible
        responses, posterior means through the link), with the binary
        p > 0.5 threshold generalized to the category-probability argmax."""
        mu, _, _ = self.encode(params, response, mask, item_mean)
        return jnp.argmax(self.category_logprobs(params, mu, item_mean),
                          axis=-1).astype(jnp.int32)
