"""Neural building blocks: MLP init/apply, ability encoder, item posteriors,
deep nonlinear link.

Parity contract: SURVEY.md section 3.3 ("VIBO encoders (inference networks)",
"IRT decoders (link functions)" deep variant); arXiv:2002.00276 sections 4-5.
The reference realizes these as torch nn.Modules; here they are explicit
param-pytree init + pure apply functions, which is what pjit/optax want.

TPU notes:
- All hot paths are dense matmuls (MXU). The deep link's pairwise MLP is
  computed with a split first layer: Linear([theta; d]) == theta @ W_t + d @ W_d,
  so the (B, M, H) pair tensor is only formed once, after the big matmuls.
- Hidden sizes default to multiples of 128 (lane width).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- MLP core

def init_linear(key, in_dim: int, out_dim: int, scale: float | None = None):
    """Glorot-uniform weight + zero bias."""
    if scale is None:
        scale = jnp.sqrt(6.0 / (in_dim + out_dim))
    w = jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -scale, scale)
    return {"w": w, "b": jnp.zeros((out_dim,), jnp.float32)}


def linear(p, x):
    return x @ p["w"] + p["b"]


def init_mlp(key, dims: list[int]):
    """dims = [in, h1, ..., out]; relu between layers, linear output."""
    keys = jax.random.split(key, len(dims) - 1)
    return [init_linear(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]


def mlp(params, x):
    for layer in params[:-1]:
        x = jax.nn.relu(linear(layer, x))
    return linear(params[-1], x)


# ------------------------------------------------------- ability encoder

def ability_encoder_input_dim(num_items: int, item_feat_dim: int) -> int:
    return 2 * num_items + item_feat_dim


def ability_head_dim(ability_dim: int, chol: bool = False) -> int:
    """Encoder-head width: (mu, logvar) plus, for the full-covariance
    family, the K(K-1)/2 strict-lower Cholesky entries (ops.distributions
    `tril_*`; closes the K>1 posterior-width gap vs the HMC gold)."""
    extra = (ability_dim * (ability_dim - 1)) // 2 if chol else 0
    return 2 * ability_dim + extra


def init_ability_encoder(key, num_items: int, item_feat_dim: int,
                         ability_dim: int, hidden_dim: int,
                         chol: bool = False):
    """q(theta_i | r_i, d): MLP([r_i * m_i, m_i, flat(d)]) -> (mu, logvar
    [, off]).

    item_feat_dim = 0 gives the mean-field ablation q(theta_i | r_i)
    (arXiv:2002.00276 section 6.4 compares VIBO against exactly this).
    chol=True widens the head by K(K-1)/2 Cholesky off-diagonal outputs
    (ability_head_dim); with zero bias init they start near 0, so training
    begins in the diagonal family and learns correlations only where the
    bound wants them.
    """
    in_dim = ability_encoder_input_dim(num_items, item_feat_dim)
    return init_mlp(key, [in_dim, hidden_dim, hidden_dim,
                          ability_head_dim(ability_dim, chol)])


def split_ability_head(out, ability_dim: int | None = None, axis: int = -1):
    """Head output -> (mu, clipped logvar, off | None).

    ability_dim=None: the head is (mu, logvar) halves (diagonal family,
    off=None — the historical contract). Otherwise the layout is
    [mu(K), logvar(K), off(K(K-1)/2)] along `axis` (axis=0 for the
    transposed (K, B) head)."""
    if ability_dim is None:
        mu, logvar = jnp.split(out, 2, axis=axis)
        return mu, jnp.clip(logvar, -8.0, 8.0), None
    k = ability_dim
    mu = jax.lax.slice_in_dim(out, 0, k, axis=axis)
    logvar = jax.lax.slice_in_dim(out, k, 2 * k, axis=axis)
    off = jax.lax.slice_in_dim(out, 2 * k, out.shape[axis], axis=axis)
    if off.shape[axis] == 0:
        off = None
    return mu, jnp.clip(logvar, -8.0, 8.0), off


def apply_ability_encoder(params, response, mask, item_feats=None,
                          compute_dtype=jnp.float32,
                          ability_dim: int | None = None,
                          cond_mats=None):
    """response/mask (..., B, M); item_feats (..., F) shared across persons.

    Returns (mu, logvar, off), each (..., B, K) (off None for the diagonal
    family, (..., B, K(K-1)/2) when ability_dim is passed and the head
    carries Cholesky outputs — split_ability_head).

    cond_mats: (A_r, A_m) from condition_stat_mats — the compressed
    (sufficient-statistic) conditioning pathway: the first-layer weight
    blocks are modulated W + A @ Wf instead of consuming a flat item_feats
    vector (condition_on='stats'; mutually exclusive with item_feats).

    TPU notes: the item-feature block of the first layer is factored out —
    item_feats is identical for every person in the batch, so its projection
    is computed ONCE as a (H,) vector and broadcast-added, instead of
    materializing a (B, F) tile and paying a B x F x H matmul (40% of the
    encoder FLOPs at M=1k, K=4). compute_dtype=bfloat16 runs the big matmuls
    natively on the MXU with f32 accumulation (params stay f32).
    """
    w1, rest = params[0], params[1:]
    m = response.shape[-1]
    two_m = 2 * m
    cd = compute_dtype
    w_r, w_m = modulated_first_layer(w1, cond_mats, m)
    # Split first layer: [r*m, m] @ W == (r*m) @ W[:M] + m @ W[M:2M].
    # Concat-free, so the (B, 2M) input never materializes in HBM — XLA
    # fuses the (packed-int8) decode straight into each matmul's operand
    # read. Algebraically identical to the concat form.
    rm = (response * mask).astype(cd)
    h = jax.lax.dot_general(
        rm, w_r.astype(cd),
        dimension_numbers=(((rm.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + jax.lax.dot_general(
        mask.astype(cd), w_m.astype(cd),
        dimension_numbers=(((mask.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if item_feats is not None:
        feat_proj = jax.lax.dot_general(
            item_feats.astype(cd), w1["w"][two_m:].astype(cd),
            dimension_numbers=(((item_feats.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h + feat_proj[..., None, :]
    x = jax.nn.relu(h + w1["b"])
    for layer in rest[:-1]:
        x = jax.nn.relu(
            jax.lax.dot_general(x.astype(cd), layer["w"].astype(cd),
                                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + layer["b"])
    out = linear(rest[-1], x)
    # logvar clamped for optimization stability (VAE-standard).
    return split_ability_head(out, ability_dim)


def apply_ability_encoder_packed(params, packed, item_feats=None,
                                 compute_dtype=jnp.float32,
                                 transposed_head: bool = False,
                                 ability_dim: int | None = None,
                                 cond_mats=None):
    """apply_ability_encoder consuming the int8 packed response code
    directly: the first layer runs the fused Pallas decode+dual-matmul
    kernel (ops/pallas_encoder), so the decoded response/mask matrices never
    materialize in HBM (measured ~0.17 ms of the 0.49 ms packed train step
    at 10k x 1k on v5e). Identical math to apply_ability_encoder on the
    decoded data (tested).

    transposed_head=True emits (mu, logvar) TRANSPOSED as (K, B): the head
    matmul contracts W^T @ x^T directly (no physical transpose), so the
    whole downstream theta pipeline — eps, reparameterization, KL — runs in
    the (K, B) row-major layout the transposed Pallas train kernels consume
    (see ops/pallas_elbo 'transposed-theta' section for why)."""
    from vibo_tpu.ops import pallas_encoder
    w1, rest = params[0], params[1:]
    m = packed.shape[-1]
    cd = compute_dtype
    # condition_on='stats': the fused int8 kernel runs on the RAW weight
    # blocks (sample-invariant — under the MC-sample vmap it is traced ONCE
    # and its backward receives the vmap-summed cotangent), and the
    # per-sample conditioning enters as the associativity-rearranged
    # correction (rm @ A_r) @ Wf_r + (m @ A_m) @ Wf_m == rm @ (A_r Wf_r) +
    # m @ (A_m Wf_m). Composing A @ Wf into the weights instead (the
    # round-4 first cut) batches the kernel's dW tiles over S and blows the
    # 16 MB VMEM stack at S=25 or hidden=1024 (measured Mosaic scoped-vmem
    # OOM at the flagship shape).
    h = pallas_encoder.packed_first_layer(packed, w1["w"][:m],
                                          w1["w"][m:2 * m], cd)
    if cond_mats is not None:
        a_r, a_m = cond_mats
        fr = a_r.shape[-1]
        wf = w1["w"][2 * m:]
        pk_f = packed.astype(jnp.float32)
        mk = jnp.minimum(pk_f, 1.0)
        rm = jnp.maximum(pk_f - 1.0, 0.0)
        s_r = jax.lax.dot_general(                      # (B, Fr)
            rm.astype(cd), a_r.astype(cd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_m = jax.lax.dot_general(                      # (B, Fm)
            mk.astype(cd), a_m.astype(cd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = (h + jax.lax.dot(s_r.astype(cd), wf[:fr].astype(cd),
                             preferred_element_type=jnp.float32)
             + jax.lax.dot(s_m.astype(cd), wf[fr:].astype(cd),
                           preferred_element_type=jnp.float32))
    if item_feats is not None:
        feat_proj = jax.lax.dot_general(
            item_feats.astype(cd), w1["w"][2 * m:].astype(cd),
            dimension_numbers=(((item_feats.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h + feat_proj[..., None, :]
    x = jax.nn.relu(h + w1["b"])
    for layer in rest[:-1]:
        x = jax.nn.relu(
            jax.lax.dot_general(x.astype(cd), layer["w"].astype(cd),
                                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + layer["b"])
    if transposed_head:
        outT = jax.lax.dot_general(   # (H, 2K) x (B, H) -> (2K, B)
            rest[-1]["w"], x, dimension_numbers=(((0,), (x.ndim - 1,)), ((), ())),
            preferred_element_type=jnp.float32) + rest[-1]["b"][:, None]
        return split_ability_head(outT, ability_dim, axis=0)
    out = linear(rest[-1], x)
    return split_ability_head(out, ability_dim)


def apply_ability_encoder_item_sharded(params, response, mask, item_sample,
                                       num_items_total: int, item_index,
                                       axis_name: str,
                                       compute_dtype=jnp.float32,
                                       ability_dim: int | None = None,
                                       cond_mats=None):
    """Ability encoder under ITEM-AXIS sharding (2D ('students','items')
    mesh): each shard holds the (B_local, M_local) column block
    [item_index*M_local, (item_index+1)*M_local) of the response matrix and
    the matching block of sampled item parameters.

    The first layer is a contraction over the item axis, so it shards
    naturally: each shard contracts its local columns against the
    corresponding ROWS of W1 (and of the item-feature block, per head), and
    the (B, H) partials psum over `axis_name`. The remaining layers are
    (H, H)-tiny and run replicated. Output is bitwise the same math as
    apply_ability_encoder on the full matrix (tested sharded == replicated).

    item_sample: {name: (M_local, D)} local block, or None for the
    mean-field ablation (no item conditioning).
    cond_mats: condition_on='stats' — (A_r, A_m) LOCAL blocks from
    condition_stat_mats(local item sample, num_items=GLOBAL M). The shared
    Wf rows (at 2*M_total) modulate this shard's weight blocks; the psum
    below then sums the per-shard statistics into the exact global
    conditioning, since sum_shards (rm_loc @ (W_loc + A_loc Wf)) ==
    rm @ W + (rm @ A) @ Wf. Mutually exclusive with item_sample.
    """
    w1, rest = params[0], params[1:]
    m_l = response.shape[-1]
    off = item_index * m_l
    cd = compute_dtype

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(cd), w.astype(cd),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rm = response * mask
    w_r = jax.lax.dynamic_slice_in_dim(w1["w"], off, m_l, 0)
    w_m = jax.lax.dynamic_slice_in_dim(w1["w"], num_items_total + off, m_l, 0)
    if cond_mats is not None:
        assert item_sample is None, "cond_mats and item_sample are exclusive"
        a_r, a_m = cond_mats
        fr = a_r.shape[-1]
        wf = w1["w"][2 * num_items_total:]
        w_r = w_r + a_r @ wf[:fr]
        w_m = w_m + a_m @ wf[fr:]
    h = mm(rm, w_r) + mm(mask, w_m)
    if item_sample is not None:
        # feats layout matches flatten_item_sample: sorted keys, each an
        # item-major (M*D,) block starting at 2M + sum of earlier blocks
        base = 2 * num_items_total
        for name in sorted(item_sample):
            s = item_sample[name]                       # (M_l, D)
            d = s.shape[-1]
            w_f = jax.lax.dynamic_slice_in_dim(w1["w"], base + off * d,
                                               m_l * d, 0)
            h = h + mm(s.reshape(-1), w_f)[None, :]
            base += num_items_total * d
    h = jax.lax.psum(h, axis_name)
    x = jax.nn.relu(h + w1["b"])
    for layer in rest[:-1]:
        x = jax.nn.relu(mm(x, layer["w"]) + layer["b"])
    out = linear(rest[-1], x)
    return split_ability_head(out, ability_dim)


# ------------------------------------------------------ item posteriors

def item_head_spec(irt_model: str, ability_dim: int,
                   item_latent_dim: int = 0, num_categories: int = 2) -> dict:
    """Ordered {param_name: dim} for one item's parameters under each link.

    grm / gpcm: "b" holds the C-1 UNCONSTRAINED coordinates (ordered
    cutpoints via links.grm_thresholds for grm; raw partial-credit steps,
    links.gpcm_cumsteps, for gpcm), so the Gaussian prior/posterior
    machinery below is link-agnostic."""
    if irt_model == "1pl":
        return {"b": 1}
    if irt_model == "2pl":
        return {"a": ability_dim, "b": 1}
    if irt_model == "3pl":
        return {"a": ability_dim, "b": 1, "g_hat": 1}
    if irt_model in ("grm", "gpcm"):
        return {"a": ability_dim, "b": num_categories - 1}
    if irt_model == "deep":
        return {"d": item_latent_dim}
    raise ValueError(irt_model)


def init_item_posterior(key, num_items: int, irt_model: str, ability_dim: int,
                        item_latent_dim: int = 0, num_categories: int = 2):
    """Per-item free-form Gaussian posteriors q(d_j | r).

    For the training items, the optimal amortized q(d|r) reduces to one
    Gaussian per item; we parameterize those directly (SURVEY.md section 3.3
    allows "free params and/or amortized"). Keys present depend on the link:
      1pl: b            2pl: a, b           3pl: a, b, g_hat
      deep: d (latent vector of dim item_latent_dim)
    Each entry holds {'mu': (M, D), 'logvar': (M, D)} with logvar init -2
    (sigma ~ 0.37) so early ELBO gradients are informative.
    """
    def gauss(k, dim):
        mu = 0.1 * jax.random.normal(k, (num_items, dim), jnp.float32)
        return {"mu": mu, "logvar": jnp.full((num_items, dim), -2.0, jnp.float32)}

    keys = jax.random.split(key, 4)
    if irt_model == "1pl":
        return {"b": gauss(keys[0], 1)}
    if irt_model == "2pl":
        return {"a": gauss(keys[0], ability_dim), "b": gauss(keys[1], 1)}
    if irt_model == "3pl":
        return {"a": gauss(keys[0], ability_dim), "b": gauss(keys[1], 1),
                "g_hat": gauss(keys[2], 1)}
    if irt_model in ("grm", "gpcm"):
        return {"a": gauss(keys[0], ability_dim),
                "b": gauss(keys[1], num_categories - 1)}
    if irt_model == "deep":
        return {"d": gauss(keys[3], item_latent_dim)}
    raise ValueError(irt_model)


def item_feat_dim(num_items: int, irt_model: str, ability_dim: int,
                  item_latent_dim: int = 0, num_categories: int = 2) -> int:
    """Flattened width of one item-parameter sample (encoder conditioning)."""
    dims = {"1pl": 1, "2pl": ability_dim + 1, "3pl": ability_dim + 2,
            "grm": ability_dim + num_categories - 1,
            "gpcm": ability_dim + num_categories - 1,
            "deep": item_latent_dim}[irt_model]
    return num_items * dims


def flatten_item_sample(sample: dict) -> jax.Array:
    """Deterministically flatten an item-sample dict to a feature vector."""
    parts = [sample[k].reshape(sample[k].shape[:-2] + (-1,)) for k in sorted(sample)]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------- compressed (sufficient-statistic) conditioning

def condition_stat_dim(irt_model: str, ability_dim: int,
                       item_latent_dim: int = 0) -> tuple[int, int]:
    """(Fr, Fm): widths of the r-path and m-path interaction statistics of
    condition_stat_mats. Encoder input width under condition_on='stats' is
    2*num_items + Fr + Fm — e.g. 25 at K=4 2PL vs the raw flatten's
    num_items*(K+1) = 5,120 at M=1,024 (the pathway RESULTS.md measured
    entraining the collapsed K=4 basin)."""
    k = ability_dim
    if irt_model == "deep":
        return item_latent_dim, item_latent_dim
    if irt_model == "1pl":
        return 1, 2                            # [b] | [b, b^2]
    # grm enters the 2pl formulas: its threshold vector is reduced to the
    # mean cutpoint (condition_stat_mats), the difficulty-like scalar
    fr = k + 1 + (1 if irt_model == "3pl" else 0)
    fm = (k + 1) + k + 1 + (k * (k + 1)) // 2 \
        + (1 if irt_model == "3pl" else 0)
    return fr, fm


def condition_stat_mats(item_sample: dict, num_items: int,
                        irt_model: str) -> tuple[jax.Array, jax.Array]:
    """Per-item matrices (A_r (M, Fr), A_m (M, Fm)) such that
    [(r*m) @ A_r, m @ A_m] are the SUFFICIENT interaction statistics of the
    structured posterior q(theta | r, d).

    For a 2PL likelihood the exact Gaussian pseudo-posterior over theta_i
    depends on (r_i, m_i, d) ONLY through sum_j m_ij r_ij a_j, sum_j m_ij a_j,
    sum_j m_ij a_j b_j and the Fisher matrix sum_j m_ij a_j a_j^T — O(K^2)
    numbers, not O(M*K). Conditioning on these instead of flat(d)
    (condition_on='stats' vs 'sample'/'mean') keeps the paper's
    q(theta|d,r) q(d|r) factorization while collapsing the encoder's
    item-feature pathway from M*(K+1) inputs to ~25 at K=4.

    TPU-first: the statistics enter the encoder as a data-dependent
    modulation of the FIRST-LAYER WEIGHTS — W_r_eff = W_r + A_r @ Wf_r,
    W_m_eff = W_m + A_m @ Wf_m — so every existing first-layer path (dense
    dual-matmul, fused int8 Pallas kernel, item-sharded psum) runs unchanged
    on the modulated weights; the extra cost is one (M, F) x (F, H) matmul
    per step, ~0.05% of the encoder FLOPs at the flagship shape.

    Entries are scaled by 1/sqrt(M) so the summed statistics keep ~unit
    scale under Glorot-initialized Wf blocks. Gradients flow to the item
    posterior through A_r/A_m (the structured-VI coupling)."""
    s = 1.0 / jnp.sqrt(jnp.float32(num_items))
    if irt_model == "deep":
        d = item_sample["d"]
        return s * d, s * d
    b = item_sample["b"]                                       # (M, 1)
    if b.shape[-1] > 1:
        # polytomous: the C-1 unconstrained coordinates collapse to the
        # difficulty-like sufficient summary — the mean ORDERED cutpoint
        # (grm) or the mean partial-credit step, i.e. the classical item
        # location (gpcm)
        from vibo_tpu.ops import links as _links
        b = (_links.grm_thresholds(b).mean(-1, keepdims=True)
             if irt_model == "grm" else b.mean(-1, keepdims=True))
    if irt_model == "1pl":
        return s * b, s * jnp.concatenate([b, b * b], -1)
    a = item_sample["a"]                                       # (M, K)
    k = a.shape[-1]
    pairs = [a[..., i:i + 1] * a[..., j:j + 1]
             for i in range(k) for j in range(i, k)]
    r_parts = [a, b]
    m_parts = [a, b, a * b, b * b] + pairs
    if irt_model == "3pl":
        g = item_sample["g_hat"]
        r_parts.append(g)
        m_parts.append(g)
    return (s * jnp.concatenate(r_parts, -1),
            s * jnp.concatenate(m_parts, -1))


def modulated_first_layer(w1: dict, cond_mats, num_items: int):
    """(W_r_eff (M, H), W_m_eff (M, H)) with the conditioning statistics
    composed into the weights (see condition_stat_mats). cond_mats=None
    returns the raw blocks."""
    m = num_items
    w_r, w_m = w1["w"][:m], w1["w"][m:2 * m]
    if cond_mats is None:
        return w_r, w_m
    a_r, a_m = cond_mats
    fr = a_r.shape[-1]
    wf = w1["w"][2 * m:]
    return w_r + a_r @ wf[:fr], w_m + a_m @ wf[fr:]


# ------------------------------------------- amortized item encoder

ITEM_STAT_DIM = 6


def item_stats(response, mask, axis_name: str | None = None,
               num_persons=None, item_axis_name: str | None = None):
    """Permutation-invariant per-item column statistics (M, 6): the amortized
    item encoder's input, from a (B, M) masked response matrix.

    Classical-test-theory sufficient statistics — item p-value (difficulty
    evidence), respondent mean raw score, item-total covariance and
    point-biserial correlation (discrimination evidence), observed fraction,
    log count. Pooling over persons makes the encoder invariant to both the
    number and the order of respondents, so NEW items (arbitrary response
    columns) score through the same network — the cold-start path the
    free-form per-item posterior cannot provide (paper section 4's inference
    networks; SURVEY.md section 3.3 "VIBO encoders").

    axis_name: inside shard_map with students sharded, psum the column
    partial sums over this axis so the statistics are global and the result
    is device-count-invariant. Always computed in f32 (stats are tiny).
    item_axis_name: on a 2D ('students','items') mesh each shard holds only
    an item BLOCK of each row, so the per-person raw score must pool over
    this axis too (exactness vs the unsharded stats is tested).
    """
    m = mask.astype(jnp.float32)
    r = response.astype(jnp.float32) * m
    row_cnt = m.sum(-1, keepdims=True)
    row_sum = r.sum(-1, keepdims=True)
    if item_axis_name is not None:
        row_cnt = jax.lax.psum(row_cnt, item_axis_name)
        row_sum = jax.lax.psum(row_sum, item_axis_name)
    # person raw score: the data-only ability proxy whose cross-moments with
    # the item column carry the discrimination signal
    s = row_sum / jnp.maximum(row_cnt, 1.0)                      # (B, 1)
    partial = jnp.stack([
        r.sum(-2),                 # successes per item
        m.sum(-2),                 # attempts per item
        (s * m).sum(-2),           # sum of respondent scores
        (s * r).sum(-2),           # score-weighted successes
        (s * s * m).sum(-2),       # sum of squared scores
    ])
    n_local = jnp.float32(mask.shape[-2])
    if axis_name is not None:
        partial = jax.lax.psum(partial, axis_name)
        n_local = n_local * jax.lax.axis_size(axis_name)
    if num_persons is None:
        num_persons = n_local
    succ, cnt, s_sum, rs_sum, ss_sum = partial
    denom = jnp.maximum(cnt, 1.0)
    p = succ / denom
    ms = s_sum / denom
    rs = rs_sum / denom
    ss = ss_sum / denom
    cov = rs - p * ms
    var_s = jnp.maximum(ss - ms * ms, 0.0)
    corr = cov * jax.lax.rsqrt(var_s * jnp.maximum(p * (1.0 - p), 1e-6) + 1e-6)
    frac = cnt / jnp.maximum(num_persons, 1.0)
    return jnp.stack([p, ms, cov, corr, frac, jnp.log1p(cnt)], axis=-1)


def init_item_encoder(key, irt_model: str, ability_dim: int,
                      item_latent_dim: int = 0, hidden_dim: int = 64,
                      num_categories: int = 2):
    """q(d_j | r_:,j): MLP from the item's column statistics to (mu, logvar)
    for every item-parameter head. Item-count-independent by construction.

    Output-bias init breaks the theta–a chicken-and-egg at the start of
    training: a shared MLP outputs near-identical tiny a_mu for every item,
    under which theta is unidentified and the discrimination gradient
    vanishes (the free-form posterior escapes this via its per-item random
    init). Biasing a_mu to 1.0 (the classical MLE/EM init) and logvar to -2
    (matching init_item_posterior) makes theta identified from step one.
    """
    spec = item_head_spec(irt_model, ability_dim, item_latent_dim,
                          num_categories)
    total = sum(spec.values())
    params = init_mlp(key, [ITEM_STAT_DIM, hidden_dim, hidden_dim, 2 * total])
    bias = jnp.zeros((2 * total,), jnp.float32)
    off = 0
    for name in sorted(spec):
        d = spec[name]
        if name == "a":
            bias = bias.at[off:off + d].set(1.0)
        bias = bias.at[total + off:total + off + d].set(-2.0)
        off += d
    params[-1]["b"] = bias
    return params


def init_item_residual(key, num_items: int, irt_model: str, ability_dim: int,
                       item_latent_dim: int = 0, num_categories: int = 2):
    """Free per-item residuals added to the amortized posterior for TRAINING
    items (semi-amortized VI).

    Why they are necessary and not an extra: a purely shared encoder ties
    every item's discrimination to a handful of statistics, so the
    theta<->a saddle (theta unidentified while a ~ 0, zero gradient both
    ways) cannot be escaped by per-item symmetry breaking — measured: a_mu
    collapses to |a| < 0.03 and theta recovery ~ 0.01 while b recovers 0.98.
    The 0.1-sigma per-item noise below restores exactly the free-form
    posterior's escape dynamics; new items simply have no residual (the
    encoder alone scores them)."""
    spec = item_head_spec(irt_model, ability_dim, item_latent_dim,
                          num_categories)
    keys = jax.random.split(key, len(spec))
    return {name: {
                "mu": 0.1 * jax.random.normal(k, (num_items, spec[name]),
                                              jnp.float32),
                "logvar": jnp.zeros((num_items, spec[name]), jnp.float32)}
            for k, name in zip(keys, sorted(spec))}


def apply_item_encoder(params, stats, spec: dict, residual: dict | None = None
                       ) -> dict:
    """stats (M, 6) -> {name: {'mu': (M, D), 'logvar': (M, D)}} keyed/ordered
    like init_item_posterior (sorted-key flattening contract).

    residual: per-item free offsets (init_item_residual) added for training
    items; None for unseen items (cold-start uses the shared encoder alone).
    """
    out = mlp(params, stats)                       # (M, 2 * total)
    total = out.shape[-1] // 2
    mu_all, logvar_all = out[..., :total], out[..., total:]
    post, off = {}, 0
    for name in sorted(spec):
        d = spec[name]
        mu = mu_all[..., off:off + d]
        logvar = logvar_all[..., off:off + d]
        if residual is not None:
            mu = mu + residual[name]["mu"]
            logvar = logvar + residual[name]["logvar"]
        post[name] = {"mu": mu, "logvar": jnp.clip(logvar, -8.0, 8.0)}
        off += d
    return post


# ------------------------------------------------------------ deep link

def init_deep_link(key, ability_dim: int, item_latent_dim: int, hidden_dim: int):
    """p(r_ij | theta_i, d_j) = Bernoulli(sigmoid(MLP([theta_i, d_j]))).

    First layer is stored split (w_theta, w_item) so apply() is two big
    matmuls + a broadcast add instead of materializing B*M concat inputs.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jnp.sqrt(6.0 / (ability_dim + item_latent_dim + hidden_dim))
    return {
        "w_theta": jax.random.uniform(k1, (ability_dim, hidden_dim), jnp.float32, -scale, scale),
        "w_item": jax.random.uniform(k2, (item_latent_dim, hidden_dim), jnp.float32, -scale, scale),
        "b1": jnp.zeros((hidden_dim,), jnp.float32),
        "layer2": init_linear(k3, hidden_dim, hidden_dim),
        "out": init_linear(k4, hidden_dim, 1),
    }


def apply_deep_link(params, theta, d, item_chunk: int = 0,
                    compute_dtype=jnp.float32):
    """theta (..., B, K), d (..., M, D) -> logits (..., B, M).

    item_chunk > 0 streams item blocks through a lax.map with
    rematerialization: peak memory drops from O(B*M*H) to O(B*chunk*H)
    (the deep link's "long-context" story — blockwise item tiling, SURVEY.md
    section 6), at the cost of recomputing activations in the backward pass.

    compute_dtype=bfloat16 runs the pairwise-MLP matmuls (the B*M*H*H bulk
    of the FLOPs) natively on the MXU with f32 accumulation — ~4x the f32
    MXU rate on v5e; the logit comes back in f32.
    """
    m = d.shape[-2]
    if item_chunk and m > item_chunk:
        pad = (-m) % item_chunk
        d_p = jnp.pad(d, [(0, 0)] * (d.ndim - 2) + [(0, pad), (0, 0)])
        n_chunks = d_p.shape[-2] // item_chunk
        # move chunk axis to front for lax.map
        d_c = jnp.moveaxis(
            d_p.reshape(d_p.shape[:-2] + (n_chunks, item_chunk, d.shape[-1])),
            -3, 0)

        f = jax.checkpoint(lambda dc: apply_deep_link(
            params, theta, dc, compute_dtype=compute_dtype))
        logits_c = jax.lax.map(f, d_c)            # (nc, ..., B, chunk)
        logits = jnp.moveaxis(logits_c, 0, -2)    # (..., B, nc, chunk)
        logits = logits.reshape(logits.shape[:-2] + (n_chunks * item_chunk,))
        return logits[..., :m]
    cd = compute_dtype

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(cd), w.astype(cd),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    ht = mm(theta, params["w_theta"])                   # (..., B, H)
    hd = mm(d, params["w_item"])                        # (..., M, H)
    h = jax.nn.relu(ht[..., :, None, :] + hd[..., None, :, :] + params["b1"])
    h = jax.nn.relu(mm(h, params["layer2"]["w"]) + params["layer2"]["b"])
    return (mm(h, params["out"]["w"]) + params["out"]["b"])[..., 0]
