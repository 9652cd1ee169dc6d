"""Fused Pallas TPU kernel for the deep nonlinear link (training path).

The deep link (arXiv:2002.00276 section 5.3; SURVEY.md section 3.3 "deep
variant") scores every (student, item) pair with a 2-hidden-layer MLP:

    pre1_ij = theta_i @ Wt + d_j @ Wi + b1        (split first layer)
    h1 = relu(pre1);  h2 = relu(h1 @ W2 + b2);  logit = h2 @ wo + bo
    ll_ij = mask * (r * logit - softplus(logit))

The XLA path (models/networks.apply_deep_link) must materialize the
(B, M, H) activations in HBM between the two matmuls — even chunked+remat it
is bandwidth-bound. This kernel keeps the pairwise activations entirely in
VMEM per (student-tile x item-tile) and, like ops.pallas_elbo's one-pass
training kernel, exploits the training loss's UNIFORM per-person cotangent
to emit the loglik AND every gradient in the same single pass.

Work split (shaped by what Mosaic supports):
- The tiny row/column projections t1 = theta @ Wt + b1, t2 = d @ Wi are
  computed OUTSIDE the kernel by XLA (K=4 / D=16 contractions are not
  tileable anyway, and matmul-produced operands feeding broadcasts trip
  Mosaic relayout). The kernel reads t1/t2 directly.
- Pairwise tensors stay rank-3 (tb, tm, H): Mosaic handles last-dim and
  batch-dim dot_generals on 3D operands, but NOT (tb,tm)<->(tb*tm,1)
  lane<->sublane reshapes.
- The kernel outputs ll plus the sufficient statistics s_theta (B,H),
  s_d (M,H) (first-layer pre-activation cotangent sums) and the W2/b2/wo/bo
  gradients; the VJP finishes dtheta/dd/dWt/dWi/db1 with cheap 2D XLA
  matmuls. s_theta rows are per-person, so dtheta/dWt/db1 are exact for ANY
  cotangent; the pooled outputs (s_d, dW2, ...) carry the uniform-cotangent
  contract.

Matmuls run in bf16 with f32 accumulation (MXU-native); elementwise math in
f32. Weight-gradient output blocks are revisited every grid step and
reload-accumulate through HBM — (H,H) is ~64 KB, negligible next to the
saved (B,M,H) activation traffic.

Requires hidden_dim % 128 == 0 (lane width); callers fall back to the XLA
path otherwise. Verified against the pure-JAX deep link in interpret mode
(tests/test_pallas_deep.py) and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vibo_tpu.ops.pallas_elbo import _cdiv, _decode_packed, _is_tpu

STUDENT_BLOCK = 32   # (tb, tm, H) f32 VMEM tiles: 4 live x 2 MB fits the
ITEM_BLOCK = 128     # 16 MB VMEM budget (tb=64 measured 18.8 MB: OOM)


def _dot(x, w, contract=((1,), (0,)), dtype=jnp.bfloat16):
    # precision is pinned EXPLICITLY per operand dtype: an inherited ambient
    # jax.default_matmul_precision("highest") (HMC wraps everything in it)
    # stamps contract_precision<fp32> onto these dots, and Mosaic rejects
    # fp32 contraction of bf16 vectors ("Bad lhs type" — the round-2..4
    # deep-HMC fence traced to exactly this, NOT to the chain-vmap batch
    # dim). bf16 operands always contract at DEFAULT (bf16 multiply, f32
    # accumulate — this kernel's documented contract); f32 operands at
    # HIGHEST (true f32 passes), both independent of the caller's context.
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        x.astype(dtype), w.astype(dtype),
        dimension_numbers=(contract, ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)


def _fused_deep_kernel(t1_ref, t2_ref, w2_ref, b2_ref, wo_ref, bo_ref, pk_ref,
                       ll_ref, sth_ref, sd_ref, dw2_ref, db2_ref, dwo_ref,
                       dbo_ref, *, dot_dtype):
    i, j = pl.program_id(0), pl.program_id(1)

    # ------------------------------------------------------------ forward
    pre1 = t1_ref[:][:, None, :] + t2_ref[:][None, :, :]   # (tb, tm, H)
    h1 = jnp.maximum(pre1, 0.0)
    pre2 = _dot(h1, w2_ref[:], contract=((2,), (0,)),
                dtype=dot_dtype) + b2_ref[:]
    h2 = jnp.maximum(pre2, 0.0)                            # (tb, tm, H)
    wo_row = wo_ref[:][0]                                  # (H,)
    logit = (h2 * wo_row).sum(axis=-1) + bo_ref[0, 0]      # (tb, tm)

    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    e = jnp.exp(-jnp.abs(logit))
    log1p_e = jnp.log1p(e)
    sp_pos = log1p_e + jnp.maximum(logit, 0.0)             # softplus(logit)
    ll_cell = -m * jnp.where(r > 0.5, sp_pos - logit, sp_pos)
    inv = 1.0 / (1.0 + e)
    s = jnp.where(logit >= 0, inv, 1.0 - inv)              # sigmoid(logit)
    dlogit = m * (r - s)                                   # (tb, tm)

    # ----------------------------------------------------------- backward
    dl3 = dlogit[:, :, None]                               # (tb, tm, 1)
    dwo_part = (h2 * dl3).sum(axis=0).sum(axis=0, keepdims=True)   # (1, H)
    dbo_part = dlogit.sum(axis=0, keepdims=True).sum(axis=1,
                                                     keepdims=True)
    dpre2 = jnp.where(pre2 > 0, dl3 * wo_row, 0.0)         # (tb, tm, H)
    dw2_part = jax.lax.dot_general(                        # (H, H)
        h1.astype(dot_dtype), dpre2.astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=(jax.lax.Precision.HIGHEST if dot_dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32).sum(axis=0)
    db2_part = dpre2.sum(axis=0).sum(axis=0, keepdims=True)  # (1, H)
    dh1 = _dot(dpre2, w2_ref[:], contract=((2,), (1,)),
               dtype=dot_dtype)                            # (tb, tm, H)
    dpre1 = jnp.where(h1 > 0, dh1, 0.0)
    sth_part = dpre1.sum(axis=1)                           # (tb, H)
    sd_part = dpre1.sum(axis=0)                            # (tm, H)
    ll_part = ll_cell.sum(axis=1, keepdims=True)           # (tb, 1)

    # -------------------------------------------------- accumulate outputs
    @pl.when(j == 0)
    def _():
        ll_ref[:] = ll_part
        sth_ref[:] = sth_part

    @pl.when(j > 0)
    def _():
        ll_ref[:] = ll_ref[:] + ll_part
        sth_ref[:] = sth_ref[:] + sth_part

    @pl.when(i == 0)
    def _():
        sd_ref[:] = sd_part

    @pl.when(i > 0)
    def _():
        sd_ref[:] = sd_ref[:] + sd_part

    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        dw2_ref[:] = dw2_part
        db2_ref[:] = db2_part
        dwo_ref[:] = dwo_part
        dbo_ref[:] = dbo_part

    @pl.when(jnp.logical_not(first))
    def _():
        dw2_ref[:] = dw2_ref[:] + dw2_part
        db2_ref[:] = db2_ref[:] + db2_part
        dwo_ref[:] = dwo_ref[:] + dwo_part
        dbo_ref[:] = dbo_ref[:] + dbo_part


def _fused_deep_fwd(theta, d, link, packed, interpret, f32_dots=False):
    bsz0, m0 = theta.shape[0], d.shape[0]
    h = link["w_theta"].shape[1]
    # row/column projections outside the kernel (see module docstring)
    t1 = _dot(theta, link["w_theta"], dtype=jnp.float32) + link["b1"]
    t2 = _dot(d, link["w_item"], dtype=jnp.float32)
    # f32 dots keep every pairwise (tb, tm, H) tensor in f32 (no bf16 copy
    # shrinks the dot operands), which overflows the 16 MB scoped-VMEM
    # budget at tb=32 (measured 16.66M on v5e) — halve the student tile
    tb_cap = STUDENT_BLOCK // 2 if f32_dots else STUDENT_BLOCK
    tb = min(tb_cap, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    pb, pm = (-bsz0) % tb, (-m0) % tm
    if pb or pm:
        t1 = jnp.pad(t1, ((0, pb), (0, 0)))
        t2 = jnp.pad(t2, ((0, pm), (0, 0)))
        packed = jnp.pad(packed, ((0, pb), (0, pm)))  # 0 == missing: inert
    bsz, m = t1.shape[0], t2.shape[0]
    grid = (_cdiv(bsz, tb), _cdiv(m, tm))

    full = lambda shape, idx: pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)
    dot_dtype = jnp.float32 if f32_dots else jnp.bfloat16
    outs = pl.pallas_call(
        functools.partial(_fused_deep_kernel, dot_dtype=dot_dtype),
        grid=grid,
        in_specs=[
            full((tb, h), lambda i, j: (i, 0)),
            full((tm, h), lambda i, j: (j, 0)),
            full((h, h), lambda i, j: (0, 0)),
            full((1, h), lambda i, j: (0, 0)),
            full((1, h), lambda i, j: (0, 0)),
            full((1, 1), lambda i, j: (0, 0)),
            full((tb, tm), lambda i, j: (i, j)),
        ],
        out_specs=[
            full((tb, 1), lambda i, j: (i, 0)),
            full((tb, h), lambda i, j: (i, 0)),
            full((tm, h), lambda i, j: (j, 0)),
            full((h, h), lambda i, j: (0, 0)),
            full((1, h), lambda i, j: (0, 0)),
            full((1, h), lambda i, j: (0, 0)),
            full((1, 1), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, h), jnp.float32),
            jax.ShapeDtypeStruct((m, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * m * 6 * h * (h + 4),
            bytes_accessed=bsz * m + 4 * (2 * (bsz + m) * h + 3 * h * h),
            transcendentals=2 * bsz * m),
        interpret=interpret,
    )(t1, t2, link["layer2"]["w"], link["layer2"]["b"].reshape(1, h),
      link["out"]["w"].reshape(1, h), link["out"]["b"].reshape(1, 1), packed)
    ll, sth, sd, dw2, db2, dwo, dbo = outs
    return (ll[:bsz0, 0], sth[:bsz0], sd[:m0],
            {"w2": dw2, "b2": db2[0], "wo": dwo, "bo": dbo[0]})


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _masked_loglik_deep_packed_train(theta, d, link, packed, interpret,
                                     f32_dots):
    return _fused_deep_fwd(theta, d, link, packed, interpret, f32_dots)[0]


def _fwd_rule(theta, d, link, packed, interpret, f32_dots):
    ll, sth, sd, wgrads = _fused_deep_fwd(theta, d, link, packed, interpret,
                                          f32_dots)
    return ll, (theta, d, link, sth, sd, wgrads)


def _bwd_rule(interpret, f32_dots, residuals, g):
    theta, d, link, sth, sd, wgrads = residuals
    # per-person outputs: exact for any cotangent
    gsth = g[:, None] * sth
    dtheta = _dot(gsth, link["w_theta"], contract=((1,), (1,)),
                  dtype=jnp.float32)
    dwt = _dot(theta, gsth, contract=((0,), (0,)), dtype=jnp.float32)
    db1 = gsth.sum(axis=0)
    # person-pooled outputs: uniform-cotangent contract
    g0 = g.reshape(-1)[0]
    dd = g0 * _dot(sd, link["w_item"], contract=((1,), (1,)),
                   dtype=jnp.float32)
    dwi = g0 * _dot(d, sd, contract=((0,), (0,)), dtype=jnp.float32)
    h = link["w_theta"].shape[1]
    dlink = {
        "w_theta": dwt, "w_item": dwi, "b1": db1,
        "layer2": {"w": g0 * wgrads["w2"], "b": g0 * wgrads["b2"]},
        "out": {"w": (g0 * wgrads["wo"]).reshape(h, 1),
                "b": g0 * wgrads["bo"]},
    }
    return dtheta, dd, dlink, None


_masked_loglik_deep_packed_train.defvjp(_fwd_rule, _bwd_rule)


def supports(link_params: dict) -> bool:
    """Kernel preconditions: hidden width is lane-aligned."""
    h = link_params["w_theta"].shape[1]
    return h % 128 == 0


def masked_loglik_deep_packed_train(theta: jax.Array, d: jax.Array,
                                    link_params: dict, packed: jax.Array,
                                    interpret: bool | None = None,
                                    f32_dots: bool = False) -> jax.Array:
    """One-pass deep-link training loglik from packed responses -> (B,).

    Value == masked_loglik_per_person(apply_deep_link(link_params, theta, d),
    r, m); gradients (theta, d, and every link weight) are precomputed in the
    same kernel pass under the UNIFORM-COTANGENT CONTRACT (see
    pallas_elbo.masked_loglik_2pl_packed_train) — use only where the
    per-person logliks get one shared weight (.sum() into the loss).

    f32_dots=True contracts the in-kernel pairwise matmuls in true f32
    (HIGHEST) instead of the default bf16-multiply/f32-accumulate — the
    mode HMC needs: bf16 operand rounding perturbs per-cell logliks by
    ~2e-3 relative, which summed over ~1e5+ cells is a dH noise floor a
    Metropolis test cannot shrug off (models/hmc.run_hmc docstring). Either
    mode lowers under any ambient matmul-precision context — the kernel
    pins its contraction precision explicitly.
    """
    if interpret is None:
        interpret = not _is_tpu()
    theta = theta.astype(jnp.float32)
    d = d.astype(jnp.float32)
    link_params = jax.tree.map(lambda x: x.astype(jnp.float32), link_params)
    if theta.ndim == 2:
        return _masked_loglik_deep_packed_train(theta, d, link_params, packed,
                                                interpret, f32_dots)
    fn = lambda th, dd: masked_loglik_deep_packed_train(
        th, dd, link_params, packed, interpret=interpret, f32_dots=f32_dots)
    return jax.vmap(fn)(theta, d)
