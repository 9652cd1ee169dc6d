"""Fused Pallas TPU kernel: masked GENERALIZED PARTIAL CREDIT (GPCM)
log-likelihood over the student x item matrix — the adjacent-category
sibling of ops/pallas_grm.py's graded kernel (ops/likelihood.py holds the
pure-XLA semantics this kernel must match).

Why a dedicated kernel (same argument as the graded one): the XLA
polytomous path decodes the int8 code into f32 (B, M) response+mask
matrices in HBM, re-reads them per MC sample, and rematerializes the
C-way softmax chain in its backward pass. This kernel keeps the binary
pipeline's structure — one pass per (student-tile, item-tile):

    base = theta_t @ a_t^T on the MXU (f32 accumulation);
    decode (mask, category) from the int8 tile in VMEM;
    z_c = c * base - kap_c streamed by an unrolled C-way scan with a
    running max (z_0 = 0), so no (B, M, C) tensor ever exists;
    C-1 exp + ONE log per cell produce the value AND every gradient via
    the exponential-family softmax identities:
      ll           = z_r - max - log(sum_c e^{z_c - max})
      d/d(base)    = r - E[c]              (observed minus expected score)
      d/d(kap_c)   = p_c - 1[r = c]
    E[c] and the p_c come from the SAME exponentials (held in registers —
    C is small and static), so the gradient costs no extra transcendental.

  The (B, M) base matrix never exists in HBM; gradients accumulate in VMEM
  exactly like the binary/graded one-pass kernels (ll/dtheta revisited
  consecutively over item tiles; da/dkap reload-accumulate, tiny blocks).

Uniform-cotangent contract (same as masked_loglik_grm_packed_train):
dtheta is exact for any per-person cotangent; da/dkap assume every
person's loglik gets the same weight — the elbo_packed / iwae_packed /
DP / 2D-sharded training paths, where the per-sample loss is ll.sum().

The kap operand is the CUMULATIVE STEP SUMS (links.gpcm_cumsteps of the
unconstrained steps); callers differentiate through that tiny (M, C-1)
cumsum in plain JAX, so this kernel's dkap chains into it automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vibo_tpu.ops.pallas_elbo import (ITEM_BLOCK, STUDENT_BLOCK, _cdiv,
                                      _has_vma, _is_tpu, match_vma, out_sds)

# Above this many categories the kernel would hold C-1 tile-sized
# exponential registers (the p_c gradient rows need them after the
# normalizer is final); fall back to the XLA twin instead of risking a
# VMEM spill. The perf path (C ~ 5) is far below it.
_MAX_FUSED_CATEGORIES = 16


def _xla_train_gpcm(theta, a, kap, packed):
    """Pure-XLA twin (per-person ll) for interpret-mode shard_map contexts
    (the vma fence — see pallas_elbo.py) and as the test oracle. XLA
    autodiff subsumes the uniform-cotangent contract."""
    from vibo_tpu.ops import likelihood as lik
    pk = packed.astype(jnp.float32)
    m = jnp.minimum(pk, 1.0)
    r = jnp.maximum(pk - 1.0, 0.0)
    base = jnp.dot(theta, a.T, preferred_element_type=jnp.float32)
    return lik.gpcm_loglik_cells(base, kap, r, m).sum(-1)


def _fused_train_kernel_gpcm(theta_ref, a_ref, kapt_ref, pk_ref,
                             ll_ref, dth_ref, da_ref, dkap_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    cm1 = kapt_ref.shape[0]                       # C-1 (static)
    base = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    pk = pk_ref[:].astype(jnp.float32)
    m = jnp.minimum(pk, 1.0)
    r = pk - 1.0                                  # category; -1 for missing
    # streaming max over z_c (z_0 = 0) + observed-category logit select;
    # z_c recomputed in the exp loop (one mul-add — cheaper than storing)
    mx = jnp.zeros_like(base)
    zr = jnp.zeros_like(base)
    for c in range(cm1):
        z = (c + 1.0) * base - kapt_ref[c:c + 1, :]
        mx = jnp.maximum(mx, z)
        zr = jnp.where(r == c + 1, z, zr)
    # one exp per category per cell; the exponentials stay in registers for
    # the p_c gradient rows below (C small/static)
    s = jnp.exp(-mx)                              # category-0 term
    ec = jnp.zeros_like(base)
    es = []
    for c in range(cm1):
        e = jnp.exp((c + 1.0) * base - kapt_ref[c:c + 1, :] - mx)
        es.append(e)
        s = s + e
        ec = ec + (c + 1.0) * e
    inv_s = 1.0 / s
    ll_cell = m * (zr - mx - jnp.log(s))
    dbase = m * (r - ec * inv_s)                  # r - E[c]

    ll_part = ll_cell.sum(axis=1, keepdims=True)
    dth_part = jnp.dot(dbase, a_ref[:], preferred_element_type=jnp.float32)
    da_part = jax.lax.dot_general(
        dbase, theta_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rows = []
    for c in range(cm1):                          # d/d(kap_{c+1}) = p - 1[r=c+1]
        contrib = m * (es[c] * inv_s - jnp.where(r == c + 1, 1.0, 0.0))
        rows.append(contrib.sum(axis=0, keepdims=True))
    dkap_part = jnp.concatenate(rows, axis=0)     # (C-1, TM)

    @pl.when(j == 0)
    def _():
        ll_ref[:] = ll_part
        dth_ref[:] = dth_part

    @pl.when(j > 0)
    def _():
        ll_ref[:] = ll_ref[:] + ll_part
        dth_ref[:] = dth_ref[:] + dth_part

    @pl.when(i == 0)
    def _():
        da_ref[:] = da_part
        dkap_ref[:] = dkap_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        dkap_ref[:] = dkap_ref[:] + dkap_part


def _pad_gpcm(theta, a, kap, packed, tb, tm):
    """Zero-pad student/item axes to tile multiples. Padded cells decode to
    mask 0, so every contribution they touch is multiplied away; padded
    theta/a/kap rows produce gradients that are sliced off."""
    bsz, m = packed.shape
    pb, pm = (-bsz) % tb, (-m) % tm
    if pb == 0 and pm == 0:
        return theta, a, kap, packed
    theta = jnp.pad(theta, ((0, pb), (0, 0)))
    a = jnp.pad(a, ((0, pm), (0, 0)))
    kap = jnp.pad(kap, ((0, pm), (0, 0)))
    packed = jnp.pad(packed, ((0, pb), (0, pm)))
    return theta, a, kap, packed


def _fused_train_fwd_gpcm(theta, a, kap, packed, interpret):
    bsz0, m0 = theta.shape[0], a.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    theta, a, kap, packed = _pad_gpcm(theta, a, kap, packed, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    cm1 = kap.shape[1]
    kapt = kap.T.astype(jnp.float32)              # (C-1, M): lane-major rows
    c = cm1 + 1
    ll, dth, da, dkapt = pl.pallas_call(
        _fused_train_kernel_gpcm,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cm1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cm1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_sds((bsz, 1), jnp.float32, theta, a, kap, packed),
            out_sds((bsz, k), jnp.float32, theta, a, kap, packed),
            out_sds((m, k), jnp.float32, theta, a, kap, packed),
            out_sds((cm1, m), jnp.float32, theta, a, kap, packed),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * m * k + (12 + 9 * c) * bsz * m,
            bytes_accessed=bsz * m + 4 * (bsz * k * 2 + m * k * 2
                                          + m * (2 * c - 2) + bsz),
            transcendentals=c * bsz * m),
        interpret=interpret,
    )(theta, a, kapt, packed)
    return (ll[:bsz0, 0], dth[:bsz0], da[:m0], dkapt[:, :m0].T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _masked_loglik_gpcm_packed_train(theta, a, kap, packed, interpret):
    return _fused_train_fwd_gpcm(theta, a, kap, packed, interpret)[0]


def _fused_train_fwd_rule_gpcm(theta, a, kap, packed, interpret):
    ll, dth, da, dkap = _fused_train_fwd_gpcm(theta, a, kap, packed,
                                              interpret)
    return ll, (dth, da, dkap)


def _fused_train_bwd_rule_gpcm(interpret, residuals, g):
    dth, da, dkap = residuals
    g0 = g.reshape(-1)[0]  # uniform-cotangent contract (module docstring)
    return g[:, None] * dth, g0 * da, g0 * dkap, None


_masked_loglik_gpcm_packed_train.defvjp(_fused_train_fwd_rule_gpcm,
                                        _fused_train_bwd_rule_gpcm)


def masked_loglik_gpcm_packed_train(theta: jax.Array, a: jax.Array,
                                    kap: jax.Array, packed: jax.Array,
                                    interpret: bool | None = None
                                    ) -> jax.Array:
    """One-pass fused partial-credit (GPCM) training loglik -> (B,).

    theta (B, K) abilities; a (M, K) discriminations; kap (M, C-1)
    CUMULATIVE STEP SUMS (links.gpcm_cumsteps — differentiate the
    unconstrained cumsum reparameterization outside this op); packed (B, M)
    int8 code (pack_responses: 0 = missing, 1 + category otherwise).

    Value-identical to ops.likelihood.gpcm_loglik_cells(...).sum(-1) on
    the decoded data (tested, incl. interpret mode); gradients are
    precomputed in the same kernel pass under the UNIFORM-COTANGENT
    CONTRACT: dtheta is exact for any per-person cotangent, da/dkap assume
    every person's loglik carries the same weight (the ll.sum() training
    objectives). Leading sample axes vmap like the binary/graded kernels.
    C > _MAX_FUSED_CATEGORIES falls back to the XLA twin (register budget).
    """
    if interpret is None:
        interpret = not _is_tpu()
    theta = theta.astype(jnp.float32)
    a = a.astype(jnp.float32)
    kap = kap.astype(jnp.float32)
    if theta.ndim == 2:
        if kap.shape[-1] + 1 > _MAX_FUSED_CATEGORIES:
            return _xla_train_gpcm(theta, a, kap, packed)
        if interpret and _has_vma(theta, a, kap, packed):
            return _xla_train_gpcm(theta, a, kap, packed)
        theta, a, kap, packed = match_vma(theta, a, kap, packed)
        return _masked_loglik_gpcm_packed_train(theta, a, kap, packed,
                                                interpret)
    if a.ndim == theta.ndim:
        in_axes = (0, 0, 0, None)
    else:
        in_axes = (0, None, None, None)
    fn = lambda *xs: masked_loglik_gpcm_packed_train(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, kap, packed)
