"""Fused Pallas TPU kernel: masked GRADED (GRM) log-likelihood over the
student x item matrix — the polytomous counterpart of ops/pallas_elbo.py's
one-pass 2PL/3PL training kernels (arXiv:2108.11579's graded response
model; ops/likelihood.py holds the pure-XLA semantics this kernel must
match bitwise-ish).

Why a dedicated kernel: the XLA graded path decodes the int8 code into f32
(B, M) response+mask matrices in HBM and re-reads them per MC sample, and
its backward pass rematerializes the whole select/softplus chain — measured
2.2e9 cells/s at the 10,240 x 1,024 (C=5) north-star scale on v5e vs
3.5e10 for the fused binary path. This kernel restores the binary pipeline's
structure for the graded likelihood:

  one pass per (student-tile, item-tile):
    base = theta_t @ a_t^T on the MXU (f32 accumulation);
    decode (mask, category) from the int8 tile in VMEM;
    per-cell thresholds kappa_r / kappa_{r+1} gathered by an unrolled
    C-way select from the (C-1, tile) threshold block;
    TWO exp + TWO log1p per cell produce the value AND every gradient:
      ll   = min(x,0) - log1p(e^-|x|) - max(y,0) - log1p(e^-|y|) + log D
      d/d(base)    = 1 - sigmoid(x) - sigmoid(y)
      d/d(kappa_r) = -sigmoid(-x) / (sigmoid(-y) * D)
      d/d(kappa_{r+1}) = +sigmoid(y) / (sigmoid(x) * D)
    with x = base - kappa_r, y = base - kappa_{r+1}. The identities:
    P(r) = sigmoid(x) - sigmoid(y) factors as sigmoid(x)sigmoid(-y)D with
    D = 1 - e^{y-x}, and y - x = kappa_r - kappa_{r+1} depends ONLY on
    (item, category) — so D and log D precompute to tiny (C, M) tables and
    cost no per-cell transcendental; and sigmoid'(x) - sigmoid'(y) =
    (sigmoid(x)-sigmoid(y))(1 - sigmoid(x) - sigmoid(y)) collapses the
    base-gradient to rational ops on the two sigmoids already in registers.

  The (B, M) base matrix never exists in HBM; gradients accumulate in VMEM
  exactly like the binary one-pass kernels (ll/dtheta revisited
  consecutively over item tiles; da/dkappa reload-accumulate, tiny blocks).

Uniform-cotangent contract (same as masked_loglik_2pl_packed_train):
dtheta is exact for any per-person cotangent; da/dkappa assume every
person's loglik gets the same weight — the elbo_packed / iwae_packed /
DP / 2D-sharded training paths, where the per-sample loss is ll.sum().

The kappa operand is the ORDERED thresholds (links.grm_thresholds of the
unconstrained block); callers differentiate through that tiny (M, C-1)
reparameterization in plain JAX, so this kernel's dkappa chains into the
softplus-cumsum automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vibo_tpu.ops.pallas_elbo import (ITEM_BLOCK, STUDENT_BLOCK, _cdiv,
                                      _has_vma, _is_tpu, match_vma, out_sds)

from vibo_tpu.ops.likelihood import _GRM_CLAMP   # shared base saturation

_BIG = 50.0      # sentinel threshold for the boundary categories — same
                 # value as ops/likelihood._GRM_BIG (exp(-50) ~ 2e-22 == 0
                 # in f32 through every softplus/sigmoid below)
_GAP_CLAMP = -1e-6   # kappa_r - kappa_{r+1} clamp, mirroring likelihood.py:
                     # a collapsing category saturates instead of -inf/NaN


def _xla_train_grm(theta, a, kappa, packed):
    """Pure-XLA twin (per-person ll) for interpret-mode shard_map contexts
    (the vma fence — see pallas_elbo.py) and as the test oracle. XLA
    autodiff subsumes the uniform-cotangent contract."""
    from vibo_tpu.ops import likelihood as lik
    pk = packed.astype(jnp.float32)
    m = jnp.minimum(pk, 1.0)
    r = jnp.maximum(pk - 1.0, 0.0)
    base = jnp.dot(theta, a.T, preferred_element_type=jnp.float32)
    return lik.graded_loglik_cells(base, kappa, r, m).sum(-1)


def _grm_tables(kappa):
    """(M, C-1) ordered thresholds -> (dtab, ltab), both (C, M) f32.

    Row r holds the per-item constants of category r:
      dtab[r] = D = 1 - e^{kappa_r - kappa_{r+1}}   (boundary rows: 1)
      ltab[r] = log D                               (boundary rows: 0)
    The gap is clamped like the XLA path so a collapsing category stays
    finite. Computed once per kernel call — (C, M) is ~1000x smaller than
    the (B, M) cell matrix.
    """
    mm = kappa.shape[0]
    gaps = jnp.minimum(kappa[:, :-1] - kappa[:, 1:], _GAP_CLAMP)  # (M, C-2)
    d_int = -jnp.expm1(gaps)
    ones = jnp.ones((mm, 1), jnp.float32)
    dtab = jnp.concatenate([ones, d_int.astype(jnp.float32), ones], axis=-1)
    ltab = jnp.concatenate([jnp.zeros((mm, 1), jnp.float32),
                            jnp.log(dtab[:, 1:-1]),
                            jnp.zeros((mm, 1), jnp.float32)], axis=-1)
    return dtab.T, ltab.T                                         # (C, M)


def _fused_train_kernel_grm(theta_ref, a_ref, kapt_ref, dtab_ref, ltab_ref,
                            pk_ref, ll_ref, dth_ref, da_ref, dkap_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    cm1 = kapt_ref.shape[0]                       # C-1 (static)
    base = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # saturate like the XLA twin (likelihood._GRM_CLAMP): keeps |base| far
    # from the +-_BIG sentinels so boundary categories stay exactly
    # one-sided; values match the reference bitwise, gradients differ only
    # by the clip's zeroing beyond +-30 (where both are ~sigmoid'(30))
    base = jnp.clip(base, -_GRM_CLAMP, _GRM_CLAMP)
    pk = pk_ref[:].astype(jnp.float32)
    m = jnp.minimum(pk, 1.0)
    r = pk - 1.0                                  # category; -1 for missing
    # per-cell thresholds + tables by unrolled C-way select (C small, static)
    lo = jnp.full_like(base, -_BIG)               # kappa_r    (r=0 boundary)
    hi = jnp.full_like(base, _BIG)                # kappa_{r+1}
    dd = dtab_ref[0:1, :] * jnp.ones_like(base)   # D[r]
    lt = ltab_ref[0:1, :] * jnp.ones_like(base)   # log D[r]
    for c in range(cm1):
        kc = kapt_ref[c:c + 1, :]                 # (1, TM) threshold c+1
        lo = jnp.where(r == c + 1, kc, lo)
        hi = jnp.where(r == c, kc, hi)
        dd = jnp.where(r == c + 1, dtab_ref[c + 1:c + 2, :], dd)
        lt = jnp.where(r == c + 1, ltab_ref[c + 1:c + 2, :], lt)
    x = base - lo
    y = base - hi
    # two exp + two log1p per cell feed the value and all gradients
    ex = jnp.exp(-jnp.abs(x))
    ey = jnp.exp(-jnp.abs(y))
    l1x = jnp.log1p(ex)
    l1y = jnp.log1p(ey)
    ll_cell = m * (jnp.minimum(x, 0.0) - l1x - jnp.maximum(y, 0.0) - l1y + lt)
    invx = 1.0 / (1.0 + ex)
    invy = 1.0 / (1.0 + ey)
    # both sigmoid orientations in PRODUCT form — never 1 - sigmoid, whose
    # subtraction costs ~1% relative error on the small side in f32 and
    # measurably biased dkappa (f64-oracle check in tests/test_pallas_grm)
    sx = jnp.where(x >= 0, invx, ex * invx)       # sigmoid(x)
    smx = jnp.where(x >= 0, ex * invx, invx)      # sigmoid(-x)
    sy = jnp.where(y >= 0, invy, ey * invy)       # sigmoid(y)
    smy = jnp.where(y >= 0, ey * invy, invy)      # sigmoid(-y)
    dbase = m * (smx - sy)                        # == 1 - sx - sy
    # threshold gradients: gx = sigmoid'(x)/P, gy = sigmoid'(y)/P in the
    # factored form (see module docstring); eps floors a saturated denom
    # (the masked/boundary cells that hit it contribute ~0 anyway)
    gx = m * smx / jnp.maximum(smy * dd, 1e-30)
    gy = m * sy / jnp.maximum(sx * dd, 1e-30)

    ll_part = ll_cell.sum(axis=1, keepdims=True)
    dth_part = jnp.dot(dbase, a_ref[:], preferred_element_type=jnp.float32)
    da_part = jax.lax.dot_general(
        dbase, theta_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rows = []
    for t in range(1, cm1 + 1):                   # threshold kappa_t
        contrib = jnp.where(r == t, -gx, 0.0) + jnp.where(r == t - 1, gy, 0.0)
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


def _pad_grm(theta, a, kappa, packed, tb, tm):
    """Zero-pad student/item axes to tile multiples. Padded cells decode to
    mask 0, so every contribution they touch is multiplied away; padded
    theta/a/kappa rows produce gradients that are sliced off."""
    bsz, m = packed.shape
    pb, pm = (-bsz) % tb, (-m) % tm
    if pb == 0 and pm == 0:
        return theta, a, kappa, packed
    theta = jnp.pad(theta, ((0, pb), (0, 0)))
    a = jnp.pad(a, ((0, pm), (0, 0)))
    kappa = jnp.pad(kappa, ((0, pm), (0, 0)))
    packed = jnp.pad(packed, ((0, pb), (0, pm)))
    return theta, a, kappa, packed


def _fused_train_fwd_grm(theta, a, kappa, packed, interpret):
    bsz0, m0 = theta.shape[0], a.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    theta, a, kappa, packed = _pad_grm(theta, a, kappa, packed, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    cm1 = kappa.shape[1]
    kapt = kappa.T.astype(jnp.float32)            # (C-1, M): lane-major rows
    dtab, ltab = _grm_tables(kappa)               # (C, M)
    c = cm1 + 1
    ll, dth, da, dkapt = pl.pallas_call(
        _fused_train_kernel_grm,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cm1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cm1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_sds((bsz, 1), jnp.float32, theta, a, kappa, packed),
            out_sds((bsz, k), jnp.float32, theta, a, kappa, packed),
            out_sds((m, k), jnp.float32, theta, a, kappa, packed),
            out_sds((cm1, m), jnp.float32, theta, a, kappa, packed),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * m * k + (30 + 8 * c) * bsz * m,
            bytes_accessed=bsz * m + 4 * (bsz * k * 2 + m * k * 2
                                          + m * (3 * c - 1) + bsz),
            transcendentals=4 * bsz * m),
        interpret=interpret,
    )(theta, a, kapt, dtab, ltab, packed)
    return (ll[:bsz0, 0], dth[:bsz0], da[:m0], dkapt[:, :m0].T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _masked_loglik_grm_packed_train(theta, a, kappa, packed, interpret):
    return _fused_train_fwd_grm(theta, a, kappa, packed, interpret)[0]


def _fused_train_fwd_rule_grm(theta, a, kappa, packed, interpret):
    ll, dth, da, dkap = _fused_train_fwd_grm(theta, a, kappa, packed,
                                             interpret)
    return ll, (dth, da, dkap)


def _fused_train_bwd_rule_grm(interpret, residuals, g):
    dth, da, dkap = residuals
    g0 = g.reshape(-1)[0]  # uniform-cotangent contract (module docstring)
    return g[:, None] * dth, g0 * da, g0 * dkap, None


_masked_loglik_grm_packed_train.defvjp(_fused_train_fwd_rule_grm,
                                       _fused_train_bwd_rule_grm)


def masked_loglik_grm_packed_train(theta: jax.Array, a: jax.Array,
                                   kappa: jax.Array, packed: jax.Array,
                                   interpret: bool | None = None) -> jax.Array:
    """One-pass fused graded (GRM) training loglik -> (B,).

    theta (B, K) abilities; a (M, K) discriminations; kappa (M, C-1)
    ORDERED thresholds (links.grm_thresholds — differentiate the
    unconstrained reparameterization outside this op); packed (B, M) int8
    code (pack_responses: 0 = missing, 1 + category otherwise).

    Value-identical to ops.likelihood.graded_loglik_cells(...).sum(-1) on
    the decoded data (tested, incl. interpret mode); gradients are
    precomputed in the same kernel pass under the UNIFORM-COTANGENT
    CONTRACT: dtheta is exact for any per-person cotangent, da/dkappa
    assume every person's loglik carries the same weight (the ll.sum()
    training objectives). Leading sample axes vmap like the binary kernels.
    """
    if interpret is None:
        interpret = not _is_tpu()
    theta = theta.astype(jnp.float32)
    a = a.astype(jnp.float32)
    kappa = kappa.astype(jnp.float32)
    if theta.ndim == 2:
        if interpret and _has_vma(theta, a, kappa, packed):
            return _xla_train_grm(theta, a, kappa, packed)
        theta, a, kappa, packed = match_vma(theta, a, kappa, packed)
        return _masked_loglik_grm_packed_train(theta, a, kappa, packed,
                                               interpret)
    if a.ndim == theta.ndim:
        in_axes = (0, 0, 0, None)
    else:
        in_axes = (0, None, None, None)
    fn = lambda *xs: masked_loglik_grm_packed_train(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, kappa, packed)
