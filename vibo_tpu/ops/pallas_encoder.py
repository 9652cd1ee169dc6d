"""Fused packed-input first layer of the ability encoder (Pallas TPU).

The ability encoder's first layer consumes TWO views of the response matrix,
h = (r*m) @ W_r + m @ W_m, and in the packed pipeline both views are decoded
from the int8 code (0=missing, 1=wrong, 2=right; ops/pallas_elbo.
pack_responses). Under XLA the decode materializes two (B, M) compute-dtype
matrices in HBM because they have multiple consumers — measured ~0.17 ms of
the 0.49 ms packed train step at 10k x 1k on v5e (the step's single biggest
non-matmul cost). This kernel reads the int8 code once, decodes in
registers, and runs both MXU contractions per tile:

  forward:  h (B, H) f32      = rm @ W_r + m @ W_m     (accumulate over M)
  backward: dW_r (M, H) f32   = rm^T @ dh              (accumulate over B)
            dW_m (M, H) f32   = m^T  @ dh
  (the inputs are data — no d(packed) is ever needed)

Same numerics as the XLA path: operands cast to the compute dtype (bf16 on
TPU), f32 MXU accumulation. Verified against the decode+XLA reference in
interpret mode and on-device (tests/test_pallas_encoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vibo_tpu.ops import pallas_elbo

STUDENT_BLOCK = 512
ITEM_BLOCK = 1024
# the backward grid accumulates over student tiles; doubling the student
# tile fits VMEM there (no weight tiles resident) and measured 70 -> 60 us
# at 10k x 1k on v5e, while the forward OOMs VMEM above (512, 1024)
BWD_STUDENT_BLOCK = 1024
# Per-buffer VMEM byte budgets the tile picker solves against (double
# buffering doubles what the compiler actually allocates).  The defaults
# reproduce the measured-fastest (512, 1024) tiling at hidden=512 and shrink
# tm/tb as hidden grows so hidden=1024/2048 compile instead of OOMing VMEM.
_W_TILE_BUDGET = 4 << 20   # both (tm, h) f32 weight tiles together
_H_TILE_BUDGET = 2 << 20   # one (tb, h) f32 activation tile


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _cdiv(a, b):
    return -(-a // b)


def _decode(pk_f32):
    return jnp.minimum(pk_f32, 1.0), jnp.maximum(pk_f32 - 1.0, 0.0)


def _decode_cd(pk_ref, cd):
    """Decode the int8 code DIRECTLY at the compute dtype.

    Bit-identical to f32-decode-then-cast for every representable code:
    values are small integers (0..32 — binary 0/1/2, graded 1+category with
    C <= 32), all exact in bf16, and min/subtract on exact integers are
    exact. Decoding at cd halves the kernel's scratch (two (tb, tm) views)
    — the f32 temps were the dominant stack term that OOM'd scoped VMEM at
    the (1024, 1024, h=512) backward tiles (19.4 MB vs the 16 MB budget)."""
    pk = pk_ref[:].astype(cd)
    one = jnp.asarray(1.0, cd)
    return jnp.minimum(pk, one), jnp.maximum(pk - one, jnp.asarray(0.0, cd))


def _fwd_kernel(cd, pk_ref, wr_ref, wm_ref, out_ref):
    j = pl.program_id(1)
    m, rm = _decode_cd(pk_ref, cd)
    partial = jax.lax.dot(rm, wr_ref[:].astype(cd),
                          preferred_element_type=jnp.float32)
    partial = partial + jax.lax.dot(m, wm_ref[:].astype(cd),
                                    preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _bwd_kernel(cd, pk_ref, dh_ref, dwr_ref, dwm_ref):
    i = pl.program_id(1)
    m, rm = _decode_cd(pk_ref, cd)
    dh = dh_ref[:].astype(cd)
    # contract over the student axis: (tb, tm)^T @ (tb, H) -> (tm, H)
    dwr = jax.lax.dot_general(rm, dh,
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwm = jax.lax.dot_general(m, dh,
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dwr_ref[:] = dwr
        dwm_ref[:] = dwm

    @pl.when(i > 0)
    def _():
        dwr_ref[:] = dwr_ref[:] + dwr
        dwm_ref[:] = dwm_ref[:] + dwm


def _tiles(bsz, m, h):
    """(tb, tm) student/item tile sizes, shrunk for wide hidden layers.

    The forward keeps both (tm, h) weight tiles and one (tb, h) output tile
    resident; solving tm and tb against fixed byte budgets keeps the kernel
    compiling at any hidden size (hidden=1024 OOM'd the fixed tiling)."""
    hp = max(_cdiv(h, 128) * 128, 128)
    tm_cap = max((_W_TILE_BUDGET // (8 * hp)) // 128 * 128, 128)
    tb_cap = max((_H_TILE_BUDGET // (4 * hp)) // 8 * 8, 8)
    tb = min(STUDENT_BLOCK, tb_cap, _cdiv(bsz, 8) * 8)
    tm = min(ITEM_BLOCK, tm_cap, _cdiv(m, 128) * 128)
    return tb, tm


def _pad(packed, wr, wm, tb, tm):
    bsz, m = packed.shape
    h = wr.shape[1]
    pb, pm, ph = (-bsz) % tb, (-m) % tm, (-h) % 128
    if pb or pm:
        packed = jnp.pad(packed, ((0, pb), (0, pm)))  # 0 == missing: inert
    if pm or ph:
        wr = jnp.pad(wr, ((0, pm), (0, ph)))
        wm = jnp.pad(wm, ((0, pm), (0, ph)))
    return packed, wr, wm


def _fwd_pallas(packed, wr, wm, cd, interpret):
    bsz0, h0 = packed.shape[0], wr.shape[1]
    tb, tm = _tiles(*packed.shape, h0)
    packed, wr, wm = _pad(packed, wr, wm, tb, tm)
    (bsz, m), h = packed.shape, wr.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cd),
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, h), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=pallas_elbo.out_sds((bsz, h), jnp.float32, packed, wr, wm),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * m * h,
            bytes_accessed=bsz * m + 8 * m * h + 4 * bsz * h,
            transcendentals=0),
        interpret=interpret,
    )(packed, wr, wm)
    return out[:bsz0, :h0]


def _bwd_pallas(packed, dh, h_shape, cd, interpret):
    m0, h0 = packed.shape[1], h_shape
    tb, tm = _tiles(*packed.shape, h_shape)
    # Full stack accounting for the backward tile pick (a fresh Mosaic
    # compile at (tb=1024, tm=1024, h=512) measured 19.4 MB against the
    # 16 MB scoped-VMEM budget — the old cap only counted the dh tile):
    # per grid step, double-buffered: the int8 pk tile (1 B/cell), its two
    # decoded cd views (2 x cd bytes/cell), the dh tile (4 B) + its cd
    # cast; single-buffered (inner-grid-invariant index maps): both (tm, h)
    # f32 accumulator outputs.
    hp = max(_cdiv(h_shape, 128) * 128, 128)
    cd_b = jnp.dtype(cd).itemsize
    out_bytes = 2 * 4 * tm * hp
    per_tb = 2 * ((1 + 2 * cd_b) * tm + (4 + cd_b) * hp)
    budget = 13 << 20
    bwd_cap = max(int((budget - out_bytes) // per_tb) // 8 * 8, 8)
    tb = min(BWD_STUDENT_BLOCK, bwd_cap, _cdiv(packed.shape[0], 8) * 8)
    wr_dummy = jnp.zeros((packed.shape[1], h0), jnp.float32)
    packed, wr_dummy, _ = _pad(packed, wr_dummy, wr_dummy, tb, tm)
    (bsz, m), h = packed.shape, wr_dummy.shape[1]
    dh = jnp.pad(dh.astype(jnp.float32),
                 ((0, bsz - dh.shape[0]), (0, h - dh.shape[1])))
    dwr, dwm = pl.pallas_call(
        functools.partial(_bwd_kernel, cd),
        grid=(_cdiv(m, tm), _cdiv(bsz, tb)),
        in_specs=[
            pl.BlockSpec((tb, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, h), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, h), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            pallas_elbo.out_sds((m, h), jnp.float32, packed, dh),
            pallas_elbo.out_sds((m, h), jnp.float32, packed, dh),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * m * h,
            bytes_accessed=bsz * m + 4 * bsz * h + 8 * m * h,
            transcendentals=0),
        interpret=interpret,
    )(packed, dh)
    return dwr[:m0, :h0], dwm[:m0, :h0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _first_layer(packed, wr, wm, cd_name, interpret):
    return _fwd_pallas(packed, wr, wm, jnp.dtype(cd_name), interpret)


def _fwd_rule(packed, wr, wm, cd_name, interpret):
    out = _fwd_pallas(packed, wr, wm, jnp.dtype(cd_name), interpret)
    return out, (packed, wr.shape[1])


def _bwd_rule(cd_name, interpret, residuals, dh):
    packed, h = residuals
    dwr, dwm = _bwd_pallas(packed, dh, h, jnp.dtype(cd_name), interpret)
    return None, dwr, dwm


_first_layer.defvjp(_fwd_rule, _bwd_rule)


def packed_first_layer(packed: jax.Array, w_r: jax.Array, w_m: jax.Array,
                       compute_dtype="bfloat16",
                       interpret: bool | None = None) -> jax.Array:
    """h (B, H) f32 = (r*m) @ w_r + m @ w_m, decoded on the fly from the
    int8 packed code. Differentiable w.r.t. w_r/w_m (fused dW kernels)."""
    if interpret is None:
        interpret = not _is_tpu()
    if packed.dtype != jnp.int8:
        raise ValueError(f"packed must be int8, got {packed.dtype}")
    if interpret and pallas_elbo._has_vma(packed, w_r, w_m):
        # Pallas HLO-interpreter vs shard_map vma limitation: run the XLA
        # twin on CPU meshes (see pallas_elbo._xla_train_2pl's docstring)
        cd = jnp.dtype(compute_dtype)
        pk = packed.astype(jnp.float32)
        m, rm = jnp.minimum(pk, 1.0), jnp.maximum(pk - 1.0, 0.0)
        h = jax.lax.dot(rm.astype(cd), w_r.astype(cd),
                        preferred_element_type=jnp.float32)
        return h + jax.lax.dot(m.astype(cd), w_m.astype(cd),
                               preferred_element_type=jnp.float32)
    packed, w_r, w_m = pallas_elbo.match_vma(
        packed, w_r.astype(jnp.float32), w_m.astype(jnp.float32))
    return _first_layer(packed, w_r, w_m, jnp.dtype(compute_dtype).name,
                        interpret)


def packed_row_valid(packed: jax.Array) -> jax.Array:
    """(B,) f32 indicator of rows with ANY observed cell, read from the int8
    code (no decoded mask materialization)."""
    return (packed.astype(jnp.int32).sum(-1) > 0).astype(jnp.float32)
