"""Fused Pallas TPU kernel: masked-Bernoulli log-likelihood over the
student x item matrix with the 2PL link matmul fused in.

This is the framework's hottest op — the [B] metric response-cells/sec/chip
is this reduction's throughput (SURVEY.md sections 3.1, 4.1). The fusion
story (the moral analog of flash attention for IRT):

  forward:  per (student-tile, item-tile): logits = theta_t @ a_t^T - b_t on
            the MXU, then the masked Bernoulli reduction
            mask * (r * logits - softplus(logits)) on the VPU, accumulated
            into per-person partial sums in VMEM. The (B, M) logit matrix is
            NEVER materialized in HBM.
  backward: custom VJP with two kernels recomputing logits from the tiny
            inputs (flash-attention-style recompute beats storing B x M
            residuals): one accumulates dtheta over item tiles, the other
            accumulates (da, db) over student tiles.

Item-axis blocking doubles as the framework's "long-context" capability
(SURVEY.md section 6): arbitrarily wide item dimensions stream through VMEM
in ITEM_BLOCK chunks.

Numerics are identical to vibo_tpu.ops.likelihood (verified in
tests/test_pallas.py, including interpret mode on CPU): softplus/sigmoid in
f32, accumulation in f32.

1PL reuses this kernel with unit discriminations (theta summed by a ones
vector); 3PL has its own fused kernels below (the guess mixture adds a
per-item g_hat row and a third item gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default tiles: student tile x item tile. Swept on v5e at 10k x 1k
# (fwd+bwd of the packed train kernel, min-of-3):
#   (256,512) 148us | (512,512) 132us | (256,1024) 117us | (512,1024) 105us
#   (128,512) 188us | (1024,1024) VMEM compile failure
# Larger tiles amortize per-grid-step overhead; (512,1024) still fits VMEM
# for every kernel in this file (packed int8 tile 0.5 MB + f32 logits 2 MB;
# dense f32 resp+mask tiles 2 MB each).
STUDENT_BLOCK = 512
ITEM_BLOCK = 1024


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # backend not initialized yet
        return False


def _cdiv(a, b):
    return -(-a // b)


# ------------------------------------------- varying-mesh-axes (vma) fence
#
# match_vma/out_sds below reach into jax's shard_map varying-types surface —
# jax.typeof(x).vma, lax.pcast(to='varying'), ShapeDtypeStruct(vma=...) —
# which is new in jax 0.9 and outside any compatibility policy. ALL vma
# access in this repo goes through _vma_of/match_vma/out_sds, and the API is
# probed once (lazily, backend-free) so a future jax that renames any piece
# fails LOUDLY at the first sharded kernel call instead of silently reading
# an empty vma set — which would drop the psum that pcast's transpose
# provides and produce wrong (shard-local) item gradients.
#
# Coverage note: on the virtual CPU mesh, interpret-mode Pallas cannot
# typecheck vma-carrying grid carries (jax 0.9), so the sharded CPU tests
# exercise the _xla_train_* twins below (same math, asserted equal to the
# kernels by tests/test_pallas.py). The Mosaic+vma combination compiles on
# real TPU, but multi-CHIP Mosaic+vma execution is exercised nowhere on this
# one-chip image — the driver's dryrun validates it on the CPU mesh twins.

_VMA_API_ERROR: str | None = None


def _probe_vma_api() -> str | None:
    try:
        t = jax.typeof(jax.ShapeDtypeStruct((), jnp.float32))
        if not hasattr(t, "vma"):
            return "jax.typeof(...) has no .vma attribute"
        if not callable(getattr(jax.lax, "pcast", None)):
            return "jax.lax.pcast is missing"
        jax.ShapeDtypeStruct((), jnp.float32, vma=frozenset())
        return None
    except Exception as e:  # renamed kwarg, changed signature, ...
        return f"probe raised {e!r}"


def _vma_of(x) -> frozenset:
    """Varying mesh axes of x's abstract type (empty outside shard_map).

    Single chokepoint for the vma API (see fence note above): raises with
    an actionable message if this jax no longer exposes it."""
    global _VMA_API_ERROR
    if _VMA_API_ERROR is None:
        _VMA_API_ERROR = _probe_vma_api() or "ok"
    if _VMA_API_ERROR != "ok":
        raise RuntimeError(
            "vibo_tpu's sharded packed kernels need jax's varying-types API "
            f"(jax.typeof(x).vma / lax.pcast / ShapeDtypeStruct(vma=...)), "
            f"but this jax ({jax.__version__}) failed the probe: "
            f"{_VMA_API_ERROR}. Update vibo_tpu/ops/pallas_elbo.py's vma "
            "fence for the new API, or train without a mesh.")
    return jax.typeof(x).vma or frozenset()


def match_vma(*xs):
    """Promote every array to the UNION of the group's varying mesh axes
    via jax.lax.pcast(to='varying').

    Why: the packed kernels are custom_vjp ops. Under shard_map's varying
    types, a custom_vjp's bwd must return each cotangent with the SAME vma
    as its primal — but e.g. the item parameters enter replicated while
    their true gradient is a sum over student shards. Promoting the primal
    to varying BEFORE the custom_vjp makes the contract consistent, and the
    pcast's transpose (a psum over the promoted axes) reassembles the
    replicated gradient exactly where plain-XLA AD would have put it.
    No-op outside shard_map."""
    vma = frozenset()
    for x in xs:
        vma |= _vma_of(x)
    out = []
    for x in xs:
        extra = tuple(sorted(vma - _vma_of(x)))
        out.append(jax.lax.pcast(x, extra, to="varying") if extra else x)
    return out


def _has_vma(*xs) -> bool:
    return any(_vma_of(x) for x in xs)


def _xla_train_2pl(theta, a, b, packed):
    """Pure-XLA twin of the packed 2PL train kernel (per-person ll).

    Used when interpret=True AND the operands carry shard_map varying-type
    annotations: the Pallas HLO interpreter initializes its grid-loop output
    carries without vma and fails to typecheck (jax 0.9). The Mosaic (TPU)
    path handles vma natively; CPU-mesh tests run this twin — same math,
    and XLA autodiff subsumes the uniform-cotangent contract."""
    pk = packed.astype(jnp.float32)
    m = jnp.minimum(pk, 1.0)
    r = jnp.maximum(pk - 1.0, 0.0)
    logits = theta @ a.T - b
    return (m * (r * logits - jax.nn.softplus(logits))).sum(-1)


def _xla_train_3pl(theta, a, b, g_hat, packed):
    pk = packed.astype(jnp.float32)
    m = jnp.minimum(pk, 1.0)
    r = jnp.maximum(pk - 1.0, 0.0)
    logits = theta @ a.T - b
    return _cell_3pl(logits, g_hat, r, m).sum(-1)


def out_sds(shape, dtype, *ins):
    """ShapeDtypeStruct for a pallas_call output whose vma (varying mesh
    axes) is the union of the inputs' — required under shard_map's
    check_vma (jax >= 0.9): every kernel output is shard-local, hence
    varying over whatever axes any input varies over. Outside shard_map the
    union is empty and this is equivalent to the plain constructor."""
    vma = frozenset()
    for x in ins:
        vma |= _vma_of(x)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _pad_inputs(theta, a, b, resp, mask, tb, tm):
    """Zero-pad student/item axes to tile multiples. Padding is inert: padded
    mask cells are 0, so their (zero-logit) contributions vanish exactly, and
    padded theta/a rows produce gradients that are sliced away."""
    bsz, m = resp.shape
    pb, pm = (-bsz) % tb, (-m) % tm
    if pb == 0 and pm == 0:
        return theta, a, b, resp, mask
    theta = jnp.pad(theta, ((0, pb), (0, 0)))
    a = jnp.pad(a, ((0, pm), (0, 0)))
    b = jnp.pad(b, ((0, pm),))
    resp = jnp.pad(resp, ((0, pb), (0, pm)))
    mask = jnp.pad(mask, ((0, pb), (0, pm)))
    return theta, a, b, resp, mask


# --------------------------------------------------- packed representation

def pack_responses(resp, mask):
    """Pack (response, mask) into one int8 code: 0=missing, 1=r0, 2=r1.

    8x less HBM traffic than two f32 matrices — the loglik reduction is
    memory/VPU bound, so this is the single biggest lever on the [B]
    cells/sec metric. Works for both the Pallas and the XLA path.

    The numpy path streams row blocks into a THP-backed output: one-shot
    `(mask * (1 + resp)).astype(int8)` materializes two fresh matrix-sized
    f32 temporaries, and first-touch faults on this image run ~100x slower
    on 4k pages (utils/hostmem.py) — at 131k x 2k that was tens of seconds
    for a byte-identical result.
    """
    import numpy as np
    if isinstance(resp, np.ndarray):
        from vibo_tpu.utils.hostmem import empty_hugepages
        n, m = resp.shape
        out = empty_hugepages((n, m), np.int8)
        block = max(1, (1 << 24) // max(1, m))
        for s in range(0, n, block):
            e = min(n, s + block)
            np.copyto(out[s:e], mask[s:e] * (1.0 + resp[s:e]),
                      casting="unsafe")
        return out
    return (mask * (1.0 + resp)).astype(jnp.int8)


def _decode_packed(pk_f32):
    """int8 code (as f32) -> (mask, resp) floats."""
    m = jnp.minimum(pk_f32, 1.0)
    r = jnp.maximum(pk_f32 - 1.0, 0.0)
    return m, r


# ------------------------------------------------------------ forward

def _fwd_kernel(theta_ref, a_ref, b_ref, resp_ref, mask_ref, out_ref):
    j = pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    ll = mask_ref[:] * (resp_ref[:] * logits - jax.nn.softplus(logits))
    partial = ll.sum(axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _fwd_pallas(theta, a, b, resp, mask, interpret):
    bsz0 = theta.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(a.shape[0], 128) * 128)
    theta, a, b, resp, mask = _pad_inputs(theta, a, b, resp, mask, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    grid = (_cdiv(bsz, tb), _cdiv(m, tm))
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * m * k + 8 * bsz * m,
            bytes_accessed=4 * (bsz * k + m * k + m + 2 * bsz * m + bsz),
            transcendentals=bsz * m),
        interpret=interpret,
    )(theta, a, b.reshape(1, m), resp, mask)
    return out[:bsz0, 0]


# ------------------------------------------------------------ backward

def _bwd_dtheta_kernel(g_ref, theta_ref, a_ref, b_ref, resp_ref, mask_ref,
                       dtheta_ref):
    j = pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    dlogits = g_ref[:] * mask_ref[:] * (resp_ref[:] - jax.nn.sigmoid(logits))
    partial = jnp.dot(dlogits, a_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dtheta_ref[:] = partial

    @pl.when(j > 0)
    def _():
        dtheta_ref[:] = dtheta_ref[:] + partial


def _bwd_items_kernel(g_ref, theta_ref, a_ref, b_ref, resp_ref, mask_ref,
                      da_ref, db_ref):
    i = pl.program_id(1)  # student tiles innermost: accumulate per item tile
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    dlogits = g_ref[:] * mask_ref[:] * (resp_ref[:] - jax.nn.sigmoid(logits))
    da_part = jax.lax.dot_general(  # dlogits^T @ theta: (TM, TB) x (TB, K)
        dlogits, theta_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_part = -dlogits.sum(axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        da_ref[:] = da_part
        db_ref[:] = db_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        db_ref[:] = db_ref[:] + db_part


def _bwd_pallas(interpret, residuals, g):
    theta, a, b, resp, mask = residuals
    bsz0, m0 = theta.shape[0], a.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    theta, a, b, resp, mask = _pad_inputs(theta, a, b, resp, mask, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    g2 = jnp.pad(g.reshape(-1, 1).astype(jnp.float32), ((0, bsz - bsz0), (0, 0)))
    b2 = b.reshape(1, m)

    dtheta = pl.pallas_call(
        _bwd_dtheta_kernel,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, k), jnp.float32),
        interpret=interpret,
    )(g2, theta, a, b2, resp, mask)

    da, db2 = pl.pallas_call(
        _bwd_items_kernel,
        grid=(_cdiv(m, tm), _cdiv(bsz, tb)),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(g2, theta, a, b2, resp, mask)

    return dtheta[:bsz0], da[:m0], db2[0, :m0], None, None


# --------------------------------------------------- packed kernels

def _fwd_kernel_packed(theta_ref, a_ref, b_ref, pk_ref, out_ref):
    j = pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    # identity for r in {0,1}: r*l - softplus(l) == -softplus((1-2r)*l)
    ll = -m * jax.nn.softplus((1.0 - 2.0 * r) * logits)
    partial = ll.sum(axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _bwd_dtheta_kernel_packed(g_ref, theta_ref, a_ref, b_ref, pk_ref, dtheta_ref):
    j = pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    dlogits = g_ref[:] * m * (r - jax.nn.sigmoid(logits))
    partial = jnp.dot(dlogits, a_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dtheta_ref[:] = partial

    @pl.when(j > 0)
    def _():
        dtheta_ref[:] = dtheta_ref[:] + partial


def _bwd_items_kernel_packed(g_ref, theta_ref, a_ref, b_ref, pk_ref,
                             da_ref, db_ref):
    i = pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    dlogits = g_ref[:] * m * (r - jax.nn.sigmoid(logits))
    da_part = jax.lax.dot_general(
        dlogits, theta_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_part = -dlogits.sum(axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        da_ref[:] = da_part
        db_ref[:] = db_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        db_ref[:] = db_ref[:] + db_part


def _pad_packed(theta, a, b, packed, tb, tm):
    bsz, m = packed.shape
    pb, pm = (-bsz) % tb, (-m) % tm
    if pb or pm:
        theta = jnp.pad(theta, ((0, pb), (0, 0)))
        a = jnp.pad(a, ((0, pm), (0, 0)))
        b = jnp.pad(b, ((0, pm),))
        packed = jnp.pad(packed, ((0, pb), (0, pm)))  # pads with 0 == missing
    return theta, a, b, packed


def _fwd_pallas_packed(theta, a, b, packed, interpret):
    bsz0 = theta.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(a.shape[0], 128) * 128)
    theta, a, b, packed = _pad_packed(theta, a, b, packed, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    out = pl.pallas_call(
        _fwd_kernel_packed,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        interpret=interpret,
    )(theta, a, b.reshape(1, m), packed)
    return out[:bsz0, 0]


def _bwd_pallas_packed(interpret, residuals, g):
    theta, a, b, packed = residuals
    bsz0, m0 = theta.shape[0], a.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    theta, a, b, packed = _pad_packed(theta, a, b, packed, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    g2 = jnp.pad(g.reshape(-1, 1).astype(jnp.float32), ((0, bsz - bsz0), (0, 0)))
    b2 = b.reshape(1, m)

    dtheta = pl.pallas_call(
        _bwd_dtheta_kernel_packed,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, k), jnp.float32),
        interpret=interpret,
    )(g2, theta, a, b2, packed)

    da, db2 = pl.pallas_call(
        _bwd_items_kernel_packed,
        grid=(_cdiv(m, tm), _cdiv(bsz, tb)),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(g2, theta, a, b2, packed)

    return dtheta[:bsz0], da[:m0], db2[0, :m0], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _masked_loglik_2pl_packed(theta, a, b, packed, interpret):
    return _fwd_pallas_packed(theta, a, b, packed, interpret)


def _fwd_rule_packed(theta, a, b, packed, interpret):
    return (_fwd_pallas_packed(theta, a, b, packed, interpret),
            (theta, a, b, packed))


_masked_loglik_2pl_packed.defvjp(_fwd_rule_packed, _bwd_pallas_packed)


def masked_loglik_2pl_packed(theta: jax.Array, a: jax.Array, b: jax.Array,
                             packed: jax.Array,
                             interpret: bool | None = None) -> jax.Array:
    """Per-person masked 2PL loglik from pack_responses codes -> (B,).

    Same semantics as masked_loglik_2pl(theta, a, b, resp, mask) with
    packed = pack_responses(resp, mask); 8x less response-matrix traffic.
    """
    if interpret is None:
        interpret = not _is_tpu()
    theta = theta.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if theta.ndim == 2:
        return _masked_loglik_2pl_packed(theta, a, b, packed, interpret)
    if a.ndim == theta.ndim:
        in_axes = (0, 0, 0, None)
    else:
        in_axes = (0, None, None, None)
    fn = lambda *xs: masked_loglik_2pl_packed(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, b, packed)


# ------------------------------------- one-pass training kernel (packed)
#
# The training ELBO consumes ll.sum(): the cotangent of the per-person
# loglik vector is UNIFORM. That lets value AND all gradients be computed in
# a single pass over the packed matrix (vs 1 fwd + 2 bwd passes for the
# general op): the kernel emits (ll, dtheta_pre, da_pre, db_pre) from one
# exp + one log1p per cell, and the VJP just rescales:
#     dtheta = g[:, None] * dtheta_pre   (exact for ANY per-person g)
#     da, db = g_uniform * (da_pre, db_pre)   (exact only for uniform g --
#                                              the ELBO/elbo_packed case)
# Output-block traffic: ll/dtheta blocks are revisited consecutively
# (item tiles innermost); da/db blocks are revisited non-consecutively and
# reload-accumulate through HBM, but they are tiny ((TM,K)+(1,TM) ~ 10 KB
# per visit vs the 128 KB packed tile read).

def _fused_train_kernel_packed(theta_ref, a_ref, b_ref, pk_ref,
                               ll_ref, dth_ref, da_ref, db_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    # one exp per cell feeds softplus(+-l) and sigmoid(l)
    e = jnp.exp(-jnp.abs(logits))
    log1p_e = jnp.log1p(e)
    sp_pos = log1p_e + jnp.maximum(logits, 0.0)          # softplus(l)
    # r in {0,1}: r*l - softplus(l) == -softplus((1-2r) l)
    ll_cell = -m * jnp.where(r > 0.5, sp_pos - logits, sp_pos)
    inv = 1.0 / (1.0 + e)
    s = jnp.where(logits >= 0, inv, 1.0 - inv)           # sigmoid(l)
    dl = m * (r - s)
    ll_part = ll_cell.sum(axis=1, keepdims=True)
    dth_part = jnp.dot(dl, a_ref[:], preferred_element_type=jnp.float32)
    da_part = jax.lax.dot_general(
        dl, theta_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_part = -dl.sum(axis=0, keepdims=True)

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
        db_ref[:] = db_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        db_ref[:] = db_ref[:] + db_part


def _fused_train_fwd(theta, a, b, packed, interpret):
    bsz0, m0 = theta.shape[0], a.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    theta, a, b, packed = _pad_packed(theta, a, b, packed, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    ll, dth, da, db2 = pl.pallas_call(
        _fused_train_kernel_packed,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_sds((bsz, 1), jnp.float32, theta, a, packed),
            out_sds((bsz, k), jnp.float32, theta, a, packed),
            out_sds((m, k), jnp.float32, theta, a, packed),
            out_sds((1, m), jnp.float32, theta, a, packed),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * m * k + 16 * bsz * m,
            bytes_accessed=bsz * m + 4 * (bsz * k * 2 + m * k * 2 + 2 * m + bsz),
            transcendentals=2 * bsz * m),
        interpret=interpret,
    )(theta, a, b.reshape(1, m), packed)
    return (ll[:bsz0, 0], dth[:bsz0], da[:m0], db2[0, :m0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _masked_loglik_2pl_packed_train(theta, a, b, packed, interpret):
    return _fused_train_fwd(theta, a, b, packed, interpret)[0]


def _fused_train_fwd_rule(theta, a, b, packed, interpret):
    ll, dth, da, db = _fused_train_fwd(theta, a, b, packed, interpret)
    return ll, (dth, da, db)


def _fused_train_bwd_rule(interpret, residuals, g):
    dth, da, db = residuals
    g0 = g.reshape(-1)[0]  # uniform-cotangent contract (see header comment)
    return g[:, None] * dth, g0 * da, g0 * db, None


_masked_loglik_2pl_packed_train.defvjp(_fused_train_fwd_rule,
                                       _fused_train_bwd_rule)


def masked_loglik_2pl_packed_train(theta: jax.Array, a: jax.Array,
                                   b: jax.Array, packed: jax.Array,
                                   interpret: bool | None = None) -> jax.Array:
    """One-pass training variant of masked_loglik_2pl_packed -> (B,).

    Value-identical to the general op; gradients are precomputed in the same
    kernel pass under the UNIFORM-COTANGENT CONTRACT: the caller must only
    use this where every person's loglik gets the same weight (e.g. followed
    by .sum() into a scalar loss, as in elbo_packed / elbo_packed_sums).
    dtheta is exact for any cotangent; da/db assume uniformity.
    """
    if interpret is None:
        interpret = not _is_tpu()
    theta = theta.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if theta.ndim == 2:
        if interpret and _has_vma(theta, a, b, packed):
            return _xla_train_2pl(theta, a, b, packed)
        theta, a, b, packed = match_vma(theta, a, b, packed)
        return _masked_loglik_2pl_packed_train(theta, a, b, packed, interpret)
    if a.ndim == theta.ndim:
        in_axes = (0, 0, 0, None)
    else:
        in_axes = (0, None, None, None)
    fn = lambda *xs: masked_loglik_2pl_packed_train(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, b, packed)


# ---------------------------------- one-pass 3PL training kernel (packed)

def _fused_train_kernel_3pl_packed(theta_ref, a_ref, b_ref, g_ref, pk_ref,
                                   ll_ref, dth_ref, da_ref, db_ref, dg_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    gh = g_ref[:]
    ll_cell = _cell_3pl(logits, gh, r, m)
    dl, dgc = _dcell_3pl(logits, gh, r, m)
    ll_part = ll_cell.sum(axis=1, keepdims=True)
    dth_part = jnp.dot(dl, a_ref[:], preferred_element_type=jnp.float32)
    da_part = jax.lax.dot_general(
        dl, theta_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_part = -dl.sum(axis=0, keepdims=True)
    dg_part = dgc.sum(axis=0, keepdims=True)

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
        db_ref[:] = db_part
        dg_ref[:] = dg_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        db_ref[:] = db_ref[:] + db_part
        dg_ref[:] = dg_ref[:] + dg_part


def _fused_train_fwd_3pl(theta, a, b, g_hat, packed, interpret):
    bsz0, m0 = theta.shape[0], a.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    theta, a, b, packed = _pad_packed(theta, a, b, packed, tb, tm)
    (bsz, k), m = theta.shape, a.shape[0]
    g2 = jnp.pad(g_hat, ((0, m - m0),))
    ll, dth, da, db2, dg2 = pl.pallas_call(
        _fused_train_kernel_3pl_packed,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_sds((bsz, 1), jnp.float32, theta, a, packed),
            out_sds((bsz, k), jnp.float32, theta, a, packed),
            out_sds((m, k), jnp.float32, theta, a, packed),
            out_sds((1, m), jnp.float32, theta, a, packed),
            out_sds((1, m), jnp.float32, theta, a, packed),
        ],
        interpret=interpret,
    )(theta, a, b.reshape(1, m), g2.reshape(1, m), packed)
    return (ll[:bsz0, 0], dth[:bsz0], da[:m0], db2[0, :m0], dg2[0, :m0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _masked_loglik_3pl_packed_train(theta, a, b, g_hat, packed, interpret):
    return _fused_train_fwd_3pl(theta, a, b, g_hat, packed, interpret)[0]


def _fused_train_fwd_rule_3pl(theta, a, b, g_hat, packed, interpret):
    ll, dth, da, db, dg = _fused_train_fwd_3pl(theta, a, b, g_hat, packed,
                                               interpret)
    return ll, (dth, da, db, dg)


def _fused_train_bwd_rule_3pl(interpret, residuals, g):
    dth, da, db, dg = residuals
    g0 = g.reshape(-1)[0]  # uniform-cotangent contract
    return g[:, None] * dth, g0 * da, g0 * db, g0 * dg, None


_masked_loglik_3pl_packed_train.defvjp(_fused_train_fwd_rule_3pl,
                                       _fused_train_bwd_rule_3pl)


def masked_loglik_3pl_packed_train(theta: jax.Array, a: jax.Array,
                                   b: jax.Array, g_hat: jax.Array,
                                   packed: jax.Array,
                                   interpret: bool | None = None) -> jax.Array:
    """One-pass 3PL training variant (uniform-cotangent contract; see
    masked_loglik_2pl_packed_train) -> (B,)."""
    if interpret is None:
        interpret = not _is_tpu()
    theta, a = theta.astype(jnp.float32), a.astype(jnp.float32)
    b, g_hat = b.astype(jnp.float32), g_hat.astype(jnp.float32)
    if theta.ndim == 2:
        if interpret and _has_vma(theta, a, b, g_hat, packed):
            return _xla_train_3pl(theta, a, b, g_hat, packed)
        theta, a, b, g_hat, packed = match_vma(theta, a, b, g_hat, packed)
        return _masked_loglik_3pl_packed_train(theta, a, b, g_hat, packed,
                                               interpret)
    if a.ndim == theta.ndim:
        in_axes = (0, 0, 0, 0, None)
    else:
        in_axes = (0, None, None, None, None)
    fn = lambda *xs: masked_loglik_3pl_packed_train(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, b, g_hat, packed)


# --------------------------------------------------- 3PL fused kernels
#
# pi = g + (1-g) * sigmoid(l), g = sigmoid(g_hat), l = a.theta - b.
# Stable per-cell forms (matching ops.likelihood.bernoulli_loglik_3pl):
#   log(1-pi) = -softplus(g_hat) - softplus(l)
#   log(pi)   = logaddexp(-softplus(-g_hat), -softplus(g_hat) - softplus(-l))
# Stable gradients via branch ratios in [0,1] (no bare division by pi):
#   ratio_s = (1-g)s/pi = exp(log_s_branch - log_pi)
#   ratio_g = g/pi      = exp(log_g_branch - log_pi)
#   d ll/dl     = mask * ( r * ratio_s * (1-s) - (1-r) * s )
#   d ll/dg_hat = mask * ( r * ratio_g * (1-g) * (1-s) - (1-r) * g )
# (at r=0 these reduce to the exact -sigmoid(l) and -g.)

def _cell_3pl(logits, gh, resp, mask):
    log_s = -jax.nn.softplus(gh) - jax.nn.softplus(-logits)  # log((1-g) s)
    log_g = -jax.nn.softplus(-gh)                            # log g
    log_pi = jnp.logaddexp(log_g, log_s)
    log_1m_pi = -jax.nn.softplus(gh) - jax.nn.softplus(logits)
    return mask * (resp * log_pi + (1.0 - resp) * log_1m_pi)


def _dcell_3pl(logits, gh, resp, mask):
    """Elementwise (d ll/d logits, d ll/d g_hat)."""
    s = jax.nn.sigmoid(logits)
    g = jax.nn.sigmoid(gh)
    log_s = -jax.nn.softplus(gh) - jax.nn.softplus(-logits)
    log_g = -jax.nn.softplus(-gh)
    log_pi = jnp.logaddexp(log_g, log_s)
    ratio_s = jnp.exp(log_s - log_pi)
    ratio_g = jnp.exp(log_g - log_pi)
    dl = mask * (resp * ratio_s * (1.0 - s) - (1.0 - resp) * s)
    dg = mask * (resp * ratio_g * (1.0 - g) * (1.0 - s) - (1.0 - resp) * g)
    return dl, dg


def _read_rm(rest, packed):
    """Kernel helper: (mask, resp) floats from dense (resp, mask) refs or one
    packed int8 ref."""
    if packed:
        return _decode_packed(rest[0][:].astype(jnp.float32))
    return rest[1][:], rest[0][:]


def _fwd_kernel_3pl(theta_ref, a_ref, b_ref, g_ref, *rest, packed):
    out_ref = rest[-1]
    j = pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _read_rm(rest[:-1], packed)
    partial = _cell_3pl(logits, g_ref[:], r, m).sum(axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _bwd_dtheta_kernel_3pl(g_grad_ref, theta_ref, a_ref, b_ref, g_ref, *rest,
                           packed):
    dtheta_ref = rest[-1]
    j = pl.program_id(1)
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _read_rm(rest[:-1], packed)
    dl, _ = _dcell_3pl(logits, g_ref[:], r, m)
    dlogits = g_grad_ref[:] * dl
    partial = jnp.dot(dlogits, a_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dtheta_ref[:] = partial

    @pl.when(j > 0)
    def _():
        dtheta_ref[:] = dtheta_ref[:] + partial


def _bwd_items_kernel_3pl(g_grad_ref, theta_ref, a_ref, b_ref, g_ref, *rest,
                          packed):
    da_ref, db_ref, dg_ref = rest[-3:]
    i = pl.program_id(1)  # student tiles innermost: accumulate per item tile
    logits = jax.lax.dot_general(
        theta_ref[:], a_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _read_rm(rest[:-3], packed)
    dl, dg = _dcell_3pl(logits, g_ref[:], r, m)
    dlogits = g_grad_ref[:] * dl
    da_part = jax.lax.dot_general(
        dlogits, theta_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_part = -dlogits.sum(axis=0, keepdims=True)
    dg_part = (g_grad_ref[:] * dg).sum(axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        da_ref[:] = da_part
        db_ref[:] = db_part
        dg_ref[:] = dg_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        db_ref[:] = db_ref[:] + db_part
        dg_ref[:] = dg_ref[:] + dg_part


def _prep_3pl(theta, a, b, g_hat, data, packed):
    """Pad to tiles; returns padded operands + (tb, tm, orig sizes)."""
    bsz0, m0 = theta.shape[0], a.shape[0]
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    if packed:
        theta, a, b2, pk = _pad_packed(theta, a, b, data[0], tb, tm)
        g2 = jnp.pad(g_hat, ((0, a.shape[0] - m0),))
        data = (pk,)
        b = b2
    else:
        theta, a, b, resp, mask = _pad_inputs(theta, a, b, data[0], data[1],
                                              tb, tm)
        g2 = jnp.pad(g_hat, ((0, a.shape[0] - m0),))
        data = (resp, mask)
    return theta, a, b, g2, data, tb, tm, bsz0, m0


def _data_specs(tb, tm, packed):
    if packed:
        return [pl.BlockSpec((tb, tm), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)]
    return [pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM)]


def _fwd_pallas_3pl(theta, a, b, g_hat, data, interpret, packed):
    theta, a, b, g2, data, tb, tm, bsz0, m0 = _prep_3pl(
        theta, a, b, g_hat, data, packed)
    (bsz, k), m = theta.shape, a.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_3pl, packed=packed),
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ] + _data_specs(tb, tm, packed),
        out_specs=pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * m * k + 16 * bsz * m,
            bytes_accessed=(4 * (bsz * k + m * k + 2 * m + bsz)
                            + (bsz * m if packed else 8 * bsz * m)),
            transcendentals=4 * bsz * m),
        interpret=interpret,
    )(theta, a, b.reshape(1, m), g2.reshape(1, m), *data)
    return out[:bsz0, 0]


def _bwd_pallas_3pl(packed, interpret, residuals, g):
    theta, a, b, g_hat, *data = residuals
    theta, a, b, g2, data, tb, tm, bsz0, m0 = _prep_3pl(
        theta, a, b, g_hat, tuple(data), packed)
    (bsz, k), m = theta.shape, a.shape[0]
    gg = jnp.pad(g.reshape(-1, 1).astype(jnp.float32), ((0, bsz - bsz0), (0, 0)))
    b2, g2r = b.reshape(1, m), g2.reshape(1, m)
    common_in = [
        pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]

    dtheta = pl.pallas_call(
        functools.partial(_bwd_dtheta_kernel_3pl, packed=packed),
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=common_in + _data_specs(tb, tm, packed),
        out_specs=pl.BlockSpec((tb, k), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, k), jnp.float32),
        interpret=interpret,
    )(gg, theta, a, b2, g2r, *data)

    # transposed grid: item tiles outer, student tiles inner (accumulated)
    common_in_t = [
        pl.BlockSpec((tb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    data_specs_t = [pl.BlockSpec((tb, tm), lambda j, i: (i, j),
                                 memory_space=pltpu.VMEM)
                    for _ in range(1 if packed else 2)]
    da, db2, dg2 = pl.pallas_call(
        functools.partial(_bwd_items_kernel_3pl, packed=packed),
        grid=(_cdiv(m, tm), _cdiv(bsz, tb)),
        in_specs=common_in_t + data_specs_t,
        out_specs=[
            pl.BlockSpec((tm, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(gg, theta, a, b2, g2r, *data)

    grads = (dtheta[:bsz0], da[:m0], db2[0, :m0], dg2[0, :m0])
    return grads + ((None,) if packed else (None, None))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _masked_loglik_3pl(theta, a, b, g_hat, resp, mask, interpret):
    return _fwd_pallas_3pl(theta, a, b, g_hat, (resp, mask), interpret, False)


def _fwd_rule_3pl(theta, a, b, g_hat, resp, mask, interpret):
    return (_fwd_pallas_3pl(theta, a, b, g_hat, (resp, mask), interpret, False),
            (theta, a, b, g_hat, resp, mask))


_masked_loglik_3pl.defvjp(_fwd_rule_3pl,
                          functools.partial(_bwd_pallas_3pl, False))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _masked_loglik_3pl_packed(theta, a, b, g_hat, packed, interpret):
    return _fwd_pallas_3pl(theta, a, b, g_hat, (packed,), interpret, True)


def _fwd_rule_3pl_packed(theta, a, b, g_hat, packed, interpret):
    return (_fwd_pallas_3pl(theta, a, b, g_hat, (packed,), interpret, True),
            (theta, a, b, g_hat, packed))


_masked_loglik_3pl_packed.defvjp(_fwd_rule_3pl_packed,
                                 functools.partial(_bwd_pallas_3pl, True))


def masked_loglik_3pl(theta: jax.Array, a: jax.Array, b: jax.Array,
                      g_hat: jax.Array, resp: jax.Array, mask: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
    """Per-person masked 3PL Bernoulli log-likelihood, fused on TPU -> (B,).

    Semantics == ops.likelihood.masked_loglik_per_person(logits_2pl(...),
    g_hat=g_hat). Differentiable w.r.t. theta, a, b, g_hat (custom VJP with
    logit recompute). Leading sample axes lift through vmap.
    """
    if interpret is None:
        interpret = not _is_tpu()
    theta, a = theta.astype(jnp.float32), a.astype(jnp.float32)
    b, g_hat = b.astype(jnp.float32), g_hat.astype(jnp.float32)
    resp, mask = resp.astype(jnp.float32), mask.astype(jnp.float32)
    if theta.ndim == 2:
        return _masked_loglik_3pl(theta, a, b, g_hat, resp, mask, interpret)
    if a.ndim == theta.ndim:
        in_axes = ((0, 0, 0, 0, None, None) if resp.ndim == 2
                   else (0, 0, 0, 0, 0, 0))
    else:
        in_axes = (0, None, None, None, None, None)
    fn = lambda *xs: masked_loglik_3pl(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, b, g_hat, resp, mask)


def masked_loglik_3pl_packed(theta: jax.Array, a: jax.Array, b: jax.Array,
                             g_hat: jax.Array, packed: jax.Array,
                             interpret: bool | None = None) -> jax.Array:
    """Per-person masked 3PL loglik from pack_responses codes -> (B,)."""
    if interpret is None:
        interpret = not _is_tpu()
    theta, a = theta.astype(jnp.float32), a.astype(jnp.float32)
    b, g_hat = b.astype(jnp.float32), g_hat.astype(jnp.float32)
    if theta.ndim == 2:
        return _masked_loglik_3pl_packed(theta, a, b, g_hat, packed, interpret)
    if a.ndim == theta.ndim:
        in_axes = (0, 0, 0, 0, None)
    else:
        in_axes = (0, None, None, None, None)
    fn = lambda *xs: masked_loglik_3pl_packed(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, b, g_hat, packed)


# ------------------------------------------------------------ public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _masked_loglik_2pl(theta, a, b, resp, mask, interpret):
    return _fwd_pallas(theta, a, b, resp, mask, interpret)


def _fwd_rule(theta, a, b, resp, mask, interpret):
    out = _fwd_pallas(theta, a, b, resp, mask, interpret)
    return out, (theta, a, b, resp, mask)


_masked_loglik_2pl.defvjp(_fwd_rule, _bwd_pallas)


def masked_loglik_2pl(theta: jax.Array, a: jax.Array, b: jax.Array,
                      resp: jax.Array, mask: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
    """Per-person masked 2PL Bernoulli log-likelihood, fused on TPU.

    theta (B, K), a (M, K), b (M,), resp/mask (B, M) -> (B,).
    Semantics == ops.likelihood.masked_loglik_per_person(logits_2pl(...)).
    Differentiable w.r.t. theta, a, b (custom VJP with logit recompute).
    interpret=None auto-selects interpret mode off-TPU (tests on CPU).

    Batched/sharded use: leading sample axes go through vmap (the kernel is
    rank-2; vmap lifts it); under pjit the student axis shards freely, and
    item-sharded `a`/`b` gather at kernel entry.
    """
    if interpret is None:
        interpret = not _is_tpu()
    theta = theta.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    resp = resp.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if theta.ndim == 2:
        return _masked_loglik_2pl(theta, a, b, resp, mask, interpret)
    # vmap over leading sample axes (items may or may not carry the axis).
    if a.ndim == theta.ndim:  # per-sample item draws
        in_axes = (0, 0, 0, None, None) if resp.ndim == 2 else (0, 0, 0, 0, 0)
    else:
        in_axes = (0, None, None, None, None)
    fn = lambda *xs: masked_loglik_2pl(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(theta, a, b, resp, mask)


# ----------------- transposed-theta one-pass train kernels (packed)
#
# Layout-driven variants of the one-pass training kernels
# (masked_loglik_*_packed_train) for the perf pipeline:
#
# - theta enters TRANSPOSED as (K, B) row-major. With K ~ 4, (B, K) arrays
#   tile as T(8,128) with 4/128 lane occupancy, and XLA prefers a transposed
#   T(4,128) layout for its own (B, K) elementwise fusions — so every
#   Pallas boundary crossing inserted a ~3.5 us relayout copy (8 copies
#   profiled in the 10k x 1k train step on v5e). (K, B) row-major is
#   simultaneously XLA's efficient layout and Mosaic's required one: the
#   copies vanish, and the whole mu/logvar/eps/theta/KL elementwise chain
#   runs at full lane width. The in-kernel dot_generals contract over the
#   K axis directly (MXU transposes are free relative to HBM relayouts).
# - the per-person loglik is accumulated to ONE SCALAR in the kernel: the
#   training loss only ever consumes ll.sum(), and a (B, 1) f32 output
#   tiles as T(8,128) with 1/128 occupancy (~5 MB of padded HBM traffic at
#   B = 10k that pure padding).
#
# Gradient contract: the scalar output makes the uniform-cotangent contract
# of the one-pass family exact by construction (d ll_sum / d cell is the
# same scalar for every person).

def _fused_train_kernel_packed_t(thetaT_ref, a_ref, b_ref, pk_ref,
                                 ll_ref, dthT_ref, da_ref, db_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    logits = jax.lax.dot_general(  # (K, TB) x (TM, K) -> (TB, TM)
        thetaT_ref[:], a_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    e = jnp.exp(-jnp.abs(logits))
    log1p_e = jnp.log1p(e)
    sp_pos = log1p_e + jnp.maximum(logits, 0.0)          # softplus(l)
    ll_cell = -m * jnp.where(r > 0.5, sp_pos - logits, sp_pos)
    inv = 1.0 / (1.0 + e)
    s = jnp.where(logits >= 0, inv, 1.0 - inv)           # sigmoid(l)
    dl = m * (r - s)
    ll_part = ll_cell.sum().reshape(1, 1)  # Mosaic: no scalar VMEM stores
    dthT_part = jax.lax.dot_general(  # (TM, K) x (TB, TM) -> (K, TB)
        a_ref[:], dl, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da_part = jax.lax.dot_general(    # (TB, TM) x (K, TB) -> (TM, K)
        dl, thetaT_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_part = -dl.sum(axis=0, keepdims=True)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        ll_ref[:] = ll_part

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        ll_ref[:] = ll_ref[:] + ll_part

    @pl.when(j == 0)
    def _():
        dthT_ref[:] = dthT_part

    @pl.when(j > 0)
    def _():
        dthT_ref[:] = dthT_ref[:] + dthT_part

    @pl.when(i == 0)
    def _():
        da_ref[:] = da_part
        db_ref[:] = db_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        db_ref[:] = db_ref[:] + db_part


def _pad_packed_t(thetaT, a, b, packed, tb, tm):
    bsz, m = packed.shape
    pb, pm = (-bsz) % tb, (-m) % tm
    if pb or pm:
        thetaT = jnp.pad(thetaT, ((0, 0), (0, pb)))
        a = jnp.pad(a, ((0, pm), (0, 0)))
        b = jnp.pad(b, ((0, pm),))
        packed = jnp.pad(packed, ((0, pb), (0, pm)))  # 0 == missing: inert
    return thetaT, a, b, packed


def _fused_train_fwd_t(thetaT, a, b, packed, interpret):
    bsz0, m0 = packed.shape
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    thetaT, a, b, packed = _pad_packed_t(thetaT, a, b, packed, tb, tm)
    (k, bsz), m = thetaT.shape, a.shape[0]
    ll, dthT, da, db2 = pl.pallas_call(
        _fused_train_kernel_packed_t,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((k, tb), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tb), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_sds((1, 1), jnp.float32, thetaT, a, packed),
            out_sds((k, bsz), jnp.float32, thetaT, a, packed),
            out_sds((m, k), jnp.float32, thetaT, a, packed),
            out_sds((1, m), jnp.float32, thetaT, a, packed),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * m * k + 16 * bsz * m,
            bytes_accessed=bsz * m + 4 * (bsz * k * 2 + m * k * 2 + 2 * m),
            transcendentals=2 * bsz * m),
        interpret=interpret,
    )(thetaT, a, b.reshape(1, m), packed)
    return ll[0, 0], dthT[:, :bsz0], da[:m0], db2[0, :m0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _masked_loglik_2pl_packed_train_t(thetaT, a, b, packed, interpret):
    return _fused_train_fwd_t(thetaT, a, b, packed, interpret)[0]


def _fused_train_fwd_rule_t(thetaT, a, b, packed, interpret):
    ll, dthT, da, db = _fused_train_fwd_t(thetaT, a, b, packed, interpret)
    return ll, (dthT, da, db)


def _fused_train_bwd_rule_t(interpret, residuals, g):
    dthT, da, db = residuals
    return g * dthT, g * da, g * db, None


_masked_loglik_2pl_packed_train_t.defvjp(_fused_train_fwd_rule_t,
                                         _fused_train_bwd_rule_t)


def masked_loglik_2pl_packed_train_t(thetaT: jax.Array, a: jax.Array,
                                     b: jax.Array, packed: jax.Array,
                                     interpret: bool | None = None
                                     ) -> jax.Array:
    """Transposed-theta one-pass 2PL training kernel: thetaT (K, B) ->
    SCALAR sum_i ll_i. Value- and gradient-identical to
    masked_loglik_2pl_packed_train(theta.T, ...).sum() (tested)."""
    if interpret is None:
        interpret = not _is_tpu()
    thetaT = thetaT.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if thetaT.ndim == 2:
        if interpret and _has_vma(thetaT, a, b, packed):
            return _xla_train_2pl(thetaT.T, a, b, packed).sum()
        thetaT, a, b, packed = match_vma(thetaT, a, b, packed)
        return _masked_loglik_2pl_packed_train_t(thetaT, a, b, packed,
                                                 interpret)
    if a.ndim == thetaT.ndim:
        in_axes = (0, 0, 0, None)
    else:
        in_axes = (0, None, None, None)
    fn = lambda *xs: masked_loglik_2pl_packed_train_t(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(thetaT, a, b, packed)


def _fused_train_kernel_3pl_packed_t(thetaT_ref, a_ref, b_ref, g_ref, pk_ref,
                                     ll_ref, dthT_ref, da_ref, db_ref,
                                     dg_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    logits = jax.lax.dot_general(
        thetaT_ref[:], a_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) - b_ref[:]
    m, r = _decode_packed(pk_ref[:].astype(jnp.float32))
    gh = g_ref[:]
    ll_part = _cell_3pl(logits, gh, r, m).sum().reshape(1, 1)
    dl, dgc = _dcell_3pl(logits, gh, r, m)
    dthT_part = jax.lax.dot_general(
        a_ref[:], dl, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da_part = jax.lax.dot_general(
        dl, thetaT_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_part = -dl.sum(axis=0, keepdims=True)
    dg_part = dgc.sum(axis=0, keepdims=True)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        ll_ref[:] = ll_part

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        ll_ref[:] = ll_ref[:] + ll_part

    @pl.when(j == 0)
    def _():
        dthT_ref[:] = dthT_part

    @pl.when(j > 0)
    def _():
        dthT_ref[:] = dthT_ref[:] + dthT_part

    @pl.when(i == 0)
    def _():
        da_ref[:] = da_part
        db_ref[:] = db_part
        dg_ref[:] = dg_part

    @pl.when(i > 0)
    def _():
        da_ref[:] = da_ref[:] + da_part
        db_ref[:] = db_ref[:] + db_part
        dg_ref[:] = dg_ref[:] + dg_part


def _fused_train_fwd_3pl_t(thetaT, a, b, g_hat, packed, interpret):
    bsz0, m0 = packed.shape
    tb = min(STUDENT_BLOCK, _cdiv(bsz0, 8) * 8)
    tm = min(ITEM_BLOCK, _cdiv(m0, 128) * 128)
    thetaT, a, b, packed = _pad_packed_t(thetaT, a, b, packed, tb, tm)
    (k, bsz), m = thetaT.shape, a.shape[0]
    g2 = jnp.pad(g_hat, ((0, m - m0),))
    ll, dthT, da, db2, dg2 = pl.pallas_call(
        _fused_train_kernel_3pl_packed_t,
        grid=(_cdiv(bsz, tb), _cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((k, tb), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tb), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_sds((1, 1), jnp.float32, thetaT, a, packed),
            out_sds((k, bsz), jnp.float32, thetaT, a, packed),
            out_sds((m, k), jnp.float32, thetaT, a, packed),
            out_sds((1, m), jnp.float32, thetaT, a, packed),
            out_sds((1, m), jnp.float32, thetaT, a, packed),
        ],
        interpret=interpret,
    )(thetaT, a, b.reshape(1, m), g2.reshape(1, m), packed)
    return ll[0, 0], dthT[:, :bsz0], da[:m0], db2[0, :m0], dg2[0, :m0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _masked_loglik_3pl_packed_train_t(thetaT, a, b, g_hat, packed, interpret):
    return _fused_train_fwd_3pl_t(thetaT, a, b, g_hat, packed, interpret)[0]


def _fused_train_fwd_rule_3pl_t(thetaT, a, b, g_hat, packed, interpret):
    ll, dthT, da, db, dg = _fused_train_fwd_3pl_t(thetaT, a, b, g_hat, packed,
                                                  interpret)
    return ll, (dthT, da, db, dg)


def _fused_train_bwd_rule_3pl_t(interpret, residuals, g):
    dthT, da, db, dg = residuals
    return g * dthT, g * da, g * db, g * dg, None


_masked_loglik_3pl_packed_train_t.defvjp(_fused_train_fwd_rule_3pl_t,
                                         _fused_train_bwd_rule_3pl_t)


def masked_loglik_3pl_packed_train_t(thetaT: jax.Array, a: jax.Array,
                                     b: jax.Array, g_hat: jax.Array,
                                     packed: jax.Array,
                                     interpret: bool | None = None
                                     ) -> jax.Array:
    """Transposed-theta one-pass 3PL training kernel: thetaT (K, B) ->
    SCALAR sum_i ll_i (see masked_loglik_2pl_packed_train_t)."""
    if interpret is None:
        interpret = not _is_tpu()
    thetaT, a = thetaT.astype(jnp.float32), a.astype(jnp.float32)
    b, g_hat = b.astype(jnp.float32), g_hat.astype(jnp.float32)
    if thetaT.ndim == 2:
        if interpret and _has_vma(thetaT, a, b, g_hat, packed):
            return _xla_train_3pl(thetaT.T, a, b, g_hat, packed).sum()
        thetaT, a, b, g_hat, packed = match_vma(thetaT, a, b, g_hat, packed)
        return _masked_loglik_3pl_packed_train_t(thetaT, a, b, g_hat, packed,
                                                 interpret)
    if a.ndim == thetaT.ndim:
        in_axes = (0, 0, 0, 0, None)
    else:
        in_axes = (0, None, None, None, None)
    fn = lambda *xs: masked_loglik_3pl_packed_train_t(*xs, interpret=interpret)
    return jax.vmap(fn, in_axes=in_axes)(thetaT, a, b, g_hat, packed)
