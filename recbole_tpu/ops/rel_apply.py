"""Per-row relation-matrix apply: y[n] = R[rel[n]] @ v[n], as one Pallas
kernel per row-block.

RippleNet/KG-family pattern: every memory row carries a relation id and
must be transformed by that relation's (D, D) matrix. The XLA
relation-vocabulary loop (models/knowledge/ripplenet.py::_rel_apply) runs
NR masked matmul+accumulate passes; the round-5 xplane trace shows each
pass at full HBM bandwidth (convolution_add_fusion x51 = 4.4 ms/step at
ml-1m shape) — the ACCUMULATOR traffic is the cost, not the flops.

Kernel design (flat fat-2D blocks, per ops/trm_layer.py's streaming
findings): for each block of ROWS rows,

    out_all = v_blk @ R_stack            # (ROWS, NR*D) — ONE MXU matmul
    y_blk   = sum_r onehot(rel)[:, r] * out_all[:, r*D:(r+1)*D]

with everything VMEM-resident, so HBM traffic is v + rel + y only
(~40x less than the loop). The backward uses the same shape twice:
dv = select_r(dout @ RT_stack) and dR = (onehot x v)^T @ dout, with dR
accumulated across the sequential grid.

The select never reshapes the lane dim (Mosaic cannot split lanes):
a wide iota mask zeroes the non-selected relation spans, and a constant
delta matrix S[r*D+j, i] = (i == j) contracts the strided sum on the MXU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BF16 = jnp.bfloat16
ROWS_F = 256   # fwd block (512 measured SLOWER end-to-end: 5.37 vs 4.25 s/ep)
ROWS_B = 256   # bwd block (recompute + dR working set)
MAX_NR = 128          # same bound the XLA loop uses
MAX_STACK_VMEM = 6 * 1024 * 1024


def rel_apply_supported(n_relations, D):
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if n_relations > MAX_NR:
        return False
    # out_all block must fit VMEM comfortably
    return ROWS_F * n_relations * D * 4 <= MAX_STACK_VMEM


def _wide_mask(rel2, rows, NR, D):
    """(rows, NR*D) mask: 1 where column lies in rel[n]'s D-span.
    rel2: (rows, 1) int32 — 1-D int operands need 1024-multiple blocks on
    TPU, so the relation ids ride a 2-D column."""
    col_r = jax.lax.broadcasted_iota(jnp.int32, (rows, NR * D), 1) // D
    return (col_r == rel2).astype(BF16)


def _delta_sum(masked, NR, D):
    """(rows, NR*D) -> (rows, D): y[n,i] = sum_r masked[n, r*D+i], via the
    constant S[r*D+j, i] = (i == j) on the MXU (no lane reshape)."""
    row_j = jax.lax.broadcasted_iota(jnp.int32, (NR * D, D), 0) % D
    col_i = jax.lax.broadcasted_iota(jnp.int32, (NR * D, D), 1)
    S = (row_j == col_i).astype(BF16)
    return jax.lax.dot_general(
        masked.astype(BF16), S, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tile_v(v, NR, D):
    """(rows, D) -> (rows, NR*D) with v repeated per relation span, via the
    constant T[j, r*D+j'] = (j == j') on the MXU."""
    row_j = jax.lax.broadcasted_iota(jnp.int32, (D, NR * D), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (D, NR * D), 1) % D
    T = (row_j == col_j).astype(BF16)
    return jax.lax.dot_general(
        v.astype(BF16), T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(v_ref, rel_ref, rstack_ref, y_ref, *, NR, D):
    rows = v_ref.shape[0]
    out_all = jax.lax.dot_general(
        v_ref[:].astype(BF16), rstack_ref[:].astype(BF16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    masked = out_all.astype(BF16) * _wide_mask(rel_ref[:], rows, NR, D)
    y_ref[:] = _delta_sum(masked, NR, D)


def _bwd_kernel(v_ref, rel_ref, rstack_ref, rstack_t_ref, dy_ref,
                dv_ref, dr_ref, *, NR, D):
    rows = v_ref.shape[0]
    dy = dy_ref[:]
    mask = _wide_mask(rel_ref[:], rows, NR, D)
    # dv[n] = R[rel[n]]^T @ dy[n]  — same stacked-matmul + select shape
    dv_all = jax.lax.dot_general(
        dy.astype(BF16), rstack_t_ref[:].astype(BF16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv_ref[:] = _delta_sum(dv_all.astype(BF16) * mask, NR, D)
    # dR[r] = sum_{n: rel[n]=r} dy[n] v[n]^T  -> stacked (NR*D, D):
    # w[n, r*D+j] = onehot[n,r] * v[n,j] = mask * tiled(v)
    w = mask * _tile_v(v_ref[:], NR, D).astype(BF16)
    dr = jax.lax.dot_general(
        w.astype(BF16), dy.astype(BF16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dr_ref[:] = jnp.zeros(dr_ref.shape, jnp.float32)
    dr_ref[:] += dr


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def rel_apply(v, rel, R):
    """v: (N, D) f32, rel: (N,) int32, R: (NR, D, D) -> (N, D).

    y[n] = v[n] @ R[rel[n]]^T ... NOTE orientation: matches the XLA loop's
    einsum("bmj,ij->bmi", v, R[r]) i.e. y[n, i] = sum_j v[n, j] R[r, i, j].
    """
    return _rel_apply_fwd(v, rel, R)[0]


def _call_fwd(N, NR, D):
    grid = (pl.cdiv(N, ROWS_F),)
    kw = {"memory_space": pltpu.VMEM}
    v_spec = pl.BlockSpec((ROWS_F, D), lambda i: (i, 0), **kw)
    rel_spec = pl.BlockSpec((ROWS_F, 1), lambda i: (i, 0), **kw)
    rs_spec = pl.BlockSpec((D, NR * D), lambda i: (0, 0), **kw)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, NR=NR, D=D),
        grid=grid,
        in_specs=[v_spec, rel_spec, rs_spec],
        out_specs=v_spec,
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))


def _call_bwd(N, NR, D):
    grid = (pl.cdiv(N, ROWS_B),)
    kw = {"memory_space": pltpu.VMEM}
    v_spec = pl.BlockSpec((ROWS_B, D), lambda i: (i, 0), **kw)
    rel_spec = pl.BlockSpec((ROWS_B, 1), lambda i: (i, 0), **kw)
    rs_spec = pl.BlockSpec((D, NR * D), lambda i: (0, 0), **kw)
    dr_spec = pl.BlockSpec((NR * D, D), lambda i: (0, 0), **kw)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, NR=NR, D=D),
        grid=grid,
        in_specs=[v_spec, rel_spec, rs_spec, rs_spec, v_spec],
        out_specs=[v_spec, dr_spec],
        out_shape=[jax.ShapeDtypeStruct((N, D), jnp.float32),
                   jax.ShapeDtypeStruct((NR * D, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))


def _pad(v, rel, NR, rows):
    """Pad rows to a block multiple; pad rows carry rel = NR, which matches
    no one-hot column, so they contribute nothing to y/dv/dR."""
    N = v.shape[0]
    rem = (-N) % rows
    if rem:
        v = jnp.concatenate([v, jnp.zeros((rem, v.shape[1]), v.dtype)])
        rel = jnp.concatenate(
            [rel, jnp.full((rem,), NR, jnp.int32)])
    return v, rel.astype(jnp.int32), N


def _rel_apply_fwd(v, rel, R):
    N0, D = v.shape
    NR = R.shape[0]
    vp, relp, _ = _pad(v, rel, NR, ROWS_F)
    # R_stack[j, r*D + i] = R[r, i, j]  (so v @ R_stack gives y[n, r*D+i])
    rstack = R.transpose(2, 0, 1).reshape(D, NR * D)
    y = _call_fwd(vp.shape[0], NR, D)(vp, relp[:, None], rstack)[:N0]
    return y, (v, rel, R)


def _rel_apply_bwd(res, dy):
    v, rel, R = res
    N0, D = v.shape
    NR = R.shape[0]
    vp, relp, _ = _pad(v, rel, NR, ROWS_B)
    dyp, _, _ = _pad(dy, rel, NR, ROWS_B)
    rstack = R.transpose(2, 0, 1).reshape(D, NR * D)
    # RT_stack[i, r*D + j] = R[r, i, j]  (dv[n, j] = sum_i dy[n,i] R[r,i,j])
    rstack_t = R.transpose(1, 0, 2).reshape(D, NR * D)
    dv, dr = _call_bwd(vp.shape[0], NR, D)(vp, relp[:, None], rstack,
                                           rstack_t, dyp)
    # kernel: w[n, r*D+j] = onehot[n,r] * v[n,j]; dr = w^T @ dy so
    # dr[r*D+j, i] = dR[r, i, j] — reshape to [r, j, i], swap to [r, i, j]
    dR = dr.reshape(NR, D, D).transpose(0, 2, 1)
    return dv[:N0], None, dR


rel_apply.defvjp(_rel_apply_fwd, _rel_apply_bwd)
