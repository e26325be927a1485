"""Embedding gradients without row-serialized scatters.

Reference context: every embedding lookup's backward is a scatter-add into
the (V, D) table; TPU scatter is row-serialized (~0.09ms/10K rows measured
at small vocab; ~4.7ms for 53K rows into Criteo's 2.57M x 10). This module
holds the measured-and-chosen alternatives (round-4 micro-benches,
scripts/bench_embed_grad.py / bench_ctr_anatomy.py):

* small vocab (fits the VMEM budget): grad_table = one_hot(ids)^T @ g as a
  CHUNKED XLA scan of one-hot MXU matmuls — 0.45ms vs 0.79ms scatter at
  102K rows into 3.7K x 64. (A Pallas variant that builds the one-hot in
  VMEM measured slower, 1.0ms — kept below as onehot_matmul_grad.)
* CTR unified vocabularies: grouped_take_rows exploits the per-field
  offset structure — small-vocab fields' dense blocks land via contiguous
  dynamic_update_slice, only huge-vocab fields scatter (2.5 vs 5.9ms at
  Criteo shape).

``take_rows_dense_grad`` is the drop-in custom-VJP gather used by the
sequential family (models/base.py::SequentialRecommender.embed_seq).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (V_pad, D) f32 accumulator + (V_pad, R_CHUNK) bf16 one-hot must fit VMEM
# alongside pipeline buffers. 3.7K x 64 is ~1MB + 3.8MB; cap generously.
VMEM_BUDGET_BYTES = 10 << 20
R_CHUNK = 512


def _round_up(x, m):
    return -(-x // m) * m


def kernel_supported(n_rows, dim):
    v_pad = _round_up(n_rows, 8)
    need = v_pad * dim * 4 + v_pad * R_CHUNK * 2 + R_CHUNK * dim * 4
    return need <= VMEM_BUDGET_BYTES


def _hi_lo(g):
    """f32 -> (hi, lo) bf16 pair with g ~= hi + lo (top ~16 mantissa bits);
    bf16 inputs pass through with a zero low part skipped by the caller."""
    hi = g.astype(jnp.bfloat16)
    lo = (g - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _onehot_matmul_kernel(split, ids_ref, g_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v_pad = out_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (v_pad, ids_ref.shape[1]), 0)
    onehot = (rows == ids_ref[:]).astype(jnp.bfloat16)

    def dot(rhs):
        return jax.lax.dot_general(
            onehot, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if split:  # f32 cotangent: two bf16 passes, one-hot reused (exact 0/1)
        hi, lo = _hi_lo(g_ref[:])
        out_ref[:] += dot(hi) + dot(lo)
    else:      # bf16 cotangent: single pass, lossless cast
        out_ref[:] += dot(g_ref[:].astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnums=(2,))
def onehot_matmul_grad(ids, g, n_rows):
    """ids (R,) int32, g (R, D) -> (n_rows, D) f32 with duplicate ids
    summed. Pallas one-hot matmul; R padded to a chunk multiple with
    out-of-range ids (match nothing -> zero rows)."""
    R = ids.shape[0]
    D = g.shape[1]
    v_pad = _round_up(n_rows, 8)
    r_pad = _round_up(max(R, 1), R_CHUNK)
    if r_pad != R:
        ids = jnp.concatenate(
            [ids, jnp.full((r_pad - R,), v_pad, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((r_pad - R, D), g.dtype)])
    grid = (r_pad // R_CHUNK,)
    split = g.dtype != jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(_onehot_matmul_kernel, split),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_CHUNK, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v_pad, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v_pad, D), jnp.float32),
    )(ids.reshape(1, -1), g)
    return out[:n_rows]


@functools.partial(jax.jit, static_argnums=(2,))
def onehot_matmul_grad_xla(ids, g, n_rows):
    """XLA fallback with the same semantics: chunked scan of one-hot
    matmuls with an f32 carry accumulator. ~3x the kernel's HBM traffic
    (one-hot tiles materialize) but still beats a row-serialized scatter."""
    R = ids.shape[0]
    D = g.shape[1]
    chunk = min(_round_up(max(R, 1), 128), 4096)
    r_pad = _round_up(max(R, 1), chunk)
    if r_pad != R:
        ids = jnp.concatenate(
            [ids, jnp.full((r_pad - R,), n_rows, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((r_pad - R, D), g.dtype)])
    ids_c = ids.reshape(-1, chunk)
    g_c = g.reshape(-1, chunk, D)

    def body(acc, xs):
        idc, gc = xs
        onehot = (jnp.arange(n_rows, dtype=jnp.int32)[:, None]
                  == idc[None, :]).astype(jnp.bfloat16)

        def dot(rhs):
            return jax.lax.dot_general(
                onehot, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if gc.dtype == jnp.bfloat16:
            upd = dot(gc)
        else:
            hi, lo = _hi_lo(gc)
            upd = dot(hi) + dot(lo)
        return acc + upd, None

    acc, _ = jax.lax.scan(body, jnp.zeros((n_rows, D), jnp.float32),
                          (ids_c, g_c))
    return acc


# ---------------------------------------------------------------- windowed
# Large-vocab dense-grad: XLA's scatter-add of R random rows into a (V, D)
# table row-serializes (~4.7ms for 53K rows into Criteo's 2.57M x 10 —
# measured round 4, scripts/bench_ctr_anatomy.py). Instead: sort the ids
# once, then sweep the table in VMEM-sized row windows; each window's
# (contiguous-in-sorted-order) updates apply serially IN VMEM, and HBM sees
# exactly one (V, D) write.

W_ROWS = 1 << 18          # window rows: (262144, D<=16) f32 <= ~16MB VMEM


def _windowed_kernel(starts_ref, loc_ref, vals_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)
    s, e = starts_ref[i], starts_ref[i + 1]

    def body(j, _):
        r = loc_ref[pl.ds(j, 1), :][0, 0]
        out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(j, 1), :]
        return 0

    jax.lax.fori_loop(s, e, body, 0)


def windowed_grad(ids, g, n_rows):
    """PARKED — fails Mosaic compile at CTR scale: the full-R VMEM
    residency lane-pads (R, D<=16) f32 to (R, 128) and blows the VMEM
    budget; needs a DMA-chunked redesign. Interpret-mode-correct and kept
    for that rework; no production caller (grouped_take_rows superseded it
    for the CTR case). ids (R,) int32, g (R, D) -> (n_rows, D) f32,
    duplicates summed."""
    R = ids.shape[0]
    D = g.shape[1]
    n_pad = _round_up(n_rows, W_ROWS)
    n_w = n_pad // W_ROWS
    order = jnp.argsort(ids)
    sids = ids[order]
    svals = g[order].astype(jnp.float32)
    # window start offsets in the sorted stream (n_w + 1, incl. end)
    bounds = jnp.arange(n_w + 1, dtype=jnp.int32) * W_ROWS
    starts = jnp.searchsorted(sids, bounds).astype(jnp.int32)
    loc = (sids & (W_ROWS - 1)).astype(jnp.int32).reshape(-1, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # loc (R,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # vals (R, D)
        ],
        out_specs=pl.BlockSpec((W_ROWS, D), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _windowed_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
    )(starts, loc, svals)
    return out[:n_rows]


# ------------------------------------------------------------ field-grouped
# The CTR unified vocabulary is a CONCATENATION of per-field vocabularies
# (FMEmbedding offsets). That structure beats the generic scatter: a field
# with a small vocabulary gets its dense (vocab_f, D) gradient from the
# one-hot matmul and lands in the unified table with ONE contiguous
# dynamic_update_slice (its offset range); only the handful of huge-vocab
# fields (Criteo: 6 fields > 16K of 26) still need a scatter, and that
# scatter shrinks from B*F rows to B*(large fields) — measured round 4:
# the full 53K-row scatter into (2.57M, 10) costs ~4.7ms (row-serialized).

SMALL_VOCAB_MAX = 16384


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def grouped_take_rows(field_spec, table, ids):
    """table (V, D); ids (B, F) of GLOBAL (offset) ids; field_spec: tuple of
    (offset, vocab) per field, in ids' column order. Forward is the plain
    gather; backward assembles the dense (V, D) gradient per-field as above.
    """
    return table.at[ids].get(mode="promise_in_bounds")


def _gtr_fwd(field_spec, table, ids):
    return grouped_take_rows(field_spec, table, ids), \
        (ids, table.shape)


def _gtr_bwd(field_spec, res, g):
    ids, (V, D) = res
    g = g.astype(jnp.float32)
    acc = jnp.zeros((V, D), jnp.float32)
    large_ids, large_gs = [], []
    for f, (off, vocab) in enumerate(field_spec):
        idf = ids[:, f] - off
        gf = g[:, f, :]
        if vocab <= SMALL_VOCAB_MAX:
            grad_f = onehot_matmul_grad_xla(idf, gf, vocab)
            acc = jax.lax.dynamic_update_slice(acc, grad_f, (off, 0))
        else:
            large_ids.append(ids[:, f])
            large_gs.append(gf)
    if large_ids:
        acc = acc.at[jnp.concatenate(large_ids)].add(
            jnp.concatenate(large_gs))
    return acc, None


grouped_take_rows.defvjp(_gtr_fwd, _gtr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def take_rows_dense_grad(n, x, rows):
    """x[rows] whose backward materializes the dense (n, D) gradient via
    the XLA chunked one-hot matmul for VMEM-budget vocabularies (measured
    fastest on-chip: 0.45ms vs 0.79ms scatter / 1.0ms Pallas one-hot at
    102K rows into 3.7K x 64) and a plain scatter otherwise. ``rows`` may
    have any shape."""
    return x.at[rows].get(mode="promise_in_bounds")


def _tr_fwd(n, x, rows):
    return take_rows_dense_grad(n, x, rows), (rows, x.shape[1:])


def _tr_bwd(n, res, g):
    rows, tail = res
    d = int(np.prod(tail)) if tail else 1
    g2 = g.reshape(-1, d)
    r = rows.reshape(-1)
    # Measured round 4 (scripts/bench_embed_grad.py, bench_ctr_anatomy.py):
    # small vocab -> the XLA chunked one-hot scan (0.45ms at 102K rows into
    # 3.7K x 64, vs 0.79ms scatter / 1.0ms Pallas one-hot); large vocab on
    # TPU -> the windowed VMEM sweep (XLA's scatter row-serializes at
    # ~4.7ms for 53K rows into 2.57M x 10).
    if kernel_supported(n, d):
        out = onehot_matmul_grad_xla(r, g2, n)
    else:
        # large vocab: plain scatter. (windowed_grad is parked: its full-R
        # VMEM residency lane-pads (R, D<=16) to (R, 128) and blows VMEM —
        # needs the DMA-chunked variant; the field-grouped backward in
        # grouped_take_rows covers the CTR case that motivated it.)
        out = jnp.zeros((n, d), jnp.float32).at[r].add(
            g2.astype(jnp.float32))
    return out.reshape((n,) + tuple(tail)), None


take_rows_dense_grad.defvjp(_tr_fwd, _tr_bwd)
