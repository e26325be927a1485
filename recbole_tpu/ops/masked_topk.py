"""Fused masked score + streaming top-k Pallas kernel.

The full-sort evaluation hot path (reference: full_sort_predict matmul ->
history mask -> torch.topk, trainer.py:328-352 + evaluators.py:53-76)
materializes a (B, n_items) float32 score matrix in HBM and then sorts it.
For catalog-scale item counts that HBM round-trip dominates eval time (the
reference's published eval costs are 4-300x its train costs, BASELINE.md).

This kernel streams the item table through VMEM in tiles: each grid step
computes the (B, TILE_N) score block on the MXU, applies the invalid-item
mask, and folds the block into a running per-row top-k held in VMEM scratch —
the full score matrix never exists. Selection is K rounds of vectorized
max/argmax (jax.lax.top_k does not lower to Mosaic), and tiles that cannot
improve any row's current k-th best are skipped with a single comparison
pass (@pl.when), so after warm-up most tiles cost one VPU sweep.

HBM traffic: items (N*D*4) + mask (B*N) bytes, vs the unfused path's
N*D*4 + 2*B*N*4 (write scores + re-read for sort) — an ~8x reduction in the
score-matrix term, plus one kernel launch instead of three XLA ops.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = -1e15


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k",))
def masked_topk_xla(query, items, invalid_mask, k):
    """Reference XLA path: materialize scores, mask, lax.top_k."""
    scores = jnp.dot(query, items.T, preferred_element_type=jnp.float32)
    scores = jnp.where(invalid_mask > 0, NEG_INF, scores)
    return jax.lax.top_k(scores, k)


def _kernel(query_ref, items_ref, mask_ref, vals_ref, ids_ref,
            run_vals, run_ids, *, k, tile_n, n_items):
    j = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        run_vals[:] = jnp.full_like(run_vals, NEG_INF)
        run_ids[:] = jnp.zeros_like(run_ids)

    scores = jnp.dot(query_ref[:], items_ref[:].T,
                     preferred_element_type=jnp.float32)       # (B, TILE_N)
    B = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
    global_id = col + j * tile_n
    # int8 vector compare is unsupported on v5e — widen before comparing
    valid = (mask_ref[:].astype(jnp.int32) == 0) & (global_id < n_items)
    scores = jnp.where(valid, scores, NEG_INF)

    # skip tiles that cannot beat any row's current k-th best
    tile_max = jnp.max(scores, axis=1)                          # (B,)
    cur_kth = run_vals[:, k - 1]

    @pl.when(jnp.any(tile_max > cur_kth))
    def _merge():
        comb_vals = jnp.concatenate([run_vals[:, :k], scores], axis=1)
        comb_ids = jnp.concatenate(
            [run_ids[:, :k], global_id], axis=1)                # (B, k+TILE_N)
        width = comb_vals.shape[1]
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, width), 1)
        new_vals = jnp.full((B, run_vals.shape[1]), NEG_INF)
        new_ids = jnp.zeros((B, run_ids.shape[1]), jnp.int32)
        for r in range(k):
            m = jnp.max(comb_vals, axis=1)                      # (B,)
            am = jnp.argmax(comb_vals, axis=1).astype(jnp.int32)
            picked_id = jnp.sum(
                jnp.where(cols == am[:, None], comb_ids, 0), axis=1)
            slot = jax.lax.broadcasted_iota(
                jnp.int32, new_vals.shape, 1) == r
            new_vals = jnp.where(slot, m[:, None], new_vals)
            new_ids = jnp.where(slot, picked_id[:, None], new_ids)
            comb_vals = jnp.where(cols == am[:, None], NEG_INF, comb_vals)
        run_vals[:] = new_vals
        run_ids[:] = new_ids

    @pl.when(j == n_tiles - 1)
    def _out():
        vals_ref[:] = run_vals[:]
        ids_ref[:] = run_ids[:]


def masked_topk_pallas(query, items, invalid_mask, k, tile_n=1024,
                       interpret=False):
    """query (B, D) f32, items (N, D) f32, invalid_mask (B, N) int8 -> top-k.

    Returns (values (B, k) f32, ids (B, k) int32). Rows beyond the real
    item count and masked entries never appear (score NEG_INF).
    """
    B, D = query.shape
    N = items.shape[0]
    tile_n = min(tile_n, _round_up(N, 128))
    n_pad = _round_up(N, tile_n)
    if n_pad != N:
        items = jnp.pad(items, ((0, n_pad - N), (0, 0)))
        invalid_mask = jnp.pad(invalid_mask, ((0, 0), (0, n_pad - N)),
                               constant_values=1)
    k_pad = max(k, 8)
    grid = (n_pad // tile_n,)

    vals, ids = pl.pallas_call(
        functools.partial(_kernel, k=k, tile_n=tile_n, n_items=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, k_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k_pad), jnp.float32),
            pltpu.VMEM((B, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(query, items, invalid_mask)
    return vals[:, :k], ids[:, :k]


# pallas imports are deferred so CPU-only environments never touch Mosaic
from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402


def masked_topk(query, items, invalid_mask, k, prefer_pallas=False):
    """Dispatcher for the fused masked top-k scorer.

    Measured on TPU v5e (B=256, D=64): XLA's specialized TopK emitter beats
    this kernel's K-round selection (N=98k: 1.5ms XLA vs 2.4ms Pallas), so
    the default stays on XLA; the kernel is kept behind ``prefer_pallas``
    (config ``use_pallas_topk``) as the building block for the item-sharded
    distributed top-k, where per-shard streaming selection + a K-wide
    cross-shard combine avoids an all-gather of full score matrices.
    """
    if prefer_pallas and jax.default_backend() in ("tpu", "axon") \
            and query.shape[0] % 8 == 0:
        return masked_topk_pallas(query, items, invalid_mask, k)
    return masked_topk_xla(query, items, invalid_mask, k)
