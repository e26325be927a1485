"""Distributed full-sort top-k over an item-sharded mesh.

No reference equivalent (single-GPU reference, SURVEY.md §2.10). This is the
scale-out evaluation design: the item table is row-sharded over the "model"
mesh axis; each shard scores its item slice and selects a LOCAL top-k, then
only the (B, k) candidate values/ids per shard cross the interconnect
(all_gather of B*k elements instead of the full (B, n_items) score matrix —
the log-shaped combine from the sharding playbook).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.masked_topk import masked_topk_xla


def distributed_masked_topk(mesh, query, items, invalid_mask, k,
                            axis="model"):
    """query (B, D) replicated; items (N, D) and invalid_mask (B, N) sharded
    over ``axis`` (N divisible by the axis size). Returns replicated
    (values (B, k), global ids (B, k))."""
    n_shards = mesh.shape[axis]
    N = items.shape[0]
    if N % n_shards:
        raise ValueError(f"item count {N} not divisible by axis {axis}"
                         f" size {n_shards}")
    shard_n = N // n_shards

    def local(q, it, m):
        idx = jax.lax.axis_index(axis)
        vals, ids = masked_topk_xla(q, it, m, k)
        gids = ids + idx * shard_n
        av = jax.lax.all_gather(vals, axis)               # (S, B, k)
        ai = jax.lax.all_gather(gids, axis)
        B = q.shape[0]
        av = av.transpose(1, 0, 2).reshape(B, -1)
        ai = ai.transpose(1, 0, 2).reshape(B, -1)
        v2, pos = jax.lax.top_k(av, k)
        return v2, jnp.take_along_axis(ai, pos, axis=1)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(None, axis)),
        out_specs=(P(), P()),
        check_rep=False)
    return fn(query, items, invalid_mask)
