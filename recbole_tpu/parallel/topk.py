"""Distributed full-sort top-k over an item-sharded mesh.

No reference equivalent (single-GPU reference, SURVEY.md §2.10). This is the
scale-out evaluation design: the item table is row-sharded over the "model"
mesh axis and the user batch is sharded over the "data" axis; each device
scores its (batch-slice x item-slice) block and selects a LOCAL top-k, then
only the (b, k) candidate values/ids per shard cross the interconnect
(all_gather of b*k elements over the "model" axis instead of the full
(B, n_items) score matrix — the log-shaped combine from the sharding
playbook). The "model" all-gather rides ICI on a hybrid mesh
(parallel/mesh.py::make_mesh keeps that axis within a host).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.masked_topk import masked_topk_xla


def distributed_masked_topk(mesh, query, items, invalid_mask, k,
                            axis="model", batch_axis="data"):
    """query (B, D); items (N, D) row-sharded over ``axis`` (N divisible by
    the axis size); invalid_mask (B, N). The batch dim additionally shards
    over ``batch_axis`` when it divides B. Returns (values (B, k),
    global ids (B, k)), sharded over ``batch_axis``."""
    n_shards = mesh.shape[axis]
    N = items.shape[0]
    B = query.shape[0]
    if N % n_shards:
        raise ValueError(f"item count {N} not divisible by axis {axis}"
                         f" size {n_shards}")
    shard_n = N // n_shards
    b_size = mesh.shape.get(batch_axis, 1)
    b_spec = batch_axis if (b_size > 1 and B % b_size == 0) else None

    def local(q, it, m):
        idx = jax.lax.axis_index(axis)
        vals, ids = masked_topk_xla(q, it, m, k)
        gids = ids + idx * shard_n
        av = jax.lax.all_gather(vals, axis)               # (S, b, k)
        ai = jax.lax.all_gather(gids, axis)
        b = q.shape[0]
        av = av.transpose(1, 0, 2).reshape(b, -1)
        ai = ai.transpose(1, 0, 2).reshape(b, -1)
        v2, pos = jax.lax.top_k(av, k)
        return v2, jnp.take_along_axis(ai, pos, axis=1)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(b_spec, None), P(axis, None), P(b_spec, axis)),
        out_specs=(P(b_spec, None), P(b_spec, None)),
        check_rep=False)
    return fn(query, items, invalid_mask)
