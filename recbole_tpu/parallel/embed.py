"""Row-sharded embedding lookup for the unified CTR feature table.

No reference equivalent — the reference's FMEmbedding
(recbole/model/layers.py:121, used via abstract_recommender.py:220-224) is a
single-GPU nn.Embedding over the unified feature vocabulary (2.57M rows on
Criteo). At that scale the table is the one CTR tensor worth partitioning,
so under a mesh it lives row-sharded over the "model" axis and lookups run
as the scaling-book sharded-embedding recipe:

  forward:  each shard gathers the ids that land in its row range (masked,
            clamped) and the (B, F, D) partial activations are summed with
            ONE psum over "model" — a few MB riding ICI, vs all-gathering
            the 100MB+ table that GSPMD's default gather partitioning falls
            back to.
  backward: each shard materializes gradients ONLY for its own rows via the
            dedup sorted-segment-sum (ops/bitgraph.rows_to_dense — no
            cross-shard scatter), then one psum over "data" combines the
            batch shards. That psum is the data-parallel gradient sync,
            shrunk by the model-axis factor.

The custom VJP keeps both directions explicit so neither degenerates under
GSPMD's scatter/gather heuristics.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.bitgraph import rows_to_dense, take_rows


def sharded_take_rows(mesh, table, ids, axis="model", batch_axis="data"):
    """table (V, D) row-sharded over ``axis`` (V divisible by the axis size);
    ids (B, F) int32. Returns (B, F, D). The batch dim additionally shards
    over ``batch_axis`` when it divides B; otherwise ids replicate and the
    backward skips the batch-axis psum."""
    V, D = table.shape
    m = mesh.shape[axis]
    if V % m:
        raise ValueError(f"vocab {V} not divisible by mesh axis {axis}={m}")
    shard_v = V // m
    B = ids.shape[0]
    b_size = mesh.shape.get(batch_axis, 1)
    b_spec = batch_axis if (b_size > 1 and B % b_size == 0) else None

    def _local_window(ids_l):
        start = jax.lax.axis_index(axis) * shard_v
        loc = ids_l - start
        ok = (loc >= 0) & (loc < shard_v)
        return jnp.where(ok, loc, 0), ok

    def local_fwd(tbl, ids_l):
        safe, ok = _local_window(ids_l)
        out = take_rows(shard_v, tbl, safe.reshape(-1)) \
            .reshape(safe.shape + (D,))
        out = out * ok[..., None].astype(out.dtype)
        return jax.lax.psum(out, axis)

    def local_bwd(ids_l, g_l):
        safe, ok = _local_window(ids_l)
        g = (g_l * ok[..., None].astype(g_l.dtype)).reshape(-1, D)
        contrib = rows_to_dense(safe.reshape(-1), g, shard_v)
        if b_spec is not None:
            contrib = jax.lax.psum(contrib, batch_axis)
        return contrib.astype(g_l.dtype)

    fwd_sm = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(axis, None), P(b_spec, None)),
        out_specs=P(b_spec, None, None), check_rep=False)
    bwd_sm = shard_map(
        local_bwd, mesh=mesh,
        in_specs=(P(b_spec, None), P(b_spec, None, None)),
        out_specs=P(axis, None), check_rep=False)

    @jax.custom_vjp
    def lookup(tbl, ids):
        return fwd_sm(tbl, ids)

    def lookup_fwd(tbl, ids):
        return fwd_sm(tbl, ids), ids

    def lookup_bwd(ids, g):
        return bwd_sm(ids, g), None

    lookup.defvjp(lookup_fwd, lookup_bwd)
    return lookup(table, ids)
