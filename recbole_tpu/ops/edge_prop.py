"""Scatter-free sparse graph propagation for sorted edge lists.

out[n] = sum over edges e with head[e] == n of att[e] * x[tail[e]]

The forward is a gather + sorted segment_sum (fast on TPU: ~3ms for a
2.8M-edge, 64-dim propagation). The AUTODIFF backward of the gather,
however, is a scatter-add of (E, D) rows into (N, D) — measured ~47ms of a
52ms fwd+bwd at CKG scale, 15x the bandwidth bound, because TPU scatters
serialize. This op's custom VJP removes every scatter:

    d_msgs = d_out[heads] * att                       (gather)
    d_x    = segment-sum of d_msgs by TAIL            (no scatter: permute
             into tail-sorted order — a static permutation — then an
             exclusive cumsum and two boundary gathers per node)
    d_att  = sum_d d_out[heads] * x[tails]            (gather + reduce)

The cumsum difference introduces ~1e-5 relative error in d_x (prefix sums
cancel); gradient noise well under SGD noise, and only in the backward —
the forward stays exact.

Callers precompute (numpy, at model build): edges sorted by head, plus
``tail_perm`` (argsort of tails), ``tstarts``/``tends`` (per-node boundary
indices into the tail-sorted order). All index arrays ride through
params["_const"] as traced args — multi-MB jit literals compile
pathologically slowly on remote-compile backends.
"""

import numpy as np
import jax
import jax.numpy as jnp


def build_sorted_edge_consts(heads, tails, n_nodes):
    """numpy preprocessing: head-sort the edge list and derive the
    tail-order permutation + per-node tail boundaries. Returns a dict to
    place under params["_const"] (values int32)."""
    heads = np.asarray(heads)
    tails = np.asarray(tails)
    order = np.argsort(heads, kind="stable")
    heads, tails = heads[order], tails[order]
    tail_perm = np.argsort(tails, kind="stable").astype(np.int32)
    sorted_tails = tails[tail_perm]
    nodes = np.arange(n_nodes)
    tstarts = np.searchsorted(sorted_tails, nodes).astype(np.int32)
    tends = np.searchsorted(sorted_tails, nodes, side="right").astype(np.int32)
    hstarts = np.searchsorted(heads, nodes).astype(np.int32)
    hends = np.searchsorted(heads, nodes, side="right").astype(np.int32)
    return order, {
        "ep_heads": heads.astype(np.int32),
        "ep_tails": tails.astype(np.int32),
        "ep_tail_perm": tail_perm,
        "ep_tstarts": tstarts,
        "ep_tends": tends,
        "ep_hstarts": hstarts,
        "ep_hends": hends,
    }


def _boundary_segment_sum(vals, starts, ends):
    """Segment sums of consecutive runs via exclusive cumsum + 2 gathers."""
    cum = jnp.cumsum(vals, axis=0)
    zero = jnp.zeros((1,) + vals.shape[1:], vals.dtype)
    cume = jnp.concatenate([zero, cum], axis=0)
    return cume[ends] - cume[starts]


def _take(arr, idx, sorted_=False):
    return arr.at[idx].get(indices_are_sorted=sorted_,
                           mode="promise_in_bounds")


@jax.custom_vjp
def sorted_edge_propagate(x, att, heads, tails, tail_perm, tstarts, tends,
                          hstarts, hends):
    """x: (N, D); att: (E,) edge weights; index arrays from
    build_sorted_edge_consts (heads sorted ascending). Returns (N, D).

    Forward: sorted segment_sum (exact). Backward: scatter-free (gathers +
    boundary cumsum). A/B at CKG scale (2.8M edges): autodiff backward
    29.8 s/ep, this VJP 24.2 s/ep; a cumsum FORWARD as well measured 26.2,
    so the forward stays on segment_sum."""
    msgs = _take(x, tails) * att[:, None]
    return jax.ops.segment_sum(msgs, heads, num_segments=x.shape[0],
                               indices_are_sorted=True)


def _fwd(x, att, heads, tails, tail_perm, tstarts, tends, hstarts, hends):
    out = sorted_edge_propagate(x, att, heads, tails, tail_perm, tstarts,
                                tends, hstarts, hends)
    return out, (x, att, heads, tails, tail_perm, tstarts, tends)


def _bwd(res, d_out):
    x, att, heads, tails, tail_perm, tstarts, tends = res
    d_head = _take(d_out, heads, sorted_=True)          # (E, D) gather
    d_msgs = d_head * att[:, None]
    d_x = _boundary_segment_sum(_take(d_msgs, tail_perm), tstarts, tends)
    d_att = jnp.sum(d_head * _take(x, tails), axis=-1)  # (E,)
    return d_x, d_att, None, None, None, None, None, None, None


sorted_edge_propagate.defvjp(_fwd, _bwd)
