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

from functools import partial

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


# -- ELL (degree-bucketed padded neighbor lists) propagation -----------------
#
# The sorted-segment formulation above still pays for a segment_sum scatter in
# the forward (21 ms of a 61 ms KGAT step at 2M-edge CKG scale — XLA lowers it
# as a serializing scatter even with indices_are_sorted) and a cumsum-shaped
# backward (~10 ms of pad/slice). When the edge weights do NOT need gradients
# (KGAT stop-gradients its attention), the whole propagation collapses to two
# dense gather+reduce passes over padded neighbor lists:
#
#   forward : out[n]  = sum_k att[n,k] * x[nbr[n,k]]      (head-grouped ELL)
#   backward: d_x[m]  = sum_k att'[m,k] * d_out[nbr'[m,k]] (tail-grouped ELL)
#
# No scatter, no cumsum, no d_att work. Nodes are bucketed by ceil(log2(deg))
# so each bucket is a static (n_b, K_b) array with <2x padding even on
# power-law graphs (hubs land in their own buckets). Padded slots point at a
# sentinel edge E whose attention is 0. Bucket rows are re-ordered back to
# node order with an inverse-permutation GATHER (never a scatter).
#
# Measured at KGAT ml-1m CKG scale (85K nodes, 2M edges, D=64): 61 -> 11 ms
# per train step vs the sorted-segment custom VJP.


def _ell_side(group, other, E, n_nodes, prefix):
    """One grouping direction: bucket nodes by log2(degree) and build padded
    (n_b, K_b) tables of edge ids (for weight lookup) and neighbor node ids
    (pre-resolved ``other`` endpoints). Returns (consts, static shapes,
    total padded rows)."""
    deg = np.bincount(group, minlength=n_nodes)
    order = np.argsort(group, kind="stable")
    starts = np.searchsorted(group[order], np.arange(n_nodes))
    nz = np.nonzero(deg)[0]
    # bucket widths on a ~1.25x geometric ladder instead of pure log2:
    # log2 classes averaged ~75% slot fill (measured 12.9M slots for 4.7M
    # tail edges at Yelp shape — ~28% of ELL gather time was padding); the
    # finer ladder fills ~92% for a handful of extra gather+einsum pairs
    ladder = [1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80,
              96, 128]
    while ladder[-1] < int(deg.max(initial=1)):
        ladder.append(-(-ladder[-1] * 5 // 4))
    ladder_arr = np.asarray(ladder)
    cls = np.zeros(n_nodes, np.int64)
    cls[nz] = np.searchsorted(ladder_arr, deg[nz])
    eidx_parts, nbr_parts, shapes = [], [], []
    pos = np.empty(n_nodes, np.int64)
    row = 0
    for k in sorted(set(cls[nz].tolist()), reverse=True):
        nodes = nz[cls[nz] == k]
        Kb = int(deg[nodes].max())
        nb = len(nodes)
        nbp = -(-nb // 8) * 8  # sublane-pad rows
        col = np.arange(Kb)
        mask = col[None, :] < deg[nodes, None]
        mat = np.full((nbp, Kb), E, np.int64)
        src = np.minimum(starts[nodes, None] + col[None, :], E - 1)
        mat[:nb][mask] = order[src][mask]
        pos[nodes] = row + np.arange(nb)
        row += nbp
        eidx_parts.append(mat.ravel())
        nbr = np.zeros((nbp, Kb), np.int64)
        nbr[:nb][mask] = other[order[src]][mask]
        nbr_parts.append(nbr.ravel())
        shapes.append((nbp, Kb))
    pos[deg == 0] = row  # sentinel zero row appended after all buckets
    consts = {
        prefix + "_eidx": np.concatenate(eidx_parts).astype(np.int32)
        if eidx_parts else np.zeros(0, np.int32),
        prefix + "_nbr": np.concatenate(nbr_parts).astype(np.int32)
        if nbr_parts else np.zeros(0, np.int32),
        prefix + "_inv": pos.astype(np.int32),
    }
    return consts, tuple(shapes)


def build_ell_consts(heads, tails, n_head_nodes, n_tail_nodes=None,
                     prefix="ell"):
    """numpy preprocessing for ``ell_propagate``. ``heads``/``tails`` must be
    in the CANONICAL edge order the runtime weight vector uses (for KGAT:
    head-sorted, the params['edge_attention'] convention). Supports
    rectangular propagation (out over n_head_nodes rows, x over n_tail_nodes
    rows). Returns (consts dict for params['_const'],
    (f_shapes, b_shapes) static tuples)."""
    heads = np.asarray(heads)
    tails = np.asarray(tails)
    if n_tail_nodes is None:
        n_tail_nodes = n_head_nodes
    E = len(heads)
    fc, f_shapes = _ell_side(heads, tails, E, n_head_nodes, prefix + "f")
    bc, b_shapes = _ell_side(tails, heads, E, n_tail_nodes, prefix + "b")
    fc.update(bc)
    return fc, (f_shapes, b_shapes)


def _ell_rows(att_ext, x, eidx_flat, nbr_flat, shapes, inv):
    rows, off = [], 0
    for nb, kb in shapes:
        idx = eidx_flat[off:off + nb * kb].reshape(nb, kb)
        nbr = nbr_flat[off:off + nb * kb].reshape(nb, kb)
        off += nb * kb
        a = _take(att_ext, idx)                      # (nb, kb)
        xg = _take(x, nbr)                           # (nb, kb, D)
        rows.append(jnp.einsum("nk,nkd->nd", a, xg))
    rows.append(jnp.zeros((1, x.shape[1]), x.dtype))
    return _take(jnp.concatenate(rows, 0), inv)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def ell_propagate(shapes, x, att, f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv):
    """out[n] = sum over edges e with head[e]==n of att[e] * x[tail[e]],
    computed scatter-free via degree-bucketed padded neighbor lists.

    ``att`` is treated as a CONSTANT (stop-gradient applied internally — its
    cotangent is zero by the op's semantics, matching KGAT's per-epoch frozen
    attention). ``shapes`` is the static (f_shapes, b_shapes) pair from
    build_ell_consts; array args come from its consts dict."""
    att_ext = jnp.concatenate(
        [jax.lax.stop_gradient(att), jnp.zeros((1,), att.dtype)])
    return _ell_rows(att_ext, x, f_eidx, f_nbr, shapes[0], f_inv)


def _ell_fwd(shapes, x, att, f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv):
    out = ell_propagate(shapes, x, att, f_eidx, f_nbr, f_inv, b_eidx, b_nbr,
                        b_inv)
    return out, (att, b_eidx, b_nbr, b_inv)


def _ell_bwd(shapes, res, d_out):
    att, b_eidx, b_nbr, b_inv = res
    att_ext = jnp.concatenate(
        [jax.lax.stop_gradient(att), jnp.zeros((1,), att.dtype)])
    d_x = _ell_rows(att_ext, d_out, b_eidx, b_nbr, shapes[1], b_inv)
    return d_x, None, None, None, None, None, None, None


ell_propagate.defvjp(_ell_fwd, _ell_bwd)
