"""Batch-restricted adjacency applications over a packed-bit interaction
matrix, and the 2-full-apply LightGCN training step they enable.

Reference semantics (recbole/model/general_recommender/lightgcn.py:93-155):
every training step propagates ALL node embeddings L times through the
symmetric-normalized adjacency A_hat and reads out the layer-mean at the
batch rows. On GPU that is 2L sparse matmuls per step (L forward + L back).

TPU re-design: A_hat is LINEAR, so a step's real data needs are
  fwd:  e[S] = (x + A x + ... + A^L x)[S] / (L+1)     -- S = batch rows
  bwd:  d_x  = (g~ + A g~ + ... + A^L g~) / (L+1)     -- g~ sparse (|S| rows)
and the OUTERMOST applications touch only |S| ~ 6K of 200K rows:
  * (A t)[S]  = A[S, :] @ t      -- rows of A at S
  * A g~      = A[:, S] @ g_S    -- columns of A at S
Both are dense matmuls against on-the-fly slices of A. A_hat factorizes as
D_u^-1/2 B D_i^-1/2 with B BINARY, so A's rows/columns materialize from a
PACKED-BIT image of B: gather |S| packed rows (~12KB each at Yelp scale),
unpack bits to bf16 with shift/mask, and hit the MXU. No per-edge gathers,
no scatters. A 2-layer step thus runs TWO full applies (the hub+ELL hybrid
in ops/graph.py) instead of four, plus ~2ms of bit-matmuls:

  fwd: t1 = A x (full);  e[S] = (x[S] + t1[S] + A[S,:] t1) / 3
  bwd: q = A[:,S] g_S;   d_x = (g~ + q + A q (full)) / 3

The step is exact (same float ops reordered), and the custom VJP keeps NO
(N, D) residuals -- linearity means the backward needs only the operator.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# The packed-bit consts are DENSE in the node grid: ~2 * n_users*n_items/8
# bytes total (one image per side), NOT edge-proportional. Yelp (102Kx98K)
# is ~2x1.26GB and fine; a Gowalla/Amazon-class shape (107K x 1.28M) would
# be ~2x17GB and OOM at construction. Auto-enable only under this budget.
BITGRAPH_BUDGET_BYTES = 4 << 30


def bitgraph_bytes(n_users, n_items):
    """Host+device footprint of BitRestrictedGraph's two packed images."""
    ubytes = -(-(-(-n_items // 8)) // 256) * 256
    ibytes = -(-(-(-n_users // 8)) // 256) * 256
    return n_users * ubytes + n_items * ibytes


def _pack_side(major, minor, n_major, n_minor):
    """Packed-bit matrix (n_major, ceil(n_minor/8)*pad) uint8 where bit
    (minor % 8) of byte (major, minor // 8) is set per edge. Byte width is
    padded to a multiple of 256 so the Pallas shift-plane kernels
    (ops/bit_kernels.py) tile evenly and the unpacked K dim stays
    lane-aligned."""
    nbytes = -(-n_minor // 8)
    nbytes = -(-nbytes // 256) * 256
    packed = np.zeros((n_major, nbytes), np.uint8)
    np.bitwise_or.at(packed, (major, minor // 8),
                     (1 << (minor % 8)).astype(np.uint8))
    return packed


def _unpack_bits(packed):
    """(R, nbytes) uint8 -> (R, nbytes*8) bf16 of {0, 1}."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(packed.shape[0], -1).astype(jnp.bfloat16)


class BitRestrictedGraph:
    """Packed-bit images of the binary interaction matrix B, one per major
    axis, plus the D^-1/2 normalization vectors.

    Consts (place under params["_const"]): ``bg_user_bits`` (n_users, ~n_items/8),
    ``bg_item_bits`` (n_items, ~n_users/8), ``bg_unorm``/``bg_inorm`` f32.
    ~2x 1.26GB at Yelp scale (102K x 98K, 2.9M edges).
    """

    def __init__(self, inter_matrix, n_users, n_items):
        coo = inter_matrix.tocoo()
        u = coo.row.astype(np.int64)
        i = coo.col.astype(np.int64)
        self.n_users, self.n_items = n_users, n_items
        du = np.bincount(u, minlength=n_users).astype(np.float32)
        di = np.bincount(i, minlength=n_items).astype(np.float32)
        self._consts = {
            "bg_user_bits": _pack_side(u, i, n_users, n_items),
            "bg_item_bits": _pack_side(i, u, n_items, n_users),
            "bg_unorm": 1.0 / np.sqrt(np.maximum(du, 1.0)),
            "bg_inorm": 1.0 / np.sqrt(np.maximum(di, 1.0)),
        }

    def init_consts(self):
        return {k: jnp.asarray(v) for k, v in self._consts.items()}


def _pad_k(v, k_pad):
    """Zero-pad (N, D) to (k_pad, D) so it matches the unpacked bit width."""
    return jnp.concatenate(
        [v, jnp.zeros((k_pad - v.shape[0], v.shape[1]), v.dtype)], axis=0)


def restricted_rows_apply(bits, rows, row_norm, col_norm, v):
    """(A_hat v)[rows] for one bipartite direction.

    bits: packed (n_rows, nbytes); rows: (R,) int32; row_norm/col_norm:
    D^-1/2 for the row/column sides; v: (n_cols, D) f32. Returns (R, D) f32
    = diag(row_norm)[rows] @ B[rows, :] @ diag(col_norm) @ v, computed as a
    gather of R packed rows -> bf16 unpack -> one MXU matmul."""
    packed = bits.at[rows].get(mode="promise_in_bounds")
    vv = (v * col_norm[:, None]).astype(jnp.bfloat16)
    vv = _pad_k(vv, packed.shape[1] * 8)
    from .bit_kernels import bit_rows_matmul, kernel_ok, perm_planes
    if kernel_ok(packed.shape[0], packed.shape[1]):
        # fused VMEM unpack + MXU matmul: the (R, K) bf16 unpack (~800MB at
        # Yelp scale) never reaches HBM
        out = bit_rows_matmul(packed, perm_planes(vv))
    else:
        unpacked = _unpack_bits(packed)                   # (R, K) bf16
        out = jnp.dot(unpacked, vv, preferred_element_type=jnp.float32)
    return out * row_norm.at[rows].get(mode="promise_in_bounds")[:, None]


def restricted_cols_apply(bits, rows, row_norm, col_norm, g, n_cols):
    """A_hat[:, rows]^(one direction) @ g -- the transposed restricted op.

    Computes out (n_cols, D) f32 = diag(col_norm) @ B[rows, :]^T @
    diag(row_norm)[rows] @ g, with duplicate entries in ``rows`` summing
    naturally through the contraction. Same packed-row gather + unpack; the
    MXU contraction runs over the R dimension."""
    packed = bits.at[rows].get(mode="promise_in_bounds")
    gg = (g * row_norm.at[rows].get(
        mode="promise_in_bounds")[:, None]).astype(jnp.bfloat16)
    # NOTE: the shift-plane cols kernel measured SLOWER than XLA here
    # (2.40 vs 2.03 ms at Yelp shape — the contract-over-R dot transposes
    # in VMEM); keep the XLA path for the transposed op.
    unpacked = _unpack_bits(packed)                       # (R, K) bf16
    out = jax.lax.dot_general(unpacked, gg, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[:n_cols] * col_norm[:, None]


def rows_to_dense(rows, vals, n):
    """Scatter-free materialization of a sparse row bundle: (R,) ids +
    (R, D) vals -> (n, D) with duplicate ids summed. Sort the ids (R is
    batch-sized) and run a sorted segment-sum."""
    order = jnp.argsort(rows)
    return jax.ops.segment_sum(
        vals.at[order].get(mode="promise_in_bounds"),
        rows.at[order].get(mode="promise_in_bounds"),
        num_segments=n, indices_are_sorted=True)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def take_rows(n, x, rows):
    """x[rows] with a sort + sorted-segment-sum backward instead of XLA's
    unsorted scatter-add. ``n`` must equal x.shape[0]; ``rows`` may have any
    shape (the backward flattens it). NOTE the round-4 A/B
    (scripts/bench_ctr_ab.py, PARITY.md): at Criteo shape this backward
    measured SLOWER than the plain scatter (the sorted segment-sum still
    lowers to a scatter; the sort is overhead) — CTR lookups default to the
    field-grouped backward (ops/embed_grad.grouped_take_rows) instead, and
    this VJP remains for the graph ops it was built for."""
    return x.at[rows].get(mode="promise_in_bounds")


def _take_rows_fwd(n, x, rows):
    return take_rows(n, x, rows), (rows, x.shape[1:])


def _take_rows_bwd(n, res, g):
    rows, tail_shape = res
    g = g.reshape((-1,) + tuple(tail_shape))
    return rows_to_dense(rows.reshape(-1), g, n), None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


class LinearPropBatch:
    """Layer-mean linear propagation read out at batch rows, with the
    restricted-application custom VJP (module docstring). Exact-equal to
    full propagation + row gather, at 2(L-1)+... -> for L=2: 2 full applies
    per step instead of 4.

    ``full_prop``: callable (consts, x) -> A_hat x over the stacked
    (n_users + n_items, D) node space (ops/graph.py::BipartiteProp).
    """

    def __init__(self, full_prop, n_users, n_items, n_layers):
        self.full_prop = full_prop
        self.n_users, self.n_items = n_users, n_items
        self.n_nodes = n_users + n_items
        self.n_layers = n_layers
        self._fn = _make_linear_prop_batch(self)

    def __call__(self, consts, xu, xi, rows_u, rows_i):
        """Returns (e_u at rows_u, e_i at rows_i): layer-mean embeddings.
        consts must hold both the full-prop consts and the BitRestrictedGraph
        consts (bg_*)."""
        return self._fn(consts, xu, xi, rows_u, rows_i)


def _restricted_last_layer(ctx, consts, t, rows_u, rows_i):
    """(A_hat t)[rows_u on the user side, rows_i on the item side]."""
    tu, ti = t[:ctx.n_users], t[ctx.n_users:]
    out_u = restricted_rows_apply(
        consts["bg_user_bits"], rows_u, consts["bg_unorm"],
        consts["bg_inorm"], ti)
    out_i = restricted_rows_apply(
        consts["bg_item_bits"], rows_i, consts["bg_inorm"],
        consts["bg_unorm"], tu)
    return out_u, out_i


def _restricted_first_bwd(ctx, consts, g_u, g_i, rows_u, rows_i):
    """q = A_hat g~ where g~ is nonzero only at (rows_u | rows_i): the
    user-side output comes from the item-side cotangent and vice versa."""
    q_u = restricted_cols_apply(
        consts["bg_item_bits"], rows_i, consts["bg_inorm"],
        consts["bg_unorm"], g_i, ctx.n_users)
    q_i = restricted_cols_apply(
        consts["bg_user_bits"], rows_u, consts["bg_unorm"],
        consts["bg_inorm"], g_u, ctx.n_items)
    return jnp.concatenate([q_u, q_i], axis=0)


def _make_linear_prop_batch(ctx):
    L = ctx.n_layers
    inv = 1.0 / (L + 1)

    @partial(jax.custom_vjp, nondiff_argnums=())
    def fn(consts, xu, xi, rows_u, rows_i):
        consts = jax.lax.stop_gradient(consts)
        e_u = take_rows(ctx.n_users, xu, rows_u) * inv
        e_i = take_rows(ctx.n_items, xi, rows_i) * inv
        t = jnp.concatenate([xu, xi], axis=0)
        for _ in range(max(L - 1, 0)):
            t = ctx.full_prop(consts, t)
            e_u = e_u + take_rows(ctx.n_nodes, t, rows_u) * inv
            e_i = e_i + take_rows(
                ctx.n_nodes, t, rows_i + ctx.n_users) * inv
        if L > 0:
            lu, li = _restricted_last_layer(ctx, consts, t, rows_u, rows_i)
            e_u = e_u + lu * inv
            e_i = e_i + li * inv
        return e_u, e_i

    def fwd(consts, xu, xi, rows_u, rows_i):
        out = fn(consts, xu, xi, rows_u, rows_i)
        return out, (consts, rows_u, rows_i)

    def bwd(res, cotangents):
        consts, rows_u, rows_i = res
        g_u, g_i = cotangents
        g_u = g_u * inv
        g_i = g_i * inv
        # d_x = sum_{k=0..L} A^k g~ : innermost application column-restricted
        gt_u = rows_to_dense(rows_u, g_u, ctx.n_users)
        gt_i = rows_to_dense(rows_i, g_i, ctx.n_items)
        d = jnp.concatenate([gt_u, gt_i], axis=0)
        if L > 0:
            s = _restricted_first_bwd(ctx, consts, g_u, g_i, rows_u, rows_i)
            d = d + s
            for _ in range(L - 1):
                s = ctx.full_prop(consts, s)
                d = d + s
        return (None, d[:ctx.n_users], d[ctx.n_users:], None, None)

    fn.defvjp(fwd, bwd)
    return fn
