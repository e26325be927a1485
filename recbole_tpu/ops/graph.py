"""Bipartite graph propagation with dense-MXU / sparse-scatter dispatch.

The reference's GNN models (LightGCN/NGCF/GCMC/...) do sparse-matrix times
dense-embedding products per training step. On TPU, edge-list
gather -> scale -> segment_sum lowers to scatter-adds that serialize on HBM
and measure ~3x SLOWER than the reference's cuSPARSE path at ml-1m scale
(23.7 vs 7.8 s/epoch for LightGCN). But research-scale graphs are small
enough that the DENSE normalized interaction matrix R (n_users x n_items)
fits HBM comfortably, and the bipartite propagation

    users' = R @ items ;  items' = R^T @ users

is two MXU matmuls — ~1% non-zeros is irrelevant when the systolic array is
this much faster than scatter. Dispatch: dense when n_users*n_items fits the
budget, else the segment-sum edge path (Criteo/Yelp-scale catalogs).
"""

import numpy as np
import jax
import jax.numpy as jnp

# dense R budget: 256M f32 entries = 1 GiB HBM
DENSE_ENTRY_BUDGET = 256_000_000

# --- hybrid (hub-dense + ELL-tail) path constants --------------------------
# Measured on TPU v5e. Round-3 re-measurement with CHAINED in-jit loops
# (2026-08-20, /tmp probes: dispatch round-trip is 27ms and a roll-only loop
# floors at 1.3ms/iter — both previously contaminated single-shot numbers):
#   - XLA row gather: 1.54-1.9 ns/row for 64-wide rows (~150GB/s effective),
#     identical for sorted/random indices and f32/bf16
#   - ELL gather+einsum: ~2.7-4.7 ns/slot depending on bucket width
#   - dense bf16 (M,C)x(C,64) matmul: HBM-BANDWIDTH bound, streams the big
#     operand at ~660-790 GB/s (MXU true peak 167 TFLOPS at 8192^3;
#     N=64 output width caps the MXU path at ~half peak, so bits/int8
#     packing does NOT beat the bf16 stream here)
#   - big cumsum: ~40ms for (4M,64) — prefix-sum reduction formulations lose
# Break-even: a hub column costs 2 passes x n_users x 2B / 700GB/s
# = 5.7e-12*n_users s per apply; an edge moved into the hub saves two ELL
# slots ~6e-9 s. Items above degree n_users/1050 join the dense hub; the
# tail stays ELL. (User-side hubs wash out at Yelp shape.) Unsorted scatters
# measured ~24ms FIXED + 28ns/row on this chip, so the hybrid is assembled
# scatter-free: static index-map gathers place hub rows, and the
# symmetric-normalized adjacency makes the backward the SAME operator
# (A^T = A), so the custom VJP re-runs the forward.
HUB_BREAK_EVEN_DIV = 1050.0
HUB_BUDGET_BYTES = 4 << 30
HUB_MIN_DEG = 16.0

# sparse-path SpMM edge chunk: bounds the materialized message buffer to
# chunk*D floats (a 5.8M-edge graph at D=64 would otherwise materialize
# 1.5GB of messages per layer per direction — measured OOM-crashing the
# TPU worker at Yelp scale inside the scanned training epoch)
EDGE_CHUNK = 1 << 20


class BipartiteProp:
    """Symmetric-normalized user-item propagation operator.

    The propagation matrix is NOT captured as a jit closure constant: multi-MB
    XLA literals send compilation through a pathologically slow path
    (measured 131s vs 0.8s for LightGCN's grad at ml-100k size). Instead the
    model stores ``init_consts()`` under ``params["_const"]`` (the trainer
    masks that subtree out of the optimizer) and passes it back to
    ``__call__`` — the array then enters the computation as a traced
    argument.
    """

    def __init__(self, inter_matrix, n_users, n_items,
                 dense_budget=DENSE_ENTRY_BUDGET, norm="sym", hybrid=True,
                 hub_budget=HUB_BUDGET_BYTES):
        coo = inter_matrix.tocoo()
        u = coo.row.astype(np.int32)
        i = coo.col.astype(np.int32)
        du = np.bincount(u, minlength=n_users).astype(np.float32)
        di = np.bincount(i, minlength=n_items).astype(np.float32)
        if norm == "sym":
            # D^-0.5 A D^-0.5: both directions share one weight
            wu = wi = 1.0 / np.sqrt(np.maximum(du[u], 1.0)
                                    * np.maximum(di[i], 1.0))
        elif norm == "rw":
            # D^-1 A (random walk / row normalization, as in the reference's
            # SpectralCF laplacian, spectralcf.py:86-110): the user->item
            # direction divides by the USER degree, item->user by ITEM degree
            wu = 1.0 / np.maximum(du[u], 1.0)
            wi = 1.0 / np.maximum(di[i], 1.0)
        else:
            raise ValueError(f"unknown norm {norm!r}")
        self.n_users, self.n_items = n_users, n_items
        self.n_nodes = n_users + n_items
        self.dense = n_users * n_items <= dense_budget
        # multi-chunk sparse propagation inside a whole-epoch lax.scan
        # compiles/executes pathologically (scan-of-scan over millions of
        # edges per step, and the 2-layer fwd+bwd chain OOM-crashed the TPU
        # worker at Yelp scale before chunking); models consuming a heavy
        # operator advertise scan_epochs_ok=False and stream per-batch.
        # The HYBRID path has no inner scan and fixed-shape transients, so
        # it stays scan-safe — important on remote/tunneled accelerators
        # where per-batch streaming pays ~27ms dispatch latency per step
        self.hybrid = (not self.dense) and norm == "sym" and hybrid
        self.heavy = ((not self.dense) and (not self.hybrid)
                      and len(u) * 2 > EDGE_CHUNK)
        if self.hybrid:
            self._build_hybrid(u, i, wu, hub_budget)
            return
        if self.dense:
            Ru = np.zeros((n_users, n_items), np.float32)
            np.add.at(Ru, (u, i), wu)
            if norm == "sym":
                self._consts = {"R": Ru}
            else:
                Ri = np.zeros((n_users, n_items), np.float32)
                np.add.at(Ri, (u, i), wi)
                self._consts = {"R": Ru, "Rt": Ri}
        else:
            src = np.concatenate([u, i + n_users])
            dst = np.concatenate([i + n_users, u])
            # weight indexed by DESTINATION side: u->i edges land on
            # items (divide by item degree for rw), i->u on users
            w = np.concatenate([wi, wu]).astype(np.float32)
            # pad the edge list to a multiple of the SpMM chunk so the
            # chunked scan has static shapes; padding edges carry w=0 onto
            # node 0 (the [PAD] row nothing reads)
            self.edge_chunk = min(EDGE_CHUNK, 1 << int(np.ceil(np.log2(
                max(len(src), 1)))))
            pad = (-len(src)) % self.edge_chunk
            if pad:
                src = np.concatenate([src, np.zeros(pad, np.int32)])
                dst = np.concatenate([dst, np.zeros(pad, np.int32)])
                w = np.concatenate([w, np.zeros(pad, np.float32)])
            # TPU scatter is ~5x slower on unsorted indices (108.8 vs
            # 85.9 ms measured at Yelp scale... sorted helps 21%); store the
            # edge list TWICE, sorted by dst (forward segment-sum) and by
            # src (the custom-vjp backward becomes a sorted segment-sum too,
            # instead of autodiff's unsorted scatter-add through the gather)
            od = np.argsort(dst, kind="stable")
            os_ = np.argsort(src, kind="stable")
            self._consts = {
                "edge_src": src[od], "edge_dst": dst[od], "edge_w": w[od],
                "bwd_src": src[os_], "bwd_dst": dst[os_], "bwd_w": w[os_],
            }

    def _build_hybrid(self, u, i, w, hub_budget):
        """Hub-dense + ELL-tail decomposition of the symmetric-normalized
        adjacency (see module constants for the measured break-even math).

        Items with degree above n_users/HUB_BREAK_EVEN_DIV form a dense
        (n_users, H) bf16 block R_hub (bandwidth-bound MXU matmuls, both
        directions); the remaining tail edges run scatter-free ELL over the
        full node space. Assembly uses static index-map GATHERS only:
        ``hub_ids`` compacts item rows into hub order, ``hub_pos`` expands
        hub outputs back (sentinel H -> a zero row). The operator is
        symmetric, so the custom VJP applies the forward to the cotangent."""
        from .edge_prop import build_ell_consts
        n_users, n_items = self.n_users, self.n_items
        di = np.bincount(i, minlength=n_items)
        thr = max(n_users / HUB_BREAK_EVEN_DIV, HUB_MIN_DEG)
        hub_ids = np.nonzero(di > thr)[0]
        h_max = max(int(hub_budget // max(2 * n_users, 1)), 0)
        if len(hub_ids) > h_max:
            order = np.argsort(-di[hub_ids], kind="stable")
            hub_ids = np.sort(hub_ids[order[:h_max]])
        H = len(hub_ids)
        Hp = max(-(-H // 128) * 128, 128)
        hub_pos = np.full(n_items, Hp, np.int64)  # sentinel -> zero row
        hub_pos[hub_ids] = np.arange(H)
        is_hub_edge = hub_pos[i] < H
        hu, hi, hw = u[is_hub_edge], i[is_hub_edge], w[is_hub_edge]
        R = np.zeros((n_users, Hp), np.float32)
        np.add.at(R, (hu, hub_pos[hi]), hw)
        tu, ti, tw = (u[~is_hub_edge], i[~is_hub_edge] + n_users,
                      w[~is_hub_edge])
        heads = np.concatenate([tu, ti])
        tails = np.concatenate([ti, tu])
        att = np.concatenate([tw, tw]).astype(np.float32)
        ell_consts, self._ell_shapes = build_ell_consts(
            heads, tails, self.n_nodes, prefix="gh")
        hub_ids_pad = np.zeros(Hp, np.int64)  # padded cols read item 0,
        hub_ids_pad[:H] = hub_ids             # R columns there are zero
        self._consts = {
            "hub_R": R.astype(jnp.bfloat16),  # ml_dtypes numpy bf16
            "hub_ids": hub_ids_pad.astype(np.int32),
            "hub_pos": hub_pos.astype(np.int32),
            "gh_att": att,
            **dict(ell_consts),
        }
        self.hub_size = H

    def init_consts(self):
        """FRESH device arrays for params["_const"]; key them by a
        model-chosen name to allow several operators per model. Host copies
        are kept so repeated calls survive jit donation of earlier results
        (checkpoint-load rebuilds consts after training deleted them)."""
        return {k: jnp.asarray(v) for k, v in self._consts.items()}

    def __call__(self, consts, x):
        """consts: the dict from init_consts (read back from params);
        x: (n_users + n_items, D) -> A_hat @ x."""
        consts = jax.lax.stop_gradient(consts)
        if self.hybrid:
            c = consts
            return _hybrid_sym_prop(
                self.n_users, self.n_items, self._ell_shapes,
                c["hub_R"], c["hub_ids"], c["hub_pos"], c["gh_att"],
                c["ghf_eidx"], c["ghf_nbr"], c["ghf_inv"],
                c["ghb_eidx"], c["ghb_nbr"], c["ghb_inv"], x)
        if self.dense:
            R = consts["R"]
            xu, xi = x[:self.n_users], x[self.n_users:]
            nu = jnp.dot(R, xi, preferred_element_type=jnp.float32)
            # rw norm stores a second item-side matrix (columns scaled by
            # item degree); sym reuses R
            ni = jnp.dot(consts.get("Rt", R).T, xu,
                         preferred_element_type=jnp.float32)
            return jnp.concatenate([nu, ni], axis=0)
        return _sorted_spmm(self.n_nodes, self.edge_chunk,
                            consts["edge_src"], consts["edge_dst"],
                            consts["edge_w"], consts["bwd_src"],
                            consts["bwd_dst"], consts["bwd_w"], x)


def _chunked_sorted_segsum(n_nodes, chunk, src, dst, w, x):
    """gather -> scale -> sorted segment-sum, with the edge stream chunked
    through a checkpointed scan so peak memory stays chunk*D + the
    (n_nodes, D) accumulator regardless of edge count."""
    n_chunks = src.shape[0] // chunk
    if n_chunks <= 1:
        msgs = x[src] * w[:, None]
        return jax.ops.segment_sum(msgs, dst, num_segments=n_nodes,
                                   indices_are_sorted=True)

    @jax.checkpoint
    def body(acc, sl):
        s, d, cw = sl
        msgs = x[s] * cw[:, None]
        return acc + jax.ops.segment_sum(
            msgs, d, num_segments=n_nodes, indices_are_sorted=True), None

    acc0 = jnp.zeros((n_nodes, x.shape[1]), x.dtype)
    acc, _ = jax.lax.scan(
        body, acc0,
        (src.reshape(n_chunks, chunk), dst.reshape(n_chunks, chunk),
         w.reshape(n_chunks, chunk)))
    return acc


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sorted_spmm(n_nodes, chunk, fsrc, fdst, fw, bsrc, bdst, bw, x):
    """A @ x over a static edge list stored twice: (fsrc, fdst, fw) sorted
    by destination for the forward, (bsrc, bdst, bw) the SAME edges sorted
    by source so the backward (A^T g) is ALSO a sorted segment-sum —
    autodiff through the forward gather would instead emit an unsorted
    scatter-add, which TPU serializes ~5x slower (108.8 vs 85.9 ms
    measured for 5.8M edges at Yelp scale; sorting buys ~21% on top)."""
    return _chunked_sorted_segsum(n_nodes, chunk, fsrc, fdst, fw, x)


def _sorted_spmm_fwd(n_nodes, chunk, fsrc, fdst, fw, bsrc, bdst, bw, x):
    out = _chunked_sorted_segsum(n_nodes, chunk, fsrc, fdst, fw, x)
    return out, (bsrc, bdst, bw)


def _sorted_spmm_bwd(n_nodes, chunk, res, g):
    bsrc, bdst, bw = res
    # grad_x = A^T g: edge roles swap (messages flow dst -> src), grouped
    # by source — which is exactly what the src-sorted copy provides
    gx = _chunked_sorted_segsum(n_nodes, chunk, bdst, bsrc, bw, g)
    return (None, None, None, None, None, None, gx)


_sorted_spmm.defvjp(_sorted_spmm_fwd, _sorted_spmm_bwd)


def _hybrid_apply(n_users, n_items, shapes, R, hub_ids, hub_pos, att,
                  f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv, x):
    from .edge_prop import ell_propagate
    xu, xi = x[:n_users], x[n_users:]
    # hub block: two bandwidth-bound bf16 MXU matmuls (fp32 accumulate)
    xi_hub = xi.at[hub_ids].get(mode="promise_in_bounds").astype(R.dtype)
    nu = jnp.dot(R, xi_hub, preferred_element_type=jnp.float32)
    ni_hub = jnp.dot(R.T, xu.astype(R.dtype),
                     preferred_element_type=jnp.float32)
    # tail edges: scatter-free ELL over the full node space
    tail = ell_propagate(shapes, x, att, f_eidx, f_nbr, f_inv,
                         b_eidx, b_nbr, b_inv)
    # assemble without scatters: expand hub rows via the static hub_pos map
    ni_ext = jnp.concatenate(
        [ni_hub, jnp.zeros((1, ni_hub.shape[1]), ni_hub.dtype)], axis=0)
    out_u = tail[:n_users] + nu
    out_i = tail[n_users:] + ni_ext.at[hub_pos].get(
        mode="promise_in_bounds")
    return jnp.concatenate([out_u, out_i], axis=0)


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _hybrid_sym_prop(n_users, n_items, shapes, R, hub_ids, hub_pos, att,
                     f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv, x):
    """A_hat @ x via the hub-dense + ELL-tail hybrid. A_hat is the
    SYMMETRIC-normalized adjacency (A^T = A), so the backward pass applies
    the identical operator to the cotangent — no transposed index structures
    and no scatters anywhere in fwd or bwd."""
    return _hybrid_apply(n_users, n_items, shapes, R, hub_ids, hub_pos, att,
                         f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv, x)


def _hybrid_fwd(n_users, n_items, shapes, R, hub_ids, hub_pos, att,
                f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv, x):
    out = _hybrid_apply(n_users, n_items, shapes, R, hub_ids, hub_pos, att,
                        f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv, x)
    return out, (R, hub_ids, hub_pos, att, f_eidx, f_nbr, f_inv,
                 b_eidx, b_nbr, b_inv)


def _hybrid_bwd(n_users, n_items, shapes, res, g):
    (R, hub_ids, hub_pos, att, f_eidx, f_nbr, f_inv,
     b_eidx, b_nbr, b_inv) = res
    gx = _hybrid_apply(n_users, n_items, shapes, R, hub_ids, hub_pos, att,
                       f_eidx, f_nbr, f_inv, b_eidx, b_nbr, b_inv, g)
    return (None, None, None, None, None, None, None, None, None, None, gx)


_hybrid_sym_prop.defvjp(_hybrid_fwd, _hybrid_bwd)
