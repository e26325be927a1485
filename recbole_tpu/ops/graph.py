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
                 dense_budget=DENSE_ENTRY_BUDGET, norm="sym"):
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
        # operator advertise scan_epochs_ok=False and stream per-batch
        self.heavy = (not self.dense) and len(u) * 2 > EDGE_CHUNK
        if self.dense:
            Ru = np.zeros((n_users, n_items), np.float32)
            np.add.at(Ru, (u, i), wu)
            if norm == "sym":
                self._consts = {"R": jnp.asarray(Ru)}
            else:
                Ri = np.zeros((n_users, n_items), np.float32)
                np.add.at(Ri, (u, i), wi)
                self._consts = {"R": jnp.asarray(Ru), "Rt": jnp.asarray(Ri)}
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
                "edge_src": jnp.asarray(src[od]),
                "edge_dst": jnp.asarray(dst[od]),
                "edge_w": jnp.asarray(w[od]),
                "bwd_src": jnp.asarray(src[os_]),
                "bwd_dst": jnp.asarray(dst[os_]),
                "bwd_w": jnp.asarray(w[os_]),
            }

    def init_consts(self):
        """Device arrays for params["_const"]; key them by a model-chosen
        name to allow several operators per model."""
        return self._consts

    def __call__(self, consts, x):
        """consts: the dict from init_consts (read back from params);
        x: (n_users + n_items, D) -> A_hat @ x."""
        consts = jax.lax.stop_gradient(consts)
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
