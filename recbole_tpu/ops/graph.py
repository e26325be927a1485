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
            self._consts = {
                "edge_src": jnp.asarray(src),
                "edge_dst": jnp.asarray(dst),
                # weight indexed by DESTINATION side: u->i edges land on
                # items (divide by item degree for rw), i->u on users
                "edge_w": jnp.asarray(w),
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
        src, dst, w = (consts["edge_src"], consts["edge_dst"],
                       consts["edge_w"])
        n_nodes = self.n_nodes
        C = self.edge_chunk
        n_chunks = src.shape[0] // C
        if n_chunks <= 1:
            msgs = x[src] * w[:, None]
            return jax.ops.segment_sum(msgs, dst, num_segments=n_nodes)

        # chunked SpMM: scan over edge chunks accumulating into the output;
        # jax.checkpoint makes the backward re-gather instead of storing
        # per-chunk messages, so peak memory is chunk*D + the (n_nodes, D)
        # accumulator regardless of edge count
        @jax.checkpoint
        def body(acc, sl):
            s, d, cw = sl
            msgs = x[s] * cw[:, None]
            return acc + jax.ops.segment_sum(
                msgs, d, num_segments=n_nodes), None

        acc0 = jnp.zeros((n_nodes, x.shape[1]), x.dtype)
        acc, _ = jax.lax.scan(
            body, acc0,
            (src.reshape(n_chunks, C), dst.reshape(n_chunks, C),
             w.reshape(n_chunks, C)))
        return acc
