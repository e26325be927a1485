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
            self._consts = {
                "edge_src": jnp.asarray(src),
                "edge_dst": jnp.asarray(dst),
                # weight indexed by DESTINATION side: u->i edges land on
                # items (divide by item degree for rw), i->u on users
                "edge_w": jnp.asarray(
                    np.concatenate([wi, wu]).astype(np.float32)),
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
        msgs = x[consts["edge_src"]] * consts["edge_w"][:, None]
        return jax.ops.segment_sum(msgs, consts["edge_dst"],
                                   num_segments=self.n_nodes)
