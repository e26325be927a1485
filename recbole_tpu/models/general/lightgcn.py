"""LightGCN: linear graph-convolution collaborative filtering.

Parity target: reference LightGCN (recbole/model/general_recommender/lightgcn.py)
— K rounds of propagation over the symmetric-normalized user-item bipartite
adjacency, layer-averaged embeddings, BPR + L2 reg on the EGO embeddings of
the batch.

TPU re-design: the normalized adjacency is precomputed once on host as COO
edges (src, dst, w); propagation is gather -> scale -> segment_sum, which XLA
lowers to efficient dynamic-gather/scatter over HBM. No sparse-tensor types,
no per-step host work.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_uniform
from ..losses import bpr_loss, emb_loss
from ...utils.enums import InputType
from .. import register_model


def build_norm_adj(inter_matrix, n_users, n_items):
    """Symmetric-normalized bipartite adjacency as COO arrays.

    Nodes 0..n_users-1 are users; n_users..n_users+n_items-1 are items.
    Each interaction contributes both directions with weight 1/sqrt(du*di).
    """
    coo = inter_matrix.tocoo()
    u, i = coo.row.astype(np.int32), coo.col.astype(np.int32)
    du = np.bincount(u, minlength=n_users).astype(np.float32)
    di = np.bincount(i, minlength=n_items).astype(np.float32)
    w = 1.0 / np.sqrt(np.maximum(du[u], 1.0) * np.maximum(di[i], 1.0))
    src = np.concatenate([u, i + n_users])
    dst = np.concatenate([i + n_users, u])
    weight = np.concatenate([w, w]).astype(np.float32)
    return src, dst, weight


@register_model("LightGCN")
class LightGCN(GeneralRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "n_layers": 2, "reg_weight": 1e-5}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.n_layers = config["n_layers"]
        self.reg_weight = config["reg_weight"]
        from ...ops.graph import BipartiteProp
        inter = dataset.inter_matrix("csr")
        self.prop = BipartiteProp(inter, self.n_users, self.n_items)
        self.scan_epochs_ok = not self.prop.heavy
        self.n_nodes = self.n_users + self.n_items
        # batch-restricted training step (ops/bitgraph.py): the propagation
        # is linear, so a step needs only TWO full adjacency applications
        # (not 2*n_layers) plus packed-bit restricted ops at the batch rows.
        # The packed images are DENSE in the node grid (~2*n_users*n_items/8
        # bytes) so auto-enable only off the small-graph dense path AND under
        # the bitgraph byte budget; config `use_restricted_step` overrides
        # (tests force it on tiny graphs).
        from ...ops.bitgraph import BITGRAPH_BUDGET_BYTES, bitgraph_bytes
        use_res = config.get("use_restricted_step")
        self.use_restricted = (
            (not self.prop.dense)
            and bitgraph_bytes(self.n_users, self.n_items) <= BITGRAPH_BUDGET_BYTES
        ) if use_res is None else bool(use_res)
        if self.use_restricted:
            from ...ops.bitgraph import BitRestrictedGraph, LinearPropBatch
            self.bitgraph = BitRestrictedGraph(inter, self.n_users,
                                               self.n_items)
            self.lpb = LinearPropBatch(self.prop, self.n_users, self.n_items,
                                       self.n_layers)

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        const = self.prop.init_consts()
        if self.use_restricted:
            const = {**const, **self.bitgraph.init_consts()}
        return {
            "user_embedding": xavier_uniform(ku, (self.n_users, self.embedding_size)),
            "item_embedding": xavier_uniform(ki, (self.n_items, self.embedding_size)),
            "_const": const,
        }

    def propagate(self, params):
        ego = jnp.concatenate([params["user_embedding"],
                               params["item_embedding"]], axis=0)
        acc = ego
        x = ego
        for _ in range(self.n_layers):
            x = self.prop(params["_const"], x)
            acc = acc + x
        final = acc / (self.n_layers + 1)
        return final[:self.n_users], final[self.n_users:]

    def calculate_loss(self, params, batch, rng=None):
        u = batch[self.USER_ID]
        pos = batch[self.ITEM_ID]
        neg = batch[self.NEG_ITEM_ID]
        if self.use_restricted:
            rows_i = jnp.concatenate([pos, neg])
            e_u, e_i = self.lpb(params["_const"], params["user_embedding"],
                                params["item_embedding"], u, rows_i)
            pos_e_f, neg_e_f = e_i[:pos.shape[0]], e_i[pos.shape[0]:]
            pos_score = jnp.sum(e_u * pos_e_f, axis=-1)
            neg_score = jnp.sum(e_u * neg_e_f, axis=-1)
        else:
            ue, ie = self.propagate(params)
            pos_score = jnp.sum(ue[u] * ie[pos], axis=-1)
            neg_score = jnp.sum(ue[u] * ie[neg], axis=-1)
        mf_loss = bpr_loss(pos_score, neg_score, batch.get("_weight"))
        # EmbLoss over ego (pre-propagation) batch embeddings (parity:
        # reference lightgcn.py:146-155); padded scan rows masked via _weight
        from ...ops.bitgraph import take_rows
        w = batch.get("_weight")
        u_e = take_rows(self.n_users, params["user_embedding"], u)
        pos_e = take_rows(self.n_items, params["item_embedding"], pos)
        neg_e = take_rows(self.n_items, params["item_embedding"], neg)
        if w is not None:
            u_e = u_e * w[:, None]
            pos_e = pos_e * w[:, None]
            neg_e = neg_e * w[:, None]
        reg = emb_loss(u_e, pos_e, neg_e)
        return mf_loss + self.reg_weight * reg

    def predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.sum(ue[batch[self.USER_ID]] * ie[batch[self.ITEM_ID]], axis=-1)

    def full_sort_predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.dot(ue[batch[self.USER_ID]], ie.T,
                       preferred_element_type=jnp.float32)
