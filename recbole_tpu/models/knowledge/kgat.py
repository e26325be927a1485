"""KGAT: knowledge graph attention network.

Parity target: reference KGAT (recbole/model/knowledge_aware_recommender/kgat.py)
— GNN over the collaborative KG (entities + users) with per-edge attention
weights recomputed each epoch from TransR scores (update_attentive_A under
no_grad, trainer.py:484-508); bi-interaction aggregator; BPR rec loss over
propagated embeddings; TransR kg loss.

TPU re-design: the ckg lives as COO edge arrays; attention is an edge-weight
vector stored in params['edge_attention'] (updated outside the gradient path);
per-node softmax over incoming edges is a segment-max/segment-sum pair.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal, dropout_apply
from ..losses import bpr_loss, emb_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("KGAT")
class KGAT(KnowledgeRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "kg_embedding_size": 64,
                      "layers": [64], "mess_dropout": 0.1, "reg_weight": 1e-5,
                      "aggregator_type": "bi"}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.kg_embedding_size = config["kg_embedding_size"]
        self.layers = list(config["layers"])
        self.mess_dropout = config["mess_dropout"]
        self.reg_weight = config["reg_weight"]
        self.aggregator = config["aggregator_type"]
        h, r, t = dataset.ckg_arrays()
        # edges SORTED BY RELATION so update_attentive_A can run one static
        # (E_r, D) @ (D, Dk) matmul per relation — the per-edge trans_w
        # gather it replaces is (E, D, Dk): 45GB at ml-1m KG scale
        import numpy as np
        order = np.argsort(r, kind="stable")
        h, r, t = h[order], r[order], t[order]
        counts = np.bincount(r, minlength=self.n_relations)
        ends = np.cumsum(counts)
        self._rel_slices = [(int(ends[i] - counts[i]), int(ends[i]))
                            for i in range(self.n_relations)]
        self.edge_h = self.register_const("edge_h", h)   # node = entity id, users offset later
        self.edge_r = self.register_const("edge_r", r)
        self.edge_t = self.register_const("edge_t", t)
        # second copy sorted by HEAD plus tail-order boundary tables: the
        # per-step propagation runs through ops/edge_prop.py's scatter-free
        # custom VJP (the autodiff scatter-add backward measured 47ms of a
        # 52ms step at CKG scale); edge_perm maps relation-sorted order
        # (the attention update's layout) into head-sorted order
        from ...ops.edge_prop import build_sorted_edge_consts
        hperm, ep = build_sorted_edge_consts(h, t, self.n_entities
                                             + self.n_users)
        self.edge_perm = self.register_const("edge_perm",
                                             hperm.astype(np.int32))
        self.edge_h_hs = self.register_const("edge_h_hs", ep["ep_heads"])
        self.edge_t_hs = self.register_const("edge_t_hs", ep["ep_tails"])
        self.ep_tail_perm = self.register_const("ep_tail_perm",
                                                ep["ep_tail_perm"])
        self.ep_tstarts = self.register_const("ep_tstarts", ep["ep_tstarts"])
        self.ep_tends = self.register_const("ep_tends", ep["ep_tends"])
        self.ep_hstarts = self.register_const("ep_hstarts", ep["ep_hstarts"])
        self.ep_hends = self.register_const("ep_hends", ep["ep_hends"])
        self.n_nodes = self.n_entities + self.n_users
        self.n_edges = len(h)

    def init_params(self, rng):
        ks = jax.random.split(rng, 4)
        D, Dk = self.embedding_size, self.kg_embedding_size
        params = {
            "user_embedding": xavier_normal(ks[0], (self.n_users, D)),
            "entity_embedding": xavier_normal(ks[1], (self.n_entities, D)),
            "relation_embedding": xavier_normal(ks[2], (self.n_relations, Dk)),
            "trans_w": xavier_normal(ks[3], (self.n_relations, D, Dk)),
            # start from the plain row-normalized adjacency (reference inits A
            # from norm adj before the first update_attentive_A)
            "edge_attention": self._init_attention(),
            "agg": [],
        }
        dims = [D] + self.layers
        for li in range(len(self.layers)):
            kk = jax.random.fold_in(rng, 100 + li)
            k1, k2 = jax.random.split(kk)
            params["agg"].append({
                "w1": xavier_normal(k1, (dims[li], dims[li + 1])),
                "b1": jnp.zeros(dims[li + 1]),
                "w2": xavier_normal(k2, (dims[li], dims[li + 1])),
                "b2": jnp.zeros(dims[li + 1]),
            })
        return params

    def _init_attention(self):
        """Initial attention (row-normalized adjacency), HEAD-SORTED order —
        the storage convention for params["edge_attention"] throughout."""
        deg = np.bincount(np.asarray(self.edge_h_hs.value),
                          minlength=self.n_nodes)
        return jnp.asarray(1.0 / np.maximum(deg, 1))[
            jnp.asarray(self.edge_h_hs)]

    def _all_embeddings(self, params):
        return jnp.concatenate([params["entity_embedding"],
                                params["user_embedding"]], 0)

    def _edge_softmax(self, scores_hs):
        """Softmax of HEAD-SORTED edge scores over each head node's outgoing
        edges; sortedness lets XLA lower the segment ops as linear scans."""
        h_hs = jnp.asarray(self.edge_h_hs)
        seg_max = jax.ops.segment_max(scores_hs, h_hs,
                                      num_segments=self.n_nodes,
                                      indices_are_sorted=True)
        e = jnp.exp(scores_hs - seg_max[h_hs])
        seg_sum = jax.ops.segment_sum(e, h_hs, num_segments=self.n_nodes,
                                      indices_are_sorted=True)
        return e / jnp.maximum(seg_sum[h_hs], 1e-12)

    def update_attentive_A(self, params):
        """Recompute per-edge attention from TransR scores (stop-gradient;
        parity: kgat.py update_attentive_A)."""
        x = self._all_embeddings(params)
        h_all = x[jnp.asarray(self.edge_h)]                                 # (E, D)
        t_all = x[jnp.asarray(self.edge_t)]
        parts = []
        for r, (s, e) in enumerate(self._rel_slices):
            if s == e:
                continue
            w = params["trans_w"][r]                                        # (D, Dk)
            h_e = jnp.dot(h_all[s:e], w, preferred_element_type=jnp.float32)
            t_e = jnp.dot(t_all[s:e], w, preferred_element_type=jnp.float32)
            parts.append(jnp.sum(
                t_e * jnp.tanh(h_e + params["relation_embedding"][r]), -1))
        scores = jnp.concatenate(parts)[jnp.asarray(self.edge_perm)]
        att = jax.lax.stop_gradient(self._edge_softmax(scores))
        out = dict(params)
        out["edge_attention"] = att
        return out

    def propagate(self, params, rng=None):
        x = self._all_embeddings(params)
        att = jax.lax.stop_gradient(params["edge_attention"])
        outs = [x]
        from ...ops.edge_prop import sorted_edge_propagate
        for layer in params["agg"]:
            # side = sum over outgoing edges of att * tail embedding
            # (scatter-free custom VJP — see ops/edge_prop.py)
            side = sorted_edge_propagate(
                x, att, jnp.asarray(self.edge_h_hs),
                jnp.asarray(self.edge_t_hs),
                jnp.asarray(self.ep_tail_perm),
                jnp.asarray(self.ep_tstarts), jnp.asarray(self.ep_tends),
                jnp.asarray(self.ep_hstarts), jnp.asarray(self.ep_hends))
            if self.aggregator == "gcn":
                x = jax.nn.leaky_relu(
                    jnp.dot(x + side, layer["w1"],
                            preferred_element_type=jnp.float32) + layer["b1"])
            elif self.aggregator == "graphsage":
                x = jax.nn.leaky_relu(
                    jnp.dot(jnp.concatenate([x, side], -1)[:, :layer["w1"].shape[0]],
                            layer["w1"], preferred_element_type=jnp.float32)
                    + layer["b1"])
            else:  # 'bi'
                add = jax.nn.leaky_relu(
                    jnp.dot(x + side, layer["w1"],
                            preferred_element_type=jnp.float32) + layer["b1"])
                mul = jax.nn.leaky_relu(
                    jnp.dot(x * side, layer["w2"],
                            preferred_element_type=jnp.float32) + layer["b2"])
                x = add + mul
            if rng is not None and self.mess_dropout > 0:
                rng, dk = jax.random.split(rng)
                x = dropout_apply(dk, x, self.mess_dropout)
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                1e-12)
            outs.append(x)
        final = jnp.concatenate(outs, -1)
        users = final[self.n_entities:]
        items = final[:self.n_items]
        return users, items

    def calculate_loss(self, params, batch, rng=None):
        ue, ie = self.propagate(params, rng)
        u, pos, neg = (batch[self.USER_ID], batch[self.ITEM_ID],
                       batch[self.NEG_ITEM_ID])
        loss = bpr_loss(jnp.sum(ue[u] * ie[pos], -1),
                        jnp.sum(ue[u] * ie[neg], -1), batch.get("_weight"))
        reg = emb_loss(ue[u], ie[pos], ie[neg])
        return loss + self.reg_weight * reg

    def calculate_kg_loss(self, params, batch, rng=None):
        h = batch[self.HEAD_ENTITY_ID]
        r = batch[self.RELATION_ID]
        pos_t = batch[self.TAIL_ENTITY_ID]
        neg_t = batch[self.NEG_TAIL_ENTITY_ID]
        w = params["trans_w"][r]
        proj = lambda ids: jnp.einsum(
            "bd,bdk->bk", params["entity_embedding"][ids], w)
        h_e, pt_e, nt_e = proj(h), proj(pos_t), proj(neg_t)
        r_e = params["relation_embedding"][r]
        pos_score = jnp.sum((h_e + r_e - pt_e) ** 2, -1)
        neg_score = jnp.sum((h_e + r_e - nt_e) ** 2, -1)
        loss = bpr_loss(neg_score, pos_score, batch.get("_weight"))
        reg = emb_loss(h_e, r_e, pt_e, nt_e)
        return loss + self.reg_weight * reg

    def predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.sum(ue[batch[self.USER_ID]] * ie[batch[self.ITEM_ID]], -1)

    def full_sort_predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.dot(ue[batch[self.USER_ID]], ie.T,
                       preferred_element_type=jnp.float32)
