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
from ..losses import bpr_loss, emb_loss, mask_rows
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
        # Attention lives on UNIQUE (head, tail) pairs, not raw edges:
        # torch.sparse.softmax COALESCES the reference's attention matrix,
        # so parallel edges (duplicate interactions, multi-relation pairs)
        # have their TransR scores SUMMED before the per-head softmax and
        # propagate as one entry (kgat.py:253-265 + torch coalesce
        # semantics). edge_to_pair folds relation-sorted edge scores into
        # head-major-sorted unique pairs.
        from ...ops.edge_prop import build_ell_consts
        self.n_nodes = self.n_entities + self.n_users
        pair_key = h.astype(np.int64) * self.n_nodes + t.astype(np.int64)
        uniq_keys, edge_to_pair = np.unique(pair_key, return_inverse=True)
        self.n_pairs = len(uniq_keys)
        h_hs = (uniq_keys // self.n_nodes).astype(np.int32)
        t_hs = (uniq_keys % self.n_nodes).astype(np.int32)
        self.edge_to_pair = self.register_const(
            "edge_to_pair", edge_to_pair.astype(np.int32))
        self.edge_h_hs = self.register_const("edge_h_hs",
                                             h_hs.astype(np.int32))
        # TPU propagation routing. Only the USER and ITEM rows of the
        # propagated output are ever consumed (propagate() returns
        # final[n_entities:] and final[:n_items]; parity kgat.py forward),
        # so for the default single-layer config the whole CKG propagation
        # collapses to two dense MXU matmuls over the bipartite
        # user<->item interaction blocks plus a small item->entity KG
        # fringe. Edge-list gathers are row-rate-bound on TPU (~6ns/row:
        # a 2M-edge epoch spends 9.5s in gathers alone — the reference's
        # ENTIRE epoch time); the dense blocks are (n_users, n_items)
        # matmuls rebuilt once per epoch when the attention updates.
        # Multi-layer configs need intermediate entity rows and fall back
        # to the scatter-free ELL formulation (ops/edge_prop.py).
        is_user_h = h_hs >= self.n_entities
        is_item_h = h_hs < self.n_items
        self._ui_sel = np.nonzero(is_user_h)[0]
        self._iu_sel = np.nonzero(is_item_h & (t_hs >= self.n_entities))[0]
        fringe = np.nonzero(is_item_h & (t_hs < self.n_entities))[0]
        self.dense_path = (len(self.layers) == 1
                           and bool((t_hs[self._ui_sel] < self.n_items).all()))
        if self.dense_path:
            self._ui_rows = h_hs[self._ui_sel] - self.n_entities
            self._ui_cols = t_hs[self._ui_sel]
            self._iu_rows = h_hs[self._iu_sel]
            self._iu_cols = t_hs[self._iu_sel] - self.n_entities
            self.fringe_sel = self.register_const(
                "fringe_sel", fringe.astype(np.int32))
            fri_consts, self._fri_shapes = build_ell_consts(
                h_hs[fringe], t_hs[fringe], self.n_items, self.n_entities,
                prefix="fri")
            self._fri = {k: self.register_const(k, v)
                         for k, v in fri_consts.items()}
            att0 = np.asarray(self._init_attention())
            a_ui = np.zeros((self.n_users, self.n_items), np.float32)
            np.add.at(a_ui, (self._ui_rows, self._ui_cols),
                      att0[self._ui_sel])
            a_iu = np.zeros((self.n_items, self.n_users), np.float32)
            np.add.at(a_iu, (self._iu_rows, self._iu_cols),
                      att0[self._iu_sel])
            self.att_ui_dense = self.register_const("att_ui_dense", a_ui)
            self.att_iu_dense = self.register_const("att_iu_dense", a_iu)
            # scatter coordinates for the per-epoch dense rebuild ride
            # params['_const'] so update_attentive_A can run under jit
            # without multi-MB closure literals
            self.c_ui_sel = self.register_const(
                "ui_sel", self._ui_sel.astype(np.int32))
            self.c_ui_rows = self.register_const(
                "ui_rows", self._ui_rows.astype(np.int32))
            self.c_ui_cols = self.register_const(
                "ui_cols", self._ui_cols.astype(np.int32))
            self.c_iu_sel = self.register_const(
                "iu_sel", self._iu_sel.astype(np.int32))
            self.c_iu_rows = self.register_const(
                "iu_rows", self._iu_rows.astype(np.int32))
            self.c_iu_cols = self.register_const(
                "iu_cols", self._iu_cols.astype(np.int32))
        else:
            ell_consts, self._ell_shapes = build_ell_consts(
                h_hs, t_hs, self.n_nodes)
            self._ell = {k: self.register_const(k, v)
                         for k, v in ell_consts.items()}
        self.n_edges = len(h)

    def init_params(self, rng):
        ks = jax.random.split(rng, 4)
        D, Dk = self.embedding_size, self.kg_embedding_size
        params = {
            "user_embedding": xavier_normal(ks[0], (self.n_users, D)),
            "entity_embedding": xavier_normal(ks[1], (self.n_entities, D)),
            "relation_embedding": xavier_normal(ks[2], (self.n_relations, Dk)),
            # reference stores trans_w as a 2-D (n_rel, D*Dk) Embedding
            # (kgat.py:107) — xavier fans computed on that shape, then reshaped
            "trans_w": xavier_normal(
                ks[3], (self.n_relations, D * Dk)).reshape(
                self.n_relations, D, Dk),
            # start from the plain row-normalized adjacency (reference inits A
            # from norm adj before the first update_attentive_A)
            "edge_attention": self._init_attention(),
            "agg": [],
        }
        dims = [D] + self.layers
        for li in range(len(self.layers)):
            kk = jax.random.fold_in(rng, 100 + li)
            k1, k2 = jax.random.split(kk)
            in1 = 2 * dims[li] if self.aggregator == "graphsage" else dims[li]
            params["agg"].append({
                "w1": xavier_normal(k1, (in1, dims[li + 1])),
                "b1": jnp.zeros(dims[li + 1]),
                "w2": xavier_normal(k2, (dims[li], dims[li + 1])),
                "b2": jnp.zeros(dims[li + 1]),
            })
        return params

    def _init_attention(self):
        """Initial attention (row-normalized adjacency summed over parallel
        edges), one value per unique HEAD-SORTED pair — the storage
        convention for params["edge_attention"] throughout. Deviation from
        the reference's construction-time matrix (kgat.py:120-145): that one
        is built by dgl with per-relation normalization in the TRANSPOSED
        orientation of its own update_attentive_A and only survives until
        the first per-epoch update; we keep the post-update orientation
        from the start."""
        eh = np.asarray(self.edge_h.value)
        deg = np.bincount(eh, minlength=self.n_nodes)
        per_edge = 1.0 / np.maximum(deg, 1)[eh]
        per_pair = np.bincount(np.asarray(self.edge_to_pair.value),
                               weights=per_edge, minlength=self.n_pairs)
        return jnp.asarray(per_pair.astype(np.float32))

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
        parity: kgat.py update_attentive_A). On the dense path this also
        rebuilds the per-epoch dense bipartite attention blocks (runs eager,
        once per epoch)."""
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
        # parallel-edge scores SUM into their unique pair (torch coalesce
        # semantics, see __init__); pairs are already head-major sorted
        scores = jax.ops.segment_sum(
            jnp.concatenate(parts), jnp.asarray(self.edge_to_pair),
            num_segments=self.n_pairs)
        att = jax.lax.stop_gradient(self._edge_softmax(scores))
        out = dict(params)
        out["edge_attention"] = att
        if self.dense_path:
            ui_sel = jnp.asarray(self.c_ui_sel)
            a_ui = jnp.zeros((self.n_users, self.n_items), jnp.float32)
            a_ui = a_ui.at[jnp.asarray(self.c_ui_rows),
                           jnp.asarray(self.c_ui_cols)].add(att[ui_sel])
            iu_sel = jnp.asarray(self.c_iu_sel)
            a_iu = jnp.zeros((self.n_items, self.n_users), jnp.float32)
            a_iu = a_iu.at[jnp.asarray(self.c_iu_rows),
                           jnp.asarray(self.c_iu_cols)].add(att[iu_sel])
            const = dict(out.get("_const", {}))
            const["att_ui_dense"] = a_ui
            const["att_iu_dense"] = a_iu
            out["_const"] = const
        return out

    def _agg(self, x, side, layer):
        if self.aggregator == "gcn":
            return jax.nn.leaky_relu(
                jnp.dot(x + side, layer["w1"],
                        preferred_element_type=jnp.float32) + layer["b1"])
        if self.aggregator == "graphsage":
            return jax.nn.leaky_relu(
                jnp.dot(jnp.concatenate([x, side], -1), layer["w1"],
                        preferred_element_type=jnp.float32) + layer["b1"])
        add = jax.nn.leaky_relu(
            jnp.dot(x + side, layer["w1"],
                    preferred_element_type=jnp.float32) + layer["b1"])
        mul = jax.nn.leaky_relu(
            jnp.dot(x * side, layer["w2"],
                    preferred_element_type=jnp.float32) + layer["b2"])
        return add + mul

    @staticmethod
    def _row_norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    def _propagate_dense(self, params, rng):
        """Single-layer propagation restricted to the consumed rows: two
        dense bipartite matmuls + the item->entity KG fringe (ELL)."""
        from ...ops.edge_prop import ell_propagate
        xe = params["entity_embedding"]
        xu = params["user_embedding"]
        xi = xe[:self.n_items]
        att = jax.lax.stop_gradient(params["edge_attention"])
        a_ui = jax.lax.stop_gradient(jnp.asarray(self.att_ui_dense))
        a_iu = jax.lax.stop_gradient(jnp.asarray(self.att_iu_dense))
        su = jnp.dot(a_ui, xi, preferred_element_type=jnp.float32)
        si = jnp.dot(a_iu, xu, preferred_element_type=jnp.float32)
        fri = {k: jnp.asarray(v) for k, v in self._fri.items()}
        si = si + ell_propagate(
            self._fri_shapes, xe, att[jnp.asarray(self.fringe_sel)],
            fri["frif_eidx"], fri["frif_nbr"], fri["frif_inv"],
            fri["frib_eidx"], fri["frib_nbr"], fri["frib_inv"])
        layer = params["agg"][0]
        x1_u = self._agg(xu, su, layer)
        x1_i = self._agg(xi, si, layer)
        if rng is not None and self.mess_dropout > 0:
            rng, ku, ki = jax.random.split(rng, 3)
            x1_u = dropout_apply(ku, x1_u, self.mess_dropout)
            x1_i = dropout_apply(ki, x1_i, self.mess_dropout)
        users = jnp.concatenate([xu, self._row_norm(x1_u)], -1)
        items = jnp.concatenate([xi, self._row_norm(x1_i)], -1)
        return users, items

    def propagate(self, params, rng=None):
        if self.dense_path:
            return self._propagate_dense(params, rng)
        x = self._all_embeddings(params)
        att = jax.lax.stop_gradient(params["edge_attention"])
        outs = [x]
        from ...ops.edge_prop import ell_propagate
        ell = {k: jnp.asarray(v) for k, v in self._ell.items()}
        for layer in params["agg"]:
            # side = sum over outgoing edges of att * tail embedding
            # (scatter-free ELL gather+reduce — see ops/edge_prop.py)
            side = ell_propagate(
                self._ell_shapes, x, att, ell["ellf_eidx"], ell["ellf_nbr"],
                ell["ellf_inv"], ell["ellb_eidx"], ell["ellb_nbr"],
                ell["ellb_inv"])
            x = self._agg(x, side, layer)
            if rng is not None and self.mess_dropout > 0:
                rng, dk = jax.random.split(rng)
                x = dropout_apply(dk, x, self.mess_dropout)
            x = self._row_norm(x)
            outs.append(x)
        final = jnp.concatenate(outs, -1)
        users = final[self.n_entities:]
        items = final[:self.n_items]
        return users, items

    def calculate_loss(self, params, batch, rng=None):
        ue, ie = self.propagate(params, rng)
        u, pos, neg = (batch[self.USER_ID], batch[self.ITEM_ID],
                       batch[self.NEG_ITEM_ID])
        w = batch.get("_weight")
        loss = bpr_loss(jnp.sum(ue[u] * ie[pos], -1),
                        jnp.sum(ue[u] * ie[neg], -1), w)
        reg = emb_loss(*mask_rows(w, ue[u], ie[pos], ie[neg]))
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
        w2 = batch.get("_weight")
        loss = bpr_loss(neg_score, pos_score, w2)
        reg = emb_loss(*mask_rows(w2, h_e, r_e, pt_e, nt_e))
        return loss + self.reg_weight * reg

    def predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.sum(ue[batch[self.USER_ID]] * ie[batch[self.ITEM_ID]], -1)

    def full_sort_predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.dot(ue[batch[self.USER_ID]], ie.T,
                       preferred_element_type=jnp.float32)
