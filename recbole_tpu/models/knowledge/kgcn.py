"""KGCN: knowledge graph convolutional network.

Parity target: reference KGCN (recbole/model/knowledge_aware_recommender/kgcn.py)
— for each candidate item, aggregate its KG neighborhood for n_iter hops with
user-relation attention. Neighborhoods are FIXED-SIZE samples per entity
(neighbor_sample_size), precomputed once — exactly the static-shape structure
a TPU wants.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal
from ..losses import bce_loss, emb_loss
from ...utils.enums import InputType
from .. import register_model


def build_neighbor_tables(h, r, t, n_entities, sample_size, seed=2020):
    """(n_entities, S) sampled neighbor entity/relation tables. Both edge
    directions are used; entities without neighbors point to themselves."""
    rng = np.random.RandomState(seed)
    adj = [[] for _ in range(n_entities)]
    for hh, rr, tt in zip(h, r, t):
        adj[hh].append((tt, rr))
        adj[tt].append((hh, rr))
    ent = np.zeros((n_entities, sample_size), np.int32)
    rel = np.zeros((n_entities, sample_size), np.int32)
    for e in range(n_entities):
        if not adj[e]:
            ent[e] = e
            continue
        idx = rng.choice(len(adj[e]), sample_size,
                         replace=len(adj[e]) < sample_size)
        for j, k in enumerate(idx):
            ent[e, j], rel[e, j] = adj[e][k]
    return ent, rel


@register_model("KGCN")
class KGCN(KnowledgeRecommender):
    input_type = InputType.POINTWISE
    default_config = {"embedding_size": 64, "n_iter": 1, "aggregator": "sum",
                      "reg_weight": 1e-7, "neighbor_sample_size": 4}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.n_iter = config["n_iter"]
        self.aggregator = config["aggregator"]
        self.reg_weight = config["reg_weight"]
        self.S = config["neighbor_sample_size"]
        h, r, t = dataset.kg_arrays()
        ent, rel = build_neighbor_tables(h, r, t, self.n_entities, self.S,
                                         config["seed"] or 2020)
        self.adj_ent = self.register_const("adj_ent", ent)
        self.adj_rel = self.register_const("adj_rel", rel)
        # the dense full-sort path below is derived for the single-hop
        # aggregation; deeper stacks fall back to chunked pair scoring
        self.full_sort_fallback = self.n_iter != 1

    def init_params(self, rng):
        ks = jax.random.split(rng, 3 + self.n_iter)
        D = self.embedding_size
        params = {
            "user_embedding": xavier_normal(ks[0], (self.n_users, D)),
            "entity_embedding": xavier_normal(ks[1], (self.n_entities, D)),
            "relation_embedding": xavier_normal(ks[2], (self.n_relations, D)),
            "agg_w": [xavier_normal(ks[3 + i],
                                    (2 * D if self.aggregator == "concat" else D, D))
                      for i in range(self.n_iter)],
            "agg_b": [jnp.zeros(D) for _ in range(self.n_iter)],
        }
        return params

    def _item_repr(self, params, user, item):
        """Aggregate item's n_iter-hop neighborhood with user-relation scores."""
        D = self.embedding_size
        u_e = params["user_embedding"][user]                   # (B, D)
        # hop entity lists: hop 0 = item (B, 1); hop k = (B, S^k)
        entities = [item[:, None]]
        relations = []
        for _ in range(self.n_iter):
            prev = entities[-1]
            entities.append(self.adj_ent[prev].reshape(prev.shape[0], -1))
            relations.append(self.adj_rel[prev].reshape(prev.shape[0], -1))
        vectors = [params["entity_embedding"][e] for e in entities]
        for it in range(self.n_iter):
            act = jnp.tanh if it == self.n_iter - 1 else jax.nn.relu
            new_vectors = []
            for hop in range(self.n_iter - it):
                B, M, _ = vectors[hop].shape
                neigh = vectors[hop + 1].reshape(B, M, self.S, D)
                rels = params["relation_embedding"][
                    relations[hop].reshape(B, M, self.S)]
                # user-relation score is the MEAN over dims (÷D) and the
                # aggregation a MEAN over neighbors (÷S) — reference
                # mix_neighbor_vectors, kgcn.py:173-190
                scores = jax.nn.softmax(
                    jnp.einsum("bd,bmsd->bms", u_e, rels,
                               preferred_element_type=jnp.float32) / D, -1)
                agg_n = jnp.mean(scores[..., None] * neigh, 2)  # (B, M, D)
                if self.aggregator == "sum":
                    x = vectors[hop] + agg_n
                elif self.aggregator == "neighbor":
                    x = agg_n
                else:  # concat
                    x = jnp.concatenate([vectors[hop], agg_n], -1)
                x = act(jnp.einsum("bmd,do->bmo", x, params["agg_w"][it],
                                   preferred_element_type=jnp.float32)
                        + params["agg_b"][it])
                new_vectors.append(x)
            vectors = new_vectors
        return vectors[0][:, 0]                                # (B, D)

    # every (user, item) pair drags its sampled neighbor tree through the
    # aggregators — bound the pairs alive at once so chunked full-sort eval
    # doesn't materialize (B * n_items, S^n_iter, D)
    score_pair_block = 8192

    def _pair_scores(self, params, users, items):
        return self._logits(params, users, items)

    def _logits(self, params, user, item):
        i_repr = self._item_repr(params, user, item)
        return jnp.sum(params["user_embedding"][user] * i_repr, -1)

    def calculate_loss(self, params, batch, rng=None):
        user, item = batch[self.USER_ID], batch[self.ITEM_ID]
        w = batch.get("_weight")
        i_repr = self._item_repr(params, user, item)
        u_e = params["user_embedding"][user]
        logits = jnp.sum(u_e * i_repr, -1)
        loss = bce_loss(logits, batch[self.LABEL], w)
        # EmbLoss over the BATCH representations (parity: reference
        # kgcn.py:272-289 l2_loss(user_e, pos_item_e, neg_item_e)); padded
        # scan rows are masked out of the norms via _weight
        if w is not None:
            u_e = u_e * w[:, None]
            i_repr = i_repr * w[:, None]
        reg = self.reg_weight * emb_loss(u_e, i_repr)
        return loss + reg

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))

    def full_sort_predict(self, params, batch):
        """Dense single-hop full sort. The chunked pair path re-gathers each
        item's sampled neighbor tree once per USER — at ml-1m shape that is
        ~250M gathered embedding rows per eval pass, and XLA gathers are
        row-rate bound (~6ns/row), i.e. ~1.5s of pure gather. Here each item
        chunk's (C, S) neighbor/relation tensors are gathered ONCE and every
        user is routed through them with MXU einsums, so gather volume drops
        B-fold (parity: reference full-sort over KGCN.forward,
        kgcn.py:244-270, which recomputes per pair on GPU)."""
        E = params["entity_embedding"]
        W, b = params["agg_w"][0], params["agg_b"][0]
        u_e = params["user_embedding"][batch[self.USER_ID]]     # (B, D)
        B = u_e.shape[0]
        n = self.n_items
        chunk = min(128, n)
        n_chunks = -(-n // chunk)
        ids = jnp.arange(n_chunks * chunk, dtype=jnp.int32) % n

        def score_chunk(item_chunk):                            # (C,)
            neigh = E[self.adj_ent[item_chunk]]                 # (C, S, D)
            rels = params["relation_embedding"][self.adj_rel[item_chunk]]
            self_vec = E[item_chunk]                            # (C, D)
            # attention logits: one (B, D) @ (D, C*S) MXU matmul
            # same ÷D score mean and ÷S neighbor mean as _item_repr
            p = jax.nn.softmax(
                jnp.einsum("bd,csd->bcs", u_e, rels,
                           preferred_element_type=jnp.float32)
                / self.embedding_size, -1)
            agg = jnp.einsum("bcs,csd->bcd", p, neigh,
                             preferred_element_type=jnp.float32) / self.S
            if self.aggregator == "sum":
                x = self_vec[None] + agg
            elif self.aggregator == "neighbor":
                x = agg
            else:  # concat
                x = jnp.concatenate(
                    [jnp.broadcast_to(self_vec[None], agg.shape), agg], -1)
            x = jnp.tanh(jnp.einsum("bcd,do->bco", x, W,
                                    preferred_element_type=jnp.float32) + b)
            return jnp.einsum("bd,bcd->bc", u_e, x,
                              preferred_element_type=jnp.float32)

        scores = jax.lax.map(score_chunk, ids.reshape(n_chunks, chunk))
        return scores.transpose(1, 0, 2).reshape(B, -1)[:, :n]
