"""RippleNet: preference propagation over per-user ripple sets.

Parity target: reference RippleNet
(recbole/model/knowledge_aware_recommender/ripplenet.py) — each user has n_hop
"ripple sets" of KG triples seeded by their interacted items (fixed n_memory
per hop, sampled once); prediction attends the item embedding over each hop's
(head, relation) memories and accumulates tail responses; kg regularizer on
the triple reconstruction.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


def build_ripple_sets(hist, hlen, kg_h, kg_r, kg_t, n_users, n_hop, n_memory,
                      seed=2020):
    """Per-user fixed-size hop memories (reference _build_ripple_set,
    ripplenet.py:83-140): hop 0 seeds from the user's train items; a hop
    with no reachable triples COPIES the previous hop's sampled memories;
    users with no hop-0 triples get all-zero (PAD) memories — which stay
    LIVE rows downstream (the reference runs its softmax/kge/reg over them
    with the real entity-0/relation-0 embeddings, no masking)."""
    rng = np.random.RandomState(seed)
    # head -> list of (r, t)
    out = {}
    for hh, rr, tt in zip(kg_h, kg_r, kg_t):
        out.setdefault(hh, []).append((rr, tt))
    H = np.zeros((n_users, n_hop, n_memory), np.int32)
    R = np.zeros((n_users, n_hop, n_memory), np.int32)
    T = np.zeros((n_users, n_hop, n_memory), np.int32)
    for u in range(n_users):
        seeds = list(hist[u][:hlen[u]])
        for hop in range(n_hop):
            triples = []
            for s in seeds:
                for (rr, tt) in out.get(int(s), []):
                    triples.append((int(s), int(rr), int(tt)))
            if not triples:
                if hop > 0:  # copy the previous hop (ripplenet.py:126-127)
                    H[u, hop], R[u, hop], T[u, hop] = (H[u, hop - 1],
                                                       R[u, hop - 1],
                                                       T[u, hop - 1])
                seeds = list(T[u, hop])
                continue
            idx = rng.choice(len(triples), n_memory,
                             replace=len(triples) < n_memory)
            for j, k in enumerate(idx):
                H[u, hop, j], R[u, hop, j], T[u, hop, j] = triples[k]
            seeds = [triples[k][2] for k in idx]
    return H, R, T


@register_model("RippleNet")
class RippleNet(KnowledgeRecommender):
    input_type = InputType.POINTWISE
    default_config = {"embedding_size": 64, "n_hop": 2, "n_memory": 16,
                      "kg_weight": 0.01, "reg_weight": 1e-7}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.n_hop = config["n_hop"]
        self.n_memory = config["n_memory"]
        self.kg_weight = config["kg_weight"]
        self.reg_weight = config["reg_weight"]
        hist, hlen = dataset.history_item_matrix()
        h, r, t = dataset.kg_arrays()
        H, R, T = build_ripple_sets(hist, hlen, h, r, t, self.n_users,
                                    self.n_hop, self.n_memory,
                                    config["seed"] or 2020)
        self.rip_h = self.register_const("rip_h", H)
        self.rip_r = self.register_const("rip_r", R)
        self.rip_t = self.register_const("rip_t", T)

    def init_params(self, rng):
        ks = jax.random.split(rng, 3)
        D = self.embedding_size
        return {
            "entity_embedding": xavier_normal(ks[0], (self.n_entities, D)),
            # relations as (D, D) matrices; the reference stores a 2-D
            # (n_rel, D*D) Embedding (ripplenet.py:72), so xavier fans are
            # computed on that shape and then reshaped
            "relation_embedding": xavier_normal(
                ks[1], (self.n_relations, D * D)
            ).reshape(self.n_relations, D, D),
            "transform": xavier_normal(ks[2], (D, D)),
        }

    def _score_single(self, params, user, item, return_kg=False):
        """C=1 scoring (training / pointwise predict), routed through the
        shared memory path: _rel_apply builds R_r h once for every hop, and
        the same tensor serves the attention logits, the all-hop kge term
        and the per-hop embedding regularizer (reference ripplenet.py
        computes kge/reg from exactly these per-hop gathered triples,
        :220-252)."""
        if return_kg:
            scores, aux = self._score_candidates(params, user, item[:, None],
                                                 return_kg=True)
            return scores[:, 0], aux
        return self._score_candidates(params, user, item[:, None])[:, 0]

    def _score_candidates(self, params, user, cand, return_kg=False):
        """user: (B,), cand: (B, C) -> (B, C) scores. The per-user ripple
        tensors are gathered ONCE per user and shared across all C candidates
        — the memory-critical choice for full-sort evaluation. The relation
        transforms R[r] @ h for ALL hops run as a single relation-vocabulary
        loop (they are independent of the candidate chain), and the result
        doubles as the kge/reg terms' R h during training."""
        B = user.shape[0]
        v = params["entity_embedding"][cand]                   # (B, C, D)
        h_all = params["entity_embedding"][self.rip_h[user]]   # (B, H, M, D)
        t_all = params["entity_embedding"][self.rip_t[user]]
        r_all = jnp.asarray(self.rip_r)[user]                  # (B, H, M)
        rh_all = self._rel_apply(
            params, r_all.reshape(B, -1),
            h_all.reshape(B, -1, self.embedding_size)).reshape(h_all.shape)
        o_sum = jnp.zeros_like(v)
        for hop in range(self.n_hop):
            t_e = t_all[:, hop]
            rh = rh_all[:, hop]                                # (B, M, D)
            probs = jax.nn.softmax(
                jnp.einsum("bmi,bci->bcm", rh, v,
                           preferred_element_type=jnp.float32), -1)
            o = jnp.einsum("bcm,bmi->bci", probs, t_e,
                           preferred_element_type=jnp.float32)
            o_sum = o_sum + o
            v = jnp.dot(v + o, params["transform"],
                        preferred_element_type=jnp.float32)
        # score against the hop-TRANSFORMED item embedding (the reference's
        # self.item_embeddings has been through transform_matrix n_hop
        # times by the final dot, ripplenet.py:174-178 + 215-216)
        scores = jnp.sum(v * o_sum, -1)
        if return_kg:
            return scores, (rh_all, h_all, t_all, r_all)
        return scores

    def _rel_apply(self, params, rels, vecs):
        """y[b,m] = R[rels[b,m]] @ vecs[b,m] WITHOUT materializing per-memory
        (D, D) matrices. A gather of (B*M, D*D) rows moves 537MB per hop at
        batch 2048 (and its backward is a serializing scatter-add); instead
        loop the small relation vocabulary, masking rows into one (B*M, D) @
        (D, D) MXU matmul per relation and accumulating — grouped-expert
        routing. For large vocabularies fall back to the one-hot matmul."""
        D = self.embedding_size
        R = params["relation_embedding"]
        from ...ops.rel_apply import rel_apply, rel_apply_supported
        if rel_apply_supported(self.n_relations, D):
            # round-5 Pallas kernel: the XLA loop below runs NR full
            # matmul+accumulate passes over the (N, D) rows, each at HBM
            # bandwidth (convolution_add_fusion x51 = 4.4 ms/step traced at
            # ml-1m shape); the kernel keeps the accumulator in VMEM and
            # does one stacked (rows, D) @ (D, NR*D) matmul per row block
            # (measured 10.3 vs 17.1 ms on the isolated fwd+bwd chain)
            B, M = rels.shape
            flat = rel_apply(vecs.reshape(B * M, D),
                             rels.reshape(B * M), R)
            return flat.reshape(B, M, D)
        if self.n_relations > 128:
            onehot = jax.nn.one_hot(rels.reshape(-1), self.n_relations,
                                    dtype=jnp.float32)
            flat = jnp.dot(onehot, R.reshape(self.n_relations, -1),
                           preferred_element_type=jnp.float32)
            mats = flat.reshape(rels.shape + (D, D))
            return jnp.einsum("bmij,bmj->bmi", mats, vecs,
                              preferred_element_type=jnp.float32)
        out = jnp.zeros_like(vecs)
        for r in range(self.n_relations):
            mask = (rels == r).astype(vecs.dtype)[..., None]
            out = out + jnp.einsum("bmj,ij->bmi", vecs * mask, R[r],
                                   preferred_element_type=jnp.float32)
        return out

    def _forward(self, params, user, item):
        return self._score_single(params, user, item)

    def score_items(self, params, batch, items):
        return self._score_candidates(params, batch[self.USER_ID], items)

    def calculate_loss(self, params, batch, rng=None):
        """loss = BCE − kg_weight·Σ_hop mean(σ(hRt))
                      + reg_weight·(Σ_hop EmbLoss(h,t,r) + EmbLoss(W))
        (parity: reference ripplenet.py:220-252 — the kge term is the raw
        sigmoid mean, subtracted; reg is per-hop Frobenius norms of the
        GATHERED triples divided by batch size, plus the transform)."""
        user, item = batch[self.USER_ID], batch[self.ITEM_ID]
        w = batch.get("_weight")
        scores, (rh_all, h_all, t_all, r_all) = self._score_single(
            params, user, item, return_kg=True)
        loss = bce_loss(scores, batch[self.LABEL], w)
        B = user.shape[0]
        if w is None:
            row_w = jnp.ones((B,), jnp.float32)
        else:
            row_w = w.astype(jnp.float32)
        eff_b = jnp.maximum(jnp.sum(row_w), 1.0)

        # kge: per-hop mean of sigmoid(t·(R h)) over (B, M), masked to real rows
        rec = jnp.sum(t_all * rh_all, -1)                      # (B, H, M)
        sig = jax.nn.sigmoid(rec) * row_w[:, None, None]
        kge = jnp.sum(jnp.mean(sig, axis=2).sum(axis=0) / eff_b)

        # reg: sqrt-of-weighted-square-sums == torch.norm over the gathered
        # rows; the relation matrices' norm uses per-relation row counts
        # against the (R, D, D) table instead of materializing the gather
        R = params["relation_embedding"]
        rel_sq = jnp.sum(R.reshape(self.n_relations, -1) ** 2, -1)   # (R,)
        reg = jnp.float32(0.0)
        for hop in range(self.n_hop):
            h_sq = jnp.sum(h_all[:, hop] ** 2, (1, 2)) @ row_w
            t_sq = jnp.sum(t_all[:, hop] ** 2, (1, 2)) @ row_w
            counts = jnp.sum(
                jax.nn.one_hot(r_all[:, hop], self.n_relations,
                               dtype=jnp.float32) * row_w[:, None, None],
                (0, 1))                                              # (R,)
            r_sq = counts @ rel_sq
            # EmbLoss divides by the flattened gather's row count B*M
            # (loss.py:70-84 with (B*M, ·) inputs)
            reg = reg + (jnp.sqrt(jnp.clip(h_sq, 1e-12))
                         + jnp.sqrt(jnp.clip(t_sq, 1e-12))
                         + jnp.sqrt(jnp.clip(r_sq, 1e-12))) / (
                             eff_b * self.n_memory)
        W = params["transform"]
        reg = reg + jnp.sqrt(jnp.clip(jnp.sum(W ** 2), 1e-12)) / W.shape[0]
        return loss, -self.kg_weight * kge, self.reg_weight * reg

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._forward(params, batch[self.USER_ID], batch[self.ITEM_ID]))
