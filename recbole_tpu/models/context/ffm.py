"""FFM: field-aware factorization machine.

Parity target: reference FFM (recbole/model/context_aware_recommender/ffm.py)
— each feature keeps a separate embedding PER OTHER FIELD; pair (i, j) is
scored with <v_{i,field_j}, v_{j,field_i}>.
"""

import jax
import jax.numpy as jnp

from ..layers import xavier_normal
from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("FFM")
class FFM(ContextRecommender):
    default_config = {"embedding_size": 10, "fields": None}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        F = self.num_fields
        ii, jj = jnp.triu_indices(F, k=1)
        self.pair_i, self.pair_j = ii, jj

    def init_params(self, rng):
        kc, kf = jax.random.split(rng)
        params = self.init_context_params(kc)
        F = self.num_fields
        # field-aware token table: one embedding per (token, target-field)
        if self.token_vocab_total:
            # draw at the REAL vocab and zero-pad the mesh tail, so seeded
            # init matches the single-chip run row-for-row (this 3-D table
            # is never row-sharded; the padding only keeps id ranges valid)
            emb = xavier_normal(
                kf, (self._token_vocab_real, F, self.embedding_size))
            pad = self.token_vocab_total - self._token_vocab_real
            if pad:
                emb = jnp.concatenate(
                    [emb, jnp.zeros((pad, F, self.embedding_size))], axis=0)
            params["ffm_token_embedding"] = emb
        if self.float_fields:
            params["ffm_float_embedding"] = xavier_normal(
                jax.random.fold_in(kf, 1),
                (len(self.float_fields), F, self.embedding_size))
        return params

    def _field_aware_embeddings(self, params, batch):
        """(B, F_src, F_dst, D)."""
        parts = []
        for (field, vocab, fetch), off in zip(self.token_fields,
                                              self.token_offsets):
            ids = fetch(batch) + off
            parts.append(params["ffm_token_embedding"][ids][:, None])
        for j, (field, fetch) in enumerate(self.float_fields):
            val = fetch(batch).astype(jnp.float32)
            parts.append((params["ffm_float_embedding"][j][None]
                          * val[:, None, None])[:, None])
        # token_seq fields fall back to their pooled single embedding repeated
        for (field, vocab, fetch), off in zip(self.token_seq_fields,
                                              self.seq_offsets):
            ids, lens = fetch(batch)
            emb = params["seq_embedding"][ids + off]
            valid = (jnp.arange(ids.shape[1])[None, :]
                     < lens[:, None]).astype(jnp.float32)
            pooled = jnp.sum(emb * valid[:, :, None], 1) / jnp.maximum(
                lens[:, None], 1)
            parts.append(jnp.broadcast_to(
                pooled[:, None, None, :],
                (pooled.shape[0], 1, self.num_fields, pooled.shape[-1])))
        return jnp.concatenate(parts, axis=1)

    def _logits(self, params, batch, rng=None):
        fa = self._field_aware_embeddings(params, batch)       # (B, F, F, D)
        vi = fa[:, self.pair_i, self.pair_j, :]                # v_i seen by j
        vj = fa[:, self.pair_j, self.pair_i, :]                # v_j seen by i
        inter = jnp.sum(vi * vj, axis=(-1, -2))
        return self.first_order(params, batch) + inter

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
