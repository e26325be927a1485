"""FM: factorization machine CTR model.

Parity target: reference FM (recbole/model/context_aware_recommender/fm.py) —
first-order linear + second-order pairwise interactions, sigmoid + BCE.

TPU specialization (round 5): FM never materializes the (B, F, D) field
tensor. The pairwise term 0.5*((sum_f v)^2 - sum_f v^2) needs only per-field
SUMS, so the token part reduces the merged (B, F, D+1) gather straight to
(B, D+1) — one reduction yields the embedding sum AND the first-order bias
sum — and float fields add their contributions per-part. The concat-based
path (profile_ctr_step.py round-5 trace) spent ~0.45 ms/step building and
re-splitting the (B, 39, 10) tensor that DeepFM's fused MLP consumer avoids.
"""

import jax
import jax.numpy as jnp

from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("FM")
class FM(ContextRecommender):
    default_config = {"embedding_size": 10}

    def init_params(self, rng):
        return self.init_context_params(rng)

    def _logits(self, params, batch):
        B = self.batch_len(batch)
        D = self.embedding_size
        sum_vec = jnp.zeros((B, D))
        sq_vec = jnp.zeros((B, D))
        linear = jnp.zeros((B,)) + params["first_order_bias"]
        if self.token_fields:
            rows = self._token_rows(params, batch)             # (B, F, D+1)
            s = jnp.sum(rows, axis=1)                          # (B, D+1)
            sq = jnp.sum(rows * rows, axis=1)                  # (B, D+1)
            # slice the SMALL reduced tensors, not the (B, F, D+1) rows —
            # a [..., :-1] on rows materializes a (B, F, D) copy per batch
            sum_vec = sum_vec + s[:, :-1]
            linear = linear + s[:, -1]
            sq_vec = sq_vec + sq[:, :-1]
        for j, (field, fetch) in enumerate(self.float_fields):
            val = fetch(batch).astype(jnp.float32)
            fv = params["float_embedding"][j][None, :] * val[:, None]
            sum_vec = sum_vec + fv
            sq_vec = sq_vec + fv * fv
            linear = linear + params["float_weight"][j] * val
        for (field, vocab, fetch), off in zip(self.token_seq_fields,
                                              self.seq_offsets):
            ids, lens = fetch(batch)
            emb = params["seq_embedding"][ids + off]           # (B, L, D)
            valid = (jnp.arange(ids.shape[1])[None, :]
                     < lens[:, None]).astype(jnp.float32)
            pooled = jnp.sum(emb * valid[:, :, None], axis=1) \
                / jnp.maximum(lens[:, None], 1)
            sum_vec = sum_vec + pooled
            sq_vec = sq_vec + pooled * pooled
            linear = linear + jnp.sum(
                params["seq_bias"][ids + off] * valid, axis=1)
        pairwise = 0.5 * jnp.sum(sum_vec * sum_vec - sq_vec, axis=-1)
        return linear + pairwise

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        # eval keeps the concat path: the sums specialization measured
        # 0.39 -> 0.56 s/ep on Criteo eval (while winning train 6.02 ->
        # 5.65) — without a backward to feed, XLA fuses the concat into
        # fm_pairwise better than the hand-decomposed reductions
        from ..layers import fm_pairwise
        emb, linear = self.embed_and_first_order(params, batch)
        return jax.nn.sigmoid(linear + fm_pairwise(emb))
