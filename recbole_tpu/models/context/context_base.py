"""ContextRecommender: the CTR field-embedding machine.

Parity target: reference ContextRecommender
(recbole/model/abstract_recommender.py:151-412) + FMEmbedding/FMFirstOrderLinear
(layers.py:121, 905): all loaded fields become model inputs — token fields share
ONE embedding table via per-field offsets, float fields get a per-field
embedding scaled by the value, token_seq fields mean-pool member embeddings;
a parallel first-order linear term sums per-token biases and float weights.

TPU re-design: user/item side features are NOT joined into batches on the host
(the reference joins pandas frames per batch). The aligned side tables are
device-resident constants; forward gathers them by uid/iid. Batches stay
(B,)-shaped regardless of feature count.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import AbstractRecommender
from ..layers import xavier_normal
from ...utils.enums import ModelType, InputType, FeatureType, FeatureSource


class ContextRecommender(AbstractRecommender):
    type = ModelType.CONTEXT
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.USER_ID = config["USER_ID_FIELD"]
        self.ITEM_ID = config["ITEM_ID_FIELD"]
        self.LABEL = config["LABEL_FIELD"]
        self.embedding_size = config["embedding_size"]
        self.n_users = dataset.user_num
        self.n_items = dataset.item_num

        # enumerate usable fields in schema order
        self.token_fields = []     # (field, vocab, fetch)
        self.float_fields = []     # (field, fetch)
        self.token_seq_fields = []  # (field, vocab, table (n, L), lens)
        # only LABEL is excluded — the reference treats every other loaded
        # field (including a raw timestamp) as a feature
        # (abstract_recommender.py:207-219)
        skip = {self.LABEL}
        for field, ftype in dataset.field2type.items():
            if field in skip or field not in self._available_fields(dataset):
                continue
            src = dataset.field2source[field]
            fetch = self._make_fetch(dataset, field, src)
            if fetch is None:
                continue
            if ftype is FeatureType.TOKEN:
                self.token_fields.append((field, dataset.num(field), fetch))
            elif ftype is FeatureType.FLOAT:
                self.float_fields.append((field, fetch))
            elif ftype is FeatureType.TOKEN_SEQ:
                self.token_seq_fields.append(
                    (field, dataset.num(field), fetch))

        # unified token vocabulary offsets (parity: FMEmbedding offset trick)
        self.token_offsets = []
        total = 0
        for _, vocab, _ in self.token_fields:
            self.token_offsets.append(total)
            total += vocab
        # under a mesh the unified table is row-sharded over the "model"
        # axis (parallel/embed.py): pad the tail so shards are even — the
        # pad rows sit past every offset, are never gathered, and init as
        # zeros so seeded params match the single-chip run row-for-row
        self._token_vocab_real = total
        mesh_cfg = config["mesh_shape"] or {}
        model_axis = int(mesh_cfg.get("model", 1) or 1)
        if model_axis > 1 and total % model_axis:
            total += model_axis - total % model_axis
        self.token_vocab_total = total

        self.seq_offsets = []
        seq_total = 0
        for _, vocab, _ in self.token_seq_fields:
            self.seq_offsets.append(seq_total)
            seq_total += vocab
        self.seq_vocab_total = seq_total

        self.num_fields = (len(self.token_fields) + len(self.float_fields)
                           + len(self.token_seq_fields))
        # (offset, vocab) per token field, for the field-grouped backward
        # (ops/embed_grad.grouped_take_rows)
        self._field_spec = tuple(
            (off, vocab) for (_, vocab, _), off
            in zip(self.token_fields, self.token_offsets))

    def _available_fields(self, dataset):
        fields = set(dataset.inter_feat.keys())
        if dataset.user_feat is not None:
            fields |= set(dataset.user_feat.keys())
        if dataset.item_feat is not None:
            fields |= set(dataset.item_feat.keys())
        return fields

    def _make_fetch(self, dataset, field, src):
        """Build a device fetch: batch -> (B,) value (token/float) or
        (B, L) ids + (B,) lens (token_seq)."""
        ftype = dataset.field2type[field]
        if src in (FeatureSource.INTERACTION, FeatureSource.USER_ID,
                   FeatureSource.ITEM_ID):
            if ftype is FeatureType.TOKEN_SEQ:
                return None  # seq fields in .inter not yet supported
            return lambda batch, f=field: batch[f]

        if src is FeatureSource.USER:
            table = dataset.user_feat
            key = self.USER_ID
        elif src is FeatureSource.ITEM:
            table = dataset.item_feat
            key = self.ITEM_ID
        else:
            return None
        col = table[field]
        if ftype is FeatureType.TOKEN_SEQ:
            lens = np.array([len(s) for s in col], np.int32)
            L = max(int(lens.max()), 1)
            padded = np.zeros((len(col), L), np.int32)
            for r, s in enumerate(col):
                padded[r, :len(s)] = s
            dpad = jnp.asarray(padded)
            dlen = jnp.asarray(lens)
            return lambda batch, k=key: (dpad[batch[k]], dlen[batch[k]])
        dcol = jnp.asarray(col.astype(np.float32) if ftype is FeatureType.FLOAT
                           else col.astype(np.int32))
        return lambda batch, k=key: dcol[batch[k]]

    # ---------------------------------------------------------------- params

    def init_context_params(self, rng):
        ks = jax.random.split(rng, 6)
        params = {}
        if self.token_vocab_total:
            emb = xavier_normal(
                ks[0], (self._token_vocab_real, self.embedding_size))
            pad = self.token_vocab_total - self._token_vocab_real
            if pad:
                emb = jnp.concatenate(
                    [emb, jnp.zeros((pad, self.embedding_size))], axis=0)
            # MERGED STORAGE (round 5): the first-order bias lives as column
            # D of the embedding table, so second-order rows and bias ride
            # ONE (V, D+1) gather over the same ids (the two separate walks
            # were the dominant FM@Criteo step term, round-4 anatomy), the
            # grouped backward handles both gradients in one pass, and the
            # optimizer sweeps one table instead of two. The bias column
            # initializes to zero exactly like the old (V,) token_bias; the
            # xavier fan of the embedding part is computed on (V, D), so
            # seeded init values match the split layout row-for-row.
            params["token_embedding"] = jnp.concatenate(
                [emb, jnp.zeros((self.token_vocab_total, 1))], axis=1)
        if self.float_fields:
            params["float_embedding"] = xavier_normal(
                ks[1], (len(self.float_fields), self.embedding_size))
            params["float_weight"] = jnp.zeros((len(self.float_fields),))
        if self.seq_vocab_total:
            params["seq_embedding"] = xavier_normal(
                ks[2], (self.seq_vocab_total, self.embedding_size))
            params["seq_bias"] = jnp.zeros((self.seq_vocab_total,))
        params["first_order_bias"] = jnp.zeros(())
        return params

    # --------------------------------------------------------------- forward

    def _token_ids(self, batch):
        """(B, F) offset token ids across every token field — ONE batched
        lookup instead of F separate gathers. The gather routes through
        take_rows, whose backward is a sort + sorted segment-sum: duplicate
        ids inside the batch (40-90% of rows on CTR data — users/items/
        categories repeat) are summed BEFORE touching the table, replacing
        XLA's serializing scatter-add (measured 5.4ms of a 10.5ms Criteo
        DeepFM step in round 2) with a dedup-then-add."""
        return jnp.stack([fetch(batch) + off
                          for (f, v, fetch), off in zip(self.token_fields,
                                                        self.token_offsets)],
                         axis=1)

    def _lookup(self, table, ids):
        """(B, F) global-offset ids -> (B, F, D) rows of ``table``, with the
        gradient strategy picked by measurement (round-4 A/B, PARITY.md):
        field-grouped backward on TPU (small-vocab fields via contiguous
        one-hot blocks, only huge-vocab fields scatter), plain gather
        elsewhere. Env overrides for A/B reruns:
        RECBOLE_TPU_DEDUP_GATHER=1 (sort+segment-sum backward),
        RECBOLE_TPU_CTR_SCATTER=1 (plain XLA scatter backward)."""
        import os
        B, F = ids.shape
        if os.environ.get("RECBOLE_TPU_DEDUP_GATHER"):
            from ...ops.bitgraph import take_rows
            return take_rows(table.shape[0], table,
                             ids.reshape(-1)).reshape(B, F, -1)
        if os.environ.get("RECBOLE_TPU_CTR_SCATTER") \
                or jax.default_backend() not in ("tpu", "axon"):
            return table.at[ids].get(mode="promise_in_bounds")
        from ...ops.embed_grad import grouped_take_rows
        return grouped_take_rows(self._field_spec, table, ids)

    def _token_rows(self, params, batch):
        """(B, F, D+1) rows of the merged token table (embedding cols 0..D-1,
        first-order bias col D) — ONE gather serves both terms."""
        from ...parallel.mesh import active_plan
        ids = self._token_ids(batch)                           # (B, F)
        plan = active_plan()
        if plan is not None and plan.shards_table(
                "token_embedding", params["token_embedding"]):
            from ...parallel.embed import sharded_take_rows
            return sharded_take_rows(plan.mesh,
                                     params["token_embedding"], ids)
        return self._lookup(params["token_embedding"], ids)

    def embed_input(self, params, batch):
        """(B, num_fields, D) second-order embeddings."""
        parts = []
        if self.token_fields:
            parts.append(self._token_rows(params, batch)[..., :-1])
        for j, (field, fetch) in enumerate(self.float_fields):
            val = fetch(batch).astype(jnp.float32)
            parts.append((params["float_embedding"][j][None, :]
                          * val[:, None])[:, None, :])
        for (field, vocab, fetch), off in zip(self.token_seq_fields,
                                              self.seq_offsets):
            ids, lens = fetch(batch)
            emb = params["seq_embedding"][ids + off]           # (B, L, D)
            valid = (jnp.arange(ids.shape[1])[None, :]
                     < lens[:, None]).astype(jnp.float32)
            pooled = jnp.sum(emb * valid[:, :, None], axis=1) \
                / jnp.maximum(lens[:, None], 1)
            parts.append(pooled[:, None, :])
        return jnp.concatenate(parts, axis=1)

    def embed_and_first_order(self, params, batch):
        """Fused (emb, linear) = (embed_input, first_order) for models that
        need both. Round-4 anatomy (PARITY.md FM@Criteo): the two separate
        token gathers — (B, F) rows of the (V, D) table and (B, F) scalars
        of the (V,) bias — walked the SAME ids and were the dominant step
        term (2.0 of ~6.7 ms). With the merged (V, D+1) table (bias as
        column D, init_context_params) both terms ride one gather on every
        path. A first attempt that CONCATENATED the split tables per step
        measured SLOWER (FM@Criteo 7.06 vs 6.67 s/ep — the (V, D+1) concat
        + backward split cost more than the shared gather saved), which is
        why the merge lives in param storage, not the forward."""
        if not self.token_fields:
            return (self.embed_input(params, batch),
                    self.first_order(params, batch))
        rows = self._token_rows(params, batch)                 # (B, F, D+1)
        token_emb = rows[..., :-1]
        linear = jnp.sum(rows[..., -1], axis=1) + params["first_order_bias"]

        parts = [token_emb]
        for j, (field, fetch) in enumerate(self.float_fields):
            val = fetch(batch).astype(jnp.float32)
            parts.append((params["float_embedding"][j][None, :]
                          * val[:, None])[:, None, :])
            linear = linear + params["float_weight"][j] * val
        for (field, vocab, fetch), off in zip(self.token_seq_fields,
                                              self.seq_offsets):
            ids_s, lens = fetch(batch)
            emb = params["seq_embedding"][ids_s + off]         # (B, L, D)
            valid = (jnp.arange(ids_s.shape[1])[None, :]
                     < lens[:, None]).astype(jnp.float32)
            pooled = jnp.sum(emb * valid[:, :, None], axis=1) \
                / jnp.maximum(lens[:, None], 1)
            parts.append(pooled[:, None, :])
            linear = linear + jnp.sum(
                params["seq_bias"][ids_s + off] * valid, axis=1)
        return jnp.concatenate(parts, axis=1), linear

    def batch_len(self, batch):
        """Batch size from any (B,)-leading column — pure-feature datasets
        (USER_ID_FIELD: ~) have no id column to anchor on."""
        if self.USER_ID in batch:
            return batch[self.USER_ID].shape[0]
        for v in batch.values():
            if hasattr(v, "ndim") and v.ndim >= 1:
                return v.shape[0]
        raise ValueError("cannot infer batch size from an empty batch")

    def first_order(self, params, batch):
        """(B,) linear term (parity: FMFirstOrderLinear, layers.py:905)."""
        total = jnp.zeros(self.batch_len(batch)) + params["first_order_bias"]
        if self.token_fields:
            # standalone first_order (LR and friends): gather from the
            # SLICED bias column, not full (D+1)-wide rows — the column
            # slice materializes once per step (~V*4 bytes) while full-row
            # gathers cost 11x the bytes (measured: LR@Criteo 3.3 -> 5.3
            # s/ep when this path gathered whole rows). Models needing both
            # terms use embed_and_first_order's single full-row gather.
            from ...parallel.mesh import active_plan
            plan = active_plan()
            if plan is not None and plan.shards_table(
                    "token_embedding", params["token_embedding"]):
                bias = self._token_rows(params, batch)[..., -1]
            else:
                col = params["token_embedding"][:, -1:]        # (V, 1)
                bias = self._lookup(col, self._token_ids(batch))[..., 0]
            total = total + jnp.sum(bias, axis=1)
        for j, (field, fetch) in enumerate(self.float_fields):
            total = total + params["float_weight"][j] * \
                fetch(batch).astype(jnp.float32)
        for (field, vocab, fetch), off in zip(self.token_seq_fields,
                                              self.seq_offsets):
            ids, lens = fetch(batch)
            b = params["seq_bias"][ids + off]
            valid = (jnp.arange(ids.shape[1])[None, :]
                     < lens[:, None]).astype(jnp.float32)
            total = total + jnp.sum(b * valid, axis=1)
        return total
