"""S3Rec: self-supervised pretraining for sequential recommendation.

Parity target: reference S3Rec (recbole/model/sequential_recommender/s3rec.py)
— two-stage training. Pretrain optimizes four objectives over a bidirectional
Transformer: AAP (attribute prediction at unmasked positions), MIP (masked
item prediction, BPR-style σ(pos−neg)), MAP (attribute prediction at masked
positions), SP (segment prediction). Finetune is causal SASRec with CE/BPR.

TPU re-design: the reference rebuilds pretrain data in a per-row host Python
loop (reconstruct_pretrain_data, s3rec.py:259-347); here masking, negatives,
and segment windows are sampled ON DEVICE inside calculate_loss, and the
negative segment comes from the neighboring batch row (statistically
equivalent to the reference's long_sequence draw).
Stage hand-off goes through pre_model_path (pickle checkpoints), selected by
config train_stage (parity: S3RecTrainer, trainer.py:511-567).
"""

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import (transformer_init, transformer_apply, layer_norm,
                      causal_attention_mask, normal_init, xavier_normal,
                      dropout_apply)
from ..losses import bpr_loss, ce_loss
from ...utils.enums import InputType, FeatureType
from .. import register_model


@register_model("S3Rec")
class S3Rec(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding", "feature_embedding")
    default_config = {"n_layers": 2, "n_heads": 2, "hidden_size": 64,
                      "inner_size": 256, "hidden_dropout_prob": 0.5,
                      "attn_dropout_prob": 0.5, "hidden_act": "gelu",
                      "layer_norm_eps": 1e-12, "initializer_range": 0.02,
                      "item_attribute": None, "mask_ratio": 0.2,
                      "aap_weight": 1.0, "mip_weight": 0.2, "map_weight": 1.0,
                      "sp_weight": 0.5, "train_stage": "pretrain",
                      "save_step": 10, "pre_model_path": "",
                      "loss_type": "CE", "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_layers = config["n_layers"]
        self.n_heads = config["n_heads"]
        self.hidden_size = config["hidden_size"]
        self.inner_size = config["inner_size"]
        self.hidden_act = config["hidden_act"]
        self.hidden_dropout_prob = config["hidden_dropout_prob"]
        self.attn_dropout_prob = config["attn_dropout_prob"]
        self.initializer_range = config["initializer_range"]
        self.mask_ratio = config["mask_ratio"]
        self.aap_weight = config["aap_weight"]
        self.mip_weight = config["mip_weight"]
        self.map_weight = config["map_weight"]
        self.sp_weight = config["sp_weight"]
        self.train_stage = config["train_stage"]
        self.pre_model_path = config["pre_model_path"]
        self.loss_type = config["loss_type"]
        if self.train_stage not in ("pretrain", "finetune"):
            raise ValueError("train_stage must be pretrain or finetune")
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           and self.train_stage == "finetune"
                           else InputType.POINTWISE)
        self.mask_token = self.n_items  # table has n_items + 1 rows

        # item -> attribute multi-hot (drop attribute PAD id 0)
        attr_field = config["item_attribute"]
        if attr_field is None and dataset.item_feat:
            attr_field = next(
                (f for f in dataset.item_feat
                 if dataset.field2type[f] is FeatureType.TOKEN_SEQ), None)
        if attr_field is None or dataset.item_feat is None \
                or attr_field not in dataset.item_feat:
            raise ValueError(
                "S3Rec needs an item attribute field (config item_attribute) "
                "loaded from the .item file — add it to load_col")
        self.n_features = dataset.num(attr_field) - 1
        multihot = np.zeros((self.n_items + 1, self.n_features), np.float32)
        for iid, vals in enumerate(dataset.item_feat[attr_field]):
            for v in np.asarray(vals):
                if v > 0:
                    multihot[iid, int(v) - 1] = 1.0
        self.attr_multihot = self.register_const("attr_multihot", multihot)

    # ----------------------------------------------------------------- params

    def init_params(self, rng):
        if self.train_stage == "finetune" and self.pre_model_path:
            with open(self.pre_model_path, "rb") as fh:
                state = pickle.load(fh)
            return jax.tree.map(jnp.asarray, state["params"])
        ks = jax.random.split(rng, 8)
        D = self.hidden_size
        std = self.initializer_range
        return {
            "item_embedding": normal_init(
                ks[0], (self.n_items + 1, D), std).at[0].set(0.0),
            "position_embedding": normal_init(
                ks[1], (self.max_seq_length, D), std),
            "feature_embedding": normal_init(
                ks[2], (self.n_features, D), std),
            "encoder": transformer_init(ks[3], self.n_layers, self.n_heads,
                                        D, self.inner_size),
            "ln_g": jnp.ones(D), "ln_b": jnp.zeros(D),
            "aap_w": xavier_normal(ks[4], (D, D)), "aap_b": jnp.zeros(D),
            "mip_w": xavier_normal(ks[5], (D, D)), "mip_b": jnp.zeros(D),
            "map_w": xavier_normal(ks[6], (D, D)), "map_b": jnp.zeros(D),
            "sp_w": xavier_normal(ks[7], (D, D)), "sp_b": jnp.zeros(D),
        }

    # ---------------------------------------------------------------- encoder

    def _encode(self, params, seq, seq_len, bidirectional, rng=None):
        L = seq.shape[1]
        x = self.embed_seq(params, seq) \
            + params["position_embedding"][None, :L, :]
        x = layer_norm(x, params["ln_g"], params["ln_b"])
        if rng is not None and self.hidden_dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.hidden_dropout_prob)
        if bidirectional:
            key_valid = (seq != 0).astype(jnp.int32)     # key-side only,
            causal = False                               # matching the dense
        else:                                            # pretrain mask above
            key_valid = (jnp.arange(L)[None, :] < seq_len[:, None]) \
                .astype(jnp.int32)
            causal = True
        return transformer_apply(
            params["encoder"], x, None, self.n_heads, act=self.hidden_act,
            dropout=self.hidden_dropout_prob if rng is not None else 0.0,
            attn_dropout=self.attn_dropout_prob if rng is not None else 0.0,
            rng=rng, mask_spec=(key_valid, causal),
            fused=self.config["fused_attention"])

    # ---------------------------------------------------------------- losses

    def _bce(self, logits, target):
        return jnp.maximum(logits, 0) - logits * target \
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))

    def pretrain_core(self, params, features, masked_seq, pos_items,
                      neg_items, masked_segment, pos_segment, neg_segment,
                      last_pos, row_w=None, rng=None):
        """The four pretrain objectives over PRE-SAMPLED tensors, with the
        reference's exact SUM scaling (no batch-size division —
        s3rec.py:189-245 sums every per-position BCE term).

        features: (B, L, F) attribute multi-hot aligned with pos_items;
        last_pos: (B,) readout position for the SP encodings (the reference
        left-pads its pretrain rows and reads [:, -1])."""
        B, L = masked_seq.shape
        if row_w is None:
            row_w = jnp.ones((B,))
        rngs = (jax.random.split(rng, 4) if rng is not None
                else [None] * 4)
        seq_len_full = jnp.full((B,), L, jnp.int32)
        out = self._encode(params, masked_seq, seq_len_full, True, rngs[0])
        feat_emb = params["feature_embedding"]                  # (F, D)
        mask_flag = masked_seq == self.mask_token
        real = masked_seq != 0

        # AAP — attributes at real UNMASKED positions
        aap_logits = jnp.einsum(
            "bld,fd->blf", (jnp.dot(out, params["aap_w"]) + params["aap_b"]), feat_emb)
        aap_mask = (real & ~mask_flag) * row_w[:, None]
        # torch BCE clamps each log at -100 (so per-element loss <= 100)
        aap = jnp.sum(jnp.minimum(self._bce(aap_logits, features), 100.0)
                      * aap_mask[..., None])

        # MIP — masked item prediction, BCE(σ(pos − neg), 1)
        mip_h = jnp.dot(out, params["mip_w"]) + params["mip_b"]
        # each side is SIGMOIDED before the difference
        # (_masked_item_prediction returns sigmoid scores, s3rec.py:139-144)
        pos_s = jax.nn.sigmoid(
            jnp.sum(mip_h * params["item_embedding"][pos_items], -1))
        neg_s = jax.nn.sigmoid(
            jnp.sum(mip_h * params["item_embedding"][neg_items], -1))
        mip = jnp.sum(jnp.logaddexp(0.0, neg_s - pos_s)
                      * mask_flag * row_w[:, None])

        # MAP — attributes at masked positions
        map_logits = jnp.einsum(
            "bld,fd->blf", (jnp.dot(out, params["map_w"]) + params["map_b"]), feat_emb)
        map_ = jnp.sum(jnp.minimum(self._bce(map_logits, features), 100.0)
                       * (mask_flag * row_w[:, None])[..., None])

        # SP — segment prediction at the readout position
        take = lambda h: jnp.take_along_axis(
            h, last_pos[:, None, None].astype(jnp.int32), 1)[:, 0]
        ctx = take(self._encode(params, masked_segment, seq_len_full, True,
                                rngs[1]))
        pos_emb = take(self._encode(params, pos_segment, seq_len_full, True,
                                    rngs[2]))
        neg_emb = take(self._encode(params, neg_segment, seq_len_full, True,
                                    rngs[3]))
        sp_h = jnp.dot(ctx, params["sp_w"]) + params["sp_b"]
        # sigmoid per side (_segment_prediction, s3rec.py:151-155)
        sp_pos = jax.nn.sigmoid(jnp.sum(sp_h * pos_emb, -1))
        sp_neg = jax.nn.sigmoid(jnp.sum(sp_h * neg_emb, -1))
        sp = jnp.sum(jnp.logaddexp(0.0, sp_neg - sp_pos) * row_w)

        return (self.aap_weight * aap + self.mip_weight * mip
                + self.map_weight * map_ + self.sp_weight * sp)

    def _pretrain_loss(self, params, seq, seq_len, rng, row_w=None):
        """Device-side pretrain data sampling (the reference rebuilds these
        tensors in a per-row host loop, reconstruct_pretrain_data,
        s3rec.py:259-347), feeding pretrain_core. Sequences stay
        right-padded; the SP readout is each row's last real position."""
        B, L = seq.shape
        valid = seq != 0
        if row_w is None:
            row_w = jnp.ones((B,))
        # padded duplicate fill rows (weight 0) must not contribute
        valid = valid & (row_w[:, None] > 0)
        r_mask, r_neg, r_seg1, r_seg2, r_core = jax.random.split(rng, 5)

        mask_flag = (jax.random.uniform(r_mask, (B, L)) < self.mask_ratio) \
            & valid
        masked_seq = jnp.where(mask_flag, self.mask_token, seq)
        neg_items = jnp.where(
            mask_flag, jax.random.randint(r_neg, (B, L), 1, self.n_items),
            seq)

        # SP segments
        half = jnp.maximum(seq_len // 2, 1)
        seg_len = (jax.random.uniform(r_seg1, (B,)) * half).astype(jnp.int32) + 1
        start = (jax.random.uniform(r_seg2, (B,))
                 * jnp.maximum(seq_len - seg_len, 1).astype(jnp.float32)
                 ).astype(jnp.int32)
        pos_idx = jnp.arange(L)[None, :]
        in_seg = (pos_idx >= start[:, None]) \
            & (pos_idx < (start + seg_len)[:, None]) & valid
        masked_segment = jnp.where(in_seg, self.mask_token, seq)
        pos_segment = jnp.where(in_seg, seq,
                                jnp.where(valid, self.mask_token, 0))
        rolled = jnp.roll(seq, 1, axis=0)
        neg_segment = jnp.where(in_seg, jnp.maximum(rolled, 1),
                                jnp.where(valid, self.mask_token, 0))
        return self.pretrain_core(
            params, self.attr_multihot[seq], masked_seq, seq, neg_items,
            masked_segment, pos_segment, neg_segment,
            jnp.clip(seq_len - 1, 0, L - 1), row_w, r_core)

    def calculate_loss(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        if self.train_stage == "pretrain":
            if rng is None:
                rng = jax.random.key(0)
            return self._pretrain_loss(params, seq, seq_len, rng,
                                       batch.get("_weight"))
        out = self.gather_last(
            self._encode(params, seq, seq_len, False, rng), seq_len)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        if self.loss_type == "BPR":
            table = params["item_embedding"]
            neg = batch[self.NEG_ITEM_ID]
            return bpr_loss(jnp.sum(out * table[pos], -1),
                            jnp.sum(out * table[neg], -1), w)
        # CE over the FULL table INCLUDING the mask-token row — the
        # reference's finetune logits use item_embedding.weight whole
        # (s3rec.py:377-379); only full_sort_predict drops the mask row
        logits = jnp.dot(out, params["item_embedding"].T,
                         preferred_element_type=jnp.float32)
        return ce_loss(logits, pos, w)

    def forward(self, params, batch, rng=None):
        return self.gather_last(
            self._encode(params, batch[self.ITEM_SEQ],
                         batch[self.ITEM_SEQ_LEN], False, rng),
            batch[self.ITEM_SEQ_LEN])

    def _item_table(self, params):
        return params["item_embedding"][:self.n_items]

    def predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.sum(out * self._item_table(params)[batch[self.ITEM_ID]], -1)

    def score_items(self, params, batch, items):
        out = self.forward(params, batch)
        return jnp.einsum("bd,bcd->bc", out, self._item_table(params)[items],
                          preferred_element_type=jnp.float32)

    def full_sort_predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.dot(out, self._item_table(params).T,
                       preferred_element_type=jnp.float32)
