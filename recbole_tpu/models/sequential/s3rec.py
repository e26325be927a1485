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
            "aap_w": xavier_normal(ks[4], (D, D)),
            "mip_w": xavier_normal(ks[5], (D, D)),
            "map_w": xavier_normal(ks[6], (D, D)),
            "sp_w": xavier_normal(ks[7], (D, D)),
        }

    # ---------------------------------------------------------------- encoder

    def _encode(self, params, seq, seq_len, bidirectional, rng=None):
        L = seq.shape[1]
        x = params["item_embedding"][seq] \
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
            fused=bool(self.config["fused_attention"]))

    # ---------------------------------------------------------------- losses

    def _bce(self, logits, target):
        return jnp.maximum(logits, 0) - logits * target \
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))

    def _pretrain_loss(self, params, seq, seq_len, rng, row_w=None):
        B, L = seq.shape
        valid = seq != 0
        if row_w is None:
            row_w = jnp.ones((B,))
        # padded duplicate fill rows (weight 0) must not contribute
        valid = valid & (row_w[:, None] > 0)
        r_mask, r_neg, r_seg1, r_seg2, r_segneg, r_enc1, r_enc2, r_enc3, \
            r_enc4 = jax.random.split(rng, 9)

        mask_flag = (jax.random.uniform(r_mask, (B, L)) < self.mask_ratio) \
            & valid
        masked_seq = jnp.where(mask_flag, self.mask_token, seq)
        neg_items = jax.random.randint(r_neg, (B, L), 1, self.n_items)

        out = self._encode(params, masked_seq, seq_len, True, r_enc1)
        feat_emb = params["feature_embedding"]                  # (F, D)

        # AAP — attributes at UNMASKED real positions
        aap_logits = jnp.einsum(
            "bld,fd->blf", jnp.dot(out, params["aap_w"]), feat_emb)
        attr_target = self.attr_multihot[seq]                   # (B, L, F)
        aap = jnp.sum(self._bce(aap_logits, attr_target)
                      * (valid & ~mask_flag)[..., None])

        # MIP — masked item prediction, σ(pos − neg) toward 1
        mip_h = jnp.dot(out, params["mip_w"])
        pos_s = jnp.sum(mip_h * params["item_embedding"][seq], -1)
        neg_s = jnp.sum(mip_h * params["item_embedding"][neg_items], -1)
        # BCE(σ(pos−neg), 1) = −log σ(pos−neg) = softplus(neg−pos)
        mip = jnp.sum(jnp.logaddexp(0.0, neg_s - pos_s) * mask_flag)

        # MAP — attributes at masked positions
        map_logits = jnp.einsum(
            "bld,fd->blf", jnp.dot(out, params["map_w"]), feat_emb)
        map_ = jnp.sum(self._bce(map_logits, attr_target)
                       * mask_flag[..., None])

        # SP — segment prediction
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
        # readout at each sequence's LAST REAL position: sequences here are
        # right-padded, unlike the reference's left-padded pretrain rows
        ctx = self.gather_last(
            self._encode(params, masked_segment, seq_len, True, r_enc2),
            seq_len)
        pos_emb = self.gather_last(
            self._encode(params, pos_segment, seq_len, True, r_enc3),
            seq_len)
        neg_emb = self.gather_last(
            self._encode(params, neg_segment, seq_len, True, r_enc4),
            seq_len)
        sp_h = jnp.dot(ctx, params["sp_w"])
        sp = jnp.sum(jnp.logaddexp(
            0.0, jnp.sum(sp_h * neg_emb, -1)
            - jnp.sum(sp_h * pos_emb, -1)) * row_w)

        n_real = jnp.maximum(jnp.sum(row_w), 1.0)
        return (self.aap_weight * aap + self.mip_weight * mip
                + self.map_weight * map_ + self.sp_weight * sp) / n_real

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
        table = params["item_embedding"][:self.n_items]
        if self.loss_type == "BPR":
            neg = batch[self.NEG_ITEM_ID]
            return bpr_loss(jnp.sum(out * table[pos], -1),
                            jnp.sum(out * table[neg], -1), w)
        logits = jnp.dot(out, table.T, preferred_element_type=jnp.float32)
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
