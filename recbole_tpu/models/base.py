"""Model base classes — functional JAX design.

Parity target: reference AbstractRecommender + category bases
(recbole/model/abstract_recommender.py:26-412). Contract kept name-for-name
(calculate_loss / predict / full_sort_predict) but re-shaped functionally:
a model instance holds only STATIC configuration (sizes, hyperparams); learnable
state lives in a params pytree created by ``init_params(rng)`` and threaded
through the pure methods. This is what lets the trainer jit/pjit one step over
a device mesh with donated buffers.

Batch convention: a dict of jnp arrays keyed by field name. The trainer adds
``neg_<iid>`` columns for pairwise models and a ``_weight`` column that masks
padding rows (all batches are fixed-shape; partial batches are padded).
"""

import jax.numpy as jnp

from ..utils.enums import ModelType, InputType


class AbstractRecommender:
    type = ModelType.GENERAL
    input_type = InputType.POINTWISE
    default_config: dict = {}

    def __init__(self, config, dataset):
        self.config = config
        self.compute_dtype = jnp.dtype(config["compute_dtype"] or "float32")

    # -- functional contract --------------------------------------------------

    def init_params(self, rng):
        """Create the learnable params pytree."""
        raise NotImplementedError

    def calculate_loss(self, params, batch, rng=None):
        """Scalar training loss (or tuple of named parts, summed by the trainer;
        parity: reference tuple-loss handling, trainer.py:162-168)."""
        raise NotImplementedError

    def predict(self, params, batch):
        """(B,) score of each (user, item) row."""
        raise NotImplementedError

    def full_sort_predict(self, params, batch):
        """(B, n_items) scores of every item for each row's user. Optional —
        the trainer falls back to chunked ``predict`` when absent."""
        raise NotImplementedError

    def score_items(self, params, batch, items):
        """(B, C) scores of candidate ``items`` for each row. Default flattens
        to ``predict``; models with a cheap representation (one user/seq vector
        dotted with item embeddings) override this to avoid C-fold repeats."""
        import jax.numpy as jnp
        B, C = items.shape
        flat = {k: (v if v.ndim == 0 else jnp.repeat(v, C, axis=0))
                for k, v in batch.items()}
        flat[self.config["ITEM_ID_FIELD"]] = items.reshape(-1)
        return self.predict(params, flat).reshape(B, C)

    def num_params(self, params):
        import jax
        return sum(p.size for p in jax.tree.leaves(params))

    def __str__(self):
        return self.__class__.__name__


class GeneralRecommender(AbstractRecommender):
    type = ModelType.GENERAL

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.USER_ID = config["USER_ID_FIELD"]
        self.ITEM_ID = config["ITEM_ID_FIELD"]
        self.NEG_ITEM_ID = config["NEG_PREFIX"] + self.ITEM_ID
        self.LABEL = config["LABEL_FIELD"]
        self.n_users = dataset.user_num
        self.n_items = dataset.item_num


class SequentialRecommender(AbstractRecommender):
    type = ModelType.SEQUENTIAL

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.USER_ID = config["USER_ID_FIELD"]
        self.ITEM_ID = config["ITEM_ID_FIELD"]
        self.ITEM_SEQ = self.ITEM_ID + config["LIST_SUFFIX"]
        self.ITEM_SEQ_LEN = config["ITEM_LIST_LENGTH_FIELD"]
        self.POS_ITEM_ID = self.ITEM_ID
        self.NEG_ITEM_ID = config["NEG_PREFIX"] + self.ITEM_ID
        self.max_seq_length = config["MAX_ITEM_LIST_LENGTH"]
        self.n_items = dataset.item_num
        self.n_users = dataset.user_num

    @staticmethod
    def gather_last(seq_output, seq_len):
        """Hidden state at the last real position of each sequence
        (parity: gather_indexes, abstract_recommender.py:117-121)."""
        idx = jnp.clip(seq_len - 1, 0, seq_output.shape[1] - 1)
        return jnp.take_along_axis(
            seq_output, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]

    # -- default scoring for models that expose forward() -> (B, D) and score
    #    items by dot with params[item_embedding_key] (the common pattern
    #    across the reference's sequential catalog) ---------------------------

    item_embedding_key = "item_embedding"

    def forward(self, params, batch, rng=None):
        raise NotImplementedError

    def _item_table(self, params):
        return params[self.item_embedding_key]

    def calculate_loss(self, params, batch, rng=None):
        from .losses import bpr_loss, ce_loss
        out = self.forward(params, batch, rng)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        table = self._item_table(params)
        if getattr(self, "loss_type", "CE") == "BPR":
            neg = batch[self.NEG_ITEM_ID]
            return bpr_loss(jnp.sum(out * table[pos], -1),
                            jnp.sum(out * table[neg], -1), w)
        logits = jnp.dot(out, table.T, preferred_element_type=jnp.float32)
        return ce_loss(logits, pos, w)

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

    def full_sort_query(self, params, batch):
        """(query (B, D), item_table (N, D)) for models whose full-sort is a
        plain dot product — lets the trainer fuse scoring + masking + top-k
        (bf16 MXU path / Pallas streaming kernel) without the (B, N) matrix."""
        return self.forward(params, batch), self._item_table(params)


class KnowledgeRecommender(AbstractRecommender):
    type = ModelType.KNOWLEDGE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.USER_ID = config["USER_ID_FIELD"]
        self.ITEM_ID = config["ITEM_ID_FIELD"]
        self.NEG_ITEM_ID = config["NEG_PREFIX"] + self.ITEM_ID
        self.LABEL = config["LABEL_FIELD"]
        self.ENTITY_ID = config["ENTITY_ID_FIELD"]
        self.RELATION_ID = config["RELATION_ID_FIELD"]
        self.HEAD_ENTITY_ID = config["HEAD_ENTITY_ID_FIELD"]
        self.TAIL_ENTITY_ID = config["TAIL_ENTITY_ID_FIELD"]
        self.NEG_TAIL_ENTITY_ID = config["NEG_PREFIX"] + self.TAIL_ENTITY_ID
        self.n_users = dataset.user_num
        self.n_items = dataset.item_num
        self.n_entities = dataset.entity_num
        self.n_relations = dataset.relation_num
