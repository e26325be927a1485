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

import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp

from ..utils.enums import ModelType, InputType

_CONST_CTX = threading.local()


class ConstRef:
    """Handle for a model device constant that must NOT become a jit literal.

    Multi-MB literals baked into jit closures compile pathologically slowly
    (85-131s measured for a 2.3MB array on the remote compile service vs
    <1s as an argument). Constants registered via
    ``AbstractRecommender.register_const`` are stored under
    ``params["_const"]`` (the trainer masks that subtree out of the
    optimizer) and, while the trainer has them bound, this handle resolves
    to the TRACED array from params. Outside a binding (host-side use,
    direct calls in tests) it falls back to the concrete array.
    """

    __array_priority__ = 100

    def __init__(self, name, value):
        self.name = name
        self.value = value
        self.shape = value.shape
        self.dtype = value.dtype
        self.ndim = value.ndim

    def _resolve(self):
        ctx = getattr(_CONST_CTX, "mapping", None)
        if ctx is not None and self.name in ctx:
            return ctx[self.name]
        return self.value

    def __jax_array__(self):
        return self._resolve()

    def __getitem__(self, idx):
        return self._resolve()[idx]

    @property
    def T(self):
        return self._resolve().T

    def astype(self, dtype):
        return self._resolve().astype(dtype)

    def __mul__(self, other):
        return self._resolve() * other

    def __rmul__(self, other):
        return other * self._resolve()

    def __add__(self, other):
        return self._resolve() + other

    def __radd__(self, other):
        return other + self._resolve()


class AbstractRecommender:
    type = ModelType.GENERAL
    input_type = InputType.POINTWISE
    default_config: dict = {}

    # param keys whose row 0 is a [PAD] entry the reference declares with
    # torch's Embedding(padding_idx=0): zeroed at init (zero_pad_rows) and
    # grad-pinned by the trainer so it never trains
    pad_zero_params: tuple = ()

    def zero_pad_rows(self, params):
        """Zero row 0 of every pad_zero_params table (torch zeroes the
        padding_idx row at construction regardless of the initializer)."""
        for k in self.pad_zero_params:
            if k in params:
                params[k] = params[k].at[0].set(0.0)
        return params

    # "auto" compute_dtype resolution per model family: conservative fp32
    # for the base; MXU-heavy families (sequential towers) override to
    # bfloat16 on TPU. Explicit config values always win.
    _auto_compute_dtype = "float32"

    def __init__(self, config, dataset):
        self.config = config
        dtype = config["compute_dtype"] or "auto"
        if str(dtype).lower() == "auto":
            dtype = self._auto_compute_dtype
            if dtype != "float32":
                import jax as _jax
                if _jax.default_backend() not in ("tpu", "axon"):
                    dtype = "float32"  # bit-exact parity off-TPU
        self.compute_dtype = jnp.dtype(dtype)
        # None when fp32 so layers skip the cast entirely (see layers.dot_c)
        self.cdt = (None if self.compute_dtype == jnp.float32
                    else self.compute_dtype)
        self._registered_consts = {}

    # -- device constants -----------------------------------------------------

    def register_const(self, name, value):
        """Store a device constant for params["_const"] routing (see
        ConstRef). Returns the handle to assign to the model attribute."""
        arr = jnp.asarray(value)
        self._registered_consts[name] = arr
        return ConstRef(name, arr)

    @contextmanager
    def bind_consts(self, mapping):
        """Make registered constants resolve to ``mapping`` entries (the
        traced params["_const"] subtree) for the duration of a traced call."""
        old = getattr(_CONST_CTX, "mapping", None)
        _CONST_CTX.mapping = mapping
        try:
            yield
        finally:
            _CONST_CTX.mapping = old

    def attach_consts(self, params):
        """Merge registered constants into params (called by the trainer
        after init_params; also usable directly in tests)."""
        if self._registered_consts:
            const = dict(params.get("_const", {}))
            # copies, not the registry arrays: params are donated into the
            # jitted step, which would delete the registry's buffers and
            # break host-side fallback reads
            const.update({k: jnp.copy(v)
                          for k, v in self._registered_consts.items()})
            params = dict(params)
            params["_const"] = const
        return params

    def consts_of(self, params):
        """The stop-gradient'd binding mapping for a params pytree."""
        sub = params.get("_const", {}) if isinstance(params, dict) else {}
        return jax.tree.map(jax.lax.stop_gradient, sub)

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

    # models whose per-pair predict carries heavy per-item state (sampled
    # neighbor trees, label propagation) set this to bound the number of
    # (user, item) pairs alive at once; None = flatten everything
    score_pair_block = None

    def score_items(self, params, batch, items):
        """(B, C) scores of candidate ``items`` for each row. Default flattens
        to ``predict``; models with a cheap representation (one user/seq vector
        dotted with item embeddings) override this to avoid C-fold repeats."""
        import jax
        import jax.numpy as jnp
        B, C = items.shape
        if self.score_pair_block:
            uid_f = self.config["USER_ID_FIELD"]
            flat_u = jnp.repeat(batch[uid_f], C, axis=0)
            flat_i = items.reshape(-1)
            P = B * C
            pb = int(self.score_pair_block)
            n_pb = -(-P // pb)
            fu = jnp.pad(flat_u, (0, n_pb * pb - P))
            fi = jnp.pad(flat_i, (0, n_pb * pb - P))
            out = jax.lax.map(
                lambda uv: self._pair_scores(params, uv[0], uv[1]),
                (fu.reshape(n_pb, pb), fi.reshape(n_pb, pb)))
            return out.reshape(-1)[:P].reshape(B, C)
        flat = {k: (v if v.ndim == 0 else jnp.repeat(v, C, axis=0))
                for k, v in batch.items()}
        flat[self.config["ITEM_ID_FIELD"]] = items.reshape(-1)
        return self.predict(params, flat).reshape(B, C)

    def _pair_scores(self, params, users, items):
        """(P,) scores for aligned (user, item) pairs — the hook
        ``score_pair_block`` models implement (ranking scores, so no
        sigmoid needed)."""
        raise NotImplementedError

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

    def init_history(self, dataset, max_len=None):
        """Register the per-user train-history table (shared by the
        autoencoder family: MultiVAE/DAE, MacridVAE, RaCT, RecVAE, CDAE)."""
        hist, hlen = dataset.history_item_matrix(max_len)
        self.hist = self.register_const("hist", hist)
        self.hlen = self.register_const("hlen", hlen)

    def _rating_matrix(self, user):
        """Multi-hot train rows rebuilt on device: (B, n_items); PAD col 0
        forced to zero. Requires init_history()."""
        B = user.shape[0]
        h = self.hist[user]
        valid = jnp.arange(h.shape[1])[None, :] < self.hlen[user][:, None]
        x = jnp.zeros((B, self.n_items), jnp.float32)
        x = x.at[jnp.arange(B)[:, None], h].max(valid.astype(jnp.float32))
        return x.at[:, 0].set(0.0)


class SequentialRecommender(AbstractRecommender):
    type = ModelType.SEQUENTIAL
    # transformer/GRU towers run bfloat16 on the MXU by default (fp32
    # accumulation everywhere via preferred_element_type; embeddings, layer
    # norms and losses stay fp32). A/B metric parity is gated by
    # tests/test_aux.py::test_seq_bf16_training_matches_f32 and the PARITY.md
    # quality A/B rows. Set compute_dtype: float32 to opt out.
    _auto_compute_dtype = "bfloat16"

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

    def embed_seq(self, params, ids, key="item_embedding"):
        """Input-sequence embedding lookup, params[key][ids], with a
        scatter-free backward: the (B, L) gather's gradient is the
        one-hot-matmul dense accumulation of ops/embed_grad.py instead of
        XLA's row-serialized scatter-add (~67ns/row * B*L rows dominated
        the sequential train step). Values identical to a plain gather;
        the backward is an exact reordering (f32 accumulate, hi/lo split
        for f32 cotangents)."""
        table = params[key]
        if jax.default_backend() not in ("tpu", "axon"):
            return table[ids]        # CPU: XLA's scatter backward wins there
        from ..ops.embed_grad import take_rows_dense_grad
        return take_rows_dense_grad(table.shape[0], table, ids)

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
