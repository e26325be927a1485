"""Batch pipelines — fixed-shape columnar batches for jit.

Parity target: the reference DataLoader hierarchy (recbole/data/dataloader/*),
re-designed for XLA: every batch is a dict of SAME-SHAPE numpy arrays per epoch
(partial batches are padded and masked via ``_weight``), negative sampling and
candidate expansion happen ON DEVICE inside the jitted step (see
sampler/sampler.py), and full-sort evaluation batches are per-user padded
positive sets instead of the reference's swap-index machinery
(general_dataloader.py:300-364).
"""

import numpy as np

from ..utils.enums import InputType


class TrainLoader:
    """Iterates the training split in fixed-size shuffled batches.

    Yields dicts of numpy arrays: all loaded inter fields + ``_weight``
    (1.0 real row / 0.0 padding). Negatives are NOT materialized here — the
    trainer samples them on device (the reference's per-batch Python rejection
    loop, sampler.py:144-153, is the CPU hot spot we remove).
    """

    def __init__(self, config, dataset, batch_size=None, shuffle=True):
        self.config = config
        self.dataset = dataset
        self.batch_size = batch_size or config["train_batch_size"]
        self.shuffle = shuffle
        self.fields = {f: np.asarray(v) for f, v in dataset.inter_feat.items()
                       if not isinstance(v.dtype, object) or v.dtype != object}
        self.n = len(dataset)

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def columns(self):
        """Full training table as columnar numpy arrays — uploaded to device
        ONCE by the scanned-epoch trainer (shuffling and batching then happen
        on device; zero per-step host work)."""
        return dict(self.fields)

    def __iter__(self):
        order = np.random.permutation(self.n) if self.shuffle else np.arange(self.n)
        B = self.batch_size
        for start in range(0, self.n, B):
            idx = order[start:start + B]
            pad = B - len(idx)
            batch = {}
            for f, col in self.fields.items():
                vals = col[idx]
                if pad:
                    vals = np.concatenate([vals, np.zeros(pad, dtype=col.dtype)])
                batch[f] = vals
            w = np.ones(B, dtype=np.float32)
            if pad:
                w[-pad:] = 0.0
            batch["_weight"] = w
            yield batch


class ArrayTrainLoader:
    """Train loader over an explicit columnar table (shared machinery for
    sequential/KG streams). Supports both the scanned-epoch path (columns())
    and per-batch streaming (__iter__)."""

    def __init__(self, config, columns, batch_size=None, shuffle=True,
                 device_transform=None):
        self.config = config
        self.batch_size = batch_size or config["train_batch_size"]
        self.shuffle = shuffle
        self._columns = columns
        self.device_transform = device_transform
        self.n = len(next(iter(columns.values())))

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def columns(self):
        return dict(self._columns)

    def __iter__(self):
        order = np.random.permutation(self.n) if self.shuffle else np.arange(self.n)
        B = self.batch_size
        for start in range(0, self.n, B):
            idx = order[start:start + B]
            pad = B - len(idx)
            batch = {}
            for f, col in self._columns.items():
                vals = col[idx]
                if pad:
                    vals = np.concatenate(
                        [vals, np.zeros((pad,) + col.shape[1:], dtype=col.dtype)])
                batch[f] = vals
            w = np.ones(B, dtype=np.float32)
            if pad:
                w[-pad:] = 0.0
            batch["_weight"] = w
            yield batch


class SeqTransform:
    """Device-side padded-sequence materialization from the global stream:
    replaces the reference's per-row Python `augmentation` loop
    (sequential_dataloader.py:115-146) with one gather inside the jitted step.

    A module-level class (not a closure) so split dataloaders pickle; the
    stream is NOT captured as a jit closure constant (multi-MB XLA literals
    compile pathologically slowly on remote-compile backends) — it rides in
    ``self.consts``, which the trainer threads through the jitted step as an
    argument.
    """

    def __init__(self, item_stream, max_len, seq_field, len_field):
        import jax.numpy as jnp
        self.consts = {"item_stream": jnp.asarray(item_stream)}
        self.max_len = max_len
        self.seq_field = seq_field
        self.len_field = len_field

    def __call__(self, batch, consts):
        import jax.numpy as jnp
        if self.seq_field in batch:
            # sequences already materialized (SequentialTrainLoader.columns)
            return {k: v for k, v in batch.items() if k != "seq_start"}
        stream = consts["item_stream"]
        offs = jnp.arange(self.max_len, dtype=jnp.int32)
        idx = batch["seq_start"][:, None] + offs[None, :]
        valid = offs[None, :] < batch[self.len_field][:, None]
        seq = jnp.where(valid, stream[jnp.where(valid, idx, 0)], 0)
        out = {k: v for k, v in batch.items() if k != "seq_start"}
        out[self.seq_field] = seq
        return out

    def __getstate__(self):
        import numpy as np
        state = dict(self.__dict__)
        state["consts"] = {k: np.asarray(v) for k, v in self.consts.items()}
        return state

    def __setstate__(self, state):
        import jax.numpy as jnp
        self.__dict__.update(state)
        self.consts = {k: jnp.asarray(v) for k, v in state["consts"].items()}


def make_seq_transform(item_stream, max_len, seq_field, len_field):
    return SeqTransform(item_stream, max_len, seq_field, len_field)


class SequentialTrainLoader(ArrayTrainLoader):
    def __init__(self, config, split, batch_size=None):
        iid_f = config["ITEM_ID_FIELD"]
        columns = {
            config["USER_ID_FIELD"]: split.uid,
            "seq_start": split.start,
            config["ITEM_LIST_LENGTH_FIELD"]: split.length,
            iid_f: split.target,
        }
        transform = make_seq_transform(
            split.item_stream, config["MAX_ITEM_LIST_LENGTH"],
            iid_f + config["LIST_SUFFIX"], config["ITEM_LIST_LENGTH_FIELD"])
        super().__init__(config, columns, batch_size,
                         device_transform=transform)
        self.dataset = split
        self._len_field = config["ITEM_LIST_LENGTH_FIELD"]
        self._seq_field = iid_f + config["LIST_SUFFIX"]
        self._max_len = config["MAX_ITEM_LIST_LENGTH"]

    def columns(self):
        """Scanned-epoch table WITH sequences materialized as an (N, L)
        matrix: per-step batch assembly becomes contiguous row gathers.
        The lazy alternative (in-step element gathers from the flat stream,
        SeqTransform) is random-access row-rate bound — measured 730us/step
        (= 12% of the epoch) at ml-1m shape for the 102K-element gather.
        Memory: N*L*4 bytes (196MB at ml-1m), charged against
        scan_epochs_max_bytes by the trainer; the streaming path keeps the
        lazy form."""
        cols = dict(self._columns)
        start = cols.pop("seq_start")
        L = self._max_len
        lens = cols[self._len_field]
        stream = np.asarray(self.dataset.item_stream)
        idx = start[:, None].astype(np.int64) + np.arange(L)[None, :]
        valid = np.arange(L)[None, :] < lens[:, None]
        cols[self._seq_field] = np.where(
            valid, stream[np.clip(idx, 0, len(stream) - 1)], 0
        ).astype(np.int32)
        return cols


class SequentialEvalLoader:
    """Eval batches for sequential splits: one (seq -> target) example per row.

    pos_len is always 1; no history masking (items may repeat — parity:
    SequentialFullDataLoader, sequential_dataloader.py:236-294, history_index
    None) and negative sampling is repeatable.
    """

    mask_history = False
    repeatable_sampling = True

    def __init__(self, config, split, n_items, batch_size=None):
        self.config = config
        self.split = split
        self.n_items = n_items
        self.uid_f = config["USER_ID_FIELD"]
        self.len_f = config["ITEM_LIST_LENGTH_FIELD"]
        self.max_pos = 1
        self.device_transform = make_seq_transform(
            split.item_stream, config["MAX_ITEM_LIST_LENGTH"],
            config["ITEM_ID_FIELD"] + config["LIST_SUFFIX"], self.len_f)
        if batch_size is None:
            # (B, n_items) score-matrix budget ~512MB: catalog-scale item
            # counts otherwise shrink B to ~170 rows and the eval becomes
            # dispatch-bound (601 batches measured at Yelp shape)
            budget = (config["eval_batch_size"] or 4096) * 32768
            batch_size = int(np.clip(budget // max(n_items, 1), 8, 4096))
            batch_size = min(batch_size, max(len(split), 8))
        self.batch_size = batch_size
        self.n = len(split)

    @property
    def n_eval_users(self):
        return self.n

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        B = self.batch_size
        for start in range(0, self.n, B):
            sl = slice(start, min(start + B, self.n))
            cnt = sl.stop - sl.start
            pad = B - cnt

            def padded(a, fill=0):
                out = np.full((B,) + a.shape[1:], fill, dtype=a.dtype)
                out[:cnt] = a[sl]
                return out

            yield {
                self.uid_f: padded(self.split.uid),
                "seq_start": padded(self.split.start),
                self.len_f: np.maximum(padded(self.split.length), 1),
                "pos_items": padded(self.split.target)[:, None],
                "pos_len": np.concatenate([np.ones(cnt, np.int32),
                                           np.zeros(pad, np.int32)]),
                "_mask": np.concatenate([np.ones(cnt, np.float32),
                                         np.zeros(pad, np.float32)]),
            }


class SequentialSampledEvalLoader(SequentialEvalLoader):
    def __init__(self, config, split, n_items, neg_sample_args, batch_size=None):
        self.neg_k = int(neg_sample_args["by"])
        self.distribution = neg_sample_args.get("distribution", "uniform")
        super().__init__(config, split, n_items, batch_size)
        if batch_size is None:
            width = max(1 + self.neg_k, 1)
            budget = (self.config["eval_batch_size"] or 4096) * 4096
            self.batch_size = int(np.clip(budget // width, 4, 4096))
            self.batch_size = min(self.batch_size, max(self.n, 4))

    @property
    def num_candidates(self):
        return 1 + self.neg_k


class RowEvalLoader:
    """Plain row batches for INDIVIDUAL (value-metric) evaluation: AUC/LogLoss/
    MAE/RMSE over (label, prediction) pairs (parity: reference LossEvaluator
    path, evaluators.py:289-367 — CTR protocols are ungrouped, no sampling)."""

    def __init__(self, config, dataset, batch_size=None):
        self.config = config
        self.dataset = dataset
        # rows are a handful of scalars, so the dispatch count — not memory —
        # bounds this path; floor the batch well above the top-k default
        self.batch_size = batch_size or max(config["eval_batch_size"] or 4096,
                                            65536)
        self.fields = {f: np.asarray(v) for f, v in dataset.inter_feat.items()
                       if v.dtype != object}
        self.n = len(dataset)

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        B = self.batch_size
        for start in range(0, self.n, B):
            sl = slice(start, min(start + B, self.n))
            cnt = sl.stop - sl.start
            pad = B - cnt
            batch = {}
            for f, col in self.fields.items():
                out = np.zeros((B,) + col.shape[1:], dtype=col.dtype)
                out[:cnt] = col[sl]
                batch[f] = out
            batch["_mask"] = np.concatenate([np.ones(cnt, np.float32),
                                             np.zeros(pad, np.float32)])
            yield batch


class UserTrainLoader:
    """Batches of bare user ids for autoencoder models (MultiVAE family).

    Parity: UserDataLoader (recbole/data/dataloader/user_dataloader.py:21-62) —
    iterates each training user once per epoch, shuffle forced. The model
    reconstructs the user's interaction row from the train history matrix it
    captured at construction.
    """

    def __init__(self, config, dataset, batch_size=None, shuffle=True):
        self.config = config
        self.dataset = dataset
        self.batch_size = batch_size or config["train_batch_size"]
        uid_field = config["USER_ID_FIELD"]
        self.users = np.unique(np.asarray(dataset.inter_feat[uid_field])) \
            .astype(np.int32)
        self.n = len(self.users)
        self.uid_field = uid_field

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def columns(self):
        return {self.uid_field: self.users}

    def __iter__(self):
        order = np.random.permutation(self.n)
        B = self.batch_size
        for start in range(0, self.n, B):
            idx = order[start:start + B]
            pad = B - len(idx)
            u = self.users[idx]
            w = np.ones(B, dtype=np.float32)
            if pad:
                u = np.concatenate([u, np.zeros(pad, np.int32)])
                w[-pad:] = 0.0
            yield {self.uid_field: u, "_weight": w}


class FullSortEvalLoader:
    """Full-sort ranking evaluation batches.

    Groups the eval split by user; each batch is:
        user_id:  (B,)  int32
        pos_items:(B, P) int32, padded with 0
        pos_len:  (B,)  int32
        _mask:    (B,)  float32 — 0 for padding users

    History masking (items from EARLIER phases must score -inf,
    trainer.py:343-345 in the reference) is applied on device from the
    phase history matrix — not here.
    """

    def __init__(self, config, dataset, n_items, batch_size=None):
        self.config = config
        uid_field = config["USER_ID_FIELD"]
        iid_field = config["ITEM_ID_FIELD"]
        uids = np.asarray(dataset.inter_feat[uid_field])
        iids = np.asarray(dataset.inter_feat[iid_field])
        # positives-only eval: when an explicit label column exists, rank only
        # label==1 rows (labeled-dataset workflows, fork §2.9)
        label_field = config["LABEL_FIELD"]
        if label_field in dataset.inter_feat:
            pos_mask = np.asarray(dataset.inter_feat[label_field]) > 0.5
            uids, iids = uids[pos_mask], iids[pos_mask]

        # per-user padded positives via the shared vectorized grouper
        from .dataset import build_history_matrix
        users = np.unique(uids)
        full_pos, full_len = build_history_matrix(
            uids, iids, int(uids.max()) + 1 if len(uids) else 1)
        self.users = users.astype(np.int32)
        self.pos_items = full_pos[users]
        self.pos_len = full_len[users].astype(np.int32)
        self.max_pos = self.pos_items.shape[1]

        if batch_size is None:
            # scale user-batch so the (B, n_items) score matrix stays ~512MB
            # (64MB measured dispatch-bound at catalog scale), never padding
            # beyond the actual eval-user count
            budget = (config["eval_batch_size"] or 4096) * 32768
            batch_size = int(np.clip(budget // max(n_items, 1), 8, 4096))
            batch_size = min(batch_size, max(len(self.users), 8))
        self.batch_size = batch_size

    def __len__(self):
        return (len(self.users) + self.batch_size - 1) // self.batch_size

    @property
    def n_eval_users(self):
        return len(self.users)

    def __iter__(self):
        B = self.batch_size
        for start in range(0, len(self.users), B):
            sl = slice(start, start + B)
            u = self.users[sl]
            p = self.pos_items[sl]
            l = self.pos_len[sl]
            pad = B - len(u)
            mask = np.ones(B, dtype=np.float32)
            if pad:
                u = np.concatenate([u, np.zeros(pad, np.int32)])
                p = np.concatenate([p, np.zeros((pad, p.shape[1]), np.int32)])
                l = np.concatenate([l, np.zeros(pad, np.int32)])
                mask[-pad:] = 0.0
            yield {"user_id": u, "pos_items": p, "pos_len": l, "_mask": mask}


class DatasetNegEvalLoader:
    """Ranking evaluation against the dataset's OWN labeled negatives.

    Parity target: the fork's GeneralNegFromDatasetDataLoader
    (general_dataloader.py:53-129) — per user, the candidate list is their
    label==1 rows (positives first) followed by their label==0 rows; pos_len
    and user_len come from the data, no sampling.
    """

    mask_history = False

    def __init__(self, config, dataset, n_items, batch_size=None):
        self.config = config
        self.n_items = n_items
        uid_f = config["USER_ID_FIELD"]
        iid_f = config["ITEM_ID_FIELD"]
        label_f = config["LABEL_FIELD"]
        if label_f not in dataset.inter_feat:
            raise ValueError("eval_use_dataset_negatives requires a label "
                             "column in the dataset")
        uids = np.asarray(dataset.inter_feat[uid_f])
        iids = np.asarray(dataset.inter_feat[iid_f])
        labels = np.asarray(dataset.inter_feat[label_f]) > 0.5

        def group(u, i):
            from .dataset import build_history_matrix
            if len(u) == 0:
                return (np.zeros(0, np.int64), np.zeros((0, 1), np.int32),
                        np.zeros(0, np.int32))
            users = np.unique(u)
            mat, lens = build_history_matrix(u, i, int(u.max()) + 1)
            return users, mat[users], lens[users].astype(np.int32)

        pu, pos, plen = group(uids[labels], iids[labels])
        nu, neg, nlen = group(uids[~labels], iids[~labels])
        # align on users with at least one positive (reference keeps all
        # users; pos-less users contribute nothing to grouped metrics)
        neg_of = {int(u): r for r, u in enumerate(nu)}
        nw = neg.shape[1]
        self.users = pu.astype(np.int32)
        self.pos_items, self.pos_len = pos, plen
        self.neg_items = np.zeros((len(pu), nw), np.int32)
        self.neg_len = np.zeros(len(pu), np.int32)
        for r, u in enumerate(pu):
            j = neg_of.get(int(u))
            if j is not None:
                self.neg_items[r] = neg[j]
                self.neg_len[r] = nlen[j]
        self.max_pos = pos.shape[1]
        self.max_neg = nw
        if batch_size is None:
            width = max(self.max_pos + self.max_neg, 1)
            budget = (config["eval_batch_size"] or 4096) * 4096
            batch_size = int(np.clip(budget // width, 4, 4096))
            batch_size = min(batch_size, max(len(self.users), 4))
        self.batch_size = batch_size

    @property
    def n_eval_users(self):
        return len(self.users)

    def __len__(self):
        return (len(self.users) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        B = self.batch_size
        for start in range(0, len(self.users), B):
            sl = slice(start, start + B)
            arrs = {"user_id": self.users[sl], "pos_items": self.pos_items[sl],
                    "pos_len": self.pos_len[sl],
                    "neg_items": self.neg_items[sl],
                    "neg_len": self.neg_len[sl]}
            cnt = len(arrs["user_id"])
            pad = B - cnt
            mask = np.ones(B, np.float32)
            if pad:
                for k2, v in arrs.items():
                    arrs[k2] = np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                mask[-pad:] = 0.0
            arrs["_mask"] = mask
            yield arrs


class SampledEvalLoader(FullSortEvalLoader):
    """Sampled ranking evaluation (uni<k>/pop<k> presets).

    Reference semantics (general_dataloader.py:132-265): each user's candidate
    list = their P positives followed by P*k sampled negatives (k per positive),
    negatives excluding every item the user interacted with in any phase up to
    this one. Negatives are drawn on device per batch.
    """

    def __init__(self, config, dataset, n_items, neg_sample_args, batch_size=None):
        self.neg_k = int(neg_sample_args["by"])
        self.distribution = neg_sample_args.get("distribution", "uniform")
        super().__init__(config, dataset, n_items, batch_size)
        if batch_size is None:
            # candidate width = P*(1+k); keep batch * width bounded, and
            # never pad beyond the real user count
            width = max(self.max_pos * (1 + self.neg_k), 1)
            budget = (self.config["eval_batch_size"] or 4096) * 4096
            self.batch_size = int(np.clip(budget // width, 4, 4096))
            self.batch_size = min(self.batch_size, max(len(self.users), 4))

    @property
    def num_candidates(self):
        return self.max_pos * (1 + self.neg_k)
