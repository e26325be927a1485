"""Trainer: jitted train/eval steps + host-side fit loop.

Parity target: reference Trainer (recbole/trainer/trainer.py:62-452) — optimizer
factory, epoch loop with periodic validation, patience-based early stopping,
checkpointing on improvement, NaN-loss detection, tuple losses, gradient
clipping, full-sort + sampled evaluation.

TPU re-design:
  * ONE jitted ``train_step(params, opt_state, rng, batch)`` with donated
    buffers; negative sampling and pointwise/pairwise batch expansion happen
    inside it (device-side), so the host only streams raw positive rows.
  * Evaluation is a jitted per-batch reduction: scores -> top-k -> (K,) metric
    partial sums. Only scalars cross back to the host (the reference ships
    whole top-k matrices to numpy, evaluators.py:53-76).
  * Trainer variants (KG alternation, two-stage pretrain, alternating
    optimizers) are loop policies over the same step machinery, not copies.
"""

import os
import pickle
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..utils.enums import InputType, ModelType
from ..utils.logger import get_logger, get_local_time, set_color
from ..utils.utils import early_stopping, calculate_valid_score, dict2str, ensure_dir
from ..evaluator.evaluator import topk_metric_sums, TopKCollector, ValueCollector
from ..sampler.sampler import sample_negatives, sample_negatives_unchecked
from ..data.loaders import FullSortEvalLoader, SampledEvalLoader, TrainLoader

NEG_INF = -1e15


def build_optimizer(config):
    """adam/sgd/adagrad/rmsprop + optional decoupled weight decay
    (parity: _build_optimizer, trainer.py:109-130)."""
    lr = config["learning_rate"]
    name = str(config["learner"]).lower()
    from .lazy_adam import lazy_adam
    opts = {
        "adam": lambda: optax.adam(lr),
        # torch.optim.SparseAdam semantics (reference trainer.py:123):
        # untouched rows keep moments un-decayed and values un-stepped
        "sparse_adam": lambda: lazy_adam(lr),
        "adamw": lambda: optax.adamw(lr),
        "sgd": lambda: optax.sgd(lr),
        "adagrad": lambda: optax.adagrad(lr),
        "rmsprop": lambda: optax.rmsprop(lr),
    }
    if name not in opts:
        get_logger().warning("Unknown learner %r, falling back to adam", name)
        name = "adam"
    tx = opts[name]()
    chain = []
    if config["clip_grad_norm"]:
        args = config["clip_grad_norm"]
        max_norm = args.get("max_norm", 5.0) if isinstance(args, dict) else float(args)
        chain.append(optax.clip_by_global_norm(max_norm))
    if config["weight_decay"]:
        if name == "sparse_adam":
            # Parity: reference warns and DROPS weight_decay for SparseAdam
            # (trainer.py:123-126). Decay would also make every gradient row
            # nonzero, defeating lazy_adam's touched-row mask (rows with
            # g == 0 must stay bit-identical).
            get_logger().warning(
                "sparse_adam does not support weight_decay; ignoring it")
        else:
            chain.append(optax.add_decayed_weights(config["weight_decay"]))
    chain.append(tx)
    return optax.chain(*chain)


class Trainer:
    default_train_mode = "rs"

    def __init__(self, config, model):
        self.config = config
        self.model = model
        self.logger = get_logger()
        self.optimizer = build_optimizer(config)
        self.epochs = config["epochs"]
        self.eval_step = min(config["eval_step"], self.epochs) or 1
        self.stopping_step = config["stopping_step"]
        self.valid_metric = config["valid_metric"]
        self.valid_metric_bigger = config["valid_metric_bigger"]
        self.checkpoint_dir = config["checkpoint_dir"]
        self.saved_model_file = os.path.join(
            self.checkpoint_dir,
            f"{config['model']}-{get_local_time()}.ckpt")
        self.best_valid_score = None
        self.best_valid_result = None
        self.start_epoch = 0
        self.cur_step = 0
        self.global_step = 0
        self.params = None
        self.opt_state = None
        self.train_loss_dict = {}
        self._modes = {}
        self._eval_step_cache = {}
        # wall-clock per phase, for the profiled-run summary (parity: the
        # fork prints a profiler key-averages table, quick_start.py:57-61)
        self.epoch_times = []
        self.eval_times = []

        # optional multi-chip sharding (no reference equivalent; SURVEY.md §2.10)
        self.plan = None
        if config["mesh_shape"]:
            from ..parallel.mesh import make_mesh, ShardingPlan
            mesh = make_mesh(config["mesh_shape"])
            self.plan = ShardingPlan(mesh, config["shard_item_embeddings"])
            self.logger.info("sharding over mesh %s", dict(mesh.shape))
        # models consult the active plan at trace time (sharded CTR lookups);
        # always set it so a mesh-less trainer clears a predecessor's plan
        from ..parallel.mesh import set_active_plan
        set_active_plan(self.plan)

        seed = config["seed"] or 0
        self.rng = jax.random.key(seed, impl=config["prng_impl"] or "rbg")

    # ------------------------------------------------------------- train step

    def _make_kg_augment(self, train_data, include_rec):
        """KG-stream batch shaping: sample 1 negative tail per triple,
        excluding the head's known tails (parity: KGSampler, sampler.py:268-338).
        When include_rec, kg fields are ADDED onto a rec batch (RSKG zip mode,
        knowledge_dataloader.py:183-190 — we draw random kg rows instead of
        restarting a shuffled stream; same distribution over an epoch)."""
        cfg = self.config
        head_f = cfg["HEAD_ENTITY_ID_FIELD"]
        rel_f = cfg["RELATION_ID_FIELD"]
        tail_f = cfg["TAIL_ENTITY_ID_FIELD"]
        neg_tail_f = cfg["NEG_PREFIX"] + tail_f
        rounds = cfg["neg_sampling_resample_rounds"]
        consts = {
            "kg_cols": {f: jnp.asarray(v)
                        for f, v in train_data.kg_columns.items()},
            "kg_head_hist": jnp.asarray(train_data.kg_head_history[0]),
            "kg_head_hlen": jnp.asarray(train_data.kg_head_history[1]),
        }
        n_entities = train_data.n_entities
        n_kg = int(train_data.kg_columns[head_f].shape[0])

        def kg_augment(batch, rng, consts):
            rng, kidx, kneg = jax.random.split(rng, 3)
            if include_rec:
                B = batch["_weight"].shape[0]
                idx = jax.random.randint(kidx, (B,), 0, n_kg, dtype=jnp.int32)
                out = dict(batch)
                for f, col in consts["kg_cols"].items():
                    out[f] = col[idx]
            else:
                out = dict(batch)
            negs = sample_negatives(kneg, out[head_f], consts["kg_head_hist"],
                                    consts["kg_head_hlen"],
                                    n_entities, 1, rounds=rounds)
            out[neg_tail_f] = negs[:, 0]
            return out

        return kg_augment, consts

    def _make_rec_augment(self, train_data):
        model = self.model
        cfg = self.config
        neg_args = cfg["train_neg_sample_args"]
        k = int(neg_args.get("by") or 0) if neg_args["strategy"] == "by" else 0
        rounds = cfg["neg_sampling_resample_rounds"]
        input_type = model.input_type
        uid_f = cfg["USER_ID_FIELD"]
        iid_f = cfg["ITEM_ID_FIELD"]
        label_f = cfg["LABEL_FIELD"]

        if uid_f is None or iid_f is None:
            # pure-feature CTR protocol (Criteo/Avazu: USER_ID_FIELD: ~) —
            # labeled rows pass through untouched; nothing to sample against
            transform = getattr(train_data, "device_transform", None)
            consts = dict(transform.consts) if transform is not None else {}

            def augment(batch, rng, consts):
                if transform is not None:
                    batch = transform(batch, consts)
                return batch

            return augment, consts

        neg_f = cfg["NEG_PREFIX"] + iid_f

        t_hist, t_hlen = train_data.phase_history.device_tables("train")
        n_items = train_data.n_items
        # sequential models sample without used-id exclusion — items may repeat
        # in a history (parity: RepeatableSampler, sampler.py:341-420)
        repeatable = model.type is ModelType.SEQUENTIAL
        if k > 0 and not repeatable and not cfg["train_use_dataset_negatives"]:
            train_data.phase_history.assert_sampleable("train")
        transform = getattr(train_data, "device_transform", None)
        # device tables ride in the consts argument, NOT jit closures —
        # multi-MB XLA literals compile pathologically slowly (85s vs <1s
        # measured for a 2.3MB literal on the remote compile service)
        consts = {"hist": t_hist, "hlen": t_hlen}
        if transform is not None:
            consts.update(transform.consts)
        has_pop = neg_args.get("distribution") == "popularity"
        if has_pop:
            consts["pop"] = jnp.asarray(
                train_data.phase_history.pop_items["train"])

        use_dataset_negs = cfg["train_use_dataset_negatives"]
        bothway = cfg["train_use_bothway_sampler"]
        k3 = max(int(round(k / 3)), 1) if bothway else 0

        def augment(batch, rng, consts):
            """Device-side batch shaping (parity: NegSampleByMixin semantics,
            neg_sample_mixin.py:104-124; fork variants data/utils.py:244-252)."""
            hist, hlen = consts["hist"], consts["hlen"]
            pop = consts.get("pop") if has_pop else None
            if transform is not None:
                batch = transform(batch, consts)
            if use_dataset_negs or k == 0 \
                    or input_type is InputType.LISTWISE:
                # labeled rows used as-is (fork GeneralNegFromDatasetDataLoader)
                return batch
            if bothway:
                # fork GeneralNegSampleBothWaysDataloader
                # (custom_dataloaders.py:16-44): label-1 rows get k sampled
                # negatives (label 0); label-0 rows get round(k/3) sampled
                # pseudo-positives (label 1). Fixed shapes: both expansions
                # are emitted for every row and gated by _weight.
                B = batch[uid_f].shape[0]
                label = batch[label_f].astype(jnp.float32)
                w = batch.get("_weight", jnp.ones(B))
                r1, r2 = jax.random.split(rng)
                negs = sample_negatives(r1, batch[uid_f], hist, hlen,
                                        n_items, k, rounds=rounds)
                pseudo = sample_negatives(r2, batch[uid_f], hist, hlen,
                                          n_items, k3, rounds=rounds)
                out = {}
                for f, v in batch.items():
                    if v.ndim == 0:
                        out[f] = v
                        continue
                    reps = jnp.concatenate(
                        [v] + [v] * k + [v] * k3, axis=0)
                    out[f] = reps
                out[iid_f] = jnp.concatenate(
                    [batch[iid_f], negs.T.reshape(-1), pseudo.T.reshape(-1)])
                out[label_f] = jnp.concatenate(
                    [label, jnp.zeros(B * k), jnp.ones(B * k3)])
                out["_weight"] = jnp.concatenate(
                    [w, jnp.tile(w * label, k), jnp.tile(w * (1 - label), k3)])
                return out
            if repeatable:
                negs = sample_negatives_unchecked(
                    rng, (batch[uid_f].shape[0], k), n_items, pop_items=pop)
            else:
                negs = sample_negatives(rng, batch[uid_f], hist, hlen, n_items, k,
                                        rounds=rounds, pop_items=pop)
            if input_type is InputType.PAIRWISE:
                if k == 1:
                    out = dict(batch)
                    out[neg_f] = negs[:, 0]
                    return out
                # each positive row repeated k times, one negative each
                out = {f: (v if v.ndim == 0 else jnp.repeat(v, k, axis=0))
                       for f, v in batch.items()}
                out[neg_f] = negs.reshape(-1)
                return out
            # POINTWISE: originals (label from data or 1) + k negatives (label 0)
            B = batch[uid_f].shape[0]
            out = {}
            for f, v in batch.items():
                if v.ndim == 0:
                    out[f] = v
                elif f == iid_f:
                    out[f] = jnp.concatenate([v, negs.T.reshape(-1)])
                elif f == label_f:
                    out[f] = jnp.concatenate([v, jnp.zeros(B * k, v.dtype)])
                else:
                    out[f] = jnp.concatenate([v] + [v] * k, axis=0)
            if label_f not in batch:
                w = batch.get("_weight")
                pos_label = jnp.ones(B, jnp.float32) if w is None else w
                out[label_f] = jnp.concatenate([pos_label, jnp.zeros(B * k)])
            return out

        return augment, consts

    # ---------------------------------------------------------- fused adam
    # The optax update/apply split compiles to ~4 separate full passes over
    # every big embedding table (round-5 xplane: multiply_add_fusion x4 =
    # 1.74 ms/step on Criteo's (2.57M, 11) table — ~2x the single-pass
    # bandwidth floor). When the configured optimizer is exactly adam (no
    # clip, no weight decay), the step inlines the whole update —
    # m/v/bias-correct/p-apply — as one expression per leaf so XLA emits
    # one read-modify-write sweep. Same math, same defaults as optax.adam
    # (b1 .9, b2 .999, eps 1e-8); state is {count, mu, nu} keyed like
    # params minus the _const subtree. RECBOLE_TPU_NO_FUSED_ADAM=1 opts
    # out (falls back to the optax path).

    ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8

    def _use_fused_adam(self):
        return (self.config["learner"] == "adam"
                and not self.config["clip_grad_norm"]
                and not self.config["weight_decay"]
                and not os.environ.get("RECBOLE_TPU_NO_FUSED_ADAM"))

    def _fused_adam_init(self, params):
        zeros = {k: jax.tree.map(jnp.zeros_like, v)
                 for k, v in params.items() if k != "_const"}
        return {"count": jnp.zeros((), jnp.int32), "mu": zeros,
                "nu": jax.tree.map(jnp.zeros_like, zeros)}

    def _fused_adam_apply(self, params, opt_state, grads):
        lr = self.config["learning_rate"]
        b1, b2, eps = self.ADAM_B1, self.ADAM_B2, self.ADAM_EPS
        count = opt_state["count"] + 1
        t = count.astype(jnp.float32)
        c1 = 1.0 / (1.0 - b1 ** t)
        c2 = 1.0 / (1.0 - b2 ** t)

        from ..ops.fused_adam import adam_kernel_supported, adam_leaf_kernel

        def leaf(p, m, v, g):
            if adam_kernel_supported(p):
                # big 2D tables: ONE Pallas read-modify-write sweep with
                # in-place aliasing — the XLA expression below still
                # compiles to 3 passes (divide_subtract_fusion x3,
                # round-5 trace), each re-reading the operands
                return adam_leaf_kernel(p, m, v, g, c1, c2,
                                        b1=b1, b2=b2, lr=lr, eps=eps)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * g * g
            p2 = p - lr * (m2 * c1) / (jnp.sqrt(v2 * c2) + eps)
            return p2, m2, v2

        params2, mu2, nu2 = {}, {}, {}
        for k, sub in params.items():
            if k == "_const":
                params2[k] = sub
                continue
            out = jax.tree.map(leaf, sub, opt_state["mu"][k],
                               opt_state["nu"][k], grads[k],
                               is_leaf=lambda x: isinstance(x, jax.Array))
            params2[k] = jax.tree.map(lambda o: o[0], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
            mu2[k] = jax.tree.map(lambda o: o[1], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
            nu2[k] = jax.tree.map(lambda o: o[2], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
        return params2, {"count": count, "mu": mu2, "nu": nu2}

    def _make_step_core(self, augment, loss_method, optimizer=None):
        fused_adam = optimizer is None and getattr(self, "_fused_adam", False)
        optimizer = optimizer or self.optimizer

        def step_core(params, opt_state, rng, batch, consts):
            rng, k_neg, k_loss = jax.random.split(rng, 3)
            batch = augment(batch, k_neg, consts)

            def loss_fn(p):
                with self.model.bind_consts(self.model.consts_of(p)):
                    out = loss_method(p, batch, k_loss)
                if isinstance(out, tuple):
                    return sum(out), jnp.stack(out)
                return out, jnp.stack([out])

            # allow_int: params["_const"] may hold integer id tables (their
            # grads are float0 and the masked optimizer zeroes them anyway);
            # float0 leaves are re-materialized as float32 zeros because
            # optax transforms cannot consume float0
            (loss, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True)(params)
            grads = jax.tree.map(
                lambda g: (jnp.zeros(g.shape, jnp.float32)
                           if g.dtype == jax.dtypes.float0 else g), grads)
            # torch's Embedding(padding_idx=0) never updates row 0; models
            # list those tables in pad_zero_params so the [PAD] row stays
            # exactly zero (and Adam moments stay zero) here too
            for k in getattr(self.model, "pad_zero_params", ()):
                if k in grads:
                    grads[k] = grads[k].at[0].set(0.0)
            if fused_adam:
                params2, opt_state2 = self._fused_adam_apply(
                    params, opt_state, grads)
            else:
                updates, opt_state2 = optimizer.update(
                    grads, opt_state, params)
                params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, rng, loss, parts

        return step_core

    def _make_epoch_fn(self, step_core, loader):
        """Whole-epoch device program: on-device shuffle + lax.scan over fixed
        batches. The training table is uploaded once and stays HBM-resident;
        the host issues ONE dispatch per epoch (the per-step dispatch latency
        of a remote/tunneled accelerator would otherwise dominate small
        models).

        Under a mesh the uploaded table is sharded over "data" and each
        scanned batch is constrained back to P("data"), so the inner step
        runs data-parallel with XLA inserting the gradient all-reduce."""
        B = loader.batch_size
        N = loader.n
        steps = -(-N // B)
        Npad = steps * B
        shuffle = getattr(loader, "shuffle", True)
        plan = self.plan
        batch_sharding = None
        if plan is not None and B % plan.mesh.shape["data"] == 0:
            batch_sharding = plan.batch_spec()

        @partial(jax.jit, donate_argnums=(0, 1), static_argnums=())
        def epoch_fn(params, opt_state, rng, step0, data, consts):
            rng, kperm = jax.random.split(rng)
            if shuffle:
                perm = jax.random.permutation(kperm, Npad)
            else:
                perm = jnp.arange(Npad)

            def body(carry, idxs):
                params, opt_state, rng, step = carry
                valid = idxs < N
                idx = jnp.where(valid, idxs, 0)
                batch = {f: v[idx] for f, v in data.items()}
                batch["_weight"] = valid.astype(jnp.float32)
                if batch_sharding is not None:
                    batch = {f: (jax.lax.with_sharding_constraint(
                                     v, batch_sharding)
                                 if v.ndim >= 1 else v)
                             for f, v in batch.items()}
                batch["_step"] = step
                params, opt_state, rng, _, parts = step_core(
                    params, opt_state, rng, batch, consts)
                return (params, opt_state, rng, step + 1), parts

            (params, opt_state, rng, step), parts = jax.lax.scan(
                body, (params, opt_state, rng, step0),
                perm.reshape(steps, B))
            return params, opt_state, rng, step, jnp.sum(parts, axis=0)

        return epoch_fn, steps

    def _build_mode(self, train_data, mode="rs"):
        """Build the jitted step (and scan program when the table fits HBM)
        for one training mode:
          rs   — rec batches, calculate_loss
          kg   — kg-triple batches + neg tails, calculate_kg_loss
          rskg — rec batches with kg fields zipped in, calculate_loss
        (parity: KGDataLoaderState, enum_type.py:45-55). Modes are the
        loop-policy mechanism behind the reference's trainer subclasses."""
        if mode in self._modes:
            return self._modes[mode]
        model = self.model
        if mode == "rs":
            loader = train_data
            augment, consts = self._make_rec_augment(train_data)
            loss_method = model.calculate_loss
        elif mode == "kg":
            from ..data.loaders import ArrayTrainLoader
            loader = ArrayTrainLoader(self.config, train_data.kg_columns)
            augment, consts = self._make_kg_augment(train_data,
                                                    include_rec=False)
            loss_method = model.calculate_kg_loss
        elif mode == "rskg":
            loader = train_data
            rec_aug, rec_consts = self._make_rec_augment(train_data)
            kg_aug, kg_consts = self._make_kg_augment(train_data,
                                                      include_rec=True)
            consts = {**rec_consts, **kg_consts}

            def augment(batch, rng, consts):
                r1, r2 = jax.random.split(rng)
                return kg_aug(rec_aug(batch, r1, consts), r2, consts)
            loss_method = model.calculate_loss
        elif mode == "rs_only_loss":
            loader = train_data
            augment, consts = self._make_rec_augment(train_data)
            loss_method = model.calculate_rs_loss
        else:
            raise ValueError(f"unknown train mode {mode!r}")

        step_core = self._make_step_core(augment, loss_method)
        train_step = jax.jit(step_core, donate_argnums=(0, 1))
        bundle = {"step": train_step, "loader": loader, "consts": consts,
                  "epoch_fn": None, "steps": 0, "columns": None}
        if (self.config["scan_epochs"]
                and getattr(self.model, "scan_epochs_ok", True)
                and hasattr(loader, "columns")):
            cols = loader.columns()
            nbytes = sum(v.nbytes for v in cols.values())
            if nbytes <= (self.config["scan_epochs_max_bytes"] or 2 << 30):
                bundle["columns"] = self._upload_columns(cols)
                bundle["epoch_fn"], bundle["steps"] = \
                    self._make_epoch_fn(step_core, loader)
        self._modes[mode] = bundle
        return bundle

    def _upload_columns(self, cols):
        """Upload the whole training table once: single device, or sharded
        over the "data" axis under a mesh (rows stay local to their shard;
        the scanned gather-by-permutation is resolved by GSPMD)."""
        if self.plan is None:
            return {f: jnp.asarray(v) for f, v in cols.items()}
        return self.plan.shard_batch(cols)

    def _train_epoch(self, train_data, epoch_idx, mode="rs"):
        """One epoch. Loss parts stay ON DEVICE until epoch end so the host
        never blocks the async dispatch pipeline; the NaN check (parity:
        reference trainer.py:234-236) runs once per epoch on the total."""
        bundle = self._build_mode(train_data, mode)
        if bundle["epoch_fn"] is not None:
            self.params, self.opt_state, self.rng, _, parts = bundle["epoch_fn"](
                self.params, self.opt_state, self.rng,
                jnp.int32(self.global_step), bundle["columns"],
                bundle["consts"])
            self.global_step += bundle["steps"]
            total = np.asarray(parts)
            if np.isnan(total).any():
                raise ValueError(f"Training loss is nan at epoch {epoch_idx}")
            return tuple(total.tolist()) if len(total) > 1 else float(total[0])

        total = None
        loader = bundle["loader"]
        if getattr(self, "_show_progress", False):
            from tqdm import tqdm
            loader = tqdm(loader, total=len(loader),
                          desc=set_color(f"Train {epoch_idx:>5}", "pink"))
        for batch in loader:
            batch = dict(batch)
            batch["_step"] = np.int32(self.global_step)
            self.global_step += 1
            if self.plan is not None:
                batch = self.plan.shard_batch(batch)
            else:
                batch = {f: jnp.asarray(v) for f, v in batch.items()}
            self.params, self.opt_state, self.rng, loss, parts = \
                bundle["step"](self.params, self.opt_state, self.rng, batch,
                               bundle["consts"])
            total = parts if total is None else total + parts
        if total is None:
            return 0.0
        total = np.asarray(total)
        if np.isnan(total).any():
            raise ValueError(f"Training loss is nan at epoch {epoch_idx}")
        return tuple(total.tolist()) if len(total) > 1 else float(total[0])

    def cost_analysis(self, train_data, mode=None):
        """XLA cost analysis of the compiled training program: per-step
        flops and bytes-accessed estimates, for the MFU / HBM-utilization
        columns in scripts/bench_models.py. Returns None when the backend
        doesn't expose cost analysis (the reason is logged — round-4's
        blanket swallow left CKE/CFKG printing nan with no trail).
        ``bytes`` is XLA's per-op sum, which over-counts VMEM-resident
        reuse — treat as an upper bound. ``mode`` defaults to the
        trainer's own default_train_mode so alternating-mode trainers
        (KG/MKR: default "rskg") analyze the program they actually run."""
        bundle = self._build_mode(train_data,
                                  mode or self.default_train_mode)
        try:
            # Always analyze the FLAT per-step program: XLA's cost analysis
            # does not descend into lax.scan bodies, so the scan-epoch
            # program reports ~0 flops (observed: MFU columns printing 0.0)
            batch = dict(next(iter(bundle["loader"])))
            batch["_step"] = np.int32(0)
            batch = {f: jnp.asarray(v) for f, v in batch.items()}
            lowered = bundle["step"].lower(
                self.params, self.opt_state, self.rng, batch,
                bundle["consts"])
            steps = bundle["steps"] if bundle["epoch_fn"] is not None \
                else -(-bundle["loader"].n // bundle["loader"].batch_size)
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            if not ca:
                return None
            return {"flops_per_step": float(ca.get("flops", 0.0)),
                    "bytes_per_step": float(ca.get("bytes accessed", 0.0)),
                    "steps_per_epoch": steps}
        except Exception as e:  # noqa: BLE001 — diagnostics only, never fatal
            self.logger.warning("cost_analysis unavailable for %s/%s: %s",
                                type(self).__name__,
                                mode or self.default_train_mode, e)
            return None

    def _mask_const_subtree(self):
        """Exclude the model's params["_const"] subtree (dataset-derived
        device constants — adjacency matrices, history tables) from
        optimization. Constants live in params rather than jit closures
        because multi-MB XLA literals compile pathologically slowly
        (131s vs 0.8s measured for LightGCN's grad); optax.masked keeps
        Adam from allocating moments for them."""

        def is_const(p):
            return {k: jax.tree.map(lambda _: k == "_const", v)
                    for k, v in p.items()}

        def not_const(p):
            return {k: jax.tree.map(lambda _: k != "_const", v)
                    for k, v in p.items()}

        if getattr(self, "_const_masked", False):
            return
        self._const_masked = True
        self.optimizer = optax.chain(
            optax.masked(optax.set_to_zero(), is_const),
            optax.masked(self.optimizer, not_const))

    def prepare(self, train_data):
        """Initialize params/optimizer and build the default train mode."""
        # re-assert THIS trainer's plan as the trace-time active plan —
        # another trainer constructed since __init__ may have replaced it
        from ..parallel.mesh import set_active_plan
        set_active_plan(self.plan)
        if self.params is None:
            self.rng, init_key = jax.random.split(self.rng)
            self.params = self.model.attach_consts(
                self.model.zero_pad_rows(self.model.init_params(init_key)))
            if self.plan is not None:
                self.params = self.plan.shard_params(self.params)
        # masking must also run on the resume path (params loaded from a
        # checkpoint whose opt_state was produced by the masked optimizer)
        self._has_const = (isinstance(self.params, dict)
                           and "_const" in self.params)
        if self._has_const:
            self._mask_const_subtree()
        self._fused_adam = self._use_fused_adam()
        if self.opt_state is not None:
            # resume: keep the optimizer format the checkpoint's moments
            # were accumulated in, whatever the current env says
            fused_state = (isinstance(self.opt_state, dict)
                           and "count" in self.opt_state)
            if self._fused_adam != fused_state:
                self._fused_adam = fused_state
        if self.opt_state is None:
            self.opt_state = (self._fused_adam_init(self.params)
                              if self._fused_adam
                              else self.optimizer.init(self.params))
        self._modes = {}
        self._build_mode(train_data, self.default_train_mode)

    # -------------------------------------------------------------------- fit

    def fit(self, train_data, valid_data=None, verbose=True, saved=True,
            show_progress=False, callback_fn=None):
        if saved:
            ensure_dir(self.checkpoint_dir)
        self._show_progress = show_progress
        self.prepare(train_data)

        if saved and self.start_epoch >= self.epochs:
            self._save_checkpoint(-1)

        best_score, cur_step = self.best_valid_score, self.cur_step
        stop_flag = False
        for epoch_idx in range(self.start_epoch, self.epochs):
            t0 = time.time()
            train_loss = self._train_epoch(train_data, epoch_idx)
            self.train_loss_dict[epoch_idx] = (
                sum(train_loss) if isinstance(train_loss, tuple) else train_loss)
            t1 = time.time()
            self.epoch_times.append(t1 - t0)
            if verbose:
                loss_str = (", ".join(f"{l:.4f}" for l in train_loss)
                            if isinstance(train_loss, tuple) else f"{train_loss:.4f}")
                self.logger.info("epoch %d training [time: %.2fs, train loss: %s]",
                                 epoch_idx, t1 - t0, loss_str)

            if valid_data is None or (epoch_idx + 1) % self.eval_step != 0:
                if saved and valid_data is None:
                    self._save_checkpoint(epoch_idx)
                continue

            valid_result = self.evaluate(valid_data, load_best_model=False)
            valid_score = calculate_valid_score(valid_result, self.valid_metric)
            best_score, cur_step, stop_flag, update_flag = early_stopping(
                valid_score, best_score, cur_step, self.stopping_step,
                bigger=self.valid_metric_bigger)
            self.cur_step = cur_step
            t2 = time.time()
            self.eval_times.append(t2 - t1)
            if verbose:
                self.logger.info("epoch %d evaluating [time: %.2fs, valid_score: %f]",
                                 epoch_idx, t2 - t1, valid_score)
                self.logger.info("valid result: \n%s", dict2str(valid_result))
            if update_flag:
                self.best_valid_score = valid_score
                self.best_valid_result = valid_result
                if saved:
                    self._save_checkpoint(epoch_idx)
                    if verbose:
                        self.logger.info(set_color("Saving current best", "blue")
                                         + f": {self.saved_model_file}")
            if callback_fn:
                callback_fn(epoch_idx, valid_score)
            if stop_flag:
                if verbose:
                    self.logger.info("Finished training, best eval result in epoch %d",
                                     epoch_idx - cur_step * self.eval_step)
                break
        if self.config["draw_loss_pic"]:
            self.plot_train_loss(
                save_path=self.saved_model_file.replace(".ckpt", ".pdf"))
        return self.best_valid_score, self.best_valid_result

    def timing_summary(self):
        """Human-readable per-phase wall-clock table for profiled runs
        (parity: the fork's printed key-averages table,
        quick_start.py:57-61). First epoch includes jit compilation; the
        steady-state row is the honest throughput figure."""
        lines = ["phase                    count      total s     mean s",
                 "-" * 56]

        def row(name, times):
            if not times:
                return
            lines.append(f"{name:<24} {len(times):>5} {sum(times):>12.3f} "
                         f"{sum(times) / len(times):>10.3f}")

        row("train epoch (all)", self.epoch_times)
        row("train epoch (1st=jit)", self.epoch_times[:1])
        row("train epoch (steady)", self.epoch_times[1:])
        row("validation", self.eval_times)
        return "\n".join(lines)

    def plot_train_loss(self, show=False, save_path=None):
        """Training-loss curve (parity: reference plot_train_loss,
        trainer.py:430-452, gated by draw_loss_pic)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        epochs = sorted(self.train_loss_dict)
        values = [float(self.train_loss_dict[e]) for e in epochs]
        plt.figure()
        plt.plot(epochs, values)
        plt.xticks(epochs)
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        if show:
            plt.show()
        if save_path:
            os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
            plt.savefig(save_path)
        plt.close()

    # ------------------------------------------------------------- checkpoint

    def _save_leaf(self, leaf):
        """Host-side form of one checkpoint leaf. Row-sharded tables under
        a mesh are saved as their DISTINCT device shards (round-5 VERDICT
        task 10): ``np.asarray`` on e.g. Criteo's (2.57M, 11) token table
        would gather the full array to one host buffer on every validation
        improvement; the per-shard form moves each row range once and
        restores straight onto the mesh."""
        if not isinstance(leaf, jax.Array):
            return np.asarray(leaf) if isinstance(leaf, jnp.ndarray) else leaf
        if (self.plan is None or leaf.sharding.is_fully_replicated
                or leaf.ndim == 0):
            return np.asarray(leaf)
        shards = {}
        for sh in leaf.addressable_shards:
            r = sh.index[0]
            key = (r.start or 0,
                   r.stop if r.stop is not None else leaf.shape[0])
            if key not in shards:
                shards[key] = np.asarray(sh.data)
        return {"__sharded_rows__": sorted(
                    (s, e, arr) for (s, e), arr in shards.items()),
                "shape": tuple(leaf.shape), "dtype": str(leaf.dtype)}

    def _load_leaf(self, leaf, sharding=None):
        """Inverse of _save_leaf: sharded-rows records go back onto the
        mesh via make_array_from_callback (each device reads only its row
        range); plain arrays upload as-is."""
        if not isinstance(leaf, dict) or "__sharded_rows__" not in leaf:
            return jnp.asarray(leaf) if isinstance(leaf, np.ndarray) else leaf
        rows = leaf["__sharded_rows__"]
        if sharding is not None:
            by_start = {s: arr for s, e, arr in rows}

            def cb(idx):
                r = idx[0]
                start = r.start or 0
                arr = by_start.get(start)
                if arr is not None and start + arr.shape[0] == (
                        r.stop if r.stop is not None else leaf["shape"][0]):
                    return arr[(slice(None),) + tuple(idx[1:])]
                full = self._assemble_rows(leaf)
                return full[idx]
            return jax.make_array_from_callback(
                tuple(leaf["shape"]), sharding, cb)
        return jnp.asarray(self._assemble_rows(leaf))

    @staticmethod
    def _assemble_rows(rec):
        full = np.zeros(rec["shape"], dtype=np.dtype(rec["dtype"]))
        for s, e, arr in rec["__sharded_rows__"]:
            full[s:e] = arr
        return full

    def _save_checkpoint(self, epoch):
        # checkpoints carry only LEARNED state: the dataset-derived
        # params["_const"] subtree (graph structures, packed-bit images —
        # gigabytes at Yelp scale) is rebuilt from data on load, matching
        # the reference's state_dict-only format (trainer.py:250-263)
        save_params = self.params
        if isinstance(save_params, dict) and "_const" in save_params:
            save_params = {k: v for k, v in save_params.items()
                           if k != "_const"}
        state = {
            "config": dict(self.config.final),
            "epoch": epoch,
            "cur_step": self.cur_step,
            "train_loss_dict": dict(self.train_loss_dict),
            "best_valid_score": self.best_valid_score,
            "best_valid_result": self.best_valid_result,
            "params": jax.tree.map(self._save_leaf, save_params),
            "opt_state": jax.tree.map(self._save_leaf, self.opt_state),
            "rng": np.asarray(jax.random.key_data(self.rng)),
        }
        with open(self.saved_model_file, "wb") as fh:
            pickle.dump(state, fh)

    def resume_checkpoint(self, resume_file):
        with open(resume_file, "rb") as fh:
            state = pickle.load(fh)
        self.start_epoch = state["epoch"] + 1
        # early-stopping patience + loss curve survive a resume (parity:
        # reference persists cur_step, trainer.py:191-232)
        self.cur_step = state.get("cur_step", 0)
        self.train_loss_dict = dict(state.get("train_loss_dict", {}))
        self.best_valid_score = state["best_valid_score"]
        # restore the result dict too, so a resumed fit that never improves
        # on the restored best still returns the checkpointed result rather
        # than None (run-to-run RNG decides which — was a flaky gap)
        self.best_valid_result = state.get("best_valid_result")
        self.params = self._reattach_consts(
            self._restore_tree(state["params"]))
        self.opt_state = self._restore_tree(state["opt_state"])
        self.rng = jax.random.wrap_key_data(
            jnp.asarray(state["rng"]),
            impl=self.config["prng_impl"] or "rbg")
        if state["config"].get("model") != self.config["model"]:
            self.logger.warning("Architecture configuration given in config file is "
                                "different from that of checkpoint.")
        self.logger.info("Checkpoint loaded. Resume training from epoch %d",
                         self.start_epoch)

    def _restore_tree(self, tree):
        """Rebuild a checkpointed pytree: sharded-rows records land back
        on the mesh (per-device row reads); plain arrays upload whole."""
        is_rec = lambda x: isinstance(x, dict) and "__sharded_rows__" in x

        def restore(path, leaf):
            if not is_rec(leaf):
                return self._load_leaf(leaf)
            sharding = None
            if self.plan is not None:
                name = "/".join(
                    str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)
                shim = type("L", (), {"ndim": len(leaf["shape"]),
                                      "shape": tuple(leaf["shape"])})()
                if self.plan.shards_table(name, shim):
                    from jax.sharding import NamedSharding, PartitionSpec
                    sharding = NamedSharding(self.plan.mesh,
                                             PartitionSpec("model", None))
                else:
                    sharding = self.plan.replicated()
            return self._load_leaf(leaf, sharding)

        return jax.tree_util.tree_map_with_path(restore, tree,
                                                is_leaf=is_rec)

    def load_params(self, model_file):
        with open(model_file, "rb") as fh:
            state = pickle.load(fh)
        self.params = self._reattach_consts(
            self._restore_tree(state["params"]))

    def _reattach_consts(self, params):
        """Rebuild the params["_const"] subtree that _save_checkpoint strips
        (pre-r4 checkpoints still carry it — kept as-is). The model
        re-derives it from its construction-time dataset state via
        init_params; the learned leaves of that fresh tree are discarded.
        The init key replays prepare()'s exact first split off the PRISTINE
        construction-seed key (self.rng may have advanced through training
        by load time), so RNG-derived frozen consts (feat_embed's N(0,1)
        tables) come back bit-identical."""
        if not isinstance(params, dict) or "_const" in params:
            return params
        # skip the (possibly huge) rebuild when this trainer already built
        # params in-process and knows the model carries no consts
        if getattr(self, "_has_const", None) is False:
            return params
        seed_key = jax.random.key(self.config["seed"] or 0,
                                  impl=self.config["prng_impl"] or "rbg")
        init_key = jax.random.split(seed_key)[1]
        fresh = self.model.attach_consts(self.model.init_params(init_key))
        if isinstance(fresh, dict) and "_const" in fresh:
            params = dict(params)
            params["_const"] = fresh["_const"]
        else:
            self._has_const = False
        return params

    # ------------------------------------------------------------- evaluation

    def _make_full_sort_eval_step(self, eval_data, metrics, max_k,
                                  needs_gauc=False):
        model = self.model
        uid_f = self.config["USER_ID_FIELD"]
        iid_f = self.config["ITEM_ID_FIELD"]
        mask_history = getattr(eval_data, "mask_history", True)
        consts = {}
        if mask_history:
            e_hist, e_hlen = eval_data.phase_history.device_tables(
                eval_data.mask_phase)
            consts.update({"hist": e_hist, "hlen": e_hlen})
        n_items = eval_data.n_items
        transform = getattr(eval_data, "device_transform", None)
        if transform is not None:
            consts.update(transform.consts)

        from ..models.base import AbstractRecommender
        has_full_sort = (type(model).full_sort_predict
                         is not AbstractRecommender.full_sort_predict
                         and not getattr(model, "full_sort_fallback", False))

        # fused path: for dot-product models, score+mask+top-k without the
        # (B, n_items) matrix leaving the fusion (bf16 MXU and/or Pallas)
        use_bf16 = str(self.config["eval_score_dtype"]).lower() == "bfloat16"
        use_pallas = bool(self.config["use_pallas_topk"])
        # the fused path is only sound when full_sort_query provably matches
        # the model's full-sort semantics: either the model opts in by
        # defining full_sort_query in its OWN class, or it inherits the
        # whole base dot-product stack unmodified (a model that overrides
        # full_sort_predict, e.g. KSR's combined item+entity table, must
        # not silently get the base query)
        from ..models.base import SequentialRecommender
        cls = type(model)
        base_stack = (getattr(cls, "full_sort_predict", None)
                      is SequentialRecommender.full_sort_predict)
        opted_in = "full_sort_query" in cls.__dict__
        queryable = ((opted_in or base_stack)
                     and hasattr(model, "full_sort_query")
                     and not getattr(model, "full_sort_fallback", False))
        # distributed full-sort: under a mesh with a model axis, each item
        # shard scores its slice and only (B, k) candidates cross the
        # interconnect (parallel/topk.py) — this attacks the reference's one
        # published weakness, full-sort eval cost (e.g. BPR Yelp eval 120s,
        # General_recommendation.md:128)
        distributed = (self.plan is not None
                       and self.plan.mesh.shape["model"] > 1
                       and self.config["shard_full_sort"]
                       and queryable and not needs_gauc
                       and n_items % self.plan.mesh.shape["model"] == 0)
        fused = (use_bf16 or use_pallas or distributed) \
            and not needs_gauc and queryable
        if fused:
            from ..ops.masked_topk import masked_topk
            if distributed:
                from ..parallel.topk import distributed_masked_topk
                dist_mesh = self.plan.mesh

            @jax.jit
            def fused_eval_step(params, consts, batch):
                pos_items = batch.pop("pos_items")
                pos_len = batch.pop("pos_len")
                mask = batch.pop("_mask")
                if transform is not None:
                    batch = transform(batch, consts)
                user_id = batch[uid_f]
                B = user_id.shape[0]
                with model.bind_consts(model.consts_of(params)):
                    query, table = model.full_sort_query(params, batch)
                if use_bf16:
                    query = query.astype(jnp.bfloat16)
                    table = table.astype(jnp.bfloat16)
                invalid = jnp.zeros((B, n_items), jnp.int8).at[:, 0].set(1)
                if mask_history:
                    uh = consts["hist"][user_id]
                    hvalid = (jnp.arange(uh.shape[1])[None, :]
                              < consts["hlen"][user_id][:, None])
                    invalid = invalid.at[jnp.arange(B)[:, None], uh].max(
                        hvalid.astype(jnp.int8))
                if distributed:
                    _, topk_idx = distributed_masked_topk(
                        dist_mesh, query, table, invalid, max_k)
                else:
                    _, topk_idx = masked_topk(query, table, invalid, max_k,
                                              prefer_pallas=use_pallas)
                pos_valid = (jnp.arange(pos_items.shape[1])[None, :]
                             < pos_len[:, None])
                pos_index = jnp.any(
                    (topk_idx[:, :, None] == pos_items[:, None, :])
                    & pos_valid[:, None, :], axis=-1).astype(jnp.int32)
                return topk_metric_sums(metrics, pos_index, pos_len, mask)

            return fused_eval_step, consts

        def all_item_scores(params, batch):
            if has_full_sort:
                return model.full_sort_predict(params, batch)
            # fallback: chunked score_items over the item axis (parity:
            # reference _spilt_predict, trainer.py:333-340,414-428).
            # eval_score_dtype=bfloat16 runs the per-chunk towers on the
            # bf16 MXU (same opt-in + A/B gate as the fused dot-product
            # path; consts stay f32 via bind_consts); chunk auto-sizes to a
            # 512MB transient budget when the model provides an
            # eval_pair_bytes estimate.
            B = batch[uid_f].shape[0]
            pair_bytes = int(getattr(model, "eval_pair_bytes", 0) or 0)
            if pair_bytes:
                budget = 512 << 20
                chunk = min(n_items,
                            max(128, budget // (B * pair_bytes) // 128 * 128))
            else:
                chunk = min(2048, n_items)
            n_chunks = -(-n_items // chunk)
            items = jnp.arange(n_chunks * chunk, dtype=jnp.int32) % n_items
            items = items.reshape(n_chunks, chunk)
            p = params
            if use_bf16:
                # cast only learned leaves; dataset-derived params["_const"]
                # (graph norms etc.) must stay f32 — models that read
                # params["_const"] directly in score_items would otherwise
                # run normalization constants in bf16
                p = jax.tree.map(
                    lambda a: (a.astype(jnp.bfloat16)
                               if getattr(a, "dtype", None) == jnp.float32
                               else a), params)
                if isinstance(params, dict) and "_const" in params:
                    p = {**p, "_const": params["_const"]}

            def score_chunk(item_chunk):
                cand = jnp.broadcast_to(item_chunk[None, :], (B, chunk))
                return model.score_items(p, batch, cand)

            scores = jax.lax.map(score_chunk, items)          # (n_chunks, B, chunk)
            return scores.transpose(1, 0, 2).reshape(B, -1)[:, :n_items]

        @jax.jit
        def eval_step(params, consts, batch):
            pos_items = batch.pop("pos_items")
            pos_len = batch.pop("pos_len")
            mask = batch.pop("_mask")
            if transform is not None:
                batch = transform(batch, consts)
            user_id = batch[uid_f]
            B = user_id.shape[0]
            with model.bind_consts(model.consts_of(params)):
                scores = all_item_scores(params, batch).astype(jnp.float32)
            scores = scores.at[:, 0].set(NEG_INF)  # [PAD] column
            rows = jnp.arange(B)[:, None]
            if mask_history:
                uh = consts["hist"][user_id]
                hvalid = (jnp.arange(uh.shape[1])[None, :]
                          < consts["hlen"][user_id][:, None])
                scores = scores.at[rows, uh].add(jnp.where(hvalid, NEG_INF, 0.0))
            _, topk_idx = jax.lax.top_k(scores, max_k)
            # top-k hit flags via direct (B, K, P) id comparison — no
            # (B, n_items) positive matrix materializes (the reference's
            # flip/swap machinery and our earlier scatter both did)
            pos_valid = (jnp.arange(pos_items.shape[1])[None, :]
                         < pos_len[:, None])
            pos_index = jnp.any(
                (topk_idx[:, :, None] == pos_items[:, None, :])
                & pos_valid[:, None, :], axis=-1).astype(jnp.int32)
            sums = topk_metric_sums(metrics, pos_index, pos_len, mask)
            if needs_gauc:
                from ..evaluator.evaluator import gauc_metric_sums
                pos_matrix = jnp.zeros((B, n_items), jnp.int32) \
                    .at[rows, pos_items].max(pos_valid.astype(jnp.int32))
                user_len = jnp.full((B,), n_items, jnp.float32)
                sums.update(gauc_metric_sums(scores, pos_matrix, pos_len,
                                             user_len, mask))
            return sums

        return eval_step, consts

    def _make_sampled_eval_step(self, eval_data, metrics, max_k,
                                needs_gauc=False):
        model = self.model
        cfg = self.config
        uid_f = cfg["USER_ID_FIELD"]
        s_hist, s_hlen = eval_data.phase_history.device_tables(
            eval_data.sample_phase)
        n_items = eval_data.n_items
        if not getattr(eval_data, "repeatable_sampling", False):
            eval_data.phase_history.assert_sampleable(eval_data.sample_phase)
        P = eval_data.max_pos
        k = eval_data.neg_k
        rounds = cfg["neg_sampling_resample_rounds"]
        repeatable = getattr(eval_data, "repeatable_sampling", False)
        transform = getattr(eval_data, "device_transform", None)
        consts = {"hist": s_hist, "hlen": s_hlen}
        if transform is not None:
            consts.update(transform.consts)
        has_pop = eval_data.distribution == "popularity"
        if has_pop:
            consts["pop"] = jnp.asarray(
                eval_data.phase_history.pop_items[eval_data.sample_phase])

        @jax.jit
        def eval_step(params, consts, rng, batch):
            pos_items = batch.pop("pos_items")
            pos_len = batch.pop("pos_len")
            mask = batch.pop("_mask")
            pop = consts.get("pop") if has_pop else None
            if transform is not None:
                batch = transform(batch, consts)
            user_id = batch[uid_f]
            B = user_id.shape[0]
            if repeatable:
                negs = sample_negatives_unchecked(rng, (B, P * k), n_items,
                                                  pop_items=pop)
            else:
                negs = sample_negatives(rng, user_id, consts["hist"],
                                        consts["hlen"], n_items, P * k,
                                        rounds=rounds, pop_items=pop)
            cand = jnp.concatenate([pos_items, negs], axis=1)       # (B, C)
            pos_valid = jnp.arange(P)[None, :] < pos_len[:, None]
            neg_valid = jnp.arange(P * k)[None, :] < (pos_len * k)[:, None]
            cand_valid = jnp.concatenate([pos_valid, neg_valid], axis=1)
            with model.bind_consts(model.consts_of(params)):
                scores = model.score_items(params, batch, cand)
            scores = jnp.where(cand_valid, scores.astype(jnp.float32), NEG_INF)
            if scores.shape[1] < max_k:
                # fork top-k padding fix (abstract_evaluator.py:71-74)
                scores = jnp.pad(scores,
                                 ((0, 0), (0, max_k - scores.shape[1])),
                                 constant_values=NEG_INF)
            _, topk_idx = jax.lax.top_k(scores, max_k)
            # positives sit in the first pos_len slots — rank membership is a
            # simple index compare (replaces the reference's flip/swap trick,
            # general_dataloader.py:319-328 + evaluators.py:134)
            pos_index = (topk_idx < pos_len[:, None]).astype(jnp.int32)
            sums = topk_metric_sums(metrics, pos_index, pos_len, mask)
            if needs_gauc:
                from ..evaluator.evaluator import gauc_metric_sums
                C = cand.shape[1]
                pos_01 = (jnp.arange(C)[None, :]
                          < pos_len[:, None]).astype(jnp.int32)
                user_len = (pos_len * (1 + k)).astype(jnp.float32)
                sums.update(gauc_metric_sums(scores, pos_01, pos_len,
                                             user_len, mask))
            return sums

        return eval_step, consts

    def _make_labeled_eval_step(self, eval_data, metrics, max_k,
                                needs_gauc=False):
        """Ranking over the dataset's own labeled candidates (fork
        GeneralNegFromDatasetDataLoader protocol)."""
        model = self.model
        uid_f = self.config["USER_ID_FIELD"]
        consts = {}

        @jax.jit
        def eval_step(params, consts, batch):
            pos_items = batch.pop("pos_items")
            pos_len = batch.pop("pos_len")
            neg_items = batch.pop("neg_items")
            neg_len = batch.pop("neg_len")
            mask = batch.pop("_mask")
            P = pos_items.shape[1]
            cand = jnp.concatenate([pos_items, neg_items], axis=1)
            pos_valid = jnp.arange(P)[None, :] < pos_len[:, None]
            neg_valid = (jnp.arange(neg_items.shape[1])[None, :]
                         < neg_len[:, None])
            cand_valid = jnp.concatenate([pos_valid, neg_valid], axis=1)
            with model.bind_consts(model.consts_of(params)):
                scores = model.score_items(params, batch, cand)
            scores = jnp.where(cand_valid, scores.astype(jnp.float32), NEG_INF)
            if scores.shape[1] < max_k:
                # candidate list narrower than max(topk): pad with -inf
                # (parity: fork top-k padding fix, abstract_evaluator.py:71-74)
                scores = jnp.pad(scores,
                                 ((0, 0), (0, max_k - scores.shape[1])),
                                 constant_values=NEG_INF)
            _, topk_idx = jax.lax.top_k(scores, max_k)
            pos_index = (topk_idx < pos_len[:, None]).astype(jnp.int32)
            sums = topk_metric_sums(metrics, pos_index, pos_len, mask)
            if needs_gauc:
                from ..evaluator.evaluator import gauc_metric_sums
                pos_01 = jnp.concatenate(
                    [pos_valid.astype(jnp.int32),
                     jnp.zeros_like(neg_valid, jnp.int32)], axis=1)
                if pos_01.shape[1] < scores.shape[1]:
                    pos_01 = jnp.pad(
                        pos_01,
                        ((0, 0), (0, scores.shape[1] - pos_01.shape[1])))
                user_len = (pos_len + neg_len).astype(jnp.float32)
                sums.update(gauc_metric_sums(scores, pos_01, pos_len,
                                             user_len, mask))
            return sums

        return eval_step, consts

    def _evaluate_individual(self, eval_data):
        """Value-metric path: predictions vs labels over plain rows (parity:
        reference LossEvaluator, evaluators.py:289-367).

        The whole eval table is uploaded ONCE and every batch runs inside a
        single scanned device program — per-batch host->device uploads paid
        tunnel round-trip bandwidth per batch (measured 0.18s/batch at
        Avazu scale, eval slower than the reference's GPU), and only the
        (n,) prediction vector returns to the host."""
        model = self.model
        label_f = self.config["LABEL_FIELD"]
        cached = getattr(eval_data, "_individual_cache", None)
        if cached is None or cached[0] is not self:
            cols = {f: np.asarray(v) for f, v in eval_data.fields.items()}
            n = eval_data.n
            B = min(eval_data.batch_size, max(n, 1))
            steps = -(-n // B)
            pad = steps * B - n
            if pad:
                cols = {f: np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                    for f, v in cols.items()}
            if self.plan is not None:
                dcols = self.plan.shard_batch(cols)
            else:
                dcols = {f: jnp.asarray(v) for f, v in cols.items()}

            # under a mesh the (n,) prediction vector must come back
            # REPLICATED: with >1 process a data-sharded global array is
            # not host-fetchable (caught by the 2-process framework test)
            out_s = (self.plan.replicated() if self.plan is not None
                     else None)

            @partial(jax.jit, out_shardings=out_s)
            def predict_all(params, dcols):
                def body(_, i):
                    batch = {f: jax.lax.dynamic_slice_in_dim(v, i * B, B)
                             for f, v in dcols.items()}
                    with model.bind_consts(model.consts_of(params)):
                        return _, model.predict(params, batch)

                _, preds = jax.lax.scan(body, None,
                                        jnp.arange(steps, dtype=jnp.int32))
                return preds.reshape(-1)[:n]

            cached = (self, predict_all, dcols,
                      np.asarray(eval_data.fields[label_f]))
            eval_data._individual_cache = cached
        _, predict_all, dcols, labels = cached
        preds = np.asarray(predict_all(self.params, dcols))
        collector = ValueCollector(self.config)
        collector.collect(labels, preds)
        return collector.evaluate()

    def evaluate(self, eval_data, load_best_model=True, model_file=None,
                 show_progress=False):
        from ..parallel.mesh import set_active_plan
        set_active_plan(self.plan)
        if load_best_model:
            self.load_params(model_file or self.saved_model_file)
        if self.params is None:
            raise RuntimeError("no parameters — call fit() or load a checkpoint")

        from ..data.loaders import RowEvalLoader
        if isinstance(eval_data, RowEvalLoader):
            return self._evaluate_individual(eval_data)

        collector = TopKCollector(self.config)
        metrics = tuple(collector.topk_metrics)
        max_k = collector.max_k
        needs_gauc = collector.needs_gauc

        sampled = hasattr(eval_data, "neg_k")
        labeled = hasattr(eval_data, "neg_items")
        # stable cache token held BY the trainer: id() recycles after GC, so
        # two sequentially-created loaders could alias a stale jitted step
        # with the wrong closure constants
        token = getattr(eval_data, "_trainer_cache_token", None)
        if token is None or token[0] is not self:
            token = (self, len(self._eval_step_cache))
            eval_data._trainer_cache_token = token
        key = (token[1], metrics, max_k, needs_gauc,
               type(eval_data).__name__)
        if key not in self._eval_step_cache:
            if labeled:
                self._eval_step_cache[key] = self._make_labeled_eval_step(
                    eval_data, metrics, max_k, needs_gauc)
            elif sampled:
                self._eval_step_cache[key] = self._make_sampled_eval_step(
                    eval_data, metrics, max_k, needs_gauc)
            else:
                self._eval_step_cache[key] = self._make_full_sort_eval_step(
                    eval_data, metrics, max_k, needs_gauc)
        step, consts = self._eval_step_cache[key]
        upload = (self.plan.shard_batch if self.plan is not None
                  else lambda b: {k2: jnp.asarray(v) for k2, v in b.items()})
        if labeled:
            total = None
            for batch in eval_data:
                batch = upload(dict(batch))
                sums = step(self.params, consts, batch)
                total = sums if total is None else jax.tree.map(
                    jnp.add, total, sums)
            if total is not None:
                collector.collect(jax.device_get(total))
            return collector.evaluate()

        # metric partial sums accumulate ON DEVICE; one host transfer at the
        # end (per-array transfers pay round-trip latency per batch on a
        # remote/tunneled accelerator)
        total = None
        for batch in eval_data:
            batch = upload(dict(batch))
            if sampled:
                self.rng, ek = jax.random.split(self.rng)
                sums = step(self.params, consts, ek, batch)
            else:
                sums = step(self.params, consts, batch)
            total = sums if total is None else jax.tree.map(jnp.add, total,
                                                            sums)
        if total is not None:
            collector.collect(jax.device_get(total))
        return collector.evaluate()


class TraditionalTrainer(Trainer):
    """Models fit in closed form / by counting: one 'epoch' builds the params
    (parity: trainer.py:600-607)."""

    def __init__(self, config, model):
        super().__init__(config, model)
        self.epochs = 1

    def fit(self, train_data, valid_data=None, verbose=True, saved=True,
            show_progress=False, callback_fn=None):
        if saved:
            ensure_dir(self.checkpoint_dir)
        self.rng, init_key = jax.random.split(self.rng)
        self.params = self.model.attach_consts(
            self.model.fit_params(init_key, train_data))
        if valid_data is not None:
            self.best_valid_result = self.evaluate(valid_data, load_best_model=False)
            self.best_valid_score = calculate_valid_score(
                self.best_valid_result, self.valid_metric)
        if saved:
            self._save_checkpoint(0)
        return self.best_valid_score, self.best_valid_result


class KGTrainer(Trainer):
    """Alternating RS/KG/RSKG loop policy (parity: reference KGTrainer,
    trainer.py:455-481): with train_rec_step/train_kg_step unset every epoch is
    RSKG (rec batches zipped with kg triples); otherwise epochs alternate in
    blocks of rec then kg."""

    def __init__(self, config, model):
        super().__init__(config, model)
        self.train_rec_step = config["train_rec_step"]
        self.train_kg_step = config["train_kg_step"]

    @property
    def default_train_mode(self):
        # with the step counts unset every epoch runs rskg — cost_analysis
        # and prepare must build THAT program, not the plain-rs one
        # (round-5: CKE/CFKG printed nan MFU because the rs-mode bundle's
        # loader has no kg columns — KeyError 'head_id', silently
        # swallowed before the warning below existed)
        if self.train_rec_step is None or self.train_kg_step is None:
            return "rskg"
        return "rs"

    def _train_epoch(self, train_data, epoch_idx, mode=None):
        if self.train_rec_step is None or self.train_kg_step is None:
            mode = "rskg"
        elif (epoch_idx % (self.train_rec_step + self.train_kg_step)
                < self.train_rec_step):
            mode = "rs"
        else:
            mode = "kg"
        return super()._train_epoch(train_data, epoch_idx, mode)

    def prepare(self, train_data):
        super().prepare(train_data)


class KGATTrainer(Trainer):
    """Per epoch: RS pass, KG pass, then recompute the attentive adjacency
    (parity: reference KGATTrainer, trainer.py:484-508)."""

    _att_update = None

    def _train_epoch(self, train_data, epoch_idx, mode=None):
        rs_loss = super()._train_epoch(train_data, epoch_idx, "rs")
        kg_loss = super()._train_epoch(train_data, epoch_idx, "kg")
        if self._att_update is None:
            model = self.model

            # one compiled program instead of ~100 eager dispatches (1.28s
            # eager -> device time per epoch; the first EAGER call also paid
            # a 188s per-op remote-compile cascade). Consts resolve through
            # the traced params['_const'] subtree, not closure literals.
            def _upd(params):
                with model.bind_consts(model.consts_of(params)):
                    return model.update_attentive_A(params)

            self._att_update = jax.jit(_upd, donate_argnums=(0,))
        self.params = self._att_update(self.params)
        rs = rs_loss if isinstance(rs_loss, tuple) else (rs_loss,)
        kg = kg_loss if isinstance(kg_loss, tuple) else (kg_loss,)
        return rs + kg


class MKRTrainer(Trainer):
    """RS every epoch, KG every kge_interval epochs (parity: reference
    MKRTrainer, trainer.py:570-597)."""

    def __init__(self, config, model):
        super().__init__(config, model)
        self.kge_interval = config["kge_interval"] or 3

    def _train_epoch(self, train_data, epoch_idx, mode=None):
        rs_loss = super()._train_epoch(train_data, epoch_idx, "rs_only_loss")
        kg_loss = 0.0
        if epoch_idx % self.kge_interval == 0:
            kg_loss = super()._train_epoch(train_data, epoch_idx, "kg")
        rs = rs_loss if isinstance(rs_loss, tuple) else (rs_loss,)
        kg = kg_loss if isinstance(kg_loss, tuple) else (kg_loss,)
        return rs + kg


class DecisionTreeTrainer(Trainer):
    """Host-side gradient-boosted-tree bridge (parity: reference
    DecisionTreeTrainer / xgboostTrainer / lightgbmTrainer,
    trainer.py:610-935): interactions become a feature matrix (token fields
    as integer codes, optional sparse one-hot above token_num_threshold),
    training runs through the native xgb.train / lgb.train with their own
    early stopping, evaluation feeds (label, prediction) pairs into the
    value-metric collector."""

    def __init__(self, config, model):
        super().__init__(config, model)
        self.label_field = config["LABEL_FIELD"]
        self.convert_onehot = config["convert_token_to_onehot"]
        self.flavor = "xgb" if config["model"].lower() == "xgboost" else "lgb"
        self.booster = None

    def _matrix(self, dataset):
        from ..utils.enums import FeatureType
        cols, names = [], []
        for f, v in dataset.inter_feat.items():
            if f == self.label_field or v.dtype == object:
                continue
            names.append(f)
            cols.append(np.asarray(v, np.float32))
        X = np.stack(cols, axis=1) if cols else np.zeros((len(dataset), 0))
        y = np.asarray(dataset.inter_feat.get(
            self.label_field, np.zeros(len(dataset))), np.float32)
        if self.convert_onehot:
            import scipy.sparse as sp
            parts = []
            for j, f in enumerate(names):
                ftype = dataset.field2type.get(f)
                vocab = (dataset.num(f) if ftype is FeatureType.TOKEN else 0)
                if 0 < vocab <= self.config["token_num_threshold"]:
                    ids = X[:, j].astype(np.int64)
                    parts.append(sp.csr_matrix(
                        (np.ones(len(ids), np.float32),
                         (np.arange(len(ids)), ids)),
                        shape=(len(ids), vocab)))
                else:
                    parts.append(sp.csr_matrix(X[:, j:j + 1]))
            X = sp.hstack(parts).tocsr()
        return X, y

    def fit(self, train_data, valid_data=None, verbose=True, saved=True,
            show_progress=False, callback_fn=None):
        if saved:
            ensure_dir(self.checkpoint_dir)
        Xtr, ytr = self._matrix(train_data.dataset)
        evals = []
        if valid_data is not None:
            Xva, yva = self._matrix(valid_data.dataset)
        if self.flavor == "xgb":
            import xgboost as xgb
            dtr = xgb.DMatrix(Xtr, label=ytr,
                              missing=self.config["xgb_missing"])
            watch = [(dtr, "train")]
            if valid_data is not None:
                watch.append((xgb.DMatrix(Xva, label=yva), "valid"))
            self.booster = xgb.train(
                self.config["xgb_params"], dtr,
                num_boost_round=self.config["xgb_num_boost_round"],
                evals=watch,
                early_stopping_rounds=self.config["xgb_early_stopping_rounds"],
                verbose_eval=self.config["xgb_verbose_eval"])
            if saved:
                self.booster.save_model(self.saved_model_file)
        else:
            import lightgbm as lgb
            dtr = lgb.Dataset(Xtr, label=ytr)
            sets = [dtr]
            if valid_data is not None:
                sets.append(lgb.Dataset(Xva, label=yva, reference=dtr))
            callbacks = []
            if self.config["lgb_early_stopping_rounds"] and valid_data is not None:
                callbacks.append(lgb.early_stopping(
                    self.config["lgb_early_stopping_rounds"]))
            self.booster = lgb.train(
                self.config["lgb_params"], dtr,
                num_boost_round=self.config["lgb_num_boost_round"],
                valid_sets=sets, callbacks=callbacks)
            if saved:
                self.booster.save_model(self.saved_model_file)
        if valid_data is not None:
            self.best_valid_result = self.evaluate(valid_data,
                                                   load_best_model=False)
            self.best_valid_score = calculate_valid_score(
                self.best_valid_result, self.valid_metric)
        return self.best_valid_score, self.best_valid_result

    def evaluate(self, eval_data, load_best_model=True, model_file=None,
                 show_progress=False):
        if load_best_model and (model_file or self.booster is None):
            path = model_file or self.saved_model_file
            if self.flavor == "xgb":
                import xgboost as xgb
                self.booster = xgb.Booster(model_file=path)
            else:
                import lightgbm as lgb
                self.booster = lgb.Booster(model_file=path)
        if self.booster is None:
            raise RuntimeError("no trained booster — call fit() first")
        X, y = self._matrix(eval_data.dataset)
        if self.flavor == "xgb":
            import xgboost as xgb
            preds = self.booster.predict(xgb.DMatrix(X))
        else:
            preds = self.booster.predict(X)
        collector = ValueCollector(self.config)
        collector.collect(y, preds)
        return collector.evaluate()


class S3RecTrainer(Trainer):
    """Two-stage loop policy (parity: reference S3RecTrainer,
    trainer.py:511-567): pretrain = epochs without validation, checkpoint
    every save_step epochs; finetune = the normal fit loop."""

    def fit(self, train_data, valid_data=None, verbose=True, saved=True,
            show_progress=False, callback_fn=None):
        if getattr(self.model, "train_stage", "finetune") != "pretrain":
            return super().fit(train_data, valid_data, verbose, saved,
                               show_progress, callback_fn)
        if saved:
            ensure_dir(self.checkpoint_dir)
        self.prepare(train_data)
        save_step = self.config["save_step"] or 10
        for epoch_idx in range(self.start_epoch, self.epochs):
            t0 = time.time()
            loss = self._train_epoch(train_data, epoch_idx)
            if verbose:
                loss_val = sum(loss) if isinstance(loss, tuple) else loss
                self.logger.info("pretrain epoch %d [time: %.2fs, loss: %.4f]",
                                 epoch_idx, time.time() - t0, loss_val)
            if saved and ((epoch_idx + 1) % save_step == 0
                          or epoch_idx == self.epochs - 1):
                self._save_checkpoint(epoch_idx)
                if verbose:
                    self.logger.info("Saving pretrained model: %s",
                                     self.saved_model_file)
        return self.best_valid_score, self.best_valid_result


class RecVAETrainer(Trainer):
    """Alternating encoder/decoder optimization (parity: reference
    RecVAETrainer, trainer.py:938-1061): per outer epoch, n_enc_epochs passes
    updating ONLY the encoder (dropout on), then update_prior (old encoder :=
    live encoder), then n_dec_epochs passes updating ONLY the decoder
    (dropout off). Each phase has its own optax.masked optimizer state, so
    Adam moments never leak across subsets."""

    def __init__(self, config, model):
        super().__init__(config, model)
        self.n_enc_epochs = config["n_enc_epochs"] or 3
        self.n_dec_epochs = config["n_dec_epochs"] or 1
        self._rv = None

    def prepare(self, train_data):
        if self.params is None:
            self.rng, init_key = jax.random.split(self.rng)
            self.params = self.model.attach_consts(
                self.model.zero_pad_rows(self.model.init_params(init_key)))
            if self.plan is not None:
                self.params = self.plan.shard_params(self.params)
        if self._rv is not None:
            return
        self._rv = {}
        specs = {"enc": ("calculate_loss", "encoder"),
                 "dec": ("calculate_loss_no_dropout", "decoder")}
        augment, aug_consts = self._make_rec_augment(train_data)
        for mode, (loss_name, part) in specs.items():
            def mask_fn(p, part=part):
                return {k: jax.tree.map(lambda _: k == part, v)
                        for k, v in p.items()}

            def inv_mask_fn(p, part=part):
                return {k: jax.tree.map(lambda _: k != part, v)
                        for k, v in p.items()}
            # optax.masked passes the complement's updates through UNCHANGED
            # (raw gradients!), so the complement must be explicitly zeroed
            tx = optax.chain(
                optax.masked(optax.set_to_zero(), inv_mask_fn),
                optax.masked(build_optimizer(self.config), mask_fn))
            step_core = self._make_step_core(
                augment, getattr(self.model, loss_name), optimizer=tx)
            bundle = {"tx": tx, "opt_state": tx.init(self.params),
                      "step": jax.jit(step_core, donate_argnums=(0, 1)),
                      "consts": aug_consts,
                      "epoch_fn": None, "steps": 0, "columns": None}
            if self.config["scan_epochs"] and hasattr(train_data, "columns"):
                cols = train_data.columns()
                bundle["columns"] = self._upload_columns(cols)
                bundle["epoch_fn"], bundle["steps"] = \
                    self._make_epoch_fn(step_core, train_data)
            self._rv[mode] = bundle

    def _run_phase(self, train_data, mode):
        bundle = self._rv[mode]
        if bundle["epoch_fn"] is not None:
            self.params, bundle["opt_state"], self.rng, _, parts = \
                bundle["epoch_fn"](self.params, bundle["opt_state"], self.rng,
                                   jnp.int32(self.global_step),
                                   bundle["columns"], bundle["consts"])
            self.global_step += bundle["steps"]
            return float(np.sum(np.asarray(parts)))
        total = 0.0
        for batch in train_data:
            batch = {f: jnp.asarray(v) for f, v in batch.items()}
            batch["_step"] = jnp.int32(self.global_step)
            self.global_step += 1
            self.params, bundle["opt_state"], self.rng, loss, _ = \
                bundle["step"](self.params, bundle["opt_state"], self.rng,
                               batch, bundle["consts"])
            total += float(loss)
        return total

    def _train_epoch(self, train_data, epoch_idx, mode=None):
        enc_total = 0.0
        for _ in range(self.n_enc_epochs):
            enc_total += self._run_phase(train_data, "enc")
        self.params = self.model.update_prior(self.params)
        dec_total = 0.0
        for _ in range(self.n_dec_epochs):
            dec_total += self._run_phase(train_data, "dec")
        total = enc_total + dec_total
        if np.isnan(total):
            raise ValueError(f"Training loss is nan at epoch {epoch_idx}")
        return (enc_total, dec_total)


TRAINER_REGISTRY = {}


def register_trainer(name):
    def deco(cls):
        TRAINER_REGISTRY[name] = cls
        return cls
    return deco


def get_trainer(model_type, model_name):
    """parity: reference get_trainer (utils/utils.py:78-96) — model-specific
    trainer, else type default (KNOWLEDGE -> KGTrainer)."""
    if model_name in TRAINER_REGISTRY:
        return TRAINER_REGISTRY[model_name]
    builtin = {"KGAT": KGATTrainer, "MKR": MKRTrainer,
               "RecVAE": RecVAETrainer, "S3Rec": S3RecTrainer}
    if model_name in builtin:
        return builtin[model_name]
    if model_type is ModelType.TRADITIONAL:
        return TraditionalTrainer
    if model_type is ModelType.DECISIONTREE:
        return DecisionTreeTrainer
    if model_type is ModelType.KNOWLEDGE:
        return KGTrainer
    return Trainer
