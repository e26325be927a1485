"""Built-in default configuration.

The key names form the compatibility surface with the reference framework
(recbole/properties/overall.yaml + properties/dataset/sample.yaml): user config
files written for the reference must work unchanged. Values match the reference
defaults; TPU-specific knobs are added under new keys (never reused names).
"""

# --- global defaults (parity: recbole/properties/overall.yaml) ---
GENERAL_DEFAULTS = {
    "gpu_id": 0,            # kept for config compat; ignored on TPU
    "use_gpu": True,        # kept for config compat; ignored on TPU
    # jax platform override ("cpu" to force host execution, e.g. when no
    # accelerator is reachable); None = jax's default platform selection.
    # NOTE: the JAX_PLATFORMS env var cannot override a preinstalled PJRT
    # plugin in some images — this knob uses jax.config, which can.
    "platform": None,
    "seed": 2020,
    "state": "INFO",
    "reproducibility": True,
    "data_path": "dataset/",
    "checkpoint_dir": "saved",
    "show_progress": True,
    "log_dir": "./log",
}

TRAINING_DEFAULTS = {
    "epochs": 300,
    "train_batch_size": 2048,
    "learner": "adam",
    "learning_rate": 0.001,
    "training_neg_sample_num": 1,
    "training_neg_sample_distribution": "uniform",
    "eval_step": 1,
    "stopping_step": 10,
    "clip_grad_norm": None,
    "weight_decay": 0.0,
    "draw_loss_pic": False,
    # --- TPU-native additions ---
    "param_dtype": "float32",       # master params
    # "auto": bfloat16 towers on TPU for MXU-heavy families (sequential),
    # float32 elsewhere/off-TPU; set explicitly to force either
    "compute_dtype": "auto",
    "neg_sampling_resample_rounds": 8,  # bounded device-side rejection rounds
    # 'rbg' uses the TPU hardware RNG path (threefry compiles pathologically
    # slowly on TPU); set 'threefry2x32' for cross-backend bit-exactness
    "prng_impl": "rbg",
    "donate_buffers": True,
    # whole-epoch device-resident lax.scan training (one dispatch per epoch);
    # falls back to per-batch streaming when the table exceeds the byte cap
    "scan_epochs": True,
    "scan_epochs_max_bytes": 2 << 30,
    "profile_trace_dir": None,          # jax.profiler trace output (fork: torch profiler)
    # fused Pallas attention (mask+softmax+dropout+matmuls in one kernel,
    # TPU only; XLA path used automatically anywhere it doesn't apply.
    # "layer2" = the round-5 whole-layer bf16 Pallas kernel
    # (ops/trm_layer.py: masked-head attention, flat-2D HBM streaming) —
    # measured 10.10 vs 11.56 ms/step on the full SASRec ml-1m train step
    # (per-layer fwd+bwd 3.43 vs 4.2 ms, XLA's 4.2 ms/step of
    # (B,H,L,L) layout copies collapse to 0.4). True/"attention" = the
    # round-4 attention-only kernel (net-neutral at catalog shapes);
    # "layer" = the round-4 fp32 whole-layer kernel (measured slower —
    # kept as the pinned-correct single-dispatch reference). False = pure
    # XLA. Unsupported shapes/platforms fall back automatically.
    "fused_attention": "layer2",
    # KG trainer loop policies (parity: KGTrainer/MKRTrainer config keys)
    "train_rec_step": None,
    "train_kg_step": None,
    "kge_interval": 3,
}

EVALUATION_DEFAULTS = {
    "eval_setting": "RO_RS,full",
    "group_by_user": True,
    "split_ratio": [0.8, 0.1, 0.1],
    "leave_one_num": 2,
    "real_time_process": False,
    "metrics": ["Recall", "MRR", "NDCG", "Hit", "Precision"],
    "topk": [10],
    "valid_metric": "MRR@10",
    "valid_metric_bigger": True,
    "eval_batch_size": 4096,
    # fused full-sort eval (models exposing full_sort_query): score in
    # bfloat16 on the MXU and/or use the Pallas streaming top-k kernel
    "eval_score_dtype": "float32",
    "use_pallas_topk": False,
    # persistent XLA compilation cache (set None to disable); repeated runs
    # of the same model/shape skip the multi-second TPU compile entirely
    "compilation_cache_dir": "/tmp/recbole_tpu_xla_cache",
    "loss_decimal_place": 4,
    "metric_decimal_place": 4,
    # fork behavior (reference data/utils.py:84-88): when eval is full-sort and no
    # benchmark files exist, validation is downgraded to uniform-1000 sampled eval.
    "valid_full_to_uni1000": False,
    # fork flags (reference data/utils.py:244-252)
    "train_use_dataset_negatives": False,
    "eval_use_dataset_negatives": False,
    "train_use_bothway_sampler": False,
    "eval_use_bothway_sampler": False,
}

DATASET_DEFAULTS = {
    # atomic file format
    "field_separator": "\t",
    "seq_separator": " ",
    # common fields
    "USER_ID_FIELD": "user_id",
    "ITEM_ID_FIELD": "item_id",
    "RATING_FIELD": "rating",
    "TIME_FIELD": "timestamp",
    "seq_len": None,
    # pointwise label
    "LABEL_FIELD": "label",
    "threshold": None,
    # pairwise negative prefix
    "NEG_PREFIX": "neg_",
    # selective loading
    "load_col": {"inter": ["user_id", "item_id"]},
    "unload_col": None,
    "unused_col": None,
    "additional_feat_suffix": None,
    # filtering
    "rm_dup_inter": None,
    "lowest_val": None,
    "highest_val": None,
    "equal_val": None,
    "not_equal_val": None,
    "filter_inter_by_user_or_item": True,
    "max_user_inter_num": None,
    "min_user_inter_num": 0,
    "max_item_inter_num": None,
    "min_item_inter_num": 0,
    # preprocessing
    "fields_in_same_space": None,
    "preload_weight": None,
    "normalize_field": None,
    "normalize_all": None,
    # sequential
    "ITEM_LIST_LENGTH_FIELD": "item_length",
    "LIST_SUFFIX": "_list",
    "MAX_ITEM_LIST_LENGTH": 50,
    "POSITION_FIELD": "position_id",
    # knowledge graph
    "HEAD_ENTITY_ID_FIELD": "head_id",
    "TAIL_ENTITY_ID_FIELD": "tail_id",
    "RELATION_ID_FIELD": "relation_id",
    "ENTITY_ID_FIELD": "entity_id",
    # social
    "SOURCE_ID_FIELD": "source_id",
    "TARGET_ID_FIELD": "target_id",
    # pre-split benchmark files
    "benchmark_filename": None,
}

PARALLEL_DEFAULTS = {
    # TPU-native scale-out knobs (no reference equivalent; reference is
    # single-device only, see SURVEY.md §2.10)
    "mesh_shape": None,          # e.g. {"data": 4, "model": 2}; None = single device
    "shard_item_embeddings": False,
    "shard_full_sort": True,     # shard full-sort scoring over the item axis
    # multi-host bootstrap (jax.distributed). On TPU pod slices leave the
    # coordinator unset and flip distributed_auto_init: True — jax
    # auto-detects the coordinator/process topology from the TPU runtime.
    # For explicit topologies (incl. multi-process CPU simulation) set all
    # three keys; every process must run the same program.
    "distributed_auto_init": False,
    "distributed_coordinator": None,   # "host0:1234"
    "distributed_num_processes": None,
    "distributed_process_id": None,
}

DEFAULTS = {
    **GENERAL_DEFAULTS,
    **TRAINING_DEFAULTS,
    **EVALUATION_DEFAULTS,
    **DATASET_DEFAULTS,
    **PARALLEL_DEFAULTS,
}

# categorized key lists for pretty-printing (parity: recbole/utils/argument_list.py)
ARGUMENT_CATEGORIES = {
    "General Hyper Parameters": list(GENERAL_DEFAULTS),
    "Training Hyper Parameters": list(TRAINING_DEFAULTS),
    "Evaluation Hyper Parameters": list(EVALUATION_DEFAULTS),
    "Dataset Hyper Parameters": list(DATASET_DEFAULTS),
    "Parallelism Hyper Parameters": list(PARALLEL_DEFAULTS),
}
