"""Multi-host scaling benchmark: BPR (ml-1m shape) and DeepFM (Criteo shape)
training throughput under a data-parallel device mesh spanning all hosts.

Launch ONE copy per host of a pod slice (the config keys are the standard
recbole_tpu distributed keys, defaults.py:153-164):

  python scripts/bench_multihost.py \
      --coordinator=host0:8476 --num_processes=2 --process_id=0 &   # host 0
  python scripts/bench_multihost.py \
      --coordinator=host0:8476 --num_processes=2 --process_id=1     # host 1

On Cloud TPU pod slices jax can auto-detect the topology instead:
  python scripts/bench_multihost.py --auto

Single-host (degenerate N=1) needs no flags and is what CI smoke-tests; a
virtual 8-device CPU run is exercised by tests/test_sharding.py.

Output (process 0 only): one JSON line per benchmark with aggregate
examples/s, per-host examples/s, and scaling efficiency vs a single-chip
baseline you pass with --baseline_bpr= / --baseline_deepfm= (examples/s; use
the BENCH_r*.json numbers from the 1-chip driver run). Efficiency =
aggregate / (baseline * n_devices).

See docs/multihost.md for the pod-slice recipe.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv):
    args = {"coordinator": None, "num_processes": None, "process_id": None,
            "auto": False, "tiny": False, "baseline_bpr": None,
            "baseline_deepfm": None, "epochs": 3, "which": "bpr,deepfm"}
    for a in argv:
        if a == "--auto":
            args["auto"] = True
        elif a == "--tiny":
            args["tiny"] = True       # small shapes: CI smoke on CPU devices
        elif a.startswith("--") and "=" in a:
            k, v = a[2:].split("=", 1)
            args[k] = v
    return args


def bench_bpr(config_extra, epochs, tiny=False):
    """BPR at ml-1m shape through the real pipeline, sharded over "data"."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as driver_bench  # repo-root bench.py

    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.dataset import Dataset
    from recbole_tpu.data.utils import data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer
    from recbole_tpu.utils.enums import FeatureType, FeatureSource
    from recbole_tpu.utils.utils import init_seed, init_jax
    import jax

    config = Config("BPR", "ml-1m-synth", config_dict={
        "epochs": 1, "state": "ERROR", "valid_full_to_uni1000": False,
        "data_path": "/tmp", "checkpoint_dir": "/tmp/recbole_tpu_mh_saved",
        "log_dir": "/tmp/recbole_tpu_mh_log", **config_extra,
    }, _parse_cmd_line=False)
    init_jax(config)
    init_seed(config["seed"])

    if tiny:
        n_users, n_items, n = 500, 300, 20_000
        rng = np.random.RandomState(0)
        uids = rng.randint(1, n_users + 1, n).astype(np.int32)
        iids = rng.randint(1, n_items + 1, n).astype(np.int32)
        ts = np.arange(n, dtype=np.float32)
    else:
        n_users, n_items = driver_bench.N_USERS, driver_bench.N_ITEMS
        uids, iids, ts = driver_bench.synth_ml1m(driver_bench.CACHE)
    ds = Dataset(config, _build=False)
    ds.inter_feat = {"user_id": uids, "item_id": iids, "timestamp": ts}
    ds.field2type = {"user_id": FeatureType.TOKEN,
                     "item_id": FeatureType.TOKEN,
                     "timestamp": FeatureType.FLOAT}
    ds.field2source = {"user_id": FeatureSource.USER_ID,
                       "item_id": FeatureSource.ITEM_ID,
                       "timestamp": FeatureSource.INTERACTION}
    ds.field2id_token = {
        "user_id": np.array(
            ["[PAD]"] + [str(u) for u in range(1, n_users + 1)]),
        "item_id": np.array(
            ["[PAD]"] + [str(i) for i in range(1, n_items + 1)]),
    }
    ds.field2token_id = {f: {t: i for i, t in enumerate(v)}
                         for f, v in ds.field2id_token.items()}

    train_data, _, _ = data_preparation(config, ds)
    model = get_model("BPR")(config, train_data.dataset)
    trainer = get_trainer(config["MODEL_TYPE"], "BPR")(config, model)
    trainer.prepare(train_data)
    trainer._train_epoch(train_data, 0)        # compile warm-up

    t0 = time.time()
    for ep in range(1, 1 + epochs):
        trainer._train_epoch(train_data, ep)
    jax.block_until_ready(trainer.params)
    dt = (time.time() - t0) / epochs
    return len(train_data.dataset) / dt


def bench_deepfm(epochs):
    import bench_ctr
    n_train = int(bench_ctr.SHAPES["criteo"]["n"] * 0.8)
    train_s, _ = bench_ctr.bench_model("DeepFM", "criteo",
                                       epochs=max(epochs, 2))
    return n_train / train_s


def main():
    args = parse_args(sys.argv[1:])
    extra = {}
    if args["coordinator"]:
        extra = {"distributed_coordinator": args["coordinator"],
                 "distributed_num_processes": int(args["num_processes"]),
                 "distributed_process_id": int(args["process_id"])}
    elif args["auto"]:
        extra = {"distributed_auto_init": True}

    # data-parallel mesh over every device on every host
    import jax
    if extra:
        # init via the config path inside bench_bpr; but mesh size needs
        # device count, so initialize jax.distributed first here
        from recbole_tpu.utils.utils import init_jax
        from recbole_tpu.config.configurator import Config
        cfg0 = Config("BPR", "ml-1m-synth", config_dict=extra,
                      _parse_cmd_line=False)
        init_jax(cfg0)
    n_dev = jax.device_count()
    n_local = jax.local_device_count()
    pid = jax.process_index()
    mesh_extra = {"mesh_shape": {"data": n_dev}, **extra}

    results = {}
    which = args["which"].split(",")
    if "bpr" in which:
        eps = bench_bpr(mesh_extra, int(args["epochs"]), tiny=args["tiny"])
        results["bpr"] = eps
    if "deepfm" in which:
        try:
            results["deepfm"] = bench_deepfm(int(args["epochs"]))
        except Exception as e:  # noqa: BLE001 — keep the BPR result
            print(f"deepfm bench failed: {e}", file=sys.stderr)

    if pid != 0:
        return
    for name, eps in results.items():
        base = args.get(f"baseline_{name}")
        line = {
            "metric": f"{name} multihost train throughput",
            "value": round(eps, 1), "unit": "examples/s",
            "n_devices": n_dev, "n_hosts": n_dev // max(n_local, 1),
            "per_host_examples_s": round(eps / max(n_dev // n_local, 1), 1),
        }
        if base:
            ideal = float(base) * n_dev
            line["scaling_efficiency"] = round(eps / ideal, 3)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
