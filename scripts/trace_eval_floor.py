"""Publishable evidence for the GCSAN (and sibling) eval rows: device
compute time vs wall time for one full-sort eval pass at ml-1m shape.
The claim under test (PARITY.md): the ~60ms eval wall time on this
tunneled chip is dispatch-floor-bound, not compute-bound.

Usage: python scripts/trace_eval_floor.py [GCSAN ...]
"""

import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import bench_models
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer

    models = sys.argv[1:] or ["GCSAN"]
    root = bench_models.synth_ml1m_dir()
    for name in models:
        cfg = Config(name, "ml1m", config_dict={
            "data_path": root, "state": "ERROR",
            "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
            "epochs": 1, "valid_full_to_uni1000": False,
            "load_col": {"inter": ["user_id", "item_id", "rating",
                                   "timestamp"]},
            "MAX_ITEM_LIST_LENGTH": 50,
        }, _parse_cmd_line=False)
        ds = create_dataset(cfg)
        train, valid, test = data_preparation(cfg, ds)
        m = get_model(name)(cfg, train.dataset)
        trainer = get_trainer(cfg["MODEL_TYPE"], name)(cfg, m)
        trainer.prepare(train)
        trainer._train_epoch(train, 0)
        trainer.evaluate(test, load_best_model=False)     # compile + warm

        t0 = time.time()
        trainer.evaluate(test, load_best_model=False)
        wall_ms = (time.time() - t0) * 1e3

        d = tempfile.mkdtemp(prefix=f"evaltrace_{name}_")
        with jax.profiler.trace(d):
            trainer.evaluate(test, load_best_model=False)
        files = glob.glob(os.path.join(d, "**", "*.xplane.pb"),
                          recursive=True)
        dev_ms = ops = None
        if files:
            pd = jax.profiler.ProfileData.from_serialized_xspace(
                open(files[0], "rb").read())
            for plane in pd.planes:
                if plane.name != "/device:TPU:0":
                    continue
                for line in plane.lines:
                    if line.name != "XLA Ops":
                        continue
                    tot = 0
                    n = 0
                    for ev in line.events:
                        tot += ev.duration_ns
                        n += 1
                    dev_ms, ops = tot / 1e6, n
        print(f"{name}: eval wall {wall_ms:.1f} ms | device-op time "
              f"{dev_ms and round(dev_ms, 2)} ms over {ops} ops | "
              f"host/dispatch overhead {wall_ms - (dev_ms or 0):.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
