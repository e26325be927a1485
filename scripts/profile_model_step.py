"""Op-level xplane breakdown of ANY model's train step at ml-1m shape.

Reuses bench_models' synth-ml-1m setup (the exact path PARITY's 46-row
table measures) and prints the top device ops for one traced epoch.

Usage: python scripts/profile_model_step.py <Model> [epochs_to_trace=1]
"""

import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "RippleNet"

    import jax
    import bench_models
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import data_preparation, create_dataset
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer

    root = bench_models.synth_ml1m_dir()
    cfg = Config(model_name, "ml1m", config_dict={
        "data_path": root, "state": "ERROR",
        "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
        "epochs": 2, "valid_full_to_uni1000": False,
    }, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model(model_name)(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], model_name)(cfg, model)
    trainer.prepare(train)
    trainer._train_epoch(train, 0)
    jax.block_until_ready(trainer.params)

    d = tempfile.mkdtemp(prefix=f"{model_name}_trace_")
    with jax.profiler.trace(d):
        trainer._train_epoch(train, 1)
        jax.block_until_ready(trainer.params)

    files = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    try:
        n_steps = max(1, len(train))
    except TypeError:
        n_steps = 1
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = ev.name.split(" = ")[0]
                name = re.sub(r"\.\d+$", "", name.strip("%"))
                if name.isdigit():
                    name = "<step>"
                agg[name] += ev.duration_ns
                cnt[name] += 1
            total = sum(agg.values())
            print(f"-- {line.name}: {total / 1e6 / n_steps:.3f} "
                  f"ms/step summed over {n_steps} steps")
            for name, ns in agg.most_common(18):
                print(f"   {ns / 1e6 / n_steps:8.4f} ms/step "
                      f"{100 * ns / total:5.1f}% x{cnt[name] // n_steps:<4d}"
                      f" {name[:70]}")
            best = {}
            for ev in line.events:
                nm = re.sub(r"\.\d+$", "", ev.name)
                if ev.duration_ns > best.get(nm, (0, ""))[0]:
                    stmt = ""
                    try:
                        for sn, sv in ev.stats:
                            if "long_name" in sn or "hlo" in sn.lower():
                                stmt = str(sv)[:110]
                    except Exception:  # noqa: BLE001
                        pass
                    best[nm] = (ev.duration_ns, f"{ev.name} | {stmt}")
            print("-- top instances:")
            for ns, desc in sorted((v for v in best.values()),
                                   reverse=True)[:14]:
                print(f"   {ns / 1e3 / n_steps:8.1f} us/step  {desc[:125]}")


if __name__ == "__main__":
    main()
