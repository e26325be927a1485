"""Op-level xplane breakdown of a real CTR train step at Criteo shape.

Reuses bench_ctr's dataset/model/trainer setup (the exact path the PARITY
tables measure) and prints the top device ops.

Usage: python scripts/profile_ctr_step.py [FM|DeepFM|...] [steps]
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
    model_name = sys.argv[1] if len(sys.argv) > 1 else "FM"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax
    import bench_ctr
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer

    cfg = Config(model_name, "criteo", config_dict={
        "data_path": "/tmp", "state": "ERROR",
        "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
        "USER_ID_FIELD": None, "ITEM_ID_FIELD": None,
        "LABEL_FIELD": "label", "TIME_FIELD": None,
    }, _parse_cmd_line=False)
    if "criteo" not in bench_ctr._LOADER_CACHE:
        ds = bench_ctr.synth_ctr_dataset(cfg, bench_ctr.SHAPES["criteo"])
        bench_ctr._LOADER_CACHE["criteo"] = data_preparation(cfg, ds)
    train, _, _ = bench_ctr._LOADER_CACHE["criteo"]
    model = get_model(model_name)(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], model_name)(cfg, model)
    trainer.prepare(train)
    trainer._train_epoch(train, 0)          # compile + warm
    jax.block_until_ready(trainer.params)

    d = tempfile.mkdtemp(prefix="ctr_trace_")
    with jax.profiler.trace(d):
        trainer._train_epoch(train, 1)
        jax.block_until_ready(trainer.params)

    files = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    n_steps = max(1, len(train))
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
            for name, ns in agg.most_common(20):
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
                print(f"   {ns / 1e3 / n_steps:8.1f} us/step  {desc[:120]}")


if __name__ == "__main__":
    main()
