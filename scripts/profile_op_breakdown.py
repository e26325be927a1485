"""Op-level time breakdown of a SASRec train step via jax.profiler +
ProfileData xplane parsing. Prints the top ops by total device time.

Usage: python scripts/profile_op_breakdown.py [B] [L] [steps]
"""

import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

N_ITEMS = 3707


class _Info:
    user_num = 6041
    item_num = N_ITEMS


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.models import get_model

    extra = {}
    if os.environ.get("RECBOLE_TPU_FUSED_ATTENTION"):
        extra["fused_attention"] = os.environ["RECBOLE_TPU_FUSED_ATTENTION"]
    cfg = Config("SASRec", "synthetic", config_dict={
        "MAX_ITEM_LIST_LENGTH": L, **extra}, _parse_cmd_line=False)
    model = get_model("SASRec")(cfg, _Info())
    params = model.zero_pad_rows(model.init_params(
        jax.random.key(0, impl="rbg")))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    key = jax.random.key(1, impl="rbg")
    ks, kp = jax.random.split(key)
    seq = jax.random.randint(ks, (B, L), 1, N_ITEMS, jnp.int32)
    slen = jnp.full((B,), L, jnp.int32)
    pos = jax.random.randint(kp, (B,), 1, N_ITEMS, jnp.int32)
    batch = {model.ITEM_SEQ: seq, model.ITEM_SEQ_LEN: slen,
             model.POS_ITEM_ID: pos, model.ITEM_ID: pos}

    @jax.jit
    def step(params, opt_state, rng):
        rng, k = jax.random.split(rng)

        def loss_fn(p):
            return model.calculate_loss(p, batch, k)

        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, rng, l

    rng = jax.random.key(2, impl="rbg")
    params, opt_state, rng, l = step(params, opt_state, rng)   # compile
    float(l)

    d = tempfile.mkdtemp(prefix="sasrec_trace_")
    with jax.profiler.trace(d):
        for _ in range(steps):
            params, opt_state, rng, l = step(params, opt_state, rng)
        float(l)

    files = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    import re
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())
    for plane in pd.planes:
        print(f"== plane {plane.name}")
        for line in plane.lines:
            agg = collections.Counter()
            cnt = collections.Counter()
            n_ev = 0
            for ev in line.events:
                n_ev += 1
                # group %opname.123 -> opname; drop pure step numbers
                name = ev.name.split(" = ")[0]
                name = re.sub(r"\.\d+$", "", name.strip("%"))
                if name.isdigit():
                    name = "<step>"
                agg[name] += ev.duration_ns
                cnt[name] += 1
            if n_ev < 10:
                continue
            total = sum(agg.values())
            print(f"-- line {line.name}: {n_ev} events, "
                  f"{total / 1e6 / steps:.3f} ms/step summed")
            for name, ns in agg.most_common(25):
                print(f"   {ns / 1e6 / steps:8.4f} ms/step {100 * ns / total:5.1f}%"
                      f" x{cnt[name] // steps:<4d} {name[:80]}")
            if line.name == "XLA Ops":
                # individual copy/fusion events by duration, with shapes
                # (metadata carries the full HLO text for some events)
                best = {}
                for ev in line.events:
                    nm = ev.name
                    if nm.split(".")[0].strip("%") not in (
                            "copy", "fusion", "while",
                            "multiply_convert_fusion"):
                        continue
                    key = re.sub(r"\.\d+$", "", nm)
                    if ev.duration_ns > best.get(key, (0, ""))[0]:
                        stmt = ""
                        try:
                            for sn, sv in ev.stats:
                                if "long_name" in sn or "hlo" in sn.lower() \
                                        or "expression" in sn.lower():
                                    stmt = str(sv)[:160]
                        except Exception:  # noqa: BLE001
                            pass
                        best[key] = (ev.duration_ns, stmt)
                top = sorted(best.items(), key=lambda kv: -kv[1][0])[:20]
                print("-- top copy/fusion instances:")
                for key, (ns, stmt) in top:
                    print(f"   {ns / 1e3:9.1f} us  {key[:60]} | {stmt}")


if __name__ == "__main__":
    main()
