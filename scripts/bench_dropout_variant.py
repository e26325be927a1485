"""A/B the dropout rng-shape variants on the SASRec forward+grad
(see layers.dropout_apply / RECBOLE_TPU_DROPOUT_SHAPE)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ITEMS = 3707
ITERS = 30


class _Info:
    user_num = 6041
    item_num = N_ITEMS


def main():
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.models import get_model

    B, L = 2048, 50
    cfg = Config("SASRec", "synthetic", config_dict={
        "MAX_ITEM_LIST_LENGTH": L}, _parse_cmd_line=False)
    model = get_model("SASRec")(cfg, _Info())
    params = model.zero_pad_rows(model.init_params(
        jax.random.key(0, impl="rbg")))
    key = jax.random.key(1, impl="rbg")
    ks, kp = jax.random.split(key)
    seq = jax.random.randint(ks, (B, L), 1, N_ITEMS, jnp.int32)
    slen = jnp.full((B,), L, jnp.int32)
    pos = jax.random.randint(kp, (B,), 1, N_ITEMS, jnp.int32)
    batch = {model.ITEM_SEQ: seq, model.ITEM_SEQ_LEN: slen,
             model.POS_ITEM_ID: pos, model.ITEM_ID: pos}

    for variant in ("", "2d", "flat"):
        os.environ.pop("RECBOLE_TPU_DROPOUT_SHAPE", None)
        if variant:
            os.environ["RECBOLE_TPU_DROPOUT_SHAPE"] = variant

        @jax.jit
        def run(params, seq0, rng):
            def body(i, carry):
                r, acc = carry
                r, k1, k2 = jax.random.split(r, 3)
                b = dict(batch)
                b[model.ITEM_SEQ] = jnp.roll(seq0, i, axis=0)
                l, g = jax.value_and_grad(
                    lambda p: model.calculate_loss(p, b, k2))(params)
                return r, acc + l + jnp.max(jnp.abs(g["item_embedding"]))
            _, acc = jax.lax.fori_loop(0, ITERS, body,
                                       (rng, jnp.float32(0)))
            return acc

        try:
            s = float(np.asarray(run(params, seq,
                                     jax.random.key(2, impl="rbg"))))
            t0 = time.time()
            s = float(np.asarray(run(params, seq,
                                     jax.random.key(2, impl="rbg"))))
            dt = (time.time() - t0) / ITERS * 1e3
            print(f"dropout[{variant or '4d'}] grad: {dt:8.3f} ms/iter "
                  f"(sink {s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"dropout[{variant or '4d'}] FAILED: {str(e)[:150]}",
                  flush=True)
    os.environ.pop("RECBOLE_TPU_DROPOUT_SHAPE", None)


if __name__ == "__main__":
    main()
