"""Tiny-shape TPU probe of the bit kernels (run FIRST after a worker crash
to bisect kernel-fault vs consts-OOM). Each case under its own try."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from recbole_tpu.ops.bit_kernels import (
        bit_rows_matmul, bit_cols_matmul, perm_planes, unperm_planes)
    from recbole_tpu.ops.bitgraph import _unpack_bits

    rng = np.random.RandomState(0)
    for (R, nbytes, D) in [(256, 256, 64), (512, 512, 64), (2048, 12544, 64)]:
        packed = jnp.asarray(rng.randint(0, 256, (R, nbytes)).astype(np.uint8))
        v = jnp.asarray(rng.randn(nbytes * 8, D).astype(np.float32)) \
            .astype(jnp.bfloat16)
        g = jnp.asarray(rng.randn(R, D).astype(np.float32)) \
            .astype(jnp.bfloat16)
        small = R * nbytes <= 512 * 512
        for name, fn in [
            ("rows", lambda: bit_rows_matmul(packed, perm_planes(v))),
            ("cols", lambda: unperm_planes(bit_cols_matmul(packed, g))),
        ]:
            try:
                t0 = time.time()
                out = np.asarray(fn())
                ok = "ok"
                if small:
                    dense = np.asarray(_unpack_bits(packed)).astype(np.float32)
                    ref = (dense @ np.asarray(v.astype(jnp.float32))
                           if name == "rows"
                           else dense.T @ np.asarray(g.astype(jnp.float32)))
                    ok = "ok+exact" if np.allclose(out, ref, rtol=1e-2,
                                                   atol=1e-2) else "WRONG"
                print(f"{name} R={R} nbytes={nbytes}: {ok} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} R={R} nbytes={nbytes}: FAILED {str(e)[:150]}",
                      flush=True)


if __name__ == "__main__":
    main()
