"""Single-pass Adam sweep as a Pallas kernel.

Round-5 xplane traces of the Criteo CTR step: the (2.57M, 11) token-table
Adam update costs 1.73 ms/step no matter how the math is expressed in XLA
— optax's update/apply split emits multiply_add_fusion x4, and the inlined
single-expression form still splits into divide_subtract_fusion x3 (one
pass per output), each re-reading the operands. The true floor is ONE
read-modify-write sweep: read p, m, v, g and write p', m', v' in place.

This kernel does exactly that on the flat 1-D view of the leaf — and it
STILL LOSES, so it is GATED OFF (RECBOLE_TPU_PALLAS_ADAM=1 re-enables).
Measured at the Criteo token-table shape (2565692 x 11 = 28.2M f32),
chained fori_loop protocol, bit-exact vs the XLA expression:

  * (8192, 11) 2-D row blocks: compile failure (7 buffers x 128-lane
    tile padding blows VMEM);
  * (1024, 11) 2-D row blocks: epoch 5.6 -> 20.4 s (narrow-lane tile DMA
    ~36 GB/s — same disease ops/trm_layer.py documents for 3-D blocks);
  * flat (131072,) 1-D chunks: 15.2 vs XLA 2.7 ms/iter — 1-D block DMA
    is ALSO an order of magnitude off full bandwidth.

Conclusion: Mosaic only streams fat 2-D (rows, lanes>=64) blocks at full
bandwidth, and an 11-column table cannot be viewed that way without a
copy (N % 512 != 0; slicing/concatenating a tail costs a full extra
pass). The XLA 3-pass divide_subtract fusion (1.73 ms/step) stands as
the measured floor for the dense-adam protocol. Bias-correction factors
ride SMEM scalars (Mosaic has no powf); input_output_aliases updates
p/m/v in place.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_ELEMS = 1 << 20
_CHUNK = 1 << 17


def adam_kernel_supported(leaf):
    import os
    if not os.environ.get("RECBOLE_TPU_PALLAS_ADAM"):
        return False  # measured slower than the XLA sweep — see docstring
    return (jax.default_backend() in ("tpu", "axon")
            and leaf.dtype == jnp.float32 and leaf.size >= MIN_ELEMS)


@functools.lru_cache(maxsize=None)
def _make_call(N, b1, b2, lr, eps):
    grid = (pl.cdiv(N, _CHUNK),)

    def kern(s_ref, p_ref, m_ref, v_ref, g_ref, po_ref, mo_ref, vo_ref):
        c1, c2 = s_ref[0], s_ref[1]
        g = g_ref[:]
        m2 = b1 * m_ref[:] + (1.0 - b1) * g
        v2 = b2 * v_ref[:] + (1.0 - b2) * g * g
        po_ref[:] = p_ref[:] - lr * (m2 * c1) / (jnp.sqrt(v2 * c2) + eps)
        mo_ref[:] = m2
        vo_ref[:] = v2

    spec = pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[sspec, spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((N,), jnp.float32)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))


def adam_leaf_kernel(p, m, v, g, c1, c2, *, b1, b2, lr, eps):
    """One fused sweep: returns (p', m', v'), aliasing p/m/v in place.

    c1/c2 are the bias-correction reciprocals 1/(1-b^t) as traced scalars.
    """
    shape = p.shape
    N = p.size
    call = _make_call(N, float(b1), float(b2), float(lr), float(eps))
    s = jnp.stack([c1, c2]).astype(jnp.float32)
    p2, m2, v2 = call(s, p.reshape(-1), m.reshape(-1), v.reshape(-1),
                      g.astype(jnp.float32).reshape(-1))
    return p2.reshape(shape), m2.reshape(shape), v2.reshape(shape)
