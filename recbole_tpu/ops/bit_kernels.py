"""Pallas kernels for the packed-bit restricted graph ops (ops/bitgraph.py).

The XLA path of restricted_rows_apply materializes the unpacked (R, K) bf16
bit matrix in HBM — ~800MB per op at Yelp scale (R=4096, K~100K), ~2ms of
pure HBM traffic, several times per step. These kernels unpack IN VMEM and
feed the MXU directly, so HBM sees only the packed bytes (R*K/8), the
operand v and the (R, D) result.

Bit layout (matches bitgraph._pack_side): column c of the binary matrix
lives at bit (c % 8) of byte c // 8. Instead of assembling the (R, K)
unpack, each kernel runs 8 SHIFT PLANES: plane s = (bytes >> s) & 1 is a
(R, nbytes) 0/1 matrix whose column b corresponds to matrix column b*8+s,
so with v pre-permuted to v_perm[s] = v[s::8] (done once outside in XLA)

    B[rows] @ v  ==  sum_s  plane_s @ v_perm[s]

— all-2D VPU work (no lane reshuffles) and one MXU dot per plane. The
transposed op contracts over R instead and emits the per-plane outputs,
un-permuted outside.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_BLOCK = 256
B_BLOCK = 256        # bytes per block -> 2048 matrix columns


def kernel_ok(R, nbytes, platform=None):
    plat = platform or jax.default_backend()
    return (plat in ("tpu", "axon") and R % R_BLOCK == 0
            and nbytes % B_BLOCK == 0)


def _rows_kernel(packed_ref, vperm_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bytes_i32 = packed_ref[:].astype(jnp.int32)
    acc = out_ref[:]
    for s in range(8):
        plane = ((bytes_i32 >> s) & 1).astype(jnp.bfloat16)
        acc += jnp.dot(plane, vperm_ref[s],
                       preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnums=())
def bit_rows_matmul(packed_sel, v_perm):
    """packed_sel (R, nbytes) uint8 (rows already gathered);
    v_perm (8, nbytes, D) bf16. Returns (R, D) f32 = B_sel @ v."""
    R, nbytes = packed_sel.shape
    D = v_perm.shape[2]
    grid = (R // R_BLOCK, nbytes // B_BLOCK)
    return pl.pallas_call(
        _rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R_BLOCK, B_BLOCK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B_BLOCK, D), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_BLOCK, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
    )(packed_sel, v_perm)


def _cols_kernel(packed_ref, g_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bytes_i32 = packed_ref[:].astype(jnp.int32)
    g = g_ref[:]
    for s in range(8):
        plane = ((bytes_i32 >> s) & 1).astype(jnp.bfloat16)
        # contract over R: (R_BLOCK, B_BLOCK)^T @ (R_BLOCK, D)
        out_ref[s] += jax.lax.dot_general(
            plane, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=())
def bit_cols_matmul(packed_sel, g):
    """packed_sel (R, nbytes) uint8; g (R, D) bf16. Returns the per-plane
    (8, nbytes, D) f32 of B_sel^T @ g (un-permute outside:
    transpose(1,0,2).reshape(nbytes*8, D))."""
    R, nbytes = packed_sel.shape
    D = g.shape[1]
    grid = (nbytes // B_BLOCK, R // R_BLOCK)
    return pl.pallas_call(
        _cols_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R_BLOCK, B_BLOCK), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_BLOCK, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, B_BLOCK, D), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, nbytes, D), jnp.float32),
    )(packed_sel, g)


def perm_planes(v):
    """(K, D) -> (8, K//8, D) with perm[s] = v[s::8] (shift-plane order)."""
    K, D = v.shape
    return v.reshape(K // 8, 8, D).transpose(1, 0, 2)


def unperm_planes(p):
    """(8, nbytes, D) -> (nbytes*8, D), inverse of perm_planes."""
    return p.transpose(1, 0, 2).reshape(-1, p.shape[2])
