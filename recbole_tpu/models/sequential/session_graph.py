"""Session-graph machinery shared by SRGNN and GCSAN.

Parity target: reference SRGNN/GCSAN `_get_slice` + gated GNN
(recbole/model/sequential_recommender/srgnn.py:28-120, 148-186) — the reference
builds per-session adjacency matrices in a host Python loop with np.unique.

TPU re-design: the graph is built INSIDE the jitted step, branch-free:
  * node slots are sequence positions; duplicates alias to their FIRST
    occurrence via an (L, L) equality-argmax (argmax returns the first max,
    so alias is deterministic). L is 50 by default, so the O(L^2) alias
    matrix is trivial next to the embedding matmuls.
  * edges t->t+1 scatter into a dense (L, L) adjacency with `.at[].max`
    (the reference sets entries to 1, not add).
  * in/out-degree normalized propagation is two batched (B,L,L)x(B,L,D)
    matmuls — exactly the MXU-shaped work XLA tiles well.
"""

import jax
import jax.numpy as jnp

from ..layers import xavier_uniform


def session_graph(seq, seq_len):
    """Build alias + normalized in/out adjacency from padded sequences.

    Args:
        seq: (B, L) int item ids, 0-padded.
        seq_len: (B,) valid lengths.

    Returns:
        alias: (B, L) int32 — node slot (first-occurrence position) per step.
        a_in:  (B, L, L) — A_in[i, j] = A[j, i] / in_deg(i)   (incoming msg)
        a_out: (B, L, L) — A_out[i, j] = A[i, j] / out_deg(i) (outgoing msg)
    """
    B, L = seq.shape
    eq = seq[:, :, None] == seq[:, None, :]                      # (B, L, L)
    alias = jnp.argmax(eq, axis=2).astype(jnp.int32)             # first occurrence

    # edge (alias[t] -> alias[t+1]) for t+1 < seq_len
    src = alias[:, :-1]
    dst = alias[:, 1:]
    valid = (jnp.arange(1, L)[None, :] < seq_len[:, None])       # (B, L-1)

    def one_adj(s, d, v):
        return jnp.zeros((L, L), jnp.float32).at[s, d].max(v.astype(jnp.float32))

    adj = jax.vmap(one_adj)(src, dst, valid)                     # (B, L, L)
    in_deg = jnp.maximum(jnp.sum(adj, axis=1), 1.0)              # (B, L)
    out_deg = jnp.maximum(jnp.sum(adj, axis=2), 1.0)             # (B, L)
    a_in = jnp.swapaxes(adj, 1, 2) / in_deg[:, :, None]
    a_out = adj / out_deg[:, :, None]
    return alias, a_in, a_out


def gnn_init(rng, hidden, bias_edges=True):
    """Gated session-GNN parameters (parity: SRGNN GNN module,
    srgnn.py:28-54; GCSAN's variant drops the edge biases)."""
    ks = jax.random.split(rng, 6)
    p = {
        "w_ih": xavier_uniform(ks[0], (2 * hidden, 3 * hidden)),
        "w_hh": xavier_uniform(ks[1], (hidden, 3 * hidden)),
        "b_ih": jnp.zeros((3 * hidden,)),
        "b_hh": jnp.zeros((3 * hidden,)),
        "w_in": xavier_uniform(ks[2], (hidden, hidden)),
        "b_in": jnp.zeros((hidden,)),
        "w_out": xavier_uniform(ks[3], (hidden, hidden)),
        "b_out": jnp.zeros((hidden,)),
    }
    if bias_edges:
        p["b_iah"] = jnp.zeros((hidden,))
        p["b_ioh"] = jnp.zeros((hidden,))
    return p


def gnn_apply(p, a_in, a_out, hidden, steps):
    """`steps` rounds of gated propagation (parity: GNNCell, srgnn.py:44-72)."""
    for _ in range(steps):
        msg_in = jnp.einsum("blm,bmd->bld", a_in,
                            jnp.dot(hidden, p["w_in"],
                                    preferred_element_type=jnp.float32) + p["b_in"])
        msg_out = jnp.einsum("blm,bmd->bld", a_out,
                             jnp.dot(hidden, p["w_out"],
                                     preferred_element_type=jnp.float32) + p["b_out"])
        if "b_iah" in p:
            msg_in = msg_in + p["b_iah"]
            msg_out = msg_out + p["b_ioh"]
        inputs = jnp.concatenate([msg_in, msg_out], axis=-1)     # (B, L, 2D)
        gi = jnp.dot(inputs, p["w_ih"],
                     preferred_element_type=jnp.float32) + p["b_ih"]
        gh = jnp.dot(hidden, p["w_hh"],
                     preferred_element_type=jnp.float32) + p["b_hh"]
        i_r, i_i, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_i, h_n = jnp.split(gh, 3, axis=-1)
        reset = jax.nn.sigmoid(i_r + h_r)
        update = jax.nn.sigmoid(i_i + h_i)
        new = jnp.tanh(i_n + reset * h_n)
        hidden = (1 - update) * hidden + update * new
    return hidden
