"""Lazy (sparse) Adam: torch.optim.SparseAdam semantics over dense grads.

Parity target: the reference's ``learner: sparse_adam`` constructs
torch.optim.SparseAdam (recbole/trainer/trainer.py:123). Its semantics differ
from dense Adam in one way: rows the current step did NOT touch keep their
moments un-decayed and their values un-stepped (no "ghost" updates from
momentum). Bias correction uses the global step count, like torch.

JAX grads are dense pytrees; a row's touched-ness is recovered as "any
nonzero gradient entry in the row" (leading axis for >=2-D params,
elementwise for 1-D/0-D). This matches SparseAdam exactly except for the
measure-zero case of a touched row whose gradient is exactly 0.0 — torch
would decay its moments, we skip it.

The moment update stays a dense masked read/write (bandwidth, not scatter);
this transform is a SEMANTICS fix, not a bandwidth fix — measured
perf-neutral vs dense adam in the round-4 Criteo A/B. The structural perf
lever for huge CTR tables is the field-grouped backward
(ops/embed_grad.py::grouped_take_rows, the TPU default in
models/context/context_base.py::_lookup). weight_decay is
warned-and-dropped for this learner, matching torch SparseAdam (reference
trainer.py:123-126) and preserving the g != 0 touched-row mask (decay
would make every row's update nonzero).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LazyAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def lazy_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
    def init_fn(params):
        zeros = jax.tree.map(
            lambda p: jnp.zeros_like(p) if jnp.issubdtype(
                jnp.asarray(p).dtype, jnp.floating) else jnp.zeros(()), params)
        return LazyAdamState(count=jnp.zeros([], jnp.int32),
                             mu=zeros,
                             nu=jax.tree.map(jnp.copy, zeros))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        step_size = learning_rate * jnp.sqrt(bc2) / bc1

        def upd(g, m, v):
            if g.ndim >= 2:
                touched = jnp.any(g != 0, axis=tuple(range(1, g.ndim)),
                                  keepdims=True)
            else:
                touched = g != 0
            new_m = jnp.where(touched, b1 * m + (1 - b1) * g, m)
            new_v = jnp.where(touched, b2 * v + (1 - b2) * g * g, v)
            delta = jnp.where(
                touched, -step_size * new_m / (jnp.sqrt(new_v) + eps), 0.0)
            return delta, new_m, new_v

        flat_g, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, v) for g, m, v in zip(flat_g, flat_m, flat_v)]
        deltas = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return deltas, LazyAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
