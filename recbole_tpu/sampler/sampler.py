"""Negative sampling, TPU-native.

Parity target: the reference's Sampler family (recbole/sampler/sampler.py) —
uniform/popularity distributions with phase-aware exclusion of each user's
already-interacted items (used_ids accumulate train < valid < test,
sampler.py:206-244).

Re-design: the reference's per-element Python rejection loop (sampler.py:144-153)
is the training-loop CPU hot spot. Here sampling happens ON DEVICE inside the
jitted train step: draw a fixed number of candidate rounds, test each candidate
against the user's history row (a dense (n_users, H) id matrix), and take the
first non-colliding candidate — branch-free, fixed shapes, no host round trips.
With R rounds the residual collision probability is density^R (< 1e-8 for
typical sparsity), a negligible bias the reference's exact loop avoids at ~100x
the wall-clock cost.
"""

import numpy as np
import jax
import jax.numpy as jnp


class PhaseHistory:
    """Per-phase used-ids tables as dense device matrices.

    Phase 'train' excludes train positives; 'valid' excludes train+valid;
    'test' excludes train+valid+test (parity: sampler.py:206-227).
    """

    def __init__(self, n_users, n_items, splits, max_history_len=None):
        """splits: ordered dict phase -> (uids, iids) numpy arrays."""
        self.n_users = n_users
        self.n_items = n_items
        self.phases = list(splits)
        self.history = {}
        self.hist_len = {}
        self.pop_items = {}
        acc_u, acc_i = [], []
        for phase, (uids, iids) in splits.items():
            acc_u.append(np.asarray(uids))
            acc_i.append(np.asarray(iids))
            u = np.concatenate(acc_u)
            i = np.concatenate(acc_i)
            hist, lens = _build_history(u, i, n_users, max_history_len)
            self.history[phase] = hist
            self.hist_len[phase] = lens
            # popularity distribution = observed item multiset (sampler.py:191-204)
            self.pop_items[phase] = i.astype(np.int32)
            self._acc_pairs = getattr(self, "_acc_pairs", {})
            self._acc_pairs[phase] = (u, i)

    def device_tables(self, phase):
        return (jnp.asarray(self.history[phase]),
                jnp.asarray(self.hist_len[phase]))

    def assert_sampleable(self, phase):
        """Raise when some user has interacted with every item — masked
        resampling would silently return a known positive for them (parity:
        reference raises at used-ids construction, sampler.py:220-226).
        Only called on non-repeatable sampling paths; sequential models
        (RepeatableSampler semantics) never exclude history."""
        u, i = self._acc_pairs[phase]
        # count DISTINCT items per user (duplicate interactions are kept by
        # default, so raw history length over-counts)
        pairs = np.unique(u.astype(np.int64) * self.n_items + i)
        distinct = np.bincount(pairs // self.n_items,
                               minlength=self.n_users)
        # n_items includes the [PAD] id 0, which is never a candidate
        dense = np.flatnonzero(distinct >= self.n_items - 1)
        if dense.size:
            raise ValueError(
                f"{dense.size} user(s) (e.g. ids {dense[:5].tolist()}) have "
                f"interacted with all {self.n_items - 1} items; negative "
                f"sampling cannot exclude their history. Use repeatable "
                f"sampling or reduce filtering.")


def _build_history(uids, iids, n_users, max_len=None):
    from ..data.dataset import build_history_matrix
    return build_history_matrix(uids, iids, n_users, max_len)


def sample_negatives(rng, user_ids, history, hist_len, n_items, num_neg,
                     rounds=8, pop_items=None):
    """Draw ``num_neg`` negatives per user, excluding their history. Jit-safe.

    Args:
        rng: jax PRNG key.
        user_ids: (B,) int32.
        history: (n_users, H) int32 padded with 0.
        hist_len: (n_users,) int32.
        n_items: static int (vocab incl. PAD at 0).
        num_neg: static int.
        rounds: static int — bounded resample rounds.
        pop_items: optional (M,) int32 observed-item multiset for popularity
            sampling; None = uniform over [1, n_items).

    Returns:
        (B, num_neg) int32 item ids.
    """
    B = user_ids.shape[0]
    H = history.shape[1]
    if pop_items is None:
        cand = jax.random.randint(rng, (rounds, B, num_neg), 1, n_items,
                                  dtype=jnp.int32)
    else:
        idx = jax.random.randint(rng, (rounds, B, num_neg), 0,
                                 pop_items.shape[0], dtype=jnp.int32)
        cand = pop_items[idx]

    user_hist = history[user_ids]                              # (B, H)
    valid = (jnp.arange(H)[None, :] < hist_len[user_ids][:, None])
    # collide[r, b, j] = candidate in user's history
    collide = jnp.any(
        (cand[:, :, :, None] == user_hist[None, :, None, :]) & valid[None, :, None, :],
        axis=-1)
    ok = ~collide                                              # (R, B, k)
    first_ok = jnp.argmax(ok, axis=0)                          # first True round
    chosen = jnp.take_along_axis(cand, first_ok[None], axis=0)[0]
    return chosen


def sample_negatives_unchecked(rng, shape, n_items, pop_items=None):
    """Uniform/popularity draw without exclusion (RepeatableSampler semantics,
    sampler.py:341-420 — sequential models allow repeats)."""
    if pop_items is None:
        return jax.random.randint(rng, shape, 1, n_items, dtype=jnp.int32)
    idx = jax.random.randint(rng, shape, 0, pop_items.shape[0], dtype=jnp.int32)
    return pop_items[idx]
