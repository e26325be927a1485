"""Case-study helpers: ad-hoc full-sort scoring / top-k for chosen users.

Parity target: reference case_study.py (recbole/utils/case_study.py:23-88) —
``full_sort_scores(uid_series, ...)`` returns the (len(uid), n_items) score
matrix with [PAD] and earlier-phase history masked to -inf;
``full_sort_topk`` returns (scores, item ids) of the top k.

Functional adaptation: instead of (model, test_data, device) the JAX API
takes (model, params, test_data) — params is the trained pytree (e.g.
``trainer.params``).
"""

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = -1e15


def full_sort_scores(uid_series, model, params, test_data):
    """Score every item for the given internal user ids.

    Args:
        uid_series: iterable of internal user ids.
        model: the model instance.
        params: trained parameter pytree.
        test_data: an eval loader from data_preparation (provides phase
            history for masking and, for sequential models, the device
            transform that materializes each user's latest sequence).

    Returns:
        np.ndarray (len(uid_series), n_items), masked entries at -inf.
    """
    uids = np.asarray(list(uid_series), dtype=np.int32)
    uid_f = model.config["USER_ID_FIELD"]
    n_items = test_data.n_items

    batch = {uid_f: jnp.asarray(uids)}
    transform = getattr(test_data, "device_transform", None)
    if transform is not None:
        # sequential: use each user's LAST evaluation example
        split = test_data.split
        row_of_user = {int(u): r for r, u in enumerate(np.asarray(split.uid))}
        rows = np.array([row_of_user.get(int(u), -1) for u in uids])
        if (rows < 0).any():
            missing = uids[rows < 0].tolist()
            raise ValueError(f"users {missing} have no eval example")
        batch["seq_start"] = jnp.asarray(np.asarray(split.start)[rows])
        batch[model.config["ITEM_LIST_LENGTH_FIELD"]] = jnp.asarray(
            np.maximum(np.asarray(split.length)[rows], 1))
        batch = transform(batch, transform.consts)

    from ..models.base import AbstractRecommender
    # bind the params-carried device constants: models whose consts are
    # updated during training (KGAT rebuilds its dense attention blocks each
    # epoch in params['_const']) must score with the TRAINED values, not the
    # construction-time registry fallback
    with model.bind_consts(model.consts_of(params)):
        if (type(model).full_sort_predict
                is not AbstractRecommender.full_sort_predict
                and not getattr(model, "full_sort_fallback", False)):
            scores = model.full_sort_predict(params, batch)
        else:
            items = jnp.arange(n_items, dtype=jnp.int32)[None, :]
            cand = jnp.broadcast_to(items, (len(uids), n_items))
            scores = model.score_items(params, batch, cand)
    scores = jnp.asarray(scores, jnp.float32).at[:, 0].set(NEG_INF)

    if getattr(test_data, "mask_history", True) and \
            getattr(test_data, "phase_history", None) is not None:
        hist, hlen = test_data.phase_history.device_tables(
            test_data.mask_phase)
        uh = hist[jnp.asarray(uids)]
        valid = jnp.arange(uh.shape[1])[None, :] < hlen[jnp.asarray(uids)][:, None]
        rows = jnp.arange(len(uids))[:, None]
        scores = scores.at[rows, uh].add(jnp.where(valid, NEG_INF, 0.0))
    return np.asarray(scores)


def full_sort_topk(uid_series, model, params, test_data, k):
    """Top-k (scores, internal item ids) per user (parity: case_study.py:73)."""
    scores = full_sort_scores(uid_series, model, params, test_data)
    topk_scores, topk_idx = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(topk_scores), np.asarray(topk_idx)
