"""Top-k and value metric unit tests against hand-computed expectations
(parity with the reference's tests/metrics suite, SURVEY.md §4)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from recbole_tpu.evaluator.metrics import (
    hit_, mrr_, map_, recall_, ndcg_, precision_, auc_, mae_, rmse_, log_loss_,
)

# two users, K=4: user0 hits at ranks 1 and 3 (pos_len 2);
# user1 hits at rank 3 only (pos_len 3)
POS_INDEX = jnp.array([[1, 0, 1, 0],
                       [0, 0, 1, 0]], jnp.float32)
POS_LEN = jnp.array([2, 3], jnp.int32)


def _np(x):
    return np.asarray(x)


def test_hit():
    expect = [[1, 1, 1, 1], [0, 0, 1, 1]]
    np.testing.assert_allclose(_np(hit_(POS_INDEX, POS_LEN)), expect)


def test_mrr():
    expect = [[1, 1, 1, 1], [0, 0, 1 / 3, 1 / 3]]
    np.testing.assert_allclose(_np(mrr_(POS_INDEX, POS_LEN)), expect, rtol=1e-6)


def test_precision():
    expect = [[1, 1 / 2, 2 / 3, 2 / 4], [0, 0, 1 / 3, 1 / 4]]
    np.testing.assert_allclose(_np(precision_(POS_INDEX, POS_LEN)), expect, rtol=1e-6)


def test_recall():
    expect = [[1 / 2, 1 / 2, 1, 1], [0, 0, 1 / 3, 1 / 3]]
    np.testing.assert_allclose(_np(recall_(POS_INDEX, POS_LEN)), expect, rtol=1e-6)


def test_map():
    # user0: sum_pre = [1, 1, 1+2/3, 1+2/3]; denom = min(k, min(pos_len,K)=2)
    u0 = [1 / 1, 1 / 2, (1 + 2 / 3) / 2, (1 + 2 / 3) / 2]
    # user1: sum_pre = [0, 0, 1/3, 1/3]; denom = min(k, 3)
    u1 = [0, 0, (1 / 3) / 3, (1 / 3) / 3]
    np.testing.assert_allclose(_np(map_(POS_INDEX, POS_LEN)), [u0, u1], rtol=1e-6)


def test_ndcg():
    g = [1 / math.log2(r + 1) for r in range(1, 5)]
    icum = np.cumsum(g)
    # user0: idcg_len=2 -> idcg = [icum0, icum1, icum1, icum1]
    dcg0 = np.cumsum([g[0], 0, g[2], 0])
    idcg0 = [icum[0], icum[1], icum[1], icum[1]]
    # user1: idcg_len=3
    dcg1 = np.cumsum([0, 0, g[2], 0])
    idcg1 = [icum[0], icum[1], icum[2], icum[2]]
    expect = [dcg0 / np.array(idcg0), dcg1 / np.array(idcg1)]
    np.testing.assert_allclose(_np(ndcg_(POS_INDEX, POS_LEN)), expect, rtol=1e-4)


def test_auc_simple():
    trues = jnp.array([1.0, 0.0, 1.0, 0.0])
    preds = jnp.array([0.9, 0.1, 0.8, 0.2])
    assert float(auc_(trues, preds)) == pytest.approx(1.0)


def test_auc_with_ties():
    trues = jnp.array([1.0, 0.0, 1.0, 0.0])
    preds = jnp.array([0.5, 0.5, 0.8, 0.2])
    # pairs: (p1,n1: 0.5 vs 0.5 tie=0.5) (p1,n2: win) (p2,n1: win) (p2,n2: win)
    assert float(auc_(trues, preds)) == pytest.approx(3.5 / 4)


def test_value_metrics():
    trues = jnp.array([1.0, 0.0, 1.0])
    preds = jnp.array([0.8, 0.4, 0.6])
    assert float(mae_(trues, preds)) == pytest.approx((0.2 + 0.4 + 0.4) / 3, rel=1e-4)
    assert float(rmse_(trues, preds)) == pytest.approx(
        math.sqrt((0.04 + 0.16 + 0.16) / 3), rel=1e-4)
    expect_ll = -(math.log(0.8) + math.log(0.6) + math.log(0.6)) / 3
    assert float(log_loss_(trues, preds)) == pytest.approx(expect_ll, rel=1e-4)


def test_gauc_closed_form():
    """GAUC per the reference formula (metrics.py:167-220): M=2, N=3,
    positives at descending ranks 1 and 3 -> AUC = 5/6."""
    from recbole_tpu.evaluator.evaluator import gauc_metric_sums
    scores = jnp.array([[5.0, 4.0, 3.0, 2.0, 1.0]])
    pos = jnp.array([[1, 0, 1, 0, 0]], dtype=jnp.int32)
    out = gauc_metric_sums(scores, pos, jnp.array([2]), jnp.array([5.0]),
                           jnp.array([1.0]))
    assert float(out["gauc_num"]) / float(out["gauc_den"]) == pytest.approx(5 / 6, rel=1e-5)


def test_gauc_ties_and_degenerate_users():
    from recbole_tpu.evaluator.evaluator import gauc_metric_sums
    # all-tied scores -> AUC 0.5; second row all-positive -> excluded
    scores = jnp.array([[2.0, 2.0, 2.0, 2.0], [3.0, 2.0, 1.0, 0.0]])
    pos = jnp.array([[1, 0, 1, 0], [1, 1, 1, 1]], dtype=jnp.int32)
    out = gauc_metric_sums(scores, pos, jnp.array([2, 4]),
                           jnp.array([4.0, 4.0]), jnp.array([1.0, 1.0]))
    assert float(out["gauc_num"]) / float(out["gauc_den"]) == pytest.approx(0.5)
