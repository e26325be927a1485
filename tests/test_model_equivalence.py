"""Equivalence pins for TPU-reformulated model internals.

Where a model's computation was restructured for the MXU (dense routing,
chunked scans), these tests pin the reformulation to the direct reference
formulation on small instances.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from recbole_tpu.config.configurator import Config
from recbole_tpu.models import get_model


def _cfg(model, **over):
    return Config(model, "synth", config_dict={
        "data_path": "/tmp", "state": "ERROR",
        "checkpoint_dir": "/tmp/eq_saved", "log_dir": "/tmp/eq_log",
        **over}, _parse_cmd_line=False)


def test_dgcf_dense_routing_matches_edge_routing():
    """The dense per-direction affinity formulation (matmuls only) equals
    the per-edge segment-op formulation across layers/iterations/factors."""
    import recbole_tpu.ops.graph as g
    NU, NI, NE = 23, 31, 150
    rng = np.random.RandomState(0)
    mat = sp.coo_matrix((np.ones(NE, np.float32),
                         (rng.randint(0, NU, NE), rng.randint(0, NI, NE))),
                        shape=(NU, NI))
    mat.sum_duplicates()

    class FakeDS:
        user_num, item_num = NU, NI
        def num(self, f): return NI if "item" in f else NU
        def inter_matrix(self, kind):
            return mat.tocoo() if kind == "coo" else mat.tocsr()

    def build(dense):
        old = g.DENSE_ENTRY_BUDGET
        g.DENSE_ENTRY_BUDGET = 10 ** 9 if dense else 1
        try:
            cfg = _cfg("DGCF", embedding_size=8, n_factors=4,
                       n_iterations=2, n_layers=2)
            return get_model("DGCF")(cfg, FakeDS())
        finally:
            g.DENSE_ENTRY_BUDGET = old

    md, me = build(True), build(False)
    assert md.dense and not me.dense
    pd = md.attach_consts(md.init_params(jax.random.PRNGKey(0)))
    pe = me.attach_consts(me.init_params(jax.random.PRNGKey(0)))
    with md.bind_consts(md.consts_of(pd)):
        ud, id_ = md._propagate(pd)
    with me.bind_consts(me.consts_of(pe)):
        ue, ie = me._propagate(pe)
    np.testing.assert_allclose(np.asarray(ud), np.asarray(ue),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(id_), np.asarray(ie),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("algo", ["prod", "concat"])
def test_nais_full_sort_matches_per_item_logits(algo):
    """The tiled full-sort (user blocks x history while_loop, reshaped MXU
    matmuls) equals scoring every item through the pairwise path."""
    NI, NU, HM = 37, 29, 11
    rng = np.random.RandomState(3)

    class FakeDS:
        user_num, item_num = NU, NI
        def num(self, f): return NI if "item" in f else NU
        def history_item_matrix(self):
            return (rng.randint(0, NI, (NU, HM)).astype(np.int32),
                    rng.randint(1, HM + 1, NU).astype(np.int32))

    cfg = _cfg("NAIS", algorithm=algo, embedding_size=8, weight_size=6)
    m = get_model("NAIS")(cfg, FakeDS())
    params = m.attach_consts(m.init_params(jax.random.PRNGKey(0)))
    B = 13
    users = jnp.asarray(rng.randint(1, NU, B).astype(np.int32))
    with m.bind_consts(m.consts_of(params)):
        full = m.full_sort_predict(params, {m.USER_ID: users})
        per = jnp.stack(
            [m._logits(params, users, jnp.full((B,), i, jnp.int32))
             for i in range(NI)], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(per),
                               rtol=1e-4, atol=1e-5)
