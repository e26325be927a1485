"""Numeric loss parity against the reference implementation itself.

For each covered model: run BOTH pipelines on the same synthetic atomic
files with a deterministic TO_LS split (the splits and id remaps are
byte-identical — asserted below), copy OUR initialized params into the
reference torch model, feed the SAME batch (taken from the reference's own
train dataloader) to both ``calculate_loss``, and require the scalars to
match to float32 precision.

The reference tree (/root/reference) is imported read-only as an oracle via
tests/ref_compat.py; everything skips when it isn't present.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_compat import load_reference

pytestmark = pytest.mark.skipif(load_reference() is None,
                                reason="reference tree not available")

import jax  # noqa: E402  (after ref_compat so platforms is already cpu)
import jax.numpy as jnp  # noqa: E402


BASE_CFG = {
    "eval_setting": "TO_LS,full",
    "state": "ERROR",
    "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
}


def _ref_pipeline(model, data_path, extra=None):
    from recbole.config import Config
    from recbole.data import create_dataset, data_preparation
    from recbole.utils import init_seed, get_model
    cfg = {**BASE_CFG, "data_path": data_path, **(extra or {})}
    config = Config(model=model, dataset="synth", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    ds = create_dataset(config)
    train, valid, test = data_preparation(config, ds)
    m = get_model(config["model"])(config, train).to("cpu")
    m.eval()
    return config, ds, train, m


def _our_pipeline(model, data_path, extra=None):
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.utils.utils import init_seed
    cfg = {**BASE_CFG, "data_path": data_path, **(extra or {})}
    config = Config(model=model, dataset="synth", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    ds = create_dataset(config)
    train, _, _ = data_preparation(config, ds)
    # mirror quick_start.py: the model sees the TRAIN-SPLIT dataset
    m = get_model(model)(config, train.dataset)
    params = m.init_params(jax.random.key(0, impl="rbg"))
    return config, ds, m, params


KG_COLS = {"inter": ["user_id", "item_id", "rating", "timestamp"],
           "kg": ["head_id", "relation_id", "tail_id"],
           "link": ["item_id", "entity_id"]}


def _first_ref_batch(train_loader):
    if hasattr(train_loader, "set_mode"):
        from recbole.utils import KGDataLoaderState
        train_loader.set_mode(KGDataLoaderState.RSKG)
    inter = next(iter(train_loader))
    return {k: v.numpy() for k, v in inter.interaction.items()}, inter


def _to_jnp(batch_np):
    return {k: jnp.asarray(v) for k, v in batch_np.items()}


def _scalar(loss):
    if isinstance(loss, tuple):
        return float(sum(float(p) for p in loss))
    return float(loss)


def _load(ref_model, updates):
    sd = ref_model.state_dict()
    for k, v in updates.items():
        arr = np.asarray(v, dtype=np.float32)
        assert tuple(sd[k].shape) == arr.shape, \
            f"{k}: ref {tuple(sd[k].shape)} vs ours {arr.shape}"
        sd[k] = torch.tensor(arr)
    ref_model.load_state_dict(sd)


def _compare(model, data_path, mapper, extra=None, rtol=2e-4,
             methods=("calculate_loss",), train_mode=False):
    _, rds, rtrain, ref_m = _ref_pipeline(model, data_path, extra)
    _, ods, our_m, params = _our_pipeline(model, data_path, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    mapper(ref_m, params)
    if train_mode:
        # batch-norm models: our BN always uses batch statistics, matching
        # torch TRAIN mode; dropouts must be zeroed via the config
        ref_m.train()
    for method in methods:
        with torch.no_grad():
            ref_loss = _scalar(getattr(ref_m, method)(inter))
        our_loss = _scalar(getattr(our_m, method)(
            params, _to_jnp(batch_np), rng=None))
        np.testing.assert_allclose(
            our_loss, ref_loss, rtol=rtol,
            err_msg=f"{model}.{method} loss mismatch")


def test_lightgcn_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        })
    _compare("LightGCN", synth_dataset_dir, mapper)


def test_transrec_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "bias.weight": np.asarray(params["item_bias"])[:, None],
            "T": params["T"],
        })
    _compare("TransRec", synth_dataset_dir, mapper)


def test_shan_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        D = np.asarray(params["long_w"]).shape[0]
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            # ours folds torch's Linear.bias and the extra long_b parameter
            # into ONE bias; split as (linear bias = 0, long_b = ours)
            "long_w.weight": np.asarray(params["long_w"]).T,
            "long_w.bias": np.zeros(D, np.float32),
            "long_b": params["long_b"],
            "long_short_w.weight": np.asarray(params["short_w"]).T,
            "long_short_w.bias": np.zeros(D, np.float32),
            "long_short_b": params["short_b"],
        })
    _compare("SHAN", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0})


def test_hgn_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        D = np.asarray(params["w1"]).shape[0]
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "item_embedding_for_prediction.weight":
                params["item_out_embedding"],
            # ours folds the reference's w1/w2 Linear biases into the single
            # shared b parameter; split as (linear biases = 0, b = ours)
            "w1.weight": np.asarray(params["w1"]).T,
            "w1.bias": np.zeros(D, np.float32),
            "w2.weight": np.asarray(params["w2"]).T,
            "w2.bias": np.zeros(D, np.float32),
            "b": params["b"],
            "w3.weight": np.asarray(params["w3"])[None, :],
            "w4.weight": params["w4"],
        })
    _compare("HGN", synth_dataset_dir, mapper,
             extra={"reg_weight": [0.05, 0.02]})


def test_fossil_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "item_embedding.weight": params["item_embedding"],
            "user_lambda.weight": params["user_lambda"],
            "lambda_": params["global_lambda"],
        })
    _compare("FOSSIL", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "reg_weight": 0.1})


def test_caser_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            # torch Conv2d(1, nv, (L, 1)).weight is (nv, 1, L, 1); ours (L, nv)
            "conv_v.weight": np.asarray(params["conv_v"]).T[:, None, :, None],
            "conv_v.bias": params["conv_v_b"],
            "fc1.weight": np.asarray(params["fc1_w"]).T,
            "fc1.bias": params["fc1_b"],
            "fc2.weight": np.asarray(params["fc2_w"]).T,
            "fc2.bias": params["fc2_b"],
        }
        # torch Conv2d(1, nh, (h, D)).weight is (nh, 1, h, D); ours (h, D, nh)
        for i, (w, b) in enumerate(zip(params["conv_h"],
                                       params["conv_h_b"])):
            upd[f"conv_h.{i}.weight"] = np.transpose(
                np.asarray(w), (2, 0, 1))[:, None, :, :]
            upd[f"conv_h.{i}.bias"] = b
        _load(ref_m, upd)
    _compare("Caser", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "dropout_prob": 0.0,
                    "MAX_ITEM_LIST_LENGTH": 10})


def test_nextitnet_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "final_layer.weight": np.asarray(params["out_w"]).T,
            "final_layer.bias": params["out_b"],
        }
        # torch Conv2d(D, D, (1, K)).weight is (out, in, 1, K); ours (K, in, out)
        for i, blk in enumerate(params["blocks"]):
            for ours_w, ours_b, ref_c in (("w1", "b1", "conv1"),
                                          ("w2", "b2", "conv2")):
                upd[f"residual_blocks.{i}.{ref_c}.weight"] = np.transpose(
                    np.asarray(blk[ours_w]), (2, 1, 0))[:, :, None, :]
                upd[f"residual_blocks.{i}.{ref_c}.bias"] = blk[ours_b]
            for ours_ln, ref_ln in (("ln1", "ln1"), ("ln2", "ln2")):
                upd[f"residual_blocks.{i}.{ref_ln}.weight"] = blk[f"{ours_ln}_g"]
                upd[f"residual_blocks.{i}.{ref_ln}.bias"] = blk[f"{ours_ln}_b"]
        _load(ref_m, upd)
    _compare("NextItNet", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0,
                    "MAX_ITEM_LIST_LENGTH": 10, "block_num": 2})


def test_bpr_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        })
    _compare("BPR", synth_dataset_dir, mapper)


def test_gru4rec_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        g = params["gru"]
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "dense.weight": np.asarray(params["dense_w"]).T,
            "dense.bias": params["dense_b"],
        }
        # reference nn.GRU(bias=False); ours carries zero biases (same at
        # init). torch weight_ih_l{k} is (3H, in) with (r, z, n) gates — ours
        # wi is the transpose with the same ordering
        for li, layer in enumerate(g):
            upd[f"gru_layers.weight_ih_l{li}"] = np.asarray(layer["wi"]).T
            upd[f"gru_layers.weight_hh_l{li}"] = np.asarray(layer["wh"]).T
        _load(ref_m, upd)
    _compare("GRU4Rec", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "dropout_prob": 0.0,
                    "MAX_ITEM_LIST_LENGTH": 10})


def test_sasrec_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "position_embedding.weight": params["position_embedding"],
            "LayerNorm.weight": params["ln_g"],
            "LayerNorm.bias": params["ln_b"],
        }
        for i, lyr in enumerate(params["encoder"]):
            p = f"trm_encoder.layer.{i}"
            upd.update({
                f"{p}.multi_head_attention.query.weight":
                    np.asarray(lyr["wq"]).T,
                f"{p}.multi_head_attention.query.bias": lyr["bq"],
                f"{p}.multi_head_attention.key.weight":
                    np.asarray(lyr["wk"]).T,
                f"{p}.multi_head_attention.key.bias": lyr["bk"],
                f"{p}.multi_head_attention.value.weight":
                    np.asarray(lyr["wv"]).T,
                f"{p}.multi_head_attention.value.bias": lyr["bv"],
                f"{p}.multi_head_attention.dense.weight":
                    np.asarray(lyr["wo"]).T,
                f"{p}.multi_head_attention.dense.bias": lyr["bo"],
                f"{p}.multi_head_attention.LayerNorm.weight": lyr["ln1_g"],
                f"{p}.multi_head_attention.LayerNorm.bias": lyr["ln1_b"],
                f"{p}.feed_forward.dense_1.weight":
                    np.asarray(lyr["ff1_w"]).T,
                f"{p}.feed_forward.dense_1.bias": lyr["ff1_b"],
                f"{p}.feed_forward.dense_2.weight":
                    np.asarray(lyr["ff2_w"]).T,
                f"{p}.feed_forward.dense_2.bias": lyr["ff2_b"],
                f"{p}.feed_forward.LayerNorm.weight": lyr["ln2_g"],
                f"{p}.feed_forward.LayerNorm.bias": lyr["ln2_b"],
            })
        _load(ref_m, upd)
    _compare("SASRec", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10,
                    "hidden_dropout_prob": 0.0, "attn_dropout_prob": 0.0,
                    "n_layers": 2})


def test_narm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        g = params["gru"][0]
        _load(ref_m, {
            "item_embedding.weight": params["item_embedding"],
            "gru.weight_ih_l0": np.asarray(g["wi"]).T,
            "gru.weight_hh_l0": np.asarray(g["wh"]).T,
            "a_1.weight": np.asarray(params["a1"]).T,
            "a_2.weight": np.asarray(params["a2"]).T,
            "v_t.weight": np.asarray(params["v"]).T,
            "b.weight": np.asarray(params["b"]).T,
        })
    _compare("NARM", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10,
                    "dropout_probs": [0.0, 0.0]})


def test_stamp_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "item_embedding.weight": params["item_embedding"],
            "w1.weight": np.asarray(params["w1"]).T,
            "w2.weight": np.asarray(params["w2"]).T,
            "w3.weight": np.asarray(params["w3"]).T,
            "w0.weight": np.asarray(params["w0"]).T,
            "b_a": params["ba"],
            "mlp_a.weight": np.asarray(params["mlp_a"]).T,
            "mlp_a.bias": params["mlp_a_b"],
            "mlp_b.weight": np.asarray(params["mlp_b"]).T,
            "mlp_b.bias": params["mlp_b_b"],
        })
    _compare("STAMP", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10})


def test_fpmc_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "UI_emb.weight": params["UI"],
            "IU_emb.weight": params["IU"],
            "IL_emb.weight": params["IL"],
            "LI_emb.weight": params["LI"],
        })
    _compare("FPMC", synth_dataset_dir, mapper,
             extra={"MAX_ITEM_LIST_LENGTH": 10})


def test_cke_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        R = np.asarray(params["trans_w"]).shape[0]
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "entity_embedding.weight": params["entity_embedding"],
            "relation_embedding.weight": params["relation_embedding"],
            # reference stores the per-relation projection as an Embedding of
            # flattened (D*K) rows; ours is (R, D, K) with the same e @ W
            # orientation
            "trans_w.weight": np.asarray(params["trans_w"]).reshape(R, -1),
        })
    _compare("CKE", synth_dataset_dir, mapper,
             extra={"load_col": KG_COLS})


def test_cfkg_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "entity_embedding.weight": params["entity_embedding"],
            "relation_embedding.weight": params["relation_embedding"],
        })
    _compare("CFKG", synth_dataset_dir, mapper,
             extra={"load_col": KG_COLS})


def test_ktup_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "entity_embedding.weight": params["entity_embedding"],
            "relation_embedding.weight": params["relation_embedding"],
            "relation_norm_embedding.weight": params["relation_norm"],
            "pref_embedding.weight": params["pref_embedding"],
            "pref_norm_embedding.weight": params["pref_norm"],
        })
    # gumbel off for determinism: both sides then use the plain softmax mix
    _compare("KTUP", synth_dataset_dir, mapper,
             extra={"load_col": KG_COLS, "use_st_gumbel": False},
             methods=("calculate_loss", "calculate_kg_loss"))


def test_mkr_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        cc = params["cc"][0]
        _load(ref_m, {
            "user_embeddings_lookup.weight": params["user_embedding"],
            "item_embeddings_lookup.weight": params["item_embedding"],
            "entity_embeddings_lookup.weight": params["entity_embedding"],
            "relation_embeddings_lookup.weight": params["relation_embedding"],
            "user_mlp.mlp_layers.1.weight":
                np.asarray(params["user_mlp"][0]["w"]).T,
            "user_mlp.mlp_layers.1.bias": params["user_mlp"][0]["b"],
            "tail_mlp.mlp_layers.1.weight":
                np.asarray(params["tail_mlp"][0]["w"]).T,
            "tail_mlp.mlp_layers.1.bias": params["tail_mlp"][0]["b"],
            "kge_pred_mlp.mlp_layers.1.weight":
                np.asarray(params["kge_mlp"][0]["w"]).T,
            "kge_pred_mlp.mlp_layers.1.bias": params["kge_mlp"][0]["b"],
            # reference cross-compress fc_* are Linear(D→1) with SCALAR
            # biases; ours carries per-dim bias vectors (zero at init)
            "cc_unit.cc_unit0.fc_vv.weight": np.asarray(cc["vv"]).T,
            "cc_unit.cc_unit0.fc_vv.bias": np.zeros(1, np.float32),
            "cc_unit.cc_unit0.fc_ev.weight": np.asarray(cc["ev"]).T,
            "cc_unit.cc_unit0.fc_ev.bias": np.zeros(1, np.float32),
            "cc_unit.cc_unit0.fc_ve.weight": np.asarray(cc["ve"]).T,
            "cc_unit.cc_unit0.fc_ve.bias": np.zeros(1, np.float32),
            "cc_unit.cc_unit0.fc_ee.weight": np.asarray(cc["ee"]).T,
            "cc_unit.cc_unit0.fc_ee.bias": np.zeros(1, np.float32),
        })
    _compare("MKR", synth_dataset_dir, mapper,
             extra={"load_col": KG_COLS},
             methods=("calculate_rs_loss", "calculate_kg_loss"))


def test_neumf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "user_mf_embedding.weight": params["mf_user_embedding"],
            "item_mf_embedding.weight": params["mf_item_embedding"],
            "user_mlp_embedding.weight": params["mlp_user_embedding"],
            "item_mlp_embedding.weight": params["mlp_item_embedding"],
            "predict_layer.weight": np.asarray(params["out_w"]).T,
            "predict_layer.bias": params["out_b"],
        }
        # MLPLayers interleaves dropout: Linear modules sit at 1, 4, 7, ...
        for i, lyr in enumerate(params["mlp"]):
            idx = 1 + 3 * i
            upd[f"mlp_layers.mlp_layers.{idx}.weight"] = \
                np.asarray(lyr["w"]).T
            upd[f"mlp_layers.mlp_layers.{idx}.bias"] = lyr["b"]
        _load(ref_m, upd)
    _compare("NeuMF", synth_dataset_dir, mapper,
             extra={"dropout_prob": 0.0})


def test_dmf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "user_linear.weight": np.asarray(params["user_w0"]).T,
            "item_linear.weight": np.asarray(params["item_w0"]).T,
        }
        for tower, ours in (("user_fc_layers", "user_mlp"),
                            ("item_fc_layers", "item_mlp")):
            for i, lyr in enumerate(params[ours]):
                idx = 1 + 3 * i
                upd[f"{tower}.mlp_layers.{idx}.weight"] = \
                    np.asarray(lyr["w"]).T
                upd[f"{tower}.mlp_layers.{idx}.bias"] = lyr["b"]
        _load(ref_m, upd)
    _compare("DMF", synth_dataset_dir, mapper)


def test_fism_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "item_src_embedding.weight": params["item_src_embedding"],
            "item_dst_embedding.weight": params["item_dst_embedding"],
            "user_bias": params["user_bias"],
            "item_bias": params["item_bias"],
        })
    _compare("FISM", synth_dataset_dir, mapper)


def test_nais_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "item_src_embedding.weight": params["item_src_embedding"],
            "item_dst_embedding.weight": params["item_dst_embedding"],
            "bias": params["item_bias"],
            "mlp_layers.mlp_layers.1.weight": np.asarray(params["attn_w"]).T,
            "mlp_layers.mlp_layers.1.bias": params["attn_b"],
            "weight_layer": np.asarray(params["attn_h"])[:, None],
        })
    _compare("NAIS", synth_dataset_dir, mapper)


def test_ngcf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        }
        for i, lyr in enumerate(params["gnn"]):
            upd[f"GNNlayers.{i}.linear.weight"] = np.asarray(lyr["w1"]).T
            upd[f"GNNlayers.{i}.linear.bias"] = lyr["b1"]
            upd[f"GNNlayers.{i}.interActTransform.weight"] = \
                np.asarray(lyr["w2"]).T
            upd[f"GNNlayers.{i}.interActTransform.bias"] = lyr["b2"]
        _load(ref_m, upd)
    _compare("NGCF", synth_dataset_dir, mapper,
             extra={"message_dropout": 0.0, "node_dropout": 0.0})


def test_spectralcf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        }
        for i, f in enumerate(params["filters"]):
            upd[f"filters.{i}"] = f
        _load(ref_m, upd)
    _compare("SpectralCF", synth_dataset_dir, mapper)


def test_npe_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            # the reference's embedding_seq_item is dead weight; leave its
            # random init in place
        })
    _compare("NPE", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10,
                    "dropout_prob": 0.0})


def test_hrm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        })
    for pool1 in ("average", "max"):
        _compare("HRM", synth_dataset_dir, mapper,
                 extra={"training_neg_sample_num": 0,
                        "MAX_ITEM_LIST_LENGTH": 10, "dropout_prob": 0.0,
                        "pooling_type_layer_1": pool1})


def test_dgcf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        })
    # cor_weight 0: the independence term samples randomly on both sides
    _compare("DGCF", synth_dataset_dir, mapper,
             extra={"cor_weight": 0.0})


def test_line_loss_parity(synth_dataset_dir, monkeypatch):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "user_context_embedding.weight": params["user_context"],
            "item_context_embedding.weight": params["item_context"],
        })
    # pin the reference's random branch selector to the u-u branch, which is
    # our deterministic no-rng path
    import random as _py_random
    monkeypatch.setattr(_py_random, "random", lambda: 0.3)
    _compare("LINE", synth_dataset_dir, mapper)


def test_convncf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "predict_layers.mlp_layers.1.weight":
                np.asarray(params["predict_w"]).T,
            "predict_layers.mlp_layers.1.bias":
                np.asarray(params["predict_b"])[None],
        }
        for i, lyr in enumerate(params["conv"]):
            # torch CNNLayers stacks conv+relu pairs: convs at even indices
            upd[f"cnn_layers.cnn_layers.{2 * i}.weight"] = lyr["w"]
            upd[f"cnn_layers.cnn_layers.{2 * i}.bias"] = lyr["b"]
        _load(ref_m, upd)
    _compare("ConvNCF", synth_dataset_dir, mapper,
             extra={"dropout_prob": 0.0})


CTR_EXTRA = {"eval_setting": "TO_RS", "threshold": {"rating": 3},
             "metrics": ["AUC", "LogLoss"], "valid_metric": "AUC",
             "dropout_prob": 0.0,
             # the reference's ml-100k CTR protocol normalizes float fields
             # (ml-100k.yaml:49); without it the raw timestamp saturates both
             # models and torch's BCELoss −100 log clamp kicks in
             "normalize_all": True}


def _ctr_base_upd(params):
    return {
        # merged storage: cols 0..D-1 = embedding, col D = first-order bias
        "token_embedding_table.embedding.weight":
            params["token_embedding"][:, :-1],
        "float_embedding_table.weight": params["float_embedding"],
        "first_order_linear.bias":
            np.asarray(params["first_order_bias"])[None],
        "first_order_linear.token_embedding_table.embedding.weight":
            np.asarray(params["token_embedding"][:, -1])[:, None],
        "first_order_linear.float_embedding_table.weight":
            np.asarray(params["float_weight"])[:, None],
    }


def test_fm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, _ctr_base_upd(params))
    _compare("FM", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def test_deepfm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = _ctr_base_upd(params)
        for i, lyr in enumerate(params["mlp"]):
            upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.weight"] = \
                np.asarray(lyr["w"]).T
            upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.bias"] = lyr["b"]
        upd["deep_predict_layer.weight"] = np.asarray(params["deep_out_w"]).T
        upd["deep_predict_layer.bias"] = params["deep_out_b"]
        _load(ref_m, upd)
    _compare("DeepFM", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def test_afm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = _ctr_base_upd(params)
        upd["attlayer.w.weight"] = np.asarray(params["attn_w"]).T
        upd["attlayer.h"] = params["attn_h"]
        upd["p"] = params["p"]
        _load(ref_m, upd)
    _compare("AFM", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def test_pnn_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = _ctr_base_upd(params)
        for i, lyr in enumerate(params["mlp"]):
            upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.weight"] = \
                np.asarray(lyr["w"]).T
            upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.bias"] = lyr["b"]
        upd["predict_layer.weight"] = np.asarray(params["out_w"]).T
        upd["predict_layer.bias"] = params["out_b"]
        _load(ref_m, upd)
    _compare("PNN", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def test_xdeepfm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = _ctr_base_upd(params)
        for i, lyr in enumerate(params["mlp"]):
            upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.weight"] = \
                np.asarray(lyr["w"]).T
            upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.bias"] = lyr["b"]
        upd["cin_linear.weight"] = np.asarray(params["cin_out_w"]).T
        _load(ref_m, upd)
        # the reference's CIN conv1ds live in a plain python list — they are
        # NOT in its state_dict (frozen at random init there). Copy THEIRS
        # into our frozen _const subtree for the comparison.
        cin = params["_const"]["cin"]
        for i, conv in enumerate(ref_m.conv1d_list):
            w = conv.weight.detach().numpy()
            cin[i]["w"] = jnp.asarray(w[:, :, 0].T)
            cin[i]["b"] = jnp.asarray(conv.bias.detach().numpy())
    _compare("xDeepFM", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def _mlp_upd(params, key="mlp", prefix="mlp_layers", step=3):
    upd = {}
    for i, lyr in enumerate(params[key]):
        upd[f"{prefix}.mlp_layers.{1 + step * i}.weight"] = \
            np.asarray(lyr["w"]).T
        upd[f"{prefix}.mlp_layers.{1 + step * i}.bias"] = lyr["b"]
    return upd


def test_lr_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, _ctr_base_upd(params))
    _compare("LR", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def test_widedeep_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {**_ctr_base_upd(params), **_mlp_upd(params)}
        upd["deep_predict_layer.weight"] = np.asarray(params["out_w"]).T
        upd["deep_predict_layer.bias"] = params["out_b"]
        _load(ref_m, upd)
    _compare("WideDeep", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def test_fnn_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {**_ctr_base_upd(params), **_mlp_upd(params)}
        upd["predict_layer.weight"] = np.asarray(params["out_w"]).T
        upd["predict_layer.bias"] = params["out_b"]
        _load(ref_m, upd)
    _compare("FNN", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def _bn_upd(params, key="mlp", prefix="mlp_layers", step=4):
    upd = {}
    for i, lyr in enumerate(params[key]):
        upd[f"{prefix}.mlp_layers.{2 + step * i}.weight"] = lyr["bn_g"]
        upd[f"{prefix}.mlp_layers.{2 + step * i}.bias"] = lyr["bn_b"]
    return upd


def test_dcn_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        # dropout, linear (1+4i), batchnorm (2+4i), activation
        upd = {**_ctr_base_upd(params),
               **_mlp_upd(params, step=4), **_bn_upd(params)}
        for i, (w, b) in enumerate(zip(params["cross_w"],
                                       params["cross_b"])):
            upd[f"cross_layer_w.{i}"] = w
            upd[f"cross_layer_b.{i}"] = b
        upd["predict_layer.weight"] = np.asarray(params["out_w"]).T
        upd["predict_layer.bias"] = params["out_b"]
        _load(ref_m, upd)
    _compare("DCN", synth_dataset_dir, mapper, extra=CTR_EXTRA,
             train_mode=True)


def test_nfm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {**_ctr_base_upd(params),
               **_mlp_upd(params, step=4), **_bn_upd(params)}
        upd["bn.weight"] = params["fm_bn_g"]
        upd["bn.bias"] = params["fm_bn_b"]
        upd["predict_layer.weight"] = np.asarray(params["out_w"]).T
        _load(ref_m, upd)
    _compare("NFM", synth_dataset_dir, mapper, extra=CTR_EXTRA,
             train_mode=True)


def test_ffm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = _ctr_base_upd(params)
        tok = np.asarray(params["ffm_token_embedding"])
        flt = np.asarray(params["ffm_float_embedding"])
        for f in range(tok.shape[1]):
            upd[f"ffm.token_embeddings.{f}.weight"] = tok[:, f, :]
            upd[f"ffm.float_embeddings.{f}.weight"] = flt[:, f, :]
        _load(ref_m, upd)
    _compare("FFM", synth_dataset_dir, mapper, extra=CTR_EXTRA)


def test_autoint_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        A = np.asarray(params["proj_w"]).shape[1]
        upd = {**_ctr_base_upd(params), **_mlp_upd(params)}
        upd["att_embedding.weight"] = np.asarray(params["proj_w"]).T
        upd["att_embedding.bias"] = params["proj_b"]
        upd["attn_fc.weight"] = np.asarray(params["attn_out_w"]).T
        upd["attn_fc.bias"] = params["attn_out_b"]
        upd["deep_predict_layer.weight"] = np.asarray(params["mlp_out_w"]).T
        upd["deep_predict_layer.bias"] = params["mlp_out_b"]
        for i, lyr in enumerate(params["attn"]):
            # torch packs qkv: in_proj_weight rows [Wq; Wk; Wv], each (A, A)
            upd[f"self_attns.{i}.in_proj_weight"] = np.concatenate([
                np.asarray(lyr["wq"]).T, np.asarray(lyr["wk"]).T,
                np.asarray(lyr["wv"]).T])
            upd[f"self_attns.{i}.in_proj_bias"] = np.concatenate([
                np.asarray(lyr["bq"]), np.asarray(lyr["bk"]),
                np.asarray(lyr["bv"])])
            upd[f"self_attns.{i}.out_proj.weight"] = np.asarray(lyr["wo"]).T
            upd[f"self_attns.{i}.out_proj.bias"] = lyr["bo"]
        _load(ref_m, upd)
    _compare("AutoInt", synth_dataset_dir, mapper,
             extra={**CTR_EXTRA, "dropout_probs": [0.0, 0.0, 0.0]})


def test_dssm_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = _ctr_base_upd(params)
        del upd["float_embedding_table.weight"]  # DSSM drops float fields
        for tower, ours in (("user_mlp_layers", "user_mlp"),
                            ("item_mlp_layers", "item_mlp")):
            upd.update(_mlp_upd(params, key=ours, prefix=tower, step=4))
            upd.update(_bn_upd(params, key=ours, prefix=tower, step=4))
        _load(ref_m, upd)
    _compare("DSSM", synth_dataset_dir, mapper, extra=CTR_EXTRA,
             train_mode=True)


def test_srgnn_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        g = params["gnn"]
        _load(ref_m, {
            "item_embedding.weight": params["item_embedding"],
            "gnn.w_ih": np.asarray(g["w_ih"]).T,
            "gnn.w_hh": np.asarray(g["w_hh"]).T,
            "gnn.b_ih": g["b_ih"],
            "gnn.b_hh": g["b_hh"],
            "gnn.b_iah": g["b_iah"],
            "gnn.b_ioh": g["b_ioh"],
            "gnn.linear_edge_in.weight": np.asarray(g["w_in"]).T,
            "gnn.linear_edge_in.bias": g["b_in"],
            "gnn.linear_edge_out.weight": np.asarray(g["w_out"]).T,
            "gnn.linear_edge_out.bias": g["b_out"],
            "linear_one.weight": np.asarray(params["w1"]).T,
            "linear_one.bias": params["b1"],
            "linear_two.weight": np.asarray(params["w2"]).T,
            "linear_two.bias": params["b2"],
            "linear_three.weight": np.asarray(params["w3"]).T,
            "linear_transform.weight": np.asarray(params["wt"]).T,
            "linear_transform.bias": params["bt"],
        })
    _compare("SRGNN", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10})


def _trm_upd(params, key="encoder", prefix="trm_encoder"):
    upd = {}
    for i, lyr in enumerate(params[key]):
        p = f"{prefix}.layer.{i}"
        upd.update({
            f"{p}.multi_head_attention.query.weight": np.asarray(lyr["wq"]).T,
            f"{p}.multi_head_attention.query.bias": lyr["bq"],
            f"{p}.multi_head_attention.key.weight": np.asarray(lyr["wk"]).T,
            f"{p}.multi_head_attention.key.bias": lyr["bk"],
            f"{p}.multi_head_attention.value.weight": np.asarray(lyr["wv"]).T,
            f"{p}.multi_head_attention.value.bias": lyr["bv"],
            f"{p}.multi_head_attention.dense.weight": np.asarray(lyr["wo"]).T,
            f"{p}.multi_head_attention.dense.bias": lyr["bo"],
            f"{p}.multi_head_attention.LayerNorm.weight": lyr["ln1_g"],
            f"{p}.multi_head_attention.LayerNorm.bias": lyr["ln1_b"],
            f"{p}.feed_forward.dense_1.weight": np.asarray(lyr["ff1_w"]).T,
            f"{p}.feed_forward.dense_1.bias": lyr["ff1_b"],
            f"{p}.feed_forward.dense_2.weight": np.asarray(lyr["ff2_w"]).T,
            f"{p}.feed_forward.dense_2.bias": lyr["ff2_b"],
            f"{p}.feed_forward.LayerNorm.weight": lyr["ln2_g"],
            f"{p}.feed_forward.LayerNorm.bias": lyr["ln2_b"],
        })
    return upd


def test_gcsan_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        g = params["gnn"]
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "gnn.w_ih": np.asarray(g["w_ih"]).T,
            "gnn.w_hh": np.asarray(g["w_hh"]).T,
            "gnn.b_ih": g["b_ih"],
            "gnn.b_hh": g["b_hh"],
            "gnn.linear_edge_in.weight": np.asarray(g["w_in"]).T,
            "gnn.linear_edge_in.bias": g["b_in"],
            "gnn.linear_edge_out.weight": np.asarray(g["w_out"]).T,
            "gnn.linear_edge_out.bias": g["b_out"],
            **_trm_upd(params, prefix="self_attention"),
        }
        _load(ref_m, upd)
    _compare("GCSAN", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10,
                    "hidden_dropout_prob": 0.0, "attn_dropout_prob": 0.0})


def test_bert4rec_loss_parity(synth_dataset_dir, monkeypatch):
    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "position_embedding.weight": params["position_embedding"],
            "LayerNorm.weight": params["ln_g"],
            "LayerNorm.bias": params["ln_b"],
            **_trm_upd(params),
        }
        _load(ref_m, upd)
    # pin the reference's per-item mask coin to 0.0 → with mask_ratio=1.0
    # EVERY real position is masked on both sides, deterministically
    import random as _py_random
    monkeypatch.setattr(_py_random, "random", lambda: 0.0)
    _compare("BERT4Rec", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10,
                    "mask_ratio": 1.0,
                    "hidden_dropout_prob": 0.0, "attn_dropout_prob": 0.0})


def test_repeatnet_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        g = params["gru"][0]
        _load(ref_m, {
            "item_matrix.weight": params["item_embedding"],
            "gru.weight_ih_l0": np.asarray(g["wi"]).T,
            "gru.weight_hh_l0": np.asarray(g["wh"]).T,
            "gru.bias_ih_l0": g["bi"],
            "gru.bias_hh_l0": g["bh"],
            "repeat_explore_mechanism.Wre.weight": np.asarray(params["w_re"]).T,
            "repeat_explore_mechanism.Ure.weight": np.asarray(params["u_re"]).T,
            "repeat_explore_mechanism.Vre.weight": np.asarray(params["v_re"]).T,
            "repeat_explore_mechanism.Wcre.weight": np.asarray(params["w_cre"]).T,
            "repeat_recommendation_decoder.Wr.weight": np.asarray(params["w_r"]).T,
            "repeat_recommendation_decoder.Ur.weight": np.asarray(params["u_r"]).T,
            "repeat_recommendation_decoder.Vr.weight": np.asarray(params["v_r"]).T,
            "repeat_recommendation_decoder.Vr.bias": params["v_r_b"],
            "explore_recommendation_decoder.We.weight": np.asarray(params["w_e"]).T,
            "explore_recommendation_decoder.We.bias": params["w_e_b"],
            "explore_recommendation_decoder.Ue.weight": np.asarray(params["u_e"]).T,
            "explore_recommendation_decoder.Ue.bias": params["u_e_b"],
            "explore_recommendation_decoder.Ve.weight": np.asarray(params["v_e"]).T,
            "explore_recommendation_decoder.Ve.bias": params["v_e_b"],
            "explore_recommendation_decoder.matrix_for_explore.weight":
                np.asarray(params["explore_proj"]).T,
        })
    _compare("RepeatNet", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10,
                    "dropout_prob": 0.0})


def test_kgcn_loss_parity(synth_dataset_dir):
    # custom body: the reference samples its neighbor adjacency with
    # np.random at construction — inject ITS tables into our consts.
    # reg_weight=0 isolates the main BCE: the reg term differs only in
    # pooling shape (our loader feeds 2B pointwise rows, the reference a
    # pairwise batch), a documented protocol artifact.
    extra = {"load_col": KG_COLS, "reg_weight": 0.0}
    _, rds, rtrain, ref_m = _ref_pipeline("KGCN", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("KGCN", synth_dataset_dir, extra)
    batch_np, inter = _first_ref_batch(rtrain)
    our_m.adj_ent = our_m.register_const(
        "adj_ent", ref_m.adj_entity.numpy().astype(np.int32))
    our_m.adj_rel = our_m.register_const(
        "adj_rel", ref_m.adj_relation.numpy().astype(np.int32))
    R = np.asarray(params["relation_embedding"]).shape[0]
    sd = ref_m.state_dict()
    rel_full = sd["relation_embedding.weight"].numpy().copy()
    rel_full[:R] = np.asarray(params["relation_embedding"])
    _load(ref_m, {
        "user_embedding.weight": params["user_embedding"],
        "entity_embedding.weight": params["entity_embedding"],
        # reference oversizes its relation table by one never-indexed row
        "relation_embedding.weight": rel_full,
        "linear_layers.0.weight": np.asarray(params["agg_w"][0]).T,
        "linear_layers.0.bias": params["agg_b"][0],
    })
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter))
    # our pointwise layout: [pos rows; neg rows] with 1/0 labels
    u = np.concatenate([batch_np["user_id"], batch_np["user_id"]])
    i = np.concatenate([batch_np["item_id"], batch_np["neg_item_id"]])
    lbl = np.concatenate([np.ones_like(batch_np["user_id"], np.float32),
                          np.zeros_like(batch_np["user_id"], np.float32)])
    our_batch = {our_m.USER_ID: jnp.asarray(u), our_m.ITEM_ID: jnp.asarray(i),
                 our_m.LABEL: jnp.asarray(lbl)}
    our_loss = float(our_m.calculate_loss(params, our_batch, rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4)


def test_kgat_loss_parity(synth_dataset_dir, monkeypatch):
    """KGAT steady-state parity: inject our params into the reference, run
    BOTH update_attentive_A implementations (TransR edge scores + per-head
    sparse softmax), then compare rec loss, kg loss and pair scores. The
    reference's construction-time A (dgl init_graph) is skipped — dgl is
    not installed on this image, and that matrix only lives until the first
    epoch's update_attentive_A overwrites it (kgat.py:120-145, 253-265)."""
    from recbole.model.knowledge_aware_recommender.kgat import KGAT as RefKGAT
    from recbole.data.dataset.kg_dataset import KnowledgeBasedDataset

    monkeypatch.setattr(
        KnowledgeBasedDataset, "_create_ckg_graph",
        lambda self, form="dgl", show_relation=False: None)

    def stub_init_graph(self):
        idx = torch.zeros((2, 1), dtype=torch.long)
        return torch.sparse_coo_tensor(idx, torch.zeros(1), self.matrix_size)

    monkeypatch.setattr(RefKGAT, "init_graph", stub_init_graph)
    extra = {"load_col": KG_COLS}
    _, rds, rtrain, ref_m = _ref_pipeline("KGAT", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("KGAT", synth_dataset_dir, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    D, Dk = our_m.embedding_size, our_m.kg_embedding_size
    R = np.asarray(params["relation_embedding"]).shape[0]
    _load(ref_m, {
        "user_embedding.weight": params["user_embedding"],
        "entity_embedding.weight": params["entity_embedding"],
        "relation_embedding.weight": params["relation_embedding"],
        "trans_w.weight": np.asarray(params["trans_w"]).reshape(R, D * Dk),
        "aggregator_layers.0.W1.weight": np.asarray(params["agg"][0]["w1"]).T,
        "aggregator_layers.0.W1.bias": params["agg"][0]["b1"],
        "aggregator_layers.0.W2.weight": np.asarray(params["agg"][0]["w2"]).T,
        "aggregator_layers.0.W2.bias": params["agg"][0]["b2"],
    })
    with torch.no_grad():
        ref_m.update_attentive_A()
    params = our_m.update_attentive_A(params)
    with torch.no_grad():
        ref_rs = float(ref_m.calculate_loss(inter))
        ref_kg = float(ref_m.calculate_kg_loss(inter))
        ref_pair = ref_m.predict(inter).numpy()
    batch = _to_jnp(batch_np)
    with our_m.bind_consts(params.get("_const", {})):
        our_rs = float(our_m.calculate_loss(params, batch, rng=None))
        our_kg = float(our_m.calculate_kg_loss(params, batch, rng=None))
        our_pair = np.asarray(our_m.predict(params, batch))
    np.testing.assert_allclose(our_rs, ref_rs, rtol=2e-4,
                               err_msg="KGAT rec loss mismatch")
    np.testing.assert_allclose(our_kg, ref_kg, rtol=2e-4,
                               err_msg="KGAT kg loss mismatch")
    np.testing.assert_allclose(our_pair, ref_pair, rtol=2e-3, atol=2e-5,
                               err_msg="KGAT pair scores mismatch")


def test_ripplenet_loss_parity(synth_dataset_dir):
    """Full RippleNet loss (BCE − kg_weight·kge + reg_weight·EmbLoss) with
    the reference's np.random ripple sets injected into our hop-memory
    consts; exercises the transformed-item scoring chain, the all-hop kge
    sigmoid term and the per-hop gathered-triple reg."""
    extra = {"load_col": KG_COLS}
    _, rds, rtrain, ref_m = _ref_pipeline("RippleNet", synth_dataset_dir,
                                          extra)
    _, ods, our_m, params = _our_pipeline("RippleNet", synth_dataset_dir,
                                          extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    nH, nM = our_m.n_hop, our_m.n_memory
    H = np.zeros((rds.user_num, nH, nM), np.int32)
    R = np.zeros_like(H)
    T = np.zeros_like(H)
    for u, sets in ref_m.ripple_set.items():
        for hop in range(nH):
            H[u, hop] = sets[hop][0].numpy()
            R[u, hop] = sets[hop][1].numpy()
            T[u, hop] = sets[hop][2].numpy()
    our_m.rip_h = our_m.register_const("rip_h", H)
    our_m.rip_r = our_m.register_const("rip_r", R)
    our_m.rip_t = our_m.register_const("rip_t", T)
    D = our_m.embedding_size
    Rn = np.asarray(params["relation_embedding"]).shape[0]
    _load(ref_m, {
        "entity_embedding.weight": params["entity_embedding"],
        "relation_embedding.weight":
            np.asarray(params["relation_embedding"]).reshape(Rn, D * D),
        "transform_matrix.weight": np.asarray(params["transform"]).T,
    })
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter))
        ref_pred = ref_m.predict(inter).numpy()
    batch = _to_jnp(batch_np)
    our_loss = _scalar(our_m.calculate_loss(params, batch, rng=None))
    # our predict applies the final sigmoid; the reference returns logits
    our_pred = np.asarray(our_m._forward(
        params, batch[our_m.USER_ID], batch[our_m.ITEM_ID]))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg="RippleNet loss mismatch")
    np.testing.assert_allclose(our_pred, ref_pred, rtol=2e-3, atol=2e-5,
                               err_msg="RippleNet scores mismatch")


def _padded_pair_table(table_dict, offset, value, n_rows):
    """Reference interaction_table (user*offset+entity -> label) entries with
    the given label, as a padded per-user matrix + lengths."""
    per_user = {}
    for k, v in table_dict.items():
        if v == value:
            per_user.setdefault(int(k) // offset, []).append(int(k) % offset)
    width = max((len(v) for v in per_user.values()), default=1)
    tab = np.zeros((n_rows, width), np.int32)
    lens = np.zeros((n_rows,), np.int32)
    for u, ents in per_user.items():
        tab[u, :len(ents)] = ents
        lens[u] = len(ents)
    return tab, lens


def test_kgnnls_loss_parity(synth_dataset_dir):
    # inject the reference's np.random neighbor tables AND its
    # python-random interaction table (pos=1 / sampled neg=0 labels)
    # into our consts; full loss incl. label smoothness + reg.
    extra = {"load_col": KG_COLS}
    _, rds, rtrain, ref_m = _ref_pipeline("KGNNLS", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("KGNNLS", synth_dataset_dir, extra)
    batch_np, inter = _first_ref_batch(rtrain)
    our_m.adj_ent = our_m.register_const(
        "adj_ent", ref_m.adj_entity.numpy().astype(np.int32))
    our_m.adj_rel = our_m.register_const(
        "adj_rel", ref_m.adj_relation.numpy().astype(np.int32))
    rows = rds.user_num + 1
    pos_t, pos_l = _padded_pair_table(
        ref_m.interaction_table, ref_m.offset, 1.0, rows)
    neg_t, neg_l = _padded_pair_table(
        ref_m.interaction_table, ref_m.offset, 0.0, rows)
    our_m.hist = our_m.register_const("hist", pos_t)
    our_m.hlen = our_m.register_const("hlen", pos_l)
    our_m.neg_hist = our_m.register_const("neg_hist", neg_t)
    our_m.neg_len = our_m.register_const("neg_len", neg_l)
    R = np.asarray(params["relation_embedding"]).shape[0]
    sd = ref_m.state_dict()
    rel_full = sd["relation_embedding.weight"].numpy().copy()
    rel_full[:R] = np.asarray(params["relation_embedding"])
    _load(ref_m, {
        "user_embedding.weight": params["user_embedding"],
        "entity_embedding.weight": params["entity_embedding"],
        "relation_embedding.weight": rel_full,
        "linear_layers.0.weight": np.asarray(params["agg_w"][0]).T,
        "linear_layers.0.bias": params["agg_b"][0],
    })
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter))
    u = np.concatenate([batch_np["user_id"], batch_np["user_id"]])
    i = np.concatenate([batch_np["item_id"], batch_np["neg_item_id"]])
    lbl = np.concatenate([np.ones_like(batch_np["user_id"], np.float32),
                          np.zeros_like(batch_np["user_id"], np.float32)])
    our_batch = {our_m.USER_ID: jnp.asarray(u), our_m.ITEM_ID: jnp.asarray(i),
                 our_m.LABEL: jnp.asarray(lbl)}
    our_loss = float(our_m.calculate_loss(params, our_batch, rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4)


def _ref_model_manual_split(model, data_path, extra=None):
    """The reference's UserDataLoader is broken on this image (TypeError in
    data_preparation); split manually and construct the model from the TRAIN
    split — the VAE/autoencoder family only needs user-id batches anyway."""
    from recbole.config import Config
    from recbole.config.eval_setting import EvalSetting
    from recbole.data import create_dataset
    from recbole.utils import init_seed, get_model
    cfg = {**BASE_CFG, "data_path": data_path, **(extra or {})}
    config = Config(model=model, dataset="synth", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    ds = create_dataset(config)
    built = ds.build(EvalSetting(config))
    m = get_model(config["model"])(config, built[0]).to("cpu")
    m.eval()
    return config, ds, m


def _compare_user_batch(model, data_path, mapper, extra=None, rtol=2e-4,
                        our_extra_cols=None):
    _, rds, ref_m = _ref_model_manual_split(model, data_path, extra)
    _, ods, our_m, params = _our_pipeline(model, data_path, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    users = np.arange(1, rds.user_num, dtype=np.int64)
    mapper(ref_m, params)
    from recbole.data.interaction import Interaction
    inter = Interaction({ref_m.USER_ID: torch.tensor(users)})
    with torch.no_grad():
        ref_loss = _scalar(ref_m.calculate_loss(inter))
    our_batch = {our_m.USER_ID: jnp.asarray(users)}
    if our_extra_cols:
        our_batch.update(our_extra_cols)
    our_loss = _scalar(our_m.calculate_loss(params, our_batch, rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=rtol,
                               err_msg=f"{model} loss mismatch")


def test_multivae_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {}
        for i, lyr in enumerate(params["encoder"]):
            upd[f"encoder.{2 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"encoder.{2 * i}.bias"] = lyr["b"]
        for i, lyr in enumerate(params["decoder"]):
            upd[f"decoder.{2 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"decoder.{2 * i}.bias"] = lyr["b"]
        _load(ref_m, upd)
    # the reference increments its update counter before the first anneal;
    # feed the matching _step
    _compare_user_batch("MultiVAE", synth_dataset_dir, mapper,
                        extra={"dropout_prob": 0.0},
                        our_extra_cols={"_step": jnp.int32(1)})


def test_multidae_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {}
        for i, lyr in enumerate(params["encoder"]):
            upd[f"encoder.mlp_layers.{1 + 3 * i}.weight"] = \
                np.asarray(lyr["w"]).T
            upd[f"encoder.mlp_layers.{1 + 3 * i}.bias"] = lyr["b"]
        for i, lyr in enumerate(params["decoder"]):
            upd[f"decoder.{2 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"decoder.{2 * i}.bias"] = lyr["b"]
        _load(ref_m, upd)
    _compare_user_batch("MultiDAE", synth_dataset_dir, mapper,
                        extra={"dropout_prob": 0.0})


def test_cdae_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "h_user.weight": params["user_embedding"],
            "h_item.weight": np.asarray(params["enc_w"]).T,
            "h_item.bias": params["enc_b"],
            "out_layer.weight": np.asarray(params["dec_w"]).T,
            "out_layer.bias": params["dec_b"],
        })
    _compare_user_batch("CDAE", synth_dataset_dir, mapper,
                        extra={"corruption_ratio": 0.0})


def test_enmf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "H_i.weight": np.asarray(params["h"]).T,
        })
    _compare_user_batch("ENMF", synth_dataset_dir, mapper,
                        extra={"dropout_prob": 0.0})


def test_macridvae_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {"item_embedding.weight": params["item_embedding"],
               "k_embedding.weight": params["k_embedding"]}
        for i, lyr in enumerate(params["encoder"]):
            upd[f"encoder.{2 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"encoder.{2 * i}.bias"] = lyr["b"]
        _load(ref_m, upd)
    # eval mode: gumbel sampling and dropout off on both sides; reference
    # bumps its update counter before the anneal -> matching _step=1
    _compare_user_batch("MacridVAE", synth_dataset_dir, mapper,
                        extra={"drop_out": 0.0},
                        our_extra_cols={"_step": jnp.int32(1)})


def test_recvae_loss_parity(synth_dataset_dir):
    """RecVAE negative ELBO with the composite prior (standard + frozen
    old-encoder posterior + wide-normal mixture); the reference's
    calculate_loss takes an encoder_flag arg, so this drives it directly
    instead of via _compare_user_batch."""
    _, rds, ref_m = _ref_model_manual_split("RecVAE", synth_dataset_dir)
    _, ods, our_m, params = _our_pipeline("RecVAE", synth_dataset_dir)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    users = np.arange(1, rds.user_num, dtype=np.int64)
    upd = {"decoder.weight": np.asarray(params["decoder"]["w"]).T,
           "decoder.bias": params["decoder"]["b"]}
    for prefix, tree in (("encoder", params["encoder"]),
                         ("prior.encoder_old", params["encoder_old"])):
        for i in range(1, 6):
            upd[f"{prefix}.fc{i}.weight"] = np.asarray(tree[f"fc{i}"]["w"]).T
            upd[f"{prefix}.fc{i}.bias"] = tree[f"fc{i}"]["b"]
            upd[f"{prefix}.ln{i}.weight"] = tree[f"ln{i}_g"]
            upd[f"{prefix}.ln{i}.bias"] = tree[f"ln{i}_b"]
        for head in ("mu", "logvar"):
            upd[f"{prefix}.fc_{head}.weight"] = \
                np.asarray(tree[f"fc_{head}"]["w"]).T
            upd[f"{prefix}.fc_{head}.bias"] = tree[f"fc_{head}"]["b"]
    _load(ref_m, upd)
    from recbole.data.interaction import Interaction
    inter = Interaction({ref_m.USER_ID: torch.tensor(users)})
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter, encoder_flag=True))
    our_loss = float(our_m.calculate_loss(
        params, {our_m.USER_ID: jnp.asarray(users)}, rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg="RecVAE loss mismatch")


def test_nncf_loss_parity(synth_dataset_dir):
    """NNCF BCE with the reference's np.random neighbor tables injected into
    our consts; exercises the Conv1d+MaxPool neighborhood encoders and the
    GMF-mul + MLP + sigmoid head."""
    _, rds, rtrain, ref_m = _ref_pipeline("NNCF", synth_dataset_dir)
    _, ods, our_m, params = _our_pipeline("NNCF", synth_dataset_dir)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    our_m.u_neigh = our_m.register_const(
        "u_neigh", ref_m.u_neigh.numpy().astype(np.int32))
    our_m.i_neigh = our_m.register_const(
        "i_neigh", ref_m.i_neigh.numpy().astype(np.int32))
    upd = {
        "user_embedding.weight": params["user_embedding"],
        "item_embedding.weight": params["item_embedding"],
        "user_neigh_embedding.weight": params["user_neigh_embedding"],
        "item_neigh_embedding.weight": params["item_neigh_embedding"],
        "user_conv.0.weight": params["user_conv_w"],
        "user_conv.0.bias": params["user_conv_b"],
        "item_conv.0.weight": params["item_conv_w"],
        "item_conv.0.bias": params["item_conv_b"],
        "out_layer.0.weight": np.asarray(params["out_w"]).T,
        "out_layer.0.bias": np.asarray(params["out_b"]).reshape(1),
    }
    for i, lyr in enumerate(params["mlp"]):
        upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.weight"] = \
            np.asarray(lyr["w"]).T
        upd[f"mlp_layers.mlp_layers.{1 + 3 * i}.bias"] = lyr["b"]
    _load(ref_m, upd)
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter))
    our_loss = float(our_m.calculate_loss(params, _to_jnp(batch_np),
                                          rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg="NNCF loss mismatch")


def test_gcmc_loss_parity(synth_dataset_dir):
    """GCMC 2-class cross-entropy + class-1-logit ranking scores. The
    reference shares its user/item GCN weight lists and dense layer
    (share_user_item_weights=True), so both aliased state keys get the
    same table."""
    _, rds, rtrain, ref_m = _ref_pipeline("GCMC", synth_dataset_dir)
    _, ods, our_m, params = _our_pipeline("GCMC", synth_dataset_dir)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    upd = {
        "GcEncoder.weights_u.0": params["w"],
        "GcEncoder.dense_layer_u.weight": np.asarray(params["dense_w"]).T,
        "BiDecoder.dense_layer.weight": np.asarray(params["dec_dense"]).T,
    }
    for i, q in enumerate(params["q"]):
        upd[f"BiDecoder.weights.{i}"] = q
    sd = ref_m.state_dict()
    if "GcEncoder.weights_v.0" in sd:
        upd["GcEncoder.weights_v.0"] = params["w"]
    if "GcEncoder.dense_layer_v.weight" in sd:
        upd["GcEncoder.dense_layer_v.weight"] = \
            np.asarray(params["dense_w"]).T
    _load(ref_m, upd)
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter))
        ref_pred = ref_m.predict(inter).numpy()
    batch = _to_jnp(batch_np)
    our_loss = float(our_m.calculate_loss(params, batch, rng=None))
    our_pred = np.asarray(our_m.predict(params, batch))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg="GCMC loss mismatch")
    np.testing.assert_allclose(our_pred, ref_pred, rtol=2e-3, atol=2e-5,
                               err_msg="GCMC scores mismatch")


FEAT_COLS = {"inter": ["user_id", "item_id", "rating", "timestamp"],
             "item": ["item_id", "genre", "price"]}
FEAT_EXTRA = {"load_col": FEAT_COLS, "selected_features": ["genre", "price"],
              "pooling_mode": "mean", "loss_type": "CE",
              "training_neg_sample_num": 0, "MAX_ITEM_LIST_LENGTH": 10,
              "dropout_prob": 0.0}


def _inject_feat_tables(ref_m, const, seq_fields=(), float_fields=(),
                        token_fields=(), kind="item"):
    """Copy our frozen feature tables into the reference's UNREGISTERED
    embedding dicts (they are not in state_dict — layers.py:566-611)."""
    layer = ref_m.feature_embed_layer
    for i, f in enumerate(seq_fields):
        layer.token_seq_embedding_table[kind][i].weight.data = \
            torch.tensor(np.asarray(const[f"feat_{f}"], dtype=np.float32))
    if float_fields:
        tbl = np.stack([np.asarray(const[f"feat_{f}"])[0]
                        for f in float_fields])
        layer.float_embedding_table[kind].weight.data = \
            torch.tensor(tbl.astype(np.float32))
    if token_fields:
        tbl = np.concatenate([np.asarray(const[f"feat_{f}"])
                              for f in token_fields], axis=0)
        layer.token_embedding_table[kind].embedding.weight.data = \
            torch.tensor(tbl.astype(np.float32))


def test_gru4recf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "dense_layer.weight": np.asarray(params["dense_w"]).T,
            "dense_layer.bias": params["dense_b"],
        }
        for name, g in (("item_gru_layers", params["item_gru"]),
                        ("feature_gru_layers", params["feat_gru"])):
            for li, layer in enumerate(g):
                upd[f"{name}.weight_ih_l{li}"] = np.asarray(layer["wi"]).T
                upd[f"{name}.weight_hh_l{li}"] = np.asarray(layer["wh"]).T
        _load(ref_m, upd)
        _inject_feat_tables(ref_m, params["_const"], seq_fields=["genre"],
                            float_fields=["price"])
    _compare("GRU4RecF", synth_dataset_dir, mapper, extra=FEAT_EXTRA)


def _trm_keys(prefix, lyr):
    return {
        f"{prefix}.multi_head_attention.query.weight": np.asarray(lyr["wq"]).T,
        f"{prefix}.multi_head_attention.query.bias": lyr["bq"],
        f"{prefix}.multi_head_attention.key.weight": np.asarray(lyr["wk"]).T,
        f"{prefix}.multi_head_attention.key.bias": lyr["bk"],
        f"{prefix}.multi_head_attention.value.weight": np.asarray(lyr["wv"]).T,
        f"{prefix}.multi_head_attention.value.bias": lyr["bv"],
        f"{prefix}.multi_head_attention.dense.weight": np.asarray(lyr["wo"]).T,
        f"{prefix}.multi_head_attention.dense.bias": lyr["bo"],
        f"{prefix}.multi_head_attention.LayerNorm.weight": lyr["ln1_g"],
        f"{prefix}.multi_head_attention.LayerNorm.bias": lyr["ln1_b"],
        f"{prefix}.feed_forward.dense_1.weight": np.asarray(lyr["ff1_w"]).T,
        f"{prefix}.feed_forward.dense_1.bias": lyr["ff1_b"],
        f"{prefix}.feed_forward.dense_2.weight": np.asarray(lyr["ff2_w"]).T,
        f"{prefix}.feed_forward.dense_2.bias": lyr["ff2_b"],
        f"{prefix}.feed_forward.LayerNorm.weight": lyr["ln2_g"],
        f"{prefix}.feed_forward.LayerNorm.bias": lyr["ln2_b"],
    }


def test_sasrecf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "position_embedding.weight": params["position_embedding"],
            "concat_layer.weight": np.asarray(params["concat_w"]).T,
            "concat_layer.bias": params["concat_b"],
            "LayerNorm.weight": params["ln_g"],
            "LayerNorm.bias": params["ln_b"],
        }
        for i, lyr in enumerate(params["encoder"]):
            upd.update(_trm_keys(f"trm_encoder.layer.{i}", lyr))
        _load(ref_m, upd)
        _inject_feat_tables(ref_m, params["_const"], seq_fields=["genre"],
                            float_fields=["price"])
    _compare("SASRecF", synth_dataset_dir, mapper,
             extra={**FEAT_EXTRA, "hidden_dropout_prob": 0.0,
                    "attn_dropout_prob": 0.0})


def test_fdsa_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "position_embedding.weight": params["position_embedding"],
            "concat_layer.weight": np.asarray(params["concat_w"]).T,
            "concat_layer.bias": params["concat_b"],
            "LayerNorm.weight": params["ln_g"],
            "LayerNorm.bias": params["ln_b"],
            "feature_att_layer.projection.0.weight":
                np.asarray(params["va_w1"]).T,
            "feature_att_layer.projection.0.bias": params["va_b1"],
            "feature_att_layer.projection.2.weight":
                np.asarray(params["va_w2"]).T,
        }
        for enc, ours in (("item_trm_encoder", params["item_encoder"]),
                          ("feature_trm_encoder", params["feat_encoder"])):
            for i, lyr in enumerate(ours):
                upd.update(_trm_keys(f"{enc}.layer.{i}", lyr))
        _load(ref_m, upd)
        _inject_feat_tables(ref_m, params["_const"], seq_fields=["genre"],
                            float_fields=["price"])
    _compare("FDSA", synth_dataset_dir, mapper,
             extra={**FEAT_EXTRA, "hidden_dropout_prob": 0.0,
                    "attn_dropout_prob": 0.0})


def test_din_loss_parity(synth_dataset_dir):
    """DIN BCE in torch TRAIN mode (batch-stat BatchNorm in the Dice DNN,
    dropout zeroed). The reference's ContextSeqEmbLayer tables (item_id
    token + genre token_seq + price float) are frozen/unregistered; our
    _const copies are injected into its raw embedding objects."""
    extra = {"load_col": FEAT_COLS, "MAX_ITEM_LIST_LENGTH": 10,
             "dropout_prob": 0.0, "pooling_mode": "mean"}
    _, rds, rtrain, ref_m = _ref_pipeline("DIN", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("DIN", synth_dataset_dir, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    const = params["_const"]
    layer = ref_m.embedding_layer
    layer.token_embedding_table["item"].embedding.weight.data = \
        torch.tensor(np.asarray(const["item_embedding"], dtype=np.float32))
    layer.token_seq_embedding_table["item"][0].weight.data = \
        torch.tensor(np.asarray(const["feat_genre"], dtype=np.float32))
    layer.float_embedding_table["item"].weight.data = \
        torch.tensor(np.asarray(const["feat_price"], dtype=np.float32))
    upd = {
        "attention.dense.weight": np.asarray(params["att"]["dense_w"]).T,
        "attention.dense.bias":
            np.asarray(params["att"]["dense_b"]).reshape(1),
        "dnn_predict_layers.weight": np.asarray(params["predict_w"]).T,
        "dnn_predict_layers.bias":
            np.asarray(params["predict_b"]).reshape(1),
    }
    for i, lyr in enumerate(params["att"]["mlp"]):
        upd[f"attention.att_mlp_layers.mlp_layers.{1 + 3 * i}.weight"] = \
            np.asarray(lyr["w"]).T
        upd[f"attention.att_mlp_layers.mlp_layers.{1 + 3 * i}.bias"] = \
            lyr["b"]
    for i, lyr in enumerate(params["dnn"]):
        upd[f"dnn_mlp_layers.mlp_layers.{1 + 4 * i}.weight"] = \
            np.asarray(lyr["w"]).T
        upd[f"dnn_mlp_layers.mlp_layers.{1 + 4 * i}.bias"] = lyr["b"]
        upd[f"dnn_mlp_layers.mlp_layers.{2 + 4 * i}.weight"] = lyr["bn_g"]
        upd[f"dnn_mlp_layers.mlp_layers.{2 + 4 * i}.bias"] = lyr["bn_b"]
    _load(ref_m, upd)
    ref_m.train()
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter))
    our_loss = float(our_m.calculate_loss(params, _to_jnp(batch_np),
                                          rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg="DIN loss mismatch")


def test_dien_loss_parity(synth_dataset_dir):
    """DIEN main BCE + alpha * auxiliary BCE in torch TRAIN mode, with the
    reference's DIENDataLoader position-wise negative sequence consumed by
    our calculate_loss and all frozen ContextSeqEmbLayer tables injected."""
    extra = {"load_col": FEAT_COLS, "MAX_ITEM_LIST_LENGTH": 10,
             "dropout_prob": 0.0, "pooling_mode": "mean"}
    _, rds, rtrain, ref_m = _ref_pipeline("DIEN", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("DIEN", synth_dataset_dir, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    assert "neg_item_id_list" in batch_np
    const = params["_const"]
    layer = ref_m.embedding_layer
    layer.token_embedding_table["item"].embedding.weight.data = \
        torch.tensor(np.asarray(const["item_embedding"], dtype=np.float32))
    layer.token_seq_embedding_table["item"][0].weight.data = \
        torch.tensor(np.asarray(const["feat_genre"], dtype=np.float32))
    layer.float_embedding_table["item"].weight.data = \
        torch.tensor(np.asarray(const["feat_price"], dtype=np.float32))
    layer.token_embedding_table["user"].embedding.weight.data = \
        torch.tensor(np.asarray(const["user_embedding"], dtype=np.float32))
    g = params["extractor_gru"]
    a = params["augru"]
    upd = {
        "interset_extractor.gru.weight_ih_l0": np.asarray(g["wi"]).T,
        "interset_extractor.gru.weight_hh_l0": np.asarray(g["wh"]).T,
        "interset_extractor.gru.bias_ih_l0": g["bi"],
        "interset_extractor.gru.bias_hh_l0": g["bh"],
        "interest_evolution.dynamic_rnn.rnn.weight_ih": np.asarray(a["wi"]).T,
        "interest_evolution.dynamic_rnn.rnn.weight_hh": np.asarray(a["wh"]).T,
        "interest_evolution.dynamic_rnn.rnn.bias_ih": a["bi"],
        "interest_evolution.dynamic_rnn.rnn.bias_hh": a["bh"],
        "interest_evolution.attention_layer.dense.weight":
            np.asarray(params["att"]["dense_w"]).T,
        "interest_evolution.attention_layer.dense.bias":
            np.asarray(params["att"]["dense_b"]).reshape(1),
        "dnn_predict_layer.weight": np.asarray(params["predict_w"]).T,
        "dnn_predict_layer.bias": np.asarray(params["predict_b"]).reshape(1),
    }
    for i, lyr in enumerate(params["att"]["mlp"]):
        p = f"interest_evolution.attention_layer.att_mlp_layers.mlp_layers"
        upd[f"{p}.{1 + 3 * i}.weight"] = np.asarray(lyr["w"]).T
        upd[f"{p}.{1 + 3 * i}.bias"] = lyr["b"]
    for i, lyr in enumerate(params["aux_mlp"]):
        p = "interset_extractor.auxiliary_net.mlp_layers"
        upd[f"{p}.{1 + 3 * i}.weight"] = np.asarray(lyr["w"]).T
        upd[f"{p}.{1 + 3 * i}.bias"] = lyr["b"]
    for i, lyr in enumerate(params["dnn"]):
        upd[f"dnn_mlp_layers.mlp_layers.{1 + 4 * i}.weight"] = \
            np.asarray(lyr["w"]).T
        upd[f"dnn_mlp_layers.mlp_layers.{1 + 4 * i}.bias"] = lyr["b"]
        upd[f"dnn_mlp_layers.mlp_layers.{2 + 4 * i}.weight"] = lyr["bn_g"]
        upd[f"dnn_mlp_layers.mlp_layers.{2 + 4 * i}.bias"] = lyr["bn_b"]
    _load(ref_m, upd)
    ref_m.train()
    with torch.no_grad():
        ref_loss = float(ref_m.calculate_loss(inter))
    our_loss = _scalar(our_m.calculate_loss(params, _to_jnp(batch_np),
                                            rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg="DIEN loss mismatch")


@pytest.fixture(scope="module")
def synth_ent_dataset_dir(tmp_path_factory):
    """Synth dataset + .ent preload file (8-dim pretrained entity vectors)."""
    from tests.synth_data import make_synthetic_dataset
    root = str(tmp_path_factory.mktemp("entdata"))
    ds_dir = make_synthetic_dataset(root, name="synth")
    rng = np.random.RandomState(0)
    with open(f"{ds_dir}/synth.ent", "w") as fh:
        fh.write("ent_id:token\tent_vec:float_seq\n")
        for i in range(1, 101):
            vec = " ".join(f"{v:.4f}" for v in rng.randn(8))
            fh.write(f"e{i}\t{vec}\n")
    with open(f"{ds_dir}/synth.rel", "w") as fh:
        fh.write("rel_id:token\trel_vec:float_seq\n")
        for r in range(1, 5):
            vec = " ".join(f"{v:.4f}" for v in rng.randn(8))
            fh.write(f"r{r}\t{vec}\n")
    return root


ENT_EXTRA = {"embedding_size": 8, "hidden_size": 16,
             "additional_feat_suffix": ["ent"],
             "preload_weight": {"ent_id": "ent_vec"},
             "load_col": {"inter": ["user_id", "item_id", "rating",
                                    "timestamp"],
                          "kg": ["head_id", "relation_id", "tail_id"],
                          "link": ["item_id", "entity_id"],
                          "ent": ["ent_id", "ent_vec"]},
             "loss_type": "CE", "training_neg_sample_num": 0,
             "MAX_ITEM_LIST_LENGTH": 10, "dropout_prob": 0.0}


def test_gru4reckg_loss_parity(synth_ent_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "entity_embedding.weight": params["entity_embedding"],
            "dense_layer.weight": np.asarray(params["dense_w"]).T,
            "dense_layer.bias": params["dense_b"],
        }
        for name, g in (("item_gru_layers", params["item_gru"]),
                        ("entity_gru_layers", params["entity_gru"])):
            for li, layer in enumerate(g):
                upd[f"{name}.weight_ih_l{li}"] = np.asarray(layer["wi"]).T
                upd[f"{name}.weight_hh_l{li}"] = np.asarray(layer["wh"]).T
        _load(ref_m, upd)
    _compare("GRU4RecKG", synth_ent_dataset_dir, mapper, extra=ENT_EXTRA)


def test_ksr_loss_parity(synth_ent_dataset_dir):
    extra = {**ENT_EXTRA,
             "additional_feat_suffix": ["ent", "rel"],
             "preload_weight": {"ent_id": "ent_vec", "rel_id": "rel_vec"},
             "load_col": {**ENT_EXTRA["load_col"],
                          "rel": ["rel_id", "rel_vec"]}}

    def mapper(ref_m, params):
        upd = {
            "item_embedding.weight": params["item_embedding"],
            "entity_embedding.weight": params["entity_embedding"],
            "dense.weight": np.asarray(params["dense_w"]).T,
            "dense.bias": params["dense_b"],
            "dense_layer_u.weight": np.asarray(params["dense_u_w"]).T,
            "dense_layer_u.bias": params["dense_u_b"],
            "dense_layer_i.weight": np.asarray(params["dense_i_w"]).T,
            "dense_layer_i.bias": params["dense_i_b"],
        }
        for li, layer in enumerate(params["gru"]):
            upd[f"gru_layers.weight_ih_l{li}"] = np.asarray(layer["wi"]).T
            upd[f"gru_layers.weight_hh_l{li}"] = np.asarray(layer["wh"]).T
        _load(ref_m, upd)
        # relation_Matrix is a plain tensor (not in state_dict)
        ref_m.relation_Matrix = torch.tensor(
            np.asarray(params["relation_embedding"], dtype=np.float32))
    _compare("KSR", synth_ent_dataset_dir, mapper, extra=extra)


def test_s3rec_loss_parity(synth_dataset_dir):
    """S3Rec both stages: (1) pretrain — the reference's own
    reconstruct_pretrain_data tensors are fed to BOTH its pretrain() and our
    pretrain_core() (exact SUM scaling over AAP/MIP/MAP/SP); (2) finetune —
    causal CE over the FULL item table including the mask-token row."""
    extra = {"load_col": FEAT_COLS, "MAX_ITEM_LIST_LENGTH": 10,
             "item_attribute": "genre", "train_stage": "pretrain",
             "hidden_dropout_prob": 0.0, "attn_dropout_prob": 0.0,
             "n_layers": 2, "loss_type": "CE",
             "training_neg_sample_num": 0}
    _, rds, rtrain, ref_m = _ref_pipeline("S3Rec", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("S3Rec", synth_dataset_dir, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    upd = {
        "item_embedding.weight": params["item_embedding"],
        "position_embedding.weight": params["position_embedding"],
        "feature_embedding.weight": params["feature_embedding"],
        "LayerNorm.weight": params["ln_g"],
        "LayerNorm.bias": params["ln_b"],
    }
    for head in ("aap", "mip", "map", "sp"):
        upd[f"{head}_norm.weight"] = np.asarray(params[f"{head}_w"]).T
        upd[f"{head}_norm.bias"] = params[f"{head}_b"]
    for i, lyr in enumerate(params["encoder"]):
        upd.update(_trm_keys(f"trm_encoder.layer.{i}", lyr))
    _load(ref_m, upd)

    item_seq = inter["item_id_list"]
    item_seq_len = inter["item_length"]
    with torch.no_grad():
        tensors = ref_m.reconstruct_pretrain_data(item_seq, item_seq_len)
        ref_pre = float(ref_m.pretrain(*tensors))
    feats, masked, pos_i, neg_i, mseg, pseg, nseg = \
        [t.numpy() for t in tensors]
    L = masked.shape[1]
    our_pre = float(our_m.pretrain_core(
        params, jnp.asarray(feats, jnp.float32), jnp.asarray(masked),
        jnp.asarray(pos_i), jnp.asarray(neg_i), jnp.asarray(mseg),
        jnp.asarray(pseg), jnp.asarray(nseg),
        jnp.full((masked.shape[0],), L - 1, jnp.int32)))
    np.testing.assert_allclose(our_pre, ref_pre, rtol=2e-4,
                               err_msg="S3Rec pretrain loss mismatch")

    # finetune CE (flip the stage on both constructed models)
    ref_m.train_stage = "finetune"
    ref_m.loss_fct = torch.nn.CrossEntropyLoss()
    our_m.train_stage = "finetune"
    with torch.no_grad():
        ref_ft = float(ref_m.calculate_loss(inter))
    our_ft = float(our_m.calculate_loss(params, _to_jnp(batch_np), rng=None))
    np.testing.assert_allclose(our_ft, ref_ft, rtol=2e-4,
                               err_msg="S3Rec finetune loss mismatch")


def test_mfsimple_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "user_bias": params["user_bias"],
            "item_bias": params["item_bias"],
            "bias": params["bias"],
        })
    _compare("MFSimple", synth_dataset_dir, mapper)


def test_gmf_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "w.weight": np.asarray(params["w"]).T,
            "w.bias": params["b"],
        })
    _compare("GMF", synth_dataset_dir, mapper)


def test_mlp_model_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        upd = {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        }
        n = len(params["mlp"])
        for i, lyr in enumerate(params["mlp"]):
            upd[f"fc_layers.{1 + 3 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"fc_layers.{1 + 3 * i}.bias"] = lyr["b"]
        upd[f"fc_layers.{3 * n}.weight"] = np.asarray(params["out_w"]).T
        upd[f"fc_layers.{3 * n}.bias"] = params["out_b"]
        _load(ref_m, upd)
    _compare("MLP", synth_dataset_dir, mapper, extra={"dropout": 0.0})


def test_ncf_loss_parity(synth_dataset_dir):
    """Includes the fork's gmf_item_embedding-by-USER lookup quirk
    (ncf.py:57), replicated by our default ncf_fix_gmf_item_lookup=False."""
    def mapper(ref_m, params):
        upd = {
            "mlp_user_embedding.weight": params["mlp_user_embedding"],
            "mlp_item_embedding.weight": params["mlp_item_embedding"],
            "gmf_user_embedding.weight": params["gmf_user_embedding"],
            "gmf_item_embedding.weight": params["gmf_item_embedding"],
            "affine_output.weight": np.asarray(params["out_w"]).T,
            "affine_output.bias": params["out_b"],
        }
        for i, lyr in enumerate(params["mlp"]):
            upd[f"mlp_fc_layers.{2 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"mlp_fc_layers.{2 * i}.bias"] = lyr["b"]
        _load(ref_m, upd)
    _compare("NCF", synth_dataset_dir, mapper)


def _our_fit(our_m, model, data_path, extra=None):
    """TRADITIONAL models build their 'params' from the train split via
    fit_params (our TraditionalTrainer's flow)."""
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    cfg = {**BASE_CFG, "data_path": data_path, **(extra or {})}
    config = Config(model=model, dataset="synth", config_dict=cfg)
    ds = create_dataset(config)
    train, _, _ = data_preparation(config, ds)
    return our_m.fit_params(jax.random.key(0, impl="rbg"), train)


def test_ease_scores_parity(synth_dataset_dir):
    """EASE closed-form: full-sort scores equal the reference's
    X @ B with B = -P/diag(P), zero diagonal (ease.py:30-70)."""
    _, rds, rtrain, ref_m = _ref_pipeline("EASE", synth_dataset_dir)
    _, ods, our_m, params = _our_pipeline("EASE", synth_dataset_dir)
    params = _our_fit(our_m, "EASE", synth_dataset_dir)
    users = np.arange(1, min(rds.user_num, 40), dtype=np.int64)
    from recbole.data.interaction import Interaction
    inter = Interaction({ref_m.USER_ID: torch.tensor(users)})
    with torch.no_grad():
        ref_scores = ref_m.full_sort_predict(inter).numpy().reshape(
            len(users), -1)
    our_scores = np.asarray(our_m.full_sort_predict(
        params, {our_m.USER_ID: jnp.asarray(users)}))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=2e-3, atol=2e-4,
                               err_msg="EASE score mismatch")


def test_pop_scores_parity(synth_dataset_dir):
    """Pop: after one pass over the reference's train loader, normalized
    popularity scores match our construction-time counts."""
    # batch size 1, no negatives: the reference's index-assign increments
    # an item ONCE PER BATCH (last-write-wins on duplicates) and counts
    # sampled negatives too (pop.py:38-43) — at batch size 1 its counts
    # reduce to true positive popularity, which is what we implement
    extra = {"train_batch_size": 1, "training_neg_sample_num": 0}
    _, rds, rtrain, ref_m = _ref_pipeline("Pop", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("Pop", synth_dataset_dir, extra)
    params = _our_fit(our_m, "Pop", synth_dataset_dir, extra)
    with torch.no_grad():
        for inter in rtrain:
            ref_m.calculate_loss(inter)
    users = np.arange(1, 10, dtype=np.int64)
    from recbole.data.interaction import Interaction
    inter = Interaction({ref_m.USER_ID: torch.tensor(users)})
    with torch.no_grad():
        ref_scores = ref_m.full_sort_predict(inter).numpy().reshape(
            len(users), -1)
    our_scores = np.asarray(our_m.full_sort_predict(
        params, {our_m.USER_ID: jnp.asarray(users)}))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=2e-4, atol=1e-6,
                               err_msg="Pop score mismatch")


def test_itemknn_scores_parity(synth_dataset_dir):
    """ItemKNN: shrink-regularized cosine + per-item top-k column pruning;
    full-sort scores equal the reference's X @ W. k >= n_items so the
    comparison is tie-independent (at small k, EQUAL-similarity neighbors at
    the k-th boundary are chosen by argpartition order in the reference and
    by lax.top_k order here)."""
    extra = {"k": 200, "shrink": 0.5}
    _, rds, rtrain, ref_m = _ref_pipeline("ItemKNN", synth_dataset_dir,
                                          extra)
    _, ods, our_m, params = _our_pipeline("ItemKNN", synth_dataset_dir,
                                          extra)
    params = _our_fit(our_m, "ItemKNN", synth_dataset_dir, extra)
    users = np.arange(1, min(rds.user_num, 40), dtype=np.int64)
    from recbole.data.interaction import Interaction
    inter = Interaction({ref_m.USER_ID: torch.tensor(users)})
    with torch.no_grad():
        ref_scores = ref_m.full_sort_predict(inter).numpy().reshape(
            len(users), -1)
    our_scores = np.asarray(our_m.full_sort_predict(
        params, {our_m.USER_ID: jnp.asarray(users)}))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=2e-4, atol=2e-6,
                               err_msg="ItemKNN score mismatch")


def test_ract_loss_parity(synth_dataset_dir):
    """RaCT all three stages (actor ELBO / critic NDCG regression with
    batch-stat BatchNorm / critic-maximizing finetune) in torch train mode
    with dropout zeroed and reparameterize pinned to mu."""
    # metrics_k below n_items: the reference's calculate_ndcg cannot handle
    # k > n_items (tp length mismatch, ract.py:186-196)
    extra = {"dropout_prob": 0.0, "metrics_k": 50}
    _, rds, ref_m = _ref_model_manual_split("RaCT", synth_dataset_dir, extra)
    _, ods, our_m, params = _our_pipeline("RaCT", synth_dataset_dir, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    upd = {"critic_net.0.weight": params["critic_bn_g"],
           "critic_net.0.bias": params["critic_bn_b"]}
    for name in ("encoder", "decoder"):
        for i, lyr in enumerate(params[name]):
            upd[f"{name}.{2 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"{name}.{2 * i}.bias"] = lyr["b"]
    for i, lyr in enumerate(params["critic"]):
        upd[f"critic_net.{1 + 2 * i}.weight"] = np.asarray(lyr["w"]).T
        upd[f"critic_net.{1 + 2 * i}.bias"] = lyr["b"]
    _load(ref_m, upd)
    ref_m.train()
    ref_m.reparameterize = lambda mu, logvar: mu
    users = np.arange(1, rds.user_num, dtype=np.int64)
    from recbole.data.interaction import Interaction
    inter = Interaction({ref_m.USER_ID: torch.tensor(users)})
    batch = {our_m.USER_ID: jnp.asarray(users)}
    for step, stage in enumerate(
            ("actor_pretrain", "critic_pretrain", "finetune"), start=1):
        ref_m.train_stage = stage
        our_m.train_stage = stage
        with torch.no_grad():
            ref_loss = float(ref_m.calculate_loss(inter))
        our_loss = float(our_m.calculate_loss(
            params, {**batch, "_step": jnp.int32(step)}, rng=None))
        np.testing.assert_allclose(
            our_loss, ref_loss, rtol=2e-4,
            err_msg=f"RaCT {stage} loss mismatch")


def test_slimelastic_objective_parity(synth_dataset_dir):
    """SLIMElastic solves sklearn's per-column elastic-net problem with
    on-device proximal gradient instead of coordinate descent; the oracle
    check is the OBJECTIVE value (1/2n ||Xw-r||^2 + a*l1*|w|_1 +
    a(1-l1)/2 ||w||^2): ours must be at least as good as the reference's
    solution (both under the positive + hidden-item constraints)."""
    _, rds, rtrain, ref_m = _ref_pipeline("SLIMElastic", synth_dataset_dir)
    _, ods, our_m, params = _our_pipeline("SLIMElastic", synth_dataset_dir)
    params = _our_fit(our_m, "SLIMElastic", synth_dataset_dir)
    X = np.asarray(params["inter"], dtype=np.float64)
    n = X.shape[0]
    a, l1r = ref_m.alpha, ref_m.l1_ratio
    W_ref = np.asarray(ref_m.item_similarity.todense(), dtype=np.float64)
    W_our = np.asarray(params["weight"], dtype=np.float64)
    assert (W_our >= -1e-9).all(), "positive_only violated"
    assert np.abs(np.diag(W_our)).max() < 1e-9, "hide_item violated"

    def objective(W):
        resid = X @ W - X
        return (np.sum(resid ** 2, axis=0) / (2 * n)
                + a * l1r * np.sum(np.abs(W), axis=0)
                + 0.5 * a * (1 - l1r) * np.sum(W ** 2, axis=0))

    obj_ref = objective(W_ref).mean()
    obj_our = objective(W_our).mean()
    assert obj_our <= obj_ref * 1.001 + 1e-9, \
        f"our elastic-net objective {obj_our} worse than sklearn {obj_ref}"


@pytest.fixture(scope="module")
def jointsr_dataset_dir(tmp_path_factory):
    """Synth dataset whose .item carries text columns at positions 3/4
    (the reference JointSR loaders index raw file columns, jointsrmf.py:
    60-66) plus a 16-dim word2vec-format vectors file."""
    from tests.synth_data import make_synthetic_dataset
    root = str(tmp_path_factory.mktemp("jsrdata"))
    ds_dir = make_synthetic_dataset(root, name="synth")
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta"]
    rng = np.random.RandomState(3)
    with open(f"{ds_dir}/synth.item", "w") as fh:
        fh.write("item_id:token\tgenre:token_seq\tprice:float\t"
                 "description:token_seq\ttags:token_seq\n")
        genres = ["action", "comedy", "drama", "scifi", "doc"]
        for i in range(1, 81):
            gs = " ".join(genres[(i + j) % 5] for j in range(1 + i % 3))
            desc = " ".join(words[(i * 3 + j) % 8] for j in range(2 + i % 4))
            tags = " ".join(words[(i * 5 + j) % 8] for j in range(1 + i % 2))
            fh.write(f"i{i}\t{gs}\t{round(1.0 + (i % 10) * 0.5, 2)}\t"
                     f"{desc}\t{tags}\n")
    w2v = f"{root}/vectors.txt"
    with open(w2v, "w") as fh:
        fh.write(f"{len(words)} 16\n")
        for w in words:
            vec = " ".join(f"{v:.5f}" for v in rng.randn(16))
            fh.write(f"{w} {vec}\n")
    return root, w2v


def test_jointsrmf_loss_parity(jointsr_dataset_dir, monkeypatch, tmp_path):
    """JOINTSRMF (loss_rec BCE, alpha * soft-CE LM over frozen word
    vectors): the reference loads its vectors through the gensim-stub
    downloader pointed at our synthetic word2vec file and reads raw .item
    columns 3/4; ours reads the same fields by name."""
    import os
    root, w2v = jointsr_dataset_dir
    monkeypatch.chdir(tmp_path)
    (tmp_path / "gensim_cache_path").write_text(str(tmp_path))
    monkeypatch.setenv("GENSIM_TEST_VECTORS", w2v)
    common = {"embedding_dimension": 16, "alpha": 0.7,
              "load_col": {"inter": ["user_id", "item_id", "rating",
                                     "timestamp"],
                           "item": ["item_id", "genre", "price",
                                    "description", "tags"]}}
    ref_extra = {**common, "debug_variant": 1,
                 "item_description_fields": ["item_description",
                                             "item_genres"]}
    our_extra = {**common, "item_text_fields": ["description", "tags"],
                 "word_embedding_path": w2v}
    _, rds, rtrain, ref_m = _ref_pipeline("JOINTSRMF", root, ref_extra)
    _, ods, our_m, params = _our_pipeline("JOINTSRMF", root, our_extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    _load(ref_m, {
        "user_embedding.weight": params["user_embedding"],
        "item_embedding.weight": params["item_embedding"],
        "user_bias": params["user_bias"],
        "item_bias": params["item_bias"],
        "bias": params["bias"],
        "word_embedding.weight": np.asarray(our_m.word_embedding.value),
    })
    with torch.no_grad():
        ref_loss = _scalar(ref_m.calculate_loss(inter))
    our_loss = _scalar(our_m.calculate_loss(params, _to_jnp(batch_np),
                                            rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg="JOINTSRMF loss mismatch")


def _jointsr_pair(model, jointsr_dataset_dir, monkeypatch, tmp_path,
                  ref_only=None, our_only=None, mapper_extra=None):
    import os
    root, w2v = jointsr_dataset_dir
    monkeypatch.chdir(tmp_path)
    (tmp_path / "gensim_cache_path").write_text(str(tmp_path))
    monkeypatch.setenv("GENSIM_TEST_VECTORS", w2v)
    common = {"embedding_dimension": 16, "alpha": 0.7,
              "load_col": {"inter": ["user_id", "item_id", "rating",
                                     "timestamp"],
                           "item": ["item_id", "genre", "price",
                                    "description", "tags"]}}
    ref_extra = {**common, "debug_variant": 1,
                 "item_description_fields": ["item_description",
                                             "item_genres"],
                 **(ref_only or {})}
    our_extra = {**common, "item_text_fields": ["description", "tags"],
                 "word_embedding_path": w2v, **(our_only or {})}
    _, rds, rtrain, ref_m = _ref_pipeline(model, root, ref_extra)
    _, ods, our_m, params = _our_pipeline(model, root, our_extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    upd = {
        "user_embedding.weight": params["user_embedding"],
        "item_embedding.weight": params["item_embedding"],
        "word_embedding.weight": np.asarray(our_m.word_embedding.value),
    }
    if "user_bias" in params:
        upd.update({"user_bias": params["user_bias"],
                    "item_bias": params["item_bias"],
                    "bias": params["bias"]})
    if mapper_extra:
        upd.update(mapper_extra(params))
    # drop keys the reference model doesn't carry (e.g. JOINTSR has no biases)
    sd = ref_m.state_dict()
    upd = {k: v for k, v in upd.items() if k in sd}
    _load(ref_m, upd)
    with torch.no_grad():
        ref_loss = _scalar(ref_m.calculate_loss(inter))
    our_loss = _scalar(our_m.calculate_loss(params, _to_jnp(batch_np),
                                            rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4,
                               err_msg=f"{model} loss mismatch")


def test_jointsrmffull_loss_parity(jointsr_dataset_dir, monkeypatch,
                                   tmp_path):
    """FULL variant: count+1 target normalization (lm_gt_len starts at
    torch.ones, jointsrmffull.py:56-57)."""
    _jointsr_pair("JOINTSRMFFULL", jointsr_dataset_dir, monkeypatch,
                  tmp_path)


def test_jointsrmfsparse_loss_parity(jointsr_dataset_dir, monkeypatch,
                                     tmp_path):
    """SPARSE variant: sparse label storage, full-vocab soft-CE."""
    _jointsr_pair("JOINTSRMFSPARSE", jointsr_dataset_dir, monkeypatch,
                  tmp_path)


def test_jointsr_loss_parity(jointsr_dataset_dir, monkeypatch, tmp_path):
    """JOINTSR: fc_layers(mul(u, i)) rec tower + LM loss. Its lm_gt comes
    from remapped token_seq FIELDS (get_item_feature), so
    item_description_fields carries real field names here."""
    def mapper_extra(params):
        upd = {}
        n = len(params["mlp"])
        for i, lyr in enumerate(params["mlp"]):
            upd[f"fc_layers.{1 + 3 * i}.weight"] = np.asarray(lyr["w"]).T
            upd[f"fc_layers.{1 + 3 * i}.bias"] = lyr["b"]
        upd[f"fc_layers.{3 * n}.weight"] = np.asarray(params["out_w"]).T
        upd[f"fc_layers.{3 * n}.bias"] = params["out_b"]
        return upd
    _jointsr_pair("JOINTSR", jointsr_dataset_dir, monkeypatch, tmp_path,
                  ref_only={"item_description_fields": ["description",
                                                        "tags"],
                            "dropout": 0.0, "ff_layers": [32, 16]},
                  our_only={"dropout": 0.0, "ff_layers": [32, 16],
                            "mlp_variant": "mul"},
                  mapper_extra=mapper_extra)


def test_jointsrusermf_loss_parity(jointsr_dataset_dir, monkeypatch,
                                   tmp_path):
    """USERMF 3-tuple (rec, alpha_item*item LM, alpha_user*user LM). The
    reference builds user LMs from raw .inter column 3 (reviews on its
    datasets; timestamps here -> no in-vocab terms -> empty), and ours from
    .user token_seq fields whose words are also out-of-vocab -> the user
    part is zero on both sides while the item part is fully exercised."""
    def mapper_extra(params):
        return {}
    _jointsr_pair(
        "JOINTSRUSERMF", jointsr_dataset_dir, monkeypatch, tmp_path,
        ref_only={"alpha_item": 0.9, "alpha_user": 0.4,
                  "load_col": {"inter": ["user_id", "item_id", "rating",
                                         "timestamp"],
                               "item": ["item_id", "genre", "price",
                                        "description", "tags"],
                               "user": ["user_id", "age", "gender",
                                        "interests"]}},
        our_only={"alpha_item": 0.9, "alpha_user": 0.4,
                  "user_description_fields": ["interests"],
                  "load_col": {"inter": ["user_id", "item_id", "rating",
                                         "timestamp"],
                               "item": ["item_id", "genre", "price",
                                        "description", "tags"],
                               "user": ["user_id", "age", "gender",
                                        "interests"]}},
        mapper_extra=mapper_extra)
