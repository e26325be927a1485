"""Case-study example (parity: reference run_example/case_study_example.py):
train BPR briefly, then inspect top-k recommendations for chosen users."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recbole_tpu.config.configurator import Config
from recbole_tpu.data.utils import create_dataset, data_preparation
from recbole_tpu.models import get_model
from recbole_tpu.trainer.trainer import get_trainer
from recbole_tpu.utils.case_study import full_sort_topk, full_sort_scores

if __name__ == "__main__":
    config = Config("BPR", "ml-100k", config_dict={"epochs": 10})
    ds = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, ds)
    model = get_model("BPR")(config, train_data.dataset)
    trainer = get_trainer(config["MODEL_TYPE"], "BPR")(config, model)
    trainer.fit(train_data, valid_data, saved=False, verbose=True)

    uid_series = ds.token2id(ds.uid_field, ["196", "186"])
    topk_score, topk_iid = full_sort_topk(uid_series, model, trainer.params,
                                          test_data, k=10)
    print("top-10 scores:", topk_score)
    print("top-10 items (external ids):",
          ds.id2token(ds.iid_field, topk_iid))
    scores = full_sort_scores(uid_series, model, trainer.params, test_data)
    print("score of item 8 for the two users:",
          scores[:, ds.token2id(ds.iid_field, ["8"])[0]])
