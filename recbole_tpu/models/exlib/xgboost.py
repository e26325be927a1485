"""xgboost CTR model shell.

Parity target: reference exlib xgboost model
(recbole/model/exlib_recommender/xgboost.py:15-26) — the class is just a
registry handle; all training logic lives in the DecisionTreeTrainer
(reference trainer.py:610-801). Requires the external xgboost package.
"""

from ..base import AbstractRecommender
from ...utils.enums import ModelType, InputType
from .. import register_model


@register_model("xgboost")
class XGBoostModel(AbstractRecommender):
    type = ModelType.DECISIONTREE
    input_type = InputType.POINTWISE
    default_config = {
        "convert_token_to_onehot": False,
        "token_num_threshold": 10000,
        "xgb_silent": None, "xgb_nthread": None,
        "xgb_model": None, "xgb_weight": None, "xgb_base_margin": None,
        "xgb_missing": None,
        "xgb_params": {"booster": "gbtree", "objective": "binary:logistic",
                       "eval_metric": ["auc", "logloss"]},
        "xgb_num_boost_round": 500,
        "xgb_early_stopping_rounds": None,
        "xgb_verbose_eval": 100,
        "training_neg_sample_num": 0,
    }

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.USER_ID = config["USER_ID_FIELD"]
        self.ITEM_ID = config["ITEM_ID_FIELD"]
        self.LABEL = config["LABEL_FIELD"]
        try:
            import xgboost  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "model 'xgboost' needs the external xgboost package "
                "(pip install xgboost)") from e
