"""lightgbm CTR model shell.

Parity target: reference exlib lightgbm model
(recbole/model/exlib_recommender/lightgbm.py) — registry handle only; logic
in the DecisionTreeTrainer (reference trainer.py:866-935). Requires the
external lightgbm package.
"""

from ..base import AbstractRecommender
from ...utils.enums import ModelType, InputType
from .. import register_model


@register_model("lightgbm")
class LightGBMModel(AbstractRecommender):
    type = ModelType.DECISIONTREE
    input_type = InputType.POINTWISE
    default_config = {
        "convert_token_to_onehot": False,
        "token_num_threshold": 10000,
        "lgb_silent": None,
        "lgb_params": {"boosting": "gbdt", "objective": "binary",
                       "metric": ["auc", "binary_logloss"]},
        "lgb_num_boost_round": 500,
        "lgb_early_stopping_rounds": None,
        "lgb_verbose_eval": 100,
        "training_neg_sample_num": 0,
    }

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.USER_ID = config["USER_ID_FIELD"]
        self.ITEM_ID = config["ITEM_ID_FIELD"]
        self.LABEL = config["LABEL_FIELD"]
        try:
            import lightgbm  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "model 'lightgbm' needs the external lightgbm package "
                "(pip install lightgbm)") from e
