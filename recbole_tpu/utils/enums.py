"""Core enumerations.

Capability parity with the reference's enum set (recbole/utils/enum_type.py:14-114),
re-expressed for a JAX/TPU framework: model types, input types, feature
types/sources, evaluation protocol pieces.
"""

from enum import Enum


class ModelType(Enum):
    """Category of recommendation model (drives trainer/dataloader selection)."""

    GENERAL = 1
    SEQUENTIAL = 2
    CONTEXT = 3
    KNOWLEDGE = 4
    TRADITIONAL = 5
    DECISIONTREE = 6
    SOCIAL = 7


class InputType(Enum):
    """How training examples are shaped for the model's loss."""

    POINTWISE = 1  # (user, item, label)
    PAIRWISE = 2   # (user, pos_item, neg_item)
    LISTWISE = 3   # whole candidate lists


class FeatureType(Enum):
    """Column types of the atomic file format (``field:type`` headers)."""

    TOKEN = "token"
    FLOAT = "float"
    TOKEN_SEQ = "token_seq"
    FLOAT_SEQ = "float_seq"


class FeatureSource(Enum):
    """Which atomic file a field came from."""

    INTERACTION = "inter"
    USER = "user"
    ITEM = "item"
    USER_ID = "user_id"
    ITEM_ID = "item_id"
    KG = "kg"
    NET = "net"


class EvaluatorType(Enum):
    """Ranking metrics (grouped by user) vs. value metrics (per example)."""

    RANKING = 1
    INDIVIDUAL = 2


class KGDataLoaderState(Enum):
    """Mode of the composite knowledge-graph training stream."""

    RSKG = 1
    RS = 2
    KG = 3
