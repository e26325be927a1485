"""Config: 4-source cascade with derived fields.

Parity target: reference Config (recbole/config/configurator.py:28-363).
Priority (highest wins): command line > config_dict > config files > internal
defaults, where internal defaults cascade
built-in DEFAULTS -> model defaults -> model-type overrides -> dataset yaml.
String values are coerced to python literals where possible (the reference uses
eval(); we use ast.literal_eval for safety — same observable behavior for
numbers/lists/bools/None).
"""

import ast
import os
import sys

import yaml

from .defaults import DEFAULTS, ARGUMENT_CATEGORIES
from ..utils.enums import ModelType, InputType, EvaluatorType

# metric families (parity: recbole/evaluator/evaluators.py:25-34)
TOPK_METRICS = {"hit", "recall", "mrr", "precision", "ndcg", "map"}
LOSS_METRICS = {"auc", "rmse", "mae", "logloss"}
RANK_METRICS = {"gauc"}
GROUP_METRICS = TOPK_METRICS | RANK_METRICS
INDIVIDUAL_METRICS = LOSS_METRICS
SMALLER_IS_BETTER = {"rmse", "mae", "logloss"}

# model-type quick-start overrides
# (parity: recbole/properties/quick_start_config/*.yaml)
MODEL_TYPE_OVERRIDES = {
    ModelType.SEQUENTIAL: {"eval_setting": "TO_LS,full"},
    ModelType.CONTEXT: {
        "eval_setting": "RO_RS",
        "group_by_user": False,
        "training_neg_sample_num": 0,
        "metrics": ["AUC", "LogLoss"],
        "valid_metric": "AUC",
    },
    ModelType.KNOWLEDGE: {},
    ModelType.GENERAL: {},
    ModelType.TRADITIONAL: {"epochs": 1},
    ModelType.DECISIONTREE: {"eval_setting": "RO_RS", "group_by_user": False,
                             "training_neg_sample_num": 0,
                             "metrics": ["AUC", "LogLoss"], "valid_metric": "AUC"},
    ModelType.SOCIAL: {},
}

_BUILTIN_DATASET_DIR = os.path.join(os.path.dirname(__file__), "properties", "dataset")


def _coerce(value):
    """Coerce a string to a python literal when unambiguous ('1e-3'->float,
    'True'->bool, '[1,2]'->list); otherwise keep the string."""
    if not isinstance(value, str):
        return value
    s = value.strip()
    if s.lower() in ("none", "null", "~", ""):
        return None
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        pass
    try:
        return float(s) if any(c in s for c in ".eE") else int(s)
    except ValueError:
        return value


def _yaml_load(fh):
    """yaml.safe_load with a float resolver accepting '1e-3'-style
    scientific notation (parity: the reference's custom FullLoader resolver,
    configurator.py:90-104 — PyYAML 1.1 otherwise parses those as strings)."""
    return yaml.load(fh, Loader=_yaml_loader_cls())


_YAML_LOADER = None


def _yaml_loader_cls():
    """A SafeLoader SUBCLASS carrying the resolver — mutating
    yaml.SafeLoader itself would change yaml.safe_load behavior for every
    other library in the process."""
    global _YAML_LOADER
    if _YAML_LOADER is None:
        import re

        class _RecboleYamlLoader(yaml.SafeLoader):
            pass

        loader = _RecboleYamlLoader
        loader.add_implicit_resolver(
            "tag:yaml.org,2002:float",
            re.compile(
                r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
                |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
                |\.[0-9_]+(?:[eE][-+][0-9]+)?
                |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
                |[-+]?\.(?:inf|Inf|INF)
                |\.(?:nan|NaN|NAN))$""", re.X),
            list("-+0123456789."))
        _YAML_LOADER = loader
    return _YAML_LOADER


class Config:
    """Dict-like merged configuration.

    Args:
        model: model name (str) or model class with ``type``/``input_type`` attrs.
        dataset: dataset name.
        config_file_list: yaml files, later files override earlier ones.
        config_dict: programmatic overrides.
    """

    def __init__(self, model=None, dataset=None, config_file_list=None,
                 config_dict=None, _parse_cmd_line=True):
        self._cmd_args = self._load_cmd_line() if _parse_cmd_line else {}
        self._dict_args = {k: _coerce(v) if isinstance(v, str) else v
                           for k, v in (config_dict or {}).items()}
        self._file_args = {}
        for f in config_file_list or []:
            with open(f, "r", encoding="utf-8") as fh:
                loaded = _yaml_load(fh) or {}
            self._file_args.update(loaded)

        model_name, model_class = self._resolve_model(model)
        dataset_name = (dataset or self._external("dataset")
                        or self._die("dataset name must be given"))
        if model_name is None:
            self._die("model name must be given")

        self.final = dict(DEFAULTS)
        # model-declared defaults
        self.final.update(getattr(model_class, "default_config", None) or {})
        # model-type quick-start overrides
        self.model_type = getattr(model_class, "type", ModelType.GENERAL)
        self.final.update(MODEL_TYPE_OVERRIDES.get(self.model_type, {}))
        # built-in dataset yaml (e.g. ml-100k)
        ds_yaml = os.path.join(_BUILTIN_DATASET_DIR, f"{dataset_name}.yaml")
        if os.path.isfile(ds_yaml):
            with open(ds_yaml, "r", encoding="utf-8") as fh:
                self.final.update(_yaml_load(fh) or {})
        # external sources, ascending priority
        self.final.update(self._file_args)
        self.final.update(self._dict_args)
        self.final.update(self._cmd_args)

        self.final["model"] = model_name
        self.final["dataset"] = dataset_name
        self.model_class = model_class
        self._derive(model_class)

    # -- source loading ------------------------------------------------------

    @staticmethod
    def _load_cmd_line():
        args = {}
        unrecognized = []
        for arg in sys.argv[1:]:
            if not arg.startswith("--") or "=" not in arg:
                if arg != sys.argv[0]:
                    unrecognized.append(arg)
                continue
            key, val = arg[2:].split("=", 1)
            args[key] = _coerce(val)
        if unrecognized:
            # parity: reference warns on non --k=v args (configurator.py:145-163)
            import warnings
            warnings.warn("command line args [%s] will not be used"
                          % " ".join(unrecognized))
        return args

    def _external(self, key):
        for src in (self._cmd_args, self._dict_args, self._file_args):
            if key in src:
                return src[key]
        return None

    @staticmethod
    def _die(msg):
        raise ValueError(msg)

    def _resolve_model(self, model):
        if model is None:
            model = self._external("model")
        if isinstance(model, str):
            from ..models import get_model  # late import: models import Config types
            return model, get_model(model)
        if model is None:
            self._die("model name must be given")
        return model.__name__, model

    # -- derived fields ------------------------------------------------------

    def _derive(self, model_class):
        f = self.final
        f["MODEL_TYPE"] = self.model_type

        # input type: model attr, else from loss_type (parity: configurator.py:275-285)
        input_type = getattr(model_class, "input_type", None)
        if input_type is None:
            loss_type = f.get("loss_type", "CE")
            input_type = InputType.POINTWISE if loss_type == "CE" else InputType.PAIRWISE
        f["MODEL_INPUT_TYPE"] = input_type

        # scalar topk accepted like the reference (evaluators wrap to list)
        if isinstance(f.get("topk"), int):
            f["topk"] = [f["topk"]]
        if isinstance(f.get("metrics"), str):
            f["metrics"] = [f["metrics"]]

        # eval type from metrics, mixing forbidden (parity: configurator.py:287-299)
        eval_type = None
        for metric in f["metrics"]:
            m = metric.lower()
            if m in GROUP_METRICS:
                this = EvaluatorType.RANKING
            elif m in INDIVIDUAL_METRICS:
                this = EvaluatorType.INDIVIDUAL
            else:
                raise NotImplementedError(f"metric {metric!r} not implemented")
            if eval_type is not None and this is not eval_type:
                raise RuntimeError("ranking and individual metrics can not be mixed")
            eval_type = this
        f["eval_type"] = eval_type

        vm = str(f.get("valid_metric", "MRR@10")).split("@")[0].lower()
        f["valid_metric_bigger"] = vm not in SMALLER_IS_BETTER
        # fail at config time, not after the first training epoch
        metric_names = {m.lower().split("@")[0] for m in f["metrics"]}
        if vm not in metric_names:
            raise ValueError(
                f"valid_metric {f.get('valid_metric')!r} is not among "
                f"metrics {f['metrics']} — add it to `metrics` or change "
                "`valid_metric`")

        f["device"] = "tpu"  # jax picks the platform; key kept for compat

        # train_neg_sample_args (parity: configurator.py:316-324)
        f["train_neg_sample_args"] = {
            "strategy": "by" if f.get("training_neg_sample_num") else "none",
            "by": f.get("training_neg_sample_num"),
            "distribution": f.get("training_neg_sample_distribution", "uniform"),
        }

        # ml-100k ships with the reference checkout; reuse it read-only when the
        # user hasn't pointed data_path anywhere real (parity: configurator.py:269-271)
        ds_dir = os.path.join(f["data_path"], f["dataset"])
        if not os.path.isdir(ds_dir):
            bundled = os.path.join(os.path.dirname(__file__), "..", "dataset_example",
                                   f["dataset"])
            if os.path.isdir(bundled):
                f["data_path"] = os.path.abspath(os.path.join(bundled, os.pardir))

    # -- mapping protocol ----------------------------------------------------

    def __getitem__(self, key):
        return self.final.get(key)

    def __setitem__(self, key, value):
        if not isinstance(key, str):
            raise TypeError("config key must be a string")
        self.final[key] = value

    def __contains__(self, key):
        return key in self.final

    def get(self, key, default=None):
        return self.final.get(key, default)

    def __str__(self):
        lines = []
        shown = set()
        for cat, keys in ARGUMENT_CATEGORIES.items():
            lines.append(f"\n{cat}:")
            for k in keys:
                if k in self.final:
                    lines.append(f"    {k} = {self.final[k]}")
                    shown.add(k)
        other = [k for k in self.final if k not in shown]
        if other:
            lines.append("\nOther Hyper Parameters:")
            lines.extend(f"    {k} = {self.final[k]}" for k in sorted(other))
        return "\n".join(lines)

    __repr__ = __str__
