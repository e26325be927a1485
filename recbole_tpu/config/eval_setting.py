"""EvalSetting: evaluation protocol descriptor.

Parity target: reference EvalSetting (recbole/config/eval_setting.py:18-391).
Parses ``eval_setting`` strings like ``"RO_RS,full"`` into grouping / ordering /
splitting / negative-sampling pieces, with config-key overrides.

Presets:
  ordering+split: RO_RS, TO_RS, RO_LS, TO_LS  (Random/Temporal Ordering x
                  Ratio Split / Leave-one-out Split)
  neg-sampling:   full, uni<k>, pop<k>   (e.g. uni100, pop1000)
"""

import re


class EvalSetting:
    def __init__(self, config):
        self.config = config
        self.group_field = None
        self.ordering_args = {"strategy": "none"}
        self.split_args = {"strategy": "none"}
        self.neg_sample_args = {"strategy": "none"}

        parts = [p.strip() for p in str(config["eval_setting"]).split(",")]
        preset = parts[0]
        if not re.fullmatch(r"[RT]O_[RL]S", preset):
            raise ValueError(f"unknown eval_setting preset {preset!r}")
        ordering, split = preset.split("_")
        self.set_ordering("shuffle" if ordering == "RO" else "by",
                          field=config["TIME_FIELD"] if ordering == "TO" else None)
        if split == "RS":
            self.set_splitting("by_ratio", ratios=config["split_ratio"])
        else:
            self.set_splitting("loo", leave_one_num=config["leave_one_num"])

        if config["group_by_user"]:
            self.group_field = config["USER_ID_FIELD"]

        if len(parts) > 1:
            self.set_neg_sampling_preset(parts[1])

        # config-key post-hoc overrides (parity: eval_setting.py:89-92)
        for key, attr in (("group_field", "group_field"),
                          ("ordering_args", "ordering_args"),
                          ("split_args", "split_args"),
                          ("neg_sample_args", "neg_sample_args")):
            if config[key] is not None:
                setattr(self, attr, config[key])

    def set_ordering(self, strategy, field=None):
        if strategy not in ("none", "shuffle", "by"):
            raise ValueError(f"ordering strategy {strategy!r}")
        self.ordering_args = {"strategy": strategy}
        if strategy == "by":
            self.ordering_args.update(field=field, ascending=True)

    def set_splitting(self, strategy, **kwargs):
        if strategy not in ("none", "by_ratio", "by_value", "loo"):
            raise ValueError(f"split strategy {strategy!r}")
        if strategy == "by_value":
            raise NotImplementedError("split-by-value is declared but not "
                                      "implemented (parity with reference)")
        self.split_args = {"strategy": strategy, **kwargs}

    def set_neg_sampling_preset(self, token):
        token = token.strip()
        if token == "full":
            self.neg_sample_args = {"strategy": "full", "distribution": "uniform"}
            return
        m = re.fullmatch(r"(uni|pop)(\d+)", token)
        if not m:
            raise ValueError(f"unknown neg-sampling preset {token!r}")
        dist = "uniform" if m.group(1) == "uni" else "popularity"
        self.neg_sample_args = {"strategy": "by", "by": int(m.group(2)),
                                "distribution": dist}

    def __str__(self):
        return (f"EvalSetting(group={self.group_field}, order={self.ordering_args}, "
                f"split={self.split_args}, neg={self.neg_sample_args})")

    __repr__ = __str__
