"""Hyperparameter search.

Parity target: reference HyperTuning (recbole/trainer/hyper_tuning.py:129-309)
— a search space from a params file ("name type value" lines: choice /
uniform / quniform / loguniform) or a typed dict, driven by an algorithm
('exhaustive' grid enumeration or 'random'), calling objective_function per
trial, tracking the best by valid score, and exporting a result log.

The reference delegates to hyperopt; this implementation is dependency-free
(exhaustive = full cartesian grid over choice params with continuous params
sampled once per grid point; random = independent draws per trial). When
hyperopt IS importable, algo may also be any hyperopt algo object and the
search runs through hyperopt.fmin unchanged.
"""

import itertools

import numpy as np

from .logger import get_logger
from .utils import dict2str


class Parameter:
    def __init__(self, name, kind, args):
        self.name = name
        self.kind = kind
        self.args = args

    def sample(self, rng):
        if self.kind == "choice":
            return self.args[rng.randint(len(self.args))]
        lo, hi = float(self.args[0]), float(self.args[1])
        if self.kind == "uniform":
            return float(rng.uniform(lo, hi))
        if self.kind == "quniform":
            q = float(self.args[2])
            return float(np.round(rng.uniform(lo, hi) / q) * q)
        if self.kind == "loguniform":
            return float(np.exp(rng.uniform(lo, hi)))
        raise ValueError(f"Illegal param type [{self.kind}]")

    def grid(self, rng):
        """Values enumerated by exhaustive search; continuous kinds contribute
        a single sample (the reference's exhaustive_search rejects duplicate
        grid points the same way, hyper_tuning.py:84-126)."""
        if self.kind == "choice":
            return list(self.args)
        return [self.sample(rng)]


class HyperTuning:
    def __init__(self, objective_function, space=None, params_file=None,
                 params_dict=None, fixed_config_file_list=None,
                 algo="exhaustive", max_evals=100, seed=2020):
        self.objective_function = objective_function
        self.fixed_config_file_list = fixed_config_file_list
        self.algo = algo
        self.max_evals = max_evals
        self.rng = np.random.RandomState(seed)
        self.best_score = None
        self.best_params = None
        self.params2result = {}
        self.logger = get_logger()

        if space is not None:
            self.params = space
        elif params_file is not None:
            self.params = self._build_space_from_file(params_file)
        elif params_dict is not None:
            self.params = self._build_space_from_dict(params_dict)
        else:
            raise ValueError("at least one of space, params_file and "
                             "params_dict should be provided")

    # -------------------------------------------------------------- spaces

    @staticmethod
    def _coerce_value(text):
        try:
            return eval(text, {"__builtins__": {}})  # noqa: S307 — same
            # literal coercion the reference applies (hyper_tuning.py:187)
        except Exception:
            return text

    @classmethod
    def _build_space_from_file(cls, file):
        params = []
        with open(file, "r") as fp:
            for line in fp:
                parts = line.strip().split(" ")
                if len(parts) < 3:
                    continue
                name, kind, value = parts[0], parts[1], "".join(parts[2:])
                if kind == "choice":
                    params.append(Parameter(name, kind, cls._coerce_value(value)))
                elif kind in ("uniform", "loguniform", "quniform"):
                    params.append(Parameter(name, kind, value.split(",")))
                else:
                    raise ValueError(f"Illegal param type [{kind}]")
        return params

    @staticmethod
    def _build_space_from_dict(d):
        params = []
        for kind, entries in d.items():
            if kind not in ("choice", "uniform", "quniform", "loguniform"):
                raise ValueError(f"Illegal param type [{kind}]")
            for name, args in entries.items():
                params.append(Parameter(name, kind, args))
        return params

    # --------------------------------------------------------------- search

    @staticmethod
    def params2str(params):
        return ", ".join(f"{k}:{v}" for k, v in params.items())

    def _candidates(self):
        if self.algo == "exhaustive":
            grids = [p.grid(self.rng) for p in self.params]
            combos = itertools.product(*grids)
            return (dict(zip([p.name for p in self.params], c))
                    for c in itertools.islice(combos, self.max_evals))
        if self.algo == "random":
            return ({p.name: p.sample(self.rng) for p in self.params}
                    for _ in range(self.max_evals))
        return None  # hyperopt algo object

    def trial(self, params):
        config_dict = dict(params)
        params_str = self.params2str(params)
        self.logger.info("running parameters: %s", config_dict)
        result = self.objective_function(config_dict,
                                         self.fixed_config_file_list)
        self.params2result[params_str] = result
        score, bigger = result["best_valid_score"], result["valid_score_bigger"]
        better = (self.best_score is None
                  or (bigger and score > self.best_score)
                  or (not bigger and score < self.best_score))
        if better:
            self.best_score = score
            self.best_params = dict(params)
            self.logger.info("current best valid result: %s",
                             result["best_valid_result"])
        return result

    def run(self):
        candidates = self._candidates()
        if candidates is None:
            import hyperopt  # optional external algo passthrough
            space = {p.name: getattr(hyperopt.hp, p.kind)(
                p.name, *(p.args if p.kind != "choice" else (p.args,)))
                for p in self.params}

            def _obj(params):
                r = self.trial(params)
                s = r["best_valid_score"]
                return {"loss": -s if r["valid_score_bigger"] else s,
                        "status": hyperopt.STATUS_OK}

            hyperopt.fmin(_obj, space, algo=self.algo,
                          max_evals=self.max_evals)
            return
        for params in candidates:
            self.trial(params)

    def export_result(self, output_file=None):
        with open(output_file, "w") as fp:
            for params, result in self.params2result.items():
                fp.write(params + "\n")
                fp.write("Valid result:\n"
                         + dict2str(result["best_valid_result"]) + "\n")
                fp.write("Test result:\n"
                         + dict2str(result["test_result"]) + "\n\n")
