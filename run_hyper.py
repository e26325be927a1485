"""Hyperparameter-search CLI (parity: reference run_hyper.py).

Usage:
    python run_hyper.py --model=BPR --dataset=ml-100k \
        --params_file=hyper.test --output_file=hyper_result.txt
"""

import argparse

from recbole_tpu import objective_function
from recbole_tpu.utils.hyper_tuning import HyperTuning


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_files", type=str, default=None)
    parser.add_argument("--params_file", type=str, required=True)
    parser.add_argument("--output_file", type=str, default="hyper_example.result")
    parser.add_argument("--algo", type=str, default="exhaustive")
    parser.add_argument("--max_evals", type=int, default=100)
    args, unknown = parser.parse_known_args()

    config_file_list = (args.config_files.strip().split(" ")
                        if args.config_files else None)

    def objective(config_dict, config_file_list):
        # fold through --model/--dataset style extras
        for tok in unknown:
            if tok.startswith("--") and "=" in tok:
                k, v = tok[2:].split("=", 1)
                config_dict.setdefault(k, v)
        return objective_function(config_dict=config_dict,
                                  config_file_list=config_file_list,
                                  saved=False)

    hp = HyperTuning(objective, params_file=args.params_file,
                     fixed_config_file_list=config_file_list,
                     algo=args.algo, max_evals=args.max_evals)
    hp.run()
    hp.export_result(output_file=args.output_file)
    print("best params: ", hp.best_params)
    print("best result: ")
    print(hp.params2result[hp.params2str(hp.best_params)])


if __name__ == "__main__":
    main()
