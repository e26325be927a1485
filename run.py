"""CLI entry point (parity: reference run_recbole.py).

Usage:
    python run.py --model=BPR --dataset=ml-100k [--key=value ...]
"""

import argparse

from recbole_tpu import run_recbole

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="BPR")
    parser.add_argument("--dataset", "-d", type=str, default="ml-100k")
    parser.add_argument("--config_files", type=str, default=None)
    parser.add_argument("--alpha", type=str, default=None)  # fork passthrough
    args, _ = parser.parse_known_args()

    config_file_list = args.config_files.strip().split(" ") if args.config_files else None
    config_dict = {"alpha": float(args.alpha)} if args.alpha else None
    run_recbole(model=args.model, dataset=args.dataset,
                config_file_list=config_file_list, config_dict=config_dict,
                _parse_cmd_line=True)
