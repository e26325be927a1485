"""Quick-start API.

Parity target: recbole/quick_start/quick_start.py — ``run_recbole`` (the
canonical config -> data -> train -> test pipeline, :21-76) and
``objective_function`` (quiet variant for hyperparameter search, :79-101).
The fork's profiler wrap (:57-61) maps to an optional jax.profiler trace.
"""

from .config.configurator import Config
from .data.utils import create_dataset, data_preparation
from .models import get_model
from .trainer.trainer import get_trainer
from .utils.logger import init_logger, get_logger
from .utils.utils import init_seed, init_jax


def run_recbole(model=None, dataset=None, config_file_list=None, config_dict=None,
                saved=True, _parse_cmd_line=False):
    config = Config(model=model, dataset=dataset, config_file_list=config_file_list,
                    config_dict=config_dict, _parse_cmd_line=_parse_cmd_line)
    init_jax(config)
    init_seed(config["seed"], config["reproducibility"])
    logger = init_logger(config)
    logger.info(config)

    ds = create_dataset(config)
    logger.info(ds)
    train_data, valid_data, test_data = data_preparation(config, ds)

    model_obj = get_model(config["model"])(config, train_data.dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)

    profile_dir = config["profile_trace_dir"]
    if profile_dir:
        import jax
        with jax.profiler.trace(profile_dir):
            best_valid_score, best_valid_result = trainer.fit(
                train_data, valid_data, saved=saved,
                show_progress=config["show_progress"])
        # parity with the fork's printed key-averages table
        # (reference quick_start.py:57-61)
        logger.info("profiled run summary (trace: %s):\n%s",
                    profile_dir, trainer.timing_summary())
    else:
        best_valid_score, best_valid_result = trainer.fit(
            train_data, valid_data, saved=saved,
            show_progress=config["show_progress"])

    test_result = trainer.evaluate(test_data, load_best_model=saved,
                                   show_progress=config["show_progress"])
    logger.info("best valid : %s", best_valid_result)
    logger.info("test result: %s", test_result)
    return {
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"],
        "best_valid_result": best_valid_result,
        "test_result": test_result,
    }


def cli_main():
    """Console-script entry point (``recbole-tpu``) — same surface as run.py,
    including the fork's ``--alpha`` passthrough (reference run_recbole.py:21-29)."""
    import argparse

    parser = argparse.ArgumentParser(prog="recbole-tpu")
    parser.add_argument("--model", "-m", type=str, default="BPR")
    parser.add_argument("--dataset", "-d", type=str, default="ml-100k")
    parser.add_argument("--config_files", type=str, default=None)
    parser.add_argument("--alpha", type=str, default=None)
    args, _ = parser.parse_known_args()

    config_file_list = args.config_files.strip().split(" ") if args.config_files else None
    config_dict = {"alpha": float(args.alpha)} if args.alpha else None
    run_recbole(model=args.model, dataset=args.dataset,
                config_file_list=config_file_list, config_dict=config_dict,
                _parse_cmd_line=True)


def objective_function(config_dict=None, config_file_list=None, saved=True):
    config = Config(config_file_list=config_file_list, config_dict=config_dict,
                    _parse_cmd_line=False)
    init_jax(config)
    init_seed(config["seed"], config["reproducibility"])
    init_logger(config)

    ds = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, ds)
    model_obj = get_model(config["model"])(config, train_data.dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)
    best_valid_score, best_valid_result = trainer.fit(
        train_data, valid_data, verbose=False, saved=saved)
    test_result = trainer.evaluate(test_data, load_best_model=saved)
    return {
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"],
        "best_valid_result": best_valid_result,
        "test_result": test_result,
    }
