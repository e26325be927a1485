"""Misc utilities: seeding, early stopping, dict rendering.

Parity targets: reference init_seed (recbole/utils/utils.py:175-192),
early_stopping (:99-140), calculate_valid_score (:143), dict2str (:159).
"""

import os
import random

import numpy as np


def init_jax(config) -> None:
    """Process-level jax setup: platform override, multi-host bootstrap,
    persistent compilation cache. Must run before the first jax device use."""
    # env override first (some TPU plugins re-force JAX_PLATFORMS, so the
    # env var alone is unreliable; jax.config is the authoritative switch)
    platform = os.environ.get("RECBOLE_TPU_PLATFORM") or config["platform"]
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    if config["distributed_auto_init"] or config["distributed_coordinator"]:
        import jax
        kwargs = {}
        if config["distributed_coordinator"]:
            kwargs = {
                "coordinator_address": config["distributed_coordinator"],
                "num_processes": int(config["distributed_num_processes"]),
                "process_id": int(config["distributed_process_id"]),
            }
        # else: TPU-pod auto-detection (jax reads the topology from the
        # TPU runtime; no keys needed)
        already = False
        try:  # idempotence: repeat runs in one process (e.g. run_hyper)
            from jax._src.distributed import global_state
            already = global_state.client is not None
        except Exception:  # pragma: no cover — jax internals moved
            pass
        if not already:
            try:
                jax.distributed.initialize(**kwargs)
            except RuntimeError as e:
                if "called once" not in str(e) \
                        and "already initialized" not in str(e).lower():
                    raise
    cache_dir = config["compilation_cache_dir"]
    if cache_dir:
        import jax
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
        except Exception:  # pragma: no cover — older jax without the knobs
            pass


def init_seed(seed: int, reproducibility: bool = True) -> None:
    """Seed python + numpy. JAX randomness is explicit (keys), so the trainer
    derives its root jax.random.key(seed) itself; this handles host-side RNG
    used by shuffling and host samplers."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))


def early_stopping(value, best, cur_step, max_step, bigger=True):
    """One step of patience-based early stopping.

    Improvement is STRICT (parity: reference utils.py:123 uses ``value > best``)
    — a plateaued metric consumes patience instead of resetting it and does not
    trigger a re-checkpoint.

    Returns (best, cur_step, stop_flag, update_flag).
    """
    stop_flag = False
    update_flag = False
    if best is None:
        improved = True
    else:
        improved = (value > best) if bigger else (value < best)
    if improved:
        best = value
        cur_step = 0
        update_flag = True
    else:
        cur_step += 1
        if cur_step > max_step:
            stop_flag = True
    return best, cur_step, stop_flag, update_flag


def calculate_valid_score(valid_result: dict, valid_metric: str | None = None):
    """Pick the scalar used for early stopping from a metric dict."""
    if valid_metric:
        key = valid_metric.lower()
        for k, v in valid_result.items():
            if k.lower() == key:
                return v
        raise KeyError(f"valid_metric {valid_metric!r} not in results {list(valid_result)}")
    return valid_result.get("recall@10", next(iter(valid_result.values())))


def dict2str(result: dict) -> str:
    return "    ".join(f"{k} : {v:.4f}" if isinstance(v, float) else f"{k} : {v}"
                       for k, v in result.items())


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)
