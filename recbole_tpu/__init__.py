"""recbole_tpu — a TPU-native recommendation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of RecBole
v0.2.1 + the ghazalehnt fork (see SURVEY.md): atomic-file datasets, 70+ models
across general/sequential/context/knowledge families, full-sort and sampled
ranking evaluation, the 4-source config cascade, and a trainer built around a
single jitted step with on-device negative sampling.
"""

__version__ = "0.1.0"

from .quick_start import run_recbole, objective_function  # noqa: F401
