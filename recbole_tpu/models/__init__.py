"""Model registry.

Parity target: reference get_model (recbole/utils/utils.py:50-75) which resolves
model names via importlib over category submodules. Here models self-register
with @register_model at import time; get_model imports the category packages
lazily on first lookup (case-insensitive, exact-case preferred).
"""

import importlib
import pkgutil

_REGISTRY = {}
_LOADED = False
_CATEGORIES = ("general", "sequential", "context", "knowledge", "exlib")


def register_model(name):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.model_name = name
        return cls
    return deco


def _load_all():
    global _LOADED
    if _LOADED:
        return
    for cat in _CATEGORIES:
        pkg = importlib.import_module(f"{__name__}.{cat}")
        for mod in pkgutil.iter_modules(pkg.__path__):
            importlib.import_module(f"{__name__}.{cat}.{mod.name}")
    _LOADED = True


def get_model(name):
    _load_all()
    if name in _REGISTRY:
        return _REGISTRY[name]
    lowered = {k.lower(): v for k, v in _REGISTRY.items()}
    if name.lower() in lowered:
        return lowered[name.lower()]
    raise ValueError(f"model {name!r} not found; known: {sorted(_REGISTRY)}")


def model_names():
    _load_all()
    return sorted(_REGISTRY)
