"""Import shims for running the READ-ONLY reference implementation
(/root/reference) on this image, for numeric parity tests only.

The reference needs colorlog/gensim (absent here) and older numpy/torch
aliases. Nothing is copied from the reference — it is imported as an
external oracle; tests skip when it isn't present.
"""

import logging
import sys
import types

REFERENCE_PATH = "/root/reference"


def load_reference():
    """Make `import recbole` resolve to the reference; return the path or
    None when the reference tree isn't available."""
    import os
    if not os.path.isdir(REFERENCE_PATH):
        return None
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    if "colorlog" not in sys.modules:
        colorlog = types.ModuleType("colorlog")

        class ColoredFormatter(logging.Formatter):
            def __init__(self, fmt=None, *a, **k):
                if fmt:
                    fmt = fmt.replace("%(log_color)s", "").replace(
                        "%(reset)s", "")
                super().__init__(fmt)

        colorlog.ColoredFormatter = ColoredFormatter
        sys.modules["colorlog"] = colorlog

    if "gensim" not in sys.modules:
        gensim = types.ModuleType("gensim")
        models = types.ModuleType("gensim.models")
        downloader = types.ModuleType("gensim.downloader")

        class _KeyedVectors:
            pass

        models.KeyedVectors = _KeyedVectors
        downloader.load = lambda *a, **k: None
        gensim.models = models
        gensim.downloader = downloader
        sys.modules["gensim"] = gensim
        sys.modules["gensim.models"] = models
        sys.modules["gensim.downloader"] = downloader

    if "torch_sparse" not in sys.modules:
        torch_sparse = types.ModuleType("torch_sparse")

        class _SparseTensor:
            pass

        torch_sparse.SparseTensor = _SparseTensor
        sys.modules["torch_sparse"] = torch_sparse

    try:
        from scipy.sparse import dok_matrix
        if not hasattr(dok_matrix, "_update"):
            # old scipy private the reference's LightGCN/NGCF adj builders
            # use; removed upstream
            def _update(self, data):
                for k, v in data.items():
                    self[k] = v
            dok_matrix._update = _update
    except ImportError:
        pass

    import numpy as np
    for name, val in (("float", float), ("int", int), ("bool", bool),
                      ("object", object), ("str", str), ("complex", complex)):
        if not hasattr(np, name):
            setattr(np, name, val)

    import torch
    if not getattr(torch.load, "_ref_compat", False):
        _orig_load = torch.load

        def _load(*a, **k):
            k.setdefault("weights_only", False)
            return _orig_load(*a, **k)

        _load._ref_compat = True
        torch.load = _load
    return REFERENCE_PATH
