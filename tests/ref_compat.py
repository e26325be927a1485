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
            """Minimal word2vec-text-format reader: enough surface
            (.vectors, .key_to_index) for the fork's JointSR loaders."""

            def __init__(self, vocab, vectors):
                import numpy as _np
                self.vectors = _np.asarray(vectors, dtype=_np.float32)
                self.key_to_index = {w: i for i, w in enumerate(vocab)}
                # old-gensim surface (JOINTSR uses model.vocab[term].index)
                _V = types.SimpleNamespace
                self.vocab = {w: _V(index=i) for i, w in enumerate(vocab)}

            @classmethod
            def load_word2vec_format(cls, path):
                vocab, vecs = [], []
                with open(path, "r", encoding="utf-8") as fh:
                    first = fh.readline().split()
                    if len(first) != 2:  # headerless
                        vocab.append(first[0])
                        vecs.append([float(x) for x in first[1:]])
                    for line in fh:
                        parts = line.rstrip().split(" ")
                        vocab.append(parts[0])
                        vecs.append([float(x) for x in parts[1:]])
                return cls(vocab, vecs)

        models.KeyedVectors = _KeyedVectors
        # tests point this at a synthetic vectors file
        import os as _os
        downloader.load = (lambda *a, **k:
                           _os.environ.get("GENSIM_TEST_VECTORS"))
        gensim.models = models
        gensim.downloader = downloader
        sys.modules["gensim"] = gensim
        sys.modules["gensim.models"] = models
        sys.modules["gensim.downloader"] = downloader

    if "torch_sparse" not in sys.modules:
        torch_sparse = types.ModuleType("torch_sparse")

        class _SparseTensor:
            """Dense-backed stand-in implementing the slice/to_dense
            surface the fork's JointSR sparse variants use."""

            def __init__(self, row=None, col=None, value=None,
                         sparse_sizes=None, _dense=None):
                if _dense is not None:
                    self._dense = _dense
                    return
                import torch as _t
                dense = _t.zeros(sparse_sizes, dtype=_t.float32)
                dense[row.long(), col.long()] = value.float()
                self._dense = dense

            def __getitem__(self, idx):
                return _SparseTensor(_dense=self._dense[idx])

            def to(self, *a, **k):
                return self

            def to_dense(self):
                return self._dense

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

    # pandas 2 changed Series.agg(len) to aggregate the WHOLE series, which
    # breaks the reference's token_seq remap (dataset.py:908-928: the inner
    # np.split sees one chunk instead of per-row lengths). Re-express the
    # same mapping with an explicit per-row map.
    from recbole.data.dataset.dataset import Dataset as _RefDataset
    if not getattr(_RefDataset._remap, "_ref_compat", False):
        import pandas as pd
        from recbole.utils import FeatureType as _FT

        def _remap(self, remap_list):
            tokens, split_point = self._concat_remaped_tokens(remap_list)
            new_ids_list, mp = pd.factorize(tokens)
            new_ids_list = np.split(new_ids_list + 1, split_point)
            mp = np.array(["[PAD]"] + list(mp))
            token_id = {t: i for i, t in enumerate(mp)}
            for (feat, field, ftype), new_ids in zip(remap_list,
                                                     new_ids_list):
                if field not in self.field2id_token:
                    self.field2id_token[field] = mp
                    self.field2token_id[field] = token_id
                if ftype == _FT.TOKEN:
                    feat[field] = new_ids
                elif ftype == _FT.TOKEN_SEQ:
                    lens = [len(v) for v in feat[field]]
                    sp = np.cumsum(lens)[:-1]
                    feat[field] = pd.Series(np.split(new_ids, sp),
                                            index=feat.index)

        _remap._ref_compat = True
        _RefDataset._remap = _remap

    # pandas 2 CoW makes the reference's `feat[field].fillna(inplace=True)`
    # a silent no-op (dataset.py:490-503), leaving the PAD row's float
    # features NaN — which then NaN-poisons attention softmaxes in
    # SASRecF/FDSA/DIN. Re-express with assignment (same fill values).
    if not getattr(_RefDataset._fill_nan, "_ref_compat", False):
        from recbole.utils import FeatureType as _FT2

        def _fill_nan(self):
            for feat_name in self.feat_name_list:
                feat = getattr(self, feat_name)
                for field in feat:
                    ftype = self.field2type[field]
                    if ftype == _FT2.TOKEN:
                        feat[field] = feat[field].fillna(value=0)
                    elif ftype == _FT2.FLOAT:
                        feat[field] = feat[field].fillna(
                            value=feat[field].mean())
                    else:
                        dt = np.int64 if ftype == _FT2.TOKEN_SEQ else float
                        feat[field] = feat[field].apply(
                            lambda x, dt=dt: np.array([], dtype=dt)
                            if isinstance(x, float) else x)

        _fill_nan._ref_compat = True
        _RefDataset._fill_nan = _fill_nan
    return REFERENCE_PATH
