"""Atomic file reader.

The framework's data contract (parity: reference dataset.py:369-408 and
enum_type.py:81-114): tab-separated text files with typed headers
``field:type`` where type in {token, float, token_seq, float_seq}; one file per
feature source: <ds>.inter (required), .user, .item, .kg, .link, .net, plus
arbitrary additional suffixes.

We read into a columnar dict of numpy arrays (object arrays for seq fields),
not pandas-resident frames — downstream everything is numpy until device put.
"""

import os

import numpy as np
import pandas as pd

from ..utils.enums import FeatureType

_TYPE_MAP = {t.value: t for t in FeatureType}


def read_atomic_file(path, field_separator="\t", seq_separator=" ",
                     usecols=None, unload=None, native=True):
    """Read one atomic file.

    Returns (columns, field2type) where columns maps field name -> np.ndarray
    (str dtype for token, float32 for float, object-of-ndarray for *_seq).
    ``usecols``/``unload`` filter by field name (load_col / unload_col semantics).

    Scalar-only files (all kept columns token/float — the multi-million-row
    .inter/.kg files) go through the native C++ reader
    (recbole_tpu/native/atomic_fast.cpp, ~10x pandas); anything it cannot
    handle falls back to the pandas path transparently.
    """
    with open(path, "r", encoding="utf-8") as fh:
        header = fh.readline().rstrip("\n")
    field2type = {}
    fields = []
    for col in header.split(field_separator):
        if ":" not in col:
            raise ValueError(f"{path}: malformed header column {col!r} "
                             "(expected field:type)")
        name, ftype = col.rsplit(":", 1)
        if ftype not in _TYPE_MAP:
            raise ValueError(f"{path}: unknown field type {ftype!r} in {col!r}")
        fields.append(name)
        field2type[name] = _TYPE_MAP[ftype]

    keep = list(fields)
    # '*' wildcard = all columns of this file (extension over the reference's
    # load_col, which requires explicit column lists, data/utils.py:97-98)
    if usecols is not None and usecols != "*" and "*" not in usecols:
        keep = [f for f in keep if f in set(usecols)]
    if unload:
        keep = [f for f in keep if f not in set(unload)]
    if not keep:
        return {}, {}

    scalar = {FeatureType.TOKEN, FeatureType.FLOAT}
    if native and all(field2type[f] in scalar for f in keep):
        try:
            from ..native import read_scalar_tsv
            kinds = ["f" if field2type[f] is FeatureType.FLOAT else "t"
                     for f in keep]
            cols = read_scalar_tsv(path, field_separator, keep, kinds,
                                   [fields.index(f) for f in keep])
        except Exception:
            cols = None
        if cols is not None:
            return cols, {f: field2type[f] for f in keep}

    df = pd.read_csv(path, sep=field_separator, skiprows=1, header=None,
                     names=fields, usecols=keep, dtype=object,
                     keep_default_na=True, na_values=[""])
    columns = {}
    out_types = {}
    for f in keep:
        ftype = field2type[f]
        col = df[f]
        if ftype is FeatureType.TOKEN:
            columns[f] = col.to_numpy(dtype=object)
        elif ftype is FeatureType.FLOAT:
            columns[f] = pd.to_numeric(col, errors="coerce").to_numpy(dtype=np.float32)
        elif ftype is FeatureType.TOKEN_SEQ:
            columns[f] = np.array(
                [s.split(seq_separator) if isinstance(s, str) else []
                 for s in col], dtype=object)
        else:  # FLOAT_SEQ
            columns[f] = np.array(
                [np.fromstring(s, dtype=np.float32, sep=seq_separator)
                 if isinstance(s, str) else np.zeros(0, np.float32)
                 for s in col], dtype=object)
        out_types[f] = ftype
    return columns, out_types


def atomic_path(data_path, dataset_name, suffix):
    return os.path.join(data_path, dataset_name, f"{dataset_name}.{suffix}")
