"""SocialDataset: user-user network on top of the interaction dataset.

Parity target: reference SocialDataset
(recbole/data/dataset/social_dataset.py:23-110) — loads <ds>.net with
SOURCE_ID_FIELD / TARGET_ID_FIELD columns remapped into the user id space,
exposes net_matrix / net edge arrays. (ModelType.SOCIAL exists in the
reference but no social model ships; the dataset is the capability.)
"""

import os

import numpy as np
import scipy.sparse as sp

from .atomic import read_atomic_file, atomic_path
from .dataset import Dataset
from ..utils.enums import FeatureType, FeatureSource


class SocialDataset(Dataset):
    def __init__(self, config, _build=True):
        self.source_field = config["SOURCE_ID_FIELD"]
        self.target_field = config["TARGET_ID_FIELD"]
        self.net_feat = None
        super().__init__(config, _build)

    def _load_all(self):
        super()._load_all()
        self._load_net()

    def _load_net(self):
        path = atomic_path(self.config["data_path"], self.dataset_name, "net")
        if not os.path.isfile(path):
            raise ValueError(f"social datasets need {path}")
        cols, types = read_atomic_file(path, self.config["field_separator"],
                                       self.config["seq_separator"])
        for f in (self.source_field, self.target_field):
            if f not in cols:
                raise ValueError(f".net file must contain {f}")
        self.net_feat = cols
        self._merge_schema(types, FeatureSource.NET)

    def _remap_ids(self):
        super()._remap_ids()
        # source/target share the USER id space (parity: social_dataset.py
        # fields_in_same_space handling)
        user_map = self.field2token_id[self.uid_field]
        for f in (self.source_field, self.target_field):
            toks = self.net_feat[f]
            self.net_feat[f] = np.array(
                [user_map.get(str(t), 0) for t in toks], np.int32)
            self.field2id_token[f] = self.field2id_token[self.uid_field]
            self.field2token_id[f] = user_map
            self.field2type[f] = FeatureType.TOKEN

    @property
    def net_num(self):
        return len(self.net_feat[self.source_field])

    def net_matrix(self, form="coo", value_field=None):
        src = self.net_feat[self.source_field]
        dst = self.net_feat[self.target_field]
        data = (np.ones(len(src), np.float32) if value_field is None
                else self.net_feat[value_field].astype(np.float32))
        mat = sp.coo_matrix((data, (src, dst)),
                            shape=(self.user_num, self.user_num))
        return mat.tocsr() if form == "csr" else mat

    def __str__(self):
        return (f"{super().__str__()}"
                f"\nThe number of social connections: {self.net_num}")
