"""KGSeqDataset: sequential examples + knowledge graph.

Parity target: reference Kg_Seq_Dataset (recbole/data/dataset/
kg_seq_dataset.py:13-22), the diamond of SequentialDataset and
KnowledgeBasedDataset used by KG-enhanced sequential models (GRU4RecKG, KSR).

MRO puts KnowledgeBasedDataset first so kg/link loading and the 3-section
entity remap run, while build() comes from SequentialDataset.
"""

from .kg_dataset import KnowledgeBasedDataset
from .seq_dataset import SequentialDataset


class KGSeqDataset(KnowledgeBasedDataset, SequentialDataset):
    def __init__(self, config, _build=True):
        super().__init__(config, _build)
