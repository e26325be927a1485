"""TPU compute ops: Pallas kernels and MXU-shaped primitives."""

from .masked_topk import masked_topk, masked_topk_pallas, masked_topk_xla
from .graph import BipartiteProp

__all__ = ["masked_topk", "masked_topk_pallas", "masked_topk_xla",
           "BipartiteProp"]
