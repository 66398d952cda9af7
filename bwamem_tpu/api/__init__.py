from .aligner import BwaMemAligner
from .alignment import BwaMemAlignment
from .index import Algorithm, BwaMemIndex
from .options import MemOptions
from .pestats import BwaMemPairEndStats

__all__ = [
    "BwaMemAligner",
    "BwaMemAlignment",
    "BwaMemIndex",
    "Algorithm",
    "MemOptions",
    "BwaMemPairEndStats",
]
