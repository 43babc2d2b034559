"""Physical-plan helpers: skew handling and the CSR-block SpMV kernel.

These are the hand-built pieces of SURVEY.md §4 that Catalyst does not
provide: explicit hub-vertex salting (§4 #12) and the hash-partitioned
CSR-block ``applyInPandas``/``mapInPandas`` gather-scatter path the
north star mandates (analog of ALP's CRS kernels,
reference/blas2.hpp:295/646, ingested once in the Pregel constructor,
interfaces/pregel.hpp:445-451).
"""

from .skew import hot_keys, salted_vxm
from .csr_blocks import CsrBlocks, build_csr_blocks

__all__ = ["hot_keys", "salted_vxm", "CsrBlocks", "build_csr_blocks"]
