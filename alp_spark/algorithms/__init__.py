"""Shipped algorithms re-expressed Spark-first (SURVEY.md §2.11)."""

from .connected_components import connected_components  # noqa: F401
from .fastsv import fastsv_components  # noqa: F401
from .hits import hits  # noqa: F401
from .hpcg import build_hpcg_system, hpcg  # noqa: F401
from .linkpred import link_prediction_scores  # noqa: F401
from .kcore import kcore_decomposition  # noqa: F401
from .kmeans import kmeans, kpp_initialisation  # noqa: F401
from .label_propagation import label_propagation  # noqa: F401
from .mpv import knn, mpv  # noqa: F401
from .pregel_pagerank import pregel_pagerank  # noqa: F401
from .simple_pagerank import simple_pagerank, simple_pagerank_csr  # noqa: F401
from .solvers import bicgstab, conjugate_gradient  # noqa: F401
from .sparse_nn import sparse_nn_single_inference  # noqa: F401
from .spy import spy  # noqa: F401
from .sssp import sssp  # noqa: F401
from .triangles import triangle_count  # noqa: F401
