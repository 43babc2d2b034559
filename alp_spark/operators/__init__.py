"""BLAS-1/2/3 primitives over DataFrames (SURVEY.md §2.4-2.6)."""

from .blas1 import (  # noqa: F401
    apply_mask,
    check_no_casting,
    cosine_similarity,
    dot,
    norm2,
    e_wise_add,
    e_wise_apply,
    e_wise_apply_scalar,
    e_wise_lambda,
    e_wise_map,
    e_wise_mul,
    e_wise_mul_add,
    fold_scalar,
    fold_vector,
    unzip_vector,
    zip_vectors,
)
from .blas2 import e_wise_lambda_matrix, mxv, vxm  # noqa: F401
from .blas3 import (  # noqa: F401
    e_wise_apply_matrix,
    matrix_set,
    matrix_zip,
    mxm,
    outer,
)
