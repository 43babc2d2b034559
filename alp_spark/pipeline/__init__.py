"""Training-data pipeline operators over document / embedding tables.

These extend the link-graph engine with the operations a web-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing). They follow the same design rules as the core
engine: declarative DataFrame plans, JVM-side column expressions in the
hot path, Arrow-vectorized pandas UDFs only where built-ins cannot
express the semantics.
"""

from .text import (  # noqa: F401
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    simhash_signatures,
    token_stats,
    tokens_col,
)
from .dedup import (  # noqa: F401
    bucket_pairs,
    dedup_clusters,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_sets,
    shingles_col,
)
from .sessions import sessionize, streaming_sessionize  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_dup_pairs,
    cosine_topk,
    dequantize_embeddings,
    ivf_assign,
    ivf_topk,
    lsh_ann_topk,
    quantize_embeddings,
    srp_bucket,
    srp_candidate_pairs,
    srp_planes,
)
from .sampling import (  # noqa: F401
    sample_fraction,
    sample_stratified,
    train_val_split,
)
from .pca import (  # noqa: F401
    PcaModel,
    embedding_moments,
    fit_pca,
    fit_pca_power,
    transform_pca,
)
from .multimodal import (  # noqa: F401
    extract_features,
    media_from_ids,
    sample_frames,
    synthesize_media,
)
