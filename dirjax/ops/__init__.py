from .binary import (  # noqa: F401
    BinaryCodec,
    binarize,
    bytes_for_search,
    fit_itq,
    hamming_topk,
    hamming_topk_mxu,
    pad_for_search,
    project_queries,
    unpack_pm1,
)
from .normalize import l2_normalize  # noqa: F401
from .pooling import (  # noqa: F401
    avg_pool,
    center_bias_mask,
    gem_pool,
    global_pool,
    mac_pool,
    pool_descriptors,
    sympow,
    sympow_pool,
)
from .ivf import (  # noqa: F401
    IVFArrays,
    bin_ivf,
    build_ivf,
    ivf_assign,
    ivf_topk,
    train_ivf,
)
from .pq import (  # noqa: F401
    encode_pq,
    pq_lookup,
    pq_scores,
    pq_topk,
    reconstruct_pq,
    train_opq,
    train_pq,
)
from .qe import (  # noqa: F401
    expand_database,
    expand_database_chunked,
    expand_descriptors,
    expand_queries,
    expand_queries_chunked,
    expand_queries_quantized,
)
from .ranking import compute_scores, compute_scores_chunked, rank_topk  # noqa: F401
from .topk_pallas import quantize_db, rank_topk_fused  # noqa: F401
from .whitening import (PCAParams, apply_whitening, fit_pca,  # noqa: F401
                        fit_pca_device, whitening_matrix)
