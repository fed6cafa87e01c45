from .ann import binary_sign_knn, lsh_knn_cosine
from .dedup import (
    dedup_exact,
    dedup_incremental,
    embedding_neardup_pairs,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from .ivf import ivf_kmeans_knn, ivf_knn_cosine, kmeans_fit, kmeans_train
from .pq import IvfPqIndex, PqIndex, pq_adc_knn, pq_codebooks, pq_encode
from .retrieval import (
    bm25_rank,
    knn_graph,
    maxsim_search,
    mmr_rerank,
    range_search,
    rrf_fuse,
)
from .search import similarity_search
from .knn import format_results, knn_exact, knn_exact_fast, knn_with_labels, topk_per_group
from .synth import synthetic_vectors
from .textpipe import approx_top_tokens, mix_corpus, weighted_sample

__all__ = [
    "IvfPqIndex",
    "PqIndex",
    "approx_top_tokens",
    "binary_sign_knn",
    "bm25_rank",
    "dedup_exact",
    "dedup_incremental",
    "embedding_neardup_pairs",
    "format_results",
    "ivf_kmeans_knn",
    "ivf_knn_cosine",
    "kmeans_fit",
    "kmeans_train",
    "knn_exact",
    "knn_exact_fast",
    "knn_graph",
    "knn_with_labels",
    "lsh_knn_cosine",
    "maxsim_search",
    "minhash_lsh_candidates",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "mix_corpus",
    "mmr_rerank",
    "ngram_jaccard_pairs",
    "pq_adc_knn",
    "pq_codebooks",
    "pq_encode",
    "range_search",
    "rrf_fuse",
    "simhash_pairs",
    "simhash_signatures",
    "similarity_search",
    "synthetic_vectors",
    "topk_per_group",
    "weighted_sample",
]
