from .knn import knn_exact, knn_exact_fast, topk_per_group

__all__ = ["knn_exact", "knn_exact_fast", "topk_per_group"]
