"""Relational / dataflow operators."""

from .knn import knn, knn_join
from .status import STATUS_VALUES, completed_listing, failed_listing, status_upsert

__all__ = [
    "knn",
    "knn_join",
    "STATUS_VALUES",
    "completed_listing",
    "failed_listing",
    "status_upsert",
]
