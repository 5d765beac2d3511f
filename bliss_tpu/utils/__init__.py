"""Host-side utilities: bucketing, hashing helpers."""

from ..models.analyzer import bucket_length

__all__ = ["bucket_length"]
