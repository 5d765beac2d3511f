"""Host-side ingest: native decoding, batching, CUE splitting."""
