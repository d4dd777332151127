"""Structured Streaming wrappers over the incremental-batch engine."""
