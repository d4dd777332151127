"""Composed pipelines: ingest -> tiers -> chunks -> search, checkpointed."""
