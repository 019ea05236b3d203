"""Structured Streaming surface (extension — the reference is batch-only)."""
