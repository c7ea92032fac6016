"""Dataset-level transforms (each composes into a streaming pipeline)."""
