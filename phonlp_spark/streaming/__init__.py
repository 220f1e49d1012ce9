"""Incremental processing (Structured Streaming, Trigger.AvailableNow)."""
