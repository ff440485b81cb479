"""Structured Streaming surface: the streaming re-expression of the
reference's incremental-batch machinery (watermark polling loops →
readStream + event-time watermarks)."""
