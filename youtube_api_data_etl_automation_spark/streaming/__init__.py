"""Structured Streaming ingestion mode (SURVEY.md §7.1 item 9)."""
