"""Structured Streaming surface for the events table."""
