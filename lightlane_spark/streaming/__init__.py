"""Structured Streaming extensions (beyond reference parity)."""
