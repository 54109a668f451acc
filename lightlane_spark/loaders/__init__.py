"""Loaders: mode-aware writers (OVERWRITE/APPEND/MERGE) and text sinks."""
