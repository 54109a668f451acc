"""Operators: extract / transform / dedup / merge / similarity / text."""
