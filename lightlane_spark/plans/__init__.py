"""Plan inspection: dry-run/explain (OP-36) and plan assertions."""
