"""Engine-portable scalar functions (hashing, text metrics)."""
