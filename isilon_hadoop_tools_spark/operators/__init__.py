"""Engine operators: reconciliation, allocation, guards, dedup,
similarity, top-k — each a composition of DataFrame primitives."""
