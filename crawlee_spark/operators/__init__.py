"""Set-oriented operators: frontier store, scheduling, enqueue gating, stats."""
