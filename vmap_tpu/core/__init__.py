"""Scene/object runtime: stacked object banks, the global frame pool,
keyframe bookkeeping, and the jitted per-frame train step."""
