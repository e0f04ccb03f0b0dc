"""Cross-cutting utilities: assigner, losses, metrics, box ops, config."""
