"""hairfast-tpu CLI scripts."""
