"""hairfast-tpu package."""
