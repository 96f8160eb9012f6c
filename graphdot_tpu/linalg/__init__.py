"""Linear algebra helpers for the model layer (reference:
``graphdot/linalg/``)."""
