"""Experimental features (reference: ``graphdot/experimental/``)."""
