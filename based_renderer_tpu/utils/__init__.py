"""Utilities: error taxonomy, logging, image IO, profiling."""
