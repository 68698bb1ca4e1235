"""Compute kernels: triangle setup, rasterization, shading, binning."""
