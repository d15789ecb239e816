"""Utilities: synthetic scene rendering, profiling, CSV/video I/O, visualization."""
