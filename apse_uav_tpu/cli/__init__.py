"""User-facing command-line entry points."""
