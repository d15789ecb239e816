"""Core math and data structures: camera model, rotations, colorspace, instances."""
