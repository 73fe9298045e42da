"""Correspondence search: windowed projection matching, brute-force BoW-style
descriptor matching, epipolar-gated triangulation matching, rotation
consistency filtering, and the visual vocabulary."""
