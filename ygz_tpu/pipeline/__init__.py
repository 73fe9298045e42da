"""SLAM pipeline: map state, frames, tracking cascade, local mapping,
loop closing, relocalization, and the system facade."""
