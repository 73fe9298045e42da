"""Trajectory evaluation: timestamp association + ATE RMSE with SE3 or
Sim3 (7DoF, monocular scale) alignment."""
