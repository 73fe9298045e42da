"""Batched nonlinear least-squares backends replacing g2o wholesale:
pose-only optimization, local/global bundle adjustment with sparse Schur
complement, Sim3 pose-graph optimization, and Sim3 pair alignment."""
