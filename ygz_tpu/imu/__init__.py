"""Visual-inertial subsystem: on-manifold IMU preintegration, NavState,
visual-inertial initialization (gyro bias / scale / gravity / accel bias),
and NavState optimization with AD-derived Jacobians."""
