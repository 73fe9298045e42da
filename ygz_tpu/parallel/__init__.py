"""Device-mesh parallelism: sharded bundle adjustment (observations over
devices, psum-reduced normal equations) and data-parallel multi-frame
tracking for offline throughput."""
