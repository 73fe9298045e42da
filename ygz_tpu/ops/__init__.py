"""Image and descriptor kernels: pyramid, FAST, ORB, KLT align, Hamming."""
