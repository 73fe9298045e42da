"""Dataset loaders, configuration, trajectory I/O, timing utilities."""
