"""Device kernels (JAX/Pallas) for the hot pipeline operations."""
