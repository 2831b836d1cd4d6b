"""Ray Data stages: stateless batch kernels + actor-pool classes."""
