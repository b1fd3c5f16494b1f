"""Device-side compute kernels (JAX/XLA/Pallas) for comet_tpu."""
