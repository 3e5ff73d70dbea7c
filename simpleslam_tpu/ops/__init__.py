"""Device-side compute kernels (pure JAX / Pallas; all jittable, static shapes)."""
