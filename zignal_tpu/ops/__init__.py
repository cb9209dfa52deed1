"""Device kernel library (jnp/Pallas) for image operations."""
