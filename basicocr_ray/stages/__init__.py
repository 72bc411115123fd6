"""Ray Data batch transforms and actor-pool stages."""
