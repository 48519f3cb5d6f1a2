"""Pure, vectorizable core kernels: sharding, URL handling, TLD policy, hashing."""
