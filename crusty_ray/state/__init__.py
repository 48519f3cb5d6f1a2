"""Durable / shared mutable state: membership filters and the sharded frontier."""
