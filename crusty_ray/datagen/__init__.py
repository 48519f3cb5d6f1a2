"""Deterministic synthetic web: graph, DNS, robots, HTML bodies, image payloads."""
