"""Stateless/actor-pool batch stages: fetch, parse, resolve, discovery filters."""
