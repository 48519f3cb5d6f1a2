"""Single-threaded reference simulator — the conformance oracle (SURVEY.md §5)."""
