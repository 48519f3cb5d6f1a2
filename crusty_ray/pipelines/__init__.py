"""End-to-end pipelines: the epochal crawl loop, top-k, metrics, image decode."""
