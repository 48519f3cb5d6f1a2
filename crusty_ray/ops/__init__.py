"""Large-scale training-data operators: dedup, similarity, text analysis, multimodal."""
