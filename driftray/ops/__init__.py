"""Reusable Ray-Data-first operators: relational, text, dedup, ANN, multimodal."""
