"""Compute ops: sparse embeddings, discretizers, hashed LR, top-K, retrieval."""
