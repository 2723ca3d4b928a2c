"""Scalar/column function library (blocking keys, features, similarity, text)."""
