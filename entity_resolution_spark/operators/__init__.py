"""Dataflow operators: blocking, pair generation, components, clustering, eval."""
