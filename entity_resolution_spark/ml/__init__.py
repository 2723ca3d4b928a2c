"""ML-side components: deterministic numpy KMeans, encoder inference UDF."""
