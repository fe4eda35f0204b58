"""Engine operators: spatial joins, kNN, tiling, dedup, similarity, text stats."""
