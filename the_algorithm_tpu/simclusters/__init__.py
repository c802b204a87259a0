"""SimClusters v2: community detection, embeddings, retrieval index, ANN."""
