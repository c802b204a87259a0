"""Graph jobs: tweepcred PageRank, RealGraph interaction model, UTEG traversal."""
