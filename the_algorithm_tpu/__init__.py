"""the_algorithm_tpu — a TPU-native recommender engine.

A from-scratch JAX/XLA/Pallas framework providing the retrieval-and-ranking
capabilities of Twitter/X's `the-algorithm`: SimClusters sparse community
embeddings, TwHIN-style dense two-tower embeddings, approximate-cosine top-K
retrieval, pairwise-similarity scoring features, the Earlybird light ranker,
and a MaskNet-style multi-task heavy ranker — composed into a home-mixer-style
retrieve → hydrate → score → select pipeline.

Design stance (see SURVEY.md §7): one framework, not 40 microservices.
Tables and indexes are device-resident sharded arrays; "services" are jitted
functions; "RPC multiget" is all-to-all; batch jobs are pjit programs; only
the serving edge keeps a host RPC front.
"""

__version__ = "0.1.0"
