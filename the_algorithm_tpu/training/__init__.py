"""Training runtime: DP/sharded train loop, metrics, checkpointing, export."""
