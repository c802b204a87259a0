"""Model families: light ranker (LR), MaskNet heavy ranker, TwHIN two-tower,
push MLP/ClemNet rankers, trust & safety classifiers."""
