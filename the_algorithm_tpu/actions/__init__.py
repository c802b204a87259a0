"""User-action plumbing: UUA normalization, enrichment, recos-injector feeds."""
