"""Earlybird schema catalog: full EarlybirdFieldConstants coverage.

≡ ``src/java/com/twitter/search/common/schema/earlybird/
EarlybirdFieldConstants.java`` — all 192 enum members (indexed text
fields, CSF payloads, encoded/extended-encoded feature slots, and the
catalogued unused bit ranges) must resolve to a posting representation
of the TPU index: a class-prefixed token namespace, a dense feature
slot, a dedicated index array, the engagement graph, or the packed
features blob.
"""

import numpy as np

from the_algorithm_tpu.search import earlybird as eb

VALID_KINDS = {"tokens", "feature", "column", "engagement", "packed",
               "unused"}


class TestFieldCatalog:
    def test_full_constant_coverage(self):
        # the reference enum has 192 members; every one is catalogued
        assert len(eb.FIELD_CATALOG) >= 192

    def test_kinds_valid(self):
        for name, (kind, target) in eb.FIELD_CATALOG.items():
            assert kind in VALID_KINDS, name

    def test_feature_targets_exist(self):
        for name, (kind, target) in eb.FIELD_CATALOG.items():
            if kind == "feature":
                assert target in eb.DOC_FEATURE_INDEX, (name, target)

    def test_column_targets_exist(self):
        for name, (kind, target) in eb.FIELD_CATALOG.items():
            if kind == "column":
                assert target in eb.EarlybirdIndex._fields, (name, target)

    def test_doc_features_unique(self):
        assert len(set(eb.DOC_FEATURES)) == len(eb.DOC_FEATURES)
        assert len(eb.DOC_FEATURES) >= 180

    def test_engagement_kinds_are_graph_edges(self):
        # liked_by / retweeted_by / replied_to_by postings live in the
        # engagement graph, keyed by the engagement type
        from the_algorithm_tpu.graph import uteg

        names = {t.name.lower() for t in uteg.EngagementType}
        for name, (kind, target) in eb.FIELD_CATALOG.items():
            if kind == "engagement":
                assert target in names, (name, target)

    def test_min_engagement_facets_map_to_counts(self):
        # the CSF ↔ min-engagement-field pairing the queryparser uses
        # (CSF_NAME_TO_MIN_ENGAGEMENT_FIELD_MAP)
        for facet, count in (
            ("normalized_reply_count_greater_than_or_equal_to_field",
             "reply_count"),
            ("normalized_retweet_count_greater_than_or_equal_to_field",
             "retweet_count"),
            ("normalized_favorite_count_greater_than_or_equal_to_field",
             "fav_count"),
        ):
            kind, target = eb.FIELD_CATALOG[facet]
            assert kind == "feature" and target == count

    def test_new_feature_slots_scoreable(self):
        # a feature_min_bounds query over a new catalog slot filters docs
        import jax.numpy as jnp

        from the_algorithm_tpu.ops.sparse import PAD_ID

        cfg = eb.EarlybirdConfig(capacity=8, max_tokens=4)
        idx = eb.init_index(cfg)
        feats = np.zeros((4, len(eb.DOC_FEATURES)), np.float32)
        feats[:, eb.DOC_FEATURE_INDEX["weighted_fav_count"]] = (
            np.asarray([0.0, 5.0, 10.0, 2.0]))
        idx = eb.ingest(
            idx,
            jnp.full((4, cfg.max_tokens), 7, jnp.int32),
            jnp.arange(4, dtype=jnp.int32),
            jnp.full((4,), 100, jnp.int32),
            jnp.asarray(feats),
            jnp.arange(10, 14, dtype=jnp.int32),
        )
        bounds = np.full(len(eb.DOC_FEATURES), -np.inf, np.float32)
        bounds[eb.DOC_FEATURE_INDEX["weighted_fav_count"]] = 4.0
        q = eb.SearchQuery(
            tokens=jnp.asarray([7], jnp.int32),
            require_all=True,
            min_ts=jnp.int32(0), max_ts=jnp.int32(200),
            feature_min_bounds=jnp.asarray(bounds),
        )
        ids, _ = eb.search(idx, q, max_results=4)
        got = {int(i) for i in np.asarray(ids) if i != int(PAD_ID)}
        assert got == {11, 12}
