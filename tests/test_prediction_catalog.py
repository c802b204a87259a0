"""Prediction feature catalog: registry integrity, family coverage, head
binding, schema generation."""

from the_algorithm_tpu.features import prediction_catalog as pc
from the_algorithm_tpu.models import masknet


class TestCatalog:
    def test_size_and_families(self):
        # the reference catalog spans 16 per-surface packages; ours covers
        # the major families with generated cross products
        assert len(pc.CATALOG) >= 300
        fams = pc.CATALOG.families()
        for f in ("recap", "real_graph", "engagement", "time", "two_hop",
                  "simcluster", "request_context", "user_health",
                  "socialproof", "list", "itl", "followsource", "ppmi",
                  "escherbird", "client_log_event", "p_home_latest"):
            assert f in fams, f

    def test_no_duplicates_and_lookup(self):
        names = [f.name for f in pc.CATALOG.all()]
        assert len(names) == len(set(names))
        f = pc.CATALOG.get("realgraph.num_favorites.ewma")
        assert f.kind == pc.FeatureKind.CONTINUOUS
        assert f.family == "real_graph"

    def test_real_graph_cross_product(self):
        rg = pc.CATALOG.family("real_graph")
        # 22 interaction kinds × (6 stats + is_missing) + 3 id/weight
        # (the reference's NUM_<kind>_<stat> set, 22 kinds)
        assert len(rg) == 22 * 7 + 3

    def test_binary_labels(self):
        labels = {f.name for f in pc.CATALOG.binary_labels()}
        assert "recap.engagement.is_favorited" in labels
        assert "recap.engagement.is_dwelled_10s" in labels
        assert "recap.client.is_web" not in labels  # not an engagement

    def test_all_serving_heads_bound(self):
        assert pc.validate_heads(masknet.DEFAULT_HEAD_NAMES) == []
        assert pc.validate_heads(["nonexistent_head"]) == ["nonexistent_head"]

    def test_schema_generation(self):
        schema = pc.CATALOG.schema(["engagement", "time"])
        names = [s.name for s in schema]
        assert "engagement_features_in_network_favorite_count" in names
        assert all("." not in n for n in names)
        # discrete/sparse excluded from the dense view by default
        schema_rc = pc.CATALOG.schema(["request_context"])
        assert [s.name for s in schema_rc] == ["request_context_is_polling"]

    def test_tags_lineage(self):
        f = pc.CATALOG.get("recap.engagement.is_favorited")
        assert "EngagementsPrivate" in f.tags
