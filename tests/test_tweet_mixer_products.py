"""Tweet-mixer product configs: per-product routing over the pipeline
catalog (≡ TweetMixerProduct.scala + product pipeline configs)."""

import pytest

from the_algorithm_tpu.core.config import Params
from the_algorithm_tpu.mixers import candidate_pipeline_catalog as cat
from the_algorithm_tpu.mixers import tweet_mixer_products as tmp
from test_candidate_pipeline_catalog import WORLD, CATALOG, Query


class TestSpecs:
    def test_every_product_has_spec(self):
        assert set(tmp.PRODUCT_SPECS) == set(tmp.TweetMixerProduct)

    def test_spec_names_exist_in_catalog(self):
        known = {s.name for s in cat.catalog_specs()}
        for spec in tmp.PRODUCT_SPECS.values():
            unknown = set(spec.pipeline_names) - known
            assert not unknown, (spec.product, unknown)


class TestRouting:
    def test_home_routes_consumer_pipelines(self):
        pipes = tmp.product_pipelines(
            CATALOG, tmp.TweetMixerProduct.HOME_RECOMMENDED_TWEETS,
            Query(), Params())
        names = {p.source.name for p in pipes}
        assert "SimClustersInterestedIn" in names
        assert "UTEG" in names
        assert "PopularTopicTweets" not in names  # not in the home spec

    def test_topic_product_needs_topic_signal(self):
        no_topic = tmp.product_pipelines(
            CATALOG, tmp.TweetMixerProduct.TOPIC_TWEETS, Query(), Params())
        assert no_topic == []
        with_topic = tmp.product_pipelines(
            CATALOG, tmp.TweetMixerProduct.TOPIC_TWEETS,
            Query(topic_id=2), Params())
        assert len(with_topic) == 4

    def test_logged_out_products(self):
        q = Query(user_id=None, geo_id=1, trend_id=2)
        # consumer product refuses logged-out
        assert tmp.product_pipelines(
            CATALOG, tmp.TweetMixerProduct.HOME_RECOMMENDED_TWEETS, q,
            Params()) == []
        pipes = tmp.product_pipelines(
            CATALOG, tmp.TweetMixerProduct.LOGGED_OUT_VIDEO_RECOMMENDED_TWEETS,
            q, Params())
        assert {p.source.name for p in pipes} == {"PopularGeoTweets",
                                                  "TrendsTweets"}

    def test_debugger_runs_everything_routable(self):
        q = Query(topic_id=1, geo_id=1, trend_id=1, source_tweet_id=7,
                  last_searched_tweet_id=9)
        pipes = tmp.product_pipelines(
            CATALOG, tmp.TweetMixerProduct.DEBUGGER_TWEETS, q, Params())
        assert len(pipes) >= 20


class TestRun:
    def test_related_tweets_product_blends(self):
        q = Query(user_id=None, source_tweet_id=7)
        out = tmp.run_product(
            CATALOG, tmp.TweetMixerProduct.IMV_RELATED_TWEETS, q)
        assert out
        ids = [c.id for c in out]
        assert len(ids) == len(set(ids))
        assert len({c.source for c in out}) >= 2

    def test_home_product_respects_budget(self):
        out = tmp.run_product(
            CATALOG, tmp.TweetMixerProduct.HOME_RECOMMENDED_TWEETS,
            Query(source_tweet_id=7))
        assert 0 < len(out) <= 400
