"""Tweet-mixer candidate-pipeline catalog: spec breadth, store-availability
skipping, signal routing, param gating, and an end-to-end multi-family blend
(≡ tweet-mixer/candidate_pipeline/ 50 configs + CandidateSourcesRouter)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.core.config import Params
from the_algorithm_tpu.graph import graphjet, uteg
from the_algorithm_tpu.mixers import candidate_pipeline_catalog as cat
from the_algorithm_tpu.mixers import tweet_mixer
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.simclusters import ann


@dataclasses.dataclass
class Query:
    user_id: int = 1
    followed_authors: tuple = (2, 3)
    recent_engagement_ids: tuple = (7,)
    source_tweet_id: int = None
    topic_id: int = None
    geo_id: int = None
    trend_id: int = None
    last_searched_tweet_id: int = None
    language_code: str = None
    country_code: str = None
    event_id: int = None
    interest_topic_ids: tuple = ()
    pinned_tweet_id: int = None


def _cluster_index(C=8, M=4, base=100):
    ids = np.arange(C * M).reshape(C, M).astype(np.int32) + base
    scores = np.linspace(1, 0.1, C * M).reshape(C, M).astype(np.float32)
    ts = np.full((C, M), 50, np.int32)
    return ClusterTweetIndex(jnp.asarray(ids), jnp.asarray(scores),
                             jnp.asarray(ts))


def _emb(ids=(0, 1)):
    K = 4
    e_ids = np.full(K, int(PAD_ID), np.int32)
    e_sc = np.zeros(K, np.float32)
    for j, c in enumerate(ids):
        e_ids[j] = c
        e_sc[j] = 1.0 - 0.1 * j
    return SparseEmbedding(jnp.asarray(e_ids), jnp.asarray(e_sc))


def make_world():
    rng = np.random.default_rng(0)
    T, U, D = 64, 8, 16

    # engagement graphs: every user engaged tweets around id 7
    lg_ids = np.full((U, 8), int(PAD_ID), np.int32)
    lg_ids[:, 0] = 7
    lg_ids[:, 1] = np.arange(U) + 20
    left = uteg.EngagementGraph(
        jnp.asarray(lg_ids), jnp.zeros((U, 8), jnp.int32),
        jnp.full((U, 8), 40, jnp.int32),
    )
    r_ids = np.full((T, 8), int(PAD_ID), np.int32)
    r_ids[7, :4] = [1, 2, 3, 4]
    right = graphjet.RightIndex(
        jnp.asarray(r_ids), jnp.full((T, 8), 40, jnp.int32)
    )

    items = rng.normal(0, 1, (T, D)).astype(np.float32)
    items /= np.linalg.norm(items, axis=1, keepdims=True)

    ebi = eb.init_index(eb.EarlybirdConfig(capacity=16, max_tokens=4))
    tweets = [eb.RawTweet(tweet_id=900 + i, author_id=2 + (i % 2),
                          created_ts=10 + i, text=f"hello tpu {i}")
              for i in range(8)]
    ebi = eb.ingest(ebi, *eb.build_documents(tweets, eb.EarlybirdConfig(
        capacity=16, max_tokens=4))[:5])

    qig_ids = np.full((T, 4), int(PAD_ID), np.int32)
    qig_scores = np.zeros((T, 4), np.float32)
    qig_ids[9, :2] = [41, 42]
    qig_scores[9, :2] = [0.9, 0.8]

    return cat.SourceWorld(
        sann_index=_cluster_index(base=100),
        sann_config=ann.SimClustersANNConfig(
            max_scan_clusters=4, max_top_tweets_per_cluster=4,
            max_num_results=8, max_tweet_candidate_age_hours=1000,
        ),
        interested_in_fn=lambda q: _emb((0, 1)),
        tweet_embedding_fn=lambda t: _emb((int(t) % 4,)),
        producer_embedding_fn=lambda q: _emb((2,)),
        cold_index=_cluster_index(base=300),
        promoted_creator_index=_cluster_index(base=400),
        twhin_items=jnp.asarray(items),
        twhin_rebuild_items=jnp.asarray(items),
        twhin_user_vec_fn=lambda q: jnp.asarray(items[int(q.user_id)]),
        twhin_tweet_vec_fn=lambda t: jnp.asarray(items[int(t) % T]),
        dr_tweet_items=jnp.asarray(items),
        dr_media_items=jnp.asarray(items),
        dr_evergreen_items=jnp.asarray(items),
        dr_user_vec_fn=lambda q: jnp.asarray(items[int(q.user_id)]),
        dr_tweet_vec_fn=lambda t: jnp.asarray(items[int(t) % T]),
        uteg_graph=left,
        ad_graph=left,
        utg_left=left,
        utg_right=right,
        video_mask=jnp.asarray(np.ones(T, bool)),
        topic_index=_cluster_index(base=500),
        certo_topic_index=_cluster_index(base=600),
        geo_index=_cluster_index(base=700),
        trend_index=_cluster_index(base=800),
        qig_ids=jnp.asarray(qig_ids),
        qig_scores=jnp.asarray(qig_scores),
        diffusion_index=_cluster_index(base=200),
        earlybird_index=ebi,
        earlybird_query_fn=lambda q: eb.SearchQuery(
            tokens=jnp.asarray(eb.tokenize("hello", 4)), require_all=False,
            min_ts=jnp.int32(0), max_ts=jnp.int32(1000),
            followed_authors=jnp.asarray(sorted(q.followed_authors),
                                         jnp.int32),
        ),
        # round-2 additions
        content_ann_items=jnp.asarray(items),
        content_tweet_vec_fn=lambda t: jnp.asarray(items[int(t) % T]),
        clip_long_items=jnp.asarray(items),
        clip_short_items=jnp.asarray(items),
        semantic_video_items=jnp.asarray(items),
        evergreen_video_items=jnp.asarray(items),
        dr_cross_border_items=jnp.asarray(items),
        dr_tier_two_items=jnp.asarray(items),
        events_index=_cluster_index(base=900),
        pop_grok_topic_index=_cluster_index(base=1000),
        control_ai_topic_index=_cluster_index(base=1100),
        haplolite_store={"us": [(1201, 0.9), (1202, 0.5)]},
        video_tweet_ids=np.asarray([801, 802, 803], np.int32),
        curated_tls_authors={"en": [2]},  # author ids, resolved via earlybird
        pinned_tweet_author_fn=lambda t: int(t) % 8,
        twhin_user_items=jnp.asarray(items[:8]),
        similar_consumers_fn=lambda q: ([0, 1], [1.0, 0.5]),
        producer_engagers_fn=lambda p: ([int(p) % 8], [1.0]),
        producer_embedding_by_id_fn=lambda a: _emb((int(a) % 4,)),
        # round-4 engine-tail stores
        trip_embedding_stores={"model_a": lambda uid: _emb((0, 1))},
        trip_index={("TOP_GEO", 0): [(1301, 0.9)],
                    ("TOP_GEO", 1): [(1302, 0.8)],
                    ("TOP_DOMAIN", 0): [(1303, 0.7)]},
        trip_model_id="model_a",
        two_tower_user_fn=lambda uid: items[int(uid) % T],
        two_tower_items=jnp.asarray(items),
        two_tower_item_ids=np.arange(T),
        eb_seeds_fn=lambda q: ([2, 3], [1.0, 0.5]),
        eb_model_score_fn=lambda f: f[:, 0],
        eb_tf_score_fn=lambda f: f[:, 0] * 2.0,
        lookup_engines={
            "v1": cat.se.SimClustersANNEngine(
                _cluster_index(base=100),
                ann.SimClustersANNConfig(
                    max_scan_clusters=4, max_top_tweets_per_cluster=4,
                    max_num_results=8, max_tweet_candidate_age_hours=1000),
                lambda q: _emb((0, 1))),
        },
        lookup_default_model="v1",
    )


WORLD = make_world()
CATALOG = cat.build_catalog(WORLD)


class TestCatalogBreadth:
    def test_spec_count_and_uniqueness(self):
        specs = cat.catalog_specs()
        assert len(specs) >= 27
        names = [s.name for s in specs]
        assert len(names) == len(set(names))

    def test_all_specs_build_with_full_world(self):
        assert len(CATALOG) == len(cat.catalog_specs())

    def test_missing_store_skips_spec(self):
        world = dataclasses.replace(WORLD, topic_index=None, qig_ids=None)
        built = {s.name for s, _ in cat.build_catalog(world)}
        missing = {s.name for s in cat.catalog_specs()} - built
        assert missing == {
            "popular_topic_tweets", "skit_topic_tweets",
            "skit_high_precision_topic_tweets", "qig_search_history_tweets",
            "user_interests_summary", "tweet_based_unified",
        }

    def test_family_coverage(self):
        fams = {s.family for s in cat.catalog_specs()}
        assert fams >= {"earlybird", "simclusters", "twhin",
                        "deep_retrieval", "graph", "topic", "qig",
                        "diffusion"}


class TestRouter:
    def test_signal_gating(self):
        # no topic/geo/trend/search signals → those pipelines excluded
        pipes = cat.enabled_pipelines(CATALOG, Query(), Params())
        names = {p.source.name for p in pipes}
        assert "PopularTopicTweets" not in names
        assert "QigSearchHistoryTweets" not in names
        assert "SimClustersInterestedIn" in names
        assert "UTEG" in names

    def test_topic_signal_enables_topic_pipelines(self):
        pipes = cat.enabled_pipelines(CATALOG, Query(topic_id=2), Params())
        names = {p.source.name for p in pipes}
        assert {"PopularTopicTweets", "SkitTopicTweets",
                "SkitHighPrecisionTopicTweets", "CertoTopicTweets"} <= names

    def test_param_gate_disables(self):
        spec = next(s for s, _ in CATALOG if s.name == "uteg")
        pipes = cat.enabled_pipelines(
            CATALOG, Query(), Params({spec.param: False})
        )
        assert "UTEG" not in {p.source.name for p in pipes}

    def test_default_disabled_specs_off(self):
        pipes = cat.enabled_pipelines(CATALOG, Query(), Params())
        names = {p.source.name for p in pipes}
        assert "UAG" not in names  # ads off by default
        assert "ContentExplorationSimclustersCold" not in names

    def test_no_follows_drops_follow_pipelines(self):
        q = Query(followed_authors=())
        names = {p.source.name
                 for p in cat.enabled_pipelines(CATALOG, q, Params())}
        assert "UTEG" not in names
        assert "EarlybirdInNetwork" not in names


class TestEndToEnd:
    def test_multi_family_blend(self):
        q = Query(topic_id=1, last_searched_tweet_id=9, source_tweet_id=7)
        pipes = cat.enabled_pipelines(CATALOG, q, Params())
        mixer = tweet_mixer.TweetMixer(
            [p.source for p in pipes], max_results=100
        )
        out = mixer.get_candidates(q)
        assert len(out) > 20
        sources = {c.source for c in out}
        # at least 5 distinct families contribute
        assert len(sources) >= 5, sources
        ids = [c.id for c in out]
        assert len(ids) == len(set(ids))

    def test_expansion_unions_recent_tweets(self):
        spec, pipe = next(
            (s, p) for s, p in CATALOG
            if s.name == "utg_expansion_tweet_based"
        )
        q = Query(source_tweet_id=7, recent_engagement_ids=(7,))
        out = pipe.source.get(q, Params())
        assert out and all(c.source == "UTGExpansionTweetBased" for c in out)

    def test_qig_reads_similar_table(self):
        spec, pipe = next(
            (s, p) for s, p in CATALOG if s.name == "qig_search_history_tweets"
        )
        out = pipe.source.get(Query(last_searched_tweet_id=9), Params())
        assert {c.id for c in out} == {41, 42}


class TestRoundTwoSpecs:
    """The 24 pipelines added to reach the reference's ~50-config catalog."""

    def test_catalog_is_fifty_wide(self):
        assert len(cat.catalog_specs()) >= 50
        assert len(CATALOG) == len(cat.catalog_specs())

    def test_new_family_coverage(self):
        fams = {s.family for s in cat.catalog_specs()}
        assert {"content_ann", "video", "popularity", "curated"} <= fams

    def test_haplolite_country_store(self):
        pipes = cat.enabled_pipelines(CATALOG, Query(country_code="us"),
                                      Params())
        hap = next(p for p in pipes if p.source.name == "Haplolite")
        got = hap.source.get(Query(country_code="us"), Params())
        assert [(c.id, c.score) for c in got] == [(1201, 0.9), (1202, 0.5)]
        # unknown country → empty, not error
        assert hap.source.get(Query(country_code="xx"), Params()) == []

    def test_curated_tls_language_routing(self):
        names = {p.source.name for p in cat.enabled_pipelines(
            CATALOG, Query(language_code="en"), Params())}
        assert "CuratedUserTlsPerLanguage" in names
        names = {p.source.name for p in cat.enabled_pipelines(
            CATALOG, Query(), Params())}
        assert "CuratedUserTlsPerLanguage" not in names

    def test_curated_tls_resolves_authors_to_tweets(self):
        # the store holds AUTHOR ids; the source must resolve them to that
        # author's recent tweets through the earlybird index, newest first
        pipes = cat.enabled_pipelines(
            CATALOG, Query(language_code="en"), Params())
        src = next(p.source for p in pipes
                   if p.source.name == "CuratedUserTlsPerLanguage")
        got = src.get(Query(language_code="en"), Params())
        assert got
        # fixture ingests tweets 900..907 with author 2 + (i % 2):
        # author 2 wrote the even ones
        assert {c.id for c in got} == {900, 902, 904, 906}
        assert [c.id for c in got] == sorted(
            (c.id for c in got), reverse=True)

    def test_trends_video_restricted_to_video_corpus(self):
        pipes = cat.enabled_pipelines(CATALOG, Query(trend_id=0), Params())
        tv = next(p for p in pipes if p.source.name == "TrendsVideo")
        got = tv.source.get(Query(trend_id=0), Params())
        assert {c.id for c in got} <= {801, 802, 803}
        assert got  # trend row 0 holds ids 800..803 → intersection non-empty

    def test_video_pipelines_consumer_signal(self):
        names = {p.source.name for p in cat.enabled_pipelines(
            CATALOG, Query(), Params())}
        assert {"TwitterClipV0LongVideo", "TwitterClipV0ShortVideo",
                "EvergreenVideos"} <= names

    def test_user_interests_summary_expansion(self):
        pipes = cat.enabled_pipelines(
            CATALOG, Query(interest_topic_ids=(0, 1)), Params())
        uis = next(p for p in pipes
                   if p.source.name == "UserInterestsSummary")
        got = uis.source.get(Query(interest_topic_ids=(0, 1)), Params())
        ids = {c.id for c in got}
        # union of topic rows 0 and 1 (base=500 index: row r holds
        # 500+4r..500+4r+3)
        assert ids <= set(range(500, 508)) and len(ids) > 4

    def test_pinned_tweet_related_creator(self):
        pipes = cat.enabled_pipelines(
            CATALOG, Query(pinned_tweet_id=12), Params())
        names = {p.source.name for p in pipes}
        assert "PinnedTweetRelatedCreator" in names

    def test_events_signal(self):
        pipes = cat.enabled_pipelines(CATALOG, Query(event_id=1), Params())
        ev = next(p for p in pipes if p.source.name == "Events")
        got = ev.source.get(Query(event_id=1), Params())
        assert {c.id for c in got} == {904, 905, 906, 907}

    def test_tier_two_disabled_by_default(self):
        names = {p.source.name for p in cat.enabled_pipelines(
            CATALOG, Query(source_tweet_id=7), Params())}
        assert "ContentExplorationDRTweetTweetTierTwo" not in names
        assert "ContentExplorationEmbeddingSimilarityTierTwo" not in names
        # but the always-on content-ann pipelines fire on source tweets
        assert "ContentAnnTweetBased" in names
        assert "MediaDeepRetrievalTweetTweetSimilarity" in names
