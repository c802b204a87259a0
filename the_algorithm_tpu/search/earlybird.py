"""Earlybird-equivalent realtime tweet index: ingest, match, score, top-K.

≡ ``src/java/com/twitter/search/earlybird/`` (SURVEY.md: Lucene inverted
index over ~7 days of tweets, Kafka ingestion, schema-based doc features,
relevance scoring via ``LinearScoringFunction:24`` /
``FeatureBasedScoringFunction:69`` / ``TensorflowBasedScoringFunction``,
root fan-out over partitions ``earlybird_root/``, in-network "recap" queries
for home timelines).

TPU re-design: **no inverted index**. A fixed-capacity ring buffer of recent
tweets lives on-device as dense arrays — token ids [T, L], author [T],
timestamps [T], packed static doc features [T, F] (the Earlybird schema
analog). A query scans the whole corpus with vectorized equality masks
(VPU) + a feature-based score + ``lax.top_k``; partitions = 'model'-axis
shards of the tweet axis with all-gather merge (the earlybird_root
scatter-gather, reusing the distributed top-K machinery). Brute scan on TPU
is speed-of-light competitive at realtime-index scale and needs no pointer
chasing (SURVEY.md §2.2 note on HNSW).

Tokenization is host-side (murmur-hashed lowercase terms — parity with the
feature-id hashing used everywhere else).
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, Mapping, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.core.hashing import murmur3_x64_128
from the_algorithm_tpu.core.mesh import MODEL_AXIS
from the_algorithm_tpu.ops.sparse import PAD_ID

def tokenize(text: str, max_tokens: int, *, stemming: bool = False
             ) -> np.ndarray:
    """Text → stable int32 term ids via the full analysis chain
    (``search/analyzer.py``: unicode normalization, class-preserving
    hashtag/mention/URL/cashtag tokens, CJK bigrams, optional stemming —
    the ``search/common`` analyzer stack, replacing the r3 lowercase
    regex)."""
    from the_algorithm_tpu.search import analyzer

    return analyzer.token_ids(text, max_tokens, stemming=stemming)


# doc-feature schema — the Earlybird schema core (``common/schema/``,
# ThriftSearchResultFeatures / EarlybirdFieldConstants): 60 per-doc fields
# covering engagement counts (+v2/decayed variants), content flags, media
# breadth, text/language signals, author reputation + account state, URL
# and embed signals, health-model scores, and conversation structure.
# Count fields get log1p'd at scoring time.
DOC_FEATURES = (
    # engagement counters (+ the v2 decayed variants the schema carries)
    "fav_count", "reply_count", "retweet_count", "quote_count",
    "bookmark_count", "fav_count_v2", "reply_count_v2", "retweet_count_v2",
    "prev_user_tweet_engagement", "num_likes_root", "num_replies_root",
    "video_view_count", "embeds_impression_count", "embeds_url_count",
    # doc structure / time
    "created_ts", "tweet_age_hours", "conversation_depth", "is_self_thread",
    "is_reply", "is_retweet", "is_quote", "has_quote",
    # text / language
    "text_score", "word_count", "visible_token_ratio", "language_match",
    "link_language", "language_confidence", "num_hashtags", "num_mentions",
    "num_stocks", "has_multiple_hashtags_or_trends", "is_trend_tweet",
    # media / content breadth
    "has_image", "has_native_image", "has_video", "has_consumer_video",
    "has_pro_video", "has_card", "has_multiple_media",
    "is_composer_source_camera",
    # urls / embeds
    "has_url", "has_news_url", "has_expanded_url", "has_visible_link",
    # author reputation / state
    "user_rep", "from_verified_account", "from_blue_verified_account",
    "author_followers_log", "author_account_age_days", "is_user_spam",
    "is_user_nsfw", "is_user_bot", "is_nullcast",
    # health / safety model scores (the experimental health model slots)
    "parus_score", "toxicity_score", "pblock_score", "pspammy_score",
    "is_offensive", "is_sensitive_content",
    # r4 breadth toward EarlybirdFieldConstants (≥100 fields): url/card
    # depth resolved by the ingester (card types, domain reputation,
    # shortener expansion), entity/annotation, health-model and label
    # flags, engagement-rate, text-statistics, thread and author-state
    # fields
    "num_urls", "has_shortened_url", "has_media_url", "url_domain_rep",
    "has_poll_card", "has_summary_card", "has_player_card",
    "has_promo_card", "card_language_match", "card_uri_denylisted",
    "num_annotations", "top_annotation_score", "has_place",
    "geo_confidence", "place_country_match", "has_space_card",
    "pnsfw_text_score", "pnsfw_media_score", "pabusive_score",
    "experimental_health_score_1", "experimental_health_score_2",
    "label_abusive_flag", "label_abusive_hi_rcl_flag",
    "label_dup_content_flag", "label_nsfw_hi_prec_flag",
    "label_nsfw_hi_rcl_flag", "label_spam_flag", "label_spam_hi_rcl_flag",
    "label_offensive_flag", "label_low_quality_flag",
    "profile_click_count", "share_count", "dwell_time_avg",
    "quote_rate", "reply_rate", "retweet_rate", "fav_rate",
    "impression_count", "fake_fav_count", "blue_verified_boost",
    "readability_score", "offensive_terms_count", "trending_terms_count",
    "oov_ratio", "emoji_count", "caps_ratio", "token_entropy",
    "num_cashtags", "num_cjk_tokens", "text_entropy_bucket",
    "root_user_rep", "is_ancestor_in_thread", "descendant_reply_count",
    "conversation_control_flag", "author_following_log",
    "author_tweet_count_log", "author_is_protected", "author_state",
    # r5: absolute tweet language id — the lang: operator's posting field
    # (``queryparser``/EarlybirdFieldConstants LANG field)
    "tweet_language",
    # r5 full EarlybirdFieldConstants catalog coverage
    # (``common/schema/earlybird/EarlybirdFieldConstants.java`` — the
    # remaining encoded/extended-encoded feature slots and CSF payloads):
    # weighted/decayed/fake/blink engagement families
    "weighted_retweet_count", "weighted_reply_count",
    "weighted_fav_count", "weighted_quote_count",
    "decayed_retweet_count", "decayed_reply_count",
    "decayed_fav_count", "decayed_quote_count",
    "fake_retweet_count", "fake_reply_count", "fake_quote_count",
    "blink_retweet_count", "blink_reply_count", "blink_fav_count",
    "blink_quote_count",
    # v2 counter slots + engagement recency
    "embeds_impression_count_v2", "embeds_url_count_v2",
    "video_view_count_v2", "num_hashtags_v2", "num_mentions_v2",
    "last_retweet_since_creation_hrs", "last_reply_since_creation_hrs",
    "last_fav_since_creation_hrs", "last_quote_since_creation_hrs",
    # media family: vine/periscope/expando-card slots
    "has_vine", "has_periscope", "has_expando_card", "has_trend",
    "is_trending_now", "periscope_exists", "periscope_has_been_featured",
    "periscope_is_currently_featured", "periscope_is_from_quality_source",
    "periscope_is_live",
    # author-state + health-model tail
    "profile_is_egg", "is_user_new",
    "experimental_health_score_3", "experimental_health_score_4",
    "p_reported_score", "spammy_content_score",
    # card / geo / link CSF payloads
    "tweet_signature", "card_type", "card_lang", "card_uri_hash",
    "lat", "lon", "link_category", "place_country",
    "profile_geo_country", "profile_geo_region", "profile_geo_locality",
    # id-valued CSF payloads (operator-addressable; index-scale ids fit
    # float32's exact-integer range)
    "conversation_id", "shared_status_id", "quoted_tweet_id",
    "quoted_user_id", "directed_at_user_id", "reference_author_id",
    "exclusive_conversation_author_id", "in_reply_to_tweet_id",
    "in_reply_to_user_id", "retweet_source_tweet_id",
    "retweet_source_user_id", "entity_id", "place_id", "space_id",
)

# stable small ids for the lang: operator (ISO codes the reference's
# queryparser accepts; unknown codes hash into the tail range)
LANGUAGE_IDS = {
    c: i for i, c in enumerate((
        "en", "ja", "es", "pt", "ar", "ko", "fr", "tr", "th", "in", "ru",
        "de", "it", "hi", "pl", "nl", "fa", "und", "zh", "sv", "fi", "da",
        "no", "hu", "ur", "ta", "el", "he", "cs", "uk", "vi", "ro",
    ))
}


def language_id(code: str) -> int:
    c = (code or "und").lower()
    if c in LANGUAGE_IDS:
        return LANGUAGE_IDS[c]
    return len(LANGUAGE_IDS) + (_hash_term(c) % 1000)
DOC_FEATURE_INDEX = {n: i for i, n in enumerate(DOC_FEATURES)}

# Full EarlybirdFieldConstants catalog → TPU-index posting representation
# (``common/schema/earlybird/EarlybirdFieldConstants.java``, all 192
# enum members, lowercased). Kinds:
#   tokens     — indexed text; rides the class-prefixed token stream
#                (``search/analyzer.py`` namespaces the term hash)
#   feature    — a numeric slot of the dense [T, F] features array
#   column     — a dedicated EarlybirdIndex array
#   engagement — per-user engagement postings; lives in the engagement
#                graph (``graph/uteg.py``), not the tweet index
#   packed     — the encoded-features blob itself (our features array IS
#                the decoded form)
#   unused     — reference-catalogued unused bit ranges
FIELD_CATALOG: Mapping[str, Tuple[str, Optional[str]]] = {
    # indexed text fields
    "id_field": ("column", "tweet_ids"),
    "resolved_links_text_field": ("tokens", "url_text"),
    "text_field": ("tokens", "text"),
    "tokenized_from_user_field": ("tokens", "user"),
    "card_title_field": ("tokens", "card"),
    "card_description_field": ("tokens", "card"),
    "created_at_field": ("column", "created_ts"),
    "entity_id_field": ("feature", "entity_id"),
    "from_user_field": ("column", "author"),
    "from_user_id_field": ("column", "author"),
    "card_domain_field": ("tokens", "card"),
    "card_name_field": ("tokens", "card"),
    "geo_hash_field": ("feature", "lat"),
    "hashtags_field": ("tokens", "hashtag"),
    "hf_phrase_pairs_field": ("tokens", "phrase_pair"),
    "hf_term_pairs_field": ("tokens", "term_pair"),
    "image_links_field": ("tokens", "url"),
    "in_reply_to_tweet_id_field": ("feature", "in_reply_to_tweet_id"),
    "in_reply_to_user_id_field": ("feature", "in_reply_to_user_id"),
    "internal_field": ("packed", None),
    "iso_language_field": ("feature", "tweet_language"),
    "link_category_field": ("feature", "link_category"),
    "links_field": ("tokens", "url"),
    "mentions_field": ("tokens", "mention"),
    "news_links_field": ("tokens", "url"),
    "normalized_source_field": ("tokens", "source"),
    "place_field": ("tokens", "place"),
    "retweet_source_tweet_id_field": ("feature", "retweet_source_tweet_id"),
    "retweet_source_user_id_field": ("feature", "retweet_source_user_id"),
    "source_field": ("tokens", "source"),
    "stocks_field": ("tokens", "cashtag"),
    "to_user_field": ("feature", "in_reply_to_user_id"),
    "twimg_links_field": ("tokens", "url"),
    "video_links_field": ("tokens", "url"),
    "camelcase_user_handle_field": ("tokens", "user"),
    "tokenized_user_name_field": ("tokens", "user"),
    "conversation_id_field": ("feature", "conversation_id"),
    "place_id_field": ("feature", "place_id"),
    "place_full_name_field": ("tokens", "place"),
    "place_country_code_field": ("feature", "place_country"),
    "profile_geo_country_code_field": ("feature", "profile_geo_country"),
    "profile_geo_region_field": ("feature", "profile_geo_region"),
    "profile_geo_locality_field": ("feature", "profile_geo_locality"),
    "liked_by_user_id_field": ("engagement", "favorite"),
    "normalized_reply_count_greater_than_or_equal_to_field":
        ("feature", "reply_count"),
    "normalized_retweet_count_greater_than_or_equal_to_field":
        ("feature", "retweet_count"),
    "normalized_favorite_count_greater_than_or_equal_to_field":
        ("feature", "fav_count"),
    "composer_source": ("feature", "is_composer_source_camera"),
    "quoted_tweet_id_field": ("feature", "quoted_tweet_id"),
    "quoted_user_id_field": ("feature", "quoted_user_id"),
    "retweeted_by_user_id": ("engagement", "retweet"),
    "replied_to_by_user_id": ("engagement", "reply"),
    "card_lang": ("feature", "card_lang"),
    "named_entity_from_url_field": ("tokens", "entity"),
    "named_entity_from_text_field": ("tokens", "entity"),
    "named_entity_with_type_from_url_field": ("tokens", "entity"),
    "named_entity_with_type_from_text_field": ("tokens", "entity"),
    "directed_at_user_id_field": ("feature", "directed_at_user_id"),
    "space_id_field": ("feature", "space_id"),
    "space_title_field": ("tokens", "space"),
    "space_admin_field": ("tokens", "space"),
    "tokenized_space_admin_field": ("tokens", "space"),
    "camelcase_tokenized_space_admin_field": ("tokens", "space"),
    "tokenized_space_admin_display_name_field": ("tokens", "space"),
    "url_description_field": ("tokens", "url_text"),
    "url_title_field": ("tokens", "url_text"),
    # CSF payloads
    "card_type_csf_field": ("feature", "card_type"),
    "encoded_tweet_features_field": ("packed", None),
    "shared_status_id_csf": ("feature", "shared_status_id"),
    "from_user_id_csf": ("column", "author"),
    "created_at_csf_field": ("column", "created_ts"),
    "id_csf_field": ("column", "tweet_ids"),
    "lat_lon_csf_field": ("feature", "lat"),
    "conversation_id_csf": ("feature", "conversation_id"),
    "quoted_tweet_id_csf": ("feature", "quoted_tweet_id"),
    "quoted_user_id_csf": ("feature", "quoted_user_id"),
    "card_lang_csf": ("feature", "card_lang"),
    "directed_at_user_id_csf": ("feature", "directed_at_user_id"),
    "reference_author_id_csf": ("feature", "reference_author_id"),
    "exclusive_conversation_author_id_csf":
        ("feature", "exclusive_conversation_author_id"),
    "card_uri_csf": ("feature", "card_uri_hash"),
    # encoded feature flags / counters / scores
    "is_retweet_flag": ("feature", "is_retweet"),
    "is_offensive_flag": ("feature", "is_offensive"),
    "has_link_flag": ("feature", "has_url"),
    "has_trend_flag": ("feature", "has_trend"),
    "is_reply_flag": ("feature", "is_reply"),
    "is_sensitive_content": ("feature", "is_sensitive_content"),
    "has_multiple_hashtags_or_trends_flag":
        ("feature", "has_multiple_hashtags_or_trends"),
    "from_verified_account_flag": ("feature", "from_verified_account"),
    "text_score": ("feature", "text_score"),
    "language": ("feature", "tweet_language"),
    "link_language": ("feature", "link_language"),
    "has_image_url_flag": ("feature", "has_image"),
    "has_video_url_flag": ("feature", "has_video"),
    "has_news_url_flag": ("feature", "has_news_url"),
    "has_expando_card_flag": ("feature", "has_expando_card"),
    "has_multiple_media_flag": ("feature", "has_multiple_media"),
    "profile_is_egg_flag": ("feature", "profile_is_egg"),
    "num_mentions": ("feature", "num_mentions"),
    "num_hashtags": ("feature", "num_hashtags"),
    "has_card_flag": ("feature", "has_card"),
    "has_visible_link_flag": ("feature", "has_visible_link"),
    "user_reputation": ("feature", "user_rep"),
    "is_user_spam_flag": ("feature", "is_user_spam"),
    "is_user_nsfw_flag": ("feature", "is_user_nsfw"),
    "is_user_bot_flag": ("feature", "is_user_bot"),
    "is_user_new_flag": ("feature", "is_user_new"),
    "prev_user_tweet_engagement": ("feature",
                                   "prev_user_tweet_engagement"),
    "composer_source_is_camera_flag":
        ("feature", "is_composer_source_camera"),
    "retweet_count": ("feature", "retweet_count"),
    "favorite_count": ("feature", "fav_count"),
    "reply_count": ("feature", "reply_count"),
    "parus_score": ("feature", "parus_score"),
    "visible_token_ratio": ("feature", "visible_token_ratio"),
    "has_quote_flag": ("feature", "has_quote"),
    "from_blue_verified_account_flag":
        ("feature", "from_blue_verified_account"),
    "tweet_signature": ("feature", "tweet_signature"),
    "has_consumer_video_flag": ("feature", "has_consumer_video"),
    "has_pro_video_flag": ("feature", "has_pro_video"),
    "has_vine_flag": ("feature", "has_vine"),
    "has_periscope_flag": ("feature", "has_periscope"),
    "has_native_image_flag": ("feature", "has_native_image"),
    "is_nullcast_flag": ("feature", "is_nullcast"),
    "extended_encoded_tweet_features_field": ("packed", None),
    "embeds_impression_count": ("feature", "embeds_impression_count"),
    "embeds_url_count": ("feature", "embeds_url_count"),
    "video_view_count": ("feature", "video_view_count"),
    "reference_author_id_least_significant_int":
        ("feature", "reference_author_id"),
    "reference_author_id_most_significant_int":
        ("feature", "reference_author_id"),
    "retweet_count_v2": ("feature", "retweet_count_v2"),
    "favorite_count_v2": ("feature", "fav_count_v2"),
    "reply_count_v2": ("feature", "reply_count_v2"),
    "embeds_impression_count_v2":
        ("feature", "embeds_impression_count_v2"),
    "embeds_url_count_v2": ("feature", "embeds_url_count_v2"),
    "video_view_count_v2": ("feature", "video_view_count_v2"),
    "quote_count": ("feature", "quote_count"),
    "label_abusive_flag": ("feature", "label_abusive_flag"),
    "label_abusive_hi_rcl_flag": ("feature", "label_abusive_hi_rcl_flag"),
    "label_dup_content_flag": ("feature", "label_dup_content_flag"),
    "label_nsfw_hi_prc_flag": ("feature", "label_nsfw_hi_prec_flag"),
    "label_nsfw_hi_rcl_flag": ("feature", "label_nsfw_hi_rcl_flag"),
    "label_spam_flag": ("feature", "label_spam_flag"),
    "label_spam_hi_rcl_flag": ("feature", "label_spam_hi_rcl_flag"),
    "weighted_retweet_count": ("feature", "weighted_retweet_count"),
    "weighted_reply_count": ("feature", "weighted_reply_count"),
    "weighted_favorite_count": ("feature", "weighted_fav_count"),
    "weighted_quote_count": ("feature", "weighted_quote_count"),
    "periscope_exists": ("feature", "periscope_exists"),
    "periscope_has_been_featured":
        ("feature", "periscope_has_been_featured"),
    "periscope_is_currently_featured":
        ("feature", "periscope_is_currently_featured"),
    "periscope_is_from_quality_source":
        ("feature", "periscope_is_from_quality_source"),
    "periscope_is_live": ("feature", "periscope_is_live"),
    "is_trending_now_flag": ("feature", "is_trending_now"),
    "decayed_retweet_count": ("feature", "decayed_retweet_count"),
    "decayed_reply_count": ("feature", "decayed_reply_count"),
    "decayed_favorite_count": ("feature", "decayed_fav_count"),
    "decayed_quote_count": ("feature", "decayed_quote_count"),
    "fake_retweet_count": ("feature", "fake_retweet_count"),
    "fake_reply_count": ("feature", "fake_reply_count"),
    "fake_favorite_count": ("feature", "fake_fav_count"),
    "fake_quote_count": ("feature", "fake_quote_count"),
    "last_retweet_since_creation_hrs":
        ("feature", "last_retweet_since_creation_hrs"),
    "last_reply_since_creation_hrs":
        ("feature", "last_reply_since_creation_hrs"),
    "last_favorite_since_creation_hrs":
        ("feature", "last_fav_since_creation_hrs"),
    "last_quote_since_creation_hrs":
        ("feature", "last_quote_since_creation_hrs"),
    "num_hashtags_v2": ("feature", "num_hashtags_v2"),
    "num_mentions_v2": ("feature", "num_mentions_v2"),
    "num_stocks": ("feature", "num_stocks"),
    "blink_retweet_count": ("feature", "blink_retweet_count"),
    "blink_reply_count": ("feature", "blink_reply_count"),
    "blink_favorite_count": ("feature", "blink_fav_count"),
    "blink_quote_count": ("feature", "blink_quote_count"),
    "toxicity_score": ("feature", "toxicity_score"),
    "pblock_score": ("feature", "pblock_score"),
    "experimental_health_model_score_1":
        ("feature", "experimental_health_score_1"),
    "experimental_health_model_score_2":
        ("feature", "experimental_health_score_2"),
    "experimental_health_model_score_3":
        ("feature", "experimental_health_score_3"),
    "experimental_health_model_score_4":
        ("feature", "experimental_health_score_4"),
    "p_spammy_tweet_score": ("feature", "pspammy_score"),
    "p_reported_tweet_score": ("feature", "p_reported_score"),
    "spammy_tweet_content_score": ("feature", "spammy_content_score"),
    # reference-catalogued unused bit ranges
    "extended_feature_unused_bits_0_24_8": ("unused", None),
    "extended_test_feature_unused_bits_4_31_1": ("unused", None),
    "extended_test_feature_unused_bits_7_6_26": ("unused", None),
    "extended_test_feature_unused_bits_12_30_2": ("unused", None),
    "extended_test_feature_unused_bits_13_30_2": ("unused", None),
    "extended_test_feature_unused_bits_14_10_22": ("unused", None),
    "extended_test_feature_unused_bits_16": ("unused", None),
    "extended_test_feature_unused_bits_17": ("unused", None),
    "extended_test_feature_unused_bits_18": ("unused", None),
    "extended_test_feature_unused_bits_19": ("unused", None),
    "extended_test_feature_unused_bits_20": ("unused", None),
}
_COUNT_FIELDS = (
    "fav_count", "reply_count", "retweet_count", "quote_count",
    "bookmark_count", "fav_count_v2", "reply_count_v2", "retweet_count_v2",
    "prev_user_tweet_engagement", "num_likes_root", "num_replies_root",
    "video_view_count", "embeds_impression_count", "embeds_url_count",
)


@dataclasses.dataclass(frozen=True)
class EarlybirdConfig:
    capacity: int = 1 << 16  # ring-buffer tweets (prod: ~7 days sharded)
    max_tokens: int = 32
    num_features: int = len(DOC_FEATURES)


class EarlybirdIndex(NamedTuple):
    """Device-resident ring buffer of recent tweets."""

    tokens: jnp.ndarray  # [T, L] int32, PAD_ID padded
    author: jnp.ndarray  # [T] int32 (PAD_ID = empty slot)
    created_ts: jnp.ndarray  # [T] int32
    features: jnp.ndarray  # [T, F] float32
    tweet_ids: jnp.ndarray  # [T] int32 external ids
    write_pos: jnp.ndarray  # [] int32 next ring slot

    @property
    def capacity(self) -> int:
        return self.author.shape[0]


def init_index(config: EarlybirdConfig) -> EarlybirdIndex:
    T, L, F = config.capacity, config.max_tokens, config.num_features
    return EarlybirdIndex(
        tokens=jnp.full((T, L), PAD_ID, jnp.int32),
        author=jnp.full((T,), PAD_ID, jnp.int32),
        created_ts=jnp.zeros((T,), jnp.int32),
        features=jnp.zeros((T, F), jnp.float32),
        tweet_ids=jnp.full((T,), PAD_ID, jnp.int32),
        write_pos=jnp.int32(0),
    )


def ingest(
    index: EarlybirdIndex,
    tokens: jnp.ndarray,  # [B, L]
    authors: jnp.ndarray,  # [B]
    created_ts: jnp.ndarray,  # [B]
    features: jnp.ndarray,  # [B, F]
    tweet_ids: jnp.ndarray,  # [B]
) -> EarlybirdIndex:
    """Append a tweet batch at the ring position (the Kafka consumer path,
    ``partition/EarlybirdKafkaConsumer.java``; single-writer semantics)."""
    B = authors.shape[0]
    T = index.capacity
    slots = (index.write_pos + jnp.arange(B)) % T
    return EarlybirdIndex(
        tokens=index.tokens.at[slots].set(tokens),
        author=index.author.at[slots].set(authors),
        created_ts=index.created_ts.at[slots].set(created_ts),
        features=index.features.at[slots].set(features),
        tweet_ids=index.tweet_ids.at[slots].set(tweet_ids),
        write_pos=(index.write_pos + B) % T,
    )


# -- relevance scoring -------------------------------------------------------


class RelevanceParams(NamedTuple):
    """Request-scoped ranking parameters (≡ ThriftRankingParams /
    ``earlybird/common/ranking/`` — each search request carries its own
    weights, boosts, and demotions; nothing is hardcoded in the scorer).

    The text block (``text_weight``/``bm25_k1``/``bm25_b``/
    ``proximity_weight``) drives :func:`text_relevance` — the Lucene
    text-score analog that ``FeatureBasedScoringFunction.java:69`` starts
    from (``luceneScore`` + boosts structure).
    """

    weights: jnp.ndarray  # [F] per-doc-feature linear weights
    recency_weight: jnp.ndarray = jnp.float32(0.0)  # boost × decay(now-ts)
    recency_half_life_s: jnp.ndarray = jnp.float32(6 * 3600.0)
    reply_demotion: jnp.ndarray = jnp.float32(1.0)  # multiplier if is_reply
    retweet_demotion: jnp.ndarray = jnp.float32(1.0)
    language_boost: jnp.ndarray = jnp.float32(0.0)  # added if language_match
    # text relevance (tf/idf saturation + length norm + term proximity)
    text_weight: jnp.ndarray = jnp.float32(1.0)
    bm25_k1: jnp.ndarray = jnp.float32(1.2)
    bm25_b: jnp.ndarray = jnp.float32(0.75)
    proximity_weight: jnp.ndarray = jnp.float32(0.5)


_DEFAULT_WEIGHT_TABLE = {
    "fav_count": 0.4, "reply_count": 0.2, "retweet_count": 0.3,
    "quote_count": 0.2, "bookmark_count": 0.3, "text_score": 1.0,
    "user_rep": 0.01, "has_image": 0.1, "has_video": 0.1, "has_card": 0.05,
    "has_url": 0.05, "is_reply": -0.05, "is_retweet": -0.1,
    "parus_score": 0.5, "from_verified_account": 0.05,
    "prev_user_tweet_engagement": 0.1, "language_match": 0.1,
}


def default_relevance_params() -> RelevanceParams:
    w = np.zeros(len(DOC_FEATURES), np.float32)
    for n, v in _DEFAULT_WEIGHT_TABLE.items():
        w[DOC_FEATURE_INDEX[n]] = v
    return RelevanceParams(weights=jnp.asarray(w))


_COUNT_MASK = np.asarray(
    [n in _COUNT_FIELDS for n in DOC_FEATURES], np.bool_
)


def linear_score(
    features: jnp.ndarray,
    relevance: RelevanceParams,
    created_ts: Optional[jnp.ndarray] = None,
    now: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """≡ ``LinearScoringFunction.java:24`` — dot of doc features and the
    request's ranking-parameter weights (log1p'd counts for stability),
    plus recency boost and reply/retweet demotions
    (``FeatureBasedScoringFunction.java:69`` boost structure)."""
    mask = jnp.asarray(_COUNT_MASK)
    x = jnp.where(mask, jnp.log1p(jnp.maximum(features, 0.0)), features)
    score = jnp.einsum("...f,f->...", x, relevance.weights)
    if created_ts is not None and now is not None:
        age = jnp.maximum(now - created_ts, 0).astype(jnp.float32)
        score = score + relevance.recency_weight * jnp.exp2(
            -age / relevance.recency_half_life_s
        )
    is_reply = features[..., DOC_FEATURE_INDEX["is_reply"]] > 0
    is_rt = features[..., DOC_FEATURE_INDEX["is_retweet"]] > 0
    # demotion d<1 must always rank DOWN: subtract |score|·(1-d), which
    # equals score·d for positive scores and still decreases negative ones
    # (a bare multiply would *raise* a negative score)
    def demote(s, flag, d):
        return s - jnp.where(flag, jnp.abs(s) * (1.0 - d), 0.0)

    score = demote(score, is_reply, relevance.reply_demotion)
    score = demote(score, is_rt, relevance.retweet_demotion)
    lang = features[..., DOC_FEATURE_INDEX["language_match"]] > 0
    return score + jnp.where(lang, relevance.language_boost, 0.0)


def text_relevance(
    tokens: jnp.ndarray,  # [T, L] position-indexed token ids (PAD padded)
    query_tokens: jnp.ndarray,  # [Qt] (PAD padded)
    live: jnp.ndarray,  # [T] bool — slots that hold a real document
    *,
    k1: jnp.ndarray = jnp.float32(1.2),
    b: jnp.ndarray = jnp.float32(0.75),
    proximity_weight: jnp.ndarray = jnp.float32(0.5),
    field_weight: jnp.ndarray = jnp.float32(1.0),
    corpus_stats: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """[T] Lucene-analog text score from the position-indexed token arrays.

    ≡ the text component ``FeatureBasedScoringFunction.java:69`` builds on
    (``luceneScore``): per-term BM25 — saturated term frequency with
    document-length normalization and corpus idf — summed over query terms,
    plus a term-proximity boost (minimal pairwise distance between
    consecutive query terms; Lucene's span/phrase flavor). Everything is
    computed from the live index state in one vectorized pass: tf by
    position-mask reduction, df by live-doc reduction, proximity by a
    static [L, L] distance table — no inverted lists, no positions decode.
    """
    q_valid = query_tokens != PAD_ID  # [Qt]
    hit = (tokens[:, :, None] == query_tokens[None, None, :]) & \
        q_valid[None, None, :]  # [T, L, Qt]
    tf = jnp.sum(hit, axis=1).astype(jnp.float32)  # [T, Qt]
    doclen = jnp.sum(tokens != PAD_ID, axis=1).astype(jnp.float32)  # [T]
    if corpus_stats is not None:
        # sharded path: GLOBAL corpus statistics psum'd over the partition
        # axis (the reference scores with per-partition Lucene idf; the
        # one-program mesh makes exact global idf free)
        df, sum_doclen, n_live = corpus_stats
        n_live = jnp.maximum(n_live, 1.0)
        avglen = jnp.maximum(sum_doclen / n_live, 1.0)
    else:
        livef = live.astype(jnp.float32)
        n_live = jnp.maximum(jnp.sum(livef), 1.0)
        avglen = jnp.maximum(jnp.sum(doclen * livef) / n_live, 1.0)
        df = jnp.sum((tf > 0) & live[:, None], axis=0).astype(jnp.float32)
    idf = jnp.log1p((n_live - df + 0.5) / (df + 0.5))  # [Qt]
    denom = tf + k1 * (1.0 - b + b * doclen[:, None] / avglen)
    per_term = idf[None, :] * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
    score = jnp.sum(jnp.where(q_valid[None, :], per_term, 0.0), axis=1)  # [T]

    # proximity: mean over consecutive valid term pairs of the minimal
    # position distance; docs containing a pair adjacently get the full
    # boost, distant/absent pairs decay to zero
    Qt = query_tokens.shape[0]
    L = tokens.shape[1]
    if Qt >= 2:
        pos = jnp.arange(L)
        dist = jnp.abs(pos[:, None] - pos[None, :]).astype(jnp.float32)
        boosts = []
        pair_valid = []
        for qi in range(Qt - 1):
            a = hit[:, :, qi]  # [T, L]
            bmask = hit[:, :, qi + 1]
            pair = a[:, :, None] & bmask[:, None, :]  # [T, L, L]
            d = jnp.min(
                jnp.where(pair, dist[None, :, :], jnp.inf), axis=(1, 2))
            boosts.append(jnp.where(jnp.isfinite(d), 1.0 / d.clip(1.0), 0.0))
            pair_valid.append(q_valid[qi] & q_valid[qi + 1])
        boost = jnp.stack(boosts, axis=1)  # [T, Qt-1]
        pv = jnp.stack(pair_valid).astype(jnp.float32)  # [Qt-1]
        n_pairs = jnp.maximum(jnp.sum(pv), 1.0)
        score = score + proximity_weight * (
            jnp.sum(boost * pv[None, :], axis=1) / n_pairs)
    return field_weight * score


def text_corpus_stats(
    tokens: jnp.ndarray, query_tokens: jnp.ndarray, live: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(df [Qt], Σ doclen [], n_live []) — the corpus statistics
    :func:`text_relevance` needs; psum these over the partition axis for
    exact global idf in the sharded path."""
    q_valid = query_tokens != PAD_ID
    contains = jnp.any(
        (tokens[:, :, None] == query_tokens[None, None, :])
        & q_valid[None, None, :],
        axis=1,
    )  # [T, Qt]
    doclen = jnp.sum(tokens != PAD_ID, axis=1).astype(jnp.float32)
    livef = live.astype(jnp.float32)
    df = jnp.sum(contains & live[:, None], axis=0).astype(jnp.float32)
    return df, jnp.sum(doclen * livef), jnp.sum(livef)


def text_relevance_reference(
    docs: Sequence[Sequence[int]],
    query_terms: Sequence[int],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    proximity_weight: float = 0.5,
) -> np.ndarray:
    """Plain-Python oracle for :func:`text_relevance` (parity tests)."""
    import math

    n = max(len(docs), 1)
    avglen = max(sum(len(d) for d in docs) / n, 1.0)
    df = {t: sum(1 for d in docs if t in d) for t in query_terms}
    out = np.zeros(len(docs), np.float32)
    for i, d in enumerate(docs):
        s = 0.0
        for t in query_terms:
            tf = sum(1 for w in d if w == t)
            idf = math.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
            denom = tf + k1 * (1 - b + b * len(d) / avglen)
            s += idf * tf * (k1 + 1) / max(denom, 1e-9)
        if len(query_terms) >= 2:
            pair_boosts = []
            for a, bb in zip(query_terms, query_terms[1:]):
                pa = [j for j, w in enumerate(d) if w == a]
                pb = [j for j, w in enumerate(d) if w == bb]
                if pa and pb:
                    dmin = min(abs(x - y) for x in pa for y in pb)
                    pair_boosts.append(1.0 / max(dmin, 1))
                else:
                    pair_boosts.append(0.0)
            s += proximity_weight * sum(pair_boosts) / len(pair_boosts)
        out[i] = s
    return out


class SearchQuery(NamedTuple):
    """The serialized query tree's conjunctive serving form
    (≡ ``queryparser``/SerializedQuery operators actually issued by the
    products): required terms (AND/OR), excluded terms (NOT), and quoted
    phrases (position-consecutive token runs, each required)."""

    tokens: jnp.ndarray  # [Qt] int32 (PAD for unused)
    require_all: bool  # AND vs OR semantics
    min_ts: jnp.ndarray  # [] int32
    max_ts: jnp.ndarray  # [] int32
    # in-network: sorted follow list (PAD padded); empty ⇒ no author filter
    followed_authors: Optional[jnp.ndarray] = None
    # NOT terms: a doc containing any is excluded ([Qe] int32, PAD padded)
    exclude_tokens: Optional[jnp.ndarray] = None
    # quoted phrases: [Pn, Pl] int32, PAD padded rows; every non-empty
    # phrase must appear as consecutive tokens
    phrases: Optional[jnp.ndarray] = None
    # tweet-id cursor window (exclusive), pushed into the index scan like
    # Earlybird's SINCE_ID/MAX_ID operators
    # (``FollowingEarlybirdQueryTransformer.scala:40-52``); None ⇒ open end
    min_id: Optional[jnp.ndarray] = None  # [] int32 — ids strictly greater
    max_id: Optional[jnp.ndarray] = None  # [] int32 — ids strictly smaller
    # -- field operators (``queryparser`` / ``common/query`` r5) -----------
    # from: author set ([Fa] int32, PAD padded) — distinct from the
    # in-network follow filter so ``from:<id>`` and ``from:follows``
    # compose; both AND into the author constraint
    from_authors: Optional[jnp.ndarray] = None
    # scored-facet floors / ceilings over the doc-feature columns
    # (min_faves:/min_retweets:/… and -filter: negations): [n_doc] f32,
    # -inf / +inf for unconstrained columns
    feature_min_bounds: Optional[jnp.ndarray] = None
    feature_max_bounds: Optional[jnp.ndarray] = None
    # any-of filter groups (filter:media = image OR video OR …): [G, n_doc]
    # 0/1 — a doc passes iff every group has SOME flagged column ≥ 0.5
    feature_any_groups: Optional[jnp.ndarray] = None
    # lang: operator — doc's tweet_language column equals this id
    lang_id: Optional[jnp.ndarray] = None


def phrase_match(tokens: jnp.ndarray, phrases: jnp.ndarray) -> jnp.ndarray:
    """[T] — does each doc contain every non-empty phrase consecutively?

    ``tokens`` [T, L] position-indexed token ids; ``phrases`` [Pn, Pl].
    Builds the [T, L-Pl+1, Pl] sliding-window view with static shifts (no
    gather) and reduces on the VPU.
    """
    T, L = tokens.shape
    Pn, Pl = phrases.shape
    Pl = min(Pl, L)
    phrases = phrases[:, :Pl]
    # pad the doc so every start position 0..L-1 has a full window — a
    # phrase SHORTER than the padded Pl must still match at the doc's tail
    # (padded window slots compare against PAD phrase slots, which the
    # validity mask ignores; real phrase tokens never equal PAD)
    padded = jnp.concatenate(
        [tokens, jnp.full((T, Pl - 1), PAD_ID, tokens.dtype)], axis=1
    )
    windows = jnp.stack(
        [padded[:, j:L + j] for j in range(Pl)], axis=-1
    )  # [T, L, Pl]
    valid = phrases != PAD_ID  # [Pn, Pl]
    nonempty = jnp.any(valid, axis=1)  # [Pn]
    # [T, W, Pn, Pl]: window position j matches phrase token j (or slot unused)
    eq = windows[:, :, None, :] == phrases[None, None, :, :]
    ok = jnp.all(eq | ~valid[None, None, :, :], axis=-1)  # [T, W, Pn]
    found = jnp.any(ok, axis=1)  # [T, Pn]
    return jnp.all(found | ~nonempty[None, :], axis=1)  # [T]


def _author_in_set(author: jnp.ndarray, sorted_follows: jnp.ndarray) -> jnp.ndarray:
    """Membership mask against the (PAD-padded) follow list.

    Compare-all, not searchsorted: follow lists are ≤ a few hundred wide,
    and jnp.searchsorted lowers to a sequential scan on TPU (measured
    280 ms vs 3 ms for the [262k]×64 in-network mask)."""
    valid = sorted_follows != PAD_ID
    return jnp.any(
        (author[:, None] == sorted_follows[None, :]) & valid[None, :],
        axis=-1,
    )


def match_mask(index: EarlybirdIndex, query: SearchQuery) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ok [T], overlap [T]) — the boolean query-tree evaluation.

    ok = (terms AND/OR) ∧ phrases ∧ ¬excluded ∧ time-window ∧ author-set.
    overlap = matched-term ratio (the text-score contribution).
    """
    q_valid = query.tokens != PAD_ID  # [Qt]
    # [T, Qt]: does tweet contain query token?
    hit = jnp.any(
        index.tokens[:, :, None] == query.tokens[None, None, :], axis=1
    )
    hit = hit & q_valid[None, :]
    n_q = jnp.maximum(jnp.sum(q_valid), 1)
    has_terms = jnp.any(q_valid)
    if query.require_all:
        match = jnp.sum(hit, axis=1) == n_q
    else:
        match = jnp.any(hit, axis=1)
    # an empty term set is a match-all recency query (the recap/timeline
    # fetch issues author+time-window-only queries)
    match = match | ~has_terms

    if query.phrases is not None:
        match &= phrase_match(index.tokens, query.phrases)
    if query.exclude_tokens is not None:
        ex_valid = query.exclude_tokens != PAD_ID
        ex_hit = jnp.any(
            (index.tokens[:, :, None] == query.exclude_tokens[None, None, :])
            & ex_valid[None, None, :],
            axis=(1, 2),
        )
        match &= ~ex_hit

    ok = (
        match
        & (index.author != PAD_ID)
        & (index.created_ts >= query.min_ts)
        & (index.created_ts <= query.max_ts)
    )
    if query.min_id is not None:
        ok &= index.tweet_ids > query.min_id
    if query.max_id is not None:
        ok &= index.tweet_ids < query.max_id
    if query.followed_authors is not None:
        ok &= _author_in_set(index.author, query.followed_authors)
    if query.from_authors is not None:
        ok &= _author_in_set(index.author, query.from_authors)
    # field operators over the doc-feature columns (lang:, filter:,
    # min_faves:-style scored facets) — pure VPU compares, fused into the
    # same scan pass as the term match
    if query.feature_min_bounds is not None:
        ok &= jnp.all(
            index.features >= query.feature_min_bounds[None, :], axis=1)
    if query.feature_max_bounds is not None:
        ok &= jnp.all(
            index.features <= query.feature_max_bounds[None, :], axis=1)
    if query.feature_any_groups is not None:
        grp_hit = jnp.any(
            (index.features[:, None, :] >= 0.5)
            & (query.feature_any_groups[None, :, :] > 0),
            axis=2)  # [T, G]
        nonempty = jnp.any(query.feature_any_groups > 0, axis=1)  # [G]
        ok &= jnp.all(grp_hit | ~nonempty[None, :], axis=1)
    if query.lang_id is not None:
        lang_col = DOC_FEATURE_INDEX["tweet_language"]
        ok &= index.features[:, lang_col].astype(jnp.int32) == query.lang_id
    return ok, jnp.sum(hit, axis=1) / n_q


def search(
    index: EarlybirdIndex,
    query: SearchQuery,
    *,
    max_results: int,
    relevance: Optional[RelevanceParams] = None,
    model_score_fn=None,
    extra_mask: Optional[jnp.ndarray] = None,
    rank_by: str = "relevance",
    corpus_stats: Optional[Tuple] = None,
    approx_top_k: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-corpus scan → (tweet_ids[X], scores[X]).

    ``relevance`` carries the request-scoped ranking params (weights,
    boosts, demotions); ``model_score_fn(features [T, F]) -> [T]``
    overrides the linear scorer (≡ ``ModelBasedScoringFunction`` /
    ``TensorflowBasedScoringFunction`` plugging the light ranker in-index);
    ``extra_mask`` [T] ANDs caller-side doc filters into the match (e.g.
    the ingester's author-state mask — the collector-level filter hook).
    ``rank_by="recency"`` orders by created_ts descending — the timeline
    products' rankingMode=Recency (``FollowingEarlybirdQueryTransformer``),
    exact integer ordering with no float scoring at all.
    """
    if rank_by == "recency":
        ok, _ = match_mask(index, query)
        if extra_mask is not None:
            ok = ok & extra_mask
        sentinel = jnp.iinfo(jnp.int32).min
        key = jnp.where(ok, index.created_ts, sentinel)
        k = min(max_results, key.shape[0])
        top_ts, idx = jax.lax.top_k(key, k)
        found = top_ts > sentinel
        ids = jnp.where(found, index.tweet_ids[idx], PAD_ID)
        return ids, jnp.where(found, top_ts.astype(jnp.float32), -jnp.inf)
    if relevance is None:
        relevance = default_relevance_params()
    ok, overlap = match_mask(index, query)
    if extra_mask is not None:
        ok = ok & extra_mask

    if model_score_fn is not None:
        score = model_score_fn(index.features)
    else:
        score = linear_score(
            index.features, relevance,
            created_ts=index.created_ts, now=query.max_ts,
        )
    # Lucene-analog text component: BM25 tf/idf + length norm + proximity
    # over the position-indexed token arrays (replaces the r2 token-overlap
    # ratio; ``FeatureBasedScoringFunction.java:69`` luceneScore structure)
    score = score + relevance.text_weight * text_relevance(
        index.tokens, query.tokens, index.author != PAD_ID,
        k1=relevance.bm25_k1, b=relevance.bm25_b,
        proximity_weight=relevance.proximity_weight,
        corpus_stats=corpus_stats,
    )

    score = jnp.where(ok, score, -jnp.inf)
    k = min(max_results, score.shape[0])
    if approx_top_k and k < score.shape[0]:
        # serving scans rank ~10² winners out of ~10⁵⁻⁶ docs: exact
        # lax.top_k lowers to a full sort on TPU (the collector's
        # priority-queue analog costs O(T log T) there); approx_max_k is
        # the TPU-shaped collector — partial per-block reductions at a
        # recall target, ~10× faster at earlybird shapes.
        top_scores, idx = jax.lax.approx_max_k(
            score, k, recall_target=0.98)
    else:
        top_scores, idx = jax.lax.top_k(score, k)
    ids = jnp.where(jnp.isfinite(top_scores), index.tweet_ids[idx], PAD_ID)
    return ids, top_scores


def search_in_network_batch(
    index: EarlybirdIndex,
    query: SearchQuery,
    follows_b: jnp.ndarray,  # [R, FW] int32 per-user follow sets (PAD pad)
    *,
    max_results: int,
    relevance: Optional[RelevanceParams] = None,
    model_score_fn=None,
    corpus_stats: Optional[Tuple] = None,
    approx_top_k: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R users' in-network scans in one program → (ids [R, X], scores).

    The timeline products issue the SAME query for every user except the
    author filter (``FollowingEarlybirdQueryTransformer``), so the doc
    scoring (linear features + BM25 text) is user-independent: compute it
    ONCE over the corpus, then per user apply the follow mask and take the
    top-K — R× less scoring work than vmapping :func:`search`.
    """
    if relevance is None:
        relevance = default_relevance_params()
    ok_base, _ = match_mask(index, query)
    if model_score_fn is not None:
        base = model_score_fn(index.features)
    else:
        base = linear_score(
            index.features, relevance,
            created_ts=index.created_ts, now=query.max_ts,
        )
    base = base + relevance.text_weight * text_relevance(
        index.tokens, query.tokens, index.author != PAD_ID,
        k1=relevance.bm25_k1, b=relevance.bm25_b,
        proximity_weight=relevance.proximity_weight,
        corpus_stats=corpus_stats,
    )
    base = jnp.where(ok_base, base, -jnp.inf)  # [T]
    k = min(max_results, base.shape[0])

    def one(follows):
        in_net = _author_in_set(index.author, follows)
        s = jnp.where(in_net, base, -jnp.inf)
        if approx_top_k and k < s.shape[0]:
            top, idx = jax.lax.approx_max_k(s, k, recall_target=0.98)
        else:
            top, idx = jax.lax.top_k(s, k)
        return jnp.where(jnp.isfinite(top), index.tweet_ids[idx], PAD_ID), top

    return jax.vmap(one)(follows_b)


def search_sharded(
    mesh,
    index: EarlybirdIndex,  # tweet-axis sharded P('model') on [T] arrays
    query: SearchQuery,
    *,
    max_results: int,
    relevance: Optional[RelevanceParams] = None,
    model_score_fn=None,
    rank_by: str = "relevance",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Partitioned scan + root merge (≡ ``earlybird_root`` fan-out).

    Supports the full query surface (phrases, negation) and model-based
    scoring: ``model_score_fn`` runs per shard on the local [T/S, F] block.
    """
    from jax.sharding import PartitionSpec as P

    X = max_results

    def local(tokens, author, ts, feats, tids):
        li = EarlybirdIndex(
            tokens, author, ts, feats, tids, jnp.int32(0)
        )
        if rank_by == "recency":
            # Merge on exact int32 timestamp keys: float32 ulp at epoch-
            # second magnitude is ~128 s, so a float-score merge could
            # misorder tweets under ~2 minutes apart across shards.
            ok, _ = match_mask(li, query)
            sentinel = jnp.iinfo(jnp.int32).min
            key = jnp.where(ok, li.created_ts, sentinel)
            k = min(X, key.shape[0])
            top_ts, idx = jax.lax.top_k(key, k)
            ids = jnp.where(top_ts > sentinel, li.tweet_ids[idx], PAD_ID)
            all_ids = jax.lax.all_gather(ids, MODEL_AXIS, axis=0, tiled=True)
            all_keys = jax.lax.all_gather(
                top_ts, MODEL_AXIS, axis=0, tiled=True)
            top, midx = jax.lax.top_k(all_keys, X)
            found = top > sentinel
            return (
                jnp.where(found, all_ids[midx], PAD_ID),
                jnp.where(found, top.astype(jnp.float32), -jnp.inf),
            )
        # global text-corpus statistics: per-shard partials psum over the
        # partition axis so idf/length-norm match the single-index scan
        # exactly (the reference's per-partition Lucene idf drifts here)
        df_l, len_l, n_l = text_corpus_stats(
            tokens, query.tokens, author != PAD_ID)
        stats = (
            jax.lax.psum(df_l, MODEL_AXIS),
            jax.lax.psum(len_l, MODEL_AXIS),
            jax.lax.psum(n_l, MODEL_AXIS),
        )
        ids, scores = search(
            li, query, max_results=X, relevance=relevance,
            model_score_fn=model_score_fn, rank_by=rank_by,
            corpus_stats=stats,
        )
        all_ids = jax.lax.all_gather(ids, MODEL_AXIS, axis=0, tiled=True)
        all_scores = jax.lax.all_gather(scores, MODEL_AXIS, axis=0, tiled=True)
        top, idx = jax.lax.top_k(all_scores, X)
        return jnp.where(jnp.isfinite(top), all_ids[idx], PAD_ID), top

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None), P(MODEL_AXIS), P(MODEL_AXIS),
            P(MODEL_AXIS, None), P(MODEL_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # all_gather output is replicated over 'model'
    )
    return fn(
        index.tokens, index.author, index.created_ts,
        index.features, index.tweet_ids,
    )


# -- facets (the earlybird facets endpoint) -----------------------------------


def facet_counts(
    facet_ids: jnp.ndarray,  # [T, Fc] int32 per-doc facet ids (PAD padded)
    match: jnp.ndarray,  # [T] bool from match_mask
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k facets among matching docs → (facet_ids[k], counts[k]).

    ≡ the facets service (``earlybird/search/facets/``): count hashtag /
    mention / link facets over the matching doc set. TPU shape: mask →
    flat sort → run-length boundaries → segment-max of run length via
    sorted order (no hash map).
    """
    flat = jnp.where(match[:, None], facet_ids, PAD_ID).reshape(-1)
    s = jnp.sort(flat)  # PAD sorts last
    n = s.shape[0]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )  # run starts
    idx = jnp.arange(n)
    start_pos = jnp.where(start, idx, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, start_pos)  # [n]
    # run length at last element of each run = idx - run_start + 1
    is_end = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])
    length = idx - run_start + 1
    cand = jnp.where(is_end & (s != PAD_ID), length, 0)
    top_counts, pos = jax.lax.top_k(cand, k)
    ids = jnp.where(top_counts > 0, s[pos], PAD_ID)
    return ids, top_counts


# -- ingester (the tweet → index-document pipeline) ----------------------------


@dataclasses.dataclass
class RawTweet:
    """Ingester input (≡ the TweetEventData the ingester consumes,
    ``src/java/com/twitter/search/ingester/``)."""

    tweet_id: int
    author_id: int
    created_ts: int
    text: str
    language: str = "en"
    fav_count: int = 0
    reply_count: int = 0
    retweet_count: int = 0
    quote_count: int = 0
    bookmark_count: int = 0
    has_image: bool = False
    has_video: bool = False
    has_card: bool = False
    is_reply: bool = False
    is_retweet: bool = False
    is_quote: bool = False
    user_rep: float = 0.0
    author_following: int = 0
    author_tweet_count: int = 0
    author_is_protected: bool = False
    parus_score: float = 0.0
    from_verified_account: bool = False
    from_blue_verified_account: bool = False
    is_trend_tweet: bool = False
    num_likes_root: int = 0
    num_replies_root: int = 0
    conversation_depth: int = 0
    is_self_thread: bool = False
    prev_user_tweet_engagement: float = 0.0
    # r3 schema-breadth fields (ThriftSearchResultFeatures parity)
    video_view_count: int = 0
    embeds_impression_count: int = 0
    embeds_url_count: int = 0
    has_native_image: bool = False
    has_consumer_video: bool = False
    has_pro_video: bool = False
    is_composer_source_camera: bool = False
    has_news_url: bool = False
    has_expanded_url: bool = False
    author_followers: int = 0
    author_account_age_days: float = 0.0
    is_user_spam: bool = False
    is_user_nsfw: bool = False
    is_user_bot: bool = False
    is_nullcast: bool = False
    toxicity_score: float = 0.0
    pblock_score: float = 0.0
    pspammy_score: float = 0.0
    is_offensive: bool = False
    is_sensitive_content: bool = False
    language_confidence: float = 1.0


def _hash_term(term: str) -> int:
    h1, _ = murmur3_x64_128(term.encode("utf-8"))
    return int(np.int32(h1 & 0x7FFFFFFF))


_URL_SHORTENERS = frozenset(
    {"t.co", "bit.ly", "tinyurl.com", "goo.gl", "ow.ly", "buff.ly"})
_MEDIA_DOMAINS = frozenset(
    {"pic.twitter.com", "youtube.com", "youtu.be", "twitch.tv",
     "instagram.com", "vimeo.com"})


def build_documents(
    tweets: Sequence[RawTweet],
    config: EarlybirdConfig,
    *,
    ui_language: str = "en",
    now: Optional[int] = None,
    max_facets: int = 8,
    url_reputation: Optional[Mapping] = None,  # domain -> rep [0,1]
    card_store: Optional[Mapping] = None,  # tweet_id -> card type str
):
    """Ingester analog: raw tweets → (tokens [B,L], authors, ts, features
    [B,F], tweet_ids, facets [B,Fc]).

    Text analysis (tokenize + hashtag/mention/url facet extraction +
    text-quality score) and the full 30-field doc-feature fill happen here,
    host-side, mirroring the ingester's TwitterTextTokenizer + feature
    extraction stages; the output arrays go straight into :func:`ingest`.
    """
    B, L, F = len(tweets), config.max_tokens, config.num_features
    tokens = np.full((B, L), int(PAD_ID), np.int32)
    authors = np.empty(B, np.int32)
    ts = np.empty(B, np.int32)
    feats = np.zeros((B, F), np.float32)
    ids = np.empty(B, np.int32)
    facets = np.full((B, max_facets), int(PAD_ID), np.int32)
    from the_algorithm_tpu.search import analyzer as anl

    for i, t in enumerate(tweets):
        tokens[i] = tokenize(t.text, L)
        authors[i] = t.author_id
        ts[i] = t.created_ts
        ids[i] = t.tweet_id
        toks = anl.analyze(t.text)
        words = [tk.text for tk in toks
                 if tk.cls in (anl.TokenClass.WORD, anl.TokenClass.HASHTAG,
                               anl.TokenClass.MENTION)]
        ents = anl.extract_entities(t.text)
        urls = ents["urls"]
        facet_terms = (
            [f"#{h}" for h in ents["hashtags"]]
            + [f"@{m}" for m in ents["mentions"]]
            + ents["domains"]
        )
        for j, f in enumerate(facet_terms[:max_facets]):
            facets[i, j] = _hash_term(f)
        n_words = max(len(words), 1)
        uniq_ratio = len(set(words)) / n_words
        cjk_count = sum(
            1 for tk in toks if tk.cls is anl.TokenClass.CJK_BIGRAM)
        raw = t.text
        letters = [c for c in raw if c.isalpha()]
        caps_ratio = (sum(1 for c in letters if c.isupper())
                      / max(len(letters), 1))
        emoji_count = sum(1 for c in raw if ord(c) >= 0x1F000)
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        total = max(sum(counts.values()), 1)
        entropy = -sum((c / total) * np.log2(c / total)
                       for c in counts.values())
        # URL/card resolution (the ingester's resolve stage; the resolver
        # hooks let a deployment wire live stores)
        domains = ents["domains"]
        domain_rep = max((float(url_reputation.get(d, 0.5))
                          for d in domains), default=0.0) \
            if url_reputation is not None else (0.5 if domains else 0.0)
        shortened = any(d in _URL_SHORTENERS for d in domains)
        card = card_store.get(t.tweet_id) if card_store is not None else None
        row = {
            "fav_count": t.fav_count, "reply_count": t.reply_count,
            "retweet_count": t.retweet_count, "quote_count": t.quote_count,
            "bookmark_count": t.bookmark_count, "created_ts": t.created_ts,
            # text score: length & diversity heuristic (the ingester's
            # text-quality stage; any richer scorer slots in here)
            "text_score": min(n_words / 16.0, 1.0) * uniq_ratio,
            "user_rep": t.user_rep,
            "has_image": t.has_image, "has_video": t.has_video,
            "has_card": t.has_card,
            "has_url": bool(urls),
            "is_reply": t.is_reply, "is_retweet": t.is_retweet,
            "is_quote": t.is_quote,
            "num_hashtags": len(ents["hashtags"]),
            "num_mentions": len(ents["mentions"]),
            "link_language": _hash_term(t.language) % 1000,
            "language_match": t.language == ui_language,
            "prev_user_tweet_engagement": t.prev_user_tweet_engagement,
            "from_verified_account": t.from_verified_account,
            "is_trend_tweet": t.is_trend_tweet,
            "has_multiple_media": int(t.has_image) + int(t.has_video) > 1,
            "tweet_age_hours": max(((now or t.created_ts) - t.created_ts), 0)
            / 3600.0,
            "parus_score": t.parus_score,
            "from_blue_verified_account": t.from_blue_verified_account,
            "num_likes_root": t.num_likes_root,
            "num_replies_root": t.num_replies_root,
            "conversation_depth": t.conversation_depth,
            "is_self_thread": t.is_self_thread,
            # r3 schema-breadth fill
            "fav_count_v2": t.fav_count,  # v2 = decayed; equal at ingest
            "reply_count_v2": t.reply_count,
            "retweet_count_v2": t.retweet_count,
            "video_view_count": t.video_view_count,
            "embeds_impression_count": t.embeds_impression_count,
            "embeds_url_count": t.embeds_url_count,
            "has_quote": t.is_quote,
            "word_count": len(words),
            "visible_token_ratio": uniq_ratio,
            "language_confidence": t.language_confidence,
            "num_stocks": len(ents["cashtags"]),
            "has_multiple_hashtags_or_trends":
                len(ents["hashtags"]) > 1 or t.is_trend_tweet,
            "has_native_image": t.has_native_image or t.has_image,
            "has_consumer_video": t.has_consumer_video,
            "has_pro_video": t.has_pro_video,
            "is_composer_source_camera": t.is_composer_source_camera,
            "has_news_url": t.has_news_url,
            "has_expanded_url": t.has_expanded_url or bool(urls),
            "has_visible_link": bool(urls),
            "author_followers_log": float(np.log1p(t.author_followers)),
            "author_account_age_days": t.author_account_age_days,
            "is_user_spam": t.is_user_spam,
            "is_user_nsfw": t.is_user_nsfw,
            "is_user_bot": t.is_user_bot,
            "is_nullcast": t.is_nullcast,
            "toxicity_score": t.toxicity_score,
            "pblock_score": t.pblock_score,
            "pspammy_score": t.pspammy_score,
            "is_offensive": t.is_offensive,
            "is_sensitive_content": t.is_sensitive_content,
            # r4 analyzer/resolver-derived breadth
            "num_urls": len(urls),
            "has_shortened_url": shortened,
            "has_media_url": any(d in _MEDIA_DOMAINS for d in domains),
            "url_domain_rep": domain_rep,
            "has_poll_card": card == "poll",
            "has_summary_card": card == "summary",
            "has_player_card": card == "player",
            "has_promo_card": card == "promo",
            "card_language_match": bool(card) and t.language == ui_language,
            "num_cashtags": len(ents["cashtags"]),
            "num_cjk_tokens": cjk_count,
            "emoji_count": emoji_count,
            "caps_ratio": caps_ratio,
            "token_entropy": entropy,
            "text_entropy_bucket": min(int(entropy), 7),
            "oov_ratio": 1.0 - uniq_ratio,
            "author_following_log": float(np.log1p(t.author_following)),
            "author_tweet_count_log": float(np.log1p(t.author_tweet_count)),
            "author_is_protected": t.author_is_protected,
            "tweet_language": language_id(t.language),
        }
        for n, v in row.items():
            if DOC_FEATURE_INDEX.get(n, F) < F:
                feats[i, DOC_FEATURE_INDEX[n]] = float(v)
    return (
        jnp.asarray(tokens), jnp.asarray(authors), jnp.asarray(ts),
        jnp.asarray(feats), jnp.asarray(ids), jnp.asarray(facets),
    )


# filter:NAME → doc-feature constraint. Single-column filters support
# ``-filter:NAME`` negation (the column must stay below the threshold);
# any-of groups express media-breadth filters the way the reference's
# internal posting fields do (``queryparser``/``common/query``).
_SINGLE_COL_FILTERS = {
    "links": "has_url",
    "images": "has_image",
    "replies": "is_reply",
    "retweets": "is_retweet",
    "quote": "is_quote",
    "news": "has_news_url",
    "verified": "from_verified_account",
    "blue_verified": "from_blue_verified_account",
    "nullcast": "is_nullcast",
    "self_threads": "is_self_thread",
    "trusted": "from_verified_account",
    "spaces": "has_space_card",
    "polls": "has_poll_card",
}
_ANY_GROUP_FILTERS = {
    "media": ("has_image", "has_native_image", "has_video",
              "has_consumer_video", "has_pro_video", "has_media_url"),
    "videos": ("has_video", "has_consumer_video", "has_pro_video"),
    "cards": ("has_card", "has_poll_card", "has_summary_card",
              "has_player_card", "has_promo_card"),
}
# filter:safe — ceilings instead of floors
_SAFE_MAX = {"is_sensitive_content": 0.5, "is_user_nsfw": 0.5,
             "pnsfw_media_score": 0.9}
_MIN_COUNT_OPS = {
    "min_faves": "fav_count",
    "min_retweets": "retweet_count",
    "min_replies": "reply_count",
    "min_quotes": "quote_count",
    "min_score": "text_score",
}


def parse_query(text: str, max_tokens: int = 16, max_phrases: int = 2,
                phrase_len: int = 4) -> dict:
    """Parse the user-facing query syntax → SearchQuery kwargs.

    Operator surface (≡ ``src/java/com/twitter/search/earlybird/
    queryparser/`` + ``common/query/``): bare terms, ``-term``,
    ``"quoted phrase"``, ``from:<author-id>``, ``from:follows`` (returned
    as ``from_follows=True`` for the caller to resolve against the
    viewer's follow set — the in-network leg's operator form),
    ``lang:<code>``, ``filter:<name>`` / ``-filter:<name>``,
    ``min_faves:<n>``-family scored facets, ``since_time:``/``until_time:``
    (epoch seconds → min_ts/max_ts) and ``since_id:``/``max_id:``.
    Returns kwargs for :class:`SearchQuery` plus the ``from_follows`` flag.
    """
    phrases_txt = re.findall(r'"([^"]*)"', text)
    rest = re.sub(r'"[^"]*"', " ", text)
    terms, excluded = [], []
    from_ids = []
    from_follows = False
    lang = None
    nF = len(DOC_FEATURES)
    min_bounds = np.full(nF, -np.inf, np.float32)
    max_bounds = np.full(nF, np.inf, np.float32)
    any_groups = []
    min_ts = max_ts = min_id = max_id = None
    has_min = has_max = False

    def col(name):
        return DOC_FEATURE_INDEX[name]

    for w in rest.split():
        lw = w.lower()
        neg = lw.startswith("-")
        body = lw[1:] if neg else lw
        op, _, val = body.partition(":")
        if _ == ":" and val:
            if op == "from":
                if val == "follows":
                    from_follows = True
                elif val.isdigit():
                    from_ids.append(int(val))
                continue
            if op == "lang":
                lang = language_id(val)
                continue
            if op == "filter":
                if val in _SINGLE_COL_FILTERS:
                    c = col(_SINGLE_COL_FILTERS[val])
                    if neg:
                        max_bounds[c] = min(max_bounds[c], 0.5)
                        has_max = True
                    else:
                        min_bounds[c] = max(min_bounds[c], 0.5)
                        has_min = True
                elif val in _ANY_GROUP_FILTERS and not neg:
                    g = np.zeros(nF, np.float32)
                    for n in _ANY_GROUP_FILTERS[val]:
                        g[col(n)] = 1.0
                    any_groups.append(g)
                elif val == "safe" and not neg:
                    for n, t_ in _SAFE_MAX.items():
                        c = col(n)
                        max_bounds[c] = min(max_bounds[c], t_)
                    has_max = True
                continue
            if op in _MIN_COUNT_OPS and _num(val) is not None:
                c = col(_MIN_COUNT_OPS[op])
                min_bounds[c] = max(min_bounds[c], _num(val))
                has_min = True
                continue
            if op == "since_time" and val.isdigit():
                min_ts = int(val)
                continue
            if op == "until_time" and val.isdigit():
                max_ts = int(val)
                continue
            if op == "since_id" and val.isdigit():
                min_id = int(val)
                continue
            if op == "max_id" and val.isdigit():
                max_id = int(val)
                continue
            # unknown operator: fall through as a term (parser leniency)
        if neg and len(lw) > 1:
            excluded.append(body)
        else:
            terms.append(lw)

    tokens = tokenize(" ".join(terms), max_tokens)
    exclude = tokenize(" ".join(excluded), max_tokens) if excluded else None
    phrases = None
    if phrases_txt:
        phrases = np.stack(
            [tokenize(p, phrase_len) for p in phrases_txt[:max_phrases]]
        )
        if phrases.shape[0] < max_phrases:
            pad = np.full(
                (max_phrases - phrases.shape[0], phrase_len), int(PAD_ID),
                np.int32,
            )
            phrases = np.concatenate([phrases, pad])

    out = dict(
        tokens=jnp.asarray(tokens),
        exclude_tokens=None if exclude is None else jnp.asarray(exclude),
        phrases=None if phrases is None else jnp.asarray(phrases),
    )
    if from_follows:
        # only present when the operator appeared: splatting an UNRESOLVED
        # from:follows into SearchQuery must fail loudly (resolve it with
        # :func:`build_query`), while operator-free queries stay
        # constructible the old way
        out["from_follows"] = True
    if from_ids:
        out["from_authors"] = jnp.asarray(from_ids, jnp.int32)
    if lang is not None:
        out["lang_id"] = jnp.int32(lang)
    if has_min:
        out["feature_min_bounds"] = jnp.asarray(min_bounds)
    if has_max:
        out["feature_max_bounds"] = jnp.asarray(max_bounds)
    if any_groups:
        out["feature_any_groups"] = jnp.asarray(np.stack(any_groups))
    if min_ts is not None:
        out["min_ts"] = jnp.int32(min_ts)
    if max_ts is not None:
        out["max_ts"] = jnp.int32(max_ts)
    if min_id is not None:
        out["min_id"] = jnp.int32(min_id)
    if max_id is not None:
        out["max_id"] = jnp.int32(max_id)
    return out


def _num(s: str):
    try:
        return float(s)
    except ValueError:
        return None


def build_query(
    text: str,
    *,
    follows=None,
    min_ts: int = 0,
    max_ts: int = 2**31 - 1,
    require_all: bool = True,
    **parse_kwargs,
) -> SearchQuery:
    """Operator text → a complete :class:`SearchQuery`.

    ``from:follows`` resolves against ``follows`` (the viewer's follow
    set) — the in-network timeline leg in operator form
    (``FollowingEarlybirdQueryTransformer.scala``). Explicit operator
    time/id windows override the defaults.
    """
    kw = parse_query(text, **parse_kwargs)
    from_follows = kw.pop("from_follows", False)
    followed = None
    if from_follows:
        if follows is None:
            raise ValueError("query uses from:follows but no follow set")
        followed = jnp.asarray(np.asarray(follows, np.int32))
    kw.setdefault("min_ts", jnp.int32(min_ts))
    kw.setdefault("max_ts", jnp.int32(max_ts))
    return SearchQuery(
        require_all=require_all, followed_authors=followed, **kw)


def doc_feature_reader(index: EarlybirdIndex):
    """``ids [B] -> {name: [B]}`` closure over the live index — the feed
    for home-mixer's EarlybirdDocColumnarHydrator (the reference's
    EarlybirdFeatureHydrator reads these same in-index doc features).
    Unknown ids read as zero rows."""
    tids = np.asarray(index.tweet_ids)
    order = np.argsort(tids, kind="stable")
    sorted_ids = tids[order]
    feats = np.asarray(index.features)[order]

    def read(ids: np.ndarray):
        ids = np.asarray(ids)
        pos = np.clip(
            np.searchsorted(sorted_ids, ids), 0, sorted_ids.shape[0] - 1
        )
        found = sorted_ids[pos] == ids
        block = np.where(found[:, None], feats[pos], 0.0).astype(np.float32)
        return {n: block[:, i] for i, n in enumerate(DOC_FEATURES)}

    return read
