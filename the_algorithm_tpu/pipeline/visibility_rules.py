"""Visibility rule catalog: the major reference rule families as concrete rules.

≡ ``visibilitylib/src/main/scala/com/twitter/visibility/rules/`` — the
reference composes rules from condition combinators (NonAuthor ×
TweetLabel, NonFollower × TweetLabel, score thresholds per conversation
section, viewer-settings gates) into per-SafetyLevel policies
(``TweetLabelRules.scala``, ``DownrankingRules.scala``,
``UserLabelRules.scala``, ``FreedomOfSpeechNotReach.scala``,
``PublicInterestRules.scala``, ``SafeSearchRules.scala``,
``FollowerRelations.scala``). This module ports the *shape*: combinators +
~35 concrete rules assembled into level policies for the engine in
:mod:`the_algorithm_tpu.pipeline.visibility`.

Expected feature keys (a FeatureMap per candidate):
  tweet_labels: set[str]      — safety labels on the tweet
  author_labels: set[str]     — safety labels on the author
  *_score: float              — model scores (toxicity, pspammy, …)
  viewer_is_author / viewer_follows_author / …: bool relationship bits
  viewer settings: nsfw_opt_in, sensitive_media_setting
"""

from __future__ import annotations

from typing import Callable, Dict, List, Mapping

from the_algorithm_tpu.pipeline.visibility import Action, Rule, SafetyLevel

Condition = Callable[[Mapping], bool]


# -- condition combinators (rules/Condition.scala) ----------------------------


def tweet_label(name: str) -> Condition:
    return lambda f: name in f.get("tweet_labels", ())


def author_label(name: str) -> Condition:
    return lambda f: name in f.get("author_labels", ())


def score_above(key: str, threshold: float) -> Condition:
    return lambda f: float(f.get(key, 0.0)) > threshold


def flag(key: str) -> Condition:
    return lambda f: bool(f.get(key, False))


def non_author(c: Condition) -> Condition:
    """≡ NonAuthorWithTweetLabelRule: never hide content from its author."""
    return lambda f: not f.get("viewer_is_author", False) and c(f)


def non_follower(c: Condition) -> Condition:
    """≡ NonFollowerWithTweetLabelRule: followers opted in by following."""
    return lambda f: (
        not f.get("viewer_is_author", False)
        and not f.get("viewer_follows_author", False)
        and c(f)
    )


def all_of(*cs: Condition) -> Condition:
    return lambda f: all(c(f) for c in cs)


def any_of(*cs: Condition) -> Condition:
    return lambda f: any(c(f) for c in cs)


def not_(c: Condition) -> Condition:
    return lambda f: not c(f)


# -- relationship rules (FollowerRelations.scala) -----------------------------

RELATIONSHIP_RULES = [
    Rule("DropDeletedTweet", flag("is_deleted"), Action.DROP, "deleted"),
    Rule("DropAuthorBlockedViewer", flag("author_blocks_viewer"),
         Action.DROP, "blocked"),
    Rule("DropViewerBlockedAuthor", flag("viewer_blocks_author"),
         Action.DROP, "blocked_by_viewer"),
    Rule("DropViewerMutedAuthor",
         all_of(flag("viewer_mutes_author"),
                not_(flag("viewer_follows_author"))),
         Action.DROP, "muted"),
    Rule("DropProtectedAuthorNonFollower",
         non_follower(flag("author_is_protected")),
         Action.DROP, "protected_author", fail_closed=True),
]

# -- tweet-label rules (TweetLabelRules.scala) --------------------------------

TWEET_LABEL_RULES = [
    Rule("AbusiveTweetLabelRule", non_author(tweet_label("abusive")),
         Action.DROP, "tweet_label_abusive"),
    Rule("AbusiveHighRecallNonFollowerTweetLabelRule",
         non_follower(tweet_label("abusive_high_recall")),
         Action.DROP, "tweet_label_abusive_hr"),
    Rule("BystanderAbusiveTweetLabelRule",
         non_author(tweet_label("bystander_abusive")),
         Action.DROP, "tweet_label_bystander_abusive"),
    Rule("AutomationNonFollowerTweetLabelRule",
         non_follower(tweet_label("automation")),
         Action.DROP, "tweet_label_automation"),
    Rule("DuplicateContentTweetLabelDropRule",
         non_author(tweet_label("duplicate_content")),
         Action.DROP, "tweet_label_duplicate"),
    Rule("DuplicateMentionNonFollowerTweetLabelRule",
         non_follower(tweet_label("duplicate_mention")),
         Action.DROP, "tweet_label_duplicate_mention"),
    Rule("GoreAndViolenceTweetLabelRule",
         non_author(all_of(tweet_label("gore_and_violence"),
                           not_(flag("nsfw_opt_in")))),
         Action.INTERSTITIAL, "gore_and_violence"),
    Rule("NsfwHighPrecisionTweetLabelRule",
         non_author(all_of(tweet_label("nsfw_high_precision"),
                           not_(flag("nsfw_opt_in")))),
         Action.INTERSTITIAL, "nsfw_hp"),
    Rule("NsfwCardImageTweetLabelRule",
         non_author(all_of(tweet_label("nsfw_card_image"),
                           not_(flag("nsfw_opt_in")))),
         Action.INTERSTITIAL, "nsfw_card"),
    Rule("PdnaTweetLabelRule", tweet_label("pdna"), Action.DROP, "pdna",
         fail_closed=True),
    Rule("UntrustedUrlTweetLabelRule",
         non_follower(tweet_label("untrusted_url")),
         Action.DROP, "untrusted_url"),
    Rule("SpamHighRecallNonFollowerTweetLabelRule",
         non_follower(tweet_label("spam_high_recall")),
         Action.DROP, "spam_hr"),
    Rule("LiveLowQualityTweetLabelRule",
         non_author(tweet_label("live_low_quality")),
         Action.DOWNRANK, "live_low_quality"),
    Rule("LowQualityMentionTweetLabelRule",
         non_follower(tweet_label("low_quality_mention")),
         Action.DOWNRANK, "low_quality_mention"),
]

# -- model-score downranking rules (DownrankingRules.scala) -------------------

DOWNRANKING_RULES = [
    Rule("HighToxicityScoreDownrankHighQualitySectionRule",
         score_above("toxicity_score", 0.91), Action.DOWNRANK,
         "toxicity_high_q"),
    Rule("HighToxicityScoreDownrankLowQualitySectionRule",
         score_above("toxicity_score", 0.96), Action.DOWNRANK,
         "toxicity_low_q"),
    Rule("HighToxicityScoreDownrankAbusiveQualitySectionRule",
         score_above("toxicity_score", 0.98), Action.DOWNRANK,
         "toxicity_abusive_q"),
    Rule("HighProactiveTosScoreTweetLabelDownrankingRule",
         score_above("proactive_tos_score", 0.9), Action.DOWNRANK,
         "proactive_tos"),
    Rule("HighPSpammyTweetScoreDownrankLowQualitySectionRule",
         score_above("pspammy_score", 0.95), Action.DOWNRANK, "pspammy"),
    Rule("HighCryptospamScoreConvoDownrankAbusiveQualityRule",
         score_above("cryptospam_score", 0.9), Action.DOWNRANK, "cryptospam"),
    Rule("DownrankSpamReplyConversationsTweetLabelRule",
         non_author(tweet_label("spam_reply")), Action.DOWNRANK,
         "spam_reply"),
    Rule("NotGraduatedConversationsAuthorLabelRule",
         non_follower(author_label("not_graduated")), Action.DOWNRANK,
         "not_graduated"),
    Rule("RitoActionedTweetDownrankLowQualitySectionRule",
         flag("rito_actioned"), Action.DOWNRANK, "rito_actioned"),
]

# -- author/user-label rules (UserLabelRules.scala) ---------------------------

USER_LABEL_RULES = [
    Rule("SuspendedAuthorRule", flag("author_is_suspended"), Action.DROP,
         "suspended_author", fail_closed=True),
    Rule("DeactivatedAuthorRule", flag("author_is_deactivated"), Action.DROP,
         "deactivated_author", fail_closed=True),
    Rule("AbusiveAuthorLabelRule", non_follower(author_label("abusive")),
         Action.DROP, "author_abusive"),
    Rule("CompromisedAuthorLabelRule", author_label("compromised"),
         Action.DROP, "author_compromised"),
    Rule("SpamAuthorLabelRule", non_follower(author_label("spam")),
         Action.DROP, "author_spam"),
    Rule("NsfwAuthorLabelInterstitialRule",
         non_author(all_of(author_label("nsfw"), not_(flag("nsfw_opt_in")))),
         Action.INTERSTITIAL, "author_nsfw"),
]

# -- FOSNR (FreedomOfSpeechNotReach.scala) ------------------------------------

FOSNR_RULES = [
    Rule("FosnrInterstitialRule",
         non_author(tweet_label("fosnr_restricted")),
         Action.INTERSTITIAL, "fosnr"),
    Rule("FosnrDownrankRule", tweet_label("fosnr_restricted"),
         Action.DOWNRANK, "fosnr_downrank"),
]

# -- public interest (PublicInterestRules.scala) ------------------------------

PUBLIC_INTEREST_RULES = [
    Rule("PublicInterestInterstitialRule",
         tweet_label("public_interest"), Action.INTERSTITIAL,
         "public_interest"),
]

# -- safe search (SafeSearchRules.scala) --------------------------------------

SAFE_SEARCH_RULES = [
    Rule("SafeSearchNsfwDropRule",
         all_of(any_of(tweet_label("nsfw_high_precision"),
                       tweet_label("nsfw_high_recall"),
                       flag("is_nsfw_media")),
                not_(flag("nsfw_opt_in"))),
         Action.DROP, "safe_search_nsfw"),
    Rule("SafeSearchAbusiveDropRule",
         any_of(tweet_label("abusive"), tweet_label("abusive_high_recall")),
         Action.DROP, "safe_search_abusive"),
    Rule("SafeSearchSpamDropRule",
         any_of(tweet_label("spam_high_recall"), tweet_label("untrusted_url")),
         Action.DROP, "safe_search_spam"),
]

# -- recommendations-only hard drops ------------------------------------------

RECS_ONLY_RULES = [
    Rule("DropNsfwFromRecs",
         any_of(flag("is_nsfw_media"), tweet_label("nsfw_high_recall"),
                author_label("nsfw")),
         Action.DROP, "nsfw_recs"),
    Rule("DropHighToxicityFromRecs", score_above("toxicity_score", 0.8),
         Action.DROP, "toxicity_recs"),
    Rule("DropNotInterestedAuthorFromRecs", flag("viewer_not_interested"),
         Action.DROP, "not_interested"),
]


# -- toxicity reply filter (ToxicityReplyFilterRules.scala) --------------------

TOXICITY_REPLY_RULES = [
    Rule("ToxicityReplySectionRule",
         non_author(all_of(flag("is_reply"),
                           score_above("toxicity_score", 0.91))),
         Action.DOWNRANK, "toxic_reply_abusive_quality"),
    Rule("ToxicityReplyHiddenRule",
         non_author(all_of(flag("is_reply"), flag("hidden_by_author"))),
         Action.TOMBSTONE, "reply_hidden_by_author"),
    Rule("ToxicityReplyHighToxicityTombstone",
         non_author(all_of(flag("is_reply"),
                           score_above("toxicity_score", 0.97))),
         Action.TOMBSTONE, "toxic_reply_hidden"),
]

# -- card / URL rules (CardRules.scala) -----------------------------------------

CARD_RULES = [
    Rule("UnsafeUrlCardRule",
         non_author(all_of(flag("has_card"), tweet_label("unsafe_url"))),
         Action.DROP, "unsafe_url_card"),
    Rule("MalwareUrlCardRule",
         any_of(tweet_label("malware_url"), tweet_label("phishing_url")),
         Action.DROP, "malware_url", fail_closed=True),
    Rule("SpammyUrlCardDownrankRule",
         non_follower(tweet_label("spammy_url")),
         Action.DOWNRANK, "spammy_url"),
]

# -- DM rules (DmConversationRules / DmEventRules.scala) ------------------------

DM_RULES = [
    Rule("DmDropBlockedSender", flag("viewer_blocks_author"),
         Action.DROP, "dm_blocked_sender"),
    Rule("DmDropNonFollowedSpamRequest",
         non_follower(any_of(tweet_label("spam_high_recall"),
                             author_label("spammy"))),
         Action.DROP, "dm_spam_request"),
    Rule("DmTombstoneDeletedMessage", flag("is_deleted"),
         Action.TOMBSTONE, "dm_deleted"),
    Rule("DmInterstitialNsfwMedia",
         all_of(flag("is_nsfw_media"), not_(flag("nsfw_opt_in"))),
         Action.INTERSTITIAL, "dm_nsfw_media"),
]

# -- spaces (SpaceRules.scala) ---------------------------------------------------

SPACE_RULES = [
    Rule("SpaceDropCoordinatedHarm",
         author_label("coordinated_harmful_activity"),
         Action.DROP, "space_coordinated_harm", fail_closed=True),
    Rule("SpaceDropSuspendedHost", author_label("suspended"),
         Action.DROP, "space_suspended_host", fail_closed=True),
    Rule("SpaceInterstitialHatefulTitle",
         non_author(tweet_label("hateful_terms")),
         Action.INTERSTITIAL, "space_hateful_title"),
]

# -- sensitive-media viewer settings (SensitiveMediaSettingsRules.scala) --------
#
# viewer setting per media category: "drop" | "interstitial" | "allow"


def _media_setting(category: str, wanted: str) -> Condition:
    return lambda f: (
        category in f.get("media_categories", ())
        and f.get(f"media_setting_{category}", "interstitial") == wanted
    )


SENSITIVE_MEDIA_RULES = [
    Rule(f"SensitiveMedia{cat.title().replace('_', '')}{act.title()}Rule",
         non_author(_media_setting(cat, act)),
         Action.DROP if act == "drop" else Action.INTERSTITIAL,
         f"sensitive_media_{cat}")
    for cat in ("adult_content", "graphic_violence", "other_sensitive")
    for act in ("drop", "interstitial")
]

# -- advanced viewer-side filtering (AdvancedFilteringRules.scala) ---------------

ADVANCED_FILTERING_RULES = [
    Rule("AdvancedFilterNoConfirmedEmailRule",
         all_of(flag("viewer_filters_no_confirmed_email"),
                flag("author_has_no_confirmed_email"),
                not_(flag("viewer_follows_author"))),
         Action.DROP, "filter_no_confirmed_email"),
    Rule("AdvancedFilterDefaultProfileImageRule",
         all_of(flag("viewer_filters_default_profile_image"),
                flag("author_has_default_profile_image"),
                not_(flag("viewer_follows_author"))),
         Action.DROP, "filter_default_profile_image"),
    Rule("AdvancedFilterNewAccountsRule",
         all_of(flag("viewer_filters_new_accounts"),
                flag("author_is_new_account"),
                not_(flag("viewer_follows_author"))),
         Action.DROP, "filter_new_accounts"),
    Rule("AdvancedFilterNotFollowedByRule",
         all_of(flag("viewer_filters_not_followed_by"),
                not_(flag("author_follows_viewer")),
                not_(flag("viewer_follows_author"))),
         Action.DROP, "filter_not_followed_by"),
]

# -- user-unavailable tombstones (UserUnavailableStateTombstoneRules.scala) -----

USER_UNAVAILABLE_RULES = [
    Rule("SuspendedUserTombstoneRule", author_label("suspended"),
         Action.TOMBSTONE, "author_suspended_tombstone", fail_closed=True),
    Rule("DeactivatedUserTombstoneRule", author_label("deactivated"),
         Action.TOMBSTONE, "author_deactivated_tombstone", fail_closed=True),
    Rule("OffboardedUserTombstoneRule", author_label("offboarded"),
         Action.TOMBSTONE, "author_offboarded_tombstone"),
]


# -- per-level policies (VisibilityPolicy.scala assembly) ----------------------

CATALOG_RULES: Dict[SafetyLevel, List[Rule]] = {
    SafetyLevel.TIMELINE_HOME: (
        RELATIONSHIP_RULES + USER_LABEL_RULES + TWEET_LABEL_RULES
        + FOSNR_RULES + PUBLIC_INTEREST_RULES + DOWNRANKING_RULES
    ),
    SafetyLevel.TIMELINE_PROFILE: (
        # profile timelines keep the author's own content visible: only
        # relationship + hard user-state + PDNA-grade drops apply
        RELATIONSHIP_RULES
        + [r for r in USER_LABEL_RULES
           if r.name in ("SuspendedAuthorRule", "DeactivatedAuthorRule")]
        + [r for r in TWEET_LABEL_RULES if r.name == "PdnaTweetLabelRule"]
    ),
    SafetyLevel.SEARCH: (
        RELATIONSHIP_RULES + USER_LABEL_RULES + SAFE_SEARCH_RULES
        + TWEET_LABEL_RULES + DOWNRANKING_RULES
    ),
    SafetyLevel.RECOMMENDATIONS: (
        RELATIONSHIP_RULES + USER_LABEL_RULES + RECS_ONLY_RULES
        + TWEET_LABEL_RULES + FOSNR_RULES + DOWNRANKING_RULES
    ),
    SafetyLevel.NOTIFICATIONS: (
        RELATIONSHIP_RULES + USER_LABEL_RULES + TWEET_LABEL_RULES
        + DOWNRANKING_RULES
    ),
    SafetyLevel.CONVERSATION: (
        RELATIONSHIP_RULES + USER_UNAVAILABLE_RULES + TOXICITY_REPLY_RULES
        + TWEET_LABEL_RULES + CARD_RULES + SENSITIVE_MEDIA_RULES
        + ADVANCED_FILTERING_RULES
    ),
    SafetyLevel.DIRECT_MESSAGES: RELATIONSHIP_RULES + DM_RULES,
    SafetyLevel.SPACES: RELATIONSHIP_RULES + SPACE_RULES,
}

# search additionally applies the card/sensitive-media families
CATALOG_RULES[SafetyLevel.SEARCH] = (
    CATALOG_RULES[SafetyLevel.SEARCH] + CARD_RULES + SENSITIVE_MEDIA_RULES
)
# home timeline honours viewer advanced filters + card safety
CATALOG_RULES[SafetyLevel.TIMELINE_HOME] = (
    CATALOG_RULES[SafetyLevel.TIMELINE_HOME] + CARD_RULES
    + SENSITIVE_MEDIA_RULES + ADVANCED_FILTERING_RULES
)


def catalog_engine(stats=None):
    from the_algorithm_tpu.pipeline.visibility import VisibilityRuleEngine

    return VisibilityRuleEngine(CATALOG_RULES, stats=stats)


def all_rule_names() -> List[str]:
    seen = []
    for rules in CATALOG_RULES.values():
        for r in rules:
            if r.name not in seen:
                seen.append(r.name)
    return seen


# -- store-backed rules (country takedowns + author safety states) -------------
#
# ≡ the reference's interaction between visibilitylib and the takedown /
# user-state stores (``CountryWithheldTweet``/``WithheldAuthor`` rule family
# and the suspended/deactivated-author rules). Conditions close over the
# live stores and read ``tweet_id``/``author_id``/``viewer_country`` from
# the feature map (VisibilityFilter feeds ``candidate.features``; put the
# ids there via a hydrator or the candidate-lift hydrator).


def store_backed_rules(takedowns=None, author_state_fn=None) -> List[Rule]:
    """Rules wired to the tweetypie TakedownStore and the ingester's
    author-state table; pass whichever stores are deployed."""
    rules: List[Rule] = []
    if takedowns is not None:
        rules.append(Rule(
            "DropCountryWithheldTweet",
            lambda f: takedowns.is_withheld(
                int(f.get("tweet_id", -1)), f.get("viewer_country")
            ),
            Action.DROP, "withheld_in_country", fail_closed=True,
        ))
    if author_state_fn is not None:
        def _bad_author(f):
            st = author_state_fn(int(f.get("author_id", -1)))
            return st is not None and int(st) != 0  # != AuthorState.NORMAL

        rules.append(Rule(
            "DropUnavailableAuthorContent", _bad_author, Action.DROP,
            "author_unavailable", fail_closed=True,
        ))
    return rules


def catalog_engine_with_stores(takedowns=None, author_state_fn=None,
                               stats=None):
    """Catalog engine with the store-backed rules prepended at every level
    (they are relationship-grade drops — severity before label rules)."""
    from the_algorithm_tpu.pipeline.visibility import VisibilityRuleEngine

    extra = store_backed_rules(takedowns, author_state_fn)
    rules = {lvl: extra + list(rs) for lvl, rs in CATALOG_RULES.items()}
    return VisibilityRuleEngine(rules, stats=stats)
