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

# -- FOSNR (FreedomOfSpeechNotReachRules.scala) -------------------------------
#
# the full FOSNR policy ladder: restricted tweets stay visible to the
# author and followers but are de-amplified everywhere, interstitialed on
# conversation surfaces, dropped from recommendation/amplification
# surfaces, and engagement-limited (the reference's
# LimitedEngagementsRules + avoid-amplification set)

FOSNR_RULES = [
    Rule("FosnrInterstitialRule",
         non_author(tweet_label("fosnr_restricted")),
         Action.INTERSTITIAL, "fosnr"),
    Rule("FosnrDownrankRule", tweet_label("fosnr_restricted"),
         Action.DOWNRANK, "fosnr_downrank"),
]

FOSNR_AMPLIFICATION_RULES = [
    # recommendation/amplification surfaces drop restricted content outright
    Rule("FosnrDropFromAmplificationRule",
         non_follower(tweet_label("fosnr_restricted")),
         Action.DROP, "fosnr_no_amplification"),
    Rule("FosnrDropAuthorFromAmplificationRule",
         non_follower(author_label("fosnr_restricted_author")),
         Action.DROP, "fosnr_author_no_amplification"),
]

FOSNR_ENGAGEMENT_RULES = [
    # engagement-limited states render as interstitial-grade covers with
    # disabled actions (LimitedEngagementsRules)
    Rule("FosnrLimitedRepliesRule",
         non_author(all_of(tweet_label("fosnr_restricted"),
                           flag("is_reply"))),
         Action.INTERSTITIAL, "fosnr_limited_replies"),
    Rule("FosnrLimitedLikesRule",
         non_author(tweet_label("fosnr_limited_engagements")),
         Action.INTERSTITIAL, "fosnr_limited_engagements"),
    Rule("FosnrSoftInterventionNudgeRule",
         non_author(tweet_label("fosnr_soft_intervention")),
         Action.INTERSTITIAL, "fosnr_soft_intervention"),
    Rule("FosnrQuotedTweetDownrankRule",
         tweet_label("fosnr_quoted_restricted"), Action.DOWNRANK,
         "fosnr_quoted"),
]

# -- public interest (PublicInterestRules.scala) ------------------------------
#
# per-policy-category interstitials + the limited/newsworthy ladder

_PI_POLICIES = (
    "hateful_conduct", "abusive_behavior", "civic_integrity",
    "medical_misinfo", "synthetic_media", "violent_threat",
)

PUBLIC_INTEREST_RULES = [
    Rule("PublicInterestInterstitialRule",
         tweet_label("public_interest"), Action.INTERSTITIAL,
         "public_interest"),
] + [
    Rule(f"PublicInterest{p.title().replace('_', '')}InterstitialRule",
         non_author(tweet_label(f"public_interest_{p}")),
         Action.INTERSTITIAL, f"public_interest_{p}")
    for p in _PI_POLICIES
] + [
    Rule(f"PublicInterest{p.title().replace('_', '')}AmplificationDropRule",
         non_follower(tweet_label(f"public_interest_{p}")),
         Action.DROP, f"public_interest_{p}_no_amp")
    for p in _PI_POLICIES
]

# -- misinformation policy labels (MisinfoPolicyRules) ------------------------

MISINFO_RULES = [
    Rule("MisinfoCivicInterstitialRule",
         non_author(tweet_label("misinfo_civic")),
         Action.INTERSTITIAL, "misinfo_civic"),
    Rule("MisinfoMedicalInterstitialRule",
         non_author(tweet_label("misinfo_medical")),
         Action.INTERSTITIAL, "misinfo_medical"),
    Rule("MisinfoCrisisInterstitialRule",
         non_author(tweet_label("misinfo_crisis")),
         Action.INTERSTITIAL, "misinfo_crisis"),
    Rule("MisinfoGenericDownrankRule",
         tweet_label("misinfo_generic"), Action.DOWNRANK, "misinfo_generic"),
    Rule("MisleadingWithNoteDownrankRule",
         all_of(tweet_label("misleading"), flag("has_community_note")),
         Action.DOWNRANK, "misleading_with_note"),
    Rule("MisinfoCivicDropFromAmplificationRule",
         non_follower(tweet_label("misinfo_civic")),
         Action.DROP, "misinfo_civic_no_amp"),
]

# -- legal / withheld content (LegalPolicyRules) ------------------------------

LEGAL_RULES = [
    Rule("DmcaWithheldTombstoneRule", tweet_label("dmca_withheld"),
         Action.TOMBSTONE, "dmca", fail_closed=True),
    Rule("LegalDemandWithheldTombstoneRule", tweet_label("legal_withheld"),
         Action.TOMBSTONE, "legal_withheld", fail_closed=True),
    Rule("PrivateInformationDropRule", tweet_label("private_info"),
         Action.DROP, "private_info", fail_closed=True),
    Rule("NonConsensualMediaDropRule", tweet_label("non_consensual_media"),
         Action.DROP, "ncm", fail_closed=True),
    Rule("HackedMaterialsInterstitialRule",
         non_author(tweet_label("hacked_materials")),
         Action.INTERSTITIAL, "hacked_materials"),
    Rule("CounterfeitDropRule", tweet_label("counterfeit"), Action.DROP,
         "counterfeit"),
    Rule("ScamFraudDropRule",
         any_of(tweet_label("scam"), tweet_label("fraud")),
         Action.DROP, "scam_fraud"),
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

# -- spam/integrity author labels (UserLabelRules breadth) ----------------------

SPAM_AUTHOR_RULES = [
    Rule("EngagementSpammerAuthorLabelRule",
         non_follower(author_label("engagement_spammer")),
         Action.DROP, "engagement_spammer"),
    Rule("HighFollowChurnAuthorDownrankRule",
         non_follower(author_label("high_follow_churn")),
         Action.DOWNRANK, "high_follow_churn"),
    Rule("DuplicateAccountAuthorDropRule",
         author_label("duplicate_account"), Action.DROP, "duplicate_account"),
    Rule("BanEvasionAuthorDropRule", author_label("ban_evasion"),
         Action.DROP, "ban_evasion", fail_closed=True),
    Rule("FinancialScamAuthorDropRule", author_label("financial_scam"),
         Action.DROP, "financial_scam_author"),
    Rule("LikelyAutomatedAuthorDownrankRule",
         non_follower(author_label("likely_automated")),
         Action.DOWNRANK, "likely_automated"),
    Rule("RecentlySuspendedAuthorDownrankRule",
         non_follower(author_label("recently_suspended")),
         Action.DOWNRANK, "recently_suspended"),
    Rule("NewUserSpamHighRecallDownrankRule",
         non_follower(all_of(author_label("spam_high_recall"),
                             flag("author_is_new_account"))),
         Action.DOWNRANK, "new_user_spam_hr"),
    Rule("CopypastaSpamDownrankRule",
         non_author(tweet_label("copypasta_spam")),
         Action.DOWNRANK, "copypasta_spam"),
    Rule("SearchBlacklistTweetLabelRule",
         non_author(tweet_label("search_blacklist")),
         Action.DROP, "search_blacklist"),
]

# -- violence / hateful conduct (AbusePolicyRules) ------------------------------

VIOLENCE_HATE_RULES = [
    Rule("ViolentThreatDropRule", tweet_label("violent_threat"),
         Action.DROP, "violent_threat", fail_closed=True),
    Rule("GlorificationOfViolenceDropRule",
         non_author(tweet_label("glorification_of_violence")),
         Action.DROP, "glorification_of_violence"),
    Rule("HatefulConductDownrankRule",
         non_author(tweet_label("hateful_terms")),
         Action.DOWNRANK, "hateful_conduct"),
    Rule("TargetedHarassmentDropRule",
         non_author(tweet_label("targeted_harassment")),
         Action.DROP, "targeted_harassment"),
    Rule("SelfHarmInterstitialRule",
         non_author(tweet_label("self_harm")),
         Action.INTERSTITIAL, "self_harm"),
    Rule("ViolentEventDenialDownrankRule",
         tweet_label("violent_event_denial"), Action.DOWNRANK,
         "violent_event_denial"),
    Rule("PerpetratorContentDropRule",
         tweet_label("perpetrator_content"), Action.DROP,
         "perpetrator_content", fail_closed=True),
]

# -- quoted-tweet rules (QuotedTweetRules.scala) --------------------------------
#
# the INNER tweet of a quote: unavailable states tombstone the embed,
# safety labels cover it

QUOTED_TWEET_RULES = [
    Rule("QuotedTweetDeletedTombstoneRule", flag("is_deleted"),
         Action.TOMBSTONE, "quoted_deleted"),
    Rule("QuotedTweetBlockedAuthorTombstoneRule",
         flag("author_blocks_viewer"), Action.TOMBSTONE, "quoted_blocked"),
    Rule("QuotedTweetViewerBlockedTombstoneRule",
         flag("viewer_blocks_author"), Action.TOMBSTONE,
         "quoted_blocked_by_viewer"),
    Rule("QuotedTweetProtectedAuthorTombstoneRule",
         non_follower(flag("author_is_protected")),
         Action.TOMBSTONE, "quoted_protected", fail_closed=True),
    Rule("QuotedTweetNsfwInterstitialRule",
         non_author(all_of(any_of(tweet_label("nsfw_high_precision"),
                                  flag("is_nsfw_media")),
                           not_(flag("nsfw_opt_in")))),
         Action.INTERSTITIAL, "quoted_nsfw"),
    Rule("QuotedTweetMutedAuthorTombstoneRule",
         all_of(flag("viewer_mutes_author"),
                not_(flag("viewer_follows_author"))),
         Action.TOMBSTONE, "quoted_muted"),
]

# -- ads brand safety (AdsRules) ------------------------------------------------

ADS_RULES = [
    Rule("AdsDropNsfwRule",
         any_of(flag("is_nsfw_media"), tweet_label("nsfw_high_recall"),
                author_label("nsfw")),
         Action.DROP, "ads_nsfw", fail_closed=True),
    Rule("AdsDropViolenceRule",
         any_of(tweet_label("gore_and_violence"),
                tweet_label("violent_threat")),
         Action.DROP, "ads_violence", fail_closed=True),
    Rule("AdsDropScamAdvertiserRule", author_label("financial_scam"),
         Action.DROP, "ads_scam_advertiser", fail_closed=True),
    Rule("AdsDropLowQualityRule", score_above("pspammy_score", 0.8),
         Action.DROP, "ads_low_quality"),
    Rule("AdsDropHighToxicityRule", score_above("toxicity_score", 0.7),
         Action.DROP, "ads_toxicity"),
    Rule("AdsDropMisinfoAdjacentRule",
         any_of(tweet_label("misinfo_civic"), tweet_label("misinfo_medical"),
                tweet_label("misinfo_crisis")),
         Action.DROP, "ads_misinfo"),
]

# -- trends representative tweet (TrendsRules) ----------------------------------

TRENDS_RULES = [
    Rule("TrendTweetNsfwDropRule",
         any_of(flag("is_nsfw_media"), tweet_label("nsfw_high_precision"),
                tweet_label("nsfw_high_recall")),
         Action.DROP, "trend_nsfw"),
    Rule("TrendTweetAbusiveDropRule",
         any_of(tweet_label("abusive"), tweet_label("abusive_high_recall")),
         Action.DROP, "trend_abusive"),
    Rule("TrendTweetSpamDropRule",
         any_of(tweet_label("spam_high_recall"), author_label("spam")),
         Action.DROP, "trend_spam"),
    Rule("TrendTweetLowQualityDropRule", score_above("pspammy_score", 0.6),
         Action.DROP, "trend_low_quality"),
    Rule("TrendTweetUnverifiedCrisisDownrankRule",
         all_of(tweet_label("crisis_unverified"),
                not_(flag("from_verified_account"))),
         Action.DOWNRANK, "trend_crisis_unverified"),
]

# -- push-notification strictness (NotificationsRules) --------------------------

PUSH_STRICT_RULES = [
    Rule("PushDropAnyInterstitialGradeRule",
         any_of(tweet_label("nsfw_high_precision"),
                tweet_label("gore_and_violence"),
                tweet_label("public_interest"),
                tweet_label("hacked_materials")),
         Action.DROP, "push_interstitial_grade"),
    Rule("PushDropModerateToxicityRule",
         score_above("toxicity_score", 0.6), Action.DROP, "push_toxicity"),
    Rule("PushDropModerateSpamRule", score_above("pspammy_score", 0.6),
         Action.DROP, "push_spam"),
    Rule("PushDropUnknownSenderDmRule",
         non_follower(flag("is_dm_request")), Action.DROP,
         "push_unknown_sender"),
]

# -- viewer muted keywords (MutedKeywordRules) ----------------------------------


def muted_keyword(f) -> bool:
    muted = f.get("viewer_muted_keywords", ())
    toks = f.get("tweet_keywords", ())
    return bool(set(muted) & set(toks))


MUTED_KEYWORD_RULES = [
    Rule("MutedKeywordTimelineDropRule", non_author(muted_keyword),
         Action.DROP, "muted_keyword"),
    Rule("MutedKeywordNotificationDropRule", non_author(muted_keyword),
         Action.DROP, "muted_keyword_notification"),
]

# -- embedded / logged-out surfaces (EmbeddedTweetRules) ------------------------

EMBEDDED_RULES = [
    Rule("EmbeddedTweetNsfwDropRule",
         any_of(flag("is_nsfw_media"), tweet_label("nsfw_high_recall"),
                tweet_label("nsfw_high_precision")),
         Action.DROP, "embedded_nsfw", fail_closed=True),
    Rule("EmbeddedTweetProtectedDropRule", flag("author_is_protected"),
         Action.DROP, "embedded_protected", fail_closed=True),
    Rule("EmbeddedTweetWithheldDropRule",
         any_of(tweet_label("dmca_withheld"), tweet_label("legal_withheld")),
         Action.DROP, "embedded_withheld", fail_closed=True),
]

# -- media-vertical rules (MediaSurfaceRules) -----------------------------------

MEDIA_SURFACE_RULES = [
    Rule("MediaTabNsfwInterstitialRule",
         non_author(all_of(flag("is_nsfw_media"), not_(flag("nsfw_opt_in")))),
         Action.INTERSTITIAL, "media_tab_nsfw"),
    Rule("MediaTabGraphicViolenceInterstitialRule",
         non_author(all_of(tweet_label("gore_and_violence"),
                           not_(flag("nsfw_opt_in")))),
         Action.INTERSTITIAL, "media_tab_violence"),
    Rule("VideoRecsNsfwDropRule",
         any_of(flag("is_nsfw_media"), tweet_label("nsfw_high_recall")),
         Action.DROP, "video_recs_nsfw"),
    Rule("VideoRecsViolenceDropRule", tweet_label("gore_and_violence"),
         Action.DROP, "video_recs_violence"),
]

# -- people-search author gates (SearchPeopleRules) -----------------------------

SEARCH_PEOPLE_RULES = [
    Rule("PeopleSearchSuspendedDropRule", author_label("suspended"),
         Action.DROP, "people_suspended", fail_closed=True),
    Rule("PeopleSearchDeactivatedDropRule", author_label("deactivated"),
         Action.DROP, "people_deactivated", fail_closed=True),
    Rule("PeopleSearchNsfwAuthorDropRule",
         all_of(author_label("nsfw"), not_(flag("nsfw_opt_in"))),
         Action.DROP, "people_nsfw_author"),
    Rule("PeopleSearchSpamAuthorDownrankRule", author_label("spam"),
         Action.DOWNRANK, "people_spam_author"),
]


# -- per-level policies (≡ the level→policy map in RuleBase.scala) -------------
#
# composition baselines: every surface starts from relationships + hard
# user-state + legal; ranked/recommendation surfaces add the amplification
# families; viewer-content surfaces (favorites/bookmarks) stay permissive.

_BASE = RELATIONSHIP_RULES + USER_LABEL_RULES + LEGAL_RULES
_LABELS_FULL = (TWEET_LABEL_RULES + MISINFO_RULES + SPAM_AUTHOR_RULES
                + VIOLENCE_HATE_RULES)
_RANKED_HOME = (
    _BASE + _LABELS_FULL + FOSNR_RULES + FOSNR_ENGAGEMENT_RULES
    + PUBLIC_INTEREST_RULES + DOWNRANKING_RULES + CARD_RULES
    + SENSITIVE_MEDIA_RULES + ADVANCED_FILTERING_RULES
    + [MUTED_KEYWORD_RULES[0]]
)
_RECS = (
    _BASE + _LABELS_FULL + RECS_ONLY_RULES + FOSNR_RULES
    + FOSNR_AMPLIFICATION_RULES + PUBLIC_INTEREST_RULES + DOWNRANKING_RULES
    + CARD_RULES
)
_SEARCH = (
    _BASE + SAFE_SEARCH_RULES + _LABELS_FULL + DOWNRANKING_RULES
    + CARD_RULES + SENSITIVE_MEDIA_RULES
)
# viewer-owned content (favorites / bookmarks): the viewer chose it —
# only hard drops + legal + interstitial-grade media covers apply
_VIEWER_OWNED = (
    RELATIONSHIP_RULES + LEGAL_RULES
    + [r for r in USER_LABEL_RULES
       if r.name in ("SuspendedAuthorRule", "DeactivatedAuthorRule")]
    + [r for r in TWEET_LABEL_RULES if r.name in (
        "PdnaTweetLabelRule", "NsfwHighPrecisionTweetLabelRule",
        "GoreAndViolenceTweetLabelRule")]
)

CATALOG_RULES: Dict[SafetyLevel, List[Rule]] = {
    # home timelines
    SafetyLevel.TIMELINE_HOME: _RANKED_HOME,
    SafetyLevel.TIMELINE_HOME_LATEST: (
        # chron following: no amplification-side families; the viewer
        # follows every author, so non-follower gates are inert and
        # downranking has no ranking to act on — keep drops + covers
        _BASE + TWEET_LABEL_RULES + LEGAL_RULES + CARD_RULES
        + SENSITIVE_MEDIA_RULES + [MUTED_KEYWORD_RULES[0]]
    ),
    SafetyLevel.TIMELINE_HOME_RECOMMENDATIONS: _RECS,
    # profile / user-content timelines
    SafetyLevel.TIMELINE_PROFILE: (
        RELATIONSHIP_RULES + LEGAL_RULES
        + [r for r in USER_LABEL_RULES
           if r.name in ("SuspendedAuthorRule", "DeactivatedAuthorRule")]
        + [r for r in TWEET_LABEL_RULES if r.name == "PdnaTweetLabelRule"]
    ),
    SafetyLevel.TIMELINE_FAVORITES: _VIEWER_OWNED,
    SafetyLevel.TIMELINE_BOOKMARK: _VIEWER_OWNED,
    SafetyLevel.TIMELINE_LISTS: (
        _BASE + TWEET_LABEL_RULES + CARD_RULES + SENSITIVE_MEDIA_RULES
        + [MUTED_KEYWORD_RULES[0]]
    ),
    SafetyLevel.TIMELINE_MEDIA: (
        _BASE + TWEET_LABEL_RULES + MEDIA_SURFACE_RULES
        + SENSITIVE_MEDIA_RULES
    ),
    # search verticals
    SafetyLevel.SEARCH: _SEARCH,
    SafetyLevel.SEARCH_LATEST: (
        # latest drops the quality downranking (no ranking) but keeps
        # safety drops
        _BASE + SAFE_SEARCH_RULES + _LABELS_FULL + CARD_RULES
        + SENSITIVE_MEDIA_RULES
    ),
    SafetyLevel.SEARCH_MEDIA: (
        _BASE + SAFE_SEARCH_RULES + TWEET_LABEL_RULES + MEDIA_SURFACE_RULES
        + SENSITIVE_MEDIA_RULES
    ),
    SafetyLevel.SEARCH_PEOPLE: (
        RELATIONSHIP_RULES + SEARCH_PEOPLE_RULES + SPAM_AUTHOR_RULES
    ),
    # recommendation surfaces
    SafetyLevel.RECOMMENDATIONS: _RECS,
    SafetyLevel.RECOMMENDATIONS_VIDEO: (
        _RECS + MEDIA_SURFACE_RULES
    ),
    SafetyLevel.TOPIC_RECOMMENDATIONS: _RECS,
    SafetyLevel.TRENDS_REPRESENTATIVE_TWEET: (
        _BASE + TRENDS_RULES + _LABELS_FULL + FOSNR_AMPLIFICATION_RULES
    ),
    # notifications
    SafetyLevel.NOTIFICATIONS: (
        _BASE + _LABELS_FULL + DOWNRANKING_RULES + [MUTED_KEYWORD_RULES[1]]
    ),
    SafetyLevel.NOTIFICATIONS_PUSH: (
        _BASE + PUSH_STRICT_RULES + _LABELS_FULL + [MUTED_KEYWORD_RULES[1]]
    ),
    # threads
    SafetyLevel.CONVERSATION: (
        RELATIONSHIP_RULES + USER_UNAVAILABLE_RULES + LEGAL_RULES
        + TOXICITY_REPLY_RULES + TWEET_LABEL_RULES + CARD_RULES
        + SENSITIVE_MEDIA_RULES + ADVANCED_FILTERING_RULES
    ),
    SafetyLevel.QUOTED_TWEET: (
        QUOTED_TWEET_RULES + LEGAL_RULES
        + [r for r in TWEET_LABEL_RULES if r.name == "PdnaTweetLabelRule"]
    ),
    # messaging
    SafetyLevel.DIRECT_MESSAGES: RELATIONSHIP_RULES + DM_RULES + LEGAL_RULES,
    SafetyLevel.DIRECT_MESSAGES_INBOX: (
        RELATIONSHIP_RULES + DM_RULES + LEGAL_RULES
        + [r for r in SPAM_AUTHOR_RULES
           if r.name in ("EngagementSpammerAuthorLabelRule",
                         "BanEvasionAuthorDropRule")]
    ),
    SafetyLevel.DIRECT_MESSAGES_SEARCH: RELATIONSHIP_RULES + DM_RULES,
    # audio / live
    SafetyLevel.SPACES: RELATIONSHIP_RULES + SPACE_RULES,
    SafetyLevel.SPACES_SHARING: (
        RELATIONSHIP_RULES + SPACE_RULES + FOSNR_AMPLIFICATION_RULES
    ),
    # monetized / syndicated
    SafetyLevel.ADS: ADS_RULES + LEGAL_RULES,
    SafetyLevel.EMBEDDED_TWEET: EMBEDDED_RULES + LEGAL_RULES,
}


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
