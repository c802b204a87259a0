"""Visibility rule catalog specs (≡ visibilitylib rule families).

Table-driven: (safety level, features, expected action [, triggered rule]).
"""

import pytest

from the_algorithm_tpu.pipeline import visibility_rules as VR
from the_algorithm_tpu.pipeline.visibility import Action, SafetyLevel

L = SafetyLevel


@pytest.fixture(scope="module")
def engine():
    return VR.catalog_engine()


def test_catalog_has_thirty_plus_rules():
    assert len(VR.all_rule_names()) >= 30


CASES = [
    # (id, level, features, expected action, expected rule or None)
    ("clean-allow", L.TIMELINE_HOME, {}, Action.ALLOW, None),
    ("deleted-drop", L.TIMELINE_HOME, {"is_deleted": True}, Action.DROP,
     "DropDeletedTweet"),
    ("abusive-label-drop", L.TIMELINE_HOME,
     {"tweet_labels": {"abusive"}}, Action.DROP, "AbusiveTweetLabelRule"),
    ("abusive-self-allow", L.TIMELINE_HOME,
     {"tweet_labels": {"abusive"}, "viewer_is_author": True},
     Action.ALLOW, None),
    ("abusive-hr-follower-allow", L.TIMELINE_HOME,
     {"tweet_labels": {"abusive_high_recall"},
      "viewer_follows_author": True}, Action.ALLOW, None),
    ("abusive-hr-nonfollower-drop", L.TIMELINE_HOME,
     {"tweet_labels": {"abusive_high_recall"}}, Action.DROP,
     "AbusiveHighRecallNonFollowerTweetLabelRule"),
    ("nsfw-interstitial", L.TIMELINE_HOME,
     {"tweet_labels": {"nsfw_high_precision"}}, Action.INTERSTITIAL,
     "NsfwHighPrecisionTweetLabelRule"),
    ("nsfw-opt-in-allow", L.TIMELINE_HOME,
     {"tweet_labels": {"nsfw_high_precision"}, "nsfw_opt_in": True},
     Action.ALLOW, None),
    ("gore-interstitial", L.TIMELINE_HOME,
     {"tweet_labels": {"gore_and_violence"}}, Action.INTERSTITIAL,
     "GoreAndViolenceTweetLabelRule"),
    ("toxicity-downrank", L.TIMELINE_HOME, {"toxicity_score": 0.92},
     Action.DOWNRANK, "HighToxicityScoreDownrankHighQualitySectionRule"),
    ("toxicity-below-threshold-allow", L.TIMELINE_HOME,
     {"toxicity_score": 0.9}, Action.ALLOW, None),
    ("pdna-drop", L.TIMELINE_HOME, {"tweet_labels": {"pdna"}}, Action.DROP,
     "PdnaTweetLabelRule"),
    ("suspended-drop", L.TIMELINE_HOME, {"author_is_suspended": True},
     Action.DROP, "SuspendedAuthorRule"),
    ("fosnr-interstitial", L.TIMELINE_HOME,
     {"tweet_labels": {"fosnr_restricted"}}, Action.INTERSTITIAL,
     "FosnrInterstitialRule"),
    ("public-interest", L.TIMELINE_HOME,
     {"tweet_labels": {"public_interest"}}, Action.INTERSTITIAL,
     "PublicInterestInterstitialRule"),
    ("muted-nonfollow-drop", L.TIMELINE_HOME,
     {"viewer_mutes_author": True}, Action.DROP, "DropViewerMutedAuthor"),
    ("muted-but-following-allow", L.TIMELINE_HOME,
     {"viewer_mutes_author": True, "viewer_follows_author": True},
     Action.ALLOW, None),
    # profile timelines: author's own content stays visible
    ("profile-abusive-allow", L.TIMELINE_PROFILE,
     {"tweet_labels": {"abusive"}}, Action.ALLOW, None),
    ("profile-pdna-drop", L.TIMELINE_PROFILE, {"tweet_labels": {"pdna"}},
     Action.DROP, "PdnaTweetLabelRule"),
    ("profile-suspended-drop", L.TIMELINE_PROFILE,
     {"author_is_suspended": True}, Action.DROP, "SuspendedAuthorRule"),
    # safe search
    ("search-nsfw-drop", L.SEARCH, {"is_nsfw_media": True}, Action.DROP,
     "SafeSearchNsfwDropRule"),
    ("search-nsfw-opt-in-interstitial-not-drop", L.SEARCH,
     {"tweet_labels": {"nsfw_high_precision"}, "nsfw_opt_in": True},
     Action.ALLOW, None),
    ("search-untrusted-url-drop", L.SEARCH,
     {"tweet_labels": {"untrusted_url"}}, Action.DROP, None),
    # recommendations hard drops
    ("recs-nsfw-drop", L.RECOMMENDATIONS, {"is_nsfw_media": True},
     Action.DROP, "DropNsfwFromRecs"),
    ("recs-toxicity-drop-at-lower-threshold", L.RECOMMENDATIONS,
     {"toxicity_score": 0.85}, Action.DROP, "DropHighToxicityFromRecs"),
    ("recs-not-interested-drop", L.RECOMMENDATIONS,
     {"viewer_not_interested": True}, Action.DROP,
     "DropNotInterestedAuthorFromRecs"),
    ("home-toxicity-085-only-downranks", L.TIMELINE_HOME,
     {"toxicity_score": 0.85}, Action.ALLOW, None),
    # notifications
    ("notif-spam-author-drop", L.NOTIFICATIONS,
     {"author_labels": {"spam"}}, Action.DROP, "SpamAuthorLabelRule"),
    ("notif-not-graduated-downrank", L.NOTIFICATIONS,
     {"author_labels": {"not_graduated"}}, Action.DOWNRANK,
     "NotGraduatedConversationsAuthorLabelRule"),
]


@pytest.mark.parametrize(
    "case_id,level,features,want_action,want_rule",
    CASES, ids=[c[0] for c in CASES],
)
def test_rule_table(engine, case_id, level, features, want_action, want_rule):
    res = engine.evaluate(level, features)
    assert res.action == want_action
    if want_rule is not None:
        assert want_rule in res.triggered_rules


def test_fail_closed_rule_drops_on_error(engine):
    """PdnaTweetLabelRule is fail-closed: a broken feature map drops."""

    class Exploding(dict):
        def get(self, k, default=None):
            raise RuntimeError("store unavailable")

    res = engine.evaluate(L.TIMELINE_PROFILE, Exploding())
    assert res.action == Action.DROP


def test_severity_ordering_drop_beats_downrank(engine):
    res = engine.evaluate(
        L.TIMELINE_HOME,
        {"toxicity_score": 0.99, "tweet_labels": {"abusive"}},
    )
    assert res.action == Action.DROP


def test_decider_gate_disables_rule():
    from the_algorithm_tpu.pipeline.visibility import (
        Rule, VisibilityRuleEngine,
    )

    rule = VR.TWEET_LABEL_RULES[0]
    import dataclasses

    gated = dataclasses.replace(rule, enabled=lambda: False)
    eng = VisibilityRuleEngine({L.TIMELINE_HOME: [gated]})
    res = eng.evaluate(L.TIMELINE_HOME, {"tweet_labels": {"abusive"}})
    assert res.action == Action.ALLOW


class TestStoreBackedRules:
    def test_country_withheld_and_author_state(self):
        from the_algorithm_tpu.pipeline import visibility_rules as vr
        from the_algorithm_tpu.pipeline.visibility import Action, SafetyLevel
        from the_algorithm_tpu.search.ingester import AuthorState
        from the_algorithm_tpu.storage.tweetypie import TakedownStore

        td = TakedownStore()
        td.withhold(7, ["DE"])
        states = {9: AuthorState.SUSPENDED}
        engine = vr.catalog_engine_with_stores(
            takedowns=td, author_state_fn=states.get
        )
        # withheld in the viewer's country → DROP
        res = engine.evaluate(SafetyLevel.TIMELINE_HOME, {
            "tweet_id": 7, "viewer_country": "DE", "author_id": 1,
        })
        assert res.action == Action.DROP
        assert res.reason == "withheld_in_country"
        # same tweet elsewhere → ALLOW
        assert engine.evaluate(SafetyLevel.TIMELINE_HOME, {
            "tweet_id": 7, "viewer_country": "US", "author_id": 1,
        }).action == Action.ALLOW
        # suspended author → DROP at every level
        for lvl in SafetyLevel:
            assert engine.evaluate(lvl, {
                "tweet_id": 1, "author_id": 9,
            }).action == Action.DROP

    def test_unknown_author_allowed(self):
        from the_algorithm_tpu.pipeline import visibility_rules as vr
        from the_algorithm_tpu.pipeline.visibility import Action, SafetyLevel

        engine = vr.catalog_engine_with_stores(author_state_fn=lambda a: None)
        assert engine.evaluate(SafetyLevel.SEARCH, {
            "tweet_id": 1, "author_id": 5,
        }).action == Action.ALLOW


# -- round-2 expansion: new families ≡ ToxicityReplyFilterRules / CardRules /
# DmRules / SpaceRules / SensitiveMediaSettingsRules / AdvancedFilteringRules /
# UserUnavailableStateTombstoneRules


class TestExpandedCatalog:
    def setup_method(self):
        self.engine = VR.catalog_engine()

    def _eval(self, level, **feats):
        return self.engine.evaluate(level, feats)

    def test_catalog_size(self):
        # round-3 breadth bar: ≥150 rules across ≥20 surface levels, every
        # enum level bound to a policy (≡ RuleBase.scala's level→policy map)
        from the_algorithm_tpu.pipeline.visibility import SafetyLevel as SL

        assert len(VR.all_rule_names()) >= 150
        assert len(VR.CATALOG_RULES) >= 20
        assert set(VR.CATALOG_RULES) == set(SL)

    def test_toxic_reply_tombstone_in_conversation(self):
        res = self._eval(SafetyLevel.CONVERSATION,
                         is_reply=True, toxicity_score=0.98)
        assert res.action == Action.TOMBSTONE
        # author always sees own reply
        res = self._eval(SafetyLevel.CONVERSATION, is_reply=True,
                         toxicity_score=0.98, viewer_is_author=True)
        assert res.action == Action.ALLOW
        # mid-toxicity → downrank (abusive-quality section)
        res = self._eval(SafetyLevel.CONVERSATION,
                         is_reply=True, toxicity_score=0.93)
        assert res.action == Action.DOWNRANK

    def test_hidden_by_author(self):
        res = self._eval(SafetyLevel.CONVERSATION,
                         is_reply=True, hidden_by_author=True)
        assert res.action == Action.TOMBSTONE

    def test_malware_card_dropped_everywhere_cards_apply(self):
        for lvl in (SafetyLevel.TIMELINE_HOME, SafetyLevel.SEARCH,
                    SafetyLevel.CONVERSATION):
            res = self._eval(lvl, tweet_labels={"malware_url"})
            assert res.action == Action.DROP, lvl

    def test_dm_rules(self):
        res = self._eval(SafetyLevel.DIRECT_MESSAGES,
                         viewer_blocks_author=True)
        assert res.action == Action.DROP
        res = self._eval(SafetyLevel.DIRECT_MESSAGES, is_deleted=True)
        assert res.action >= Action.TOMBSTONE
        res = self._eval(SafetyLevel.DIRECT_MESSAGES,
                         tweet_labels={"spam_high_recall"})
        assert res.action == Action.DROP
        # followed sender's request is not spam-dropped
        res = self._eval(SafetyLevel.DIRECT_MESSAGES,
                         tweet_labels={"spam_high_recall"},
                         viewer_follows_author=True)
        assert res.action == Action.ALLOW

    def test_spaces(self):
        res = self._eval(SafetyLevel.SPACES,
                         author_labels={"coordinated_harmful_activity"})
        assert res.action == Action.DROP
        res = self._eval(SafetyLevel.SPACES, tweet_labels={"hateful_terms"})
        assert res.action == Action.INTERSTITIAL

    def test_sensitive_media_viewer_settings(self):
        # viewer set adult_content to drop
        res = self._eval(SafetyLevel.TIMELINE_HOME,
                         media_categories={"adult_content"},
                         media_setting_adult_content="drop")
        assert res.action == Action.DROP
        # default setting: interstitial
        res = self._eval(SafetyLevel.TIMELINE_HOME,
                         media_categories={"graphic_violence"})
        assert res.action == Action.INTERSTITIAL
        # viewer allows → no sensitive-media action
        res = self._eval(SafetyLevel.TIMELINE_HOME,
                         media_categories={"adult_content"},
                         media_setting_adult_content="allow")
        assert res.action == Action.ALLOW

    def test_advanced_filtering_respects_follow_edge(self):
        feats = dict(viewer_filters_new_accounts=True,
                     author_is_new_account=True)
        assert self._eval(SafetyLevel.TIMELINE_HOME, **feats).action == Action.DROP
        feats["viewer_follows_author"] = True
        assert self._eval(SafetyLevel.TIMELINE_HOME, **feats).action == Action.ALLOW

    def test_user_unavailable_tombstone_fail_closed(self):
        res = self._eval(SafetyLevel.CONVERSATION,
                         author_labels={"deactivated"})
        assert res.action == Action.TOMBSTONE

    def test_tombstone_removed_by_filter(self):
        from the_algorithm_tpu.pipeline.visibility import VisibilityFilter
        from the_algorithm_tpu.pipeline.component import Candidate

        f = VisibilityFilter(self.engine, SafetyLevel.CONVERSATION)
        cands = [Candidate(id=1, features={"is_reply": True,
                                           "toxicity_score": 0.99}),
                 Candidate(id=2, features={})]
        res = f.apply(None, cands, None)
        assert [c.id for c in res.kept] == [2]
        assert res.removed[0].features["visibility_reason"] == "toxic_reply_hidden"


# -- round-3 expansion: ≥150 rules / 27 levels, FOSNR ladder, public-interest
# per-policy rules, quoted-tweet tombstones, ads brand safety, trends gates,
# push strictness, muted keywords, and the per-(level,rule,action) metric
# recorder (≡ VisibilityResultsMetricRecorder.scala:21-167)


class TestRoundThreeCatalog:
    def setup_method(self):
        self.engine = VR.catalog_engine()

    def _eval(self, level, **feats):
        return self.engine.evaluate(level, feats)

    def test_every_level_allows_clean_content(self):
        # FilterAll / FilterAllPlaceholder exist to remove everything
        drop_all_levels = {SafetyLevel.FILTER_ALL,
                           SafetyLevel.FILTER_ALL_PLACEHOLDER}
        for level in SafetyLevel:
            res = self._eval(level)
            if level in drop_all_levels:
                assert res.action == Action.DROP, (level, res)
            else:
                assert res.action == Action.ALLOW, (level, res)

    def test_fosnr_ladder(self):
        # ranked home: interstitial + downrank, never drop for followers
        res = self._eval(SafetyLevel.TIMELINE_HOME,
                         tweet_labels={"fosnr_restricted"},
                         viewer_follows_author=True)
        assert res.action == Action.INTERSTITIAL
        # recommendations: non-follower amplification drop
        res = self._eval(SafetyLevel.RECOMMENDATIONS,
                         tweet_labels={"fosnr_restricted"})
        assert res.action == Action.DROP
        # the author always sees their own content un-dropped
        res = self._eval(SafetyLevel.RECOMMENDATIONS,
                         tweet_labels={"fosnr_restricted"},
                         viewer_is_author=True, viewer_follows_author=True)
        assert res.action != Action.DROP

    def test_public_interest_per_policy(self):
        res = self._eval(SafetyLevel.TIMELINE_HOME,
                         tweet_labels={"public_interest_civic_integrity"},
                         viewer_follows_author=True)
        assert res.action == Action.INTERSTITIAL
        res = self._eval(SafetyLevel.RECOMMENDATIONS,
                         tweet_labels={"public_interest_civic_integrity"})
        assert res.action == Action.DROP  # no amplification

    def test_quoted_tweet_tombstones(self):
        res = self._eval(SafetyLevel.QUOTED_TWEET, is_deleted=True)
        assert res.action == Action.TOMBSTONE
        res = self._eval(SafetyLevel.QUOTED_TWEET, author_blocks_viewer=True)
        assert res.action == Action.TOMBSTONE
        res = self._eval(SafetyLevel.QUOTED_TWEET, is_nsfw_media=True)
        assert res.action == Action.INTERSTITIAL

    def test_ads_brand_safety(self):
        assert self._eval(SafetyLevel.ADS,
                          toxicity_score=0.75).action == Action.DROP
        assert self._eval(SafetyLevel.ADS,
                          tweet_labels={"misinfo_civic"}).action == Action.DROP
        # the same toxicity passes the home timeline
        assert self._eval(SafetyLevel.TIMELINE_HOME,
                          toxicity_score=0.75).action == Action.ALLOW

    def test_trends_representative_tweet_strict(self):
        assert self._eval(SafetyLevel.TRENDS_REPRESENTATIVE_TWEET,
                          pspammy_score=0.7).action == Action.DROP
        assert self._eval(SafetyLevel.TIMELINE_HOME,
                          pspammy_score=0.7).action == Action.ALLOW

    def test_push_stricter_than_notifications(self):
        feats = dict(toxicity_score=0.65)
        assert self._eval(SafetyLevel.NOTIFICATIONS, **feats).action \
            == Action.ALLOW
        assert self._eval(SafetyLevel.NOTIFICATIONS_PUSH, **feats).action \
            == Action.DROP

    def test_muted_keywords(self):
        feats = dict(viewer_muted_keywords=("spoilers",),
                     tweet_keywords=("big", "spoilers", "here"))
        assert self._eval(SafetyLevel.TIMELINE_HOME, **feats).action \
            == Action.DROP
        # viewer-owned surfaces don't apply keyword mutes
        assert self._eval(SafetyLevel.TIMELINE_BOOKMARK, **feats).action \
            == Action.ALLOW

    def test_viewer_owned_surfaces_permissive(self):
        feats = dict(tweet_labels={"spam_high_recall"})
        assert self._eval(SafetyLevel.TIMELINE_HOME, **feats).action \
            == Action.DROP
        assert self._eval(SafetyLevel.TIMELINE_FAVORITES, **feats).action \
            == Action.ALLOW
        # but legal withholding still applies everywhere
        assert self._eval(SafetyLevel.TIMELINE_FAVORITES,
                          tweet_labels={"dmca_withheld"}).action \
            == Action.TOMBSTONE

    def test_embedded_fail_closed_nsfw(self):
        assert self._eval(SafetyLevel.EMBEDDED_TWEET,
                          is_nsfw_media=True).action == Action.DROP
        assert self._eval(SafetyLevel.EMBEDDED_TWEET,
                          author_is_protected=True).action == Action.DROP

    def test_violent_threat_fail_closed(self):
        # condition error on a fail-closed rule must DROP
        class Boom:
            def __contains__(self, item):
                raise RuntimeError("label store down")

        res = self._eval(SafetyLevel.TIMELINE_HOME, tweet_labels=Boom())
        assert res.action == Action.DROP


class TestMetricRecorder:
    def test_per_level_rule_action_matrix(self):
        from the_algorithm_tpu.pipeline.visibility import (
            VisibilityResultsMetricRecorder, VisibilityRuleEngine,
        )

        rec = VisibilityResultsMetricRecorder()
        engine = VisibilityRuleEngine(VR.CATALOG_RULES, recorder=rec)
        engine.evaluate(SafetyLevel.TIMELINE_HOME, {"is_deleted": True})
        engine.evaluate(SafetyLevel.TIMELINE_HOME, {})
        engine.evaluate(SafetyLevel.ADS, {"toxicity_score": 0.9})

        assert rec.triggered(SafetyLevel.TIMELINE_HOME,
                             "DropDeletedTweet") == 1
        assert rec.triggered(SafetyLevel.ADS, "AdsDropHighToxicityRule") == 1
        # evaluated counts present per (level, rule)
        m = rec.matrix()
        home = SafetyLevel.TIMELINE_HOME.value
        assert m[(home, "DropDeletedTweet", "evaluated")] == 2
        # final-verdict distribution per level
        assert rec.verdict_counts[(home, "DROP")] == 1
        assert rec.verdict_counts[(home, "ALLOW")] == 1
        assert rec.verdict_counts[(SafetyLevel.ADS.value, "DROP")] == 1


class TestFullCatalogBreadth:
    """Round-4 catalog completion: all 198 reference SafetyLevels with a
    policy, ≥350 distinct rules, and representative outcomes per new
    family (DM, Spaces, SafeSearch, SearchBlender user rules,
    ToxicityReplyFilter, UserUnavailableState tombstones, communities,
    bounce, crisis, UQF)."""

    def _eval(self, level, **features):
        engine = VR.catalog_engine()
        return engine.evaluate(level, features)

    def test_level_count_matches_reference_enum(self):
        # 198 case objects in SafetyLevel.scala
        assert len(SafetyLevel) == 198
        assert len(VR.CATALOG_RULES) == 198
        assert len(VR.all_rule_names()) >= 350

    def test_every_level_has_policy_entry(self):
        for lvl in SafetyLevel:
            assert lvl in VR.CATALOG_RULES

    def test_filter_levels(self):
        assert self._eval(SafetyLevel.FILTER_NONE,
                          tweet_labels={"abusive"}).action == Action.ALLOW
        assert self._eval(SafetyLevel.FILTER_ALL).action == Action.DROP

    def test_dm_conversation_family(self):
        lvl = SafetyLevel.DIRECT_MESSAGES_CONVERSATION_TIMELINE
        assert self._eval(lvl, author_labels={"suspended"},
                          ).action == Action.DROP
        assert self._eval(lvl, is_deleted=True).action >= Action.TOMBSTONE
        assert self._eval(
            lvl, is_nsfw_media=True).action >= Action.INTERSTITIAL
        # malware in a DM event always drops (fail-closed family)
        assert self._eval(lvl, tweet_labels={"malware_url"},
                          ).action == Action.DROP

    def test_spaces_family(self):
        assert self._eval(SafetyLevel.SPACES,
                          author_labels={"coordinated_harmful_activity"},
                          ).action == Action.DROP
        assert self._eval(SafetyLevel.SPACE_FLEETLINE,
                          author_labels={"do_not_amplify"},
                          ).action == Action.DROP
        assert self._eval(SafetyLevel.SPACES,
                          author_labels={"deactivated"},
                          ).action >= Action.TOMBSTONE

    def test_safe_search_family(self):
        assert self._eval(SafetyLevel.SAFE_SEARCH_STRICT,
                          tweet_labels={"nsfw_high_precision"},
                          ).action == Action.DROP
        assert self._eval(SafetyLevel.SAFE_SEARCH_MINIMAL,
                          tweet_labels={"abusive"}).action == Action.DROP

    def test_search_blender_user_rules(self):
        lvl = SafetyLevel.SEARCH_BLENDER_USER_RULES
        assert self._eval(lvl, author_labels={"suspended"},
                          ).action == Action.DROP
        assert self._eval(lvl, author_labels={"nsfw_avatar_image"},
                          ).action == Action.DROP

    def test_toxicity_reply_filter_levels(self):
        lvl = SafetyLevel.TIMELINE_CONVERSATIONS_DOWNRANKING
        assert self._eval(lvl, is_reply=True,
                          toxicity_score=0.98).action >= Action.TOMBSTONE
        lvl = SafetyLevel.TIMELINE_CONVERSATIONS_DOWNRANKING_MINIMAL
        assert self._eval(lvl, is_reply=True,
                          toxicity_score=0.93).action == Action.DOWNRANK

    def test_user_unavailable_tombstones(self):
        lvl = SafetyLevel.TOMBSTONING
        assert self._eval(lvl, author_labels={"erased"},
                          ).action == Action.TOMBSTONE
        assert self._eval(lvl, tweet_labels={"bounce"},
                          ).action >= Action.TOMBSTONE

    def test_community_family(self):
        lvl = SafetyLevel.TIMELINE_HOME_COMMUNITIES
        assert self._eval(lvl, is_community_tweet=True,
                          community_tweet_hidden=True,
                          ).action >= Action.LIMITED_ENGAGEMENTS
        # non-member of a protected community never sees the tweet
        assert self._eval(lvl, is_community_tweet=True,
                          community_is_protected=True,
                          ).action >= Action.TOMBSTONE

    def test_bounce_family(self):
        assert self._eval(SafetyLevel.TIMELINE_HOME,
                          tweet_labels={"bounce"}).action == Action.DROP
        assert self._eval(SafetyLevel.TWEET_DETAIL, is_deleted=True,
                          tweet_labels={"bounce"},
                          ).action >= Action.TOMBSTONE

    def test_crisis_family(self):
        assert self._eval(SafetyLevel.TIMELINE_HOME,
                          safety_crisis_level=2).action == Action.DROP
        assert self._eval(SafetyLevel.NOTIFICATIONS_PLATFORM_PUSH,
                          safety_crisis_level=2).action == Action.DROP

    def test_uqf_respects_viewer_setting(self):
        lvl = SafetyLevel.TIMELINE_HOME
        on = self._eval(lvl, tweet_labels={"low_quality"},
                        viewer_quality_filter_on=True)
        assert on.action == Action.DROP
        off = self._eval(lvl, tweet_labels={"low_quality"},
                         viewer_quality_filter_on=False)
        assert off.action <= Action.DOWNRANK

    def test_avoid_marks_ad_adjacency(self):
        res = self._eval(SafetyLevel.BRAND_SAFETY, toxicity_score=0.86)
        # ads surfaces avoid-or-drop moderately toxic adjacency
        assert res.action >= Action.AVOID

    def test_exclusive_tweet_gating(self):
        lvl = SafetyLevel.TIMELINE_PROFILE_SUPER_FOLLOWS
        assert self._eval(lvl, is_exclusive_tweet=True,
                          ).action >= Action.TOMBSTONE
        assert self._eval(lvl, is_exclusive_tweet=True,
                          viewer_is_subscribed=True).action == Action.ALLOW

    def test_des_data_apis_minimal_but_fail_closed(self):
        lvl = SafetyLevel.DES_HOME_TIMELINE
        assert self._eval(lvl).action == Action.ALLOW
        assert self._eval(lvl, tweet_labels={"pdna"}).action == Action.DROP
        res = self._eval(lvl, author_is_suspended=True)
        assert res.action == Action.DROP


class TestRound5RuleTail:
    """The r5 rule-tail families: sensitive-media per-label triads, the
    user-unavailable tombstone matrix, DM structural drops, misc tail —
    catalog ≥420 registered rules."""

    def setup_method(self):
        self.engine = VR.catalog_engine()

    def _eval(self, level, **feats):
        return self.engine.evaluate(level, feats)

    def test_catalog_size_r5(self):
        assert len(VR.all_rule_names()) >= 420

    def test_sensitive_media_per_label_triads(self):
        # drop setting: adult-content label → DROP on home; the same label
        # under interstitial setting → INTERSTITIAL
        res = self._eval(
            SafetyLevel.TIMELINE_HOME,
            tweet_labels={"nsfw_reported_heuristics"},
            media_setting_adult_content="drop")
        assert res.action == Action.DROP
        res = self._eval(
            SafetyLevel.TIMELINE_HOME,
            tweet_labels={"nsfw_video"},
            media_setting_graphic_violence="drop")  # wrong category: no-op
        assert res.action != Action.DROP
        res = self._eval(
            SafetyLevel.CONVERSATION,
            tweet_labels={"gore_and_violence_reported_heuristics"},
            media_setting_graphic_violence="drop")
        assert res.action >= Action.TOMBSTONE
        # the author always sees their own media
        res = self._eval(
            SafetyLevel.TIMELINE_HOME,
            tweet_labels={"nsfw_reported_heuristics"},
            media_setting_adult_content="drop", viewer_is_author=True)
        assert res.action == Action.ALLOW

    def test_user_unavailable_tombstone_matrix(self):
        for labels, feats in (
            ({"deactivated"}, {}),
            ({"erased"}, {"is_retweet": True}),
            ({"suspended"}, {"is_inner_quoted": True}),
        ):
            res = self._eval(SafetyLevel.CONVERSATION,
                             author_labels=labels, **feats)
            assert res.action >= Action.TOMBSTONE, (labels, feats)
        res = self._eval(SafetyLevel.CONVERSATION, is_retweet=True,
                         viewer_mutes_author=True)
        assert res.action >= Action.TOMBSTONE

    def test_dm_structural_drops(self):
        for flag_name in ("dm_conversation_info_undefined",
                          "dm_conversation_empty",
                          "dm_conversation_inaccessible",
                          "dm_event_non_perspectival"):
            res = self._eval(SafetyLevel.DIRECT_MESSAGES,
                             **{flag_name: True})
            assert res.action == Action.DROP, flag_name
        res = self._eval(SafetyLevel.DIRECT_MESSAGES,
                         dm_is_welcome_message=True,
                         viewer_is_recipient=False)
        assert res.action == Action.DROP
        res = self._eval(SafetyLevel.DIRECT_MESSAGES,
                         dm_is_welcome_message=True,
                         viewer_is_recipient=True)
        assert res.action == Action.ALLOW

    def test_misc_tail(self):
        res = self._eval(SafetyLevel.TIMELINE_HOME,
                         tweet_labels={"abuse_policy_episodic"})
        assert res.action >= Action.LIMITED_ENGAGEMENTS
        res = self._eval(SafetyLevel.NOTIFICATIONS,
                         is_reply=True, toxicity_score=0.95)
        assert res.action == Action.DROP
