"""Visibility rule engine: SafetyLevel × content features → Action.

≡ ``visibilitylib/`` (SURVEY.md §2.1): ``VisibilityLibrary`` +
``DeciderableVisibilityRuleEngine.scala:12-21`` evaluate condition-gated
rules per SafetyLevel surface; actions are Allow / Drop / Interstitial /
Downrank (``rules/{Action,Condition,DownrankingRules}.scala``); rules can
fail closed (``FailClosedException``), and the engine short-circuits at the
first terminal action. Metrics per rule
(``VisibilityResultsMetricRecorder.scala:21-167``).

In-process: content/viewer state is a plain FeatureMap; rules are predicates
with an action and an optional decider gate; the engine evaluates the
safety-level's rule sequence in order.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Dict, List, Mapping, Optional, Sequence

from the_algorithm_tpu.core.metrics import NullStats, StatsReceiver


class Action(enum.IntEnum):
    """≡ rules/Action.scala terminal actions (severity-ordered)."""

    ALLOW = 0
    DOWNRANK = 1
    INTERSTITIAL = 2
    TOMBSTONE = 3  # replace with "unavailable" placeholder (threads/DMs)
    DROP = 4


class SafetyLevel(enum.Enum):
    """Per-surface rule sets (≡ the reference's SafetyLevel space — one
    level per product surface, each bound to its own policy in
    ``rules/RuleBase.scala``'s level→policy map)."""

    # home timelines
    TIMELINE_HOME = "timeline_home"
    TIMELINE_HOME_LATEST = "timeline_home_latest"  # chron Following
    TIMELINE_HOME_RECOMMENDATIONS = "timeline_home_recommendations"
    # profile / user-content timelines
    TIMELINE_PROFILE = "timeline_profile"
    TIMELINE_FAVORITES = "timeline_favorites"
    TIMELINE_BOOKMARK = "timeline_bookmark"
    TIMELINE_LISTS = "timeline_lists"
    TIMELINE_MEDIA = "timeline_media"
    # search verticals
    SEARCH = "search"  # top
    SEARCH_LATEST = "search_latest"
    SEARCH_MEDIA = "search_media"
    SEARCH_PEOPLE = "search_people"
    # recommendation surfaces
    RECOMMENDATIONS = "recommendations"
    RECOMMENDATIONS_VIDEO = "recommendations_video"
    TOPIC_RECOMMENDATIONS = "topic_recommendations"
    TRENDS_REPRESENTATIVE_TWEET = "trends_representative_tweet"
    # notifications
    NOTIFICATIONS = "notifications"
    NOTIFICATIONS_PUSH = "notifications_push"
    # threads
    CONVERSATION = "conversation"  # reply threads (ToxicityReplyFilter)
    QUOTED_TWEET = "quoted_tweet"  # inner tweet of a quote
    # messaging
    DIRECT_MESSAGES = "direct_messages"  # DmConversation/DmEventRules
    DIRECT_MESSAGES_INBOX = "direct_messages_inbox"
    DIRECT_MESSAGES_SEARCH = "direct_messages_search"
    # audio / live
    SPACES = "spaces"  # SpaceRules
    SPACES_SHARING = "spaces_sharing"  # space share cards in timelines
    # monetized / syndicated
    ADS = "ads"
    EMBEDDED_TWEET = "embedded_tweet"  # publisher embeds (logged-out)


@dataclasses.dataclass(frozen=True)
class Rule:
    """Condition → action, optionally decider-gated and fail-closed."""

    name: str
    condition: Callable[[Mapping], bool]  # features → applies?
    action: Action
    reason: str = ""
    enabled: Callable[[], bool] = lambda: True  # the Decider gate
    fail_closed: bool = False  # condition error ⇒ DROP (vs skip)


@dataclasses.dataclass
class VisibilityResult:
    action: Action
    triggered_rules: List[str]
    reason: str = ""


class VisibilityResultsMetricRecorder:
    """Per-(SafetyLevel, Rule, Action) evaluation matrix
    (≡ ``VisibilityResultsMetricRecorder.scala:21-167``: the reference
    records evaluated/triggered/failed counts per rule scoped under the
    safety level, plus the final verdict distribution per level)."""

    def __init__(self):
        # (level.value, rule_name, outcome) -> count; outcome is
        # "evaluated" | "triggered" | "failed" | "disabled"
        self.rule_counts: Dict[tuple, int] = {}
        # (level.value, action.name) -> count of final verdicts
        self.verdict_counts: Dict[tuple, int] = {}

    def record_rule(self, level: SafetyLevel, rule: str, outcome: str) -> None:
        k = (level.value, rule, outcome)
        self.rule_counts[k] = self.rule_counts.get(k, 0) + 1

    def record_verdict(self, level: SafetyLevel, action: Action) -> None:
        k = (level.value, action.name)
        self.verdict_counts[k] = self.verdict_counts.get(k, 0) + 1

    def matrix(self) -> Dict[tuple, int]:
        """The full (level, rule, outcome) count matrix."""
        return dict(self.rule_counts)

    def triggered(self, level: SafetyLevel, rule: str) -> int:
        return self.rule_counts.get((level.value, rule, "triggered"), 0)


class VisibilityRuleEngine:
    def __init__(
        self,
        rules_by_level: Mapping[SafetyLevel, Sequence[Rule]],
        stats: Optional[StatsReceiver] = None,
        short_circuit: bool = True,
        recorder: Optional[VisibilityResultsMetricRecorder] = None,
    ):
        self.rules_by_level = dict(rules_by_level)
        self.stats = stats or NullStats()
        self.short_circuit = short_circuit
        self.recorder = recorder

    def evaluate(
        self, level: SafetyLevel, features: Mapping
    ) -> VisibilityResult:
        """Most-severe action among triggered rules (short-circuit on DROP)."""
        rec = self.recorder
        result = VisibilityResult(Action.ALLOW, [])
        for rule in self.rules_by_level.get(level, ()):  # ordered
            if not rule.enabled():
                self.stats.counter(f"visibility/{rule.name}/disabled")
                if rec:
                    rec.record_rule(level, rule.name, "disabled")
                continue
            if rec:
                rec.record_rule(level, rule.name, "evaluated")
            try:
                applies = rule.condition(features)
            except Exception:
                self.stats.counter(f"visibility/{rule.name}/errors")
                if rec:
                    rec.record_rule(level, rule.name, "failed")
                # fail-closed rules drop on evaluation failure
                applies = rule.fail_closed
            if applies:
                self.stats.counter(f"visibility/{rule.name}/triggered")
                if rec:
                    rec.record_rule(level, rule.name, "triggered")
                result.triggered_rules.append(rule.name)
                if rule.action > result.action:
                    result.action = rule.action
                    result.reason = rule.reason or rule.name
                if self.short_circuit and result.action == Action.DROP:
                    break
        if rec:
            rec.record_verdict(level, result.action)
        return result


# -- standard rules (DownrankingRules / safety rules analog) -----------------


def _f(name, default=False):
    return lambda feats: bool(feats.get(name, default))


STANDARD_RULES: Dict[SafetyLevel, List[Rule]] = {
    SafetyLevel.TIMELINE_HOME: [
        Rule("DropDeletedTweet", _f("is_deleted"), Action.DROP, "deleted"),
        Rule(
            "DropAuthorBlockedViewer",
            _f("author_blocks_viewer"),
            Action.DROP,
            "blocked",
        ),
        Rule(
            "DropViewerBlockedAuthor",
            _f("viewer_blocks_author"),
            Action.DROP,
            "blocked_by_viewer",
        ),
        Rule(
            "DropViewerMutedAuthor", _f("viewer_mutes_author"), Action.DROP,
            "muted",
        ),
        Rule(
            "NsfwMediaInterstitial", _f("is_nsfw_media"), Action.INTERSTITIAL,
            "nsfw_media",
        ),
        Rule(
            "DownrankHighToxicity",
            lambda f: f.get("toxicity_score", 0.0) > 0.9,
            Action.DOWNRANK,
            "toxicity",
        ),
        Rule(
            "DownrankSpamReported",
            lambda f: f.get("spam_score", 0.0) > 0.95,
            Action.DOWNRANK,
            "spam",
            fail_closed=False,
        ),
    ],
    SafetyLevel.RECOMMENDATIONS: [
        Rule("DropDeletedTweet", _f("is_deleted"), Action.DROP, "deleted"),
        Rule(
            "DropNsfwFromRecs", _f("is_nsfw_media"), Action.DROP, "nsfw_recs"
        ),
        Rule(
            "DropHighToxicityFromRecs",
            lambda f: f.get("toxicity_score", 0.0) > 0.8,
            Action.DROP,
            "toxicity_recs",
        ),
    ],
}


def standard_engine(stats=None) -> VisibilityRuleEngine:
    return VisibilityRuleEngine(STANDARD_RULES, stats=stats)


# -- pipeline integration ----------------------------------------------------


from the_algorithm_tpu.pipeline.component import Filter, FilterResult  # noqa: E402


class VisibilityFilter(Filter):
    """Global pipeline filter applying the rule engine per candidate.

    DROP removes; DOWNRANK multiplies the score by ``downrank_factor``;
    INTERSTITIAL keeps but flags (the marshaller renders the cover).
    """

    def __init__(
        self,
        engine: VisibilityRuleEngine,
        level: SafetyLevel,
        downrank_factor: float = 0.25,
    ):
        self.engine = engine
        self.level = level
        self.downrank_factor = downrank_factor

    def apply(self, query, candidates, params):
        kept, removed = [], []
        for c in candidates:
            res = self.engine.evaluate(self.level, c.features)
            if res.action in (Action.DROP, Action.TOMBSTONE):
                # ranked surfaces have no placeholder slot: a tombstone is
                # a removal here; thread/DM renderers consume the reason to
                # draw the "unavailable" card
                c.features["visibility_reason"] = res.reason
                removed.append(c)
                continue
            if res.action == Action.DOWNRANK and c.score is not None:
                c.score *= self.downrank_factor
                c.features["visibility_downranked"] = True
            if res.action == Action.INTERSTITIAL:
                c.features["visibility_interstitial"] = res.reason
            kept.append(c)
        return FilterResult(kept, removed)
