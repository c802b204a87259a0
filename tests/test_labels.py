"""Label closure: UUA-rule catalog ↔ MaskNet heads, attribution join, and
the scribe-log → training-examples path (timelines/prediction/features
label-feature analog)."""

import json

import numpy as np

from the_algorithm_tpu.actions.uua import ActionType, UnifiedUserAction
from the_algorithm_tpu.models import masknet
from the_algorithm_tpu.training import labels as lb


def act(user, tweet, t_s, atype, **meta):
    return UnifiedUserAction(
        user_id=user, action_type=atype, item_id=tweet,
        timestamp_ms=int(t_s * 1000), metadata=meta,
    )


def served_line(user, served_at, tweet_ids):
    return json.dumps({
        "key": "home", "user_id": user, "served_at": served_at,
        "candidates": [{"tweet_id": t, "score": 0.5, "source": "x",
                        "predicted": {}} for t in tweet_ids],
    })


class TestCatalog:
    def test_head_order_matches_masknet(self):
        assert lb.HEAD_NAMES == tuple(masknet.DEFAULT_HEAD_NAMES)

    def test_every_head_has_a_rule(self):
        assert len(lb.HEAD_LABEL_RULES) == 15


class TestRules:
    def h(self, name):
        return lb.HEAD_NAMES.index(name)

    def _labels(self, actions):
        served = [lb.ServedCandidate(1, 10, 100)]
        _, _, _, labels = lb.join_labels(served, actions)
        return labels[0]

    def test_fav_fires(self):
        row = self._labels([act(1, 10, 150, ActionType.CLIENT_TWEET_FAV)])
        assert row[self.h("fav")] == 1.0
        assert row.sum() == 1.0

    def test_good_click_requires_dwell(self):
        short = self._labels(
            [act(1, 10, 150, ActionType.CLIENT_TWEET_CLICK, dwell_s=30)]
        )
        long = self._labels(
            [act(1, 10, 150, ActionType.CLIENT_TWEET_CLICK, dwell_s=150)]
        )
        assert short[self.h("good_click_convo")] == 0.0
        assert long[self.h("good_click_convo")] == 1.0

    def test_reply_engaged_by_author_needs_meta(self):
        plain = self._labels([act(1, 10, 150, ActionType.CLIENT_TWEET_REPLY)])
        engaged = self._labels(
            [act(1, 10, 150, ActionType.CLIENT_TWEET_REPLY,
                 engaged_by_author=True)]
        )
        assert plain[self.h("reply")] == 1.0
        assert plain[self.h("reply_engaged_by_author")] == 0.0
        assert engaged[self.h("reply_engaged_by_author")] == 1.0

    def test_negative_feedback_family(self):
        row = self._labels([act(1, 10, 150, ActionType.CLIENT_BLOCK)])
        assert row[self.h("negative_feedback_v2")] == 1.0

    def test_dwell_threshold(self):
        row = self._labels(
            [act(1, 10, 150, ActionType.CLIENT_TWEET_LINGER, dwell_s=11)]
        )
        assert row[self.h("dwell")] == 1.0


class TestAttribution:
    def test_window_bounds(self):
        served = [lb.ServedCandidate(1, 10, 100)]
        before = act(1, 10, 99, ActionType.CLIENT_TWEET_FAV)
        after = act(1, 10, 100 + 24 * 3600 + 1, ActionType.CLIENT_TWEET_FAV)
        inside = act(1, 10, 500, ActionType.CLIENT_TWEET_FAV)
        _, _, _, l0 = lb.join_labels(served, [before, after])
        _, _, _, l1 = lb.join_labels(served, [inside])
        assert l0.sum() == 0.0 and l1.sum() == 1.0

    def test_wrong_user_or_tweet_no_attribution(self):
        served = [lb.ServedCandidate(1, 10, 100)]
        _, _, _, l = lb.join_labels(
            served,
            [act(2, 10, 150, ActionType.CLIENT_TWEET_FAV),
             act(1, 11, 150, ActionType.CLIENT_TWEET_FAV)],
        )
        assert l.sum() == 0.0

    def test_impression_dedup(self):
        served = [lb.ServedCandidate(1, 10, 100)] * 3
        u, t, ts, l = lb.join_labels(served, [])
        assert len(u) == 1


class TestTrainingExamples:
    def test_end_to_end_from_scribe_lines(self):
        lines = [served_line(1, 100, [10, 11, 12]),
                 served_line(2, 100, [10])]
        actions = [
            act(1, 10, 200, ActionType.CLIENT_TWEET_FAV),
            act(2, 10, 200, ActionType.CLIENT_TWEET_RETWEET),
        ]

        def feature_fn(users, tweets):
            return np.stack([users, tweets], axis=1).astype(np.float32)

        feats, labels = lb.build_training_examples(lines, actions, feature_fn)
        assert feats.shape == (4, 2) and labels.shape == (4, 15)
        fav = lb.HEAD_NAMES.index("fav")
        rt = lb.HEAD_NAMES.index("retweet")
        by_key = {(int(f[0]), int(f[1])): l for f, l in zip(feats, labels)}
        assert by_key[(1, 10)][fav] == 1.0
        assert by_key[(2, 10)][rt] == 1.0
        assert by_key[(1, 11)].sum() == 0.0

    def test_negative_downsample_keeps_positives(self):
        lines = [served_line(1, 100, list(range(100)))]
        actions = [act(1, 5, 200, ActionType.CLIENT_TWEET_FAV)]
        feats, labels = lb.build_training_examples(
            lines, actions, lambda u, t: np.zeros((len(u), 1)),
            negative_downsample=0.1, rng=np.random.default_rng(0),
        )
        assert labels.shape[0] < 60  # negatives heavily dropped
        assert labels.any(axis=1).sum() == 1  # the positive survived

    def test_scribe_side_effect_output_parses(self):
        """The producer (home-mixer scribe side effect) and consumer
        (parse_served_log) agree on the wire format."""
        from the_algorithm_tpu.mixers.feature_hydrators import (
            ScribeServedCandidatesSideEffect,
        )
        from the_algorithm_tpu.pipeline.component import Candidate

        sink = []
        eff = ScribeServedCandidatesSideEffect(sink.append)

        class Q:
            user_id = 9
            now = 1234

        eff.run(Q(), [Candidate(id=77, score=0.9, source="s",
                                features={"predicted_fav": 0.4})], None)
        served = lb.parse_served_log(sink)
        assert served[0].user_id == 9 and served[0].tweet_id == 77
        assert served[0].served_at == 1234
        assert served[0].predicted["predicted_fav"] == 0.4


class TestBehavioralClientEvents:
    def test_behavioral_actions_reach_their_heads(self):
        """Regression: bookmark/share/linger/open_link/screenshot raw
        client events must map through the adapter and set their heads."""
        from the_algorithm_tpu.actions.uua import client_event_adapter

        served = [lb.ServedCandidate(1, 10, 100)]
        raw = [
            {"user_id": 1, "item_type": "tweet", "action": a, "item_id": 10,
             "ts_ms": 150_000, **extra}
            for a, extra in [
                ("bookmark", {}), ("share", {}),
                ("linger", {"dwell_s": 20}), ("open_link", {}),
                ("screenshot", {}),
            ]
        ]
        actions = [a for e in raw for a in client_event_adapter(e)]
        assert len(actions) == 5
        _, _, _, labels = lb.join_labels(served, actions)
        for head in ("bookmark", "share", "dwell", "open_link", "screenshot"):
            assert labels[0, lb.HEAD_NAMES.index(head)] == 1.0, head
