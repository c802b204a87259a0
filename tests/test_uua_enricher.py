"""Staged UUA enrichment driver: repartition locality, local hydration
chaining, and the hydration-failure semantics (tolerate vs abort).

≡ ``unified_user_actions/enricher/driver/EnrichmentDriver.scala``.
"""

import dataclasses

import pytest

from the_algorithm_tpu.actions import enricher as en
from the_algorithm_tpu.actions.uua import ActionType, UnifiedUserAction


def _act(uid, tweet, author=None):
    return UnifiedUserAction(
        user_id=uid, action_type=ActionType.CLIENT_TWEET_FAV,
        item_id=tweet, timestamp_ms=1000, author_id=author)


PLAN = en.Plan((
    en.Stage(en.StageType.REPARTITION, ("REPARTITION_TWEET_ID",)),
    en.Stage(en.StageType.HYDRATION, ("HYDRATE_AUTHOR",)),
    en.Stage(en.StageType.HYDRATION, ("HYDRATE_AUTHOR_META",)),
))


class StoreHydrator(en.Hydrator):
    """Author lookup keyed by the REPARTITIONED key (asserts locality),
    with configurable failure behavior per tweet id."""

    def __init__(self, tweet_author, fail_ids=(), tolerate_ids=()):
        self.tweet_author = tweet_author
        self.fail_ids = set(fail_ids)
        self.tolerate_ids = set(tolerate_ids)
        self.calls = []

    def hydrate(self, instruction, key, envelope):
        a = envelope.action
        self.calls.append((instruction, key.value if key else None))
        if instruction == "HYDRATE_AUTHOR":
            # the repartition stage must have keyed us by tweet id
            assert key is not None and key.key_type == "tweet"
            assert key.value == a.item_id
            if a.item_id in self.fail_ids:
                raise en.HydrationError(f"store lost tweet {a.item_id}")
            if a.item_id in self.tolerate_ids:
                return envelope  # un-hydrated, tolerated
            envelope.action = dataclasses.replace(
                a, author_id=self.tweet_author[a.item_id])
            return envelope
        if instruction == "HYDRATE_AUTHOR_META":
            if a.author_id is not None:
                envelope.action = dataclasses.replace(
                    a, metadata=dict(a.metadata, author_rep=0.5))
            return envelope
        raise ValueError(instruction)


def test_staged_run_hydrates_through_repartition():
    hyd = StoreHydrator({101: 7, 102: 8})
    out = en.run_staged([_act(1, 101), _act(2, 102), _act(3, 101)],
                        PLAN, hyd)
    assert not out.dead_letters
    assert len(out.final) == 3
    by_tweet = {}
    for e in out.final:
        by_tweet.setdefault(e.action.item_id, []).append(e.action)
    assert all(a.author_id == 7 for a in by_tweet[101])
    assert all(a.author_id == 8 for a in by_tweet[102])
    # chained local hydration ran after the author fill
    assert all(e.action.metadata.get("author_rep") == 0.5
               for e in out.final)
    # repartition locality: the two tweet-101 events share one batch
    assert out.partitioned_batches == 2


def test_injected_failure_aborts_only_that_event():
    hyd = StoreHydrator({101: 7, 102: 8}, fail_ids={102})
    out = en.run_staged([_act(1, 101), _act(2, 102)], PLAN, hyd)
    assert len(out.final) == 1 and out.final[0].action.item_id == 101
    assert len(out.dead_letters) == 1
    env, why = out.dead_letters[0]
    assert env.action.item_id == 102 and "lost tweet" in why


def test_tolerated_failure_passes_unhydrated():
    hyd = StoreHydrator({101: 7}, tolerate_ids={103})
    out = en.run_staged([_act(1, 103)], PLAN, hyd)
    assert not out.dead_letters
    assert len(out.final) == 1
    a = out.final[0].action
    assert a.author_id is None  # tolerated: un-hydrated but delivered
    assert "author_rep" not in a.metadata


def test_driver_requires_final_topic_and_instruction_arity():
    hyd = StoreHydrator({})
    d = en.EnrichmentDriver(None, "p", hyd, en.DefaultPartitioner())
    done = en.Envelope(_act(1, 1), en.Plan(()))
    with pytest.raises(RuntimeError):
        d.execute(None, done)
    bad = en.Plan((en.Stage(en.StageType.REPARTITION,
                            ("A", "B")),))
    with pytest.raises(ValueError):
        d.execute(None, en.Envelope(_act(1, 1), bad))
