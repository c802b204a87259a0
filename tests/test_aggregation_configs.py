"""Aggregation config catalog: production group set, pre-transforms,
multi-key event folding, decayed read-back (≡ TimelinesAggregationConfig
Details.scala + TimelinesOnlineAggregationConfigBase.scala)."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.features import aggregation, aggregation_configs as ac


class TestCatalog:
    def test_breadth_and_unique_names(self):
        cat = ac.build_catalog()
        assert len(cat) >= 16
        names = [c.name for c in cat]
        assert len(names) == len(set(names))

    def test_output_names_globally_unique(self):
        all_names = []
        for c in ac.build_catalog():
            all_names += c.group.output_names()
        assert len(all_names) == len(set(all_names))
        assert len(all_names) >= 250  # real feature width across the catalog

    def test_key_families(self):
        keys = {c.keys for c in ac.build_catalog()}
        assert ("user",) in keys and ("user", "author") in keys
        assert ("tweet",) in keys and ("user", "topic") in keys

    def test_realtime_groups_use_short_halflives(self):
        for c in ac.build_catalog():
            if c.realtime:
                assert min(c.group.half_lives_s) <= 1800.0


class TestPreTransforms:
    BATCH = {
        "user_id": np.asarray([0, 1, 2]),
        "is_in_network": np.asarray([1, 1, 0]),
    }

    def test_remove_user_zero(self):
        np.testing.assert_array_equal(
            ac.remove_user_id_zero(self.BATCH), [False, True, True]
        )

    def test_in_and_out_network(self):
        np.testing.assert_array_equal(
            ac.filter_in_network(self.BATCH), [False, True, False]
        )
        np.testing.assert_array_equal(
            ac.filter_out_of_network(self.BATCH), [False, False, True]
        )


class TestApplyEvents:
    def _batch(self):
        B = 6
        return {
            "user_id": np.asarray([0, 1, 1, 2, 2, 2]),
            "author_id": np.asarray([5, 5, 5, 6, 6, 7]),
            "is_in_network": np.ones(6),
            "engagement": np.ones(6, np.float32),
            "timestamp": np.full(6, 1000, np.int32),
            **{l: np.asarray([1, 1, 0, 1, 0, 1], np.float32)
               for l in ac.LABELS_V2},
        }

    def test_user_author_fold_and_read(self):
        cfg = next(c for c in ac.build_catalog()
                   if c.name == "user_author_aggregate_v2_count")
        store, resolver = ac.init_stores([cfg], capacity=16)[cfg.name]
        store = ac.apply_events(cfg, store, resolver, self._batch())
        # user_id 0 filtered by RichRemoveUserIdZero; (1,5) got 2 events
        row = resolver.resolve([(1, 5)])
        vals = np.asarray(aggregation.read(
            cfg.group, store, jnp.asarray(row), jnp.int32(1000)))[0]
        # count is label-conditioned: (1,5) events have is_favorited=1,0
        names = cfg.group.output_names()
        fav_count_col = names.index(
            f"{cfg.group.name}.engagement.is_favorited.count.50d")
        assert vals[fav_count_col] == 1.0

    def test_decay_on_read(self):
        cfg = next(c for c in ac.build_catalog()
                   if c.name == "tweet_aggregate_realtime")
        store, resolver = ac.init_stores([cfg], capacity=8)[cfg.name]
        batch = self._batch()
        batch["tweet_id"] = np.asarray([9, 9, 9, 9, 9, 9])
        store = ac.apply_events(cfg, store, resolver, batch)
        row = resolver.resolve([(9,)])
        names = cfg.group.output_names()
        col = names.index(f"{cfg.group.name}.engagement.is_favorited.count.1800s")
        now_val = float(np.asarray(aggregation.read(
            cfg.group, store, jnp.asarray(row), jnp.int32(1000)))[0, col])
        later = float(np.asarray(aggregation.read(
            cfg.group, store, jnp.asarray(row), jnp.int32(1000 + 1800)))[0, col])
        np.testing.assert_allclose(later, now_val / 2.0, rtol=1e-5)

    def test_empty_after_transform_is_noop(self):
        cfg = next(c for c in ac.build_catalog()
                   if c.name == "user_aggregate_v2")
        store, resolver = ac.init_stores([cfg], capacity=8)[cfg.name]
        batch = self._batch()
        batch["user_id"] = np.zeros(6, np.int64)  # all removed
        out = ac.apply_events(cfg, store, resolver, batch)
        assert out is store
