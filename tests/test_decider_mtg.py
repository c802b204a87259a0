"""Decider gates and multi-type graph assembly tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.core.decider import DECIDER_SCALE, Decider
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.simclusters import multi_type_graph as mtg


class TestDecider:
    def test_off_and_full(self):
        d = Decider({"feat": 0})
        assert not d.is_available_for_id("feat", 123)
        d.set_availability("feat", DECIDER_SCALE)
        assert d.is_available_for_id("feat", 123)

    def test_sticky_per_id(self):
        d = Decider({"x": 5000})
        decisions = [d.is_available_for_id("x", 42) for _ in range(10)]
        assert len(set(decisions)) == 1  # deterministic per id

    def test_fraction_roughly_respected(self):
        d = Decider({"x": 3000})
        hits = sum(d.is_available_for_id("x", i) for i in range(2000))
        assert 0.25 < hits / 2000 < 0.35

    def test_unknown_feature_off(self):
        assert not Decider().is_available_for_id("ghost", 1)

    def test_clamping(self):
        d = Decider()
        d.set_availability("x", 99999)
        assert d.availability("x") == DECIDER_SCALE


class TestMultiTypeGraph:
    def test_assemble_and_truncate(self):
        # right node 0, type 0: three edges with weights 3, 2, 1 → top-2 kept
        left = jnp.asarray([10, 11, 12, 20], jnp.int32)
        right = jnp.asarray([0, 0, 0, 1], jnp.int32)
        etype = jnp.asarray([0, 0, 0, 1], jnp.int32)
        w = jnp.asarray([2.0, 3.0, 1.0, 5.0])
        g = mtg.assemble(
            left, right, etype, w, num_right=2, num_types=2, top_k=2
        )
        assert np.asarray(g.left_ids[0, 0]).tolist() == [11, 10]  # by weight
        np.testing.assert_allclose(np.asarray(g.weights[0, 0]), [3.0, 2.0])
        assert np.asarray(g.left_ids[1, 1]).tolist() == [20, int(PAD_ID)]
        # untouched cells padded
        assert (np.asarray(g.left_ids[1, 0]) == int(PAD_ID)).all()

    def test_truncated_similarity(self):
        left = jnp.asarray([1, 2, 1, 3], jnp.int32)
        right = jnp.asarray([0, 0, 1, 1], jnp.int32)
        etype = jnp.zeros(4, jnp.int32)
        w = jnp.asarray([1.0, 1.0, 0.5, 1.0])
        g = mtg.assemble(
            left, right, etype, w, num_right=2, num_types=1, top_k=4
        )
        # shared left node 1: 1.0 * 0.5
        sim = float(mtg.truncated_similarity(g, jnp.int32(0), jnp.int32(1)))
        assert sim == pytest.approx(0.5)
