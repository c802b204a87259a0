"""Offline index-generation job: XLA program vs. dict-of-dicts oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.simclusters import index_generation as ig


def make_inputs(U=30, C=40, T=50, E=200, K=6, seed=0):
    rng = np.random.default_rng(seed)
    ii_ids = np.stack(
        [rng.choice(C, K, replace=False) for _ in range(U)]
    ).astype(np.int32)
    ii_scores = rng.uniform(0.1, 1.0, (U, K)).astype(np.float32)
    # pad some tail entries
    ii_ids[:, K - 1] = int(PAD_ID)
    ii_scores[:, K - 1] = 0.0
    events = ig.EventLog(
        jnp.asarray(rng.integers(0, U, E).astype(np.int32)),
        jnp.asarray(rng.integers(0, T, E).astype(np.int32)),
        jnp.asarray(rng.integers(0, 3, E).astype(np.int32)),
        jnp.asarray(rng.integers(0, 1000, E).astype(np.int32)),
    )
    return events, jnp.asarray(ii_ids), jnp.asarray(ii_scores)


def index_to_dict(index):
    ids = np.asarray(index.tweet_ids)
    sc = np.asarray(index.scores)
    out = {}
    for c in range(ids.shape[0]):
        row = [
            (int(t), float(s))
            for t, s in zip(ids[c], sc[c])
            if t != int(PAD_ID)
        ]
        if row:
            out[c] = row
    return out


class TestIndexGeneration:
    def test_matches_oracle(self):
        events, ii_ids, ii_scores = make_inputs()
        cfg = ig.IndexGenerationConfig(
            num_clusters=40, num_tweets=50, clusters_per_tweet=5,
            tweets_per_cluster=8, min_engagements=2,
            event_weights=(1.0, 0.5, 0.25),
        )
        now = 2000
        got = index_to_dict(
            jax.jit(
                lambda e, i, s: ig.generate_cluster_to_tweet_index(
                    e, i, s, cfg, jnp.asarray(now, jnp.int32)
                )
            )(events, ii_ids, ii_scores)
        )
        want = ig.generate_cluster_to_tweet_index_reference(
            events, ii_ids, ii_scores, cfg, now
        )
        assert set(got) == set(want)
        for c in want:
            got_ids = [t for t, _ in got[c]]
            want_ids = [t for t, _ in want[c]]
            assert got_ids == want_ids, f"cluster {c}"
            np.testing.assert_allclose(
                [s for _, s in got[c]], [s for _, s in want[c]], rtol=1e-4
            )

    def test_min_engagement_gate(self):
        # one event → tweet excluded when min_engagements=2
        events = ig.EventLog(
            jnp.asarray([0], jnp.int32), jnp.asarray([7], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([100], jnp.int32),
        )
        ii_ids = jnp.asarray([[3, 4]], jnp.int32)
        ii_scores = jnp.asarray([[1.0, 0.5]], jnp.float32)
        cfg = ig.IndexGenerationConfig(
            num_clusters=10, num_tweets=10, min_engagements=2,
            clusters_per_tweet=4, tweets_per_cluster=4,
        )
        idx = ig.generate_cluster_to_tweet_index(
            events, ii_ids, ii_scores, cfg, jnp.asarray(100, jnp.int32)
        )
        assert (np.asarray(idx.tweet_ids) == int(PAD_ID)).all()

    def test_event_weights_and_decay(self):
        # same user engages tweet 0 (type 0, fresh) and tweet 1 (type 1, old)
        events = ig.EventLog(
            jnp.asarray([0, 0], jnp.int32), jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([1000, 1000 - 3600], jnp.int32),
        )
        ii_ids = jnp.asarray([[5, PAD_ID]], jnp.int32)
        ii_scores = jnp.asarray([[2.0, 0.0]], jnp.float32)
        cfg = ig.IndexGenerationConfig(
            num_clusters=10, num_tweets=10, clusters_per_tweet=4,
            tweets_per_cluster=4, half_life_s=3600.0,
            event_weights=(1.0, 0.5),
        )
        idx = ig.generate_cluster_to_tweet_index(
            events, ii_ids, ii_scores, cfg, jnp.asarray(1000, jnp.int32)
        )
        d = index_to_dict(idx)
        scores = dict(d[5])
        np.testing.assert_allclose(scores[0], 2.0, rtol=1e-5)
        np.testing.assert_allclose(scores[1], 2.0 * 0.5 * 0.5, rtol=1e-5)
        # ranked: tweet 0 first in cluster 5's row
        assert d[5][0][0] == 0

    def test_video_view_variant_is_event_type_config(self):
        """The video-view job = same program, different weights (only type-3
        events contribute)."""
        events, ii_ids, ii_scores = make_inputs(E=100)
        cfg = ig.IndexGenerationConfig(
            num_clusters=40, num_tweets=50, clusters_per_tweet=5,
            tweets_per_cluster=8,
            event_weights=(0.0, 0.0, 1.0),  # only event type 2 counts
        )
        idx = ig.generate_cluster_to_tweet_index(
            events, ii_ids, ii_scores, cfg, jnp.asarray(2000, jnp.int32)
        )
        want = ig.generate_cluster_to_tweet_index_reference(
            events, ii_ids, ii_scores, cfg, 2000
        )
        got = index_to_dict(idx)
        assert set(got) == set(want)
