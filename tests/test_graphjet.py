"""UTG/UVG related-tweets and UUG user-recommendation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.graph import graphjet, uteg
from the_algorithm_tpu.ops.sparse import PAD_ID


def build_bipartite(edges, num_users=10, num_tweets=20, lw=8, rw=8):
    """edges: list of (user, tweet, ts)."""
    left = uteg.init_graph(num_users, lw)
    right = graphjet.init_right_index(num_tweets, rw)
    us = np.asarray([e[0] for e in edges])
    ts_ = np.asarray([e[1] for e in edges])
    tm = np.asarray([e[2] for e in edges])
    left = uteg.record_engagements(
        left, us, ts_, np.ones_like(us), tm
    )
    right = graphjet.record_right(right, ts_, us, tm)
    return left, right


class TestRelatedTweets:
    def test_coengagement_counts_and_cosine(self):
        # users 0,1 engage tweets 5 and 6; user 2 engages 5 and 7
        edges = [(0, 5, 10), (0, 6, 11), (1, 5, 12), (1, 6, 13), (2, 5, 14), (2, 7, 15)]
        left, right = build_bipartite(edges)
        ids, scores, cooc = jax.jit(
            lambda t: graphjet.related_tweets(left, right, t, max_results=5)
        )(jnp.asarray(5, jnp.int32))
        ids, scores, cooc = map(np.asarray, (ids, scores, cooc))
        got = {int(i): (float(s), int(c)) for i, s, c in zip(ids, scores, cooc) if i != PAD_ID}
        # tweet 6: cooc 2 (users 0,1); tweet 7: cooc 1 (user 2)
        assert got[6][1] == 2 and got[7][1] == 1
        # cosine: deg(5)=3, deg(6)=2 → 2/sqrt(6); deg(7)=1 → 1/sqrt(3)
        np.testing.assert_allclose(got[6][0], 2 / np.sqrt(6), rtol=1e-5)
        np.testing.assert_allclose(got[7][0], 1 / np.sqrt(3), rtol=1e-5)
        assert ids[0] == 6  # higher cosine first

    def test_source_not_returned(self):
        edges = [(0, 5, 10), (0, 6, 11)]
        left, right = build_bipartite(edges)
        ids, _, _ = graphjet.related_tweets(
            left, right, jnp.asarray(5, jnp.int32), max_results=5
        )
        assert 5 not in np.asarray(ids).tolist()

    def test_min_cooccurrence_filters(self):
        edges = [(0, 5, 10), (0, 6, 11), (1, 5, 12), (1, 6, 13), (2, 5, 14), (2, 7, 15)]
        left, right = build_bipartite(edges)
        ids, _, _ = graphjet.related_tweets(
            left, right, jnp.asarray(5, jnp.int32), max_results=5,
            min_cooccurrence=2,
        )
        real = [i for i in np.asarray(ids).tolist() if i != PAD_ID]
        assert real == [6]

    def test_video_mask_is_uvg(self):
        edges = [(0, 5, 10), (0, 6, 11), (0, 7, 12), (1, 5, 13), (1, 6, 14), (1, 7, 15)]
        left, right = build_bipartite(edges)
        is_video = jnp.zeros(20, bool).at[7].set(True)
        ids, _, _ = graphjet.related_tweets(
            left, right, jnp.asarray(5, jnp.int32), max_results=5,
            candidate_mask=is_video,
        )
        real = [i for i in np.asarray(ids).tolist() if i != PAD_ID]
        assert real == [7]

    def test_min_timestamp_window(self):
        edges = [(0, 5, 10), (0, 6, 11), (1, 5, 100), (1, 7, 101)]
        left, right = build_bipartite(edges)
        ids, _, _ = graphjet.related_tweets(
            left, right, jnp.asarray(5, jnp.int32), max_results=5,
            min_timestamp=jnp.asarray(50, jnp.int32),
        )
        real = [i for i in np.asarray(ids).tolist() if i != PAD_ID]
        assert real == [7]  # user 0's old edges outside the window

    def test_batch(self):
        edges = [(0, 5, 10), (0, 6, 11), (1, 5, 12), (1, 6, 13)]
        left, right = build_bipartite(edges)
        ids, _, _ = graphjet.related_tweets_batch(
            left, right, jnp.asarray([5, 6], jnp.int32), max_results=3
        )
        assert ids.shape == (2, 3)
        assert int(ids[0, 0]) == 6 and int(ids[1, 0]) == 5


class TestUserUserGraph:
    def test_recommend_users_aggregates_and_proofs(self):
        g = graphjet.init_user_user(10, 8)
        # seeds 0 and 1 both engaged user 5; seed 1 engaged user 6
        g = graphjet.record_user_user(
            g,
            np.asarray([0, 1, 1]),
            np.asarray([5, 5, 6]),
            np.ones(3, int),
            np.asarray([10, 11, 12]),
        )
        ids, scores, proof = jax.jit(
            lambda s, w: graphjet.recommend_users(g, s, w, max_results=4)
        )(jnp.asarray([0, 1], jnp.int32), jnp.asarray([1.0, 0.5]))
        got = {
            int(i): (float(s), int(p))
            for i, s, p in zip(np.asarray(ids), np.asarray(scores), np.asarray(proof))
            if i != PAD_ID
        }
        assert got[5] == (1.5, 2) and got[6] == (0.5, 1)

    def test_seeds_and_excludes_not_recommended(self):
        g = graphjet.init_user_user(10, 8)
        g = graphjet.record_user_user(
            g,
            np.asarray([0, 0, 0]),
            np.asarray([1, 5, 6]),  # engages seed 1 itself + 5, 6
            np.ones(3, int),
            np.asarray([10, 11, 12]),
        )
        ids, _, _ = graphjet.recommend_users(
            g,
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([1.0, 1.0]),
            max_results=4,
            exclude_ids=jnp.asarray([6], jnp.int32),
        )
        real = [i for i in np.asarray(ids).tolist() if i != PAD_ID]
        assert real == [5]
