"""Tweet-similarity offline model: label collection, features, training."""

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.simclusters import tweet_similarity as tsim
from the_algorithm_tpu.training import metrics


class TestLabelCollection:
    def test_positives_within_window(self):
        # user 0 favs tweets 1,2 close together; tweet 3 much later
        ds = tsim.collect_training_pairs(
            np.asarray([0, 0, 0]),
            np.asarray([1, 2, 3]),
            np.asarray([0, 100, 10_000]),
            coengagement_window_s=600,
            negatives_per_positive=0,
        )
        pos = set(zip(ds.tweet_a.tolist(), ds.tweet_b.tolist()))
        assert (1, 2) in pos
        assert not any(3 in p for p in pos)

    def test_negatives_never_coengaged(self):
        rng = np.random.default_rng(0)
        u = rng.integers(0, 20, 200)
        t = rng.integers(0, 50, 200)
        ts = rng.integers(0, 1000, 200)
        ds = tsim.collect_training_pairs(
            u, t, ts, coengagement_window_s=1000, negatives_per_positive=1.0
        )
        pos_keys = {
            (min(a, b), max(a, b))
            for a, b, l in zip(ds.tweet_a, ds.tweet_b, ds.label)
            if l == 1
        }
        neg_keys = {
            (min(a, b), max(a, b))
            for a, b, l in zip(ds.tweet_a, ds.tweet_b, ds.label)
            if l == 0
        }
        assert not (pos_keys & neg_keys)
        assert len(neg_keys) > 0

    def test_per_user_cap(self):
        # one user favs 10 tweets simultaneously → pairs capped
        ds = tsim.collect_training_pairs(
            np.zeros(10, int),
            np.arange(10),
            np.zeros(10, int),
            max_pairs_per_user=3,
            negatives_per_positive=0,
        )
        assert len(ds.tweet_a) == 3


class TestPairFeatures:
    def test_feature_vector_values(self):
        a = SparseEmbedding(
            jnp.asarray([1, 2, PAD_ID], jnp.int32),
            jnp.asarray([1.0, 1.0, 0.0]),
        )
        b = SparseEmbedding(
            jnp.asarray([2, 3, PAD_ID], jnp.int32),
            jnp.asarray([1.0, 1.0, 0.0]),
        )
        f = np.asarray(tsim.pair_features(a, b))
        names = tsim.FEATURE_NAMES
        assert len(f) == len(names)
        np.testing.assert_allclose(f[names.index("cosine")], 0.5, rtol=1e-6)
        np.testing.assert_allclose(f[names.index("dot")], 1.0, rtol=1e-6)
        np.testing.assert_allclose(f[names.index("size_a")], 2.0)

    def test_batched(self):
        rng = np.random.default_rng(0)
        # unique cluster ids per row (SparseEmbedding invariant)
        ids = jnp.asarray(
            np.stack([rng.choice(30, 4, replace=False) for _ in range(8)])
            .astype(np.int32)
        )
        sc = jnp.asarray(rng.uniform(0.1, 1, (8, 4)).astype(np.float32))
        out = jax.jit(tsim.pair_features_batch)(
            SparseEmbedding(ids, sc), SparseEmbedding(ids, sc)
        )
        assert out.shape == (8, len(tsim.FEATURE_NAMES))
        # self-pairs: cosine == 1
        np.testing.assert_allclose(
            np.asarray(out)[:, 0], 1.0, rtol=1e-5
        )


class TestModelTraining:
    def test_learns_separable_similarity(self):
        """End-to-end: community corpus → labels → features → AUC > 0.8."""
        rng = np.random.default_rng(0)
        n_tweets, K, C = 120, 8, 64
        comm = rng.integers(0, 4, n_tweets)  # 4 communities, 16 clusters each
        t_ids = np.stack(
            [
                rng.choice(np.arange(c * 16, (c + 1) * 16), K, replace=False)
                for c in comm
            ]
        ).astype(np.int32)
        t_scores = rng.uniform(0.5, 1, (n_tweets, K)).astype(np.float32)

        # engagement log: users fav within one community
        events_u, events_t, events_ts = [], [], []
        for u in range(150):
            c = rng.integers(0, 4)
            pool = np.flatnonzero(comm == c)
            for i, tw in enumerate(rng.choice(pool, 4, replace=False)):
                events_u.append(u)
                events_t.append(int(tw))
                events_ts.append(u * 10_000 + i)
        ds = tsim.collect_training_pairs(
            np.asarray(events_u), np.asarray(events_t), np.asarray(events_ts),
            coengagement_window_s=100, negatives_per_positive=1.0,
        )
        a = SparseEmbedding(jnp.asarray(t_ids[ds.tweet_a]), jnp.asarray(t_scores[ds.tweet_a]))
        b = SparseEmbedding(jnp.asarray(t_ids[ds.tweet_b]), jnp.asarray(t_scores[ds.tweet_b]))
        feats = tsim.pair_features_batch(a, b)

        cfg = tsim.TweetSimilarityModelConfig()
        params = tsim.init_params(cfg, jax.random.PRNGKey(0))
        import optax

        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        batch = {"features": feats, "label": jnp.asarray(ds.label)}

        @jax.jit
        def step(p, s):
            (l, _), g = jax.value_and_grad(tsim.loss_fn, has_aux=True)(p, batch)
            updates, s = opt.update(g, s)
            return optax.apply_updates(p, updates), s, l

        for _ in range(200):
            params, opt_state, loss = step(params, opt_state)
        scores = tsim.forward(params, feats)
        test_auc = float(metrics.auc(scores, jnp.asarray(ds.label)))
        assert test_auc > 0.8, f"AUC {test_auc}"
