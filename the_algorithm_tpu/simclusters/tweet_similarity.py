"""Tweet-similarity offline model: co-engagement labels + pair features.

≡ ``src/scala/com/twitter/simclusters_v2/scalding/tweet_similarity/
TrainingDataCollectionJob.scala:22-158`` (positive pairs = two tweets
engaged by the same user within a co-engagement window, negatives sampled
from non-co-engaged pairs) and ``TweetPairFeatureHydrationUtil.scala``
(SimClusters-embedding pair features), with the serving-side adapter role
of ``common/ml/SimClustersEmbeddingAdapter.scala`` played by
:func:`pair_features` (the same feature block at train and serve time).

TPU design: label collection is a host pass over the engagement log (an
offline Scalding job in the reference); feature hydration + the pair model
forward are jitted batched programs over the device-resident tweet
embedding table.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import SparseEmbedding


class TweetPairDataset(NamedTuple):
    """Labelled tweet pairs (host arrays, offline-job output)."""

    tweet_a: np.ndarray  # [N] int64
    tweet_b: np.ndarray  # [N] int64
    label: np.ndarray  # [N] float32 (1 = co-engaged)


def collect_training_pairs(
    user_ids: np.ndarray,
    tweet_ids: np.ndarray,
    timestamps: np.ndarray,
    *,
    coengagement_window_s: int = 30 * 60,
    max_pairs_per_user: int = 10,
    negatives_per_positive: float = 1.0,
    seed: int = 0,
) -> TweetPairDataset:
    """The label-collection job (``TrainingDataCollectionJob.scala``).

    Positives: ordered co-engagement pairs (same user, |Δt| ≤ window),
    capped per user (the reference subsamples heavy users). Negatives:
    random tweet pairs that never co-occur for any user.
    """
    rng = np.random.default_rng(seed)
    order = np.lexsort((timestamps, user_ids))
    u, t, ts = user_ids[order], tweet_ids[order], timestamps[order]

    pos_a, pos_b = [], []
    coengaged = set()
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    ends = np.r_[starts[1:], len(u)]
    for s, e in zip(starts, ends):
        count = 0
        for i in range(s, e):
            for j in range(i + 1, e):
                if ts[j] - ts[i] > coengagement_window_s:
                    break
                if t[i] == t[j]:
                    continue
                key = (min(int(t[i]), int(t[j])), max(int(t[i]), int(t[j])))
                coengaged.add(key)
                if count < max_pairs_per_user:
                    pos_a.append(t[i])
                    pos_b.append(t[j])
                    count += 1

    n_pos = len(pos_a)
    n_neg = int(n_pos * negatives_per_positive)
    all_tweets = np.unique(tweet_ids)
    neg_a, neg_b = [], []
    while len(neg_a) < n_neg and len(all_tweets) >= 2:
        a, b = rng.choice(all_tweets, 2, replace=False)
        key = (min(int(a), int(b)), max(int(a), int(b)))
        if key in coengaged:
            continue
        neg_a.append(a)
        neg_b.append(b)

    return TweetPairDataset(
        np.asarray(pos_a + neg_a, np.int64),
        np.asarray(pos_b + neg_b, np.int64),
        np.concatenate(
            [np.ones(n_pos, np.float32), np.zeros(len(neg_a), np.float32)]
        ),
    )


FEATURE_NAMES = (
    "cosine", "dot", "log_cosine", "jaccard", "euclidean",
    "norm_a", "norm_b", "size_a", "size_b",
)


def pair_features(
    a: SparseEmbedding, b: SparseEmbedding
) -> jnp.ndarray:
    """[len(FEATURE_NAMES)] feature vector per pair (jittable; vmap for
    batches) — ≡ ``TweetPairFeatureHydrationUtil.getFeaturesFromTweetPair``."""
    from the_algorithm_tpu.ops.sparse import PAD_ID

    return jnp.stack(
        [
            sparse.cosine(a, b),
            sparse.dot(a, b),
            sparse.log_norm_cosine(a, b),
            sparse.fuzzy_jaccard(a, b),
            sparse.euclidean(a, b),
            sparse.l2_norm(a),
            sparse.l2_norm(b),
            (a.ids != PAD_ID).sum().astype(jnp.float32),
            (b.ids != PAD_ID).sum().astype(jnp.float32),
        ]
    )


def pair_features_batch(
    a: SparseEmbedding, b: SparseEmbedding
) -> jnp.ndarray:
    return jax.vmap(pair_features)(a, b)


# -- the pair model ------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TweetSimilarityModelConfig:
    hidden: Tuple[int, ...] = (32, 16)
    num_features: int = len(FEATURE_NAMES)


def init_params(config: TweetSimilarityModelConfig, key) -> Dict:
    dims = (config.num_features, *config.hidden, 1)
    params = {}
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        params[f"w{i}"] = jax.random.normal(sub, (din, dout)) * jnp.sqrt(
            2.0 / din
        )
        params[f"b{i}"] = jnp.zeros((dout,))
    return params


def forward(params: Dict, features: jnp.ndarray) -> jnp.ndarray:
    """[B, F] → [B] similarity logits."""
    # feature standardization keeps the tiny MLP well-conditioned
    x = jnp.tanh(features * 0.1) if features.ndim == 2 else features
    n_layers = len(params) // 2
    for i in range(n_layers):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    return x[:, 0]


def loss_fn(params: Dict, batch: Dict) -> Tuple[jnp.ndarray, Dict]:
    logits = forward(params, batch["features"])
    labels = batch["label"]
    loss = jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return loss, {}
