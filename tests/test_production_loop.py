"""The full production data loop in one test: For You serving (wide
columnar path) → scribe side effects → UUA adapters → attribution label
join → TRec training shards → DataRecordTrainer input batches.

Connects what the reference spreads over home-mixer scribes, the UUA
enricher, the timelines label joins, and twml's input fn — every hop runs
the real framework code (no stand-ins)."""

import json

import numpy as np
import pytest

from the_algorithm_tpu.actions import uua
from the_algorithm_tpu.core.hashing import feature_id
from the_algorithm_tpu.data import datarecord
from the_algorithm_tpu.mixers import feature_schema as fs
from the_algorithm_tpu.mixers import home_mixer, wide_hydrators as wh
from the_algorithm_tpu.mixers.feature_hydrators import (
    ScribeClientEventSideEffect,
    ScribeServedCandidatesSideEffect,
)
from the_algorithm_tpu.pipeline.component import (
    Candidate,
    CandidatePipeline,
    CandidateSource,
)
from the_algorithm_tpu.training import labels as lb


class Src(CandidateSource):
    def get(self, query, params):
        return [
            Candidate(id=i * 3 + 1,
                      features={"author_id": i % 8, "retrieval_score": 1.0,
                                "created_ts": 10_000_000})
            for i in range(10)
        ]


WORLD = wh.synthetic_world(
    seed=9, num_users=8, num_authors=8, num_tweets=256, num_clusters=32
)


def serve_pages(n_users=3):
    """Run the wide For You pipeline for several users, scribing both the
    served-candidates and client-event streams."""
    hydrators = wh.build_wide_hydrators(**WORLD)
    F = fs.total_width(fs.WIDE_SCHEMA)
    w = np.random.default_rng(0).normal(0, 0.01, F).astype(np.float32)

    def predict(x):
        s = 1.0 / (1.0 + np.exp(-np.clip(x @ w, -30, 30)))
        return np.stack([s] * 15, axis=1)

    served_lines, client_lines = [], []
    pipeline = home_mixer.build_for_you_pipeline(
        candidate_pipelines=[CandidatePipeline(Src())],
        hydrators=hydrators,
        predict_fn=predict,
        feature_schema=fs.WIDE_SCHEMA,
    )
    pipeline.side_effects = [
        ScribeServedCandidatesSideEffect(served_lines.append),
        ScribeClientEventSideEffect(client_lines.append),
    ]
    for u in range(n_users):
        out = pipeline.run(home_mixer.ForYouQuery(
            user_id=u, followed_authors=[1, 2], max_results=5,
            now=10_000_000,
        ))
        assert out.candidates and not out.failures
    return served_lines, client_lines


class TestProductionLoop:
    def test_serve_to_trainer_batches(self, tmp_path):
        served_lines, client_lines = serve_pages()
        assert len(served_lines) == 3 and len(client_lines) == 15

        # client-event lines flow through the UUA adapter (impressions) and
        # we synthesize engagement follow-ups for the first served tweet of
        # user 0 and 1 (fav) — the realtime UUA stream
        actions = []
        for line in client_lines:
            actions += uua.client_event_adapter(json.loads(line))
        served = lb.parse_served_log(served_lines)
        fav0 = served[0]
        fav1 = next(s for s in served if s.user_id == 1)
        for s in (fav0, fav1):
            actions.append(uua.UnifiedUserAction(
                user_id=s.user_id,
                action_type=uua.ActionType.CLIENT_TWEET_FAV,
                item_id=s.tweet_id,
                timestamp_ms=(s.served_at + 60) * 1000,
            ))

        # offline re-hydration: eb doc features keyed by tweet id (the same
        # store the serve path read)
        eb_names = [f"eb_{n}" for n in fs.EB_DOC_FEATURES]

        def feature_fn(users, tweets):
            block = WORLD["doc_fn"](np.asarray(tweets))
            return np.stack(
                [np.asarray(block[n]) for n in fs.EB_DOC_FEATURES], axis=1
            )

        feats, labels = lb.build_training_examples(
            served_lines, actions, feature_fn
        )
        assert feats.shape == (15, len(fs.EB_DOC_FEATURES)) and labels.shape == (15, 15)
        fav_col = lb.HEAD_NAMES.index("fav")
        assert labels[:, fav_col].sum() == 2.0  # exactly the two favs

        # TRec shards with hashed feature/label ids (the scribe→HDFS step)
        fids = np.asarray([feature_id(n) for n in eb_names], np.int64)
        lids = np.asarray(
            [feature_id(f"label_{h}") for h in lb.HEAD_NAMES], np.int64
        )
        records = []
        for r in range(feats.shape[0]):
            cont = {int(fids[j]): float(feats[r, j])
                    for j in range(len(fids))}
            labs = {int(lids[h]): float(labels[r, h])
                    for h in range(15) if labels[r, h]}
            records.append((cont, labs))
        p = str(tmp_path / "part-00000.trec")
        datarecord.write_records(p, records, block_size=8)

        # the trainer's input fn reproduces the joined matrix exactly
        tf = datarecord.densify_transform(
            np.sort(fids), label_vocab=np.sort(lids)
        )
        dataset = datarecord.TRecDataset([p], seed=0)  # 1 file: order fixed
        batches = list(dataset.batches(15, tf, num_epochs=1))
        assert len(batches) == 1
        got_vals = batches[0]["values"]
        got_labels = batches[0]["labels"]
        forder = np.argsort(fids, kind="stable")
        lorder = np.argsort(lids, kind="stable")
        np.testing.assert_allclose(
            got_vals, feats[:, forder], rtol=1e-6
        )
        np.testing.assert_allclose(got_labels, labels[:, lorder], rtol=1e-6)
