"""CR-mixer router/blenders + WALS collaborative filtering tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.core.config import Params
from the_algorithm_tpu.mixers import cr_mixer
from the_algorithm_tpu.mixers.cr_mixer import (
    CrCandidateGenerator,
    CrMixerConfig,
    EngineSpec,
    SignalKind,
    SourceSignal,
    rank_decay_blend,
    route_signals,
    weighted_score_blend,
)
from the_algorithm_tpu.models import wals
from the_algorithm_tpu.pipeline.component import Candidate


def C(i, s=None, src=None):
    return Candidate(id=i, score=s, source=src)


class TestRouter:
    def test_routes_by_kind_and_caps_fanout(self):
        signals = [
            SourceSignal(SignalKind.TWEET_ENGAGEMENT, t, w)
            for t, w in [(1, 0.5), (2, 0.9), (3, 0.1)]
        ] + [SourceSignal(SignalKind.PRODUCER, 7, 1.0)]
        tweet_spec = EngineSpec(
            "utg", SignalKind.TWEET_ENGAGEMENT, lambda s, p: [], max_signals=2
        )
        prod_spec = EngineSpec("sann", SignalKind.PRODUCER, lambda s, p: [])
        plan = route_signals(signals, [tweet_spec, prod_spec])
        got = [(spec.name, sig.entity_id) for spec, sig in plan]
        # top-2 tweet signals by weight, then the producer signal
        assert got == [("utg", 2), ("utg", 1), ("sann", 7)]


class TestBlenders:
    def test_weighted_blend_accumulates_cross_engine_evidence(self):
        per_engine = {
            "a": [C(1, 10.0), C(2, 5.0)],  # normalized: 1→1.0, 2→0.0
            "b": [C(2, 0.8), C(3, 0.2)],  # normalized: 2→1.0, 3→0.0
        }
        out = weighted_score_blend(per_engine, {"a": 1.0, "b": 1.0}, 10)
        scores = {c.id: c.score for c in out}
        assert scores[1] == pytest.approx(1.0)
        assert scores[2] == pytest.approx(1.0)  # 0.0 + 1.0
        assert scores[3] == pytest.approx(0.0)

    def test_weighted_blend_engine_weights(self):
        per_engine = {"a": [C(1, 1.0), C(9, 0.0)], "b": [C(2, 1.0), C(9, 0.0)]}
        out = weighted_score_blend(per_engine, {"a": 2.0, "b": 1.0}, 2)
        assert out[0].id == 1 and out[1].id == 2

    def test_rank_decay_blend_uses_order_not_scores(self):
        per_engine = {
            "a": [C(1, 1e9), C(2, 1e8)],
            "b": [C(2, 0.001), C(3, 0.0001)],
        }
        out = rank_decay_blend(per_engine, {"a": 1.0, "b": 1.0}, 3, decay=0.5)
        scores = {c.id: c.score for c in out}
        # id2 = 0.5 (rank1 in a) + 1.0 (rank0 in b) = 1.5; id1 = 1.0
        assert out[0].id == 2
        assert scores[2] == pytest.approx(1.5)
        assert scores[1] == pytest.approx(1.0)


class TestGenerator:
    def _specs(self):
        def tweet_engine(signal, params):
            return [C(signal.entity_id * 10 + k, 1.0 - 0.1 * k, src="utg")
                    for k in range(3)]

        def failing_engine(signal, params):
            raise RuntimeError("engine down")

        return [
            EngineSpec("utg", SignalKind.TWEET_ENGAGEMENT, tweet_engine),
            EngineSpec("broken", SignalKind.PRODUCER, failing_engine),
        ]

    def test_fail_open_and_blend(self):
        gen = CrCandidateGenerator(
            self._specs(), CrMixerConfig(max_results=5, blender="weighted")
        )
        out = gen.generate(
            [
                SourceSignal(SignalKind.TWEET_ENGAGEMENT, 1),
                SourceSignal(SignalKind.PRODUCER, 9),  # hits broken engine
            ],
            Params(),
        )
        assert len(out) == 3  # broken engine contributed nothing, no raise
        assert {c.id for c in out} == {10, 11, 12}

    def test_source_wrapper(self):
        gen = CrCandidateGenerator(self._specs(), CrMixerConfig(max_results=5))
        src = cr_mixer.CrMixerSource(gen)
        out = src.get(
            {"signals": [SourceSignal(SignalKind.TWEET_ENGAGEMENT, 2)]},
            Params(),
        )
        assert {c.id for c in out} == {20, 21, 22}


class TestWals:
    def test_factorization_reconstructs_block_structure(self):
        """Two user communities engaging disjoint item sets."""
        rng = np.random.default_rng(0)
        U, T = 32, 40
        r = np.zeros((U, T), np.float32)
        r[:16, :20] = rng.uniform(0.5, 1.0, (16, 20)) * (
            rng.random((16, 20)) < 0.4
        )
        r[16:, 20:] = rng.uniform(0.5, 1.0, (16, 20)) * (
            rng.random((16, 20)) < 0.4
        )
        model = jax.jit(
            lambda rr: wals.train_wals(rr, wals.WalsConfig(dim=8, iterations=8))
        )(jnp.asarray(r))
        recon = np.asarray(model.user_factors @ model.item_factors.T)
        in_block = np.concatenate([recon[:16, :20][r[:16, :20] > 0],
                                   recon[16:, 20:][r[16:, 20:] > 0]])
        out_block = np.concatenate([recon[:16, 20:].ravel(), recon[16:, :20].ravel()])
        assert in_block.mean() > 5 * abs(out_block.mean())

    def test_consumer_embedding_matches_training_user(self):
        """Solving from a user's full history ≈ their trained factor."""
        rng = np.random.default_rng(1)
        r = (rng.random((24, 30)) < 0.3).astype(np.float32)
        cfg = wals.WalsConfig(dim=6, iterations=10)
        model = wals.train_wals(jnp.asarray(r), cfg)
        u = 3
        hist = np.flatnonzero(r[u])
        vec = wals.consumer_embedding(
            model.item_factors,
            jnp.asarray(hist, jnp.int32),
            jnp.ones(len(hist)),
            reg=cfg.reg, alpha=cfg.alpha,
            gram=wals.item_gram(model.item_factors),
        )
        # with the full corpus gram this IS the training half-step → exact
        want = np.asarray(model.user_factors[u])
        np.testing.assert_allclose(np.asarray(vec), want, rtol=1e-3, atol=1e-4)
        # history-only gram: a close approximation
        approx = np.asarray(
            wals.consumer_embedding(
                model.item_factors, jnp.asarray(hist, jnp.int32),
                jnp.ones(len(hist)), reg=cfg.reg, alpha=cfg.alpha,
            )
        )
        cos = approx @ want / (
            np.linalg.norm(approx) * np.linalg.norm(want) + 1e-9
        )
        assert cos > 0.95

    def test_similar_items_excludes_history(self):
        rng = np.random.default_rng(2)
        f = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
        exclude = jnp.asarray([0, 1, 2], jnp.int32)
        ids, scores = wals.similar_items(v, f, 5, exclude=exclude)
        assert not (set(np.asarray(ids).tolist()) & {0, 1, 2})
        assert (np.diff(np.asarray(scores)) <= 1e-6).all()
