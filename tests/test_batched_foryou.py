"""Batched For You engine vs. the per-request pipeline — semantic parity.

The phase-batched engine (``mixers/batched_foryou.py``) must produce the
same ranked timeline as running ``RecommendationPipeline`` per request with
host hydration and the same model: same candidate merge/dedup precedence,
same filters, same scores (device vs host assembly), same author-diversity
rescoring and truncation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from the_algorithm_tpu.mixers import batched_foryou as bf
from the_algorithm_tpu.mixers import device_hydration as dh
from the_algorithm_tpu.mixers import feature_schema as fsch
from the_algorithm_tpu.mixers import home_mixer
from the_algorithm_tpu.mixers import wide_hydrators as wh
from the_algorithm_tpu.models import masknet
from the_algorithm_tpu.pipeline.component import (
    Candidate, CandidatePipeline, CandidateSource,
)

NOW = 10_000_000
A = 48
NU = 32


@pytest.fixture(scope="module")
def setup():
    world = wh.synthetic_world(
        seed=3, num_users=NU, num_authors=A, num_tweets=1 << 12,
        engagement_width=8, now=NOW, include_device_spec=True,
    )
    spec = world.pop("device_spec")
    tables, fns, resolvers = dh.build_from_world(world, spec)

    F = fsch.total_width(fsch.WIDE_SCHEMA)
    cfg = masknet.MaskNetConfig(
        num_features=F, num_heads=4, mask_blocks=1, block_dim=32,
        aggregation_dim=16, head_hidden=(16,), dtype="float32",
    )
    model = masknet.MaskNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, F)))
    weights = jnp.asarray([1.0, 2.0, -0.5, 0.25])
    scorer = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params, weights,
        pad_b=128, compute_dtype=jnp.float32,
    )
    return world, scorer, model, params, weights


class FixedBatchSource(bf.BatchCandidateSource):
    """Deterministic per-user candidate ids (some overlap across sources)."""

    def __init__(self, name, base, n):
        self.name = name
        self._base, self._n = base, n

    def get_batch(self, queries, params):
        out = []
        for q in queries:
            u = int(q.user_id)
            ids = (self._base + 37 * u
                   + 13 * np.arange(self._n, dtype=np.int64)) % 4000 + 1
            out.append(bf.CandidateColumns(
                ids, (1.0 / (1 + np.arange(self._n))).astype(np.float32)))
        return out


def source_specs():
    return [
        FixedBatchSource("simclusters_interested_in", 100, 40),
        FixedBatchSource("EarlybirdInNetwork", 120, 30),
        FixedBatchSource("DirectUteg", 140, 20),
    ]


def query_for(u):
    return home_mixer.ForYouQuery(
        user_id=u, followed_authors=[int(a) for a in range(0, A, 5)],
        seen_tweet_ids=frozenset({101, 205}), max_results=20, now=NOW,
    )


def reference_pipeline(world, model, params, weights):
    """Per-request pipeline with host hydration + the same model."""
    class ObjSource(CandidateSource):
        def __init__(self, batch_src):
            self._bs = batch_src

        @property
        def name(self):
            return self._bs.name

        def get(self, query, params):
            cc = self._bs.get_batch([query], params)[0]
            lifted = bf.ColumnsLift(A, NOW)(cc)
            out = []
            for i in range(len(cc)):
                feats = {n: v[i].item() for n, v in lifted.cols.items()}
                out.append(Candidate(
                    id=int(cc.ids[i]), source=self._bs.name, features=feats))
            return out

    F = fsch.total_width(fsch.WIDE_SCHEMA)
    predict = jax.jit(lambda x: jax.nn.sigmoid(model.apply(params, x)))

    def predict_fn(x):
        return np.asarray(predict(jnp.asarray(x, jnp.float32)))

    return home_mixer.build_for_you_pipeline(
        candidate_pipelines=[CandidatePipeline(ObjSource(s))
                             for s in source_specs()],
        hydrators=wh.build_wide_hydrators(**world),
        predict_fn=predict_fn,
        head_names=[f"h{i}" for i in range(4)],
        head_weights=weights,
        feature_schema=fsch.WIDE_SCHEMA,
    )


def test_batched_matches_per_request_pipeline(setup):
    world, scorer, model, params, weights = setup
    engine = bf.BatchedForYouEngine(
        batch_sources=source_specs(), scorer=scorer,
        head_names=[f"h{i}" for i in range(4)],
        lift=bf.ColumnsLift(A, NOW),
    )
    pipe = reference_pipeline(world, model, params, weights)

    queries = [query_for(u) for u in (2, 7, 11)]
    got = engine.serve_batch(queries)
    assert len(got) == 3
    for q, cands in zip(queries, got):
        want = pipe.run(q)
        assert not want.failures, want.failures
        got_ids = [c.id for c in cands]
        want_ids = [c.id for c in want.candidates]
        got_s = {c.id: c.score for c in cands}
        want_s = {c.id: c.score for c in want.candidates}
        # the synthetic model's combined scores are separated by ~1e-7, so
        # exact rank equality is fp-noise; require (a) per-id score parity,
        # (b) identical rank wherever the reference separates scores by
        # more than the device/host fp skew
        for i in got_s:
            if i in want_s:
                assert abs(got_s[i] - want_s[i]) < 1e-5, (i, got_s[i],
                                                          want_s[i])
        TOL = 2e-6
        for r, (g, w) in enumerate(zip(got_ids, want_ids)):
            if g != w:
                assert abs(want_s[w] - want_s.get(g, got_s[g])) < TOL, (
                    r, g, w, got_s[g], want_s[w])
        # filters: seen ids and stale candidates never served
        assert not set(got_ids) & {101, 205}
        assert len(cands) <= q.max_results


def test_source_precedence_first_wins(setup):
    """An id retrieved by two sources keeps the FIRST pipeline's columns."""
    world, scorer, model, params, weights = setup

    class Overlap(bf.BatchCandidateSource):
        def __init__(self, name, score):
            self.name = name
            self._score = score

        def get_batch(self, queries, params):
            return [bf.CandidateColumns(
                np.asarray([500, 600]),
                np.asarray([self._score, self._score], np.float32))
                for _ in queries]

    engine = bf.BatchedForYouEngine(
        batch_sources=[Overlap("simclusters_interested_in", 0.9),
                       Overlap("EarlybirdInNetwork", 0.1)],
        scorer=scorer, head_names=[f"h{i}" for i in range(4)],
        lift=bf.ColumnsLift(A, NOW),
    )
    out = engine.serve_batch([query_for(1)])[0]
    by_id = {c.id: c for c in out}
    assert set(by_id) == {500, 600}
    assert by_id[500].features["retrieval_score"] == pytest.approx(0.9)


def test_request_batcher_coalesces(setup):
    """The serving-front RequestBatcher shares one serve_batch call."""
    from concurrent.futures import ThreadPoolExecutor

    from the_algorithm_tpu.serving.batcher import BatcherConfig, RequestBatcher

    world, scorer, model, params, weights = setup
    engine = bf.BatchedForYouEngine(
        batch_sources=source_specs(), scorer=scorer,
        head_names=[f"h{i}" for i in range(4)],
        lift=bf.ColumnsLift(A, NOW),
    )
    calls = []

    def serve(queries):
        calls.append(len(queries))
        return engine.serve_batch(queries)

    front = RequestBatcher(
        serve, BatcherConfig(max_batch_size=8, max_delay_ms=50.0))
    try:
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(front.serve, query_for(u)) for u in range(4)]
            outs = [f.result(timeout=60) for f in futs]
        assert all(len(o) > 0 for o in outs)
        assert max(calls) > 1  # at least one coalesced batch
    finally:
        front.close()


class TestExactScanTier:
    """The exact full-corpus retrieval quality tier (product behavior)."""

    def _world(self):
        rng = np.random.default_rng(3)
        T, K, C = 1 << 13, 4, 64
        # DISTINCT cluster ids per row (duplicate ids make the dense
        # oracle's norm differ from the sparse Σs² norm)
        corpus_cl = np.argsort(
            rng.random((T, C)), axis=1)[:, :K].astype(np.int32)
        corpus_sc = rng.random((T, K)).astype(np.float32)

        def emb(uid):
            r = np.random.default_rng(uid)
            return (r.choice(C, 6, replace=False).astype(np.int32),
                    r.random(6).astype(np.float32))

        exact = bf.ExactScanBatchSource(
            jnp.asarray(corpus_cl), jnp.asarray(corpus_sc), emb,
            num_clusters=C, max_results=32, block=1 << 13)
        return corpus_cl, corpus_sc, emb, exact

    def test_exact_scan_matches_bruteforce(self):
        corpus_cl, corpus_sc, emb, exact = self._world()

        class Q:
            user_id = 11

        got = exact.get_batch([Q()], None)[0]
        # brute-force cosine truth in numpy
        cl, sc = emb(11)
        dense_q = np.zeros(64); np.add.at(dense_q, cl, sc)
        dense_c = np.zeros((corpus_cl.shape[0], 64))
        np.add.at(dense_c, (np.arange(corpus_cl.shape[0])[:, None],
                            corpus_cl), corpus_sc)
        sims = (dense_c @ dense_q) / (
            np.linalg.norm(dense_c, axis=1) * np.linalg.norm(dense_q) + 1e-9)
        want = set(np.argsort(-sims)[:32].tolist())
        assert len(set(got.ids.tolist()) & want) >= 31  # ties at the edge

    def test_tier_routing_is_sticky_and_param_forced(self):
        from the_algorithm_tpu.core.config import Params
        from the_algorithm_tpu.core.decider import Decider
        from the_algorithm_tpu.mixers.home_products import (
            EXACT_RETRIEVAL_TIER)

        _, _, emb, exact = self._world()
        approx_calls = []

        class Approx(bf.BatchCandidateSource):
            name = "simclusters_interested_in"

            def get_batch(self, queries, params):
                approx_calls.extend(q.user_id for q in queries)
                return [bf.CandidateColumns(
                    np.asarray([1, 2]), np.asarray([0.5, 0.4], np.float32))
                    for _ in queries]

        decider = Decider({"exact_retrieval_tier": 5000})
        tiered = bf.TieredSannBatchSource(Approx(), exact, decider)

        class Q:
            def __init__(self, u):
                self.user_id = u

        queries = [Q(u) for u in range(16)]
        got = tiered.get_batch(queries, None)
        assert len(got) == 16
        in_tier = [bool(c.cols.get("exact_tier") is not None) for c in got]
        assert any(in_tier) and not all(in_tier)  # split traffic
        # stickiness: same split on a second call
        got2 = tiered.get_batch(queries, None)
        assert [bool(c.cols.get("exact_tier") is not None)
                for c in got2] == in_tier
        # param override forces the tier on
        got3 = tiered.get_batch(
            [Q(999)], Params({EXACT_RETRIEVAL_TIER: True}))
        assert got3[0].cols.get("exact_tier") is not None
        got4 = tiered.get_batch(
            [Q(999)], Params({EXACT_RETRIEVAL_TIER: False}))
        assert got4[0].cols.get("exact_tier") is None


def test_device_side_selection_matches_host_path(setup):
    """select_top_k: the on-device diversity rescore + top-K must rank
    like the host _rescore_select path (fp-tie tolerant)."""
    world, scorer, model, params, weights = setup
    tables, fns, resolvers = scorer.tables, scorer.fns, scorer.builder.resolvers
    dev_scorer = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params, weights,
        pad_b=128, compute_dtype=jnp.float32, select_top_k=20,
    )
    host_engine = bf.BatchedForYouEngine(
        batch_sources=source_specs(), scorer=scorer,
        head_names=[f"h{i}" for i in range(4)],
        lift=bf.ColumnsLift(A, NOW),
    )
    dev_engine = bf.BatchedForYouEngine(
        batch_sources=source_specs(), scorer=dev_scorer,
        head_names=[f"h{i}" for i in range(4)],
        lift=bf.ColumnsLift(A, NOW),
    )
    queries = [query_for(u) for u in (3, 9)]
    host_out = host_engine.serve_batch(queries)
    dev_out = dev_engine.serve_batch(queries)
    for ho, do in zip(host_out, dev_out):
        hs = {c.id: c.score for c in ho}
        ds = {c.id: c.score for c in do}
        common = set(hs) & set(ds)
        assert len(common) >= len(hs) - 1, (sorted(hs), sorted(ds))
        for i in common:
            assert abs(hs[i] - ds[i]) < 1e-4, (i, hs[i], ds[i])
        # head features present on device-selected candidates
        assert "predicted_h0" in do[0].features
        assert len(do) <= queries[0].max_results
