"""Phoenix action-sequence model + scorer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.mixers import phoenix_scorer as ps
from the_algorithm_tpu.models import phoenix
from the_algorithm_tpu.models.phoenix import (
    ActionName,
    CandidateFeatures,
    PhoenixConfig,
    PhoenixModel,
    UserActionSequence,
    aggregate_history,
)
from the_algorithm_tpu.pipeline.component import Candidate


def _toy_model(L=32, C=8):
    cfg = PhoenixConfig(
        d_model=32, n_layers=1, n_heads=2, max_history=L, author_buckets=64
    )
    model = PhoenixModel(cfg)
    seq = UserActionSequence(
        jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.int32),
        jnp.zeros(L, jnp.int32), jnp.zeros(L, bool),
    )
    cands = CandidateFeatures(
        jnp.zeros(C, jnp.int32),
        jnp.zeros((C, phoenix.NUM_BOOL_FEATURES), jnp.float32),
        jnp.ones(C, bool),
    )
    params = model.init(jax.random.PRNGKey(0), seq, cands)
    return cfg, model, params, seq, cands


class TestModel:
    def test_shapes_and_mask(self):
        cfg, model, params, seq, cands = _toy_model()
        cands = cands._replace(
            valid=jnp.asarray([True] * 4 + [False] * 4)
        )
        probs = phoenix.predict_next_actions(model, params, seq, cands)
        assert probs.shape == (8, phoenix.NUM_ACTIONS)
        assert np.all(np.asarray(probs[4:]) == 0.0)
        assert np.all(np.asarray(probs[:4]) > 0.0)
        assert np.all(np.asarray(probs[:4]) < 1.0)

    def test_history_changes_predictions(self):
        cfg, model, params, seq, cands = _toy_model()
        seq2 = UserActionSequence(
            seq.action_ids.at[-1].set(int(ActionName.SERVER_TWEET_FAV)),
            seq.author_hashes.at[-1].set(7),
            seq.age_s,
            seq.valid.at[-1].set(True),
        )
        p1 = phoenix.predict_next_actions(model, params, seq, cands)
        p2 = phoenix.predict_next_actions(model, params, seq2, cands)
        assert not np.allclose(np.asarray(p1), np.asarray(p2))

    def test_training_step_reduces_loss(self):
        cfg, model, params, seq, cands = _toy_model()
        seq = seq._replace(valid=seq.valid.at[-4:].set(True))
        labels = jnp.zeros((8, phoenix.NUM_ACTIONS)).at[:, 1].set(1.0)
        valid = jnp.ones(8, bool)

        def loss_fn(p):
            return phoenix.multi_action_loss(
                model.apply(p, seq, cands), labels, valid
            )

        l0 = float(loss_fn(params))
        grads = jax.grad(loss_fn)(params)
        params2 = jax.tree.map(lambda p, g: p - 0.5 * g, params, grads)
        assert float(loss_fn(params2)) < l0


class TestAggregation:
    def test_window_dedup_and_truncation(self):
        fav = int(ActionName.SERVER_TWEET_FAV)
        reply = int(ActionName.SERVER_TWEET_REPLY)
        events = [
            (1_000, fav, 5),
            (2_000, fav, 5),        # same 5-min window+action+author -> dedup
            (400_000, fav, 5),      # new window
            (400_500, reply, 5),    # different action, kept
        ]
        out = aggregate_history(events, now_ms=500_000, max_length=8)
        assert out["valid"].sum() == 3
        assert out["action_ids"][out["valid"]].tolist() == [fav, fav, reply]
        # newest-last, ages in seconds
        assert out["age_s"][-1] == (500_000 - 400_500) // 1000

        out2 = aggregate_history(events, now_ms=500_000, max_length=2)
        assert out2["valid"].sum() == 2
        assert out2["action_ids"][-1] == reply

    def test_exclude_dwells(self):
        dwell = int(ActionName.CLIENT_TWEET_RECAP_DWELLED)
        events = [(1_000, dwell, 1), (2_000, int(ActionName.SERVER_TWEET_FAV), 1)]
        out = aggregate_history(
            events, now_ms=10_000, max_length=4, exclude_dwells=True
        )
        assert out["valid"].sum() == 1


class TestScorer:
    def _query(self, actions="present"):
        class Q:
            features = {"user_actions": actions if actions else None}

        q = Q()
        if actions is None:
            q.features = {}
        return q

    def test_max_over_actions_and_weighted_score(self):
        probs = np.zeros((2, phoenix.NUM_ACTIONS), np.float32)
        probs[0, int(ActionName.SERVER_TWEET_QUOTE)] = 0.4
        probs[0, int(ActionName.SERVER_TWEET_RETWEET)] = 0.7
        probs[1, int(ActionName.CLIENT_TWEET_REPORT)] = 0.9

        scorer = ps.PhoenixScorer(lambda a, b, v, ua: probs)
        cands = [
            Candidate(id=1, features={"author_id": 3}),
            Candidate(id=2, features={"author_id": 4}),
        ]
        scorer.score(self._query(), cands, None)
        assert cands[0].features["phoenix_retweet"] == np.float32(0.7)  # max of the set
        assert cands[1].features["phoenix_negative_feedback_v2"] == np.float32(0.9)
        assert cands[0].score > cands[1].score  # negative weight sinks cand 2

    def test_prod_fallback_when_missing(self):
        probs = np.zeros((1, phoenix.NUM_ACTIONS), np.float32)
        scorer = ps.PhoenixScorer(lambda a, b, v, ua: probs)
        cands = [
            Candidate(
                id=1, features={"author_id": 3, "predicted_fav": 0.33}
            )
        ]
        scorer.score(self._query(), cands, None)
        assert cands[0].features["phoenix_fav"] == np.float32(0.33)

    def test_video_eligibility_gating(self):
        probs = np.full((1, phoenix.NUM_ACTIONS), 0.5, np.float32)
        scorer = ps.PhoenixScorer(lambda a, b, v, ua: probs)
        video = Candidate(
            id=1,
            features={
                "author_id": 3, "has_video": True, "video_duration_ms": 30_000
            },
        )
        scorer.score(self._query(), [video], None)
        assert "phoenix_vqv" in video.features
        assert "phoenix_dwell" not in video.features  # video >= 10s -> no dwell

        short = Candidate(id=2, features={"author_id": 3})
        scorer.score(self._query(), [short], None)
        assert "phoenix_dwell" in short.features
        assert "phoenix_vqv" not in short.features

    def test_only_if_requires_user_actions(self):
        probs = np.full((1, phoenix.NUM_ACTIONS), 0.5, np.float32)
        scorer = ps.PhoenixScorer(lambda a, b, v, ua: probs)
        c = Candidate(id=1, features={"author_id": 3})
        scorer.score(self._query(actions=None), [c], None)
        assert c.score is None

    def test_retweet_source_author_remap(self):
        seen = {}

        def spy(authors, bools, valid, ua):
            seen["authors"] = authors.copy()
            seen["bools"] = bools.copy()
            return np.zeros((len(authors), phoenix.NUM_ACTIONS), np.float32)

        scorer = ps.PhoenixScorer(spy)
        c = Candidate(
            id=1,
            features={
                "author_id": 3, "source_user_id": 42, "source_tweet_id": 99
            },
        )
        scorer.score(self._query(), [c], None)
        assert seen["authors"][0] == 42
        assert seen["bools"][0][ps.BOOL_FEATURES.index("is_retweet")] == 1.0


class TestUserActionsHydrator:
    def test_hydrate_builds_sequence(self):
        from the_algorithm_tpu.mixers.feature_hydrators import (
            UserActionsQueryHydrator,
        )

        fav = int(ActionName.SERVER_TWEET_FAV)
        events = [(1_000, fav, 5), (400_000, fav, 6)]

        class Q:
            user_id = 1
            now = 500

        h = UserActionsQueryHydrator(lambda uid: events, max_length=16)
        out = h.hydrate(Q(), None)
        assert out["user_actions_size"] == 2
        assert out["user_actions_contains_explicit_signals"]
        assert out["user_actions"].valid.sum() == 2

        h2 = UserActionsQueryHydrator(lambda uid: [], max_length=16)
        out2 = h2.hydrate(Q(), None)
        assert out2["user_actions"] is None
        assert out2["user_actions_size"] == 0


class TestPhoenixInForYou:
    def test_phoenix_rescore_in_pipeline(self):
        """build_for_you_pipeline runs Phoenix after MaskNet when the query
        carries an action sequence; phoenix_* features appear and the
        combined score comes from the Phoenix head weights."""
        import numpy as np

        from the_algorithm_tpu.mixers import home_mixer
        from the_algorithm_tpu.models.phoenix import NUM_ACTIONS
        from the_algorithm_tpu.pipeline.component import (
            Candidate, CandidatePipeline, CandidateSource, QueryFeatureHydrator,
        )

        class Src(CandidateSource):
            def get(self, query, params):
                return [Candidate(id=i, features={"author_id": i,
                                                  "retrieval_score": 1.0})
                        for i in range(1, 4)]

        class ActionsHydrator(QueryFeatureHydrator):
            def hydrate(self, query, params):
                return {"user_actions": object()}  # sentinel: sequence present

        probs = np.full((3, NUM_ACTIONS), 0.5, np.float32)
        scorer = ps.PhoenixScorer(lambda a, b, v, ua: probs)
        pipeline = home_mixer.build_for_you_pipeline(
            candidate_pipelines=[CandidatePipeline(Src())],
            hydrators=[],
            predict_fn=lambda x: np.full((x.shape[0], 15), 0.9, np.float32),
            query_hydrators=[ActionsHydrator()],
            phoenix_scorer=scorer,
        )
        out = pipeline.run(home_mixer.ForYouQuery(user_id=1, max_results=5))
        assert not out.failures
        c = out.candidates[0]
        assert "predicted_fav" in c.features       # MaskNet ran first
        assert any(k.startswith("phoenix_") for k in c.features)  # then Phoenix


@pytest.mark.slow
class TestPhoenixTrainingQuality:
    """r3: a real training run with a quality number — synthetic preference
    structure (users fav authors they engaged before) must be learnable to
    AUC > 0.75 from a cold start (the VERDICT 'models without proof' gap)."""

    def test_train_to_auc(self):
        import optax

        from the_algorithm_tpu.training import metrics as tm

        rng = np.random.default_rng(0)
        L, C, A_BUCKETS = 16, 8, 32
        cfg = phoenix.PhoenixConfig(
            d_model=32, n_layers=1, n_heads=2, max_history=L,
            author_buckets=A_BUCKETS, dtype="float32")
        model = phoenix.PhoenixModel(cfg)

        def sample(batch):
            """History = repeated engagements with a user-specific author
            set; label: fav iff candidate author in that set."""
            seqs, cands, labels = [], [], []
            for _ in range(batch):
                liked = rng.choice(A_BUCKETS, 4, replace=False)
                hist_authors = rng.choice(liked, L)
                seq = phoenix.UserActionSequence(
                    action_ids=jnp.asarray(np.full(
                        L, int(phoenix.ActionName.SERVER_TWEET_FAV)),
                        jnp.int32),
                    author_hashes=jnp.asarray(hist_authors, jnp.int32),
                    age_s=jnp.asarray(np.arange(L)[::-1] * 60, jnp.int32),
                    valid=jnp.ones(L, bool),
                )
                c_auth = rng.choice(A_BUCKETS, C)
                y = np.isin(c_auth, liked).astype(np.float32)
                cand = phoenix.CandidateFeatures(
                    author_hashes=jnp.asarray(c_auth, jnp.int32),
                    bool_features=jnp.zeros(
                        (C, phoenix.NUM_BOOL_FEATURES), jnp.float32),
                    valid=jnp.ones(C, bool),
                )
                lab = np.zeros((C, phoenix.NUM_ACTIONS), np.float32)
                lab[:, int(phoenix.ActionName.SERVER_TWEET_FAV)] = y
                seqs.append(seq)
                cands.append(cand)
                labels.append(lab)
            stack = lambda xs: jax.tree_util.tree_map(  # noqa: E731
                lambda *a: jnp.stack(a), *xs)
            return stack(seqs), stack(cands), jnp.asarray(np.stack(labels))

        params = model.init(
            jax.random.PRNGKey(0),
            phoenix.UserActionSequence(
                jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.int32),
                jnp.zeros(L, jnp.int32), jnp.ones(L, bool)),
            phoenix.CandidateFeatures(
                jnp.zeros(C, jnp.int32),
                jnp.zeros((C, phoenix.NUM_BOOL_FEATURES), jnp.float32),
                jnp.ones(C, bool)),
        )
        fav = int(phoenix.ActionName.SERVER_TWEET_FAV)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, seqs, cands, labels):
            def loss_fn(p):
                logits = jax.vmap(
                    lambda s, c: model.apply(p, s, c))(seqs, cands)
                # positive-weighted BCE on the trained head — the per-head
                # class weighting of the serving recipe (sparse engagement
                # labels drown in a uniform 26-head mean)
                lg, y = logits[:, :, fav], labels[:, :, fav]
                ce = (jnp.maximum(lg, 0) - lg * y
                      + jnp.log1p(jnp.exp(-jnp.abs(lg))))
                return jnp.mean(ce * jnp.where(y > 0, 3.0, 1.0))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        for _ in range(300):
            seqs, cands, labels = sample(32)
            params, opt, loss = step(params, opt, seqs, cands, labels)

        seqs, cands, labels = sample(64)
        probs = jax.vmap(lambda s, c: model.apply(params, s, c))(seqs, cands)
        fav = int(phoenix.ActionName.SERVER_TWEET_FAV)
        auc = float(tm.auc(
            jax.nn.sigmoid(probs[:, :, fav]).reshape(-1),
            labels[:, :, fav].reshape(-1)))
        assert auc > 0.75, auc


class TestPhoenixLoop:
    """The serve → log → retrain → rescore round trip (r4 loop closure:
    PhoenixRescoringFeatureHydrator + ScoredPhoenixCandidates side effect
    + PhoenixModelRerankingScorer)."""

    def _store_and_candidates(self):
        from the_algorithm_tpu.mixers import phoenix_loop as pl

        clock = [0.0]
        store = pl.PhoenixScoreStore(ttl_s=100.0, now_fn=lambda: clock[0])
        cands = []
        for i in range(4):
            cands.append(Candidate(
                id=100 + i, score=0.5,
                features={"author_id": i,
                          "phoenix_fav": 0.8 if i == 0 else 0.0,
                          "phoenix_reply": 0.2 if i == 0 else 0.0}))
        return pl, store, clock, cands

    def _q(self, uid=7, now=1000):
        class Q:
            pass

        q = Q()
        q.user_id = uid
        q.now = now
        q.features = {}
        return q

    def test_side_effect_feeds_store_and_log(self):
        pl, store, clock, cands = self._store_and_candidates()
        se = pl.ScoredPhoenixCandidatesSideEffect(store)
        se.run(self._q(), cands, None)
        # only the phoenix-scored candidate logs
        assert len(se.log) == 1 and se.log[0].tweet_id == 100
        assert store.get(7, 100) is not None
        assert store.get(7, 101) is None
        # TTL expiry
        clock[0] = 200.0
        assert store.get(7, 100) is None

    def test_rescoring_hydrator_and_reranker(self):
        pl, store, clock, cands = self._store_and_candidates()
        pl.ScoredPhoenixCandidatesSideEffect(store).run(
            self._q(), cands, None)
        # next request: same candidate hydrates + reranks
        fresh = [Candidate(id=100, score=1.0, features={}),
                 Candidate(id=101, score=1.0, features={})]
        pl.PhoenixRescoringFeatureHydrator(store).hydrate(
            self._q(), fresh, None)
        assert fresh[0].features["phoenix_rescoring_fav"] == pytest.approx(0.8)
        assert "phoenix_rescoring_fav" not in fresh[1].features
        pl.PhoenixModelRerankingScorer(alpha=0.5).score(
            self._q(), fresh, None)
        assert fresh[0].features.get("phoenix_reranked") == 1.0
        assert fresh[0].score != 1.0  # blended
        assert fresh[1].score == 1.0  # untouched without rescoring data

    def test_pipeline_round_trip_serve_log_retrain(self):
        """serve → side-effect log → retrain Phoenix on the log → the
        retrained model separates engaged from unengaged candidates."""
        import optax

        from the_algorithm_tpu.mixers import phoenix_loop as pl
        from the_algorithm_tpu.models import phoenix as px

        rng = np.random.default_rng(0)
        L, C, NB = 8, 8, px.NUM_BOOL_FEATURES
        store = pl.PhoenixScoreStore()
        se = pl.ScoredPhoenixCandidatesSideEffect(store)

        # 1. SERVE: log several requests with phoenix-scored candidates
        for uid in range(6):
            cands = []
            for i in range(C):
                cands.append(Candidate(
                    id=1000 * uid + i, score=0.5,
                    features={"author_id": (uid + i) % 16,
                              "phoenix_fav": float(rng.random())}))
            se.run(self._q(uid=uid, now=100 + uid), cands, None)
        assert len(se.log) == 6 * C

        # 2. LABELS: users faved even tweet ids (the UUA join)
        engagements = {
            (r.user_id, r.tweet_id): [int(px.ActionName.SERVER_TWEET_FAV)]
            for r in se.log if r.tweet_id % 2 == 0
        }

        def seq_for(uid):
            return px.UserActionSequence(
                jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.int32),
                jnp.zeros(L, jnp.int32), jnp.zeros(L, bool))

        batches = pl.training_batch(
            se.log, engagements, seq_for, author_buckets=64,
            max_candidates=C)
        assert len(batches) == 6

        # 3. RETRAIN on the log
        cfg = px.PhoenixConfig(
            d_model=16, n_layers=1, n_heads=2, max_history=L,
            author_buckets=64)
        model = px.PhoenixModel(cfg)
        seq0, cands0, labels0 = batches[0]
        params = model.init(jax.random.PRNGKey(0), seq0, cands0)
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, seq, cands, labels):
            def loss_fn(p):
                logits = model.apply(p, seq, cands)
                return px.multi_action_loss(logits, labels, cands.valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        first = last = None
        for epoch in range(60):
            for seq, cands, labels in batches:
                params, opt, loss = step(params, opt, seq, cands, labels)
                if first is None:
                    first = float(loss)
        last = float(loss)
        assert last < first * 0.7, (first, last)

        # 4. SCORE DELTA: the retrained model rates an engaged candidate
        # above an unengaged one (even ids were faved; the model keys on
        # the learnable per-candidate inputs)
        probs = px.predict_next_actions(model, params, seq0, cands0)
        fav = np.asarray(probs[:, int(px.ActionName.SERVER_TWEET_FAV)])
        recs = sorted(se.log[:C], key=lambda r: r.position)
        even = [i for i, r in enumerate(recs) if r.tweet_id % 2 == 0]
        odd = [i for i, r in enumerate(recs) if r.tweet_id % 2 == 1]
        assert fav[even].mean() > fav[odd].mean()

    def test_builder_wires_loop(self):
        from the_algorithm_tpu.mixers import home_mixer, phoenix_loop as pl
        from the_algorithm_tpu.pipeline.component import (
            CandidatePipeline, CandidateSource)

        class Src(CandidateSource):
            name = "s"

            def get(self, query, params):
                return [Candidate(id=1, features={
                    "author_id": 1, "created_ts": 999, "phoenix_fav": 0.9})]

        store = pl.PhoenixScoreStore()
        pipe = home_mixer.build_for_you_pipeline(
            candidate_pipelines=[CandidatePipeline(Src())],
            hydrators=[],
            predict_fn=lambda x: np.full((x.shape[0], 15), 0.5, np.float32),
            feature_schema=home_mixer.DEFAULT_FEATURE_SCHEMA,
            phoenix_rescoring_store=store,
        )
        q1 = home_mixer.ForYouQuery(user_id=3, now=1000)
        out = pipe.run(q1)
        assert out.candidates and len(store) == 1  # side effect fed store
        # second serve: rescoring hydrates + reranks
        q2 = home_mixer.ForYouQuery(user_id=3, now=1001)
        out2 = pipe.run(q2)
        c = out2.candidates[0]
        assert c.features.get("phoenix_rescoring_fav") == pytest.approx(0.9)
        assert c.features.get("phoenix_reranked") == 1.0
