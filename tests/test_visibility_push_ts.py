"""Visibility rule engine, push ranking models, trust & safety models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.models import push_rankers, trust_safety
from the_algorithm_tpu.pipeline import visibility as vis
from the_algorithm_tpu.pipeline.component import Candidate


class TestVisibility:
    def test_drop_beats_downrank(self):
        eng = vis.standard_engine()
        out = eng.evaluate(
            vis.SafetyLevel.TIMELINE_HOME,
            {"is_deleted": True, "toxicity_score": 0.95},
        )
        assert out.action == vis.Action.DROP
        assert "DropDeletedTweet" in out.triggered_rules

    def test_allow_by_default(self):
        eng = vis.standard_engine()
        out = eng.evaluate(vis.SafetyLevel.TIMELINE_HOME, {})
        assert out.action == vis.Action.ALLOW

    def test_level_specific_rules(self):
        eng = vis.standard_engine()
        feats = {"toxicity_score": 0.85}
        home = eng.evaluate(vis.SafetyLevel.TIMELINE_HOME, feats)
        recs = eng.evaluate(vis.SafetyLevel.RECOMMENDATIONS, feats)
        assert home.action == vis.Action.ALLOW  # home threshold is 0.9
        assert recs.action == vis.Action.DROP  # recs threshold is 0.8

    def test_decider_gate(self):
        rule = vis.Rule(
            "Gated", lambda f: True, vis.Action.DROP, enabled=lambda: False
        )
        eng = vis.VisibilityRuleEngine({vis.SafetyLevel.SEARCH: [rule]})
        assert eng.evaluate(vis.SafetyLevel.SEARCH, {}).action == vis.Action.ALLOW

    def test_fail_closed(self):
        def boom(f):
            raise RuntimeError("store down")

        open_rule = vis.Rule("Open", boom, vis.Action.DROP, fail_closed=False)
        closed_rule = vis.Rule("Closed", boom, vis.Action.DROP, fail_closed=True)
        eng = vis.VisibilityRuleEngine({vis.SafetyLevel.SEARCH: [open_rule]})
        assert eng.evaluate(vis.SafetyLevel.SEARCH, {}).action == vis.Action.ALLOW
        eng2 = vis.VisibilityRuleEngine({vis.SafetyLevel.SEARCH: [closed_rule]})
        assert eng2.evaluate(vis.SafetyLevel.SEARCH, {}).action == vis.Action.DROP

    def test_pipeline_filter_integration(self):
        eng = vis.standard_engine()
        f = vis.VisibilityFilter(eng, vis.SafetyLevel.TIMELINE_HOME)
        cands = [
            Candidate(id=1, score=1.0, features={"is_deleted": True}),
            Candidate(id=2, score=1.0, features={"toxicity_score": 0.95}),
            Candidate(id=3, score=1.0, features={"is_nsfw_media": True}),
            Candidate(id=4, score=1.0, features={}),
        ]
        out = f.apply(object(), cands, None)
        kept_ids = [c.id for c in out.kept]
        assert kept_ids == [2, 3, 4]
        assert out.kept[0].score == pytest.approx(0.25)  # downranked
        assert out.kept[1].features["visibility_interstitial"] == "nsfw_media"


class TestPushRankers:
    def test_mlp_shapes_and_train_mode(self):
        model = push_rankers.LightRankingMLP(hidden=(16, 8), num_heads=2)
        x = jnp.ones((4, 10))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        logits, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert logits.shape == (4, 2)
        logits_eval = model.apply(variables, x, train=False)
        assert logits_eval.shape == (4, 2)

    def test_channel_wise_dense(self):
        layer = push_rankers.ChannelWiseDense(output_size=5)
        x = jnp.ones((2, 7, 3))
        params = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(params, x)
        assert out.shape == (2, 5, 3)
        # channels are independent: zeroing channel 0 input changes only ch 0
        x2 = x.at[:, :, 0].set(0.0)
        out2 = layer.apply(params, x2)
        assert not np.allclose(np.asarray(out[:, :, 0]), np.asarray(out2[:, :, 0]))
        np.testing.assert_allclose(
            np.asarray(out[:, :, 1:]), np.asarray(out2[:, :, 1:])
        )

    def test_clemnet_forward_and_learns(self):
        rng = np.random.default_rng(0)
        B, F = 256, 12
        x = rng.normal(size=(B, F)).astype(np.float32)
        w = rng.normal(size=(F,))
        y = (x @ w > 0).astype(np.float32)[:, None]
        model = push_rankers.ClemNet(
            blocks=(
                push_rankers.ClemNetBlockParams(dense_size=16, conv_filters=2),
                push_rankers.ClemNetBlockParams(dense_size=16, conv_filters=2, residual=True),
            ),
            num_heads=1,
        )
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        import optax

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt):
            def loss(p):
                logits, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    jnp.asarray(x), train=True, mutable=["batch_stats"],
                )
                ce = optax.sigmoid_binary_cross_entropy(logits, jnp.asarray(y))
                return jnp.mean(ce), updates["batch_stats"]

            (lv, bs), g = jax.value_and_grad(loss, has_aux=True)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), bs, opt, lv

        for _ in range(100):
            params, batch_stats, opt, lv = step(params, batch_stats, opt)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(x), train=False,
        )
        from the_algorithm_tpu.training.metrics import auc

        assert float(auc(logits[:, 0], jnp.asarray(y[:, 0]))) > 0.85


class TestTrustSafety:
    def test_text_model_forward(self):
        cfg = trust_safety.TextEncoderConfig(
            vocab_size=1024, max_len=16, dim=32, heads=2, layers=1
        )
        model = trust_safety.TextSafetyModel(cfg)
        ids, mask = trust_safety.tokenize_text("you are horrible", cfg)
        variables = model.init(
            jax.random.PRNGKey(0), ids[None], mask[None]
        )
        logits = model.apply(variables, ids[None], mask[None])
        assert logits.shape == (1, 3)

    def test_text_model_learns_token_signal(self):
        cfg = trust_safety.TextEncoderConfig(
            vocab_size=256, max_len=8, dim=32, heads=2, layers=1
        )
        model = trust_safety.TextSafetyModel(cfg, heads=("toxicity",))
        rng = np.random.default_rng(0)
        B = 256
        toks = rng.integers(1, 256, (B, 8)).astype(np.int32)
        labels = (toks == 7).any(axis=1).astype(np.float32)[:, None]  # token 7 = toxic
        toks = np.where(
            (labels[:, 0] > 0)[:, None] & (np.arange(8) == 0)[None, :], 7, toks
        )
        mask = np.ones((B, 8), np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(toks), jnp.asarray(mask))
        import optax

        tx = optax.adam(3e-3)
        opt = tx.init(variables)

        @jax.jit
        def step(variables, opt):
            def loss(v):
                logits = model.apply(v, jnp.asarray(toks), jnp.asarray(mask))
                return jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logits, jnp.asarray(labels))
                )

            lv, g = jax.value_and_grad(loss)(variables)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(variables, up), opt, lv

        for _ in range(80):
            variables, opt, lv = step(variables, opt)
        logits = model.apply(variables, jnp.asarray(toks), jnp.asarray(mask))
        from the_algorithm_tpu.training.metrics import auc

        assert float(auc(logits[:, 0], jnp.asarray(labels[:, 0]))) > 0.9

    def test_media_model_forward(self):
        model = trust_safety.MediaSafetyModel(widths=(4, 8))
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 1)
