"""Model + trainer tests: light ranker AUC, MaskNet multi-task, two-tower
retrieval, trainer DP sharding + checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from the_algorithm_tpu.data import synthetic
from the_algorithm_tpu.models import light_ranker as lr
from the_algorithm_tpu.models import masknet, two_tower
from the_algorithm_tpu.training import metrics
from the_algorithm_tpu.training.trainer import Trainer, TrainerConfig


class TestMetrics:
    def test_auc_perfect_and_random(self):
        scores = jnp.asarray([0.1, 0.2, 0.8, 0.9])
        labels = jnp.asarray([0.0, 0.0, 1.0, 1.0])
        assert float(metrics.auc(scores, labels)) == pytest.approx(1.0)
        assert float(metrics.auc(-scores, labels)) == pytest.approx(0.0)

    def test_auc_matches_sklearn_formula(self):
        rng = np.random.default_rng(0)
        scores = rng.normal(size=500).astype(np.float32)
        labels = (rng.uniform(size=500) < 0.3).astype(np.float32)
        got = float(metrics.auc(jnp.asarray(scores), jnp.asarray(labels)))
        # reference rank computation
        from scipy.stats import rankdata

        ranks = rankdata(scores)
        pos = labels.sum()
        neg = len(labels) - pos
        want = (ranks[labels == 1].sum() - pos * (pos + 1) / 2) / (pos * neg)
        assert got == pytest.approx(float(want), abs=1e-5)

    def test_auc_with_ties(self):
        scores = jnp.asarray([0.5, 0.5, 0.5, 0.5])
        labels = jnp.asarray([0.0, 1.0, 0.0, 1.0])
        assert float(metrics.auc(scores, labels)) == pytest.approx(0.5)

    def test_recall_at_k(self):
        retrieved = jnp.asarray([[1, 2, 3], [4, 5, 6]])
        relevant = jnp.asarray([[2, 9], [4, 6]])
        got = float(metrics.recall_at_k(retrieved, relevant, pad_id=-1))
        assert got == pytest.approx((0.5 + 1.0) / 2)


class TestLightRanker:
    def test_learns_auc_above_chance(self):
        cfg = lr.LightRankerConfig(n_bins=16, output_bits=14, learning_rate=0.5)
        feats, labels = synthetic.lr_examples(4000, num_features=20, seed=1)
        hd = lr.calibrate(feats["feature_ids"], feats["values"][:1000], cfg)
        batch = lr.featurize(hd, feats["feature_ids"], feats["values"])
        labels_j = jnp.asarray(labels)

        params = lr.init_params(cfg)
        import optax

        tx = optax.adagrad(cfg.learning_rate)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, g = jax.value_and_grad(
                lambda p: lr.loss_fn(p, batch, labels_j)
            )(params)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(60):
            params, opt_state, loss = step(params, opt_state)
        logits = lr.logits_fn(params, batch)
        auc = float(metrics.auc(logits, labels_j))
        assert auc > 0.75, auc

    def test_lolly_parity_training(self):
        """MSE-training against a golden discretized-LR reproduces its logits
        (the --replicate_lolly parity harness, train.py:88-91)."""
        rng = np.random.default_rng(2)
        F, n_bins = 8, 8
        feats, _ = synthetic.lr_examples(2000, num_features=F, seed=3)
        cfg = lr.LightRankerConfig(n_bins=n_bins, output_bits=16, learning_rate=0.3)
        hd = lr.calibrate(feats["feature_ids"], feats["values"], cfg)
        # golden lolly model on the SAME bins (bins are stored sorted by
        # feature id — resolve each value column to its bin row)
        rows = np.array([hd.row_index()[int(f)] for f in feats["feature_ids"]])
        bin_weights = rng.normal(size=(F, n_bins)).astype(np.float32)
        golden = lr.lolly_linear_score(
            feats["values"], hd.bins.bin_vals[rows], bin_weights, bias=0.25
        )
        batch = lr.featurize(hd, feats["feature_ids"], feats["values"])
        golden_j = jnp.asarray(golden.astype(np.float32))

        params = lr.init_params(cfg)
        import optax

        tx = optax.adam(0.05)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def mse(p):
                return jnp.mean((lr.logits_fn(p, batch) - golden_j) ** 2)

            loss, g = jax.value_and_grad(mse)(params)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(300):
            params, opt_state, loss = step(params, opt_state)
        # hashed LR can represent the lolly model exactly (one bucket per
        # (feature, bin) modulo collisions) → near-zero MSE
        assert float(loss) < 1e-3, float(loss)


class TestMaskNet:
    def test_forward_shapes(self):
        cfg = masknet.MaskNetConfig(
            num_features=64, num_heads=5, mask_blocks=2, block_dim=32,
            aggregation_dim=16, head_hidden=(32,),
        )
        model = masknet.MaskNet(cfg)
        x = jnp.ones((8, 64))
        params = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(params, x)
        assert logits.shape == (8, 5)
        assert logits.dtype == jnp.float32

    def test_trains_on_synthetic_multitask(self):
        rng = np.random.default_rng(4)
        B, F, H = 512, 32, 4
        x = rng.normal(size=(B, F)).astype(np.float32)
        w_true = rng.normal(size=(F, H))
        y = (1 / (1 + np.exp(-(x @ w_true))) > 0.5).astype(np.float32)

        cfg = masknet.MaskNetConfig(
            num_features=F, num_heads=H, mask_blocks=2, block_dim=32,
            aggregation_dim=16, head_hidden=(32,), dtype="float32",
        )
        model = masknet.MaskNet(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        import optax

        tx = optax.adam(1e-2)
        opt_state = tx.init(params)
        xb, yb = jnp.asarray(x), jnp.asarray(y)

        @jax.jit
        def step(params, opt_state):
            def loss(p):
                return masknet.multi_task_loss(model.apply(p, xb), yb)

            lv, g = jax.value_and_grad(loss)(params)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, lv

        for _ in range(150):
            params, opt_state, lv = step(params, opt_state)
        aucs = metrics.auc_per_head(model.apply(params, xb), yb)
        assert float(jnp.min(aucs)) > 0.85, aucs

    def test_weighted_model_score_semantics(self):
        w = jnp.asarray([1.0, -2.0])
        # positive combination
        s = masknet.weighted_model_score(jnp.asarray([[0.9, 0.0]]), w)
        assert float(s[0]) == pytest.approx(0.9 + masknet.EPSILON)
        # negative combination lands in (0, ε] and keeps order
        s_bad = masknet.weighted_model_score(jnp.asarray([[0.0, 0.9]]), w)
        s_worse = masknet.weighted_model_score(jnp.asarray([[0.0, 1.0]]), w)
        assert 0 < float(s_bad[0]) <= masknet.EPSILON
        assert float(s_worse[0]) < float(s_bad[0])
        # zero weights → max(score, 0)
        s0 = masknet.weighted_model_score(jnp.asarray([[0.5, 0.5]]), jnp.zeros(2))
        assert float(s0[0]) == 0.0


class TestTwoTower:
    def test_in_batch_loss_and_retrieval(self):
        cfg = two_tower.TwoTowerConfig(
            num_users=64, num_items=128, embed_dim=16, tower_hidden=(16,),
        )
        model = two_tower.TwoTower(cfg)
        rng = np.random.default_rng(5)
        # planted preference: user u likes item u*2
        users = np.arange(64, dtype=np.int32)
        items = (users * 2).astype(np.int32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(users), jnp.asarray(items)
        )
        import optax

        tx = optax.adam(5e-2)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss(p):
                u, v = model.apply(p, jnp.asarray(users), jnp.asarray(items))
                return two_tower.in_batch_softmax_loss(
                    u, v, cfg.temperature, jnp.asarray(items)
                )

            lv, g = jax.value_and_grad(loss)(params)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, lv

        for _ in range(200):
            params, opt_state, lv = step(params, opt_state)

        u, v = model.apply(params, jnp.asarray(users), jnp.asarray(items))
        all_items = model.apply(
            params, jnp.asarray(np.zeros(1, np.int32)),
            jnp.arange(128, dtype=jnp.int32),
        )[1]
        top_ids, _ = two_tower.retrieve_top_k(u, all_items, k=5)
        hits = (np.asarray(top_ids) == items[:, None]).any(axis=1).mean()
        assert hits > 0.9, hits

    def test_accidental_hit_masking(self):
        u = jnp.eye(4)
        v = jnp.eye(4)
        ids = jnp.asarray([7, 7, 8, 9])
        loss_masked = two_tower.in_batch_softmax_loss(u, v, 1.0, ids)
        loss_unmasked = two_tower.in_batch_softmax_loss(u, v, 1.0, None)
        assert float(loss_masked) <= float(loss_unmasked) + 1e-6


class TestTrainer:
    def _make(self, mesh, tmp=None):
        cfg = two_tower.TwoTowerConfig(
            num_users=32, num_items=32, embed_dim=8, tower_hidden=(8,),
        )
        model = two_tower.TwoTower(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((4,), jnp.int32), jnp.zeros((4,), jnp.int32),
        )

        def loss_fn(params, batch):
            u, v = model.apply(params, batch["users"], batch["items"])
            loss = two_tower.in_batch_softmax_loss(u, v, 0.1, batch["items"])
            return loss, {}

        return Trainer(
            loss_fn,
            params,
            mesh,
            [(r"(user|item)_table", P("model", None)), (r".*", P())],
            TrainerConfig(learning_rate=1e-2, checkpoint_dir=tmp),
        )

    def test_params_sharded_and_loss_decreases(self, mesh8):
        trainer = self._make(mesh8)
        table = trainer.params["params"]["user_table"]
        assert table.sharding.spec == P("model", None)
        rng = np.random.default_rng(0)

        def gen():
            while True:
                users = rng.integers(0, 32, 16).astype(np.int32)
                yield {"users": users, "items": (users % 32).astype(np.int32)}

        first = trainer.train_step(next(gen()))["loss"]
        out = trainer.fit(gen(), num_steps=30)
        assert out["loss"] < float(first)

    def test_checkpoint_round_trip(self, mesh8, tmp_path):
        trainer = self._make(mesh8, str(tmp_path / "ckpt"))
        rng = np.random.default_rng(1)
        users = rng.integers(0, 32, 16).astype(np.int32)
        batch = {"users": users, "items": users}
        trainer.train_step(batch)
        trainer.save()
        want = np.asarray(trainer.params["params"]["user_table"])
        trainer.train_step(batch)  # diverge
        trainer.restore()
        got = np.asarray(trainer.params["params"]["user_table"])
        np.testing.assert_allclose(got, want)
