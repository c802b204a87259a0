"""T&S training recipe: k-fold, schedules, class weighting, rescoring —
per-fold AUC on synthetic labeled data (≡ toxicity/train.py:39-355)."""

import numpy as np
import pytest

from the_algorithm_tpu.models import trust_safety as ts
from the_algorithm_tpu.models import trust_safety_train as tst


def _synthetic_pool(n=240, L=16, vocab=256, seed=0):
    """Separable synthetic text: toxic docs carry tokens from a 'toxic'
    vocabulary band, plus correlated nsfw/abuse labels."""
    rng = np.random.default_rng(seed)
    y_tox = (rng.random(n) < 0.3).astype(np.float32)
    tokens = rng.integers(0, vocab // 2, (n, L)).astype(np.int32)
    toxic_band = rng.integers(vocab // 2, vocab, (n, L)).astype(np.int32)
    inject = rng.random((n, L)) < 0.6
    tokens = np.where((y_tox[:, None] > 0) & inject, toxic_band, tokens)
    mask = np.ones((n, L), np.float32)
    y_nsfw = np.clip(y_tox + (rng.random(n) < 0.05), 0, 1).astype(np.float32)
    y_abuse = y_tox * (rng.random(n) < 0.8).astype(np.float32)
    labels = np.stack([y_tox, y_nsfw, y_abuse], axis=1)
    return tokens, mask, labels


class TestKFoldSplit:
    def test_partitions_cover_everything_once(self):
        splits = tst.kfold_indices(100, 5, seed=0)
        all_val = np.concatenate([v for _, v in splits])
        assert sorted(all_val.tolist()) == list(range(100))
        for tr, va in splits:
            assert set(tr) & set(va) == set()
            assert len(tr) + len(va) == 100

    def test_stratified_ratio_preserved(self):
        strat = (np.arange(200) < 40).astype(np.int32)  # 20% positive
        splits = tst.kfold_indices(200, 4, seed=1, stratify=strat)
        for _, va in splits:
            frac = strat[va].mean()
            assert 0.1 <= frac <= 0.3


class TestSchedulesAndWeights:
    def test_schedules_shape(self):
        for name in ("cosine", "warmup_linear", "constant"):
            cfg = tst.RecipeConfig(schedule=name, learning_rate=1e-2)
            sched = tst.make_schedule(cfg, total_steps=100)
            vals = [float(sched(s)) for s in (0, 10, 50, 99)]
            assert max(vals) <= 1e-2 + 1e-9
            if name != "constant":
                assert vals[0] < vals[1]  # warmup rises

    def test_class_pos_weights(self):
        labels = np.zeros((100, 2), np.float32)
        labels[:10, 0] = 1  # 10% positive → weight 9
        labels[:50, 1] = 1  # balanced → weight 1
        w = tst.class_pos_weights(labels)
        np.testing.assert_allclose(w, [9.0, 1.0])


@pytest.mark.slow
class TestRecipeEndToEnd:
    def test_kfold_learns_and_reports_auc(self):
        tokens, mask, labels = _synthetic_pool()
        model = ts.TextSafetyModel(
            config=ts.TextEncoderConfig(
                vocab_size=256, max_len=16, dim=32, heads=2, layers=1),
        )
        cfg = tst.RecipeConfig(folds=3, epochs=2, batch_size=32,
                               learning_rate=3e-3)
        res = tst.train_kfold(model, tokens, mask, labels, cfg)
        assert len(res.folds) == 3
        assert res.oof_auc_per_head.shape == (3,)
        # separable data: the recipe must actually learn
        assert res.oof_auc_per_head[0] > 0.8, res.oof_auc_per_head
        assert res.mean_auc > 0.7

    def test_rescoring_changes_weights_not_crashes(self):
        tokens, mask, labels = _synthetic_pool(n=120)
        model = ts.TextSafetyModel(
            config=ts.TextEncoderConfig(
                vocab_size=256, max_len=16, dim=32, heads=2, layers=1),
        )
        res = tst.train_kfold(
            model, tokens, mask, labels,
            tst.RecipeConfig(folds=2, epochs=2, batch_size=32,
                             rescore=True, rescore_gamma=3.0))
        assert np.isfinite(res.oof_auc_per_head).all()
