"""End-to-end DataRecordTrainer: TRec shards → calibrate → train → export → serve.

≡ the reference's full light-ranker lifecycle (``twml/twml/trainers/
data_record_trainer.py:72,533,775`` + ``deepbird/.../earlybird/train.py`` +
navi model-dir serving) driven through files, not in-memory arrays.
"""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu import native
from the_algorithm_tpu.data import datarecord, synthetic
from the_algorithm_tpu.models import light_ranker
from the_algorithm_tpu.ops import discretizer as disc
from the_algorithm_tpu.ops import hashed_lr
from the_algorithm_tpu.training import data_record_trainer as drt
from the_algorithm_tpu.training import metrics
from the_algorithm_tpu.training.trainer import TrainerConfig


def _make_shards(tmp_path, n_shards=4, per_shard=512, num_features=16, seed=0):
    feats, labels = synthetic.lr_examples(
        n_shards * per_shard, num_features=num_features, seed=seed
    )
    fids = feats["feature_ids"]
    vals = feats["values"]
    label_fid = 7  # engagement label feature id
    paths = []
    for s in range(n_shards):
        records = []
        for r in range(s * per_shard, (s + 1) * per_shard):
            cont = {int(fids[i]): float(vals[r, i]) for i in range(len(fids))}
            records.append((cont, {label_fid: float(labels[r])}))
        p = str(tmp_path / f"part-{s:05d}.trec")
        datarecord.write_records(p, records, block_size=128)
        paths.append(p)
    return paths, fids, vals, labels, label_fid


class TestTRecFiles:
    def test_round_trip(self, tmp_path):
        records = [
            ({1: 0.5, 2: -1.0}, {7: 1.0}),
            ({1: 2.5}, {7: 0.0}),
            ({}, {}),
        ]
        p = str(tmp_path / "a.trec")
        datarecord.write_records(p, records, block_size=2)
        blocks = list(datarecord.iter_file_blocks(p))
        assert len(blocks) == 2  # 2 + 1 records
        got = [r for b in blocks for r in native.decode_block(b)]
        assert len(got) == 3
        assert got[0][0] == {1: 0.5, 2: -1.0} and got[0][1] == {7: 1.0}
        assert got[2] == ({}, {})

    def test_densify_labels_section(self, tmp_path):
        records = [({1: 3.0}, {7: 1.0, 9: 0.5}), ({1: 1.0}, {9: 2.0})]
        block = native.encode_block(records)
        labels, mask = native.densify_labels(block, np.asarray([7, 9], np.int64))
        np.testing.assert_allclose(labels, [[1.0, 0.5], [0.0, 2.0]])
        np.testing.assert_array_equal(mask, [[True, True], [False, True]])

    def test_host_sharding_partitions_files(self, tmp_path):
        paths = []
        for s in range(6):
            p = str(tmp_path / f"p{s}.trec")
            datarecord.write_records(p, [({1: float(s)}, {})])
            paths.append(p)
        d0 = datarecord.TRecDataset(paths, host_id=0, num_hosts=2)
        d1 = datarecord.TRecDataset(paths, host_id=1, num_hosts=2)
        assert set(d0.host_paths()) | set(d1.host_paths()) == set(paths)
        assert not set(d0.host_paths()) & set(d1.host_paths())

    def test_batches_deterministic_across_runs(self, tmp_path):
        paths, fids, *_ = _make_shards(tmp_path, n_shards=2, per_shard=64)
        tf = datarecord.densify_transform(np.sort(fids))
        d = datarecord.TRecDataset(paths, seed=3)
        a = [b["values"] for b in d.batches(32, tf, num_epochs=1)]
        b = [b["values"] for b in d.batches(32, tf, num_epochs=1)]
        assert len(a) == len(b) == 4
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert all(x.shape == (32, len(fids)) for x in a)


class TestEndToEnd:
    def test_trec_to_trained_to_served(self, tmp_path, mesh_dp8):
        paths, fids, vals, labels, label_fid = _make_shards(
            tmp_path, n_shards=4, per_shard=512, num_features=12, seed=1
        )
        vocab = np.sort(fids)
        cfg = light_ranker.LightRankerConfig(n_bins=8, output_bits=12)

        # phase 1: calibrate from the stream
        dataset = datarecord.TRecDataset(paths, seed=0)
        hd = drt.calibrate_from_files(
            dataset, vocab, cfg.n_bins, cfg.output_bits, max_records=1024
        )
        assert hd.bins.bin_vals.shape == (12, 7)

        # phase 2: train from files (hashed sparse batches built in C++)
        F = len(vocab)
        transform = datarecord.hashed_lr_transform(
            vocab, hd.bins.bin_vals, cfg.output_bits, max_width=F,
            label_vocab=np.asarray([label_fid], np.int64),
        )

        def batch_fn(raw):
            return (
                hashed_lr.SparseBatch(
                    jnp.asarray(raw["indices"]),
                    jnp.asarray(raw["sparse_values"]),
                    jnp.asarray(raw["sparse_mask"]),
                ),
                jnp.asarray(raw["labels"][:, 0]),
            )

        def loss(params, batch):
            sb, y = batch
            l = light_ranker.loss_fn(params, sb, y, l2=cfg.l2)
            return l, {}

        trainer = drt.DataRecordTrainer(
            loss,
            light_ranker.init_params(cfg),
            mesh_dp8,
            [(r".*", jax.sharding.PartitionSpec())],
            transform,
            batch_fn,
            drt.DataRecordTrainerConfig(
                batch_size=256, n_bins=cfg.n_bins, output_bits=cfg.output_bits,
                trainer=TrainerConfig(learning_rate=0.5, optimizer="adagrad"),
            ),
        )
        trainer.fit_from_files(dataset, num_steps=40)

        # AUC on held-out transform of the raw arrays must beat chance
        idx = hd.transform_np(
            np.broadcast_to(fids[None, :], vals.shape), vals
        )
        sb = hashed_lr.SparseBatch(
            jnp.asarray(idx), jnp.ones(vals.shape, jnp.float32),
            jnp.ones(vals.shape, bool),
        )
        logits = hashed_lr.sparse_logits(
            sb, trainer.params["weights"], trainer.params["bias"]
        )
        auc = float(metrics.auc(logits, jnp.asarray(labels)))
        assert auc > 0.75, auc

        # phase 3: export → registry artifact → serve over HTTP
        from the_algorithm_tpu.serving.batcher import BatcherConfig
        from the_algorithm_tpu.serving.model_registry import (
            ModelRegistry, load_params_npz,
        )
        from the_algorithm_tpu.serving.server import InferenceServer

        root = tmp_path / "models"
        vdir = str(root / "light_ranker" / "1")
        trainer.export(
            vdir,
            extra={
                "feature_ids": hd.bins.feature_ids,
                "bin_vals": hd.bins.bin_vals,
                "output_bits": np.asarray(cfg.output_bits),
            },
        )

        def load(version_dir):
            z = load_params_npz(version_dir)
            return light_ranker.LightRankerModel(
                feature_ids=z["feature_ids"], bin_vals=z["bin_vals"],
                weights=jnp.asarray(z["weights"]), bias=jnp.asarray(z["bias"]),
                output_bits=int(z["output_bits"]),
            )

        registry = ModelRegistry(str(root), load_fn=load)
        registry.scan_once()
        server = InferenceServer(
            registry,
            predict_builder=lambda model: (
                lambda x: light_ranker.predict_proba(model, x)
            ),
            batcher_config=BatcherConfig(max_batch_size=64, max_delay_ms=5.0),
        )
        server.start()
        try:
            body = json.dumps({"instances": vals[:4].tolist()}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/v1/models/light_ranker:predict",
                data=body, headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                preds = np.asarray(json.loads(resp.read())["predictions"])
            want = light_ranker.predict_proba(load(vdir), vals[:4])
            np.testing.assert_allclose(preds, want, rtol=1e-5, atol=1e-6)
        finally:
            server.close()
            registry.close()


class TestTrainerPolish:
    """Best-checkpoint selection + early stopping (twml trainer.py:644-659)."""

    def test_best_step_tracking_and_early_stop(self, mesh_dp8):
        from the_algorithm_tpu.training.trainer import Trainer, TrainerConfig

        params = {"w": jnp.zeros((8,), jnp.float32)}

        def loss(p, batch):
            return jnp.sum((p["w"] - batch) ** 2), {}

        # eval metric improves then degrades deterministically
        seq = iter([0.5, 0.7, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4])

        def eval_fn(p):
            return {"auc_mean": next(seq)}

        t = Trainer(
            loss, params, mesh_dp8, [(r".*", jax.sharding.PartitionSpec())],
            TrainerConfig(
                learning_rate=1e-2, eval_metric="auc_mean",
                early_stopping_patience=2,
            ),
        )
        batches = iter(lambda: jnp.ones((8, 8), jnp.float32), None)
        t.fit(batches, num_steps=100, eval_fn=eval_fn, eval_every=1)
        assert t.best_metric == pytest.approx(0.9)
        assert t.best_step == 3
        assert t.step == 5  # stopped after 2 stale evals past the peak
        assert t.best_or_latest_step() == 3

    def test_make_auc_per_head_eval(self):
        from the_algorithm_tpu.training.trainer import make_auc_per_head_eval

        rng = np.random.default_rng(0)
        y = (rng.random((256, 2)) < 0.5).astype(np.float32)
        # head 0 perfectly separable, head 1 random
        def predict(params, batch):
            return np.stack([y[:, 0] * 2 - 1, rng.random(256)], axis=1)

        eval_fn = make_auc_per_head_eval(
            predict, [(None, y)], ["fav", "reply"]
        )
        out = eval_fn(None)
        assert out["auc/fav"] == pytest.approx(1.0)
        assert 0.4 < out["auc/reply"] < 0.6
        assert out["auc_mean"] == pytest.approx(
            (out["auc/fav"] + out["auc/reply"]) / 2
        )
