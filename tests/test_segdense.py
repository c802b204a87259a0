"""Segdense serve-path densification: spec round-trip, native densify in
schema order, and parity with the columnar assembler over the wide schema
(≡ navi/segdense + dr_transform)."""

import numpy as np
import pytest

from the_algorithm_tpu.core.hashing import feature_id
from the_algorithm_tpu.mixers import feature_schema as fs
from the_algorithm_tpu.serving import segdense as sd


class TestSpec:
    def test_round_trip(self, tmp_path):
        spec = sd.SegdenseSpec(("a", "b", "c"), ("label_x",))
        p = str(tmp_path / "spec.json")
        spec.save(p)
        loaded = sd.SegdenseSpec.load(p)
        assert loaded == spec

    def test_from_wide_schema_width(self):
        spec = sd.spec_from_schema(fs.WIDE_SCHEMA)
        assert spec.width == fs.total_width(fs.WIDE_SCHEMA)
        # no hash collisions across 1056 columns
        sd.RequestDensifier(spec)


class TestDensify:
    def test_schema_order_and_mask(self):
        spec = sd.SegdenseSpec(("z_feat", "a_feat", "m_feat"))
        d = sd.RequestDensifier(spec)
        vals, mask = d.densify([
            {"a_feat": 2.0, "z_feat": 1.0},
            {"m_feat": 3.0},
        ])
        np.testing.assert_array_equal(vals, [[1.0, 2.0, 0.0], [0.0, 0.0, 3.0]])
        np.testing.assert_array_equal(mask, [[1, 1, 0], [0, 0, 1]])

    def test_precomputed_ids_accepted(self):
        spec = sd.SegdenseSpec(("x", "y"))
        d = sd.RequestDensifier(spec)
        vals, _ = d.densify([{feature_id("y"): 5.0}])
        np.testing.assert_array_equal(vals, [[0.0, 5.0]])

    def test_labels(self):
        spec = sd.SegdenseSpec(("x",), ("lab_a", "lab_b"))
        d = sd.RequestDensifier(spec)
        feats, labels = d.densify_with_labels(
            [({"x": 1.0}, {"lab_b": 1.0})]
        )
        np.testing.assert_array_equal(feats, [[1.0]])
        np.testing.assert_array_equal(labels, [[0.0, 1.0]])


class TestColumnarParity:
    def test_matches_columnar_assembler_on_wide_schema(self):
        """The serve-path densifier and the in-process columnar assembler
        must produce the same [B, F] matrix for the same feature values —
        train/serve skew guard across the two assembly paths."""
        rng = np.random.default_rng(0)
        schema = fs.WIDE_SCHEMA
        names = fs.expand(schema)
        spec = sd.spec_from_schema(schema)
        d = sd.RequestDensifier(spec)

        B = 4
        ids = np.arange(B) + 10
        store = fs.ColumnarFeatureStore()
        cols = {}
        records = [dict() for _ in range(B)]
        for s in schema[:40]:  # a real slice across families
            if s.width == 1:
                v = rng.random(B).astype(np.float32)
                cols[s.name] = v
                for b in range(B):
                    records[b][s.name] = float(v[b])
            else:
                v = rng.random((B, s.width)).astype(np.float32)
                cols[s.name] = v
                for b in range(B):
                    for i in range(s.width):
                        records[b][f"{s.name}_{i}"] = float(v[b, i])
        store.add(ids, cols)

        want = store.assemble(ids, schema)
        got, _ = d.densify(records)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestSparseHTTPServing:
    def test_records_payload_densified_and_scored(self, tmp_path):
        """POST sparse {records: [{name: val}]} through the HTTP front with
        a per-model segdense densifier (the navi BPR path)."""
        import json
        import urllib.request

        from the_algorithm_tpu.serving.batcher import BatcherConfig
        from the_algorithm_tpu.serving.model_registry import (
            ModelRegistry, save_params_npz,
        )
        from the_algorithm_tpu.serving.server import InferenceServer

        d = tmp_path / "models" / "lr" / "1"
        d.mkdir(parents=True)
        save_params_npz(str(d), {"w": np.asarray([1.0, 2.0], np.float32)})
        reg = ModelRegistry(str(tmp_path / "models"))
        reg.scan_once()
        spec = sd.SegdenseSpec(("feat_a", "feat_b"))
        server = InferenceServer(
            reg,
            predict_builder=lambda params: (lambda x: x @ params["w"]),
            batcher_config=BatcherConfig(max_batch_size=8, max_delay_ms=2.0),
            densifiers={"lr": sd.RequestDensifier(spec)},
        )
        server.start()
        try:
            body = json.dumps({"records": [
                {"feat_a": 3.0}, {"feat_b": 4.0, "feat_a": 1.0},
            ]}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/v1/models/lr:predict",
                data=body, headers={"Content-Type": "application/json"},
            )
            out = json.loads(urllib.request.urlopen(req, timeout=10).read())
            np.testing.assert_allclose(out["predictions"], [3.0, 9.0])
        finally:
            server.close()
