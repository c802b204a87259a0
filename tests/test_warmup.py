"""Serving warmup: per-bucket pre-compilation, fail-closed readiness,
registry-driven spec building (≡ the reference WarmupHandlers)."""

import numpy as np

from the_algorithm_tpu.serving import warmup as wu


class TestRunWarmup:
    def test_all_buckets_driven(self):
        calls = []
        spec = wu.WarmupSpec(
            model_name="m",
            predict_fn=lambda x: calls.append(x.shape) or x.sum(axis=-1),
            make_input=lambda b: np.zeros((b, 4), np.float32),
            batch_buckets=(1, 8),
        )
        reports = wu.run_warmup([spec], repeats=2)
        assert reports[0].ok
        assert calls == [(1, 4), (1, 4), (8, 4), (8, 4)]
        assert set(reports[0].bucket_seconds) == {1, 8}
        assert reports[0].total_seconds >= 0

    def test_failure_is_fail_closed(self):
        def bad(x):
            raise RuntimeError("compile exploded")

        spec = wu.WarmupSpec("bad", bad, lambda b: np.zeros((b, 2)),
                             batch_buckets=(1, 8))
        r = wu.run_warmup([spec])[0]
        assert not r.ok and "compile exploded" in r.error
        assert 8 not in r.bucket_seconds  # stopped at the failing bucket

    def test_registry_specs(self, tmp_path):
        from the_algorithm_tpu.serving import model_registry as mr

        d = tmp_path / "models" / "ranker" / "1"
        d.mkdir(parents=True)
        mr.save_params_npz(str(d), {"w": np.ones(4, np.float32)})
        reg = mr.ModelRegistry(str(tmp_path / "models"))
        reg.scan_once()
        specs = wu.registry_warmup_specs(
            reg,
            predict_builder=lambda name, params: (
                lambda x: x @ params["w"]
            ),
            input_makers={"ranker": lambda b: np.ones((b, 4), np.float32)},
            batch_buckets=(1, 4),
        )
        reports = wu.run_warmup(specs)
        assert [r.model_name for r in reports] == ["ranker"]
        assert all(r.ok for r in reports)
