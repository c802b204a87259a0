"""Serving edge tests: dynamic batcher, model registry hot-swap, HTTP front."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from the_algorithm_tpu.serving.batcher import BatcherConfig, DynamicBatcher
from the_algorithm_tpu.serving.model_registry import (
    ModelRegistry,
    load_params_npz,
    save_params_npz,
)
from the_algorithm_tpu.serving.server import InferenceServer


class TestDynamicBatcher:
    def test_batches_concurrent_requests(self):
        seen_sizes = []

        def predict(x):
            seen_sizes.append(x.shape[0])
            return x * 2

        b = DynamicBatcher(
            predict, BatcherConfig(max_batch_size=64, max_delay_ms=30.0)
        )
        futs = [b.submit(np.full((1, 4), i, np.float32)) for i in range(8)]
        outs = [f.result(timeout=5) for f in futs]
        b.close()
        for i, o in enumerate(outs):
            np.testing.assert_allclose(o, np.full((1, 4), 2 * i))
        # at least some requests coalesced into one padded batch
        assert max(seen_sizes) >= 8

    def test_deadline_fires_partial_batch(self):
        def predict(x):
            return x

        b = DynamicBatcher(
            predict, BatcherConfig(max_batch_size=1024, max_delay_ms=5.0)
        )
        t0 = time.perf_counter()
        out = b.predict(np.ones((2, 3), np.float32), timeout=5)
        dt = time.perf_counter() - t0
        b.close()
        assert out.shape == (2, 3)
        assert dt < 1.0  # didn't wait for a full 1024 batch

    def test_error_propagates(self):
        def predict(x):
            raise ValueError("model exploded")

        b = DynamicBatcher(predict, BatcherConfig(max_delay_ms=1.0))
        with pytest.raises(ValueError):
            b.predict(np.ones((1, 2), np.float32), timeout=5)
        b.close()


class TestModelRegistry:
    def test_loads_latest_version_and_hot_swaps(self, tmp_path):
        root = str(tmp_path)
        save_params_npz(f"{root}/ranker/1", {"w": np.ones(3)})
        reg = ModelRegistry(root)
        assert reg.scan_once() == ["ranker"]
        assert reg.version("ranker") == 1
        np.testing.assert_allclose(reg.get("ranker")["w"], 1.0)

        save_params_npz(f"{root}/ranker/2", {"w": np.full(3, 5.0)})
        assert reg.scan_once() == ["ranker"]
        assert reg.version("ranker") == 2
        np.testing.assert_allclose(reg.get("ranker")["w"], 5.0)
        # no change → no reload
        assert reg.scan_once() == []

    def test_missing_model_raises(self, tmp_path):
        reg = ModelRegistry(str(tmp_path))
        with pytest.raises(KeyError):
            reg.get("nope")

    def test_ignores_non_numeric_dirs(self, tmp_path):
        root = str(tmp_path)
        (tmp_path / "m" / "staging").mkdir(parents=True)
        save_params_npz(f"{root}/m/3", {"w": np.zeros(1)})
        reg = ModelRegistry(root)
        reg.scan_once()
        assert reg.version("m") == 3


class TestInferenceServer:
    def _post(self, port, model, instances):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/models/{model}:predict",
            data=json.dumps({"instances": instances}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read())

    def test_end_to_end_predict_and_hot_swap(self, tmp_path):
        root = str(tmp_path)
        save_params_npz(f"{root}/lr/1", {"w": np.array([1.0, 2.0])})
        reg = ModelRegistry(root, poll_interval_s=0.1)
        reg.scan_once()

        def build(params):
            w = params["w"]
            return lambda x: x @ w

        srv = InferenceServer(
            reg, build, batcher_config=BatcherConfig(max_delay_ms=1.0)
        )
        srv.start()
        try:
            out = self._post(srv.port, "lr", [[1.0, 1.0], [2.0, 0.0]])
            assert out["predictions"] == [3.0, 2.0]

            # hot-swap to v2 (w doubled) → served after next scan
            save_params_npz(f"{root}/lr/2", {"w": np.array([2.0, 4.0])})
            deadline = time.time() + 5
            while time.time() < deadline:
                out = self._post(srv.port, "lr", [[1.0, 1.0]])
                if out["predictions"] == [6.0]:
                    break
                time.sleep(0.1)
            assert out["predictions"] == [6.0]

            # models listing + metrics endpoints
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/v1/models", timeout=5
            ) as r:
                models = json.loads(r.read())
            assert models["lr"]["version"] == 2
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics", timeout=5
            ) as r:
                text = r.read().decode()
            assert "requests:lr_total" in text
        finally:
            srv.close()

    def test_unknown_model_404(self, tmp_path):
        reg = ModelRegistry(str(tmp_path))
        srv = InferenceServer(reg, lambda h: (lambda x: x))
        srv.start()
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                self._post(srv.port, "ghost", [[1.0]])
            assert ei.value.code == 404
        finally:
            srv.close()


class TestTimelineProductEndpoint:
    """POST /v1/timelines/<product> → product pipeline → URT wire response
    (the home-mixer Thrift endpoint as the HTTP edge)."""

    def test_timeline_endpoint_serves_urt(self, tmp_path):
        import urllib.request

        from the_algorithm_tpu.mixers.home_products import (
            HomeProductPipelineRegistry,
        )
        from the_algorithm_tpu.pipeline.component import (
            Candidate, CandidatePipeline, CandidateSource,
        )
        from the_algorithm_tpu.pipeline.mixer import (
            MixerCandidatePipeline, MixerPipeline, SortByRecency,
        )

        class Src(CandidateSource):
            def get(self, query, params):
                return [Candidate(id=100 + i, features={"author_id": i})
                        for i in range(3)]

        products = HomeProductPipelineRegistry()
        products.register("following", MixerPipeline(
            candidate_pipelines=[MixerCandidatePipeline(
                pipeline=CandidatePipeline(source=Src()))],
            entry_selectors=[SortByRecency()],
        ))

        class Query:
            def __init__(self, payload):
                self.user_id = payload.get("user_id", 0)
                self.max_results = payload.get("max_results", 10)
                self.features = {}

        reg = ModelRegistry(str(tmp_path))
        srv = InferenceServer(
            reg, lambda h: (lambda x: x),
            products=products,
            query_builder=lambda product, payload: Query(payload),
        )
        srv.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/timelines/following",
                data=json.dumps({"user_id": 7, "max_results": 5}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as r:
                body = json.loads(r.read())
            entries = body["timeline"]["instructions"][0]["addEntries"][
                "entries"]
            tweet_ids = [e["content"]["item"]["id"] for e in entries
                         if e["content"]["kind"] == "item"]
            assert tweet_ids == [102, 101, 100]  # recency order
            kinds = {e["content"]["kind"] for e in entries}
            assert "cursor" in kinds
            # unknown product → 404
            req2 = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/timelines/ghost",
                data=b"{}", headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req2, timeout=5)
            assert ei.value.code == 404
        finally:
            srv.close()


class TestBatchedTimelineFront:
    """r4: the batched product engine behind the HTTP timeline edge —
    concurrent requests coalesce into ONE serve batch and each gets its
    own URT timeline."""

    def test_http_requests_coalesce_through_batched_engine(self, tmp_path):
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np

        from the_algorithm_tpu.mixers import batched_foryou as bf
        from the_algorithm_tpu.mixers.home_products import (
            HomeProductPipelineRegistry,
        )
        from the_algorithm_tpu.serving.batcher import BatcherConfig
        from the_algorithm_tpu.serving.product_front import (
            BatchedTimelineFront,
        )

        batch_sizes = []

        class Engine:
            """serve_batch-shaped stub recording coalesced batch sizes."""

            def serve_batch(self, queries, params=None):
                batch_sizes.append(len(queries))
                out = []
                for q in queries:
                    u = int(q.user_id)
                    out.append([
                        bf.Candidate(id=1000 * u + i, score=1.0 - 0.1 * i,
                                     features={"author_id": i})
                        for i in range(3)
                    ])
                return out

        front = BatchedTimelineFront(
            Engine(), BatcherConfig(max_batch_size=8, max_delay_ms=60.0))
        products = HomeProductPipelineRegistry()
        products.register("for_you", front)

        class Query:
            def __init__(self, payload):
                self.user_id = payload.get("user_id", 0)
                self.features = {}

        reg = ModelRegistry(str(tmp_path))
        srv = InferenceServer(
            reg, lambda h: (lambda x: x),
            products=products,
            query_builder=lambda product, payload: Query(payload),
        )
        srv.start()
        try:
            def call(u):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/v1/timelines/for_you",
                    data=json.dumps({"user_id": u}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=20) as r:
                    return json.loads(r.read())

            with ThreadPoolExecutor(max_workers=6) as ex:
                bodies = list(ex.map(call, range(6)))
            for u, body in enumerate(bodies):
                entries = body["timeline"]["instructions"][0][
                    "addEntries"]["entries"]
                ids = [e["content"]["item"]["id"] for e in entries
                       if e["content"]["kind"] == "item"]
                assert ids[0] == 1000 * u  # each caller got ITS timeline
            assert max(batch_sizes) > 1  # coalescing actually happened
        finally:
            srv.close()
            front.close()
