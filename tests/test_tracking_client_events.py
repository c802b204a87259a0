"""Experiment tracker (twml/tracking analog) + client-event scribe loop."""

import json

import numpy as np

from the_algorithm_tpu.actions import uua
from the_algorithm_tpu.mixers.feature_hydrators import ScribeClientEventSideEffect
from the_algorithm_tpu.pipeline.component import Candidate
from the_algorithm_tpu.training import tracking as tk


class TestTracker:
    def test_run_record_and_metrics(self, tmp_path):
        t = [100.0]
        tr = tk.ExperimentTracker(str(tmp_path), "run_a",
                                  hparams={"lr": 0.1}, clock=lambda: t[0])
        tr.log_metrics(10, {"auc": 0.7})
        t[0] = 200.0
        tr.log_metrics(20, {"auc": 0.75, "loss": 0.3})
        tr.record_export("/models/ranker/3", 3)
        tr.finish("done", final_metrics={"auc": 0.76})

        run = tk.load_run(str(tmp_path), "run_a")
        assert run["status"] == "done"
        assert run["hparams"] == {"lr": 0.1}
        assert run["exports"][0]["version"] == 3
        ms = tr.metrics()
        assert [m["step"] for m in ms] == [10, 20]
        assert ms[1]["loss"] == 0.3

    def test_torn_tail_line_dropped(self, tmp_path):
        tr = tk.ExperimentTracker(str(tmp_path), "run_b")
        tr.log_metrics(1, {"x": 1.0})
        with open(tr._metrics_path, "a") as f:
            f.write('{"step": 2, "x":')  # crash mid-write
        assert [m["step"] for m in tr.metrics()] == [1]

    def test_compare_runs(self, tmp_path):
        for name, aucs in (("a", [0.6, 0.72]), ("b", [0.69]), ("c", [])):
            tr = tk.ExperimentTracker(str(tmp_path), name)
            for i, v in enumerate(aucs):
                tr.log_metrics(i, {"auc": v})
            tr.finish()
        rows = tk.compare_runs(str(tmp_path), "auc", mode="max")
        assert [r[0] for r in rows] == ["a", "b"]
        assert rows[0][1] == 0.72


class TestClientEventLoop:
    def test_scribe_lines_feed_uua_adapter(self):
        """Served impressions scribed by the side effect parse through the
        UUA ClientEventAdapter — the full training-data loop."""
        sink = []
        eff = ScribeClientEventSideEffect(sink.append)

        class Q:
            user_id = 3
            now = 1000

        eff.run(Q(), [Candidate(id=55, features={"author_id": 9})], None)
        event = json.loads(sink[0])
        # impressions map through the adapter
        actions = uua.client_event_adapter(event)
        assert len(actions) == 1
        a = actions[0]
        assert a.action_type == uua.ActionType.CLIENT_TWEET_IMPRESSION
        assert a.user_id == 3 and a.item_id == 55
        assert a.timestamp_ms == 1000_000
        assert a.metadata["position"] == 0
