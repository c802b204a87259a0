"""Warm-start checkpoint-surgery tests."""

import numpy as np

from the_algorithm_tpu.training.warm_start import warm_start


def tree(shapes, fill):
    return {
        k: np.full(s, fill, np.float32) if not isinstance(s, dict)
        else tree(s, fill)
        for k, s in shapes.items()
    }


class TestWarmStart:
    def test_exact_copy(self):
        old = {"dense": {"w": np.ones((4, 3)), "b": np.zeros(3)}}
        new = {"dense": {"w": np.full((4, 3), 9.0), "b": np.full(3, 9.0)}}
        out, report = warm_start(new, old)
        np.testing.assert_array_equal(out["dense"]["w"], old["dense"]["w"])
        assert report["dense/w"] == "copied"

    def test_feature_growth_slices(self):
        old = {"emb": np.arange(12.0).reshape(4, 3)}
        new = {"emb": np.full((6, 3), -1.0)}
        out, report = warm_start(new, old)
        np.testing.assert_array_equal(out["emb"][:4], old["emb"])
        assert (out["emb"][4:] == -1.0).all()  # new rows keep fresh init
        assert report["emb"] == "sliced"

    def test_shrink_slices(self):
        old = {"emb": np.arange(12.0).reshape(4, 3)}
        new = {"emb": np.zeros((2, 3))}
        out, _ = warm_start(new, old)
        np.testing.assert_array_equal(out["emb"], old["emb"][:2])

    def test_rename(self):
        old = {"old_layer": {"w": np.ones((2, 2))}}
        new = {"new_layer": {"w": np.zeros((2, 2))}}
        out, report = warm_start(
            new, old, rename={"old_layer/w": "new_layer/w"}
        )
        np.testing.assert_array_equal(out["new_layer"]["w"], np.ones((2, 2)))
        assert report["new_layer/w"] == "copied"

    def test_skip_keeps_fresh(self):
        old = {"head": np.ones((3,))}
        new = {"head": np.full((3,), 7.0)}
        out, report = warm_start(new, old, skip=("head",))
        assert (out["head"] == 7.0).all()
        assert report["head"] == "fresh"

    def test_head_remap(self):
        # old heads [a, b, c]; new heads [c, a, NEW]
        old = {"heads": {"w": np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])}}
        new = {"heads": {"w": np.full((2, 3), -1.0)}}
        out, report = warm_start(
            new, old, head_map=("heads", [2, 0, -1])
        )
        np.testing.assert_array_equal(
            out["heads"]["w"], [[3.0, 1.0, -1.0], [6.0, 4.0, -1.0]]
        )
        assert report["heads/w"] == "head_mapped"

    def test_missing_in_old_is_fresh(self):
        old = {"a": np.ones(2)}
        new = {"a": np.zeros(2), "b": np.full(2, 5.0)}
        out, report = warm_start(new, old)
        assert (out["b"] == 5.0).all() and report["b"] == "fresh"

    def test_trains_after_surgery(self):
        """Stitched tree is a valid param tree for a jitted step."""
        import jax
        import jax.numpy as jnp

        old = {"w": np.ones((4, 1), np.float32), "b": np.zeros(1, np.float32)}
        new = {"w": np.zeros((6, 1), np.float32), "b": np.zeros(1, np.float32)}
        stitched, _ = warm_start(new, old)

        def loss(p, x):
            return jnp.sum((x @ p["w"] + p["b"]) ** 2)

        g = jax.jit(jax.grad(loss))(
            jax.tree_util.tree_map(jnp.asarray, stitched),
            jnp.ones((2, 6)),
        )
        assert np.isfinite(np.asarray(g["w"])).all()
