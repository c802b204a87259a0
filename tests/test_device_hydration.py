"""Device-side wide hydration vs. the host columnar catalog — exact parity.

The device assembler (``mixers/device_hydration.py``) must produce the same
[B, total_width(WIDE_SCHEMA)] matrix as running every host hydrator
(``mixers/wide_hydrators.py``) and assembling via the per-request
ColumnarFeatureStore — column for column, in schema order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from the_algorithm_tpu.mixers import device_hydration as dh
from the_algorithm_tpu.mixers import feature_schema as fsch
from the_algorithm_tpu.mixers import home_mixer
from the_algorithm_tpu.mixers import wide_hydrators as wh
from the_algorithm_tpu.pipeline.component import Candidate

NOW = 10_000_000
A = 48


@pytest.fixture(scope="module")
def world_and_spec():
    world = wh.synthetic_world(
        seed=3, num_users=32, num_authors=A, num_tweets=1 << 12,
        engagement_width=8, now=NOW, include_device_spec=True,
    )
    spec = world.pop("device_spec")
    return world, spec


def make_candidates(n, sources=("simclusters_interested_in",
                                "EarlybirdInNetwork", "DirectUteg")):
    rng = np.random.default_rng(9)
    cands = []
    for i in range(n):
        tid = int(rng.integers(1, 1 << 20))
        cands.append(Candidate(
            id=tid, source=sources[i % len(sources)],
            features={
                "retrieval_score": float(rng.random()),
                "social_proof": float(i % 3),
                "author_id": tid % A,
                "created_ts": NOW - (tid % 86400),
                "topic_id": tid % 16,
                "language_id": tid % 8,
                "media_type": tid % 4,
                "conversation_id": tid // 2,
                "is_in_network": float(i % 2),
            }))
    return cands


def family_ranges():
    """(name, start, end) per schema family for failure attribution."""
    out = []
    col = 0
    cur_fam, cur_start = None, 0
    for s in fsch.WIDE_SCHEMA:
        fam = s.name.split("_")[0]
        if fam != cur_fam:
            if cur_fam is not None:
                out.append((cur_fam, cur_start, col))
            cur_fam, cur_start = fam, col
        col += s.width
    out.append((cur_fam, cur_start, col))
    return out


def test_device_assembly_matches_host(world_and_spec):
    world, spec = world_and_spec
    hydrators = wh.build_wide_hydrators(**world)
    tables, fns, resolvers = dh.build_from_world(world, spec)

    query = home_mixer.ForYouQuery(
        user_id=5, followed_authors=[int(a) for a in range(0, A, 5)],
        max_results=50, now=NOW,
    )
    cands = make_candidates(37)
    for h in hydrators:
        h.hydrate(query, cands, None)
    ids = np.asarray([c.id for c in cands], np.int64)
    store = fsch.peek_store(query)
    host = store.assemble(ids, fsch.WIDE_SCHEMA)

    scorer = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model=None, params=None, head_weights=None,
        pad_b=64,
    )
    dev = scorer.assemble_features(query, cands)
    assert dev.shape == host.shape == (37, fsch.total_width(fsch.WIDE_SCHEMA))

    bad = []
    for fam, s, e in family_ranges():
        if not np.allclose(dev[:, s:e], host[:, s:e], atol=2e-3, rtol=2e-3):
            delta = np.abs(dev[:, s:e] - host[:, s:e])
            j = int(np.argmax(delta.max(axis=0)))
            bad.append((fam, s + j, float(delta.max()),
                        float(dev[delta[:, j].argmax(), s + j]),
                        float(host[delta[:, j].argmax(), s + j])))
    assert not bad, f"family mismatches (fam, col, maxdelta, dev, host): {bad}"


def test_device_scoring_end_to_end(world_and_spec):
    """Full fused path: assemble + MaskNet + weighted score for a 3-request
    batch, vs. scoring the host-assembled matrix with the same model."""
    import jax

    from the_algorithm_tpu.models import masknet

    world, spec = world_and_spec
    hydrators = wh.build_wide_hydrators(**world)
    tables, fns, resolvers = dh.build_from_world(world, spec)

    F = fsch.total_width(fsch.WIDE_SCHEMA)
    cfg = masknet.MaskNetConfig(
        num_features=F, num_heads=4, mask_blocks=1, block_dim=32,
        aggregation_dim=16, head_hidden=(16,), dtype="float32",
    )
    model = masknet.MaskNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, F)))
    weights = jnp.asarray([1.0, 0.5, 0.25, 0.125])

    scorer = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params, weights,
        pad_b=128, compute_dtype=jnp.float32,
    )
    batch = []
    for u in (1, 5, 9):
        q = home_mixer.ForYouQuery(
            user_id=u, followed_authors=[int(a) for a in range(0, A, 5)],
            max_results=50, now=NOW)
        batch.append((q, make_candidates(20 + u)))
    results = scorer.score_requests(batch)
    assert len(results) == 3
    for (q, cands), (probs, combined) in zip(batch, results):
        assert probs.shape == (len(cands), 4)
        assert combined.shape == (len(cands),)
        assert np.all((probs > 0) & (probs < 1))
        # reference: host hydrate + assemble + same model
        for h in hydrators:
            h.hydrate(q, cands, None)
        ids = np.asarray([c.id for c in cands], np.int64)
        host_x = fsch.peek_store(q).assemble(ids, fsch.WIDE_SCHEMA)
        want = np.asarray(jax.nn.sigmoid(
            model.apply(params, jnp.asarray(host_x))))
        np.testing.assert_allclose(probs, want, atol=2e-3, rtol=2e-2)
