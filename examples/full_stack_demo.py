"""Full-stack demo: offline jobs → indexes → models → For You serving.

Runs the whole framework at toy scale on whatever backend is available
(CPU works; set JAX_PLATFORMS=cpu to force). Walks the same path prod
would: community detection → consumer/producer embeddings → realtime
indexes → ranking models → the For You pipeline.

    PYTHONPATH=. python examples/full_stack_demo.py
"""

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from the_algorithm_tpu.data import synthetic
    from the_algorithm_tpu.graph import uteg as uteg_mod
    from the_algorithm_tpu.mixers import home_mixer, similarity_engines as se, tweet_mixer
    from the_algorithm_tpu.models import masknet
    from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
    from the_algorithm_tpu.search import earlybird as eb
    from the_algorithm_tpu.simclusters import (
        ann,
        interested_in as ii,
        known_for as kf,
        sims_graph,
        tweet_embeddings as te,
    )
    from the_algorithm_tpu.pipeline.component import CandidatePipeline

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    # 1. planted-community engagement world
    cfg = synthetic.CommunityGraphConfig(
        num_users=512, num_producers=128, num_communities=8, follows_per_user=24
    )
    world = synthetic.community_graph(cfg)
    print(f"world: {cfg.num_users} users, {cfg.num_producers} producers, "
          f"{cfg.num_communities} planted communities")

    # 2. offline chain: sims graph → KnownFor → InterestedIn
    follow = sims_graph.follow_matrix_from_adjacency(
        jnp.asarray(world.producer_ids), cfg.num_producers
    )
    graph = sims_graph.symmetrize(
        sims_graph.cosine_similarity_graph(follow, top_k=16)
    )
    params = kf.KnownForParams(num_clusters=32)
    known = kf.iterate(
        graph, kf.initialize_random(jax.random.PRNGKey(0), cfg.num_producers, 32),
        params, num_iterations=6,
    )
    n_assigned = int(jnp.sum(known.cluster >= 0))
    print(f"KnownFor: {n_assigned}/{cfg.num_producers} producers assigned")

    interests = ii.interested_in_from_known_for(
        ii.FollowFavGraph(
            jnp.asarray(world.producer_ids), jnp.asarray(world.followed),
            jnp.asarray(world.fav_score), jnp.asarray(world.log_fav_score),
        ),
        known,
        ii.InterestedInParams(num_clusters=32, max_clusters_per_user=10),
    )
    user_embs = interests.embedding("fav")
    print(f"InterestedIn: {float(jnp.mean(jnp.sum(user_embs.ids != PAD_ID, 1))):.1f} "
          "clusters/user avg")

    # 3. realtime: fav stream → tweet embeddings → SANN index
    log = synthetic.engagement_log(
        world.user_community,
        synthetic.EngagementLogConfig(num_users=cfg.num_users, num_tweets=1024),
    )
    te_cfg = te.TweetEmbeddingConfig(
        clusters_per_tweet=16, tweets_per_cluster=64, half_life_s=8 * 3600,
        min_favorite_count=1, max_tweet_age_s=10**9,
        clusters_per_user_contribution=8,
    )
    state = te.init_state(
        1024, 16, jnp.zeros(1024, jnp.int32), jnp.full((1024,), 10**6, jnp.int32)
    )
    B = 4096
    state = te.apply_fav_events(
        state, user_embs,
        jnp.asarray(log["user_ids"][:B]), jnp.asarray(log["tweet_ids"][:B]),
        jnp.asarray(log["timestamps"][:B]), te_cfg,
    )
    index = te.build_cluster_index(state, 32, te_cfg, jnp.int32(10**6))
    print(f"SANN index: {int(jnp.sum(index.tweet_ids != PAD_ID))} entries")

    # 4. serving: For You via SANN + UTEG + earlybird
    ebi = eb.init_index(eb.EarlybirdConfig(capacity=2048, max_tokens=4))
    toks = jnp.asarray(np.stack([eb.tokenize("hello tpu world", 4)] * 1024))
    ebi = eb.ingest(
        ebi, toks,
        jnp.asarray((np.arange(1024) % cfg.num_producers).astype(np.int32)),
        jnp.full((1024,), 500, jnp.int32),
        jnp.zeros((1024, len(eb.DOC_FEATURES)), jnp.float32),
        jnp.asarray(np.arange(1024, dtype=np.int32)),
    )
    ug = uteg_mod.init_graph(cfg.num_users, width=16)
    ug = uteg_mod.record_engagements(
        ug, log["user_ids"][:500], log["tweet_ids"][:500],
        np.full(500, int(uteg_mod.EngagementType.FAVORITE)),
        log["timestamps"][:500],
    )

    user = 7
    user_emb = SparseEmbedding(user_embs.ids[user], user_embs.scores[user])
    engines = [
        se.SimClustersANNEngine(
            index,
            ann.SimClustersANNConfig(
                max_scan_clusters=8, max_top_tweets_per_cluster=64,
                max_num_results=50,
            ),
            lambda q: user_emb,
        )
    ]
    mcfg = masknet.MaskNetConfig(
        num_features=len(home_mixer.DEFAULT_FEATURE_SCHEMA),
        num_heads=len(masknet.DEFAULT_HEAD_NAMES),
        mask_blocks=2, block_dim=32, aggregation_dim=16, head_hidden=(32,),
        dtype="float32",
    )
    model = masknet.MaskNet(mcfg)
    mparams = model.init(jax.random.PRNGKey(1), jnp.zeros((1, mcfg.num_features)))
    predict = jax.jit(lambda x: jax.nn.sigmoid(model.apply(mparams, x)))

    pipeline = home_mixer.build_for_you_pipeline(
        candidate_pipelines=[
            CandidatePipeline(tweet_mixer.TweetMixerSource(
                tweet_mixer.TweetMixer(engines)
            )),
            CandidatePipeline(se.UTEGEngine(
                ug, lambda q: (list(range(8)), [1.0] * 8), max_results=50,
            )),
        ],
        hydrators=[],
        predict_fn=lambda x: np.asarray(predict(jnp.asarray(x))),
    )
    out = pipeline.run(
        home_mixer.ForYouQuery(user_id=user, max_results=10, now=10**6)
    )
    print(f"For You: {len(out.candidates)} candidates; "
          f"top: {[(c.id, round(c.score, 4), c.source) for c in out.candidates[:5]]}")
    assert out.candidates, "pipeline returned nothing"

    # -- search depth: BM25 text relevance + archive tier --------------------
    from the_algorithm_tpu.search import persistence, root as sroot

    scfg = eb.EarlybirdConfig(capacity=16, max_tokens=8)
    sidx = eb.init_index(scfg)
    docs = [
        eb.RawTweet(tweet_id=100 + i, author_id=i % 4,
                    created_ts=1000 + i * 100, text=t)
        for i, t in enumerate([
            "tpu mesh sharding guide",
            "tpu notes and also mesh notes far apart",
            "tpu only content here",
            "unrelated gardening tips",
            "old tpu mesh archive doc",
        ])
    ]
    built = eb.build_documents(docs, scfg)
    sidx = eb.ingest(sidx, *built[:5])
    archive = eb.init_index(eb.EarlybirdConfig(capacity=32, max_tokens=8))
    sidx, archive, n_rolled = persistence.roll_expired(
        sidx, archive, now=1500, retention_s=450)  # ts<1050 rolls: doc 100
    sr = sroot.SuperRoot([
        sroot.Tier("realtime", sidx, min_ts=1050, max_ts=1 << 30),
        sroot.Tier("full_archive", archive, min_ts=0, max_ts=1049),
    ])
    q = eb.SearchQuery(
        tokens=jnp.asarray(eb.tokenize("tpu mesh", 8)), require_all=False,
        min_ts=jnp.int32(0), max_ts=jnp.int32(1 << 30))
    sids, sscores, per_tier = sr.search(q, max_results=5)
    print(f"Search: rolled {n_rolled} doc(s) to archive; 'tpu mesh' BM25 → "
          f"{[int(i) for i in sids]} across tiers "
          f"{[r.tier for r in per_tier]}")
    assert 100 in {int(i) for i in sids}  # archived doc found cross-tier

    # -- wide path: the full-width columnar hydration + scoring --------------
    from the_algorithm_tpu.mixers import feature_schema as fs
    from the_algorithm_tpu.mixers import wide_hydrators as wh

    world = wh.synthetic_world(seed=0, num_users=64, num_authors=64,
                               num_tweets=2048)
    wide = home_mixer.build_for_you_pipeline(
        candidate_pipelines=[
            CandidatePipeline(tweet_mixer.TweetMixerSource(
                tweet_mixer.TweetMixer(engines)
            )),
        ],
        hydrators=wh.build_wide_hydrators(**world),
        predict_fn=lambda x: np.asarray(predict_wide(jnp.asarray(x))),
        feature_schema=fs.WIDE_SCHEMA,
    )
    wcfg = masknet.MaskNetConfig(
        num_features=fs.total_width(fs.WIDE_SCHEMA),
        num_heads=len(masknet.DEFAULT_HEAD_NAMES),
        mask_blocks=2, block_dim=64, aggregation_dim=16, head_hidden=(32,),
        dtype="float32",
    )
    wmodel = masknet.MaskNet(wcfg)
    wparams = wmodel.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, wcfg.num_features)))
    predict_wide = jax.jit(
        lambda x: jax.nn.sigmoid(wmodel.apply(wparams, x)))
    wout = wide.run(home_mixer.ForYouQuery(
        user_id=user, followed_authors=[1, 2], max_results=10,
        now=10_000_000,
    ))
    print(f"Wide For You: {len(wout.candidates)} candidates scored over "
          f"{fs.total_width(fs.WIDE_SCHEMA)} columnar features")
    assert wout.candidates and not wout.failures

    # -- product surface: For You full mixer + chron products ----------------
    from the_algorithm_tpu.mixers import home_products as hp
    from the_algorithm_tpu.mixers.follow_recommendations import (
        RecommendationFlow,
    )
    from the_algorithm_tpu.pipeline.component import Candidate
    from the_algorithm_tpu.pipeline.mixer import EntryKind

    wtf = RecommendationFlow(
        sources=[lambda req: [Candidate(id=5000 + i, score=1.0 - 0.1 * i)
                              for i in range(4)]],
        predicates=[],
    )
    fy = hp.build_for_you_mixer(
        scored_tweets_pipeline=pipeline, wtf_flow=wtf,
        ads=[Candidate(id=9001), Candidate(id=9002)],
    )
    tl = fy.run(home_mixer.ForYouQuery(user_id=user, max_results=15,
                                       now=10**6))
    kinds = [e.kind.value for e in tl.entries]
    print(f"For You mixer: {len(tl.entries)} entries "
          f"({kinds.count('tweet')} tweets, {kinds.count('module')} modules, "
          f"{kinds.count('ad')} ads)")
    assert EntryKind.MODULE.value in kinds and EntryKind.AD.value in kinds

    registry = hp.HomeProductPipelineRegistry()
    registry.register("for_you", fy)
    registry.register("following", hp.build_following_pipeline(
        index=ebi, wtf_flow=wtf))
    registry.register("subscribed", hp.build_subscribed_pipeline(index=ebi))
    registry.register("list_tweets", hp.build_list_tweets_pipeline(
        index=ebi, list_members={1: list(range(4))}))
    fq = hp.TimelineQuery(user_id=3, followed_authors=list(range(8)),
                          max_results=10, now=10**6)
    ftl = registry.get("following").run(fq)
    ltl = registry.get("list_tweets").run(
        hp.TimelineQuery(user_id=3, list_id=1, max_results=10, now=10**6))
    print(f"products: {registry.products()}; Following={len(ftl.entries)} "
          f"entries (cursors {ftl.top_cursor}..{ftl.bottom_cursor}), "
          f"ListTweets={len(ltl.entries)} entries")
    assert ftl.entries and ltl.entries

    # URT decoration + marshalling: typed wire response for the For You
    # mixer output; the chron products reuse the same marshaller
    from the_algorithm_tpu.pipeline import urt

    resp = urt.marshal_timeline(tl)
    f_resp = urt.marshal_timeline(ftl)
    n_items = len(resp.entries())
    assert n_items and f_resp.entries()
    kinds = {e["content"]["kind"] for e in resp.entries()}
    print(f"URT: For You response {n_items} entries (kinds={sorted(kinds)}, "
          f"{len(resp.to_json())} wire bytes); Following reuses marshaller "
          f"({len(f_resp.entries())} entries)")
    print("FULL STACK OK")


if __name__ == "__main__":
    main()
