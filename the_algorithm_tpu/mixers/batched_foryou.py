"""Batched For You serving: R concurrent requests share each device program.

≡ the reference's fleet behavior: >6,000 RPS ride the SimClusters-ANN path
because navi coalesces concurrent predict calls into one accelerator batch
(``navi/navi/src/batch.rs:116-200``) and every JVM store multigets. The r3
serve path ran one request at a time — three device programs + a multi-MB
feature upload per request. This engine phase-batches the whole product:

  Phase A (device): batched retrieval — SANN rows, earlybird in-network
           scan, UTEG traversal, each ONE program for all R requests.
  Phase B (host):   columnar merge → dedup → filters (numpy; no
           per-candidate Python objects).
  Phase C (device): fused wide hydration + MaskNet for all R requests via
           :class:`~the_algorithm_tpu.mixers.device_hydration
           .DeviceHydrationScorer` — one program.
  Phase D (host):   weighted heads → author-diversity rescore → top-K,
           vectorized.

The step order and semantics mirror ``RecommendationPipeline.run``
(``RecommendationPipelineConfig.scala:57-201``): dedup is first-wins in
pipeline order, global filters run between hydration and scoring, author
diversity decays repeat authors multiplicatively.
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.mixers import device_hydration as dh
from the_algorithm_tpu.mixers import feature_schema as fs
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.pipeline.component import Candidate


class CandidateColumns:
    """Columnar per-request candidate set (the object-model bypass).

    ``cols`` maps feature name → [B] numpy array; ``ids`` is the id column.
    """

    __slots__ = ("ids", "scores", "cols")

    def __init__(self, ids: np.ndarray, scores: np.ndarray,
                 cols: Optional[Dict[str, np.ndarray]] = None):
        self.ids = np.asarray(ids, np.int64)
        self.scores = np.asarray(scores, np.float32)
        self.cols = cols or {}

    def __len__(self) -> int:
        return int(self.ids.shape[0])

    @staticmethod
    def concat(parts: Sequence["CandidateColumns"]) -> "CandidateColumns":
        parts = [p for p in parts if len(p)]
        if not parts:
            return CandidateColumns(np.empty(0, np.int64),
                                    np.empty(0, np.float32))
        names = set()
        for p in parts:
            names.update(p.cols)
        cols = {}
        for n in names:
            # Missing-column default MUST match HostRequestBuilder.build's
            # 0.0 for numeric flag/count context features (is_in_network,
            # social_proof, …): a -1 fill there is out-of-distribution
            # serving/training skew. Only id-like columns keep the -1
            # "absent" sentinel.
            fill = -1 if (n.endswith("_id") or n == "id") else 0.0
            cols[n] = np.concatenate([
                np.asarray(p.cols[n]) if n in p.cols
                else np.full(len(p), fill)
                for p in parts
            ])
        return CandidateColumns(
            np.concatenate([p.ids for p in parts]),
            np.concatenate([p.scores for p in parts]),
            cols,
        )

    def take(self, idx: np.ndarray) -> "CandidateColumns":
        return CandidateColumns(
            self.ids[idx], self.scores[idx],
            {n: np.asarray(v)[idx] for n, v in self.cols.items()},
        )


def dedup_first_wins(c: CandidateColumns) -> CandidateColumns:
    """Keep the first occurrence of each id (pipeline-order precedence —
    the PickFirstCandidateMerger / DedupSelector semantics)."""
    _, first = np.unique(c.ids, return_index=True)
    return c.take(np.sort(first))


class BatchCandidateSource:
    """Retrieves for R queries in one call → one CandidateColumns each.

    Sources with a device program split into ``dispatch`` (async enqueue)
    and ``collect`` (host fetch) so the engine can enqueue ALL legs before
    fetching any — each fetch's round trip then overlaps the other legs'
    device execution.
    """

    name = "BatchCandidateSource"

    def get_batch(self, queries: Sequence, params) -> List[CandidateColumns]:
        return self.collect(self.dispatch(queries, params))

    def dispatch(self, queries: Sequence, params):
        return queries

    def collect(self, handle) -> List[CandidateColumns]:
        raise NotImplementedError


@dataclasses.dataclass
class ColumnsLift:
    """Vectorized candidate metadata attachment — the tweetypie-hydration
    role of the bench's per-candidate ``lift`` closure, as columns."""

    num_authors: int
    now: int

    def __call__(self, c: CandidateColumns) -> CandidateColumns:
        ids = c.ids
        c.cols.setdefault("author_id", ids % self.num_authors)
        c.cols.setdefault("created_ts", self.now - (ids % (40 * 3600)))
        c.cols.setdefault("topic_id", ids % 16)
        c.cols.setdefault("language_id", ids % 8)
        c.cols.setdefault("media_type", ids % 4)
        c.cols.setdefault("conversation_id", ids // 2)
        c.cols.setdefault("retrieval_score", c.scores)
        return c


class BatchedForYouEngine:
    """The For You product, phase-batched over R requests."""

    def __init__(
        self,
        *,
        batch_sources: Sequence[BatchCandidateSource],
        scorer: dh.DeviceHydrationScorer,
        head_names: Sequence[str],
        lift: Optional[Callable[[CandidateColumns], CandidateColumns]] = None,
        max_age_s: int = 48 * 3600,
        diversity_decay: float = 0.5,
        diversity_floor: float = 0.25,
        source_names: Optional[Sequence[str]] = None,
        stats=None,
    ):
        self.batch_sources = list(batch_sources)
        self.scorer = scorer
        self.head_names = list(head_names)
        self.lift = lift
        self.max_age_s = max_age_s
        self.diversity_decay = diversity_decay
        self.diversity_floor = diversity_floor
        names = (tuple(source_names) if source_names is not None
                 else tuple(fs.candidate_source_names()))
        self.source_index = {n: i for i, n in enumerate(names)}
        self.source_hash = {
            n: zlib.crc32(str(n).encode()) % 1024 for n in names}
        self.stats = stats

    # -- phases ---------------------------------------------------------------

    def _retrieve(self, queries, params) -> List[CandidateColumns]:
        per_query: List[List[CandidateColumns]] = [[] for _ in queries]
        # enqueue every leg's device program before fetching any result:
        # fetch round trips overlap the later legs' device execution.
        # Sources implement either dispatch+collect (async device legs) or
        # just get_batch (host-only / simple legs).
        handles = []
        for src in self.batch_sources:
            if type(src).dispatch is not BatchCandidateSource.dispatch:
                handles.append(("dc", src.dispatch(queries, params)))
            else:
                handles.append(("gb", None))
        for src, (mode, handle) in zip(self.batch_sources, handles):
            got = (src.collect(handle) if mode == "dc"
                   else src.get_batch(queries, params))
            sidx = self.source_index.get(src.name, -1)
            shash = self.source_hash.get(
                src.name, zlib.crc32(str(src.name).encode()) % 1024)
            for qi, c in enumerate(got):
                c.cols["source_idx"] = np.full(len(c), sidx, np.int32)
                c.cols["source_hash"] = np.full(len(c), shash, np.int64)
                if src.name in ("EarlybirdInNetwork", "FollowingEarlybird"):
                    c.cols["is_in_network"] = np.ones(len(c), np.float32)
                per_query[qi].append(c)
        return [
            dedup_first_wins(CandidateColumns.concat(parts))
            for parts in per_query
        ]

    def _filter(self, query, c: CandidateColumns) -> CandidateColumns:
        keep = np.ones(len(c), bool)
        seen = getattr(query, "seen_tweet_ids", None)
        if seen:
            keep &= ~np.isin(c.ids, np.fromiter(seen, np.int64,
                                                count=len(seen)))
        ts = c.cols.get("created_ts")
        if ts is not None:
            keep &= (int(getattr(query, "now", 0)) - ts) <= self.max_age_s
        return c.take(np.nonzero(keep)[0])

    def _rescore_select(
        self, query, c: CandidateColumns, combined: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(order, final_scores): author-diversity decay + sort + truncate."""
        order = np.argsort(-combined, kind="stable")
        authors = np.asarray(
            c.cols.get("author_id", np.full(len(c), -1)), np.int64)[order]
        # occurrence index of each author within the ranked list
        sort_by_author = np.argsort(authors, kind="stable")
        sorted_a = authors[sort_by_author]
        new_grp = np.concatenate([[True], sorted_a[1:] != sorted_a[:-1]])
        grp_start = np.maximum.accumulate(
            np.where(new_grp, np.arange(len(sorted_a)), 0))
        occ_sorted = np.arange(len(sorted_a)) - grp_start
        occ = np.empty(len(sorted_a), np.int64)
        occ[sort_by_author] = occ_sorted
        factor = np.maximum(self.diversity_decay ** occ,
                            self.diversity_floor)
        factor = np.where(authors >= 0, factor, 1.0)
        rescored = combined[order] * factor
        final = np.argsort(-rescored, kind="stable")
        k = int(getattr(query, "max_results", 50))
        return order[final[:k]], rescored[final[:k]]

    # -- the batched serve ----------------------------------------------------

    def serve_batch(self, queries: Sequence, params=None) -> List[List[Candidate]]:
        """R queries → R ranked candidate lists (one device program per
        phase). Returns object-model Candidates only for the final top-K.

        The batch pads to the next power of two (duplicating the last
        query) so every device program compiles at a handful of stable
        shapes — a serving front's ragged batch sizes would otherwise each
        trigger a fresh XLA compile (navi pads the same way)."""
        n = len(queries)
        padded_n = max(1, 1 << (n - 1).bit_length())
        if padded_n > n:
            queries = list(queries) + [queries[-1]] * (padded_n - n)
        out = self._serve_batch(queries, params)
        return out[:n]

    def _serve_batch(self, queries: Sequence, params=None):
        merged = self._retrieve(queries, params)
        if self.lift is not None:
            merged = [self.lift(c) for c in merged]
        merged = [self._filter(q, c) for q, c in zip(queries, merged)]

        score_batch = []
        for q, c in zip(queries, merged):
            cols = dict(c.cols)
            cols["ids"] = c.ids
            score_batch.append((q, cols, len(c)))
        if getattr(self.scorer, "select_top_k", None) is not None:
            # device-side selection: diversity rescore + top-K ran in the
            # fused program; only K rows per request come back
            selected = self.scorer.select_columnar(score_batch)
            out_sel: List[List[Candidate]] = []
            for q, c, (ids, scores, probs) in zip(queries, merged,
                                                  selected):
                k = int(getattr(q, "max_results", self.scorer.select_top_k))
                ids_k = np.asarray(ids[:k], np.int64)
                scores_k = np.asarray(scores[:k], np.float64).tolist()
                probs_k = np.asarray(probs[:k], np.float64)
                # vectorized id→row match (no per-candidate dict): sort
                # the merged ids once, searchsorted the K selected ids
                order = np.argsort(c.ids, kind="stable")
                sids = c.ids[order]
                if len(sids):
                    pos = np.searchsorted(sids, ids_k)
                    pos_c = np.minimum(pos, len(sids) - 1)
                    jrow = np.where(sids[pos_c] == ids_k,
                                    order[pos_c], -1)
                else:
                    jrow = np.full(len(ids_k), -1)
                safe = np.maximum(jrow, 0)
                col_vals = {
                    n: np.asarray(v)[safe].tolist()
                    for n, v in c.cols.items()
                    if n not in ("source_idx", "source_hash")}
                head_vals = {
                    f"predicted_{h}": probs_k[:, hi].tolist()
                    for hi, h in enumerate(self.head_names)}
                cands = []
                for r, (i, s) in enumerate(zip(ids_k.tolist(), scores_k)):
                    feats = ({n: vals[r] for n, vals in col_vals.items()}
                             if jrow[r] >= 0 else {})
                    for hn, vals in head_vals.items():
                        feats[hn] = vals[r]
                    cands.append(Candidate(id=i, score=s, features=feats))
                out_sel.append(cands)
            return out_sel
        results = self.scorer.score_columnar(score_batch)

        out: List[List[Candidate]] = []
        for q, c, (probs, combined) in zip(queries, merged, results):
            B = min(len(c), probs.shape[0])
            order, scores = self._rescore_select(
                q, c.take(np.arange(B)), combined[:B])
            cands = []
            for rank, (i, s) in enumerate(zip(order, scores)):
                feats = {n: v[i].item() for n, v in c.cols.items()
                         if n not in ("source_idx", "source_hash")}
                for j, h in enumerate(self.head_names):
                    feats[f"predicted_{h}"] = float(probs[i, j])
                cands.append(Candidate(
                    id=int(c.ids[i]), score=float(s), features=feats))
            out.append(cands)
        return out


# -- batched retrieval legs ----------------------------------------------------


class PrecomputedBatchSource(BatchCandidateSource):
    """SANN rows already retrieved by the batched prod-shape program (the
    bench measures that program separately and shares its output)."""

    def __init__(self, ids: np.ndarray, scores: np.ndarray,
                 name: str = "simclusters_interested_in"):
        self._ids = np.asarray(ids)
        self._scores = np.asarray(scores)
        self.name = name

    def collect(self, queries):
        out = []
        for q in queries:
            u = int(q.user_id) % self._ids.shape[0]
            ids = self._ids[u]
            ok = ids != int(PAD_ID)
            out.append(CandidateColumns(ids[ok], self._scores[u][ok]))
        return out


class EarlybirdBatchSource(BatchCandidateSource):
    """In-network earlybird scan for R users in ONE device program (vmapped
    over per-user follow sets — the root fan-out's request batching)."""

    name = "EarlybirdInNetwork"

    def __init__(self, index, now: int, max_results: int = 700,
                 follow_width: int = 64):
        from the_algorithm_tpu.search import earlybird as eb

        self._eb = eb
        self._index = index
        self._now = now
        self._k = max_results
        self._fw = follow_width

        # the in-network leg IS the from:follows operator query
        # (queryparser's FollowingEarlybirdQueryTransformer form); the
        # batch path resolves the follow set per request row
        op_kw = eb.parse_query("from:follows")
        assert op_kw.pop("from_follows") is True

        def batch_search(tok, au, ts, ft, ti, follows_b):
            idx = eb.EarlybirdIndex(tok, au, ts, ft, ti, jnp.int32(0))
            q = eb.SearchQuery(
                require_all=True,
                min_ts=jnp.int32(0), max_ts=jnp.int32(now),
                **op_kw,
            )
            # corpus scoring once + per-user mask/top-K (not vmapped scans)
            ids, scores = eb.search_in_network_batch(
                idx, q, follows_b, max_results=max_results)
            # pack (ids ‖ bitcast(scores)) into ONE fetchable array
            return jnp.stack(
                [ids, jax.lax.bitcast_convert_type(scores, jnp.int32)],
                axis=-1)

        self._jit = jax.jit(batch_search)

    def dispatch(self, queries, params):
        R = len(queries)
        follows = np.full((R, self._fw), int(PAD_ID), np.int64)
        for i, q in enumerate(queries):
            fl = sorted(int(a) for a in
                        getattr(q, "followed_authors", ()))[: self._fw]
            follows[i, :len(fl)] = fl
        idx = self._index
        return self._jit(
            idx.tokens, idx.author, idx.created_ts, idx.features,
            idx.tweet_ids, jnp.asarray(follows, jnp.int32))

    def collect(self, handle):
        packed = np.asarray(handle)
        ids = packed[..., 0]
        scores = packed[..., 1].view(np.float32)
        out = []
        for i in range(ids.shape[0]):
            ok = ids[i] != int(PAD_ID)
            out.append(CandidateColumns(ids[i][ok], scores[i][ok]))
        return out


class UtegBatchSource(BatchCandidateSource):
    """UTEG engagement traversal for R users in ONE device program."""

    name = "DirectUteg"

    def __init__(self, graph, seeds_fn: Callable[[int], np.ndarray],
                 max_results: int = 400, n_seeds: int = 8):
        from the_algorithm_tpu.graph import uteg as uteg_mod

        self._graph = graph
        self._seeds_fn = seeds_fn
        self._n_seeds = n_seeds

        def batch_rec(tid, tty, tts, seeds_b, weights_b):
            g = uteg_mod.EngagementGraph(tid, tty, tts)

            def one(seeds, weights):
                return uteg_mod.recommend(
                    g, seeds, weights, max_results=max_results,
                    min_social_proof=1)

            ids, scores, proof = jax.vmap(one)(seeds_b, weights_b)
            return jnp.stack(
                [ids, jax.lax.bitcast_convert_type(scores, jnp.int32),
                 proof.astype(jnp.int32)],
                axis=-1)

        self._jit = jax.jit(batch_rec)

    def dispatch(self, queries, params):
        R = len(queries)
        seeds = np.stack([
            np.asarray(self._seeds_fn(int(q.user_id)))[: self._n_seeds]
            for q in queries
        ]).astype(np.int32)
        weights = np.ones((R, self._n_seeds), np.float32)
        g = self._graph
        return self._jit(
            g.tweet_ids, g.engagement_type, g.timestamps,
            jnp.asarray(seeds), jnp.asarray(weights))

    def collect(self, handle):
        packed = np.asarray(handle)
        ids = packed[..., 0]
        scores = packed[..., 1].view(np.float32)
        proof = packed[..., 2]
        out = []
        for i in range(ids.shape[0]):
            ok = ids[i] != int(PAD_ID)
            c = CandidateColumns(ids[i][ok], scores[i][ok])
            c.cols["social_proof"] = proof[i][ok].astype(np.float32)
            out.append(c)
        return out


class ExactScanBatchSource(BatchCandidateSource):
    """Full-corpus exact cosine retrieval as a product source.

    ≡ nothing in the reference — this is the framework's beat-the-
    reference lever: with the tweet corpus resident in HBM, EXACT cosine
    top-K over every tweet (recall 1.0 by construction) is affordable for
    a slice of traffic (``retrieval.exact_cosine_scan``).
    """

    name = "simclusters_interested_in"  # serves the same SANN slot

    def __init__(self, corpus_ids, corpus_scores, embedding_fn,
                 num_clusters: int, max_results: int = 200,
                 row_to_id=None, block: int = 65536,
                 turbo: bool = False, recall_target: float = 0.99):
        from the_algorithm_tpu.ops import retrieval

        self._ids = corpus_ids
        self._scores = corpus_scores
        self._emb = embedding_fn  # user_id -> (cl [N], sc [N]) np arrays
        self._row_to_id = row_to_id
        # pin execution to the corpus's device: the serve loop runs under
        # default_device(cpu) for host-store math, and an uncommitted query
        # embedding there would drag the half-GB corpus to the HOST every
        # call (measured: 16 s/scan through the tunnel vs 0.2 s on-chip)
        try:
            self._device = next(iter(corpus_ids.devices()))
        except Exception:
            self._device = None
        import functools

        # ``turbo``: bf16 gather + approx per-block collectors — the
        # at-scale tier operating point (recall measured by the bench,
        # ~0.99 vs the exact scan; default stays EXACT)
        self._jit = jax.jit(functools.partial(
            retrieval.exact_cosine_scan, num_clusters=num_clusters,
            max_results=max_results, block=block,
            compute_dtype=(jnp.bfloat16 if turbo else jnp.float32),
            approx_block_topk=turbo, recall_target=recall_target))

    def dispatch(self, queries, params):
        from the_algorithm_tpu.ops import sparse as sp

        n = len(queries)
        cls, scs = zip(*(self._emb(int(q.user_id)) for q in queries))
        cls, scs = np.stack(cls), np.stack(scs)
        # pad the query batch to a power of two: the scan compiles per Q
        # shape, and a serving front's ragged tier counts would otherwise
        # each trigger a fresh multi-minute compile (the scan's cost is
        # ~Q-independent anyway — gather transactions dominate)
        padded = max(1, 1 << (n - 1).bit_length())
        if padded > n:
            cls = np.concatenate([cls, np.repeat(cls[:1], padded - n, 0)])
            scs = np.concatenate([scs, np.repeat(scs[:1], padded - n, 0)])
        src = sp.SparseEmbedding(
            jnp.asarray(cls, jnp.int32), jnp.asarray(scs, jnp.float32))
        if self._device is not None:
            src = jax.device_put(src, self._device)
        rows, scores = self._jit(self._ids, self._scores, src)
        packed = jnp.stack(
            [rows, jax.lax.bitcast_convert_type(scores, jnp.int32)], -1)
        return packed, n

    def collect(self, handle):
        packed, n = handle
        packed = np.asarray(packed)[:n]
        rows = packed[..., 0]
        scores = packed[..., 1].view(np.float32)
        out = []
        for i in range(rows.shape[0]):
            ids = rows[i]
            if self._row_to_id is not None:
                ids = self._row_to_id[ids]
            ok = scores[i] > -np.inf
            out.append(CandidateColumns(ids[ok], scores[i][ok]))
        return out


class TieredSannBatchSource(BatchCandidateSource):
    """Quality-tier routing for the SANN leg ≡ the configapi experiment
    bucketing pattern: requests whose user falls in the sticky decider
    bucket (``exact_retrieval_tier`` availability dial) retrieve via the
    EXACT full-corpus scan; the rest use the approximate cluster-index
    rows. Per-request override via the ``exact_retrieval_tier`` Param.
    """

    name = "simclusters_interested_in"
    FEATURE = "exact_retrieval_tier"

    def __init__(self, approx: BatchCandidateSource,
                 exact: ExactScanBatchSource, decider):
        self._approx = approx
        self._exact = exact
        self._decider = decider

    def _in_tier(self, q, params) -> bool:
        if params is not None:
            try:
                from the_algorithm_tpu.mixers.home_products import (
                    EXACT_RETRIEVAL_TIER)

                forced = params(EXACT_RETRIEVAL_TIER)
                if forced is not None:
                    return bool(forced)
            except Exception:
                pass
        return self._decider.is_available_for_id(
            self.FEATURE, int(q.user_id))

    def dispatch(self, queries, params):
        tiers = [self._in_tier(q, params) for q in queries]
        exact_q = [q for q, t in zip(queries, tiers) if t]
        approx_q = [q for q, t in zip(queries, tiers) if not t]
        h_exact = self._exact.dispatch(exact_q, params) if exact_q else None
        return (tiers, h_exact, approx_q)

    def collect(self, handle):
        tiers, h_exact, approx_q = handle
        exact_cols = (self._exact.collect(h_exact)
                      if h_exact is not None else [])
        approx_cols = (self._approx.get_batch(approx_q, None)
                       if approx_q else [])
        out, ei, ai = [], 0, 0
        for t in tiers:
            if t:
                c = exact_cols[ei]
                c.cols["exact_tier"] = np.ones(len(c), np.float32)
                out.append(c)
                ei += 1
            else:
                out.append(approx_cols[ai])
                ai += 1
        return out
