"""SuperRoot multi-tier routing: tier selection by time span, cross-tier
dedup-merge, early termination, pagination cursor (≡ earlybird_root/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.search import root as rt


def make_tier(name, ids_ts, span, text="hello world"):
    cfg = eb.EarlybirdConfig(capacity=16, max_tokens=8)
    tweets = [
        eb.RawTweet(tweet_id=i, author_id=1, created_ts=t, text=text,
                    fav_count=i % 7)
        for i, t in ids_ts
    ]
    index = eb.ingest(eb.init_index(cfg), *eb.build_documents(tweets, cfg)[:5])
    return rt.Tier(name, index, span[0], span[1])


REALTIME = make_tier("realtime", [(100, 900), (101, 950), (102, 990)],
                     (800, 1000))
ARCHIVE = make_tier("full_archive", [(50, 100), (51, 200), (52, 700)],
                    (0, 799))


def query(min_ts=0, max_ts=1000):
    return eb.SearchQuery(
        tokens=jnp.asarray(eb.tokenize("hello", 8)), require_all=False,
        min_ts=jnp.int32(min_ts), max_ts=jnp.int32(max_ts),
    )


class TestRouting:
    def test_recent_window_hits_only_realtime(self):
        root = rt.SuperRoot([REALTIME, ARCHIVE])
        assert [t.name for t in root.route(query(850, 1000))] == ["realtime"]

    def test_old_window_hits_only_archive(self):
        root = rt.SuperRoot([REALTIME, ARCHIVE])
        assert [t.name for t in root.route(query(0, 300))] == ["full_archive"]

    def test_wide_window_hits_both_newest_first(self):
        root = rt.SuperRoot([ARCHIVE, REALTIME])  # order shouldn't matter
        assert [t.name for t in root.route(query())] == [
            "realtime", "full_archive"
        ]


class TestMerge:
    def test_results_from_both_tiers(self):
        root = rt.SuperRoot([REALTIME, ARCHIVE])
        ids, scores, per = root.search(query(), max_results=10)
        assert set(ids) == {100, 101, 102, 50, 51, 52}
        assert [r.tier for r in per] == ["realtime", "full_archive"]
        assert list(scores) == sorted(scores, reverse=True)

    def test_dedup_keeps_best_copy(self):
        dup = make_tier("dup", [(100, 900)], (0, 799))
        root = rt.SuperRoot([REALTIME, dup],
                            rt.SuperRootConfig(min_full_results=100))
        ids, scores, _ = root.search(query(), max_results=10)
        assert list(ids).count(100) == 1

    def test_early_termination_skips_archive(self):
        root = rt.SuperRoot([REALTIME, ARCHIVE],
                            rt.SuperRootConfig(min_full_results=2))
        ids, _, per = root.search(query(), max_results=2)
        assert [r.tier for r in per] == ["realtime"]
        assert set(ids) <= {100, 101, 102}


class TestPagination:
    def test_cursor_walks_back_in_time(self):
        root = rt.SuperRoot([REALTIME, ARCHIVE])
        pages = list(root.paginate(query(), page_size=2, max_pages=10))
        assert len(pages) >= 2
        seen = [int(i) for ids, _ in pages for i in ids]
        assert len(seen) == len(set(seen))  # no tweet served twice
        # realtime tweets come before archive tweets across pages
        first_arch = min(
            (i for i, t in enumerate(seen) if t < 100), default=len(seen)
        )
        assert all(t >= 100 for t in seen[:first_arch])


class TestTieSafePagination:
    def test_equal_timestamps_not_skipped(self):
        """Regression: 3 tweets at the same created_ts with page_size=2
        must all be served across pages."""
        tier = make_tier("rt", [(70, 500), (71, 500), (72, 500)], (0, 1000))
        root = rt.SuperRoot([tier])
        pages = list(root.paginate(query(), page_size=2, max_pages=5))
        seen = [int(i) for ids, _ in pages for i in ids]
        assert sorted(seen) == [70, 71, 72]
        assert len(seen) == len(set(seen))


class TestEarlyTermUniqueCounting:
    def test_duplicate_slots_dont_stop_descent(self):
        # tweet 100 ingested twice in realtime; archive holds more matches
        dup = make_tier("realtime", [(100, 900), (100, 901)], (800, 1000))
        root = rt.SuperRoot(
            [dup, ARCHIVE], rt.SuperRootConfig(min_full_results=2))
        ids, _, per = root.search(query(), max_results=4)
        assert [r.tier for r in per] == ["realtime", "full_archive"]
        assert len(ids) >= 2
