

class TestHydratorCatalogR5:
    """The named read-side hydrator pipeline (≡ TweetHydration.scala)."""

    def _store(self):
        import the_algorithm_tpu.storage.tweetypie as tp

        s = tp.TweetStore()
        s.create(tp.Tweet(
            tweet_id=1, author_id=10, text="hi @bob https://t.co/x #tpu",
            created_ts=100, language="ja", media=("img1", "video1"),
            place_id=77, source_client="android", conversation_id=1))
        s.create(tp.Tweet(
            tweet_id=2, author_id=10, text="self reply", created_ts=110,
            reply_to=1, conversation_id=1))
        s.create(tp.Tweet(
            tweet_id=3, author_id=11, text="other reply", created_ts=120,
            reply_to=1, conversation_id=1))
        return tp, s

    def test_catalog_breadth(self):
        import the_algorithm_tpu.storage.tweetypie as tp

        assert len(tp.HYDRATOR_CATALOG) >= 15
        # every catalog flag is inside ALL
        for name, flag, fn in tp.HYDRATOR_CATALOG:
            assert flag & tp.HydrationField.ALL

    def test_language_entities_card_media(self):
        tp, s = self._store()
        h = s.get_tweets([1], tp.HydrationField.LANGUAGE
                         | tp.HydrationField.ENTITIES
                         | tp.HydrationField.CARD
                         | tp.HydrationField.MEDIA_REFS)[0]
        assert h.extra["LanguageHydrator"]["language"] == "ja"
        ents = h.extra["MentionEntitiesHydrator"]
        assert ents["mentions"] == ["bob"] and ents["hashtags"] == ["tpu"]
        assert h.extra["CardHydrator"]["has_card"]
        refs = h.extra["MediaRefsHydrator"]
        assert refs["media_count"] == 2 and refs["has_video"]

    def test_self_thread_and_directed(self):
        tp, s = self._store()
        h2, h3 = s.get_tweets(
            [2, 3], tp.HydrationField.SELF_THREAD | tp.HydrationField.DIRECTED)
        assert h2.extra["SelfThreadHydrator"]["is_self_thread"] is True
        assert h3.extra["SelfThreadHydrator"]["is_self_thread"] is False
        assert h3.extra["DirectedAtHydrator"]["in_reply_to_author_id"] == 10

    def test_perspective_and_takedown_need_context(self):
        tp, s = self._store()
        h = s.get_tweets([1], tp.HydrationField.PERSPECTIVE
                         | tp.HydrationField.TAKEDOWN)[0]
        assert "PerspectiveHydrator" not in h.extra  # no viewer ctx
        td = tp.TakedownStore()
        td.withhold(1, ["de"])
        viewer = tp.ViewerContext(user_id=5, country="DE", faved_ids={1})
        h = s.get_tweets(
            [1], tp.HydrationField.PERSPECTIVE | tp.HydrationField.TAKEDOWN,
            viewer=viewer, takedowns=td)[0]
        assert h.extra["PerspectiveHydrator"]["favorited"] is True
        t = h.extra["TakedownHydrator"]
        assert t["withheld_countries"] == ["DE"]
        assert t["withheld_for_viewer"] is True

    def test_edit_and_previous_counts(self):
        tp, s = self._store()
        edits = tp.EditChainStore()
        s.create(tp.Tweet(tweet_id=4, author_id=10, text="v1",
                          created_ts=130, fav_count=5))
        s.create(tp.Tweet(tweet_id=5, author_id=10, text="v2",
                          created_ts=140))
        edits.record_edit(4, 5)
        h = s.get_tweets(
            [5], tp.HydrationField.EDIT | tp.HydrationField.PREVIOUS_COUNTS,
            edits=edits)[0]
        assert h.extra["EditControlHydrator"]["latest_version"] == 5
        assert h.extra["PreviousTweetCountsHydrator"]["fav_count"] == 5

    def test_all_flag_runs_everything(self):
        tp, s = self._store()
        h = s.get_tweets([1], tp.HydrationField.ALL)[0]
        assert h.core is not None and h.counts is not None
        assert "LanguageHydrator" in h.extra
        assert "ConversationIdHydrator" in h.extra
