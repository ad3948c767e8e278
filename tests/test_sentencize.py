from deepex_spark.local_oracle import local_sentencize


def test_split_and_offsets():
    t = "First sentence. Second one! Third?  Fourth"
    sents = local_sentencize(t)
    assert [s[2] for s in sents] == ["First sentence.", "Second one!", "Third?", "Fourth"]
    for _, off, s in sents:
        assert t[off : off + len(s)] == s


def test_duplicate_sentence_first_occurrence_offset():
    # faithful quirk: str.find returns the first occurrence
    t = "It rained. It rained. Sun came out."
    sents = local_sentencize(t)
    assert sents[0][1] == 0 and sents[1][1] == 0  # both point at the first
    assert sents[2][2] == "Sun came out."


def test_spark_matches_local(spark):
    from deepex_spark.functions.sentencize import sentencize

    texts = [
        "First sentence. Second one! Third?  Fourth",
        "It rained. It rained. Sun came out.",
        "No terminal punctuation here",
        "Gap  after (blank)   run. Next.",
    ]
    df = spark.createDataFrame([(str(i), t) for i, t in enumerate(texts)], "docid string, text string")
    got = {
        (r["docid"], r["sent_pos"], r["sent_offset"], r["sent_text"])
        for r in sentencize(df).collect()
    }
    want = set()
    for i, t in enumerate(texts):
        for pos, off, s in local_sentencize(t):
            want.add((str(i), pos, off, s))
    assert got == want
