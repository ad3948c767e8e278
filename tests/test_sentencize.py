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


def test_reconstruct_mode_matches_scan_without_duplicates(spark):
    """The linear reconstruct mode must agree with the faithful instr scan
    everywhere except the documented duplicate/embedded cases — INCLUDING
    doc-edge non-space whitespace (F.trim strips only ' ', SPARK-17299;
    reconstruct must not strip tabs/newlines/controls either) and
    tab/newline/mixed boundary runs."""
    from deepex_spark.functions.sentencize import sentencize

    texts = [
        "First sentence. Second one! Third?  Fourth",
        "No terminal punctuation here",
        "Gap  after (blank)   run. Next.",
        "Tabs\tinside. And newlines\nhere. End.",
        "\tLeading tab. Trailing newline\n",      # doc-edge non-space ws
        "A.\tTab boundary. B.\n\n C.\r\n D.",     # \s+ runs beyond ' '
        "A. \x00control kept. B\x07.",            # controls are NOT \s
        "Unicode\xa0space. Next\xa0one. End.",    # \xa0 is not Java \s
    ]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "docid string, text string"
    )
    scan = {tuple(r) for r in sentencize(df, mode="scan").collect()}
    recon = {tuple(r) for r in sentencize(df, mode="reconstruct").collect()}
    assert scan == recon


def test_reconstruct_text_parity_even_with_duplicates(spark):
    """Sentence TEXT (docid, sent_pos, sent_text) is byte-identical between
    modes on EVERY doc — only offsets may deviate, and only on
    duplicate/embedded sentences."""
    from deepex_spark.functions.sentencize import sentencize

    texts = [
        "It rained. It rained. Sun came out.",
        "\tIt rained.\tIt rained.\nSun came out.\n",
        "abc. xyz abc. tail.",
    ]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "docid string, text string"
    )
    cols = ("docid", "sent_pos", "sent_text")
    scan = {tuple(r) for r in sentencize(df, mode="scan").select(*cols).collect()}
    recon = {
        tuple(r) for r in sentencize(df, mode="reconstruct").select(*cols).collect()
    }
    assert scan == recon


def test_auto_mode_routes_per_doc(spark):
    """auto == scan below the threshold; above it, == reconstruct — checked
    on a mixed frame in one pass."""
    from deepex_spark.functions.sentencize import sentencize

    short = "It rained. It rained. Sun came out."
    long = ("The cat sat here. " * 40).rstrip()  # 719 chars > threshold 64
    df = spark.createDataFrame(
        [("s", short), ("l", long)], "docid string, text string"
    )
    got = {tuple(r) for r in sentencize(df, mode="auto", scan_max_len=64).collect()}
    want_short = {
        tuple(r) for r in sentencize(
            df.filter("docid = 's'"), mode="scan").collect()
    }
    want_long = {
        tuple(r) for r in sentencize(
            df.filter("docid = 'l'"), mode="reconstruct").collect()
    }
    assert got == want_short | want_long
    # the long doc's duplicate sentences carry aligned (distinct) offsets —
    # proof the reconstruct branch actually ran
    long_offs = sorted(off for d, _, off, _ in got if d == "l")
    assert len(set(long_offs)) == len(long_offs)


def test_auto_mode_default_matches_scan_on_small_docs(spark):
    """Default threshold (64 KiB) leaves every normal page on the faithful
    scan branch — byte-identical output, duplicate quirk included."""
    from deepex_spark.functions.sentencize import sentencize

    texts = [
        "First sentence. Second one! Third?  Fourth",
        "It rained. It rained. Sun came out.",
        "\tLeading tab. Trailing newline\n",
    ]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "docid string, text string"
    )
    scan = {tuple(r) for r in sentencize(df, mode="scan").collect()}
    auto = {tuple(r) for r in sentencize(df).collect()}  # default mode=auto
    assert scan == auto


def test_reconstruct_mode_duplicate_offsets_are_aligned(spark):
    """Documented deviation: duplicates get their ACTUAL aligned offset
    (the scan mode gives every copy the first occurrence's offset); every
    reconstructed offset indexes its own sentence in the doc."""
    from deepex_spark.functions.sentencize import sentencize

    t = "It rained. It rained. Sun came out."
    df = spark.createDataFrame([("d", t)], "docid string, text string")
    scan = sorted(tuple(r) for r in sentencize(df).collect())
    recon = sorted(tuple(r) for r in sentencize(df, mode="reconstruct").collect())
    assert [r[2] for r in scan] == [0, 0, 22]
    assert [r[2] for r in recon] == [0, 11, 22]
    for _, _, off, s in recon:
        assert t[off : off + len(s)] == s


def test_reconstruct_mode_no_instr_in_plan(spark):
    """The scale mode must not carry the per-sentence doc scan: no instr
    and no _doc_text column survive analysis."""
    from deepex_spark.functions.sentencize import sentencize

    df = spark.createDataFrame([("d", "A. B.")], "docid string, text string")
    plan = sentencize(df, mode="reconstruct")._jdf.queryExecution().analyzed().toString()
    assert "instr" not in plan
