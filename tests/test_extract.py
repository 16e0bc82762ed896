"""Unit tests for operators/extract.py (HTML → text, boilerplate
detection) — the oracle queries cover parity; these cover semantics."""
from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.operators import extract


def test_html_to_text_semantics(spark):
    cases = [
        # script/style content (incl. stray '<') dropped entirely
        ("<p>a</p><script>if (1 < 2) alert('x')</script>b", "a b"),
        ("<style>p {color: red}</style><b>bold</b>", "bold"),
        ("<!-- note -->keep", "keep"),
        # single-pass entity decode: &amp;lt; is the TEXT "&lt;", not "<"
        ("x &amp;lt; y", "x &lt; y"),
        ("&lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;z", "<tag> \"q\" 'a' z"),
        ("  <br/>  spaced   <hr>  ", "spaced"),
        ("", ""),
    ]
    df = spark.createDataFrame(cases, "html string, want string")
    out = df.select("want", extract.html_to_text(F.col("html")).alias("got")).collect()
    for r in out:
        assert r.got == r.want, (r.got, r.want)


def test_html_extract_counts(spark):
    df = spark.createDataFrame(
        [(1, '<p class="x">hi &amp; bye</p>')], "doc_id long, html string"
    )
    row = extract.html_extract(df).collect()[0]
    assert row.clean_text == "hi & bye"
    assert row.n_tags == 2 and row.n_entities == 1
    assert row.html_chars == len('<p class="x">hi &amp; bye</p>')
    assert row.text_chars == len("hi & bye")


def test_boilerplate_share_flags_templated_docs(spark):
    header = "terms of service apply to all users"
    uniq = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight",
        "red green blue cyan magenta yellow black white",
    ]
    rows = [(i, f"{header} {u}", "web") for i, u in enumerate(uniq)]
    rows.append((99, "totally unrelated text with many distinct words here", "web"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in extract.boilerplate_share(docs, n=5, min_docs=3).collect()}
    # the header's 3 five-grams appear in 3 docs -> boilerplate for 0..2
    for i in range(3):
        assert out[i].n_boiler == 3 and out[i].n_grams > 3
        assert not out[i].is_templated  # unique tail keeps ratio < 0.5
    assert out[99].n_boiler == 0 and not out[99].is_templated
    # a doc that is ONLY the shared header is fully templated
    docs2 = docs.unionByName(
        spark.createDataFrame([(100, header, "web")], "doc_id long, text string, source string")
    )
    out2 = {r.doc_id: r for r in extract.boilerplate_share(docs2, n=5, min_docs=3).collect()}
    assert out2[100].boiler_ratio == 1.0 and out2[100].is_templated


def test_boilerplate_share_scoped_per_source(spark):
    text = "shared header line for the source pages here"
    rows = [(1, text, "a"), (2, text, "a"), (3, text, "a"), (4, text, "b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in extract.boilerplate_share(docs, n=5, min_docs=3).collect()}
    assert out[1].is_templated and out[3].is_templated
    assert not out[4].is_templated  # only 1 doc in source b


def test_build_vocab_and_encode_tokens(spark):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "rare words here"),
        ],
        "doc_id long, text string",
    )
    vocab = {r.token: r for r in textops.build_vocab(docs, max_size=4).collect()}
    assert len(vocab) == 4
    assert vocab["the"].token_id == 0 and vocab["the"].n_occurrences == 3
    assert vocab["sat"].token_id == 1  # count 2
    # count-1 ties broken alphabetically: cat, dog fill the last two slots
    assert vocab["cat"].token_id == 2 and vocab["dog"].token_id == 3

    enc = {
        r.doc_id: r
        for r in textops.encode_tokens(
            docs, textops.build_vocab(docs, max_size=4)
        ).collect()
    }
    assert enc[1].token_ids == [0, 2, 1, -1, 0, -1]
    assert enc[1].n_tokens == 6 and enc[1].n_unk == 2
    assert enc[2].token_ids == [0, 3, 1] and enc[2].n_unk == 0
    assert enc[3].token_ids == [-1, -1, -1] and enc[3].n_unk == 3


def test_build_vocab_min_count(spark):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    vocab = [r.token for r in textops.build_vocab(docs, min_count=2).collect()]
    assert vocab == ["a", "b"]


def test_unicode_clean_semantics(spark):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textclean

    rows = [
        (1, "café time"),          # NFC folds to é
        (2, "a\x00b\x07c"),               # control chars -> spaces
        (3, "  already   clean  "),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textclean.unicode_clean(docs).collect()}
    assert out[1].clean_text == "caf\u00e9 time" and out[1].was_denormalized
    assert out[1].n_chars_raw == 10 and out[1].n_chars_clean == 9
    assert out[2].clean_text == "a b c" and not out[2].was_denormalized
    assert out[3].clean_text == "already clean"
    assert out[4].clean_text == "" and out[4].n_chars_raw == 0


def test_compression_signals_rank_junk(spark):
    import math

    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textclean

    rows = [
        (1, "a" * 400),                                  # ultra-compressible
        (2, "the quick brown fox jumps over the lazy dog " * 10),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textclean.compression_signals(docs).collect()}
    assert out[1].compression_ratio < out[2].compression_ratio
    assert out[1].char_entropy == 0.0  # single symbol
    assert out[3].compression_ratio == 1.0 and out[3].char_entropy == 0.0
    # hand-computed entropy for 'aab': 2/3,1/3 split
    one = spark.createDataFrame([(9, "aab")], "doc_id long, text string")
    r = textclean.compression_signals(one).collect()[0]
    want = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert abs(r.char_entropy - want) < 1e-12


def test_bpe_train_and_encode(spark):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id long, text string"
    )
    merges = textops.bpe_train(docs, n_merges=4)
    # counts: (l,o)=5 ties (o,w)=5 -> lexicographic; then lo+w, low+e,
    # then (lowe,r) vs (lowe,s) tie -> b ascending
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")]

    enc = textops.bpe_encode(
        spark.createDataFrame([(9, "low lowest")], "doc_id long, text string"),
        merges,
    ).collect()[0]
    assert enc.subwords == ["low", "lowe", "s", "t"]
    assert enc.n_subwords == 4

    # determinism across retrains
    assert textops.bpe_train(docs, n_merges=4) == merges
    # more merges than pairs: trainer stops early without error
    tiny = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    m2 = textops.bpe_train(tiny, n_merges=10)
    assert m2[0] == ("a", "b") and len(m2) <= 10


def test_bpe_driver_trainer_matches_distributed(spark):
    """The fast driver-memory trainer must be bit-identical to the
    per-merge-job distributed trainer on a corpus with ties, repeats,
    and multi-byte chars."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    rows = [
        (1, "low low low lower lowest newest newest"),
        (2, "wider wide widest low newer café café"),
        (3, "aaa aab abab banana bandana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = textops.bpe_train(docs, n_merges=30)
    slow = textops.bpe_train_distributed(docs, n_merges=30)
    assert fast == slow

    # both encode routes (Catalyst folds vs mapInPandas memoized) agree
    cat = {r.doc_id: (r.subwords, r.n_subwords)
           for r in textops.bpe_encode(docs, fast[:20]).collect()}
    pyd = {r.doc_id: (r.subwords, r.n_subwords)
           for r in textops.bpe_encode(docs, fast[:20],
                                       catalyst_max_rules=0).collect()}
    assert cat == pyd


def test_bpe_train_production_scale_job_count(spark):
    """Production-vocab criterion: >=256 merges must cost O(1) Spark
    jobs (the word-count collect), not O(n_merges) — counted via a
    dedicated job group."""
    import itertools

    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    # the sf* documents lexicon exhausts at ~89 merges (every word
    # collapses to one symbol), so synthesize a corpus rich enough to
    # support a production-sized merge count: all 4-letter words over
    # 7 letters with zipf-ish repetition
    words = ["".join(w) for w in itertools.product("abcdefg", repeat=4)]
    text_rows = [
        (i, " ".join(words[i::17] * (1 + i % 3))) for i in range(17)
    ]
    docs = spark.createDataFrame(text_rows, "doc_id long, text string")
    sc = spark.sparkContext
    sc.setJobGroup("bpe-scale-test", "count jobs for bpe_train(256)")
    try:
        merges = textops.bpe_train(docs, n_merges=256)
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("bpe-scale-test")
        sc.setJobGroup(None, None)
    assert len(merges) == 256
    assert len(jobs) < 20, f"bpe_train(256) ran {len(jobs)} Spark jobs"
    # encoding with the trained rules stays distributed; spot-check one
    # doc decodes to its original non-whitespace text when merges applied
    enc = textops.bpe_encode(docs.limit(5), merges)
    rows = enc.collect()
    assert len(rows) == 5 and all(r.n_subwords > 0 for r in rows)


def test_unigram_logprob_hand_computed(spark):
    """3-doc corpus with known counts: p(a)=3/6, p(b)=2/6, p(c)=1/6."""
    import math

    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textops.unigram_logprob(docs).collect()}
    pa, pb, pc = 3 / 6, 2 / 6, 1 / 6
    want1 = (math.log(pa) + math.log(pa) + math.log(pb)) / 3
    want2 = (math.log(pa) + math.log(pb) + math.log(pc)) / 3
    assert abs(out[1].avg_logprob - round(want1, 8)) < 1e-8
    assert abs(out[2].avg_logprob - round(want2, 8)) < 1e-8
    assert out[1].avg_logprob > out[2].avg_logprob  # common tokens score higher
    assert out[3].n_tokens == 0 and out[3].avg_logprob is None


def test_bpe_encode_ids_roundtrip(spark):
    """Full tokenization to ids: vocab = sorted alphabet then merges in
    training order; ids reassemble in document order; OOV chars -> -1."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id long, text string"
    )
    merges = textops.bpe_train(docs, n_merges=4)
    alphabet = sorted({c for w in "low lower lowest".split() for c in w})
    vocab = dict(textops.bpe_vocab(merges, alphabet))
    # alphabet ids first, then merged symbols in training order
    assert vocab["e"] == 0 and vocab["l"] == 1
    assert vocab["lo"] == len(alphabet) and vocab["low"] == len(alphabet) + 1

    out = textops.bpe_encode_ids(
        spark.createDataFrame([(9, "low lowest xq")], "doc_id long, text string"),
        merges,
        alphabet,
    ).collect()[0]
    # 'low' -> [low]; 'lowest' -> [lowe, s, t]; 'xq' -> OOV chars
    want = [vocab["low"], vocab["lowe"], vocab["s"], vocab["t"], -1, -1]
    assert out.token_ids == want
    assert out.n_tokens == 6


def test_bpe_encode_ids_preserves_empty_docs(spark):
    """One row per input doc_id even when the text yields zero subwords
    (empty / whitespace-only): posexplode of an empty array must not
    silently drop the document — the sibling operators' coverage
    contract (unigram_logprob, winnow_span_profile)."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "low low"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    merges = textops.bpe_train(docs, n_merges=2)
    out = {
        r.doc_id: r
        for r in textops.bpe_encode_ids(docs, merges, ["l", "o", "w"]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[2].token_ids == [] and out[2].n_tokens == 0
    assert out[3].token_ids == [] and out[3].n_tokens == 0
    assert out[1].n_tokens > 0


def test_collapse_repetitions_caps_runs_and_loops(spark):
    """Token runs cap at 2, bigram loops cap at two periods, clean prose
    passes untouched, empty docs keep a zero row — and the decision
    reads the ORIGINAL sequence (drops never cascade new drops)."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam eggs"),
            (2, "buy now buy now buy now buy now"),
            (3, "perfectly normal prose with no repeats"),
            (4, "a a b a a b"),     # run of 2 twice, period-3 loop: all kept
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.collapse_repetitions(docs).collect()}
    assert out[1].clean_text == "spam spam eggs" and out[1].n_collapsed == 2
    assert out[2].clean_text == "buy now buy now" and out[2].n_collapsed == 4
    assert out[3].clean_text == "perfectly normal prose with no repeats"
    assert out[3].n_collapsed == 0
    assert out[4].clean_text == "a a b a a b"  # period-3: outside v1 scope
    assert out[5].n_tokens == 0 and out[5].clean_text == ""


def test_bpe_train_max_words_cap_boundary(spark):
    """The finite default cap (r10 verdict): bpe_train's collect is
    bounded by max_words.  At or above the vocab size (and at the 2^20
    default on any sane test corpus) the cap is a no-op; below it,
    training must equal training on exactly the top-max_words words by
    (count DESC, word ASC); max_words=None stays the explicit full-vocab
    escape hatch; a non-positive cap fails fast."""
    import pytest as _pytest

    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    # distinct counts -> unambiguous rank cut
    corpus = [("aaa", 9), ("aab", 7), ("abb", 5), ("bbb", 3), ("bab", 2)]
    text = " ".join(w for w, n in corpus for _ in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")

    full = textops.bpe_train(docs, n_merges=4, max_words=None)
    assert textops.bpe_train(docs, n_merges=4) == full          # default cap no-op
    assert textops.bpe_train(docs, n_merges=4, max_words=5) == full  # cap == vocab
    assert textops.bpe_train(docs, n_merges=4, max_words=99) == full  # cap > vocab

    for k in (1, 2, 3, 4):
        top_text = " ".join(w for w, n in corpus[:k] for _ in range(n))
        top_docs = spark.createDataFrame(
            [(1, top_text)], "doc_id long, text string"
        )
        assert textops.bpe_train(docs, n_merges=4, max_words=k) == \
            textops.bpe_train(top_docs, n_merges=4, max_words=None)

    with _pytest.raises(ValueError, match="max_words"):
        textops.bpe_train(docs, max_words=0)
