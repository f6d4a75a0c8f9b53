"""Semantics of the extraction/canonicalization projections
(text.strip_markup / text.normalize_text): block deletion vs tag
unwrapping, entity decode ordering, the Unicode fold table, and NULL
propagation."""

from __future__ import annotations

from process_alphafold3_outputs_spark.operators.text import (
    normalize_text,
    strip_markup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df):
    r = df.collect()[0]
    return r


def test_strip_markup_blocks_deleted_tags_unwrapped(spark):
    r = _one(
        strip_markup(
            _docs(
                spark,
                [(1, '<p class="a">keep</p><script x>var s="drop";'
                     '</script><style>.c{}</style><!-- gone -->tail')],
            )
        )
    )
    assert r["clean_text"] == "keep tail"
    # only <p> and </p> are unwrapped tags; script/style/comment
    # content (and their tags) were deleted as blocks first
    assert r["n_tags"] == 2


def test_strip_markup_case_insensitive_and_multiline(spark):
    r = _one(
        strip_markup(
            _docs(spark, [(1, "<SCRIPT>\nline1\nline2\n</ScRiPt>a "
                              "<BR/>b")])
        )
    )
    assert r["clean_text"] == "a b"
    assert r["n_tags"] == 1  # the <BR/>


def test_strip_markup_entity_decode_order(spark):
    # &amp;lt; must decode to the TEXT "&lt;", never to live markup "<"
    r = _one(
        strip_markup(
            _docs(spark, [(1, "x &amp;lt; y &lt;b&gt; &quot;q&#39; "
                              "a&nbsp;b")])
        )
    )
    assert r["clean_text"] == "x &lt; y <b> \"q' a b"
    assert r["n_tags"] == 0  # &lt;b&gt; is text, not a tag


def test_strip_markup_plain_text_untouched(spark):
    r = _one(strip_markup(_docs(spark, [(1, "  no markup   here ")])))
    assert r["clean_text"] == "no markup here"
    assert r["n_tags"] == 0


def test_normalize_folds_hand_computed(spark):
    raw = "“Hi” – café… end​\x01!"
    r = _one(normalize_text(_docs(spark, [(1, raw)])))
    assert r["clean_text"] == "\"Hi\" - café... end!"
    assert r["n_chars_before"] == len(raw)
    assert r["n_chars_after"] == len("\"Hi\" - café... end!")


def test_normalize_whitespace_collapse_and_controls(spark):
    r = _one(normalize_text(_docs(spark, [(1, "a\t\t b\x00\x07c\n\nd")])))
    assert r["clean_text"] == "a bc d"


def test_normalize_idempotent(spark):
    raw = "‘q’ — x…"
    once = _one(normalize_text(_docs(spark, [(1, raw)])))["clean_text"]
    twice = _one(normalize_text(_docs(spark, [(1, once)])))["clean_text"]
    assert once == twice == "'q' - x..."


def test_null_text_propagates_null(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    m = _one(strip_markup(df))
    assert m["clean_text"] is None and m["n_tags"] is None
    n = _one(normalize_text(df))
    assert n["clean_text"] is None and n["n_chars_before"] is None


def test_projections_have_no_exchange(spark, sf_dir):
    """Both are pure projections the scan absorbs — no shuffle, no
    Python in the row path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for op in (strip_markup, normalize_text):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, op.__name__
        assert "BatchEvalPython" not in plan, op.__name__


def test_cli_normalize_modes(spark, tmp_path):
    from process_alphafold3_outputs_spark import corpus_cli

    d = str(tmp_path / "nd")
    spark.createDataFrame(
        [(1, "<b>“hi”</b> &amp; x…")], "doc_id long, text string"
    ).write.parquet(d)
    out = str(tmp_path / "no")

    def run(extra):
        args = corpus_cli.build_parser().parse_args(
            ["normalize", "--documents", d, "--out", out] + extra
        )
        assert corpus_cli.run(args, spark)["rows"] == 1
        return spark.read.parquet(out).collect()[0]

    plain = run([])
    assert plain["clean_text"] == '<b>"hi"</b> &amp; x...'
    markup = run(["--markup"])
    assert markup["clean_text"] == '"hi" & x...'
