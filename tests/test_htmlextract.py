"""HTML main-content extraction (``functions/htmlextract``): boilerplate
strip + DOM heuristics on handcrafted and adversarial markup, plus the
distributed wrap-and-recover query (``pipelines/webextract``)."""

import pytest

from p_id_text_extraction_ray.functions.htmlextract import (
    decode_entities, extract_main_text, tokenize_blocks)
from p_id_text_extraction_ray.pipelines.webextract import (
    html_main_content, synth_page)

PAGE = """<!DOCTYPE html>
<html><head><title>The &amp; Title</title>
<style>body { color: red }</style>
<script>if (a < b) document.write("<p>fake</p>");</script>
</head><body>
<nav><a href="/">home</a> <a href="/x">browse</a> <a href="/y">help</a></nav>
<article>
<h2>Section heading</h2>
<p>First real paragraph with enough words to stand alone.</p>
<p>Second paragraph also carries genuine article content here.</p>
<p>See <a href="/ref">one reference</a> among many plain words in this line.</p>
</article>
<aside><p><a href="/1">link</a> <a href="/2">list</a> <a href="/3">only</a></p></aside>
<footer><p>copyright 2024 example corp</p></footer>
</body></html>"""


def test_entities():
    assert decode_entities("a &amp; b &lt;c&gt; &#65; &#x42; &nbsp;") \
        == "a & b <c> A B  "
    assert decode_entities("&bogus; &#xZZ; &#0;") == "&bogus; &#xZZ; &#0;"


def test_extracts_body_drops_chrome():
    res = extract_main_text(PAGE)
    assert res["title"] == "The & Title"
    paras = res["main_text"].split("\n\n")
    assert paras[0] == "Section heading"
    assert paras[1].startswith("First real paragraph")
    assert paras[2].startswith("Second paragraph")
    assert "one reference" in paras[3]       # low link density: kept
    assert "home" not in res["main_text"]    # nav gone
    assert "copyright" not in res["main_text"]
    assert "link" not in res["main_text"]    # link-list aside gone
    assert "fake" not in res["main_text"]    # script contents skipped
    assert "color" not in res["main_text"]   # style contents skipped


def test_link_density_cut():
    html = ("<p>plain words carry this paragraph easily</p>"
            "<p><a>a</a> <a>b</a> <a>c</a> <a>d</a> x</p>")
    res = extract_main_text(html)
    assert "plain words" in res["main_text"]
    assert "a b c d" not in res["main_text"]


def test_gap_smoothing_keeps_short_block_next_to_content():
    html = ("<p>a long enough paragraph of real article content</p>"
            "<p>E=mc2</p>")
    res = extract_main_text(html)
    assert res["main_text"].endswith("E=mc2")
    # the same short block alone (no strong neighbor) is dropped
    assert extract_main_text("<p>E=mc2</p>")["main_text"] == ""


def test_heading_without_content_dropped():
    assert extract_main_text("<h1>Orphan heading</h1>")["main_text"] == ""
    kept = extract_main_text(
        "<h1>Real heading</h1><p>followed by body text content</p>")
    assert kept["main_text"].startswith("Real heading")


def test_malformed_html_never_fails():
    cases = [
        "<p>unclosed <div> everywhere <span>text words here",
        "<p>attr edge <a href='a>b' title=\"x>y\">link</a> words words</p>",
        "<!-- unterminated comment <p>invisible</p>",
        "<script>never closed",
        "plain text with no tags at all but plenty of words",
        "",
        "<><<<>>><p>still finds these words in the mess</p>",
    ]
    for html in cases:
        res = extract_main_text(html)      # must not raise
        assert isinstance(res["main_text"], str)
    assert "invisible" not in extract_main_text(cases[2])["main_text"]
    assert "plenty of words" in extract_main_text(cases[4])["main_text"]
    assert "still finds" in extract_main_text(cases[6])["main_text"]


def test_nested_chrome_and_self_closing():
    html = ("<header><nav><p>menu words</p></nav><p>tagline words "
            "here</p></header><br/><p>the real body paragraph of the "
            "page</p><hr/><footer><div><p>deep footer</p></div></footer>")
    res = extract_main_text(html)
    assert res["main_text"] == "the real body paragraph of the page"


def test_blocks_have_link_counts():
    _, blocks = tokenize_blocks(
        "<p>four plain words <a>two linked</a></p>")
    assert len(blocks) == 1
    assert blocks[0].n_words == 5 and blocks[0].n_link_words == 2


def test_synth_page_roundtrip_single():
    text = "alpha beta gamma delta epsilon zeta eta theta iota"
    res = extract_main_text(synth_page(42, text))
    assert " ".join(res["main_text"].split()) == text
    assert res["title"] == "Doc 42 — Corpus"


def test_html_main_content_query(ray_session):
    out = html_main_content("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert int(out["match"].sum()) == 500
    assert (out["n_blocks"] > out["n_kept"]).all()   # chrome was present


def test_flagship_text_path_html_strip(ray_session, tmp_path):
    """ExtractConfig(html_strip=True) routes markup-bearing text spans
    through main-content extraction inside the REAL pipeline; plain
    spans and the default config are untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from p_id_text_extraction_ray.config import ExtractConfig
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    page = ("<html><body><nav><a>home</a> <a>about</a></nav>"
            "<p>the actual article body lives here</p>"
            "<footer><p>copyright chrome</p></footer></body></html>")
    span_type = pa.list_(pa.struct([("kind", pa.string()),
                                    ("text", pa.string()),
                                    ("media_ref", pa.string()),
                                    ("offset", pa.int32())]))
    docs = pa.table({
        "doc_id": pa.array(["D0"], pa.string()),
        "spans": pa.array([[
            {"kind": "text", "text": page, "media_ref": "", "offset": 0},
            {"kind": "text", "text": "plain span stays", "media_ref": "",
             "offset": 1},
        ]], span_type)})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(docs, p)

    on = extract_spans(rd.read_parquet(p), str(tmp_path),
                       cfg=ExtractConfig(html_strip=True)).to_pandas() \
        .sort_values("offset")
    assert on["text"].tolist() == ["the actual article body lives here",
                                   "plain span stays"]

    off = extract_spans(rd.read_parquet(p), str(tmp_path)).to_pandas() \
        .sort_values("offset")
    assert "<nav>" in off["text"].iloc[0]        # default: markup kept


def test_curate_web_corpus_chain(ray_session):
    """Composed chain: extraction + repair are lossless, the gate keeps
    exactly the gopher-kept docs, and untouched docs round-trip."""
    import pandas as pd
    import pyarrow.parquet as pq

    from p_id_text_extraction_ray.pipelines.textstats import \
        gopher_quality_flags
    from p_id_text_extraction_ray.pipelines.webextract import \
        curate_web_corpus

    sf = "/root/testdata/sf0.001"
    out = curate_web_corpus(sf).to_pandas().set_index("doc_id")
    flags = gopher_quality_flags(sf).to_pandas()
    kept = set(flags.loc[flags["keep"] == 1, "doc_id"])
    assert set(out.index) == kept

    src = pq.read_table(sf + "/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")
    undedup = out[out["n_dropped"] == 0]
    assert len(undedup) > 0
    for doc_id, row in undedup.iterrows():
        assert " ".join(row["text_final"].split()) == \
            " ".join(src.loc[doc_id, "text"].split())
