"""Web-page main-content extraction over the documents corpus.

The north-star text path applied to crawl-shaped input: every document
is wrapped in a deterministic synthetic page template (navigation bar,
link-list sidebar, templated footer, script/style noise — the chrome a
crawler actually sees), and ``functions/htmlextract.extract_main_text``
must strip the chrome and recover exactly the article body. The wrap is
a pure function of (doc_id, text), so the whole query is deterministic
and self-verifying: the ``match`` column is 1 iff the extracted body
equals the original document text. Rows-only (DuckDB cannot parse
HTML); correctness of the extractor on adversarial markup lives in
``tests/test_htmlextract.py``.

Scale shape: embarrassingly parallel ``map_batches`` (one compiled-
regex tokenizer pass per page, no shuffle at all); at 100 TB this is
the canonical streaming stage — read, transform, emit, backpressure.
"""

from __future__ import annotations

import os

import pandas as pd

from ..functions.htmlextract import extract_main_text
from ._util import sized_read


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return sized_read(os.path.join(sf_dir, "documents.parquet"),
                      list(columns), rows_per_block=4096)


def synth_page(doc_id: int, text: str) -> str:
    """Deterministic crawl-page template around a document's text: the
    body paragraphs are the doc's words in ~3 chunks; everything else
    is boilerplate the extractor must remove."""
    words = text.split()
    k = max(1, (len(words) + 2) // 3)
    paras = [" ".join(words[i:i + k]) for i in range(0, len(words), k)] \
        or [""]
    para_html = "\n".join(f"<p>{p}</p>" for p in paras)
    return f"""<!DOCTYPE html>
<html><head><title>Doc {doc_id} &mdash; Corpus</title>
<style>p {{ margin: 0 }}</style>
<script>var q = "<p>not text</p>";</script>
</head><body>
<header><h1><a href="/">Corpus {doc_id % 7}</a></h1></header>
<nav><ul><li><a href="/a">home</a></li><li><a href="/b">browse all
documents</a></li><li><a href="/c">about this corpus</a></li></ul></nav>
<div id="content">
<article>
{para_html}
</article>
</div>
<aside><p>related: <a href="/r1">doc {doc_id + 1}</a>
<a href="/r2">doc {doc_id + 2}</a> <a href="/r3">doc {doc_id + 3}</a>
</p></aside>
<div class="share"><p><a href="/s">share</a> <a href="/t">tweet</a></p></div>
<footer><p>copyright corpus press {2000 + doc_id % 20} all rights
reserved</p></footer>
</body></html>"""


def html_main_content(sf_dir: str):
    """documents -> synthetic crawl pages -> main-content extraction.

    Output per doc: extracted title, body, block counts, and ``match``
    (1 iff the body equals the source text after the same whitespace
    normalization the page template applies)."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
            res = extract_main_text(synth_page(int(doc_id), text))
            expected = " ".join(text.split())
            got = " ".join(res["main_text"].split())
            rows.append((int(doc_id), res["title"], res["main_text"],
                         res["n_blocks"], res["n_kept"],
                         int(got == expected)))
        return pd.DataFrame(rows, columns=[
            "doc_id", "title", "main_text", "n_blocks", "n_kept",
            "match"])

    return _docs(sf_dir).map_batches(run, batch_format="pandas") \
        .sort("doc_id")


def _accent(text: str) -> str:
    """Deterministic non-ASCII enrichment of a plain-ASCII doc (vowels
    in every 5th word become accented), so the mojibake round-trip has
    something to corrupt."""
    table = str.maketrans("aeiou", "áéíóú")
    words = text.split(" ")
    return " ".join(w.translate(table) if i % 5 == 0 else w
                    for i, w in enumerate(words))


def fix_text_encoding(sf_dir: str):
    """documents -> deterministic mojibake corruption -> repair.

    Each doc's text is accented (pure function of the text), corrupted
    the way crawls actually corrupt it (UTF-8 bytes re-read as cp1252;
    every 3rd doc corrupted twice — double mojibake), then repaired by
    ``functions/textfix.fix_mojibake``. Self-verifying: ``match`` is 1
    iff the repair recovered the pre-corruption text exactly, and
    ``n_fixed`` counts the mojibake signatures removed. Rows-only
    (DuckDB has no byte-level re-decode). Embarrassingly parallel
    map_batches; no shuffle.
    """
    from ..functions.textfix import fix_mojibake, mojibake_score

    def run(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
            clean = _accent(text)
            rounds = 2 if doc_id % 3 == 0 else 1
            bad = clean
            for _ in range(rounds):
                bad = bad.encode("utf-8").decode("cp1252")
            fixed = fix_mojibake(bad)
            rows.append((int(doc_id), mojibake_score(bad),
                         int(fixed == clean)))
        return pd.DataFrame(rows,
                            columns=["doc_id", "n_fixed", "match"])

    return _docs(sf_dir).map_batches(run, batch_format="pandas") \
        .sort("doc_id")


def curate_web_corpus(sf_dir: str):
    """The full crawl-curation chain as ONE composed lazy plan — what a
    100 TB training-data run actually looks like end to end:

        synthetic crawl page  (deterministic wrap of each doc)
        -> HTML main-content extraction     (chrome stripped)
        -> mojibake corruption + repair     (cp1252 round-trip, fixed)
        -> Gopher quality gate              (composite keep rules)
        -> cross-doc paragraph dedup        (winner shuffle + rebuild)

    The narrow stages fuse into one streaming map over the corpus; the
    only all-to-alls are paragraph dedup's two bucketed shuffles.
    Output: one row per surviving doc with its final text, word count,
    and deduped-paragraph count. End-to-end losslessness (final text ==
    whitespace-normalized source when n_dropped == 0) is asserted in
    ``tests/test_htmlextract.py``. Rows-only — the HTML/encoding stages
    are not SQL-expressible; the gate and dedup stages are
    oracle-checked standalone (``gopher_quality_flags``,
    ``dedup_paragraphs``).
    """
    from ..functions.htmlextract import extract_main_text
    from ..functions.textfix import fix_mojibake
    from .curation import dedup_paragraphs_ds
    from .textstats import gopher_flags_frame

    def wrap_extract_fix(df: pd.DataFrame) -> pd.DataFrame:
        texts = []
        for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
            main = extract_main_text(synth_page(int(doc_id), text))
            bad = main["main_text"].encode("utf-8").decode("cp1252") \
                if any(ord(c) > 0x7F for c in main["main_text"]) \
                else main["main_text"]
            texts.append(fix_mojibake(bad))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "text": texts})

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        flags = gopher_flags_frame(df).to_pandas()
        return df.loc[flags["keep"].to_numpy() == 1,
                      ["doc_id", "text"]]

    extracted = _docs(sf_dir) \
        .map_batches(wrap_extract_fix, batch_format="pandas") \
        .map_batches(gate, batch_format="pandas")
    deduped = dedup_paragraphs_ds(extracted)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        norm = df["text_dedup"].map(lambda t: " ".join(t.split()))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_words": norm.map(lambda t: len(t.split())).to_numpy(),
            "n_dropped": df["n_dropped"].to_numpy(),
            "text_final": df["text_dedup"]})

    return deduped.map_batches(summarize, batch_format="pandas") \
        .sort("doc_id")
