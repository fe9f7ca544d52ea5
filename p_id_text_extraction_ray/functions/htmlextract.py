"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north-star pipeline's text side — "HTML boilerplate strip, PDF/
layout parse, DOM heuristics" — for crawled pages: a dependency-free
tokenizer builds a flat block model of the page (text blocks with their
ancestor-tag context and link-word counts), then classic main-content
heuristics (boilerpipe / readability family: container-tag pruning,
link-density cuts, short-block gap smoothing) keep the article body and
drop navigation, chrome, and templated footers. Pure functions — the
Ray stage wraps them in ``map_batches`` (pipelines/webextract.py).

Not a validating parser: crawl HTML is malformed by nature, so the
tokenizer is forgiving — unclosed tags never fail, script/style/comment
contents are skipped wholesale, and block structure comes from a small
set of block-level tags rather than a full tree.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Tags whose subtree is boilerplate chrome by construction.
CHROME_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "menu", "noscript"})
# Tags whose raw contents are never text.
RAW_TEXT_TAGS = frozenset({"script", "style", "template", "svg"})
# Tags that terminate the current text block.
BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "br", "li", "ul", "ol",
    "table", "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "figure", "figcaption", "hr", "dl", "dt", "dd",
    "body", "html", "head", "title"})

MAX_LINK_DENSITY = 0.5       # readability: drop link-heavy blocks
MIN_BLOCK_WORDS = 3          # shorter blocks survive only next to content
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                  # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"        # CDATA
    r"|<!DOCTYPE[^>]*>"                  # doctype
    r"|<\?[^>]*>"                        # processing instructions
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)"   # tag open: groups(close, name)
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>"     # attrs (quote-aware)
    , re.DOTALL | re.IGNORECASE)

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"',
             "apos": "'", "nbsp": " ", "mdash": "—",
             "ndash": "–", "hellip": "…", "copy": "©"}
_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")
_WORD_RE = re.compile(r"\w+")
_WS_RE = re.compile(r"\s+")


def decode_entities(text: str) -> str:
    """Minimal HTML entity decoding (named core set + numeric)."""

    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("#"):
            try:
                cp = int(e[2:], 16) if e[1] in "xX" else int(e[1:])
                return chr(cp) if 0 < cp < 0x110000 else m.group(0)
            except ValueError:
                return m.group(0)
        return _ENTITIES.get(e.lower(), m.group(0))

    return _ENTITY_RE.sub(sub, text)


@dataclass
class Block:
    """One flat text block with the context the heuristics need."""

    text: str
    n_words: int
    n_link_words: int
    in_chrome: bool          # any CHROME_TAGS ancestor when emitted
    heading: bool            # emitted inside h1-h6
    tag: str                 # nearest enclosing block tag


def tokenize_blocks(html: str) -> tuple[str, list[Block]]:
    """(title, flat text blocks) of an HTML document.

    Single pass over the tag stream, maintaining open-tag context as
    counters (not a tree — malformed nesting cannot corrupt state
    beyond its own subtree): chrome depth, link depth, heading depth,
    raw-text skip. Text accumulates into the current block; any
    block-level tag boundary flushes it.
    """
    pos = 0
    chrome = 0
    link = 0
    heading = 0
    in_title = False
    title_parts: list[str] = []
    blocks: list[Block] = []
    cur: list[str] = []
    cur_links = 0
    cur_tag = "body"

    def flush() -> None:
        nonlocal cur, cur_links
        text = _WS_RE.sub(" ", "".join(cur)).strip()
        if text:
            n_words = len(_WORD_RE.findall(text))
            blocks.append(Block(text, n_words, cur_links, chrome > 0,
                                heading > 0, cur_tag))
        cur = []
        cur_links = 0

    def emit(lead: str) -> None:
        if not lead:
            return
        if in_title:
            title_parts.append(lead)
            return
        decoded = decode_entities(lead)
        cur.append(decoded)
        if link > 0:
            nonlocal cur_links
            cur_links += len(_WORD_RE.findall(decoded))

    while pos < len(html):
        m = _TOKEN_RE.search(html, pos)
        if m is None:
            emit(html[pos:])
            break
        emit(html[pos:m.start()])
        pos = m.end()
        name = m.group(2)
        if name is None:          # comment / doctype / PI / CDATA
            continue
        name = name.lower()
        closing = m.group(1) == "/"
        self_closing = (m.group(3) or "").rstrip().endswith("/")
        if not closing and name in RAW_TEXT_TAGS and not self_closing:
            # skip the raw element's contents by searching for ITS end
            # tag directly — the general tokenizer must not run inside
            # (script text is full of pseudo-tags that would desync it)
            end = re.search(rf"</\s*{name}\s*>", html[pos:], re.IGNORECASE)
            pos = len(html) if end is None else pos + end.end()
            continue
        if name == "title":
            in_title = not closing and not self_closing
            continue
        if name == "a":
            link = max(0, link - 1) if closing else link + 1
            continue
        if name in _HEADING_TAGS:
            flush()
            heading = max(0, heading - 1) if closing else heading + 1
            if not closing:
                cur_tag = name
            continue
        if name in CHROME_TAGS:
            flush()
            chrome = max(0, chrome - 1) if closing else chrome + 1
            continue
        if name in BLOCK_TAGS:
            flush()
            if not closing:
                cur_tag = name
    flush()
    title = _WS_RE.sub(" ", decode_entities("".join(title_parts))).strip()
    return title, blocks


def extract_main_text(html: str) -> dict:
    """Main-content extraction: tokenize to blocks, then keep the
    article body by the classic rules —

    1. chrome prune: blocks under nav/header/footer/aside/form drop;
    2. link-density cut: blocks whose words are mostly link anchors
       (> MAX_LINK_DENSITY) drop (menus and "related links" lists);
    3. gap smoothing: a short surviving block (< MIN_BLOCK_WORDS words,
       e.g. an inline formula line) is kept only when an adjacent block
       also survives on its own weight — isolated short fragments are
       templated chrome;
    4. headings attach to the body only when content follows them.

    Returns ``{"title", "main_text", "n_blocks", "n_kept"}`` with the
    body joined by blank lines — deterministic, dependency-free, and
    cheap enough to be a per-batch inner loop.
    """
    title, blocks = tokenize_blocks(html)
    n = len(blocks)
    strong = []
    for b in blocks:
        if b.in_chrome or not b.n_words:
            strong.append(False)
            continue
        density = b.n_link_words / b.n_words
        strong.append(density <= MAX_LINK_DENSITY
                      and (b.n_words >= MIN_BLOCK_WORDS or b.heading))
    kept = list(strong)
    for i, b in enumerate(blocks):           # gap smoothing
        if kept[i] or b.in_chrome or not b.n_words:
            continue
        if b.n_link_words / b.n_words > MAX_LINK_DENSITY:
            continue
        if (i > 0 and strong[i - 1]) or (i + 1 < n and strong[i + 1]):
            kept[i] = True
    # headings with no surviving content after them are chrome
    for i, b in enumerate(blocks):
        if kept[i] and b.heading:
            if not any(kept[j] and not blocks[j].heading
                       for j in range(i + 1, n)):
                kept[i] = False
    body = [b.text for i, b in enumerate(blocks) if kept[i]]
    return {"title": title, "main_text": "\n\n".join(body),
            "n_blocks": n, "n_kept": sum(kept)}
