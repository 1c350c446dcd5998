"""HTML main-content extraction (boilerplate stripping).

New capability required by the north rule (BASELINE.json): batched HTML
boilerplate stripping with text-density + link-density DOM heuristics in
the spirit of Readability/Boilerpipe (Kohlschütter et al., WSDM 2010).
The reference has no HTML path (it only accepts png/jpg/jpeg/pdf,
/root/reference/src/api/routes.py:211-217), so these semantics are OUR
spec; they are deterministic and golden-tested against this kernel itself.

Algorithm (pure stdlib ``html.parser`` — no external deps):

1. Parse into *blocks*: text accumulated per block-level element boundary.
   ``script/style/noscript/template`` subtrees are dropped outright;
   ``nav/header/footer/aside/form`` subtrees are tagged boilerplate.
2. Per block compute:
     * ``chars``         — total text length,
     * ``link_chars``    — text length inside <a>,
     * ``words``         — whitespace tokens,
     * ``link_density``  = link_chars / chars,
     * ``text_density``  = words / lines  (lines = ceil(chars/80), the
       classic Boilerpipe wrap-width approximation).
3. Keep a block iff it is not inside a boilerplate container and
   ``chars >= 25`` and ``link_density < 0.33`` and ``text_density >= 3``.
   Headings (h1-h6, title) are kept when the *next* kept block follows
   them (they caption content), else dropped.
4. Output = kept blocks joined by "\\n".
"""

from __future__ import annotations

import math
from html.parser import HTMLParser

import pandas as pd

_BLOCK_TAGS = {
    "p", "div", "td", "th", "li", "dd", "dt", "blockquote", "pre",
    "article", "section", "main", "h1", "h2", "h3", "h4", "h5", "h6",
    "title", "figcaption", "caption", "tr", "table", "ul", "ol", "body",
}
_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
_BOILER_TAGS = {"nav", "header", "footer", "aside", "form", "button", "menu"}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "title"}

MIN_CHARS = 25
MAX_LINK_DENSITY = 0.33
MIN_TEXT_DENSITY = 3.0
WRAP_WIDTH = 80


class _Block:
    __slots__ = ("parts", "link_chars", "boiler", "heading")

    def __init__(self, boiler: bool, heading: bool):
        self.parts: list[str] = []
        self.link_chars = 0
        self.boiler = boiler
        self.heading = heading

    def text(self) -> str:
        return " ".join("".join(self.parts).split())


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._cur: _Block | None = None

    def _flush(self):
        if self._cur is not None and self._cur.text():
            self.blocks.append(self._cur)
        self._cur = None

    def _ensure(self, heading: bool = False) -> _Block:
        if self._cur is None:
            self._cur = _Block(self._boiler_depth > 0, heading)
        return self._cur

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag == "br":
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADING_TAGS:
                self._ensure(heading=True)

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth > 0 or not data.strip():
            return
        block = self._ensure()
        block.parts.append(data)
        if self._link_depth > 0:
            block.link_chars += len(data.strip())


def extract_main_text_one(html: str) -> str:
    """Boilerplate-strip one HTML document; deterministic."""
    parser = _Extractor()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        # malformed markup: keep whatever blocks parsed so far
        pass
    parser._flush()

    kept: list[tuple[int, str]] = []  # (index, text)
    pending_heading: tuple[int, str] | None = None
    for i, b in enumerate(parser.blocks):
        text = b.text()
        chars = len(text)
        if b.boiler or chars == 0:
            pending_heading = None
            continue
        if b.heading:
            pending_heading = (i, text)
            continue
        link_density = b.link_chars / chars
        lines = max(1, math.ceil(chars / WRAP_WIDTH))
        text_density = len(text.split()) / lines
        if chars >= MIN_CHARS and link_density < MAX_LINK_DENSITY and text_density >= MIN_TEXT_DENSITY:
            if pending_heading is not None:
                kept.append(pending_heading)
            kept.append((i, text))
        pending_heading = None
    return "\n".join(t for _, t in kept)


def extract_main_text(htmls: pd.Series) -> pd.Series:
    """Batch boilerplate strip: Series[str html] -> Series[str main text]."""
    return pd.Series(
        [extract_main_text_one(h if isinstance(h, str) else "") for h in htmls],
        index=htmls.index,
        dtype="object",
    )
