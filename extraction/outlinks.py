"""Outlink + head-metadata collection for WAT generation (r6 VERDICT #2).

WAT — the metadata-JSON third member of the Common Crawl WARC/WET/WAT
triple — carries, per page, the anchor targets and head metadata a
link-graph or header-analytics user consumes. This module is the DOM walk
that feeds it: hrefs of ``<a>`` tags in document order plus the ``<title>``
text, collected with the stdlib ``HTMLParser`` (the same tolerant parser
that anchors the segmenter's reference path — script/style bodies,
comments, and bogus markup are handled for free, and attribute values
arrive entity-decoded).

Reference analog: the structured-JSON sidecar role of the reference's
``_build_json_output`` (bilingual_ocr.py:300-305) — per-input machine
metadata emitted alongside the extracted payload.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _LinkCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self._title_parts: list[str] = []
        self._in_title = False
        self._title_done = False

    # handle_startendtag's default delegates to handle_starttag, so
    # self-closing ``<a href=x/>`` anchors are collected too
    def handle_starttag(self, tag, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
                    break  # first href attr wins (browser behavior)
        elif tag == "title" and not self._title_done:
            self._in_title = True

    def handle_endtag(self, tag) -> None:
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True  # first <title> wins

    def handle_data(self, data) -> None:
        if self._in_title:
            self._title_parts.append(data)

    @property
    def title(self) -> str | None:
        if not self._title_parts and not self._title_done:
            return None
        return "".join(self._title_parts)


def page_links(html: str) -> tuple[list[str], str | None]:
    """``(outlinks, title)`` for one page: hrefs of ``<a>`` tags in DOM
    order (entity-decoded, first ``href`` attribute per tag) and the first
    ``<title>`` text, or ``None`` when the page has no title element.
    Never raises on malformed markup (HTMLParser tolerance)."""
    c = _LinkCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:  # noqa: BLE001 — tolerant like the segmenter ladder
        pass
    return c.links, c.title
