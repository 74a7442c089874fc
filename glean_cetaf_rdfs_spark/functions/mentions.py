"""Mention-detection rules for the extraction stage.

These pure functions are the single source of truth for what counts as a
mention: the Spark ``mapInPandas`` extraction UDF and the frozen pure-Python
oracle both import them, so engine-vs-oracle parity is by construction
(mirrors how the reference derives its sed programs from one associative
array, generate_sed-expr4ROR-id.sh:98-169 in /root/reference).

Mention grammar (what the reference's rdfparse+sed stack consumed as IRIs
and typed literals):

* bare URLs: ``https?://`` up to whitespace/quote/angle-bracket,
* bracket-quoted URLs ``<http://...>`` which may contain the illegal IRI
  characters the reference percent-encodes (space ^ ` \\ [ ] —
  fixRDF_before_validateRDFs.sh:368-384),
* decimal coordinates ``lat=... long=...`` (typed xsd:decimal and rounded
  to 5 dp when ≥6 decimals — JACQ.sh:368-374, 388-395),
* quoted collection-code literals (the conditional-linking key,
  convertRDF4import_normal-files_Finland.sh:471-522),
* ``note=""`` empty literals (dropped downstream, JACQ.sh:360),
* ``eventtype=Event`` markers (the conformsTo-retraction trigger,
  Finland.sh:443,462,515).
"""

from __future__ import annotations

import re

_BRACKET_URL = re.compile(r"<(https?://[^<>]*)>")
_BARE_URL = re.compile(r'(?<![<\w])(https?://[^\s"<>\[\]\\^`]+)')
_RECORDED_BY = re.compile(r'recordedby=(https?://[^\s"<>\[\]\\^`]+)')
_MEDIA = re.compile(r'media="(https?://[^"]+)"')
_XML_COMMENT = re.compile(r"<!--.*?-->", re.S)
_HTML_BLOB = re.compile(r"<!DOCTYPE html.*?</html>", re.S | re.I)


def fix_text(text: str) -> str:
    """Pre-extraction text repairs — the reference's fix stage, net of
    the downstream parse:

    * embedded HTML/DOCTYPE payloads excised (P6 —
      fixRDF_before_validateRDFs.sh:358-366),
    * XML comment spans removed: the reference %-encodes ``--`` inside
      comments only so the parser survives them (P10 — fixRDF:386-394),
      then the parser discards comment content — net semantics: comment
      content is never data, so URLs inside comments are not mentions.
    """
    if "<!" not in text:  # cheap guard (the reference's grep-before-sed)
        return text
    text = _HTML_BLOB.sub(" ", text)
    return _XML_COMMENT.sub(" ", text)


def extract_media(text: str) -> tuple[list[str], str]:
    """``media="<url>"`` quoted-literal media references → URL-valued
    literals, retyped to IRIs at canonicalization (P19 — JACQ.sh:846-855,
    issue #12). Returns (urls, text_without_those_spans)."""
    if 'media="' not in text:
        return [], text
    out: list[str] = []

    def _take(m: re.Match) -> str:
        out.append(m.group(1))
        return " "

    rest = _MEDIA.sub(_take, text)
    return out, rest
_COORDS = re.compile(r"lat=(-?\d+\.\d+) long=(-?\d+\.\d+)")
_COLLECTION = re.compile(r'collection "([^"]+)"')
_EMPTY_NOTE = re.compile(r'note=""')
_EVENT = re.compile(r"eventtype=Event\b")


def extract_recorded_by(text: str) -> tuple[list[str], str]:
    """``recordedby=<url>`` collector back-links → ``dwciri:recordedBy``
    (the G4 hasPart trigger — the reference grafts dcterms:hasPart only
    when the subject has dwciri:recordedBy into wikidata/viaf,
    convertRDF4import_normal-files_JACQ.sh:446-447). Returns
    (urls, text_without_those_spans) so the mention matcher can't
    re-match the same URL as a plain mention."""
    if "recordedby=" not in text:
        return [], text
    out: list[str] = []

    def _take(m: re.Match) -> str:
        out.append(m.group(1))
        return " "

    rest = _RECORDED_BY.sub(_take, text)
    return out, rest


def extract_urls(text: str) -> list[str]:
    """All URL mentions in document order; bracket-quoted first (they may
    contain characters that terminate a bare-URL match)."""
    out = []
    # remove bracket-quoted spans so the bare matcher can't re-match inside
    def _take(m: re.Match) -> str:
        out.append(("bracket", m.group(1)))
        return " "
    rest = _BRACKET_URL.sub(_take, text) if "<http" in text else text
    if "http" in rest:
        for m in _BARE_URL.finditer(rest):
            out.append(("bare", m.group(1)))
    return [u for _, u in out]


def extract_coords(text: str) -> list[tuple[str, str]]:
    """(lat, long) literal pairs, rounded per the reference rule: literals
    with ≥6 decimals are reformatted to 5 dp (perl sprintf %.5f,
    JACQ.sh:390-395); shorter literals pass through verbatim."""
    if "lat=" not in text:
        return []
    return [(round_decimal_literal(m.group(1)), round_decimal_literal(m.group(2)))
            for m in _COORDS.finditer(text)]


def round_decimal_literal(lit: str) -> str:
    frac = lit.split(".", 1)[1] if "." in lit else ""
    if len(frac) >= 6:
        return f"{float(lit):.5f}"
    return lit


def extract_collection_codes(text: str) -> list[str]:
    if "collection " not in text:
        return []
    return _COLLECTION.findall(text)


def has_empty_note(text: str) -> bool:
    return 'note=""' in text  # the pattern is a literal


def is_event_marked(text: str) -> bool:
    return "eventtype=Event" in text and _EVENT.search(text) is not None
