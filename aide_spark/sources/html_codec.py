"""From-scratch HTML tokenizer + block segmenter (stdlib only).

The north rule's first leg — "HTML boilerplate strip … DOM heuristics" — needs
a way to turn raw HTML bytes into the flat *text-block* table that the
columnar boilerplate classifier (operators/boilerplate.py) consumes.  This
module is that front end: a single linear scan over the markup (loosely the
WHATWG tokenizer states, simplified to what block segmentation needs) that
emits one row per text block / media element:

    (block_idx, kind 'text'|'media', text, n_words, n_anchor_words,
     skip_ancestor, media_ref)

Design rules, chosen so the classifier stays 100% columnar downstream:

* **Blocks break at block-level tags** (the boilerpipe convention): every
  open or close of ``p/div/h1..h6/li/td/…`` flushes the accumulated inline
  text as one block.  ``<br>`` is inline whitespace, ``<hr>`` is a break.
* **Anchor text is measured, not dropped**: inline pieces carry an "inside
  ``<a>``" flag and the flush counts anchored words, so the classifier can
  compute *link density* — the single strongest shallow boilerplate feature
  (Kohlschütter et al., WSDM 2010).
* **DOM heuristics are captured as a flag, not a decision**: a block inside
  ``<nav>/<aside>/<footer>/<header>/<form>`` gets ``skip_ancestor=True``;
  the *classifier* combines that with the density rules, keeping policy out
  of the parser.
* **Raw-text elements** (``script/style/textarea/title``) are consumed and
  discarded — their content is never body text.  Comments, doctypes and
  processing instructions are skipped.  A ``<`` not followed by ``/``, ``!``,
  ``?`` or a letter is literal text (the browser rule), so ``1 < 2`` survives.
* **Entities** decode via a small named table + numeric forms; unknown named
  entities pass through literally.
* **``<img>``** flushes the pending text and emits a ``media`` row carrying
  its ``src`` — the media leg of the interleaved span schema.

Scale: pure per-document byte work with zero lookahead beyond the current
tag — it runs inside ``mapInPandas`` Arrow batches (operators/boilerplate.py)
and costs O(bytes) per doc with no shuffle, the same shape as the PDF
tokenizer in pdf_codec.py.  Reference parity note: the reference engine has
no HTML path at all (api/ is PDF-only); this module serves the north rule's
HTML leg, built from the public boilerpipe method.
"""

from __future__ import annotations

import re

# HTML5 void elements — never pushed on the open-element stack.
VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# Opening/closing any of these flushes the current inline text as a block.
BLOCK = {
    "address", "article", "aside", "blockquote", "body", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav",
    "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul",
}

# Ancestors that mark a block as site furniture (the DOM heuristic).
SKIP_ANCESTORS = {"nav", "aside", "footer", "header", "form"}

# Content is consumed verbatim until the matching close tag, then discarded.
RAWTEXT = {"script", "style", "textarea", "title"}

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®", "trade": "™",
    "middot": "·", "bull": "•", "mdash": "—",
    "ndash": "–", "hellip": "…", "laquo": "«",
    "raquo": "»", "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”", "times": "×",
    "divide": "÷", "deg": "°", "plusmn": "±", "shy": "",
}

_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")
_SRC_RE = re.compile(
    r"""\bsrc\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([a-zA-Z0-9_-]+)"""
    rb"""|content\s*=\s*["'][^"']*?charset=([a-zA-Z0-9_-]+))""",
    re.IGNORECASE,
)

# label → codec, the WHATWG encoding-label table trimmed to what stdlib
# covers; unknown labels fall back to utf-8 (with 'replace', so decode
# still never raises)
_CHARSET_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "latin1": "latin-1", "latin-1": "latin-1", "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1", "windows-1252": "cp1252", "cp1252": "cp1252",
    "ascii": "ascii", "us-ascii": "ascii",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "iso-8859-2": "iso8859-2", "iso-8859-15": "iso8859-15",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc_jp", "gbk": "gbk", "gb2312": "gbk", "big5": "big5",
    "euc-kr": "euc_kr", "koi8-r": "koi8_r",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def sniff_charset(payload: bytes) -> str:
    """WHATWG encoding sniffing, trimmed: BOM first (authoritative), then a
    ``<meta charset>`` / ``http-equiv`` prescan of the first 1024 bytes,
    else utf-8.  Returns a Python codec name."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be"
    m = _CHARSET_RE.search(payload[:1024])
    if m:
        label = (m.group(1) or m.group(2)).decode("latin-1").lower()
        return _CHARSET_ALIASES.get(label, "utf-8")
    return "utf-8"


def decode_html_bytes(payload: bytes) -> str:
    """bytes → str via the sniffed charset; never raises (``replace``
    errors, and a codec the build lacks falls back to utf-8)."""
    codec = sniff_charset(payload)
    if codec == "utf-8-sig":
        payload = payload[3:]
        codec = "utf-8"
    elif codec in ("utf-16-le", "utf-16-be"):
        payload = payload[2:]  # drop the BOM — it must not leak as U+FEFF text
    try:
        return payload.decode(codec, "replace")
    except LookupError:
        return payload.decode("utf-8", "replace")


def decode_entities(s: str) -> str:
    """Decode ``&name;`` / ``&#NNN;`` / ``&#xHH;``; unknown names pass through."""
    if "&" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        j = s.find(";", i + 1)
        if j == -1 or j - i > 12:  # no terminator nearby: literal '&'
            out.append(c)
            i += 1
            continue
        name = s[i + 1 : j]
        if name.startswith("#"):
            try:
                cp = int(name[2:], 16) if name[1:2] in ("x", "X") else int(name[1:])
                out.append(chr(cp))
                i = j + 1
                continue
            except (ValueError, OverflowError):
                pass
        elif name.lower() in _ENTITIES:
            out.append(_ENTITIES[name.lower()])
            i = j + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def tokenize_blocks(payload: bytes | str) -> list[dict]:
    """One linear pass: HTML bytes -> ordered list of block dicts.

    Each dict: ``block_idx`` (doc-ordered, media rows included), ``kind``
    ('text' | 'media'), ``text`` (whitespace-normalized, '' for media),
    ``n_words``, ``n_anchor_words``, ``skip_ancestor``, ``media_ref``
    ('' for text rows).  Never raises on malformed markup — truncated tags
    drop the tail, stray closes are ignored (quarantine philosophy of
    binary_ingest.decode_container).
    """
    html = decode_html_bytes(payload) if isinstance(payload, (bytes, bytearray)) else payload
    lower = html.lower()
    n = len(html)

    blocks: list[dict] = []
    stack: list[str] = []
    anchor_depth = 0
    pieces: list[tuple[str, bool]] = []  # (text, inside_anchor)
    piece_skip = False  # skip-ancestor state captured at the block's first piece

    def flush() -> None:
        nonlocal pieces
        if not pieces:
            return
        raw = "".join(t for t, _ in pieces)
        text = " ".join(raw.split())
        if text:
            n_words = len(text.split(" "))
            n_anchor = sum(len(t.split()) for t, a in pieces if a)
            blocks.append(
                {
                    "block_idx": len(blocks),
                    "kind": "text",
                    "text": text,
                    "n_words": n_words,
                    "n_anchor_words": min(n_anchor, n_words),
                    "skip_ancestor": piece_skip,
                    "media_ref": "",
                }
            )
        pieces = []

    def append_text(t: str) -> None:
        nonlocal piece_skip
        t = decode_entities(t)
        if not pieces:
            if not t.strip():
                return  # leading whitespace never opens a block
            piece_skip = bool(SKIP_ANCESTORS & set(stack))
        pieces.append((t, anchor_depth > 0))

    i = 0
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            append_text(html[i:])
            break
        if lt > i:
            append_text(html[i:lt])
        nxt = html[lt + 1 : lt + 2]
        if nxt == "!":
            if html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                i = n if end == -1 else end + 3
            else:  # doctype / CDATA-ish: skip to '>'
                end = html.find(">", lt)
                i = n if end == -1 else end + 1
            continue
        if nxt == "?":
            end = html.find(">", lt)
            i = n if end == -1 else end + 1
            continue
        closing = nxt == "/"
        m = _NAME_RE.match(html, lt + (2 if closing else 1))
        if not m:
            append_text("<")  # '1 < 2': literal text, browser behavior
            i = lt + 1
            continue
        name = m.group(0).lower()
        # find tag end, honoring quoted attribute values that contain '>'
        j, quote = m.end(), None
        while j < n:
            c = html[j]
            if quote:
                if c == quote:
                    quote = None
            elif c in "\"'":
                quote = c
            elif c == ">":
                break
            j += 1
        if j >= n:  # unterminated tag: drop the tail
            break
        tag_body = html[lt + 1 : j]
        i = j + 1

        if closing:
            if name == "a" and anchor_depth > 0:
                anchor_depth -= 1
            if name in BLOCK:
                flush()
            if name in stack:
                while stack and stack.pop() != name:
                    pass
            continue

        self_closing = tag_body.rstrip().endswith("/")
        if name in RAWTEXT and not self_closing:
            end = lower.find("</" + name, i)
            if end == -1:
                i = n
            else:
                gt = html.find(">", end)
                i = n if gt == -1 else gt + 1
            continue
        if name == "img":
            flush()
            sm = _SRC_RE.search(tag_body)
            src = next((g for g in sm.groups() if g is not None), "") if sm else ""
            blocks.append(
                {
                    "block_idx": len(blocks),
                    "kind": "media",
                    "text": "",
                    "n_words": 0,
                    "n_anchor_words": 0,
                    "skip_ancestor": bool(SKIP_ANCESTORS & set(stack)),
                    "media_ref": decode_entities(src),
                }
            )
            continue
        if name == "br":
            append_text(" ")
            continue
        if name in BLOCK:
            flush()
            # implicit close (HTML5 tree construction, simplified): <p>
            # contains only phrasing content, so any block tag ends an open
            # <p>; a new <li> ends the previous <li>.
            if stack and stack[-1] == "p":
                stack.pop()
            elif name == "li" and stack and stack[-1] == "li":
                stack.pop()
        if name == "a":
            anchor_depth += 1
        if name not in VOID and not self_closing:
            stack.append(name)

    flush()
    return blocks


_HREF_RE = re.compile(
    r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


def extract_links(payload: bytes | str) -> list[dict]:
    """One linear pass: HTML bytes -> ordered outlink rows, the web-graph
    primitive (each dict: ``link_idx`` doc-ordered, ``href`` entity-decoded,
    ``anchor_text`` whitespace-normalized).

    Same scanning rules as :func:`tokenize_blocks` (comments / doctypes /
    rawtext skipped, quoted attributes may contain ``>``, literal ``<`` is
    text), so an ``<a>`` inside a script string is never a link.  HTML
    forbids nested anchors: a new ``<a>`` implicitly closes the open one
    (the tree-construction rule), and EOF closes a dangling anchor.
    Anchors without an ``href`` (targets) are not links.  Never raises on
    malformed markup."""
    html = decode_html_bytes(payload) if isinstance(payload, (bytes, bytearray)) else payload
    lower = html.lower()
    n = len(html)

    links: list[dict] = []
    href: str | None = None
    pieces: list[str] = []

    def close_anchor() -> None:
        nonlocal href, pieces
        if href is not None:
            links.append(
                {
                    "link_idx": len(links),
                    "href": href,
                    "anchor_text": " ".join("".join(pieces).split()),
                }
            )
        href, pieces = None, []

    i = 0
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            if href is not None:
                pieces.append(decode_entities(html[i:]))
            break
        if lt > i and href is not None:
            pieces.append(decode_entities(html[i:lt]))
        nxt = html[lt + 1 : lt + 2]
        if nxt == "!":
            if html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                i = n if end == -1 else end + 3
            else:
                end = html.find(">", lt)
                i = n if end == -1 else end + 1
            continue
        if nxt == "?":
            end = html.find(">", lt)
            i = n if end == -1 else end + 1
            continue
        closing = nxt == "/"
        m = _NAME_RE.match(html, lt + (2 if closing else 1))
        if not m:
            if href is not None:
                pieces.append("<")
            i = lt + 1
            continue
        name = m.group(0).lower()
        j, quote = m.end(), None
        while j < n:
            c = html[j]
            if quote:
                if c == quote:
                    quote = None
            elif c in "\"'":
                quote = c
            elif c == ">":
                break
            j += 1
        if j >= n:
            break
        tag_body = html[lt + 1 : j]
        i = j + 1

        if closing:
            if name == "a":
                close_anchor()
            continue
        self_closing = tag_body.rstrip().endswith("/")
        if name in RAWTEXT and not self_closing:
            end = lower.find("</" + name, i)
            if end == -1:
                i = n
            else:
                gt = html.find(">", end)
                i = n if gt == -1 else gt + 1
            continue
        if name == "br":
            if href is not None:
                pieces.append(" ")
            continue
        if name == "a":
            close_anchor()  # nested <a> implicitly closes the open one
            hm = _HREF_RE.search(tag_body)
            if hm and not self_closing:
                href = decode_entities(
                    next(g for g in hm.groups() if g is not None)
                )
    close_anchor()
    return links
