"""From-scratch minimal PDF codec — no PDF library.

The reference leans on pypdf for structure checks (pdf_validator.py:90-110)
and page text (``page.extract_text()``, union_bank_extractor.py:237-257);
this module replaces that dependency for the raw-bytes ingest path with a
self-contained subset implementation:

* :func:`decode_pdf_bytes` — tokenize a raw PDF byte stream: scan indirect
  objects, walk Catalog → Pages → Kids for page order, decompress content
  streams (``/FlateDecode`` via stdlib zlib, or raw), and interpret the text
  operators ``Tj ' " TJ`` (+ line advances ``Td TD T*``, block end ``ET``)
  and the XObject draw ``Do`` into the canonical span sequence. Returns
  ``None`` for structurally-undecodable payloads (the CORRUPTED quarantine
  path, mirroring pdf_validator.py:44-58).
* :func:`encode_pdf` — the inverse: spans → a valid little PDF (one page
  object per PAGE_BREAK-delimited page, one content stream per page, a
  Type1 font resource, media spans as 1×1 image XObjects whose resource
  NAME carries the media_ref via standard ``#xx`` name escaping — exactly
  how a real extractor would have to recover an image identity).

Scope honestly stated: no encryption, no object streams (PDF 1.5 xref
streams), no CID fonts; strings are utf-8 bytes. That covers every PDF this
engine writes and the round-trip property test pins codec(decode∘encode)=id
over the whole generator corpus.
"""

from __future__ import annotations

import re
import zlib

from ..schemas import PAGE_BREAK

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"^\s*(\d+)\s+\d+\s+R")
_DELIMS = b"()<>[]{}/%"


# ---------------------------------------------------------------------------
# name escaping (PDF 7.3.5): media_ref <-> /name
# ---------------------------------------------------------------------------


def _escape_name(ref: str) -> str:
    out = []
    for b in ref.encode("utf-8"):
        c = chr(b)
        if c.isalnum():
            out.append(c)
        else:
            out.append(f"#{b:02x}")
    return "".join(out)


def _unescape_name(name: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(name):
        if name[i : i + 1] == b"#" and i + 2 < len(name) + 1:
            try:
                out.append(int(name[i + 1 : i + 3], 16))
                i += 3
                continue
            except ValueError:
                pass
        out.append(name[i])
        i += 1
    return out.decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _escape_string(text: str) -> bytes:
    return (
        text.encode("utf-8")
        .replace(b"\\", rb"\\")
        .replace(b"(", rb"\(")
        .replace(b")", rb"\)")
    )


def encode_pdf(spans: list[tuple], compress: bool = True) -> bytes:
    """Canonical spans → a valid minimal PDF. ``spans`` rows are
    ``(kind, text, media_ref, offset)``; PAGE_BREAK text spans split pages."""
    pages: list[list[tuple]] = [[]]
    media_refs: list[str] = []
    for kind, text, media_ref, _off in spans:
        if kind == "text" and text == PAGE_BREAK:
            pages.append([])
        elif kind == "media":
            pages[-1].append(("media", media_ref))
            media_refs.append(media_ref)
        else:
            pages[-1].append(("text", text))

    objs: dict[int, bytes] = {}
    font_num = 3
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    xobj_nums: dict[str, int] = {}
    next_num = 4
    for ref in dict.fromkeys(media_refs):
        objs[next_num] = (
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>\n"
            b"stream\n\x00\nendstream"
        )
        xobj_nums[ref] = next_num
        next_num += 1

    page_nums: list[int] = []
    for page in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td ET"]
        for kind, val in page:
            if kind == "text":
                ops.append(b"BT (" + _escape_string(val) + b") Tj ET")
            else:
                ops.append(b"/" + _escape_name(val).encode() + b" Do")
        content = b"\n".join(ops)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        c_num = next_num
        next_num += 1
        objs[c_num] = (
            b"<< /Length " + str(len(content)).encode() + filt + b" >>\n"
            b"stream\n" + content + b"\nendstream"
        )
        xo = b"".join(
            b"/" + _escape_name(r).encode() + b" " + str(n).encode() + b" 0 R "
            for r, n in xobj_nums.items()
        )
        p_num = next_num
        next_num += 1
        objs[p_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> /XObject << " + xo + b">> >> "
            b"/Contents " + str(c_num).encode() + b" 0 R >>"
        )
        page_nums.append(p_num)

    kids = b" ".join(str(n).encode() + b" 0 R" for n in page_nums)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_nums)).encode() + b" >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_max = max(objs) + 1
    out += b"xref\n0 " + str(n_max).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, n_max):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(n_max).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _parse_objects(payload: bytes) -> dict[int, bytes]:
    """Sequential object scan with STREAM SKIPPING: ``/Length`` advances the
    cursor past stream data, so compressed bytes that happen to contain
    ``endobj``/``N 0 obj`` can neither truncate an object nor forge one (a
    naive regex over the whole file would do both)."""
    objs: dict[int, bytes] = {}
    cursor = 0
    for m in _OBJ_HDR_RE.finditer(payload):
        if m.start() < cursor:
            continue  # header bytes inside a previous object's stream data
        start = m.end()
        sm = _STREAM_RE.search(payload, start)
        em = payload.find(b"endobj", start)
        if em < 0:
            break
        if sm and sm.start() < em:
            lm = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", payload[start : sm.start()])
            if lm and not lm.group(2):
                em = payload.find(b"endobj", sm.end() + int(lm.group(1)))
            else:  # indirect /Length: best-effort endstream scan
                es = payload.find(b"endstream", sm.end())
                em = payload.find(b"endobj", es) if es >= 0 else -1
            if em < 0:
                break
        objs[int(m.group(1))] = payload[start:em]
        cursor = em + len(b"endobj")
    return objs


def _resolve_ref(body_after_key: bytes, objs: dict[int, bytes]) -> bytes | None:
    m = _REF_RE.match(body_after_key)
    return objs.get(int(m.group(1))) if m else None


def _dict_value(body: bytes, key: bytes) -> bytes | None:
    """Raw bytes following ``key`` in a dict body (caller interprets)."""
    i = body.find(key)
    return None if i < 0 else body[i + len(key):]


def _stream_data(body: bytes, objs: dict[int, bytes]) -> bytes | None:
    m = re.search(rb"stream\r?\n", body)
    if not m:
        return None
    end = body.rfind(b"endstream")
    if end < 0:
        return None
    data = body[m.end() : end]
    if data.endswith(b"\r\n"):
        data = data[:-2]
    elif data.endswith(b"\n"):
        data = data[:-1]
    if b"/FlateDecode" in body[: m.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _page_numbers(objs: dict[int, bytes]) -> list[int] | None:
    """Catalog → Pages tree → ordered page object numbers."""
    roots = [n for n, b in objs.items() if b"/Type /Catalog" in b or b"/Type/Catalog" in b]
    if not roots:
        return None
    pages_ref = _dict_value(objs[roots[0]], b"/Pages")
    m = _REF_RE.match(pages_ref or b"")
    if not m:
        return None

    ordered: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 32 or num not in objs:
            return
        body = objs[num]
        if b"/Kids" in body:
            kids_raw = _dict_value(body, b"/Kids")
            arr = kids_raw[kids_raw.find(b"[") + 1 : kids_raw.find(b"]")]
            for km in re.finditer(rb"(\d+)\s+\d+\s+R", arr):
                walk(int(km.group(1)), depth + 1)
        else:
            ordered.append(num)

    walk(int(m.group(1)))
    return ordered


def _tokenize_content(data: bytes):
    """Yield ('str', bytes) | ('arr', [bytes...]) | ('name', bytes) |
    ('op', bytes) tokens from a content stream."""
    i, n = 0, len(data)
    arr: list[bytes] | None = None
    while i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"(":
            buf = bytearray()
            depth = 1
            i += 1
            while i < n and depth:
                ch = data[i : i + 1]
                if ch == b"\\" and i + 1 < n:
                    nxt = data[i + 1 : i + 2]
                    esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                           b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}
                    if nxt in esc:
                        buf += esc[nxt]
                        i += 2
                    elif nxt in b"01234567":
                        om = re.match(rb"[0-7]{1,3}", data[i + 1 : i + 4])
                        buf.append(int(om.group(0), 8) & 0xFF)
                        i += 1 + len(om.group(0))
                    else:
                        i += 1  # line continuation / unknown: drop backslash
                elif ch == b"(":
                    depth += 1
                    buf += ch
                    i += 1
                elif ch == b")":
                    depth -= 1
                    if depth:
                        buf += ch
                    i += 1
                else:
                    buf += ch
                    i += 1
            tok = ("str", bytes(buf))
            if arr is not None:
                arr.append(bytes(buf))
            else:
                yield tok
        elif c == b"<" and data[i + 1 : i + 2] != b"<":
            j = data.find(b">", i)
            if j < 0:
                return
            hx = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            s = bytes.fromhex(hx.decode("ascii", errors="ignore") or "")
            if arr is not None:
                arr.append(s)
            else:
                yield ("str", s)
            i = j + 1
        elif c == b"[":
            arr = []
            i += 1
        elif c == b"]":
            yield ("arr", arr or [])
            arr = None
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and not data[j : j + 1].isspace() and data[j : j + 1] not in (
                b"(", b")", b"<", b">", b"[", b"]", b"{", b"}", b"/", b"%"
            ):
                j += 1
            yield ("name", data[i + 1 : j])
            i = j
        elif c == b"<":  # '<<' dict open inside content (BDC etc.) — skip
            i += 2
        elif c == b">":
            i += 2
        else:
            j = i
            while j < n and not data[j : j + 1].isspace() and data[j : j + 1] not in _DELIMS:
                j += 1
            if j == i:
                i += 1
                continue
            yield ("op", data[i:j])
            i = j


def decode_pdf_bytes(payload: bytes) -> list[dict] | None:
    """Raw PDF bytes → canonical span dicts (None ⇒ quarantine)."""
    if not isinstance(payload, (bytes, bytearray)) or not payload.startswith(b"%PDF-"):
        return None
    objs = _parse_objects(bytes(payload))
    if not objs:
        return None
    page_nums = _page_numbers(objs)
    if not page_nums:
        return None

    spans: list[dict] = []

    def emit(kind: str, text: str = "", media_ref: str = "") -> None:
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    for p_i, p_num in enumerate(page_nums):
        if p_i:
            emit("text", PAGE_BREAK)
        body = objs[p_num]
        contents_raw = _dict_value(body, b"/Contents")
        streams: list[bytes] = []
        if contents_raw is not None:
            if contents_raw.lstrip().startswith(b"["):
                arr = contents_raw[contents_raw.find(b"[") + 1 : contents_raw.find(b"]")]
                for m in re.finditer(rb"(\d+)\s+\d+\s+R", arr):
                    ob = objs.get(int(m.group(1)))
                    if ob is not None:
                        s = _stream_data(ob, objs)
                        if s is None:
                            return None
                        streams.append(s)
            else:
                ob = _resolve_ref(contents_raw, objs)
                if ob is not None:
                    s = _stream_data(ob, objs)
                    if s is None:
                        return None
                    streams.append(s)

        buf: list[str] = []
        pending = False
        last_str: bytes = b""
        last_arr: list[bytes] = []
        last_name: bytes = b""

        def flush() -> None:
            nonlocal pending
            if pending:
                emit("text", "".join(buf))
                buf.clear()
                pending = False

        for data in streams:
            for kind, val in _tokenize_content(data):
                if kind == "str":
                    last_str = val
                elif kind == "arr":
                    last_arr = val
                elif kind == "name":
                    last_name = val
                else:  # operator
                    if val == b"Tj" or val == b'"':
                        buf.append(last_str.decode("utf-8", errors="replace"))
                        pending = True
                    elif val == b"'":
                        flush()
                        buf.append(last_str.decode("utf-8", errors="replace"))
                        pending = True
                    elif val == b"TJ":
                        buf.append(
                            b"".join(last_arr).decode("utf-8", errors="replace")
                        )
                        pending = True
                    elif val in (b"Td", b"TD", b"T*", b"ET"):
                        flush()
                    elif val == b"Do":
                        flush()
                        if last_name:
                            emit("media", media_ref=_unescape_name(last_name))
        flush()
    return spans
