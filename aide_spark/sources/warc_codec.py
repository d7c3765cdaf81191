"""From-scratch WARC (Web ARChive, ISO 28500) reader/writer — stdlib only.

WARC is the container format real web crawls (Common Crawl, Heritrix)
arrive in: a file is a sequence of records, each a header block of
``Name: value`` lines led by a ``WARC/1.0`` version line, a blank line,
``Content-Length`` octets of body, and a ``\\r\\n\\r\\n`` terminator.  The
compressed form gzips EVERY RECORD AS ITS OWN MEMBER and concatenates the
members (the spec's recommendation, so a reader can split work without
decompressing the whole file) — :func:`parse_warc` handles plain files,
whole-file gzip, and the member-per-record form with the same code path
(``zlib.decompressobj`` loop over members).

``response`` records carry an HTTP message as their body: status line +
headers, blank line, payload.  :func:`parse_warc` splits that too, so the
caller gets the raw payload bytes plus the HTTP status and Content-Type.

Design rules (the binary_ingest quarantine philosophy):

* **Never raises on malformed input** — a truncated record, a bad length,
  a corrupt gzip member, or garbage headers end the scan and return the
  records parsed so far; a single rotten record in a 1 GB WARC must not
  fail the whole Arrow batch.
* **Linear, bounded** — one pass, no backtracking; per-record memory is
  the record itself.

Scale shape: WARC files are the natural Spark partition unit (Common Crawl
ships ~1 GB segment files); :func:`aide_spark.sources.binary_ingest.ingest_warc`
maps files → records inside ``mapInPandas`` with zero shuffle, and record
bodies then flow through the same magic-byte dispatch as the mixed-format
table.  Reference parity note: the reference engine (api/, PDF-only) has no
crawl-container surface; this module serves the north rule's web-scale
ingest leg from the public WARC spec.
"""

from __future__ import annotations

import gzip
import io
import zlib

_CRLF = b"\r\n"


def encode_warc(records: list[dict], compress: str | None = "record") -> bytes:
    """Records → WARC bytes (test fixture + write side).

    Each record dict: ``rec_type`` ('response' | 'resource' | ...), ``url``,
    ``body`` bytes, optional ``http_status`` int and ``content_type`` (when
    given, the body is wrapped in an HTTP/1.1 response message, the
    ``response`` convention).  ``compress``: ``None`` plain, ``'file'``
    whole-file gzip, ``'record'`` one gzip member per record (the spec
    form)."""
    out = []
    for i, r in enumerate(records):
        body = bytes(r["body"])
        if r.get("http_status") is not None:
            body = (
                b"HTTP/1.1 " + str(r["http_status"]).encode() + b" OK" + _CRLF
                + b"Content-Type: "
                + r.get("content_type", "application/octet-stream").encode()
                + _CRLF
                + b"Content-Length: " + str(len(body)).encode() + _CRLF
                + _CRLF + body
            )
        hdr = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + r.get("rec_type", "response").encode() + _CRLF
            + b"WARC-Record-ID: <urn:uuid:" + str(i).encode() + b">" + _CRLF
            + b"WARC-Target-URI: " + r.get("url", "").encode() + _CRLF
            + b"Content-Length: " + str(len(body)).encode() + _CRLF
            + _CRLF
        )
        rec = hdr + body + _CRLF + _CRLF
        out.append(gzip.compress(rec) if compress == "record" else rec)
    blob = b"".join(out)
    return gzip.compress(blob) if compress == "file" else blob


def _inflate_members(payload: bytes) -> bytes | None:
    """Concatenated gzip members → concatenated plaintext; None if the
    first member is corrupt (later corruption keeps the good prefix)."""
    out, pos, n = [], 0, len(payload)
    while pos < n and payload[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(payload[pos:]))
        except zlib.error:
            break
        if not d.eof:  # truncated member: keep what inflated, stop
            break
        pos = n - len(d.unused_data)
    return b"".join(out) if out else None


def _split_http(body: bytes) -> tuple[int | None, str, bytes]:
    """HTTP message → (status, content_type lowercased, payload).  A body
    that is not an HTTP message comes back (None, '', body) untouched."""
    if not body.startswith(b"HTTP/"):
        return None, "", body
    sep = body.find(b"\r\n\r\n")
    if sep == -1:
        return None, "", body
    head, payload = body[:sep], body[sep + 4 :]
    lines = head.split(_CRLF)
    parts = lines[0].split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, "", body
    ctype = ""
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1").lower()
            break
    return status, ctype, payload


def parse_warc(payload: bytes) -> list[dict]:
    """WARC bytes (plain, whole-file gzip, or member-per-record gzip) →
    record dicts: ``rec_idx``, ``rec_type``, ``url``, ``http_status``
    (None for non-HTTP bodies), ``content_type``, ``body`` payload bytes.
    Malformed input never raises — the scan stops at the first
    unparseable record and returns the good prefix."""
    if not isinstance(payload, (bytes, bytearray)):
        return []
    data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
        if data is None:
            return []
    records: list[dict] = []
    buf = io.BytesIO(data)
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        while line in (_CRLF, b"\n"):
            line = buf.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            break  # desynchronized: stop, keep the good prefix
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if line in (_CRLF, b"\n", b""):
                break
            k, sep, v = line.partition(b":")
            if not sep:
                continue
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            break
        body = buf.read(length)
        if len(body) < length:  # truncated record
            break
        status, ctype, inner = _split_http(body)
        records.append(
            {
                "rec_idx": len(records),
                "rec_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri", ""),
                "http_status": status,
                "content_type": ctype,
                "body": inner,
            }
        )
    return records
