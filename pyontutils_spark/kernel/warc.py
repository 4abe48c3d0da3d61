"""WARC (ISO 28500 / Common Crawl) container parsing — pure stdlib.

The BASELINE input table is Common-Crawl-style pages ``(url, warc_ts,
html, text, lang)``; real Common Crawl ships as WARC files (one
``WARC/1.0`` record per capture, usually one gzip member per record).
This kernel turns WARC bytes into those rows with no external library:

- plain or gzip input (multi-member gzip streams handled by looping
  ``zlib.decompressobj(wbits=31)`` over the concatenated members —
  the layout CC uses so records are individually seekable)
- ``response`` records only (request/warcinfo/metadata skipped); the
  HTTP response header block is stripped so ``html`` is the payload
  body, matching the reference input contract
- ``WARC-Date`` parsed to a naive UTC datetime for the ``warc_ts``
  column

``write_warc_bytes`` emits spec-shaped records (used by tests and the
synthetic corpus) so the parser is exercised against real container
bytes, the same pattern as the JPEG/AVI kernels.
"""

from __future__ import annotations

import datetime as _dt
import zlib

__all__ = ["parse_warc", "write_warc_bytes"]

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def _parse_date(s: str) -> _dt.datetime | None:
    try:
        return (_dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
                .astimezone(_dt.timezone.utc).replace(tzinfo=None))
    except ValueError:
        return None


def parse_warc(payload: bytes) -> list[dict]:
    """WARC bytes -> [{'url', 'ts', 'status', 'html'}] for every
    ``response`` record.  Raises ValueError on non-WARC input."""
    data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    if not data.startswith(b"WARC/"):
        raise ValueError("not a WARC stream (missing WARC/ version line)")
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break                       # trailing padding
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC record header")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record without Content-Length") from e
        block = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        while data.startswith(_CRLF, pos):      # record separator
            pos += 2
        if headers.get("warc-type") != "response":
            continue
        status = None
        body = block
        if block[:5] in (b"HTTP/",):            # strip HTTP headers
            http_end = block.find(_CRLF + _CRLF)
            if http_end >= 0:
                status_line = block[:block.find(_CRLF)].decode(
                    "utf-8", "replace")
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                body = block[http_end + 4:]
        out.append({
            "url": headers.get("warc-target-uri"),
            "ts": _parse_date(headers.get("warc-date", "")),
            "status": status,
            "html": body,
        })
    return out


def write_warc_bytes(records: list[dict], gzip_members: bool = False
                     ) -> bytes:
    """[{'url', 'ts', 'html', 'status'?, 'type'?}] -> WARC bytes.
    ``gzip_members=True`` compresses each record as its own gzip
    member (the Common Crawl layout)."""
    chunks = []
    for i, r in enumerate(records):
        rtype = r.get("type", "response")
        if rtype == "response":
            status = r.get("status", 200)
            http = (f"HTTP/1.1 {status} OK\r\n"
                    "Content-Type: text/html\r\n\r\n").encode()
            block = http + bytes(r["html"])
        else:
            block = bytes(r.get("html", b""))
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: {rtype}\r\n"
               f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
               f"WARC-Date: {ts}\r\n"
               f"WARC-Target-URI: {r['url']}\r\n"
               f"Content-Length: {len(block)}\r\n\r\n").encode()
        rec = hdr + block + _CRLF + _CRLF
        if gzip_members:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = c.compress(rec) + c.flush()
        chunks.append(rec)
    return b"".join(chunks)
