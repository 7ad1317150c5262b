"""Pure-stdlib WARC (ISO 28500) writer + independent record walker.

WARC is THE container a web-crawl corpus pipeline actually ingests
(Common Crawl ships per-record-gzipped WARC multistreams), and walking
it needs no codec library: records are Content-Length-framed header
blocks, and the compression is per-record gzip members concatenated —
stdlib ``gzip`` decompresses the whole multistream.

Writer and parser are independent implementations of the public spec:

- ``make_warc`` assembles a warcinfo record plus request/response pairs
  with full HTTP/1.1 message blocks inside the response payloads;
  ``make_warc_gz`` gzips EACH RECORD as its own member and concatenates
  (the Common Crawl layout, so any record range is independently
  decompressible at a byte offset — the property that makes WARC
  splittable at scale).
- ``parse_warc`` walks Content-Length framing, parses WARC headers
  case-insensitively, validates the version line and the inter-record
  CRLF CRLF, and parses the embedded HTTP status line + headers of
  response records, separating HTTP header bytes from the true payload.
"""

from __future__ import annotations

import gzip
import io

_CRLF = b"\r\n"


def warc_plan(seed: int) -> list[dict]:
    """Closed-form per-response plan shared with the DuckDB oracle."""
    n_resp = 3 + seed % 4
    plan = []
    for i in range(n_resp):
        plan.append(
            {
                "status": 200 if (seed + i) % 5 else 404,
                "mime": "text/plain" if (seed + i) % 3 == 0 else "text/html",
                "body_len": 50 + (seed * 7 + i * 13) % 100,
            }
        )
    return plan


def _body_byte(seed: int, i: int, j: int) -> int:
    return (seed + i * 31 + j * 7) % 256


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    out = bytearray(b"WARC/1.0\r\n")
    for k, v in headers:
        out += f"{k}: {v}".encode() + _CRLF
    out += f"Content-Length: {len(payload)}".encode() + _CRLF
    out += _CRLF + payload + _CRLF + _CRLF
    return bytes(out)


def make_warc_records(seed: int) -> list[bytes]:
    """The individual records of make_warc (boundaries by construction,
    so the gzip writer never has to re-scan payload bytes for them)."""
    records = []
    info = b"software: spark-graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
    records.append(_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<urn:uuid:{seed:08d}-0000>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("Content-Type", "application/warc-fields"),
        ],
        info,
    ))
    for i, p in enumerate(warc_plan(seed)):
        uri = f"http://site{seed % 97}.example/p{i}"
        req = (
            f"GET /p{i} HTTP/1.1\r\nHost: site{seed % 97}.example\r\n\r\n"
        ).encode()
        records.append(_record(
            [
                ("WARC-Type", "request"),
                ("WARC-Record-ID", f"<urn:uuid:{seed:08d}-{2*i+1:04d}>"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("WARC-Target-URI", uri),
                ("Content-Type", "application/http;msgtype=request"),
            ],
            req,
        ))
        body = bytes(_body_byte(seed, i, j) for j in range(p["body_len"]))
        reason = "OK" if p["status"] == 200 else "Not Found"
        http = (
            f"HTTP/1.1 {p['status']} {reason}\r\n"
            f"Content-Type: {p['mime']}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        records.append(_record(
            [
                ("WARC-Type", "response"),
                ("WARC-Record-ID", f"<urn:uuid:{seed:08d}-{2*i+2:04d}>"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("WARC-Target-URI", uri),
                ("Content-Type", "application/http;msgtype=response"),
            ],
            http,
        ))
    return records


def make_warc(seed: int) -> bytes:
    """warcinfo + (request, response) pairs; every byte deterministic."""
    return b"".join(make_warc_records(seed))


def make_warc_gz(seed: int) -> bytes:
    """Per-record gzip members, concatenated — the Common Crawl layout.
    Record boundaries come from construction (make_warc_records), never
    from scanning payload bytes for a delimiter that could legitimately
    occur inside a body."""
    return b"".join(
        gzip.compress(rec, compresslevel=1, mtime=0)
        for rec in make_warc_records(seed)
    )


def parse_warc(data: bytes):
    """Record walk. Accepts plain, gzip-multistream, or zstd-frame
    (.warc.zst, decoded by the in-repo RFC 8878 implementation) input.
    Returns a stats dict the oracle recomputes analytically. WARC/0.x
    files and records with chunked HTTP bodies raise
    NotImplementedError."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    elif data[:4] == b"\x28\xb5\x2f\xfd":
        from ..sources.zstd_lite import decompress as _zstd

        data = _zstd(data)
    pos = 0
    stats = {
        "n_records": 0,
        "n_responses": 0,
        "n_requests": 0,
        "http_200": 0,
        "html_responses": 0,
        "total_payload_bytes": 0,
        "payload_checksum": 0,
    }
    while pos < len(data):
        eol = data.index(_CRLF, pos)
        version = data[pos:eol]
        if version == b"WARC/0.18":
            raise NotImplementedError("pre-1.0 WARC")
        if not version.startswith(b"WARC/1."):
            raise ValueError(f"bad WARC version line {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while data[pos : pos + 2] != _CRLF:
            eol = data.index(_CRLF, pos)
            k, _, v = data[pos:eol].decode("utf-8").partition(":")
            headers[k.strip().lower()] = v.strip()
            pos = eol + 2
        pos += 2
        clen = int(headers["content-length"])
        payload = data[pos : pos + clen]
        if data[pos + clen : pos + clen + 4] != _CRLF * 2:
            raise ValueError("WARC record not terminated by CRLFCRLF")
        pos += clen + 4
        stats["n_records"] += 1
        wtype = headers.get("warc-type", "")
        if wtype == "request":
            stats["n_requests"] += 1
        elif wtype == "response":
            stats["n_responses"] += 1
            # embedded HTTP/1.1 message: status line, headers, body
            heol = payload.index(_CRLF)
            parts = payload[:heol].decode().split(" ", 2)
            status = int(parts[1])
            hdr_end = payload.index(_CRLF * 2) + 4
            http_headers: dict[str, str] = {}
            for line in payload[heol + 2 : hdr_end - 4].split(_CRLF):
                if not line:
                    continue
                k, _, v = line.decode().partition(":")
                http_headers[k.strip().lower()] = v.strip()
            if http_headers.get("transfer-encoding") == "chunked":
                raise NotImplementedError("chunked HTTP body")
            body = payload[hdr_end:]
            if status == 200:
                stats["http_200"] += 1
            if http_headers.get("content-type", "").startswith("text/html"):
                stats["html_responses"] += 1
            stats["total_payload_bytes"] += len(body)
            stats["payload_checksum"] += sum(body)
    return stats
