"""WARC ingestion — the first mile of a Common-Crawl-scale pipeline.

The engine's input contract is a table of ``(url, warc_ts, html, …)``
pages; real crawls deliver WARC files (ISO 28500: a sequence of
records, each a header block terminated by a blank line, a
Content-Length-delimited content block, then a CRLF CRLF separator;
Common Crawl ships one gzip MEMBER per record, concatenated).  This
module turns a directory of ``*.warc`` / ``*.warc.gz`` files into
that table with zero per-row Python: one vectorized ``mapInPandas``
pass whose unit of work is the FILE, mirroring how WARC is processed
everywhere (gzip members are not block-splittable, so the file is
the natural split — Common Crawl sizes its .warc.gz at ~1 GB
precisely so that one file ≈ one task).

Scale shape: ``binaryFile`` lists the input tree distributedly; each
task parses its own files.  Peak memory is bounded by ONE FILE (the
``binaryFile`` source materializes each file as a single row value
before parsing starts — which is why crawls size .warc.gz at ~1 GB);
parsing WITHIN the file is streaming (plain WARC walks records in
place, gzipped files decompress member-by-member over zero-copy
memoryview slices).  Everything downstream is the ordinary page
table.  There is no shuffle anywhere — the output partitioning is
the input file split.

Parity note: the reference engine has no crawl ingestion at all (its
readers start at annotation TSVs, reference tsv.py); WARC handling
here follows the public spec, not any reference code.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "parse_warc", "build_warc", "warc_record"]

WARC_SCHEMA = ("url string, warc_ts timestamp, html binary, "
               "record_type string, http_status int, "
               "content_type string, warc_file string")

_CRLF = b"\r\n"


def warc_record(url: str, date: str, payload: bytes,
                record_type: str = "response",
                http_status: int = 200,
                content_type: str = "text/html") -> bytes:
    """Serialize ONE WARC record (response records wrap the payload
    in an HTTP/1.1 response block, as crawlers store them)."""
    if record_type == "response":
        http = (f"HTTP/1.1 {http_status} OK\r\n"
                f"Content-Type: {content_type}\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "\r\n").encode("ascii") + payload
        block_type = "application/http; msgtype=response"
    else:
        http = payload
        block_type = content_type
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {block_type}\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode("ascii")
    return head + http + _CRLF + _CRLF


def build_warc(records: Iterable[tuple], gzip_members: bool = False,
               ) -> bytes:
    """Records (url, date, payload[, type, status, ctype]) → one WARC
    blob; ``gzip_members=True`` compresses each record as its own
    gzip member (the Common Crawl layout)."""
    out = io.BytesIO()
    for rec in records:
        raw = warc_record(*rec)
        if gzip_members:
            raw = gzip.compress(raw, mtime=0)
        out.write(raw)
    return out.getvalue()


def _split_members(blob: bytes) -> Iterator[bytes]:
    """Concatenated gzip members → decompressed chunks (one per
    member), memory-bounded by a member, not the file.  A truncated
    or corrupt trailing member ends the scan instead of raising
    (gzip.GzipFile would decompress ALL members in one read and lose
    everything on a bad tail — zlib's decompressobj exposes the
    member boundary via eof/unused_data).

    The remaining-buffer slice is a zero-copy ``memoryview``: a
    ``bytes`` slice per member would memcpy the whole tail each time,
    O(members × filesize) on Common-Crawl-shaped files (~1 GB, tens
    of thousands of members)."""
    import zlib

    mv = memoryview(blob)
    pos, n = 0, len(mv)
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            chunk = d.decompress(mv[pos:]) + d.flush()
        except zlib.error:
            return
        if not d.eof:
            return  # truncated trailing member
        yield chunk
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response block → (status, content-type, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(_CRLF)
    status = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def _skip_marker(reason: str, skipped: int, warc_file: str) -> dict:
    """Marker row for a skipped byte range — loss must be observable
    (the repo's 'no silent caps' convention): filter it out with the
    default ``responses_only=True``, or count it for crawl QA."""
    return {
        "url": None,
        "warc_ts": None,
        "html": b"",
        "record_type": "parse_error",
        "http_status": None,
        "content_type": ("x-neleval/parse-error; reason=%s; "
                         "skipped_bytes=%d" % (reason, skipped)),
        "warc_file": warc_file,
    }


def parse_warc(blob: bytes, warc_file: str = "") -> Iterator[dict]:
    """One WARC blob (plain or member-gzipped) → record dicts.

    Malformed bytes never kill the task — a 10^12-page crawl always
    contains truncated or corrupt files — and never vanish silently:
    the parser RESYNCS to the next plausible record boundary
    (``\\r\\n\\r\\nWARC/``) and emits one ``record_type='parse_error'``
    marker row per skipped gap (reason + byte count in
    ``content_type``), so downstream QA can count loss per file.
    CRLF-only remnants (framing slack) are skipped without a marker."""
    if blob[:2] == b"\x1f\x8b":
        chunks: Iterable[bytes] = _split_members(blob)
    else:
        chunks = (blob,)
    for chunk in chunks:
        pos = 0
        n = len(chunk)
        while pos < n:
            bad = None  # (reason, resync-search-start)
            if not chunk.startswith(b"WARC/", pos):
                bad = ("desync", pos)
            else:
                hdr_end = chunk.find(b"\r\n\r\n", pos)
                if hdr_end < 0:
                    bad = ("unterminated_header", pos + 5)
                else:
                    headers: dict[str, str] = {}
                    for ln in chunk[pos:hdr_end].split(_CRLF)[1:]:
                        k, _, v = ln.partition(b":")
                        headers[k.strip().lower().decode("latin-1")] = \
                            v.strip().decode("latin-1")
                    try:
                        clen = int(headers.get("content-length", ""))
                    except ValueError:
                        bad = ("bad_content_length", hdr_end)
                    else:
                        if hdr_end + 4 + clen > n:
                            bad = ("truncated_record", hdr_end)
            if bad is not None:
                reason, search_from = bad
                nxt = chunk.find(b"\r\n\r\nWARC/", search_from)
                end = n if nxt < 0 else nxt + 4
                gap = bytes(chunk[pos:end])
                # pure CRLF remnants are framing slack, not data loss
                if gap.replace(_CRLF, b"").replace(b"\r", b"") \
                        .replace(b"\n", b""):
                    yield _skip_marker(reason, end - pos, warc_file)
                pos = end
                continue
            body_start = hdr_end + 4
            block = chunk[body_start:body_start + clen]
            rtype = headers.get("warc-type", "")
            status = None
            ctype = headers.get("content-type")
            html = block
            if rtype in ("response", "revisit") and \
                    (ctype or "").startswith("application/http"):
                status, ctype, html = _parse_http(block)
            yield {
                "url": headers.get("warc-target-uri"),
                "warc_ts": headers.get("warc-date"),
                "html": html,
                "record_type": rtype,
                "http_status": status,
                "content_type": ctype,
                "warc_file": warc_file,
            }
            pos = body_start + clen
            # skip the CRLF CRLF record separator (tolerate absence)
            while chunk.startswith(_CRLF, pos):
                pos += 2


def read_warc(spark: SparkSession, path: str,
              responses_only: bool = True) -> DataFrame:
    """Directory/glob of ``*.warc[.gz]`` files → page DataFrame.

    ``binaryFile`` distributes the listing; one vectorized
    ``mapInPandas`` parses each task's files (the file is the unit of
    parallelism — gzip members are not splittable, which is why
    crawls ship ~1 GB files).  ``responses_only`` keeps HTTP-response
    records (the pages), dropping request/metadata/warcinfo records
    at the source."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for content, fname in zip(pdf["content"], pdf["path"]):
                rows.extend(parse_warc(bytes(content), fname))
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html",
                               "record_type", "http_status",
                               "content_type", "warc_file"])
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], errors="coerce", utc=True)
                out["http_status"] = out["http_status"].astype("Int64")
            yield out

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    df = files.mapInPandas(gen, schema=WARC_SCHEMA)
    if responses_only:
        from pyspark.sql import functions as F
        df = df.where(F.col("record_type") == "response")
    return df
