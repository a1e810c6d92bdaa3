"""WARC ingestion (sources/warc.py): file-based reader, gzip members,
truncation tolerance."""

import gzip

from neleval_spark.sources.warc import (
    build_warc, parse_warc, read_warc, warc_record)

RECS = [
    ("http://a.example/1", "2026-01-02T03:04:05Z", b"<html>one</html>"),
    ("http://b.example/2", "2026-01-02T03:04:06Z",
     "café — two".encode("utf-8")),
    ("http://c.example/3", "2026-01-02T03:04:07Z", b""),
]


def test_roundtrip_plain():
    got = list(parse_warc(build_warc(RECS)))
    assert [(r["url"], r["warc_ts"], r["html"]) for r in got] == RECS
    assert all(r["record_type"] == "response" for r in got)
    assert all(r["http_status"] == 200 for r in got)
    assert got[0]["content_type"] == "text/html"


def test_roundtrip_gzip_members():
    blob = build_warc(RECS, gzip_members=True)
    assert blob[:2] == b"\x1f\x8b"
    got = list(parse_warc(blob))
    assert [(r["url"], r["html"]) for r in got] == \
        [(u, p) for u, _, p in RECS]


def test_truncated_tail_keeps_prefix():
    blob = build_warc(RECS)
    for cut in (1, 7, 40):
        got = list(parse_warc(blob[:-cut]))
        # last record is damaged; earlier ones must survive
        assert len(got) >= 2
        assert got[0]["url"] == RECS[0][0]
    # truncated trailing gzip member: earlier members survive
    gz = build_warc(RECS, gzip_members=True)
    got = list(parse_warc(gz[:-5]))
    assert len(got) == 2


def test_non_response_records_and_binary_payload():
    # warcinfo record has no HTTP wrapping; payload passes through
    info = warc_record("-", "2026-01-01T00:00:00Z",
                       b"software: test\r\n", record_type="warcinfo",
                       content_type="application/warc-fields")
    req = warc_record("http://a.example/1", "2026-01-01T00:00:00Z",
                      b"GET / HTTP/1.1\r\n\r\n", record_type="request",
                      content_type="application/http; msgtype=request")
    body = bytes(range(256))  # binary-safe content-length framing
    resp = warc_record("http://bin.example/x",
                       "2026-01-01T00:00:01Z", body,
                       content_type="application/octet-stream")
    got = list(parse_warc(info + req + resp))
    assert [r["record_type"] for r in got] == \
        ["warcinfo", "request", "response"]
    assert got[2]["html"] == body
    assert got[2]["content_type"] == "application/octet-stream"


def test_read_warc_binaryfile(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(build_warc(RECS[:2]))
    (tmp_path / "b.warc.gz").write_bytes(
        build_warc(RECS[2:], gzip_members=True))
    df = read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {u for u, _, _ in RECS}
    r = rows["http://b.example/2"]
    assert bytes(r["html"]).decode("utf-8") == "café — two"
    assert r["warc_ts"].year == 2026 and r["http_status"] == 200
    assert r["warc_file"].endswith("a.warc")
    # responses_only drops non-page records
    extra = tmp_path / "c.warc"
    extra.write_bytes(warc_record(
        "-", "2026-01-01T00:00:00Z", b"x", record_type="warcinfo",
        content_type="application/warc-fields"))
    assert read_warc(spark, str(tmp_path)).count() == 3
    assert read_warc(spark, str(tmp_path),
                     responses_only=False).count() == 4


def test_stdlib_gzip_readable():
    # members written with mtime=0 are plain concatenated gzip:
    # external tools (zcat) must see the same bytes
    blob = build_warc(RECS, gzip_members=True)
    assert gzip.decompress(blob) == build_warc(RECS)


def test_resync_recovers_after_corrupt_record():
    """A corrupt record in the MIDDLE must not drop the rest of the
    file: the parser resyncs at the next record boundary and emits a
    parse_error marker for the gap."""
    good = warc_record(*RECS[0]) + warc_record(*RECS[2])
    corrupt = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"Content-Length: NOT_A_NUMBER\r\n\r\n"
               b"garbage body without framing\r\n\r\n")
    blob = warc_record(*RECS[0]) + corrupt + warc_record(*RECS[2])
    got = list(parse_warc(blob))
    recs = [r for r in got if r["record_type"] != "parse_error"]
    errs = [r for r in got if r["record_type"] == "parse_error"]
    assert [(r["url"], r["html"]) for r in recs] == \
        [(RECS[0][0], RECS[0][2]), (RECS[2][0], RECS[2][2])]
    assert len(errs) == 1
    assert "reason=bad_content_length" in errs[0]["content_type"]
    assert "skipped_bytes=" in errs[0]["content_type"]
    # sanity: the same two good records parse identically standalone
    assert [(r["url"], r["html"]) for r in parse_warc(good)] == \
        [(r["url"], r["html"]) for r in recs]
    # trailing non-CRLF junk is observable, CRLF slack is not
    assert [r["record_type"] for r in
            parse_warc(warc_record(*RECS[0]) + b"junk-tail")][-1] == \
        "parse_error"
    assert [r["record_type"] for r in
            parse_warc(warc_record(*RECS[0]) + b"\r\n")] == ["response"]


def test_roundtrip_fuzz_payloads():
    """Property: Content-Length framing makes parse∘serialize the
    identity for ARBITRARY payload bytes — including payloads that
    contain CRLF CRLF, 'WARC/1.0', or gzip magic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    adversarial = [b"\r\n\r\n", b"WARC/1.0\r\n", b"\x1f\x8b",
                   b"Content-Length: 0\r\n\r\n"]

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.one_of(st.binary(max_size=200), st.sampled_from(adversarial)),
        min_size=1, max_size=8))
    def prop(payloads):
        recs = [(f"http://f/{k}", "2026-01-01T00:00:00Z", p)
                for k, p in enumerate(payloads)]
        for gz in (False, True):
            got = list(parse_warc(build_warc(recs, gzip_members=gz)))
            assert [(r["url"], r["html"]) for r in got] == \
                [(u, p) for u, _, p in recs]

    prop()
