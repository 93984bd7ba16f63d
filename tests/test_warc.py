"""WARC source tests: synthetic archives written per-test (plain +
gzip), read back through the binaryFile → mapInPandas path."""

import gzip

import pytest

from bubbles_spark import warc as bw


def _record(
    wtype="response",
    uri="http://example.com/a",
    body=b"hello",
    rec_id="<urn:uuid:1>",
    extra_headers=(),
):
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
    )
    for k, v in extra_headers:
        head += f"{k}: {v}\r\n"
    head += f"Content-Length: {len(body)}\r\n\r\n"
    return head.encode() + body + b"\r\n\r\n"


def _http(body=b"<p>hi</p>", status=200, ctype="text/html; charset=utf-8"):
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


def _write_archive(path, records, compress=False):
    data = b"".join(records)
    if compress:
        # CC-style: each record its own gzip member
        data = b"".join(gzip.compress(r) for r in records)
    path.write_bytes(data)


def test_read_warc_response_records(spark, tmp_path):
    recs = [
        _record(wtype="warcinfo", uri="", body=b"software: test"),
        _record(uri="http://a.com/", body=_http(b"<p>alpha</p>"), rec_id="<urn:1>"),
        _record(uri="http://b.com/", body=_http(b"<p>beta</p>", 404), rec_id="<urn:2>"),
    ]
    _write_archive(tmp_path / "x.warc", recs)
    df = bw.read_warc(spark, str(tmp_path))
    rows = {r["record_id"]: r for r in df.collect()}
    assert set(rows) == {"<urn:1>", "<urn:2>"}  # warcinfo filtered in-parser
    r = rows["<urn:1>"]
    assert r["target_uri"] == "http://a.com/"
    assert r["http_status"] == 200
    assert r["http_content_type"].startswith("text/html")
    assert bytes(r["payload"]) == b"<p>alpha</p>"
    assert rows["<urn:2>"]["http_status"] == 404


def test_read_warc_gzip_multimember(spark, tmp_path):
    recs = [
        _record(uri=f"http://s.com/{i}", body=_http(f"<p>{i}</p>".encode()),
                rec_id=f"<urn:{i}>")
        for i in range(5)
    ]
    _write_archive(tmp_path / "x.warc.gz", recs, compress=True)
    df = bw.read_warc(spark, str(tmp_path))
    assert df.count() == 5


def test_read_warc_all_types_and_no_http_parse(spark, tmp_path):
    recs = [
        _record(wtype="request", body=b"GET / HTTP/1.1\r\n\r\n"),
        _record(wtype="response", body=_http(b"x")),
    ]
    _write_archive(tmp_path / "x.warc", recs)
    df = bw.read_warc(spark, str(tmp_path), record_types=(), http_parse=False)
    got = {r["warc_type"]: bytes(r["payload"]) for r in df.collect()}
    assert set(got) == {"request", "response"}
    assert got["response"].startswith(b"HTTP/1.1 200")  # wire bytes kept


def test_read_warc_truncated_tail_keeps_prefix(spark, tmp_path):
    good = _record(uri="http://ok.com/", body=_http(b"fine"), rec_id="<urn:ok>")
    truncated = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Le"
    (tmp_path / "x.warc").write_bytes(good + truncated)
    df = bw.read_warc(spark, str(tmp_path))
    assert [r["record_id"] for r in df.collect()] == ["<urn:ok>"]


def test_warc_to_documents_end_to_end(spark, tmp_path):
    html = b"<html><body><h1>Title</h1><p>one &amp; two</p></body></html>"
    recs = [
        _record(uri="http://a.com/", body=_http(html), rec_id="<urn:1>"),
        _record(uri="http://b.com/img", rec_id="<urn:2>",
                body=_http(b"\x89PNG...", ctype="image/png")),
        _record(uri="http://c.com/gone", rec_id="<urn:3>",
                body=_http(b"nope", status=404)),
    ]
    _write_archive(tmp_path / "x.warc", recs)
    docs = bw.warc_to_documents(bw.read_warc(spark, str(tmp_path)))
    rows = docs.collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == "<urn:1>"
    assert rows[0]["url"] == "http://a.com/"
    assert rows[0]["text"] == "Title\none & two"


def test_parse_warc_bytes_pure():
    data = _record(body=b"abc") + _record(body=b"defg", rec_id="<urn:x>")
    recs = list(bw.parse_warc_bytes(data))
    assert [r["body"] for r in recs] == [b"abc", b"defg"]
    assert recs[1]["headers"]["warc-record-id"] == "<urn:x>"


def test_split_http_payload_non_http_passthrough():
    assert bw.split_http_payload(b"raw bytes") == (None, None, b"raw bytes")


def test_read_warc_splittable_equivalence(spark, tmp_path):
    """Byte-range splits over a plain .warc: every record lands in
    exactly ONE split regardless of where boundaries fall, and the
    result equals the task-per-file reader."""
    recs = [
        _record(
            uri=f"http://e.com/{i}",
            rec_id=f"<urn:uuid:{i}>",
            body=_http(body=b"x" * (20 + 7 * i) + str(i).encode()),
        )
        for i in range(40)
    ]
    _write_archive(tmp_path / "big.warc", recs)

    whole = sorted(
        r["record_id"] for r in bw.read_warc(spark, str(tmp_path)).collect()
    )
    # split far smaller than a record so boundaries land mid-record,
    # mid-header, and inside separators
    for split_bytes in (64, 301, 4096):
        split = sorted(
            r["record_id"]
            for r in bw.read_warc_splittable(
                spark, str(tmp_path), split_bytes=split_bytes
            ).collect()
        )
        assert split == whole, f"split_bytes={split_bytes}"


def test_read_warc_splittable_parallelism_exceeds_file_count(spark, tmp_path):
    """The round-4 scale note: plain-warc job parallelism is no longer
    capped at the archive count — one file fans out to many tasks."""
    recs = [
        _record(uri=f"http://e.com/{i}", rec_id=f"<urn:uuid:{i}>", body=_http())
        for i in range(30)
    ]
    _write_archive(tmp_path / "one.warc", recs)
    df = bw.read_warc_splittable(spark, str(tmp_path), split_bytes=256)
    n_tasks = df.rdd.getNumPartitions()
    assert n_tasks > 1  # 1 file, many byte-range tasks
    assert df.count() == 30


def test_read_warc_splittable_gzip_fallback(spark, tmp_path):
    """*.gz archives are not seekable: whole-file task, same rows."""
    recs = [
        _record(uri=f"http://e.com/{i}", rec_id=f"<urn:uuid:{i}>", body=_http())
        for i in range(5)
    ]
    _write_archive(tmp_path / "a.warc.gz", recs, compress=True)
    got = sorted(
        r["record_id"]
        for r in bw.read_warc_splittable(
            spark, str(tmp_path), split_bytes=64
        ).collect()
    )
    assert got == sorted(f"<urn:uuid:{i}>" for i in range(5))


def test_parse_warc_range_boundary_ownership():
    """A record starting exactly AT a split boundary belongs to the
    split that starts there; the preceding split stops before it."""
    import io

    recs = [
        _record(uri=f"http://e.com/{i}", rec_id=f"<urn:uuid:{i}>", body=b"b" * 10)
        for i in range(3)
    ]
    data = b"".join(recs)
    # boundary exactly at the start of record 1
    cut = len(recs[0])
    left = list(bw.parse_warc_range(io.BytesIO(data), 0, 0, cut))
    pos = max(0, cut - len(bw._ANCHOR))
    fh = io.BytesIO(data)
    fh.seek(pos)
    right = list(bw.parse_warc_range(fh, pos, cut, len(data)))
    ids = [r["headers"]["warc-record-id"] for r in left + right]
    assert ids == ["<urn:uuid:0>", "<urn:uuid:1>", "<urn:uuid:2>"]


def test_arrow_uri_translates_hadoop_s3_schemes():
    """pyarrow's FileSystem.from_uri rejects s3a:// (ArrowInvalid),
    but s3a is exactly what Hadoop listing returns — executors must
    dispatch the pyarrow spelling of the same store."""
    from bubbles_spark.warc import _arrow_uri

    assert _arrow_uri("s3a://bucket/k/file.warc") == "s3://bucket/k/file.warc"
    assert _arrow_uri("s3n://b/x") == "s3://b/x"
    assert _arrow_uri("hdfs://nn:9000/x") == "hdfs://nn:9000/x"
    assert _arrow_uri("/local/path") == "/local/path"


def test_hadoop_list_files_recursive_and_hidden_skip(spark, tmp_path):
    """Recursive listing sees files in subdirectories, skips Hadoop
    hidden entries (_SUCCESS, .crc, _temporary/...), skips empty
    files, and applies the basename glob."""
    from bubbles_spark.warc import _hadoop_list_files

    (tmp_path / "sub" / "deep").mkdir(parents=True)
    (tmp_path / "a.warc").write_bytes(b"x" * 10)
    (tmp_path / "sub" / "b.warc").write_bytes(b"y" * 20)
    (tmp_path / "sub" / "deep" / "c.warc").write_bytes(b"z" * 30)
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / ".a.warc.crc").write_bytes(b"crc")
    (tmp_path / "_temporary").mkdir()
    (tmp_path / "_temporary" / "d.warc").write_bytes(b"tmp")
    (tmp_path / "empty.warc").write_bytes(b"")
    (tmp_path / "notes.txt").write_bytes(b"not a warc")

    got = _hadoop_list_files(spark, str(tmp_path), "*.warc")
    names = sorted(p.rsplit("/", 1)[1] for p, _ in got)
    assert names == ["a.warc", "b.warc", "c.warc"]
    assert sorted(s for _, s in got) == [10, 20, 30]
    # missing path -> empty, single-file path -> that file
    assert _hadoop_list_files(spark, str(tmp_path / "nope")) == []
    single = _hadoop_list_files(spark, str(tmp_path / "a.warc"))
    assert len(single) == 1 and single[0][1] == 10
