"""Archive ingestion: WARC / tar / zip globs -> member-row DataFrames,
built with stdlib writers so the parsers face spec-valid input."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

from wp_motor_spark.sources import archive as ar


def _warc_record(rid: str, wtype: str, url: str, body: bytes) -> bytes:
    hdrs = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return hdrs + body + b"\r\n\r\n"


def test_read_warc_responses_and_conversions(spark, tmp_path):
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hello</html>"
    rec1 = _warc_record("a1", "response", "http://example.com/x", http)
    rec2 = _warc_record("a2", "request", "http://example.com/x", b"GET / HTTP/1.1")
    rec3 = _warc_record("a3", "conversion", "http://example.com/x", b"hello text")
    raw = rec1 + rec2 + rec3
    (tmp_path / "seg.warc").write_bytes(raw)
    # concatenated-gzip variant, as Common Crawl ships
    gz = gzip.compress(rec1) + gzip.compress(rec3)
    (tmp_path / "seg2.warc.gz").write_bytes(gz)

    out = ar.read_warc(spark, str(tmp_path / "*.warc*")).collect()
    by = {}
    for r in out:
        by.setdefault(r["archive"].split("/")[-1], []).append(r)
    plain = by["seg.warc"]
    # request records skipped; response payload has HTTP headers stripped
    assert sorted(r["warc_type"] for r in plain) == ["conversion", "response"]
    resp = next(r for r in plain if r["warc_type"] == "response")
    assert bytes(resp["content"]) == b"<html>hello</html>"
    assert resp["url"] == "http://example.com/x"
    assert len(by["seg2.warc.gz"]) == 2


def test_read_tar_and_zip_members(spark, tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in [("a/doc1.txt", b"first"), ("a/skip.bin", b"\x00"),
                           ("doc2.txt", b"second")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    (tmp_path / "docs.tar.gz").write_bytes(buf.getvalue())

    rows = ar.read_tar_members(
        spark, str(tmp_path / "*.tar.gz"), suffixes=(".txt",)
    ).collect()
    got = {r["member"]: bytes(r["content"]) for r in rows}
    assert got == {"a/doc1.txt": b"first", "doc2.txt": b"second"}
    assert all(r["size"] == len(bytes(r["content"])) for r in rows)

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("x.txt", "zipped")
        zf.writestr("y.dat", "nope")
    (tmp_path / "docs.zip").write_bytes(zbuf.getvalue())
    zrows = ar.read_zip_members(
        spark, str(tmp_path / "*.zip"), suffixes=(".txt",)
    ).collect()
    assert {r["member"]: bytes(r["content"]) for r in zrows} == {"x.txt": b"zipped"}


def test_warc_to_clean_corpus_end_to_end(spark, tmp_path):
    """The crawl-ingestion story in one flow: WARC segments -> HTML
    payloads -> JVM text extraction -> language ID -> exact dedup."""
    import gzip

    from pyspark.sql import functions as F

    from wp_motor_spark.operators import dedup, text as T

    def page(body_text: str) -> bytes:
        html = (
            "<html><head><script>track();</script></head><body>"
            f"<p>{body_text}</p></body></html>"
        ).encode()
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )

    recs = [
        _warc_record("r1", "response", "http://a.example/1",
                     page("the quick brown fox is of the essence")),
        _warc_record("r2", "response", "http://a.example/2",
                     page("der schnelle braune fuchs und das ist ein satz")),
        _warc_record("r3", "response", "http://b.example/1",
                     page("the quick  brown fox is of the essence")),  # dup
    ]
    (tmp_path / "s.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))

    docs = (
        ar.read_warc(spark, str(tmp_path / "*.warc.gz"))
        .where(F.col("warc_type") == "response")
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            "url",
            T.html_to_text(F.decode(F.col("content"), "utf-8")).alias("text"),
        )
        .withColumn("lang", T.detect_language(F.col("text")))
    )
    rows = {r["url"]: r for r in docs.collect()}
    assert rows["http://a.example/1"]["text"] == (
        "the quick brown fox is of the essence"
    )
    assert rows["http://a.example/1"]["lang"] == "en"
    assert rows["http://a.example/2"]["lang"] == "de"

    kept = dedup.exact_dedup(docs)
    assert kept.count() == 2  # whitespace-variant page deduped
    assert {r["lang"] for r in kept.collect()} == {"en", "de"}


def test_decode_text_safe_survives_malformed_bytes(spark):
    from pyspark.sql import functions as F

    from wp_motor_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "clean".encode()), (2, b"bad \xff\xfe bytes"), (3, None)],
        "i long, b binary",
    )
    out = {r["i"]: r["t"] for r in
           df.select("i", T.decode_text_safe(F.col("b")).alias("t")).collect()}
    assert out[1] == "clean"
    assert "bad" in out[2] and "bytes" in out[2]  # repaired, not raised
    assert out[3] is None
