"""Corpus archive ingestion: WARC (Common Crawl), tar, and zip readers.

Training corpora ship as archives — Common Crawl segments are gzipped
WARC files; curated dumps arrive as tars/zips of documents. These
readers turn a glob of archives into a DataFrame of member documents
WITHOUT any driver-side extraction:

- `spark.read.format("binaryFile")` distributes whole archives to
  executors (one task per archive — archives are the parallelism unit,
  matching how Common Crawl shards its segments);
- an Arrow-batched mapInPandas pass parses each archive with the
  stdlib (warc: manual record framing; tar/zip: tarfile/zipfile over
  BytesIO) and explodes members into rows.

At 100 TB: a segment-per-task layout is exactly how CC processing jobs
run; skew comes only from archive-size variance (repartition the file
listing by size if needed). Member text never aggregates on the driver.

WARC subset: WARC/1.0 and 1.1, gzip members or plain files, `response`
and `conversion` record types surfaced (request/metadata skipped);
HTTP headers are stripped from response payloads. That covers the .warc
/ .warc.gz and .wet (extracted-text "conversion") files CC publishes.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WARC_OUT = "archive string, record_id string, warc_type string, url string, date string, content binary"
_MEMBER_OUT = "archive string, member string, size long, content binary"


def _parse_warc(buf: bytes, name: str):
    """Yield (record_id, type, url, date, payload) for response/conversion
    records. Handles concatenated-gzip .warc.gz (each record its own gzip
    member) by decompressing the whole stream first."""
    if name.endswith(".gz") or buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not buf[pos : pos + 5] == b"WARC/":
            # tolerate trailing junk
            nxt = buf.find(b"WARC/", pos)
            if nxt == -1:
                break
            pos = nxt
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
        length = int(headers.get("content-length", "0"))
        body = buf[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        wtype = headers.get("warc-type", "")
        if wtype in ("response", "conversion"):
            if wtype == "response" and body[:5] in (b"HTTP/",):
                # strip the HTTP header block from response payloads
                he = body.find(b"\r\n\r\n")
                if he != -1:
                    body = body[he + 4 :]
            yield (
                headers.get("warc-record-id", ""),
                wtype,
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                body,
            )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame of (archive, record_id, warc_type, url, date, content)
    from a glob of .warc / .warc.gz / .wet(.gz) files."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                for rid, wtype, url, date, body in _parse_warc(bytes(c), p):
                    rows.append((p, rid, wtype, url, date, body))
            yield pd.DataFrame(
                rows,
                columns=[
                    "archive", "record_id", "warc_type", "url", "date", "content",
                ],
            )

    return files.mapInPandas(parse, schema=_WARC_OUT)


def read_tar_members(
    spark: SparkSession, path: str, suffixes: tuple[str, ...] = ()
) -> DataFrame:
    """DataFrame of (archive, member, size, content) from .tar / .tar.gz
    globs; `suffixes` filters member names (e.g. ('.txt', '.json'))."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(c))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        if suffixes and not m.name.endswith(suffixes):
                            continue
                        f = tf.extractfile(m)
                        rows.append((p, m.name, m.size, f.read() if f else b""))
            yield pd.DataFrame(
                rows, columns=["archive", "member", "size", "content"]
            )

    return files.mapInPandas(parse, schema=_MEMBER_OUT)


def read_zip_members(
    spark: SparkSession, path: str, suffixes: tuple[str, ...] = ()
) -> DataFrame:
    """DataFrame of (archive, member, size, content) from .zip globs."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(c))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if suffixes and not info.filename.endswith(suffixes):
                            continue
                        rows.append(
                            (p, info.filename, info.file_size, zf.read(info))
                        )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "size", "content"]
            )

    return files.mapInPandas(parse, schema=_MEMBER_OUT)
