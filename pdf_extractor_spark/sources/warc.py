"""WARC source: read Common-Crawl-style WARC/1.0 archives into the
`pages` table shape.

Format (ISO 28500, the subset Common Crawl emits): a .warc.gz file is a
concatenation of per-record gzip members; each record is

    WARC/1.0\\r\\n
    <warc headers>\\r\\n
    \\r\\n
    <Content-Length bytes of block>\\r\\n\\r\\n

For ``WARC-Type: response`` records the block is an HTTP/1.1 response;
the page payload follows the first blank line of the HTTP message.

Distribution model: .warc.gz members are not block-splittable, so the
parallel unit is the FILE (Common Crawl ships ~1 GB files in listings of
tens of thousands — ample parallelism at 100 TB). The reader is
``binaryFile`` scan → ``mapInArrow`` over whole files: each task
stream-decompresses its files record by record; nothing is ever fully
materialized except one record's payload at a time.

The reference ingested one uploaded document per HTTP request
(/root/reference/main.py:24-31); this is that source boundary re-expressed
as the crawl-archive connector the input_hint's table would be loaded
from. The writer exists so the format is closed under test (same policy
as the PDF writer, SURVEY.md §7 M0 scope control).
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
import pathlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

_CRLF = b"\r\n"


# --- record-level codec (pure python, unit-testable) -----------------------


def _warc_record(url: str, ts: dt.datetime, payload: bytes,
                 content_type: str) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
        + payload
    )
    rec_id = hashlib.sha1(url.encode("utf-8")).hexdigest()
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
        + f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n".encode()
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"\r\n"
    )
    return headers + http + b"\r\n\r\n"


def write_warc(
    out_path: str | pathlib.Path,
    rows: list,  # objects with .url, .warc_ts, .html
) -> int:
    """Write rows as a .warc.gz of per-record gzip members (the Common
    Crawl layout — members concatenate into one valid gzip stream)."""
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(out_path, "wb") as f:
        for r in rows:
            ctype = (
                "application/pdf"
                if (r.html or b"").startswith(b"%PDF-")
                else "text/html"
            )
            rec = _warc_record(r.url, r.warc_ts, r.html or b"", ctype)
            f.write(gzip.compress(rec))
            n += 1
    return n


def write_warc_dir(
    out_dir: str | pathlib.Path, rows: list, n_files: int
) -> int:
    """Split rows across ``n_files`` .warc.gz archives (file = the WARC
    parallel unit). The single shared chunking/naming rule for fixtures
    and bench corpora."""
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    per = max(1, (len(rows) + n_files - 1) // n_files)
    n = 0
    for i in range(0, len(rows), per):
        n += write_warc(
            out_dir / f"part-{i // per:05d}.warc.gz", rows[i : i + per]
        )
    return n


def _parse_warc_date(s: str) -> dt.datetime:
    """Lenient WARC-Date: real crawls emit fractional seconds and numeric
    timezone offsets alongside the canonical `%Y-%m-%dT%H:%M:%SZ`. An
    unparseable date degrades to the epoch instead of failing the record
    (O23 containment — one bad header must never kill a whole file's
    Spark task)."""
    s = s.strip()
    if s.endswith(("Z", "z")):
        s = s[:-1] + "+00:00"
    try:
        d = dt.datetime.fromisoformat(s)
    except ValueError:
        return dt.datetime(1970, 1, 1)
    if d.tzinfo is not None:
        d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return d


def iter_warc_records(
    raw: bytes,
) -> Iterator[tuple[str, dt.datetime, bytes]]:
    """Yield (url, ts, payload) for each response record of a .warc.gz
    byte string. Streams one decompressed record at a time. Malformed
    records are skipped (never raised): the parallel unit is the file, so
    a per-record exception would fail the whole task — the same per-row
    error containment (O23) the extraction stage applies."""
    stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    yield from _iter_records_from_stream(stream)


def _iter_records_from_stream(
    stream,
) -> Iterator[tuple[str, dt.datetime, bytes]]:
    """The record parser over any file-like of DECOMPRESSED warc bytes
    (shared by the gzip-stream reader above and the per-member CDX
    indexer below)."""
    while True:
        try:
            version = stream.readline()
        except Exception:  # noqa: BLE001 — truncated/corrupt gzip stream
            return  # keep the records already yielded, drop the tail
        if not version:
            return
        if not version.startswith(b"WARC/"):
            continue  # skip padding between members
        try:
            headers: dict[bytes, bytes] = {}
            while True:
                line = stream.readline()
                if line in (_CRLF, b"", b"\n"):
                    break
                k, _, v = line.rstrip(b"\r\n").partition(b":")
                headers[k.strip().lower()] = v.strip()
            try:
                length = int(headers.get(b"content-length", b"0"))
            except ValueError:
                length = 0
            block = stream.read(max(length, 0))
            stream.readline()  # record-trailing CRLF
            stream.readline()  # blank line
            if headers.get(b"warc-type") != b"response":
                continue
            url = headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace"
            )
            ts = _parse_warc_date(
                headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode(
                    "ascii", "replace"
                )
            )
            # payload = HTTP body after the first blank line of the message
            sep = block.find(b"\r\n\r\n")
            payload = block[sep + 4 :] if sep != -1 else b""
        except Exception:  # noqa: BLE001 — skip the record, keep the file
            continue
        yield url, ts, payload




def iter_warc_cdx(
    raw: bytes,
) -> Iterator[tuple[int, int, str, dt.datetime, str]]:
    """CDX index rows — (offset, compressed_length, url, ts,
    payload_md5) — for each response record of a .warc.gz byte string.

    Offsets/lengths address the per-record GZIP MEMBERS (the Common
    Crawl layout this module's writer emits): raw[offset : offset +
    length] gunzips to exactly one record, which is what makes the
    index a RANDOM-ACCESS structure — a fetcher can pull one document
    from a 1 GB archive with a ranged read (tests/test_warc_cdx.py
    proves the seek round-trip). Member boundaries come from
    zlib.decompressobj (eof + unused_data), never from scanning for
    gzip magic, which can occur inside compressed data. Truncated or
    corrupt tails are dropped, matching iter_warc_records."""
    import zlib

    mv = memoryview(raw)
    pos, n = 0, len(raw)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(mv[pos:])
            data += d.flush()
        except zlib.error:
            return
        if not d.eof:
            return  # truncated final member
        comp_len = (n - pos) - len(d.unused_data)
        for url, ts, payload in _iter_records_from_stream(
            io.BytesIO(data)
        ):
            yield (
                pos,
                comp_len,
                url,
                ts,
                hashlib.md5(payload).hexdigest(),
            )
        pos += comp_len


# --- Spark reader -----------------------------------------------------------


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """`path` (a file, directory, or glob of .warc.gz) → pages DataFrame.

    binaryFile scan gives (path, …, content) rows — one file per row; the
    mapInArrow stage fans each file out into its records. text/lang are
    null (as-crawled columns the archive does not carry)."""

    def parse_files(batches):
        import pyarrow as pa

        for batch in batches:
            contents = batch.column("content")
            urls: list[str] = []
            tss: list[dt.datetime] = []
            payloads: list[bytes] = []
            for i in range(batch.num_rows):
                # a truncated/corrupt gzip stream raises mid-iteration:
                # keep the records already parsed, drop the rest of that
                # file only — never the task
                try:
                    for url, ts, payload in iter_warc_records(
                        contents[i].as_py()
                    ):
                        urls.append(url)
                        tss.append(ts)
                        payloads.append(payload)
                except Exception:  # noqa: BLE001
                    pass
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(payloads, pa.binary()),
                    pa.array([None] * len(urls), pa.string()),
                    pa.array([None] * len(urls), pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInArrow(parse_files, schema=PAGES_SCHEMA)
