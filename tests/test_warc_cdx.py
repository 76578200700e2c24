"""CDX index invariants: the random-access contract. For EVERY index
row, raw[offset : offset + length] must gunzip to exactly one record
whose url and payload digest match the row — i.e. the index really
supports ranged-read fetch of a single document out of an archive.
Coverage: every record of every fixture file is indexed exactly once.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import pathlib

from pdf_extractor_spark.sources.warc import (
    _iter_records_from_stream,
    iter_warc_cdx,
    iter_warc_records,
)

WARC_DIR = pathlib.Path("fixtures/golden/warc_micro")


def test_cdx_random_access_round_trip():
    total = 0
    for f in sorted(WARC_DIR.glob("*.warc.gz")):
        raw = f.read_bytes()
        rows = list(iter_warc_cdx(raw))
        # full coverage: same records, same order as the stream reader
        streamed = list(iter_warc_records(raw))
        assert [(u, t) for _, _, u, t, _ in rows] == [
            (u, t) for u, t, _ in streamed
        ]
        # members tile the file: contiguous, non-overlapping, complete
        pos = 0
        for off, ln, url, _ts, dig in rows:
            assert off == pos
            member = raw[off : off + ln]
            recs = list(
                _iter_records_from_stream(
                    io.BytesIO(gzip.decompress(member))
                )
            )
            assert len(recs) == 1
            r_url, _r_ts, r_payload = recs[0]
            assert r_url == url
            assert hashlib.md5(r_payload).hexdigest() == dig
            pos += ln
        assert pos == len(raw)
        total += len(rows)
    assert total == 200  # the full micro corpus


def test_cdx_truncated_tail_dropped():
    f = sorted(WARC_DIR.glob("*.warc.gz"))[0]
    raw = f.read_bytes()
    full = list(iter_warc_cdx(raw))
    cut = list(iter_warc_cdx(raw[: len(raw) - 7]))
    # the incomplete final member is dropped, earlier rows identical
    assert cut == full[: len(cut)]
    assert len(cut) == len(full) - 1
