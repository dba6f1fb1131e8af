"""Alternate ingestion sources (SURVEY §2.1 S1): crawl dumps land as JSONL
(and event logs as CSV) at least as often as parquet. These readers produce
the exact pages/events schemas the parquet path uses, so every downstream
stage is source-agnostic — byte identity across sources is test-pinned.

JSON cannot carry binary, so the JSONL interchange format stores ``html``
base64-encoded (``html_b64``); the reader decodes it back to ``binary``
JVM-side (``unbase64`` — no Python in the path). Schemas are explicit:
schema inference would re-scan the source and can drift column types.
"""

from __future__ import annotations

import hashlib
import uuid as _uuid_mod

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def _record_id(url: str, warc_ts, kind: str = "") -> bytes:
    """Deterministic WARC-Record-ID (mandatory WARC/1.0 named field,
    ADVICE r5): a urn:uuid derived from md5(kind + url + warc_ts), so
    identical inputs produce identical records — the byte-identity twins
    (driver vs distributed writer, export vs re-export) stay pinned —
    while the response/conversion/metadata records derived from the same
    page get distinct ids (``kind`` salts them; WAT's WARC-Refers-To
    recomputes the response id from the same inputs).

    ``version=3`` stamps the RFC 4122 version/variant bits over the raw
    md5 digest — exactly what ``uuid.uuid3`` does — so strict WARC/CDX
    consumers see well-formed name-based UUIDs, not arbitrary 128-bit
    values (ADVICE r6; golden archives regenerated for the byte change)."""
    ts = "" if warc_ts is None else warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    digest = hashlib.md5(f"{kind}\x00{url}\x00{ts}".encode()).digest()
    rid = _uuid_mod.UUID(bytes=digest, version=3)
    return b"<urn:uuid:" + str(rid).encode() + b">"

PAGES_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

EVENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    """Parquet-schema pages -> JSONL interchange (html base64-encoded)."""
    pages.select(
        "url",
        "warc_ts",
        F.base64("html").alias("html_b64"),
        "text",
        "lang",
    ).write.mode("overwrite").json(path)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL crawl dump -> the canonical pages DataFrame (html as binary).

    Corrupt lines surface as null columns via Spark's PERMISSIVE mode and
    flow into the extraction error-row path rather than failing the read."""
    raw = spark.read.schema(PAGES_JSONL_SCHEMA).json(path)
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV event log -> the canonical events DataFrame (explicit schema +
    header; timestamps parsed in the session timezone, which the engine
    pins to UTC)."""
    return spark.read.schema(EVENTS_CSV_SCHEMA).option("header", "true").csv(path)


# ---------------------------------------------------------------------------
# WARC (ISO 28500) — the actual Common Crawl interchange format (VERDICT r3
# next-round #3): gzip MEMBERS, one record per member, each record =
# `WARC/1.0` header block + CRLF CRLF + content block + CRLF CRLF; response
# records carry an HTTP response whose body is the page. Reference analog:
# the container dispatch of _enumerate_input (bilingual_ocr.py:253-282).
#
# Scale shape: .warc.gz is not byte-splittable, so parallelism here is
# per-FILE (binaryFile scan -> one Arrow-batched parse task per archive),
# which matches how Common Crawl ships data (~1 GB archives, tens of
# thousands of them — far more files than executors at any fleet size). The
# production refinement is offset-indexed range reads (CC's cdx index gives
# per-record member offsets), which changes the scan, not this parser.
# Corrupt members become error rows, never task failures. gzip has no
# self-synchronizing frame, so after a corrupt member the scanner
# forward-scans for the next member magic (\x1f\x8b\x08) and resumes —
# bounding the loss to the corrupt region instead of the archive's tail
# (r5, VERDICT r4 #5). A false magic inside the corrupt region just fails
# the next inflate and the scan continues; consecutive failures coalesce
# into ONE error row per corrupt region. The cdx-indexed reader remains
# the strictly better path (per-record parallelism, exact one-member loss).
# ---------------------------------------------------------------------------

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, status string"
)


def encode_warc_record(
    url: str, warc_ts, html: bytes, lang: str | None = None
) -> bytes:
    """One WARC/1.0 response record (uncompressed): WARC headers + an HTTP
    response envelope around the html bytes. ``warc_ts`` is a datetime
    (UTC). Language travels in WARC-Identified-Content-Language, the field
    Common Crawl itself uses."""
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(url, warc_ts, "response"),
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode(),
    ]
    if lang is not None:
        headers.append(b"WARC-Identified-Content-Language: " + lang.encode())
    headers += [
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def write_pages_warc(rows, path: str, records_per_file: int = 0) -> None:
    """Fixture/driver-side writer: rows of (url, warc_ts, html, lang) ->
    one or more .warc.gz files, each record its own gzip member (the spec's
    record-at-time compression, what makes cdx offset indexing possible).
    ``records_per_file`` splits the archive (0 = single file)."""
    import gzip
    import os

    os.makedirs(path, exist_ok=True)
    chunks: list[list] = []
    rows = list(rows)
    step = records_per_file or len(rows) or 1
    for i in range(0, len(rows), step):
        chunks.append(rows[i : i + step])
    for fi, chunk in enumerate(chunks):
        out = bytearray()
        for url, warc_ts, html, lang in chunk:
            rec = encode_warc_record(url, warc_ts, bytes(html), lang)
            out += gzip.compress(rec)
        with open(os.path.join(path, f"part-{fi:05d}.warc.gz"), "wb") as f:
            f.write(bytes(out))


def _walk_warc_members(blob: bytes, src: str):
    """Shared member walk for every WARC-family parser (response records,
    WET conversion records): gzip member iteration with magic-byte resync
    (one error per corrupt REGION), WARC header/field parsing, and
    content-length/truncation checks. Yields
    ``("err", status, fields_or_None)`` or ``("rec", fields, content)``;
    record-type filtering and payload interpretation belong to callers.

    Field validation runs for EVERY record type (r5 — previously foreign
    records were skipped before their Content-Length was parsed): a
    warcinfo/request record with a malformed or lying Content-Length is
    archive corruption and surfaces as a typed error row rather than
    being silently dropped."""
    import zlib

    pos = 0
    in_bad_region = False
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            rec = d.decompress(blob[pos:])
            if not d.eof:
                raise zlib.error("truncated gzip member")
        except zlib.error:
            # one error per corrupt REGION (resync candidates that fail
            # again are the same region, not new members), then forward-scan
            # for the next gzip member magic and resume
            if not in_bad_region:
                yield ("err", "error:corrupt gzip member", None)
                in_bad_region = True
            nxt = blob.find(b"\x1f\x8b\x08", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        in_bad_region = False
        consumed = len(blob) - pos - len(d.unused_data)
        pos += consumed
        sep = rec.find(b"\r\n\r\n")
        if sep < 0 or not rec.startswith(b"WARC/"):
            yield ("err", "error:malformed warc header", None)
            continue
        fields = {}
        for line in rec[:sep].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        try:
            ln = int(fields[b"content-length"])
        except (KeyError, ValueError):
            yield ("err", "error:malformed warc fields", fields)
            continue
        content = rec[sep + 4 : sep + 4 + ln]
        if len(content) < ln:
            yield ("err", "error:truncated record", fields)
            continue
        yield ("rec", fields, content)


def _rec_url(fields, src: str) -> str:
    if not fields:
        return src
    return fields.get(b"warc-target-uri", b"").decode("utf-8", "replace") or src


def _rec_ts(fields):
    from datetime import datetime

    return datetime.strptime(fields[b"warc-date"].decode(), "%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_stream(blob: bytes, src: str):
    """Yield (url, warc_ts, html, lang, status) tuples from a multi-member
    .warc.gz byte string. Non-response records are skipped; malformed
    members/records yield error rows tagged with the source file."""
    for kind, a, b in _walk_warc_members(blob, src):
        if kind == "err":
            yield (_rec_url(b, src), None, None, None, a)
            continue
        fields, content = a, b
        if fields.get(b"warc-type") != b"response":
            continue  # warcinfo/request/metadata records: not pages
        url = _rec_url(fields, src)
        try:
            ts = _rec_ts(fields)
        except (KeyError, ValueError):
            yield (url, None, None, None, "error:malformed warc fields")
            continue
        hsep = content.find(b"\r\n\r\n")
        if not content.startswith(b"HTTP/") or hsep < 0:
            yield (url, None, None, None, "error:malformed http envelope")
            continue
        lang = fields.get(b"warc-identified-content-language")
        yield (
            url,
            ts,
            content[hsep + 4 :],
            lang.decode("utf-8", "replace") if lang is not None else None,
            "ok",
        )


def warc_parse_batches(batches):
    """mapInPandas stage body shared by the batch and STREAMING WARC
    readers (review r4 — previously copy-pasted): (path, content) file
    batches -> WARC_PAGES_SCHEMA row batches."""
    import pandas as pd

    for pdf in batches:
        rows = {k: [] for k in ("url", "warc_ts", "html", "lang", "status")}
        for src, blob in zip(pdf["path"], pdf["content"]):
            for tup in _parse_warc_stream(bytes(blob), str(src)):
                for k, v in zip(rows, tup):
                    rows[k].append(v)
        yield pd.DataFrame(rows)


def read_pages_warc(spark: SparkSession, path: str) -> DataFrame:
    """.warc.gz archive dir -> canonical pages frame (url, warc_ts,
    html binary, lang, status). One parse task per archive file
    (binaryFile scan), Arrow-batched; corrupt members -> error rows."""
    files = spark.read.format("binaryFile").load(f"{path}/*.warc.gz")
    return files.select("path", "content").mapInPandas(
        warc_parse_batches, schema=WARC_PAGES_SCHEMA
    )


# ---------------------------------------------------------------------------
# WET (r5) — Common Crawl's extracted-text derivative: WARC *conversion*
# records whose payload is the plain text itself (no HTTP envelope). The
# engine's extraction output is exactly what WET carries, so exporting a
# run as .warc.wet.gz makes it a drop-in producer for WET consumers; the
# reader makes WET corpora a first-class text source. Same member-per-
# record gzip layout (cdx-indexable), same resync behavior (shared walk).
# ---------------------------------------------------------------------------

WET_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string, status string"
)


def encode_wet_record(
    url: str, warc_ts, text: str, lang: str | None = None
) -> bytes:
    """One WARC/1.0 conversion record: WARC headers + utf-8 plain text."""
    body = text.encode("utf-8")
    headers = [
        b"WARC/1.0",
        b"WARC-Type: conversion",
        b"WARC-Record-ID: " + _record_id(url, warc_ts, "conversion"),
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode(),
    ]
    if lang is not None:
        headers.append(b"WARC-Identified-Content-Language: " + lang.encode())
    headers += [
        b"Content-Type: text/plain",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def write_pages_wet(rows, path: str, records_per_file: int = 0) -> None:
    """(url, warc_ts, text, lang) rows -> .warc.wet.gz archives, one gzip
    member per conversion record (record-at-time compression, same layout
    discipline as write_pages_warc)."""
    import gzip
    import os

    os.makedirs(path, exist_ok=True)
    rows = list(rows)
    step = records_per_file or len(rows) or 1
    for fi in range(0, (len(rows) + step - 1) // step):
        chunk = rows[fi * step : (fi + 1) * step]
        out = bytearray()
        for url, warc_ts, text, lang in chunk:
            # None text -> empty body (matches the distributed writer)
            out += gzip.compress(
                encode_wet_record(url, warc_ts, "" if text is None else str(text), lang)
            )
        with open(os.path.join(path, f"part-{fi:05d}.warc.wet.gz"), "wb") as f:
            f.write(bytes(out))


def write_pages_wet_distributed(df: DataFrame, path: str) -> DataFrame:
    """Distributed WET export: each partition writes ONE .warc.wet.gz
    archive (records as individual gzip members, partition id in the file
    name for determinism) — no driver-side collect, the 100 TB shape.
    ``df``: (url, warc_ts, text, lang). Returns a (file, n_records)
    manifest frame; evaluating it performs the write."""
    import os

    os.makedirs(path, exist_ok=True)

    def write_part(batches):
        import gzip
        import os as _os
        import uuid as _uuid
        from datetime import datetime

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}.warc.wet.gz"
        # tmp name unique per ATTEMPT: a speculative/zombie attempt must
        # never interleave writes into a sibling attempt's file — each
        # writes its own tmp, the atomic rename makes the last one win
        # (attempts produce identical content)
        tmp = _os.path.join(path, f"_tmp-{_uuid.uuid4().hex[:8]}-{name}")
        n = 0
        f = None
        try:
            for pdf in batches:
                for u, ts, t, lg in zip(
                    pdf["url"], pdf["warc_ts"], pdf["text"], pdf["lang"]
                ):
                    if f is None:
                        f = open(tmp, "wb")
                    # null warc_ts (NaT through pandas): WARC-Date is
                    # mandatory — record the Unix epoch rather than
                    # failing the task or dropping the row
                    if ts is None or pd.isna(ts):
                        ts = datetime(1970, 1, 1)
                    # member-at-a-time append: constant memory per task,
                    # never the whole archive in a bytearray
                    f.write(
                        gzip.compress(
                            encode_wet_record(
                                str(u), ts, "" if t is None else str(t),
                                None if lg is None else str(lg),
                            )
                        )
                    )
                    n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            _os.rename(tmp, _os.path.join(path, name))
            yield pd.DataFrame({"file": [name], "n_records": [n]})
        else:
            yield pd.DataFrame({"file": pd.Series([], dtype="object"),
                                "n_records": pd.Series([], dtype="int64")})

    return df.select("url", "warc_ts", "text", "lang").mapInPandas(
        write_part, schema="file string, n_records long"
    )


def _parse_wet_stream(blob: bytes, src: str):
    """Yield (url, warc_ts, text, lang, status) from a .warc.wet.gz byte
    string — conversion records only (warcinfo headers are skipped); the
    shared member walk supplies resync + typed error rows."""
    for kind, a, b in _walk_warc_members(blob, src):
        if kind == "err":
            yield (_rec_url(b, src), None, None, None, a)
            continue
        fields, content = a, b
        if fields.get(b"warc-type") != b"conversion":
            continue
        url = _rec_url(fields, src)
        try:
            ts = _rec_ts(fields)
        except (KeyError, ValueError):
            yield (url, None, None, None, "error:malformed warc fields")
            continue
        lang = fields.get(b"warc-identified-content-language")
        yield (
            url,
            ts,
            content.decode("utf-8", "replace"),
            lang.decode("utf-8", "replace") if lang is not None else None,
            "ok",
        )


def wet_parse_batches(batches):
    """mapInPandas stage body shared by the batch and STREAMING WET readers
    (same discipline as warc_parse_batches — one parse loop, two scan
    shapes): (path, content) file batches -> WET_PAGES_SCHEMA row
    batches."""
    import pandas as pd

    for pdf in batches:
        rows = {k: [] for k in ("url", "warc_ts", "text", "lang", "status")}
        for src, blob in zip(pdf["path"], pdf["content"]):
            for tup in _parse_wet_stream(bytes(blob), str(src)):
                for k, v in zip(rows, tup):
                    rows[k].append(v)
        yield pd.DataFrame(rows)


def read_pages_wet(spark: SparkSession, path: str) -> DataFrame:
    """.warc.wet.gz archive dir -> (url, warc_ts, text, lang, status).
    Same scan shape as read_pages_warc: one Arrow-batched parse task per
    archive file; corrupt members -> error rows with resync."""
    files = spark.read.format("binaryFile").load(f"{path}/*.wet.gz")
    return files.select("path", "content").mapInPandas(
        wet_parse_batches, schema=WET_PAGES_SCHEMA
    )


# ---------------------------------------------------------------------------
# WAT (r6) — the metadata-JSON third member of the Common Crawl triple:
# WARC *metadata* records whose payload is a JSON envelope of per-page
# metadata (anchor outlinks, head title) — what link-graph and header
# analytics consume. Completes WARC/WET/WAT (VERDICT r5 #2). Same
# member-per-record gzip layout, same shared walk (resync + typed error
# rows for free). Reference analog: the structured-JSON sidecar role of
# _build_json_output (bilingual_ocr.py:300-305).
# ---------------------------------------------------------------------------

WAT_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, payload string, status string"
)


def build_wat_payload(url: str, warc_ts, html: bytes) -> bytes:
    """One page's WAT JSON envelope (canonical serialization: sorted keys,
    no whitespace — deterministic, so writer twins stay byte-identical).
    The DOM walk is extraction.outlinks.page_links (stdlib-parser
    tolerant); html is decoded with the pipeline's own charset sniff."""
    import json

    from extraction.html_clean import decode_html
    from extraction.outlinks import page_links

    links, title = page_links(decode_html(bytes(html)))
    hm: dict = {"Links": [{"path": "A@/href", "url": l} for l in links]}
    if title is not None:
        hm["Head"] = {"Title": title}
    env = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": url,
                "WARC-Date": warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "WARC-Type": "response",
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {"HTML-Metadata": hm}
            },
        }
    }
    return json.dumps(env, sort_keys=True, separators=(",", ":")).encode()


def encode_wat_record(url: str, warc_ts, payload: bytes) -> bytes:
    """One WARC/1.0 metadata record around a WAT JSON payload.
    WARC-Refers-To recomputes the response record's deterministic id, so
    a WAT archive written next to a WARC archive of the same pages
    cross-references it exactly."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: metadata",
        b"WARC-Record-ID: " + _record_id(url, warc_ts, "metadata"),
        b"WARC-Refers-To: " + _record_id(url, warc_ts, "response"),
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode(),
        b"Content-Type: application/json",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def write_pages_wat(rows, path: str, records_per_file: int = 0) -> None:
    """(url, warc_ts, html) rows -> .warc.wat.gz archives, one gzip member
    per metadata record (record-at-time compression, cdx-indexable — the
    write_pages_warc layout discipline)."""
    import gzip
    import os

    os.makedirs(path, exist_ok=True)
    rows = list(rows)
    step = records_per_file or len(rows) or 1
    for fi in range(0, (len(rows) + step - 1) // step):
        chunk = rows[fi * step : (fi + 1) * step]
        out = bytearray()
        for url, warc_ts, html in chunk:
            payload = build_wat_payload(url, warc_ts, html)
            out += gzip.compress(encode_wat_record(url, warc_ts, payload))
        with open(os.path.join(path, f"part-{fi:05d}.warc.wat.gz"), "wb") as f:
            f.write(bytes(out))


def write_pages_wat_distributed(df: DataFrame, path: str) -> DataFrame:
    """Distributed WAT export: each partition writes ONE .warc.wat.gz
    archive — the write_pages_wet_distributed shape (member-at-a-time
    append, attempt-unique tmp + atomic rename, no driver collect).
    ``df``: (url, warc_ts, html). Returns a (file, n_records) manifest
    frame; evaluating it performs the write."""
    import os

    os.makedirs(path, exist_ok=True)

    def write_part(batches):
        import gzip
        import os as _os
        import uuid as _uuid
        from datetime import datetime

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}.warc.wat.gz"
        tmp = _os.path.join(path, f"_tmp-{_uuid.uuid4().hex[:8]}-{name}")
        n = 0
        f = None
        try:
            for pdf in batches:
                for u, ts, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                    if f is None:
                        f = open(tmp, "wb")
                    if ts is None or pd.isna(ts):
                        ts = datetime(1970, 1, 1)  # WARC-Date is mandatory
                    payload = build_wat_payload(
                        str(u), ts, b"" if h is None else bytes(h)
                    )
                    f.write(
                        gzip.compress(encode_wat_record(str(u), ts, payload))
                    )
                    n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            _os.rename(tmp, _os.path.join(path, name))
            yield pd.DataFrame({"file": [name], "n_records": [n]})
        else:
            yield pd.DataFrame({"file": pd.Series([], dtype="object"),
                                "n_records": pd.Series([], dtype="int64")})

    return df.select("url", "warc_ts", "html").mapInPandas(
        write_part, schema="file string, n_records long"
    )


def _parse_wat_stream(blob: bytes, src: str):
    """Yield (url, warc_ts, payload, status) from a .warc.wat.gz byte
    string — metadata records only; the shared member walk supplies
    resync + typed error rows."""
    for kind, a, b in _walk_warc_members(blob, src):
        if kind == "err":
            yield (_rec_url(b, src), None, None, a)
            continue
        fields, content = a, b
        if fields.get(b"warc-type") != b"metadata":
            continue
        url = _rec_url(fields, src)
        try:
            ts = _rec_ts(fields)
        except (KeyError, ValueError):
            yield (url, None, None, "error:malformed warc fields")
            continue
        yield (url, ts, content.decode("utf-8", "replace"), "ok")


def wat_parse_batches(batches):
    """mapInPandas stage body for the WAT reader: (path, content) file
    batches -> WAT_PAGES_SCHEMA row batches (the warc/wet discipline)."""
    import pandas as pd

    for pdf in batches:
        rows = {k: [] for k in ("url", "warc_ts", "payload", "status")}
        for src, blob in zip(pdf["path"], pdf["content"]):
            for tup in _parse_wat_stream(bytes(blob), str(src)):
                for k, v in zip(rows, tup):
                    rows[k].append(v)
        yield pd.DataFrame(rows)


def read_pages_wat(spark: SparkSession, path: str) -> DataFrame:
    """.warc.wat.gz archive dir -> (url, warc_ts, payload json-string,
    status). One Arrow-batched parse task per archive file; corrupt
    members -> error rows with resync."""
    files = spark.read.format("binaryFile").load(f"{path}/*.wat.gz")
    return files.select("path", "content").mapInPandas(
        wat_parse_batches, schema=WAT_PAGES_SCHEMA
    )


def write_pages_warc_indexed(
    rows, path: str, records_per_file: int = 0
) -> None:
    """write_pages_warc + a cdx-style offset index (the Common Crawl
    pattern: cdxj sidecar files carry (file, offset, length) per record so
    readers can range-read individual gzip members). One `index.cdxj` JSONL per archive dir
    (not underscore-prefixed: Hadoop path filters treat `_*` as hidden
    metadata and would skip it)."""
    import gzip
    import json
    import os

    os.makedirs(path, exist_ok=True)
    rows = list(rows)
    step = records_per_file or len(rows) or 1
    index = []
    for fi in range(0, (len(rows) + step - 1) // step):
        chunk = rows[fi * step : (fi + 1) * step]
        name = f"part-{fi:05d}.warc.gz"
        out = bytearray()
        for url, warc_ts, html, lang in chunk:
            member = gzip.compress(encode_warc_record(url, warc_ts, bytes(html), lang))
            index.append(
                {
                    "file": name,
                    "offset": len(out),
                    "length": len(member),
                    "url": url,
                }
            )
            out += member
        with open(os.path.join(path, name), "wb") as f:
            f.write(bytes(out))
    with open(os.path.join(path, "index.cdxj"), "w") as f:
        for rec in index:
            f.write(json.dumps(rec) + "\n")


def read_pages_warc_indexed(
    spark: SparkSession, path: str, num_partitions: int | None = None
) -> DataFrame:
    """Offset-indexed WARC read — the scale path the streaming reader's
    docstring promises: parallelism is per-RECORD (index rows repartition
    across executors; each task range-reads + inflates only its members),
    not per-archive, and a corrupt member costs exactly ONE record with no
    false-magic risk (the plain scan's resync can only bound the loss to
    the corrupt region). Corrupt INDEX entries — bad offsets, missing
    archives, paths escaping the archive dir — are error rows, never task
    failures. Requires the `index.cdxj` sidecar written by
    write_pages_warc_indexed (Common Crawl ships the equivalent cdx
    index for its archives)."""
    import os

    import os as _os

    if not _os.path.exists(f"{path}/index.cdxj"):
        raise FileNotFoundError(
            f"{path}/index.cdxj not found — indexed WARC reads need the "
            "sidecar written by write_pages_warc_indexed (plain archives: "
            "use read_pages_warc)"
        )
    idx = spark.read.schema("file string, offset long, length long, url string").json(
        f"{path}/index.cdxj"
    )
    if num_partitions:
        idx = idx.repartition(num_partitions)

    base = os.path.abspath(path)

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "lang", "status")}
            handles: dict = {}

            def emit(src, status):
                for k, v in zip(rows, (src, None, None, None, status)):
                    rows[k].append(v)

            try:
                for fname, off, ln in zip(pdf["file"], pdf["offset"], pdf["length"]):
                    name = str(fname)
                    # corrupt index entries must be error rows, never task
                    # failures (ADVICE r4): a 'file' field that escapes the
                    # archive dir (../ traversal), names a missing archive,
                    # or carries an unusable offset/length (JSON nulls reach
                    # pandas as NaN; negative lengths would re-read the
                    # archive tail and silently duplicate records)
                    full = os.path.normpath(os.path.join(base, name))
                    if os.path.commonpath([base, full]) != base or full == base:
                        emit(name, "error:index path escapes archive dir")
                        continue
                    try:
                        off_i, ln_i = int(off), int(ln)
                    except (TypeError, ValueError):
                        emit(f"{name}@{off}", "error:bad index offset/length")
                        continue
                    if off_i < 0 or ln_i < 0:
                        emit(f"{name}@{off_i}", "error:bad index offset/length")
                        continue
                    try:
                        f = handles.get(name)
                        if f is None:
                            f = handles[name] = open(full, "rb")
                        f.seek(off_i)
                        blob = f.read(ln_i)
                    except OSError:
                        emit(f"{name}@{off_i}", "error:missing archive")
                        continue
                    for tup in _parse_warc_stream(blob, f"{name}@{off_i}"):
                        for k, v in zip(rows, tup):
                            rows[k].append(v)
            finally:
                for f in handles.values():
                    f.close()
            yield pd.DataFrame(rows)

    return idx.select("file", "offset", "length").mapInPandas(
        fetch, schema=WARC_PAGES_SCHEMA
    )
