"""WARC (Web ARChive, ISO 28500) source: writer, parser, fleet reader.

The crawl-prep side of a training-data pipeline starts from WARC files
(Common Crawl publishes ~1 GB segments; in-house crawlers emit the same
container). This module owns the format with the stdlib only:

- :func:`make_warc_bytes` / :func:`write_warc_files` build valid WARC
  1.0 files (used by fixtures and tests — and as a sink for re-sharding
  jobs);
- :func:`parse_warc` is the record iterator (Content-Length framed, so
  bodies may contain CRLFs, record separators, or even literal
  ``WARC/1.0`` markers without confusing it);
- :func:`read_warc` is the distributed fleet read: ``binaryFile`` scans
  the archives in parallel and an Arrow-batched ``mapInPandas`` runs
  the parser per file on executors — the driver never touches archive
  bytes (the same placement as ``workbook.read_xlsx_many``).

Scale note (100 TB): a plain ``.warc`` is record-framed, not block-
splittable, so the natural partition grain is the FILE — exactly how
Common Crawl shards its corpus (tens of thousands of ~1 GB segments),
which gives a 1000-executor cluster ample parallelism without a custom
input format. Gzipped ``.warc.gz`` (one gzip member per record) would
be decoded the same way per file; member-level splitting is a possible
future refinement, not a correctness requirement.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

# Reason phrases for the statuses fixtures/tests emit; anything else
# gets a generic phrase (the phrase is cosmetic — parsers key on code).
_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found", 500: "Internal Server Error"}


def _http_block(status: int, content_type: str, body: bytes) -> bytes:
    """A minimal valid HTTP/1.1 response (the payload of a WARC
    ``response`` record per the spec's ``application/http`` rule)."""
    reason = _REASONS.get(status, "Status")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8")
    return head + body


def make_warc_bytes(records: Iterable[dict], *, warcinfo: str | None = None) -> bytes:
    """Serialize records into one WARC 1.0 file.

    Each record dict: ``uri`` (str), ``body`` (bytes), and optionally
    ``status`` (int, default 200), ``content_type`` (default
    ``text/html``), ``date`` (ISO string, default a fixed epoch so
    fixtures stay byte-deterministic), ``record_id`` (default derived
    from the uri). A leading ``warcinfo`` record is emitted when
    requested — real crawlers always write one, so the parser's
    skip-non-response path stays exercised.
    """
    out = bytearray()

    def _record(rtype: str, headers: list[tuple[str, str]], block: bytes) -> None:
        out.extend(b"WARC/1.0" + _CRLF)
        out.extend(f"WARC-Type: {rtype}\r\n".encode("utf-8"))
        for k, v in headers:
            out.extend(f"{k}: {v}\r\n".encode("utf-8"))
        out.extend(f"Content-Length: {len(block)}\r\n".encode("utf-8"))
        out.extend(_CRLF)
        out.extend(block)
        out.extend(_CRLF + _CRLF)

    if warcinfo is not None:
        info = f"software: {warcinfo}\r\n".encode("utf-8")
        _record(
            "warcinfo",
            [("Content-Type", "application/warc-fields"),
             ("WARC-Date", "2026-01-01T00:00:00Z")],
            info,
        )
    for i, rec in enumerate(records):
        body = rec["body"]
        block = _http_block(
            int(rec.get("status", 200)),
            rec.get("content_type", "text/html; charset=utf-8"),
            body,
        )
        _record(
            "response",
            [
                ("WARC-Record-ID", rec.get("record_id", f"<urn:rec:{i}:{rec['uri']}>")),
                ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
                ("WARC-Target-URI", rec["uri"]),
                ("Content-Type", "application/http;msgtype=response"),
            ],
            block,
        )
    return bytes(out)


def _hdecode(b: bytes) -> str:
    """Header-value decode that never kills a file: UTF-8 when valid
    (how this module's writer and modern crawlers encode), else
    latin-1 — the HTTP wire default and a total byte→str map, so
    real-world archives with stray non-UTF-8 bytes in WARC-Target-URI
    or HTTP headers (Common Crawl has them) parse instead of raising
    UnicodeDecodeError out of an executor task (round-10 review
    finding)."""
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def parse_warc(data: bytes) -> Iterator[dict]:
    """Iterate a WARC file's records as dicts.

    Framing is strictly by ``Content-Length`` (never by scanning for
    markers), so payloads containing ``\\r\\n\\r\\n`` or ``WARC/1.0``
    parse correctly. Yields for every record: ``warc_type``, ``uri``,
    ``warc_date``, ``record_id`` and — for ``response`` records whose
    block is an HTTP response — ``http_status`` (int),
    ``http_content_type`` and ``body`` (bytes); non-response records
    carry the raw block as ``body`` with ``http_status`` None.

    Raises ``ValueError`` on structural corruption (missing version
    line, unparseable/missing Content-Length, truncated block) — a
    silently-skipped record is a silently-shrunk corpus.
    """
    if data[:2] == b"\x1f\x8b":
        # Transparent gzip: Common Crawl ships .warc.gz with one gzip
        # MEMBER per record; gzip.decompress consumes concatenated
        # members, so both whole-file and per-record compression parse.
        import gzip

        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        # Tolerate extra record separators (some writers pad).
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at offset {pos}")
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[_hdecode(k).strip().lower()] = _hdecode(v).strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/invalid Content-Length at offset {pos}") from None
        block_start = hdr_end + len(_HDR_END)
        block_end = block_start + length
        if block_end > n:
            raise ValueError(f"truncated record block at offset {block_start}")
        block = data[block_start:block_end]
        rec: dict = {
            "warc_type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "http_status": None,
            "http_content_type": None,
            "body": block,
        }
        if rec["warc_type"] == "response" and block.startswith(b"HTTP/"):
            http_end = block.find(_HDR_END)
            if http_end < 0:
                raise ValueError("response record without HTTP header terminator")
            http_lines = block[:http_end].split(_CRLF)
            status_parts = http_lines[0].split(b" ", 2)
            if len(status_parts) < 2:
                raise ValueError(f"malformed HTTP status line {http_lines[0]!r}")
            rec["http_status"] = int(status_parts[1])
            for line in http_lines[1:]:
                k, _, v = line.partition(b":")
                if _hdecode(k).strip().lower() == "content-type":
                    rec["http_content_type"] = _hdecode(v).strip()
            rec["body"] = block[http_end + len(_HDR_END):]
        yield rec
        pos = block_end


def write_warc_files(
    shards: dict[str, list[dict]],
    out_dir: str,
    *,
    warcinfo: str = "vmware-graph-spark",
    gzip_members: bool = False,
) -> list[str]:
    """Write one ``.warc`` file per shard name into ``out_dir``; returns
    the written paths. With ``gzip_members`` each record becomes its own
    gzip MEMBER in a ``.warc.gz`` (the Common Crawl layout — members
    concatenate into one valid gzip stream; ``mtime=0`` keeps fixture
    bytes deterministic). Fixture/test helper — production re-sharding
    would route per-partition bytes through the same
    :func:`make_warc_bytes`."""
    import gzip
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, records in sorted(shards.items()):
        if gzip_members:
            path = os.path.join(out_dir, f"{name}.warc.gz")
            with open(path, "wb") as f:
                if warcinfo is not None:
                    f.write(gzip.compress(make_warc_bytes([], warcinfo=warcinfo), mtime=0))
                for rec in records:
                    f.write(gzip.compress(make_warc_bytes([rec]), mtime=0))
        else:
            path = os.path.join(out_dir, f"{name}.warc")
            with open(path, "wb") as f:
                f.write(make_warc_bytes(records, warcinfo=warcinfo))
        paths.append(path)
    return paths


def make_wet_bytes(records: Iterable[dict]) -> bytes:
    """Serialize extracted-text records as WET (WARC ``conversion``
    records, Content-Type text/plain — the Common Crawl companion
    format for the text a pipeline extracts from its WARC responses).
    Each record dict: ``uri`` (str), ``text`` (str), optional ``date``
    / ``record_id``. :func:`parse_warc` reads these back with
    ``warc_type='conversion'`` and the text bytes as ``body``."""
    out = bytearray()
    for i, rec in enumerate(records):
        block = rec["text"].encode("utf-8")
        headers = (
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", rec.get("record_id", f"<urn:wet:{i}:{rec['uri']}>")),
            ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
            ("WARC-Target-URI", rec["uri"]),
            ("Content-Type", "text/plain"),
        )
        out.extend(b"WARC/1.0" + _CRLF)
        for k, v in headers:
            out.extend(f"{k}: {v}\r\n".encode("utf-8"))
        out.extend(f"Content-Length: {len(block)}\r\n".encode("utf-8"))
        out.extend(_CRLF)
        out.extend(block)
        out.extend(_CRLF + _CRLF)
    return bytes(out)


def write_wet(
    df,
    out_dir: str,
    *,
    uri_col: str = "uri",
    text_col: str = "text",
    gzip_members: bool = False,
    target_member_bytes: int | None = None,
) -> int:
    """Distributed WET SINK: each partition's rows serialize into one
    ``.warc.wet[.gz]`` file written FROM THE EXECUTOR (the re-shard
    sink production crawl prep needs — the driver never touches
    record bytes; contrast the driver-side fixture writers). Rows are
    sorted by URI within each file so file contents are deterministic
    given a partitioning; file NAMES carry the partition id. Returns
    the number of records written (from the executors' manifest rows).
    Readers use ``read_warc(types=('conversion',))``.

    ``target_member_bytes`` (round-12, actioning the SCALING.md gz
    read-back note: a ``.gz`` member decodes as ONE stream, so read
    parallelism equals member count): when set, one cheap aggregate
    estimates the total SERIALIZED size (per-record header overhead +
    URI + UTF-8 text octets) and the frame repartitions to
    ``ceil(total/target)`` members — hash-partitioned on the URI so
    member contents stay deterministic for a given member count. The
    target measures UNCOMPRESSED serialized bytes (the deterministic
    quantity; gz ratios are data-dependent — Common Crawl's own WET
    members target ~150 MB compressed the same way, by record
    volume)."""
    import gzip
    import os

    import pandas as pd

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wet.gz" if gzip_members else ".warc.wet"

    if target_member_bytes:
        # per-record serialized estimate: fixed header lines ~140 B +
        # the URI twice (Record-ID + Target-URI) + the text octets
        est = (
            df.select(
                (
                    F.lit(140)
                    + 2 * F.octet_length(uri_col)
                    + F.octet_length(text_col)
                ).alias("__b")
            )
            .agg(F.sum("__b"))
            .collect()[0][0]
            or 0
        )
        n_parts = max(1, -(-int(est) // int(target_member_bytes)))
        df = df.repartition(n_parts, uri_col)

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            rows.extend(zip(pdf[uri_col], pdf[text_col]))
        if rows:
            rows.sort()
            # WARC headers are CRLF-delimited lines: a URI carrying
            # CR/LF would inject headers / break framing. Control
            # characters percent-encode (canonical URLs never contain
            # them, but a sink must not trust its input's hygiene).
            # When a URI needs escaping, its literal '%'s escape too
            # (%25, FIRST — before the control escapes introduce new
            # '%'s), so an escaped URI decodes unambiguously back to
            # its original. Clean URIs pass through verbatim —
            # real-world WET fidelity beats re-encoding every %20.
            # Residual (documented, round-10 advice): the mapping is
            # injective within each class but not across them — a
            # CLEAN URI that literally spells a control escape
            # ('a%0Db') collides with the escaped form of a dirty one
            # ('a\rb'); consumers needing byte-exact provenance for
            # hostile URIs keep their own manifest.
            def _safe(u: str) -> str:
                if any(ord(ch) < 0x20 for ch in u):
                    u = u.replace("%", "%25")
                    u = "".join(
                        f"%{ord(ch):02X}" if ord(ch) < 0x20 else ch for ch in u
                    )
                return u

            recs = [{"uri": _safe(u), "text": t} for u, t in rows]
            if gzip_members:
                payload = b"".join(
                    gzip.compress(make_wet_bytes([r]), mtime=0) for r in recs
                )
            else:
                payload = make_wet_bytes(recs)
            with open(os.path.join(out_dir, f"part-{pid:05d}{ext}"), "wb") as f:
                f.write(payload)
        yield pd.DataFrame({"n": [len(rows)]})

    manifest = df.select(uri_col, text_col).mapInPandas(write_part, "n bigint")
    from pyspark.sql import functions as F

    return manifest.agg(F.sum("n")).collect()[0][0] or 0


_READ_SCHEMA = (
    "warc_file string, record_idx bigint, warc_type string, uri string, "
    "warc_date string, http_status int, http_content_type string, body binary"
)


def _parse_files_fn(types: tuple[str, ...]):
    """The executor-side parse iterator shared by the batch and
    streaming readers (mapInPandas over (path, content) batches)."""
    import pandas as pd

    want = set(types)

    def parse_files(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = {
                    "warc_file": [], "record_idx": [], "warc_type": [],
                    "uri": [], "warc_date": [], "http_status": [],
                    "http_content_type": [], "body": [],
                }
                for idx, rec in enumerate(parse_warc(bytes(row["content"]))):
                    if rec["warc_type"] not in want:
                        continue
                    rows["warc_file"].append(row["path"])
                    rows["record_idx"].append(idx)
                    rows["warc_type"].append(rec["warc_type"])
                    rows["uri"].append(rec["uri"])
                    rows["warc_date"].append(rec["warc_date"])
                    rows["http_status"].append(rec["http_status"])
                    rows["http_content_type"].append(rec["http_content_type"])
                    rows["body"].append(rec["body"])
                if rows["warc_file"]:
                    yield pd.DataFrame(rows)

    return parse_files


def read_warc(
    spark: SparkSession,
    path_glob: str,
    *,
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Distributed fleet read of WARC archives.

    ``binaryFile`` lists + loads the files in parallel; each executor
    parses its files with :func:`parse_warc` inside an Arrow-batched
    ``mapInPandas`` (per-file iteration is executor-side over the
    unsplittable archive grain — the same shape as the xlsx fleet
    reader). ``types`` filters records at the parser (default: only
    ``response`` — warcinfo/request records never leave the executor).
    ``record_idx`` is the record's parse-order index within its file,
    so (warc_file, record_idx) is a stable provenance key.
    """
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(_parse_files_fn(types), _READ_SCHEMA)


#: binaryFile's fixed schema — streaming file sources require it
#: up front (no inference on readStream).
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, content binary"
)


def read_warc_stream(
    spark: SparkSession,
    path_glob: str,
    *,
    types: tuple[str, ...] = ("response",),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_warc`: a ``binaryFile`` file-source
    stream (each arriving archive becomes records in some micro-batch,
    exactly once via the sink checkpoint) through the SAME executor-side
    parser — batch/stream semantic parity comes from sharing
    ``_parse_files_fn`` verbatim. The continuous-crawl ingest shape:
    segments land in a directory, records flow downstream."""
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path_glob).select("path", "content")
    return files.mapInPandas(_parse_files_fn(types), _READ_SCHEMA)
