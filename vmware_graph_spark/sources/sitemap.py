"""Sitemap (sitemaps.org XML) source: writer, parser, fleet reader.

The other half of frontier seeding: robots.txt points at sitemaps, and
a polite crawler seeds (and re-seeds) its frontier from them — at
Common Crawl scale that is millions of sitemap documents, many of them
``<sitemapindex>`` files fanning out to 50k-URL ``<urlset>`` shards
(the spec's per-file cap). This module owns the format with the stdlib
only, mirroring ``sources/warc.py``:

- :func:`make_sitemap_xml` / :func:`make_sitemap_index` /
  :func:`write_sitemap_files` build valid sitemaps.org documents
  (fixtures, tests, and a re-shard sink);
- :func:`parse_sitemap` iterates one document's entries — both
  ``<urlset>`` and ``<sitemapindex>``, namespace-tolerant (real files
  ship with and without the xmlns, and with namespace prefixes),
  transparently gunzipping ``.xml.gz`` payloads (the spec's preferred
  transport);
- :func:`read_sitemaps` is the distributed fleet read: ``binaryFile``
  + Arrow ``mapInPandas`` at the file grain — sitemaps are small
  documents, so parallelism = file count, the same placement as the
  WARC and XLSX fleet readers.

Strictness matches ``parse_warc``: structural corruption (not XML, an
unknown root element) raises ValueError — a silently-skipped sitemap
is a silently-unseeded slice of the frontier. Per-entry OPTIONAL
fields (lastmod/changefreq/priority) are None when absent, as the spec
allows.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def make_sitemap_xml(entries: Iterable[dict]) -> bytes:
    """Serialize a ``<urlset>``: each entry dict carries ``loc`` plus
    optional ``lastmod``/``changefreq``/``priority``. Values are
    entity-escaped — the sitemaps.org spec REQUIRES it, and real locs
    carry ``&`` constantly (``?a=1&b=2``); an unescaped ampersand is
    malformed XML that kills the whole file at read time."""
    from xml.sax.saxutils import escape

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<urlset xmlns="{_NS}">',
    ]
    for e in entries:
        parts.append("<url>")
        parts.append(f"<loc>{escape(str(e['loc']))}</loc>")
        for k in ("lastmod", "changefreq", "priority"):
            if e.get(k) is not None:
                parts.append(f"<{k}>{escape(str(e[k]))}</{k}>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "\n".join(parts).encode("utf-8")


def make_sitemap_index(locs: Iterable[tuple[str, str | None]]) -> bytes:
    """Serialize a ``<sitemapindex>`` of (loc, lastmod-or-None);
    values entity-escaped like :func:`make_sitemap_xml`."""
    from xml.sax.saxutils import escape

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<sitemapindex xmlns="{_NS}">',
    ]
    for loc, lastmod in locs:
        parts.append("<sitemap>")
        parts.append(f"<loc>{escape(str(loc))}</loc>")
        if lastmod is not None:
            parts.append(f"<lastmod>{escape(str(lastmod))}</lastmod>")
        parts.append("</sitemap>")
    parts.append("</sitemapindex>")
    return "\n".join(parts).encode("utf-8")


def _local(tag: str) -> str:
    """Element tag without its namespace ('{ns}loc' -> 'loc')."""
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(data: bytes) -> Iterator[dict]:
    """Iterate one sitemap document's entries.

    Yields ``{"kind": "url"|"sitemap", "loc", "lastmod", "changefreq",
    "priority"}`` — ``kind='sitemap'`` rows are a ``<sitemapindex>``'s
    children (the caller fetches those files next; this parser never
    does I/O). Namespace-tolerant: tags match by local name, so files
    without the xmlns, with the canonical one, or with a prefix all
    parse identically. Gzip payloads are transparently decompressed.
    Raises ValueError on non-XML payloads or an unexpected root.
    """
    import xml.etree.ElementTree as ET

    if data[:2] == b"\x1f\x8b":
        import gzip

        data = gzip.decompress(data)
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"sitemap payload is not well-formed XML: {e}") from None
    root_tag = _local(root.tag)
    if root_tag == "urlset":
        kind, child_tag = "url", "url"
    elif root_tag == "sitemapindex":
        kind, child_tag = "sitemap", "sitemap"
    else:
        raise ValueError(f"unexpected sitemap root element <{root_tag}>")
    for child in root:
        if _local(child.tag) != child_tag:
            continue  # spec allows extension elements; skip them
        fields: dict = {"kind": kind, "loc": None, "lastmod": None,
                        "changefreq": None, "priority": None}
        for el in child:
            name = _local(el.tag)
            if name in fields and name != "kind":
                fields[name] = (el.text or "").strip() or None
        if fields["loc"] is None:
            raise ValueError(f"<{child_tag}> entry without <loc>")
        yield fields


_READ_SCHEMA = (
    "sitemap_file string, entry_idx bigint, kind string, loc string, "
    "lastmod string, changefreq string, priority double"
)


def _parse_files_fn():
    import math

    import pandas as pd

    def parse_files(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = {
                    "sitemap_file": [], "entry_idx": [], "kind": [],
                    "loc": [], "lastmod": [], "changefreq": [], "priority": [],
                }
                for idx, e in enumerate(parse_sitemap(bytes(row["content"]))):
                    rows["sitemap_file"].append(row["path"])
                    rows["entry_idx"].append(idx)
                    rows["kind"].append(e["kind"])
                    rows["loc"].append(e["loc"])
                    rows["lastmod"].append(e["lastmod"])
                    rows["changefreq"].append(e["changefreq"])
                    # value-level leniency (vs STRUCTURAL strictness):
                    # priority is optional decoration per the spec, and
                    # real files carry garbage in it — a torn value must
                    # not kill the whole file's parse. Python's float()
                    # also parses 'nan'/'inf'/overflow spellings, which
                    # are garbage too (NaN poisons downstream equality/
                    # sort) — only finite values survive.
                    try:
                        pr = float(e["priority"]) if e["priority"] is not None else None
                        if pr is not None and not math.isfinite(pr):
                            pr = None
                    except ValueError:
                        pr = None
                    rows["priority"].append(pr)
                if rows["sitemap_file"]:
                    yield pd.DataFrame(rows)

    return parse_files


def read_sitemaps(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed fleet read of sitemap files (plain or ``.xml.gz``):
    ``binaryFile`` lists/loads in parallel, each executor parses its
    files inside an Arrow-batched ``mapInPandas``. ``(sitemap_file,
    entry_idx)`` is a stable provenance key, exactly like the WARC
    reader's ``(warc_file, record_idx)``."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(_parse_files_fn(), _READ_SCHEMA)


def write_sitemap_files(
    shards: dict[str, list[dict]],
    out_dir: str,
    *,
    index_name: str | None = "sitemap_index",
    gzip_files: bool = False,
) -> list[str]:
    """Write one ``<urlset>`` file per shard plus (optionally) a
    ``<sitemapindex>`` naming them — the layout large sites publish.
    With ``gzip_files`` the urlsets land as ``.xml.gz`` (``mtime=0``
    keeps fixture bytes deterministic). Returns written paths."""
    import gzip
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    ext = ".xml.gz" if gzip_files else ".xml"
    for name, entries in sorted(shards.items()):
        payload = make_sitemap_xml(entries)
        if gzip_files:
            payload = gzip.compress(payload, mtime=0)
        path = os.path.join(out_dir, f"{name}{ext}")
        with open(path, "wb") as f:
            f.write(payload)
        paths.append(path)
    if index_name is not None:
        idx_path = os.path.join(out_dir, f"{index_name}.xml")
        with open(idx_path, "wb") as f:
            f.write(
                make_sitemap_index(
                    [(f"http://example.com/{n}{ext}", None) for n in sorted(shards)]
                )
            )
        paths.append(idx_path)
    return paths
