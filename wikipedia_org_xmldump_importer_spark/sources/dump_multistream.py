"""Multistream-bz2 dump ingest (s20, r13 verdict task 2) — the format real
Wikipedia dumps actually ship in.

``*-pages-articles-multistream.xml.bz2`` is a CONCATENATION of independent
bz2 streams: stream 0 holds the document header (``<mediawiki ...>`` +
``<siteinfo>``), each following stream holds a fixed count of whole
``<page>`` elements (100 in the real dumps), and the closing
``</mediawiki>`` rides in a final stream (some repackagers fold it into the
last page stream — the reader tolerates both). The companion
``*-multistream-index.txt.bz2`` has one line per page,
``offset:page_id:title``, where ``offset`` is the BYTE position of the bz2
stream containing that page. Python's ``bz2`` decodes concatenated streams
natively (``BZ2Decompressor.unused_data`` chains them), so any byte range
that starts ON a stream boundary is independently decodable — which makes
the index the dump's built-in split map.

Why this module exists (the repo's own at-scale prescription, NOTES.md
round-10 probes + sources/dump_split.py): Spark's XML source NEVER splits
within a file, so a mono-file dump serializes the parse onto one core and
s14 ``shard_dump`` costs a full single-threaded decode-reencode pass
first. The multistream pair needs NEITHER: ``scan_multistream`` turns the
index into (start, end) byte ranges, fans one range per task, decodes each
range locally (seek + read + bz2, no re-encode), and parses the page
elements JVM-side with ``from_xml`` against the same pinned PAGE_SCHEMA as
s2 — so the row contract is identical to ``scan_xml_pages`` (tested
union-equal) while the scan parallelism equals the CHUNK COUNT from byte
zero, with zero prep passes.

100 TB notes:
  * enwiki ships ~240k streams; ``streams_per_task`` groups consecutive
    streams so task count lands near cluster parallelism instead of 240k
    100-page tasks (the scheduling floor, trap #8). Grouped ranges stay
    one seek + one sequential read each.
  * The index itself is bz2 TEXT — Hadoop's Bzip2Codec is block-splittable,
    so ``read_multistream_index`` is a plain distributed ``spark.read.text``;
    only the DISTINCT STREAM OFFSETS (one long per stream) ever reach the
    driver (ledger-bounded collect, O(streams) ≈ 2 MB for enwiki).
  * Tasks open ``dump_path`` directly — on a cluster that means a shared
    filesystem (NFS/fuse/local replica); for object stores, swap the
    ``open``/``seek`` for a ranged GET in ``_read_range`` (one line, and
    the ranged GET is exactly what the (start, end) contract models).
  * The decoded page blobs are parsed by Catalyst's ``from_xml`` (JVM,
    same parser as the XML source), not Python — the Python side only
    runs the C bz2 loop and byte-level ``</page>`` splits (safe because a
    literal ``</page>`` inside wikitext payloads is always XML-escaped —
    same argument as s14's line-anchored cut — and the markers are ASCII,
    so byte matching cannot tear a multibyte character). Blobs cross as a
    ``mapInArrow`` BINARY column: no pandas object arrays, no Python-side
    UTF-8 decode; the JVM's binary→string cast does the one decode.

``write_multistream`` is the matching one-pass re-packager (mono dump →
multistream pair) — it synthesizes the test fixtures and gives mono-file
holders a migration path to the parallel format; like s14 it is
single-threaded prep I/O, paid once, amortized by every parallel scan.
"""

from __future__ import annotations

import bz2
import os
import re
from xml.sax.saxutils import unescape

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dump_split import _open_text
from .xml_pages import PAGE_SCHEMA, PAGE_SCHEMA_META, SITEINFO_SCHEMA

__all__ = [
    "write_multistream",
    "read_multistream_index",
    "scan_multistream",
    "scan_multistream_siteinfo",
]


# ---------------------------------------------------------------------------
# writer: mono dump -> (multistream .xml.bz2, index .txt[.bz2]) pair
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"<title>(.*?)</title>")
_ID_RE = re.compile(r"<id>(\d+)</id>")


def write_multistream(
    src_path: str,
    dump_path: str,
    index_path: str,
    pages_per_stream: int = 100,
    compresslevel: int = 9,
) -> dict:
    """Re-package a mono MediaWiki dump as a multistream pair.

    Stream layout mirrors the real dumps: header stream (everything before
    the first ``<page>``), then ``pages_per_stream`` whole pages per
    stream, then a footer stream holding ``</mediawiki>``. The index gets
    one ``offset:page_id:title`` line per page (page-level id = the first
    ``<id>`` before the first ``<revision>``; titles may contain ``:`` —
    readers must split at most twice). ``index_path`` ending in ``.bz2``
    writes the index bz2-compressed (single stream, splittable by Hadoop),
    else plain text. Returns ``{"streams": n, "pages": n, "bytes": n}``.
    """
    header_lines: list[str] = []
    in_header = True
    in_revision = False
    cur_page: list[str] = []
    page_meta: list[tuple[int, str]] = []  # (page_id, title) per buffered page
    buf_pages: list[str] = []
    cur_id: int | None = None
    cur_title: str | None = None
    n_streams = 0
    n_pages = 0
    index_lines: list[str] = []

    out = open(dump_path, "wb")

    def _emit_stream(text: str) -> int:
        nonlocal n_streams
        offset = out.tell()
        out.write(bz2.compress(text.encode("utf-8"), compresslevel))
        n_streams += 1
        return offset

    def _flush_pages() -> None:
        nonlocal buf_pages, page_meta, n_pages
        if not buf_pages:
            return
        offset = _emit_stream("".join(buf_pages))
        for pid, title in page_meta:
            index_lines.append(f"{offset}:{pid}:{title}")
        n_pages += len(page_meta)
        buf_pages, page_meta = [], []

    def _is_page_open(stripped: str) -> bool:
        return stripped.startswith("<page>") or stripped == "<page"

    try:
        with _open_text(src_path) as f:
            for line in f:
                stripped = line.strip()
                if in_header:
                    if _is_page_open(stripped):
                        in_header = False
                        _emit_stream("".join(header_lines))
                    else:
                        header_lines.append(line)
                        continue
                if stripped == "</mediawiki>":
                    continue  # re-emitted as the footer stream
                if _is_page_open(stripped):
                    cur_page, cur_id, cur_title = [], None, None
                    in_revision = False
                if "<revision" in stripped:
                    in_revision = True
                if cur_title is None and not in_revision:
                    # gated on page level exactly like <id>: a title-less
                    # page must not steal a '<title>' lookalike out of a
                    # revision comment/payload line
                    m = _TITLE_RE.search(stripped)
                    if m:
                        # the index records the TITLE VALUE (like the real
                        # dump indexes), not the XML-escaped source text —
                        # 'A&amp;B' in the dump is page title 'A&B', and
                        # the scan's title column unescapes identically
                        cur_title = unescape(
                            m.group(1), {"&quot;": '"', "&apos;": "'"}
                        )
                if cur_id is None and not in_revision:
                    m = _ID_RE.search(stripped)
                    if m:
                        cur_title_known = cur_title is not None
                        # page-level <id> always follows <title> in the
                        # export schema; an <id> before any title would be
                        # malformed input — refuse rather than misindex.
                        if not cur_title_known:
                            raise ValueError(
                                f"page <id> before <title> in {src_path}"
                            )
                        cur_id = int(m.group(1))
                cur_page.append(line)
                if stripped == "</page>":
                    if cur_id is None:
                        raise ValueError(f"page without <id> in {src_path}")
                    buf_pages.append("".join(cur_page))
                    page_meta.append((cur_id, cur_title or ""))
                    cur_page = []
                    if len(buf_pages) >= pages_per_stream:
                        _flush_pages()
        if in_header:
            raise ValueError(f"no <page> element found in {src_path}")
        _flush_pages()
        _emit_stream("</mediawiki>\n")
        total = out.tell()
    finally:
        out.close()

    index_text = "\n".join(index_lines) + "\n"
    if index_path.endswith(".bz2"):
        with open(index_path, "wb") as fh:
            fh.write(bz2.compress(index_text.encode("utf-8"), compresslevel))
    else:
        with open(index_path, "w", encoding="utf-8") as fh:
            fh.write(index_text)
    return {"streams": n_streams, "pages": n_pages, "bytes": total}


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def read_multistream_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Distributed parse of the multistream index: one row per page,
    ``(offset long, page_id long, title string)``.

    ``spark.read.text`` handles the ``.bz2`` transparently (and splittably —
    Hadoop's Bzip2Codec is block-splittable, so a GB-scale index still fans
    out). Titles may contain ``:``, so the line splits at most twice."""
    lines = spark.read.text(index_path)
    parts = F.split(F.col("value"), ":", 3)
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            parts.getItem(0).cast("long").alias("offset"),
            parts.getItem(1).cast("long").alias("page_id"),
            parts.getItem(2).alias("title"),
        )
    )


def _stream_offsets(spark: SparkSession, index_path: str) -> list[int]:
    """Distinct stream offsets, ascending. One long per stream reaches the
    driver (ledger-bounded: ~240k for enwiki ≈ 2 MB)."""
    rows = (
        read_multistream_index(spark, index_path)
        .select("offset")
        .distinct()
        .collect()
    )
    return sorted(r["offset"] for r in rows)


def _decode_concatenated(buf: bytes) -> bytes:
    """Decode one or more concatenated bz2 streams; returns raw UTF-8 bytes
    (NO Python-side character decode — the bytes go to the JVM as-is)."""
    chunks: list[bytes] = []
    while buf:
        dec = bz2.BZ2Decompressor()
        chunks.append(dec.decompress(buf))
        if not dec.eof:
            raise ValueError("truncated bz2 stream in multistream range")
        buf = dec.unused_data
    return b"".join(chunks)


def _split_pages(raw: bytes) -> list[bytes]:
    """Split decoded stream bytes into whole ``<page>...</page>`` blobs.

    Safe on payload content: a literal ``</page>`` inside wikitext arrives
    XML-escaped (``&lt;/page&gt;``), so the marker only occurs as markup —
    and both markers are pure ASCII, so byte-level matching cannot tear a
    multibyte character. Anything outside page elements (inter-page
    whitespace, a folded-in ``</mediawiki>`` footer) carries no ``<page``
    opener / trails the last closer and is dropped."""
    parts = raw.split(b"</page>")
    pages: list[bytes] = []
    for frag in parts[:-1]:
        # a REAL opener only: '<page>' or '<page ' — never a longer
        # element name sharing the prefix
        cands = [i for i in (frag.find(b"<page>"), frag.find(b"<page ")) if i >= 0]
        if not cands:
            continue
        pages.append(frag[min(cands):] + b"</page>")
    return pages


def scan_multistream(
    spark: SparkSession,
    dump_path: str,
    index_path: str,
    include_text: bool = True,
    streams_per_task: int | None = None,
) -> DataFrame:
    """s20: parallel scan of a multistream dump — row-identical to
    ``scan_xml_pages`` on the equivalent mono file (tested), with scan
    parallelism == ``ceil(n_streams / streams_per_task)`` instead of 1.

    The index supplies the split map: consecutive distinct offsets become
    (start, end) byte ranges (the final range runs to EOF and simply drops
    the footer at the page split), ``streams_per_task`` consecutive streams
    per task. Each task seeks, reads one contiguous range, bz2-decodes it
    (concatenated streams chain via ``unused_data``), splits whole pages at
    byte level, and ships the page BLOBS through ``mapInArrow`` as a binary
    column — the JVM casts to string and parses with ``from_xml`` against
    the pinned PAGE_SCHEMA. Parsing AND character decoding stay JVM-side;
    Python only runs the C bz2 loop and ASCII-marker byte splits.
    ``include_text=False`` swaps in PAGE_SCHEMA_META exactly like s2 (the
    giant text payload is still decompressed — it is interleaved in the
    stream — but never parsed or carried in rows).

    ``streams_per_task=None`` auto-groups toward ~3 tasks per core:
    measured A/B at 400 MB/384 streams on local[32] — one-stream tasks
    cost 4.3-4.9 s (the per-task Python round trip dominates 100-page
    units, trap #8 in Arrow clothing) vs 1.7 s at 4 streams/task, which
    sits at the bz2-decode floor (33 s single-core / 32). The auto default
    keeps the grouping ratio as cluster size or stream count scale."""
    if streams_per_task is not None and streams_per_task < 1:
        raise ValueError("streams_per_task must be >= 1")
    offsets = _stream_offsets(spark, index_path)
    if not offsets:
        raise ValueError(f"empty multistream index: {index_path}")
    if streams_per_task is None:
        target_tasks = 3 * max(1, spark.sparkContext.defaultParallelism)
        streams_per_task = max(1, -(-len(offsets) // target_tasks))
    size = os.path.getsize(dump_path)
    bounds = offsets + [size]
    ranges = [
        (bounds[i], bounds[min(i + streams_per_task, len(bounds) - 1)])
        for i in range(0, len(offsets), streams_per_task)
    ]

    def _decode(batches):
        import pyarrow as pa

        for rb in batches:
            starts = rb.column(0).to_pylist()
            ends = rb.column(1).to_pylist()
            for start, end in zip(starts, ends):
                with open(dump_path, "rb") as fh:  # object store: ranged GET
                    fh.seek(int(start))
                    buf = fh.read(int(end) - int(start))
                pages = _split_pages(_decode_concatenated(buf))
                if pages:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(pages, type=pa.binary())], ["xml"]
                    )

    # exactly one range per task: parallelize with numSlices == len(ranges)
    rdd = spark.sparkContext.parallelize(ranges, len(ranges))
    ranges_df = spark.createDataFrame(rdd, "start long, end long")
    raw = ranges_df.mapInArrow(_decode, "xml binary")
    schema = PAGE_SCHEMA if include_text else PAGE_SCHEMA_META
    return raw.select(
        F.from_xml(F.col("xml").cast("string"), schema).alias("page")
    ).select("page.*")


def scan_multistream_siteinfo(
    spark: SparkSession, dump_path: str, index_path: str
) -> DataFrame:
    """s20 header scan: decode ONLY the header stream (bytes
    ``[0, first_page_offset)`` — a few KB regardless of dump size) and parse
    its ``<siteinfo>`` with the same pinned SITEINFO_SCHEMA as s8, so
    ``namespaces_dim``/``resolve_namespaces`` compose unchanged."""
    offsets = _stream_offsets(spark, index_path)
    if not offsets:
        raise ValueError(f"empty multistream index: {index_path}")
    with open(dump_path, "rb") as fh:
        header = _decode_concatenated(fh.read(offsets[0])).decode("utf-8")
    m = re.search(r"<siteinfo>.*?</siteinfo>", header, re.S)
    if not m:
        raise ValueError(f"no <siteinfo> element in header stream of {dump_path}")
    df = spark.createDataFrame([(m.group(0),)], "xml string")
    return df.select(
        F.from_xml("xml", SITEINFO_SCHEMA).alias("si")
    ).select("si.*")
