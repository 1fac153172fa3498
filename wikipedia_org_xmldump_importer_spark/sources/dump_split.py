"""Mono-file dump pre-splitter — the prep step the r10 splitting probe
prescribes (s14, SURVEY §2.1; NOTES.md "Round 10 probes").

Measured fact: Spark's XML source never splits WITHIN a file (plain or
.bz2; maxPartitionBytes cannot force it), so a single-file dump
serializes the whole import onto one core; many smaller files bin-pack
toward one partition per core. Real dumps ship as multistream
chunk sets, but users holding one monolithic ``*-pages-articles.xml[.bz2]``
need this step: stream the file ONCE, cut at ``</page>`` boundaries into
``shard_mb``-sized shard files, each a well-formed ``<mediawiki>`` document
(header replicated, footer appended), so ``scan_xml_pages(out_dir)``
bin-packs the shards toward one partition per core and the parse scales.

Design constraints, stated because they are the correctness surface:

  * boundary detection is LINE-based on ``</page>`` (the export format
    emits it on its own line — tests cover indented/CRLF variants); text
    payloads CONTAIN literal ``</page>`` only XML-escaped (``&lt;/page&gt;``),
    so a line-anchored match cannot fire inside a payload;
  * the ``<siteinfo>`` header (everything before the first ``<page>``) is
    replicated into every shard — each shard stays independently scannable
    AND keeps its namespace map joinable (scan_xml_siteinfo works per shard);
  * shards cut at page granularity, so no page straddles files and the
    union of shard scans is row-identical to the mono-file scan (tested).

100 TB notes: the splitter itself is single-threaded stream I/O (one pass,
O(shard) memory) — a one-time prep cost at disk speed, amortized by every
subsequent parallel scan. At true 100 TB, don't start from a mono-file at
all: fetch the multistream chunk set. This module exists so a mono-file is
a fixable input, not a wall.
"""

from __future__ import annotations

import bz2
import gzip
import os

__all__ = ["shard_dump"]


def _open_text(path: str):
    if path.endswith(".bz2"):
        return bz2.open(path, "rt", encoding="utf-8")
    if path.endswith(".gz"):
        return gzip.open(path, "rt", encoding="utf-8")
    return open(path, "rt", encoding="utf-8")


def shard_dump(
    src_path: str,
    out_dir: str,
    shard_mb: float = 256.0,
    footer: str = "</mediawiki>\n",
) -> dict:
    """Split one MediaWiki dump into page-aligned shard files.

    Returns ``{"shards": n, "pages": n_pages, "bytes_in": ...}``. Shard
    files are named ``shard_00000.xml`` in ``out_dir``; each carries the
    original header (everything up to the first ``<page>`` line) and the
    closing ``</mediawiki>`` so every shard is a complete document.
    Sizes (``shard_mb`` cut decisions and ``bytes_in``) are UTF-8 byte
    counts of the decoded stream. Pre-existing ``shard_*.xml`` files in
    ``out_dir`` are deleted first — a re-run never leaves stale shards
    from a previous, larger run.
    """
    os.makedirs(out_dir, exist_ok=True)
    # Re-run safety (r10 advice): a previous run's shards in the same
    # out_dir would be silently co-scanned as duplicate/phantom pages if
    # the new dump produces fewer files (shrunk input or larger shard_mb).
    for stale in os.listdir(out_dir):
        if stale.startswith("shard_") and stale.endswith(".xml"):
            os.remove(os.path.join(out_dir, stale))
    limit = int(shard_mb * 1024 * 1024)

    header_lines: list[str] = []
    header_bytes = 0
    in_header = True
    shard_idx = 0
    written = 0
    n_pages = 0
    bytes_in = 0
    out = None

    def _next_shard():
        nonlocal shard_idx, written, out
        if out is not None:
            out.write(footer)
            out.close()
        path = os.path.join(out_dir, f"shard_{shard_idx:05d}.xml")
        shard_idx += 1
        out = open(path, "w", encoding="utf-8")
        for hl in header_lines:
            out.write(hl)
        written = header_bytes

    def _is_page_open(stripped: str) -> bool:
        return stripped.startswith("<page>") or stripped == "<page"

    pending_cut = False
    with _open_text(src_path) as f:
        for line in f:
            # sizes are UTF-8 BYTES, not characters (r10 advice: real wiki
            # text is heavily multibyte — char counts let shards overshoot
            # shard_mb on disk and misreport bytes_in)
            nbytes = len(line.encode("utf-8"))
            bytes_in += nbytes
            stripped = line.strip()
            if in_header:
                if _is_page_open(stripped):
                    in_header = False
                    _next_shard()
                else:
                    header_lines.append(line)
                    header_bytes += nbytes
                    continue
            if stripped == "</mediawiki>":
                continue  # original footer; shards append their own
            if pending_cut and _is_page_open(stripped):
                # cut is honored only when the NEXT PAGE actually arrives
                # (r10 advice): inter-page whitespace/comments after the
                # last </page> stay in the current shard, so a size-limit
                # hit on the final page can never emit a page-less
                # trailing shard. Shard files open lazily for the same
                # reason.
                _next_shard()
                pending_cut = False
            out.write(line)
            written += nbytes
            if stripped == "</page>":
                n_pages += 1
                # cut only BETWEEN pages, so no page ever straddles shards
                if written >= limit:
                    pending_cut = True

    if out is not None:
        out.write(footer)
        out.close()
    if in_header:
        raise ValueError(f"no <page> element found in {src_path}")
    return {"shards": shard_idx, "pages": n_pages, "bytes_in": bytes_in}
