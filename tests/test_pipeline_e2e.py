"""x368 pipeline_e2e_manifest — stage reconciliation (r12 verdict task 3).

The composed curation flagship chains quality -> dedup -> pack -> manifest
(+ the x304 mixture epilogue) in ONE plan; these tests assert that the
composition reconciles with the standalone stage queries it fuses and with
its own conservation laws, at sf0.01 (the driver's correctness SF):

* every manifest row's pack_reconciles flag holds (the packing window's
  final running total equals the aggregate's conditional token sum —
  packed token mass equals deduped corpus mass; the earlier
  max(seq_id)+1 == ceil spelling was straddle-broken, see the x368
  docstring);
* raw doc counts conserve the corpus;
* the quality population equals the registered quality_gopher_rules count;
* dedup is ACTIVE (kept < quality) yet never inverts (kept <= quality);
* mixture weights respect the no-upsampling cap and never overfill the
  token budget (water-filling can only underfill).

Plus the x367 tie: the bitmap-kernel decontamination flags exactly the
doc set x317's relational bloom audit counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF_001 = "/root/testdata/sf0.01"
_PACK_BUDGET = 2048


@pytest.fixture(scope="module")
def manifest(spark):
    return REGISTRY["pipeline_e2e_manifest"].fn(spark, SF_001).collect()


def test_pack_reconciles_everywhere(manifest):
    assert manifest, "empty manifest"
    bad = [r for r in manifest if r.pack_reconciles != 1]
    assert not bad, f"packing failed to reconcile in shards: {bad[:3]}"
    for r in manifest:
        want = -(-r.tokens_kept // _PACK_BUDGET)  # ceil
        assert r.n_sequences == want, (r.lang, r.source, r.n_sequences, want)


def test_raw_counts_conserve_corpus(spark, manifest):
    n_docs = spark.read.parquet(f"{SF_001}/documents.parquet").count()
    assert sum(r.n_docs_raw for r in manifest) == n_docs


def test_quality_population_matches_stage_query(spark, manifest):
    gopher = REGISTRY["quality_gopher_rules"].fn(spark, SF_001)
    n_pass = gopher.filter(F.col("passes_gopher")).count()
    assert sum(r.n_docs_quality for r in manifest) == n_pass


def test_dedup_active_and_monotone(manifest):
    kept = sum(r.n_docs_kept for r in manifest)
    quality = sum(r.n_docs_quality for r in manifest)
    assert kept < quality, "dedup stage dropped nothing — fixture regression"
    for r in manifest:
        assert r.n_docs_kept <= r.n_docs_quality <= r.n_docs_raw


def test_mixture_weights_capped_and_within_budget(manifest):
    per_source: dict[str, int] = {}
    weights: dict[str, float] = {}
    for r in manifest:
        per_source[r.source] = per_source.get(r.source, 0) + r.tokens_kept
        weights[r.source] = r.source_weight
    total = sum(per_source.values())
    budget = total // 2
    for s, w in weights.items():
        assert 0.0 <= w <= 1.0, (s, w)
    expected = sum(weights[s] * a for s, a in per_source.items())
    # water-filling only ever underfills; allow round-6 slack on the sum
    assert expected <= budget * (1 + 1e-6), (expected, budget)
    # and it should not underfill pathologically (the lambda rounds
    # converged on this corpus): at least 90% of the budget is allocated
    assert expected >= 0.9 * budget, (expected, budget)


def test_bitmap_decontamination_matches_relational_audit(spark):
    bitmap = REGISTRY["decontaminate_bitmap"].fn(spark, SF_001)
    n_flagged = bitmap.filter(F.col("is_contaminated") == 1).count()
    audit = REGISTRY["decontaminate_bloom"].fn(spark, SF_001).collect()[0]
    assert n_flagged == audit.n_docs_flagged_bloom


def _render_dump(docs_rows, path: str) -> None:
    """Render documents rows as a MediaWiki export dump: one page per doc,
    title = ``source/lang`` (page id carries doc_id), one revision whose
    text payload is the document text. The inverse of the derivation in
    test_manifest_from_dump_bytes — together they define the ingest seam."""
    from xml.sax.saxutils import escape

    with open(path, "w", encoding="utf-8") as f:
        f.write(
            '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/" '
            'version="0.11" xml:lang="en">\n'
            "  <siteinfo>\n    <sitename>CurationCorpus</sitename>\n"
            "    <dbname>curation</dbname>\n  </siteinfo>\n"
        )
        for r in docs_rows:
            body = escape(r.text)
            f.write(
                "  <page>\n"
                f"    <title>{escape(r.source)}/{escape(r.lang)}</title>\n"
                "    <ns>0</ns>\n"
                f"    <id>{r.doc_id}</id>\n"
                "    <revision>\n"
                f"      <id>{r.doc_id + 1000000}</id>\n"
                "      <timestamp>2024-01-01T00:00:00Z</timestamp>\n"
                "      <contributor><username>importer</username>"
                "<id>1</id></contributor>\n"
                "      <model>wikitext</model>\n"
                "      <format>text/x-wiki</format>\n"
                f'      <text bytes="{len(body)}" xml:space="preserve">'
                f"{body}</text>\n"
                "      <sha1>x</sha1>\n"
                "    </revision>\n"
                "  </page>\n"
            )
        f.write("</mediawiki>\n")


def _documents_from_pages(pages):
    """The ingest-seam mapping: dump pages -> the documents table shape."""
    return pages.select(
        F.col("id").alias("doc_id"),
        F.col("revision")[0]["text"]["_VALUE"].alias("text"),
        F.split(F.col("title"), "/")[1].alias("lang"),
        F.split(F.col("title"), "/")[0].alias("source"),
        F.length(F.col("revision")[0]["text"]["_VALUE"])
        .cast("long")
        .alias("n_chars"),
    )


def test_manifest_from_dump_bytes(spark, tmp_path):
    """r13 verdict task 6 — close the last seam between the ingest
    components (SURVEY 2.1) and the curation flagship: the release
    manifest must be IDENTICAL whether the corpus arrives as parquet, as
    a mono XML dump through s2, or as a multistream pair through s20.

    sf0.001's real documents table is rendered into an actual dump file,
    ingested back through BOTH scan paths, mapped to the documents shape,
    sunk to parquet, and x368 runs on each — row-for-row equality against
    the manifest computed from the original parquet (exact: token masses
    are BIGINT and the mixture epilogue is deterministic ROUND-6 floats
    off exact integers, layout-invariance is separately attested)."""
    from wikipedia_org_xmldump_importer_spark.io import load_table, sink_parquet
    from wikipedia_org_xmldump_importer_spark.sources.dump_multistream import (
        scan_multistream,
        write_multistream,
    )
    from wikipedia_org_xmldump_importer_spark.sources.xml_pages import (
        scan_xml_pages,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    mono = str(tmp_path / "dump.xml")
    _render_dump(docs.collect(), mono)

    def manifest_rows(sf_dir):
        out = REGISTRY["pipeline_e2e_manifest"].fn(spark, sf_dir)
        return sorted(tuple(r) for r in out.collect())

    ref = manifest_rows(sf)

    # route A: mono dump -> s2 scan -> documents shape -> parquet -> x368
    xml_sf = tmp_path / "xml_sf"
    xml_sf.mkdir()
    via_xml = _documents_from_pages(scan_xml_pages(spark, mono))
    sink_parquet(via_xml, str(xml_sf / "documents.parquet"))
    assert manifest_rows(str(xml_sf)) == ref

    # route B: multistream pair -> s20 scan -> same mapping -> x368
    ms_dump = str(tmp_path / "ms.xml.bz2")
    ms_index = str(tmp_path / "ms-index.txt.bz2")
    write_multistream(mono, ms_dump, ms_index, pages_per_stream=40)
    ms_sf = tmp_path / "ms_sf"
    ms_sf.mkdir()
    via_ms = _documents_from_pages(scan_multistream(spark, ms_dump, ms_index))
    sink_parquet(via_ms, str(ms_sf / "documents.parquet"))
    assert manifest_rows(str(ms_sf)) == ref
