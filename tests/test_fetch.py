"""S8 / X6 closure: distributed manifest fetch (injected transport,
checksum validation, per-file failure reporting) and rendered-page table
scrape (injected browser, regex row extraction)."""

from __future__ import annotations

import hashlib
import os


def test_fetch_manifest_staging_checksums_and_failures(spark, tmp_path):
    from pharmacodi_spark.sources.fetch import fetch_manifest

    payloads = {
        "http://x/a.bin": b"alpha-payload",
        "http://x/b.bin": b"beta-payload",
        "http://x/dies.bin": None,  # transport failure
    }

    def fetcher(url: str) -> bytes:
        p = payloads[url]
        if p is None:
            raise OSError("connection reset")
        return p

    good_sha = hashlib.sha256(b"alpha-payload").hexdigest()
    manifest = spark.createDataFrame(
        [
            ("http://x/a.bin", "shard/a.bin", good_sha),
            ("http://x/b.bin", "shard/b.bin", "deadbeef"),  # wrong checksum
            ("http://x/dies.bin", "shard/c.bin", None),
        ],
        "url string, relpath string, sha string",
    )
    dest = str(tmp_path / "stage")
    rep = {
        r.relpath: r
        for r in fetch_manifest(
            manifest, fetcher, dest, checksum_col="sha"
        ).collect()
    }
    a = rep["shard/a.bin"]
    assert a.ok and a.n_bytes == len(b"alpha-payload") and a.sha256 == good_sha
    assert open(os.path.join(dest, "shard/a.bin"), "rb").read() == b"alpha-payload"
    b = rep["shard/b.bin"]
    assert not b.ok and b.err == "checksum mismatch"
    assert os.path.exists(os.path.join(dest, "shard/b.bin"))  # staged anyway
    c = rep["shard/c.bin"]
    assert not c.ok and "connection reset" in c.err and c.n_bytes == 0
    # the retry loop: failed rows anti-join back to a smaller manifest
    failed = [r.relpath for r in rep.values() if not r.ok]
    assert sorted(failed) == ["shard/b.bin", "shard/c.bin"]


def test_fetch_manifest_rejects_escaping_relpaths(spark, tmp_path):
    """A manifest row is DATA: '../'-style or absolute relpaths must not
    write outside the staging dir (ADVICE r6)."""
    from pharmacodi_spark.sources.fetch import fetch_manifest

    dest = str(tmp_path / "stage")
    victim = tmp_path / "victim.txt"
    victim.write_text("precious")
    manifest = spark.createDataFrame(
        [
            ("http://x/evil.bin", "../victim.txt"),
            ("http://x/abs.bin", str(victim)),
            ("http://x/fine.bin", "ok/fine.bin"),
        ],
        "url string, relpath string",
    )
    rep = {
        r.relpath: r
        for r in fetch_manifest(manifest, lambda u: b"payload", dest).collect()
    }
    assert not rep["../victim.txt"].ok and rep["../victim.txt"].err == "bad relpath"
    assert not rep[str(victim)].ok and rep[str(victim)].err == "bad relpath"
    assert rep["ok/fine.bin"].ok
    assert victim.read_text() == "precious"  # never overwritten
    assert open(os.path.join(dest, "ok/fine.bin"), "rb").read() == b"payload"


def test_scrape_tables_extracts_rendered_rows(spark):
    from pyspark.sql import functions as F

    from pharmacodi_spark.sources.fetch import scrape_tables

    html = """
    <html><table>
      <tr><th>Gene</th><th>Target</th></tr>
      <tr><td><b>EGFR</b></td><td>erlotinib</td></tr>
      <tr><td>BRAF</td><td>vemurafenib</td></tr>
    </table></html>
    """
    pages = spark.createDataFrame([("http://site/p1",)], "url string")
    calls = {"n": 0}

    def browser(url: str) -> str:
        calls["n"] += 1
        if calls["n"] == 1:
            raise TimeoutError("page load")  # first render times out
        return html

    out = scrape_tables(pages, browser).orderBy("row_idx").collect()
    assert [r.cells for r in out] == [
        ["Gene", "Target"],
        ["EGFR", "erlotinib"],
        ["BRAF", "vemurafenib"],
    ]
    # downstream typing is plain dataflow
    typed = (
        scrape_tables(pages, lambda u: html)
        .where(F.col("row_idx") > 0)
        .select(
            F.element_at("cells", 1).alias("gene"),
            F.element_at("cells", 2).alias("drug"),
        )
    )
    assert {(r.gene, r.drug) for r in typed.collect()} == {
        ("EGFR", "erlotinib"), ("BRAF", "vemurafenib")
    }
