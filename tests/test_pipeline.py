"""Distributed correctness: byte-identity of the Ray pipeline vs the
single-doc oracle, invariance under batch size / parallelism, resume
semantics, skew splitting, failed routing, staged == fused."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basicocr_ray.config import ExtractConfig
from basicocr_ray.core.oracle import extract_one


def _expected_map(pages_path: str) -> dict[str, str]:
    tab = pq.read_table(pages_path, columns=["url", "html"])
    out = {}
    for url, html in zip(tab["url"].to_pylist(), tab["html"].to_pylist()):
        out[url] = extract_one(html)["main_text"]
    return out


@pytest.mark.usefixtures("ray_session")
def test_flagship_byte_identity_and_resume(fixture_pages, tmp_path):
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job
    from basicocr_ray.state.manifest import load_done_partitions

    out = str(tmp_path / "out")
    stats = run_extract_job(fixture_pages, out)
    assert not stats["skipped"]
    assert stats["n_rows"] == 800

    expected = _expected_map(fixture_pages)
    got = ray.data.read_parquet(out, columns=["url", "main_text", "ok"]).to_pandas()
    # duplicate urls exist in the fixture (1%): compare per output row
    n_checked = 0
    for url, text in zip(got["url"], got["main_text"]):
        if url in expected:
            # url-dup rows have two possible payloads; skip exact assert there
            dup = (got["url"] == url).sum() > 1
            if not dup:
                assert text == expected[url], url
                n_checked += 1
    assert n_checked >= 770
    assert (~got["ok"]).sum() == stats["n_failed"]

    # resume: all partitions recorded done, second run is a no-op
    stats2 = run_extract_job(fixture_pages, out)
    assert stats2["skipped"]

    # partial resume: drop one manifest → exactly that partition reruns
    fp = stats["input_fingerprint"]
    victims = sorted(load_done_partitions(out, fp))[:2]
    for v in victims:
        os.remove(os.path.join(out, "_manifests", f"part={v}.json"))
    stats3 = run_extract_job(fixture_pages, out)
    assert stats3["partitions_computed"] == 2
    assert stats3["partitions_done_prior"] == 30
    got2 = ray.data.read_parquet(out, columns=["url", "main_text"]).to_pandas()
    assert len(got2) == len(got)  # no duplicated output rows after resume


@pytest.mark.usefixtures("ray_session")
def test_stale_fingerprint_forces_recompute(fixture_pages, tmp_path):
    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    out = str(tmp_path / "out")
    run_extract_job(fixture_pages, out)
    # touch the input → fingerprint changes → everything recomputes
    os.utime(fixture_pages)
    stats = run_extract_job(fixture_pages, out)
    assert not stats["skipped"]
    assert stats["partitions_computed"] == 32


@pytest.mark.usefixtures("ray_session")
def test_batchsize_and_skew_invariance(fixture_pages, tmp_path):
    """The determinism property that actually guards distribution: results
    identical under different batch sizes and the skew-split branch."""
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import build_extract_ds
    from basicocr_ray.sources.pages import read_pages

    def run(cfg, **kw):
        ds = build_extract_ds(read_pages(fixture_pages), cfg, **kw)
        df = ds.to_pandas()[["url", "main_text"]]
        return df.sort_values(["url", "main_text"]).reset_index(drop=True)

    base = run(ExtractConfig())
    small = run(ExtractConfig(batch_size_small=7))
    skew = run(ExtractConfig(oversize_bytes=20_000), pdf_branch="split", skew_split=True)
    nopdf = run(ExtractConfig(), pdf_branch=False)
    split = run(ExtractConfig(), pdf_branch="split")
    finisher = run(ExtractConfig(), pdf_branch="finisher")
    assert base.equals(small)
    assert base.equals(skew)
    assert base.equals(nopdf)
    assert base.equals(split)
    assert base.equals(finisher)


@pytest.mark.usefixtures("ray_session")
def test_staged_equals_fused(fixture_pages):
    """tokenize → score → decode staged pipeline == fused extract_batch."""
    import ray.data

    from basicocr_ray.stages.extract import (
        decode_batch,
        extract_batch,
        score_batch,
        tokenize_batch,
    )

    pages = ray.data.read_parquet(fixture_pages, columns=["url", "html", "lang"])

    def not_pdf(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(
            pc.invert(pc.equal(pc.binary_slice(b["html"], 0, 4), b"%PDF"))
        )

    html_only = pages.map_batches(not_pdf, batch_format="pyarrow")
    fused = (
        html_only.map_batches(extract_batch, batch_format="pyarrow")
        .to_pandas()[["url", "main_text", "n_blocks_kept"]]
        .sort_values(["url", "main_text"])
        .reset_index(drop=True)
    )
    staged = (
        html_only.map_batches(tokenize_batch, batch_format="pyarrow")
        .map_batches(score_batch, batch_format="pyarrow")
        .map_batches(decode_batch, batch_format="pyarrow")
        .to_pandas()[["url", "main_text", "n_blocks_kept"]]
        # sort on BOTH columns: the fixture's duplicate-url rows carry
        # different payloads, and block arrival order is nondeterministic
        .sort_values(["url", "main_text"])
        .reset_index(drop=True)
    )
    assert fused.equals(staged)


@pytest.mark.usefixtures("ray_session")
def test_failed_routing(fixture_pages, tmp_path):
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    out = str(tmp_path / "out")
    stats = run_extract_job(fixture_pages, out)
    failed_dir = os.path.join(out, "_failed")
    assert os.path.isdir(failed_dir)
    failed = ray.data.read_parquet(failed_dir).to_pandas()
    assert len(failed) == stats["n_failed"]
    assert (failed["error"] != "").all()


@pytest.mark.usefixtures("ray_session")
def test_metrics_rollup(fixture_pages, tmp_path):
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    out = str(tmp_path / "out")
    stats = run_extract_job(fixture_pages, out)
    metrics = ray.data.read_parquet(os.path.join(out, "_metrics")).to_pandas()
    assert metrics["n_docs"].sum() == stats["n_rows"]
    assert set(metrics.columns) >= {
        "lang", "partition_id", "n_docs", "n_ok", "mean_blocks_kept",
        "n_bytes_in", "n_bytes_out",
    }


@pytest.mark.usefixtures("ray_session")
def test_identical_duplicate_rows_survive_exchange(tmp_path):
    """Two byte-identical input rows must yield two output rows even when
    each lands in its own spill batch: their fragments collide on the
    content-hash name by construction, and the multiplicity-aware merge
    re-emits the shared fragment once per metadata reference."""
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    html = b"<html><body><p>" + b"shared duplicated content here. " * 4 + b"</p></body></html>"
    rows = pa.table(
        {
            "url": pa.array(
                ["u:dup", "u:dup", "u:solo", "u:dup2", "u:dup2", "u:other"],
                pa.string(),
            ),
            "html": pa.array(
                [html, html, html + b"<!--x-->", html, html, html + b"<!--y-->"],
                pa.large_binary(),
            ),
            "lang": pa.array(["en"] * 6, pa.string()),
        }
    )
    src = str(tmp_path / "pages.parquet")
    pq.write_table(rows, src)
    out = str(tmp_path / "out")
    # spill_batch_rows=1 forces one fragment per row → identical rows
    # produce identical fragment names (the collision under test)
    stats = run_extract_job(src, out, spill_batch_rows=1)
    got = ray.data.read_parquet(out, columns=["url"]).to_pandas()
    assert stats["n_rows"] == 6
    assert len(got) == 6
    assert (got["url"] == "u:dup").sum() == 2
    assert (got["url"] == "u:dup2").sum() == 2


@pytest.mark.usefixtures("ray_session")
def test_fragment_count_bounded(fixture_pages, tmp_path):
    """Fragment-count guard: coarse spill batches keep the staged exchange's
    file count bounded (≪ rows × partitions), so the merge stage never
    becomes read-bound on tiny fragments."""
    from basicocr_ray.config import DEFAULT_CONFIG
    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    out = str(tmp_path / "out")
    stats = run_extract_job(fixture_pages, out)
    assert stats["n_fragments"] >= 1
    # each spill call writes ≤ P fragments; with 800 rows and 32k-row spill
    # batches there are only a handful of calls
    assert stats["n_fragments"] <= DEFAULT_CONFIG.num_partitions * 8


@pytest.mark.usefixtures("ray_session")
def test_custom_partition_count(fixture_pages, tmp_path):
    """The partition knob generalizes: P=7 produces 7 manifests, full
    row coverage, and intact byte-identity."""
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    out = str(tmp_path / "out7")
    stats = run_extract_job(
        fixture_pages, out, cfg=ExtractConfig(num_partitions=7)
    )
    assert stats["partitions_computed"] == 7
    assert stats["n_rows"] == 800
    got = ray.data.read_parquet(out, columns=["url", "main_text"]).to_pandas()
    assert len(got) == 800
    expected = _expected_map(fixture_pages)
    checked = 0
    for url, text in zip(got["url"], got["main_text"]):
        if url in expected and (got["url"] == url).sum() == 1:
            assert text == expected[url]
            checked += 1
    assert checked >= 770


@pytest.mark.usefixtures("ray_session")
def test_distributed_merge_metadata_p256(fixture_pages, tmp_path):
    """At large P the fragment metadata must never centralize: meta_mode
    'auto' switches to the groupby-routed distributed merge above P=64.
    P=256 run → full coverage, byte-identity, and resume still works."""
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job
    from basicocr_ray.state.manifest import load_done_partitions

    out = str(tmp_path / "out256")
    cfg = ExtractConfig(num_partitions=256)
    stats = run_extract_job(fixture_pages, out, cfg=cfg)
    assert stats["partitions_computed"] == 256
    assert stats["n_rows"] == 800

    got = ray.data.read_parquet(out, columns=["url", "main_text"]).to_pandas()
    assert len(got) == 800
    expected = _expected_map(fixture_pages)
    checked = 0
    for url, text in zip(got["url"], got["main_text"]):
        if url in expected and (got["url"] == url).sum() == 1:
            assert text == expected[url]
            checked += 1
    assert checked >= 770

    # every partition has a manifest (including zero-row ones) → no-op resume
    fp = stats["input_fingerprint"]
    assert len(load_done_partitions(out, fp)) == 256
    stats2 = run_extract_job(fixture_pages, out, cfg=cfg)
    assert stats2["skipped"]

    # partial resume through the distributed path: drop two manifests
    victims = sorted(load_done_partitions(out, fp))[:2]
    for v in victims:
        os.remove(os.path.join(out, "_manifests", f"part={v}.json"))
    stats3 = run_extract_job(fixture_pages, out, cfg=cfg)
    assert stats3["partitions_computed"] == 2
    got2 = ray.data.read_parquet(out, columns=["url", "main_text"]).to_pandas()
    assert len(got2) == len(got)


@pytest.mark.usefixtures("ray_session")
def test_merge_meta_modes_identical(fixture_pages, tmp_path):
    """Driver-collected and distributed metadata reduces publish identical
    output (same rows, same per-partition files) on the same input."""
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    outs = {}
    for mode in ("driver", "distributed"):
        out = str(tmp_path / f"out_{mode}")
        stats = run_extract_job(fixture_pages, out, meta_mode=mode)
        assert stats["n_rows"] == 800
        df = (
            ray.data.read_parquet(out, columns=["url", "main_text", "partition_id"])
            .to_pandas()
            .sort_values(["url", "main_text"])
            .reset_index(drop=True)
        )
        outs[mode] = df
    assert outs["driver"].equals(outs["distributed"])


@pytest.mark.usefixtures("ray_session")
def test_correction_postpass_byte_identity(fixture_pages):
    """Flagship byte-identity with the correction post-pass ON: the A3
    AC-strip + A2 trie-correct actor pools chained after decode
    (detect→recognize→correct, `Test.java:58-82` +
    `trietree_correct.py:245-274`) must equal the single-doc oracle
    followed by the SAME shared kernels — and be invariant to batch
    size.  The uncorrected flagship output (q13/q14 contract) must be
    unchanged by merely enabling the flag machinery."""
    from basicocr_ray.pipelines.extract_pipeline import (
        add_correction_stages,
        build_extract_ds,
    )
    from basicocr_ray.sources.pages import read_pages
    from basicocr_ray.stages.correct import ACStripper, TrieCorrector

    phrases = ["all rights reserved", "lorem ipsum"]
    entries = [("the", 100), ("and", 80), ("data", 60), ("page", 40)]
    cfg = ExtractConfig(correct=True)

    def run(batch_size):
        c = ExtractConfig(correct=True, batch_size_small=batch_size)
        ds = build_extract_ds(read_pages(fixture_pages), c)
        # elastic (1, 2) pools: a fixed-size pool on the 4-CPU test
        # session would reserve every CPU for idle actors and starve
        # the upstream extract tasks (deadlock)
        ds = add_correction_stages(
            ds, c, strip_phrases=phrases, trie_entries=entries,
            concurrency=(1, 2),
        )
        df = ds.to_pandas()[["url", "main_text"]]
        return df.sort_values(["url", "main_text"]).reset_index(drop=True)

    got = run(512)
    # oracle: same shared kernels applied to the single-doc extraction
    stripper = ACStripper(phrases, column="main_text")
    corrector = TrieCorrector(entries, max_cost=cfg.correct_max_cost)
    expected = _expected_map(fixture_pages)
    exp_corrected = {
        u: corrector.correct_text(stripper.ac.strip(t))
        for u, t in expected.items()
    }
    n_checked = 0
    dup_counts = got["url"].value_counts()
    for url, text in zip(got["url"], got["main_text"]):
        if url in exp_corrected and dup_counts[url] == 1:
            # dup-url rows carry two possible payloads; skip those
            assert text == exp_corrected[url], url
            n_checked += 1
    assert n_checked >= 770
    # invariance under batch size
    assert got.equals(run(7))
