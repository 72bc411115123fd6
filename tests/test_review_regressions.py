"""Regression tests for review findings: NULL-payload routing, int64
fidelity through the bucketed join, resume-safe metrics/failed artifacts,
line-sink byte fidelity, PDF-path parity."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_null_html_routed_to_failed_not_dropped(tmp_path):
    import ray.data

    from basicocr_ray.pipelines.extract_pipeline import run_extract_job

    tab = pa.table(
        {
            "url": pa.array(["u:0", "u:1", "u:2"], pa.string()),
            "html": pa.array(
                [b"<p>good long paragraph content</p>", None, b"%PDF-FAKE\nx"],
                pa.large_binary(),
            ),
            "lang": pa.array(["en", "en", "en"], pa.string()),
        }
    )
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tab, src)
    out = str(tmp_path / "out")
    stats = run_extract_job(src, out)
    assert stats["n_rows"] == 3  # the NULL row must NOT vanish
    got = ray.data.read_parquet(out).to_pandas().set_index("url")
    assert not got.loc["u:1", "ok"]
    assert got.loc["u:0", "ok"] and got.loc["u:2", "ok"]


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_preserves_big_int64():
    import ray.data

    from basicocr_ray.stages.joins import bucketed_hash_join

    big = (1 << 53) + 1  # not representable in float64
    left = pd.DataFrame({"k": [1, 2], "lv": [big, big + 2]})
    right = pd.DataFrame({"k": [1, 2], "rv": [7, 8]})
    got = (
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", ["lv"], ["rv"], num_buckets=4,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert [int(v) for v in got["lv"]] == [big, big + 2]
    with pytest.raises(ValueError, match="both sides"):
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(left),
            "k", ["lv"], ["lv"],
        )


@pytest.mark.usefixtures("ray_session")
def test_resume_preserves_metrics_and_clears_failed(fixture_pages, tmp_path):
    from basicocr_ray.pipelines.extract_pipeline import run_extract_job
    from basicocr_ray.state.manifest import load_done_partitions

    out = str(tmp_path / "out")
    stats = run_extract_job(fixture_pages, out)
    m1 = pq.read_table(os.path.join(out, "_metrics", "metrics.parquet")).to_pandas()
    total1 = int(m1["n_docs"].sum())
    assert total1 == stats["n_rows"]

    # drop two manifests → partial rerun must keep full-corpus metrics
    fp = stats["input_fingerprint"]
    victims = sorted(load_done_partitions(out, fp))[:2]
    for v in victims:
        os.remove(os.path.join(out, "_manifests", f"part={v}.json"))
        # plant a stale failed mirror for a recomputed partition
        stale = os.path.join(out, "_failed", f"part-{v}.parquet")
        pq.write_table(
            pa.table({"url": pa.array(["stale"], pa.string()),
                      "lang": pa.array(["en"], pa.string()),
                      "error": pa.array(["stale"], pa.string()),
                      "partition_id": pa.array([v], pa.int32())}),
            stale,
        )
    run_extract_job(fixture_pages, out)
    m2 = pq.read_table(os.path.join(out, "_metrics", "metrics.parquet")).to_pandas()
    assert int(m2["n_docs"].sum()) == total1  # nothing lost on resume
    assert sorted(m2["partition_id"].unique()) == sorted(m1["partition_id"].unique())
    # stale mirror gone unless the rerun re-created it with real failures
    for v in victims:
        f = os.path.join(out, "_failed", f"part-{v}.parquet")
        if os.path.exists(f):
            df = pq.read_table(f).to_pandas()
            assert "stale" not in set(df["url"])


@pytest.mark.usefixtures("ray_session")
def test_write_lines_byte_fidelity(tmp_path):
    import glob

    import ray.data

    from basicocr_ray.sources.text import write_lines

    rows = [{"line": 'has, "comma" and quotes'}, {"line": " leading space"}]
    n = write_lines(ray.data.from_items(rows), str(tmp_path / "out"))
    assert n == 2
    content = "".join(
        open(f).read() for f in sorted(glob.glob(str(tmp_path / "out" / "*.txt")))
    )
    assert 'has, "comma" and quotes\n' in content
    assert " leading space\n" in content


@pytest.mark.usefixtures("ray_session")
def test_pdf_modes_agree_on_empty_pdf():
    import ray.data

    from basicocr_ray.config import ExtractConfig
    from basicocr_ray.pipelines.extract_pipeline import build_extract_ds

    rows = pa.table(
        {
            "url": pa.array(["p:0"], pa.string()),
            "html": pa.array([b"%PDF-FAKE\n"], pa.large_binary()),
            "lang": pa.array(["en"], pa.string()),
        }
    )

    def run(mode):
        ds = build_extract_ds(
            ray.data.from_arrow(rows), ExtractConfig(), pdf_branch=mode
        )
        df = ds.to_pandas()
        return df[["url", "main_text", "n_blocks", "n_blocks_kept", "ok"]]

    a, b, c, d = run(True), run("split"), run(False), run("finisher")
    assert a.equals(b) and b.equals(c) and c.equals(d)


# --- round-4 ADVICE regressions -------------------------------------------


def test_parse_outline_keeps_text_past_inline_children():
    from basicocr_ray.core.structured import parse_outline

    doc = "<h1>Hello <b>World</b></h1><p>body</p><h2>Sub <i>head</i> tail</h2>"
    out = parse_outline(doc)
    assert out == [(1, "1", "Hello World"), (2, "1.1", "Sub head tail")]
    # malformed: next heading opens before the close — don't swallow it
    out2 = parse_outline("<h1>A <h2>B</h2>")
    assert out2[0][2] == "A"
    assert out2[1][2] == "B"


def test_parse_gif_rejects_out_of_range_index_and_big_mcs():
    from basicocr_ray.core import gif as g

    good = g.encode_gif(2, 1, [(0, 0, 0), (255, 255, 255)], b"\x00\x01")
    assert g.parse_gif(good)["indices"] == b"\x00\x01"
    # image data: 13B header + 6B GCT (2 colors) + 10B descriptor + mcs
    mcs_at = 13 + 6 + 10
    assert good[mcs_at] == 2
    bad_mcs = bytearray(good)
    bad_mcs[mcs_at] = 12
    with pytest.raises(g.GifError):
        g.parse_gif(bytes(bad_mcs))
    # splice an LZW stream whose indices exceed the 2-entry palette
    lzw = g._lzw_encode(b"\x00\x03", 2)
    bad = bytearray(good[: mcs_at + 1])
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        bad.append(len(block))
        bad += block
    bad += b"\x00\x3b"
    with pytest.raises(g.GifError):
        g.parse_gif(bytes(bad))


def test_union_by_name_empty_input_raises_value_error():
    from basicocr_ray.stages.wide import union_by_name

    with pytest.raises(ValueError, match="at least one dataset"):
        union_by_name([])
