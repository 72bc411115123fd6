"""Config-driven pipeline runner, line-stream source, IVF ANN."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_run_spec_end_to_end(tmp_path):
    from basicocr_ray.pipelines.spec import run_spec

    out = str(tmp_path / "specout")
    spec = {
        "input": {"table": "documents", "columns": ["doc_id", "text"]},
        "steps": [
            {"op": "strip_phrases", "phrases": ["vector window"]},
            {"op": "quality"},
            {"op": "fingerprint"},
            {"op": "filter_ge", "column": "n_tokens", "value": 10},
            {"op": "select", "columns": ["doc_id", "stripped_text",
                                         "n_tokens", "quality", "fp"]},
        ],
        "output": out,
    }
    ds = run_spec(spec, "/root/testdata/sf0.001")
    import ray.data

    df = ray.data.read_parquet(out).to_pandas()
    assert len(df) > 400
    assert set(df.columns) == {"doc_id", "stripped_text", "n_tokens",
                               "quality", "fp"}
    assert not df["stripped_text"].str.contains("vector window").any()
    assert (df["n_tokens"] >= 10).all()


@pytest.mark.usefixtures("ray_session")
def test_run_spec_gopher_and_upsample_ops():
    from basicocr_ray.pipelines.spec import run_spec

    ds = run_spec(
        {
            "input": {"table": "documents",
                      "columns": ["doc_id", "text", "lang"]},
            "steps": [{"op": "gopher_filter", "min_words": 20}],
        },
        "/root/testdata/sf0.001",
    )
    df = ds.to_pandas()
    assert 0 < len(df) < 500  # the gate actually filters
    assert (df["n_words"] >= 20).all()

    ds2 = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "lang"]},
            "steps": [
                {"op": "epoch_upsample",
                 "weights": {"en": 3}, "default": 1},
            ],
        },
        "/root/testdata/sf0.001",
    )
    df2 = ds2.to_pandas()
    en = df2[df2["lang"] == "en"]
    rest = df2[df2["lang"] != "en"]
    assert (en.groupby("doc_id")["copy_idx"].max() == 3).all()
    assert (rest.groupby("doc_id")["copy_idx"].max() == 1).all()


@pytest.mark.usefixtures("ray_session")
def test_run_spec_simhash_radius_op():
    from basicocr_ray.pipelines.spec import run_spec

    ds = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [{"op": "simhash_radius", "max_hamming": 2}],
        },
        "/root/testdata/sf0.001",
    )
    df = ds.to_pandas()
    assert set(df.columns) >= {"id_a", "id_b", "hamming"}
    assert (df["hamming"] <= 2).all()
    assert (df["id_a"] < df["id_b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_run_spec_unknown_op():
    from basicocr_ray.pipelines.spec import run_spec

    with pytest.raises(ValueError, match="unknown op"):
        run_spec(
            {"input": {"table": "documents"}, "steps": [{"op": "nope"}]},
            "/root/testdata/sf0.001",
        )


@pytest.mark.usefixtures("ray_session")
def test_read_lines_roundtrip(tmp_path):
    from basicocr_ray.sources.text import lines_to_table, read_lines

    p = tmp_path / "lines.txt"
    p.write_text("alpha beta\ngamma\ndelta epsilon zeta\n")
    ds = lines_to_table(read_lines(str(p)))
    lines = sorted(r["line"] for r in ds.take_all())
    assert lines == ["alpha beta", "delta epsilon zeta", "gamma"]


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_full_probe_equals_bruteforce():
    import ray.data

    from basicocr_ray.stages.embed import ann_topk, ivf_topk

    rng = np.random.default_rng(3)
    # clustered corpus (IVF's intended regime): 10 tight clusters
    centers = rng.standard_normal((10, 64)) * 4
    m = np.vstack([centers[i % 10] + 0.3 * rng.standard_normal(64)
                   for i in range(200)])
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(200)]
    ds = ray.data.from_items(rows)
    q = centers[0] + 0.3 * rng.standard_normal(64)
    exact = ann_topk(ds, q, k=10).to_pandas()
    full_probe = ivf_topk(
        ray.data.from_items(rows), q, k=10, n_clusters=8, n_probe=8
    ).to_pandas()
    assert exact["vec_id"].tolist() == full_probe["vec_id"].tolist()

    # pruned probing keeps decent recall on this corpus
    pruned = ivf_topk(
        ray.data.from_items(rows), q, k=10, n_clusters=8, n_probe=4
    ).to_pandas()
    recall = len(set(pruned["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.8


@pytest.mark.usefixtures("ray_session")
def test_quality_filter_and_url_ops():
    import ray.data

    from basicocr_ray.pipelines.spec import run_spec

    ds = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [
                {"op": "quality_filter", "min_words": 20, "min_stop_hits": 1},
            ],
        },
        "/root/testdata/sf0.001",
    )
    df = ds.to_pandas()
    assert {"qf_keep", "qf_reason"} <= set(df.columns)
    assert df.loc[~df["qf_keep"], "qf_reason"].ne("").all()
    assert df["qf_keep"].any()

    ds2 = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id"]},
            "steps": [],
        },
        "/root/testdata/sf0.001",
    )
    # normalize_url op over a synthesized url column
    import pyarrow as pa

    from basicocr_ray.pipelines.spec import OP_REGISTRY

    withurl = ds2.map_batches(
        lambda b: b.append_column(
            "url",
            pa.array(
                [f"HTTP://X.org:80/p{i}/?utm_source=a&b=1" for i in
                 b["doc_id"].to_pylist()],
                pa.string(),
            ),
        ),
        batch_format="pyarrow",
    )
    out = OP_REGISTRY["normalize_url"](withurl, {}).to_pandas()
    assert out["norm_url"].str.startswith("http://x.org/p").all()
    assert not out["norm_url"].str.contains("utm_source").any()


@pytest.mark.usefixtures("ray_session")
def test_run_spec_segment_and_decode_image_ops(tmp_path):
    """The round-2 spec ops compose through the config-driven runner."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basicocr_ray.pipelines.spec import run_spec
    from basicocr_ray.stages.multimodal import make_image_payload

    sf = str(tmp_path)
    vocab = {"alpha": "一丁", "beta": "丂七"}
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [vocab["alpha"] + vocab["beta"], vocab["beta"]], pa.string()
            ),
        }
    )
    pq.write_table(docs, f"{sf}/documents.parquet")
    seg = run_spec(
        {
            "input": {"table": "documents"},
            "steps": [{"op": "segment", "lexicon": sorted(vocab.values())}],
        },
        sf,
    ).to_pandas().sort_values("doc_id")
    assert seg["n_segments"].tolist() == [2, 1]

    imgs = pa.table(
        {
            "item_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [make_image_payload(0, 16, 8), make_image_payload(1, 20, 10)],
                pa.large_binary(),
            ),
        }
    )
    pq.write_table(imgs, f"{sf}/images.parquet")
    feats = run_spec(
        {
            "input": {"table": "images"},
            "steps": [{"op": "decode_image"}],
        },
        sf,
    ).to_pandas().sort_values("item_id")
    assert feats["ok"].all()
    assert feats["width"].tolist() == [16, 20]


@pytest.mark.usefixtures("ray_session")
def test_read_jsonl_routes_corrupt_lines(tmp_path):
    """Declared-schema JSONL read: good lines parse with missing keys as
    NULL, corrupt lines (bad JSON, non-object, uncoercible value) route
    to the quarantine columns instead of failing the task; strict mode
    drops them."""
    import pyarrow as pa

    from basicocr_ray.sources.jsonl import read_jsonl, write_jsonl

    p = tmp_path / "crawl.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "hello world", "lang": "en"}',
                '{"doc_id": 2, "text": "missing lang"}',
                "{not json at all",
                '[1, 2, 3]',
                '{"doc_id": "NaN-ish", "text": "bad id type"}',
                "",
                '{"doc_id": 3, "text": null, "lang": "de"}',
            ]
        )
        + "\n"
    )
    fields = {
        "doc_id": pa.int64(),
        "text": pa.string(),
        "lang": pa.string(),
    }
    got = (
        read_jsonl(str(p), fields, keep_corrupt=True)
        .to_pandas()
        .sort_values(["_corrupt", "doc_id"])
        .reset_index(drop=True)
    )
    ok = got[~got["_corrupt"]]
    bad = got[got["_corrupt"]]
    assert ok["doc_id"].tolist() == [1.0, 2.0, 3.0]
    assert ok["lang"].tolist()[1] is None or pd.isna(ok["lang"].tolist()[1])
    assert len(bad) == 3 and all(bad["doc_id"].isna())
    assert "{not json at all" in bad["_raw"].tolist()

    strict = read_jsonl(str(p), fields).to_pandas()
    assert len(strict) == 3 and "_corrupt" not in strict.columns

    # roundtrip: write the clean rows, re-read, same relation
    import ray.data

    out_dir = tmp_path / "out"
    n = write_jsonl(
        ray.data.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3], "text": ["a", "b", "c"]}
            )
        ),
        str(out_dir),
    )
    assert n == 3
    back = (
        read_jsonl(
            str(out_dir), {"doc_id": pa.int64(), "text": pa.string()}
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back["doc_id"].tolist() == [1, 2, 3]
    assert back["text"].tolist() == ["a", "b", "c"]


def test_read_csv_quarantine_and_roundtrip(tmp_path):
    """Declared-schema CSV read: RFC-4180 quoting honored, the header is
    recognized by content (read_text erases file boundaries), wrong field
    counts and uncoercible cells route to quarantine, empty cells are
    NULL; the content-hash writer roundtrips."""
    import pyarrow as pa

    from basicocr_ray.sources.csvfile import read_csv_quarantine, write_csv

    p = tmp_path / "meta.csv"
    p.write_text(
        "\n".join(
            [
                "doc_id,lang,score",          # header (content-recognized)
                "1,en,0.5",
                '2,"fr,ca",1.25',             # quoted delimiter
                "3,de,",                      # empty cell -> NULL
                "4,en",                       # wrong field count
                "notanint,en,0.1",            # uncoercible cell
                "",                           # blank: ignored
            ]
        )
        + "\n"
    )
    fields = {"doc_id": pa.int64(), "lang": pa.string(), "score": pa.float64()}
    got = (
        read_csv_quarantine(str(p), fields, keep_corrupt=True)
        .to_pandas()
        .sort_values(["_corrupt", "doc_id"])
        .reset_index(drop=True)
    )
    ok = got[~got["_corrupt"]]
    bad = got[got["_corrupt"]]
    assert ok["doc_id"].tolist() == [1.0, 2.0, 3.0]
    assert ok["lang"].tolist() == ["en", "fr,ca", "de"]
    assert pd.isna(ok["score"].tolist()[2])
    assert len(bad) == 2 and all(bad["doc_id"].isna())
    assert "4,en" in bad["_raw"].tolist()

    strict = read_csv_quarantine(str(p), fields).to_pandas()
    assert len(strict) == 3 and "_corrupt" not in strict.columns

    import ray.data

    out_dir = tmp_path / "out"
    n = write_csv(
        ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "note": ['say "hi", ok', "b"]})
        ),
        str(out_dir),
    )
    assert n == 2
    back = (
        read_csv_quarantine(
            str(out_dir),
            {"doc_id": pa.int64(), "note": pa.string()},
            header=False,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back["note"].tolist() == ['say "hi", ok', "b"]


def test_warc_roundtrip_and_quarantine(tmp_path):
    """WARC codec: encode→parse is identity on well-formed records;
    malformed records (bad Content-Length, truncation) quarantine and
    the scan resynchronizes at the next record magic; read_warc streams
    files into typed rows."""
    import pyarrow as pa

    from basicocr_ray.sources.warc import (
        encode_warc,
        encode_warc_record,
        parse_warc,
        read_warc,
    )

    recs = [
        ("https://a.example/1", "2026-01-01T00:00:00Z", b"hello world"),
        ("https://a.example/2", "2026-01-01T00:00:01Z", b""),
        # payload containing bytes that look like record structure
        ("https://a.example/3", "2026-01-01T00:00:02Z",
         b"WARC/1.0\r\nnot a real header\r\n\r\nbody"),
    ]
    blob = encode_warc(recs)
    back = parse_warc(blob)
    assert [(r["uri"], r["payload"]) for r in back] == [
        (u, p) for u, _, p in recs
    ]
    assert not any(r["_corrupt"] for r in back)

    # corrupt middle record: Content-Length lies past EOF of its body,
    # but a full record follows and must still be recovered
    bad = (
        encode_warc_record("https://a.example/ok1", "d", b"aaa")
        + b"WARC/1.0\r\nWARC-Target-URI: https://a.example/bad\r\n"
        + b"Content-Length: notanint\r\n\r\nxxx\r\n\r\n"
        + encode_warc_record("https://a.example/ok2", "d", b"bbb")
    )
    parsed = parse_warc(bad)
    oks = [r for r in parsed if not r["_corrupt"]]
    bads = [r for r in parsed if r["_corrupt"]]
    assert [r["payload"] for r in oks] == [b"aaa", b"bbb"]
    assert len(bads) == 1 and bads[0]["uri"] == "https://a.example/bad"

    # truncated final record
    trunc = encode_warc_record("https://a.example/t", "d", b"0123456789")
    parsed = parse_warc(trunc[:-8])
    assert parsed[-1]["_corrupt"]

    # file-based distributed read
    (tmp_path / "a.warc").write_bytes(blob)
    (tmp_path / "b.warc").write_bytes(bad)
    got = (
        read_warc([str(tmp_path / "a.warc"), str(tmp_path / "b.warc")])
        .to_pandas()
        .sort_values("uri")
        .reset_index(drop=True)
    )
    assert len(got) == 5 and "_corrupt" not in got.columns
    withq = read_warc(str(tmp_path / "b.warc"), keep_corrupt=True).to_pandas()
    assert withq["_corrupt"].sum() == 1


def test_global_prefix_sum_matches_window_sql(tmp_path):
    """global_prefix_sum == SUM OVER (ORDER BY md5(seed:id), id) exclusive,
    invariant to input partitioning and salt count."""
    import duckdb
    import pandas as pd
    import ray.data

    from basicocr_ray.stages.sample import global_prefix_sum

    df = pd.DataFrame({"id": list(range(200)), "v": [i % 7 for i in range(200)]})
    want = duckdb.sql(
        """
        SELECT id, coalesce(sum(v) OVER (
          ORDER BY md5('9:' || CAST(id AS VARCHAR)), id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        FROM df ORDER BY id
        """
    ).df()
    for nblocks, salts in [(1, 4), (7, 4), (7, 16)]:
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            global_prefix_sum(ds, "id", "v", seed=9, num_salt=salts)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert got["prefix"].astype("int64").tolist() == want[
            "prefix"
        ].astype("int64").tolist()


def test_spec_pack_and_warc_input(tmp_path):
    """Spec surface: the `pack` op realizes the q100 packing semantics;
    a WARC file drives a spec pipeline end-to-end via input format."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from basicocr_ray.pipelines.spec import OP_REGISTRY, run_spec
    from basicocr_ray.sources.warc import encode_warc

    import ray.data

    df = pd.DataFrame({"doc_id": range(50), "n_tok": [(i % 9) + 1 for i in range(50)]})
    got = (
        OP_REGISTRY["pack"](
            ray.data.from_pandas(df).repartition(4),
            {"bin_size": 16, "seed": 9},
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        SELECT doc_id,
               coalesce(sum(n_tok) OVER (
                 ORDER BY md5('9:' || CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // 16 AS bin_id
        FROM df ORDER BY doc_id
        """
    ).df()
    assert got["bin_id"].astype("int64").tolist() == want["bin_id"].astype(
        "int64"
    ).tolist()

    blob = encode_warc(
        [(f"https://w.example/{i}", "2026-01-01T00:00:00Z",
          f"payload {i}".encode()) for i in range(20)]
    )
    (tmp_path / "x.warc").write_bytes(blob)
    out = run_spec(
        {
            "input": {"format": "warc", "path": str(tmp_path / "x.warc")},
            "steps": [{"op": "select", "columns": ["uri", "payload"]}],
        },
        sf_dir="/unused",
    ).to_pandas()
    assert len(out) == 20 and set(out.columns) == {"uri", "payload"}


def test_spec_chunk_and_robots_ops():
    """chunk_windows fans rows out with provenance and full word
    coverage; robots_filter drops disallowed (host, path-prefix) urls."""
    import pandas as pd
    import ray.data

    from basicocr_ray.pipelines.spec import OP_REGISTRY

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["w" + " w".join(str(i) for i in range(70)), "short text"],
        }
    )
    out = (
        OP_REGISTRY["chunk_windows"](
            ray.data.from_pandas(docs), {"width": 32, "stride": 24}
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    # 70 words: starts 0,24,48 -> 32,32,22 words; every word covered
    assert d1["n_words"].tolist() == [32, 32, 22]
    covered = set()
    for st, txt in zip([0, 24, 48], d1["chunk_text"]):
        covered.update(range(st, st + len(txt.split())))
    assert covered == set(range(70))
    assert out[out["doc_id"] == 2]["n_words"].tolist() == [2]

    urls = pd.DataFrame(
        {
            "url": [
                "https://a.com/keep/1",
                "https://a.com/private/2",
                "https://B.com/private/3",   # host case-folded
                "https://c.com/private/4",   # no rule for c.com
            ]
        }
    )
    kept = OP_REGISTRY["robots_filter"](
        ray.data.from_pandas(urls),
        {"rules": {"a.com": ["/private"], "b.com": ["/private"]}},
    ).to_pandas()
    assert sorted(kept["url"]) == [
        "https://a.com/keep/1", "https://c.com/private/4"
    ]


def test_warc_encode_rejects_header_injection():
    """A CR/LF in a header value would re-frame the record (payload
    silently lost); the encoder must refuse loudly."""
    import pytest

    from basicocr_ray.sources.warc import encode_warc_record

    with pytest.raises(ValueError, match="CR/LF"):
        encode_warc_record("https://x/\r\n\r\nEVIL", "d", b"payload")
    with pytest.raises(ValueError, match="CR/LF"):
        encode_warc_record("https://x/", "2026\n01", b"p")
