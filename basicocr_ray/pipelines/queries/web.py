"""Web/crawl ops: hosts, canonicalization, robots, link graph, crawl planning (north_star web-page domain).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_hex
from basicocr_ray.stages.wide import count_terms
from basicocr_ray.stages.wide import token_items

from ._shared import (
    _TOKS,
    _read,
    _round_half_up,
)


def q53_url_host_rollup(sf_dir: str):
    """Per-host crawl rollup — the first aggregate any web-scale corpus
    audit runs (pages per host, bytes per host). Urls are planted
    deterministically from doc_id (documents carries no url column; the
    q50 planting discipline keeps the oracle exact); host extraction and
    the rollup are PURE ARROW kernels (`split_pattern` + `list_element`
    + partial/final groupby) — zero Python per row, the vectorization
    pattern the brief asks every hot stage to follow."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def rollup_partial(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"]
        # doc_id % 50 (pyarrow ships no modulo kernel; int divide truncates
        # and doc_id ≥ 0, so x − (x÷50)·50 is exact)
        mod50 = pc.subtract(
            did, pc.multiply(pc.divide(did, pa.scalar(50)), pa.scalar(50))
        )
        urls = pc.binary_join_element_wise(
            pa.scalar("https://host"),
            pc.cast(mod50, pa.string()),
            pa.scalar(".example.com/page/"),
            pc.cast(did, pa.string()),
            pa.scalar(""),
        )
        hosts = pc.list_element(pc.split_pattern(urls, "/"), 2)
        t = pa.table({"host": hosts, "n_chars": batch["n_chars"]})
        df = t.to_pandas()
        g = df.groupby("host", as_index=False).agg(
            n_pages=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(rollup_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )
    df = out.to_pandas()
    return df.astype({"n_pages": "int64", "sum_chars": "int64"})


def q101_crawl_diff(sf_dir: str):
    """Crawl SNAPSHOT DIFF — recrawl triage (added / removed / changed /
    same) between two crawl waves, derived deterministically from
    `documents`: wave A holds doc_id % 10 ≠ 0, wave B holds doc_id % 7 ≠ 0
    with text revised ('<text> v2') where doc_id % 5 = 0. The diff is ONE
    full-outer bucketed hash join on doc_id carrying (id, md5-fingerprint)
    only — text never shuffles (the D3 fingerprint discipline) — then a
    vectorized status classification and a tiny rollup."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def wave_a(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % 10 != 0))
        fps = [md5_hex(t) for t in b["text"].to_pylist()]
        return pa.table(
            {"doc_id": b["doc_id"], "fp_a": pa.array(fps, pa.string())}
        )

    def wave_b(b: pa.Table) -> pa.Table:
        allids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(allids % 7 != 0))
        ids = b["doc_id"].to_pylist()
        fps = [
            md5_hex(t + " v2" if i % 5 == 0 else t)
            for i, t in zip(ids, b["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": b["doc_id"], "fp_b": pa.array(fps, pa.string())}
        )

    from basicocr_ray.stages.joins import bucketed_hash_join

    a = ds.map_batches(wave_a, batch_format="pyarrow")
    bds = ds.map_batches(wave_b, batch_format="pyarrow")

    def classify(t: pa.Table) -> pa.Table:
        fa, fb = t["fp_a"], t["fp_b"]
        a_null = pc.is_null(fa)
        b_null = pc.is_null(fb)
        status = pc.if_else(
            a_null,
            pa.scalar("added"),
            pc.if_else(
                b_null,
                pa.scalar("removed"),
                pc.if_else(
                    pc.equal(fa, fb), pa.scalar("same"), pa.scalar("changed")
                ),
            ),
        )
        # in-bucket partial rollup: the status relation leaves the join
        # task as ≤4 rows per bucket
        out = pa.table({"status": status}).group_by("status").aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["status", "n_docs"])

    joined = bucketed_hash_join(
        a, bds, key="doc_id",
        left_columns=["fp_a"], right_columns=["fp_b"],
        join_type="full outer", bucket_post_fn=classify,
    )
    df = (
        joined.groupby("status")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    df["n_docs"] = df["n_docs"].astype("int64")
    return df


def q102_warc_roundtrip(sf_dir: str):
    """WARC codec conformance as a streaming pipeline: each batch of
    documents is ENCODED into a WARC/1.0 file image (`sources/warc.py` —
    the Common-Crawl container) and immediately PARSED back, and the
    per-lang rollup of the decoded payloads must match SQL computed from
    the original table — any header, Content-Length or boundary bug
    breaks the hash. Encode+decode stay inside one map_batches (zero shuffle); the
    rollup is the tiny G7 aggregate."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.sources.warc import encode_warc, parse_warc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def roundtrip(b: pa.Table) -> pa.Table:
        recs = [
            (
                f"https://example.org/doc/{i}",
                "2026-01-01T00:00:00Z",
                t.encode("utf-8"),
            )
            for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist())
        ]
        blob = encode_warc(recs)
        parsed = parse_warc(blob)
        if any(r["_corrupt"] for r in parsed):
            raise ValueError("WARC roundtrip produced corrupt records")
        ids = [int(r["uri"].rsplit("/", 1)[1]) for r in parsed]
        nch = [len(r["payload"].decode("utf-8")) for r in parsed]
        langs = dict(
            zip(b["doc_id"].to_pylist(), b["lang"].to_pylist())
        )
        return pa.table(
            {
                "lang": pa.array([langs[i] for i in ids], pa.string()),
                "n_chars": pa.array(nch, pa.int64()),
            }
        )

    df = (
        ds.map_batches(roundtrip, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
        )
        .to_pandas()
    )
    df["n_docs"] = df["n_docs"].astype("int64")
    df["sum_chars"] = df["sum_chars"].astype("int64")
    return df


def q103_pagerank_hosts(sf_dir: str):
    """PageRank over the host graph — the canonical web link-analysis
    op, as join-based SpMV (`stages/graph.py`): each of the 3 fixed
    iterations is ONE bucketed hash join (ranks ⋈ edges on src, with the
    per-dst pre-sum fused into the join bucket) plus one aggregate —
    rows shuffle once per round, no driver materialization (the q42
    connected-components discipline with weighted mass instead of min
    labels). Hash-exact because ranks are carried as INTEGER numerators:
    every host has out-degree exactly 3, so with d = 17/20 the rank
    after k rounds is a rational with denominator N·60^k — the engine
    propagates the int64 numerators and performs ONE final IEEE division
    (the q95 discipline). Nodes are doc hosts (doc_id % 64) massed by
    doc count; the teleport vector is the document-mass distribution
    (personalized PageRank), keeping everything data-derived and
    integer."""
    from ray.data.aggregate import Count

    from basicocr_ray.stages.graph import pagerank_scaled_int

    H = 64
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def hostify(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(ids % H, pa.int64())})

    nodes = (
        ds.map_batches(hostify, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="mass"))
        .materialize()
    )

    def mk_edges(b: pa.Table) -> pa.Table:
        hs = b["h"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.repeat(hs, 3)
        dst = np.stack(
            [(3 * hs + 1) % H, (5 * hs + 2) % H, (7 * hs + 4) % H], axis=1
        ).reshape(-1)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    edges = nodes.map_batches(mk_edges, batch_format="pyarrow")
    # 64 hosts → 4 buckets; a real host graph would keep the default 32+
    out, scale = pagerank_scaled_int(nodes, edges, iters=3, num_buckets=4)

    df = out.to_pandas()
    n_total = int(df["mass"].sum())  # the full node relation is already
    # on the driver for the final frame — no extra distributed pass
    df["h"] = df["h"].astype("int64")
    df["mass"] = df["mass"].astype("int64")
    df["x"] = df["x"].astype("int64")
    df["pr"] = [
        _round_half_up(float(x) / float(n_total * scale), 8) for x in df["x"]
    ]
    return df


def q106_url_canonicalize(sf_dir: str):
    """URL canonicalization (`core/textstats.py:normalize_url`, the
    spec-surface `normalize_url` op) — the crawl-frontier key
    normalization, exercised over a deterministic spread of messy URL
    spellings derived from doc_id (mixed-case scheme/host, default and
    NON-default ports on both schemes, utm tracking params, unsorted
    params, bare '?', fragments). A pure vectorized per-batch map, zero
    shuffle; the oracle constructs the expected canonical form
    analytically from the same doc_id arithmetic, so every rule (strip
    :443 only on https, keep :80 on https, drop utm_*, sort by key,
    drop fragment) is independently pinned."""
    from basicocr_ray.core.textstats import normalize_url as canonicalize_url

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_and_canon(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        out = []
        for i in ids:
            scheme = "HTTPS" if i % 2 == 1 else "http"
            port = ":443" if i % 3 == 0 else (":80" if i % 3 == 1 else "")
            q = (
                "?b=2&A=1&utm_campaign=z"
                if i % 4 == 0
                else "?x=1" if i % 4 == 1 else "?" if i % 4 == 2 else ""
            )
            frag = "#sec" if i % 6 == 0 else ""
            raw = (
                f"{scheme}://WWW.Site{i % 7}.Example.COM{port}/p/{i}{q}{frag}"
            )
            out.append(canonicalize_url(raw))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "url": pa.array(out, pa.string()),
            }
        )

    return ds.map_batches(mk_and_canon, batch_format="pyarrow")


def q110_robots_filter(sf_dir: str):
    """robots.txt-style URL filtering — the crawl-side gate every fetch
    pipeline runs: a per-host DISALLOW prefix table (bounded: one robots
    file per host) broadcasts once via ray.put; each page tests its path
    against its host's prefixes in a zero-shuffle streaming scan
    (startswith = the robots longest-prefix-ignored simple form); rollup
    counts allowed/blocked per host. Urls derive deterministically from
    doc_id (host = site<doc_id%7>, path = /p/<doc_id>), and hosts 0/3/6
    disallow the '/p/1' prefix while hosts 1/4 disallow '/p/2' — so the
    oracle pins the exact rule semantics with LIKE arithmetic."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    rules = {
        f"site{k}": (["/p/1"] if k % 3 == 0 else
                     ["/p/2"] if k % 3 == 1 else [])
        for k in range(7)
    }
    rules_ref = ray.put(rules)

    def classify(b: pa.Table) -> pa.Table:
        import ray as _ray

        r = _ray.get(rules_ref)
        hosts, allowed, blocked = [], [], []
        agg: dict[str, list[int]] = {}
        for i in b["doc_id"].to_pylist():
            host = f"site{i % 7}"
            path = f"/p/{i}"
            bad = any(path.startswith(p) for p in r.get(host, ()))
            a = agg.setdefault(host, [0, 0])
            a[1 if bad else 0] += 1
        for host, (n_ok, n_bad) in agg.items():
            hosts.append(host)
            allowed.append(n_ok)
            blocked.append(n_bad)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_allowed": pa.array(allowed, pa.int64()),
                "n_blocked": pa.array(blocked, pa.int64()),
            }
        )

    df = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_allowed", alias_name="n_allowed"),
            Sum("n_blocked", alias_name="n_blocked"),
        )
        .to_pandas()
    )
    df["n_allowed"] = df["n_allowed"].astype("int64")
    df["n_blocked"] = df["n_blocked"].astype("int64")
    return df


def q114_blocklist_filter(sf_dir: str):
    """C4-style BAD-WORD filtering (Raffel et al. 2020 §2.2 — drop any
    page containing a blocklisted word): the blocklist broadcasts once
    (bounded by construction — a curated list, not a vocabulary), each
    doc streams through a zero-shuffle membership scan, and the rollup
    reports kept/dropped doc and char counts per lang. The blocklist
    derives deterministically from the corpus vocabulary (every 13th
    token by md5 order) so the oracle can reconstruct it exactly —
    integers end to end."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text", "lang", "n_chars"])

    # blocklist: every 13th distinct corpus token under md5 order — a
    # deterministic, corpus-derived stand-in for a curated list
    vocab = count_terms(ds, "text", token_items, "token")

    def pick(b: pa.Table) -> pa.Table:
        toks = [
            t for t in b["token"].to_pylist()
            if int(md5_hex(t)[:8], 16) % 13 == 0
        ]
        return pa.table({"token": pa.array(toks, pa.string())})

    bad = sorted(
        r["token"] for r in collect_rows(
            vocab.map_batches(pick, batch_format="pyarrow")
        )
    )  # bounded: |vocab|/13 at fixture scale; a curated list in prod
    bad_ref = ray.put(frozenset(bad))

    def classify(b: pa.Table) -> pa.Table:
        import ray as _ray

        bset = _ray.get(bad_ref)
        langs = b["lang"].to_pylist()
        nch = b["n_chars"].to_pylist()
        agg: dict[str, list[int]] = {}
        for text, lang, n in zip(b["text"].to_pylist(), langs, nch):
            blocked = any(t in bset for t in token_items(text or ""))
            a = agg.setdefault(lang, [0, 0, 0, 0])
            if blocked:
                a[1] += 1
                a[3] += int(n)
            else:
                a[0] += 1
                a[2] += int(n)
        rows = sorted(agg.items())
        return pa.table(
            {
                "lang": pa.array([k for k, _ in rows], pa.string()),
                "n_kept": pa.array([v[0] for _, v in rows], pa.int64()),
                "n_dropped": pa.array([v[1] for _, v in rows], pa.int64()),
                "kept_chars": pa.array([v[2] for _, v in rows], pa.int64()),
                "dropped_chars": pa.array(
                    [v[3] for _, v in rows], pa.int64()
                ),
            }
        )

    df = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_kept", alias_name="n_kept"),
            Sum("n_dropped", alias_name="n_dropped"),
            Sum("kept_chars", alias_name="kept_chars"),
            Sum("dropped_chars", alias_name="dropped_chars"),
        )
        .to_pandas()
    )
    for c in ("n_kept", "n_dropped", "kept_chars", "dropped_chars"):
        df[c] = df[c].astype("int64")
    return df


def q119_latest_by_url(sf_dir: str):
    """Snapshot COMPACTION (upsert/keep-latest — what a recrawl store runs
    before training ever sees the data): a versioned corpus derived
    deterministically from `documents` (version v∈{0,1,2} exists when
    (doc_id+v) % 3 ≠ 0, ts = doc_id·10+v, fp = md5(text ∥ ' v<v>')) is
    reduced to the max-ts row per doc. The fan-out and the per-batch
    partial argmax happen in the SAME task (all versions of a doc are
    emitted together), so the shuffle carries one (id, ver, ts, fp) row
    per doc per batch and the coarse-group final argmax is exact — text
    itself never moves."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def versions(batch: pa.Table) -> pa.Table:
        out_id, out_v, out_ts, out_fp = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            best = None
            for v in range(3):
                if (did + v) % 3 == 0:
                    continue
                # oracle lockstep: NULL text → NULL fp (md5(NULL) is NULL)
                fp = md5_hex(f"{t} v{v}") if t is not None else None
                row = (did * 10 + v, v, fp)
                if best is None or row[0] > best[0]:
                    best = row
            if best is not None:  # partial argmax: one row per doc
                out_id.append(did)
                out_v.append(best[1])
                out_ts.append(best[0])
                out_fp.append(best[2])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "ver": pa.array(out_v, pa.int64()),
                "ts": pa.array(out_ts, pa.int64()),
                "fp": pa.array(out_fp, pa.string()),
            }
        )

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "ts"], kind="mergesort")
        return df.groupby("doc_id", as_index=False).last()

    return coarse_group_reduce(
        ds.map_batches(versions, batch_format="pyarrow"),
        "doc_id",
        keep_latest,
    )


def q125_crawl_budget(sf_dir: str):
    """Crawl-budget APPORTIONMENT — dividing a fixed fetch budget of
    B=1000 across sources proportional to their doc counts with the
    largest-remainder (Hamilton) method, EXACT in integers: base =
    B·n // total, the B − Σbase leftover slots go to the largest
    remainders (ties → source asc), so Σ quota == B always. Counts
    come from a bounded groupby (|sources| rows); the apportionment
    itself is O(|sources|) driver arithmetic — the correct place for
    it at any corpus size."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["source"])
    counts = (
        ds.groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return _hamilton_quota(counts, "source", "n_docs", 1000)


def _hamilton_quota(
    counts: pd.DataFrame, key_col: str, n_col: str, budget: int
) -> pd.DataFrame:
    """Largest-remainder (Hamilton) apportionment, EXACT in integers:
    base = B·n // total, the B − Σbase leftover slots go to the largest
    remainders (ties → key asc), so Σ quota == B always. O(|keys|)
    driver arithmetic on a bounded relation (shared by q125/q146)."""
    counts = counts.sort_values(key_col).reset_index(drop=True)
    B = budget
    total = int(counts[n_col].sum())
    n = counts[n_col].astype("int64")
    base = (B * n) // total
    rem = (B * n) % total
    extra = B - int(base.sum())
    order = sorted(
        range(len(counts)),
        key=lambda i: (-int(rem.iloc[i]), counts[key_col].iloc[i]),
    )
    quota = base.copy()
    for i in order[:extra]:
        quota.iloc[i] += 1
    return pd.DataFrame(
        {
            key_col: counts[key_col],
            n_col: n.astype("int64"),
            "quota": quota.astype("int64"),
        }
    )


def q146_crawl_plan(sf_dir: str):
    """END-TO-END crawl PLANNING — the q88 composition discipline
    applied to the crawl side, one hash-checked chain: messy raw URLs
    (mixed-case scheme/host, tracking params) → REAL canonicalization
    (`normalize_url`) → robots disallow-prefix gate on the canonical
    host (broadcast rules, zero shuffle) → frontier DEDUP on the
    canonical (host, path) key (q65 exact-distinct discipline — the
    path spread i%400 makes collisions real) → per-host counts →
    largest-remainder budget of B=500 (`_hamilton_quota`, shared with
    q125). Every stage is the production kernel; the oracle replays
    the chain analytically from the same doc_id arithmetic."""
    import ray
    from ray.data.aggregate import Sum

    from basicocr_ray.core.textstats import normalize_url
    from basicocr_ray.stages.dedup import _coarse_salts
    from basicocr_ray.stages.wide import local_distinct_cg

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    rules = {
        f"www.site{k}.example.com": (
            ["/p/1"] if k % 3 == 0 else ["/p/2"] if k % 3 == 1 else []
        )
        for k in range(7)
    }
    rules_ref = ray.put(rules)
    salts = _coarse_salts(None)

    def canon_and_gate(b: pa.Table) -> pa.Table:
        from urllib.parse import urlsplit

        r = ray.get(rules_ref)
        hosts, paths = [], []
        for i in b["doc_id"].to_pylist():
            scheme = "HTTPS" if i % 2 else "HTTP"
            utm = "?utm_source=x" if i % 5 == 0 else ""
            raw = f"{scheme}://WWW.Site{i % 7}.Example.COM/p/{i % 400}{utm}"
            parts = urlsplit(normalize_url(raw))
            host, path = parts.hostname, parts.path
            if any(path.startswith(p) for p in r.get(host, ())):
                continue  # robots-blocked
            hosts.append(host)
            paths.append(path)
        t = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "path": pa.array(paths, pa.string()),
            }
        )
        # local frontier dedup, then coarse-group key on the path hash
        # (shared q65-discipline kernel)
        return local_distinct_cg(t, ["host", "path"], "path", salts)

    def host_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["host", "path"])
        out = d.groupby("host", as_index=False).size()
        return out.rename(columns={"size": "n_urls"})

    counts = (
        ds.map_batches(canon_and_gate, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(host_counts, batch_format="pandas")
        .groupby("host")
        .aggregate(Sum("n_urls", alias_name="n_urls"))
        .to_pandas()
    )
    counts["n_urls"] = counts["n_urls"].astype("int64")
    return _hamilton_quota(counts, "host", "n_urls", 500)


def q147_link_graph(sf_dir: str):
    """OUTLINK extraction → host LINK GRAPH — the web-native structure
    pass the flagship's text extraction doesn't expose: every document
    is wrapped into its real boilerplate HTML page (`wrap_single`, the
    flagship fixture path) with two deterministic absolute outlinks
    injected into the body; a compiled-regex kernel pulls
    `href="http(s)://…"` targets from the markup (relative boilerplate
    links are excluded by the absolute-URL filter — a deterministic
    precision contract), hosts parse out, and the bounded (src_host,
    dst_host) edge rollup is the input q103's PageRank consumes. The
    oracle is the analytic link contract (recall and precision 1.0 by
    construction — the q121/q127 discipline for kernels SQL can't
    run)."""
    import re

    from ray.data.aggregate import Sum

    from basicocr_ray.sources.docpages import wrap_single

    HREF = re.compile(rb'href="(https?://[^"]+)"')

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def edges_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        from urllib.parse import urlsplit

        cnt: Counter = Counter()
        for i, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            page = wrap_single(t or "", i)
            links = (
                f'<p><a href="http://site{(3 * i + 1) % 7}.example.com'
                f'/p/{i % 100}">more</a> '
                f'<a href="https://site{(5 * i + 2) % 7}.example.com'
                f'/q/{i % 50}">src</a></p>'
            ).encode()
            page = page.replace(b"</article>", links + b"</article>")
            src = f"site{i % 7}"
            for m in HREF.finditer(page):
                host = urlsplit(m.group(1).decode()).hostname or ""
                cnt[(src, host.split(".")[0])] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "src_host": pa.array([k[0] for k in keys], pa.string()),
                "dst_host": pa.array([k[1] for k in keys], pa.string()),
                "n_links": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    out = (
        ds.map_batches(edges_partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])  # bounded: ≤ 49 host pairs
        .aggregate(Sum("n_links", alias_name="n_links"))
        .to_pandas()
    )
    out["n_links"] = out["n_links"].astype("int64")
    return out


def q153_doc_triangles(sf_dir: str):
    """Distributed TRIANGLE COUNTING on a deterministic citation-style
    doc graph (edges i—(i+1), i—(i+2), i—(3i+1) mod N) — the classic
    two-join algorithm with DEGREE-ORDERED orientation (each edge points
    from its lower (degree, id) endpoint), which bounds the wedge
    fan-out to O(m^1.5) regardless of hub skew — the property id-ordered
    orientation lacks (a celebrity node of degree d generates d² wedges
    under id order; under degree order its edges mostly point INTO it).

    Scale shape: edge dedup and the degree rollup are coarse-salted
    reduces; degrees attach to edges via two bucketed hash joins (the
    degree relation is node-sized — never broadcast); wedges form by a
    bucketed self-join on the tail vertex with the (deg, id) filter and
    closing-edge key computed in-bucket; closure is one more bucketed
    join of candidate keys against the oriented edge set. Every
    exchange carries int64 ids only. Output (orientation-invariant):
    per-vertex triangle participation counts. Vertex ids must fit
    31 bits (the u·2³² + v composite key; the fixture graph is ≤ 2²⁰)."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def edges(batch: pa.Table) -> pa.Table:
        i = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        js = [
            (i + 1) % n_docs, (i + 2) % n_docs, (3 * i + 1) % n_docs,
        ]
        ii = np.concatenate([i, i, i])
        jj = np.concatenate(js)
        keep = ii != jj
        u = np.minimum(ii[keep], jj[keep])
        v = np.maximum(ii[keep], jj[keep])
        return pa.table(
            {
                "ek": pa.array(u * (1 << 32) + v, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    def dedup_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("ek")[["u", "v"]]

    E = coarse_group_reduce(
        ds.map_batches(edges, batch_format="pyarrow"), "ek", dedup_first
    ).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        vtx = pa.concat_arrays(
            [
                batch["u"].combine_chunks(),
                batch["v"].combine_chunks(),
            ]
        )
        vc = pc.value_counts(vtx)
        return pa.table(
            {"vtx": vc.field("values"), "deg": vc.field("counts")}
        )

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("vtx", as_index=False)["deg"].sum()
        return out.astype({"deg": "int64"})

    D = coarse_group_reduce(
        E.map_batches(endpoints, batch_format="pyarrow"), "vtx", deg_final
    )

    # attach degrees: two bucketed joins (D is node-sized — no broadcast)
    with_du = bucketed_hash_join(
        E.map_batches(
            lambda b: b.rename_columns(["vtx", "v"]),
            batch_format="pyarrow",
        ),
        D.map_batches(
            lambda df: df.rename(columns={"deg": "deg_u"}),
            batch_format="pandas",
        ),
        key="vtx",
        left_columns=["v"],
        right_columns=["deg_u"],
    )
    with_both = bucketed_hash_join(
        with_du.map_batches(
            lambda b: pa.table(
                {
                    "vtx": b["v"],
                    "u": b["vtx"],
                    "deg_u": b["deg_u"],
                }
            ),
            batch_format="pyarrow",
        ),
        D.map_batches(
            lambda df: df.rename(columns={"deg": "deg_v"}),
            batch_format="pandas",
        ),
        key="vtx",
        left_columns=["u", "deg_u"],
        right_columns=["deg_v"],
    )

    def orient(b: pa.Table) -> pa.Table:
        u = b["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = b["vtx"].combine_chunks().to_numpy(zero_copy_only=False)
        du = b["deg_u"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = b["deg_v"].combine_chunks().to_numpy(zero_copy_only=False)
        # point from lower (deg, id) to higher
        fwd = (du < dv) | ((du == dv) & (u < v))
        x = np.where(fwd, u, v)
        y = np.where(fwd, v, u)
        dy = np.where(fwd, dv, du)
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "deg_y": pa.array(dy, pa.int64()),
            }
        )

    Eo = with_both.map_batches(orient, batch_format="pyarrow").materialize()

    def wedge_pairs(b: pa.Table) -> pa.Table:
        # joined rows: (x, y, deg_y, y2, deg_y2) — one row per ordered
        # head pair; keep (deg,id)-ordered wedges, emit the closing key
        y = b["y"].combine_chunks().to_numpy(zero_copy_only=False)
        dy = b["deg_y"].combine_chunks().to_numpy(zero_copy_only=False)
        y2 = b["y2"].combine_chunks().to_numpy(zero_copy_only=False)
        dy2 = b["deg_y2"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (dy < dy2) | ((dy == dy2) & (y < y2))
        ck = y[keep] * (1 << 32) + y2[keep]
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "apex": pa.array(
                    b["x"].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )[keep],
                    pa.int64(),
                ),
            }
        )

    wedges = bucketed_hash_join(
        Eo,
        Eo.map_batches(
            lambda b: pa.table(
                {"x": b["x"], "y2": b["y"], "deg_y2": b["deg_y"]}
            ),
            batch_format="pyarrow",
        ),
        key="x",
        left_columns=["y", "deg_y"],
        right_columns=["y2", "deg_y2"],
        bucket_post_fn=wedge_pairs,
    )

    closing = Eo.map_batches(
        lambda b: pa.table(
            {
                "ck": pc.add(
                    pc.multiply(b["x"], pa.scalar(1 << 32, pa.int64())),
                    b["y"],
                ),
                "closed": pa.array(
                    np.ones(b.num_rows, dtype=np.int8), pa.int8()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    tris = bucketed_hash_join(
        wedges, closing, key="ck",
        left_columns=["apex"], right_columns=["closed"],
    )

    def tri_vertices(b: pa.Table) -> pa.Table:
        ck = b["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        apex = b["apex"].combine_chunks().to_numpy(zero_copy_only=False)
        vtx = np.concatenate([apex, ck >> 32, ck & ((1 << 32) - 1)])
        vc = pc.value_counts(pa.array(vtx, pa.int64()))
        return pa.table(
            {"vertex": vc.field("values"), "n": vc.field("counts")}
        )

    def vtx_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("vertex", as_index=False)["n"].sum()
        out = out.rename(columns={"n": "n_triangles"})
        return out.astype({"n_triangles": "int64"})

    return coarse_group_reduce(
        tris.map_batches(tri_vertices, batch_format="pyarrow"),
        "vertex",
        vtx_final,
    )


def q178_anchor_text_index(sf_dir: str):
    """ANCHOR-TEXT aggregation per target host — the web-graph signal
    (anchors describe the TARGET page) behind classic ranking and
    anchor-corpus pretraining sets: documents are wrapped into their
    real boilerplate HTML (the q147 fixture path) with two
    deterministic outlinks whose anchor TEXT is the doc's first two
    tokens; a compiled-regex kernel extracts (href, anchor_text) pairs
    from the markup, anchors tokenize, and per (dst_host, token)
    counts roll up to the top-3 anchor tokens per host (count desc,
    token asc). The oracle rebuilds anchors analytically from the same
    doc_id arithmetic + token slice (the q147 analytic-contract
    discipline), so the HTML round-trip is hash-checked."""
    import re

    from basicocr_ray.stages.wide import coarse_group_reduce
    from basicocr_ray.sources.docpages import wrap_single

    A_TAG = re.compile(rb'<a href="(https?://[^"]+)">([^<]*)</a>')

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def anchors_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        from urllib.parse import urlsplit

        cnt: Counter = Counter()
        for i, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (t or "").lower().split()[:2]
            if not toks:
                continue
            anchor = " ".join(toks)
            page = wrap_single(t or "", i)
            links = (
                f'<p><a href="http://site{(3 * i + 1) % 7}.example.com'
                f'/p/{i % 100}">{anchor}</a> '
                f'<a href="https://site{(5 * i + 2) % 7}.example.com'
                f'/q/{i % 50}">{anchor}</a></p>'
            ).encode()
            page = page.replace(b"</article>", links + b"</article>")
            for m in A_TAG.finditer(page):
                host = urlsplit(m.group(1).decode()).hostname or ""
                for tok in m.group(2).decode().split():
                    cnt[(host.split(".")[0], tok)] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "dst_host": pa.array([k[0] for k in keys], pa.string()),
                "token": pa.array([k[1] for k in keys], pa.string()),
                "cnt": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["dst_host", "token"], as_index=False)["cnt"].sum()
        agg = agg.sort_values(
            ["dst_host", "cnt", "token"],
            ascending=[True, False, True], kind="mergesort",
        )
        out = agg.groupby("dst_host").head(3)
        return out.astype({"cnt": "int64"}).reset_index(drop=True)

    return coarse_group_reduce(
        ds.map_batches(anchors_partial, batch_format="pyarrow"),
        "dst_host",
        final,
    )


def q321_sitemap_roundtrip(sf_dir: str):
    """SITEMAP XML ROUNDTRIP — the crawl-frontier feed format: each
    batch of documents renders to a sitemaps.org urlset (loc with a
    query string whose '&' must entity-escape, lastmod date, priority)
    and `core/structured.parse_sitemap` must recover every field
    exactly. Encode+parse stay inside one map_batches (the q102 WARC
    discipline applied to the XML sibling)."""
    from datetime import date, timedelta

    from basicocr_ray.core.structured import encode_sitemap, parse_sitemap

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    base = date(2024, 1, 1)

    def roundtrip(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        entries = [
            {
                "loc": "https://example.org/doc/%d?a=1&b=2" % i,
                "lastmod": (base + timedelta(days=int(i) % 365)).isoformat(),
                "priority": "0.%d" % (int(i) % 10),
            }
            for i in ids
        ]
        xml = encode_sitemap(entries)
        parsed = parse_sitemap(xml)
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(e["loc"].split("/")[-1].split("?")[0]) for e in parsed],
                    pa.int64(),
                ),
                "loc": pa.array([e["loc"] for e in parsed], pa.string()),
                "lastmod": pa.array([e["lastmod"] for e in parsed], pa.string()),
                "priority": pa.array([e["priority"] for e in parsed], pa.string()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


__all__ = [
    "q53_url_host_rollup",
    "q101_crawl_diff",
    "q102_warc_roundtrip",
    "q103_pagerank_hosts",
    "q106_url_canonicalize",
    "q110_robots_filter",
    "q114_blocklist_filter",
    "q119_latest_by_url",
    "q125_crawl_budget",
    "q146_crawl_plan",
    "q147_link_graph",
    "q153_doc_triangles",
    "q178_anchor_text_index",
    "q321_sitemap_roundtrip",
]


QUERIES = {
    "q53_url_host_rollup": q53_url_host_rollup,
    "q101_crawl_diff": q101_crawl_diff,
    "q102_warc_roundtrip": q102_warc_roundtrip,
    "q103_pagerank_hosts": q103_pagerank_hosts,
    "q106_url_canonicalize": q106_url_canonicalize,
    "q110_robots_filter": q110_robots_filter,
    "q114_blocklist_filter": q114_blocklist_filter,
    "q119_latest_by_url": q119_latest_by_url,
    "q125_crawl_budget": q125_crawl_budget,
    "q146_crawl_plan": q146_crawl_plan,
    "q147_link_graph": q147_link_graph,
    "q153_doc_triangles": q153_doc_triangles,
    "q178_anchor_text_index": q178_anchor_text_index,
    "q321_sitemap_roundtrip": q321_sitemap_roundtrip,
}


ORACLE_SQL = {
    "q53_url_host_rollup": """
        WITH planted AS (
          SELECT 'https://host' || CAST(doc_id % 50 AS VARCHAR)
                 || '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url,
                 n_chars
          FROM documents
        )
        SELECT split_part(url, '/', 3) AS host,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM planted GROUP BY host
    """,
    "q101_crawl_diff": """
        WITH a AS (
          SELECT doc_id, md5(text) AS fp_a
          FROM documents WHERE doc_id % 10 <> 0
        ),
        b AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                          ELSE text END) AS fp_b
          FROM documents WHERE doc_id % 7 <> 0
        )
        SELECT CASE WHEN fp_a IS NULL THEN 'added'
                    WHEN fp_b IS NULL THEN 'removed'
                    WHEN fp_a = fp_b THEN 'same'
                    ELSE 'changed' END AS status,
               count(*) AS n_docs
        FROM a FULL OUTER JOIN b USING (doc_id)
        GROUP BY 1
    """,
    "q102_warc_roundtrip": """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(text)) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """,
    "q103_pagerank_hosts": """
        -- 3 unrolled rounds of the exact-integer PageRank recurrence
        -- x_{k+1}(v) = 9·60^k·mass(v) + 17·Σ_{u→v} x_k(u)  (d = 17/20,
        -- out-degree 3, teleport ∝ mass); pr = x_3 / (N·60^3)
        WITH hosts AS (
          SELECT doc_id % 64 AS h, count(*) AS mass
          FROM documents GROUP BY 1
        ),
        n AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM hosts),
        edges AS (
          SELECT h AS src,
                 unnest([(3*h+1) % 64, (5*h+2) % 64, (7*h+4) % 64]) AS dst
          FROM hosts
        ),
        x0 AS (SELECT h, mass AS x FROM hosts),
        s1 AS (SELECT dst AS h, sum(x0.x) AS inc
               FROM edges JOIN x0 ON edges.src = x0.h GROUP BY 1),
        x1 AS (SELECT hosts.h, 9 * mass + 17 * coalesce(inc, 0) AS x
               FROM hosts LEFT JOIN s1 USING (h)),
        s2 AS (SELECT dst AS h, sum(x1.x) AS inc
               FROM edges JOIN x1 ON edges.src = x1.h GROUP BY 1),
        x2 AS (SELECT hosts.h, 540 * mass + 17 * coalesce(inc, 0) AS x
               FROM hosts LEFT JOIN s2 USING (h)),
        s3 AS (SELECT dst AS h, sum(x2.x) AS inc
               FROM edges JOIN x2 ON edges.src = x2.h GROUP BY 1),
        x3 AS (SELECT hosts.h, 32400 * mass + 17 * coalesce(inc, 0) AS x
               FROM hosts LEFT JOIN s3 USING (h))
        SELECT hosts.h, mass, CAST(x AS BIGINT) AS x,
               round(CAST(x AS DOUBLE) / (total * 216000.0), 8) AS pr
        FROM hosts JOIN x3 USING (h), n
    """,
    "q106_url_canonicalize": """
        -- expected canonical form constructed analytically from the
        -- same doc_id arithmetic the Ray side uses to build RAW urls
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 1 THEN 'https' ELSE 'http' END)
               || '://www.site' || (doc_id % 7) || '.example.com'
               || (CASE
                     WHEN doc_id % 3 = 0 AND doc_id % 2 = 0 THEN ':443'
                     WHEN doc_id % 3 = 1 AND doc_id % 2 = 1 THEN ':80'
                     ELSE '' END)
               || '/p/' || doc_id
               || (CASE WHEN doc_id % 4 = 0 THEN '?A=1&b=2'
                        WHEN doc_id % 4 = 1 THEN '?x=1'
                        ELSE '' END) AS url
        FROM documents
    """,
    "q110_robots_filter": """
        WITH u AS (
          SELECT 'site' || (doc_id % 7) AS host,
                 '/p/' || doc_id AS path, doc_id % 7 AS k
          FROM documents
        ),
        c AS (
          SELECT host,
                 CASE WHEN (k % 3 = 0 AND path LIKE '/p/1%')
                       OR (k % 3 = 1 AND path LIKE '/p/2%')
                      THEN 1 ELSE 0 END AS blocked
          FROM u
        )
        SELECT host,
               CAST(sum(1 - blocked) AS BIGINT) AS n_allowed,
               CAST(sum(blocked) AS BIGINT) AS n_blocked
        FROM c GROUP BY host
    """,
    "q114_blocklist_filter": f"""
        WITH vocab AS (
          SELECT DISTINCT token FROM (
            SELECT unnest({_TOKS}) AS token FROM documents
          ) WHERE token <> ''
        ),
        bad AS (
          SELECT token FROM vocab
          WHERE CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 13 = 0
        ),
        flagged AS (
          SELECT lang, n_chars,
                 EXISTS (
                   SELECT 1 FROM bad
                   WHERE list_contains({_TOKS}, bad.token)
                 ) AS blocked
          FROM documents
        )
        SELECT lang,
               CAST(sum(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_kept,
               CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               CAST(sum(CASE WHEN blocked THEN 0 ELSE n_chars END)
                 AS BIGINT) AS kept_chars,
               CAST(sum(CASE WHEN blocked THEN n_chars ELSE 0 END)
                 AS BIGINT) AS dropped_chars
        FROM flagged GROUP BY lang
    """,
    "q119_latest_by_url": """
        WITH v AS (
          SELECT doc_id,
                 CAST(u.v AS BIGINT) AS ver,
                 CAST(doc_id * 10 + u.v AS BIGINT) AS ts,
                 md5(text || ' v' || CAST(u.v AS VARCHAR)) AS fp
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, 3)) AS v) u
          WHERE (doc_id + u.v) % 3 <> 0
        ),
        r AS (
          SELECT doc_id, ver, ts, fp,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY ts DESC
                 ) AS rn
          FROM v
        )
        SELECT doc_id, ver, ts, fp FROM r WHERE rn = 1
    """,
    "q125_crawl_budget": """
        WITH c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1
        ),
        t AS (SELECT sum(n_docs) AS total FROM c),
        b AS (
          SELECT source, n_docs,
                 CAST((1000 * n_docs) // total AS BIGINT) AS base,
                 CAST((1000 * n_docs) % total AS BIGINT) AS rem
          FROM c CROSS JOIN t
        ),
        k AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS extra FROM b),
        r AS (
          SELECT source, n_docs, base,
                 row_number() OVER (ORDER BY rem DESC, source) AS rn
          FROM b
        )
        SELECT source, n_docs,
               CAST(base + CASE WHEN rn <= k.extra THEN 1 ELSE 0 END
                    AS BIGINT) AS quota
        FROM r CROSS JOIN k
    """,
    "q146_crawl_plan": """
        -- canonicalize -> robots gate -> frontier dedup -> Hamilton
        -- budget of 500, replayed analytically from the doc_id spread
        WITH u AS (
          SELECT doc_id, doc_id % 7 AS k,
                 '/p/' || CAST(doc_id % 400 AS VARCHAR) AS path
          FROM documents
        ),
        allowed AS (
          SELECT k, path FROM u
          WHERE NOT ((k % 3 = 0 AND path LIKE '/p/1%')
                  OR (k % 3 = 1 AND path LIKE '/p/2%'))
        ),
        frontier AS (SELECT DISTINCT k, path FROM allowed),
        c AS (
          SELECT 'www.site' || CAST(k AS VARCHAR) || '.example.com'
                   AS host,
                 CAST(count(*) AS BIGINT) AS n_urls
          FROM frontier GROUP BY 1
        ),
        t AS (SELECT CAST(sum(n_urls) AS BIGINT) AS total FROM c),
        base AS (
          SELECT host, n_urls,
                 (500 * n_urls) // total AS q0,
                 (500 * n_urls) % total AS rem
          FROM c, t
        ),
        extra AS (SELECT CAST(500 - sum(q0) AS BIGINT) AS e FROM base),
        ranked AS (
          SELECT host, n_urls, q0,
                 row_number() OVER (ORDER BY rem DESC, host) AS rk
          FROM base
        )
        SELECT host, n_urls,
               CAST(q0 + CASE WHEN rk <= (SELECT e FROM extra)
                         THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM ranked
    """,
    "q147_link_graph": """
        -- analytic link contract: each doc emits exactly its two
        -- injected absolute outlinks (boilerplate links are relative
        -- and excluded by the absolute-URL filter)
        WITH e AS (
          SELECT 'site' || (doc_id % 7) AS src_host,
                 'site' || ((3 * doc_id + 1) % 7) AS dst_host
          FROM documents
          UNION ALL
          SELECT 'site' || (doc_id % 7),
                 'site' || ((5 * doc_id + 2) % 7)
          FROM documents
        )
        SELECT src_host, dst_host, count(*) AS n_links
        FROM e GROUP BY 1, 2
    """,
    "q153_doc_triangles": """
        -- same graph, id-ordered enumeration (the triangle SET is
        -- orientation-invariant); per-vertex participation counts
        WITH nn AS (SELECT count(*) AS cnt FROM documents),
        e0 AS (
          SELECT doc_id AS i, (doc_id + 1) % cnt AS j FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id + 2) % cnt FROM documents, nn
          UNION ALL
          SELECT doc_id, (3 * doc_id + 1) % cnt FROM documents, nn
        ),
        e AS (
          SELECT DISTINCT least(i, j) AS u, greatest(i, j) AS v
          FROM e0 WHERE i <> j
        ),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM e e1
          JOIN e e2 ON e2.u = e1.v
          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT vertex, count(*) AS n_triangles
        FROM (SELECT unnest([a, b, c]) AS vertex FROM tri)
        GROUP BY vertex
    """,
    "q178_anchor_text_index": """
        -- analytic anchor contract: anchor text = the doc's first two
        -- tokens, targets from the q147 doc_id arithmetic; top-3 anchor
        -- tokens per destination host (count desc, token asc)
        WITH d AS (
          SELECT doc_id, list_slice(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> ''), 1, 2) AS ts2
          FROM documents WHERE text IS NOT NULL
        ),
        a AS (SELECT doc_id, ts2 FROM d WHERE len(ts2) >= 1),
        anchors AS (
          SELECT 'site' || CAST((3 * doc_id + 1) % 7 AS VARCHAR)
                   AS dst_host, ts2 FROM a
          UNION ALL
          SELECT 'site' || CAST((5 * doc_id + 2) % 7 AS VARCHAR), ts2
          FROM a
        ),
        tok AS (SELECT dst_host, unnest(ts2) AS token FROM anchors),
        cnt AS (
          SELECT dst_host, token, count(*) AS cnt
          FROM tok GROUP BY 1, 2
        ),
        rk AS (
          SELECT *, row_number() OVER (
                   PARTITION BY dst_host ORDER BY cnt DESC, token) AS rn
          FROM cnt
        )
        SELECT dst_host, token, CAST(cnt AS BIGINT) AS cnt
        FROM rk WHERE rn <= 3
    """,
    "q321_sitemap_roundtrip": """
        -- the sitemap render+parse must recover exactly these fields
        SELECT doc_id,
               'https://example.org/doc/' || doc_id || '?a=1&b=2' AS loc,
               strftime(DATE '2024-01-01'
                        + to_days(CAST(doc_id % 365 AS INTEGER)),
                        '%Y-%m-%d') AS lastmod,
               '0.' || CAST(doc_id % 10 AS VARCHAR) AS priority
        FROM documents
    """,
}
