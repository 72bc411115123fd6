"""WARC source/codec (S1/S4 widening for Common-Crawl-native input).

Common-Crawl ships WARC (ISO 28500) files; the reference's reader
discipline — fetch exactly the fields you need, route corrupt records to
quarantine instead of failing the shard (contrib/crnn/dataset.py returns
the *next* sample on decode failure) — maps here to a stdlib-only WARC/1.0
record codec plus a `read_warc` that flat-maps whole files into typed rows
with malformed records flagged, never raised.

Format implemented (the subset Common-Crawl response records use):

    WARC/1.0\r\n
    <Name>: <value>\r\n ...          (headers; Content-Length mandatory)
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n                          (record boundary)

Parsing is resynchronizing: a record with a bad header block or a short
payload is emitted with ``_corrupt=True`` and the scan resynchronizes at
the next ``WARC/`` magic, so one truncated record never hides the rest of
a 1 GB file — the S1 corrupt-skip contract at record granularity.
"""

from __future__ import annotations

import pyarrow as pa

_MAGIC = b"WARC/1.0"


def encode_warc_record(
    uri: str, date: str, payload: bytes, warc_type: str = "response"
) -> bytes:
    """One WARC/1.0 record with the minimal Common-Crawl header set.

    Header values are validated against CR/LF: an embedded newline would
    terminate the header block early (header injection), silently
    re-framing the record so its payload is lost to the resync scan.
    Refuse loudly instead — a URI with control characters is corrupt
    input, and the caller's quarantine path is the place for it."""
    for name, value in (("uri", uri), ("date", date),
                        ("warc_type", warc_type)):
        if "\r" in value or "\n" in value:
            raise ValueError(f"CR/LF in WARC header field {name}: {value!r}")
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return headers + payload + b"\r\n\r\n"


def encode_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    """[(uri, date, payload)] → one WARC file image (concatenated records)."""
    return b"".join(encode_warc_record(u, d, p) for u, d, p in records)


def parse_warc(data: bytes) -> list[dict]:
    """WARC file bytes → [{uri, date, payload, _corrupt}].

    Malformed records (bad header block, missing/invalid Content-Length,
    truncated payload) come back with ``_corrupt=True`` and whatever
    fields were readable; scanning resumes at the next record magic."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while True:
        start = data.find(_MAGIC, pos)
        if start == -1:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end == -1:
            out.append(
                {"uri": None, "date": None, "payload": b"", "_corrupt": True}
            )
            break
        headers: dict[str, str] = {}
        ok = True
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            name, sep, value = line.partition(b":")
            if not sep:
                ok = False
                continue
            try:
                headers[name.strip().lower().decode("ascii")] = (
                    value.strip().decode("utf-8")
                )
            except UnicodeDecodeError:
                ok = False
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            # cannot locate the payload end — resync at the next magic
            out.append(
                {
                    "uri": headers.get("warc-target-uri"),
                    "date": headers.get("warc-date"),
                    "payload": b"",
                    "_corrupt": True,
                }
            )
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        truncated = body_end > n
        out.append(
            {
                "uri": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "payload": data[body_start:min(body_end, n)],
                "_corrupt": (not ok) or truncated
                or headers.get("warc-target-uri") is None,
            }
        )
        pos = body_end
    return out


def records_to_table(records: list[dict]) -> pa.Table:
    return pa.table(
        {
            "uri": pa.array([r["uri"] for r in records], pa.string()),
            "date": pa.array([r["date"] for r in records], pa.string()),
            "payload": pa.array(
                [r["payload"] for r in records], pa.large_binary()
            ),
            "_corrupt": pa.array(
                [r["_corrupt"] for r in records], pa.bool_()
            ),
        }
    )


def read_warc(paths: str | list[str], keep_corrupt: bool = False):
    """WARC file(s) → Dataset(uri, date, payload[, _corrupt]).

    One flat-map per FILE (WARC records are variable-length and
    boundary-delimited, so the file is the natural parallel unit — the
    same granularity Common-Crawl itself shards at, ~1 GB per file)."""
    import ray.data

    def parse_batch(batch: pa.Table) -> pa.Table:
        recs: list[dict] = []
        for blob in batch["bytes"].to_pylist():
            recs.extend(parse_warc(blob))
        t = records_to_table(recs)
        if keep_corrupt:
            return t
        import pyarrow.compute as pc

        t = t.filter(pc.invert(t["_corrupt"]))
        return t.drop_columns(["_corrupt"])

    return ray.data.read_binary_files(paths).map_batches(
        parse_batch, batch_format="pyarrow"
    )
