"""URL canonicalization (crawl-frontier dedup key normalization).

The first thing a crawl pipeline does before URL-level dedup: collapse
the trivially-equivalent spellings of the same resource so the
fingerprint/frontier key is stable. Rules implemented (the conservative,
semantics-preserving subset every crawler agrees on):

  * scheme and host lowercase;
  * default port stripped (``:80`` for http, ``:443`` for https) —
    NON-default ports are kept, including ``:443`` on http;
  * fragment dropped (never sent to the server);
  * tracking parameters removed (``utm_*`` by default);
  * remaining query parameters sorted by (key, value) — order is
    semantically irrelevant for idempotent GETs;
  * empty query → no ``?``.

Path, percent-encoding and param case are left untouched (aggressive
normalizations change semantics on some servers). Pure function of the
string — safe as a vectorized per-batch map anywhere in a pipeline.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str, drop_param_prefixes: tuple = ("utm_",)) -> str:
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    params = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not any(k.startswith(p) for p in drop_param_prefixes)
    ]
    params.sort()
    query = urlencode(params)
    return urlunsplit((scheme, netloc, parts.path, query, ""))
