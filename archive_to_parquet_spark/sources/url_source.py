"""HTTP(S) URL source (S2).

The reference does a blocking GET per URL and streams the response body
through the same sniff/walk pipeline, taking size from Content-Length
and failing on HTTP errors (reference src/main.rs:200-220). stdlib
urllib keeps the container dependency-free; the returned object is a
streaming file-like, so archives are never fully buffered unless a zip
spool requires it.
"""

from __future__ import annotations

import urllib.error
import urllib.request


def open_url(url: str, timeout: float = 60.0):
    """Open a URL for streaming read. Returns (stream, declared_size).

    Raises on HTTP errors (error_for_status parity,
    reference src/main.rs:213-216).
    """
    req = urllib.request.Request(url, headers={"User-Agent": "archive-to-parquet-spark"})
    resp = urllib.request.urlopen(req, timeout=timeout)  # noqa: S310
    status = getattr(resp, "status", 200)
    if status >= 400:
        resp.close()
        raise urllib.error.HTTPError(url, status, "bad status", resp.headers, None)
    size = int(resp.headers.get("Content-Length") or 0)
    return resp, size
