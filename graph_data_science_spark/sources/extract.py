"""HTML text + link extraction: pure-Python reference functions and their
Arrow-vectorized pandas UDF twins.

Per BASELINE.json input_hint, the per-row invariant is **byte-identical
extracted text per url** between the reference extractor (the plain-Python
loop) and the vectorized path.  Both wrap THE SAME pure functions — the UDFs
only batch them through Arrow — so the invariant holds by construction and is
asserted per-url in tests (FIXTURES.md §A).

No per-row Python in the engine hot path: these UDFs receive pandas Series of
whole Arrow record batches.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf needs runtime
# type hints.

import re
from typing import List

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_RE = re.compile(r"<[^>]*>")
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(r"""<a\s[^>]*?href=["']([^"']*)["']""", re.IGNORECASE)

_UNESCAPES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def escape_html(text: str) -> str:
    """Minimal entity escaping used by the synthetic generator."""
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def unescape_html(text: str) -> str:
    for ent, ch in _UNESCAPES:
        text = text.replace(ent, ch)
    return text


def extract_text(html) -> str:
    """Reference text extractor: strip script/style, strip tags, unescape
    entities, collapse whitespace.  Deterministic; the engine-wide invariant
    is byte-identical output per url."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    html = _SCRIPT_RE.sub(" ", html)
    html = _TAG_RE.sub(" ", html)
    html = unescape_html(html)
    return _WS_RE.sub(" ", html).strip()


def resolve_href(href: str, base_url: str) -> str:
    """Minimal deterministic URL resolution (absolute passthrough, root- and
    page-relative joins); enough for the synthetic corpus + common crawl-ish
    links without needing non-deterministic library behavior."""
    href = href.strip()
    if not href or href.startswith(("javascript:", "mailto:", "#")):
        return ""
    if "://" in href:
        return href
    m = re.match(r"^(https?://[^/]+)(/.*)?$", base_url)
    if not m:
        return ""
    origin = m.group(1)
    if href.startswith("/"):
        return origin + href
    path = m.group(2) or "/"
    base_dir = path.rsplit("/", 1)[0]
    return f"{origin}{base_dir}/{href}"


def extract_links(html, base_url: str) -> List[str]:
    """All resolved hrefs in document order (duplicates kept — dedup is the
    edge build's Aggregation.SINGLE step, graph-projection-api/.../core/
    Aggregation.java:45-48)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    out = []
    for href in _HREF_RE.findall(html):
        r = resolve_href(unescape_html(href), base_url)
        if r:
            out.append(r)
    return out


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links(h, u) for h, u in zip(html.values, base_url.values)]
    )
