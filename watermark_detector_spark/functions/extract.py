"""``extract_text`` — HTML binary → text, as an Arrow-batched pandas UDF.

The byte-identical-per-url contract (BASELINE.json input_hint) lives
here: for any url, the extracted text's UTF-8 bytes must equal the
pinned golden bytes, at any partitioning and batch size. Analog of the
reference's image decode (generate_dataset.py:184, train_watermarks.py:319).

The UDF body is vectorized pandas (``Series.str`` regex ops, C-level
loops) — no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .core import _ESCAPES

_MAIN_RX = r"<main[^>]*>(.*?)</main>"
_BODY_RX = r"<body[^>]*>(.*?)</body>"
_DROP_RX = r"<(?:script|style|nav|footer|header|aside)[^>]*>.*?</(?:script|style|nav|footer|header|aside)>"
_TAG_RX = r"<[^>]+>"


def extract_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a batch of html payloads (bytes)."""
    s = html.map(lambda b: b.decode("utf-8", "replace") if b is not None else None)
    s = pd.Series(s, index=html.index, dtype="object")
    main = s.str.extract(_MAIN_RX, flags=re.S, expand=False)
    # fallback path for pages without <main>: body minus boilerplate blocks
    no_main = main.isna() & s.notna()
    if no_main.any():
        body = s[no_main].str.extract(_BODY_RX, flags=re.S, expand=False)
        body = body.fillna(s[no_main])
        body = body.str.replace(_DROP_RX, " ", regex=True, flags=re.S | re.I)
        main = main.copy()
        main[no_main] = body
    out = main.str.replace(_TAG_RX, "", regex=True)
    for raw, esc in reversed(_ESCAPES):  # &amp; last — see core.unescape_html
        out = out.str.replace(esc, raw, regex=False)
    return out.str.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_series(html)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text") -> "F.DataFrame":
    """Attach extracted text and DROP the html payload immediately —
    column pruning discipline: never carry the (large) binary past this
    point (SURVEY.md §4 'column pruning')."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col))).drop(html_col)


def extracted_text_col(html_col: str = "html") -> Column:
    return extract_text_udf(F.col(html_col))
