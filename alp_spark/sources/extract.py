"""Arrow-vectorized html → text / links extraction.

The per-row invariant (BASELINE.json input_hint): extracted ``text`` is
byte-identical per url versus the reference extractor — defined here as
all tag-free text runs in document order, stripped, newline-joined
(titles, paragraph bodies, anchor texts). Implemented as pandas UDFs over
Arrow batches — **no per-row Python in the plan**; the regex work is
pandas ``str`` ops over whole columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG = r"<[^>]*>"
_HREF = r'href="([^"]*)"'


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """html binary → golden text: replace tags with newlines, split,
    strip, drop empties, join with newline."""
    s = html.apply(lambda b: b.decode("utf-8", errors="replace"))
    replaced = s.str.replace(_TAG, "\n", regex=True)
    return replaced.apply(
        lambda t: "\n".join(seg for seg in (x.strip() for x in t.split("\n")) if seg)
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    """html binary → list of href targets in document order."""
    s = html.apply(lambda b: b.decode("utf-8", errors="replace"))
    return s.str.findall(_HREF)
