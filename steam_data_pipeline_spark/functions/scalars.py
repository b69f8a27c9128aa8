"""Scalar function library — the reference's §2.7 function surface.

Everything here is a *Column expression* built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen; the
single Pandas-UDF variant exists to exercise (and test) the vectorized
Python path, not for production use.

Reference parity (file:line cites into /root/reference):

* ``normalize_game_name``  — main.py:318-320 (strip ``™``/``®``, trim)
* ``cents_to_money``       — main.py:362 (minor units / 100 → Numeric(10,2))
* ``coalesce_default``     — main.py:206,309-312,333,362,364 (.get(k, d))
* ``iso_ts``               — main.py:392,401 (ISO-8601 journal strings)
* flatten helpers          — main.py:301-306 (trim / ", ".join)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

TRADEMARK_CHARS = "™®"  # ™ ®


def normalize_game_name(col: Column | str) -> Column:
    """Strip trademark glyphs and surrounding whitespace (main.py:318-320).

    ``translate`` maps each listed char to nothing — one codegen'd pass,
    no regex engine involvement.
    """
    return F.trim(F.translate(F.col(col) if isinstance(col, str) else col, TRADEMARK_CHARS, ""))


@pandas_udf("string")
def normalize_game_name_pandas(s: pd.Series) -> pd.Series:
    """Arrow-vectorized variant of ``normalize_game_name``.

    Kept to exercise the Pandas-UDF path (SURVEY.md §2.9
    ``udf_normalize_name``); the built-in expression above is the hot
    path and the two are asserted equivalent in tests.
    """
    table = str.maketrans("", "", TRADEMARK_CHARS)
    return s.str.translate(table).str.strip()


def cents_to_money(col: Column | str, scale: int = 2) -> Column:
    """Integer minor units → DecimalType money (main.py:362).

    Exact decimal arithmetic — never float — so 1999 → 19.99 precisely.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,4)") / F.lit(100)).cast(f"decimal(10,{scale})")


def coalesce_default(col: Column | str, default) -> Column:
    """``row.get(key, default)`` ≡ ``coalesce(col, lit(default))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def iso_ts(col: Column | str) -> Column:
    """ISO-8601 second-precision rendering of a timestamp (main.py:401)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def join_str_array(col: Column | str, sep: str = ", ") -> Column:
    """``", ".join(arr)`` (main.py:304-305)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(sep, c)


def join_struct_descriptions(col: Column | str, sep: str = ", ") -> Column:
    """``", ".join(g["description"] for g in genres)`` (main.py:306)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(sep, F.transform(c, lambda g: g["description"]))
