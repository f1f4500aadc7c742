"""String scalar functions (SURVEY.md §2.9, OP-STR-*).

Reference semantics (cited per function) re-expressed as built-in
Catalyst expressions. Regex dialect note: Python's ``\\w`` is
Unicode-aware while Java's is ASCII-only, so the punctuation-strip
class is written ``[^\\p{L}\\p{N}_\\s]`` to preserve CJK text
(reference: ``src/batch_train.py:47``).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def clean_doc_no(col: Column) -> Column:
    """Declaration-number cleanup: drop spaces, newlines and slashes,
    then trim. ``"BY/  /14/472 /FUSZH"`` → ``"BY14472FUSZH"``; NULL → NULL.

    Reference: ``src/import_xml_history.py:26-33``.
    """
    return F.trim(F.regexp_replace(col, r"[ \n/]", ""))


def scrub_key(col: Column) -> Column:
    """Waybill-key scrub: remove whitespace, ``/`` and ``-``, uppercase.

    Reference: ``src/batch_train.py:85-86``.
    """
    return F.upper(F.regexp_replace(col.cast("string"), r"[\s/-]", ""))


def link_key(mawb: Column, hawb: Column) -> Column:
    """Join-key derivation: ``scrub(mawb) + "_" + scrub(hawb)``.

    Reference: ``src/batch_train.py:84-87`` (OP-JOIN-KEY).
    """
    return F.concat_ws("_", scrub_key(mawb), scrub_key(hawb))


def split_last(col: Column) -> Column:
    """Keep only the text after the last ``/`` (``"A/B/C"`` → ``"C"``).

    Reference: ``src/batch_train.py:41-42`` (OP-STR-SPLITLAST).
    """
    return F.element_at(F.split(col, "/"), -1)


def depunct(col: Column) -> Column:
    """Replace punctuation/symbols with a space, keeping letters, digits,
    underscore and whitespace in any script (Unicode classes, see module
    docstring). Reference: ``src/batch_train.py:47`` (OP-STR-DEPUNCT).
    """
    return F.regexp_replace(col, r"[^\p{L}\p{N}_\s]", " ")


def squeeze_ws(col: Column) -> Column:
    """Collapse runs of whitespace to one space and trim.

    Reference: ``src/batch_train.py:50`` (OP-STR-SQUEEZE).
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def is_empty_placeholder(col: Column) -> Column:
    """True when a cell is effectively empty: NULL or, after
    lowercase+trim, one of ``nan``/``none``/``""``.

    Reference: ``src/process_excel_order.py:45,56`` (OP-STR-EMPTYCHK).
    """
    return col.isNull() | F.lower(F.trim(col.cast("string"))).isin("nan", "none", "")


def normalize_headers(df):
    """Strip + remove embedded newlines from every column name.

    Reference: ``src/process_excel_order.py:86,203`` (OP-HDRNORM).
    """
    return df.toDF(*[str(c).strip().replace("\n", "") for c in df.columns])


def normalize_text_col(col: Column, *, use_nfkc: bool = True) -> Column:
    """The flagship text-normalization pipeline (OP-STR-* composition):

    NFKC → upper → keep-after-last-``/`` → punctuation→space →
    whitespace squeeze → trim; NULL/empty → ``""``.

    Reference: ``src/batch_train.py:21-52`` (``normalize_text``).

    ``use_nfkc=False`` skips the one pandas-UDF step — sound whenever the
    input is known to contain no full-width/compatibility characters
    (e.g. ASCII test corpora), keeping the whole pipeline inside
    whole-stage codegen.
    """
    c = col.cast("string")
    if use_nfkc:
        from sea_express_customs_etl_spark.functions.text_udfs import nfkc

        c = nfkc(c)
    c = F.upper(c)
    c = split_last(c)
    c = squeeze_ws(depunct(c))
    return F.coalesce(c, F.lit(""))
