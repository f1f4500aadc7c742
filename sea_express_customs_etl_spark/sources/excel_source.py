"""Shipper manifest Excel/CSV connector (OP-SRC-XLSX, OP-SRC-CSV,
OP-SRC-CELL, OP-PROJ / OP-PROJ-POS, OP-HDRNORM, OP-FIL-*).

Reference behavior reproduced (``src/process_excel_order.py``):

* MAWB resolution: A1 cell if strictly alphanumeric
  (``^[A-Za-z0-9]+$``), else filename stem (``:25-78``)
* format dispatch per FILE: "old format" when header row 4 (0-based 3)
  contains the normalized column ``分提單號碼`` (``:195-209``);
  otherwise "new format" with header row 3 (0-based 2) and positional
  columns A/D/J/K/N/O, requiring ≥15 columns (``:122-143``)
* header normalization: strip + drop embedded newlines (``:86,203``)
* merged-cell HAWB repair by forward-fill in sheet order (``:94,146``)
* old-format row filter: HAWB AND item-number present (``:95``);
  new-format: HAWB AND description present (``:149``)
* new-format item numbering: cumcount+1 per HAWB (``:156``)
* lenient numeric coercion → 0, trims, TWD/PENDING literals

The UDTF parses bytes → per-sheet raw string cells + ``_row_idx``
(sheet order is load-bearing for ffill/cumcount); the ffill, filters,
sequencing and typing all happen in Catalyst afterwards.

Excel binaries require ``openpyxl``; when it's absent (this container)
the xlsx path degrades to a logged skip and the CSV path — byte-for-byte
the same downstream plan — carries the tests. The dispatch/derivation
logic is format-agnostic past the cell-extraction step.
"""

from __future__ import annotations

import io
import logging
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.functions.numeric import num_coerce

log = logging.getLogger(__name__)

try:  # optional dependency — xlsx cell extraction only
    import openpyxl  # noqa: F401

    _HAS_OPENPYXL = True
except ImportError:
    _HAS_OPENPYXL = False

_ALNUM = re.compile(r"^[A-Za-z0-9]+$")

OLD_REQUIRED = ("分提單號碼", "貨物編號", "货物名称", "數量", "單價金額", "發票總金額")

RAW_SCHEMA = (
    "source_file string, mawb_no string, fmt string, _row_idx long, "
    "hawb_raw string, item_no int, desc_raw string, qty_raw string, "
    "unit_raw string, net_weight_raw string, price_raw string, total_raw string, "
    "consignee_name_raw string, consignee_id_raw string, consignee_phone_raw string"
)
_RAW_COLS = [c.split(" ")[0] for c in RAW_SCHEMA.split(", ")]


def _norm_headers(cols) -> list[str]:
    return [str(c).strip().replace("\n", "") for c in cols]


def _is_meaningful(val: str | None) -> bool:
    return bool(val) and str(val).strip().lower() not in ("nan", "none", "")


def _probe_a1(content: bytes, fname: str) -> str | None:
    """Read only cell A1 (OP-SRC-CELL)."""
    try:
        if fname.lower().endswith(".csv"):
            df = pd.read_csv(
                io.BytesIO(content), nrows=1, header=None, usecols=[0]
            )
            if not df.empty:
                v = str(df.iloc[0, 0]).strip()
                return v if _is_meaningful(v) else None
        elif _HAS_OPENPYXL:
            wb = openpyxl.load_workbook(
                io.BytesIO(content), read_only=True, data_only=True
            )
            v = wb.active["A1"].value
            wb.close()
            if v is not None and _is_meaningful(str(v)):
                return str(v).strip()
    except Exception as e:
        log.warning("A1 probe failed for %s: %s", fname, e)
    return None


def _read_table(content: bytes, fname: str, header: int) -> pd.DataFrame | None:
    try:
        if fname.lower().endswith(".csv"):
            return pd.read_csv(io.BytesIO(content), header=header, dtype=object)
        if _HAS_OPENPYXL:
            return pd.read_excel(io.BytesIO(content), header=header, dtype=object)
        log.error("openpyxl unavailable — cannot parse Excel binary %s", fname)
        return None
    except Exception as e:
        log.info("read with header=%d failed for %s: %s", header, fname, e)
        return None


def _cell(v) -> str | None:
    if v is None or (isinstance(v, float) and pd.isna(v)) or pd.isna(v):
        return None
    return str(v)


def _rows_for_file(fname: str, content: bytes) -> list[dict]:
    # MAWB: A1 if strictly alphanumeric, else filename stem
    a1 = _probe_a1(content, fname)
    mawb = a1 if a1 and _ALNUM.match(a1) else fname.rsplit("/", 1)[-1].rsplit(".", 1)[0].strip()

    out: list[dict] = []

    def emit(idx: int, fmt: str, **fields) -> None:
        row = dict.fromkeys(_RAW_COLS)
        row.update(
            source_file=fname, mawb_no=mawb, fmt=fmt, _row_idx=idx, **fields
        )
        out.append(row)

    # Strategy A: old format (header row 4, named columns).
    # The merged-cell HAWB forward-fill, the row filter and the item
    # numbering are sheet-order properties of ONE file, so they run
    # right here in the parser (reference does the same in pandas,
    # ``:94-95,146-156``) — zero shuffles, and the downstream typed
    # projection stays streaming-safe.
    df_old = _read_table(content, fname, header=3)
    if df_old is not None:
        df_old.columns = _norm_headers(df_old.columns)
        if "分提單號碼" in df_old.columns and all(
            c in df_old.columns for c in OLD_REQUIRED
        ):
            opt = {
                "unit_raw": "數量單位",
                "net_weight_raw": "淨重",
                "consignee_name_raw": "進口人英文名稱",
                "consignee_id_raw": "進口人統一編號",
                "consignee_phone_raw": "進口人電話",
            }
            last_hawb = None
            for idx, r in enumerate(df_old.itertuples(index=False)):
                rec = dict(zip(df_old.columns, r))
                hawb = _cell(rec["分提單號碼"])
                last_hawb = hawb if hawb is not None else last_hawb  # ffill
                item = _cell(rec["貨物編號"])
                if last_hawb is None or item is None:
                    continue  # OP-FIL-NOTNULL (reference :95)
                item_no = int(float(item)) if _is_float(item) else 0
                emit(
                    idx,
                    "old",
                    hawb_raw=last_hawb,
                    item_no=item_no,
                    desc_raw=_cell(rec["货物名称"]),
                    qty_raw=_cell(rec["數量"]),
                    price_raw=_cell(rec["單價金額"]),
                    total_raw=_cell(rec["發票總金額"]),
                    **{
                        k: _cell(rec[col])
                        for k, col in opt.items()
                        if col in df_old.columns
                    },
                )
            return out

    # Strategy B: new format (header row 3, positional A/D/J/K/N/O, ≥15 cols)
    df_new = _read_table(content, fname, header=2)
    if df_new is None:
        return out
    if len(df_new.columns) < 15:
        log.error("new format needs ≥15 columns, %s has %d", fname, len(df_new.columns))
        return out
    last_hawb = None
    counters: dict[str, int] = {}
    for idx in range(len(df_new)):
        hawb = _cell(df_new.iloc[idx, 0])
        last_hawb = hawb if hawb is not None else last_hawb  # ffill (ref :146)
        desc = _cell(df_new.iloc[idx, 3])
        if last_hawb is None or desc is None:
            continue  # OP-FIL-NOTNULL (reference :149)
        counters[last_hawb] = counters.get(last_hawb, 0) + 1  # cumcount+1 (:156)
        emit(
            idx,
            "new",
            hawb_raw=last_hawb,
            item_no=counters[last_hawb],
            desc_raw=desc,
            qty_raw=_cell(df_new.iloc[idx, 9]),
            unit_raw=_cell(df_new.iloc[idx, 10]),
            price_raw=_cell(df_new.iloc[idx, 13]),
            total_raw=_cell(df_new.iloc[idx, 14]),
        )
    return out


def _is_float(v: str) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


def _parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: list[dict] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            fname = path.rsplit("/", 1)[-1]
            try:
                out.extend(_rows_for_file(fname, content))
            except Exception as e:
                log.error("unexpected failure parsing %s: %s", fname, e)
        yield pd.DataFrame(out, columns=_RAW_COLS) if out else pd.DataFrame(
            {c: pd.Series(dtype=object) for c in _RAW_COLS}
        )


def read_manifests_raw(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Scan ``.xlsx``/``.xls``/``.csv`` manifests → raw string cells."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return (
        reader.load(path)
        .select("path", "content")
        .mapInPandas(_parse_partition, RAW_SCHEMA)
    )


def declared_cargo(raw: DataFrame) -> DataFrame:
    """Raw manifest cells → typed ``table_a_raw`` rows.

    Pure projections/coercions (the order-dependent ffill/sequencing
    already happened at parse time inside the file) — streaming-safe
    and shuffle-free.
    """
    return raw.select(
        F.col("mawb_no"),
        F.trim(F.col("hawb_raw")).alias("hawb_no"),
        F.col("item_no"),
        F.trim(F.col("desc_raw")).alias("description_original"),
        num_coerce(F.col("qty_raw")).alias("qty"),
        F.trim(F.col("unit_raw")).alias("qty_unit"),
        F.when(F.col("fmt") == "old", num_coerce(F.col("net_weight_raw")))
        .otherwise(F.lit(None).cast("double"))
        .alias("net_weight"),
        num_coerce(F.col("price_raw")).alias("unit_price"),
        num_coerce(F.col("total_raw")).alias("total_amount"),
        F.lit("TWD").alias("currency"),
        F.trim(F.col("consignee_name_raw")).alias("consignee_name"),
        F.trim(F.col("consignee_id_raw")).alias("consignee_id"),
        F.trim(F.col("consignee_phone_raw")).alias("consignee_phone"),
        F.lit("PENDING").alias("processing_status"),
        F.col("source_file"),
        F.col("_row_idx"),
    )
