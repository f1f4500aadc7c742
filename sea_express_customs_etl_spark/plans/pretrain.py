"""Composed pretraining-data preparation flagship #2.

`plans/curation.py` is the CLEANING composition (gate → dedup →
near-dup clusters → split); this is the downstream TOKENIZATION
composition the cleaned corpus feeds: Gopher-style quality gate →
real BPE tokenization with the pinned merge artifact (actual token
counts — the chars/4 estimate `pack_sequences` demos with elsewhere is
replaced by the tokenizer's truth) → fixed-window sequence packing.
Together they are the end-to-end "raw corpus → training batches"
story, each stage individually oracle-checked and the composition
hash-checked as one DuckDB statement (``oracles_ext.pretrain_prep_sql``).

Scale shape: the gate is map-only; the survivor semi-join shuffles on
doc_id (hint-free — both sides corpus-sized); BPE encode is the
dictionary-encoded fold (once per DISTINCT word, broadcast back —
operators/bpe.py); packing is the sharded cumulative window (no global
sort funnel). No stage introduces state beyond what its standalone
query already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.bpe import FIXED_MERGES, bpe_encode
from sea_express_customs_etl_spark.operators.packing import pack_sequences
from sea_express_customs_etl_spark.operators.textstats import quality_gate


def pretrain_prep(
    docs: DataFrame,
    seq_len: int = 512,
    num_shards: int = 4,
    enc: DataFrame | None = None,
) -> DataFrame:
    """gate → tokenize → pack. Output: doc_id, shard, bin_id,
    bin_offset, n_tokens (real BPE token count).

    ``enc``: optional pre-built FIXED_MERGES word→pieces dictionary
    (the session table). Without it bpe_encode's dictionary build
    re-executes the gate + survivor semi-join a second time just to
    enumerate the vocabulary; the injected full-corpus dictionary is
    row-identical after the inner join (pieces are a pure function of
    the word — see bpe_encode)."""
    keep = quality_gate(docs).filter(F.col("passed")).select("doc_id")
    survivors = docs.join(keep, "doc_id", "left_semi")
    toks = bpe_encode(
        survivors, list(FIXED_MERGES), enc=enc, counts_only=True
    ).select("doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"))
    return pack_sequences(toks, seq_len=seq_len, num_shards=num_shards)
