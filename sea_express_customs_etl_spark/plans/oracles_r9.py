"""Round-9 DuckDB oracles: sketch-store takedown rebuild, retrieval
ranking eval (nDCG), and the ANN-fed coreset sibling.

Conventions (CLAUDE.md): md5-derived hashes only, integer/ppm outputs,
deterministic tie-breaks, no float aggregation in hash-checked
columns.
"""

from __future__ import annotations

# first 48 bits of md5(v) as a non-negative BIGINT — bit-identical to
# operators/sketches._h48 (the HLL_TOKENS_SQL literal)
_H48 = "('0x' || substring(md5({v}), 1, 12))::BIGINT"

# Sketch-store takedown (VERDICT r8 #3): the oracle is a FRESH BUILD
# over the survivors — exactly the claim rebuild_sketch_store makes
# (max-merge is not invertible, so delete = rebuild; the rebuilt
# store's merged read must equal a from-scratch pass with the deleted
# users never present). HLL register derivation mirrors
# operators/sketches.hll_registers; histogram bins mirror
# operators/quantiles.value_histogram (centi-unit floor).
SKETCH_REBUILD_SURVIVORS_SQL = f"""
WITH surv AS (
  SELECT user_id, event_type, value
  FROM events WHERE user_id % 13 <> 5),
h AS (SELECT {_H48.format(v='CAST(user_id AS VARCHAR)')} AS h48
      FROM surv),
r AS (SELECT (h48 % 256)::INTEGER AS bucket, h48 // 256 AS w FROM h),
hll AS (
  SELECT 'hll' AS kind,
         CAST(NULL AS VARCHAR) AS event_type,
         CAST(bucket AS BIGINT) AS reg_or_bin,
         CAST(max(CASE WHEN w = 0 THEN 41
                       ELSE 41 - length(ltrim(bin(w), '0')) END)
              AS BIGINT) AS state_val
  FROM r GROUP BY bucket),
hist AS (
  SELECT 'hist' AS kind, event_type,
         CAST(floor(value * 100) AS BIGINT) AS reg_or_bin,
         CAST(count(*) AS BIGINT) AS state_val
  FROM surv GROUP BY 1, 2, 3)
SELECT * FROM hll UNION ALL SELECT * FROM hist
"""
