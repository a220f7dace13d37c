{{ config(materialized='view') }}
-- ftfy-style encoding-artifact gate in plain engine SQL (the operator
-- library's TextOps.txtMojibake expressed through the model surface):
-- UTF-8-read-as-Latin-1 signatures, cp1252 double-encoding pairs,
-- U+FFFD replacement chars, stray C0/C1 controls. Any hit fails the
-- page -- a single signature is already definitive corruption.
SELECT doc_id, bad_total,
       CASE WHEN bad_total > 0 THEN 0 ELSE 1 END AS encoding_pass
FROM (
  SELECT doc_id,
         CAST(regexp_count(text, 'Ã[\\x{0080}-\\x{00BF}]') +
              regexp_count(text, 'â€') +
              regexp_count(text, '\\x{FFFD}') +
              regexp_count(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x{0080}-\\x{009F}]')
              AS BIGINT) AS bad_total
  FROM {{ source('raw', 'documents') }}
) sig
