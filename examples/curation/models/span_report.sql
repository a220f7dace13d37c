{{ config(materialized='table') }}
-- Pair-level verbatim-span localization in plain engine SQL: the
-- operator library's DedupOps.dedupSpanPairs through the model
-- surface. Shared rare 8-token grams are grouped into contiguous runs
-- per (pair, diagonal i_a - i_b) -- the plagiarism-detection islands
-- trick -- so each pair reports its longest copied span in tokens.
WITH toks AS (
  SELECT doc_id,
         split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' ') AS w
  FROM {{ source('raw', 'documents') }}
), starts AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, xxhash64(g) AS h
  FROM (
    SELECT doc_id,
           posexplode(transform(sequence(0, size(w) - 8),
                                i -> concat_ws(' ', slice(w, i+1, 8)))) AS (i, g)
    FROM toks WHERE size(w) >= 8
  ) grams
), rare AS (
  SELECT doc_id, i, h FROM starts
  WHERE h IN (SELECT h FROM (
    SELECT h, COUNT(DISTINCT doc_id) AS nd FROM starts GROUP BY h) x
    WHERE nd > 1 AND nd <= 100)
), m AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i AS i_a, b.i AS i_b
  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
), isl AS (
  SELECT doc_a, doc_b, i_a - i_b AS d,
         i_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, i_a - i_b
                                  ORDER BY i_a) AS grp
  FROM m
), rl AS (
  SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS run
  FROM isl GROUP BY doc_a, doc_b, d, grp
)
SELECT doc_a, doc_b,
       CAST(SUM(run) AS BIGINT) AS n_shared_grams,
       CAST(MAX(run) AS BIGINT) AS longest_run_grams,
       CAST(MAX(run) + 7 AS BIGINT) AS longest_span_tokens
FROM rl GROUP BY doc_a, doc_b
HAVING SUM(run) >= 3
