{{ config(materialized='table') }}
-- Content-defined-chunking overlap report in plain engine SQL: the
-- operator library's DedupOps.dedupCdc expressed through the model
-- surface. cdc_chunks is the engine's native codegen'd expression
-- (registered in every session), so a pipeline author gets verbatim
-- shared-span accounting -- syndicated paragraphs, boilerplate blocks,
-- shifted copies -- without leaving SQL. A chunk occurrence counts as
-- shared when its text appears in at least two distinct documents.
WITH chunks AS (
  SELECT doc_id,
         xxhash64(chunk) AS h,
         CAST(length(chunk) AS BIGINT) AS len
  FROM (
    SELECT doc_id,
           explode(cdc_chunks(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), 16, 6)) AS chunk
    FROM {{ source('raw', 'documents') }}
  ) c
), per_doc AS (
  SELECT h, doc_id, COUNT(*) AS cnt, SUM(len) AS len_sum
  FROM chunks GROUP BY h, doc_id
), freq AS (
  SELECT h, COUNT(*) AS n_docs_with FROM per_doc GROUP BY h
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN n_docs_with >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(SUM(len_sum) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN n_docs_with >= 2 THEN len_sum ELSE 0 END) AS BIGINT) AS chars_shared,
       CAST(SUM(CASE WHEN n_docs_with >= 2 THEN len_sum ELSE 0 END) * 1000
            div SUM(len_sum) AS BIGINT) AS shared_millis
FROM per_doc JOIN freq USING (h)
GROUP BY doc_id
