{{ config(materialized='table') }}
SELECT s.source,
       COUNT(*) AS n_docs,
       CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN k.keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       CAST(SUM(q.quality_pass) AS BIGINT) AS n_quality
FROM {{ ref('stg_documents') }} s
JOIN {{ ref('dedup_keepers') }} k ON s.doc_id = k.doc_id
JOIN {{ ref('doc_quality') }} q ON s.doc_id = q.doc_id
GROUP BY s.source
