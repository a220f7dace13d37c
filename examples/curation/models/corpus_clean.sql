{{ config(materialized='table') }}
SELECT q.doc_id, q.lang, q.source, q.n_tokens
FROM {{ ref('doc_quality') }} q
JOIN {{ ref('dedup_keepers') }} k ON q.doc_id = k.doc_id
WHERE q.quality_pass = 1 AND k.keep = 1
