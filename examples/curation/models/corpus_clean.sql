{{ config(materialized='table') }}
SELECT q.doc_id, q.lang, q.source, q.n_tokens
FROM {{ ref('doc_quality') }} q
JOIN {{ ref('dedup_keepers') }} k ON q.doc_id = k.doc_id
JOIN {{ ref('encoding_gate') }} e ON q.doc_id = e.doc_id
WHERE q.quality_pass = 1 AND k.keep = 1 AND e.encoding_pass = 1
