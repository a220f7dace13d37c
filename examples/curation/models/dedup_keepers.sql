{{ config(materialized='table') }}
SELECT doc_id, fp,
       MIN(doc_id) OVER (PARTITION BY fp) AS keeper,
       CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY fp) THEN 1 ELSE 0 END AS keep
FROM {{ ref('stg_documents') }}
