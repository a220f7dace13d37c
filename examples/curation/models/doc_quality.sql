{{ config(materialized='view') }}
SELECT doc_id, lang, source, n_tokens,
       CASE WHEN n_chars > 0 AND n_letters * 2 >= n_chars AND n_tokens >= {{ var('min_tokens') }}
            THEN 1 ELSE 0 END AS quality_pass
FROM {{ ref('stg_documents') }}
