{{ config(materialized='view') }}
-- keep only the explicitly curated languages; the macro turns the
-- sloppy literal below into IN ('de', 'en') (trimmed, lowered,
-- deduped, sorted) — see macros/lang_utils.sql
SELECT doc_id, lang, source, n_tokens
FROM {{ ref('stg_documents') }}
WHERE lang IN ({{ norm_lang_list(' EN, de ,en') }})
