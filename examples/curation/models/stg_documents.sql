{{ config(materialized='view') }}
SELECT doc_id, lang, source,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))) AS fp,
       CAST(size(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(regexp_count(text, '[a-zA-Z]') AS BIGINT) AS n_letters
FROM {{ source('raw', 'documents') }}
