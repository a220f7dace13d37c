{{ config(strategy='check', unique_key='source', check_cols=['n_docs', 'n_quality']) }}
-- SCD-2 history of the per-source datacard: re-snapshotting after a
-- corpus refresh closes the old row and opens a new one whenever a
-- source's document or quality counts drift
SELECT source, n_docs, n_tokens, n_dups, n_quality FROM {{ ref('datacard') }}
