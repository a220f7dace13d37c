{{ config(materialized='table') }}
-- the engine's SQL surface reaches graft's native Catalyst aggregates:
-- quantile_sketch is the mergeable Munro-Paterson sketch registered by
-- GraftSession, here sizing per-source token-length distributions
SELECT source,
       quantile_sketch(n_tokens, 64) AS token_sketch,
       COUNT(*) AS n_docs
FROM {{ ref('stg_documents') }}
GROUP BY source
