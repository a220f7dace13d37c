{{ config(materialized='table') }}
-- Source-concentration diagnostics in plain engine SQL: the operator
-- library's CurateOps.curateSourceConcentration through the model
-- surface. HHI / Gini / top-share in exact ppm integer arithmetic;
-- the rank window runs over the bounded per-source table and the
-- quadratic terms take DECIMAL(38) headroom exactly like the operator.
WITH by_src AS (
  SELECT source, COUNT(*) AS n_docs
  FROM {{ source('raw', 'documents') }}
  GROUP BY source
), ranked AS (
  SELECT n_docs, ROW_NUMBER() OVER (ORDER BY n_docs, source) AS i FROM by_src
), agg AS (
  SELECT COUNT(*) AS n_sources,
         SUM(n_docs) AS n_total,
         MAX(n_docs) AS n_top,
         SUM((2 * i - 1) * n_docs) AS gini_num0,
         SUM(n_docs * n_docs) AS sq_sum
  FROM ranked
)
SELECT n_sources,
       (1000000 * n_top) div n_total AS top_share_ppm,
       CAST((1000000 * (CAST(gini_num0 AS DECIMAL(38,0)) - CAST(n_sources AS DECIMAL(38,0)) * n_total))
            div (CAST(n_sources AS DECIMAL(38,0)) * n_total) AS BIGINT) AS gini_ppm,
       CAST((1000000 * CAST(sq_sum AS DECIMAL(38,0)))
            div (CAST(n_total AS DECIMAL(38,0)) * n_total) AS BIGINT) AS hhi_ppm
FROM agg
