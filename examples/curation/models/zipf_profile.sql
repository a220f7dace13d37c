{{ config(materialized='table') }}
-- Zipf rank-decade profile in plain engine SQL: the operator library's
-- TextOps.txtZipf expressed through the model surface. Ranks come from
-- the COUNT HISTOGRAM (how many distinct terms occur exactly cnt
-- times), never a vocabulary sort: a cnt value's terms occupy the rank
-- interval [lo, hi], and each rank decade [2^k, 2^(k+1)) takes its
-- exact integer overlap. The window runs over the bounded histogram
-- (distinct frequency values), not the vocab.
WITH terms AS (
  SELECT term, COUNT(*) AS cnt
  FROM (
    SELECT explode(filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '),
                          t -> t != '')) AS term
    FROM {{ source('raw', 'documents') }}
  ) t
  GROUP BY term
), hist AS (
  SELECT cnt, COUNT(*) AS n_terms FROM terms GROUP BY cnt
), ranked AS (
  SELECT cnt, n_terms,
         SUM(n_terms) OVER (ORDER BY cnt DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM hist
), intervals AS (
  SELECT cnt, n_terms, hi, hi - n_terms + 1 AS lo FROM ranked
), axis AS (
  SELECT k,
         shiftleft(CAST(1 AS BIGINT), k) AS blo,
         shiftleft(CAST(1 AS BIGINT), k + 1) - 1 AS bhi
  FROM (SELECT explode(sequence(0, 40)) AS k)
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(SUM(least(hi, bhi) - greatest(lo, blo) + 1) AS BIGINT) AS n_terms,
       CAST(SUM((least(hi, bhi) - greatest(lo, blo) + 1) * cnt) AS BIGINT) AS total_cnt,
       CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       CAST(MIN(cnt) AS BIGINT) AS min_cnt
FROM intervals JOIN axis ON blo <= hi AND lo <= bhi
GROUP BY k
