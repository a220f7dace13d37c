{{ config(materialized='table') }}
-- Common-neighbor link prediction in plain engine SQL: the operator
-- library's GraphOps.graphLinkPred (CN / resource-allocation / Jaccard
-- over the rare-shingle co-occurrence graph) through the model surface.
-- Same guards as the operator: hot shingles (df > 100) never form
-- edges, wedge centers are hub-capped at degree 64, and scores are
-- exact ppm integers.
WITH sh AS (
  SELECT DISTINCT doc_id, xxhash64(s) AS h
  FROM (
    SELECT doc_id,
           explode(transform(sequence(0, size(w) - 3),
                             i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
    FROM (
      SELECT doc_id,
             split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' ') AS w
      FROM {{ source('raw', 'documents') }}
    ) words
    WHERE size(w) >= 3
  ) grams
), rare AS (
  SELECT doc_id, h FROM sh
  WHERE h IN (SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= 100)
), edges AS (
  SELECT a, b FROM (
    SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_rare
    FROM rare x JOIN rare y ON x.h = y.h AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
  ) p WHERE n_rare >= 2
), nb AS (
  SELECT a AS w, b AS n FROM edges
  UNION ALL
  SELECT b AS w, a AS n FROM edges
), deg AS (
  SELECT w, COUNT(*) AS deg FROM nb GROUP BY w
), nbc AS (
  SELECT nb.w, nb.n, deg.deg FROM nb JOIN deg ON nb.w = deg.w
  WHERE deg.deg <= 64
), scored AS (
  SELECT u, v, COUNT(*) AS cn, SUM(1000000 div deg) AS ra_ppm
  FROM (
    SELECT x.w, x.n AS u, y.n AS v, x.deg
    FROM nbc x JOIN nbc y ON x.w = y.w AND x.n < y.n
  ) wedges
  GROUP BY u, v
  HAVING COUNT(*) >= 2
), non_edge AS (
  SELECT s.* FROM scored s
  LEFT ANTI JOIN edges e ON s.u = e.a AND s.v = e.b
)
SELECT u AS doc_u, v AS doc_v, cn, ra_ppm,
       1000000 * cn div (du.deg + dv.deg - cn) AS jac_ppm
FROM non_edge
JOIN deg du ON non_edge.u = du.w
JOIN deg dv ON non_edge.v = dv.w
