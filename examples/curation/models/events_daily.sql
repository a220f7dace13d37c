{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='day', batch_size='month', begin='2024-01-01') }}
-- daily event rollup, built one month-window at a time: each batch
-- reads ONLY its [start, end) slice of the raw events (the source's
-- event_time pushes the window into the parquet scan) and overwrites
-- exactly that window of the target — the incremental shape that stays
-- O(window) at any corpus size
SELECT CAST(date_trunc('DAY', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(ROUND(value * 100)) AS BIGINT) AS value_cents
FROM {{ source('raw', 'events') }}
GROUP BY 1, 2
