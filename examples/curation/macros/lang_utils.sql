-- Language-slice helpers: the pipe-filter showcase. A caller passes a
-- sloppy CSV of language codes (padding, mixed case, duplicates, any
-- order); the macro normalizes it into a deterministic SQL IN-list
-- with the filter chain real dbt macros lean on
-- (split → map(trim) → map(lower) → unique → sort → join).
{% macro norm_lang_list(csv) %}
  {%- set langs = csv.split(',') | map('trim') | map('lower') | unique | sort -%}
  {%- for l in langs -%}
    '{{ l }}'{% if not loop.last %}, {% endif %}
  {%- endfor -%}
{% endmacro %}
