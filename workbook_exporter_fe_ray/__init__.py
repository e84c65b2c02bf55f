"""workbook_exporter_fe_ray — a Ray-Data-native time-series rollup engine.

A from-scratch re-expression of the data-processing capabilities of the
reference repo ``Brownster/workbook_exporter-fe`` (a row-at-a-time
CSV→YAML converter, see SURVEY.md) as an idiomatic Ray Data engine:

- input: Parquet tables of pre-tokenized training sequences
  ``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``
- pipeline: streaming ``ray.data.Dataset`` reads → zero-copy Arrow
  ``map_batches`` stages → salted groupby-aggregate shuffles →
  cascading continuous aggregates (1m→5m→1h→1d retention tiers) →
  LOCF/linear gap-fill → Gorilla XOR + delta-of-delta compression in
  stateful actor-pool stages → partitioned, resumable Parquet output
  with per-partition lineage manifest.

The reference's transform semantics (category filter, per-row projection
with defaults, explode, dedup-by-key, group-by-host, sorted merged
output, incremental re-run) are mapped one-to-one in SURVEY.md §2 and
implemented across :mod:`.stages` / :mod:`.functions`; nothing is
copied — the reference is a single-file Flask/pandas app
(``workbook_exporter-fe.py``) with no distributed execution at all.
"""

__version__ = "0.1.0"
