"""Operator library: composable DataFrame -> DataFrame functions.

Modules map to SURVEY.md §2 sections:
- relational  : P/D/J/A/O/U ops (projections, dedup, joins, aggs, sorts, sets)
- timeseries  : W ops (lag/rolling/pct-change/diff/trend over explicit windows)
- text        : T ops + text-analysis north star (tokens, quality, fingerprint)
- dedup       : exact + MinHash/SimHash/n-gram near-dup (north star)
- similarity  : brute-force + LSH-bucketed ANN over embeddings (north star)
- mining      : frequent itemsets + association rules (A8-A11, M27)
- multimodal  : binary-column plumbing with stubbed decoders (S5, M25, M26)
- dq          : single-pass data-quality audits (orphans, dup keys, domains)
"""
