"""Structured-Streaming CEP engine over agent transcripts.

Stages (SURVEY.md §7.1): bounded/unbounded transcript source →
stateless clean/filter (shared with the batch library) → watermark →
stateful ordered assembly + in-conversation dedup
(``applyInPandasWithState`` sorted-run state) → windowed aggregates
(tumbling/sliding/session, salted two-phase for hot keys) →
stream-stream join against tool-call events → exactly-once manifest
sink with per-partition lineage + metrics.
"""
