"""dataflow_mm_lrt_spark — a PySpark-native streaming CEP engine.

A from-scratch re-expression of the data-preparation semantics of the
reference repo ``tongruiliu/DataFlow-MM-lrt`` (read-only at
``/root/reference``) as an idiomatic Spark engine:

* batch operator library (``operators/``) built on the DataFrame API so
  Catalyst does pushdown / pruning / join planning,
* deterministic text functions (``functions/``) as pure Catalyst
  expressions (zero per-row Python in the hot path),
* Structured Streaming pipeline (``streaming/``) with watermarks,
  tumbling/sliding/session windows, stateful ordered conversation
  assembly (``applyInPandasWithState``), a stream-stream join of turns
  against tool-call events, and an exactly-once manifest sink,
* test oracles (``oracle/``) that are faithful Python ports of the
  reference operators, used only in tests.

Primary payload: an agent-transcript table
``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` per ``/root/repo/BASELINE.json``.
"""

__version__ = "0.1.0"
