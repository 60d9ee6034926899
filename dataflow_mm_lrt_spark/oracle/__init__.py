"""Test-only oracles: faithful Python ports of reference operator
semantics. Never imported by the engine's hot path — used by the pytest
suite to diff engine output against the reference behavior."""
