"""Tiny dual-dialect SQL builder.

The engine's scalar text functions are written once as SQL fragments and
rendered for two dialects:

* ``spark``  — executed via ``F.expr`` (Catalyst, whole-stage codegen);
* ``duckdb`` — the equivalent oracle SQL the driver runs side-by-side.

Only the handful of spellings that differ between the two engines are
abstracted here (higher-order list functions, regex predicates, string
literal escaping).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str

    # ---- string literals -------------------------------------------------
    def lit(self, s: str) -> str:
        """Render a python string as a SQL string literal."""
        if self.name == "spark":
            # Spark processes backslash escapes inside '...' literals
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return "'" + s.replace("'", "''") + "'"

    # ---- regex -----------------------------------------------------------
    def rlike(self, x: str, pattern: str) -> str:
        if self.name == "spark":
            return f"({x} rlike {self.lit(pattern)})"
        return f"regexp_matches({x}, {self.lit(pattern)})"

    def regexp_count(self, x: str, pattern: str) -> str:
        if self.name == "spark":
            return f"regexp_count({x}, {self.lit(pattern)})"
        return f"len(regexp_extract_all({x}, {self.lit(pattern)}))"

    def regexp_replace_all(self, x: str, pattern: str, repl: str) -> str:
        if self.name == "spark":
            return f"regexp_replace({x}, {self.lit(pattern)}, {self.lit(repl)})"
        return f"regexp_replace({x}, {self.lit(pattern)}, {self.lit(repl)}, 'g')"

    def backref(self, i: int) -> str:
        """Group backreference inside a regexp_replace replacement."""
        return f"${i}" if self.name == "spark" else f"\\{i}"

    def split(self, x: str, pattern: str) -> str:
        """Regex split → array of strings."""
        if self.name == "spark":
            return f"split({x}, {self.lit(pattern)})"
        return f"regexp_split_to_array({x}, {self.lit(pattern)})"

    # ---- arrays ----------------------------------------------------------
    def size(self, arr: str) -> str:
        return f"size({arr})" if self.name == "spark" else f"len({arr})"

    def filter(self, arr: str, var: str, pred: str) -> str:
        fn = "filter" if self.name == "spark" else "list_filter"
        return f"{fn}({arr}, {var} -> {pred})"

    def transform(self, arr: str, var: str, body: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {var} -> {body})"

    def array_max(self, arr: str) -> str:
        return f"array_max({arr})" if self.name == "spark" else f"list_max({arr})"

    def array_distinct(self, arr: str) -> str:
        return f"array_distinct({arr})" if self.name == "spark" else f"list_distinct({arr})"

    def array_sort(self, arr: str) -> str:
        return f"array_sort({arr})" if self.name == "spark" else f"list_sort({arr})"

    def array_join(self, arr: str, sep: str) -> str:
        fn = "array_join" if self.name == "spark" else "list_aggregate"
        if self.name == "spark":
            return f"array_join({arr}, {self.lit(sep)})"
        return f"array_to_string({arr}, {self.lit(sep)})"

    # ---- misc ------------------------------------------------------------
    def count_literal(self, x: str, needle: str) -> str:
        """Non-overlapping occurrence count of a literal substring
        (matches python ``str.count``)."""
        lit = self.lit(needle)
        n = len(needle)
        if n == 1:
            return f"(length({x}) - length(replace({x}, {lit}, '')))"
        return f"((length({x}) - length(replace({x}, {lit}, ''))) / {n})"


SPARK = Dialect("spark")
DUCKDB = Dialect("duckdb")
DIALECTS = {"spark": SPARK, "duckdb": DUCKDB}
