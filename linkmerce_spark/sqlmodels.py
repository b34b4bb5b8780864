"""SQL-model registry: ``-- Name: key`` blocks executed on Spark SQL.

The reference stores every dataset's DDL + transform SQL in a
``models.sql`` file whose statements are selected by ``-- ClassName:
key`` comment headers, rendered with Jinja ``{{ table }}`` aliases,
bound with ``$param`` named parameters, and executed as multi-statement
scripts where statements referencing an empty list-param are skipped
(reference: src/linkmerce/common/models.py:33-97 block parser;
src/linkmerce/common/transform.py:566-650 render;
src/linkmerce/common/load.py:353-384 multi-statement + empty-skip).

Spark-first re-expression:

- blocks parse the same way (the team thinks in SQL files — keep that);
- ``{{ name }}`` renders from a table-alias map (temp views);
- ``$param`` maps to ``spark.sql(..., args=...)`` named parameters;
- list-valued params become temp views (the values-scan, frames.from_rows)
  and statements bound to an EMPTY list are skipped — the reference's
  empty-batch short-circuit, which at Spark scale also avoids
  scheduling useless jobs.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from linkmerce_spark.frames import from_rows

__all__ = ["parse_model_blocks", "render", "SqlModelRegistry"]

_BLOCK_RE = re.compile(r"^--\s*([\w.]+)\s*:\s*(\w+)\s*$", re.MULTILINE)
_VAR_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")
_PARAM_RE = re.compile(r"\$(\w+)")


def parse_model_blocks(text: str) -> dict[tuple[str, str], str]:
    """Split a models.sql file into ``{(class_name, key): sql}`` blocks.

    A block starts at a ``-- ClassName: key`` header and runs to the
    next header (or EOF) — the reference's parser contract
    (common/models.py:46-64).
    """
    out: dict[tuple[str, str], str] = {}
    matches = list(_BLOCK_RE.finditer(text))
    for i, m in enumerate(matches):
        start = m.end()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        out[(m.group(1), m.group(2))] = text[start:end].strip()
    return out


def render(sql: str, tables: Mapping[str, str]) -> str:
    """Render ``{{ name }}`` table aliases (missing keys render as the
    bare name — the reference's default ``{"table": "data"}`` behavior)."""
    return _VAR_RE.sub(lambda m: str(tables.get(m.group(1), m.group(1))), sql)


class SqlModelRegistry:
    """Load a models.sql file and execute its blocks on a SparkSession."""

    def __init__(
        self,
        spark: SparkSession,
        source: str,
        tables: Mapping[str, str] | None = None,
        is_path: bool = True,
    ):
        self.spark = spark
        self.tables = dict(tables or {})
        if is_path:
            with open(source, encoding="utf-8") as f:
                source = f.read()
        self.blocks = parse_model_blocks(source)

    def sql_for(self, class_name: str, key: str) -> str:
        return render(self.blocks[(class_name, key)], self.tables)

    def execute(
        self,
        class_name: str,
        key: str,
        params: Mapping[str, Any] | None = None,
    ) -> DataFrame | None:
        """Execute a block as a multi-statement script.

        List-valued params are registered as temp views named
        ``<param>_rows`` (the values-scan); statements that reference a
        param bound to an EMPTY list are skipped (reference
        load.py:378-381). Returns the last statement's DataFrame.
        """
        params = dict(params or {})
        scalar_args: dict[str, Any] = {}
        empty_lists: set[str] = set()
        for name, value in params.items():
            if isinstance(value, list):
                if value:
                    from_rows(self.spark, value).createOrReplaceTempView(f"{name}_rows")
                else:
                    empty_lists.add(name)
            else:
                scalar_args[name] = value

        result: DataFrame | None = None
        skipped_views: set[str] = set()
        create_re = re.compile(
            r"CREATE(?:\s+OR\s+REPLACE)?\s+(?:TEMP(?:ORARY)?\s+)?VIEW\s+([\w.]+)",
            re.IGNORECASE,
        )
        for stmt in self._split(self.sql_for(class_name, key)):
            refs = set(_PARAM_RE.findall(stmt)) | {
                m.removesuffix("_rows")
                for m in re.findall(r"\b(\w+_rows)\b", stmt)
            }
            words = set(re.findall(r"[\w.]+", stmt))
            if refs & empty_lists or words & skipped_views:
                # Empty-batch short-circuit, propagated to dependents:
                # skipping a CREATE also skips statements that read it.
                skipped_views.update(create_re.findall(stmt))
                continue
            stmt_args = {k: v for k, v in scalar_args.items() if k in refs}
            # $param -> :param (Spark SQL named-parameter syntax)
            runnable = _PARAM_RE.sub(lambda m: f":{m.group(1)}", stmt)
            result = self.spark.sql(runnable, args=stmt_args or None)
        return result

    @staticmethod
    def _split(script: str) -> list[str]:
        """Split on top-level semicolons (no string-literal semicolons in
        the model corpus; keep the simple contract the reference uses)."""
        return [s.strip() for s in script.split(";") if s.strip()]
