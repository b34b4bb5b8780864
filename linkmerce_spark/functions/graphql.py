"""GraphQL request-body builder (SURVEY S10).

The reference composes GraphQL POST bodies for its smartstore/coupang
extract clients (reference: src/linkmerce/utils/graphql.py:11-275, used
from core/smartstore/hcenter/sales/extract.py:190-204 and
core/coupang/advertising/report/extract.py:333-365).  This is pure
payload composition — no network — so it belongs to the engine the same
way the task combinators do (tasks.py): the driver-side ingestion layer
builds the body, a transport executes it, and the JSON response lands in
``frames.from_rows``.

Surface parity, fresh design: instead of the reference's format-method
class hierarchy, one recursive renderer over plain dict/list/str field
trees plus two tiny value types (``Selection``, ``Fragment``).  The
capabilities match:

- field trees as nested dict/list/str with ``__typename`` injection;
- fragments referenced as ``...Name`` inline and emitted as
  ``fragment Name on Type { ... }`` blocks, extracted recursively;
- variable clauses from a list (``(name: $name, ...)``) or a dict of
  nested clauses (``(data: {a: $a, b: $b})``);
- operation signature ``query Op($x: Type!, ...)`` / ``mutation ...``;
- ``body()`` returning the POST payload
  ``{"operationName", "variables", "query"}``;
- per-section ``linebreak`` toggles, ``prefix``/``suffix``, and a
  ``replace`` post-map — the knobs the reference's call sites use.

Two deliberate reference-parity quirks (kept because the contract is
to reproduce the payloads the reference's clients send in production,
verified against utils/graphql.py:172 and :70-78): an alias renders as
``name: alias`` exactly as the reference does, and empty variable
lists render ``()`` exactly as the reference's ``_add_brackets`` does
— the reference's call sites never hit either edge with a server that
would reject them. Nested-fragment extraction, by contrast, goes
beyond the reference (its extractor stops at the first level, which
would reference an inner fragment without defining it).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

__all__ = ["Fragment", "Selection", "Operation", "render_fields"]

_TYPENAME = "__typename"


@dataclass(frozen=True)
class Fragment:
    """``fragment <name> on <on_type> { fields }`` definition; referenced
    inline as ``...<name>`` wherever it appears in a field tree."""

    name: str
    on_type: str
    fields: Any
    typename: bool = True

    def render(self, step: int = 2) -> str:
        body = render_fields(
            _with_typename(self.fields, self.typename), indent=step, step=step
        )
        return f"fragment {self.name} on {self.on_type} {{\n{body}\n}}"


def _with_typename(tree: Any, typename: bool) -> Any:
    """Append ``__typename`` to every list level (the reference's
    GraphQLFields._set_nested_fields behavior)."""
    if isinstance(tree, Fragment):
        return [tree, _TYPENAME] if typename else [tree]
    if isinstance(tree, Mapping):
        return {k: _with_typename(v, typename) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [_with_typename(v, typename) for v in tree]
        if typename:
            out.append(_TYPENAME)
        return out
    if isinstance(tree, str):
        return tree
    raise TypeError(f"{type(tree).__name__!r} is not a valid field tree node")


def render_fields(
    tree: Any, indent: int = 0, step: int = 2, linebreak: bool = True
) -> str:
    """Render a field tree to GraphQL selection text.

    dicts become ``key { nested }``, lists become sibling lines,
    strings are leaf fields, Fragments become ``...Name`` references.
    ``linebreak=False`` collapses to single-line, comma-free GraphQL.
    """
    pad = " " * indent if linebreak else ""
    sep = "\n" if linebreak else ", "
    if isinstance(tree, Fragment):
        return f"{pad}...{tree.name}"
    if isinstance(tree, Mapping):
        lines = []
        for key, value in tree.items():
            inner = render_fields(value, indent + step, step, linebreak)
            close = (" " * indent) if linebreak else ""
            body = f"{sep}{inner}{sep}{close}" if linebreak else inner
            lines.append(f"{pad}{key} {{{body}}}")
        return sep.join(lines)
    if isinstance(tree, (list, tuple)):
        return sep.join(render_fields(v, indent, step, linebreak) for v in tree)
    if isinstance(tree, str):
        return f"{pad}{tree}"
    raise TypeError(f"{type(tree).__name__!r} is not a valid field tree node")


def _render_var_list(names: Sequence[str], indent: int, step: int, linebreak: bool) -> str:
    pairs = [f"{n}: ${n}" for n in names]
    if not pairs:
        return "()"
    if not linebreak:
        return "(" + ", ".join(pairs) + ")"
    pad = " " * indent
    close = " " * max(indent - step, 0)
    return "(\n" + "\n".join(pad + p for p in pairs) + "\n" + close + ")"


def _render_var_dict(groups: Mapping[str, Sequence[str]], indent: int, step: int, linebreak: bool) -> str:
    if not groups:
        return "()"
    inner = ", ".join(
        f"{key}: {{{', '.join(f'{n}: ${n}' for n in names)}}}"
        for key, names in groups.items()
    )
    if not linebreak:
        return "(" + inner + ")"
    pad = " " * indent
    close = " " * max(indent - step, 0)
    return f"(\n{pad}{inner}\n{close})"


@dataclass(frozen=True)
class Selection:
    """One top-level selection: field name + variable clause + subfields.

    ``variables`` is a list of variable names (rendered ``name: $name``)
    or a dict grouping them under argument objects (rendered
    ``arg: {name: $name, ...}`` — the coupang report mutation shape).
    """

    name: str
    variables: Sequence[str] | Mapping[str, Sequence[str]] = field(default_factory=list)
    fields: Any = None
    alias: str = ""
    typename: bool = True

    def render(
        self,
        indent: int = 2,
        step: int = 2,
        variables_linebreak: bool = True,
        fields_linebreak: bool = True,
    ) -> str:
        head = f"{self.name}: {self.alias}" if self.alias else self.name
        if isinstance(self.variables, Mapping):
            var = _render_var_dict(
                self.variables, indent + step, step, variables_linebreak
            )
        else:
            var = _render_var_list(
                self.variables, indent + step, step, variables_linebreak
            )
        fld = ""
        if self.fields is not None:
            tree = _with_typename(self.fields, self.typename)
            inner = render_fields(tree, indent + step, step, fields_linebreak)
            if fields_linebreak:
                fld = f" {{\n{inner}\n{' ' * indent}}}"
            else:
                fld = f" {{{inner}}}"
        pad = " " * indent
        close = " " * max(indent - step, 0)
        return f"{{\n{pad}{head}{var}{fld}\n{close}}}"


def _collect_fragments(tree: Any) -> list[Fragment]:
    """Extract every Fragment in the tree, INCLUDING fragments nested
    inside another fragment's own field tree (the reference's extractor
    stops at the first level, which would reference '...Inner' without
    ever defining it — a query every server rejects; recursing here is
    purely additive, flat cases render identically). Deduplicated by
    fragment name, first definition wins."""
    found: list[Fragment] = []

    def walk(node: Any) -> None:
        if isinstance(node, Fragment):
            found.append(node)
            walk(node.fields)
        elif isinstance(node, Mapping):
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(tree)
    seen: set[str] = set()
    out = []
    for f in found:
        if f.name not in seen:
            seen.add(f.name)
            out.append(f)
    return out


@dataclass(frozen=True)
class Operation:
    """A complete GraphQL operation: signature + selection + fragments.

    ``body()`` yields the POST payload the reference's extract clients
    send (``{"operationName", "variables", "query"}``); fragments used
    anywhere in the selection's field tree are appended as definitions.
    """

    operation: str
    variables: Mapping[str, Any]
    types: Mapping[str, str]
    selection: Selection

    def signature(self) -> str:
        decls = ", ".join(f"${n}: {t}" for n, t in self.types.items())
        return f"{self.operation}({decls})"

    def query(
        self,
        command: str = "query",
        step: int = 2,
        variables_linebreak: bool = True,
        fields_linebreak: bool = True,
        prefix: str = "",
        suffix: str = "",
        replace: Mapping[str, str] | None = None,
    ) -> str:
        sel = self.selection.render(
            indent=step,
            step=step,
            variables_linebreak=variables_linebreak,
            fields_linebreak=fields_linebreak,
        )
        frags = "\n\n".join(
            f.render(step) for f in _collect_fragments(self.selection.fields)
        )
        text = f"{command} {self.signature()} {sel}"
        if frags:
            text = f"{text}\n\n{frags}"
        text = f"{prefix}{text}{suffix}"
        for old, new in (replace or {}).items():
            text = text.replace(old, new)
        return text

    def body(self, **query_options: Any) -> dict[str, Any]:
        data: dict[str, Any] = (
            {"operationName": self.operation} if self.operation else {}
        )
        data["variables"] = dict(self.variables)
        data["query"] = self.query(**query_options)
        return data
