"""Google Sheets source/sink (SURVEY S18) over the injected transport.

The reference wraps gspread (reference: src/linkmerce/extensions/
gsheets.py — ServiceAccount:23-41, worksheet2py/py2worksheet:44-103,
WorksheetClient:106-315, upsert_records:317-330, dual_load:333-394).
This module re-expresses the same capability against the Sheets REST
API (``spreadsheets/{key}/values/{range}`` get/update/append/clear)
through :mod:`linkmerce_spark.sources.http`'s injectable transport —
so every behavior is testable with a fake transport, and a production
binding needs only a real transport + OAuth token provider.

Auth: the client takes a ``token_provider`` callable; since round 6
:class:`linkmerce_spark.sources.oauth.ServiceAccountTokenProvider`
is a real, fully tested implementation (pure-stdlib RS256 JWT-bearer
grant over the same injected transport) — no stub remains in the
chain. The ServiceAccount *parsing* — JSON string / file path / dict
with the required key fields — is pure and implemented.

The Spark edge: ``records_to_df`` / ``sheet_dual_load`` move worksheet
records into DataFrames and the warehouse dual-load policy
(sources/warehouse.dual_load — strict PG-shaped sink first, lenient
sinks after), matching the reference's sheet -> Postgres+BigQuery flow.
"""

from __future__ import annotations

import datetime as dt
import json as _json
import re
from pathlib import Path
from typing import Any, Callable, Mapping, Sequence

from linkmerce_spark.sources.http import HttpClient, Transport

__all__ = [
    "ServiceAccount",
    "sheet_to_py",
    "py_to_sheet",
    "upsert_records",
    "WorksheetClient",
    "records_to_df",
    "sheet_dual_load",
]

_REQUIRED_KEYS = ("client_email", "private_key", "project_id")

# Google Sheets serial-date epoch offset: date.toordinal() of 1899-12-30.
_SERIAL_OFFSET = 693594


class ServiceAccount(dict):
    """Service-account credentials from a JSON string, file, or dict."""

    def __init__(self, info: str | Path | Mapping[str, str]):
        if isinstance(info, Path) or (
            isinstance(info, str) and not info.lstrip().startswith("{")
        ):
            info = _json.loads(Path(info).read_text())
        elif isinstance(info, str):
            info = _json.loads(info)
        missing = [k for k in _REQUIRED_KEYS if k not in info]
        if missing:
            raise KeyError(f"service account info missing {missing}")
        super().__init__(info)


def _to_python(value: Any) -> Any:
    if isinstance(value, str):
        if value == "TRUE":
            return True
        if value == "FALSE":
            return False
        if re.match(r"^\d+(\.\d*)?%$", value):
            return float(value[:-1]) / 100
        if re.match(r"^\d{4}-\d{2}-\d{2}", value):
            # FULL-match patterns + a parse guard: a prefix match with a
            # full-string strptime raised on date-like free text
            # ('2024-01-02 123456') and on invalid calendar dates
            # ('2024-01-32') — such cells stay strings.
            for pat, fmt in (
                (r"^\d{4}-\d{2}-\d{2}$", "%Y-%m-%d"),
                (r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$", "%Y-%m-%d %H:%M:%S"),
                (r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}$", "%Y-%m-%d %H:%M"),
                (r"^\d{4}-\d{2}-\d{2} \d{2}$", "%Y-%m-%d %H"),
            ):
                if re.fullmatch(pat, value):
                    try:
                        parsed = dt.datetime.strptime(value, fmt)
                    except ValueError:
                        return value
                    return parsed.date() if fmt == "%Y-%m-%d" else parsed
    return value


def sheet_to_py(
    records: list[dict[str, Any]], filter_headers: Sequence[str] | None = None
) -> list[dict[str, Any]]:
    """Worksheet strings -> Python values (TRUE/FALSE, '12.5%', ISO
    date/datetime prefixes) — reference worksheet2py:44-72."""
    return [
        {k: _to_python(row.get(k)) for k in (filter_headers or row.keys())}
        for row in records
    ]


def _to_serial(value: Any) -> Any:
    if isinstance(value, dt.datetime):
        days = value.toordinal() - _SERIAL_OFFSET
        return days + (value.hour * 3600 + value.minute * 60 + value.second) / 86400
    if isinstance(value, dt.date):
        return value.toordinal() - _SERIAL_OFFSET
    return value


def py_to_sheet(
    records: list[dict[str, Any]],
    expected_headers: Sequence[str] | None = None,
    include_header: bool = False,
) -> list[list[Any]]:
    """Python records -> worksheet rows; dates become Sheets serial
    numbers (epoch 1899-12-30) — reference py2worksheet:75-103."""
    if not records:
        return []
    headers = list(expected_headers or records[0].keys())
    # A record missing a column MUST emit None in that position —
    # skipping it would shift every later value left under the wrong
    # header, silently corrupting the sheet.
    rows = [[_to_serial(r.get(c)) for c in headers] for r in records]
    return [headers, *rows] if include_header else rows


def upsert_records(
    left: list[dict], right: list[dict], on: str | Sequence[str]
) -> list[dict]:
    """Merge two record lists by key: existing rows updated in place,
    unmatched new rows appended (reference upsert_records:317-330)."""

    def key(row: dict) -> Any:
        return row[on] if isinstance(on, str) else tuple(row[k] for k in on)

    incoming = {key(r): r for r in right}
    merged = [dict(row, **incoming.pop(key(row), {})) for row in left]
    return merged + list(incoming.values()) if incoming else merged


class WorksheetClient:
    """One worksheet of one spreadsheet, over the Sheets values API."""

    BASE = "https://sheets.googleapis.com/v4/spreadsheets"

    def __init__(
        self,
        transport: Transport,
        token_provider: Callable[[], str],
        key: str,
        sheet: str,
    ):
        self.key = key
        self.sheet = sheet
        self._token = token_provider
        self.http = HttpClient(transport, base_url=self.BASE)

    def _headers(self) -> dict[str, str]:
        return {"authorization": f"Bearer {self._token()}"}

    def _values_url(self, rng: str, suffix: str = "") -> str:
        return f"{self.key}/values/{rng}{suffix}"

    # -- reads ---------------------------------------------------------
    def get_values(self, rng: str | None = None) -> list[list[Any]]:
        body = self.http.request_json(
            "GET", self._values_url(rng or self.sheet), headers=self._headers()
        )
        return body.get("values", [])

    def get_header_row(self, head: int = 1) -> list[str]:
        values = self.get_values(f"{self.sheet}!{head}:{head}")
        return [str(v) for v in values[0]] if values else []

    def get_all_records(
        self,
        head: int = 1,
        expected_headers: Sequence[str] | None = None,
        to_python: bool = True,
    ) -> list[dict[str, Any]]:
        """Rows below the header as dicts (reference get_all_records)."""
        values = self.get_values()
        if len(values) < head:
            return []
        headers = [str(h) for h in values[head - 1]]
        rows = values[head:]
        records = [
            {h: (row[i] if i < len(row) else None) for i, h in enumerate(headers)}
            for row in rows
        ]
        if expected_headers:
            records = [{k: r.get(k) for k in expected_headers} for r in records]
        return sheet_to_py(records) if to_python else records

    def count_rows(self, include_header: bool = False) -> int:
        n = len(self.get_values())
        return n if include_header else max(n - 1, 0)

    # -- writes --------------------------------------------------------
    def clear(self, include_header: bool = False) -> Any:
        rng = self.sheet if include_header else f"{self.sheet}!A2:ZZ"
        return self.http.request_json(
            "POST", self._values_url(rng, ":clear"), headers=self._headers()
        )

    def update_worksheet(
        self,
        records: list[dict],
        expected_headers: Sequence[str] | None = None,
        include_header: bool = False,
        ref_cell: str = "A2",
    ) -> Any:
        """RAW update at the ref cell (reference update_worksheet)."""
        rows = py_to_sheet(records, expected_headers, include_header)
        rng = f"{self.sheet}!{'A1' if include_header else ref_cell}"
        return self.http.request_json(
            "PUT",
            self._values_url(rng),
            params={"valueInputOption": "RAW"},
            json={"values": rows},
            headers=self._headers(),
        )

    def append_worksheet(
        self, records: list[dict], expected_headers: Sequence[str] | None = None
    ) -> Any:
        rows = py_to_sheet(records, expected_headers)
        return self.http.request_json(
            "POST",
            self._values_url(self.sheet, ":append"),
            params={"valueInputOption": "RAW"},
            json={"values": rows},
            headers=self._headers(),
        )

    def overwrite_worksheet(
        self,
        records: list[dict],
        expected_headers: Sequence[str] | None = None,
        include_header: bool = False,
    ) -> Any:
        """clear + update (reference overwrite_worksheet:267-284)."""
        self.clear(include_header=include_header)
        return self.update_worksheet(records, expected_headers, include_header)

    def upsert_worksheet(
        self, records: list[dict], on: str | Sequence[str], **kwargs: Any
    ) -> Any:
        """Read-merge-overwrite by key (reference upsert_worksheet)."""
        if not records:
            return None
        merged = upsert_records(self.get_all_records(**kwargs), records, on)
        return self.overwrite_worksheet(merged)


# -- Spark edge -------------------------------------------------------------

def records_to_df(spark, records: list[dict], schema: str):
    """Worksheet records -> DataFrame via the row-batch bridge."""
    from linkmerce_spark.frames import from_rows

    return from_rows(spark, records, schema)


def sheet_dual_load(
    spark,
    client: WorksheetClient,
    schema: str,
    columns: Sequence[str],
    strict: Callable[[Any], None],
    lenient: Mapping[str, Callable[[Any], None]] | None = None,
    primary_key: Sequence[str] | None = None,
    not_null: Sequence[str] | None = None,
    apply_func: Mapping[str, Callable[[Any], Any]] | None = None,
) -> dict[str, bool]:
    """Sheet -> validated records -> DataFrame -> dual-load policy.

    The reference's dual_load (gsheets.py:333-394) reads the sheet,
    drops PK-null/duplicate and NOT-NULL-violating rows, applies the
    per-column transforms, then loads Postgres (strict, first) and
    BigQuery (lenient, after).  Here the sink policy is the engine's
    ``sources.warehouse.dual_load`` and both sinks receive a DataFrame.
    """
    from linkmerce_spark.sources.warehouse import dual_load

    rows: list[dict] = []
    unique: set[tuple] = set()
    for rec in client.get_all_records():
        if primary_key:
            ident = tuple(rec.get(k) for k in primary_key)
            if None in ident or ident in unique:
                continue
            unique.add(ident)
        if not_null and any(rec.get(k) is None for k in not_null):
            continue
        if apply_func:
            rec = dict(rec)
            for k, fn in apply_func.items():
                rec[k] = fn(rec.get(k))
        rows.append({c: rec.get(c) for c in columns})
    df = records_to_df(spark, rows, schema)
    return dual_load(df, strict, lenient)
