"""Record extractors: HTML page -> list[dict[str, str]] (the reference's
record-batch IR, SURVEY §1.1).

One function per scan shape:
- S3 tables       (/root/reference/templates/template_extract.py:24-32)
- S4 cards        (/root/reference/national/_2994/endorse/extract.py:19-37)
- S5 nested groups(/root/reference/national/_1034/extract.py:26-74)
- W4 sectioned    (/root/reference/states/_3166/extract.py:73-116)

All return flat stringly-typed records; column sets may vary per row
(dict-union semantics — schema stabilization happens Spark-side via
unionByName/map pivot, SURVEY §1.2).
"""

from __future__ import annotations

from sig_etl_spark.extract.html_mini import Node, parse_html


def extract_table_records(html: str) -> list[dict[str, str]]:
    """S3: headers from thead th (fallback: first tr), rows zipped."""
    out: list[dict[str, str]] = []
    root = parse_html(html)
    for table in root.find_all("table"):
        thead = table.find("thead")
        if thead is not None:
            headers = [th.text() for th in thead.find_all("th")]
        else:
            first = table.find("tr")
            headers = [c.text() for c in first.find_all()] if first else []
        body = table.find("tbody") or table
        for tr in body.find_all("tr"):
            cells = [td.text() for td in tr.find_all("td")]
            if cells:
                out.append(dict(zip(headers, cells)))
    return out


def extract_card_records(html: str, card_class: str = "card") -> list[dict[str, str]]:
    """S4: one record per card element; fields from data-field attrs, plus
    any link target as candidate_url (P5-style header augmentation)."""
    out: list[dict[str, str]] = []
    root = parse_html(html)
    for card in root.find_all(cls=card_class):
        rec: dict[str, str] = {}
        for el in card.find_all():
            field = el.attrs.get("data-field")
            if field:
                rec[field] = el.text()
        link = card.find("a")
        if link is not None and "href" in link.attrs:
            rec["candidate_url"] = link.attrs["href"]
        if rec:
            out.append(rec)
    return out


def extract_nested_records(html: str) -> list[dict[str, str]]:
    """S5: election-group -> position -> candidate; inner rows inherit the
    outer attributes (data-* on the group/position elements)."""
    out: list[dict[str, str]] = []
    root = parse_html(html)
    for group in root.find_all(cls="group"):
        group_attrs = {
            k.removeprefix("data-"): v
            for k, v in group.attrs.items()
            if k.startswith("data-")
        }
        for position in group.find_all(cls="position"):
            pos_attrs = {
                k.removeprefix("data-"): v
                for k, v in position.attrs.items()
                if k.startswith("data-")
            }
            for cand in position.find_all(cls="candidate"):
                rec = dict(group_attrs)
                rec.update(pos_attrs)
                for el in cand.find_all():
                    field = el.attrs.get("data-field")
                    if field:
                        rec[field] = el.text()
                if cand.attrs.get("data-field"):
                    rec[cand.attrs["data-field"]] = cand.text()
                out.append(rec)
    return out


def extract_sectioned_records(html: str) -> list[dict[str, str]]:
    """W4 source shape: h2 section headers followed by table rows; each
    record carries the *raw* section when present and '' otherwise — the
    fill-forward itself is done Spark-side with a window
    (last(ignorenulls)), not in the parser, so it distributes."""
    out: list[dict[str, str]] = []
    root = parse_html(html)
    section = ""
    emitted_for_section = False

    def walk(node: Node) -> None:
        nonlocal section, emitted_for_section
        for child in node.children:
            if not isinstance(child, Node):
                continue
            if child.tag == "h2":
                section = child.text()
                emitted_for_section = False
                continue
            if child.tag == "tr":
                cells = [td.text() for td in child.find_all("td")]
                if cells:
                    rec = {"col" + str(i): c for i, c in enumerate(cells)}
                    rec["section"] = "" if emitted_for_section else section
                    emitted_for_section = True
                    out.append(rec)
                continue
            walk(child)

    walk(root)
    return out


PARSERS = {
    "table": extract_table_records,
    "cards": extract_card_records,
    "nested": extract_nested_records,
    "sectioned": extract_sectioned_records,
}
