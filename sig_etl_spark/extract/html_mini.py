"""Minimal HTML document model on the stdlib parser.

The reference parses scraped pages with BeautifulSoup
(/root/reference/templates/template_extract.py:24-32 and 94 extract()
defs). bs4 is not part of this engine's runtime, so the extraction UDFs
use this small stdlib-backed tree with the three operations the scan
shapes need: find descendants by tag/class, read attributes, and collect
text. If bs4 is importable the UDFs could swap it in transparently — the
record contract (list[dict[str, str]]) is parser-agnostic.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    # -- queries ----------------------------------------------------------
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def find_all(self, tag: str | None = None, cls: str | None = None):
        for child in self.children:
            if isinstance(child, Node):
                if (tag is None or child.tag == tag) and (
                    cls is None or cls in child.classes()
                ):
                    yield child
                yield from child.find_all(tag, cls)

    def find(self, tag: str | None = None, cls: str | None = None) -> "Node | None":
        return next(self.find_all(tag, cls), None)

    def text(self) -> str:
        parts: list[str] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, str):
                    parts.append(c)
                else:
                    walk(c)

        walk(self)
        return " ".join(" ".join(parts).split())


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_endtag(self, tag):
        # tolerate unbalanced markup: pop to the nearest matching open tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data and not data.isspace():
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text or "")
    return b.root
