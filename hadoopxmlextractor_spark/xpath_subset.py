"""Compiled evaluators for the common XPath subset, on ElementTree.

Why: Spark's built-in ``xpath()`` runs javax.xml.xpath, which costs
~1-3 ms per evaluation (DocumentBuilder + XPath re-evaluation per row) —
it was 85% of extraction wall time. Real extraction configs (incl. both
reference configs) overwhelmingly use the shape
``//el/sub/.../(@attr | text())``, which evaluates in ~1 µs on an
already-parsed ElementTree. This module compiles that subset; anything
else returns ``None`` and the engine falls back to the general JVM
``xpath()`` path (``extract.project_cells``), keeping full XPath 1.0
compatibility.

Semantics matched to the reference's javax XPath NODESET evaluation
(``XmlExtractor.java:100-109``):
- ``//name`` is descendant-or-self from the document node, so it matches
  the fragment root element too (ElementTree's ``.//`` alone does not).
- A bare element result contributes its whole string value
  (``itertext``); ``text()`` selects the element's direct text nodes
  (text + child tails); ``@attr`` the attribute value. All matched
  nodes' string values concatenate with no separator.
"""

from __future__ import annotations

import re
from typing import Callable
from xml.etree.ElementTree import Element

# //step/step/.../terminal  (also accepts a single leading /)
_NAME = r"[A-Za-z_][\w.-]*"
_SUBSET_RE = re.compile(
    rf"^//?({_NAME})((?:/{_NAME})*)/?(?:/(@({_NAME})|text\(\)))?$"
)


def compile_subset(expr: str) -> Callable[[Element], str | None] | None:
    """Compile ``expr`` into ``tree -> concatenated-string-or-None``
    (None = empty nodeset → no cell). Returns None if out of subset."""
    expr = expr.strip()
    terminal = None  # None | ("attr", name) | ("text",)
    path = expr
    if path.endswith("/text()"):
        terminal = ("text",)
        path = path[: -len("/text()")]
    else:
        m = re.search(rf"/@({_NAME})$", path)
        if m:
            terminal = ("attr", m.group(1))
            path = path[: m.start()]
    if not re.fullmatch(rf"//?{_NAME}(/{_NAME})*", path):
        return None
    steps = [s for s in path.split("/") if s]
    first, rest = steps[0], steps[1:]

    def evaluate(root: Element) -> str | None:
        # descendant-or-self for the first step (document-node context)
        nodes = [root] if root.tag == first else []
        nodes += root.findall(f".//{first}")
        for step in rest:
            nodes = [c for n in nodes for c in n.findall(step)]
        if terminal is None:
            values = ["".join(n.itertext()) for n in nodes]
        elif terminal[0] == "text":
            values = []
            for n in nodes:
                direct = [n.text or ""] + [c.tail or "" for c in n]
                values.extend(t for t in direct if t != "")
        else:
            attr = terminal[1]
            values = [v for n in nodes if (v := n.get(attr)) is not None]
        if not values:
            return None  # empty nodeset: reference drops the cell
        return "".join(values)

    return evaluate
