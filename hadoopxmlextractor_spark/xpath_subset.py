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

Semantics matched to the general path (Spark's ``xpath``, verified on
pyspark 4.1.2) and to the reference's javax NODESET evaluation
(``XmlExtractor.java:100-109``):
- ``//name`` is descendant-or-self from the document node, so it matches
  the fragment root element too (ElementTree's ``.//`` alone does not).
- A bare element result contributes its whole string value
  (``itertext``); ``text()`` selects the element's direct text nodes
  (text + child tails); ``@attr`` the attribute value. All matched
  nodes' string values concatenate with no separator.
- **Namespaces**: name tests match by LOCAL NAME, ignoring both the
  document's namespace (ElementTree's ``{uri}local`` expansion) and any
  prefix written in the config step (``bk:book`` ≡ ``book``). This is
  exactly what Spark's ``xpath`` does on namespaced documents (an
  unprefixed step matches elements in any namespace), so the fused and
  general paths agree; prefixed steps therefore stay ON the ~40× fused
  fast path instead of silently falling back. The reference's
  namespace-aware javax DOM would instead throw on an unresolvable
  prefix and silently drop the cell (``XmlExtractor.java:84-91,
  114-126``) — a defect we deliberately fix, like the byte-scanner
  false positives (SURVEY.md §2.2-4).
"""

from __future__ import annotations

import re
from typing import Callable
from xml.etree.ElementTree import Element

# step = optional-prefix:name; prefix ignored at match time (see above)
_NAME = r"[A-Za-z_][\w.-]*"
_QNAME = rf"(?:{_NAME}:)?{_NAME}"


def _local(name: str) -> str:
    """Local part of an ElementTree tag ({uri}local) or config step
    (prefix:local)."""
    if name.startswith("{"):
        return name.rsplit("}", 1)[1]
    if ":" in name:
        return name.rsplit(":", 1)[1]
    return name


def strip_prefixes(expr: str) -> str:
    """Rewrite a subset-shaped expression to unprefixed local-name steps
    (``//bk:book/@ns:id`` → ``//book/@id``); returns the input unchanged
    when it is outside the subset grammar (never a blind regex over
    arbitrary XPath — predicates/strings could contain colons).

    Used by the general JVM path so both paths share one namespace
    semantics: Spark's ``xpath`` matches unprefixed steps by local name
    in any namespace but matches *prefixed* steps against nothing;
    stripping the prefix makes a prefixed config behave identically on
    the fused and general paths.
    """
    e = expr.strip()
    terminal = ""
    path = e
    if path.endswith("/text()"):
        terminal = "/text()"
        path = path[: -len("/text()")]
    else:
        m = re.search(rf"/@({_QNAME})$", path)
        if m:
            terminal = f"/@{_local(m.group(1))}"
            path = path[: m.start()]
    if not re.fullmatch(rf"//?{_QNAME}(/{_QNAME})*", path):
        return expr
    lead = "//" if path.startswith("//") else "/"
    return lead + "/".join(_local(s) for s in path.split("/") if s) + terminal


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
        m = re.search(rf"/@({_QNAME})$", path)
        if m:
            terminal = ("attr", _local(m.group(1)))
            path = path[: m.start()]
    if not re.fullmatch(rf"//?{_QNAME}(/{_QNAME})*", path):
        return None
    steps = [_local(s) for s in path.split("/") if s]
    first, rest = steps[0], steps[1:]

    def evaluate(root: Element) -> str | None:
        # descendant-or-self for the first step (document-node context);
        # iter() walks in document order, root included.
        nodes = [
            n
            for n in root.iter()
            if isinstance(n.tag, str) and _local(n.tag) == first
        ]
        for step in rest:
            nodes = [
                c
                for n in nodes
                for c in n
                if isinstance(c.tag, str) and _local(c.tag) == step
            ]
        if terminal is None:
            values = ["".join(n.itertext()) for n in nodes]
        elif terminal[0] == "text":
            values = []
            for n in nodes:
                direct = [n.text or ""] + [c.tail or "" for c in n]
                values.extend(t for t in direct if t != "")
        else:
            attr = terminal[1]
            values = []
            for n in nodes:
                v = n.get(attr)
                if v is None:  # namespaced attribute: match by local name
                    for k, kv in n.attrib.items():
                        if k.startswith("{") and _local(k) == attr:
                            v = kv
                            break
                if v is not None:
                    values.append(v)
        if not values:
            return None  # empty nodeset: reference drops the cell
        return "".join(values)

    return evaluate
