"""Compiled evaluators for the common XPath subset, on ElementTree.

Why: Spark's built-in ``xpath()`` runs javax.xml.xpath, which costs
~1-3 ms per evaluation (DocumentBuilder + XPath re-evaluation per row) —
it was 85% of extraction wall time. Real extraction configs (incl. both
reference configs) overwhelmingly use the shape
``//el/sub/.../(@attr | text())`` with at most an attribute-equality
predicate per step, which evaluates in ~1 µs on an already-parsed
ElementTree. This module compiles that subset; anything else returns
``None`` and the engine falls back to the general JVM ``xpath()`` path
(``extract.project_cells``), keeping full XPath 1.0 compatibility.

Subset grammar::

    path     := ('/' | '//') step ('/' step)*  terminal?
    step     := (qname | '*') pred?
    pred     := '[@' qname '=' ('single' | "double") '-quoted value ']'
    terminal := '/text()' | '/@' qname

Semantics matched to the general path (Spark's ``xpath``, verified on
pyspark 4.1.2) and to the reference's javax NODESET evaluation
(``XmlExtractor.java:100-109``):
- ``//name`` is descendant-or-self from the document node, so it matches
  the fragment root element too (ElementTree's ``.//`` alone does not).
- A bare element result contributes its whole string value
  (``itertext``); ``text()`` selects the element's direct text nodes
  (text + child tails); ``@attr`` the attribute value. All matched
  nodes' string values concatenate with no separator.
- ``[@attr='v']`` keeps a step's matches whose attribute equals the
  literal exactly (javax string comparison); a missing attribute never
  matches.
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
from typing import Callable, NamedTuple
from xml.etree.ElementTree import Element

# step = optional-prefix:name; prefix ignored at match time (see above)
_NAME = r"[A-Za-z_][\w.-]*"
_QNAME = rf"(?:{_NAME}:)?{_NAME}"

# step name = qname or the * wildcard (any element, javax semantics);
# [@attr='value'] / [@attr="value"] — one predicate per step
_STEP_RE = re.compile(
    rf"({_QNAME}|\*)(?:\[@({_QNAME})=(?:'([^']*)'|\"([^\"]*)\")\])?"
)


class _Step(NamedTuple):
    name: str
    pred_attr: str | None  # local name of the predicate attribute
    pred_val: str | None


def _local(name: str) -> str:
    """Local part of an ElementTree tag ({uri}local) or config step
    (prefix:local)."""
    if name.startswith("{"):
        return name.rsplit("}", 1)[1]
    if ":" in name:
        return name.rsplit(":", 1)[1]
    return name


def _parse_path(path: str) -> list[_Step] | None:
    """Parse the step part of a subset expression (no terminal) into
    steps, or None when out of grammar. A real tokenizer, not a split
    on '/': predicate values may contain slashes."""
    if path.startswith("//"):
        pos = 2
    elif path.startswith("/"):
        pos = 1
    else:
        return None
    steps: list[_Step] = []
    while True:
        m = _STEP_RE.match(path, pos)
        if m is None:
            return None
        name, pattr, v1, v2 = m.groups()
        val = v1 if v1 is not None else v2
        steps.append(
            _Step(_local(name), _local(pattr) if pattr else None, val)
        )
        pos = m.end()
        if pos == len(path):
            return steps
        if path[pos] != "/":
            return None
        pos += 1


def _split_terminal(expr: str) -> tuple[str, tuple | None]:
    """Split off the ``/text()`` or ``/@attr`` terminal."""
    if expr.endswith("/text()"):
        return expr[: -len("/text()")], ("text",)
    m = re.search(rf"/@({_QNAME})$", expr)
    if m:
        return expr[: m.start()], ("attr", _local(m.group(1)))
    return expr, None


def strip_prefixes(expr: str) -> str:
    """Rewrite a subset-shaped expression to unprefixed local-name steps
    (``//bk:book/@ns:id`` → ``//book/@id``, predicates included);
    returns the input unchanged when it is outside the subset grammar
    (never a blind regex over arbitrary XPath — predicate strings could
    contain colons).

    Used by the general JVM path so both paths share one namespace
    semantics: Spark's ``xpath`` matches unprefixed steps by local name
    in any namespace but matches *prefixed* steps against nothing;
    stripping the prefix makes a prefixed config behave identically on
    the fused and general paths.
    """
    e = expr.strip()
    path, terminal = _split_terminal(e)
    steps = _parse_path(path)
    if steps is None:
        return expr
    lead = "//" if path.startswith("//") else "/"

    def render(s: _Step) -> str:
        if s.pred_attr is None:
            return s.name
        # re-quote with the quote style that cannot appear in the value
        q = "'" if "'" not in s.pred_val else '"'
        return f"{s.name}[@{s.pred_attr}={q}{s.pred_val}{q}]"

    out = lead + "/".join(render(s) for s in steps)
    if terminal == ("text",):
        out += "/text()"
    elif terminal is not None:
        out += f"/@{terminal[1]}"
    return out


def _get_attr_local(n: Element, attr: str) -> str | None:
    """Attribute lookup by local name (namespaced attrs match too)."""
    v = n.get(attr)
    if v is None:
        for k, kv in n.attrib.items():
            if k.startswith("{") and _local(k) == attr:
                v = kv
                break
    return v


def compile_subset(expr: str) -> Callable[[Element], str | None] | None:
    """Compile ``expr`` into ``tree -> concatenated-string-or-None``
    (None = empty nodeset → no cell). Returns None if out of subset."""
    path, terminal = _split_terminal(expr.strip())
    steps = _parse_path(path)
    if steps is None:
        return None
    first, rest = steps[0], steps[1:]

    def keep(n: Element, s: _Step) -> bool:
        if not isinstance(n.tag, str):
            return False
        if s.name != "*" and _local(n.tag) != s.name:
            return False
        if s.pred_attr is None:
            return True
        return _get_attr_local(n, s.pred_attr) == s.pred_val

    def evaluate(root: Element) -> str | None:
        # descendant-or-self for the first step (document-node context);
        # iter() walks in document order, root included.
        nodes = [n for n in root.iter() if keep(n, first)]
        for step in rest:
            nodes = [c for n in nodes for c in n if keep(c, step)]
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
                v = _get_attr_local(n, attr)
                if v is not None:
                    values.append(v)
        if not values:
            return None  # empty nodeset: reference drops the cell
        return "".join(values)

    return evaluate
