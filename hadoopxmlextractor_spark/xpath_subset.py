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

    expr     := path ('|' path)*          -- top-level XPath 1.0 union
    path     := (('/' | '//') step)+  terminal?
    step     := (qname | '*') pred?
              | '..'                      -- parent::node() (document ok)
              | 'parent::' (qname | '*') pred?
              | 'following-sibling::' (qname | '*') pred?
              | 'preceding-sibling::' (qname | '*') pred?
              | 'ancestor::' (qname | '*') pred?
                 -- reverse axes (preceding-sibling, ancestor) take
                 -- positional predicates with XPath proximity
                 -- semantics: position() counts AWAY from the context
                 -- node (preceding-sibling::x[1] = nearest preceding)
                 -- parent/sibling/ancestor steps accept only the '/'
                 -- separator: '//..' / '//parent::x' / '//ancestor::x'
                 -- are OUT of subset because
                 -- descendant-or-self::node() includes text nodes,
                 -- whose parents/siblings the element-only model
                 -- cannot reach (verified against javax; falls back)
    pred     := '[@' qname '=' ('single' | "double") '-quoted value ']'
              | '[@' qname ('='|'!='|'<'|'<='|'>'|'>=') number ']'
              | '[' digits ']' | '[last()]'
              | '[position()' op digits ']'
              | '[contains(@' qname ', quoted value)]'
              | '[starts-with(@' qname ', quoted value)]'
    terminal := '/text()' | '//text()' | '/@' qname

Union semantics (javax, cross-validated): branches evaluate
independently; the combined NODESET concatenates in GLOBAL document
order with duplicates held once, and an attribute node sorts
immediately after its owner element, before the element's text and
children.

Semantics matched to the general path (Spark's ``xpath``, verified on
pyspark 4.1.2) and to the reference's javax NODESET evaluation
(``XmlExtractor.java:100-109``):
- ``//`` before any step (not just the first) is the descendant-or-self
  axis: ``/store//book`` matches books at any depth under the root.
  From the document node it matches the fragment root element too
  (ElementTree's ``.//`` alone does not); a leading single ``/`` is the
  document's child axis and matches only the root element, exactly like
  javax — NOT a descendant search.
- ``[n]`` keeps the n-th matching CHILD within each parent context
  (javax ``book[2]`` = second book of each parent, not the second book
  overall); results concatenate in document order with duplicates
  removed, as a javax NODESET does.
- A bare element result contributes its subtree's text — precisely:
  the distinct text nodes under all matched elements, document order,
  each text node once (``//expr//text()`` semantics, enforced on the
  general path by :func:`normalize_for_jvm`). This is a DELIBERATE
  defect fix: the reference appends ``Node.getNodeValue()`` per
  matched node (``XmlExtractor.java:108``), which is null for element
  nodes, so its output cell is the literal string ``"null"`` per
  match — meaningless; Spark's Hive-style ``xpath()`` instead yields
  null entries that ``array_join`` drops (empty cell). We emit the
  XPath string value, the only one of the three a user could want.
  ``text()`` selects the element's direct text nodes (text + child
  tails); ``@attr`` the attribute value. All matched nodes' values
  concatenate with no separator.
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
# [@attr='value'] / [@attr="value"] / [@attr OP number] / [n] /
# [last()] / [position() OP n] / [contains(@attr,'v')] /
# [starts-with(@attr,'v')] — one predicate per step. OP ∈ {=, !=, <,
# <=, >, >=} with an unquoted numeric literal (XPath 1.0 number
# comparison). The string functions take string(@attr) — a missing
# attribute is the empty string, XPath 1.0 string() of an empty
# nodeset.
_NUM = r"-?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)"
_AXIS_RE = re.compile(r"(parent|following-sibling|preceding-sibling|ancestor)::")
_STEP_RE = re.compile(
    rf"({_QNAME}|\*)"
    rf"(?:\[@({_QNAME})=(?:'([^']*)'|\"([^\"]*)\")\]"
    rf"|\[@({_QNAME})\s*(!=|<=|>=|<|>|=)\s*({_NUM})\]"
    rf"|\[([0-9]+)\]"
    rf"|\[(last\(\))\]"
    rf"|\[position\(\)\s*(!=|<=|>=|<|>|=)\s*([0-9]+)\]"
    rf"|\[(contains|starts-with)\(@({_QNAME})\s*,\s*(?:'([^']*)'|\"([^\"]*)\")\)\])?"
)


class _Step(NamedTuple):
    name: str
    axis: str  # "child" | "desc" (the separator written before the step)
    pred_attr: str | None  # local name of the predicate attribute
    pred_val: str | None
    pos: int | None  # 1-based positional predicate ([n])
    cmp: tuple[str, str, str] | None = None  # (attr local, op, numeric literal)
    is_last: bool = False  # [last()]
    pos_cmp: tuple[str, int] | None = None  # [position() OP n]
    fn_pred: tuple[str, str, str] | None = None  # (fn, attr local, value)
    kind: str = "child"  # "child" | "parent" | "fsib" | "psib"


# XPath 1.0 number(): optional sign, digits with optional fraction —
# NO exponent notation (number('1e3') is NaN in XPath, unlike Python).
_XPATH_NUM_RE = re.compile(rf"^\s*{_NUM}\s*$")


def _xpath_number(s: str | None) -> float | None:
    """XPath 1.0 number() of an attribute string: None ⇒ NaN (modelled
    as None, so every comparison is false)."""
    if s is None or _XPATH_NUM_RE.match(s) is None:
        return None
    return float(s)


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
    steps: list[_Step] = []
    pos = 0
    while pos < len(path):
        if path.startswith("//", pos):
            axis, pos = "desc", pos + 2
        elif path.startswith("/", pos):
            axis, pos = "child", pos + 1
        else:
            return None
        # abbreviated parent step: '..' = parent::node() — matches the
        # DOCUMENT node from the root (unlike parent::*, whose
        # principal node type is element); no predicates.
        # '//' before a parent/sibling step is OUT of subset:
        # descendant-or-self::node() includes TEXT nodes, whose
        # parents/siblings our element-only expansion cannot model
        # (verified divergence vs javax) — JVM fallback.
        if path.startswith("..", pos):
            if axis == "desc":
                return None
            if pos + 2 < len(path) and path[pos + 2] != "/":
                return None  # '..[pred]' etc: out of subset
            steps.append(_Step("..", axis, None, None, None, kind="parent"))
            pos += 2
            continue
        kind = "child"
        am = _AXIS_RE.match(path, pos)
        if am is not None:
            if axis == "desc":
                return None  # '//parent::x' etc: text-node contexts
            kind = {"parent": "parent", "following-sibling": "fsib",
                    "preceding-sibling": "psib", "ancestor": "anc"}[am.group(1)]
            pos = am.end()
        m = _STEP_RE.match(path, pos)
        if m is None:
            return None
        (
            name, pattr, v1, v2, cattr, cop, cnum, idx, lastg, posop, posn,
            fn, fattr, fv1, fv2,
        ) = m.groups()
        val = v1 if v1 is not None else v2
        fval = fv1 if fv1 is not None else fv2
        step = _Step(
            _local(name),
            axis,
            _local(pattr) if pattr else None,
            val,
            int(idx) if idx is not None else None,
            (_local(cattr), cop, cnum) if cattr is not None else None,
            lastg is not None,
            (posop, int(posn)) if posop is not None else None,
            (fn, _local(fattr), fval) if fn is not None else None,
            kind,
        )
        # Reverse axes (preceding-sibling, ancestor) take positional
        # predicates too: position() counts AWAY from the context node
        # (XPath 1.0 proximity position), which the evaluator models by
        # filtering the axis-ordered candidate list — in subset.
        steps.append(step)
        pos = m.end()
    return steps or None


def _split_terminal(expr: str) -> tuple[str, tuple | None]:
    """Split off the ``//text()``, ``/text()`` or ``/@attr`` terminal."""
    if expr.endswith("//text()"):
        return expr[: -len("//text()")], ("dtext",)
    if expr.endswith("/text()"):
        return expr[: -len("/text()")], ("text",)
    m = re.search(rf"/@({_QNAME})$", expr)
    if m:
        return expr[: m.start()], ("attr", _local(m.group(1)))
    return expr, None


def _split_union(expr: str) -> list[str]:
    """Split a top-level XPath 1.0 union (``e1 | e2 | ...``) into its
    branch expressions. A real scanner, not ``str.split``: ``|`` inside
    a quoted predicate value must not split. Returns [expr] when there
    is no top-level union."""
    parts: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    for ch in expr:
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            buf.append(ch)
            quote = ch
        elif ch == "|":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts]


def _strip_one(expr: str) -> str | None:
    """strip_prefixes for a single (non-union) branch; None = out of
    grammar."""
    e = expr.strip()
    path, terminal = _split_terminal(e)
    steps = _parse_path(path)
    if steps is None:
        return None

    def render(s: _Step) -> str:
        if s.name == "..":
            return ("//" if s.axis == "desc" else "/") + ".."
        base = {
            "child": "", "parent": "parent::",
            "fsib": "following-sibling::", "psib": "preceding-sibling::",
            "anc": "ancestor::",
        }[s.kind] + s.name
        if s.pred_attr is not None:
            # re-quote with the quote style that cannot appear in the value
            q = "'" if "'" not in s.pred_val else '"'
            base += f"[@{s.pred_attr}={q}{s.pred_val}{q}]"
        elif s.cmp is not None:
            base += f"[@{s.cmp[0]}{s.cmp[1]}{s.cmp[2]}]"
        elif s.pos is not None:
            base += f"[{s.pos}]"
        elif s.is_last:
            base += "[last()]"
        elif s.pos_cmp is not None:
            base += f"[position(){s.pos_cmp[0]}{s.pos_cmp[1]}]"
        elif s.fn_pred is not None:
            fn, attr, arg = s.fn_pred
            q = "'" if "'" not in arg else '"'
            base += f"[{fn}(@{attr},{q}{arg}{q})]"
        return ("//" if s.axis == "desc" else "/") + base

    out = "".join(render(s) for s in steps)
    if terminal == ("text",):
        out += "/text()"
    elif terminal == ("dtext",):
        out += "//text()"
    elif terminal is not None:
        out += f"/@{terminal[1]}"
    return out


def strip_prefixes(expr: str) -> str:
    """Rewrite a subset-shaped expression to unprefixed local-name steps
    (``//bk:book/@ns:id`` → ``//book/@id``, predicates included, each
    branch of a top-level union independently); returns the input
    unchanged when any part is outside the subset grammar (never a
    blind regex over arbitrary XPath — predicate strings could contain
    colons).

    Used by the general JVM path so both paths share one namespace
    semantics: Spark's ``xpath`` matches unprefixed steps by local name
    in any namespace but matches *prefixed* steps against nothing;
    stripping the prefix makes a prefixed config behave identically on
    the fused and general paths.
    """
    stripped = [_strip_one(b) for b in _split_union(expr)]
    if any(s is None for s in stripped):
        return expr
    return " | ".join(stripped) if len(stripped) > 1 else stripped[0]


def normalize_for_jvm(expr: str) -> str:
    """Rewrite a subset expression for Spark's Hive-style ``xpath()`` so
    the general path shares the fused path's semantics: strip namespace
    prefixes (see :func:`strip_prefixes`) and, for a bare element
    terminal, append ``//text()`` — Hive's xpath yields null for
    element nodes (and the reference's ``getNodeValue()`` yields the
    literal string "null", ``XmlExtractor.java:108``), while our
    defined semantics is the subtree string value. Each branch of a
    top-level union is normalized independently. Out-of-subset
    expressions pass through unchanged (full XPath 1.0 on the JVM)."""

    def bare_element_fix(stripped_branch: str) -> str:
        path, terminal = _split_terminal(stripped_branch)
        if terminal is None:
            return stripped_branch + "//text()"
        return stripped_branch

    branches = _split_union(expr)
    stripped = [_strip_one(b) for b in branches]
    if any(s is None for s in stripped):
        # out-of-subset (any part): pass through byte-identical — full
        # XPath 1.0 on the JVM
        return expr
    return " | ".join(bare_element_fix(s) for s in stripped)


def _walk_texts(el: Element):
    """Yield (owner element, text) for every text node in document
    order — ``el.text`` is owned by ``el``; a child's ``tail`` is a
    text node of the PARENT in the XPath data model."""
    if el.text:
        yield (el, el.text)
    for c in el:
        if isinstance(c.tag, str):
            yield from _walk_texts(c)
        if c.tail:
            yield (el, c.tail)


def _get_attr_local(n: Element, attr: str) -> str | None:
    """Attribute lookup by local name (namespaced attrs match too)."""
    v = n.get(attr)
    if v is None:
        for k, kv in n.attrib.items():
            if k.startswith("{") and _local(k) == attr:
                v = kv
                break
    return v


def _keep(n: Element, s: _Step) -> bool:
    if not isinstance(n.tag, str):
        return False
    if s.name != "*" and _local(n.tag) != s.name:
        return False
    if s.cmp is not None:
        # XPath number comparison: number(@attr) OP literal. A
        # MISSING attribute is an empty nodeset — every comparison
        # is false (no node to compare). A present but non-numeric
        # attribute is NaN — false for every operator EXCEPT !=,
        # which IEEE (and javax) makes true: NaN is unequal to
        # everything.
        raw = _get_attr_local(n, s.cmp[0])
        if raw is None:
            return False
        v = _xpath_number(raw)
        op = s.cmp[1]
        if v is None:
            return op == "!="
        rhs = float(s.cmp[2])
        return (
            v == rhs
            if op == "="
            else v != rhs
            if op == "!="
            else v < rhs
            if op == "<"
            else v <= rhs
            if op == "<="
            else v > rhs
            if op == ">"
            else v >= rhs
        )
    if s.fn_pred is not None:
        # contains/starts-with over string(@attr): a missing
        # attribute is string(empty nodeset) = '' (XPath 1.0), so
        # the functions run on '' rather than short-circuiting.
        fn, attr, arg = s.fn_pred
        raw = _get_attr_local(n, attr)
        raw = "" if raw is None else raw
        return arg in raw if fn == "contains" else raw.startswith(arg)
    if s.pred_attr is None:
        return True
    return _get_attr_local(n, s.pred_attr) == s.pred_val


def _eval_steps(root: Element, steps: list[_Step]) -> list[Element]:
    """Walk the step chain and return the matched elements, document-
    ordered. Contexts are elements; None is the document node (its only
    child is the fragment root, its descendant-or-self set is itself +
    every element). Each step expands the descendant axis first when
    written '//', then applies the child axis with the name/attribute
    test and the per-parent positional index — javax's book[2] = second
    matching child of EACH parent. Dedup by identity: nested descendant
    contexts may reach one element twice, a NODESET holds it once."""
    contexts: list[Element | None] = [None]
    # parent map, built once when any step leaves the child axis;
    # ``None`` stands for the DOCUMENT node (root's parent) throughout.
    pm: dict[int, Element] | None = None
    if any(s.kind != "child" for s in steps):
        pm = {}
        for p in root.iter():
            for c in p:
                pm[id(c)] = p
    for step in steps:
        if step.axis == "desc":
            expanded: list[Element | None] = []
            seen: set[int] = set()
            for ctx in contexts:
                ds = (
                    [None, *root.iter()] if ctx is None else list(ctx.iter())
                )
                for d in ds:
                    if id(d) not in seen:
                        seen.add(id(d))
                        expanded.append(d)
            contexts = expanded
        new: list[Element] = []
        seen2: set[int] = set()
        for ctx in contexts:
            if step.kind == "child":
                kids = [root] if ctx is None else list(ctx)
            elif step.kind == "parent":
                if ctx is None:
                    kids = []  # the document has no parent
                elif ctx is root:
                    kids = [None]  # document node
                else:
                    kids = [pm[id(ctx)]]
            elif step.kind == "anc":
                # ancestor chain in DOCUMENT order: document node first
                # (dropped by the element name test), then root, down
                # to the parent — axis order is the reverse (below)
                if ctx is None:
                    kids = []
                else:
                    chain: list[Element | None] = []
                    p = ctx
                    while p is not root:
                        p = pm[id(p)]
                        chain.append(p)
                    chain.append(None)  # the document node
                    kids = chain[::-1]
            else:  # sibling axes: children of the parent around ctx
                if ctx is None or ctx is root:
                    kids = []
                else:
                    sibs = list(pm[id(ctx)])
                    i = next(j for j, c in enumerate(sibs) if c is ctx)
                    kids = sibs[i + 1 :] if step.kind == "fsib" else sibs[:i]
            if step.name == "..":
                matched = kids  # parent::node(): no name test
            else:
                matched = [
                    c for c in kids if c is not None and _keep(c, step)
                ]
            if step.kind in ("psib", "anc"):
                # REVERSE axes: proximity position counts away from the
                # context node, so positional predicates index the
                # reversed (nearest-first) candidate list; the final
                # global document-order sort restores NODESET order
                matched = matched[::-1]
            if step.pos is not None:
                matched = matched[step.pos - 1 : step.pos] if step.pos else []
            elif step.is_last:
                # javax [last()]: the last matching child of EACH
                # parent context (position() == last() per parent)
                matched = matched[-1:]
            elif step.pos_cmp is not None:
                op, n = step.pos_cmp
                matched = [
                    c
                    for i, c in enumerate(matched, 1)
                    if (
                        i == n if op == "="
                        else i != n if op == "!="
                        else i < n if op == "<"
                        else i <= n if op == "<="
                        else i > n if op == ">"
                        else i >= n
                    )
                ]
            for node in matched:
                if id(node) not in seen2:
                    seen2.add(id(node))
                    new.append(node)
        contexts = new
        if not contexts:
            return []
    nodes = contexts
    if (
        any(s.axis == "desc" or s.kind != "child" for s in steps)
        and len(nodes) > 1
    ):
        # nested descendant matches (and parent/sibling hops, whose
        # results need not follow context order) can interleave;
        # a NODESET concatenates in document order — the document
        # node (None) precedes everything
        order = {id(el): i for i, el in enumerate(root.iter())}
        nodes = sorted(
            nodes, key=lambda n: -1 if n is None else order[id(n)]
        )
    return nodes


def _attr_key_local(n: Element, attr: str) -> str | None:
    """The ONE attribute key of ``n`` that ``@attr`` selects — exact
    key preferred, else the first namespaced spelling — the key-level
    twin of :func:`_get_attr_local`, so a branch selects the same
    single attribute node inside a union as it does standalone (two
    same-local-name spellings on one element must not both emit)."""
    if attr in n.attrib:
        return attr
    for k in n.attrib:
        if k.startswith("{") and _local(k) == attr:
            return k
    return None


def compile_subset(expr: str) -> Callable[[Element], str | None] | None:
    """Compile ``expr`` into ``tree -> concatenated-string-or-None``
    (None = empty nodeset → no cell). Returns None if out of subset.

    Top-level XPath 1.0 unions (``//a/@id | //a/text()``) are part of
    the subset: each branch evaluates independently and the combined
    NODESET concatenates in GLOBAL document order with duplicates held
    once — attribute nodes sort immediately after their owner element
    and before its children (the javax document-order rule), which the
    single merge walk reproduces by emitting an element's selected
    attributes, then its text, then its children."""
    branches = _split_union(expr.strip())
    parsed: list[tuple[list[_Step], tuple]] = []
    for b in branches:
        path, terminal = _split_terminal(b)
        steps = _parse_path(path)
        if steps is None:
            return None
        if terminal is None:
            # bare element projection = subtree string value (see module
            # docstring: deliberate fix of the reference's "null" output)
            terminal = ("dtext",)
        parsed.append((steps, terminal))

    if len(parsed) == 1:
        steps, terminal = parsed[0]

        def evaluate_single(root: Element) -> str | None:
            nodes = _eval_steps(root, steps)
            if not nodes:
                return None
            if terminal[0] in ("text", "dtext"):
                # text nodes are selected by OWNER (text: direct
                # children of matched elements; //text(): anywhere in
                # their subtrees) through one global document-order
                # walk — nested matched elements interleave their text
                # nodes, so a per-node concat would misorder (and, for
                # //text(), double-count).
                # a None node is the DOCUMENT (reachable via '..' from
                # the root): no direct text children in the ET model,
                # descendant text = the whole tree's
                if terminal[0] == "text":
                    owners = {id(n) for n in nodes if n is not None}
                else:
                    owners = {
                        id(d)
                        for n in nodes
                        for d in (root.iter() if n is None else n.iter())
                    }
                values = [
                    t for owner, t in _walk_texts(root) if id(owner) in owners
                ]
            else:
                attr = terminal[1]
                values = []
                for n in nodes:
                    if n is None:
                        continue  # the document node has no attributes
                    v = _get_attr_local(n, attr)
                    if v is not None:
                        values.append(v)
            if not values:
                return None  # empty nodeset: reference drops the cell
            return "".join(values)

        return evaluate_single

    def evaluate_union(root: Element) -> str | None:
        attr_sel: dict[int, set[str]] = {}  # id(el) -> selected attrib keys
        text_owned: set[int] = set()  # ids owning selected text nodes
        for steps, terminal in parsed:
            nodes = _eval_steps(root, steps)
            if terminal[0] == "attr":
                for n in nodes:
                    if n is None:
                        continue  # document node: no attributes
                    k = _attr_key_local(n, terminal[1])
                    if k is not None:
                        attr_sel.setdefault(id(n), set()).add(k)
            elif terminal[0] == "text":
                text_owned.update(id(n) for n in nodes if n is not None)
            else:  # dtext
                for n in nodes:
                    text_owned.update(
                        id(d) for d in (root.iter() if n is None else n.iter())
                    )
        values: list[str] = []

        def walk(el: Element) -> None:
            sel = attr_sel.get(id(el))
            if sel:
                for k, v in el.attrib.items():
                    if k in sel:
                        values.append(v)
            if el.text and id(el) in text_owned:
                values.append(el.text)
            for c in el:
                if isinstance(c.tag, str):
                    walk(c)
                if c.tail and id(el) in text_owned:
                    values.append(c.tail)

        walk(root)
        if not values:
            return None
        return "".join(values)

    return evaluate_union
