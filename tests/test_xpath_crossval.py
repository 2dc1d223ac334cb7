"""Cross-validation of the fused XPath subset against Spark's JVM
xpath over GENERATED documents and expressions — the axis/predicate
rework's safety net beyond the hand-picked cases: every expression the
subset claims to compile must agree with javax node-for-node on
arbitrary tree shapes (nested same-name elements, empty nodesets,
multi-node concat, mixed text/tails)."""

import random
import xml.etree.ElementTree as ET

import pyspark.sql.functions as F

from hadoopxmlextractor_spark.xpath_subset import compile_subset, normalize_for_jvm

TAGS = ["a", "b", "c", "d"]
ATTRS = [("id", ["1", "2", "x"]), ("cat", ["p", "q"])]
TEXTS = ["t1", "t2", "zz"]


def _gen_tree(rng: random.Random, ns: bool = False) -> str:
    pre = "x:" if ns else ""

    def build(depth: int) -> ET.Element:
        el = ET.Element(pre + rng.choice(TAGS))
        if rng.random() < 0.6:
            name, vals = rng.choice(ATTRS)
            el.set(name, rng.choice(vals))
        if rng.random() < 0.5:
            el.text = rng.choice(TEXTS)
        if depth < 3:
            for _ in range(rng.randint(0, 3)):
                child = build(depth + 1)
                el.append(child)
                if rng.random() < 0.3:
                    child.tail = rng.choice(TEXTS)
        return el

    root = ET.Element(pre + "r")
    if ns:
        root.set("xmlns:x", "http://example.com/x")
    for _ in range(rng.randint(1, 3)):
        root.append(build(1))
    return ET.tostring(root, encoding="unicode")


def _gen_branch(rng: random.Random) -> str:
    parts = []
    for step_i in range(rng.randint(1, 3)):
        axis = "//" if rng.random() < 0.6 else "/"
        # parent / sibling axes (round-4 subset extension): '..' may
        # reach the DOCUMENT node from the root — also exercised
        aroll = rng.random()
        if step_i > 0 and aroll < 0.12:
            parts.append("/..")  # '//..' is out of subset (text nodes)
            continue
        axis_prefix = ""
        if step_i > 0 and aroll < 0.34:
            axis = "/"  # '//' before an axis step is out of subset
            axis_prefix = rng.choice(
                ["parent::", "following-sibling::", "preceding-sibling::",
                 "ancestor::"]
            )
        name = rng.choice(TAGS + ["*"])
        if name != "*" and not axis_prefix and rng.random() < 0.2:
            name = f"x:{name}"  # prefixed step: local-name match via strip
        pred = ""
        # reverse axes (preceding-sibling, ancestor) now take
        # positional predicates with proximity semantics — fuzzed like
        # every other axis (round-5 subset extension)
        roll = rng.random()
        if roll < 0.2:
            attr, vals = rng.choice(ATTRS)
            pred = f"[@{attr}='{rng.choice(vals)}']"
        elif roll < 0.32:
            pred = f"[{rng.randint(1, 3)}]"
        elif roll < 0.44:
            # numeric comparison: attr values include numerics ("1",
            # "2"), a non-numeric ("x" → NaN), and absent attrs (empty
            # nodeset) — all three comparison regimes get exercised
            attr, _ = rng.choice(ATTRS)
            op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
            rhs = rng.choice(["1", "2", "1.5"])
            pred = f"[@{attr}{op}{rhs}]"
        elif roll < 0.52:
            pred = "[last()]"
        elif roll < 0.6:
            op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
            pred = f"[position(){op}{rng.randint(1, 3)}]"
        elif roll < 0.72:
            # string-function predicates: substrings that hit present
            # values ("1", "p"), miss ("zz"), and the empty string
            # (contains('',·) true; every string starts-with '')
            fn = rng.choice(["contains", "starts-with"])
            attr, _ = rng.choice(ATTRS)
            arg = rng.choice(["1", "p", "zz", ""])
            pred = f"[{fn}(@{attr},'{arg}')]"
        parts.append(f"{axis}{axis_prefix}{name}{pred}")
    roll = rng.random()
    if roll < 0.3:
        parts.append("/text()" if rng.random() < 0.7 else "//text()")
    elif roll < 0.5:
        parts.append(f"/@{rng.choice(['id', 'cat'])}")
    return "".join(parts)


def _gen_expr(rng: random.Random) -> str:
    # ~1/3 top-level unions (2-3 branches): the union nodeset must
    # merge in global document order with duplicates held once
    if rng.random() < 0.35:
        return " | ".join(_gen_branch(rng) for _ in range(rng.randint(2, 3)))
    return _gen_branch(rng)


def test_fused_subset_agrees_with_jvm_xpath_on_generated_cases(spark):
    rng = random.Random(20260813)
    # mix in namespaced documents: unprefixed steps must match by local
    # name on both paths (the round-2 namespace semantics)
    docs = [_gen_tree(rng, ns=(i % 4 == 3)) for i in range(40)]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, xml string")

    checked = 0
    for _ in range(60):
        expr = _gen_expr(rng)
        ev = compile_subset(expr)
        assert ev is not None, f"generated expr left the subset: {expr}"
        jvm_expr = normalize_for_jvm(expr)  # what project_cells evaluates
        jvm = {
            # null node values join as "" (array_join semantics in
            # extract.project_cells); empty array ≡ no cell ≡ None
            r["i"]: "".join(x or "" for x in r["nodes"]) if r["nodes"] else None
            for r in df.select(
                "i", F.xpath("xml", F.lit(jvm_expr)).alias("nodes")
            ).collect()
        }
        for i, doc in enumerate(docs):
            fused = ev(ET.fromstring(doc))
            assert (fused or "") == (jvm[i] or ""), (expr, i, fused, jvm[i], doc)
        checked += 1
    assert checked == 60
