import xml.etree.ElementTree as ET

from hadoopxmlextractor_spark.xpath_subset import compile_subset

DOC = ET.fromstring(
    '<store name="S1"><address><street>Main</street><phone>123</phone>'
    '<phone>456</phone></address>'
    '<inventory month="Jan"><book id="b1">text<i>in</i>tail</book></inventory></store>'
)


def ev(expr, tree=DOC):
    f = compile_subset(expr)
    assert f is not None, f"{expr} should be in subset"
    return f(tree)


def test_root_attr():
    # //store matches the fragment root (descendant-or-self semantics)
    assert ev("//store/@name") == "S1"


def test_nested_text():
    assert ev("//address/phone/text()") == "123456"  # multi-node concat


def test_nested_attr():
    assert ev("//inventory/book/@id") == "b1"
    assert ev("//book/@id") == "b1"


def test_element_string_value():
    assert ev("//address/street") == "Main"
    assert ev("//book") == "textintail"  # itertext includes child + tail


def test_text_with_child_tail():
    # direct text nodes of <book>: "text" then tail "tail" (not <i>'s text)
    assert ev("//book/text()") == "texttail"


def test_empty_nodeset_returns_none():
    assert ev("//nope/@x") is None
    assert ev("//store/@nope") is None


def test_out_of_subset_falls_back():
    for expr in [
        "//book[@id='b1']/@id",  # predicate
        "//*/@id",  # wildcard
        "//a/../b",  # parent axis
        "count(//book)",  # function
        "//ns:store/@name",  # namespace prefix
    ]:
        assert compile_subset(expr) is None, expr


def test_single_leading_slash():
    assert ev("/store/@name") == "S1"
