import xml.etree.ElementTree as ET

from hadoopxmlextractor_spark.xpath_subset import compile_subset, strip_prefixes

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
        "//a//ancestor::b",  # '//' before a reverse axis (text-node ctx)
        "//a//following::b",  # '//' before a full-document axis
        "//a//parent::b",  # '//' before parent (text-node ctx)
        "//a/..[@id='1']",  # INVALID XPath 1.0 (javax throws on it too)
        "count(//book)",  # non-nodeset result type
        "//book[a[b]]/@id",  # nested bracket predicate
        "//book[(1=1)]/@id",  # literal-vs-literal comparison (no nodeset)
        "//book[//name='Ann']/@id",  # ABSOLUTE path inside a predicate
        "//shelf[.//name='x']/@id",  # './/' in pred: javax ns quirk
        # positional predicate CHAINS on reverse axes: Xalan applies
        # the positional leg in document order inside a chain but in
        # proximity order standalone (internally inconsistent) — fall
        # back so configs get javax bug-for-bug
        "//d/preceding::d[last()][@id='1']/..",
        "//a/ancestor::b[1][@x='1']",
        "//a/preceding-sibling::b[@x='1'][2]",
    ]:
        assert compile_subset(expr) is None, expr
    # round-5 subset extensions: these now FUSE
    for expr in [
        "//book[position()=1]/@id",
        "//book[last()]",
        "//book[position()<=2]/text()",
        "//book[price>30]/@id",  # child-element comparison
        "//book[position()=last()]",  # composite positional
        "//text()",  # bare text() (document context)
        "//book[@cat='f'][2]/@id",  # predicate chain
        "//book[@cat='f' and @id='1']/@id",  # boolean predicate
        "/store/descendant::book[2]/@id",
        "//store//descendant::book/@id",  # '//' + descendant:: is exact
        "//title/ancestor-or-self::book/@id",
        "//mag/following::book[1]/@id",
        "//mag/preceding::book[1]/@id",
        "store/shelf/@id",  # relative path (document-anchored)
        "//book/@*",  # attribute wildcard terminal
        "//book/text()[1]",  # positional text() terminal
    ]:
        assert compile_subset(expr) is not None, expr


def test_descendant_text_terminal():
    # //text() = every text NODE under the matched subtrees, document
    # order, each node once even when matches nest
    assert ev("//book//text()") == "textintail"
    assert ev("//store//phone//text()") == "123456"
    doc = ET.fromstring("<d><p>a<p>b</p>c</p></d>")  # nested p matches
    assert compile_subset("//p//text()")(doc) == "abc"
    assert compile_subset("//d//text()")(doc) == "abc"


def test_mid_path_descendant_axis():
    assert ev("/store//phone/text()") == "123456"
    assert ev("//store//book/@id") == "b1"
    assert ev("/store//book/text()") == "texttail"
    # descendant step deeper than one level under an inner step
    assert ev("//inventory//i") == "in"


def test_leading_slash_is_child_axis_not_descendant():
    # javax/Spark semantics: /name from the document node matches ONLY
    # the root element — never a descendant that shares the tag name.
    doc = ET.fromstring('<a id="1"><a id="2"/></a>')
    assert compile_subset("/a/@id")(doc) == "1"
    assert compile_subset("//a/@id")(doc) == "12"
    assert compile_subset("/b/@id")(doc) is None


def test_positional_predicate_is_per_parent():
    doc = ET.fromstring(
        '<s><i><b id="1"/><b id="2"/></i><i><b id="3"/><b id="4"/></i></s>'
    )
    # javax book[2] = the second matching child of EACH parent context
    assert compile_subset("//i/b[2]/@id")(doc) == "24"
    assert compile_subset("//i/b[1]/@id")(doc) == "13"
    assert compile_subset("//i/b[3]/@id")(doc) is None  # past the end
    assert compile_subset("//i[2]/b[1]/@id")(doc) == "3"


def test_descendant_matches_concat_in_document_order():
    # nested matches interleave parents' children; a NODESET
    # concatenates in document order, not per-parent order
    doc = ET.fromstring("<d><p><x>1</x><p><x>2</x></p><x>3</x></p></d>")
    assert compile_subset("//p/x/text()")(doc) == "123"
    assert compile_subset("//p//x/text()")(doc) == "123"


def test_attribute_equality_predicate():
    doc = ET.fromstring(
        '<inv><book id="b1" cat="x">A</book><book id="b2" cat="y">B</book>'
        '<book id="b3" cat="x">C</book></inv>'
    )
    assert compile_subset("//book[@cat='x']")(doc) == "AC"
    assert compile_subset('//book[@cat="y"]/@id')(doc) == "b2"
    assert compile_subset("//book[@cat='z']/@id")(doc) is None  # no match → drop
    assert compile_subset("//book[@missing='x']")(doc) is None  # absent attr
    # predicate on an inner step
    doc2 = ET.fromstring('<s><i m="Jan"><b id="1"/></i><i m="Feb"><b id="2"/></i></s>')
    assert compile_subset("//s/i[@m='Feb']/b/@id")(doc2) == "2"
    # slash inside the predicate value must not break step parsing
    doc3 = ET.fromstring('<r><a href="/x/y">t</a><a href="/z">u</a></r>')
    assert compile_subset("//a[@href='/x/y']")(doc3) == "t"


def test_wildcard_step_matches_any_element():
    doc = ET.fromstring('<r><a id="1">x</a><b id="2">y</b><a>z</a></r>')
    assert compile_subset("//*/@id")(doc) == "12"
    assert compile_subset("//r/*")(doc) == "xyz"
    assert compile_subset("//*[@id='2']")(doc) == "y"


def test_strip_prefixes_keeps_predicates():
    assert (
        strip_prefixes("//bk:book[@ns:cat='x']/@bk:id") == "//book[@cat='x']/@id"
    )


NS_DOC = ET.fromstring(
    '<bk:store xmlns:bk="http://example.com/books" name="S1">'
    '<bk:inventory month="Jan"><bk:book id="b1">hi</bk:book></bk:inventory>'
    "</bk:store>"
)
DEFAULT_NS_DOC = ET.fromstring(
    '<store xmlns="http://example.com/books" name="S1">'
    '<inventory month="Jan"><book id="b1">hi</book></inventory></store>'
)


def test_namespaced_docs_match_by_local_name():
    # ElementTree expands tags to {uri}local; name tests match the local
    # part regardless of the document's namespace — same behavior as
    # Spark's xpath on the general path (verified on pyspark 4.1.2).
    for doc in (NS_DOC, DEFAULT_NS_DOC):
        assert ev("//store/@name", doc) == "S1"
        assert ev("//inventory/book/@id", doc) == "b1"
        assert ev("//book/text()", doc) == "hi"


def test_prefixed_steps_in_subset():
    # Prefixes in the CONFIG are accepted and ignored (local-name match),
    # keeping namespaced configs on the fused fast path.
    assert ev("//bk:store/@name", NS_DOC) == "S1"
    assert ev("//bk:inventory/bk:book/@id", NS_DOC) == "b1"
    assert ev("//bk:store/@name", DOC) == "S1"  # prefix vs plain doc


def test_strip_prefixes_rewrite():
    from hadoopxmlextractor_spark.xpath_subset import strip_prefixes

    assert strip_prefixes("//bk:book/@ns:id") == "//book/@id"
    assert strip_prefixes("/bk:a/b/text()") == "/a/b/text()"
    assert strip_prefixes("//plain/@x") == "//plain/@x"
    # out-of-subset expressions pass through untouched (colons inside
    # predicates must never be rewritten)
    assert strip_prefixes("//a[b=':']/@x") == "//a[b=':']/@x"


def test_single_leading_slash():
    assert ev("/store/@name") == "S1"


def test_contains_predicate():
    assert ev("//inventory[contains(@month,'Ja')]/@month") == "Jan"
    assert ev("//inventory[contains(@month,'zz')]/@month") is None
    # missing attribute: string('') — contains('', 'x') is false,
    # contains('', '') is true (XPath 1.0 string() of empty nodeset)
    assert ev("//address[contains(@month,'J')]/phone/text()") is None
    assert ev("//address[contains(@month,'')]/phone/text()") == "123456"


def test_starts_with_predicate():
    assert ev("//book[starts-with(@id,'b')]/@id") == "b1"
    assert ev("//book[starts-with(@id,'1')]/@id") is None
    # every string starts with the empty string, including string('')
    assert ev("//book[starts-with(@id,'')]/@id") == "b1"
    assert ev("//address[starts-with(@month,'')]/phone/text()") == "123456"


def test_union_terminal_attr_and_text():
    # javax document order: an attribute node sorts right after its
    # owner element and before the element's text/children
    assert ev("//book/@id | //book/text()") == "b1texttail"
    assert ev("//book/text() | //book/@id") == "b1texttail"  # order-insensitive


def test_union_two_attrs_document_order():
    # @name (on <store>) precedes @month (on the later <inventory>)
    # regardless of branch order
    assert ev("//inventory/@month | //store/@name") == "S1Jan"
    assert ev("//store/@name | //inventory/@month") == "S1Jan"


def test_union_dedups_shared_nodes():
    # both branches select <phone> text nodes; the union nodeset holds
    # each text node once
    assert ev("//address/phone/text() | //phone/text()") == "123456"
    assert ev("//book//text() | //book/text()") == "textintail"


def test_union_empty_branches():
    assert ev("//nope/@x | //book/@id") == "b1"
    assert ev("//nope/@x | //missing/text()") is None


def test_union_strip_and_normalize():
    from hadoopxmlextractor_spark.xpath_subset import normalize_for_jvm

    assert strip_prefixes("//bk:book/@ns:id | //bk:book/text()") == (
        "//book/@id | //book/text()"
    )
    # bare-element branches get the //text() rewrite per branch
    assert normalize_for_jvm("//book | //store/@name") == (
        "//book//text() | //store/@name"
    )
    # a '|' inside a quoted predicate value is NOT a union separator
    assert compile_subset("//a[@id='x|y']/@id") is not None
    assert strip_prefixes("//a[@id='x|y']/@id") == "//a[@id='x|y']/@id"


def test_union_attr_selects_one_spelling_like_single_branch():
    # an element carrying BOTH a plain and a namespaced attribute with
    # the same local name: @id selects ONE node (exact key preferred),
    # identically inside and outside a union (code-review regression)
    doc = ET.fromstring(
        '<r xmlns:n="http://e/x"><book id="a" n:id="b">t</book></r>'
    )
    assert ev("//book/@id", doc) == "a"
    assert ev("//book/@id | //zzz/@q", doc) == "a"
    assert ev("//book/@id | //book/@id", doc) == "a"
    # namespaced-only spelling still matches by local name, once
    doc2 = ET.fromstring('<r xmlns:n="http://e/x"><book n:id="b">t</book></r>')
    assert ev("//book/@id | //zzz/@q", doc2) == "b"


def test_parent_and_sibling_axes_fused():
    import xml.etree.ElementTree as ET

    from hadoopxmlextractor_spark.xpath_subset import compile_subset

    xml = (
        '<store id="s1"><book cat="f" id="b1"><title>T1</title>'
        "<price>9</price></book>"
        '<book cat="n" id="b2"><title>T2</title><price>5</price></book>'
        '<mag id="m1"><title>M</title></mag></store>'
    )
    cases = [
        ("//price/../@id", "b1b2"),
        ("//title/parent::book/@id", "b1b2"),
        ("//book/following-sibling::mag/title/text()", "M"),
        ("//book[@cat='f']/following-sibling::book/@id", "b2"),
        ("//mag/preceding-sibling::book/@id", "b1b2"),
        ("//book/following-sibling::book[1]/@id", "b2"),
        # '..' from the root selects the DOCUMENT node: descendant
        # text = the whole tree (javax-verified)
        ("/store/..", "T19T25M"),
    ]
    root = ET.fromstring(xml)
    for expr, want in cases:
        ev = compile_subset(expr)
        assert ev is not None, expr
        assert ev(root) == want, expr
    # out-of-subset axis forms fall back (None): '//' separator
    # before a parent/sibling/ancestor step
    for expr in ["//book//..", "//title//parent::book",
                 "//price//ancestor::book"]:
        assert compile_subset(expr) is None, expr


def test_ancestor_axis_and_reverse_positional_fused():
    import xml.etree.ElementTree as ET

    from hadoopxmlextractor_spark.xpath_subset import compile_subset

    xml = (
        '<lib id="L"><shelf id="s1"><book id="b1"><title>T1</title></book>'
        '<book id="b2"><title>T2</title></book>'
        '<book id="b3"><title>T3</title></book></shelf>'
        '<shelf id="s2"><book id="b4"><title>T4</title></book></shelf></lib>'
    )
    cases = [
        # ancestor:: walks to the root; NODESET output in document order
        ("//title/ancestor::book/@id", "b1b2b3b4"),
        ("//title/ancestor::*/@id", "Ls1b1b2b3s2b4"),
        ("//book[@id='b2']/ancestor::shelf/@id", "s1"),
        # reverse-axis proximity position: [1] = NEAREST ancestor /
        # nearest preceding sibling; [last()] = the FARTHEST
        ("//title/ancestor::*[1]/@id", "b1b2b3b4"),
        ("//title/ancestor::*[2]/@id", "s1s2"),
        ("//title/ancestor::*[last()]/@id", "L"),
        ("//book[@id='b3']/preceding-sibling::book[1]/@id", "b2"),
        ("//book[@id='b3']/preceding-sibling::book[2]/@id", "b1"),
        ("//book[@id='b3']/preceding-sibling::book[last()]/@id", "b1"),
        ("//book[@id='b3']/preceding-sibling::book[position()<=1]/@id", "b2"),
        # attribute predicate on the ancestor step
        ("//title/ancestor::shelf[@id='s2']/book/@id", "b4"),
    ]
    root = ET.fromstring(xml)
    for expr, want in cases:
        ev = compile_subset(expr)
        assert ev is not None, expr
        assert ev(root) == want, expr


# ---------------------------------------------------------------------------
# round-5 subset extensions — every expected value below was probed
# against javax (Spark 4.1.2 xpath()) on these exact documents
# ---------------------------------------------------------------------------

PDOC = ET.fromstring(
    '<store name="s">'
    '<shelf id="s1">'
    '<book id="bk1" cat="f" price="25"><title>T1</title><price>25</price>'
    "tail1</book>"
    '<mag id="m1"/>'
    '<book id="bk2" cat="n" price="35"><title>T2</title><price>35</price>'
    "</book>"
    '<book id="bk3" cat="f" price="45"><title>T3</title><price>abc</price>'
    "</book>"
    "</shelf>"
    '<shelf id="s2">'
    '<book id="bk4" cat="f"><title>T1</title></book>'
    "</shelf>"
    "</store>"
)
MIXED = ET.fromstring("<r>alpha<a at='1'>inner<b/>btail</a>beta<b/>gamma</r>")


def test_predicate_chain_is_sequential():
    # javax: [@cat='f'][2] filters f-books first, THEN indexes per
    # parent — not the same as [2][@cat='f']
    assert ev("//book[@cat='f'][2]/@id", PDOC) == "bk3"
    assert ev("//book[2][@cat='n']/@id", PDOC) == "bk2"
    assert ev("//book[@cat='f'][last()]/@id", PDOC) == "bk3bk4"


def test_boolean_predicates():
    assert ev("//book[@cat='f' and @price>30]/@id", PDOC) == "bk3"
    assert ev("//book[@cat='f' or @id='bk2']/@id", PDOC) == "bk1bk2bk3bk4"
    # 'and' binds tighter than 'or' (javax-verified)
    assert (
        ev("//book[@cat='f' and @price>20 or @id='bk2']/@id", PDOC)
        == "bk1bk2bk3"
    )
    # position() inside a boolean indexes the step's candidate list
    assert ev("//book[@cat='f' and position()<3]/@id", PDOC) == "bk1bk4"
    assert ev("//book[position()=last()]/@id", PDOC) == "bk3bk4"
    assert ev("//book[position()>1 or @id='bk1']/@id", PDOC) == "bk1bk2bk3"
    # whitespace around operators and keywords (javax accepts it)
    assert ev("//book[@cat = 'f']/@id", PDOC) == "bk1bk3bk4"
    assert ev("//book[ @price > 30 ]/@id", PDOC) == "bk2bk3"


def test_existence_predicates():
    assert ev("//book[@cat]/@id", PDOC) == "bk1bk2bk3bk4"
    assert ev("//book[title]/@id", PDOC) == "bk1bk2bk3bk4"
    assert ev("//shelf[book]/@id", PDOC) == "s1s2"
    assert ev("//book[@nope]/@id", PDOC) is None
    assert ev("//book[nope]/@id", PDOC) is None


def test_child_element_comparisons_are_existential():
    # nodeset OP value: true if ANY child matches. bk3's <price> text is
    # 'abc' (NaN): false for >, TRUE for != (IEEE, javax-verified);
    # bk4 has no <price> child: always false (empty nodeset)
    assert ev("//book[price>30]/@id", PDOC) == "bk2"
    assert ev("//book[price!=25]/@id", PDOC) == "bk2bk3"
    assert ev("//book[title='T1']/@id", PDOC) == "bk1bk4"
    assert ev("//book[title = 'T1' or title = 'T2']/@id", PDOC) == "bk1bk2bk4"


def test_attr_string_inequality():
    assert ev("//book[@cat!='f']/@id", PDOC) == "bk2"
    # missing attribute = empty nodeset: != is FALSE, not true
    assert ev("//book[@missing!='f']/@id", PDOC) is None


def test_descendant_axis():
    assert ev("/store/descendant::book/@id", PDOC) == "bk1bk2bk3bk4"
    # positional = per CONTEXT over the full descendant list
    assert ev("/store/descendant::book[2]/@id", PDOC) == "bk2"
    assert ev("/store/shelf/descendant::title[1]", PDOC) == "T1T1"
    # '//' + descendant:: is exact in the element-only model (a text
    # node's descendant set is empty)
    assert ev("//shelf/descendant::mag/@id", PDOC) == "m1"
    # per-context positional over '//'-expanded contexts: store and
    # shelf-s1 both yield bk1 (dedup), shelf-s2 yields bk4 (javax ✓)
    assert ev("//store//descendant::book[1]/@id", PDOC) == "bk1bk4"


def test_ancestor_or_self_axis():
    assert ev("//title/ancestor-or-self::book/@id", PDOC) == "bk1bk2bk3bk4"
    # proximity position: [1] = self (when it matches)
    assert ev("//book/ancestor-or-self::*[1]/@id", PDOC) == "bk1bk2bk3bk4"
    # [last()] = the outermost element (the fragment root)
    assert ev("//book/ancestor-or-self::*[last()]/@name", PDOC) == "s"


def test_following_and_preceding_axes():
    # following excludes descendants; preceding excludes ancestors
    assert ev("//mag/following::book/@id", PDOC) == "bk2bk3bk4"
    assert ev("//mag/following::book[1]/@id", PDOC) == "bk2"
    assert ev("//mag/preceding::book/@id", PDOC) == "bk1"
    # proximity: [1] = nearest PRECEDING in reverse document order
    assert ev("//book[@id='bk4']/preceding::book[1]/@id", PDOC) == "bk3"
    # [2] = the <title> of bk3 (no @id -> empty result)
    assert ev("//book[@id='bk4']/preceding::*[2]/@id", PDOC) is None


def test_relative_paths_anchor_at_document():
    assert ev("store/shelf/@id", PDOC) == "s1s2"
    # NOT a descendant search: a non-root first step matches nothing
    assert ev("shelf/@id", PDOC) is None
    assert ev("store/descendant::book[2]/@id", PDOC) == "bk2"


def test_attr_star_terminal_name_sorted():
    # javax NamedNodeMap returns attributes NAME-SORTED, not in
    # document order (probed: z="1" a="2" m="3" -> a,m,z)
    zdoc = ET.fromstring('<r><book z="1" a="2" m="3"/><item Z="9" b="8"/></r>')
    assert ev("//book/@*", zdoc) == "231"
    assert ev("//item/@*", zdoc) == "98"  # ASCII: 'Z' < 'b'
    assert ev("//*/@*", zdoc) == "23198"
    # document attrs on bk1 are id,cat,price -> emits cat,id,price
    assert ev("//book[@id='bk1']/@*", PDOC) == "fbk125"
    assert ev("//nothing/@*", PDOC) is None


def test_union_multi_attrs_of_one_element_name_sorted():
    # probed: //book[@id='bk1']/@id | .../@cat emits 'f' (cat) before
    # 'bk1' (id) — NamedNodeMap order within one element
    assert (
        ev("//book[@id='bk1']/@id | //book[@id='bk1']/@cat", PDOC) == "fbk1"
    )
    assert (
        ev("//book[@id='bk1']/@* | //book[@id='bk1']/title/text()", PDOC)
        == "fbk125T1"
    )


def test_text_positional_terminals():
    assert ev("/r/text()", MIXED) == "alphabetagamma"
    assert ev("/r/text()[1]", MIXED) == "alpha"
    assert ev("/r/text()[2]", MIXED) == "beta"
    assert ev("/r/text()[last()]", MIXED) == "gamma"
    # bare //text(): every text node in the document
    assert ev("//text()", MIXED) == "alphainnerbtailbetagamma"
    # //text()[1] = FIRST direct text node of EVERY element (per-parent)
    assert ev("//text()[1]", MIXED) == "alphainner"
    assert ev("/r//text()[1]", MIXED) == "alphainner"
    assert ev("//a/text()[last()]", MIXED) == "btail"
    # direct text nodes of bk1 are just the tail 'tail1'
    assert ev("//book/text()[1]", PDOC) == "tail1"
    assert ev("//book/text()[2]", PDOC) is None


def test_union_with_positional_text():
    # probed: /r/text()[2] | //a/@at -> ['1','beta'] (document order:
    # a's attribute precedes the later 'beta' text node)
    assert ev("/r/text()[2] | //a/@at", MIXED) == "1beta"


def test_strip_prefixes_new_constructs():
    assert (
        strip_prefixes("//bk:book[@ns:cat='f' and @bk:price>30]/@ns:id")
        == "//book[@cat='f' and @price>30]/@id"
    )
    assert (
        strip_prefixes("//bk:book[ns:title='T1'][2]/@*")
        == "//book[title='T1'][2]/@*"
    )
    assert (
        strip_prefixes("/store/descendant::bk:book/text()[1]")
        == "/store/descendant::book/text()[1]"
    )
    # relative paths render absolute (identical nodeset, javax-verified)
    assert strip_prefixes("store/shelf/@id") == "/store/shelf/@id"


PATHDOC = ET.fromstring(
    '<store name="s"><shelf id="s1">'
    '<book id="bk1" cat="f"><author><name>Ann</name><age>30</age></author>'
    "<title>T1</title></book>"
    '<book id="bk2" cat="n"><author><name>Bob</name></author>'
    "<title>T2</title></book>"
    '<book id="bk3" cat="f"><title>T3</title></book>'
    "</shelf>"
    '<shelf id="s2"><book id="bk4"><author><name>Ann</name></author></book>'
    "</shelf></store>"
)


def test_path_predicates():
    # relative location paths inside predicates, existential semantics
    # (every expected value javax-probed on this document)
    assert ev("//book[author/name='Ann']/@id", PATHDOC) == "bk1bk4"
    assert ev("//book[author/name]/@id", PATHDOC) == "bk1bk2bk4"
    assert ev("//book[author/age>25]/@id", PATHDOC) == "bk1"
    assert ev("//book[author/name!='Ann']/@id", PATHDOC) == "bk2"
    assert ev("//shelf[book/author/name='Ann']/@id", PATHDOC) == "s1s2"
    assert ev("//store[shelf/book/author/name='Ann']/@name", PATHDOC) == "s"
    # attribute terminal on the path
    assert ev("//shelf[book/@cat='f']/@id", PATHDOC) == "s1"
    assert ev("//book[author/@x]/@id", PATHDOC) is None
    # './/' inside a predicate is OUT of subset: javax full-name-
    # matches it on prefix-carrying docs (namespace-inconsistent with
    # its own step evaluation) — JVM fallback, bug-for-bug
    assert compile_subset("//shelf[.//name='Ann']/@id") is None


def test_parenthesized_booleans():
    assert ev("//book[(@cat='f')]/@id", PATHDOC) == "bk1bk3"
    assert (
        ev("//book[(@cat='f' or @id='bk2') and author]/@id", PATHDOC) == "bk1bk2"
    )
    assert (
        ev("//book[@cat='f' and (author/name='Ann' or title='T3')]/@id", PATHDOC)
        == "bk1bk3"
    )


def test_not_function():
    assert ev("//book[not(@cat='f')]/@id", PATHDOC) == "bk2bk4"
    assert ev("//book[not(author)]/@id", PATHDOC) == "bk3"
    # not(nodeset = v) means "NO reached node equals v"
    assert ev("//book[not(author/name='Ann')]/@id", PATHDOC) == "bk2bk3"
    assert ev("//book[not(@missing)]/@id", PATHDOC) == "bk1bk2bk3bk4"
    assert ev("//book[not(position()=1)]/@id", PATHDOC) == "bk2bk3"
    assert ev("//book[not(not(author))]/@id", PATHDOC) == "bk1bk2bk4"


def test_strip_prefixes_path_predicates():
    assert (
        strip_prefixes("//bk:book[bk:author/bk:name='Ann']/@ns:id")
        == "//book[author/name='Ann']/@id"
    )
    assert (
        strip_prefixes("//b[not(a/@x) and (c or d/e>3)]/text()")
        == "//b[not(a/@x) and (c or d/e>3)]/text()"
    )


def test_self_axis_and_dot_step():
    doc = ET.fromstring(
        '<store name="s"><shelf id="s1"><book id="bk1" cat="f">'
        "<title>T1</title></book><book id=\"bk2\" cat=\"n\">"
        "<title>T2</title></book></shelf></store>"
    )
    # all expected values javax-probed
    assert ev("//book/self::book/@id", doc) == "bk1bk2"
    assert ev("//book/self::*/@id", doc) == "bk1bk2"
    assert ev("//book/self::title/@id", doc) is None
    assert ev("//book/self::book[@cat='f']/@id", doc) == "bk1"
    assert ev("//book/./@id", doc) == "bk1bk2"
    assert ev("/store/./shelf/@id", doc) == "s1"
    assert ev("/./store/@name", doc) == "s"  # '.' matches the document
    assert ev("//shelf/self::shelf[1]/@id", doc) == "s1"
    # invalid/text-node-context forms stay out
    for expr in ("//book/.[@cat='f']", "//store//.", "//a//self::b"):
        assert compile_subset(expr) is None, expr
