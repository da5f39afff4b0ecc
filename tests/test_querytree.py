import pytest

from informationretrieval_en_people_cn_spark.plans import querytree as qt


def test_ranked_query():
    n = qt.parse("military conflict")
    assert isinstance(n, qt.RankedNode)
    assert [c.kind for c in n.children] == ["keyword", "keyword"]


def test_phrase():
    n = qt.parse("'german chancellor'")
    assert n.children[0].kind == "phrase"
    assert n.children[0].value == "german chancellor"


def test_phrase_prefix():
    n = qt.parse("'new ye'*")
    leaf = n.children[0]
    assert leaf.kind == "phrase_prefix"
    assert leaf.value == "new" and leaf.suffix == "ye"


def test_prefix():
    n = qt.parse("isra*")
    assert n.children[0].kind == "prefix" and n.children[0].value == "isra"


def test_reply_to():
    n = qt.parse("ReplyTo:107701851")
    assert n.children[0].kind == "reply_to" and n.children[0].value == "107701851"


def test_bool_and_not():
    n = qt.parse("jared NOT kushner")
    # NOT x normalizes to AND NOT x (reference QueryTree.py:99)
    assert isinstance(n, qt.OrNode)
    (and_node,) = n.children
    assert [(c.value, c.negated) for c in and_node.children] == [
        ("jared", False),
        ("kushner", True),
    ]


def test_or_of_ands():
    n = qt.parse("eu OR 'european union'")
    assert isinstance(n, qt.OrNode) and len(n.children) == 2
    assert n.children[1].children[0].kind == "phrase"


def test_four_way_and():
    n = qt.parse("trump AND putin AND merkel AND xi")
    assert len(n.children[0].children) == 4


def test_combined_replyto_phrase():
    n = qt.parse("ReplyTo:107701851 AND 'silicon valley'")
    kinds = [c.kind for c in n.children[0].children]
    assert kinds == ["reply_to", "phrase"]


def test_validation_all_negated():
    with pytest.raises(qt.QueryError):
        qt.parse("NOT x AND NOT y")


def test_validation_or_negated_child():
    with pytest.raises(qt.QueryError):
        qt.parse("a OR NOT b")


def test_empty_query():
    with pytest.raises(qt.QueryError):
        qt.parse("   ")
