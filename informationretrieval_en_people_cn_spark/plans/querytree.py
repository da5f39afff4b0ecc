"""Query language parser — the rebuild of the reference grammar.

Grammar (reference ``/root/reference/searchengine/QueryTree.py:94-137``):
an OR of ANDs, no parentheses, NOT binds to a single token (``NOT x``
is normalized to ``AND NOT x``, QueryTree.py:99).  Leaf kinds
(QueryTree.py:14-42):

* ``keyword``        bare token
* ``prefix``         ``tok*``
* ``phrase``         ``'multi word phrase'``
* ``phrase_prefix``  ``'new ye'*`` (last token is a prefix)
* ``reply_to``       ``ReplyTo:<int>`` (generalized id-lookup)

Validation (reference QueryTree.py:52-57,69-71): an AND group needs at
least one non-negated child; OR children must not be negated.
Queries with no boolean operators are ranked ("space") queries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Leaf:
    kind: str  # keyword | prefix | phrase | phrase_prefix | reply_to
    value: str
    negated: bool = False
    suffix: str = ""  # prefix part of a phrase_prefix


@dataclass
class AndNode:
    children: list[Leaf] = field(default_factory=list)


@dataclass
class OrNode:
    children: list[AndNode] = field(default_factory=list)


@dataclass
class RankedNode:
    children: list[Leaf] = field(default_factory=list)


class QueryError(ValueError):
    pass


# phrases: '...'[*] ; else non-space runs
_TOKEN_RE = re.compile(r"'[^']+'\*?|\S+")


def _classify(tok: str, negated: bool) -> Leaf:
    if tok.startswith("'"):
        if tok.endswith("'*"):
            body = tok[1:-2]
            parts = body.rsplit(" ", 1)
            if len(parts) == 1:
                # "'pref'*" with a single token degenerates to prefix
                return Leaf("prefix", parts[0], negated)
            return Leaf("phrase_prefix", parts[0], negated, suffix=parts[1])
        return Leaf("phrase", tok[1:-1], negated)
    if tok.lower().startswith("replyto:"):
        return Leaf("reply_to", tok.split(":", 1)[1], negated)
    if tok.endswith("*"):
        return Leaf("prefix", tok[:-1], negated)
    return Leaf("keyword", tok, negated)


def parse(query: str) -> OrNode | RankedNode:
    query = query.strip()
    if not query:
        raise QueryError("empty query")
    # NOT x → AND NOT x normalization (reference QueryTree.py:99)
    tokens = _TOKEN_RE.findall(query)
    is_boolean = any(t in ("AND", "OR", "NOT") for t in tokens)

    if not is_boolean:
        return RankedNode([_classify(t, False) for t in tokens])

    or_node = OrNode()
    current = AndNode()
    pending_not = False
    expect_operand = True
    for t in tokens:
        if t == "OR":
            if not current.children:
                raise QueryError("OR with empty left side")
            or_node.children.append(current)
            current = AndNode()
            expect_operand = True
        elif t == "AND":
            if not current.children:
                raise QueryError("AND with empty left side")
            expect_operand = True
        elif t == "NOT":
            pending_not = True
            expect_operand = True
        else:
            if not expect_operand and current.children:
                # two adjacent operands inside a boolean query: treat as
                # implicit AND (keeps the 14-shape set parseable)
                pass
            current.children.append(_classify(t, pending_not))
            pending_not = False
            expect_operand = False
    if pending_not:
        raise QueryError("dangling NOT")
    if current.children:
        or_node.children.append(current)

    # validation (reference QueryTree.py:52-57,69-71)
    for and_node in or_node.children:
        if all(c.negated for c in and_node.children):
            raise QueryError("AND group must have a non-negated child")
    if len(or_node.children) > 1:
        for and_node in or_node.children:
            if len(and_node.children) == 1 and and_node.children[0].negated:
                raise QueryError("OR children must not be negated")
    return or_node
