"""Selectors and the selection engine.

Reference: src/Select.ts.  A Selector is a sequence of Selections
(outermost..innermost); selection walks the tag forest depth-first,
producing one chrooted TagSpec per match tagged with its match index
(``position``).  Three-valued match results drive the walk: Ok emits /
descends, Fail keeps descending, Cull prunes the whole subtree
(reference MatchResult.ts:105-111 — Cull absorbs).

All predicate objects are top-level classes so compiled selectors
pickle cleanly into Spark task closures.
"""

from __future__ import annotations

import re
import sys
from typing import NamedTuple, Optional, Tuple

from scalpel_ts_spark.core.tag_spec import SelectContext, TagSpec
from scalpel_ts_spark.core.tag_forest import TagNode
from scalpel_ts_spark.core.tokenizer import TagOpen, Text

# MatchResult (reference src/Internal/MatchResult.ts)
MATCH_OK = 1
MATCH_FAIL = 0
MATCH_CULL = -1


def combine_match(x: int, y: int) -> int:
    """Cull-absorbing semigroup (MatchResult.ts:105-111)."""
    if x == MATCH_CULL or y == MATCH_CULL:
        return MATCH_CULL
    if x == MATCH_OK and y == MATCH_OK:
        return MATCH_OK
    return MATCH_FAIL


# ---------------------------------------------------------------------------
# attribute predicates (reference Select.ts:288-431)
# ---------------------------------------------------------------------------


class AttributePredicate:
    """Base: callable over the attribute tuple of a TagOpen."""

    def __call__(self, attrs: Tuple[Tuple[str, str], ...]) -> bool:
        raise NotImplementedError


class AttrEquals(AttributePredicate):
    """attribute(key, value): key case-insensitive, value case-sensitive
    (Select.ts:288-308; pinned by test/Select.test.ts:153-176)."""

    def __init__(self, key: str, value: str):
        self.key = key.lower()
        self.value = value

    def __call__(self, attrs):
        return any(k.lower() == self.key and v == self.value for k, v in attrs)


class AnyAttrEquals(AttributePredicate):
    """anyAttribute(value) (Select.ts:320-324)."""

    def __init__(self, value: str):
        self.value = value

    def __call__(self, attrs):
        return any(v == self.value for _, v in attrs)


class AttrRegex(AttributePredicate):
    """attributeRegex(key, re) (Select.ts:334-338)."""

    def __init__(self, key: str, pattern: str):
        self.key = key.lower()
        self.pattern = pattern

    def __call__(self, attrs):
        rx = re.compile(self.pattern)
        return any(
            k.lower() == self.key and rx.search(v) is not None
            for k, v in attrs
        )


class AnyAttrRegex(AttributePredicate):
    """anyAttributeRegex(re) (Select.ts:347-351)."""

    def __init__(self, pattern: str):
        self.pattern = pattern

    def __call__(self, attrs):
        rx = re.compile(self.pattern)
        return any(rx.search(v) is not None for _, v in attrs)


class HasClass(AttributePredicate):
    """hasClass(c): key 'class' exact, space-split membership
    (Select.ts:406-409 — note the key check is case-sensitive here)."""

    def __init__(self, class_name: str):
        self.class_name = class_name

    def __call__(self, attrs):
        return any(
            k == "class" and self.class_name in v.split(" ")
            for k, v in attrs
        )


class NotP(AttributePredicate):
    """notP(pred) (Select.ts:417)."""

    def __init__(self, inner: AttributePredicate):
        self.inner = inner

    def __call__(self, attrs):
        return not self.inner(attrs)


class MatchPred(AttributePredicate):
    """match(f): f(key, value) over any attribute (Select.ts:427-431).

    ``fn`` must be picklable (a top-level function) to run inside Spark.
    """

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, attrs):
        return any(self.fn(k, v) for k, v in attrs)


# public combinator aliases matching the reference API surface
attribute = AttrEquals
any_attribute = AnyAttrEquals
attribute_regex = AttrRegex
any_attribute_regex = AnyAttrRegex
has_class = HasClass
not_p = NotP
match = MatchPred


# ---------------------------------------------------------------------------
# selector AST (reference Select.ts:39-136)
# ---------------------------------------------------------------------------

STRAT_ONE = "one"
STRAT_ANY = "any"
STRAT_TEXT = "text"


class Selection(NamedTuple):
    strategy: str
    tag: Optional[str]  # lowercased; STRAT_ONE only
    predicates: tuple
    depth: Optional[int]


def tag(name: str):
    """Select.tag (Select.ts:243-244)."""
    return (Selection(STRAT_ONE, name.lower(), (), None),)


def with_attributes(name: str, predicates):
    """Select.withAttributes (Select.ts:272-275)."""
    return (Selection(STRAT_ONE, name.lower(), tuple(predicates), None),)


def any_with_attributes(predicates):
    """Select.anyWithAttributes (Select.ts:285-286)."""
    return (Selection(STRAT_ANY, None, tuple(predicates), None),)


# Select.any / Select.text (Select.ts:253, 261)
any_node = (Selection(STRAT_ANY, None, (), None),)
text_node = (Selection(STRAT_TEXT, None, (), None),)


def at_depth(selector, depth: int):
    """Constrain the LAST selection to an exact depth (Select.ts:367-378)."""
    sel = tuple(selector)
    if not sel:
        return sel
    last = sel[-1]
    return sel[:-1] + (Selection(last.strategy, last.tag, last.predicates, depth),)


def nested(parent, child):
    """nested(parent, child): child constrained inside parent
    (Select.ts:394-395 — selector order is outermost..innermost)."""
    return tuple(parent) + tuple(child)


# ---------------------------------------------------------------------------
# selection engine (reference Select.ts:441-704)
# ---------------------------------------------------------------------------


def _check_predicates(token, predicates) -> int:
    """Select.ts:566-601."""
    if not predicates:
        kind = type(token)
        return MATCH_OK if (kind is TagOpen or kind is Text) else MATCH_FAIL
    if type(token) is not TagOpen:
        return MATCH_FAIL
    attrs = token.attributes
    return MATCH_OK if all(p(attrs) for p in predicates) else MATCH_FAIL


def _check_tag(tag_name, predicates, info) -> int:
    """Select.ts:603-620."""
    x = _check_predicates(info.token, predicates)
    tok = info.token
    y = (
        MATCH_OK
        if type(tok) is TagOpen and tok.name.lower() == tag_name
        else MATCH_FAIL
    )
    return combine_match(x, y)


def _count_containing(root_hierarchy, node) -> int:
    """Number of spans in the root hierarchy strictly containing node."""
    cs, ce = node.start, node.end
    count = 0
    stack = list(root_hierarchy)
    while stack:
        t = stack.pop()
        if t.start < cs and ce < t.end:
            count += 1
        stack.extend(t.forest)
    return count


def _check_settings(depth, curr_hierarchy, root_hierarchy) -> int:
    """Depth constraint: Fail below, Cull beyond (Select.ts:629-668)."""
    if depth is None or not curr_hierarchy:
        return MATCH_OK
    current_depth = _count_containing(root_hierarchy, curr_hierarchy[0])
    if current_depth < depth:
        return MATCH_FAIL
    if current_depth > depth:
        return MATCH_CULL
    return MATCH_OK


def _node_matches(selection, info, curr_hierarchy, root_hierarchy) -> int:
    """Select.ts:670-704."""
    settings = _check_settings(selection.depth, curr_hierarchy, root_hierarchy)
    if selection.strategy == STRAT_ONE:
        check = _check_tag(selection.tag, selection.predicates, info)
    elif selection.strategy == STRAT_ANY:
        check = _check_predicates(info.token, selection.predicates)
    else:  # STRAT_TEXT
        check = MATCH_OK if type(info.token) is Text else MATCH_FAIL
    return combine_match(settings, check)


def lift_siblings(acc, start, end, forest):
    """Hoist malformed-HTML spans nested in siblings (Select.ts:467-479)."""
    if not forest:
        return acc
    t, ts = forest[0], forest[1:]
    if start < t.start and t.end < end:
        return [t] + lift_siblings(acc, start, end, ts)
    if end < t.start or t.end < start:
        return lift_siblings(acc, start, end, ts)
    return lift_siblings(t.forest, start, end, lift_siblings(acc, start, end, ts))


def _recenter_tree(node, offset):
    return TagNode(
        node.start - offset,
        node.end - offset,
        [_recenter_tree(c, offset) for c in node.forest],
    )


def _shrink_spec_with(spec: TagSpec, node: TagNode) -> TagSpec:
    """Chroot: slice tags[start..end], rebase spans (Select.ts:448-458)."""
    return TagSpec(
        spec.context,
        [_recenter_tree(node, node.start)],
        spec.tags[node.start : node.end + 1],
    )


def _select_nodes(selectors, curr_hierarchy, spec, root_hierarchy, acc):
    """The DFS (Select.ts:481-564).  Matches are prepended onto ``acc``
    exactly as the reference's cons-based fold does."""
    if not selectors or not curr_hierarchy:
        return acc
    n = selectors[0]
    ns = selectors[1:]
    f = curr_hierarchy[0]
    fs = curr_hierarchy[1:]
    verdict = _node_matches(n, spec.tags[f.start], curr_hierarchy, root_hierarchy)

    if not ns:
        if verdict == MATCH_OK:
            inner = _select_nodes((n,), f.forest, spec, root_hierarchy, acc)
            outer = _select_nodes((n,), fs, spec, root_hierarchy, inner)
            return [_shrink_spec_with(spec, f)] + outer
        if verdict == MATCH_CULL:
            return _select_nodes((n,), fs, spec, root_hierarchy, acc)
        inner = _select_nodes((n,), fs, spec, root_hierarchy, acc)
        return _select_nodes((n,), f.forest, spec, root_hierarchy, inner)

    if verdict == MATCH_OK:
        # malformed-HTML siblings nested inside f's span may be valid
        # children for the remaining selectors (Select.ts:526-535)
        siblings = lift_siblings([], f.start, f.end, list(fs))
        inner = _select_nodes(selectors, fs, spec, root_hierarchy, acc)
        return _select_nodes(
            ns,
            list(f.forest) + siblings,
            spec,
            [f] + siblings,  # new root for depth checks
            inner,
        )
    if verdict == MATCH_CULL:
        return _select_nodes(selectors, fs, spec, root_hierarchy, acc)
    inner = _select_nodes(selectors, fs, spec, root_hierarchy, acc)
    return _select_nodes(selectors, f.forest, spec, root_hierarchy, inner)


def select(selector, spec: TagSpec):
    """Run a selector over a spec → chrooted TagSpecs with positions
    (Select.ts:441-445)."""
    sys.setrecursionlimit(
        max(sys.getrecursionlimit(), 8 * len(spec.tags) + 1000)
    )
    results = _select_nodes(
        tuple(selector), list(spec.hierarchy), spec, list(spec.hierarchy), []
    )
    return [
        TagSpec(SelectContext(p, True), s.hierarchy, s.tags)
        for p, s in enumerate(results)
    ]
