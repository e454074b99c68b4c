"""TagSpec — the value every scraper reads.

Reference: src/Internal/Tag/TagSpec.ts:22-56.  A spec bundles the
selection context (position among sibling matches, chroot flag), the
span forest, and the annotated token stream.
"""

from __future__ import annotations

from typing import NamedTuple

from scalpel_ts_spark.core.tag_forest import from_tag_info
from scalpel_ts_spark.core.tag_info import annotate_tags


class SelectContext(NamedTuple):
    position: int
    in_chroot: bool


class TagSpec(NamedTuple):
    context: SelectContext
    hierarchy: list  # list[TagNode]
    tags: list  # list[TagInfo]


def tags_to_spec(tokens) -> TagSpec:
    infos = annotate_tags(tokens)
    hierarchy = from_tag_info(infos)
    return TagSpec(SelectContext(0, False), hierarchy, infos)
