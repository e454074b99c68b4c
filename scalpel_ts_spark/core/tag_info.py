"""Close-offset annotation pass.

Reference algorithm: src/Internal/Tag/TagInfo.ts:1-25, 228-237 — a
single pass over the token stream keeping a per-tag-name stack of
unclosed opens; a close pops the most recent open of the same name and
annotates it with ``closeOffset = close_index - open_index``.  Unclosed
opens keep ``closeOffset = None``.  Output order is token order.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from scalpel_ts_spark.core.tokenizer import TagClose, TagOpen, Token


class TagInfo(NamedTuple):
    token: Token
    close_offset: Optional[int]  # only TagOpen ever gets an offset


def annotate_tags(tokens) -> list:
    """Annotate each token with the offset to its closing tag, if any."""
    infos = [None] * len(tokens)
    open_stacks: dict = {}  # tag name -> list of open indices (LIFO)
    for idx, tok in enumerate(tokens):
        kind = type(tok)
        if kind is TagOpen:
            open_stacks.setdefault(tok.name, []).append(idx)
            # placeholder; filled when (if) the close arrives
            infos[idx] = TagInfo(tok, None)
        elif kind is TagClose:
            infos[idx] = TagInfo(tok, None)
            stack = open_stacks.get(tok.name)
            if stack:
                open_idx = stack.pop()
                infos[open_idx] = TagInfo(tokens[open_idx], idx - open_idx)
        else:
            infos[idx] = TagInfo(tok, None)
    return infos
