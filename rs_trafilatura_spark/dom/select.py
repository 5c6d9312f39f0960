"""Tiny CSS-subset selector engine over the Element tree.

Supports exactly the selector forms the extraction rules need (the reference
drives dom_query with simple selectors — tag, #id, .class, [attr], [attr=v],
[attr*=v], [attr~=v], [attr^=v], compounds, comma unions, and descendant
chains; see e.g. patterns.rs:145-160, selector/content.rs:519-543).
Selectors are parsed once and cached.
"""

from __future__ import annotations

import re
from functools import lru_cache
from operator import itemgetter
from typing import Callable, Iterator, Optional

from .element import Element

# doc-order merge key for tag-index buckets (ordinals are unique)
_ordinal_key = itemgetter(0)

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?
    (?P<parts>(?:\#[\w-]+|\.[\w-]+|\[[^\]]+\])*)
    """,
    re.VERBOSE,
)
_PART_RE = re.compile(r"\#([\w-]+)|\.([\w-]+)|\[([^\]]+)\]")
_ATTR_RE = re.compile(r"^([\w:-]+)\s*(?:([*~^$|]?=)\s*(.*))?$")


def _parse_attr(body: str) -> Callable[[Element], bool]:
    m = _ATTR_RE.match(body.strip())
    if not m:
        return lambda el: False
    name, op, val = m.group(1), m.group(2), m.group(3)
    if val is not None:
        val = val.strip()
        if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
            val = val[1:-1]
    if op is None:
        return lambda el, n=name: n in el.attrib
    if op == "=":
        return lambda el, n=name, v=val: el.attrib.get(n) == v
    if op == "*=":
        return lambda el, n=name, v=val: v in el.attrib.get(n, "")
    if op == "~=":
        return lambda el, n=name, v=val: v in el.attrib.get(n, "").split()
    if op == "^=":
        return lambda el, n=name, v=val: el.attrib.get(n, "").startswith(v)
    if op == "$=":
        return lambda el, n=name, v=val: el.attrib.get(n, "").endswith(v)
    return lambda el: False


class _Compound:
    __slots__ = ("tag", "preds", "needs_cls_or_id", "needs_attr")

    def __init__(self, token: str):
        m = _SIMPLE_RE.match(token)
        self.tag: Optional[str] = None
        self.preds: list[Callable[[Element], bool]] = []
        # True when no element LACKING both class and id can match: lets
        # iter_select scan the (much shorter) classed_desc_list snapshot
        self.needs_cls_or_id = False
        # weaker gate: True when no ATTRIBUTE-LESS element can match —
        # presence/[attr=v]/non-empty-value substring forms all require
        # the attribute to exist, so iter_select can scan the
        # attributed_desc_list snapshot (class/id forms imply this too)
        self.needs_attr = False
        if not m:
            return
        tag = m.group("tag")
        if tag and tag != "*":
            self.tag = tag.lower()
        for pm in _PART_RE.finditer(m.group("parts") or ""):
            if pm.group(1):
                ident = pm.group(1)
                self.preds.append(lambda el, i=ident: el.attrib.get("id") == i)
                self.needs_cls_or_id = True
                self.needs_attr = True
            elif pm.group(2):
                cls = pm.group(2)
                # substring pre-filter: token membership implies substring,
                # so the (allocating) split only runs on candidate hits
                self.preds.append(
                    lambda el, c=cls: (
                        (a := el.attrib.get("class")) is not None
                        and c in a and c in a.split()
                    )
                )
                self.needs_cls_or_id = True
                self.needs_attr = True
            elif pm.group(3):
                body = pm.group(3).strip()
                attr_m = _ATTR_RE.match(body)
                if attr_m and attr_m.group(1) in ("class", "id"):
                    # presence/[class*=..]/[id^=..] etc. all require the
                    # attribute to exist, except never-matching bodies
                    # (which _parse_attr maps to const-False — also safe
                    # to restrict to any subset)
                    self.needs_cls_or_id = True
                if attr_m is not None:
                    op, val = attr_m.group(2), attr_m.group(3)
                    if val is not None:
                        val = val.strip()
                        if (len(val) >= 2 and val[0] in "\"'"
                                and val[-1] == val[0]):
                            val = val[1:-1]
                    # presence always requires the attr; comparison forms
                    # require it unless a degenerate empty value could
                    # match an absent attr via the get(n, "") default
                    if op is None or op == "=" or (val or "") != "":
                        self.needs_attr = True
                self.preds.append(_parse_attr(body))

    def matches(self, el: Element) -> bool:
        if self.tag is not None and el.tag != self.tag:
            return False
        for p in self.preds:  # plain loop: all(genexpr) costs a frame/elem
            if not p(el):
                return False
        return True


class _Chain:
    """Descendant chain: 'a b c' (child combinator '>' also supported)."""

    __slots__ = ("steps",)

    def __init__(self, text: str):
        # normalize "a > b" -> tokens with combinator markers
        toks = text.replace(">", " > ").split()
        self.steps: list[tuple[str, _Compound]] = []  # (combinator, compound)
        comb = " "
        for t in toks:
            if t == ">":
                comb = ">"
                continue
            self.steps.append((comb, _Compound(t)))
            comb = " "

    def matches(self, el: Element) -> bool:
        # match last step against el, walk ancestors for earlier steps
        if not self.steps:
            return False
        if not self.steps[-1][1].matches(el):
            return False
        cur = el
        for i in range(len(self.steps) - 2, -1, -1):
            comb_right = self.steps[i + 1][0]
            comp = self.steps[i][1]
            if comb_right == ">":
                cur = cur.parent
                if cur is None or not comp.matches(cur):
                    return False
            else:
                anc = cur.parent
                found = None
                while anc is not None:
                    if comp.matches(anc):
                        found = anc
                        break
                    anc = anc.parent
                if found is None:
                    return False
                cur = found
        return True


@lru_cache(maxsize=4096)
def _compile(selector: str) -> tuple:
    return tuple(_Chain(alt.strip()) for alt in selector.split(",") if alt.strip())


@lru_cache(maxsize=4096)
def _tag_only(selector: str):
    """Fast path: selectors like 'p' / 'td, th' compile to a tag frozenset."""
    tags = []
    for chain in _compile(selector):
        if len(chain.steps) != 1:
            return None
        comp = chain.steps[0][1]
        if comp.preds or comp.tag is None:
            return None
        tags.append(comp.tag)
    return frozenset(tags) if tags else None


@lru_cache(maxsize=4096)
def _last_tag_dispatch(selector: str):
    """For comma unions where every chain's last step names a tag, build
    {tag: [chains]} — None when any chain is tag-open (must scan all)."""
    by_tag: dict = {}
    for ch in _compile(selector):
        t = ch.steps[-1][1].tag if ch.steps else None
        if t is None:
            return None
        by_tag.setdefault(t, []).append(ch)
    return by_tag


@lru_cache(maxsize=4096)
def _single_step_compounds(selector: str):
    """[(tag, preds, needs_cls_or_id, needs_attr)] when every chain is
    one compound; else None."""
    out = []
    for ch in _compile(selector):
        if len(ch.steps) != 1:
            return None
        comp = ch.steps[0][1]
        out.append((comp.tag, tuple(comp.preds), comp.needs_cls_or_id,
                    comp.needs_attr))
    return tuple(out) if out else None


def iter_select(root: Element, selector: str) -> Iterator[Element]:
    """Yield descendants of ``root`` (excluding root itself) matching the
    selector, in document order.

    SNAPSHOT SEMANTICS: the walk runs over a ``desc_list()`` snapshot
    built at first resumption, so elements detached/pruned by the caller
    DURING iteration are still yielded (a lazy walk would skip subtrees
    detached before reaching them).  Callers that prune while consuming
    matches must materialize first (``select()`` does) — audited: every
    kernel pruning site goes through ``select()``; the one lazy consumer
    (find_main_content_node's profile probe) only reads.  Early-exit
    consumers pay the O(subtree) snapshot build once per call — measured
    cheaper than per-element generator resumption on the cascade's
    workloads (see desc_list)."""
    tags = _tag_only(selector)
    if tags is not None:
        idx = root.tag_index()
        if idx is not None:
            if len(tags) == 1:
                bucket = idx.get(next(iter(tags)))
                if bucket is not None:
                    yield from bucket[0]
                return
            pairs: list = []
            for t in tags:
                bucket = idx.get(t)
                if bucket is not None:
                    pairs.extend(zip(bucket[1], bucket[0]))
            # ordinals are unique, so tuple sort never compares Elements
            pairs.sort()
            for _, el in pairs:
                yield el
            return
        for el in root.desc_list():
            if el.tag in tags:
                yield el
        return
    chains = _compile(selector)
    # single simple compound (the dominant shape in the cascade's rule
    # tables): inline the tag/pred checks — the generic path's two method
    # hops + all(generator) per element are ~40% of kernel select time
    if len(chains) == 1 and len(chains[0].steps) == 1:
        comp = chains[0].steps[0][1]
        tag, preds = comp.tag, comp.preds
        if tag is not None:
            # tag-anchored compound: visit only that tag's elements when
            # the index is warm (strictly a subset of any full snapshot)
            idx = root.tag_index()
            if idx is not None:
                bucket = idx.get(tag)
                if bucket is None:
                    return
                for el in bucket[0]:
                    for p in preds:
                        if not p(el):
                            break
                    else:
                        yield el
                return
        # class/id-gated compounds can only match elements that HAVE a
        # class or id: scan that (much shorter) per-generation snapshot;
        # other attribute-requiring compounds scan the attributed subset
        scan = (root.classed_desc_list() if comp.needs_cls_or_id
                else root.attributed_desc_list() if comp.needs_attr
                else root.desc_list())
        if len(preds) == 1:
            pred = preds[0]
            for el in scan:
                if (tag is None or el.tag == tag) and pred(el):
                    yield el
            return
        for el in scan:
            if tag is None or el.tag == tag:
                for p in preds:
                    if not p(el):
                        break
                else:
                    yield el
        return
    # multi-chain path: dispatch on each chain's LAST-step tag so most
    # elements cost one dict probe instead of len(chains) matches() calls
    by_tag = _last_tag_dispatch(selector)
    if by_tag is not None:
        idx = root.tag_index()
        if idx is not None:
            pairs: list = []
            for t, lst in by_tag.items():
                bucket = idx.get(t)
                if bucket is not None:
                    els, ords = bucket
                    for i, el in zip(ords, els):
                        pairs.append((i, el, lst))
            pairs.sort(key=_ordinal_key)
            for _, el, lst in pairs:
                for ch in lst:
                    if ch.matches(el):
                        yield el
                        break
            return
        for el in root.desc_list():
            lst = by_tag.get(el.tag)
            if lst is not None:
                for ch in lst:
                    if ch.matches(el):
                        yield el
                        break
        return
    # tagless unions of simple compounds (the discard/content rule tables'
    # dominant shape, e.g. "[class*='a'], [id*='b']"): inline the
    # tag/pred checks, skipping two method hops per chain per element
    comps = _single_step_compounds(selector)
    if comps is not None:
        # the union can only skip class/id-less elements when EVERY
        # branch is class/id-gated (a branch is an OR alternative);
        # likewise attribute-less elements when every branch needs an attr
        scan = (root.classed_desc_list()
                if all(c[2] for c in comps)
                else root.attributed_desc_list()
                if all(c[2] or c[3] for c in comps)
                else root.desc_list())
        for el in scan:
            tag = el.tag
            for ctag, preds, _needs, _na in comps:
                if ctag is not None and tag != ctag:
                    continue
                for p in preds:
                    if not p(el):
                        break
                else:
                    yield el
                    break
        return
    for el in root.desc_list():
        for ch in chains:
            if ch.matches(el):
                yield el
                break


def select(root: Element, selector: str) -> list[Element]:
    return list(iter_select(root, selector))


def select_first(root: Element, selector: str) -> Optional[Element]:
    for el in iter_select(root, selector):
        return el
    return None


def matches(el: Element, selector: str) -> bool:
    return any(ch.matches(el) for ch in _compile(selector))
