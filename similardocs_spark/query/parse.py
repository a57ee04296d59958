"""Query-syntax sanitization — the QueryParser-facing edge of the engine.

The reference feeds raw user text through Lucene's QueryParser after
stripping parentheses (SimDocsSearch.scala:395-403, paren-strip at :402).
This engine scores a pure SHOULD bag-of-words plus MUST-side categorical
filters (db/instance) and a date range — exactly the query shapes the
reference service itself issues. `sanitize_query` maps Lucene-syntax user
input onto that model instead of letting syntax characters silently leak
into the analyzer as word characters:

- parentheses are stripped (reference :402)
- Lucene boolean markers (AND / OR / NOT / && / || / + / - prefixes) are
  dropped: the engine's scoring model is SHOULD-only, which is also what the
  reference's own similar-docs queries produce
- `field:value` terms: fields the index actually filters on (db, instance)
  become MUST filters; any other field prefix is dropped whole — in the
  reference, a term query on a nonexistent field matches nothing, so
  dropping is the semantics-preserving translation
- quoted "phrases" keep their words as bag-of-words — DOCUMENTED DIVERGENCE:
  this index stores no positions (the reference's Lucene field does), so
  true phrase matching is out of scope; the reference's own query flow never
  issues phrases
- escaped characters `\\x` are unescaped to x

Result: (clean_text, sources, instances) ready for SearchEngine.search
(pass parse_syntax=True there to apply this automatically).
"""
from __future__ import annotations

import re

FILTER_FIELDS = {"db", "instance"}

_BOOL_TOKEN = re.compile(r"^(AND|OR|NOT|&&|\|\|)$")
_FIELD_TERM = re.compile(r"^(?P<field>[A-Za-z_][A-Za-z0-9_]*):(?P<value>.*)$")


def sanitize_query(text: str) -> tuple[str, set[str] | None, set[str] | None]:
    """→ (bag_of_words_text, sources or None, instances or None)."""
    # unescape \x, strip parens and brackets/braces (range/group syntax)
    text = re.sub(r"\\(.)", r"\1", text or "")
    text = re.sub(r"[()\[\]{}^~*?]", " ", text)
    words: list[str] = []
    sources: set[str] = set()
    instances: set[str] = set()
    for raw in text.split():
        if _BOOL_TOKEN.match(raw):
            continue
        tok = raw.lstrip("+-")
        if not tok:
            continue
        m = _FIELD_TERM.match(tok)
        if m:
            field, value = m.group("field").lower(), m.group("value").strip('"')
            if not value:
                continue
            if field == "db":
                sources.add(value)
            elif field == "instance":
                instances.add(value)
            # unknown field → drop whole term (matches nothing in Lucene)
            continue
        words.append(tok.strip('"'))
    return (
        " ".join(words),
        sources or None,
        instances or None,
    )
