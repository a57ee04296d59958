"""Stopword sets, normalized exactly like the reference builds them.

The reference applies Tools.uniformString to every raw literal
(Stopwords.scala:100,188,260) and unions the three languages (`All`, :262);
the Lucene StopFilter then matches whole uniformized tokens. Normalizing here
reproduces the quirks faithfully: "don't" → "don t" (a stopword WITH a space
that matches the uniformized token of "don't"), "'ll" → " ll" (leading space),
and the literal "keep \tkeeps" → "keep  keeps" (so neither "keep" nor "keeps"
is actually a stopword).
"""
from __future__ import annotations

from ._stopwords_data import ENGLISH_RAW, PORTUGUESE_RAW, SPANISH_RAW
from .textnorm import uniform_string

ENGLISH: frozenset[str] = frozenset(uniform_string(w) for w in ENGLISH_RAW)
SPANISH: frozenset[str] = frozenset(uniform_string(w) for w in SPANISH_RAW)
PORTUGUESE: frozenset[str] = frozenset(uniform_string(w) for w in PORTUGUESE_RAW)

ALL: frozenset[str] = ENGLISH | SPANISH | PORTUGUESE
