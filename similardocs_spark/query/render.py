"""Result rendering — doc2xml / doc2json shapes of the reference service
(SimDocsSearch.scala:537-596). Field order: document fields first, then the
explain triple (original_ngrams, similar_ngrams, common_ngrams) when present.
"""
from __future__ import annotations

from typing import Any


def doc2json(docs: list[tuple[float, dict[str, list[str]]]]) -> str:
    parts = []
    for score, fields in docs:
        jflds = ",".join(
            f'"{k}":' + (f'"{v[0]}"' if len(v) == 1 else "[" + ",".join(f'"{x}"' for x in v) + "]")
            for k, v in fields.items()
            if v
        )
        parts.append('{"score":' + _fmt(score) + ("," + jflds if jflds else "") + "}")
    return '{"documents":[' + ",".join(parts) + "]}"


def doc2xml(
    docs: list[tuple[float, dict[str, list[str]], tuple[list, list, list] | None]]
) -> str:
    out = [f'<?xml version="1.0" encoding="UTF-8"?><documents total="{len(docs)}">']
    for score, fields, ngrams in docs:
        out.append(f'<document score="{_fmt(score)}">')
        items: list[tuple[str, list[str]]] = list(fields.items())
        if ngrams is not None:
            original, similar, common = ngrams
            items += [
                ("original_ngrams", [", ".join(original)]),
                ("similar_ngrams", [", ".join(similar)]),
                ("common_ngrams", [", ".join(common)]),
            ]
        for tag, values in items:
            for content in values:
                if tag == "decs":
                    content = content.replace("& ", "&amp; ")
                out.append(f"<{tag}>{content}</{tag}>")
        out.append("</document>")
    out.append("</documents>")
    return "".join(out)


def _fmt(score: float) -> str:
    """Render like a JVM float toString-ish (trim trailing zeros)."""
    s = repr(float(f"{score:.7g}"))
    return s


def hits_to_xml(engine, text: str, hits: list[Any], explain: bool = False) -> str:
    """Render engine hits as the service XML."""
    docs = []
    for h in hits:
        fields = {
            "id": [h.conv_id],
            "update_date": [h.update_date],
        }
        ngrams = getattr(h, "ngrams", None) if explain else None
        docs.append((h.score, fields, ngrams))
    return doc2xml(docs)
