"""Pure-Python executable model of the reference semantics (main.cc:33-172).

~20 lines, used as a property oracle in tests: independent of both Spark and
DuckDB, simple enough to verify by eye against SURVEY.md §1.6.
"""

from __future__ import annotations

import re

_NON_LETTER = re.compile(r"[^a-z]")


def normalize(token: str) -> str:
    """lower (main.cc:75) then strip non-[a-z] (main.cc:33-42)."""
    return _NON_LETTER.sub("", token.lower())


def inverted_index(docs: dict[int, str]) -> dict[str, list[int]]:
    """word -> ascending distinct doc ids; empty words dropped."""
    postings: dict[str, set[int]] = {}
    for doc_id, text in docs.items():
        for token in text.split():
            word = normalize(token)
            if word:
                postings.setdefault(word, set()).add(doc_id)
    return {w: sorted(ids) for w, ids in postings.items()}


def letter_file_rows(postings: dict[str, list[int]], letter: str) -> list[tuple[str, list[int]]]:
    """Rows of <letter>.txt in reference order: len DESC, word ASC (main.cc:148-156)."""
    rows = [(w, ids) for w, ids in postings.items() if w.startswith(letter)]
    return sorted(rows, key=lambda r: (-len(r[1]), r[0]))
