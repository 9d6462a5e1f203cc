"""Config-keyed extractor / tokenizer registries (SURVEY §2.9).

The reference selects extractor classes dynamically by name
(``run_pipeline.py:133-159`` imports ``{name}_extractor`` modules and
instantiates ``base_extractor.py:20-34`` subclasses from a CLI string).
The graft's analog: named entries in two registries, selected by the
``DedupConfig.extractor`` / ``DedupConfig.tokenizer`` strings — swapping
the extraction or tokenization scheme is a config edit, not a code edit.

Registered extractors (``html bytes -> text``):

- ``regex`` (default): tag-strip + whitespace-normalize
  (``extract.extract_text_py``) — the oracle-checked scheme; the synthetic
  corpus generator uses it, so round-trip extraction is byte-identical.
- ``stdlib_html``: a REAL parser on the stdlib ``html.parser.HTMLParser``
  (entity decoding, comment/CDATA handling, script/style suppression) —
  deterministic and dependency-free, demonstrating that a registered
  non-default extractor changes VALUES, not plumbing.
- ``trafilatura``: registered only when the library is importable (it is
  not in this container) — the optional-dependency path the reference's
  dynamic import covers.

Registered tokenizers (``text -> list[str]``):

- ``whitespace`` (default): lowercase + Java-``\\s`` split
  (``tokenize.tokenize_py``) — the only scheme with DuckDB/Catalyst twins,
  hence the only oracle-checked one.
- ``alnum``: lowercase alphanumeric runs (``[a-z0-9]+``) — strips
  punctuation before shingling, a common web-dedup normalization.

A non-default tokenizer applies to the SIGNATURE/DEDUP paths (shingles,
SimHash, MinHash, anchors); the Catalyst text-stats views keep the
whitespace scheme they are oracle-checked under — same contract as the
``hash_scheme='tokmix'`` dial (different values, pytest-gated recall).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from html.parser import HTMLParser

Extractor = Callable[[bytes | None], str]
Tokenizer = Callable[[str], list[str]]

_EXTRACTORS: dict[str, Extractor] = {}
_TOKENIZERS: dict[str, Tokenizer] = {}


def register_extractor(name: str) -> Callable[[Extractor], Extractor]:
    def deco(fn: Extractor) -> Extractor:
        _EXTRACTORS[name] = fn
        return fn
    return deco


def register_tokenizer(name: str) -> Callable[[Tokenizer], Tokenizer]:
    def deco(fn: Tokenizer) -> Tokenizer:
        _TOKENIZERS[name] = fn
        return fn
    return deco


def get_extractor(name: str) -> Extractor:
    try:
        return _EXTRACTORS[name]
    except KeyError:
        raise KeyError(
            f"unknown extractor {name!r}; registered: "
            f"{sorted(_EXTRACTORS)}") from None


def get_tokenizer(name: str) -> Tokenizer:
    try:
        return _TOKENIZERS[name]
    except KeyError:
        raise KeyError(
            f"unknown tokenizer {name!r}; registered: "
            f"{sorted(_TOKENIZERS)}") from None


def available_extractors() -> list[str]:
    return sorted(_EXTRACTORS)


def available_tokenizers() -> list[str]:
    return sorted(_TOKENIZERS)


# --- built-in extractors ----------------------------------------------------

def _register_builtin_extractors() -> None:
    from webdedup.functions.extract import extract_text_py

    _EXTRACTORS["regex"] = extract_text_py
    _EXTRACTORS["stdlib_html"] = extract_text_stdlib

    try:  # optional real-parser dependency (absent in this container)
        import trafilatura  # noqa: F401

        def _trafilatura(html: bytes | None) -> str:
            if not html:
                return ""
            out = trafilatura.extract(
                html.decode("utf-8", errors="replace"))
            return _WS_RE.sub(" ", out or "").strip()

        _EXTRACTORS["trafilatura"] = _trafilatura
    except ImportError:
        pass


_WS_RE = re.compile(r"\s+")


class _TextHTMLParser(HTMLParser):
    """Collects text nodes, suppressing script/style subtrees.

    ``convert_charrefs=True`` (the default) decodes entities —
    ``&amp;`` -> ``&`` — which the regex extractor deliberately does not;
    the two extractors therefore produce different VALUES for entity-
    bearing html, which the registry dispatch test asserts.
    """

    _SKIP = {"script", "style"}

    def __init__(self) -> None:
        super().__init__()
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.parts.append(data)


def extract_text_stdlib(html: bytes | None) -> str:
    if not html:
        return ""
    p = _TextHTMLParser()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return _WS_RE.sub(" ", " ".join(p.parts)).strip()


# --- built-in tokenizers ----------------------------------------------------

_ALNUM_RE = re.compile(r"[a-z0-9]+")


def _register_builtin_tokenizers() -> None:
    from webdedup.functions.tokenize import tokenize_py

    _TOKENIZERS["whitespace"] = tokenize_py
    _TOKENIZERS["alnum"] = lambda text: _ALNUM_RE.findall(text.lower())


_register_builtin_extractors()
_register_builtin_tokenizers()
