"""Markdown -> text extraction — pure Column expressions (JVM-side,
inside whole-stage codegen; NO Python in the hot path).

The documentation/README half of a code-adjacent corpus is Markdown;
quality scoring and dedup want the prose, not the syntax. Like the
HTML extractor (operators/html.py), the semantics are EXACTLY STATED
so the closed-form oracles can restate output strings:

- fenced code blocks (``` ... ```) are DROPPED — code is curated by
  different heuristics than prose, the same stance as HTML <script>;
- inline code spans unwrap (`x` -> x);
- images become their alt text (![alt](url) -> alt), links their
  label ([text](url) -> text) — image-before-link order matters, an
  image IS a '!' + link;
- ATX headers lose their '#' prefix (text kept);
- bold then italic unwrap (**x**/__x__ -> x, then *x*/_x_ -> x);
- blockquote '>' prefixes, '-'/'*'/'+' bullets and 'N.' ordered-list
  markers strip at line starts; horizontal-rule lines vanish;
- runs of 3+ newlines collapse to one blank line; the result is
  trimmed.

Deliberately NOT parsed (regex cannot, honestly): nested emphasis,
reference-style links ([t][id]), setext headers, tables, HTML blocks
inside Markdown — documents carrying those keep them as literal text,
never corrupted, and a full CommonMark pass belongs behind
mapInPandas if a corpus ever needs it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) in application order; (?s) spans lines for
# fences, (?m) anchors line starts for the prefix strips
_PASSES = (
    (r"(?s)```.*?```", ""),                      # fenced code: dropped
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),           # image -> alt
    (r"\[([^\]]+)\]\([^)]*\)", "$1"),            # link -> label
    (r"(?m)^#{1,6} +", ""),                      # ATX header marker
    (r"\*\*([^*]+)\*\*", "$1"),                  # bold (asterisk)
    (r"__([^_]+)__", "$1"),                      # bold (underscore)
    (r"\*([^*\n]+)\*", "$1"),                    # italic (asterisk)
    (r"(?<![A-Za-z0-9_])_([^_\n]+)_(?![A-Za-z0-9_])", "$1"),  # italic
    (r"`([^`\n]+)`", "$1"),                      # inline code
    (r"(?m)^> ?", ""),                           # blockquote
    (r"(?m)^[-*+] +", ""),                       # bullet
    (r"(?m)^\d+\. +", ""),                       # ordered-list marker
    (r"(?m)^(-{3,}|\*{3,})$", ""),               # horizontal rule
    (r"\n{3,}", "\n\n"),                         # collapse blank runs
)


def markdown_to_text(md: Column) -> Column:
    out = md
    for pattern, repl in _PASSES:
        out = F.regexp_replace(out, pattern, repl)
    return F.trim(out)
