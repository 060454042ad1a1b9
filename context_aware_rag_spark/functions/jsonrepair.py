"""Lenient JSON repair for LLM output (C10).

The reference depends on the ``json-repair`` pip package
(pyproject.toml:48) to survive the malformed JSON that LLM extractors
emit. This is an original, bounded re-implementation of the same
contract for the common failure modes:

1. markdown code fences / leading-trailing prose around the object;
2. Python constants (True/False/None/NaN/Infinity);
3. single-quoted strings and keys;
4. unquoted object keys;
5. trailing commas before ``}`` / ``]``;
6. truncated output (unterminated strings, unbalanced brackets).

``repair_json`` returns the parsed object (dict/list/...) or None when
no plausible JSON exists; ``canonical_json`` returns a normalized
string form (sorted keys) for hashable downstream comparison.
Everything is pure Python — callers batch it through an Arrow pandas
UDF (``parse_json_lenient_udf``), never per-row Python on the JVM path.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterator, Optional

import pandas as pd

_FENCE = re.compile(r"```(?:json)?\s*(.*?)\s*(?:```|$)", re.DOTALL)
# an unquoted key: start-of-object/comma, identifier, colon
_UNQUOTED_KEY = re.compile(r'([{,]\s*)([A-Za-z_][A-Za-z0-9_\-]*)(\s*:)')
_TRAILING_COMMA = re.compile(r",(\s*[}\]])")
_PY_CONSTS = [
    (re.compile(r"\bTrue\b"), "true"),
    (re.compile(r"\bFalse\b"), "false"),
    (re.compile(r"\bNone\b"), "null"),
    (re.compile(r"\bNaN\b"), "null"),
    # (?<!\w) instead of \b before the sign: there is no word boundary
    # between ':'/whitespace and '-', so \b-?Infinity can never consume
    # the minus and '-Infinity' would become '-null' (unparseable)
    (re.compile(r"(?<!\w)-?Infinity\b"), "null"),
]


def _extract_payload(s: str) -> str:
    """Strip fences/prose: keep the first balanced '{...}'/'[...]' span
    (leading AND trailing prose removed; a never-closing payload —
    truncation — keeps everything after the opener for _balance)."""
    m = _FENCE.search(s)
    if m and ("{" in m.group(1) or "[" in m.group(1)):
        s = m.group(1)
    starts = [i for i in (s.find("{"), s.find("[")) if i >= 0]
    if not starts:
        return s
    s = s[min(starts):]
    # string-aware scan for the matching top-level closer (tracks which
    # quote char opened the span — an apostrophe inside "it's" must not
    # close a double-quoted string)
    depth, quote, i, n = 0, None, 0, len(s)
    while i < n:
        c = s[i]
        if quote is not None:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
        elif c in "{[":
            depth += 1
        elif c in "}]":
            depth -= 1
            if depth == 0:
                return s[: i + 1]
        i += 1
    return s


def _sub_outside_strings(s: str, fn) -> str:
    """Apply ``fn`` (str -> str) only to the segments OUTSIDE
    double-quoted string spans — structural rewrites (constants, key
    quoting, trailing commas) must never touch string content."""
    out, i, n = [], 0, len(s)
    seg_start = 0
    while i < n:
        if s[i] == '"':
            out.append(fn(s[seg_start:i]))
            j = i + 1
            while j < n and s[j] != '"':
                j += 2 if s[j] == "\\" else 1
            out.append(s[i : min(j + 1, n)])
            i = seg_start = min(j + 1, n)
        else:
            i += 1
    out.append(fn(s[seg_start:]))
    return "".join(out)


def _single_to_double_quotes(s: str) -> str:
    """Convert '-quoted strings to "-quoted, preserving "-quoted spans."""
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == '"':  # copy a double-quoted span verbatim
            j = i + 1
            while j < n and s[j] != '"':
                j += 2 if s[j] == "\\" else 1
            out.append(s[i : min(j + 1, n)])
            i = min(j + 1, n)
        elif c == "'":  # rewrite a single-quoted span
            j = i + 1
            buf = []
            while j < n and s[j] != "'":
                if s[j] == "\\" and j + 1 < n:
                    # \' is legal in single-quoted strings but NOT in
                    # JSON — emit the bare apostrophe
                    buf.append("'" if s[j + 1] == "'" else s[j : j + 2])
                    j += 2
                    continue
                buf.append('\\"' if s[j] == '"' else s[j])
                j += 1
            out.append('"' + "".join(buf) + '"')
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _balance(s: str) -> str:
    """Close unterminated strings and unbalanced brackets (truncation)."""
    stack = []
    in_str = False
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in "{[":
            stack.append("}" if c == "{" else "]")
        elif c in "}]":
            if stack and stack[-1] == c:
                stack.pop()
        i += 1
    if in_str:
        s += '"'
    # a truncated bare literal ([tru / :fals / ,nul) can't be completed
    m = re.search(r"([,\[:{]\s*)([A-Za-z]+)$", s)
    if m and m.group(2) not in ("true", "false", "null"):
        s = s[: m.end(1)]
    # a truncated value like {"a": 12, "b":  needs the dangling tail cut
    s = re.sub(r"[,:]\s*$", "", s)
    # ...and then the valueless key itself: {"a": 12, "b"  /  {"b"
    s = re.sub(r',\s*"(?:[^"\\]|\\.)*"\s*$', "", s)
    s = re.sub(r'\{\s*"(?:[^"\\]|\\.)*"\s*$', "{", s)
    return s + "".join(reversed(stack))


def repair_json(s: Optional[str]) -> Optional[Any]:
    """Parse ``s`` leniently; return the object or None."""
    if s is None:
        return None
    s = s.strip()
    if not s:
        return None
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        pass
    s = _extract_payload(s)
    def _structural(seg: str) -> str:
        # runs only OUTSIDE string spans: constants, key quoting,
        # trailing commas must never rewrite string content
        for rx, repl in _PY_CONSTS:
            seg = rx.sub(repl, seg)
        seg = _UNQUOTED_KEY.sub(r'\1"\2"\3', seg)
        return _TRAILING_COMMA.sub(r"\1", seg)

    for attempt in range(2):
        t = _single_to_double_quotes(s)
        t = _sub_outside_strings(t, _structural)
        if attempt == 1:
            t = _balance(t)
            t = _sub_outside_strings(t, lambda seg: _TRAILING_COMMA.sub(r"\1", seg))
        try:
            return json.loads(t)
        except (json.JSONDecodeError, ValueError):
            continue
    return None


def canonical_json(s: Optional[str]) -> Optional[str]:
    """Repaired, normalized (sorted-keys, compact) JSON string or None."""
    obj = repair_json(s)
    if obj is None:
        return None
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def parse_json_lenient_udf():
    """Arrow-batched pandas UDF: malformed JSON column -> canonical JSON
    string (or null). Compose with ``from_json``/``get_json_object`` for
    typed access — repair happens once, typed extraction stays JVM-side.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _repair(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(canonical_json)

    return _repair
