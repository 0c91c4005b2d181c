"""Trino -> Spark SQL dialect shims (SURVEY.md §7.1 M1).

The reference speaks Trino SQL (``/root/reference/compose/seed.sh``,
``README.md:52-65``). Spark parses most of it already; this module
rewrites the handful of constructs that differ so the reference's
statements run verbatim through :meth:`Engine.trino_sql`:

- catalog-qualified names: ``iceberg.demo.t`` -> ``demo.t`` (the
  configured Spark catalog is implicit; a three-part name would need
  an actual second catalog)
- ``CREATE SCHEMA ... WITH (location = '...')`` (Trino property
  syntax, seed.sh:65) -> ``LOCATION '...'`` / dropped for the
  default warehouse
- ``CAST(x AS varchar)`` and ``varchar`` column types without
  length (seed.sh:72-115) -> ``STRING``
- ``FROM UNNEST(sequence(a, b)) AS t(n)`` (lateral array unnest,
  seed.sh:75) -> ``FROM (SELECT explode(...) AS n) t``
- renamed scalar functions a Trino user types daily: ``strpos`` ->
  ``instr``, ``approx_distinct`` -> ``approx_count_distinct``,
  ``json_extract_scalar`` -> ``get_json_object``,
  ``format_datetime`` -> ``date_format``, ``arbitrary`` ->
  ``any_value``, and ``date_diff('unit', a, b)`` ->
  ``timestampdiff(UNIT, a, b)`` (the unit literal becomes a Spark
  unit identifier)

Purely textual, statement-local rewrites — no SQL parse, but they
are LITERAL-AWARE: one tokenizing pass scans BOTH quote kinds
together (single-quoted string literals with ``''`` escapes,
double-quoted identifiers with ``""`` escapes), so a quote of one
kind embedded in a span of the other can never desync the scan; the
regex rewrites touch only the non-literal segments, and a payload
string containing ``varchar`` or ``iceberg.x`` passes through
byte-identical. Constructs outside the reference surface pass
through untouched and get Spark's own error messages.
"""

from __future__ import annotations

import re

__all__ = ["trino_to_spark", "trino_type"]

#: a single-quoted SQL string literal, with '' escapes
_LITERAL = re.compile(r"'(?:[^']|'')*'")

#: one tokenizing alternation over BOTH quote kinds — whichever quote
#: opens first wins, so a single quote INSIDE a double-quoted
#: identifier ("it's", legal in Trino) cannot desync the literal scan,
#: and a double quote inside a string literal stays a literal byte
_QUOTED = re.compile(r"'(?:[^']|'')*'" + r'|"(?:[^"]|"")*"')


def _outside_literals(sql: str, fn) -> str:
    """Apply ``fn`` to the segments of ``sql`` outside string
    literals, leaving the literals byte-identical."""
    parts: list[str] = []
    last = 0
    for m in _LITERAL.finditer(sql):
        parts.append(fn(sql[last: m.start()]))
        parts.append(m.group(0))
        last = m.end()
    parts.append(fn(sql[last:]))
    return "".join(parts)


def trino_to_spark(
    sql: str,
    strip_catalogs: tuple[str, ...] = ("iceberg",),
    keep_schema_location: bool = False,
) -> str:
    """Rewrite one Trino statement into Spark SQL (see module doc)."""

    def rewrite(seg: str) -> str:
        for cat in strip_catalogs:
            # both bare and (formerly double-quoted) backticked
            # spellings of the catalog qualifier
            seg = re.sub(
                rf"(?:\b{re.escape(cat)}\.(?=\w)"
                rf"|`{re.escape(cat)}`\.(?=[\w`]))",
                "", seg, flags=re.IGNORECASE,
            )
        # CAST(x AS varchar) — Spark requires a length on VARCHAR
        seg = re.sub(r"\bAS\s+varchar\s*\)", "AS STRING)", seg,
                     flags=re.IGNORECASE)
        # bare `varchar` column type in DDL
        seg = re.sub(r"\bvarchar\b(?!\s*\()", "STRING", seg,
                     flags=re.IGNORECASE)
        # Trino scalar functions with a different Spark name, same
        # signature and semantics (1-based/0-miss strpos, HLL
        # approx distinct, JSONPath scalar extraction, Joda-style
        # pattern formatting, any-value pick)
        for trino, spark in (
            ("strpos", "instr"),
            ("approx_distinct", "approx_count_distinct"),
            ("json_extract_scalar", "get_json_object"),
            ("format_datetime", "date_format"),
            ("arbitrary", "any_value"),
        ):
            seg = re.sub(rf"\b{trino}\s*\(", f"{spark}(", seg,
                         flags=re.IGNORECASE)
        return seg

    # ONE tokenizing pass over both quote kinds: single-quoted string
    # literals pass through byte-identical; Trino double-quoted
    # identifiers ("" = escaped quote) become Spark backticks and stay
    # part of the rewritable code stream. SQLAlchemy's trino dialect
    # quotes EVERY identifier it emits, so the conversion is
    # load-bearing for driver-generated SQL; scanning both quote
    # kinds together means a single quote inside an identifier
    # ("it's") can never desync the literal scan. Limitation (as
    # before): an identifier that is itself a rewritten keyword (a
    # column literally named "varchar") is still touched by the later
    # keyword rules — outside the reference surface.
    spans: list[tuple[bool, str]] = []  # (is_string_literal, text)
    last = 0
    for m in _QUOTED.finditer(sql):
        spans.append((False, sql[last: m.start()]))
        tok = m.group(0)
        if tok[0] == '"':
            spans.append(
                (False, "`" + tok[1:-1].replace('""', '"') + "`")
            )
        else:
            spans.append((True, tok))
        last = m.end()
    spans.append((False, sql[last:]))
    # coalesce adjacent code spans so rewrites spanning an identifier
    # boundary (`iceberg`.t catalog strip) still match
    parts: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            parts.append(rewrite("".join(buf)))
            buf.clear()

    for is_lit, text in spans:
        if is_lit:
            flush()
            parts.append(text)
        else:
            buf.append(text)
    flush()
    out = "".join(parts)
    out = _rewrite_date_diff(out)
    out = _rewrite_schema_location(out, keep_schema_location)
    out = _rewrite_unnest(out)
    return out


#: Trino date_diff('unit', from, to) -> Spark timestampdiff(UNIT,
#: from, to). Both count COMPLETE intervals from `from` to `to`;
#: the unit travels as a literal in Trino, an identifier in Spark.
_DATE_DIFF = re.compile(
    r"\bdate_diff\s*\(\s*'(\w+)'\s*,", re.IGNORECASE
)


def _rewrite_date_diff(sql: str) -> str:
    """Runs over the full statement because the unit lives INSIDE a
    string literal (which :func:`_outside_literals` deliberately
    skips); matches starting inside an unrelated literal are left
    alone."""
    out, last = [], 0
    for m in _DATE_DIFF.finditer(sql):
        if _in_literal(sql, m.start()):
            continue
        out.append(sql[last: m.start()])
        out.append(f"timestampdiff({m.group(1).upper()},")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def _in_literal(sql: str, pos: int) -> bool:
    """True when ``pos`` falls inside a single-quoted literal."""
    return any(
        m.start() <= pos < m.end() for m in _LITERAL.finditer(sql)
    )


def _rewrite_schema_location(sql: str, keep: bool) -> str:
    for m in re.finditer(
        r"\bWITH\s*\(\s*location\s*=\s*'([^']*)'\s*\)", sql,
        flags=re.IGNORECASE,
    ):
        # a payload literal containing this construct must pass
        # through byte-identical (module contract)
        if _in_literal(sql, m.start()):
            continue
        replacement = f"LOCATION '{m.group(1)}'" if keep else ""
        return (sql[: m.start()] + replacement + sql[m.end():]).rstrip()
    return sql


def _rewrite_unnest(sql: str) -> str:
    """``UNNEST(<balanced>) AS t(n)`` -> ``(SELECT explode(<balanced>)
    AS n) t`` — paren-balanced scan, repeated for every occurrence
    OUTSIDE string literals; unbalanced parens leave the statement
    untouched (Spark's parser then errors on the ORIGINAL text, not
    on a truncated rewrite)."""
    pat = re.compile(r"\bUNNEST\s*\(", flags=re.IGNORECASE)
    start_at = 0
    while True:
        m = pat.search(sql, start_at)
        if not m:
            return sql
        if _in_literal(sql, m.start()):
            start_at = m.end()
            continue
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            ch = sql[i]
            if ch == "'":
                # skip string literals ('' escapes included) so
                # parens inside them don't unbalance the scan
                lm = _LITERAL.match(sql, i)
                i = lm.end() if lm else i + 1
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            return sql  # unbalanced input: not ours to rewrite
        inner = sql[m.end() : i - 1]
        tail = re.match(
            r"\s+AS\s+(\w+)\s*\(\s*(\w+)\s*\)", sql[i:], flags=re.IGNORECASE
        )
        if not tail:
            # plain UNNEST without alias: posexplode-free fallback
            sql = f"{sql[:m.start()]}(SELECT explode({inner}) AS col){sql[i:]}"
            continue
        alias, col = tail.group(1), tail.group(2)
        sql = (
            f"{sql[:m.start()]}(SELECT explode({inner}) AS {col}) {alias}"
            f"{sql[i + tail.end():]}"
        )


#: Spark simpleString -> Trino type name (the subset the corpus
#: uses). Shared by the wire server's column descriptors and the
#: engine's information_schema surface, so a SQLAlchemy client sees
#: ONE spelling everywhere.
_TRINO_TYPES = {
    "bigint": "bigint",
    "int": "integer",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "string": "varchar",
    "double": "double",
    "float": "real",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp(3)",
    "timestamp_ntz": "timestamp(3)",
    "binary": "varbinary",
}


def trino_type(simple: str) -> str:
    """Trino spelling of a Spark ``simpleString`` type name."""
    if simple in _TRINO_TYPES:
        return _TRINO_TYPES[simple]
    if simple.startswith("decimal"):
        return simple
    if simple.startswith("array<") and simple.endswith(">"):
        return f"array({trino_type(simple[6:-1])})"
    return simple
