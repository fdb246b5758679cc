"""Multi-statement SQL script runner (SURVEY.md §3.3).

The reference's deployer executes `.sql` files by splitting on ``;`` and
running each statement on a warehouse cursor
(``scripts/deployment_files/snowflake_deployer.py:173-208``). The Spark
analogue iterates ``spark.sql``. Our splitter is deliberately stronger than
the reference's naive ``text.split(';')``: it respects single/double-quoted
strings (with ``''`` escapes), backtick identifiers, and ``--`` / ``/* */``
comments, so a semicolon inside a literal never splits a statement.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession


def split_sql_statements(text: str) -> list[str]:
    """Split a SQL script into statements on top-level ``;``."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":  # line comment (kept; spark.sql accepts)
            j = text.find("\n", i)
            j = n if j < 0 else j
            buf.append(text[i:j])
            i = j
        elif ch == "/" and nxt == "*":  # block comment
            j = text.find("*/", i + 2)
            j = n - 2 if j < 0 else j
            buf.append(text[i : j + 2])
            i = j + 2
        elif ch in ("'", '"', "`"):  # quoted literal / identifier
            j = i + 1
            while j < n:
                if text[j] == ch:
                    if ch == "'" and j + 1 < n and text[j + 1] == "'":
                        j += 2  # '' escape inside a string literal
                        continue
                    break
                j += 1
            buf.append(text[i : j + 1])
            i = j + 1
        elif ch == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


def _code_segments(text: str) -> list[tuple[bool, str]]:
    """Split SQL into (is_code, segment) runs where non-code segments are
    string literals, quoted identifiers, and comments — so dialect
    rewrites never touch the inside of a literal."""
    segs: list[tuple[bool, str]] = []
    buf: list[str] = []
    i, n = 0, len(text)

    def flush():
        if buf:
            segs.append((True, "".join(buf)))
            buf.clear()

    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":
            j = text.find("\n", i)
            j = n if j < 0 else j
            flush()
            segs.append((False, text[i:j]))
            i = j
        elif ch == "/" and nxt == "*":
            j = text.find("*/", i + 2)
            j = n - 2 if j < 0 else j
            flush()
            segs.append((False, text[i : j + 2]))
            i = j + 2
        elif ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if text[j] == ch:
                    if ch == "'" and j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            flush()
            segs.append((False, text[i : j + 1]))
            i = j + 1
        else:
            buf.append(ch)
            i += 1
    flush()
    return segs


# Snowflake-ism -> Spark-SQL spelling, applied word-wise in code segments
# only. Each entry is (compiled regex on code text, replacement).
_SNOWFLAKE_FUNCS = [
    (_re.compile(r"\bIFF\s*\(", _re.IGNORECASE), "if("),
    (_re.compile(r"\bDATEADD\s*\(", _re.IGNORECASE), "timestampadd("),
    (_re.compile(r"\bDATEDIFF\s*\(", _re.IGNORECASE), "timestampdiff("),
    (_re.compile(r"\bTO_VARCHAR\s*\(", _re.IGNORECASE), "CAST_TO_STRING("),
    (_re.compile(r"\bTRY_TO_NUMBER\s*\(", _re.IGNORECASE), "SF_TRY_TO_NUMBER("),
    (_re.compile(r"\bOBJECT_CONSTRUCT_KEEP_NULL\s*\(", _re.IGNORECASE), "SF_OBJ_KEEP("),
    (_re.compile(r"\bOBJECT_CONSTRUCT\s*\(", _re.IGNORECASE), "SF_OBJ("),
    (_re.compile(r"\bGET_PATH\s*\(", _re.IGNORECASE), "SF_GET_PATH("),
    (_re.compile(r"\bARRAY_CONSTRUCT_COMPACT\s*\(", _re.IGNORECASE), "SF_ARR_COMPACT("),
    (_re.compile(r"\bARRAY_CONSTRUCT\s*\(", _re.IGNORECASE), "array("),
    (_re.compile(r"\bTO_DATE\s*\(", _re.IGNORECASE), "SF_TO_DATE("),
    (_re.compile(r"\bTO_TIMESTAMP\s*\(", _re.IGNORECASE), "SF_TO_TIMESTAMP("),
    (_re.compile(r"\bCREATE\s+OR\s+REPLACE\s+TRANSIENT\s+TABLE\b", _re.IGNORECASE),
     "CREATE OR REPLACE TABLE"),
    (_re.compile(r"\bCREATE\s+TRANSIENT\s+TABLE\b", _re.IGNORECASE), "CREATE TABLE"),
]
_QUALIFY_RE = _re.compile(r"\bQUALIFY\b", _re.IGNORECASE)
_TAIL_RE = _re.compile(r"\b(ORDER\s+BY|LIMIT|OFFSET)\b", _re.IGNORECASE)
_FROM_RE = _re.compile(r"\bFROM\b", _re.IGNORECASE)


# Snowflake datetime-format tokens -> Spark (SimpleDateFormat-style)
# patterns, longest-first so HH24 wins over HH. Case-insensitive on the
# Snowflake side (Snowflake format elements are case-insensitive).
_SF_DT_TOKENS = [
    ("YYYY", "yyyy"), ("YY", "yy"),
    ("MON", "MMM"), ("MM", "MM"),
    ("DY", "EEE"), ("DD", "dd"),
    ("HH24", "HH"), ("HH12", "hh"), ("HH", "HH"),
    ("MI", "mm"), ("SS", "ss"),
    ("FF9", "SSSSSSSSS"), ("FF6", "SSSSSS"), ("FF3", "SSS"), ("FF", "SSS"),
    ("AM", "a"), ("PM", "a"),
]


def _snowflake_datetime_format(fmt: str) -> str:
    """Translate a Snowflake datetime format string to Spark's pattern
    (``TO_VARCHAR(ts, 'YYYY-MM-DD') -> date_format(ts, 'yyyy-MM-dd')``).
    Separators (``- / : . ,`` space) pass through; any alphabetic run that
    is not a known datetime element raises NotImplementedError (numeric
    TO_VARCHAR formats like '9,999.00' have no date_format analogue)."""
    out: list[str] = []
    i, n = 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if not ch.isalpha():
            if ch.isdigit():
                raise NotImplementedError(
                    f"translate_snowflake_sql: TO_VARCHAR numeric format "
                    f"{fmt!r} is not translated — rewrite with format_number()"
                )
            out.append(ch)
            i += 1
            continue
        for sf, sp in _SF_DT_TOKENS:
            if fmt[i : i + len(sf)].upper() == sf:
                out.append(sp)
                i += len(sf)
                break
        else:
            raise NotImplementedError(
                f"translate_snowflake_sql: unknown TO_VARCHAR format element "
                f"at {fmt[i:]!r} in {fmt!r}"
            )
    return "".join(out)


def _literal_fmt(arg: str, fn: str) -> str:
    """Extract a string-literal format argument and translate it to a
    Spark datetime pattern; refuse non-literals loudly."""
    m = _re.fullmatch(r"'((?:[^']|'')*)'", arg.strip())
    if m is None:
        raise NotImplementedError(
            f"translate_snowflake_sql: {fn} needs a string-literal format — "
            "rewrite by hand"
        )
    return _snowflake_datetime_format(m.group(1).replace("''", "'"))


def _h_to_varchar(args: list[str]) -> str:
    if len(args) == 1:
        return f"CAST({args[0]} AS STRING)"
    if len(args) == 2:
        return f"date_format({args[0]}, '{_literal_fmt(args[1], 'TO_VARCHAR')}')"
    raise NotImplementedError(
        "translate_snowflake_sql: TO_VARCHAR takes 1 or 2 arguments"
    )


def _h_to_date(args: list[str]) -> str:
    if len(args) == 1:
        return f"to_date({args[0]})"
    if len(args) == 2:
        return f"to_date({args[0]}, '{_literal_fmt(args[1], 'TO_DATE')}')"
    raise NotImplementedError(
        "translate_snowflake_sql: TO_DATE takes 1 or 2 arguments"
    )


def _h_to_timestamp(args: list[str]) -> str:
    if len(args) == 1:
        return f"to_timestamp({args[0]})"
    if len(args) == 2:
        return f"to_timestamp({args[0]}, '{_literal_fmt(args[1], 'TO_TIMESTAMP')}')"
    raise NotImplementedError(
        "translate_snowflake_sql: TO_TIMESTAMP takes 1 or 2 arguments"
    )


def _is_empty_arglist(args: list[str]) -> bool:
    """True for a zero-argument call — the splitter hands ``[]`` or a
    single all-whitespace fragment for ``FN()``."""
    return not args or (len(args) == 1 and not args[0].strip())


def _object_construct_pairs(args: list[str], fn: str) -> str:
    """Validate OBJECT_CONSTRUCT-style (key, value, ...) arguments and
    return the ``named_struct`` argument text. Keys must be string
    literals (``named_struct`` needs foldable field names); the splat and
    dynamic-key forms are refused loudly."""
    if len(args) == 1 and args[0].strip() == "*":
        raise NotImplementedError(
            f"translate_snowflake_sql: {fn}(*) is not translated — list the "
            "key/value pairs explicitly"
        )
    if len(args) % 2 != 0 or not args or not args[0].strip():
        raise NotImplementedError(
            f"translate_snowflake_sql: {fn} takes key/value PAIRS"
        )
    for k in args[::2]:
        if not _re.fullmatch(r"'(?:[^']|'')*'", k.strip()):
            raise NotImplementedError(
                f"translate_snowflake_sql: {fn} keys must be string "
                f"literals (got {k.strip()!r}) — dynamic keys have no "
                "named_struct analogue; rewrite by hand"
            )
    return ", ".join(a.strip() for a in args)


def _h_object_construct(args: list[str]) -> str:
    """Snowflake ``OBJECT_CONSTRUCT(k1, v1, ...)`` builds a VARIANT object
    and DROPS pairs whose value is NULL. The JSON round-trip reproduces
    exactly that: ``to_json`` with ``ignoreNullFields`` omits null fields
    (pinned explicitly — not left to the session default), and
    ``parse_json`` lifts the result back to VARIANT."""
    if _is_empty_arglist(args):
        # zero-arg form is legal Snowflake: builds the empty object
        return "parse_json('{}')"
    pairs = _object_construct_pairs(args, "OBJECT_CONSTRUCT")
    return (
        f"parse_json(to_json(named_struct({pairs}), "
        f"map('ignoreNullFields', 'true')))"
    )


def _h_object_construct_keep(args: list[str]) -> str:
    """``OBJECT_CONSTRUCT_KEEP_NULL`` keeps null-valued pairs — exactly
    ``to_variant_object`` over a struct (nulls preserved)."""
    if _is_empty_arglist(args):
        return "parse_json('{}')"
    pairs = _object_construct_pairs(args, "OBJECT_CONSTRUCT_KEEP_NULL")
    return f"to_variant_object(named_struct({pairs}))"


def _h_get_path(args: list[str]) -> str:
    """``GET_PATH(v, 'a.b[0]')`` -> ``variant_get(v, '$.a.b[0]')`` —
    Snowflake path expressions are JSON-path bodies; prefix ``$`` (and a
    ``.`` unless the path starts with an index). Non-literal paths are
    refused (variant_get needs a foldable path)."""
    if len(args) != 2:
        raise NotImplementedError(
            "translate_snowflake_sql: GET_PATH takes (variant, 'path')"
        )
    m = _re.fullmatch(r"'((?:[^']|'')*)'", args[1].strip())
    if m is None:
        raise NotImplementedError(
            "translate_snowflake_sql: GET_PATH needs a string-literal path "
            "— rewrite by hand"
        )
    body = m.group(1)
    sep = "" if body.startswith("[") else "."
    return f"variant_get({args[0]}, '${sep}{body}')"


def _h_array_construct_compact(args: list[str]) -> str:
    """``ARRAY_CONSTRUCT_COMPACT`` drops NULL elements (Snowflake
    contract); ``array()`` keeps them, so wrap in a null filter."""
    inner = ", ".join(a.strip() for a in args)
    return f"filter(array({inner}), x -> x IS NOT NULL)"


def _h_try_to_number(args: list[str]) -> str:
    """Snowflake TRY_TO_NUMBER (r07):

    - 1 arg  -> ``try_cast(x AS DECIMAL(38, 0))`` (Snowflake's default
      NUMBER(38,0); Spark's ``try_to_number`` REQUIRES a format string so
      the bare form must become a cast);
    - 2 args with a literal format -> Spark's native
      ``try_to_number(x, 'fmt')`` (both dialects use Oracle-style numeric
      format elements);
    - 3 args (precision, scale) -> ``try_cast(x AS DECIMAL(p, s))``.
    """
    if len(args) == 1:
        return f"try_cast({args[0]} AS DECIMAL(38, 0))"
    if len(args) == 2:
        a1 = args[1].strip()
        if _re.fullmatch(r"'(?:[^']|'')*'", a1):
            return f"try_to_number({args[0]}, {a1})"
        raise NotImplementedError(
            "translate_snowflake_sql: TRY_TO_NUMBER's second argument must "
            "be a string-literal format (for precision/scale pass BOTH, "
            "e.g. TRY_TO_NUMBER(x, 38, 0)) — rewrite by hand"
        )
    if len(args) == 3:
        try:
            p, s = int(args[1].strip()), int(args[2].strip())
        except ValueError:
            raise NotImplementedError(
                "translate_snowflake_sql: TRY_TO_NUMBER precision/scale "
                "must be integer literals — rewrite by hand"
            ) from None
        return f"try_cast({args[0]} AS DECIMAL({p}, {s}))"
    raise NotImplementedError(
        "translate_snowflake_sql: TRY_TO_NUMBER takes 1-3 arguments"
    )


# marker (from _SNOWFLAKE_FUNCS rewrites) -> replacement builder over the
# extracted top-level argument list
_MARKER_HANDLERS = [
    ("CAST_TO_STRING(", _h_to_varchar),
    ("SF_TO_DATE(", _h_to_date),
    ("SF_TO_TIMESTAMP(", _h_to_timestamp),
    ("SF_TRY_TO_NUMBER(", _h_try_to_number),
    ("SF_OBJ_KEEP(", _h_object_construct_keep),
    ("SF_OBJ(", _h_object_construct),
    ("SF_GET_PATH(", _h_get_path),
    ("SF_ARR_COMPACT(", _h_array_construct_compact),
]


def _apply_func_maps(stmt: str) -> str:
    out: list[str] = []
    for is_code, seg in _code_segments(stmt):
        if is_code:
            for rx, rep in _SNOWFLAKE_FUNCS:
                seg = rx.sub(rep, seg)
        out.append(seg)
    stmt = "".join(out)
    # Marker calls (TO_VARCHAR/TO_DATE/TO_TIMESTAMP) are spliced over the
    # REASSEMBLED statement: the paren scan must cross string-literal and
    # comment segments (TO_VARCHAR(coalesce(x, 'none')) holds a literal
    # inside the argument) so depth is tracked with _depth_positions, which
    # carries it across non-code regions without counting parens inside
    # literals. Arguments split at top-level commas only.
    while True:
        code_text = "".join(
            s if c else " " * len(s) for c, s in _code_segments(stmt)
        )
        k = None
        marker = handler = None
        for m, h in _MARKER_HANDLERS:
            p = code_text.find(m)
            if p >= 0 and (k is None or p < k):
                k, marker, handler = p, m, h
        if k is None:
            return stmt
        start = k + len(marker)
        base = None  # paren depth just inside the marker's open paren
        close = None
        commas: list[int] = []
        for pos, ch, d in _depth_positions(stmt):
            if pos == start - 1:
                base = d + 1
                continue
            if base is None or pos < start:
                continue
            if ch == ")" and d == base:
                close = pos
                break
            if ch == "," and d == base:
                commas.append(pos)
        if close is None:
            raise ValueError(
                f"translate_snowflake_sql: unbalanced parentheses after "
                f"{marker}"
            )
        bounds = [start, *[c + 1 for c in commas], close + 1]
        args = [
            stmt[a : b - 1].strip() for a, b in zip(bounds[:-1], bounds[1:])
        ]
        stmt = stmt[:k] + handler(args) + stmt[close + 1 :]


def _depth_positions(stmt: str):
    """(position, paren_depth) for every code character; non-code regions
    are skipped (depth carried through)."""
    pos = 0
    depth = 0
    for is_code, seg in _code_segments(stmt):
        if is_code:
            for off, ch in enumerate(seg):
                yield pos + off, ch, depth
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth = max(0, depth - 1)
        pos += len(seg)


_FLATTEN_RE = _re.compile(r"\bFLATTEN\s*\(", _re.IGNORECASE)
_LATERAL_BEFORE_RE = _re.compile(r"\bLATERAL\s*$", _re.IGNORECASE)
_TABLE_BEFORE_RE = _re.compile(r"\bTABLE\s*\(\s*$", _re.IGNORECASE)
_ALIAS_RE = _re.compile(r"\s*(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)", _re.IGNORECASE)
# tokens that can follow a table factor and must not be mistaken for an alias
_NOT_ALIAS = {
    "WHERE", "GROUP", "ORDER", "LIMIT", "OFFSET", "HAVING", "QUALIFY",
    "WINDOW", "ON", "USING", "JOIN", "LEFT", "RIGHT", "FULL", "INNER",
    "OUTER", "CROSS", "LATERAL", "UNION", "INTERSECT", "EXCEPT", "SELECT",
    "TABLE",
}


def _parse_flatten_args(args: list[str]) -> tuple[str, bool]:
    """(input_expr, outer) from FLATTEN's argument list. Arguments are
    Snowflake named args (``NAME => value``) or one positional INPUT.
    RECURSIVE => TRUE and MODE other than 'BOTH' are refused: recursion
    has no variant_explode analogue, and ARRAY/OBJECT modes restrict the
    exploded type (variant_explode always explodes both)."""
    input_expr = None
    path = None
    outer = False
    for i, raw in enumerate(args):
        arg = raw.strip()
        m = _re.match(r"^([A-Za-z_]+)\s*=>\s*(.*)$", arg, _re.DOTALL)
        if m is None:
            if i == 0:
                input_expr = arg
                continue
            raise NotImplementedError(
                "translate_snowflake_sql: FLATTEN arguments after the first "
                "must be named (NAME => value)"
            )
        name, val = m.group(1).upper(), m.group(2).strip()
        if name == "INPUT":
            input_expr = val
        elif name == "PATH":
            lm = _re.fullmatch(r"'((?:[^']|'')*)'", val)
            if lm is None:
                raise NotImplementedError(
                    "translate_snowflake_sql: FLATTEN PATH must be a string "
                    "literal"
                )
            path = lm.group(1)
        elif name == "OUTER":
            outer = val.upper() == "TRUE"
        elif name == "RECURSIVE":
            if val.upper() == "TRUE":
                raise NotImplementedError(
                    "translate_snowflake_sql: FLATTEN(RECURSIVE => TRUE) has "
                    "no variant_explode analogue — rewrite as chained "
                    "FLATTENs or a recursive CTE"
                )
        elif name == "MODE":
            if val.upper().strip("'") != "BOTH":
                raise NotImplementedError(
                    "translate_snowflake_sql: FLATTEN MODE other than 'BOTH' "
                    "is not translated (variant_explode explodes arrays AND "
                    "objects) — filter on the alias's key/index instead"
                )
        else:
            raise NotImplementedError(
                f"translate_snowflake_sql: unknown FLATTEN argument {name}"
            )
    if input_expr is None:
        raise NotImplementedError(
            "translate_snowflake_sql: FLATTEN needs an INPUT argument"
        )
    if path is not None:
        sep = "" if path.startswith("[") else "."
        input_expr = f"variant_get({input_expr}, '${sep}{path}')"
    return input_expr, outer


# Snowflake VARIANT colon-path extraction: <ident[.ident...]>:<path>
# where path is ident(.ident | [n])*. Single colon only — both lookarounds
# exclude `::` casts; the colon must bind TIGHT on both sides (no spaces),
# which is how the idiom is written and what keeps parameter markers
# (`EXECUTE IMMEDIATE :stmt`, `USING :x` — whitespace before the colon)
# and spaced casts out. Quoted path parts (v:"a b") deliberately do NOT
# match and pass through to the parser.
_COLON_PATH_RE = _re.compile(
    r"\b([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)(?<!:):(?!:)"
    r"([A-Za-z_]\w*(?:\.[A-Za-z_]\w*|\[\d+\])*)"
)
# field:TYPE pairs inside complex-type DDL (STRUCT<a:INT>) must NOT become
# variant_get: a single-segment path that IS a SQL type keyword is treated
# as DDL and left alone (a real VARIANT field literally named 'int' can
# still be read via GET_PATH — documented limitation)
_SQL_TYPE_KEYWORDS = frozenset(
    "INT INTEGER BIGINT SMALLINT TINYINT LONG SHORT BYTE FLOAT REAL DOUBLE "
    "DECIMAL DEC NUMERIC STRING VARCHAR CHAR BOOLEAN BINARY DATE TIMESTAMP "
    "TIMESTAMP_NTZ TIMESTAMP_LTZ INTERVAL ARRAY MAP STRUCT VARIANT VOID "
    "NUMBER TEXT".split()
)


def _rewrite_colon_paths(stmt: str) -> str:
    """Rewrite Snowflake's ``v:a.b[0]`` VARIANT path operator (THE most
    common Snowflake idiom) to ``variant_get(v, '$.a.b[0]')``. Applied to
    code segments only, so colons inside string literals (times, JSON)
    are never touched; ``::`` casts are excluded by both lookarounds and
    ``field:TYPE`` pairs inside complex-type DDL by the type-keyword
    guard. Runs BEFORE the FLATTEN rewrite so ``FLATTEN(INPUT => v:items)``
    composes. Documented limitations (both pass through to the parser
    rather than misrewriting): the left side must be an identifier chain
    (``parse_json(x):a`` — colon after a call's ``)`` — needs GET_PATH),
    and quoted path parts (``v:"a b"``) are not matched."""

    def _sub(m: _re.Match) -> str:
        path = m.group(2)
        if "." not in path and "[" not in path and path.upper() in _SQL_TYPE_KEYWORDS:
            return m.group(0)  # STRUCT<a:INT>-style DDL, not a variant path
        return f"variant_get({m.group(1)}, '$.{path}')"

    out: list[str] = []
    for is_code, seg in _code_segments(stmt):
        if is_code:
            seg = _COLON_PATH_RE.sub(_sub, seg)
        out.append(seg)
    return "".join(out)


_LISTAGG_RE = _re.compile(r"\bLISTAGG\s*\(", _re.IGNORECASE)
_WITHIN_AFTER_RE = _re.compile(r"\s*WITHIN\b", _re.IGNORECASE)
_DISTINCT_LEAD_RE = _re.compile(r"^\s*DISTINCT\b\s*", _re.IGNORECASE)


def _rewrite_bare_listagg(stmt: str) -> str:
    """Give bare ``LISTAGG(x[, sep])`` (no WITHIN GROUP) a deterministic
    default order: splice `` WITHIN GROUP (ORDER BY x)`` after it. Both
    dialects leave bare LISTAGG's concatenation order unspecified — but
    Spark 4 REFUSES it outright ([INVALID_WITHIN_GROUP_EXPRESSION]), so a
    migrating user's statement dies; ordering by the aggregated expression
    itself is deterministic, valid for the DISTINCT form (Spark requires
    the order key to equal the argument there), and a legal instance of
    the unspecified order. Statements that already carry WITHIN GROUP
    pass through untouched (r07 pins)."""
    for _ in range(64):  # progress-bounded (one bare LISTAGG per pass)
        code_text = "".join(
            s if c else " " * len(s) for c, s in _code_segments(stmt)
        )
        fixed = None
        for m in _LISTAGG_RE.finditer(code_text):
            open_paren = code_text.index("(", m.start())
            base = None
            close = None
            commas: list[int] = []
            for pos, ch, d in _depth_positions(stmt):
                if pos == open_paren:
                    base = d + 1
                    continue
                if base is None or pos <= open_paren:
                    continue
                if ch == ")" and d == base:
                    close = pos
                    break
                if ch == "," and d == base:
                    commas.append(pos)
            if close is None:
                raise ValueError(
                    "translate_snowflake_sql: unbalanced parentheses in "
                    "LISTAGG"
                )
            if _WITHIN_AFTER_RE.match(code_text, close + 1):
                continue  # already ordered — native passthrough
            first_arg = stmt[open_paren + 1 : commas[0] if commas else close]
            order_key = _DISTINCT_LEAD_RE.sub("", first_arg).strip()
            if not order_key:
                raise ValueError(
                    "translate_snowflake_sql: LISTAGG needs an argument"
                )
            fixed = (
                stmt[: close + 1]
                + f" WITHIN GROUP (ORDER BY {order_key})"
                + stmt[close + 1 :]
            )
            break
        if fixed is None:
            return stmt
        stmt = fixed
    return stmt


def _rewrite_flatten(stmt: str) -> str:
    """Rewrite every ``LATERAL FLATTEN(...) [AS] f`` / ``TABLE(FLATTEN(...))
    [AS] f`` table factor into Spark's lateral table-function join:

        LATERAL variant_explode[_outer](CAST((<input>) AS VARIANT))
            f(index, key, value)

    ``f.index`` / ``f.key`` / ``f.value`` then resolve as in Snowflake
    (``value`` is VARIANT in both dialects; cast to use). Deviations,
    refused or documented: Snowflake's ``seq``/``path``/``this`` output
    columns are not produced (references fail loudly at analysis);
    object elements get ``index`` = ordinal position instead of NULL.
    The CAST lets plain ARRAY columns flatten like Snowflake's implicit
    VARIANT coercion; a non-castable input (e.g. MAP) fails at analysis.
    """
    search_from = 0
    for _ in range(64):  # progress-bounded (one FLATTEN consumed per pass)
        code_text = "".join(
            s if c else " " * len(s) for c, s in _code_segments(stmt)
        )
        fm = _FLATTEN_RE.search(code_text, search_from)
        if fm is None:
            return stmt
        open_paren = code_text.index("(", fm.start())
        before = code_text[: fm.start()]
        lat = _LATERAL_BEFORE_RE.search(before)
        tab = _TABLE_BEFORE_RE.search(before)
        if lat is None and tab is None:
            # bare flatten(...) is Spark's own array-flatten scalar (legal
            # Spark SQL; Snowflake's table FLATTEN always rides LATERAL or
            # TABLE()) — pass it through untouched
            search_from = fm.end()
            continue
        repl_start = lat.start() if lat is not None else tab.start()
        # matching close paren of FLATTEN( via the literal-aware depth scan
        base = None
        close = None
        commas: list[int] = []
        for pos, ch, d in _depth_positions(stmt):
            if pos == open_paren:
                base = d + 1
                continue
            if base is None or pos <= open_paren:
                continue
            if ch == ")" and d == base:
                close = pos
                break
            if ch == "," and d == base:
                commas.append(pos)
        if close is None:
            raise ValueError(
                "translate_snowflake_sql: unbalanced parentheses in FLATTEN"
            )
        bounds = [open_paren + 1, *[c + 1 for c in commas], close + 1]
        args = [stmt[a : b - 1] for a, b in zip(bounds[:-1], bounds[1:])]
        args = [a for a in args if a.strip()]
        end = close + 1
        if tab is not None:
            # consume TABLE(...)'s own close paren
            m2 = _re.match(r"\s*\)", code_text[end:])
            if m2 is None:
                raise ValueError(
                    "translate_snowflake_sql: TABLE(FLATTEN(...)) missing "
                    "its closing parenthesis"
                )
            end += m2.end()
        am = _ALIAS_RE.match(code_text, end)
        alias = "_flat"
        if am is not None and am.group(1).upper() not in _NOT_ALIAS:
            alias = am.group(1)
            end = am.end()
        input_expr, outer = _parse_flatten_args(args)
        fn = "variant_explode_outer" if outer else "variant_explode"
        stmt = (
            stmt[:repl_start]
            + f"LATERAL {fn}(CAST(({input_expr}) AS VARIANT)) "
            + f"{alias}(index, key, value)"
            + stmt[end:]
        )
    return stmt


def _rewrite_qualify_scope(stmt: str) -> str | None:
    """Rewrite ONE SELECT scope's ``QUALIFY <pred>`` (at depth 0 of the
    given text) into standard SQL:

        SELECT <list> FROM ... QUALIFY <pred> [ORDER BY/LIMIT tail]
        ->
        SELECT * EXCEPT (__qualify) FROM (
            SELECT <list>, (<pred>) AS __qualify FROM ...
        ) WHERE __qualify [tail]

    Window functions are legal in a projection, so the predicate computes
    as a projected boolean; Snowflake scoping (predicate sees the SELECT
    scope) is preserved. Returns None when the scope has no depth-0
    QUALIFY or is not a SELECT...FROM shape (caller leaves the text for
    the parser to reject rather than misrewriting). ``SELECT DISTINCT`` +
    QUALIFY is REFUSED loudly: appending the predicate column inside the
    DISTINCT would change which rows are distinct (Snowflake applies
    QUALIFY after DISTINCT) — rewrite such statements by hand.
    """
    code_text = "".join(s if c else " " * len(s) for c, s in _code_segments(stmt))
    qpos = None
    for pos, _ch, depth in _depth_positions(stmt):
        if depth == 0 and _QUALIFY_RE.match(code_text, pos) and qpos is None:
            qpos = pos
    if qpos is None:
        return None
    head = stmt[:qpos].rstrip()
    after = stmt[qpos + len("QUALIFY") :]
    after_code = code_text[qpos + len("QUALIFY") :]
    # find the top-level tail (ORDER BY / LIMIT / OFFSET) within `after`
    tail_at = None
    depth = 0
    for off, ch in enumerate(after_code):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif depth == 0 and _TAIL_RE.match(after_code, off):
            tail_at = off
            break
    pred = (after if tail_at is None else after[:tail_at]).strip()
    tail = "" if tail_at is None else after[tail_at:]
    # insert ", (pred) AS __qualify" before the first top-level FROM
    from_at = None
    for pos, _ch, depth in _depth_positions(head):
        if depth == 0 and _FROM_RE.match(code_text, pos):
            from_at = pos
            break
    if from_at is None:
        return None  # not a SELECT...FROM shape; leave untouched
    if _re.search(r"\bSELECT\s+DISTINCT\b", code_text[:from_at], _re.IGNORECASE):
        raise ValueError(
            "translate_snowflake_sql: SELECT DISTINCT with QUALIFY cannot be "
            "rewritten faithfully (the predicate column would join the "
            "DISTINCT key set); restructure the statement"
        )
    inner = f"{head[:from_at].rstrip()}, ({pred}) AS __qualify {head[from_at:]}"
    return (
        f"SELECT * EXCEPT (__qualify) FROM ({inner}) WHERE __qualify {tail}".rstrip()
    )


def _rewrite_qualify(stmt: str) -> str:
    """Rewrite EVERY ``QUALIFY`` in the statement, deepest scope first
    (r06: subquery-level QUALIFYs too, not just the outermost — a depth-d
    QUALIFY's scope is the innermost parenthesized region containing it,
    and within that region the same depth-0 scope rewrite applies).
    Innermost-first ordering keeps outer offsets valid and lets an outer
    QUALIFY see its subqueries already in standard SQL. A scope that is
    not a SELECT...FROM shape stops the sweep and is left for the parser
    to reject; the DISTINCT refusal raises per scope.

    The inner ``__qualify`` helper column cannot collide across nesting
    levels: each scope's rewrite drops its own helper via
    ``* EXCEPT (__qualify)`` before the enclosing scope sees the rows.
    """
    for _ in range(64):  # progress-bounded (one QUALIFY consumed per pass)
        code_text = "".join(
            s if c else " " * len(s) for c, s in _code_segments(stmt)
        )
        occ = [
            (pos, depth)
            for pos, _ch, depth in _depth_positions(stmt)
            if _QUALIFY_RE.match(code_text, pos)
        ]
        if not occ:
            return stmt
        pos, depth = max(occ, key=lambda t: (t[1], -t[0]))  # deepest, first
        if depth == 0:
            new = _rewrite_qualify_scope(stmt)
            if new is None:
                return stmt
            stmt = new
            continue
        # enclosing paren span of the deepest QUALIFY: the last "(" before
        # it that raised depth to `depth` (any earlier sibling group at the
        # same depth closed before `pos`), and the first ")" after it that
        # drops back below
        open_pos = close_pos = None
        for p2, ch, d in _depth_positions(stmt):
            if p2 < pos:
                if ch == "(" and d == depth - 1:
                    open_pos = p2
            elif ch == ")" and d == depth:
                close_pos = p2
                break
        if open_pos is None or close_pos is None:
            return stmt  # unbalanced; leave for the parser
        inner = _rewrite_qualify_scope(stmt[open_pos + 1 : close_pos])
        if inner is None:
            return stmt
        stmt = stmt[: open_pos + 1] + inner + stmt[close_pos:]
    return stmt


def translate_snowflake_sql(stmt: str) -> str:
    """Best-effort Snowflake -> Spark SQL statement translation (the
    dialect the reference's users actually write):

    - ``QUALIFY <pred>`` -> subquery + WHERE (Spark has no QUALIFY);
    - ``IFF`` -> ``if``, ``DATEADD``/``DATEDIFF`` -> ``timestampadd``/
      ``timestampdiff`` (same argument order), single-arg ``TO_VARCHAR(x)``
      -> ``CAST(x AS STRING)``, datetime-format ``TO_VARCHAR(x, 'fmt')``
      -> ``date_format(x, '<translated fmt>')`` (numeric formats refused);
    - ``TRY_TO_NUMBER(x)`` -> ``try_cast(x AS DECIMAL(38, 0))`` /
      ``TRY_TO_NUMBER(x, p, s)`` -> ``try_cast(x AS DECIMAL(p, s))``
      (Spark's ``try_to_number`` requires a format string; the 2-arg
      literal-format form maps onto it directly);
    - ``CREATE [OR REPLACE] TRANSIENT TABLE`` -> the non-transient form
      (the engine's TableStore/temp views stand in for transience).

    - ``LATERAL FLATTEN(INPUT => x [, PATH/OUTER/...])`` and
      ``TABLE(FLATTEN(...))`` -> ``LATERAL variant_explode[_outer]``
      (``f.index``/``f.key``/``f.value``; RECURSIVE/non-BOTH MODE refused);
    - ``OBJECT_CONSTRUCT(k, v, ...)`` -> null-dropping VARIANT object via
      ``parse_json(to_json(named_struct(...)))``;
      ``OBJECT_CONSTRUCT_KEEP_NULL`` -> ``to_variant_object``;
    - ``GET_PATH(v, 'a.b[0]')`` -> ``variant_get(v, '$.a.b[0]')``;
    - ``ARRAY_CONSTRUCT`` -> ``array``; ``ARRAY_CONSTRUCT_COMPACT`` ->
      null-filtered ``array`` (Snowflake drops NULL elements there);
    - bare ``LISTAGG(x[, sep])`` (no WITHIN GROUP — Spark 4 refuses it)
      gains a deterministic `` WITHIN GROUP (ORDER BY x)`` default; forms
      that already order pass through unchanged.

    String literals, quoted identifiers, and comments are never touched.
    Already-Spark-compatible constructs pass through UNCHANGED because
    Spark 4 is natively compatible — probed and test-pinned
    (``test_sql_script.py``): ``GROUP BY ALL``, ``ILIKE``, ``::`` casts,
    ``NVL``/``NVL2``/``ZEROIFNULL``, and ``LISTAGG`` with
    ``WITHIN GROUP (ORDER BY ...)`` / ``DISTINCT`` (bare LISTAGG is
    rewritten, not passed through — see above).
    """
    return _rewrite_qualify(
        _rewrite_bare_listagg(
            _apply_func_maps(_rewrite_flatten(_rewrite_colon_paths(stmt)))
        )
    )


def run_sql_script(
    spark: SparkSession, text: str, dialect: str = "spark"
) -> DataFrame | None:
    """Execute every statement in ``text`` in order; returns the last
    statement's DataFrame (the reference runner returns only success, but a
    result handle costs nothing here — statements are lazy until acted on,
    except DDL/commands which Spark executes eagerly).

    ``dialect="snowflake"`` routes each statement through
    :func:`translate_snowflake_sql` first, so reference-style scripts
    (QUALIFY / IFF / DATEADD / TRANSIENT tables) run unmodified.
    """
    result: DataFrame | None = None
    for stmt in split_sql_statements(text):
        if dialect == "snowflake":
            stmt = translate_snowflake_sql(stmt)
        result = spark.sql(stmt)
    return result


def run_sql_file(spark: SparkSession, path: str) -> DataFrame | None:
    """File form of :func:`run_sql_script` (reference ``execute_sql_file``)."""
    with open(path) as f:
        return run_sql_script(spark, f.read())


def run_sql_directory(spark: SparkSession, directory: str) -> int:
    """Execute every ``*.sql`` file in ``directory`` in sorted order; returns
    the number of files run (the deployer's per-directory deploy loop)."""
    files = sorted(
        f for f in os.listdir(directory) if f.lower().endswith(".sql")
    )
    for fname in files:
        run_sql_file(spark, os.path.join(directory, fname))
    return len(files)
