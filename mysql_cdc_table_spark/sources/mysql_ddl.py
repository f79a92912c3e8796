"""MySQL DDL -> Spark schema: the Debezium-style schema-history path.

A binlog consumer that cannot rely on ``binlog_row_metadata=FULL``
(the default is MINIMAL, and pre-8.0.1 servers never write the TLVs)
learns table layouts the way every production CDC connector does: by
parsing the DDL statements the server logs as Query_log_events
(CREATE TABLE when the table is first replicated, ALTER TABLE as it
evolves) and replaying them into a schema history. This module
implements that replay for the engine's supported type space, mapping
MySQL column types onto the same StructField metadata conventions
``sources/mysql_binlog._cols_from_schema`` consumes — so a schema
parsed from DDL decodes rows through the exact code path a
user-declared schema does.

The reference never parses DDL — it trusts the server's live data
dictionary for the CURRENT layout (and default-skips QUERY events,
binlog_table_reader.cc:427-428, so it cannot even see history); any
out-of-band consumer of its changelog would need exactly this module.

Only public knowledge: MySQL's documented CREATE/ALTER grammar and
wire-type mapping.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# column attributes we accept and ignore (they do not affect the row
# image layout): NOT NULL / NULL, DEFAULT <literal|expr>, AUTO_INCREMENT,
# COMMENT '...', COLLATE/CHARACTER SET, [PRIMARY] KEY, UNIQUE, ON UPDATE ...
_TYPE_RE = re.compile(
    r"""^\s*
    (?P<type>[a-zA-Z][a-zA-Z0-9]*)
    \s*(?:\(\s*(?P<args>[^)]*)\s*\))?
    (?P<rest>.*)$""",
    re.VERBOSE | re.DOTALL,
)

_UNSIGNED_RE = re.compile(r"\bunsigned\b", re.IGNORECASE)


# MySQL's default sql_mode treats backslash as an escape inside '...'
# and "..." string literals (doubled quotes work everywhere; backticked
# identifiers only double the backtick). The standard escape letters —
# anything else after a backslash is the literal character itself.
_BACKSLASH_ESCAPES = {
    "0": "\0", "n": "\n", "r": "\r", "t": "\t", "b": "\b",
    "Z": "\x1a", "\\": "\\", "'": "'", '"': '"',
}


def _strip_quotes(tok: str) -> str:
    """Unquote an IDENTIFIER token (backtick/double-quote wrapped or
    bare). Identifier quoting only doubles the quote char — collapse
    that; backslash is NOT an escape in identifiers."""
    tok = tok.strip()
    q = tok[:1]
    if q in "`\"'" and tok[-1:] == q:
        return tok[1:-1].replace(q + q, q)
    return tok


def _unquote_literal(tok: str) -> str:
    """Unquote a STRING LITERAL ('...' or \"...\"): strip the outer
    quotes, collapse doubled quotes, and resolve backslash escapes the
    way the server's default sql_mode does."""
    tok = tok.strip()
    q = tok[:1]
    if q not in "'\"" or tok[-1:] != q:
        return tok
    body, out, i, n = tok[1:-1], [], 0, len(tok) - 2
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            out.append(_BACKSLASH_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        elif c == q and i + 1 < n and body[i + 1] == q:
            out.append(q)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _split_top_level(s: str) -> list[str]:
    """Split a CREATE TABLE body on top-level commas (parentheses and
    quoted strings are opaque). Inside '...' and \"...\" literals a
    backslash escapes the next character (MySQL's default sql_mode) —
    without that, a COMMENT 'x\\'' would silently end the literal one
    quote early and misattribute every later column (advisor finding,
    round 13). An unterminated literal raises instead of falling off
    the end."""
    out, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            q = c
            i += 1
            closed = False
            while i < n:
                if s[i] == "\\" and q != "`" and i + 1 < n:
                    i += 2  # backslash escape (not in identifiers)
                    continue
                if s[i] == q:
                    # MySQL doubles quotes inside literals ('it''s')
                    if i + 1 < n and s[i + 1] == q:
                        i += 2
                        continue
                    closed = True
                    break
                i += 1
            if not closed:
                raise ValueError(
                    f"unterminated {q}-quoted literal in DDL fragment "
                    f"{s[start:][:60]!r}"
                )
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


_CONSTRAINT_HEADS = (
    "primary", "unique", "key", "index", "constraint", "foreign",
    "fulltext", "spatial", "check",
)


def _parse_enum_values(args: str) -> list[str]:
    # ENUM/SET members are string literals: doubled quotes and
    # backslash escapes collapse to the literal character ('c''d' is
    # the member c'd — advisor finding, round 13)
    vals = []
    for part in _split_top_level(args):
        vals.append(_unquote_literal(part))
    return vals


# Charsets the engine's codec space covers. MySQL's ascii/utf8mb3 are
# byte-compatible subsets of utf-8, so they normalize to the utf8
# decode path; latin1 keeps its own single-byte decode; the
# double-byte sets — gbk (pre-8.0 Chinese deployments), sjis and its
# Windows superset cp932 (Japanese) — each decode through the shared
# DBCS path (mbmaxlen 2). Anything else (ucs2, big5, euckr, ...)
# raises pointedly rather than silently mojibake-ing a decode.
_CHARSET_NORM = {
    "utf8mb4": "utf8", "utf8mb3": "utf8", "utf8": "utf8",
    "ascii": "utf8", "latin1": "latin1", "gbk": "gbk",
    "sjis": "sjis", "cp932": "cp932",
    "binary": "binary",
}
_MBMAXLEN = {"utf8mb4": 4, "utf8mb3": 3, "utf8": 3, "ascii": 1,
             "latin1": 1, "gbk": 2, "sjis": 2, "cp932": 2, "binary": 1}

_COLUMN_CHARSET_RE = re.compile(
    r"\b(?:character\s+set|charset)\s+(?P<cs>`?\w+`?)", re.IGNORECASE
)


def _norm_charset(cs: str, where: str) -> str:
    low = _strip_quotes(cs).lower()
    if low not in _CHARSET_NORM:
        raise ValueError(
            f"{where}: character set {low!r} is outside this engine's "
            "codec space (supported: "
            f"{sorted(_CHARSET_NORM)})"
        )
    return low


def _field_from_type(
    name: str, type_sql: str, default_charset: str = "utf8mb4"
) -> T.StructField:
    """One column definition's TYPE portion -> StructField with the
    engine's metadata conventions. Raises pointedly on types outside
    the codec's space rather than guessing a layout."""
    m = _TYPE_RE.match(type_sql)
    if not m:
        raise ValueError(f"column {name!r}: cannot parse type {type_sql!r}")
    ty = m.group("type").lower()
    args = m.group("args")
    rest = m.group("rest") or ""
    unsigned = bool(_UNSIGNED_RE.search(rest))
    csm = _COLUMN_CHARSET_RE.search(rest)
    mysql_cs = _norm_charset(
        csm.group("cs") if csm else default_charset, f"column {name!r}"
    )
    charset = _CHARSET_NORM[mysql_cs]  # engine decode path: utf8|latin1
    mbmax = _MBMAXLEN[mysql_cs]

    def f(dt, md=None):
        return T.StructField(name, dt, True, metadata=md or {})

    if ty in ("tinyint", "bool", "boolean"):
        if unsigned:
            return f(T.ShortType(), {"mysql_type": "tinyint_unsigned"})
        return f(T.ByteType())
    if ty == "smallint":
        if unsigned:
            return f(T.IntegerType(), {"mysql_type": "smallint_unsigned"})
        return f(T.ShortType())
    if ty == "mediumint":
        if unsigned:
            return f(T.IntegerType(), {"mysql_type": "mediumint_unsigned"})
        return f(T.IntegerType(), {"mysql_type": "mediumint"})
    if ty in ("int", "integer"):
        if unsigned:
            return f(T.LongType(), {"mysql_type": "int_unsigned"})
        return f(T.IntegerType())
    if ty == "bigint":
        if unsigned:
            return f(T.LongType(), {"mysql_type": "bigint_unsigned"})
        return f(T.LongType())
    if ty == "float":
        return f(T.FloatType())
    if ty in ("double", "real"):
        return f(T.DoubleType())
    if ty in ("decimal", "numeric"):
        p, s = 10, 0
        if args:
            parts = [a.strip() for a in args.split(",")]
            p = int(parts[0])
            s = int(parts[1]) if len(parts) > 1 else 0
        return f(T.DecimalType(p, s))
    if ty == "varchar":
        n = int(args) if args else 255
        if charset == "binary":
            return f(T.BinaryType())  # VARBINARY in disguise
        # varchar_len is the max BYTE length (chars x charset mbmaxlen)
        md = {"varchar_len": min(n * mbmax, 65535)}
        if charset != "utf8":
            md["charset"] = charset
        return f(T.StringType(), md)
    if ty == "char":
        n = int(args) if args else 1
        if charset == "binary":
            return f(T.BinaryType())  # BINARY(n) in disguise
        md = {"mysql_type": "char", "char_len": n, "char_bytes": n * mbmax}
        if charset != "utf8":
            md["charset"] = charset
        return f(T.StringType(), md)
    if ty in ("blob", "tinyblob", "mediumblob", "longblob", "varbinary",
              "binary"):
        return f(T.BinaryType())
    if ty in ("text", "tinytext", "mediumtext", "longtext"):
        if charset == "binary":
            return f(T.BinaryType())  # a BLOB in disguise
        # BLOB wire code with a character set (utf8 or latin1)
        md = {"mysql_type": "text"}
        if charset != "utf8":
            md["charset"] = charset
        return f(T.StringType(), md)
    if ty == "date":
        return f(T.DateType())
    if ty == "datetime":
        fsp = int(args) if args else 0
        return f(T.TimestampType(), {"fsp": fsp})
    if ty == "timestamp":
        # a real server binlog carries TIMESTAMP under wire code 17
        # (TIMESTAMP2: 4-byte big-endian UTC seconds + packed
        # fraction), not DATETIME2's code 18 — distinct metadata routes
        # _cols_from_schema to that codec so a DDL-learned schema
        # passes the TABLE_MAP type check on a genuine stream
        # (advisor finding, round 13)
        fsp = int(args) if args else 0
        return f(T.TimestampType(), {"mysql_type": "timestamp", "fsp": fsp})
    if ty == "time":
        fsp = int(args) if args else 0
        return f(T.StringType(), {"mysql_type": "time", "fsp": fsp})
    if ty == "year":
        return f(T.IntegerType(), {"mysql_type": "year"})
    if ty == "bit":
        bits = int(args) if args else 1
        return f(T.LongType(), {"mysql_type": "bit", "bits": bits})
    if ty == "enum":
        return f(
            T.StringType(),
            {"mysql_type": "enum", "values": _parse_enum_values(args or "")},
        )
    if ty == "set":
        return f(
            T.StringType(),
            {"mysql_type": "set", "values": _parse_enum_values(args or "")},
        )
    if ty == "json":
        return f(T.StringType(), {"mysql_type": "json"})
    if ty == "geometry":
        return f(T.BinaryType(), {"mysql_type": "geometry"})
    raise ValueError(
        f"column {name!r}: MySQL type {ty!r} is outside this engine's "
        "codec space"
    )


_CREATE_RE = re.compile(
    r"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?"
    r"(?P<name>(?:`[^`]+`|\w+)(?:\s*\.\s*(?:`[^`]+`|\w+))?)\s*"
    r"\((?P<body>.*)\)\s*(?P<tail>[^)]*)$",
    re.IGNORECASE | re.DOTALL,
)


_TABLE_CHARSET_RE = re.compile(
    r"\b(?:default\s+)?(?:character\s+set|charset)\s*=?\s*(?P<cs>`?\w+`?)",
    re.IGNORECASE,
)


def _parse_create_full(ddl: str) -> tuple[str, T.StructType, str]:
    """CREATE TABLE -> (table_name, StructType, table_default_charset).
    The charset is the MySQL name (utf8mb4/latin1/...), needed to
    resolve later ALTER ... ADD/MODIFY column definitions that carry
    no per-column CHARACTER SET."""
    m = _CREATE_RE.match(ddl.strip().rstrip(";"))
    if not m:
        raise ValueError(f"not a CREATE TABLE statement: {ddl[:80]!r}")
    name = ".".join(
        _strip_quotes(p) for p in re.split(r"\s*\.\s*", m.group("name"))
    )
    tail = m.group("tail") or ""
    tm = _TABLE_CHARSET_RE.search(tail)
    default_cs = "utf8mb4"
    if tm:
        default_cs = _norm_charset(tm.group("cs"), f"table {name}")
    fields = []
    for part in _split_top_level(m.group("body")):
        head = part.split(None, 1)[0].lower().strip("`\"")
        if head in _CONSTRAINT_HEADS:
            continue
        toks = part.split(None, 1)
        if len(toks) < 2:
            raise ValueError(f"cannot parse column definition {part!r}")
        col = _strip_quotes(toks[0])
        fields.append(_field_from_type(col, toks[1], default_cs))
    if not fields:
        raise ValueError(f"CREATE TABLE {name}: no columns parsed")
    return name, T.StructType(fields), default_cs


def parse_mysql_create(ddl: str) -> tuple[str, T.StructType]:
    """CREATE TABLE statement -> (table_name, StructType). Table-level
    constraint clauses (PRIMARY KEY/KEY/UNIQUE/CONSTRAINT/...) are
    skipped; column attributes that do not change the row layout are
    ignored."""
    name, schema, _ = _parse_create_full(ddl)
    return name, schema


_ALTER_RE = re.compile(
    r"^\s*alter\s+table\s+(?P<name>(?:`[^`]+`|\w+)"
    r"(?:\s*\.\s*(?:`[^`]+`|\w+))?)\s+(?P<ops>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _pop_position(rest: str) -> tuple[str, str | None]:
    """Strip a trailing FIRST / AFTER <col> clause from a column
    definition; returns (definition, position_clause|None)."""
    pm = re.search(
        r"\s+(first|after\s+(?:`[^`]+`|\w+))\s*$", rest, re.IGNORECASE
    )
    if pm:
        return rest[: pm.start()], pm.group(1)
    return rest, None


def _insert_at(fields: list, fld, pos: str | None, replace_idx: int | None):
    """Place fld per MySQL's positioning rules: FIRST / AFTER <col>
    reposition; no clause keeps the column in place (MODIFY/CHANGE) or
    appends (ADD, replace_idx=None). Entries are ``(StructField, id)``
    pairs — the id is the column's IDENTITY, stable across
    MODIFY/CHANGE/RENAME, which is what lets a multi-generation decode
    surface an old generation's values under the latest names."""
    if pos is None:
        if replace_idx is None:
            fields.append(fld)
        else:
            fields.insert(replace_idx, fld)
        return
    if pos.lower() == "first":
        fields.insert(0, fld)
        return
    anchor = _strip_quotes(pos.split(None, 1)[1])
    idx = next(
        (i for i, f0 in enumerate(fields) if f0[0].name == anchor), None
    )
    if idx is None:
        raise ValueError(f"ALTER ... AFTER {anchor!r}: no such column")
    fields.insert(idx + 1, fld)


def apply_mysql_alter(
    schema: T.StructType, ddl: str, default_charset: str = "utf8mb4"
) -> T.StructType:
    """Replay one ALTER TABLE statement onto a schema. Supported ops:
    ADD COLUMN (appends; FIRST/AFTER reposition like the server does),
    DROP COLUMN, MODIFY COLUMN (in-place type rewrite, optional
    reposition), CHANGE COLUMN (rename + type, optional reposition)
    and RENAME COLUMN old TO new. Table-level RENAME raises pointedly
    here — a bare schema has no name to move; ``SchemaHistory``
    follows table renames (including the RENAME TABLE swap every
    online migration ends with). The server rebuilds the row image
    under the new layout from the ALTER onward — which is exactly
    what replaying these ops into the decode schema gives a reader
    (the reference gets this free from the live data dictionary,
    Field::unpack via binlog_table_reader.cc:151-156; its own
    rename_table handler refuses outright, HA_ERR_WRONG_COMMAND at
    binlogdb.cc:784-788)."""
    pairs = [(f, i) for i, f in enumerate(schema.fields)]
    pairs, _, renamed_to, _new_cs = _apply_alter_pairs(
        pairs, ddl, default_charset, len(pairs)
    )
    if renamed_to is not None:
        raise ValueError(
            "ALTER TABLE ... RENAME [TO] <table> is outside the bare "
            "schema replay (a StructType has no table name to move); "
            "fold through SchemaHistory, which follows renames"
        )
    return T.StructType([f for f, _ in pairs])


def _convert_field_charset(f: T.StructField, cs: str) -> T.StructField:
    """CONVERT TO CHARACTER SET's effect on one column: every string
    column's charset moves to ``cs`` (CHAR/VARCHAR byte widths follow
    the new mbmaxlen, char lengths preserved — MySQL's documented
    behavior); binary/blob/json/numeric columns are untouched; ENUM and
    SET re-collate but their wire pack width is member-COUNT-based, so
    the row layout is unchanged."""
    if not isinstance(f.dataType, T.StringType):
        return f
    md = dict(f.metadata or {})
    kind = md.get("mysql_type")
    engine_cs = _CHARSET_NORM[cs]
    mbmax = _MBMAXLEN[cs]
    old = md.get("charset", "utf8")
    if kind == "char":
        md["char_bytes"] = int(md.get("char_len", 1)) * mbmax
    elif kind in ("enum", "set", "json", "time"):
        return f  # pack width / text form unaffected by charset
    elif kind == "text":
        pass  # charset swap below
    elif kind is None:
        # VARCHAR: varchar_len is the max BYTE length — preserve the
        # CHAR length across the conversion. Engine charset names map
        # 1:1 onto an mbmaxlen (utf8 counts as utf8mb4's worst case).
        old_mb = {"utf8": 4, "latin1": 1, "gbk": 2, "sjis": 2,
                  "cp932": 2}[old]
        chars = max(1, int(md.get("varchar_len", 255)) // old_mb)
        md["varchar_len"] = min(chars * mbmax, 65535)
    else:
        return f
    if engine_cs == "utf8":
        md.pop("charset", None)
    else:
        md["charset"] = engine_cs
    return T.StructField(f.name, f.dataType, f.nullable, metadata=md)


def _apply_alter_pairs(
    pairs: list, ddl: str, default_charset: str, next_id: int
) -> tuple[list, int, str | None, str | None]:
    """apply_mysql_alter's engine over ``(StructField, id)`` pairs.
    ADD allocates a fresh id; MODIFY/CHANGE/RENAME keep the column's
    id (MySQL rewrites the field in place — same column, new surface);
    DROP retires the id. A table-level RENAME [TO|AS] op is reported,
    not applied (the caller owns the name). CONVERT TO CHARACTER SET
    rewrites every string column's charset + byte widths; a bare
    [DEFAULT] CHARACTER SET option changes only the default for FUTURE
    columns — both report the new default. Returns
    (new pairs, next unallocated id, renamed_to|None,
    new_default_charset|None)."""
    m = _ALTER_RE.match(ddl.strip().rstrip(";"))
    if not m:
        raise ValueError(f"not an ALTER TABLE statement: {ddl[:80]!r}")
    fields = list(pairs)
    renamed_to: str | None = None
    new_default: str | None = None
    cur_default = default_charset  # charset ops apply to LATER ops too
    for op in _split_top_level(m.group("ops")):
        toks = op.split()
        verb = toks[0].lower()
        if verb == "convert":
            # CONVERT TO CHARACTER SET cs [COLLATE ...]: every string
            # column's charset (and byte widths) moves — a LAYOUT
            # change the decode must see, not a table option
            cm = re.match(
                r"convert\s+to\s+(?:character\s+set|charset)\s+"
                r"(?P<cs>`?\w+`?)",
                op,
                re.IGNORECASE,
            )
            if not cm:
                raise ValueError(f"cannot parse CONVERT {op!r}")
            cs = _norm_charset(
                cm.group("cs"), "CONVERT TO CHARACTER SET"
            )
            fields = [
                (_convert_field_charset(f, cs), i) for f, i in fields
            ]
            new_default = cur_default = cs
            continue
        if verb in ("default", "character", "charset"):
            # [DEFAULT] CHARACTER SET [=] cs: existing columns keep
            # their charsets; only FUTURE ADD COLUMNs inherit the new
            # default — silently dropping it would mis-decode those
            cm = _TABLE_CHARSET_RE.search(op)
            if cm:
                new_default = cur_default = _norm_charset(
                    cm.group("cs"), "ALTER TABLE ... CHARACTER SET"
                )
            continue
        if verb == "add":
            rest = op[len(toks[0]):].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            if rest.split(None, 1)[0].lower().strip("`\"") in (
                "index", "key", "unique", "constraint", "primary",
                "foreign",
            ):
                continue  # index DDL: no row-layout change
            rest, pos = _pop_position(rest)
            ctoks = rest.split(None, 1)
            if len(ctoks) < 2:
                raise ValueError(f"cannot parse ADD COLUMN {op!r}")
            fld = _field_from_type(
                _strip_quotes(ctoks[0]), ctoks[1], cur_default
            )
            _insert_at(fields, (fld, next_id), pos, None)
            next_id += 1
        elif verb == "drop":
            rest = op[len(toks[0]):].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            head = rest.split(None, 1)[0].lower().strip("`\"")
            if head in ("index", "key", "primary", "foreign", "constraint"):
                continue
            col = _strip_quotes(rest.split(None, 1)[0])
            before = len(fields)
            fields = [f0 for f0 in fields if f0[0].name != col]
            if len(fields) == before:
                raise ValueError(f"ALTER DROP COLUMN {col!r}: no such column")
        elif verb in ("modify", "change"):
            rest = op[len(toks[0]):].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            rest, pos = _pop_position(rest)
            if verb == "modify":
                # MODIFY [COLUMN] name type...: rewrite in place
                ctoks = rest.split(None, 1)
                if len(ctoks) < 2:
                    raise ValueError(f"cannot parse MODIFY COLUMN {op!r}")
                old = new = _strip_quotes(ctoks[0])
                type_sql = ctoks[1]
            else:
                # CHANGE [COLUMN] old new type...: rename + rewrite
                ctoks = rest.split(None, 2)
                if len(ctoks) < 3:
                    raise ValueError(f"cannot parse CHANGE COLUMN {op!r}")
                old, new = _strip_quotes(ctoks[0]), _strip_quotes(ctoks[1])
                type_sql = ctoks[2]
            idx = next(
                (i for i, f0 in enumerate(fields) if f0[0].name == old),
                None,
            )
            if idx is None:
                raise ValueError(
                    f"ALTER {verb.upper()} {old!r}: no such column"
                )
            fld = _field_from_type(new, type_sql, cur_default)
            keep_id = fields[idx][1]  # same column identity, new surface
            del fields[idx]
            _insert_at(fields, (fld, keep_id), pos, idx)
        elif verb == "rename":
            rest = op[len(toks[0]):].strip()
            head = rest.split(None, 1)[0].lower() if rest else ""
            if head == "column":
                # RENAME COLUMN old TO new: name-only, layout unchanged
                rm = re.match(
                    r"column\s+(?P<old>`[^`]+`|\w+)\s+to\s+"
                    r"(?P<new>`[^`]+`|\w+)\s*$",
                    rest,
                    re.IGNORECASE,
                )
                if not rm:
                    raise ValueError(f"cannot parse RENAME COLUMN {op!r}")
                old = _strip_quotes(rm.group("old"))
                new = _strip_quotes(rm.group("new"))
                idx = next(
                    (i for i, f0 in enumerate(fields) if f0[0].name == old),
                    None,
                )
                if idx is None:
                    raise ValueError(
                        f"ALTER RENAME COLUMN {old!r}: no such column"
                    )
                f0, fid = fields[idx]
                fields[idx] = (
                    T.StructField(
                        new, f0.dataType, f0.nullable, metadata=f0.metadata
                    ),
                    fid,
                )
            elif head in ("index", "key"):
                continue  # RENAME INDEX: no row-layout change
            else:
                # ALTER TABLE t RENAME [TO|AS] new_name — table-level
                # rename; no row-layout change, the NAME moves
                rm = re.match(
                    r"(?:to\s+|as\s+)?(?P<new>(?:`[^`]+`|\w+)"
                    r"(?:\s*\.\s*(?:`[^`]+`|\w+))?)\s*$",
                    rest,
                    re.IGNORECASE,
                )
                if not rm:
                    raise ValueError(f"cannot parse RENAME {op!r}")
                renamed_to = ".".join(
                    _strip_quotes(p)
                    for p in re.split(r"\s*\.\s*", rm.group("new"))
                )
        else:
            # table options (ENGINE=, AUTO_INCREMENT=, comment...) —
            # no layout change
            continue
    return fields, next_id, renamed_to, new_default


_RENAME_TABLE_RE = re.compile(
    r"^\s*rename\s+table\s+(?P<pairs>.*)$", re.IGNORECASE | re.DOTALL
)
_CREATE_LIKE_RE = re.compile(
    r"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?"
    r"(?P<name>(?:`[^`]+`|\w+)(?:\s*\.\s*(?:`[^`]+`|\w+))?)\s+"
    r"\(?\s*like\s+(?P<src>(?:`[^`]+`|\w+)(?:\s*\.\s*(?:`[^`]+`|\w+))?)"
    r"\s*\)?\s*$",
    re.IGNORECASE,
)
_IF_NOT_EXISTS_RE = re.compile(
    r"^\s*create\s+table\s+if\s+not\s+exists\b", re.IGNORECASE
)
_DROP_TABLE_RE = re.compile(
    r"^\s*drop\s+(?:temporary\s+)?tables?\s+(?:if\s+exists\s+)?"
    r"(?P<names>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_RENAME_PAIR_RE = re.compile(
    r"^\s*(?P<old>(?:`[^`]+`|\w+)(?:\s*\.\s*(?:`[^`]+`|\w+))?)\s+to\s+"
    r"(?P<new>(?:`[^`]+`|\w+)(?:\s*\.\s*(?:`[^`]+`|\w+))?)\s*$",
    re.IGNORECASE,
)


class SchemaHistory:
    """Stateful fold of a database's DDL history with column
    identities, tracking ONE table of interest — the object a
    multi-generation binlog decode carries alongside the event walk
    (``decode_binlog_bytes(..., schema_history=...)``).

    ``apply(statement)`` replays CREATE/ALTER/RENAME TABLE statements:
    those naming the tracked table (bare or db-qualified match, same
    rules as ``schema_from_ddl_history``) fold into the tracked
    generations; every OTHER table's CREATE/ALTER folds into a side
    registry so a later rename can move it INTO the tracked name.
    Returns True when the tracked table's row layout OR name changed —
    the reader's cue to rebuild its TABLE_MAP resolution.

    Table-level renames follow MySQL's semantics and the two shapes
    real migrations produce:

    - ``ALTER TABLE t RENAME TO u`` / single-pair ``RENAME TABLE t TO
      u`` of the tracked table: the fold FOLLOWS the name (the logical
      table keeps streaming under its new name; the reference refuses
      rename outright — HA_ERR_WRONG_COMMAND, binlogdb.cc:784-788).
    - the gh-ost/pt-osc cut-over ``RENAME TABLE orders TO _old,
      _ghost TO orders`` (one atomic statement renaming the tracked
      name away AND another table into it): the fold stays on the
      NAME, the ghost's layout becomes the new generation, and ghost
      columns INHERIT the identity of same-named tracked columns — so
      rows decoded before the cut-over surface their values under the
      migrated layout, exactly Debezium's behavior across an online
      schema migration.

    ``schema`` is the current generation's StructType; ``ids`` the
    parallel column-identity tuple. An id is allocated by CREATE /
    ADD COLUMN and survives MODIFY/CHANGE/RENAME (and, by name, the
    cut-over swap), so two generations' positions can be joined on
    identity to surface an old generation's values under the LATEST
    names (Debezium's schema-history contract; the reference cannot
    do any of this — it default-skips QUERY events,
    binlog_table_reader.cc:427-428)."""

    def __init__(self, table: str, database: str | None = None):
        self._want = (
            f"{database}.{table}".lower() if database else table.lower()
        )
        self._qualified = "." in self._want
        self._pairs: list | None = None
        self._charset = "utf8mb4"
        self.generation = 0  # bumps on every layout change
        self._next_id = 0  # monotone, never reused — but a table-level
        # re-CREATE (and the cut-over swap) JOINS same-named columns
        # back to their old identities explicitly, so a logical
        # table's history survives DROP+CREATE the way Debezium's
        # topic does; only column-level DROP+re-ADD retires for good
        self._prev_pairs: list | None = None  # stashed across DROP
        self._last_create: str | None = None  # re-statement guard
        # every OTHER table whose CREATE streamed past: resolved name
        # -> {"pairs", "charset", "last_create"} — the candidates a
        # RENAME TABLE can move into the tracked name. Ids come off
        # the SAME counter as the tracked table's, so a swap-in can
        # never collide identities.
        self._tables: dict[str, dict] = {}

    def _norm_name(self, name: str, default_db: str | None = None) -> str:
        low = name.lower()
        if "." not in low and default_db:
            low = f"{default_db.lower()}.{low}"
        return low

    def _reg_key(self, name: str, default_db: str | None) -> str | None:
        """Resolve a statement's table name to its side-registry key
        (exact resolved match, else a unique bare-name match across
        qualification styles)."""
        res = self._norm_name(name, default_db)
        if res in self._tables:
            return res
        bare = res.split(".")[-1]
        cands = [
            k
            for k in self._tables
            if k.split(".")[-1] == bare and ("." not in k or "." not in res)
        ]
        if len(cands) > 1:
            raise ValueError(
                f"table name {name!r} is ambiguous in the schema "
                f"history (candidates: {sorted(cands)})"
            )
        return cands[0] if cands else None

    def _tracked_state(self) -> dict:
        return {
            "pairs": self._pairs,
            "charset": self._charset,
            "last_create": self._last_create,
        }

    def _swap_in(self, state: dict) -> None:
        """A different table just arrived at the tracked name (the
        online-migration cut-over): its layout becomes the new
        generation, and its columns inherit the identity of same-named
        columns in the outgoing generation — the join that carries
        pre-cut-over values into the migrated layout."""
        old_by_name = {f.name: i for f, i in (self._pairs or [])}
        self._pairs = [
            (f, old_by_name.get(f.name, i)) for f, i in state["pairs"]
        ]
        self._charset = state["charset"]
        self._last_create = state.get("last_create")
        self.generation += 1

    def matches_current(self, db: str, table: str) -> bool:
        """Does a TABLE_MAP's (db, table) name the tracked table RIGHT
        NOW? Follows table-level renames — after ``ALTER TABLE t
        RENAME TO u`` the reader captures rows logged under ``u``; a
        cut-over swap keeps capturing the original name."""
        return self._matches(f"{db}.{table}" if db else table)

    def _matches(self, name: str, default_db: str | None = None) -> bool:
        # A db-qualified request must match exactly — bare-suffix
        # matching would let a same-named table in ANOTHER database
        # silently overwrite the tracked schema (advisor finding,
        # round 13). Suffix matching applies only to unqualified
        # requests (a single-database history). ``default_db`` is the
        # Query event's session database — a real server logs
        # unqualified DDL plus the db it ran against, so the reader
        # qualifies with it before comparing.
        low = name.lower()
        if self._qualified:
            if "." not in low and default_db:
                low = f"{default_db.lower()}.{low}"
            return low == self._want
        return low.split(".")[-1] == self._want

    @property
    def schema(self) -> T.StructType | None:
        if self._pairs is None:
            return None
        return T.StructType([f for f, _ in self._pairs])

    @property
    def ids(self) -> tuple[int, ...]:
        return tuple(i for _, i in self._pairs or ())

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(f.name for f, _ in self._pairs or ())

    def apply(self, statement: str, default_db: str | None = None) -> bool:
        s = statement.strip()
        low = s.lower()
        if low.startswith("create table"):
            ine = bool(_IF_NOT_EXISTS_RE.match(s))
            lm = _CREATE_LIKE_RE.match(s.rstrip(";"))
            if lm:
                # CREATE TABLE x [(]LIKE y[)] — clone y's LAYOUT with
                # fresh identities (how every gh-ost migration makes
                # its ghost). The source must be in the history.
                name = ".".join(
                    _strip_quotes(p)
                    for p in re.split(r"\s*\.\s*", lm.group("name"))
                )
                src = ".".join(
                    _strip_quotes(p)
                    for p in re.split(r"\s*\.\s*", lm.group("src"))
                )
                if self._matches(src, default_db):
                    if self._pairs is None:
                        raise ValueError(
                            f"CREATE TABLE ... LIKE {src}: the source "
                            "has no CREATE in the history"
                        )
                    src_pairs, src_cs = self._pairs, self._charset
                else:
                    skey = self._reg_key(src, default_db)
                    if skey is None:
                        raise ValueError(
                            f"CREATE TABLE ... LIKE {src}: the source "
                            "table is not in the schema history"
                        )
                    src_pairs = self._tables[skey]["pairs"]
                    src_cs = self._tables[skey]["charset"]
                clone = [
                    (f, self._next_id + j)
                    for j, (f, _) in enumerate(src_pairs)
                ]
                if self._matches(name, default_db):
                    if self._pairs is not None and ine:
                        return False  # IF NOT EXISTS: server no-op
                    base = (
                        self._pairs if self._pairs is not None
                        else self._prev_pairs
                    )
                    if base:  # re-CREATE: join identities by name
                        old_by_name = {f.name: i for f, i in base}
                        clone = [
                            (f, old_by_name.get(f.name, i))
                            for f, i in clone
                        ]
                    self._pairs = clone
                    self._prev_pairs = None
                    self._next_id += len(clone)
                    self._charset = src_cs
                    self._last_create = s
                    self.generation += 1
                    return True
                key = self._reg_key(name, default_db) or self._norm_name(
                    name, default_db
                )
                if key in self._tables and ine:
                    return False
                self._tables[key] = {
                    "pairs": clone, "charset": src_cs, "last_create": s,
                }
                self._next_id += len(clone)
                return False
            name, sch, cs = _parse_create_full(s)
            if not self._matches(name, default_db):
                # another table in the database: register it so a
                # later RENAME TABLE can move it into the tracked name
                key = self._reg_key(name, default_db) or self._norm_name(
                    name, default_db
                )
                st = self._tables.get(key)
                if st is not None and ine:
                    return False  # IF NOT EXISTS on an existing table
                if (
                    st is not None
                    and s == st.get("last_create")
                    and T.StructType([f for f, _ in st["pairs"]]) == sch
                ):
                    return False  # exact re-statement (same rule below)
                self._tables[key] = {
                    "pairs": [
                        (f, self._next_id + i)
                        for i, f in enumerate(sch.fields)
                    ],
                    "charset": cs,
                    "last_create": s,
                }
                self._next_id += len(sch.fields)
                return False
            if self._pairs is not None and ine:
                # CREATE TABLE IF NOT EXISTS over a live table is a
                # server-side NO-OP regardless of the declared layout —
                # resetting here would retire every identity
                return False
            if (
                self._pairs is not None
                and s == self._last_create
                and sch == self.schema
            ):
                # an exact RE-STATEMENT of the applied CREATE (a
                # self-describing blob re-declaring its generation, a
                # replayed log segment) must NOT open a new generation
                # — fresh identities would remap every previously
                # decoded row to all-NULL (advisor finding, round 14).
                # A genuine re-CREATE (different text or a layout that
                # drifted through ALTERs) still opens a new generation;
                # callers replaying CREATE+ALTER prefixes must dedupe
                # the re-stated suffix before seeding.
                return False
            fresh = [
                (f, self._next_id + i) for i, f in enumerate(sch.fields)
            ]
            base = (
                self._pairs if self._pairs is not None
                else self._prev_pairs
            )
            if base:
                # table-level re-CREATE (incl. after a DROP): columns
                # matching the previous live generation BY NAME inherit
                # its identities — the logical table continues, exactly
                # Debezium's contract across DROP+CREATE. Brand-new
                # names keep their fresh ids.
                old_by_name = {f.name: i for f, i in base}
                fresh = [
                    (f, old_by_name.get(f.name, i)) for f, i in fresh
                ]
            self._pairs = fresh
            self._prev_pairs = None
            self._last_create = s
            self._next_id += len(sch.fields)
            self._charset = cs
            self.generation += 1
            return True
        if low.startswith("alter table"):
            m = _ALTER_RE.match(s.rstrip(";"))
            if not m:
                return False
            name = ".".join(
                _strip_quotes(p)
                for p in re.split(r"\s*\.\s*", m.group("name"))
            )
            if self._matches(name, default_db):
                if self._pairs is None:
                    raise ValueError(
                        f"ALTER before CREATE for table {self._want!r} "
                        "in the DDL history"
                    )
                new_pairs, self._next_id, renamed_to, new_cs = (
                    _apply_alter_pairs(
                        list(self._pairs), s, self._charset, self._next_id
                    )
                )
                changed = new_pairs != self._pairs
                self._pairs = new_pairs
                if new_cs is not None:
                    # CONVERT / DEFAULT CHARSET: future ADD COLUMNs
                    # inherit the new table default
                    self._charset = new_cs
                if renamed_to is not None:
                    # ALTER TABLE t RENAME TO u: the fold follows the
                    # name — layout unchanged, but the reader must
                    # re-aim its TABLE_MAP filter
                    self._want = self._norm_name(renamed_to, default_db)
                    self._qualified = "." in self._want
                    changed = True
                if changed:
                    self.generation += 1
                return changed
            # a non-tracked table's ALTER: keep its registry entry
            # current (it may be renamed into the tracked name later)
            key = self._reg_key(name, default_db)
            if key is None:
                return False  # outside the history entirely
            st = self._tables[key]
            st["pairs"], self._next_id, renamed_to, new_cs = (
                _apply_alter_pairs(
                    list(st["pairs"]), s, st["charset"], self._next_id
                )
            )
            if new_cs is not None:
                st["charset"] = new_cs
            if renamed_to is not None:
                del self._tables[key]
                if self._matches(renamed_to, default_db):
                    self._swap_in(st)  # renamed INTO the tracked name
                    return True
                self._tables[self._norm_name(renamed_to, default_db)] = st
            return False
        rm = _RENAME_TABLE_RE.match(s.rstrip(";"))
        if rm:
            return self._apply_rename_table(rm.group("pairs"), default_db)
        dm = _DROP_TABLE_RE.match(s.rstrip(";"))
        if dm:
            # DROP TABLE a[, b...]: a dropped tracked table clears the
            # layout (a later TABLE_MAP under its name raises pointedly
            # until a re-CREATE opens a fresh-identity generation; rows
            # decoded BEFORE the drop keep surfacing under the last
            # live generation); dropped registry entries just leave.
            changed = False
            for part in _split_top_level(dm.group("names")):
                nm = ".".join(
                    _strip_quotes(p)
                    for p in re.split(
                        r"\s*\.\s*", part.split(None, 1)[0]
                    )
                )
                if self._matches(nm, default_db):
                    if self._pairs is not None:
                        self._prev_pairs = self._pairs  # a re-CREATE
                        # joins same-named columns back by identity
                        self._pairs = None
                        self._last_create = None
                        self.generation += 1
                        changed = True
                else:
                    key = self._reg_key(nm, default_db)
                    if key is not None:
                        del self._tables[key]
            return changed
        # BEGIN/COMMIT/DML/other framing — TRUNCATE TABLE lands here
        # too: it rewrites data, never the row-image layout
        return False

    def _apply_rename_table(
        self, pairs_txt: str, default_db: str | None
    ) -> bool:
        """One atomic RENAME TABLE a TO b[, c TO d, ...] statement —
        MySQL applies every pair as one atomic metadata swap, which is
        exactly how online migrations cut over."""
        renames: list[tuple[str, str]] = []
        for part in _split_top_level(pairs_txt):
            pm = _RENAME_PAIR_RE.match(part)
            if not pm:
                raise ValueError(f"cannot parse RENAME TABLE pair {part!r}")
            renames.append(
                tuple(
                    ".".join(
                        _strip_quotes(p)
                        for p in re.split(r"\s*\.\s*", pm.group(g))
                    )
                    for g in ("old", "new")
                )
            )
        tracked_out: dict | None = None
        tracked_out_new: str | None = None
        incoming: dict | None = None
        staged: list[tuple[str, dict]] = []
        for old, new in renames:
            old_is_tracked = self._matches(old, default_db)
            new_is_tracked = self._matches(new, default_db)
            if old_is_tracked and new_is_tracked:
                continue  # rename onto itself: nothing moves
            if old_is_tracked:
                tracked_out = self._tracked_state()
                tracked_out_new = self._norm_name(new, default_db)
                continue
            key = self._reg_key(old, default_db)
            state = self._tables.pop(key) if key is not None else None
            if new_is_tracked:
                if state is None:
                    raise ValueError(
                        f"RENAME TABLE {old} TO {new}: the table "
                        "renamed into the tracked name has no CREATE "
                        "in the schema history"
                    )
                incoming = state
            elif state is not None:
                staged.append((self._norm_name(new, default_db), state))
        for key, state in staged:
            self._tables[key] = state
        if incoming is not None:
            if tracked_out is not None:
                # the cut-over swap: the tracked NAME keeps streaming,
                # the outgoing layout parks under its new name
                self._tables[tracked_out_new] = tracked_out
            elif self._pairs is not None:
                raise ValueError(
                    "RENAME TABLE moved a table onto the tracked name "
                    f"{self._want!r} while it still exists — MySQL "
                    "would reject this statement"
                )
            self._swap_in(incoming)
            return True
        if tracked_out is not None:
            # tracked table renamed away with nothing arriving: the
            # fold FOLLOWS the logical table to its new name
            self._want = tracked_out_new
            self._qualified = "." in self._want
            self.generation += 1
            return True
        return False


def schema_from_ddl_history(
    statements: list[str], table: str
) -> T.StructType:
    """Fold an ordered DDL statement list into the LATEST schema of
    one table (bare or db-qualified name match). BEGIN/COMMIT and
    other tables' DDL are ignored. Decoding with the latest schema
    rides the reader's prefix generation handling for ADD-COLUMN
    histories; a history carrying MODIFY/CHANGE/RENAME needs the
    per-generation resolution of ``SchemaHistory`` +
    ``decode_binlog_bytes(schema_history=...)``."""
    hist = SchemaHistory(table)
    for stmt in statements:
        hist.apply(stmt)
    schema = hist.schema
    if schema is None:
        raise ValueError(f"no CREATE TABLE for {table!r} in the DDL history")
    return schema
