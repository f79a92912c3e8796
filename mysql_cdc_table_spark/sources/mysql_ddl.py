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


def _strip_quotes(tok: str) -> str:
    tok = tok.strip()
    if tok[:1] in "`\"'" and tok[-1:] == tok[:1]:
        return tok[1:-1]
    return tok


def _split_top_level(s: str) -> list[str]:
    """Split a CREATE TABLE body on top-level commas (parentheses and
    quoted strings are opaque)."""
    out, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n:
                if s[i] == q:
                    # MySQL doubles quotes inside literals ('it''s')
                    if i + 1 < n and s[i + 1] == q:
                        i += 2
                        continue
                    break
                i += 1
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
    vals = []
    for part in _split_top_level(args):
        vals.append(_strip_quotes(part))
    return vals


def _field_from_type(name: str, type_sql: str) -> T.StructField:
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
        # varchar_len is the max BYTE length (utf8mb4: 4 B/char)
        return f(T.StringType(), {"varchar_len": min(n * 4, 65535)})
    if ty == "char":
        n = int(args) if args else 1
        return f(T.StringType(), {"mysql_type": "char", "char_len": n})
    if ty in ("blob", "tinyblob", "mediumblob", "longblob", "varbinary",
              "binary"):
        return f(T.BinaryType())
    if ty in ("text", "tinytext", "mediumtext", "longtext"):
        # BLOB wire code with a character set; utf-8 on modern servers
        return f(T.StringType(), {"mysql_type": "text"})
    if ty == "date":
        return f(T.DateType())
    if ty in ("datetime", "timestamp"):
        # both decode through the DATETIME2 path this engine's writer
        # emits for TimestampType (a real TIMESTAMP2 wire column is
        # the same 4+frac layout under code 17 — outside the declared-
        # schema space today, same as the user-declared path)
        fsp = int(args) if args else 0
        return f(T.TimestampType(), {"fsp": fsp})
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


def parse_mysql_create(ddl: str) -> tuple[str, T.StructType]:
    """CREATE TABLE statement -> (table_name, StructType). Table-level
    constraint clauses (PRIMARY KEY/KEY/UNIQUE/CONSTRAINT/...) are
    skipped; column attributes that do not change the row layout are
    ignored."""
    m = _CREATE_RE.match(ddl.strip().rstrip(";"))
    if not m:
        raise ValueError(f"not a CREATE TABLE statement: {ddl[:80]!r}")
    name = ".".join(
        _strip_quotes(p) for p in re.split(r"\s*\.\s*", m.group("name"))
    )
    fields = []
    for part in _split_top_level(m.group("body")):
        head = part.split(None, 1)[0].lower().strip("`\"")
        if head in _CONSTRAINT_HEADS:
            continue
        toks = part.split(None, 1)
        if len(toks) < 2:
            raise ValueError(f"cannot parse column definition {part!r}")
        col = _strip_quotes(toks[0])
        fields.append(_field_from_type(col, toks[1]))
    if not fields:
        raise ValueError(f"CREATE TABLE {name}: no columns parsed")
    return name, T.StructType(fields)


_ALTER_RE = re.compile(
    r"^\s*alter\s+table\s+(?P<name>(?:`[^`]+`|\w+)"
    r"(?:\s*\.\s*(?:`[^`]+`|\w+))?)\s+(?P<ops>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def apply_mysql_alter(schema: T.StructType, ddl: str) -> T.StructType:
    """Replay one ALTER TABLE statement onto a schema. Supported ops:
    ADD COLUMN (appends; FIRST/AFTER reposition like the server does)
    and DROP COLUMN. MODIFY/CHANGE/RENAME raise pointedly — a type
    rewrite needs a table copy the binlog shows as a new table anyway."""
    m = _ALTER_RE.match(ddl.strip().rstrip(";"))
    if not m:
        raise ValueError(f"not an ALTER TABLE statement: {ddl[:80]!r}")
    fields = list(schema.fields)
    for op in _split_top_level(m.group("ops")):
        toks = op.split()
        verb = toks[0].lower()
        if verb == "add":
            rest = op[len(toks[0]):].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            if rest.split(None, 1)[0].lower().strip("`\"") in (
                "index", "key", "unique", "constraint", "primary",
                "foreign",
            ):
                continue  # index DDL: no row-layout change
            pos = None  # append (the server default)
            pm = re.search(
                r"\s+(first|after\s+(?:`[^`]+`|\w+))\s*$", rest,
                re.IGNORECASE,
            )
            if pm:
                pos = pm.group(1)
                rest = rest[: pm.start()]
            ctoks = rest.split(None, 1)
            if len(ctoks) < 2:
                raise ValueError(f"cannot parse ADD COLUMN {op!r}")
            fld = _field_from_type(_strip_quotes(ctoks[0]), ctoks[1])
            if pos is None:
                fields.append(fld)
            elif pos.lower() == "first":
                fields.insert(0, fld)
            else:
                anchor = _strip_quotes(pos.split(None, 1)[1])
                idx = next(
                    (i for i, f0 in enumerate(fields) if f0.name == anchor),
                    None,
                )
                if idx is None:
                    raise ValueError(
                        f"ALTER ADD ... AFTER {anchor!r}: no such column"
                    )
                fields.insert(idx + 1, fld)
        elif verb == "drop":
            rest = op[len(toks[0]):].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            head = rest.split(None, 1)[0].lower().strip("`\"")
            if head in ("index", "key", "primary", "foreign", "constraint"):
                continue
            col = _strip_quotes(rest.split(None, 1)[0])
            before = len(fields)
            fields = [f0 for f0 in fields if f0.name != col]
            if len(fields) == before:
                raise ValueError(f"ALTER DROP COLUMN {col!r}: no such column")
        elif verb in ("modify", "change", "rename"):
            raise ValueError(
                f"ALTER {verb.upper()} is outside the schema-history "
                "replay (a layout rewrite; decode the stream in two "
                "generations instead)"
            )
        else:
            # table options (ENGINE=, AUTO_INCREMENT=, comment...) —
            # no layout change
            continue
    return T.StructType(fields)


def schema_from_ddl_history(
    statements: list[str], table: str
) -> T.StructType:
    """Fold an ordered DDL statement list into the LATEST schema of
    one table (bare or db-qualified name match). BEGIN/COMMIT and
    other tables' DDL are ignored; decoding with the latest schema
    rides the reader's existing generation handling (older TABLE_MAPs
    prefix-match, added columns surface as NULL)."""
    schema: T.StructType | None = None
    want = table.lower()

    def _matches(name: str) -> bool:
        low = name.lower()
        return low == want or low.split(".")[-1] == want.split(".")[-1]

    for stmt in statements:
        s = stmt.strip()
        low = s.lower()
        if low.startswith("create table"):
            name, sch = parse_mysql_create(s)
            if _matches(name):
                schema = sch
        elif low.startswith("alter table"):
            m = _ALTER_RE.match(s.rstrip(";"))
            if m and _matches(
                ".".join(
                    _strip_quotes(p)
                    for p in re.split(r"\s*\.\s*", m.group("name"))
                )
            ):
                if schema is None:
                    raise ValueError(
                        f"ALTER before CREATE for table {table!r} in the "
                        "DDL history"
                    )
                schema = apply_mysql_alter(schema, s)
    if schema is None:
        raise ValueError(f"no CREATE TABLE for {table!r} in the DDL history")
    return schema
