"""SurrealQL DML/DDL statement parser + executor.

Grammar sources: the reference's statement ASTs —
  CREATE  /root/reference/surrealdb/core/src/expr/statements/create.rs
  INSERT  .../insert.rs   UPDATE .../update.rs   UPSERT .../upsert.rs
  DELETE  .../delete.rs   RELATE .../relate.rs
  DEFINE  .../define/{table,field,function}.rs
behavior fixtures: /root/reference/language-tests/tests/language/statements/.

Each statement lowers onto the set-oriented ``dml.Database`` operations
(create/insert/update/upsert/delete/relate) — the Spark-first execution is
there; this module is only surface syntax → plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.dml import (Database, FieldDef, MutationError,
                                 TableDef)
from surrealdb_spark.functions.geometry import GEOM_T as _GEOM_T
from surrealdb_spark.sql.parser import Parser, Select, _parse_select_body


# -- statement ASTs ----------------------------------------------------------


@dataclass
class Target:
    table: str
    key: object | None = None  # record-id target tb:key
    mock: int | None = None    # CREATE |tb:n| bulk-mock target (mock.rs)
    mock_keys: list | None = None  # |tb:lo..hi| range form — explicit keys


@dataclass
class CreateStmt:
    target: Target
    data: tuple | None = None  # ("set",[(f,op,expr)]) | ("content",obj_ast)
    return_: str = "AFTER"
    only: bool = False         # CREATE ONLY — single-object output


@dataclass
class InsertStmt:
    table: str
    rows: list | None = None          # list of object ASTs
    select: Select | None = None      # INSERT INTO t (SELECT ...)
    on_duplicate: list = dc_field(default_factory=list)  # [(f,op,expr)]
    return_: str = "AFTER"
    ignore: bool = False              # INSERT IGNORE (insert.rs)


@dataclass
class UpdateStmt:
    target: Target
    data: tuple | None = None  # set/content/merge/patch
    where: tuple | None = None
    return_: str = "AFTER"
    upsert: bool = False
    only: bool = False          # UPDATE/UPSERT ONLY — single-object output
    # `UPSERT a:1, b:2 SET ...` — additional comma-separated targets
    extra_targets: list = dc_field(default_factory=list)
    explain: str | None = None  # EXPLAIN [FULL] — plan only, no mutation


@dataclass
class DeleteStmt:
    target: Target
    where: tuple | None = None
    return_: str = "NONE"
    explain: str | None = None  # DELETE ... EXPLAIN [FULL] (read-only)


@dataclass
class RelateStmt:
    from_expr: tuple
    edge: str
    to_expr: tuple
    data: tuple | None = None
    return_: str = "AFTER"
    edge_key: object | None = None  # RELATE a->edge:key->b explicit edge id


@dataclass
class DefineTableStmt:
    name: str
    schemafull: bool = False
    ttype: str = "ANY"           # TYPE ANY | NORMAL | RELATION (table.rs)
    enforced: bool = False       # TYPE RELATION ENFORCED (table.rs:151-156)
    rel_in: list | None = None   # TYPE RELATION IN/FROM tables
    rel_out: list | None = None  # TYPE RELATION OUT/TO tables
    drop: bool = False           # DROP table: writes are discarded
    mode: str | None = None      # OVERWRITE / IF NOT EXISTS
    perms_text: str = "NONE"     # canonical PERMISSIONS text for INFO
    changefeed: str | None = None
    # SELECT permission: "full" | "none" | WHERE-expr AST
    # (other verbs parsed-ignored: mutations go through dml.Database which
    # is owner-scoped in this engine)
    select_perm: object = "full"
    comment: str | None = None
    verb_perms: dict | None = None  # verb → canonical NONE/FULL/WHERE text
    # `AS SELECT ...` materialized-view definition (Select AST + raw text);
    # registered as a recompute-on-read view (catalog/aggregation.rs keeps
    # these incrementally — views.py is the at-scale incremental path)
    as_select: object = None
    as_text: str | None = None
    _type_set: bool = False  # explicit TYPE clause seen


@dataclass
class DefineFieldStmt:
    table: str
    name: str
    dtype: str | None = None
    default: tuple | None = None
    assert_: tuple | None = None
    value: tuple | None = None     # VALUE <expr> — recompute on write
    computed: tuple | None = None  # COMPUTED <expr> — evaluated on read
    flexible: bool = False
    kind_text: str | None = None   # raw TYPE text for INFO rendering
    texts: dict = dc_field(default_factory=dict)  # raw clause texts/flags
    mode: str | None = None        # OVERWRITE / IF NOT EXISTS


@dataclass
class DefineIndexStmt:
    name: str
    table: str
    mode: str | None = None     # OVERWRITE / IF NOT EXISTS
    fields: list = dc_field(default_factory=list)
    kind: str = "idx"           # idx | uniq | fulltext | hnsw | count
    analyzer: str | None = None
    dimension: int | None = None
    bm25: tuple | None = None   # (k1, b) when BM25 scoring declared
    highlights: bool = False
    initial_rows: int = 0       # rows indexed at (re)build (INFO building)
    dist: str | None = None     # HNSW DIST metric name
    vtype: str | None = None    # HNSW TYPE (F32 default — schema/index.rs)
    efc: int | None = None      # HNSW EFC (construction ef; plan default)
    concurrently: bool = False  # async build: failures surface via INFO
    build_error: str | None = None  # concurrent build failure message


@dataclass
class DefineBucketStmt:
    name: str
    backend: str = "memory"
    readonly: bool = False
    comment: str | None = None
    perms: str = "FULL"


@dataclass
class DefineAnalyzerStmt:
    name: str
    tokenizers: list = dc_field(default_factory=lambda: ["blank", "punct"])
    # no FILTERS clause → no filters: matching is case-SENSITIVE
    # (define/analyzer.rs — filters are opt-in)
    filters: list = dc_field(default_factory=list)
    # raw clause state for INFO canonical rendering (None = clause absent)
    raw_tokenizers: list | None = None
    raw_filters: list | None = None
    comment: str | None = None
    function: str | None = None  # FUNCTION fn::name preprocessing hook
    mode: str | None = None      # OVERWRITE / IF NOT EXISTS


@dataclass
class DefineFunctionStmt:
    name: str                 # fn::<name>
    params: list = dc_field(default_factory=list)
    body: tuple = None        # expression AST over the params
    ptypes: list = dc_field(default_factory=list)   # declared kinds (or None)
    lets: list = dc_field(default_factory=list)     # [(name, expr_ast), ...]
    text: str | None = None   # canonical `($args) { body }` source span
    comment: str | None = None
    # statement-shaped body (IF/FOR/THROW/DML) — raw text run through the
    # script engine per call instead of the expression evaluator
    script_src: str | None = None
    fn_mode: str | None = None  # OVERWRITE / IF NOT EXISTS


@dataclass
class RemoveStmt:
    """REMOVE TABLE|FIELD|INDEX|ANALYZER|FUNCTION|PARAM|SEQUENCE|EVENT
    (core/src/expr/statements/remove/*.rs)."""

    kind: str
    name: str
    table: str | None = None
    if_exists: bool = False


@dataclass
class AlterTableStmt:
    """ALTER TABLE name [SCHEMAFULL|SCHEMALESS] [PERMISSIONS ...]
    (core/src/expr/statements/alter/table.rs)."""

    name: str
    schemafull: bool | None = None
    select_perm: object = None
    ttype: str | None = None
    comment: str | None = None
    changefeed: str | None = None
    drops: list = dc_field(default_factory=list)
    perm_updates: dict = dc_field(default_factory=dict)  # verb → NONE|FULL
    if_exists: bool = False
    compact: bool = False  # ALTER TABLE ... COMPACT


@dataclass
class AlterObjStmt:
    """ALTER ANALYZER/PARAM/BUCKET/SEQUENCE — clause updates/drops over the
    stored definition (statements/alter/*.rs)."""

    kind: str
    name: str
    sets: dict = dc_field(default_factory=dict)
    drops: list = dc_field(default_factory=list)
    if_exists: bool = False


@dataclass
class AlterDetailStmt:
    """ALTER EVENT/INDEX/FUNCTION/ACCESS/USER/API/SYSTEM — clause-wise
    updates over catalog objects (statements/alter/*.rs); each kind
    merges `sets`/`drops` into the stored definition and re-renders the
    canonical INFO text."""

    kind: str
    name: str
    table: str | None = None
    level: str | None = None
    if_exists: bool = False
    sets: dict = dc_field(default_factory=dict)
    drops: list = dc_field(default_factory=list)
    # API: [(method, 'then'|'drop', block_text|None)] in clause order
    api_for: list = dc_field(default_factory=list)
    # FUNCTION full-redefinition source (after 'ALTER FUNCTION ')
    redefine_src: str | None = None


@dataclass
class RebuildIndexStmt:
    """REBUILD INDEX [IF EXISTS] name ON [TABLE] tbl (rebuild.rs)."""

    name: str
    table: str
    if_exists: bool = False


@dataclass
class InfoStmt:
    """INFO FOR DB | TABLE <tbl> | INDEX <ix> ON <tbl> (info.rs)."""

    level: str                 # db | table | index | ns | root | kv
    name: str | None = None
    table: str | None = None
    structure: bool = False    # `INFO ... STRUCTURE` — object form


@dataclass
class DefineEventStmt:
    """DEFINE EVENT name ON [TABLE] tbl [WHEN cond] THEN expr|{stmts}
    (define/event.rs; doc/event.rs fires with $event/$before/$after)."""

    name: str
    table: str
    when: tuple | None = None  # expr AST over $event/$before/$after/$value
    then: list = dc_field(default_factory=list)  # raw statement strings
    when_text: str | None = None  # canonical INFO rendering
    comment: str | None = None
    then_src: str | None = None  # source span of the THEN body (display)
    is_async: bool = False  # ASYNC [RETRY n] [MAXDEPTH n] (define/event.rs)
    retry: int | None = None
    maxdepth: int | None = None
    mode: str | None = None  # OVERWRITE / IF NOT EXISTS


@dataclass
class DefineParamStmt:
    """DEFINE PARAM $name VALUE expr (define/param.rs)."""

    name: str
    value: tuple = None
    comment: str | None = None
    perms: str = "FULL"
    mode: str | None = None  # OVERWRITE / IF NOT EXISTS


@dataclass
class DefineSequenceStmt:
    """DEFINE SEQUENCE name [BATCH n] [START n] (define/sequence.rs)."""

    name: str
    start: int = 0
    batch: int = 1000
    timeout: str | None = None
    mode: str | None = None  # OVERWRITE / IF NOT EXISTS


@dataclass
class LiveStmt:
    """LIVE SELECT [DIFF | fields] FROM tbl [WHERE cond]
    (statements/live.rs:17-30)."""

    table: str
    diff: bool = False
    fields: list | None = None      # None = * ; list of field names
    where: tuple | None = None


@dataclass
class ShowChangesStmt:
    """SHOW CHANGES FOR TABLE tbl [SINCE vs] [LIMIT n] (show.rs:10-23)."""

    table: str
    since: int = 0
    limit: int | None = None


@dataclass
class UseStmt:
    """USE NS/DB (statements/use.rs)."""

    ns: str | None = None
    db: str | None = None


@dataclass
class NoopStmt:
    """Accepted-but-structural statements (BEGIN/COMMIT)."""


@dataclass
class DefineMiscStmt:
    """DEFINE ACCESS/USER/API/CONFIG — auth/API catalog objects recorded
    for INFO rendering (define/{access,user,api,config}.rs); enforcement
    is out of scope (documented: single-tenant analytics engine)."""

    kind: str  # "access" | "user" | "api" | "config"
    name: object = None
    level: str = "DATABASE"  # ON NAMESPACE/DATABASE/ROOT
    clauses: dict = dc_field(default_factory=dict)
    mode: str | None = None  # OVERWRITE / IF NOT EXISTS


@dataclass
class DefineDbStmt:
    """DEFINE NAMESPACE/DATABASE name [STRICT] [COMMENT c] (define/
    {namespace,database}.rs) — registered so USE can flip strict-mode
    table checks and INFO FOR NS/ROOT can render the catalog."""

    kind: str  # "ns" | "db"
    name: str
    strict: bool = False
    comment: object = None  # str | ("param", name) | None
    mode: str | None = None  # None | "overwrite" | "ine"


@dataclass
class SleepStmt:
    seconds: float = 0.0


@dataclass
class TxStmt:
    word: str  # BEGIN | COMMIT | CANCEL


@dataclass
class KillStmt:
    """KILL <live-query-id> (kill.rs)."""

    id: tuple = None  # expression AST (uuid literal or $param)



def _parse_config_body(p: Parser):
    """GRAPHQL / API config clause grammar, shared by DEFINE and ALTER
    CONFIG (statements/define/config.rs, statements/alter/config.rs).
    Returns a DefineMiscStmt or None when the next word is neither."""
    if p.eat_word("GRAPHQL"):
        # GRAPHQL AUTO|NONE | TABLES <spec> FUNCTIONS <spec>
        #   [DEPTH n] [COMPLEXITY n] [INTROSPECTION NONE]
        st = DefineMiscStmt("config_graphql", "GraphQL")
        cl = st.clauses

        def _gq_val():
            if p.eat_word("AUTO"):
                return "AUTO"
            if p.eat_word("NONE") or p.eat("kw", "NONE"):
                return "NONE"
            mode = "INCLUDE" if p.eat_word("INCLUDE") else (
                "EXCLUDE" if p.eat_word("EXCLUDE") else None)
            if mode is None:
                raise SyntaxError(f"bad GRAPHQL spec at {p.peek().pos}")
            names = [_name(p)]
            while p.eat("op", ","):
                names.append(_name(p))
            return (mode, names)

        while True:
            if p.eat_word("AUTO"):
                cl["tables"] = cl["functions"] = "AUTO"
            elif p.eat_word("NONE") or p.eat("kw", "NONE"):
                cl["tables"] = cl["functions"] = "NONE"
            elif p.eat_word("TABLES"):
                cl["tables"] = _gq_val()
            elif p.eat_word("FUNCTIONS"):
                cl["functions"] = _gq_val()
            elif p.eat_word("DEPTH"):
                cl["depth"] = int(p.expect("num").text)
            elif p.eat_word("COMPLEXITY"):
                cl["complexity"] = int(p.expect("num").text)
            elif p.eat_word("INTROSPECTION"):
                iw = p.next().text.upper()
                if iw == "NONE":  # AUTO is the default — omitted
                    cl["introspection"] = iw
            else:
                break
        return st
    if p.eat_word("API"):
        # API [MIDDLEWARE fn(args)[, ...]] [PERMISSIONS FULL|NONE]
        st = DefineMiscStmt("config_api", "API")
        if p.eat_word("MIDDLEWARE"):
            t0 = p.peek()
            while not (p.peek().kind == "eof"
                       or (p.peek().kind == "kw" and
                           p.peek().text in ("PERMISSIONS", "COMMENT"))):
                p.next()
            st.clauses["middleware"] = p.span_text(t0, p.peek())
        if p.eat("kw", "PERMISSIONS"):
            st.clauses["perms"] = p.next().text.upper()
        return st
    return None


def _eat_define_mods(p: Parser) -> str | None:
    """`OVERWRITE` / `IF NOT EXISTS` after DEFINE <kind> (define/mod.rs);
    both lower to plain redefinition for most kinds — catalog writes are
    idempotent upserts — but NS/DB creation checks the returned mode."""
    for kind in ("kw", "name"):
        if p.eat(kind, "OVERWRITE"):
            return "overwrite"
    if p.peek().text == "IF" and p.toks[p.i + 1].text.upper() == "NOT":
        p.next()
        p.next()
        p.next()  # EXISTS
        return "ine"
    return None


def _field_path(p: Parser) -> str:
    """Field name, possibly a dotted path with `[*]`/`*` segments
    (`users.*.first_name`, `document.visible`; paths.rs Idiom)."""
    parts = [_name(p)]
    while True:
        if p.eat("op", "."):
            nt = p.peek()
            if nt.kind == "op" and nt.text == "*":
                p.next()
                parts.append("*")
            else:
                parts.append(_name(p))
        elif p.peek().kind == "op" and p.peek().text == "[":
            p.next()
            t = p.next()  # `*` or a numeric index
            p.expect("op", "]")
            parts.append("*" if t.text == "*" else f"[{t.text}]")
        else:
            break
    return ".".join(parts)


def _parse_kind(p: Parser, bases: list | None = None) -> str:
    """Consume a full kind expression; return the FIRST base kind name.
    Covers generics (`record<person>`, `option<array<int>>`), unions
    (`bool | int`), literal-object kinds (`{ a: int }`) and literal values
    (types/src/kind.rs)."""

    def one() -> str:
        t = p.peek()
        if t.kind in ("str", "num"):
            # literal kind (`TYPE 'make'` / `TYPE 123`): no Spark cast —
            # write-time litkind validation enforces it
            p.next()
            return ""
        if t.kind == "op" and t.text == "{":
            depth = 0
            while True:
                nt = p.next()
                if nt.text == "{":
                    depth += 1
                elif nt.text == "}":
                    depth -= 1
                    if depth == 0:
                        break
            return "object"
        if t.kind == "op" and t.text == "[":
            depth = 0
            while True:
                nt = p.next()
                if nt.text == "[":
                    depth += 1
                elif nt.text == "]":
                    depth -= 1
                    if depth == 0:
                        break
            return "array"
        base = p.next().text
        if p.peek().kind == "op" and p.peek().text == "<":
            depth = 0
            while True:
                nt = p.next()
                if nt.text == "<":
                    depth += 1
                elif nt.text == ">":
                    depth -= 1
                    if depth == 0:
                        break
        return base
    base = one()
    if bases is not None:
        bases.append(base)
    while p.peek().kind == "op" and p.peek().text == "|":
        p.next()
        b = one()
        if bases is not None:
            bases.append(b)
    return base


def _ast_mentions_field(ast, name: str) -> bool:
    """True when an expression AST reads `name` (bare ident or $this.name) —
    computed-field cycle detection (define/field.rs)."""
    if isinstance(ast, list):
        return any(_ast_mentions_field(x, name) for x in ast)
    if not isinstance(ast, tuple):
        return False
    if ast[0] == "ident" and ast[1] == name:
        return True
    if (ast[0] == "path" and isinstance(ast[1], tuple)
            and ast[1] in (("param", "this"), ("ident", name))):
        if ast[1] == ("ident", name):
            return True
        return any(p[0] == "field" and p[1] == name for p in ast[2])
    return any(_ast_mentions_field(x, name) for x in ast
               if isinstance(x, (tuple, list)))


_BACKTICK_FIELDS = ("value",)  # reserved keywords that need escaping


def _canon_stmt_text(txt: str) -> str:
    """Canonicalize a raw statement/body source span for INFO display
    (the reference's Display impls): collapse whitespace, single-quote
    strings, drop trailing separators before a closing brace, and
    backtick reserved keywords used as field names (`value` =)."""
    import re as _re5

    t = " ".join(txt.split())
    t = _re5.sub(r'"([^"\']*)"', r"'\1'", t)
    t = _re5.sub(r";\s*([})])", r" \1", t)
    t = _re5.sub(r",\s*([})])", r" \1", t)
    t = _re5.sub(r"\s+;", ";", t)
    # reserved keywords as plain field names render backticked
    t = _re5.sub(r"(?<![\w:$.`])(" + "|".join(_BACKTICK_FIELDS)
                 + r")(?=\s*=[^=~])", r"`\1`", t)
    t = _re5.sub(r"\(\s+", "(", t)
    t = _re5.sub(r"\s+\)", ")", t)
    t = _re5.sub(r"\{\s*\}", "{  }", t)
    return t


def _render_api(path, ap: dict) -> str:
    """Canonical DEFINE API text: one FOR group per handler, fallback
    first (define/api.rs Display; statements/define/api/formatting.surql,
    alter/alter_api.surql)."""
    txt = f"DEFINE API '{path}'"
    for g in ap["groups"]:
        txt += f" FOR {', '.join(g['methods'])}"
        if g.get("middleware"):
            txt += f" MIDDLEWARE {_canon_stmt_text(g['middleware'])}"
        txt += f" PERMISSIONS {g.get('perms', 'FULL')}"
        if g.get("then"):
            txt += f" THEN {g['then']}"
    if ap.get("comment"):
        txt += f" COMMENT {_surql_literal(ap['comment'])}"
    return txt


def _render_event(name, tbl, is_async, retry, maxdepth, when_txt,
                  then_txt, comment) -> str:
    """Canonical DEFINE EVENT text (define/event.rs Display;
    statements/define/event/basic.surql, alter/alter_event.surql)."""
    txt = f"DEFINE EVENT {name} ON {tbl}"
    if is_async:
        txt += f" ASYNC RETRY {retry if retry is not None else 1}" \
               f" MAXDEPTH {maxdepth if maxdepth is not None else 3}"
    txt += f" WHEN {when_txt or 'true'} THEN {then_txt}"
    if comment:
        txt += f" COMMENT {_surql_literal(comment)}"
    return txt


def _surql_literal(v) -> str:
    """Canonical SurrealQL literal text for INFO rendering (fmt in the
    reference's expr Display impls)."""
    if v is None:
        return "NONE"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("'", "\\'") + "'"
    if isinstance(v, float) and v == int(v):
        return f"{v:.1f}f"
    if isinstance(v, list):
        return "[" + ", ".join(_surql_literal(x) for x in v) + "]"
    if isinstance(v, dict):
        if not v:
            return "{  }"
        return "{ " + ", ".join(f"{k}: {_surql_literal(x)}"
                                for k, x in v.items()) + " }"
    return str(v)


_PATH_MISS = object()  # _walk_record_path: unsupported part form


_INFO_DB_CATS = ("accesses", "analyzers", "apis", "buckets", "configs",
                 "functions", "models", "modules", "params", "sequences",
                 "tables", "users")


def _duration_text(p: Parser) -> str:
    """Consume a duration chain (`1d`, `5s500ms`) as raw text (glued
    contiguous num/name tokens — the lexer splits unit suffixes)."""
    parts = [p.next()]
    while p.peek().kind in ("num", "name") and \
            p.peek().pos == parts[-1].pos + len(parts[-1].text):
        parts.append(p.next())
    return "".join(x.text for x in parts)


def _render_analyzer(name: str, toks, filts, comment,
                     function: str | None = None) -> str:
    """Display for DEFINE ANALYZER (define/analyzer.rs): tokenizers join
    bare-comma, filters comma-space with uppercased args —
    `FILTERS LOWERCASE, SNOWBALL(ENGLISH)`, string args stay quoted."""
    out = f"DEFINE ANALYZER {name}"
    if function:
        fn = function if str(function).startswith("fn::") \
            else f"fn::{function}"
        out += f" FUNCTION {fn}"
    if toks:
        out += " TOKENIZERS " + ",".join(t.upper() for t in toks)

    def _flt(f) -> str:
        if isinstance(f, str):
            return f.upper()
        fname, *args = f
        if not args:
            return fname.upper()
        rendered = ",".join(
            f"'{a}'" if isinstance(a, str) and fname == "mapper"
            else (str(a).upper() if isinstance(a, str) else str(a))
            for a in args)
        return f"{fname.upper()}({rendered})"

    if filts:
        out += " FILTERS " + ", ".join(_flt(f) for f in filts)
    if comment:
        out += f" COMMENT {_surql_literal(comment)}"
    return out


def _render_param(name: str, v, comment, perms) -> str:
    out = f"DEFINE PARAM ${name} VALUE {_surql_literal(v)}"
    if comment:
        out += f" COMMENT {_surql_literal(comment)}"
    return out + f" PERMISSIONS {perms}"


_NUM_KINDS = {"int", "float", "number", "decimal"}


def _split_top(s: str, sep: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "<[{(":
            depth += 1
        elif ch in ">]})":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [x.strip() for x in out if x.strip()]


def _member_kinds(kt: str, member):
    """('ok', kinds) / ('bad',) / ('unknown',) — what a member selector
    hits inside a container kind text.  'bad' = the selector cannot
    apply to (one variant of) the kind; 'unknown' = no static decision
    (generic object/any).  ``member`` is '*', a field name, or an int
    index (define/field.rs nested kind validation —
    statements/define/field/mismatch.surql)."""
    kt = kt.strip()
    while kt.startswith("option<") and kt.endswith(">"):
        kt = kt[7:-1].strip()
    variants = _split_top(kt, "|")
    if len(variants) > 1:
        out: list[str] = []
        unknown = False
        for v in variants:
            st = _member_kinds(v, member)
            if st[0] == "bad":
                return ("bad",)
            if st[0] == "unknown":
                unknown = True
            else:
                out.extend(st[1])
        if out:
            return ("ok", out)
        return ("unknown",) if unknown else ("bad",)
    if kt.startswith("array<") and kt.endswith(">"):
        inner = _split_top(kt[6:-1], ",")
        if isinstance(member, str) and member != "*":
            return ("bad",)  # `.name` on an array kind
        if isinstance(member, int) and len(inner) > 1 \
                and inner[1].isdigit() and member >= int(inner[1]):
            return ("bad",)  # index past the declared bound
        return ("ok", [inner[0]])
    if kt.startswith("set<") and kt.endswith(">"):
        if isinstance(member, str) and member != "*":
            return ("bad",)
        return ("ok", [_split_top(kt[4:-1], ",")[0]])
    if kt.startswith("[") and kt.endswith("]"):
        elems = _split_top(kt[1:-1], ",")
        if member == "*":
            return ("ok", elems)
        if isinstance(member, int):
            return ("ok", [elems[member]]) if member < len(elems) \
                else ("bad",)
        return ("bad",)
    if kt.startswith("{") and kt.endswith("}"):
        if isinstance(member, int):
            return ("bad",)  # `[n]` on an object kind
        pairs = {}
        for p in _split_top(kt[1:-1], ","):
            if ":" in p:
                k, _, v = p.partition(":")
                pairs[k.strip()] = v.strip()
        if member == "*":
            return ("ok", list(pairs.values()))
        if member in pairs:
            return ("ok", [pairs[member]])
        return ("bad",)
    if kt in ("object",):
        if isinstance(member, int):
            return ("bad",)  # `[n]` on the generic object kind
        return ("unknown",)
    if kt in ("any", "references"):
        return ("unknown",)
    if kt.startswith(("array", "set")):
        return ("unknown",)
    # scalar kinds have no members
    return ("bad",) if member is not None else ("unknown",)


def _kind_coercible(member: str, target: str) -> bool:
    m = member.strip()
    t = target.strip()
    while m.startswith("option<") and m.endswith(">"):
        m = m[7:-1].strip()
    if m.startswith("'") or t.startswith("'") or "'" in m or "'" in t:
        # literal kinds must match EXACTLY (variant sets equal —
        # mismatch.surql i/j cases)
        return set(_split_top(m, "|")) == set(_split_top(t, "|"))
    m = m.split("<")[0].strip().lower()
    t = t.split("<")[0].strip().lower()
    if "any" in (m, t) or not m or not t:
        return True
    if t in _NUM_KINDS or t == "number":
        return m in _NUM_KINDS
    if t == "string":
        return m == "string"
    if t == "bool":
        return m == "bool"
    return True


def _render_field(name: str, tbl: str, st) -> str:
    """Canonical DEFINE FIELD text from the raw clause captures
    (define/field.rs Display order)."""
    out = f"DEFINE FIELD {name} ON {tbl}"
    if st.kind_text:
        # `array<any>`/`set<any>` display as the bare container
        # (expr/kind.rs Display: Any elements elide)
        import re as _re0

        kt = _re0.sub(r"\b(array|set)<any>", r"\1", st.kind_text)
        out += (" TYPE FLEXIBLE " if st.flexible else " TYPE ") + kt
    t = st.texts

    def _fl(txt: str) -> str:
        # bare float literals re-render with the `f` suffix
        # (types Number::Float Display — `VALUE 123.456f`)
        import re as _re1

        return txt + "f" if _re1.fullmatch(r"\d+\.\d+", txt) else txt

    if t.get("default"):
        out += " DEFAULT" + (" ALWAYS " if t.get("default_always")
                             else " ") + _fl(t["default"])
    if t.get("readonly"):
        out += " READONLY"
    if t.get("value"):
        out += " VALUE " + _fl(t["value"])
    if t.get("assert"):
        out += " ASSERT " + t["assert"]
    if t.get("computed"):
        out += " COMPUTED " + t["computed"]
    if t.get("reference"):
        out += " REFERENCE ON DELETE " + (t.get("on_delete") or "IGNORE")
        if t.get("on_delete_then"):
            out += " " + t["on_delete_then"]
    if t.get("comment"):
        out += f" COMMENT {_surql_literal(t['comment'])}"
    import re as _re

    # canonical operator names (Operator Display prints INSIDE, not IN)
    out = _re.sub(r"\bIN\b", "INSIDE", out)
    out = _re.sub(r"\bNOT INSIDE\b", "NOTINSIDE", out)
    perms = t.get("perms")
    if perms and perms.upper() not in ("FULL",):
        if perms.upper() == "NONE":
            # bare NONE expands to the verb list (define/field.rs Display;
            # alter/alter_field.surql)
            return out + " PERMISSIONS FOR select, create, update NONE"
        # canonical grouping (define/field.rs Display): lowercase verbs,
        # unstated verbs (of select/create/update) default FULL
        groups = []
        seen: set = set()
        for g in _re.split(r"\bFOR\b", perms)[1:]:
            g = " ".join(g.split()).strip().rstrip(",")
            m = _re.match(r"([\w\s,]+?)\s+(NONE|FULL|WHERE\s.*)$",
                          g, _re.S | _re.I)
            if not m:
                continue
            verbs = [v.strip().lower() for v in m.group(1).split(",")]
            lvl = m.group(2)
            if lvl.upper() in ("NONE", "FULL"):
                lvl = lvl.upper()
            seen.update(verbs)
            groups.append((verbs, lvl))
        # fields have no delete permission (define/field.rs Display —
        # permissions_full_2.0.surql drops the legacy delete verb)
        groups = [( [v for v in vs if v != "delete"], lvl)
                  for vs, lvl in groups]
        groups = [(vs, lvl) for vs, lvl in groups if vs]
        missing = [v for v in ("select", "create", "update")
                   if v not in seen]
        if missing:
            groups.append((missing, "FULL"))
        if all(lvl == "FULL" for _, lvl in groups):
            return out + " PERMISSIONS FULL"
        # canonical group order: by the first verb's (select, create,
        # update) rank (define/field.rs Display — recursive_types.surql
        # prints 'FOR select, create FULL, FOR update NONE')
        vrank = {"select": 0, "create": 1, "update": 2}
        groups.sort(key=lambda g: min(vrank.get(v, 3) for v in g[0]))
        return out + " PERMISSIONS " + ", ".join(
            f"FOR {', '.join(vs)} {lvl}" for vs, lvl in groups)
    return out + " PERMISSIONS FULL"


def _render_table(name: str, i: dict) -> str:
    ttxt = i.get("type", "ANY")
    if i.get("enforced"):
        ttxt += " ENFORCED"  # catalog/table.rs Display for TableType
    if i.get("drop"):
        ttxt += " DROP"  # define/table.rs Display: DROP before schema
    out = (f"DEFINE TABLE {name} TYPE {ttxt} "
           + ("SCHEMAFULL" if i.get("schemafull") else "SCHEMALESS"))
    if i.get("as_text"):
        out += f" AS {i['as_text']}"
    if i.get("comment"):
        out += f" COMMENT {_surql_literal(i['comment'])}"
    if i.get("changefeed"):
        out += f" CHANGEFEED {i['changefeed']}"
    perms = i.get("perms") or {v: "NONE" for v in
                               ("select", "create", "update", "delete")}
    levels = set(perms.values())
    if levels == {"NONE"}:
        out += " PERMISSIONS NONE"
    elif levels == {"FULL"}:
        out += " PERMISSIONS FULL"
    else:
        groups: dict[str, list[str]] = {}
        for v in ("select", "create", "update", "delete"):
            groups.setdefault(perms.get(v, "NONE"), []).append(v)
        out += " PERMISSIONS " + ", ".join(
            f"FOR {', '.join(vs)} {lvl}" for lvl, vs in groups.items())
    return out


def _render_bucket(name: str, backend, readonly, comment, perms) -> str:
    out = f"DEFINE BUCKET {name}"
    if readonly:
        out += " READONLY"
    out += f" BACKEND {_surql_literal(backend)} PERMISSIONS {perms}"
    if comment:
        out += f" COMMENT {_surql_literal(comment)}"
    return out


def _skip_permissions(p: Parser) -> None:
    """Consume a PERMISSIONS clause without interpreting it
    (define/field.rs; enforcement is table-level at scan resolution)."""
    if p.eat("kw", "NONE") or p.eat("kw", "FULL"):
        return
    while p.eat("kw", "FOR"):
        while True:
            verb = p.next()  # verb
            if verb.text.upper() == "DELETE":
                # field permissions have no delete verb (syn/parser/stmt/
                # parts.rs; define/field/permission_delete.surql)
                raise SyntaxError(
                    "field permissions accept select, create and update "
                    "only — not delete")
            if not p.eat("op", ","):
                break
        if p.eat("kw", "NONE") or p.eat("kw", "FULL"):
            p.eat("op", ",")  # `FOR select NONE, FOR create ...`
            continue
        p.expect("kw", "WHERE")
        p.expr(0)
        p.eat("op", ",")


def _name(p: Parser) -> str:
    """An identifier that may collide with a keyword (`group`, `value`,
    `order` are legal table/field names — the reference's parser treats
    most keywords as soft)."""
    t = p.next()
    if t.kind not in ("name", "kw"):
        raise SyntaxError(f"expected a name, got {t.text!r} at {t.pos}")
    return t.orig or t.text


def _param_type(p: Parser) -> str | None:
    """Optional `: kind` annotation after a parameter — kinds may carry
    generics (`option<string>`, `array<int>`); consume balanced <...>."""
    if not p.eat("op", ":"):
        return None
    t = p.next()
    if t.kind not in ("name", "kw"):
        raise SyntaxError(f"expected a type after ':', got {t.text!r}")
    typ = t.orig or t.text
    if p.peek().kind == "op" and p.peek().text == "<":
        depth = 0
        while True:
            nt = p.next()
            typ += nt.orig or nt.text
            if nt.text == "<":
                depth += 1
            elif nt.text == ">":
                depth -= 1
                if depth == 0:
                    break
    return typ


# -- parsing -----------------------------------------------------------------

_RETURNS = ("NONE", "BEFORE", "AFTER", "DIFF")


def parse_statement(src: str):
    """One statement → Select or a *Stmt dataclass."""
    p = Parser(src.strip().rstrip(";"))
    stmt = _parse_statement_body(p)
    p.expect("eof")
    return stmt


def _parse_statement_body(p: Parser):
    t = p.peek()
    # soft statement keywords (REMOVE/ALTER/... are not reserved words)
    word = t.text.upper() if t.kind in ("kw", "name") else ""
    if not word:
        raise SyntaxError(f"expected a statement keyword, got {t.text!r}")
    if t.text == "SELECT":
        return _parse_select_body(p)
    if t.text == "CREATE":
        p.next()
        c_only = p.eat("kw", "ONLY")
        tgts = [_target(p)]
        while p.eat("op", ","):
            # CREATE a:1, a:2, b:3 — multi-target create (create.rs Whats)
            tgts.append(_target(p))
        data = _data_clause(p)
        ret = _return_clause(p)
        if len(tgts) == 1:
            return CreateStmt(tgts[0], data, ret, only=c_only)
        return [CreateStmt(tg, data, ret, only=c_only) for tg in tgts]
    if t.text == "INSERT":
        p.next()
        ins_ignore = p.eat_word("IGNORE")
        # INSERT RELATION [INTO tb]: rows carry in/out edge pointers
        # (insert.rs relation mode — idiom/recursion_graph.surql)
        p.eat_word("RELATION")
        p.eat("kw", "INTO")
        if p.peek().kind == "op" and p.peek().text in ("[", "{"):
            # INSERT with no table: rows dispatch by their id's table
            # (statements/insert.rs Value::None what;
            # idiom/recursion_record_links.surql)
            tbl = None
        else:
            tbl = _name(p)
        st = InsertStmt(tbl)
        st.ignore = ins_ignore
        if p.peek().kind == "op" and p.peek().text == "(":
            p.next()
            if p.peek().kind == "kw" and p.peek().text == "SELECT":
                st.select = _parse_select_body(p)
                p.expect("op", ")")
            else:
                # (col, ...) VALUES (expr, ...), (...) — insert.rs VALUES form
                cols = []
                while True:
                    cols.append(_name(p))
                    if not p.eat("op", ","):
                        break
                p.expect("op", ")")
                p.expect("kw", "VALUES")
                st.rows = []
                while True:
                    p.expect("op", "(")
                    vals = []
                    while True:
                        vals.append(p.expr(0))
                        if not p.eat("op", ","):
                            break
                    p.expect("op", ")")
                    st.rows.append(("object", list(zip(cols, vals))))
                    if not p.eat("op", ","):
                        break
        elif p.peek().kind == "op" and p.peek().text == "[":
            arr = p.expr(0)
            st.rows = [e for e in arr[1]]
        else:
            st.rows = [p.expr(0)]
        if p.eat("kw", "ON"):
            p.expect("kw", "DUPLICATE")
            p.expect("kw", "KEY")
            p.expect("kw", "UPDATE")
            st.on_duplicate = _assignments(p)
        st.return_ = _return_clause(p)
        return st
    if t.text in ("UPDATE", "UPSERT"):
        p.next()
        u_only = p.eat("kw", "ONLY")
        tgt = _target(p)
        extras = []
        while p.eat("op", ","):
            extras.append(_target(p))
        data = _data_clause(p)
        where = p.expr(0) if p.eat("kw", "WHERE") else None
        st = UpdateStmt(tgt, data, where, _return_clause(p),
                        upsert=t.text == "UPSERT")
        st.only = u_only
        st.extra_targets = extras
        if p.eat("kw", "EXPLAIN"):
            st.explain = "full" if p.eat_word("FULL") else "plain"
        return st
    if t.text == "DELETE":
        p.next()
        p.eat("kw", "FROM")
        p.eat("kw", "ONLY")
        tgt = _target(p)
        where = p.expr(0) if p.eat("kw", "WHERE") else None
        st = DeleteStmt(tgt, where, _return_clause(p, default="NONE"))
        if p.eat("kw", "EXPLAIN"):
            st.explain = "full" if p.eat_word("FULL") else "plain"
        return st
    if t.text == "RELATE":
        p.next()
        p.eat("kw", "ONLY")  # single-object output (textual unwrap)
        p.no_graph += 1  # arrows here are RELATE syntax, not lookups
        frm = p.expr(9)  # bind tighter than -> steps
        p.expect("op", "->")
        if p.peek().kind == "param":
            # RELATE a->$kind->b — edge table (or record id) from a bound
            # param (expr/statements/relate.rs computed `kind`)
            edge: object = ("param", p.next().text[1:])
        elif p.peek().kind == "op" and p.peek().text == "(":
            # RELATE a->(type::table("knows"))->b — expression edge
            edge = ("texpr", p.prefix())
        else:
            edge = _name(p)
        edge_key: object | None = None
        if p.peek().kind == "op" and p.peek().text == ":":
            # RELATE a->edge:key->b — explicit edge record id (relate.rs)
            p.next()
            if p.peek().kind == "op" and p.peek().text == "[":
                edge_key = ("kexpr", p.prefix())  # edge:[...] array key
            else:
                kt = p.next()
                edge_key = int(kt.text) if kt.kind == "num" else kt.text
        p.expect("op", "->")
        to = p.expr(9)
        p.no_graph -= 1
        data = _data_clause(p)
        return RelateStmt(frm, edge, to, data, _return_clause(p),
                          edge_key=edge_key)
    if word == "USE":
        # USE [NS x] [DB y] — switch the session's namespace/database
        # (statements/use.rs); tracked in SessionContext
        p.next()
        ns = db_ = None
        while p.peek().kind != "eof":
            w = p.next().text.upper()
            if w in ("NS", "NAMESPACE"):
                ns = p.next().text
            elif w in ("DB", "DATABASE"):
                db_ = p.next().text
            else:
                raise SyntaxError(f"USE {w} not supported")
        return UseStmt(ns, db_)
    if word == "SLEEP":
        # SLEEP <duration> — actually sleeps (statements/sleep.rs), capped
        # at 2 s so a stray statement can't stall the batch
        p.next()
        chain = _duration_text(p)
        from surrealdb_spark.sql.parser import _parse_duration_nanos

        return SleepStmt(min(_parse_duration_nanos(chain) / 1e9, 2.0))
    if word in ("BEGIN", "COMMIT", "CANCEL"):
        # transactions are accepted as batch markers — each statement is
        # already one atomic Spark job (documented scope; COVERAGE.md §2.8).
        # Pairing is still validated (COMMIT/CANCEL need an open BEGIN).
        p.next()
        p.eat_word("TRANSACTION")
        return TxStmt(word)
    if t.text == "DEFINE":
        p.next()
        what = p.next()
        mode = _eat_define_mods(p)
        if what.text in ("NAMESPACE", "NS", "DATABASE", "DB"):
            # catalog levels above the engine's single-database scope —
            # recorded for USE/STRICT checks and INFO
            # (statements/define/{namespace,database}.rs)
            nm = _name(p)
            strict = False
            comment = None
            while True:
                if p.eat_word("STRICT"):
                    strict = True
                elif p.eat_word("COMMENT"):
                    ct = p.next()
                    if ct.kind == "param":
                        comment = ("param", ct.text[1:])
                    elif ct.kind == "str":
                        comment = ct.text[1:-1]
                    elif ct.text.upper() in ("NONE", "NULL"):
                        comment = None
                    else:
                        comment = ct.text
                elif p.eat_word("CHANGEFEED"):
                    _duration_text(p)
                else:
                    break
            kind = "ns" if what.text in ("NAMESPACE", "NS") else "db"
            return DefineDbStmt(kind, nm, strict, comment, mode)
        if what.text == "TABLE":
            name = _name(p)
            st = DefineTableStmt(name)
            st.mode = mode
            while True:
                if p.eat("kw", "SCHEMAFULL") or p.eat_word("SCHEMAFUL"):
                    st.schemafull = True
                elif p.eat("kw", "SCHEMALESS"):
                    st.schemafull = False
                elif p.eat_word("DROP"):
                    # DROP tables discard writes (define/table.rs)
                    st.drop = True
                elif p.eat("kw", "TYPE"):
                    st.ttype = p.next().text.upper()
                    st._type_set = True
                    if st.ttype == "RELATION":
                        # TYPE RELATION [IN a OUT b | FROM a TO b]
                        # [ENFORCED] (catalog/table.rs:151-156)
                        while p.peek().text.upper() in ("IN", "OUT", "FROM",
                                                        "TO", "ENFORCED"):
                            w = p.next().text.upper()
                            if w == "ENFORCED":
                                st.enforced = True
                            else:
                                names = [_name(p)]
                                while p.eat("op", "|"):
                                    names.append(_name(p))
                                if w in ("IN", "FROM"):
                                    st.rel_in = names
                                else:
                                    st.rel_out = names
                elif p.eat("kw", "AS"):
                    # DEFINE TABLE v AS SELECT ... — view definition
                    t0 = p.peek()
                    if p.peek().text == "(":
                        p.next()
                        st.as_select = _parse_select_body(p)
                        p.expect("op", ")")
                    else:
                        st.as_select = _parse_select_body(p)
                    st.as_text = _select_to_sql(st.as_select)
                elif p.eat_word("DROP"):
                    pass
                elif p.eat_word("CHANGEFEED"):
                    st.changefeed = _duration_text(p)
                elif p.eat_word("COMMENT"):
                    ct = p.next()
                    st.comment = ct.text[1:-1] if ct.kind == "str" \
                        else (ct.orig or ct.text)
                else:
                    break
            schemafull = st.schemafull
            # PERMISSIONS NONE|FULL | FOR <verb>[,<verb>] NONE|FULL|WHERE e
            # (statements/define/table.rs; only the select verb is enforced
            # — reads; mutations are owner-scoped dml.Database calls)
            if p.eat("kw", "PERMISSIONS"):
                if p.eat("kw", "NONE"):
                    st.select_perm = "none"
                    st.perms_text = "NONE"
                elif p.eat("kw", "FULL"):
                    st.select_perm = "full"
                    st.perms_text = "FULL"
                else:
                    st.verb_perms = {v: "NONE" for v in
                                     ("select", "create", "update",
                                      "delete")}
                    while p.eat("kw", "FOR") or (
                            p.peek().kind == "op" and p.peek().text == ","
                            and p.toks[p.i + 1].kind == "kw"
                            and p.toks[p.i + 1].text == "FOR"
                            and bool(p.next()) and bool(p.next())):
                        verbs = []
                        while True:
                            verbs.append(p.next().text.lower())
                            if not p.eat("op", ","):
                                break
                            if p.peek().kind == "kw" \
                                    and p.peek().text == "FOR":
                                # `FOR select FULL, FOR create NONE` —
                                # comma separates verb GROUPS; put it back
                                p.i -= 1
                                break
                        if p.eat("kw", "NONE"):
                            perm: object = "none"
                            ptxt = "NONE"
                        elif p.eat("kw", "FULL"):
                            perm = "full"
                            ptxt = "FULL"
                        else:
                            p.expect("kw", "WHERE")
                            t0 = p.peek()
                            perm = p.expr(0)
                            ptxt = "WHERE " + p.span_text(t0, p.peek())
                        for v in verbs:
                            if v in st.verb_perms:
                                st.verb_perms[v] = ptxt
                        if "select" in verbs:
                            st.select_perm = perm
            while p.eat_word("COMMENT"):
                ct = p.next()
                st.comment = ct.text[1:-1] if ct.kind == "str" \
                    else (ct.orig or ct.text)
            if st.ttype == "ANY" and st.schemafull and not st._type_set:
                # DEFINE ... SCHEMAFULL without an explicit TYPE defaults
                # to NORMAL (define/table.rs; ALTER keeps the stored type
                # — view/foreigntable.surql vs alter/alter_table.surql)
                st.ttype = "NORMAL"
            return st
        if what.text == "FIELD":
            name = _field_path(p)
            p.expect("kw", "ON")
            p.eat("kw", "TABLE")
            tbl = _name(p)
            st = DefineFieldStmt(tbl, name)
            st.mode = mode
            kind_bases: list = []
            # clauses in any order (statements/define/field.rs)
            while True:
                if p.eat("kw", "TYPE"):
                    if p.eat_word("FLEXIBLE"):
                        st.flexible = True
                    t0 = p.peek()
                    st.dtype = _parse_kind(p, kind_bases)
                    st.kind_text = p.span_text(t0, p.peek())
                elif p.eat("kw", "DEFAULT"):
                    if p.eat_word("ALWAYS"):
                        st.texts["default_always"] = True
                    t0 = p.peek()
                    st.default = p.expr(0)
                    dtext = p.span_text(t0, p.peek())
                    import re as _re_f

                    # canonical float literals print with the f suffix
                    # (val/number.rs Display)
                    if _re_f.fullmatch(r"[+-]?\d+\.\d+([eE][+-]?\d+)?",
                                       dtext):
                        dtext += "f"
                    st.texts["default"] = dtext
                elif p.eat("kw", "VALUE"):
                    t0 = p.peek()
                    st.value = p.expr(0)
                    st.texts["value"] = p.span_text(t0, p.peek())
                elif p.eat("kw", "ASSERT"):
                    t0 = p.peek()
                    st.assert_ = p.expr(0)
                    st.texts["assert"] = p.span_text(t0, p.peek())
                elif p.eat_word("COMPUTED"):
                    t0 = p.peek()
                    st.computed = p.expr(0)
                    st.texts["computed"] = p.span_text(t0, p.peek())
                    if _ast_mentions_field(st.computed, name):
                        raise SyntaxError(
                            f"computed field {name!r} references itself")
                elif p.eat_word("READONLY"):
                    st.texts["readonly"] = True
                elif p.eat_word("FLEXIBLE"):
                    st.flexible = True
                elif p.eat_word("REFERENCE"):
                    # REFERENCE [ON DELETE CASCADE|IGNORE|UNSET|REJECT|
                    # THEN <expr>] (define/field.rs reference tracking;
                    # expr/reference.rs delete strategies)
                    st.texts["reference"] = True
                    if "." in name or "*" in name:
                        raise SyntaxError(
                            f"cannot use REFERENCE on nested field {name!r}")
                    bad = [b for b in kind_bases if b not in
                           ("record", "array", "option", "set")]
                    if bad:
                        raise SyntaxError(
                            f"REFERENCE requires a record type, got {bad[0]!r}")
                    if p.eat("kw", "ON"):
                        p.next()  # DELETE
                        act = p.next()
                        st.texts["on_delete"] = act.text.upper()
                        if act.text.upper() == "THEN":
                            st.texts["on_delete_then"] = _raw_expr_text(p)
                elif p.eat("kw", "PERMISSIONS"):
                    t0 = p.peek()
                    _skip_permissions(p)
                    st.texts["perms"] = p.span_text(t0, p.peek())
                elif p.eat_word("COMMENT"):
                    ct = p.next()
                    st.texts["comment"] = (ct.text[1:-1] if ct.kind == "str"
                                           else ct.text)
                else:
                    break
            if st.flexible and st.dtype is not None:
                kt = (st.kind_text or "").lower()
                if "object" not in kt and "{" not in kt:
                    # FLEXIBLE needs a type containing object — `any`
                    # already admits everything (catalog/schema/field.rs;
                    # define/field/flexible_error_{any,non_object}.surql)
                    raise SyntaxError(
                        "FLEXIBLE can only be used with types containing "
                        "object")
            return st
        if what.text == "INDEX":
            # DEFINE INDEX name ON [TABLE] tbl FIELDS|COLUMNS f,...
            #   [UNIQUE | FULLTEXT [ANALYZER a] | SEARCH ANALYZER a
            #    | HNSW [DIMENSION n] | COUNT]   (catalog/schema/index.rs)
            name = _name(p)
            p.expect("kw", "ON")
            p.eat("kw", "TABLE")
            tbl = _name(p)
            st = DefineIndexStmt(name, tbl)
            st.mode = mode
            if p.eat("kw", "FIELDS") or p.eat("kw", "COLUMNS"):
                # index columns may be full idiom paths (`marks.*.subject`,
                # `id[1]`, `id.id().r` — catalog/schema/index.rs cols):
                # capture each verbatim up to ',' or the kind clause
                _STOP = {"UNIQUE", "FULLTEXT", "SEARCH", "HNSW", "COUNT",
                         "COMMENT", "CONCURRENTLY", "MTREE"}
                while True:
                    t0 = p.peek()
                    last = None
                    depth = 0
                    while True:
                        t = p.peek()
                        if t.kind == "eof":
                            break
                        if t.kind == "op" and t.text in ("(", "["):
                            depth += 1
                        elif t.kind == "op" and t.text in (")", "]"):
                            if depth == 0:
                                break
                            depth -= 1
                        elif depth == 0 and t.kind == "op" and t.text == ",":
                            break
                        elif depth == 0 and t.kind in ("kw", "name") and \
                                (t.orig or t.text).upper() in _STOP:
                            break
                        last = p.next()
                    if last is None:
                        break
                    st.fields.append(
                        p.src[t0.pos:last.pos + len(last.text)])
                    if not p.eat("op", ","):
                        break
            if p.eat("kw", "UNIQUE"):
                st.kind = "uniq"
            elif p.eat("kw", "FULLTEXT") or p.eat("kw", "SEARCH"):
                st.kind = "fulltext"
                if p.eat("kw", "ANALYZER"):
                    st.analyzer = _name(p)
            elif p.eat("kw", "HNSW") or p.eat_word("HNSW"):
                st.kind = "hnsw"
            elif p.eat_word("MTREE"):
                st.kind = "hnsw"  # same brute/LSH artifact
            elif p.peek().kind == "name" and p.peek().text.upper() == "COUNT":
                p.next()
                st.kind = "count"
            # trailing index parameters (catalog/schema/index.rs: BM25
            # scoring, HIGHLIGHTS, HNSW/MTREE hyper-params) — recorded or
            # accepted; the Spark artifacts don't tune these knobs
            while True:
                t = p.peek()
                w = (t.orig or t.text).upper() if t.kind in ("kw", "name") \
                    else None
                if w == "BM25":
                    p.next()
                    st.bm25 = (1.2, 0.75)
                    nums = []
                    if p.eat("op", "("):
                        while not p.eat("op", ")"):
                            t2 = p.next()
                            if t2.kind == "num":
                                nums.append(float(t2.text))
                    else:
                        while p.peek().kind == "num":
                            nums.append(float(p.next().text))
                    if len(nums) >= 2:
                        st.bm25 = (nums[0], nums[1])
                elif w == "HIGHLIGHTS":
                    p.next()
                    st.highlights = True
                elif w in ("CONCURRENTLY", "OVERWRITE"):
                    p.next()
                    if w == "CONCURRENTLY":
                        st.concurrently = True
                elif w is not None and w.startswith("HASHED_"):
                    # HASHED_VECTOR etc. — hashed HNSW storage knob
                    # (catalog/schema/index.rs HnswParams)
                    p.next()
                elif w in ("DIMENSION", "EFC", "M", "M0", "LM", "CAPACITY",
                           "DOC_IDS_ORDER", "DOC_IDS_CACHE", "DOC_LENGTHS_ORDER",
                           "DOC_LENGTHS_CACHE", "POSTINGS_ORDER",
                           "POSTINGS_CACHE", "TERMS_ORDER", "TERMS_CACHE",
                           "EXTEND_CANDIDATES", "KEEP_PRUNED_CONNECTIONS"):
                    p.next()
                    if w == "DIMENSION":
                        st.dimension = int(p.expect("num").text)
                    elif w == "EFC" and p.peek().kind == "num":
                        st.efc = int(p.next().text)
                    elif p.peek().kind in ("num", "name"):
                        p.next()
                elif w in ("DIST", "TYPE"):
                    p.next()
                    t2 = p.next()
                    if w == "DIST":
                        st.dist = (t2.orig or t2.text)
                    else:
                        st.vtype = (t2.orig or t2.text).upper()
                elif w == "COMMENT":
                    p.next()
                    p.next()
                else:
                    break
            return st
        if what.text == "BUCKET":
            # DEFINE BUCKET name [READONLY] BACKEND "memory"|... [COMMENT s]
            # [PERMISSIONS ...] (define/bucket.rs) — every backend maps to a
            # local root here (an object-store client on a real cluster)
            st = DefineBucketStmt(_name(p))
            while True:
                if p.eat_word("BACKEND"):
                    bt = p.next()
                    st.backend = bt.text[1:-1] if bt.kind == "str" else bt.text
                elif p.eat_word("READONLY"):
                    st.readonly = True
                elif p.eat_word("COMMENT"):
                    ct = p.next()
                    st.comment = ct.text[1:-1] if ct.kind == "str" else ct.text
                elif p.eat("kw", "PERMISSIONS"):
                    st.perms = "NONE" if p.eat("kw", "NONE") else (
                        p.eat("kw", "FULL") and "FULL") or "FULL"
                else:
                    break
            return st
        if what.text == "ANALYZER":
            # DEFINE ANALYZER name TOKENIZERS blank,camel FILTERS
            #   lowercase,snowball(english),ngram(1,3),mapper('path')
            # (define/analyzer.rs; sql/tokenizer.rs, sql/filter.rs)
            name = _name(p)
            st = DefineAnalyzerStmt(name)
            st.mode = mode
            if p.eat_word("FUNCTION"):
                # FUNCTION fn::name preprocessing hook — the function
                # must exist (define/analyzer.rs;
                # search_invalid_function_name.surql)
                st.function = _name(p)
            if p.eat("kw", "TOKENIZERS"):
                st.tokenizers = []
                while True:
                    st.tokenizers.append(p.next().text.lower())
                    if not p.eat("op", ","):
                        break
                st.raw_tokenizers = list(st.tokenizers)
            if p.eat("kw", "FILTERS"):
                st.filters = []
                while True:
                    fname = p.next().text.lower()
                    if p.eat("op", "("):
                        args = []
                        while not (p.peek().kind == "op" and p.peek().text == ")"):
                            t_ = p.next()
                            if t_.kind == "num":
                                args.append(int(t_.text))
                            elif t_.kind == "str":
                                args.append(t_.text[1:-1])
                            elif t_.kind in ("name", "kw"):
                                args.append(t_.text.lower())
                            p.eat("op", ",")
                        p.expect("op", ")")
                        st.filters.append((fname, *args))
                    else:
                        st.filters.append(fname)
                    st.raw_filters = [f if isinstance(f, str) else f[0]
                                      for f in st.filters]
                    if not p.eat("op", ","):
                        break
            if p.eat_word("COMMENT"):
                ct = p.next()
                st.comment = ct.text[1:-1] if ct.kind == "str" else ct.text
            return st
        if what.text == "FUNCTION":
            # DEFINE FUNCTION fn::name($a: type, $b: option<type>) {
            #   LET $x = ...; RETURN <expr> }   (define/function.rs; language
            # tests statements/define/function/*.surql)
            name = _name(p)
            t0 = p.peek()
            p.expect("op", "(")
            params, ptypes = [], []
            while p.peek().kind == "param":
                params.append(p.next().text[1:])
                ptypes.append(_param_type(p))
                if not p.eat("op", ","):
                    break
            p.expect("op", ")")
            if p.eat("op", "->"):
                # return-type annotation `-> string` — display-only
                p.next()
                if p.eat("op", "<"):
                    depth = 1
                    while depth:
                        t2 = p.next()
                        depth += (t2.text == "<") - (t2.text == ">")
            p.expect("op", "{")
            body_mark = p.i
            lets = []
            script_src: str | None = None
            try:
                while p.peek().kind == "kw" and p.peek().text == "LET":
                    p.next()
                    ln = p.expect("param").text[1:]
                    p.expect("op", "=")
                    lets.append((ln, p.expr(0)))
                    p.eat("op", ";")
                # statement sequence: the body's value is the FIRST
                # RETURN's expression, else the final expression
                # (expr/block.rs; define/function/{no_returns,
                # second_return}.surql)
                body = ("lit", None)  # empty body `{}` returns NONE
                returned = False
                while not (p.peek().kind == "op" and p.peek().text == "}"):
                    if p.eat("kw", "RETURN"):
                        e = p.expr(0)
                        if not returned:
                            body, returned = e, True
                    elif p.peek_word("BREAK") or p.peek_word("CONTINUE"):
                        # bare BREAK/CONTINUE in a function body: a
                        # control-flow node that errors at call time
                        # (exec/mod.rs:150-155, break_in_function.surql)
                        w = p.next().text.lower()
                        if not returned:
                            body, returned = ("ctrl", w), True
                    else:
                        # a nested `{ .. RETURN x .. }` block returns from
                        # the whole function (ControlFlow::Return
                        # propagates, return/breaks_nested_execution.surql)
                        blk_ret = p.block_contains_return()
                        e = p.expr(0)
                        if not returned:
                            body = e
                            returned = blk_ret
                    if not p.eat("op", ";"):
                        break
                p.expect("op", "}")
            except SyntaxError:
                # statement-shaped body (IF/FOR/THROW/DML): capture the
                # raw block text and run it through the script engine per
                # call (define/function bodies with control flow)
                p.i = body_mark
                lets, body = [], ("lit", None)
                start_pos = p.peek().pos
                depth, end_pos = 1, start_pos
                while depth:
                    t3 = p.next()
                    if t3.kind == "eof":
                        raise SyntaxError("unbalanced function body")
                    if t3.kind == "op" and t3.text == "{":
                        depth += 1
                    elif t3.kind == "op" and t3.text == "}":
                        depth -= 1
                        end_pos = t3.pos
                script_src = p.src[start_pos:end_pos]
            fn_text = p.span_text(t0, p.peek())
            comment = None
            perms = None
            while True:
                if p.eat_word("COMMENT"):
                    ct = p.next()
                    comment = ct.text[1:-1] if ct.kind == "str" \
                        else (ct.orig or ct.text)
                elif p.eat("kw", "PERMISSIONS"):
                    perms = p.next().text.upper()
                else:
                    break
            st = DefineFunctionStmt(name, params, body, ptypes, lets,
                                    text=fn_text, comment=comment)
            st.fn_mode = mode
            st.script_src = script_src
            st.perms = perms
            return st
        if what.text.upper() == "EVENT":
            # DEFINE EVENT name ON [TABLE] tbl [ASYNC [RETRY n]
            # [MAXDEPTH n]] [WHEN cond] THEN expr|{stmts}
            name = _name(p)
            p.expect("kw", "ON")
            p.eat("kw", "TABLE")
            tbl = _name(p)
            st = DefineEventStmt(name, tbl)
            st.mode = mode
            while True:
                if p.eat_word("ASYNC"):
                    st.is_async = True
                elif p.eat_word("RETRY"):
                    if not st.is_async:
                        # RETRY/MAXDEPTH only follow ASYNC (syn/parser/
                        # stmt/define.rs; event/invalid_retry.surql)
                        raise SyntaxError("RETRY must be set after ASYNC")
                    st.retry = int(p.expect("num").text)
                elif p.eat_word("MAXDEPTH"):
                    if not st.is_async:
                        raise SyntaxError(
                            "MAXDEPTH must be set after ASYNC")
                    st.maxdepth = int(p.expect("num").text)
                else:
                    break
            if p.eat_word("WHEN"):
                t0 = p.peek()
                st.when = p.expr(0)
                st.when_text = p.span_text(t0, p.peek())
            p.expect_word("THEN")
            t0 = p.peek()
            if p.peek().kind == "op" and p.peek().text == "{":
                st.then = _raw_block_statements(p)
            else:
                st.then = [_raw_expr_text(p)]
            end = p.peek()
            st.then_src = p.span_text(
                t0, None if end.kind == "eof" else end)
            if p.eat_word("COMMENT"):
                ct = p.next()
                st.comment = ct.text[1:-1] if ct.kind == "str" \
                    else (ct.orig or ct.text)
            return st
        if what.text.upper() == "PARAM":
            name = p.expect("param").text[1:]
            p.expect("kw", "VALUE")
            st = DefineParamStmt(name, p.expr(0))
            st.mode = mode
            while True:
                if p.eat_word("COMMENT"):
                    ct = p.next()
                    st.comment = ct.text[1:-1] if ct.kind == "str" else ct.text
                elif p.eat("kw", "PERMISSIONS"):
                    st.perms = "NONE" if p.eat("kw", "NONE") else (
                        p.eat("kw", "FULL") and "FULL") or "FULL"
                else:
                    break
            return st
        if what.text.upper() == "SEQUENCE":
            name = _name(p)
            st = DefineSequenceStmt(name)
            st.mode = mode
            while True:
                if p.eat_word("BATCH"):
                    st.batch = int(p.expect("num").text)
                elif p.eat("kw", "START"):
                    neg = bool(p.eat("op", "-"))
                    st.start = int(p.expect("num").text) * (-1 if neg else 1)
                elif p.eat("kw", "TIMEOUT"):
                    if p.peek().kind == "param":
                        st.timeout = ("param", p.next().text[1:])
                    else:
                        st.timeout = _duration_text(p)
                else:
                    break
            return st
        if what.text.upper() in ("ACCESS", "USER"):
            kindw = what.text.lower()
            nm = _name(p)
            st = DefineMiscStmt(kindw, nm)
            st.mode = mode
            if p.eat("kw", "ON"):
                st.level = p.next().text.upper()
            cl = st.clauses
            while True:
                if p.eat("kw", "TYPE"):
                    cl["type"] = p.next().text.upper()
                elif p.eat_word("ALGORITHM"):
                    cl["alg"] = p.next().text.upper()
                elif p.eat_word("KEY"):
                    p.next()
                    cl["key"] = True
                elif p.eat_word("WITH") or p.eat_word("ISSUER"):
                    pass
                elif p.eat_word("PASSWORD") or p.eat_word("PASSHASH"):
                    p.next()
                elif p.eat_word("ROLES"):
                    roles = [p.next().text.upper()]
                    while p.eat("op", ","):
                        roles.append(p.next().text.upper())
                    cl["roles"] = roles
                elif p.eat_word("DURATION"):
                    pass
                elif p.eat("kw", "FOR") or p.eat_word("FOR"):
                    w = p.next().text.upper()
                    if p.peek().kind == "param":
                        cl[w.lower()] = ("param", p.next().text[1:])
                    elif p.eat("kw", "NONE"):
                        cl[w.lower()] = None
                    else:
                        cl[w.lower()] = _duration_text(p)
                    p.eat("op", ",")
                elif p.eat_word("COMMENT"):
                    ct = p.next()
                    cl["comment"] = ct.text[1:-1] if ct.kind == "str" \
                        else ("param", ct.text[1:])
                elif p.eat_word("AUTHENTICATE") or p.eat_word("SIGNUP") \
                        or p.eat_word("SIGNIN"):
                    p.expr(0)
                else:
                    break
            return st
        if what.text.upper() == "API":
            mode_a = mode or _eat_define_mods(p)
            t_ = p.next()
            path = t_.text[1:-1] if t_.kind == "str" \
                else ("param", t_.text[1:]) if t_.kind == "param" \
                else (t_.orig or t_.text)
            st = DefineMiscStmt("api", path)
            st.mode = mode_a
            cl = st.clauses
            cl["groups"] = []
            cur = None
            while True:
                if p.eat("kw", "FOR") or p.eat_word("FOR"):
                    methods = [p.next().text.lower()]
                    while p.eat("op", ","):
                        methods.append(p.next().text.lower())
                    cur = {"methods": methods, "middleware": None,
                           "perms": "FULL", "then": None,
                           "fallback": methods == ["any"]}
                    cl["groups"].append(cur)
                elif p.eat_word("MIDDLEWARE"):
                    t0 = p.peek()
                    p.expr(0)
                    mw = p.span_text(t0, p.peek())
                    if cur is not None:
                        cur["middleware"] = mw
                    else:
                        cl["middleware"] = mw
                elif p.eat("kw", "PERMISSIONS"):
                    if p.eat("kw", "NONE"):
                        pm = "NONE"
                    elif p.eat("kw", "FULL"):
                        pm = "FULL"
                    else:
                        p.expect("kw", "WHERE")
                        t0 = p.peek()
                        p.expr(0)
                        pm = "WHERE " + p.span_text(t0, p.peek())
                    if cur is not None:
                        cur["perms"] = pm
                    else:
                        cl["perms"] = pm
                elif p.eat_word("THEN"):
                    t0 = p.peek()
                    if p.peek().kind == "op" and p.peek().text == "{":
                        _raw_block_statements(p)
                    else:
                        _raw_expr_text(p)
                    body = p.span_text(
                        t0, None if p.peek().kind == "eof" else p.peek())
                    if cur is not None:
                        cur["then"] = body
                elif p.eat_word("COMMENT"):
                    ct = p.next()
                    cl["comment"] = ct.text[1:-1] if ct.kind == "str" \
                        else ("param", ct.text[1:])
                else:
                    break
            return st
        if what.text.upper() == "CONFIG":
            _cfg_mode = mode or _eat_define_mods(p)
            got = _parse_config_body(p)
            if got is not None:
                got.mode = _cfg_mode
                return got
            p.expect_word("DEFAULT")
            st = DefineMiscStmt("config", "default")
            while True:
                if p.eat_word("NAMESPACE") or p.eat_word("NS"):
                    t_ = p.next()
                    st.clauses["namespace"] = ("param", t_.text[1:]) \
                        if t_.kind == "param" else (t_.orig or t_.text)
                elif p.eat_word("DATABASE") or p.eat_word("DB"):
                    t_ = p.next()
                    st.clauses["database"] = ("param", t_.text[1:]) \
                        if t_.kind == "param" else (t_.orig or t_.text)
                else:
                    break
            return st
        raise SyntaxError(f"DEFINE {what.text} not supported")
    if word == "REMOVE":
        p.next()
        what = p.next()
        kind = what.text.lower()
        if kind not in ("table", "field", "index", "analyzer", "function",
                        "param", "sequence", "event", "bucket", "access",
                        "user", "api", "namespace", "database", "ns", "db",
                        "config"):
            raise SyntaxError(f"REMOVE {what.text} not supported")
        if_exists = bool(p.eat_word("IF") and p.expect_word("EXISTS"))
        if kind == "api":
            t_ = p.next()
            name = t_.text[1:-1] if t_.kind == "str" else (t_.orig or t_.text)
        elif p.peek().kind == "param" and kind != "param":
            name = p.next().text  # "$x" — resolved at execution
        elif kind == "field":
            name = _field_path(p)  # dotted paths: obj.nested
        else:
            name = (p.expect("param").text[1:] if kind == "param"
                    else _name(p))
        if kind == "function" and p.peek().kind == "op" \
                and p.peek().text == "(":
            # optional empty parens: REMOVE FUNCTION fn::example()
            p.next()
            p.expect("op", ")")
        tbl = None
        if p.eat("kw", "ON"):
            p.eat("kw", "TABLE")
            tbl = (p.next().text if p.peek().kind == "param"
                   else _name(p))
        return RemoveStmt(kind, name, tbl, if_exists)
    if word == "ALTER":
        p.next()
        if p.peek().text.upper() == "CONFIG":
            # ALTER CONFIG [IF EXISTS] GRAPHQL|API|DEFAULT <clauses> —
            # upserts the config entry (statements/alter/config.surql)
            p.next()
            if_e = bool(p.eat_word("IF") and p.expect_word("EXISTS"))
            got = _parse_config_body(p)
            if got is None:
                p.expect_word("DEFAULT")
                got = DefineMiscStmt("config_default", "Default")
                while True:
                    if p.eat_word("NAMESPACE") or p.eat_word("NS"):
                        got.clauses["namespace"] = _name(p)
                    elif p.eat_word("DATABASE") or p.eat_word("DB"):
                        got.clauses["database"] = _name(p)
                    else:
                        break
            got.mode = "alter_ine" if if_e else "alter"
            return got
        if not (p.peek().kind == "kw" and p.peek().text == "TABLE"):
            # ALTER ANALYZER/PARAM/BUCKET/SEQUENCE name <SET|DROP clauses>
            # (statements/alter/*.rs) — clause-wise updates over the stored
            # canonical definition
            what2 = p.next().text.upper()
            if_exists = bool(p.eat_word("IF") and p.expect_word("EXISTS"))
            if what2 == "FIELD":
                # reuse the DEFINE FIELD clause grammar; DROP <clause>
                # entries are collected textually first
                import re as _re6

                t0 = p.peek()
                rest = p.span_text(t0)
                while p.peek().kind != "eof":
                    p.next()
                drops = [d.upper() for d in
                         _re6.findall(r"\bDROP\s+(\w+)", rest, _re6.I)]
                core = _re6.sub(r"\bDROP\s+\w+", " ", rest)
                ds = parse_statement("DEFINE FIELD " + core)
                st2 = AlterDetailStmt("field", ds.name, table=ds.table,
                                      if_exists=if_exists,
                                      sets={"stmt": ds}, drops=drops)
                return st2
            if what2 in ("EVENT", "INDEX"):
                name2 = _name(p)
                p.expect("kw", "ON")
                p.eat("kw", "TABLE")
                st2 = AlterDetailStmt(what2.lower(), name2,
                                      table=_name(p), if_exists=if_exists)
                while p.peek().kind != "eof":
                    if p.eat_word("DROP"):
                        st2.drops.append(p.next().text.upper())
                    elif p.eat_word("WHEN"):
                        t0 = p.peek()
                        st2.sets["when"] = p.expr(0)
                        st2.sets["when_text"] = p.span_text(t0, p.peek())
                    elif p.eat_word("THEN"):
                        t0 = p.peek()
                        if p.peek().kind == "op" and p.peek().text == "{":
                            st2.sets["then"] = _raw_block_statements(p)
                        else:
                            st2.sets["then"] = [_raw_expr_text(p)]
                        st2.sets["then_src"] = p.span_text(
                            t0, None if p.peek().kind == "eof"
                            else p.peek())
                    elif p.eat_word("COMMENT"):
                        ct = p.next()
                        st2.sets["comment"] = (ct.text[1:-1]
                                               if ct.kind == "str"
                                               else ct.orig or ct.text)
                    elif p.eat_word("ASYNC"):
                        st2.sets["is_async"] = True
                    elif p.eat_word("RETRY"):
                        st2.sets["retry"] = int(p.expect("num").text)
                    elif p.eat_word("MAXDEPTH"):
                        st2.sets["maxdepth"] = int(p.expect("num").text)
                    elif p.eat_word("PREPARE"):
                        p.expect_word("REMOVE")
                        st2.sets["prepare_remove"] = True
                    elif p.eat_word("COMPACT"):
                        pass  # storage maintenance no-op here
                    else:
                        raise SyntaxError(
                            f"ALTER {what2}: unexpected {p.peek().text!r}")
                return st2
            if what2 == "FUNCTION":
                t0 = p.peek()
                name2 = _name(p)
                st2 = AlterDetailStmt("function", name2,
                                      if_exists=if_exists)
                if p.peek().kind == "op" and p.peek().text == "(":
                    # full redefinition: capture raw and re-run as
                    # DEFINE FUNCTION OVERWRITE
                    st2.redefine_src = p.span_text(t0)
                    while p.peek().kind != "eof":
                        p.next()
                    return st2
                while p.peek().kind != "eof":
                    if p.eat_word("DROP"):
                        st2.drops.append(p.next().text.upper())
                    elif p.eat_word("COMMENT"):
                        ct = p.next()
                        st2.sets["comment"] = (ct.text[1:-1]
                                               if ct.kind == "str"
                                               else ct.orig or ct.text)
                    elif p.eat("kw", "PERMISSIONS") or \
                            p.eat_word("PERMISSIONS"):
                        st2.sets["perms"] = p.next().text.upper()
                    else:
                        raise SyntaxError(
                            f"ALTER FUNCTION: unexpected "
                            f"{p.peek().text!r}")
                return st2
            if what2 in ("ACCESS", "USER"):
                name2 = _name(p)
                p.expect("kw", "ON")
                st2 = AlterDetailStmt(what2.lower(), name2,
                                      level=p.next().text.upper(),
                                      if_exists=if_exists)
                while p.peek().kind != "eof":
                    if p.eat_word("DROP"):
                        st2.drops.append(p.next().text.upper())
                    elif p.eat_word("DURATION"):
                        pass
                    elif p.eat("kw", "FOR") or p.eat_word("FOR"):
                        w = p.next().text.upper()
                        if p.eat("kw", "NONE"):
                            st2.sets[w.lower()] = None
                        else:
                            st2.sets[w.lower()] = _duration_text(p)
                        p.eat("op", ",")
                    elif p.eat_word("COMMENT"):
                        ct = p.next()
                        st2.sets["comment"] = (ct.text[1:-1]
                                               if ct.kind == "str"
                                               else ct.orig or ct.text)
                    elif p.eat_word("ROLES"):
                        roles = [p.next().text.upper()]
                        while p.eat("op", ","):
                            roles.append(p.next().text.upper())
                        st2.sets["roles"] = roles
                    elif p.eat_word("PASSWORD") or p.eat_word("PASSHASH"):
                        p.next()
                    else:
                        raise SyntaxError(
                            f"ALTER {what2}: unexpected {p.peek().text!r}")
                return st2
            if what2 == "API":
                t_ = p.next()
                path2 = t_.text[1:-1] if t_.kind == "str" \
                    else (t_.orig or t_.text)
                st2 = AlterDetailStmt("api", path2, if_exists=if_exists)
                while p.peek().kind != "eof":
                    if p.eat_word("DROP"):
                        st2.drops.append(p.next().text.upper())
                    elif p.eat_word("COMMENT"):
                        ct = p.next()
                        st2.sets["comment"] = (ct.text[1:-1]
                                               if ct.kind == "str"
                                               else ct.orig or ct.text)
                    elif p.eat("kw", "FOR") or p.eat_word("FOR"):
                        meth = p.next().text.lower()
                        if p.eat_word("DROP"):
                            p.expect_word("THEN")
                            st2.api_for.append((meth, "drop", None))
                        else:
                            p.expect_word("THEN")
                            t0 = p.peek()
                            if p.peek().kind == "op" \
                                    and p.peek().text == "{":
                                _raw_block_statements(p)
                            else:
                                _raw_expr_text(p)
                            body = p.span_text(
                                t0, None if p.peek().kind == "eof"
                                else p.peek())
                            st2.api_for.append((meth, "then", body))
                    else:
                        raise SyntaxError(
                            f"ALTER API: unexpected {p.peek().text!r}")
                return st2
            if what2 in ("SYSTEM", "NAMESPACE", "DATABASE", "NS", "DB"):
                st2 = AlterDetailStmt("system", what2.lower())
                if p.peek().kind == "eof":
                    # bare `ALTER SYSTEM;` — at least one clause required
                    # (alter_system_parsing_error.surql)
                    raise SyntaxError(
                        f"ALTER {what2}: expected a clause, got end of "
                        "statement")
                while p.peek().kind != "eof":
                    if p.eat_word("COMPACT"):
                        st2.sets["compact"] = True
                    elif p.eat_word("QUERY_TIMEOUT"):
                        st2.sets["query_timeout"] = _duration_text(p)
                    elif p.eat_word("DROP"):
                        st2.drops.append(p.next().text.upper())
                    else:
                        raise SyntaxError(
                            f"ALTER {what2}: unexpected {p.peek().text!r}")
                return st2
            aname = (p.expect("param").text[1:] if what2 == "PARAM"
                     else _name(p))
            ast_ = AlterObjStmt(what2.lower(), aname, if_exists=if_exists)
            while p.peek().kind != "eof":
                if p.eat_word("DROP"):
                    ast_.drops.append(p.next().text.upper())
                elif p.eat_word("COMMENT"):
                    ct = p.next()
                    ast_.sets["COMMENT"] = (ct.text[1:-1] if ct.kind == "str"
                                            else ct.text)
                elif p.eat("kw", "VALUE"):
                    ast_.sets["VALUE"] = p.expr(0)
                elif p.eat("kw", "PERMISSIONS"):
                    ast_.sets["PERMISSIONS"] = (
                        "NONE" if p.eat("kw", "NONE")
                        else ("FULL" if p.eat("kw", "FULL") else "FULL"))
                elif p.eat("kw", "TOKENIZERS"):
                    toks = [p.next().text.lower()]
                    while p.eat("op", ","):
                        toks.append(p.next().text.lower())
                    ast_.sets["TOKENIZERS"] = toks
                elif p.eat("kw", "FILTERS"):
                    fls = [p.next().text.lower()]
                    while p.eat("op", ","):
                        fls.append(p.next().text.lower())
                    ast_.sets["FILTERS"] = fls
                elif p.eat_word("BACKEND"):
                    bt = p.next()
                    ast_.sets["BACKEND"] = (bt.text[1:-1] if bt.kind == "str"
                                            else bt.text)
                elif p.eat_word("READONLY"):
                    ast_.sets["READONLY"] = True
                elif p.eat_word("BATCH"):
                    ast_.sets["BATCH"] = int(p.expect("num").text)
                elif p.eat("kw", "TIMEOUT") or p.eat_word("TIMEOUT"):
                    # ALTER SEQUENCE ... TIMEOUT 5s | NONE
                    # (statements/alter/sequence.rs)
                    if p.eat("kw", "NONE"):
                        ast_.sets["TIMEOUT"] = None
                    else:
                        ast_.sets["TIMEOUT"] = _duration_text(p)
                elif p.eat("kw", "START"):
                    neg = bool(p.eat("op", "-"))
                    ast_.sets["START"] = int(p.expect("num").text) * (
                        -1 if neg else 1)
                else:
                    raise SyntaxError(
                        f"ALTER {what2}: unexpected {p.peek().text!r}")
            return ast_
        p.expect("kw", "TABLE")
        if_e = bool(p.eat_word("IF") and p.expect_word("EXISTS"))
        st = AlterTableStmt(_name(p))
        st.if_exists = if_e
        while True:
            if p.eat("kw", "SCHEMAFULL"):
                st.schemafull = True
            elif p.eat("kw", "SCHEMALESS"):
                st.schemafull = False
            elif p.eat("kw", "TYPE"):
                st.ttype = p.next().text.upper()
            elif p.eat_word("COMMENT"):
                ct = p.next()
                st.comment = ct.text[1:-1] if ct.kind == "str" else ct.text
            elif p.eat_word("COMPACT"):
                st.compact = True  # storage maintenance request
            elif p.eat_word("CHANGEFEED"):
                st.changefeed = _duration_text(p)
            elif p.eat_word("DROP"):
                st.drops.append(p.next().text.upper())
            elif p.eat("kw", "PERMISSIONS"):
                if p.eat("kw", "NONE"):
                    st.select_perm = "none"
                    st.perm_updates = {v: "NONE" for v in
                                       ("select", "create", "update",
                                        "delete")}
                elif p.eat("kw", "FULL"):
                    st.select_perm = "full"
                    st.perm_updates = {v: "FULL" for v in
                                       ("select", "create", "update",
                                        "delete")}
                else:
                    while p.eat("kw", "FOR") or (
                            p.peek().kind == "op" and p.peek().text == ","
                            and p.toks[p.i + 1].kind == "kw"
                            and p.toks[p.i + 1].text == "FOR"
                            and bool(p.next()) and bool(p.next())):
                        verbs = []
                        while True:
                            verbs.append(p.next().text.lower())
                            if not p.eat("op", ","):
                                break
                            if p.peek().kind == "kw" \
                                    and p.peek().text == "FOR":
                                # `FOR select FULL, FOR create NONE` —
                                # comma separates verb GROUPS; put it back
                                p.i -= 1
                                break
                        if p.eat("kw", "NONE"):
                            perm: object = "none"
                        elif p.eat("kw", "FULL"):
                            perm = "full"
                        else:
                            p.expect("kw", "WHERE")
                            perm = p.expr(0)
                        for v in verbs:
                            if perm in ("none", "full"):
                                st.perm_updates[v] = perm.upper()
                        if "select" in verbs:
                            st.select_perm = perm
            else:
                break
        return st
    if word == "REBUILD":
        p.next()
        p.expect("kw", "INDEX")
        if_exists = bool(p.eat_word("IF") and p.expect_word("EXISTS"))
        name = _name(p)
        p.expect("kw", "ON")
        p.eat("kw", "TABLE")
        tbl = _name(p)
        return RebuildIndexStmt(name, tbl, if_exists)
    if word == "INFO":
        p.next()
        p.expect("kw", "FOR")
        lvl = p.next()
        if lvl.text.upper() in ("DB", "DATABASE"):
            return InfoStmt("db", structure=bool(p.eat_word("STRUCTURE")))
        if lvl.text.upper() in ("TABLE", "TB"):
            return InfoStmt("table", table=_name(p),
                            structure=bool(p.eat_word("STRUCTURE")))
        if lvl.text.upper() == "INDEX":
            name = _name(p)
            p.expect("kw", "ON")
            p.eat("kw", "TABLE")
            return InfoStmt("index", name=name, table=_name(p))
        if lvl.text.upper() in ("NS", "NAMESPACE"):
            return InfoStmt("ns")
        if lvl.text.upper() == "ROOT":
            return InfoStmt("root")
        if lvl.text.upper() == "KV":
            return InfoStmt("kv")
        raise SyntaxError(f"INFO FOR {lvl.text} not supported")
    if word == "LIVE":
        # LIVE SELECT [DIFF | f1, f2 | *] FROM tbl [WHERE cond] (live.rs)
        p.next()
        p.expect("kw", "SELECT")
        diff = bool(p.eat_word("DIFF"))
        fields = None
        if not diff and not p.eat("op", "*"):
            if not p.peek_word("FROM"):
                fields = []
                while True:
                    fields.append(_name(p))
                    if not p.eat("op", ","):
                        break
        p.expect("kw", "FROM")
        tbl = _name(p)
        where = p.expr(0) if p.eat("kw", "WHERE") else None
        return LiveStmt(tbl, diff, fields, where)
    if word == "SHOW":
        p.next()
        p.expect_word("CHANGES")
        p.expect("kw", "FOR")
        p.expect("kw", "TABLE")
        st = ShowChangesStmt(_name(p))
        if p.eat_word("SINCE"):
            st.since = int(p.expect("num").text)
        if p.eat("kw", "LIMIT"):
            st.limit = int(p.expect("num").text)
        return st
    if word == "KILL":
        p.next()
        return KillStmt(p.expr(0))
    if word == "OPTION":
        # OPTION IMPORT / OPTION <flag> [= true|false] — session flags for
        # import tooling (statements/option.rs); indexes here are virtual
        # (Catalyst pushdown), so the flag is a parsed no-op → NONE
        p.next()
        p.next()
        if p.eat("op", "="):
            p.next()
        return ("noop",)
    raise SyntaxError(f"unsupported statement {t.text!r}")


def _raw_expr_text(p: Parser) -> str:
    """Reconstruct the source text of one expression (used where a clause
    body re-enters the statement runner later, e.g. event THEN bodies).
    A parenthesized body may be a full statement — capture it raw."""
    start = p.i
    if p.peek().kind == "op" and p.peek().text == "(":
        depth = 0
        while True:
            t = p.next()
            if t.kind == "eof":
                raise SyntaxError("unterminated parenthesized body")
            if t.kind == "op" and t.text == "(":
                depth += 1
            elif t.kind == "op" and t.text == ")":
                depth -= 1
                if depth == 0:
                    break
    else:
        p.expr(0)
    return " ".join((t.orig or t.text) for t in p.toks[start:p.i])


def _raw_block_statements(p: Parser) -> list[str]:
    """`{ stmt; stmt; ... }` — split into raw statement strings."""
    p.expect("op", "{")
    depth = 0
    stmts, cur = [], []
    while True:
        t = p.next()
        if t.kind == "eof":
            raise SyntaxError("unterminated block")
        if t.kind == "op" and t.text in "([{":
            depth += 1
        elif t.kind == "op" and t.text in ")]}":
            if t.text == "}" and depth == 0:
                break
            depth -= 1
        if t.kind == "op" and t.text == ";" and depth == 0:
            if cur:
                stmts.append(" ".join(cur))
            cur = []
        else:
            cur.append(t.orig or t.text)
    if cur:
        stmts.append(" ".join(cur))
    return stmts


def _target(p: Parser) -> Target:
    if p.peek().kind == "op" and p.peek().text == "|":
        # |tb:n| / |tb:lo..hi| mock target (expr/mock.rs) — reuse the
        # expression-mock parser for the bound forms
        mv = p.prefix()
        if mv[0] != "mockv":
            raise SyntaxError("expected a mock target")
        _, tb, spec = mv
        if spec[0] == "count":
            return Target(tb, mock=spec[1])
        from surrealdb_spark.sql.compiler import _mock_ids

        keys = _mock_ids(spec)
        return Target(tb, mock=len(keys), mock_keys=keys)
    if p.peek().kind == "param":
        nxt = p.toks[p.i + 1] if p.i + 1 < len(p.toks) else None
        if nxt is not None and nxt.kind == "op" and nxt.text in (".", "["):
            # UPSERT $before.city — idiom-path target resolved at
            # execution (self-referential events, doc/event.rs)
            return Target(None, ("texpr", p.prefix()))
        # UPDATE $record / DELETE $record — resolved at execution from the
        # bound record (or record-id string)
        return Target(None, ("param", p.next().text[1:]))
    if p.peek().kind == "name" and "::" in p.peek().text and \
            p.toks[p.i + 1].kind == "op" and p.toks[p.i + 1].text == "(":
        # CREATE type::record('tb', $i) — expression target resolved at
        # execution (planner/dynamic_scan corpus; fnc/type.rs record)
        return Target(None, ("texpr", p.prefix()))
    tb = _name(p)
    if p.peek().kind == "op" and p.peek().text == ":":
        p.next()
        if p.peek().kind == "op" and p.peek().text == "[":
            # array-keyed target `CREATE i:[$i]` (record_id/key.rs Array)
            return Target(tb, ("kexpr", p.prefix()))
        if p.peek().kind == "op" and p.peek().text == "{":
            # object-keyed target `CREATE t:{ id: 4 }` (key.rs Object)
            obj = p.prefix()
            from surrealdb_spark.values import (render_rid_obj,
                                                rid_obj_literal)

            if obj[0] == "object" and rid_obj_literal(obj):
                return Target(tb, render_rid_obj(obj))
            return Target(tb, ("kexpr", obj))
        kt = p.next()
        if kt.kind == "name" and kt.text in ("ulid", "uuid", "rand") \
                and p.peek().kind == "op" and p.peek().text == "(":
            # generated key `tb:ulid()` / `tb:uuid()` / `tb:rand()`
            # (record_id/key.rs Generate)
            p.next()
            p.expect("op", ")")
            return Target(tb, ("genkey", kt.text))
        key: object = (int(kt.text) if kt.kind == "num"
                       else (kt.orig or kt.text.lower()) if kt.kind == "kw"
                       else kt.text)
        return Target(tb, key)
    return Target(tb)


def _assignments(p: Parser) -> list:
    """SET targets are idiom paths: `f`, `f.g`, `f[$key]`
    (expr/data.rs Data::SetExpression carries Idioms)."""
    out = []
    while True:
        f_ = _name(p)
        segs: list = []
        while True:
            if p.eat("op", "."):
                segs.append(("f", _name(p)))
            elif p.peek().kind == "op" and p.peek().text == "[":
                p.next()
                segs.append(("i", p.expr(0)))
                p.expect("op", "]")
            else:
                break
        opt = p.next()
        if opt.text not in ("=", "+=", "-=", "+?="):
            raise SyntaxError(f"expected assignment op, got {opt.text!r}")
        target = f_ if not segs else ("fpath", f_, segs)
        out.append((target, opt.text, p.expr(0)))
        if not p.eat("op", ","):
            break
    return out


def _data_clause(p: Parser):
    """SET/CONTENT/MERGE/PATCH (expr/data.rs Data variants)."""
    if p.eat("kw", "SET"):
        return ("set", _assignments(p))
    if p.eat("kw", "CONTENT"):
        return ("content", p.expr(0))
    if p.eat("kw", "MERGE"):
        return ("merge", p.expr(0))
    if p.eat("kw", "PATCH"):
        return ("patch", p.expr(0))
    if p.eat_word("UNSET"):
        # UNSET f, g — remove fields (expr/data.rs Data::UnsetExpression);
        # lowered to `f = NONE` assignments (NONE-set fields go absent)
        fields = [_name(p)]
        while p.eat("op", ","):
            fields.append(_name(p))
        return ("set", [(f, "=", ("lit", None)) for f in fields])
    return None


def _select_to_sql(sel) -> str:
    """Canonical printed form of a parsed SELECT (statements/define/
    table.rs re-prints the view query from its AST in INFO output)."""
    from surrealdb_spark.sql.explain import to_sql

    if sel.value_expr is not None:
        body = "VALUE " + to_sql(sel.value_expr)
    elif sel.fields:
        body = ", ".join(
            to_sql(f.expr) + (f" AS {f.alias}" if f.alias else "")
            for f in sel.fields)
    else:
        body = "*"
    srcs = ", ".join(s if isinstance(s, str) else "?" for s in sel.sources)
    out = f"SELECT {body} FROM {srcs}"
    if sel.where is not None:
        out += f" WHERE {to_sql(sel.where)}"
    if sel.group == []:
        out += " GROUP ALL"
    elif sel.group:
        out += " GROUP BY " + ", ".join(to_sql(g) for g in sel.group)
    return out


def _return_clause(p: Parser, default: str = "AFTER"):
    """RETURN NONE/BEFORE/AFTER/DIFF, RETURN VALUE <expr>, or RETURN
    <field-list> (expr/output.rs Output variants)."""
    if not p.eat("kw", "RETURN"):
        return default
    t = p.peek()
    if t.text in _RETURNS:
        p.next()
        return t.text
    if t.text == "VALUE" or (t.kind == "kw" and t.text == "VALUE"):
        p.next()
        return ("value", p.expr(0))
    fields = []
    while True:
        e = p.expr(0)
        alias = None
        if p.eat("kw", "AS"):
            alias = p.expect("name").text
        fields.append((e, alias))
        if not p.eat("op", ","):
            break
    return ("fields", fields)


# -- execution ---------------------------------------------------------------


_OLTP_CAP = 10_000


def _plain_value(v):
    """Collected Spark values → plain Python (Rows become dicts, so bound
    params walk/compare/re-lit cleanly)."""
    from pyspark.sql import Row

    if isinstance(v, Row):
        return {k: _plain_value(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_plain_value(x) for x in v]
    return v


def _has_wsub(ast, _seen: frozenset = frozenset()) -> bool:
    """True when the AST tree carries a writable-subquery node (or a
    user-function call — its body may carry one).  `_seen` tracks
    user-function names already being expanded so a recursive fn::f
    terminates instead of overflowing the stack."""
    if not isinstance(ast, tuple):
        return False
    if ast[0] == "wsub":
        return True
    if ast[0] == "call" and isinstance(ast[1], str):
        from surrealdb_spark import pyeval as _pyh

        nm = ast[1] if ast[1].startswith("fn::") else f"fn::{ast[1]}"
        if nm in _pyh.SCRIPT_FNS:
            return True  # statement-shaped body: may write
        if nm in _pyh.USER_FNS and nm not in _seen and _has_wsub(
                _pyh.USER_FNS[nm][2], _seen | {nm}):
            return True
    for x in ast:
        if isinstance(x, tuple) and _has_wsub(x, _seen):
            return True
        if isinstance(x, list) and any(
                isinstance(y, tuple) and _has_wsub(y, _seen) for y in x):
            return True
    return False


def _bounded_collect(df: DataFrame, what: str, cap: int = _OLTP_CAP) -> list:
    """Driver-side materialization with a LOUD overflow: OLTP-scoped
    reference semantics (event firing, ON DELETE enforcement, statement
    results) are driver loops by design, but silently dropping rows above
    the cap is a correctness bug — fail like script.py's FOR guard."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise MutationError(
            f"{what} exceeds the {cap}-row driver materialization cap — "
            "a driver loop at that size is a scale bug; restructure as a "
            "DataFrame operation or raise the cap explicitly"
        )
    return rows


class StatementRunner:
    """Executes parsed statements against a Database + Catalog pair.

    SELECTs read through the catalog (DML-created tables are registered on
    it); mutations lower to dml.Database batch jobs.
    """

    def __init__(self, spark: SparkSession, db: Database,
                 catalog: Catalog | None = None, sf_dir: str | None = None):
        self.spark = spark
        self.db = db
        self.catalog = catalog if catalog is not None else (
            Catalog(spark, sf_dir) if sf_dir else Catalog(spark)
        )
        self.functions: dict[str, DefineFunctionStmt] = {}
        # user-function registries are module-global (compile + driver
        # twins): a fresh runner starts with a clean fn:: slate so
        # definitions don't leak across databases/golden files
        from surrealdb_spark import pyeval as _pyi
        from surrealdb_spark.functions.registry import REGISTRY as _REG

        for k in [k for k in _REG if k.startswith("fn::")]:
            _REG.pop(k, None)
        _pyi.USER_FNS.clear()
        _pyi.SCRIPT_FNS.clear()
        # DEFINE INDEX artifacts: name → FulltextIndex | signed-SRP frame
        self.indexes: dict[str, object] = {}
        self.index_defs: dict[str, DefineIndexStmt] = {}
        # DEFINE PARAM / SEQUENCE / EVENT registries (define/{param,
        # sequence,event}.rs)
        self.params_defined: dict[str, object] = {}
        self.sequences: dict[str, object] = {}
        self.events: dict[str, tuple] = {}  # name → (table, hook)
        # name → (table, when_ast, then_stmts) — raw definition, used by
        # the view-event delta firing (hooks close over their own copies)
        self.event_defs: dict[str, tuple] = {}
        # canonical DEFINE texts for INFO (info.rs renders the catalog as
        # one object of category → name → definition text)
        self.meta: dict[str, dict[str, str]] = {c: {} for c in _INFO_DB_CATS}
        self.table_meta: dict[str, dict[str, dict[str, str]]] = {}
        # structured clause state behind the canonical texts (ALTER edits)
        self.obj_info: dict[str, dict[str, dict]] = {
            "analyzers": {}, "params": {}, "buckets": {}, "sequences": {},
            "tables": {}}
        # REFERENCE-declared fields: table → [(field, target table|None)]
        # and COMPUTED <~ fields: table → {field: [(ref_table, ref_field)]}
        # (define/field.rs reference tracking; scan/reference.rs)
        self.ref_fields: dict[str, list] = {}
        self.computed_fields: dict[str, dict] = {}
        # declared TYPE of a COMPUTED field — write-time coercion check
        # (computed/typed.surql)
        self.computed_kinds: dict[tuple[str, str], str] = {}
        # DEFINE TABLE v AS SELECT — view name → (Select AST, raw text);
        # recomputed at read in _refresh_catalog (the reference maintains
        # these incrementally per mutation, catalog/aggregation.rs — same
        # read results; views.py is the incremental 100 TB engine)
        self.view_defs: dict[str, tuple] = {}
        # DEFINE NAMESPACE/DATABASE registry + STRICT mode: when the active
        # database was DEFINEd STRICT, tables must be DEFINEd before use
        # (core strict-mode checks in doc/{create,select}.rs).
        # databases is ns-scoped: ns → name → {strict, text}
        self.databases: dict[str, dict[str, dict]] = {}
        self.namespaces: dict[str, dict] = {}
        self.strict = False
        # namespace/root-level catalogs (accesses/users) + KV defaults
        self.ns_meta: dict[str, dict] = {}
        self.root_meta: dict[str, dict] = {}
        self.kv_defaults: dict = {}
        # root-level config objects (DEFINE CONFIG DEFAULT stores at ROOT;
        # ALTER CONFIG DEFAULT stores at DB — REMOVE checks ROOT only,
        # statements/remove/config/default.surql vs alter_config.surql)
        self.root_configs: set = set()
        # connecting with a ns/db selected auto-defines both (the
        # reference creates them lazily on first use in non-strict mode)
        from surrealdb_spark.functions.extra_fns import SessionContext

        _ns, _db = SessionContext.get("ns"), SessionContext.get("db")
        if _ns:
            self.namespaces[_ns] = {
                "strict": False, "text": f"DEFINE NAMESPACE {_ns}"}
            if _db:
                self.databases[_ns] = {_db: {
                    "strict": False, "text": f"DEFINE DATABASE {_db}"}}
        # record::is_edge / record::exists resolve ids through this runner's
        # database (driver-side point read, fnc/record.rs)
        from surrealdb_spark.functions.misc_fns import set_record_provider

        def _lookup_record(rid: str):
            tb, _, _key = str(rid).partition(":")
            if tb not in self.db.tables or not self.db._exists(tb):
                return None
            idc = self.db.tables[tb].id_col
            rows = (self.db.table(tb)
                    .filter(F.col(idc) == str(rid)).limit(1).collect())
            return rows[0].asDict() if rows else None

        set_record_provider(_lookup_record)
        from surrealdb_spark.functions.misc_fns import \
            set_record_batch_provider

        def _lookup_records_batch(rids: list) -> dict:
            # one isin-filter per referenced TABLE (O(tables) Spark jobs,
            # not O(ids) point scans — VERDICT r10 "what's wrong" #5)
            by_tb: dict[str, list] = {}
            for r in dict.fromkeys(str(x) for x in rids):
                tb = r.partition(":")[0]
                by_tb.setdefault(tb, []).append(r)
            out: dict = {}
            for tb, ids in by_tb.items():
                if tb not in self.db.tables or not self.db._exists(tb):
                    continue
                idc = self.db.tables[tb].id_col
                rows = _bounded_collect(
                    self.db.table(tb).filter(
                        F.col(idc).cast("string").isin(ids)),
                    "batched record deref")
                for row in rows:
                    d = row.asDict()
                    out[str(d.get(idc))] = d
            return out

        set_record_batch_provider(_lookup_records_batch)
        from surrealdb_spark import pyeval as _pye

        def _run_wsub(text: str, env: dict):
            """Execute a writable-subquery expression driver-side and
            shape its value (ONLY → single object, DML → row list).
            ONLY is read from the PARSED statement — a string literal
            containing the word 'only' must not unwrap the result."""
            from surrealdb_spark.values import strip_absent

            plain = {k: v for k, v in (env or {}).items()
                     if not isinstance(v, Column)}
            df = self.run(text, params=plain)
            rows = [] if df is None else \
                [strip_absent(r.asDict(recursive=True))
                 for r in _bounded_collect(df, "writable subquery result")]
            only = getattr(df, "_surql_only", None)
            if only is None:
                st0 = None
                try:
                    st0 = parse_statement(text.strip().rstrip(";"))
                except Exception:
                    pass
                if st0 is not None and hasattr(st0, "only"):
                    only = bool(st0.only)
                else:
                    import re as _rew

                    only = bool(_rew.search(r"\bONLY\b", text, _rew.I))
            if only:
                return rows[0] if rows else None
            return rows

        _pye.set_wsub_runner(_run_wsub)
        from surrealdb_spark.functions.extra_fns import set_schema_provider

        set_schema_provider(
            lambda tb: tb in self.db.tables or tb in self.meta["tables"])
        self.live_queries: dict[str, object] = {}  # uuid → StreamingQuery

    # public --------------------------------------------------------------

    def run(self, text: str, params: dict | None = None) -> DataFrame | None:
        """Transaction-aware entry: inside BEGIN..COMMIT a failed statement
        poisons the transaction (later statements refuse to run and COMMIT
        rolls back to the BEGIN snapshot — statements/transaction corpus)."""
        head = text.strip().split(None, 1)
        w = head[0].rstrip(";").upper() if head else ""
        if getattr(self, "_tx_open", False) and w not in (
                "BEGIN", "COMMIT", "CANCEL"):
            if getattr(self, "_tx_failed", None):
                raise ValueError(
                    "The query was not executed due to a failed transaction")
            try:
                return self._run_main(text, params)
            except Exception as exc:
                self._tx_failed = str(exc) or type(exc).__name__
                raise
        return self._run_main(text, params)

    def _rewrite_writable_sources(self, txt: str, params):
        """Replace `( <DML> )` groups in a SELECT's text with dynamic
        source params bound to the DML's result rows (writable
        subqueries, exec/planner.rs:309-336)."""
        import re as _re9

        from surrealdb_spark.values import strip_absent

        params = dict(params or {})
        n = 0
        while True:
            m = _re9.search(
                r"\(\s*(CREATE|UPDATE|UPSERT|DELETE|INSERT|RELATE)\b",
                txt, _re9.I)
            if m is None:
                return txt, params
            # balanced-paren extraction from the match's "("
            start = txt.index("(", m.start())
            depth, i = 0, start
            while i < len(txt):
                if txt[i] == "(":
                    depth += 1
                elif txt[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            inner = txt[start + 1:i]
            df = self.run(inner.strip(), params=params)
            rows = [] if df is None else \
                [strip_absent(r.asDict(recursive=True))
                 for r in _bounded_collect(df, "writable subquery result")]
            slot = f"__ws{n}"
            n += 1
            params[slot] = rows
            txt = txt[:start] + f"${slot}" + txt[i + 1:]

    def _snapshot_root(self) -> str:
        """Copy the database root for transaction rollback (OLTP-scoped:
        BEGIN/COMMIT batches are interactive-size, not the analytics
        path)."""
        import shutil
        import tempfile

        dst = tempfile.mkdtemp(prefix="txbk_")
        shutil.rmtree(dst)
        shutil.copytree(self.db.root, dst)
        # a rolled-back statement also rolls back the table definitions it
        # implicitly created (exec statement atomicity — a failed FOR's
        # CREATEs leave no table behind, break_in_function.surql)
        if not hasattr(self, "_snap_meta"):
            self._snap_meta: dict[str, set] = {}
        self._snap_meta[dst] = set(self.db.tables)
        return dst

    def _restore_root(self, backup: str | None) -> None:
        import shutil

        if not backup:
            return
        shutil.rmtree(self.db.root, ignore_errors=True)
        shutil.copytree(backup, self.db.root)
        shutil.rmtree(backup, ignore_errors=True)
        pre = getattr(self, "_snap_meta", {}).pop(backup, None)
        if pre is not None:
            for tb in [t for t in self.db.tables if t not in pre]:
                self.db.tables.pop(tb, None)
                self.meta.get("tables", {}).pop(tb, None)
                self.catalog._cache.pop(tb, None)
                getattr(self.catalog, "registered", set()).discard(tb)
        self._tx_backup = None

    @staticmethod
    def _drop_backup(backup: str | None) -> None:
        import shutil

        if backup:
            shutil.rmtree(backup, ignore_errors=True)

    def _run_main(self, text: str, params: dict | None = None) -> DataFrame | None:
        from surrealdb_spark.sql.compiler import compile_select

        txt = text.strip().rstrip(";").strip()
        import re as _re0

        if _re0.match(r"SELECT\b", txt, _re0.I) and _re0.search(
                r"\(\s*(CREATE|UPDATE|UPSERT|DELETE|INSERT|RELATE)\b",
                txt, _re0.I):
            # writable subquery source (`SELECT ... FROM (UPSERT t)`,
            # exec/planner.rs:309-336): run the inner DML first and bind
            # its rows as a dynamic source param
            txt, params = self._rewrite_writable_sources(txt, params)
            text = txt

        m0 = _re0.match(
            r"EXPLAIN(\s+ANALYZE)?(\s+FORMAT\s+JSON)?\s+(.*)$", txt,
            _re0.I | _re0.S)
        if m0:
            # new-executor `EXPLAIN [ANALYZE] [FORMAT JSON] <stmt|expr>` —
            # the operator tree as text or a structured object
            # (exec/operators/explain.rs:30,103)
            from surrealdb_spark.sql.explain import (plan_new, plan_value,
                                                     render_json,
                                                     render_text)

            analyze0 = bool(m0.group(1))
            as_json = bool(m0.group(2))
            rest = m0.group(3).strip()
            merged0 = {**self.params_defined, **(params or {})}
            if rest.upper().startswith("SELECT"):
                from surrealdb_spark.sql.parser import parse_select as _ps

                self._refresh_catalog()
                node = plan_new(self, _ps(rest), merged0)
            else:
                node = plan_value(self, rest, merged0, analyze=analyze0)
            if as_json:
                return render_json(node, analyze=analyze0)
            return render_text(node, analyze=analyze0)
        if txt.startswith("{") and txt.endswith("}"):
            # block statement: run inner statements sequentially with a
            # shared LET scope; value = last RETURN (expr/block.rs)
            return self.run_block(txt[1:-1], params)
        if txt.upper().startswith("LET "):
            import re as _re

            m = _re.match(r"LET\s+\$(\w+)\s*=\s*(.*)$", txt, _re.I | _re.S)
            binds = {**self.params_defined, **(params or {})}
            self.params_defined[m.group(1)] = self._scalar_text(
                m.group(2), binds
            )
            return None
        merged = {**self.params_defined, **(params or {})}
        if txt.upper().startswith(("DEFINE", "REMOVE", "ALTER", "REBUILD",
                                   "INFO")) and "$" in txt:
            # parameterized schema names (DEFINE TABLE $table, DEFINE INDEX
            # $name ON $table ... — parameterized/schema tests): bound
            # name-safe string params substitute textually; `DEFINE PARAM
            # $x` keeps its own declared name
            import re as _re

            def sub(m):
                kw, pname = m.group(1), m.group(2)
                v = merged.get(pname)
                if isinstance(v, str) and _re.fullmatch(
                        r"[A-Za-z_][\w.]*", v):
                    return f"{kw} {v}"
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    return f"{kw} {v!r}"
                return m.group(0)

            text = _re.sub(
                r"\b(TABLE|FIELD|INDEX|EVENT|ANALYZER|FUNCTION|SEQUENCE|"
                r"BUCKET|API|USER|ACCESS|NAMESPACE|DATABASE|NS|DB|CONFIG|"
                r"ON|FIELDS|COLUMNS|BATCH|START)"
                r"\s+\$(\w+)",
                sub, text, flags=_re.I,
            )

            def sub_comment(m):
                v = merged.get(m.group(1))
                if isinstance(v, str):
                    return "COMMENT " + _surql_literal(v)
                if v is None and m.group(1) in merged:
                    return ""  # COMMENT NONE -> clause omitted
                return m.group(0)

            text = _re.sub(r"\bCOMMENT\s+\$(\w+)", sub_comment, text,
                           flags=_re.I)
        stmt = parse_statement(text)
        if stmt == ("noop",):
            return None
        params = {**self.params_defined, **(params or {})}
        if isinstance(stmt, Select) and stmt.timeout is not None:
            t = stmt.timeout
            if isinstance(t, tuple):
                t = params.get(t[1])
            if isinstance(t, dict):
                t = t.get("nanos", 0) + t.get("months", 0)
            elif hasattr(t, "asDict"):
                d = t.asDict()
                t = d.get("nanos", 0) + d.get("months", 0)
            if not t:
                raise ValueError("query timed out (TIMEOUT 0)")
            # recursion executors use this to fail divergent traversals
            # the way the reference's timeout would (graph/timeout.surql)
            params = {**params, "__timeout_ns__": t}
        if isinstance(stmt, Select) and stmt.fields and any(
                f.expr[0] == "refscan" for f in stmt.fields):
            # SELECT *, <~post AS posts — reverse-reference projections
            # attach after the base compile (scan/reference.rs projection)
            from dataclasses import replace as _replace2

            refs = [(f.alias or "refs", f.expr[1])
                    for f in stmt.fields if f.expr[0] == "refscan"]
            rest = [f for f in stmt.fields if f.expr[0] != "refscan"]
            base = _replace2(stmt, fields=rest or None)
            df = self.run_select(base, params)
            tbl = stmt.sources[0] if stmt.sources and isinstance(
                stmt.sources[0], str) else None
            for alias, entries in refs:
                if isinstance(entries, tuple) and entries[0] == "refquery":
                    raise ValueError("refquery projections unsupported")
                df = self._attach_refs(df, tbl, entries, alias)
            return df
        if isinstance(stmt, Select) and stmt.explain:
            return self._explain_select(stmt, merged)
        if isinstance(stmt, list):
            # multi-target CREATE — run each, concatenate the outputs
            outs = [self._execute(s, params) for s in stmt]
            outs = [o for o in outs if o is not None]
            out = outs[0]
            for o in outs[1:]:
                out = out.unionByName(o, allowMissingColumns=True)
            return out
        if isinstance(stmt, Select):
            return self.run_select(stmt, params)
        return self._execute(stmt, params)

    def run_select(self, stmt, params: dict):
        from surrealdb_spark.sql.compiler import compile_select

        if self.strict:
            for src in stmt.sources or []:
                self._check_strict(src if isinstance(src, str) else None)
        self._refresh_catalog()
        stmt, params = self._rewrite_search(stmt, params)
        if stmt.version is not None:
            # VERSION clause: re-register db-backed sources as their
            # snapshot state at that instant (version_scope.rs:25)
            v = self.spark.range(1).select(
                self._expr(stmt.version, params).alias("v")
            ).first()["v"]
            import datetime as _dt

            if isinstance(v, _dt.datetime):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=_dt.timezone.utc)
                ms = int(v.timestamp() * 1000)
            else:
                ms = int(v)
            for tbl in stmt.sources:
                if tbl in self.db.tables and self.db._exists(tbl):
                    self.catalog.register(tbl, self.db.table_at(tbl, ms))
        nested = self._nested_graph_projection(stmt, params)
        if nested is not None:
            return nested
        rdtrees = self._recursive_destructure_select(stmt, params)
        if rdtrees is not None:
            return rdtrees
        if "compute-only" in getattr(self, "planner_strategy", ()):
            # compute-only strategy: GROUP ALL streams per record (no
            # all-group row on empty input — 5581 count files)
            params = {**params, "__compute_only": True}
        try:
            return compile_select(self.spark, stmt, catalog=self.catalog,
                                  params=params)
        except ValueError as exc:
            if "subquery" not in str(exc):
                raise
            # nested $parent-correlated subqueries over literal sources:
            # Catalyst's one-join decorrelation can't scope two levels;
            # every source is a literal, so the driver walk is bounded
            # (current_value_source.rs per-row evaluation)
            from surrealdb_spark import pyeval

            try:
                return pyeval.eval_select(stmt, dict(params or {}))
            except pyeval.Unfoldable:
                raise exc
            except pyeval.EvalError as e2:
                raise ValueError(str(e2))

    def _recursive_destructure_select(self, sel, params: dict):
        """`SELECT VALUE @{..}.{f, kids: ->e->t.@} FROM tbl` — per-row
        recursive destructure (recursion.rs Part::RepeatRecurse with a
        table source; idiom/recursion_graph.surql).  The result rows are
        recursively-typed trees no static Spark schema can carry, so the
        roots (capped) assemble driver-side over ONE shared BFS —
        N roots cost the same level-wise edge scans as one."""
        e = sel.value_expr
        if not (isinstance(e, tuple) and e[0] == "path"
                and e[1] in (("curr",), ("ident", "id"))
                and len(e[2]) == 2 and e[2][0][0] == "recurse"
                and not e[2][0][2] and not e[2][0][3]
                and e[2][1][0] == "destructure"):
            return None

        def _has_repeat(entries) -> bool:
            for _n, sub in entries:
                if sub and sub[0][0] == "aliased":
                    p = sub[0][1]
                    if (isinstance(p, tuple) and p[0] == "method"
                            and p[1] == "chain"):
                        p = p[2]
                    if (isinstance(p, tuple) and p[0] == "path"
                            and p[2] and p[2][-1] == ("repeat",)):
                        return True
                if sub and sub[0][0] == "destructure" \
                        and _has_repeat(sub[0][1]):
                    return True
            return False

        if not _has_repeat(e[2][1][1]):
            return None
        if (sel.fields or sel.where is not None or sel.group is not None
                or sel.order or sel.split or sel.fetch or sel.omit
                or len(sel.sources) != 1
                or not isinstance(sel.sources[0], str)):
            return None
        from surrealdb_spark.operators.lookup import (
            recursive_destructure_trees)
        from surrealdb_spark.values import key_sort_text

        try:
            src = self.catalog.table(sel.sources[0])
        except Exception:
            return None
        if "id" not in src.columns:
            return None
        rids = [r["id"] for r in _bounded_collect(
            src.select("id"), "recursive destructure roots")]
        rids.sort(key=lambda s: (str(s).split(":", 1)[0],
                                 key_sort_text(str(s).split(":", 1)[1])))
        trees = recursive_destructure_trees(
            self.spark, self.catalog, rids, e[2][0][1], e[2][1][1])
        out = [trees.get(r) for r in rids]
        if sel.start:
            out = out[sel.start:]
        if sel.limit is not None:
            out = out[:sel.limit]
        if sel.only:
            return out[0] if out else None
        return out

    def _nested_graph_projection(self, sel, params: dict):
        """Unaliased multi-hop graph projections with destructure tails
        nest by output path and MERGE shared prefixes
        (exec/operators/project.rs:118; graph/aliasing.surql:
        `->reports_to->person.{id, name}, ->reports_to->person->
        reports_to->person.{id, name}` → one `{"->reports_to":
        {"->person": [...]}}` tree with the deeper hop nested inside
        each shared-prefix element).  Returns None unless the SELECT is
        exactly this shape — everything else keeps the flat-key path."""
        if (not sel.fields or sel.star or sel.value_expr is not None
                or sel.group is not None or sel.where is not None
                or sel.order or sel.limit is not None or sel.start
                or sel.split or sel.fetch):
            return None
        segs_of = []
        for f in sel.fields:
            e = f.expr
            if (f.alias is not None or not isinstance(e, tuple)
                    or e[0] != "path" or e[1] != ("curr",)):
                return None
            parts = e[2]
            if len(parts) < 3 or not all(
                    isinstance(p, tuple) for p in parts):
                return None
            *hops, tail = parts
            if tail[0] != "destructure" or not all(
                    isinstance(m, tuple) and not m[1] for m in tail[1]):
                return None
            if len(hops) % 2 or not all(
                    p[0] == "graph" and p[1][0] in ("out", "in")
                    and p[1][1] and len(p[1][1]) == 1 and not p[1][2]
                    for p in hops):
                return None
            segs_of.append(([(p[1][0], p[1][1][0]) for p in hops],
                            [m[0] for m in tail[1]]))
        # only engage when one path extends another (prefix merge is the
        # behavior that differs from the flat-key output)
        if len(segs_of) < 2 or not any(
                len(a[0]) < len(b[0]) and b[0][:len(a[0])] == a[0]
                for a in segs_of for b in segs_of if a is not b):
            return None

        # trie over (dir, name) segments; leaves carry destructure fields
        trie: dict = {"kids": {}, "destr": None}
        for segs, destr in segs_of:
            node = trie
            for s in segs:
                node = node["kids"].setdefault(s, {"kids": {},
                                                   "destr": None})
            node["destr"] = list(destr)

        import dataclasses as _dc

        from surrealdb_spark.operators.lookup import _kv_key
        from surrealdb_spark.sql.compiler import compile_select

        base = _dc.replace(sel, fields=None, value_expr=None, star=False)
        src = compile_select(self.spark, base, catalog=self.catalog,
                             params=params)

        # join-based assembly, bottom-up over the trie: each target-table
        # node becomes a (id, __elem struct) frame; each edge level is ONE
        # hop join + ONE groupBy collect, elements KV-key ordered — the
        # same frontier pattern as operators/lookup.py, so the plan scales
        # with the edge tables instead of a driver edge walk.
        spark = self.spark

        def _edges(name: str, d1: str):
            if self.db._exists(name):
                e = self.db.table(name)
            else:
                e = spark.createDataFrame([], "`in` string, `out` string")
            here, there = ("in", "out") if d1 == "out" else ("out", "in")
            return e.select(F.col(here).cast("string").alias("__src"),
                            F.col(there).cast("string").alias("__dst"))

        def _arr_branch(d1, edge, d2, tbl2, deeper):
            """(__src, arr) — per source node, the KV-ordered array of
            elements for one (edge, target-table) branch."""
            sub = _elem_df(deeper, tbl2).select(
                F.col("id").alias("__did"), F.col("__elem").alias("__de"))
            hop = _edges(edge, d1).filter(
                F.col("__dst").startswith(tbl2 + ":"))
            joined = (hop.join(sub, F.col("__dst") == F.col("__did"))
                      .dropDuplicates(["__src", "__did"]))
            kk = _kv_key(F.col("__did"))
            return joined.groupBy("__src").agg(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(kk.alias("k"), F.col("__de").alias("v")))),
                    lambda s: s.getField("v"),
                ).alias("__arr"))

        def _attach_edges(frame, node, make_elem: bool,
                          destr: list | None):
            """Join every trie branch onto ``frame`` (keyed by id) and
            build the per-edge struct columns; returns (frame, edge_cols)."""
            edge_cols = []
            for (d1, edge), enode in node["kids"].items():
                tbl_cols = []
                for (d2, tbl2), deeper in enode["kids"].items():
                    slot = f"__ng{len(edge_cols)}_{len(tbl_cols)}"
                    br = _arr_branch(d1, edge, d2, tbl2, deeper) \
                        .withColumnRenamed("__arr", slot)
                    frame = frame.join(
                        br, frame["id"] == br["__src"], "left").drop("__src")
                    at = frame.schema[slot].dataType
                    arr = F.coalesce(F.col(slot), F.array().cast(at))
                    tbl_cols.append(
                        (slot, arr.alias(("->" if d2 == "out" else "<-")
                                         + tbl2)))
                edge_cols.append(
                    ([s for s, _ in tbl_cols],
                     F.struct(*[c for _, c in tbl_cols])
                     .alias(("->" if d1 == "out" else "<-") + edge)))
            return frame, edge_cols

        def _elem_df(tnode, tbl):
            """(id, __elem) for every record of ``tbl``: destructure
            fields + nested deeper-hop structs."""
            if self.db._exists(tbl):
                t = self.db.table(tbl)
            else:
                t = spark.createDataFrame([], "id string")
            cur = t.select(F.col("id").cast("string").alias("id"),
                           *[(F.col(f) if f in t.columns else F.lit(None))
                             .alias(f"__d_{f}")
                             for f in (tnode["destr"] or [])])
            cur, edge_cols = _attach_edges(cur, tnode, True,
                                           tnode["destr"])
            fields_ = [F.col(f"__d_{f}").alias(f)
                       for f in (tnode["destr"] or [])]
            fields_ += [c for _, c in edge_cols]
            return cur.select("id", F.struct(*fields_).alias("__elem"))

        out = src.select(F.col("id").cast("string").alias("id"))
        out, edge_cols = _attach_edges(out, trie, False, None)
        return out.select(*[c for _, c in edge_cols])

    def run_block(self, body: str, params: dict | None = None):
        """Inner statements of a `{ ... }` block, sequentially, with a
        local LET scope layered over the caller's bindings
        (expr/block.rs)."""
        import re as _re

        from surrealdb_spark.golden import split_statements

        binds = {**self.params_defined, **(params or {})}
        out = None
        for inner in split_statements(body):
            head = inner.split(None, 1)
            w = head[0].upper() if head else ""
            if w == "LET":
                m = _re.match(r"LET\s+\$(\w+)\s*=\s*(.*)$", inner,
                              _re.I | _re.S)
                binds[m.group(1)] = self._scalar_text(m.group(2), binds)
            elif w == "RETURN":
                # RETURN sets the block value and exits (expr/block.rs)
                return self._scalar_text(head[1], binds)
            else:
                out = self.run(inner, params=binds)
        return out

    def _scalar_text(self, src: str, binds: dict):
        """Evaluate an expression (or parenthesized DML) to a Python value."""
        import re as _re2

        binds = {**self.params_defined, **(binds or {})}
        src = src.strip().rstrip(";").strip()
        m_info = _re2.fullmatch(r"\(\s*(INFO\s+FOR\s+[^)]*)\)\s*(\..+)?",
                                src, _re2.S | _re2.I)
        if m_info:
            # `(INFO FOR DB).params` — catalog object + idiom walk
            # (parameterized/schema corpus)
            out = self.run(m_info.group(1), params=binds)
            path = m_info.group(2)
            if path:
                from surrealdb_spark import pyeval
                from surrealdb_spark.sql.parser import parse_expr

                # evaluate the idiom tail (fields, indexes, AND method
                # calls like `.keys()`) over the catalog object
                ast = parse_expr("$__info" + path)
                return pyeval.peval(ast, {**binds, "__info": out})
            return out
        take_idx = None
        m_idx = _re2.fullmatch(r"\((.*)\)\s*\[\s*(\d+)\s*\]", src, _re2.S)
        if m_idx:
            # `(SELECT ...)[n]` — statement value indexed (idiom on a
            # subquery result)
            src, take_idx = f"({m_idx.group(1)})", int(m_idx.group(2))
        inner = src[1:-1].strip() if src.startswith("(") and src.endswith(")") else src
        head = inner.split(None, 1)[0].upper() if inner else ""
        if head in ("CREATE", "INSERT", "UPDATE", "UPSERT", "DELETE",
                    "RELATE", "SELECT"):
            import re as _re

            df = self.run(inner, params=binds)
            if df is None or isinstance(df, dict):
                return df
            from surrealdb_spark.values import strip_absent

            rows: list = [strip_absent(r.asDict(recursive=True))
                          for r in df.limit(100).collect()]
            if df.columns == ["value"]:
                rows = [r["value"] for r in rows]
            if take_idx is not None:
                return rows[take_idx] if take_idx < len(rows) else None
            if _re.search(r"\bONLY\b", inner, _re.I):
                return rows[0] if rows else None
            return rows
        from surrealdb_spark.sql.parser import parse_expr

        ast = parse_expr(src)
        from surrealdb_spark.sql.compiler import _has_lookup

        if _has_lookup(ast):
            # graph lookups from record-id literals
            # (`person:alice->knows->person`) — one-row frame through the
            # join-based lookup engine (operators/lookup.py)
            from surrealdb_spark.sql.compiler import eval_lookup_value

            self._refresh_catalog()
            return eval_lookup_value(self.spark, self.catalog, ast, binds)
        if ast[0] == "refscan_on":
            return self._refscan_on(ast, binds)
        if ast[0] == "path" and ast[1][0] == "refscan_on":
            # `rid<~(tbl FIELD f).g` — walk the idiom tail over the
            # reverse-reference rows (reference/range.surql)
            from surrealdb_spark import pyeval

            rows = self._refscan_on(ast[1], binds)
            return pyeval._walk_path(rows, list(ast[2]), binds)
        if ast[0] == "path" and ast[1][0] in ("lit", "ulit") \
                and isinstance(ast[1][1], str) and ":" in str(ast[1][1]):
            got = self._walk_record_path(str(ast[1][1]), ast[2])
            if got is not _PATH_MISS:
                return got
        if ast[0] == "path" and ast[1][0] == "subquery":
            # `(SELECT ... LIMIT 3).id` — idiom over a subquery's result
            # rows (expr/part.rs Part::Start over any expression): run the
            # select, materialize its (already LIMITed) rows, then walk
            # the path driver-side
            from surrealdb_spark import pyeval
            from surrealdb_spark.values import strip_absent

            df = self.run_select(ast[1][1], binds)
            rows: list = [strip_absent(r.asDict(recursive=True))
                          for r in _bounded_collect(
                              df, "postfix idiom over subquery")]
            if df.columns == ["value"] and getattr(df, "_surql_bare", True):
                rows = [r["value"] for r in rows]
            return pyeval._walk_path(rows, ast[2], binds)
        if ast[0] in ("lit", "ulit"):
            # pure literal: no Spark roundtrip (it would drop subtypes —
            # NanoDatetime raw text, bytes vs str); datetimes normalize
            # to naive UTC like collected timestamps
            import datetime as _dt0

            v0 = ast[1]
            if isinstance(v0, _dt0.datetime) and v0.tzinfo is not None:
                v0 = v0.astimezone(_dt0.timezone.utc).replace(tzinfo=None)
            return v0
        col = self._expr(ast, binds)
        got = self.spark.range(1).select(col.alias("v")).first()["v"]
        return _plain_value(got)

    def _walk_record_path(self, rid: str, parts):
        """`rid.field.*.…` — driver-side idiom walk with record
        dereference (value/idiom.rs over Thing values).  Returns
        _PATH_MISS when a part form isn't supported here."""
        from surrealdb_spark.functions.misc_fns import _lookup_record

        def deref(v):
            if isinstance(v, str) and ":" in v:
                rec = _lookup_record(v)
                if rec is not None and v.partition(":")[0] in \
                        self.computed_fields:
                    # computed columns apply at read
                    full = [r.asDict(recursive=True) for r in
                            self._with_computed(
                                v.partition(":")[0],
                                self.db.table(v.partition(":")[0]))
                            .filter(F.col("id") == v).limit(1).collect()]
                    rec = full[0] if full else rec
                return rec if rec is not None else v
            return v

        cur: object = rid
        for p in parts:
            k = p[0]
            if k == "field":
                cur = deref(cur)
                if isinstance(cur, list):
                    cur = [x.get(p[1]) if isinstance(x, dict) else None
                           for x in (deref(e) for e in cur)]
                elif isinstance(cur, dict):
                    cur = cur.get(p[1])
                else:
                    return _PATH_MISS
            elif k == "all":
                cur = deref(cur)
                if isinstance(cur, list):
                    cur = [deref(x) for x in cur]
                elif not isinstance(cur, dict):
                    return _PATH_MISS
            elif k == "index":
                if not isinstance(cur, list):
                    return _PATH_MISS
                cur = cur[p[1]] if -len(cur) <= p[1] < len(cur) else None
            elif k == "optional":
                if cur is None:
                    return None
            else:
                return _PATH_MISS
        return cur

    def _refscan_on(self, ast, binds: dict):
        """`rid<~(table FIELD f)` — ids of records referencing rid
        (scan/reference.rs:48), driver-evaluated in statement scope."""
        lhs = ast[1]
        rid = lhs[1] if lhs[0] in ("lit", "ulit") else None
        if rid is None and lhs[0] == "param":
            v = binds.get(lhs[1])
            rid = v.get("id") if isinstance(v, dict) else v
        if rid is None:
            raise ValueError("<~ needs a record id receiver")
        entries = ast[2]
        if isinstance(entries, tuple) and entries[0] == "refquery":
            return self._refquery(str(rid), entries[1])
        out: list = []
        for rt, rf in entries:
            rf2 = rf or self._infer_ref_field(rt, str(rid).partition(":")[0])
            if rf2 is None or not self.db._exists(rt):
                continue
            r = self.db.table(rt)
            if rf2 not in r.columns:
                continue
            if dict(r.dtypes)[rf2].startswith("array"):
                cond = F.array_contains(F.col(rf2).cast("array<string>"),
                                        str(rid))
            else:
                cond = F.col(rf2).cast("string") == str(rid)
            rows = _bounded_collect(
                r.filter(cond).select(F.col("id").cast("string")),
                f"<~ reverse-reference fanout of {rid} via {rt}.{rf2}")
            out += [x[0] for x in rows]
        return sorted(out)

    def _refquery(self, rid: str, raw: str):
        """`rid<~(SELECT ... FROM tb FIELD f ...)` / `rid<~(tb FIELD f
        WHERE ...)` — rewrite to a SELECT with `f = rid` injected into the
        WHERE clause, run it, return the rows (scan/reference.rs with
        clauses)."""
        import re as _re4

        m = _re4.search(r"\bFIELD\s+(\w+)", raw, _re4.I)
        if not m:
            raise ValueError("<~(...) needs a FIELD clause")
        fld = m.group(1)
        q = raw[:m.start()] + raw[m.end():]
        if not _re4.match(r"\s*SELECT\b", q, _re4.I):
            # bare `tb [range] [WHERE ...]` → SELECT VALUE id
            q = "SELECT VALUE id FROM " + q
        cond = f"{fld} = {rid}"
        mw = _re4.search(r"\bWHERE\b", q, _re4.I)
        if mw:
            tail = q[mw.end():]
            mt = _re4.search(r"\b(ORDER|LIMIT|START|SPLIT|GROUP|FETCH)\b",
                             tail, _re4.I)
            wexpr = tail[:mt.start()] if mt else tail
            rest = tail[mt.start():] if mt else ""
            q = (q[:mw.end()] + f" {cond} AND ({wexpr.strip()}) " + rest)
        else:
            # inject before the first trailing clause keyword
            mt = _re4.search(r"\b(ORDER|LIMIT|START|SPLIT|GROUP|FETCH)\b",
                             q, _re4.I)
            if mt:
                q = q[:mt.start()] + f" WHERE {cond} " + q[mt.start():]
            else:
                q = q + f" WHERE {cond}"
        df = self.run(q)
        rows = [r.asDict(recursive=True)
                for r in _bounded_collect(df, "statement materialization")]
        if df.columns == ["value"]:
            return [r["value"] for r in rows]
        return rows

    def _infer_ref_field(self, ref_table: str, target: str) -> str | None:
        """Which REFERENCE field of ref_table points at target
        (define/field.rs reference registry)."""
        cands = self.ref_fields.get(ref_table, [])
        for e in cands:
            if e["target"] == target:
                return e["field"]
        return cands[0]["field"] if cands else None

    def _with_computed(self, tbl: str, df: DataFrame) -> DataFrame:
        """Attach COMPUTED `<~` reverse-reference columns at read time
        (scan/reference.rs): one groupBy per referencing side, sorted
        collected ids, left join on this table's id."""
        specs = self.computed_fields.get(tbl, {})
        for fname, (kind, payload) in specs.items():
            if kind == "refs":
                df = self._attach_refs(df, tbl, payload, fname)
            elif getattr(self, "_fold_busy", False):
                # re-entrant catalog refresh from inside a computed-body
                # subquery evaluation: skip generic computed attachment
                # (the in-flight fold would recurse forever otherwise)
                continue
            else:  # generic COMPUTED expr over the row's own columns
                from surrealdb_spark.sql.compiler import (_has_lookup,
                                                          compile_expr,
                                                          types_of)

                if _has_lookup(payload):
                    # graph-lookup COMPUTED body: read-time join
                    # (value_reference_with_computed.surql)
                    df = self._attach_lookup_col(df, payload, fname)
                    continue
                folded, val = self._fold_computed(payload)
                if folded:
                    # row-independent body (SELECT-or-expression forms,
                    # computed/select.surql): one driver evaluation,
                    # attached as a broadcast literal
                    if val is None or isinstance(
                            val, (int, float, str, bool)):
                        df = df.withColumn(fname, F.lit(val))
                    elif isinstance(val, list) and not val:
                        df = df.withColumn(
                            fname, F.array().cast("array<string>"))
                    else:
                        from pyspark.sql import Row as _Row

                        def _rowify(x):
                            if isinstance(x, dict):
                                return _Row(**{k: _rowify(v)
                                               for k, v in x.items()})
                            if isinstance(x, list):
                                return [_rowify(e) for e in x]
                            return x

                        lit_df = self.spark.createDataFrame(
                            [(_rowify(val),)]).toDF(fname)
                        df = df.crossJoin(F.broadcast(lit_df))
                else:
                    df = df.withColumn(
                        fname, compile_expr(payload, {}, types_of(df)))
                if "__present" in df.columns:
                    df = df.withColumn(
                        "__present",
                        F.array_sort(F.array_union(
                            F.coalesce(F.col("__present"),
                                       F.array().cast("array<string>")),
                            F.array(F.lit(fname)))))
        return df

    def _attach_lookup_col(self, df: DataFrame, ast, fname: str) -> DataFrame:
        """Attach a graph-lookup expression (`->contains->product`) as a
        column via the join-based lookup engine (operators/lookup.py) —
        used by VALUE/COMPUTED field bodies over the row frame."""
        from surrealdb_spark.sql.compiler import (_attach_lookup_specs,
                                                  _extract_lookups,
                                                  compile_expr, types_of)

        # the runner catalog may be mid-refresh/stale here (write paths,
        # catalog materialization): overlay CURRENT db frames so the edge
        # scan sees just-written edges, without disturbing the live
        # catalog's registrations
        import copy as _copy

        cat = _copy.copy(self.catalog)
        cat._cache = dict(getattr(self.catalog, "_cache", {}))
        edge_names = set(getattr(self.catalog, "edge_names", ()) or ())
        for name in self.db.tables:
            if self.db._exists(name):
                t = self.db.table(name)
                cat._cache[name] = t
                if "in" in t.columns and "out" in t.columns:
                    edge_names.add(name)
        cat.edge_names = edge_names

        before_cols = list(df.columns)
        specs: list = []
        new = _extract_lookups(ast, specs)
        at = _attach_lookup_specs(self.spark, df, cat, specs,
                                  dict(self.params_defined))
        col = compile_expr(new, dict(self.params_defined), types_of(at))
        out = at.withColumn(fname, col)
        temp = [c for c in out.columns
                if c not in before_cols and c != fname]
        if temp:
            out = out.drop(*temp)
        if "__present" in out.columns:
            out = out.withColumn(
                "__present",
                F.array_sort(F.array_union(
                    F.coalesce(F.col("__present"),
                               F.array().cast("array<string>")),
                    F.array(F.lit(fname)))))
        return out

    def _fold_computed(self, payload):
        """Driver-fold a ROW-INDEPENDENT computed body (subquery blocks,
        `(SELECT ..) OR [..]` literal algebra — define/field/computed
        corpus) to a python value.  Bodies that reference row fields
        (bare idents / $this) keep the per-row compile path.  Returns
        (True, value) or (False, None)."""
        from surrealdb_spark import pyeval as _pyf
        from surrealdb_spark.values import strip_absent

        def subst(a):
            if a[0] == "subquery":
                sel = a[1]
                df = self.run_select(sel, dict(self.params_defined))
                rows = [strip_absent(r.asDict(recursive=True))
                        for r in _bounded_collect(df, "computed subquery")]
                if df.columns == ["value"] and getattr(
                        df, "_surql_bare", True):
                    rows = [r.get("value") for r in rows]
                return ("lit", rows), True
            if a[0] in ("ident", "curr"):
                return a, False
            if a[0] == "param" and a[1] in ("this", "self", "value",
                                            "input", "before", "after"):
                return a, False
            out, ok = [], True
            for x in a:
                if isinstance(x, tuple):
                    y, o = subst(x)
                    out.append(y)
                    ok = ok and o
                elif isinstance(x, list):
                    ys = []
                    for e in x:
                        if isinstance(e, tuple):
                            y, o = subst(e)
                            ys.append(y)
                            ok = ok and o
                        else:
                            ys.append(e)
                    out.append(ys)
                else:
                    out.append(x)
            return tuple(out), ok

        if getattr(self, "_fold_busy", False):
            return False, None
        self._fold_busy = True
        try:
            node, ok = subst(payload)
            if not ok:
                return False, None
            return True, _pyf.peval(node, {})
        except Exception:
            return False, None
        finally:
            self._fold_busy = False

    def _purge_edges(self, tbl: str, doomed: DataFrame | None) -> None:
        """doc/purge.rs: deleting records removes the edges whose in/out
        pointers reference them — through db.delete so the edge tables'
        DELETE events fire.  Skipped entirely when no edge tables exist
        (the analytics path); the doomed id set is OLTP-bounded."""
        if doomed is None or "id" not in doomed.columns:
            return
        edge_tbls = [et for et, td in self.db.tables.items()
                     if getattr(td, "is_edge", False) and et != tbl
                     and self.db._exists(et)]
        if not edge_tbls:
            return
        ids = [str(r["id"]) for r in _bounded_collect(
            doomed.select("id"), "edge purge (doomed ids)")]
        if not ids:
            return
        for et in edge_tbls:
            e = self.db.table(et)
            if "in" not in e.columns or "out" not in e.columns:
                continue
            cond = (F.col("in").cast("string").isin(ids)
                    | F.col("out").cast("string").isin(ids))
            self.db.delete(et, F.coalesce(cond, F.lit(False)))

    def _apply_on_delete(self, tbl: str, where) -> None:
        """Enforce REFERENCE ON DELETE strategies before records vanish
        (expr/reference.rs ReferenceDeleteStrategy; doomed set is driver-
        bounded — reference enforcement is OLTP-scoped)."""
        if not self.db._exists(tbl):
            return
        refs = [(rt, e) for rt, lst in self.ref_fields.items()
                for e in lst if e["target"] in (tbl, None)]
        if not refs:
            return
        cond = where if where is not None else F.lit(True)
        doomed = [r[0] for r in _bounded_collect(
            self.db.table(tbl).filter(cond).select("id"),
            "ON DELETE reference enforcement (doomed set)")]
        if not doomed:
            return
        for rt, e in refs:
            if not self.db._exists(rt):
                continue
            r = self.db.table(rt)
            fld = e["field"]
            if fld not in r.columns:
                continue
            is_arr = dict(r.dtypes)[fld].startswith("array")
            if is_arr:
                hit = F.arrays_overlap(F.col(fld).cast("array<string>"),
                                       F.array(*[F.lit(d) for d in doomed]))
            else:
                hit = F.col(fld).cast("string").isin(doomed)
            act = e["action"]
            if act == "IGNORE":
                continue
            if act == "REJECT":
                n = r.filter(F.coalesce(hit, F.lit(False))).count()
                if n:
                    raise MutationError(
                        f"cannot delete: {n} record(s) in '{rt}' still "
                        f"reference '{tbl}' via {fld} (ON DELETE REJECT)")
            elif act == "CASCADE":
                self.db.delete(rt, F.coalesce(hit, F.lit(False)))
            elif act == "UNSET":
                if is_arr:
                    rm = F.filter(
                        F.col(fld),
                        lambda x: ~x.cast("string").isin(doomed))
                    self.db.update(rt, {fld: rm},
                                   F.coalesce(hit, F.lit(False)))
                else:
                    self.db.update(rt, {fld: F.lit(None)},
                                   F.coalesce(hit, F.lit(False)))
            elif act == "THEN" and e.get("then"):
                rows = _bounded_collect(
                    r.filter(F.coalesce(hit, F.lit(False))),
                    "ON DELETE THEN row set")
                then_txt = e["then"].strip()
                if then_txt.startswith("(") and then_txt.endswith(")"):
                    then_txt = then_txt[1:-1]
                for row in rows:
                    d = row.asDict(recursive=True)
                    for did in doomed:
                        self.run(then_txt,
                                 params={"this": d, "reference": did})
        return

    def _ref_agg(self, target_tbl: str, entries):
        """(__t, __refs) frame: target id → sorted referencing ids."""
        parts = []
        for rt, rf in entries:
            rf2 = rf or self._infer_ref_field(rt, target_tbl)
            if rf2 is None or not self.db._exists(rt):
                continue
            r = self.db.table(rt)
            if rf2 not in r.columns:
                continue
            if dict(r.dtypes)[rf2].startswith("array"):
                # array-of-records reference field → one row per target
                part = r.select(
                    F.explode(F.col(rf2)).alias("__t"),
                    F.col("id").cast("string").alias("__rid"),
                ).withColumn("__t", F.col("__t").cast("string"))
            else:
                part = r.select(
                    F.col(rf2).cast("string").alias("__t"),
                    F.col("id").cast("string").alias("__rid"))
            parts.append(part)
        if not parts:
            return None
        allr = parts[0]
        for o in parts[1:]:
            allr = allr.unionByName(o)
        return allr.groupBy("__t").agg(
            F.array_sort(F.collect_list("__rid")).alias("__refs"))

    def _attach_refs(self, df: DataFrame, tbl: str, entries,
                     fname: str) -> DataFrame:
        agg = self._ref_agg(tbl, entries)
        if agg is None:
            return df.withColumn(fname, F.array().cast("array<string>"))
        return (df.join(agg, df["id"] == agg["__t"], "left")
                .drop("__t")
                .withColumn(fname, F.coalesce(
                    F.col("__refs"), F.array().cast("array<string>")))
                .drop("__refs"))

    def _rewrite_search(self, sel, params: dict):
        """Full-text matches + search::score/highlight/offsets lowering.

        ``field @[N]@ 'query'`` compiles to an analyzer-aware all-terms
        predicate (the FT index's analyzer, querying stage — idx/ft/
        analyzer); `search::score(N)` to the reference's Okapi-BM25 with
        lower-bounded tf (idx/ft/fulltext.rs:915-955), `search::highlight`
        / `search::offsets` to term-position columns (idx/ft/
        highlighter.rs).  Corpus stats for BM25 are one driver aggregate
        per query — OLTP-scoped; the 100 TB path is the build-once
        postings index (operators/fulltext.py)."""
        import math
        import re as _re

        from surrealdb_spark.pipeline.analyzer import get_analyzer
        from surrealdb_spark.sql.compiler import compile_expr
        from surrealdb_spark.sql.explain import to_sql
        from surrealdb_spark.sql.parser import Field as _Fld

        if not ((sel.where is not None and _has_matches(sel.where))
                or any(_has_searchfn(f.expr) for f in (sel.fields or []))):
            return sel, params
        tbl = sel.sources[0] if sel.sources and \
            isinstance(sel.sources[0], str) else None
        slots = dict(params)
        refs: dict = {}
        n = [0]

        def analyzer_for(fname):
            for d in self.index_defs.values():
                if d.table == tbl and getattr(d, "kind", "") == "fulltext" \
                        and d.fields and d.fields[0] == fname:
                    try:
                        an = get_analyzer(d.analyzer) if d.analyzer \
                            else get_analyzer("default")
                    except KeyError:
                        an = get_analyzer("default")
                    return an, d
            return get_analyzer("default"), None

        def terms_of(an, q):
            row = self.spark.range(1).select(
                an.tokens(F.lit(str(q)), querying=True).alias("t")).first()
            # plain str() — Arrow collects numpy strings, and
            # F.lit(np.str_) miscoerces inside HOF lambdas
            return [str(t) for t in (row["t"] or []) if t]

        def doc_tokens(an, fld_ast):
            fcol = compile_expr(fld_ast, slots, {})
            try:
                fname = to_sql(fld_ast)
                obj = _obj_strings(fcol, fname)
                if obj is not None:
                    fcol = F.array_join(obj, "\x1f")
                elif dict(self.catalog.table(tbl).dtypes).get(
                        fname, "").startswith("array"):
                    # FT over an array field tokenizes each element
                    # (\x1f is an analyzer split class)
                    fcol = F.array_join(fcol.cast("array<string>"), "\x1f")
            except Exception:
                pass
            return an.tokens(F.coalesce(fcol.cast("string"), F.lit("")))

        def new_slot(col):
            s = f"__ft{n[0]}"
            n[0] += 1
            slots[s] = col
            return ("param", s)

        def repl_matches(ast):
            if not isinstance(ast, tuple):
                return ast
            mm = (_re.fullmatch(r"@(\d+)?,?(AND|OR)?@", str(ast[1]))
                  if ast[0] == "bin" else None)
            if mm is not None:
                fld, qast = ast[2], ast[3]
                if fld[0] == "path" and fld[1][0] == "ident" \
                        and mm.group(1) is None:
                    try:
                        dt = dict(self.catalog.table(tbl).dtypes) \
                            .get(fld[1][1], "")
                    except Exception:
                        dt = ""
                    if dt == "string":
                        if "all-ro" in getattr(self, "planner_strategy",
                                               ()):
                            # the new executor rejects matches over a
                            # record link (no index-join FT path)
                            raise ValueError(
                                "@@ on a record link needs a direct index")
                        # matches over a record-link path: leave it for
                        # the deref pass + generic matches operator
                        return ast
                q = (qast[1] if qast[0] in ("lit", "ulit")
                     else params.get(qast[1]) if qast[0] == "param" else None)
                fname = to_sql(fld)
                an, d = analyzer_for(fname)
                terms = terms_of(an, q) if q is not None else []
                toks = doc_tokens(an, fld)
                any_mode = mm.group(2) == "OR"
                pred = F.lit(False) if any_mode else F.lit(bool(terms))
                for t in terms:
                    hit = F.coalesce(F.array_contains(toks, t), F.lit(False))
                    pred = (pred | hit) if any_mode else (pred & hit)
                if mm.group(1) is not None:
                    refs[int(mm.group(1))] = (fld, fname, terms, an, d)
                return new_slot(pred)
            return tuple(
                repl_matches(x) if isinstance(x, tuple)
                else ([repl_matches(e) for e in x] if isinstance(x, list)
                      else x)
                for x in ast)

        new_where = repl_matches(sel.where) if sel.where is not None else None

        def bm25_col(ref):
            fld, fname, terms, an, d = refs[ref]
            df = self.catalog.table(tbl)
            toks = an.tokens(F.coalesce(
                compile_expr(fld, slots, {}).cast("string"), F.lit("")))
            aggs = [F.count(F.lit(1)).alias("N"),
                    F.avg(F.size(toks)).alias("avgdl")]
            for i, t in enumerate(terms):
                aggs.append(F.sum(F.array_contains(toks, t).cast("int"))
                            .alias(f"n{i}"))
            st = df.agg(*aggs).first()
            N, avgdl = float(st["N"]), float(st["avgdl"] or 0)
            k1, b = 1.2, 0.75
            dl = F.size(toks).cast("double")
            score = F.lit(0.0)
            for i, t in enumerate(terms):
                nq = float(st[f"n{i}"] or 0)
                idf = max(0.0, math.log((N - nq + 0.5) / (nq + 0.5)))
                if idf == 0.0:
                    continue
                # NB: a default-arg lambda (`lambda x, _t=t:`) would make
                # PySpark treat this as the 2-arg (element, index) form
                tf = F.size(
                    F.filter(toks, (lambda _t: lambda x: x == F.lit(_t))(t))
                ).cast("double")
                tfp = F.lit(1.0) + F.log(tf)
                term_sc = (F.lit(idf) * F.lit(k1 + 1.0) * tfp) / (
                    tfp + F.lit(k1) * (F.lit(1.0 - b)
                                       + F.lit(b / avgdl if avgdl else 0.0)
                                       * dl))
                score = score + F.when(tf > 0, term_sc).otherwise(F.lit(0.0))
            return score.cast("float")

        def _ci(an) -> bool:
            return any(f and f[0] == "lowercase"
                       for f in getattr(an, "filters", ()))

        def _obj_strings(fcol, fname):
            """Object-valued FT field → array of its string leaf values
            in sorted-key order, arrays inlined (ft/analyzer.rs walks
            Value::Object values).  None if the field isn't a struct."""
            from pyspark.sql.types import ArrayType, StringType, StructType

            try:
                dt = self.catalog.table(tbl).schema[fname].dataType
            except Exception:
                return None
            if not isinstance(dt, StructType):
                return None
            parts = []
            for f in sorted(dt.fields, key=lambda x: x.name):
                c = fcol.getField(f.name)
                if isinstance(f.dataType, StringType):
                    parts.append(F.array(c))
                elif isinstance(f.dataType, ArrayType):
                    parts.append(c.cast("array<string>"))
                else:
                    parts.append(F.array(c.cast("string")))
            return F.array_compact(F.concat(*parts)) if parts else None

        def hl_col(ref, pre, post, partial):
            fld, fname, terms, an, d = refs[ref]
            fcol = compile_expr(fld, slots, {})
            if not terms:
                return fcol
            pat = "|".join(_re.escape(t) for t in
                           sorted(terms, key=len, reverse=True))
            flag = "(?i)" if _ci(an) else ""
            rx = f"{flag}({pat})" if partial \
                else f"{flag}(\\w*(?:{pat})\\w*)"
            hl = F.regexp_replace(fcol.cast("string"), rx, f"{pre}$1{post}")
            try:
                fname = to_sql(fld)
                obj = _obj_strings(fcol, fname)
                if obj is not None:
                    # object field: highlight over the flattened values
                    hl = F.transform(
                        obj, lambda x: F.regexp_replace(
                            x, rx, f"{pre}$1{post}"))
                elif dict(self.catalog.table(tbl).dtypes).get(
                        fname, "").startswith("array"):
                    hl = F.transform(
                        fcol, lambda x: F.regexp_replace(
                            x, rx, f"{pre}$1{post}"))
            except Exception:
                pass
            return hl

        def off_col(ref, partial):
            from surrealdb_spark.operators.fulltext import offsets_col

            fld, fname, terms, an, d = refs[ref]
            fcol = compile_expr(fld, slots, {})
            return offsets_col(fcol, terms, partial, ci=_ci(an))

        def lit_of(a, default=None):
            return a[1] if isinstance(a, tuple) and a[0] == "lit" else default

        def repl_search(ast):
            if not isinstance(ast, tuple):
                return ast
            if ast[0] == "call" and ast[1] in (
                    "search::score", "search::highlight", "search::offsets"):
                args = ast[2]
                if ast[1] == "search::score":
                    ref = int(lit_of(args[0], 1))
                    if ref not in refs:
                        raise ValueError(f"no match ref {ref}")
                    return new_slot(bm25_col(ref))
                if ast[1] == "search::highlight":
                    pre, post = lit_of(args[0], ""), lit_of(args[1], "")
                    ref = int(lit_of(args[2], 1))
                    partial = bool(lit_of(args[3])) if len(args) > 3 \
                        else False
                    if ref not in refs:
                        raise ValueError(f"no match ref {ref}")
                    return new_slot(hl_col(ref, pre, post, partial))
                ref = int(lit_of(args[0], 1))
                partial = bool(lit_of(args[1])) if len(args) > 1 else False
                if ref not in refs:
                    raise ValueError(f"no match ref {ref}")
                return new_slot(off_col(ref, partial))
            return tuple(
                repl_search(x) if isinstance(x, tuple)
                else ([repl_search(e) for e in x] if isinstance(x, list)
                      else x)
                for x in ast)

        new_fields = sel.fields
        if sel.fields:
            new_fields = [
                _Fld(repl_search(f.expr), f.alias, getattr(f, "text", None))
                if _has_searchfn(f.expr) else f
                for f in sel.fields
            ]
        new_value = (repl_search(sel.value_expr)
                     if sel.value_expr is not None
                     and _has_searchfn(sel.value_expr) else sel.value_expr)
        from dataclasses import replace as _rpl

        return _rpl(sel, where=new_where, fields=new_fields,
                    value_expr=new_value), slots

    def _explain_select(self, sel, params=None) -> list:
        """SELECT ... EXPLAIN [FULL] — the legacy planner's plan rows
        (idx/planner description; sql/explain.py emulates the reference's
        access-path selection.  Catalyst plans the actual execution —
        predicate pushdown subsumes the index scans)."""
        from surrealdb_spark.sql.explain import plan_legacy

        self._refresh_catalog()
        if "all-ro" in getattr(self, "planner_strategy", ()):
            # the new planner rewrites `SELECT ... EXPLAIN` to
            # `EXPLAIN FORMAT JSON SELECT ...` (and EXPLAIN FULL to the
            # ANALYZE form — statements/explain/select_explain_rewrite)
            from dataclasses import replace as _rp

            from surrealdb_spark.sql.explain import plan_new, render_json

            analyze = sel.explain == "full"
            node = plan_new(self, _rp(sel, explain=None), params or {})
            return render_json(node, analyze=analyze)
        return plan_legacy(self, sel, params or {})

    # internals -----------------------------------------------------------

    def _remove(self, stmt: RemoveStmt, params: dict | None = None) -> None:
        """REMOVE <kind> — drop a catalog object (statements/remove/*.rs)."""
        params = params or {}
        k, name = stmt.kind, stmt.name
        if k == "config":
            canon = {"graphql": "GraphQL", "api": "API",
                     "default": "Default"}.get(str(name).lower(),
                                               str(name))
            # ALTER stores Default at DB level; REMOVE checks ROOT
            # (alter_config.surql: removing default always errors)
            if canon == "Default":
                if canon in self.root_configs:
                    self.root_configs.discard(canon)
                    self.kv_defaults = {}
                    return None
                if stmt.if_exists:
                    return None
                raise ValueError(
                    "The config for default does not exist")
            if canon not in self.meta["configs"]:
                if stmt.if_exists:
                    return None
                raise ValueError(
                    f"The config for {str(name).lower()} does not exist")
            self.meta["configs"].pop(canon, None)
            self.obj_info.get("configs", {}).pop(canon, None)
            return None
        cat = {"table": "tables", "analyzer": "analyzers", "param": "params",
               "sequence": "sequences", "function": "functions"}.get(k)
        if cat:
            self.meta[cat].pop(name, None)
            self.obj_info.get(cat, {}).pop(name, None)
        if k == "table":
            deps = [v for v, (vast, _t) in self.view_defs.items()
                    if v != name and name in [s for s in vast.sources
                                              if isinstance(s, str)]]
            if deps:
                # foreign (view) tables pin their source
                # (statements/remove/table.rs: removal fails while a
                # view reads from it — view/removed.surql)
                raise ValueError(
                    f"Cannot remove table '{name}': view(s) "
                    f"{', '.join(deps)} are defined from it")
            del self.db.tables[name]
            self.view_defs.pop(name, None)
            self.catalog._cache.pop(name, None)
            import shutil

            # the table's rows, indexes and field meta go with it —
            # a later re-DEFINE starts empty (statements/remove/table.rs)
            shutil.rmtree(f"{self.db.root}/{name}", ignore_errors=True)
            for ixn in [n for n, d in self.index_defs.items()
                        if d.table == name]:
                self.index_defs.pop(ixn, None)
                self.indexes.pop(ixn, None)
            self.table_meta.pop(name, None)
            self.obj_info["tables"].pop(name, None)
            # field definitions go with the table: a later re-DEFINE FIELD
            # must not hit the duplicate check (remove/table.rs drops the
            # table's field metadata)
            for reg in ("field_stmt", "field_struct"):
                fs = self.obj_info.get(reg, {})
                for key in [k for k in fs if k[0] == name]:
                    fs.pop(key, None)
            return
        if k == "field":
            tbl = stmt.table
            if isinstance(tbl, str) and tbl.startswith("$"):
                tbl = str(params.get(tbl[1:], tbl))
            if isinstance(name, str) and name.startswith("$"):
                name = str(params.get(name[1:], name))
            td = self.db.tables[tbl]
            before = len(td.fields)
            td.fields = [f for f in td.fields if f.name != name]
            self.table_meta.get(tbl, {}).get("fields", {}).pop(name, None)
            self.computed_fields.get(tbl, {}).pop(name, None)
            had_def = self.obj_info.get("field_stmt", {}).pop(
                (tbl, name), None) is not None
            self.obj_info.get("field_struct", {}).pop((tbl, name), None)
            if had_def and len(td.fields) == before:
                return  # clause-less field: registry entry only
            if len(td.fields) == before:
                ti0 = self.obj_info["tables"].get(tbl, {})
                if name in ("in", "out") and (ti0.get("rel_in")
                                              or ti0.get("rel_out")):
                    # in/out on relation tables are implicit fields;
                    # removing one drops its endpoint-table constraint
                    # (table/redefinition.surql)
                    ti0["rel_in" if name == "in" else "rel_out"] = None
                    return
                raise KeyError(f"no such field {name}")
            return
        if k == "index":
            d = self.index_defs.pop(name)  # KeyError if absent
            self.indexes.pop(name, None)
            if d.kind == "uniq":
                td = self.db.tables.get(d.table)
                if td and list(d.fields) in td.unique_indexes:
                    td.unique_indexes.remove(list(d.fields))
            return
        if k == "analyzer":
            from surrealdb_spark.pipeline.analyzer import remove_analyzer

            remove_analyzer(name)
            return
        if k == "function":
            from surrealdb_spark.functions.registry import REGISTRY

            full = name if str(name).startswith("fn::") else f"fn::{name}"
            if name not in self.functions and full not in self.functions:
                if stmt.if_exists:
                    return
                raise KeyError(f"The function '{full}' does not exist")
            self.functions.pop(name, None)
            self.functions.pop(full, None)
            REGISTRY.pop(f"fn::{name}", None)
            REGISTRY.pop(full, None)
            # the driver-eval twins must go too, or removed functions
            # stay callable on the pyeval path (and leak across runners)
            from surrealdb_spark import pyeval as _pyr

            _pyr.USER_FNS.pop(f"fn::{name}", None)
            _pyr.USER_FNS.pop(full, None)
            _pyr.SCRIPT_FNS.pop(f"fn::{name}", None)
            _pyr.SCRIPT_FNS.pop(full, None)
            return
        if k == "param":
            del self.params_defined[name]
            return
        if k == "sequence":
            from surrealdb_spark import export as _exp

            del self.sequences[name]
            _exp._SEQUENCES.pop(name, None)
            return
        if k == "event":
            tbl, hook = self.events.pop(name)
            self.event_defs.pop(name, None)
            td = self.db.tables.get(tbl)
            if td and hook in td.events:
                td.events.remove(hook)
            self.table_meta.get(tbl, {}).get("events", {}).pop(name, None)
            return
        if k in ("bucket", "access", "user", "api"):
            cat = {"bucket": "buckets", "access": "accesses",
                   "user": "users", "api": "apis"}[k]
            if isinstance(stmt.name, str) and stmt.name.startswith("$"):
                stmt.name = str(params.get(stmt.name[1:], stmt.name))
            # ON NAMESPACE/DATABASE picks the level catalog (the parsed
            # tbl slot carries the level word when present)
            level = (stmt.table or "DATABASE").upper()
            reg = self._level_cat(cat, level) if k in ("access", "user") \
                else self.meta[cat]
            if stmt.name not in reg and not stmt.if_exists:
                raise KeyError(f"The {k} '{stmt.name}' does not exist")
            reg.pop(stmt.name, None)
            self.obj_info.get(cat, {}).pop(stmt.name, None)
            self.obj_info.get(f"{k}_struct", {}).pop(stmt.name, None)
            if k == "bucket":
                from surrealdb_spark.pipeline.filebucket import remove_bucket

                remove_bucket(stmt.name)
            return
        if k in ("namespace", "ns"):
            if stmt.name not in self.namespaces and not stmt.if_exists:
                raise KeyError(
                    f"The namespace '{stmt.name}' does not exist")
            self.namespaces.pop(stmt.name, None)
            return
        if k in ("database", "db"):
            if not any(stmt.name in dbs
                       for dbs in self.databases.values()) \
                    and not stmt.if_exists:
                raise KeyError(
                    f"The database '{stmt.name}' does not exist")
            for dbs in self.databases.values():
                dbs.pop(stmt.name, None)
            return
        raise ValueError(f"REMOVE {k} not supported")

    @staticmethod
    def _computed_deps(ast) -> set:
        """Field names a COMPUTED expression reads: bare idents,
        `$this.f` / `$self.f` paths, `$this['f']` brackets
        (define/field.rs computed dependency walk)."""
        deps: set = set()

        def walk(a):
            if isinstance(a, (list,)):
                for x in a:
                    walk(x)
                return
            if not isinstance(a, tuple):
                return
            if a[0] == "ident":
                deps.add(a[1])
                return
            if a[0] == "path":
                base = a[1]
                if base[0] == "ident":
                    deps.add(base[1])
                elif base[0] == "param" and base[1] in ("this", "self"):
                    for part in a[2]:
                        if part[0] == "field":
                            deps.add(part[1])
                            break
                        if part[0] in ("index", "iexpr") and isinstance(
                                part[1], tuple) and part[1][0] == "lit" \
                                and isinstance(part[1][1], str):
                            deps.add(part[1][1])
                            break
                if base[0] not in ("ident", "param"):
                    walk(base)  # `{ val: a }.val` — deps inside the base
                for part in a[2]:
                    walk(part[1] if len(part) > 1 else None)
                return
            for x in a[1:]:
                walk(x)

        walk(ast)
        return deps

    def _check_computed_cycle(self, table: str, name: str, ast) -> None:
        """Registering a computed field must not close a dependency cycle
        (define/field.rs cycle check)."""
        comp = dict(self.computed_fields.get(table, {}))
        graph = {n: self._computed_deps(spec[1])
                 for n, spec in comp.items() if spec[0] == "expr"}
        graph[name] = self._computed_deps(ast)

        path: list = []

        def dfs(n, target) -> bool:
            path.append(n)
            for d in graph.get(n, ()):
                if d == target:
                    path.append(d)
                    return True
                if d in graph and d not in path and dfs(d, target):
                    return True
            path.pop()
            return False

        if dfs(name, name):
            raise ValueError(
                "Cyclic dependency detected among computed fields: "
                + " -> ".join(path))

    def _define_misc(self, stmt: "DefineMiscStmt", params: dict) -> None:
        """DEFINE ACCESS/USER/API/CONFIG — resolve params, render the
        canonical text (Display impls in define/{access,user,api}.rs),
        store for INFO."""
        from surrealdb_spark import pyeval

        if stmt.kind in ("access", "user"):
            reg0 = self._level_cat(
                "accesses" if stmt.kind == "access" else "users",
                stmt.level)
            if stmt.name in reg0:
                # redefinition needs OVERWRITE (define/access.rs)
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The {stmt.kind} '{stmt.name}' already exists")

        def rv(v):
            if isinstance(v, tuple) and v[0] == "param":
                return params.get(v[1])
            return v

        def dur_text(v):
            v = rv(v)
            if v is None:
                return "NONE"
            if isinstance(v, str):
                # canonical greedy-unit display: 24h → 1d
                # (types duration fmt; alter_access.surql)
                try:
                    from surrealdb_spark.sql.parser import (
                        _parse_duration_nanos)

                    ns = _parse_duration_nanos(v)
                    if ns:
                        return pyeval._render_duration(
                            {"nanos": ns, "months": 0})
                except Exception:
                    pass
                return v
            if hasattr(v, "asDict"):
                v = v.asDict()
            if isinstance(v, dict):
                return pyeval._render_duration(v)
            return str(v)

        from surrealdb_spark.functions.extra_fns import SessionContext

        if stmt.kind in ("user", "access"):
            if stmt.level in ("DATABASE", "DB") and \
                    SessionContext.get("db") is None:
                raise ValueError("Specify a database to use")
            if stmt.level in ("NAMESPACE", "NS") and \
                    SessionContext.get("ns") is None:
                raise ValueError("Specify a namespace to use")
        cl = stmt.clauses
        comment = rv(cl.get("comment"))
        if stmt.kind == "config_default":
            ns0, db0 = rv(cl.get("namespace")), rv(cl.get("database"))
            txt = "DEFAULT"
            if ns0:
                txt += f" NAMESPACE {ns0}"
            if db0:
                txt += f" DATABASE {db0}"
            self.meta["configs"]["Default"] = txt
            self.kv_defaults = {"namespace": ns0, "database": db0}
            return None
        if stmt.kind == "config_graphql":
            mode_ = getattr(stmt, "mode", None)
            if mode_ == "alter_ine" \
                    and "GraphQL" not in self.meta["configs"]:
                return None  # ALTER IF EXISTS on a missing config: NONE
            if "GraphQL" in self.meta["configs"]:
                if mode_ == "ine":  # DEFINE IF NOT EXISTS: keep existing
                    return None
                if mode_ not in ("overwrite", "alter", "alter_ine"):
                    raise ValueError(
                        "The config 'GraphQL' already exists")
            def word(v):
                if isinstance(v, tuple):
                    return f"{v[0]} {', '.join(v[1])}"
                return v

            t, f = cl.get("tables", "NONE"), cl.get("functions", "NONE")
            txt = f"GRAPHQL TABLES {word(t)} FUNCTIONS {word(f)}"
            if cl.get("depth") is not None:
                txt += f" DEPTH {cl['depth']}"
            if cl.get("complexity") is not None:
                txt += f" COMPLEXITY {cl['complexity']}"
            if cl.get("introspection"):
                txt += f" INTROSPECTION {cl['introspection']}"
            self.meta["configs"]["GraphQL"] = txt

            def struct(v):
                if v == "NONE":
                    return None
                if isinstance(v, tuple):
                    return {v[0].lower(): v[1]}
                return v

            gq = {"tables": struct(t), "functions": struct(f)}
            if cl.get("depth") is not None:
                gq["depth_limit"] = cl["depth"]
            if cl.get("complexity") is not None:
                gq["complexity_limit"] = cl["complexity"]
            if cl.get("introspection"):
                gq["introspection"] = (None
                                       if cl["introspection"] == "NONE"
                                       else cl["introspection"])
            self.obj_info.setdefault("configs", {})["GraphQL"] = {
                "graphql": gq}
            return None
        if stmt.kind == "config_api":
            if getattr(stmt, "mode", None) == "alter_ine" \
                    and "API" not in self.meta["configs"]:
                return None
            txt = "API"
            if cl.get("middleware"):
                txt += f" MIDDLEWARE {_canon_stmt_text(cl['middleware'])}"
            txt += f" PERMISSIONS {cl.get('perms', 'FULL')}"
            self.meta["configs"]["API"] = txt
            # STRUCTURE form: permissions render as booleans (FULL→true,
            # NONE→false, info.rs Permission::structure); middleware is
            # omitted when unset (remove/config/api.surql)
            _api_s: dict = {}
            if cl.get("middleware"):
                _api_s["middleware"] = cl.get("middleware")
            _p = cl.get("perms", "FULL")
            _api_s["permissions"] = (True if str(_p).upper() == "FULL"
                                     else False if str(_p).upper() == "NONE"
                                     else _p)
            self.obj_info.setdefault("configs", {})["API"] = {"api": _api_s}
            return None
        if stmt.kind == "config":
            self.kv_defaults = {
                "namespace": rv(cl.get("namespace")),
                "database": rv(cl.get("database"))}
            self.root_configs.add("Default")
            return None
        if stmt.kind == "api":
            path = str(rv(stmt.name))
            mode_a = getattr(stmt, "mode", None)
            structs = self.obj_info.setdefault("api_struct", {})
            if path in structs:
                if mode_a == "ine":
                    return None
                if mode_a != "overwrite":
                    raise ValueError(f"The api '{path}' already exists")
            groups = []
            for g in cl.get("groups") or [{"methods": ["any"],
                                           "middleware":
                                           cl.get("middleware"),
                                           "perms": cl.get("perms",
                                                           "FULL"),
                                           "then": None,
                                           "fallback": True}]:
                g = dict(g)
                if g.get("middleware"):
                    mw = g["middleware"]
                    for k, v in (params or {}).items():
                        mw = mw.replace(f"${k}", _surql_literal(v)
                                        if isinstance(v, str) else str(v))
                    g["middleware"] = mw
                if g.get("then"):
                    g["then"] = _canon_stmt_text(g["then"])
                groups.append(g)
            # fallback group renders first (define/api.rs Display)
            groups.sort(key=lambda g: 0 if g.get("fallback") else 1)
            ap = {"groups": groups, "comment": comment}
            structs[path] = ap
            self.meta["apis"][path] = _render_api(path, ap)
            return None
        if stmt.kind in ("user", "access"):
            cl2 = dict(cl)
            cl2["comment"] = comment
            self.obj_info.setdefault(f"{stmt.kind}_struct", {})[
                stmt.name] = {"level": stmt.level, "clauses": cl2}
        if stmt.kind == "user":
            roles = ", ".join(cl.get("roles", ["VIEWER"]))
            txt = (f"DEFINE USER {stmt.name} ON {stmt.level} PASSHASH '' "
                   f"ROLES {roles} DURATION FOR TOKEN "
                   f"{dur_text(cl.get('token', '1h'))}, FOR SESSION "
                   f"{dur_text(cl.get('session'))}")
            if comment:
                txt += f" COMMENT {_surql_literal(comment)}"
            self._level_cat("users", stmt.level)[stmt.name] = txt
            return None
        # access
        txt = f"DEFINE ACCESS {stmt.name} ON {stmt.level}"
        txt += f" TYPE {cl.get('type', 'JWT')}"
        if cl.get("alg"):
            txt += f" ALGORITHM {cl['alg']}"
        if cl.get("key"):
            txt += " KEY '[REDACTED]' WITH ISSUER KEY '[REDACTED]'"
        txt += (f" DURATION FOR TOKEN {dur_text(cl.get('token', '1h'))}, "
                f"FOR SESSION {dur_text(cl.get('session'))}")
        if comment:
            txt += f" COMMENT {_surql_literal(comment)}"
        self._level_cat("accesses", stmt.level)[stmt.name] = txt
        return None

    def _alter_detail(self, stmt: AlterDetailStmt, params: dict):
        """ALTER EVENT/INDEX/FUNCTION/ACCESS/USER/API/SYSTEM execution:
        merge clause updates into stored state, re-render INFO text
        (statements/alter/*.surql)."""
        k = stmt.kind
        if k == "field":
            prev = self.obj_info.get("field_stmt", {}).get(
                (stmt.table, stmt.name))
            if prev is None:
                if stmt.if_exists:
                    return None
                raise KeyError(
                    f"The field '{stmt.name}' does not exist")
            import copy as _copy

            ds = stmt.sets["stmt"]
            merged = _copy.deepcopy(prev)
            if ds.kind_text:
                merged.dtype, merged.kind_text = ds.dtype, ds.kind_text
                merged.flexible = ds.flexible
            for key in ("default", "default_always", "value", "assert",
                        "computed", "readonly", "reference", "on_delete",
                        "on_delete_then", "comment", "perms"):
                if key in ds.texts:
                    merged.texts[key] = ds.texts[key]
            for key, attr in (("default", "default"), ("value", "value"),
                              ("assert", "assert_"),
                              ("computed", "computed")):
                if key in ds.texts:
                    setattr(merged, attr, getattr(ds, attr))
            dropmap = {"TYPE": None, "READONLY": "readonly",
                       "VALUE": "value", "ASSERT": "assert",
                       "DEFAULT": "default", "COMMENT": "comment",
                       "REFERENCE": "reference", "COMPUTED": "computed",
                       "FLEXIBLE": None}
            for d in stmt.drops:
                if d == "TYPE":
                    merged.dtype = merged.kind_text = None
                elif d == "FLEXIBLE":
                    merged.flexible = False
                elif d in dropmap and dropmap[d]:
                    merged.texts.pop(dropmap[d], None)
                    if d == "VALUE":
                        merged.value = None
                    elif d == "ASSERT":
                        merged.assert_ = None
                    elif d == "DEFAULT":
                        merged.default = None
                        merged.texts.pop("default_always", None)
                    elif d == "COMPUTED":
                        merged.computed = None
                    elif d == "REFERENCE":
                        merged.texts.pop("on_delete", None)
                        merged.texts.pop("on_delete_then", None)
            return self._execute_inner(merged, params)
        if k == "event":
            est = self.obj_info.get("event_struct", {}).get(
                (stmt.table, stmt.name))
            if est is None:
                if stmt.if_exists:
                    return None
                raise KeyError(
                    f"The event '{stmt.name}' does not exist")
            old_tbl, old_hook = self.events.get(stmt.name,
                                                (stmt.table, None))
            if old_hook is not None:
                td0 = self.db.tables.get(old_tbl)
                if td0 is not None and old_hook in td0.events:
                    td0.events.remove(old_hook)
            _t, old_when, old_then = self.event_defs.get(
                stmt.name, (stmt.table, None, []))
            new = DefineEventStmt(stmt.name, stmt.table)
            new.when = stmt.sets.get("when", old_when)
            new.when_text = stmt.sets.get("when_text")
            new.then = stmt.sets.get("then", list(old_then))
            new.then_src = stmt.sets.get("then_src", est["then_txt"])
            new.comment = (None if "COMMENT" in stmt.drops
                           else stmt.sets.get("comment", est["comment"]))
            if "ASYNC" in stmt.drops:
                new.is_async, new.retry, new.maxdepth = False, None, None
            else:
                new.is_async = stmt.sets.get("is_async", est["is_async"])
                new.retry = stmt.sets.get("retry", est["retry"])
                new.maxdepth = stmt.sets.get("maxdepth", est["maxdepth"])
            return self._execute_inner(new, params)
        if k == "index":
            d = self.index_defs.get(stmt.name)
            if d is None or d.table != stmt.table:
                if stmt.if_exists:
                    return None
                raise KeyError(
                    f"The index '{stmt.name}' does not exist")
            if "COMMENT" in stmt.sets:
                d.comment = stmt.sets["comment"]
            if "comment" in stmt.sets:
                d.comment = stmt.sets["comment"]
            if "COMMENT" in stmt.drops:
                d.comment = None
            if stmt.sets.get("prepare_remove"):
                # decommissioned: the planner must stop using it
                # (alter_index_prepare_remove.surql)
                d.prepare_remove = True
            return None
        if k == "function":
            name = stmt.name if stmt.name.startswith("fn::") \
                else f"fn::{stmt.name}"
            short = name.removeprefix("fn::")
            exists = name in self.functions or short in self.functions
            if stmt.redefine_src is not None:
                fname = stmt.redefine_src.split("(", 1)[0].strip()
                if not (fname in self.functions
                        or fname.removeprefix("fn::") in self.functions
                        or f"fn::{fname}" in self.functions):
                    if stmt.if_exists:
                        return None
                    raise KeyError(
                        f"The function '{fname}' does not exist")
                return self.run(
                    "DEFINE FUNCTION OVERWRITE " + stmt.redefine_src,
                    params=params)
            if not exists:
                if stmt.if_exists:
                    return None
                raise KeyError(f"The function '{name}' does not exist")
            f = self.functions.get(name) or self.functions.get(short)
            if "COMMENT" in stmt.drops:
                f.comment = None
            if "comment" in stmt.sets:
                f.comment = stmt.sets["comment"]
            if "perms" in stmt.sets:
                f.perms = stmt.sets["perms"]
            return None
        if k in ("access", "user"):
            cat = "accesses" if k == "access" else "users"
            store = self._level_cat(cat, stmt.level or "DATABASE")
            struct = self.obj_info.get(f"{k}_struct", {}).get(stmt.name)
            if stmt.name not in store or struct is None:
                if stmt.if_exists:
                    return None
                raise KeyError(f"The {k} '{stmt.name}' does not exist")
            cl = struct["clauses"]
            for key in ("token", "session", "comment", "roles"):
                if key in stmt.sets:
                    cl[key] = stmt.sets[key]
            if "COMMENT" in stmt.drops:
                cl.pop("comment", None)
            redo = DefineMiscStmt(k, stmt.name)
            redo.level = struct["level"]
            redo.clauses.update(cl)
            return self._define_misc(redo, params)
        if k == "api":
            ap = self.obj_info.get("api_struct", {}).get(stmt.name)
            if ap is None:
                if stmt.if_exists:
                    return None
                raise KeyError(f"The api '{stmt.name}' does not exist")
            if "comment" in stmt.sets:
                ap["comment"] = stmt.sets["comment"]
            if "COMMENT" in stmt.drops:
                ap["comment"] = None
            for meth, action, body in stmt.api_for:
                groups = ap["groups"]
                for g in groups:
                    if meth in g["methods"]:
                        g["methods"].remove(meth)
                ap["groups"] = [g for g in groups
                                if g["methods"]
                                or (g.get("fallback") and meth != "any")]
                if meth == "any":
                    fb = next((g for g in ap["groups"]
                               if g.get("fallback")), None)
                    if fb is None:
                        fb = {"methods": ["any"], "middleware": None,
                              "perms": "FULL", "then": None,
                              "fallback": True}
                        ap["groups"].insert(0, fb)
                    fb["methods"] = ["any"]
                    fb["then"] = (_canon_stmt_text(body)
                                  if action == "then" else None)
                elif action == "then":
                    ap["groups"].append(
                        {"methods": [meth], "middleware": None,
                         "perms": "FULL",
                         "then": _canon_stmt_text(body)})
            self.meta["apis"][str(stmt.name)] = _render_api(
                stmt.name, ap)
            return None
        if k == "system":
            if stmt.sets.get("compact") and "mem" in getattr(
                    self, "backend", ()):
                raise ValueError("The storage layer does not support "
                                 "compaction requests.")
            if "query_timeout" in stmt.sets:
                self.obj_info.setdefault("system", {})[
                    "query_timeout"] = stmt.sets["query_timeout"]
            if "QUERY_TIMEOUT" in stmt.drops:
                self.obj_info.setdefault("system", {}).pop(
                    "query_timeout", None)
            return None  # COMPACT: storage maintenance no-op
        raise ValueError(f"ALTER {k} not supported")

    def _level_cat(self, cat: str, level: str) -> dict:
        """users/accesses live at ROOT/NAMESPACE/DATABASE level
        (info.rs renders each level's own catalog)."""
        if level in ("NAMESPACE", "NS"):
            return self.ns_meta.setdefault(cat, {})
        if level == "ROOT":
            return self.root_meta.setdefault(cat, {})
        return self.meta[cat]

    def _info(self, stmt: InfoStmt):
        """INFO FOR DB/TABLE/INDEX/NS/ROOT → the reference-shaped catalog
        object (info.rs renders category → name → canonical DEFINE text)."""
        if stmt.level == "ns":
            from surrealdb_spark.functions.extra_fns import SessionContext

            dbs = self.databases.get(SessionContext.get("ns") or "", {})
            return {"accesses": dict(self.ns_meta.get("accesses", {})),
                    "users": dict(self.ns_meta.get("users", {})),
                    "databases": {n: d["text"] for n, d in dbs.items()}}
        if stmt.level in ("root", "kv"):
            if stmt.level == "kv":
                return {"defaults": dict(self.kv_defaults),
                        "namespaces": {n: d["text"]
                                       for n, d in self.namespaces.items()}}
            return {"accesses": dict(self.root_meta.get("accesses", {})),
                    # root-level DEFAULT config (define/config.rs DEFAULT
                    # stores at root; shown only when defined there)
                    "defaults": ({k: v for k, v in self.kv_defaults.items()
                                  if v is not None}
                                 if "Default" in self.root_configs else {}),
                    "nodes": {},
                    "users": dict(self.root_meta.get("users", {})),
                    "system": {"available_parallelism": 0,
                               "cpu_usage": 0.0, "load_average": [],
                               "memory_allocated": 0, "memory_usage": 0,
                               "physical_cores": 0, "threads": 0},
                    "namespaces": {n: d["text"]
                                   for n, d in self.namespaces.items()}}
        if stmt.level == "db":
            out = {c: dict(self.meta[c]) for c in _INFO_DB_CATS}
            for n in self.db.tables:
                out["tables"].setdefault(
                    n, f"DEFINE TABLE {n} TYPE ANY SCHEMALESS PERMISSIONS NONE")
            for n in self.functions:
                fstmt = self.functions[n]
                ftxt = ""
                if getattr(fstmt, "text", None):
                    import re as _re4

                    body_txt = _canon_stmt_text(fstmt.text)
                    body_txt = _re4.sub(r"\)\{", ") {", body_txt)
                    # canonical operator spellings (Operator Display)
                    body_txt = body_txt.replace(" || ", " OR ") \
                        .replace(" && ", " AND ")
                    ftxt = (f"DEFINE FUNCTION fn::"
                            f"{n.removeprefix('fn::')}{body_txt}")
                    if fstmt.comment:
                        ftxt += f" COMMENT {_surql_literal(fstmt.comment)}"
                    ftxt += (" PERMISSIONS "
                             + (getattr(fstmt, 'perms', None) or "FULL"))
                out["functions"].setdefault(n.removeprefix("fn::"), ftxt)
            if stmt.structure:
                # `INFO FOR DB STRUCTURE` — every category is an ARRAY of
                # structured objects (info.rs structure rendering)
                from surrealdb_spark import pyeval as _pst

                structured: dict = {}
                for cat_n, entries in out.items():
                    if cat_n == "sequences":
                        seqs = []
                        for n in sorted(self.obj_info["sequences"]):
                            i2 = self.obj_info["sequences"][n]
                            to = i2.get("timeout")
                            if isinstance(to, str):
                                try:
                                    to = _pst.eval_text(to, {})
                                except Exception:
                                    pass
                            seqs.append({"batch": str(i2.get("batch")),
                                         "name": n,
                                         "start": str(i2.get("start")),
                                         "timeout": to})
                        structured[cat_n] = seqs
                    elif cat_n == "configs":
                        structured[cat_n] = list(
                            self.obj_info.get("configs", {}).values())
                    elif isinstance(entries, dict):
                        structured[cat_n] = list(entries.values())
                    else:
                        structured[cat_n] = entries
                return structured
            return out
        if stmt.level == "table":
            td = self.db.tables[stmt.table]
            tm = self.table_meta.get(stmt.table, {})
            fields = dict(tm.get("fields", {}))
            for f in td.fields:
                fields.setdefault(
                    f.name,
                    f"DEFINE FIELD {f.name} ON {stmt.table}"
                    + (f" TYPE {f.dtype}" if f.dtype else "")
                    + " PERMISSIONS FULL")
            indexes = {}

            def _bt(x: str) -> str:
                # non-plain identifiers render backticked (Display for
                # Ident — `user.csv` in index/concurrently.surql)
                import re as _re9

                return x if _re9.fullmatch(r"\w+", x) else f"`{x}`"

            for n, d in self.index_defs.items():
                if d.table != stmt.table:
                    continue
                t = f"DEFINE INDEX {_bt(n)} ON {_bt(d.table)}" + (
                    f" FIELDS {', '.join(d.fields)}" if d.fields else "")
                if d.kind == "uniq":
                    t += " UNIQUE"
                elif d.kind == "fulltext":
                    t += f" FULLTEXT ANALYZER {d.analyzer or 'like'}"
                    if d.bm25 is not None:
                        t += f" BM25({d.bm25[0]},{d.bm25[1]})"
                    if d.highlights:
                        t += " HIGHLIGHTS"
                elif d.kind == "hnsw":
                    t += f" HNSW DIMENSION {d.dimension}"
                elif d.kind == "count":
                    t += " COUNT"
                if getattr(d, "comment", None):
                    t += f" COMMENT {_surql_literal(d.comment)}"
                indexes[n] = t
            events = dict(tm.get("events", {}))
            for n, (t_, _) in self.events.items():
                if t_ == stmt.table:
                    events.setdefault(n, "")
            if stmt.structure:
                # `INFO FOR TABLE t STRUCTURE` — object form (info.rs
                # structure rendering: arrays of definition objects)
                fobjs = []
                for fn in sorted(fields):
                    fd2 = (self.obj_info.get("field_struct", {})
                           .get((stmt.table, fn), {}))
                    o = {"name": fn, "table": stmt.table,
                         "readonly": bool(fd2.get("readonly")),
                         "permissions": {"create": True, "select": True,
                                         "update": True}}
                    for k2 in ("kind", "default", "default_always",
                               "value"):
                        if fd2.get(k2) is not None:
                            o[k2] = fd2[k2]
                    fobjs.append(o)
                iobjs = []
                for n, d in self.index_defs.items():
                    if d.table != stmt.table:
                        continue
                    kindw = {"count": "COUNT", "uniq": "UNIQUE",
                             "fulltext": "FULLTEXT",
                             "hnsw": "HNSW"}.get(
                        getattr(d, "kind", "idx"), "IDX")
                    o = {"cols": list(d.fields or []), "index": kindw,
                         "name": n, "table": stmt.table}
                    if getattr(d, "prepare_remove", False):
                        o["prepare_remove"] = True
                    if getattr(d, "comment", None):
                        o["comment"] = d.comment
                    iobjs.append(o)
                return {"events": [], "fields": fobjs, "indexes": iobjs,
                        "lives": [], "tables": []}
            # foreign (view) tables defined FROM this table list under
            # its INFO (statements/info.rs table info; view/foreigntable)
            ftables = {
                v: self.meta["tables"][v]
                for v, (vast, _t) in self.view_defs.items()
                if stmt.table in [s for s in vast.sources
                                  if isinstance(s, str)]
                and v in self.meta["tables"]}
            return {"events": events, "fields": fields, "indexes": indexes,
                    "lives": {}, "tables": ftables}
        d = self.index_defs[stmt.name]
        # `{building: {...}}` status shape (expr/statements/info.rs;
        # initial = rows indexed at (re)build time, async build done)
        if getattr(d, "build_error", None):
            return {"building": {"error": d.build_error,
                                 "status": "error"}}
        return {"building": {"initial": getattr(d, "initial_rows", 0),
                             "pending": 0, "status": "ready",
                             "updated": 0}}

    @staticmethod
    def _analyzer_names() -> list[str]:
        from surrealdb_spark.pipeline.analyzer import ANALYZERS

        return sorted(ANALYZERS)

    def _refresh_catalog(self) -> None:
        # HNSW index metrics: `<|k, ef|>` searches use the INDEX's
        # declared DIST (exec/operators/scan/knn.rs)
        self.catalog.hnsw_dist = {
            (d.table, str(d.fields[0]) if d.fields else ""):
                (d.dist or "euclidean").lower()
            for d in self.index_defs.values()
            if getattr(d, "kind", "") == "hnsw"}
        # HNSW vector storage type: F32 is the DEFAULT (schema/index.rs
        # VectorType) — distances accumulate in f32 unless TYPE F64
        self.catalog.hnsw_vtype = {
            (d.table, str(d.fields[0]) if d.fields else ""):
                (getattr(d, "vtype", None) or "F32").upper()
            for d in self.index_defs.values()
            if getattr(d, "kind", "") == "hnsw"}
        edge_names = set()
        for name in self.db.tables:
            if self.db._exists(name):
                t = self._with_computed(name, self.db.table(name))
                self.catalog.register(name, t)
                if "in" in t.columns and "out" in t.columns:
                    # RELATE-shaped table → graph-lookup candidate for `?`
                    # wildcard segments (doc/relate.rs edge shape)
                    edge_names.add(name)
            else:
                # defined-but-empty table: SELECTs see zero rows with the
                # DECLARED field columns resolvable (schemafull tables
                # have a schema before any write — define/field.rs)
                cols = ["id string"]
                for fd in self.db.tables[name].fields:
                    if "." in fd.name or fd.name.endswith("*") \
                            or fd.name == "id":
                        continue
                    dt = fd.dtype if isinstance(fd.dtype, str) and \
                        "<" not in (fd.dtype or "") else None
                    cols.append(f"`{fd.name}` {dt or 'string'}")
                self.catalog.register(
                    name, self.spark.createDataFrame([], ", ".join(cols))
                )
        self.catalog.edge_names = edge_names
        for vname, (vast, _vtext) in self.view_defs.items():
            try:
                self.catalog.register(vname, self._view_frame(vname, vast))
            except Exception:
                # a view over a not-yet-existing source reads as empty
                self.catalog.register(
                    vname, self.spark.createDataFrame([], "id string"))

    def _view_frame(self, vname: str, vast) -> DataFrame:
        """`DEFINE TABLE v AS SELECT ...` read frame: the view's SELECT
        over the CURRENT source state, with the reference's view record
        ids (`v:[group values]`; GROUP ALL → `v:[]` —
        catalog/aggregation.rs group keys become the record id)."""
        from surrealdb_spark.sql.compiler import compile_select

        import os as _os

        for s in vast.sources:
            if isinstance(s, str) and s not in self.db.tables \
                    and s not in self.catalog._cache \
                    and not _os.path.exists(self.catalog.path(s)):
                # view over a table that doesn't exist yet: no groups
                # (incremental state starts empty, doc/table.rs)
                raise ValueError(f"view source {s!r} does not exist")
        df = compile_select(self.spark, vast, catalog=self.catalog,
                            params=self.params_defined)
        if vast.group == [] and vast.sources \
                and isinstance(vast.sources[0], str):
            # GROUP ALL view: the all-group row exists only once a source
            # row has contributed (incremental Group state — a view over
            # an empty/fully-filtered table has NO record, unlike a direct
            # `GROUP ALL` select which emits `{count: 0}`)
            import dataclasses as _dc

            probe = _dc.replace(vast, fields=None, value_expr=None,
                                group=None, order=[], limit=1,
                                fetch=[], omit=[])
            if compile_select(self.spark, probe, catalog=self.catalog,
                              params=self.params_defined).isEmpty():
                df = df.limit(0)
        if "id" in df.columns:
            return df
        key_names = []
        if vast.group:  # GROUP BY keys, in declaration order
            for g in vast.group:
                if g[0] == "ident":
                    key_names.append(g[1])
        parts = []
        dtypes = dict(df.dtypes)
        for k in key_names:
            if k in df.columns:
                c = F.col(k)
                if dtypes.get(k, "").startswith("timestamp"):
                    # datetime group keys print as d'RFC3339Z' in the id
                    parts.append(F.concat(
                        F.lit("d'"),
                        F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss"),
                        F.lit("Z'")))
                    continue
                parts.append(
                    F.when(c.cast("string").rlike(r"^-?\d+(\.\d+)?$")
                           | c.cast("string").isin("true", "false")
                           | c.cast("string").rlike(r"^\w+:.+$"),
                           c.cast("string"))
                    .otherwise(F.concat(F.lit("'"), c.cast("string"),
                                        F.lit("'"))))
        rid = F.concat(F.lit(vname + ":["),
                       F.concat_ws(", ", *parts) if parts else F.lit(""),
                       F.lit("]"))
        # reference view reads are id-ordered KV scans
        return df.withColumn("id", rid).orderBy(F.col("id"))

    def _check_strict(self, table) -> None:
        """STRICT databases reject reads/writes on undefined tables
        (doc strict-mode checks; closure/readonly.surql)."""
        if (self.strict and isinstance(table, str)
                and table not in self.db.tables
                and table not in self.meta["tables"]):
            raise ValueError(f"The table '{table}' does not exist")

    def _execute(self, stmt, params: dict) -> DataFrame | None:
        views = self._event_views_for(stmt)
        if not views:
            return self._execute_inner(stmt, params)
        # a mutation to a view's source changes the view's aggregate rows;
        # views with DEFINE EVENTs fire per changed row with the real
        # before/after images (doc/table.rs process_table_views →
        # doc/event.rs; view/triggers corpus)
        pre = {v: self._view_rows(v) for v in views}
        out = self._execute_inner(stmt, params)
        for v in views:
            self._fire_view_events(v, pre[v])
        return out

    def _event_views_for(self, stmt) -> list[str]:
        if not self.view_defs or not self.events:
            return []
        tgts = {getattr(getattr(stmt, "target", None), "table", None),
                getattr(stmt, "table", None)}
        tgts.discard(None)
        if not tgts:
            return []
        ev_tables = {t for (t, _h) in self.events.values()}
        return [v for v, (vast, _t) in self.view_defs.items()
                if v in ev_tables and tgts & {s for s in vast.sources
                                              if isinstance(s, str)}]

    def _view_rows(self, v: str) -> dict:
        self._refresh_catalog()
        vast, _t = self.view_defs[v]
        try:
            rows = _bounded_collect(self._view_frame(v, vast),
                                    f"view event diff ({v})")
        except Exception:
            return {}
        out = {}
        for r in rows:
            d = {k: x for k, x in r.asDict(recursive=True).items()
                 if k not in ("id", "__present") and x is not None
                 and not k.startswith("__k_")}
            out[r["id"]] = d
        return out

    def _fire_view_events(self, v: str, pre: dict) -> None:
        post = self._view_rows(v)
        changes = []
        for rid, aft in post.items():
            bef = pre.get(rid)
            if bef is None:
                changes.append(("CREATE", rid, None, aft))
            elif bef != aft:
                changes.append(("UPDATE", rid, bef, aft))
        for rid, bef in pre.items():
            if rid not in post:
                changes.append(("DELETE", rid, bef, None))
        if not changes:
            return
        defs = [(when, then) for name, (tbl, when, then)
                in self.event_defs.items() if tbl == v]
        for action, rid, bef, aft in changes:
            binds = {"event": action, "before": bef, "after": aft,
                     "value": aft if aft is not None else bef,
                     "this": aft if aft is not None else bef,
                     "input": None, "action": None}
            for when_ast, then_stmts in defs:
                if when_ast is not None:
                    keep = self.spark.range(1).select(
                        self._expr(when_ast, {
                            k: (F.struct(*[F.lit(x).alias(kk)
                                           for kk, x in val.items()])
                                if isinstance(val, dict) else F.lit(val))
                            for k, val in binds.items()
                        }).alias("v")).first()["v"]
                    if not keep:
                        continue
                for text in then_stmts:
                    txt = text.strip()
                    if txt.startswith("(") and txt.endswith(")"):
                        txt = txt[1:-1]
                    self.run(txt, params=binds)

    def _execute_inner(self, stmt, params: dict) -> DataFrame | None:
        self._evt_input = None  # per-statement $input for event scope
        tgt = getattr(stmt, "target", None)
        if tgt is not None:
            self._check_strict(getattr(tgt, "table", None))
        for attr in ("table",):
            self._check_strict(getattr(stmt, attr, None))
        if (tgt is not None and tgt.table is None
                and isinstance(tgt.key, tuple) and tgt.key[0] == "texpr"):
            # expression target (CREATE type::record('tb', $i)): evaluate
            # to the record id, then run as a point target.  Param-path
            # targets ($before.city) carry python dicts — driver eval.
            try:
                rid = self.spark.range(1).select(
                    self._expr(tgt.key[1], params).alias("v")).first()["v"]
            except Exception:
                from surrealdb_spark import pyeval as _pt

                rid = _pt.peval(tgt.key[1], dict(params or {}))
            tb, _, key = str(rid).partition(":")
            tgt.table = tb
            tgt.key = (int(key) if key.lstrip("-").isdigit() else key) \
                if key else None
            self._check_strict(tb)
        if (tgt is not None and tgt.table is None
                and isinstance(tgt.key, tuple) and tgt.key[0] == "param"):
            # $record target → table/key from the bound record id
            v = params.get(tgt.key[1])
            rid = v.get("id") if isinstance(v, dict) else v
            if rid is None:
                raise KeyError(f"unbound record parameter ${tgt.key[1]}")
            tb, _, key = str(rid).partition(":")
            tgt.table = tb
            tgt.key = int(key) if key.isdigit() else key
        if isinstance(stmt, DefineTableStmt):
            if stmt.name in self.obj_info["tables"]:
                # explicit redefinition needs OVERWRITE (define/table.rs;
                # implicitly-created tables can still be DEFINEd once)
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The table '{stmt.name}' already exists")
            self.db.define_table(TableDef(stmt.name))
            self.db.tables[stmt.name].schemafull = stmt.schemafull
            if stmt.ttype == "RELATION":
                self.db.tables[stmt.name].is_edge = True
            if stmt.as_select is not None:
                self.view_defs[stmt.name] = (stmt.as_select, stmt.as_text)
            elif stmt.name in self.view_defs:
                self.view_defs.pop(stmt.name)  # redefined as a plain table
            info_t = {"type": stmt.ttype, "schemafull": stmt.schemafull,
                      "enforced": stmt.enforced, "drop": stmt.drop,
                      "rel_in": stmt.rel_in, "rel_out": stmt.rel_out,
                      "changefeed": stmt.changefeed,
                      "as_text": stmt.as_text,
                      "comment": stmt.comment,
                      "perms": stmt.verb_perms or {
                          v: stmt.perms_text for v in
                          ("select", "create", "update", "delete")}}
            self.obj_info["tables"][stmt.name] = info_t
            self.meta["tables"][stmt.name] = _render_table(stmt.name, info_t)
            if stmt.select_perm == "none":
                self.catalog.set_permission(stmt.name, False)
            elif stmt.select_perm != "full":
                ast = stmt.select_perm

                def perm(sess, _ast=ast):
                    binds = {
                        k: (F.struct(*[F.lit(x).alias(kk)
                                       for kk, x in v.items()])
                            if isinstance(v, dict) else v)
                        for k, v in sess.items()
                    }
                    return self._expr(_ast, binds)

                self.catalog.set_permission(stmt.name, perm)
            return None
        if isinstance(stmt, DefineFieldStmt):
            if stmt.table not in self.db.tables:
                self.db.define_table(TableDef(stmt.table))
            td = self.db.tables[stmt.table]
            if stmt.flexible and not getattr(td, "schemafull", False):
                raise ValueError(
                    "FLEXIBLE only applies to SCHEMAFULL tables "
                    "(define/field.rs)")
            if (stmt.computed is not None
                    or stmt.texts.get("computed")) and "." in stmt.name:
                raise ValueError(
                    f"Cannot define field `{stmt.name}` as `COMPUTED` "
                    "fields must be top-level.")
            if (stmt.table, stmt.name) in self.obj_info.get(
                    "field_stmt", {}):
                # redefinition needs OVERWRITE (define/field.rs)
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The field '{stmt.name}' already exists")
            if stmt.name == "id" and stmt.kind_text:
                # only record-key shapes may type `id` (define/field.rs
                # id-kind check; statements/define/field/id_kind.surql):
                # number/int/string/uuid, arrays/sets/objects and literal
                # kinds of those — scalar kinds that can't be a key error
                bad_id = {"range", "function", "file", "geometry", "none",
                          "null", "bool", "bytes", "datetime", "decimal",
                          "duration", "float", "record", "point",
                          "regex", "closure"}
                for var in _split_top(stmt.kind_text, "|"):
                    base = var.split("<")[0].strip().lower()
                    if base in bad_id:
                        raise ValueError(
                            f"found {var.strip()} for the id field, but "
                            f"the id field must be a record key kind")
            if stmt.kind_text and ("." in stmt.name or "[" in stmt.name):
                # nested member types must fit the PARENT's declared kind
                # (define/field.rs; statements/define/field/mismatch.surql)
                import re as _re7

                m7 = _re7.match(r"([\w]+)(?:\.(\*|\w+)|\.?\[(\d+)\])$",
                                stmt.name)
                if m7:
                    parent = self.obj_info.get("field_stmt", {}).get(
                        (stmt.table, m7.group(1)))
                    sel = (int(m7.group(3)) if m7.group(3) is not None
                           else m7.group(2))
                    pk = getattr(parent, "kind_text", None) \
                        if parent else None
                    if pk:
                        st7 = _member_kinds(pk, sel)
                        if st7[0] == "bad" or (
                                st7[0] == "ok" and any(
                                    not _kind_coercible(mk, stmt.kind_text)
                                    for mk in st7[1])):
                            raise ValueError(
                                f"field `{stmt.name}` type "
                                f"`{stmt.kind_text}` does not fit the "
                                f"parent kind `{pk}`")
            self.table_meta.setdefault(stmt.table, {}).setdefault(
                "fields", {})[stmt.name] = _render_field(
                    stmt.name, stmt.table, stmt)
            if stmt.kind_text and "." not in stmt.name \
                    and "[" not in stmt.name:
                # array/set kinds recursively declare their element slots
                # (foo.* / foo.*.* — define/field.rs recursive types; a
                # pre-declared slot keeps its PERMISSIONS, its TYPE is
                # overwritten)
                from surrealdb_spark.sql.compiler import render_kind
                from surrealdb_spark.sql.parser import parse_kind

                def _elem_kinds(ka):
                    if ka[0] == "union":
                        out8 = []
                        for m8 in ka[1]:
                            out8.extend(_elem_kinds(m8))
                        return out8
                    if ka[0] in ("array", "set"):
                        return [ka[1][0]] if ka[1] else [("any", [])]
                    if ka[0] == "option" and ka[1]:
                        return _elem_kinds(ka[1][0])
                    return []

                try:
                    cur_k = parse_kind(stmt.kind_text)
                except Exception:
                    cur_k = None
                sub_n = stmt.name
                fm = self.table_meta[stmt.table]["fields"]
                for _ in range(8):  # recursion guard
                    if cur_k is None:
                        break
                    elems = _elem_kinds(cur_k)
                    if not elems:
                        break
                    sub_n += ".*"
                    cur_k = elems[0] if len(elems) == 1 \
                        else ("union", elems)
                    ktxt = render_kind(cur_k)
                    if ktxt in ("any",):
                        break
                    prev = self.obj_info.get("field_stmt", {}).get(
                        (stmt.table, sub_n))
                    if prev is not None:
                        import dataclasses as _dcf

                        sub_stmt = _dcf.replace(prev, kind_text=ktxt)
                    else:
                        sub_stmt = DefineFieldStmt(stmt.table, sub_n)
                        sub_stmt.kind_text = ktxt
                    fm[sub_n] = _render_field(sub_n, stmt.table, sub_stmt)
            if ".*." in stmt.name:
                # defining `users.*.x` implicitly declares the element
                # slot `users.*` (define/field.rs parent materialization)
                parent = stmt.name.rsplit(".", 1)[0]
                self.table_meta[stmt.table]["fields"].setdefault(
                    parent, f"DEFINE FIELD {parent} ON {stmt.table} "
                            "TYPE object PERMISSIONS FULL")
            # keep the parsed stmt for ALTER FIELD clause merges
            self.obj_info.setdefault("field_stmt", {})[
                (stmt.table, stmt.name)] = stmt
            import re as _re6

            def _fl6(txt):
                return txt + "f" if _re6.fullmatch(r"\d+\.\d+", txt) \
                    else txt

            fs = {"readonly": bool(stmt.texts.get("readonly")),
                  "kind": stmt.kind_text}
            if stmt.texts.get("default"):
                fs["default"] = _fl6(stmt.texts["default"])
                fs["default_always"] = bool(
                    stmt.texts.get("default_always"))
            if stmt.texts.get("value"):
                fs["value"] = _fl6(stmt.texts["value"])
            self.obj_info.setdefault("field_struct", {})[
                (stmt.table, stmt.name)] = fs
            if stmt.texts.get("reference"):
                import re as _re3

                m = _re3.search(r"record<\s*(\w+)", stmt.kind_text or "")
                lst = self.ref_fields.setdefault(stmt.table, [])
                lst[:] = [e for e in lst if e["field"] != stmt.name]
                lst.append({
                    "field": stmt.name,
                    "target": m.group(1) if m else None,
                    # bare REFERENCE defaults to IGNORE on delete
                    # (syn/parser/stmt/parts.rs:497)
                    "action": stmt.texts.get("on_delete", "IGNORE"),
                    "then": stmt.texts.get("on_delete_then"),
                })
            if stmt.computed is not None and stmt.computed[0] == "refscan":
                self.computed_fields.setdefault(stmt.table, {})[
                    stmt.name] = ("refs", stmt.computed[1])
                return None
            if stmt.computed is None and "." in stmt.name:
                # nested define under a COMPUTED parent is invalid
                # (define/field.rs nested-vs-computed checks)
                parent = stmt.name.split(".", 1)[0]
                if parent in self.computed_fields.get(stmt.table, {}):
                    raise ValueError(
                        f"Cannot define nested field `{stmt.name}` as "
                        f"parent field `{parent}` is a `COMPUTED` field.")
            if stmt.computed is not None:
                # COMPUTED exclusions (define/field.rs computed checks)
                if "." in stmt.name:
                    raise ValueError(
                        f"Cannot define field `{stmt.name}` as `COMPUTED` "
                        "fields must be top-level.")
                td0 = self.db.tables.get(stmt.table)
                nested = next(
                    (f.name for f in (td0.fields if td0 else [])
                     if f.name.startswith(stmt.name + ".")), None)
                if nested is not None:
                    raise ValueError(
                        f"Cannot define field `{stmt.name}` as `COMPUTED` "
                        f"since a nested field `{nested}` already exists.")
                if stmt.name == "id":
                    raise ValueError(
                        "Cannot use the `COMPUTED` keyword on the `id` "
                        "field.")
                for kw, bad in (("VALUE", stmt.value is not None),
                                ("ASSERT", stmt.assert_ is not None),
                                ("DEFAULT", stmt.default is not None),
                                ("REFERENCE",
                                 stmt.texts.get("reference", False)),
                                ("READONLY",
                                 stmt.texts.get("readonly", False))):
                    if bad:
                        raise ValueError(
                            f"Cannot use the `{kw}` keyword with "
                            "`COMPUTED`.")
                for ixn, d in self.index_defs.items():
                    if d.table == stmt.table and any(
                            str(f).split(".", 1)[0].split("[", 1)[0]
                            == stmt.name for f in d.fields):
                        raise ValueError(
                            f"Computed fields cannot be indexed. "
                            f"Index: '{ixn}' - Field: '{stmt.name}'")
                # generic COMPUTED <expr>: evaluated at read, always
                # present on every record (define/field.rs Computed)
                cast = stmt.computed
                self._check_computed_cycle(stmt.table, stmt.name, cast)
                if cast[0] == "block1" or (
                        cast[0] == "setlit" and len(cast[1]) == 1):
                    # `COMPUTED { expr }` — a value block, not a set
                    cast = cast[1] if cast[0] == "block1" else cast[1][0]
                self.computed_fields.setdefault(stmt.table, {})[
                    stmt.name] = ("expr", cast)
                if stmt.kind_text or stmt.dtype:
                    self.computed_kinds[(stmt.table, stmt.name)] = \
                        stmt.kind_text or stmt.dtype
                if stmt.table not in self.db.tables:
                    self.db.define_table(TableDef(stmt.table))
                return None
            dtype = {"int": "bigint", "float": "double",
                     # `number` is a UNION kind (int|float|decimal,
                     # types/src/value/number.rs) — no cast: each written
                     # value keeps its own numeric subtype
                     "number": None,
                     "string": "string", "bool": "boolean",
                     # 96-bit rust_decimal (types/src/value/number.rs:19-26)
                     # → widest Spark decimal at the reference's ~28-digit
                     # working precision
                     "decimal": "decimal(38,10)",
                     # tagged geometry struct (functions/geometry.py;
                     # types/src/value/geometry.rs)
                     "geometry": _GEOM_T, "point": _GEOM_T,
                     # record ids / uuids are strings in this engine
                     "record": "string", "uuid": "string",
                     # dynamic/container kinds: no cast (schemaless column;
                     # element kinds live in the written values)
                     "any": None, "option": None, "object": None,
                     "array": None, "set": None, "references": None,
                     "datetime": "timestamp"}.get(stmt.dtype, stmt.dtype)
            default = None
            if stmt.default is not None:
                dast = stmt.default
                default = (lambda a: (lambda: self._expr(a, {})))(dast)
            assert_fn = None
            if stmt.assert_ is not None:
                aast = stmt.assert_
                # $input = the statement's raw input for the field (NONE
                # when the write didn't touch it — doc/field.rs bindings)
                assert_fn = (lambda a: (
                    lambda col, inp=None: self._expr(
                        a, {"value": col, "this": col,
                            "input": inp if inp is not None else col})
                ))(aast)
            value_fn = None
            frame_value_fn = None
            if stmt.value is not None:
                from surrealdb_spark.sql.compiler import _has_lookup

                vast = stmt.value
                if _has_lookup(vast):
                    # graph-lookup VALUE body: recomputed per WRITE over
                    # the written rows via the lookup-join engine
                    # (value_reference.surql — stored, so un-written
                    # records keep their stale value like the reference)
                    frame_value_fn = (lambda a, n: (
                        lambda fdf: self._attach_lookup_col(fdf, a, n)
                    ))(vast, stmt.name)
                else:
                    value_fn = (lambda a: (
                        lambda col, inp=None: self._expr(
                            a, {"value": col, "this": col,
                                "input": inp if inp is not None else col})
                    ))(vast)
            td.fields = [f for f in td.fields if f.name != stmt.name]
            td.fields.append(FieldDef(stmt.name, dtype, default, assert_fn,
                                      value_fn=value_fn,
                                      frame_value_fn=frame_value_fn,
                                      kind=stmt.kind_text or stmt.dtype,
                                      default_ast=stmt.default,
                                      assert_ast=stmt.assert_,
                                      value_ast=stmt.value,
                                      flexible=bool(stmt.flexible),
                                      readonly=bool(
                                          stmt.texts.get("readonly"))))
            return None
        if isinstance(stmt, DefineAnalyzerStmt):
            from surrealdb_spark.pipeline.analyzer import define_analyzer

            if stmt.name in self.obj_info["analyzers"]:
                # redefinition needs OVERWRITE (define/analyzer.rs)
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The analyzer '{stmt.name}' already exists")
            poison = None
            if stmt.function is not None:
                fname = stmt.function if stmt.function.startswith("fn::") \
                    else f"fn::{stmt.function}"
                if fname not in self.functions and \
                        fname.removeprefix("fn::") not in self.functions:
                    # lazy validation: DEFINE succeeds, first USE errors
                    poison = fname
            define_analyzer(stmt.name, stmt.tokenizers, stmt.filters,
                            poison=poison,
                            function=getattr(stmt, "function", None))
            self.meta["analyzers"][stmt.name] = _render_analyzer(
                stmt.name, stmt.raw_tokenizers, stmt.filters, stmt.comment,
                function=getattr(stmt, "function", None))
            self.obj_info["analyzers"][stmt.name] = {
                "toks": stmt.raw_tokenizers, "filts": stmt.filters,
                "comment": stmt.comment}
            return None
        if isinstance(stmt, DefineIndexStmt):
            import re as _re5

            def _resolve_ixf(f: str) -> list[str]:
                # FIELDS type::field($x) / type::fields($xs) resolve to
                # the bound field names (fnc/type.rs projection macros)
                m = _re5.fullmatch(
                    r"type::(field|fields)\(\s*\$(\w+)\s*\)", f.strip())
                if not m:
                    return [f]
                v = params.get(m.group(2))
                return [str(x) for x in v] if isinstance(v, list) \
                    else [str(v)]

            # `…` is the flatten marker's unicode spelling (index.rs)
            stmt.fields = [f.replace("…", "...") for f in stmt.fields]
            stmt.fields = [r for f in stmt.fields for r in _resolve_ixf(f)]
            # computed fields have no stored value to index
            # (define/index.rs computed check)
            for f in stmt.fields:
                root = str(f).split(".", 1)[0].split("[", 1)[0]
                if root in self.computed_fields.get(stmt.table, {}):
                    raise ValueError(
                        f"Computed fields cannot be indexed. "
                        f"Index: '{stmt.name}' - Field: '{root}'")
            prev_ix = self.index_defs.get(stmt.name)
            if prev_ix is not None and prev_ix.table == stmt.table:
                # redefinition needs OVERWRITE; IF NOT EXISTS keeps the
                # existing (define/index.rs existence check)
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The index '{stmt.name}' already exists")
            td_s = self.db.tables.get(stmt.table)
            if td_s is not None and getattr(td_s, "schemafull", False):
                # schemafull tables index declared fields only
                # (define/index.rs field check)
                import re as _re7

                declared = {fd.name: (fd.kind or "") for fd in td_s.fields}
                for f in stmt.fields:
                    fn = _re7.sub(r"\[\s*\*?\d*\s*\]", ".*",
                                  str(f).replace("...", ""))
                    if fn in ("id", "in", "out") or fn in declared:
                        continue
                    segs = fn.split(".")
                    ok = False
                    for j in range(len(segs) - 1, 0, -1):
                        anc = ".".join(s for s in segs[:j] if s != "*")
                        k0 = declared.get(anc)
                        if k0 is None:
                            continue
                        kb = k0.strip().lower().removeprefix("option<")
                        if (kb.startswith(("object", "array", "{", "any"))
                                or kb == ""):
                            # object/array ancestors admit sub-paths;
                            # literal-object kinds must declare the member
                            if kb.startswith("{"):
                                from surrealdb_spark.sql.parser import \
                                    parse_kind

                                try:
                                    ka = parse_kind(k0)
                                except Exception:
                                    ok = True
                                    break
                                mem = dict(ka[1]) if ka[0] == "litobj" \
                                    else {}
                                ok = segs[j] if j < len(segs) else None
                                ok = ok in mem
                            else:
                                ok = True
                            break
                    if not ok:
                        raise ValueError(
                            f"The field '{f}' does not exist")
            if stmt.table not in self.db.tables:
                self.db.define_table(TableDef(stmt.table))
            td = self.db.tables[stmt.table]
            if stmt.kind == "uniq" and self.db._exists(stmt.table):
                # existing data must already be unique (define/index.rs:
                # a synchronous build fails; CONCURRENTLY records the
                # failure for INFO FOR INDEX instead)
                ent = self.db._uniq_entries(
                    self.db.table(stmt.table), list(stmt.fields),
                    extra=[td.id_col])
                if ent is not None:
                    keys = [c for c in ent.columns if c != td.id_col]
                    dup = (ent.groupBy(*keys)
                           .agg(F.count("*").alias("__n"),
                                F.min(td.id_col).alias("__rid"))
                           .filter(F.col("__n") > 1).limit(1).collect())
                    if dup:
                        from surrealdb_spark.pyeval import render as _rx

                        vals = [dup[0][k] for k in keys]
                        shown = (_rx(vals[0]) if len(vals) == 1
                                 else "[" + ", ".join(_rx(v) for v in vals)
                                 + "]")
                        msg = (f"Database index `{stmt.name}` already "
                               f"contains {shown}, with record "
                               f"`{dup[0]['__rid']}`")
                        if not stmt.concurrently:
                            raise ValueError(msg)
                        stmt.build_error = msg
            self.index_defs[stmt.name] = stmt
            try:
                stmt.initial_rows = (self.db.table(stmt.table).count()
                                     if self.db._exists(stmt.table) else 0)
            except Exception:
                stmt.initial_rows = 0
            if stmt.kind == "uniq":
                if stmt.build_error is None:
                    td.unique_indexes.append(list(stmt.fields))
                return None
            if stmt.kind in ("idx", "count"):
                # Catalyst's pushdown/pruning subsumes value/count indexes —
                # recorded for INFO parity, no artifact to build
                return None
            if not self.db._exists(stmt.table):
                return None  # built lazily on first use over an empty table
            df = self.db.table(stmt.table)
            if stmt.kind == "fulltext":
                from surrealdb_spark.operators.fulltext import FulltextIndex
                from surrealdb_spark.pipeline.analyzer import get_analyzer

                if stmt.fields and stmt.fields[0] not in df.columns:
                    # indexed column absent on every current row
                    # (schemaless) — artifact built lazily when it appears
                    return None
                an = get_analyzer(stmt.analyzer) if stmt.analyzer else None
                fcol = stmt.fields[0]
                dts = dict(df.dtypes).get(fcol, "")
                if dts.startswith("array"):
                    # FT over an array field indexes every element
                    # (ft/analyzer.rs analyzes Value::Array per element);
                    # \x1f separator is an analyzer split class
                    df = df.withColumn(
                        fcol, F.array_join(F.col(fcol).cast(
                            "array<string>"), "\x1f"))
                elif dts.startswith("struct"):
                    # FT over an object field indexes its string values
                    from pyspark.sql.types import (ArrayType, StringType,
                                                   StructType)

                    sdt = df.schema[fcol].dataType
                    parts = []
                    for fdef in sorted(sdt.fields, key=lambda x: x.name) \
                            if isinstance(sdt, StructType) else []:
                        c = F.col(fcol).getField(fdef.name)
                        if isinstance(fdef.dataType, ArrayType):
                            parts.append(c.cast("array<string>"))
                        elif isinstance(fdef.dataType, StringType):
                            parts.append(F.array(c))
                        else:
                            parts.append(F.array(c.cast("string")))
                    if parts:
                        df = df.withColumn(
                            fcol, F.array_join(
                                F.array_compact(F.concat(*parts)), "\x1f"))
                self.indexes[stmt.name] = FulltextIndex(
                    df, td.id_col, fcol, analyzer=an
                )
            elif stmt.kind == "hnsw":
                from surrealdb_spark.pipeline.similarity import (
                    srp_planes,
                    srp_sign,
                )

                vcol = stmt.fields[0]
                if vcol not in df.columns:
                    return None  # no vectors yet — built lazily
                # rows without a (full-dimension) vector are unindexable
                # (hnsw builds skip docs missing the field)
                df = df.filter(F.col(vcol).isNotNull())
                dim = stmt.dimension
                if dim is None:
                    first = df.select(F.size(vcol).alias("d")).first()
                    dim = int(first["d"]) if first else 0
                df = df.filter(F.size(vcol) == dim)
                if df.isEmpty():
                    return None
                self.indexes[stmt.name] = srp_sign(
                    df, srp_planes(16, dim), id_col=td.id_col, vec_col=vcol,
                )
            return None
        if isinstance(stmt, DefineFunctionStmt):
            # UDF-as-macro: the body is inlined at call sites
            # (define/function.rs — the reference stores the AST too).
            if stmt.name in self.functions:
                # redefinition needs OVERWRITE (define/function.rs)
                if stmt.fn_mode == "ine":
                    return None
                if stmt.fn_mode != "overwrite":
                    raise ValueError(
                        f"The function '{stmt.name}' already exists")
            self.functions[stmt.name] = stmt
            from surrealdb_spark.functions.registry import REGISTRY

            body, names = stmt.body, list(stmt.params)
            casts = [self._kind_to_spark(k) for k in stmt.ptypes]
            lets = list(stmt.lets)

            opt = [str(t or "").startswith("option")
                   or str(t or "") in ("any", "")
                   for t in stmt.ptypes]
            n_req = 0
            for i2, o in enumerate(opt):
                if not o:
                    n_req = i2 + 1

            def call(*cols):
                if not (n_req <= len(cols) <= len(names)):
                    # fnc/mod.rs argument-arity error text
                    short_n = stmt.name.removeprefix("fn::")
                    want = (f"{n_req} to {len(names)}"
                            if n_req != len(names) else str(len(names)))
                    raise ValueError(
                        f"Incorrect arguments for function fn::{short_n}()."
                        f" The function expects {want} arguments.")
                if len(cols) < len(names):
                    # omitted trailing option<>/any params bind NONE
                    cols = list(cols) + [F.lit(None)] * (
                        len(names) - len(cols))
                from surrealdb_spark.sql.compiler import _type_cat

                binds = {}
                for nm, c, cast in zip(names, cols, casts):
                    c = c if isinstance(c, Column) else F.lit(c)
                    binds[nm] = c.cast(cast) if cast else c
                    if cast:
                        cat = _type_cat(str(cast))
                        if cat:
                            # declared-type hint for operator dispatch
                            binds[f"__type:{nm}"] = cat
                # LET bindings evaluate top-to-bottom, each seeing the prior
                for ln, last in lets:
                    binds[ln] = self._expr(last, binds)
                return self._expr(body, binds)

            key = stmt.name if stmt.name.startswith("fn::") \
                else f"fn::{stmt.name}"
            from surrealdb_spark import pyeval as _pye2

            if stmt.script_src is not None:
                # statement-shaped body: run through the script engine
                # per call (IF/FOR/THROW/DML bodies — doc parity with
                # define/function.rs full-statement bodies)
                src_txt, fn_names, fn_nreq = stmt.script_src, names, n_req

                def script_call(args, _src=src_txt, _names=fn_names,
                                _nreq=fn_nreq, _key=key):
                    if not (_nreq <= len(args) <= len(_names)):
                        short_n = _key.removeprefix("fn::")
                        want = (f"{_nreq} to {len(_names)}"
                                if _nreq != len(_names)
                                else str(len(_names)))
                        raise _pye2.EvalError(
                            f"Incorrect arguments for function "
                            f"fn::{short_n}(). The function expects "
                            f"{want} arguments.")
                    from surrealdb_spark.script import (
                        ScriptError, _Break, _Continue)

                    binds = {nm: (args[i3] if i3 < len(args) else None)
                             for i3, nm in enumerate(_names)}
                    try:
                        return self._event_script().run(
                            _src, **binds).value
                    except ScriptError as exc:
                        raise _pye2.EvalError(
                            f"An error occurred: "
                            f"{_pye2.render(exc.value)}") from None
                    except (_Break, _Continue, _pye2.BreakSignal,
                            _pye2.ContinueSignal):
                        # functions are control-flow boundaries: a BREAK/
                        # CONTINUE inside the body cannot cross the call
                        # (exec/mod.rs:150-155 ControlFlow check)
                        raise _pye2.EvalError(
                            "Invalid control flow statement, break or "
                            "continue statement found outside of loop."
                        ) from None

                _pye2.SCRIPT_FNS[key] = script_call
                REGISTRY.pop(key, None)
                _pye2.USER_FNS.pop(key, None)
                return None
            _pye2.SCRIPT_FNS.pop(key, None)
            REGISTRY[key] = call
            # driver-value twin: pyeval runs the body with python args so
            # writable subqueries inside the body execute for real
            _pye2.USER_FNS[key] = (list(names), list(lets), body, n_req)
            return None
        if isinstance(stmt, NoopStmt):
            return None
        if isinstance(stmt, SleepStmt):
            import time as _time

            _time.sleep(stmt.seconds)
            return None
        if isinstance(stmt, TxStmt):
            if stmt.word == "BEGIN":
                self._tx_open = True
                self._tx_failed = None
                self._tx_backup = self._snapshot_root()
                # catalog params roll back with the data (DEFINE PARAM
                # inside a cancelled tx is undone — param/cancel_commit)
                self._tx_params = dict(self.params_defined)
            else:
                if not getattr(self, "_tx_open", False):
                    raise ValueError(
                        f"Invalid statement: Cannot {stmt.word} without "
                        "starting a transaction")
                self._tx_open = False
                if stmt.word == "CANCEL":
                    self._restore_root(self._tx_backup)
                    self.params_defined = dict(
                        getattr(self, "_tx_params", self.params_defined))
                    return None
                if getattr(self, "_tx_failed", None):
                    self._restore_root(self._tx_backup)
                    self.params_defined = dict(
                        getattr(self, "_tx_params", self.params_defined))
                    raise ValueError(
                        "Cannot COMMIT: the transaction was aborted due "
                        "to a prior error")
                self._drop_backup(self._tx_backup)
            return None
        if isinstance(stmt, DefineMiscStmt):
            return self._define_misc(stmt, params)
        if isinstance(stmt, DefineDbStmt):
            from surrealdb_spark.functions.extra_fns import SessionContext

            word = "NAMESPACE" if stmt.kind == "ns" else "DATABASE"
            reg = (self.namespaces if stmt.kind == "ns"
                   else self.databases.setdefault(
                       SessionContext.get("ns") or "", {}))
            if stmt.name in reg:
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The {word.lower()} '{stmt.name}' already exists")
            comment = stmt.comment
            if isinstance(comment, tuple) and comment[0] == "param":
                comment = params.get(comment[1])
            txt = f"DEFINE {word} {stmt.name}"
            if comment is not None:
                txt += f" COMMENT {_surql_literal(comment)}"
            reg[stmt.name] = {"strict": stmt.strict, "text": txt}
            return None
        if isinstance(stmt, UseStmt):
            from surrealdb_spark.functions.extra_fns import SessionContext

            if stmt.ns is not None:
                SessionContext.configure(ns=stmt.ns)
            if stmt.db is not None:
                SessionContext.configure(db=stmt.db)
                self.strict = (self.databases
                               .get(SessionContext.get("ns") or "", {})
                               .get(stmt.db, {}).get("strict", False))
            # USE returns the resulting session scope (statements/use.rs)
            return {"database": SessionContext.get("db"),
                    "namespace": SessionContext.get("ns")}
        if isinstance(stmt, DefineBucketStmt):
            import tempfile

            from surrealdb_spark.pipeline.filebucket import define_bucket

            define_bucket(stmt.name,
                          tempfile.mkdtemp(prefix=f"bucket_{stmt.name}_"),
                          readonly=bool(getattr(stmt, "readonly", False)),
                          backend=getattr(stmt, "backend", None))
            self.meta["buckets"][stmt.name] = _render_bucket(
                stmt.name, stmt.backend, stmt.readonly, stmt.comment,
                stmt.perms)
            self.obj_info["buckets"][stmt.name] = {
                "backend": stmt.backend, "readonly": stmt.readonly,
                "comment": stmt.comment, "perms": stmt.perms}
            return None
        if isinstance(stmt, DefineEventStmt):
            if stmt.name in self.events \
                    and self.events[stmt.name][0] == stmt.table:
                # redefinition needs OVERWRITE (define/event.rs); the
                # old hook unhooks so the event doesn't double-fire
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The event '{stmt.name}' already exists")
                old_t, old_h = self.events[stmt.name]
                td_o = self.db.tables.get(old_t)
                if td_o is not None and old_h in td_o.events:
                    td_o.events.remove(old_h)
            if stmt.table not in self.db.tables:
                self.db.define_table(TableDef(stmt.table))
            # doc/event.rs: fires per affected record with real before/
            # after images; THEN bodies execute via the script engine so
            # IF/FOR/THROW work.  Driver-side per-row execution — events
            # are an OLTP feature for modest mutation batches, not the
            # 100 TB analytics hot path; bulk CREATE keeps a distributed
            # fast path (_event_fast_path).
            td = self.db.tables[stmt.table]
            when_ast, then_stmts = stmt.when, list(stmt.then)
            ev_name = stmt.name

            def hook(action, df, before=None):
                self._fire_event(ev_name, action, df, before,
                                 when_ast, then_stmts)

            td.events.append(hook)
            self.events[stmt.name] = (stmt.table, hook)
            self.event_defs[stmt.name] = (stmt.table, when_ast, then_stmts)
            from surrealdb_spark.sql.explain import to_sql as _tsql

            when_txt = None
            if stmt.when is not None:
                try:
                    when_txt = _tsql(stmt.when)
                except Exception:
                    when_txt = _canon_stmt_text(stmt.when_text or "")
            if stmt.then_src is not None:
                then_txt = _canon_stmt_text(stmt.then_src)
            else:
                then_txt = "; ".join(stmt.then)
                if then_txt.startswith('"') and then_txt.endswith('"'):
                    then_txt = _surql_literal(then_txt[1:-1])
            est = {"is_async": stmt.is_async, "retry": stmt.retry,
                   "maxdepth": stmt.maxdepth, "when_txt": when_txt,
                   "then_txt": then_txt, "comment": stmt.comment}
            self.obj_info.setdefault("event_struct", {})[
                (stmt.table, stmt.name)] = est
            self.table_meta.setdefault(stmt.table, {}).setdefault(
                "events", {})[stmt.name] = _render_event(
                stmt.name, stmt.table, est["is_async"], est["retry"],
                est["maxdepth"], when_txt, then_txt, stmt.comment)
            return None
        if isinstance(stmt, DefineParamStmt):
            if stmt.name in self.obj_info["params"]:
                # redefinition needs OVERWRITE (define/param.rs)
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The param '${stmt.name}' already exists")
            try:
                v = self.spark.range(1).select(
                    self._expr(stmt.value, {}).alias("v")
                ).first()["v"]
            except Exception:
                # heterogeneous literal arrays don't unify as one Spark
                # array type — the kinded driver evaluator keeps each
                # element's kind (values.py; type_order dataset)
                from surrealdb_spark import pyeval as _pp

                v = _pp.peval(stmt.value, dict(self.params_defined))
            self.params_defined[stmt.name] = v
            self.meta["params"][stmt.name] = _render_param(
                stmt.name, v, stmt.comment, stmt.perms)
            self.obj_info["params"][stmt.name] = {
                "value": v, "comment": stmt.comment, "perms": stmt.perms}
            return None
        if isinstance(stmt, DefineSequenceStmt):
            from surrealdb_spark.export import define_sequence

            if stmt.name in self.sequences:
                # redefinition needs OVERWRITE (define/sequence.rs)
                if stmt.mode == "ine":
                    return None
                if stmt.mode != "overwrite":
                    raise ValueError(
                        f"The sequence '{stmt.name}' already exists")
            self.sequences[stmt.name] = define_sequence(stmt.name, start=stmt.start)
            txt = f"DEFINE SEQUENCE {stmt.name} BATCH {stmt.batch} START {stmt.start}"
            if stmt.timeout:
                to = stmt.timeout
                if isinstance(to, tuple) and to[0] == "param":
                    from surrealdb_spark import pyeval as _pe

                    v = params.get(to[1])
                    if hasattr(v, "asDict"):
                        v = v.asDict()
                    to = _pe._render_duration(v) if isinstance(v, dict) \
                        else str(v)
                txt += f" TIMEOUT {to}"
            self.meta["sequences"][stmt.name] = txt
            self.obj_info["sequences"][stmt.name] = {
                "batch": stmt.batch, "start": stmt.start,
                "timeout": stmt.timeout}
            return None
        if isinstance(stmt, RemoveStmt):
            try:
                self._remove(stmt, params)
            except (KeyError, ValueError):
                if not stmt.if_exists:
                    raise
            return None
        if isinstance(stmt, AlterDetailStmt):
            return self._alter_detail(stmt, params)
        if isinstance(stmt, AlterObjStmt):
            cat = {"analyzer": "analyzers", "param": "params",
                   "bucket": "buckets", "sequence": "sequences"}[stmt.kind]
            info = self.obj_info[cat].get(stmt.name)
            if info is None:
                if stmt.if_exists:
                    return None
                raise KeyError(f"the {stmt.kind} '{stmt.name}' does not exist")
            for d in stmt.drops:
                if d == "COMMENT":
                    info["comment"] = None
                elif d == "TOKENIZERS":
                    info["toks"] = None
                elif d == "FILTERS":
                    info["filts"] = None
                elif d == "READONLY":
                    info["readonly"] = False
            for k, v in stmt.sets.items():
                if k == "COMMENT":
                    info["comment"] = v
                elif k == "VALUE":
                    val = self.spark.range(1).select(
                        self._expr(v, params).alias("v")).first()["v"]
                    info["value"] = val
                    self.params_defined[stmt.name] = val
                elif k == "PERMISSIONS":
                    info["perms"] = v
                elif k == "TOKENIZERS":
                    info["toks"] = v
                elif k == "FILTERS":
                    info["filts"] = v
                elif k == "BACKEND":
                    info["backend"] = v
                elif k == "READONLY":
                    info["readonly"] = True
                elif k == "BATCH":
                    info["batch"] = v
                elif k == "START":
                    info["start"] = v
                elif k == "TIMEOUT":
                    info["timeout"] = v
            if cat == "analyzers":
                from surrealdb_spark.pipeline.analyzer import define_analyzer

                define_analyzer(stmt.name,
                                info["toks"] or ["blank", "punct"],
                                info["filts"] or ["lowercase"])
                self.meta[cat][stmt.name] = _render_analyzer(
                    stmt.name, info["toks"], info["filts"], info["comment"])
            elif cat == "params":
                self.meta[cat][stmt.name] = _render_param(
                    stmt.name, info["value"], info["comment"], info["perms"])
            elif cat == "buckets":
                self.meta[cat][stmt.name] = _render_bucket(
                    stmt.name, info["backend"], info["readonly"],
                    info["comment"], info["perms"])
            else:
                txt = (f"DEFINE SEQUENCE {stmt.name} BATCH {info['batch']} "
                       f"START {info['start']}")
                if info.get("timeout"):
                    txt += f" TIMEOUT {info['timeout']}"
                self.meta[cat][stmt.name] = txt
            return None
        if isinstance(stmt, AlterTableStmt):
            if stmt.compact and "mem" in getattr(self, "backend", ()):
                raise ValueError("The storage layer does not support "
                                 "compaction requests.")
            if stmt.name not in self.db.tables:
                if stmt.if_exists:
                    return None
                raise KeyError(f"the table '{stmt.name}' does not exist")
            td = self.db.tables[stmt.name]
            info_t = self.obj_info["tables"].setdefault(
                stmt.name, {"type": "ANY", "schemafull": False, "perms": {
                    v: "NONE" for v in ("select", "create", "update",
                                        "delete")}})
            if stmt.schemafull is not None:
                td.schemafull = stmt.schemafull  # recorded for INFO parity
                info_t["schemafull"] = stmt.schemafull
            if stmt.ttype is not None:
                info_t["type"] = stmt.ttype
            if stmt.comment is not None:
                info_t["comment"] = stmt.comment
            if stmt.changefeed is not None:
                info_t["changefeed"] = stmt.changefeed
            for d in stmt.drops:
                if d == "COMMENT":
                    info_t["comment"] = None
                elif d == "CHANGEFEED":
                    info_t["changefeed"] = None
            for v, lvl in stmt.perm_updates.items():
                info_t.setdefault("perms", {})[v] = lvl
            self.meta["tables"][stmt.name] = _render_table(stmt.name, info_t)
            if stmt.select_perm == "none":
                self.catalog.set_permission(stmt.name, False)
            elif stmt.select_perm == "full":
                self.catalog.set_permission(stmt.name, None)
            elif stmt.select_perm is not None:
                ast = stmt.select_perm
                self.catalog.set_permission(
                    stmt.name, lambda sess, _a=ast: self._expr(_a, dict(sess))
                )
            return None
        if isinstance(stmt, RebuildIndexStmt):
            d = self.index_defs.get(stmt.name)
            if d is None:
                if stmt.if_exists:
                    return None
                raise KeyError(f"no such index {stmt.name}")
            if d.kind not in ("uniq", "idx", "count"):
                # rebuild re-runs the stored definition; the existence
                # check must not fire (rebuild.rs re-runs the build, never
                # the duplicate check) — execute with overwrite semantics
                _saved_mode = getattr(d, "mode", None)
                try:
                    d.mode = "overwrite"
                    self._execute(d, {})  # rebuild the stored artifact
                finally:
                    d.mode = _saved_mode
            try:
                d.initial_rows = (self.db.table(d.table).count()
                                  if self.db._exists(d.table) else 0)
            except Exception:
                d.initial_rows = 0
            return None
        if isinstance(stmt, InfoStmt):
            return self._info(stmt)
        if isinstance(stmt, LiveStmt):
            # LIVE SELECT → start a Structured Streaming query over the
            # table's changefeed; returns the live-query id (live.rs returns
            # a uuid the client later KILLs).
            import uuid as _uuid

            from surrealdb_spark.streaming.changefeed import (
                live_select,
                live_select_diff,
                start_live,
            )

            root = f"{self.db.root}/{stmt.table}"
            uid = str(_uuid.uuid4())
            qname = "live_" + uid.replace("-", "")
            if stmt.diff:
                stream = live_select_diff(self.spark, root)
            else:
                ddl = None
                if self.db._exists(stmt.table):
                    sch = self.db.table(stmt.table).schema
                    ddl = ", ".join(
                        f"`{f.name}` {f.dataType.simpleString()}" for f in sch
                    )
                where = None if stmt.where is None else self._expr(stmt.where, {})
                stream = live_select(self.spark, root, where, stmt.fields, ddl)
            self.live_queries[uid] = start_live(stream, qname)
            return self.spark.createDataFrame([(uid,)], "id string")
        if isinstance(stmt, ShowChangesStmt):
            from surrealdb_spark.streaming.changefeed import show_changes

            return show_changes(
                self.spark, f"{self.db.root}/{stmt.table}", stmt.since, stmt.limit
            )
        if isinstance(stmt, KillStmt):
            uid = self.spark.range(1).select(
                self._expr(stmt.id, params).alias("v")
            ).first()["v"]
            q = self.live_queries.pop(uid)  # KeyError on unknown id (kill.rs)
            q.stop()
            return None
        if isinstance(stmt, CreateStmt):
            if stmt.target.table not in self.db.tables:
                # schemaless-by-default: first write defines the table
                self.db.define_table(TableDef(stmt.target.table))
            n = stmt.target.mock or 1
            dicts = [dict(self._data_obj(stmt.data, params))
                     for _ in range(n)]
            ti_c = self.obj_info["tables"].get(stmt.target.table, {})
            if ti_c.get("type") == "RELATION" and any(
                    "in" not in d or "out" not in d for d in dicts):
                # relation tables take edges only (doc/relate.rs; CREATE
                # without in/out is rejected — table/relation.surql)
                raise ValueError(
                    f"Found record: `{stmt.target.table}` which is a "
                    "relation, but found a record without in and out "
                    "fields")
            if stmt.target.mock_keys is not None:
                for d, k in zip(dicts, stmt.target.mock_keys):
                    d["id"] = f"{stmt.target.table}:{k}"
            if dicts and self._tbl_has_events(stmt.target.table):
                # $input = the raw data object (doc/alter.rs) — all rows
                # of one CREATE share the data clause
                self._evt_input = dict(dicts[0])
            rows = self._literal_rows(dicts, stmt.target, params)
            out = self.db.create(stmt.target.table, rows)
            if stmt.target.table in self.computed_fields:
                out = self._with_computed(stmt.target.table, out)
            if isinstance(stmt.return_, tuple):
                return self._ret_expr_static(None, out, stmt.return_, params)
            return self._ret_created(out, stmt.return_)
        if isinstance(stmt, InsertStmt):
            if stmt.table is None:
                # table-less INSERT: each row routes to its id's table, in
                # first-appearance order (insert.rs Value::None what)
                dicts = [self._obj(r, params) for r in stmt.rows]
                # consecutive same-table runs keep the reference's
                # per-row input order even when ids interleave tables
                runs: list[tuple[str, list]] = []
                for d in dicts:
                    rid = str(d.get("id", ""))
                    if ":" not in rid:
                        raise ValueError(
                            "INSERT without a table needs record ids")
                    tb = rid.split(":", 1)[0]
                    if runs and runs[-1][0] == tb:
                        runs[-1][1].append(d)
                    else:
                        runs.append((tb, [d]))
                outs = []
                for tb, rows in runs:
                    if tb not in self.db.tables:
                        self.db.define_table(TableDef(tb))
                    df2 = self._literal_rows(rows, Target(tb), params)
                    outs.append(self.db.insert(tb, df2))
                out = outs[0]
                for o in outs[1:]:
                    out = out.unionByName(o, allowMissingColumns=True)
                return self._ret(out, out, stmt.return_)
            if stmt.select is not None:
                from surrealdb_spark.sql.compiler import compile_select

                self._refresh_catalog()
                df = compile_select(self.spark, stmt.select,
                                    catalog=self.catalog, params=params)
            else:
                df = self._literal_rows(
                    [self._obj(r, params) for r in stmt.rows],
                    Target(stmt.table), params,
                )
            dup = None
            if stmt.on_duplicate:
                dup = {f_: self._assign_col(f_, op, ast, df, params)
                       for f_, op, ast in stmt.on_duplicate}
            if stmt.table not in self.db.tables:
                # schemaless-by-default: first write defines the table
                self.db.define_table(TableDef(stmt.table))
            if stmt.ignore:
                # INSERT IGNORE: rows whose id or unique-index entries
                # clash with stored data are silently skipped — IGNORE
                # wins over ON DUPLICATE KEY UPDATE (insert.rs ignore)
                df = self._insert_ignore_filter(stmt.table, df)
                out = self.db.insert(stmt.table, df)
                return self._ret(out, out, stmt.return_)
            out = self.db.insert(stmt.table, df, on_duplicate=dup)
            return self._ret(out, out, stmt.return_)
        if isinstance(stmt, UpdateStmt):
            if stmt.extra_targets:
                # multi-target UPDATE/UPSERT: each target runs in turn,
                # results concatenate in target order (update.rs Values
                # what — statements/return/object_recordid_fetch_
                # destructuring.surql)
                import dataclasses as _dc0

                outs = []
                for tg in [stmt.target] + list(stmt.extra_targets):
                    sub = _dc0.replace(stmt, target=tg, extra_targets=[])
                    outs.append(self._execute_inner(sub, params))
                out = outs[0]
                for o in outs[1:]:
                    out = out.unionByName(o, allowMissingColumns=True)
                return out
            tbl = stmt.target.table
            if getattr(stmt, "explain", None):
                # UPDATE/UPSERT ... EXPLAIN: plan rows only, no mutation
                # (explain is always read-only; update/explain.surql)
                if stmt.target.key is not None:
                    rid = f"{tbl}:" + str(
                        self._key_text(stmt.target, params))
                    # UPSERT defers the record fetch (create-if-absent);
                    # UPDATE iterates it (dbs/iterators.rs Defer/Record)
                    op = "Iterate Defer" if stmt.upsert \
                        else "Iterate Record"
                    return [{"detail": {"record": rid}, "operation": op},
                            {"detail": {"type": "Memory"},
                             "operation": "Collector"}]
                if stmt.upsert and stmt.where is None:
                    # table-wide UPSERT yields the table (Iterable::Yield)
                    return [{"detail": {"table": tbl},
                             "operation": "Iterate Yield"},
                            {"detail": {"type": "Memory"},
                             "operation": "Collector"}]
                from surrealdb_spark.sql.explain import plan_legacy
                from surrealdb_spark.sql.parser import Select as _Sel

                sel = _Sel(fields=None, value_expr=None, sources=[tbl],
                           where=stmt.where, explain=stmt.explain)
                self._refresh_catalog()
                return plan_legacy(self, sel, params or {})
            if tbl not in self.db.tables:
                # undefined table: UPSERT creates it; UPDATE is a no-op
                # over the implicit empty table (update.rs)
                self.db.define_table(TableDef(tbl))
            where = self._where(stmt.target, stmt.where, tbl, params)
            self._stash_event_input(tbl, stmt.data, params)
            if stmt.upsert:
                # create-if-absent applies to the KEY (or, unkeyed, to a
                # WHERE with no matches); an existing record that fails the
                # WHERE filter yields no rows and no create (upsert.rs)
                key_where = self._where(stmt.target, None, tbl, params)
                key_absent = (stmt.target.key is not None
                              and not self._matches(tbl, key_where))
                table_miss = (stmt.target.key is None and stmt.where
                              is not None and not self._matches(tbl, where))
                if key_absent or table_miss:
                    rows = self._literal_rows(
                        [self._data_obj(stmt.data, params)], stmt.target,
                        params)
                    out = self.db.upsert(tbl, rows)
                    return self._ret(out, out, stmt.return_)
            if stmt.target.key is not None and stmt.data \
                    and stmt.data[0] == "set":
                for f_, op_, ast_ in stmt.data[1]:
                    if f_ == "id" and op_ == "=":
                        # the id of an addressed record can't change
                        # (doc/field.rs id immutability)
                        from surrealdb_spark.pyeval import render as _rnd

                        v_ = self._scalar(ast_, params)
                        raise ValueError(
                            f"Found {_rnd(v_)} for the `id` field, but "
                            "a specific record has been specified")
            dp = self._doc_point_update(stmt, tbl, params)
            if dp is not None:
                return dp
            kp = self._kinded_point_update(stmt, tbl, params)
            if kp is not None:
                return kp
            set_exprs = self._set_exprs(stmt.data, tbl, params)
            ret = stmt.return_
            if isinstance(ret, tuple):
                cap: dict = {}
                self.db.update(tbl, set_exprs, where, "NONE", capture=cap)
                return self._ret_expr_static(cap["before"], cap["after"],
                                             ret, params)
            out = self.db.update(tbl, set_exprs, where, ret)
            if self.computed_fields.get(tbl):
                # statement output shows computed columns too
                # (value_reference_with_computed.surql UPDATE output)
                out = self._with_computed(tbl, out)
            return out
        if isinstance(stmt, DeleteStmt):
            tbl = stmt.target.table
            if stmt.explain:
                # DELETE ... EXPLAIN — plan rows only, nothing deleted
                # (explain is always read-only)
                from surrealdb_spark.sql.parser import Select as _Sel

                sel = _Sel(fields=None, value_expr=None,
                           sources=[tbl], where=stmt.where,
                           explain=stmt.explain)
                # DELETE keeps the LEGACY plan rows even under the new
                # executor (delete_select_std_index_contains_inside_
                # new_executor.surql) — only SELECT was migrated to the
                # tree format
                from surrealdb_spark.sql.explain import plan_legacy

                self._refresh_catalog()
                return plan_legacy(self, sel, params or {})
            if tbl not in self.db.tables:
                self.db.define_table(TableDef(tbl))  # no-op empty table
            where = self._where(stmt.target, stmt.where, tbl, params)
            self._apply_on_delete(tbl, where)
            ret = stmt.return_
            cap: dict = {}
            if isinstance(ret, tuple):
                self.db.delete(tbl, where, "NONE", capture=cap)
                out = self._ret_expr_static(cap["before"], None, ret, params)
            else:
                out = self.db.delete(tbl, where, ret, capture=cap)
            self._purge_edges(tbl, cap.get("before"))
            return out
        if isinstance(stmt, RelateStmt):
            frm = self._scalar(stmt.from_expr, params)
            to = self._scalar(stmt.to_expr, params)

            def _norm_ep(v):
                # record objects (and single-element statement results)
                # collapse to their ids — edges store POINTERS
                # (doc/relate.rs)
                if isinstance(v, dict):
                    return v.get("id")
                if isinstance(v, list):
                    ids = [x.get("id") if isinstance(x, dict) else x
                           for x in v]
                    return ids[0] if len(ids) == 1 else ids
                return v

            frm, to = _norm_ep(frm), _norm_ep(to)
            import re as _rr

            for prop, ep in (("in", frm), ("out", to)):
                # endpoints must be records (expr/statements/relate.rs)
                for r in (ep if isinstance(ep, list) else [ep]):
                    rid = r.get("id") if isinstance(r, dict) else r
                    if not (isinstance(rid, str) and _rr.fullmatch(
                            r"[A-Za-z_][A-Za-z0-9_]*:.+", rid, _rr.S)):
                        from surrealdb_spark.pyeval import render as _rnd

                        raise ValueError(
                            "Cannot execute RELATE statement where "
                            f"property '{prop}' is: {_rnd(rid)}")
            edge_tb, edge_key = stmt.edge, stmt.edge_key
            if isinstance(edge_tb, tuple):
                # RELATE a->$kind->b / a->(expr)->b: the computed value is
                # a table name or a full edge record id (relate.rs kind)
                if edge_tb[0] == "param":
                    v = params.get(edge_tb[1])
                    if v is None:
                        raise KeyError(
                            f"unbound edge parameter ${edge_tb[1]}")
                else:
                    v = self._scalar(edge_tb[1], params)
                v = str(v.get("id") if isinstance(v, dict) else v)
                if ":" in v:
                    edge_tb, _, k = v.partition(":")
                    edge_key = int(k) if k.lstrip("-").isdigit() else k
                else:
                    edge_tb = v
            ti = self.obj_info["tables"].get(edge_tb, {})
            if ti.get("enforced"):
                # TYPE RELATION ENFORCED: both endpoints must exist
                # (catalog/table.rs:151-156; doc/relate.rs)
                for ep in (frm, to):
                    for r in (ep if isinstance(ep, list) else [ep]):
                        rid = str(r.get("id") if isinstance(r, dict) else r)
                        tb0 = rid.partition(":")[0]
                        if not self._matches(
                                tb0, F.col("id") == rid):
                            raise ValueError(
                                f"The record '{rid}' does not exist")
            extra = self._data_obj(stmt.data, params) if stmt.data else {}
            row = {"in": frm, "out": to, **extra}
            if edge_key is not None:
                row["id"] = f"{edge_tb}:" + str(
                    self._key_text(Target(edge_tb, edge_key), params))
            if self.db.tables.get(edge_tb) is None:
                self.db.define_table(TableDef(edge_tb, is_edge=True))
            # _literal_rows normalizes the id (CONTENT {id: 1} →
            # likes:1) and encodes kinded cells like CREATE does
            edges = self._literal_rows([row], Target(edge_tb), params)
            if ti.get("rel_in") or ti.get("rel_out"):
                # TYPE RELATION IN/OUT endpoint-table constraint — the
                # error carries the edge's generated id (doc/relate.rs)
                eid = row.get("id")
                if eid is None:
                    r0 = edges.select("id").first()
                    eid = r0["id"] if r0 else edge_tb
                for prop, ep, allowed in (("in", frm, ti.get("rel_in")),
                                          ("out", to, ti.get("rel_out"))):
                    if not allowed:
                        continue
                    for r in (ep if isinstance(ep, list) else [ep]):
                        rid = str(r.get("id") if isinstance(r, dict)
                                  else r)
                        if rid.partition(":")[0] not in allowed:
                            raise ValueError(
                                f"Couldn't coerce value for field "
                                f"`{prop}` of `{eid}`: Expected "
                                f"`record<{'|'.join(allowed)}>` but "
                                f"found `{rid}`")
            out = self.db.relate(edge_tb, edges)
            if isinstance(stmt.return_, tuple):
                return self._ret_expr_static(None, out, stmt.return_, params)
            return self._ret_created(out, stmt.return_)
        raise ValueError(f"unhandled statement {stmt!r}")

    # helpers --------------------------------------------------------------

    @staticmethod
    def _kind_to_spark(kind: str | None) -> str | None:
        """Declared param kind → Spark cast target (None = leave as-is).

        `option<T>` unwraps to T (NULL passes any cast); compound kinds
        (array<...>, record<...>) are left uncast — inlining preserves them.
        """
        if kind is None:
            return None
        k = kind.strip().lower()
        if k.startswith("option<") and k.endswith(">"):
            k = k[7:-1].strip()
        return {"int": "bigint", "float": "double", "number": "double",
                "string": "string", "bool": "boolean",
                "decimal": "decimal(38,10)", "datetime": "timestamp"}.get(k)

    def _expr(self, ast, params: dict) -> Column:
        from surrealdb_spark.sql.compiler import compile_expr

        return compile_expr(ast, params)

    def _scalar(self, ast, params: dict):
        """Evaluate a driver-side literal expression (record ids, constants)."""
        if _has_wsub(ast):
            # writable subqueries (and paths/calls over them) must run
            # exactly once, driver-side (doc/create.rs compute-once)
            from surrealdb_spark import pyeval as _pyw

            return _pyw.peval(ast, dict(params))
        if ast[0] == "lit":
            return ast[1]
        if ast[0] == "param":
            return params[ast[1]]
        if ast[0] == "array":
            # element-wise: Spark's array() coerces mixed element types
            # (['London', d'...'] must stay string+datetime)
            return [self._scalar(e, params) for e in ast[1]]
        if ast[0] == "object":
            from surrealdb_spark.sql.compiler import _geom_literal_kind

            if _geom_literal_kind(ast) is None:
                # member-wise (heterogeneous values keep their own types);
                # geometry literals fall through to the compile path which
                # builds the tagged geometry struct
                return {k: self._scalar(v, params) for k, v in ast[1]}
        row = self.spark.range(1).select(self._expr(ast, params).alias("v")).first()
        return row["v"]

    def _obj(self, ast, params: dict) -> dict:
        if ast[0] != "object":
            raise ValueError("expected an object literal")
        return {k: self._scalar(v, params) for k, v in ast[1]}

    def _data_obj(self, data, params: dict) -> dict:
        """SET/CONTENT payload → row dict.  NONE-valued fields are DROPPED
        (objects have no entry for NONE, types/src/value/mod.rs); explicit
        NULL stays — the distinction comes from the AST (`("nulllit",)`)
        since both evaluate to Python None."""
        from surrealdb_spark.sql.compiler import _static_of_kind

        # kinds the stored Spark dtype can't represent get a per-row
        # sidecar stamp (values.py kinded columns): sets store as arrays,
        # regex/table as strings, geometries as generic structs/maps
        _STAMP = {"set", "regex", "table"}

        def _stampable(sk):
            return sk in _STAMP or (sk or "").startswith("geometry")

        if data is None:
            return {}
        kind, payload = data

        def _none_this(a):
            # data-clause expressions compute with the NEW document's
            # cursor ($this = the being-created doc = NONE at input time,
            # doc/alter.rs) — an unbound $this/$self/$parent is NONE,
            # not the enclosing row
            if isinstance(a, tuple):
                if a[0] == "param" and a[1] in ("this", "self", "parent") \
                        and ("this" if a[1] == "self" else a[1]) \
                        not in params:
                    return ("lit", None)
                return tuple(_none_this(x) for x in a)
            if isinstance(a, list):
                return [_none_this(x) for x in a]
            return a

        payload = _none_this(payload)
        if kind == "content":
            out = self._obj(payload, params)
            if isinstance(payload, tuple) and payload[0] == "object":
                null_keys = {k for k, vast in payload[1]
                             if vast == ("nulllit",)}
                out = {k: v for k, v in out.items()
                       if v is not None or k in null_keys}
                for k, vast in payload[1]:
                    sk = _static_of_kind(vast, params, None)
                    if _stampable(sk) and k in out:
                        out["__k_" + k] = sk
            return out
        if kind == "set":
            out = {}
            for f_, op, ast in payload:
                try:
                    v = self._scalar(ast, params)
                except Exception:
                    # field references in creation data read the
                    # being-created document — absent fields are NONE
                    # (doc/create.rs stage order: `SET count = IF count
                    # THEN count + 1 ELSE 1 END` on a new record)
                    from surrealdb_spark import pyeval as _pyc

                    v = _pyc.peval(ast, {**params, "this": dict(out)})
                if isinstance(f_, str):
                    sk = _static_of_kind(ast, params, None)
                    if _stampable(sk) and v is not None:
                        out["__k_" + f_] = sk
                if isinstance(f_, tuple) and f_[0] == "fpath":
                    # nested path target: build the nested object
                    base, segs = f_[1], self._fpath_segs(f_[2], params)
                    node = out.setdefault(base, {})
                    for s in segs[:-1]:
                        node = node.setdefault(s, {})
                    node[segs[-1]] = v
                    continue
                if v is None and ast != ("nulllit",) and op == "=":
                    out.pop(f_, None)  # SET x = NONE on create → absent
                    out.pop("__k_" + f_, None)
                    continue
                if op in ("+=", "-=", "+?="):
                    # compound ops against an absent record start from the
                    # NONE base: numbers from zero, objects/values wrap to
                    # a one-element array (val/value/increment.rs;
                    # extend.rs for `+?=`)
                    from surrealdb_spark import pyeval as _pe

                    v = (_pe.increment(out.get(f_), v) if op == "+="
                         else _pe.extend(out.get(f_), v) if op == "+?="
                         else _pe.decrement(out.get(f_), v))
                out[f_] = v
            return out
        raise ValueError(f"{kind.upper()} not valid here")

    def _doc_point_update(self, stmt, tbl: str, params: dict):
        """Single-record MERGE/CONTENT carrying nested objects — decode
        the ONE row driver-side, deep-merge with reference semantics
        (doc/merge.rs: objects merge recursively, NONE removes the key),
        write back as a whole-row replace so the column can change type
        (string 'alive' → object).  O(1) rows by construction.  Returns
        None when the shape doesn't apply."""
        from surrealdb_spark.values import strip_absent

        if (stmt.target.key is None or stmt.where is not None
                or not stmt.data or stmt.data[0] not in ("merge", "content")
                or not self.db._exists(tbl)):
            return None
        obj = self._obj(stmt.data[1], params)
        null_keys = set()
        if isinstance(stmt.data[1], tuple) and stmt.data[1][0] == "object":
            null_keys = {k for k, vast in stmt.data[1][1]
                         if vast == ("nulllit",)}
        has_nested = any(isinstance(v, dict) for v in obj.values()) or \
            any(v is None for k, v in obj.items() if k not in null_keys)
        if not has_nested:
            return None  # flat payload: engine column path handles it
        rid = f"{tbl}:" + str(self._key_text(stmt.target, params))
        cur = self.db.table(tbl)
        rows = cur.filter(F.col("id") == rid).limit(2).collect()
        if not rows:
            return None  # UPDATE no-op / UPSERT create handled upstream
        before = strip_absent(rows[0].asDict(recursive=True))

        def _clean(v):
            # NONE values REMOVE keys, recursively (objects carry no
            # entry for NONE — types/src/value/mod.rs)
            if isinstance(v, dict):
                return {k: _clean(x) for k, x in v.items() if x is not None}
            return v

        def _dmerge(a, b):
            if isinstance(a, dict) and isinstance(b, dict):
                out = dict(a)
                for k, v in b.items():
                    if v is None:
                        out.pop(k, None)
                        continue
                    out[k] = (_dmerge(out.get(k), v)
                              if isinstance(v, dict) else _clean(v))
                return out
            return _clean(b)

        if stmt.data[0] == "merge":
            merged = _dmerge(before, obj)
            for k in null_keys:
                merged[k] = None
        else:
            merged = {k: _clean(v) for k, v in obj.items()
                      if v is not None or k in null_keys}
        merged["id"] = rid
        row_df = self._literal_rows([merged], stmt.target, params)
        before_df = cur.filter(F.col("id") == rid) \
            .localCheckpoint(eager=True)
        out = self.db.upsert(tbl, row_df)
        return self._ret(before_df, out, stmt.return_)

    def _kinded_point_update(self, stmt, tbl: str, params: dict):
        """Single-record UPDATE touching a kinded (heterogeneous) column:
        decode the ONE row driver-side, apply the ops with pyeval's
        reference semantics (increment/decrement, val/value/increment.rs),
        re-encode.  O(1) rows by construction, so the driver round-trip is
        scale-sane.  Returns None when the shape doesn't apply (engine
        path runs instead)."""
        td = self.db.tables.get(tbl)
        if (stmt.target.key is None or td is None or not td.kinded
                or stmt.where is not None
                or not stmt.data or stmt.data[0] != "set"
                or not self.db._exists(tbl)):
            return None
        assigns = stmt.data[1]
        if not all(isinstance(f_, str) for f_, _o, _a in assigns):
            return None
        if not any(f_ in td.kinded for f_, _o, _a in assigns):
            return None
        from surrealdb_spark import pyeval
        from surrealdb_spark.values import (decode_kinded_py,
                                            encode_kinded_py, kind_of_py)

        rid = f"{stmt.target.table}:{self._key_text(stmt.target, params)}"
        cur = self.db.table(tbl)
        rows = cur.filter(F.col("id") == rid).limit(2).collect()
        ret = stmt.return_
        if not rows:
            empty = cur.limit(0)
            if isinstance(ret, tuple):
                return self._ret_expr_static(empty, empty, ret, params)
            return self._ret(empty, empty, ret)
        raw = rows[0].asDict(recursive=True)
        before = {}
        for k, v in raw.items():
            if k.startswith("__k_"):
                continue
            kind = raw.get("__k_" + k)
            if kind is not None and isinstance(v, str):
                v = decode_kinded_py(v, kind)
            before[k] = v
        present = set(raw.get("__present") or
                      [k for k, v in before.items() if v is not None])
        after = dict(before)
        set_exprs: dict[str, Column] = {}
        for f_, op, ast in assigns:
            try:
                # field references in the rhs read the CURRENT record
                # state (`SET count = IF count THEN count + 1 ELSE 1 END`
                # — doc/alter.rs evaluates against the working document)
                from surrealdb_spark import pyeval as _pyu

                cur_doc = {k: v for k, v in after.items()
                           if k in present and not k.startswith("__")}
                rhs = _pyu.peval(ast, {**params, "this": cur_doc})
            except Exception:
                rhs = self._scalar(ast, params)
            base = after.get(f_) if f_ in present or after.get(f_) is not None \
                else None
            if op == "+=":
                nv = pyeval.increment(base, rhs)
            elif op == "+?=":
                nv = pyeval.extend(base, rhs)
            elif op == "-=":
                nv = pyeval.decrement(base, rhs)
            else:
                nv = rhs
            after[f_] = nv
            present.add(f_)
            if f_ in td.kinded:
                set_exprs[f_] = F.lit(encode_kinded_py(nv))
                set_exprs["__k_" + f_] = F.lit(kind_of_py(nv))
            else:
                if isinstance(nv, dict):
                    return None  # struct literal: engine path handles
                set_exprs[f_] = F.lit(nv)
        if "__present" in cur.columns:
            set_exprs["__present"] = F.lit(sorted(
                p for p in present if not p.startswith("__k_")))
        self.db.update(tbl, set_exprs, F.col("id") == rid, "NONE")

        def _plain(v):
            # createDataFrame's pickler chokes on list/dict SUBCLASSES
            # (SetVal) — coerce to the base containers
            if isinstance(v, list):
                return [_plain(x) for x in v]
            if isinstance(v, dict):
                return {k: _plain(x) for k, x in v.items()}
            return v

        after_df = self._literal_rows(
            [{k: _plain(v) for k, v in after.items() if v is not None
              or k in present}],
            Target(stmt.target.table, stmt.target.key), params)
        before_df = self._literal_rows(
            [{k: _plain(v) for k, v in before.items() if v is not None}],
            Target(stmt.target.table, stmt.target.key), params)
        if isinstance(ret, tuple):
            return self._ret_expr_static(before_df, after_df, ret, params)
        return self._ret(before_df, after_df, ret)

    @staticmethod
    def _normalize_id_value(rid, tbl: str) -> str:
        """Validate + canonicalize a user-provided `id` value on CREATE/
        INSERT (doc/create.rs:21-23): empty ids and range values ERROR; a
        record id of another table keeps its KEY under the target table;
        array keys render canonically."""
        from surrealdb_spark.values import render_rid_vals

        if hasattr(rid, "asDict"):  # collected Row (range struct, ...)
            rid = rid.asDict()
        if isinstance(rid, list):
            return f"{tbl}:{render_rid_vals(rid)}"
        if isinstance(rid, dict):
            if "start_incl" in rid or "end_incl" in rid:
                from surrealdb_spark.pyeval import render as _render

                raise ValueError(
                    f"Found {_render(rid)} for the Record ID but this is "
                    "not a valid id")
            from surrealdb_spark.values import render_rid_obj

            try:
                return f"{tbl}:{render_rid_obj(('object', list(rid.items())))}"
            except Exception:
                return f"{tbl}:{rid}"
        if isinstance(rid, str):
            if rid == "":
                raise ValueError(
                    "Found '' for the Record ID but this is not a valid id")
            if ":" in rid:
                # a record id (possibly of ANOTHER table): the KEY lands
                # under the statement's target table (doc/create.rs)
                return f"{tbl}:{rid.split(':', 1)[1]}"
            return f"{tbl}:{rid}"
        return f"{tbl}:{rid}"

    def _fpath_segs(self, segs, params) -> list[str]:
        """Resolve a nested assignment path's segments to field names."""
        out = []
        for k, v in segs:
            if k == "f":
                out.append(v)
            else:
                val = self._scalar(v, params)
                if not isinstance(val, str):
                    raise ValueError(
                        "nested assignment keys must be field names")
                out.append(val)
        return out

    @staticmethod
    def _kind_ok_py(v, kind: str) -> bool:
        """Driver-side kind membership for write-time coercion checks
        (doc/field.rs; strict — no silent cast)."""
        import datetime as _dtm
        import decimal as _dec

        k = (kind or "").strip().lower()
        if k.startswith("option<") and k.endswith(">"):
            k = k[7:-1].strip()
        base = k.split("<", 1)[0]
        if base == "string":
            return isinstance(v, str)
        if base in ("number", "int", "float", "decimal"):
            return (isinstance(v, (int, float, _dec.Decimal))
                    and not isinstance(v, bool))
        if base == "bool":
            return isinstance(v, bool)
        if base == "datetime":
            return isinstance(v, _dtm.datetime)
        if base == "object":
            return isinstance(v, dict) or hasattr(v, "asDict")
        if base in ("array", "set"):
            return isinstance(v, list)
        return True

    def _scalar_kind_check(self, fname: str, k: str, base_k: str, v,
                           rid) -> None:
        """Strict scalar kinds reject cross-kind values with no silent
        cast (doc/field.rs coerce — `TYPE string` rejects 1)."""
        if v is None:
            return
        if base_k in ("string", "bool", "datetime") \
                and not self._kind_ok_py(v, base_k):
            from surrealdb_spark.pyeval import render as _r

            shown = _r(v)
            if not isinstance(v, str):
                shown = f"`{shown}`"
            raise ValueError(
                f"Couldn't coerce value for field `{fname}` of "
                f"`{rid}`: Expected `{k}` but found {shown}")
        if base_k in ("number", "int", "float", "decimal") \
                and not self._kind_ok_py(v, "number"):
            from surrealdb_spark.pyeval import render as _r

            raise ValueError(
                f"Couldn't coerce value for field `{fname}` of "
                f"`{rid}`: Expected `{k}` but found "
                f"{_r(v) if not isinstance(v, str) else repr(v)}")

    def _litobj_check(self, fname: str, ktext: str, v, rid) -> None:
        """Literal-object kind coercion on a literal write
        (types/src/kind/mod.rs:17-80): required members present, no extra
        members, member kinds recurse."""
        from surrealdb_spark.sql.compiler import litkind_ok, render_kind
        from surrealdb_spark.sql.parser import parse_kind

        try:
            kast = parse_kind(ktext)
        except Exception:
            return  # unparseable kind text: no driver-side check
        if litkind_ok(kast, v) is False:
            from surrealdb_spark.pyeval import render as _r

            raise ValueError(
                f"Couldn't coerce value for field `{fname}` of `{rid}`: "
                f"Expected `{render_kind(kast)}` but found {_r(v)}")

    def _enforce_field_kinds(self, tbl: str, d: dict) -> dict:
        """Write-time DEFINE FIELD TYPE enforcement over a literal row
        (doc/field.rs process_table_fields): explicit NULL on a non-option
        kind errors, object kinds reject scalars, nested members
        (`obj.a TYPE string`) must be present and well-typed.  Nested
        object values with typed members convert dict → Row so the stored
        struct keeps each member's type."""
        td = self.db.tables.get(tbl)
        if td is None:
            return d
        rid = d.get("id", f"{tbl}:?")
        # COMPUTED fields with a strict kind: the computed value must
        # coerce at write (computed/typed.surql — TYPE string COMPUTED
        # id.id() errors on typed:1)
        for fname, (ckind, payload) in \
                self.computed_fields.get(tbl, {}).items():
            if ckind == "refs":
                continue
            ck = self.computed_kinds.get((tbl, fname))
            if not ck:
                continue
            kl0 = ck.strip().lower()
            if kl0.startswith("option<") or kl0 in ("", "any"):
                continue
            from surrealdb_spark import pyeval as _pe

            try:
                cv = _pe.peval(payload, {"this": d})
            except Exception:
                continue  # engine-side compute: checked at read
            self._scalar_kind_check(fname, ck, kl0.split("<", 1)[0],
                                    cv, rid)
        nested_bases = set()
        for fd in td.fields:
            k = fd.kind or ""
            kl = k.strip().lower()
            opt = kl.startswith("option<") or kl in ("", "any",
                                                     "references")
            if "." in fd.name:
                if "*" in fd.name:
                    continue
                base, sub = fd.name.split(".", 1)
                if "." in sub:
                    continue
                nested_bases.add(base)
                node = d.get(base)
                if not isinstance(node, dict):
                    continue
                v = node.get(sub)
                if v is None:
                    if not opt:
                        raise ValueError(
                            f"Couldn't coerce value for field "
                            f"`{fd.name}` of `{rid}`: Expected `{k}` "
                            f"but found NONE")
                    continue
                if kl.split("<", 1)[0] in ("string", "number", "int",
                                           "float", "decimal", "bool",
                                           "option") \
                        and not self._kind_ok_py(v, k):
                    from surrealdb_spark.pyeval import render as _r

                    raise ValueError(
                        f"Couldn't coerce value for field `{fd.name}` "
                        f"of `{rid}`: Expected `{k}` but found {_r(v)}")
                continue
            if fd.name not in d:
                if fd.default_ast is not None and kl and not opt:
                    # the DEFAULT will fill this write: a literal default
                    # must itself coerce (default_value_does_not_match_
                    # type.surql: TYPE string DEFAULT 0 errors at CREATE)
                    from surrealdb_spark import pyeval as _pe

                    try:
                        dv = _pe.peval(fd.default_ast, {})
                    except Exception:
                        dv = None  # dynamic default: checked at read
                    bk = kl.split("<", 1)[0]
                    self._scalar_kind_check(fd.name, k, bk, dv, rid)
                elif (fd.default is None and fd.value_fn is None
                        and not opt and kl
                        and fd.name not in ("id", "in", "out")):
                    # required typed field absent on the write
                    # (value_assert_failure.surql: `TYPE number` with no
                    # DEFAULT errors on a row that never sets it)
                    raise ValueError(
                        f"Couldn't coerce value for field `{fd.name}` "
                        f"of `{rid}`: Expected `{k}` but found NONE")
                continue
            v = d[fd.name]
            if v is None and not opt and kl:
                raise ValueError(
                    f"Couldn't coerce value for field `{fd.name}` of "
                    f"`{rid}`: Expected `{k}` but found NULL")
            base_k = kl.removeprefix("option<").split("<", 1)[0]
            lead = base_k.lstrip()[:1]
            if v is not None and (lead in ("'", '"', "{", "[")
                                  or lead.isdigit()):
                # literal kind (object/array/scalar literals + unions):
                # strict value check (types/src/kind/mod.rs:17-80)
                self._litobj_check(fd.name, k, v, rid)
                continue
            if v is not None and base_k == "object" \
                    and not self._kind_ok_py(v, "object"):
                from surrealdb_spark.pyeval import render as _r

                raise ValueError(
                    f"Couldn't coerce value for field `{fd.name}` of "
                    f"`{rid}`: Expected `object` but found {_r(v)}")
            self._scalar_kind_check(fd.name, k, base_k, v, rid)
        # ASSERT clauses on literal writes evaluate driver-side so the
        # error carries the reference's shape and runs BEFORE the
        # unknown-field rejection (doc/field.rs field-then-strict order);
        # option kinds skip the assert when the value is NONE
        for fd in td.fields:
            if fd.value_ast is None or "." in fd.name or "*" in fd.name:
                continue
            from surrealdb_spark import pyeval as _pe

            raw0 = d.get(fd.name)
            try:
                _pe.peval(fd.value_ast,
                          {"value": raw0, "input": raw0, "this": d})
            except _pe.EvalError as e0:
                # the VALUE clause itself errors on this input (reference
                # evaluates it per write — 'Cannot perform multiplication
                # with NONE and 2', type_value_order_checking.surql)
                raise ValueError(str(e0))
            except Exception:
                pass  # engine-side compute path handles it
        for fd in td.fields:
            if fd.assert_ast is None or "." in fd.name:
                continue
            kl = (fd.kind or "").strip().lower()
            raw = d.get(fd.name)
            v = raw
            from surrealdb_spark import pyeval as _pe

            if v is None and fd.default_ast is not None:
                try:
                    v = _pe.peval(fd.default_ast, {})
                except Exception:
                    v = None
            if fd.value_ast is not None:
                # asserts check the post-VALUE value (doc/field.rs order)
                try:
                    v = _pe.peval(fd.value_ast,
                                  {"value": v, "input": raw, "this": d})
                except Exception:
                    continue  # engine-side assert runs in _apply_fields
            if v is None and (kl.startswith("option<") or not kl):
                continue
            try:
                ok = _pe.truthy(_pe.peval(
                    fd.assert_ast, {"value": v, "input": raw, "this": d}))
            except Exception:
                continue  # engine-side assert still runs in _apply_fields
            if not ok:
                from surrealdb_spark.pyeval import _render_inner as _ri
                from surrealdb_spark.sql.explain import to_sql as _ts

                try:
                    cond = _ts(fd.assert_ast)
                except Exception:
                    cond = "ASSERT"
                raise ValueError(
                    f"Found {_ri(v)} for field `{fd.name}`, with record "
                    f"`{rid}`, but field must conform to: {cond}")
        if getattr(td, "schemafull", False):
            declared = {f.name.split(".", 1)[0].split("[", 1)[0]
                        for f in td.fields}
            declared.update(f2 for (t2, f2) in self.computed_kinds
                            if t2 == tbl)
            declared.update(self.computed_fields.get(tbl, {}))
            for k2 in d:
                if k2 in ("id", "in", "out", "__present") \
                        or k2.startswith("__"):
                    continue
                if k2 not in declared:
                    raise ValueError(
                        f"Found field '{k2}', but no such field exists "
                        f"for table '{tbl}'")

            def _check_obj_members(prefix: str, node: dict) -> None:
                # non-FLEXIBLE object kinds: nested members must be
                # declared (`settings.nested` — empty_nested_objects)
                subs = set()
                for f3 in td.fields:
                    if f3.name.startswith(prefix + "."):
                        subs.add(f3.name[len(prefix) + 1:]
                                 .split(".", 1)[0].split("[", 1)[0])
                if "*" in subs:
                    return
                for k3, v3 in node.items():
                    if k3 not in subs:
                        raise ValueError(
                            f"Found field '{prefix}.{k3}', but no such "
                            f"field exists for table '{tbl}'")
                    sub_fd = next(
                        (f3 for f3 in td.fields
                         if f3.name == f"{prefix}.{k3}"), None)
                    if (sub_fd is not None and isinstance(v3, dict)
                            and not sub_fd.flexible
                            and (sub_fd.kind or "").strip().lower()
                            .removeprefix("option<")
                            .split("<", 1)[0] == "object"):
                        _check_obj_members(f"{prefix}.{k3}", v3)

            for fd in td.fields:
                if "." in fd.name or fd.flexible:
                    continue
                bk2 = (fd.kind or "").strip().lower() \
                    .removeprefix("option<").split("<", 1)[0]
                v2 = d.get(fd.name)
                if bk2 == "object" and isinstance(v2, dict):
                    _check_obj_members(fd.name, v2)
        from pyspark.sql import Row as _Row

        def _rowify(x):
            # non-empty dict → Row: the stored struct keeps each member's
            # own type (a dict would infer map<string,string>)
            if isinstance(x, dict) and x:
                return _Row(**{k2: _rowify(v2) for k2, v2 in x.items()})
            if isinstance(x, list):
                return [_rowify(e) for e in x]
            return x

        for k2 in list(d):
            if k2 not in ("id", "__present") and isinstance(d[k2],
                                                            (dict, list)):
                d[k2] = _rowify(d[k2])
        return d

    @staticmethod
    def _promote_mixed_nums(v):
        """Mixed-subtype numeric lists ([1.5, 0]) can't infer a Spark
        array type — promote every element to the widest member
        (decimal unless a float is present, else double).  Recursive
        through lists and object values; non-numeric mixes untouched."""
        from decimal import Decimal as _D

        if isinstance(v, dict):
            return {k: StatementRunner._promote_mixed_nums(x)
                    for k, x in v.items()}
        if not isinstance(v, list):
            return v
        v = [StatementRunner._promote_mixed_nums(x) for x in v]
        elems = [x for x in v if x is not None]
        if not elems or not all(
                isinstance(x, (int, float, _D)) and not isinstance(x, bool)
                for x in elems):
            return v
        kinds = {type(x) for x in elems}
        if len(kinds) <= 1:
            return v
        conv = _D if (_D in kinds and float not in kinds) else float
        return [conv(x) if x is not None else None for x in v]

    @staticmethod
    def _drop_inner_none(v, in_dict: bool = False):
        """Objects carry no entry for NONE, recursively — but ARRAY
        elements keep their NONE slots (none_elimination.surql:
        `{key: NONE}` → `{}`, `[NONE, {}]` stays two elements)."""
        if isinstance(v, dict):
            return {k: StatementRunner._drop_inner_none(x, True)
                    for k, x in v.items() if x is not None}
        if isinstance(v, list):
            return [StatementRunner._drop_inner_none(x) for x in v]
        return v

    @staticmethod
    def _non_sparkable(v) -> bool:
        """Values Spark's row inference can't type (regex values) — they
        must store as kinded JSON cells."""
        from surrealdb_spark.pyeval import RegexVal

        if isinstance(v, RegexVal):
            return True
        if isinstance(v, list):
            return any(StatementRunner._non_sparkable(x) for x in v)
        if isinstance(v, dict):
            return any(StatementRunner._non_sparkable(x)
                       for x in v.values())
        return False

    @staticmethod
    def _needs_kinded_cell(v) -> bool:
        """Lists Spark's static element type can't carry faithfully:
        object elements with differing key sets, NONE-or-scalar mixed
        with objects, or cross-kind scalar mixes."""
        from decimal import Decimal as _D

        if not isinstance(v, list):
            return False
        kinds: set = set()
        keysets: set = set()
        for x in v:
            if x is None:
                kinds.add("none")
            elif isinstance(x, bool):
                kinds.add("bool")
            elif isinstance(x, (int, float, _D)):
                kinds.add("num")
            elif isinstance(x, str):
                kinds.add("str")
            elif isinstance(x, dict):
                kinds.add("obj")
                keysets.add(tuple(sorted(x)))
            elif isinstance(x, list):
                kinds.add("arr")
            else:
                kinds.add(type(x).__name__)
        hard = kinds - {"none"}
        if "obj" in kinds and (len(hard) > 1 or len(keysets) > 1
                               or "none" in kinds):
            return True
        return len(hard) > 1

    def _literal_rows(self, dicts: list[dict], tgt: Target, params: dict) -> DataFrame:
        from surrealdb_spark.values import encode_kinded_py, kind_of_py

        rows = []
        for i, d in enumerate(dicts):
            d = {k: self._promote_mixed_nums(self._drop_inner_none(x))
                 for k, x in d.items()}
            for k in list(d):
                if k in ("id", "__present") or k.startswith("__k_"):
                    continue
                if "__k_" + k not in d and (
                        self._needs_kinded_cell(d[k])
                        or self._non_sparkable(d[k])):
                    d["__k_" + k] = kind_of_py(d[k])
                    d[k] = encode_kinded_py(d[k])
                    td1 = self.db.tables.get(tgt.table)
                    if td1 is not None:
                        # a JSON-encoded cell makes the column kinded
                        # (unlike geometry/regex kind STAMPS, whose
                        # values stay natively typed)
                        td1.kinded.add(k)
            if "id" not in d:
                if tgt.key is not None:
                    d["id"] = f"{tgt.table}:{self._key_text(tgt, params)}"
                else:
                    import uuid as _uuid

                    d["id"] = f"{tgt.table}:{_uuid.uuid4().hex[:16]}"
            else:
                d["id"] = self._normalize_id_value(d["id"], tgt.table)
            d = self._enforce_field_kinds(tgt.table, d)
            # field-presence marker: which fields THIS record carries
            # (schema-union NULLs are indistinguishable from explicit NULL
            # otherwise; values.strip_absent consumes it on output)
            d["__present"] = sorted(k for k in d if k != "__present"
                                    and not k.startswith("__k_"))
            rows.append(d)
        keys = sorted({k for d in rows for k in d})
        data = [{k: d.get(k) for k in keys} for d in rows]

        def _forced_type(vals):
            """Explicit type for fields inference can't determine: all-NONE
            → string (schemaless default, absent ≡ NULL); all empty
            arrays/objects → array<string>/map (CREATE t SET xs = [])."""
            from pyspark.sql import types as T

            vals = [v for v in vals if v is not None]
            if not vals:
                # stay void: Database._harmonize can then take the stored
                # side's type (time = null on a timestamp column must not
                # degrade it); parquet writes devoid to string at the end
                return T.NullType()
            if all(isinstance(v, list) and not v for v in vals):
                return T.ArrayType(T.StringType())
            if all(isinstance(v, dict) and not v for v in vals):
                return T.MapType(T.StringType(), T.StringType())
            return None

        forced = {k: t for k in keys
                  if (t := _forced_type([d.get(k) for d in data])) is not None}
        # declared `.*.` member fields pin the element struct of an
        # all-empty array slot (DEFAULT ALWAYS [] with tags.*.name
        # members — default_always.surql: later `+=` appends must align)
        td0 = self.db.tables.get(tgt.table)
        if td0 is not None:
            from pyspark.sql import types as T

            for k, t in list(forced.items()):
                if not isinstance(t, T.ArrayType):
                    continue
                members = [(fd.name.split(".*.", 1)[1], fd.dtype or "string")
                           for fd in td0.fields
                           if fd.name.startswith(k + ".*.")
                           and "." not in fd.name.split(".*.", 1)[1]]
                if members:
                    forced[k] = T.ArrayType(T.StructType(
                        [T.StructField(n, T._parse_datatype_string(dt))
                         for n, dt in sorted(members)]))
        if forced:
            from pyspark.sql import types as T

            sample = self.spark.createDataFrame(
                [{k: v for k, v in d.items() if k not in forced}
                 for d in data]) if len(forced) < len(keys) else None
            fields = list(sample.schema.fields) if sample is not None else []
            fields += [T.StructField(k, t) for k, t in forced.items()]
            schema = T.StructType(sorted(fields, key=lambda f: f.name))
            return self.spark.createDataFrame(
                [tuple(d[f.name] for f in schema.fields) for d in data],
                schema)
        return self.spark.createDataFrame(data)

    def _insert_ignore_filter(self, tbl: str, df: DataFrame) -> DataFrame:
        """Drop rows an INSERT IGNORE must skip: existing ids and rows
        whose unique-index entries clash with stored data
        (expr/statements/insert.rs ignore mode)."""
        td = self.db.tables[tbl]
        if not self.db._exists(tbl):
            return df
        cur = self.db.table(tbl)
        keep = df
        if td.id_col in keep.columns:
            keep = keep.join(cur.select(td.id_col), td.id_col, "left_anti")
        for cols in td.unique_indexes:
            ent = self.db._uniq_entries(keep, cols, extra=[td.id_col])
            stored = self.db._uniq_entries(cur, cols)
            if ent is None or stored is None:
                continue
            keys = [c for c in ent.columns if c != td.id_col]
            bad = ent.join(stored, keys, "left_semi").select(td.id_col)
            keep = keep.join(bad, td.id_col, "left_anti")
        return keep

    def _tbl_has_events(self, tbl) -> bool:
        return any(t == tbl for t, _h in self.events.values())

    def _stash_event_input(self, tbl: str, data, params: dict) -> None:
        """Stash the statement's raw input object for $input in event
        scope (doc/alter.rs compute_input_data: CONTENT/MERGE/REPLACE
        bind the payload; SET binds initial-doc + assignments — the
        before-merge happens per row in _fire_event).  Only computed when
        the target table has events; writable-subquery assignments are
        skipped (they must not execute twice)."""
        if not data or not self._tbl_has_events(tbl):
            return
        try:
            if data[0] in ("content", "merge", "replace"):
                self._evt_input = self._obj(data[1], params)
            elif data[0] == "set":
                inp: dict = {}
                for f_, op_, ast_ in data[1]:
                    if not isinstance(f_, str) or op_ != "=" \
                            or "." in f_ or _has_wsub(ast_):
                        continue
                    try:
                        inp[f_] = self._scalar(ast_, params)
                    except Exception:
                        continue
                self._evt_input = inp
        except Exception:
            self._evt_input = None

    def _event_script(self):
        """Lazy ScriptRunner for event THEN bodies — shares this runner so
        DML inside events sees the same catalog/registries."""
        sr = getattr(self, "_evt_script", None)
        if sr is None:
            from surrealdb_spark.script import ScriptRunner

            sr = ScriptRunner(self.spark, catalog=self.catalog,
                              db=self.db, stmts=self)
            # $this does NOT leak into nested DML data clauses — the
            # inner statement's own cursor governs (this_parent.surql)
            sr._dml_hide = ("this",)
            self._evt_script = sr
        return sr

    def _fire_event(self, name: str, action: str, df: DataFrame,
                    before: DataFrame | None, when_ast, then_stmts: list):
        """One DEFINE EVENT firing pass (doc/event.rs process_events):
        bind $event/$value/$after/$before/$input per affected record,
        gate on WHEN, and run the THEN statements through the script
        engine.  CREATE batches try the distributed fast path first;
        UPDATE/DELETE collect the (OLTP-sized) affected rows so the real
        pre-image drives $before and the changed() gate."""
        from surrealdb_spark.script import ScriptError, _truthy
        from surrealdb_spark.values import strip_absent

        data_cols = [c for c in df.columns if not c.startswith("__")]
        when_checked = False
        matched = df
        if action == "CREATE":
            s = F.struct(*[F.col(c).alias(c) for c in data_cols])
            # $before is NONE on CREATE — typed NULL slots keep
            # `$before.x` resolvable in the Spark filter
            null_s = F.struct(*[F.lit(None).alias(c) for c in data_cols])
            binds_c = {"event": F.lit(action), "after": s, "value": s,
                       "before": null_s, "this": s, "parent": s}
            if when_ast is not None:
                try:
                    matched = df.filter(self._expr(when_ast, binds_c))
                    when_checked = True
                except Exception:
                    matched = df  # driver loop re-checks per row
            if when_checked or when_ast is None:
                # nested-DML data clauses see $this as NONE (the inner
                # statement's own cursor — this_parent.surql)
                fp_binds = {**binds_c, "this": F.lit(None)}
                if self._event_fast_path(matched, fp_binds, then_stmts):
                    return
        # real pre-images keyed by record id (self.initial in
        # doc/event.rs) — callers pass the before frame on UPDATE/DELETE
        bmap: dict = {}
        if before is not None:
            for r in _bounded_collect(before, "DEFINE EVENT before-image"):
                d0 = strip_absent(r.asDict(recursive=True))
                bmap[str(d0.get("id"))] = {
                    k: v for k, v in d0.items() if not k.startswith("__")}
        inputs = getattr(self, "_evt_input", None)
        from surrealdb_spark import pyeval

        texts = []
        for t in then_stmts:
            t = t.strip()
            if t.startswith("(") and t.endswith(")"):
                t = t[1:-1].strip()
            texts.append(t)
        script = ";\n".join(texts)
        for row in _bounded_collect(matched, "DEFINE EVENT firing"):
            d = strip_absent(row.asDict(recursive=True))
            d = {k: v for k, v in d.items() if not k.startswith("__")}
            bef = bmap.get(str(d.get("id")))
            if action == "UPDATE" and bef is not None and bef == d:
                continue  # unchanged document (doc/event.rs changed())
            aft = None if action == "DELETE" else d
            cur = bef if (action == "DELETE" and bef is not None) else d
            inp = None
            if isinstance(inputs, dict):
                # SET input = initial doc + assignments
                # (doc/alter.rs compute_input_data)
                inp = ({**bef, **inputs} if action != "CREATE"
                       and bef is not None else inputs)
            binds = {"event": action, "after": aft, "before": bef,
                     "value": cur, "this": cur, "parent": cur,
                     "input": inp}
            if when_ast is not None and not when_checked:
                try:
                    keep = pyeval.peval(when_ast, dict(binds))
                except Exception:
                    keep = True
                if not _truthy(keep):
                    continue
            # bare identifiers in THEN bodies resolve against the cursor
            # doc (`IF fail { ... }` — doc fields as script bindings)
            fields = {k: v for k, v in (cur or {}).items()
                      if isinstance(k, str) and k.isidentifier()
                      and k not in binds}
            try:
                self._event_script().run(script, **{**fields, **binds})
            except ScriptError as exc:
                raise ValueError(
                    f"Error while processing event {name}: "
                    f"An error occurred: {exc.value}") from None

    def _event_fast_path(self, matched: DataFrame, binds: dict,
                         then_stmts: list) -> bool:
        """Distributed THEN execution for the common simple shape: ONE
        `CREATE tbl SET f = <expr over $event/$after/$before/$value>`
        with no explicit key — one DataFrame select + insert instead of a
        per-row driver loop (doc/event.rs semantics, Spark-first plan)."""
        if len(then_stmts) != 1:
            return False
        txt = then_stmts[0].strip()
        if txt.startswith("(") and txt.endswith(")"):
            txt = txt[1:-1].strip()
        if not txt.upper().startswith("CREATE"):
            return False
        try:
            st = parse_statement(txt)
        except Exception:
            return False
        if not isinstance(st, CreateStmt) or st.target.key is not None \
                or st.target.mock or st.data is None \
                or st.data[0] != "set" \
                or any(op != "=" for _, op, _a in st.data[1]):
            return False
        tbl = st.target.table
        if tbl not in self.db.tables:
            self.db.define_table(TableDef(tbl))
        try:
            fields = [(f_, self._expr(ast, binds))
                      for f_, _, ast in st.data[1]]
        except Exception:
            return False
        cols = [c.alias(f_) for f_, c in fields]
        cols.append(F.concat(
            F.lit(tbl + ":"),
            F.substring(F.regexp_replace(F.expr("uuid()"), "-", ""), 1, 16)
        ).alias("id"))
        # per-row presence: NONE-valued assignments drop their field
        # (objects carry no entry for NONE — types/src/value/mod.rs)
        pres = [F.when(c.isNotNull(), F.lit(f_)) for f_, c in fields]
        pres.append(F.lit("id"))
        cols.append(F.array_sort(F.array_compact(F.array(*pres)))
                    .alias("__present"))
        try:
            self.db.create(tbl, matched.select(*cols))
        except Exception:
            return False
        return True

    def _key_text(self, tgt: Target, params: dict):
        """Key part of a record-id target; array keys (`("kexpr", ast)`)
        render canonically after evaluation (record_id/key.rs Array)."""
        k = tgt.key
        if isinstance(k, tuple) and k[0] == "genkey":
            # generated record key (record_id/key.rs Generate) — ulid/
            # uuid/rand shapes; tests mask keys via skip-record-id-key
            import uuid as _u

            if k[1] == "uuid":
                return f"⟨{_u.uuid4()}⟩"
            return _u.uuid4().hex[:20]
        if isinstance(k, tuple) and k[0] == "kexpr":
            from surrealdb_spark.values import render_rid_vals

            ast = k[1]
            vals = ([self._scalar(e, params) for e in ast[1]]
                    if ast[0] == "array" else [self._scalar(ast, params)])
            return render_rid_vals(vals)
        return k

    def _where(self, tgt: Target, where_ast, tbl: str, params: dict) -> Column | None:
        conds = []
        if tgt.key is not None:
            conds.append(
                F.col("id") == f"{tgt.table}:{self._key_text(tgt, params)}")
        if where_ast is not None:
            from surrealdb_spark.sql.compiler import compile_expr, types_of

            types = types_of(self.db.table(tbl)) if self.db._exists(tbl) else {}
            conds.append(compile_expr(where_ast, params, types))
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def _matches(self, tbl: str, where: Column | None) -> bool:
        if not self.db._exists(tbl):
            return False
        df = self.db.table(tbl)
        if where is not None:
            df = df.filter(where)
        return df.limit(1).count() > 0

    def _set_exprs(self, data, tbl: str, params: dict) -> dict[str, Column]:
        from surrealdb_spark.sql.compiler import compile_expr, types_of

        if data is None:
            return {}
        types = types_of(self.db.table(tbl)) if self.db._exists(tbl) else {}
        kind, payload = data
        if kind == "set":
            dtypes = (dict(self.db.table(tbl).dtypes)
                      if self.db._exists(tbl) else {})
            td0 = self.db.tables.get(tbl)
            declared = {fd.name: fd.kind for fd in
                        (td0.fields if td0 else []) if fd.kind}
            out = {}
            for f_, op, ast in payload:
                if isinstance(f_, str) and op == "=" and f_ in declared:
                    from surrealdb_spark.sql.compiler import \
                        _static_of_kind as _sok

                    dk = declared[f_].strip().lower()
                    dk = dk.removeprefix("option<").split("<", 1)[0]
                    sk = _sok(ast, params, None)
                    if dk == "object" and sk is not None \
                            and sk not in ("object", "null", "none") \
                            and not sk.startswith("geometry"):
                        raise ValueError(
                            f"Couldn't coerce value for field `{f_}`: "
                            f"Expected `object` but found `{sk}`")
                rhs = compile_expr(ast, params, types)
                if isinstance(f_, tuple) and f_[0] == "fpath":
                    # nested path: withField chain over the struct column
                    base, segs = f_[1], self._fpath_segs(f_[2], params)
                    cur = out.get(base)
                    if cur is None:
                        cur = (F.col(base)
                               if dtypes.get(base, "").startswith("struct")
                               else None)
                    if cur is None:
                        inner = rhs
                        for s in reversed(segs):
                            inner = F.struct(inner.alias(s))
                        out[base] = inner
                    else:
                        out[base] = cur.withField(".".join(
                            f"`{s}`" for s in segs), rhs)
                    continue
                dt = dtypes.get(f_, "")
                if op == "+=" and dt.startswith("array") \
                        and not dt.startswith("array<struct") \
                        and isinstance(ast, tuple) and ast[0] == "object" \
                        and isinstance(f_, str) and self.db._exists(tbl):
                    # appending an object to an untyped (all-empty) array
                    # slot (DEFAULT ALWAYS [] — default_always.surql):
                    # migrate the column to the declared element struct
                    frame = self.db.table(tbl)
                    if f_ in frame.columns and not frame.filter(
                            F.size(F.col(f_)) > 0).take(1):
                        members = {
                            fd.name.split(".*.", 1)[1]: fd.dtype or "string"
                            for fd in (td0.fields if td0 else [])
                            if fd.name.startswith(f_ + ".*.")
                            and "." not in fd.name.split(".*.", 1)[1]}
                        from surrealdb_spark.sql.compiler import \
                            _static_of_kind as _sok2
                        _SPK = {"string": "string", "int": "bigint",
                                "float": "double", "bool": "boolean"}
                        for gk, gast in ast[1]:
                            members.setdefault(
                                gk, _SPK.get(_sok2(gast, params, None),
                                             "string"))
                        target = "array<struct<" + ", ".join(
                            f"{n}:{t}" for n, t in sorted(members.items())
                        ) + ">>"
                        typed = F.when(
                            F.col(f_).isNotNull(),
                            F.array().cast(target)).otherwise(
                            F.lit(None).cast(target))
                        self.db._overwrite(
                            tbl, frame.withColumn(f_, typed))
                        dtypes = dict(self.db.table(tbl).dtypes)
                        dt = dtypes.get(f_, "")
                if op == "+=" and dt.startswith("array<struct") \
                        and isinstance(ast, tuple) and ast[0] == "object":
                    # align the object literal to the element struct,
                    # absent members NULL (`.*.` defaults fill after)
                    et = self.db.table(tbl).schema[f_].dataType.elementType
                    given = dict(ast[1])
                    if set(given) <= {fl.name for fl in et.fields}:
                        parts = [
                            (compile_expr(given[fl.name], params, types)
                             .cast(fl.dataType) if fl.name in given
                             else F.lit(None).cast(fl.dataType))
                            .alias(fl.name) for fl in et.fields]
                        rhs = F.struct(*parts)
                if op in ("+=", "-=", "+?=") and dt.startswith("array"):
                    # array fields: += appends, -= removes by value,
                    # +?= extends-then-uniqs (doc/data.rs Data::SetExpr;
                    # val/value/extend.rs — an ARRAY rhs concatenates,
                    # a scalar appends; uniq keeps first occurrence,
                    # matching array_distinct)
                    base = F.coalesce(F.col(f_), F.array().cast(dt))
                    if op == "+?=":
                        from surrealdb_spark.sql.compiler import \
                            _static_of_kind as _sok3

                        skr = _sok3(ast, params, None)
                        app = (F.concat(base, rhs)
                               if skr in ("array", "set")
                               else F.array_append(base, rhs))
                        rhs = F.array_distinct(app)
                    else:
                        rhs = (F.array_append(base, rhs) if op == "+="
                               else F.array_remove(base, rhs))
                elif op in ("+=", "-=") and "months" in dt and "nanos" in dt:
                    sign = 1 if op == "+=" else -1
                    rhs = F.struct(
                        (F.coalesce(F.col(f_).getField("months"), F.lit(0))
                         + sign * rhs.getField("months")).cast("long")
                        .alias("months"),
                        (F.coalesce(F.col(f_).getField("nanos"), F.lit(0))
                         + sign * rhs.getField("nanos")).cast("long")
                        .alias("nanos"))
                elif op == "+=":
                    rhs = F.coalesce(F.col(f_), F.lit(0)) + rhs
                elif op == "-=":
                    rhs = F.coalesce(F.col(f_), F.lit(0)) - rhs
                elif op == "+?=":
                    # extend on a non-array column: a NONE base wraps
                    # the rhs, anything else errors (val/value/extend.rs)
                    chk = F.assert_true(
                        F.col(f_).isNull() if f_ in dtypes else F.lit(True),
                        F.lit(f"Cannot extend a value of type {dt or dtypes.get(f_, 'NONE')}"))
                    rhs = F.when(chk.isNull(),
                                 F.array_distinct(F.array(rhs)))
                out[f_] = rhs
            def _base(f):
                return f[1] if isinstance(f, tuple) else f

            removed = [_base(f_) for f_, op, ast in payload
                       if op == "=" and ast == ("lit", None)
                       and not isinstance(f_, tuple)]
            added = [_base(f_) for f_, op, ast in payload
                     if _base(f_) not in removed]
            out["__present"] = self._present_expr(tbl, removed, added)
            return out
        if kind in ("content", "merge"):
            obj = self._obj(payload, params)
            null_keys = set()
            if isinstance(payload, tuple) and payload[0] == "object":
                null_keys = {k for k, vast in payload[1]
                             if vast == ("nulllit",)}
            out = {k: F.lit(v) for k, v in obj.items()
                   if v is not None or k in null_keys}
            if kind == "content":
                # CONTENT replaces the document: non-listed fields → NULL.
                # Edge records keep their in/out pointers (doc/relate.rs:
                # the endpoints are part of the edge identity)
                existing = set(self.db.table(tbl).columns) if self.db._exists(tbl) else set()
                td = self.db.tables[tbl]
                protected = {td.id_col, "__present"}
                if getattr(td, "is_edge", False):
                    protected |= {"in", "out"}
                for c in existing - set(obj) - protected:
                    out[c] = F.lit(None)
                keep = set(obj) | {td.id_col}
                if getattr(td, "is_edge", False):
                    keep |= {"in", "out"} & existing
                out["__present"] = F.array(
                    *[F.lit(k) for k in sorted(keep)
                      if k in out or k not in set(obj)])
            else:
                removed = [k for k, v in obj.items()
                           if v is None and k not in null_keys]
                added = [k for k in obj if k not in removed]
                for k in removed:
                    out[k] = F.lit(None)
                out["__present"] = self._present_expr(tbl, removed, added)
            return out
        if kind == "patch":
            # JSON-Patch array: add/replace/remove ops on flat fields
            out = {}
            for op_ast in payload[1]:
                op = self._obj(op_ast, params)
                key = str(op["path"]).lstrip("/")
                if op["op"] in ("add", "replace"):
                    out[key] = F.lit(op["value"])
                elif op["op"] == "remove":
                    out[key] = F.lit(None)
            return out
        raise ValueError(kind)

    def _present_expr(self, tbl: str, removed: list, added: list) -> Column:
        """Updated field-presence array: existing presence (or, for legacy
        rows, the non-null columns) minus NONE-set fields plus assigned
        ones — consumed by values.strip_absent at output time."""
        cols = (self.db.table(tbl).columns if self.db._exists(tbl) else [])
        data_cols = [c for c in cols if c != "__present"
                     and not c.startswith("__k_")]
        if data_cols:
            derived = F.array_compact(F.array(
                *[F.when(F.col(c).isNotNull(), F.lit(c)) for c in data_cols]))
        else:
            derived = F.array().cast("array<string>")
        if "__present" in cols:
            base = F.coalesce(F.col("__present"), derived)
        else:
            base = derived
        if removed:
            base = F.array_except(base, F.array(*[F.lit(x) for x in removed]))
        if added:
            base = F.array_union(base, F.array(*[F.lit(x) for x in added]))
        return F.array_sort(base)

    def _assign_col(self, f_: str, op: str, ast, df: DataFrame, params: dict) -> Column:
        from surrealdb_spark.sql.compiler import compile_expr

        rhs = compile_expr(ast, params)
        dtype = dict(df.dtypes).get(f_, "")
        if op == "+=" and "months" in dtype and "nanos" in dtype:
            # duration field arithmetic (val/duration.rs Add)
            return F.struct(
                (F.coalesce(F.col(f_).getField("months"), F.lit(0))
                 + rhs.getField("months")).cast("long").alias("months"),
                (F.coalesce(F.col(f_).getField("nanos"), F.lit(0))
                 + rhs.getField("nanos")).cast("long").alias("nanos"))
        if op == "-=" and "months" in dtype and "nanos" in dtype:
            return F.struct(
                (F.coalesce(F.col(f_).getField("months"), F.lit(0))
                 - rhs.getField("months")).cast("long").alias("months"),
                (F.coalesce(F.col(f_).getField("nanos"), F.lit(0))
                 - rhs.getField("nanos")).cast("long").alias("nanos"))
        rhs_is_arr = isinstance(ast, tuple) and ast[0] in ("array",
                                                           "setlit")
        if op == "+=":
            if dtype.startswith("array"):
                base = F.coalesce(F.col(f_), F.array().cast(dtype))
                if rhs_is_arr:
                    # += a collection concatenates element-wise
                    # (set_array_common_behaviour.surql)
                    return F.concat(base, rhs)
                if dtype.startswith("array<struct") \
                        and isinstance(ast, tuple) and ast[0] == "object":
                    # appending an object literal: align to the element
                    # struct, absent members NULL (the `.*.` member
                    # defaults fill them afterwards — default_always)
                    et = df.schema[f_].dataType.elementType
                    given = dict(ast[1])
                    if set(given) <= {fl.name for fl in et.fields}:
                        parts = [
                            (compile_expr(given[fl.name], params)
                             .cast(fl.dataType) if fl.name in given
                             else F.lit(None).cast(fl.dataType))
                            .alias(fl.name) for fl in et.fields]
                        return F.array_append(base, F.struct(*parts))
                # += on an array field appends (doc/data.rs Data::SetExpr)
                return F.array_append(base, rhs)
            return F.coalesce(F.col(f_), F.lit(0)) + rhs
        if op == "-=":
            if dtype.startswith("array"):
                base = F.coalesce(F.col(f_), F.array().cast(dtype))
                if rhs_is_arr:
                    # remove_all semantics (val/mod.rs try_sub Array-Array):
                    # filter out matching elements, KEEP duplicates of the
                    # rest — array_except would dedupe the survivors
                    return F.filter(
                        base,
                        lambda x: ~F.coalesce(F.array_contains(rhs, x),
                                              F.lit(False)))
                return F.array_remove(base, rhs)
            return F.coalesce(F.col(f_), F.lit(0)) - rhs
        return rhs

    @staticmethod
    def _ret(before: DataFrame, after: DataFrame, mode) -> DataFrame:
        if isinstance(mode, tuple):
            return StatementRunner._ret_expr_static(before, after, mode, {})
        if mode == "NONE":
            return after.limit(0)
        if mode == "BEFORE":
            return before
        return after

    @staticmethod
    def _ret_created(out: DataFrame, mode) -> DataFrame:
        """RETURN modes for freshly-created records (CREATE/RELATE):
        there is no pre-image, so BEFORE yields NONE per record and DIFF
        a single whole-document `replace` op (expr/output.rs +
        val/value/diff.rs on an empty initial)."""
        if mode == "BEFORE":
            return out.select(F.lit(None).cast("string").alias("value"))
        if mode == "DIFF":
            cols = [c for c in out.columns if not c.startswith("__")]
            return out.select(F.array(F.struct(
                F.lit("replace").alias("op"), F.lit("").alias("path"),
                F.struct(*[F.col(c) for c in cols]).alias("value"),
            )).alias("value"))
        return StatementRunner._ret(out, out, mode)

    @staticmethod
    def _ret_expr_static(before: DataFrame | None, after: DataFrame | None,
                         ret: tuple, params: dict) -> DataFrame:
        """RETURN VALUE <expr> / RETURN <fields> over the statement's
        pre/post images; $before/$after align per record by id
        (expr/output.rs Output::Fields)."""
        from surrealdb_spark.sql.compiler import compile_expr

        if after is None:
            df = before
            cur = F.struct(*[F.col(c) for c in before.columns])
            binds = {**params, "before": cur, "after": F.lit(None),
                     "value": cur, "this": cur}
        else:
            cur = F.struct(*[F.col(c) for c in after.columns])
            df = after
            if (before is not None and "id" in before.columns
                    and "id" in after.columns):
                b = before.select(
                    F.col("id").alias("__bid"),
                    F.struct(*[F.col(c) for c in before.columns]).alias("__b"),
                )
                df = df.join(b, df["id"] == b["__bid"], "left").drop("__bid")
                bcol = F.col("__b")
            else:
                df = df.withColumn("__b", F.lit(None))
                bcol = F.col("__b")
            binds = {**params, "before": bcol, "after": cur,
                     "value": cur, "this": cur}
        from pyspark.errors import AnalysisException

        try:
            if ret[0] == "value":
                return df.select(compile_expr(ret[1], binds).alias("value"))
            cols = []
            for e, alias in ret[1]:
                name = alias or (e[1] if e[0] == "ident" else "value")
                cols.append(compile_expr(e, binds).alias(name))
            return df.select(*cols)
        except AnalysisException:
            # RETURN expr referencing a field no row carries (e.g. the
            # empty/undefined-table image, schema `id` only): the
            # reference returns [] — zero rows, nothing to project
            if df.isEmpty():
                return df.sparkSession.createDataFrame([], "value string")
            raise


def _has_matches(ast) -> bool:
    import re as _re

    if not isinstance(ast, (tuple, list)):
        return False
    if isinstance(ast, tuple) and ast[0] == "bin" and \
            _re.fullmatch(r"@(\d+)?,?(AND|OR)?@", str(ast[1])):
        return True
    return any(_has_matches(x) for x in ast if isinstance(x, (tuple, list)))


def _has_searchfn(ast) -> bool:
    if not isinstance(ast, (tuple, list)):
        return False
    if isinstance(ast, tuple) and ast[0] == "call" and ast[1] in (
            "search::score", "search::highlight", "search::offsets"):
        return True
    return any(_has_searchfn(x) for x in ast if isinstance(x, (tuple, list)))
