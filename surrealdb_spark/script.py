"""Multi-statement scripts: LET / RETURN / IF-style control flow.

Reference: LET/IF/FOR/RETURN/THROW statements and blocks run as operators
in the streaming executor (core/src/exec/operators/{let_plan,ifelse,
foreach,return}.rs) with ControlFlow signals (exec/mod.rs:150-155).

Spark mapping (SURVEY §2.8 row): the DRIVER is the control-flow engine —
statements execute sequentially, LET binds results (scalar, list, or
DataFrame) into the parameter scope consumed by later SurrealQL statements,
RETURN picks the script's result.  Python callers just write Python; this
runner exists for SurrealQL-text scripts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.sql.compiler import compile_select
from surrealdb_spark.sql.parser import parse_select


@dataclass
class ScriptResult:
    value: object  # DataFrame | scalar | list
    bindings: dict
    # a RETURN fired inside (ControlFlow::Return) — enclosing blocks
    # stop early with this value
    returned: bool = False


class ScriptError(Exception):
    """THROW <expr> (exec ControlFlow::Err; statements/throw.rs)."""

    def __init__(self, value):
        self.value = value
        super().__init__(f"script threw: {value!r}")


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class ScriptRunner:
    """Executes `LET $name = <SELECT...|literal>` / `RETURN <SELECT|$param>`
    statement sequences with IF/ELSE, FOR, THROW, BREAK/CONTINUE blocks
    (ControlFlow signals in the reference executor, exec/mod.rs:150-155).
    With a ``db``, DML/DDL statements (CREATE/INSERT/UPDATE/UPSERT/DELETE/
    RELATE/DEFINE) run through sql.statements.

    The DRIVER is the control-flow engine; each statement's data work stays
    a distributed Spark job.  FOR iterates driver-side over a bounded list —
    it exists for scripting ergonomics, not data movement (use DataFrame
    ops for per-row work; the cap fails loudly).
    """

    # LET over an unbounded SELECT would collect the whole table to the
    # driver (the reference binds subquery results as values too, but a
    # 100 TB LET must fail loudly, not OOM) — VERDICT r1 "what's wrong" #5.
    MAX_LET_ROWS = 100_000
    MAX_FOR_ITERS = 10_000

    def __init__(self, spark: SparkSession, sf_dir: str | None = None,
                 catalog: Catalog | None = None, db=None, stmts=None):
        self.spark = spark
        self.catalog = catalog or Catalog(spark, sf_dir)
        self.db = db
        self._stmts = stmts
        if db is not None and stmts is None:
            from surrealdb_spark.sql.statements import StatementRunner

            self._stmts = StatementRunner(spark, db, catalog=self.catalog)

    def run(self, script: str, **params) -> ScriptResult:
        bindings: dict = dict(params)
        returned = False
        try:
            result = self._run_block(script, bindings)
        except _Return as r:
            result, returned = r.value, True
        except (_Break, _Continue):
            raise ValueError("BREAK/CONTINUE outside a FOR loop") from None
        return ScriptResult(result, bindings, returned)

    # block execution -------------------------------------------------------

    def _run_block(self, text: str, bindings: dict):
        result: object = None
        for stmt in self._statements(text):
            up = stmt.upper()
            if not stmt.strip():
                continue
            if up.startswith("LET "):
                rest = stmt[4:].strip()
                name, _, rhs = rest.partition("=")
                bindings[name.strip().lstrip("$")] = self._eval(rhs.strip(), bindings)
            elif up.startswith("IF ") or up.startswith("IF{"):
                result = self._run_if(stmt, bindings)
            elif up.startswith("FOR "):
                self._run_for(stmt, bindings)
            elif up.startswith("THROW "):
                raise ScriptError(self._eval(stmt[6:].strip(), bindings))
            elif up == "BREAK":
                raise _Break()
            elif up == "CONTINUE":
                raise _Continue()
            elif up.startswith("RETURN "):
                raise _Return(self._eval(stmt[7:].strip(), bindings))
            elif up.startswith("SELECT"):
                result = self._eval(stmt, bindings)
            else:
                # a parenthesized statement `(UPSERT ...)` is a subquery
                # expression whose value is the statement's result
                # (exec/planner.rs writable subqueries) — unwrap it for
                # the statement runner
                m_par = re.match(
                    r"^\(\s*(CREATE|UPDATE|UPSERT|DELETE|INSERT|RELATE"
                    r"|SELECT|RETURN)\b(.*)\)$", stmt, re.I | re.S)
                if m_par and _outer_parens(stmt):
                    stmt = stmt[1:-1].strip()
                    up = stmt.upper()
                    if up.startswith("SELECT"):
                        result = self._eval(stmt, bindings)
                        continue
                # expression statement (may carry `{ BREAK }` control
                # flow, control_flow/loop corpus) — driver evaluator
                # first, then the statement runner
                from surrealdb_spark import pyeval

                try:
                    result = pyeval.eval_text(stmt, bindings)
                    continue
                except pyeval.BreakSignal:
                    raise _Break() from None
                except pyeval.ContinueSignal:
                    raise _Continue() from None
                except Exception:
                    pass
                if self._stmts is not None:
                    hide = getattr(self, "_dml_hide", ())
                    result = self._stmts.run(stmt, {
                        k: v for k, v in bindings.items() if k not in hide})
                else:
                    raise ValueError(
                        f"unsupported statement: {stmt[:40]!r}")
        return result

    def _run_if(self, stmt: str, bindings: dict):
        """IF cond { block } [ELSE IF cond { block }]* [ELSE { block }],
        plus the worded form IF cond THEN body [ELSE IF..THEN..] [ELSE
        body] END (syn/parser/stmt/if.rs: one END closes the chain;
        branch bodies may carry an optional trailing `;`)."""
        worded = _split_worded_if(stmt)
        if worded is not None:
            branches, els = worded
            for cond_src, body in branches:
                if _truthy(self._eval_expr(cond_src.strip(), bindings)):
                    return self._run_block(body, bindings)
            if els is not None:
                return self._run_block(els, bindings)
            return None
        rest = stmt[2:]
        while True:
            cond_src, block, rest = _split_block(rest)
            if _truthy(self._eval_expr(cond_src.strip(), bindings)):
                return self._run_block(block, bindings)
            rest = rest.strip()
            if not rest:
                return None
            up = rest.upper()
            if up.startswith("ELSE IF "):
                rest = rest[7:]
                continue
            if up.startswith("ELSE"):
                _, block, _ = _split_block(" " + rest[4:])
                return self._run_block(block, bindings)
            raise ValueError(f"unexpected after IF block: {rest[:30]!r}")

    def _run_for(self, stmt: str, bindings: dict) -> None:
        """FOR $x IN <iterable> { block } (statements/foreach.rs)."""
        head, block, rest = _split_block(stmt[4:])
        if rest.strip():
            raise ValueError(f"unexpected after FOR block: {rest[:30]!r}")
        var, _, src = head.partition(" IN ") if " IN " in head else head.partition(" in ")
        var = var.strip().lstrip("$")
        items = self._eval(src.strip(), bindings)
        if isinstance(items, DataFrame):
            head_rows = items.limit(self.MAX_FOR_ITERS + 1).collect()
            items = [r.asDict(recursive=True) for r in head_rows]
        if hasattr(items, "asDict"):
            items = items.asDict()
        if isinstance(items, dict) and {"start", "end"} <= set(items):
            # integer range value `lo..[=]hi` iterates its sequence
            # (statements/foreach.rs over Value::Range)
            lo = items["start"] + (0 if items.get("start_incl", True) else 1)
            hi = items["end"] + (1 if items.get("end_incl") else 0)
            items = list(range(int(lo), int(hi)))
        if not isinstance(items, (list, tuple)):
            raise ValueError("FOR needs an array/list to iterate")
        if len(items) > self.MAX_FOR_ITERS:
            raise ValueError(
                f"FOR exceeds {self.MAX_FOR_ITERS} iterations — a driver "
                "loop at that size is a scale bug; use DataFrame operations"
            )
        if len(items) > 50 and self._bulk_create(block, var, items, bindings):
            # vectorized fast path: `FOR $i IN 0..10000 { CREATE ... }`
            # becomes ONE bulk insert — a 10k-iteration driver loop of
            # Spark writes is a scale bug, not a semantic requirement
            return
        for it in items:
            bindings[var] = it
            try:
                self._run_block(block, bindings)
            except _Break:
                break
            except _Continue:
                continue

    def _bulk_create(self, block: str, var: str, items, bindings) -> bool:
        """Recognize a FOR body that is ONE CREATE (or fresh-key UPSERT)
        with driver-evaluable expressions; build every row in Python and
        insert once — a 300-iteration loop of Spark writes is a scale
        bug, not a semantic requirement (recursion_limits.surql setup)."""
        from surrealdb_spark.sql.statements import (CreateStmt, UpdateStmt,
                                                    parse_statement)

        stmts = [s for s in self._statements(block) if s.strip()]
        if len(stmts) != 1 or not stmts[0].strip().upper().startswith(
                ("CREATE", "UPSERT")):
            return False
        try:
            st = parse_statement(stmts[0])
        except Exception:
            return False
        is_upsert = isinstance(st, UpdateStmt) and st.upsert
        if is_upsert and (st.where is not None or st.return_ != "AFTER"
                          or st.extra_targets):
            return False
        if not (isinstance(st, CreateStmt) or is_upsert) \
                or getattr(st.target, "mock", None) or \
                (st.data is not None and st.data[0] not in
                 ("set", "content")):
            return False

        def ev(ast, env):
            k = ast[0]
            if k == "lit":
                return ast[1]
            if k == "param":
                if ast[1] not in env:
                    raise KeyError(ast[1])
                return env[ast[1]]
            if k == "un" and ast[1] == "-":
                return -ev(ast[2], env)
            if k == "bin" and ast[1] in ("+", "-", "*", "%"):
                l, r = ev(ast[2], env), ev(ast[3], env)
                return {"+": l + r, "-": l - r, "*": l * r,
                        "%": l % r if r else None}[ast[1]]
            if k == "array":
                return [ev(e, env) for e in ast[1]]
            # general pure expressions (type::record, string fns, ...)
            # fold through the driver evaluator; table reads / writable
            # subqueries raise Unfoldable and bail to the slow path
            from surrealdb_spark import pyeval as _pyb

            if k in ("wsub", "subquery"):
                raise ValueError("not driver-evaluable")
            return _pyb.peval(ast, env)

        from surrealdb_spark.values import render_rid_vals

        try:
            dicts = []
            for it in items:
                env = {**bindings, var: it}
                d = {}
                if st.data and st.data[0] == "content":
                    # CONTENT {obj} body — the driver evaluator builds the
                    # row dict per item (pipeline stays one bulk insert)
                    from surrealdb_spark import pyeval

                    v = pyeval.peval(st.data[1], env)
                    if not isinstance(v, dict):
                        return False
                    d = dict(v)
                else:
                    for f_, op, ast in (st.data[1] if st.data else []):
                        if op != "=":
                            return False
                        if isinstance(f_, tuple):
                            return False  # nested path targets: slow path
                        d[f_] = ev(ast, env)
                key = st.target.key
                if isinstance(key, tuple) and key[0] == "texpr":
                    # CREATE type::record('tb', $i) — per-item record id
                    ka = key[1]
                    if not (ka[0] == "call"
                            and ka[1] in ("type::record", "type::thing")
                            and len(ka[2]) == 2):
                        return False
                    tb = ev(ka[2][0], env)
                    d["id"] = f"{tb}:{ev(ka[2][1], env)}"
                elif isinstance(key, tuple) and key[0] == "kexpr":
                    ka = key[1]
                    vals = ([ev(e, env) for e in ka[1]]
                            if ka[0] == "array" else [ev(ka, env)])
                    d["id"] = f"{st.target.table}:{render_rid_vals(vals)}"
                elif key is not None:
                    d["id"] = f"{st.target.table}:{key}"
                dicts.append(d)
        except Exception:
            return False
        from surrealdb_spark.dml import TableDef
        from surrealdb_spark.sql.statements import Target

        runner = self._stmts
        table = st.target.table
        if table is None and dicts and "id" in dicts[0]:
            table = str(dicts[0]["id"]).partition(":")[0]
        if table is None:
            return False
        if table not in runner.db.tables:
            runner.db.define_table(TableDef(table))
        if runner.db._exists(table):
            # key overlap → per-row slow path: CREATE must error on a
            # duplicate, UPSERT must MERGE into the existing record
            ids = [d.get("id") for d in dicts if d.get("id")]
            if ids:
                idc = runner.db.tables[table].id_col
                hit = (runner.db.table(table)
                       .filter(F.col(idc).isin(ids)).take(1))
                if hit:
                    return False
        rows = runner._literal_rows(dicts, Target(table), bindings)
        runner.db.create(table, rows)
        return True

    def _eval_expr(self, src: str, bindings: dict):
        """Driver-side SurrealQL expression evaluation (IF conditions).
        `{ BREAK }` control flow propagates to the enclosing loop."""
        from surrealdb_spark.sql.compiler import compile_expr
        from surrealdb_spark.sql.parser import parse_expr

        scalars = {k: v for k, v in bindings.items()
                   if not isinstance(v, DataFrame)}
        try:
            col = compile_expr(parse_expr(src), scalars)
            return self.spark.range(1).select(col.alias("v")).first()["v"]
        except Exception as exc:
            from surrealdb_spark import pyeval

            try:
                return pyeval.eval_text(src, scalars)
            except pyeval.BreakSignal:
                raise _Break() from None
            except pyeval.ContinueSignal:
                raise _Continue() from None
            except pyeval.Unfoldable:
                raise exc

    def _eval(self, rhs: str, bindings: dict):
        rhs = rhs.strip().rstrip(";")
        if rhs.startswith("(") and rhs.endswith(")") and _outer_parens(rhs):
            # only a MATCHING outer pair strips — `(a).map(b)` keeps its
            # parens (the first `(` closes before the end)
            rhs = rhs[1:-1].strip()
        if rhs.upper().startswith("SELECT"):
            df = compile_select(
                self.spark, parse_select(rhs), catalog=self.catalog, params=bindings
            )
            # SELECT VALUE with one column → list of scalars (LET-friendly,
            # mirroring the reference's value semantics for subquery binds)
            if df.columns == ["value"]:
                head = df.limit(self.MAX_LET_ROWS + 1).collect()
                if len(head) > self.MAX_LET_ROWS:
                    raise ValueError(
                        f"LET binding exceeds {self.MAX_LET_ROWS} rows — "
                        "bind a DataFrame (drop SELECT VALUE) or add LIMIT"
                    )
                vals = [r.value for r in head]
                return vals[0] if len(vals) == 1 else vals
            return df
        head0 = rhs.split(None, 1)[0].upper() if rhs.strip() else ""
        if head0 in ("CREATE", "INSERT", "UPDATE", "UPSERT", "DELETE",
                     "RELATE") and self._stmts is not None:
            # DML in expression position (RETURN CREATE ... in function
            # bodies): statement-runner eval, ONLY unwraps
            hide = getattr(self, "_dml_hide", ())
            return self._stmts._scalar_text(
                rhs, {k: v for k, v in bindings.items() if k not in hide})
        if rhs.startswith("$") and rhs[1:].isidentifier():
            return bindings[rhs[1:]]
        try:
            return int(rhs)
        except ValueError:
            pass
        try:
            return float(rhs)
        except ValueError:
            pass
        if (rhs.startswith("'") or rhs.startswith('"')) and rhs[-1] == rhs[0]:
            return rhs[1:-1]
        # general SurrealQL expression ([1,2], $a + $b, fn calls, ...)
        return self._eval_expr(rhs, bindings)

    @staticmethod
    def _statements(script: str) -> list[str]:
        """Split on top-level `;` — parens AND braces nest (IF/FOR blocks
        carry whole statement lists), and worded `IF..THEN..END` chains
        hold their interior `;` (syn/parser/stmt/if.rs: branch bodies eat
        an optional trailing `;` before ELSE/END)."""
        out, depth, cur = [], 0, []
        ifdepth = 0  # open worded-IF chains awaiting END
        i, n = 0, len(script)
        prev_word = ""
        while i < n:
            ch = script[i]
            if ch in "'\"":
                q = ch
                cur.append(ch)
                i += 1
                while i < n:
                    cur.append(script[i])
                    if script[i] == "\\" and i + 1 < n:
                        cur.append(script[i + 1])
                        i += 2
                        continue
                    if script[i] == q:
                        i += 1
                        break
                    i += 1
                continue
            if ch.isalpha() or ch == "_":
                j = i
                while j < n and (script[j].isalnum() or script[j] == "_"):
                    j += 1
                w = script[i:j].upper()
                if depth == 0:
                    if w == "THEN" and prev_word != "ELSE":
                        # a THEN opens/continues a worded chain only when
                        # its IF was seen; track via pending scan below
                        pass
                    if w == "IF" and prev_word != "ELSE":
                        # lookahead: worded chains have THEN before any
                        # top-level '{'; DEFINE's IF [NOT] EXISTS has
                        # neither — only count IFs that will see a THEN
                        k2, d2 = j, 0
                        worded = False
                        while k2 < n:
                            c2 = script[k2]
                            if c2 in "'\"":
                                q2 = c2
                                k2 += 1
                                while k2 < n and script[k2] != q2:
                                    k2 += 2 if script[k2] == "\\" else 1
                            elif c2 in "([{":
                                if c2 == "{" and d2 == 0:
                                    break  # bracketed form
                                d2 += 1
                            elif c2 in ")]}":
                                d2 -= 1
                            elif d2 == 0 and (c2.isalpha() or c2 == "_"):
                                j2 = k2
                                while j2 < n and (script[j2].isalnum()
                                                  or script[j2] == "_"):
                                    j2 += 1
                                w2 = script[k2:j2].upper()
                                if w2 == "THEN":
                                    worded = True
                                    break
                                if w2 in ("END", "IF") or c2 == ";":
                                    break
                                k2 = j2 - 1
                            elif c2 == ";" and d2 == 0:
                                break
                            k2 += 1
                        if worded:
                            ifdepth += 1
                    elif w == "END" and ifdepth > 0:
                        ifdepth -= 1
                    prev_word = w
                cur.append(script[i:j])
                i = j
                continue
            if ch in "({":
                depth += 1
            elif ch in ")}":
                depth -= 1
            if ch == ";" and depth == 0 and ifdepth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
            i += 1
        if "".join(cur).strip():
            out.append("".join(cur).strip())
        return out


def _split_worded_if(stmt: str):
    """Parse `IF cond THEN body (ELSE IF cond THEN body)* (ELSE body)? END`
    into ([(cond, body), ...], else_body|None); None when the statement is
    the bracketed form (a `{` opens the first branch before any THEN).

    Mirrors syn/parser/stmt/if.rs parse_worded_tail: a SINGLE END closes
    the whole ELSE-IF chain, each body eats one optional trailing `;`.
    Nested worded IFs inside bodies are tracked so their ENDs don't close
    the outer chain.
    """
    # tokenize: words + single chars at top level, strings opaque
    toks: list[tuple[str, int, int]] = []  # (WORD-or-char, start, end)
    i, n = 0, len(stmt)
    depth = 0
    while i < n:
        ch = stmt[i]
        if ch in "'\"":
            q, j = ch, i + 1
            while j < n:
                if stmt[j] == "\\":
                    j += 2
                    continue
                if stmt[j] == q:
                    break
                j += 1
            i = j + 1
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (stmt[j].isalnum() or stmt[j] == "_"):
                j += 1
            if depth == 0:
                toks.append((stmt[i:j].upper(), i, j))
            i = j
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        i += 1
    if not toks or toks[0][0] != "IF":
        return None
    # bracketed form? find the first top-level '{' before the first THEN
    first_then = next((t for t in toks if t[0] == "THEN"), None)
    if first_then is None:
        return None
    brace = stmt.find("{")
    # (a '{' inside the condition would be at depth>0 via parens; a bare
    # top-level '{' before THEN means the bracketed form)
    if 0 <= brace < first_then[1] and _at_top_level(stmt, brace):
        return None

    branches: list[tuple[str, str]] = []
    els: str | None = None
    k = 0  # token index; toks[0] == IF
    inner = 0

    def _seg(a: int, b: int) -> str:
        s = stmt[a:b].strip()
        return s[:-1].rstrip() if s.endswith(";") else s

    # outer chain walk
    assert toks[k][0] == "IF"
    cond_start = toks[k][2]
    k += 1
    state = "cond"
    body_start = -1
    prev = "IF"
    while k < len(toks):
        w, s0, s1 = toks[k]
        if state == "cond":
            if w == "THEN" and inner == 0:
                branches.append((stmt[cond_start:s0], ""))
                body_start = s1
                state = "body"
        elif state in ("body", "else"):
            if w == "IF" and prev != "ELSE":
                inner += 1
            elif w == "END":
                if inner > 0:
                    inner -= 1
                else:
                    seg = _seg(body_start, s0)
                    if state == "body":
                        branches[-1] = (branches[-1][0], seg)
                    else:
                        els = seg
                    return branches, els
            elif w == "ELSE" and inner == 0 and state == "body":
                branches[-1] = (branches[-1][0], _seg(body_start, s0))
                if k + 1 < len(toks) and toks[k + 1][0] == "IF":
                    k += 2
                    cond_start = toks[k - 1][2]
                    state = "cond"
                    prev = "IF"
                    continue
                body_start = s1
                state = "else"
        prev = w
        k += 1
    raise ValueError(f"worded IF without END: {stmt[:60]!r}")


def _outer_parens(s: str) -> bool:
    """True when s is one `( ... )` group — the opening paren closes at
    the final character (strings opaque)."""
    depth, i, n = 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"":
            q, i = ch, i + 1
            while i < n and s[i] != q:
                i += 2 if s[i] == "\\" else 1
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
            if depth == 0:
                return i == n - 1
        i += 1
    return False


def _at_top_level(s: str, pos: int) -> bool:
    """True when s[pos] sits outside parens/brackets/strings."""
    depth, i = 0, 0
    while i < pos:
        ch = s[i]
        if ch in "'\"":
            q, i = ch, i + 1
            while i < pos and s[i] != q:
                i += 2 if s[i] == "\\" else 1
            i += 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        i += 1
    return depth == 0


def _split_block(s: str) -> tuple[str, str, str]:
    """Split `head { block } rest` at the first brace pair OUTSIDE
    parens/brackets (a `({ BREAK })` in the head is an expression block,
    not the statement body — control_flow/loop corpus)."""
    i = -1
    pd = 0
    for k, ch in enumerate(s):
        if ch in "([":
            pd += 1
        elif ch in ")]":
            pd -= 1
        elif ch == "{" and pd == 0:
            i = k
            break
    if i < 0:
        raise ValueError(f"expected '{{' in {s[:40]!r}")
    depth, j = 0, i
    for j in range(i, len(s)):
        if s[j] == "{":
            depth += 1
        elif s[j] == "}":
            depth -= 1
            if depth == 0:
                break
    if depth != 0:
        raise ValueError("unbalanced braces in block")
    return s[:i], s[i + 1:j], s[j + 1:]


def _truthy(v) -> bool:
    """SurrealQL truthiness: non-false, non-zero, non-empty, non-null
    (val/value.rs is_truthy)."""
    if v is None or v is False:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, (str, list, tuple, dict)):
        return len(v) > 0
    return True
