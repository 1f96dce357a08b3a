"""Driver-side scalar evaluator for variant (mixed-type) expressions.

Spark columns are statically typed, so literal-only expressions over
heterogeneous values — `array::slice([1, 2, "text"], 1)`, objects holding
closures, CBOR round-trips — cannot always be expressed as one typed
Column.  The reference evaluates such scalar statements on a single Value
tree (core/src/expr/expression.rs); this module is the equivalent: a small
interpreter over the same parser AST, used ONLY as the fallback when the
Spark compile/analyze path fails.  Table-scale evaluation always stays on
DataFrames — nothing here touches a DataFrame.

Value model mirrors golden._norm's normalized shapes so both evaluation
paths compare identically: dict objects, list arrays, SetVal (a list
subclass) for sets, {'months','nanos'} dicts for durations, datetime,
bytes, Decimal / int / float numbers, strings for record ids.

Cross-type total order: types/src/value/mod.rs:126-210 (tag order
None < Bool < Number < String < Duration < Datetime < Uuid < Array < Set
< Object < Bytes < RecordId ...).
"""

from __future__ import annotations

import datetime as _dt
import math as _math
import re as _re
from decimal import Decimal

from surrealdb_spark.sql.parser import parse_expr


class Unfoldable(Exception):
    """Raised when an AST node / function has no driver-side evaluation."""


class EvalError(Exception):
    """A genuine SurrealQL runtime error (type check, range, ...)."""


class BreakSignal(Exception):
    """`{ BREAK }` evaluated inside an expression — unwinds to the
    enclosing FOR loop (expr/statements/break.rs ControlFlow)."""


class ContinueSignal(Exception):
    """`{ CONTINUE }` evaluated inside an expression."""


class SetVal(list):
    """A set value: sorted, deduplicated list with its own type tag."""


class RegexVal:
    __slots__ = ("pattern",)

    def __init__(self, pattern: str):
        self.pattern = pattern

    def __eq__(self, other):
        return isinstance(other, RegexVal) and self.pattern == other.pattern

    def __repr__(self):
        return f"/{self.pattern}/"


class PyClosure:
    __slots__ = ("names", "body", "env", "kinds", "ret")

    def __init__(self, names, body, env, kinds=None, ret=None):
        self.names, self.body, self.env = list(names), body, dict(env)
        self.kinds, self.ret = kinds, ret

    def __call__(self, *args):
        env = dict(self.env)
        if self.kinds:
            # declared param kinds reject cross-kind args
            # (expr/closure.rs; closure/basic.surql `|$arg: string|`)
            from surrealdb_spark.sql.compiler import _kind_accepts

            for i, n in enumerate(self.names):
                k = self.kinds[i] if i < len(self.kinds) else None
                if k is not None and _kind_accepts(
                        k, typeof(args[i] if i < len(args) else None)
                ) is False:
                    raise EvalError(
                        "Incorrect arguments for function ANONYMOUS(): "
                        f"argument ${n} expects {k!r}")
        for i, n in enumerate(self.names):
            env[n] = args[i] if i < len(args) else None
        try:
            out = peval(self.body, env)
        except (BreakSignal, ContinueSignal):
            # closures are function boundaries: control flow cannot cross
            # them (statements/for/break_in_closure.surql)
            raise EvalError("Break/Continue inside a closure")
        if self.ret is not None:
            from surrealdb_spark.sql.compiler import _kind_accepts

            if _kind_accepts(self.ret, typeof(out)) is False:
                raise EvalError(
                    "Couldn't coerce return value from function ANONYMOUS")
        return out


# u64 seconds + u32 nanos ceiling (val/duration.rs; constant.rs DurationMax)
DUR_MAX_NANOS = 18446744073709551615 * 10 ** 9 + 999_999_999


def is_duration(v) -> bool:
    return isinstance(v, dict) and set(v) == {"months", "nanos"}


_TAGS = [
    (type(None), 0), (bool, 2), ((int, float, Decimal), 3), (str, 4),
    (_dt.datetime, 6), (SetVal, 9), (list, 8), (dict, 10),
    ((bytes, bytearray), 12),
]


_GEO_TYPES = {"Point", "LineString", "Polygon", "MultiPoint",
              "MultiLineString", "MultiPolygon", "GeometryCollection"}
_UUID_RE = __import__("re").compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
    r"-[0-9a-fA-F]{12}$")
_RIDSTR_RE = __import__("re").compile(r"^[A-Za-z_]\w*:(?!//)\S+$")


def _tag(v) -> int:
    """Cross-type total-order rank (types/src/value/mod.rs:156-158:
    None < Null < Bool < Number < String < Duration < Datetime < Uuid
    < Array < Object < Geometry < Bytes < RecordId < File < Range <
    Regex).  Uuids/record ids live in strings here, so shape-classify."""
    if is_duration(v):
        return 5
    if isinstance(v, RegexVal):
        return 16
    if isinstance(v, str):
        if _UUID_RE.match(v):
            return 7
        if _RIDSTR_RE.match(v):
            return 13
        return 4
    if isinstance(v, dict) and not isinstance(v, SetVal):
        if _is_range(v):
            return 17
        if v.get("type") in _GEO_TYPES and ("coordinates" in v
                                            or "geometries" in v):
            return 11
    for ty, t in _TAGS:
        if isinstance(v, ty):
            return t
    raise Unfoldable(f"untaggable {type(v)}")


def order_key(v):
    """Total-order sort key matching the reference's cross-type Ord."""
    t = _tag(v)
    if t == 3:
        return (t, float(v))
    if t == 5:
        return (t, v["months"] * 2630016 * 10**9 + v["nanos"])
    if t in (8, 9):
        return (t, [order_key(x) for x in v])
    if t == 10:
        return (t, sorted((k, order_key(x)) for k, x in v.items()))
    if t == 0:
        return (t, 0)
    if t == 16:
        return (t, v.pattern)  # regex
    if t == 17:
        return (t, (order_key(v["start"]), order_key(v["end"]),
                    v.get("start_incl", True), bool(v.get("end_incl"))))
    if t == 11:
        return (t, render(v))
    return (t, v)


def _cmp(a, b) -> int:
    ka, kb = order_key(a), order_key(b)
    try:
        return -1 if ka < kb else (1 if ka > kb else 0)
    except TypeError:
        sa, sb = repr(ka), repr(kb)
        return -1 if sa < sb else (1 if sa > sb else 0)


def truthy(v) -> bool:
    """Value::is_truthy (val/mod.rs:141-157): bool itself; non-zero
    numbers/durations; non-empty strings/bytes/collections; datetimes,
    uuids, record ids, geometries true; everything else (regex, ranges,
    closures, NONE/NULL) false."""
    if v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, (int, float, Decimal)):
        return v != 0
    if isinstance(v, str):
        return len(v) > 0
    if is_duration(v):
        return v["months"] > 0 or v["nanos"] > 0
    if isinstance(v, (RegexVal, PyClosure)):
        return False
    if _is_range(v):
        return False
    if isinstance(v, (list, dict, bytes, bytearray)):
        return len(v) > 0
    return True  # datetimes, uuids, record ids, geometries


def _num(v, ctx="operation"):
    if isinstance(v, bool) or not isinstance(v, (int, float, Decimal)):
        raise EvalError(f"non-numeric operand in {ctx}: {v!r}")
    return v


def _arith(op: str, a, b):
    """Number arithmetic with the reference's promotion (val/number.rs):
    Decimal wins, then Float, else Int; `+` also concatenates strings and
    arrays like the reference's Value::add."""
    if op == "+":
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        if isinstance(a, SetVal) and isinstance(b, list):
            # set + collection = set union (val/value.rs add on Set)
            out = list(a)
            for x in b:
                if not any(_eq(x, y) for y in out):
                    out.append(x)
            return SetVal(out)
        if isinstance(a, list) and isinstance(b, list):
            return list(a) + list(b)
        if is_duration(a) and is_duration(b):
            out = {"months": a["months"] + b["months"],
                   "nanos": a["nanos"] + b["nanos"]}
            if out["nanos"] > DUR_MAX_NANOS:
                # u64-seconds checked_add overflow (val/duration.rs)
                raise EvalError(
                    f'Failed to compute: "{render(a)} + {render(b)}", as '
                    "the operation results in an arithmetic overflow.")
            return out
    if op in ("+", "-") and isinstance(a, list) != isinstance(b, list):
        # collection ± scalar is a type error (val/value.rs try_add)
        word = "addition" if op == "+" else "subtraction"
        raise EvalError(
            f"Cannot perform {word} with '{render(a)}' and '{render(b)}'")
    if op == "-" and isinstance(a, list) and isinstance(b, list):
        # remove every matching element, order preserved
        out = [x for x in a if not any(_eq(x, y) for y in b)]
        return SetVal(out) if isinstance(a, SetVal) else out
    if op == "-" and is_duration(a) and is_duration(b):
        out = {"months": a["months"] - b["months"],
               "nanos": a["nanos"] - b["nanos"]}
        if out["months"] < 0 or out["nanos"] < 0:
            # durations are unsigned (val/duration.rs checked_sub)
            raise EvalError("Failed to compute: the operation results in "
                            "a negative duration")
        return out
    if op in ("*", "/") and is_duration(a) and not is_duration(b) \
            and isinstance(b, (int, float, Decimal)) \
            and not isinstance(b, bool):
        # duration × / ÷ scalar (val/duration.rs checked_mul/div)
        total = a["nanos"] + a["months"] * 2_630_016 * 10 ** 9
        if op == "*":
            out_n = int(total * b) if not isinstance(b, int) else total * b
        else:
            if b == 0:
                raise EvalError("division by zero")
            out_n = int(total / float(b)) if not isinstance(b, int) \
                else total // b
        if out_n > DUR_MAX_NANOS or out_n < 0:
            raise EvalError(
                f'Failed to compute: "{render(a)} {op} {render(b)}", as '
                "the operation results in an arithmetic overflow.")
        return {"months": 0, "nanos": out_n}
    a, b = _num(a, op), _num(b, op)
    dec = isinstance(a, Decimal) or isinstance(b, Decimal)
    if dec:
        a, b = Decimal(str(a)), Decimal(str(b))
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "%":
        if b == 0:
            raise EvalError("remainder by zero")
        return _math.fmod(a, b) if isinstance(a, float) or isinstance(
            b, float) else a - (int(a / b) if (a < 0) != (b < 0) else a // b) * b
    if op == "/":
        # try_float_div (number.rs:908-920): Int/Int yields Float when
        # fractional, Int otherwise; division by int zero errors
        if isinstance(a, int) and isinstance(b, int) and not dec:
            if b == 0:
                raise EvalError("division by zero")
            q = a / b
            return q if q != int(q) else a // b if (a < 0) == (b < 0) \
                else -((-a) // b) if a % b == 0 else q
        if dec:
            if b == 0:
                raise EvalError("division by zero")
            return a / b
        try:
            return a / b
        except ZeroDivisionError:
            return _math.nan if a == 0 else _math.copysign(_math.inf, a)
    if op == "**":
        return a ** b
    raise Unfoldable(op)


def _contains(a, b) -> bool:
    if isinstance(a, (list, SetVal)):
        return any(_cmp(x, b) == 0 for x in a)
    if isinstance(a, str) and isinstance(b, str):
        return b in a
    if isinstance(a, dict):
        return isinstance(b, str) and b in a
    return False


def _eq(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, RegexVal) and isinstance(b, str):
        return _re.search(a.pattern, b) is not None
    if isinstance(b, RegexVal) and isinstance(a, str):
        return _re.fullmatch(b.pattern, a) is not None
    if isinstance(a, (int, float, Decimal)) and isinstance(
            b, (int, float, Decimal)):
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    return a == b


def _binop(op: str, a, b):
    if op in ("=", "=="):
        return _eq(a, b)
    if op == "!=":
        return not _eq(a, b)
    if op in ("<", "<=", ">", ">="):
        c = _cmp(a, b)
        return {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[op]
    if op in ("+", "-", "*", "/", "%", "**"):
        return _arith(op, a, b)
    if op in ("AND", "&&"):
        return b if truthy(a) else a
    if op in ("OR", "||"):
        return a if truthy(a) else b
    if op == "??":
        return a if a is not None else b
    if op == "?:":
        return a if truthy(a) else b
    if op in ("IN", "INSIDE"):
        return _contains(b, a)
    if op == "NOTINSIDE":
        return not _contains(b, a)
    if op == "CONTAINS":
        return _contains(a, b)
    if op == "CONTAINSNOT":
        return not _contains(a, b)
    if op == "CONTAINSALL":
        return all(_contains(a, x) for x in b)
    if op == "CONTAINSANY":
        return any(_contains(a, x) for x in b)
    if op == "CONTAINSNONE":
        return not any(_contains(a, x) for x in b)
    if op == "ALLINSIDE":
        return all(_contains(b, x) for x in a)
    if op == "ANYINSIDE":
        return any(_contains(b, x) for x in a)
    if op == "NONEINSIDE":
        return not any(_contains(b, x) for x in a)
    if op == "*=":
        return isinstance(a, list) and all(_eq(x, b) for x in a)
    if op == "?=":
        return isinstance(a, list) and any(_eq(x, b) for x in a)
    if op in ("..", "..=", ">..", ">..="):
        # matches expr/operators.range_struct field names
        return {"start": a, "end": b,
                "start_incl": not op.startswith(">"),
                "end_incl": op.endswith("=")}
    raise Unfoldable(f"binop {op}")


def _is_range(v) -> bool:
    return isinstance(v, dict) and set(v) == {"start", "end", "start_incl",
                                              "end_incl"}


def _range_list(v) -> list:
    if not (_is_range(v) and isinstance(v.get("start"), int)
            and isinstance(v.get("end"), int)):
        raise EvalError("range bounds must be integers")
    lo = v["start"] + (0 if v["start_incl"] else 1)
    hi = v["end"] + (1 if v["end_incl"] else 0)
    if hi - lo > 1_048_576:
        raise EvalError("range output too large")
    return list(range(lo, hi))


def _fn_search_rrf(results, limit, k=60):
    """search::rrf over literal result arrays (fnc/search.rs rrf):
    score = Σ 1/(k + rank + 1) per id, merged objects, top-limit desc."""
    if isinstance(limit, bool) or not isinstance(limit, int) or limit < 1:
        raise EvalError("Incorrect arguments for function search::rrf(). "
                        "limit must be at least 1")
    if k is None:
        k = 60
    if isinstance(k, bool) or not isinstance(k, (int, float, Decimal)) \
            or k < 0:
        raise EvalError("Incorrect arguments for function search::rrf(). "
                        "RRF constant must be at least 0")
    if not isinstance(results, list) or not results:
        return []
    docs: dict = {}
    for lst in results:
        if not isinstance(lst, list):
            continue
        for rank, doc in enumerate(lst):
            if not isinstance(doc, dict) or "id" not in doc:
                continue
            rid = doc["id"]
            obj = {kk: vv for kk, vv in doc.items() if kk != "id"}
            contrib = 1.0 / (float(k) + rank + 1)
            if rid in docs:
                docs[rid][0] += contrib
                docs[rid][1].append(obj)
            else:
                docs[rid] = [contrib, [obj]]
    top = sorted(docs.items(), key=lambda kv: -kv[1][0])[:limit]
    out = []
    for rid, (score, objs) in top:
        merged: dict = {}
        for o in objs:
            merged.update(o)
        merged["id"] = rid
        merged["rrf_score"] = score
        out.append(merged)
    return out


def _fn_search_linear(results, weights, limit, norm):
    """search::linear over literal result arrays (fnc/search.rs linear):
    per-list score extraction (distance→1/(1+d), ft_score, score),
    minmax/zscore normalization, weighted sum, top-limit desc."""
    _nm = "Incorrect arguments for function search::linear(). "
    if isinstance(limit, bool) or not isinstance(limit, int) or limit < 1:
        raise EvalError(_nm + "Limit must be at least 1")
    results = results if isinstance(results, list) else []
    weights = weights if isinstance(weights, list) else []
    if len(weights) != len(results):
        raise EvalError(_nm + "The results and the weights array should "
                        "have the same length")
    for i, w in enumerate(weights):
        if isinstance(w, bool) or not isinstance(w, (int, float, Decimal)):
            raise EvalError(_nm + f"Weight at index {i} must be a number")
    if norm not in ("minmax", "zscore"):
        raise EvalError(_nm + "Norm must be 'minmax' or 'zscore'")
    if not results:
        return []
    n_lists = len(results)
    docs: dict = {}
    count = 0
    for li, lst in enumerate(results):
        if not isinstance(lst, list):
            continue
        for doc in lst:
            if not isinstance(doc, dict) or "id" not in doc:
                count += 1
                continue
            rid = doc["id"]
            obj = {kk: vv for kk, vv in doc.items() if kk != "id"}
            if isinstance(obj.get("distance"),
                          (int, float, Decimal)) \
                    and not isinstance(obj.get("distance"), bool):
                s = 1.0 / (1.0 + float(obj["distance"]))
            elif isinstance(obj.get("ft_score"), (int, float, Decimal)) \
                    and not isinstance(obj.get("ft_score"), bool):
                s = float(obj["ft_score"])
            elif isinstance(obj.get("score"), (int, float, Decimal)) \
                    and not isinstance(obj.get("score"), bool):
                s = float(obj["score"])
            else:
                s = 1.0 / (1.0 + count)
            if rid in docs:
                docs[rid][0][li] = s
                docs[rid][1].append(obj)
            else:
                scores = [0.0] * n_lists
                scores[li] = s
                docs[rid] = [scores, [obj]]
            count += 1
    # per-list normalization params over positive scores
    params = []
    for li in range(n_lists):
        vals = [sc[li] for sc, _ in docs.values() if sc[li] > 0.0]
        if not vals:
            params.append((0.0, 1.0))
        elif norm == "minmax":
            lo, hi = min(vals), max(vals)
            params.append((lo, (hi - lo) if hi > lo else 1.0))
        else:
            mean = sum(vals) / len(vals)
            var = sum((x - mean) ** 2 for x in vals) / len(vals)
            sd = var ** 0.5
            params.append((mean, sd if sd > 0 else 1.0))
    scored = []
    for rid, (scores, objs) in docs.items():
        total = 0.0
        for li, s in enumerate(scores):
            if s > 0.0:
                w = weights[li] if li < len(weights) else 1.0
                a, b = params[li]
                total += float(w) * ((s - a) / b)
        scored.append((total, rid, objs))
    scored.sort(key=lambda t: -t[0])
    out = []
    for score, rid, objs in scored[:limit]:
        merged: dict = {}
        for o in objs:
            merged.update(o)
        merged["id"] = rid
        merged["linear_score"] = score
        out.append(merged)
    return out


def _arg_type_err(fn: str, v):
    raise EvalError(
        f"Incorrect arguments for function {fn}(). Argument 1 was the "
        f"wrong type. Expected `array` but found `{render(v)}`")


def _index(base, i):
    if isinstance(base, (list, SetVal)):
        if _is_range(i):
            # array[range] slices (part.rs Part::Value over Range)
            lo = i["start"] + (0 if i.get("start_incl", True) else 1)
            hi = i["end"] + (1 if i.get("end_incl") else 0)
            return list(base[int(lo):int(hi)])
        if not isinstance(i, int):
            raise EvalError(f"non-integer index {i!r}")
        if -len(base) <= i < len(base):
            return base[i]
        return None
    if isinstance(base, dict):
        return base.get(i)
    # strings are not indexable values (part.rs Index over non-array)
    return None


def _walk_path(base, parts, env):
    # idiom continuity (expr/idiom.rs): once a part MAPS over an array
    # (`.field` / `.*` over elements), later index/slice parts apply
    # PER ELEMENT until a whole-list part (first/last/paren) resets —
    # `[{a:[..]},..].a[0]` picks each element's [0], while
    # `([..].a)[0]` indexes the outer list (idiom/continuity.surql)
    mapped = False
    for p in parts:
        kind = p[0]
        if base is None:
            # index/slice expressions still evaluate (their control-flow
            # and errors fire even on NONE bases — break_within_indexing)
            if kind in ("index", "iexpr") and isinstance(p[1], tuple):
                peval(p[1], env)
            return None
        if kind == "field":
            if isinstance(base, str) and _is_ridish(base):
                # record-id receiver: deref the record, then pick the
                # field (value/idiom.rs over Thing values)
                from surrealdb_spark.functions.misc_fns import (
                    _lookup_record)

                rec = _lookup_record(base)
                base = rec.get(p[1]) if isinstance(rec, dict) else None
                continue
            if isinstance(base, list):
                # record-id elements deref to pick the field — batched
                # through ONE isin-filter per table, not a point read
                # per element (value/idiom.rs Field over Thing)
                rid_elems = [x for x in base
                             if isinstance(x, str) and _is_ridish(x)]
                recs: dict = {}
                if rid_elems:
                    from surrealdb_spark.functions.misc_fns import (
                        _lookup_records)

                    recs = _lookup_records(rid_elems)

                def _fget(x, f=p[1]):
                    if hasattr(x, "asDict"):  # collected Spark Row
                        x = x.asDict(recursive=True)
                    if isinstance(x, str) and _is_ridish(x):
                        rec = recs.get(x)
                        return rec.get(f) if isinstance(rec, dict) else None
                    return _index(x, f)
                base = [_fget(x) for x in base]
                mapped = True
            elif isinstance(base, dict):
                base = base.get(p[1])
            else:
                return None
        elif kind == "index":
            idx = p[1] if isinstance(p[1], int) else peval(p[1], env)
            if mapped and isinstance(base, list):
                base = [_index(x, idx) for x in base]
                continue
            if isinstance(base, str) and _is_ridish(base):
                # index on a record id indexes its parsed KEY — only
                # array keys index; scalar keys give NONE
                from surrealdb_spark.values import parse_rid_key

                k = parse_rid_key(base)
                base = _index(k, idx) if isinstance(k, list) else None
                continue
            base = _index(base, idx)
            mapped = False
        elif kind == "iexpr":
            if mapped and isinstance(base, list):
                base = [_index(x, peval(p[1], env)) for x in base]
            else:
                base = _index(base, peval(p[1], env))
                mapped = False
        elif kind == "all":
            if isinstance(base, list):
                # `.*` over an array maps; record-id elements deref to
                # their full records (a:1->edge.out.* — value/idiom.rs
                # All over Thing values)
                if any(isinstance(x, str) and _is_ridish(x)
                       for x in base):
                    from surrealdb_spark.functions.misc_fns import (
                        _lookup_records)

                    recs = _lookup_records(
                        [x for x in base
                         if isinstance(x, str) and _is_ridish(x)])
                    base = [(recs.get(x) or x)
                            if isinstance(x, str) and _is_ridish(x)
                            else x for x in base]
                mapped = True
                continue
            if isinstance(base, str) and _is_ridish(base):
                # `rid.*` derefs the whole record (value/idiom.rs over
                # Thing — RETURN $obj.{ one: one.* })
                from surrealdb_spark.functions.misc_fns import (
                    _lookup_record)

                rec = _lookup_record(base)
                base = rec if rec is not None else base
            elif not isinstance(base, list):
                base = [base]
        elif kind == "flatten":
            if isinstance(base, list):
                out = []
                for x in base:
                    out.extend(x if isinstance(x, list) else [x])
                base = out
        elif kind == "first":
            base = base[0] if isinstance(base, list) and base else None
            mapped = False
        elif kind == "last":
            base = base[-1] if isinstance(base, list) and base else None
            mapped = False
        elif kind == "where":
            if isinstance(base, list):
                base = [x for x in base
                        if truthy(peval(p[1], {**env, "this": x}))]
        elif kind == "optional":
            if base is None:
                return None
        elif kind == "slice":
            if len(p) == 2:
                # `[lo..hi]` range-expression form: evaluate the range
                # value ({'start','end',incl flags})
                rng = peval(p[1], env)
                lo = rng.get("start") if isinstance(rng, dict) else None
                hi = rng.get("end") if isinstance(rng, dict) else None
                if hi is not None and isinstance(rng, dict) \
                        and rng.get("end_incl"):
                    hi += 1
                if lo is not None and isinstance(rng, dict) \
                        and not rng.get("start_incl", True):
                    lo += 1
            else:
                lo = peval(p[1], env) if p[1] is not None else None
                hi = peval(p[2], env) if p[2] is not None else None
            if mapped and isinstance(base, list):
                base = [x[lo:hi] if isinstance(x, (list, str)) else x
                        for x in base]
            elif isinstance(base, (list, str)):
                base = base[lo:hi]
        elif kind == "destructure":
            def _destr(obj):
                out = {}
                for k, sub in p[1]:
                    if sub and sub[0][0] == "aliased":
                        # aliased member: the expression evaluates with
                        # the object's fields in scope ($this = object)
                        out[k] = peval(sub[0][1], {**env, "this": obj})
                    elif sub:
                        out[k] = _walk_path(obj, sub, env)
                    else:
                        out[k] = obj.get(k)
                return out

            if isinstance(base, dict):
                base = _destr(base)
            elif isinstance(base, list) and all(
                    isinstance(x, dict) for x in base):
                # destructure maps over arrays of objects (part.rs)
                base = [_destr(x) for x in base]
            else:
                raise Unfoldable("destructure on non-object")
        elif kind == "method":
            base = _call_method(p[1], base, p[2], env)
        else:
            raise Unfoldable(f"path part {kind}")
    return base


def peval(ast, env: dict | None = None):
    """Evaluate a parser AST to a Python value; Unfoldable when the node
    needs the Spark engine (table access, aggregates, ...)."""
    env = env or {}
    if not isinstance(ast, tuple):
        raise Unfoldable(f"node {ast!r}")
    kind = ast[0]
    if kind == "lit":
        return ast[1]
    if kind == "nulllit":
        return None
    if kind == "wsub":
        # writable subquery `(UPSERT ...)` — executes ONCE through the
        # registered statement runner (exec/planner.rs:309-336)
        if _WSUB_RUNNER is None:
            raise Unfoldable("writable subquery without a runner")
        return _WSUB_RUNNER(ast[1], env)
    if kind == "dur":
        n = ast[1]
        if isinstance(n, tuple):
            return {"months": n[0], "nanos": n[1]}
        return {"months": 0, "nanos": n}
    if kind == "ulit":
        return ast[1]
    if kind == "regex":
        return RegexVal(ast[1])
    if kind == "array":
        return [peval(x, env) for x in ast[1]]
    if kind == "setlit":
        return _mkset([peval(x, env) for x in ast[1]])
    if kind == "object":
        return {k: peval(v, env) for k, v in ast[1]}
    if kind == "param":
        name = ast[1]
        if name in env:
            return env[name]
        if name in ("this", "parent", "input", "value", "before", "after"):
            raise Unfoldable(f"contextual param ${name}")
        return None  # unbound params are NONE
    if kind == "bin":
        op = ast[1]
        if op in ("AND", "&&"):
            a = peval(ast[2], env)
            return peval(ast[3], env) if truthy(a) else a
        if op in ("OR", "||"):
            a = peval(ast[2], env)
            return a if truthy(a) else peval(ast[3], env)
        if op == "??":
            a = peval(ast[2], env)
            return a if a is not None else peval(ast[3], env)
        return _binop(op, peval(ast[2], env), peval(ast[3], env))
    if kind == "un":
        v = peval(ast[2], env)
        if ast[1] == "!":
            return not truthy(v)
        if ast[1] == "-":
            return -_num(v, "negation")
        return v
    if kind in ("paren", "block1"):
        return peval(ast[1], env)
    if kind == "path":
        return _walk_path(peval(ast[1], env), ast[2], env)
    if kind == "closure":
        return PyClosure(ast[1], ast[2], env)
    if kind == "pcall":
        f = env.get(ast[1])
        args = [peval(a, env) for a in ast[2]]
        if isinstance(f, PyClosure):
            return f(*args)
        if hasattr(f, "body"):  # engine ClosureValue — honor declared kinds
            from surrealdb_spark.sql.compiler import _kind_accepts

            for i, pname in enumerate(f.names):
                k = f.kinds[i] if i < len(f.kinds) else None
                if k is not None and _kind_accepts(
                        k, typeof(args[i] if i < len(args) else None)
                ) is False:
                    raise EvalError(
                        "Incorrect arguments for function ANONYMOUS(): "
                        f"argument ${pname} expects {k!r}")
            out = PyClosure(f.names, f.body, {**env, **f.captured})(*args)
            if f.ret is not None and _kind_accepts(
                    f.ret, typeof(out)) is False:
                raise EvalError(
                    "Couldn't coerce return value from function ANONYMOUS")
            return out
        raise EvalError(f"${ast[1]} is not a function")
    if kind == "ccall":
        f = peval(ast[1], env)
        if not isinstance(f, PyClosure):
            raise EvalError("call target is not a closure")
        return f(*[peval(a, env) for a in ast[2]])
    if kind == "method":
        recv_ast = ast[2]
        if isinstance(recv_ast, tuple) and recv_ast[0] == "path":
            rv = peval(recv_ast, env)
            if rv is None and recv_ast[2] \
                    and recv_ast[2][-1] == ("optional",):
                # `x.?.method()` — NONE short-circuits the method too
                # (part.rs Optional; idiom/chain_part_optional.surql)
                return None
            if (isinstance(rv, list) and rv
                    and all(isinstance(x, list) for x in rv)
                    and any(p[0] == "all" for p in recv_ast[2])):
                # mapped context continuity: after `.*`, a method over
                # array ELEMENTS applies per element
                # (idiom/array_range.surql `.*[0..1].min()`)
                return [_call_method(ast[1], x, ast[3], env) for x in rv]
            return _call_method(ast[1], rv, ast[3], env)
        return _call_method(ast[1], peval(ast[2], env), ast[3], env)
    if kind == "call":
        return _call(ast[1], ast[2], env)
    if kind == "cast":
        return _cast(ast[1], peval(ast[2], env))
    if kind == "ctrl":
        raise BreakSignal() if ast[1] == "break" else ContinueSignal()
    if kind == "mockv":
        from surrealdb_spark.sql.compiler import _mock_ids

        if ast[2][0] == "count":
            raise Unfoldable("count-form mock")
        try:
            return [f"{ast[1]}:{k}" for k in _mock_ids(ast[2])]
        except ValueError as exc:
            raise EvalError(str(exc))
    if kind == "geom_point":
        return {"type": "Point",
                "coordinates": [peval(ast[1], env), peval(ast[2], env)]}
    if kind == "ident":
        # inside a destructure member the current object's fields are in
        # scope (part.rs DestructurePart::Aliased evaluation context)
        this = env.get("this")
        if isinstance(this, dict) and ast[1] in this:
            return this[ast[1]]
        if ast[1].lower() == "duration::max":
            # DurationMax (constant.rs:32) — u64 seconds + u32 nanos max;
            # python ints keep the exact value (beyond_max.surql)
            return {"months": 0, "nanos": DUR_MAX_NANOS}
        return None  # scalar context: bare idents are NONE (no row)
    if kind == "ifexpr":
        for cond, then in ast[1]:
            if truthy(peval(cond, env)):
                return peval(then, env)
        return peval(ast[2], env) if ast[2] is not None else None
    if kind == "subquery":
        return eval_select(ast[1], env)
    raise Unfoldable(f"node kind {kind}")


def eval_select(sel, env: dict | None = None):
    """Driver-side SELECT over literal (non-table) sources — covers the
    nested `$parent`-correlated shapes one grouped join can't decorrelate
    (exec/operators/current_value_source.rs evaluates the inner plan per
    outer row; here every source is a literal, so the per-row walk is a
    bounded driver loop, never a distributed scan).  Raises Unfoldable
    when any clause or source needs the Spark engine."""
    env = dict(env or {})
    if (sel.group is not None or sel.split or sel.fetch or sel.explain
            or sel.version is not None or sel.omit or sel.order):
        raise Unfoldable("select clause needs the engine")
    docs: list = []
    for src in sel.sources:
        if not isinstance(src, tuple):
            raise Unfoldable(f"table source {src!r}")
        if src[0] == "exprsrc":
            src = src[1]
        v = peval(src, env)
        if _is_range(v):
            v = _range_list(v)
        if isinstance(v, list):
            docs.extend(v)
        else:
            docs.append(v)
    out: list = []
    for doc in docs:
        denv = dict(env)
        denv["parent"] = env.get("this")
        denv["this"] = doc
        if sel.where is not None and not truthy(peval(sel.where, denv)):
            continue
        if sel.value_expr is not None:
            out.append(peval(sel.value_expr, denv))
        elif sel.fields:
            extras: dict = {}
            for f in sel.fields:
                if f.alias:
                    name = f.alias
                elif isinstance(f.expr, tuple) and f.expr[0] == "ident":
                    name = f.expr[1]
                else:
                    raise Unfoldable("unnamed projection")
                extras[name] = peval(f.expr, denv)
            if sel.star:
                if not isinstance(doc, dict):
                    raise Unfoldable("star over non-object row")
                out.append({**doc, **extras})
            else:
                out.append(extras)
        else:
            out.append(doc)
    if sel.start:
        out = out[sel.start:]
    if sel.limit is not None:
        out = out[:sel.limit]
    if sel.only:
        if len(out) > 1:
            raise EvalError("Expected a single result output when using "
                            "the ONLY keyword")
        return out[0] if out else None
    return out


def _mkset(items: list) -> SetVal:
    out: list = []
    for x in items:
        if not any(_cmp(x, y) == 0 for y in out):
            out.append(x)
    return SetVal(sorted(out, key=order_key))


def _cast(kind_ast, v):
    k = kind_ast[0]
    if k == "array":
        if _is_range(v):
            out = _range_list(v)
        elif isinstance(v, list):
            out = list(v)
        else:
            # scalars don't cast to containers (val/value/cast.rs)
            raise EvalError(
                f"Expected `array` but found `{render(v)}`")
        args = kind_ast[1] if len(kind_ast) > 1 else []
        if len(args) > 1 and args[1][0] == "lit" \
                and len(out) != int(args[1][1]):
            # sized kind `<array<int, 3>>` (types/src/kind.rs
            # Kind::Array(_, Some(n)))
            raise EvalError(
                f"Expected `array<{args[0][0]}, {args[1][1]}>` but the "
                f"value's length is {len(out)}")
        return out
    if k in ("litobj", "litarr"):
        # literal kind cast: the value must structurally coerce
        # (types/src/kind/mod.rs:17-80)
        from surrealdb_spark.sql.compiler import litkind_ok, render_kind

        r = litkind_ok((k, kind_ast[1]), v)
        if r is False:
            raise EvalError(
                f"Expected `{render_kind((k, kind_ast[1]))}` but found "
                f"{render(v)}")
        if r is True:
            return v
        raise Unfoldable("undecidable literal-kind cast")
    if k == "set":
        if _is_range(v):
            return _mkset(_range_list(v))
        if not isinstance(v, list):
            raise EvalError(f"Expected `set` but found `{render(v)}`")
        return _mkset(v)
    if k == "string":
        return render(v)
    if k == "int":
        return int(v)
    if k == "float":
        return float(v)
    if k == "decimal":
        return Decimal(str(v))
    if k == "bool":
        return truthy(v)
    raise Unfoldable(f"cast <{k}>")


def _call_method(name: str, recv, arg_asts, env):
    args = [peval(a, env) if not (isinstance(a, tuple) and a[0] == "closure")
            else PyClosure(a[1], a[2], env) for a in arg_asts]
    if isinstance(recv, dict) and name in recv and isinstance(
            recv[name], PyClosure) and PY_FNS.get(f"object::{name}") is None:
        # closure-valued field invokes as a method — but a BUILTIN
        # object:: function of the same name wins ($obj.keys() lists
        # keys even when `keys` is a closure field; use ($obj.keys)()
        # for the field — idiom/fallback_function.surql)
        return recv[name](*args)
    if name == "type_of":
        return typeof(recv)
    if isinstance(recv, SetVal):
        for ns in ("set", "array"):
            f = PY_FNS.get(f"{ns}::{name}")
            if f:
                return f(recv, *args)
    if isinstance(recv, list):
        f = PY_FNS.get(f"array::{name}")
        if f:
            return f(recv, *args)
    if isinstance(recv, dict):
        f = PY_FNS.get(f"object::{name}")
        if f:
            return f(recv, *args)
    if isinstance(recv, str) and recv.startswith("file:/"):
        # file-pointer methods: f"bkt:/key".put(...) etc. (fnc/file.rs)
        f = PY_FNS.get(f"file::{name}")
        if f:
            return f(recv, *args)
    if isinstance(recv, str):
        f = PY_FNS.get(f"string::{name}")
        if f:
            return f(recv, *args)
    f = PY_FNS.get(f"type::{name}")
    if f:
        return f(recv, *args)
    if isinstance(recv, str) and name in ("id", "tb", "table") \
            and _is_ridish(recv):
        # record-id methods (fnc/record.rs): rid.id() → parsed KEY
        # (int/str/object/array), rid.tb() → table name
        from surrealdb_spark.values import parse_rid_key

        return parse_rid_key(recv) if name == "id" \
            else recv.split(":", 1)[0]
    raise Unfoldable(f"method {name} on {type(recv).__name__}")


def _is_ridish(s: str) -> bool:
    import re as _re

    return bool(_re.match(r"^[A-Za-z_]\w*:.+$", s))


def _call(name: str, arg_asts, env):
    fn = PY_FNS.get(name)
    wrap_set = False
    if fn is None and name.startswith("set::"):
        # set:: shares the array:: algebra with sorted-set output
        # (fnc/set.rs delegates to the same impls)
        fn = PY_FNS.get("array::" + name[5:])
        wrap_set = True
    if fn is None:
        key = name if name.startswith("fn::") else f"fn::{name}"
        if key in SCRIPT_FNS:
            # statement-shaped user function (IF/FOR/THROW/DML body):
            # dispatch to the registered script-engine callable
            return SCRIPT_FNS[key]([peval(a, env) for a in arg_asts])
        if key in USER_FNS:
            # user-defined function: body evaluates in a fresh scope of
            # just its params (define/function.rs), so writable
            # subqueries inside run with driver values
            pnames, lets, body, n_req = USER_FNS[key]
            args = [peval(a, env) for a in arg_asts]
            if not (n_req <= len(args) <= len(pnames)):
                # fnc/mod.rs argument-arity error text
                short_n = key.removeprefix("fn::")
                want = (f"{n_req} to {len(pnames)}"
                        if n_req != len(pnames) else str(len(pnames)))
                raise EvalError(
                    f"Incorrect arguments for function fn::{short_n}()."
                    f" The function expects {want} arguments.")
            fenv = {nm: (args[i2] if i2 < len(args) else None)
                    for i2, nm in enumerate(pnames)}
            for ln, last in lets:
                fenv[ln] = peval(last, fenv)
            try:
                return peval(body, fenv)
            except (BreakSignal, ContinueSignal):
                # function bodies are control-flow boundaries
                # (exec/mod.rs:150-155)
                raise EvalError(
                    "Invalid control flow statement, break or continue "
                    "statement found outside of loop.") from None
    if fn is None:
        raise Unfoldable(f"function {name}")
    args = [peval(a, env) if not (isinstance(a, tuple) and a[0] == "closure")
            else PyClosure(a[1], a[2], env) for a in arg_asts]
    out = fn(*args)
    if wrap_set and isinstance(out, list) and not isinstance(out, SetVal):
        return _mkset(out)
    return out


def render(v) -> str:
    """<string> cast / join stringification (Value Display)."""
    if v is None:
        return "NONE"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return v
    if isinstance(v, (int, Decimal)):
        return str(v)
    if isinstance(v, float):
        return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)
    if is_duration(v):
        return _render_duration(v)
    if isinstance(v, SetVal):
        return "{" + ", ".join(_render_inner(x) for x in v) + "}"
    if isinstance(v, list):
        return "[" + ", ".join(_render_inner(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{ " + ", ".join(f"{k}: {_render_inner(x)}"
                                for k, x in v.items()) + " }"
    return str(v)


def _render_inner(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "\\'") + "'"
    return render(v)


def typeof(v) -> str:
    if v is None:
        return "none"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, str):
        return "string"
    if isinstance(v, SetVal):
        return "set"
    if isinstance(v, list):
        return "array"
    if is_duration(v):
        return "duration"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, _dt.datetime):
        return "datetime"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, RegexVal):
        return "regex"
    if isinstance(v, PyClosure) or hasattr(v, "body"):
        return "function"  # closures (types/src/kind.rs Function)
    return "object"


# -- function registry --------------------------------------------------------


def _arr(v, fname):
    if isinstance(v, list):
        return v
    raise EvalError(f"Incorrect arguments for function {fname}(): "
                    f"expected an array, got {typeof(v)}")


def _f_slice(a, start=None, end=None):
    """fnc/array.rs:742-830 — inclusive/exclusive bound resolution with
    negative offsets counting from the tail."""
    a = _arr(a, "array::slice")
    n = len(a)
    if start is None:
        return list(a)
    inc_start, e_bound, inc_end = True, end, end is not None
    if _is_range(start):
        inc_start = start["start_incl"]
        e_bound = start["end"]
        inc_end = start["end_incl"]
        has_end = e_bound is not None
        start = start["start"] or 0
    else:
        has_end = end is not None
        inc_end = False  # explicit (start, end) args: end exclusive
    start = int(start)
    if inc_start:
        s = max(n + start, 0) if start < 0 else start
    else:
        s = max(n + start + 1, 0) if start < 0 else start + 1
    if s >= n:
        return []
    if not has_end:
        return a[s:]
    e = int(e_bound)
    if inc_end:
        ei = (max(n + e, 0)) if e < 0 else e  # inclusive end index
    else:
        if e < 0:
            ei = n + e - 1
            if ei < s:
                return []
        else:
            if e <= s:
                return []
            ei = e - 1
    if ei < s:
        return []
    return a[s:min(ei + 1, n)]


def _f_reduce(a, f):
    a = _arr(a, "array::reduce")
    if not a:
        return None
    acc = a[0]
    for i, x in enumerate(a[1:]):
        acc = f(acc, x, i)
    return acc


def _f_fold(a, init, f):
    acc = init
    for i, x in enumerate(_arr(a, "array::fold")):
        acc = f(acc, x, i)
    return acc


def _f_transpose(a):
    a = _arr(a, "array::transpose")
    if not a:
        return []
    height = max(len(x) if isinstance(x, list) else 1 for x in a)
    out = [[None] * len(a) for _ in range(height)]
    for idx, row in enumerate(a):
        if isinstance(row, list):
            for jdx, x in enumerate(row):
                out[jdx][idx] = x
        else:
            out[0][idx] = row
    return out


def _f_join(a, sep):
    return str(sep).join(render(x) for x in _arr(a, "array::join"))


_NS_UNITS = [("y", 31_536_000 * 10**9), ("w", 604_800 * 10**9),
             ("d", 86_400 * 10**9), ("h", 3_600 * 10**9),
             ("m", 60 * 10**9), ("s", 10**9), ("ms", 10**6),
             ("µs", 10**3), ("ns", 1)]


def _render_duration(d: dict) -> str:
    """Duration Display (types duration fmt): greedy unit decomposition."""
    n = d["nanos"] + d["months"] * 2_630_016 * 10**9
    if n == 0:
        return "0ns"
    out = []
    for u, size in _NS_UNITS:
        if n >= size:
            out.append(f"{n // size}{u}")
            n %= size
    return "".join(out)


def _f_entries(o):
    if not isinstance(o, dict):
        raise EvalError("object::entries expects an object")
    return [[k, v] for k, v in o.items()]


def _closure_pred(f):
    def p(*args):
        return truthy(f(*args))
    return p


# writable-subquery executor hook (set by StatementRunner) and
# user-function registry: fn::name -> (param_names, lets, body_ast)
_WSUB_RUNNER = None
USER_FNS: dict[str, tuple] = {}
# statement-shaped user functions: name → callable(args) registered by
# the statement runner (bodies with IF/FOR/THROW/DML run via the script
# engine — define/function.rs full-statement bodies)
SCRIPT_FNS: dict[str, object] = {}


def set_wsub_runner(fn) -> None:
    global _WSUB_RUNNER
    _WSUB_RUNNER = fn


PY_FNS = {
    "array::len": lambda a: len(_arr(a, "array::len")),
    "array::at": lambda a, i: _index(_arr(a, "array::at"), int(i)),
    "array::first": lambda a: a[0] if a else None,
    "array::last": lambda a: a[-1] if a else None,
    "array::is_empty": lambda a: len(_arr(a, "array::is_empty")) == 0,
    "array::reverse": lambda a: list(reversed(_arr(a, "array::reverse"))),
    "array::slice": _f_slice,
    "array::concat": lambda *arrs: sum((list(_arr(a, "array::concat"))
                                        for a in arrs), []),
    "array::append": lambda a, v: list(a) + [v],
    "array::push": lambda a, v: list(a) + [v],
    "array::prepend": lambda a, v: [v] + list(a),
    "array::pop": lambda a: a[-1] if a else None,
    "array::add": lambda a, v: _f_add(a, v),
    "array::remove": lambda a, i: [x for j, x in enumerate(a)
                                   if j != (i if i >= 0 else len(a) + i)],
    "array::distinct": lambda a: _dedup(_arr(a, "array::distinct")),
    "array::group": lambda a: _dedup(
        [y for x in a for y in (x if isinstance(x, list) else [x])]),
    "array::flatten": lambda a: [y for x in _arr(a, "array::flatten")
                                 for y in (x if isinstance(x, list) else [x])],
    "array::join": _f_join,
    "array::reduce": _f_reduce,
    "array::fold": _f_fold,
    "array::map": lambda a, f: [f(x, i) for i, x in enumerate(a)],
    "array::filter": lambda a, f: [x for i, x in enumerate(a)
                                   if truthy(f(x, i))],
    "array::filter_index": lambda a, f: [i for i, x in enumerate(a)
                                         if truthy(f(x, i) if isinstance(
                                             f, PyClosure) else _eq(x, f))],
    "array::find": lambda a, f: next(
        (x for i, x in enumerate(a) if truthy(f(x, i))), None),
    "array::find_index": lambda a, f: next(
        (i for i, x in enumerate(a)
         if truthy(f(x, i) if isinstance(f, PyClosure) else _eq(x, f))),
        None),
    "array::index_of": lambda a, v: next(
        (i for i, x in enumerate(a) if _eq(x, v)), None),
    "array::includes": lambda a, v: _contains(_arr(a, "array::includes"), v),
    "array::contains": lambda a, v: _contains(_arr(a, "array::contains"), v),
    "array::all": lambda a, f=None: all(
        truthy(f(x, i)) if f else truthy(x)
        for i, x in enumerate(_arr(a, "array::all"))),
    "array::any": lambda a, f=None: any(
        truthy(f(x, i)) if f else truthy(x)
        for i, x in enumerate(_arr(a, "array::any"))),
    "array::every": lambda a, f: all(truthy(f(x, i))
                                     for i, x in enumerate(a)),
    "array::some": lambda a, f: any(truthy(f(x, i))
                                    for i, x in enumerate(a)),
    "array::transpose": _f_transpose,
    "search::rrf": _fn_search_rrf,
    "search::linear": _fn_search_linear,
    "array::max": lambda a: (max(a, key=order_key) if a else None)
    if isinstance(a, list) else _arg_type_err("array::max", a),
    "array::min": lambda a: (min(a, key=order_key) if a else None)
    if isinstance(a, list) else _arg_type_err("array::min", a),
    "array::sort": lambda a, d=True: _sorted(a, d),
    "array::sort::asc": lambda a: _sorted(a, True),
    "array::sort::desc": lambda a: _sorted(a, False),
    "array::boolean_and": lambda a, b: _boolzip(a, b, lambda x, y: x and y),
    "array::boolean_or": lambda a, b: _boolzip(a, b, lambda x, y: x or y),
    "array::boolean_xor": lambda a, b: _boolzip(a, b, lambda x, y: x != y),
    "array::boolean_not": lambda a: [not truthy(x)
                                     for x in _arr(a, "array::boolean_not")],
    "array::logical_and": lambda a, b: _logical(a, b, "and"),
    "array::logical_or": lambda a, b: _logical(a, b, "or"),
    "array::logical_xor": lambda a, b: _logical(a, b, "xor"),
    "array::union": lambda a, b: _dedup(list(a) + list(b)),
    "array::intersect": lambda a, b: [x for x in _dedup(a)
                                      if any(_cmp(x, y) == 0 for y in b)],
    "array::difference": lambda a, b: (
        [x for x in _dedup(a) if not any(_cmp(x, y) == 0 for y in b)]
        + [y for y in _dedup(b) if not any(_cmp(y, x) == 0 for x in a)]),
    "array::complement": lambda a, b: [
        x for x in a if not any(_cmp(x, y) == 0 for y in b)],
    "array::combine": lambda a, b: [[x, y] for x in a for y in b],
    "array::matches": lambda a, v: [_eq(x, v) for x in a],
    "array::repeat": lambda v, n: _f_repeat(v, n),
    "array::windows": lambda a, n: _f_windows(a, n),
    "object::entries": _f_entries,
    "object::remove": lambda o, k: {
        kk: v for kk, v in o.items()
        if kk != k and not (isinstance(k, list) and kk in k)},
    "object::keys": lambda o: list(o.keys()),
    "object::values": lambda o: list(o.values()),
    "object::len": lambda o: len(o),
    "object::is_empty": lambda o: len(o) == 0,
    "object::from_entries": lambda e: {p[0]: p[1] for p in e},
    "object::extend": lambda a, b: {**a, **b},
    "set::add": lambda s, v: _mkset(list(s) + (v if isinstance(v, list)
                                               else [v])),
    "set::remove": lambda s, v: _mkset(
        [x for x in s
         if not any(_cmp(x, y) == 0
                    for y in (v if isinstance(v, list) else [v]))]),
    "set::contains": lambda s, v: _contains(_arr(s, "set::contains"), v),
    "set::len": lambda s: len(_arr(s, "set::len")),
    "set::is_empty": lambda s: len(_arr(s, "set::is_empty")) == 0,
    "type::of": typeof,
    "typeof": typeof,
    "type::string": render,
    "type::int": lambda v: int(v),
    "type::float": lambda v: float(v),
    "type::decimal": lambda v: Decimal(str(v)),
    "type::bool": lambda v: truthy(v),
    "type::array": lambda v: _range_list(v) if _is_range(v)
    else (list(v) if isinstance(v, list) else [v]),
    "type::set": lambda v: _mkset(_arr(v, "type::set")),
    "type::is_array": lambda v: isinstance(v, list)
    and not isinstance(v, SetVal),
    "type::is_set": lambda v: isinstance(v, SetVal),
    "type::is_bool": lambda v: isinstance(v, bool),
    "type::is_bytes": lambda v: isinstance(v, (bytes, bytearray)),
    "type::is_datetime": lambda v: isinstance(v, _dt.datetime),
    "type::is_decimal": lambda v: isinstance(v, Decimal),
    "type::is_duration": is_duration,
    "type::is_float": lambda v: isinstance(v, float),
    "type::is_int": lambda v: isinstance(v, int)
    and not isinstance(v, bool),
    "type::is_none": lambda v: v is None,
    "type::is_null": lambda v: v is None,
    "type::is_number": lambda v: isinstance(v, (int, float, Decimal))
    and not isinstance(v, bool),
    "type::is_object": lambda v: isinstance(v, dict) and not is_duration(v),
    "type::is_string": lambda v: isinstance(v, str),
    "count": lambda v=True: (sum(1 for x in v if truthy(x))
                             if isinstance(v, list) else int(truthy(v))),
    "string::len": lambda s: len(s),
    "string::lowercase": lambda s: s.lower(),
    "string::uppercase": lambda s: s.upper(),
    "string::reverse": lambda s: s[::-1],
    "string::trim": lambda s: s.strip(),
    "string::split": lambda s, sep: (list(s) if sep == ""
                                     else s.split(sep)),
    "string::concat": lambda *xs: "".join(render(x) for x in xs),
    "string::contains": lambda s, sub: sub in s,
    "string::matches": lambda s, p: _re.search(
        p.pattern if isinstance(p, RegexVal) else p, s) is not None,
}


def _boolzip(a, b, f):
    a, b = _arr(a, "array::boolean_op"), _arr(b, "array::boolean_op")
    n = max(len(a), len(b))
    return [f(truthy(a[i]) if i < len(a) else False,
              truthy(b[i]) if i < len(b) else False) for i in range(n)]


def _logical(a, b, op: str):
    """fnc/array.rs logical_and/or/xor — keeps the deciding VALUE, the
    longer side's tail Null-ing truthy (and) / falsy (or) leftovers."""
    a, b = list(_arr(a, "al")), list(_arr(b, "al"))
    swapped = len(a) < len(b)
    lh, rh = (b, a) if swapped else (a, b)
    out = list(lh)
    for i in range(len(rh)):
        x, y = (rh[i], lh[i]) if swapped else (lh[i], rh[i])
        tx, ty = truthy(x), truthy(y)
        if op == "and":
            out[i] = y if tx else x
        elif op == "or":
            out[i] = x if tx else y
        else:
            v = tx != ty
            out[i] = x if tx == v else (y if ty == v else v)
    for i in range(len(rh), len(lh)):
        t = truthy(out[i])
        if op == "and" and t:
            out[i] = None
        elif op == "or" and not t:
            out[i] = None
        elif op == "xor" and swapped and not t:
            out[i] = None
    return out


def _f_repeat(v, n):
    if not isinstance(n, int) or n < 0:
        raise EvalError("Incorrect arguments for function array::repeat(): "
                        "count must be a non-negative integer")
    if n > 1_048_576:
        raise EvalError("array::repeat output too large")
    return [v] * n


def _f_windows(a, n):
    a = _arr(a, "array::windows")
    if not isinstance(n, int) or n < 1:
        raise EvalError("Incorrect arguments for function array::windows():"
                        " window size must be a positive integer")
    return [a[i:i + n] for i in range(len(a) - n + 1)]


def _f_add(a, v):
    a = _arr(a, "array::add")
    out = list(a)
    for x in (v if isinstance(v, list) else [v]):
        if not any(_cmp(x, y) == 0 for y in out):
            out.append(x)
    return out


_U64 = 2 ** 64


def _as_i64(n: int) -> int:
    """`as i64` wrap of an unsigned/unbounded int (Rust cast semantics)."""
    return ((n % _U64) + 2 ** 63) % _U64 - 2 ** 63


def _dur_total_ns(d) -> int:
    if not is_duration(d):
        raise EvalError("expected a duration")
    return d["nanos"] + d["months"] * 2_630_016 * 10 ** 9


def _dur_from_unit(n, mul_secs: int | None, mul_ns: int = 1):
    """duration::from_* — std::time::Duration construction: the count is
    `as u64` (negatives wrap); second-multiplied units error on u64
    overflow (fnc/duration.rs checked_mul)."""
    if isinstance(n, float):
        n = int(n)
    if not isinstance(n, int) or isinstance(n, bool):
        raise EvalError("duration::from_* expects a number")
    u = n % _U64
    if mul_secs is not None:
        if u * mul_secs >= _U64:
            raise EvalError("Incorrect arguments for function "
                            "duration::from_*(): unit overflow")
        return {"months": 0, "nanos": u * mul_secs * 10 ** 9}
    return {"months": 0, "nanos": u * mul_ns}


def _dur_accessor(div_ns: int, wrap: bool):
    def f(d):
        total = _dur_total_ns(d) // div_ns
        return _as_i64(total) if wrap else _as_i64(total % _U64)
    return f


PY_FNS_DURATION = {
    # second-based accessors truncate then `as i64`-wrap
    # (fnc/duration.rs: d.secs() as i64 etc.)
    "duration::nanos": _dur_accessor(1, True),
    "duration::micros": _dur_accessor(10 ** 3, True),
    "duration::millis": _dur_accessor(10 ** 6, True),
    "duration::secs": _dur_accessor(10 ** 9, True),
    "duration::mins": _dur_accessor(60 * 10 ** 9, True),
    "duration::hours": _dur_accessor(3_600 * 10 ** 9, True),
    "duration::days": _dur_accessor(86_400 * 10 ** 9, True),
    "duration::weeks": _dur_accessor(604_800 * 10 ** 9, True),
    "duration::years": _dur_accessor(365 * 86_400 * 10 ** 9, True),
    "duration::from_nanos": lambda n: _dur_from_unit(n, None, 1),
    "duration::from_micros": lambda n: _dur_from_unit(n, None, 10 ** 3),
    "duration::from_millis": lambda n: _dur_from_unit(n, None, 10 ** 6),
    "duration::from_secs": lambda n: _dur_from_unit(n, 1),
    "duration::from_mins": lambda n: _dur_from_unit(n, 60),
    "duration::from_hours": lambda n: _dur_from_unit(n, 3_600),
    "duration::from_days": lambda n: _dur_from_unit(n, 86_400),
    "duration::from_weeks": lambda n: _dur_from_unit(n, 604_800),
}


def _rust_heap_push(h: list, elem, lt) -> None:
    """std BinaryHeap::push sift-up (alloc/collections/binary_heap.rs)."""
    h.append(elem)
    hole = len(h) - 1
    while hole > 0:
        parent = (hole - 1) // 2
        if not lt(h[parent], elem):
            break
        h[hole] = h[parent]
        hole = parent
    h[hole] = elem


def _rust_heap_pop(h: list, lt):
    """std BinaryHeap::pop — swap-remove root, sift_down_to_bottom then
    sift-up; the array layout (and thus into_iter order) matches Rust."""
    last = h.pop()
    if not h:
        return last
    top = h[0]
    hole, elem, n = 0, last, len(h)
    child = 1
    while child + 1 < n:
        if lt(h[child], h[child + 1]):
            child += 1
        h[hole] = h[child]
        hole, child = child, 2 * child + 1
    if child < n:
        h[hole] = h[child]
        hole = child
    while hole > 0:
        parent = (hole - 1) // 2
        if not lt(h[parent], elem):
            break
        h[hole] = h[parent]
        hole = parent
    h[hole] = elem
    return top


def _heap_select(a, k, name: str, reverse: bool):
    """math::top / math::bottom — k extremes in the reference's
    BinaryHeap array order (fnc/util/math/{top,bottom}.rs)."""
    if not isinstance(k, int) or isinstance(k, bool) or k <= 0:
        raise EvalError(
            f"Incorrect arguments for function math::{name}(). The second "
            "argument must be an integer greater than 0.")
    lt = (lambda x, y: x > y) if reverse else (lambda x, y: x < y)
    h: list = []
    for i, v in enumerate(_arr(a, f"math::{name}")):
        _rust_heap_push(h, v, lt)
        if i >= k:
            _rust_heap_pop(h, lt)
    return h


PY_FNS["math::top"] = lambda a, k: _heap_select(a, k, "top", True)
PY_FNS["math::bottom"] = lambda a, k: _heap_select(a, k, "bottom", False)
PY_FNS.update(PY_FNS_DURATION)


def _cbor_encode(v):
    from surrealdb_spark.functions.extra_fns import _cbor_enc

    return _cbor_enc(v)


def _cbor_decode(b):
    from surrealdb_spark.functions.extra_fns import _cbor_dec

    if not isinstance(b, (bytes, bytearray)):
        raise EvalError("encoding::cbor::decode expects bytes")
    v, _ = _cbor_dec(bytes(b))
    return v


def _b64_encode(b, padded=False):
    import base64

    if isinstance(b, str):
        raise EvalError("encoding::base64::encode expects bytes")
    out = base64.b64encode(bytes(b)).decode()
    return out if padded else out.rstrip("=")


def _b64_decode(s):
    import base64

    pad = "=" * (-len(s) % 4)
    return base64.b64decode(s + pad)


def _json_encode(v):
    import json as _json

    return _json.dumps(v, separators=(",", ":"), default=render)


def _json_decode(s):
    import json as _json

    if isinstance(s, (bytes, bytearray)):
        s = bytes(s).decode()
    return _json.loads(s)


PY_FNS.update({
    "encoding::cbor::encode": _cbor_encode,
    "encoding::cbor::decode": _cbor_decode,
    "encoding::base64::encode": _b64_encode,
    "encoding::base64::decode": _b64_decode,
    "encoding::json::encode": _json_encode,
    "encoding::json::decode": _json_decode,
})


def _file_fns() -> dict:
    """file:: driver-side dispatch (fnc/file.rs surface) — bucket I/O is
    a driver-scoped object-store call; values stay plain Python here so
    HOFs (`file::list(..).map(|$v| ...)`) compose."""
    from surrealdb_spark.pipeline import filebucket as FB

    return {
        "file::put": FB.f_put,
        "file::put_if_not_exists": FB.f_put_if_not_exists,
        "file::get": FB.f_get,
        "file::head": FB.f_head,
        "file::exists": FB.f_exists,
        "file::delete": FB.f_delete,
        "file::copy": FB.f_copy,
        "file::copy_if_not_exists": FB.f_copy_if_not_exists,
        "file::rename": FB.f_rename,
        "file::rename_if_not_exists": FB.f_rename_if_not_exists,
        "file::list": FB.f_list,
        "file::bucket": lambda p: p[len("file:/"):].split("/", 1)[0],
        "file::key": lambda p: "/" + p[len("file:/"):].split("/", 1)[1],
    }


PY_FNS.update(_file_fns())


def _esc_rid_key(txt: str) -> str:
    """EscapeRecordKey (types/src/value/record_id/key.rs Display):
    escape when empty, containing non-[A-Za-z0-9_] chars, or all
    digits/underscores (would collide with a numeric key)."""
    import re as _re_k

    if not txt or not _re_k.fullmatch(r"\w+", txt) \
            or _re_k.fullmatch(r"[0-9_]+", txt):
        return f"⟨{txt}⟩"
    return txt


def _type_record(tb, key=None):
    """type::record / type::thing — record-id string from table + key
    (fnc/type.rs: an int key stays numeric; array/object keys render
    structurally; everything else becomes a STRING key through the
    EscapeRecordKey rule, so bools print t:true, floats t:⟨1.5⟩ and
    all-digit strings t:⟨123⟩)."""
    s = str(tb)
    if key is None:
        return s
    if isinstance(key, bool):
        return f"{s}:{_esc_rid_key('true' if key else 'false')}"
    if isinstance(key, int):
        return f"{s}:{key}"
    if isinstance(key, dict) and not is_duration(key):
        # object key renders as an object literal, keys BTree-sorted
        # (record_id/key.rs RecordIdKey::Object)
        from surrealdb_spark.values import render_rid_vals

        inner = ", ".join(
            f"{k2}: {render_rid_vals([v2])[1:-1]}"
            for k2, v2 in sorted(key.items()))
        return f"{s}:{{ {inner} }}"
    if isinstance(key, list):
        from surrealdb_spark.values import render_rid_vals

        return f"{s}:{render_rid_vals(key)}"
    return f"{s}:{_esc_rid_key(key if isinstance(key, str) else render(key))}"


PY_FNS["type::record"] = _type_record
PY_FNS["type::thing"] = _type_record


def _dedup(a):
    out = []
    for x in a:
        if not any(_cmp(x, y) == 0 for y in out):
            out.append(x)
    return out


def _sorted(a, d=True):
    asc = d is True or (isinstance(d, str) and d.lower() in ("asc", "true"))
    return sorted(a, key=order_key, reverse=not asc)


def eval_text(text: str, env: dict | None = None):
    """Parse + evaluate one scalar expression statement."""
    return peval(parse_expr(text), env or {})


def increment(base, rhs):
    """`+=` semantics (val/value/increment.rs): arrays push/concat, sets
    insert/extend, absent starts from zero/empty, scalars try_add."""
    if base is None:
        if isinstance(rhs, bool):
            return [rhs]
        if isinstance(rhs, (int, float, Decimal)) or is_duration(rhs) \
                or isinstance(rhs, list):
            return rhs
        return [rhs]
    if isinstance(base, SetVal):
        items = list(rhs) if isinstance(rhs, list) else [rhs]
        return _mkset(list(base) + items)
    if isinstance(base, list):
        if isinstance(rhs, list):
            return list(base) + list(rhs)
        return list(base) + [rhs]
    return _arith("+", base, rhs)


def extend(base, rhs):
    """`+?=` semantics (val/value/extend.rs AssignOperator::Extend):
    array target concats/pushes then uniq()s (first-occurrence order);
    NONE target wraps the value as an array; anything else errors."""
    if base is None:
        return list(rhs) if isinstance(rhs, list) else [rhs]
    if isinstance(base, (SetVal, list)):
        items = list(rhs) if isinstance(rhs, list) else [rhs]
        out = []
        for x in list(base) + items:
            if x not in out:
                out.append(x)
        return _mkset(out) if isinstance(base, SetVal) else out
    raise ValueError(f"Cannot extend the value '{base!r}'")


def decrement(base, rhs):
    """`-=` semantics (val/value/decrement.rs): arrays/sets remove every
    matching element (duplicates of others preserved), absent numbers
    start from zero, scalars try_sub."""
    if base is None:
        if isinstance(rhs, (int, float, Decimal)) \
                and not isinstance(rhs, bool):
            return _arith("-", 0, rhs)
        return None
    if isinstance(base, (SetVal, list)):
        items = list(rhs) if isinstance(rhs, list) else [rhs]
        out = [x for x in base if not any(_eq(x, y) for y in items)]
        return SetVal(out) if isinstance(base, SetVal) else out
    return _arith("-", base, rhs)


def _num_arr(a, ctx):
    xs = _arr(a, ctx)
    return [x for x in xs if isinstance(x, (int, float, Decimal))
            and not isinstance(x, bool)]


def _ck_i64(v, ctx):
    # int results must stay in i64 (number.rs checked ops)
    if isinstance(v, int) and not isinstance(v, bool) \
            and not -(2 ** 63) <= v < 2 ** 63:
        raise EvalError(f"There was a problem running the {ctx}() "
                        "function. Integer overflow")
    return v


PY_FNS["math::max"] = lambda a: (max(_num_arr(a, "math::max"))
                                 if _num_arr(a, "math::max") else None)
PY_FNS["math::min"] = lambda a: (min(_num_arr(a, "math::min"))
                                 if _num_arr(a, "math::min") else None)
PY_FNS["math::sum"] = lambda a: _ck_i64(sum(_num_arr(a, "math::sum")),
                                        "math::sum")
PY_FNS["math::abs"] = lambda v: _ck_i64(abs(_num(v, "math::abs")),
                                        "math::abs")
PY_FNS["math::floor"] = lambda v: _math.floor(_num(v, "math::floor"))
PY_FNS["math::ceil"] = lambda v: _math.ceil(_num(v, "math::ceil"))
PY_FNS["math::round"] = lambda v: round(_num(v, "math::round"))
