"""String-Gremlin front end — parse the reference's documented Gremlin
subset into :mod:`graphscope_spark.traversal` calls.

Reference surface: the textual queries a GIE user submits over its Gremlin
endpoint (``docs/interactive_engine/tinkerpop/supported_gremlin_steps.md:
25-570`` — source V/E, expand out/in/both/outE/inE/bothE/outV/inV/otherV/
bothV, filter has/hasLabel/hasId/hasNot/is/where/dedup/coin, projection
values/valueMap/elementMap/id/label/constant/select/path, aggregate
count/sum/min/max/mean/fold/group/groupCount, order-by, limit, union,
repeat…times/until/emit, coalesce/optional). The step KERNEL already
exists (`traversal.py`); this module is only the front end: a
recursive-descent parser over the method-call chain, then a direct
evaluation onto the library API — no new execution semantics, so every
behavior is covered by the existing step tests and oracles.

The parser is deliberately NOT a full Groovy reader: literals are numbers,
single/double-quoted strings and booleans; anonymous traversals (bare
steps or ``__.``-prefixed) appear as arguments to repeat/union/coalesce/
optional/until; predicates are the P/TextP families with or without their
class prefix. Anything outside the documented subset raises
``GremlinParseError`` with the offending position — a deliberate parse
error beats a silently wrong traversal.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.traversal import (
    P,
    TextP,
    Traversal,
    edge_traversal,
    traversal,
)


class GremlinParseError(ValueError):
    pass


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<sym>[().,])
    )""",
    re.VERBOSE,
)


def _tokenize(text: str):
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise GremlinParseError(
                f"unexpected character {text[pos]!r} at position {pos}"
            )
        pos = m.end()
        for kind in ("num", "str", "name", "sym"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v, m.start()))
                break
    return out


@dataclass(frozen=True)
class Call:
    name: str
    args: tuple


@dataclass(frozen=True)
class Anon:
    """An anonymous traversal argument (``__.out('x')`` or ``out('x')``)."""

    calls: tuple


@dataclass(frozen=True)
class PredCall:
    """A P/TextP predicate argument (``gt(10)``, ``TextP.containing('a')``)."""

    name: str
    args: tuple


_PREDS = {
    "eq", "neq", "gt", "lt", "gte", "lte", "within", "without",
    "inside", "outside", "not",
}
_TEXTP = {
    "startingWith": "starting_with",
    "endingWith": "ending_with",
    "containing": "containing",
    "notStartingWith": "not_starting_with",
    "notEndingWith": "not_ending_with",
    "notContaining": "not_containing",
}


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    def _peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None, len(self.text))

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, sym: str):
        kind, v, pos = self._next()
        if kind != "sym" or v != sym:
            raise GremlinParseError(f"expected {sym!r} at position {pos}, got {v!r}")

    def parse_query(self) -> tuple:
        kind, v, pos = self._next()
        if kind != "name" or v != "g":
            raise GremlinParseError(f"query must start with 'g' (position {pos})")
        self._expect(".")
        calls = self.parse_chain()
        if self._peek()[0] is not None:
            _, v, pos = self._peek()
            raise GremlinParseError(f"trailing input {v!r} at position {pos}")
        return calls

    def parse_chain(self) -> tuple:
        calls = []
        while True:
            kind, name, pos = self._next()
            if kind != "name":
                raise GremlinParseError(
                    f"expected step name at position {pos}, got {name!r}"
                )
            self._expect("(")
            args = self.parse_args()
            calls.append(Call(name, tuple(args)))
            if self._peek() == (None, None, len(self.text)):
                break
            kind, v, _ = self._peek()
            if kind == "sym" and v == ".":
                self._next()
                continue
            break
        return tuple(calls)

    def parse_args(self) -> list:
        args = []
        if self._peek()[:2] == ("sym", ")"):
            self._next()
            return args
        while True:
            args.append(self.parse_arg())
            kind, v, pos = self._next()
            if kind == "sym" and v == ")":
                return args
            if not (kind == "sym" and v == ","):
                raise GremlinParseError(
                    f"expected ',' or ')' at position {pos}, got {v!r}"
                )

    def parse_arg(self):
        kind, v, pos = self._peek()
        if kind == "num":
            self._next()
            return float(v) if "." in v else int(v)
        if kind == "str":
            self._next()
            body = v[1:-1]
            return body.replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")
        if kind != "name":
            raise GremlinParseError(f"unexpected {v!r} at position {pos}")
        # booleans
        if v in ("true", "false"):
            self._next()
            return v == "true"
        # bare order keywords (order().by('age', desc))
        if v in ("asc", "desc", "incr", "decr") and self._peek(1)[1] != "(":
            self._next()
            return v
        # Order.desc / Order.asc
        if v == "Order" and self._peek(1)[1] == ".":
            self._next(); self._next()
            kind2, word, pos2 = self._next()
            if kind2 != "name" or word not in ("asc", "desc", "incr", "decr"):
                raise GremlinParseError(f"unknown Order member at {pos2}")
            return word
        nxt_kind, nxt, _ = self._peek(1)
        # P.xxx(...) / TextP.xxx(...)
        if v in ("P", "TextP") and nxt == ".":
            self._next(); self._next()
            kind2, fname, pos2 = self._next()
            if kind2 != "name":
                raise GremlinParseError(f"expected predicate at position {pos2}")
            return self._parse_pred(v, fname, pos2)
        # bare predicate name followed by (
        if v in _PREDS and nxt == "(":
            self._next()
            return self._parse_pred("P", v, pos)
        if v in _TEXTP and nxt == "(":
            self._next()
            return self._parse_pred("TextP", v, pos)
        # __.step chain
        if v == "__" and nxt == ".":
            self._next(); self._next()
            return Anon(self.parse_chain())
        # bare anonymous chain: name(
        if nxt == "(":
            return Anon(self.parse_chain())
        raise GremlinParseError(f"cannot parse argument {v!r} at position {pos}")

    def _parse_pred(self, family: str, fname: str, pos: int) -> PredCall:
        if family == "P" and fname not in _PREDS:
            raise GremlinParseError(f"unknown P predicate {fname!r} at {pos}")
        if family == "TextP" and fname not in _TEXTP:
            raise GremlinParseError(f"unknown TextP predicate {fname!r} at {pos}")
        self._expect("(")
        args = self.parse_args()
        return PredCall(f"{family}.{fname}", tuple(args))


def _eval_pred(pc: PredCall):
    fam, name = pc.name.split(".")
    if fam == "TextP":
        fn = getattr(TextP, _TEXTP[name])
        return fn(*pc.args)
    if name == "not":
        inner = pc.args[0]
        if not isinstance(inner, PredCall):
            raise GremlinParseError("P.not() needs a predicate argument")
        return P.not_(_eval_pred(inner))
    if name in ("within", "without"):
        vals = [a for a in pc.args]
        return getattr(P, name)(vals)
    return getattr(P, name)(*pc.args)


# camelCase → library method
_NAME_MAP = {
    "hasLabel": "has_label", "hasNot": "has_not", "hasId": "has_id",
    "outE": "out_e", "inE": "in_e", "bothE": "both_e",
    "outV": "out_v", "inV": "in_v", "otherV": "other_v", "bothV": "both_v",
    "valueMap": "value_map", "elementMap": "element_map",
    "groupCount": "group_count", "in": "in_", "as": "as_", "is": "is_",
    "id": "id_", "label": "label_", "identity": "identity",
    "pathExpand": "path_expand",
}

_AGGS = {"sum": "sum_", "min": "min_", "max": "max_", "mean": "mean_"}


def _apply_calls(t, calls: tuple):
    """Apply a parsed call chain to a Traversal/Edge/Folded object; return
    whatever the final step yields (Traversal or DataFrame)."""
    i = 0
    while i < len(calls):
        c = calls[i]
        name, args = c.name, list(c.args)
        # -- steps needing lookahead / modifier folding --------------------
        if name == "repeat":
            if len(args) != 1 or not isinstance(args[0], Anon):
                raise GremlinParseError("repeat() takes one anonymous traversal")
            body_calls = args[0].calls
            times = until = None
            emit = False
            j = i + 1
            while j < len(calls) and calls[j].name in ("times", "until", "emit"):
                m = calls[j]
                if m.name == "times":
                    times = int(m.args[0])
                elif m.name == "emit":
                    emit = True
                else:
                    u = m.args[0]
                    if (
                        isinstance(u, Anon)
                        and len(u.calls) == 1
                        and u.calls[0].name == "has"
                        and len(u.calls[0].args) == 2
                    ):
                        prop, pred = u.calls[0].args
                        if isinstance(pred, PredCall):
                            pred = _eval_pred(pred)
                        else:
                            pred = P.eq(pred)
                        until = (prop, pred)
                    else:
                        raise GremlinParseError(
                            "until() supports a single has(prop, pred) filter"
                        )
                j += 1
            t = t.repeat(
                lambda x, bc=body_calls: _apply_calls(x, bc),
                times=times,
                until=until,
                emit=emit,
            )
            i = j
            continue
        if name == "order":
            if args:
                raise GremlinParseError("order() takes no arguments")
            j = i + 1
            applied = False
            while j < len(calls) and calls[j].name == "by":
                by = list(calls[j].args)
                desc = False
                if by and by[-1] in ("desc", "decr"):
                    desc = True
                    by = by[:-1]
                elif by and by[-1] in ("asc", "incr"):
                    by = by[:-1]
                if by:
                    t = t.order_by(prop=by[0], desc=desc)
                else:
                    t = t.order_by(desc=desc)
                applied = True
                j += 1
            if not applied:
                t = t.order_by()
            i = j
            continue
        if name == "group":
            bys = []
            j = i + 1
            while j < len(calls) and calls[j].name == "by":
                bys.append(calls[j].args[0])
                j += 1
            if not bys:
                raise GremlinParseError("group() needs at least one by()")
            t = t.group(*bys[:2])
            i = j
            continue
        if name == "groupCount":
            j = i + 1
            prop = None
            if j < len(calls) and calls[j].name == "by":
                prop = calls[j].args[0]
                j += 1
            t = t.group_count(prop)
            i = j
            continue
        if name == "values":
            prop = args[0]
            nxt = calls[i + 1].name if i + 1 < len(calls) else None
            if nxt in _AGGS:
                t = getattr(t, _AGGS[nxt])(prop)
                i += 2
                continue
            if nxt == "count":
                t = t.count()
                i += 2
                continue
            t = t.values(prop)
            i += 1
            continue
        if name == "select":
            more = i + 1 < len(calls)
            if more and len(args) == 1:
                t = t.select_head(args[0])
            else:
                t = t.select(*args)
            i += 1
            continue
        if name in ("union", "coalesce", "optional"):
            branches = []
            for a in args:
                if not isinstance(a, Anon):
                    raise GremlinParseError(f"{name}() takes anonymous traversals")
                branches.append(a)
            if name == "union":
                outs = [_apply_calls(t, b.calls) for b in branches]
                kinds = {isinstance(o, DataFrame) for o in outs}
                if len(kinds) > 1:
                    raise GremlinParseError(
                        "union() branches must all be traversals or all "
                        "projections, not a mix"
                    )
                if kinds == {True}:
                    # projected branches: require identical columns and
                    # union by NAME (DataFrame.union is positional and
                    # takes exactly one other frame)
                    cols = set(outs[0].columns)
                    if any(set(o.columns) != cols for o in outs[1:]):
                        raise GremlinParseError(
                            "union() projection branches carry different "
                            "columns"
                        )
                    u = outs[0]
                    for o in outs[1:]:
                        u = u.unionByName(o)
                    t = u
                else:
                    t = outs[0].union(*outs[1:]) if len(outs) > 1 else outs[0]
            elif name == "optional":
                t = t.optional(lambda x, b=branches[0]: _apply_calls(x, b.calls))
            else:
                t = t.coalesce_(
                    *[
                        (lambda x, b=b: _apply_calls(x, b.calls))
                        for b in branches
                    ]
                )
            i += 1
            continue
        if name == "where":
            a = args[0]
            if isinstance(a, PredCall) and a.name in ("P.eq", "P.neq"):
                # where(eq('a')) / where(neq('a')) — alias comparison
                mark = "" if a.name == "P.eq" else "!"
                t = t.where(f"{mark}{a.args[0]}")
            elif isinstance(a, str):
                t = t.where(a)
            else:
                raise GremlinParseError(
                    "where() supports eq/neq alias comparisons"
                )
            i += 1
            continue
        # -- steps applied to an already-projected DataFrame ---------------
        if isinstance(t, DataFrame):
            if name == "count":
                t = t.agg(F.count("*").alias("count"))
                i += 1
                continue
            if name == "limit":
                t = t.limit(int(args[0]))
                i += 1
                continue
            raise GremlinParseError(
                f"step {name}() cannot follow a projection step"
            )
        # -- plain mapped steps -------------------------------------------
        method = _NAME_MAP.get(name, name)
        args = [
            _eval_pred(a) if isinstance(a, PredCall) else a for a in args
        ]
        if any(isinstance(a, Anon) for a in args):
            raise GremlinParseError(f"step {name}() cannot take a traversal here")
        if not hasattr(t, method):
            raise GremlinParseError(
                f"unsupported step {name}() on {type(t).__name__}"
            )
        t = getattr(t, method)(*args)
        i += 1
    return t


def gremlin(pg, query: str) -> DataFrame:
    """Execute a textual Gremlin query against a PropertyGraph; returns the
    result DataFrame (Traversal results render via ``to_df``)."""
    calls = _Parser(query).parse_query()
    if not calls:
        raise GremlinParseError("empty query")
    src = calls[0]
    rest = calls[1:]
    if src.name == "V":
        label = None
        # fold g.V().hasLabel('x') into the source step (the library's
        # multi-label V() requires a label)
        if rest and rest[0].name == "hasLabel" and len(rest[0].args) == 1:
            label = rest[0].args[0]
            rest = rest[1:]
        t = traversal(pg, label)
        if src.args:  # g.V(id1, id2)
            t = t.has_id(*src.args)
    elif src.name == "E":
        label = src.args[0] if src.args else None
        t = edge_traversal(pg, label)
    else:
        raise GremlinParseError("query must start with g.V() or g.E()")
    out = _apply_calls(t, tuple(rest))
    if isinstance(out, DataFrame):
        return out
    return out.to_df()
