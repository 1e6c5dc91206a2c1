"""Read-only Cypher front end — parse the openCypher subset GIE documents
into :mod:`graphscope_spark.traversal` calls.

Reference surface: the reference's GIE executes Cypher through its Neo4j
ecosystem compatibility (``docs/interactive_engine/neo4j_eco.md:6,17-18``);
a user holding a Cypher *string* submits read queries of the
MATCH/WHERE/RETURN family. This module is the front end only — like
``gremlin.py`` it adds NO execution semantics: a linear MATCH pattern
compiles to the existing Traversal hop/alias chain, WHERE to has()/where()
filters, RETURN to the path-projection + (implicit, Cypher-style)
grouping aggregate.

Supported subset (anything else raises ``CypherParseError``):

* ``MATCH (a:Label {prop: lit})-[e:TYPE]->(b:Label)…`` — one linear path,
  ``->`` / ``<-`` / undirected ``-[]-`` hops, inline property maps
* ``WHERE`` — AND-conjunctions of ``var.prop OP literal``
  (=, <>, <, <=, >, >=), ``var.prop IN [..]``, ``var.prop STARTS
  WITH/ENDS WITH/CONTAINS 'lit'``, and ``a <> b`` / ``a = b`` between two
  node vars (the Gremlin where(neq('a')) form)
* ``RETURN [DISTINCT] item [AS alias], …`` where item is ``var``,
  ``var.prop`` or ``count(*)`` — non-aggregated items become Cypher's
  implicit GROUP BY keys when count(*) is present
* ``ORDER BY alias [ASC|DESC], …`` and ``LIMIT n``
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.traversal import P, TextP, traversal


class CypherParseError(ValueError):
    pass


_NODE = re.compile(
    r"""\(\s*(?P<var>[A-Za-z_][A-Za-z0-9_]*)?\s*
        (?::\s*(?P<label>[A-Za-z_][A-Za-z0-9_]*))?\s*
        (?P<props>\{[^}]*\})?\s*\)""",
    re.VERBOSE,
)
_REL = re.compile(
    r"""(?P<left><)?-\s*
        (?:\[\s*(?P<var>[A-Za-z_][A-Za-z0-9_]*)?\s*
           (?::\s*(?P<type>[A-Za-z_][A-Za-z0-9_]*))?\s*\]\s*)?
        -(?P<right>>)?""",
    re.VERBOSE,
)


def _parse_literal(tok: str):
    tok = tok.strip()
    if tok.startswith(("'", '"')):
        return tok[1:-1]
    if tok.lower() in ("true", "false"):
        return tok.lower() == "true"
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"-?\d+\.\d+", tok):
        return float(tok)
    raise CypherParseError(f"cannot parse literal {tok!r}")


def _parse_props(txt: str | None) -> dict:
    if not txt:
        return {}
    body = txt.strip()[1:-1].strip()
    if not body:
        return {}
    out = {}
    for part in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", body):
        k, _, v = part.partition(":")
        if not _:
            raise CypherParseError(f"bad property map entry {part!r}")
        out[k.strip()] = _parse_literal(v)
    return out


@dataclass
class _Node:
    var: str | None
    label: str | None
    props: dict = field(default_factory=dict)


@dataclass
class _Hop:
    direction: str  # 'out' | 'in' | 'both'
    type: str | None


def _skip_ws(text: str, pos: int) -> int:
    while pos < len(text) and text[pos].isspace():
        pos += 1
    return pos


def _parse_pattern(text: str) -> tuple[list[_Node], list[_Hop]]:
    nodes: list[_Node] = []
    hops: list[_Hop] = []
    pos = _skip_ws(text, 0)
    m = _NODE.match(text, pos)
    if not m:
        raise CypherParseError(f"expected node pattern at {text[pos:pos+20]!r}")
    nodes.append(_Node(m.group("var"), m.group("label"), _parse_props(m.group("props"))))
    pos = m.end()
    while pos < len(text):
        pos = _skip_ws(text, pos)
        if pos >= len(text):
            break
        mr = _REL.match(text, pos)
        if not mr:
            break
        left, right = mr.group("left"), mr.group("right")
        if left and right:
            raise CypherParseError("relationship cannot point both ways")
        direction = "out" if right else ("in" if left else "both")
        hops.append(_Hop(direction, mr.group("type")))
        pos = _skip_ws(text, mr.end())
        mn = _NODE.match(text, pos)
        if not mn:
            raise CypherParseError(
                f"expected node pattern after relationship at {text[pos:pos+20]!r}"
            )
        nodes.append(
            _Node(mn.group("var"), mn.group("label"), _parse_props(mn.group("props")))
        )
        pos = mn.end()
    if text[pos:].strip():
        raise CypherParseError(f"trailing pattern input {text[pos:]!r}")
    return nodes, hops


_CMP = {
    "=": P.eq, "<>": P.neq, "<": P.lt, "<=": P.lte, ">": P.gt, ">=": P.gte,
}
_WHERE_RE = re.compile(
    r"""^(?P<var>[A-Za-z_][A-Za-z0-9_]*)
        (?:\.(?P<prop>[A-Za-z_][A-Za-z0-9_]*))?\s*
        (?P<op><=|>=|<>|=|<|>|\sIN\s|\sSTARTS\sWITH\s|\sENDS\sWITH\s|\sCONTAINS\s)\s*
        (?P<rhs>.+)$""",
    re.VERBOSE | re.IGNORECASE,
)


def _split_top(text: str, sep: str) -> list[str]:
    """Split on a separator outside quotes/brackets."""
    out, depth, cur, i = [], 0, "", 0
    U = text
    while i < len(U):
        c = U[i]
        if c in "(['\"":
            if c in "'\"":
                j = U.index(c, i + 1)
                cur += U[i : j + 1]
                i = j + 1
                continue
            depth += 1
        elif c in ")]":
            depth -= 1
        if depth == 0 and U[i:].upper().startswith(sep.upper()) and (
            sep.strip() != ""
        ):
            out.append(cur)
            cur = ""
            i += len(sep)
            continue
        cur += c
        i += 1
    out.append(cur)
    return out


def cypher(pg, query: str) -> DataFrame:
    """Execute a read-only Cypher query against a PropertyGraph."""
    q = query.strip().rstrip(";")
    m = re.match(
        r"(?is)^\s*MATCH\s+(?P<pattern>.+?)"
        r"(?:\s+WHERE\s+(?P<where>.+?))?"
        r"\s+RETURN\s+(?P<ret>.+?)"
        r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
        r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$",
        q,
    )
    if not m:
        raise CypherParseError("expected MATCH … [WHERE …] RETURN … [ORDER BY …] [LIMIT n]")
    nodes, hops = _parse_pattern(m.group("pattern").strip())

    # -- bind the linear pattern onto a Traversal chain --------------------
    first = nodes[0]
    t = traversal(pg, first.label)
    binds: dict[str, int] = {}

    def bind(node: _Node, trav):
        for k, v in node.props.items():
            trav = trav.has(k, v)
        if node.var:
            if node.var in binds:
                raise CypherParseError(f"variable {node.var!r} bound twice")
            binds[node.var] = 1
            trav = trav.as_(node.var)
        return trav

    t = bind(first, t)
    for hop, node in zip(hops, nodes[1:]):
        step = {"out": t.out, "in": t.in_, "both": t.both}[hop.direction]
        t = step(hop.type)
        t = bind(node, t)

    # -- WHERE -------------------------------------------------------------
    where = m.group("where")
    if where:
        for clause in re.split(r"(?i)\s+AND\s+", where.strip()):
            clause = clause.strip()
            mm = _WHERE_RE.match(clause)
            if not mm:
                raise CypherParseError(f"unsupported WHERE clause {clause!r}")
            var, prop = mm.group("var"), mm.group("prop")
            op = mm.group("op").strip().upper()
            rhs = mm.group("rhs").strip()
            if prop is None:
                # var-to-var comparison: a <> b / a = b
                if op not in ("=", "<>") or not re.fullmatch(
                    r"[A-Za-z_][A-Za-z0-9_]*", rhs
                ):
                    raise CypherParseError(
                        f"unsupported var comparison {clause!r}"
                    )
                la, lb = var, rhs
                for name in (la, lb):
                    if name not in binds:
                        raise CypherParseError(
                            f"unknown variable {name!r} in {clause!r}"
                        )
                pa, pb = F.col(f"p_{la}"), F.col(f"p_{lb}")
                t = t.where(pa == pb if op == "=" else pa != pb)
                continue
            if var not in binds:
                raise CypherParseError(f"unknown variable {var!r}")
            if op == "IN":
                vals = [
                    _parse_literal(x)
                    for x in rhs.strip().lstrip("[").rstrip("]").split(",")
                ]
                pred = P.within(vals)
            elif op == "STARTS WITH":
                pred = TextP.starting_with(_parse_literal(rhs))
            elif op == "ENDS WITH":
                pred = TextP.ending_with(_parse_literal(rhs))
            elif op == "CONTAINS":
                pred = TextP.containing(_parse_literal(rhs))
            else:
                pred = _CMP[op.lower() if op.lower() in _CMP else op](
                    _parse_literal(rhs)
                )
            # refocus on the var's step, filter, refocus back is implicit
            # because has() joins on the p_<var> column via select_head
            cur = t
            t = cur.select_head(var).has(prop, pred)
            # restore the original head (last pattern node)
            last_var = next(
                (n.var for n in reversed(nodes) if n.var), None
            )
            if last_var and last_var != var:
                t = t.select_head(last_var)

    # -- RETURN ------------------------------------------------------------
    ret = m.group("ret").strip()
    distinct = False
    if re.match(r"(?i)^DISTINCT\s+", ret):
        distinct = True
        ret = ret[len("DISTINCT "):].strip()
    items = []  # (kind, var, prop, alias); kind ∈ {var, prop, count}
    for part in _split_top(ret, ","):
        part = part.strip()
        if not part:
            continue
        mi = re.match(
            r"(?is)^(?P<expr>count\(\*\)|[A-Za-z_][A-Za-z0-9_]*"
            r"(?:\.[A-Za-z_][A-Za-z0-9_]*)?)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?$",
            part,
        )
        if not mi:
            raise CypherParseError(f"unsupported RETURN item {part!r}")
        expr = mi.group("expr")
        alias = mi.group("alias")
        if expr.lower() == "count(*)":
            items.append(("count", None, None, alias or "count"))
        elif "." in expr:
            var, prop = expr.split(".")
            items.append(("prop", var, prop, alias or prop))
        else:
            items.append(("var", expr, None, alias or expr))

    frame = t.frame
    # property columns: join each referenced var's label frame
    cols = []
    for kind, var, prop, alias in items:
        if kind == "count":
            continue
        if var not in binds:
            raise CypherParseError(f"unknown RETURN variable {var!r}")
        if kind == "var":
            cols.append(F.col(f"p_{var}").alias(alias))
        else:
            lbl = dict(t.aliases)[var]
            if lbl is None:
                raise CypherParseError(f"variable {var!r} has no label")
            pdf = pg.vertices[lbl].select(
                F.col("vid").alias(f"p_{var}"), F.col(prop).alias(alias)
            )
            frame = frame.join(pdf, f"p_{var}")
            cols.append(F.col(alias))
    has_count = any(k == "count" for k, *_ in items)
    if has_count:
        keys = [c for c in cols]
        calias = next(a for k, _, _, a in items if k == "count")
        out = (
            frame.groupBy(*keys).agg(F.count("*").alias(calias))
            if keys
            else frame.agg(F.count("*").alias(calias))
        )
    else:
        out = frame.select(*cols)
        if distinct:
            out = out.distinct()
    order = m.group("order")
    if order:
        obys = []
        for part in order.split(","):
            toks = part.split()
            desc = len(toks) > 1 and toks[1].upper() == "DESC"
            obys.append(F.col(toks[0]).desc() if desc else F.col(toks[0]).asc())
        out = out.orderBy(*obys)
    if m.group("limit"):
        out = out.limit(int(m.group("limit")))
    return out
