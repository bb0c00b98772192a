"""Differential SQL fuzzer: random queries in a cross-engine-safe ANSI
subset, executed on BOTH Spark and DuckDB over the same parquet tables,
row-multisets compared.

    python tools/fuzz.py [sf_dir] [n_queries] [seed]
    # defaults: /root/testdata/sf0.01, 200, 7

Extends correctness beyond the ~220 curated registry queries the same way
the reference's checker extends its goldens across the parallelism matrix
(checker.sh:141-143 — same expected output for every config): here the
"config axis" is the ENGINE, and the invariant is that any query in the
common subset returns identical rows. The generator is seeded — a failure
reproduces with the same (sf_dir, n, seed) triple, and each failure prints
its SQL verbatim.

The subset is chosen so identical results are a THEOREM, not luck
(FIXTURES.md §4 discipline):
- every SELECT item is explicitly aliased (c0, c1, …) — names never drift;
- every query ends ORDER BY … NULLS FIRST … LIMIT — Spark defaults NULLS
  FIRST, DuckDB NULLS LAST, so ordering is always explicit. Non-aggregate
  queries order by ALL output columns (a tie then means bit-identical
  tuples, which LIMIT may split freely without changing the multiset —
  the synthetic lineitem has duplicate (l_orderkey, l_linenumber) pairs,
  so "order by pk" alone is NOT total); aggregates order by their full
  group key;
- SUM/AVG only over integer columns (exact in both engines; AVG's final
  division is one double op on identical operands). Doubles are compared
  raw when projected (same parquet bits) and jitter-rounded
  (round(x+1e-9, 4)) when averaged;
- arithmetic stays where identity is a theorem: int +/-/*small-const/%
  on nonnegative key-scale operands (never near 64-bit edges, so ANSI
  overflow can't fire), division only NULLIF-guarded (int/int is DOUBLE
  in both engines — identical operands, identical bits), casts only
  int↔string (integer formatting has no locale/scientific variance);
  string functions restricted to length/upper/lower/substr (identical
  1-based semantics) and LIKE/NOT LIKE;
- documents.text is only ever length()-ed (multi-KB payloads would
  dominate runtime without adding comparison surface);
- embeddings.embedding and events.props are out of scope (array/JSON
  comparison is the curated queries' job).

Exit 1 on any divergence; prints `FUZZDONE checked=N fails=0 skipped=K
secs=S` (sweep.py tail convention). A skip is a query one engine refused
(generation bug, not a divergence) — skips are printed and counted, never
silently dropped.
"""

from __future__ import annotations

import os
import random
import sys
import time
from decimal import Decimal

# (table, column) model: i = integer (exact, sum/avg-able), d = double
# (comparable/min-max-able, never summed), s = string, t = timestamp,
# h = heavy string (length() only)
TABLES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "i", "r_name": "s"},
    "nation": {"n_nationkey": "i", "n_name": "s", "n_regionkey": "i"},
    "customer": {
        "c_custkey": "i",
        "c_name": "s",
        "c_nationkey": "i",
        "c_acctbal": "d",
        "c_mktsegment": "s",
    },
    "supplier": {
        "s_suppkey": "i",
        "s_name": "s",
        "s_nationkey": "i",
        "s_acctbal": "d",
    },
    "part": {
        "p_partkey": "i",
        "p_name": "s",
        "p_brand": "s",
        "p_type": "s",
        "p_size": "i",
        "p_retailprice": "d",
    },
    "orders": {
        "o_orderkey": "i",
        "o_custkey": "i",
        "o_orderstatus": "s",
        "o_totalprice": "d",
        "o_orderdate": "t",
        "o_orderpriority": "s",
    },
    "lineitem": {
        "l_orderkey": "i",
        "l_partkey": "i",
        "l_suppkey": "i",
        "l_linenumber": "i",
        "l_quantity": "d",
        "l_extendedprice": "d",
        "l_discount": "d",
        "l_tax": "d",
        "l_returnflag": "s",
        "l_linestatus": "s",
        "l_shipdate": "t",
    },
    "events": {
        "event_id": "i",
        "ts": "t",
        "user_id": "i",
        "event_type": "s",
        "value": "d",
    },
    "documents": {
        "doc_id": "i",
        "text": "h",
        "lang": "s",
        "source": "s",
        "n_chars": "i",
    },
    "embeddings": {"vec_id": "i", "label": "i"},
}

# per-table sort-key columns. NOT assumed unique: the synthetic lineitem
# has duplicate (l_orderkey, l_linenumber) pairs (checked at sf0.001 and
# sf0.01 — 6000 rows, 4599 distinct), so LIMIT determinism NEVER leans on
# these alone; every non-aggregate query orders by ALL its output columns
# (a tie then means bit-identical tuples, which LIMIT may split freely
# without changing the multiset). UNIQUE_PK lists the tables whose key
# really is unique (everything but lineitem) — row_number()'s in-window
# ORDER BY requires true uniqueness and draws only from those.
PK: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey, l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
UNIQUE_PK = [t for t in PK if t != "lineitem"]

# FK edges (fact col -> dim table, dim pk col)
FKS: list[tuple[str, str, str, str]] = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

LIMIT = 500


def _sql_str(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _lit(kind: str, v) -> str:
    if kind == "s":
        return _sql_str(v)
    if kind == "t":
        return f"TIMESTAMP {_sql_str(v)}"
    return repr(float(v)) if kind == "d" else str(int(v))


class Sampler:
    """Deterministic per-column literal pools, pulled once from DuckDB:
    spread by md5 order so predicates hit varied selectivities."""

    def __init__(self, con):
        self.con = con
        self.pool: dict[tuple[str, str], list] = {}

    def values(self, t: str, c: str) -> list:
        key = (t, c)
        if key not in self.pool:
            rows = self.con.execute(
                f"SELECT {c} FROM (SELECT DISTINCT {c} FROM {t} "
                f"WHERE {c} IS NOT NULL) ORDER BY md5({c}::VARCHAR) LIMIT 24"
            ).fetchall()
            self.pool[key] = [r[0] for r in rows]
        return self.pool[key]


class Gen:
    def __init__(self, rng: random.Random, sampler: Sampler):
        self.rng, self.sampler = rng, sampler

    def _cols(self, t: str, kinds: str, k: int = 1) -> list[str]:
        cands = [c for c, kk in TABLES[t].items() if kk in kinds]
        self.rng.shuffle(cands)
        return cands[:k]

    def _pred(self, t: str, alias: str = "") -> str:
        p = alias + "." if alias else ""
        cols = self._cols(t, "isdth", k=1)
        if not cols:
            return "1=1"
        c = cols[0]
        kind = TABLES[t][c]
        if kind == "h":
            # heavy strings predicate on length only — never sample the
            # full text values into the literal pool
            return f"length({p}{c}) > {self.rng.randint(10, 400)}"
        vals = self.sampler.values(t, c)
        if not vals:
            return f"{p}{c} IS NOT NULL"
        v = self.rng.choice(vals)
        roll = self.rng.random()
        if kind == "s":
            if roll < 0.4:
                return f"{p}{c} = {_lit('s', v)}"
            if roll < 0.7:
                n = self.rng.randint(2, min(4, len(vals)))
                ins = ", ".join(_lit("s", x) for x in vals[:n])
                return f"{p}{c} IN ({ins})"
            pref = str(v)[: self.rng.randint(1, 3)].replace("'", "''")
            pref = pref.replace("%", "").replace("_", "")
            return f"{p}{c} LIKE '{pref}%'"
        op = self.rng.choice(["<", "<=", ">", ">=", "="])
        if roll < 0.25 and len(vals) >= 2:
            lo, hi = sorted([v, self.rng.choice(vals)])[:2]
            return f"{p}{c} BETWEEN {_lit(kind, lo)} AND {_lit(kind, hi)}"
        return f"{p}{c} {op} {_lit(kind, v)}"

    def _preds(self, t: str, alias: str = "") -> str:
        n = self.rng.randint(1, 2)
        glue = " AND " if self.rng.random() < 0.7 else " OR "
        return "(" + glue.join(self._pred(t, alias) for _ in range(n)) + ")"

    def _proj_item(self, t: str, c: str, i: int, alias: str = "") -> str:
        p = alias + "." if alias else ""
        kind = TABLES[t][c]
        if kind == "h":
            return f"length({p}{c}) AS c{i}"
        if kind == "s" and self.rng.random() < 0.3:
            fn = self.rng.choice(["upper", "lower", f"substr({p}{c}, 1, 3)"])
            e = fn if fn.startswith("substr") else f"{fn}({p}{c})"
            return f"{e} AS c{i}"
        return f"{p}{c} AS c{i}"

    # ---- templates ------------------------------------------------------

    def filter_project(self) -> str:
        t = self.rng.choice(list(TABLES))
        cols = self._cols(t, "isdth", k=self.rng.randint(1, 4))
        proj = ", ".join(self._proj_item(t, c, i) for i, c in enumerate(cols))
        order = ", ".join(
            f"c{i} ASC NULLS FIRST" for i in range(len(cols))
        )
        return (
            f"SELECT {proj} FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def _aggs(self, t: str, alias: str = "") -> list[str]:
        p = alias + "." if alias else ""
        out = ["count(*)"]
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        anys = [c for c, k in TABLES[t].items() if k in "isdt"]
        if ints and self.rng.random() < 0.8:
            c = self.rng.choice(ints)
            out.append(
                self.rng.choice(
                    [f"sum({p}{c})", f"round(avg({p}{c}) + 1e-9, 4)"]
                )
            )
        if anys:
            c = self.rng.choice(anys)
            out.append(self.rng.choice([f"min({p}{c})", f"max({p}{c})"]))
        if anys and self.rng.random() < 0.4:
            out.append(f"count(DISTINCT {p}{self.rng.choice(anys)})")
        return out

    def groupby_agg(self) -> str:
        t = self.rng.choice(list(TABLES))
        keys = self._cols(t, "ist", k=self.rng.randint(1, 2))
        if not keys:
            keys = [PK[t].split(", ")[0]]
        kproj = ", ".join(f"{c} AS k{i}" for i, c in enumerate(keys))
        aggs = ", ".join(
            f"{a} AS c{i}" for i, a in enumerate(self._aggs(t))
        )
        order = ", ".join(f"k{i} ASC NULLS FIRST" for i in range(len(keys)))
        return (
            f"SELECT {kproj}, {aggs} FROM {t} WHERE {self._preds(t)} "
            f"GROUP BY {', '.join(keys)} ORDER BY {order} LIMIT {LIMIT}"
        )

    def join(self) -> str:
        ft, fc, dt, dc = self.rng.choice(FKS)
        pred = self._preds(ft, "f") if self.rng.random() < 0.7 else self._preds(dt, "d")
        if self.rng.random() < 0.5:
            # aggregate over the join
            keys = self._cols(dt, "is", k=1) or [dc]
            aggs = ", ".join(
                f"{a} AS c{i}" for i, a in enumerate(self._aggs(ft, "f"))
            )
            return (
                f"SELECT d.{keys[0]} AS k0, {aggs} FROM {ft} f "
                f"JOIN {dt} d ON f.{fc} = d.{dc} WHERE {pred} "
                f"GROUP BY d.{keys[0]} ORDER BY k0 ASC NULLS FIRST "
                f"LIMIT {LIMIT}"
            )
        fcols = self._cols(ft, "isdt", k=2)
        dcols = self._cols(dt, "isd", k=1)
        items = [
            self._proj_item(ft, c, i, "f") for i, c in enumerate(fcols)
        ] + [
            self._proj_item(dt, c, len(fcols) + i, "d")
            for i, c in enumerate(dcols)
        ]
        order = ", ".join(
            f"c{i} ASC NULLS FIRST" for i in range(len(items))
        )
        return (
            f"SELECT {', '.join(items)} FROM {ft} f "
            f"JOIN {dt} d ON f.{fc} = d.{dc} WHERE {pred} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def two_hop_join(self) -> str:
        a = self.rng.choice(
            [e for e in FKS if any(x[0] == e[2] for x in FKS)]
        )
        b = self.rng.choice([e for e in FKS if e[0] == a[2]])
        ft, fc, mt, mc = a
        _, fc2, dt, dc2 = b
        key = self._cols(dt, "is", k=1)[0]
        aggs = ", ".join(
            f"{x} AS c{i}" for i, x in enumerate(self._aggs(ft, "f"))
        )
        return (
            f"SELECT d.{key} AS k0, {aggs} FROM {ft} f "
            f"JOIN {mt} m ON f.{fc} = m.{mc} "
            f"JOIN {dt} d ON m.{fc2} = d.{dc2} "
            f"WHERE {self._preds(ft, 'f')} "
            f"GROUP BY d.{key} ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def window_rownum(self) -> str:
        t = self.rng.choice(UNIQUE_PK)
        part = self._cols(t, "is", k=1)
        if not part:
            return self.filter_project()
        pk_cols = PK[t].split(", ")
        order_in = ", ".join(f"{c} ASC NULLS FIRST" for c in pk_cols)
        proj = f"{part[0]} AS c0, " + ", ".join(
            f"{c} AS c{i + 1}" for i, c in enumerate(pk_cols)
        )
        return (
            f"SELECT {proj}, row_number() OVER "
            f"(PARTITION BY {part[0]} ORDER BY {order_in}) AS rn "
            f"FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY {order_in} LIMIT {LIMIT}"
        )

    def left_outer_join(self) -> str:
        """dim LEFT JOIN fact — the preserved-row/NULL-extension planner
        path (r7 verdict ask #6). The dim side is the LEFT (every fact row
        matches a dim, so inner and left would coincide the other way
        round); a fact-side predicate goes INSIDE the ON clause half the
        time — the placement whose semantics (filter before preserving)
        an optimizer can get wrong when it converts outer to inner."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        on = f"d.{dc} = f.{fc}"
        if self.rng.random() < 0.5:
            on += f" AND {self._preds(ft, 'f')}"
        if self.rng.random() < 0.5:
            # aggregate face: count(*) counts dims, count(f.col) skips the
            # NULL-extended rows — both engines must agree on the split
            key = (self._cols(dt, "is", k=1) or [dc])[0]
            probe = self._cols(ft, "isdt", k=1) or [fc]
            return (
                f"SELECT d.{key} AS k0, count(*) AS c0, "
                f"count(f.{probe[0]}) AS c1 "
                f"FROM {dt} d LEFT JOIN {ft} f ON {on} "
                f"GROUP BY d.{key} ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
            )
        dcols = self._cols(dt, "isd", k=2)
        fcols = self._cols(ft, "isdt", k=1)
        items = [
            self._proj_item(dt, c, i, "d") for i, c in enumerate(dcols)
        ] + [
            self._proj_item(ft, c, len(dcols) + i, "f")
            for i, c in enumerate(fcols)
        ]
        order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(len(items)))
        return (
            f"SELECT {', '.join(items)} FROM {dt} d "
            f"LEFT JOIN {ft} f ON {on} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def having(self) -> str:
        """GROUP BY ... HAVING on an aggregate NOT in the SELECT list half
        the time — the post-aggregation filter path."""
        t = self.rng.choice(list(TABLES))
        keys = self._cols(t, "ist", k=1) or [PK[t].split(", ")[0]]
        aggs = ", ".join(f"{a} AS c{i}" for i, a in enumerate(self._aggs(t)))
        hv = f"count(*) > {self.rng.randint(1, 5)}"
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if ints and self.rng.random() < 0.5:
            hv = f"min({self.rng.choice(ints)}) >= 0"
        return (
            f"SELECT {keys[0]} AS k0, {aggs} FROM {t} "
            f"WHERE {self._preds(t)} GROUP BY {keys[0]} "
            f"HAVING {hv} ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def scalar_subquery(self) -> str:
        """Scalar subqueries: uncorrelated (one global aggregate in the
        WHERE) or correlated on an FK edge (per-row aggregate — the
        decorrelation planner path). Aggregates restricted to min/max/avg
        over INTEGER columns so the scalar is bit-identical across
        engines; an empty correlated group yields NULL, and NULL
        comparisons drop the row identically in both."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        ints_d = [c for c, k in TABLES[dt].items() if k == "i"]
        ints_f = [c for c, k in TABLES[ft].items() if k == "i"]
        if not ints_d or not ints_f:
            return self.filter_project()
        key = PK[dt].split(", ")[0]
        probe = self.rng.choice(ints_d)
        inner_col = self.rng.choice(ints_f)
        if self.rng.random() < 0.5:
            # correlated: per-dim aggregate over its fact group
            agg = self.rng.choice(["min", "max"])
            sub = (
                f"(SELECT {agg}(f.{inner_col}) FROM {ft} f "
                f"WHERE f.{fc} = d.{dc})"
            )
        else:
            agg = self.rng.choice(
                [f"min({inner_col})", f"max({inner_col})", f"avg({inner_col})"]
            )
            sub = f"(SELECT {agg} FROM {ft} WHERE {self._preds(ft)})"
        op = self.rng.choice(["<", "<=", ">", ">="])
        return (
            f"SELECT d.{key} AS c0, d.{probe} AS c1 FROM {dt} d "
            f"WHERE d.{probe} {op} {sub} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def union_all(self) -> str:
        """UNION ALL (multiset concat) or UNION (dedup) of two predicate
        slices of one table — bag vs set semantics must agree engine to
        engine, including duplicate rows that only one branch produces."""
        t = self.rng.choice(list(TABLES))
        cols = self._cols(t, "isdt", k=self.rng.randint(1, 3))
        if not cols:
            return self.filter_project()
        proj = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
        setop = "UNION ALL" if self.rng.random() < 0.7 else "UNION"
        order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(len(cols)))
        return (
            f"SELECT {proj} FROM {t} WHERE {self._preds(t)} "
            f"{setop} "
            f"SELECT {proj} FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def exists_semi(self) -> str:
        """EXISTS / NOT EXISTS correlated on an FK edge — the semi/anti
        join planner paths (Spark rewrites these to LeftSemi/LeftAnti; a
        wrong rewrite duplicates or drops preserved rows). The inner
        predicate sits on the fact side so both polarities stay
        selective; the outer projection leads with the dim's unique PK so
        the ORDER BY is total without leaning on tie-splitting."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        neg = "NOT " if self.rng.random() < 0.5 else ""
        key = PK[dt].split(", ")[0]
        probe = (self._cols(dt, "isd", k=1) or [dc])[0]
        return (
            f"SELECT d.{key} AS c0, d.{probe} AS c1 FROM {dt} d "
            f"WHERE {neg}EXISTS (SELECT 1 FROM {ft} f "
            f"WHERE f.{fc} = d.{dc} AND {self._preds(ft, 'f')}) "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST "
            f"LIMIT {LIMIT}"
        )

    def in_subquery(self) -> str:
        """col IN (SELECT …) / NOT IN — membership subqueries over a dim
        PK slice. NOT IN is the three-valued-logic trap (one inner NULL
        empties the result): the inner side filters IS NOT NULL, so the
        outcome is a theorem while Spark's null-aware anti-join path
        still executes (the planner can't see the column is never
        NULL)."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        neg = "NOT " if self.rng.random() < 0.5 else ""
        fcols = self._cols(ft, "isdt", k=self.rng.randint(1, 2))
        items = [self._proj_item(ft, c, i) for i, c in enumerate(fcols)]
        order = ", ".join(
            f"c{i} ASC NULLS FIRST" for i in range(len(items))
        )
        return (
            f"SELECT {', '.join(items)} FROM {ft} "
            f"WHERE {fc} {neg}IN (SELECT {dc} FROM {dt} "
            f"WHERE {self._preds(dt)} AND {dc} IS NOT NULL) "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def case_when(self) -> str:
        """CASE WHEN in the projection and — half the time — as a GROUP
        BY key (grouping on a derived expression). Branch predicates
        reuse the sampled literal pools; a NULL-valued branch predicate
        is not-matched in both engines (SQL three-valued CASE), and the
        ELSE arm guarantees every row lands in a bucket."""
        t = self.rng.choice(list(TABLES))
        expr = (
            f"CASE WHEN {self._pred(t)} THEN 'a' "
            f"WHEN {self._pred(t)} THEN 'b' ELSE 'z' END"
        )
        if self.rng.random() < 0.5:
            aggs = ", ".join(
                f"{a} AS c{i}" for i, a in enumerate(self._aggs(t))
            )
            return (
                f"SELECT {expr} AS k0, {aggs} FROM {t} "
                f"WHERE {self._preds(t)} GROUP BY {expr} "
                f"ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
            )
        c = (self._cols(t, "is", k=1) or [PK[t].split(", ")[0]])[0]
        return (
            f"SELECT {expr} AS c0, {c} AS c1 FROM {t} "
            f"WHERE {self._preds(t)} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST "
            f"LIMIT {LIMIT}"
        )

    def derived_table(self) -> str:
        """Aggregate over an aggregate — a derived table in FROM with an
        outer filter/re-aggregation. Exercises two-level aggregation and
        column pruning through a subquery boundary. Inner sums stay on
        integer columns, so the outer min/max/count over them is exact."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        ints = [c for c, k in TABLES[ft].items() if k == "i"]
        if not ints:
            return self.filter_project()
        mcol = self.rng.choice(ints)
        inner = (
            f"SELECT {fc} AS g, count(*) AS cnt, sum({mcol}) AS s "
            f"FROM {ft} WHERE {self._preds(ft)} GROUP BY {fc}"
        )
        if self.rng.random() < 0.5:
            return (
                f"SELECT g AS c0, cnt AS c1, s AS c2 FROM ({inner}) "
                f"WHERE cnt > {self.rng.randint(0, 3)} "
                f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
                f"c2 ASC NULLS FIRST LIMIT {LIMIT}"
            )
        return (
            f"SELECT count(*) AS c0, min(s) AS c1, max(cnt) AS c2 "
            f"FROM ({inner})"
        )

    def window_agg(self) -> str:
        """Running aggregate windows — sum/count OVER (PARTITION BY …
        ORDER BY pk ROWS UNBOUNDED PRECEDING..CURRENT ROW). Restricted to
        tables whose PK really is unique, so the in-window order is total
        and every prefix sum is a theorem; summed columns are integers."""
        t = self.rng.choice(UNIQUE_PK)
        part = self._cols(t, "is", k=1)
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if not part or not ints:
            return self.filter_project()
        pk = PK[t]
        mcol = self.rng.choice(ints)
        fn = self.rng.choice(
            [f"sum({mcol})", "count(*)", f"min({mcol})", f"max({mcol})"]
        )
        return (
            f"SELECT {part[0]} AS c0, {pk} AS c1, {mcol} AS c2, "
            f"{fn} OVER (PARTITION BY {part[0]} ORDER BY {pk} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c3 "
            f"FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY c1 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def intersect_except(self) -> str:
        """INTERSECT / EXCEPT (and their ALL variants) of two predicate
        slices of one table. Set semantics (dedup) vs bag semantics
        (multiset difference/min) must agree engine to engine; doubles
        and timestamps compare by the identical parquet bits."""
        t = self.rng.choice(list(TABLES))
        cols = self._cols(t, "isdt", k=self.rng.randint(1, 3))
        if not cols:
            return self.filter_project()
        proj = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
        op = self.rng.choice(["INTERSECT", "EXCEPT"])
        if self.rng.random() < 0.3:
            op += " ALL"
        order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(len(cols)))
        return (
            f"SELECT {proj} FROM {t} WHERE {self._preds(t)} "
            f"{op} "
            f"SELECT {proj} FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def rollup_grouping(self) -> str:
        """GROUP BY ROLLUP / CUBE / GROUPING SETS over 1-2 keys, with
        GROUPING(key) projected so super-aggregate NULLs are
        distinguishable from data NULLs. Every output column is in the
        ORDER BY, so a data-NULL group tying a rollup row on the key
        columns still sorts totally (the grouping flags and aggregates
        differ or the tuples are bit-identical).

        HAVING count(*) > 0 fences a REAL cross-engine semantic edge this
        template caught on first run: over an EMPTY filtered input, the
        () grouping set's grand-total row exists in DuckDB (ANSI: GROUP
        BY () is the plain global aggregate, one row with count 0) but
        not in Spark (grouping sets expand to an Expand + group-by-
        grouping-id, which emits nothing without input rows). On
        non-empty input every group has count >= 1, so the clause is an
        identity there and the compared result stays a theorem."""
        t = self.rng.choice(list(TABLES))
        keys = self._cols(t, "ist", k=2)
        if len(keys) < 2:
            return self.groupby_agg()
        a, b = keys
        form = self.rng.choice(
            [
                f"ROLLUP({a}, {b})",
                f"CUBE({a}, {b})",
                f"GROUPING SETS (({a}, {b}), ({a}), ())",
            ]
        )
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        agg = f"sum({self.rng.choice(ints)})" if ints else "count(*)"
        cols = [
            f"{a} AS k0",
            f"{b} AS k1",
            f"GROUPING({a}) AS g0",
            f"GROUPING({b}) AS g1",
            "count(*) AS c0",
            f"{agg} AS c1",
        ]
        order = ", ".join(
            f"{x} ASC NULLS FIRST" for x in ("k0", "k1", "g0", "g1", "c0", "c1")
        )
        return (
            f"SELECT {', '.join(cols)} FROM {t} WHERE {self._preds(t)} "
            f"GROUP BY {form} HAVING count(*) > 0 "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def full_outer_reconcile(self) -> str:
        """Two aggregates of the same fact table under different
        predicates, FULL JOINed on the group key — the two-sided
        preserved-row path (classic reconciliation shape). Group keys are
        unique per side by construction, so the join fans out nothing;
        COALESCE re-merges the key across the NULL-extended sides."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        ints = [c for c, k in TABLES[ft].items() if k == "i"]
        if not ints:
            return self.filter_project()
        mcol = self.rng.choice(ints)
        side = (
            f"SELECT {fc} AS g, count(*) AS cnt, sum({mcol}) AS s "
            f"FROM {ft} WHERE {{p}} GROUP BY {fc}"
        )
        sa = side.format(p=self._preds(ft))
        sb = side.format(p=self._preds(ft))
        return (
            f"SELECT coalesce(a.g, b.g) AS c0, a.cnt AS c1, b.cnt AS c2, "
            f"a.s AS c3, b.s AS c4 "
            f"FROM ({sa}) a FULL JOIN ({sb}) b ON a.g = b.g "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
            f"c2 ASC NULLS FIRST, c3 ASC NULLS FIRST, c4 ASC NULLS FIRST "
            f"LIMIT {LIMIT}"
        )

    def cte_reuse(self) -> str:
        """One WITH-clause aggregate referenced TWICE (self-join on the
        unique group key) — the CTE dedup/inline planner decision. A
        one-sided extra predicate keeps the two references from being
        trivially identical scans."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        ints = [c for c, k in TABLES[ft].items() if k == "i"]
        if not ints:
            return self.filter_project()
        mcol = self.rng.choice(ints)
        return (
            f"WITH base AS (SELECT {fc} AS g, count(*) AS cnt, "
            f"sum({mcol}) AS s FROM {ft} WHERE {self._preds(ft)} "
            f"GROUP BY {fc}) "
            f"SELECT a.g AS c0, a.cnt AS c1, b.s AS c2 "
            f"FROM base a JOIN base b ON a.g = b.g "
            f"WHERE a.cnt > {self.rng.randint(0, 3)} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
            f"c2 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def limit_offset(self) -> str:
        """ORDER BY … LIMIT … OFFSET pagination. The ORDER BY covers ALL
        output columns, so any tie rows are bit-identical tuples and the
        [offset, offset+limit) window is a deterministic multiset no
        matter how either engine splits the tie."""
        t = self.rng.choice(list(TABLES))
        cols = self._cols(t, "isdt", k=self.rng.randint(2, 4))
        if not cols:
            return self.filter_project()
        proj = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
        order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(len(cols)))
        return (
            f"SELECT {proj} FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY {order} LIMIT {self.rng.randint(20, LIMIT)} "
            f"OFFSET {self.rng.randint(1, 200)}"
        )

    def agg_filter(self) -> str:
        """Aggregate FILTER clauses — per-aggregate predicates inside one
        grouping pass (the pivot/conditional-count planner path; Spark
        compiles FILTER to an If inside the aggregate buffer update). An
        all-false filter must yield count 0 / sum NULL identically in
        both engines."""
        t = self.rng.choice(list(TABLES))
        keys = self._cols(t, "ist", k=1) or [PK[t].split(", ")[0]]
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        aggs = [
            "count(*) AS c0",
            f"count(*) FILTER (WHERE {self._pred(t)}) AS c1",
        ]
        if ints:
            mcol = self.rng.choice(ints)
            aggs.append(
                f"sum({mcol}) FILTER (WHERE {self._pred(t)}) AS c2"
            )
        return (
            f"SELECT {keys[0]} AS k0, {', '.join(aggs)} FROM {t} "
            f"WHERE {self._preds(t)} GROUP BY {keys[0]} "
            f"ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def multi_distinct(self) -> str:
        """Several DISTINCT aggregates over DIFFERENT columns in one
        GROUP BY — Spark plans this with an Expand (one replica of every
        input row per distinct group), a path single-distinct queries
        never touch; a wrong grouping-id filter double-counts. All
        counts are exact integers in both engines."""
        t = self.rng.choice(list(TABLES))
        cands = [c for c, k in TABLES[t].items() if k in "isdt"]
        if len(cands) < 3:
            return self.groupby_agg()
        self.rng.shuffle(cands)
        a, b = cands[0], cands[1]
        keys = self._cols(t, "ist", k=1) or [PK[t].split(", ")[0]]
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        extra = f", sum({self.rng.choice(ints)}) AS c3" if ints else ""
        return (
            f"SELECT {keys[0]} AS k0, count(DISTINCT {a}) AS c0, "
            f"count(DISTINCT {b}) AS c1, count(*) AS c2{extra} "
            f"FROM {t} WHERE {self._preds(t)} GROUP BY {keys[0]} "
            f"ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def lead_lag(self) -> str:
        """lead/lag offset windows (with an explicit integer default half
        the time) over a unique-PK total in-window order — the
        offset-window frame path. Restricted to integer value columns so
        the default literal's type matches exactly."""
        t = self.rng.choice(UNIQUE_PK)
        part = self._cols(t, "is", k=1)
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if not part or not ints:
            return self.filter_project()
        pk = PK[t]
        mcol = self.rng.choice(ints)
        off = self.rng.randint(1, 3)
        fn = self.rng.choice(["lag", "lead"])
        dflt = f", {self.rng.randint(-9, 0)}" if self.rng.random() < 0.5 else ""
        return (
            f"SELECT {part[0]} AS c0, {pk} AS c1, {mcol} AS c2, "
            f"{fn}({mcol}, {off}{dflt}) OVER "
            f"(PARTITION BY {part[0]} ORDER BY {pk}) AS c3 "
            f"FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY c1 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def range_frame(self) -> str:
        """Value-RANGE window frames (RANGE BETWEEN n PRECEDING AND
        CURRENT ROW) ordered by an integer column that need NOT be
        unique: a RANGE frame includes ALL peers of the current value,
        so the aggregate is a pure function of (partition, order value)
        and stays a theorem under ties — unlike ROWS frames, which this
        template deliberately avoids on non-unique orders."""
        t = self.rng.choice(list(TABLES))
        part = self._cols(t, "s", k=1)
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if not part or not ints:
            return self.filter_project()
        ocol = self.rng.choice(ints)
        mcol = self.rng.choice(ints)
        span = self.rng.randint(1, 1000)
        fn = self.rng.choice([f"sum({mcol})", "count(*)", f"min({mcol})"])
        return (
            f"SELECT {part[0]} AS c0, {ocol} AS c1, "
            f"{fn} OVER (PARTITION BY {part[0]} ORDER BY {ocol} "
            f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW) AS c2 "
            f"FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
            f"c2 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def null_logic(self) -> str:
        """Three-valued logic on MANUFACTURED nulls: NULLIF plants NULLs
        in a non-null column, COALESCE collapses them back, IS [NOT]
        DISTINCT FROM compares through them (the null-safe-equality
        operator both engines define identically). The data itself has
        no NULLs here — every NULL in flight came from NULLIF, so the
        result is pure logic, not data luck."""
        t = self.rng.choice(list(TABLES))
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if len(ints) < 2:
            return self.filter_project()
        a, b = self.rng.sample(ints, 2)
        vals = self.sampler.values(t, a)
        v = _lit("i", self.rng.choice(vals)) if vals else "0"
        neg = "NOT " if self.rng.random() < 0.5 else ""
        if self.rng.random() < 0.5:
            return (
                f"SELECT {a} AS c0, coalesce(NULLIF({a}, {v}), -1) AS c1, "
                f"CASE WHEN NULLIF({a}, {v}) IS {neg}DISTINCT FROM {b} "
                f"THEN 1 ELSE 0 END AS c2 "
                f"FROM {t} WHERE {self._preds(t)} "
                f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
                f"c2 ASC NULLS FIRST LIMIT {LIMIT}"
            )
        return (
            f"SELECT count(*) AS c0, count(NULLIF({a}, {v})) AS c1, "
            f"min(coalesce(NULLIF({a}, {v}), {b})) AS c2 "
            f"FROM {t} WHERE {self._preds(t)}"
        )

    def small_inequality_join(self) -> str:
        """Pure-inequality theta joins over the bounded dims (region 5,
        nation 25 rows) — the nested-loop/cartesian planner path no
        equi-join template reaches. Output is at most 625 pairs, so the
        quadratic shape is intentional and safe at every scale."""
        t = self.rng.choice(["nation", "region"])
        k = PK[t]
        probe = (self._cols(t, "s", k=1) or [k])[0]
        op = self.rng.choice(["<", "<=", "<>"])
        extra = ""
        if t == "nation" and self.rng.random() < 0.5:
            extra = " AND a.n_regionkey = b.n_regionkey"
        return (
            f"SELECT a.{k} AS c0, b.{k} AS c1, a.{probe} AS c2, "
            f"b.{probe} AS c3 "
            f"FROM {t} a JOIN {t} b ON a.{k} {op} b.{k}{extra} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
            f"c2 ASC NULLS FIRST, c3 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def date_parts(self) -> str:
        """Timestamp decomposition as grouping keys — extract(year/
        month/day) and date_trunc — the expression-grouping path over
        temporal data. Both engines define these identically for UTC
        timestamps (the only kind the corpus contains). date_trunc is
        CAST to DATE — legal at the day-or-coarser granularities used
        here — because the engines' native return types differ (DuckDB
        gives DATE for year/month, Spark always TIMESTAMP)."""
        cands = [
            (t, c) for t, cols in TABLES.items()
            for c, k in cols.items() if k == "t"
        ]
        t, c = self.rng.choice(cands)
        part = self.rng.choice(["year", "month", "day"])
        if self.rng.random() < 0.5:
            key = f"extract({part} FROM {c})"
        else:
            key = f"CAST(date_trunc('{part}', {c}) AS DATE)"
        ints = [cc for cc, k in TABLES[t].items() if k == "i"]
        agg = f"sum({self.rng.choice(ints)})" if ints else "count(*)"
        return (
            f"SELECT {key} AS k0, count(*) AS c0, {agg} AS c1 FROM {t} "
            f"WHERE {self._preds(t)} GROUP BY {key} "
            f"ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def topn_per_group(self) -> str:
        """Top-n per group: row_number over a unique-PK in-window order,
        filtered rn <= k OUTSIDE the window subquery — the ranked-window
        filter (LATERAL-top-n decorrelation) path, and the shape Spark's
        WindowGroupLimit pushdown optimizes. Unique PK keeps every rank
        a theorem."""
        t = self.rng.choice(UNIQUE_PK)
        part = self._cols(t, "is", k=1)
        if not part:
            return self.filter_project()
        pk = PK[t]
        n = self.rng.randint(1, 4)
        probe = (self._cols(t, "isdt", k=1) or [pk])[0]
        return (
            f"SELECT c0, c1, c2, rn FROM ("
            f"SELECT {part[0]} AS c0, {pk} AS c1, {probe} AS c2, "
            f"row_number() OVER (PARTITION BY {part[0]} ORDER BY {pk}) AS rn "
            f"FROM {t} WHERE {self._preds(t)}) "
            f"WHERE rn <= {n} "
            f"ORDER BY c1 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def values_inline(self) -> str:
        """Inline VALUES relation joined as a tiny literal dimension —
        the LocalRelation/inline-table path (constant folding, literal
        broadcast). Join values come from the sampled live pool so the
        join selects real rows; restricted to int/string equality."""
        ft = self.rng.choice(list(TABLES))
        cands = [c for c, k in TABLES[ft].items() if k in "is"]
        if not cands:
            return self.filter_project()
        c = self.rng.choice(cands)
        kind = TABLES[ft][c]
        vals = self.sampler.values(ft, c)
        if len(vals) < 2:
            return self.filter_project()
        n = self.rng.randint(2, min(5, len(vals)))
        rows = ", ".join(f"({_lit(kind, v)})" for v in vals[:n])
        if self.rng.random() < 0.5:
            aggs = ", ".join(
                f"{a} AS c{i}" for i, a in enumerate(self._aggs(ft, "t"))
            )
            return (
                f"SELECT v.a AS k0, {aggs} FROM (VALUES {rows}) AS v(a) "
                f"JOIN {ft} t ON t.{c} = v.a GROUP BY v.a "
                f"ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
            )
        cols = self._cols(ft, "isdt", k=2) or [c]
        items = [self._proj_item(ft, cc, i, "t") for i, cc in enumerate(cols)]
        order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(len(items)))
        return (
            f"SELECT {', '.join(items)} FROM (VALUES {rows}) AS v(a) "
            f"JOIN {ft} t ON t.{c} = v.a WHERE {self._preds(ft, 't')} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def like_patterns(self) -> str:
        """LIKE beyond _pred's prefix form: suffix, infix, '_' wildcard,
        and NOT LIKE — the pattern-translation paths (prefix ranges,
        contains, regex fallback). Fragments come from sampled live
        values with %/_ stripped first, so the wildcard structure is the
        generator's and matches are guaranteed to exist for the positive
        forms."""
        t = self.rng.choice(list(TABLES))
        scols = [c for c, k in TABLES[t].items() if k == "s"]
        if not scols:
            return self.filter_project()
        c = self.rng.choice(scols)
        vals = [
            # fragments are PATTERN MATERIAL, not exact-match literals:
            # strip every char with special meaning in a quoted LIKE —
            # %/_ (wildcards), ' (quoting; '' doubling before slicing can
            # split across a slice boundary into an unbalanced literal),
            # and \ (Spark's LIKE escape char)
            str(v).replace("%", "").replace("_", "")
            .replace("'", "").replace("\\", "")
            for v in self.sampler.values(t, c)
            if v is not None
        ]
        vals = [v for v in vals if len(v) >= 3]
        if not vals:
            return self.filter_project()
        v = self.rng.choice(vals)
        form = self.rng.randrange(4)
        if form == 0:
            pat = v[: self.rng.randint(1, 3)] + "%"
        elif form == 1:
            pat = "%" + v[-self.rng.randint(1, 3):]
        elif form == 2:
            mid = v[len(v) // 2: len(v) // 2 + self.rng.randint(1, 2)] or v[:1]
            pat = "%" + mid + "%"
        else:
            pat = "_" + v[1: self.rng.randint(2, 3)] + "%"
        neg = "NOT " if self.rng.random() < 0.3 else ""
        extra = self._cols(t, "idt", k=1)
        items = [f"{c} AS c0"] + [
            self._proj_item(t, cc, i + 1) for i, cc in enumerate(extra)
        ]
        order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(len(items)))
        return (
            f"SELECT {', '.join(items)} FROM {t} "
            f"WHERE {c} {neg}LIKE '{pat}' "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def first_last_frame(self) -> str:
        """first_value / last_value / nth_value over EXPLICIT bounded
        ROWS frames on a unique-PK in-window order — the sliding-buffer
        frame evaluators. The frame is always written out because
        last_value's ANSI default frame ends at CURRENT ROW (a classic
        silent-wrong-answer trap this template would catch if either
        engine defaulted differently)."""
        t = self.rng.choice(UNIQUE_PK)
        pk = PK[t]
        vcols = self._cols(t, "isd", k=1)
        if not vcols:
            return self.filter_project()
        v = vcols[0]
        part = self._cols(t, "s", k=1)
        over_part = (
            f"PARTITION BY {part[0]} "
            if part and self.rng.random() < 0.6
            else ""
        )
        lo, hi = self.rng.randint(1, 3), self.rng.randint(0, 3)
        fn = self.rng.choice(
            [f"first_value({v})", f"last_value({v})", f"nth_value({v}, 2)"]
        )
        return (
            f"SELECT {pk} AS c0, {v} AS c1, {fn} OVER ({over_part}"
            f"ORDER BY {pk} ASC NULLS FIRST "
            f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) AS c2 "
            f"FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY c0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def ntile_dist(self) -> str:
        """Rank-distribution functions on unique total orders: ntile(k)
        (remainder-first bucket fill), percent_rank ((rank-1)/(n-1), one
        double division of identical ints — bit-identical), cume_dist.
        Unique in-window keys make every value a theorem; the n=1
        partition edge (percent_rank's 0/0 → 0) is reachable and must
        agree."""
        t = self.rng.choice(UNIQUE_PK)
        pk = PK[t]
        part = self._cols(t, "s", k=1)
        over_part = (
            f"PARTITION BY {part[0]} "
            if part and self.rng.random() < 0.5
            else ""
        )
        k = self.rng.randint(2, 7)
        over = f"OVER ({over_part}ORDER BY {pk} ASC NULLS FIRST)"
        return (
            f"SELECT {pk} AS c0, ntile({k}) {over} AS c1, "
            f"percent_rank() {over} AS c2, cume_dist() {over} AS c3 "
            f"FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY c0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def having_scalar_sub(self) -> str:
        """HAVING compared against an uncorrelated scalar subquery — two
        independent aggregate subtrees in one query, the RHS folding to
        a runtime constant. min/max over ints keep the scalar exact; an
        empty subquery yields NULL and drops every group identically in
        both engines."""
        ft = self.rng.choice(["lineitem", "orders", "events", "customer"])
        ints = [c for c, k in TABLES[ft].items() if k == "i"]
        key = self._cols(ft, "ist", k=1) or [PK[ft].split(", ")[0]]
        col = self.rng.choice(ints)
        agg = self.rng.choice(["min", "max"])
        op = self.rng.choice(["<", "<=", ">", ">="])
        sub = f"(SELECT {agg}({col}) FROM {ft} WHERE {self._preds(ft)})"
        return (
            f"SELECT {key[0]} AS k0, count(*) AS c0, max({col}) AS c1 "
            f"FROM {ft} GROUP BY {key[0]} "
            f"HAVING max({col}) {op} {sub} "
            f"ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def chained_cte(self) -> str:
        """A WITH chain where the second CTE consumes the first (filter →
        group → regroup) — sequential CTE composition, the inline-vs-
        materialize decision on a linear dependency (cte_reuse covers the
        fan-out shape). All aggregates integer-exact."""
        t = self.rng.choice(list(TABLES))
        keys = self._cols(t, "ist", k=2)
        if len(keys) < 2:
            return self.filter_project()
        k1, k2 = keys
        return (
            f"WITH a AS (SELECT {k1} AS x, {k2} AS y FROM {t} "
            f"WHERE {self._preds(t)}), "
            f"b AS (SELECT x, y, count(*) AS n FROM a GROUP BY x, y) "
            f"SELECT x AS c0, count(*) AS c1, sum(n) AS c2, max(n) AS c3 "
            f"FROM b GROUP BY x ORDER BY c0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def self_join(self) -> str:
        """Self-join pairs on an equality column with a.pk < b.pk
        dedup — both join inputs share one scan lineage (exchange/scan
        reuse decisions). Restricted to the three smallest dims so the
        pair count stays bounded at any sf (supplier's worst case,
        |T|²/25 nation buckets, is ~4M pairs at gen-sf1)."""
        t = self.rng.choice(["region", "nation", "supplier"])
        pk = PK[t]
        eq_cands = [
            c for c, k in TABLES[t].items() if k in "is" and c != pk
        ]
        c = self.rng.choice(eq_cands)
        if self.rng.random() < 0.4:
            return (
                f"SELECT a.{c} AS k0, count(*) AS c0 "
                f"FROM {t} a JOIN {t} b "
                f"ON a.{c} = b.{c} AND a.{pk} < b.{pk} "
                f"GROUP BY a.{c} ORDER BY k0 ASC NULLS FIRST LIMIT {LIMIT}"
            )
        return (
            f"SELECT a.{pk} AS c0, b.{pk} AS c1, a.{c} AS c2 "
            f"FROM {t} a JOIN {t} b ON a.{c} = b.{c} AND a.{pk} < b.{pk} "
            f"WHERE {self._preds(t, 'a')} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
            f"c2 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def int_arith(self) -> str:
        """Integer expression arithmetic in projections: + - *small-const
        %positive-const (all operands nonnegative keys/counts, far from
        64-bit edges, so ANSI overflow never fires), NULLIF-guarded /
        (both engines divide ints to DOUBLE on identical operands —
        bit-identical), and int↔string CAST round-trips (CAST AS STRING
        — the spelling both parsers accept; integer formatting has no
        locale/scientific variance)."""
        t = self.rng.choice(list(TABLES))
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if not ints:
            return self.filter_project()
        a = self.rng.choice(ints)
        b = self.rng.choice(ints)
        k = self.rng.randint(2, 9)
        exprs = [
            f"{a} + {b} AS c0",
            f"{a} * {k} AS c1",
            f"{a} % {k} AS c2",
            f"{a} / NULLIF({b}, 0) AS c3",
            f"CAST(CAST({a} AS STRING) AS BIGINT) AS c4",
            f"length(CAST({a} AS STRING)) AS c5",
        ]
        order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(6))
        return (
            f"SELECT {', '.join(exprs)} FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def join_window(self) -> str:
        """Window over a join result — the rule-interaction seam between
        join planning and window planning (predicate pushdown through a
        Window, partial-order preservation). In-window order is the
        fact's UNIQUE pk so every rank is a theorem; lineitem is
        excluded (duplicate pk pairs)."""
        cands = [
            (ft, fc, dt, dc)
            for ft, fc, dt, dc in FKS
            if ft in UNIQUE_PK
        ]
        ft, fc, dt, dc = self.rng.choice(cands)
        pk = PK[ft]
        dkey = (self._cols(dt, "is", k=1) or [dc])[0]
        probe = (self._cols(ft, "isdt", k=1) or [pk])[0]
        n = self.rng.randint(1, 4)
        return (
            f"SELECT c0, c1, c2, rn FROM ("
            f"SELECT d.{dkey} AS c0, f.{pk} AS c1, f.{probe} AS c2, "
            f"row_number() OVER (PARTITION BY d.{dkey} "
            f"ORDER BY f.{pk} ASC NULLS FIRST) AS rn "
            f"FROM {ft} f JOIN {dt} d ON f.{fc} = d.{dc} "
            f"WHERE {self._preds(ft, 'f')}) "
            f"WHERE rn <= {n} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def union_reagg(self) -> str:
        """Aggregate over a UNION ALL of two aggregates — set-op under
        aggregate composition (partial-agg pushthrough-union is a real
        optimizer rule; both branches share one table so scan reuse is
        also in play). Integer-exact throughout."""
        t = self.rng.choice(list(TABLES))
        keys = self._cols(t, "is", k=1)
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if not keys or not ints:
            return self.filter_project()
        k1, col = keys[0], self.rng.choice(ints)
        branch = (
            f"SELECT {k1} AS k, count(*) AS n, sum({col}) AS s "
            f"FROM {t} WHERE {{p}} GROUP BY {k1}"
        )
        return (
            f"SELECT k AS c0, count(*) AS c1, sum(n) AS c2, sum(s) AS c3 "
            f"FROM ({branch.format(p=self._preds(t))} UNION ALL "
            f"{branch.format(p=self._preds(t))}) u "
            f"GROUP BY k ORDER BY c0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def agg_join_agg(self) -> str:
        """Inner join of two independently-aggregated subqueries on the
        group key — aggregate-below-join on BOTH sides (the reconcile
        shape full_outer_reconcile covers for outer joins, here the
        planner may reorder/broadcast freely). Keys come from the same
        fact FK so the join actually matches."""
        ft, fc, dt, dc = self.rng.choice(FKS)
        ints = [c for c, k in TABLES[ft].items() if k == "i"]
        if not ints:
            return self.filter_project()
        col = self.rng.choice(ints)
        return (
            f"SELECT a.k AS c0, a.n AS c1, b.n AS c2, a.s AS c3 "
            f"FROM (SELECT {fc} AS k, count(*) AS n, sum({col}) AS s "
            f"FROM {ft} WHERE {self._preds(ft)} GROUP BY {fc}) a "
            f"JOIN (SELECT {fc} AS k, count(*) AS n "
            f"FROM {ft} WHERE {self._preds(ft)} GROUP BY {fc}) b "
            f"ON a.k = b.k "
            f"ORDER BY c0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def rank_of_groups(self) -> str:
        """rank()/dense_rank() over GROUP BY output ordered by the
        integer aggregate WITH the group key as tiebreak — window over
        aggregate composition where the rank stays a theorem even when
        aggregate values tie (the key breaks every tie
        deterministically)."""
        t = self.rng.choice(list(TABLES))
        keys = self._cols(t, "is", k=1)
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        if not keys or not ints:
            return self.filter_project()
        k1, col = keys[0], self.rng.choice(ints)
        fn = self.rng.choice(["rank()", "dense_rank()", "row_number()"])
        agg = self.rng.choice([f"sum({col})", "count(*)"])
        return (
            f"SELECT k AS c0, s AS c1, {fn} OVER "
            f"(ORDER BY s DESC NULLS FIRST, k ASC NULLS FIRST) AS c2 "
            f"FROM (SELECT {k1} AS k, {agg} AS s FROM {t} "
            f"WHERE {self._preds(t)} GROUP BY {k1}) g "
            f"ORDER BY c2 ASC NULLS FIRST, c0 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def cross_join_small(self) -> str:
        """Explicit CROSS JOIN of the two tiny dims (≤25×5 rows at any
        sf) with a filter over the product — the cartesian-product
        planner path, which every other template forbids. Bounded by
        construction, never by luck."""
        a, b = ("nation", "region") if self.rng.random() < 0.7 else (
            "region", "nation"
        )
        pa, pb = PK[a], PK[b]
        cols_a = self._cols(a, "is", k=1) or [pa]
        pred = (
            self._pred(a, "a")
            if self.rng.random() < 0.5
            else f"a.{pa} <> b.{pb}"
        )
        return (
            f"SELECT a.{pa} AS c0, b.{pb} AS c1, a.{cols_a[0]} AS c2 "
            f"FROM {a} a CROSS JOIN {b} b WHERE {pred} "
            f"ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST, "
            f"c2 ASC NULLS FIRST LIMIT {LIMIT}"
        )

    def distinct(self) -> str:
        t = self.rng.choice(list(TABLES))
        cols = self._cols(t, "is", k=self.rng.randint(1, 2))
        if not cols:
            return self.filter_project()
        proj = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
        order = ", ".join(
            f"c{i} ASC NULLS FIRST" for i in range(len(cols))
        )
        return (
            f"SELECT DISTINCT {proj} FROM {t} WHERE {self._preds(t)} "
            f"ORDER BY {order} LIMIT {LIMIT}"
        )

    def next_query(self) -> str:
        choices = [
            (self.filter_project, 14),
            (self.groupby_agg, 17),
            (self.join, 14),
            (self.two_hop_join, 7),
            (self.window_rownum, 9),
            (self.distinct, 9),
            (self.left_outer_join, 9),
            (self.having, 7),
            (self.scalar_subquery, 7),
            (self.union_all, 7),
            (self.exists_semi, 7),
            (self.in_subquery, 7),
            (self.case_when, 7),
            (self.derived_table, 7),
            (self.window_agg, 7),
            (self.intersect_except, 6),
            (self.rollup_grouping, 6),
            (self.full_outer_reconcile, 6),
            (self.cte_reuse, 6),
            (self.limit_offset, 6),
            (self.agg_filter, 6),
            (self.multi_distinct, 6),
            (self.lead_lag, 6),
            (self.range_frame, 6),
            (self.null_logic, 6),
            (self.small_inequality_join, 5),
            (self.date_parts, 6),
            (self.topn_per_group, 6),
            (self.values_inline, 6),
            (self.like_patterns, 6),
            (self.first_last_frame, 6),
            (self.ntile_dist, 5),
            (self.having_scalar_sub, 5),
            (self.chained_cte, 5),
            (self.self_join, 5),
            (self.int_arith, 6),
            (self.join_window, 6),
            (self.union_reagg, 5),
            (self.agg_join_agg, 5),
            (self.rank_of_groups, 5),
            (self.cross_join_small, 4),
        ]
        # FUZZ_TEMPLATES=name[,name...] restricts generation to the named
        # templates — the per-construct-class battery mode (e.g. 200
        # left_outer_join-only queries per scale)
        only = {
            s for s in os.environ.get("FUZZ_TEMPLATES", "").split(",") if s
        }
        if only:
            choices = [(f, w) for f, w in choices if f.__name__ in only]
            if not choices:
                raise SystemExit(f"FUZZ_TEMPLATES matched nothing: {only}")
        f = self.rng.choices(
            [c[0] for c in choices], weights=[c[1] for c in choices]
        )[0]
        return f()


def _norm(v):
    if isinstance(v, Decimal):
        iv = int(v)
        return iv if v == iv else float(v)
    if isinstance(v, float):
        return 0.0 if v == 0.0 else v
    if hasattr(v, "isoformat"):  # date/datetime (tz dropped: same instant,
        return v.replace(tzinfo=None).isoformat() if hasattr(v, "tzinfo") else v.isoformat()
    return v


def _multiset(rows) -> dict:
    out: dict = {}
    for r in rows:
        k = tuple(_norm(v) for v in r)
        out[k] = out.get(k, 0) + 1
    return out


def run(sf_dir: str, n: int, seed: int) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    from mapreduce_model_spark.registry import TABLES as TNAMES, table
    from mapreduce_model_spark.session import get_spark

    t0 = time.time()
    con = duckdb.connect()
    for t in TNAMES:
        path = f"{sf_dir}/{t}.parquet"
        # harness tables are single files; Spark-generated ones (datagen.py)
        # are directories of part files — same handling as oracle_harness
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    spark = get_spark(app_name="fuzz", cpus=8)
    for t in TNAMES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)

    rng = random.Random(seed)
    gen = Gen(rng, Sampler(con))
    fails = skipped = checked = 0
    for i in range(n):
        sql = gen.next_query()
        try:
            want = _multiset(con.execute(sql).fetchall())
        except Exception as ex:  # noqa: BLE001 — a skip, not a divergence
            skipped += 1
            print(f"SKIP q{i} (duckdb {type(ex).__name__}): {sql}")
            continue
        try:
            got = _multiset(tuple(r) for r in spark.sql(sql).collect())
        except Exception as ex:  # noqa: BLE001
            skipped += 1
            print(f"SKIP q{i} (spark {type(ex).__name__}: {ex}): {sql}")
            continue
        checked += 1
        if got != want:
            fails += 1
            only_s = [k for k in got if got[k] != want.get(k)][:3]
            only_d = [k for k in want if want[k] != got.get(k)][:3]
            print(
                f"FAIL q{i}: {sql}\n  spark rows={sum(got.values())} "
                f"duckdb rows={sum(want.values())}\n"
                f"  spark-only sample: {only_s}\n  duckdb-only sample: {only_d}"
            )
    secs = int(time.time() - t0)
    print(
        f"FUZZDONE checked={checked} fails={fails} skipped={skipped} "
        f"seed={seed} secs={secs}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    sys.exit(run(sf_dir, n, seed))
