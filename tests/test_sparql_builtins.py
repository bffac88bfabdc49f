"""Round-5 session-3 SPARQL builtins: numeric arithmetic in BIND
(+ - * /), ABS/CEIL/FLOOR/ROUND, IF(), STRBEFORE/STRAFTER,
ENCODE_FOR_URI, STRLANG/STRDT, isNumeric/isBlank/langMatches/sameTerm
filters, SELECT REDUCED, and negated property sets (!p, !(p|q)).

Semantics pinned here (spec references in each test):
- xsd:round = round half toward +infinity (ROUND(2.5)=3, ROUND(-2.5)=-2)
- division by zero / non-numeric operand -> unbound (type error)
- STRBEFORE with absent separator -> "" (bound empty), unbound -> unbound
- ENCODE_FOR_URI keeps only unreserved [A-Za-z0-9~._-]
"""

import os

import pyarrow as pa
import pytest

from kgforge.sparql import SparqlError, execute_sparql, parse_sparql

NS = "http://ex.org/"


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    import ray.data

    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = []
    for k in range(12):
        rows.append((f"{NS}it{k}", NS + "w", f'"{(k * 7) % 10}"'))
        name = (f'"item {k} x"@en-US' if k % 3 == 0
                else f'"item {k} x"@en' if k % 3 == 1
                else f'"item {k} x"')
        rows.append((f"{NS}it{k}", NS + "name", name))
        if k % 3 == 0:
            rows.append((f"{NS}it{k}", NS + "link",
                         f"<{NS}it{(k + 1) % 12}>"))
    # one blank-node-subject row (bulk-loaded Turtle can carry these)
    rows.append(("_:b0", NS + "w", '"3"'))
    tbl = pa.table({
        "s": pa.array([r[0] for r in rows], pa.string()),
        "p": pa.array([r[1] for r in rows], pa.string()),
        "o": pa.array([r[2] for r in rows], pa.string()),
    })
    d = str(tmp_path_factory.mktemp("bstore") / "st")
    os.makedirs(d)
    write_graph_partitioned(ray.data.from_arrow(tbl), d)
    return d


def _rows(store, q):
    df = execute_sparql(store, parse_sparql(q)[0]).to_pandas()
    if len(df) == 0:
        return []
    df = df.fillna("NULL")
    return sorted(map(tuple, df[sorted(df.columns)]
                      .itertuples(index=False)))


# ------------------------------------------------------- arithmetic

def test_bind_arith_abs(store):
    got = _rows(store, f"""
SELECT ?s ?d WHERE {{
  ?s <{NS}w> ?w . BIND(ABS(?w - 5) AS ?d) FILTER(?d >= 4)
}}""")
    # w = (k*7)%10; |w-5| >= 4 -> w in {0,1,9}; columns sort (d, s)
    want = sorted((str(abs((k * 7) % 10 - 5)), f"{NS}it{k}")
                  for k in range(12) if abs((k * 7) % 10 - 5) >= 4)
    assert got == want


def test_bind_arith_precedence(store):
    # 2 + w * 10 must parse as 2 + (w*10), not (2+w)*10
    got = _rows(store, f"""
SELECT ?v WHERE {{
  <{NS}it1> <{NS}w> ?w . BIND(2 + ?w * 10 AS ?v)
}}""")
    assert got == [("72",)]          # w=7 -> 72
    got = _rows(store, f"""
SELECT ?v WHERE {{
  <{NS}it1> <{NS}w> ?w . BIND((2 + ?w) * 10 AS ?v)
}}""")
    assert got == [("90",)]


def test_round_half_up_and_floor_ceil(store):
    # xsd:fn round: half toward +inf — ROUND(3.5)=4 and ROUND(-0.5)=0
    got = _rows(store, f"""
SELECT ?r ?nr ?f ?c WHERE {{
  <{NS}it1> <{NS}w> ?w .
  BIND(ROUND(?w / 2) AS ?r)        # 3.5 -> 4
  BIND(ROUND((0 - ?w) / 2) AS ?nr) # -3.5 -> -3
  BIND(FLOOR(?w / 2) AS ?f)
  BIND(CEIL(?w / 2) AS ?c)
}}""")
    assert got == [("4", "3", "-3", "4")]   # columns sort (c, f, nr, r)


def test_division_by_zero_unbinds(store):
    got = _rows(store, f"""
SELECT ?s ?q WHERE {{
  ?s <{NS}w> ?w . BIND(10 / (?w - 7) AS ?q)
  FILTER(?s = <{NS}it4>)
}}""")
    # it4: w=8 -> 10/1 = 10 ; it1/it11 (w=7) would be unbound
    assert got == [("10", f"{NS}it4")]      # columns sort (q, s)
    got = _rows(store, f"""
SELECT ?q WHERE {{
  <{NS}it1> <{NS}w> ?w . BIND(10 / (?w - 7) AS ?q)
}}""")
    assert got == [("NULL",)]        # bound row, unbound alias


def test_non_numeric_operand_unbinds(store):
    got = _rows(store, f"""
SELECT ?v WHERE {{
  <{NS}it2> <{NS}name> ?n . BIND(?n + 1 AS ?v)
}}""")
    assert got == [("NULL",)]


def test_if_expression(store):
    got = _rows(store, f"""
SELECT ?s ?t WHERE {{
  ?s <{NS}w> ?w . BIND(IF(?w < 5, "lo", "hi") AS ?t)
  FILTER(?s = <{NS}it0>)
}}""")
    assert got == [(f"{NS}it0", '"lo"')]
    # IF over an unbound condition var raises (subset: explicit error
    # beats a silently-arbitrary branch)
    with pytest.raises(SparqlError):
        _rows(store, f"""
SELECT ?t WHERE {{
  <{NS}it0> <{NS}w> ?w . BIND(IF(?nope < 5, "a", "b") AS ?t)
}}""")


# ---------------------------------------------------------- strings

def test_strbefore_strafter(store):
    got = _rows(store, f"""
SELECT ?b ?a ?missing WHERE {{
  <{NS}it5> <{NS}name> ?n .
  BIND(STRBEFORE(STR(?n), " ") AS ?b)
  BIND(STRAFTER(STR(?n), "item ") AS ?a)
  BIND(STRBEFORE(STR(?n), "zzz") AS ?missing)
}}""")
    assert got == [("5 x", "item", "")]   # sorted cols: a, b, missing


def test_strbefore_empty_separator(store):
    # STRBEFORE(x, "") = "" and STRAFTER(x, "") = x per spec
    got = _rows(store, f"""
SELECT ?b ?a WHERE {{
  <{NS}it5> <{NS}name> ?n .
  BIND(STRBEFORE(STR(?n), "") AS ?b)
  BIND(STRAFTER(STR(?n), "") AS ?a)
}}""")
    assert got == [("item 5 x", "")]      # sorted cols: a, b


def test_encode_for_uri(store):
    got = _rows(store, f"""
SELECT ?e WHERE {{
  <{NS}it5> <{NS}name> ?n .
  BIND(ENCODE_FOR_URI(CONCAT(STR(?n), "/~A.b-c_d?")) AS ?e)
}}""")
    assert got == [("item%205%20x%2F~A.b-c_d%3F",)]


def test_strlang_strdt(store):
    got = _rows(store, f"""
SELECT ?x ?y WHERE {{
  <{NS}it2> <{NS}w> ?w .
  BIND(STRLANG(STR(?w), "fr") AS ?x)
  BIND(STRDT(STR(?w), <http://www.w3.org/2001/XMLSchema#int>) AS ?y)
}}""")
    assert got == [('"4"@fr',
                    '"4"^^<http://www.w3.org/2001/XMLSchema#int>')]
    with pytest.raises(SparqlError):
        parse_sparql(f'SELECT ?x WHERE {{ ?s <{NS}w> ?w . '
                     f'BIND(STRLANG(STR(?w), "not a tag!") AS ?x) }}')
    with pytest.raises(SparqlError):
        parse_sparql(f'SELECT ?x WHERE {{ ?s <{NS}w> ?w . '
                     f'BIND(STRDT(STR(?w), "notaniri") AS ?x) }}')


# ---------------------------------------------------------- filters

def test_is_numeric(store):
    nums = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}w> ?w . FILTER(isNumeric(?w)) }}""")
    assert len(nums) == 13               # 12 parts + blank subject
    names = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}name> ?n . FILTER(isNumeric(?n)) }}""")
    assert names == []
    inv = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}name> ?n . FILTER(!isNumeric(?n)) }}""")
    assert len(inv) == 12


def test_is_blank(store):
    got = _rows(store, f"""
SELECT ?s ?w WHERE {{ ?s <{NS}w> ?w . FILTER(isBlank(?s)) }}""")
    assert got == [("_:b0", '"3"')]
    inv = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}w> ?w . FILTER(!isBlank(?s)) }}""")
    assert len(inv) == 12


def test_lang_matches(store):
    en = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}name> ?n .
  FILTER(langMatches(LANG(?n), "EN")) }}""")
    # basic range "en" matches @en AND @en-US (case-insensitive)
    assert len(en) == 8
    us = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}name> ?n .
  FILTER(langMatches(LANG(?n), "en-us")) }}""")
    assert len(us) == 4
    anyl = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}name> ?n .
  FILTER(langMatches(LANG(?n), "*")) }}""")
    assert len(anyl) == 8


def test_same_term(store):
    got = _rows(store, f"""
SELECT ?a ?b WHERE {{
  ?a <{NS}link> ?x . ?b <{NS}link> ?x . FILTER(!sameTerm(?a, ?b))
}}""")
    # links all point at distinct targets -> no two subjects share one
    assert got == []
    got = _rows(store, f"""
SELECT ?s WHERE {{
  ?s <{NS}w> ?x . ?s <{NS}w> ?y . FILTER(sameTerm(?x, ?y))
  FILTER(?s = <{NS}it0>)
}}""")
    assert got == [(f"{NS}it0",)]


# ------------------------------------------------- REDUCED, paths

def test_select_reduced_dedups(store):
    got = _rows(store, f"""
SELECT REDUCED ?p WHERE {{ ?s ?p ?o }}""")
    assert got == sorted([(NS + "link",), (NS + "name",), (NS + "w",)])


def test_negated_property_set(store):
    one = _rows(store, f"""
SELECT ?s ?o WHERE {{ ?s !<{NS}w> ?o }}""")
    assert len(one) == 16                # 12 names + 4 links
    two = _rows(store, f"""
SELECT ?s ?o WHERE {{ ?s !(<{NS}w>|<{NS}name>) ?o }}""")
    assert len(two) == 4
    # columns sort (o, s); ?o is term-class -> link targets as <iri>
    assert all(o.startswith("<" + NS) for o, _ in two)


def test_negated_path_matches_full_scan_minus(store):
    """!p must equal the unbound-predicate scan minus p's rows."""
    neg = _rows(store, f"SELECT ?s ?o WHERE {{ ?s !<{NS}name> ?o }}")
    all_ = _rows(store, f"""
SELECT ?s ?o WHERE {{ ?s ?p ?o . FILTER(?p != <{NS}name>) }}""")
    assert neg == all_


def test_negated_set_inverse_members(store):
    """§9.1 full NPS: inverse members scan REVERSED edges; ^!F and
    !^F are the same path; a mixed set unions the two scans."""
    # pure inverse: reversed edges excluding w and name == reversed
    # link edges; both spellings agree
    a = _rows(store, f"SELECT ?x ?y WHERE "
              f"{{ ?x !(^<{NS}w>|^<{NS}name>) ?y }}")
    b = _rows(store, f"SELECT ?x ?y WHERE "
              f"{{ ?x ^!(<{NS}w>|<{NS}name>) ?y }}")
    assert a == b and len(a) == 4
    fwd = _rows(store, f"SELECT ?y ?x WHERE "
                f"{{ ?y !(<{NS}w>|<{NS}name>) ?x }}")
    # same 4 link edges, endpoints swapped — and the inverse leg
    # reads both endpoints in term form, so compare decoded pairs
    strip = lambda v: v.strip("<>")
    assert sorted((strip(x), strip(y)) for x, y in a) \
        == sorted((strip(x), strip(y)) for x, y in fwd)
    # mixed set: forward-not-w (16 rows) UNION reversed-not-(w|name)
    # (4 rows)
    m = _rows(store, f"SELECT ?x ?y WHERE "
              f"{{ ?x !(<{NS}w>|^<{NS}w>|^<{NS}name>) ?y }}")
    assert len(m) == 20


def test_negated_path_parse_errors(store):
    with pytest.raises(SparqlError):
        parse_sparql(f"SELECT ?s WHERE {{ ?s !<{NS}w>+ ?o }}")
    with pytest.raises(SparqlError):
        parse_sparql(f"SELECT ?s WHERE {{ ?s !?p ?o }}")
    with pytest.raises(SparqlError):
        parse_sparql(
            f"PREFIX e: <{NS}> CONSTRUCT {{ ?s !e:w ?o }} "
            f"WHERE {{ ?s e:w ?o }}")


def test_order_by_numeric_values(store):
    """SPARQL orders numeric literals by VALUE ("9" < "10"), with the
    lexical form as tiebreak — on both the select and aggregate
    paths."""
    from kgforge.sparql import execute_sparql, parse_sparql

    def vals(q):
        df = execute_sparql(store, parse_sparql(q)[0]).to_pandas()
        return list(df[df.columns[0]])

    up = vals(f"SELECT ?w WHERE {{ ?s <{NS}w> ?w }} ORDER BY ?w LIMIT 20")
    assert up == sorted(up, key=lambda t: int(t.strip('"')))
    down = vals(f"SELECT ?w WHERE {{ ?s <{NS}w> ?w }} "
                f"ORDER BY DESC(?w) LIMIT 3")
    assert down == ['"9"', '"8"', '"7"']
    agg = vals(f"SELECT ?w (COUNT(*) AS ?n) WHERE {{ ?s <{NS}w> ?w }} "
               f"GROUP BY ?w ORDER BY ?w LIMIT 4")
    assert agg == ['"0"', '"1"', '"2"', '"3"']


def test_order_by_optional_var(store):
    """ORDER BY over an OPTIONAL-bound variable: unbound rows sort
    lowest ascending (spec) — and the sort must not crash or
    duplicate rows (Ray's range sort rejects null keys; the planner
    lowers every ORDER BY column to non-null derived keys)."""
    from kgforge.sparql import execute_sparql, parse_sparql
    q = parse_sparql(f"""
SELECT ?s ?t WHERE {{
  ?s <{NS}w> ?w .
  OPTIONAL {{ ?s <{NS}link> ?t }}
}} ORDER BY ?t ?s LIMIT 20""")[0]
    df = execute_sparql(store, q).to_pandas()
    assert len(df) == 13                 # 12 parts + blank subject
    nulls = df["t"].isna()
    # all unbound rows come first (ascending), bound targets after,
    # lexically ordered
    assert nulls.iloc[:int(nulls.sum())].all()
    bound = df["t"].dropna().tolist()
    assert bound == sorted(bound) and len(bound) == 4


def test_group_concat_distinct(store):
    """GROUP_CONCAT(DISTINCT ?v): duplicates collapse before the
    sorted join; plain GROUP_CONCAT keeps them."""
    from kgforge.sparql import execute_sparql, parse_sparql

    def one(q):
        df = execute_sparql(store, parse_sparql(q)[0]).to_pandas()
        return sorted(map(tuple, df[sorted(df.columns)]
                          .itertuples(index=False)))

    # every subject's w values: it0..it11 share only 10 distinct
    # weights; group by predicate to force duplicates in one group
    plain = one(f"""
SELECT ?p (GROUP_CONCAT(?o; SEPARATOR=",") AS ?vals) WHERE {{
  ?s ?p ?o . FILTER(isNumeric(?o))
}} GROUP BY ?p""")
    dedup = one(f"""
SELECT ?p (GROUP_CONCAT(DISTINCT ?o; SEPARATOR=",") AS ?vals) WHERE {{
  ?s ?p ?o . FILTER(isNumeric(?o))
}} GROUP BY ?p""")
    assert len(plain) == 1 and len(dedup) == 1
    assert plain[0][0] == NS + "w"
    n_plain = plain[0][1].count(",") + 1
    n_dedup = dedup[0][1].count(",") + 1
    assert n_plain == 13 and n_dedup == 10
    # SUM(DISTINCT) is supported now (value-distinct semantics)
    q = parse_sparql("SELECT (SUM(DISTINCT ?v) AS ?t) WHERE "
                     "{ ?s ?p ?v }")[0]
    assert q.aggs[0].func == "sum" and q.aggs[0].distinct


def test_select_expressions(store):
    """SELECT (expr AS ?alias) projects per solution — desugared to a
    BIND at the end of the WHERE group."""
    from kgforge.sparql import execute_sparql, parse_sparql

    def one(q):
        df = execute_sparql(store, parse_sparql(q)[0]).to_pandas()
        return sorted(map(tuple, df[sorted(df.columns)]
                          .itertuples(index=False)))

    got = one(f"""
SELECT ?s (?w * 2 AS ?dbl) (IF(?w < 5, "lo", "hi") AS ?t) WHERE {{
  ?s <{NS}w> ?w . FILTER(?s = <{NS}it1>)
}}""")
    assert got == [("14", f"{NS}it1", '"hi"')]   # cols sort (dbl, s, t)
    with pytest.raises(SparqlError):
        parse_sparql(f"SELECT (?w * 2 AS ?d) (COUNT(*) AS ?n) WHERE "
                     f"{{ ?s <{NS}w> ?w }}")


def test_filter_arithmetic(store):
    """FILTER over numeric expressions: ?w * 2 > 10, both-sides
    expressions, and arithmetic inside IF conditions."""
    got = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}w> ?w . FILTER(?w * 2 > 10) }}""")
    want = sorted((f"{NS}it{k}",) for k in range(12)
                  if (k * 7) % 10 * 2 > 10)
    assert got == want
    both = _rows(store, f"""
SELECT ?s WHERE {{
  ?s <{NS}w> ?w . ?s <{NS}name> ?n .
  FILTER(?w + 1 >= STRLEN(STR(?n)) - 7)
}}""")
    # strlen("item K x") = 8 (one-digit K) or 9: condition w+1 >=
    # strlen-7 — only it10 (w=0, strlen 9 -> 1 >= 2 false) drops
    assert len(both) == 11
    assert (f"{NS}it10",) not in both
    ifc = _rows(store, f"""
SELECT ?t WHERE {{
  <{NS}it1> <{NS}w> ?w . BIND(IF(?w - 5 > 0, "pos", "neg") AS ?t)
}}""")
    assert ifc == [('"pos"',)]
    # non-numeric side -> type error -> row eliminated
    none = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}name> ?n . FILTER(?n * 2 > 0) }}""")
    assert none == []


# --------------------------------------- inline aggregate expressions

def test_agg_inline_expr_sum_global(store):
    """SUM over an inline expression (spec §18.4): SUM(?w * 2 + 1)
    desugars to a hidden per-solution BIND and aggregates the alias.
    13 solutions (12 items + the blank-node row, w=3):
    sum(w)=55 -> sum(2w+1) = 110 + 13 = 123."""
    got = _rows(store, f"""
SELECT (SUM(?w * 2 + 1) AS ?t) WHERE {{ ?s <{NS}w> ?w }}""")
    assert got == [(123.0,)]


def test_agg_inline_expr_count_distinct(store):
    """COUNT(DISTINCT expr): distinct STRLEN over the name literals
    ("item K x" is 8 or 9 chars) -> 2."""
    got = _rows(store, f"""
SELECT (COUNT(DISTINCT STRLEN(STR(?n))) AS ?k) WHERE {{
  ?s <{NS}name> ?n }}""")
    assert got == [(2,)]


def test_agg_inline_expr_sum_distinct(store):
    """SUM(DISTINCT expr) composes the hidden-BIND desugar with the
    value-distinct sum: w values cover 0..9 once each per duplicate
    set, so SUM(DISTINCT ?w * 10) is 10 * (0+..+9)."""
    got = _rows(store, f"""
SELECT (SUM(DISTINCT ?w * 10) AS ?t) WHERE {{ ?s <{NS}w> ?w }}""")
    assert got == [(450.0,)]


def test_agg_inline_expr_grouped(store):
    """Grouped AVG over an inline arithmetic expression: each subject
    has one w, so AVG(?w * 10) per subject is w*10 exactly."""
    got = _rows(store, f"""
SELECT ?s (AVG(?w * 10) AS ?m) WHERE {{ ?s <{NS}w> ?w }}
GROUP BY ?s""")
    want = sorted([(float((k * 7) % 10 * 10), f"{NS}it{k}")
                   for k in range(12)] + [(30.0, "_:b0")])
    assert got == want


def test_agg_inline_expr_having(store):
    """HAVING over an inline expression aggregate: groups where
    SUM(?w * 2) > 10 (w >= 6)."""
    got = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}w> ?w }}
GROUP BY ?s HAVING (SUM(?w * 2) > 10)""")
    want = sorted((f"{NS}it{k}",) for k in range(12)
                  if (k * 7) % 10 >= 6)
    assert got == want


def test_agg_expr_still_rejects_bad_arg(store):
    """A non-expression garbage argument still errors at parse."""
    with pytest.raises(SparqlError):
        parse_sparql(f"SELECT (SUM(}}) AS ?t) WHERE "
                     f"{{ ?s <{NS}w> ?w }}")


# --------------------------------------- datetime + hash builtins

def test_datetime_accessors(store):
    """YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS over a dateTime constant
    (spec §17.4.5: the accessors read the literal's own clock time;
    the trailing zone designator is ignored)."""
    got = _rows(store, f"""
SELECT ?y ?mo ?d ?h ?mi ?se WHERE {{
  <{NS}it0> <{NS}w> ?w .
  BIND(YEAR("2024-03-05T07:20:30Z") AS ?y)
  BIND(MONTH("2024-03-05T07:20:30Z") AS ?mo)
  BIND(DAY("2024-03-05T07:20:30Z") AS ?d)
  BIND(HOURS("2024-03-05T07:20:30Z") AS ?h)
  BIND(MINUTES("2024-03-05T07:20:30Z") AS ?mi)
  BIND(SECONDS("2024-03-05T07:20:30.5Z") AS ?se)
}}""")
    # columns sort (d, h, mi, mo, se, y); leading zeros normalize
    assert got == [("5", "7", "20", "3", "30.5", "2024")]


def test_datetime_date_only_and_type_error(store):
    """A date-only literal binds the date fields and leaves HOURS
    unbound; a non-dateTime-shaped value unbinds everything."""
    got = _rows(store, f"""
SELECT ?d ?h WHERE {{
  <{NS}it0> <{NS}w> ?w .
  BIND(DAY("2024-03-05") AS ?d)
  BIND(HOURS("2024-03-05") AS ?h)
}}""")
    assert got == [("5", "NULL")]
    bad = _rows(store, f"""
SELECT ?y WHERE {{
  ?s <{NS}name> ?n . BIND(YEAR(?n) AS ?y) FILTER(BOUND(?y))
}}""")
    assert bad == []


def test_datetime_in_filter_and_arith(store):
    """Accessors compose with FILTER comparisons and arithmetic."""
    got = _rows(store, f"""
SELECT ?v WHERE {{
  <{NS}it0> <{NS}w> ?w .
  BIND(YEAR("1998-07-04") - MONTH("1998-07-04") AS ?v)
  FILTER(DAY("1998-07-04") <= 15)
}}""")
    assert got == [("1991",)]


def test_hash_functions(store):
    """MD5/SHA1/SHA256/SHA384/SHA512 of the STR form vs hashlib."""
    import hashlib
    got = _rows(store, f"""
SELECT ?h1 ?h2 ?h3 ?h4 ?h5 WHERE {{
  <{NS}it0> <{NS}name> ?n .
  BIND(MD5(?n) AS ?h1) BIND(SHA1(?n) AS ?h2)
  BIND(SHA256(?n) AS ?h3) BIND(SHA384(?n) AS ?h4)
  BIND(SHA512(?n) AS ?h5)
}}""")
    # it0's name is "item 0 x"@en-US -> STR strips the langtag
    val = b"item 0 x"
    want = tuple(getattr(hashlib, a)(val).hexdigest()
                 for a in ("md5", "sha1", "sha256", "sha384",
                           "sha512"))
    assert got == [want]


# --------------------------------------- IRI()/TZ()/STRENDS

def test_strends_filter(store):
    """STRENDS over STR(?v) (spec §17.4.3.4) — suffix match on the
    lexical form, langtag-insensitive like the other str filters."""
    got = _rows(store, f"""
SELECT ?s WHERE {{
  ?s <{NS}name> ?n . FILTER(STRENDS(STR(?n), "1 x"))
}}""")
    # names are "item {k} x" -> k ending in 1: it1, it11
    assert got == [(f"{NS}it1",), (f"{NS}it11",)]
    # negation composes like the other filter functions
    neg = _rows(store, f"""
SELECT ?s WHERE {{
  ?s <{NS}name> ?n . FILTER(!STRENDS(STR(?n), " x"))
}}""")
    assert neg == []


def test_iri_constructor(store):
    """IRI()/URI() (spec §17.4.2.8): the string form becomes an IRI
    in raw representation — it can seed a join back into the store's
    s-position."""
    got = _rows(store, f"""
SELECT ?u WHERE {{
  ?s <{NS}w> ?w .
  FILTER(?w = 7) FILTER(isIRI(?s))
  BIND(URI(CONCAT("{NS}w-is-", STR(?w))) AS ?u)
}}""")
    # w=(k*7)%10 == 7 -> k in {1, 11}: two rows, same minted IRI
    assert got == [(f"{NS}w-is-7",), (f"{NS}w-is-7",)]
    # IRI of an IRI-class var is the identity
    same = _rows(store, f"""
SELECT ?ok WHERE {{
  <{NS}it0> <{NS}link> ?t . BIND(IRI(?t) AS ?u)
  BIND(IF(?u = ?t, "y", "n") AS ?ok)
}}""")
    assert same == [('"y"',)]


def test_iri_join_back_is_rejected(store):
    """A minted IRI reused as a pattern subject needs BIND-before-
    join evaluation, which the group planner does not do (patterns
    evaluate first) — the shape must error clearly, not mis-answer."""
    with pytest.raises(SparqlError, match="already bound"):
        _rows(store, f"""
SELECT ?n WHERE {{
  <{NS}it1> <{NS}w> ?w .
  BIND(IRI(CONCAT("{NS}it", "1")) AS ?u)
  ?u <{NS}name> ?n .
}}""")


def test_tz_accessor(store):
    """TZ (spec §17.4.5.8): timezone designator as a simple literal —
    "Z", "+05:00", "" when absent; non-dateTime shapes unbind."""
    got = _rows(store, f"""
SELECT ?a ?b ?c ?d WHERE {{
  <{NS}it0> <{NS}w> ?w .
  BIND(TZ("2024-03-05T07:20:30Z") AS ?a)
  BIND(TZ("2024-03-05T07:20:30-08:00") AS ?b)
  BIND(TZ("2024-03-05T07:20:30") AS ?c)
  BIND(TZ("2024-03-05") AS ?d)
}}""")
    assert got == [('"Z"', '"-08:00"', '""', '""')]
    bad = _rows(store, f"""
SELECT ?z WHERE {{
  ?s <{NS}name> ?n . BIND(TZ(?n) AS ?z) FILTER(BOUND(?z))
}}""")
    assert bad == []


# ------------------------- term-identity FILTER comparisons ('str'
# representation class: plain-string BIND aliases and string-fn sides)

def test_filter_strfn_eq_literal(store):
    """FILTER(UCASE(?n) = "...") compares rendered terms — the
    numeric-coercion path would silently eliminate every row (spec
    §17.4.3: string functions + RDFterm-equal)."""
    got = _rows(store, f"""
SELECT ?n WHERE {{ ?s <{NS}name> ?n .
  FILTER(UCASE(STR(?n)) = "ITEM 4 X") }}""")
    assert got == [('"item 4 x"@en',)]
    # same through a BIND alias (the alias lives in plain-str space)
    got2 = _rows(store, f"""
SELECT ?n WHERE {{ ?s <{NS}name> ?n .
  BIND(UCASE(STR(?n)) AS ?u) FILTER(?u = "ITEM 4 X") }}""")
    assert got2 == got


def test_filter_var_eq_iri_constructor(store):
    """FILTER(?s = IRI(...)): the constructor side lives in raw-IRI
    space and must align with the s-position variable."""
    got = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}w> ?w .
  FILTER(?s = IRI(CONCAT("{NS}it", "3"))) }}""")
    assert got == [(f"{NS}it3",)]


def test_filter_concat_alias_eq_term_var(store):
    """A plain-str alias compared = against an o-position term var
    re-quotes to rendered-term form (lossless normalization)."""
    got = _rows(store, f"""
SELECT ?n WHERE {{ ?s <{NS}name> ?n .
  BIND(CONCAT("item ", "2 x") AS ?u) FILTER(?u = ?n) }}""")
    assert got == [('"item 2 x"',)]  # plain literal only, not @en


def test_filter_strfn_ordering(store):
    """Ordering over two definitely-string sides compares codepoint
    strings (spec fn:compare); numeric-lexical producers must NOT
    take this path (STRLEN stays numeric)."""
    got = _rows(store, f"""
SELECT ?n WHERE {{ ?s <{NS}name> ?n .
  FILTER(SUBSTR(STR(?n), 6, 1) >= "8") }}""")
    assert got == [('"item 8 x"',), ('"item 9 x"@en-US',)]
    num = _rows(store, f"""
SELECT ?n WHERE {{ ?s <{NS}name> ?n .
  FILTER(STRLEN(STR(?n)) = 8) }}""")
    assert len(num) == 10  # "item K x" for K in 0..9: numeric equality


def test_str_alias_type_predicates(store):
    """isLiteral/isIRI/isBlank over a plain-str alias: every bound
    value is a (simple) literal; DATATYPE is xsd:string, LANG ''."""
    got = _rows(store, f"""
SELECT ?d ?l WHERE {{ <{NS}it1> <{NS}name> ?n .
  BIND(CONCAT(STR(?n), "!") AS ?u)
  FILTER(isLiteral(?u)) FILTER(!isIRI(?u)) FILTER(!isBlank(?u))
  BIND(DATATYPE(?u) AS ?d) BIND(LANG(?u) AS ?l) }}""")
    assert got == [
        ("<http://www.w3.org/2001/XMLSchema#string>", '""')]


def test_str_alias_in_list(store):
    """IN lists against a plain-str alias compare bare lexical values;
    an IRI constant in the list can never match a literal."""
    got = _rows(store, f"""
SELECT ?u WHERE {{ ?s <{NS}w> ?w .
  BIND(CONCAT("w", STR(?w)) AS ?u)
  FILTER(?u IN ("w0", "w7", <{NS}w1>)) }}""")
    # a plain-str alias projects BARE (results serialization strips
    # decoration anyway; the DuckDB gate mirrors rely on this)
    assert sorted(set(got)) == [("w0",), ("w7",)]


def test_numeric_alias_eq_term_var(store):
    """A numeric-expression alias (plain lexical int) = an o-position
    numeric literal matches via the quoted normalization."""
    got = _rows(store, f"""
SELECT ?w WHERE {{ <{NS}it1> <{NS}w> ?w .
  BIND(3 + 4 AS ?d) FILTER(?d = ?w) }}""")
    assert got == [('"7"',)]


# ------------------------- modified path groups with sequence legs

@pytest.fixture(scope="module")
def cyc_store(ray_session, tmp_path_factory):
    """p1-cycle a->b->c->a plus d-p1->a and b-p2->d (small graph with
    a cycle: closure termination + zero-length pairs)."""
    import ray.data

    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    E = "http://cy.org/"
    rows = [(E + "a", E + "p1", f"<{E}b>"),
            (E + "b", E + "p1", f"<{E}c>"),
            (E + "c", E + "p1", f"<{E}a>"),
            (E + "d", E + "p1", f"<{E}a>"),
            (E + "b", E + "p2", f"<{E}d>"),
            (E + "b", E + "v", '"10"')]
    tbl = pa.table({
        "s": pa.array([r[0] for r in rows], pa.string()),
        "p": pa.array([r[1] for r in rows], pa.string()),
        "o": pa.array([r[2] for r in rows], pa.string())})
    d = str(tmp_path_factory.mktemp("cyc") / "st")
    os.makedirs(d)
    write_graph_partitioned(ray.data.from_arrow(tbl), d)
    return d


def test_seqgroup_plus_cycle(cyc_store):
    """(p1/p1)+ from a: composed 2-hop edges a->c, b->a, c->b, d->b —
    the cycle closes back onto a itself."""
    got = _rows(cyc_store, """
SELECT ?x WHERE {
  <http://cy.org/a> (<http://cy.org/p1>/<http://cy.org/p1>)+ ?x }""")
    assert got == [("<http://cy.org/a>",), ("<http://cy.org/b>",),
                   ("<http://cy.org/c>",)]


def test_seqgroup_nested_alt_plus(cyc_store):
    """((p1/p1)|p2)+: union of the composed relation and the plain
    p2 edges feeds ONE closure."""
    got = _rows(cyc_store, """
SELECT ?x WHERE {
  <http://cy.org/a>
    ((<http://cy.org/p1>/<http://cy.org/p1>)|<http://cy.org/p2>)+
    ?x }""")
    assert got == [("<http://cy.org/a>",), ("<http://cy.org/b>",),
                   ("<http://cy.org/c>",), ("<http://cy.org/d>",)]


def test_seqgroup_star_and_opt(cyc_store):
    """* adds the zero-length self-pair; ? is length <= 1."""
    got = _rows(cyc_store, """
SELECT ?x WHERE {
  <http://cy.org/d> (<http://cy.org/p1>/<http://cy.org/p2>)* ?x }""")
    assert got == [("<http://cy.org/d>",)]   # no composed edge from d
    got2 = _rows(cyc_store, """
SELECT ?x WHERE {
  <http://cy.org/a> (<http://cy.org/p1>/<http://cy.org/p2>)? ?x }""")
    assert got2 == [("<http://cy.org/a>",), ("<http://cy.org/d>",)]


def test_seqgroup_literal_tail(cyc_store):
    """A literal can terminate a composed path (a-p1->b-v->"10") but
    never continues one (literals cannot be subjects)."""
    got = _rows(cyc_store, """
SELECT ?x WHERE {
  <http://cy.org/a> (<http://cy.org/p1>/<http://cy.org/v>)+ ?x }""")
    assert got == [('"10"',)]


def test_seqgroup_grounded_object(cyc_store):
    """Constant object endpoint: every source whose even-depth chain
    reaches b."""
    got = _rows(cyc_store, """
SELECT ?s WHERE {
  ?s (<http://cy.org/p1>/<http://cy.org/p1>)+ <http://cy.org/b> }""")
    assert got == [("http://cy.org/a",), ("http://cy.org/b",),
                   ("http://cy.org/c",), ("http://cy.org/d",)]


def test_seqgroup_inverse_member_rejected(cyc_store):
    """Inverse members inside a modified group stay out of the subset
    (clear error, not a silent wrong answer)."""
    with pytest.raises(SparqlError, match="forward constant-IRI"):
        parse_sparql("""
SELECT ?x WHERE {
  <http://cy.org/a> (^<http://cy.org/p1>/<http://cy.org/p2>)+ ?x }""")


# ----------------------------- UNION legs with differing variables

def test_union_different_vars_pad_null(cyc_store):
    """SPARQL UNION legs may bind different vars: missing vars are
    unbound in that leg's solutions; COUNT(?v) skips them."""
    got = _rows(cyc_store, """
SELECT ?s ?v ?d WHERE {
  { ?s <http://cy.org/v> ?v } UNION { ?s <http://cy.org/p2> ?d } }""")
    assert got == [("<http://cy.org/d>", "http://cy.org/b", "NULL"),
                   ("NULL", "http://cy.org/b", '"10"')]
    cnt = _rows(cyc_store, """
SELECT (COUNT(?v) AS ?nv) (COUNT(?d) AS ?nd) WHERE {
  { ?s <http://cy.org/v> ?v } UNION { ?s <http://cy.org/p2> ?d } }""")
    assert cnt == [(1, 1)]


def test_union_binds_per_leg(cyc_store):
    """Per-leg BINDs with a shared alias line up across the union."""
    got = _rows(cyc_store, """
SELECT ?t WHERE {
  { ?s <http://cy.org/v> ?v . BIND(CONCAT("v:", STR(?v)) AS ?t) }
  UNION
  { ?s <http://cy.org/p2> ?d . BIND("edge" AS ?t) } }""")
    assert got == [('"edge"',), ("v:10",)]


def test_union_outer_bound_var_must_bind_everywhere(cyc_store):
    """A var bound OUTSIDE the union joined against a leg that leaves
    it unbound would silently drop rows (inner join on null) — the
    subset raises instead."""
    with pytest.raises(SparqlError, match="bound outside the UNION"):
        _rows(cyc_store, """
SELECT ?s ?v WHERE { ?s <http://cy.org/v> ?v .
  { ?s <http://cy.org/p1> ?x } UNION { ?s <http://cy.org/p2> ?v } }""")


# ------------------------------------------------------- SELECT *

def test_select_star(cyc_store):
    """SELECT * projects every bound variable — except the planner's
    internal path-chain vars, which are not in-scope per the spec."""
    got = _rows(cyc_store, """
SELECT * WHERE { ?s <http://cy.org/v> ?v }""")
    assert got == [("http://cy.org/b", '"10"')]
    df_q = """
SELECT * WHERE { ?s <http://cy.org/p1>/<http://cy.org/v> ?v }"""
    df = execute_sparql(cyc_store, parse_sparql(df_q)[0]).to_pandas()
    assert sorted(df.columns) == ["s", "v"]   # no _seq leak
    assert len(df) == 1                        # a-p1->b-v->"10"


def test_select_star_distinct_and_subquery_guard(cyc_store):
    got = _rows(cyc_store, """
SELECT DISTINCT * WHERE { ?s <http://cy.org/p1> ?x }""")
    assert len(got) == 4
    with pytest.raises(SparqlError, match="explicit SELECT list"):
        _rows(cyc_store, """
SELECT ?s WHERE { { SELECT * WHERE { ?s <http://cy.org/v> ?v } } }""")


def test_inverse_modified_group(cyc_store):
    """^(G)mod == the closure with endpoints swapped (inverse of a
    closure is the closure of the inverses) — same emit-time swap as
    a plain ^p+."""
    inv = _rows(cyc_store, """
SELECT ?x WHERE {
  <http://cy.org/a> ^(<http://cy.org/p1>|<http://cy.org/p2>)+ ?x }""")
    fwd = _rows(cyc_store, """
SELECT ?s WHERE {
  ?s (<http://cy.org/p1>|<http://cy.org/p2>)+ <http://cy.org/a> }""")
    assert inv == fwd and len(inv) == 4
    seq = _rows(cyc_store, """
SELECT ?x WHERE {
  <http://cy.org/b> ^(<http://cy.org/p1>/<http://cy.org/p1>)+ ?x }""")
    seq_fwd = _rows(cyc_store, """
SELECT ?s WHERE {
  ?s (<http://cy.org/p1>/<http://cy.org/p1>)+ <http://cy.org/b> }""")
    assert seq == seq_fwd
    opt = _rows(cyc_store, """
SELECT ?x WHERE { <http://cy.org/d> ^(<http://cy.org/p2>)? ?x }""")
    assert opt == [("http://cy.org/b",), ("http://cy.org/d",)]


# -------------------------- CONSTRUCT instantiation validity (§16.2)

def test_construct_unbound_var_omits_triple(cyc_store):
    """A template instantiation with an unbound variable contributes
    no triple (OPTIONAL-null rows drop for that pattern only)."""
    got = _rows(cyc_store, """
CONSTRUCT { ?s <http://cy.org/had> ?v }
WHERE { ?s <http://cy.org/p1> ?x
        OPTIONAL { ?s <http://cy.org/v> ?v } }""")
    assert got == [('"10"', "http://cy.org/had", "http://cy.org/b")]


def test_construct_literal_subject_skipped(cyc_store):
    """An instantiation that is not a valid RDF triple (literal in the
    subject position) is skipped, not emitted."""
    got = _rows(cyc_store, """
CONSTRUCT { ?o <http://cy.org/inv> ?s }
WHERE { ?s <http://cy.org/v> ?o }""")
    assert got == []
    # IRI objects DO invert (term -> iri position trims the brackets)
    got2 = _rows(cyc_store, """
CONSTRUCT { ?o <http://cy.org/inv> ?s }
WHERE { ?s <http://cy.org/p2> ?o }""")
    assert got2 == [("<http://cy.org/b>", "http://cy.org/inv",
                     "http://cy.org/d")]


def test_construct_str_alias_renders_literal(cyc_store):
    """A plain-str BIND alias in the o position renders as a quoted
    simple literal in the constructed graph."""
    got = _rows(cyc_store, """
CONSTRUCT { ?s <http://cy.org/dbl> ?d }
WHERE { ?s <http://cy.org/v> ?v . BIND(?v * 2 AS ?d) }""")
    assert got == [('"20"', "http://cy.org/dbl", "http://cy.org/b")]


def test_regex_flags(store):
    """REGEX(str, pattern, flags): XPath flags i/s/m lower to RE2
    inline groups; q/x raise."""
    got = _rows(store, f"""
SELECT ?n WHERE {{ ?s <{NS}name> ?n .
  FILTER(REGEX(?n, "^ITEM 4", "i")) }}""")
    assert got == [('"item 4 x"@en',)]
    neg = _rows(store, f"""
SELECT ?n WHERE {{ ?s <{NS}name> ?n .
  FILTER(!REGEX(?n, "ITEM", "i")) }}""")
    assert neg == []
    with pytest.raises(SparqlError, match='"i", "s", "m"'):
        parse_sparql(f'SELECT ?n WHERE {{ ?s <{NS}name> ?n . '
                     f'FILTER(REGEX(?n, "x", "q")) }}')


# ---------------------------------------------- ORDER BY expressions

def test_order_by_expression(cyc_store):
    """ORDER BY (expr) desugars to a hidden per-solution BIND; the
    key column never reaches the output (incl. under SELECT *)."""
    q = """
SELECT * WHERE { ?s <http://cy.org/p1> ?x }
  ORDER BY DESC(STRLEN(STR(?s))) ?s"""
    df = execute_sparql(cyc_store, parse_sparql(q)[0]).to_pandas()
    assert sorted(df.columns) == ["s", "x"]
    assert list(df["s"]) == ["http://cy.org/a", "http://cy.org/b",
                             "http://cy.org/c", "http://cy.org/d"]


def test_order_by_unprojected_var(cyc_store):
    """ORDER BY may reference a var outside the projection — carried
    through the sort, dropped after; DISTINCT forbids it."""
    q = """
SELECT ?s WHERE { ?s <http://cy.org/v> ?v } ORDER BY DESC(?v)"""
    df = execute_sparql(cyc_store, parse_sparql(q)[0]).to_pandas()
    assert list(df.columns) == ["s"]
    with pytest.raises(SparqlError, match="DISTINCT projection"):
        execute_sparql(cyc_store, parse_sparql("""
SELECT DISTINCT ?s WHERE { ?s <http://cy.org/v> ?v }
  ORDER BY ?v""")[0])


def test_order_by_expression_with_aggregates_raises(cyc_store):
    """Expression keys over grouped results would read pre-aggregation
    values — rejected with the BIND-alias workaround."""
    with pytest.raises(SparqlError, match="ORDER BY expressions with"):
        parse_sparql("""
SELECT ?s (COUNT(?x) AS ?n) WHERE { ?s <http://cy.org/p1> ?x }
  GROUP BY ?s ORDER BY (0 - ?n)""")


def test_group_by_expression(cyc_store):
    """GROUP BY (expr AS ?alias) desugars to a per-solution BIND —
    semantically correct for grouping (BINDs evaluate before
    aggregation); the bare form without AS raises."""
    got = _rows(cyc_store, """
SELECT ?k (COUNT(?s) AS ?n) WHERE { ?s <http://cy.org/p1> ?x }
  GROUP BY (CONCAT("g-", STR(?s)) AS ?k)""")
    assert len(got) == 4 and all(n == 1 for _, n in got)
    with pytest.raises(SparqlError, match="AS [?]alias"):
        parse_sparql("""
SELECT ?v (COUNT(?s) AS ?n) WHERE { ?s <http://cy.org/v> ?v }
  GROUP BY (STR(?v))""")


def test_order_by_aggregate(cyc_store):
    """ORDER BY DESC(COUNT(?x)) — hidden synthesized aggregate, the
    top-k-groups idiom; the hidden alias never reaches the output."""
    got = _rows(cyc_store, """
SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
  GROUP BY ?s ORDER BY DESC(COUNT(?o)) ?s LIMIT 1""")
    assert got == [(3, "http://cy.org/b")]   # p1, p2, v; cols (n, s)
    q = """
SELECT ?s WHERE { ?s ?p ?o }
  GROUP BY ?s ORDER BY DESC(SUM(?o * 2)) ?s LIMIT 2"""
    df = execute_sparql(cyc_store, parse_sparql(q)[0]).to_pandas()
    assert list(df.columns) == ["s"]         # no _ordagg leak


def test_decorated_literal_constants(store):
    """Lang-tagged and ^^datatyped literal CONSTANTS in patterns,
    FILTERs, IN lists and VALUES (term identity incl. decoration)."""
    got = _rows(store, f'SELECT ?s WHERE {{ ?s <{NS}name> '
                       f'"item 0 x"@en-US }}')
    assert got == [(f"{NS}it0",)]
    assert _rows(store, f'SELECT ?s WHERE {{ ?s <{NS}name> '
                        f'"item 0 x" }}') == []   # plain != @en-US
    got2 = _rows(store, f"""
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT ?s WHERE {{ ?s <{NS}name> ?n .
  FILTER(?n = "item 2 x") }}""")
    assert got2 == [(f"{NS}it2",)]
    got3 = _rows(store, f"""
SELECT ?s WHERE {{ ?s <{NS}name> ?n .
  FILTER(?n IN ("item 1 x"@en, "item 2 x")) }}""")
    assert got3 == [(f"{NS}it1",), (f"{NS}it2",)]


def test_filter_equality_pushdown(cyc_store):
    """Group-level term-identity equality filters push into the
    pattern reads (partition prune for ?p, parquet filters for ?s/?o)
    — results identical to the post-hoc filter, incl. OPTIONAL."""
    got = _rows(cyc_store, """
SELECT ?s ?o WHERE { ?s ?p ?o . FILTER(?p = <http://cy.org/v>) }""")
    assert got == [('"10"', "http://cy.org/b")]   # cols (o, s)
    opt = _rows(cyc_store, """
SELECT ?x ?v WHERE { ?s <http://cy.org/p1> ?x
  OPTIONAL { ?s <http://cy.org/v> ?v }
  FILTER(?x = <http://cy.org/c>) }""")
    assert opt == [('"10"', "<http://cy.org/c>")]  # cols (v, x)


def test_blank_node_property_lists(cyc_store):
    """[ p o ; ... ] desugars to a fresh existential variable plus its
    inner patterns (spec §4.1.4); nested lists and the subject
    position work; templates reject them; no _bn leak in SELECT *."""
    got = _rows(cyc_store, """
SELECT ?s WHERE { ?s <http://cy.org/p1> [ <http://cy.org/v> ?x ] }""")
    assert got == [("http://cy.org/a",)]       # a-p1->b, b-v->"10"
    sub = _rows(cyc_store, """
SELECT ?d WHERE { [ <http://cy.org/p2> ?d ] <http://cy.org/v> ?x }""")
    assert sub == [("<http://cy.org/d>",)]     # b has p2 and v
    df = execute_sparql(cyc_store, parse_sparql("""
SELECT * WHERE { ?s <http://cy.org/p1> [] }""")[0]).to_pandas()
    assert sorted(df.columns) == ["s"]
    with pytest.raises(SparqlError, match="template"):
        parse_sparql("""
CONSTRUCT { ?s <http://cy.org/q> [ <http://cy.org/r> ?x ] }
WHERE { ?s <http://cy.org/v> ?x }""")
