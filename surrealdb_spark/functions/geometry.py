"""Geometry values and spatial predicates (INSIDE / OUTSIDE / INTERSECTS).

Reference: geometry enum `types/src/value/geometry.rs:23-38` (Point, Line,
Polygon, MultiPoint, MultiLine, MultiPolygon, Collection); predicate
dispatch `core/src/val/geometry.rs:224-407` (`contains` / `intersects`,
delegating to the geo crate); operator semantics `core/src/fnc/operate.rs`
(`outside(a,b) = !a.intersects(b)`, `intersects(a,b) = a.intersects(b)`,
`inside(a,b) = b.contains(a)`).

Spark-first representation — ONE static struct covers every kind (Spark
columns can't be sum types), tagged by ``kind``:

    struct<kind: string,
           polys: array<array<array<struct<lon:double, lat:double>>>>>

    point        polys = [[[p]]]
    multipoint   polys = [[[p1, p2, ...]]]
    line         polys = [[[v1, v2, ...]]]
    multiline    polys = [[[l1...], [l2...]]]       (each ring = one line)
    polygon      polys = [[ext, hole1, ...]]        (rings closed: first==last)
    multipolygon polys = [poly1, poly2, ...]

All predicates are pure JVM-side higher-order-function Column expressions
(transform/filter/exists/forall) — no UDFs, whole-stage-codegen friendly,
and the expression tree is fixed-size regardless of vertex count (lambdas
iterate, they don't unroll).  The composite identity used for compact sets:

    A intersects B  ⇔  (∃ vertex of A in B) ∨ (∃ vertex of B in A)
                        ∨ (∃ edge of A crossing an edge of B)

    B contains A    ⇔  (∀ vertex of A in B) ∧ ¬(∃ edge of A PROPERLY
                        crossing an edge of B)

Point-in-polygon is the even-odd crossing rule over every ring (holes come
out naturally); boundary points count as inside (geo crate `Relate`
semantics for `intersects`).  ``Collection`` is not supported (documented).
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column
from pyspark.sql import functions as F

PT_T = "struct<lon:double,lat:double>"
EDGE_T = f"struct<a:{PT_T},b:{PT_T}>"
GEOM_T = f"struct<kind:string,polys:array<array<array<{PT_T}>>>>"

KINDS = ("point", "line", "polygon", "multipoint", "multiline", "multipolygon")


class Frag(str):
    """A geometry VALUE as a SQL expression fragment (r13 fast path).

    Building the spatial predicates out of pyspark Column calls costs
    thousands of py4j round-trips per predicate (~0.5-1.4 s of pure
    construction each, measured); the same expression emitted as one SQL
    string is a single parse.  Callers that can express their operands as
    SQL (literal GeoJSON via ``frag_from_coords``, computed points via
    ``frag_point``) get predicates compiled through ``F.expr`` in one
    call; any operand that is NOT a Frag falls back to the original
    Column construction — semantics identical either way (the string
    builders mirror the Column builders expression-for-expression).
    """


def _c(x) -> Column:
    if isinstance(x, Frag):
        return F.expr(str(x))
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def _pt(lon, lat) -> Column:
    return F.struct(_c(lon).cast("double").alias("lon"),
                    _c(lat).cast("double").alias("lat"))


# -- constructors ------------------------------------------------------------


def _geom(kind: str, polys: Column) -> Column:
    return F.struct(F.lit(kind).alias("kind"), polys.alias("polys"))


def point(lon, lat) -> Column:
    return _geom("point", F.array(F.array(F.array(_pt(lon, lat)))))


def multipoint(pts) -> Column:
    """pts: Column of array<struct{lon,lat}>."""
    return _geom("multipoint", F.array(F.array(_c(pts))))


def line(vertices) -> Column:
    """vertices: Column of array<struct{lon,lat}> (open — not auto-closed)."""
    return _geom("line", F.array(F.array(_c(vertices))))


def multiline(lines) -> Column:
    """lines: Column of array<array<struct{lon,lat}>>."""
    return _geom("multiline", F.array(_c(lines)))


def _close_ring(ring: Column) -> Column:
    """Polygon rings must be closed; append the first vertex if they aren't."""
    first, last = F.element_at(ring, 1), F.element_at(ring, -1)
    return F.when(first == last, ring).otherwise(F.concat(ring, F.array(first)))


def polygon(rings) -> Column:
    """rings: Column of array<array<struct{lon,lat}>> — exterior first, then
    holes.  Rings are auto-closed."""
    return _geom("polygon", F.array(F.transform(_c(rings), _close_ring)))


def multipolygon(polys) -> Column:
    """polys: Column of array<array<array<struct{lon,lat}>>>."""
    return _geom(
        "multipolygon",
        F.transform(_c(polys), lambda p: F.transform(p, _close_ring)),
    )


def from_coords(kind: str, coords) -> Column:
    """Build geometry from a GeoJSON-ish python literal (lists of [lon,lat]).

    kind: GeoJSON type name, case-insensitive ('Point', 'LineString',
    'Polygon', 'MultiPoint', 'MultiLineString', 'MultiPolygon').
    """
    k = {"point": "point", "linestring": "line", "line": "line",
         "polygon": "polygon", "multipoint": "multipoint",
         "multilinestring": "multiline", "multiline": "multiline",
         "multipolygon": "multipolygon"}.get(kind.lower())
    if k is None:
        raise ValueError(f"unsupported geometry kind {kind!r}")

    def p(c):
        return _pt(float(c[0]), float(c[1]))

    if k == "point":
        return point(float(coords[0]), float(coords[1]))
    if k == "multipoint":
        return multipoint(F.array(*[p(c) for c in coords]))
    if k == "line":
        return line(F.array(*[p(c) for c in coords]))
    if k == "multiline":
        return multiline(F.array(*[F.array(*[p(c) for c in ln]) for ln in coords]))
    if k == "polygon":
        return polygon(F.array(*[F.array(*[p(c) for c in r]) for r in coords]))
    return multipolygon(F.array(*[
        F.array(*[F.array(*[p(c) for c in r]) for r in poly]) for poly in coords
    ]))


# -- primitive geometry helpers ----------------------------------------------


def _points(g: Column) -> Column:
    """Every vertex of g, flattened to array<point>."""
    return F.flatten(F.flatten(g.getField("polys")))


def _ring_edges(ring: Column) -> Column:
    """Consecutive-vertex edges of one ring/line.  NB: sequence(1,0) is
    DESCENDING in Spark, so guard short rings explicitly."""
    n = F.size(ring)
    return F.when(n < 2, F.array().cast(f"array<{EDGE_T}>")).otherwise(
        F.transform(
            F.slice(ring, 1, n - 1),
            lambda p, i: F.struct(
                p.alias("a"), F.element_at(ring, i + 2).alias("b")
            ),
        )
    )


def _edges(g: Column) -> Column:
    """Every edge of g (empty for point kinds)."""
    k = g.getField("kind")
    return F.when(
        k.isin("point", "multipoint"), F.array().cast(f"array<{EDGE_T}>")
    ).otherwise(F.flatten(F.transform(F.flatten(g.getField("polys")), _ring_edges)))


def _orient(p: Column, q: Column, r: Column) -> Column:
    """Cross product of (q-p)×(r-p): >0 left turn, <0 right, ==0 collinear."""
    return (
        (q.getField("lon") - p.getField("lon"))
        * (r.getField("lat") - p.getField("lat"))
        - (q.getField("lat") - p.getField("lat"))
        * (r.getField("lon") - p.getField("lon"))
    )


def _in_bbox(p: Column, q: Column, r: Column) -> Column:
    """r within the bounding box of segment pq (used with collinearity)."""
    rl, rt = r.getField("lon"), r.getField("lat")
    return (
        (rl >= F.least(p.getField("lon"), q.getField("lon")))
        & (rl <= F.greatest(p.getField("lon"), q.getField("lon")))
        & (rt >= F.least(p.getField("lat"), q.getField("lat")))
        & (rt <= F.greatest(p.getField("lat"), q.getField("lat")))
    )


def _on_segment(e: Column, r: Column) -> Column:
    a, b = e.getField("a"), e.getField("b")
    return (_orient(a, b, r) == 0) & _in_bbox(a, b, r)


def _seg_intersects(e1: Column, e2: Column, proper_only: bool = False) -> Column:
    """Segment-segment intersection (incl. collinear touch unless
    proper_only)."""
    a, b = e1.getField("a"), e1.getField("b")
    c, d = e2.getField("a"), e2.getField("b")
    d1, d2 = _orient(c, d, a), _orient(c, d, b)
    d3, d4 = _orient(a, b, c), _orient(a, b, d)
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    if proper_only:
        return proper
    touch = (
        ((d1 == 0) & _in_bbox(c, d, a))
        | ((d2 == 0) & _in_bbox(c, d, b))
        | ((d3 == 0) & _in_bbox(a, b, c))
        | ((d4 == 0) & _in_bbox(a, b, d))
    )
    return proper | touch


def _point_in_poly(p: Column, poly: Column) -> Column:
    """Even-odd crossing rule over every ring of one polygon (array<ring>);
    boundary counts as inside."""
    edges = F.flatten(F.transform(poly, _ring_edges))
    px, py = p.getField("lon"), p.getField("lat")
    crossing = F.size(
        F.filter(
            edges,
            lambda e: (
                ((e.getField("a").getField("lat") > py)
                 != (e.getField("b").getField("lat") > py))
                & (
                    px
                    < (e.getField("b").getField("lon") - e.getField("a").getField("lon"))
                    * (py - e.getField("a").getField("lat"))
                    / (e.getField("b").getField("lat") - e.getField("a").getField("lat"))
                    + e.getField("a").getField("lon")
                )
            ),
        )
    )
    on_boundary = F.exists(edges, lambda e: _on_segment(e, p))
    return (crossing % 2 == 1) | on_boundary


def _point_in_geom(p: Column, g: Column) -> Column:
    """p ∈ g for every supported kind (boundary inclusive)."""
    k = g.getField("kind")
    return (
        F.when(k.isin("point", "multipoint"), F.exists(_points(g), lambda x: x == p))
        .when(k.isin("line", "multiline"),
              F.exists(_edges(g), lambda e: _on_segment(e, p)))
        .otherwise(
            F.exists(g.getField("polys"), lambda poly: _point_in_poly(p, poly))
        )
    )


# -- SQL-fragment builders (r13 fast path; see Frag) --------------------------
#
# Each `_s_*` mirrors the Column builder of the same name expression-for-
# expression (same operations, same order, same CASE/when structure) so a
# fragment-built predicate computes bit-identical results.  Lambda variable
# names are gensym'd per call so nested/composed predicates never capture
# each other's variables.

_SYM = itertools.count()


def _sv(prefix: str) -> str:
    return f"__g{prefix}{next(_SYM)}"


def _s_pt(lon, lat) -> str:
    lon = f"{lon!r}D" if isinstance(lon, (int, float)) else lon
    lat = f"{lat!r}D" if isinstance(lat, (int, float)) else lat
    return (
        f"named_struct('lon', CAST({lon} AS DOUBLE), 'lat', CAST({lat} AS DOUBLE))"
    )


def _s_points(g: str) -> str:
    return f"flatten(flatten({g}.polys))"


def _s_ring_edges(ring: str) -> str:
    p, i = _sv("p"), _sv("i")
    return (
        f"CASE WHEN size({ring}) < 2 THEN CAST(array() AS array<{EDGE_T}>) "
        f"ELSE transform(slice({ring}, 1, size({ring}) - 1), "
        f"({p}, {i}) -> named_struct('a', {p}, 'b', element_at({ring}, {i} + 2))) END"
    )


def _s_edges(g: str) -> str:
    r = _sv("r")
    return (
        f"CASE WHEN {g}.kind IN ('point', 'multipoint') "
        f"THEN CAST(array() AS array<{EDGE_T}>) "
        f"ELSE flatten(transform(flatten({g}.polys), {r} -> {_s_ring_edges(r)})) END"
    )


def _s_orient(p: str, q: str, r: str) -> str:
    return (
        f"(({q}.lon - {p}.lon) * ({r}.lat - {p}.lat)"
        f" - ({q}.lat - {p}.lat) * ({r}.lon - {p}.lon))"
    )


def _s_in_bbox(p: str, q: str, r: str) -> str:
    return (
        f"({r}.lon >= least({p}.lon, {q}.lon)"
        f" AND {r}.lon <= greatest({p}.lon, {q}.lon)"
        f" AND {r}.lat >= least({p}.lat, {q}.lat)"
        f" AND {r}.lat <= greatest({p}.lat, {q}.lat))"
    )


def _s_on_segment(e: str, r: str) -> str:
    a, b = f"{e}.a", f"{e}.b"
    return f"({_s_orient(a, b, r)} = 0 AND {_s_in_bbox(a, b, r)})"


def _s_seg_intersects(e1: str, e2: str, proper_only: bool = False) -> str:
    a, b, c, d = f"{e1}.a", f"{e1}.b", f"{e2}.a", f"{e2}.b"
    d1, d2 = _s_orient(c, d, a), _s_orient(c, d, b)
    d3, d4 = _s_orient(a, b, c), _s_orient(a, b, d)
    proper = (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0))"
        f" AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )
    if proper_only:
        return proper
    touch = (
        f"(({d1} = 0 AND {_s_in_bbox(c, d, a)})"
        f" OR ({d2} = 0 AND {_s_in_bbox(c, d, b)})"
        f" OR ({d3} = 0 AND {_s_in_bbox(a, b, c)})"
        f" OR ({d4} = 0 AND {_s_in_bbox(a, b, d)}))"
    )
    return f"({proper} OR {touch})"


def _s_point_in_poly(p: str, poly: str) -> str:
    r, e, e2 = _sv("r"), _sv("e"), _sv("e")
    edges = f"flatten(transform({poly}, {r} -> {_s_ring_edges(r)}))"
    ea, eb = f"{e}.a", f"{e}.b"
    crossing = (
        f"size(filter({edges}, {e} -> "
        f"(({ea}.lat > {p}.lat) != ({eb}.lat > {p}.lat))"
        f" AND ({p}.lon < (({eb}.lon - {ea}.lon) * ({p}.lat - {ea}.lat))"
        f" / ({eb}.lat - {ea}.lat) + {ea}.lon)))"
    )
    on_boundary = f"exists({edges}, {e2} -> {_s_on_segment(e2, p)})"
    return f"(({crossing} % 2 = 1) OR {on_boundary})"


def _s_point_in_geom(p: str, g: str) -> str:
    x, e, poly = _sv("x"), _sv("e"), _sv("pl")
    return (
        f"CASE WHEN {g}.kind IN ('point', 'multipoint') "
        f"THEN exists({_s_points(g)}, {x} -> {x} = {p}) "
        f"WHEN {g}.kind IN ('line', 'multiline') "
        f"THEN exists({_s_edges(g)}, {e} -> {_s_on_segment(e, p)}) "
        f"ELSE exists({g}.polys, {poly} -> {_s_point_in_poly(p, poly)}) END"
    )


def _s_intersects(a: str, b: str) -> str:
    p1, p2, e1, e2 = _sv("p"), _sv("p"), _sv("e"), _sv("e")
    return (
        f"(exists({_s_points(a)}, {p1} -> {_s_point_in_geom(p1, b)})"
        f" OR exists({_s_points(b)}, {p2} -> {_s_point_in_geom(p2, a)})"
        f" OR exists({_s_edges(a)}, {e1} -> exists({_s_edges(b)}, {e2} -> "
        f"{_s_seg_intersects(e1, e2)})))"
    )


def _s_contains(container: str, inner: str) -> str:
    p, e1, e2 = _sv("p"), _sv("e"), _sv("e")
    return (
        f"(forall({_s_points(inner)}, {p} -> {_s_point_in_geom(p, container)})"
        f" AND NOT exists({_s_edges(inner)}, {e1} -> "
        f"exists({_s_edges(container)}, {e2} -> "
        f"{_s_seg_intersects(e1, e2, proper_only=True)})))"
    )


def frag_point(lon, lat) -> Frag:
    """Point geometry as a SQL fragment; lon/lat are SQL fragments or
    numbers."""
    return Frag(
        f"(named_struct('kind', 'point', 'polys', "
        f"array(array(array({_s_pt(lon, lat)})))))"
    )


def frag_from_coords(kind: str, coords) -> Frag:
    """``from_coords`` emitting a SQL fragment (literal coordinates only).

    Polygon rings are closed HERE (python-side append of the first vertex
    when missing) — same result as the Column path's runtime _close_ring
    on these literals."""
    k = {"point": "point", "linestring": "line", "line": "line",
         "polygon": "polygon", "multipoint": "multipoint",
         "multilinestring": "multiline", "multiline": "multiline",
         "multipolygon": "multipolygon"}.get(kind.lower())
    if k is None:
        raise ValueError(f"unsupported geometry kind {kind!r}")

    def pt(c) -> str:
        return _s_pt(float(c[0]), float(c[1]))

    def arr(items) -> str:
        return f"array({', '.join(items)})"

    def closed(ring):
        ring = [[float(c[0]), float(c[1])] for c in ring]
        return ring if ring and ring[0] == ring[-1] else ring + [ring[0]]

    if k == "point":
        return frag_point(float(coords[0]), float(coords[1]))
    if k == "multipoint":
        polys = arr([arr([arr([pt(c) for c in coords])])])
    elif k == "line":
        polys = arr([arr([arr([pt(c) for c in coords])])])
    elif k == "multiline":
        polys = arr([arr([arr([pt(c) for c in ln]) for ln in coords])])
    elif k == "polygon":
        polys = arr([arr([arr([pt(c) for c in closed(r)]) for r in coords])])
    else:
        polys = arr([
            arr([arr([pt(c) for c in closed(r)]) for r in poly])
            for poly in coords
        ])
    return Frag(f"(named_struct('kind', '{k}', 'polys', {polys}))")


# -- predicates (operator surface) -------------------------------------------


def intersects(a, b) -> Column:
    """`INTERSECTS` — geometry a ∩ b ≠ ∅ (val/geometry.rs:347)."""
    if isinstance(a, Frag) and isinstance(b, Frag):
        return F.expr(_s_intersects(str(a), str(b)))
    a, b = _c(a), _c(b)
    return (
        F.exists(_points(a), lambda p: _point_in_geom(p, b))
        | F.exists(_points(b), lambda p: _point_in_geom(p, a))
        | F.exists(
            _edges(a), lambda e1: F.exists(_edges(b), lambda e2: _seg_intersects(e1, e2))
        )
    )


def outside(a, b) -> Column:
    """`OUTSIDE` = !intersects (fnc/operate.rs:117)."""
    return ~intersects(a, b)


def contains(container, inner) -> Column:
    """container ⊇ inner — every vertex of inner inside container and no
    edge of inner properly crossing container's boundary (exact for simple
    polygons; `INSIDE a, b` lowers to contains(b, a))."""
    if isinstance(container, Frag) and isinstance(inner, Frag):
        return F.expr(_s_contains(str(container), str(inner)))
    container, inner = _c(container), _c(inner)
    return F.forall(_points(inner), lambda p: _point_in_geom(p, container)) & ~F.exists(
        _edges(inner),
        lambda e1: F.exists(
            _edges(container), lambda e2: _seg_intersects(e1, e2, proper_only=True)
        ),
    )


def g_inside(a, b) -> Column:
    """`INSIDE` for geometry operands: b.contains(a) (operate.rs:98-100)."""
    return contains(b, a)


def g_not_inside(a, b) -> Column:
    return ~g_inside(a, b)


def as_point(g) -> Column:
    """Extract a bare {lon,lat} struct from a point geometry (bridges the
    geo:: scalar namespace, which takes bare points)."""
    return F.element_at(F.element_at(F.element_at(_c(g).getField("polys"), 1), 1), 1)


# -- GeometryCollection (types/src/value/geometry.rs:23-38 Collection) --------
#
# A collection is an ARRAY of member geometries (array<GEOM_T>) — the
# recursive member structure, kept distinct from GEOM_T so each member
# retains its own kind.  Predicates distribute over members (geo crate
# Relate semantics for GeometryCollection):
#   g INTERSECTS coll ⇔ ∃ member: g intersects member
#   g INSIDE    coll ⇔ ∃ member: member contains g
#   coll INSIDE g    ⇔ ∀ member: g contains member


def collection(members) -> Column:
    """Collection from a python list of member geometry Columns (or an
    existing array<GEOM_T> Column)."""
    if isinstance(members, (list, tuple)):
        return F.array(*[_c(m) for m in members])
    return _c(members)


def coll_intersects(g, coll) -> Column:
    """g INTERSECTS collection (either operand order)."""
    return F.exists(_c(coll), lambda m: intersects(_c(g), m))


def coll_contains(coll, inner) -> Column:
    """collection ⊇ inner — some member contains it."""
    return F.exists(_c(coll), lambda m: contains(m, _c(inner)))


def inside_coll(g, coll) -> Column:
    """g INSIDE collection (operate.rs inside → contains(b, a))."""
    return coll_contains(coll, g)


def coll_inside(coll, g) -> Column:
    """collection INSIDE g — every member contained."""
    return F.forall(_c(coll), lambda m: contains(_c(g), m))


def collection_from_geojson(members: list) -> Column:
    """GeometryCollection from GeoJSON member dicts
    ({type, coordinates})."""
    return F.array(*[
        from_coords(m["type"], m["coordinates"]) for m in members
    ])


# -- geo:: scalar namespace over GEOM_T values --------------------------------
#
# fnc/geo.rs operates on Geometry values; these take the engine's GEOM_T
# struct ({kind, polys}) directly.  Distances/bearings use the first point;
# area/centroid the first polygon's exterior ring.

_WGS84_R = 6378137.0  # geo crate chamberlain_duquette uses the equatorial radius


def _ring0(g) -> Column:
    return F.element_at(F.element_at(_c(g).getField("polys"), 1), 1)


def _all_points(g) -> Column:
    return F.flatten(F.flatten(_c(g).getField("polys")))


def geo_distance(a, b) -> Column:
    """geo::distance — haversine over the geometries' first points."""
    from surrealdb_spark.functions import geo_fns as _GF

    return _GF.distance(as_point(a), as_point(b))


def geo_bearing(a, b) -> Column:
    from surrealdb_spark.functions import geo_fns as _GF

    return _GF.bearing(as_point(a), as_point(b))


def geo_is_valid(g) -> Column:
    """geo::is::valid — every vertex within lon/lat bounds."""
    return F.forall(_all_points(_c(g)), lambda p: (
        (p.getField("lon") >= -180) & (p.getField("lon") <= 180)
        & (p.getField("lat") >= -90) & (p.getField("lat") <= 90)))


def geo_area(g) -> Column:
    """geo::area — Chamberlain–Duquette unsigned spherical area of the
    first polygon's exterior ring (geo crate chamberlain_duquette_area;
    points/lines are 0)."""
    g = _c(g)
    ring = _close_ring(_ring0(g))
    n = F.size(ring)
    idx = F.when(n > 1, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>"))
    terms = F.transform(idx, lambda i: (
        F.radians(F.element_at(ring, i + 1).getField("lon")
                  - F.element_at(ring, i).getField("lon"))
        * (F.lit(2.0)
           + F.sin(F.radians(F.element_at(ring, i).getField("lat")))
           + F.sin(F.radians(F.element_at(ring, i + 1).getField("lat"))))))
    cd = F.abs(F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)) \
        * F.lit(_WGS84_R * _WGS84_R / 2.0)
    return F.when(g.getField("kind").isin("point", "multipoint", "line"),
                  F.lit(0.0)).otherwise(cd)


def geo_centroid(g) -> Column:
    """geo::centroid — points return themselves; rings the vertex mean of
    the exterior ring (closing vertex dropped)."""
    g = _c(g)
    ring = _ring0(g)
    first, last = F.element_at(ring, 1), F.element_at(ring, -1)
    open_ring = F.when((F.size(ring) > 1) & (first == last),
                       F.slice(ring, 1, F.size(ring) - 1)).otherwise(ring)
    n = F.size(open_ring).cast("double")
    lon = F.aggregate(open_ring, F.lit(0.0),
                      lambda a, p: a + p.getField("lon")) / n
    lat = F.aggregate(open_ring, F.lit(0.0),
                      lambda a, p: a + p.getField("lat")) / n
    return F.when(g.getField("kind") == "point", g) \
        .otherwise(point(lon, lat))


def geo_hash_encode(g, precision=12) -> Column:
    """geo::hash::encode — default precision 12; only points encode
    (fnc/geo.rs hash::encode matches Geometry::Point)."""
    from surrealdb_spark.functions import geo_fns as _GF

    g = _c(g)
    return F.when(g.getField("kind") == "point",
                  _GF.hash_encode(as_point(g), precision))


def geo_hash_decode(h) -> Column:
    """geo::hash::decode — geohash cell center as a point geometry."""
    from surrealdb_spark.functions import geo_fns as _GF

    d = _GF.hash_decode(h)
    return point(d.getField("lon"), d.getField("lat"))
