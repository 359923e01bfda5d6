"""Geo-query parity operators (the Elasticsearch geo surface).

Elasticsearch ships three geo primitives the reference's cluster would
expose to any index with a ``geo_point`` mapping: the ``geo_bounding_box``
query, the ``geo_distance`` query (+ distance sort), and the
``geohash_grid`` aggregation.  The fixture tables carry no coordinates,
so — exactly like the media ops synthesize payloads from ``doc_id``
arithmetic (llm/multimodal.py) — each customer gets a deterministic
(lat, lon) derived from md5(c_custkey) hex digits; the SAME derivation
runs in the DuckDB oracle, so every op below is hash-certified
end-to-end including the coordinate synthesis.

Determinism rules (house style, cf. function_score's rational decay):
no libm in the data path.  The geohash is pure integer bit-interleaving
(the Morton code of sortlimit.py's zorder_layout, emitted as base32
text), and the distance metric is the midpoint-latitude equirectangular
approximation with cos() expanded as a Taylor polynomial — multiplies/
adds/sqrt are IEEE-exact everywhere, while a live haversine would
hash-drift by libm sin/cos ULPs.  Error vs haversine inside the
2,000 km radius is ~0.5% (pytest-pinned at 1%); production swap-in is
a haversine pandas_udf if exactness vs ES's own numbers matters more
than engine determinism.

Scale shape: coordinate synthesis + geohash are narrow per-row
expressions fused into the scan (zero shuffle); the grid agg's output
is bounded by the cell count (32^4 at precision 4), and the distance
search is a TakeOrderedAndProject top-k — no global sort materializes.

Reference parity: mapping.json defines no geo field, but es.go:160-213
bulk-indexes into whatever mapping the template carries — geo columns
ride the same sink; these ops are the query-side parity for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.functions.exact import SUMD, dsum
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_HEX = "0123456789abcdef"
# geohash base32 (no a/i/l/o) — the standard alphabet
_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 10  # bits per axis -> 20 bits total = precision-4 geohash


def _u16_sql(col: str, start: int, instr_fn: str) -> str:
    """Hex digits [start, start+3] of md5(col) as an integer 0..65535 —
    identical text modulo the 1-based substring-search function name
    (Spark ``instr``, DuckDB ``strpos``)."""
    terms = []
    for i in range(4):
        terms.append(
            f"(({instr_fn}('{_HEX}', substr(md5(CAST({col} AS STRING)),"
            f" {start + i}, 1)) - 1) * {16 ** (3 - i)})"
        )
    return "(" + " + ".join(terms) + ")"


def _coord_sql(col: str, instr_fn: str) -> tuple[str, str]:
    """Deterministic (lat, lon) doubles: lat in [-60, 60), lon in
    [-180, 180).  Same IEEE double expression both engines."""
    # CAST to DOUBLE before dividing: Spark parses the `65536.0` literal
    # as DECIMAL and would run exact-decimal arithmetic while DuckDB runs
    # doubles — the cast pins both engines to IEEE double ops
    lat = f"(CAST({_u16_sql(col, 1, instr_fn)} AS DOUBLE) / 65536.0 * 120.0 - 60.0)"
    lon = f"(CAST({_u16_sql(col, 5, instr_fn)} AS DOUBLE) / 65536.0 * 360.0 - 180.0)"
    return lat, lon


def _geohash_sql(lat: str, lon: str) -> str:
    """Precision-4 geohash string from pure integer math: quantize each
    axis to 10 bits, interleave lon-first (geohash bit order), emit four
    base32 chars.  The interleave is zorder_layout's Morton code
    (sortlimit.py:66) with the geohash's MSB-first lon/lat convention."""
    latq = f"CAST(floor(({lat} + 90.0) / 180.0 * {1 << _GH_BITS}) AS INT)"
    lonq = f"CAST(floor(({lon} + 180.0) / 360.0 * {1 << _GH_BITS}) AS INT)"
    terms = []
    for i in range(_GH_BITS):
        terms.append(f"((({lonq} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({latq} >> {i}) & 1) << {2 * i})")
    code = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{_B32}', (({code} >> {shift}) & 31) + 1, 1)"
        for shift in (15, 10, 5, 0)
    ]
    return "(" + " || ".join(chars) + ")"


# --------------------------------------------------------------------------
# geohash_grid_agg  (ES geohash_grid aggregation)
# --------------------------------------------------------------------------

_LAT_S, _LON_S = _coord_sql("c_custkey", "instr")
_LAT_D, _LON_D = _coord_sql("c_custkey", "strpos")

_GRID_ORACLE = f"""
SELECT {_geohash_sql(_LAT_D, _LON_D)} AS geohash,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS avg_acctbal
FROM customer
GROUP BY 1
"""


@register("geohash_grid_agg", _GRID_ORACLE)
def geohash_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geohash_grid`` aggregation: bucket every point into its
    precision-4 geohash cell, count + average per cell.

    One groupBy whose key count is bounded by the 32^4 cell universe
    regardless of corpus size — the same bounded-output argument as the
    dow×hour heatmap.  The geohash itself is scan-fused integer bit
    math (no UDF, no libm)."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    gh = F.expr(_geohash_sql(_LAT_S, _LON_S))
    return (
        cust.select(gh.alias("geohash"), "c_acctbal")
        .groupBy("geohash")
        .agg(
            F.count("*").alias("n_customers"),
            # exact-decimal mean (house rule): AVG over a raw double is
            # summation-order-dependent and can hash-drift by 1 ULP at a
            # rounding boundary; decimal sums are associative
            F.round(
                dsum("c_acctbal", scale=2) / F.count("*"), 6
            ).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# geo_bounding_box  (ES geo_bounding_box query)
# --------------------------------------------------------------------------

_BOX = dict(lat_lo=10.0, lat_hi=45.0, lon_lo=-30.0, lon_hi=60.0)

_BOX_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, c_mktsegment,
         {_LAT_D} AS lat, {_LON_D} AS lon
  FROM customer
)
SELECT c_custkey, c_mktsegment,
       ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon
FROM pts
WHERE lat BETWEEN {_BOX['lat_lo']} AND {_BOX['lat_hi']}
  AND lon BETWEEN {_BOX['lon_lo']} AND {_BOX['lon_hi']}
"""


@register("geo_bounding_box", _BOX_ORACLE)
def geo_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_bounding_box`` query: points inside a lat/lon rectangle.
    Pure comparisons on scan-fused expressions — at scale this is the
    predicate a geohash- or z-order-clustered layout (zorder_layout)
    turns into file skipping, since a box is a contiguous set of cells."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.expr(_LAT_S).alias("lat"),
        F.expr(_LON_S).alias("lon"),
    )
    return pts.filter(
        (F.col("lat") >= _BOX["lat_lo"])
        & (F.col("lat") <= _BOX["lat_hi"])
        & (F.col("lon") >= _BOX["lon_lo"])
        & (F.col("lon") <= _BOX["lon_hi"])
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
    )


# --------------------------------------------------------------------------
# geo_distance_search  (ES geo_distance query + _geo_distance sort)
# --------------------------------------------------------------------------

_CENTER_LAT, _CENTER_LON = 48.8566, 2.3522  # Paris
_KM_PER_DEG = 111.19492664455873  # 6371.0088 km * pi / 180
_DEG2RAD = 0.017453292519943295
_RADIUS_KM = 2000.0
_TOP_K = 50


def _dist_expr(lat: str, lon: str) -> str:
    """Equirectangular distance with the east-west scale taken at the
    MIDPOINT latitude, cos() expanded as its degree-6 Taylor polynomial
    (|phi| <= 61 deg keeps the truncation under 4e-5 relative): pure
    * / + / sqrt, all IEEE-correctly-rounded, so both engines agree
    bit-for-bit — a live libm cos would not.  Accuracy vs haversine
    inside the 2,000 km radius is ~0.5%; squares are spelled x*x, not
    power(x, 2), since pow carries no cross-libm rounding guarantee."""
    phi = f"((({lat}) + {_CENTER_LAT}) * 0.5 * {_DEG2RAD})"
    p2 = f"({phi} * {phi})"
    cosm = f"(1.0 - {p2} / 2.0 + {p2} * {p2} / 24.0 - {p2} * {p2} * {p2} / 720.0)"
    dy = f"((({lat}) - {_CENTER_LAT}) * {_KM_PER_DEG})"
    dx = f"((({lon}) - {_CENTER_LON}) * {cosm} * {_KM_PER_DEG})"
    return f"sqrt({dy} * {dy} + {dx} * {dx})"

_DIST_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_D} AS lat, {_LON_D} AS lon FROM customer
),
scored AS (
  SELECT c_custkey,
         {_dist_expr('lat', 'lon')} AS dist_km
  FROM pts
)
SELECT c_custkey, ROUND(dist_km, 6) AS dist_km
FROM scored
WHERE dist_km <= {_RADIUS_KM}
ORDER BY dist_km, c_custkey
LIMIT {_TOP_K}
"""


@register("geo_distance_search", _DIST_ORACLE)
def geo_distance_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_distance`` query with ``_geo_distance`` sort: the nearest
    points within 2,000 km of a fixed center, closest first.

    Equirectangular metric (see module docstring) keeps the whole path
    libm-free; the radius filter prunes before the sort and the top-k
    compiles to TakeOrderedAndProject (per-partition heaps, no global
    sort) — the 100 TB plan is scan -> filter -> k-row heap merge."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey", F.expr(_LAT_S).alias("lat"), F.expr(_LON_S).alias("lon")
    )
    scored = pts.select(
        "c_custkey",
        F.expr(_dist_expr("lat", "lon")).alias("dist_km"),
    )
    return (
        scored.filter(F.col("dist_km") <= _RADIUS_KM)
        .select("c_custkey", F.round("dist_km", 6).alias("dist_km"))
        .orderBy("dist_km", "c_custkey")
        .limit(_TOP_K)
    )


# --------------------------------------------------------------------------
# geo_cell_pairs  (pairwise proximity join via cell bucketing — the
# banding pattern applied to geography)
# --------------------------------------------------------------------------

# geo_distance_search ranks against ONE center; the pairwise question
# ("all point pairs within r km" — store siting, contact tracing,
# dedup of venue listings) is quadratic if joined naively.  The scale
# shape is the same banding trick as MinHash/SimHash: quantize to grid
# cells sized so no qualifying pair can span more than one cell step,
# EXPLODE each point to its 3x3 cell neighborhood on one side, equi-join
# on the cell key, then verify the exact distance on candidates only.
# Certified against the plain all-pairs oracle, so the bucketed plan
# provably loses no pair (lossless by construction: cell steps exceed
# the radius in both axes).
_PAIR_RADIUS_KM = 100.0
_CELL_LAT = 1.0   # deg; 1.0 * 111.19 km > 100 km
_CELL_LON = 2.0   # deg; 2.0 * 111.19 * cos(60) = 111 km > 100 km at |lat|<=60


def _pair_dist_expr(la: str, lo: str, lb: str, lob: str) -> str:
    """Midpoint-latitude equirectangular distance between two points,
    cos() as the same Taylor polynomial as _dist_expr — identical IEEE
    tree both engines."""
    phi = f"((({la}) + ({lb})) * 0.5 * {_DEG2RAD})"
    p2 = f"({phi} * {phi})"
    cosm = f"(1.0 - {p2} / 2.0 + {p2} * {p2} / 24.0 - {p2} * {p2} * {p2} / 720.0)"
    dy = f"((({la}) - ({lb})) * {_KM_PER_DEG})"
    dx = f"((({lo}) - ({lob})) * {cosm} * {_KM_PER_DEG})"
    return f"sqrt({dy} * {dy} + {dx} * {dx})"


_PAIR_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_D} AS lat, {_LON_D} AS lon FROM customer
)
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       ROUND({_pair_dist_expr('a.lat', 'a.lon', 'b.lat', 'b.lon')}, 6)
         AS dist_km
FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
WHERE {_pair_dist_expr('a.lat', 'a.lon', 'b.lat', 'b.lon')}
      <= {_PAIR_RADIUS_KM}
"""


@register("geo_cell_pairs", _PAIR_ORACLE)
def geo_cell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 100 km, joined on quantized grid cells
    (one side exploded to its 3x3 neighborhood) and verified by the
    exact arithmetic distance — never all-pairs.  The oracle IS the
    naive quadratic join, so the certification proves the bucketed plan
    finds exactly the same pairs.

    Scale: candidates are bounded by local density (points per ~110 km
    cell), the join is a plain equi-join on the cell key, and skewed
    dense cells are AQE's skew-join case — the identical posture as the
    MinHash band join."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        F.expr(_LAT_S).alias("lat"),
        F.expr(_LON_S).alias("lon"),
    )
    cellx = F.floor(F.col("lon") / _CELL_LON).cast("long")
    celly = F.floor(F.col("lat") / _CELL_LAT).cast("long")
    home = pts.select(
        "c_custkey", "lat", "lon",
        cellx.alias("cx"), celly.alias("cy"),
    )
    # left side: each point exploded to its 9 neighbor cells
    probe = home.select(
        F.col("c_custkey").alias("key_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx ->"
                " transform(sequence(-1, 1), dy ->"
                " struct(cx + dx AS cx, cy + dy AS cy))))"
            )
        ).alias("cell"),
    ).select(
        "key_a", "lat_a", "lon_a",
        F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"),
    )
    cand = probe.join(
        home.select(
            F.col("c_custkey").alias("key_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            "cx", "cy",
        ),
        ["cx", "cy"],
    ).filter(F.col("key_a") < F.col("key_b"))
    dist = F.expr(_pair_dist_expr("lat_a", "lon_a", "lat_b", "lon_b"))
    return (
        cand.filter(dist <= _PAIR_RADIUS_KM)
        .select(
            "key_a",
            "key_b",
            F.round(dist, 6).alias("dist_km"),
        )
    )


# --------------------------------------------------------------------------
# geo_centroid_agg  (ES geo_centroid: per-bucket mean point)
# --------------------------------------------------------------------------

# The mean rides the INTEGER domain (sum the u16 axis words, exact
# BIGINTs) and the affine coordinate map is applied to the mean — valid
# because the map is affine (mean(a*u+b) == a*mean(u)+b), and the house
# integer-domain rule for a reason: the coordinate doubles land close
# enough to 1e-6 half-boundaries that the engines' double->decimal
# casts disagree on a handful of rows (observed on centroid_lon at
# sf0.01), while integer sums cannot drift anywhere.
_CENTROID_MEAN_LAT = (
    "(CAST({s} AS DOUBLE) / {n} / 65536.0 * 120.0 - 60.0)"
)
_CENTROID_MEAN_LON = (
    "(CAST({s} AS DOUBLE) / {n} / 65536.0 * 360.0 - 180.0)"
)

_CENTROID_ORACLE = f"""
WITH pts AS (
  SELECT c_mktsegment,
         {_u16_sql('c_custkey', 1, 'strpos')} AS u_lat,
         {_u16_sql('c_custkey', 5, 'strpos')} AS u_lon
  FROM customer
), m AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS point_count,
         SUM(u_lat) AS sl, SUM(u_lon) AS so
  FROM pts GROUP BY 1
)
SELECT c_mktsegment, point_count,
       {_CENTROID_MEAN_LAT.format(s='sl', n='point_count')} AS centroid_lat,
       {_CENTROID_MEAN_LON.format(s='so', n='point_count')} AS centroid_lon
FROM m
"""


@register("geo_centroid_agg", _CENTROID_ORACLE)
def geo_centroid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_centroid`` aggregation: the arithmetic mean point of
    every bucket's geo_points (per market segment), plus the point
    count ES reports alongside.

    ES accumulates a running lat/lon mean per shard and merges — the
    same partial-aggregate shape as this ONE map-side-combined groupBy.
    The mean is computed on the exact integer axis words and the affine
    coordinate map applied AFTER (equal by affinity, and immune to the
    double->decimal cast divergence float-domain sums hit); the closing
    double chain is textually shared with the oracle.  Flat-earth
    caveat: like ES, this is the planar mean — fine for clustered
    points, meaningless across the antimeridian."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_mktsegment",
        F.expr(_u16_sql("c_custkey", 1, "instr")).alias("u_lat"),
        F.expr(_u16_sql("c_custkey", 5, "instr")).alias("u_lon"),
    )
    m = pts.groupBy("c_mktsegment").agg(
        F.count("*").alias("point_count"),
        F.sum("u_lat").alias("sl"),
        F.sum("u_lon").alias("so"),
    )
    return m.select(
        "c_mktsegment",
        "point_count",
        F.expr(
            _CENTROID_MEAN_LAT.format(s="sl", n="point_count")
        ).alias("centroid_lat"),
        F.expr(
            _CENTROID_MEAN_LON.format(s="so", n="point_count")
        ).alias("centroid_lon"),
    )


# --------------------------------------------------------------------------
# geo_distance_rings_agg  (ES geo_distance aggregation: ring buckets)
# --------------------------------------------------------------------------

# ES geo_distance AGGREGATION (distinct from the query): concentric
# ring buckets around an origin — from-inclusive / to-exclusive, with
# the open outer ring, exactly date_range_agg's edge semantics applied
# to distance.  Ring keys follow ES's "from-to" naming.
_RINGS = (0.0, 500.0, 1000.0, 2000.0)  # km edges; last ring is open


def _ring_case(d: str) -> str:
    arms = []
    for i, lo in enumerate(_RINGS):
        if i + 1 < len(_RINGS):
            hi = _RINGS[i + 1]
            arms.append(
                f"WHEN {d} < {hi} THEN '{lo:g}-{hi:g}'"
            )
        else:
            arms.append(f"ELSE '{lo:g}-*'")
    return "CASE " + " ".join(arms) + " END"


_RINGS_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, c_acctbal, {_LAT_D} AS lat, {_LON_D} AS lon
  FROM customer
), d AS (
  SELECT c_custkey, c_acctbal,
         {_dist_expr('lat', 'lon')} AS dist FROM pts
)
SELECT {_ring_case('dist')} AS ring,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       {SUMD('c_acctbal', 2)} / COUNT(*) AS avg_acctbal
FROM d GROUP BY 1
"""


@register("geo_distance_rings_agg", _RINGS_ORACLE)
def geo_distance_rings_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_distance`` AGGREGATION: concentric ring buckets
    (0-500 / 500-1000 / 1000-2000 / 2000-* km) around the fixed origin,
    from-inclusive / to-exclusive with the open outer ring, carrying
    doc_count and an exact-decimal balance mean per ring.

    The ring assignment is a CASE over the same libm-free Taylor-cos
    equirectangular distance geo_distance_search certifies (identical
    IEEE tree both engines, so even the bucket EDGES agree bit-for-bit);
    one map-side-combined aggregate, output = ring-count rows."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    d = cust.select(
        "c_acctbal",
        F.expr(
            _dist_expr(_LAT_S, _LON_S)
        ).alias("dist"),
    )
    return d.groupBy(
        F.expr(_ring_case("dist")).alias("ring")
    ).agg(
        F.count("*").alias("doc_count"),
        (dsum("c_acctbal", 2) / F.count("*")).alias("avg_acctbal"),
    )


# --------------------------------------------------------------------------
# geo_bounds_agg  (ES geo_bounds: per-bucket bounding box)
# --------------------------------------------------------------------------

_BOUNDS_ORACLE = f"""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MAX({_LAT_D}) AS top_lat,
       MIN({_LAT_D}) AS bottom_lat,
       MIN({_LON_D}) AS left_lon,
       MAX({_LON_D}) AS right_lon
FROM customer
GROUP BY c_nationkey
"""


@register("geo_bounds_agg", _BOUNDS_ORACLE)
def geo_bounds_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_bounds`` aggregation: the tightest bounding box
    (top-left / bottom-right corners) enclosing each bucket's points,
    per nation — the map-viewport primitive Kibana calls for every
    geo dashboard.

    MIN/MAX over the shared deterministic coordinate doubles are
    order-insensitive and exact, so the whole op hash-certifies with
    no decimal machinery; one map-side-combined aggregate with
    nation-bounded output."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_nationkey",
        F.expr(_LAT_S).alias("lat"),
        F.expr(_LON_S).alias("lon"),
    )
    return pts.groupBy("c_nationkey").agg(
        F.count("*").alias("n_points"),
        F.max("lat").alias("top_lat"),
        F.min("lat").alias("bottom_lat"),
        F.min("lon").alias("left_lon"),
        F.max("lon").alias("right_lon"),
    )


# --------------------------------------------------------------------------
# geo_line_agg  (ES geo_line: per-entity track, sort-ordered, truncated)
# --------------------------------------------------------------------------

_GL_SIZE = 10

_GL_LAT_S, _GL_LON_S = _coord_sql("event_id", "instr")
_GL_LAT_D, _GL_LON_D = _coord_sql("event_id", "strpos")


def _gl_pt(lat: str, lon: str, str_t: str) -> str:
    """A point rendered engine-safely: integer microdegrees (floor of
    lat*1e6 + 0.5 on the IDENTICAL double both engines computed) —
    float-to-string formatting never enters the hash."""
    return (
        f"(CAST(CAST(floor({lat} * 1000000.0 + 0.5) AS BIGINT) AS {str_t})"
        f" || ':' ||"
        f" CAST(CAST(floor({lon} * 1000000.0 + 0.5) AS BIGINT) AS {str_t}))"
    )


_GEO_LINE_ORACLE = f"""
WITH pts AS (
  SELECT user_id, ts, event_id, {_gl_pt(_GL_LAT_D, _GL_LON_D, "VARCHAR")} AS pt
  FROM events
), rk AS (
  SELECT user_id, pt,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS total
  FROM pts
)
SELECT user_id,
       string_agg(pt, ' ' ORDER BY rk) AS line,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MAX(total) AS BIGINT) AS total_points
FROM rk WHERE rk <= {_GL_SIZE}
GROUP BY user_id
"""


@register("geo_line_agg", _GEO_LINE_ORACLE)
def geo_line_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_line``: per user, the track of (lat, lon) points in
    timestamp order, truncated to the first 10 points — rendered as
    integer microdegrees (the engine-safe serialization; ES emits
    GeoJSON).  Coordinates come from the family's shared deterministic
    derivation (md5 of the key, _coord_sql) applied to event_id.

    Scale shape: ONE groupBy carrying (ts, event_id, pt) structs with
    an array_sort + slice close — the same bytes the oracle's window
    sort moves, but no raw-row window; the per-bucket state ES keeps is
    a size-K heap, and the collect_list+slice is its local analog (a
    partial top-K merge would cap executor state at K per bucket; at
    this K the list is already bounded by the per-user event count).
    Tie-break (ts, event_id) makes the track a pure function of the
    data."""
    tune(spark)
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.struct(
            "ts", "event_id", F.expr(_gl_pt(_GL_LAT_S, _GL_LON_S, "STRING")).alias("pt")
        ).alias("s"),
    )
    agg = pts.groupBy("user_id").agg(
        F.slice(F.array_sort(F.collect_list("s")), 1, _GL_SIZE).alias("top"),
        F.count("*").alias("total_points"),
    )
    return agg.select(
        "user_id",
        F.array_join(F.expr("transform(top, x -> x.pt)"), " ").alias("line"),
        F.size("top").cast("bigint").alias("n_points"),
        F.col("total_points").cast("bigint"),
    )


# --------------------------------------------------------------------------
# geotile_grid_agg  (ES geotile_grid aggregation: "z/x/y" map tiles)
# --------------------------------------------------------------------------

_GT_ZOOM = 5

# Web-Mercator y = atanh(sin(lat)) via a degree-11 odd polynomial fit
# over |lat| <= 68.7deg (the synthetic coordinates stay in [-60, 60)):
# max abs error 5.2e-5 rad vs true Mercator, monotone over the range,
# and 100% tile agreement at z=5 on a 20k-point sweep of the band.
# House determinism rule (see module docstring): ln/tan are NOT
# IEEE-correctly-rounded and may differ by ULPs between engines, but
# +,-,*,/ ARE — a polynomial in those ops is bit-identical cross-engine,
# so the tile assignment is hash-certifiable (cf. the Taylor cos in the
# distance metric and function_score's rational decay).
_GT_COEF = (
    "0.9999162597078777",
    "0.16831428616218735",
    "0.03266180978521055",
    "0.03236675008042718",
    "-0.01683392620246818",
    "0.009759144350389229",
)
_GT_PI = "3.141592653589793"


def _gt_tile_sql(lat: str, lon: str) -> tuple[str, str]:
    """(tile_x, tile_y) integer expressions at zoom _GT_ZOOM — identical
    text on both engines (floor/CAST/arithmetic only)."""
    n = 1 << _GT_ZOOM
    phi = f"(({lat}) * {_GT_PI} / 180.0)"
    # Horner in phi^2 keeps the evaluation order fixed on both engines
    p2 = f"({phi} * {phi})"
    horner = _GT_COEF[-1]
    for c in reversed(_GT_COEF[:-1]):
        horner = f"({c} + {p2} * {horner})"
    merc = f"({phi} * {horner})"
    tx = f"CAST(floor((({lon}) + 180.0) / 360.0 * {n}.0) AS INT)"
    ty = f"CAST(floor((1.0 - {merc} / {_GT_PI}) / 2.0 * {n}.0) AS INT)"
    return tx, ty


_GT_LAT_S, _GT_LON_S = _coord_sql("c_custkey", "instr")
_GT_LAT_D, _GT_LON_D = _coord_sql("c_custkey", "strpos")
_GT_TX_S, _GT_TY_S = _gt_tile_sql(_GT_LAT_S, _GT_LON_S)
_GT_TX_D, _GT_TY_D = _gt_tile_sql(_GT_LAT_D, _GT_LON_D)

_GEOTILE_ORACLE = f"""
SELECT CAST('{_GT_ZOOM}' || '/' || CAST({_GT_TX_D} AS STRING)
            || '/' || CAST({_GT_TY_D} AS STRING) AS STRING) AS tile,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS avg_acctbal
FROM customer
GROUP BY 1
"""


@register("geotile_grid_agg", _GEOTILE_ORACLE)
def geotile_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geotile_grid`` aggregation: bucket every point into its
    web-Mercator map tile key "z/x/y" at zoom {z} (the slippy-map
    scheme Kibana maps layer queries with), count + exact-decimal
    average per tile.

    The Mercator latitude transform is a fitted odd polynomial
    (_GT_COEF — correctly-rounded arithmetic only, see the
    determinism note above), so the tile key is scan-fused math with
    no UDF and no libm; output is bounded by the 4^z tile universe
    regardless of corpus size, same scale argument as
    geohash_grid_agg."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    tile = F.concat(
        F.lit(f"{_GT_ZOOM}/"),
        F.expr(_GT_TX_S).cast("string"),
        F.lit("/"),
        F.expr(_GT_TY_S).cast("string"),
    )
    return (
        cust.select(tile.alias("tile"), "c_acctbal")
        .groupBy("tile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                dsum("c_acctbal", scale=2) / F.count("*"), 6
            ).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# geo_shape_polygon  (ES geo_shape query, relation=within a polygon)
# --------------------------------------------------------------------------

# A non-convex pentagon (lon, lat) spanning the synthetic coordinate
# band — the "M" shape exercises the even-odd rule (a horizontal line
# can cross it 0, 2, or 4 times).  Point-in-polygon is classic ray
# casting: count edges where the point's latitude is straddled and the
# point lies left of the edge's crossing longitude.  Per edge that is
# two comparisons, one multiply, one divide — every operation
# IEEE-correctly-rounded, so the parity test is bit-identical
# cross-engine (the house no-libm rule; md5-derived coordinates never
# coincide exactly with a vertex latitude, so the straddle comparisons
# have no boundary ambiguity).
_GS_POLY = (
    (-120.0, -40.0),
    (-60.0, 50.0),
    (0.0, -10.0),
    (60.0, 50.0),
    (120.0, -40.0),
)


def _gs_inside_sql(lat: str, lon: str) -> str:
    """Ray-casting parity: odd crossing count => inside.  Identical
    expression text on both engines."""
    crossings = []
    n = len(_GS_POLY)
    for i in range(n):
        x1, y1 = _GS_POLY[i]
        x2, y2 = _GS_POLY[(i + 1) % n]
        crossings.append(
            f"(CASE WHEN (({y1} > {lat}) <> ({y2} > {lat}))"
            f" AND ({lon} < ({x2} - {x1}) * ({lat} - {y1})"
            f" / ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(crossings) + ") % 2 = 1)"


_GS_LAT_S, _GS_LON_S = _coord_sql("c_custkey", "instr")
_GS_LAT_D, _GS_LON_D = _coord_sql("c_custkey", "strpos")

_GEO_SHAPE_ORACLE = f"""
SELECT c_custkey, lat, lon
FROM (SELECT c_custkey, {_GS_LAT_D} AS lat, {_GS_LON_D} AS lon
      FROM customer)
WHERE {_gs_inside_sql('lat', 'lon')}
"""


@register("geo_shape_polygon", _GEO_SHAPE_ORACLE)
def geo_shape_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_shape`` query (relation=within): points inside a
    non-convex polygon, decided by even-odd ray casting over the
    polygon's edges — comparisons, multiplies, and divides only, so
    the containment verdict is hash-certifiable cross-engine (see the
    determinism note at the shape constant).

    Plan: the whole test is one scan-fused per-row expression over the
    synthesized coordinates (zero shuffle, zero UDF); at 100 TB this
    is a pushed-predicate scan, and an R-tree-style prefilter is just
    an extra bounding-box conjunct (geo_bounding_box's certified
    expression) Catalyst would place before the edge tests."""
    tune(spark)
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        F.expr(_GS_LAT_S).alias("lat"),
        F.expr(_GS_LON_S).alias("lon"),
    )
    return pts.filter(F.expr(_gs_inside_sql("lat", "lon")))
