"""Krüger-series transverse Mercator as generated ANSI SQL.

Emits DuckDB-runnable SQL computing the same WGS84 UTM forward/inverse
projection as :mod:`geetiles_spark.geo.utm` (4th-order Krüger series), so
the *grid generator itself* gets a DuckDB oracle: every tile's center,
degree-aligned bounds and UTM quad area recomputed from first principles in
SQL and value-compared against the Spark engine.

sinh/cosh/asinh/atanh are spelled out via exp/ln.  Each projection is a
chain of CTE stages with named intermediate columns — naive textual
inlining explodes to ~600 KB of SQL (every series term re-expands the whole
conformal-latitude subtree); the staged form is ~20 KB and evaluates each
intermediate once.
"""

from __future__ import annotations

import numpy as np

from ..geo import utm

_C = {
    "A": float(utm.RECT_A),
    "K0": float(utm.K0_UTM),
    "ES": float(utm._E_SQRT),
    **{f"a{j+1}": float(utm._ALPHA[j]) for j in range(4)},
    **{f"b{j+1}": float(utm._BETA[j]) for j in range(4)},
    **{f"d{j+1}": float(utm._DELTA[j]) for j in range(4)},
}



def _L(x: float) -> str:
    """Literal that DuckDB parses as DOUBLE (bare decimals become DECIMAL
    and overflow in multiplication)."""
    r = repr(float(x))
    return r if "e" in r or "E" in r or "inf" in r else r + "e0"

class _Chain:
    """Chained-CTE builder: each stage sees all previous columns."""

    def __init__(self, base_sql: str, name: str):
        self.stages: list[str] = [f"{name}_0 AS MATERIALIZED ({base_sql})"]
        self.name = name
        self.i = 0

    def add(self, exprs: dict[str, str]) -> None:
        prev = f"{self.name}_{self.i}"
        self.i += 1
        cols = ", ".join(f"{e} AS {k}" for k, e in exprs.items())
        self.stages.append(
            f"{self.name}_{self.i} AS MATERIALIZED (SELECT *, {cols} FROM {prev})"
        )

    def last(self) -> str:
        return f"{self.name}_{self.i}"

    def render(self) -> str:
        return ",\n".join(self.stages)


def add_fwd(chain: _Chain, lon: str, lat: str, lam0_rad: float, out: str) -> None:
    """Append CTE stages computing ``{out}_e, {out}_n`` = forward TM of the
    (lon, lat) column expressions (utm.lonlat_to_utm parity)."""
    p = out
    chain.add(
        {
            f"{p}_sphi": f"sin(radians({lat}))",
            f"{p}_lam": f"radians({lon}) - {_L(lam0_rad)}",
        }
    )
    es = _C["ES"]
    chain.add(
        {
            f"{p}_targ": (
                f"0.5 * ln((1 + {p}_sphi) / (1 - {p}_sphi)) - "
                f"{_L(es)} * 0.5 * ln((1 + {_L(es)} * {p}_sphi) / (1 - {_L(es)} * {p}_sphi))"
            )
        }
    )
    chain.add({f"{p}_t": f"(exp({p}_targ) - exp(-{p}_targ)) / 2"})
    chain.add(
        {
            f"{p}_xip": f"atan2({p}_t, cos({p}_lam))",
            f"{p}_ash": f"sin({p}_lam) / sqrt({p}_t * {p}_t + cos({p}_lam) * cos({p}_lam))",
        }
    )
    chain.add({f"{p}_etap": f"ln({p}_ash + sqrt({p}_ash * {p}_ash + 1))"})
    xi_terms = " + ".join(
        f"{_L(_C[f'a{j}'])} * sin({2*j} * {p}_xip) * (exp({2*j} * {p}_etap) + exp(-{2*j} * {p}_etap)) / 2"
        for j in range(1, 5)
    )
    eta_terms = " + ".join(
        f"{_L(_C[f'a{j}'])} * cos({2*j} * {p}_xip) * (exp({2*j} * {p}_etap) - exp(-{2*j} * {p}_etap)) / 2"
        for j in range(1, 5)
    )
    chain.add(
        {
            f"{p}_e": f"500000.0 + {_L(_C['K0'])} * {_L(_C['A'])} * ({p}_etap + {eta_terms})",
            f"{p}_n": f"{_L(_C['K0'])} * {_L(_C['A'])} * ({p}_xip + {xi_terms})",
        }
    )


def add_inv(chain: _Chain, e: str, n: str, lam0_rad: float, out: str) -> None:
    """Append CTE stages computing ``{out}_lon, {out}_lat`` = inverse TM of
    the (easting, northing) column expressions (utm.utm_to_lonlat parity)."""
    p = out
    chain.add(
        {
            f"{p}_xi": f"({n}) / ({_L(_C['K0'])} * {_L(_C['A'])})",
            f"{p}_eta": f"(({e}) - 500000.0) / ({_L(_C['K0'])} * {_L(_C['A'])})",
        }
    )
    xip_sum = " + ".join(
        f"{_L(_C[f'b{j}'])} * sin({2*j} * {p}_xi) * (exp({2*j} * {p}_eta) + exp(-{2*j} * {p}_eta)) / 2"
        for j in range(1, 5)
    )
    etap_sum = " + ".join(
        f"{_L(_C[f'b{j}'])} * cos({2*j} * {p}_xi) * (exp({2*j} * {p}_eta) - exp(-{2*j} * {p}_eta)) / 2"
        for j in range(1, 5)
    )
    chain.add(
        {
            f"{p}_xip": f"{p}_xi - ({xip_sum})",
            f"{p}_etap": f"{p}_eta - ({etap_sum})",
        }
    )
    chain.add(
        {
            f"{p}_chi": f"asin(sin({p}_xip) / ((exp({p}_etap) + exp(-{p}_etap)) / 2))",
            f"{p}_shp": f"(exp({p}_etap) - exp(-{p}_etap)) / 2",
        }
    )
    phi_sum = " + ".join(
        f"{_L(_C[f'd{j}'])} * sin({2*j} * {p}_chi)" for j in range(1, 5)
    )
    chain.add(
        {
            f"{p}_lon": f"degrees(atan2({p}_shp, cos({p}_xip)) + {_L(lam0_rad)})",
            f"{p}_lat": f"degrees({p}_chi + {phi_sum})",
        }
    )


def add_region_hash(
    chain: _Chain, minx: str, miny: str, maxx: str, maxy: str, out: str
) -> None:
    """Append CTE stages computing ``{out}`` = the reference tile identifier
    (``geo/hashing.py`` parity): format the rounded 5-point envelope ring the
    way numpy's ``str()`` renders it, sha256, fold mod 10**15, hex zfill(13).

    The decimal formatting is the pure integer/string recipe of
    ``hashing._fmt_value`` / ``region_hash_batch`` (positional regime only —
    valid while coords stay in numpy's non-scientific range, which the
    cross-check test asserts for the fixture).
    """
    p = out
    coords = {"x0": minx, "y0": miny, "x1": maxx, "y1": maxy}
    st1 = {}
    for c, e in coords.items():
        st1[f"{p}_{c}_n"] = (
            f"CAST(round(abs(round({e}, 5)) * 100000.0) AS BIGINT)"
        )
        st1[f"{p}_{c}_sg"] = (
            f"CASE WHEN round({e}, 5) < 0 OR (round({e}, 5) = 0 AND {e} < 0) "
            "THEN '-' ELSE '' END"
        )
    chain.add(st1)
    st2 = {}
    for c in coords:
        st2[f"{p}_{c}_ip"] = f"{p}_{c}_sg || CAST({p}_{c}_n // 100000 AS VARCHAR)"
        st2[f"{p}_{c}_fr"] = (
            f"rtrim(lpad(CAST({p}_{c}_n % 100000 AS VARCHAR), 5, '0'), '0')"
        )
    chain.add(st2)
    chain.add(
        {
            f"{p}_pi": "CAST(greatest(" + ", ".join(f"length({p}_{c}_ip)" for c in coords) + ") AS INTEGER)",
            f"{p}_pf": "CAST(greatest(" + ", ".join(f"length({p}_{c}_fr)" for c in coords) + ") AS INTEGER)",
        }
    )
    chain.add(
        {
            f"{p}_c{c}": (
                f"lpad({p}_{c}_ip, {p}_pi, ' ') || '.' || rpad({p}_{c}_fr, {p}_pf, ' ')"
            )
            for c in coords
        }
    )
    nl = "chr(10)"
    # ring rows: [minx miny] [maxx miny] [maxx maxy] [minx maxy] [minx miny]
    chain.add(
        {
            f"{p}_h": (
                f"sha256('[[' || {p}_cx0 || ' ' || {p}_cy0 || ']' || {nl} || "
                f"' [' || {p}_cx1 || ' ' || {p}_cy0 || ']' || {nl} || "
                f"' [' || {p}_cx1 || ' ' || {p}_cy1 || ']' || {nl} || "
                f"' [' || {p}_cx0 || ' ' || {p}_cy1 || ']' || {nl} || "
                f"' [' || {p}_cx0 || ' ' || {p}_cy0 || ']]')"
            )
        }
    )
    # fold the 256-bit hex digest mod 10^15: eight 32-bit chunks recombined
    # with precomputed 16^(8k) mod 10^15 weights in HUGEINT space
    chunk_exprs = {}
    for i in range(8):
        terms = " + ".join(
            f"(strpos('0123456789abcdef', substr({p}_h, {i * 8 + j + 1}, 1)) - 1) "
            f"* {16 ** (7 - j)}"
            for j in range(8)
        )
        chunk_exprs[f"{p}_k{i}"] = f"CAST({terms} AS BIGINT)"
    chain.add(chunk_exprs)
    comb = " + ".join(
        f"CAST({p}_k{i} AS HUGEINT) * {pow(16, 8 * (7 - i), 10 ** 15)}"
        for i in range(8)
    )
    chain.add(
        {
            out: (
                f"lpad(lower(to_hex(CAST(({comb}) % 1000000000000000 AS BIGINT))), "
                "13, '0')"
            )
        }
    )


def add_hex_prefix_int(chain: _Chain, strexpr: str, nchars: int, out: str) -> None:
    """Append stages computing ``{out}`` = ``int(sha256(strexpr).hexdigest()
    [:nchars], 16)`` as BIGINT (``sources/datasets.pattern_seed`` parity;
    nchars <= 15 so the value fits without HUGEINT)."""
    if nchars > 15:
        raise ValueError("nchars > 15 overflows BIGINT")
    chain.add({f"{out}_h": f"sha256({strexpr})"})
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({out}_h, {i + 1}, 1)) - 1) "
        f"* {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    )
    chain.add({out: f"CAST({terms} AS BIGINT)"})


def grid_chains(
    aoi_w: float, aoi_s: float, aoi_e: float, aoi_n: float,
    chip_size_m: float, zone: int,
) -> tuple[str, _Chain]:
    """The composable core of the grid oracle: returns ``(with_body, kept)``
    where ``kept.last()`` carries unrounded ``row_idx, minx, miny, maxx,
    maxy, area_km2`` for every kept tile.  Callers append further stages to
    ``kept`` (tile hash, split math, foreign joins) and render
    ``with_body + "," + kept.render()``.
    """
    lam0 = np.deg2rad(zone * 6.0 - 183.0)
    m = float(chip_size_m)

    env = _Chain("SELECT 1 AS one", "env")
    for i, (lon, lat) in enumerate(
        [(aoi_w, aoi_s), (aoi_e, aoi_s), (aoi_e, aoi_n), (aoi_w, aoi_n)]
    ):
        add_fwd(env, _L(lon), _L(lat), lam0, f"c{i}")
    env.add(
        {
            "minx_m": "least(c0_e, c1_e, c2_e, c3_e)",
            "miny_m": "least(c0_n, c1_n, c2_n, c3_n)",
            "gridx": "CAST(floor((greatest(c0_e, c1_e, c2_e, c3_e) - least(c0_e, c1_e, c2_e, c3_e)) / "
                     f"{_L(m)}) AS BIGINT)",
            "gridy": "CAST(floor((greatest(c0_n, c1_n, c2_n, c3_n) - least(c0_n, c1_n, c2_n, c3_n)) / "
                     f"{_L(m)}) AS BIGINT)",
        }
    )

    cells = _Chain(
        f"""SELECT gx.g AS gx, gy.g AS gy, d.minx_m, d.miny_m, d.gridy
            FROM {env.last()} d,
                 generate_series(0, 1023) gx(g), generate_series(0, 1023) gy(g)
            WHERE gx.g < d.gridx AND gy.g < d.gridy""",
        "cells",
    )
    add_inv(cells, f"gx * {_L(m)} + minx_m", f"gy * {_L(m)} + miny_m", lam0, "ctr")
    add_fwd(cells, "ctr_lon", "ctr_lat", lam0, "p0")
    add_fwd(cells, "ctr_lon + 0.001", "ctr_lat", lam0, "p1")
    add_fwd(cells, "ctr_lon", "ctr_lat + 0.001", lam0, "p2")
    cells.add(
        {
            "minx": f"ctr_lon - (({_L(m)} - 1) / 2) / ((p1_e - p0_e) * 1000)",
            "miny": f"ctr_lat - (({_L(m)} - 1) / 2) / ((p2_n - p0_n) * 1000)",
            "maxx": f"ctr_lon + (({_L(m)} - 1) / 2) / ((p1_e - p0_e) * 1000)",
            "maxy": f"ctr_lat + (({_L(m)} - 1) / 2) / ((p2_n - p0_n) * 1000)",
        }
    )

    kept = _Chain(
        f"""SELECT gx * gridy + gy AS row_idx, minx, miny, maxx, maxy
            FROM {cells.last()}
            WHERE minx <= {_L(aoi_e)} AND maxx >= {_L(aoi_w)}
              AND miny <= {_L(aoi_n)} AND maxy >= {_L(aoi_s)}""",
        "kept",
    )
    add_fwd(kept, "minx", "miny", lam0, "q0")
    add_fwd(kept, "minx", "maxy", lam0, "q1")
    add_fwd(kept, "maxx", "maxy", lam0, "q2")
    add_fwd(kept, "maxx", "miny", lam0, "q3")
    kept.add(
        {
            "area_km2": (
                "abs((q0_e * q1_n - q1_e * q0_n) + (q1_e * q2_n - q2_e * q1_n) + "
                "(q2_e * q3_n - q3_e * q2_n) + (q3_e * q0_n - q0_e * q3_n)) "
                "/ 2 / 1000000.0"
            )
        }
    )
    return f"{env.render()},\n{cells.render()}", kept


def grid_oracle_sql(
    aoi_w: float, aoi_s: float, aoi_e: float, aoi_n: float,
    chip_size_m: float, zone: int,
) -> str:
    """Grid-generation oracle for a rectangular AOI, fully in SQL: project
    the AOI corners, enumerate grid points, inverse-project centers, apply
    the ±0.001° probe math and the bbox intersects filter, measure the UTM
    quad area.  Output (row_idx, minx..maxy, area_km2) rounded to 9, the
    SQL twin of the engine's ``geo_grid_tiles`` minus the (sha256) tile_id.

    Fixture-specific: the area pass reuses the same UTM zone, valid when
    the tile collection's envelope center falls in ``zone`` (true for the
    aoi_box fixture; asserted by the cross-check test).
    """
    body, kept = grid_chains(aoi_w, aoi_s, aoi_e, aoi_n, chip_size_m, zone)
    return f"""
WITH
{body},
{kept.render()}
SELECT row_idx,
       round(minx, 9) AS minx, round(miny, 9) AS miny,
       round(maxx, 9) AS maxx, round(maxy, 9) AS maxy,
       round(area_km2, 9) AS area_km2
FROM {kept.last()}
ORDER BY row_idx
"""


def grid_full_oracle_sql(
    aoi_w: float, aoi_s: float, aoi_e: float, aoi_n: float,
    chip_size_m: float, zone: int,
) -> str:
    """Grid oracle **including** the sha256 tile identifier — the complete
    SQL twin of ``geo_grid_tiles`` (row_idx, tile_id, bounds, area)."""
    body, kept = grid_chains(aoi_w, aoi_s, aoi_e, aoi_n, chip_size_m, zone)
    add_region_hash(kept, "minx", "miny", "maxx", "maxy", "tile_id")
    return f"""
WITH
{body},
{kept.render()}
SELECT row_idx, tile_id,
       round(minx, 9) AS minx, round(miny, 9) AS miny,
       round(maxx, 9) AS maxx, round(maxy, 9) AS maxy,
       round(area_km2, 9) AS area_km2
FROM {kept.last()}
ORDER BY row_idx
"""
