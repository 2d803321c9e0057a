"""Small parameterized CRS engine (no PROJ in this container).

Reference behavior: GT/transformation/ReprojectFeatureCollection.java
reprojects between arbitrary CRSs via GeoTools/PROJ. This module covers
the practically common subset with public Snyder (1987, USGS PP 1395)
formulas, vectorized in numpy:

- ``tmerc``  — ellipsoidal Transverse Mercator (eqs. 8-9..8-25),
  generalized to arbitrary lat0/lon0/k0/false offsets (UTM zones,
  Korea 2000 belts + Unified CS, ETRS89/NAD83 UTM, …);
- ``lcc``    — Lambert Conformal Conic 2SP (eqs. 15-1..15-11)
  (Lambert-93, ETRS89-LCC Europe, …);
- ``merc``   — spherical web Mercator (EPSG:3857);
- ``longlat``— identity (EPSG:4326).

DATUM HANDLING: WGS84-compatible datums (WGS84 itself, GRS80-based
ETRS89 / NAD83 / Korea 2000 / RGF93) are treated as interchangeable
with WGS84 (centimeter-level, documented). Legacy datums (OSGB36,
ED50, Tokyo) carry a published 7-parameter Helmert shift to WGS84
(position-vector convention, EPSG method 9606): geodetic → geocentric
XYZ on the source ellipsoid → Helmert → geodetic on the target
ellipsoid. Single-Helmert accuracy is the published one (~3.5 m for
OSGB36 vs the OSTN grid, ~5-10 m for the 3-parameter ED50/Tokyo
shifts) — adequate for analysis joins. Round 5 adds the NTv2-style
GRID-SHIFT mechanism (``GridShift`` + ``register_grid_shift``):
bilinear node interpolation inside the grid extent, fixed-point
inverse, Helmert fallback outside — registering a national grid's
node table (OSTN15/NADCON/NTv2 files are external data, not shipped)
makes the same ``transform`` call survey-grade.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_WGS84 = (6_378_137.0, 1.0 / 298.257223563)
_GRS80 = (6_378_137.0, 1.0 / 298.257222101)
_SPHERE_R = 6_378_137.0


@dataclass(frozen=True)
class CRSDef:
    kind: str            # "tmerc" | "lcc" | "merc" | "longlat"
    a: float = _WGS84[0]
    f: float = _WGS84[1]
    lat0: float = 0.0
    lon0: float = 0.0
    lat1: float = 0.0    # lcc standard parallels
    lat2: float = 0.0
    k0: float = 1.0
    x0: float = 0.0
    y0: float = 0.0
    datum: str = "WGS84"  # key into DATUM_SHIFTS (Helmert toWGS84)


#: Published toWGS84 Helmert parameters, position-vector convention:
#: (dx, dy, dz [m], rx, ry, rz [arc-seconds], s [ppm]). WGS84-compatible
#: datums map to the zero shift (documented cm-level equivalence).
DATUM_SHIFTS: dict[str, tuple] = {
    "WGS84": (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    # OSGB36 → WGS84 (OS "A guide to coordinate systems in GB", ~3.5 m)
    "OSGB36": (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421,
               -20.4894),
    # ED50 → WGS84 (EPSG 1133 mean-European 3-parameter)
    "ED50": (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0),
    # Tokyo → WGS84 (EPSG "Tokyo to WGS 84 (1)" 3-parameter)
    "TOKYO": (-148.0, 507.0, 685.0, 0.0, 0.0, 0.0, 0.0),
}

_AIRY1830 = (6_377_563.396, 1.0 / 299.3249646)
_INTL1924 = (6_378_388.0, 1.0 / 297.0)
_BESSEL1841 = (6_377_397.155, 1.0 / 299.1528128)


def _tm(a, f, lat0, lon0, k0, x0, y0):
    return CRSDef("tmerc", a, f, lat0=lat0, lon0=lon0, k0=k0, x0=x0, y0=y0)


def _lcc(a, f, lat0, lon0, lat1, lat2, x0, y0):
    return CRSDef("lcc", a, f, lat0=lat0, lon0=lon0, lat1=lat1, lat2=lat2,
                  x0=x0, y0=y0)


#: Common WGS84-compatible-datum projected CRSs (parameters from the
#: public EPSG registry).
CRS_TABLE: dict[str, CRSDef] = {
    "EPSG:4326": CRSDef("longlat"),
    "EPSG:3857": CRSDef("merc", a=_SPHERE_R, f=0.0),
    # Korea 2000 (GRS80) — the reference's home turf
    "EPSG:5179": _tm(*_GRS80, 38.0, 127.5, 0.9996, 1_000_000.0, 2_000_000.0),
    "EPSG:5180": _tm(*_GRS80, 38.0, 125.0, 1.0, 200_000.0, 600_000.0),
    "EPSG:5181": _tm(*_GRS80, 38.0, 127.0, 1.0, 200_000.0, 500_000.0),
    "EPSG:5185": _tm(*_GRS80, 38.0, 125.0, 1.0, 200_000.0, 600_000.0),
    "EPSG:5186": _tm(*_GRS80, 38.0, 127.0, 1.0, 200_000.0, 600_000.0),
    "EPSG:5187": _tm(*_GRS80, 38.0, 129.0, 1.0, 200_000.0, 600_000.0),
    "EPSG:5188": _tm(*_GRS80, 38.0, 131.0, 1.0, 200_000.0, 600_000.0),
    # France RGF93 / Lambert-93
    "EPSG:2154": _lcc(*_GRS80, 46.5, 3.0, 49.0, 44.0, 700_000.0,
                      6_600_000.0),
    # ETRS89 / LCC Europe
    "EPSG:3034": _lcc(*_GRS80, 52.0, 10.0, 35.0, 65.0, 4_000_000.0,
                      2_800_000.0),
    # Legacy datums via Helmert (round 4) -----------------------------
    # OSGB36 geographic + British National Grid
    "EPSG:4277": CRSDef("longlat", *_AIRY1830, datum="OSGB36"),
    "EPSG:27700": CRSDef("tmerc", *_AIRY1830, lat0=49.0, lon0=-2.0,
                         k0=0.9996012717, x0=400_000.0, y0=-100_000.0,
                         datum="OSGB36"),
    # ED50 geographic + ED50 / UTM 31N
    "EPSG:4230": CRSDef("longlat", *_INTL1924, datum="ED50"),
    "EPSG:23031": CRSDef("tmerc", *_INTL1924, lat0=0.0, lon0=3.0,
                         k0=0.9996, x0=500_000.0, y0=0.0, datum="ED50"),
    # Tokyo geographic (Bessel 1841)
    "EPSG:4301": CRSDef("longlat", *_BESSEL1841, datum="TOKYO"),
}

# ETRS89 / UTM 28N..38N (EPSG:25828..25838) and NAD83 / UTM 1N..23N
# (EPSG:26901..26923) — GRS80 tmerc zones
for _z in range(28, 39):
    CRS_TABLE[f"EPSG:258{_z:02d}"] = _tm(*_GRS80, 0.0, -183.0 + 6.0 * _z,
                                         0.9996, 500_000.0, 0.0)
for _z in range(1, 24):
    CRS_TABLE[f"EPSG:269{_z:02d}"] = _tm(*_GRS80, 0.0, -183.0 + 6.0 * _z,
                                         0.9996, 500_000.0, 0.0)


def parse_crs(code: str) -> CRSDef | None:
    """EPSG code → CRSDef, synthesizing WGS84 UTM zones on the fly."""
    code = code.upper().strip()
    if code in CRS_TABLE:
        return CRS_TABLE[code]
    if code.startswith("EPSG:") and len(code) == 10:
        num = code[5:]
        if num[:3] in ("326", "327"):
            zone = int(num[3:])
            if 1 <= zone <= 60:
                return _tm(*_WGS84, 0.0, -183.0 + 6.0 * zone, 0.9996,
                           500_000.0,
                           10_000_000.0 if num[:3] == "327" else 0.0)
    return None


# ---------------------------------------------------------------------------
# Transverse Mercator (Snyder 8-9..8-25), arbitrary ellipsoid + origin
# ---------------------------------------------------------------------------

def _merid_arc(a, e2, phi):
    return a * ((1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * phi
                - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024)
                * np.sin(2 * phi)
                + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * np.sin(4 * phi)
                - (35 * e2 ** 3 / 3072) * np.sin(6 * phi))


def _tmerc_fwd(c: CRSDef, lon, lat):
    a, f = c.a, c.f
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    lam0 = np.radians(c.lon0)
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A = (lam - lam0) * np.cos(phi)
    M = _merid_arc(a, e2, phi)
    M0 = _merid_arc(a, e2, np.radians(c.lat0))
    x = c.k0 * N * (A + (1 - T + C) * A ** 3 / 6
                    + (5 - 18 * T + T ** 2 + 72 * C - 58 * ep2)
                    * A ** 5 / 120) + c.x0
    y = c.k0 * (M - M0 + N * np.tan(phi) * (
        A ** 2 / 2 + (5 - T + 9 * C + 4 * C ** 2) * A ** 4 / 24
        + (61 - 58 * T + T ** 2 + 600 * C - 330 * ep2) * A ** 6 / 720)) + c.y0
    return x, y


def _tmerc_inv(c: CRSDef, x, y):
    a, f = c.a, c.f
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    x = np.asarray(x, np.float64) - c.x0
    y = np.asarray(y, np.float64) - c.y0
    M0 = _merid_arc(a, e2, np.radians(c.lat0))
    M = M0 + y / c.k0
    mu = M / (a * (1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
    C1 = ep2 * np.cos(phi1) ** 2
    T1 = np.tan(phi1) ** 2
    N1 = a / np.sqrt(1 - e2 * np.sin(phi1) ** 2)
    R1 = a * (1 - e2) / (1 - e2 * np.sin(phi1) ** 2) ** 1.5
    D = x / (N1 * c.k0)
    phi = phi1 - (N1 * np.tan(phi1) / R1) * (
        D ** 2 / 2 - (5 + 3 * T1 + 10 * C1 - 4 * C1 ** 2 - 9 * ep2)
        * D ** 4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 ** 2 - 252 * ep2 - 3 * C1 ** 2)
        * D ** 6 / 720)
    lam = np.radians(c.lon0) + (
        D - (1 + 2 * T1 + C1) * D ** 3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1 ** 2 + 8 * ep2 + 24 * T1 ** 2)
        * D ** 5 / 120) / np.cos(phi1)
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert Conformal Conic 2SP (Snyder 15-1..15-11)
# ---------------------------------------------------------------------------

def _lcc_consts(c: CRSDef):
    e2 = c.f * (2 - c.f)
    e = np.sqrt(e2)
    p0, p1, p2 = (np.radians(c.lat0), np.radians(c.lat1), np.radians(c.lat2))

    def m(p):
        return np.cos(p) / np.sqrt(1 - e2 * np.sin(p) ** 2)

    def t(p):
        return np.tan(np.pi / 4 - p / 2) / (
            (1 - e * np.sin(p)) / (1 + e * np.sin(p))) ** (e / 2)

    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho0 = c.a * F * t(p0) ** n
    return e, n, F, rho0, t


def _lcc_fwd(c: CRSDef, lon, lat):
    e, n, F, rho0, t = _lcc_consts(c)
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    rho = c.a * F * t(phi) ** n
    th = n * (lam - np.radians(c.lon0))
    return rho * np.sin(th) + c.x0, rho0 - rho * np.cos(th) + c.y0


def _lcc_inv(c: CRSDef, x, y):
    e, n, F, rho0, _t = _lcc_consts(c)
    x = np.asarray(x, np.float64) - c.x0
    y = rho0 - (np.asarray(y, np.float64) - c.y0)
    rho = np.sign(n) * np.hypot(x, y)
    tp = (rho / (c.a * F)) ** (1.0 / n)
    th = np.arctan2(np.sign(n) * x, np.sign(n) * y)
    lam = th / n + np.radians(c.lon0)
    phi = np.pi / 2 - 2 * np.arctan(tp)
    for _ in range(8):
        phi = np.pi / 2 - 2 * np.arctan(
            tp * ((1 - e * np.sin(phi)) / (1 + e * np.sin(phi))) ** (e / 2))
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def forward(c: CRSDef, lon, lat):
    """(lon, lat) degrees → projected (x, y) meters."""
    if c.kind == "longlat":
        return (np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    if c.kind == "merc":
        x = np.radians(np.asarray(lon, np.float64)) * c.a
        y = np.log(np.tan(np.pi / 4
                          + np.radians(np.asarray(lat, np.float64)) / 2)) * c.a
        return x, y
    if c.kind == "tmerc":
        return _tmerc_fwd(c, lon, lat)
    if c.kind == "lcc":
        return _lcc_fwd(c, lon, lat)
    raise ValueError(f"unknown projection kind {c.kind}")


def inverse(c: CRSDef, x, y):
    """Projected (x, y) meters → (lon, lat) degrees."""
    if c.kind == "longlat":
        return (np.asarray(x, np.float64), np.asarray(y, np.float64))
    if c.kind == "merc":
        lon = np.degrees(np.asarray(x, np.float64) / c.a)
        lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, np.float64)
                                              / c.a)) - np.pi / 2)
        return lon, lat
    if c.kind == "tmerc":
        return _tmerc_inv(c, x, y)
    if c.kind == "lcc":
        return _lcc_inv(c, x, y)
    raise ValueError(f"unknown projection kind {c.kind}")


# ---------------------------------------------------------------------------
# datum shifts (Helmert 7-parameter, EPSG method 9606 position-vector)
# ---------------------------------------------------------------------------

def _geodetic_to_ecef(a: float, f: float, lon, lat, h=0.0):
    e2 = f * (2 - f)
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    cphi = np.cos(phi)
    return ((N + h) * cphi * np.cos(lam), (N + h) * cphi * np.sin(lam),
            (N * (1 - e2) + h) * np.sin(phi))


def _ecef_to_geodetic(a: float, f: float, X, Y, Z):
    """Iterative latitude recovery (converges to sub-mm in ≤6 rounds
    for |h| ≪ a)."""
    e2 = f * (2 - f)
    X = np.asarray(X, np.float64)
    Y = np.asarray(Y, np.float64)
    Z = np.asarray(Z, np.float64)
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1 - e2))
    for _ in range(8):
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        N = a / np.sqrt(1 - e2 * sphi ** 2)
        # pole-safe height: cos(phi)→0 at the poles, so switch to the
        # Z-based form h = Z/sin(phi) − N(1−e2) there
        polar = np.abs(cphi) < 1e-9
        h = np.where(
            polar,
            np.abs(Z) / np.maximum(np.abs(sphi), 1e-12) - N * (1 - e2),
            p / np.where(polar, 1.0, cphi) - N)
        phi = np.arctan2(Z, p * (1 - e2 * N / (N + h)))
    return np.degrees(lam), np.degrees(phi)


def _helmert_apply(params: tuple, X, Y, Z, inverse: bool = False):
    """Position-vector 7-parameter similarity transform. The inverse
    uses negated parameters (standard small-parameter reversal; the
    second-order error at 500 m / 1″ scale is < 1 cm)."""
    dx, dy, dz, rx, ry, rz, s = params
    if inverse:
        dx, dy, dz, rx, ry, rz, s = (-dx, -dy, -dz, -rx, -ry, -rz, -s)
    sec = np.pi / (180.0 * 3600.0)
    rx, ry, rz = rx * sec, ry * sec, rz * sec
    m = 1.0 + s * 1e-6
    X = np.asarray(X, np.float64)
    Y = np.asarray(Y, np.float64)
    Z = np.asarray(Z, np.float64)
    return (dx + m * (X - rz * Y + ry * Z),
            dy + m * (rz * X + Y - rx * Z),
            dz + m * (-ry * X + rx * Y + Z))


def _datum_shift(src: CRSDef, dst: CRSDef, lon, lat, grids=None):
    """Geographic coords on src's datum → dst's datum (via WGS84
    geocentric; identity when both datums share the zero shift).

    ``grids`` overrides the process-local ``GRID_SHIFTS`` registry —
    REQUIRED in distributed stages: module globals registered on the
    driver do NOT exist in Ray worker processes, so Dataset-level
    callers must capture the grid dict in their closure (see
    ``make_reproject(grids=...)``) rather than rely on
    ``register_grid_shift``."""
    if grids is None:
        grids = GRID_SHIFTS
    if src.datum in grids or dst.datum in grids:
        return _datum_shift_gridded(src, dst, lon, lat, grids)
    sp = DATUM_SHIFTS.get(src.datum, DATUM_SHIFTS["WGS84"])
    dp = DATUM_SHIFTS.get(dst.datum, DATUM_SHIFTS["WGS84"])
    if sp == dp:
        return lon, lat
    X, Y, Z = _geodetic_to_ecef(src.a, src.f, lon, lat)
    if any(sp):
        X, Y, Z = _helmert_apply(sp, X, Y, Z)
    if any(dp):
        X, Y, Z = _helmert_apply(dp, X, Y, Z, inverse=True)
    return _ecef_to_geodetic(dst.a, dst.f, X, Y, Z)


def transform(src: CRSDef, dst: CRSDef, x, y, grids=None):
    """src coords → dst coords through geographic, applying the
    Helmert datum shift when the datums differ (module docstring);
    ``grids`` ships NTv2-style shift grids into the call (distributed
    callers must pass it — see ``_datum_shift``)."""
    lon, lat = inverse(src, x, y)
    lon, lat = _datum_shift(src, dst, lon, lat, grids)
    return forward(dst, lon, lat)


# ---------------------------------------------------------------------------
# NTv2-style grid-shift datum corrections (survey-grade path)
# ---------------------------------------------------------------------------

@dataclass
class GridShift:
    """A lat/lon shift grid in the NTv2 formulation: regular grid over
    [lat0, lat0+dlat·(nlat−1)] × [lon0, lon0+dlon·(nlon−1)] of
    arcsecond corrections ADDED to source-datum coordinates to obtain
    WGS84 coordinates; bilinear interpolation between nodes; the
    inverse is the standard NTv2 fixed-point iteration.

    This is the mechanism national grids (OSTN15, NADCON, NTv2
    distribution files) plug into — their node tables are external
    data not shippable here, so accuracy with the built-in Helmert
    fallback stays at the documented ~3.5–10 m; registering a real
    grid makes the SAME transform survey-grade. Reference inherits
    this from GeoTools referencing
    (GT/transformation/ReprojectFeatureCollection.java:1).
    """

    lat0: float
    lon0: float
    dlat: float
    dlon: float
    shift_lat: np.ndarray   # (nlat, nlon) arcseconds
    shift_lon: np.ndarray   # (nlat, nlon) arcseconds

    def _interp(self, lon, lat):
        """Bilinear node interpolation; returns (dlon_sec, dlat_sec,
        inside_mask)."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        fi = (lat - self.lat0) / self.dlat
        fj = (lon - self.lon0) / self.dlon
        nlat, nlon = self.shift_lat.shape
        inside = (fi >= 0) & (fi <= nlat - 1) & (fj >= 0) & (fj <= nlon - 1)
        i = np.clip(np.floor(fi).astype(np.int64), 0, nlat - 2)
        j = np.clip(np.floor(fj).astype(np.int64), 0, nlon - 2)
        ti = np.clip(fi - i, 0.0, 1.0)
        tj = np.clip(fj - j, 0.0, 1.0)

        def bil(g):
            return ((1 - ti) * (1 - tj) * g[i, j]
                    + (1 - ti) * tj * g[i, j + 1]
                    + ti * (1 - tj) * g[i + 1, j]
                    + ti * tj * g[i + 1, j + 1])

        return bil(self.shift_lon), bil(self.shift_lat), inside

    def apply(self, lon, lat):
        """source datum → WGS84. Returns (lon, lat, inside_mask) —
        callers Helmert-fall-back outside the grid (NTv2 behavior)."""
        dlon_s, dlat_s, inside = self._interp(lon, lat)
        return (np.asarray(lon, np.float64) + dlon_s / 3600.0 * inside,
                np.asarray(lat, np.float64) + dlat_s / 3600.0 * inside,
                inside)

    def apply_inverse(self, lon, lat, iters: int = 4):
        """WGS84 → source datum: fixed-point iteration x ← p − s(x)
        (the published NTv2 inverse; converges sub-mm in ≤4 rounds
        for real-grid shift magnitudes)."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        slon, slat = lon.copy(), lat.copy()
        inside = np.ones_like(lon, bool)
        for _ in range(iters):
            dlon_s, dlat_s, inside = self._interp(slon, slat)
            slon = lon - dlon_s / 3600.0 * inside
            slat = lat - dlat_s / 3600.0 * inside
        return slon, slat, inside


#: datum name → registered GridShift (to WGS84). Empty by default —
#: national grid files are external data; register at startup.
GRID_SHIFTS: dict[str, GridShift] = {}


def register_grid_shift(datum: str, grid: GridShift) -> None:
    """Install a shift grid for ``datum``; subsequent ``transform``
    calls through that datum use grid interpolation inside the grid
    extent and the Helmert parameters outside it."""
    GRID_SHIFTS[datum] = grid


def unregister_grid_shift(datum: str) -> None:
    GRID_SHIFTS.pop(datum, None)


def _helmert_leg(params, a, f, lon, lat, to_wgs84: bool):
    """One datum leg through ECEF on the given ellipsoid (WGS84 on
    the other end)."""
    if to_wgs84:
        X, Y, Z = _geodetic_to_ecef(a, f, lon, lat)
        X, Y, Z = _helmert_apply(params, X, Y, Z)
        return _ecef_to_geodetic(*_WGS84, X, Y, Z)
    X, Y, Z = _geodetic_to_ecef(*_WGS84, lon, lat)
    X, Y, Z = _helmert_apply(params, X, Y, Z, inverse=True)
    return _ecef_to_geodetic(a, f, X, Y, Z)


def _datum_shift_gridded(src: CRSDef, dst: CRSDef, lon, lat, grids):
    """Datum shift when at least one side has a registered grid:
    each leg goes through WGS84 geographic, grid-interpolated inside
    the grid extent, Helmert outside (NTv2 fallback semantics)."""
    sp = DATUM_SHIFTS.get(src.datum, DATUM_SHIFTS["WGS84"])
    dp = DATUM_SHIFTS.get(dst.datum, DATUM_SHIFTS["WGS84"])
    sg = grids.get(src.datum)
    dg = grids.get(dst.datum)
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    # leg 1: src datum → WGS84
    if sg is not None:
        glon, glat, inside = sg.apply(lon, lat)
        if not inside.all() and any(sp):
            hlon, hlat = _helmert_leg(sp, src.a, src.f, lon, lat, True)
            glon = np.where(inside, glon, hlon)
            glat = np.where(inside, glat, hlat)
        lon, lat = glon, glat
    elif any(sp):
        lon, lat = _helmert_leg(sp, src.a, src.f, lon, lat, True)
    # leg 2: WGS84 → dst datum
    if dg is not None:
        glon, glat, inside = dg.apply_inverse(lon, lat)
        if not inside.all() and any(dp):
            hlon, hlat = _helmert_leg(dp, dst.a, dst.f, lon, lat, False)
            glon = np.where(inside, glon, hlon)
            glat = np.where(inside, glat, hlat)
        lon, lat = glon, glat
    elif any(dp):
        lon, lat = _helmert_leg(dp, dst.a, dst.f, lon, lat, False)
    return lon, lat
