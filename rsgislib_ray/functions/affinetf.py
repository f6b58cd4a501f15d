"""2D affine-transform algebra mirroring the reference's vendored
``tools/affine.py`` (reference python/rsgislib/tools/affine.py:44-627,
itself the public ``affine`` package derived from Casey Duncan's
Planar — the formulas below come from those published sources, written
from scratch here).

Every float chain keeps the reference's literal operation order (the
parity contract for the ``affine_panel`` SQL oracle): matrix products
are ``sa*oa + sb*od`` left-folds, the inverse builds ``ra..re`` from
one reciprocal-determinant multiply each and derives the translation
as ``-sc*ra - sf*rb``, the scaling singular values clamp
``delta < 1e-12`` to zero, and ``cos_sin_deg`` special-cases exact
right angles (90 -> (0.0, 1.0), 180 -> (-1.0, 0), 270 -> (0, -1.0))
before falling back to libm cos/sin of ``math.radians``.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

EPSILON: float = 1e-5


class AffineError(Exception):
    pass


class TransformNotInvertibleError(AffineError):
    """The transform could not be inverted (degenerate)."""


class UndefinedRotationError(AffineError):
    """The rotation angle is undefined (improper / degenerate)."""


def cos_sin_deg(deg: float) -> tuple[float, float]:
    """Cosine and sine of an angle in degrees with exact right-angle
    special cases (affine.py:78)."""
    deg = deg % 360.0
    if math.isclose(deg, 90.0, rel_tol=1e-09, abs_tol=1e-09):
        return 0.0, 1.0
    elif math.isclose(deg, 180.0, rel_tol=1e-09, abs_tol=1e-09):
        return -1.0, 0
    elif math.isclose(deg, 270.0, rel_tol=1e-09, abs_tol=1e-09):
        return 0, -1.0
    rad = math.radians(deg)
    return math.cos(rad), math.sin(rad)


class AffineT(NamedTuple):
    """Augmented 2D affine matrix rows (a b c / d e f / 0 0 1)."""

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    # ---- constructors (affine.py:182-287) ----

    @classmethod
    def make(cls, a, b, c, d, e, f) -> "AffineT":
        return cls(a * 1.0, b * 1.0, c * 1.0, d * 1.0, e * 1.0, f * 1.0)

    @classmethod
    def identity(cls) -> "AffineT":
        return IDENTITY

    @classmethod
    def from_gdal(cls, c, a, b, f, d, e) -> "AffineT":
        return cls.make(a, b, c, d, e, f)

    @classmethod
    def translation(cls, xoff: float, yoff: float) -> "AffineT":
        return cls(1.0, 0.0, xoff * 1.0, 0.0, 1.0, yoff * 1.0)

    @classmethod
    def scale(cls, *scaling) -> "AffineT":
        if len(scaling) == 1:
            sx = sy = float(scaling[0])
        else:
            sx, sy = scaling
        return cls(sx * 1.0, 0.0, 0.0, 0.0, sy * 1.0, 0.0)

    @classmethod
    def shear(cls, x_angle: float = 0, y_angle: float = 0) -> "AffineT":
        mx = math.tan(math.radians(x_angle))
        my = math.tan(math.radians(y_angle))
        return cls(1.0, mx, 0.0, my, 1.0, 0.0)

    @classmethod
    def rotation(cls, angle: float, pivot=None) -> "AffineT":
        ca, sa = cos_sin_deg(angle)
        if pivot is None:
            return cls(ca * 1.0, -sa * 1.0, 0.0, sa * 1.0, ca * 1.0, 0.0)
        px, py = pivot
        return cls(
            ca * 1.0,
            -sa * 1.0,
            px - px * ca + py * sa,
            sa * 1.0,
            ca * 1.0,
            py - px * sa - py * ca,
        )

    @classmethod
    def permutation(cls) -> "AffineT":
        return cls(0.0, 1.0, 0.0, 1.0, 0.0, 0.0)

    # ---- conversions (affine.py:297-312) ----

    def to_gdal(self):
        return (self.c, self.a, self.b, self.f, self.d, self.e)

    def to_shapely(self):
        return (self.a, self.b, self.d, self.e, self.c, self.f)

    @property
    def xoff(self) -> float:
        return self.c

    @property
    def yoff(self) -> float:
        return self.f

    # ---- scalar properties (affine.py:324-390) ----

    @property
    def determinant(self) -> float:
        return self.a * self.e - self.b * self.d

    @property
    def _scaling(self) -> tuple[float, float]:
        a, b, d, e = self.a, self.b, self.d, self.e
        trace = a**2 + b**2 + d**2 + e**2
        det = (a * e - b * d) ** 2
        delta = trace**2 / 4 - det
        if delta < 1e-12:
            delta = 0
        l1 = math.sqrt(trace / 2 + math.sqrt(delta))
        l2 = math.sqrt(trace / 2 - math.sqrt(delta))
        return l1, l2

    @property
    def eccentricity(self) -> float:
        l1, l2 = self._scaling
        return math.sqrt(l1**2 - l2**2) / l1

    @property
    def rotation_angle(self) -> float:
        """Rotation in degrees assuming M = R S; raises
        UndefinedRotationError for improper non-degenerate transforms
        (the reference property unpacks the second row's first element
        as its local ``c`` — i.e. this is atan2(d, a) over the major
        singular value)."""
        if self.is_proper or self.is_degenerate:
            l1, _ = self._scaling
            y, x = self.d / l1, self.a / l1
            return math.atan2(y, x) * 180 / math.pi
        raise UndefinedRotationError

    # ---- predicates (affine.py:389-452) ----

    @property
    def is_identity(self) -> bool:
        return self is IDENTITY or self.almost_equals(IDENTITY, EPSILON)

    @property
    def is_rectilinear(self) -> bool:
        return (
            abs(self.a) < EPSILON and abs(self.e) < EPSILON
        ) or (abs(self.d) < EPSILON and abs(self.b) < EPSILON)

    @property
    def is_conformal(self) -> bool:
        return abs(self.a * self.b + self.d * self.e) < EPSILON

    @property
    def is_orthonormal(self) -> bool:
        a, b, d, e = self.a, self.b, self.d, self.e
        return (
            self.is_conformal
            and abs(1.0 - (a * a + d * d)) < EPSILON
            and abs(1.0 - (b * b + e * e)) < EPSILON
        )

    @property
    def is_degenerate(self) -> bool:
        return math.isclose(
            self.determinant, 0.0, rel_tol=1e-09, abs_tol=1e-09
        )

    @property
    def is_proper(self) -> bool:
        return self.determinant > 0.0

    @property
    def column_vectors(self):
        return (self.a, self.d), (self.b, self.e), (self.c, self.f)

    def almost_equals(self, other, precision: float = EPSILON) -> bool:
        for i in range(6):
            if abs(self[i] - other[i]) >= precision:
                return False
        return True

    # ---- algebra (affine.py:485-578) ----

    def mul(self, other):
        """Affine x Affine -> AffineT; Affine x (x, y) -> point."""
        sa, sb, sc, sd, se, sf = self
        if isinstance(other, AffineT):
            oa, ob, oc, od, oe, of = other
            return AffineT(
                sa * oa + sb * od,
                sa * ob + sb * oe,
                sa * oc + sb * of + sc,
                sd * oa + se * od,
                sd * ob + se * oe,
                sd * oc + se * of + sf,
            )
        vx, vy = other
        return (vx * sa + vy * sb + sc, vx * sd + vy * se + sf)

    __mul__ = mul

    def itransform(self, seq: Sequence) -> None:
        """In-place point transform (skips work for identity)."""
        if self is not IDENTITY and self != IDENTITY:
            sa, sb, sc, sd, se, sf = self
            for i, (x, y) in enumerate(seq):
                seq[i] = (x * sa + y * sb + sc, x * sd + y * se + sf)

    def invert(self) -> "AffineT":
        if self.is_degenerate:
            raise TransformNotInvertibleError(
                "Cannot invert degenerate transform"
            )
        idet = 1.0 / self.determinant
        sa, sb, sc, sd, se, sf = self
        ra = se * idet
        rb = -sb * idet
        rd = -sd * idet
        re = sa * idet
        return AffineT(
            ra, rb, -sc * ra - sf * rb, rd, re, -sc * rd - sf * re
        )

    __invert__ = invert


IDENTITY = AffineT(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


def loadsw(s: str) -> AffineT:
    """World-file string -> AffineT, translating center- to
    corner-based coordinates (affine.py:599)."""
    if not hasattr(s, "split"):
        raise TypeError("Cannot split input string")
    coeffs = s.split()
    if len(coeffs) != 6:
        raise ValueError(
            "Expected 6 coefficients, found %d" % len(coeffs)
        )
    a, d, b, e, c, f = (float(x) for x in coeffs)
    center = AffineT(a, b, c, d, e, f)
    return center.mul(AffineT.translation(-0.5, -0.5))


def dumpsw(obj: AffineT) -> str:
    """AffineT -> world-file string, translating corner- to
    center-based coordinates (affine.py:618); repr() floats round-trip
    exactly through loadsw."""
    center = obj.mul(AffineT.translation(0.5, 0.5))
    return (
        "\n".join(repr(getattr(center, x)) for x in list("adbecf"))
        + "\n"
    )
