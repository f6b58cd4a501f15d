"""Affine-transform algebra (functions/affinetf.py) vs the reference's
vendored tools/affine.py:44-627 — the error paths, string round trips
and predicate edges the affine_panel SQL oracle can't reach."""

import math

import pytest

from rsgislib_ray.functions.affinetf import (
    EPSILON,
    IDENTITY,
    AffineT,
    TransformNotInvertibleError,
    UndefinedRotationError,
    cos_sin_deg,
    dumpsw,
    loadsw,
)


def test_cos_sin_deg_exact_right_angles():
    assert cos_sin_deg(90.0) == (0.0, 1.0)
    assert cos_sin_deg(180.0) == (-1.0, 0)
    assert cos_sin_deg(270.0) == (0, -1.0)
    # wraps modulo 360 before the special cases
    assert cos_sin_deg(450.0) == (0.0, 1.0)
    assert cos_sin_deg(-90.0) == (0, -1.0)
    ca, sa = cos_sin_deg(30.0)
    assert ca == math.cos(math.radians(30.0))
    assert sa == math.sin(math.radians(30.0))


def test_gdal_order_round_trip():
    t = AffineT.translation(3.0, -2.0).mul(AffineT.scale(2.0, 0.5))
    assert AffineT.from_gdal(*t.to_gdal()) == t
    # gdal tuple is (c, a, b, f, d, e)
    assert t.to_gdal() == (t.c, t.a, t.b, t.f, t.d, t.e)
    assert t.to_shapely() == (t.a, t.b, t.d, t.e, t.c, t.f)
    assert (t.xoff, t.yoff) == (t.c, t.f)


def test_mul_affine_vs_point_and_itransform():
    t = AffineT.translation(1.0, 2.0).mul(AffineT.rotation(90.0))
    assert t.mul((1.0, 0.0)) == (1.0, 3.0)
    assert (t * (0.0, 1.0)) == (0.0, 2.0)
    pts = [(1.0, 0.0), (0.0, 1.0)]
    t.itransform(pts)
    assert pts == [(1.0, 3.0), (0.0, 2.0)]
    # identity skips the rewrite entirely
    same = [(5.0, 6.0)]
    IDENTITY.itransform(same)
    assert same == [(5.0, 6.0)]


def test_invert_round_trip_and_degenerate_raises():
    t = AffineT.translation(7.0, -3.0).mul(
        AffineT.rotation(37.0).mul(AffineT.scale(2.0, 5.0))
    )
    rt = t.invert().mul(t)
    assert rt.almost_equals(IDENTITY, 1e-12)
    assert (~t).mul(t).almost_equals(IDENTITY, 1e-12)
    degen = AffineT.scale(1.0, 0.0)
    assert degen.is_degenerate
    with pytest.raises(TransformNotInvertibleError):
        degen.invert()


def test_rotation_angle_proper_improper_degenerate():
    r = AffineT.rotation(33.0)
    assert r.is_proper
    assert math.isclose(r.rotation_angle, 33.0, abs_tol=1e-12)
    # reflection: improper and non-degenerate -> raises
    refl = AffineT.scale(-2.0, 3.0)
    assert not refl.is_proper and not refl.is_degenerate
    with pytest.raises(UndefinedRotationError):
        refl.rotation_angle
    # degenerate transforms take the defined branch (reference quirk)
    degen = AffineT.scale(1.0, 0.0)
    assert degen.rotation_angle == 0.0


def test_scaling_eccentricity_clamp():
    # pure rotation: both singular values 1, delta clamps to 0 exactly
    r = AffineT.rotation(17.0)
    assert r._scaling == (1.0, 1.0)
    assert r.eccentricity == 0.0
    s = AffineT.scale(3.0, 1.0)
    assert s._scaling == (3.0, 1.0)
    assert math.isclose(
        s.eccentricity, math.sqrt(8.0) / 3.0, rel_tol=1e-15
    )


def test_predicates():
    assert IDENTITY.is_identity
    assert AffineT.translation(1e-6, 0.0).is_identity  # < EPSILON
    assert not AffineT.translation(1.0, 0.0).is_identity
    assert AffineT.rotation(90.0).is_rectilinear
    assert not AffineT.rotation(45.0).is_rectilinear
    assert AffineT.rotation(45.0).is_conformal
    assert not AffineT.shear(30.0, 0.0).is_conformal
    assert AffineT.rotation(123.0).is_orthonormal
    assert not AffineT.scale(2.0).is_orthonormal
    perm = AffineT.permutation()
    assert perm.is_rectilinear and not perm.is_proper
    assert AffineT.rotation(5.0).column_vectors == (
        (math.cos(math.radians(5.0)), math.sin(math.radians(5.0))),
        (-math.sin(math.radians(5.0)), math.cos(math.radians(5.0))),
        (0.0, 0.0),
    )
    assert EPSILON == 1e-5


def test_world_file_round_trip_and_errors():
    t = AffineT.translation(100.5, -200.25).mul(
        AffineT.scale(2.0, -2.0)
    )
    s = dumpsw(t)
    assert s.endswith("\n") and len(s.split()) == 6
    assert loadsw(s) == t
    # world-file order is a d b e c f (column-major with row swap)
    vals = s.split()
    center = t.mul(AffineT.translation(0.5, 0.5))
    assert [float(v) for v in vals] == [
        center.a, center.d, center.b, center.e, center.c, center.f,
    ]
    with pytest.raises(ValueError):
        loadsw("1 2 3")
    with pytest.raises(TypeError):
        loadsw(12345)
